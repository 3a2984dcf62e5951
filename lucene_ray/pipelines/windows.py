"""Stream-shaped windowed aggregates over the events table.

The reference is batch-only (no event-time windows — SURVEY §2.9), but a
training-data engine needs them; Ray Data has no native windows either, so
this is the canonical custom-operator composition: a vectorized per-batch
map assigns each event to its tumbling window (pure arithmetic — no state),
then a ``groupby`` aggregate over (key, window) does the wide step. Session
windows need ordered state per key → ``groupby(key).map_groups`` with the
gap logic over the sorted group.

Ordering assumption: tumbling/hopping need none (window id is a pure
function of ts); session windows sort each group by ts inside the task.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc


def tumbling_window_agg(ds, *, ts_col: str = "ts", key_col: str = "event_type",
                        value_col: str = "value", window: str = "1h"):
    """Count + sum + mean per (key, tumbling window). Window id = floor(ts /
    size); SQL-mirrorable (epoch arithmetic), exact."""
    size_us = int(pd.Timedelta(window).value // 1000)

    def assign(batch: pa.Table) -> pa.Table:
        # µs since epoch, unit-normalized (ns/ms/s sources included)
        ts = batch.column(ts_col).cast(pa.timestamp("us")).cast(pa.int64())
        win = pc.multiply(
            pc.floor(pc.divide(pc.cast(ts, pa.float64()), float(size_us))),
            float(size_us),
        )
        # window_start as int64 epoch SECONDS — unit-unambiguous across
        # engines (timestamp dtype units hash differently between tools)
        return pa.table(
            {
                key_col: batch.column(key_col),
                "window_start": pc.divide(pc.cast(win, pa.int64()), 1_000_000),
                value_col: batch.column(value_col),
            }
        )

    from ray.data.aggregate import Count, Mean, Sum

    return (
        ds.map_batches(assign, batch_format="pyarrow")
        .groupby([key_col, "window_start"])
        .aggregate(
            Count(alias_name="n"),
            Sum(value_col, alias_name="sum_value"),
            Mean(value_col, alias_name="mean_value"),
        )
    )


def hopping_window_agg(ds, *, ts_col: str = "ts", key_col: str = "event_type",
                       value_col: str = "value", window: str = "1h",
                       slide: str = "20min"):
    """Count + sum per (key, HOPPING window): overlapping windows of
    ``window`` length starting every ``slide``. Each event explodes to its
    ``window/slide`` covering windows in a vectorized per-batch map (window
    membership is pure arithmetic — no state), then one groupby aggregate.
    SQL-mirrorable: k ∈ [floor((ts − size)/slide)+1, floor(ts/slide)],
    window_start = k·slide."""
    size_us = int(pd.Timedelta(window).value // 1000)
    slide_us = int(pd.Timedelta(slide).value // 1000)
    if size_us % slide_us:
        raise ValueError("window must be a multiple of slide")
    if slide_us % 1_000_000:
        # window_start is emitted in whole epoch seconds (k*slide_us//1e6);
        # a sub-second slide would truncate adjacent windows onto the same
        # start and silently merge their aggregates.
        raise ValueError("slide must be a whole number of seconds")

    def assign(batch: pa.Table) -> pa.Table:
        # normalize to µs regardless of the column's native resolution (a
        # ns-typed source would otherwise land every event in wrong windows)
        ts = batch.column(ts_col).cast(pa.timestamp("us")).cast(
            pa.int64()).to_numpy()
        k_hi = ts // slide_us
        k_lo = (ts - size_us) // slide_us + 1
        reps = (k_hi - k_lo + 1).astype(np.int64)
        total = int(reps.sum())
        base = np.repeat(k_lo, reps)
        offs = np.arange(total, dtype=np.int64) - np.repeat(
            np.concatenate([[0], np.cumsum(reps)[:-1]]), reps)
        win_start = (base + offs) * slide_us // 1_000_000  # epoch seconds
        idx = np.repeat(np.arange(len(ts), dtype=np.int64), reps)
        return pa.table({
            key_col: batch.column(key_col).take(pa.array(idx)),
            "window_start": pa.array(win_start),
            value_col: batch.column(value_col).take(pa.array(idx)),
        })

    from ray.data.aggregate import Count, Sum

    return (
        ds.map_batches(assign, batch_format="pyarrow")
        .groupby([key_col, "window_start"])
        .aggregate(
            Count(alias_name="n"),
            Sum(value_col, alias_name="sum_value"),
        )
    )


def session_window_agg(ds, *, ts_col: str = "ts", key_col: str = "user_id",
                       value_col: str = "value", gap: str = "30min",
                       num_partitions: int = 64):
    """Session windows per key: events within ``gap`` of the previous event
    belong to the same session. VECTORIZED keyed state: key-hash partition,
    then ONE pass per partition — sort (key, ts), session breaks from a
    vectorized diff (key change OR gap exceeded), one C-level pandas groupby
    over session ids. Python calls: one per partition, never one per key."""
    from lucene_ray.pipelines.dedup import partition_reduce

    gap_ns = pd.Timedelta(gap).value

    def sessions_part(t: pa.Table) -> pa.Table:
        df = t.to_pandas().sort_values([key_col, ts_col], kind="stable")
        # normalize to ns regardless of the column's native resolution —
        # pandas 2 keeps timestamp[us] inputs in µs, and comparing µs diffs
        # against a ns gap silently merges everything into one session.
        # tz-aware columns are converted to UTC wall time first (a direct
        # astype to a naive dtype raises on tz-aware input)
        ser = df[ts_col]
        if getattr(ser.dtype, "tz", None) is not None:
            ser = ser.dt.tz_convert("UTC").dt.tz_localize(None)
        ts = ser.astype("datetime64[ns]").astype("int64").to_numpy()
        uid = df[key_col].to_numpy()
        n = len(df)
        new_s = np.ones(n, dtype=bool)
        if n > 1:
            new_s[1:] = (uid[1:] != uid[:-1]) | ((ts[1:] - ts[:-1]) > gap_ns)
        sid = np.cumsum(new_s) - 1
        out = (
            df.assign(__sid=sid)
            .groupby("__sid", sort=True)
            .agg(**{
                key_col: (key_col, "first"),
                "session_start": (ts_col, "min"),
                "session_end": (ts_col, "max"),
                "n": (value_col, "size"),
                "sum_value": (value_col, "sum"),
            })
            .reset_index(drop=True)
        )
        return pa.Table.from_pandas(out, preserve_index=False)

    return partition_reduce(ds, [key_col], sessions_part,
                            num_partitions=num_partitions)

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
        ts = batch.column(ts_col).cast(pa.int64())  # µs since epoch
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

    def assign(batch: pa.Table) -> pa.Table:
        ts = batch.column(ts_col).cast(pa.int64()).to_numpy()  # µs epoch
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
                       value_col: str = "value", gap: str = "30min"):
    """Session windows per key: events within ``gap`` of the previous event
    belong to the same session. Per-key state → groupby(key).map_groups over
    the ts-sorted group (the actor-free form of keyed streaming state)."""
    gap_ns = pd.Timedelta(gap).value

    def sessions(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(ts_col)
        ts = g[ts_col].astype("int64").to_numpy()
        new_session = np.ones(len(ts), dtype=bool)
        new_session[1:] = (ts[1:] - ts[:-1]) > gap_ns
        sid = np.cumsum(new_session) - 1
        out = g.assign(__sid=sid).groupby("__sid").agg(
            session_start=(ts_col, "min"),
            session_end=(ts_col, "max"),
            n=(value_col, "size"),
            sum_value=(value_col, "sum"),
        )
        out[key_col] = g[key_col].iloc[0]
        return out.reset_index(drop=True)[
            [key_col, "session_start", "session_end", "n", "sum_value"]
        ]

    return ds.groupby(key_col).map_groups(sessions, batch_format="pandas")

"""Deduplication pipelines — exact, MinHash+LSH, SimHash, n-gram Jaccard.

Reference anchors: exact dedup is the semantics of
``IndexWriter.updateDocument(term, doc)`` = delete-by-key + add, i.e.
last-writer-wins per key (index/IndexWriter.java:1815); near-dup is the
reference's MinHash LSH primitive
(analysis/common/.../minhash/MinHashFilter.java:46-65), re-expressed as the
canonical Ray Data shape: per-batch signature computation → explode to
(band, band_hash, doc) rows → groupby band bucket → candidate pairs →
vectorized verification.

Scale notes: signatures are computed vectorized per batch (numpy
multiply-shift hashing — deterministic, seedable, no Python per-token loop);
the only shuffles are groupbys on (band_id, band_hash) whose group sizes are
bounded by bucket collision counts, and candidate verification is a pair of
distributed hash joins (pairs ⨝ per-doc payload) with the exact check running
vectorized inside map_batches — never a driver-side LUT, never a full
self-join.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

_MERSENNE = np.uint64((1 << 61) - 1)


def _hash_tokens_u64(tokens) -> np.ndarray:
    """Deterministic, VECTORIZED, SELF-CONTAINED 64-bit string hashes.

    Polynomial hash over utf-8 bytes (base = FNV prime, wraparound uint64)
    finished with murmur3's public fmix64 avalanche — all plain numpy, so
    the value is identical on every worker, machine, and library version
    (a library-provided hash that is only "stable per version" would
    silently break cross-worker LSH bucket collisions on a heterogeneous
    cluster). No per-token Python loop: one Arrow byte buffer + reduceat.
    """
    toks = list(tokens)
    if not toks:
        return np.empty(0, dtype=np.uint64)
    import pyarrow as pa

    arr = pa.array(toks, type=pa.string())
    bufs = arr.buffers()
    off = np.frombuffer(bufs[1], dtype=np.int32)[: len(arr) + 1].astype(np.int64)
    data = np.frombuffer(bufs[2], dtype=np.uint8)[off[0] : off[-1]].astype(np.uint64)
    off = off - off[0]
    lens = np.diff(off)
    P = np.uint64(1099511628211)
    max_len = int(lens.max()) if len(lens) else 0
    powers = np.ones(max_len + 1, dtype=np.uint64)
    if max_len:
        powers[1:] = np.multiply.accumulate(np.full(max_len, P, dtype=np.uint64))
    sums = np.zeros(len(lens), dtype=np.uint64)
    ne = lens > 0
    if len(data) and ne.any():
        ends_rep = np.repeat(off[1:], lens)
        pfe = (ends_rep - 1 - np.arange(len(data), dtype=np.int64)).astype(np.int64)
        contrib = data * powers[pfe]
        # reduceat over NON-EMPTY starts only: an empty string's start can
        # equal len(data) (trailing empty → IndexError) or alias the next
        # string's first element — both quirks avoided by masking
        sums[ne] = np.add.reduceat(contrib, off[:-1][ne])
    h = sums ^ (lens.astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15))
    # murmur3 fmix64 (public domain) avalanche
    h ^= h >> np.uint64(33)
    h *= np.uint64(0xFF51AFD7ED558CCD)
    h ^= h >> np.uint64(33)
    h *= np.uint64(0xC4CEB9FE1A85EC53)
    h ^= h >> np.uint64(33)
    return h


def _simple_tokens(texts: list[str]):
    import re

    pat = re.compile(r"[a-z0-9]+")
    return [pat.findall(t.lower()) for t in texts]


def _shingles(tokens: list[str], n: int) -> list[str]:
    if len(tokens) < n:
        return [" ".join(tokens)] if tokens else []
    return [" ".join(tokens[i : i + n]) for i in range(len(tokens) - n + 1)]


# ------------------------------------------- vectorized partition reduce


def _col_hash_u64(batch: pa.Table, cols) -> np.ndarray:
    """Deterministic 64-bit row hash over one or more key columns
    (splitmix64 for ints, the self-contained polynomial hash for strings) —
    the partitioner for the vectorized reduces below."""
    h = np.zeros(batch.num_rows, dtype=np.uint64)
    for c in cols:
        col = batch.column(c)
        if pa.types.is_integer(col.type):
            k = col.to_numpy(zero_copy_only=False).astype(np.uint64)
            k = (k ^ (k >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
            k = (k ^ (k >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
            k ^= k >> np.uint64(31)
        else:
            k = _hash_tokens_u64(col.to_pylist())
        h = h * np.uint64(0x100000001B3) + k
    return h


def partition_reduce(ds, key_cols, fn, *, num_partitions: int = 64,
                     pre_partitioned: bool = False):
    """Hash-partitioned VECTORIZED reduce — the scale-safe replacement for
    ``groupby(key).map_groups(tiny-pandas-fn)``.

    Ray's per-key aggregate paths (builtin ``AggregateFnV2`` included) invoke
    Python once per distinct key, which is O(n_docs) interpreter calls for a
    dedup where nearly every key is unique. Instead: add ``__p =
    hash(key) % P`` per batch (vectorized), shuffle on the SMALL partition id,
    and run ``fn`` once per partition — ``fn`` is an Arrow/pandas kernel that
    reduces ALL keys in its partition in one vectorized call. Python call
    count: P (cluster-sized), not n_keys (corpus-sized). Key-hash
    partitioning keeps every occurrence of a key in one partition, so the
    per-partition reduce is exact.
    """
    def run(t: pa.Table) -> pa.Table:
        return fn(t.drop_columns(["__p"]))

    if not pre_partitioned:
        def add_p(batch: pa.Table) -> pa.Table:
            p = (_col_hash_u64(batch, key_cols) % np.uint64(num_partitions)).astype(np.int32)
            return batch.append_column("__p", pa.array(p, type=pa.int32()))

        ds = ds.map_batches(add_p, batch_format="pyarrow")
    return ds.groupby("__p").map_groups(run, batch_format="pyarrow")


def add_partition_col(batch: pa.Table, key_cols, num_partitions: int = 64) -> pa.Table:
    """``__p`` column for ``partition_reduce(..., pre_partitioned=True)`` —
    lets a producing map stage fuse the partitioner into its own pass."""
    p = (_col_hash_u64(batch, key_cols) % np.uint64(num_partitions)).astype(np.int32)
    return batch.append_column("__p", pa.array(p, type=pa.int32()))


def distinct_rows(ds, key_cols, *, num_partitions: int = 64):
    """Distributed DISTINCT over the key columns (vectorized per partition)."""
    cols = list(key_cols)

    def fn(t: pa.Table) -> pa.Table:
        return t.select(cols).group_by(cols).aggregate([])

    return partition_reduce(ds, cols, fn, num_partitions=num_partitions)


_POPCNT8 = np.unpackbits(np.arange(256, dtype=np.uint8)[:, None], axis=1).sum(axis=1)


def popcount64(x: np.ndarray) -> np.ndarray:
    """Vectorized popcount of a uint64 array (byte-table lookup)."""
    return _POPCNT8[np.ascontiguousarray(x).view(np.uint8)].reshape(len(x), 8).sum(axis=1)


def _emit_bucket_pairs(bkey: np.ndarray, ids: np.ndarray, max_bucket: int):
    """ALL within-bucket (id_a < id_b) pairs for every bucket at once —
    pure numpy (sort + repeat/arange index algebra), zero per-bucket Python.
    Buckets larger than ``max_bucket`` are dropped (degenerate-bucket guard).
    Returns (a_pos, b_pos): positions into the SORTED order, plus that order
    — callers gather ids (and any per-row payload) through them."""
    order = np.lexsort((ids, bkey))
    bk = bkey[order]
    n = len(bk)
    new = np.ones(n, dtype=bool)
    if n:
        new[1:] = bk[1:] != bk[:-1]
    gstart = np.flatnonzero(new)
    gsize = np.diff(np.append(gstart, n))
    gidx = np.cumsum(new) - 1
    local = np.arange(n, dtype=np.int64) - gstart[gidx]
    # element e (the LATER pair member) contributes `local` pairs; capped
    # buckets contribute none
    lens = np.where(gsize[gidx] <= max_bucket, local, 0)
    total = int(lens.sum())
    b_pos = np.repeat(np.arange(n, dtype=np.int64), lens)
    cum = np.concatenate([[0], np.cumsum(lens)[:-1]])
    a_pos = np.repeat(gstart[gidx], lens) + (
        np.arange(total, dtype=np.int64) - np.repeat(cum, lens))
    return a_pos, b_pos, order


# ----------------------------------------------------------------- exact


def dedup_exact_by_key(ds, *, key_col: str = "url", ts_col: str | None = None,
                       num_partitions: int = 64):
    """Last-writer-wins per key (updateDocument semantics,
    index/IndexWriter.java:1815). With ``ts_col``, the max-ts row per key
    survives; without, one row per key (first in key-partition order).

    Vectorized end-to-end: per-batch pre-reduce (duplicates that share a
    batch collapse before the shuffle) → hash-partitioned per-partition
    pandas ``drop_duplicates`` — one vectorized call per PARTITION, never one
    per key."""

    def lww(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        if ts_col is not None:
            df = df.sort_values([ts_col, key_col], kind="stable")
            df = df.drop_duplicates(subset=[key_col], keep="last")
        else:
            df = df.drop_duplicates(subset=[key_col], keep="first")
        return pa.Table.from_pandas(df.reset_index(drop=True),
                                    preserve_index=False).cast(t.schema)

    # map-side combine: batch-local LWW cuts shuffle bytes when dupes cluster
    pre = ds.map_batches(lww, batch_format="pyarrow")
    return partition_reduce(pre, [key_col], lww, num_partitions=num_partitions)


def content_hash_batch(batch: pa.Table, *, text_col: str = "text") -> pa.Table:
    """Add md5 content hash (matches DuckDB ``md5(text)`` for the oracle)."""
    hashes = [hashlib.md5(t.encode()).hexdigest() for t in batch.column(text_col).to_pylist()]
    return batch.append_column("content_hash", pa.array(hashes, type=pa.string()))


def dedup_exact_content(ds, *, text_col: str = "text", id_col: str = "doc_id",
                        num_partitions: int = 64):
    """Exact content dedup: md5(text) → batch-local min-id pre-aggregate →
    hash-partitioned per-partition Arrow ``group_by(...).aggregate(min)`` —
    fully vectorized (one C++ group_by per partition / per batch; zero
    per-key Python). Returns the surviving (content_hash, id) rows."""

    def hash_and_combine(batch: pa.Table) -> pa.Table:
        t = content_hash_batch(batch, text_col=text_col).select(
            ["content_hash", id_col])
        out = t.group_by("content_hash").aggregate([(id_col, "min")])
        out = out.rename_columns(["content_hash", id_col])
        return add_partition_col(out, ["content_hash"], num_partitions)

    def reduce_min(t: pa.Table) -> pa.Table:
        out = t.group_by("content_hash").aggregate([(id_col, "min")])
        return out.rename_columns(["content_hash", id_col])

    pre = ds.map_batches(hash_and_combine, batch_format="pyarrow")
    return partition_reduce(pre, ["content_hash"], reduce_min,
                            num_partitions=num_partitions, pre_partitioned=True)


def duplicate_ngram_spans(ds, *, n: int = 8, min_docs: int = 2,
                          text_col: str = "text", id_col: str = "doc_id",
                          num_partitions: int = 64):
    """Exact duplicated n-gram spans across documents — the substring-dedup
    primitive of training-data curation (find every n-token window occurring
    in ≥ ``min_docs`` distinct docs, e.g. boilerplate or cross-document
    copies; the reference's shingle machinery is the same building block,
    analysis/common/.../shingle/ShingleFilter.java).

    Map side: per-doc DISTINCT grams (vectorized shingles, set-deduped per
    doc so a doc repeating its own phrase counts once); reduce side: one
    Arrow group_by count per partition; filter ≥ min_docs. Returns Dataset
    (gram, n_docs). Only duplicated grams are ever shuffled beyond the
    map-side distinct — the output is boilerplate-sized, not corpus-sized.
    """
    def grams(batch: pa.Table) -> pa.Table:
        texts = batch.column(text_col).to_pylist()
        ids = batch.column(id_col).to_numpy(zero_copy_only=False)
        out_g: list[str] = []
        out_i: list[int] = []
        for i, toks in enumerate(_simple_tokens(texts)):
            if len(toks) < n:
                continue
            gs = set(" ".join(toks[j : j + n]) for j in range(len(toks) - n + 1))
            out_g.extend(gs)
            out_i.extend([int(ids[i])] * len(gs))
        t = pa.table({"gram": pa.array(out_g, type=pa.string()),
                      id_col: pa.array(out_i, type=pa.int64())})
        return add_partition_col(t, ["gram"], num_partitions)

    def reduce_count(t: pa.Table) -> pa.Table:
        agg = t.group_by("gram").aggregate([(id_col, "count_distinct")])
        agg = agg.rename_columns(["gram", "n_docs"])
        import pyarrow.compute as pc

        return agg.filter(pc.greater_equal(agg.column("n_docs"), min_docs))

    pre = ds.map_batches(grams, batch_format="pyarrow")
    return partition_reduce(pre, ["gram"], reduce_count,
                            num_partitions=num_partitions, pre_partitioned=True)


# ----------------------------------------------------------------- minhash


class MinHashSignatures:
    """Per-batch MinHash signature computation (actor-friendly: the permutation
    parameters are built once in __init__).

    num_perm universal-hash permutations h_i(x) = (a_i*x + b_i) mod p over
    64-bit shingle hashes; signature matrix row-min per doc. Deterministic
    (seed-derived a/b).
    """

    def __init__(self, *, num_perm: int = 64, shingle: int = 3, seed: int = 42,
                 text_col: str = "text", id_col: str = "doc_id"):
        rng = np.random.default_rng(seed)
        self.a = rng.integers(1, (1 << 61) - 1, size=num_perm, dtype=np.uint64) | np.uint64(1)
        self.b = rng.integers(0, (1 << 61) - 1, size=num_perm, dtype=np.uint64)
        self.num_perm = num_perm
        self.shingle = shingle
        self.text_col = text_col
        self.id_col = id_col

    def signature(self, tokens: list[str]) -> np.ndarray:
        sh = _shingles(tokens, self.shingle)
        if not sh:
            return np.full(self.num_perm, np.iinfo(np.uint64).max, dtype=np.uint64)
        h = _hash_tokens_u64(sh)  # (S,)
        # (P, S) permuted hashes — vectorized, then row min
        hp = (self.a[:, None] * h[None, :] + self.b[:, None]) % _MERSENNE
        return hp.min(axis=1)

    def __call__(self, batch: pa.Table) -> pa.Table:
        toks = _simple_tokens(batch.column(self.text_col).to_pylist())
        sigs = np.stack([self.signature(t) for t in toks])
        return pa.table(
            {
                self.id_col: batch.column(self.id_col),
                "minhash": pa.array(list(sigs), type=pa.list_(pa.uint64())),
            }
        )


def minhash_lsh_pairs(
    ds,
    *,
    num_perm: int = 64,
    bands: int = 16,
    shingle: int = 3,
    threshold: float = 0.5,
    text_col: str = "text",
    id_col: str = "doc_id",
    seed: int = 42,
    max_bucket: int = 500,
):
    """MinHash+LSH near-duplicate pairs, verified by true shingle Jaccard.

    Stages: signatures (actor pool) → explode to (band_id, band_hash, id)
    → groupby band bucket → candidate pairs → distributed pair dedup →
    hash-join pairs to shingle payloads → exact Jaccard inside map_batches.
    Returns Dataset (id_a, id_b, jaccard), id_a < id_b, jaccard >= threshold.
    """
    import pandas as pd
    import ray

    rows_per_band = num_perm // bands
    # plain tasks, not an actor pool: MinHashSignatures' per-worker setup is
    # microseconds (derive a/b from the seed), so pool spin-up would cost
    # more than it amortizes; the instance pickles with the task
    sig_ds = ds.map_batches(
        MinHashSignatures(num_perm=num_perm, shingle=shingle, seed=seed,
                          text_col=text_col, id_col=id_col),
        batch_format="pyarrow",
    )

    def explode(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_numpy(zero_copy_only=False)
        sigs = np.array(batch.column("minhash").to_pylist(), dtype=np.uint64)
        n = len(ids)
        out_ids = np.repeat(ids, bands)
        bh = np.empty(n * bands, dtype=np.uint64)
        for bnd in range(bands):
            seg = sigs[:, bnd * rows_per_band : (bnd + 1) * rows_per_band]
            acc = np.full(n, np.uint64(bnd) + np.uint64(0x9E3779B9), dtype=np.uint64)
            for c in range(seg.shape[1]):  # tiny loop over rows_per_band
                acc = acc * np.uint64(1099511628211) + seg[:, c]
            bh[bnd::bands] = acc
        # band_id is folded into the bucket hash (seeded accumulator) — one
        # u64 bucket key per (band, signature slice)
        return pa.table(
            {
                id_col: pa.array(out_ids),
                "band_hash": pa.array(bh, type=pa.uint64()),
            }
        )

    buckets = sig_ds.map_batches(explode, batch_format="pyarrow")

    def emit_part(t: pa.Table) -> pa.Table:
        # vectorized within-bucket pair emission for EVERY bucket in this
        # partition (degenerate buckets above the cap dropped — other bands
        # still pair the genuinely-near docs)
        ids = t.column(id_col).to_numpy(zero_copy_only=False).astype(np.int64)
        bk = t.column("band_hash").to_numpy()
        a_pos, b_pos, order = _emit_bucket_pairs(bk, ids, max_bucket)
        sid = ids[order]
        return pa.table({"id_a": pa.array(sid[a_pos]),
                         "id_b": pa.array(sid[b_pos])})

    cand = partition_reduce(buckets, ["band_hash"], emit_part)
    cand = _dedup_pairs(cand)
    if cand is None:
        return _empty_pairs("jaccard")

    # distributed verification (no driver materialization): join the (small)
    # candidate-pair set back to a per-doc shingle-set payload — two hash
    # joins co-partition pairs with their payloads, the exact Jaccard runs
    # inside map_batches. Payload lists are serialized to binary because the
    # Acero hash join only ships fixed/binary non-key columns.
    def shingle_payload(batch: pa.Table) -> pa.Table:
        toks = _simple_tokens(batch.column(text_col).to_pylist())
        sh = ["\x1e".join(sorted(set(_shingles(t, shingle)))) for t in toks]
        return pa.table(
            {
                "pid": batch.column(id_col),
                "payload": pa.array([x.encode() for x in sh], type=pa.binary()),
            }
        )

    def verify(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return _empty_pairs_table("jaccard")
        pa_sets = [set(x.decode().split("\x1e")) if x else set()
                   for x in batch.column("payload_a").to_pylist()]
        pb_sets = [set(x.decode().split("\x1e")) if x else set()
                   for x in batch.column("payload_b").to_pylist()]
        ja = np.empty(len(pa_sets))
        for i, (sa, sb) in enumerate(zip(pa_sets, pb_sets)):
            inter = len(sa & sb)
            union = len(sa) + len(sb) - inter
            ja[i] = inter / union if union else 0.0
        keep = ja >= threshold
        return pa.table(
            {
                "id_a": batch.column("id_a").filter(pa.array(keep)),
                "id_b": batch.column("id_b").filter(pa.array(keep)),
                "jaccard": pa.array(ja[keep], type=pa.float64()),
            }
        )

    joined = _join_pair_payloads(cand, ds, shingle_payload, id_col)
    return joined.map_batches(verify, batch_format="pyarrow").sort(["id_a", "id_b"])


def _dedup_pairs(cand):
    """Distributed (id_a, id_b) dedup — vectorized distinct (one Arrow
    group_by per partition, no per-pair Python). Returns the materialized
    (small, output-sized) candidate set, or None when empty."""
    cand = distinct_rows(cand, ["id_a", "id_b"]).materialize()
    return cand if cand.count() else None


def _empty_pairs_table(metric: str) -> pa.Table:
    return pa.table(
        {
            "id_a": pa.array([], type=pa.int64()),
            "id_b": pa.array([], type=pa.int64()),
            metric: pa.array([], type=pa.float64()),
        }
    )


def _empty_pairs(metric: str):
    import pandas as pd
    import ray.data

    return ray.data.from_pandas(
        pd.DataFrame({"id_a": pd.Series([], dtype="int64"),
                      "id_b": pd.Series([], dtype="int64"),
                      metric: pd.Series([], dtype="float64")})
    )


def _attach_payload(pairs, payload, key: str, out_col: str,
                    num_partitions: int = 64):
    """Reduce-side hash join of one pair column to its payload, VECTORIZED:
    both sides are tagged and hash-partitioned on the join key, and each
    partition runs ONE pandas merge (a C hash join) — no per-key Python.
    ``pairs``'s other columns ride along; inner-join semantics."""
    import pandas as pd

    _sch0 = pairs.schema()
    pair_cols = list(_sch0.names)
    _types = dict(zip(_sch0.names, _sch0.types))

    def tag_pairs(b: pa.Table) -> pa.Table:
        b = b.append_column("__pid", b.column(key).cast(pa.int64()))
        b = b.append_column("__pay", pa.nulls(b.num_rows, type=pa.binary()))
        b = b.append_column("__side", pa.array(
            np.zeros(b.num_rows, dtype=np.int8), type=pa.int8()))
        return add_partition_col(b, ["__pid"], num_partitions)

    def tag_payload(b: pa.Table) -> pa.Table:
        t = pa.table({
            **{c: pa.nulls(b.num_rows, type=_types[c])
               for c in pair_cols},
            "__pid": b.column("pid").cast(pa.int64()),
            "__pay": b.column("payload"),
            "__side": pa.array(np.ones(b.num_rows, dtype=np.int8),
                               type=pa.int8()),
        })
        return add_partition_col(t, ["__pid"], num_partitions)

    both = pairs.map_batches(tag_pairs, batch_format="pyarrow").union(
        payload.map_batches(tag_payload, batch_format="pyarrow"))

    target = pa.schema([pa.field(c, _types[c]) for c in pair_cols]
                       + [pa.field(out_col, pa.binary())])

    def join_part(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        pr = df[df["__side"] == 0]
        py = df[df["__side"] == 1][["__pid", "__pay"]]
        merged = pr.merge(py, on="__pid", how="inner", suffixes=("", "_r"))
        out = merged[pair_cols].copy()
        out[out_col] = merged["__pay_r"].values
        # null-padded union rows widened int columns to float in pandas —
        # cast back to the pair schema
        return pa.Table.from_pandas(
            out.reset_index(drop=True), preserve_index=False
        ).cast(target)

    return partition_reduce(both, ["__pid"], join_part,
                            num_partitions=num_partitions,
                            pre_partitioned=True)


def _join_pair_payloads(cand, source_ds, payload_fn, id_col: str, *,
                        broadcast_limit: int = 100_000):
    """Pair↔payload join: (id_a,id_b) pairs + per-doc payloads →
    (id_a,id_b,payload_a,payload_b). ``payload_fn`` is a per-batch map
    producing (pid, payload) from the raw source rows — it runs ONLY on the
    rows that can matter. ADAPTIVE like a real planner's
    broadcast-vs-shuffle join choice:

    * candidate sets ≤ ``broadcast_limit`` (the common case — LSH bucket
      caps bound the pair count): ship the pair-id set to a map-side filter
      on the RAW source, compute payloads for the pairs-sized survivor set
      only (the expensive tokenize/vector work never touches the rest of
      the corpus), and merge once;
    * larger sets: payloads for all rows + two vectorized reduce-side hash
      joins (one pandas merge per partition — nothing corpus-sized touches
      the driver).

    (Dataset.join would be the natural operator, but its hash-shuffle
    aggregator rejects empty partitions in chained joins as of Ray 2.49.)"""
    n_pairs = cand.count()  # cand is already materialized by _dedup_pairs
    if n_pairs <= broadcast_limit:
        import ray
        import ray.data

        cd = cand.to_pandas()
        ids = np.unique(np.concatenate([cd["id_a"].values, cd["id_b"].values]))
        ref = ray.put(ids)

        def filt(b: pa.Table) -> pa.Table:
            pid = b.column(id_col).to_numpy(zero_copy_only=False)
            return b.filter(pa.array(np.isin(pid, ray.get(ref))))

        pay = (source_ds.map_batches(filt, batch_format="pyarrow")
               .map_batches(payload_fn, batch_format="pyarrow").to_pandas())
        m = cd.merge(pay.rename(columns={"pid": "id_a", "payload": "payload_a"}),
                     on="id_a", how="inner")
        m = m.merge(pay.rename(columns={"pid": "id_b", "payload": "payload_b"}),
                    on="id_b", how="inner")
        cols = list(cd.columns) + ["payload_a", "payload_b"]
        return ray.data.from_pandas(m[cols].reset_index(drop=True))
    payload = source_ds.map_batches(payload_fn, batch_format="pyarrow")
    half = _attach_payload(cand, payload, "id_a", "payload_a")
    return _attach_payload(half, payload, "id_b", "payload_b")


# ----------------------------------------------------------------- simhash


class SimHash:
    """64-bit SimHash per doc from tf-weighted token hashes (vectorized)."""

    def __init__(self, *, text_col: str = "text", id_col: str = "doc_id"):
        self.text_col = text_col
        self.id_col = id_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch.column(self.text_col).to_pylist()
        out = np.empty(len(texts), dtype=np.uint64)
        for i, toks in enumerate(_simple_tokens(texts)):
            if not toks:
                out[i] = 0
                continue
            uniq, counts = np.unique(np.array(toks, dtype=object), return_counts=True)
            h = _hash_tokens_u64(uniq.tolist())
            bits = ((h[:, None] >> np.arange(64, dtype=np.uint64)) & 1).astype(np.int64)
            v = ((bits * 2 - 1) * counts[:, None]).sum(axis=0)
            out[i] = np.uint64(((v > 0).astype(np.uint64) << np.arange(64, dtype=np.uint64)).sum())
        return pa.table(
            {
                self.id_col: batch.column(self.id_col),
                "simhash": pa.array(out, type=pa.uint64()),
            }
        )


def simhash_signatures(ds, *, text_col: str = "text", id_col: str = "doc_id"):
    fn = SimHash(text_col=text_col, id_col=id_col)
    return ds.map_batches(lambda b: fn(b), batch_format="pyarrow")


def simhash_near_pairs(ds, *, max_hamming: int = 3, text_col: str = "text",
                       id_col: str = "doc_id", max_bucket: int = 500):
    """Near-dup pairs by SimHash: band the 64 bits into 4×16-bit chunks
    (any pair within hamming distance 3 shares ≥1 exact chunk), groupby
    chunk value for candidates, verify hamming distance. Buckets above
    ``max_bucket`` (degenerate: boilerplate/empty docs hashing alike) are
    dropped rather than exploded O(bucket²) — same guard as the MinHash
    path."""
    import pandas as pd
    import ray

    sig = simhash_signatures(ds, text_col=text_col, id_col=id_col)

    def explode(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_numpy(zero_copy_only=False)
        h = batch.column("simhash").to_numpy()
        chunks = []
        for c in range(4):
            chunks.append((h >> np.uint64(16 * c)) & np.uint64(0xFFFF))
        return pa.table(
            {
                id_col: pa.array(np.repeat(ids, 4)),
                "chunk_id": pa.array(np.tile(np.arange(4), len(ids)), type=pa.int32()),
                "chunk_val": pa.array(np.stack(chunks, axis=1).ravel(), type=pa.uint64()),
                "simhash": pa.array(np.repeat(h, 4), type=pa.uint64()),
            }
        )

    def emit_part(t: pa.Table) -> pa.Table:
        # vectorized: all within-bucket pairs (capped) + popcount hamming
        # verification in one numpy pass — no per-bucket or per-pair Python
        ids = t.column(id_col).to_numpy(zero_copy_only=False).astype(np.int64)
        cid = t.column("chunk_id").to_numpy().astype(np.uint64)
        cval = t.column("chunk_val").to_numpy().astype(np.uint64)
        sh = t.column("simhash").to_numpy().astype(np.uint64)
        bk = cval * np.uint64(5) + cid  # chunk id folded into bucket key
        a_pos, b_pos, order = _emit_bucket_pairs(bk, ids, max_bucket)
        sid, ssh = ids[order], sh[order]
        ham = popcount64(ssh[a_pos] ^ ssh[b_pos]).astype(np.int64)
        keep = ham <= max_hamming
        return pa.table({"id_a": pa.array(sid[a_pos][keep]),
                         "id_b": pa.array(sid[b_pos][keep]),
                         "hamming": pa.array(ham[keep])})

    pairs = partition_reduce(
        sig.map_batches(explode, batch_format="pyarrow"),
        ["chunk_id", "chunk_val"], emit_part,
    )
    # chunks already verified hamming inside the bucket groupby; pairs found
    # by multiple chunks collapse in a vectorized distributed distinct —
    # no driver materialization, no per-pair Python
    def reduce_min(t: pa.Table) -> pa.Table:
        out = t.group_by(["id_a", "id_b"]).aggregate([("hamming", "min")])
        return out.rename_columns(["id_a", "id_b", "hamming"])

    deduped = partition_reduce(pairs, ["id_a", "id_b"], reduce_min)
    return deduped.sort(["id_a", "id_b"])


# ------------------------------------------------------- embedding near-dup


def embedding_near_dup_pairs(
    ds,
    *,
    threshold: float = 0.95,
    n_bits: int = 192,
    bands: int = 12,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    seed: int = 42,
    max_bucket: int = 500,
):
    """Embedding-cosine near-duplicate pairs via random-hyperplane LSH.

    Per-batch: project embeddings onto ``n_bits`` seeded random hyperplanes →
    sign bits (a SimHash over the embedding space; two vectors agree on a bit
    with probability 1 − θ/π) → band the bits → groupby band buckets →
    candidate pairs → DISTRIBUTED exact-cosine verification (hash join of
    pairs to vector payloads + vectorized cosine inside map_batches; nothing
    corpus-sized ever reaches the driver). Returns (id_a, id_b, cosine) with
    cosine ≥ threshold, id_a < id_b.

    Scale guards: 16-bit band hashes (65 536 buckets per band — 8-bit bands
    collapse a large corpus into 256 buckets and the candidate stage decays
    toward all-pairs) and a ``max_bucket`` cap that drops degenerate buckets
    instead of emitting O(bucket²) pairs. Recall at the threshold: with
    p_bit = 1 − θ/π ≈ 0.899 at cosine 0.95, a 16-bit band matches with
    p ≈ 0.18, so 12 bands give ≈ 0.91 candidate recall for pairs AT the
    threshold (8 bands would give ≈ 0.80); pairs well above the threshold
    approach recall 1 regardless. Band count, not band width, buys recall.
    """
    import pandas as pd
    import ray

    first = ds.take(1)[0]
    dim = len(first[vec_col])
    rng = np.random.default_rng(seed)
    planes = rng.standard_normal((dim, n_bits))
    pref = ray.put(planes)
    bits_per_band = n_bits // bands

    def signature(batch: pa.Table) -> pa.Table:
        P = ray.get(pref)
        v = np.array(batch.column(vec_col).to_pylist(), dtype=np.float64)
        v = v / np.maximum(np.linalg.norm(v, axis=1, keepdims=True), 1e-30)
        bits = (v @ P) > 0  # (n, n_bits)
        ids = batch.column(id_col).to_numpy(zero_copy_only=False)
        n = len(ids)
        out_ids = np.repeat(ids, bands)
        weights = 1 << np.arange(bits_per_band, dtype=np.uint64)
        bh = np.empty(n * bands, dtype=np.uint64)
        for bnd in range(bands):
            seg = bits[:, bnd * bits_per_band : (bnd + 1) * bits_per_band]
            # band id folded into the bucket key (seeded multiplier)
            bh[bnd::bands] = (
                (seg.astype(np.uint64) @ weights)
                * np.uint64(0x9E3779B97F4A7C15)
                + np.uint64(bnd)
            )
        return pa.table(
            {
                id_col: pa.array(out_ids),
                "band_hash": pa.array(bh, type=pa.uint64()),
            }
        )

    buckets = ds.map_batches(signature, batch_format="pyarrow")

    def emit_part(t: pa.Table) -> pa.Table:
        ids = t.column(id_col).to_numpy(zero_copy_only=False).astype(np.int64)
        bk = t.column("band_hash").to_numpy()
        a_pos, b_pos, order = _emit_bucket_pairs(bk, ids, max_bucket)
        sid = ids[order]
        return pa.table({"id_a": pa.array(sid[a_pos]),
                         "id_b": pa.array(sid[b_pos])})

    cand = partition_reduce(buckets, ["band_hash"], emit_part)
    cand = _dedup_pairs(cand)
    if cand is None:
        return _empty_pairs("cosine")

    # distributed verification: hash-join pairs to a (pid, vector-bytes)
    # payload, exact cosine vectorized inside map_batches
    def vec_payload(batch: pa.Table) -> pa.Table:
        v = np.array(batch.column(vec_col).to_pylist(), dtype=np.float64)
        return pa.table(
            {
                "pid": batch.column(id_col),
                "payload": pa.array([row.tobytes() for row in v], type=pa.binary()),
            }
        )

    def verify(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return _empty_pairs_table("cosine")
        va = np.stack([np.frombuffer(x, dtype=np.float64)
                       for x in batch.column("payload_a").to_pylist()])
        vb = np.stack([np.frombuffer(x, dtype=np.float64)
                       for x in batch.column("payload_b").to_pylist()])
        na = np.maximum(np.linalg.norm(va, axis=1), 1e-30)
        nb = np.maximum(np.linalg.norm(vb, axis=1), 1e-30)
        cos = np.einsum("ij,ij->i", va, vb) / (na * nb)
        keep = cos >= threshold
        return pa.table(
            {
                "id_a": batch.column("id_a").filter(pa.array(keep)),
                "id_b": batch.column("id_b").filter(pa.array(keep)),
                "cosine": pa.array(cos[keep], type=pa.float64()),
            }
        )

    joined = _join_pair_payloads(cand, ds, vec_payload, id_col)
    return joined.map_batches(verify, batch_format="pyarrow").sort(["id_a", "id_b"])

"""Similarity search over embedding columns — brute-force cosine top-k and an
IVF (inverted-file) bucketed variant for the scale path.

Brute force: the query matrix is broadcast ONCE via ``ray.put``; each batch
computes a (batch × dim) @ (dim × q) float64 matmul and emits its local
top-k per query; a final small groupby merges — no all-to-all shuffle, the
reduction is per-query over per-batch candidates (exactly the per-segment
top-k + merge pattern the text searcher uses).

IVF: deterministic k-means-lite centroids (seeded sample, few Lloyd
iterations via per-batch partial sums), assign each vector to its nearest
centroid in a map_batches pass, search only the ``nprobe`` closest centroid
buckets per query. Recall measured against brute force in tests.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


def _batch_vectors(batch: pa.Table, vec_col: str) -> np.ndarray:
    return np.array(batch.column(vec_col).to_pylist(), dtype=np.float64)


class BruteForceTopK:
    """map_batches callable: per-batch cosine top-k against broadcast queries."""

    def __init__(self, queries_ref, k: int, vec_col: str, id_col: str,
                 exclude_self: bool = True):
        import ray

        q = ray.get(queries_ref) if not isinstance(queries_ref, tuple) else queries_ref
        self.query_ids, qm = q
        qm = np.asarray(qm, dtype=np.float64)
        self.qnorm = qm / np.linalg.norm(qm, axis=1, keepdims=True)
        self.k = k
        self.vec_col = vec_col
        self.id_col = id_col
        self.exclude_self = exclude_self

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column(self.id_col).to_numpy(zero_copy_only=False)
        v = _batch_vectors(batch, self.vec_col)
        v = v / np.maximum(np.linalg.norm(v, axis=1, keepdims=True), 1e-30)
        sims = v @ self.qnorm.T  # (n, q)
        out_q, out_id, out_sim = [], [], []
        for qi, qid in enumerate(self.query_ids):
            col = sims[:, qi]
            mask = ids != qid if self.exclude_self else np.ones(len(ids), bool)
            idx = np.flatnonzero(mask)
            if not len(idx):
                continue
            take = idx[np.argsort(-col[idx], kind="stable")[: self.k]]
            out_q.extend([qid] * len(take))
            out_id.extend(ids[take].tolist())
            out_sim.extend(col[take].tolist())
        return pa.table(
            {
                "query_id": pa.array(out_q, type=pa.int64()),
                "neighbor_id": pa.array(out_id, type=pa.int64()),
                "cosine": pa.array(np.array(out_sim, dtype=np.float64)),
            }
        )


def knn_brute_force(ds, query_ids, query_vecs, *, k: int = 10, vec_col: str = "embedding",
                    id_col: str = "vec_id", concurrency: int = 4, exclude_self: bool = True):
    """Exact cosine top-k for each query vector. Returns Dataset
    (query_id, rank, neighbor_id, cosine)."""
    import ray

    ref = ray.put((list(query_ids), np.asarray(query_vecs, dtype=np.float64)))
    cand = ds.map_batches(
        BruteForceTopK,
        fn_constructor_args=(ref, k, vec_col, id_col, exclude_self),
        batch_format="pyarrow",
        concurrency=(1, concurrency),
    )

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["cosine", "neighbor_id"], ascending=[False, True]).head(k)
        g = g.reset_index(drop=True)
        g["rank"] = np.arange(1, len(g) + 1)
        return g[["query_id", "rank", "neighbor_id", "cosine"]]

    return cand.groupby("query_id").map_groups(merge, batch_format="pandas")


# ----------------------------------------------------------------------- IVF


def train_centroids(ds, *, n_centroids: int = 16, vec_col: str = "embedding",
                    iters: int = 5, seed: int = 42, sample_rows: int = 2048) -> np.ndarray:
    """Deterministic k-means-lite: seeded sample for init, Lloyd iterations
    with per-batch partial sums (map_batches combiner → driver reduce)."""
    sample = ds.limit(sample_rows).take_all()
    X0 = np.array([r[vec_col] for r in sample], dtype=np.float64)
    rng = np.random.default_rng(seed)
    cent = X0[rng.choice(len(X0), size=min(n_centroids, len(X0)), replace=False)]
    cent = cent / np.maximum(np.linalg.norm(cent, axis=1, keepdims=True), 1e-30)

    for _ in range(iters):
        import ray

        cref = ray.put(cent)

        def partials(batch: pa.Table) -> pa.Table:
            c = ray.get(cref)
            v = _batch_vectors(batch, vec_col)
            vn = v / np.maximum(np.linalg.norm(v, axis=1, keepdims=True), 1e-30)
            assign = np.argmax(vn @ c.T, axis=1)
            sums = np.zeros_like(c)
            np.add.at(sums, assign, vn)
            counts = np.bincount(assign, minlength=len(c)).astype(np.int64)
            return pa.table(
                {
                    "centroid": pa.array(np.arange(len(c), dtype=np.int64)),
                    "sum": pa.array(list(sums), type=pa.list_(pa.float64())),
                    "count": pa.array(counts),
                }
            )

        # bounded collect (n_batches × n_centroids rows), reduced vectorized
        sums = np.zeros_like(cent)
        counts = np.zeros(len(cent), dtype=np.int64)
        for t in ds.map_batches(partials, batch_format="pyarrow") \
                   .iter_batches(batch_format="pyarrow"):
            if not t.num_rows:
                continue
            ci = t.column("centroid").to_numpy(zero_copy_only=False)
            sv = np.asarray(t.column("sum").combine_chunks()
                            .flatten().to_numpy(zero_copy_only=False)
                            ).reshape(t.num_rows, -1)
            np.add.at(sums, ci, sv)
            np.add.at(counts, ci,
                      t.column("count").to_numpy(zero_copy_only=False))
        nz = counts > 0
        cent[nz] = sums[nz] / counts[nz, None]
        cent = cent / np.maximum(np.linalg.norm(cent, axis=1, keepdims=True), 1e-30)
    return cent


def knn_ivf(ds, query_ids, query_vecs, *, k: int = 10, n_centroids: int = 16,
            nprobe: int = 4, vec_col: str = "embedding", id_col: str = "vec_id",
            concurrency: int = 4, seed: int = 42):
    """IVF-bucketed approximate top-k: probe only the nprobe nearest centroid
    buckets per query. Returns (query_id, rank, neighbor_id, cosine)."""
    import ray

    cent = train_centroids(ds, n_centroids=n_centroids, vec_col=vec_col, seed=seed)
    cref = ray.put(cent)
    qv = np.asarray(query_vecs, dtype=np.float64)
    qn = qv / np.maximum(np.linalg.norm(qv, axis=1, keepdims=True), 1e-30)
    probe = np.argsort(-(qn @ cent.T), axis=1)[:, :nprobe]  # (q, nprobe)
    probe_sets = [set(p.tolist()) for p in probe]
    qref = ray.put((list(query_ids), qn, probe_sets))

    class ProbedTopK:
        def __init__(self):
            self.cent = ray.get(cref)
            self.query_ids, self.qn, self.probe_sets = ray.get(qref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            ids = batch.column(id_col).to_numpy(zero_copy_only=False)
            v = _batch_vectors(batch, vec_col)
            vn = v / np.maximum(np.linalg.norm(v, axis=1, keepdims=True), 1e-30)
            assign = np.argmax(vn @ self.cent.T, axis=1)
            sims = vn @ self.qn.T
            out_q, out_id, out_sim = [], [], []
            for qi, qid in enumerate(self.query_ids):
                in_bucket = np.isin(assign, list(self.probe_sets[qi])) & (ids != qid)
                idx = np.flatnonzero(in_bucket)
                if not len(idx):
                    continue
                take = idx[np.argsort(-sims[idx, qi], kind="stable")[:k]]
                out_q.extend([qid] * len(take))
                out_id.extend(ids[take].tolist())
                out_sim.extend(sims[take, qi].tolist())
            return pa.table(
                {
                    "query_id": pa.array(out_q, type=pa.int64()),
                    "neighbor_id": pa.array(out_id, type=pa.int64()),
                    "cosine": pa.array(np.array(out_sim, dtype=np.float64)),
                }
            )

    cand = ds.map_batches(ProbedTopK, batch_format="pyarrow",
                          concurrency=(1, concurrency))

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["cosine", "neighbor_id"], ascending=[False, True]).head(k)
        g = g.reset_index(drop=True)
        g["rank"] = np.arange(1, len(g) + 1)
        return g[["query_id", "rank", "neighbor_id", "cosine"]]

    return cand.groupby("query_id").map_groups(merge, batch_format="pandas")


# ------------------------------------------------- IVF with materialized layout


def build_ivf_index(ds, out_dir: str, *, n_centroids: int = 16,
                    vec_col: str = "embedding", id_col: str = "vec_id",
                    seed: int = 42) -> str:
    """Materialize an IVF BUCKETED layout: vectors written to one parquet
    directory PER CENTROID bucket (partitioned write via a bucket column).
    Query-time probing then reads only the ``nprobe`` bucket directories —
    pruning scan I/O, not just compute (the round-1 variant re-assigned
    vectors per query and still streamed every batch). Centroids persist
    alongside for assignment-free probing."""
    import json
    import os

    import pyarrow.parquet as pq
    import ray

    os.makedirs(out_dir, exist_ok=True)
    cent = train_centroids(ds, n_centroids=n_centroids, vec_col=vec_col, seed=seed)
    cref = ray.put(cent)

    def assign(batch: pa.Table) -> pa.Table:
        c = ray.get(cref)
        v = _batch_vectors(batch, vec_col)
        vn = v / np.maximum(np.linalg.norm(v, axis=1, keepdims=True), 1e-30)
        b = np.argmax(vn @ c.T, axis=1).astype(np.int64)
        return pa.table({id_col: batch.column(id_col),
                         vec_col: batch.column(vec_col),
                         "bucket": pa.array(b)})

    ds.map_batches(assign, batch_format="pyarrow").write_parquet(
        out_dir, partition_cols=["bucket"]
    )
    pq.write_table(
        pa.table({"centroid": pa.array(range(len(cent)), type=pa.int64()),
                  "vec": pa.array(list(cent), type=pa.list_(pa.float64()))}),
        os.path.join(out_dir, "centroids.parquet"),
    )
    with open(os.path.join(out_dir, "meta.json"), "w") as f:
        json.dump({"n_centroids": int(len(cent)), "vec_col": vec_col,
                   "id_col": id_col}, f)
    return out_dir


def knn_ivf_indexed(index_dir: str, query_ids, query_vecs, *, k: int = 10,
                    nprobe: int = 4, concurrency: int = 4):
    """Search a materialized IVF layout: per query set, compute the probed
    buckets from the persisted centroids, ``read_parquet`` ONLY those bucket
    directories (read-level pruning), brute-force within them, exact
    per-query merge."""
    import json
    import os

    import pandas as pd
    import pyarrow.parquet as pq
    import ray

    with open(os.path.join(index_dir, "meta.json")) as f:
        meta = json.load(f)
    vec_col, id_col = meta["vec_col"], meta["id_col"]
    ct = pq.read_table(os.path.join(index_dir, "centroids.parquet"))
    cent = np.array(ct.column("vec").to_pylist(), dtype=np.float64)
    qv = np.asarray(query_vecs, dtype=np.float64)
    qn = qv / np.maximum(np.linalg.norm(qv, axis=1, keepdims=True), 1e-30)
    probe = np.argsort(-(qn @ cent.T), axis=1)[:, :nprobe]
    buckets = sorted({int(b) for row in probe for b in row})
    import glob as _glob

    # read_parquet with a path LIST expects files — expand each probed
    # bucket directory (directories are only auto-expanded for single paths)
    paths = [
        f
        for b in buckets
        for f in sorted(_glob.glob(os.path.join(index_dir, f"bucket={b}", "*.parquet")))
    ]
    from lucene_ray.sources.io import read_parquet_clean

    sub = read_parquet_clean(paths)
    # per-query probe masks still apply within the union of read buckets
    import ray.data  # noqa: F401

    ref = ray.put((list(query_ids), qn, [set(p.tolist()) for p in probe], cent))

    def topk(batch: pa.Table) -> pa.Table:
        qids, qnn, probe_sets, c = ray.get(ref)
        ids = batch.column(id_col).to_numpy(zero_copy_only=False)
        v = _batch_vectors(batch, vec_col)
        vn = v / np.maximum(np.linalg.norm(v, axis=1, keepdims=True), 1e-30)
        assign = np.argmax(vn @ c.T, axis=1)
        sims = vn @ qnn.T
        out_q, out_id, out_sim = [], [], []
        for qi, qid in enumerate(qids):
            m = np.isin(assign, list(probe_sets[qi])) & (ids != qid)
            idx = np.flatnonzero(m)
            if not len(idx):
                continue
            take = idx[np.argsort(-sims[idx, qi], kind="stable")[:k]]
            out_q.extend([qid] * len(take))
            out_id.extend(ids[take].tolist())
            out_sim.extend(sims[take, qi].tolist())
        return pa.table({"query_id": pa.array(out_q, type=pa.int64()),
                         "neighbor_id": pa.array(out_id, type=pa.int64()),
                         "cosine": pa.array(np.array(out_sim, dtype=np.float64))})

    cand = sub.map_batches(topk, batch_format="pyarrow", concurrency=concurrency)

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["cosine", "neighbor_id"], ascending=[False, True]).head(k)
        g = g.reset_index(drop=True)
        g["rank"] = np.arange(1, len(g) + 1)
        return g[["query_id", "rank", "neighbor_id", "cosine"]]

    return cand.groupby("query_id").map_groups(merge, batch_format="pandas")

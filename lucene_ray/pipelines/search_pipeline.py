"""Distributed search — queries × segment shards through an actor pool.

The Ray analogue of IndexSearcher's slice execution (SURVEY §3.2): queries
are a small Dataset; each (query, shard) pair is scored by a stateful
``SearcherShard`` actor that loads its shard's SegmentReaders ONCE in
``__init__`` (term dict in RAM, the DirectoryReader analogue —
search/IndexSearcher.java leaf slices ≤250k docs); per-shard top-k rows are
then reduced per query with the exact (score desc, doc_key asc) merge —
``TopDocs.merge`` (search/TopDocs.java:202-227) as a
``groupby(query_id).map_groups``.

Partitioning assumption: per-shard top-k + exact merge is rank-identical to
a single-searcher run because BM25 statistics are GLOBAL (read from the
manifest + materialized term dictionary), so a document's score does not
depend on which shard scores it. Shards are groups of segments; the
default shards_per_actor keeps each actor's resident set bounded.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from lucene_ray.searcher import IndexSearcher


class SearcherShard:
    """Actor-pool callable: scores query batches against one or more segments.

    State loaded once per actor (__init__), reused across batches; an LRU of
    shard searchers bounds memory when an actor sees several shards.
    """

    def __init__(self, index_dir: str, mode: str, k: int, algo: str = "auto",
                 max_cached_shards: int = 8, query_chunks_ref=None):
        self.index_dir = index_dir
        self.mode = mode
        self.k = k
        self.algo = algo
        self.max_cached = max_cached_shards
        self._searchers: dict[tuple, IndexSearcher] = {}
        # query chunks are BROADCAST once (ray.put) and parsed once per actor
        # — each work row is (shard, chunk id), so the shipped rows are
        # O(shards × chunks), not O(queries × shards), and no query string is
        # ever re-parsed per shard (VERDICT r1 search-pipeline note)
        self._chunks = None
        self._parsed: dict[int, list] = {}
        if query_chunks_ref is not None:
            import ray

            self._chunks = ray.get(query_chunks_ref)

    def _parsed_chunk(self, ci: int):
        hit = self._parsed.get(ci)
        if hit is None:
            from lucene_ray.query import parse_query

            hit = self._parsed[ci] = [
                (qid, qtext, parse_query(qtext)) for qid, qtext in self._chunks[ci]
            ]
        return hit

    def _searcher(self, shard: tuple) -> IndexSearcher:
        s = self._searchers.get(shard)
        if s is None:
            if len(self._searchers) >= self.max_cached:
                self._searchers.pop(next(iter(self._searchers)))
            seg_names = [x for x in shard if not x.startswith("g")]  # drop gen tag
            s = IndexSearcher(self.index_dir, mode=self.mode, segment_names=seg_names)
            self._searchers[shard] = s
        return s

    def __call__(self, batch: pa.Table) -> pa.Table:
        qids, queries, keys, scores = [], [], [], []
        shards = batch.column("shard").to_pylist()
        chunk_ids = batch.column("qchunk").to_pylist()
        for ci, shard in zip(chunk_ids, shards):
            searcher = self._searcher(tuple(shard))
            for qid, qtext, q in self._parsed_chunk(int(ci)):
                td = searcher.search(q, k=self.k, algo=self.algo)
                for sd in td.score_docs:
                    qids.append(qid)
                    queries.append(qtext)
                    keys.append(sd.doc_key)
                    scores.append(sd.score)
        return pa.table(
            {
                "query_id": pa.array(qids, type=pa.int64()),
                "query": pa.array(queries, type=pa.string()),
                "doc_key": pa.array(keys),
                "score": pa.array(np.array(scores, dtype=np.float64)),
            }
        )


def search_distributed(
    index_dir: str,
    queries: list[str],
    *,
    k: int = 10,
    mode: str = "lucene",
    algo: str = "auto",
    concurrency: int = 4,
    shards_per_actor_segments: int | None = None,
    queries_per_chunk: int = 256,
):
    """Run the fixed query set against the index through an actor pool.

    Returns a Dataset with (query_id, query, rank, doc_key, score), ranks
    1..k per query, rank-identical to a local single-process search.
    """
    import ray.data

    from lucene_ray.state.manifest import Manifest

    manifest = Manifest.load(index_dir)
    names = [s["name"] for s in manifest.segments]
    if shards_per_actor_segments is None:
        # size shards so the (chunk x shard) work rows keep the whole pool
        # busy (~2 rows per actor) — with few big merged segments a fixed
        # shard size would collapse the stage to one or two tasks
        shards_per_actor_segments = max(
            1, -(-len(names) // (2 * max(1, concurrency)))
        )
    shards = [
        names[i : i + shards_per_actor_segments]
        for i in range(0, len(names), shards_per_actor_segments)
    ]
    import ray

    # the manifest generation rides along in the shard key: when a commit
    # advances the index (NRT refresh / merge / deletes), warm actors miss
    # their cache and reload the new point-in-time view — the replica
    # warm-then-swap behavior of the reference's nrt replicator
    chunks = [
        list(enumerate(queries))[i : i + queries_per_chunk]
        for i in range(0, len(queries), queries_per_chunk)
    ]
    qref = ray.put(chunks)
    items = [
        {"qchunk": ci, "shard": [f"g{manifest.gen}"] + shard}
        for ci in range(len(chunks))
        for shard in shards
    ]
    ds = ray.data.from_items(items)
    cand = ds.map_batches(
        SearcherShard,
        fn_constructor_kwargs=dict(index_dir=index_dir, mode=mode, k=k, algo=algo,
                                   query_chunks_ref=qref),
        batch_format="pyarrow",
        batch_size=max(1, len(items) // max(1, concurrency * 2)),
        concurrency=(1, concurrency),
        num_cpus=1,
    )

    def merge_topk(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["score", "doc_key"], ascending=[False, True]).head(k)
        g = g.reset_index(drop=True)
        g["rank"] = np.arange(1, len(g) + 1)
        return g[["query_id", "query", "rank", "doc_key", "score"]]

    return cand.groupby("query_id").map_groups(merge_topk, batch_format="pandas")

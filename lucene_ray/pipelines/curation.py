"""Corpus curation — the canonical training-data prep composition:

    quality filter → language filter → exact-content dedup

as ONE streaming Ray Data pipeline. Stage 1 is a single vectorized
``map_batches`` pass (token/quality stats + language gate + md5 content
hash, emitting only survivors, so rejected rows never enter the shuffle);
stage 2 is the hash-partitioned first-writer-wins groupby of the exact
dedup. At 100 TB the only all-to-all is over the (hash, id, n_tokens)
survivor triples — bytes per doc, not documents.

Thresholds are integer-exact (``n_stopwords * 5 <= n_tokens * 3`` instead
of a float ratio) so the DuckDB oracle reproduces the engine bit-for-bit.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

from lucene_ray.pipelines.textstats import QualityScore


class CurationStage:
    """Actor-friendly batch callable: stats + filters + hash in one pass."""

    def __init__(self, text_col: str = "text", id_col: str = "doc_id",
                 lang_col: str | None = "lang", langs: tuple = ("en",),
                 min_tokens: int = 5, max_stop_pct: int = 60):
        self.quality = QualityScore(text_col, id_col)
        self.text_col = text_col
        self.id_col = id_col
        self.lang_col = lang_col
        self.langs = frozenset(langs)
        self.min_tokens = int(min_tokens)
        self.max_stop_pct = int(max_stop_pct)  # n_stop*100 <= n_tok*pct

    def __call__(self, batch: pa.Table) -> pa.Table:
        s = self.quality(batch)
        nt = s.column("n_tokens").to_numpy()
        ns = s.column("n_stopwords").to_numpy()
        keep = (
            s.column("passes_quality").to_numpy(zero_copy_only=False)
            & (nt >= self.min_tokens)
            & (ns * 100 <= nt * self.max_stop_pct)
        )
        if self.lang_col is not None:
            langs = batch.column(self.lang_col).to_pylist()
            keep &= np.array([l in self.langs for l in langs], dtype=bool)
        idx = np.flatnonzero(keep)
        if not len(idx):
            return pa.table({
                self.id_col: pa.array([], type=batch.schema.field(self.id_col).type),
                "content_hash": pa.array([], type=pa.string()),
                "n_tokens": pa.array([], type=pa.int64()),
            })
        texts = batch.column(self.text_col).take(idx).to_pylist()
        hashes = [hashlib.md5(t.encode()).hexdigest() for t in texts]
        return pa.table({
            self.id_col: batch.column(self.id_col).take(idx),
            "content_hash": pa.array(hashes, type=pa.string()),
            "n_tokens": pa.array(nt[idx].astype(np.int64)),
        })


def curate_corpus(ds, *, text_col: str = "text", id_col: str = "doc_id",
                  lang_col: str | None = "lang", langs: tuple = ("en",),
                  min_tokens: int = 5, max_stop_pct: int = 60,
                  concurrency=None):
    """Streaming curation; returns the surviving (id, content_hash,
    n_tokens) rows, one per distinct content, smallest id wins.

    The dedup tail is the vectorized hash-partitioned reduce (one Arrow
    ``group_by`` per partition — see dedup.partition_reduce), never one
    Python call per distinct document. n_tokens is a pure function of the
    content (equal hash ⇒ equal text ⇒ equal count), so min-aggregating it
    alongside the id is exact."""
    from lucene_ray.pipelines.dedup import partition_reduce

    stage = CurationStage(text_col, id_col, lang_col, langs,
                          min_tokens, max_stop_pct)
    kw = {} if concurrency is None else {"concurrency": concurrency}
    out = ds.map_batches(stage, batch_format="pyarrow", **kw)

    def reduce_min(t: pa.Table) -> pa.Table:
        agg = t.group_by("content_hash").aggregate(
            [(id_col, "min"), ("n_tokens", "min")])
        agg = agg.rename_columns(["content_hash", id_col, "n_tokens"])
        return agg.select([id_col, "content_hash", "n_tokens"])

    return partition_reduce(out, ["content_hash"], reduce_min)

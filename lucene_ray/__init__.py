"""lucene_ray — a Ray-Data-native inverted-index build + BM25 query engine.

A from-scratch reimplementation of the query/data-processing capabilities of
Apache Lucene (reference: /root/reference, Lucene 9.0.0-dev) expressed in the
idioms of Ray Data: ``ray.data.Dataset`` pipelines of zero-copy Arrow batches,
``map_batches`` invert kernels, hash-partitioned segment builds, actor-pool
searchers, and manifest-based per-partition checkpointing.

Layout:
  functions/   pure kernels (analysis, similarity, norms, postings codec)
  state/       segment format, manifest (checkpoint/lineage), merge policy
  sources/     corpus synthesis + HTML extraction (Common-Crawl-style input)
  pipelines/   end-to-end drivers (index build, search, dedup, knn, textstats)
"""

from lucene_ray.functions.similarity import BM25Similarity
from lucene_ray.query import (
    BooleanQuery,
    BoostQuery,
    ConstantScoreQuery,
    DisjunctionMaxQuery,
    MatchAllDocsQuery,
    PhraseQuery,
    PrefixQuery,
    TermInSetQuery,
    TermQuery,
    parse_query,
)

__all__ = [
    "BM25Similarity",
    "TermQuery",
    "BooleanQuery",
    "PhraseQuery",
    "PrefixQuery",
    "TermInSetQuery",
    "MatchAllDocsQuery",
    "ConstantScoreQuery",
    "BoostQuery",
    "DisjunctionMaxQuery",
    "parse_query",
]

__version__ = "0.1.0"

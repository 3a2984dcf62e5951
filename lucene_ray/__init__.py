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

from lucene_ray.functions.similarity import (
    BM25Similarity,
    ClassicSimilarity,
    DFISimilarity,
    LMDirichletSimilarity,
    SweetSpotSimilarity,
)
from lucene_ray.query import (
    BooleanQuery,
    BoostQuery,
    ComplexPhraseQuery,
    ConstantScoreQuery,
    DisjunctionMaxQuery,
    FuzzyQuery,
    GeoPolygonQuery,
    PointNDRangeQuery,
    SortedSetContainsQuery,
    MatchAllDocsQuery,
    MultiPhraseQuery,
    PhraseQuery,
    PrefixQuery,
    RegexpQuery,
    SpanFirstQuery,
    SpanNearQuery,
    SpanNotQuery,
    SpanPositionRangeQuery,
    TermInSetQuery,
    TermQuery,
    TermRangeQuery,
    WildcardQuery,
    parse_complex_phrase_query,
    parse_multi_field_query,
    parse_query,
    parse_simple_query,
)
from lucene_ray.surround import parse_surround_query
from lucene_ray.xmlparser import parse_xml_query

__all__ = [
    "BM25Similarity",
    "ClassicSimilarity",
    "DFISimilarity",
    "LMDirichletSimilarity",
    "SweetSpotSimilarity",
    "GeoPolygonQuery",
    "PointNDRangeQuery",
    "SortedSetContainsQuery",
    "TermQuery",
    "BooleanQuery",
    "PhraseQuery",
    "MultiPhraseQuery",
    "ComplexPhraseQuery",
    "PrefixQuery",
    "WildcardQuery",
    "RegexpQuery",
    "FuzzyQuery",
    "TermRangeQuery",
    "TermInSetQuery",
    "MatchAllDocsQuery",
    "ConstantScoreQuery",
    "BoostQuery",
    "DisjunctionMaxQuery",
    "SpanNearQuery",
    "SpanFirstQuery",
    "SpanPositionRangeQuery",
    "SpanNotQuery",
    "StandardQueryParser",
    "AnalyzingSuggester",
    "InfixSuggester",
    "parse_query",
    "parse_simple_query",
    "parse_multi_field_query",
    "parse_complex_phrase_query",
    "parse_surround_query",
    "parse_xml_query",
]

from lucene_ray.flexible import StandardQueryParser  # noqa: E402
from lucene_ray.suggest import AnalyzingSuggester, InfixSuggester  # noqa: E402

__version__ = "0.1.0"

"""Flagship pipeline — Common-Crawl-style pages → inverted index → BM25 serving.

End-to-end composition (the north-star pipeline):

  synthesize/read corpus (url, warc_ts, html, text, lang)
    → extract_batch            html → text, byte-identity verified, html dropped
    → dedup by url             last-writer-wins on warc_ts (updateDocument)
    → build_index              hash-partitioned invert → segments → manifest
    → merge_index              tiered merges
    → search_distributed       actor-pool BM25 top-k

Every stage streams; nothing materializes the corpus on the driver.
"""

from __future__ import annotations

from lucene_ray.pipelines.index_pipeline import build_index
from lucene_ray.pipelines.search_pipeline import search_distributed
from lucene_ray.sources.corpus import extract_batch, synthesize_corpus
from lucene_ray.state.manifest import Manifest
from lucene_ray.state.merge import merge_index


# The fixed query set — EnwikiQueryMaker-style literal mix (~90 queries:
# single terms, ANDs, ORs, phrases, prefixes, fielded, boolean-modifier —
# benchmark/.../feeds/EnwikiQueryMaker.java:42-75 is a literal array the same
# way), generated deterministically from the corpus vocabulary.
_VOCAB = [
    "merge", "spark", "window", "data", "stream", "batch", "key", "value",
    "hash", "table", "scan", "join", "sort", "group", "small", "filter",
    "row", "column", "vector", "customer", "order", "line", "query", "part",
    "fast", "slow", "big", "dup", "agg", "the", "a",
]


def _build_query_set() -> list[str]:
    qs: list[str] = list(_VOCAB)                                   # 31 terms
    for i in range(0, 28, 2):                                       # 14 ANDs
        qs.append(f"{_VOCAB[i]} AND {_VOCAB[i + 1]}")
    for i in range(0, 27, 3):                                       # 9 3-term ORs
        qs.append(f"{_VOCAB[i]} {_VOCAB[i + 1]} {_VOCAB[i + 2]}")
    for i in range(0, 20, 2):                                       # 10 phrases
        qs.append(f'"{_VOCAB[i]} {_VOCAB[i + 1]}"')
    qs += ['"batch batch"', '"window window"', '"merge sort"']
    qs += ["s*", "b*", "w*", "qu*", "c*"]                            # prefixes
    qs += ["+filter -spark", "group NOT small", "merge AND window AND the",
           "sort OR window OR key"]
    qs += ["title:doc", "merge OR title:doc", "text:merge title:doc"]
    return qs


DEFAULT_QUERY_SET = _build_query_set()


def build_web_index(
    sf_dir: str,
    index_dir: str,
    *,
    replicas: int = 1,
    num_partitions: int = 16,
    dedup: bool = True,
    merge: bool = True,
    analyzer: str = "standard",
) -> Manifest:
    """Synthesize the web-page corpus from sf_dir's documents table and index
    its extracted text (key = url)."""
    ds = synthesize_corpus(sf_dir, replicas=replicas)
    ds = ds.map_batches(extract_batch, batch_format="pyarrow",
                        fn_kwargs={"include_title": True})
    manifest = build_index(
        ds,
        index_dir,
        key_col="url",
        text_col="text",
        text_cols=("title", "text"),  # multi-field: title + body
        num_partitions=num_partitions,
        analyzer=analyzer,
        dedup_exact=False,  # urls are unique post-synthesis; see dedup pipeline
    )
    if merge and len(manifest.segments) > 4:
        manifest = merge_index(index_dir, merge_factor=4)
    return manifest


def run_query_set(index_dir: str, queries=None, *, k: int = 10, mode: str = "lucene",
                  concurrency: int = 4):
    """Actor-pool search over the fixed query set → Dataset of ranked hits."""
    return search_distributed(index_dir, queries or DEFAULT_QUERY_SET, k=k, mode=mode,
                              concurrency=concurrency)

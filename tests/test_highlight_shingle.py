"""Highlighter fragments, shingle/ngram kernels, parser field syntax."""

from __future__ import annotations

import pytest

from lucene_ray.functions.analysis import char_ngrams, edge_ngrams, shingle_tokens
from lucene_ray.pipelines.highlight import Highlighter, best_fragment
from lucene_ray.query import TermQuery, parse_query


def test_best_fragment_wraps_hits():
    text = "alpha beta gamma merge delta epsilon merge zeta"
    frag = best_fragment(text, {"merge"}, window=4)
    assert "<b>merge</b>" in frag
    assert frag.count("<b>") >= 1


def test_best_fragment_picks_densest_window():
    text = ("x " * 30) + "merge sort merge" + (" y" * 30)
    frag = best_fragment(text, {"merge", "sort"}, window=5)
    assert frag.count("<b>") == 3


def test_best_fragment_no_hits():
    assert best_fragment("a b c", {"zzz"}, window=2)


def test_highlighter_batch(ray_session):
    import ray.data

    ds = ray.data.read_parquet("/root/testdata/sf0.001/documents.parquet").limit(50)
    out = ds.map_batches(
        Highlighter("merge sort"), batch_format="pyarrow"
    ).to_pandas()
    assert "snippet" in out.columns
    hit_rows = out[out.text.str.contains("merge")]
    assert hit_rows.snippet.str.contains("<b>merge</b>").any()


def test_highlight_hits_pipeline(ray_session, tmp_path):
    import ray.data

    from lucene_ray.pipelines.highlight import highlight_hits
    from lucene_ray.pipelines.index_pipeline import build_index
    from lucene_ray.pipelines.search_pipeline import search_distributed

    d = str(tmp_path / "idx")
    build_index("/root/testdata/sf0.001/documents.parquet", d, key_col="doc_id",
                text_col="text", num_partitions=2, columns=["doc_id", "text"])
    hits = search_distributed(d, ["merge"], k=5, concurrency=2)
    src = ray.data.read_parquet("/root/testdata/sf0.001/documents.parquet")
    out = highlight_hits(src, hits, "merge").to_pandas()
    assert len(out) == 5
    assert out.snippet.str.contains("<b>merge</b>").all()


def test_shingles_and_ngrams():
    toks = ["a", "b", "c", "d"]
    assert shingle_tokens(toks, 2, 2) == ["a b", "b c", "c d"]
    assert shingle_tokens(toks, 2, 3) == ["a b", "b c", "c d", "a b c", "b c d"]
    assert char_ngrams("abcd", 2, 3) == ["ab", "bc", "cd", "abc", "bcd"]
    assert edge_ngrams("merge", 1, 3) == ["m", "me", "mer"]
    assert edge_ngrams("ab", 1, 5) == ["a", "ab"]


def test_parser_field_prefix():
    q = parse_query("contents:Merge")
    assert q == TermQuery("merge", field="contents")
    assert parse_query("Merge") == TermQuery("merge")
    q2 = parse_query('title:"batch batch"')
    assert q2 is not None


def test_passage_rank_math():
    """Hand-computed PassageScorer formula on a two-passage doc."""
    import math

    from lucene_ray.pipelines.highlight import passage_rank

    # 6 tokens of 4 chars -> windows of 3 tokens: [0,14) and [15,29)
    text = "cats dogs cats tree rock dogs"
    spans = [(0, 4, "cats"), (10, 14, "cats"), (25, 29, "dogs"),
             (5, 9, "dogs")]
    out = passage_rank(text, spans, tokens_per_passage=3, pivot=87.0)
    assert len(out) == 2
    cl = len(text)
    nd = 1 + cl / 87.0

    def w(ttf):
        return 2.2 * math.log(1 + (nd + 0.5) / (ttf + 0.5))

    def tf(f, plen):
        return f / (f + 1.2 * (0.25 + 0.75 * plen / 87.0))

    # passage 1: [0,14), cats x2 + dogs x1
    p1 = (tf(2, 14) * w(2) + tf(1, 14) * w(2)) * (1 + 1 / math.log(87.0))
    # passage 2: [15,29), dogs x1
    p2 = tf(1, 14) * w(2) * (1 + 1 / math.log(87.0 + 15))
    assert out[0]["start"] == 0 and out[0]["score"] == pytest.approx(p1)
    assert out[1]["start"] == 15 and out[1]["score"] == pytest.approx(p2)
    assert out[0]["score"] > out[1]["score"]


def test_passage_rank_empty_and_no_match():
    from lucene_ray.pipelines.highlight import passage_rank

    assert passage_rank("", []) == []
    assert passage_rank("plain words here", []) == []

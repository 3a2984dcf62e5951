"""Corpus synthesis / extraction invariant, merge correctness, web pipeline."""

from __future__ import annotations

import numpy as np
import pytest

from lucene_ray.searcher import IndexSearcher
from lucene_ray.sources.corpus import extract_text, extract_title, make_html
from lucene_ray.state.manifest import Manifest
from lucene_ray.state.merge import merge_index, select_merges
from lucene_ray.state.segment import check_segment

SF_DIR = "/root/testdata/sf0.001"


def test_html_roundtrip_byte_identical():
    cases = [
        "plain words here",
        "entities & <tags> > stuff & more",
        "",
        "unicode ñ 日本語 — dash",
        "a & b &amp; c",  # pre-escaped-looking text must survive too
    ]
    for text in cases:
        h = make_html(text, "t & <title>")
        assert extract_text(h) == text
        assert extract_title(h) == "t & <title>"


def test_synthesized_corpus_schema_and_extraction(ray_session):
    from lucene_ray.sources.corpus import synthesize_corpus, extract_batch

    ds = synthesize_corpus(SF_DIR, replicas=2)
    assert ds.count() == 1000
    ex = ds.map_batches(extract_batch, batch_format="pyarrow")
    t = ex.take_batch(50, batch_format="pyarrow")
    assert set(t.column_names) >= {"url", "warc_ts", "text", "lang"}
    assert "html" not in t.column_names
    # urls unique across replicas
    urls = ds.select_columns(["url"]).take_all()
    assert len({r["url"] for r in urls}) == 1000


@pytest.fixture(scope="module")
def indexed(ray_session, tmp_path_factory):
    from lucene_ray.pipelines.index_pipeline import build_index

    d = str(tmp_path_factory.mktemp("merge") / "idx")
    build_index(f"{SF_DIR}/documents.parquet", d, key_col="doc_id", text_col="text",
                num_partitions=8, columns=["doc_id", "text"])
    return d


def test_merge_preserves_results(indexed):
    pre = IndexSearcher(indexed)
    queries = ["merge", "spark window", "merge AND window", '"batch batch"', "s*"]
    want = {q: [(sd.doc_key, sd.score) for sd in pre.search(q, k=10).score_docs]
            for q in queries}
    m0 = Manifest.load(indexed)
    m1 = merge_index(indexed, merge_factor=4)
    assert m1.gen == m0.gen + 1
    assert len(m1.segments) < len(m0.segments)
    for d in m1.segment_dirs():
        assert check_segment(d) == []
    assert m1.collection_stats() == m0.collection_stats()
    post = IndexSearcher(indexed)
    for q in queries:
        got = [(sd.doc_key, sd.score) for sd in post.search(q, k=10).score_docs]
        assert got == want[q], q


def test_select_merges_bounds():
    segs = [{"name": f"s{i}", "max_doc": 100 * (i + 1)} for i in range(12)]
    groups = select_merges(segs, merge_factor=5, max_merged_docs=10_000)
    assert all(2 <= len(g) <= 5 for g in groups)
    flat = [n for g in groups for n in g]
    assert len(flat) == len(set(flat))


def test_web_pipeline_end_to_end(ray_session, tmp_path_factory):
    from lucene_ray.pipelines.web_pipeline import build_web_index, run_query_set

    d = str(tmp_path_factory.mktemp("web") / "idx")
    manifest = build_web_index(SF_DIR, d, num_partitions=6, merge=True)
    assert manifest.collection_stats().max_doc == 500
    out = run_query_set(d, ["merge", '"batch batch"'], k=5, concurrency=2).to_pandas()
    local = IndexSearcher(d)
    for qi, q in enumerate(["merge", '"batch batch"']):
        got = out[out.query_id == qi].sort_values("rank")
        want = local.search(q, k=5).score_docs
        assert got["doc_key"].tolist() == [sd.doc_key for sd in want]
        assert np.allclose(got["score"].to_numpy(), [sd.score for sd in want])
    assert out["doc_key"].str.startswith("https://example.org/").all()


def test_write_segment_retry_idempotent(tmp_path):
    """A Ray task retry re-writing an already-committed segment must not
    corrupt or duplicate it (idempotent segment naming + first-writer-wins)."""
    import numpy as np

    from lucene_ray.functions.analysis import Analyzer
    from lucene_ray.state.segment import (
        SegmentReader,
        build_segment_tables,
        write_segment,
    )

    d = str(tmp_path / "idx")
    an = Analyzer("standard")
    keys = np.array([1, 2, 3])
    texts = ["alpha beta", "beta gamma", "alpha alpha"]
    p, t, s = build_segment_tables(keys, texts, an)
    m1 = write_segment(d, "seg-x", p, t, s, extra_meta={"part_id": 0})
    m2 = write_segment(d, "seg-x", p, t, s, extra_meta={"part_id": 0})  # retry
    assert m1["checksum"] == m2["checksum"]
    r = SegmentReader(f"{d}/segments/seg-x")
    assert r.max_doc == 3
    import os

    assert sorted(os.listdir(f"{d}/segments")) == ["seg-x"]


def test_force_merge(ray_session, tmp_path):
    """forceMerge analogue: rounds until <= max_segments; results
    rank-identical before and after."""
    from lucene_ray.pipelines.index_pipeline import build_index
    from lucene_ray.query import TermQuery
    from lucene_ray.searcher import IndexSearcher
    from lucene_ray.state.merge import force_merge

    d = str(tmp_path / "fm")
    build_index("/root/testdata/sf0.001/documents.parquet", d, key_col="doc_id",
                text_col="text", num_partitions=6, columns=["doc_id", "text"])
    before = [
        (sd.doc_key, round(sd.score, 6))
        for sd in IndexSearcher(d).search(TermQuery("merge"), 10).score_docs
    ]
    m = force_merge(d, max_segments=1, use_ray=False)
    assert len(m.segments) == 1
    after = [
        (sd.doc_key, round(sd.score, 6))
        for sd in IndexSearcher(d).search(TermQuery("merge"), 10).score_docs
    ]
    assert before == after

"""QueryRescorer and SortedSetContainsQuery."""

import numpy as np
import pyarrow as pa
import pytest
import ray


@pytest.fixture()
def idx(tmp_path, ray_session):
    from lucene_ray.pipelines.index_pipeline import build_index

    rows = [
        {"url": "a", "text": "fish fish fish", "tags": ["x", "y"]},
        {"url": "b", "text": "fish chips", "tags": ["y"]},
        {"url": "c", "text": "fish pond deep", "tags": []},
        {"url": "d", "text": "other words", "tags": ["x"]},
    ]
    d = str(tmp_path / "rq")
    ds = ray.data.from_items(rows).map_batches(
        lambda b: b.set_column(
            b.column_names.index("tags"), "tags",
            b.column("tags").cast(pa.list_(pa.string()))),
        batch_format="pyarrow")
    build_index(ds, d, key_col="url", text_col="text",
                num_partitions=2, docvalue_cols=("tags",))
    return d


def test_rescorer_combines_scores(idx, ray_session):
    from lucene_ray.query import TermQuery
    from lucene_ray.searcher import IndexSearcher

    s = IndexSearcher(idx, mode="exact")
    first = s.search(TermQuery("fish"), k=10)
    base = {sd.doc_key: sd.score for sd in first.score_docs}
    out = s.rescore(first, TermQuery("chips"), weight=10.0)
    got = {sd.doc_key: sd.score for sd in out.score_docs}
    chips = {sd.doc_key: sd.score
             for sd in s.search(TermQuery("chips"), k=10).score_docs}
    for k_, v in got.items():
        want = base[k_] + 10.0 * chips.get(k_, 0.0)
        assert abs(v - want) < 1e-9
    # 'b' (the only chips doc) must now rank first
    assert out.score_docs[0].doc_key == "b"
    # docs outside the first-pass top-k never enter ('d' has no fish)
    assert "d" not in got


def test_sorted_set_contains_query(idx, ray_session):
    from lucene_ray.query import BooleanQuery, SortedSetContainsQuery, TermQuery
    from lucene_ray.searcher import IndexSearcher

    s = IndexSearcher(idx)
    assert {sd.doc_key for sd in s.search(
        SortedSetContainsQuery("tags", "x"), k=10).score_docs} == {"a", "d"}
    assert {sd.doc_key for sd in s.search(
        SortedSetContainsQuery("tags", "y"), k=10).score_docs} == {"a", "b"}
    assert s.count(SortedSetContainsQuery("tags", "zzz")) == 0
    # composes as a filter
    q = BooleanQuery(must=[TermQuery("fish")],
                     filter=[SortedSetContainsQuery("tags", "y")])
    assert {sd.doc_key for sd in s.search(q, k=10).score_docs} == {"a", "b"}

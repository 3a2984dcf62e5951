"""IndexSearcher.explain: the breakdown's value matches the search score
and the tree mirrors the query structure."""

import pytest
import ray


@pytest.fixture()
def idx(tmp_path, ray_session):
    from lucene_ray.pipelines.index_pipeline import build_index

    rows = [{"url": "a", "text": "red fish blue fish"},
            {"url": "b", "text": "red wine red red"},
            {"url": "c", "text": "blue sky"}]
    d = str(tmp_path / "ex")
    build_index(ray.data.from_items(rows), d, key_col="url",
                text_col="text", num_partitions=1)
    return d


def test_explain_term(idx, ray_session):
    from lucene_ray.query import TermQuery
    from lucene_ray.searcher import IndexSearcher

    s = IndexSearcher(idx)
    td = s.search(TermQuery("red"), k=5)
    by_key = {sd.doc_key: sd.score for sd in td.score_docs}
    for key in ("a", "b"):
        ex = s.explain(TermQuery("red"), key)
        assert ex["match"]
        assert abs(ex["value"] - by_key[key]) < 1e-9
    det = {d["description"]: d["value"]
           for d in s.explain(TermQuery("red"), "b")["details"]}
    assert det["tf"] == 3.0 and det["doc_freq"] == 2.0


def test_explain_boolean_tree(idx, ray_session):
    from lucene_ray.query import BooleanQuery, TermQuery
    from lucene_ray.searcher import IndexSearcher

    s = IndexSearcher(idx)
    q = BooleanQuery(must=[TermQuery("red")], should=[TermQuery("blue")])
    td = s.search(q, k=5)
    by_key = {sd.doc_key: sd.score for sd in td.score_docs}
    ex = s.explain(q, "a")
    assert abs(ex["value"] - by_key["a"]) < 1e-9
    clauses = {(d["clause"], d["match"]) for d in ex["details"]}
    assert ("MUST", True) in clauses and ("SHOULD", True) in clauses
    # clause values sum to the total for a pure sum boolean
    assert abs(sum(d["value"] for d in ex["details"]) - ex["value"]) < 1e-9


def test_explain_non_match_and_missing(idx, ray_session):
    from lucene_ray.query import TermQuery
    from lucene_ray.searcher import IndexSearcher

    s = IndexSearcher(idx)
    ex = s.explain(TermQuery("zzz"), "a")
    assert not ex["match"] and ex["value"] == 0.0
    ex2 = s.explain(TermQuery("red"), "nope")
    assert not ex2["match"]

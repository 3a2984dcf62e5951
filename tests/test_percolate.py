"""Percolator presearcher (monitor/.../TermFilteredPresearcher.java idea):
the term prefilter must never change WHAT matches, only skip work."""

import pyarrow as pa
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from lucene_ray.pipelines.percolate import Percolator, query_prefilter
from lucene_ray.query import (
    BooleanQuery,
    PhraseQuery,
    PrefixQuery,
    SynonymQuery,
    TermQuery,
    parse_query,
)

VOCAB = ["alpha", "beta", "gamma", "delta", "epsilon", "zeta"]


def test_prefilter_shapes():
    assert query_prefilter(TermQuery("x")) == ("all", frozenset(["x"]))
    assert query_prefilter(PhraseQuery(["a", "b"])) == ("all", frozenset(["a", "b"]))
    assert query_prefilter(SynonymQuery(["a", "b"])) == ("any", frozenset(["a", "b"]))
    assert query_prefilter(PrefixQuery("ab")) == ("always",)
    q = BooleanQuery(must=[TermQuery("a")], should=[TermQuery("b")])
    assert query_prefilter(q) == ("all", frozenset(["a"]))
    q = BooleanQuery(should=[TermQuery("a"), TermQuery("b")])
    assert query_prefilter(q) == ("any", frozenset(["a", "b"]))
    # a should-clause with no safe terms poisons the any-filter
    q = BooleanQuery(should=[TermQuery("a"), PrefixQuery("x")])
    assert query_prefilter(q) == ("always",)
    # unsafe MUST + optional should: the should terms are NOT required, so
    # no 'any' filter may be derived from them (regression: '+eps* gamma'
    # must still match docs without 'gamma')
    q = BooleanQuery(must=[PrefixQuery("eps")], should=[TermQuery("gamma")])
    assert query_prefilter(q) == ("always",)


def test_unsafe_must_with_optional_should_not_skipped():
    queries = {"q": "+eps* gamma"}
    with_pf, _ = _run(queries, ["epsilon rocket launch"], presearch=True)
    without_pf, _ = _run(queries, ["epsilon rocket launch"], presearch=False)
    assert with_pf == without_pf == [(0, "q")]


def _run(queries, texts, presearch):
    p = Percolator(queries, presearch=presearch)
    out = p(pa.table({
        "doc_id": list(range(len(texts))),
        "text": texts,
    }))
    pairs = sorted(zip(out.column("doc_id").to_pylist(),
                       out.column("query_id").to_pylist()))
    return pairs, p.stats


QUERIES = {
    "q_term": "alpha",
    "q_and": "alpha AND beta",
    "q_or": "gamma OR delta",
    "q_phrase": '"beta gamma"',
    "q_prefix": "eps*",
    "q_neg": "alpha -zeta",
}


@given(st.lists(st.lists(st.sampled_from(VOCAB), min_size=1, max_size=8),
                min_size=1, max_size=6))
@settings(max_examples=40, deadline=None)
def test_presearch_never_changes_matches(docs):
    texts = [" ".join(d) for d in docs]
    with_pf, _ = _run(QUERIES, texts, presearch=True)
    without_pf, _ = _run(QUERIES, texts, presearch=False)
    assert with_pf == without_pf


def test_presearch_skips_absent_queries():
    # batch contains only alpha: q_and (needs beta), q_or (gamma|delta) and
    # q_phrase (beta+gamma) must be SKIPPED without being run
    _, stats = _run(QUERIES, ["alpha alpha alpha"], presearch=True)
    assert stats["queries_skipped"] == 3
    # prefix query has no safe filter -> always runs
    assert stats["queries_run"] == 3

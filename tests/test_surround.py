"""Surround query language (queryparser/surround/parser/QueryParser.jj):
W/N distance operators with 2-99 distance prefixes, infix + prefix boolean
operators, truncation, boosts — mapped onto SpanNearQuery slots."""

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from lucene_ray.query import (
    BooleanQuery,
    BoostQuery,
    QueryParseError,
    SpanNearQuery,
    TermQuery,
)
from lucene_ray.searcher import IndexSearcher
from lucene_ray.surround import parse_surround_query as P

DOCS = [
    ("d0", "john smith went home"),
    ("d1", "jon smithers stayed out"),
    ("d2", "johnny smith was not here"),
    ("d3", "smith john reversed order"),
    ("d4", "jon briefly met smith yesterday"),
]


@pytest.fixture(scope="module")
def idx(ray_session, tmp_path_factory):
    from lucene_ray.pipelines.index_pipeline import build_index_by_file

    base = tmp_path_factory.mktemp("surround")
    src = str(base / "docs.parquet")
    pq.write_table(
        pa.table({"url": [k for k, _ in DOCS], "text": [t for _, t in DOCS]}),
        src,
    )
    d = str(base / "idx")
    build_index_by_file(src, d, key_col="url", text_col="text")
    return d


def test_parse_shapes():
    assert P("a W b") == SpanNearQuery([("a",), ("b",)], slop=0, in_order=True)
    assert P("3W(a, b)") == SpanNearQuery([("a",), ("b",)], slop=2, in_order=True)
    assert P("2N(a, b)") == SpanNearQuery([("a",), ("b",)], slop=1, in_order=False)
    # case-insensitive operators, chained W keeps one span query
    assert P("a w b w c") == SpanNearQuery(
        [("a",), ("b",), ("c",)], slop=0, in_order=True)
    # OR group inside a distance operator = SpanOr slot
    assert P("(a OR b) W c") == SpanNearQuery(
        [("a", "b"), ("c",)], slop=0, in_order=True)
    # truncation specs
    assert P("ab* W c") == SpanNearQuery(
        [(("prefix", "ab"),), ("c",)], slop=0, in_order=True)
    assert P("AND(x, y)^2") == BoostQuery(
        BooleanQuery(must=[TermQuery("x"), TermQuery("y")]), 2.0)


def test_parse_errors():
    with pytest.raises(QueryParseError):
        P("a W (b AND c)")  # boolean operand inside distance op
    with pytest.raises(QueryParseError):
        P("a W b N c")  # nested distance under N (documented narrowing)
    with pytest.raises(QueryParseError):
        P("100W(a, b)")  # distance out of range
    with pytest.raises(QueryParseError):
        P("W(a)")  # prefix op needs >= 2 args


def test_nested_distance_under_ordered():
    # different inner distance nests as a sub-span under the ordered parent
    q = P("a W b 3W c")
    inner = SpanNearQuery([("a",), ("b",)], slop=0, in_order=True)
    assert q == SpanNearQuery([inner, ("c",)], slop=2, in_order=True)
    q = P("3W(a W b, N(x, y))")
    assert q.terms[0] == SpanNearQuery([("a",), ("b",)], slop=0, in_order=True)
    assert q.terms[1] == SpanNearQuery([("x",), ("y",)], slop=0, in_order=False)


def _hits(idx, qs):
    s = IndexSearcher(idx)
    return sorted(sd.doc_key for sd in s.search(P(qs), 10).score_docs)


def test_ordered_with_expansion(idx):
    assert _hits(idx, "(john OR jon) W smith*") == ["d0", "d1"]


def test_unordered_distance(idx):
    assert _hits(idx, "2N(john, smith)") == ["d0", "d3"]
    assert _hits(idx, "4N(jon, smith)") == ["d4"]


def test_boolean_ops(idx):
    assert _hits(idx, "john AND smith NOT home") == ["d3"]
    assert _hits(idx, "smithers OR johnny") == ["d1", "d2"]


def test_wildcard_slot(idx):
    assert _hits(idx, "jo?n W smith") == ["d0"]


def test_three_way_adjacent(idx):
    assert _hits(idx, "W(john, smith, went)") == ["d0"]

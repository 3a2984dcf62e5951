"""XML query parser (queryparser/xml/CoreParser.java element vocabulary)."""

import pytest

from lucene_ray.query import (
    BooleanQuery,
    BoostQuery,
    ConstantScoreQuery,
    DisjunctionMaxQuery,
    MatchAllDocsQuery,
    NumericRangeQuery,
    QueryParseError,
    SpanNearQuery,
    TermInSetQuery,
    TermQuery,
    TermRangeQuery,
    parse_query,
)
from lucene_ray.xmlparser import parse_xml_query as X


def test_term_and_terms():
    assert X('<TermQuery fieldName="title">Merge</TermQuery>') == TermQuery(
        "merge", field="title")
    assert X("<TermsQuery>a B c</TermsQuery>") == TermInSetQuery(["a", "b", "c"])


def test_boolean_with_clauses():
    q = X("""
    <BooleanQuery fieldName="contents" minimumNumberShouldMatch="1">
      <Clause occurs="must"><TermQuery>merge</TermQuery></Clause>
      <Clause occurs="should"><TermQuery>window</TermQuery></Clause>
      <Clause occurs="mustNot"><TermQuery>spark</TermQuery></Clause>
      <Clause occurs="filter"><RangeQuery lowerTerm="a" upperTerm="m"/></Clause>
    </BooleanQuery>""")
    assert q == BooleanQuery(
        must=[TermQuery("merge", field="contents")],
        should=[TermQuery("window", field="contents")],
        must_not=[TermQuery("spark", field="contents")],
        filter=[TermRangeQuery("a", "m", True, True, field="contents")],
        minimum_should_match=1,
    )


def test_field_inheritance_and_boost():
    q = X('<TermQuery fieldName="t" boost="2.5">x</TermQuery>')
    assert q == BoostQuery(TermQuery("x", field="t"), 2.5)


def test_ranges():
    q = X('<RangeQuery fieldName="name" lowerTerm="Alpha" upperTerm="Beta" includeUpper="false"/>')
    assert q == TermRangeQuery("alpha", "beta", True, False, field="name")
    q = X('<PointRangeQuery fieldName="n" lowerTerm="10" upperTerm="20"/>')
    assert q == NumericRangeQuery("n", 10.0, 20.0, True, True)


def test_dismax_constant_score_matchall():
    q = X("""
    <DisjunctionMaxQuery tieBreaker="0.3">
      <TermQuery fieldName="a">x</TermQuery>
      <TermQuery fieldName="b">x</TermQuery>
    </DisjunctionMaxQuery>""")
    assert q == DisjunctionMaxQuery(
        [TermQuery("x", field="a"), TermQuery("x", field="b")], 0.3)
    q = X("<ConstantScoreQuery><TermQuery>x</TermQuery></ConstantScoreQuery>")
    assert q == ConstantScoreQuery(TermQuery("x"))
    assert X("<MatchAllDocsQuery/>") == MatchAllDocsQuery()


def test_user_query_delegates_to_classic():
    q = X("<UserQuery>+merge -spark window</UserQuery>")
    assert q == parse_query("+merge -spark window")


def test_span_near_with_or_terms():
    q = X("""
    <SpanNear slop="2" inOrder="true">
      <SpanTerm>john</SpanTerm>
      <SpanOrTerms>smith smithers</SpanOrTerms>
    </SpanNear>""")
    assert q == SpanNearQuery(
        [("john",), ("smith", "smithers")], slop=2, in_order=True)
    q = X("""
    <SpanNear slop="0" inOrder="false">
      <SpanOr><SpanTerm>a</SpanTerm><SpanTerm>b</SpanTerm></SpanOr>
      <SpanTerm>c</SpanTerm>
    </SpanNear>""")
    assert q == SpanNearQuery([("a", "b"), ("c",)], slop=0, in_order=False)


def test_errors():
    with pytest.raises(QueryParseError):
        X("<Unknown/>")
    with pytest.raises(QueryParseError):
        X("<BooleanQuery><TermQuery>x</TermQuery></BooleanQuery>")
    with pytest.raises(QueryParseError):
        X("not xml at all <<")
    with pytest.raises(QueryParseError):
        X("<PointRangeQuery lowerTerm='1'/>")  # missing fieldName

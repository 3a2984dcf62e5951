"""SimpleQueryParser + MultiFieldQueryParser conformance
(queryparser/simple/SimpleQueryParser.java — behavioral model
TestSimpleQueryParser.java; queryparser/classic/MultiFieldQueryParser.java).

The simple parser must NEVER raise: malformed input degrades to the nearest
sensible interpretation (unmatched quotes/parens are extraneous)."""

from hypothesis import given, settings
from hypothesis import strategies as st

from lucene_ray.query import (
    BooleanQuery,
    BoostQuery,
    FuzzyQuery,
    MatchAllDocsQuery,
    MatchNoDocsQuery,
    PhraseQuery,
    PrefixQuery,
    TermQuery,
    parse_multi_field_query,
    parse_simple_query,
)


def test_default_or():
    assert parse_simple_query("a b") == BooleanQuery(
        should=[TermQuery("a"), TermQuery("b")])


def test_and_or_operators():
    assert parse_simple_query("a+b") == BooleanQuery(
        must=[TermQuery("a"), TermQuery("b")])
    assert parse_simple_query("a|b") == BooleanQuery(
        should=[TermQuery("a"), TermQuery("b")])


def test_right_to_left_precedence():
    # "a | b + c": (a OR b) is built first, then AND c re-wraps the tree
    q = parse_simple_query("a | b + c")
    assert q == BooleanQuery(must=[
        BooleanQuery(should=[TermQuery("a"), TermQuery("b")]),
        TermQuery("c"),
    ])


def test_negation_and_double_negation():
    q = parse_simple_query("-a")
    assert q == BooleanQuery(should=[MatchAllDocsQuery()],
                             must_not=[TermQuery("a")])
    # two '-' in a row cancel
    assert parse_simple_query("--a") == TermQuery("a")


def test_phrase_near_prefix_fuzzy():
    assert parse_simple_query('"x y"~3') == PhraseQuery(["x", "y"], slop=3)
    assert parse_simple_query("cat*") == PrefixQuery("cat")
    assert parse_simple_query("roam~1") == FuzzyQuery("roam", max_edits=1)
    assert parse_simple_query("roam~") == FuzzyQuery("roam", max_edits=2)
    # ~0 degrades to a plain term (reference: fuzziness 0 -> default query)
    assert parse_simple_query("roam~0") == TermQuery("roam")


def test_precedence_groups():
    q = parse_simple_query("a + (b | c)")
    assert q == BooleanQuery(must=[
        TermQuery("a"),
        BooleanQuery(should=[TermQuery("b"), TermQuery("c")]),
    ])


def test_lenient_degradation():
    # unmatched quote: quote is extraneous, content parses as a term
    assert parse_simple_query('"abc') == TermQuery("abc")
    # unmatched open paren: extraneous
    assert parse_simple_query("(abc") == TermQuery("abc")
    # stray close paren: ignored
    assert parse_simple_query(")abc") == TermQuery("abc")
    # empty group resets the pending operator, rest still parses
    assert parse_simple_query("a + () b") == BooleanQuery(
        should=[TermQuery("a"), TermQuery("b")])
    # empty input
    assert parse_simple_query("") == MatchNoDocsQuery("empty query")
    assert parse_simple_query("  )  ") == MatchNoDocsQuery("empty query")


def test_escapes():
    assert parse_simple_query(r"a\+b") == TermQuery("a+b")
    assert parse_simple_query(r"cat\*") == TermQuery("cat*")


@given(st.text(alphabet='ab +|-()"~*\\', max_size=30))
@settings(max_examples=300, deadline=None)
def test_simple_parser_never_raises(s):
    parse_simple_query(s)  # must not raise on ANY input


def test_multi_field_expansion():
    q = parse_multi_field_query("merge", ["title", "body"],
                                boosts={"title": 2.0})
    assert q == BooleanQuery(should=[
        BoostQuery(TermQuery("merge", field="title"), 2.0),
        TermQuery("merge", field="body"),
    ])
    # explicit field is NOT expanded
    q = parse_multi_field_query("title:x", ["title", "body"])
    assert q == TermQuery("x", field="title")
    # must-clause semantics: term must be in at least ONE field
    q = parse_multi_field_query("+a b", ["f1", "f2"])
    assert q.must[0] == BooleanQuery(
        should=[TermQuery("a", field="f1"), TermQuery("a", field="f2")])


def test_multi_field_phrase_and_prefix():
    q = parse_multi_field_query('"a b"', ["f1", "f2"])
    assert q == BooleanQuery(should=[
        PhraseQuery(["a", "b"], field="f1"),
        PhraseQuery(["a", "b"], field="f2"),
    ])
    q = parse_multi_field_query("pre*", ["f1", "f2"])
    assert q == BooleanQuery(should=[
        PrefixQuery("pre", field="f1"),
        PrefixQuery("pre", field="f2"),
    ])


def test_simple_parser_multi_field():
    q = parse_simple_query("x", fields=["f1", "f2"], boosts={"f1": 3.0})
    assert q == BooleanQuery(should=[
        BoostQuery(TermQuery("x", field="f1"), 3.0),
        TermQuery("x", field="f2"),
    ])

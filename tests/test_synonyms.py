"""SynonymMap / SynonymGraphFilter / analyzeGraphBoolean tests — cases
modeled on analysis/common/src/test/.../synonym/TestSynonymGraphFilter.java
and TestSolrSynonymParser.java (semantics, not code)."""

import pytest

from lucene_ray.functions.synonyms import (
    SynonymMap,
    SynToken,
    analyze_graph_query,
    expand_synonyms_batch,
    flatten_graph,
    synonym_graph,
)
from lucene_ray.query import BooleanQuery, PhraseQuery, SynonymQuery, TermQuery


def _terms_at(graph, start, end):
    return sorted(t.term for t in graph if t.start == start and t.end == end)


# ------------------------------------------------------------ parser


def test_parse_equivalence_expand():
    m = SynonymMap.parse("quick, fast")
    assert m.lookup(("quick",)) == ([("fast",)], True)
    assert m.lookup(("fast",)) == ([("quick",)], True)


def test_parse_equivalence_no_expand_maps_to_first():
    m = SynonymMap.parse("quick, fast, rapid", expand=False)
    assert m.lookup(("fast",)) == ([("quick",)], False)
    assert m.lookup(("rapid",)) == ([("quick",)], False)
    assert m.lookup(("quick",)) is None


def test_parse_explicit_mapping_multiword():
    m = SynonymMap.parse("hash join => merge\nsee spot run => dick")
    assert m.lookup(("hash", "join")) == ([("merge",)], False)
    assert m.lookup(("see", "spot", "run")) == ([("dick",)], False)
    assert m.max_input_len == 3


def test_parse_comments_and_blank_lines():
    m = SynonymMap.parse("# comment\n\nquick, fast # trailing\n")
    assert m.lookup(("quick",)) is not None


def test_parse_bad_rule_raises():
    with pytest.raises(ValueError):
        SynonymMap.parse("lonely")
    with pytest.raises(ValueError):
        SynonymMap.parse("a =>")


# ------------------------------------------------------------ graph filter


def test_single_token_synonym_same_span():
    m = SynonymMap.parse("quick, fast")
    g = synonym_graph(["the", "quick", "fox"], m)
    # quick and fast share the exact (start, end) span
    assert _terms_at(g, 1, 2) == ["fast", "quick"]
    assert _terms_at(g, 0, 1) == ["the"]
    assert _terms_at(g, 2, 3) == ["fox"]


def test_multiword_input_replacement():
    m = SynonymMap.parse("hash join => merge")
    g = synonym_graph(["big", "hash", "join", "scan"], m)
    # origin not kept: merge is the only edge over the consumed span
    assert [t.term for t in g] == ["big", "merge", "scan"]
    assert g[1].end - g[1].start == 1


def test_multiword_input_keep_orig_side_path():
    m = SynonymMap()
    m.add(("hash", "join"), ("merge",), keep_orig=True)
    g = synonym_graph(["hash", "join"], m)
    # backbone hash(0,1) join(1,2); merge spans (0,2) — posLen 2
    assert _terms_at(g, 0, 1) == ["hash"]
    assert _terms_at(g, 1, 2) == ["join"]
    assert _terms_at(g, 0, 2) == ["merge"]


def test_multiword_output_side_path_nodes_are_fresh():
    m = SynonymMap.parse("wtc, world trade center")
    g = synonym_graph(["wtc", "bombing"], m)
    wtc = [t for t in g if t.term == "wtc"][0]
    world = [t for t in g if t.term == "world"][0]
    trade = [t for t in g if t.term == "trade"][0]
    center = [t for t in g if t.term == "center"][0]
    bomb = [t for t in g if t.term == "bombing"][0]
    assert world.start == wtc.start and center.end == wtc.end
    assert world.end == trade.start and trade.end == center.start
    # side-path internal nodes collide with nothing else
    internal = {world.end, trade.end}
    assert wtc.start not in internal and wtc.end not in internal
    assert bomb.start == wtc.end


def test_longest_match_wins():
    m = SynonymMap.parse("a => x\na b => y")
    g = synonym_graph(["a", "b"], m)
    assert [t.term for t in g] == ["y"]


def test_no_overlapping_matches():
    # after "a b" matches, scanning resumes at "c" — "b c" must not match
    m = SynonymMap.parse("a b => x\nb c => y")
    g = synonym_graph(["a", "b", "c"], m)
    assert [t.term for t in g] == ["x", "c"]


def test_flatten_positions():
    m = SynonymMap.parse("wtc, world trade center")
    g = synonym_graph(["wtc", "bombing"], m)
    flat = dict()
    for term, pos in flatten_graph(g):
        flat.setdefault(pos, []).append(term)
    # wtc+world share pos 0; trade/center get inserted positions; bombing last
    assert sorted(flat[0]) == ["world", "wtc"]
    assert flat[1] == ["trade"]
    assert flat[2] == ["center"]
    assert flat[3] == ["bombing"]


def test_expand_synonyms_batch_arrays():
    m = SynonymMap.parse("quick, fast")
    terms, doc_idx, pos = expand_synonyms_batch(
        ["quick fox", "slow dog"], m)
    rows = sorted(zip(doc_idx.tolist(), pos.tolist(), terms.tolist()))
    assert rows == [(0, 0, "fast"), (0, 0, "quick"), (0, 1, "fox"),
                    (1, 0, "slow"), (1, 1, "dog")]


# ------------------------------------------------------------ query building


def test_query_single_position_fan_is_synonym_query():
    m = SynonymMap.parse("quick, fast")
    q = analyze_graph_query("quick scan", m)
    assert isinstance(q, BooleanQuery)
    syn = [c for c in q.should if isinstance(c, SynonymQuery)]
    term = [c for c in q.should if isinstance(c, TermQuery)]
    assert len(syn) == 1 and sorted(syn[0].terms) == ["fast", "quick"]
    assert len(term) == 1 and term[0].term == "scan"


def test_query_multiword_replacement_is_terms():
    m = SynonymMap.parse("hash join => merge")
    q = analyze_graph_query("big hash join scan", m)
    assert isinstance(q, BooleanQuery)
    assert sorted(c.term for c in q.should) == ["big", "merge", "scan"]


def test_query_side_paths_become_phrase_should():
    m = SynonymMap.parse("sort, order line")
    q = analyze_graph_query("sort key", m)
    assert isinstance(q, BooleanQuery) and len(q.should) == 2
    comp = q.should[0]
    assert isinstance(comp, BooleanQuery)
    kinds = {type(c) for c in comp.should}
    assert kinds == {TermQuery, PhraseQuery}
    phrase = [c for c in comp.should if isinstance(c, PhraseQuery)][0]
    assert list(phrase.terms) == ["order", "line"]
    assert isinstance(q.should[1], TermQuery) and q.should[1].term == "key"


def test_query_default_operator_and():
    m = SynonymMap.parse("quick, fast")
    q = analyze_graph_query("quick scan", m, default_operator="and")
    assert isinstance(q, BooleanQuery) and len(q.must) == 2 and not q.should


def test_query_no_match_plain_terms():
    m = SynonymMap.parse("quick, fast")
    q = analyze_graph_query("slow scan", m)
    assert sorted(c.term for c in q.should) == ["scan", "slow"]

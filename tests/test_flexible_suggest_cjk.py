"""Flexible StandardQueryParser pipeline, analyzing/infix suggesters, and
the CJK bigram analyzer."""

import numpy as np
import pytest
import ray


# ------------------------------------------------------------- flexible


def test_flexible_default_operator_and():
    from lucene_ray.flexible import StandardQueryParser
    from lucene_ray.query import BooleanQuery

    p = StandardQueryParser().set_default_operator("AND")
    q = p.parse("alpha beta")
    assert isinstance(q, BooleanQuery)
    assert len(q.must) == 2 and not q.should


def test_flexible_multi_field_expansion():
    from lucene_ray.flexible import StandardQueryParser
    from lucene_ray.query import BoostQuery, DisjunctionMaxQuery, TermQuery

    p = StandardQueryParser().set_multi_fields([("title", 2.0), "body"])
    q = p.parse("hello")
    assert isinstance(q, DisjunctionMaxQuery)
    kinds = {type(d) for d in q.disjuncts}
    assert kinds == {BoostQuery, TermQuery}
    fields = set()
    for d in q.disjuncts:
        fields.add(d.query.field if isinstance(d, BoostQuery) else d.field)
    assert fields == {"title", "body"}


def test_flexible_phrase_slop_and_fuzzy_clamp():
    from lucene_ray.flexible import StandardQueryParser
    from lucene_ray.query import BooleanQuery, FuzzyQuery, PhraseQuery

    p = StandardQueryParser().set_phrase_slop(2).set_fuzzy_max_edits(1)
    q = p.parse('"big apple" crab~2')
    phrases = [c for c in q.should if isinstance(c, PhraseQuery)] if isinstance(q, BooleanQuery) else []
    fuzzies = [c for c in q.should if isinstance(c, FuzzyQuery)] if isinstance(q, BooleanQuery) else []
    assert phrases and phrases[0].slop == 2
    assert fuzzies and fuzzies[0].max_edits == 1


def test_flexible_leading_wildcard_guard():
    from lucene_ray.flexible import StandardQueryParser

    p = StandardQueryParser()
    with pytest.raises(ValueError, match="leading wildcard"):
        p.parse("*oops")
    p.set_allow_leading_wildcard(True)
    p.parse("*oops")  # allowed now


def test_flexible_custom_processor():
    from lucene_ray.flexible import StandardQueryParser
    from lucene_ray.query import BoostQuery, TermQuery

    def double_boost(q):
        return BoostQuery(q, 2.0)

    p = StandardQueryParser().add_processor(double_boost)
    q = p.parse("solo")
    assert isinstance(q, BoostQuery) and q.boost == 2.0
    assert isinstance(q.query, TermQuery)


def test_flexible_parses_against_index(tmp_path, ray_session):
    from lucene_ray.flexible import StandardQueryParser
    from lucene_ray.pipelines.index_pipeline import build_index
    from lucene_ray.searcher import IndexSearcher

    rows = [{"url": "a", "text": "red fish blue fish"},
            {"url": "b", "text": "red wine"},
            {"url": "c", "text": "blue sky"}]
    idx = str(tmp_path / "fx")
    build_index(ray.data.from_items(rows), idx, key_col="url",
                text_col="text", num_partitions=1)
    s = IndexSearcher(idx)
    q = StandardQueryParser().set_default_operator("AND").parse("red fish")
    hits = {sd.doc_key for sd in s.search(q, k=10).score_docs}
    assert hits == {"a"}


# ------------------------------------------------------------ suggesters


ENTRIES = [
    ("star wars: a new hope", 90, "m1"),
    ("star trek beyond", 70, "m2"),
    ("a star is born", 80, "m3"),
    ("wonder woman", 60, "m4"),
]


def test_analyzing_suggester_prefix_of_analyzed_text():
    from lucene_ray.suggest import AnalyzingSuggester

    s = AnalyzingSuggester().build(ENTRIES)
    got = s.lookup("star")
    assert [t for t, _w, _p in got] == [
        "star wars: a new hope", "star trek beyond"]
    # analyzed prefix: punctuation/case folded
    assert [t for t, _w, _p in s.lookup("STAR WARS")] == ["star wars: a new hope"]
    # not a prefix of the analyzed text -> no match
    assert s.lookup("wars") == []


def test_infix_suggester_matches_middle_tokens():
    from lucene_ray.suggest import InfixSuggester

    s = InfixSuggester().build(ENTRIES)
    got = s.lookup("star")
    # weight-ordered; 'a star is born' matches via the infix token
    assert [t for t, *_ in got] == [
        "star wars: a new hope", "a star is born", "star trek beyond"]
    hl = {t: h for t, _w, _p, h in got}
    assert hl["a star is born"] == "a <b>star</b> is born"
    # multi-token key: whole token + last-token prefix
    got2 = s.lookup("star w")
    assert [t for t, *_ in got2] == ["star wars: a new hope"]
    assert "<b>w</b>ars" in got2[0][3]


def test_infix_suggester_from_dataset(ray_session):
    from lucene_ray.suggest import InfixSuggester

    ds = ray.data.from_items(
        [{"text": t, "w": w} for t, w, _p in ENTRIES])
    s = InfixSuggester().build_from_dataset(ds, text_col="text", weight_col="w")
    got = s.lookup("wo")
    assert [t for t, *_ in got] == ["wonder woman"]


# ---------------------------------------------------------------- cjk


def test_cjk_bigrams():
    from lucene_ray.functions.analysis import get_analyzer

    an = get_analyzer("cjk")
    toks = [t for t, _p in an.tokenize_one("我爱北京天安门")]
    # overlapping bigrams of the han run
    assert toks == ["我爱", "爱北", "北京", "京天", "天安", "安门"]
    # lone ideograph stays a unigram; latin unaffected
    toks2 = [t for t, _p in an.tokenize_one("我 like 北京")]
    assert toks2 == ["我", "like", "北京"]


def test_cjk_index_search(tmp_path, ray_session):
    from lucene_ray.pipelines.index_pipeline import build_index
    from lucene_ray.query import TermQuery
    from lucene_ray.searcher import IndexSearcher

    rows = [{"url": "a", "text": "我爱北京"}, {"url": "b", "text": "东京旅行"}]
    idx = str(tmp_path / "cjk")
    build_index(ray.data.from_items(rows), idx, key_col="url",
                text_col="text", num_partitions=1, analyzer="cjk")
    s = IndexSearcher(idx)
    assert {sd.doc_key for sd in s.search(TermQuery("北京"), k=5).score_docs} == {"a"}
    assert {sd.doc_key for sd in s.search(TermQuery("东京"), k=5).score_docs} == {"b"}


def test_blended_infix_suggester():
    """BlendedInfixSuggester (suggest/.../analyzing/BlendedInfixSuggester
    .java:52) — the reference testBlendedSortRaw shape: one entry, weight
    8, matched at different depths under the three blender types."""
    from lucene_ray.suggest import BlendedInfixSuggester

    entries = [("star wars: episode v - the empire strikes back", 8,
                b"star wars")]
    lin = BlendedInfixSuggester("standard").build(entries)
    # text starts with the key -> coefficient 1; weight 8 < 10 -> x10
    assert lin.lookup("star", 10)[0][1] == 80
    # 'the' is token position 4 -> linear 1 - 0.1*4 = 0.6 -> 48
    text, score, payload, hl = lin.lookup("the", 10)[0]
    assert score == 48 and payload == b"star wars"
    assert "<b>the</b>" in hl
    # reciprocal: 80 / (4+1) = 16
    rec = BlendedInfixSuggester("standard",
                                blender_type="reciprocal").build(entries)
    assert rec.lookup("the", 10)[0][1] == 16
    # exponential reciprocal, exponent 2: 80 / 25 = 3
    exp = BlendedInfixSuggester(
        "standard", blender_type="exponential_reciprocal",
        exponent=2.0).build(entries)
    assert exp.lookup("the", 10)[0][1] == 3


def test_blended_infix_reorders_by_position():
    """Blending re-ranks: a lower-weight entry whose match sits earlier
    beats a higher-weight entry whose match sits deep."""
    from lucene_ray.suggest import BlendedInfixSuggester

    entries = [("top of the lake", 18, None),
               ("the returned", 10, None)]
    s = BlendedInfixSuggester("standard").build(entries)
    got = s.lookup("the", 2)
    # 'the returned' starts with the key: coef 1 -> 10
    # 'top of the lake': position 2 -> 18 * 0.8 = 14 (wins)
    assert [(t, sc) for t, sc, _p, _h in got] == [
        ("top of the lake", 14), ("the returned", 10)]


def test_blended_infix_zero_weight_and_validation():
    from lucene_ray.suggest import BlendedInfixSuggester

    import pytest
    s = BlendedInfixSuggester("standard").build([("alpha beta", 0, None)])
    # weight 0 -> 1 -> x10 = 10; 'beta' at position 1 -> 0.9 -> 9
    assert s.lookup("beta", 5)[0][1] == 9
    with pytest.raises(ValueError):
        BlendedInfixSuggester("standard", blender_type="nope")

"""Conformance tests for the Intervals algebra kernels.

Golden fixtures transliterated from the reference test suite
(queries/src/test/.../intervals/TestIntervals.java): same documents, same
sources, same expected interval endpoints and gaps. These tests run the
pure per-doc kernels directly (no Ray / no index needed).
"""

from __future__ import annotations

import re

import numpy as np
import pytest

import lucene_ray.functions.interval_algebra as iv

FIELD1_DOCS = [
    "Nothing of interest to anyone here",
    "Pease porridge hot, pease porridge cold, pease porridge in the pot nine"
    " days old.  Some like it hot, some like it cold, some like it in the pot"
    " nine days old",
    "Pease porridge cold, pease porridge hot, pease porridge in the pot twelve"
    " days old.  Some like it cold, some like it hot, some like it in the fraggle",
    "Nor here, nowt hot going on in pease this one",
    "Pease porridge hot, pease porridge cold, pease porridge in the pot nine"
    " years old.  Some like it hot, some like it twelve",
    "Porridge is great",
]

FIELD2_DOCS = [
    "In Xanadu did Kubla Khan a stately pleasure dome decree",
    "Where Alph the sacred river ran through caverns measureless to man",
    "a b a c b a b c",
    "So thrice five miles of fertile ground",
    "Pease hot porridge porridge",
    "w1 w2 w3 w4 w1 w6 w3 w8 w4 w7 w1 w6",
]


def _env(doc: str) -> dict:
    toks = re.findall(r"[a-z0-9]+", doc.lower())
    out: dict = {}
    for p, t in enumerate(toks):
        out.setdefault((None, t), []).append(p)
    return {k: np.asarray(v, dtype=np.int64) for k, v in out.items()}


ENV1 = [_env(d) for d in FIELD1_DOCS]
ENV2 = [_env(d) for d in FIELD2_DOCS]


def check(source, envs, expected):
    """expected: per-doc flat [s0, e0, s1, e1, ...] like checkIntervals."""
    for i, (env, exp) in enumerate(zip(envs, expected)):
        got = [(s, e) for s, e, _, _ in source.intervals(env)]
        want = list(zip(exp[0::2], exp[1::2]))
        assert got == want, f"doc {i}: got {got}, want {want}"


def check_gaps(source, env, expected_gaps):
    got = [g for _, _, _, g in source.intervals(env)]
    assert got == list(expected_gaps)


def test_term_intervals():
    check(
        iv.term("porridge"),
        ENV1,
        [[], [1, 1, 4, 4, 7, 7], [1, 1, 4, 4, 7, 7], [], [1, 1, 4, 4, 7, 7], [0, 0]],
    )
    assert iv.term("porridge").min_extent() == 1


def test_ordered_near():
    s = iv.ordered("pease", "hot")
    check(s, ENV1, [[], [0, 2, 6, 17], [3, 5, 6, 21], [], [0, 2, 6, 17], []])
    assert s.min_extent() == 2


def test_ordered_with_duplicates():
    s = iv.ordered("pease", "pease", "porridge")
    check(s, ENV1, [[], [0, 4, 3, 7], [0, 4, 3, 7], [], [0, 4, 3, 7], []])
    check_gaps(s, ENV1[1], [2, 2])


def test_phrase_block():
    s = iv.phrase("pease", "porridge")
    check(
        s,
        ENV1,
        [[], [0, 1, 3, 4, 6, 7], [0, 1, 3, 4, 6, 7], [], [0, 1, 3, 4, 6, 7], []],
    )
    assert s.min_extent() == 2


def test_unordered_near():
    s = iv.unordered("pease", "hot")
    check(
        s,
        ENV1,
        [[], [0, 2, 2, 3, 6, 17], [3, 5, 5, 6, 6, 21], [3, 7], [0, 2, 2, 3, 6, 17], []],
    )
    check_gaps(s, ENV1[1], [1, 0, 10])
    assert s.min_extent() == 2


def test_unordered_with_repeats():
    s = iv.unordered("pease", "pease", "hot")
    check(s, ENV1, [[], [0, 3, 2, 6, 3, 17], [0, 5, 3, 6], [], [0, 3, 2, 6, 3, 17], []])


def test_unordered_with_repeats_and_maxgaps():
    s = iv.maxgaps(2, iv.unordered("pease", "pease", "hot"))
    check(s, ENV1, [[], [0, 3, 2, 6], [3, 6], [], [0, 3, 2, 6], []])


def test_disjunction():
    s = iv.or_("pease", "hot", "notmatching")
    check(
        s,
        ENV1,
        [
            [],
            [0, 0, 2, 2, 3, 3, 6, 6, 17, 17],
            [0, 0, 3, 3, 5, 5, 6, 6, 21, 21],
            [3, 3, 7, 7],
            [0, 0, 2, 2, 3, 3, 6, 6, 17, 17],
            [],
        ],
    )
    assert s.min_extent() == 1


def test_combination_disjunction():
    s = iv.ordered(iv.or_("alph", "sacred"), "measureless")
    check(s, ENV2, [[], [3, 8], [], [], [], []])
    assert s.min_extent() == 2


def test_nesting():
    s = iv.unordered("pease", "porridge", iv.or_("hot", "cold"))
    exp = [0, 2, 1, 3, 2, 4, 3, 5, 4, 6, 5, 7, 6, 17]
    check(s, ENV1, [[], exp, exp, [], exp, []])
    check_gaps(s, ENV1[1], [0, 0, 0, 0, 0, 0, 9])
    assert s.min_extent() == 3


def test_offset_intervals():
    src = iv.unordered("pease", "porridge", iv.or_("hot", "cold"))
    before = iv._Offset(src, True)
    exp_b = [0, 0, 0, 0, 1, 1, 2, 2, 3, 3, 4, 4, 5, 5]
    check(before, ENV1, [[], exp_b, exp_b, [], exp_b, []])
    after = iv._Offset(src, False)
    exp_a = [3, 3, 4, 4, 5, 5, 6, 6, 7, 7, 8, 8, 18, 18]
    check(after, ENV1, [[], exp_a, exp_a, [], exp_a, []])


def test_nesting2():
    s = iv.unordered(iv.ordered("like", "it", "cold"), "pease")
    check(s, ENV1, [[], [6, 21], [6, 17], [], [], []])
    assert s.min_extent() == 4


def test_interleaved_ordered():
    s = iv.ordered("a", "b", "c")
    check(s, ENV2, [[], [], [0, 3, 5, 7], [], [], []])
    check_gaps(s, ENV2[2], [1, 0])


def test_unordered_no_overlaps():
    check(
        iv.unordered_no_overlaps("pease", "pease"),
        ENV1,
        [[], [0, 3, 3, 6], [0, 3, 3, 6], [], [0, 3, 3, 6], []],
    )
    check(
        iv.unordered_no_overlaps(iv.unordered("pease", "porridge", "hot"), "porridge"),
        ENV1,
        [[], [1, 4, 2, 7, 4, 17], [1, 5, 4, 7], [], [1, 4, 2, 7, 4, 17], []],
    )
    check(
        iv.unordered_no_overlaps(iv.unordered("pease", "porridge", "hot"), "porridge"),
        ENV2,
        [[], [], [], [], [0, 3], []],
    )
    check(
        iv.unordered_no_overlaps("porridge", iv.unordered("pease", "porridge")),
        ENV1,
        [[], [1, 4, 4, 7], [1, 4, 4, 7], [], [1, 4, 4, 7], []],
    )


def test_contained_by():
    s = iv.contained_by(iv.term("porridge"), iv.ordered("pease", "cold"))
    check(s, ENV1, [[], [4, 4, 7, 7], [1, 1, 7, 7], [], [4, 4], []])
    assert s.min_extent() == 1


def test_containing():
    s = iv.containing(iv.ordered("pease", "cold"), iv.term("porridge"))
    check(s, ENV1, [[], [3, 5, 6, 21], [0, 2, 6, 17], [], [3, 5], []])
    assert s.min_extent() == 2


def test_not_containing():
    s = iv.not_containing(iv.ordered("porridge", "pease"), iv.term("hot"))
    check(s, ENV1, [[], [4, 6], [1, 3], [], [4, 6], []])
    assert s.min_extent() == 2


def test_not_contained_by():
    # complement of testContainedBy's containment relation
    s = iv.not_contained_by(iv.term("porridge"), iv.ordered("pease", "cold"))
    check(s, ENV1, [[], [1, 1], [4, 4], [], [1, 1, 7, 7], [0, 0]])


def test_maxgaps():
    s = iv.maxgaps(1, iv.unordered("w1", "w3", "w4"))
    check(s, ENV2, [[], [], [], [], [], [0, 3, 2, 4, 3, 6]])
    assert s.min_extent() == 3


def test_maxgaps_with_repeats():
    s = iv.maxgaps(11, iv.ordered("pease", "pease", "hot"))
    check(s, ENV1, [[], [], [0, 5], [], [], []])
    check_gaps(s, ENV1[2], [3])


def test_maxgaps_with_only_repeats():
    s = iv.maxgaps(1, iv.ordered(iv.or_("pease", "hot"), iv.or_("pease", "hot")))
    check(s, ENV1, [[], [0, 2, 2, 3], [3, 5, 5, 6], [], [0, 2, 2, 3], []])
    check_gaps(s, ENV1[1], [1, 0])


def test_nested_maxgaps():
    s = iv.maxgaps(1, iv.unordered(iv.ordered("w1", "w3"), "w4"))
    check(s, ENV2, [[], [], [], [], [], [0, 3, 3, 6, 4, 8]])
    check_gaps(s, ENV2[5], [0, 0, 1])
    assert s.min_extent() == 3


def test_minimum_should_match():
    s = iv.at_least(3, "porridge", "hot", "twelve", "nine", "pease")
    check(
        s,
        ENV1,
        [
            [],
            [0, 2, 1, 3, 2, 4, 6, 11, 7, 17],
            [3, 5, 4, 6, 5, 7, 6, 11, 7, 21],
            [],
            [0, 2, 1, 3, 2, 4, 6, 11, 7, 17, 11, 21],
            [],
        ],
    )
    check_gaps(s, ENV1[1], [0, 0, 0, 3, 8])
    assert s.min_extent() == 3


def test_no_match_minimum_should_match():
    s = iv.at_least(2, "a", "b")
    assert s.intervals(ENV1[0]) == []
    with pytest.raises(ValueError):
        iv.at_least(4, "a", "b")


def test_defined_gaps():
    s = iv.phrase("pease", iv.extend(iv.term("cold"), 1, 1), "porridge")
    check(s, ENV1, [[], [3, 7], [0, 4], [], [3, 7], []])
    assert s.min_extent() == 5


def test_after():
    s = iv.after(iv.term("porridge"), iv.ordered("pease", "cold"))
    check(s, ENV1, [[], [7, 7], [4, 4, 7, 7], [], [7, 7], []])
    assert s.min_extent() == 1


def test_before():
    s = iv.before(iv.term("cold"), iv.term("twelve"))
    check(s, ENV1, [[], [], [2, 2], [], [5, 5], []])
    assert s.min_extent() == 1


def test_within():
    s = iv.within(iv.term("hot"), 6, iv.or_("porridge", "fraggle"))
    check(s, ENV1, [[], [2, 2], [5, 5, 21, 21], [], [2, 2], []])
    assert s.min_extent() == 1


def test_overlapping():
    s = iv.overlapping(iv.unordered("hot", "porridge"), iv.unordered("cold", "pease"))
    check(s, ENV1, [[], [2, 4, 7, 17], [5, 7, 7, 21], [], [2, 4], []])
    check_gaps(s, ENV1[2], [1, 13])
    assert s.min_extent() == 2


def test_wrapped_filters():
    s = iv.or_(
        iv.term("nine"),
        iv.maxgaps(1, iv.or_(iv.ordered("pease", "hot"), iv.ordered("pease", "cold"))),
    )
    check(
        s,
        ENV1,
        [[], [0, 2, 3, 5, 11, 11, 28, 28], [0, 2, 3, 5], [], [0, 2, 3, 5, 11, 11], []],
    )


def test_fix_field_rebinding():
    s = iv.phrase("alph", iv.fix_field("field1", iv.term("hot")))
    assert (None, "alph") in s.leaf_terms()
    assert ("field1", "hot") in s.leaf_terms()
    # doc1: field2 'alph'@1, field1 'hot'@2 -> block (1, 2)
    env = dict(ENV2[1])
    env[("field1", "hot")] = np.asarray([2], dtype=np.int64)
    assert [(s_, e) for s_, e, _, _ in s.intervals(env)] == [(1, 2)]


def test_interval_query_end_to_end(tmp_path, ray_session):
    import pandas as pd

    from lucene_ray.pipelines.index_pipeline import build_index
    from lucene_ray.query import IntervalQuery
    from lucene_ray.searcher import IndexSearcher

    docs = FIELD1_DOCS
    src = str(tmp_path / "d.parquet")
    pd.DataFrame({"doc_id": range(len(docs)), "text": docs}).to_parquet(src)
    idx = str(tmp_path / "idx")
    build_index(src, idx, key_col="doc_id", text_col="text", num_partitions=2,
                columns=["doc_id", "text"])
    s = IndexSearcher(idx)

    def hits(q):
        return {sd.doc_key: sd.score for sd in s.search(q, k=10).score_docs}

    # ordered near — docs 1, 2, 4 per the golden fixture
    h = hits(IntervalQuery(None, iv.ordered("pease", "hot")))
    assert set(h) == {1, 2, 4}
    # per-doc score check: doc1 intervals (0,2),(6,17); minExtent 2
    freq = iv.interval_freq([(0, 2, 3, 0), (6, 17, 12, 0)], 2)
    assert h[1] == pytest.approx(iv.saturation_score(freq, 1.0, 1.0))

    # maxgaps-filtered unordered with repeats
    h = hits(IntervalQuery(None, iv.maxgaps(2, iv.unordered("pease", "pease", "hot"))))
    assert set(h) == {1, 2, 4}

    # negative filter: ordered(porridge, pease) not containing 'hot'
    h = hits(IntervalQuery(None, iv.not_containing(iv.ordered("porridge", "pease"), iv.term("hot"))))
    assert set(h) == {1, 2, 4}

    # disjunction + prefix expansion
    h = hits(IntervalQuery(None, iv.ordered(iv.prefix("pea"), iv.term("cold"))))
    assert set(h) == {1, 2, 4}
    with pytest.raises(RuntimeError, match="too many terms"):
        hits(IntervalQuery(None, iv.ordered(iv.prefix("p", max_expansions=1), iv.term("cold"))))

    # wildcard expansion ('?ot' → hot/pot) — all docs with hot or pot
    h = hits(IntervalQuery(None, iv.wildcard("?ot")))
    assert set(h) == {1, 2, 3, 4}

    # sigmoid scoring variant runs and is bounded by boost
    h = hits(IntervalQuery(None, iv.term("porridge"), pivot=2.0, exp=1.5))
    assert set(h) == {1, 2, 4, 5} and all(0 < v < 1 for v in h.values())

    # count() agrees with search() totals
    assert s.count(IntervalQuery(None, iv.ordered("pease", "hot"))) == 3


def test_scoring_functions():
    # saturation: w * (1 - p/(p+f)); freq accumulation in float32
    ivs = [(0, 2, 3, 0), (6, 17, 12, 0)]
    f = iv.interval_freq(ivs, min_extent=2)
    assert f == pytest.approx(1.0 / 2 + 1.0 / 11, rel=1e-6)
    assert iv.saturation_score(1.0, 1.0, 2.0) == pytest.approx(1.0)
    assert iv.sigmoid_score(1.0, 1.0, 1.0, 2.0) == pytest.approx(1.0)

"""FastVectorHighlighter analogue (highlighter/.../vectorhighlight/
FastVectorHighlighter.java: FieldPhraseList, BaseFragListBuilder,
WeightedFieldFragList, ScoreOrderFragmentsBuilder)."""

import math
import re

import pytest

from lucene_ray.pipelines.fvh import (FastVectorHighlighter, TermInfo,
                                      field_phrase_list, frag_list)


def _stack(text: str, weights: dict) -> list[TermInfo]:
    out, pos = [], 0
    for m in re.finditer(r"\w+", text):
        w = m.group(0)
        if w in weights:
            out.append(TermInfo(w, m.start(), m.end(), pos, weights[w]))
        pos += 1
    return out


TEXT = "merge sort beats quick sort when data is sorted and merge sort is stable"
W = {"merge": 1.2, "sort": 0.8}
PHRASES = [(("merge", "sort"), 2.0), (("sort",), 1.0)]


def test_field_phrase_list_longest_match():
    """FieldPhraseList.java:85 — 'search the longest phrase': adjacent
    merge+sort becomes ONE phrase info, isolated sort falls back to the
    term entry; occurrences never overlap."""
    infos = field_phrase_list(_stack(TEXT, W), PHRASES)
    assert [(i.text, i.boost) for i in infos] == [
        ("merge sort", 2.0), ("sort", 1.0), ("merge sort", 2.0)]
    # offsets are per matched term
    assert infos[0].terms_offsets == [(0, 5), (6, 10)]


def test_field_phrase_list_requires_consecutive_positions():
    # 'quick brown fox': quick(pos 0) and fox(pos 2) are NOT adjacent
    text = "quick brown fox"
    st = _stack(text, {"quick": 1.0, "fox": 1.0})
    infos = field_phrase_list(st, [(("quick", "fox"), 1.0), (("quick",), 1.0)])
    assert [i.text for i in infos] == ["quick"]


def test_frag_list_weighted_scoring():
    """WeightedFieldFragList.add: boost = Σ(distinct-term weight · phrase
    boost) · √(term count)."""
    infos = field_phrase_list(_stack(TEXT, W), PHRASES)
    frags = frag_list(infos, 30)
    # first fragment holds 'merge sort' + the lone 'sort' (within 30 chars):
    # distinct merge(1.2)+sort(0.8) under boost 2 = 4.0, second phrase adds
    # no new distinct terms; length 3 -> * sqrt(3)
    assert frags[0].total_boost == pytest.approx(4.0 * math.sqrt(3))
    # fragments never overlap and are left-to-right
    for a, b in zip(frags, frags[1:]):
        assert b.start >= a.end


def test_frag_list_centering_and_min_size():
    infos = field_phrase_list(_stack(TEXT, W), PHRASES)
    frags = frag_list(infos, 30)
    # (fragCharSize - matchLen)/2 re-centering: first phrase run spans
    # offsets 0..27 (matchLen 27), margin (30-27)//2 = 1 -> clamped to 0
    assert frags[0].start == 0 and frags[0].end - frags[0].start == 30
    with pytest.raises(ValueError):
        frag_list(infos, 10)  # < margin * 3


def test_best_fragments_score_order_and_tags():
    hl = FastVectorHighlighter(frag_char_size=30)
    frags = hl.best_fragments(TEXT, _stack(TEXT, W), PHRASES, 3)
    # score order: the 2-term-phrase fragment outranks the tail fragment
    assert frags[0][1] >= frags[-1][1]
    assert "<b>merge</b> <b>sort</b>" in frags[0][0]
    # custom tags
    hl2 = FastVectorHighlighter(frag_char_size=30, pre_tag="[", post_tag="]")
    assert "[merge] [sort]" in hl2.best_fragments(
        TEXT, _stack(TEXT, W), PHRASES, 1)[0][0]


def test_multi_term_phrase_longer_than_frag_discarded():
    """acceptPhrase (BaseFragListBuilder.java:121): a MULTI-term phrase
    whose match length exceeds fragCharSize is discarded; single terms
    always accepted."""
    text = "alpha " + "x" * 80 + " beta"
    st = [TermInfo("alpha", 0, 5, 0, 1.0),
          TermInfo("beta", len(text) - 4, len(text), 2, 1.0)]
    # fake adjacency: force positions 0,1 so the phrase matches
    st[1].position = 1
    infos = field_phrase_list(st, [(("alpha", "beta"), 1.0)])
    assert len(infos) == 1  # phrase matched (92 chars wide)
    assert frag_list(infos, 40) == []      # discarded: matchLen > fragCharSize
    assert len(frag_list(infos, 100)) == 1


def test_fvh_hits_pipeline(tmp_path, ray_session):
    import pyarrow as pa
    import pyarrow.parquet as pq
    import ray

    from lucene_ray.pipelines.fvh import fvh_hits
    from lucene_ray.pipelines.index_pipeline import build_index_by_file

    src = str(tmp_path / "fvh.parquet")
    pq.write_table(pa.table({
        "doc_id": ["a", "b", "c"],
        "text": ["merge sort beats quick sort when data is already sorted",
                 "hash join or merge join depends on the sort order",
                 "no relevant words here at all"]}), src)
    idx = str(tmp_path / "fvhidx")
    build_index_by_file(src, idx, key_col="doc_id", text_col="text",
                        store_offsets=True)
    out = fvh_hits(ray.data.read_parquet(src), idx,
                   [(("merge", "sort"), 2.0), "sort"],
                   frag_char_size=40).to_pandas().set_index("doc_id")
    assert "<b>merge</b> <b>sort</b>" in out.loc["a", "fragment"]
    # doc b has 'merge' but not the phrase — only 'sort' highlights;
    # its weight is ln(3/(df(sort)=2+1)) + 1 = 1.0
    assert "<b>sort</b>" in out.loc["b", "fragment"]
    assert "<b>merge</b>" not in out.loc["b", "fragment"]
    assert out.loc["b", "frag_score"] == pytest.approx(1.0)
    assert out.loc["c", "fragment"] is None
    assert out.loc["a", "frag_score"] > out.loc["b", "frag_score"]


def test_fvh_requires_offsets(tmp_path, ray_session):
    import pyarrow as pa
    import pyarrow.parquet as pq

    from lucene_ray.pipelines.fvh import _doc_term_stacks
    from lucene_ray.pipelines.index_pipeline import build_index_by_file
    from lucene_ray.searcher import IndexSearcher

    src = str(tmp_path / "noofs.parquet")
    pq.write_table(pa.table({"doc_id": ["a"], "text": ["merge sort"]}), src)
    idx = str(tmp_path / "noofsidx")
    build_index_by_file(src, idx, key_col="doc_id", text_col="text")
    with pytest.raises(ValueError, match="store_offsets"):
        _doc_term_stacks(IndexSearcher(idx), {"merge"})


def test_empty_phrase_is_skipped(tmp_path, ray_session):
    """A phrase that analyzes to zero tokens (all stopwords) must not
    crash the stage — it simply can't match."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    import ray

    from lucene_ray.functions.analysis import get_analyzer
    from lucene_ray.pipelines.fvh import field_phrase_list, fvh_hits
    from lucene_ray.pipelines.index_pipeline import build_index_by_file

    assert field_phrase_list([], [((), 1.0)]) == []
    src = str(tmp_path / "e.parquet")
    pq.write_table(pa.table({"doc_id": ["a"], "text": ["merge the sort"]}),
                   src)
    idx = str(tmp_path / "eidx")
    build_index_by_file(src, idx, key_col="doc_id", text_col="text",
                        store_offsets=True, analyzer="english")
    out = fvh_hits(ray.data.read_parquet(src), idx, ["the", "merge"],
                   analyzer=get_analyzer("english")).to_pandas()
    assert "<b>merg" in out["fragment"][0]

"""Postings offsets (.pay stream analogue): index-time storage, reader
access, merge survival, and offsets-based highlighting equal to what a
fresh re-analysis of the stored text produces."""

import re

import numpy as np
import pytest
import ray


ROWS = [
    {"url": "u00", "text": "Alpha beta gamma alpha delta alpha"},
    {"url": "u01", "text": "beta BETA beta"},
    {"url": "u02", "text": "no matches here at all"},
    {"url": "u03", "text": "gamma, alpha! gamma?  spaced   alpha"},
    {"url": "u04", "text": ""},
]


@pytest.fixture()
def offsets_index(tmp_path, ray_session):
    from lucene_ray.pipelines.index_pipeline import build_index

    idx = str(tmp_path / "oidx")
    build_index(ray.data.from_items(ROWS), idx, key_col="url",
                text_col="text", num_partitions=2, store_offsets=True)
    return idx


def _expected_spans(term):
    out = {}
    pat = re.compile(r"[a-z0-9]+", re.IGNORECASE)
    for row in ROWS:
        spans = [(m.start(), m.end()) for m in pat.finditer(row["text"])
                 if m.group().lower() == term]
        if spans:
            out[row["url"]] = spans
    return out


def test_offsets_stored_and_match_text(offsets_index, ray_session):
    from lucene_ray.searcher import IndexSearcher

    s = IndexSearcher(offsets_index)
    text_by_key = {r["url"]: r["text"] for r in ROWS}
    for term in ("alpha", "beta", "gamma"):
        want = _expected_spans(term)
        got = {}
        for r in s.readers:
            d, f = r.postings(term)
            for doc in d.tolist():
                st, en = r.offsets_for_doc(term, doc)
                got[r.doc_keys[doc]] = list(zip(st.tolist(), en.tolist()))
        assert got == want, (term, got, want)
        # every span slices back to the term (case-insensitively)
        for key, spans in got.items():
            for a, b in spans:
                assert text_by_key[key][a:b].lower() == term


def test_offsets_survive_merge(offsets_index, ray_session):
    from lucene_ray.searcher import IndexSearcher
    from lucene_ray.state.merge import force_merge

    force_merge(offsets_index, max_segments=1)
    s = IndexSearcher(offsets_index)
    assert len(s.readers) == 1
    assert s.readers[0].has_offsets
    for term in ("alpha", "beta"):
        want = _expected_spans(term)
        r = s.readers[0]
        d, _ = r.postings(term)
        got = {r.doc_keys[doc]: list(zip(*[a.tolist() for a in r.offsets_for_doc(term, doc)]))
               for doc in d.tolist()}
        assert got == want


def test_term_spans_and_snippets(offsets_index, ray_session):
    from lucene_ray.pipelines.highlight import (fragment_from_spans,
                                                highlight_hits_offsets,
                                                term_spans)

    t = term_spans(offsets_index, ["alpha", "beta"]).to_pandas()
    want_n = sum(len(v) for term in ("alpha", "beta")
                 for v in _expected_spans(term).values())
    assert len(t) == want_n
    # snippet wraps exactly the stored spans
    text = ROWS[0]["text"]
    spans = t[(t.doc_key == "u00") & (t.term == "alpha")][
        ["start_off", "end_off"]].values.tolist()
    frag = fragment_from_spans(text, spans, max_chars=200)
    assert frag.count("<b>") == 3
    assert "<b>Alpha</b>" in frag and "<b>alpha</b>" in frag

    src = ray.data.from_items(
        [{"doc_id": r["url"], "text": r["text"]} for r in ROWS])
    out = highlight_hits_offsets(src, offsets_index, "alpha beta",
                                 key_col="doc_id").to_pandas()
    by_key = dict(zip(out.doc_id, out.snippet))
    assert by_key["u01"].count("<b>") == 3
    assert "<b>" not in by_key["u02"]


def test_offsets_index_without_flag_raises(tmp_path, ray_session):
    from lucene_ray.pipelines.index_pipeline import build_index
    from lucene_ray.pipelines.highlight import term_spans

    idx = str(tmp_path / "noofs")
    build_index(ray.data.from_items(ROWS), idx, key_col="url",
                text_col="text", num_partitions=1)
    with pytest.raises(ValueError, match="store_offsets"):
        term_spans(idx, ["alpha"])

"""Payload surface — DelimitedPayloadTokenFilter (analysis/common/.../
payloads/DelimitedPayloadTokenFilter.java + FloatEncoder) and
PayloadScoreQuery (queries/payloads/PayloadScoreQuery.java with the four
PayloadFunctions) — semantics transliterated, not code."""

import numpy as np
import pytest

from lucene_ray.functions.analysis import get_analyzer
from lucene_ray.query import PayloadScoreQuery, TermQuery


def test_delimited_payload_tokenize():
    a = get_analyzer({"kind": "whitespace", "payload_delimiter": "|"})
    codes, vocab, doc_idx, positions, pays, dl = (
        a.tokenize_batch_encoded_payloads(
            ["The|1.5 quick|2 red|0.5 fox|10", "plain token|3"]))
    terms = [vocab[c] for c in codes]
    # term part lowercased after the split (whitespace → payload → lower)
    assert terms == ["the", "quick", "red", "fox", "plain", "token"]
    assert pays.tolist() == [1.5, 2.0, 0.5, 10.0, 0.0, 3.0]
    assert dl.tolist() == [4, 2]
    assert positions.tolist() == [0, 1, 2, 3, 0, 1]


def test_delimited_payload_requires_whitespace():
    with pytest.raises(ValueError):
        get_analyzer({"kind": "standard", "payload_delimiter": "|"})


def test_delimited_payload_bad_float():
    a = get_analyzer({"kind": "whitespace", "payload_delimiter": "|"})
    with pytest.raises(ValueError):
        a.tokenize_batch_encoded_payloads(["word|notafloat"])


def test_tokenize_batch_strips_payloads_for_queries():
    # the non-payload tokenize path must agree on TERMS so query-side
    # analysis meets the indexed terms
    a = get_analyzer({"kind": "whitespace", "payload_delimiter": "|"})
    terms, _, _, _ = a.tokenize_batch(["Foo|2 bar"])
    assert list(terms) == ["foo", "bar"]


@pytest.fixture(scope="module")
def payload_index(tmp_path_factory, ray_session):
    import pyarrow as pa
    import pyarrow.parquet as pq

    from lucene_ray.pipelines.index_pipeline import build_index_by_file

    tmp = tmp_path_factory.mktemp("pay")
    src = str(tmp / "docs.parquet")
    pq.write_table(pa.table({
        "url": ["u0", "u1", "u2"],
        "text": ["cat|2 dog|1 cat|4",      # cat: sum 6 max 4 min 2 avg 3
                 "cat|10 bird|1",          # cat: 10
                 "dog|5 dog|7"],           # no cat
    }), src)
    idx = str(tmp / "idx")
    build_index_by_file(src, idx, key_col="url", text_col="text",
                        analyzer={"kind": "whitespace",
                                  "payload_delimiter": "|"},
                        store_payloads=True)
    return idx


def _scores(searcher, q):
    td = searcher.search(q, k=10, algo="exhaustive")
    return {str(sd.doc_key): round(float(sd.score), 4) for sd in td.score_docs}


def test_payload_score_functions(payload_index):
    from lucene_ray.searcher import IndexSearcher

    s = IndexSearcher(payload_index)
    assert _scores(s, PayloadScoreQuery("cat", "sum")) == {"u0": 6.0, "u1": 10.0}
    assert _scores(s, PayloadScoreQuery("cat", "max")) == {"u0": 4.0, "u1": 10.0}
    assert _scores(s, PayloadScoreQuery("cat", "min")) == {"u0": 2.0, "u1": 10.0}
    assert _scores(s, PayloadScoreQuery("cat", "avg")) == {"u0": 3.0, "u1": 10.0}
    assert _scores(s, PayloadScoreQuery("dog", "sum")) == {"u0": 1.0, "u2": 12.0}


def test_payload_include_span_score(payload_index):
    from lucene_ray.searcher import IndexSearcher

    s = IndexSearcher(payload_index)
    plain = _scores(s, TermQuery("cat"))
    combined = _scores(s, PayloadScoreQuery("cat", "sum",
                                            include_span_score=True))
    pay = _scores(s, PayloadScoreQuery("cat", "sum"))
    for k in plain:
        assert combined[k] == pytest.approx(plain[k] * pay[k], rel=1e-4)


def test_payloads_survive_merge(payload_index, ray_session):
    from lucene_ray.searcher import IndexSearcher
    from lucene_ray.state.merge import force_merge

    force_merge(payload_index, max_segments=1)
    s = IndexSearcher(payload_index)
    assert _scores(s, PayloadScoreQuery("cat", "sum")) == {"u0": 6.0, "u1": 10.0}
    assert _scores(s, PayloadScoreQuery("dog", "max")) == {"u0": 1.0, "u2": 7.0}


def test_payload_query_without_payload_index(tmp_path, ray_session):
    import pyarrow as pa
    import pyarrow.parquet as pq

    from lucene_ray.pipelines.index_pipeline import build_index_by_file
    from lucene_ray.searcher import IndexSearcher

    src = str(tmp_path / "d.parquet")
    pq.write_table(pa.table({"url": ["a"], "text": ["just words"]}), src)
    idx = str(tmp_path / "i")
    build_index_by_file(src, idx, key_col="url", text_col="text")
    s = IndexSearcher(idx)
    with pytest.raises(ValueError):
        s.search(PayloadScoreQuery("words", "sum"), k=5, algo="exhaustive")


# ------------------------------------------- review-fix regression tests


def test_payload_chain_respects_vocab_filters():
    a = get_analyzer({"kind": "whitespace", "payload_delimiter": "|",
                      "stop_words": ["the"], "min_token_length": 2})
    codes, vocab, doc_idx, positions, pays, dl = (
        a.tokenize_batch_encoded_payloads(["The|1 big|2 x|9 fox|3"]))
    terms = [vocab[c] for c in codes]
    assert terms == ["big", "fox"]           # stopword + short token dropped
    assert pays.tolist() == [2.0, 3.0]       # payloads filtered in lockstep
    assert positions.tolist() == [1, 3]      # posIncr bump preserved
    assert dl.tolist() == [2]


def test_payload_chain_normalize_lowercases():
    a = get_analyzer({"kind": "whitespace", "payload_delimiter": "|"})
    assert a.normalize("Fox") == "fox"       # index side lowercases the term


def test_payloads_survive_merge_without_positions(tmp_path, ray_session):
    import pyarrow as pa
    import pyarrow.parquet as pq

    from lucene_ray.pipelines.index_pipeline import build_index_by_file
    from lucene_ray.searcher import IndexSearcher
    from lucene_ray.state.merge import force_merge

    src = str(tmp_path / "d.parquet")
    pq.write_table(pa.table({
        "url": ["a", "b"], "text": ["cat|2 cat|4", "cat|10"]}), src)
    idx = str(tmp_path / "i")
    build_index_by_file(src, idx, key_col="url", text_col="text",
                        analyzer={"kind": "whitespace",
                                  "payload_delimiter": "|"},
                        store_payloads=True, store_positions=False)
    force_merge(idx, max_segments=1)
    s = IndexSearcher(idx)
    assert _scores(s, PayloadScoreQuery("cat", "sum")) == {"a": 6.0, "b": 10.0}

"""KeywordAnalyzer (core/.../analysis/core/KeywordAnalyzer.java): the whole
input is one token — no tokenization, no case folding, any length."""

import numpy as np
import pyarrow as pa

from lucene_ray.functions.analysis import get_analyzer


def test_keyword_one_token():
    a = get_analyzer("keyword")
    assert a.tokenize_one("Hello World-42!") == [("Hello World-42!", 0)]
    assert a.tokenize_one("") == []
    assert a.normalize("Mixed Case") == "Mixed Case"


def test_keyword_long_ids_not_capped():
    a = get_analyzer("keyword")
    long_id = "x" * 1000
    assert a.tokenize_one(long_id) == [(long_id, 0)]


def test_keyword_batch_arrow_and_list_agree():
    a = get_analyzer("keyword")
    docs = ["id-001", "", "A B C", None]
    c1, v1, d1, p1, dl1 = a.tokenize_batch_encoded(pa.array(docs))
    c2, v2, d2, p2, dl2 = a.tokenize_batch_encoded(
        [x if x is not None else "" for x in docs])
    assert list(v1[c1]) == list(v2[c2]) == ["id-001", "A B C"]
    assert d1.tolist() == d2.tolist() == [0, 2]
    assert dl1.tolist() == [1, 0, 1, 0]


def test_keyword_offsets_span_whole_input():
    a = get_analyzer("keyword")
    codes, vocab, doc_idx, positions, starts, ends, dl = (
        a.tokenize_batch_encoded_offsets(["Exact Match"]))
    assert list(vocab[codes]) == ["Exact Match"]
    assert starts.tolist() == [0] and ends.tolist() == [11]


def test_keyword_index_roundtrip(tmp_path, ray_session):
    import pyarrow.parquet as pq

    from lucene_ray.pipelines.index_pipeline import build_index_by_file
    from lucene_ray.query import TermQuery
    from lucene_ray.searcher import IndexSearcher

    src = str(tmp_path / "d.parquet")
    pq.write_table(pa.table({
        "url": ["a", "b"],
        "text": ["SKU-12345 Rev B", "SKU-99"]}), src)
    idx = str(tmp_path / "i")
    build_index_by_file(src, idx, key_col="url", text_col="text",
                        analyzer="keyword")
    s = IndexSearcher(idx)
    assert s.count(TermQuery("SKU-12345 Rev B")) == 1
    assert s.count(TermQuery("sku-12345 rev b")) == 0  # case preserved
    assert s.count(TermQuery("SKU-99")) == 1


# ---------------------------------------- misc filters + HighFreqTerms


def test_length_filter():
    # LengthFilter(min=3): short tokens dropped, positions bumped
    a = get_analyzer("simple", min_token_length=3)
    toks = a.tokenize_one("go to the market now")
    assert [(t, int(p)) for t, p in toks] == [
        ("the", 2), ("market", 3), ("now", 4)]


def test_keep_word_filter():
    a = get_analyzer("simple", keep_words=frozenset(["alpha", "gamma"]))
    toks = [t for t, _ in a.tokenize_one("alpha beta gamma delta")]
    assert toks == ["alpha", "gamma"]


def test_high_freq_terms(tmp_path, ray_session):
    import pyarrow.parquet as pq

    from scripts.high_freq_terms import high_freq_terms

    src = str(tmp_path / "d.parquet")
    pq.write_table(pa.table({
        "url": ["a", "b", "c"],
        "text": ["x x x y", "x y z", "y w"]}), src)
    from lucene_ray.pipelines.index_pipeline import build_index_by_file

    idx = str(tmp_path / "i")
    build_index_by_file(src, idx, key_col="url", text_col="text",
                        analyzer="simple")
    by_df = high_freq_terms(idx, k=2)
    assert by_df == [("y", 3, 3), ("x", 2, 4)]
    by_tf = high_freq_terms(idx, k=2, by_total_tf=True)
    assert by_tf == [("x", 2, 4), ("y", 3, 3)]

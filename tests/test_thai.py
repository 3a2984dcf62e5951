"""thai-lite analyzer (analysis/common/.../th/ThaiAnalyzer.java:93-100,
ThaiTokenizer.java). Goldens mirror the reference's TestThaiAnalyzer
cases the reduced lexicon determines; out-of-lexicon compounds staying
joined is the documented divergence."""

from lucene_ray.functions.analysis import get_analyzer
from lucene_ray.functions.thai import THAI_STOP_WORDS, ThaiTokenizer


def test_stop_list_verbatim_size():
    # th/stopwords.txt: 115 entries
    assert len(THAI_STOP_WORDS) == 115
    assert "ที่" in THAI_STOP_WORDS and "การ" in THAI_STOP_WORDS


def test_function_words_segment():
    # TestThaiAnalyzer's classic sentence: the function words split off
    t = ThaiTokenizer()
    toks = t.tokenize_surfaces("การที่ได้ต้องแสดงว่างานดี")
    assert toks[:6] == ["การ", "ที่", "ได้", "ต้อง", "แสดง", "ว่า"]
    # reduced divergence: งาน+ดี stay joined without the full dictionary
    assert toks[6:] == ["งานดี"]


def test_offsets_and_latin_digits():
    t = ThaiTokenizer()
    toks = t.tokenize("ประโยคว่า 3000 บาท")
    assert [s for s, *_ in toks] == ["ประโยค", "ว่า", "3000", "บาท"]
    # offsets index the original text
    for s, a, b in toks:
        assert "ประโยคว่า 3000 บาท"[a:b] == s


def test_custom_lexicon_splits_content():
    t = ThaiTokenizer(lexicon=set(THAI_STOP_WORDS) | {"งาน", "ดี"})
    assert t.tokenize_surfaces("แสดงว่างานดี") == ["แสดง", "ว่า", "งาน", "ดี"]


def test_analyzer_chain():
    # ThaiTokenizer -> LowerCase -> DecimalDigit -> Stop(th stopwords)
    a = get_analyzer("thai")
    toks = [t for t, _ in a.tokenize_one("การแสดง ABC ๓๐ บาท")]
    # การ stopped; Latin lowered; Thai digits ๓๐ folded to 30
    assert toks == ["แสดง", "abc", "30", "บาท"]


def test_thai_index_roundtrip(tmp_path, ray_session):
    import pyarrow as pa
    import pyarrow.parquet as pq

    from lucene_ray.pipelines.index_pipeline import build_index_by_file
    from lucene_ray.query import TermQuery
    from lucene_ray.searcher import IndexSearcher

    src = str(tmp_path / "th.parquet")
    pq.write_table(pa.table({
        "url": ["a", "b"],
        "text": ["การที่ได้ต้องแสดงว่างานดี", "ประโยคว่า 3000 บาท"]}), src)
    idx = str(tmp_path / "thi")
    build_index_by_file(src, idx, key_col="url", text_col="text",
                        analyzer="thai")
    s = IndexSearcher(idx)
    assert s.count(TermQuery("แสดง")) == 1
    assert s.count(TermQuery("บาท")) == 1
    assert s.count(TermQuery("ที่")) == 0  # stopword

"""smartcn-lite Chinese analyzer (analysis/smartcn/.../cn/smart/
HMMChineseTokenizer.java, SmartChineseAnalyzer.java:123-134). Goldens
mirror the reference's TestSmartChineseAnalyzer cases the reduced lexicon
determines (in-lexicon segmentation, OOV single-char emission, Latin
lowercasing + Porter stem, full-width folding, punctuation removal)."""

from lucene_ray.functions.analysis import get_analyzer
from lucene_ray.functions.smartcn import ChineseTokenizer


def test_lexicon_segmentation():
    ct = ChineseTokenizer()
    assert ct.tokenize_surfaces("我们的朋友在中国工作") == [
        "我们", "的", "朋友", "在", "中国", "工作"]
    # longest match beats a chain of shorter entries
    assert ct.tokenize_surfaces("中国家") in (["中国", "家"], ["中", "国家"])


def test_oov_single_char():
    # SegTokenFilter emits unrecognized Hanzi one per token
    ct = ChineseTokenizer()
    toks = ct.tokenize("天气")
    assert toks == [("天", 0, 1), ("气", 1, 2)]


def test_latin_lowercase_and_digits():
    # SegTokenFilter lowercases Basic Latin (the analyzer chain has no
    # LowerCaseFilter, SmartChineseAnalyzer.java:126-127)
    ct = ChineseTokenizer()
    assert ct.tokenize("Hello World 中国 2024") == [
        ("hello", 0, 5), ("world", 6, 11), ("中国", 12, 14),
        ("2024", 15, 19)]


def test_fullwidth_fold():
    ct = ChineseTokenizer()
    assert ct.tokenize_surfaces("ｆｕｌｌＷＩＤＴＨ１２３") == [
        "fullwidth", "123"]


def test_punctuation_dropped():
    # the reference drops punctuation via its stopword list
    # (cn/smart/stopwords.txt is exactly the punctuation tokens)
    ct = ChineseTokenizer()
    assert ct.tokenize_surfaces("他说：今天天气很好！") == [
        "他", "说", "今天", "天", "气", "很", "好"]
    keep = ChineseTokenizer(discard_punctuation=False)
    # full-width colon width-folds to ':' before tokenization
    assert ":" in keep.tokenize_surfaces("他说：今天")


def test_analyzer_chain_porter_stems_latin():
    # SmartChineseAnalyzer.java:129 — PorterStemFilter over the stream
    a = get_analyzer("smart_chinese")
    assert [t for t, _ in a.tokenize_one("我们 testing 中国")] == [
        "我们", "test", "中国"]


def test_custom_lexicon():
    ct = ChineseTokenizer(lexicon=["天气"])
    assert ct.tokenize_surfaces("今天天气") == ["今", "天", "天气"]


def test_smartcn_index_roundtrip(tmp_path, ray_session):
    import pyarrow as pa
    import pyarrow.parquet as pq

    from lucene_ray.pipelines.index_pipeline import build_index_by_file
    from lucene_ray.query import TermQuery
    from lucene_ray.searcher import IndexSearcher

    src = str(tmp_path / "zh.parquet")
    pq.write_table(pa.table({
        "url": ["a", "b"],
        "text": ["我们在中国工作", "他们喜欢学习 Computing"]}), src)
    idx = str(tmp_path / "zhi")
    build_index_by_file(src, idx, key_col="url", text_col="text",
                        analyzer="smart_chinese")
    s = IndexSearcher(idx)
    assert s.count(TermQuery("中国")) == 1
    assert s.count(TermQuery("学习")) == 1
    assert s.count(TermQuery("comput")) == 1  # Porter-stemmed Latin

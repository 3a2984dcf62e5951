"""nori-lite Korean analyzer (analysis/nori/.../ko/KoreanTokenizer.java,
KoreanAnalyzer.java, KoreanPartOfSpeechStopFilter.java:36,
dict/UserDictionary.java, KoreanNumberFilter.java). Goldens mirror the
reference's TestKoreanTokenizer/TestKoreanAnalyzer cases that the reduced
dictionary determines (user-dict segmentation, particle/ending splits,
char-class grouping)."""

from lucene_ray.functions.analysis import get_analyzer
from lucene_ray.functions.korean import (DEFAULT_STOP_TAGS, KoreanTokenizer,
                                         korean_number_normalize,
                                         parse_user_dict, pos_stop_filter)


def test_char_class_grouping():
    kt = KoreanTokenizer()
    # TestKoreanTokenizer: "44사이즈" -> 44, 사이즈
    assert kt.tokenize("44사이즈") == [
        ("44", 0, 2, "SN"), ("사이즈", 2, 5, "UNKNOWN")]
    assert [s for s, *_ in kt.tokenize("Hello 한국어 123")] == [
        "Hello", "한국어", "123"]
    assert kt.tokenize("Hello")[0][3] == "SL"
    assert kt.tokenize("123")[0][3] == "SN"


def test_particle_split():
    kt = KoreanTokenizer()
    # TestKoreanTokenizer: "화학 이외의 것" -> 화학, 이외, 의, 것
    assert [s for s, *_ in kt.tokenize("화학 이외의 것")] == [
        "화학", "이외", "의", "것"]
    # the particle carries POS J and an exact span
    toks = kt.tokenize("화학 이외의 것")
    assert toks[2] == ("의", 5, 6, "J")
    # stacked particles chain: 에서 + 는
    assert [(s, p) for s, _a, _b, p in kt.tokenize("학교에서는")] == [
        ("학교", "UNKNOWN"), ("에서", "J"), ("는", "J")]
    # run-INITIAL particle chars never strip (이 is a common noun syllable)
    assert [s for s, *_ in kt.tokenize("이외")] == ["이외"]


def test_ending_split():
    kt = KoreanTokenizer()
    toks = kt.tokenize("공부한다")
    assert [(s, p) for s, _a, _b, p in toks] == [
        ("공부", "UNKNOWN"), ("한다", "E")]


def test_user_dict_noun_and_compound():
    # dict/UserDictionary.java: noun line and compound line
    u = parse_user_dict(["세종", "세종시 세종 시", "# comment", ""])
    assert u == {"세종": ("세종",), "세종시": ("세종", "시")}
    kt = KoreanTokenizer(user_dict=["가락지나물", "한국", "중국", "일본"])
    # TestKoreanTokenizer's user-dict case
    assert [s for s, *_ in kt.tokenize("가락지나물은 한국, 중국, 일본")] == [
        "가락지나물", "은", "한국", "중국", "일본"]


def test_decompound_modes():
    # TestKoreanTokenizer decompound cases: 가락지나물 = 가락지 + 나물
    line = ["가락지나물 가락지 나물"]
    discard = KoreanTokenizer(user_dict=line)  # DEFAULT_DECOMPOUND
    assert [s for s, *_ in discard.tokenize("가락지나물은")] == [
        "가락지", "나물", "은"]
    none = KoreanTokenizer(user_dict=line, decompound_mode="none")
    assert [s for s, *_ in none.tokenize("가락지나물은")] == ["가락지나물", "은"]
    mixed = KoreanTokenizer(user_dict=line, decompound_mode="mixed")
    toks = mixed.tokenize("가락지나물은")
    assert [s for s, *_ in toks] == ["가락지나물", "가락지", "나물", "은"]
    # surface and first part share the start offset (MIXED emission)
    assert toks[0][1] == toks[1][1] == 0


def test_pos_stop_filter_default_tags():
    # KoreanPartOfSpeechStopFilter.DEFAULT_STOP_TAGS drops J/E/SP...
    assert "J" in DEFAULT_STOP_TAGS and "E" in DEFAULT_STOP_TAGS
    kt = KoreanTokenizer()
    toks = kt.tokenize("세종시는 아름답다")
    kept = pos_stop_filter(toks)
    assert [s for s, *_ in kept] == ["세종시", "아름답"]
    assert kt.tokenize_surfaces("세종시는 아름답다") == ["세종시", "아름답"]


def test_hanja_single_char():
    kt = KoreanTokenizer()
    toks = kt.tokenize("韓國")
    assert [(s, p) for s, _a, _b, p in toks] == [("韓", "SH"), ("國", "SH")]


def test_punctuation():
    kt = KoreanTokenizer()
    assert [s for s, *_ in kt.tokenize("한국!")] == ["한국"]
    keep = KoreanTokenizer(discard_punctuation=False)
    assert [(s, p) for s, _a, _b, p in keep.tokenize("한국!")] == [
        ("한국", "UNKNOWN"), ("!", "SP")]


def test_korean_number_normalize():
    # KoreanNumberFilter.java test shapes
    assert korean_number_normalize("삼천") == "3000"
    assert korean_number_normalize("3천") == "3000"
    assert korean_number_normalize("십만") == "100000"
    assert korean_number_normalize("일조육백만십일") == "1000006000011"
    assert korean_number_normalize(
        "일억이천삼백사십오만육천칠백팔십구") == "123456789"
    assert korean_number_normalize("안녕") == "안녕"     # not a numeral
    assert korean_number_normalize("사과") == "사과"     # 사 alone isn't enough
    assert korean_number_normalize("") == ""


def test_analyzer_chain():
    # KoreanAnalyzer: tokenizer -> POS stop -> (reading form no-op) -> lower
    a = get_analyzer("korean")
    assert [t for t, _ in a.tokenize_one("세종시는 아름답다 HELLO")] == [
        "세종시", "아름답", "hello"]
    b = get_analyzer({"kind": "korean", "korean_user_dict": ["세종시 세종 시"]})
    assert [t for t, _ in b.tokenize_one("세종시는")] == ["세종", "시"]
    c = get_analyzer({"kind": "korean", "korean_user_dict": ["세종시 세종 시"],
                      "korean_decompound": "none"})
    assert [t for t, _ in c.tokenize_one("세종시는")] == ["세종시"]


def test_korean_index_roundtrip(tmp_path, ray_session):
    import pyarrow as pa
    import pyarrow.parquet as pq

    from lucene_ray.pipelines.index_pipeline import build_index_by_file
    from lucene_ray.query import TermQuery
    from lucene_ray.searcher import IndexSearcher

    src = str(tmp_path / "ko.parquet")
    pq.write_table(pa.table({
        "url": ["a", "b"],
        "text": ["세종시는 아름답다", "학교에서는 공부한다"]}), src)
    idx = str(tmp_path / "koi")
    build_index_by_file(
        src, idx, key_col="url", text_col="text",
        analyzer={"kind": "korean", "korean_user_dict": ["세종시 세종 시"]})
    s = IndexSearcher(idx)
    assert s.count(TermQuery("세종")) == 1   # decompounded part indexed
    assert s.count(TermQuery("학교")) == 1   # particle stripped
    assert s.count(TermQuery("는")) == 0     # josa dropped by POS filter


def test_user_dict_rejects_bad_segmentation():
    """UserDictionary.java rejects segments that don't concatenate to the
    surface (a silent accept would drop text from the token stream)."""
    import pytest

    with pytest.raises(ValueError, match="concatenate"):
        parse_user_dict(["세종시 세종"])

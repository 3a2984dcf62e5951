"""kuromoji-lite Japanese tokenizer — goldens transliterated from the
reference cases the user dictionary / unknown-word character rules fully
determine (analysis/kuromoji/src/test/.../TestJapaneseTokenizer.java:
testUserDict2, testUserDict3, testCustomDictionary, testNormalMode, the
surrogate kanji case, testEnd's function-word lattice), plus the
CJKWidth / KatakanaStem filter semantics."""

from pathlib import Path

import pytest

from lucene_ray.functions.analysis import get_analyzer
from lucene_ray.functions.kuromoji import (
    JapaneseTokenizer,
    cjk_width_fold,
    katakana_stem,
    parse_user_dict,
)

_REF_USERDICT = Path("/root/reference/lucene/analysis/kuromoji/src/test/"
                     "org/apache/lucene/analysis/ja/userdict.txt")

USERDICT_LINES = (
    "日本経済新聞,日本 経済 新聞,ニホン ケイザイ シンブン,カスタム名詞",
    "関西国際空港,関西 国際 空港,カンサイ コクサイ クウコウ,テスト名詞",
    "朝青龍,朝青龍,アサショウリュウ,カスタム人名",
    "abcd,a b cd,foo1 foo2 foo3,bar",
    "abcdefg,ab cd efg,foo1 foo2 foo4,bar",
)


@pytest.fixture(scope="module")
def jt():
    lines = (_REF_USERDICT.read_text().splitlines()
             if _REF_USERDICT.exists() else USERDICT_LINES)
    return JapaneseTokenizer(user_dict=lines)


def test_user_dict_parse():
    d = parse_user_dict(USERDICT_LINES)
    assert d["関西国際空港"] == ("関西", "国際", "空港")
    assert d["朝青龍"] == ("朝青龍",)


def test_user_dict_overrides_unknown_kanji(jt):
    # testUserDict2: w/o userdict 朝青龍 would split into kanji singles
    assert jt.tokenize("朝青龍") == [("朝青龍", 0, 3)]


def test_user_dict_segmentation_offsets(jt):
    # testUserDict3 / testCustomDictionary: entry splits with offsets
    assert jt.tokenize("abcd") == [("a", 0, 1), ("b", 1, 2), ("cd", 2, 4)]
    assert jt.tokenize("abcdefg") == [("ab", 0, 2), ("cd", 2, 4),
                                      ("efg", 4, 7)]


def test_user_dict_long_entry(jt):
    assert jt.tokenize("関西国際空港") == [("関西", 0, 2), ("国際", 2, 4),
                                           ("空港", 4, 6)]


def test_normal_mode_katakana_run(jt):
    # testNormalMode: one grouped katakana token
    assert jt.tokenize_surfaces("シニアソフトウェアエンジニア") == [
        "シニアソフトウェアエンジニア"]


def test_kanji_singles(jt):
    # TestJapaneseTokenizer surrogate case: KANJI does not group
    assert jt.tokenize_surfaces("𩬅艱鍟䇹愯瀛") == [
        "𩬅", "艱", "鍟", "䇹", "愯", "瀛"]


def test_function_word_lattice(jt):
    # testEnd's stream: これ/は/本/で/は/ない
    assert jt.tokenize_surfaces("これは本ではない") == [
        "これ", "は", "本", "で", "は", "ない"]
    # offsets
    assert jt.tokenize("これは本ではない") == [
        ("これ", 0, 2), ("は", 2, 3), ("本", 3, 4), ("で", 4, 5),
        ("は", 5, 6), ("ない", 6, 8)]


def test_punctuation_discarded(jt):
    assert jt.tokenize_surfaces("......") == []
    assert jt.tokenize_surfaces("関西国際空港、朝青龍") == [
        "関西", "国際", "空港", "朝青龍"]


def test_latin_and_digit_runs(jt):
    assert jt.tokenize_surfaces("merge order line") == [
        "merge", "order", "line"]
    assert jt.tokenize_surfaces("2024年") == ["2024", "年"]


def test_cjk_width_fold():
    assert cjk_width_fold("Ｃプログラム") == "Cプログラム"
    assert cjk_width_fold("ｶﾞ") == "ガ"
    assert cjk_width_fold("ascii") == "ascii"


def test_katakana_stem():
    assert katakana_stem("コンピューター") == "コンピュータ"
    assert katakana_stem("ター") == "ター"  # below minimum length
    assert katakana_stem("data") == "data"


def test_japanese_analyzer_chain():
    a = get_analyzer("japanese")
    toks = [t for t, _ in a.tokenize_one("コンピューターを使う")]
    # を stopped, katakana stemmed, 使 kanji single, う stopped
    assert toks == ["コンピュータ", "使"]
    assert a.normalize("コンピューター") == "コンピュータ"
    b = get_analyzer({"kind": "japanese",
                      "japanese_user_dict": list(USERDICT_LINES)})
    assert [t for t, _ in b.tokenize_one("関西国際空港に行く")] == [
        "関西", "国際", "空港", "行", "く"]


def test_japanese_index_roundtrip(tmp_path, ray_session):
    import pyarrow as pa
    import pyarrow.parquet as pq

    from lucene_ray.pipelines.index_pipeline import build_index_by_file
    from lucene_ray.query import TermQuery
    from lucene_ray.searcher import IndexSearcher

    src = str(tmp_path / "ja.parquet")
    pq.write_table(pa.table({
        "url": ["a", "b"],
        "text": ["関西国際空港は大きい", "コンピューターは速い"]}), src)
    idx = str(tmp_path / "jai")
    build_index_by_file(
        src, idx, key_col="url", text_col="text",
        analyzer={"kind": "japanese",
                  "japanese_user_dict": list(USERDICT_LINES)})
    s = IndexSearcher(idx)
    assert s.count(TermQuery("空港")) == 1
    assert s.count(TermQuery("コンピュータ")) == 1  # stemmed form indexed
    assert s.count(TermQuery("は")) == 0  # stopword


def test_user_dict_rejects_bad_segmentation():
    import pytest

    from lucene_ray.functions.kuromoji import parse_user_dict

    with pytest.raises(ValueError, match="concatenate"):
        parse_user_dict(["関西国際空港,関西 国際,カンサイ,名詞"])


def test_cased_user_dict_surface_matches():
    """LowerCaseFilter runs LAST (ja/JapaneseAnalyzer.java): a cased
    user-dictionary surface must match the raw text, tokens lowercase
    afterwards."""
    a = get_analyzer({"kind": "japanese",
                      "japanese_user_dict":
                      ["iPhone7,iPhone 7,アイフォンナナ,名詞"]})
    assert [t for t, _ in a.tokenize_one("iPhone7を使う")] == [
        "iphone", "7", "使"]

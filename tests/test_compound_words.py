"""DictionaryCompoundWordTokenFilter goldens — cases transliterated from
the reference tests (analysis/common/src/test/.../compound/
TestCompoundWordTokenFilter.java, testDumbCompoundWordsSE*) — semantics,
not code."""

import pytest

from lucene_ray.functions.analysis import get_analyzer

SE_DICT = ["Bil", "Dörr", "Motor", "Tak", "Borr", "Slag", "Hammar", "Pelar",
           "Glas", "Ögon", "Fodral", "Bas", "Fiol", "Makare", "Gesäll",
           "Sko", "Vind", "Rute", "Torkare", "Blad"]


def _toks(analyzer, text):
    return [(t, int(p)) for t, p in analyzer.tokenize_one(text)]


def test_dumb_compound_words_se():
    # testDumbCompoundWordsSE: original kept, subwords stacked at its
    # position (posInc 0), emission order i-ascending
    a = get_analyzer("whitespace", compound_dictionary=frozenset(SE_DICT))
    text = ("Bildörr Bilmotor Biltak Slagborr Hammarborr Pelarborr "
            "Glasögonfodral Basfiolsfodral Basfiolsfodralmakaregesäll "
            "Skomakare Vindrutetorkare Vindrutetorkarblad abba")
    expected = [
        ("Bildörr", 0), ("Bil", 0), ("dörr", 0),
        ("Bilmotor", 1), ("Bil", 1), ("motor", 1),
        ("Biltak", 2), ("Bil", 2), ("tak", 2),
        ("Slagborr", 3), ("Slag", 3), ("borr", 3),
        ("Hammarborr", 4), ("Hammar", 4), ("borr", 4),
        ("Pelarborr", 5), ("Pelar", 5), ("borr", 5),
        ("Glasögonfodral", 6), ("Glas", 6), ("ögon", 6), ("fodral", 6),
        ("Basfiolsfodral", 7), ("Bas", 7), ("fiol", 7), ("fodral", 7),
        ("Basfiolsfodralmakaregesäll", 8), ("Bas", 8), ("fiol", 8),
        ("fodral", 8), ("makare", 8), ("gesäll", 8),
        ("Skomakare", 9), ("Sko", 9), ("makare", 9),
        ("Vindrutetorkare", 10), ("Vind", 10), ("rute", 10), ("torkare", 10),
        ("Vindrutetorkarblad", 11), ("Vind", 11), ("rute", 11), ("blad", 11),
        ("abba", 12),
    ]
    assert _toks(a, text) == expected


def test_dumb_compound_words_se_longest_match():
    # testDumbCompoundWordsSELongestMatch: per start offset only the
    # longest dictionary match is kept
    dic = frozenset(SE_DICT + ["Fiols", "Fiolsfodral"]) - {"Fiol"}
    a = get_analyzer("whitespace", compound_dictionary=dic,
                     compound_only_longest=True)
    assert _toks(a, "Basfiolsfodralmakaregesäll") == [
        ("Basfiolsfodralmakaregesäll", 0), ("Bas", 0), ("fiolsfodral", 0),
        ("fodral", 0), ("makare", 0), ("gesäll", 0)]


def test_compound_min_word_size():
    # tokens shorter than compound_min_word pass through untouched
    a = get_analyzer("whitespace", compound_dictionary=frozenset(["ab", "cd"]))
    assert _toks(a, "abcd") == [("abcd", 0)]          # len 4 < min_word 5
    assert _toks(a, "abcdcd") == [("abcdcd", 0), ("ab", 0), ("cd", 0),
                                  ("cd", 0)]


def test_compound_ending_with_min_length_component():
    # testTokenEndingWithWordComponentOfMinimumLength
    a = get_analyzer("whitespace",
                     compound_dictionary=frozenset(["ab", "cd", "ef"]))
    assert _toks(a, "abcdef") == [("abcdef", 0), ("ab", 0), ("cd", 0),
                                  ("ef", 0)]


def test_compound_field_length_discounts_overlaps():
    a = get_analyzer("whitespace", compound_dictionary=frozenset(SE_DICT))
    codes, vocab, doc_idx, positions, dl = a.tokenize_batch_encoded(
        ["Bildörr abba"])
    assert len(codes) == 4          # Bildörr, Bil, dörr, abba
    assert dl.tolist() == [2]       # stacked subwords don't count


def test_compound_index_roundtrip(tmp_path, ray_session):
    import pyarrow as pa
    import pyarrow.parquet as pq

    from lucene_ray.pipelines.index_pipeline import build_index_by_file
    from lucene_ray.query import TermQuery
    from lucene_ray.searcher import IndexSearcher

    src = str(tmp_path / "d.parquet")
    pq.write_table(pa.table({
        "url": ["a", "b"],
        "text": ["vindrutetorkare i bilen", "ingen traff har"]}), src)
    idx = str(tmp_path / "i")
    spec = {"kind": "simple",
            "compound_dictionary": ["vind", "rute", "torkare"]}
    build_index_by_file(src, idx, key_col="url", text_col="text",
                        analyzer=spec)
    s = IndexSearcher(idx)
    assert s.count(TermQuery("vindrutetorkare")) == 1   # original kept
    assert s.count(TermQuery("rute")) == 1              # subword searchable
    assert s.count(TermQuery("torkare")) == 1


# =================================================== PhoneticFilter
# (analysis/phonetic/PhoneticFilter.java + TestPhoneticFilter.java —
# encoded token injected BEFORE the kept original at the same position).

from lucene_ray.functions.stemming import refined_soundex, soundex


@pytest.mark.parametrize("inp,out", [
    ("aaa", "A000"), ("bbb", "B000"), ("ccc", "C000"), ("easgasg", "E220"),
    ("Robert", "R163"), ("Rupert", "R163"),
    ("Ashcraft", "A261"), ("Ashcroft", "A261"), ("Tymczak", "T522"),
])
def test_soundex(inp, out):
    assert soundex(inp) == out


@pytest.mark.parametrize("inp,out", [
    ("aaa", "A0"), ("bbb", "B1"), ("ccc", "C3"), ("easgasg", "E034034"),
])
def test_refined_soundex(inp, out):
    assert refined_soundex(inp) == out


def test_phonetic_filter_inject():
    # TestPhoneticFilter Soundex inject=true table (lowercased chain:
    # encodings come out as emitted, originals keep their case path)
    a = get_analyzer("whitespace", phonetic="soundex")
    toks = _toks(a, "aaa bbb ccc easgasg")
    assert toks == [("A000", 0), ("aaa", 0), ("B000", 1), ("bbb", 1),
                    ("C000", 2), ("ccc", 2), ("E220", 3), ("easgasg", 3)]


def test_phonetic_filter_replace():
    a = get_analyzer("whitespace", phonetic="soundex",
                     phonetic_inject=False)
    assert _toks(a, "aaa bbb ccc easgasg") == [
        ("A000", 0), ("B000", 1), ("C000", 2), ("E220", 3)]


def test_phonetic_refined_inject():
    a = get_analyzer("whitespace", phonetic="refined_soundex")
    assert _toks(a, "aaa easgasg") == [
        ("A0", 0), ("aaa", 0), ("E034034", 1), ("easgasg", 1)]


def test_phonetic_index_roundtrip(tmp_path, ray_session):
    import pyarrow as pa
    import pyarrow.parquet as pq

    from lucene_ray.pipelines.index_pipeline import build_index_by_file
    from lucene_ray.query import TermQuery
    from lucene_ray.searcher import IndexSearcher

    src = str(tmp_path / "d.parquet")
    pq.write_table(pa.table({
        "url": ["a", "b"],
        "text": ["robert called", "rupert answered"]}), src)
    idx = str(tmp_path / "i")
    build_index_by_file(src, idx, key_col="url", text_col="text",
                        analyzer={"kind": "simple", "phonetic": "soundex"})
    s = IndexSearcher(idx)
    # both docs match the shared phonetic code; originals still searchable
    assert s.count(TermQuery("R163")) == 2
    assert s.count(TermQuery("robert")) == 1
    assert s.count(TermQuery("rupert")) == 1


# --------------------------------------------------- DoubleMetaphone (r5)


from lucene_ray.functions.metaphone import double_metaphone_codes


@pytest.mark.parametrize("inp,primary,alternate", [
    # TestDoubleMetaphoneFilter.java goldens
    ("international", "ANTR", "ANTR"),
    ("Kuczewski", "KSSK", "KXFS"),
    ("hello", "HL", "HL"),
    ("12345", "", ""),
    ("#$%@#^%&", "", ""),
    # commons-codec DoubleMetaphone published vectors
    ("maurice", "MRS", "MRS"),
    ("aubrey", "APR", "APR"),
    ("cambrillo", "KMPR", "KMPR"),
    ("katherine", "K0RN", "KTRN"),
    ("Thumbail", "0MPL", "TMPL"),
    ("aumont", "AMNT", "AMNT"),
    ("schmidt", "XMT", "SMT"),
    ("smith", "SM0", "XMT"),
    ("school", "SKL", "SKL"),
    ("philip", "FLP", "FLP"),
    ("xavier", "SF", "SFR"),
    ("wright", "RT", "RT"),
    ("jose", "HS", "HS"),
])
def test_double_metaphone_codes(inp, primary, alternate):
    assert double_metaphone_codes(inp) == (primary, alternate)


def test_double_metaphone_max_len_8():
    # testSize8FalseInject
    assert double_metaphone_codes("international", 8)[0] == "ANTRNXNL"


def test_double_metaphone_filter_replace():
    # testSize4FalseInject / testAlternateInjectFalse /
    # testNonConvertableStringsWithoutInject
    a = get_analyzer("whitespace", phonetic="double_metaphone",
                     phonetic_inject=False)
    assert _toks(a, "international") == [("ANTR", 0)]
    assert _toks(a, "Kuczewski") == [("KSSK", 0), ("KXFS", 0)]
    assert _toks(a, "12345 #$%@#^%& hello") == [
        ("12345", 0), ("#$%@#^%&", 1), ("HL", 2)]


def test_double_metaphone_filter_inject():
    # testSize4TrueInject: original first, then codes at the same position
    a = get_analyzer("whitespace", phonetic="double_metaphone")
    assert _toks(a, "international") == [
        ("international", 0), ("ANTR", 0)]
    assert _toks(a, "Kuczewski") == [
        ("Kuczewski", 0), ("KSSK", 0), ("KXFS", 0)]
    assert _toks(a, "12345") == [("12345", 0)]


def test_double_metaphone_size8_replace():
    a = get_analyzer("whitespace", phonetic="double_metaphone",
                     phonetic_inject=False, phonetic_max_code_len=8)
    assert _toks(a, "international") == [("ANTRNXNL", 0)]


def test_double_metaphone_index_roundtrip(tmp_path, ray_session):
    import pyarrow as pa
    import pyarrow.parquet as pq

    from lucene_ray.pipelines.index_pipeline import build_index_by_file
    from lucene_ray.query import TermQuery
    from lucene_ray.searcher import IndexSearcher

    src = str(tmp_path / "dm.parquet")
    pq.write_table(pa.table({
        "url": ["a", "b"],
        "text": ["smith arrived", "smyth answered"]}), src)
    idx = str(tmp_path / "dmi")
    build_index_by_file(src, idx, key_col="url", text_col="text",
                        analyzer={"kind": "simple",
                                  "phonetic": "double_metaphone"})
    s = IndexSearcher(idx)
    # smith and smyth share both codes; originals remain searchable
    assert s.count(TermQuery("SM0")) == 2
    assert s.count(TermQuery("XMT")) == 2
    assert s.count(TermQuery("smith")) == 1


# classic Metaphone (commons-codec language/Metaphone — the other encoder
# PhoneticFilterFactory accepts); vectors from the commons-codec
# MetaphoneTest tables
import pytest as _pytest


@_pytest.mark.parametrize("inp,out", [
    ("howl", "HL"), ("testing", "TSTN"), ("The", "0"), ("quick", "KK"),
    ("brown", "BRN"), ("fox", "FKS"), ("jumped", "JMPT"), ("over", "OFR"),
    ("lazy", "LS"), ("dogs", "TKS"),
    # discard of SCE/SCI/SCY; silent GH / GN; PH->F; SH->X
    ("SCIENCE", "SNS"), ("SCENE", "SN"), ("SCY", "S"),
    ("GHENT", "KNT"), ("BAUGH", "B"), ("GNU", "N"), ("SIGNED", "SNT"),
    ("PHISH", "FX"), ("SHOT", "XT"),
    # initial-pair rules; CH hard/soft; TH; TCH; X->KS
    ("knife", "NF"), ("write", "RT"), ("what", "WT"), ("xavier", "SFR"),
    ("CHARACTER", "KRKT"), ("TEACH", "TX"), ("THEORY", "0R"),
    ("watch", "WX"), ("night", "NT"), ("", ""), ("a", "A"),
    # internal GN silent, H only before vowels, SCE-discard before CIA
    ("MAGNET", "MNT"), ("SIGNAL", "SNL"), ("RHYTHM", "R0M"),
    ("FASCIA", "FS"),
])
def test_metaphone(inp, out):
    from lucene_ray.functions.metaphone import metaphone

    assert metaphone(inp) == out


def test_metaphone_max_len():
    from lucene_ray.functions.metaphone import metaphone

    assert metaphone("CHARACTER", max_len=5) == "KRKTR"


def test_metaphone_filter_inject():
    a = get_analyzer("whitespace", phonetic="metaphone")
    assert _toks(a, "testing dogs") == [
        ("TSTN", 0), ("testing", 0), ("TKS", 1), ("dogs", 1)]


def test_metaphone_filter_replace():
    a = get_analyzer("whitespace", phonetic="metaphone",
                     phonetic_inject=False)
    assert _toks(a, "testing dogs") == [("TSTN", 0), ("TKS", 1)]


def test_double_metaphone_alternate_independent_of_primary():
    """DoubleMetaphoneFilter emits the alternate whenever nonempty,
    != primary and != original — even when the primary equals the token
    (case-preserving chain, token 'SML' -> alternate 'XML' indexes)."""
    a = get_analyzer("whitespace", phonetic="double_metaphone")
    assert [t for t, _ in a.tokenize_one("SML")] == ["SML", "XML"]

"""German / French analyzer chain goldens — cases transliterated from the
reference tests (analysis/common/src/test/.../de/TestGermanAnalyzer.java,
TestGermanLightStemFilter.java, TestGermanNormalizationFilter.java,
fr/TestFrenchAnalyzer.java, TestFrenchLightStemFilter.java) — semantics,
not code."""

import pytest

from lucene_ray.functions.analysis import (
    FRENCH_STOP_WORDS,
    GERMAN_STOP_WORDS,
    get_analyzer,
)
from lucene_ray.functions.stemming import (
    french_elide,
    french_light_stem,
    german_light_stem,
    german_normalize,
)


def _an(a, text):
    return [t for t, _ in a.tokenize_one(text)]


# --------------------------------------------- GermanNormalizationFilter


@pytest.mark.parametrize("inp,out", [
    ("schön", "schon"),          # umlaut fold
    ("schoen", "schon"),         # ae/oe/ue fold (umlaut FSM state)
    ("quelle", "quelle"),        # ue after q NOT folded
    ("feuer", "feuer"),          # ue after vowel NOT folded
    ("weißbier", "weissbier"),   # ß → ss
    ("äöü", "aou"),
])
def test_german_normalization(inp, out):
    assert german_normalize(inp) == out


# --------------------------------------------- GermanLightStemmer (UniNE)


@pytest.mark.parametrize("inp,out", [
    ("häuser", "haus"),
    ("hauses", "haus"),
    ("karten", "kart"),
    ("tisch", "tisch"),
    ("tische", "tisch"),
    ("tischen", "tisch"),
    ("", ""),
])
def test_german_light_stem(inp, out):
    assert german_light_stem(inp) == out


def test_german_analyzer_chain():
    a = get_analyzer("german")
    # TestGermanAnalyzer.java:32-34, 62-63
    assert _an(a, "Tisch") == ["tisch"]
    assert _an(a, "Tische") == ["tisch"]
    assert _an(a, "Tischen") == ["tisch"]
    assert _an(a, "Schaltflächen") == ["schaltflach"]
    assert _an(a, "Schaltflaechen") == ["schaltflach"]
    # stopwords removed (snowball german_stop.txt)
    assert _an(a, "der Tisch und die Karten") == ["tisch", "kart"]
    assert "der" in GERMAN_STOP_WORDS and "während" in GERMAN_STOP_WORDS


def test_german_stem_exclusion():
    # TestGermanLightStemFilter.testKeyword: excluded terms pass unstemmed
    a = get_analyzer("german", stem_exclusions=frozenset(["sängerinnen"]))
    assert _an(a, "sängerinnen") == ["sängerinnen"]


# --------------------------------------------- ElisionFilter


@pytest.mark.parametrize("inp,out", [
    ("l'avion", "avion"),
    ("d'avion", "avion"),
    ("qu'il", "il"),
    ("jusqu'à", "à"),
    ("xyz'abc", "xyz'abc"),   # non-article prefix kept
    ("l’avion", "avion"),     # typographic apostrophe
    ("avion", "avion"),
])
def test_french_elision(inp, out):
    assert french_elide(inp) == out


# --------------------------------------------- FrenchLightStemmer (UniNE)

FR_VOCAB = [
    ("chevaux", "cheval"), ("cheval", "cheval"), ("hiboux", "hibou"),
    ("chantés", "chant"), ("chanter", "chant"), ("chante", "chant"),
    ("baronnes", "baron"), ("barons", "baron"), ("baron", "baron"),
    ("peaux", "peau"), ("anneaux", "aneau"), ("neveux", "neveu"),
    ("affreux", "afreu"), ("affreuse", "afreu"),
    ("investissement", "investi"), ("investir", "investi"),
    ("assourdissant", "asourdi"), ("assourdir", "asourdi"),
    ("pratiquement", "pratiqu"), ("pratique", "pratiqu"),
    ("administrativement", "administratif"), ("administratif", "administratif"),
    ("justificatrice", "justifi"), ("justificateur", "justifi"),
    ("justifier", "justifi"), ("educatrice", "eduqu"), ("eduquer", "eduqu"),
    ("communicateur", "comuniqu"), ("communiquer", "comuniqu"),
    ("accompagnatrice", "acompagn"), ("accompagnateur", "acompagn"),
    ("administrateur", "administr"), ("administrer", "administr"),
    ("productrice", "product"), ("producteur", "product"),
    ("acheteuse", "achet"), ("acheteur", "achet"),
    ("planteur", "plant"), ("plante", "plant"),
    ("poreuse", "poreu"), ("poreux", "poreu"), ("plieuse", "plieu"),
    ("bijoutière", "bijouti"), ("bijoutier", "bijouti"),
    ("caissière", "caisi"), ("caissier", "caisi"),
    ("abrasive", "abrasif"), ("abrasif", "abrasif"),
    ("folle", "fou"), ("fou", "fou"),
    ("personnelle", "person"), ("personne", "person"),
    ("complète", "complet"), ("complet", "complet"),
    ("aromatique", "aromat"), ("faiblesse", "faibl"), ("faible", "faibl"),
    ("patinage", "patin"), ("patin", "patin"),
    ("sonorisation", "sono"), ("ritualisation", "rituel"),
    ("rituel", "rituel"), ("nomination", "nomin"),
    ("disposition", "dispos"), ("dispose", "dispos"),
    ("1234555", "1234555"), ("12333345", "12333345"), ("1234", "1234"),
    ("abcdeff", "abcdef"), ("abcccddeef", "abcdef"),
    ("créées", "cre"), ("22hh00", "22h00"),
]


@pytest.mark.parametrize("inp,out", FR_VOCAB)
def test_french_light_stem(inp, out):
    assert french_light_stem(inp) == out


def test_french_analyzer_chain():
    a = get_analyzer("french")
    # TestFrenchAnalyzer.java:30-116
    assert _an(a, "") == []
    assert _an(a, "chien chat cheval") == ["chien", "chat", "cheval"]
    assert _an(a, "chien CHAT CHEVAL") == ["chien", "chat", "cheval"]
    assert _an(a, "chien++") == ["chien"]
    assert _an(a, 'mot "entreguillemet"') == ["mot", "entreguilemet"]
    assert _an(a, "Jean-François") == ["jean", "francoi"]
    assert _an(a, "voir l'embrouille") == ["voir", "embrouil"]
    assert _an(a, "Votre") == []       # stopword
    assert "été" not in FRENCH_STOP_WORDS   # homonym intentionally omitted


def test_french_exclusion_table():
    # TestFrenchAnalyzer.testExclusionTableViaCtor
    a = get_analyzer("french", stem_exclusions=frozenset(["habitable"]))
    assert _an(a, "habitable chiste") == ["habitable", "chist"]


def test_query_side_normalize_matches_index_side():
    for kind, word in [("german", "Tische"), ("french", "chevaux")]:
        a = get_analyzer(kind)
        assert a.normalize(word) == _an(a, word)[0]


# ======================================================= Spanish / Italian /
# Portuguese (round 4+): cases transliterated from the reference tests
# (es/TestSpanishAnalyzer.java, TestSpanishLightStemFilter.java,
# it/TestItalianAnalyzer.java, pt/TestPortugueseAnalyzer.java,
# TestPortugueseLightStemFilter.java) — semantics, not code. The stemmers
# are additionally verified against the reference's FULL published
# vocabulary files (es/it/pt *lighttestdata.zip) when present.

from lucene_ray.functions.analysis import (
    ITALIAN_STOP_WORDS,
    PORTUGUESE_STOP_WORDS,
    SPANISH_STOP_WORDS,
)
from lucene_ray.functions.stemming import (
    italian_elide,
    italian_light_stem,
    portuguese_light_stem,
    spanish_light_stem,
)


@pytest.mark.parametrize("inp,out", [
    ("chicana", "chican"), ("chicano", "chican"),   # TestSpanishAnalyzer
    ("casa", "casa"),        # <5 chars untouched
    ("veces", "vez"),        # -ces → -z
    ("ingleses", "ingles"),  # -eses → -es
    ("ramos", "ram"),        # -os plural
    ("canción", "cancion"),  # accent fold, no suffix
    ("", ""),
])
def test_spanish_light_stem(inp, out):
    assert spanish_light_stem(inp) == out


@pytest.mark.parametrize("inp,out", [
    ("abbandonata", "abbandonat"), ("abbandonati", "abbandonat"),
    ("ragazzi", "ragazz"), ("ragazzo", "ragazz"),
    ("vecchie", "vecch"), ("vecchi", "vecc"),   # -ie/-hi double strip
    ("città", "città"),      # <6 chars untouched (accents kept)
    ("corsa", "corsa"),      # <6 chars untouched
    ("numerosa", "numeros"),
    ("", ""),
])
def test_italian_light_stem(inp, out):
    assert italian_light_stem(inp) == out


@pytest.mark.parametrize("inp,out", [
    # TestPortugueseLightStemFilter.testExamples / plurals
    ("doutores", "doutor"), ("doutor", "doutor"),
    ("homens", "homem"), ("homem", "homem"),
    ("papéis", "papel"), ("papel", "papel"),
    ("normais", "normal"), ("normal", "normal"),
    ("lencóis", "lencol"), ("lencol", "lencol"),
    ("barris", "barril"), ("barril", "barril"),
    ("botões", "bota"), ("botão", "bota"),
    ("quilométricas", "quilometric"), ("quilométricos", "quilometric"),
    ("rapidamente", "rapid"),       # -mente
    ("", ""),
])
def test_portuguese_light_stem(inp, out):
    assert portuguese_light_stem(inp) == out


def _vocab_pairs(lang: str):
    """Reference published stemmer vocabularies (the same data
    assertVocabulary uses in the reference tests)."""
    import io
    import zipfile
    from pathlib import Path

    z = Path("/root/reference/lucene/analysis/common/src/test/org/apache/"
             f"lucene/analysis/{lang}/{lang}lighttestdata.zip")
    if not z.exists():
        pytest.skip("reference vocabulary data not available")
    with zipfile.ZipFile(z) as zf:
        data = zf.read(f"{lang}light.txt").decode("utf-8")
    for line in io.StringIO(data):
        parts = line.rstrip("\n").split("\t")
        if len(parts) == 2:
            yield parts[0], parts[1]


@pytest.mark.parametrize("lang,fn", [
    ("es", spanish_light_stem),
    ("it", italian_light_stem),
    ("pt", portuguese_light_stem),
])
def test_light_stem_full_reference_vocabulary(lang, fn):
    mismatches = [(w, exp, fn(w)) for w, exp in _vocab_pairs(lang)
                  if fn(w) != exp]
    assert mismatches == []


@pytest.mark.parametrize("inp,out", [
    ("dell'italia", "italia"),
    ("l'italiano", "italiano"),
    ("un'ora", "ora"),        # "un" is an article
    ("po'", "po'"),           # apostrophe last, prefix not an article → kept
    ("qu'il", "qu'il"),       # french article NOT in the italian set
])
def test_italian_elision(inp, out):
    assert italian_elide(inp) == out


def test_spanish_analyzer_chain():
    a = get_analyzer("spanish")
    assert _an(a, "chicana chicano") == ["chican", "chican"]
    assert _an(a, "los") == []                       # stopword
    assert "porque" in SPANISH_STOP_WORDS


def test_spanish_stem_exclusion():
    # TestSpanishAnalyzer.testExclude: chicano protected, chicana stems
    a = get_analyzer("spanish", stem_exclusions=frozenset(["chicano"]))
    assert _an(a, "chicana chicano") == ["chican", "chicano"]


def test_italian_analyzer_chain():
    a = get_analyzer("italian")
    assert _an(a, "abbandonata abbandonati") == ["abbandonat", "abbandonat"]
    assert _an(a, "dallo") == []                     # stopword
    # TestItalianAnalyzer.testContractions — elision BEFORE stop/stem
    assert _an(a, "dell'Italia") == ["ital"]
    assert _an(a, "l'Italiano") == ["italian"]


def test_portuguese_analyzer_chain():
    a = get_analyzer("portuguese")
    assert _an(a, "quilométricas quilométricos") == ["quilometric",
                                                     "quilometric"]
    assert _an(a, "não") == []                       # stopword
    assert "não" in PORTUGUESE_STOP_WORDS


def test_query_side_normalize_matches_index_side_es_it_pt():
    for kind, word in [("spanish", "chicana"), ("italian", "abbandonata"),
                       ("portuguese", "quilométricas")]:
        a = get_analyzer(kind)
        assert a.normalize(word) == _an(a, word)[0]


# ======================================================= Russian / Swedish /
# Finnish / Hungarian light stemmers (the *LightStemFilter chains; the
# reference's default analyzers for these languages use snowball — the light
# variants are the documented divergence here). Verified against the FULL
# published vocabularies (ru/sv/fi/hu *lighttestdata.zip) when present.

from lucene_ray.functions.stemming import (
    finnish_light_stem,
    hungarian_light_stem,
    russian_light_stem,
    swedish_light_stem,
)


@pytest.mark.parametrize("lang,fn", [
    ("ru", russian_light_stem),
    ("sv", swedish_light_stem),
    ("fi", finnish_light_stem),
    ("hu", hungarian_light_stem),
])
def test_light_stem_full_reference_vocabulary_ru_sv_fi_hu(lang, fn):
    mismatches = [(w, exp, fn(w)) for w, exp in _vocab_pairs(lang)
                  if fn(w) != exp]
    assert mismatches == []


@pytest.mark.parametrize("inp,out", [
    ("книгами", "книг"),     # instrumental plural case suffix
    ("книги", "книг"),
    ("большой", "больш"),
    ("дом", "дом"),
])
def test_russian_light_stem(inp, out):
    assert russian_light_stem(inp) == out


@pytest.mark.parametrize("inp,out", [
    ("jaktkarlarne", "jaktkarl"),
    ("jaktkarlens", "jaktkarl"),
    ("klokhet", "klok"),
    ("klokheten", "klok"),
])
def test_swedish_light_stem(inp, out):
    assert swedish_light_stem(inp) == out


def test_ru_sv_fi_hu_analyzer_chains():
    for kind, word, stopword in [
        ("russian_light", "книгами", "и"),
        ("swedish_light", "klokheten", "och"),
        ("finnish_light", "tärkeimmät", "olla"),
        ("hungarian_light", "babakocsijáért", "hogy"),
    ]:
        a = get_analyzer(kind)
        toks = _an(a, word)
        assert len(toks) == 1 and toks[0] != "" and toks[0] == a.normalize(word)
        assert _an(a, stopword) == []


# ======================================================= Arabic (Larkey-Savoy
# light stemming; cases from ar/TestArabicAnalyzer.java,
# TestArabicStemFilter.java, TestArabicNormalizationFilter.java).

from lucene_ray.functions.analysis import ARABIC_STOP_WORDS
from lucene_ray.functions.stemming import arabic_normalize, arabic_stem


@pytest.mark.parametrize("inp,out", [
    ("الحسن", "حسن"), ("والحسن", "حسن"), ("بالحسن", "حسن"),
    ("كالحسن", "حسن"), ("فالحسن", "حسن"), ("للاخر", "اخر"),
    ("وحسن", "حسن"), ("زوجها", "زوج"), ("ساهدان", "ساهد"),
    ("ساهدات", "ساهد"), ("ساهدون", "ساهد"), ("ساهدين", "ساهد"),
    ("ساهديه", "ساهد"), ("ساهدية", "ساهد"), ("ساهده", "ساهد"),
    ("ساهدة", "ساهد"), ("ساهدي", "ساهد"), ("وساهدون", "ساهد"),
    ("ساهدهات", "ساهد"),
    ("الو", "الو"),          # shouldn't stem (too short after prefix)
    ("English", "English"),  # non-arabic untouched
])
def test_arabic_stem(inp, out):
    assert arabic_stem(inp) == out


@pytest.mark.parametrize("inp,out", [
    ("آجن", "اجن"), ("أحمد", "احمد"), ("إعاذ", "اعاذ"), ("بنى", "بني"),
    ("فاطمة", "فاطمه"), ("روبرـــــت", "روبرت"), ("مَبنا", "مبنا"),
    ("علِي", "علي"), ("بُوات", "بوات"), ("ولداً", "ولدا"), ("ولدٍ", "ولد"),
    ("ولدٌ", "ولد"), ("نلْسون", "نلسون"), ("هتميّ", "هتمي"),
])
def test_arabic_normalize(inp, out):
    assert arabic_normalize(inp) == out


def test_arabic_analyzer_chain():
    a = get_analyzer("arabic")
    # TestArabicAnalyzer.testBasicFeatures
    assert _an(a, "كبير") == ["كبير"]
    assert _an(a, "كبيرة") == ["كبير"]           # feminine marker
    assert _an(a, "مشروب") == ["مشروب"]
    assert _an(a, "مشروبات") == ["مشروب"]        # plural -at
    assert _an(a, "أمريكيين") == ["امريك"]       # plural -in
    assert _an(a, "امريكي") == ["امريك"]         # singular with bare alif
    assert _an(a, "كتاب") == ["كتاب"]
    assert _an(a, "الكتاب") == ["كتاب"]          # definite article
    assert _an(a, "ما ملكت أيمانكم") == ["ملكت", "ايمانكم"]
    assert _an(a, "الذين ملكت أيمانكم") == ["ملكت", "ايمانكم"]  # stopwords
    # english mixed in passes through lowercased (no Porter here)
    assert _an(a, "English text.") == ["english", "text"]
    assert "من" in ARABIC_STOP_WORDS
    # DecimalDigitFilter: arabic-indic digits fold
    assert _an(a, "١٢٣٤") == ["1234"]


def test_arabic_stem_exclusion():
    # TestArabicAnalyzer.testWithStemExclusionSet: ساهدهات protected
    a = get_analyzer("arabic", stem_exclusions=frozenset(["ساهدهات"]))
    assert _an(a, "كبيرة the quick ساهدهات") == ["كبير", "the", "quick",
                                                 "ساهدهات"]
    b = get_analyzer("arabic")
    assert _an(b, "كبيرة the quick ساهدهات") == ["كبير", "the", "quick",
                                                 "ساهد"]


# ======================================================= Persian + Sorani
# (fa/TestPersianAnalyzer.java, ckb/TestSoraniAnalyzer.java,
# TestSoraniStemFilter.java; the Sorani normalize+stem pair is verified
# against the full published ckbtestdata vocabulary).

from lucene_ray.functions.stemming import (
    persian_normalize,
    sorani_normalize,
    sorani_stem,
)


def test_persian_analyzer_chain():
    a = get_analyzer("persian")
    # verbs: the ZWNJ char filter splits می‌خورد into two tokens, می is a
    # stopword (TestPersianAnalyzer.testBehaviorVerbs)
    assert _an(a, "می‌خورد") == ["خورد"]
    assert _an(a, "خورد") == ["خورد"]
    assert _an(a, "خواهد خورد") == ["خورد"]
    assert _an(a, "دارد می‌خورد") == ["خورد"]
    assert _an(a, "خورده‌است") == ["خورده"]
    assert _an(a, "می‌خورده‌است") == ["خورده"]
    assert _an(a, "خورده بود") == ["خورده"]
    # farsi yeh normalizes to arabic yeh so query meets index
    assert a.normalize("می") == a.normalize("مي")


def test_sorani_full_vocabulary():
    mismatches = []
    import zipfile
    from pathlib import Path

    z = Path("/root/reference/lucene/analysis/common/src/test/org/apache/"
             "lucene/analysis/ckb/ckbtestdata.zip")
    if not z.exists():
        pytest.skip("reference vocabulary data not available")
    with zipfile.ZipFile(z) as zf:
        data = zf.read("testdata.txt").decode("utf-8")
    for line in data.splitlines():
        parts = line.split("\t")
        if len(parts) != 2:
            continue
        got = sorani_stem(sorani_normalize(parts[0].lower()))
        if got != parts[1]:
            mismatches.append((parts[0], parts[1], got))
    assert mismatches == []


def test_sorani_analyzer_chain():
    a = get_analyzer("sorani")
    assert _an(a, "ئەم پیاوە") == ["پیاو"]      # stopword + demonstrative -a
    assert _an(a, "پیاوە") == ["پیاو"]
    assert _an(a, "پیاو") == ["پیاو"]
    assert _an(a, "١٢٣٤") == ["1234"]           # DecimalDigitFilter
    # stem exclusion protects from stemming
    b = get_analyzer("sorani", stem_exclusions=frozenset(["پیاوە"]))
    assert _an(b, "پیاوە") == ["پیاوە"]


def test_sorani_normalizer_rules():
    # TestSoraniNormalizationFilter basics
    assert sorani_normalize("يي") == "یی"      # yeh forms
    assert sorani_normalize("ك") == "ک"        # kaf → keheh
    assert sorani_normalize("ه‌") == "ە"        # heh+ZWNJ → ae
    assert sorani_normalize("ة") == "ە"        # teh marbuta → ae
    assert sorani_normalize("ره") == "ڕە"      # initial reh→rreh, final heh→ae
    assert sorani_normalize("هـ") == "ه"        # tatweel-exposed heh stays heh


def test_persian_folded_vocab_reinterned():
    # regression: arabic kaf and farsi keheh fold to ONE term — the vocab
    # must re-intern or the segment term table gets duplicate entries with
    # split postings
    a = get_analyzer("persian")
    codes, vocab, doc_idx, positions, dl = a.tokenize_batch_encoded(
        ["كتاب", "کتاب"])
    assert len(vocab) == 1
    assert sorted(doc_idx.tolist()) == [0, 1]


def test_decimal_digit_folded_vocab_reinterned():
    a = get_analyzer("simple", decimal_digit=True)
    codes, vocab, doc_idx, positions, dl = a.tokenize_batch_encoded(
        ["123", "١٢٣"])
    assert len(vocab) == 1 and vocab[0] == "123"


def test_sorani_heh_doachashmee_final():
    # U+06BE has its OWN normalizer branch (→ plain heh), so the final
    # heh→ae rule must not apply to it
    assert sorani_normalize("ئھ") == "ئه"
    # but heh+ZWNJ where heh came from doachashmee → ae (sequential rule)
    assert sorani_normalize("ھ‌x") == "ەx"


# ======================================================= Hindi
# (hi/TestHindiAnalyzer.java, TestHindiNormalizer.java,
# TestHindiStemmer.java; IndicNormalizer ported for the Devanagari rules —
# exact for the Hindi chain).

from lucene_ray.functions.stemming import (
    hindi_normalize,
    hindi_stem,
    indic_normalize,
)


@pytest.mark.parametrize("inp,out", [
    ("अँगरेज़ी", "अंगरेजि"), ("अँग्रेज़ी", "अंगरेजि"), ("अंग्रेजी", "अंगरेजि"),
    ("क़िताब", "किताब"), ("फ़र्ज़", "फरज"), ("क़र्ज़", "करज"),
    ("ऱऴख़ग़ड़ढ़य़", "रळखगडढय"),
    ("शार्‍मा", "शारमा"), ("शार्‌मा", "शारमा"),     # ZWJ / ZWNJ
    ("ॅॆॉॊऍऎऑऒॲ", "ेेोोएएओओअ"),
    ("आईऊॠॡऐऔीूॄॣैौ", "अइउऋऌएओिुृॢेो"),
])
def test_hindi_normalize(inp, out):
    assert hindi_normalize(inp) == out


@pytest.mark.parametrize("inp,out", [
    ("लडका", "लडक"), ("लडके", "लडक"), ("लडकों", "लडक"),         # masc noun
    ("गुरु", "गुर"), ("गुरुओं", "गुर"),
    ("दोस्त", "दोस्त"), ("दोस्तों", "दोस्त"),
    ("लडकी", "लडक"), ("लडकियों", "लडक"),                         # fem noun
    ("किताब", "किताब"), ("किताबें", "किताब"), ("किताबों", "किताब"),
    ("खाना", "खा"), ("खाता", "खा"), ("खाती", "खा"), ("खा", "खा"),  # verb
    ("कठिनाइयां", "कठिन"), ("कठिन", "कठिन"),
])
def test_hindi_stem(inp, out):
    assert hindi_stem(inp) == out


def test_hindi_analyzer_chain():
    a = get_analyzer("hindi")
    # TestHindiAnalyzer: the dead-n rule folds हिन्दी and हिंदी together
    assert _an(a, "हिन्दी") == ["हिंद"]
    assert _an(a, "हिंदी") == ["हिंद"]
    assert _an(a, "१२३४") == ["1234"]           # DecimalDigitFilter
    # stem exclusion set protects BEFORE normalization (marker order)
    b = get_analyzer("hindi", stem_exclusions=frozenset(["हिंदी"]))
    assert _an(b, "हिंदी") == ["हिंदी"]


def test_indic_normalize_devanagari_compose():
    # vowel sign decompositions: ा + ै-pieces compose (0x3E 0x47 → 0x4B)
    assert indic_normalize("काे") == "को"
    # letter A + AA sign → letter AA (0x05 0x3E → 0x06)
    assert indic_normalize("अा") == "आ"


# ======================================================= Bulgarian +
# Indonesian (bg/TestBulgarianStemmer.java, id/TestIndonesianStemmer.java).

from lucene_ray.functions.stemming import bulgarian_stem, indonesian_stem


@pytest.mark.parametrize("inp,out", [
    ("град", "град"), ("града", "град"), ("градът", "град"),
    ("градове", "град"), ("градовете", "град"),
    ("народ", "народ"), ("народа", "народ"), ("народът", "народ"),
    ("народи", "народ"), ("народите", "народ"), ("народе", "народ"),
    ("пътя", "път"), ("пътят", "път"), ("пътища", "път"), ("пътищата", "път"),
    ("градовце", "градовц"), ("градовцете", "градовц"),
    ("дядо", "дяд"), ("дядовци", "дяд"), ("дядовците", "дяд"),
    ("мъжете", "мъж"), ("мъжът", "мъжът"),   # word too short for -ът strip
    ("краката", "крак"), ("братята", "брат"),
    ("вестта", "вест"), ("дървета", "дърв"),
])
def test_bulgarian_stem(inp, out):
    assert bulgarian_stem(inp) == out


@pytest.mark.parametrize("inp,out", [
    # inflectional
    ("bukukah", "buku"), ("adalah", "ada"), ("bukupun", "buku"),
    ("bukuku", "buku"), ("bukumu", "buku"), ("bukunya", "buku"),
    # derivational prefixes
    ("mengukur", "ukur"), ("menyapu", "sapu"), ("menduga", "duga"),
    ("menuduh", "uduh"), ("membaca", "baca"), ("merusak", "rusak"),
    ("pengukur", "ukur"), ("penyapu", "sapu"), ("penduga", "duga"),
    ("pembaca", "baca"), ("diukur", "ukur"), ("tersapu", "sapu"),
    ("kekasih", "kasih"), ("berlari", "lari"), ("belajar", "ajar"),
    ("bekerja", "kerja"), ("perjelas", "jelas"), ("pelajar", "ajar"),
    ("pekerja", "kerja"),
    # derivational suffixes + both
    ("tarikkan", "tarik"), ("ambilkan", "ambil"), ("mengambilkan", "ambil"),
    ("makanan", "makan"), ("janjian", "janji"), ("perjanjian", "janji"),
    ("tandai", "tanda"), ("dapati", "dapat"), ("mendapati", "dapat"),
    ("pantai", "panta"),
    # the reference's IR-collection examples
    ("penyalahgunaan", "salahguna"), ("menyalahgunakan", "salahguna"),
    ("disalahgunakan", "salahguna"),
    ("pertanggungjawaban", "tanggungjawab"),
    ("mempertanggungjawabkan", "tanggungjawab"),
    ("dipertanggungjawabkan", "tanggungjawab"),
    ("pelaksanaan", "laksana"), ("pelaksana", "laksana"),
    ("melaksanakan", "laksana"), ("dilaksanakan", "laksana"),
    ("melibatkan", "libat"), ("terlibat", "libat"),
    ("penculikan", "culik"), ("menculik", "culik"), ("diculik", "culik"),
])
def test_indonesian_stem(inp, out):
    assert indonesian_stem(inp) == out


def test_bulgarian_indonesian_analyzer_chains():
    a = get_analyzer("bulgarian")
    assert _an(a, "градовете") == ["град"]
    assert _an(a, "и") == []                  # stopword
    b = get_analyzer("indonesian")
    assert _an(b, "mengambilkan buku") == ["ambil", "buku"]
    assert _an(b, "yang") == []               # stopword
    for kind, word in [("bulgarian", "градовете"), ("indonesian", "mengukur")]:
        an = get_analyzer(kind)
        assert an.normalize(word) == _an(an, word)[0]


# ======================================================= Czech + Norwegian
# (cz/TestCzechStemmer.java; no/nb_light.txt + nn_light.txt — the FULL
# published Bokmål/Nynorsk vocabularies).

from lucene_ray.functions.stemming import czech_stem, norwegian_light_stem


@pytest.mark.parametrize("inp,out", [
    ("pán", "pán"), ("páni", "pán"), ("pánové", "pán"), ("pánů", "pán"),
    ("pánovi", "pán"), ("pánech", "pán"), ("pánem", "pán"),
    ("hradům", "hrad"), ("hrady", "hrad"),
    ("muž", "muh"), ("muži", "muh"), ("mužích", "muh"),   # ž → h normalize
    ("stroj", "stroj"), ("strojích", "stroj"),
    ("předseda", "předsd"), ("předsedové", "předsd"),     # e* elision
])
def test_czech_stem(inp, out):
    assert czech_stem(inp) == out


@pytest.mark.parametrize("lang,kw", [
    ("nb", dict(bokmaal=True, nynorsk=False)),
    ("nn", dict(bokmaal=False, nynorsk=True)),
])
def test_norwegian_light_full_vocabulary(lang, kw):
    from pathlib import Path

    p = Path("/root/reference/lucene/analysis/common/src/test/org/apache/"
             f"lucene/analysis/no/{lang}_light.txt")
    if not p.exists():
        pytest.skip("reference vocabulary data not available")
    mismatches = []
    for line in p.read_text(encoding="utf-8").splitlines():
        parts = line.split("\t")
        if len(parts) != 2:
            continue
        got = norwegian_light_stem(parts[0], **kw)
        if got != parts[1]:
            mismatches.append((parts[0], parts[1], got))
    assert mismatches == []


def test_czech_norwegian_analyzer_chains():
    a = get_analyzer("czech")
    assert _an(a, "pánové hradům") == ["pán", "hrad"]
    assert _an(a, "je") == []                 # stopword
    b = get_analyzer("norwegian_light")
    assert _an(b, "hemmeligheten") == ["hemmelig"]
    assert _an(b, "og") == []                 # stopword
    for kind, word in [("czech", "pánové"), ("norwegian_light", "husene")]:
        an = get_analyzer(kind)
        assert an.normalize(word) == _an(an, word)[0]


# ======================================================= Latvian + Bengali
# (lv/TestLatvianStemmer.java — ALL its checkOneTerm cases are verified
# programmatically; bn/TestBengaliNormalizer.java, TestBengaliStemmer.java).

from lucene_ray.functions.stemming import (
    bengali_normalize,
    bengali_stem,
    latvian_stem,
)


def _java_cases(path, fn_name="checkOneTerm\\(a, "):
    import re
    from pathlib import Path

    p = Path("/root/reference/lucene/analysis/common/src/test/org/apache/"
             "lucene/analysis") / path
    if not p.exists():
        pytest.skip("reference test source not available")
    src = p.read_text(encoding="utf-8")
    return [(a.strip(), b) for a, b in
            re.findall(fn_name + r'"([^"]+)", "([^"]+)"\)', src)]


def test_latvian_stem_all_reference_cases():
    cases = _java_cases("lv/TestLatvianStemmer.java")
    assert len(cases) > 150
    mismatches = [(i, e, latvian_stem(i)) for i, e in cases
                  if latvian_stem(i) != e]
    assert mismatches == []


def test_bengali_normalize_all_reference_cases():
    cases = _java_cases("bn/TestBengaliNormalizer.java", r"check\(")
    assert len(cases) >= 15
    mismatches = [(i, e, bengali_normalize(i)) for i, e in cases
                  if bengali_normalize(i) != e]
    assert mismatches == []


def test_bengali_stem_all_reference_cases():
    cases = _java_cases("bn/TestBengaliStemmer.java", r"check\(")
    assert len(cases) >= 15
    mismatches = [(i, e, bengali_stem(i)) for i, e in cases
                  if bengali_stem(i) != e]
    assert mismatches == []


def test_latvian_bengali_analyzer_chains():
    a = get_analyzer("latvian")
    assert _an(a, "tirgiem tirgus") == ["tirg", "tirg"]
    assert _an(a, "un") == []                 # stopword
    b = get_analyzer("bengali")
    # TestBengaliAnalyzer basics
    assert _an(b, "বাড়ী") == ["বার"]
    assert _an(b, "এই") == []                 # stopword
    for kind, word in [("latvian", "tirgiem"), ("bengali", "বাড়ী")]:
        an = get_analyzer(kind)
        assert an.normalize(word) == _an(an, word)[0]


# ------------------------------------------- round-2 review regressions


def test_indic_normalize_letter_a_matra_rows():
    # the six letter-A + matra rows (0x05+0x45/46/49/4A/4B/4C) compose
    for inp, exp in [("अॅ", "ॲ"), ("अॆ", "ऄ"), ("अो", "ओ"),
                     ("अॉ", "ऑ"), ("अौ", "औ"), ("अॊ", "ऒ")]:
        assert indic_normalize(inp) == exp


def test_hindi_exclusion_still_gets_indic_normalization():
    # IndicNormalizationFilter has no keyword check in the reference — an
    # excluded term skips only HindiNormalizer + stemmer
    dec = "क़िताब"        # ka + nukta (decomposed) ...
    comp = indic_normalize(dec)
    assert comp != dec     # ... composes to the precomposed qa
    a = get_analyzer("hindi", stem_exclusions=frozenset([dec]))
    assert _an(a, dec) == [comp]


def test_hebrew_niqqud_with_gershayim_one_token():
    a = get_analyzer("standard")
    # acronym with a vowel point before the gershayim stays ONE token (WB4)
    assert _an(a, "מִ״ם") == ["מִ״ם"]
    # final geresh after a pointed letter kept
    assert _an(a, "צִ'") == ["צִ'"]


def test_digits_extend_with_marks():
    a = get_analyzer("standard")
    assert _an(a, "1́2") == ["1́2"]


# ======================================================= Greek
# (el/TestGreekStemmer.java — ALL 342 checkOneTerm cases verified
# programmatically through the GreekLowerCase + stem pair).

from lucene_ray.functions.stemming import greek_lowercase, greek_stem


def test_greek_stem_all_reference_cases():
    cases = _java_cases("el/TestGreekStemmer.java")
    assert len(cases) > 300
    fn = lambda w: greek_stem(greek_lowercase(w))  # noqa: E731
    mismatches = [(i, e, fn(i)) for i, e in cases if fn(i) != e]
    assert mismatches == []


def test_greek_lowercase():
    # final sigma folds, tonos/dialytika strip (TestGreekAnalyzer cases)
    assert greek_lowercase("ΜΊΑ") == "μια"
    assert greek_lowercase("ΠΡΟΫΠΟΘΈΣΕΙΣ") == "προυποθεσεισ"
    assert greek_lowercase("άνθρωπος") == "ανθρωποσ"


def test_greek_analyzer_chain():
    a = get_analyzer("greek")
    assert _an(a, "άνθρωπος ανθρώπου") == ["ανθρωπ", "ανθρωπ"]
    assert _an(a, "και") == []               # stopword (folded list)
    assert a.normalize("άνθρωπος") == _an(a, "άνθρωπος")[0]


# ======================================================= minimal stemmers
# (de/fr *minimaltestdata.zip — FULL published vocabularies — and
# en/TestEnglishMinimalStemFilter.java).

from lucene_ray.functions.stemming import (
    english_minimal_stem,
    french_minimal_stem,
    german_minimal_stem,
)


@pytest.mark.parametrize("lang,fn", [
    ("de", german_minimal_stem), ("fr", french_minimal_stem),
])
def test_minimal_stem_full_reference_vocabulary(lang, fn):
    import zipfile
    from pathlib import Path

    z = Path("/root/reference/lucene/analysis/common/src/test/org/apache/"
             f"lucene/analysis/{lang}/{lang}minimaltestdata.zip")
    if not z.exists():
        pytest.skip("reference vocabulary data not available")
    with zipfile.ZipFile(z) as zf:
        data = zf.read(zf.namelist()[0]).decode("utf-8")
    mismatches = []
    for line in data.splitlines():
        parts = line.split("\t")
        if len(parts) == 2 and fn(parts[0]) != parts[1]:
            mismatches.append((parts[0], parts[1], fn(parts[0])))
    assert mismatches == []


@pytest.mark.parametrize("inp,out", [
    # TestEnglishMinimalStemFilter (Harman S-stemmer)
    ("queries", "query"), ("phrases", "phrase"), ("corpus", "corpus"),
    ("stress", "stress"), ("kings", "king"), ("panels", "panel"),
    ("aerodynamics", "aerodynamic"), ("congress", "congress"),
    ("serious", "serious"),
])
def test_english_minimal_stem(inp, out):
    assert english_minimal_stem(inp) == out


def test_minimal_analyzer_chains():
    for kind, word, expect in [
        ("german_minimal", "Planeten", "planet"),
        ("french_minimal", "chevaux", "cheval"),
        ("english_minimal", "queries", "query"),
    ]:
        a = get_analyzer(kind)
        assert _an(a, word) == [expect]
        assert a.normalize(word) == expect

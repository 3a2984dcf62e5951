"""Snowball (tartarus) stemmer validation — each stemmer is checked against
the reference's FULL published vocabulary zip (analysis/common/src/test/org/
apache/lucene/analysis/snowball/{russian,swedish,finnish,hungarian,english}
.zip — 2000 word/stem pairs each, the same data TestSnowballVocab drives),
plus analyzer-chain goldens for the snowball-default language kinds."""

import zipfile
from pathlib import Path

import pytest

from lucene_ray.functions.analysis import get_analyzer
from lucene_ray.functions.snowball import (
    english_snowball_stem,
    finnish_snowball_stem,
    hungarian_snowball_stem,
    russian_snowball_stem,
    swedish_snowball_stem,
)

_ZIP_DIR = Path("/root/reference/lucene/analysis/common/src/test/org/apache/"
                "lucene/analysis/snowball")

_STEMMERS = {
    "russian": russian_snowball_stem,
    "swedish": swedish_snowball_stem,
    "finnish": finnish_snowball_stem,
    "hungarian": hungarian_snowball_stem,
    "english": english_snowball_stem,
}


@pytest.mark.parametrize("lang", sorted(_STEMMERS))
def test_snowball_published_vocabulary(lang):
    z = _ZIP_DIR / f"{lang}.zip"
    if not z.exists():
        pytest.skip("reference vocabulary zip not available")
    fn = _STEMMERS[lang]
    with zipfile.ZipFile(z) as zf:
        names = zf.namelist()
        voc = zf.read([n for n in names if "voc" in n][0]).decode().split()
        out = zf.read([n for n in names if "output" in n][0]).decode().split()
    assert len(voc) == len(out) and len(voc) >= 1000
    bad = [(w, e, fn(w)) for w, e in zip(voc, out) if fn(w) != e]
    assert bad == []


# ------------------------------------------------- spot goldens (stability
# even without the reference zips on disk)

@pytest.mark.parametrize("fn,inp,out", [
    (russian_snowball_stem, "вместе", "вмест"),
    (russian_snowball_stem, "вместимость", "вместим"),
    (swedish_snowball_stem, "jaktkarlarne", "jaktkarl"),
    (swedish_snowball_stem, "klokhet", "klok"),
    (finnish_snowball_stem, "ehtyminen", "ehtymin"),
    (finnish_snowball_stem, "huippukallista", "huippukal"),
    (hungarian_snowball_stem, "aktivitás", "aktivitás"),
    (hungarian_snowball_stem, "börzéhez", "börz"),
    (english_snowball_stem, "consignment", "consign"),
    (english_snowball_stem, "communicating", "communic"),
    (english_snowball_stem, "generally", "general"),
    (english_snowball_stem, "dying", "die"),
])
def test_snowball_goldens(fn, inp, out):
    assert fn(inp) == out


def _an(a, text):
    return [t for t, _ in a.tokenize_one(text)]


def test_snowball_analyzer_chains():
    # The reference DEFAULT analyzers stem with snowball: check the full
    # chain (StandardTokenizer → LowerCase → Stop(snowball list) → stem).
    ru = get_analyzer("russian")
    # TestRussianAnalyzer-style: stopword "и" dropped, snowball stems
    assert _an(ru, "Вместе с тем о силе электромагнитной") == [
        "вмест", "сил", "электромагнитн"]
    sv = get_analyzer("swedish")
    assert _an(sv, "jaktkarlarne") == ["jaktkarl"]
    fi = get_analyzer("finnish")
    assert _an(fi, "ehtyminen ja huippukallista") == ["ehtymin", "huippukal"]
    hu = get_analyzer("hungarian")
    assert _an(hu, "aktivitás börzéhez") == ["aktivitás", "börz"]
    en = get_analyzer("english_snowball")
    assert _an(en, "the consignment was generally flourishing") == [
        "consign", "general", "flourish"]


def test_snowball_vs_light_kinds_coexist():
    # the *_light variants stay available and differ where documented
    light = get_analyzer("russian_light")
    snow = get_analyzer("russian")
    assert _an(light, "вместимость") != [] and _an(snow, "вместимость") != []


def test_porter2_exception_list_2():
    """english.sbl exception2: eight words stop unchanged after step 1a
    (classic Porter would stem them — the 2000-pair vocab misses these)."""
    from lucene_ray.functions.snowball import english_snowball_stem

    for w in ("proceed", "exceed", "succeed", "inning", "outing",
              "canning", "herring", "earring"):
        assert english_snowball_stem(w) == w

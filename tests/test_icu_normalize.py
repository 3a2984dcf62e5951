"""ICU NFKC_Casefold normalization — goldens from the reference's
TestICUNormalizer2Filter.testDefaults (analysis/icu/src/test/.../
TestICUNormalizer2Filter.java:50-68), all expressible in pure Unicode
data."""

import pytest

from lucene_ray.functions.analysis import get_analyzer
from lucene_ray.functions.icu import icu_normalize


@pytest.mark.parametrize("inp,out", [
    ("This", "this"),                 # case folding
    ("Ruß", "russ"),                  # ß full case fold
    ("ΜΆΪΟΣ", "μάϊοσ"),               # greek fold (no final sigma)
    ("Μάϊος", "μάϊοσ"),
    ("𐐖", "𐐾"),                      # supplementary case folding
    ("ﴳﴺﰧ", "طمطمطم"),                # NFKC of Arabic presentation forms
    ("क्‍ष", "क्ष"),             # removal of default ignorables (ZWJ)
    ("a­b", "ab"),               # soft hyphen (Cf) removed
    ("", ""),
    ("ascii", "ascii"),
])
def test_icu_normalize_goldens(inp, out):
    assert icu_normalize(inp) == out


def test_pcm_not_removed():
    # Arabic number sign is Cf but Prepended_Concatenation_Mark — kept
    assert "؀" in icu_normalize("؀1")


def test_variation_selector_removed():
    assert icu_normalize("契︀") == icu_normalize("契")


def test_analyzer_chain_whitespace():
    # the reference test chain: MockTokenizer(WHITESPACE) + filter
    a = get_analyzer({"kind": "whitespace", "icu_normalize": True})
    toks = [t for t, _ in a.tokenize_one("This is a Test Ruß ΜΆΪΟΣ")]
    assert toks == ["this", "is", "a", "test", "russ", "μάϊοσ"]
    assert a.normalize("Ruß") == "russ"


def test_folding_merges_vocab(tmp_path, ray_session):
    import pyarrow as pa
    import pyarrow.parquet as pq

    from lucene_ray.pipelines.index_pipeline import build_index_by_file
    from lucene_ray.query import TermQuery
    from lucene_ray.searcher import IndexSearcher

    src = str(tmp_path / "icu.parquet")
    pq.write_table(pa.table({
        "url": ["a", "b"],
        "text": ["Ruß factory", "russ output"]}), src)
    idx = str(tmp_path / "icui")
    build_index_by_file(src, idx, key_col="url", text_col="text",
                        analyzer={"kind": "standard",
                                  "icu_normalize": True})
    s = IndexSearcher(idx)
    an = get_analyzer({"kind": "standard", "icu_normalize": True})
    assert s.count(TermQuery(an.normalize("Ruß"))) == 2

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


# --------------------------------------------------- collation sort keys

def test_collation_key_accent_order():
    """ICUCollationKeyAnalyzer analogue: byte order of keys == UCA root
    collation order. The classic accent-ordering chain: cote < coté <
    côte < côté (secondary level; acute U+0301 < circumflex U+0302)."""
    from lucene_ray.functions.icu import collation_key

    ws = ["côté", "cote", "côte", "coté"]
    assert sorted(ws, key=lambda w: collation_key(w, "secondary")) == [
        "cote", "coté", "côte", "côté"]
    # plain byte order gets case-mixed input wrong ('C' < 'c' puts Côte
    # first); the keys interleave correctly
    mixed = ["cote", "Côte", "côte"]
    assert sorted(mixed) == ["Côte", "cote", "côte"]  # byte order: wrong
    assert sorted(mixed, key=lambda w: collation_key(w, "tertiary")) == [
        "cote", "côte", "Côte"]


def test_collation_key_strengths():
    from lucene_ray.functions.icu import collation_key

    # primary: case and accents ignored
    assert collation_key("Résumé", "primary") == collation_key(
        "resume", "primary")
    # secondary: accents differ, case still ignored
    assert collation_key("Résumé", "secondary") == collation_key(
        "résumé", "secondary")
    assert collation_key("résumé", "secondary") != collation_key(
        "resume", "secondary")
    # tertiary: lowercase sorts before uppercase (UCA default)
    assert collation_key("cote") < collation_key("Cote")
    import pytest
    with pytest.raises(ValueError):
        collation_key("x", "quaternary")


def test_collation_keys_batch_and_sort_field(tmp_path, ray_session):
    """The analyzer's intended use: precompute keys via map_batches, sort
    the index by the key column — locale-ish order with byte comparisons
    only (ICUCollationKeyAnalyzer.java's design)."""
    import pyarrow as pa
    import ray

    from lucene_ray.functions.icu import collation_keys_batch

    rows = [{"doc_id": d, "title": t} for d, t in
            [("a", "côté"), ("b", "cote"), ("c", "Cote"), ("d", "coté")]]

    def add_key(batch: pa.Table) -> pa.Table:
        keys = collation_keys_batch(batch.column("title").to_pylist())
        return batch.append_column("title_key",
                                   pa.array(keys, type=pa.string()))

    out = (ray.data.from_items(rows)
           .map_batches(add_key, batch_format="pyarrow")
           .to_pandas().sort_values("title_key"))
    assert list(out["title"]) == ["cote", "Cote", "coté", "côté"]


def test_collation_key_positional_secondary():
    """The same accent on DIFFERENT letters must produce different keys
    (UCA secondary weights are a positional sequence): coté < cóte."""
    from lucene_ray.functions.icu import collation_key

    assert collation_key("cóte") != collation_key("coté")
    assert collation_key("coté", "secondary") < collation_key(
        "cóte", "secondary")


def test_cf_exclusions_kept():
    """U+FFF9-FFFB interlinear controls and Egyptian-hieroglyph format
    controls are Cf but NOT Default_Ignorable — nfkc_cf keeps them."""
    assert icu_normalize("a￹b￻c") == "a￹b￻c"
    assert icu_normalize("a\U00013430b") == "a\U00013430b"

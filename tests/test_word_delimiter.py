"""WordDelimiterGraphFilter goldens — cases transliterated from the
reference tests (analysis/common/src/test/.../miscellaneous/
TestWordDelimiterGraphFilter.java) — semantics, not code."""

import pytest

from lucene_ray.functions.analysis import get_analyzer
from lucene_ray.functions.worddelimiter import (
    CATENATE_ALL,
    CATENATE_NUMBERS,
    CATENATE_WORDS,
    DEFAULT_FLAGS,
    GENERATE_NUMBER_PARTS,
    GENERATE_WORD_PARTS,
    PRESERVE_ORIGINAL,
    SPLIT_ON_CASE_CHANGE,
    SPLIT_ON_NUMERICS,
    STEM_ENGLISH_POSSESSIVE,
    word_delimiter_stream,
)

SPLIT_FLAGS = (GENERATE_WORD_PARTS | GENERATE_NUMBER_PARTS
               | SPLIT_ON_CASE_CHANGE | SPLIT_ON_NUMERICS
               | STEM_ENGLISH_POSSESSIVE)


def _terms(tokens, flags=SPLIT_FLAGS, prot=frozenset()):
    return [t for t, _, _ in word_delimiter_stream(tokens, flags, prot)]


# TestWordDelimiterGraphFilter.testSplits (doSplit cases)
@pytest.mark.parametrize("inp,out", [
    ("basic-split", ["basic", "split"]),
    ("camelCase", ["camel", "Case"]),
    ("บ้าน", ["บ้าน"]),  # Thai NSM
    ("test's'", ["test"]),               # possessive then delimiter
    ("Роберт", ["Роберт"]),
    ("РобЕрт", ["Роб", "Ерт"]),          # russian camelCase
    ("aǅungla", ["aǅungla"]),            # titlecase char: no split
    ("ســـــــــــــــــلام", ["ســـــــــــــــــلام"]),  # modifier letters
    ("test⃝", ["test⃝"]),                # enclosing mark
    ("हिन्दी", ["हिन्दी"]),                 # virama (combining spacing mark)
    ("١٢٣٤", ["١٢٣٤"]),                  # non-ascii digits
    ("𠀀𠀀", ["𠀀𠀀"]),                    # supplementary plane
    ("SD500", ["SD", "500"]),
    ("PowerShot", ["Power", "Shot"]),
    ("//hello---there", ["hello", "there"]),
])
def test_splits(inp, out):
    assert _terms([inp]) == out


def test_possessives():
    base = (GENERATE_WORD_PARTS | GENERATE_NUMBER_PARTS
            | SPLIT_ON_CASE_CHANGE | SPLIT_ON_NUMERICS)
    assert _terms(["ra's"], base | STEM_ENGLISH_POSSESSIVE) == ["ra"]
    assert _terms(["ra's"], base) == ["ra", "s"]


def test_position_increments_preserve_original():
    # testPositionIncrements a4: "SAL_S8371 - SAL"
    flags = (SPLIT_ON_NUMERICS | GENERATE_WORD_PARTS | PRESERVE_ORIGINAL
             | GENERATE_NUMBER_PARTS | SPLIT_ON_CASE_CHANGE)
    s = word_delimiter_stream(["SAL_S8371", "-", "SAL"], flags)
    assert [t for t, _, _ in s] == ["SAL_S8371", "SAL", "S", "8371", "-", "SAL"]
    assert [p for _, p, _ in s] == [1, 0, 1, 1, 1, 1]
    # preserved original spans the three parts
    assert s[0][2] == 3


def test_swallowed_delimiter_token_leaves_hole():
    flags = (SPLIT_ON_NUMERICS | GENERATE_WORD_PARTS | GENERATE_NUMBER_PARTS
             | SPLIT_ON_CASE_CHANGE)
    s = word_delimiter_stream(["LUCENE", "/", "SOLR"], flags)
    assert [(t, p) for t, p, _ in s] == [("LUCENE", 1), ("SOLR", 2)]


def test_original_token_emitted_first():
    # testOriginalTokenEmittedFirst
    flags = (PRESERVE_ORIGINAL | GENERATE_WORD_PARTS | GENERATE_NUMBER_PARTS
             | CATENATE_WORDS | CATENATE_NUMBERS | CATENATE_ALL
             | SPLIT_ON_CASE_CHANGE | SPLIT_ON_NUMERICS
             | STEM_ENGLISH_POSSESSIVE)
    assert _terms(["abc-def", "abcDEF", "abc123"], flags) == [
        "abc-def", "abcdef", "abc", "def",
        "abcDEF", "abcDEF", "abc", "DEF",
        "abc123", "abc123", "abc", "123"]


def test_catenate_all_foo_bar():
    # testTokenType: foo-bar → foobar, foo, bar
    flags = (GENERATE_WORD_PARTS | GENERATE_NUMBER_PARTS | CATENATE_ALL
             | SPLIT_ON_CASE_CHANGE | SPLIT_ON_NUMERICS
             | STEM_ENGLISH_POSSESSIVE)
    assert _terms(["foo-bar"], flags) == ["foobar", "foo", "bar"]


def test_protected_words():
    flags = (GENERATE_WORD_PARTS | GENERATE_NUMBER_PARTS | CATENATE_ALL
             | SPLIT_ON_CASE_CHANGE | SPLIT_ON_NUMERICS
             | STEM_ENGLISH_POSSESSIVE)
    assert _terms(["LUCENE", "NUTCH", "SOLR"], flags,
                  frozenset(["NUTCH"])) == ["LUCENE", "NUTCH", "SOLR"]


def test_generate_word_parts_only():
    assert _terms(["abc-def", "klm-nop", "kpop"],
                  GENERATE_WORD_PARTS) == ["abc", "def", "klm", "nop", "kpop"]


def test_catenate_words():
    flags = CATENATE_WORDS | GENERATE_NUMBER_PARTS | SPLIT_ON_NUMERICS
    # wi-fi → wifi (single concatenated run; parts not generated)
    assert _terms(["wi-fi"], flags) == ["wifi"]
    # wi-fi-4000 → wifi, 4000
    assert _terms(["wi-fi-4000"], flags) == ["wifi", "4000"]


# --------------------------------------------------------- Analyzer chain


def test_analyzer_word_delimiter_chain():
    # whitespace → WDGF(defaults) → lowercase
    a = get_analyzer({"kind": "whitespace", "word_delimiter": True})
    toks = a.tokenize_one("PowerShot SD500 wi-fi")
    assert [(t, int(p)) for t, p in toks] == [
        ("power", 0), ("shot", 1), ("sd", 2), ("500", 3),
        ("wi", 4), ("fi", 5)]


def test_analyzer_word_delimiter_graph_positions():
    # catenation stacks at the first part's position; next token shifts by
    # the part count
    from lucene_ray.functions.worddelimiter import (CATENATE_ALL,
                                                    GENERATE_WORD_PARTS)

    a = get_analyzer({"kind": "whitespace",
                      "word_delimiter": CATENATE_ALL | GENERATE_WORD_PARTS})
    toks = a.tokenize_one("foo-bar baz")
    assert sorted(toks) == sorted([("foobar", 0), ("foo", 0), ("bar", 1),
                                   ("baz", 2)])


def test_analyzer_word_delimiter_requires_whitespace():
    with pytest.raises(ValueError):
        get_analyzer({"kind": "standard", "word_delimiter": True})


def test_analyzer_word_delimiter_offsets_refused():
    a = get_analyzer({"kind": "whitespace", "word_delimiter": True})
    with pytest.raises(ValueError):
        a.tokenize_batch_encoded_offsets(["x-y"])


def test_whitespace_analyzer_preserves_case():
    # WhitespaceAnalyzer has no LowerCaseFilter (core/WhitespaceAnalyzer
    # .java); list and Arrow inputs must agree
    import pyarrow as pa

    a = get_analyzer("whitespace")
    t1 = [t for t, _ in a.tokenize_one("Foo BAR")]
    terms, _, _, _ = a.tokenize_batch(pa.array(["Foo BAR"]))
    assert t1 == ["Foo", "BAR"] == list(terms)
    assert a.normalize("Foo") == "Foo"


def test_word_delimiter_index_roundtrip(tmp_path, ray_session):
    import pyarrow as pa
    import pyarrow.parquet as pq

    from lucene_ray.pipelines.index_pipeline import build_index_by_file
    from lucene_ray.query import PhraseQuery, TermQuery
    from lucene_ray.searcher import IndexSearcher

    src = str(tmp_path / "docs.parquet")
    pq.write_table(pa.table({
        "url": ["u1", "u2", "u3"],
        "text": ["PowerShot SD500 camera", "wi-fi router WiFi",
                 "plain words here"]}), src)
    idx = str(tmp_path / "idx")
    spec = {"kind": "whitespace", "word_delimiter": True}
    build_index_by_file(src, idx, key_col="url", text_col="text",
                        analyzer=spec)
    s = IndexSearcher(idx)
    assert s.count(TermQuery("power")) == 1
    assert s.count(TermQuery("wi")) == 1
    assert s.count(TermQuery("fi")) == 1
    # case-change split on the un-hyphenated form too
    assert s.count(TermQuery("wifi")) == 0  # no catenation with defaults
    # parts occupy adjacent positions → phrase matches across the split
    assert s.count(PhraseQuery(["power", "shot"])) == 1
    assert s.count(PhraseQuery(["wi", "fi", "router"])) == 1


def test_discount_overlaps_field_length():
    # BM25Similarity discountOverlaps=true default: stacked tokens (the
    # catenation at the first part's position) do not count toward length
    from lucene_ray.functions.worddelimiter import (CATENATE_ALL,
                                                    GENERATE_WORD_PARTS)

    a = get_analyzer({"kind": "whitespace",
                      "word_delimiter": CATENATE_ALL | GENERATE_WORD_PARTS})
    codes, vocab, doc_idx, positions, dl = a.tokenize_batch_encoded(
        ["foo-bar baz"])
    # four tokens emitted (foobar@0, foo@0, bar@1, baz@2) but length = 3
    assert len(codes) == 4
    assert dl.tolist() == [3]
    # defaults (no catenation): every part advances, length == token count
    b = get_analyzer({"kind": "whitespace", "word_delimiter": True})
    codes, _, _, _, dl = b.tokenize_batch_encoded(["foo-bar baz"])
    assert len(codes) == 3 and dl.tolist() == [3]


def test_wdgf_trailing_empty_doc():
    # regression: a trailing zero-token doc used to index past the cumsum
    a = get_analyzer({"kind": "whitespace", "word_delimiter": True})
    codes, vocab, doc_idx, positions, dl = a.tokenize_batch_encoded(
        ["wi-fi device", "", "   "])
    assert [vocab[c] for c in codes] == ["wi", "fi", "device"]
    assert dl.tolist() == [3, 0, 0]

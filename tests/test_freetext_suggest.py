"""FreeTextSuggester — reference cases transliterated from
suggest/src/test/.../analyzing/TestFreeTextSuggester.java (testBasic,
testUnigrams, testNoDupsAcrossGrams, testEndingHole, testTwoEndingHoles),
plus distributed-build equivalence."""

import pytest

from lucene_ray.functions.analysis import Analyzer
from lucene_ray.suggest import FreeTextSuggester


def _s(results):
    return " ".join(f"{k}/{v:.2f}" for k, v in results)


@pytest.fixture(scope="module")
def basic():
    sug = FreeTextSuggester(Analyzer(kind="standard"), grams=2,
                            separator=" ")
    return sug.build(["foo bar baz blah", "boo foo bar foo bee"])


def test_basic_bigram_with_unigram_backoff(basic):
    # TestFreeTextSuggester.testBasic
    assert _s(basic.lookup("foo b", 10)) == \
        "foo bar/0.67 foo bee/0.33 baz/0.04 blah/0.04 boo/0.04"


def test_basic_bigram_only(basic):
    assert _s(basic.lookup("foo ", 10)) == "foo bar/0.67 foo bee/0.33"


def test_basic_unigram_only(basic):
    assert _s(basic.lookup("foo", 10)) == "foo/0.33"
    assert _s(basic.lookup("b", 10)) == \
        "bar/0.22 baz/0.11 bee/0.11 blah/0.11 boo/0.11"


def test_count(basic):
    assert basic.count == 2


def test_unigram_model():
    # testUnigrams: sorts by count desc then term asc
    sug = FreeTextSuggester(Analyzer(kind="standard"), grams=1,
                            separator=" ")
    sug.build(["foo bar baz blah boo foo bar foo bee"])
    assert _s(sug.lookup("b", 10)) == \
        "bar/0.22 baz/0.11 bee/0.11 blah/0.11 boo/0.11"


def test_no_dups_across_grams():
    sug = FreeTextSuggester(Analyzer(kind="standard"), grams=2,
                            separator=" ")
    sug.build(["foo bar bar bar bar"])
    assert _s(sug.lookup("foo b", 10)) == "foo bar/1.00"


def test_ending_hole():
    # stopword 'of' leaves a hole; ShingleFilter fills with '_'
    a = Analyzer(kind="standard", stop_words=frozenset({"of"}))
    sug = FreeTextSuggester(a, grams=3, separator=" ")
    sug.build(["wizard of oz"])
    assert _s(sug.lookup("wizard of", 10)) == "wizard _ oz/1.00"
    # falls back to unigram: 0.4 backoff * 1/2
    assert _s(sug.lookup("wizard o", 10)) == "oz/0.20"


def test_two_ending_holes():
    a = Analyzer(kind="standard", stop_words=frozenset({"of"}))
    sug = FreeTextSuggester(a, grams=3, separator=" ")
    sug.build(["wizard of of oz"])
    assert _s(sug.lookup("wizard of of", 10)) == ""


def test_empty_key_raises(basic):
    with pytest.raises(ValueError):
        basic.lookup("", 10)


def test_trigram_model():
    sug = FreeTextSuggester(Analyzer(kind="standard"), grams=3,
                            separator=" ")
    sug.build(["a b c d", "a b c e", "a b x"])
    # trigram context 'a b' count 3: c->2/3, x->1/3
    out = sug.lookup("a b ", 10)
    assert [k for k, _ in out] == ["a b c", "a b x"]
    assert abs(out[0][1] - 2 / 3) < 1e-9 and abs(out[1][1] - 1 / 3) < 1e-9


def test_build_from_dataset_matches_local(ray_session):
    import ray

    texts = ["foo bar baz blah", "boo foo bar foo bee",
             "bar baz foo", "baz blah boo bee foo bar"]
    local = FreeTextSuggester(Analyzer(kind="standard"), grams=2,
                              separator=" ").build(texts)
    ds = ray.data.from_items([{"text": t} for t in texts])
    dist = FreeTextSuggester(Analyzer(kind="standard"), grams=2,
                             separator=" ")
    dist.build_from_dataset(ds, text_col="text", num_partitions=4)
    assert dist.tot_tokens == local.tot_tokens
    assert list(dist._keys) == list(local._keys)
    assert list(dist._counts) == list(local._counts)
    for key in ("foo b", "b", "foo ", "ba"):
        assert local.lookup(key, 10) == dist.lookup(key, 10)


def test_min_count_pruning(ray_session):
    import ray

    texts = ["foo bar", "foo bar", "foo baz"]
    ds = ray.data.from_items([{"text": t} for t in texts])
    sug = FreeTextSuggester(Analyzer(kind="standard"), grams=2,
                            separator=" ")
    sug.build_from_dataset(ds, text_col="text", min_count=2)
    # 'foo baz' bigram and 'baz' unigram pruned; totals keep ALL tokens
    assert sug.tot_tokens == 6
    assert "foo baz" not in set(sug._keys)
    assert _s(sug.lookup("foo ", 10)) == "foo bar/0.67"

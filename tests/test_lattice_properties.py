"""Property tests for the shared Viterbi lattice tokenizers (ja/ko/zh/th):
on ANY input the emitted spans must lie inside the text, be
non-overlapping and strictly increasing, reproduce their surface by
slicing, and cover every non-space/punct character (nothing silently
vanishes). These invariants are what the index chain relies on."""

import unicodedata

from hypothesis import given, settings
from hypothesis import strategies as st

from lucene_ray.functions.korean import KoreanTokenizer
from lucene_ray.functions.kuromoji import JapaneseTokenizer
from lucene_ray.functions.smartcn import ChineseTokenizer
from lucene_ray.functions.thai import ThaiTokenizer

# mixed-script alphabets biased toward each segmenter's home script
_JA = "あいうのにはをしたカタカナ漢字空港関西 ab1。"
_KO = "가나다세종시는학교에서공부한다 ab1!"
_ZH = "我们的朋友在中国工作时间 ab1，"
_TH = "การที่ได้ต้องแสดงว่างานดี บาท ab1."


def _spans(toks, with_pos=False):
    return [(a, b) for _s, a, b, *_rest in toks]


def _check_invariants(text, toks, folded=None):
    """folded: the text the offsets actually index (width folding is 1:1,
    so len(folded) == len(text))."""
    src = folded if folded is not None else text
    prev_end = 0
    for item in toks:
        s, a, b = item[0], item[1], item[2]
        assert 0 <= a < b <= len(src)
        assert a >= prev_end, f"overlap at {item}"
        prev_end = max(prev_end, b)


@settings(max_examples=150, deadline=None)
@given(st.text(alphabet=_JA, max_size=40))
def test_japanese_spans(text):
    toks = JapaneseTokenizer().tokenize(text)
    _check_invariants(text, toks)
    for s, a, b in toks:
        assert text[a:b] == s  # no user dict: surface == slice


@settings(max_examples=150, deadline=None)
@given(st.text(alphabet=_KO, max_size=40))
def test_korean_spans(text):
    toks = KoreanTokenizer().tokenize(text)
    _check_invariants(text, toks)
    for s, a, b, _pos in toks:
        assert text[a:b] == s
    # nothing vanishes: every non-space/punct char is covered
    covered = set()
    for _s, a, b, _p in toks:
        covered.update(range(a, b))
    for i, c in enumerate(text):
        if not c.isspace() and unicodedata.category(c)[0] in ("L", "N"):
            assert i in covered, (text, i, c)


@settings(max_examples=150, deadline=None)
@given(st.text(alphabet=_ZH, max_size=40))
def test_chinese_spans(text):
    toks = ChineseTokenizer().tokenize(text)
    _check_invariants(text, toks)


@settings(max_examples=150, deadline=None)
@given(st.text(alphabet=_TH, max_size=40))
def test_thai_spans(text):
    toks = ThaiTokenizer().tokenize(text)
    _check_invariants(text, toks)
    for s, a, b in toks:
        assert text[a:b] == s
    covered = set()
    for _s, a, b in toks:
        covered.update(range(a, b))
    for i, c in enumerate(text):
        if not c.isspace() and unicodedata.category(c)[0] in ("L", "N"):
            assert i in covered, (text, i, c)


@settings(max_examples=100, deadline=None)
@given(st.text(alphabet=_KO + _JA, max_size=30))
def test_korean_pos_filter_subset(text):
    kt = KoreanTokenizer()
    toks = kt.tokenize(text)
    kept = kt.tokenize_surfaces(text)
    assert len(kept) <= len(toks)
    surfaces = [s for s, *_ in toks]
    for k in kept:
        assert k in surfaces

"""CharFilter goldens — cases transliterated from the reference tests
(analysis/common/src/test/.../charfilter/TestMappingCharFilter.java,
TestHTMLStripCharFilter.java, pattern/TestPatternReplaceCharFilter.java) —
semantics, not code."""

import numpy as np
import pytest

from lucene_ray.functions.analysis import get_analyzer
from lucene_ray.functions.charfilters import (
    HTMLStripCharFilter,
    MappingCharFilter,
    PatternReplaceCharFilter,
    apply_char_filters,
    build_char_filter,
    correct_spans,
)

# TestMappingCharFilter.setUp rule set
RULES = {"aa": "a", "bbb": "b", "cccc": "cc", "h": "i", "j": "jj",
         "k": "kkk", "ll": "llll", "empty": "", "\U0001D122": "fclef",
         "！": "full-width-exclamation"}


def _ws_spans(text, filters):
    """Whitespace-tokenize filtered text; return [(token, start, end)] with
    offsets corrected back to the original text — the assertTokenStreamContents
    surface of the reference tests."""
    import re

    out, maps = apply_char_filters(text, filters)
    toks = [(m.group(), m.start(), m.end()) for m in re.finditer(r"\S+", out)]
    if not toks:
        return []
    starts = np.array([t[1] for t in toks], dtype=np.int64)
    ends = np.array([t[2] for t in toks], dtype=np.int64)
    starts, ends = correct_spans(starts, ends, maps)
    return [(t[0], int(s), int(e)) for t, s, e in zip(toks, starts, ends)]


@pytest.mark.parametrize("inp,tok,start,end", [
    ("x", "x", 0, 1),        # testNothingChange
    ("h", "i", 0, 1),        # test1to1
    ("j", "jj", 0, 1),       # test1to2
    ("k", "kkk", 0, 1),      # test1to3
    ("ll", "llll", 0, 2),    # test2to4
    ("aa", "a", 0, 2),       # test2to1
    ("bbb", "b", 0, 3),      # test3to1
    ("cccc", "cc", 0, 4),    # test4to2
    ("\U0001D122", "fclef", 0, 2),  # testNonBMPChar (offsets in UTF-16 in
                                    # Java; here codepoint offsets: 0..1)
])
def test_mapping_single_token(inp, tok, start, end):
    f = MappingCharFilter(RULES)
    spans = _ws_spans(inp, [f])
    if inp == "\U0001D122":
        # Python offsets are codepoint-based: the surrogate pair is ONE char
        assert spans == [(tok, 0, 1)]
    else:
        assert spans == [(tok, start, end)]


def test_mapping_5to0():
    # test5to0: "empty" maps to "" → no tokens at all
    assert _ws_spans("empty", [MappingCharFilter(RULES)]) == []


def test_mapping_token_stream():
    # TestMappingCharFilter.testTokenStream: token/offset table verbatim
    spans = _ws_spans("h i j k ll cccc bbb aa", [MappingCharFilter(RULES)])
    assert spans == [
        ("i", 0, 1), ("i", 2, 3), ("jj", 4, 5), ("kkk", 6, 7),
        ("llll", 8, 10), ("cc", 11, 15), ("b", 16, 19), ("a", 20, 22)]


def test_mapping_chained():
    # TestMappingCharFilter.testChained: two filter stages compose, offsets
    # correct through both maps
    f = MappingCharFilter(RULES)
    spans = _ws_spans("aaaa ll h", [f, f])
    assert spans == [("a", 0, 4), ("llllllll", 5, 7), ("i", 8, 9)]


def test_mapping_longest_match_wins():
    # greedy longest-match at each position (NormalizeCharMap FST policy)
    f = MappingCharFilter({"a": "x", "ab": "y"})
    out, _ = f("ab a")
    assert out == "y x"


# --------------------------------------------------------------- HTMLStrip


def test_html_strip_basics():
    # TestHTMLStripCharFilter.test: block tags → \n, inline <a> vanishes,
    # entities decode, bare & kept, comment vanishes
    html = ('<div class="foo">this is some text</div> here is a '
            '<a href="#bar">link</a> and another '
            '<a href="http://lucene.apache.org/">link</a>. '
            'This is an entity: &amp; plus a &lt;.  Here is an &. '
            '<!-- is a comment -->')
    gold = ("\nthis is some text\n here is a link and another link. "
            "This is an entity: & plus a <.  Here is an &. ")
    out, _ = HTMLStripCharFilter()(html)
    assert out == gold


def test_html_strip_entities():
    # testEntities / testMoreEntities (named nbsp → plain space)
    out, _ = HTMLStripCharFilter()(
        "&nbsp; &lt;foo&gt; &Uuml;bermensch &#61; &Gamma; bar &#x393;")
    assert out == "  <foo> Übermensch = Γ bar Γ"
    out, _ = HTMLStripCharFilter()("&nbsp; &lt;junk/&gt; &nbsp; &#33; &#64; and &#8217;")
    assert out == "  <junk/>   ! @ and ’"


def test_html_strip_inline_no_space():
    # testInlineTagsNoSpace: inline elements removed with NO replacement
    out, _ = HTMLStripCharFilter()(
        'one<sPAn class="invisible">two<sup>2<sup>e</sup></sup>.</SpaN>three')
    assert out == "onetwo2e.three"


def test_html_strip_script_style():
    out, _ = HTMLStripCharFilter()(
        "one<script type='text/javascript'>callSomeMethod();</script>two")
    assert out == "one\ntwo"
    out, _ = HTMLStripCharFilter()(
        'one<style type="text/css"> body,font,a { font-family:arial; } </style>two')
    assert out == "one\ntwo"


def test_html_strip_br_and_comment_dashes():
    out, _ = HTMLStripCharFilter()("one<br />two<br>three")
    assert out == "one\ntwo\nthree"
    # testCommentWithThreeDashes
    out, _ = HTMLStripCharFilter()("<!--- three dashes, still a valid comment ---> ")
    assert out == " "


def test_html_strip_escaped_tags():
    # setEscapedTags: named elements pass through verbatim
    f = HTMLStripCharFilter(escaped_tags=("br",))
    out, _ = f("one<BR class='whatever'>two")
    assert out == "one<BR class='whatever'>two"


def test_html_strip_offsets_correct():
    # spans found in stripped text map back into the original markup
    html = "<p>hello <b>world</b></p>"
    spans = _ws_spans(html, [HTMLStripCharFilter()])
    toks = [t for t, _, _ in spans]
    assert toks == ["hello", "world"]
    (_, hs, he), (_, ws, we) = spans
    assert html[hs:he] == "hello"
    # 'world' start corrects past '<p>hello <b>' → original index 12
    assert html[ws:ws + 5] == "world"


# --------------------------------------------------------- PatternReplace


def test_pattern_replace_group_refs():
    # TestPatternReplaceCharFilter: group-ref replacement, $N syntax accepted
    f = PatternReplaceCharFilter("(aa)\\s+(bb)\\s+(cc)", "$1#$2#$3")
    out, _ = f("aa bb cc")
    assert out == "aa#bb#cc"


def test_pattern_replace_shrink_and_offsets():
    f = PatternReplaceCharFilter("a+", "a")
    spans = _ws_spans("aaa bbb aaa", [f])
    assert [t for t, _, _ in spans] == ["a", "bbb", "a"]
    # last token's span ends at the original string end
    assert spans[-1][2] == len("aaa bbb aaa")


def test_pattern_replace_nothing_matches():
    f = PatternReplaceCharFilter("zz", "x")
    out, omap = f("hello world")
    assert out == "hello world" and omap.offsets == []


# ------------------------------------------------------- Analyzer plumbing


def test_build_char_filter_specs():
    assert isinstance(build_char_filter("html_strip"), HTMLStripCharFilter)
    assert isinstance(
        build_char_filter({"type": "mapping", "rules": {"a": "b"}}),
        MappingCharFilter)
    with pytest.raises(ValueError):
        build_char_filter({"type": "nope"})


def test_analyzer_char_filters_tokenize():
    a = get_analyzer({"kind": "standard",
                      "char_filters": [{"type": "html_strip"}]})
    toks = [t for t, _ in a.tokenize_one("<p>Hello <b>World</b></p>")]
    assert toks == ["hello", "world"]


def test_analyzer_char_filters_offsets_path():
    a = get_analyzer({"kind": "standard",
                      "char_filters": [{"type": "html_strip"}]})
    text = "<p>hello <b>world</b></p>"
    codes, vocab, doc_idx, positions, starts, ends, dl = (
        a.tokenize_batch_encoded_offsets([text]))
    terms = [vocab[c] for c in codes]
    assert terms == ["hello", "world"]
    s0, e0 = int(starts[0]), int(ends[0])
    assert text[s0:e0] == "hello"
    assert text[int(starts[1]):int(starts[1]) + 5] == "world"


def test_analyzer_dict_spec_roundtrip_index(tmp_path, ray_session):
    # dict spec rides the manifest: build → fresh searcher reconstructs chain
    import pyarrow as pa
    import pyarrow.parquet as pq

    from lucene_ray.pipelines.index_pipeline import build_index_by_file
    from lucene_ray.query import TermQuery
    from lucene_ray.searcher import IndexSearcher

    src = str(tmp_path / "docs.parquet")
    pq.write_table(pa.table({
        "url": ["u1", "u2"],
        "text": ["<p>Quick &amp; <b>Brown</b> fox</p>",
                 "plain text row"]}), src)
    idx = str(tmp_path / "idx")
    spec = {"kind": "standard", "char_filters": [{"type": "html_strip"}]}
    build_index_by_file(src, idx, key_col="url", text_col="text",
                        analyzer=spec)
    s = IndexSearcher(idx)
    assert s.count(TermQuery("brown")) == 1
    assert s.count(TermQuery("quick")) == 1
    # the searcher's own parse path reuses the persisted dict spec
    assert s.query_analyzer().char_filters

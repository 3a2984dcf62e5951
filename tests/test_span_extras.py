"""SpanFirst / SpanPositionRange / SpanNot (spans/SpanFirstQuery.java,
SpanPositionRangeQuery.java, SpanNotQuery.java semantics)."""

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from lucene_ray.query import (
    SpanFirstQuery,
    SpanNearQuery,
    SpanNotQuery,
    SpanPositionRangeQuery,
    TermQuery,
)
from lucene_ray.searcher import IndexSearcher
from lucene_ray.xmlparser import parse_xml_query as X

DOCS = [
    #        pos: 0     1      2      3      4
    ("d0", "apple banana cherry apple banana"),
    ("d1", "cherry apple banana date elderberry"),
    ("d2", "date elderberry fig apple banana"),
    ("d3", "apple fig banana cherry date"),
]


@pytest.fixture(scope="module")
def idx(ray_session, tmp_path_factory):
    from lucene_ray.pipelines.index_pipeline import build_index_by_file

    base = tmp_path_factory.mktemp("spanx")
    src = str(base / "docs.parquet")
    pq.write_table(
        pa.table({"url": [k for k, _ in DOCS], "text": [t for _, t in DOCS]}),
        src,
    )
    d = str(base / "idx")
    build_index_by_file(src, d, key_col="url", text_col="text")
    return d


def _hits(idx, q):
    s = IndexSearcher(idx)
    return sorted(sd.doc_key for sd in s.search(q, 10).score_docs)


def test_span_first_term(idx):
    # "apple" within the first 1 positions: only docs with apple at pos 0
    q = SpanFirstQuery(TermQuery("apple"), 1)
    assert _hits(idx, q) == ["d0", "d3"]
    # within first 2 positions adds d1 (apple at pos 1)
    assert _hits(idx, SpanFirstQuery(TermQuery("apple"), 2)) == ["d0", "d1", "d3"]


def test_span_first_near(idx):
    # "apple banana" adjacent, entirely within the first 2 positions
    near = SpanNearQuery([("apple",), ("banana",)], slop=0, in_order=True)
    assert _hits(idx, SpanFirstQuery(near, 2)) == ["d0"]
    # window of 5 admits the d2 match at positions 3-4 and d1 at 1-2
    assert _hits(idx, SpanFirstQuery(near, 5)) == ["d0", "d1", "d2"]


def test_span_position_range(idx):
    # apple in positions [3, 5): d0 (pos 3) and d2 (pos 3)
    q = SpanPositionRangeQuery(TermQuery("apple"), 3, 5)
    assert _hits(idx, q) == ["d0", "d2"]


def test_span_not(idx):
    # apple NOT followed-within-0 by fig: kills d3's "apple fig"
    near_af = SpanNearQuery([("apple",), ("fig",)], slop=0, in_order=True)
    q = SpanNotQuery(TermQuery("apple"), near_af)
    # d3's single apple IS the start of the excluded "apple fig" span
    assert _hits(idx, q) == ["d0", "d1", "d2"]


def test_span_not_pre_post(idx):
    # exclude "cherry" within 1 position BEFORE apple: d1 (cherry apple)
    # drops (its only apple@1 has cherry@0); d0's apple@3 occurrence is
    # excluded by cherry@2 but apple@0 survives, so d0 stays
    q = SpanNotQuery(TermQuery("apple"), TermQuery("cherry"), pre=1, post=0)
    assert _hits(idx, q) == ["d0", "d2", "d3"]
    q_strict = SpanNotQuery(
        SpanNearQuery([("apple",), ("banana",)], slop=0, in_order=True),
        TermQuery("cherry"),
        pre=1,
        post=0,
    )
    # d1's apple banana span (1,2) has cherry at 0 = 1 before -> excluded
    assert _hits(idx, q_strict) == ["d0", "d2"]


def test_nested_span_extent_chaining(idx):
    """(apple W banana) 2W cherry: the inner adjacent span's extents chain
    under the ordered parent — d0 matches via (0,1)->cherry@2 (gap 0);
    d1's cherry precedes the inner span; d3 has no adjacent apple banana."""
    from lucene_ray.surround import parse_surround_query as P

    q = P("(apple W banana) 2W cherry")
    inner = SpanNearQuery([("apple",), ("banana",)], slop=0, in_order=True)
    assert q == SpanNearQuery([inner, ("cherry",)], slop=1, in_order=True)
    assert _hits(idx, q) == ["d0"]
    # nested unordered inner under ordered parent
    q2 = P("2W(N(banana, apple), cherry)")
    # d0: unordered {apple,banana} minimal extents (0,1),(3,4); (0,1)->cherry@2 ok
    assert _hits(idx, q2) == ["d0"]


def test_xml_span_builders(idx):
    q = X("""<SpanFirst end="2"><SpanTerm>apple</SpanTerm></SpanFirst>""")
    assert q == SpanFirstQuery(
        SpanNearQuery([("apple",)], slop=0, in_order=True), 2)
    assert _hits(idx, q) == ["d0", "d1", "d3"]
    q = X("""
    <SpanNot>
      <Include><SpanNear slop="0" inOrder="true">
        <SpanTerm>apple</SpanTerm><SpanTerm>banana</SpanTerm>
      </SpanNear></Include>
      <Exclude><SpanTerm>cherry</SpanTerm></Exclude>
    </SpanNot>""")
    # no pre/post slack: cherry must overlap the span itself -> nothing drops
    assert _hits(idx, q) == ["d0", "d1", "d2"]
    q = X("""<SpanPositionRange start="3" end="5"><SpanTerm>apple</SpanTerm></SpanPositionRange>""")
    assert _hits(idx, q) == ["d0", "d2"]

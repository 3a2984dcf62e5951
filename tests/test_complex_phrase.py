"""ComplexPhraseQueryParser (queryparser/complexPhrase/
ComplexPhraseQueryParser.java): wildcard / prefix / fuzzy / alternative
groups inside quoted phrases, expanded globally and matched by the
MultiPhraseQuery kernel."""

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from lucene_ray.query import (
    ComplexPhraseQuery,
    PhraseQuery,
    TermQuery,
    parse_complex_phrase_query,
)
from lucene_ray.searcher import IndexSearcher

DOCS = [
    ("d0", "john smith went home"),
    ("d1", "jon smithers stayed out"),
    ("d2", "johnny smith was not here"),
    ("d3", "smith john reversed order"),
    ("d4", "jon briefly met smith yesterday"),
]


@pytest.fixture(scope="module")
def idx(ray_session, tmp_path_factory):
    from lucene_ray.pipelines.index_pipeline import build_index_by_file

    base = tmp_path_factory.mktemp("cp")
    src = str(base / "docs.parquet")
    pq.write_table(
        pa.table({"url": [k for k, _ in DOCS], "text": [t for _, t in DOCS]}),
        src,
    )
    d = str(base / "idx")
    build_index_by_file(src, d, key_col="url", text_col="text")
    return d


def test_parse_tree():
    q = parse_complex_phrase_query('"(john jon) smith*"~2')
    assert q == ComplexPhraseQuery(
        [(("term", "john"), ("term", "jon")), (("prefix", "smith"),)], slop=2)
    # plain phrases keep the classic parse
    assert parse_complex_phrase_query('"john smith"') == PhraseQuery(
        ["john", "smith"])
    # outside-phrase syntax is untouched classic grammar
    q = parse_complex_phrase_query('title:"jo?n smith" extra')
    assert q.should[0].positions[0] == (("wildcard", "jo?n"),)
    assert q.should[0].field == "title"
    assert q.should[1] == TermQuery("extra")


def _hits(idx, qs, k=10):
    s = IndexSearcher(idx)
    q = parse_complex_phrase_query(qs)
    return sorted(sd.doc_key for sd in s.search(q, k).score_docs)


def test_alternatives_and_prefix(idx):
    assert _hits(idx, '"(john jon) smith*"') == ["d0", "d1"]


def test_slop(idx):
    assert _hits(idx, '"(john jon) smith*"~3') == ["d0", "d1", "d3", "d4"]


def test_wildcard_in_phrase(idx):
    assert _hits(idx, '"jo?n smith"') == ["d0"]


def test_fuzzy_in_phrase(idx):
    assert _hits(idx, '"johny~1 smith"') == ["d0", "d2"]


def test_no_match_slot_kills_phrase(idx):
    assert _hits(idx, '"(zzz qqq) smith"') == []


def test_scores_match_expanded_multiphrase(idx):
    """Complex phrase score == the equivalent hand-expanded MultiPhraseQuery
    (the parser/expansion layer must add nothing to scoring)."""
    from lucene_ray.query import MultiPhraseQuery

    s = IndexSearcher(idx)
    a = s.search(parse_complex_phrase_query('"(john jon) smith*"'), 10).score_docs
    b = s.search(
        MultiPhraseQuery([("john", "jon"), ("smith", "smithers")]), 10
    ).score_docs
    assert [(x.doc_key, round(x.score, 6)) for x in a] == [
        (x.doc_key, round(x.score, 6)) for x in b
    ]

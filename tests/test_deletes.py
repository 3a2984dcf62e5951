"""Deletes / updates: generational live-docs, search-time filtering,
stats-preserved-until-merge, merge reclamation, updateDocument semantics."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest

from lucene_ray.query import TermQuery
from lucene_ray.searcher import IndexSearcher
from lucene_ray.state.deletes import delete_by_keys, delete_by_query, update_documents
from lucene_ray.state.manifest import Manifest
from lucene_ray.state.merge import merge_index
from lucene_ray.state.segment import check_segment

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture()
def idx(ray_session, tmp_path):
    from lucene_ray.pipelines.index_pipeline import build_index

    d = str(tmp_path / "idx")
    build_index(f"{SF_DIR}/documents.parquet", d, key_col="doc_id", text_col="text",
                num_partitions=4, columns=["doc_id", "text"])
    return d


def test_delete_by_query_filters_but_keeps_stats(idx):
    s0 = IndexSearcher(idx)
    before_hits = {sd.doc_key for sd in s0.search(TermQuery("merge"), k=10_000).score_docs}
    before_stats = s0.collection_stats
    victims = set(list(before_hits)[:5])
    n = delete_by_keys(idx, victims)
    assert n == 5
    s1 = IndexSearcher(idx)
    after_hits = {sd.doc_key for sd in s1.search(TermQuery("merge"), k=10_000).score_docs}
    assert after_hits == before_hits - victims
    # Lucene semantics: stats & idf unchanged until merge reclaims
    assert s1.collection_stats == before_stats
    # surviving docs keep identical scores
    sd0 = {sd.doc_key: sd.score for sd in s0.search(TermQuery("merge"), k=10_000).score_docs}
    sd1 = {sd.doc_key: sd.score for sd in s1.search(TermQuery("merge"), k=10_000).score_docs}
    for k in after_hits:
        assert sd0[k] == sd1[k]


def test_delete_then_merge_reclaims(idx):
    s0 = IndexSearcher(idx)
    all_docs = s0.collection_stats.max_doc
    n = delete_by_query(idx, TermQuery("dup"))
    assert n > 0
    m = merge_index(idx, merge_factor=4)
    for d in m.segment_dirs():
        assert check_segment(d) == []
    s1 = IndexSearcher(idx)
    assert s1.collection_stats.max_doc == all_docs - n
    assert s1.count(TermQuery("dup")) == 0
    # deleted docs are really gone from postings (not just filtered)
    assert all(r.live is None for r in s1.readers)
    ts = s1.term_statistics("dup")
    assert ts.doc_freq == 0


def test_update_documents_last_writer_wins(idx):
    s0 = IndexSearcher(idx)
    assert s0.count(TermQuery("zzznew")) == 0
    rows = pa.table(
        {
            "doc_id": pa.array([3, 7], type=pa.int64()),
            "text": pa.array(["zzznew content here", "zzznew other text"]),
        }
    )
    update_documents(idx, rows)
    s1 = IndexSearcher(idx)
    td = s1.search(TermQuery("zzznew"), k=10)
    assert {sd.doc_key for sd in td.score_docs} == {3, 7}
    # the OLD copies of docs 3/7 are dead: their old terms no longer match them
    old_text_hits = {sd.doc_key for sd in s1.search(TermQuery("merge"), k=10_000).score_docs}
    assert 3 not in old_text_hits or "merge" in "zzznew content here"
    # doc count: max_doc grew by 2 (adds), deleted 2 filtered at search
    assert s1.count(TermQuery("zzznew")) == 2


def test_wand_respects_deletes(idx):
    s0 = IndexSearcher(idx)
    top = s0.search("merge window", k=5, algo="wand").score_docs
    victims = [top[0].doc_key]
    delete_by_keys(idx, victims)
    s1 = IndexSearcher(idx)
    a = s1.search("merge window", k=5, algo="wand").score_docs
    b = s1.search("merge window", k=5, algo="exhaustive").score_docs
    assert [(x.doc_key, x.score) for x in a] == [(x.doc_key, x.score) for x in b]
    assert victims[0] not in {x.doc_key for x in a}


def test_update_numeric_docvalues(tmp_path, ray_session):
    import pandas as pd

    from lucene_ray.pipelines.index_pipeline import build_index
    from lucene_ray.query import NumericRangeQuery
    from lucene_ray.searcher import IndexSearcher
    from lucene_ray.state.deletes import update_numeric_docvalues
    from lucene_ray.state.manifest import Manifest

    src = str(tmp_path / "d.parquet")
    pd.DataFrame({"doc_id": range(20), "text": ["w x"] * 20,
                  "price": list(range(20))}).to_parquet(src)
    d = str(tmp_path / "idx")
    build_index(src, d, key_col="doc_id", text_col="text", num_partitions=3,
                columns=["doc_id", "text", "price"], docvalue_cols=("price",))
    gen0 = Manifest.load(d).gen
    s0 = IndexSearcher(d)
    assert s0.count(NumericRangeQuery("price", lower=100)) == 0
    n = update_numeric_docvalues(d, "price", {3: 150, 7: 200, 19: 99})
    assert n == 3
    assert Manifest.load(d).gen == gen0 + 1
    s = IndexSearcher(d)
    assert s.count(NumericRangeQuery("price", lower=100)) == 2
    assert s.document(3)["price"] == 150
    assert s.document(4)["price"] == 4  # untouched
    # statistics unchanged (dv updates never touch postings/norms)
    assert Manifest.load(d).collection_stats() == s0.collection_stats
    # second update generation stacks
    update_numeric_docvalues(d, "price", {3: 5})
    s2 = IndexSearcher(d)
    assert s2.count(NumericRangeQuery("price", lower=100)) == 1


def test_merge_bakes_in_docvalue_updates(tmp_path, ray_session):
    import pandas as pd

    from lucene_ray.pipelines.index_pipeline import build_index
    from lucene_ray.query import NumericRangeQuery
    from lucene_ray.searcher import IndexSearcher
    from lucene_ray.state.deletes import update_numeric_docvalues
    from lucene_ray.state.manifest import Manifest
    from lucene_ray.state.merge import merge_index

    src = str(tmp_path / "d.parquet")
    pd.DataFrame({"doc_id": range(30), "text": ["w x"] * 30,
                  "price": list(range(30))}).to_parquet(src)
    d = str(tmp_path / "idx")
    build_index(src, d, key_col="doc_id", text_col="text", num_partitions=4,
                columns=["doc_id", "text", "price"], docvalue_cols=("price",))
    update_numeric_docvalues(d, "price", {5: 500, 25: 501})
    merge_index(d, merge_factor=4)
    m = Manifest.load(d)
    assert all(not s.get("dv_gens") for s in m.segments)  # baked in
    s = IndexSearcher(d)
    assert s.count(NumericRangeQuery("price", lower=400)) == 2
    assert s.document(5)["price"] == 500


def test_dv_update_generations_carry_forward(tmp_path, ray_session):
    """Second update batch must NOT revert prior updates to other docs in the
    same segment (reviewer repro), and a dv update must not clobber a
    concurrent delete's del_gen (field-level replay)."""
    import pandas as pd

    from lucene_ray.pipelines.index_pipeline import build_index
    from lucene_ray.searcher import IndexSearcher
    from lucene_ray.state.deletes import delete_by_keys, update_numeric_docvalues
    from lucene_ray.state.manifest import Manifest

    src = str(tmp_path / "d.parquet")
    pd.DataFrame({"doc_id": range(10), "text": ["w"] * 10,
                  "price": list(range(10))}).to_parquet(src)
    d = str(tmp_path / "idx")
    build_index(src, d, key_col="doc_id", text_col="text", num_partitions=1,
                columns=["doc_id", "text", "price"], docvalue_cols=("price",))
    update_numeric_docvalues(d, "price", {3: 150, 4: 160})
    update_numeric_docvalues(d, "price", {3: 5})
    s = IndexSearcher(d)
    assert s.document(4)["price"] == 160  # carried forward (was reverted pre-fix)
    assert s.document(3)["price"] == 5
    # delete + dv update on the same segment compose (field-level overrides)
    delete_by_keys(d, [7])
    update_numeric_docvalues(d, "price", {8: 999})
    s2 = IndexSearcher(d)
    assert s2.document(7) is None            # delete survives the dv commit
    assert s2.document(8)["price"] == 999
    m = Manifest.load(d)
    seg = m.segments[0]
    assert seg["del_gen"] == 1 and seg["dv_gens"]["price"] == 3

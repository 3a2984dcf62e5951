"""Pluggable similarities (Classic TF-IDF, LMDirichlet, Boolean) and the
deterministic hash sampler.

Formula sources: reference ClassicSimilarity.java:38-64 (tf/idf/lengthNorm),
TFIDFSimilarity.TFIDFScorer.score:497-501, LMDirichletSimilarity.java:70-77,
LMSimilarity.DefaultCollectionModel:145-147, BooleanSimilarity.java:57-60.
"""

import math

import numpy as np
import pyarrow as pa
import pytest

from lucene_ray.functions.similarity import (
    BooleanSimilarity,
    ClassicSimilarity,
    CollectionStatistics,
    LMDirichletSimilarity,
    TermStatistics,
)

CSTATS = CollectionStatistics(max_doc=100, doc_count=100, sum_doc_freq=5000, sum_total_term_freq=12000)
TS = TermStatistics("merge", doc_freq=7, total_term_freq=30)


def test_classic_formula():
    sc = ClassicSimilarity().scorer(CSTATS, TS, boost=2.0)
    freq, dl = 4.0, 64
    idf = math.log((100 + 1) / (7 + 1)) + 1.0
    expected = 2.0 * idf * math.sqrt(freq) / math.sqrt(dl)
    got = sc.score(np.array([freq]), np.array([dl]))[0]
    assert got == pytest.approx(expected, rel=1e-12)
    # max_score dominates any (freq<=max, dl>=min) combination
    assert sc.max_score(4.0, 32) >= got


def test_classic_multi_term_idf_sums():
    ts2 = TermStatistics("join", doc_freq=3, total_term_freq=9)
    sc = ClassicSimilarity().scorer(CSTATS, [TS, ts2])
    idf = (math.log(101 / 8) + 1.0) + (math.log(101 / 4) + 1.0)
    assert sc.weight == pytest.approx(idf, rel=1e-12)


def test_lm_dirichlet_formula_and_clamp():
    sim = LMDirichletSimilarity()  # mu=2000
    sc = sim.scorer(CSTATS, TS)
    p = (30 + 1.0) / (12000 + 1.0)
    freq, dl = 5.0, 80
    expected = math.log(1 + freq / (2000.0 * p)) + math.log(2000.0 / (dl + 2000.0))
    got = sc.score(np.array([freq]), np.array([dl]))[0]
    assert got == pytest.approx(max(0.0, expected), rel=1e-12)
    # tiny freq in a huge doc drives the raw score negative -> clamped to 0
    got0 = sc.score(np.array([1.0]), np.array([10**7]))[0]
    assert got0 == 0.0
    with pytest.raises(ValueError):
        LMDirichletSimilarity(mu=-1)


def test_boolean_similarity_is_boost():
    sc = BooleanSimilarity().scorer(CSTATS, TS, boost=3.5)
    out = sc.score(np.array([1.0, 9.0]), np.array([10, 9999]))
    assert (out == 3.5).all()


def test_searcher_similarity_plug(tmp_path):
    """End-to-end: index 3 tiny docs, rank with Classic vs LMDirichlet vs
    brute-force formula replication."""
    import pyarrow.parquet as pq

    from lucene_ray.pipelines.index_pipeline import build_index
    from lucene_ray.query import TermQuery
    from lucene_ray.searcher import IndexSearcher

    src = tmp_path / "docs.parquet"
    texts = [
        "merge merge merge sort",             # tf=3, dl=4
        "merge window scan join filter scan", # tf=1, dl=6
        "window scan",                        # no merge
    ]
    pq.write_table(
        pa.table({"doc_id": pa.array([0, 1, 2], type=pa.int64()), "text": texts}),
        src,
    )
    idx = str(tmp_path / "idx")
    build_index(str(src), idx, key_col="doc_id", text_col="text",
                num_partitions=1, analyzer="simple")

    doc_count, sum_ttf = 3, 12
    dls = {0: 4, 1: 6, 2: 2}
    tfs = {0: 3, 1: 1}

    s = IndexSearcher(idx, similarity=ClassicSimilarity())
    td = s.search(TermQuery("merge"), k=3)
    idf = math.log((doc_count + 1) / (2 + 1)) + 1.0
    exp = {d: idf * math.sqrt(tf) / math.sqrt(dls[d]) for d, tf in tfs.items()}
    got = {int(sd.doc_key): sd.score for sd in td.score_docs}
    assert set(got) == set(exp)
    for d in exp:
        assert got[d] == pytest.approx(exp[d], rel=1e-9)

    s = IndexSearcher(idx, similarity=LMDirichletSimilarity())
    td = s.search(TermQuery("merge"), k=3)
    p = (4 + 1.0) / (sum_ttf + 1.0)
    exp = {
        d: max(0.0, math.log(1 + tf / (2000.0 * p)) + math.log(2000.0 / (dls[d] + 2000.0)))
        for d, tf in tfs.items()
    }
    got = {int(sd.doc_key): sd.score for sd in td.score_docs}
    for d in exp:
        assert got[d] == pytest.approx(exp[d], rel=1e-9)


def test_combined_field_query_bm25f(tmp_path):
    """CombinedFieldQuery vs a hand-computed BM25F: title weight 2, body 1.

    docs: (title, body) pairs; combined freq = 2*tf_title + tf_body,
    combined dl = 2*dl_title + dl_body, df = max over (field, term) pairs,
    doc_count = max over fields, avgdl from 2*sumTtf_title + sumTtf_body.
    """
    import pyarrow.parquet as pq

    from lucene_ray.pipelines.index_pipeline import build_index
    from lucene_ray.query import CombinedFieldQuery
    from lucene_ray.searcher import IndexSearcher

    titles = ["merge policy", "window merge", "scan basics"]
    bodies = [
        "merge sort is stable",            # dl 4, merge tf 1
        "window frame and pane",           # dl 4
        "merge merge scan",                # dl 3, merge tf 2
    ]
    pq.write_table(
        pa.table({
            "doc_id": pa.array([0, 1, 2], type=pa.int64()),
            "title": titles,
            "text": bodies,
        }),
        tmp_path / "docs.parquet",
    )
    idx = str(tmp_path / "idx")
    build_index(str(tmp_path / "docs.parquet"), idx, key_col="doc_id",
                text_col="text", text_cols=("title", "text"),
                num_partitions=1, analyzer="simple")

    s = IndexSearcher(idx, mode="exact")
    td = s.search(CombinedFieldQuery(("merge",), (("title", 2.0), ("text", 1.0))), k=5)
    got = {int(sd.doc_key): sd.score for sd in td.score_docs}

    # hand statistics
    t_tf = {0: 1, 1: 1, 2: 0}     # 'merge' tf in title
    b_tf = {0: 1, 1: 0, 2: 2}     # 'merge' tf in body
    t_dl = {0: 2, 1: 2, 2: 2}
    b_dl = {0: 4, 1: 4, 2: 3}
    df = max(2, 2)                # title df=2, body df=2
    doc_count = 3
    sum_ttf = 2.0 * 6 + 1.0 * 11  # title tokens 6, body tokens 11
    avgdl = sum_ttf / doc_count
    idf = math.log(1 + (doc_count - df + 0.5) / (df + 0.5))
    exp = {}
    for d in (0, 1, 2):
        freq = 2.0 * t_tf[d] + 1.0 * b_tf[d]
        if freq == 0:
            continue
        dl = 2.0 * t_dl[d] + 1.0 * b_dl[d]
        exp[d] = idf * (freq * 2.2) / (freq + 1.2 * (1 - 0.75 + 0.75 * dl / avgdl))
    assert set(got) == set(exp)
    for d in exp:
        assert got[d] == pytest.approx(exp[d], rel=1e-9)

    # lucene mode runs the SmallFloat-encoded path without error and agrees
    # on the ranking for this tiny corpus
    s32 = IndexSearcher(idx, mode="lucene")
    td32 = s32.search(CombinedFieldQuery(("merge",), (("title", 2.0), ("text", 1.0))), k=5)
    assert [int(sd.doc_key) for sd in td32.score_docs] == [
        int(sd.doc_key) for sd in td.score_docs
    ]


def test_sample_mask_deterministic_and_unbiased():
    from lucene_ray.pipelines.sample import sample_mask

    keys = np.arange(100_000, dtype=np.int64)
    m1 = sample_mask(keys, 0.1, salt=7)
    m2 = sample_mask(keys, 0.1, salt=7)
    assert (m1 == m2).all()
    # rate lands near 10% (multiplicative hashing is equidistributed)
    assert abs(m1.mean() - 0.1) < 0.01
    # different salt -> different (mostly independent) selection
    m3 = sample_mask(keys, 0.1, salt=8)
    assert (m1 != m3).any()
    # membership is per-key, independent of batch slicing
    m_slice = sample_mask(keys[500:1500], 0.1, salt=7)
    assert (m_slice == m1[500:1500]).all()
    with pytest.raises(ValueError):
        sample_mask(keys, 1.5)


def test_deterministic_sample_dataset():
    import ray.data

    from lucene_ray.pipelines.sample import deterministic_sample, sample_mask

    ds = ray.data.range(5000).map_batches(
        lambda b: pa.table({"doc_id": b["id"]}), batch_format="pyarrow"
    )
    out = deterministic_sample(ds, "doc_id", 0.2, salt=3).to_pandas()
    expect = np.arange(5000)[sample_mask(np.arange(5000), 0.2, salt=3)]
    assert sorted(out.doc_id.tolist()) == expect.tolist()

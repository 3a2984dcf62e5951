"""Distributed term-stats finalization: with the small-dict fast path
disabled, the global dictionary must be written from workers as a directory
of term-range parquet files (no driver-side vocabulary build) and read back
identically by GlobalTermStats and the stats lookups."""

import os
import shutil

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest


@pytest.fixture()
def small_index(tmp_path, ray_session):
    import ray.data

    from lucene_ray.pipelines.index_pipeline import build_index

    rows = [{"url": f"u{i}", "text": f"alpha beta gamma doc{i % 7} common"}
            for i in range(300)]
    idx = str(tmp_path / "idx")
    build_index(ray.data.from_items(rows), idx, key_col="url",
                text_col="text", num_partitions=4)
    return idx


def test_distributed_dict_matches_fast_path(small_index, ray_session):
    from lucene_ray.pipelines.index_pipeline import build_term_stats
    from lucene_ray.searcher import GlobalTermStats
    from lucene_ray.state.manifest import Manifest

    man = Manifest.load(small_index)
    ts = os.path.join(small_index, f"term_stats-{man.gen}.parquet")
    assert os.path.isfile(ts)  # small path wrote one file
    small = pq.read_table(ts).to_pandas().sort_values("term").reset_index(drop=True)

    shutil.rmtree(ts, ignore_errors=True)
    if os.path.exists(ts):
        os.remove(ts)
    out = build_term_stats(small_index, man, small_dict_limit=0)
    assert os.path.isdir(out)  # distributed range-file layout
    big = (
        pq.read_table(out)
        .select(["term", "doc_freq", "total_tf"])
        .to_pandas()
        .sort_values("term")
        .reset_index(drop=True)
    )
    assert big.equals(small[["term", "doc_freq", "total_tf"]])

    g = GlobalTermStats(out)
    if g.eager:
        assert np.all(g.terms[:-1] <= g.terms[1:])
    for t in ("alpha", "common", "doc3", "zzz-missing"):
        want = (0, 0)
        row = small[small.term == t]
        if len(row):
            want = (int(row.doc_freq.iloc[0]), int(row.total_tf.iloc[0]))
        assert g.lookup(t) == want


def test_searcher_scores_identical_with_distributed_dict(small_index, ray_session):
    from lucene_ray.pipelines.index_pipeline import build_term_stats
    from lucene_ray.searcher import IndexSearcher
    from lucene_ray.state.manifest import Manifest

    man = Manifest.load(small_index)
    s1 = IndexSearcher(small_index, mode="exact")
    before = [(sd.doc_key, round(sd.score, 6))
              for sd in s1.search("alpha common", k=10).score_docs]

    ts = os.path.join(small_index, f"term_stats-{man.gen}.parquet")
    os.remove(ts)
    build_term_stats(small_index, man, small_dict_limit=0)
    s2 = IndexSearcher(small_index, mode="exact")
    after = [(sd.doc_key, round(sd.score, 6))
             for sd in s2.search("alpha common", k=10).score_docs]
    assert before == after

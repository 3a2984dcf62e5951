"""Scale guards on the near-dup pipelines: degenerate buckets must be
dropped (capped) instead of emitting O(bucket²) candidate pairs, while
normal-size clusters keep full recall."""

import numpy as np
import pytest
import ray


def _emb_ds(n_cluster: int, n_noise: int, dim: int = 16, seed: int = 7):
    rng = np.random.default_rng(seed)
    base = rng.standard_normal(dim)
    rows = []
    for i in range(n_cluster):
        rows.append({"vec_id": i, "embedding": base.tolist()})
    for i in range(n_noise):
        rows.append({"vec_id": n_cluster + i,
                     "embedding": rng.standard_normal(dim).tolist()})
    return ray.data.from_items(rows)


def test_embedding_lsh_bucket_cap_drops_degenerate_cluster(ray_session):
    from lucene_ray.pipelines.dedup import embedding_near_dup_pairs

    # 60 identical vectors with a tiny cap: every band bucket exceeds the
    # cap, so the candidate stage emits ZERO pairs instead of 60*59/2
    out = embedding_near_dup_pairs(
        _emb_ds(60, 20), threshold=0.99, max_bucket=10
    ).to_pandas()
    assert len(out) == 0


def test_embedding_lsh_normal_cluster_full_recall(ray_session):
    from lucene_ray.pipelines.dedup import embedding_near_dup_pairs

    n = 12
    out = embedding_near_dup_pairs(
        _emb_ds(n, 40), threshold=0.99, max_bucket=500
    ).to_pandas()
    # identical vectors collide in every band -> all n*(n-1)/2 pairs, exact
    assert len(out) == n * (n - 1) // 2
    assert (out.cosine >= 0.999999).all()


def test_embedding_lsh_band_hash_width(ray_session):
    """Defaults must use >=16-bit band hashes (256-bucket bands decay toward
    all-pairs at corpus scale)."""
    import inspect

    from lucene_ray.pipelines.dedup import embedding_near_dup_pairs

    sig = inspect.signature(embedding_near_dup_pairs)
    n_bits = sig.parameters["n_bits"].default
    bands = sig.parameters["bands"].default
    assert n_bits // bands >= 16


def test_simhash_bucket_cap(ray_session):
    from lucene_ray.pipelines.dedup import simhash_near_pairs

    # 40 identical texts: one degenerate bucket per chunk. A small cap must
    # suppress the quadratic pair emission entirely.
    rows = [{"doc_id": i, "text": "the same boilerplate text again and again"}
            for i in range(40)]
    ds = ray.data.from_items(rows)
    capped = simhash_near_pairs(ds, max_bucket=10).to_pandas()
    assert len(capped) == 0
    full = simhash_near_pairs(ds, max_bucket=500).to_pandas()
    assert len(full) == 40 * 39 // 2
    assert (full.hamming == 0).all()


def test_minhash_pair_dedup_vectorized_distinct(ray_session):
    """distinct_rows: the vectorized pair dedup keeps exactly one row per
    (id_a, id_b) across partitions."""
    from lucene_ray.pipelines.dedup import distinct_rows

    rows = [{"id_a": i % 7, "id_b": (i % 7) + 1} for i in range(200)]
    out = distinct_rows(ray.data.from_items(rows), ["id_a", "id_b"]).to_pandas()
    assert len(out) == 7
    assert set(zip(out.id_a, out.id_b)) == {(i, i + 1) for i in range(7)}

"""GeoPolygonQuery: ray-casting containment (incl. holes and non-convex
rings) against a brute-force check, on top of the kd-tree prune."""

import numpy as np
import pytest
import ray


@pytest.fixture()
def geo_idx(tmp_path, ray_session):
    import pyarrow as pa

    from lucene_ray.pipelines.index_pipeline import build_index

    rng = np.random.default_rng(9)
    n = 500
    rows = [{"url": f"u{i:03d}", "text": f"doc {i}",
             "lat": float(rng.uniform(-10, 10)), "lon": float(rng.uniform(-10, 10))}
            for i in range(n)]
    idx = str(tmp_path / "geo")
    build_index(ray.data.from_items(rows), idx, key_col="url",
                text_col="text", num_partitions=2,
                docvalue_cols=("lat", "lon"))
    return idx, rows


def _brute(rows, rings):
    from lucene_ray.functions.points import polygon_contains

    lat = np.array([r["lat"] for r in rows])
    lon = np.array([r["lon"] for r in rows])
    keep = polygon_contains(lat, lon, rings)
    return {rows[i]["url"] for i in np.flatnonzero(keep)}


def test_polygon_simple_and_nonconvex(geo_idx, ray_session):
    from lucene_ray.query import GeoPolygonQuery
    from lucene_ray.searcher import IndexSearcher

    idx, rows = geo_idx
    s = IndexSearcher(idx)
    # non-convex "L" shape
    ring = [(-5.1, -5.2), (5.3, -5.4), (5.5, 0.1), (0.2, 0.3),
            (0.4, 5.6), (-5.7, 5.8)]
    q = GeoPolygonQuery("lat", "lon", [ring])
    got = {sd.doc_key for sd in s.search(q, k=1000).score_docs}
    assert got == _brute(rows, [ring])
    assert len(got) > 0


def test_polygon_with_hole(geo_idx, ray_session):
    from lucene_ray.query import GeoPolygonQuery
    from lucene_ray.searcher import IndexSearcher

    idx, rows = geo_idx
    s = IndexSearcher(idx)
    outer = [(-8.1, -8.2), (8.3, -8.4), (8.5, 8.6), (-8.7, 8.8)]
    hole = [(-3.1, -3.2), (3.3, -3.4), (3.5, 3.6), (-3.7, 3.8)]
    rings = [outer, hole]
    q = GeoPolygonQuery("lat", "lon", rings)
    got = {sd.doc_key for sd in s.search(q, k=1000).score_docs}
    want = _brute(rows, rings)
    assert got == want
    # the hole actually excludes something
    full = _brute(rows, [outer])
    assert want < full


def test_polygon_validation(ray_session):
    from lucene_ray.query import GeoPolygonQuery

    with pytest.raises(ValueError):
        GeoPolygonQuery("lat", "lon", [[(0, 0), (1, 1)]])


def test_kd_index_nd_matches_brute_force(ray_session):
    from lucene_ray.functions.points import KDIndexND

    rng = np.random.default_rng(3)
    n = 5000
    cols = [rng.uniform(-100, 100, n) for _ in range(3)]
    ids = np.arange(n, dtype=np.int32)
    kd = KDIndexND(cols, ids)
    for trial in range(10):
        lows = rng.uniform(-100, 0, 3)
        highs = lows + rng.uniform(10, 120, 3)
        got, examined = kd.box(lows, highs)
        m = np.ones(n, bool)
        for c, lo, hi in zip(cols, lows, highs):
            m &= (c >= lo) & (c <= hi)
        assert np.array_equal(got, np.flatnonzero(m).astype(np.int32))
        assert examined < n


def test_point_nd_query(tmp_path, ray_session):
    from lucene_ray.pipelines.index_pipeline import build_index
    from lucene_ray.query import PointNDRangeQuery
    from lucene_ray.searcher import IndexSearcher

    rng = np.random.default_rng(4)
    rows = [{"url": f"u{i:03d}", "text": "w",
             "a": float(rng.uniform(0, 10)), "b": float(rng.uniform(0, 10)),
             "c": float(rng.uniform(0, 10))} for i in range(400)]
    idx = str(tmp_path / "nd")
    build_index(ray.data.from_items(rows), idx, key_col="url",
                text_col="text", num_partitions=2,
                docvalue_cols=("a", "b", "c"))
    s = IndexSearcher(idx)
    q = PointNDRangeQuery(("a", "b", "c"), (2, None, 0), (8, 5, None))
    got = {sd.doc_key for sd in s.search(q, k=1000).score_docs}
    want = {r["url"] for r in rows
            if 2 <= r["a"] <= 8 and r["b"] <= 5}
    assert got == want and got

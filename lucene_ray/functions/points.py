"""2-D point index — the BKD tree analogue for multidimensional ranges.

Reference: util/bkd/BKDWriter.java:76 builds a balanced k-d tree over packed
point values (leaf blocks of ~512 points, split dimension by widest spread),
queried by PointRangeQuery with CELL_INSIDE / CELL_CROSSES pruning. This is
the same structure in numpy: median splits on the wider dimension, an
implicit array-backed tree, leaves ≤ ``LEAF_SIZE`` filtered vectorized, and
inner cells pruned (or bulk-accepted) against the query box — so a box
query touches O(boundary cells + hits) points, not O(n).

Pure kernel; built lazily per SegmentReader column pair (like
``numeric_index``) and cached.
"""

from __future__ import annotations

import numpy as np

LEAF_SIZE = 512


class KDIndex:
    """Array-backed balanced 2-d tree over (x, y) with payload docIDs."""

    __slots__ = ("xs", "ys", "ids", "nodes")

    def __init__(self, xs: np.ndarray, ys: np.ndarray, ids: np.ndarray):
        self.xs = np.asarray(xs, dtype=np.float64).copy()
        self.ys = np.asarray(ys, dtype=np.float64).copy()
        self.ids = np.asarray(ids, dtype=np.int32).copy()
        # nodes: list of (lo, hi, dim, split_val, left, right); leaf => dim=-1
        self.nodes: list[tuple] = []
        if len(xs):
            self._build(0, len(xs))

    def _build(self, lo: int, hi: int) -> int:
        me = len(self.nodes)
        self.nodes.append(None)  # placeholder
        if hi - lo <= LEAF_SIZE:
            self.nodes[me] = (lo, hi, -1, 0.0, -1, -1)
            return me
        xs, ys = self.xs[lo:hi], self.ys[lo:hi]
        dim = 0 if (xs.max() - xs.min()) >= (ys.max() - ys.min()) else 1
        vals = xs if dim == 0 else ys
        mid = (hi - lo) // 2
        part = np.argpartition(vals, mid)
        # apply the permutation to the slice in place
        for arr in (self.xs, self.ys, self.ids):
            arr[lo:hi] = arr[lo:hi][part]
        split_val = float((self.xs if dim == 0 else self.ys)[lo + mid])
        left = self._build(lo, lo + mid)
        right = self._build(lo + mid, hi)
        self.nodes[me] = (lo, hi, dim, split_val, left, right)
        return me

    def box(self, x0: float, x1: float, y0: float, y1: float):
        """docIDs with x0 ≤ x ≤ x1 and y0 ≤ y ≤ y1 (sorted), plus the number
        of points actually examined (pruning telemetry)."""
        if not len(self.xs):
            return np.empty(0, dtype=np.int32), 0
        out: list[np.ndarray] = []
        examined = 0
        # per-node bounding boxes tracked during descent (root = infinite)
        stack = [(0, -np.inf, np.inf, -np.inf, np.inf)]
        while stack:
            ni, bx0, bx1, by0, by1 = stack.pop()
            lo, hi, dim, sv, left, right = self.nodes[ni]
            if bx0 > x1 or bx1 < x0 or by0 > y1 or by1 < y0:
                continue  # CELL_OUTSIDE
            if x0 <= bx0 and bx1 <= x1 and y0 <= by0 and by1 <= y1:
                out.append(self.ids[lo:hi])  # CELL_INSIDE: bulk accept
                continue
            if dim < 0:  # leaf: vectorized filter
                xs, ys = self.xs[lo:hi], self.ys[lo:hi]
                examined += hi - lo
                m = (xs >= x0) & (xs <= x1) & (ys >= y0) & (ys <= y1)
                if m.any():
                    out.append(self.ids[lo:hi][m])
                continue
            if dim == 0:
                stack.append((left, bx0, sv, by0, by1))
                stack.append((right, sv, bx1, by0, by1))
            else:
                stack.append((left, bx0, bx1, by0, sv))
                stack.append((right, bx0, bx1, sv, by1))
        if not out:
            return np.empty(0, dtype=np.int32), examined
        return np.sort(np.concatenate(out)), examined


class KDIndexND:
    """General N-dimensional balanced k-d tree — the full BKD analogue
    (util/bkd/BKDWriter.java handles 1..8 index dims; this is the same
    median-split-on-widest-spread structure for arbitrary N, with
    CELL_INSIDE bulk-accept / CELL_OUTSIDE prune / leaf vectorized filter).
    The 2-D :class:`KDIndex` stays as the specialized hot path."""

    __slots__ = ("vals", "ids", "nodes", "ndim")

    def __init__(self, cols: list[np.ndarray], ids: np.ndarray):
        self.vals = np.stack([np.asarray(c, dtype=np.float64) for c in cols],
                             axis=1).copy()  # (n, d)
        self.ids = np.asarray(ids, dtype=np.int32).copy()
        self.ndim = self.vals.shape[1]
        self.nodes: list[tuple] = []
        if len(self.ids):
            self._build(0, len(self.ids))

    def _build(self, lo: int, hi: int) -> int:
        me = len(self.nodes)
        self.nodes.append(None)
        if hi - lo <= LEAF_SIZE:
            self.nodes[me] = (lo, hi, -1, 0.0, -1, -1)
            return me
        seg = self.vals[lo:hi]
        spreads = seg.max(axis=0) - seg.min(axis=0)
        dim = int(np.argmax(spreads))
        mid = (hi - lo) // 2
        part = np.argpartition(seg[:, dim], mid)
        self.vals[lo:hi] = seg[part]
        self.ids[lo:hi] = self.ids[lo:hi][part]
        split_val = float(self.vals[lo + mid, dim])
        left = self._build(lo, lo + mid)
        right = self._build(lo + mid, hi)
        self.nodes[me] = (lo, hi, dim, split_val, left, right)
        return me

    def box(self, lows, highs):
        """docIDs with lows[d] ≤ x_d ≤ highs[d] for every dimension
        (sorted), plus points examined (pruning telemetry)."""
        lows = np.asarray(lows, dtype=np.float64)
        highs = np.asarray(highs, dtype=np.float64)
        if not len(self.ids):
            return np.empty(0, dtype=np.int32), 0
        out: list[np.ndarray] = []
        examined = 0
        root_lo = np.full(self.ndim, -np.inf)
        root_hi = np.full(self.ndim, np.inf)
        stack = [(0, root_lo, root_hi)]
        while stack:
            ni, blo, bhi = stack.pop()
            lo, hi, dim, sv, left, right = self.nodes[ni]
            if np.any(blo > highs) or np.any(bhi < lows):
                continue  # CELL_OUTSIDE
            if np.all(lows <= blo) and np.all(bhi <= highs):
                out.append(self.ids[lo:hi])  # CELL_INSIDE
                continue
            if dim < 0:  # leaf
                seg = self.vals[lo:hi]
                examined += hi - lo
                m = np.all((seg >= lows) & (seg <= highs), axis=1)
                if m.any():
                    out.append(self.ids[lo:hi][m])
                continue
            llo, lhi = blo, bhi.copy()
            lhi[dim] = sv
            rlo = blo.copy()
            rlo[dim] = sv
            stack.append((left, llo, lhi))
            stack.append((right, rlo, bhi))
        if not out:
            return np.empty(0, dtype=np.int32), examined
        return np.sort(np.concatenate(out)), examined


# ------------------------------------------------------------------- geo

# SloppyMath.TO_METERS (util/SloppyMath.java:200) — mean earth radius.
MEAN_EARTH_RADIUS_M = 6_371_008.7714


def haversine_meters(lat1, lon1, lat2, lon2) -> np.ndarray:
    """Vectorized haversine distance in meters, same op order as the
    reference (util/SloppyMath.java:48-58 haversinSortKey + haversinMeters):
    h = (1-cos Δlat) + cos(lat1)·cos(lat2)·(1-cos Δlon);
    d = R · 2 · asin(min(1, sqrt(h/2)))."""
    x1 = np.radians(np.asarray(lat1, dtype=np.float64))
    x2 = np.radians(np.asarray(lat2, dtype=np.float64))
    h1 = 1.0 - np.cos(x1 - x2)
    h2 = 1.0 - np.cos(np.radians(np.asarray(lon1, dtype=np.float64) - lon2))
    h = h1 + np.cos(x1) * np.cos(x2) * h2
    return MEAN_EARTH_RADIUS_M * 2.0 * np.arcsin(np.minimum(1.0, np.sqrt(h * 0.5)))


def point_in_polygon(xs: np.ndarray, ys: np.ndarray, ring) -> np.ndarray:
    """Vectorized even-odd (ray casting) containment test against one ring
    (geo/Polygon.java contains(): crossing parity of a +x ray). ``ring`` is
    a sequence of (x, y) vertices, implicitly closed. Boundary points follow
    the half-open edge rule (consistent, measure-zero)."""
    xs = np.asarray(xs, dtype=np.float64)
    ys = np.asarray(ys, dtype=np.float64)
    inside = np.zeros(len(xs), dtype=bool)
    vx = np.array([p[0] for p in ring], dtype=np.float64)
    vy = np.array([p[1] for p in ring], dtype=np.float64)
    n = len(vx)
    j = n - 1
    for i in range(n):  # loop over EDGES (few); vectorized over points
        x1, y1, x2, y2 = vx[j], vy[j], vx[i], vy[i]
        j = i
        if y1 == y2:  # horizontal edge never crosses the +x ray rule
            continue
        inside ^= ((y1 > ys) != (y2 > ys)) & (
            xs < (x2 - x1) * (ys - y1) / (y2 - y1) + x1
        )
    return inside


def polygon_contains(xs: np.ndarray, ys: np.ndarray, rings) -> np.ndarray:
    """Containment with holes: inside the outer ring and outside every hole
    (even-odd over all rings — identical parity rule)."""
    inside = point_in_polygon(xs, ys, rings[0])
    for hole in rings[1:]:
        inside &= ~point_in_polygon(xs, ys, hole)
    return inside


def polygon_bounding_box(rings) -> tuple[float, float, float, float]:
    """(x0, x1, y0, y1) of the outer ring — the BKD prune box."""
    vx = [p[0] for p in rings[0]]
    vy = [p[1] for p in rings[0]]
    return min(vx), max(vx), min(vy), max(vy)


def distance_bounding_boxes(lat: float, lon: float, radius_m: float) -> list[tuple]:
    """Lat/lon boxes that fully contain the circle (geo/Rectangle.fromPointDistance
    analogue, conservatively widened): the kd-tree prune set; candidates are
    then verified with :func:`haversine_meters`. Returns one box, or two when
    the circle crosses the antimeridian; boxes are (lat0, lat1, lon0, lon1)."""
    eps = 1e-7  # absorb float rounding — boxes only need to be ⊇ circle
    dlat = np.degrees(radius_m / MEAN_EARTH_RADIUS_M) + eps
    lat0, lat1 = max(-90.0, lat - dlat), min(90.0, lat + dlat)
    # widest parallel inside the box bounds the longitude delta
    max_abs = min(90.0, max(abs(lat0), abs(lat1)))
    c = np.cos(np.radians(max_abs))
    if c <= 1e-9 or radius_m / (MEAN_EARTH_RADIUS_M * c) >= np.pi:
        return [(lat0, lat1, -180.0, 180.0)]  # pole-adjacent: all longitudes
    dlon = np.degrees(radius_m / (MEAN_EARTH_RADIUS_M * c)) + eps
    lon0, lon1 = lon - dlon, lon + dlon
    if lon0 < -180.0 and lon1 > 180.0:
        return [(lat0, lat1, -180.0, 180.0)]
    if lon0 < -180.0:  # crosses the antimeridian going west
        return [(lat0, lat1, -180.0, lon1), (lat0, lat1, lon0 + 360.0, 180.0)]
    if lon1 > 180.0:  # crosses going east
        return [(lat0, lat1, lon0, 180.0), (lat0, lat1, -180.0, lon1 - 360.0)]
    return [(lat0, lat1, lon0, lon1)]

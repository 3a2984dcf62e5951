"""Minimal-interval matching — the spans / intervals proximity operators.

Reference anchors: the classic span family (core/.../search/spans/
SpanNearQuery.java:42 ordered/unordered NEAR with slop, NearSpansOrdered /
NearSpansUnordered) and the intervals module (queries/.../intervals/
IntervalQuery.java:59, Intervals.ordered / Intervals.unordered), whose
semantics are the Clarke–Cormack–Burkowski MINIMAL interval algebra: an
interval over the clause occurrences counts only when no other qualifying
interval is strictly nested inside it.

Kernels are pure per-document functions over sorted position arrays (called
on the docID-conjunction candidates, like the phrase matchers). Matches are
scored the span way: each minimal interval of width ``w = end - start -
(n-1)`` (the slack beyond the n matched positions) contributes
``1/(1+w)`` when ``w <= slop`` — SpanScorer's sloppyFreq accumulation.

Verified against a brute-force enumerator in tests/test_intervals.py.
"""

from __future__ import annotations

import numpy as np


def minimal_intervals_unordered(pos_lists: list[np.ndarray]) -> list[tuple[int, int]]:
    """All minimal [start, end] windows containing ≥1 occurrence of every
    clause at DISTINCT positions, any order (Intervals.unordered /
    NearSpansUnordered non-overlap rule). Pointer sweep collects candidate
    windows (min..max of the cursors, advancing the min cursor); windows
    with any shared cursor position are invalid (a repeated clause term may
    not reuse one occurrence); an exhaustive nesting filter then keeps the
    minimal ones."""
    n = len(pos_lists)
    if n == 0 or any(len(p) == 0 for p in pos_lists):
        return []
    if n == 1:
        return [(int(p), int(p)) for p in pos_lists[0].tolist()]
    idx = [0] * n
    cand: list[tuple[int, int]] = []
    while True:
        cur = [int(pos_lists[k][idx[k]]) for k in range(n)]
        start, end = min(cur), max(cur)
        # a valid unordered match needs DISTINCT positions (non-overlapping
        # subspans, NearSpansUnordered semantics; matters when a clause term
        # repeats and two cursors share one occurrence)
        if len(set(cur)) == n:
            cand.append((start, end))
        k_min = cur.index(start)
        idx[k_min] += 1
        if idx[k_min] >= len(pos_lists[k_min]):
            break
    # keep only MINIMAL windows: no other candidate strictly nested inside
    # (candidates per doc are few; the exhaustive filter avoids relying on
    # monotonicity that distinct-position skipping can break)
    uniq = sorted(set(cand))
    out = [
        (s, e)
        for s, e in uniq
        if not any((s2 >= s and e2 <= e and (s2, e2) != (s, e)) for s2, e2 in uniq)
    ]
    return out


def minimal_intervals_ordered(pos_lists: list[np.ndarray]) -> list[tuple[int, int]]:
    """All minimal [start, end] windows where one occurrence of each clause
    appears in CLAUSE ORDER with strictly increasing positions
    (Intervals.ordered / NearSpansOrdered). For each start occurrence of the
    first clause, chain each later clause to its first position after the
    previous one (minimal end for that start); maximal starts then minimal
    nesting filtering as in the unordered case."""
    n = len(pos_lists)
    if n == 0 or any(len(p) == 0 for p in pos_lists):
        return []
    if n == 1:
        return [(int(p), int(p)) for p in pos_lists[0].tolist()]
    cand: list[tuple[int, int]] = []
    for p0 in pos_lists[0].tolist():
        prev = p0
        ok = True
        for k in range(1, n):
            j = int(np.searchsorted(pos_lists[k], prev, side="right"))
            if j >= len(pos_lists[k]):
                ok = False
                break
            prev = int(pos_lists[k][j])
        if ok:
            cand.append((int(p0), prev))
    out = []
    for i, (s, e) in enumerate(cand):
        nxt = cand[i + 1] if i + 1 < len(cand) else None
        if nxt is not None and nxt[1] <= e:
            continue  # a later (greater-start) chain ends no later: nested
        out.append((s, e))
    return out


def span_near_freq(pos_lists: list[np.ndarray], slop: int, in_order: bool) -> float:
    """SpanNearQuery freq for one doc: Σ 1/(1+width) over minimal intervals
    with slack width = end - start - (n-1) ≤ slop."""
    n = len(pos_lists)
    iv = (
        minimal_intervals_ordered(pos_lists)
        if in_order
        else minimal_intervals_unordered(pos_lists)
    )
    total = 0.0
    for s, e in iv:
        w = max(0, (e - s) - (n - 1))
        if w <= slop:
            total += 1.0 / (1.0 + w)
    return total

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


def _minimal_filter(wins: list[tuple[int, int]]) -> list[tuple[int, int]]:
    """Keep windows with no other window nested inside — O(k log k): sort by
    (start asc, end asc); scanning right-to-left, a window is non-minimal iff
    some window with start ≥ its start has end ≤ its end (other than itself;
    equal-start duplicates keep only the smallest end)."""
    uniq = sorted(set(wins))
    out = []
    min_end = None
    i = len(uniq) - 1
    while i >= 0:
        s0 = uniq[i][0]
        j = i
        while j >= 0 and uniq[j][0] == s0:
            j -= 1
        best = uniq[j + 1]  # smallest end at this start
        if min_end is None or best[1] < min_end:
            out.append(best)
            min_end = best[1]
        i = j
    out.reverse()
    return out


def minimal_intervals_unordered(pos_lists: list[np.ndarray]) -> list[tuple[int, int]]:
    """All minimal [start, end] windows containing one occurrence of every
    clause at DISTINCT positions, any order (Intervals.unordered /
    NearSpansUnordered non-overlap rule).

    Clauses with IDENTICAL position lists (a repeated query term) are grouped:
    a group of multiplicity r contributes a sliding window of r consecutive
    occurrences (the r distinct positions the repeated term must consume —
    the repeat-group treatment, same idea as SloppyPhraseMatcher's
    advanceRepeatGroups). The sweep then advances the group whose window
    starts first; the minimality filter keeps non-nested windows.
    """
    n = len(pos_lists)
    if n == 0 or any(len(p) == 0 for p in pos_lists):
        return []
    # group identical clause lists by content
    groups: list[tuple[np.ndarray, int]] = []
    for p in pos_lists:
        for gi, (gp, r) in enumerate(groups):
            if len(gp) == len(p) and np.array_equal(gp, p):
                groups[gi] = (gp, r + 1)
                break
        else:
            groups.append((p, 1))
    # per-group sliding windows of r consecutive occurrences
    g_start: list[np.ndarray] = []
    g_end: list[np.ndarray] = []
    for gp, r in groups:
        if len(gp) < r:
            return []
        g_start.append(np.asarray(gp[: len(gp) - r + 1], dtype=np.int64))
        g_end.append(np.asarray(gp[r - 1 :], dtype=np.int64))
    idx = [0] * len(groups)
    cand: list[tuple[int, int]] = []
    while True:
        starts = [int(g_start[k][idx[k]]) for k in range(len(groups))]
        ends = [int(g_end[k][idx[k]]) for k in range(len(groups))]
        cand.append((min(starts), max(ends)))
        k_min = starts.index(min(starts))
        idx[k_min] += 1
        if idx[k_min] >= len(g_start[k_min]):
            break
    return _minimal_filter(cand)


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


def minimal_extent_chains_ordered(
    extent_lists: list[list[tuple[int, int]]],
) -> list[tuple[int, int, int]]:
    """Ordered chains over EXTENT clauses — the NearSpansOrdered matcher for
    nested spans (spans/NearSpansOrdered.java): each clause's matches are
    (start, end) extents sorted by start; a chain takes one extent per
    clause with ``next.start > prev.end`` (non-overlapping, in clause
    order), accumulating ``gaps += next.start - prev.end - 1``. For each
    first-clause extent the chain is greedy-minimal (first acceptable
    extent of every later clause); nested chains are filtered like the
    position case. Returns (start, end, total_gaps) triples — point extents
    (p, p) reduce exactly to minimal_intervals_ordered with
    gaps = (end - start) - (n - 1)."""
    n = len(extent_lists)
    if n == 0 or any(len(x) == 0 for x in extent_lists):
        return []
    if n == 1:
        return [(s, e, 0) for s, e in extent_lists[0]]
    starts = [np.asarray([s for s, _ in xs], dtype=np.int64) for xs in extent_lists]
    cand: list[tuple[int, int, int]] = []
    for s0, e0 in extent_lists[0]:
        prev_end = e0
        gaps = 0
        ok = True
        for k in range(1, n):
            j = int(np.searchsorted(starts[k], prev_end, side="right"))
            if j >= len(starts[k]):
                ok = False
                break
            s_k, e_k = extent_lists[k][j]
            gaps += s_k - prev_end - 1
            prev_end = max(prev_end, e_k)
        if ok:
            cand.append((int(s0), int(prev_end), int(gaps)))
    out = []
    for i, (s, e, g) in enumerate(cand):
        nxt = cand[i + 1] if i + 1 < len(cand) else None
        if nxt is not None and nxt[1] <= e:
            continue  # a later (greater-start) chain ends no later: nested
        out.append((s, e, g))
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

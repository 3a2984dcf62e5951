"""Exact sloppy-phrase matching — the reference's interleaving algorithm.

Functional reproduction of search/SloppyPhraseMatcher.java:53-206 (pq-driven
match enumeration, repeat-group collision resolution) + PhraseQueue.java
(ordering by (position, offset, ord)) + PhrasePositions.java (position =
token position − query offset). The sloppy frequency of a doc is
``Σ 1/(1+matchLength)`` over the matches the traversal finds
(sloppyWeight, SloppyPhraseMatcher.java:169-171) — including the documented
traversal-order quirks (the class javadoc's "a b c"~4 vs "c b a"~4 example):
this is LUCENE's sloppy freq, not an idealized all-windows enumeration.

Multi-term (graph) positions are out of scope — each phrase slot holds one
term, so repeat groups are simply slots sharing a term string
(gatherRptGroups' no-multi-term branch, SloppyPhraseMatcher.java:536-561).

Pure kernel: no Ray imports; called per candidate doc (candidates are the
docID conjunction of all phrase terms, usually few).
"""

from __future__ import annotations

import heapq

import numpy as np


class _PP:
    """One phrase slot's position cursor (PhrasePositions analogue)."""

    __slots__ = ("positions", "idx", "position", "offset", "ord", "rpt_group")

    def __init__(self, positions, offset: int, ord_: int):
        self.positions = positions  # sorted absolute token positions
        self.idx = -1
        self.position = 0  # adjusted: token position - offset
        self.offset = offset
        self.ord = ord_
        self.rpt_group = -1

    def first_position(self) -> bool:
        self.idx = -1
        return self.next_position()

    def next_position(self) -> bool:
        self.idx += 1
        if self.idx >= len(self.positions):
            self.idx = len(self.positions) - 1  # stay at last (exhausted)
            return False
        self.position = int(self.positions[self.idx]) - self.offset
        return True

    def key(self):
        return (self.position, self.offset, self.ord)

    def tp_pos(self) -> int:
        return self.position + self.offset


def sloppy_phrase_freq(
    position_lists: list[np.ndarray], offsets: list[int], terms: list[str], slop: int
) -> float:
    """Sloppy freq of ONE document for a phrase query.

    ``position_lists[i]`` = sorted absolute positions of the term in slot i;
    ``offsets[i]`` = the slot's query position; ``terms[i]`` identifies
    repeated slots. Returns 0.0 when no match within ``slop``.
    """
    n = len(position_lists)
    if n == 0:
        return 0.0
    if n == 1:
        # one slot: every occurrence is a zero-length match
        return float(len(position_lists[0]))
    pps = [_PP(position_lists[i], offsets[i], i) for i in range(n)]

    # repeat groups = slots sharing a term, sorted by offset
    # (sortRptGroups, SloppyPhraseMatcher.java:512-529)
    by_term: dict[str, list[_PP]] = {}
    for pp, t in zip(pps, terms):
        by_term.setdefault(t, []).append(pp)
    rpt_groups = [sorted(v, key=lambda p: p.offset) for v in by_term.values() if len(v) > 1]
    for gi, rg in enumerate(rpt_groups):
        for pp in rg:
            pp.rpt_group = gi
    has_rpts = bool(rpt_groups)

    # ---- per-doc init (initPhrasePositions) ----
    for pp in pps:
        if not pp.first_position():
            return 0.0
    if has_rpts:
        # advanceRepeatGroups (no multi-term): j-th pp of a group advances j
        # times so the group starts collision-free
        for rg in rpt_groups:
            for j in range(1, len(rg)):
                for _ in range(j):
                    if not rg[j].next_position():
                        return 0.0
    end = max(pp.position for pp in pps)
    heap = [(pp.key(), pp) for pp in pps]
    heapq.heapify(heap)
    in_queue = set(range(n))

    state = {"end": end}

    def advance_pp(pp: _PP) -> bool:
        if not pp.next_position():
            return False
        if pp.position > state["end"]:
            state["end"] = pp.position
        return True

    def collide(pp: _PP) -> _PP | None:
        tp = pp.tp_pos()
        for pp2 in rpt_groups[pp.rpt_group]:
            if pp2 is not pp and pp2.tp_pos() == tp:
                return pp2
        return None

    def advance_rpts(pp: _PP) -> bool:
        """Resolve repeat collisions caused by advancing ``pp`` by advancing
        the lesser of each colliding pair (advanceRpts, :286-323). Rebuilds
        the heap when an in-queue pp moved (the rptStack re-queue analogue —
        collisions are rare, a full reheap keeps the invariant simply)."""
        if pp.rpt_group < 0:
            return True
        moved_in_queue = False
        cur = pp
        while True:
            other = collide(cur)
            if other is None:
                break
            lesser = (
                cur
                if (cur.position, cur.offset) < (other.position, other.offset)
                else other
            )
            if not advance_pp(lesser):
                return False
            if lesser.ord in in_queue:
                moved_in_queue = True
            cur = lesser
        if moved_in_queue:
            heap[:] = [(p.key(), p) for p in pps if p.ord in in_queue]
            heapq.heapify(heap)
        return True

    # ---- match enumeration (nextMatch, :174-206) ----
    freq = 0.0
    positioned = True
    while positioned:
        _, pp = heapq.heappop(heap)
        in_queue.discard(pp.ord)
        match_length = state["end"] - pp.position
        next_pos = heap[0][1].position
        registered = False
        while advance_pp(pp):
            if has_rpts and not advance_rpts(pp):
                break
            if pp.position > next_pos:  # done minimizing current match-length
                heapq.heappush(heap, (pp.key(), pp))
                in_queue.add(pp.ord)
                if match_length <= slop:
                    freq += 1.0 / (1.0 + match_length)
                    registered = True
                    break
                _, pp = heapq.heappop(heap)
                in_queue.discard(pp.ord)
                next_pos = heap[0][1].position
                match_length = state["end"] - pp.position
            else:
                ml2 = state["end"] - pp.position
                if ml2 < match_length:
                    match_length = ml2
        else:
            # advance_pp returned False: exhausted — final match attempt
            positioned = False
            if match_length <= slop:
                freq += 1.0 / (1.0 + match_length)
            break
        if not registered:
            # advance_rpts exhausted mid-resolution
            positioned = False
            if match_length <= slop:
                freq += 1.0 / (1.0 + match_length)
            break
        # registered a match: continue enumerating from the queue
    return freq

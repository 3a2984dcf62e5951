"""Wildcard automaton + dictionary intersection — the reference's
CompiledAutomaton term enumeration re-expressed over a sorted Arrow term
dictionary.

Reference anchors:
* ``core/src/java/org/apache/lucene/util/automaton/CompiledAutomaton.java:219``
  (``getTermsEnum``) — pattern queries don't scan the dictionary linearly;
  they INTERSECT the automaton with it: walk a term through the DFA, and on
  rejection seek (here: binary-search) to the smallest possible next
  accepted string, hopping over whole rejected ranges.
* ``core/.../search/AutomatonTermsEnum.java:46`` (``nextSeekTerm`` /
  ``nextString``) — the backtracking construction of that next candidate:
  deepest position whose state has a viable transition on a larger
  character, preferring pure extension when the whole term was consumed.

The automaton here is the WILDCARD NFA (tokens: literal, ``?``, ``*``)
simulated as position sets — subset construction on the fly, no explicit
DFA materialization (wildcard NFAs are tiny; the position-set transition is
O(pattern) per char).

Candidate-prefix correctness (the skip's safety argument): for a rejected
term ``t``, every accepted string ``s > t`` either extends ``t`` (then
``s ≥ t + c_min``) or shares ``t[:j]`` and has ``s[j] > t[j]`` at a
position ``j`` where the walk was still alive (then ``s ≥ t[:j] + c`` for
the smallest viable ``c > t[j]``). Taking the DEEPEST viable position gives
the least such bound, so a left-bisect to it can never overshoot a match.
"""

from __future__ import annotations

import numpy as np

__all__ = ["WildcardAutomaton", "LevenshteinAutomaton",
           "intersect_dictionary", "required_char_vec"]

_MAX_CP = 0x10FFFF


def _parse_wildcard(pattern: str) -> list[tuple]:
    """Pattern → token list: ('lit', ch) | ('any',) | ('star',).
    ``\\x`` escapes to literal x (WildcardQuery.java escape rules)."""
    toks: list[tuple] = []
    i = 0
    while i < len(pattern):
        c = pattern[i]
        if c == "\\" and i + 1 < len(pattern):
            toks.append(("lit", pattern[i + 1]))
            i += 2
        elif c == "?":
            toks.append(("any",))
            i += 1
        elif c == "*":
            # collapse runs of * (equivalent, keeps the NFA minimal)
            if not toks or toks[-1] != ("star",):
                toks.append(("star",))
            i += 1
        else:
            toks.append(("lit", c))
            i += 1
    return toks


class WildcardAutomaton:
    """Position-set NFA for one wildcard pattern."""

    def __init__(self, pattern: str):
        self.pattern = pattern
        self.toks = _parse_wildcard(pattern)
        self.m = len(self.toks)

    def _closure(self, states: frozenset) -> frozenset:
        out = set(states)
        stack = list(states)
        while stack:
            p = stack.pop()
            if p < self.m and self.toks[p] == ("star",) and p + 1 not in out:
                out.add(p + 1)
                stack.append(p + 1)
        return frozenset(out)

    def start(self) -> frozenset:
        return self._closure(frozenset([0]))

    def step(self, states: frozenset, ch: str) -> frozenset:
        nxt = set()
        for p in states:
            if p >= self.m:
                continue
            t = self.toks[p]
            if t == ("star",):
                nxt.add(p)  # self-loop consumes ch
            elif t == ("any",) or t == ("lit", ch):
                nxt.add(p + 1)
        return self._closure(frozenset(nxt))

    def accepts_from(self, states: frozenset) -> bool:
        return self.m in states

    def run(self, term: str) -> bool:
        s = self.start()
        for ch in term:
            s = self.step(s, ch)
            if not s:
                return False
        return self.accepts_from(s)

    def _min_viable_char(self, states: frozenset, above: str | None):
        """Smallest character (strictly greater than ``above`` when given)
        with a live transition from ``states``. Every position can still
        reach accept in a wildcard NFA, so liveness = transition exists."""
        floor_cp = -1 if above is None else ord(above)
        best = None
        for p in states:
            if p >= self.m:
                continue
            t = self.toks[p]
            if t[0] == "lit":
                if ord(t[1]) > floor_cp and (best is None or t[1] < best):
                    best = t[1]
            else:  # any / star: every char works
                if floor_cp + 1 <= _MAX_CP:
                    c = chr(floor_cp + 1)
                    if best is None or c < best:
                        best = c
        return best

    def next_candidate(self, term: str) -> str | None:
        """Smallest string ``p > term`` such that every accepted string
        ``> term`` is ``≥ p`` (AutomatonTermsEnum.nextString). None = no
        accepted string follows."""
        states = self.start()
        path = [states]
        depth = 0
        for ch in term:
            nxt = self.step(states, ch)
            if not nxt:
                break
            states = nxt
            path.append(nxt)
            depth += 1
        if depth == len(term):
            c = self._min_viable_char(path[depth], None)
            if c is not None:
                return term + c
        # replacement at position i (deepest first): term[:i] + c, c > term[i]
        for i in range(min(depth, len(term) - 1), -1, -1):
            c = self._min_viable_char(path[i], term[i])
            if c is not None:
                return term[:i] + c
        return None


class LevenshteinAutomaton:
    """Levenshtein automaton for FuzzyQuery term enumeration — the machine
    the reference compiles in
    ``core/.../util/automaton/LevenshteinAutomata.java:31`` and drives
    through the dictionary via ``FuzzyTermsEnum``. Here the NFA state set
    after consuming a prefix is represented by its canonical form: the
    banded-DP row vector ``v`` where ``v[i]`` = min edits aligning
    ``base[:i]`` against the consumed input, capped at ``k+1`` (the
    standard subsumption (i,e) ⊑ (i,e') for e' > e collapses the subset
    construction to exactly this row). ``run`` is therefore EXACT —
    acceptance ⇔ edit distance ≤ k — and the final row entry is the
    distance itself (``distance()``). Plain Levenshtein, matching the
    engine's FuzzyQuery semantics (transpositions=false).

    ``next_candidate`` viability: if any row entry is < k, every next
    character keeps the row alive (substitution/insertion budget remains),
    so the smallest char above the floor is viable; when the row minimum
    equals k only exact matches ``base[i]`` at positions with ``v[i]==k``
    survive — that asymmetry is what makes the hops long once the budget
    is spent."""

    def __init__(self, base: str, max_edits: int):
        self.base = base
        self.n = len(base)
        self.k = max_edits
        self.dead = max_edits + 1

    def start(self) -> tuple:
        return tuple(min(i, self.dead) for i in range(self.n + 1))

    def step(self, v: tuple, ch: str) -> tuple | None:
        k, dead, base = self.k, self.dead, self.base
        nv = [min(v[0] + 1, dead)]
        alive = nv[0] <= k
        for i in range(1, self.n + 1):
            c = min(v[i] + 1, nv[i - 1] + 1,
                    v[i - 1] + (0 if base[i - 1] == ch else 1), dead)
            nv.append(c)
            alive = alive or c <= k
        return tuple(nv) if alive else None

    def accepts_from(self, v: tuple) -> bool:
        return v[self.n] <= self.k

    def run(self, term: str) -> bool:
        v = self.start()
        for ch in term:
            v = self.step(v, ch)
            if v is None:
                return False
        return self.accepts_from(v)

    def distance(self, term: str) -> int:
        """Exact edit distance if ≤ k else -1 (same walk as ``run``)."""
        v = self.start()
        for ch in term:
            v = self.step(v, ch)
            if v is None:
                return -1
        d = v[self.n]
        return d if d <= self.k else -1

    def _min_viable_char(self, v: tuple, above: str | None):
        floor_cp = -1 if above is None else ord(above)
        if min(v) < self.k:  # budget remains: any character is viable
            return chr(floor_cp + 1) if floor_cp + 1 <= _MAX_CP else None
        best = None
        for i in range(self.n):
            if v[i] == self.k:
                c = self.base[i]
                if ord(c) > floor_cp and (best is None or c < best):
                    best = c
        return best

    def next_candidate(self, term: str) -> str | None:
        """Smallest lower bound > term on the next accepted string
        (AutomatonTermsEnum.nextString, same contract as
        WildcardAutomaton.next_candidate)."""
        v = self.start()
        path = [v]
        depth = 0
        for ch in term:
            nxt = self.step(v, ch)
            if nxt is None:
                break
            v = nxt
            path.append(nxt)
            depth += 1
        if depth == len(term):
            c = self._min_viable_char(path[depth], None)
            if c is not None:
                return term + c
        for i in range(min(depth, len(term) - 1), -1, -1):
            c = self._min_viable_char(path[i], term[i])
            if c is not None:
                return term[:i] + c
        return None


def intersect_dictionary(reader, fp: str, auto: WildcardAutomaton,
                         lo: int, hi: int) -> tuple[list[int], int]:
    """Enumerate dictionary indices in [lo, hi) whose term (minus the field
    prefix ``fp``) the automaton accepts, hopping rejected ranges via
    bisect-to-next-candidate. Returns (matching indices, terms examined)."""
    idxs: list[int] = []
    examined = 0
    i = lo
    nfp = len(fp)
    while i < hi:
        term = reader.term_at(i)[nfp:]
        examined += 1
        if auto.run(term):
            idxs.append(i)
            i += 1
            continue
        nxt = auto.next_candidate(term)
        if nxt is None:
            break
        j = reader.bisect(fp + nxt, side="left")
        i = max(j, i + 1)
    return idxs, examined


def required_char_vec(pattern: str) -> np.ndarray | None:
    """Lower-bound character histogram every wildcard match must dominate
    (the literal tokens survive in any match — ``*``/``?`` only add). Used
    as a vectorized prefilter over the per-segment ``char_counts`` table
    for patterns whose literal prefix can't bound the scan window (leading
    wildcards) — the same counting-filter trick the fuzzy path uses."""
    from lucene_ray.state.segment import char_count_vec

    lits = "".join(t[1] for t in _parse_wildcard(pattern) if t[0] == "lit")
    if not lits:
        return None
    return char_count_vec(lits)


def regex_required_char_vec(pattern: str) -> np.ndarray | None:
    """Conservative required-char histogram for a SIMPLE regexp: literals
    not made optional by a following ``*`` or ``?``. Bails out (None) on
    any construct whose semantics could make a literal optional
    (alternation, groups, classes, escapes, bounded repeats) — a wrongly
    required char would drop real matches, so only the provable cases
    count."""
    from lucene_ray.state.segment import char_count_vec

    if any(c in pattern for c in "[](){}|\\^$"):
        return None
    req = []
    for i, c in enumerate(pattern):
        if c in ".*?+":
            continue
        nxt = pattern[i + 1] if i + 1 < len(pattern) else ""
        if nxt in "*?":
            continue  # optional occurrence
        req.append(c)
    if not req:
        return None
    return char_count_vec("".join(req))

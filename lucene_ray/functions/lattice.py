"""Shared Viterbi lattice for the dictionary-driven CJK segmenters
(kuromoji-lite ja, nori-lite ko, smartcn-lite zh). One DP + backtrace;
each tokenizer supplies its language's arcs. Mirrors the reference's
ViterbiNBest/ConnectionCosts shape with connection costs folded to zero
(the reduced public dictionaries carry no POS matrix) — see
analysis/kuromoji/src/java/.../ja/JapaneseTokenizer.java:95 (the lattice
loop) and analysis/nori/.../ko/KoreanTokenizer.java."""

from __future__ import annotations

__all__ = ["viterbi_segment",
           "USER_COST", "KNOWN_COST", "UNK_CHAR_COST",
           "UNK_GROUP_BASE", "UNK_GROUP_PER_CHAR"]

# shared cost model: any user path beats any non-user path; a known word
# beats unknown chars covering the same span; one unknown group arc beats
# a chain of per-char unknown arcs
USER_COST = -100_000        # kuromoji/nori UserDictionary.WORD_COST
KNOWN_COST = 100
UNK_CHAR_COST = 10_000
UNK_GROUP_BASE = 9_000
UNK_GROUP_PER_CHAR = 200


def viterbi_segment(n: int, arcs_at) -> list[tuple[int, int, str, object]]:
    """Minimum-cost segmentation of ``[0, n)``.

    ``arcs_at(i)`` yields ``(length, cost, tag, payload)`` arcs starting at
    position ``i``; at least one arc per reachable position must exist (the
    callers always emit a single-char fallback, which keeps the lattice
    connected). → ``[(start, end, tag, payload)]`` left-to-right."""
    if n == 0:
        return []
    INF = float("inf")
    best = [INF] * (n + 1)
    back: list[tuple | None] = [None] * (n + 1)
    best[0] = 0.0
    for i in range(n):
        if best[i] == INF:
            continue
        base = best[i]
        for ln, cost, tag, payload in arcs_at(i):
            c = base + cost
            j = i + ln
            if c < best[j]:
                best[j] = c
                back[j] = (i, tag, payload)
    spans: list[tuple[int, int, str, object]] = []
    j = n
    while j > 0:
        i, tag, payload = back[j]
        spans.append((i, j, tag, payload))
        j = i
    spans.reverse()
    return spans

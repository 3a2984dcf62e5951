"""Multi-word synonym analysis — SynonymMap + SynonymGraphFilter semantics.

Reference anchors:
* ``analysis/common/src/java/org/apache/lucene/analysis/synonym/SynonymMap.java:42``
  — the compiled input→outputs dictionary (builder dedups, word-splits,
  tracks ``keepOrig``).
* ``analysis/common/.../synonym/SolrSynonymParser.java:30`` — the rule text
  format: ``a, b, c`` equivalence lines (``expand`` controls all↔first) and
  ``i1, i2 => o1, o2`` explicit-mapping lines (origin not kept).
* ``analysis/common/.../synonym/SynonymGraphFilter.java:47`` — token-stream
  rewrite: greedy LONGEST input match at each token (FST longest-only arc,
  no overlap: scanning resumes after a match), matched span replaced by a
  token GRAPH — alternative paths between the span's start and end nodes,
  multi-token alternatives chained through freshly allocated nodes.
* ``core/src/java/org/apache/lucene/util/QueryBuilder.java:547``
  (``analyzeGraphBoolean``) — query-side graph consumption: split the graph
  at articulation points, emit one clause per component (TermQuery /
  SynonymQuery for single-position components, SHOULD-of-path-PhraseQueries
  for side-path components), combine components with the default operator.
* ``analysis/common/.../core/FlattenGraphFilter.java:38`` — index-time
  squash of the graph back to a linear position column (positions = dense
  rank of each token's start node).

The filter here operates on already-tokenized term lists (this engine
tokenizes batch-vectorized in Arrow; the synonym rewrite is the one
genuinely sequential per-doc stage, exactly as in the reference where the
FST matcher consumes the stream token by token).
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

__all__ = [
    "SynonymMap",
    "SynToken",
    "synonym_graph",
    "flatten_graph",
    "analyze_graph_query",
    "expand_synonyms_batch",
]


@dataclass(frozen=True)
class SynToken:
    """One token of a synonym graph: an edge from ``start`` to ``end`` node.

    ``position`` (Lucene posIncr bookkeeping) is the start node; posLen is
    ``end - start``."""

    term: str
    start: int
    end: int


class SynonymMap:
    """Input token-sequence → list of output token-sequences (+ keepOrig).

    ``add`` mirrors SynonymMap.Builder.add (SynonymMap.java:90-150): inputs
    and outputs are tuples of already-analyzed terms; duplicate outputs for
    an input are dedup'd, and ``keep_orig`` is OR-ed per input (the builder
    keeps the original if ANY rule for that input asked to).
    """

    def __init__(self):
        self._map: dict[tuple, list[tuple]] = {}
        self._keep: dict[tuple, bool] = {}
        self.max_input_len = 0

    def add(self, input_tokens, output_tokens, keep_orig: bool = False):
        inp = tuple(input_tokens)
        out = tuple(output_tokens)
        if not inp or not out:
            raise ValueError("empty synonym input/output")
        if out != inp and out not in self._map.setdefault(inp, []):
            self._map[inp].append(out)
        else:
            self._map.setdefault(inp, [])
        self._keep[inp] = self._keep.get(inp, False) or keep_orig
        self.max_input_len = max(self.max_input_len, len(inp))
        return self

    def lookup(self, inp: tuple):
        """(outputs, keep_orig) or None."""
        if inp in self._map:
            return self._map[inp], self._keep[inp]
        return None

    def __len__(self):
        return len(self._map)

    def items(self):
        for inp, outs in self._map.items():
            yield inp, outs, self._keep[inp]

    @classmethod
    def parse(cls, rules, *, expand: bool = True, analyzer=None) -> "SynonymMap":
        """Solr rule format (SolrSynonymParser.java:30-66).

        ``rules`` is a string (newline-separated) or list of lines. ``#``
        starts a comment. Each side splits on ``,``; each entry splits on
        whitespace into a multi-word sequence. With ``=>``: every left entry
        maps to all right entries, origin NOT kept. Without: equivalence —
        ``expand=True`` maps every entry to every entry (origin kept);
        ``expand=False`` maps every entry to the FIRST entry only.
        ``analyzer`` (optional) normalizes each word via ``.normalize``.
        """
        m = cls()

        def norm(word: str) -> str:
            return analyzer.normalize(word) if analyzer is not None else word

        def entries(side: str) -> list[tuple]:
            out = []
            for e in side.split(","):
                words = tuple(norm(w) for w in e.split())
                if words:
                    out.append(words)
            return out

        if isinstance(rules, str):
            rules = rules.splitlines()
        for line in rules:
            line = line.split("#", 1)[0].strip()
            if not line:
                continue
            if "=>" in line:
                lhs, rhs = line.split("=>", 1)
                ins, outs = entries(lhs), entries(rhs)
                if not ins or not outs:
                    raise ValueError(f"bad synonym rule: {line!r}")
                for i in ins:
                    for o in outs:
                        m.add(i, o, keep_orig=False)
            else:
                ent = entries(line)
                if len(ent) < 2:
                    raise ValueError(f"bad synonym rule: {line!r}")
                if expand:
                    for i in ent:
                        for o in ent:
                            if o != i:
                                m.add(i, o, keep_orig=True)
                else:
                    first = ent[0]
                    for i in ent[1:]:
                        m.add(i, first, keep_orig=False)
        return m


def synonym_graph(tokens, synmap: SynonymMap) -> list[SynToken]:
    """SynonymGraphFilter over a token list → graph tokens (edges).

    Greedy longest match at each token (SynonymGraphFilter.java matches the
    longest FST input; after a match the scan resumes past the matched
    span — no overlapping matches). For a match: the BACKBONE path (the
    original tokens if keepOrig, else the first output) allocates the span's
    nodes; every other alternative path chains through fresh nodes between
    the same start and end, so posIncr/posLen consumers and path
    enumerators see the exact reference graph shape.

    Node ids are allocated so that EVERY edge goes low→high (numeric order
    is a topological order): a span's backbone gets ``start..start+B-1``
    plus the shared ``end``; each multi-token alternative's internal nodes
    get fresh consecutive ids strictly between ``start`` and ``end``. This
    keeps the downstream component split and flatten O(nodes) with plain
    arrays — no relabeling pass.
    """
    tokens = list(tokens)
    out: list[SynToken] = []
    n = len(tokens)
    i = 0
    cur = 0

    while i < n:
        hit = None
        for L in range(min(synmap.max_input_len, n - i), 0, -1):
            r = synmap.lookup(tuple(tokens[i : i + L]))
            if r is not None:
                hit = (L, r[0], r[1])
                break
        if hit is None:
            out.append(SynToken(tokens[i], cur, cur + 1))
            i += 1
            cur += 1
            continue
        L, outputs, keep = hit
        paths = list(outputs)
        if keep:
            backbone = tuple(tokens[i : i + L])
            alts = paths
        elif paths:
            backbone = paths[0]
            alts = paths[1:]
        else:  # degenerate: rule whose only output was the identity
            backbone = tuple(tokens[i : i + L])
            alts = []
        start = cur
        n_internal = (len(backbone) - 1) + sum(len(a) - 1 for a in alts)
        end = start + n_internal + 1
        node = start
        for j, t in enumerate(backbone):
            nxt = end if j == len(backbone) - 1 else node + 1
            out.append(SynToken(t, node, nxt))
            node = nxt
        fresh = start + len(backbone)  # first id after backbone internals
        for alt in alts:
            prev = start
            for j, t in enumerate(alt):
                if j == len(alt) - 1:
                    out.append(SynToken(t, prev, end))
                else:
                    out.append(SynToken(t, prev, fresh))
                    prev = fresh
                    fresh += 1
        cur = end
        i += L
    return out


def flatten_graph(graph: list[SynToken]) -> list[tuple]:
    """FlattenGraphFilter: squash a token graph to linear (term, position)
    pairs for indexing — position = dense rank of the token's start node
    (side-path intermediate nodes get their own inserted positions, exactly
    like the reference's re-numbered output positions)."""
    if not graph:
        return []
    starts = sorted({t.start for t in graph})
    rank = {s: i for i, s in enumerate(starts)}
    return [(t.term, rank[t.start]) for t in
            sorted(graph, key=lambda t: (t.start, t.end, t.term))]


def _components(graph: list[SynToken], n_nodes: int):
    """Split the graph DAG at articulation nodes (nodes no edge spans
    across) — QueryBuilder.analyzeGraphBoolean's component walk."""
    crossed = np.zeros(n_nodes + 1, dtype=bool)
    for t in graph:
        if t.end - t.start > 1:
            crossed[t.start + 1 : t.end] = True
    cuts = [i for i in range(n_nodes + 1) if not crossed[i]]
    comps = []
    for a, b in zip(cuts, cuts[1:]):
        edges = [t for t in graph if a <= t.start and t.end <= b]
        if edges:
            comps.append((a, b, edges))
    return comps


def _paths(edges: list[SynToken], start: int, end: int, cap: int = 128):
    """All term paths start→end (DFS, capped — graph queries in the
    reference also bound expansion via maxDeterminizedStates)."""
    by_start: dict[int, list[SynToken]] = {}
    for e in edges:
        by_start.setdefault(e.start, []).append(e)
    results: list[tuple] = []

    def walk(node, acc):
        if len(results) >= cap:
            return
        if node == end:
            results.append(tuple(acc))
            return
        for e in by_start.get(node, ()):
            walk(e.end, acc + [e.term])

    walk(start, [])
    return results


def analyze_graph_query(text: str, synmap: SynonymMap, *, analyzer=None,
                        field: str | None = None,
                        default_operator: str = "or"):
    """Query-time SynonymGraphFilter + QueryBuilder.analyzeGraphBoolean
    (QueryBuilder.java:547-613): tokenize → synonym graph → one clause per
    articulation component — TermQuery for a lone term, SynonymQuery for a
    single-position fan (same start AND end), SHOULD-of-paths (TermQuery /
    PhraseQuery per path) when side paths diverge — combined with the
    default operator."""
    from lucene_ray.functions.analysis import get_analyzer
    from lucene_ray.query import (BooleanQuery, PhraseQuery, SynonymQuery,
                                  TermQuery)

    an = analyzer if analyzer is not None else get_analyzer("standard")
    tokens = [t for t, _ in an.tokenize_one(text)]
    graph = synonym_graph(tokens, synmap)
    if not graph:
        return BooleanQuery()
    n_nodes = max(t.end for t in graph)
    clauses = []
    for a, b, edges in _components(graph, n_nodes):
        whole = [e for e in edges if e.start == a and e.end == b]
        if len(edges) == 1:
            e = edges[0]
            clauses.append(TermQuery(e.term, field=field))
        elif len(whole) == len(edges):
            clauses.append(SynonymQuery(sorted({e.term for e in edges})))
        else:
            alts = []
            for p in _paths(edges, a, b):
                if len(p) == 1:
                    alts.append(TermQuery(p[0], field=field))
                else:
                    alts.append(PhraseQuery(list(p), field=field))
            clauses.append(alts[0] if len(alts) == 1
                           else BooleanQuery(should=alts))
    if len(clauses) == 1:
        return clauses[0]
    if default_operator.lower() in ("and", "must"):
        return BooleanQuery(must=clauses)
    return BooleanQuery(should=clauses)


def expand_synonyms_batch(texts, synmap: SynonymMap, *, analyzer=None):
    """Index-time synonym expansion for a batch of documents: per doc,
    tokenize → synonym graph → FlattenGraphFilter positions. Returns
    ``(terms, doc_idx, positions)`` numpy arrays ready for the segment
    builder. The per-doc loop is inherent to stream rewriting (the
    reference's filter is also sequential per document); everything around
    it — tokenization and downstream segment build — stays vectorized."""
    from lucene_ray.functions.analysis import get_analyzer

    an = analyzer if analyzer is not None else get_analyzer("standard")
    out_terms: list[str] = []
    out_doc: list[int] = []
    out_pos: list[int] = []
    for d, text in enumerate(texts):
        toks = [t for t, _ in an.tokenize_one(text)]
        for term, pos in flatten_graph(synonym_graph(toks, synmap)):
            out_terms.append(term)
            out_doc.append(d)
            out_pos.append(pos)
    return (np.asarray(out_terms, dtype=object),
            np.asarray(out_doc, dtype=np.int32),
            np.asarray(out_pos, dtype=np.int32))

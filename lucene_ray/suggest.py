"""Suggesters over arbitrary (text, weight[, payload]) entries — the
analyzed-completion family the dictionary-backed searcher suggesters don't
cover.

Reference anchors:
* AnalyzingSuggester (suggest/.../analyzing/AnalyzingSuggester.java:139):
  complete the ANALYZED form of the suggestion from its start, weighted —
  here a sorted array of analyzed keys binary-searched by analyzed-prefix
  (the FST is an implementation detail; the contract is analyzed-prefix →
  top-k by weight).
* AnalyzingInfixSuggester (suggest/.../analyzing/AnalyzingInfixSuggester
  .java): match suggestions whose analyzed text contains ANY token with the
  typed prefix (infix), rank by weight, highlight the match — here a mini
  token→suggestion inverted index.

Build is Ray-friendly: ``build_from_dataset`` analyzes entries with one
``map_batches`` pass and collects only suggestion-set-sized rows (a
suggestion dictionary is small relative to the corpus; the reference loads
its FSTs fully in RAM too).
"""

from __future__ import annotations

import bisect

import numpy as np

from lucene_ray.functions.analysis import Analyzer, get_analyzer
from lucene_ray.state.segment import prefix_successor


def _analyze(analyzer: Analyzer, text: str) -> list[str]:
    terms, _d, _p, _l = analyzer.tokenize_batch([text])
    return [str(t) for t in terms]


class AnalyzingSuggester:
    """Analyzed-prefix completion: ``lookup(key)`` returns entries whose
    ANALYZED text starts with the analyzed key, top-k by (weight desc,
    text asc)."""

    def __init__(self, analyzer: Analyzer | str = "standard"):
        self.analyzer = (get_analyzer(analyzer)
                         if isinstance(analyzer, str) else analyzer)
        self._keys: list[str] = []
        self._entries: list[tuple] = []  # aligned with _keys order

    def build(self, entries) -> "AnalyzingSuggester":
        """``entries``: iterable of (text, weight) or (text, weight, payload)."""
        rows = []
        for e in entries:
            text, weight = e[0], int(e[1])
            payload = e[2] if len(e) > 2 else None
            key = " ".join(_analyze(self.analyzer, text))
            rows.append((key, text, weight, payload))
        rows.sort(key=lambda r: r[0])
        self._keys = [r[0] for r in rows]
        self._entries = rows
        return self

    def lookup(self, key: str, k: int = 5) -> list[tuple]:
        """→ [(text, weight, payload)] top-k by (weight desc, text asc)."""
        akey = " ".join(_analyze(self.analyzer, key))
        lo = bisect.bisect_left(self._keys, akey)
        succ = prefix_successor(akey) if akey else None
        hi = (bisect.bisect_left(self._keys, succ) if succ is not None
              else len(self._keys))
        cand = self._entries[lo:hi]
        cand = sorted(cand, key=lambda r: (-r[2], r[1]))[:k]
        return [(t, w, p) for _k, t, w, p in cand]


class InfixSuggester:
    """Infix completion: the typed key's LAST token matches any-position
    token prefixes; earlier tokens must appear as whole analyzed tokens
    (AnalyzingInfixSuggester's query shape). Matches are highlighted with
    ``<b>…</b>`` around the matched prefix."""

    def __init__(self, analyzer: Analyzer | str = "standard"):
        self.analyzer = (get_analyzer(analyzer)
                         if isinstance(analyzer, str) else analyzer)
        self._entries: list[tuple] = []  # (text, weight, payload, token set)
        self._tokens: list[str] = []     # sorted distinct tokens
        self._postings: list[np.ndarray] = []  # token -> entry ids

    def build(self, entries) -> "InfixSuggester":
        toks_by_entry = []
        self._entries = []
        inv: dict[str, list[int]] = {}
        for i, e in enumerate(entries):
            text, weight = e[0], int(e[1])
            payload = e[2] if len(e) > 2 else None
            toks = _analyze(self.analyzer, text)
            self._entries.append((text, weight, payload, frozenset(toks)))
            toks_by_entry.append(toks)
            for t in set(toks):
                inv.setdefault(t, []).append(i)
        self._tokens = sorted(inv)
        self._postings = [np.asarray(inv[t], dtype=np.int64)
                          for t in self._tokens]
        return self

    def build_from_dataset(self, ds, *, text_col: str = "text",
                           weight_col: str | None = None) -> "InfixSuggester":
        """Distributed analyze (one map_batches pass), then assemble the
        in-RAM lookup structure from the suggestion-sized result."""
        import pyarrow as pa

        an = self.analyzer

        def prep(batch: pa.Table) -> pa.Table:
            texts = batch.column(text_col).to_pylist()
            toks = [" ".join(_analyze(an, t)) for t in texts]
            w = (batch.column(weight_col).to_numpy(zero_copy_only=False)
                 if weight_col else np.ones(len(texts), dtype=np.int64))
            return pa.table({"text": pa.array(texts, type=pa.string()),
                             "weight": pa.array(w.astype(np.int64)),
                             "toks": pa.array(toks, type=pa.string())})

        # driver materialization is intentional and bounded: suggesters hold
        # their whole lookup structure in RAM by design (Lucene's FST-based
        # suggesters do the same) — inputs are suggestion dictionaries
        # (queries, titles, product names), not corpora
        rows = ds.map_batches(prep, batch_format="pyarrow").to_pandas()
        entries = []
        self._entries = []
        inv: dict[str, list[int]] = {}
        for i, (text, weight, toks) in enumerate(
                zip(rows["text"], rows["weight"], rows["toks"])):
            tl = toks.split() if toks else []
            self._entries.append((text, int(weight), None, frozenset(tl)))
            for t in set(tl):
                inv.setdefault(t, []).append(i)
        self._tokens = sorted(inv)
        self._postings = [np.asarray(inv[t], dtype=np.int64)
                          for t in self._tokens]
        return self

    def _prefix_entry_ids(self, prefix: str) -> np.ndarray:
        lo = bisect.bisect_left(self._tokens, prefix)
        succ = prefix_successor(prefix) if prefix else None
        hi = (bisect.bisect_left(self._tokens, succ) if succ is not None
              else len(self._tokens))
        if hi <= lo:
            return np.empty(0, dtype=np.int64)
        return np.unique(np.concatenate(self._postings[lo:hi]))

    def lookup(self, key: str, k: int = 5, *, highlight: bool = True) -> list[tuple]:
        """→ [(text, weight, payload, highlighted)] by (weight desc, text)."""
        ktoks = _analyze(self.analyzer, key)
        if not ktoks:
            return []
        *whole, last = ktoks
        ids = self._prefix_entry_ids(last)
        out = []
        for i in ids.tolist():
            text, weight, payload, tokset = self._entries[i]
            if all(t in tokset for t in whole):
                out.append((text, weight, payload))
        out.sort(key=lambda r: (-r[1], r[0]))
        out = out[:k]
        if not highlight:
            return [(t, w, p, None) for t, w, p in out]
        import re

        pat = re.compile(r"\b(" + re.escape(last) + r")(\w*)", re.IGNORECASE)
        return [
            (t, w, p, pat.sub(lambda m: f"<b>{m.group(1)}</b>{m.group(2)}", t))
            for t, w, p in out
        ]

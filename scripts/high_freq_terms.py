"""HighFreqTerms — the misc-module diagnostic (misc/.../HighFreqTerms.java:
top-k terms of an index ordered by docFreq or by totalTermFreq).

Usage: python scripts/high_freq_terms.py INDEX_DIR [-t] [-k K]
  -t : order by totalTermFreq instead of docFreq (the reference's -t flag)
"""
from __future__ import annotations

import sys

import numpy as np


def high_freq_terms(index_dir: str, k: int = 100, by_total_tf: bool = False):
    """Top-k (term, doc_freq, total_tf) across all live segments — one
    vectorized merge over the per-segment term tables (no postings decode);
    the HighFreqTerms.getHighFreqTerms contract."""
    from lucene_ray.searcher import IndexSearcher

    s = IndexSearcher(index_dir)
    if not s.readers:
        return []
    terms = np.concatenate([np.asarray(r.terms, dtype=object)
                            for r in s.readers])
    df = np.concatenate([np.asarray(r.doc_freq) for r in s.readers])
    tf = np.concatenate([np.asarray(r.total_tf) for r in s.readers])
    uniq, inv = np.unique(terms, return_inverse=True)
    agg_df = np.bincount(inv, weights=df.astype(np.float64)).astype(np.int64)
    agg_tf = np.bincount(inv, weights=tf.astype(np.float64)).astype(np.int64)
    key = agg_tf if by_total_tf else agg_df
    # top-k by (-count, term): argsort on count desc with the lexicographic
    # tiebreak supplied by uniq already being sorted (stable sort keeps it)
    order = np.argsort(-key, kind="stable")[:k]
    return [(str(uniq[i]), int(agg_df[i]), int(agg_tf[i])) for i in order]


def main(argv):
    if not argv:
        print(__doc__)
        return 1
    index_dir = argv[0]
    by_tf = "-t" in argv
    k = 100
    if "-k" in argv:
        k = int(argv[argv.index("-k") + 1])
    for term, df, ttf in high_freq_terms(index_dir, k=k, by_total_tf=by_tf):
        print(f"{term}\tdocFreq={df}\ttotalTermFreq={ttf}")
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))

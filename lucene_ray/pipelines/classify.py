"""Classifiers over the corpus / index — the reference ``classification``
module re-expressed Ray-Data-first.

* Naive Bayes (classification/SimpleNaiveBayesClassifier.java:48): per class
  ``c``::

      score(c) = log(docFreq(class=c)) - log(docsWithClass)              # prior
               + Σ_w log( (df(text:w ∧ class=c) + 1)                    # add-1
                          / (avgUniqueTermsPerDoc·docFreq(class=c)
                             + docsWithClass) )

  summed over every analyzed token ``w`` of the input (duplicates count,
  SimpleNaiveBayesClassifier.java:213-233), argmax wins with ties to the
  first class in term-dictionary (lexicographic) order
  (SimpleNaiveBayesClassifier.java:103-115 iterates classesEnum in order and
  keeps strictly-greater). The final softmax normalization
  (normClassificationResults, :298-322) is monotone and does not change the
  argmax.

  The reference probes the index per (word, class) pair at query time; the
  Ray-Data-native scale path instead trains a model TABLE once — one
  streaming pass with in-batch partial aggregation, one small
  ``groupby(term, class)`` shuffle — and broadcasts it (``ray.put``) to a
  vectorized ``map_batches`` classifier stage. At web scale the model table
  is vocabulary × classes ≪ corpus; if even that outgrows worker heaps the
  same scoring runs as a (input-token ⋈ model) reduce-side join.

* kNN (classification/KNearestNeighborClassifier.java:48): BM25 top-k for
  the input text, classes voted by rank-normalized score — per class
  ``score = (Σ_hits score/maxScore) / k``, scaled by ``k/sumdoc`` when fewer
  than k hits carry a class (buildListFromTopDocs, :191-236). Class labels
  come from stored fields via ``searcher.document`` exactly like the
  reference's ``indexSearcher.doc(...)``. Term selection: ``terms="all"``
  uses every distinct analyzed input token as a SHOULD TermQuery
  (equivalent to the reference's MoreLikeThis selection with
  minTermFreq=minDocFreq=1, boost off); ``terms="mlt"`` routes through the
  searcher's MoreLikeThis top-term selection.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import pyarrow as pa

from lucene_ray.functions.analysis import get_analyzer

__all__ = [
    "NaiveBayesModel",
    "train_naive_bayes",
    "nb_classify_texts",
    "NaiveBayesBatchClassifier",
    "knn_classify",
    "knn_vote",
]


@dataclass
class NaiveBayesModel:
    """Trained NB statistics (all numpy; broadcastable via ``ray.put``)."""

    classes: np.ndarray          # (C,) unicode, sorted (term-dict order)
    class_doc_count: np.ndarray  # (C,) float64 — docFreq(class=c)
    docs_with_class: float       # docs having a class value
    avg_unique_terms: float      # sumDocFreq(text)/docCount(text)
    vocab: np.ndarray            # (V,) unicode, sorted
    term_class_df: object        # (V, C) float64 (dense) or scipy-free dict
    analyzer_kind: str = "simple"

    def log_denominator(self) -> np.ndarray:
        # den(c) = avgUniqueTermsPerDoc * docFreq(c) + docsWithClass
        return np.log(self.avg_unique_terms * self.class_doc_count + self.docs_with_class)

    def log_prior(self) -> np.ndarray:
        return np.log(self.class_doc_count) - np.log(self.docs_with_class)


def _distinct_doc_term(an, texts):
    """(doc_idx, term) distinct pairs for a batch, vectorized."""
    codes, vocab, doc_idx, _pos, _dl = an.tokenize_batch_encoded(texts)
    if len(codes) == 0:
        return np.empty(0, np.int64), np.empty(0, dtype=vocab.dtype if len(vocab) else "U1")
    pair = doc_idx.astype(np.int64) * (len(vocab) + 1) + codes
    upair = np.unique(pair)
    return upair // (len(vocab) + 1), vocab[upair % (len(vocab) + 1)]


def train_naive_bayes(ds, text_col: str = "text", class_col: str = "lang",
                      analyzer: str = "simple") -> NaiveBayesModel:
    """One streaming pass over ``ds``: per-batch tokenize → distinct
    (doc, term) × class partials → small ``groupby(term, class)`` reduce.
    Only the (term, class, df) partials shuffle — never documents."""

    kind = analyzer

    def partials(batch: pa.Table) -> pa.Table:
        an = get_analyzer(kind)
        texts = batch.column(text_col).to_pylist()
        classes = np.asarray(batch.column(class_col).to_pylist(), dtype=object)
        d_idx, terms = _distinct_doc_term(an, texts)
        cls = classes[d_idx] if len(d_idx) else np.empty(0, dtype=object)
        # in-batch partial: count distinct docs per (term, class)
        out_t, out_c, out_n = [], [], []
        if len(terms):
            import pandas as pd

            g = pd.DataFrame({"term": terms, "cls": cls}).groupby(
                ["term", "cls"], sort=False).size()
            out_t = [t for t, _ in g.index]
            out_c = [c for _, c in g.index]
            out_n = g.values.tolist()
        # meta rows: per-class doc counts and the (docs, distinct-pairs)
        # collection partials, tagged by term='' (never a real token)
        import pandas as pd

        cc = pd.Series(classes).value_counts()
        for c, n in cc.items():
            out_t.append("")
            out_c.append(str(c))
            out_n.append(int(n))
        out_t.append("")
        out_c.append("\x00meta")
        # encode (n_docs, n_distinct_pairs) as two rows is clumsy; pack:
        out_n.append(int(len(texts)))
        out_t.append("")
        out_c.append("\x00pairs")
        out_n.append(int(len(d_idx)))
        return pa.table({
            "term": pa.array(out_t, type=pa.string()),
            "cls": pa.array([str(c) for c in out_c], type=pa.string()),
            "n": pa.array(out_n, type=pa.int64()),
        })

    agg = (
        ds.map_batches(partials, batch_format="pyarrow")
        .groupby(["term", "cls"])
        .sum("n")
    )
    tbl = agg.to_pandas()
    ncol = [c for c in tbl.columns if c.startswith("sum")][0]

    meta = tbl[tbl["term"] == ""]
    body = tbl[tbl["term"] != ""]
    n_docs = float(meta.loc[meta["cls"] == "\x00meta", ncol].sum())
    n_pairs = float(meta.loc[meta["cls"] == "\x00pairs", ncol].sum())
    cls_rows = meta[~meta["cls"].isin(["\x00meta", "\x00pairs"])]
    classes = np.sort(cls_rows["cls"].to_numpy(dtype=object)).astype(str)
    c_index = {c: i for i, c in enumerate(classes)}
    class_doc_count = np.zeros(len(classes), dtype=np.float64)
    for c, n in zip(cls_rows["cls"], cls_rows[ncol]):
        class_doc_count[c_index[c]] = float(n)
    docs_with_class = float(class_doc_count.sum())

    vocab = np.sort(body["term"].unique().astype(str))
    v_index = {t: i for i, t in enumerate(vocab)}
    mat = np.zeros((len(vocab), len(classes)), dtype=np.float64)
    vi = body["term"].map(v_index).to_numpy()
    ci = body["cls"].map(c_index).to_numpy()
    mat[vi, ci] = body[ncol].to_numpy(dtype=np.float64)

    return NaiveBayesModel(
        classes=classes,
        class_doc_count=class_doc_count,
        docs_with_class=docs_with_class,
        avg_unique_terms=n_pairs / n_docs if n_docs else 0.0,
        vocab=vocab,
        term_class_df=mat,
        analyzer_kind=kind,
    )


def nb_scores(model: NaiveBayesModel, text: str) -> np.ndarray:
    """Per-class unnormalized log scores for one input (the softmax
    normalization is monotone — argmax-equivalent)."""
    an = get_analyzer(model.analyzer_kind)
    prior = model.log_prior()
    log_den = model.log_denominator()
    toks = [t for t, _ in an.tokenize_one(text)]
    if not toks or len(model.vocab) == 0:
        return prior
    idx = np.searchsorted(model.vocab, toks)
    idx = np.clip(idx, 0, len(model.vocab) - 1)
    known = model.vocab[idx] == np.asarray(toks)
    # hits matrix: (n_tokens, C); unseen tokens hit 0 everywhere
    hits = np.where(known[:, None], model.term_class_df[idx], 0.0)
    return prior + np.sum(np.log(hits + 1.0) - log_den[None, :], axis=0)


def nb_classify_texts(model: NaiveBayesModel, texts: list[str],
                      round_to: int | None = None) -> list[str]:
    """Argmax class per input (reference assignClass; ties → first class in
    term-dictionary order). ``round_to`` rounds scores first (oracle-compare
    determinism across summation orders)."""
    out = []
    for text in texts:
        score = nb_scores(model, text)
        if round_to is not None:
            score = np.round(score, round_to)
        out.append(str(model.classes[int(np.argmax(score))]))
    return out


class NaiveBayesBatchClassifier:
    """Actor-pool ``map_batches`` stage: model fetched once per actor from
    the object store (``ray.put`` broadcast), scoring vectorized per batch."""

    def __init__(self, model_ref, text_col: str = "text",
                 out_col: str = "pred_class"):
        import ray

        self.model = ray.get(model_ref) if not isinstance(model_ref, NaiveBayesModel) else model_ref
        self.text_col = text_col
        self.out_col = out_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        preds = nb_classify_texts(self.model, batch.column(self.text_col).to_pylist())
        return batch.append_column(self.out_col, pa.array(preds, type=pa.string()))


def knn_classify(searcher, text: str, *, k: int = 10, class_field: str = "lang",
                 field: str | None = None, query=None) -> list[tuple[str, float]]:
    """kNN document classification (KNearestNeighborClassifier.java:120-236):
    BM25 top-k for the input, per-class vote Σ(score/maxScore)/k with the
    <k correction, classes sorted by (score desc, class asc). Returns the
    full ranked (class, score) list; ``[0][0]`` is assignClass.

    The knn query is every distinct analyzed input token as a SHOULD
    TermQuery — the reference's MoreLikeThis selection at
    minTermFreq=minDocFreq=1 with boost off; pass ``query`` to use a custom
    selection (e.g. ``searcher.more_like_this``'s top-terms)."""
    from lucene_ray.query import BooleanQuery, TermQuery

    if query is None:
        an = get_analyzer((searcher.manifest.config or {}).get("analyzer", "standard"))
        seen, uniq = set(), []
        for t, _ in an.tokenize_one(text):
            if t not in seen:
                seen.add(t)
                uniq.append(t)
        query = BooleanQuery(should=[TermQuery(t, field=field) for t in uniq])
    td = searcher.search(query, k=k, algo="exhaustive")
    hits = []
    for sd in td.score_docs:
        doc = searcher.document(sd.doc_key)
        cl = None if doc is None else doc.get(class_field)
        hits.append((None if cl is None else str(cl), float(sd.score)))
    return knn_vote(hits, k)


def knn_vote(hits: list[tuple[str | None, float]], k: int) -> list[tuple[str, float]]:
    """The buildListFromTopDocs vote (KNearestNeighborClassifier.java:191-236)
    over an already-ranked (class, score) hit list (first hit's score is
    maxScore): per class Σ(score/maxScore)/k, ×k/sumdoc when fewer than k
    hits carry a class; ranked (score desc, class asc)."""
    if not hits:
        return []
    max_score = hits[0][1]
    counts: dict[str, int] = {}
    boosts: dict[str, float] = {}
    for cl, score in hits:
        if cl is None:
            continue
        counts[cl] = counts.get(cl, 0) + 1
        boosts[cl] = boosts.get(cl, 0.0) + score / max_score
    sumdoc = sum(counts.values())
    results = []
    for cl, cnt in counts.items():
        norm_boost = boosts[cl] / cnt
        score = (cnt * norm_boost) / k
        if sumdoc < k and sumdoc > 0:
            score = score * k / sumdoc
        results.append((cl, score))
    results.sort(key=lambda x: (-x[1], x[0]))
    return results

"""Text analysis stages — token counting, quality scoring, language ID,
document fingerprinting. The large-scale-training-data companions to the
index pipeline; every stage is a vectorized ``map_batches`` transform (actor
pool where there is state to compile/load).

Oracle notes: token/char/stopword counts and the sorted-distinct-token
fingerprint are integer/string outputs mirrored exactly by DuckDB SQL in
``__ray_entry__``; language ID and the winnowing fingerprint are
deterministic but not SQL-expressible (rows-only checks + pytest goldens).
"""

from __future__ import annotations

import hashlib
import re

import numpy as np
import pyarrow as pa

from lucene_ray.functions.analysis import ENGLISH_STOP_WORDS

_SIMPLE = re.compile(r"[a-z0-9]+")
# BPE-ish word/number/punct splitter (GPT-2-style regex family, simplified to
# RE2/Python-compatible form): contractions, letter runs, digit runs, other
# non-space runs.
_BPEISH = re.compile(r"'(?:s|t|re|ve|m|ll|d)| ?[a-zA-Z]+| ?[0-9]+| ?[^\sa-zA-Z0-9]+")


class TokenStats:
    """Per-doc integer stats: simple tokens, bpe-ish tokens, chars, stopwords,
    total token chars. Fully vectorized — pyarrow.compute RE2 kernels over the
    whole column, no per-row Python; the stopword count flattens the split
    token lists once and segment-sums an ``is_in`` mask via offsets."""

    def __init__(self, text_col: str = "text", id_col: str = "doc_id"):
        self.text_col = text_col
        self.id_col = id_col
        self.stop_set = pa.array(sorted(ENGLISH_STOP_WORDS), type=pa.string())

    def __call__(self, batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        col = batch.column(self.text_col).combine_chunks() \
            if isinstance(batch.column(self.text_col), pa.ChunkedArray) \
            else batch.column(self.text_col)
        low = pc.utf8_lower(col)
        n_chars = pc.utf8_length(col)
        n_tokens = pc.count_substring_regex(low, "[a-z0-9]+")
        # Σ len(token) == count of [a-z0-9] chars after lowering
        tok_chars = pc.utf8_length(pc.replace_substring_regex(low, "[^a-z0-9]", ""))
        n_bpeish = pc.count_substring_regex(col, _BPEISH.pattern)
        # stopwords: split → flatten → is_in → segment-sum by list offsets
        split = pc.split_pattern_regex(low, "[^a-z0-9]+")
        if isinstance(split, pa.ChunkedArray):
            split = split.combine_chunks()
        flat = pc.list_flatten(split)
        stop_mask = pc.is_in(flat, value_set=self.stop_set)
        offs = split.offsets.to_numpy() - split.offsets[0].as_py()
        cum = np.zeros(len(flat) + 1, dtype=np.int64)
        np.cumsum(stop_mask.to_numpy(zero_copy_only=False).astype(np.int64),
                  out=cum[1:])
        n_stop = cum[offs[1:]] - cum[offs[:-1]]
        return pa.table(
            {
                self.id_col: batch.column(self.id_col),
                "n_tokens": pc.cast(n_tokens, pa.int64()),
                "n_bpeish_tokens": pc.cast(n_bpeish, pa.int64()),
                "n_chars": pc.cast(n_chars, pa.int64()),
                "n_stopwords": pa.array(n_stop, type=pa.int64()),
                "token_chars": pc.cast(tok_chars, pa.int64()),
            }
        )


def token_stats(ds, *, text_col: str = "text", id_col: str = "doc_id"):
    fn = TokenStats(text_col, id_col)
    return ds.map_batches(lambda b: fn(b), batch_format="pyarrow")


class QualityScore:
    """Heuristic quality signals (length / punctuation / stopword ratios /
    mean word length) — the usual web-text filtering features. Float ratios
    derived from the integer stats; filter thresholds follow C4-style rules."""

    def __init__(self, text_col: str = "text", id_col: str = "doc_id"):
        self.inner = TokenStats(text_col, id_col)
        self.id_col = id_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        s = self.inner(batch)
        nt = s.column("n_tokens").to_numpy().astype(np.float64)
        nc = s.column("n_chars").to_numpy().astype(np.float64)
        ns = s.column("n_stopwords").to_numpy().astype(np.float64)
        tc = s.column("token_chars").to_numpy().astype(np.float64)
        safe_nt = np.maximum(nt, 1)
        stop_ratio = ns / safe_nt
        mean_word_len = tc / safe_nt
        alpha_ratio = tc / np.maximum(nc, 1)
        quality = (
            (nt >= 5)
            & (mean_word_len >= 2)
            & (mean_word_len <= 12)
            & (alpha_ratio >= 0.5)
        )
        return s.append_column("stop_ratio", pa.array(stop_ratio)) \
                .append_column("mean_word_len", pa.array(mean_word_len)) \
                .append_column("alpha_ratio", pa.array(alpha_ratio)) \
                .append_column("passes_quality", pa.array(quality))


def quality_scores(ds, *, text_col: str = "text", id_col: str = "doc_id"):
    fn = QualityScore(text_col, id_col)
    return ds.map_batches(lambda b: fn(b), batch_format="pyarrow")


# ------------------------------------------------------------------ lang id

# Tiny per-language character/stopword profiles (public-knowledge heuristic:
# rank correlation of frequent-token profiles, Cavnar-Trenkle style n-gram
# rank distance on the token level). Deterministic; not a trained model.
_LANG_PROFILES = {
    "en": {"the", "and", "of", "to", "a", "in", "is", "it", "that", "for"},
    "es": {"el", "la", "de", "que", "y", "en", "un", "los", "se", "no"},
    "de": {"der", "die", "und", "das", "in", "von", "zu", "mit", "den", "ist"},
    "fr": {"le", "la", "de", "et", "les", "des", "un", "en", "que", "dans"},
}


class LangId:
    """N-gram/stopword-profile language guesser. CJK scripts short-circuit on
    codepoint ranges; Latin text votes by profile overlap (ties → 'en')."""

    def __init__(self, text_col: str = "text", id_col: str = "doc_id"):
        self.text_col = text_col
        self.id_col = id_col
        self.simple = _SIMPLE
        self.profiles = _LANG_PROFILES

    def guess(self, text: str) -> str:
        for ch in text[:200]:
            o = ord(ch)
            if 0x4E00 <= o <= 0x9FFF or 0x3400 <= o <= 0x4DBF:
                return "zh"
            if 0x3040 <= o <= 0x30FF:
                return "ja"
            if 0xAC00 <= o <= 0xD7AF:
                return "ko"
        toks = set(self.simple.findall(text.lower())[:500])
        best, best_n = "en", -1
        for lang in sorted(self.profiles):
            n = len(toks & self.profiles[lang])
            if n > best_n:
                best, best_n = lang, n
        return best

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch.column(self.text_col).to_pylist()
        return pa.table(
            {
                self.id_col: batch.column(self.id_col),
                "pred_lang": pa.array([self.guess(t) for t in texts], type=pa.string()),
            }
        )


def lang_id(ds, *, text_col: str = "text", id_col: str = "doc_id"):
    fn = LangId(text_col, id_col)
    return ds.map_batches(lambda b: fn(b), batch_format="pyarrow")


# ------------------------------------------------------------- fingerprints


class Fingerprints:
    """Two document fingerprints:

    * ``fingerprint`` — md5 of the space-joined SORTED DISTINCT simple tokens
      (bag-of-words identity; SQL-expressible, the oracle checks it);
    * ``winnow`` — min rolling-hash over 5-gram token windows (winnowing-style
      content fingerprint; deterministic, rows-only check).
    """

    def __init__(self, text_col: str = "text", id_col: str = "doc_id", k: int = 5):
        self.text_col = text_col
        self.id_col = id_col
        self.k = k
        self.simple = _SIMPLE

    def __call__(self, batch: pa.Table) -> pa.Table:
        from lucene_ray.pipelines.dedup import _hash_tokens_u64

        texts = batch.column(self.text_col).to_pylist()
        fps = []
        all_grams: list[str] = []
        seg_lens = np.empty(len(texts), dtype=np.int64)
        for i, t in enumerate(texts):
            toks = self.simple.findall(t.lower())
            fps.append(hashlib.md5(" ".join(sorted(set(toks))).encode()).hexdigest())
            if len(toks) < self.k:
                grams = [" ".join(toks)] if toks else []
            else:
                grams = [" ".join(toks[j : j + self.k]) for j in range(len(toks) - self.k + 1)]
            seg_lens[i] = len(grams)
            all_grams.extend(grams)
        # one vectorized hash over the whole batch's grams, then segment-min
        winnows = np.zeros(len(texts), dtype=np.uint64)
        if all_grams:
            h = _hash_tokens_u64(all_grams)
            starts = np.concatenate(([0], np.cumsum(seg_lens)[:-1]))
            nonempty = seg_lens > 0
            if nonempty.any():
                mins = np.minimum.reduceat(h, starts[nonempty])
                winnows[nonempty] = mins
        return pa.table(
            {
                self.id_col: batch.column(self.id_col),
                "fingerprint": pa.array(fps, type=pa.string()),
                "winnow": pa.array(winnows, type=pa.uint64()),
            }
        )


def fingerprints(ds, *, text_col: str = "text", id_col: str = "doc_id"):
    fn = Fingerprints(text_col, id_col)
    return ds.map_batches(lambda b: fn(b), batch_format="pyarrow")


# ---------------------------------------------------- unigram LM scoring


def unigram_logprob(ds, *, text_col: str = "text", id_col: str = "doc_id",
                    num_partitions: int = 64):
    """Per-document mean unigram log-probability — the perplexity-filter
    primitive of training-data curation (docs whose tokens are improbable
    under the corpus unigram model are boilerplate/garbled candidates).

    Two passes, both vectorized: (1) global token frequencies keyed by
    64-bit token HASH via the hash-partitioned Arrow reduce — the driver
    collects (sorted uint64 hash, float32 logp) NUMERIC arrays only (the
    string vocabulary never materializes on the driver: web-scale vocab is
    10⁸–10⁹ terms, and an object-dtype string broadcast there would OOM
    where a 12-byte-per-term numeric pair does not), broadcast once via
    ``ray.put``; (2) per-doc mean of ``ln(tf_global / total_tokens)`` with
    a sorted-hash ``searchsorted`` gather — no per-token Python. Returns
    (id, n_tokens, mean_logprob) with mean_logprob = 0.0 for empty docs.
    """
    import pyarrow.compute as pc
    import ray

    from lucene_ray.pipelines.dedup import _hash_tokens_u64, partition_reduce

    def term_counts(batch: pa.Table) -> pa.Table:
        low = pc.utf8_lower(batch.column(text_col))
        split = pc.split_pattern_regex(low, "[^a-z0-9]+")
        flat = pc.list_flatten(split)
        flat = flat.filter(pc.not_equal(flat, ""))
        if isinstance(flat, pa.ChunkedArray):
            flat = flat.combine_chunks()
        # hash inside the worker — only (u64, count) pairs ever shuffle
        h = _hash_tokens_u64(flat.to_pylist())
        t = pa.table({"h": pa.array(h, type=pa.uint64())})
        agg = t.group_by("h").aggregate([("h", "count")])
        return agg.rename_columns(["h", "n"])

    def reduce_sum(t: pa.Table) -> pa.Table:
        agg = t.group_by("h").aggregate([("n", "sum")])
        return agg.rename_columns(["h", "n"])

    vocab_ds = partition_reduce(
        ds.map_batches(term_counts, batch_format="pyarrow"),
        ["h"], reduce_sum, num_partitions=num_partitions,
    )
    h_parts, n_parts = [], []
    for t in vocab_ds.iter_batches(batch_format="pyarrow"):
        if t.num_rows:
            h_parts.append(t.column("h").to_numpy(
                zero_copy_only=False).astype(np.uint64))
            n_parts.append(t.column("n").to_numpy(
                zero_copy_only=False).astype(np.float64))
    hashes = np.concatenate(h_parts) if h_parts else np.empty(0, np.uint64)
    counts = np.concatenate(n_parts) if n_parts else np.empty(0, np.float64)
    order = np.argsort(hashes)
    hashes, counts = hashes[order], counts[order]
    total = float(counts.sum())
    # float64, not float32: the oracle compares mean_logprob rounded to 6
    # decimals, and float32's ~7 significant digits can flip that rounding
    logp = np.log(counts / max(total, 1.0))
    ref = ray.put((hashes, logp))

    def score(batch: pa.Table) -> pa.Table:
        hashes_b, logp_b = ray.get(ref)
        low = pc.utf8_lower(batch.column(text_col))
        split = pc.split_pattern_regex(low, "[^a-z0-9]+")
        if isinstance(split, pa.ChunkedArray):
            split = split.combine_chunks()
        flat = pc.list_flatten(split)
        toks = np.asarray(flat.to_pylist(), dtype=object)
        keep = toks != ""
        # per-doc offsets over the UNFILTERED flat list, then masked sums
        offs = split.offsets.to_numpy() - split.offsets[0].as_py()
        th = _hash_tokens_u64(toks[keep].tolist())
        idx = np.searchsorted(hashes_b, th)
        # every kept token is in the vocab by construction (same split+hash)
        tok_lp = np.zeros(len(toks), dtype=np.float64)
        tok_lp[keep] = logp_b[idx]
        cum = np.concatenate([[0.0], np.cumsum(tok_lp)])
        cnt = np.concatenate([[0], np.cumsum(keep.astype(np.int64))])
        sums = cum[offs[1:]] - cum[offs[:-1]]
        ns = cnt[offs[1:]] - cnt[offs[:-1]]
        mean = np.where(ns > 0, sums / np.maximum(ns, 1), 0.0)
        return pa.table({
            id_col: batch.column(id_col),
            "n_tokens": pa.array(ns.astype(np.int64)),
            "mean_logprob": pa.array(np.round(mean, 6)),
        })

    return ds.map_batches(score, batch_format="pyarrow")


# ---------------------------------------------------------- doc chunking


def chunk_documents(ds, *, max_tokens: int = 128, overlap: int = 32,
                    text_col: str = "text", id_col: str = "doc_id"):
    """Split documents into overlapping token windows — context-length
    chunking for LLM training corpora. Stride = max_tokens − overlap; the
    final window is the tail (may be shorter; never empty for a non-empty
    doc); chunk_id is the window ordinal. Pure per-batch map (no shuffle):
    one row in → ceil(max(n_tokens − overlap, 1) / stride) rows out.
    Returns (id, chunk_id, n_tokens, chunk_text)."""
    if overlap >= max_tokens:
        raise ValueError("overlap must be smaller than max_tokens")
    stride = max_tokens - overlap

    def chunk(batch: pa.Table) -> pa.Table:
        # fully vectorized: Arrow tokenize → window arithmetic in numpy →
        # one gather + one binary_join; no per-doc (let alone per-chunk)
        # Python in the hot path
        import pyarrow.compute as pc

        low = pc.utf8_lower(batch.column(text_col))
        split = pc.split_pattern_regex(low, "[^a-z0-9]+")
        if isinstance(split, pa.ChunkedArray):
            split = split.combine_chunks()
        flat = split.values
        keep = pc.not_equal(flat, "")
        flat = flat.filter(keep)
        offs = split.offsets.to_numpy() - split.offsets[0].as_py()
        kept = np.cumsum(
            np.concatenate([[0], keep.to_numpy(zero_copy_only=False)
                            .astype(np.int64)]))
        doc_start = kept[offs[:-1]]          # per-doc start in filtered flat
        n_tok = kept[offs[1:]] - doc_start   # per-doc token counts
        n_chunks = np.where(
            n_tok > 0,
            -(-np.maximum(n_tok - overlap, 1) // stride), 0).astype(np.int64)
        total_c = int(n_chunks.sum())
        if total_c == 0:
            return pa.table({
                id_col: batch.column(id_col).slice(0, 0),
                "chunk_id": pa.array([], type=pa.int64()),
                "n_tokens": pa.array([], type=pa.int64()),
                "chunk_text": pa.array([], type=pa.string()),
            })
        doc_of_chunk = np.repeat(np.arange(len(n_tok)), n_chunks)
        c_first = np.concatenate([[0], np.cumsum(n_chunks)[:-1]])
        chunk_id = np.arange(total_c) - np.repeat(c_first, n_chunks)
        starts = doc_start[doc_of_chunk] + chunk_id * stride
        lens = np.minimum(max_tokens,
                          (doc_start + n_tok)[doc_of_chunk] - starts)
        # gather all chunk tokens with one take, then join per chunk
        g_first = np.concatenate([[0], np.cumsum(lens)[:-1]])
        idx = (np.repeat(starts - g_first, lens)
               + np.arange(int(lens.sum()), dtype=np.int64))
        toks = flat.take(pa.array(idx, type=pa.int64()))
        joined = pc.binary_join(
            pa.ListArray.from_arrays(
                pa.array(np.concatenate([[0], np.cumsum(lens)]),
                         type=pa.int32()), toks),
            " ")
        return pa.table({
            id_col: batch.column(id_col).take(
                pa.array(doc_of_chunk, type=pa.int64())),
            "chunk_id": pa.array(chunk_id, type=pa.int64()),
            "n_tokens": pa.array(lens.astype(np.int64)),
            "chunk_text": joined,
        })

    return ds.map_batches(chunk, batch_format="pyarrow")

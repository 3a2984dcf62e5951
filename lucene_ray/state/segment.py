"""Segment format — build, write, read one immutable mini-index.

The Ray-Data-native analogue of a Lucene flushed segment
(index/DocumentsWriterPerThread.java:60 FlushedSegment): one hash partition of
the corpus → one immutable directory of Arrow/Parquet artifacts on shared
storage. Local docIDs are dense ints [0, maxDoc) in deterministic order
(sorted by the document key within the partition), so retries and different
parallelism levels produce byte-identical segments.

Layout of ``<index_dir>/segments/<seg_name>/``::

    postings.parquet   one row per term, term-sorted:
        term:string, doc_freq:int64, total_tf:int64,
        singleton_doc:int32, singleton_freq:int32   (docFreq==1 short-circuit,
            Lucene90PostingsWriter.java:376-381; packed empty in that case)
        packed:binary                               (FOR 128-int blocks, postings.py)
        block_last_docs:list<int32>                 skip data: one entry per block
        block_max_freqs:list<int32>                 impact upper bounds
        block_min_lens:list<int32>                  (see block_skip_metadata)
        positions:binary                            int32[] token positions per
                                                    occurrence, doc-major (only
                                                    when store_positions)
    docs.parquet       one row per local docID, in docID order:
        doc_key (the configured id column, e.g. url or doc_id),
        norm:uint8 (SmallFloat byte), dl:int32 (exact length, exact-mode BM25)
    meta.json          {name, field, max_doc, doc_count, sum_doc_freq,
                        sum_total_term_freq, part_id, analyzer, checksum, ...}

Atomicity: segments are written to ``<seg>.tmp-<nonce>`` and renamed into
place; a segment directory containing ``meta.json`` is complete (the
write-temp-then-rename protocol replaces the reference's two-phase
``pending_segments_N`` rename, IndexWriter.java:3370,3841).
"""

from __future__ import annotations

import json
import os
import uuid
import zlib

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from lucene_ray.functions.analysis import Analyzer
from lucene_ray.functions.norms import decode_norms, encode_lengths
from lucene_ray.functions.postings import (
    BLOCK_SIZE,
    block_skip_metadata,
    competitive_impacts,
    decode_postings,
    decode_postings_block_range,
    encode_postings,
)

META_NAME = "meta.json"

# utf-8 byte → character-class bucket for the fuzzy counting filter:
# a-z → 0-25, 0-9 → 26-35, other lead bytes → 36, continuation bytes → 37
# (dropped: each character must contribute exactly one count)
_CHAR_BUCKET = np.full(256, 36, dtype=np.int8)
for _b in range(ord("a"), ord("z") + 1):
    _CHAR_BUCKET[_b] = _b - ord("a")
for _b in range(ord("0"), ord("9") + 1):
    _CHAR_BUCKET[_b] = 26 + _b - ord("0")
_CHAR_BUCKET[0x80:0xC0] = 37


def char_count_vec(s: str) -> np.ndarray:
    """Histogram of one string under the same bucketing as ``char_counts``."""
    b = np.frombuffer(s.encode(), dtype=np.uint8)
    bk = _CHAR_BUCKET[b]
    return np.bincount(bk[bk < 37], minlength=37).astype(np.int32)

def prefix_successor(prefix: str) -> str | None:
    """Smallest string strictly greater than every string with ``prefix``.

    Increment the last codepoint, carrying past U+10FFFF (any term whose next
    codepoint is supplementary-plane sorts BELOW prefix+'\\uffff', so the old
    sentinel bound silently missed it). ``None`` = no upper bound exists
    (prefix is all U+10FFFF) — scan to the end of the dictionary.
    """
    cps = list(prefix)
    while cps:
        c = ord(cps[-1])
        if c < 0x10FFFF:
            cps[-1] = chr(c + 1)
            return "".join(cps)
        cps.pop()
    return None


# Token-position cap: positions share an int64 with docIDs in the exact
# phrase matcher (doc << 21 | pos, searcher._eval_phrase), mirroring the
# reference's IndexWriter MAX_POSITION bound on absurdly long documents.
MAX_POSITION = 1 << 21


def build_segment_tables(
    doc_keys: np.ndarray,
    texts,
    analyzer: Analyzer,
    *,
    store_positions: bool = True,
    store_offsets: bool = False,
    store_term_vectors: bool = False,
    store_payloads: bool = False,
) -> tuple:
    """The invert kernel: one partition's docs → (postings, docs, stats).

    Pure function of its inputs (deterministic): the Ray analogue of
    IndexingChain.processDocument/invert + FreqProxTermsWriter.flush
    (index/IndexingChain.java:583,1120-1263; index/FreqProxTermsWriter.java:
    82-128). Vectorized: one regex pass tokenizes the whole batch, one argsort
    groups (term, doc) pairs, run-length encoding yields freqs.

    ``doc_keys`` must already be in the desired local docID order. ``texts``
    may be a list[str] or an Arrow (Chunked)Array — pass the Arrow column
    straight through for the zero-copy tokenizer fast path.
    """
    n_docs = len(texts)
    tok_starts = tok_ends = tok_pays = None
    if store_offsets and store_payloads:
        raise ValueError("store_offsets and store_payloads cannot combine")
    if store_offsets:
        # offsets ride the postings like the reference's .pay stream
        # (Lucene90PostingsWriter.java:84-117, IndexOptions ..._AND_OFFSETS)
        (codes, vocab, doc_idx, positions, tok_starts, tok_ends,
         doc_lengths) = analyzer.tokenize_batch_encoded_offsets(texts)
    elif store_payloads:
        # payloads ride the postings the same way (the .pay stream's payload
        # half, Lucene90PostingsWriter.java writePayloads)
        (codes, vocab, doc_idx, positions, tok_pays, doc_lengths) = (
            analyzer.tokenize_batch_encoded_payloads(texts))
    else:
        codes, vocab, doc_idx, positions, doc_lengths = (
            analyzer.tokenize_batch_encoded(texts))

    # MAX_POSITION cap (IndexWriter.java MAX_POSITION analogue): the exact
    # phrase matcher packs positions into 21 bits of a (doc, pos) int64 key —
    # a doc with a token position >= 2^21 would silently corrupt cross-doc
    # phrase matches, so reject it at index time like the reference does.
    if len(positions) and int(positions.max()) >= MAX_POSITION:
        bad = int(doc_idx[int(np.argmax(positions))])
        raise ValueError(
            f"document {doc_keys[bad]!r} has a token position >= MAX_POSITION "
            f"({MAX_POSITION}); split or truncate it before indexing"
        )

    norm_bytes = encode_lengths(doc_lengths)
    docs_tbl = pa.table(
        {
            "doc_key": pa.array(doc_keys),
            "norm": pa.array(norm_bytes, type=pa.uint8()),
            "dl": pa.array(doc_lengths, type=pa.int32()),
        }
    )

    if len(codes) == 0:
        postings_tbl = pa.table(
            {
                "term": pa.array([], type=pa.string()),
                "doc_freq": pa.array([], type=pa.int64()),
                "total_tf": pa.array([], type=pa.int64()),
                "singleton_doc": pa.array([], type=pa.int32()),
                "singleton_freq": pa.array([], type=pa.int32()),
                "packed": pa.array([], type=pa.binary()),
                "block_last_docs": pa.array([], type=pa.list_(pa.int32())),
                "block_max_freqs": pa.array([], type=pa.list_(pa.int32())),
                "block_min_lens": pa.array([], type=pa.list_(pa.int32())),
                "imp_freqs": pa.array([], type=pa.list_(pa.list_(pa.int32()))),
                "imp_lens": pa.array([], type=pa.list_(pa.list_(pa.int32()))),
                "positions": pa.array([], type=pa.binary()),
                "offsets": pa.array([], type=pa.binary()),
                "payloads": pa.array([], type=pa.binary()),
            }
        )
        stats = dict(max_doc=n_docs, doc_count=0, sum_doc_freq=0, sum_total_term_freq=0)
        if store_term_vectors:
            return postings_tbl, docs_tbl, stats, _empty_vectors_table(n_docs)
        return postings_tbl, docs_tbl, stats

    # Sort (term, doc, position). The tokenizer already dictionary-encoded
    # the batch (Arrow C++ hashing — no object-array np.unique); here we only
    # rank the SMALL vocab into byte order (TermsHashPerField.sortTerms
    # equivalent) and remap the codes. Positions within a (term, doc) group
    # stay ascending because the tokenizer emits them in order and the sort
    # is stable.
    vocab_order = np.argsort(vocab)  # vocab-sized string sort
    rank = np.empty(len(vocab), dtype=np.int32)
    rank[vocab_order] = np.arange(len(vocab), dtype=np.int32)
    uniq_terms = vocab[vocab_order]
    term_codes = rank[codes]
    order = np.lexsort((positions, doc_idx, term_codes))
    tc = term_codes[order]
    dd = doc_idx[order]
    pp = positions[order]

    # Run-length over (term, doc): freqs per posting.
    new_posting = np.ones(len(tc), dtype=bool)
    new_posting[1:] = (tc[1:] != tc[:-1]) | (dd[1:] != dd[:-1])
    posting_starts = np.flatnonzero(new_posting)
    posting_term = tc[posting_starts]
    posting_doc = dd[posting_starts]
    freqs = np.diff(np.append(posting_starts, len(tc))).astype(np.int32)

    # Per-term ranges over the postings arrays.
    new_term = np.ones(len(posting_term), dtype=bool)
    new_term[1:] = posting_term[1:] != posting_term[:-1]
    term_starts = np.flatnonzero(new_term)
    term_ends = np.append(term_starts[1:], len(posting_term))
    doc_freq = (term_ends - term_starts).astype(np.int64)
    # total_tf per term: cumulative sum trick over freqs
    cs = np.concatenate([[0], np.cumsum(freqs, dtype=np.int64)])
    total_tf = cs[term_ends] - cs[term_starts]

    present_terms = uniq_terms[posting_term[term_starts]]

    packed_col: list[bytes] = []
    singleton_doc = np.full(len(term_starts), -1, dtype=np.int32)
    singleton_freq = np.zeros(len(term_starts), dtype=np.int32)
    bld, blf, blm = [], [], []
    impf_col, impl_col = [], []
    pos_col: list[bytes] = []
    dl_by_doc = doc_lengths  # exact lengths for impact bounds

    for i, (s, e) in enumerate(zip(term_starts, term_ends)):
        docs_i = posting_doc[s:e]
        freqs_i = freqs[s:e]
        if e - s == 1:
            singleton_doc[i] = docs_i[0]
            singleton_freq[i] = freqs_i[0]
            packed_col.append(b"")
            bld.append([int(docs_i[0])])
            blf.append([int(freqs_i[0])])
            blm.append([int(dl_by_doc[docs_i[0]])])
            impf_col.append([[int(freqs_i[0])]])
            impl_col.append([[int(dl_by_doc[docs_i[0]])]])
        else:
            packed_col.append(encode_postings(docs_i, freqs_i))
            ld, mf, ml = block_skip_metadata(docs_i, freqs_i, dl_by_doc[docs_i])
            bld.append(ld.tolist())
            blf.append(mf.tolist())
            blm.append(ml.tolist())
            icnt, iff, ill = competitive_impacts(freqs_i, dl_by_doc[docs_i])
            isplit = np.cumsum(icnt)[:-1]
            impf_col.append([a.tolist() for a in np.split(iff, isplit)])
            impl_col.append([a.tolist() for a in np.split(ill, isplit)])
    if store_positions:
        # positions for term i = pp[cs[term_starts[i]] : cs[term_ends[i]]]
        # (doc-major within the term, ascending within each doc).
        pos_col = [
            pp[cs[term_starts[i]] : cs[term_ends[i]]].astype(np.int32).tobytes()
            for i in range(len(term_starts))
        ]
    else:
        pos_col = [b""] * len(term_starts)
    if store_offsets:
        # interleaved (start, end) int32 pairs, same occurrence order as the
        # position stream (doc-major within term)
        interleaved = np.empty(2 * len(order), dtype=np.int32)
        interleaved[0::2] = tok_starts[order]
        interleaved[1::2] = tok_ends[order]
        off_col = [
            interleaved[2 * cs[term_starts[i]] : 2 * cs[term_ends[i]]].tobytes()
            for i in range(len(term_starts))
        ]
    else:
        off_col = [b""] * len(term_starts)
    if store_payloads:
        # one float32 per occurrence, same order as the position stream
        pays_sorted = tok_pays[order].astype(np.float32, copy=False)
        pay_col = [
            pays_sorted[cs[term_starts[i]] : cs[term_ends[i]]].tobytes()
            for i in range(len(term_starts))
        ]
    else:
        pay_col = [b""] * len(term_starts)

    postings_tbl = pa.table(
        {
            "term": pa.array(present_terms.tolist(), type=pa.string()),
            "doc_freq": pa.array(doc_freq),
            "total_tf": pa.array(total_tf),
            "singleton_doc": pa.array(singleton_doc, type=pa.int32()),
            "singleton_freq": pa.array(singleton_freq, type=pa.int32()),
            "packed": pa.array(packed_col, type=pa.binary()),
            "block_last_docs": pa.array(bld, type=pa.list_(pa.int32())),
            "block_max_freqs": pa.array(blf, type=pa.list_(pa.int32())),
            "block_min_lens": pa.array(blm, type=pa.list_(pa.int32())),
            "imp_freqs": pa.array(impf_col, type=pa.list_(pa.list_(pa.int32()))),
            "imp_lens": pa.array(impl_col, type=pa.list_(pa.list_(pa.int32()))),
            "positions": pa.array(pos_col, type=pa.binary()),
            "offsets": pa.array(off_col, type=pa.binary()),
            "payloads": pa.array(pay_col, type=pa.binary()),
        }
    )

    stats = dict(
        max_doc=n_docs,
        doc_count=int((doc_lengths > 0).sum()),
        sum_doc_freq=int(doc_freq.sum()),
        sum_total_term_freq=int(total_tf.sum()),
    )
    if store_term_vectors:
        # doc-major transpose of the postings (Lucene90TermVectorsFormat
        # analogue): one row per doc with (terms, freqs) lists — MLT and
        # highlighting read a doc's terms WITHOUT re-analysis. One extra
        # lexsort of the posting arrays; values dictionary-encoded.
        tvo = np.lexsort((posting_term, posting_doc))
        td, tt, tf_ = posting_doc[tvo], posting_term[tvo], freqs[tvo]
        per_doc = np.bincount(td, minlength=n_docs)
        off = np.zeros(n_docs + 1, dtype=np.int32)
        np.cumsum(per_doc, out=off[1:])
        off_arr = pa.array(off, type=pa.int32())
        term_vals = pa.DictionaryArray.from_arrays(
            pa.array(tt.astype(np.int32), type=pa.int32()),
            pa.array(uniq_terms.tolist(), type=pa.string()))
        vectors_tbl = pa.table({
            "tv_terms": pa.ListArray.from_arrays(off_arr, term_vals),
            "tv_freqs": pa.ListArray.from_arrays(
                off_arr, pa.array(tf_.astype(np.int32), type=pa.int32())),
        })
        return postings_tbl, docs_tbl, stats, vectors_tbl
    return postings_tbl, docs_tbl, stats


def _empty_vectors_table(n_docs: int) -> pa.Table:
    off = pa.array(np.zeros(n_docs + 1, dtype=np.int32), type=pa.int32())
    return pa.table({
        "tv_terms": pa.ListArray.from_arrays(
            off, pa.array([], type=pa.string())),
        "tv_freqs": pa.ListArray.from_arrays(
            off, pa.array([], type=pa.int32())),
    })


FIELD_SEP = "\x1f"  # joins (field, term) into one dictionary key; sorts low


def build_multifield_segment_tables(
    doc_keys: np.ndarray,
    field_texts: dict,
    analyzers,
    *,
    default_field: str,
    store_positions: bool = True,
) -> tuple[pa.Table, pa.Table, dict, dict]:
    """Multi-field invert: one postings dictionary keyed by
    ``field\\x1fterm`` (fields processed in sorted order so the combined
    dictionary stays term-sorted), per-field norm/dl columns
    (``norm__<f>``/``dl__<f>``), per-field statistics.

    This is the reference's per-field FieldInfo/FieldInvertState model
    (index/FieldInfo.java, FieldInvertState.java:34-43): every field gets its
    own postings, norms and CollectionStatistics; BM25 scores each field
    against its own avgdl. The default field also populates the legacy
    ``norm``/``dl`` columns and top-level stats so single-field readers and
    CheckIndex keep working.
    """
    from lucene_ray.functions.analysis import Analyzer

    fields = sorted(field_texts)
    assert default_field in fields
    postings_parts = []
    docs_cols: dict[str, object] = {"doc_key": pa.array(doc_keys)}
    field_stats: dict[str, dict] = {}
    default_stats: dict = {}
    for f in fields:
        an = analyzers[f] if isinstance(analyzers, dict) else analyzers
        assert isinstance(an, Analyzer)
        p_tbl, d_tbl, stats = build_segment_tables(
            doc_keys, field_texts[f], an, store_positions=store_positions
        )
        terms = pa.compute.binary_join_element_wise(
            f + FIELD_SEP, p_tbl.column("term"), ""
        )
        postings_parts.append(p_tbl.set_column(0, "term", terms))
        docs_cols[f"norm__{f}"] = d_tbl.column("norm")
        docs_cols[f"dl__{f}"] = d_tbl.column("dl")
        field_stats[f] = stats
        if f == default_field:
            docs_cols["norm"] = d_tbl.column("norm")
            docs_cols["dl"] = d_tbl.column("dl")
            default_stats = stats
    postings_tbl = pa.concat_tables(postings_parts)
    docs_tbl = pa.table(docs_cols)
    return postings_tbl, docs_tbl, default_stats, field_stats


def write_segment(
    index_dir: str,
    name: str,
    postings_tbl: pa.Table,
    docs_tbl: pa.Table,
    stats: dict,
    extra_meta: dict | None = None,
    vectors_tbl: pa.Table | None = None,
) -> dict:
    """Atomically write a segment directory; returns its manifest entry.
    ``vectors_tbl`` — optional per-doc term vectors (Lucene90TermVectorsFormat
    analogue), written as a side file so search-only readers never load it."""
    seg_root = os.path.join(index_dir, "segments")
    os.makedirs(seg_root, exist_ok=True)
    final = os.path.join(seg_root, name)
    tmp = final + ".tmp-" + uuid.uuid4().hex[:8]
    os.makedirs(tmp, exist_ok=True)
    pq.write_table(postings_tbl, os.path.join(tmp, "postings.parquet"))
    pq.write_table(docs_tbl, os.path.join(tmp, "docs.parquet"))
    if vectors_tbl is not None:
        pq.write_table(vectors_tbl, os.path.join(tmp, "vectors.parquet"))
    checksum = zlib.crc32(
        postings_tbl.schema.serialize().to_pybytes()
        + str(sorted(stats.items())).encode()
    )
    meta = {
        "name": name,
        "n_terms": postings_tbl.num_rows,
        **stats,
        "checksum": checksum,
        **(extra_meta or {}),
    }
    with open(os.path.join(tmp, META_NAME), "w") as f:
        json.dump(meta, f)
    if os.path.exists(final):  # a concurrent retry already committed it
        import shutil

        shutil.rmtree(tmp)
    else:
        try:
            os.rename(tmp, final)
        except OSError:
            import shutil

            shutil.rmtree(tmp, ignore_errors=True)
            if not os.path.exists(final):
                raise
    return meta



def _binary_views(arr) -> tuple[np.ndarray, memoryview]:
    """Zero-copy (byte offsets, data) view of a Binary column — blobs are
    sliced lazily instead of materialized as a Python list per reader."""
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    bufs = arr.buffers()
    width = np.int64 if pa.types.is_large_binary(arr.type) else np.int32
    off = np.frombuffer(bufs[1], dtype=width)[arr.offset : arr.offset + len(arr) + 1]
    data = memoryview(bufs[2]) if bufs[2] is not None else memoryview(b"")
    return off, data


def _list_views(arr) -> tuple[np.ndarray, np.ndarray]:
    """Zero-copy (offsets, values) view of a list<int32> column."""
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    return arr.offsets.to_numpy(), np.asarray(arr.values)


def _nested_views(arr) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Zero-copy (outer offsets, inner offsets, values) of list<list<int32>>."""
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    inner = arr.values
    return arr.offsets.to_numpy(), inner.offsets.to_numpy(), np.asarray(inner.values)


class SegmentReader:
    """Point-in-time reader over one segment (the LeafReader analogue).

    Loads the term dictionary into RAM once (sorted term array → binary
    search, the moral equivalent of the block-tree terms index,
    codecs/lucene90/blocktree/SegmentTermsEnum.java); postings decode on
    demand per term. Intended to live inside a searcher actor's ``__init__``.
    """

    def __init__(self, seg_dir: str, preload: bool = True):
        self.dir = seg_dir
        with open(os.path.join(seg_dir, META_NAME)) as f:
            self.meta = json.load(f)
        self.name = self.meta["name"]
        p = pq.read_table(os.path.join(seg_dir, "postings.parquet"))
        d = pq.read_table(os.path.join(seg_dir, "docs.parquet"))
        self._load(p, d)

    @classmethod
    def from_tables(cls, postings_tbl: pa.Table, docs_tbl: pa.Table, meta: dict) -> "SegmentReader":
        """In-RAM reader over freshly built tables — the MemoryIndex analogue
        (memory/.../MemoryIndex.java:161): no disk round-trip, same read
        surface. Used by the percolator pipeline."""
        r = cls.__new__(cls)
        r.dir = None
        r.meta = dict(meta)
        r.name = meta.get("name", "memory")
        r._load(postings_tbl, docs_tbl)
        return r

    def _load(self, p: pa.Table, d: pa.Table) -> None:
        self._ptable = p  # owns every zero-copy buffer view below
        # term dictionary stays an ARROW string array; term_index/term_range
        # binary-search it with O(log n) .as_py() probes — the full Python
        # string list only materializes if a dictionary SCAN runs (wildcard/
        # regexp/spell/merge), via the lazy .terms property
        ta = p.column("term")
        self._terms_arr = ta.combine_chunks() if isinstance(ta, pa.ChunkedArray) else ta
        self._terms_np: np.ndarray | None = None
        self.n_terms = len(self._terms_arr)
        self.doc_freq = p.column("doc_freq").to_numpy()
        self.total_tf = p.column("total_tf").to_numpy()
        self._singleton_doc = p.column("singleton_doc").to_numpy()
        self._singleton_freq = p.column("singleton_freq").to_numpy()
        # zero-copy Arrow buffer views (no per-term Python objects)
        self._packed_off, self._packed_data = _binary_views(p.column("packed"))
        self._bld_off, self._bld_vals = _list_views(p.column("block_last_docs"))
        self._blf_off, self._blf_vals = _list_views(p.column("block_max_freqs"))
        self._blm_off, self._blm_vals = _list_views(p.column("block_min_lens"))
        if "imp_freqs" in p.column_names:
            self._impf_views = _nested_views(p.column("imp_freqs"))
            self._impl_views = _nested_views(p.column("imp_lens"))
        else:
            self._impf_views = None
            self._impl_views = None
        self._pos_off, self._pos_data = _binary_views(p.column("positions"))
        if "offsets" in p.column_names:
            self._ofs_off, self._ofs_data = _binary_views(p.column("offsets"))
            # vacuously true for a 0-term segment (it must not veto offsets
            # surviving a merge with its siblings)
            self.has_offsets = (
                self.n_terms == 0 or int(self._ofs_off[-1]) > 0
            )
        else:
            self._ofs_off = self._ofs_data = None
            self.has_offsets = False
        if "payloads" in p.column_names:
            self._pay_off, self._pay_data = _binary_views(p.column("payloads"))
            self.has_payloads = (
                self.n_terms == 0 or int(self._pay_off[-1]) > 0
            )
        else:
            self._pay_off = self._pay_data = None
            self.has_payloads = False
        self.doc_keys = d.column("doc_key").to_numpy(zero_copy_only=False)
        self.norms = d.column("norm").to_numpy()
        self.dls = d.column("dl").to_numpy()
        # doc-values columns (NumericDocValues / SortedDocValues analogue):
        # any extra column stored alongside the per-doc norm row.
        # LIST-typed columns are SortedSetDocValues (index/SortedSetDocValues
        # .java): per-doc sets of ordinals into a SORTED per-segment value
        # dictionary, held as (offsets, ord codes, sorted vocab) for
        # vectorized multi-valued facet counting.
        self.doc_values = {}
        self.sorted_set_dv: dict[str, tuple[np.ndarray, np.ndarray, np.ndarray]] = {}
        for c in d.column_names:
            if c in ("doc_key", "norm", "dl") or c.startswith(("norm__", "dl__")):
                continue
            col = d.column(c)
            ctype = col.type
            if pa.types.is_list(ctype) or pa.types.is_large_list(ctype):
                arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
                offsets = np.asarray(arr.offsets).astype(np.int64)
                flat = arr.values
                enc = flat.dictionary_encode()
                codes = np.asarray(enc.indices).astype(np.int32, copy=False)
                vocab = np.asarray(enc.dictionary.to_pylist(), dtype=object)
                order = np.argsort(vocab)  # sorted ords, SortedSetDocValues
                rank = np.empty(len(vocab), dtype=np.int32)
                rank[order] = np.arange(len(vocab), dtype=np.int32)
                self.sorted_set_dv[c] = (offsets, rank[codes], vocab[order])
            else:
                self.doc_values[c] = col.to_numpy(zero_copy_only=False)
        # per-field norms/lengths for multi-field segments (field_stats meta)
        self.norms_by_field = {}
        self.dls_by_field = {}
        for c in d.column_names:
            if c.startswith("norm__"):
                self.norms_by_field[c[6:]] = d.column(c).to_numpy()
            elif c.startswith("dl__"):
                self.dls_by_field[c[4:]] = d.column(c).to_numpy()
        self.max_doc = self.meta["max_doc"]
        # live-docs side bitset (None = all live); attached by the searcher
        # from the manifest's del_gen (deletes.py)
        self.live: np.ndarray | None = None
        # decoded-postings LRU (term cache for hot query terms; bounded —
        # the analogue of reusing a TermsEnum/postings reader across queries)
        self._decode_cache: dict[int, tuple[np.ndarray, np.ndarray]] = {}
        self._decode_cache_max = 256
        self._block_cache: dict[tuple[int, int], tuple[np.ndarray, np.ndarray]] = {}
        self._key_rank: np.ndarray | None = None
        self._char_counts: np.ndarray | None = None

    @property
    def key_rank(self) -> np.ndarray:
        """rank of each local doc's key within the segment (int32) — lets
        every (score, doc_key) tie-break run as integer numpy ops; computed
        once per reader. Fresh segments are key-sorted so rank == docID;
        merged segments are concatenated sorted runs, so compute it."""
        if self._key_rank is None:
            order = np.argsort(self.doc_keys, kind="stable")
            r = np.empty(len(order), dtype=np.int32)
            r[order] = np.arange(len(order), dtype=np.int32)
            self._key_rank = r
        return self._key_rank

    # -- term dictionary ---------------------------------------------------

    @property
    def terms(self) -> np.ndarray:
        """Materialized term strings — LAZY; only dictionary scans (wildcard,
        regexp, spell, merge) pay for it. Point lookups never do."""
        if self._terms_np is None:
            self._terms_np = np.asarray(self._terms_arr.to_pylist(), dtype=object)
        return self._terms_np

    @property
    def char_counts(self) -> np.ndarray:
        """(n_terms, 37) per-term character-class histogram — the q-gram-style
        COUNTING FILTER backing fuzzy-query dictionary pruning (the cheap
        stand-in for the reference's Levenshtein-automaton intersection,
        util/automaton/CompiledAutomaton.java): for any two strings,
        ``max(Σ pos-diff, Σ neg-diff)`` of their histograms lower-bounds the
        edit distance, so most of the dictionary is rejected without running
        the DP. Buckets: a-z → 0-25, 0-9 → 26-35, any other utf-8 LEAD byte
        → 36; continuation bytes are dropped so each CHARACTER contributes
        exactly one count (keeps the bound valid for non-ASCII). Built once
        per reader, fully vectorized from the Arrow string buffer."""
        if self._char_counts is None:
            arr = self._terms_arr
            n = len(arr)
            if n == 0:
                self._char_counts = np.zeros((0, 37), dtype=np.int32)
                return self._char_counts
            bufs = arr.buffers()
            off = np.frombuffer(bufs[1], dtype=np.int32)[arr.offset : arr.offset + n + 1].astype(np.int64)
            data = np.frombuffer(bufs[2], dtype=np.uint8)[off[0] : off[-1]]
            off = off - off[0]
            lens = np.diff(off)
            bucket = _CHAR_BUCKET[data]
            term_id = np.repeat(np.arange(n, dtype=np.int64), lens)
            valid = bucket < 37
            flat = term_id[valid] * 37 + bucket[valid]
            self._char_counts = np.bincount(
                flat, minlength=n * 37
            ).reshape(n, 37).astype(np.int32)
        return self._char_counts

    def term_at(self, i: int) -> str:
        if self._terms_np is not None:
            return self._terms_np[i]
        return self._terms_arr[i].as_py()

    def _bisect_terms(self, key: str, side: str = "left") -> int:
        """searchsorted over the Arrow term array without materializing it
        (O(log n) single-string .as_py() probes)."""
        if self._terms_np is not None:
            return int(np.searchsorted(self._terms_np, key, side=side))
        arr = self._terms_arr
        lo, hi = 0, len(arr)
        if side == "left":
            while lo < hi:
                mid = (lo + hi) // 2
                if arr[mid].as_py() < key:
                    lo = mid + 1
                else:
                    hi = mid
        else:
            while lo < hi:
                mid = (lo + hi) // 2
                if arr[mid].as_py() <= key:
                    lo = mid + 1
                else:
                    hi = mid
        return lo

    def bisect(self, key: str, side: str = "left") -> int:
        return self._bisect_terms(key, side)

    def term_index(self, term: str) -> int:
        """seekExact: index of term or -1."""
        i = self._bisect_terms(term)
        if i < self.n_terms and self.term_at(i) == term:
            return int(i)
        return -1

    def term_range(self, prefix: str) -> tuple[int, int]:
        """seekCeil range scan for PrefixQuery: [lo, hi) of terms with prefix."""
        lo = self._bisect_terms(prefix)
        succ = prefix_successor(prefix)
        hi = self._bisect_terms(succ) if succ is not None else self.n_terms
        return lo, hi

    # -- postings ----------------------------------------------------------

    def postings(self, term: str | int) -> tuple[np.ndarray, np.ndarray]:
        """(sorted local docIDs, freqs) for a term; empty arrays if absent."""
        i = self.term_index(term) if isinstance(term, str) else term
        if i < 0:
            e = np.empty(0, dtype=np.int32)
            return e, e
        if self._singleton_doc[i] >= 0:
            return (
                np.array([self._singleton_doc[i]], dtype=np.int32),
                np.array([self._singleton_freq[i]], dtype=np.int32),
            )
        hit = self._decode_cache.get(i)
        if hit is not None:
            return hit
        out = decode_postings(self._packed_blob(i))
        if len(self._decode_cache) >= self._decode_cache_max:
            self._decode_cache.pop(next(iter(self._decode_cache)))
        self._decode_cache[i] = out
        return out

    def positions(self, term: str | int) -> np.ndarray:
        """Concatenated int32 positions, doc-major, aligned with freqs."""
        i = self.term_index(term) if isinstance(term, str) else term
        if i < 0:
            return np.empty(0, dtype=np.int32)
        sl = self._pos_data[self._pos_off[i] : self._pos_off[i + 1]]
        return np.frombuffer(sl, dtype=np.int32)

    @property
    def has_term_vectors(self) -> bool:
        return self.dir is not None and os.path.exists(
            os.path.join(self.dir, "vectors.parquet"))

    def term_vector(self, doc: int) -> tuple[list[str], np.ndarray]:
        """(terms, freqs) of one doc from the stored doc-major term-vectors
        side file (Lucene90TermVectorsFormat analogue) — no re-analysis, no
        dictionary scan. Lazily loads the file once per reader."""
        tv = getattr(self, "_tv_tbl", None)
        if tv is None:
            if not self.has_term_vectors:
                raise ValueError(
                    f"segment {self.name} was built without "
                    "store_term_vectors=True")
            tv = self._tv_tbl = pq.read_table(
                os.path.join(self.dir, "vectors.parquet"))
        terms = tv.column("tv_terms")[doc].as_py()
        freqs = np.asarray(tv.column("tv_freqs")[doc].as_py(), dtype=np.int64)
        return terms, freqs

    def offsets(self, term: str | int) -> np.ndarray:
        """Interleaved (start, end) int32 char-offset pairs, doc-major,
        aligned with the position stream; empty when the segment was built
        without ``store_offsets`` (the .pay offsets stream analogue)."""
        i = self.term_index(term) if isinstance(term, str) else term
        if i < 0 or self._ofs_off is None:
            return np.empty(0, dtype=np.int32)
        sl = self._ofs_data[self._ofs_off[i] : self._ofs_off[i + 1]]
        return np.frombuffer(sl, dtype=np.int32)

    def offsets_for_doc(self, term: str | int, doc: int) -> tuple[np.ndarray, np.ndarray]:
        """(starts, ends) char offsets of a term's occurrences in ONE doc."""
        i = self.term_index(term) if isinstance(term, str) else term
        e = np.empty(0, dtype=np.int32)
        if i < 0 or self._ofs_off is None:
            return e, e
        d, f = self.postings(i)
        k = int(np.searchsorted(d, doc))
        if k >= len(d) or d[k] != doc:
            return e, e
        base = int(f[:k].sum())
        stream = self.offsets(i)
        sl = stream[2 * base : 2 * (base + int(f[k]))]
        return sl[0::2], sl[1::2]

    def payloads(self, term: str | int) -> np.ndarray:
        """float32 payloads, one per occurrence, doc-major, aligned with the
        position stream; empty when the segment was built without
        ``store_payloads`` (the .pay payload stream analogue,
        Lucene90PostingsWriter writePayloads)."""
        i = self.term_index(term) if isinstance(term, str) else term
        if i < 0 or self._pay_off is None:
            return np.empty(0, dtype=np.float32)
        sl = self._pay_data[self._pay_off[i] : self._pay_off[i + 1]]
        return np.frombuffer(sl, dtype=np.float32)

    def postings_block(self, i: int, j: int) -> tuple[np.ndarray, np.ndarray]:
        """Decode ONLY 128-doc block ``j`` of term ``i`` (absolute docIDs) —
        the ImpactsDISI skip path: pruned blocks are never decoded. Cached
        per (term, block) so adjacent grid intervals reuse the decode."""
        if self._singleton_doc[i] >= 0:
            return (
                np.array([self._singleton_doc[i]], dtype=np.int32),
                np.array([self._singleton_freq[i]], dtype=np.int32),
            )
        full = self._decode_cache.get(i)
        if full is not None:  # whole list already decoded — slice it
            d, f = full
            lo, hi = j * BLOCK_SIZE, (j + 1) * BLOCK_SIZE
            return d[lo:hi], f[lo:hi]
        cache = self._block_cache
        hit = cache.get((i, j))
        if hit is not None:
            return hit
        rel, f, _ = decode_postings_block_range(self._packed_blob(i), j, j + 1)
        bo = self._bld_off
        base = int(self._bld_vals[bo[i] + j - 1]) if j > 0 else 0
        out = ((rel + base).astype(np.int32), f)
        if len(cache) >= 4096:
            cache.pop(next(iter(cache)))
        cache[(i, j)] = out
        return out

    def impacts(self, i: int):
        """Per-block competitive impacts as zero-copy views:
        (pair counts per block, flat freqs, flat lengths) — or None when the
        segment predates the impact columns (fall back to skip_meta)."""
        if self._impf_views is None:
            return None
        o1, o2, vals_f = self._impf_views
        _, _, vals_l = self._impl_views
        b0, b1 = o1[i], o1[i + 1]
        counts = np.diff(o2[b0 : b1 + 1]).astype(np.int64)
        v0, v1 = o2[b0], o2[b1]
        return counts, vals_f[v0:v1], vals_l[v0:v1]

    def _packed_blob(self, i: int) -> memoryview:
        return self._packed_data[self._packed_off[i] : self._packed_off[i + 1]]

    def skip_meta(self, i: int) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
        """Zero-copy views of the per-block skip entries of term ``i``."""
        sl = slice(self._bld_off[i], self._bld_off[i + 1])
        return self._bld_vals[sl], self._blf_vals[sl], self._blm_vals[sl]

    def memory_bytes(self) -> dict:
        """Reader-resident memory: Arrow buffers (shared, zero-copy) vs
        materialized Python objects (lazy term list) — the metric the
        Arrow-native reader exists to keep small."""
        import sys

        py = 0
        if self._terms_np is not None:
            py = sum(sys.getsizeof(t) for t in self._terms_np.tolist())
        return {
            "arrow_bytes": int(self._ptable.nbytes),
            "python_term_bytes": int(py),
            "terms_materialized": self._terms_np is not None,
        }

    def numeric_index(self, field: str) -> tuple[np.ndarray, np.ndarray]:
        """Per-column sorted (values, docIDs) — the 1-D BKD / points analogue
        (util/bkd/BKDWriter.java stores values sorted for range pruning).
        Built lazily ONCE per reader per column; a range query then touches
        only the hits via two binary searches instead of an O(maxDoc) mask."""
        cache = getattr(self, "_num_index", None)
        if cache is None:
            cache = self._num_index = {}
        hit = cache.get(field)
        if hit is None:
            vals = self.doc_values[field]
            order = np.argsort(vals, kind="stable").astype(np.int32)
            hit = cache[field] = (vals[order], order)
        return hit

    def kd_index(self, field_x: str, field_y: str):
        """Lazy per-reader 2-D BKD-style point tree over two doc-values
        columns (functions/points.KDIndex) — cached like numeric_index."""
        cache = getattr(self, "_kd_cache", None)
        if cache is None:
            cache = self._kd_cache = {}
        key = (field_x, field_y)
        hit = cache.get(key)
        if hit is None:
            from lucene_ray.functions.points import KDIndex

            def col(f):
                v = self.doc_values.get(f)
                if v is None and f == self.meta.get("key_col"):
                    return self.doc_keys.astype(np.float64)  # numeric keys only
                if v is None:
                    raise ValueError(
                        f"no doc-values column {f!r} in segment {self.name} "
                        f"(have {sorted(self.doc_values)})"
                    )
                return v

            hit = cache[key] = KDIndex(
                col(field_x),
                col(field_y),
                np.arange(self.max_doc, dtype=np.int32),
            )
        return hit

    def kd_index_nd(self, fields: tuple):
        """Lazy per-reader N-dimensional BKD point tree over doc-values
        columns (functions/points.KDIndexND) — the general-arity variant of
        :meth:`kd_index`, cached per field tuple."""
        cache = getattr(self, "_kd_cache", None)
        if cache is None:
            cache = self._kd_cache = {}
        key = ("nd",) + tuple(fields)
        hit = cache.get(key)
        if hit is None:
            from lucene_ray.functions.points import KDIndexND

            cols = []
            for f in fields:
                v = self.doc_values.get(f)
                if v is None:
                    raise ValueError(
                        f"no doc-values column {f!r} in segment {self.name} "
                        f"(have {sorted(self.doc_values)})")
                cols.append(v)
            hit = cache[key] = KDIndexND(
                cols, np.arange(self.max_doc, dtype=np.int32))
        return hit

    def decoded_lengths(self) -> np.ndarray:
        """float32 lengths as BM25 sees them (through the norm byte)."""
        return decode_norms(self.norms)


def check_segment(seg_dir: str) -> list[str]:
    """CheckIndex-style invariant pass (index/CheckIndex.java:482-770).

    Returns a list of problems (empty = healthy). Verifies: terms sorted
    strictly; per-term docIDs strictly increasing and < maxDoc; doc_freq ==
    len(postings); total_tf == sum(freqs); segment stats equal recomputed
    sums; norms/dl arrays sized maxDoc; norm byte == encode(dl).
    """
    problems = []
    r = SegmentReader(seg_dir)
    t = r.terms
    if len(t) > 1 and not all(t[i] < t[i + 1] for i in range(len(t) - 1)):
        problems.append("terms not strictly sorted")
    sum_df = 0
    sum_ttf = 0
    for i in range(len(t)):
        docs, freqs = r.postings(int(i))
        if len(docs) != r.doc_freq[i]:
            problems.append(f"term {t[i]}: doc_freq {r.doc_freq[i]} != {len(docs)}")
        if freqs.sum() != r.total_tf[i]:
            problems.append(f"term {t[i]}: total_tf mismatch")
        if len(docs) and (np.any(np.diff(docs) <= 0) or docs[-1] >= r.max_doc or docs[0] < 0):
            problems.append(f"term {t[i]}: docIDs not strictly increasing in range")
        if np.any(freqs <= 0):
            problems.append(f"term {t[i]}: non-positive freq")
        bld, _, _ = r.skip_meta(i)
        if len(docs) and int(bld[-1]) != int(docs[-1]):
            problems.append(f"term {t[i]}: skip last_doc mismatch")
        n_blocks_expected = (len(docs) + BLOCK_SIZE - 1) // BLOCK_SIZE
        if len(docs) and len(bld) != n_blocks_expected:
            problems.append(f"term {t[i]}: skip entries {len(bld)} != {n_blocks_expected}")
        sum_df += len(docs)
        sum_ttf += int(freqs.sum())
    fs = r.meta.get("field_stats")
    want_df = sum(v["sum_doc_freq"] for v in fs.values()) if fs else r.meta["sum_doc_freq"]
    want_ttf = (
        sum(v["sum_total_term_freq"] for v in fs.values()) if fs else r.meta["sum_total_term_freq"]
    )
    if sum_df != want_df:
        problems.append(f"sum_doc_freq {want_df} != {sum_df}")
    if sum_ttf != want_ttf:
        problems.append(f"sum_total_term_freq {want_ttf} != {sum_ttf}")
    if len(r.norms) != r.max_doc or len(r.dls) != r.max_doc:
        problems.append("norms/dl length != max_doc")
    if not np.array_equal(encode_lengths(r.dls), r.norms):
        problems.append("norm bytes != encode(dl)")
    if int(r.meta["doc_count"]) != int((r.dls > 0).sum()):
        problems.append("doc_count mismatch")
    # positions / offsets stream lengths (when stored): per term the
    # position stream holds total_tf int32s, the offsets stream 2× that
    if r._pos_off is not None and len(r._pos_off) and int(r._pos_off[-1]) > 0:
        for i in range(len(t)):
            want = int(r.total_tf[i]) * 4
            got = int(r._pos_off[i + 1] - r._pos_off[i])
            if got not in (0, want):
                problems.append(f"term {t[i]}: positions bytes {got} != {want}")
            if r.has_offsets:
                got_o = int(r._ofs_off[i + 1] - r._ofs_off[i])
                if got_o != 2 * want:
                    problems.append(f"term {t[i]}: offsets bytes {got_o} != {2 * want}")
                st = r.offsets(int(i))
                if len(st) and np.any(st[0::2] > st[1::2]):
                    problems.append(f"term {t[i]}: offset start > end")
            if r.has_payloads:
                got_p = int(r._pay_off[i + 1] - r._pay_off[i])
                if got_p != want:
                    problems.append(
                        f"term {t[i]}: payload bytes {got_p} != {want}")
    # term vectors: doc-major transpose must agree with the postings totals
    if r.has_term_vectors:
        tv = pq.read_table(os.path.join(seg_dir, "vectors.parquet"))
        if tv.num_rows != r.max_doc:
            problems.append(f"term vectors rows {tv.num_rows} != max_doc")
        else:
            import pyarrow.compute as pc

            tv_total = int(pc.sum(pc.list_value_length(
                tv.column("tv_freqs"))).as_py() or 0)
            if tv_total != sum_df:
                problems.append(
                    f"term-vector entries {tv_total} != sum_doc_freq {sum_df}")
    # sorted-set doc values: offsets monotone, ords in range, vocab sorted
    for field, (offsets, codes, vocab) in getattr(r, "sorted_set_dv", {}).items():
        if len(offsets) != r.max_doc + 1 or np.any(np.diff(offsets) < 0):
            problems.append(f"sorted-set {field}: bad offsets")
        if len(codes) and (codes.min() < 0 or codes.max() >= len(vocab)):
            problems.append(f"sorted-set {field}: ord out of range")
        if len(vocab) > 1 and not all(
                vocab[i] <= vocab[i + 1] for i in range(len(vocab) - 1)):
            problems.append(f"sorted-set {field}: vocab not sorted")
    return problems

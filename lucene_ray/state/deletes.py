"""Deletes & updates — generational live-docs side bitsets + delete-and-add.

Reference semantics being reproduced:

* deletes never mutate a segment: they are a generational side bitset
  (``.liv``, codecs/lucene90/Lucene90LiveDocsFormat.java:38-52; tracked by
  ``delGen`` in index/SegmentCommitInfo.java:35-65);
* ``IndexWriter.deleteDocuments(term/query)`` marks matching docs dead in
  every segment (index/IndexWriter.java);
* ``IndexWriter.updateDocument(term, doc)`` = delete-by-term + add
  (IndexWriter.java:1815) — here: delete-by-key + a new additive segment;
* collection/term statistics still count deleted docs until a merge
  reclaims them (Lucene scores with deleted docs in the stats too — the
  searcher only FILTERS them, search-time, via the bitset);
* merges drop dead docs and renumber (SegmentMerger + DocIDMerger) —
  ``lucene_ray.state.merge.merge_segment_group`` compacts live docs when a
  bitset is present.

Storage: ``<seg_dir>/livedocs-<delgen>.parquet`` (one boolean column
``live``, one row per local docID), written temp-then-rename; the manifest
entry's ``del_gen``/``del_count`` point at the current generation, so a
commit is still a single atomic manifest write.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from lucene_ray.state.manifest import Manifest, commit_update


def livedocs_path(seg_dir: str, del_gen: int) -> str:
    return os.path.join(seg_dir, f"livedocs-{del_gen}.parquet")


def load_livedocs(seg_dir: str, del_gen: int) -> np.ndarray | None:
    if not del_gen:
        return None
    t = pq.read_table(livedocs_path(seg_dir, del_gen))
    return t.column("live").to_numpy(zero_copy_only=False)


def _write_livedocs(seg_dir: str, del_gen: int, live: np.ndarray) -> None:
    """Exclusive create (os.link fails on EEXIST): two concurrent deleters
    computing the same del_gen for one segment must not silently overwrite
    each other's marks — the loser gets CommitConflict and must redo its
    deletes against the fresh generation."""
    import uuid

    from lucene_ray.state.manifest import CommitConflict

    path = livedocs_path(seg_dir, del_gen)
    tmp = path + ".tmp-" + uuid.uuid4().hex[:8]
    pq.write_table(pa.table({"live": pa.array(live, type=pa.bool_())}), tmp)
    try:
        os.link(tmp, path)
    except FileExistsError:
        raise CommitConflict(
            f"livedocs-{del_gen} already written by a concurrent deleter on "
            f"{seg_dir}; redo the delete against the current manifest"
        ) from None
    finally:
        os.unlink(tmp)


def _commit_or_cleanup(index_dir: str, manifest, changed: dict, written: list[str]) -> None:
    """Commit the per-segment delete marks; if the commit fails (concurrent
    merge consumed one of OUR segments), remove the just-written livedocs
    files so the redo isn't bricked by its own orphans (a stale livedocs-N
    would otherwise make every retry's exclusive create fail forever)."""
    try:
        commit_update(index_dir, manifest, changed)
    except BaseException:
        for p in written:
            try:
                os.unlink(p)
            except OSError:
                pass
        raise


def delete_by_query(index_dir: str, query) -> int:
    """Mark every doc matching ``query`` dead; commits a new manifest
    generation. Returns the number of newly deleted docs."""
    from lucene_ray.query import Query, parse_query
    from lucene_ray.searcher import IndexSearcher

    if isinstance(query, str):
        query = parse_query(query)
    assert isinstance(query, Query)
    manifest = Manifest.load(index_dir)
    searcher = IndexSearcher(index_dir)
    n_deleted = 0
    changed: dict[str, dict] = {}
    written: list[str] = []
    for seg, reader in zip(manifest.segments, searcher.readers):
        assert seg["name"] == reader.name
        sp = searcher._eval(reader, query)
        if not len(sp.docs):
            continue
        old_gen = seg.get("del_gen", 0)
        live = (
            load_livedocs(reader.dir, old_gen)
            if old_gen
            else np.ones(reader.max_doc, dtype=bool)
        ).copy()
        newly = live[sp.docs].sum()
        if newly:
            live[sp.docs] = False
            new_gen = old_gen + 1
            _write_livedocs(reader.dir, new_gen, live)
            written.append(livedocs_path(reader.dir, new_gen))
            n_deleted += int(newly)
            changed[seg["name"]] = {"del_gen": new_gen,
                                    "del_count": int((~live).sum())}
    if n_deleted:
        # only the segments we actually marked ride in `updated` — an
        # unrelated concurrent merge of OTHER segments must not abort us
        _commit_or_cleanup(index_dir, manifest, changed, written)
    return n_deleted


def delete_by_keys(index_dir: str, keys) -> int:
    """deleteDocuments(term) on the document key."""
    # keys live in doc_keys, not the inverted index — do it directly
    manifest = Manifest.load(index_dir)
    from lucene_ray.state.segment import SegmentReader

    keyset = set(keys)
    n_deleted = 0
    changed: dict[str, dict] = {}
    written: list[str] = []
    for seg in manifest.segments:
        seg_dir = os.path.join(index_dir, "segments", seg["name"])
        reader = SegmentReader(seg_dir)
        mask = np.array([k in keyset for k in reader.doc_keys], dtype=bool)
        if not mask.any():
            continue
        old_gen = seg.get("del_gen", 0)
        live = (
            load_livedocs(seg_dir, old_gen)
            if old_gen
            else np.ones(reader.max_doc, dtype=bool)
        ).copy()
        newly = int(live[mask].sum())
        if newly:
            live[mask] = False
            new_gen = old_gen + 1
            _write_livedocs(seg_dir, new_gen, live)
            written.append(livedocs_path(seg_dir, new_gen))
            n_deleted += newly
            changed[seg["name"]] = {"del_gen": new_gen,
                                    "del_count": int((~live).sum())}
    if n_deleted:
        _commit_or_cleanup(index_dir, manifest, changed, written)
    return n_deleted


def update_documents(index_dir: str, rows: pa.Table, *, analyzer_kind: str | None = None) -> int:
    """updateDocument(term, doc) semantics: delete-by-key then add the new
    rows as ONE additive segment (last-writer-wins per key). ``rows`` must
    carry the index's key and text columns (+ any doc-values columns)."""
    from lucene_ray.functions.analysis import get_analyzer
    from lucene_ray.state.segment import build_segment_tables, write_segment

    manifest = Manifest.load(index_dir)
    cfg = manifest.config
    key_col, text_col = cfg["key_col"], cfg["text_col"]
    analyzer = get_analyzer(analyzer_kind or cfg.get("analyzer", "standard"))

    keys_py = rows.column(key_col).to_pylist()
    delete_by_keys(index_dir, keys_py)
    manifest = Manifest.load(index_dir)  # reload post-delete generation

    order = pa.compute.sort_indices(rows.column(key_col))
    rows = rows.take(order)
    keys = rows.column(key_col).to_numpy(zero_copy_only=False)
    postings_tbl, docs_tbl, stats = build_segment_tables(
        keys, rows.column(text_col), analyzer,
        store_positions=cfg.get("store_positions", True),
    )
    for c in cfg.get("docvalue_cols", []):
        docs_tbl = docs_tbl.append_column(c, rows.column(c))
    import uuid

    name = f"upd-g{manifest.gen + 1}-{uuid.uuid4().hex[:8]}"
    meta = write_segment(index_dir, name, postings_tbl, docs_tbl, stats,
                         extra_meta={"gen": manifest.gen + 1, "part_id": None,
                                     "analyzer": analyzer.kind, "key_col": key_col})
    commit_update(index_dir, manifest, {}, appended=[meta])
    return rows.num_rows


def update_numeric_docvalues(index_dir: str, field: str, updates: dict) -> int:
    """IndexWriter.updateNumericDocValue analogue: rewrite ONE doc-values
    column out-of-band, without reindexing.

    Like the reference (SegmentCommitInfo docValuesGen; Lucene90DocValuesFormat
    writes a whole new generation of the field's dv file per update batch),
    each affected segment gets ``dv-<field>-<gen>.parquet`` holding the FULL
    updated column — built from the segment's CURRENT generation, so prior
    updates to other docs carry forward — and the manifest entry's
    ``dv_gens[field]`` advances; readers overlay it at load. Postings/norms/
    stats are untouched (doc-values updates never affect scoring statistics).

    Reads only docs.parquet (doc keys + the one column), never the postings.
    Any failure (exclusive-create race, manifest conflict) removes every dv
    side file this call wrote, so a redo is never bricked by its own orphans.

    ``updates`` maps doc_key → new value. Returns the number of docs updated.
    """
    import uuid as _uuid

    from lucene_ray.state.manifest import CommitConflict, commit_update

    manifest = Manifest.load(index_dir)
    n_updated = 0
    changed: dict[str, dict] = {}
    written: list[str] = []
    keys = set(updates)
    try:
        for seg in manifest.segments:
            seg_dir = os.path.join(index_dir, "segments", seg["name"])
            docs_path = os.path.join(seg_dir, "docs.parquet")
            # the field may not exist as a base column (e.g. the soft-deletes
            # field is usually born as an update) — default to zeros then
            have_base = field in pq.read_schema(docs_path).names
            d = pq.read_table(
                docs_path,
                columns=["doc_key"] + ([field] if have_base else []))
            doc_keys = d.column("doc_key").to_numpy(zero_copy_only=False)
            mask = np.array([k in keys for k in doc_keys], dtype=bool)
            if not mask.any():
                continue
            old_gens = seg.get("dv_gens") or {}
            old_gen = int(old_gens.get(field, 0))
            if old_gen:  # chain from the CURRENT generation, not the base
                vals = pq.read_table(
                    os.path.join(seg_dir, f"dv-{field}-{old_gen}.parquet")
                ).column(field).to_numpy(zero_copy_only=False).copy()
            elif have_base:
                vals = d.column(field).to_numpy(zero_copy_only=False).copy()
            else:
                vals = np.zeros(len(doc_keys), dtype=np.int64)
            for i in np.flatnonzero(mask).tolist():
                vals[i] = updates[doc_keys[i]]
            new_gen = old_gen + 1
            path = os.path.join(seg_dir, f"dv-{field}-{new_gen}.parquet")
            tmp = path + ".tmp-" + _uuid.uuid4().hex[:8]
            pq.write_table(pa.table({field: pa.array(vals)}), tmp)
            try:
                os.link(tmp, path)
            except FileExistsError:
                raise CommitConflict(
                    f"dv-{field}-{new_gen} already written by a concurrent "
                    f"updater on {seg_dir}; redo against the current manifest"
                ) from None
            finally:
                os.unlink(tmp)
            written.append(path)
            changed[seg["name"]] = {"dv_gens": {field: new_gen}}
            n_updated += int(mask.sum())
        if changed:
            commit_update(index_dir, manifest, changed)
    except BaseException:
        for p in written:
            try:
                os.unlink(p)
            except OSError:
                pass
        raise
    return n_updated


# --------------------------------------------------------- soft deletes


def set_soft_deletes_field(index_dir: str, field: str = "__soft_deletes") -> None:
    """IndexWriterConfig.setSoftDeletesField (index/IndexWriterConfig.java:
    519): record the soft-deletes field in the index config so searchers
    hide marked docs (SoftDeletesDirectoryReaderWrapper semantics) and
    merges know which field carries retention state. Idempotent."""
    from lucene_ray.state.manifest import CommitConflict

    for _ in range(8):
        manifest = Manifest.load(index_dir)
        if (manifest.config or {}).get("soft_deletes_field") == field:
            return
        cfg = dict(manifest.config or {})
        cfg["soft_deletes_field"] = field
        try:
            Manifest(index_dir, manifest.gen + 1, manifest.segments, cfg).commit()
            return
        except CommitConflict:
            continue
    raise RuntimeError("could not commit soft_deletes_field config")


def soft_delete_by_keys(index_dir: str, keys, *,
                        field: str = "__soft_deletes") -> int:
    """Soft deletes (IndexWriterConfig.setSoftDeletesField + the soft-delete
    half of IndexWriter.softUpdateDocument, index/IndexWriter.java:1880):
    mark docs deleted by writing ``<field>=1`` as a generational numeric
    doc-values update — NO ``.liv`` bitset. The docs stay physically in the
    segment (retention) and in the collection statistics; a searcher over a
    manifest whose config names the field hides them exactly like hard
    deletes (index/SoftDeletesDirectoryReaderWrapper.java:38). Merges
    reclaim them unless a retention predicate keeps them
    (SoftDeletesRetentionMergePolicy.java:55)."""
    set_soft_deletes_field(index_dir, field)
    return update_numeric_docvalues(index_dir, field, {k: 1 for k in keys})


def soft_update_documents(index_dir: str, rows: pa.Table, *,
                          field: str = "__soft_deletes",
                          analyzer_kind: str | None = None) -> int:
    """IndexWriter.softUpdateDocument: soft-delete the old docs by key, add
    the new rows as one additive segment (LWW per key, old versions
    retained until a merge's retention policy reclaims them)."""
    from lucene_ray.functions.analysis import get_analyzer
    from lucene_ray.state.segment import build_segment_tables, write_segment

    manifest = Manifest.load(index_dir)
    cfg = manifest.config
    key_col, text_col = cfg["key_col"], cfg["text_col"]
    analyzer = get_analyzer(analyzer_kind or cfg.get("analyzer", "standard"))

    soft_delete_by_keys(
        index_dir,
        rows.column(key_col).to_numpy(zero_copy_only=False), field=field)
    manifest = Manifest.load(index_dir)

    order = pa.compute.sort_indices(rows.column(key_col))
    rows = rows.take(order)
    keys = rows.column(key_col).to_numpy(zero_copy_only=False)
    postings_tbl, docs_tbl, stats = build_segment_tables(
        keys, rows.column(text_col), analyzer,
        store_positions=cfg.get("store_positions", True),
    )
    for c in cfg.get("docvalue_cols", []):
        docs_tbl = docs_tbl.append_column(c, rows.column(c))
    import uuid

    name = f"supd-g{manifest.gen + 1}-{uuid.uuid4().hex[:8]}"
    meta = write_segment(index_dir, name, postings_tbl, docs_tbl, stats,
                         extra_meta={"gen": manifest.gen + 1, "part_id": None,
                                     "analyzer": analyzer.kind,
                                     "key_col": key_col})
    commit_update(index_dir, manifest, {}, appended=[meta])
    return rows.num_rows

"""Common-Crawl-style corpus synthesis + HTML text extraction.

The north rule's input is a Parquet table of web pages
``(url:string, warc_ts:timestamp, html:binary, text:string, lang:string)``.
This module deterministically synthesizes that table at any scale from the
driver-provided ``documents`` test table (doc_id, text, lang, source, ...) —
no external data — and provides the inverse HTML→text extractor.

Extraction parity contract (input_hint "byte-identical extracted text per
url"): ``extract_text(make_html(text, title)) == text`` byte-for-byte, for
every document. The extractor mirrors the shape of the reference's
DemoHTMLParser (benchmark/.../feeds/DemoHTMLParser.java:26-123 — title
captured separately, body paragraph text with entities unescaped); golden
tests pin it.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

WARC_EPOCH_US = 1_704_067_200_000_000  # 2024-01-01T00:00:00Z in microseconds

_ESC = [("&", "&amp;"), ("<", "&lt;"), (">", "&gt;")]


def _escape(s: str) -> str:
    for a, b in _ESC:
        s = s.replace(a, b)
    return s


def _unescape(s: str) -> str:
    for a, b in reversed(_ESC):
        s = s.replace(b, a)
    return s


def make_html(text: str, title: str) -> bytes:
    """Wrap text in a deterministic page template (UTF-8 bytes)."""
    return (
        f"<html><head><title>{_escape(title)}</title></head>"
        f"<body><p>{_escape(text)}</p></body></html>"
    ).encode("utf-8")


_TITLE_START = b"<title>"
_TITLE_END = b"</title>"
_BODY_START = b"<body><p>"
_BODY_END = b"</p></body>"


def extract_text(html: bytes) -> str:
    """Body text of a synthesized page — exact inverse of make_html."""
    s = html
    b0 = s.index(_BODY_START) + len(_BODY_START)
    b1 = s.rindex(_BODY_END)
    return _unescape(s[b0:b1].decode("utf-8"))


def extract_title(html: bytes) -> str:
    s = html
    t0 = s.index(_TITLE_START) + len(_TITLE_START)
    t1 = s.index(_TITLE_END)
    return _unescape(s[t0:t1].decode("utf-8"))


def _escape_arr(arr):
    for a, b in _ESC:
        arr = pc.replace_substring(arr, pattern=a, replacement=b)
    return arr


def _unescape_arr(arr):
    for a, b in reversed(_ESC):
        arr = pc.replace_substring(arr, pattern=b, replacement=a)
    return arr


def synthesize_batch(batch: pa.Table, *, replica: int = 0, n_docs_total: int = 0) -> pa.Table:
    """documents rows → web-page rows. Pure per-batch map (no state),
    vectorized end-to-end with Arrow string kernels (no per-row Python).

    ``replica`` > 0 produces additional deterministic copies with distinct
    urls/doc ids (used to scale the bench corpus; text is reused — realistic
    for web crawls, which are duplicate-heavy).
    """
    doc_ids = batch.column("doc_id").to_numpy() + replica * n_docs_total
    id_strs = pa.array(np.char.zfill(doc_ids.astype("U10"), 10))
    texts = batch.column("text")
    urls = pc.binary_join_element_wise(
        "https://example.org/", batch.column("source").cast(pa.string()), "/",
        id_strs, ""
    )
    esc_text = _escape_arr(texts.cast(pa.string()))
    titles = pc.binary_join_element_wise("doc ", pa.array(doc_ids.astype("U20")), "")
    # NB: binary_join_element_wise's LAST argument is the join separator
    html = pc.binary_join_element_wise(
        "<html><head><title>", _escape_arr(titles), "</title></head><body><p>",
        esc_text, "</p></body></html>", ""
    )
    ts = (WARC_EPOCH_US + doc_ids.astype(np.int64) * 7_000_000).astype("datetime64[us]")
    return pa.table(
        {
            "url": urls,
            "warc_ts": pa.array(ts, type=pa.timestamp("us")),
            "html": html.cast(pa.binary()),
            "text": texts,
            "lang": batch.column("lang"),
        }
    )


def extract_batch(batch: pa.Table, *, include_title: bool = False) -> pa.Table:
    """html → text extraction stage (drops the wide html column immediately —
    §SURVEY 7 'project early, keep text only past extraction').

    Verifies the byte-identity invariant when the table still carries the
    original text column. ``include_title`` also extracts the <title> as its
    own field column (DemoHTMLParser keeps title separate from body,
    benchmark/.../feeds/DemoHTMLParser.java:26-123).
    """
    html_str = batch.column("html").cast(pa.string())
    ex = pc.extract_regex(html_str, pattern=r"(?s)<body><p>(?P<body>.*)</p></body>")
    body = pc.struct_field(ex, "body")
    if body.null_count > 0:
        bad = batch.column("url").filter(pc.is_null(body)).to_pylist()[:3]
        raise ValueError(f"extraction failed for {bad}")
    extracted = _unescape_arr(body)
    if "text" in batch.column_names:
        same = pc.all(pc.equal(extracted, batch.column("text").cast(pa.string())))
        if not same.as_py():
            mism = batch.column("url").filter(
                pc.not_equal(extracted, batch.column("text").cast(pa.string()))
            ).to_pylist()[:3]
            raise ValueError(f"extraction mismatch for {mism}")
    keep = [c for c in batch.column_names if c not in ("html", "text")]
    out = batch.select(keep)
    out = out.append_column("text", extracted)
    if include_title:
        tex = pc.extract_regex(html_str, pattern=r"(?s)<title>(?P<t>.*?)</title>")
        out = out.append_column("title", _unescape_arr(pc.struct_field(tex, "t")))
    return out


def synthesize_corpus(sf_dir: str, *, replicas: int = 1, parallelism: int | None = None):
    """documents.parquet under ``sf_dir`` → a web-page Dataset (url, warc_ts,
    html, text, lang). Deterministic for a given (sf_dir, replicas).

    Replication happens INSIDE one map_batches (each input batch emits all of
    its replicas) — one linear read of the source, no n-way ``union`` (a
    40-way chained union builds a quadratically nested plan)."""
    import pyarrow.parquet as pq
    import ray.data

    n_docs_total = pq.ParquetFile(f"{sf_dir}/documents.parquet").metadata.num_rows

    def synth_all(batch: pa.Table) -> pa.Table:
        return pa.concat_tables(
            [
                synthesize_batch(batch, replica=rep, n_docs_total=n_docs_total)
                for rep in range(replicas)
            ]
        )

    from lucene_ray.sources.io import read_parquet_clean

    ds = read_parquet_clean(f"{sf_dir}/documents.parquet")
    # A single small source file arrives as ONE block; split it so the
    # (replicas ×) synthesis work fans out across the cluster instead of
    # running in one task. Repartition moves only the tiny source rows.
    if parallelism:
        ds = ds.repartition(parallelism)
    # keep output batches bounded when replicas is large (html is wide)
    in_batch = max(64, 4096 // max(1, replicas))
    return ds.map_batches(synth_all, batch_format="pyarrow", batch_size=in_batch)


def write_corpus(sf_dir: str, out_dir: str, *, replicas: int = 1) -> str:
    """Materialize the synthesized corpus to partitioned Parquet (the form the
    100 TB input would arrive in)."""
    ds = synthesize_corpus(sf_dir, replicas=replicas)
    ds.write_parquet(out_dir)
    return out_dir

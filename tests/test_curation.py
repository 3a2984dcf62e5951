"""Corpus curation pipeline: quality filter -> language filter -> exact
dedup as one streaming composition (pipelines/curation.py)."""

import pyarrow as pa


def test_curation_planted(ray_session):
    import ray.data

    from lucene_ray.pipelines.curation import curate_corpus

    good = "the quick brown fox jumps over the lazy dog again and again today"
    rows = [
        (1, good, "en"),                      # survives (smallest id of dupes)
        (2, good, "en"),                      # exact dup of 1 -> dropped
        (3, good + " extra words here", "en"),  # distinct -> survives
        (4, good, "de"),                      # wrong language -> dropped
        (5, "short text", "en"),              # too few tokens -> dropped
        (6, "the the the the the the the the the the ok", "en"),  # stopword-heavy -> dropped
        (7, "!!!! ???? $$$$ %%%% ^^^^ &&&& **** (((( )))) @@@@ x", "en"),  # low alpha -> dropped
    ]
    ds = ray.data.from_arrow(pa.table({
        "doc_id": [r[0] for r in rows],
        "text": [r[1] for r in rows],
        "lang": [r[2] for r in rows],
    }))
    out = curate_corpus(ds, min_tokens=10, max_stop_pct=60).to_pandas()
    assert sorted(out.doc_id.tolist()) == [1, 3]
    assert out.n_tokens.min() >= 10


def test_curation_no_lang_column(ray_session):
    import ray.data

    from lucene_ray.pipelines.curation import curate_corpus

    ds = ray.data.from_arrow(pa.table({
        "doc_id": [1, 2],
        "text": ["many reasonable english words flow through this long sentence here"] * 2,
    }))
    out = curate_corpus(ds, lang_col=None, min_tokens=5).to_pandas()
    assert out.doc_id.tolist() == [1]

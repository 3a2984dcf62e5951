"""Deterministic hash sampling — the reproducible substitute for
``Dataset.random_sample`` at 100-TB scale.

``random_sample`` draws fresh randomness per task, so a retried block yields
a different sample — unacceptable when the sample feeds an eval set or a
resumable pipeline. This operator decides membership from a multiplicative
hash of a key column (Knuth 2654435761, the golden-ratio 32-bit constant):
the same (key, salt, rate) always selects the same rows, on any cluster
shape, under any retry, and the selection is expressible in ANSI SQL
(``(key * 2654435761) % 2^32 < rate * 2^32``) so it can be verified by an
oracle. Reference analogue: the sampling collectors / random filters in the
benchmark module; the determinism requirement is ours (resumable 100-TB
runs).

Scale notes: pure per-batch numpy arithmetic inside ``map_batches`` — no
shuffle, no state, no driver involvement; composes with any upstream read.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

KNUTH = np.uint64(2654435761)
MOD32 = np.uint64(1) << np.uint64(32)


def sample_mask(keys: np.ndarray, rate: float, salt: int = 0) -> np.ndarray:
    """Boolean membership for integer keys: ((key + salt) * 2654435761)
    mod 2^32 < rate * 2^32. Keys are taken mod 2^32 first so the product
    stays inside uint64 (documented in the SQL oracle too)."""
    if not (0.0 <= rate <= 1.0):
        raise ValueError(f"rate must be in [0, 1], got {rate}")
    k = (np.asarray(keys).astype(np.uint64) + np.uint64(salt)) % MOD32
    h = (k * KNUTH) % MOD32
    return h < np.uint64(int(rate * float(MOD32)))


def deterministic_sample(ds, key_col: str, rate: float, salt: int = 0):
    """Filter a Dataset to the deterministic ``rate`` fraction keyed on an
    integer column. Streaming, shuffle-free, retry-stable."""

    def fn(batch: pa.Table) -> pa.Table:
        keys = batch.column(key_col).to_numpy(zero_copy_only=False)
        return batch.filter(pa.array(sample_mask(keys, rate, salt)))

    return ds.map_batches(fn, batch_format="pyarrow")


def sample_sql_predicate(key_col: str, rate: float, salt: int = 0) -> str:
    """The DuckDB-equivalent predicate (HUGEINT avoids BIGINT overflow)."""
    thr = int(rate * float(MOD32))
    return (
        f"((({key_col}::HUGEINT + {salt}) % 4294967296) * 2654435761) % 4294967296 < {thr}"
    )

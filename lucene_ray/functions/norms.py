"""SmallFloat norm encoding — exact port of the reference's lossy length byte.

Reference: lucene/core/src/java/org/apache/lucene/util/SmallFloat.java:103-167
(`longToInt4` / `int4ToLong` / `intToByte4` / `byte4ToInt`) and
lucene/core/.../search/similarities/BM25Similarity.java:128-148 (LENGTH_TABLE,
`computeNorm` = ``intToByte4(length - numOverlap)``).

The encoding keeps 4 significant bits: values < 24 are exact, larger values
are bucketed. BM25 sees document length only through this byte, so we must
reproduce it bit-for-bit to stay rank-identical with the reference.

All functions have scalar and vectorized (numpy) forms; the vectorized forms
are the ones used in the invert kernel hot path.
"""

from __future__ import annotations

import numpy as np


def long_to_int4(i: int) -> int:
    """SmallFloat.longToInt4 — float-like order-preserving encoding, 4 sig bits."""
    if i < 0:
        raise ValueError(f"Only supports positive values, got {i}")
    num_bits = i.bit_length()
    if num_bits < 4:
        return i
    shift = num_bits - 4
    encoded = (i >> shift) & 0x07
    return encoded | ((shift + 1) << 3)


def int4_to_long(i: int) -> int:
    """SmallFloat.int4ToLong — inverse of long_to_int4 (lossy)."""
    bits = i & 0x07
    shift = (i >> 3) - 1
    if shift == -1:
        return bits
    return (bits | 0x08) << shift


_MAX_INT4 = long_to_int4(2**31 - 1)
NUM_FREE_VALUES = 255 - _MAX_INT4  # == 24: lengths < 24 encode exactly


def int_to_byte4(i: int) -> int:
    """SmallFloat.intToByte4 — encode a non-negative int to an unsigned byte."""
    if i < 0:
        raise ValueError(f"Only supports positive values, got {i}")
    if i < NUM_FREE_VALUES:
        return i
    return NUM_FREE_VALUES + long_to_int4(i - NUM_FREE_VALUES)


def byte4_to_int(b: int) -> int:
    """SmallFloat.byte4ToInt — decode (b is an unsigned byte 0..255)."""
    if b < NUM_FREE_VALUES:
        return b
    return NUM_FREE_VALUES + int4_to_long(b - NUM_FREE_VALUES)


# 256-entry decode table: LENGTH_TABLE[i] = byte4ToInt((byte) i)
# (BM25Similarity.java:131-135). float32 like the Java float[] cache.
LENGTH_TABLE = np.array([byte4_to_int(i) for i in range(256)], dtype=np.float32)

# Encode table for every length that can round-trip through int32: encoding is
# monotone, so vectorized encode = searchsorted over decode boundaries.
_DECODE_VALUES = np.array([byte4_to_int(i) for i in range(256)], dtype=np.int64)


def encode_lengths(lengths: np.ndarray) -> np.ndarray:
    """Vectorized intToByte4 over an int array → uint8 norm bytes.

    The encoding is monotone non-decreasing, so ``byte = searchsorted(decode
    boundaries, length, side='right') - 1`` reproduces the scalar path.
    """
    lengths = np.asarray(lengths, dtype=np.int64)
    if lengths.size and lengths.min() < 0:
        raise ValueError("lengths must be non-negative")
    return (np.searchsorted(_DECODE_VALUES, lengths, side="right") - 1).astype(np.uint8)


def decode_norms(norm_bytes: np.ndarray) -> np.ndarray:
    """Vectorized byte4ToInt: uint8 norm bytes → float32 decoded lengths."""
    return LENGTH_TABLE[np.asarray(norm_bytes, dtype=np.uint8)]

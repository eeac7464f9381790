"""Lucene SmallFloat norm quantization, vectorized with numpy.

Reimplements (from public apache/lucene source, behavior only):
  - ``longToInt4`` / ``int4ToLong``  (lucene/core/src/java/org/apache/lucene/util/SmallFloat.java:102-137)
  - ``intToByte4`` / ``byte4ToInt``  (SmallFloat.java:139-167)

The norm byte is a float-like code with a 4-bit mantissa: exact for small
integers (``i < NUM_FREE_VALUES``), lossy above. BM25 decodes it through a
256-entry table (BM25Similarity.java:149-155), so replicating this exactly
is required for score parity (SURVEY.md §4.4).
"""

from __future__ import annotations

import numpy as np


def long_to_int4(i: np.ndarray) -> np.ndarray:
    """Vectorized SmallFloat.longToInt4 for non-negative int64 arrays."""
    i = np.asarray(i, dtype=np.int64)
    if np.any(i < 0):
        raise ValueError("Only supports positive values")
    # numBits = 64 - numberOfLeadingZeros(i); for i==0 -> 0
    num_bits = np.zeros_like(i)
    nz = i > 0
    num_bits[nz] = np.floor(np.log2(i[nz].astype(np.float64))).astype(np.int64) + 1
    # float log2 can be off by one near powers of two; correct exactly
    too_high = nz & (i < (np.int64(1) << np.maximum(num_bits - 1, 0)))
    num_bits[too_high] -= 1
    too_low = nz & (num_bits < 63) & (i >= (np.int64(1) << np.minimum(num_bits, 62)))
    num_bits[too_low] += 1

    subnormal = num_bits < 4
    shift = num_bits - 4
    encoded = np.where(subnormal, i, (i >> np.maximum(shift, 0)) & 0x07)
    encoded = np.where(subnormal, encoded, encoded | ((shift + 1) << 3))
    return encoded.astype(np.int64)


def int4_to_long(code: np.ndarray) -> np.ndarray:
    """Vectorized SmallFloat.int4ToLong."""
    code = np.asarray(code, dtype=np.int64)
    bits = code & 0x07
    shift = (code >> 3) - 1
    return np.where(shift == -1, bits, (bits | 0x08) << np.maximum(shift, 0)).astype(np.int64)


MAX_INT4 = int(long_to_int4(np.array([2**31 - 1]))[0])
NUM_FREE_VALUES = 255 - MAX_INT4


def int_to_byte4(i: np.ndarray) -> np.ndarray:
    """Vectorized SmallFloat.intToByte4: int doclen -> unsigned byte code 0..255."""
    i = np.asarray(i, dtype=np.int64)
    if np.any(i < 0):
        raise ValueError("Only supports positive values")
    small = i < NUM_FREE_VALUES
    out = np.where(small, i, NUM_FREE_VALUES + long_to_int4(np.maximum(i - NUM_FREE_VALUES, 0)))
    return out.astype(np.int64)


def byte4_to_int(b: np.ndarray) -> np.ndarray:
    """Vectorized SmallFloat.byte4ToInt: unsigned byte code 0..255 -> int."""
    b = np.asarray(b, dtype=np.int64) & 0xFF
    small = b < NUM_FREE_VALUES
    return np.where(small, b, NUM_FREE_VALUES + int4_to_long(np.maximum(b - NUM_FREE_VALUES, 0))).astype(np.int64)


# 256-entry decode table, mirror of BM25Similarity.LENGTH_TABLE
LENGTH_TABLE = byte4_to_int(np.arange(256)).astype(np.float32)

"""Golden vectors for SmallFloat norm quantization (FIXTURES.md §5).

Goldens computed by hand from the SmallFloat.java algorithm
(lucene/core/src/java/org/apache/lucene/util/SmallFloat.java:102-167):
MAX_INT4 = longToInt4(2^31-1) = 0x07 | ((27+1)<<3) = 231 -> NUM_FREE_VALUES = 24.
"""

import numpy as np
import pytest

from lucene_spark.functions.smallfloat import (
    LENGTH_TABLE,
    NUM_FREE_VALUES,
    byte4_to_int,
    int4_to_long,
    int_to_byte4,
    long_to_int4,
)


def test_constants():
    assert NUM_FREE_VALUES == 24


def ref_long_to_int4(i: int) -> int:
    num_bits = i.bit_length()
    if num_bits < 4:
        return i
    shift = num_bits - 4
    return ((i >> shift) & 0x07) | ((shift + 1) << 3)


def ref_int4_to_long(i: int) -> int:
    bits = i & 0x07
    shift = (i >> 3) - 1
    return bits if shift == -1 else (bits | 0x08) << shift


def ref_int_to_byte4(i: int) -> int:
    if i < NUM_FREE_VALUES:
        return i
    return NUM_FREE_VALUES + ref_long_to_int4(i - NUM_FREE_VALUES)


def ref_byte4_to_int(b: int) -> int:
    if b < NUM_FREE_VALUES:
        return b
    return NUM_FREE_VALUES + ref_int4_to_long(b - NUM_FREE_VALUES)


def test_long_to_int4_matches_scalar_ref():
    vals = np.array(
        [0, 1, 7, 8, 15, 16, 17, 31, 32, 39, 40, 63, 64, 100, 255, 256,
         1000, 10**6, 2**31 - 1, 2**40, 2**62],
        dtype=np.int64,
    )
    got = long_to_int4(vals)
    want = [ref_long_to_int4(int(v)) for v in vals]
    assert got.tolist() == want
    # round trip: decoded <= original, and re-encode is stable
    dec = int4_to_long(got)
    assert np.all(dec <= vals)
    assert long_to_int4(dec).tolist() == got.tolist()


def test_intToByte4_golden_boundaries():
    """FIXTURES.md §5 boundary doclens. Exact for i < 40."""
    doclens = list(range(0, 41)) + [64, 100, 255, 1000, 10**6]
    enc = int_to_byte4(np.array(doclens))
    dec = byte4_to_int(enc)
    for dl, e, d in zip(doclens, enc.tolist(), dec.tolist()):
        assert e == ref_int_to_byte4(dl)
        assert d == ref_byte4_to_int(e)
        if dl < 40:
            assert d == dl  # exact below 40 (24 free + 16 exact int4 codes)
        assert d <= dl


def test_byte4_roundtrip_all_codes():
    codes = np.arange(256)
    dec = byte4_to_int(codes)
    # order-preserving: greater byte -> greater or equal decoded length
    assert np.all(np.diff(dec) >= 0)
    # re-encoding a decoded value returns the same code
    assert int_to_byte4(dec).tolist() == codes.tolist()


def test_length_table():
    assert LENGTH_TABLE.dtype == np.float32
    assert LENGTH_TABLE[0] == 0.0
    assert LENGTH_TABLE[39] == 39.0
    # LENGTH_TABLE is float32 like Lucene's Java float[]; huge decoded
    # lengths round the same way in both (BM25Similarity.java:149-155)
    assert np.float32(byte4_to_int(np.array([255]))[0]) == LENGTH_TABLE[255]


def test_exhaustive_encode_monotone():
    i = np.arange(0, 200000)
    enc = int_to_byte4(i)
    assert np.all(np.diff(enc) >= 0)
    assert enc.max() <= 255
    scalar = np.array([ref_int_to_byte4(int(v)) for v in i[:5000]])
    assert np.array_equal(enc[:5000], scalar)


def test_negative_raises():
    with pytest.raises(ValueError):
        int_to_byte4(np.array([-1]))

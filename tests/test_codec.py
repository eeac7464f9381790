"""Posting-block codec round-trip vectors (FIXTURES.md §6)."""

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from lucene_spark.functions.codec import (
    BLOCK_SIZE,
    decode_block,
    encode_block,
    encode_postings,
    pack_bits,
    unpack_bits,
    varint_decode,
    varint_encode,
)


def test_block_size_is_256():
    # Lucene104PostingsFormat block size (ForUtil.java:34)
    assert BLOCK_SIZE == 256


def roundtrip(docids, tfs, norms):
    d, t, n = decode_block(encode_block(np.array(docids), np.array(tfs), np.array(norms)))
    assert d.tolist() == list(docids)
    assert t.tolist() == list(tfs)
    assert n.tolist() == list(norms)


def test_singleton_block():
    # df=1 singleton case (Lucene104PostingsFormat.java:138-140)
    roundtrip([12345678901], [7], [40])


def test_dense_gaps_of_one():
    ids = list(range(100, 356))
    roundtrip(ids, [1] * 256, [3] * 256)


def test_large_gaps():
    ids = [0, 1, 10**6, 10**9, 10**12]
    roundtrip(ids, [1, 2, 3, 1000, 1], [0, 255, 1, 128, 40])


def test_all_ones_tf_packs_to_zero_width():
    ids = list(range(0, 512, 2))
    data = encode_block(np.array(ids), np.ones(256, dtype=np.int64), np.full(256, 5))
    w0, w1, w2 = np.frombuffer(data[:3], dtype=np.uint8)
    assert w1 == 0  # freq-omitted-style optimization
    roundtrip(ids, [1] * 256, [5] * 256)


def test_encode_postings_blocks_and_metadata():
    n = 600  # 256 + 256 + 88 tail
    ids = np.cumsum(np.arange(1, n + 1))
    tfs = (ids % 9) + 1
    norms = (ids % 200) + 1
    blocks, firsts, lasts, maxtfs, minnorms, impacts = encode_postings(ids, tfs, norms)
    assert len(blocks) == 3
    assert firsts == [int(ids[0]), int(ids[256]), int(ids[512])]
    assert lasts == [int(ids[255]), int(ids[511]), int(ids[599])]
    got_ids, got_tfs, got_norms = [], [], []
    for i, blk in enumerate(blocks):
        d, t, nn = decode_block(blk)
        assert maxtfs[i] == t.max()
        assert minnorms[i] == nn.min()
        got_ids += d.tolist()
        got_tfs += t.tolist()
        got_norms += nn.tolist()
    assert got_ids == ids.tolist()
    assert got_tfs == tfs.tolist()
    assert got_norms == norms.tolist()


def test_exactly_256_and_257():
    for n in (255, 256, 257):
        ids = np.arange(n) * 3 + 7
        blocks, *_ = encode_postings(ids, np.ones(n, dtype=np.int64), np.full(n, 9))
        assert len(blocks) == (1 if n <= 256 else 2)
        dec = np.concatenate([decode_block(b)[0] for b in blocks])
        assert dec.tolist() == ids.tolist()


def test_pack_bits_roundtrip():
    for width in (0, 1, 3, 7, 8, 13, 31, 40):
        vals = np.arange(100, dtype=np.int64) % (1 << max(width, 1))
        if width == 0:
            vals = np.zeros(100, dtype=np.int64)
        got = unpack_bits(pack_bits(vals, width), 100, width)
        assert got.tolist() == vals.tolist()


def test_varint_golden():
    # LEB128: 0->00, 127->7f, 128->80 01, 300->ac 02
    assert varint_encode(np.array([0])) == b"\x00"
    assert varint_encode(np.array([127])) == b"\x7f"
    assert varint_encode(np.array([128])) == b"\x80\x01"
    assert varint_encode(np.array([300])) == b"\xac\x02"
    assert varint_decode(b"\xac\x02\x7f\x00").tolist() == [300, 127, 0]


@settings(max_examples=200, deadline=None)
@given(st.lists(st.integers(min_value=0, max_value=2**62), max_size=300))
def test_varint_roundtrip_property(vals):
    arr = np.array(vals, dtype=np.int64)
    assert varint_decode(varint_encode(arr)).tolist() == vals


@settings(max_examples=100, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=2**40),
            st.integers(min_value=1, max_value=10**6),
            st.integers(min_value=0, max_value=255),
        ),
        min_size=1,
        max_size=700,
    )
)
def test_block_roundtrip_property(rows):
    ids = np.cumsum(np.array(sorted({r[0] for r in rows}), dtype=np.int64) + 0)
    ids = np.unique(np.array(sorted({r[0] for r in rows}), dtype=np.int64))
    n = len(ids)
    tfs = np.array([rows[i % len(rows)][1] for i in range(n)], dtype=np.int64)
    norms = np.array([rows[i % len(rows)][2] for i in range(n)], dtype=np.int64)
    blocks, firsts, lasts, _, _, _ = encode_postings(ids, tfs, norms)
    dec_ids = np.concatenate([decode_block(b)[0] for b in blocks])
    dec_tfs = np.concatenate([decode_block(b)[1] for b in blocks])
    dec_norms = np.concatenate([decode_block(b)[2] for b in blocks])
    assert dec_ids.tolist() == ids.tolist()
    assert dec_tfs.tolist() == tfs.tolist()
    assert dec_norms.tolist() == norms.tolist()
    assert firsts[0] == ids[0] and lasts[-1] == ids[-1]


def test_empty_varint():
    assert varint_encode(np.array([], dtype=np.int64)) == b""
    assert varint_decode(b"").tolist() == []


def test_segment_encoder_byte_identical_to_per_term():
    """The vectorized whole-segment encoder must produce EXACTLY the bytes
    and skip metadata of the per-term encode_postings path."""
    import numpy as np

    from lucene_spark.functions.codec import encode_postings, encode_segment_postings

    rng = np.random.default_rng(3)
    for trial in range(15):
        n_terms = int(rng.integers(1, 150))
        lens = rng.integers(1, 700, size=n_terms)
        N = int(lens.sum())
        ts = np.concatenate(([0], np.cumsum(lens)[:-1]))
        te = np.cumsum(lens)
        ids = np.concatenate(
            [np.sort(rng.choice(100_000, size=l, replace=False)) for l in lens]
        ).astype(np.int64)
        tfs = rng.integers(1, 30, size=N).astype(np.int64)
        norms = rng.integers(0, 256, size=N).astype(np.int64)
        nbt, bf, bl, mtf, mnn, boff, buf, imp_flat, imp_counts = encode_segment_postings(
            ids, tfs, norms, ts, te)
        imp_off = np.concatenate(([0], np.cumsum(2 * imp_counts)))
        bi = 0
        for t in range(n_terms):
            blocks, firsts, lasts, maxtfs, minnorms, impacts = encode_postings(
                ids[ts[t]:te[t]], tfs[ts[t]:te[t]], norms[ts[t]:te[t]]
            )
            assert nbt[t] == len(blocks)
            for j, blk in enumerate(blocks):
                assert buf[boff[bi]:boff[bi + 1]].tobytes() == blk
                assert (bf[bi], bl[bi], mtf[bi], mnn[bi]) == (
                    firsts[j], lasts[j], maxtfs[j], minnorms[j],
                )
                # competitive impact pairs identical between the two paths
                assert imp_flat[imp_off[bi]:imp_off[bi + 1]].tolist() == impacts[j].tolist()
                bi += 1
        assert bi == len(bf)


def test_segment_encoder_empty():
    import numpy as np

    from lucene_spark.functions.codec import encode_segment_postings

    z = np.empty(0, np.int64)
    nbt, bf, bl, mtf, mnn, boff, buf, imp_flat, imp_counts = encode_segment_postings(z, z, z, z, z)
    assert len(nbt) == 0 and len(buf) == 0

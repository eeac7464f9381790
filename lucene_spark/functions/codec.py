"""Posting-list block codec: delta + FOR bit-packing (+ VarInt), numpy-vectorized.

Behavioral model (from public apache/lucene source, behavior only):
  - 256-int blocks, delta-coded docIDs, FOR ("frame of reference") bit
    packing [lucene/core/src/java/org/apache/lucene/codecs/lucene104/ForUtil.java:34,
    Lucene104PostingsFormat.java:44-59]
  - tail block (< 256 entries) VarInt-encoded [Lucene104PostingsFormat.java:53-54]
  - per-block skip metadata with competitive impacts for block-max WAND
    [Lucene104PostingsFormat.java:60-63, CompetitiveImpactAccumulator.java:26]

We do NOT reproduce the on-disk byte format, only the structure: blocks of
<= 256 postings stored as binary columns with per-block metadata
(first/last docid, max tf, min norm byte) enabling block skipping before
decode. All encode/decode is numpy (no per-row Python).

Each block binary layout (little-endian):
  u8 widths[3]           bit widths for (docid-deltas, tfs, norms)
  u16 count              number of postings in block
  i64 first_docid        base for delta decode
  packed deltas          count values, width[0] bits each (delta to previous,
                         first delta = 0)
  packed tfs             count values of (tf - 1), width[1] bits
  packed norms           count values, width[2] bits
"""

from __future__ import annotations

import numpy as np

BLOCK_SIZE = 256


def pack_bits(values: np.ndarray, width: int) -> bytes:
    """Bit-pack non-negative int64 values into `width` bits each (LSB-first)."""
    if width == 0:
        return b""
    vals = np.asarray(values, dtype=np.uint64)
    shifts = np.arange(width, dtype=np.uint64)
    bits = ((vals[:, None] >> shifts) & np.uint64(1)).astype(np.uint8)
    return np.packbits(bits.reshape(-1), bitorder="little").tobytes()


def unpack_bits(data: bytes, count: int, width: int) -> np.ndarray:
    """Inverse of pack_bits -> int64 array of `count` values."""
    if width == 0:
        return np.zeros(count, dtype=np.int64)
    bits = np.unpackbits(np.frombuffer(data, dtype=np.uint8), bitorder="little")
    bits = bits[: count * width].reshape(count, width).astype(np.uint64)
    shifts = np.arange(width, dtype=np.uint64)
    return (bits << shifts).sum(axis=1).astype(np.int64)


def _width(max_val: int) -> int:
    return int(max_val).bit_length()


def encode_block(docids: np.ndarray, tfs: np.ndarray, norms: np.ndarray) -> bytes:
    """Encode one block (<= BLOCK_SIZE sorted docids, parallel tfs, norm bytes)."""
    docids = np.asarray(docids, dtype=np.int64)
    tfs = np.asarray(tfs, dtype=np.int64)
    norms = np.asarray(norms, dtype=np.int64)
    n = len(docids)
    deltas = np.empty(n, dtype=np.int64)
    deltas[0] = 0
    np.subtract(docids[1:], docids[:-1], out=deltas[1:])
    tfm1 = tfs - 1  # tf >= 1 always; all-1s tf block packs to width 0
    w0 = _width(int(deltas.max())) if n > 1 else 0
    w1 = _width(int(tfm1.max())) if tfm1.any() else 0
    w2 = _width(int(norms.max())) if norms.any() else 0
    header = np.array([w0, w1, w2], dtype=np.uint8).tobytes()
    header += np.array([n], dtype=np.uint16).tobytes()
    header += np.array([docids[0]], dtype=np.int64).tobytes()
    return header + pack_bits(deltas, w0) + pack_bits(tfm1, w1) + pack_bits(norms, w2)


def decode_block(data: bytes):
    """Decode one block -> (docids, tfs, norms) int64 arrays."""
    w0, w1, w2 = np.frombuffer(data[:3], dtype=np.uint8)
    n = int(np.frombuffer(data[3:5], dtype=np.uint16)[0])
    first = int(np.frombuffer(data[5:13], dtype=np.int64)[0])
    off = 13
    nb0 = (n * int(w0) + 7) // 8
    nb1 = (n * int(w1) + 7) // 8
    deltas = unpack_bits(data[off : off + nb0], n, int(w0))
    tfs = unpack_bits(data[off + nb0 : off + nb0 + nb1], n, int(w1)) + 1
    norms = unpack_bits(data[off + nb0 + nb1 :], n, int(w2))
    docids = deltas.cumsum() + first
    return docids, tfs, norms


def block_impact_pairs(tfs: np.ndarray, norms: np.ndarray) -> np.ndarray:
    """Competitive (tf, doclen) impact pairs for ONE block, interleaved
    [tf0, dl0, tf1, dl1, ...] with tf strictly ascending.

    The reference keeps the full set of competitive freq/norm pairs per
    block instead of the loose (max_tf, min_doclen) corner
    (codecs/CompetitiveImpactAccumulator.java:26,64): the block score
    upper bound becomes max over pairs of score(tf_i, dl_i), which is
    tight for UNBOUNDED tf shapes (Classic's sqrt(tf)) where the corner
    massively over-estimates. Construction: one pair per distinct tf,
    dl = min doclen among that tf's postings — every actual posting
    (tf_p, dl_p) is dominated by its own tf's pair (equal tf, dl <= dl_p),
    so the max-over-pairs bound is sound for every monotone similarity.
    Deterministic and identical between the per-term and whole-segment
    encoders (no dominance pruning, so both paths emit the same pairs)."""
    tfs = np.asarray(tfs, dtype=np.int64)
    norms = np.asarray(norms, dtype=np.int64)
    order = np.lexsort((norms, tfs))
    t_s, d_s = tfs[order], norms[order]
    first = np.concatenate(([True], t_s[1:] != t_s[:-1]))
    out = np.empty(2 * int(first.sum()), dtype=np.int32)
    out[0::2] = t_s[first]
    out[1::2] = d_s[first]
    return out


def encode_postings(docids: np.ndarray, tfs: np.ndarray, norms: np.ndarray):
    """Cut a sorted posting list into BLOCK_SIZE blocks with skip metadata.

    Returns parallel lists: (block_bytes, first_docid, last_docid, max_tf,
    min_norm, impact_pairs). min_norm is the minimum norm *byte* in the
    block; because byte4 codes are order-preserving, min byte == min
    doclen, which gives a sound per-block score upper bound
    score(max_tf, min_norm) for block-max pruning (score is monotone up in
    tf, down in doclen). impact_pairs is the per-block competitive
    (tf, doclen) frontier (block_impact_pairs) — the tighter bound.
    """
    docids = np.asarray(docids, dtype=np.int64)
    tfs = np.asarray(tfs, dtype=np.int64)
    norms = np.asarray(norms, dtype=np.int64)
    blocks, firsts, lasts, maxtfs, minnorms, impacts = [], [], [], [], [], []
    for s in range(0, len(docids), BLOCK_SIZE):
        e = min(s + BLOCK_SIZE, len(docids))
        blocks.append(encode_block(docids[s:e], tfs[s:e], norms[s:e]))
        firsts.append(int(docids[s]))
        lasts.append(int(docids[e - 1]))
        maxtfs.append(int(tfs[s:e].max()))
        minnorms.append(int(norms[s:e].min()))
        impacts.append(block_impact_pairs(tfs[s:e], norms[s:e]))
    return blocks, firsts, lasts, maxtfs, minnorms, impacts


def encode_segment_postings(
    ids: np.ndarray,
    tfs: np.ndarray,
    norms: np.ndarray,
    term_starts: np.ndarray,
    term_ends: np.ndarray,
):
    """Vectorized WHOLE-SEGMENT block encoder.

    Produces bytes identical to running encode_postings per term (tested),
    with zero per-term / per-block Python: block boundaries, widths, skip
    metadata, headers and the bit-packed payloads are all computed with
    numpy over the full posting array (scatter bits -> one np.packbits).
    This is the build hot path — per-term loops cost ~50 us/term, which at
    real-code vocabularies (~100k terms/segment) dominates the invert.

    Returns (nb_per_term, block_first, block_last, block_maxtf,
    block_minnorm, block_byte_off[int64, nb+1], buf[uint8]) where block
    b's bytes are buf[off[b]:off[b+1]], blocks ordered term-major.
    """
    N = len(ids)
    n_terms = len(term_starts)
    if N == 0 or n_terms == 0:
        z = np.empty(0, np.int64)
        return (z, z, z, z, z, np.zeros(1, np.int64), np.empty(0, np.uint8),
                np.empty(0, np.int32), z)
    ids = np.asarray(ids, dtype=np.int64)
    tfs = np.asarray(tfs, dtype=np.int64)
    norms = np.asarray(norms, dtype=np.int64)
    term_starts = np.asarray(term_starts, dtype=np.int64)
    term_ends = np.asarray(term_ends, dtype=np.int64)

    term_len = term_ends - term_starts
    term_idx = np.repeat(np.arange(n_terms, dtype=np.int64), term_len)
    pos_in_term = np.arange(N, dtype=np.int64) - term_starts[term_idx]
    slot = pos_in_term & (BLOCK_SIZE - 1)
    is_bs = slot == 0
    bs = np.flatnonzero(is_bs)
    be = np.concatenate((bs[1:], [N]))
    nb = len(bs)
    cnt = be - bs
    nb_per_term = np.add.reduceat(is_bs.astype(np.int64), term_starts)

    d = np.empty(N, dtype=np.int64)
    d[0] = 0
    np.subtract(ids[1:], ids[:-1], out=d[1:])
    d[bs] = 0
    tfm1 = tfs - 1

    def _bitlen(v: np.ndarray) -> np.ndarray:
        out = np.zeros(len(v), dtype=np.int64)
        nz = v > 0
        # exact for v < 2^53 (docids/tfs/norm bytes are far below)
        out[nz] = np.floor(np.log2(v[nz].astype(np.float64))).astype(np.int64) + 1
        return out

    w0 = _bitlen(np.maximum.reduceat(d, bs))
    w1 = _bitlen(np.maximum.reduceat(tfm1, bs))
    w2 = _bitlen(np.maximum.reduceat(norms, bs))

    pb0 = (cnt * w0 + 7) >> 3
    pb1 = (cnt * w1 + 7) >> 3
    pb2 = (cnt * w2 + 7) >> 3
    bsize = 13 + pb0 + pb1 + pb2
    boff = np.concatenate(([0], np.cumsum(bsize)))
    total = int(boff[-1])
    out = np.zeros(total, dtype=np.uint8)

    # headers: u8 widths[3], u16 count, i64 first_docid (little-endian)
    ho = boff[:-1]
    out[ho] = w0
    out[ho + 1] = w1
    out[ho + 2] = w2
    out[ho + 3] = cnt & 0xFF
    out[ho + 4] = (cnt >> 8) & 0xFF
    first = ids[bs]
    for k in range(8):
        out[ho + 5 + k] = (first >> (8 * k)) & 0xFF

    # payload: scatter every value's bits into one flat bit array (LSB-first
    # per value, per-block streams byte-aligned), then a single packbits
    bitbuf = np.zeros(total * 8, dtype=np.uint8)
    bop = np.cumsum(is_bs) - 1  # block index per posting
    s0 = (ho + 13) * 8
    s1 = s0 + pb0 * 8
    s2 = s1 + pb1 * 8
    for vals, w_arr, sbits in ((d, w0, s0), (tfm1, w1, s1), (norms, w2, s2)):
        wp = w_arr[bop]
        base = sbits[bop] + slot * wp
        for w in np.unique(w_arr):
            if w == 0:
                continue
            sel = np.flatnonzero(wp == w)
            if len(sel) == 0:
                continue
            v = vals[sel].astype(np.uint64)
            b = base[sel]
            for k in range(int(w)):
                bitbuf[b + k] = (v >> np.uint64(k)) & np.uint64(1)
    out |= np.packbits(bitbuf, bitorder="little")

    block_last = ids[be - 1]
    block_maxtf = np.maximum.reduceat(tfs, bs)
    block_minnorm = np.minimum.reduceat(norms, bs)

    # competitive impact pairs per block, vectorized over ALL blocks: one
    # (tf, min doclen) pair per distinct tf within each block, tf ascending
    # (block_impact_pairs semantics; CompetitiveImpactAccumulator.java:26).
    # One lexsort of the whole posting array + groupby-first — no per-block
    # Python. Pairs are interleaved [tf, dl, tf, dl, ...] block-major.
    iorder = np.lexsort((norms, tfs, bop))
    kb, kt, kd = bop[iorder], tfs[iorder], norms[iorder]
    newg = np.concatenate(([True], (kb[1:] != kb[:-1]) | (kt[1:] != kt[:-1])))
    pair_block = kb[newg]
    imp_flat = np.empty(2 * len(pair_block), dtype=np.int32)
    imp_flat[0::2] = kt[newg]
    imp_flat[1::2] = kd[newg]
    imp_counts = np.bincount(pair_block, minlength=nb).astype(np.int64)

    return (nb_per_term, first, block_last, block_maxtf, block_minnorm, boff,
            out, imp_flat, imp_counts)


# --- Positions stream (IndexOptions DOCS_AND_FREQS_AND_POSITIONS,
# --- lucene/core/src/java/org/apache/lucene/index/IndexOptions.java:30-56;
# --- Lucene stores position deltas in the .pos stream per posting,
# --- Lucene104PostingsFormat.java:160-195). One blob per 256-posting block:
# --- varint stream where each posting's first value is its absolute first
# --- position and the rest are ascending gaps; the block's tf values give
# --- the per-posting counts, so no extra framing is needed.

def encode_block_positions(positions: np.ndarray, tfs: np.ndarray) -> bytes:
    """Encode concatenated per-posting ascending positions (len == tfs.sum())."""
    positions = np.asarray(positions, dtype=np.int64)
    tfs = np.asarray(tfs, dtype=np.int64)
    if len(positions) == 0:
        return b""
    vals = np.empty(len(positions), dtype=np.int64)
    vals[0] = positions[0]
    np.subtract(positions[1:], positions[:-1], out=vals[1:])
    starts = np.concatenate(([0], np.cumsum(tfs)[:-1]))
    vals[starts] = positions[starts]  # absolute at each posting start
    return varint_encode(vals)


def decode_block_positions(data: bytes, tfs: np.ndarray) -> np.ndarray:
    """Inverse of encode_block_positions -> int64 positions (len == tfs.sum())."""
    tfs = np.asarray(tfs, dtype=np.int64)
    vals = varint_decode(data)
    if len(vals) == 0:
        return vals
    starts = np.concatenate(([0], np.cumsum(tfs)[:-1]))
    c = np.cumsum(vals)
    base = c[starts] - vals[starts]  # segmented cumsum reset per posting
    return c - np.repeat(base, tfs)


def cut_position_blocks(positions: np.ndarray, tfs: np.ndarray) -> list:
    """Per-block position blobs aligned with encode_postings' BLOCK_SIZE
    posting cuts (block b holds postings [b*256, (b+1)*256))."""
    tfs = np.asarray(tfs, dtype=np.int64)
    positions = np.asarray(positions, dtype=np.int64)
    bounds = np.concatenate(([0], np.cumsum(tfs)))
    out = []
    for s in range(0, len(tfs), BLOCK_SIZE):
        e = min(s + BLOCK_SIZE, len(tfs))
        out.append(encode_block_positions(positions[bounds[s] : bounds[e]], tfs[s:e]))
    return out


# --- Offsets stream (IndexOptions DOCS_AND_FREQS_AND_POSITIONS_AND_OFFSETS,
# --- Lucene104PostingsFormat .pos offset payload): per posting the first
# --- value is the absolute startOffset, the rest are ascending start
# --- deltas; the token lengths follow as a second varint run in the same
# --- blob (count == tfs.sum() each, so no framing is needed).

def encode_block_offsets(starts: np.ndarray, lengths: np.ndarray,
                         tfs: np.ndarray) -> bytes:
    """Encode concatenated per-posting ascending start offsets + lengths."""
    starts = np.asarray(starts, dtype=np.int64)
    lengths = np.asarray(lengths, dtype=np.int64)
    tfs = np.asarray(tfs, dtype=np.int64)
    if len(starts) == 0:
        return b""
    vals = np.empty(len(starts), dtype=np.int64)
    vals[0] = starts[0]
    np.subtract(starts[1:], starts[:-1], out=vals[1:])
    psts = np.concatenate(([0], np.cumsum(tfs)[:-1]))
    vals[psts] = starts[psts]
    return varint_encode(np.concatenate((vals, lengths)))


def decode_block_offsets(data: bytes, tfs: np.ndarray):
    """Inverse of encode_block_offsets -> (starts, ends) int64 arrays."""
    tfs = np.asarray(tfs, dtype=np.int64)
    vals = varint_decode(data)
    if len(vals) == 0:
        return vals, vals
    ntok = int(tfs.sum())
    svals, lengths = vals[:ntok], vals[ntok:]
    psts = np.concatenate(([0], np.cumsum(tfs)[:-1]))
    c = np.cumsum(svals)
    base = c[psts] - svals[psts]
    starts = c - np.repeat(base, tfs)
    return starts, starts + lengths


def cut_offset_blocks(offsets_packed: np.ndarray, tfs: np.ndarray) -> list:
    """Per-block offset blobs aligned with the BLOCK_SIZE posting cuts;
    ``offsets_packed`` is start*512 + length (the analyzer's packing)."""
    tfs = np.asarray(tfs, dtype=np.int64)
    offsets_packed = np.asarray(offsets_packed, dtype=np.int64)
    starts = offsets_packed >> 9
    lengths = offsets_packed & 511
    bounds = np.concatenate(([0], np.cumsum(tfs)))
    out = []
    for s in range(0, len(tfs), BLOCK_SIZE):
        e = min(s + BLOCK_SIZE, len(tfs))
        out.append(
            encode_block_offsets(
                starts[bounds[s] : bounds[e]], lengths[bounds[s] : bounds[e]],
                tfs[s:e],
            )
        )
    return out


# --- VarInt (LEB128) codec: used for round-trip parity tests and as an
# --- alternative tail-block encoding, mirroring Lucene's VInt tail.

def varint_encode(values: np.ndarray) -> bytes:
    """Vectorized LEB128 encode of non-negative int64 values."""
    vals = np.asarray(values, dtype=np.uint64)
    if len(vals) == 0:
        return b""
    nbytes = np.maximum((np.ceil(np.log2(vals.astype(np.float64) + 1) / 7)).astype(np.int64), 1)
    # correct float edge cases exactly: value needs k bytes iff value >= 2^(7(k-1))
    for _ in range(2):
        too_small = vals >= (np.uint64(1) << (np.minimum(nbytes, 9) * 7).astype(np.uint64))
        nbytes = nbytes + too_small.astype(np.int64)
    total = int(nbytes.sum())
    out = np.zeros(total, dtype=np.uint8)
    pos = np.concatenate(([0], np.cumsum(nbytes)[:-1]))
    maxb = int(nbytes.max())
    for b in range(maxb):
        mask = nbytes > b
        byte = ((vals[mask] >> np.uint64(7 * b)) & np.uint64(0x7F)).astype(np.uint8)
        cont = (nbytes[mask] > b + 1).astype(np.uint8) << 7
        out[pos[mask] + b] = byte | cont
    return out.tobytes()


def varint_decode(data: bytes) -> np.ndarray:
    """Vectorized LEB128 decode -> int64 array."""
    raw = np.frombuffer(data, dtype=np.uint8)
    if len(raw) == 0:
        return np.zeros(0, dtype=np.int64)
    is_last = (raw & 0x80) == 0
    ends = np.flatnonzero(is_last)
    starts = np.concatenate(([0], ends[:-1] + 1))
    vals = np.zeros(len(ends), dtype=np.uint64)
    lengths = ends - starts + 1
    maxb = int(lengths.max())
    for b in range(maxb):
        mask = lengths > b
        vals[mask] |= (raw[starts[mask] + b].astype(np.uint64) & np.uint64(0x7F)) << np.uint64(7 * b)
    return vals.astype(np.int64)

"""Multimodal columns: opaque binary payloads + REAL header decode.

Images/audio/video ride through Spark as ``binary`` columns with typed
metadata. The container has no media libraries, so payload synthesis and
decode are pure-stdlib implementations of the real container formats:

  - PNG: signature + IHDR/IDAT/IEND chunks with correct CRC32s and a real
    zlib-compressed image body — any PNG reader opens these files, and
    ``parse_png`` reads width/height from IHDR of ANY real PNG.
  - WAV: RIFF/WAVE with fmt+data chunks; ``parse_wav`` walks the chunks of
    any real PCM WAV and derives sample rate / duration.
  - MP4: ISO-BMFF ftyp+moov(mvhd, trak/tkhd) boxes; ``parse_mp4`` walks the
    box tree of any real MP4 for duration and track dimensions.

The Spark-side plumbing is Arrow-batched mapInPandas end to end; a real
model/codec call slots into ``extract_features`` unchanged.
"""

from __future__ import annotations

import struct
import zlib
from typing import Iterable, Iterator, Optional, Tuple

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, functions as F

MEDIA_SCHEMA = (
    "doc_id long, media_type string, payload binary, byte_len long, payload_sha256 string"
)
META_SCHEMA = "doc_id long, media_type string, width int, height int, duration_ms long"
FEATURE_SCHEMA = (
    "doc_id long, media_type string, width int, height int, duration_ms long, "
    "feature array<float>"
)


# --------------------------------------------------------------------------
# encoders (deterministic synthetic media — REAL container formats)
# --------------------------------------------------------------------------

def make_png(width: int, height: int, shade: int = 0) -> bytes:
    """Minimal but fully valid grayscale PNG."""

    def chunk(tag: bytes, body: bytes) -> bytes:
        return (
            struct.pack(">I", len(body))
            + tag
            + body
            + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", width, height, 8, 0, 0, 0, 0)
    raw = (b"\x00" + bytes([shade % 256]) * width) * height  # filter 0 rows
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw, 6))
        + chunk(b"IEND", b"")
    )


def make_wav(n_samples: int, sample_rate: int = 16000) -> bytes:
    """Valid 16-bit mono PCM WAV of silence."""
    data = b"\x00\x00" * n_samples
    fmt = struct.pack("<HHIIHH", 1, 1, sample_rate, sample_rate * 2, 2, 16)
    body = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
    body += b"data" + struct.pack("<I", len(data)) + data
    return b"RIFF" + struct.pack("<I", len(body)) + body


def make_mp4(duration_ms: int, width: int, height: int, timescale: int = 1000) -> bytes:
    """Minimal ISO-BMFF skeleton: ftyp + moov(mvhd + trak(tkhd))."""

    def box(tag: bytes, body: bytes) -> bytes:
        return struct.pack(">I", len(body) + 8) + tag + body

    ftyp = box(b"ftyp", b"isom" + struct.pack(">I", 512) + b"isomiso2mp41")
    dur = duration_ms * timescale // 1000
    mvhd = box(
        b"mvhd",
        struct.pack(">B3x", 0)  # version 0
        + struct.pack(">IIII", 0, 0, timescale, dur)
        + struct.pack(">IH2x8x36x24x", 0x00010000, 0x0100)
        + struct.pack(">I", 2),
    )
    tkhd = box(
        b"tkhd",
        struct.pack(">B3x", 0)
        + struct.pack(">IIII", 0, 0, 1, 0)
        + struct.pack(">I", dur)
        + b"\x00" * 52
        + struct.pack(">II", width << 16, height << 16),
    )
    moov = box(b"moov", mvhd + box(b"trak", tkhd))
    return ftyp + moov


# --------------------------------------------------------------------------
# decoders (header parsers that work on any real file of the format)
# --------------------------------------------------------------------------

def parse_png(data: bytes) -> Tuple[int, int]:
    """(width, height) from the IHDR chunk of a real PNG."""
    if data[:8] != b"\x89PNG\r\n\x1a\n":
        raise ValueError("not a PNG (bad signature)")
    if data[12:16] != b"IHDR":
        raise ValueError("PNG missing IHDR")
    w, h = struct.unpack(">II", data[16:24])
    return int(w), int(h)


def parse_wav(data: bytes) -> Tuple[int, int, int]:
    """(sample_rate, n_samples, duration_ms) by walking RIFF chunks."""
    if data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE file")
    pos, rate, block_align, n_samples = 12, None, None, None
    while pos + 8 <= len(data):
        tag = data[pos : pos + 4]
        size = struct.unpack("<I", data[pos + 4 : pos + 8])[0]
        if tag == b"fmt ":
            _, _, rate, _, block_align, _ = struct.unpack(
                "<HHIIHH", data[pos + 8 : pos + 24]
            )
        elif tag == b"data" and block_align:
            n_samples = size // block_align
        pos += 8 + size + (size & 1)
    if rate is None or n_samples is None:
        raise ValueError("WAV missing fmt/data chunks")
    return int(rate), int(n_samples), int(n_samples * 1000 // rate)


def parse_mp4(data: bytes) -> Tuple[int, int, int]:
    """(width, height, duration_ms) by walking ISO-BMFF boxes."""

    def walk(buf: bytes, start: int, end: int):
        pos = start
        while pos + 8 <= end:
            size = struct.unpack(">I", buf[pos : pos + 4])[0]
            tag = buf[pos + 4 : pos + 8]
            if size < 8:
                break
            yield tag, pos + 8, pos + size
            pos += size

    width = height = duration_ms = None
    for tag, s, e in walk(data, 0, len(data)):
        if tag != b"moov":
            continue
        for t2, s2, e2 in walk(data, s, e):
            if t2 == b"mvhd":
                timescale, dur = struct.unpack(">II", data[s2 + 12 : s2 + 20])
                duration_ms = dur * 1000 // timescale
            elif t2 == b"trak":
                for t3, s3, e3 in walk(data, s2, e2):
                    if t3 == b"tkhd":
                        w16, h16 = struct.unpack(">II", data[e3 - 8 : e3])
                        width, height = w16 >> 16, h16 >> 16
    if duration_ms is None:
        raise ValueError("MP4 missing moov/mvhd")
    return int(width or 0), int(height or 0), int(duration_ms)


def decode_media(payload: bytes, media_type: str) -> Tuple[int, int, int]:
    """(width, height, duration_ms); 0 where the modality has no such axis."""
    if media_type == "image":
        w, h = parse_png(payload)
        return w, h, 0
    if media_type == "audio":
        _, _, ms = parse_wav(payload)
        return 0, 0, ms
    if media_type == "video":
        return parse_mp4(payload)
    raise ValueError(f"unknown media type {media_type!r}")


# --------------------------------------------------------------------------
# dataset-shape helpers (deterministic dims so oracles can verify the parse)
# --------------------------------------------------------------------------

def media_dims_for(doc_id: int) -> Tuple[str, int, int, int]:
    """Deterministic (media_type, width, height, duration_ms) per doc —
    the generation contract shared with the SQL oracle."""
    m = doc_id % 3
    if m == 0:
        return "image", 16 + doc_id % 64, 16 + (doc_id // 3) % 48, 0
    if m == 1:
        n = 4000 + (doc_id % 50) * 400
        return "audio", 0, 0, n * 1000 // 16000
    return "video", 160 + (doc_id % 16) * 8, 120 + (doc_id % 12) * 8, 1000 + (doc_id % 30) * 500


def attach_payload(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Synthesize a deterministic REAL media payload per doc (PNG/WAV/MP4 by
    doc_id % 3) + typed metadata, Arrow-batched."""

    def gen(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        for pdf in batches:
            types, payloads = [], []
            for doc_id in pdf["doc_id"]:
                mt, w, h, ms = media_dims_for(int(doc_id))
                if mt == "image":
                    p = make_png(w, h, shade=int(doc_id) % 256)
                elif mt == "audio":
                    p = make_wav(4000 + (int(doc_id) % 50) * 400, 16000)
                else:
                    p = make_mp4(ms, w, h)
                types.append(mt)
                payloads.append(p)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media_type": types,
                    "payload": payloads,
                    "byte_len": pd.Series([len(p) for p in payloads], dtype="int64"),
                    "payload_sha256": [
                        hashlib.sha256(p).hexdigest() for p in payloads
                    ],
                }
            )

    return df.select("doc_id").mapInPandas(gen, MEDIA_SCHEMA)


def decode_meta(media: DataFrame) -> DataFrame:
    """Parse every payload's REAL container header -> typed metadata."""

    def fn(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            w, h, ms = [], [], []
            for payload, mt in zip(pdf["payload"], pdf["media_type"]):
                ww, hh, mms = decode_media(bytes(payload), mt)
                w.append(ww)
                h.append(hh)
                ms.append(mms)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media_type": pdf["media_type"],
                    "width": pd.Series(w, dtype="int32"),
                    "height": pd.Series(h, dtype="int32"),
                    "duration_ms": pd.Series(ms, dtype="int64"),
                }
            )

    return media.mapInPandas(fn, META_SCHEMA)


def decode_png_pixels(data: bytes) -> np.ndarray:
    """REAL pixel decode for 8-bit grayscale non-interlaced PNGs: walk the
    chunks, inflate the IDAT stream, undo the per-row filters 0-4
    (None/Sub/Up/Average/Paeth, PNG spec 9.2) — works on any conforming
    grayscale PNG, not just our synthetic ones. Color/interlaced images
    raise: the pixel-codec boundary for other formats is where an image
    library would slot in (none is available in this environment)."""
    if data[:8] != b"\x89PNG\r\n\x1a\n":
        raise ValueError("not a PNG (bad signature)")
    pos, w, h, idat = 8, None, None, b""
    while pos + 8 <= len(data):
        ln = struct.unpack(">I", data[pos : pos + 4])[0]
        tag = data[pos + 4 : pos + 8]
        body = data[pos + 8 : pos + 8 + ln]
        if tag == b"IHDR":
            w, h, bit, color, _, _, inter = struct.unpack(">IIBBBBB", body)
            if bit != 8 or color != 0 or inter != 0:
                raise ValueError("only 8-bit grayscale non-interlaced PNGs supported")
        elif tag == b"IDAT":
            idat += body
        elif tag == b"IEND":
            break
        pos += 12 + ln
    if w is None or not idat:
        raise ValueError("PNG missing IHDR/IDAT")
    raw = zlib.decompress(idat)
    stride = w + 1
    out = np.zeros((h, w), np.uint8)
    prev = np.zeros(w, np.int64)
    for r in range(h):
        f = raw[r * stride]
        row = np.frombuffer(raw[r * stride + 1 : (r + 1) * stride], np.uint8).astype(np.int64)
        if f == 0:
            cur = row
        elif f == 2:  # Up
            cur = (row + prev) & 0xFF
        elif f in (1, 3, 4):  # Sub / Average / Paeth need the left neighbor
            cur = np.empty(w, np.int64)
            a = 0
            for x in range(w):
                b_ = int(prev[x])
                c = int(prev[x - 1]) if x else 0
                if f == 1:
                    pred = a
                elif f == 3:
                    pred = (a + b_) // 2
                else:
                    p = a + b_ - c
                    pa, pb, pc = abs(p - a), abs(p - b_), abs(p - c)
                    pred = a if (pa <= pb and pa <= pc) else (b_ if pb <= pc else c)
                a = (int(row[x]) + pred) & 0xFF
                cur[x] = a
        else:
            raise ValueError(f"bad PNG filter type {f}")
        out[r] = cur
        prev = cur
    return out


def resize_png(data: bytes, out_w: int, out_h: int) -> bytes:
    """Nearest-neighbor resize of a grayscale PNG: real pixel decode ->
    index-map -> re-encode (filter-0 rows). Output is a valid PNG."""
    px = decode_png_pixels(data)
    h, w = px.shape
    yi = (np.arange(out_h, dtype=np.int64) * h) // out_h
    xi = (np.arange(out_w, dtype=np.int64) * w) // out_w
    rs = px[np.ix_(yi, xi)]

    def chunk(tag: bytes, body: bytes) -> bytes:
        return (
            struct.pack(">I", len(body))
            + tag
            + body
            + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", out_w, out_h, 8, 0, 0, 0, 0)
    raw = b"".join(b"\x00" + rs[r].tobytes() for r in range(out_h))
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw, 6))
        + chunk(b"IEND", b"")
    )


TRANSFORM_SCHEMA = (
    "doc_id long, media_type string, out_width int, out_height int, "
    "mean_px int, n_frames int"
)


def transform_media(
    df: DataFrame, out_w: int = 32, out_h: int = 24, frame_every_ms: int = 500
) -> DataFrame:
    """Resize (images, real pixel path) + frame-sample (videos) over binary
    payloads in one Arrow-batched mapInPandas pass:

      - images: nearest-neighbor resize to (out_w, out_h), RE-PARSE the
        re-encoded PNG for the output dims (proves the encoder round-trip)
        and report the mean pixel of the resized image;
      - videos: sampled frame TIMESTAMPS every ``frame_every_ms`` from the
        real container duration — n_frames = duration//every + 1 (a real
        frame decoder slots in at the timestamp list);
      - audio: passthrough (no spatial/frame axis).
    """

    def fn(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ow, oh, mean_px, nframes = [], [], [], []
            for payload, mt in zip(pdf["payload"], pdf["media_type"]):
                b = bytes(payload)
                if mt == "image":
                    rp = resize_png(b, out_w, out_h)
                    w2, h2 = parse_png(rp)
                    ow.append(w2)
                    oh.append(h2)
                    mean_px.append(int(np.rint(decode_png_pixels(rp).mean())))
                    nframes.append(0)
                elif mt == "video":
                    _, _, ms = parse_mp4(b)
                    ow.append(0), oh.append(0), mean_px.append(0)
                    nframes.append(ms // frame_every_ms + 1)
                else:
                    ow.append(0), oh.append(0), mean_px.append(0), nframes.append(0)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media_type": pdf["media_type"],
                    "out_width": pd.Series(ow, dtype="int32"),
                    "out_height": pd.Series(oh, dtype="int32"),
                    "mean_px": pd.Series(mean_px, dtype="int32"),
                    "n_frames": pd.Series(nframes, dtype="int32"),
                }
            )

    return df.mapInPandas(fn, TRANSFORM_SCHEMA)


def extract_features(df: DataFrame, dim: int = 8) -> DataFrame:
    """mapInPandas feature extraction over binary payloads: decode the real
    header + a deterministic byte-histogram feature (the real model call
    slots in here)."""

    def fn(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            w, h, ms, feats = [], [], [], []
            for payload, mt in zip(pdf["payload"], pdf["media_type"]):
                b = bytes(payload)
                ww, hh, mms = decode_media(b, mt)
                w.append(ww)
                h.append(hh)
                ms.append(mms)
                hist = np.bincount(
                    np.frombuffer(b, dtype=np.uint8) % dim, minlength=dim
                ).astype(np.float32)
                total = hist.sum()
                feats.append((hist / total if total else hist).round(4))
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media_type": pdf["media_type"],
                    "width": pd.Series(w, dtype="int32"),
                    "height": pd.Series(h, dtype="int32"),
                    "duration_ms": pd.Series(ms, dtype="int64"),
                    "feature": feats,
                }
            )

    return df.mapInPandas(fn, FEATURE_SCHEMA)

"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video ride as ``binary`` columns with metadata structs; the
Spark-side plumbing (schema, partitioning, Arrow batch shape, UDF
signatures) is real and tested. The actual media decode is STUBBED —
the decode libraries are not in this container — behind
``decode_stub``: it deterministically fakes a decode (shape inferred from
payload bytes) and raises ``NotImplementedError`` when ``strict=True``.
"""

from __future__ import annotations

import hashlib
from typing import Iterable, Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, functions as F

MEDIA_SCHEMA = (
    "doc_id long, media_type string, payload binary, byte_len long, payload_sha256 string"
)
FEATURE_SCHEMA = "doc_id long, media_type string, width int, height int, n_frames int, feature array<float>"


def attach_payload(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Synthesize a deterministic binary payload column (UTF-8 bytes of the
    text stand in for media bytes) + typed metadata. Pure built-ins."""
    payload = F.encode(F.col(text_col), "UTF-8")
    return df.select(
        "doc_id",
        F.element_at(
            F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
            (F.col("doc_id") % 3 + 1).cast("int"),
        ).alias("media_type"),
        payload.alias("payload"),
        F.octet_length(payload).cast("long").alias("byte_len"),
        F.sha2(payload, 256).alias("payload_sha256"),
    )


def decode_stub(payload: bytes, media_type: str, strict: bool = False):
    """STUB decode: real implementation would call PIL/av/soundfile.
    Deterministic fake: dimensions derived from the payload digest."""
    if strict:
        raise NotImplementedError(
            "media decode requires PIL/pyav which are not in this container"
        )
    d = hashlib.sha256(payload).digest()
    width = 16 + d[0] % 64
    height = 16 + d[1] % 64
    n_frames = 1 if media_type == "image" else 1 + d[2] % 32
    return width, height, n_frames


def extract_features(df: DataFrame, dim: int = 8, batch_size_hint: int = 1024) -> DataFrame:
    """mapInPandas feature extraction over binary payloads: Arrow batches
    in, (metadata + fixed-dim float feature) out. The feature is a
    deterministic byte-histogram projection (the real model call slots in
    here)."""

    def fn(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            w, h, nf, feats = [], [], [], []
            for payload, mt in zip(pdf["payload"], pdf["media_type"]):
                b = bytes(payload)
                ww, hh, nn = decode_stub(b, mt)
                w.append(ww)
                h.append(hh)
                nf.append(nn)
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
                    "n_frames": pd.Series(nf, dtype="int32"),
                    "feature": feats,
                }
            )

    return df.mapInPandas(fn, FEATURE_SCHEMA)

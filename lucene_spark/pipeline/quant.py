"""Scalar-quantized vectors (Lucene99ScalarQuantizedVectorsFormat analog).

The reference compresses float32 vectors to int7/int8 with a linear
quantizer whose bounds come from value quantiles
(``util/quantization/ScalarQuantizer.java:60-108`` fromVectors /
``Lucene99ScalarQuantizedVectorsFormat.java:38-70``): at confidence 1.0
the bounds are the exact global component min/max; lower confidence trims
the tails. Queries are quantized with the SAME parameters at search time
and scored in the quantized domain.

Spark-first re-expression:
  - ``scalar_quant_params``: one exact min/max aggregation over
    ``array_min``/``array_max`` (a single JVM-side pass; an optional
    ``confidence`` < 1 switches to ``percentile_approx`` — the 100 TB
    path, documented trade: approx quantiles, still a single pass).
  - ``quantize_expr``: pure Catalyst transform — floor((x-lo)/scale+0.5)
    clamped to [0, 2^bits-1]. ``floor(+0.5)`` (not round()) so Spark and
    the DuckDB oracle share halfway semantics bit-for-bit.
  - scoring dequantizes in-expression (dq = lo + q*scale) and computes
    exact cosine over the dequantized ints — deterministic, fully
    SQL-expressible (the driver oracle replays quantize+dequant+cosine
    from the raw floats), unlike the reference's fused int-dot +
    correction form which is an internal optimization of the same math.
  - ``build_squant_index`` persists (id, qvec int array) parquet +
    params.json through the fsio seam (object-store roots work); at
    2^bits = 128 levels the column is 4x smaller than float32 — the scan
    bandwidth saving IS the point at 100 TB. Compose with the LSH/IVF
    bucket indexes for candidate pruning; this format only compresses.

In-repo recall gate: quantized top-k vs exact float top-k
(tests/test_quant.py) — recall@10 stays high because 7 bits over the
observed range keeps relative error ~1e-2.
"""

from __future__ import annotations

from typing import Optional

import numpy as np

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..index import fsio
from .similarity import _dot, _norm


def scalar_quant_params(
    df: DataFrame, vec_col: str = "embedding", bits: int = 7,
    confidence: float = 1.0,
) -> dict:
    """Quantization bounds from the data (ScalarQuantizer.fromVectors):
    confidence 1.0 = exact global component min/max; < 1.0 trims
    (1-confidence)/2 tails via percentile_approx (approximate — documented
    scale/determinism trade; the oracle-checked mode is 1.0)."""
    if not 0.0 < confidence <= 1.0:
        raise ValueError("confidence in (0, 1]")
    if confidence >= 1.0:
        row = df.select(
            F.min(F.array_min(vec_col)).alias("lo"),
            F.max(F.array_max(vec_col)).alias("hi"),
        ).first()
    else:
        tail = (1.0 - confidence) / 2.0
        comp = df.select(F.explode(vec_col).alias("x")).select(F.col("x").cast("double").alias("x"))
        row = comp.select(
            F.percentile_approx("x", tail).alias("lo"),
            F.percentile_approx("x", 1.0 - tail).alias("hi"),
        ).first()
    lo, hi = float(row["lo"]), float(row["hi"])
    levels = (1 << bits) - 1
    scale = (hi - lo) / levels if hi > lo else 1.0
    return {"lo": lo, "hi": hi, "bits": bits, "levels": levels, "scale": scale,
            "confidence": confidence}


def quantize_expr(vec_col, params: dict):
    """array<float> -> array<int> in [0, levels], pure Catalyst exprs."""
    lo = F.lit(float(params["lo"]))
    scale = F.lit(float(params["scale"]))
    levels = F.lit(int(params["levels"]))
    col = F.col(vec_col) if isinstance(vec_col, str) else vec_col
    return F.transform(
        col,
        lambda x: F.least(
            levels.cast("double"),
            F.greatest(F.lit(0.0), F.floor((x.cast("double") - lo) / scale + F.lit(0.5))),
        ).cast("int"),
    )


def dequantize_expr(qvec_col, params: dict):
    """array<int> -> array<double>: dq = lo + q * scale."""
    lo = F.lit(float(params["lo"]))
    scale = F.lit(float(params["scale"]))
    col = F.col(qvec_col) if isinstance(qvec_col, str) else qvec_col
    return F.transform(col, lambda q: lo + q.cast("double") * scale)


def quantize_query(query_vec, params: dict) -> list:
    """Quantize the query with the index's own parameters (the reference
    quantizes queries at search time with the stored quantile bounds)."""
    v = np.asarray(query_vec, dtype=np.float64)
    q = np.floor((v - params["lo"]) / params["scale"] + 0.5)
    return np.clip(q, 0, params["levels"]).astype(np.int64).tolist()


def squant_cosine_topk(
    df: DataFrame, query_vec, params: dict, k: int = 10,
    qvec_col: Optional[str] = None, vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Top-k by cosine in the quantized domain. ``qvec_col`` names a
    pre-quantized int column (the persisted-index path); otherwise the
    float column quantizes inside the plan (the oracle-replayable path)."""
    if qvec_col is None:
        dq_doc = dequantize_expr(quantize_expr(vec_col, params), params)
    else:
        dq_doc = dequantize_expr(qvec_col, params)
    qq = quantize_query(query_vec, params)
    dqq = [params["lo"] + int(x) * params["scale"] for x in qq]
    qcol = F.array(*[F.lit(float(x)) for x in dqq])
    qn = float(np.sqrt(np.dot(np.asarray(dqq), np.asarray(dqq))))
    cos = _dot(dq_doc, qcol) / (_norm(dq_doc) * F.lit(qn))
    return (
        df.select(F.col(id_col), F.round(cos, 4).alias("cosine"))
        .orderBy(F.col("cosine").desc(), F.col(id_col).asc())
        .limit(k)
    )


def build_squant_index(
    spark: SparkSession, df: DataFrame, out_dir: str,
    vec_col: str = "embedding", id_col: str = "vec_id", bits: int = 7,
    confidence: float = 1.0,
) -> dict:
    """Persist the quantized vectors (int array parquet, ~4x smaller scans
    than float32 at bits=7) + params.json through the fsio seam."""
    params = scalar_quant_params(df, vec_col, bits, confidence)
    fs, fs_path = fsio.resolve(out_dir)
    fsio.mkdirs(fs, fs_path)
    (
        df.select(F.col(id_col), quantize_expr(vec_col, params).alias("qvec"))
        .write.mode("overwrite").parquet(out_dir + "/vectors")
    )
    fsio.write_json_atomic(fs, fs_path + "/params.json", params)
    return params


def squant_index_topk(
    spark: SparkSession, index_dir: str, query_vec, k: int = 10,
    id_col: str = "vec_id",
    filter_df: DataFrame | None = None,
) -> DataFrame:
    """Search a persisted scalar-quantized index. ``filter_df`` (one
    ``id_col`` column of allowed ids) adds pre-filtered KNN via a
    semi-join, matching the hnsw/ivf filter seam
    (search/KnnFloatVectorQuery.java:48)."""
    fs, fs_path = fsio.resolve(index_dir)
    params = fsio.read_json(fs, fs_path + "/params.json")
    vecs = spark.read.parquet(index_dir + "/vectors")
    if filter_df is not None:
        vecs = vecs.join(
            filter_df.select(F.col(id_col).cast("long").alias(id_col)),
            id_col, "left_semi",
        )
    return squant_cosine_topk(vecs, query_vec, params, k=k,
                              qvec_col="qvec", id_col=id_col)

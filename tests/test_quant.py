"""Scalar-quantized vectors (pipeline/quant.py,
Lucene99ScalarQuantizedVectorsFormat analog)."""

import numpy as np
import pytest

from lucene_spark.pipeline.quant import (
    build_squant_index,
    dequantize_expr,
    quantize_expr,
    quantize_query,
    scalar_quant_params,
    squant_cosine_topk,
    squant_index_topk,
)


@pytest.fixture(scope="module")
def emb(spark):
    import os
    sf = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001")
    return spark.read.parquet(os.path.join(sf, "embeddings.parquet"))


def test_params_exact_minmax(spark, emb):
    params = scalar_quant_params(emb)
    rows = emb.select("embedding").collect()
    comps = np.concatenate([np.asarray(r["embedding"], dtype=np.float64) for r in rows])
    assert params["lo"] == pytest.approx(float(comps.min()), abs=0)
    assert params["hi"] == pytest.approx(float(comps.max()), abs=0)
    assert params["levels"] == 127
    assert params["scale"] == (params["hi"] - params["lo"]) / 127


def test_quantize_roundtrip_error_bound(spark, emb):
    """|dequant(quant(x)) - x| <= scale/2 for every in-range component."""
    params = scalar_quant_params(emb)
    df = emb.select(
        "embedding",
        dequantize_expr(quantize_expr("embedding", params), params).alias("dq"),
    )
    for r in df.limit(50).collect():
        x = np.asarray(r["embedding"], dtype=np.float64)
        dq = np.asarray(r["dq"], dtype=np.float64)
        assert np.abs(dq - x).max() <= params["scale"] / 2 + 1e-12


def test_query_quantization_clamps(spark, emb):
    params = scalar_quant_params(emb)
    q = quantize_query([params["lo"] - 10.0, params["hi"] + 10.0, params["lo"]], params)
    assert q[0] == 0 and q[1] == params["levels"] and q[2] == 0


def test_recall_vs_exact(spark, emb):
    from lucene_spark.pipeline.similarity import cosine_topk

    qv = [float(x) for x in emb.filter("vec_id = 3").first()["embedding"]]
    params = scalar_quant_params(emb)
    exact = [r["vec_id"] for r in cosine_topk(emb, qv, k=10).collect()]
    quant = [r["vec_id"] for r in squant_cosine_topk(emb, qv, params, k=10).collect()]
    recall = len(set(exact) & set(quant)) / 10
    assert recall >= 0.8  # 7 bits over the observed range: tight
    assert quant[0] == 3  # self-match survives quantization


def test_persisted_index_matches_inplan(spark, emb, tmp_path):
    qv = [float(x) for x in emb.filter("vec_id = 3").first()["embedding"]]
    params = build_squant_index(spark, emb, str(tmp_path / "sq"))
    got = squant_index_topk(spark, str(tmp_path / "sq"), qv, k=5).collect()
    want = squant_cosine_topk(emb, qv, params, k=5).collect()
    assert [(r["vec_id"], r["cosine"]) for r in got] == [
        (r["vec_id"], r["cosine"]) for r in want
    ]
    # persisted column is int (the 4x-smaller scan is the point)
    vecs = spark.read.parquet(str(tmp_path / "sq") + "/vectors")
    assert dict(vecs.dtypes)["qvec"] == "array<int>"


def test_squant_on_object_store_root(spark, emb):
    """params.json + vectors ride the fsio seam -> s3mock:// roots work."""
    import uuid

    root = f"s3mock:///tmp/squant_{uuid.uuid4().hex[:8]}"
    qv = [float(x) for x in emb.filter("vec_id = 3").first()["embedding"]]
    build_squant_index(spark, emb, root)
    got = squant_index_topk(spark, root, qv, k=3).collect()
    assert got and got[0]["vec_id"] == 3


def test_confidence_interval_mode(spark, emb):
    """confidence < 1 trims tails: bounds strictly inside the exact ones
    (percentile_approx path — the documented approximate 100 TB mode)."""
    exact = scalar_quant_params(emb)
    trimmed = scalar_quant_params(emb, confidence=0.9)
    assert trimmed["lo"] >= exact["lo"] and trimmed["hi"] <= exact["hi"]
    assert trimmed["hi"] > trimmed["lo"]
    with pytest.raises(ValueError):
        scalar_quant_params(emb, confidence=0.0)


def test_degenerate_constant_vectors(spark):
    df = spark.createDataFrame(
        [(0, [1.0, 1.0]), (1, [1.0, 1.0])], "vec_id long, embedding array<float>"
    )
    params = scalar_quant_params(df)
    assert params["scale"] == 1.0  # hi == lo guard
    got = squant_cosine_topk(df, [1.0, 1.0], params, k=2).collect()
    assert [r["vec_id"] for r in got] == [0, 1]


def test_squant_filtered_topk(spark, tmp_path):
    """filter_df seam parity with hnsw/ivf: semi-join then quantized
    cosine equals the unfiltered result restricted to allowed ids."""
    from pyspark.sql import functions as F

    from lucene_spark.pipeline.quant import build_squant_index, squant_index_topk

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    d = str(tmp_path / "sq")
    build_squant_index(spark, emb, d, bits=7)
    row = emb.orderBy("vec_id").limit(1).collect()[0]
    qv = [float(x) for x in row["embedding"]]
    filt = emb.filter(F.col("label").isin(2, 6)).select("vec_id")
    allowed = {r["vec_id"] for r in filt.collect()}
    got = [r["vec_id"] for r in squant_index_topk(spark, d, qv, k=5,
                                                  filter_df=filt).collect()]
    full = [r["vec_id"] for r in squant_index_topk(spark, d, qv, k=10**6).collect()]
    want = [v for v in full if v in allowed][:5]
    assert got == want and got

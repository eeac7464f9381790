"""Sharded HNSW graph ANN: recall vs brute force, exactness at full ef,
serialization round-trip, Spark shard build/search."""

import numpy as np
import pytest

from lucene_spark.pipeline.hnsw import (
    _deserialize_shard,
    _l2_normalize,
    _serialize_shard,
    hnsw_build,
    hnsw_search,
)


def test_recall_and_exactness():
    rng = np.random.default_rng(0)
    n, d = 1500, 32
    V = _l2_normalize(rng.standard_normal((n, d)).astype(np.float32))
    graph = hnsw_build(V, M=12, ef_construction=80, seed=1)
    recalls = []
    for q in _l2_normalize(rng.standard_normal((10, d)).astype(np.float32)):
        ids, cos = hnsw_search(V, graph, q, 10, ef_search=64)
        exact = np.argsort(-(V @ q))[:10]
        recalls.append(len(set(ids.tolist()) & set(exact.tolist())) / 10)
        # returned cosines match the actual vectors
        for i, c in zip(ids, cos):
            assert abs(float(V[i] @ q) - float(c)) < 1e-5
    assert np.mean(recalls) >= 0.9
    # ef >= n degenerates to exact search (the whole graph is the beam)
    q = _l2_normalize(rng.standard_normal(d).astype(np.float32))
    ids, _ = hnsw_search(V, graph, q, 10, ef_search=n)
    assert set(ids.tolist()) == set(np.argsort(-(V @ q))[:10].tolist())


def test_serialization_round_trip():
    rng = np.random.default_rng(3)
    V = _l2_normalize(rng.standard_normal((400, 16)).astype(np.float32))
    graph = hnsw_build(V, M=8, ef_construction=40, seed=2)
    blob = _serialize_shard(np.arange(400) * 7, V, graph)
    ids2, V2, g2 = _deserialize_shard(blob)
    assert np.array_equal(ids2, np.arange(400) * 7)
    q = _l2_normalize(rng.standard_normal(16).astype(np.float32))
    a, _ = hnsw_search(V, graph, q, 5, ef_search=50)
    b, _ = hnsw_search(V2, g2, q, 5, ef_search=50)
    assert np.array_equal(a, b)


def test_sharded_index_end_to_end(spark, tmp_path):
    from lucene_spark.pipeline.hnsw import build_hnsw_index, hnsw_index_topk

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    d = str(tmp_path / "hnsw")
    build_hnsw_index(emb, d, dim=64, M=12, ef_construction=80, num_shards=3)
    row = emb.orderBy("vec_id").limit(1).collect()[0]
    qv = [float(x) for x in row["embedding"]]
    res = hnsw_index_topk(spark, d, qv, k=5, ef_search=500).collect()
    got = [r["vec_id"] for r in res]
    # ef >= per-shard size -> exact; compare vs brute force
    rows = emb.collect()
    V = np.stack([np.array(r["embedding"], dtype=np.float32) for r in rows])
    ids = np.array([r["vec_id"] for r in rows])
    Vn = _l2_normalize(V)
    q = _l2_normalize(np.array(qv, dtype=np.float32))
    exact = ids[np.argsort(-(Vn @ q))[:5]]
    assert set(got) == set(exact.tolist())
    assert got[0] == row["vec_id"]  # the query vector itself ranks first


def test_hnsw_on_object_store_root(spark, tmp_path):
    """HNSW shards + manifest go through the fsio seam: build + search on
    an s3mock:// root (object-store semantics, no local open())."""
    from lucene_spark.pipeline.hnsw import build_hnsw_index, hnsw_index_topk

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    root = "s3mock://" + str(tmp_path / "hnsw_s3")
    build_hnsw_index(emb, root, dim=64, M=8, ef_construction=40, num_shards=2)
    row = emb.orderBy("vec_id").limit(1).collect()[0]
    qv = [float(x) for x in row["embedding"]]
    res = hnsw_index_topk(spark, root, qv, k=3, ef_search=400).collect()
    assert res and res[0]["vec_id"] == row["vec_id"]


def test_quantized_hnsw_index(spark, tmp_path):
    """Lucene99HnswScalarQuantizedVectorsFormat analog: int7 vector payload
    in the shard blobs — smaller files, recall preserved, exact self-match."""
    import glob
    import os

    import numpy as np

    from lucene_spark.pipeline.hnsw import build_hnsw_index, hnsw_index_topk
    from lucene_spark.pipeline.similarity import cosine_topk

    rng = np.random.default_rng(5)
    n, dim = 400, 32
    vecs = rng.normal(size=(n, dim)).astype(np.float32)
    emb = spark.createDataFrame(
        [(i, [float(x) for x in vecs[i]]) for i in range(n)],
        "vec_id long, embedding array<float>",
    )
    dq = str(tmp_path / "hq")
    df_ = str(tmp_path / "hf")
    build_hnsw_index(emb, dq, dim=dim, num_shards=2, quantize=True)
    build_hnsw_index(emb, df_, dim=dim, num_shards=2, quantize=False)
    # quantized shard files are substantially smaller (int8 vs float32)
    size_q = sum(os.path.getsize(f) for f in glob.glob(dq + "/shard-*.npz"))
    size_f = sum(os.path.getsize(f) for f in glob.glob(df_ + "/shard-*.npz"))
    assert size_q < 0.55 * size_f, (size_q, size_f)

    q = [float(x) for x in vecs[7]]
    got = hnsw_index_topk(spark, dq, q, k=10, ef_search=400).collect()
    assert got[0]["vec_id"] == 7  # self-match survives quantization
    exact = {r["vec_id"] for r in cosine_topk(emb, q, k=10).collect()}
    recall = len(exact & {r["vec_id"] for r in got}) / 10
    assert recall >= 0.8, recall


def test_filtered_search_accept_mask_and_exact_fallback():
    """Pre-filtered KNN (KnnFloatVectorQuery.java:48): the accept-mask
    walk returns only allowed ids with good recall; at full ef it is
    EXACT over the allowed set."""
    rng = np.random.default_rng(11)
    n, d = 1500, 32
    V = _l2_normalize(rng.standard_normal((n, d)).astype(np.float32))
    graph = hnsw_build(V, M=12, ef_construction=80, seed=4)
    accept = rng.random(n) < 0.3
    allowed = np.flatnonzero(accept)
    recalls = []
    for q in _l2_normalize(rng.standard_normal((10, d)).astype(np.float32)):
        ids, cos = hnsw_search(V, graph, q, 10, ef_search=96, accept=accept)
        assert all(accept[i] for i in ids)  # never leaks a filtered doc
        sims = V[allowed] @ q
        exact = allowed[np.argsort(-sims)[:10]]
        recalls.append(len(set(ids.tolist()) & set(exact.tolist())) / 10)
        # full-ef = exact over the allowed subset
        ids_f, _ = hnsw_search(V, graph, q, 10, ef_search=n, accept=accept)
        assert set(ids_f.tolist()) == set(exact.tolist())
    assert np.mean(recalls) >= 0.8


def test_filtered_index_topk_selective_exact(spark, tmp_path):
    """Selective filter routes to the exact per-shard fallback
    (AbstractKnnVectorQuery's visited-limit switch) and equals filtered
    brute force; the filter ids are co-partitioned, never collected."""
    from lucene_spark.pipeline.hnsw import build_hnsw_index, hnsw_index_topk

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    d = str(tmp_path / "hnswf")
    build_hnsw_index(emb, d, dim=64, M=12, ef_construction=80, num_shards=3)
    from pyspark.sql import functions as F

    filt = emb.filter(F.col("label").isin(1, 4)).select("vec_id")
    row = emb.orderBy("vec_id").limit(1).collect()[0]
    qv = [float(x) for x in row["embedding"]]
    got = [r["vec_id"]
           for r in hnsw_index_topk(spark, d, qv, k=5, ef_search=16,
                                    filter_df=filt).collect()]
    # brute force over the filtered set
    rows = emb.filter(F.col("label").isin(1, 4)).collect()
    ids = np.array([r["vec_id"] for r in rows])
    M = _l2_normalize(np.stack([np.array(r["embedding"], dtype=np.float32)
                                for r in rows]))
    q = np.array(qv, dtype=np.float32); q /= np.linalg.norm(q)
    want = ids[np.argsort(-(M @ q), kind="stable")[:5]].tolist()
    assert got == want and got  # vacuity guard


def test_build_auto_widens_shards_past_cap(spark, tmp_path):
    from lucene_spark.index import fsio
    from lucene_spark.pipeline.hnsw import build_hnsw_index

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    d = str(tmp_path / "hnswcap")
    build_hnsw_index(emb, d, dim=64, num_shards=2, max_shard_vectors=10)
    fs, base = fsio.resolve(d)
    man = fsio.read_json(fs, f"{base}/manifest.json")
    assert man["num_shards"] >= man["n_vectors"] / 10
    assert man["max_shard_vectors"] == 10
    assert man["max_shard_actual"] <= 3 * 10  # hash skew tolerance

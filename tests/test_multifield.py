"""Multi-field indexing + BM25F (FieldInfos.java:44, CombinedFieldQuery.java:79)."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from lucene_spark.search.plan import normalize


@pytest.fixture(scope="module")
def mf_index(spark, tmp_path_factory):
    from lucene_spark.corpus import corpus_spark_df
    from lucene_spark.index.builder import IndexConfig
    from lucene_spark.index.multifield import MultiFieldIndex

    from pyspark.sql import Window

    root = str(tmp_path_factory.mktemp("mf") / "index")
    rn = F.row_number().over(Window.orderBy("repo", "path", "commit")) - 1
    docs = corpus_spark_df(spark, 200, seed=13).select(
        rn.cast("long").alias("doc_id"),
        F.array_join(F.slice(F.split("content", " "), 1, 6), " ").alias("title"),
        F.col("content").alias("body"),
    )
    return MultiFieldIndex.build(
        spark, docs, root, ["title", "body"], "doc_id",
        IndexConfig(num_segments=2, hot_df_threshold=60),
    )


def test_fields_share_docids(mf_index):
    t = mf_index.field("title").docs.select("docid").orderBy("docid")
    b = mf_index.field("body").docs.select("docid").orderBy("docid")
    assert [r["docid"] for r in t.collect()] == [r["docid"] for r in b.collect()]


def test_field_routing_uses_field_stats(mf_index):
    """The same term scores differently per field (different df/avgdl)."""
    q = normalize(should=["import"])
    t = {r["docid"]: r["score"] for r in mf_index.search_field("title", q, k=1000).collect()}
    b = {r["docid"]: r["score"] for r in mf_index.search_field("body", q, k=1000).collect()}
    assert t and b
    assert set(t) <= set(b)  # title is a prefix of body
    common = set(t) & set(b)
    assert any(t[d] != b[d] for d in common)


def test_open_roundtrip(spark, mf_index):
    from lucene_spark.index.multifield import MultiFieldIndex

    again = MultiFieldIndex.open(spark, mf_index.root)
    assert sorted(again.fields) == ["body", "title"]
    q = normalize(should=["return"])
    a = [(r["docid"], r["score"]) for r in again.search_field("body", q, k=5).collect()]
    b = [(r["docid"], r["score"]) for r in mf_index.search_field("body", q, k=5).collect()]
    assert a == b


def test_combined_field_matches_manual_bm25f(mf_index):
    """BM25F float64/unquantized vs a hand-assembled pandas computation."""
    from lucene_spark.index.multifield import combined_field_topk
    from lucene_spark.search.executor import decoded_postings

    weights = {"title": 2.0, "body": 1.0}
    term = "import"
    got = {
        r["docid"]: round(r["score"], 9)
        for r in combined_field_topk(
            mf_index, [term], weights, k=1000, quantize=False, dtype=np.float64
        ).collect()
    }
    # manual: per-field tfs and doclens
    tfs = {}
    for f, w in weights.items():
        for r in decoded_postings(mf_index.field(f), [term]).collect():
            tfs[r["docid"]] = tfs.get(r["docid"], 0.0) + w * r["tf"]
    dls = {}
    for f, w in weights.items():
        for r in mf_index.field(f).norms.collect():
            dls[r["docid"]] = dls.get(r["docid"], 0.0) + w * r["doclen"]
    dc = max(mf_index.field(f).field_stats.doc_count for f in weights)
    sum_ttf = sum(w * mf_index.field(f).field_stats.sum_total_term_freq for f, w in weights.items())
    avgdl = sum_ttf / dc
    df = max(len(decoded_postings(mf_index.field(f), [term]).collect()) for f in weights)
    idf = float(np.log(1.0 + (dc - df + 0.5) / (df + 0.5)))
    want = {}
    for d, freq in tfs.items():
        ninv = 1.0 / (1.2 * (0.25 + 0.75 * dls[d] / avgdl))
        want[d] = round(idf - idf / (1.0 + freq * ninv), 9)
    assert got == want


def test_combined_field_quantized_norm_path(mf_index):
    """Parity mode re-quantizes the weighted length sum through byte4
    (MultiNormsLeafSimScorer.java:144-156) — scores differ from the
    unquantized path but ranking is sane and finite."""
    from lucene_spark.index.multifield import combined_field_topk

    rows = combined_field_topk(
        mf_index, ["import"], {"title": 2.0, "body": 1.0}, k=10, quantize=True
    ).collect()
    assert len(rows) == 10
    scores = [r["score"] for r in rows]
    assert all(np.isfinite(s) and s > 0 for s in scores)
    assert scores == sorted(scores, reverse=True)


def test_weights_below_one_rejected(mf_index):
    from lucene_spark.index.multifield import combined_field_topk

    with pytest.raises(ValueError, match="weights must be >= 1"):
        combined_field_topk(mf_index, ["import"], {"title": 0.5, "body": 1.0})


@pytest.fixture(scope="module")
def mf_sim_index(spark, tmp_path_factory):
    from lucene_spark.corpus import corpus_spark_df
    from lucene_spark.index.builder import IndexConfig
    from lucene_spark.index.multifield import MultiFieldIndex

    from pyspark.sql import Window

    root = str(tmp_path_factory.mktemp("mfsim") / "index")
    rn = F.row_number().over(Window.orderBy("repo", "path", "commit")) - 1
    docs = corpus_spark_df(spark, 200, seed=13).select(
        rn.cast("long").alias("doc_id"),
        F.array_join(F.slice(F.split("content", " "), 1, 6), " ").alias("title"),
        F.col("content").alias("body"),
    )
    return MultiFieldIndex.build(
        spark, docs, root, ["title", "body"], "doc_id",
        IndexConfig(num_segments=2, hot_df_threshold=60),
        similarities={"title": "classic"},
    )


def test_per_field_similarity_default_and_override(mf_sim_index, spark):
    """PerFieldSimilarityWrapper.java:28: search_field applies the field's
    own similarity by default — identical to passing it explicitly, and
    different from the BM25 override; persists through open()."""
    from lucene_spark.index.multifield import MultiFieldIndex
    from lucene_spark.search.executor import search_topk
    from lucene_spark.search.plan import normalize

    q = normalize(should=["import"])
    dflt = [(r["docid"], round(r["score"], 9))
            for r in mf_sim_index.search_field("title", q, k=10).collect()]
    expl = [(r["docid"], round(r["score"], 9))
            for r in search_topk(mf_sim_index.fields["title"], q, k=10,
                                 similarity="classic").collect()]
    assert dflt == expl and dflt
    bm25 = [(r["docid"], round(r["score"], 9))
            for r in mf_sim_index.search_field("title", q, k=10,
                                               similarity="bm25").collect()]
    assert bm25 != dflt
    reopened = MultiFieldIndex.open(spark, mf_sim_index.root)
    assert reopened.similarities == {"title": "classic"}
    assert reopened.field_similarity("title") == "classic"
    assert reopened.field_similarity("body") is None


def test_multi_field_topk_sums_per_field_similarities(mf_sim_index):
    """Cross-field boolean: per-doc score = title clause under Classic +
    body clause under BM25 (hand-assembled expectation)."""
    from lucene_spark.index.multifield import multi_field_topk
    from lucene_spark.search.executor import search_exhaustive
    from lucene_spark.search.plan import normalize

    q = normalize(should=["import"])
    got = {r["docid"]: r["score"]
           for r in multi_field_topk(
               mf_sim_index, {"title": q, "body": q}, k=1000).collect()}
    ca = {r["docid"]: r["score"]
          for r in search_exhaustive(mf_sim_index.fields["title"], q, k=None,
                                     quantize=False, dtype=np.float64,
                                     similarity="classic").collect()}
    cb = {r["docid"]: r["score"]
          for r in search_exhaustive(mf_sim_index.fields["body"], q, k=None,
                                     quantize=False, dtype=np.float64).collect()}
    want = {d: ca.get(d, 0.0) + cb.get(d, 0.0) for d in set(ca) | set(cb)}
    assert set(got) == set(want) and got
    for d in want:
        assert abs(got[d] - want[d]) < 1e-9


def test_combined_field_refuses_non_bm25_fields(mf_sim_index):
    """CombinedFieldQuery.java:174-178: BM25-only, refuse loudly."""
    from lucene_spark.index.multifield import combined_field_topk

    with pytest.raises(ValueError, match="requires BM25"):
        combined_field_topk(mf_sim_index, ["import"], {"title": 2.0, "body": 1.0})


def test_build_rejects_bad_similarity_map(spark, tmp_path):
    from lucene_spark.index.multifield import MultiFieldIndex

    docs = spark.createDataFrame([(0, "a", "b")], "doc_id long, t string, b string")
    with pytest.raises(ValueError, match="unknown similarity"):
        MultiFieldIndex.build(spark, docs, str(tmp_path / "x"), ["t", "b"],
                              "doc_id", similarities={"t": "nope"})
    with pytest.raises(ValueError, match="unindexed fields"):
        MultiFieldIndex.build(spark, docs, str(tmp_path / "y"), ["t", "b"],
                              "doc_id", similarities={"zz": "classic"})

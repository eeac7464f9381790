"""Per-doc term vectors (TermVectorsFormat analog) + MLT-from-doc."""

import numpy as np
import pytest


@pytest.fixture(scope="module")
def tv_index(spark, tmp_path_factory):
    from lucene_spark.index.builder import IndexConfig, build_index
    from lucene_spark.search.executor import Index

    rows = [
        (0, "spark join window join"),
        (1, "hash join fast"),
        (2, "the spark engine"),
        (3, "plain words only"),
    ]
    docs = spark.createDataFrame(rows, "docid long, content string")
    d = str(tmp_path_factory.mktemp("tv") / "idx")
    cfg = IndexConfig(docid_col="docid", order_cols=("docid",), num_segments=2,
                      index_positions=True, term_vectors=True,
                      keep_content=False, hot_df_threshold=100)
    return Index(spark, build_index(spark, docs, d, cfg))


def test_term_vector_matches_analysis(tv_index):
    """tvec rows == re-analysis term counts, per doc, with positions."""
    got = {
        (r["docid"], r["term"]): (r["tf"], list(r["positions"]))
        for r in tv_index.term_vectors.collect()
    }
    # doc0: join@1 and join@3 -> tf 2 with both positions
    assert got[(0, "join")] == (2, [1, 3])
    assert got[(0, "spark")] == (1, [0])
    # stop hole: doc2 "the spark engine" -> spark at position 1
    assert got[(2, "spark")] == (1, [1])
    assert (2, "the") not in got
    # full corpus coverage
    assert {d for d, _ in got} == {0, 1, 2, 3}


def test_term_vector_single_doc_read(tv_index):
    tv = {r["term"]: r["tf"] for r in tv_index.term_vector(1).collect()}
    assert tv == {"hash": 1, "join": 1, "fast": 1}


def test_mlt_from_doc_without_content(spark, tv_index):
    """MoreLikeThis seeded from the term vector — the index stores NO
    content (keep_content=False), so re-analysis MLT is impossible."""
    from lucene_spark.search.aggregates import more_like_this_from_doc

    assert "content" not in tv_index.docs.columns
    res = more_like_this_from_doc(tv_index, 0, max_terms=2, k=10).collect()
    assert res and res[0]["docid"] == 0  # the seed doc matches itself best
    with pytest.raises(ValueError, match="no term vector"):
        more_like_this_from_doc(tv_index, 999)


def test_term_vectors_absent_refuses(spark, tmp_path):
    from lucene_spark.index.builder import IndexConfig, build_index
    from lucene_spark.search.executor import Index

    docs = spark.createDataFrame([(0, "x y")], "docid long, content string")
    idx = Index(spark, build_index(
        spark, docs, str(tmp_path / "no_tv"),
        IndexConfig(docid_col="docid", order_cols=("docid",), num_segments=1)))
    with pytest.raises(ValueError, match="no term vectors"):
        idx.term_vectors


def test_append_term_vectors_mismatch_refuses(spark, tmp_path):
    from lucene_spark.index.builder import (
        IndexConfig,
        append_to_index,
        build_index,
    )

    d = str(tmp_path / "tvap")
    cfg = IndexConfig(docid_col="docid", order_cols=("docid",),
                      num_segments=1, term_vectors=True)
    docs = spark.createDataFrame([(0, "a b")], "docid long, content string")
    build_index(spark, docs, d, cfg)
    more = spark.createDataFrame([(1, "c d")], "docid long, content string")
    bad = IndexConfig(docid_col="docid", order_cols=("docid",), num_segments=1)
    with pytest.raises(ValueError, match="term_vectors mismatch"):
        append_to_index(spark, more, d, bad)
    # matching cfg appends fine and the new doc's vector appears
    append_to_index(spark, more, d, cfg)
    from lucene_spark.search.executor import Index

    idx = Index(spark, build_index(spark, spark.createDataFrame(
        [], "docid long, content string"), d, cfg))
    tv = {r["term"] for r in idx.term_vector(1).collect()}
    assert tv == {"c", "d"}

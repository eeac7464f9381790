"""CJK bigram analyzer (CJKAnalyzer / CJKBigramFilter analog): reference
tokenization vectors + vectorized stream transform + end-to-end index."""

import numpy as np
import pytest

from lucene_spark.functions.cjk import analyze_cjk, cjk_bigram_stream


def test_reference_vector_all_scripts():
    """TestCJKBigramFilter.testAllScripts (analysis/common/src/test/.../cjk/
    TestCJKBigramFilter.java:120-134): bigrams cross the Han/hiragana
    script boundary."""
    assert analyze_cjk("多くの学生が試験に落ちた") == [
        "多く", "くの", "の学", "学生", "生が", "が試", "試験", "験に",
        "に落", "落ち", "ちた",
    ]
    # trailing punctuation is a tokenizer break, not a char
    assert analyze_cjk("多くの学生が試験に落ちた。") == analyze_cjk(
        "多くの学生が試験に落ちた"
    )


def test_bigrams_cross_whitespace():
    """CJKBigramFilter buffers chars of CONSECUTIVE CJK tokens — whitespace
    between them does not break the buffer (positions stay adjacent), so
    日本 語 bigrams exactly like 日本語."""
    assert analyze_cjk("日本 語") == ["日本", "本語"]
    assert analyze_cjk("日本語") == ["日本", "本語"]


def test_lone_cjk_char_unigram_and_passthrough():
    assert analyze_cjk("abc 多 def") == ["abc", "多", "def"]
    assert analyze_cjk("hello world") == ["hello", "world"]
    assert analyze_cjk("東京 spark 大阪") == ["東京", "spark", "大阪"]


def test_non_cjk_token_breaks_run():
    # latin token between CJK chars breaks adjacency on both sides
    assert analyze_cjk("多x学") == ["多", "x", "学"]


def test_stream_transform_positions():
    vocab = np.array(["a", "多", "学", "生"], dtype=object)
    # doc0: a 多 学 生  -> a, 多学@1, 学生@2
    codes = np.array([0, 1, 2, 3], dtype=np.int64)
    docix = np.zeros(4, dtype=np.int64)
    pos = np.arange(4, dtype=np.int64)
    c2, d2, p2, v2 = cjk_bigram_stream(codes, docix, pos, vocab)
    out = [(v2[c], int(p)) for c, p in zip(c2, p2)]
    assert out == [("a", 0), ("多学", 1), ("学生", 2)]


def test_stream_transform_requires_positions():
    with pytest.raises(ValueError, match="positions"):
        cjk_bigram_stream(
            np.array([0], dtype=np.int64), np.array([0], dtype=np.int64),
            None, np.array(["多"], dtype=object),
        )


def test_cjk_index_end_to_end(spark, tmp_path):
    """analyzer='cjk_bigram' through the builder: bigram terms searchable,
    phrase over adjacent bigrams works, doclen counts emitted bigrams,
    CheckIndex clean, append with the standard analyzer refuses."""
    from lucene_spark.index.builder import (
        IndexConfig,
        append_to_index,
        build_index,
    )
    from lucene_spark.search.executor import (
        Index,
        count_hits,
        decoded_postings,
        search_phrase,
    )
    from lucene_spark.search.plan import normalize

    rows = [
        (0, "多くの学生が試験に落ちた"),
        (1, "学生 spark"),
        (2, "plain latin text"),
    ]
    docs = spark.createDataFrame(rows, "docid long, content string")
    cfg = IndexConfig(docid_col="docid", order_cols=("docid",),
                      num_segments=2, hot_df_threshold=100,
                      index_positions=True, analyzer="cjk_bigram")
    idx = Index(spark, build_index(spark, docs, str(tmp_path / "cjk"), cfg))

    assert count_hits(idx, normalize(should=["学生"], pre_analyzed=True)) == 2
    assert count_hits(idx, normalize(should=["spark"], pre_analyzed=True)) == 1
    # phrase over adjacent bigrams (positions are the first-char positions)
    ph = search_phrase(idx, [("多く", 0), ("くの", 1)], slop=0, k=5).collect()
    assert [r["docid"] for r in ph] == [0]
    dec = {(r["term"], r["docid"]): (r["tf"], r["doclen"])
           for r in decoded_postings(idx, ["学生", "spark"]).collect()}
    # doc0: 12 chars -> 11 overlapping bigrams
    assert dec[("学生", 0)][1] == 11  # doclen == emitted bigram count
    assert dec[("spark", 1)][1] == 2  # 学生 bigram + spark
    from lucene_spark.index.check import check_index

    assert check_index(idx)["clean"]

    with pytest.raises(ValueError, match="analysis chain mismatch"):
        append_to_index(
            spark,
            spark.createDataFrame([(9, "more")], "docid long, content string"),
            str(tmp_path / "cjk"),
            IndexConfig(docid_col="docid", order_cols=("docid",),
                        num_segments=1, index_positions=True),
        )


def test_unknown_analyzer_rejected(spark, tmp_path):
    from lucene_spark.index.builder import IndexConfig, build_index

    docs = spark.createDataFrame([(0, "x")], "docid long, content string")
    with pytest.raises(ValueError, match="unknown analyzer"):
        build_index(
            spark, docs, str(tmp_path / "bad"),
            IndexConfig(docid_col="docid", order_cols=("docid",),
                        analyzer="kuromoji"),
        )

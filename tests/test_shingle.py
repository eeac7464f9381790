"""Word shingles (ShingleFilter analog, bigrams + fillers)."""

import numpy as np
import pytest

from lucene_spark.functions.shingle import analyze_shingles, shingle_stream


def test_reference_example():
    """The classic ShingleFilter example (shingle/ShingleFilter.java:52
    javadoc shape): 'please divide this sentence into shingles' with the
    English stop set — unigrams + grams + stop-hole fillers."""
    assert analyze_shingles("please divide this sentence into shingles") == [
        "please", "please divide", "divide", "divide _", "_ sentence",
        "sentence", "sentence _", "_ shingles", "shingles",
    ]


def test_leading_and_trailing_holes():
    # leading hole materializes a filler gram (the first token carries the
    # position increment); trailing holes are invisible to the filter
    assert analyze_shingles("the quick fox") == [
        "_ quick", "quick", "quick fox", "fox",
    ]
    assert analyze_shingles("quick fox the") == [
        "quick", "quick fox", "fox",
    ]


def test_interior_double_hole_skips_filler_only_gram():
    # "a <hole> <hole> b": 'a _' and '_ b' but never '_ _'
    got = analyze_shingles("spark of the fox")
    assert got == ["spark", "spark _", "_ fox", "fox"]


def test_stream_positions():
    vocab = np.array(["a", "b", "c"], dtype=object)
    codes = np.array([0, 1, 2], dtype=np.int64)
    docix = np.zeros(3, dtype=np.int64)
    pos = np.array([0, 1, 3], dtype=np.int64)  # hole at 2
    c2, d2, p2, v2 = shingle_stream(codes, docix, pos, vocab)
    out = sorted((v2[c], int(p)) for c, p in zip(c2, p2))
    assert out == [
        ("_ c", 2), ("a", 0), ("a b", 0), ("b", 1), ("b _", 1), ("c", 3),
    ]


def test_shingle_index_end_to_end(spark, tmp_path):
    """shingles=True through the builder: the gram term is searchable,
    norms stay on the unigram stream, CheckIndex clean, config guards."""
    from lucene_spark.index.builder import IndexConfig, build_index
    from lucene_spark.index.check import check_index
    from lucene_spark.search.executor import Index, count_hits, decoded_postings
    from lucene_spark.search.plan import normalize

    rows = [
        (0, "hash join runs fast"),
        (1, "hash table join"),
        (2, "unrelated words"),
    ]
    docs = spark.createDataFrame(rows, "docid long, content string")
    cfg = IndexConfig(docid_col="docid", order_cols=("docid",),
                      num_segments=2, hot_df_threshold=100,
                      index_positions=True, shingles=True)
    idx = Index(spark, build_index(spark, docs, str(tmp_path / "sh"), cfg))
    assert count_hits(idx, normalize(should=["hash join"], pre_analyzed=True)) == 1
    dec = {(r["term"], r["docid"]): (r["tf"], r["doclen"])
           for r in decoded_postings(idx, ["hash join", "hash"]).collect()}
    # norms discount the grams: doc0 doclen stays 4 (unigram count)
    assert dec[("hash join", 0)] == (1, 4)
    assert check_index(idx)["clean"]

    with pytest.raises(ValueError, match="requires index_positions"):
        build_index(spark, docs, str(tmp_path / "bad"),
                    IndexConfig(docid_col="docid", order_cols=("docid",),
                                shingles=True))
    with pytest.raises(ValueError, match="standard chain only"):
        build_index(spark, docs, str(tmp_path / "bad2"),
                    IndexConfig(docid_col="docid", order_cols=("docid",),
                                index_positions=True, shingles=True,
                                synonyms=(("a", "b"),)))

"""Prefix completion (AnalyzingSuggester-lite) over the term dictionary."""

import pytest


def test_complete_prefix_weight_order(spark, built_index, ref_index):
    from lucene_spark.search.suggest import complete_prefix

    got = complete_prefix(built_index, "st", k=10).collect()
    assert got  # corpus has static/stream/string/struct + identifiers
    # independent expectation from the pure-Python index
    want = sorted(
        (
            (t, sum(pl.values()))
            for t, pl in ref_index.postings.items()
            if t.startswith("st")
        ),
        key=lambda kv: (-kv[1], kv[0]),
    )[:10]
    assert [(r["term"], r["weight"]) for r in got] == want


def test_complete_prefix_lowercases_and_df_weight(spark, built_index, ref_index):
    from lucene_spark.search.suggest import complete_prefix

    got = complete_prefix(built_index, "ST", k=5, weight_col="df").collect()
    want = sorted(
        (
            (t, len(pl))
            for t, pl in ref_index.postings.items()
            if t.startswith("st")
        ),
        key=lambda kv: (-kv[1], kv[0]),
    )[:5]
    assert [(r["term"], r["weight"]) for r in got] == want


def test_complete_prefix_bad_weight_col(built_index):
    from lucene_spark.search.suggest import complete_prefix

    with pytest.raises(ValueError, match="weight_col"):
        complete_prefix(built_index, "st", weight_col="score")

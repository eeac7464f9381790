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


def test_complete_infix(built_index, ref_index):
    """AnalyzingInfixSuggester analog: fragment matches anywhere; prefix
    matches outrank pure-infix at equal weight."""
    from lucene_spark.search.suggest import complete_infix

    got = [(r["term"], r["weight"], r["is_prefix"])
           for r in complete_infix(built_index, "or", k=10).collect()]
    assert got, "vacuous"
    for term, w, isp in got:
        assert "or" in term
        assert isp == term.startswith("or")
        assert w == sum(ref_index.postings[term].values())
    want = sorted(
        ((t, sum(pl.values())) for t, pl in ref_index.postings.items() if "or" in t),
        key=lambda x: (-x[1], not x[0].startswith("or"), x[0]),
    )[:10]
    assert [(t, w) for t, w, _ in got] == want

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


def test_complete_fuzzy_one_edit(spark, built_index, ref_index):
    """FuzzySuggester analog: a 1-edit typo still completes; ranking by
    weight matches the pure-Python dictionary."""
    from lucene_spark.search.suggest import complete_fuzzy

    # "strean" is one substitution away from the prefix "stream"
    got = complete_fuzzy(built_index, "strean", k=5).collect()
    assert any(r["term"].startswith("stream") for r in got), got
    # weights are the ttf of the suggested terms
    for r in got:
        ttf = sum(ref_index.postings[r["term"]].values())
        assert r["weight"] == ttf


def test_complete_fuzzy_non_fuzzy_prefix_gates_first_char(spark, built_index):
    from lucene_spark.search.suggest import complete_fuzzy

    # "txream" would need an edit in position 1 — nonFuzzyPrefix=1 blocks it
    got = complete_fuzzy(built_index, "txream", k=5).collect()
    assert all(r["term"].startswith("t") for r in got)
    assert not any(r["term"].startswith("stream") for r in got)


def test_complete_fuzzy_short_input_falls_back_to_exact(spark, built_index):
    from lucene_spark.search.suggest import complete_fuzzy, complete_prefix

    got = complete_fuzzy(built_index, "st", k=5).collect()  # < minFuzzyLength
    want = complete_prefix(built_index, "st", k=5).collect()
    assert [(r["term"], r["weight"]) for r in got] == [
        (r["term"], r["weight"]) for r in want
    ]


def test_complete_fuzzy_validates(built_index):
    from lucene_spark.search.suggest import complete_fuzzy

    with pytest.raises(ValueError, match="max_edits"):
        complete_fuzzy(built_index, "stream", max_edits=3)
    with pytest.raises(ValueError, match="weight_col"):
        complete_fuzzy(built_index, "stream", weight_col="zz")


def test_free_text_suggest_stupid_backoff_golden(spark):
    """Hand-computed stupid-backoff scores on a 3-doc corpus
    (FreeTextSuggester.java:93-126, ALPHA=0.4)."""
    from lucene_spark.search.suggest import free_text_suggest, freetext_counts

    docs = spark.createDataFrame(
        [(0, "big table scan"), (1, "big table sort"), (2, "big sale run")],
        "doc_id long, text string",
    )
    counts = freetext_counts(docs, grams=2)
    # context "table": bigrams table->scan (1), table->sort (1); cnt(table)=2
    got = {r["word"]: r["score"] for r in
           free_text_suggest(counts, "table s", k=10).collect()}
    assert got["scan"] == pytest.approx(1 / 2)
    assert got["sort"] == pytest.approx(1 / 2)
    # "sale" never follows "table": backoff = 0.4 * cnt(sale)/total(9)
    assert got["sale"] == pytest.approx(0.4 * 1 / 9)
    # next-word mode (trailing space): no prefix filter
    nxt = {r["word"]: r["score"] for r in
           free_text_suggest(counts, "big ", k=10).collect()}
    assert nxt["table"] == pytest.approx(2 / 3)
    assert nxt["sale"] == pytest.approx(1 / 3)
    # unknown context word -> pure backoff everywhere
    bk = {r["word"]: r["score"] for r in
          free_text_suggest(counts, "zzz s", k=10).collect()}
    assert bk["scan"] == pytest.approx(0.4 * 1 / 9)
    # single partial token: raw unigram ratio
    uni = {r["word"]: r["score"] for r in
           free_text_suggest(counts, "b", k=10).collect()}
    assert uni["big"] == pytest.approx(3 / 9)


def test_free_text_suggest_validates(spark):
    from lucene_spark.search.suggest import free_text_suggest, freetext_counts

    docs = spark.createDataFrame([(0, "a b")], "doc_id long, text string")
    counts = freetext_counts(docs)
    with pytest.raises(ValueError, match="empty"):
        free_text_suggest(counts, "   ")
    with pytest.raises(ValueError, match="grams"):
        freetext_counts(docs, grams=9)


def test_word_break_and_combine(spark, built_index, ref_index):
    from lucene_spark.search.suggest import word_break_suggest, word_combine_suggest

    got = word_break_suggest(built_index, "importreturn", k=5).collect()
    assert ("import", "return") in {(r["left"], r["right"]) for r in got}
    for r in got:
        want = len(ref_index.postings[r["left"]]) + len(ref_index.postings[r["right"]])
        assert r["freq"] == want
    # frequency floor prunes rare halves
    high = word_break_suggest(built_index, "importreturn", k=5,
                              min_suggestion_frequency=10**9).collect()
    assert high == []
    # combinations: adjacent pair concatenating to a dictionary term
    comb = word_combine_suggest(built_index, ["im", "port", "stream"], k=5).collect()
    assert any(r["combined"] == "import" and r["pos"] == 0 for r in comb)
    assert word_combine_suggest(built_index, ["zz"], k=5).collect() == []

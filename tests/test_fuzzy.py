"""Damerau fuzzy (FuzzyQuery transpositions=true default) + distributed
multi-term counting paths + DirectSpellChecker analog."""

import random

import pytest

from lucene_spark.functions.fuzzy import damerau_levenshtein


def test_damerau_vectors():
    assert damerau_levenshtein("ab", "ba") == 1       # transposition = 1 edit
    assert damerau_levenshtein("ca", "abc") == 2      # unrestricted DL (OSA: 3)
    assert damerau_levenshtein("kitten", "sitting") == 3
    assert damerau_levenshtein("spark", "spark") == 0
    assert damerau_levenshtein("", "abc") == 3
    assert damerau_levenshtein("abc", "") == 3
    assert damerau_levenshtein("sprak", "spark") == 1  # adjacent swap
    assert damerau_levenshtein("sprka", "spark") == 2


def test_damerau_matches_duckdb_randomized():
    """Engine distance == DuckDB damerau_levenshtein (the oracle function)
    on random pairs — one definition across both sides."""
    import duckdb

    rng = random.Random(3)
    con = duckdb.connect()
    for _ in range(300):
        a = "".join(rng.choices("abcde", k=rng.randrange(0, 8)))
        b = "".join(rng.choices("abcde", k=rng.randrange(0, 8)))
        want = con.execute(
            "SELECT damerau_levenshtein(?, ?)", [a, b]
        ).fetchone()[0]
        assert damerau_levenshtein(a, b) == want, (a, b)
    con.close()


def test_fuzzy_transpositions_default_matches_swapped_term(built_index):
    """A transposed term matches at maxEdits=1 under the Lucene default
    (FuzzyQuery.java:57); the classic distance misses it."""
    got_t = built_index.expand_terms(fuzzy=("impotr", 1))
    assert "import" in got_t
    got_c = built_index.expand_terms(fuzzy=("impotr", 1), transpositions=False)
    assert "import" not in got_c  # classic distance sees 2 edits


def test_expand_terms_df_agrees_with_collect(built_index):
    df_terms = sorted(
        r["term"]
        for r in built_index.expand_terms_df(prefix="re").select("term").collect()
    )
    assert df_terms == built_index.expand_terms(prefix="re")
    assert all(t.startswith("re") for t in df_terms)
    assert df_terms  # corpus has 'return' etc.


def test_multi_term_count_is_distributed(built_index, monkeypatch):
    """Prefix/fuzzy/wildcard counting must never materialize the matching
    term list on the driver (VERDICT r3 wrong#2): terms flow as a
    DataFrame through the broadcast-join decode. Every row-materializing
    driver API is patched to raise for the duration."""
    from pyspark.sql import DataFrame

    from lucene_spark.search.executor import decoded_postings

    # reference counts computed the allowed way first
    want_prefix = (
        decoded_postings(built_index, built_index.expand_terms(prefix="re"))
        .select("docid").distinct().count()
    )
    assert want_prefix > 0

    def boom(self, *a, **k):
        raise AssertionError("driver-side row materialization on a count path")

    monkeypatch.setattr(DataFrame, "collect", boom)
    monkeypatch.setattr(DataFrame, "toPandas", boom)
    monkeypatch.setattr(DataFrame, "take", boom)
    try:
        got_prefix = built_index.multi_term_doc_count(
            built_index.expand_terms_df(prefix="re")
        )
        got_fuzzy = built_index.multi_term_doc_count(
            built_index.expand_terms_df(fuzzy=("impotr", 1))
        )
        got_wild = built_index.multi_term_doc_count(
            built_index.expand_terms_df(regex="^re.*n$")
        )
    finally:
        monkeypatch.undo()
    assert got_prefix == want_prefix
    assert got_fuzzy > 0  # 'import' docs via the transposition
    assert got_wild > 0


def test_spell_suggest_golden(built_index):
    """DirectSpellChecker analog: the misspelling's closest real term wins
    (dist asc, df desc, term asc); the query term itself is never
    suggested; minPrefix=1 keeps candidates on the same first letter."""
    from lucene_spark.search.suggest import spell_suggest

    rows = spell_suggest(built_index, "impotr", max_edits=2, k=5).collect()
    assert rows, "expected at least one suggestion"
    assert rows[0]["term"] == "import" and rows[0]["dist"] == 1
    assert all(r["term"].startswith("i") for r in rows)
    assert all(r["dist"] >= 1 for r in rows)
    # ranking is (dist asc, df desc, term asc)
    key = [(r["dist"], -r["df"], r["term"]) for r in rows]
    assert key == sorted(key)


def test_spell_suggest_more_popular_gate(built_index):
    """When the 'misspelling' IS a real (popular) term, only strictly more
    popular candidates are suggested (MORE_POPULAR mode)."""
    from lucene_spark.search.suggest import spell_suggest

    stats = built_index.term_stats_for(["import"])
    df_q = stats["import"][0]
    rows = spell_suggest(built_index, "import", max_edits=2, k=10).collect()
    assert all(r["df"] > df_q for r in rows)
    assert all(r["term"] != "import" for r in rows)

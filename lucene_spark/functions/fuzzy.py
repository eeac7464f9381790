"""Fuzzy term matching: Damerau-Levenshtein distance (transpositions).

Lucene's FuzzyQuery defaults ``transpositions=true`` — an adjacent swap
costs ONE edit (search/FuzzyQuery.java:57, built on the Levenshtein
automata with transpositions, util/automaton/LevenshteinAutomata.java:31).
The engine matches the UNRESTRICTED Damerau-Levenshtein distance (a
transposed pair may be edited again), which is also what the DuckDB oracle
function ``damerau_levenshtein`` computes, so engine and oracle share one
definition. The restricted (OSA) variant differs only on shapes like
"ca" -> "abc" (OSA 3, unrestricted 2) — irrelevant at maxEdits <= 1 and a
documented hair at maxEdits 2.

Spark-side use is a vectorized Arrow-batched predicate over the term
dictionary (the MultiTermQuery rewrite scan): the length band
``|len(a) - len(b)| <= maxEdits`` is applied as a pushdown-friendly
Catalyst filter FIRST, so the Python DP only runs on the band survivors.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import Column, functions as F


def damerau_levenshtein(a: str, b: str) -> int:
    """Unrestricted Damerau-Levenshtein distance (insert / delete /
    substitute / transpose-adjacent, re-editing allowed)."""
    la, lb = len(a), len(b)
    if la == 0 or lb == 0:
        return la or lb
    inf = la + lb
    # (la+2) x (lb+2) DP with a sentinel border; da[ch] = last row where
    # ``ch`` occurred in ``a`` (the classic Lowrance-Wagner formulation)
    h = [[inf] * (lb + 2) for _ in range(la + 2)]
    for i in range(la + 1):
        h[i + 1][1] = i
    for j in range(lb + 1):
        h[1][j + 1] = j
    da: dict = {}
    for i in range(1, la + 1):
        db = 0
        ai = a[i - 1]
        hi, hi1 = h[i + 1], h[i]
        for j in range(1, lb + 1):
            bj = b[j - 1]
            i1 = da.get(bj, 0)
            j1 = db
            if ai == bj:
                cost = 0
                db = j
            else:
                cost = 1
            hi[j + 1] = min(
                hi1[j] + cost,          # substitute / match
                hi[j] + 1,              # insert
                hi1[j + 1] + 1,         # delete
                h[i1][j1] + (i - i1 - 1) + 1 + (j - j1 - 1),  # transpose
            )
        da[ai] = i
    return h[la + 1][lb + 1]


def band_filter(col, query: str, max_edits: int):
    """Length-band prefilter |len(t) - len(q)| <= maxEdits — a plain
    Catalyst predicate (pushes into the parquet scan) that every
    within-distance term must satisfy."""
    lq = len(query)
    return F.length(col).between(lq - max_edits, lq + max_edits)


def damerau_predicate(col, query: str, max_edits: int) -> Column:
    """Boolean Column: unrestricted Damerau-Levenshtein(t, query) <=
    max_edits, as band prefilter AND an Arrow-batched pandas UDF."""

    @F.pandas_udf("boolean")
    def pred(s: pd.Series) -> pd.Series:
        return s.map(lambda t: damerau_levenshtein(t, query) <= max_edits)

    return band_filter(col, query, max_edits) & pred(col)


def damerau_pair_predicate(col_a, col_b, edits_col) -> Column:
    """Boolean Column over ROW-WISE pairs: Damerau(a, b) <= edits. For
    expansions where the query term varies per row (percolator fuzzy legs:
    batch vocabulary x distinct stored fuzzy constraints). The length band
    runs as a Catalyst predicate first so the Python DP only sees band
    survivors."""

    @F.pandas_udf("boolean")
    def pred(a: pd.Series, b: pd.Series, e: pd.Series) -> pd.Series:
        return pd.Series(
            [damerau_levenshtein(x, y) <= int(m)
             for x, y, m in zip(a, b, e)],
            index=a.index,
        )

    band = (F.length(col_a) - F.length(col_b)).between(-edits_col, edits_col)
    return band & pred(col_a, col_b, edits_col)


def damerau_distance_col(col, query: str) -> Column:
    """Int Column of the unrestricted Damerau-Levenshtein distance to
    ``query`` (for ranking, e.g. the spell checker); apply band_filter
    first to bound the Python work."""

    @F.pandas_udf("int")
    def dist(s: pd.Series) -> pd.Series:
        return s.map(lambda t: damerau_levenshtein(t, query)).astype("int32")

    return dist(col)

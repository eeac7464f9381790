"""ANSI-SQL oracle builders (DuckDB dialect-compatible).

Generates, for each engine operator, the equivalent plain-SQL statement the
driver runs against the same parquet tables. The engine's float64
unquantized scoring mode uses the exact same double-precision expression
shapes, so rounded scores agree.

Shared conventions with the Spark side:
  - tokenization: string_split(text, ' ') minus the 33-word stop list
    (exact on this corpus: lowercase [a-z0-9_ ] text);
  - BM25: ln(1 + (N - df + .5)/(df + .5)); score = w - w/(1 + tf*normInv),
    doubles, no norm quantization; docCount = docs with >= 1 token;
  - ordering: score desc, docid asc; scores rounded to 4 decimals.
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence

from .analysis import ENGLISH_STOP_WORDS

STOPLIST_SQL = ", ".join(f"'{w}'" for w in sorted(ENGLISH_STOP_WORDS))

TOKS_CTE = f"""
toks AS (
  SELECT doc_id, t AS term FROM (
    SELECT doc_id, unnest(string_split(text, ' ')) AS t FROM documents) u
  WHERE t <> '' AND t NOT IN ({STOPLIST_SQL})
)"""

BM25_CTES = (
    TOKS_CTE
    + """,
tf AS (SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY 1, 2),
dl AS (SELECT doc_id, count(*) AS doclen FROM toks GROUP BY 1),
fs AS (SELECT count(*) AS doc_cnt,
              sum(doclen) / CAST(count(*) AS DOUBLE) AS avgdl FROM dl)"""
)


def _qt_values(qtf: Dict[str, int]) -> str:
    return ", ".join(f"('{t}', {int(w)})" for t, w in sorted(qtf.items()))


def bm25_scored_cte(qtf: Dict[str, int]) -> str:
    """CTEs ending in ``agg(doc_id, score, nt)`` over the query terms."""
    return (
        "WITH "
        + BM25_CTES
        + f""",
qt(term, qtf) AS (VALUES {_qt_values(qtf)}),
dfreq AS (SELECT term, count(*) AS df FROM tf
          WHERE term IN (SELECT term FROM qt) GROUP BY 1),
w AS (SELECT q.term,
             q.qtf * ln(1 + (fs.doc_cnt - dfreq.df + 0.5) / (dfreq.df + 0.5)) AS w
      FROM qt q JOIN dfreq ON q.term = dfreq.term CROSS JOIN fs),
scored AS (
  SELECT tf.doc_id, w.term,
         w.w - w.w / (1 + CAST(tf.tf AS DOUBLE)
                          * (1.0 / (1.2 * (0.25 + 0.75 * dl.doclen / fs.avgdl)))) AS s
  FROM tf JOIN w ON tf.term = w.term
          JOIN dl ON tf.doc_id = dl.doc_id CROSS JOIN fs),
agg AS (SELECT doc_id, sum(s) AS score, count(*) AS nt FROM scored GROUP BY 1)"""
    )


def _not_clause(excluded: Sequence[str]) -> str:
    if not excluded:
        return ""
    lst = ", ".join(f"'{t}'" for t in sorted(excluded))
    return (
        f" AND doc_id NOT IN (SELECT DISTINCT doc_id FROM toks WHERE term IN ({lst}))"
    )


def bm25_topk_sql(
    qtf: Dict[str, int],
    k: int = 10,
    required: Sequence[str] = (),
    excluded: Sequence[str] = (),
) -> str:
    """Top-k BM25: OR over qt terms; AND when `required` lists all terms
    that must match; NOT via excluded."""
    if required:
        req = ", ".join(f"'{t}'" for t in sorted(set(required)))
        and_f = (
            f" AND (SELECT count(DISTINCT term) FROM scored s2 "
            f"WHERE s2.doc_id = agg.doc_id AND s2.term IN ({req})) = {len(set(required))}"
        )
    else:
        and_f = ""
    return (
        bm25_scored_cte(qtf)
        + f"""
SELECT doc_id AS docid, round(score, 4) AS score
FROM agg WHERE 1=1{and_f}{_not_clause(excluded)}
ORDER BY agg.score DESC, docid ASC LIMIT {k}"""
    )


def bm25_matches_cte(qtf: Dict[str, int], required: Sequence[str] = (),
                     excluded: Sequence[str] = ()) -> str:
    """CTE prefix ending in ``hits(doc_id, score)`` (no limit) for facet /
    stats / grouping oracles."""
    if required:
        req = ", ".join(f"'{t}'" for t in sorted(set(required)))
        and_f = (
            f" AND (SELECT count(DISTINCT term) FROM scored s2 "
            f"WHERE s2.doc_id = agg.doc_id AND s2.term IN ({req})) = {len(set(required))}"
        )
    else:
        and_f = ""
    return (
        bm25_scored_cte(qtf)
        + f""",
hits AS (SELECT doc_id, score FROM agg WHERE 1=1{and_f}{_not_clause(excluded)})"""
    )

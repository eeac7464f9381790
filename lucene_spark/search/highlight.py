"""Passage highlighting from the positions stream.

UnifiedHighlighter-lite (lucene/highlighter/src/java/org/apache/lucene/
search/uhighlight/UnifiedHighlighter.java:103): for each top-k hit, find
the best passage for the query terms. Differences from the reference,
stated: passages are fixed-width POSITION windows anchored at query-term
occurrences (the reference breaks on sentences via BreakIterator), and a
passage scores the sum of the idf of every query-term occurrence inside
the window (the reference's PassageScorer adds a tf-normalization,
uhighlight/PassageScorer.java:66). Both simplifications keep the choice
deterministic and SQL-expressible for the oracle.

Execution shape: the top-k docids (bounded by the user's k, never
data-sized) broadcast into a per-segment positions decode restricted to
candidate blocks — the same two-phase trick as PhraseQuery — and the
window scan is a vectorized cumsum over each doc's merged occurrence
list. Best window = max score, tie -> smallest start (scores rounded to 6
decimals before comparison so float noise cannot flip the tie-break
between engine and oracle).
"""

from __future__ import annotations

from typing import Dict, Optional

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, functions as F

from .plan import NormalizedQuery

HL_SCHEMA = (
    "docid long, passage_start int, passage_end int, n_hits int,"
    " passage_score double"
)


def make_highlight_fn(weights: Dict[str, float], docids: np.ndarray, width: int):
    from .executor import _decode_rows_pos, _live_mask

    terms = sorted(weights)

    def run(key, pdf: pd.DataFrame, deleted: Optional[np.ndarray]) -> pd.DataFrame:
        empty = pd.DataFrame(
            {
                "docid": np.empty(0, np.int64),
                "passage_start": np.empty(0, np.int32),
                "passage_end": np.empty(0, np.int32),
                "n_hits": np.empty(0, np.int32),
                "passage_score": np.empty(0, np.float64),
            }
        )
        counters = [0, 0]
        rows: Dict[str, list] = {}
        for _, r in pdf.iterrows():
            rows.setdefault(r["term"], []).append(r)
        for t in rows:
            rows[t].sort(key=lambda r: r["first_docid"])
        sel = docids
        live = _live_mask(sel, deleted)
        if live is not None:
            sel = sel[live]
        if len(sel) == 0:
            return empty

        # per-doc merged (position, weight) occurrence lists
        occ_pos: Dict[int, list] = {}
        occ_w: Dict[int, list] = {}
        for t in terms:
            if t not in rows:
                continue
            parts = [_decode_rows_pos(r, sel, counters) for r in rows[t]]
            ids = np.concatenate([p[0] for p in parts])
            tfs = np.concatenate([p[1] for p in parts])
            pos = np.concatenate([p[3] for p in parts])
            m = sel[np.searchsorted(sel, ids).clip(max=len(sel) - 1)] == ids
            pos = pos[np.repeat(m, tfs)]
            ids, tfs = ids[m], tfs[m]
            w = weights[t]
            bounds = np.concatenate(([0], np.cumsum(tfs)))
            for i, d in enumerate(ids):
                ps = pos[bounds[i] : bounds[i + 1]]
                occ_pos.setdefault(int(d), []).extend(int(p) for p in ps)
                occ_w.setdefault(int(d), []).extend([w] * len(ps))

        out = {k: [] for k in ("docid", "start", "end", "nh", "score")}
        for d in sorted(occ_pos):
            p = np.array(occ_pos[d], dtype=np.int64)
            w = np.array(occ_w[d], dtype=np.float64)
            order = np.argsort(p, kind="stable")
            p, w = p[order], w[order]
            cs = np.concatenate(([0.0], np.cumsum(w)))
            js = np.searchsorted(p, p + width, "left")
            scores = np.round(cs[js] - cs[np.arange(len(p))], 6)
            best = np.lexsort((p, -scores))[0]
            out["docid"].append(d)
            out["start"].append(int(p[best]))
            out["end"].append(int(p[js[best] - 1]))
            out["nh"].append(int(js[best] - best))
            out["score"].append(float(scores[best]))
        return pd.DataFrame(
            {
                "docid": np.array(out["docid"], dtype=np.int64),
                "passage_start": np.array(out["start"], dtype=np.int32),
                "passage_end": np.array(out["end"], dtype=np.int32),
                "n_hits": np.array(out["nh"], dtype=np.int32),
                "passage_score": np.array(out["score"], dtype=np.float64),
            }
        )

    return run


def highlight_topk(
    index,
    q: NormalizedQuery,
    k: int = 10,
    width: int = 20,
) -> DataFrame:
    """Top-k hits with their best passage: (docid, score, passage_start,
    passage_end, n_hits, passage_score), ordered like the hit list (score
    desc, docid asc). Scores are the float64 oracle-comparable mode."""
    from .executor import require_positions

    require_positions(index, "highlighting")
    from .executor import apply_per_segment, search_exhaustive
    from .scorer import idf as _idf

    spark = index.spark
    empty = spark.createDataFrame(
        [], "docid long, score double, passage_start int, passage_end int,"
        " n_hits int, passage_score double"
    )
    top = search_exhaustive(index, q, k=k)
    top_rows = top.collect()  # k rows, bounded by the user's k
    if not top_rows:
        return empty
    docids = np.array(sorted(r["docid"] for r in top_rows), dtype=np.int64)
    terms = sorted(q.scoring_terms)
    stats = index.term_stats_for(terms)
    n = index.field_stats.doc_count
    weights = {
        t: float(_idf(stats[t][0], n, np.float64)) for t in terms if t in stats
    }
    if not weights:
        return empty
    rows = index.seg_postings.filter(F.col("term").isin(sorted(weights)))
    fn = make_highlight_fn(weights, docids, int(width))
    hl = apply_per_segment(index, rows, fn, HL_SCHEMA)
    top_df = F.broadcast(
        spark.createDataFrame(
            [(int(r["docid"]), float(r["score"])) for r in top_rows],
            "docid long, score double",
        )
    )
    return (
        top_df.join(hl, "docid")
        .orderBy(F.col("score").desc(), F.col("docid").asc())
    )

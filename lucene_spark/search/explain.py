"""Score explanation.

Weight#explain analog (lucene/core/src/java/org/apache/lucene/search/
Explanation.java:25; BM25Similarity.explain, BM25Similarity.java:224-254):
for one (query, doc) pair, the full score breakdown as a nested
Explanation tree — match flag, value, description, details — with the
exact per-term components the scorer used (idf, freq, doclen, norm
inverse). Non-matches explain WHY (missing MUST term, excluded term,
minimumNumberShouldMatch shortfall), like the reference's
"Failure to meet condition ..." explanations (BooleanWeight.explain).

Shape note: explaining one doc is a driver-side affordance by design —
the postings decode for the query terms runs distributed and only the
single doc's rows come back.
"""

from __future__ import annotations

from typing import Dict, Optional

import numpy as np

from .plan import NormalizedQuery
from .scorer import B, K1, idf as _idf


def _expl(value: float, description: str, details=None, match: bool = True) -> Dict:
    out = {"match": match, "value": float(value), "description": description}
    if details:
        out["details"] = details
    return out


def explain(
    index,
    q: NormalizedQuery,
    docid: int,
    boost: float = 1.0,
    quantize: bool = False,
    dtype=np.float64,
    similarity: Optional[str] = None,
) -> Dict:
    """Explanation tree for ``docid`` against the normalized boolean query.
    ``explain(...)["value"]`` equals the doc's score on the exhaustive
    path bit-for-bit (same expression, same dtype/quantize mode).
    ``similarity`` explains through the pluggable scorer instead of BM25
    (each reference similarity ships its own explain —
    BM25Similarity.java:224-254, TFIDFSimilarity.java:474-477,
    LMSimilarity.explain)."""
    from .executor import decoded_postings
    from .scorer import score_arrays
    from .similarities import bind_similarity

    if q.is_match_none:
        return _expl(0.0, "MatchNoDocsQuery (empty/rewritten-away boolean)", match=False)

    terms = sorted(set(q.scoring_terms) | set(q.excluded))
    rows = (
        decoded_postings(index, terms)
        .filter(f"docid = {int(docid)}")
        .collect()
    )
    present = {r["term"]: (int(r["tf"]), int(r["doclen"])) for r in rows}

    req = [t for t, _ in q.required]
    missing_req = [t for t in req if t not in present]
    if missing_req:
        return _expl(
            0.0,
            f"Failure to meet condition(s) of required clause(s): "
            f"{', '.join(missing_req)}",
            match=False,
        )
    hit_excl = sorted(t for t in q.excluded if t in present)
    if hit_excl:
        return _expl(
            0.0,
            f"Failure to meet condition of prohibited clause(s): "
            f"{', '.join(hit_excl)}",
            match=False,
        )
    opt_counts = dict(q.optional)
    n_should = sum(c for t, c in opt_counts.items() if t in present)
    if q.min_should_match > 0 and n_should < q.min_should_match:
        return _expl(
            0.0,
            f"Failure to match minimumNumberShouldMatch: {n_should} < "
            f"{q.min_should_match}",
            match=False,
        )

    stats = index.term_stats_for([t for t in q.scoring_terms])
    n = index.field_stats.doc_count
    avgdl = float(index.field_stats.avgdl())
    sim = bind_similarity(
        similarity, q.scoring_terms, stats, index.field_stats, boost, quantize, dtype
    )
    details = []
    total = dtype(0)
    # canonical sorted-term accumulation order — identical to the scorer's
    for t in sorted(q.scoring_terms):
        if t not in present or t not in stats:
            continue
        tf, dl = present[t]
        qtf = q.scoring_terms[t]
        df = stats[t][0]
        if sim is not None:
            s = sim.score(t, np.array([tf]), np.array([dl]))[0]
            total = total + dtype(s)
            details.append(
                _expl(
                    float(s),
                    f"weight({t} in {docid}) [{sim.name}], from:",
                    details=[
                        _expl(float(sim.weights[t]),
                              f"query weight (boost {boost} * qtf {qtf} folded)"),
                        _expl(float(tf), "freq, occurrences of term within document"),
                        _expl(float(dl), "dl, length of field"),
                        _expl(float(df), "docFreq / n, documents containing term"),
                    ],
                )
            )
            continue
        idf_v = _idf(df, n, dtype)
        w = float(dtype(boost) * dtype(qtf) * idf_v)
        s = score_arrays(
            np.array([tf]), np.array([dl]), w, avgdl, quantize, dtype
        )[0]
        total = total + dtype(s)
        details.append(
            _expl(
                float(s),
                f"weight({t} in {docid}) [BM25], product of:",
                details=[
                    _expl(float(dtype(boost) * dtype(qtf)), f"boost * qtf ({boost} * {qtf})"),
                    _expl(
                        float(idf_v),
                        f"idf, computed as ln(1 + (N - df + 0.5) / (df + 0.5)) "
                        f"with df={df}, N={n}",
                    ),
                    _expl(
                        float(s / w) if w else 0.0,
                        f"tf normalization, computed as freq / (freq + k1 * "
                        f"(1 - b + b * dl / avgdl)) with freq={tf}, k1={K1}, "
                        f"b={B}, dl={dl}, avgdl={round(avgdl, 4)}",
                    ),
                ],
            )
        )
    if not details:
        return _expl(0.0, "no query term matches this doc", match=False)
    return _expl(
        float(total),
        f"sum of {len(details)} matching clause(s):",
        details=details,
    )

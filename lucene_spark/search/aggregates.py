"""Facets, grouping, stats, joins over query matches (SURVEY.md §2.6-2.7).

Each Lucene collector maps to a one-shuffle DataFrame aggregation:
  FastTaxonomyFacetCounts       -> matches.groupBy(dim).count()
  LongRangeFacetCounts          -> bucket CASE expr + groupBy
  GroupingSearch two-pass       -> Window.partitionBy(group) + row_number
  DocValuesStats                -> agg(min/max/avg/stddev/sum)
  DiversifiedTopDocsCollector   -> row_number over (key, score) window
  JoinUtil                      -> plain join + score-mode aggregation
"""

from __future__ import annotations

from typing import Sequence, Tuple

from pyspark.sql import DataFrame, Window, functions as F

from .executor import Index, search_exhaustive
from .plan import NormalizedQuery


def _matches_with(index: Index, q: NormalizedQuery, cols: Sequence[str], **kw) -> DataFrame:
    matches = search_exhaustive(index, q, k=None, **kw)
    return matches.join(index.docs.select("docid", *cols), "docid")


def facet_counts(index: Index, q: NormalizedQuery, dim: str, **kw) -> DataFrame:
    """Facet counts over matching docs (FastTaxonomyFacetCounts.java:40)."""
    return (
        _matches_with(index, q, [dim])
        .groupBy(dim)
        .agg(F.count("*").alias("n"))
        .orderBy(F.col("n").desc(), F.col(dim).asc())
    )


def facet_tree(index: Index, q: NormalizedQuery, path, k: int | None = None,
               parent: str | None = None, sep: str = "/", **kw) -> DataFrame:
    """Hierarchical taxonomy facet counts with rollup
    (facet/taxonomy/FastTaxonomyFacetCounts.java:40 +
    TaxonomyFacets.getTopChildren): ``path`` is a '/'-separated category
    path per doc (a column name or any string Column expression); every
    matching doc counts toward each ancestor prefix of its path (the
    taxonomy rollup). With ``parent`` set, returns the getTopChildren
    analog — the immediate children of that node ordered by rolled-up
    count desc (parent '' or None-with-parent='' = root children; omit
    ``parent`` entirely for ALL tree nodes).

    One explode + one groupBy: the ancestor set is built with pure array
    exprs (split -> transform(sequence) -> slice/array_join), so the plan
    is a single shuffle regardless of tree depth."""
    import re as _re

    col = F.col(path) if isinstance(path, str) else path
    m = search_exhaustive(index, q, k=None, **kw).select("docid")
    j = m.join(index.docs, "docid").select(col.alias("__path__"))
    pat = _re.escape(sep)
    parts = F.split(F.col("__path__"), pat)
    prefixes = F.transform(
        F.sequence(F.lit(1), F.size(parts)),
        lambda i: F.array_join(F.slice(parts, F.lit(1), i), sep),
    )
    counts = (
        j.select(F.explode(prefixes).alias("node"))
        .groupBy("node")
        .agg(F.count("*").alias("n"))
    )
    if parent is not None:
        depth = (parent.count(sep) + 2) if parent else 1
        cond = F.size(F.split(F.col("node"), pat)) == depth
        if parent:
            cond = cond & F.col("node").startswith(parent + sep)
        counts = counts.filter(cond)
    out = counts.orderBy(F.col("n").desc(), F.col("node").asc())
    return out.limit(k) if k else out


def range_facets(index: Index, q: NormalizedQuery, col: str,
                 edges: Sequence[int], **kw) -> DataFrame:
    """Counts per numeric range bucket (LongRangeFacetCounts.java:41).
    Buckets: [edges[i], edges[i+1]) labelled by the lower edge."""
    bucket = None
    for lo, hi in zip(edges, edges[1:]):
        cond = (F.col(col) >= lo) & (F.col(col) < hi)
        bucket = F.when(cond, F.lit(lo).cast("long")) if bucket is None else bucket.when(cond, F.lit(lo).cast("long"))
    return (
        _matches_with(index, q, [col])
        .withColumn("bucket", bucket)
        .filter(F.col("bucket").isNotNull())
        .groupBy("bucket")
        .agg(F.count("*").alias("n"))
        .orderBy("bucket")
    )


def group_topk(index: Index, q: NormalizedQuery, group_col: str, k_per_group: int,
               n_groups: int | None = None, **kw) -> DataFrame:
    """Two-pass grouping (GroupingSearch.java:46): top docs per group by
    score; optionally only the top-N groups by their best hit."""
    m = _matches_with(index, q, [group_col])
    w = Window.partitionBy(group_col).orderBy(F.col("score").desc(), F.col("docid").asc())
    top = m.withColumn("rnk", F.row_number().over(w)).filter(F.col("rnk") <= k_per_group)
    if n_groups:
        heads = (
            top.filter(F.col("rnk") == 1)
            .orderBy(F.col("score").desc(), F.col("docid").asc())
            .limit(n_groups)
            .select(group_col)
        )
        top = top.join(F.broadcast(heads), group_col)
    return top.select(group_col, "docid", F.round("score", 4).alias("score"), F.col("rnk").cast("long").alias("rnk"))


def docvalues_stats(index: Index, q: NormalizedQuery, col: str, **kw) -> DataFrame:
    """min/max/mean/sum/count over a numeric column of matching docs
    (DocValuesStats.java)."""
    return _matches_with(index, q, [col]).agg(
        F.count("*").alias("n"),
        F.min(col).alias("min_v"),
        F.max(col).alias("max_v"),
        F.round(F.avg(col), 4).alias("avg_v"),
        F.sum(col).alias("sum_v"),
    )


def diversified_topk(index: Index, q: NormalizedQuery, key_col: str, k: int,
                     max_per_key: int, **kw) -> DataFrame:
    """Top-k with at most N hits per key (DiversifiedTopDocsCollector)."""
    m = _matches_with(index, q, [key_col])
    w = Window.partitionBy(key_col).orderBy(F.col("score").desc(), F.col("docid").asc())
    return (
        m.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= max_per_key)
        .orderBy(F.col("score").desc(), F.col("docid").asc())
        .limit(k)
        .select("docid", F.round("score", 4).alias("score"), key_col)
    )


def drill_sideways(
    index: Index,
    q: NormalizedQuery,
    filters: dict,
    **kw,
) -> DataFrame:
    """DrillSideways (facet/DrillSideways.java:71): per-dimension facet
    counts computed with THAT dimension's own drill-down filter removed and
    every other dimension's filter applied — the grouping-sets-style
    fan-out that lets the UI show sibling values of each selected facet.

    ``filters``: {dim_column: selected_value}. Returns (dim, value, n)."""
    dims = sorted(filters)
    m = _matches_with(index, q, dims, **kw)
    out = None
    for dim in dims:
        sub = m
        for other in dims:
            if other != dim:
                sub = sub.filter(F.col(other) == filters[other])
        counts = (
            sub.groupBy(F.col(dim).cast("string").alias("value"))
            .agg(F.count("*").alias("n"))
            .select(F.lit(dim).alias("dim"), "value", "n")
        )
        out = counts if out is None else out.unionAll(counts)
    return out.orderBy("dim", "value")


def block_join_parents(
    index: Index,
    q: NormalizedQuery,
    parent_col: str,
    score_mode: str = "max",
    k: int = 10,
    **kw,
) -> DataFrame:
    """ToParentBlockJoinQuery analog (join/ToParentBlockJoinQuery.java:68):
    children (docs) are co-located with their parent as a nested
    array<struct> block; the child query's scores aggregate to the parent
    by ScoreMode Max/Total/Avg/None, and parents rank by that score.

    The nested block shape is real: children are collected into an array
    per parent and the aggregation runs JVM-side over the array
    (F.aggregate / F.size), exactly how nested parent/child docs would be
    stored in one parquet row at scale."""
    matches = search_exhaustive(index, q, k=None, **kw)
    kids = matches.join(index.docs.select("docid", parent_col), "docid")
    blocks = kids.groupBy(parent_col).agg(
        F.collect_list(F.struct("docid", "score")).alias("children")
    )
    agg_expr = {
        "max": F.array_max("children.score"),
        "total": F.aggregate("children", F.lit(0.0), lambda a, x: a + x["score"]),
        "avg": F.aggregate("children", F.lit(0.0), lambda a, x: a + x["score"])
        / F.size("children"),
        "none": F.lit(1.0),
    }[score_mode]
    return (
        blocks.select(
            F.col(parent_col).alias("parent"),
            agg_expr.alias("__raw__"),
            F.size("children").cast("long").alias("n_children"),
        )
        .orderBy(F.col("__raw__").desc(), F.col("parent").asc())
        .limit(k)
        .select("parent", F.round("__raw__", 4).alias("score"), "n_children")
    )


def rescore(
    index: Index,
    first_q: NormalizedQuery,
    second_q: NormalizedQuery,
    n: int = 50,
    k: int = 10,
    w_first: float = 1.0,
    w_second: float = 1.0,
    **kw,
) -> DataFrame:
    """QueryRescorer (search/QueryRescorer.java:31): re-rank the first
    pass's top-N with a costlier second query; combined score =
    w1*first + w2*second (0 when the second query misses the doc)."""
    first = search_exhaustive(index, first_q, k=n, **kw).select(
        "docid", F.col("score").alias("s1")
    )
    second = search_exhaustive(index, second_q, k=None, **kw).select(
        "docid", F.col("score").alias("s2")
    )
    combined = (
        F.lit(float(w_first)) * F.col("s1")
        + F.lit(float(w_second)) * F.coalesce(F.col("s2"), F.lit(0.0))
    )
    return (
        first.join(second, "docid", "left")
        .select("docid", combined.alias("score"))
        .orderBy(F.col("score").desc(), F.col("docid").asc())
        .limit(k)
    )


def common_terms_query(index: Index, terms: Sequence[str],
                       max_df_fraction: float = 0.5) -> NormalizedQuery:
    """CommonTermsQuery (queries/CommonTermsQuery.java:55): split the query
    terms by document frequency — rare terms become MUST, terms above
    maxTermFrequency * docCount become low-impact SHOULD clauses."""
    stats = index.term_stats_for(list(terms))
    cutoff = max_df_fraction * index.field_stats.doc_count
    must = [t for t in terms if t in stats and stats[t][0] <= cutoff]
    should = [t for t in terms if t in stats and stats[t][0] > cutoff]
    from .plan import normalize

    return normalize(must=must, should=should, pre_analyzed=True)


def join_matches(index: Index, q: NormalizedQuery, dim_df: DataFrame, on: str,
                 score_mode: str = "total", **kw) -> DataFrame:
    """Query-time join (JoinUtil.java:56): matching docs joined to a
    dimension table; score modes none/avg/max/total aggregate hit scores
    per join key."""
    m = _matches_with(index, q, [on])
    agg = {
        "none": F.count("*").alias("n_hits"),
        "avg": F.round(F.avg("score"), 4).alias("join_score"),
        "max": F.round(F.max("score"), 4).alias("join_score"),
        "total": F.round(F.sum("score"), 4).alias("join_score"),
    }[score_mode]
    per_key = m.groupBy(on).agg(agg, F.count("*").alias("n_hits")) if score_mode != "none" \
        else m.groupBy(on).agg(agg)
    return per_key.join(dim_df, on)


def sort_topk(
    index: Index,
    q: NormalizedQuery,
    sort_spec: Sequence,
    k: int = 10,
    **kw,
) -> DataFrame:
    """TopFieldCollector (search/TopFieldCollector.java:49): top-k by doc
    field values instead of relevance. ``sort_spec`` = [(col, ascending)],
    docid asc is the implicit final tiebreak (Lucene appends the doc id
    the same way). Returns (docid, *sort cols)."""
    cols = [c for c, _ in sort_spec]
    m = _matches_with(index, q, cols, **kw)
    order = [
        (F.col(c).asc() if asc else F.col(c).desc()) for c, asc in sort_spec
    ] + [F.col("docid").asc()]
    return m.select("docid", *cols).orderBy(*order).limit(k)


def sort_search_after(
    index: Index,
    q: NormalizedQuery,
    sort_spec: Sequence,
    k: int,
    after_values: Sequence,
    after_docid: int,
    **kw,
) -> DataFrame:
    """Field-sorted cursor paging — IndexSearcher.searchAfter with a Sort
    (IndexSearcher.java:623-650, FieldDoc cursor): keep rows STRICTLY
    after the (sort values..., docid) cursor in lexicographic order. The
    cursor predicate is a plain Catalyst expression, so at scale it pushes
    into the scan on the leading sort column (paging never re-reads the
    already-returned prefix). NULL sort values fail every comparison and
    drop out of subsequent pages — coalesce to a sentinel first if a field
    may be missing (the reference's SortField.setMissingValue analog is
    the caller's coalesce)."""
    if len(after_values) != len(sort_spec):
        raise ValueError("after_values must match sort_spec length")
    cols = [c for c, _ in sort_spec]
    m = _matches_with(index, q, cols, **kw)
    # lexicographic strictly-after: OR over prefixes (equal on the prefix,
    # strictly past on the next key; docid asc is the last key)
    pred = None
    eq_prefix = None
    for (c, asc), v in zip(sort_spec, after_values):
        strict = F.col(c) > F.lit(v) if asc else F.col(c) < F.lit(v)
        clause = strict if eq_prefix is None else (eq_prefix & strict)
        pred = clause if pred is None else (pred | clause)
        this_eq = F.col(c) == F.lit(v)
        eq_prefix = this_eq if eq_prefix is None else (eq_prefix & this_eq)
    tie = eq_prefix & (F.col("docid") > F.lit(int(after_docid)))
    pred = tie if pred is None else (pred | tie)
    order = [
        (F.col(c).asc() if asc else F.col(c).desc()) for c, asc in sort_spec
    ] + [F.col("docid").asc()]
    return m.select("docid", *cols).filter(pred).orderBy(*order).limit(k)


def more_like_this_from_doc(
    index: Index, docid: int, max_terms: int = 3, k: int = 10,
    quantize: bool = False, **kw
) -> DataFrame:
    """MoreLikeThis seeded from a doc's TERM VECTOR (MoreLikeThis.java:149
    via TermVectorsFormat instead of re-analysis): top ``max_terms`` terms
    of the doc by tf*idf become an OR query. Works without stored content
    (keep_content=False) — the whole seed read touches one docid's parquet
    row groups."""
    import numpy as np

    from .executor import search_topk
    from .plan import normalize

    tv = [
        (r["term"], int(r["tf"]))
        for r in index.term_vector(docid).select("term", "tf").collect()
    ]
    if not tv:
        raise ValueError(f"doc {docid} has no term vector (unknown docid?)")
    stats = index.term_stats_for([t for t, _ in tv])
    n = index.field_stats.doc_count
    scored = [
        (t, tf * float(np.log(1.0 + (n - stats[t][0] + 0.5) / (stats[t][0] + 0.5))))
        for t, tf in tv
        if t in stats
    ]
    scored.sort(key=lambda x: (-x[1], x[0]))
    terms = [t for t, _ in scored[:max_terms]]
    q = normalize(should=terms, pre_analyzed=True)
    import numpy as _np

    return search_topk(index, q, k=k, quantize=quantize,
                       dtype=_np.float64 if not quantize else _np.float32, **kw)

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

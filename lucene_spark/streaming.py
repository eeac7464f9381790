"""Streaming analogs of Lucene's incremental machinery (SURVEY.md §2.9).

Two pieces are genuinely streaming-shaped:

  Monitor (percolator)  [lucene/monitor/src/java/org/apache/lucene/monitor/Monitor.java:42]
      reverse search: stored queries matched against a document stream.
      -> Structured Streaming stream-static join: stream of docs joined
         against a small static query-term table.

  NRT refresh / SearcherManager  [index/DirectoryReader.java:241-278]
      -> foreachBatch incremental index append: each micro-batch builds new
         segments into the same index dir (manifest grows; readers see the
         new snapshot on next open).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from .pipeline.textstats import tokens


def percolate_batch(docs: DataFrame, queries: DataFrame, text_col: str = "text") -> DataFrame:
    """Match stored queries against a batch/stream of documents.

    ``queries``: (qid int, terms array<string>, min_match int) — a doc
    matches when >= min_match of the query's distinct terms occur in it.
    Per-doc matching against the broadcast query table (MemoryIndex-style,
    MemoryIndex.java:201): no shuffle, no stateful aggregation, so the plan
    is a pure stream-static join that runs in append mode without
    watermarks. For LARGE stored-query sets use percolate_prefiltered —
    this broadcast form evaluates every query against every doc.
    """
    toked = docs.withColumn("__toks__", F.array_distinct(tokens(text_col)))
    j = toked.crossJoin(F.broadcast(queries))
    return (
        j.withColumn("n_matched", F.size(F.array_intersect("__toks__", "terms")).cast("long"))
        .filter(F.col("n_matched") >= F.col("min_match"))
        .select("qid", "doc_id", "n_matched")
    )


def percolate_prefiltered(docs: DataFrame, queries: DataFrame, text_col: str = "text") -> DataFrame:
    """Term-partitioned percolation for large stored-query sets — the
    Monitor's query-index pre-filter (monitor/Monitor.java:42,
    CandidateMatcher.java): instead of evaluating every query against every
    doc, explode both sides to (key, term) rows and equi-join on term, so a
    (doc, query) pair is considered only when they SHARE a term. Because
    both sides are term-distinct, the per-(qid, doc) join-row count IS the
    number of matched query terms — one shuffle join + one aggregation,
    no cross product, scales in Σ|doc terms| + Σ|query terms|.

    Results are identical to percolate_batch (differential-tested)."""
    dterms = docs.select(
        "doc_id", F.explode(F.array_distinct(tokens(text_col))).alias("term")
    )
    qterms = queries.select(
        "qid", "min_match", F.explode(F.array_distinct("terms")).alias("term")
    )
    return (
        dterms.join(qterms, "term")
        .groupBy("qid", "doc_id", "min_match")
        .agg(F.count("*").alias("n_matched"))
        .filter(F.col("n_matched") >= F.col("min_match"))
        .select("qid", "doc_id", "n_matched")
    )


def percolate_full(
    docs: DataFrame,
    queries: DataFrame,
    text_col: str = "text",
) -> DataFrame:
    """Percolation with the full stored-query shape the Monitor supports
    for boolean queries (monitor/Monitor.java:42, QueryDecomposer):

    ``queries``: (qid int, terms array<string>, min_match int,
                  not_terms array<string>, phrase array<string>)
    — a doc matches when >= min_match of ``terms`` occur, NONE of
    ``not_terms`` occur (empty/null = no exclusion), and ``phrase`` (an
    exact consecutive-token run; empty/null = no phrase) occurs.

    Streaming note: the NOT/phrase legs aggregate, so in Structured
    Streaming run this from ``foreachBatch`` (micro-batch = static frame);
    the pure pre-filter (``percolate_batch``) remains the append-mode
    stream-static form.

    All three constraints are shuffle joins — no cross product, no
    per-doc Python:
      positive   explode+equi-join on term (the existing pre-filter);
      NOT        anti-join candidates against (doc, excluded-term) hits;
      phrase     anchor trick: join doc (term, pos) rows with the
                 phrase's (term, slot-offset) rows, anchor = pos - offset;
                 a doc position anchors the phrase iff ALL slots agree on
                 the anchor — count distinct slots per (qid, doc, anchor)
                 and keep groups hitting the full slot count.
    """
    cand = percolate_prefiltered(docs, queries, text_col)

    qnot = queries.select(
        "qid", F.explode_outer("not_terms").alias("term")
    ).filter(F.col("term").isNotNull())
    dterms = docs.select(
        "doc_id", F.explode(F.array_distinct(tokens(text_col))).alias("term")
    )
    excluded_pairs = qnot.join(dterms, "term").select("qid", "doc_id").distinct()
    cand = cand.join(excluded_pairs, ["qid", "doc_id"], "left_anti")

    has_phrase = queries.filter(F.size(F.coalesce("phrase", F.array())) > 0)
    slots = has_phrase.select(
        "qid",
        F.size("phrase").alias("n_slots"),
        F.posexplode("phrase").alias("slot", "term"),
    )
    dpos = docs.select(
        "doc_id", F.posexplode(tokens(text_col)).alias("pos", "term")
    )
    anchored = (
        dpos.join(slots, "term")
        .select("qid", "doc_id", "n_slots", "slot", (F.col("pos") - F.col("slot")).alias("anchor"))
        .groupBy("qid", "doc_id", "anchor", "n_slots")
        .agg(F.count_distinct("slot").alias("hit_slots"))
        .filter(F.col("hit_slots") == F.col("n_slots"))
        .select("qid", "doc_id")
        .distinct()
    )
    phrase_fail = (
        has_phrase.select("qid")
        .join(cand, "qid")
        .select("qid", "doc_id")
        .join(anchored, ["qid", "doc_id"], "left_anti")
    )
    return cand.join(phrase_fail, ["qid", "doc_id"], "left_anti")


def percolate_stream(spark: SparkSession, stream_df: DataFrame, queries: DataFrame,
                     text_col: str = "text", query_name: str = "percolator"):
    """Run the percolator as a Structured Streaming query into a memory
    sink. Returns the StreamingQuery; results at ``SELECT * FROM {name}``."""
    hits = percolate_batch(stream_df, queries, text_col)
    return (
        hits.writeStream.outputMode("append")
        .format("memory")
        .queryName(query_name)
        .start()
    )


def incremental_append(spark: SparkSession, new_docs: DataFrame, index_dir: str, cfg=None):
    """NRT-append analog: index a new micro-batch of docs as fresh segments
    (docids continue after the current max, block binaries encoded with the
    offset baked in), then refresh the snapshot-global artifacts. Use from
    ``foreachBatch`` for a streaming ingest."""
    from .index.builder import append_to_index

    return append_to_index(spark, new_docs, index_dir, cfg)

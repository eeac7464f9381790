"""Inverted-index build pipeline (Spark-first, Lucene-semantics).

Maps Lucene's write path (SURVEY.md §3.2) onto Spark:

  Lucene                                    here
  ------                                    ----
  DocumentsWriterPerThread (DWPT)           one docid-range partition
    [index/DocumentsWriterPerThread.java:245]
  in-memory invert (TermsHashPerField)      pandas groupby inside applyInPandas
    [index/TermsHashPerField.java:134]
  flush -> segment files                    worker writes postings/norms/docs
    [index/FreqProxTermsWriter.java:83-111]   parquet shards via pyarrow
  commit -> segments_N manifest             per-segment manifest JSON, written
    [index/IndexWriter.java:4158]             last (atomic rename) = lineage
  SegmentMerger.mergeTerms                  term-partitioned shuffle,
    [index/SegmentMerger.java:116-149]        hot terms salted by segment range

Scale design (10^12 files):
  - docid assignment: range-partition once on (repo,path,commit), write the
    staged table (freezes partition boundaries deterministically), then
    per-partition offsets (column-pruned count scan) + in-group enumeration.
  - segment build is shuffle-free per group; every heavy transform is
    pandas/numpy inside applyInPandas (Arrow batches, no per-row Python at
    the Spark boundary).
  - merge shuffles only term-level rows (term, segment, encoded blocks) --
    tiny compared to raw postings; hot terms (df >= hot_df_threshold) are
    salted into (term, segment-range-bucket) sub-keys so no reducer sees an
    unbounded posting list. Bucket order == docid order, so a salted term's
    global posting list is the ordered concat of its bucket rows.
  - resume: a segment whose manifest JSON exists is skipped (lineage +
    doc/posting-count metrics live in the manifest).
"""

from __future__ import annotations

import json
import math
import os
from dataclasses import dataclass, field
from typing import Iterable, List, Optional, Sequence

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..analysis import ENGLISH_STOP_WORDS, analyze_batch
from ..functions.codec import encode_postings
from ..functions.smallfloat import int_to_byte4

MANIFEST_SCHEMA = (
    "segment_id int, first_docid long, last_docid long, num_docs long, "
    "doc_count long, sum_doclen long, num_terms long, num_postings long, "
    "status string, resumed boolean"
)

POSTINGS_ARROW_SCHEMA = pa.schema(
    [
        ("term", pa.string()),
        ("segment_id", pa.int32()),
        ("df", pa.int64()),
        ("ttf", pa.int64()),
        ("first_docid", pa.int64()),
        ("last_docid", pa.int64()),
        ("max_tf", pa.int32()),
        ("min_doclen", pa.int32()),
        ("block_first", pa.list_(pa.int64())),
        ("block_last", pa.list_(pa.int64())),
        ("block_maxtf", pa.list_(pa.int32())),
        ("block_mindl", pa.list_(pa.int32())),
        ("block_data", pa.list_(pa.binary())),
    ]
)


@dataclass
class IndexConfig:
    order_cols: Sequence[str] = ("repo", "path", "commit")
    content_col: str = "content"
    docid_col: Optional[str] = None  # use an existing unique long column as docid
    stop_words: frozenset = ENGLISH_STOP_WORDS
    num_segments: int = 0  # 0 -> auto (target_docs_per_segment)
    target_docs_per_segment: int = 250_000  # Lucene slice bound (IndexSearcher.java:323-341)
    hot_df_threshold: int = 100_000  # df above this gets salted at merge
    merge_bucket_segments: int = 8  # segments per salt bucket for hot terms
    keep_content: bool = True  # store content in docs table for hydration


@dataclass
class IndexPaths:
    root: str

    @property
    def staged(self) -> str:
        return os.path.join(self.root, "staged")

    def staged_gen(self, generation: int) -> str:
        return self.staged if generation == 0 else os.path.join(self.root, f"staged-g{generation}")

    @property
    def segments(self) -> str:
        return os.path.join(self.root, "segments")

    @property
    def docs(self) -> str:
        return os.path.join(self.root, "docs")

    @property
    def norms(self) -> str:
        return os.path.join(self.root, "norms")

    @property
    def postings(self) -> str:
        return os.path.join(self.root, "postings")

    @property
    def merged(self) -> str:
        return os.path.join(self.root, "merged")

    @property
    def term_stats(self) -> str:
        return os.path.join(self.root, "term_stats")

    @property
    def field_stats(self) -> str:
        return os.path.join(self.root, "field_stats.json")

    def manifest_file(self, segment_id: int) -> str:
        return os.path.join(self.segments, f"segment-{segment_id:05d}.json")


def _invert_group(
    pdf: pd.DataFrame,
    segment_id: int,
    docid_base: int,
    paths: IndexPaths,
    cfg: IndexConfig,
) -> pd.DataFrame:
    """Build one segment: assign docids, analyze, invert, encode, write shards.

    Runs inside applyInPandas. Returns the one-row manifest frame.
    """
    manifest_path = paths.manifest_file(segment_id)
    if os.path.exists(manifest_path):  # resume: lineage says done
        with open(manifest_path) as f:
            row = json.load(f)
        row["resumed"] = True
        return pd.DataFrame([row])

    if cfg.docid_col:
        pdf = pdf.sort_values(cfg.docid_col, kind="mergesort").reset_index(drop=True)
        docids = pdf[cfg.docid_col].to_numpy(dtype=np.int64)
    else:
        pdf = pdf.sort_values(list(cfg.order_cols), kind="mergesort").reset_index(drop=True)
        docids = docid_base + np.arange(len(pdf), dtype=np.int64)

    tokens = analyze_batch(pdf[cfg.content_col], cfg.stop_words)
    doclens = np.fromiter((len(t) for t in tokens), dtype=np.int64, count=len(tokens))

    # --- invert: explode + groupby == TermsHashPerField.add, vectorized
    counts = np.maximum(doclens, 0)
    flat_terms = np.concatenate([np.asarray(t, dtype=object) for t in tokens]) if len(tokens) else np.array([], dtype=object)
    flat_docids = np.repeat(docids, counts)
    tf_frame = (
        pd.DataFrame({"term": flat_terms, "docid": flat_docids})
        .groupby(["term", "docid"], sort=True, observed=True)
        .size()
        .rename("tf")
        .reset_index()
    )
    dl_by_docid = pd.Series(doclens, index=docids)
    tf_frame["doclen"] = dl_by_docid.reindex(tf_frame["docid"]).to_numpy(dtype=np.int64)

    # --- per-term block encoding (FreqProxTermsWriter flush analog)
    terms_out: List[dict] = []
    t_ids = tf_frame["docid"].to_numpy(dtype=np.int64)
    t_tfs = tf_frame["tf"].to_numpy(dtype=np.int64)
    t_dls = tf_frame["doclen"].to_numpy(dtype=np.int64)
    term_vals = tf_frame["term"].to_numpy(dtype=object)
    # groupby(sort=True) output is sorted by (term, docid): slice runs per term
    if len(term_vals):
        change = np.flatnonzero(term_vals[1:] != term_vals[:-1]) + 1
        starts = np.concatenate(([0], change))
        ends = np.concatenate((change, [len(term_vals)]))
        for s, e in zip(starts, ends):
            ids, tfs, dls = t_ids[s:e], t_tfs[s:e], t_dls[s:e]
            blocks, firsts, lasts, maxtfs, mindls = encode_postings(ids, tfs, dls)
            terms_out.append(
                {
                    "term": term_vals[s],
                    "segment_id": segment_id,
                    "df": e - s,
                    "ttf": int(tfs.sum()),
                    "first_docid": int(ids[0]),
                    "last_docid": int(ids[-1]),
                    "max_tf": int(tfs.max()),
                    "min_doclen": int(dls.min()),
                    "block_first": firsts,
                    "block_last": lasts,
                    "block_maxtf": maxtfs,
                    "block_mindl": mindls,
                    "block_data": blocks,
                }
            )

    # --- write shards (Lucene flush-to-segment-files analog)
    os.makedirs(paths.postings, exist_ok=True)
    os.makedirs(paths.norms, exist_ok=True)
    os.makedirs(paths.docs, exist_ok=True)
    os.makedirs(paths.segments, exist_ok=True)
    postings_tbl = pa.Table.from_pylist(terms_out, schema=POSTINGS_ARROW_SCHEMA)
    pq.write_table(postings_tbl, os.path.join(paths.postings, f"segment-{segment_id:05d}.parquet"))

    norm_bytes = int_to_byte4(doclens)
    norms_tbl = pa.table(
        {
            "docid": docids,
            "doclen": doclens,
            "norm_byte": norm_bytes.astype(np.int32),
            "segment_id": np.full(len(docids), segment_id, dtype=np.int32),
        }
    )
    pq.write_table(norms_tbl, os.path.join(paths.norms, f"segment-{segment_id:05d}.parquet"))

    doc_cols = {"docid": docids}
    for c in pdf.columns:
        if c in ("__pid__", cfg.content_col):
            continue
        doc_cols[c] = pdf[c].to_numpy()
    if cfg.keep_content:
        doc_cols[cfg.content_col] = pdf[cfg.content_col].to_numpy()
    pq.write_table(pa.table(doc_cols), os.path.join(paths.docs, f"segment-{segment_id:05d}.parquet"))

    row = {
        "segment_id": segment_id,
        "first_docid": int(docids[0]) if len(docids) else -1,
        "last_docid": int(docids[-1]) if len(docids) else -1,
        "num_docs": int(len(pdf)),
        "doc_count": int((doclens > 0).sum()),  # docs with >=1 token == Terms.getDocCount()
        "sum_doclen": int(doclens.sum()),
        "num_terms": len(terms_out),
        "num_postings": int(len(tf_frame)),
        "status": "complete",
        "resumed": False,
    }
    # manifest written LAST -> atomic completion marker (commit analog)
    tmp = manifest_path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(row, f)
    os.replace(tmp, manifest_path)
    return pd.DataFrame([row])


def build_segments(
    spark: SparkSession,
    docs: DataFrame,
    paths: IndexPaths,
    cfg: IndexConfig,
    docid_base: int = 0,
    segment_id_base: int = 0,
    generation: int = 0,
) -> None:
    """Stage + per-partition segment build. Appends to the segment set when
    docid_base/segment_id_base are offset (NRT-append analog)."""
    staged_dir = paths.staged_gen(generation)
    # --- stage: freeze deterministic range partitioning (docid basis)
    if not os.path.exists(os.path.join(staged_dir, "_SUCCESS")):
        n_docs = docs.count()
        nseg = cfg.num_segments or max(1, math.ceil(n_docs / cfg.target_docs_per_segment))
        cols = [cfg.docid_col] if cfg.docid_col else list(cfg.order_cols)
        staged = (
            docs.withColumn("content_sha256", F.sha2(F.col(cfg.content_col), 256))
            .repartitionByRange(nseg, *[F.col(c) for c in cols])
            .withColumn("__pid__", F.spark_partition_id())
        )
        staged.write.mode("overwrite").parquet(staged_dir)

    staged = spark.read.parquet(staged_dir)

    # --- per-partition doc counts -> docid offsets (column-pruned scan)
    pid_counts = staged.groupBy("__pid__").count().collect()
    pid_counts.sort(key=lambda r: r["__pid__"])
    offsets = {}
    acc = docid_base
    for r in pid_counts:
        offsets[r["__pid__"]] = acc
        acc += r["count"]

    cfg_bc, paths_bc, offsets_bc, sid_base = cfg, paths, offsets, segment_id_base

    def seg_fn(key, pdf: pd.DataFrame) -> pd.DataFrame:
        sid = int(key[0])
        return _invert_group(pdf, sid + sid_base, offsets_bc.get(sid, 0), paths_bc, cfg_bc)

    staged.groupBy("__pid__").applyInPandas(seg_fn, MANIFEST_SCHEMA).collect()


def read_manifests(paths: IndexPaths) -> List[dict]:
    import glob

    rows = []
    for m in sorted(glob.glob(os.path.join(paths.segments, "segment-*.json"))):
        with open(m) as f:
            rows.append(json.load(f))
    return rows


def finalize_index(spark: SparkSession, paths: IndexPaths, cfg: IndexConfig) -> None:
    """Global artifacts over the full segment set: field stats, term stats,
    salted merged index. Idempotent (skips what exists)."""
    manifest_rows = read_manifests(paths)

    # --- global field stats (TermStates/FieldStats analog, SURVEY §2.4)
    if not os.path.exists(paths.field_stats):
        fs = {
            "max_doc": int(sum(r["num_docs"] for r in manifest_rows)),
            "doc_count": int(sum(r["doc_count"] for r in manifest_rows)),
            "sum_total_term_freq": int(sum(r["sum_doclen"] for r in manifest_rows)),
            "sum_doc_freq": int(sum(r["num_postings"] for r in manifest_rows)),
            "num_segments": len(manifest_rows),
        }
        tmp = paths.field_stats + ".tmp"
        with open(tmp, "w") as f:
            json.dump(fs, f)
        os.replace(tmp, paths.field_stats)

    merged_done = os.path.exists(os.path.join(paths.merged, "_SUCCESS"))
    seg_postings = spark.read.parquet(paths.postings)

    # --- global term stats (aggregate across segments == TermStates.build)
    ts_path = paths.term_stats
    if not os.path.exists(os.path.join(ts_path, "_SUCCESS")):
        (
            seg_postings.groupBy("term")
            .agg(F.sum("df").alias("df"), F.sum("ttf").alias("ttf"))
            .repartition(max(1, spark.sparkContext.defaultParallelism // 2), "term")
            .sortWithinPartitions("term")
            .write.mode("overwrite")
            .parquet(ts_path)
        )

    # --- merge: term-partitioned shuffle with hot-term salting
    if not merged_done:
        term_stats = spark.read.parquet(ts_path)
        hot = term_stats.filter(F.col("df") >= cfg.hot_df_threshold).select("term")
        bucket = (F.col("segment_id") / F.lit(cfg.merge_bucket_segments)).cast("int")
        with_salt = seg_postings.join(
            F.broadcast(hot.withColumn("__hot__", F.lit(True))), "term", "left"
        ).withColumn("salt", F.when(F.col("__hot__").isNotNull(), bucket).otherwise(F.lit(0)))

        merged_schema = (
            "term string, salt int, df long, ttf long, first_docid long, "
            "last_docid long, max_tf int, min_doclen int, "
            "block_first array<long>, block_last array<long>, "
            "block_maxtf array<int>, block_mindl array<int>, block_data array<binary>"
        )

        def merge_fn(pdf: pd.DataFrame) -> pd.DataFrame:
            # segments hold disjoint ascending docid ranges -> ordered concat
            # == SegmentMerger.mergeTerms docBase remap, already-global docids
            pdf = pdf.sort_values("segment_id", kind="mergesort")
            out = {
                "term": pdf["term"].iloc[0],
                "salt": int(pdf["salt"].iloc[0]),
                "df": int(pdf["df"].sum()),
                "ttf": int(pdf["ttf"].sum()),
                "first_docid": int(pdf["first_docid"].iloc[0]),
                "last_docid": int(pdf["last_docid"].iloc[-1]),
                "max_tf": int(pdf["max_tf"].max()),
                "min_doclen": int(pdf["min_doclen"].min()),
                "block_first": [x for bl in pdf["block_first"] for x in bl],
                "block_last": [x for bl in pdf["block_last"] for x in bl],
                "block_maxtf": [x for bl in pdf["block_maxtf"] for x in bl],
                "block_mindl": [x for bl in pdf["block_mindl"] for x in bl],
                "block_data": [x for bl in pdf["block_data"] for x in bl],
            }
            return pd.DataFrame([out])

        nmerge = max(4, spark.sparkContext.defaultParallelism)
        (
            with_salt.drop("__hot__")
            .groupBy("term", "salt")
            .applyInPandas(merge_fn, merged_schema)
            .repartition(nmerge, "term")
            .sortWithinPartitions("term", "salt")
            .write.mode("overwrite")
            .parquet(paths.merged)
        )


def build_index(
    spark: SparkSession,
    docs: DataFrame,
    index_dir: str,
    cfg: IndexConfig | None = None,
) -> IndexPaths:
    """Full build: stage -> segments -> global stats -> salted merge."""
    cfg = cfg or IndexConfig()
    paths = IndexPaths(index_dir)
    os.makedirs(index_dir, exist_ok=True)
    if os.path.exists(paths.field_stats) and os.path.exists(
        os.path.join(paths.merged, "_SUCCESS")
    ):
        return paths  # fully built (resume no-op)
    build_segments(spark, docs, paths, cfg)
    finalize_index(spark, paths, cfg)
    return paths


def append_to_index(
    spark: SparkSession,
    new_docs: DataFrame,
    index_dir: str,
    cfg: IndexConfig | None = None,
) -> IndexPaths:
    """NRT-append analog (DirectoryReader.openIfChanged, SURVEY.md §2.9):
    index a new batch as fresh segments (docids continue after the current
    max), then rebuild the global snapshot artifacts."""
    import shutil

    cfg = cfg or IndexConfig()
    paths = IndexPaths(index_dir)
    existing = read_manifests(paths)
    if not existing:
        return build_index(spark, new_docs, index_dir, cfg)
    docid_base = max(r["last_docid"] for r in existing) + 1
    sid_base = max(r["segment_id"] for r in existing) + 1
    build_segments(
        spark, new_docs, paths, cfg,
        docid_base=docid_base, segment_id_base=sid_base, generation=sid_base,
    )
    # invalidate + rebuild snapshot-global artifacts
    for p in (paths.term_stats, paths.merged):
        if os.path.exists(p):
            shutil.rmtree(p)
    if os.path.exists(paths.field_stats):
        os.remove(paths.field_stats)
    finalize_index(spark, paths, cfg)
    return paths

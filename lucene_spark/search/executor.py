"""Query execution: exhaustive DataFrame path + per-segment block-max top-k.

Physical strategy mirrors Lucene's BooleanScorerSupplier choices
(SURVEY.md §4.2, search/BooleanScorerSupplier.java:33):

  exhaustive path  -> decode postings into a DataFrame, score with Spark SQL
                      (windowed BooleanScorer analog; always correct; used as
                      the oracle and for non-top-k consumers: counts, facets)
  top-k path       -> per-segment vectorized block-max MAXSCORE/WAND inside
                      applyInPandas (WANDScorer.java:55, MaxScoreBulkScorer.java:26,
                      BlockMaxConjunctionBulkScorer.java:36), then a global
                      merge: orderBy(score desc, docid asc).limit(k)
                      == per-leaf collectors + TopDocs.merge
                      (TopScoreDocCollector.java:64-170, TopDocs.java:203-228)

Per-segment top-k is a superset of each segment's contribution to the
global top-k, so the merge is exact. Tie-break: score desc, docid asc
(HitQueue.java lessThan).
"""

from __future__ import annotations

import json
import os
import re
from dataclasses import dataclass
from typing import Dict, Iterable, List, Optional, Sequence, Tuple

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..functions.codec import decode_block
from ..index.builder import IndexPaths
from .plan import (
    MUST,
    MUST_NOT,
    SHOULD,
    NormalizedQuery,
    QBool,
    QFuzzy,
    QPhrase,
    QPrefix,
    QRange,
    QTerm,
    QWildcard,
)
from .scorer import FieldStats, score_arrays, term_weights

TOPK_SCHEMA = "docid long, score double, blocks_total long, blocks_decoded long"
METRICS_SCHEMA = "segment_id long, blocks_total long, blocks_decoded long"
DECODED_SCHEMA = "term string, docid long, tf int, doclen int"
TOMBSTONE_SCHEMA = "docid long, segment_id int"

# MAXSCORE theta-refresh window (blocks decoded between threshold refreshes,
# MaxScoreBulkScorer.java:26 window analog); module-level so tests can shrink
# it to exercise chunk-boundary behavior on small corpora.
MAXSCORE_CHUNK = 16

# Pruning safety margin: per-doc sums are re-done in canonical order for the
# final score, so prune thresholds get a tiny slack to cover reassociation.
PRUNE_SCALE = {np.float32: 1.0 - 1e-4, np.float64: 1.0 - 1e-9}


class Index:
    """Opened index: stats + lazy DataFrames (DirectoryReader analog).

    ``generation`` opens a RETAINED past commit (DirectoryReader.open(
    IndexCommit) analog): the per-generation marker supplies that commit's
    stats and snapshot bounds (max segment id / max docid), and the segment
    -level DataFrames filter later appends out (docid/segment_id predicates
    -> parquet row-group pruning, no data rewrite). Commits are retained by
    ``append_to_index(keep_commits=True)`` (SnapshotDeletionPolicy analog);
    the default policy GCs them (KeepOnlyLastCommitDeletionPolicy). Deletes
    are snapshot-global here (tombstones ride beside the commits), a
    documented departure from per-commit liveDocs."""

    def __init__(self, spark: SparkSession, paths: IndexPaths,
                 generation: Optional[int] = None):
        from ..index import fsio

        self.spark = spark
        self.paths = paths
        if generation is None:
            fs = fsio.read_json(paths.fs, paths.fs_path(paths.field_stats))
        else:
            marker = paths.fs_path(paths.field_stats_g(int(generation)))
            if not fsio.exists(paths.fs, marker):
                from ..index.builder import list_commits

                raise ValueError(
                    f"no retained commit for generation {generation} at "
                    f"{paths.root}; openable commits: {list_commits(paths.root)} "
                    "(retain with append_to_index(keep_commits=True))"
                )
            fs = fsio.read_json(paths.fs, marker)
        from ..index.builder import INDEX_FORMAT_VERSION

        # SegmentInfos-style version gate (SegmentInfos.java:305): refuse
        # indexes stamped by a NEWER format; older stamps (or pre-stamp
        # indexes) are fine — the only cross-version artifact is the
        # tombstone store, migrated below.
        stamped = int(fs.get("format_version", 0))
        if stamped > INDEX_FORMAT_VERSION:
            raise RuntimeError(
                f"index at {paths.root} has format_version {stamped}, newer than "
                f"this engine's {INDEX_FORMAT_VERSION}; upgrade the engine"
            )
        self._migrate_legacy_tombstones()
        self.field_stats = FieldStats(
            fs["max_doc"], fs["doc_count"], fs["sum_total_term_freq"],
            fs["sum_doc_freq"], int(fs.get("max_dl", 0)),
        )
        # field_stats.json is the snapshot commit marker: it names the live
        # generation of the snapshot-global artifacts (see finalize_index)
        self.generation = int(fs.get("generation", 0))
        # None on pre-stamp indexes (unknown); else whether the positions
        # stream exists — phrase/interval/highlight paths refuse when False
        # (the reference throws "field ... was indexed without position
        # data" rather than silently matching nothing)
        ip = fs.get("index_positions")
        self.has_positions: Optional[bool] = None if ip is None else bool(ip)
        io_ = fs.get("index_offsets")
        # None = pre-offsets-format index (unknown -> treated as absent)
        self.has_offsets: Optional[bool] = None if io_ is None else bool(io_)
        tv = fs.get("term_vectors")
        self.has_term_vectors: Optional[bool] = None if tv is None else bool(tv)
        # stamped by finalize_index; None on pre-stamp indexes
        self.analysis_fingerprint: Optional[str] = fs.get("analysis_fingerprint")
        self._merged_dir = paths.merged_g(self.generation)
        self._term_stats_dir = paths.term_stats_g(self.generation)
        # snapshot bounds (None on live opens or pre-snapshot markers):
        # segment-level reads filter out segments/docids appended later
        self._snap_max_sid = (
            int(fs["max_segment_id"])
            if generation is not None and "max_segment_id" in fs else None
        )
        self._snap_max_docid = (
            int(fs["max_docid"])
            if generation is not None and "max_docid" in fs else None
        )
        self._stats_cache: Dict[str, Optional[Tuple[int, int]]] = {}
        self._deleted: Optional[np.ndarray] = None
        self._has_deletes: Optional[bool] = None
        self._qcache = None

    # --- query cache (LRUQueryCache analog; off by default) ---------------

    def enable_query_cache(self, max_entries: int = 32, min_frequency: int = 2):
        """Attach an LRU cache of filter docid sets to this searcher
        (IndexSearcher.setQueryCache analog, LRUQueryCache.java:119).
        Returns the cache for stats inspection."""
        from .cache import QueryCache

        self._qcache = QueryCache(max_entries, min_frequency)
        return self._qcache

    @property
    def query_cache(self):
        return self._qcache

    # --- deletes (per-segment tombstones == liveDocs, PendingDeletes.java:31-34;
    # like Lucene, deleted docs stop MATCHING immediately but collection
    # statistics keep counting them until segments are purged/merged).
    # Tombstones are PARQUET rows (docid, segment_id) written by Spark jobs
    # and consumed either cogrouped per segment (pruned top-k paths) or via
    # a distributed anti-join (exhaustive path) — no query path materializes
    # the delete set on the driver or ships it inside task closures.

    def _migrate_legacy_tombstones(self) -> None:
        """v4 -> v5 tombstone migration: pre-v5 indexes stored deletes as
        numbered ``tombstones/delete-*.json`` files (``{"docids": [...]}``);
        v5 readers scan only ``*.parquet``, so without migration a legacy
        index would silently resurface every deleted doc (ADVICE r3). Each
        JSON file is folded into the parquet tombstone table (same
        segment-bucketing path as a live delete) and then removed; the
        rewrite is idempotent — a crash mid-migration re-runs it, and
        duplicate tombstone rows are harmless (delete sets are unioned)."""
        from ..index import fsio

        tdir = self.paths.fs_path(self.paths.tombstones)
        legacy = fsio.list_files(self.paths.fs, tdir, prefix="delete-", suffix=".json")
        if not legacy:
            return
        ids: List[int] = []
        for f in legacy:
            ids.extend(int(d) for d in fsio.read_json(self.paths.fs, f)["docids"])
        if ids:
            self.delete_docs_df(
                self.spark.createDataFrame([(d,) for d in sorted(set(ids))], "docid long")
            )
        for f in legacy:
            self.paths.fs.delete_file(f)
        self._has_deletes = None

    @property
    def has_deletes(self) -> bool:
        if self._has_deletes is None:
            from ..index import fsio

            self._has_deletes = bool(
                fsio.list_files(
                    self.paths.fs,
                    self.paths.fs_path(self.paths.tombstones),
                    suffix=".parquet",
                )
            )
        return self._has_deletes

    @property
    def tombstones(self) -> DataFrame:
        """All tombstones as a DataFrame (docid long, segment_id int)."""
        if not self.has_deletes:
            return self.spark.createDataFrame([], TOMBSTONE_SCHEMA)
        return self.spark.read.schema(TOMBSTONE_SCHEMA).parquet(self.paths.tombstones)

    @property
    def deleted(self) -> np.ndarray:
        """Sorted docids of all tombstoned docs — DIAGNOSTIC / small-index
        accessor (tests, purge sanity checks). Query paths never call this;
        they cogroup or anti-join the tombstone parquet instead."""
        if self._deleted is None:
            if not self.has_deletes:
                self._deleted = np.empty(0, dtype=np.int64)
            else:
                rows = self.tombstones.select("docid").collect()
                self._deleted = np.unique(np.array([r["docid"] for r in rows], np.int64))
        return self._deleted

    def _segment_ranges(self) -> DataFrame:
        """(segment_id, first_docid, last_docid) from the manifests — the
        tiny broadcastable map from docid to owning segment."""
        from ..index.builder import read_manifests

        rows = [
            (int(m["segment_id"]), int(m["first_docid"]), int(m["last_docid"]))
            for m in read_manifests(self.paths)
        ]
        return self.spark.createDataFrame(
            rows, "segment_id int, first_docid long, last_docid long"
        )

    def delete_docs_df(self, ids_df: DataFrame) -> int:
        """Distributed deleteDocuments: a DataFrame of docids is bucketed to
        its owning segments (broadcast range join against the manifest) and
        appended to the tombstone parquet by a Spark job — docids never pass
        through driver memory (IndexWriter.deleteDocuments analog,
        IndexWriter.java:1911; per-segment liveDocs shape,
        PendingDeletes.java:31)."""
        ranges = F.broadcast(self._segment_ranges())
        out = (
            ids_df.select(F.col(ids_df.columns[0]).cast("long").alias("docid"))
            .distinct()
            .join(
                ranges,
                (F.col("docid") >= F.col("first_docid"))
                & (F.col("docid") <= F.col("last_docid")),
            )
            .select("docid", "segment_id")
        )
        out.persist()
        try:
            n = out.count()
            if n:
                out.write.mode("append").parquet(self.paths.tombstones)
        finally:
            out.unpersist()
        self._deleted = None
        self._has_deletes = None
        return n

    def delete_docs(self, docids: Sequence[int]) -> None:
        """Tombstone an explicit docid list (driver-side convenience)."""
        df = self.spark.createDataFrame([(int(d),) for d in docids], "docid long")
        self.delete_docs_df(df)

    def delete_by_term(self, term: str) -> int:
        """delete-by-term, fully distributed: matching docids flow from the
        postings decode straight into the tombstone write."""
        return self.delete_docs_df(decoded_postings(self, [term]).select("docid"))

    def delete_by_query(self, q) -> int:
        """IndexWriter.deleteDocuments(Query...) analog
        (index/IndexWriter.java deleteDocuments): every doc matching the
        normalized boolean query is tombstoned; the match set flows from
        the exhaustive evaluator straight into the distributed tombstone
        write (scoring skipped — k=None, matches only)."""
        m = search_exhaustive(self, q, k=None).select("docid")
        return self.delete_docs_df(m)

    @classmethod
    def open(cls, spark: SparkSession, index_dir: str) -> "Index":
        return cls(spark, IndexPaths(index_dir))

    @property
    def merged(self) -> DataFrame:
        return self.spark.read.parquet(self._merged_dir)

    def _snap_seg(self, df: DataFrame) -> DataFrame:
        return (df.filter(F.col("segment_id") <= self._snap_max_sid)
                if self._snap_max_sid is not None else df)

    def _snap_doc(self, df: DataFrame) -> DataFrame:
        return (df.filter(F.col("docid") <= self._snap_max_docid)
                if self._snap_max_docid is not None else df)

    @property
    def seg_postings(self) -> DataFrame:
        return self._snap_seg(self.spark.read.parquet(self.paths.postings))

    # skip/impact metadata every per-segment scorer needs; block streams
    # are requested explicitly so the positions/offsets payloads never
    # ship through the segment shuffle unless the operator decodes them
    # (project before the exchange — on a positions+offsets index the
    # unused streams are most of the row's bytes)
    _SCORE_COLS = (
        "term", "segment_id", "df", "first_docid", "last_docid",
        "max_tf", "min_doclen", "block_first", "block_last",
        "block_maxtf", "block_mindl", "block_imp",
    )

    def postings_for(self, terms=None, streams=("block_data",)) -> DataFrame:
        """Scoring-projected postings rows: skip/impact metadata plus only
        the requested block streams, filtered to ``terms`` when given."""
        ps = self.seg_postings
        cols = [c for c in self._SCORE_COLS if c in ps.columns]
        cols += [s for s in streams if s in ps.columns and s not in cols]
        if terms is not None:
            ps = ps.filter(F.col("term").isin(list(terms)))
        return ps.select(*cols)

    @property
    def term_stats(self) -> DataFrame:
        return self.spark.read.parquet(self._term_stats_dir)

    @property
    def docs(self) -> DataFrame:
        return self._snap_doc(self.spark.read.parquet(self.paths.docs))

    @property
    def norms(self) -> DataFrame:
        return self._snap_doc(self.spark.read.parquet(self.paths.norms))

    @property
    def term_vectors(self) -> DataFrame:
        """Per-doc term vectors (TermVectorsFormat analog): docid-major
        (docid, term, tf[, positions]) rows; requires a
        term_vectors=True build."""
        if not self.has_term_vectors:
            raise ValueError(
                "index has no term vectors (IndexConfig(term_vectors=True))"
            )
        return self._snap_doc(self.spark.read.parquet(self.paths.tvec))

    def term_vector(self, docid: int) -> DataFrame:
        """One doc's term vector — the docid filter prunes parquet row
        groups (rows are docid-sorted per segment shard)."""
        return self.term_vectors.filter(F.col("docid") == int(docid))

    def term_stats_for(self, terms: Sequence[str]) -> Dict[str, Tuple[int, int]]:
        """Driver-side lookup of (df, ttf) for a few query terms
        (TermStates.build analog — global stats before scoring).

        Reads the term_stats parquet directly with a pushed-down filter
        (row-group pruning on the term-sorted files) instead of launching a
        Spark job — this is the FST term-dictionary *seek*, not a scan.
        Results are memoized per Index instance."""
        requested = list(terms)
        terms = [t for t in requested if t not in self._stats_cache]
        if terms:
            try:
                import pyarrow.parquet as pq

                from ..index import fsio

                files = fsio.list_files(
                    self.paths.fs, self.paths.fs_path(self._term_stats_dir), suffix=".parquet"
                )
                tbl = pq.ParquetDataset(
                    files, filesystem=self.paths.fs, filters=[("term", "in", list(terms))]
                ).read()
                found = dict(
                    zip(
                        tbl["term"].to_pylist(),
                        zip(tbl["df"].to_pylist(), tbl["ttf"].to_pylist()),
                    )
                )
            except Exception:  # fall back to a Spark job
                rows = self.term_stats.filter(F.col("term").isin(list(terms))).collect()
                found = {r["term"]: (r["df"], r["ttf"]) for r in rows}
            for t in terms:
                self._stats_cache[t] = found.get(t)
        return {t: self._stats_cache[t] for t in requested if self._stats_cache.get(t)}

    def expand_terms_df(
        self,
        prefix: Optional[str] = None,
        regex: Optional[str] = None,
        fuzzy: Optional[Tuple[str, int]] = None,
        transpositions: bool = True,
        lucene_regexp: Optional[str] = None,
    ) -> DataFrame:
        """Term-dictionary scan as a DISTRIBUTED DataFrame (term, df, ttf) —
        the MultiTermQuery rewrite seam (search/ScoringRewrite.java) without
        driver materialization: counting paths feed this straight into
        ``decoded_postings``'s broadcast-join form, so a broad prefix whose
        vocabulary is millions of terms never passes through driver memory
        (VERDICT r3 wrong#2). Fuzzy matches Lucene's default Damerau
        semantics — transpositions cost one edit (FuzzyQuery.java:57,
        LevenshteinAutomata.java:31); ``transpositions=False`` selects the
        classic distance. Prefix/regex filters are plain Catalyst
        predicates (prefix prunes row groups on the term-sorted files)."""
        ts = self.term_stats
        if prefix is not None:
            ts = ts.filter(F.col("term").startswith(prefix))
        if lucene_regexp is not None:
            # RegexpQuery syntax (util/automaton/RegExp.java:31): translated
            # to an ANCHORED Java regex — anchoring, @/#/"..."/<n-m>
            # handled; automaton-only ~/& rejected (functions/regexp.py)
            from ..functions.regexp import lucene_regexp_to_java

            ts = ts.filter(F.col("term").rlike(lucene_regexp_to_java(lucene_regexp)))
        if regex is not None:
            ts = ts.filter(F.col("term").rlike(regex))
        if fuzzy is not None:
            from ..functions.fuzzy import damerau_predicate

            term, dist = fuzzy
            if transpositions:
                ts = ts.filter(damerau_predicate(F.col("term"), term, int(dist)))
            else:
                ts = ts.filter(F.levenshtein(F.col("term"), F.lit(term)) <= dist)
        return ts

    def expand_terms(
        self,
        prefix: Optional[str] = None,
        regex: Optional[str] = None,
        fuzzy: Optional[Tuple[str, int]] = None,
        max_terms: Optional[int] = None,
        transpositions: bool = True,
        lucene_regexp: Optional[str] = None,
    ) -> List[str]:
        """Driver-side term enumeration for SCORING rewrites
        (TopTermsRewrite.java keeps the best ``max_terms``, lowest-df
        first) — always pass a cap on a query path; the uncapped form is
        for tests/diagnostics. Counting paths must use ``expand_terms_df``
        instead (no driver materialization)."""
        ts = self.expand_terms_df(prefix, regex, fuzzy, transpositions, lucene_regexp)
        if max_terms is None:
            rows = ts.select("term").collect()
            return sorted(r["term"] for r in rows)
        # TopTermsRewrite keeps the highest-scoring (lowest-df) terms first
        rows = ts.orderBy(F.col("df").asc(), F.col("term").asc()).limit(max_terms).collect()
        return [r["term"] for r in rows]

    def multi_term_doc_count(self, terms_df: DataFrame) -> int:
        """Exact doc count of the union of the given terms' postings
        (MultiTermQueryConstantScoreWrapper count) — terms stay a
        DataFrame end-to-end: broadcast-joined against the postings,
        decoded, distinct-counted; nothing terms-shaped reaches the
        driver."""
        return (
            decoded_postings(self, terms_df.select("term"))
            .select("docid")
            .distinct()
            .count()
        )


def _weights_for(index: Index, q: NormalizedQuery, boost: float, dtype) -> Dict[str, float]:
    qtf = q.scoring_terms
    stats = index.term_stats_for(list(qtf))
    return term_weights(qtf, {t: s[0] for t, s in stats.items()},
                        index.field_stats.doc_count, boost, dtype)


# ---------------------------------------------------------------------------
# Decoded-postings DataFrame (shared by exhaustive path / counts / facets)
# ---------------------------------------------------------------------------

def _live_mask(ids: np.ndarray, deleted: Optional[np.ndarray]) -> Optional[np.ndarray]:
    """Boolean mask selecting ids NOT in the sorted ``deleted`` array;
    None when everything is live (liveDocs bitset analog)."""
    if deleted is None or len(deleted) == 0 or len(ids) == 0:
        return None
    pos = np.searchsorted(deleted, ids).clip(max=len(deleted) - 1)
    return deleted[pos] != ids


def _select_topk(ids: np.ndarray, scores, k: Optional[int]):
    """Exact (score desc, docid asc) top-k in O(m): Lucene's collector
    tie-break (TopScoreDocCollector docid-asc on equal score) — a plain
    argpartition picks an ARBITRARY subset of docs tied at the k-th score,
    which diverges from the exhaustive path / oracle on tie-heavy corpora.
    Returns (ids, scores_float64) sorted (score desc, docid asc)."""
    f64 = scores.astype(np.float64)
    kk = len(ids) if k is None else min(k, len(ids))
    if kk < len(ids):
        v = -np.partition(-f64, kk - 1)[kk - 1]  # k-th best score value
        greater = np.flatnonzero(f64 > v)
        need = kk - len(greater)
        ties = np.flatnonzero(f64 == v)
        if need < len(ties):  # smallest docids among the tied tail
            ties = ties[np.argpartition(ids[ties], need - 1)[:need]] if need else ties[:0]
        part = np.concatenate([greater, ties])
    else:
        part = np.arange(len(ids))
    sel_ids, sel_sc = ids[part], f64[part]
    ordr = np.lexsort((sel_ids, -sel_sc))
    return sel_ids[ordr], sel_sc[ordr]


def _tomb_arr(pdf: Optional[pd.DataFrame]) -> Optional[np.ndarray]:
    """Cogrouped tombstone rows -> sorted per-segment delete array."""
    if pdf is None or len(pdf) == 0:
        return None
    return np.unique(pdf["docid"].to_numpy(dtype=np.int64))


def apply_per_segment(index: Index, rows: DataFrame, fn, schema: str) -> DataFrame:
    """groupBy(segment_id).applyInPandas with the segment's OWN tombstones
    cogrouped in when deletes exist — the per-segment liveDocs shape
    (PendingDeletes.java:31): every task sees only its segment's delete set,
    nothing is materialized on the driver or captured in closures.
    ``fn(key, postings_pdf, deleted_or_None) -> pdf``."""
    if index.has_deletes:
        return (
            rows.groupBy("segment_id")
            .cogroup(index.tombstones.groupBy("segment_id"))
            .applyInPandas(lambda key, pdf, tomb: fn(key, pdf, _tomb_arr(tomb)), schema)
        )
    return rows.groupBy("segment_id").applyInPandas(
        lambda key, pdf: fn(key, pdf, None), schema
    )


def decoded_postings(
    index: Index, terms: Sequence[str], use_segments: bool = False,
    apply_deletes: bool = True,
) -> DataFrame:
    """(term, docid, tf, doclen) LIVE rows for the given terms, decoded from
    block binaries in mapInPandas (Arrow batches, numpy decode); tombstoned
    docs are removed by a distributed anti-join against the tombstone
    parquet (no driver-side delete set). ``apply_deletes=False`` yields the
    raw rows (query-cache entries store raw sets and apply live-docs at
    read). ``terms`` may be a list OR a single-column DataFrame of terms —
    the DataFrame form broadcast-joins, so multi-term expansions (term
    ranges) never materialize the term list on the driver; ``terms=None``
    decodes EVERY term (full-scan consumers like check_index — no broadcast
    of the whole vocabulary)."""
    src = index.seg_postings if use_segments else index.merged
    if terms is None:
        rows = src.select("term", "block_data")
    elif isinstance(terms, DataFrame):
        rows = src.join(
            F.broadcast(terms.select(F.col(terms.columns[0]).alias("term"))), "term"
        ).select("term", "block_data")
    else:
        rows = src.filter(F.col("term").isin(list(terms))).select(
            "term", "block_data"
        )

    def decode_map(batches: Iterable[pd.DataFrame]) -> Iterable[pd.DataFrame]:
        for pdf in batches:
            outs = []
            for term, blocks in zip(pdf["term"], pdf["block_data"]):
                if blocks is None or len(blocks) == 0:
                    continue
                ids, tfs, dls = zip(*(decode_block(bytes(b)) for b in blocks))
                ids = np.concatenate(ids)
                tfs = np.concatenate(tfs)
                dls = np.concatenate(dls)
                outs.append(
                    pd.DataFrame(
                        {
                            "term": np.full(len(ids), term, dtype=object),
                            "docid": ids,
                            "tf": tfs.astype(np.int32),
                            "doclen": dls.astype(np.int32),
                        }
                    )
                )
            if outs:
                yield pd.concat(outs, ignore_index=True)

    out = rows.mapInPandas(decode_map, DECODED_SCHEMA)
    if apply_deletes and index.has_deletes:
        out = out.join(index.tombstones.select("docid"), "docid", "left_anti")
    return out


def search_exhaustive(
    index: Index,
    q: NormalizedQuery,
    k: Optional[int] = 10,
    boost: float = 1.0,
    quantize: bool = False,
    dtype=np.float64,
    similarity: Optional[str] = None,
) -> DataFrame:
    """Exhaustive scoring in Spark SQL (float64) — the always-correct path.

    AND = posting intersection via a count-of-required-matches filter;
    OR = union + groupBy(docid).sum(score); NOT = left_anti join
    (SURVEY.md §2.5 BooleanQuery row). With quantize=True the doclen goes
    through the byte4 code (applied in the decode UDF upstream).
    ``similarity`` swaps the per-clause score expression + weights through
    the Similarity seam (similarities.py); the whole plan stays JVM-side —
    the alternative formulas are plain Spark SQL expressions too.
    """
    from .similarities import bind_similarity

    spark = index.spark
    if q.is_match_none:
        return spark.createDataFrame([], "docid long, score double")
    sim = bind_similarity(
        similarity, q.scoring_terms, index.term_stats_for(list(q.scoring_terms)),
        index.field_stats, boost, quantize, dtype,
    )
    weights = sim.weights if sim is not None else _weights_for(index, q, boost, dtype)
    req = [t for t, _ in q.required]
    live_terms = [t for t in q.scoring_terms if t in weights]
    if not live_terms or any(t not in weights for t in req):
        return spark.createDataFrame([], "docid long, score double")

    dec = decoded_postings(index, live_terms)
    if quantize:
        from ..functions.smallfloat import byte4_to_int, int_to_byte4

        @F.pandas_udf("int")
        def quantize_len(s: pd.Series) -> pd.Series:
            return pd.Series(byte4_to_int(int_to_byte4(s.to_numpy(dtype=np.int64))))

        dec = dec.withColumn("doclen", quantize_len("doclen"))

    # oc = SHOULD clause instances the term credits toward msm (its SHOULD
    # qtf; 0 for pure-MUST terms) — matching the un-merged clause count
    opt_counts = dict(q.optional)
    if q.min_should_match > sum(opt_counts.get(t, 0) for t in weights):
        return spark.createDataFrame([], "docid long, score double")
    wrows = sim.wdf_rows() if sim is not None else [
        (t, float(w), 0.0) for t, w in weights.items()
    ]
    wdf = F.broadcast(
        spark.createDataFrame(
            [(t, w, pc, int(opt_counts.get(t, 0))) for t, w, pc in wrows],
            "term string, w double, pc double, oc int",
        )
    )
    avgdl = float(index.field_stats.avgdl())
    if sim is not None:
        score = sim.score_col(F.col("tf"), F.col("doclen"))
    else:
        k1, b = 1.2, 0.75
        ninv = 1.0 / (F.lit(k1) * (F.lit(1.0 - b) + F.lit(b) * F.col("doclen") / F.lit(avgdl)))
        score = F.col("w") - F.col("w") / (F.lit(1.0) + F.col("tf").cast("double") * ninv)
    scored = dec.join(wdf, "term").withColumn("s", score)

    agg = scored.groupBy("docid").agg(
        F.sum("s").alias("score"),
        F.count(F.when(F.col("term").isin(req), True)).alias("n_req") if req else F.lit(0).alias("n_req"),
        F.sum("oc").alias("n_should"),
    )
    if req:
        agg = agg.filter(F.col("n_req") == len(req))
    if q.min_should_match > 0:
        # minimumNumberShouldMatch (BooleanQuery.java:125): a doc needs at
        # least msm matched SHOULD clause instances on top of the MUSTs
        agg = agg.filter(F.col("n_should") >= q.min_should_match)
    out = agg.select("docid", "score")
    if q.excluded:
        excl = decoded_postings(index, list(q.excluded)).select("docid").distinct()
        out = out.join(excl, "docid", "left_anti")
    out = out.orderBy(F.col("score").desc(), F.col("docid").asc())
    return out.limit(k) if k else out


# ---------------------------------------------------------------------------
# Per-segment vectorized block-max top-k (the WAND/MAXSCORE path)
# ---------------------------------------------------------------------------

def _decode_rows(row, sel: Optional[np.ndarray], counters: List[int]):
    """Decode a term's blocks, optionally only blocks intersecting the
    sorted candidate docids `sel` (advanceShallow/block-skip analog,
    ImpactsDISI.java:67-80)."""
    bf = np.asarray(row["block_first"], dtype=np.int64)
    bl = np.asarray(row["block_last"], dtype=np.int64)
    data = row["block_data"]
    counters[0] += len(bf)
    if sel is not None:
        lo = np.searchsorted(sel, bf, "left")
        hi = np.searchsorted(sel, bl, "right")
        keep = np.flatnonzero(hi > lo)
    else:
        keep = np.arange(len(bf))
    counters[1] += len(keep)
    if len(keep) == 0:
        return (np.empty(0, np.int64), np.empty(0, np.int64), np.empty(0, np.int64))
    parts = [decode_block(bytes(data[i])) for i in keep]
    return tuple(np.concatenate(x) for x in zip(*parts))


def make_topk_fn(
    weights: Dict[str, float],
    required: Sequence[str],
    excluded: Sequence[str],
    k: int,
    avgdl: float,
    quantize: bool,
    dtype,
    cursor: Optional[Tuple[float, int]] = None,
    opt_counts: Optional[Dict[str, int]] = None,
    msm: int = 0,
    theta_seed: float = 0.0,
    sim=None,
):
    """Build the per-segment applyInPandas function.

    Pure OR      -> MAXSCORE phases: process terms by descending max-score;
                    once the remaining terms' summed max-scores fall below
                    the running k-th score, restrict decoding to blocks
                    holding still-competitive candidates
                    (MaxScoreBulkScorer.java:26 essential/non-essential split).
    With MUST    -> block-max conjunction: lead with the rarest required
                    term, leapfrog the rest at block granularity
                    (ConjunctionDISI.java:166-206, BlockMaxConjunctionBulkScorer.java:36).
    MUST_NOT     -> decoded-docid set subtraction (ReqExclScorer.java:26).
    Final scores are re-summed in sorted-term order (canonical float32
    order) for cross-path exactness; pruning uses PRUNE_SCALE slack.

    ``msm`` > 0 adds the minimumNumberShouldMatch constraint — the batched
    analog of freq-counting WAND (WANDScorer.java:55 scorerMode FREQS,
    BooleanScorerSupplier.java:297-306): per-doc matched-clause counts
    accumulate alongside scores (``opt_counts`` maps each SHOULD term to
    the clause instances it credits), theta only seeds from docs already
    GUARANTEED to qualify (counts only grow, so qualification is
    monotone), candidate retention additionally keeps any doc whose count
    could still reach msm, and blocks are skipped for NEW docs once the
    remaining terms' total clause credit cannot reach msm.

    ``theta_seed`` > 0 pre-loads every segment's pruning threshold with a
    lower bound of the GLOBAL k-th score (MaxScoreAccumulator analog,
    search/MaxScoreAccumulator.java:23 — concurrent leaf collectors share
    the max over their local minimum competitive scores; here the driver
    seeds it once from a cheap partial-query pass). Sound because any true
    lower bound of the final k-th full score may prune.
    """
    if sim is None:
        from .similarities import BM25Bound

        sim = BM25Bound(weights, avgdl, quantize, dtype)
    req = sorted(set(required))
    excl = sorted(set(excluded))
    scale = PRUNE_SCALE[dtype]
    oc = {t: int(c) for t, c in (opt_counts or {}).items() if c > 0}
    msm = int(msm)
    # resolved driver-side at plan time and captured in the closure, so the
    # worker-side run() never consults module state
    chunk_blocks = int(MAXSCORE_CHUNK)

    _Z = np.empty(0, np.int64)

    def run(pdf: pd.DataFrame, deleted: Optional[np.ndarray]):
        """Core per-segment scorer -> (docids, scores, counters);
        ``deleted`` is this segment's cogrouped tombstone array."""
        counters = [0, 0]  # blocks_total, blocks_decoded
        rows = {}
        for r in pdf.to_dict("records"):  # dicts, not iterrows Series
            rows.setdefault(r["term"], []).append(r)
        # a term may arrive as several (term,salt) rows: keep in docid order
        for t in rows:
            rows[t].sort(key=lambda r: r["first_docid"])

        scoring = [t for t in sorted(weights) if t in rows]
        if not scoring or any(t not in rows for t in req):
            return _Z, _Z.astype(np.float64), counters

        if excl:
            # MUST_NOT as an up-front ban mask merged into liveDocs
            # (ReqExclScorer.java:26): excluded docs must never score, enter
            # `seen`, or RAISE THETA — a doc destined for exclusion holding
            # a top-k slot would inflate the pruning threshold above the
            # true k-th score and silently drop real hits (an end-of-run
            # subtraction is too late for the threshold)
            ex_parts = [
                _decode_rows(r, None, counters)[0]
                for t in excl if t in rows for r in rows[t]
            ]
            if ex_parts:
                banned = np.unique(np.concatenate(ex_parts))
                deleted = (
                    banned if deleted is None else np.union1d(deleted, banned)
                )

        base = min(int(r["first_docid"]) for t in scoring for r in rows[t])
        hi = max(int(r["last_docid"]) for t in scoring for r in rows[t])
        n = hi - base + 1
        if n > 500_000_000:
            # dense accumulator assumes segment-local docid ranges (the
            # builder guarantees them; a sparse user docid_col would not)
            raise ValueError(
                f"segment docid range {n} too sparse for the dense accumulator; "
                "use the engine's docid assignment or densify docid_col"
            )

        def decode_term(t, sel=None):
            if sel is not None and len(sel) == 0:
                z = np.empty(0, np.int64)
                return z, z, z
            parts = [_decode_rows(r, sel, counters) for r in rows[t]]
            ids = np.concatenate([p[0] for p in parts])
            tfs = np.concatenate([p[1] for p in parts])
            dls = np.concatenate([p[2] for p in parts])
            if sel is not None and len(ids):
                m = sel[np.searchsorted(sel, ids).clip(max=len(sel) - 1)] == ids
                ids, tfs, dls = ids[m], tfs[m], dls[m]
            live = _live_mask(ids, deleted)  # tombstoned docs never score
            if live is not None:
                ids, tfs, dls = ids[live], tfs[live], dls[live]
            return ids, tfs, dls

        contrib = {t: np.zeros(n, dtype=dtype) for t in scoring}

        def block_ubs(t, r):
            """Per-block score upper bounds for one (term, salt) row: max
            over the block's competitive (tf, doclen) impact pairs
            (CompetitiveImpactAccumulator.java:26 — tight even for
            unbounded-tf shapes like Classic's sqrt(tf)); corner
            (block_maxtf, block_mindl) fallback for pre-v6 indexes."""
            imp = r.get("block_imp")
            if imp is None or isinstance(imp, float):  # absent column / null row
                return sim.score(
                    t,
                    np.asarray(r["block_maxtf"], dtype=np.int64),
                    np.asarray(r["block_mindl"], dtype=np.int64),
                ).astype(np.float64)
            lens = np.fromiter((len(x) for x in imp), np.int64, len(imp))
            flat = (
                np.concatenate([np.asarray(x, np.int64) for x in imp])
                if len(imp) else np.empty(0, np.int64)
            )
            s = sim.score(t, flat[0::2], flat[1::2]).astype(np.float64)
            starts = np.concatenate(([0], np.cumsum(lens // 2)[:-1]))
            return np.maximum.reduceat(s, starts) if len(s) else s

        _ub_cache: Dict[str, list] = {}

        def term_ubs(t):
            if t not in _ub_cache:
                _ub_cache[t] = [block_ubs(t, r) for r in rows[t]]
            return _ub_cache[t]

        def umax(t):
            # max over per-block bounds == the term's tightest whole-list
            # bound (MaxScoreCache.java:74 computes the same from impacts)
            return max(
                (float(u.max()) for u in term_ubs(t) if len(u)),
                default=sim.bound(
                    t,
                    max(int(r["max_tf"]) for r in rows[t]),
                    min(int(r["min_doclen"]) for r in rows[t]),
                ),
            )

        if req:
            # --- conjunction: lead with rarest required term
            req_order = sorted(req, key=lambda t: sum(int(r["df"]) for r in rows[t]))
            lead = req_order[0]
            ids, tfs, dls = decode_term(lead)
            cand = ids
            contrib[lead][ids - base] = sim.score(lead, tfs, dls)
            for t in req_order[1:]:
                ids, tfs, dls = decode_term(t, sel=cand)
                contrib[t][ids - base] = sim.score(t, tfs, dls)
                cand = np.intersect1d(cand, ids, assume_unique=True)
                if len(cand) == 0:
                    return _Z, _Z.astype(np.float64), counters
            opt = [t for t in scoring if t not in req]
            nm = np.zeros(len(cand), np.int64) if msm > 0 else None
            for t in opt:
                ids, tfs, dls = decode_term(t, sel=cand)  # ReqOptSumScorer probe
                contrib[t][ids - base] = sim.score(t, tfs, dls)
                if nm is not None and len(ids):
                    nm[np.searchsorted(cand, ids)] += oc.get(t, 0)
            # minShouldMatch on top of the conjunction: keep candidates
            # with >= msm matched SHOULD clause instances
            # (BooleanScorerSupplier.java:297-306 req+minShouldMatch path)
            matched = cand if nm is None else cand[nm >= msm]
        else:
            # --- pure disjunction: block-max MAXSCORE over descending
            # max-score terms, with PER-BLOCK upper bounds and progressive
            # theta refresh (MaxScoreBulkScorer.java:26 scores windows and
            # re-partitions essential terms as the threshold grows; here the
            # window is a CHUNK of blocks and the per-block bound comes from
            # the skip data's block_maxtf/block_mindl impacts,
            # MaxScoreCache.java:74-130). Within a term, chunks are decoded
            # in DESCENDING upper-bound order: the first chunk seeds theta
            # near its final value, so low-bound blocks skip even when the
            # term itself is "essential" (batch evaluation has no docid-order
            # constraint — the dense accumulator is order-free).
            order = sorted(scoring, key=lambda t: -umax(t))
            umaxes = np.array([umax(t) for t in order], dtype=np.float64)
            suffix = np.concatenate((np.cumsum(umaxes[::-1])[::-1], [0.0]))
            # remaining SHOULD-clause credit from term i onward (freq-counting
            # WAND upper bound, WANDScorer.java:55): cnt_suffix[i] bounds how
            # much a doc's matched-clause count can still grow
            counts = np.array([oc.get(t, 0) for t in order], dtype=np.int64)
            cnt_suffix = np.concatenate((np.cumsum(counts[::-1])[::-1], [0]))
            nmatch = np.zeros(n, dtype=np.int64) if msm > 0 else None
            acc = np.zeros(n, dtype=np.float64)
            seen = np.zeros(n, dtype=bool)
            theta = float(theta_seed) if theta_seed > 0 else -np.inf
            # cursor mode (pruned searchAfter): scores only grow as terms
            # accumulate, so a candidate whose partial sum already exceeds
            # the cursor score can never re-enter the page and is dropped
            # from decoding; theta may only be raised from candidates
            # GUARANTEED to stay at/below the cursor (acc + max-remaining
            # <= after_score), keeping block skipping sound. Mid-term theta
            # refresh is disabled in cursor mode: the "guaranteed" bound
            # needs the full remaining potential, unknown mid-list.
            after_bound = float(cursor[0]) if cursor is not None else None
            slack = 2.0 - scale  # tiny upward slack for float re-association
            CHUNK = chunk_blocks  # blocks per theta-refresh window

            def kth(vals: np.ndarray) -> float:
                return float(np.partition(vals, len(vals) - k)[len(vals) - k])

            def ids_seen() -> np.ndarray:
                # candidate fallback before theta is live: every seen doc
                return np.flatnonzero(seen) + base

            for i, t in enumerate(order):
                rest = float(suffix[i + 1])
                # competitive partial-sum candidates: a doc outside this set
                # was proven unable to reach theta even with every remaining
                # term at max score — permanently non-competitive (theta only
                # grows). Recomputed LAZILY whenever theta has grown since the
                # set was built (a set built at a smaller theta is a sound
                # superset, so reuse between refreshes is safe). The lazy
                # refresh is what keeps mid-term theta transitions sound: if
                # theta first turns positive inside this term's chunk loop,
                # docs seen by EARLIER terms that sit in this term's low-bound
                # blocks must still be protected by the candidate test — an
                # ub-only skip would silently drop their contribution from
                # this term and corrupt their final score.
                sel: Optional[np.ndarray] = None
                sel_theta = -np.inf  # theta at which `sel` was computed

                def refresh_sel():
                    # None -> compute as soon as theta is live (soundness);
                    # afterwards re-tighten only on meaningful theta growth
                    # (the O(n) scan amortizes across chunks; stale = sound).
                    nonlocal sel, sel_theta
                    if theta <= 0 or (sel is not None and theta <= sel_theta * 1.05):
                        return
                    mask = seen & (acc + suffix[i] >= theta * scale)
                    if nmatch is not None:
                        # count-hopeless docs can be dropped outright: the
                        # remaining clause credit cannot lift them to msm
                        mask &= nmatch + cnt_suffix[i] >= msm
                    if after_bound is not None:
                        mask &= acc <= after_bound * slack
                    sel = np.flatnonzero(mask) + base
                    sel_theta = theta

                refresh_sel()
                for r, ub in zip(rows[t], term_ubs(t)):
                    bf = np.asarray(r["block_first"], dtype=np.int64)
                    bl = np.asarray(r["block_last"], dtype=np.int64)
                    data = r["block_data"]
                    nb = len(bf)
                    counters[0] += nb
                    # per-block upper bounds from the competitive impact
                    # pairs (block_ubs) — sound for every registered
                    # similarity (monotone)
                    border = np.argsort(-ub, kind="stable")
                    # once the remaining clause credit (this term included)
                    # cannot reach msm, blocks only matter for docs already
                    # in the candidate set — NEW docs cannot qualify
                    new_docs_ok = nmatch is None or cnt_suffix[i] >= msm
                    for j in range(0, nb, CHUNK):
                        cidx = border[j : j + CHUNK]
                        if theta > 0 or not new_docs_ok:
                            refresh_sel()
                            if new_docs_ok and theta > 0:
                                keep = ub[cidx] + rest >= theta * scale
                            elif new_docs_ok:
                                keep = np.ones(len(cidx), dtype=bool)
                            else:
                                keep = np.zeros(len(cidx), dtype=bool)
                            if sel is not None and len(sel):
                                lo = np.searchsorted(sel, bf[cidx], "left")
                                hi = np.searchsorted(sel, bl[cidx], "right")
                                has = hi > lo
                                if (
                                    theta > 0 and nmatch is None
                                    and after_bound is None
                                ):
                                    # per-block candidate potential
                                    # (BlockMaxMaxscore refinement,
                                    # MaxScoreBulkScorer.java:26): replace
                                    # the term's GLOBAL max with this
                                    # block's own ub — a candidate inside
                                    # whose acc + block ub + remaining max
                                    # still misses theta proves its final
                                    # total < theta, so the block can skip
                                    # even though it holds candidates.
                                    # (msm/cursor modes keep the coarse
                                    # test: counts/guarantees need the
                                    # candidate decode to stay complete.)
                                    for z in np.flatnonzero(has):
                                        cmax = float(
                                            acc[sel[lo[z]:hi[z]] - base].max()
                                        )
                                        if cmax + ub[cidx[z]] + rest < theta * scale:
                                            has[z] = False
                                keep |= has
                            elif sel is None and not new_docs_ok:
                                # theta not live yet: every seen doc is
                                # still a candidate
                                lo = np.searchsorted(ids_seen(), bf[cidx], "left")
                                hi = np.searchsorted(ids_seen(), bl[cidx], "right")
                                keep |= hi > lo
                            cidx = cidx[keep]
                        counters[1] += len(cidx)
                        if len(cidx) == 0:
                            continue
                        parts = [decode_block(bytes(data[x])) for x in cidx]
                        ids = np.concatenate([p[0] for p in parts])
                        tfs = np.concatenate([p[1] for p in parts])
                        dls = np.concatenate([p[2] for p in parts])
                        live = _live_mask(ids, deleted)
                        if live is not None:
                            ids, tfs, dls = ids[live], tfs[live], dls[live]
                        if len(ids) == 0:
                            continue
                        s = sim.score(t, tfs, dls)
                        contrib[t][ids - base] = s
                        acc[ids - base] += s.astype(np.float64)
                        seen[ids - base] = True
                        if nmatch is not None:
                            nmatch[ids - base] += counts[i]
                        if after_bound is None:
                            # theta may only rise from docs GUARANTEED to
                            # satisfy msm (counts are monotone, so already-
                            # qualified docs stay qualified)
                            qual = seen if nmatch is None else seen & (nmatch >= msm)
                            if int(qual.sum()) >= k:
                                theta = max(theta, kth(acc[qual]))
                if after_bound is not None:
                    # only docs GUARANTEED on the page may raise theta: a
                    # doc whose bound TIES the cursor score lands on the
                    # page only when its docid breaks the tie (ADVICE r6:
                    # plain <= counted the page-1 boundary tie group and
                    # could prune genuine later-page hits)
                    tot = acc + rest
                    guaranteed = seen & (
                        (tot < after_bound)
                        | ((tot == after_bound)
                           & (np.arange(n, dtype=np.int64) + base > int(cursor[1])))
                    )
                    if nmatch is not None:
                        guaranteed &= nmatch >= msm
                    vals = acc[guaranteed]
                    if len(vals) >= k:
                        theta = max(theta, kth(vals))
            if nmatch is None:
                matched = np.flatnonzero(seen) + base
            else:
                matched = np.flatnonzero(seen & (nmatch >= msm)) + base

        if len(matched) == 0:
            return _Z, _Z.astype(np.float64), counters

        # canonical final sum: sorted-term order, engine dtype
        final = np.zeros(len(matched), dtype=dtype)
        idx = matched - base
        for t in sorted(scoring):
            final = final + contrib[t][idx]
        if cursor is not None:
            # keep hits strictly after the (score desc, docid asc) cursor
            fin64 = final.astype(np.float64)
            a_s, a_d = float(cursor[0]), int(cursor[1])
            ok = (fin64 < a_s) | ((fin64 == a_s) & (matched > a_d))
            matched, final = matched[ok], final[ok]
            if len(matched) == 0:
                return _Z, _Z.astype(np.float64), counters
        out_ids, out_sc = _select_topk(matched, final, k)
        return out_ids, out_sc, counters

    def topk_fn(key, pdf: pd.DataFrame, deleted: Optional[np.ndarray]) -> pd.DataFrame:
        ids, scores, counters = run(pdf, deleted)
        return pd.DataFrame(
            {
                "docid": ids,
                "score": scores,
                "blocks_total": np.full(len(ids), counters[0], dtype=np.int64),
                "blocks_decoded": np.full(len(ids), counters[1], dtype=np.int64),
            }
        )

    def metrics_fn(key, pdf: pd.DataFrame, deleted: Optional[np.ndarray]) -> pd.DataFrame:
        # exact per-segment counters, emitted even when the segment
        # contributes no hits (fixes the sum({set}) collapse, ADVICE r1)
        _, _, counters = run(pdf, deleted)
        return pd.DataFrame(
            {
                "segment_id": np.array([int(key[0])], dtype=np.int64),
                "blocks_total": np.array([counters[0]], dtype=np.int64),
                "blocks_decoded": np.array([counters[1]], dtype=np.int64),
            }
        )

    topk_fn.metrics_fn = metrics_fn
    return topk_fn


def search_topk(
    index: Index,
    q: NormalizedQuery,
    k: int = 10,
    boost: float = 1.0,
    quantize: Optional[bool] = None,
    dtype=None,
    with_metrics: bool = False,
    theta_seed: float = 0.0,
    similarity: Optional[str] = None,
) -> DataFrame:
    """Top-k via per-segment block-max pruning + global ordered merge.

    ``quantize``/``dtype`` default to None = AUTO: float32 quantized (the
    engine default) unless the query is ``tree_origin`` — a flat form the
    rewriter produced from a nested tree — which keeps the tree path's
    float64/unquantized scoring so rewriting never changes the scores of
    the same query string (ADVICE r5). Explicit arguments always win.

    ``theta_seed``: pre-seed every segment's pruning threshold with a global
    lower bound of the k-th score (MaxScoreAccumulator.java:23 analog).
    The default 0.0 means AUTO: a free stats-only bound is derived on the
    driver when sound (``auto_seed_theta``; pure disjunctions, no deletes).
    Pass a negative value to disable seeding entirely, or an explicit
    positive bound (e.g. from the tighter one-job ``seed_theta`` pass).

    ``similarity``: one of scorer seam names ("classic", "boolean",
    "lm_dirichlet", "lm_jelinek_mercer"); None/"bm25" keeps the default.
    Every registered similarity is monotone up in tf / down in doclen, so
    the block-max pruning stays sound — bounds route through the same
    scorer (similarities.BoundSimilarity.bound)."""
    if quantize is None:
        quantize = not getattr(q, "tree_origin", False)
    if dtype is None:
        dtype = np.float64 if getattr(q, "tree_origin", False) else np.float32
    spark = index.spark
    empty = spark.createDataFrame([], TOPK_SCHEMA if with_metrics else "docid long, score double")
    if q.is_match_none:
        return empty
    plan = _topk_plan(index, q, boost, dtype, similarity, quantize)
    if plan is None:
        return empty
    weights, req, rows, sim = plan
    if theta_seed == 0.0:
        theta_seed = auto_seed_theta(index, q, weights, sim, k, quantize, dtype)
    fn = make_topk_fn(
        weights, req, list(q.excluded), k, float(index.field_stats.avgdl()),
        quantize, dtype, opt_counts=dict(q.optional), msm=q.min_should_match,
        theta_seed=theta_seed, sim=sim,
    )
    per_seg = apply_per_segment(index, rows, fn, TOPK_SCHEMA)
    out = per_seg.orderBy(F.col("score").desc(), F.col("docid").asc()).limit(k)
    return out if with_metrics else out.select("docid", "score")


def _topk_plan(index: Index, q: NormalizedQuery, boost: float, dtype,
               similarity: Optional[str] = None, quantize: bool = True):
    """Shared setup for the per-segment top-k paths: resolve term weights
    (through the pluggable similarity when one is named — Similarity seam,
    SURVEY.md §2.4) and the filtered postings rows; None when the query
    cannot match."""
    from .similarities import bind_similarity

    sim = bind_similarity(
        similarity, q.scoring_terms, index.term_stats_for(list(q.scoring_terms)),
        index.field_stats, boost, quantize, dtype,
    )
    weights = sim.weights if sim is not None else _weights_for(index, q, boost, dtype)
    req = [t for t, _ in q.required]
    if not weights or any(t not in weights for t in req):
        return None
    if q.min_should_match > sum(c for t, c in q.optional if t in weights):
        return None  # terms absent from the index can never credit msm
    all_terms = sorted(set(weights) | set(q.excluded))
    rows = index.postings_for(all_terms)
    return weights, req, rows, sim


# largest posting list the auto seed will decode on the driver: bounded
# work (<= a few hundred 256-entry blocks through the parquet row-group
# seek) regardless of corpus size — the same term-dictionary-seek shape as
# term_stats_for, never data-sized
AUTO_SEED_DECODE_CAP = 100_000


def _driver_term_postings(index: Index, term: str):
    """(tfs, doclens) of one term's postings, read driver-side through the
    pyarrow row-group seek on the term-sorted segment postings files (the
    FST term-dictionary *seek* shape, not a scan; no Spark job). Returns
    (None, None) on any failure — callers fall back to stats bounds."""
    try:
        import pyarrow.parquet as pq

        from ..index import fsio

        files = fsio.list_files(
            index.paths.fs, index.paths.fs_path(index.paths.postings), suffix=".parquet"
        )
        tbl = pq.ParquetDataset(
            files, filesystem=index.paths.fs, filters=[("term", "==", term)]
        ).read(columns=["block_data"])
    except Exception:
        return None, None
    tfs, dls = [], []
    for blocks in tbl["block_data"].to_pylist():
        for b in blocks or ():
            _, tf, dl = decode_block(bytes(b))
            tfs.append(tf)
            dls.append(dl)
    if not tfs:
        return None, None
    return np.concatenate(tfs), np.concatenate(dls)


def auto_seed_theta(
    index: Index,
    q: NormalizedQuery,
    weights: Dict[str, float],
    sim,
    k: int,
    quantize: bool,
    dtype,
) -> float:
    """Driver-side (no Spark job) global lower bound of the k-th best
    score — the default-on MaxScoreAccumulator analog
    (search/MaxScoreAccumulator.java:23; Lucene's concurrent slices share a
    threshold for free, a batch engine derives one on the driver).

    Two tiers, both sound for a pure disjunction (a doc's full score only
    grows beyond any single term's partial):

    1. EXACT partials of the rarest term (df >= k, df <= decode cap): its
       postings are decoded through the parquet row-group seek and the
       k-th best actual score(tf, dl) is a lower bound of the global k-th
       best full score — the same bound the explicit ``seed_theta`` Spark
       pass computes, at term-dictionary-seek cost.
    2. Stats-only fallback: for any SHOULD term t with df(t) >= k, every
       one of its >= k matching docs scores at least W_t * shape(tf=1,
       dl=max_dl) on t alone (every registered similarity is monotone up
       in tf, down in doclen).

    Sound only when: pure disjunction (MUST/minShouldMatch restrict the
    qualifying set below df; MUST_NOT can exclude the term's docs) and no
    live tombstones (df counts deleted docs — a tombstoned doc among the
    top k would fake the bound). Returns 0.0 (no seed) otherwise."""
    if q.required or q.min_should_match > 0 or q.excluded or len(q.optional) < 2:
        return 0.0
    if index.has_deletes:
        return 0.0
    stats = index.term_stats_for([t for t, _ in q.optional])
    avgdl = float(index.field_stats.avgdl())

    def partial(t, tfs, dls):
        if sim is not None:
            return np.asarray(sim.score(t, tfs, dls), np.float64)
        return np.asarray(
            score_arrays(tfs, dls, weights[t], avgdl, quantize, dtype), np.float64
        )

    best = 0.0
    # tier 1: exact k-th partial of the rarest decodable term
    elig = sorted(
        (stats[t][0], t)
        for t, _c in q.optional
        if t in weights and t in stats and stats[t][0] >= k
    )
    if elig and elig[0][0] <= AUTO_SEED_DECODE_CAP:
        tfs, dls = _driver_term_postings(index, elig[0][1])
        if tfs is not None and len(tfs) >= k:
            s = partial(elig[0][1], tfs, dls)
            best = float(np.partition(s, len(s) - k)[len(s) - k])
    # tier 2: stats bound over every eligible term (tf=1 at the longest doc)
    max_dl = int(getattr(index.field_stats, "max_dl", 0) or 0)
    if max_dl > 0:
        one = np.array([1], np.int64)
        dl = np.array([max_dl], np.int64)
        for _df, t in elig:
            best = max(best, float(partial(t, one, dl)[0]))
    # same downward slack as the explicit seed (float re-association)
    return best * PRUNE_SCALE[dtype] if best > 0.0 else 0.0


def seed_theta(
    index: Index,
    q: NormalizedQuery,
    k: int = 10,
    boost: float = 1.0,
    quantize: bool = True,
    dtype=np.float32,
    similarity: Optional[str] = None,
) -> float:
    """Cross-segment pruning-threshold seed (MaxScoreAccumulator analog,
    search/MaxScoreAccumulator.java:23): the k-th best score of the RAREST
    scoring term alone. Every doc's full score is >= its partial score, so
    at least k docs beat this value — a sound global lower bound of the
    k-th full score, obtained from one cheap pass over the SMALLEST posting
    list. Each segment then starts pruning immediately instead of waiting
    for its local top-k to fill. Only valid for pure disjunctions without
    minShouldMatch (with MUST or msm the qualifying set is a subset of the
    rare term's postings, so its k-th partial score is NOT a lower bound);
    returns 0.0 (no seed) otherwise. ``similarity`` MUST match the main
    query's (a seed from a different scoring function is no lower bound)."""
    if q.required or q.min_should_match > 0 or not q.optional:
        return 0.0
    from .similarities import bind_similarity

    sim = bind_similarity(
        similarity, q.scoring_terms, index.term_stats_for(list(q.scoring_terms)),
        index.field_stats, boost, quantize, dtype,
    )
    weights = sim.weights if sim is not None else _weights_for(index, q, boost, dtype)
    if not weights:
        return 0.0
    stats = index.term_stats_for(list(weights))
    rarest = min(weights, key=lambda t: stats[t][0])
    qtf = dict(q.optional).get(rarest, 1)
    # r7: when the rarest list is small, decode it on the DRIVER through
    # the parquet row-group seek (same machinery as auto_seed_theta tier
    # 1) — the k-th partial is identical to the one-term Spark pass, at
    # term-dictionary-seek cost instead of a whole job. Declined on live
    # deletes (the Spark pass applies tombstones; the raw decode cannot).
    if not index.has_deletes and k <= stats[rarest][0] <= AUTO_SEED_DECODE_CAP:
        tfs, dls = _driver_term_postings(index, rarest)
        if tfs is not None and len(tfs) >= k:
            if sim is not None:
                s = np.asarray(sim.score(rarest, tfs, dls), np.float64)
            else:
                s = np.asarray(
                    score_arrays(tfs, dls, weights[rarest],
                                 float(index.field_stats.avgdl()),
                                 quantize, dtype),
                    np.float64,
                )
            kth = float(np.partition(s, len(s) - k)[len(s) - k])
            return kth * PRUNE_SCALE[dtype]
    sub = NormalizedQuery(optional=((rarest, qtf),))
    rows = search_topk(
        index, sub, k=k, boost=boost, quantize=quantize, dtype=dtype,
        similarity=similarity,
    ).collect()
    if len(rows) < k:
        return 0.0
    # tiny downward slack covers float re-association across paths
    return float(rows[-1]["score"]) * PRUNE_SCALE[dtype]


def block_skip_metrics(
    index: Index,
    q: NormalizedQuery,
    k: int = 10,
    boost: float = 1.0,
    quantize: bool = True,
    dtype=np.float32,
    theta_seed: float = 0.0,
    similarity: Optional[str] = None,
) -> dict:
    """Exact block-skip effectiveness of the top-k path: one metrics row per
    segment (no dedup-by-value collapse, no dependence on which rows survive
    the global merge), summed driver-side."""
    if q.is_match_none:
        return {"blocks_total": 0, "blocks_decoded": 0, "ratio": None}
    plan = _topk_plan(index, q, boost, dtype, similarity, quantize)
    if plan is None:
        return {"blocks_total": 0, "blocks_decoded": 0, "ratio": None}
    weights, req, rows, sim = plan
    if theta_seed == 0.0:
        # mirror search_topk's default plan so the reported ratio is what
        # a default call actually decodes
        theta_seed = auto_seed_theta(index, q, weights, sim, k, quantize, dtype)
    fn = make_topk_fn(
        weights, req, list(q.excluded), k, float(index.field_stats.avgdl()),
        quantize, dtype, opt_counts=dict(q.optional), msm=q.min_should_match,
        theta_seed=theta_seed, sim=sim,
    )
    per_seg = apply_per_segment(index, rows, fn.metrics_fn, METRICS_SCHEMA)
    row = per_seg.agg(
        F.sum("blocks_total").alias("t"), F.sum("blocks_decoded").alias("d")
    ).collect()[0]
    tot, dec = int(row["t"] or 0), int(row["d"] or 0)
    return {
        "blocks_total": tot,
        "blocks_decoded": dec,
        "ratio": (dec / tot) if tot else None,
    }


# ---------------------------------------------------------------------------
# PhraseQuery: two-phase per-segment evaluation (positions required)
# ---------------------------------------------------------------------------

def _decode_rows_pos(row, sel: Optional[np.ndarray], counters: List[int]):
    """Like _decode_rows but also decodes the positions stream of the kept
    blocks (two-phase verify: position decode only touches blocks holding
    candidates, TwoPhaseIterator.java:31)."""
    bf = np.asarray(row["block_first"], dtype=np.int64)
    bl = np.asarray(row["block_last"], dtype=np.int64)
    data, pdata = row["block_data"], row["block_pos"]
    if pdata is None or (isinstance(pdata, float) and np.isnan(pdata)):
        raise ValueError(
            "index was built without position data; cannot run PhraseQuery "
            "(rebuild with IndexConfig(index_positions=True))"
        )
    counters[0] += len(bf)
    if sel is not None:
        lo = np.searchsorted(sel, bf, "left")
        hi = np.searchsorted(sel, bl, "right")
        keep = np.flatnonzero(hi > lo)
    else:
        keep = np.arange(len(bf))
    counters[1] += len(keep)
    z = np.empty(0, np.int64)
    if len(keep) == 0:
        return z, z, z, z
    ids_l, tfs_l, dls_l, pos_l = [], [], [], []
    for i in keep:
        ids, tfs, dls = decode_block(bytes(data[i]))
        from ..functions.codec import decode_block_positions

        pos_l.append(decode_block_positions(bytes(pdata[i]), tfs))
        ids_l.append(ids)
        tfs_l.append(tfs)
        dls_l.append(dls)
    return (
        np.concatenate(ids_l),
        np.concatenate(tfs_l),
        np.concatenate(dls_l),
        np.concatenate(pos_l),
    )


def _decode_rows_off(row, sel: Optional[np.ndarray], counters: List[int]):
    """Like _decode_rows_pos but decodes the OFFSETS stream of the kept
    blocks: returns (ids, tfs, starts, ends) — the char spans of every
    occurrence (IndexOptions ..._AND_OFFSETS read path)."""
    from ..functions.codec import decode_block_offsets

    bf = np.asarray(row["block_first"], dtype=np.int64)
    bl = np.asarray(row["block_last"], dtype=np.int64)
    data, odata = row["block_data"], row.get("block_off") if hasattr(row, "get") else row["block_off"]
    if odata is None or (isinstance(odata, float) and np.isnan(odata)):
        raise ValueError(
            "index was built without offset data; rebuild with "
            "IndexConfig(index_offsets=True) or use the analysis offset source"
        )
    counters[0] += len(bf)
    if sel is not None:
        lo = np.searchsorted(sel, bf, "left")
        hi = np.searchsorted(sel, bl, "right")
        keep = np.flatnonzero(hi > lo)
    else:
        keep = np.arange(len(bf))
    counters[1] += len(keep)
    z = np.empty(0, np.int64)
    if len(keep) == 0:
        return z, z, z, z
    ids_l, tfs_l, st_l, en_l = [], [], [], []
    for i in keep:
        ids, tfs, _dls = decode_block(bytes(data[i]))
        st, en = decode_block_offsets(bytes(odata[i]), tfs)
        ids_l.append(ids)
        tfs_l.append(tfs)
        st_l.append(st)
        en_l.append(en)
    return (
        np.concatenate(ids_l),
        np.concatenate(tfs_l),
        np.concatenate(st_l),
        np.concatenate(en_l),
    )


def term_offsets_for_docs(index: Index, terms, docids: np.ndarray) -> DataFrame:
    """Distributed postings-sourced offsets: every (docid, term) occurrence
    span for the given docid set (candidate-restricted block decode, like
    the phrase two-phase). Returns (docid, term, start, end) rows."""
    terms = sorted(set(terms))
    sel = np.sort(np.asarray(docids, dtype=np.int64))

    def fn(key, pdf: pd.DataFrame, deleted: Optional[np.ndarray]) -> pd.DataFrame:
        counters = [0, 0]
        s = _live_mask(sel, deleted)
        cur = sel if s is None else sel[s]
        out = {"docid": [], "term": [], "start": [], "end": []}
        if len(cur):
            for t, grp in pdf.groupby("term"):
                rows = grp.to_dict("records")
                rows.sort(key=lambda r: r["first_docid"])
                parts = [_decode_rows_off(r, cur, counters) for r in rows]
                ids = np.concatenate([p[0] for p in parts])
                tfs = np.concatenate([p[1] for p in parts])
                st = np.concatenate([p[2] for p in parts])
                en = np.concatenate([p[3] for p in parts])
                m = cur[np.searchsorted(cur, ids).clip(max=len(cur) - 1)] == ids
                occ = np.repeat(m, tfs)
                st, en = st[occ], en[occ]
                ids_occ = np.repeat(ids[m], tfs[m])
                out["docid"].extend(int(d) for d in ids_occ)
                out["term"].extend([t] * len(ids_occ))
                out["start"].extend(int(v) for v in st)
                out["end"].extend(int(v) for v in en)
        return pd.DataFrame(
            {
                "docid": np.array(out["docid"], dtype=np.int64),
                "term": np.array(out["term"], dtype=object),
                "start": np.array(out["start"], dtype=np.int32),
                "end": np.array(out["end"], dtype=np.int32),
            }
        )

    rows = index.postings_for(terms, streams=("block_data", "block_off"))
    return apply_per_segment(
        index, rows, fn, "docid long, term string, start int, end int"
    )


def _phrase_offsets(phrase, stop_words) -> List[Tuple[str, int]]:
    """Normalize a phrase spec to [(term, offset)] with offset[0] == 0
    (PhraseQuery.rewrite rebases; stopword holes preserved like the
    QueryParser's position increments)."""
    from ..analysis import ENGLISH_STOP_WORDS, analyze_with_positions

    if isinstance(phrase, str):
        pairs = analyze_with_positions(phrase, stop_words or ENGLISH_STOP_WORDS)
    elif phrase and isinstance(phrase[0], (tuple, list)):
        pairs = [(t, int(o)) for t, o in phrase]
    else:
        pairs = [(t, i) for i, t in enumerate(phrase)]
    if not pairs:
        return []
    base = pairs[0][1]
    return [(t, o - base) for t, o in pairs]


def make_phrase_topk_fn(
    terms_off: Sequence[Tuple[str, int]],
    weight: float,
    k: int,
    slop: int,
    avgdl: float,
    quantize: bool,
    dtype,
    sim=None,
):
    """Per-segment phrase scorer: conjunction approximation over docids
    (positions untouched), then position decode + exact/sloppy matcher on
    surviving candidates only (PhraseScorer.twoPhaseIterator analog)."""
    from ..functions.phrase import sloppy_2term_doc_freqs, sloppy_phrase_freq

    distinct = sorted({t for t, _ in terms_off})
    POS_BASE = np.int64(1) << np.int64(22)  # fused (doc, adjusted-pos) key space

    def run(pdf: pd.DataFrame, deleted: Optional[np.ndarray]):
        counters = [0, 0]
        z = np.empty(0, np.int64)
        rows: Dict[str, list] = {}
        for r in pdf.to_dict("records"):
            rows.setdefault(r["term"], []).append(r)
        for t in rows:
            rows[t].sort(key=lambda r: r["first_docid"])
        if any(t not in rows for t in distinct):
            return z, z.astype(np.float64), counters

        # --- phase 1: conjunction on docids, rarest term leads
        order = sorted(distinct, key=lambda t: sum(int(r["df"]) for r in rows[t]))
        cand = None
        for t in order:
            parts = [_decode_rows(r, cand, counters) for r in rows[t]]
            ids = np.concatenate([p[0] for p in parts])
            if cand is not None and len(ids):
                m = cand[np.searchsorted(cand, ids).clip(max=len(cand) - 1)] == ids
                ids = ids[m]
            cand = ids if cand is None else np.intersect1d(cand, ids, assume_unique=True)
            if len(cand) == 0:
                return z, z.astype(np.float64), counters
        live = _live_mask(cand, deleted)
        if live is not None:
            cand = cand[live]
        if len(cand) == 0:
            return z, z.astype(np.float64), counters

        # --- phase 2: decode positions for candidate blocks only
        per_term: Dict[str, tuple] = {}
        doclens = None
        for t in distinct:
            parts = [_decode_rows_pos(r, cand, counters) for r in rows[t]]
            ids = np.concatenate([p[0] for p in parts])
            tfs = np.concatenate([p[1] for p in parts])
            dls = np.concatenate([p[2] for p in parts])
            pos = np.concatenate([p[3] for p in parts])
            m = cand[np.searchsorted(cand, ids).clip(max=len(cand) - 1)] == ids
            pos = pos[np.repeat(m, tfs)]
            ids, tfs, dls = ids[m], tfs[m], dls[m]
            per_term[t] = (ids, tfs, pos)
            if doclens is None:
                doclens = dls  # any term's postings carry the doc's length
        assert doclens is not None and all(
            len(per_term[t][0]) == len(cand) for t in distinct
        )

        # --- matcher: phraseFreq per candidate doc
        if slop == 0:
            base = int(cand[0])  # rebase so fused keys fit int64 at any scale
            keys = None
            for t, off in terms_off:
                ids, tfs, pos = per_term[t]
                if len(pos) and int(pos.max()) + 1 >= int(POS_BASE):
                    raise ValueError("document positions exceed fused-key space")
                adj = pos - np.int64(off)
                kt = (np.repeat(ids, tfs) - base) * POS_BASE + adj
                kt = kt[adj >= 0]
                keys = kt if keys is None else np.intersect1d(keys, kt, assume_unique=True)
                if len(keys) == 0:
                    return z, z.astype(np.float64), counters
            docs, cnts = np.unique(keys // POS_BASE, return_counts=True)
            docs = docs + base
            sel = np.searchsorted(cand, docs)
            freqs = cnts.astype(np.float64)
            dls_m = doclens[sel]
        elif len(terms_off) == 2 and terms_off[0][0] != terms_off[1][0]:
            # --- vectorized 2-distinct-term sloppy matcher: one batched
            # merged-boundary pass over ALL candidate docs (no per-doc
            # Python walk; see sloppy_2term_doc_freqs). Fused keys shift
            # adjusted positions by max offset so they stay non-negative.
            base = int(cand[0])
            shift = np.int64(max(o for _, o in terms_off))
            fused = []
            for t, off in terms_off:
                ids, tfs, pos = per_term[t]
                if len(pos) and int(pos.max()) + int(shift) + 1 >= int(POS_BASE):
                    raise ValueError("document positions exceed fused-key space")
                adj = pos - np.int64(off) + shift
                fused.append((np.repeat(ids, tfs) - base) * POS_BASE + adj)
            docs, freqs32 = sloppy_2term_doc_freqs(
                fused[0], fused[1], int(POS_BASE), slop, dtype=dtype
            )
            if len(docs) == 0:
                return z, z.astype(np.float64), counters
            docs = docs + base
            sel = np.searchsorted(cand, docs)
            freqs = freqs32.astype(np.float64)
            dls_m = doclens[sel]
        elif (
            len({t for t, _ in terms_off}) == len(terms_off)
            and max(o for _, o in terms_off) < 256
        ):
            # offset < 256 keeps the (pos, off) key fusion exact; longer
            # phrases (offsets >= 256) take the per-doc walk below
            # --- batched n-distinct-term sloppy matcher: the synchronized
            # micro-step walk runs every candidate doc through the exact
            # greedy pq traversal simultaneously (sloppy_nterm_doc_freqs;
            # no per-candidate-doc Python loop, VERDICT r3 wrong#4)
            from ..functions.phrase import sloppy_nterm_doc_freqs

            plists = [per_term[t][2] for t, _ in terms_off]
            bnds = [
                np.concatenate(([0], np.cumsum(per_term[t][1])))
                for t, _ in terms_off
            ]
            offs = [o for _, o in terms_off]
            rows_i, freqs_d = sloppy_nterm_doc_freqs(
                plists, bnds, offs, slop, dtype=dtype
            )
            if len(rows_i) == 0:
                return z, z.astype(np.float64), counters
            docs = cand[rows_i]
            freqs = freqs_d.astype(np.float64)
            dls_m = doclens[rows_i]
        else:
            # repeating phrase terms (rptGroups, simple case — every pp is
            # one term so group members share ONE positions list)
            bounds = {
                t: np.concatenate(([0], np.cumsum(per_term[t][1])))
                for t in distinct
            }
            offs = [o for _, o in terms_off]
            tlist = [t for t, _ in terms_off]
            members: Dict[str, list] = {}
            for i, t in enumerate(tlist):
                members.setdefault(t, []).append(i)
            groups = [g for g in members.values() if len(g) > 1]
            if max(offs) < 256:
                # batched rptGroups walk: the synchronized micro-step
                # machinery + vectorized collision chains — no
                # per-candidate-doc Python (sloppy_rpt_doc_freqs,
                # bit-identical randomized differential vs the scalar walk)
                from ..functions.phrase import sloppy_rpt_doc_freqs

                plists = [per_term[t][2] for t, _ in terms_off]
                bnds = [bounds[t] for t, _ in terms_off]
                rows_i, freqs_d = sloppy_rpt_doc_freqs(
                    plists, bnds, offs, slop, groups, dtype=dtype
                )
                if len(rows_i) == 0:
                    return z, z.astype(np.float64), counters
                docs = cand[rows_i]
                freqs = freqs_d.astype(np.float64)
                dls_m = doclens[rows_i]
            else:
                docs_l, freqs_l, dls_l = [], [], []
                for i, d in enumerate(cand):
                    plists = []
                    for t, _ in terms_off:
                        b = bounds[t]
                        plists.append(per_term[t][2][b[i] : b[i + 1]])
                    f = sloppy_phrase_freq(plists, offs, slop, dtype=dtype, terms=tlist)
                    if f > 0:
                        docs_l.append(d)
                        freqs_l.append(float(f))
                        dls_l.append(doclens[i])
                if not docs_l:
                    return z, z.astype(np.float64), counters
                docs = np.array(docs_l, dtype=np.int64)
                freqs = np.array(freqs_l, dtype=np.float64)
                dls_m = np.array(dls_l, dtype=np.int64)

        if sim is not None:
            scores = sim.phrase_score(freqs, dls_m)
        else:
            scores = score_arrays(freqs, dls_m, weight, avgdl, quantize, dtype)
        sel_ids, sel_sc = _select_topk(docs, scores, k)
        return sel_ids, sel_sc, counters

    def topk_fn(key, pdf: pd.DataFrame, deleted: Optional[np.ndarray]) -> pd.DataFrame:
        ids, scores, counters = run(pdf, deleted)
        return pd.DataFrame(
            {
                "docid": ids,
                "score": scores,
                "blocks_total": np.full(len(ids), counters[0], dtype=np.int64),
                "blocks_decoded": np.full(len(ids), counters[1], dtype=np.int64),
            }
        )

    return topk_fn


def require_positions(index: Index, what: str) -> None:
    """Refuse position-dependent queries on an index built with
    index_positions=False (IllegalStateException "field ... was indexed
    without position data" analog). Pre-stamp indexes (flag unknown) pass
    through unchecked."""
    if index.has_positions is False:
        raise ValueError(
            f"{what} requires positions, but this index was built without "
            "position data (IndexConfig(index_positions=False)); rebuild "
            "with index_positions=True"
        )


def search_phrase(
    index: Index,
    phrase,
    slop: int = 0,
    k: int = 10,
    boost: float = 1.0,
    quantize: bool = True,
    dtype=np.float32,
    stop_words=None,
    similarity: Optional[str] = None,
) -> DataFrame:
    """PhraseQuery top-k (PhraseQuery.java:71,76): exact (slop=0, leapfrog
    alignment, ExactPhraseMatcher.java:149) or sloppy (greedy pq matcher,
    SloppyPhraseMatcher.java:205). weight = boost * Σ idf over the phrase's
    terms (duplicates included, BM25Similarity.idfExplain[TermStats[]]);
    phraseFreq is the BM25 freq. ``phrase``: a string (analyzed, stopword
    holes preserved), a term list, or [(term, offset)] pairs. A non-BM25
    ``similarity`` scores the phrase freq through the Similarity seam
    (one SimScorer per term occurrence, summed — MultiSimilarity analog)."""
    from .scorer import idf as _idf

    require_positions(index, "PhraseQuery")
    per_seg = _phrase_per_seg(index, phrase, slop, k, boost, quantize, dtype,
                              stop_words, similarity)
    if per_seg is None:
        return index.spark.createDataFrame([], "docid long, score double")
    return (
        per_seg.orderBy(F.col("score").desc(), F.col("docid").asc())
        .limit(k)
        .select("docid", "score")
    )


def phrase_scores(
    index: Index,
    phrase,
    slop: int = 0,
    boost: float = 1.0,
    quantize: bool = False,
    dtype=np.float64,
    stop_words=None,
    similarity: Optional[str] = None,
) -> DataFrame:
    """ALL (docid, score) phrase matches, uncut — the tree-evaluation
    building block for PhraseQuery clauses inside nested booleans."""
    per_seg = _phrase_per_seg(index, phrase, slop, None, boost, quantize, dtype,
                              stop_words, similarity)
    if per_seg is None:
        return index.spark.createDataFrame([], "docid long, score double")
    return per_seg.select("docid", "score")


def _phrase_per_seg(index, phrase, slop, k, boost, quantize, dtype, stop_words,
                    similarity=None):
    from collections import Counter

    from .scorer import idf as _idf
    from .similarities import bind_similarity

    terms_off = _phrase_offsets(phrase, stop_words)
    if len(terms_off) < 2:
        return None
    distinct = sorted({t for t, _ in terms_off})
    stats = index.term_stats_for(distinct)
    if any(t not in stats for t in distinct):
        return None  # a missing term can never align
    n = index.field_stats.doc_count
    w = float(
        dtype(boost)
        * dtype(sum(float(_idf(stats[t][0], n, dtype)) for t, _ in terms_off))
    )
    # non-BM25 similarity: one TermStatistics per phrase-term OCCURRENCE
    # (PhraseQuery.createWeight builds termStats per position, repeats
    # included) — occurrence counts ride the qtf slot of the binder
    sim = bind_similarity(
        similarity, dict(Counter(t for t, _ in terms_off)), stats,
        index.field_stats, boost, quantize, dtype,
    )
    rows = index.postings_for(distinct, streams=("block_data", "block_pos"))
    fn = make_phrase_topk_fn(
        terms_off, w, k, slop, float(index.field_stats.avgdl()), quantize, dtype,
        sim=sim,
    )
    return apply_per_segment(index, rows, fn, TOPK_SCHEMA)


def make_multiphrase_fn(
    slots: Sequence[Tuple[int, Tuple[str, ...]]],
    weight: float,
    k: Optional[int],
    slop: int,
    avgdl: float,
    quantize: bool,
    dtype,
    sim=None,
):
    """Per-segment MultiPhraseQuery scorer: a slot matches where ANY of its
    alternative terms occurs (UnionPostingsEnum, MultiPhraseQuery.java:412);
    conjunction runs over per-slot docid unions, then the exact/sloppy
    matcher runs over per-slot position unions."""
    from ..functions.phrase import sloppy_phrase_freq

    distinct = sorted({t for _, alts in slots for t in alts})
    POS_BASE = np.int64(1) << np.int64(22)

    def run(pdf: pd.DataFrame, deleted: Optional[np.ndarray]):
        counters = [0, 0]
        z = np.empty(0, np.int64)
        rows: Dict[str, list] = {}
        for r in pdf.to_dict("records"):
            rows.setdefault(r["term"], []).append(r)
        for t in rows:
            rows[t].sort(key=lambda r: r["first_docid"])
        slot_alts = [[t for t in alts if t in rows] for _, alts in slots]
        if any(not a for a in slot_alts):
            return z, z.astype(np.float64), counters

        def term_ids(t, sel):
            parts = [_decode_rows(r, sel, counters) for r in rows[t]]
            ids = np.concatenate([p[0] for p in parts])
            if sel is not None and len(ids):
                m = sel[np.searchsorted(sel, ids).clip(max=len(sel) - 1)] == ids
                ids = ids[m]
            return ids

        # --- phase 1: conjunction over slot UNIONS, lowest-df slot first
        slot_df = [sum(int(r["df"]) for t in alts for r in rows[t]) for alts in slot_alts]
        order = np.argsort(slot_df)
        cand = None
        for si in order:
            u = None
            for t in slot_alts[si]:
                ids = term_ids(t, cand)
                u = ids if u is None else np.union1d(u, ids)
            cand = u if cand is None else np.intersect1d(cand, u, assume_unique=True)
            if cand is None or len(cand) == 0:
                return z, z.astype(np.float64), counters
        live = _live_mask(cand, deleted)
        if live is not None:
            cand = cand[live]
        if len(cand) == 0:
            return z, z.astype(np.float64), counters

        # --- phase 2: positions for candidate blocks only
        per_term: Dict[str, tuple] = {}
        dl = np.zeros(len(cand), dtype=np.int64)
        for t in distinct:
            parts = [_decode_rows_pos(r, cand, counters) for r in rows[t]]
            ids = np.concatenate([p[0] for p in parts])
            tfs = np.concatenate([p[1] for p in parts])
            dls = np.concatenate([p[2] for p in parts])
            pos = np.concatenate([p[3] for p in parts])
            m = cand[np.searchsorted(cand, ids).clip(max=len(cand) - 1)] == ids
            pos = pos[np.repeat(m, tfs)]
            ids, tfs, dls = ids[m], tfs[m], dls[m]
            per_term[t] = (ids, tfs, pos)
            dl[np.searchsorted(cand, ids)] = dls

        base = int(cand[0])
        if slop == 0:
            keys = None
            for (off, _), alts in zip(slots, slot_alts):
                ks = []
                for t in alts:
                    ids, tfs, pos = per_term[t]
                    adj = pos - np.int64(off)
                    kt = (np.repeat(ids, tfs) - base) * POS_BASE + adj
                    ks.append(kt[adj >= 0])
                # a slot's alternatives CAN share a position once index-time
                # synonym stacking exists (both synonyms occupy the same
                # position, ADVICE r4) — np.unique dedupes before the
                # assume_unique intersection, and matches the reference's
                # UnionPostingsEnum position-dedup (MultiPhraseQuery.java:475)
                slot_keys = np.unique(np.concatenate(ks))
                keys = slot_keys if keys is None else np.intersect1d(
                    keys, slot_keys, assume_unique=True
                )
                if len(keys) == 0:
                    return z, z.astype(np.float64), counters
            docs, cnts = np.unique(keys // POS_BASE, return_counts=True)
            docs = docs + base
            sel = np.searchsorted(cand, docs)
            freqs = cnts.astype(np.float64)
            dls_m = dl[sel]
        else:
            bounds = {t: np.concatenate(([0], np.cumsum(per_term[t][1]))) for t in distinct}
            tpos = {t: np.searchsorted(per_term[t][0], cand) for t in distinct}
            offs = [o for o, _ in slots]
            # repeat groups across slots (gatherRptGroups multi-term case,
            # SloppyPhraseMatcher.java:556-609): union-find over slots
            # sharing a repeating term; hasMultiTermRpts when a repeating
            # slot has several alternatives
            term_slots: Dict[str, list] = {}
            for si, alts in enumerate(slot_alts):
                for t in alts:
                    term_slots.setdefault(t, []).append(si)
            parent = list(range(len(slots)))

            def _find(x: int) -> int:
                while parent[x] != x:
                    parent[x] = parent[parent[x]]
                    x = parent[x]
                return x

            for t, ss in term_slots.items():
                if len(ss) > 1:
                    r0 = _find(ss[0])
                    for s2 in ss[1:]:
                        parent[_find(s2)] = r0
            by_root: Dict[int, list] = {}
            for si in range(len(slots)):
                by_root.setdefault(_find(si), []).append(si)
            rpt_groups = [g for g in by_root.values() if len(g) > 1]
            has_multi = any(
                len(slot_alts[si]) > 1 for g in rpt_groups for si in g
            )
            if not rpt_groups:
                # no term repeats across slots: each slot is a virtual
                # distinct term whose per-doc positions are the sorted
                # union of its alternatives — EXACTLY the n-distinct-term
                # batched walk's contract (sloppy_nterm_doc_freqs), so all
                # candidate docs advance together instead of a per-doc
                # Python loop (VERDICT r3 wrong#4, multiphrase leg)
                from ..functions.phrase import sloppy_nterm_doc_freqs

                slot_plists, slot_bounds = [], []
                for (off, _), alts in zip(slots, slot_alts):
                    ap, ac = [], []
                    for t in alts:
                        ids, tfs, pos = per_term[t]
                        ci = np.searchsorted(cand, ids)
                        ap.append(pos)
                        ac.append(np.repeat(ci, tfs))
                    all_pos = np.concatenate(ap)
                    all_ci = np.concatenate(ac)
                    order = np.lexsort((all_pos, all_ci))
                    slot_plists.append(all_pos[order])
                    cnts = np.bincount(all_ci, minlength=len(cand))
                    slot_bounds.append(
                        np.concatenate(([0], np.cumsum(cnts))).astype(np.int64)
                    )
                doc_rows, bfreqs = sloppy_nterm_doc_freqs(
                    slot_plists, slot_bounds, offs, slop, dtype=dtype
                )
                if len(doc_rows) == 0:
                    return z, z.astype(np.float64), counters
                docs = cand[doc_rows]
                freqs = np.asarray(bfreqs, dtype=np.float64)
                dls_m = dl[doc_rows]
                if sim is not None:
                    scores = sim.phrase_score(freqs, dls_m)
                else:
                    scores = score_arrays(freqs, dls_m, weight, avgdl, quantize, dtype)
                sel_ids, sel_sc = _select_topk(docs, scores, k)
                return sel_ids, sel_sc, counters
            docs_l, freqs_l, dls_l = [], [], []
            for i, d in enumerate(cand):
                plists = []
                for (off, _), alts in zip(slots, slot_alts):
                    ps = []
                    for t in alts:
                        ids, tfs, pos = per_term[t]
                        j = tpos[t][i]
                        if j < len(ids) and ids[j] == d:
                            b = bounds[t]
                            ps.append(pos[b[j] : b[j + 1]])
                    merged = np.sort(np.concatenate(ps)) if ps else np.empty(0, np.int64)
                    plists.append(merged)
                f = sloppy_phrase_freq(
                    plists, offs, slop, dtype=dtype,
                    groups=rpt_groups, multi_term=has_multi,
                )
                if f > 0:
                    docs_l.append(d)
                    freqs_l.append(float(f))
                    dls_l.append(dl[i])
            if not docs_l:
                return z, z.astype(np.float64), counters
            docs = np.array(docs_l, dtype=np.int64)
            freqs = np.array(freqs_l, dtype=np.float64)
            dls_m = np.array(dls_l, dtype=np.int64)

        if sim is not None:
            scores = sim.phrase_score(freqs, dls_m)
        else:
            scores = score_arrays(freqs, dls_m, weight, avgdl, quantize, dtype)
        sel_ids, sel_sc = _select_topk(docs, scores, k)
        return sel_ids, sel_sc, counters

    def topk_fn(key, pdf: pd.DataFrame, deleted: Optional[np.ndarray]) -> pd.DataFrame:
        ids, scores, counters = run(pdf, deleted)
        return pd.DataFrame(
            {
                "docid": ids,
                "score": scores,
                "blocks_total": np.full(len(ids), counters[0], dtype=np.int64),
                "blocks_decoded": np.full(len(ids), counters[1], dtype=np.int64),
            }
        )

    return topk_fn


def ngram_phrase_rewrite(terms: Sequence[str], n: int) -> List[Tuple[str, int]]:
    """NGramPhraseQuery rewrite (search/NGramPhraseQuery.java:45-75): an
    exact phrase of ADJACENT n-grams is equivalent to matching only every
    n-th gram plus the last, at their original offsets — kept grams pin the
    underlying characters, which pin the skipped grams (an invariant of an
    n-gram analyzer's index). Applies when n >= 2 and the phrase has >= 3
    consecutive single-term positions; otherwise returns the phrase as-is.
    Like the reference rewrite, the optimized query REPLACES the original,
    so scores come from the smaller term set; the match set is identical."""
    if n < 2 or len(terms) < 3:
        return [(t, i) for i, t in enumerate(terms)]
    return [
        (t, i)
        for i, t in enumerate(terms)
        if i % n == 0 or i == len(terms) - 1
    ]


def search_ngram_phrase(
    index: Index, gram_terms: Sequence[str], n: int, k: int = 10,
    boost: float = 1.0, quantize: bool = True, dtype=np.float32,
) -> DataFrame:
    """Exact phrase over an n-gram-analyzed field with the NGramPhraseQuery
    term-skipping rewrite applied."""
    return search_phrase(
        index, ngram_phrase_rewrite(list(gram_terms), n), slop=0, k=k,
        boost=boost, quantize=quantize, dtype=dtype,
    )


def search_phrase_wildcard(
    index: Index,
    phrase: str,
    slop: int = 0,
    k: int = 10,
    max_expansions: int = 128,
    **kw,
) -> DataFrame:
    """PhraseWildcardQuery analog (lucene/sandbox/src/java/org/apache/
    lucene/sandbox/search/PhraseWildcardQuery.java:63): a phrase whose
    slots may be multi-term patterns — "hash jo*" or "ha?h join". Each
    pattern slot expands against the term dictionary (TopTermsRewrite cap,
    distributed expansion — expand_terms never collects the vocabulary to
    enumerate) and the result lowers onto the MultiPhraseQuery machinery
    (slot-union matcher + allTermStats weight). The reference additionally
    orders slot expansion by cost and prunes by segment; the two-phase
    candidate-restricted position decode here plays that role."""
    require_positions(index, "PhraseWildcardQuery")
    slots = []
    for off, word in enumerate(w for w in phrase.lower().split() if w):
        if "*" in word or "?" in word:
            if word.replace("*", "") == "":
                raise ValueError("a slot cannot be a bare wildcard")
            if "?" in word or not word.endswith("*") or "*" in word[:-1]:
                regex = "^" + "".join(
                    ".*" if c == "*" else "." if c == "?" else re.escape(c)
                    for c in word
                ) + "$"
                terms = index.expand_terms(regex=regex, max_terms=max_expansions)
            else:
                terms = index.expand_terms(prefix=word[:-1], max_terms=max_expansions)
            if not terms:
                return index.spark.createDataFrame([], "docid long, score double")
            slots.append((off, sorted(terms)))
        else:
            slots.append((off, [word]))
    return search_multi_phrase(index, slots, slop=slop, k=k, **kw)


def search_multi_phrase(
    index: Index,
    slots: Sequence,
    slop: int = 0,
    k: int = 10,
    boost: float = 1.0,
    quantize: bool = True,
    dtype=np.float32,
    similarity: Optional[str] = None,
) -> DataFrame:
    """MultiPhraseQuery top-k (search/MultiPhraseQuery.java:54): ``slots`` =
    [(offset, [alternative terms...])]; a slot matches where ANY alternative
    occurs, and the weight sums the idf of EVERY alternative that exists in
    the index (allTermStats, MultiPhraseQuery.java:228-236). A non-BM25
    ``similarity`` scores the phrase freq with one SimScorer per existing
    alternative, summed (MultiSimilarity analog)."""
    from collections import Counter

    from .scorer import idf as _idf
    from .similarities import bind_similarity

    require_positions(index, "MultiPhraseQuery")
    spark = index.spark
    empty = spark.createDataFrame([], "docid long, score double")
    if not slots:
        return empty
    base_off = int(slots[0][0])
    # terms repeating across slots are handled by the rptGroups machinery
    # inside the matcher (union-find groups + multi-term init/advance,
    # SloppyPhraseMatcher.java:465-497,556-609)
    norm_slots = [(int(o) - base_off, tuple(sorted(set(a)))) for o, a in slots]
    all_terms = sorted({t for _, a in norm_slots for t in a})
    stats = index.term_stats_for(all_terms)
    live_slots = []
    for off, alts in norm_slots:
        live = tuple(t for t in alts if t in stats)
        if not live:
            return empty  # a slot with no existing alternative can't match
        live_slots.append((off, live))
    n = index.field_stats.doc_count
    w = float(
        dtype(boost)
        * dtype(sum(float(_idf(stats[t][0], n, dtype)) for _, a in live_slots for t in a))
    )
    sim = bind_similarity(
        similarity, dict(Counter(t for _, a in live_slots for t in a)), stats,
        index.field_stats, boost, quantize, dtype,
    )
    distinct = sorted({t for _, a in live_slots for t in a})
    rows = index.postings_for(distinct, streams=("block_data", "block_pos"))
    fn = make_multiphrase_fn(
        live_slots, w, k, slop, float(index.field_stats.avgdl()), quantize, dtype,
        sim=sim,
    )
    per_seg = apply_per_segment(index, rows, fn, TOPK_SCHEMA)
    return (
        per_seg.orderBy(F.col("score").desc(), F.col("docid").asc())
        .limit(k)
        .select("docid", "score")
    )


def blended_term_topk(
    index: Index,
    terms: Sequence[str],
    k: int = 10,
    tie: float = 0.01,
    boost: float = 1.0,
    dtype=np.float64,
) -> DataFrame:
    """BlendedTermQuery (search/BlendedTermQuery.java:47): every term is
    scored with BLENDED statistics — df = max over the terms
    (BlendedTermQuery.java:281-282) — then combined by the default
    DisjunctionMax rewrite with tieBreaker 0.01
    (DISJUNCTION_MAX_REWRITE): score = max(sub) + tie * Σ(other subs)."""
    spark = index.spark
    stats = index.term_stats_for(list(terms))
    live = sorted(t for t in set(terms) if t in stats)
    if not live:
        return spark.createDataFrame([], "docid long, score double")
    n = index.field_stats.doc_count
    df_blend = max(stats[t][0] for t in live)
    from .scorer import idf as _idf

    w = float(dtype(boost) * _idf(df_blend, n, dtype))
    dec = decoded_postings(index, live)
    avgdl = float(index.field_stats.avgdl())
    ninv = 1.0 / (F.lit(1.2) * (F.lit(0.25) + F.lit(0.75) * F.col("doclen") / F.lit(avgdl)))
    s = F.lit(w) - F.lit(w) / (F.lit(1.0) + F.col("tf").cast("double") * ninv)
    per_doc = dec.withColumn("s", s).groupBy("docid").agg(
        F.max("s").alias("mx"), F.sum("s").alias("sm")
    )
    score = F.col("mx") + F.lit(float(tie)) * (F.col("sm") - F.col("mx"))
    return (
        per_doc.select("docid", score.alias("score"))
        .orderBy(F.col("score").desc(), F.col("docid").asc())
        .limit(k)
    )


def dismax_topk(
    index: Index,
    clauses: Sequence[NormalizedQuery],
    k: int = 10,
    tie: float = 0.0,
    **kw,
) -> DataFrame:
    """DisjunctionMaxQuery (search/DisjunctionMaxQuery.java:41,
    DisjunctionMaxScorer): a doc matches when ANY clause matches; its
    score is the MAX clause score plus ``tie`` times the sum of the other
    matching clauses' scores (tieBreakerMultiplier). Each clause is a full
    NormalizedQuery evaluated by the exhaustive JVM path; the combine is
    one union + groupBy — no driver loop over docs."""
    spark = index.spark
    scored = None
    for q in clauses:
        part = search_exhaustive(index, q, k=None, **kw)
        scored = part if scored is None else scored.unionByName(part)
    if scored is None:
        return spark.createDataFrame([], "docid long, score double")
    per_doc = scored.groupBy("docid").agg(
        F.max("score").alias("mx"), F.sum("score").alias("sm")
    )
    score = F.col("mx") + F.lit(float(tie)) * (F.col("sm") - F.col("mx"))
    return (
        per_doc.select("docid", score.alias("score"))
        .orderBy(F.col("score").desc(), F.col("docid").asc())
        .limit(k)
    )


def feature_topk(
    index: Index,
    q: NormalizedQuery,
    feature_col: str,
    function: str = "saturation",
    weight: float = 1.0,
    pivot: float = 1.0,
    exponent: float = 1.0,
    scaling: float = 1.0,
    k: int = 10,
    **kw,
) -> DataFrame:
    """FeatureField scoring (document/FeatureField.java:106): a static
    per-doc feature (pagerank, recency, quality) contributes to the score
    through one of the reference's four functions —
      linear      w * f                       [FeatureField.java:262-268]
      log         w * ln(scaling + f)         [FeatureField.java:352-357]
      saturation  w * (1 - pivot/(f + pivot)) [FeatureField.java:446-451]
      sigmoid     w * (1 - k^a/(f^a + k^a))   [FeatureField.java:527-532]
    — added to the wrapped query's score (the usual SHOULD-clause
    composition). The feature here is a plain doc column (Spark is
    columnar; no freq-encoding roundtrip needed); the whole plan is
    Catalyst expressions over the match join."""
    f = F.col(feature_col).cast("double")
    w = F.lit(float(weight))
    if function == "linear":
        fs = w * f
    elif function == "log":
        fs = w * F.log(F.lit(float(scaling)) + f)
    elif function == "saturation":
        p = F.lit(float(pivot))
        fs = w * (F.lit(1.0) - p / (f + p))
    elif function == "sigmoid":
        pa = F.lit(float(pivot) ** float(exponent))
        fs = w * (F.lit(1.0) - pa / (F.pow(f, F.lit(float(exponent))) + pa))
    else:
        raise ValueError(f"unknown feature function {function!r}")
    m = search_exhaustive(index, q, k=None, **kw).join(index.docs, "docid")
    # a doc with a NULL feature keeps its query score (the reference's
    # FeatureField-as-SHOULD contributes 0 when the feature is absent,
    # FeatureField.java:106; without the coalesce the NULL nulls the whole
    # sum and the doc sinks to the bottom, ADVICE r4)
    return (
        m.select("docid", (F.col("score") + F.coalesce(fs, F.lit(0.0))).alias("score"))
        .orderBy(F.col("score").desc(), F.col("docid").asc())
        .limit(k)
    )


def function_score(index: Index, q: NormalizedQuery, expr: str, k: int = 10, **kw) -> DataFrame:
    """FunctionScoreQuery (queries/function/FunctionScoreQuery.java:44): the
    final score is an arbitrary SQL expression over the matching doc's
    columns and the wrapped query's BM25 score — Catalyst IS the
    DoubleValuesSource expression compiler."""
    m = search_exhaustive(index, q, k=None, **kw).join(index.docs, "docid")
    return (
        m.select("docid", F.expr(expr).cast("double").alias("score"))
        .orderBy(F.col("score").desc(), F.col("docid").asc())
        .limit(k)
    )


def count_hits_lower_bound(index: Index, q: NormalizedQuery, threshold: int = 1000):
    """Early-terminating hit count (TotalHitCountCollector +
    totalHitsThreshold, TopScoreDocCollector.java:163): scan stops once
    ``threshold`` hits are seen; returns (count, relation) where relation is
    GREATER_THAN_OR_EQUAL when terminated early, else EQUAL."""
    if q.is_match_none:
        return 0, "EQUAL"
    n = search_exhaustive(index, q, k=None).limit(threshold).count()
    return n, "GREATER_THAN_OR_EQUAL" if n >= threshold else "EQUAL"


def count_hits(index: Index, q: NormalizedQuery) -> int:
    """TotalHitCountCollector / IndexSearcher.count analog, with the
    single-term df shortcut (Weight#count, IndexSearcher.java:495)."""
    if q.is_match_none:
        return 0
    terms = list(q.scoring_terms)
    # the df shortcut is only valid with no deletes (Weight#count returns -1
    # when liveDocs exist and Lucene falls back to counting)
    if len(terms) == 1 and not q.excluded and not index.has_deletes:
        stats = index.term_stats_for(terms)
        return stats.get(terms[0], (0, 0))[0]
    df = search_exhaustive(index, q, k=None)
    return df.count()


def hydrate(index: Index, topk: DataFrame) -> DataFrame:
    """Stored-fields hydration: join top-k docids back to the docs table
    (broadcast the tiny top-k side)."""
    return index.docs.join(F.broadcast(topk), "docid").orderBy(
        F.col("score").desc(), F.col("docid").asc()
    )


# ---------------------------------------------------------------------------
# Query-tree execution: nested booleans from the parser (exhaustive path)
# ---------------------------------------------------------------------------

def _eval_node(index: Index, node, quantize: bool, dtype,
               similarity: Optional[str] = None) -> Optional[DataFrame]:
    """Evaluate a query-tree node to a full (docid, score) DataFrame, or
    None when the node can match nothing. Score semantics follow
    BooleanQuery: a doc's score is the sum of its matching scoring clauses,
    each clause scaled by its boost [BooleanQuery.java:40, BoostQuery]."""
    if node is None:
        return None
    if isinstance(node, QTerm):
        if node.field not in (None, "content"):
            raise ValueError(
                f"unknown field {node.field!r} (single text field; see MultiFieldIndex)"
            )
        q = NormalizedQuery(optional=((node.term, 1),))
        df = search_exhaustive(index, q, k=None, boost=node.boost, quantize=quantize,
                               dtype=dtype, similarity=similarity)
        return df
    if isinstance(node, QPhrase):
        return phrase_scores(
            index, list(node.terms_off), slop=node.slop, boost=node.boost,
            quantize=quantize, dtype=dtype, similarity=similarity,
        )
    if isinstance(node, (QFuzzy, QPrefix, QWildcard)):
        # top-terms scoring rewrite: OR of the matching terms, each scored
        # with its own idf (ScoringRewrite / TopTermsRewrite, cap 1024)
        if isinstance(node, QFuzzy):
            terms = index.expand_terms(
                fuzzy=(node.term, node.max_edits), max_terms=1024,
                transpositions=node.transpositions,
            )
        elif isinstance(node, QPrefix):
            terms = index.expand_terms(prefix=node.prefix, max_terms=1024)
        else:
            regex = "^" + "".join(
                ".*" if c == "*" else "." if c == "?" else re.escape(c)
                for c in node.pattern
            ) + "$"
            terms = index.expand_terms(regex=regex, max_terms=1024)
        if not terms:
            return None
        q = NormalizedQuery(optional=tuple((t, 1) for t in sorted(terms)))
        return search_exhaustive(index, q, k=None, boost=node.boost, quantize=quantize,
                                 dtype=dtype, similarity=similarity)
    if isinstance(node, QRange):
        # filter-shaped node -> cacheable docid set (LRUQueryCache analog).
        # The cached set is RAW (pre-live-docs); deletes are applied after
        # retrieval, so tombstoning never stales the cache (the reference
        # keys per segment core and applies liveDocs at read,
        # LRUQueryCache.java:262-280).
        if node.field in (None, "content"):
            # TermRangeQuery -> constant-score over docs holding any term in
            # the lexicographic range (MultiTermQueryConstantScoreWrapper).
            # The in-range vocabulary is broadcast-joined against the
            # postings — it never materializes on the driver (a hot range
            # can cover millions of terms at corpus scale).
            ts = index.term_stats.filter(
                (F.col("term") >= node.lo) & (F.col("term") <= node.hi)
            ).select("term")
            # no existence pre-check: it cost a Spark job on EVERY call
            # (cache hits included), and an empty docid set composes
            # identically to the None fast path in _eval_bool (r7)

            def compute() -> DataFrame:
                return (
                    decoded_postings(index, ts, apply_deletes=False)
                    .select("docid")
                    .distinct()
                )
        else:
            # numeric/docvalues range: pushdown filter on the docs table
            # (PointRangeQuery analog — parquet min/max pruning replaces BKD)
            def compute() -> DataFrame:
                return index.docs.filter(
                    (F.col(node.field) >= node.lo) & (F.col(node.field) <= node.hi)
                ).select("docid")

        cache = index.query_cache
        if cache is not None:
            key = f"range|{node.field}|{node.lo!r}|{node.hi!r}|g{index.generation}"
            ids = cache.get_or_compute(key, compute)
        else:
            ids = compute()
        if index.has_deletes:
            ids = ids.join(index.tombstones.select("docid"), "docid", "left_anti")
        return ids.withColumn("score", F.lit(float(node.boost)))
    if isinstance(node, QBool):
        return _eval_bool(index, node, quantize, dtype, similarity)
    raise TypeError(f"unknown query node {type(node).__name__}")


def _eval_bool(index: Index, node: QBool, quantize: bool, dtype,
               similarity: Optional[str] = None) -> Optional[DataFrame]:
    must, should, mnot = [], [], []
    for occ, child in node.clauses:
        df = _eval_node(index, child, quantize, dtype, similarity)
        if occ == MUST:
            if df is None:
                return None  # a MUST clause that matches nothing kills the query
            must.append(df)
        elif occ == SHOULD:
            if df is not None:
                should.append(df)
        else:
            if df is not None:
                mnot.append(df)
    if not must and not should:
        return None  # empty / pure-negative boolean (BooleanQuery.java:269-276)
    msm = int(getattr(node, "msm", 0) or 0)
    if msm > len(should):
        # more shoulds demanded than exist -> MatchNone
        # (Booleans2ScorerSupplier's minShouldMatch > optional count)
        return None
    if should:
        # tag each SHOULD clause so msm can count DISTINCT matching clauses
        # over arbitrary clause types (BooleanQuery.java:123 semantics)
        tagged = [
            s.select("docid", "score", F.lit(i).alias("__cid__"))
            for i, s in enumerate(should)
        ]
        allsh = tagged[0]
        for s in tagged[1:]:
            allsh = allsh.unionAll(s)
        opt = allsh.groupBy("docid").agg(
            F.sum("score").alias("__opt__"),
            F.count_distinct("__cid__").alias("__nsh__"),
        )
        if msm > 0:
            opt = opt.filter(F.col("__nsh__") >= msm)
    if must:
        scored = must[0].select("docid", F.col("score").alias("s0"))
        for i, m in enumerate(must[1:], 1):
            scored = scored.join(
                m.select("docid", F.col("score").alias(f"s{i}")), "docid"
            )
        total = F.col("s0")
        for i in range(1, len(must)):
            total = total + F.col(f"s{i}")
        scored = scored.select("docid", total.alias("score"))
        if should:
            # with msm > 0 the qualified-shoulds set GATES matching (inner
            # join); msm == 0 keeps shoulds purely optional (left join)
            how = "inner" if msm > 0 else "left"
            scored = scored.join(opt.select("docid", "__opt__"), "docid", how).select(
                "docid",
                (F.col("score") + F.coalesce(F.col("__opt__"), F.lit(0.0))).alias("score"),
            )
    else:
        scored = opt.select("docid", F.col("__opt__").alias("score"))
    if mnot:
        ex = mnot[0].select("docid")
        for m in mnot[1:]:
            ex = ex.unionAll(m.select("docid"))
        scored = scored.join(ex.distinct(), "docid", "left_anti")
    if node.boost != 1.0:
        scored = scored.select("docid", (F.col("score") * F.lit(float(node.boost))).alias("score"))
    return scored


def search_tree(
    index: Index,
    node,
    k: Optional[int] = 10,
    quantize: bool = False,
    dtype=np.float64,
    similarity: Optional[str] = None,
) -> DataFrame:
    """Execute a parsed query tree (nested booleans, phrases, multi-term,
    ranges, boosts) on the exhaustive DataFrame path. ``similarity`` is
    threaded to every term-scored leaf AND phrase clause (Similarity seam;
    phrases score via the MultiSimScorer-sum analog)."""
    df = _eval_node(index, node, quantize, dtype, similarity)
    if df is None:
        return index.spark.createDataFrame([], "docid long, score double")
    df = df.orderBy(F.col("score").desc(), F.col("docid").asc())
    return df.limit(k) if k else df


def make_mixed_topk_fn(
    clauses: Sequence[Dict[str, int]],
    excluded: Sequence[str],
    k: int,
    avgdl: float,
    quantize: bool,
    dtype,
    theta_seed: float = 0.0,
    sim=None,
    weights: Optional[Dict[str, float]] = None,
    msm: int = 0,
    cursor: Optional[Tuple[float, int]] = None,
):
    """Per-segment scorer for the MIXED single-level disjunction — an OR
    over pseudo-scorers that are plain terms or AND-of-term groups, e.g.
    ``(rare AND hot) OR med``.

    This is the batched analog of Lucene composing WAND/MAXSCORE over
    arbitrary sub-scorers (BooleanScorerSupplier.java:288-317 builds the
    top-level disjunction from clause ScorerSuppliers; WANDScorer.java:55
    takes any Scorer, using its getMaxScore bound): a conjunction clause
    is ONE pseudo-scorer whose max-score bound is the SUM of its members'
    impact bounds, and the clause list runs through the same
    essential/non-essential MAXSCORE split as the flat term path
    (MaxScoreBulkScorer.java:26):

    - clauses are evaluated in descending bound order; once the remaining
      clauses' summed bounds fall below the running k-th score, their
      evaluation is restricted to still-competitive candidates;
    - a TERM clause runs the identical per-block chunked loop as the flat
      path (per-block competitive-impact bounds, candidate-potential
      refinement);
    - a CONJUNCTION clause leads with its rarest member
      (ConjunctionDISI.java:166-206) — only the small lead list is ever
      fully decoded, the other members decode block-restricted to the
      lead's candidates (the whole win vs the exhaustive tree walk, which
      decodes every leaf's full postings);
    - MUST_NOT is the same up-front ban mask as the flat path
      (ReqExclScorer.java:26) so excluded docs never raise theta.

    Scoring matches search_tree's semantics: score = Σ over MATCHING
    clauses of Σ member term scores (float64 tree defaults).

    ``msm`` > 0 demands at least that many DISTINCT matching clauses per
    doc (BooleanQuery.Builder.setMinimumNumberShouldMatch over arbitrary
    clause types) — the clause-granularity freq-counting-WAND analog of
    the flat path: per-doc matched-clause counts accumulate, theta only
    rises from docs already GUARANTEED qualified (counts are monotone),
    candidates additionally keep any doc whose count can still reach
    msm, and NEW docs stop being admitted once the remaining clauses
    cannot credit msm.

    ``cursor`` = (after_score, after_docid) enables pruned deep paging
    (IndexSearcher.searchAfter): a doc whose partial sum already exceeds
    the cursor score can never re-enter the page (sums only grow) and is
    dropped from decoding; theta may only rise from docs GUARANTEED to
    stay at/below the cursor (acc + full remaining bound <= after_score),
    so the intra-clause theta refresh is disabled — exactly the flat
    path's cursor rules."""
    if sim is None:
        from .similarities import BM25Bound

        sim = BM25Bound(weights, avgdl, quantize, dtype)
    excl = sorted(set(excluded))
    scale = PRUNE_SCALE[dtype]
    chunk_blocks = int(MAXSCORE_CHUNK)
    cl = [dict(c) for c in clauses]
    msm = int(msm)
    after_bound = float(cursor[0]) if cursor is not None else None
    after_docid = int(cursor[1]) if cursor is not None else None
    slack = 2.0 - scale  # tiny upward slack for float re-association
    _Z = np.empty(0, np.int64)

    def run(pdf: pd.DataFrame, deleted: Optional[np.ndarray]):
        counters = [0, 0]  # blocks_total, blocks_decoded
        rows = {}
        for r in pdf.to_dict("records"):  # dicts, not iterrows Series
            rows.setdefault(r["term"], []).append(r)
        for t in rows:
            rows[t].sort(key=lambda r: r["first_docid"])

        # a clause is viable here iff EVERY member has postings in this
        # segment (conjunction semantics; a term clause is its own member)
        viable = [c for c in cl if all(t in rows for t in c)]
        if not viable or msm > len(viable):
            # a clause missing a term here can credit no doc in this
            # segment, so msm > len(viable) is segment-level MatchNone
            return _Z, _Z.astype(np.float64), counters

        terms_here = sorted({t for c in viable for t in c})
        # blocks_total is a PLAN invariant — every postings block of every
        # viable query term, each term once — so decode ratios stay
        # comparable across seeded/unseeded configurations (counting
        # per-visit totals shrinks the denominator whenever a selection
        # empties and made a better plan look worse). blocks_decoded
        # counts decode EVENTS (a block decoded for two clauses is two).
        counters[0] += sum(
            len(r["block_first"])
            for t in terms_here + [t for t in excl if t in rows]
            for r in rows[t]
        )
        _only_decoded = [0, 0]  # _decode_rows sink: slot 0 discarded

        def _dec(r, sel):
            before = _only_decoded[1]
            out = _decode_rows(r, sel, _only_decoded)
            counters[1] += _only_decoded[1] - before
            return out
        base = min(int(r["first_docid"]) for t in terms_here for r in rows[t])
        hi = max(int(r["last_docid"]) for t in terms_here for r in rows[t])
        n = hi - base + 1
        if n > 500_000_000:
            raise ValueError(
                f"segment docid range {n} too sparse for the dense accumulator; "
                "use the engine's docid assignment or densify docid_col"
            )

        if excl:
            # MUST_NOT as an up-front liveDocs ban (ReqExclScorer.java:26);
            # see make_topk_fn — excluded docs must never raise theta
            ex_parts = [
                _dec(r, None)[0]
                for t in excl if t in rows for r in rows[t]
            ]
            if ex_parts:
                banned = np.unique(np.concatenate(ex_parts))
                deleted = (
                    banned if deleted is None else np.union1d(deleted, banned)
                )

        def decode_term(t, sel=None):
            if sel is not None and len(sel) == 0:
                z = np.empty(0, np.int64)
                return z, z, z
            parts = [_dec(r, sel) for r in rows[t]]
            ids = np.concatenate([p[0] for p in parts])
            tfs = np.concatenate([p[1] for p in parts])
            dls = np.concatenate([p[2] for p in parts])
            if sel is not None and len(ids):
                m = sel[np.searchsorted(sel, ids).clip(max=len(sel) - 1)] == ids
                ids, tfs, dls = ids[m], tfs[m], dls[m]
            live = _live_mask(ids, deleted)
            if live is not None:
                ids, tfs, dls = ids[live], tfs[live], dls[live]
            return ids, tfs, dls

        def block_ubs(t, r):
            imp = r.get("block_imp")
            if imp is None or isinstance(imp, float):
                return sim.score(
                    t,
                    np.asarray(r["block_maxtf"], dtype=np.int64),
                    np.asarray(r["block_mindl"], dtype=np.int64),
                ).astype(np.float64)
            lens = np.fromiter((len(x) for x in imp), np.int64, len(imp))
            flat = (
                np.concatenate([np.asarray(x, np.int64) for x in imp])
                if len(imp) else np.empty(0, np.int64)
            )
            s = sim.score(t, flat[0::2], flat[1::2]).astype(np.float64)
            starts = np.concatenate(([0], np.cumsum(lens // 2)[:-1]))
            return np.maximum.reduceat(s, starts) if len(s) else s

        _ub_cache: Dict[str, list] = {}

        def term_ubs(t):
            if t not in _ub_cache:
                _ub_cache[t] = [block_ubs(t, r) for r in rows[t]]
            return _ub_cache[t]

        def umax(t):
            return max(
                (float(u.max()) for u in term_ubs(t) if len(u)),
                default=sim.bound(
                    t,
                    max(int(r["max_tf"]) for r in rows[t]),
                    min(int(r["min_doclen"]) for r in rows[t]),
                ),
            )

        # clause bound = Σ qtf · member bound (a MUST group's getMaxScore
        # is the sum of its members' — BooleanScorerSupplier.java:288-317)
        cub = np.array(
            [sum(w * umax(t) for t, w in c.items()) for c in viable],
            dtype=np.float64,
        )

        def nblocks(t):
            return sum(len(r["block_first"]) for r in rows[t])

        def dfsum(t):
            return sum(int(r["df"]) for r in rows[t])

        def cost(c):
            # estimated blocks decoded: a term clause scans its own list; a
            # conjunction decodes its rarest member plus, for every other
            # member, at most one block per lead posting (leapfrog)
            ms = sorted(c, key=dfsum)
            return nblocks(ms[0]) + sum(
                min(nblocks(t), dfsum(ms[0])) for t in ms[1:]
            )

        # evaluation order is ASCENDING decode cost, not descending bound:
        # cheap clauses land their EXACT contributions in `acc` first, so
        # when an expensive conjunction runs last (rest == 0) the
        # per-candidate potential test compares against real partial
        # totals instead of every later clause's max — the batch analog of
        # WANDScorer's essential-list iteration, where non-essential
        # (cheap, low-bound) clauses are only ever probed on candidates
        # and the expensive clause drives. Any fixed order is SOUND (the
        # suffix bounds below are computed over it); the order only
        # changes how fast theta sharpens.
        order = sorted(range(len(viable)), key=lambda j: cost(viable[j]))
        viable = [viable[int(j)] for j in order]
        cubs = cub[np.array(order, dtype=np.int64)]
        suffix = np.concatenate((np.cumsum(cubs[::-1])[::-1], [0.0]))

        acc = np.zeros(n, dtype=np.float64)
        seen = np.zeros(n, dtype=bool)
        nmatch = np.zeros(n, dtype=np.int64) if msm > 0 else None
        nclauses = len(viable)
        theta = float(theta_seed) if theta_seed > 0 else -np.inf
        CHUNK = chunk_blocks

        def kth(vals: np.ndarray) -> float:
            return float(np.partition(vals, len(vals) - k)[len(vals) - k])

        def bump_theta(rest=0.0):
            # theta rises only from docs GUARANTEED to qualify; in cursor
            # mode additionally GUARANTEED on the page — bound strictly
            # below the cursor score, or tying it with a docid past the
            # cursor (ADVICE r6: plain <= admitted the page-1 boundary
            # tie group and could prune genuine later-page hits)
            nonlocal theta
            qual = seen if nmatch is None else seen & (nmatch >= msm)
            if after_bound is not None:
                tot = acc + rest
                qual = qual & (
                    (tot < after_bound)
                    | ((tot == after_bound)
                       & (np.arange(n, dtype=np.int64) + base > after_docid))
                )
            if int(qual.sum()) >= k:
                theta = max(theta, kth(acc[qual]))

        for i, c in enumerate(viable):
            rest = float(suffix[i + 1])
            sel: Optional[np.ndarray] = None
            sel_theta = -np.inf

            def refresh_sel():
                # same lazy competitive-candidate set as the flat path:
                # a doc outside was proven unable to reach theta even with
                # every remaining clause at its full bound
                nonlocal sel, sel_theta
                if theta <= 0 or (sel is not None and theta <= sel_theta * 1.05):
                    return
                mask = seen & (acc + suffix[i] >= theta * scale)
                if nmatch is not None:
                    # count-hopeless docs can drop outright: the remaining
                    # clauses cannot lift them to msm
                    mask &= nmatch + (nclauses - i) >= msm
                if after_bound is not None:
                    # partial sum already past the cursor: can never
                    # re-enter the page (sums only grow)
                    mask &= acc <= after_bound * slack
                sel = np.flatnonzero(mask) + base
                sel_theta = theta

            if len(c) == 1:
                ((t, w),) = c.items()
                fw = float(w)
                # once the remaining clauses (this one included) cannot
                # credit msm, blocks only matter for existing candidates
                new_docs_ok = nmatch is None or (nclauses - i) >= msm
                for r, ub in zip(rows[t], term_ubs(t)):
                    bf = np.asarray(r["block_first"], dtype=np.int64)
                    bl = np.asarray(r["block_last"], dtype=np.int64)
                    data = r["block_data"]
                    nb = len(bf)
                    ubw = ub * fw
                    border = np.argsort(-ubw, kind="stable")
                    for j in range(0, nb, CHUNK):
                        cidx = border[j : j + CHUNK]
                        if theta > 0 or not new_docs_ok:
                            refresh_sel()
                            if new_docs_ok and theta > 0:
                                keep = ubw[cidx] + rest >= theta * scale
                            elif new_docs_ok:
                                keep = np.ones(len(cidx), dtype=bool)
                            else:
                                keep = np.zeros(len(cidx), dtype=bool)
                            cand_set = sel if sel is not None else (
                                (np.flatnonzero(seen) + base)
                                if not new_docs_ok else None
                            )
                            if cand_set is not None and len(cand_set):
                                lo = np.searchsorted(cand_set, bf[cidx], "left")
                                hi2 = np.searchsorted(cand_set, bl[cidx], "right")
                                has = hi2 > lo
                                if theta > 0 and nmatch is None:
                                    # per-block candidate potential (msm
                                    # keeps the coarse test: its
                                    # candidates are kept for COUNT too)
                                    for z in np.flatnonzero(has):
                                        cmax = float(
                                            acc[cand_set[lo[z]:hi2[z]] - base].max()
                                        )
                                        if cmax + ubw[cidx[z]] + rest < theta * scale:
                                            has[z] = False
                                keep |= has
                            cidx = cidx[keep]
                        counters[1] += len(cidx)
                        if len(cidx) == 0:
                            continue
                        parts = [decode_block(bytes(data[x])) for x in cidx]
                        ids = np.concatenate([p[0] for p in parts])
                        tfs = np.concatenate([p[1] for p in parts])
                        dls = np.concatenate([p[2] for p in parts])
                        live = _live_mask(ids, deleted)
                        if live is not None:
                            ids, tfs, dls = ids[live], tfs[live], dls[live]
                        if len(ids) == 0:
                            continue
                        s = np.asarray(sim.score(t, tfs, dls), np.float64) * fw
                        acc[ids - base] += s
                        seen[ids - base] = True
                        if nmatch is not None:
                            nmatch[ids - base] += 1
                        if after_bound is None:
                            bump_theta()
            else:
                members = sorted(
                    c, key=lambda t: sum(int(r["df"]) for r in rows[t])
                )
                refresh_sel()
                essential = theta <= 0 or cubs[i] + rest >= theta * scale
                new_docs_ok = nmatch is None or (nclauses - i) >= msm
                # non-essential conjunction (or no room for new docs to
                # reach msm): only still-competitive docs can be
                # affected, so even the LEAD decode is restricted
                if essential and new_docs_ok:
                    lead_sel = None
                elif sel is not None:
                    lead_sel = sel
                else:
                    lead_sel = np.flatnonzero(seen) + base
                ids, tfs, dls = decode_term(members[0], sel=lead_sel)
                if len(ids) == 0:
                    continue
                cm = np.zeros(n, dtype=bool)
                cm[ids - base] = True
                csd = np.zeros(n, dtype=np.float64)
                csd[ids - base] = (
                    np.asarray(sim.score(members[0], tfs, dls), np.float64)
                    * float(c[members[0]])
                )
                cand = ids
                alive = True
                for mi in range(1, len(members)):
                    m = members[mi]
                    fw = float(c[m])
                    rest_m = float(
                        sum(umax(t) * c[t] for t in members[mi + 1:])
                    )
                    last = mi == len(members) - 1
                    # block-max leapfrog over the member's postings
                    # (BlockMaxConjunctionBulkScorer.java:36): blocks of ALL
                    # (term,salt) rows are chunked TOGETHER in descending
                    # upper-bound order; a block decodes only if it holds a
                    # candidate whose completed-so-far total plus this
                    # block's bound plus every remaining bound could still
                    # reach theta. On the LAST member, docs finish their
                    # clause score as chunks complete, so theta refreshes
                    # INSIDE the member walk and later (low-bound) chunks
                    # skip — the within-conjunction analog of the term
                    # path's progressive MAXSCORE windows.
                    rws = rows[m]
                    bfs = [np.asarray(r["block_first"], np.int64) for r in rws]
                    bls = [np.asarray(r["block_last"], np.int64) for r in rws]
                    ubs = term_ubs(m)
                    flat_ub = (
                        np.concatenate(ubs) * fw if ubs else np.empty(0)
                    )
                    flat_bf = np.concatenate(bfs) if bfs else np.empty(0, np.int64)
                    flat_bl = np.concatenate(bls) if bls else np.empty(0, np.int64)
                    row_of = np.concatenate(
                        [np.full(len(b), ri, np.int64) for ri, b in enumerate(bfs)]
                    ) if bfs else np.empty(0, np.int64)
                    blk_of = np.concatenate(
                        [np.arange(len(b), dtype=np.int64) for b in bfs]
                    ) if bfs else np.empty(0, np.int64)
                    nb = len(flat_bf)
                    border = np.argsort(-flat_ub, kind="stable")
                    nm = np.zeros(n, dtype=bool)
                    done = np.zeros(n, dtype=bool) if last else None
                    for j in range(0, nb, CHUNK):
                        cidx = border[j : j + CHUNK]
                        lo = np.searchsorted(cand, flat_bf[cidx], "left")
                        hi2 = np.searchsorted(cand, flat_bl[cidx], "right")
                        has = hi2 > lo
                        if theta > 0:
                            for z in np.flatnonzero(has):
                                within = cand[lo[z]:hi2[z]] - base
                                pmax = float((acc[within] + csd[within]).max())
                                if (pmax + flat_ub[cidx[z]] + rest_m + rest
                                        < theta * scale):
                                    has[z] = False
                        cidx = cidx[has]
                        counters[1] += len(cidx)
                        if len(cidx) == 0:
                            continue
                        parts = [
                            decode_block(
                                bytes(rws[row_of[x]]["block_data"][blk_of[x]])
                            )
                            for x in cidx
                        ]
                        ids2 = np.concatenate([p[0] for p in parts])
                        tf2 = np.concatenate([p[1] for p in parts])
                        dl2 = np.concatenate([p[2] for p in parts])
                        inc = (
                            cand[np.searchsorted(cand, ids2).clip(max=len(cand) - 1)]
                            == ids2
                        )
                        ids2, tf2, dl2 = ids2[inc], tf2[inc], dl2[inc]
                        live = _live_mask(ids2, deleted)
                        if live is not None:
                            ids2, tf2, dl2 = ids2[live], tf2[live], dl2[live]
                        if len(ids2) == 0:
                            continue
                        nm[ids2 - base] = True
                        csd[ids2 - base] += (
                            np.asarray(sim.score(m, tf2, dl2), np.float64) * fw
                        )
                        if last and after_bound is None:
                            done[ids2 - base] = True
                            # full-clause matches: acc + csd are exact
                            # partial totals — but only docs GUARANTEED
                            # to qualify (count after this clause >= msm)
                            # may raise theta
                            dq = done if nmatch is None else (
                                done & (nmatch + 1 >= msm)
                            )
                            if int(dq.sum()) >= k:
                                theta = max(theta, kth((acc + csd)[dq]))
                    cm &= nm
                    if not cm.any():
                        alive = False
                        break
                    cand = np.flatnonzero(cm) + base
                if alive:
                    idx = np.flatnonzero(cm)
                    if len(idx):
                        acc[idx] += csd[idx]
                        seen[idx] = True
                        if nmatch is not None:
                            nmatch[idx] += 1
                        if after_bound is None:
                            bump_theta()
            if after_bound is not None:
                # cursor mode: theta only from docs GUARANTEED at/below
                # the cursor — sound with the clause's FULL remaining
                # bound, known only at clause end (flat-path rule)
                bump_theta(rest=rest)

        if nmatch is None:
            matched = np.flatnonzero(seen) + base
        else:
            matched = np.flatnonzero(seen & (nmatch >= msm)) + base
        if len(matched) == 0:
            return _Z, _Z.astype(np.float64), counters
        final = acc[matched - base]
        if after_bound is not None:
            # keep hits strictly after the (score desc, docid asc) cursor
            ok = (final < after_bound) | (
                (final == after_bound) & (matched > after_docid)
            )
            matched, final = matched[ok], final[ok]
            if len(matched) == 0:
                return _Z, _Z.astype(np.float64), counters
        out_ids, out_sc = _select_topk(matched, final, k)
        return out_ids, out_sc, counters

    def topk_fn(key, pdf: pd.DataFrame, deleted: Optional[np.ndarray]) -> pd.DataFrame:
        ids, scores, counters = run(pdf, deleted)
        return pd.DataFrame(
            {
                "docid": ids,
                "score": scores,
                "blocks_total": np.full(len(ids), counters[0], dtype=np.int64),
                "blocks_decoded": np.full(len(ids), counters[1], dtype=np.int64),
            }
        )

    def metrics_fn(key, pdf: pd.DataFrame, deleted: Optional[np.ndarray]) -> pd.DataFrame:
        _, _, counters = run(pdf, deleted)
        return pd.DataFrame(
            {
                "segment_id": np.array([int(key[0])], dtype=np.int64),
                "blocks_total": np.array([counters[0]], dtype=np.int64),
                "blocks_decoded": np.array([counters[1]], dtype=np.int64),
            }
        )

    topk_fn.metrics_fn = metrics_fn
    return topk_fn


def _auto_seed_theta_mixed(
    index: Index,
    clauses: Sequence[Dict[str, int]],
    excluded: Sequence[str],
    weights: Dict[str, float],
    sim,
    k: int,
    quantize: bool,
    dtype,
) -> float:
    """Driver-side pruning-threshold seed for the mixed disjunction
    (MaxScoreAccumulator.java:23 analog, see auto_seed_theta): every
    clause only ADDS score, so any single TERM clause t with df(t) >= k
    yields >= k docs whose final score is at least qtf·partial(t) — a
    sound global lower bound of the k-th best. Declined when exclusions
    or deletes could remove those docs from the result set."""
    if excluded or index.has_deletes:
        return 0.0
    term_clauses = [
        (next(iter(c)), c[next(iter(c))]) for c in clauses if len(c) == 1
    ]
    if not term_clauses:
        return 0.0
    stats = index.term_stats_for([t for t, _ in term_clauses])
    avgdl = float(index.field_stats.avgdl())

    def partial(t, tfs, dls):
        if sim is not None:
            return np.asarray(sim.score(t, tfs, dls), np.float64)
        return np.asarray(
            score_arrays(tfs, dls, weights[t], avgdl, quantize, dtype), np.float64
        )

    best = 0.0
    elig = sorted(
        (stats[t][0], t, w)
        for t, w in term_clauses
        if t in weights and t in stats and stats[t][0] >= k
    )
    if elig and elig[0][0] <= AUTO_SEED_DECODE_CAP:
        _df, t, w = elig[0]
        tfs, dls = _driver_term_postings(index, t)
        if tfs is not None and len(tfs) >= k:
            s = partial(t, tfs, dls) * float(w)
            best = float(np.partition(s, len(s) - k)[len(s) - k])
    max_dl = int(getattr(index.field_stats, "max_dl", 0) or 0)
    if max_dl > 0:
        one = np.array([1], np.int64)
        dl = np.array([max_dl], np.int64)
        for _df, t, w in elig:
            best = max(best, float(partial(t, one, dl)[0]) * float(w))
    return best * PRUNE_SCALE[dtype] if best > 0.0 else 0.0


def _mixed_plan(index: Index, node, quantize: bool, dtype,
                similarity: Optional[str]):
    """Shared setup for the mixed-disjunction pruned paths: shape check,
    weight/similarity resolution, dead-clause elimination. None when the
    tree is not the supported shape; (clauses, excl, weights, sim, rows)
    when it is ((clauses=[] means provably MatchNone))."""
    from .plan import mixed_or_clauses
    from .similarities import bind_similarity

    shape = mixed_or_clauses(node)
    if shape is None:
        return None
    clauses, excl, msm = shape
    terms = sorted({t for c in clauses for t in c})
    sim = bind_similarity(
        similarity, {t: 1 for t in terms}, index.term_stats_for(terms),
        index.field_stats, 1.0, quantize, dtype,
    )
    q1 = NormalizedQuery(optional=tuple((t, 1) for t in terms))
    weights = sim.weights if sim is not None else _weights_for(index, q1, 1.0, dtype)
    live = [c for c in clauses if all(t in weights for t in c)]
    if msm > len(live):
        msm = -1  # clauses on unindexed terms can never credit msm
    all_terms = sorted({t for c in live for t in c} | set(excl))
    rows = index.postings_for(all_terms)
    return live, excl, msm, weights, sim, rows


def seed_theta_tree(
    index: Index,
    node,
    k: int = 10,
    quantize: bool = False,
    dtype=np.float64,
    similarity: Optional[str] = None,
) -> float:
    """Cross-segment threshold seed for MIXED trees (the two-job
    seed_theta analog, MaxScoreAccumulator.java:23): evaluate the single
    CHEAPEST clause alone on the pruned path — its global k-th score is a
    lower bound of the full query's k-th (clauses only add). This is the
    knob for conjunction-only trees, where the free stats-based
    _auto_seed_theta_mixed has no term clause to seed from. Declined
    (0.0) on exclusions/deletes or when the tree is not the mixed shape."""
    plan = _mixed_plan(index, node, quantize, dtype, similarity)
    if plan is None:
        return 0.0
    live, excl, msm, weights, sim, _rows = plan
    if not live or msm != 0 or excl or index.has_deletes:
        return 0.0
    stats = index.term_stats_for(sorted({t for c in live for t in c}))

    def lead_df(c):
        return min(stats.get(t, (1 << 60, 0))[0] for t in c)

    cheapest = min(live, key=lead_df)
    terms = sorted(cheapest)
    rows = index.postings_for(terms)
    fn = make_mixed_topk_fn(
        [cheapest], [], k, float(index.field_stats.avgdl()), quantize, dtype,
        sim=sim, weights=weights,
    )
    per_seg = apply_per_segment(index, rows, fn, TOPK_SCHEMA)
    out = per_seg.orderBy(F.col("score").desc(), F.col("docid").asc()).limit(k)
    vals = out.select("score").collect()
    if len(vals) < k:
        return 0.0
    return float(vals[-1]["score"]) * PRUNE_SCALE[dtype]


def search_tree_topk(
    index: Index,
    node,
    k: Optional[int] = 10,
    quantize: bool = False,
    dtype=np.float64,
    similarity: Optional[str] = None,
    with_metrics: bool = False,
    theta_seed: float = 0.0,
) -> Optional[DataFrame]:
    """Pruned top-k for MIXED single-level disjunctions like
    ``(rare AND hot) OR med`` (see make_mixed_topk_fn). Returns None when
    the tree is not the supported shape (caller falls back to the
    exhaustive search_tree) — scoring defaults are the tree path's
    (float64, unquantized), so the lowering changes the PLAN, never the
    scores."""
    if k is None:
        return None  # full materialization: pruning has nothing to prune
    plan = _mixed_plan(index, node, quantize, dtype, similarity)
    if plan is None:
        return None
    spark = index.spark
    empty = spark.createDataFrame(
        [], TOPK_SCHEMA if with_metrics else "docid long, score double"
    )
    live, excl, msm, weights, sim, rows = plan
    if not live or msm < 0:
        return empty
    if theta_seed == 0.0 and msm == 0:
        # msm restricts the qualifying set below any term clause's df, so
        # the stats-based seed is unsound there (same rule as the flat path)
        theta_seed = _auto_seed_theta_mixed(
            index, live, excl, weights, sim, k, quantize, dtype
        )
    fn = make_mixed_topk_fn(
        live, excl, k, float(index.field_stats.avgdl()), quantize, dtype,
        theta_seed=theta_seed, sim=sim, weights=weights, msm=msm,
    )
    per_seg = apply_per_segment(index, rows, fn, TOPK_SCHEMA)
    out = per_seg.orderBy(F.col("score").desc(), F.col("docid").asc()).limit(k)
    return out if with_metrics else out.select("docid", "score")


def search_tree_after(
    index: Index,
    node,
    k: int,
    after_score: float,
    after_docid: int,
    quantize: bool = False,
    dtype=np.float64,
    similarity: Optional[str] = None,
) -> DataFrame:
    """Cursor pagination for query TREES (IndexSearcher.searchAfter,
    IndexSearcher.java:587-602): mixed single-level disjunctions page on
    the PRUNED clause path (theta seeds from cursor-guaranteed docs,
    past-cursor partials stop decoding); any other tree shape falls back
    to the exhaustive evaluation filtered by the cursor."""
    plan = _mixed_plan(index, node, quantize, dtype, similarity)
    spark = index.spark
    empty = spark.createDataFrame([], "docid long, score double")
    if plan is not None:
        live, excl, msm, weights, sim, rows = plan
        if not live or msm < 0:
            return empty
        fn = make_mixed_topk_fn(
            live, excl, k, float(index.field_stats.avgdl()), quantize, dtype,
            sim=sim, weights=weights, msm=msm,
            cursor=(float(after_score), int(after_docid)),
        )
        per_seg = apply_per_segment(index, rows, fn, TOPK_SCHEMA)
        return (
            per_seg.orderBy(F.col("score").desc(), F.col("docid").asc())
            .limit(k).select("docid", "score")
        )
    full = search_tree(index, node, k=None, quantize=quantize, dtype=dtype,
                       similarity=similarity)
    cond = (F.col("score") < float(after_score)) | (
        (F.col("score") == float(after_score)) & (F.col("docid") > int(after_docid))
    )
    return (
        full.filter(cond)
        .orderBy(F.col("score").desc(), F.col("docid").asc())
        .limit(k)
    )


def tree_skip_metrics(
    index: Index,
    node,
    k: int = 10,
    quantize: bool = False,
    dtype=np.float64,
    similarity: Optional[str] = None,
    theta_seed: float = 0.0,
) -> dict:
    """block_skip_metrics for the mixed-tree pruned path: exact per-segment
    decode counters for the plan search_query would actually run."""
    plan = _mixed_plan(index, node, quantize, dtype, similarity)
    if plan is None:
        return {"blocks_total": 0, "blocks_decoded": 0, "ratio": None}
    live, excl, msm, weights, sim, rows = plan
    if not live or msm < 0:
        return {"blocks_total": 0, "blocks_decoded": 0, "ratio": None}
    if theta_seed == 0.0 and msm == 0:
        theta_seed = _auto_seed_theta_mixed(
            index, live, excl, weights, sim, k, quantize, dtype
        )
    fn = make_mixed_topk_fn(
        live, excl, k, float(index.field_stats.avgdl()), quantize, dtype,
        theta_seed=theta_seed, sim=sim, weights=weights, msm=msm,
    )
    per_seg = apply_per_segment(index, rows, fn.metrics_fn, METRICS_SCHEMA)
    row = per_seg.agg(
        F.sum("blocks_total").alias("t"), F.sum("blocks_decoded").alias("d")
    ).collect()[0]
    tot, dec = int(row["t"] or 0), int(row["d"] or 0)
    return {
        "blocks_total": tot,
        "blocks_decoded": dec,
        "ratio": (dec / tot) if tot else None,
    }


def search_query(index: Index, q, k: int = 10, **kw) -> DataFrame:
    """Dispatch parse() output: NormalizedQuery -> pruned per-segment top-k
    path; query tree -> BooleanQuery.rewrite analog first (nested
    same-occur booleans flatten, single-clause wrappers unwrap), so
    associative shapes built by hand still lower to the pruned path;
    MIXED single-level disjunctions — ``(A AND B) OR C`` — lower to the
    clause-level block-max path (search_tree_topk); only genuinely
    irregular trees take the exhaustive evaluation."""
    if isinstance(q, NormalizedQuery):
        return search_topk(index, q, k=k, **kw)
    from .plan import flatten, rewrite

    q = rewrite(q)
    flat = flatten(q)
    if flat is not None:
        # lowering must not change SCORES, only the plan: tree inputs keep
        # the tree path's scoring defaults (float64, unquantized) unless
        # the caller overrides them
        kw.setdefault("quantize", False)
        kw.setdefault("dtype", np.float64)
        return search_topk(index, flat, k=k, **kw)
    pruned = search_tree_topk(index, q, k=k, **kw)
    if pruned is not None:
        return pruned
    return search_tree(index, q, k=k, **kw)


def search_after(
    index: Index,
    q: NormalizedQuery,
    k: int,
    after_score: float,
    after_docid: int,
    **kw,
) -> DataFrame:
    """Cursor pagination (IndexSearcher.searchAfter, IndexSearcher.java:587-602):
    hits strictly after the (score desc, docid asc) cursor via the PRUNED
    per-segment path — theta seeds from cursor-guaranteed candidates and
    partial sums already past the cursor stop being decoded, so deep paging
    on a hot term does not re-decode the full posting list."""
    quantize = kw.pop("quantize", True)
    dtype = kw.pop("dtype", np.float32)
    boost = kw.pop("boost", 1.0)
    spark = index.spark
    empty = spark.createDataFrame([], "docid long, score double")
    if q.is_match_none:
        return empty
    plan = _topk_plan(index, q, boost, dtype, kw.pop("similarity", None), quantize)
    if plan is None:
        return empty
    weights, req, rows, sim = plan
    fn = make_topk_fn(
        weights, req, list(q.excluded), k, float(index.field_stats.avgdl()),
        quantize, dtype, cursor=(float(after_score), int(after_docid)),
        opt_counts=dict(q.optional), msm=q.min_should_match, sim=sim,
    )
    per_seg = apply_per_segment(index, rows, fn, TOPK_SCHEMA)
    return (
        per_seg.orderBy(F.col("score").desc(), F.col("docid").asc())
        .limit(k)
        .select("docid", "score")
    )


def search_after_exhaustive(
    index: Index,
    q: NormalizedQuery,
    k: int,
    after_score: float,
    after_docid: int,
    **kw,
) -> DataFrame:
    """Exhaustive cursor pagination (differential oracle for search_after)."""
    full = search_exhaustive(index, q, k=None, **kw)
    cond = (F.col("score") < after_score) | (
        (F.col("score") == after_score) & (F.col("docid") > after_docid)
    )
    return full.filter(cond).orderBy(F.col("score").desc(), F.col("docid").asc()).limit(k)

"""Multi-field documents: per-field postings + BM25F (CombinedFieldQuery).

Lucene's data model is per-field — each field gets its own postings, norms
and statistics (lucene/core/src/java/org/apache/lucene/index/FieldInfos.java:44,
document/FieldType.java:33). The Spark-first equivalent: one single-field
sub-index per field under ``root/fields/<name>``, all sharing the docid
space (a ``docid_col`` is required so every field assigns identical docids).
``field:term`` queries route to that field's sub-index; cross-field BM25F
runs as a DataFrame combination of the per-field postings.

CombinedFieldQuery semantics (behavior only, from
lucene/sandbox/src/java/org/apache/lucene/sandbox/search/CombinedFieldQuery.java:74-347
and MultiNormsLeafSimScorer.java:34-156):
  freq      = Σ_f weight_f · tf_f                      (float)
  norm len  = Σ_f weight_f · len_f  — in parity mode each len is the
              byte4-decoded table value and the weighted sum is re-quantized
              via intToByte4(round(.)); unquantized mode uses raw lengths
  docFreq   = max_f docFreq_f ; docCount = max_f docCount_f
  avgdl     = (Σ_f weight_f · sumTotalTermFreq_f) / docCount
  score     = BM25(idf(docFreq, docCount), freq, norm)
Field weights must be >= 1 (CombinedFieldQuery.Builder.addField:123).
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence

import numpy as np

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..functions.smallfloat import LENGTH_TABLE, int_to_byte4
from . import fsio
from .builder import IndexConfig, IndexPaths, build_index

K1, B = 1.2, 0.75


class MultiFieldIndex:
    """Per-field sub-indexes sharing one docid space.

    ``similarities`` maps field name -> similarity name — the
    PerFieldSimilarityWrapper seam (search/similarities/
    PerFieldSimilarityWrapper.java:28: ``get(field)`` picks the scorer per
    field). Persisted in fields.json; an unlisted field scores BM25, an
    explicit ``similarity=`` argument always wins."""

    def __init__(self, spark: SparkSession, root: str, fields: Dict[str, "object"],
                 similarities: Optional[Dict[str, str]] = None):
        self.spark = spark
        self.root = root
        self.fields = fields  # name -> Index
        self.similarities = dict(similarities or {})

    @classmethod
    def build(
        cls,
        spark: SparkSession,
        docs: DataFrame,
        root: str,
        field_cols: Sequence[str],
        docid_col: str,
        cfg: Optional[IndexConfig] = None,
        similarities: Optional[Dict[str, str]] = None,
    ) -> "MultiFieldIndex":
        """Index each field column of ``docs`` as its own sub-index.
        ``docid_col`` pins identical docids across fields.
        ``similarities``: per-field similarity names (validated against
        the registry; PerFieldSimilarityWrapper.java:28)."""
        from ..search.executor import Index
        from ..search.similarities import validate_similarity

        sims = {f: s for f, s in (similarities or {}).items()}
        unknown = set(sims) - set(field_cols)
        if unknown:
            raise ValueError(f"similarities for unindexed fields: {sorted(unknown)}")
        for s in sims.values():
            validate_similarity(s)
        base = cfg or IndexConfig()
        paths = IndexPaths(root)
        fsio.mkdirs(paths.fs, paths.fs_path(root))
        fields = {}
        for name in field_cols:
            from dataclasses import replace

            fcfg = replace(
                base, content_col=name, docid_col=docid_col, order_cols=(docid_col,)
            )
            fdir = f"{root}/fields/{name}"
            sub = docs.select(docid_col, name)
            fields[name] = Index(spark, build_index(spark, sub, fdir, fcfg))
        fsio.write_json_atomic(
            paths.fs,
            paths.fs_path(f"{root}/fields.json"),
            {"fields": sorted(field_cols), "docid_col": docid_col,
             "similarities": sims},
        )
        return cls(spark, root, fields, sims)

    @classmethod
    def open(cls, spark: SparkSession, root: str) -> "MultiFieldIndex":
        from ..search.executor import Index

        paths = IndexPaths(root)
        meta = fsio.read_json(paths.fs, paths.fs_path(f"{root}/fields.json"))
        fields = {n: Index.open(spark, f"{root}/fields/{n}") for n in meta["fields"]}
        return cls(spark, root, fields, meta.get("similarities"))

    def field(self, name: str):
        return self.fields[name]

    def field_similarity(self, name: str) -> Optional[str]:
        """PerFieldSimilarityWrapper.get(field) — None means BM25."""
        return self.similarities.get(name)

    def search_field(self, name: str, q, k: int = 10, **kw) -> DataFrame:
        """field:term routing — a per-field TermQuery/BooleanQuery runs
        against that field's postings and statistics only, scored under
        the field's OWN similarity unless the caller overrides."""
        from ..search.executor import search_topk

        kw.setdefault("similarity", self.similarities.get(name))
        return search_topk(self.fields[name], q, k=k, **kw)


def multi_field_topk(
    mfi: MultiFieldIndex,
    field_queries: Dict[str, "object"],
    k: int = 10,
    quantize: bool = False,
    dtype=np.float64,
) -> DataFrame:
    """Cross-field boolean query — ``title:spark OR body:join`` — where
    EACH field's clause scores under that field's own similarity
    (PerFieldSimilarityWrapper.java:28 through a BooleanQuery across
    fields: per-doc score = Σ over fields of the field clause's score).
    ``field_queries`` maps field name -> NormalizedQuery."""
    from ..search.executor import search_exhaustive

    spark = mfi.spark
    parts = []
    for name in sorted(field_queries):
        df = search_exhaustive(
            mfi.fields[name], field_queries[name], k=None,
            quantize=quantize, dtype=dtype,
            similarity=mfi.similarities.get(name),
        )
        parts.append(df.select("docid", "score"))
    if not parts:
        return spark.createDataFrame([], "docid long, score double")
    allf = parts[0]
    for p in parts[1:]:
        allf = allf.unionAll(p)
    return (
        allf.groupBy("docid").agg(F.sum("score").alias("score"))
        .orderBy(F.col("score").desc(), F.col("docid").asc())
        .limit(k)
    )


def combined_field_topk(
    mfi: MultiFieldIndex,
    terms: Sequence[str],
    weights: Dict[str, float],
    k: int = 10,
    quantize: bool = True,
    dtype=np.float32,
) -> DataFrame:
    """BM25F top-k over the pseudo combined field (CombinedFieldQuery.java:79).

    DataFrame plan: per-field decoded postings weighted + unioned, one
    groupBy(docid, term) for the combined tf, a join against the combined
    per-doc norm, then the BM25 expression — all JVM-side except the block
    decode."""
    from ..search.executor import decoded_postings

    spark = mfi.spark
    if any(w < 1 for w in weights.values()):
        raise ValueError("field weights must be >= 1 (CombinedFieldQuery.Builder)")
    nonbm = {f: s for f, s in mfi.similarities.items()
             if f in weights and s not in (None, "bm25")}
    if nonbm:
        # the reference refuses too: CombinedFieldQuery.java:174-178 throws
        # unless the searcher's similarity is BM25 (the pseudo-field freq/
        # norm composition is only defined for BM25's shape)
        raise ValueError(
            f"CombinedFieldQuery requires BM25 on every combined field; "
            f"per-field similarities set: {nonbm}"
        )
    names = sorted(weights)
    idxs = {n: mfi.fields[n] for n in names}

    # --- pseudo-field statistics
    doc_count = max(idxs[n].field_stats.doc_count for n in names)
    sum_ttf = sum(weights[n] * idxs[n].field_stats.sum_total_term_freq for n in names)
    avgdl = float(sum_ttf) / float(doc_count)
    term_df = {}
    for t in terms:
        dfs = [idxs[n].term_stats_for([t]).get(t, (0, 0))[0] for n in names]
        term_df[t] = max(dfs)
    live = [t for t in sorted(set(terms)) if term_df[t] > 0]
    if not live:
        return spark.createDataFrame([], "docid long, score double")

    def _idf(df):
        x = np.log(1.0 + (doc_count - df + 0.5) / (df + 0.5))
        return float(np.float32(x) if dtype is np.float32 else x)

    wdf = F.broadcast(
        spark.createDataFrame(
            [(t, _idf(term_df[t])) for t in live], "term string, w double"
        )
    )

    # --- combined tf: Σ_f weight_f * tf_f
    parts = []
    for n in names:
        dec = decoded_postings(idxs[n], live).select(
            "term", "docid", (F.col("tf") * F.lit(float(weights[n]))).alias("wtf")
        )
        parts.append(dec)
    allf = parts[0]
    for p in parts[1:]:
        allf = allf.unionAll(p)
    tf_comb = allf.groupBy("docid", "term").agg(F.sum("wtf").alias("freq"))

    # --- combined norm: Σ_f weight_f * len_f (per-doc), full-outer across
    # fields. Parity mode follows MultiNormsLeafSimScorer exactly: each
    # field's length is the byte4-DECODED table value, the weighted float
    # sum is rounded and RE-encoded to byte4, and scoring reads the table.
    if quantize:
        table = F.array(*[F.lit(float(x)) for x in LENGTH_TABLE])
        lencol = F.element_at(table, F.col("norm_byte") + 1)
    else:
        lencol = F.col("doclen").cast("double")
    norm = None
    for n in names:
        nf = idxs[n].norms.select(
            "docid", (lencol * F.lit(float(weights[n]))).alias(f"l_{n}")
        )
        norm = nf if norm is None else norm.join(nf, "docid", "full_outer")
    total = None
    for n in names:
        c = F.coalesce(F.col(f"l_{n}"), F.lit(0.0))
        total = c if total is None else total + c
    norm = norm.select("docid", total.alias("normlen"))
    if quantize:

        @F.pandas_udf("double")
        def requantize(s):
            import pandas as pd

            vals = np.rint(s.to_numpy(dtype=np.float64)).astype(np.int64)
            return pd.Series(LENGTH_TABLE[int_to_byte4(vals)].astype(np.float64))

        norm = norm.select("docid", requantize("normlen").alias("normlen"))

    ninv = 1.0 / (
        F.lit(K1) * (F.lit(1.0 - B) + F.lit(B) * F.col("normlen") / F.lit(avgdl))
    )
    score = F.col("w") - F.col("w") / (F.lit(1.0) + F.col("freq") * ninv)
    scored = (
        tf_comb.join(wdf, "term")
        .join(norm, "docid")
        .withColumn("s", score)
        .groupBy("docid")
        .agg(F.sum("s").alias("score"))
    )
    return scored.orderBy(F.col("score").desc(), F.col("docid").asc()).limit(k)

"""Text-analysis operators for large-scale training-data pipelines.

All operators are pure built-in pyspark.sql.functions expressions (JVM-side,
whole-stage codegen; no Python in the hot path), so they hold at 100 TB:
narrow per-row transforms, no shuffle except the final aggregations.

The default tokenization here is exact whitespace split (matching the ANSI
SQL oracle `string_split(text, ' ')`); the Lucene-grade analyzer chain from
``lucene_spark.analysis`` remains the index-build tokenizer.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from ..analysis import ENGLISH_STOP_WORDS

# deterministic marker sets for the n-gram/stopword language-ID heuristic
LANG_MARKERS = {
    "en": ["the", "of", "and", "to", "in", "is", "that", "for"],
    "de": ["der", "die", "das", "und", "nicht", "ist", "ein", "zu"],
    "fr": ["le", "la", "les", "et", "des", "est", "une", "que"],
    "es": ["el", "la", "los", "que", "de", "es", "una", "por"],
}


def tokens(text_col: str | Column = "text") -> Column:
    """Whitespace tokens, empties removed (oracle: string_split + filter)."""
    c = F.col(text_col) if isinstance(text_col, str) else text_col
    return F.filter(F.split(c, " "), lambda t: t != "")


def token_count(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Whitespace token count + a BPE-ish subword count (4-char chunks,
    ceil(len/4) per token) — both pure expressions."""
    toks = tokens(text_col)
    bpe = F.aggregate(
        toks, F.lit(0), lambda acc, t: acc + F.ceil(F.length(t) / F.lit(4.0)).cast("int")
    )
    return df.select(
        F.col("doc_id"),
        F.size(toks).cast("long").alias("n_tokens"),
        bpe.cast("long").alias("n_subwords"),
    )


def quality_score(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Heuristic quality scoring: length, mean token length, stopword ratio,
    unique-token ratio -> one [0,1]-ish score. Deterministic arithmetic."""
    toks = tokens(text_col)
    stop_arr = F.array(*[F.lit(w) for w in sorted(ENGLISH_STOP_WORDS)])
    n = F.size(toks).cast("double")
    n_stop = F.size(F.array_intersect(toks, stop_arr)).cast("double")  # distinct-stopword hits
    n_uniq = F.size(F.array_distinct(toks)).cast("double")
    mean_len = F.length(F.col(text_col)).cast("double") / F.greatest(n, F.lit(1.0))
    uniq_ratio = n_uniq / F.greatest(n, F.lit(1.0))
    len_score = F.least(n / F.lit(100.0), F.lit(1.0))
    score = F.round(
        F.lit(0.4) * len_score
        + F.lit(0.4) * uniq_ratio
        + F.lit(0.2) * F.least(mean_len / F.lit(8.0), F.lit(1.0)),
        4,
    )
    return df.select(
        F.col("doc_id"),
        F.size(toks).cast("long").alias("n_tokens"),
        n_uniq.cast("long").alias("n_unique"),
        n_stop.cast("long").alias("n_stopword_kinds"),
        F.round(uniq_ratio, 4).alias("unique_ratio"),
        score.alias("quality"),
    )


def lang_id(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Marker-word language ID: count distinct marker hits per language,
    argmax with deterministic tie-break (higher count, then lang asc)."""
    toks = F.array_distinct(tokens(text_col))
    scores = [
        F.struct(
            F.size(F.array_intersect(toks, F.array(*[F.lit(w) for w in words]))).alias("hits"),
            F.lit(lang).alias("lang"),
        )
        for lang, words in sorted(LANG_MARKERS.items())
    ]
    # argmax: sort structs by (hits desc, lang asc) == array_max on (hits, reverse-lang)?
    # deterministic: pick max hits; ties -> lexicographically smallest lang
    arr = F.array(*scores)
    best = F.aggregate(
        arr,
        F.struct(F.lit(-1).alias("hits"), F.lit("und").alias("lang")),
        lambda acc, s: F.when(
            (s["hits"] > acc["hits"]), s
        ).otherwise(acc),
    )
    return df.select(
        F.col("doc_id"),
        F.when(best["hits"] > 0, best["lang"]).otherwise(F.lit("und")).alias("pred_lang"),
        best["hits"].cast("long").alias("marker_hits"),
    )


def fingerprint(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Document fingerprint: md5 over the sorted distinct token set
    (content-defined, order-insensitive dedup key)."""
    norm = F.concat_ws(" ", F.sort_array(F.array_distinct(tokens(text_col))))
    return df.select(
        F.col("doc_id"),
        F.md5(norm).alias("fingerprint"),
        F.md5(F.col(text_col)).alias("exact_hash"),
    )

"""Spell suggestion over the term dictionary.

DirectSpellChecker analog (lucene/suggest/src/java/org/apache/lucene/
search/suggest/spell/DirectSpellChecker.java): candidates come straight
from the live term dictionary via the fuzzy (Damerau) scan — no separate
spell index — with the reference's candidate gates:

  - maxEdits <= 2 (DirectSpellChecker.java:47 maxEdits, same automaton
    seam as FuzzyQuery);
  - minPrefix = 1: candidates share the first character
    (DirectSpellChecker.java:56 — "people don't usually get the first
    letter wrong", halves the scan);
  - the query term itself (distance 0) is never suggested;
  - candidates seen in fewer docs than the misspelling are dropped when
    the misspelling exists (suggestMode MORE_POPULAR analog).

Ranking is (distance asc, df desc, term asc) — the reference orders by
normalized string similarity then docFreq (SuggestWordQueue comparator);
with integer edit distances at maxEdits <= 2 the distance bucket ordering
is identical, and df breaks ties inside a bucket. Runs as one distributed
term-dictionary scan: band + prefix prune first (Catalyst, parquet
row-group pruning on the term-sorted files), the DP only on survivors.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..functions.fuzzy import band_filter, damerau_distance_col


def spell_suggest(
    index,
    term: str,
    max_edits: int = 2,
    k: int = 5,
    min_prefix: int = 1,
    more_popular_than_query: bool = True,
) -> DataFrame:
    """Top-k correction candidates for ``term``: columns
    (term, dist, df), ordered (dist asc, df desc, term asc)."""
    if max_edits < 1:
        raise ValueError("max_edits must be >= 1")
    ts = index.term_stats.filter(band_filter(F.col("term"), term, max_edits))
    if min_prefix > 0 and len(term) >= min_prefix:
        ts = ts.filter(F.col("term").startswith(term[:min_prefix]))
    if more_popular_than_query:
        stats = index.term_stats_for([term])
        if term in stats:
            ts = ts.filter(F.col("df") > int(stats[term][0]))
    scored = ts.withColumn("dist", damerau_distance_col(F.col("term"), term))
    return (
        scored.filter((F.col("dist") <= max_edits) & (F.col("dist") > 0))
        .select("term", "dist", "df")
        .orderBy(F.col("dist").asc(), F.col("df").desc(), F.col("term").asc())
        .limit(k)
    )


def complete_prefix(
    index,
    prefix: str,
    k: int = 5,
    weight_col: str = "ttf",
) -> DataFrame:
    """Prefix completion over the live term dictionary —
    AnalyzingSuggester-lite (lucene/suggest/src/java/org/apache/lucene/
    search/suggest/analyzing/AnalyzingSuggester.java:81). The reference
    compiles (analyzed form -> surface form, weight) into an FST and walks
    the prefix; here the term-sorted stats parquet IS the sorted
    dictionary: a prefix filter prunes row groups via min/max stats (the
    FST-walk analog), then weight-ordered top-k. ``weight_col``: "ttf"
    (default — total occurrences, the closest analog of the suggester's
    corpus-derived weights) or "df". Input is lowercased like the analysis
    chain; multi-token inputs are the caller's to analyze (the reference
    analyzes inputs through the same analyzer at build and query time).

    Columns: (term, weight), ordered (weight desc, term asc)."""
    if weight_col not in ("ttf", "df"):
        raise ValueError("weight_col must be 'ttf' or 'df'")
    p = prefix.lower()
    return (
        index.term_stats.filter(F.col("term").startswith(p))
        .select("term", F.col(weight_col).alias("weight"))
        .orderBy(F.col("weight").desc(), F.col("term").asc())
        .limit(k)
    )


def complete_fuzzy(
    index,
    prefix: str,
    k: int = 5,
    max_edits: int = 1,
    non_fuzzy_prefix: int = 1,
    min_fuzzy_length: int = 3,
    weight_col: str = "ttf",
) -> DataFrame:
    """Fuzzy completion — FuzzySuggester analog (lucene/suggest/src/java/
    org/apache/lucene/search/suggest/analyzing/FuzzySuggester.java:60):
    completions whose PREFIX is within ``max_edits`` Levenshtein edits of
    the typed input. The reference intersects a Levenshtein automaton with
    the suggest FST; over the term-sorted dictionary parquet the same
    predicate is a pure-JVM expression — min over the prefix-length window
    [len(p)-e, len(p)+e] of levenshtein(term[:L], input) — evaluated in a
    vocabulary-sized scan (never a corpus scan). Reference defaults kept:
    maxEdits=1, nonFuzzyPrefix=1 (the leading chars must match exactly —
    which here also restores term-sorted ROW-GROUP PRUNING via a range
    filter), minFuzzyLength=3 (shorter inputs complete exactly).
    Departure: plain Levenshtein only (the reference defaults
    transpositions=true; Spark's builtin has no Damerau variant), so a
    transposed typo costs 2 edits instead of 1."""
    if weight_col not in ("ttf", "df"):
        raise ValueError("weight_col must be 'ttf' or 'df'")
    if max_edits < 0 or max_edits > 2:
        raise ValueError("max_edits in [0, 2] (LevenshteinAutomata bound)")
    p = prefix.lower()
    if len(p) < min_fuzzy_length or max_edits == 0:
        return complete_prefix(index, p, k, weight_col)
    lens = range(max(1, len(p) - max_edits), len(p) + max_edits + 1)
    dist = F.array_min(F.array(*[
        F.levenshtein(F.substring(F.col("term"), 1, L), F.lit(p)) for L in lens
    ]))
    src = index.term_stats
    nfp = max(0, int(non_fuzzy_prefix))
    if nfp > 0:
        # exact-prefix gate + sorted-dictionary range for row-group pruning
        src = src.filter(F.col("term").startswith(p[:nfp]))
    return (
        src.filter(dist <= max_edits)
        .select("term", F.col(weight_col).alias("weight"))
        .orderBy(F.col("weight").desc(), F.col("term").asc())
        .limit(k)
    )


def complete_infix(
    index,
    fragment: str,
    k: int = 5,
    weight_col: str = "ttf",
) -> DataFrame:
    """Infix completion — AnalyzingInfixSuggester analog
    (lucene/suggest/src/java/org/apache/lucene/search/suggest/analyzing/
    AnalyzingInfixSuggester.java:92): suggestions may match the query
    fragment ANYWHERE in the term, not just as a prefix. The reference
    indexes suggestion n-grams and searches them; over a dictionary-sized
    term table the same result is one distributed contains-filter on the
    term stats (no row-group pruning is possible for infix — the
    reference pays the same with its EdgeNGram index, which is why it
    maintains a dedicated suggest index; at dictionary scale this is a
    vocabulary-sized scan, NOT a corpus scan). PREFIX matches rank before
    pure-infix matches at equal weight, like the reference's
    blender-type PREFIX preference.

    Columns: (term, weight, is_prefix), ordered
    (weight desc, is_prefix desc, term asc)."""
    if weight_col not in ("ttf", "df"):
        raise ValueError("weight_col must be 'ttf' or 'df'")
    fragment = fragment.lower()
    return (
        index.term_stats.filter(F.col("term").contains(fragment))
        .select(
            "term",
            F.col(weight_col).alias("weight"),
            F.col("term").startswith(fragment).alias("is_prefix"),
        )
        .orderBy(
            F.col("weight").desc(), F.col("is_prefix").desc(),
            F.col("term").asc(),
        )
        .limit(k)
    )

# stupid-backoff smoothing constant (FreeTextSuggester.java:126)
FREETEXT_ALPHA = 0.4


def freetext_counts(docs, text_col: str = "text", grams: int = 2):
    """N-gram counts for the FreeTextSuggester analog
    (suggest/analyzing/FreeTextSuggester.java:83-137): the reference
    shingles the analyzed corpus and compiles weighted grams into an FST;
    here the same counts are one groupBy per order over the tokenized
    corpus — a DataFrame the caller can persist/write as the model.
    Tokenization is lowercase whitespace (completion should predict
    stopwords too, so no stop filtering). Returns (context, word, cnt)
    with context = the preceding order-1 words joined by spaces ('' for
    unigrams)."""
    if grams < 1 or grams > 3:
        raise ValueError("grams in [1, 3]")
    arr = F.filter(F.split(F.lower(F.col(text_col)), " +"), lambda t: t != "")
    docs = docs.select(arr.alias("__toks__"))
    parts = [
        docs.select(F.explode("__toks__").alias("word"))
        .groupBy("word").agg(F.count("*").alias("cnt"))
        .select(F.lit("").alias("context"), "word", "cnt")
    ]
    for n in range(2, grams + 1):
        ng = docs.select(
            F.explode(
                F.transform(
                    F.sequence(F.lit(1), F.greatest(F.size("__toks__") - (n - 1), F.lit(0))),
                    lambda i: F.struct(
                        F.array_join(F.slice("__toks__", i, n - 1), " ").alias("context"),
                        F.element_at("__toks__", i + (n - 1)).alias("word"),
                    ),
                )
            ).alias("g")
        )
        parts.append(
            ng.select("g.context", "g.word").groupBy("context", "word")
            .agg(F.count("*").alias("cnt"))
        )
    out = parts[0]
    for p_ in parts[1:]:
        out = out.unionByName(p_)
    return out


def free_text_suggest(
    counts,
    text: str,
    k: int = 5,
    grams: int = 2,
) -> DataFrame:
    """Predict the next word (input ends with a space) or complete the
    trailing partial word, scored by the stupid-backoff ngram model
    ("Large Language Models in Machine Translation", Brants et al. 2007;
    FreeTextSuggester.java:93-126): the highest order whose context count
    exists supplies cnt(ctx, w)/cnt(ctx), each backoff step multiplying by
    ALPHA=0.4 down to the unigram cnt(w)/total. grams=2 here (the
    reference default): score = bigram ratio when the (context, w) bigram
    occurs, else ALPHA * unigram ratio. Returns (word, score)."""
    if grams != 2:
        raise ValueError("free_text_suggest supports grams=2 (reference default)")
    toks = [t for t in text.lower().split(" ") if t]
    if not toks:
        raise ValueError("empty input")
    if text.endswith(" "):
        context, prefix = toks[-1], ""
    else:
        if len(toks) < 2:
            context, prefix = None, toks[-1]
        else:
            context, prefix = toks[-2], toks[-1]
    uni = counts.filter(F.col("context") == "").select(
        "word", F.col("cnt").alias("c1")
    )
    total = uni.agg(F.sum("c1")).first()[0]
    cand = uni
    if prefix:
        cand = cand.filter(F.col("word").startswith(prefix))
    if context is None:
        scored = cand.select(
            "word", (F.col("c1").cast("double") / F.lit(float(total))).alias("score")
        )
    else:
        big = counts.filter(F.col("context") == context).select(
            "word", F.col("cnt").alias("c2")
        )
        ctx_cnt = uni.filter(F.col("word") == context).select("c1").first()
        ctx_total = float(ctx_cnt["c1"]) if ctx_cnt else 0.0
        scored = cand.join(big, "word", "left").select(
            "word",
            F.when(
                F.col("c2").isNotNull() & F.lit(ctx_total > 0),
                F.col("c2").cast("double") / F.lit(ctx_total if ctx_total else 1.0),
            ).otherwise(
                F.lit(FREETEXT_ALPHA) * F.col("c1").cast("double") / F.lit(float(total))
            ).alias("score"),
        )
    return scored.orderBy(F.col("score").desc(), F.col("word").asc()).limit(k)

def word_break_suggest(
    index,
    term: str,
    k: int = 5,
    min_suggestion_frequency: int = 1,
    min_breakword_length: int = 1,
) -> DataFrame:
    """WordBreakSpellChecker.suggestWordBreaks analog (suggest/spell/
    WordBreakSpellChecker.java:74-146, maxChanges=1 — one break): split a
    run-together term ("hashjoin") at every position where BOTH halves are
    dictionary terms with df >= minSuggestionFrequency. One vocabulary
    lookup over the <= 2*(len-1) candidate substrings (term-sorted stats
    parquet, isin pushdown); the split enumeration is driver-side string
    work. Ranked like the reference's default SuggestMode: higher combined
    frequency first (sum of both halves' df), then left term asc.
    Columns: (left, right, freq)."""
    t = term.lower()
    cands = []
    for i in range(max(1, min_breakword_length),
                   len(t) - max(1, min_breakword_length) + 1):
        cands.append((t[:i], t[i:]))
    if not cands:
        return index.spark.createDataFrame([], "left string, right string, freq long")
    subs = sorted({w for pair in cands for w in pair})
    stats = index.term_stats_for(subs)
    rows = []
    for lft, rgt in cands:
        dl = stats.get(lft, (0, 0))[0]
        dr = stats.get(rgt, (0, 0))[0]
        if dl >= min_suggestion_frequency and dr >= min_suggestion_frequency:
            rows.append((lft, rgt, int(dl + dr)))
    rows.sort(key=lambda r: (-r[2], r[0]))
    return index.spark.createDataFrame(
        rows[:k] or [], "left string, right string, freq long"
    )


def word_combine_suggest(
    index,
    terms,
    k: int = 5,
    min_suggestion_frequency: int = 1,
) -> DataFrame:
    """WordBreakSpellChecker.suggestWordCombinations analog
    (WordBreakSpellChecker.java:148-215, maxChanges=1 — adjacent pairs
    only): for each adjacent pair in ``terms``, suggest the concatenation
    when it is a dictionary term with df >= minSuggestionFrequency.
    Columns: (pos, combined, freq) — pos = index of the pair's first word."""
    toks = [t.lower() for t in terms]
    pairs = [(i, toks[i] + toks[i + 1]) for i in range(len(toks) - 1)]
    if not pairs:
        return index.spark.createDataFrame([], "pos int, combined string, freq long")
    stats = index.term_stats_for(sorted({w for _, w in pairs}))
    rows = [
        (i, w, int(stats[w][0]))
        for i, w in pairs
        if w in stats and stats[w][0] >= min_suggestion_frequency
    ]
    rows.sort(key=lambda r: (-r[2], r[0]))
    return index.spark.createDataFrame(
        rows[:k] or [], "pos int, combined string, freq long"
    )


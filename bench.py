#!/usr/bin/env python
"""Benchmark: index-build throughput + top-k query latency.

Prints ONE JSON line:
  {"metric": "index_build_seconds", "value": <build sec>, "unit": "sec",
   "queries": {<name>: <sec>, ...}, "sf": <sf>,
   "docs_per_sec": ..., "n_docs": ..., "blocks_decoded_ratio": ...}

Env:
  SPARK_GRAFT_SF_DIR   parquet dir for the query corpus (default sf0.1)
  SPARK_GRAFT_CPUS     local[] parallelism (default 32)
  BENCH_DOCS           synthetic source-code corpus size for the build
                       throughput measurement (default 20000)
"""

from __future__ import annotations

import json
import os
import shutil
import time

import numpy as np


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    n_docs = int(os.environ.get("BENCH_DOCS", "100000"))


    from pyspark.sql import functions as F

    from lucene_spark.index.builder import IndexConfig, build_index
    from lucene_spark.search.executor import Index, search_topk
    from lucene_spark.search.plan import normalize
    from lucene_spark.session import get_spark

    spark = get_spark("bench", master=f"local[{cpus}]", shuffle_partitions=cpus)

    # --- index-build throughput over the synthetic source-code corpus.
    # min over repeats: this host's page-fault behavior drifts hour to hour
    # (see BENCH/BASELINE.md host-ceiling controls), single runs mislead.
    # Reps are INTERLEAVED with a fixed-work single-process control
    # (byte-identical python/numpy job) so a contended window is visible in
    # this JSON itself (VERDICT r3 wrong#5): when the control drifts, the
    # build numbers from the same window are weather, not the engine.
    repeats = int(os.environ.get("BENCH_REPEATS", "3"))
    scratch = os.environ.get("BENCH_SCRATCH", "/dev/shm/lucene_spark_bench")
    build_dir = f"{scratch}/build_{cpus}_{n_docs}"
    # materialize the input corpus as a parquet table OUTSIDE the timed
    # window (the real input is an Iceberg/parquet table, not driver RAM)
    from lucene_spark.corpus import corpus_spark_df_dist

    corpus_path = f"{scratch}/corpus_{n_docs}"
    if not os.path.exists(os.path.join(corpus_path, "_SUCCESS")):
        corpus_spark_df_dist(spark, n_docs, seed=42, num_partitions=max(cpus, 8)).write.mode(
            "overwrite"
        ).parquet(corpus_path)
    docs = spark.read.parquet(corpus_path)
    cfg = IndexConfig(num_segments=max(cpus, n_docs // 25000),
                      hot_df_threshold=max(200, n_docs // 20),
                      merge_bucket_segments=max(2, cpus // 8))

    def fixed_work_control() -> float:
        """Deterministic single-process job (tokenize + invert 3k docs in
        pure python/numpy): identical bytes every call, so its wall time
        measures the HOST, not the engine."""
        from lucene_spark.corpus import make_corpus
        from lucene_spark.pyref import build_ref_index

        t0 = time.perf_counter()
        rows = make_corpus(3000, seed=123)
        build_ref_index([(i, r[4]) for i, r in enumerate(rows)])
        return round(time.perf_counter() - t0, 3)

    # one UNTIMED warmup build first: JVM codegen + page-cache first-touch
    # dominate the first rep (observed 24.9 -> 12.7 -> 8.7 s with a flat
    # control — warmup, not weather); timed reps start from a warm state
    shutil.rmtree(build_dir, ignore_errors=True)
    t0 = time.perf_counter()
    build_index(spark, docs, build_dir, cfg)
    warmup_sec = round(time.perf_counter() - t0, 3)

    build_reps, control_secs = [], []
    for _ in range(max(1, repeats)):
        control_secs.append(fixed_work_control())
        shutil.rmtree(build_dir, ignore_errors=True)
        t0 = time.perf_counter()
        build_index(spark, docs, build_dir, cfg)
        build_reps.append(round(time.perf_counter() - t0, 3))
    control_secs.append(fixed_work_control())
    build_sec = min(build_reps)
    contended = (
        max(control_secs) / min(control_secs) > 1.5
        or max(build_reps) / min(build_reps) > 1.5
    )

    # --- query latency over the sf corpus (documents.parquet)
    import __spark_entry__ as entry

    idx_docs = entry._index(spark, sf_dir)
    bench_queries = {
        "q_term_hot": normalize(should=["spark"]),
        "q_term_rare": normalize(should=["vector"]),
        "q_and3": normalize(must=["window", "stream", "hash"]),
        "q_or3": normalize(should=["join", "merge", "scan"]),
        "q_free_text": normalize(should=["spark", "join", "window", "table"]),
        "q_not": normalize(should=["spark"], must_not=["join"]),
        "q_qtf": normalize(should=["spark", "spark", "join"]),
        "q_msm2_or4": normalize(
            should=["join", "merge", "scan", "window"], min_should_match=2
        ),
    }
    # warm the JVM/readers once
    search_topk(idx_docs, bench_queries["q_term_rare"], k=10).collect()

    q_secs = {}

    def t_min(fn, reps: int = 2) -> float:
        """Min over reps: short single jobs on this host hit sporadic
        100x first-touch page-fault spikes (BENCH/BASELINE.md); min of 2
        is the reproducible number, matching the build-rep policy."""
        best = None
        for _ in range(max(1, reps)):
            t0 = time.perf_counter()
            fn()
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        return round(best, 4)

    for name, q in bench_queries.items():
        q_secs[name] = t_min(lambda q=q: search_topk(idx_docs, q, k=10).collect())

    # round-4 operators: spell suggestion, highlighting, scored intervals
    from lucene_spark.search.highlight import highlight_topk
    from lucene_spark.search.intervals import IOrdered, ITerm, interval_topk
    from lucene_spark.search.suggest import spell_suggest

    q_secs["spell_suggest"] = t_min(
        lambda: spell_suggest(idx_docs, "tabel", max_edits=2, k=5).collect())
    q_secs["highlight_top10"] = t_min(
        lambda: highlight_topk(idx_docs, normalize(should=["spark", "join"]),
                               k=10, width=15).collect())
    q_secs["interval_topk"] = t_min(
        lambda: interval_topk(
            idx_docs, IOrdered((ITerm("spark"), ITerm("join")), max_gaps=4), k=10
        ).collect())

    # --- block-skip effectiveness at a 1M-doc index (VERDICT r2 #4: the
    # payoff only shows when posting lists span many blocks per SEGMENT; at
    # 100k docs a hot term has ~4 blocks/segment and every block holds a
    # candidate). Term picks are deterministic: the corpus generator is
    # seed-pinned and ties break on (df, term). Exact per-segment counters.
    from lucene_spark.search.executor import Index, block_skip_metrics

    skip_docs = int(os.environ.get("BENCH_SKIP_DOCS", "1000000"))
    skip_dir = f"{scratch}/build_{cpus}_{skip_docs}"
    skip_corpus = f"{scratch}/corpus_{skip_docs}"
    if not os.path.exists(os.path.join(skip_corpus, "_SUCCESS")):
        corpus_spark_df_dist(spark, skip_docs, seed=42, num_partitions=max(cpus, 8)).write.mode(
            "overwrite"
        ).parquet(skip_corpus)
    big_cfg = IndexConfig(num_segments=max(cpus, skip_docs // 25000),
                          hot_df_threshold=max(200, skip_docs // 20),
                          merge_bucket_segments=max(2, cpus // 8))
    shutil.rmtree(skip_dir, ignore_errors=True)
    t0 = time.perf_counter()
    build_index(spark, spark.read.parquet(skip_corpus), skip_dir, big_cfg)
    big_build_sec = round(time.perf_counter() - t0, 3)

    build_idx = Index.open(spark, skip_dir)
    n_seg = int(big_cfg.num_segments)
    K = 10

    def pick(df_lo, df_hi):
        """Deterministic term pick: largest df in [lo, hi], ties on term
        (corpus is seed-pinned, so the pick is stable across runs/hosts)."""
        r = (
            build_idx.term_stats.filter(f"df BETWEEN {df_lo} AND {df_hi}")
            .orderBy(F.desc("df"), "term").limit(1).collect()
        )
        return r[0]["term"] if r else None

    # ultrarare: df/segment < k — theta can NEVER seed from the rare side
    # (fewer rare docs per segment than the collector needs), so MAXSCORE
    # legitimately decodes most of the hot list; reported as its own row,
    # not the headline (Lucene's MAXSCORE degenerates identically: the hot
    # term stays essential until theta > its max score, unreachable here).
    ultrarare = pick(20, 200)
    # rare-but-seedable: df/segment >= 2k, so the rare term's k-th actual
    # score seeds theta ABOVE the hot term's block upper bounds before the
    # hot list is touched (Lucene nightly OrHighLow analog).
    rare = pick(2 * K * n_seg, 6 * K * n_seg)
    # mid-frequency (OrHighMed analog)
    med = pick(skip_docs // 1000, skip_docs // 250)
    ratios = {}

    def shape(name, q):
        q_secs[f"q1m_{name}"] = t_min(
            lambda: search_topk(build_idx, q, k=K).collect())
        m = block_skip_metrics(build_idx, q, k=K)
        ratios[name] = round(m["ratio"], 4) if m["ratio"] is not None else None

    def shape_seeded(name, q):
        # cross-segment theta seeding (MaxScoreAccumulator analog,
        # search/MaxScoreAccumulator.java:23): one cheap rarest-term pass
        # seeds every segment's threshold; decode ratio should only drop.
        # Since r4's auto-seed the DEFAULT path already seeds driver-side
        # (identical ratios below) — these rows keep the EXPLICIT
        # seed_theta() path exercised and show its extra job's fixed cost
        from lucene_spark.search.executor import seed_theta

        def run_seeded():
            seed = seed_theta(build_idx, q, k=K)
            search_topk(build_idx, q, k=K, theta_seed=seed).collect()

        q_secs[f"q1m_{name}_seeded"] = t_min(run_seeded)
        seed = seed_theta(build_idx, q, k=K)
        m = block_skip_metrics(build_idx, q, k=K, theta_seed=seed)
        ratios[f"{name}_seeded"] = (
            round(m["ratio"], 4) if m["ratio"] is not None else None
        )

    if ultrarare:
        # BlockMaxConjunction shape: rare lead restricts the hot term's
        # decode to candidate blocks
        shape("and_rare_hot", normalize(must=[ultrarare, "import"]))
        shape("or_ultrarare_hot", normalize(should=[ultrarare, "import"]))
        shape_seeded("or_ultrarare_hot", normalize(should=[ultrarare, "import"]))
    if rare:
        shape("or_rare_hot", normalize(should=[rare, "import"]))
        shape_seeded("or_rare_hot", normalize(should=[rare, "import"]))
    if med:
        shape("or_med_hot", normalize(should=[med, "import"]))
        shape_seeded("or_med_hot", normalize(should=[med, "import"]))
    if rare and med:
        # mixed boolean tree "(rare AND hot) OR med" — since r6 this
        # lowers to the clause-level block-max path (search_tree_topk:
        # WAND over pseudo-scorers, BooleanScorerSupplier.java:288-317
        # analog) instead of the exhaustive DataFrame walk: the
        # conjunction leads with its rare member so the hot list decodes
        # only candidate blocks, and the med term clause seeds/obeys
        # theta like a flat OR. Ratio row proves the pruning is live.
        from lucene_spark.search.executor import search_query, tree_skip_metrics
        from lucene_spark.search.plan import MUST, QBool, QTerm, SHOULD

        tree = QBool((
            (SHOULD, QBool(((MUST, QTerm(rare)), (MUST, QTerm("import"))))),
            (SHOULD, QTerm(med)),
        ))
        q_secs["q1m_tree_mixed"] = t_min(
            lambda: search_query(build_idx, tree, k=K).collect())
        m = tree_skip_metrics(build_idx, tree, k=K)
        ratios["tree_mixed"] = (
            round(m["ratio"], 4) if m["ratio"] is not None else None
        )
        # conjunction-only mixed tree: no term clause for the free auto
        # seed, so the per-segment theta works alone (default row) vs the
        # explicit two-job clause seed (seed_theta_tree)
        from lucene_spark.search.executor import search_tree_topk, seed_theta_tree

        tree2 = QBool((
            (SHOULD, QBool(((MUST, QTerm(rare)), (MUST, QTerm("import"))))),
            (SHOULD, QBool(((MUST, QTerm(med)), (MUST, QTerm("import"))))),
        ))
        q_secs["q1m_tree_conjconj"] = t_min(
            lambda: search_tree_topk(build_idx, tree2, k=K).collect())
        m = tree_skip_metrics(build_idx, tree2, k=K)
        ratios["tree_conjconj"] = (
            round(m["ratio"], 4) if m["ratio"] is not None else None
        )
        seed2 = seed_theta_tree(build_idx, tree2, k=K)
        m = tree_skip_metrics(build_idx, tree2, k=K, theta_seed=seed2)
        ratios["tree_conjconj_seeded"] = (
            round(m["ratio"], 4) if m["ratio"] is not None else None
        )
    if rare:
        # pluggable-similarity pruning on the same shape: DFR prunes like
        # BM25 (bounded tf saturation); Classic's unbounded sqrt(tf) keeps
        # the hot term competitive so decode stays near-full — semantically
        # correct (the reference's MAXSCORE degenerates identically under
        # TFIDF), reported as evidence that the seam's bounds are live
        q_sim = normalize(should=[rare, "import"])
        for sim in ("classic", "dfr_ine_l_h2"):
            m = block_skip_metrics(build_idx, q_sim, k=K, similarity=sim)
            ratios[f"or_rare_hot_{sim}"] = (
                round(m["ratio"], 4) if m["ratio"] is not None else None
            )
    ratio = ratios.get("and_rare_hot")

    # --- round-5 operators over the sf corpus (positions + offsets index,
    # build cached outside the timed window)
    offs_idx = entry._offs_index(spark, sf_dir)
    # repeating-term sloppy phrase ("spark X spark", hot term repeated):
    # the batched rptGroups micro-step walk (no per-candidate-doc Python)
    from lucene_spark.search.executor import search_phrase

    q_secs["q_sloppy_rpt_phrase"] = t_min(
        lambda: search_phrase(
            offs_idx, [("spark", 0), ("join", 1), ("spark", 2)], slop=3, k=K
        ).collect())
    # sentence-snapped passage highlighting from the offsets stream
    from lucene_spark.search.highlight import passage_highlight_topk

    q_secs["passage_highlight_top10"] = t_min(
        lambda: passage_highlight_topk(
            offs_idx, normalize(should=["spark", "join"]), k=10,
            source="postings"
        ).collect())

    # --- percolator at 10k stored queries: the term-partitioned pre-filter
    # (one equi-join + one agg) vs broadcast cross-evaluation.
    # NOTE on absolute times: the synthetic corpus draws from a 20-word
    # vocabulary, so EVERY stored-query term is stopword-hot — the
    # term-share join legitimately yields ~1e9 candidate pairs (the tree
    # form emits 30M match rows). The plans scale in matching-pair count;
    # a real vocabulary makes the same shapes orders of magnitude cheaper.
    from lucene_spark.streaming import percolate_batch, percolate_prefiltered

    words = ["spark", "join", "window", "table", "hash", "scan", "merge",
             "filter", "sort", "group", "stream", "batch", "query", "value",
             "order", "column", "line", "key", "agg", "part"]
    nq = int(os.environ.get("BENCH_PERCOLATE_QUERIES", "10000"))
    V = len(words)
    qrows = [
        (i, [words[i % V], words[(i * 7 + 1) % V], words[(i * 13 + 2) % V]], 2)
        for i in range(nq)
    ]
    qdf = spark.createDataFrame(qrows, "qid int, terms array<string>, min_match int")
    doc_df = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    t0 = time.perf_counter()
    n_pref = percolate_prefiltered(doc_df, qdf).count()
    q_secs[f"percolate_{nq//1000}k_prefiltered"] = round(time.perf_counter() - t0, 4)
    # full-shape percolation (min_match + NOT + exact phrase, all shuffle
    # joins) at the SAME 10k stored-query scale — the headline form scales
    # in sigma-terms, not docs x queries (VERDICT r4 weak#4)
    from lucene_spark.streaming import percolate_full

    full_rows = [
        (i, terms, mm,
         [words[(i * 3 + 5) % V]] if i % 5 == 0 else [],
         [words[i % V], words[(i * 7 + 1) % V]] if i % 7 == 0 else [])
        for (i, terms, mm) in qrows
    ]
    qdf_full = spark.createDataFrame(
        full_rows,
        "qid int, terms array<string>, min_match int, "
        "not_terms array<string>, phrase array<string>",
    )
    t0 = time.perf_counter()
    percolate_full(doc_df, qdf_full).count()
    q_secs[f"percolate_{nq//1000}k_full"] = round(time.perf_counter() - t0, 4)
    # arbitrary-query percolation: 10k STRING queries (nested boolean +
    # NOT + phrase + prefix shapes) through decompose + the join legs
    from lucene_spark.streaming import percolate_tree

    tree_q = [
        (i, f"({words[i % V]} OR {words[(i * 7 + 1) % V]}) "
            f"AND {words[(i * 13 + 2) % V]}"
            + (f" -{words[(i * 3 + 5) % V]}" if i % 5 == 0 else "")
            + (f" AND {words[(i * 11 + 3) % V][:4]}*" if i % 9 == 0 else ""))
        for i in range(nq)
    ]
    t0 = time.perf_counter()
    percolate_tree(doc_df, tree_q).count()
    q_secs[f"percolate_{nq//1000}k_tree"] = round(time.perf_counter() - t0, 4)
    # crossJoin broadcast form: kept ONLY as a tiny-set comparison row
    # (<=200 queries) — it is the O(docs x queries) baseline the
    # prefiltered plan replaces, not a headline (VERDICT r4 weak#1)
    nq_bc = min(nq, 200)
    qdf_bc = spark.createDataFrame(qrows[:nq_bc], "qid int, terms array<string>, min_match int")
    t0 = time.perf_counter()
    n_bc = percolate_batch(doc_df, qdf_bc).count()
    q_secs[f"percolate_{nq_bc}q_broadcast"] = round(time.perf_counter() - t0, 4)
    t0 = time.perf_counter()
    n_pref_bc = percolate_prefiltered(doc_df, qdf_bc).count()
    q_secs[f"percolate_{nq_bc}q_prefiltered"] = round(time.perf_counter() - t0, 4)
    assert n_pref_bc == n_bc, (n_pref_bc, n_bc)

    # --- persisted ANN index: bucket-partitioned parquet vs per-query
    # expression recompute; the probe reads ONLY the probed bucket dirs
    from lucene_spark.pipeline.similarity import (
        ann_index_topk, build_ann_index, cosine_topk_lsh_multiprobe, probe_buckets,
    )

    emb = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
    ann_dir = f"{scratch}/ann_idx_{sf_dir.strip('/').replace('/', '_')}"
    if not os.path.exists(os.path.join(ann_dir, "_SUCCESS")):
        build_ann_index(emb, ann_dir, dim=64, n_planes=8, seed=42)
    qv = [float(x) for x in emb.orderBy("vec_id").limit(1).collect()[0]["embedding"]]
    q_secs["ann_persisted_probe"] = t_min(
        lambda: ann_index_topk(spark, ann_dir, qv, k=10, dim=64, n_planes=8,
                               probe_bits=1).collect())
    q_secs["ann_expr_recompute"] = t_min(
        lambda: cosine_topk_lsh_multiprobe(emb, qv, k=10, n_planes=8,
                                           probe_bits=1).collect())
    probes = probe_buckets(qv, dim=64, n_planes=8, seed=42, probe_bits=1)
    n_dirs = len([e for e in os.listdir(ann_dir) if e.startswith("bucket=")])
    ann_partitions = f"{min(len(probes), n_dirs)}/{n_dirs}"

    # --- sharded HNSW graph search (one graph per shard, parallel per-leaf
    # top-k; build cached outside the timed window)
    from lucene_spark.pipeline.hnsw import build_hnsw_index, hnsw_index_topk

    hnsw_dir = f"{scratch}/hnsw_idx_{sf_dir.strip('/').replace('/', '_')}_v2"
    if not os.path.exists(os.path.join(hnsw_dir, "manifest.json")):
        build_hnsw_index(emb, hnsw_dir, dim=64, M=12, ef_construction=80,
                         num_shards=8, seed=42)
    q_secs["ann_hnsw_probe"] = t_min(
        lambda: hnsw_index_topk(spark, hnsw_dir, qv, k=10, ef_search=64).collect())

    # --- HNSW construction throughput (VERDICT r5 wrong#3: publish
    # vectors/sec): single-shard in-process build over synthetic 64-dim
    # vectors — the per-task cost the sharded layout parallelizes
    from lucene_spark.pipeline.hnsw import hnsw_build

    HNSW_BUILD_N = int(os.environ.get("BENCH_HNSW_VECS", "20000"))
    _hv = np.random.default_rng(7).standard_normal(
        (HNSW_BUILD_N, 64)
    ).astype(np.float32)
    t0 = time.perf_counter()
    hnsw_build(_hv, M=12, ef_construction=80, seed=1)
    hnsw_build_sec = time.perf_counter() - t0
    q_secs["hnsw_build_20k_1shard"] = round(hnsw_build_sec, 3)
    hnsw_vecs_per_sec = round(HNSW_BUILD_N / hnsw_build_sec, 1)

    # --- query cache (LRUQueryCache analog): repeated filter-shaped range
    # query, cached vs uncached, with the hit rate recorded
    from lucene_spark.search.executor import search_tree
    from lucene_spark.search.plan import QRange

    node = QRange(field=None, lo="sp", hi="st")
    t0 = time.perf_counter()
    for _ in range(3):
        search_tree(idx_docs, node, k=10).collect()
    q_secs["filter_range_uncached_x3"] = round(time.perf_counter() - t0, 4)
    qcache = idx_docs.enable_query_cache()
    t0 = time.perf_counter()
    for _ in range(3):
        search_tree(idx_docs, node, k=10).collect()
    q_secs["filter_range_cached_x3"] = round(time.perf_counter() - t0, 4)
    cache_stats = qcache.stats()
    idx_docs._qcache = None

    out = {
        "metric": "index_build_seconds",
        "value": round(build_sec, 3),
        "unit": "sec",
        "queries": q_secs,
        "sf": sf_dir.rstrip("/").split("sf")[-1],
        "n_docs": n_docs,
        "docs_per_sec": round(n_docs / build_sec, 1),
        "build_reps": build_reps,
        "build_warmup_sec": warmup_sec,
        "control_secs": control_secs,
        "contended": contended,
        "cpus": cpus,
        "skip_index_docs": skip_docs,
        "skip_index_build_sec": big_build_sec,
        "blocks_decoded_ratio": ratio,
        "blocks_decoded_ratios": ratios,
        "ann_partitions_probed": ann_partitions,
        "hnsw_build_vecs_per_sec": hnsw_vecs_per_sec,
        "query_cache": cache_stats,
    }
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()

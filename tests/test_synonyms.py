"""Index-time synonym stacking (SynonymGraphFilter analog, single-token):
CSR expansion unit tests + end-to-end synonym index semantics."""

import numpy as np
import pytest

from lucene_spark.functions.synonyms import (
    expand_tokens,
    synonym_expansion,
)


def test_expansion_groups_bidirectional():
    vocab = np.array(["alpha", "fast", "zeta"], dtype=object)
    counts, offsets, flat_map, nv = synonym_expansion(vocab, (("fast", "quick"),))
    assert nv.tolist() == ["alpha", "fast", "quick", "zeta"]
    # 'fast' (old code 1) -> [fast, quick]; others identity
    assert counts.tolist() == [1, 2, 1]
    got = flat_map[offsets[1] : offsets[1] + counts[1]].tolist()
    assert got == [nv.tolist().index("fast"), nv.tolist().index("quick")]


def test_expansion_one_way_dict():
    vocab = np.array(["fast", "quick"], dtype=object)
    counts, offsets, flat_map, nv = synonym_expansion(vocab, {"fast": ("quick",)})
    assert counts.tolist() == [2, 1]  # quick does NOT emit fast


def test_expand_tokens_stacks_position_and_doc():
    vocab = np.array(["a", "fast"], dtype=object)
    counts, offsets, flat_map, nv = synonym_expansion(vocab, (("fast", "quick"),))
    codes = np.array([0, 1, 0])  # a fast a
    docix = np.array([0, 0, 1])
    pos = np.array([0, 1, 0])
    c2, d2, p2 = expand_tokens(codes, docix, pos, counts, offsets, flat_map)
    terms = [nv[c] for c in c2]
    assert terms == ["a", "fast", "quick", "a"]
    assert d2.tolist() == [0, 0, 0, 1]
    assert p2.tolist() == [0, 1, 1, 0]  # stacked token shares the position


def test_multiword_synonym_rejected():
    with pytest.raises(ValueError, match="single-token"):
        synonym_expansion(np.array(["a"], dtype=object), (("new york", "nyc"),))


def test_split_rules_partitions():
    from lucene_spark.functions.synonyms import split_rules

    singles, multi = split_rules(
        (("new york", "nyc"), ("fast", "quick"))
    )
    assert singles == {"fast": ["fast", "quick"], "quick": ["quick", "fast"]}
    assert (("new", "york"), [("nyc",)]) in multi
    assert (("nyc",), [("new", "york")]) in multi


def test_multiword_expansion_stream():
    """Bidirectional multi-word group: n-token source emits the output at
    the match start; 1-token source emits an n-token output at consecutive
    positions (flatten semantics); reversed word order does not match."""
    from lucene_spark.functions.synonyms import multiword_expansion, split_rules

    _, multi = split_rules((("new york", "nyc"),))
    vocab = np.array(["city", "love", "new", "nyc", "york"], dtype=object)
    # doc0 "new york city" / doc1 "love nyc" / doc2 "york new"
    codes = np.array([2, 4, 0, 1, 3, 4, 2], dtype=np.int64)
    docix = np.array([0, 0, 0, 1, 1, 2, 2], dtype=np.int64)
    pos = np.array([0, 1, 2, 0, 1, 0, 1], dtype=np.int64)
    c2, d2, p2, v2 = multiword_expansion(codes, docix, pos, vocab, multi)
    emitted = sorted(
        (v2[c], int(d), int(p))
        for c, d, p in zip(c2[7:], d2[7:], p2[7:])
    )
    assert emitted == [("new", 1, 1), ("nyc", 0, 0), ("york", 1, 2)]


def test_multiword_stop_hole_blocks_match():
    """A stopword between source words consumes a position (StopFilter
    increments) so the n-gram source does NOT match across the hole."""
    from lucene_spark.functions.synonyms import multiword_expansion, split_rules

    _, multi = split_rules({"big apple": ["nyc"]})
    vocab = np.array(["apple", "big"], dtype=object)
    # "big <stophole> apple": positions 0, 2
    codes = np.array([1, 0], dtype=np.int64)
    docix = np.array([0, 0], dtype=np.int64)
    pos = np.array([0, 2], dtype=np.int64)
    c2, _, _, _ = multiword_expansion(codes, docix, pos, vocab, multi)
    assert len(c2) == 2  # no emission


def test_multiword_requires_positions():
    from lucene_spark.functions.synonyms import multiword_expansion, split_rules

    _, multi = split_rules({"big apple": ["nyc"]})
    with pytest.raises(ValueError, match="positions"):
        multiword_expansion(
            np.array([0], dtype=np.int64), np.array([0], dtype=np.int64),
            None, np.array(["big"], dtype=object), multi,
        )


def test_multiword_synonym_index_end_to_end(spark, tmp_path):
    """Index-time multi-word rules through the builder: querying the
    1-token alias matches the 2-token phrase docs and vice versa; the
    emitted 2-token output answers an exact phrase query; norms stay on
    the original stream; single-token groups compose in the same spec."""
    from lucene_spark.index.builder import IndexConfig, build_index
    from lucene_spark.search.executor import (
        Index,
        count_hits,
        decoded_postings,
        search_phrase,
    )
    from lucene_spark.search.plan import normalize

    rows = [
        (0, "new york city traffic"),
        (1, "love nyc lots"),
        (2, "york new backwards"),
        (3, "machine learning rocks"),
    ]
    docs = spark.createDataFrame(rows, "docid long, content string")
    cfg = IndexConfig(
        docid_col="docid", order_cols=("docid",), num_segments=2,
        hot_df_threshold=100, index_positions=True,
        synonyms=(("new york", "nyc"), ("machine learning", "ml"),
                  ("rocks", "rules")),
    )
    idx = Index(spark, build_index(spark, docs, str(tmp_path / "mw"), cfg))

    assert count_hits(idx, normalize(should=["nyc"], pre_analyzed=True)) == 2
    assert count_hits(idx, normalize(should=["ml"], pre_analyzed=True)) == 1
    assert count_hits(idx, normalize(should=["rules"], pre_analyzed=True)) == 1
    # the emitted graph answers the exact phrase on BOTH directions
    ph = search_phrase(idx, [("new", 0), ("york", 1)], slop=0, k=5).collect()
    assert sorted(r["docid"] for r in ph) == [0, 1]
    dec = {(r["term"], r["docid"]): (r["tf"], r["doclen"])
           for r in decoded_postings(idx, ["nyc", "new", "york"]).collect()}
    # norms discount every emission: doclens equal the original stream
    assert dec[("nyc", 0)] == (1, 4) and dec[("new", 1)][1] == 3
    # positions stream stays codec-legal (ascending, equal allowed)
    from lucene_spark.index.check import check_index

    assert check_index(idx)["clean"]


def test_synonym_index_end_to_end(spark, tmp_path):
    """Groups (join, merge): querying either term matches docs containing
    the other; tf sums member occurrences; norms discount the stacked
    tokens; phrases cross the synonym."""
    from lucene_spark.index.builder import IndexConfig, build_index
    from lucene_spark.search.executor import (
        Index,
        count_hits,
        decoded_postings,
        search_phrase,
    )
    from lucene_spark.search.plan import normalize

    rows = [
        (0, "hash join runs"),
        (1, "sort merge runs"),
        (2, "join merge twice"),
        (3, "unrelated words only"),
    ]
    docs = spark.createDataFrame(rows, "docid long, content string")
    cfg = IndexConfig(docid_col="docid", order_cols=("docid",), num_segments=2,
                      hot_df_threshold=100, index_positions=True,
                      synonyms=(("join", "merge"),))
    idx = Index(spark, build_index(spark, docs, str(tmp_path / "syn"), cfg))

    # either member matches docs 0,1,2
    assert count_hits(idx, normalize(should=["join"], pre_analyzed=True)) == 3
    assert count_hits(idx, normalize(should=["merge"], pre_analyzed=True)) == 3
    dec = {(r["term"], r["docid"]): (r["tf"], r["doclen"])
           for r in decoded_postings(idx, ["join", "merge"]).collect()}
    # doc 2 contains both members -> tf 2 for each stacked term
    assert dec[("join", 2)][0] == 2 and dec[("merge", 2)][0] == 2
    # norms discount stacked tokens: every doc keeps its original length 3
    assert {v[1] for v in dec.values()} == {3}
    # positions stack: "hash join" also matches as "hash merge"
    ph = search_phrase(idx, [("hash", 0), ("merge", 1)], slop=0, k=5).collect()
    assert [r["docid"] for r in ph] == [0]


def test_synonym_target_absent_from_corpus(spark, tmp_path):
    """A group member that never occurs in any doc still gets postings via
    the stacking (the reference behaves identically)."""
    from lucene_spark.index.builder import IndexConfig, build_index
    from lucene_spark.search.executor import Index, count_hits
    from lucene_spark.search.plan import normalize

    docs = spark.createDataFrame(
        [(0, "fast path"), (1, "slow path")], "docid long, content string"
    )
    cfg = IndexConfig(docid_col="docid", order_cols=("docid",), num_segments=1,
                      hot_df_threshold=100, synonyms=(("fast", "rapid"),))
    idx = Index(spark, build_index(spark, docs, str(tmp_path / "syn2"), cfg))
    assert count_hits(idx, normalize(should=["rapid"], pre_analyzed=True)) == 1


def test_append_refuses_analysis_chain_mismatch(spark, tmp_path):
    """append_to_index with a different stop/stem/synonym chain must refuse
    (new segments would disagree with the existing vocabulary)."""
    from lucene_spark.index.builder import (
        IndexConfig,
        append_to_index,
        build_index,
    )

    d = str(tmp_path / "fp")
    docs = spark.createDataFrame([(0, "fast path")], "docid long, content string")
    cfg = IndexConfig(docid_col="docid", order_cols=("docid",), num_segments=1,
                      synonyms=(("fast", "rapid"),))
    build_index(spark, docs, d, cfg)
    more = spark.createDataFrame([(1, "slow path")], "docid long, content string")
    # same chain appends fine
    append_to_index(spark, more, d, cfg)
    # different chain (no synonyms / a stemmer) refuses
    import pytest as _pt

    bad = IndexConfig(docid_col="docid", order_cols=("docid",), num_segments=1)
    with _pt.raises(ValueError, match="analysis chain mismatch"):
        append_to_index(spark, more, d, bad)


def test_multiphrase_synonym_stacked_dedup(spark, tmp_path):
    """Synonym stacking puts two alternatives of one slot at the SAME
    position; the exact multiphrase matcher must dedup slot keys before the
    assume_unique intersection (ADVICE r4) — phrase freq counts distinct
    positions (UnionPostingsEnum dedup, MultiPhraseQuery.java:475), not
    stacked tokens."""
    from lucene_spark.index.builder import IndexConfig, build_index
    from lucene_spark.search.executor import Index, search_multi_phrase
    from lucene_spark.search.scorer import idf, score_arrays

    rows = [
        (0, "quick brown fox"),
        (1, "brown quick"),
        (2, "lazy dog sleeps"),
    ]
    docs = spark.createDataFrame(rows, "docid long, content string")
    cfg = IndexConfig(docid_col="docid", order_cols=("docid",), num_segments=1,
                      index_positions=True, synonyms=(("quick", "fast"),))
    idx = Index(spark, build_index(spark, docs, str(tmp_path / "mpsyn"), cfg))

    got = search_multi_phrase(
        idx, [(0, ["quick", "fast"]), (1, ["brown"])], slop=0, k=10
    ).collect()
    assert [r["docid"] for r in got] == [0]
    # freq MUST be 1 (one distinct phrase start), not 2 (stacked dup)
    n = idx.field_stats.doc_count
    stats = idx.term_stats_for(["quick", "fast", "brown"])
    w = float(np.float32(sum(float(idf(stats[t][0], n)) for t in ("quick", "fast", "brown"))))
    want = float(
        score_arrays(np.array([1]), np.array([3]), w, idx.field_stats.avgdl())[0]
    )
    assert got[0]["score"] == pytest.approx(want, rel=1e-6)


def test_synonym_query_tree_shapes():
    """Query-time graph lowering: leftmost-longest multi-word matching,
    stop holes break adjacency, singles become SHOULD groups."""
    from lucene_spark.functions.synonyms import synonym_query_tree
    from lucene_spark.search.plan import QBool, QPhrase, QTerm

    t = synonym_query_tree("slow hash join", {"hash join": ["table scan"]})
    assert isinstance(t, QBool) and len(t.clauses) == 2
    grp = t.clauses[1][1]
    assert isinstance(grp, QBool)
    alts = [c for _, c in grp.clauses]
    assert all(isinstance(a, QPhrase) for a in alts)
    assert [tuple(x[0] for x in a.terms_off) for a in alts] == [
        ("hash", "join"), ("table", "scan")
    ]
    # a stopword between the source words keeps them plain terms
    t2 = synonym_query_tree("hash of join", {"hash join": ["x"]})
    assert all(isinstance(c, QTerm) for _, c in t2.clauses)
    # single-token group -> SHOULD of terms
    t3 = synonym_query_tree("fast", (("fast", "quick"),))
    assert isinstance(t3, QBool)
    assert {c.term for _, c in t3.clauses} == {"fast", "quick"}


def test_synonym_query_tree_end_to_end(spark, tmp_path):
    """Against a PLAIN index (no index-time synonyms): a doc containing
    only the output phrase matches the graph query."""
    from lucene_spark.functions.synonyms import synonym_query_tree
    from lucene_spark.index.builder import IndexConfig, build_index
    from lucene_spark.search.executor import Index, search_query

    rows = [
        (0, "slow hash join runs"),
        (1, "slow table scan runs"),
        (2, "hash table only"),
        (3, "unrelated words"),
    ]
    docs = spark.createDataFrame(rows, "docid long, content string")
    cfg = IndexConfig(docid_col="docid", order_cols=("docid",),
                      num_segments=2, index_positions=True,
                      hot_df_threshold=100)
    idx = Index(spark, build_index(spark, docs, str(tmp_path / "qsyn"), cfg))
    tree = synonym_query_tree("slow hash join", {"hash join": ["table scan"]})
    got = search_query(idx, tree, k=10).collect()
    ids = [r["docid"] for r in got]
    # docs 0 (original phrase) and 1 (synonym phrase) both match and beat
    # doc 2/3 (no phrase, no 'slow')
    assert set(ids[:2]) == {0, 1}
    assert 3 not in ids

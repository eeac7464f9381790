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

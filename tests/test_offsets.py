"""Offsets stream (IndexOptions ..._AND_OFFSETS analog) + sentence-aware
passage highlighting (UnifiedHighlighter / PassageScorer parity)."""

import random
import string

import numpy as np
import pytest

from lucene_spark.analysis import (
    ENGLISH_STOP_WORDS,
    analyze_with_offsets,
    tokenize,
    tokenize_with_spans,
)
from lucene_spark.functions.codec import (
    cut_offset_blocks,
    decode_block_offsets,
    encode_block_offsets,
)


def test_tokenize_spans_fuzz():
    rng = random.Random(11)
    alphabet = string.ascii_letters + string.digits + "_.':,’ \t\n多く学é"
    for _ in range(1500):
        s = "".join(rng.choices(alphabet, k=rng.randint(0, 50)))
        spans = tokenize_with_spans(s)
        assert [t for t, _, _ in spans] == tokenize(s)
        for t, a, b in spans:
            assert s[a:b] == t


def test_analyze_with_offsets_positions_and_stop():
    got = analyze_with_offsets("The Spark engine IS fast", ENGLISH_STOP_WORDS)
    # 'the'/'is' stopped but consume positions; spans index the ORIGINAL text
    assert got == [("spark", 1, 4, 9), ("engine", 2, 10, 16), ("fast", 4, 20, 24)]


def test_offsets_codec_roundtrip_random():
    rng = np.random.default_rng(5)
    for _ in range(60):
        n_post = int(rng.integers(1, 40))
        tfs = rng.integers(1, 6, n_post)
        starts, lengths = [], []
        for tf in tfs:
            s = np.sort(rng.integers(0, 5000, tf))
            starts.extend(int(v) for v in s)
            lengths.extend(int(v) for v in rng.integers(1, 255, tf))
        st = np.array(starts, dtype=np.int64)
        ln = np.array(lengths, dtype=np.int64)
        blob = encode_block_offsets(st, ln, tfs)
        ds, de = decode_block_offsets(blob, tfs)
        assert np.array_equal(ds, st) and np.array_equal(de, st + ln)


def test_cut_offset_blocks_alignment():
    # 300 single-tf postings -> 2 blocks (256 + 44)
    tfs = np.ones(300, dtype=np.int64)
    packed = (np.arange(300, dtype=np.int64) * 7) * 512 + 3
    blocks = cut_offset_blocks(packed, tfs)
    assert len(blocks) == 2
    s0, e0 = decode_block_offsets(blocks[0], tfs[:256])
    s1, e1 = decode_block_offsets(blocks[1], tfs[256:])
    assert np.array_equal(np.concatenate([s0, s1]), np.arange(300) * 7)
    assert np.all(np.concatenate([e0, e1]) - np.concatenate([s0, s1]) == 3)


def test_sentence_bounds_and_passages():
    from lucene_spark.search.highlight import build_passages, sentence_bounds

    text = "First thing here. Second spark thing! third one? last"
    b = sentence_bounds(text)
    assert b[0] == 0 and b[-1] == len(text)
    assert text[b[1] : b[2]].startswith("Second")
    snip, score, nh = build_passages(text, [("spark", 25, 30)], 1)
    assert snip == "Second <b>spark</b> thing!"
    assert nh == 1 and score > 0


def test_passage_scorer_formula():
    """PassageScorer.java:66-137: weight/tf/norm with k1=1.2 b=0.75
    pivot=87 — hand-computed golden."""
    import math

    from lucene_spark.search.highlight import score_passage

    # one term, f=2 in passage, doc ttf=3, passage [10, 60), content 200
    got = score_passage([("t", 12, 14), ("t", 40, 42)], 10, 50, 200, {"t": 3})
    nd = 1 + 200 / 87.0
    w = 2.2 * math.log(1 + (nd + 0.5) / 3.5)
    tfn = 2 / (2 + 1.2 * (0.25 + 0.75 * 50 / 87.0))
    want = (1 + 1 / math.log(97)) * tfn * w
    assert got == pytest.approx(want, rel=1e-12)


@pytest.fixture(scope="module")
def offs_index(spark, tmp_path_factory):
    from lucene_spark.index.builder import IndexConfig, build_index
    from lucene_spark.search.executor import Index

    rows = [
        (0, "The spark engine runs fast. It shuffles data! Joins are hash based."),
        (1, "spark spark spark. unrelated sentence follows. spark at the end."),
        (2, "no matches here. plain text only."),
        (3, "Mixed case Spark works too? yes. spark closes the case."),
    ]
    docs = spark.createDataFrame(rows, "docid long, content string")
    d = str(tmp_path_factory.mktemp("offs") / "idx")
    cfg = IndexConfig(docid_col="docid", order_cols=("docid",), num_segments=2,
                      index_positions=True, index_offsets=True,
                      hot_df_threshold=100)
    return Index(spark, build_index(spark, docs, d, cfg))


def test_offsets_end_to_end(spark, offs_index):
    from lucene_spark.search.executor import term_offsets_for_docs

    offs = term_offsets_for_docs(offs_index, ["spark"], np.array([0, 1, 3]))
    got = sorted((r["docid"], r["start"], r["end"]) for r in offs.collect())
    # doc1 "spark spark spark. ... spark ..." -> 4 spans; doc3 has 'Spark'
    # at 11 (offsets index the ORIGINAL casing)
    assert (1, 0, 5) in got and (1, 6, 11) in got and (3, 11, 16) in got
    assert len([g for g in got if g[0] == 1]) == 4

    from lucene_spark.index.check import check_index

    assert check_index(offs_index)["clean"]


def test_passage_sources_agree(spark, offs_index):
    """OffsetSource.POSTINGS and OffsetSource.ANALYSIS produce identical
    passages on the standard chain."""
    from lucene_spark.search.highlight import passage_highlight_topk
    from lucene_spark.search.plan import normalize

    q = normalize(should=["spark"], pre_analyzed=True)
    a = [tuple(r) for r in
         passage_highlight_topk(offs_index, q, k=4, source="postings").collect()]
    b = [tuple(r) for r in
         passage_highlight_topk(offs_index, q, k=4, source="analysis").collect()]
    assert a == b and len(a) == 3
    # sentence snapping: doc0's best passage is its first sentence,
    # original casing preserved in the wrap
    by_doc = {r[0]: r for r in a}
    assert by_doc[0][2] == "The <b>spark</b> engine runs fast."
    assert "<b>Spark</b>" in by_doc[3][2]


def test_offsets_config_validation(spark, tmp_path):
    from lucene_spark.index.builder import IndexConfig, build_index

    docs = spark.createDataFrame([(0, "x")], "docid long, content string")
    with pytest.raises(ValueError, match="requires index_positions"):
        build_index(spark, docs, str(tmp_path / "a"),
                    IndexConfig(docid_col="docid", order_cols=("docid",),
                                index_offsets=True))
    with pytest.raises(ValueError, match="standard chain"):
        build_index(spark, docs, str(tmp_path / "b"),
                    IndexConfig(docid_col="docid", order_cols=("docid",),
                                index_positions=True, index_offsets=True,
                                stemmer="porter"))


def test_analysis_source_on_offsetless_index(spark, tmp_path):
    """An index without the offsets stream still passages via re-analysis;
    asking for the postings source refuses loudly."""
    from lucene_spark.index.builder import IndexConfig, build_index
    from lucene_spark.search.executor import Index
    from lucene_spark.search.highlight import passage_highlight_topk
    from lucene_spark.search.plan import normalize

    docs = spark.createDataFrame(
        [(0, "spark here. and spark there.")], "docid long, content string"
    )
    idx = Index(spark, build_index(
        spark, docs, str(tmp_path / "np"),
        IndexConfig(docid_col="docid", order_cols=("docid",),
                    index_positions=True)))
    q = normalize(should=["spark"], pre_analyzed=True)
    got = passage_highlight_topk(idx, q, k=1, max_passages=2).collect()
    assert got[0]["snippet"] == "<b>spark</b> here.... and <b>spark</b> there."
    with pytest.raises(ValueError, match="no offsets stream"):
        passage_highlight_topk(idx, q, k=1, source="postings")


def test_offsets_tvec_positions_combined_random(spark, tmp_path):
    """All three per-occurrence stores together (positions + offsets +
    term vectors) on a randomized corpus: CheckIndex clean; postings
    offsets == re-analysis spans for every occurrence; term vectors ==
    per-doc token counts."""
    import random

    from lucene_spark.analysis import ENGLISH_STOP_WORDS, analyze_with_offsets
    from lucene_spark.index.builder import IndexConfig, build_index
    from lucene_spark.index.check import check_index
    from lucene_spark.search.executor import Index, term_offsets_for_docs

    rng = random.Random(99)
    pool = ["spark", "join", "the", "fast", "x1", "under_score", "zz"]
    rows = [
        (i, " ".join(rng.choices(pool, k=rng.randint(1, 12))))
        for i in range(40)
    ]
    docs = spark.createDataFrame(rows, "docid long, content string")
    cfg = IndexConfig(docid_col="docid", order_cols=("docid",),
                      num_segments=3, hot_df_threshold=100,
                      index_positions=True, index_offsets=True,
                      term_vectors=True)
    idx = Index(spark, build_index(spark, docs, str(tmp_path / "all3"), cfg))
    assert check_index(idx)["clean"]

    want = {}
    for docid, text in rows:
        for term, _pos, s, e in analyze_with_offsets(text, ENGLISH_STOP_WORDS):
            want.setdefault((docid, term), []).append((s, e))
    terms = sorted({t for _, t in want})
    got = {}
    offs = term_offsets_for_docs(
        idx, terms, np.array([d for d, _ in rows], dtype=np.int64))
    for r in offs.collect():
        got.setdefault((r["docid"], r["term"]), []).append((r["start"], r["end"]))
    assert {k: sorted(v) for k, v in got.items()} == {
        k: sorted(v) for k, v in want.items()
    }
    tv = {(r["docid"], r["term"]): r["tf"] for r in idx.term_vectors.collect()}
    assert tv == {k: len(v) for k, v in want.items()}

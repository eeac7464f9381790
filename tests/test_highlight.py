"""Passage highlighting (UnifiedHighlighter-lite) goldens."""

import numpy as np
import pytest

from lucene_spark.search.plan import normalize


@pytest.fixture(scope="module")
def hl_index(spark, tmp_path_factory):
    from lucene_spark.index.builder import IndexConfig, build_index
    from lucene_spark.search.executor import Index

    rows = [
        # doc 0: dense cluster of hits at positions 10..12, lone hit at 40
        (0, " ".join(
            ["pad"] * 10 + ["alpha", "beta", "alpha"] + ["pad"] * 26 + ["beta"]
        )),
        # doc 1: two equal-score single-hit windows -> smallest start wins
        (1, " ".join(["pad"] * 5 + ["alpha"] + ["pad"] * 30 + ["alpha"])),
        # doc 2: no query terms at all
        (2, "pad pad pad"),
        # doc 3: hits span wider than the window -> window must clip
        (3, " ".join(["alpha"] + ["pad"] * 25 + ["beta"])),
    ]
    docs = spark.createDataFrame(rows, "docid long, content string")
    d = str(tmp_path_factory.mktemp("hl") / "idx")
    cfg = IndexConfig(docid_col="docid", order_cols=("docid",), num_segments=2,
                      hot_df_threshold=100, index_positions=True)
    return Index(spark, build_index(spark, docs, d, cfg))


def test_highlight_best_window_and_tiebreak(hl_index):
    from lucene_spark.search.highlight import highlight_topk

    q = normalize(should=["alpha", "beta"])
    rows = {r["docid"]: r for r in highlight_topk(hl_index, q, k=10, width=8).collect()}

    # doc 0: the 3-hit cluster at 10..12 beats the lone tail hit
    r0 = rows[0]
    assert (r0["passage_start"], r0["passage_end"], r0["n_hits"]) == (10, 12, 3)
    # doc 1: two windows tie on score -> earliest start
    r1 = rows[1]
    assert (r1["passage_start"], r1["n_hits"]) == (5, 1)
    # doc 2 has no query terms: no passage row
    assert 2 not in rows
    # doc 3: hits 26 positions apart never share a width-8 window
    r3 = rows[3]
    assert r3["n_hits"] == 1

    # passage score = sum of occurrence idfs in the chosen window
    stats = hl_index.term_stats_for(["alpha", "beta"])
    n = hl_index.field_stats.doc_count
    idf = {
        t: float(np.log(1.0 + (n - df + 0.5) / (df + 0.5)))
        for t, (df, _) in stats.items()
    }
    assert r0["passage_score"] == pytest.approx(
        round(2 * idf["alpha"] + idf["beta"], 6), abs=1e-6
    )


def test_highlight_hit_list_matches_search(hl_index):
    """The highlight output preserves the hit list (same docids, same
    scores, same order) — it decorates, never re-ranks."""
    from lucene_spark.search.executor import search_exhaustive
    from lucene_spark.search.highlight import highlight_topk

    q = normalize(should=["alpha", "beta"])
    hits = search_exhaustive(hl_index, q, k=10).collect()
    hl = highlight_topk(hl_index, q, k=10, width=8).collect()
    assert [r["docid"] for r in hl] == [r["docid"] for r in hits]
    for a, b in zip(hl, hits):
        assert a["score"] == pytest.approx(b["score"], rel=1e-12)

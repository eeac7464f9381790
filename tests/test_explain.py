"""Weight#explain analog: the explanation value must equal the scored
value bit-for-bit, and non-matches must say why (Explanation.java:25,
BooleanWeight.explain failure messages)."""

import numpy as np
import pytest

from lucene_spark.search.explain import explain
from lucene_spark.search.plan import normalize


def test_explain_value_matches_exhaustive_score(built_index):
    from lucene_spark.search.executor import search_exhaustive

    q = normalize(should=["import", "return"], must=["class"])
    hits = search_exhaustive(built_index, q, k=5).collect()
    assert hits
    for r in hits:
        ex = explain(built_index, q, r["docid"])
        assert ex["match"] is True
        assert ex["value"] == pytest.approx(r["score"], rel=1e-12)
        # per-term detail values sum (in order) to the total
        total = np.float64(0)
        for d in ex["details"]:
            total = total + np.float64(d["value"])
        assert float(total) == pytest.approx(ex["value"], rel=1e-12)


def test_explain_nonmatch_reasons(built_index):
    from lucene_spark.search.executor import search_exhaustive

    # a doc that matches 'import' but not the required 'qqqzzz'
    some = search_exhaustive(built_index, normalize(should=["import"]), k=1).collect()
    d = some[0]["docid"]
    ex = explain(built_index, normalize(must=["qqqzzz"], should=["import"]), d)
    assert ex["match"] is False and "required" in ex["description"]

    ex2 = explain(built_index, normalize(should=["import"], must_not=["import"]), d)
    # import is both SHOULD and MUST_NOT -> clause dropped -> MatchNone
    assert ex2["match"] is False

    ex3 = explain(
        built_index, normalize(should=["return"], must_not=["import"]), d
    )
    assert ex3["match"] is False and "prohibited" in ex3["description"]


def test_explain_msm_shortfall(built_index):
    from lucene_spark.search.executor import decoded_postings, search_exhaustive

    q2 = normalize(should=["import", "return", "vector"], min_should_match=2)
    # find a doc matching exactly one of the three terms
    one = {
        r["docid"]: r["term"]
        for r in decoded_postings(built_index, ["import", "return", "vector"]).collect()
    }
    counts = {}
    for r in decoded_postings(built_index, ["import", "return", "vector"]).collect():
        counts[r["docid"]] = counts.get(r["docid"], 0) + 1
    single = [d for d, c in counts.items() if c == 1]
    assert single
    ex = explain(built_index, q2, single[0])
    assert ex["match"] is False
    assert "minimumNumberShouldMatch" in ex["description"]
    # and a doc matching >= 2 is explained with the full breakdown
    multi = [d for d, c in counts.items() if c >= 2]
    ex2 = explain(built_index, q2, multi[0])
    assert ex2["match"] is True
    hits = {r["docid"]: r["score"] for r in search_exhaustive(built_index, q2, k=None).collect()}
    assert ex2["value"] == pytest.approx(hits[multi[0]], rel=1e-12)


def test_explain_parity_mode_matches_topk(built_index):
    """float32-quantized explain equals the pruned top-k score."""
    from lucene_spark.search.executor import search_topk

    q = normalize(should=["vector", "import"])
    hits = search_topk(built_index, q, k=3).collect()
    for r in hits:
        ex = explain(built_index, q, r["docid"], quantize=True, dtype=np.float32)
        assert ex["value"] == pytest.approx(r["score"], rel=1e-6)


@pytest.mark.parametrize("sim", ["classic", "boolean", "lm_dirichlet",
                                 "lm_jelinek_mercer", "dfr_ine_l_h2", "ib_ll_df_h2"])
def test_explain_matches_similarity_score(spark, built_index, sim):
    """explain(similarity=...)['value'] equals the pruned-path score for
    that doc bit-for-bit (float32 quantized parity mode)."""
    import numpy as np
    from lucene_spark.search.executor import search_topk
    from lucene_spark.search.explain import explain
    from lucene_spark.search.plan import normalize

    q = normalize(should=["stream", "hash"])
    top = search_topk(built_index, q, k=3, quantize=True, dtype=np.float32,
                      similarity=sim).collect()
    assert top
    for r in top:
        ex = explain(built_index, q, r["docid"], quantize=True,
                     dtype=np.float32, similarity=sim)
        assert ex["match"]
        assert np.float32(ex["value"]) == np.float32(r["score"]), sim
        assert sim in ex["details"][0]["description"]

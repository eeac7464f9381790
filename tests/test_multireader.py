"""MultiReader analog (search/multireader.py): shard-federated search with
combined statistics == single combined index, bit for bit."""

import numpy as np
import pytest

from lucene_spark.index.builder import IndexConfig, build_index
from lucene_spark.search.executor import Index, search_topk
from lucene_spark.search.multireader import (
    combined_field_stats,
    combined_term_stats,
    multi_search_topk,
    open_shards,
)
from lucene_spark.search.plan import normalize


CFG = dict(docid_col="doc_id", content_col="content", num_segments=2,
           order_cols=("doc_id",), index_positions=True)


@pytest.fixture(scope="module")
def sharded(spark, tmp_path_factory):
    """One corpus, built twice: as a single index and as two doc_id-range
    shards (globally unique docids — the docBase-free case)."""
    from lucene_spark.corpus import make_corpus

    base = tmp_path_factory.mktemp("mr")
    rows = make_corpus(400, seed=11)
    rows = [(i, r[4]) for i, r in enumerate(rows)]
    df_all = spark.createDataFrame(rows, "doc_id long, content string")
    full = Index(spark, build_index(spark, df_all, str(base / "full"), IndexConfig(**CFG)))
    half = len(rows) // 2
    d1 = spark.createDataFrame(rows[:half], "doc_id long, content string")
    d2 = spark.createDataFrame(rows[half:], "doc_id long, content string")
    build_index(spark, d1, str(base / "s1"), IndexConfig(**CFG))
    build_index(spark, d2, str(base / "s2"), IndexConfig(**CFG))
    shards = open_shards(spark, [str(base / "s1"), str(base / "s2")])
    return full, shards


def test_combined_stats_equal_full(spark, sharded):
    full, shards = sharded
    c = combined_field_stats(shards)
    assert c.doc_count == full.field_stats.doc_count
    assert c.sum_total_term_freq == full.field_stats.sum_total_term_freq
    assert c.sum_doc_freq == full.field_stats.sum_doc_freq
    ts = combined_term_stats(shards, ["import", "return", "zzznope"])
    assert ts["import"] == full.term_stats_for(["import"])["import"]
    assert "zzznope" not in ts


@pytest.mark.parametrize("query", [
    dict(should=["import", "stream"]),
    dict(must=["import"], should=["buffer"]),
    dict(should=["stream", "parse", "hash"], must_not=["window"]),
])
def test_multi_topk_equals_single_index(spark, sharded, query):
    full, shards = sharded
    q = normalize(pre_analyzed=True, **query)
    want = search_topk(full, q, k=10).collect()
    got = multi_search_topk(shards, q, k=10).collect()
    assert want, "vacuous"
    assert [(r["docid"], r["score"]) for r in got] == [
        (r["docid"], r["score"]) for r in want
    ]


def test_multi_topk_similarity_seam(spark, sharded):
    full, shards = sharded
    q = normalize(should=["import", "stream"], pre_analyzed=True)
    want = search_topk(full, q, k=10, similarity="lm_dirichlet").collect()
    got = multi_search_topk(shards, q, k=10, similarity="lm_dirichlet").collect()
    assert want, "vacuous"
    assert [(r["docid"], r["score"]) for r in got] == [
        (r["docid"], r["score"]) for r in want
    ]


def test_with_shard_column(spark, sharded):
    _, shards = sharded
    q = normalize(should=["import"], pre_analyzed=True)
    rows = multi_search_topk(shards, q, k=10, with_shard=True).collect()
    assert rows and set(rows[0].asDict()) == {"shard", "docid", "score"}
    assert {r["shard"] for r in rows} <= {0, 1}


def test_open_shards_validates(spark):
    with pytest.raises(ValueError, match="no shard"):
        open_shards(spark, [])


def test_open_shards_refuses_mixed_analysis_chains(spark, tmp_path):
    from lucene_spark.index.builder import IndexConfig, build_index

    d1 = spark.createDataFrame([(0, "spark join")], "doc_id long, content string")
    build_index(spark, d1, str(tmp_path / "a"), IndexConfig(**CFG))
    cfg2 = dict(CFG)
    build_index(spark, d1, str(tmp_path / "b"),
                IndexConfig(**cfg2, stemmer="porter"))
    with pytest.raises(ValueError, match="analysis chain"):
        open_shards(spark, [str(tmp_path / "a"), str(tmp_path / "b")])


def test_multi_phrase_equals_single_index(spark, sharded):
    """Phrase search over shards == the combined index (combined-stats
    phrase weight; a phrase split across no shard boundary by construction
    since docs are whole rows)."""
    from lucene_spark.search.multireader import multi_search_phrase
    from lucene_spark.search.executor import search_phrase

    full, shards = sharded
    want = search_phrase(full, ["import", "return"], k=10).collect()
    got = multi_search_phrase(shards, ["import", "return"], k=10).collect()
    assert want, "vacuous"
    assert [(r["docid"], r["score"]) for r in got] == [
        (r["docid"], r["score"]) for r in want
    ]
    # sloppy + similarity through the same seam
    want = search_phrase(full, ["import", "return"], slop=2, k=10,
                         similarity="lm_dirichlet").collect()
    got = multi_search_phrase(shards, ["import", "return"], slop=2, k=10,
                              similarity="lm_dirichlet").collect()
    assert want, "vacuous"
    assert [(r["docid"], r["score"]) for r in got] == [
        (r["docid"], r["score"]) for r in want
    ]

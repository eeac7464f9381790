"""ASCII folding (ASCIIFoldingFilter analog, NFD diacritic subset)."""

import numpy as np
import pytest

from lucene_spark.functions.fold import analyze_folded, fold_ascii, fold_vocab_remap


def test_fold_ascii_diacritics():
    assert fold_ascii("café") == "cafe"
    assert fold_ascii("naïve") == "naive"
    assert fold_ascii("über") == "uber"
    assert fold_ascii("señor") == "senor"
    assert fold_ascii("ça") == "ca"
    assert fold_ascii("plain") == "plain"
    # documented divergence: non-decomposable letters pass through
    assert fold_ascii("øre") == "øre"
    assert fold_ascii("straße") == "straße"


def test_fold_vocab_remap_stop_recheck():
    vocab = np.array(["café", "thé", "x"], dtype=object)
    code_map, nv = fold_vocab_remap(vocab, frozenset({"the"}))
    assert nv.tolist() == ["cafe", "x"]
    # 'thé' folds onto the stopword 'the' -> dropped (-1)
    assert code_map[1] == -1
    assert nv[code_map[0]] == "cafe" and nv[code_map[2]] == "x"


def test_analyze_folded():
    got = analyze_folded("Thé café IS gréat")
    # 'thé'->'the' dropped post-fold; 'is' dropped pre-fold
    assert got == ["cafe", "great"]


def test_fold_index_end_to_end(spark, tmp_path):
    """fold_ascii=True: accented tokens match unaccented queries; folded
    stopwords keep their position holes (phrase over the hole works like
    plain stop behavior); fingerprint guards appends."""
    from lucene_spark.index.builder import (
        IndexConfig,
        append_to_index,
        build_index,
    )
    from lucene_spark.search.executor import Index, count_hits, search_phrase
    from lucene_spark.search.plan import normalize

    rows = [
        (0, "café runs thé engine fast"),
        (1, "cafe plain text"),
        (2, "unrelated words"),
    ]
    docs = spark.createDataFrame(rows, "docid long, content string")
    cfg = IndexConfig(docid_col="docid", order_cols=("docid",),
                      num_segments=2, index_positions=True,
                      hot_df_threshold=100, fold_ascii=True)
    d = str(tmp_path / "fold")
    idx = Index(spark, build_index(spark, docs, d, cfg))
    assert count_hits(idx, normalize(should=["cafe"], pre_analyzed=True)) == 2
    # 'thé' folded onto the stopword -> position hole between runs/engine
    ph = search_phrase(idx, [("runs", 0), ("engine", 2)], slop=0, k=5).collect()
    assert [r["docid"] for r in ph] == [0]
    assert not search_phrase(idx, [("runs", 0), ("engine", 1)], slop=0, k=5).collect()

    with pytest.raises(ValueError, match="analysis chain mismatch"):
        append_to_index(
            spark, spark.createDataFrame([(9, "x")], "docid long, content string"),
            d, IndexConfig(docid_col="docid", order_cols=("docid",),
                           num_segments=1, index_positions=True))

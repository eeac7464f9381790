"""Japanese morphological analyzer (functions/ja.py): Viterbi goldens,
search-mode compound decomposition, unknown-word handling, the dictionary
seam + fingerprint guard, and the full index/search chain."""

import pytest

from lucene_spark.functions.ja import (
    DEFAULT_JA_DICT,
    JaDict,
    analyze_ja,
    default_ja_dict,
    segment_run,
)


def test_viterbi_goldens():
    d = default_ja_dict()
    assert segment_run("多くの学生が試験に合格した", d) == [
        "多く", "の", "学生", "が", "試験", "に", "合格", "した",
    ]
    assert segment_run("私は学校で勉強します", d) == [
        "私", "は", "学校", "で", "勉強", "し", "ます",
    ]


def test_search_mode_decomposes_compounds():
    """JapaneseTokenizer search-mode semantics: a long kanji compound pays
    (len-2)*penalty, so it splits when its parts are dictionary entries;
    normal mode keeps the single entry."""
    d = default_ja_dict()
    assert segment_run("関西国際空港", d, mode="search") == ["関西", "国際", "空港"]
    assert segment_run("関西国際空港", d, mode="normal") == ["関西国際空港"]
    assert segment_run("日本経済新聞", d, mode="search") == ["日本", "経済", "新聞"]
    assert segment_run("東京大学", d, mode="search") == ["東京", "大学"]


def test_unknown_words_by_character_class():
    d = default_ja_dict()
    # unknown katakana run stays one token (class run + prolonged mark)
    assert analyze_ja("カタカナノイズ") == ["カタカナノイズ"]
    assert analyze_ja("ラーメンを食べた") == ["ラーメン", "食べ"]
    # mixed script: latin words lowercase, digits pass, punctuation drops
    assert analyze_ja("Sparkで検索エンジンを開発した! 123") == [
        "spark", "検索", "エンジン", "開発", "123",
    ]
    # unknown kanji span ends exactly where a dictionary word resumes
    toks = segment_run("鰻丼を食べた", d)
    assert "を" in toks and "食べ" in toks


def test_stopwords_and_default_chain():
    assert analyze_ja("多くの学生が試験に合格した。") == [
        "多く", "学生", "試験", "合格",
    ]
    # custom stop set overrides the JA default
    assert "の" in analyze_ja("多くの学生", stop_words=frozenset())


def test_dictionary_seam_changes_segmentation():
    base = default_ja_dict()
    # unknown 寮 falls back to an unknown-word arc
    assert segment_run("学生寮", base) == ["学生", "寮"]
    custom = dict(DEFAULT_JA_DICT)
    custom["学生寮"] = 500  # entry + kanji penalty still beats the unk arc
    assert segment_run("学生寮", JaDict(custom)) == ["学生寮"]
    # normal mode has no decomposition penalty: the whole entry wins even
    # when its parts exist
    custom2 = dict(DEFAULT_JA_DICT)
    custom2["東京大学"] = 10
    assert segment_run("東京大学", JaDict(custom2), mode="normal") == ["東京大学"]


JA_DOCS = [
    (0, "多くの学生が試験に合格した"),
    (1, "学生は学校で勉強します"),
    (2, "関西国際空港から東京へ行きます"),
    (3, "日本経済新聞を読む"),
    (4, "シニアソフトウェアエンジニアを募集"),
    (5, "機械学習で言語処理を研究する"),
    (6, "検索エンジンの索引を開発した"),
    (7, "学生が合格した試験の結果を発表します"),
]


@pytest.fixture(scope="module")
def ja_index(spark, tmp_path_factory):
    from lucene_spark.index.builder import IndexConfig, build_index
    from lucene_spark.search.executor import Index

    d = str(tmp_path_factory.mktemp("ja") / "index")
    docs = spark.createDataFrame(JA_DOCS, "doc_id long, content string")
    cfg = IndexConfig(docid_col="doc_id", order_cols=("doc_id",),
                      num_segments=2, analyzer="japanese",
                      index_positions=True)
    return Index(spark, build_index(spark, docs, d, cfg))


def test_index_and_search_japanese(ja_index):
    from lucene_spark.index.check import check_index
    from lucene_spark.search.executor import search_topk
    from lucene_spark.search.plan import normalize

    q = normalize(should=analyze_ja("学生"), pre_analyzed=True,
                  stop_words=frozenset())
    got = {r["docid"] for r in search_topk(ja_index, q, k=10).collect()}
    assert got == {0, 1, 7}
    # compound query decomposes identically at query time -> matches the
    # decomposed index terms
    q2 = normalize(should=analyze_ja("関西国際空港"), pre_analyzed=True,
                   stop_words=frozenset())
    got2 = {r["docid"] for r in search_topk(ja_index, q2, k=10).collect()}
    assert 2 in got2
    assert check_index(ja_index)["clean"]


def test_japanese_phrase_positions(ja_index):
    """Decomposed compounds are ADJACENT positions — the phrase query
    '機械学習' (analyzed to 機械|学習) matches only the doc where the
    compound occurs, not docs containing the parts separately."""
    from lucene_spark.search.executor import search_phrase

    rows = search_phrase(ja_index, analyze_ja("機械学習"), k=10).collect()
    assert {r["docid"] for r in rows} == {5}
    rows2 = search_phrase(ja_index, analyze_ja("関西国際空港"), k=10).collect()
    assert {r["docid"] for r in rows2} == {2}


def test_fingerprint_guards_dictionary(spark, tmp_path):
    """Appending under a DIFFERENT committed dictionary must refuse —
    segments built under different lexicons hold incomparable vocab."""
    from lucene_spark.index.builder import IndexConfig, append_to_index, build_index

    d = str(tmp_path / "jafp")
    docs = spark.createDataFrame(JA_DOCS[:4], "doc_id long, content string")
    cfg = IndexConfig(docid_col="doc_id", order_cols=("doc_id",),
                      num_segments=1, analyzer="japanese")
    build_index(spark, docs, d, cfg)
    more = spark.createDataFrame(
        [(100, "学生が勉強する")], "doc_id long, content string"
    )
    custom = dict(DEFAULT_JA_DICT)
    custom["学生寮"] = 10
    cfg2 = IndexConfig(docid_col="doc_id", order_cols=("doc_id",),
                       num_segments=1, analyzer="japanese", ja_dict=custom)
    with pytest.raises(ValueError, match="fingerprint|chain"):
        append_to_index(spark, more, d, cfg2)
    # same dictionary appends fine
    append_to_index(spark, more, d, cfg)


def test_japanese_rejects_incompatible_chain(spark, tmp_path):
    from lucene_spark.index.builder import IndexConfig, build_index

    docs = spark.createDataFrame(JA_DOCS[:2], "doc_id long, content string")
    with pytest.raises(ValueError, match="japanese"):
        build_index(
            spark, docs, str(tmp_path / "x"),
            IndexConfig(docid_col="doc_id", order_cols=("doc_id",),
                        analyzer="japanese", stemmer="porter"),
        )

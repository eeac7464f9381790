"""Language analyzer packs (functions/lang.py).

Layers:
  1. stemmer vectors — the reference's published vocabulary test data
     (frlight/delight/eslight/itlight/ptlight, sampled every 12th pair,
     tests/data/*_vectors.txt.gz); the full ~150k-pair files were
     validated during development (100% each);
  2. chain semantics — elision article handling, German normalization FSM
     goldens (TestGermanNormalizationFilter), stop-after-elision drops;
  3. engine e2e — build an index with analyzer=<pack>, query inflected
     forms through analyze_lang, doclen/stop-hole effects, fingerprint
     guard against mixed-chain appends.
"""

import gzip
import os

import numpy as np
import pytest

from lucene_spark.functions.lang import (
    FRENCH_ARTICLES,
    ITALIAN_ARTICLES,
    LANG_PACKS,
    analyze_lang,
    elide,
    french_light_stem,
    german_light_stem,
    german_normalize,
    italian_light_stem,
    lang_vocab_remap,
    portuguese_light_stem,
    spanish_light_stem,
)
from lucene_spark.functions.lang_stops import (
    FRENCH_STOP_WORDS,
    SPANISH_STOP_WORDS,
)

DATA = os.path.join(os.path.dirname(__file__), "data")

from lucene_spark.functions.lang import (
    finnish_light_stem,
    hungarian_light_stem,
    russian_light_stem,
    swedish_light_stem,
)

STEMMERS = {
    "fr": french_light_stem,
    "de": german_light_stem,  # vectors cover the stemmer alone (no FSM)
    "es": spanish_light_stem,
    "it": italian_light_stem,
    "pt": portuguese_light_stem,
    "sv": swedish_light_stem,
    "fi": finnish_light_stem,
    "ru": russian_light_stem,
    "hu": hungarian_light_stem,
}


@pytest.mark.parametrize("lang", sorted(STEMMERS))
def test_stemmer_reference_vectors(lang):
    fn = STEMMERS[lang]
    n = 0
    with gzip.open(os.path.join(DATA, f"{lang}light_vectors.txt.gz"), "rt",
                   encoding="utf-8") as f:
        for line in f:
            parts = line.rstrip("\n").split("\t")
            if len(parts) != 2:
                continue
            word, gold = parts
            assert fn(word) == gold, (lang, word)
            n += 1
    assert n > 1000  # vacuity guard


def test_german_normalization_fsm():
    """TestGermanNormalizationFilter goldens: ae-folding is position-aware
    (the FSM deletes 'e' only right after a fresh a/o/u)."""
    for w, want in [
        ("schaltflächen", "schaltflachen"),
        ("schaltflaechen", "schaltflachen"),  # 'ae' -> 'a' via e-deletion
        ("dauer", "dauer"),                   # 'ue' after 'a' stays
        ("weißbier", "weissbier"),
        ("", ""),
    ]:
        assert german_normalize(w) == want, w


def test_elision_articles():
    assert elide("l'avion", FRENCH_ARTICLES) == "avion"
    assert elide("qu'il", FRENCH_ARTICLES) == "il"
    assert elide("jusqu'aujourd'hui", FRENCH_ARTICLES) == "aujourd'hui"
    assert elide("aujourd'hui", FRENCH_ARTICLES) == "aujourd'hui"  # not an article
    assert elide("l’avion", FRENCH_ARTICLES) == "avion"  # U+2019
    assert elide("avion", FRENCH_ARTICLES) == "avion"
    assert elide("dell'arte", ITALIAN_ARTICLES) == "arte"


def test_analyze_lang_full_chain():
    # elision surfaces a stopword -> dropped (reference order: elision
    # BEFORE StopFilter); inflected forms stem to shared roots
    assert analyze_lang("qu'il chantés l'avion", "french") == ["chant", "avion"]
    # German: stop word "und" drops, FSM+stem runs
    got = analyze_lang("Häuser und Bücher", "german")
    assert got == [german_light_stem(german_normalize(w)) for w in ("häuser", "bücher")]
    # Spanish: "las" stops out, plural stems
    assert analyze_lang("las tablas", "spanish") == ["tabl"]


def test_vocab_remap_shapes():
    vocab = ["qu'il", "chantés", "l'avion", "zz"]
    code_map, new_vocab = lang_vocab_remap(vocab, "french", FRENCH_STOP_WORDS)
    assert code_map[0] == -1  # qu'il -> il -> stopword
    assert new_vocab[code_map[1]] == "chant"
    assert new_vocab[code_map[2]] == "avion"
    assert new_vocab[code_map[3]] == "zz"
    # shared stems collapse to one code
    cm2, nv2 = lang_vocab_remap(["chantés", "chanter"], "french", FRENCH_STOP_WORDS)
    assert cm2[0] == cm2[1] and list(nv2) == ["chant"]


def test_unknown_pack_raises():
    with pytest.raises(KeyError):
        lang_vocab_remap(["a"], "klingon", frozenset())


# ---------------------------------------------------------------------------
# engine e2e
# ---------------------------------------------------------------------------


def _build(spark, tmp_path, rows, lang, **cfg_kw):
    from lucene_spark.index.builder import IndexConfig, build_index
    from lucene_spark.search.executor import Index

    df = spark.createDataFrame(rows, "doc_id long, content string")
    cfg = IndexConfig(docid_col="doc_id", content_col="content",
                      num_segments=2, order_cols=("doc_id",),
                      analyzer=lang, **cfg_kw)
    paths = build_index(spark, df, str(tmp_path / f"idx_{lang}"), cfg)
    return Index(spark, paths), cfg


FR_ROWS = [
    (0, "les chevaux galopent dans les champs"),
    (1, "le cheval galope vite"),
    (2, "l'avion vole au dessus des montagnes"),
    (3, "elle regarde les avions qui volent"),
    (4, "une chanteuse chante une chanson"),
]


def test_french_index_end_to_end(spark, tmp_path):
    from lucene_spark.search.executor import search_topk
    from lucene_spark.search.plan import normalize

    idx, _ = _build(spark, tmp_path, FR_ROWS, "french")
    # "chevaux" and "cheval" share the stem -> a query for either matches both
    terms = analyze_lang("chevaux", "french")
    assert terms == ["cheval"]
    got = {r["docid"] for r in
           search_topk(idx, normalize(should=terms, pre_analyzed=True), k=10).collect()}
    assert got == {0, 1}
    # elision: querying "avion" matches both l'avion (doc 2) and avions (doc 3)
    terms = analyze_lang("l'avion", "french")
    got = {r["docid"] for r in
           search_topk(idx, normalize(should=terms, pre_analyzed=True), k=10).collect()}
    assert got == {2, 3}
    # French stopwords are gone from the vocabulary
    assert idx.term_stats_for(["les", "le", "des"]) == {}


def test_french_doclen_excludes_stops_and_elided_stopwords(spark, tmp_path):
    idx, _ = _build(spark, tmp_path, [(0, "qu'il chante les chansons")], "french")
    # surviving tokens: chante->chant, chansons->chanson; qu'il -> il (stop),
    # les (stop) -> doclen 2
    stats = idx.field_stats
    assert stats.sum_total_term_freq == 2


def test_german_index_end_to_end(spark, tmp_path):
    from lucene_spark.search.executor import search_topk
    from lucene_spark.search.plan import normalize

    rows = [(0, "die Häuser sind groß"), (1, "das Haus ist klein"),
            (2, "viele Bücher im Regal")]
    idx, _ = _build(spark, tmp_path, rows, "german")
    terms = analyze_lang("häuser", "german")
    got = {r["docid"] for r in
           search_topk(idx, normalize(should=terms, pre_analyzed=True), k=10).collect()}
    assert got == {0, 1}  # haus/hauser share the stem "hau"+? (both stem equal)
    assert analyze_lang("haus", "german") == terms


def test_pack_refuses_stemmer_combo(spark, tmp_path):
    from lucene_spark.index.builder import IndexConfig, build_index

    df = spark.createDataFrame([(0, "a b")], "doc_id long, content string")
    cfg = IndexConfig(docid_col="doc_id", content_col="content",
                      analyzer="french", stemmer="porter")
    with pytest.raises(ValueError, match="do not compose"):
        build_index(spark, df, str(tmp_path / "x"), cfg)


def test_unknown_analyzer_lists_packs(spark, tmp_path):
    from lucene_spark.index.builder import IndexConfig, build_index

    df = spark.createDataFrame([(0, "a b")], "doc_id long, content string")
    cfg = IndexConfig(docid_col="doc_id", content_col="content", analyzer="xx")
    with pytest.raises(ValueError, match="french"):
        build_index(spark, df, str(tmp_path / "x"), cfg)


def test_pack_fingerprint_guards_append(spark, tmp_path):
    """An index built under analyzer='french' refuses an append under the
    default chain (mixed-vocabulary corruption guard)."""
    from lucene_spark.index.builder import IndexConfig, append_to_index

    idx, cfg = _build(spark, tmp_path, FR_ROWS, "french")
    df2 = spark.createDataFrame([(10, "nouveau document")], "doc_id long, content string")
    bad = IndexConfig(docid_col="doc_id", content_col="content",
                      num_segments=1, order_cols=("doc_id",))
    with pytest.raises(ValueError, match="analysis"):
        append_to_index(spark, df2, str(tmp_path / "idx_french"), bad)


def test_pack_explicit_stopwords_override(spark, tmp_path):
    """stop_words= wins over the pack default (and changes the fingerprint)."""
    from lucene_spark.index.builder import IndexConfig

    c1 = IndexConfig(analyzer="spanish")
    c2 = IndexConfig(analyzer="spanish", stop_words=frozenset({"tabla"}))
    assert c1.effective_stop_words() == SPANISH_STOP_WORDS
    assert c2.effective_stop_words() == frozenset({"tabla"})
    assert c1.analysis_fingerprint() != c2.analysis_fingerprint()
    # explicitly passing the pack set reproduces the default fingerprint
    c3 = IndexConfig(analyzer="spanish", stop_words=SPANISH_STOP_WORDS)
    assert c3.analysis_fingerprint() == c1.analysis_fingerprint()


def test_russian_index_end_to_end(spark, tmp_path):
    """Cyrillic corpus through the pack seam: stop drop + case-suffix
    stemming make inflected forms share postings."""
    from lucene_spark.search.executor import search_topk
    from lucene_spark.search.plan import normalize

    rows = [(0, "быстрые системы поиска"), (1, "быстрая система работает"),
            (2, "медленный индекс")]
    idx, _ = _build(spark, tmp_path, rows, "russian")
    terms = analyze_lang("системы", "russian")
    got = {r["docid"] for r in
           search_topk(idx, normalize(should=terms, pre_analyzed=True), k=10).collect()}
    assert got == {0, 1}  # системы/система share the stem
    # Russian stopword gone from the vocabulary
    assert idx.term_stats_for(["и", "в"]) == {}

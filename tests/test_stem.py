"""Porter stemming (EnglishAnalyzer tail): published-vector goldens +
end-to-end stemmed index."""

import pytest

from lucene_spark.functions.stem import porter_stem, strip_possessive


def test_porter_published_vectors():
    """Vectors from Martin Porter's 1980 paper (the reference
    implementation Lucene's PorterStemmer ports)."""
    vectors = {
        "caresses": "caress", "ponies": "poni", "ties": "ti", "cats": "cat",
        "feed": "feed", "agreed": "agre", "plastered": "plaster",
        "motoring": "motor", "sing": "sing", "conflated": "conflat",
        "hopping": "hop", "falling": "fall", "filing": "file",
        "happy": "happi", "sky": "sky", "relational": "relat",
        "conditional": "condit", "rational": "ration", "digitizer": "digit",
        "conformabli": "conform", "vietnamization": "vietnam",
        "operator": "oper", "feudalism": "feudal", "decisiveness": "decis",
        "formaliti": "formal", "sensibiliti": "sensibl",
        "triplicate": "triplic", "formative": "form", "formalize": "formal",
        "electriciti": "electr", "electrical": "electr", "hopeful": "hope",
        "goodness": "good", "revival": "reviv", "allowance": "allow",
        "inference": "infer", "airliner": "airlin", "adjustable": "adjust",
        "defensible": "defens", "replacement": "replac", "adoption": "adopt",
        "communism": "commun", "activate": "activ", "effective": "effect",
        "bowdlerize": "bowdler", "probate": "probat", "rate": "rate",
        "cease": "ceas", "controll": "control", "roll": "roll",
        # the reference implementation's two published departures
        "possibli": "possibl", "analogousli": "analog", "archaeologi": "archaeolog",
    }
    for w, want in vectors.items():
        assert porter_stem(w) == want, (w, porter_stem(w), want)


def test_possessive_filter():
    assert strip_possessive("dog's") == "dog"
    assert strip_possessive("dog’s") == "dog"
    assert strip_possessive("dogs") == "dogs"
    assert strip_possessive("'s") == ""


def test_stemmed_index_end_to_end(spark, tmp_path):
    """IndexConfig(stemmer='porter'): inflected forms collapse to one term;
    a possessive stopword drops and leaves a position hole; doclens count
    the post-filter stream."""
    from lucene_spark.index.builder import IndexConfig, build_index
    from lucene_spark.search.executor import Index, count_hits, search_phrase
    from lucene_spark.search.plan import normalize

    rows = [
        (0, "connection connected"),
        (1, "connecting the connections"),
        (2, "totally unrelated words here"),
        (3, "it's a connect run running"),  # it's -> it (stopword) -> hole
    ]
    docs = spark.createDataFrame(rows, "docid long, content string")
    cfg = IndexConfig(docid_col="docid", order_cols=("docid",), num_segments=2,
                      hot_df_threshold=100, index_positions=True,
                      stemmer="porter")
    idx = Index(spark, build_index(spark, docs, str(tmp_path / "stem"), cfg))

    # all inflections of 'connect' collapse: df('connect') == 4 docs? no —
    # docs 0,1,3 contain connect-forms
    assert count_hits(idx, normalize(should=["connect"], pre_analyzed=True)) == 3
    # 'connection'/'connected' no longer exist as terms
    assert idx.expand_terms(prefix="connection") == []
    # doc 3: "it's a connect run running" -> it(stop) a(stop) connect run run
    # doclen = 3; phrase "run run"~0 at adjacent positions matches
    from lucene_spark.search.executor import decoded_postings

    dl = {r["docid"]: r["doclen"]
          for r in decoded_postings(idx, ["run"]).collect()}
    assert dl[3] == 3
    ph = search_phrase(idx, [("run", 0), ("run", 1)], slop=0, k=5).collect()
    assert [r["docid"] for r in ph] == [3]
    # stopword hole: 'connect' sits at position 2 (after it's, a)
    ph2 = search_phrase(idx, [("connect", 0), ("run", 1)], slop=0, k=5).collect()
    assert [r["docid"] for r in ph2] == [3]

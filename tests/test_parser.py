"""Recursive-descent QueryParser subset: goldens + tree-execution checks
(grammar per lucene/queryparser/.../classic/QueryParser.jj:256)."""

import numpy as np
import pytest

from lucene_spark.search.plan import (
    MUST,
    MUST_NOT,
    SHOULD,
    NormalizedQuery,
    ParseError,
    QBool,
    QFuzzy,
    QPhrase,
    QPrefix,
    QRange,
    QTerm,
    QWildcard,
    normalize,
    parse,
    parse_tree,
)

NOSTOP = frozenset()


def test_or_of_nested_and_precedence():
    """The round-1 parser misparsed a OR (b AND c) as all-MUST (VERDICT #1)."""
    t = parse_tree("a OR (b AND c)", NOSTOP)
    assert t == QBool(
        (
            (SHOULD, QTerm("a")),
            (SHOULD, QBool(((MUST, QTerm("b")), (MUST, QTerm("c"))))),
        )
    )
    # same without parens: AND binds tighter than OR
    assert parse_tree("a OR b AND c", NOSTOP) == QBool(
        (
            (SHOULD, QTerm("a")),
            (SHOULD, QBool(((MUST, QTerm("b")), (MUST, QTerm("c"))))),
        )
    )


def test_flat_queries_stay_on_fast_path():
    assert parse("spark join window") == normalize(should=["spark", "join", "window"])
    assert parse("spark AND join") == normalize(must=["spark", "join"])
    assert parse("spark -join +window") == normalize(
        must=["window"], should=["spark"], must_not=["join"]
    )
    assert isinstance(parse("a OR (b AND c)", NOSTOP), QBool)


def test_field_phrase_fuzzy_prefix_wildcard_range_boost():
    t = parse_tree('lang:py "table hash"~2 sparc~1 pre* wi?d n_chars:[100 TO 300] big^2', NOSTOP)
    kinds = [type(c) for _, c in t.clauses]
    assert kinds == [QTerm, QPhrase, QFuzzy, QPrefix, QWildcard, QRange, QTerm]
    clauses = dict()
    (f1, c1), (_, ph), (_, fz), (_, pr), (_, wc), (_, rg), (_, bo) = t.clauses
    assert c1 == QTerm("py", field="lang")
    assert ph.terms_off == (("table", 0), ("hash", 1)) and ph.slop == 2
    assert fz == QFuzzy("sparc", 1)
    assert pr == QPrefix("pre")
    assert wc == QWildcard("wi?d")
    assert rg == QRange("n_chars", "100", "300")
    assert bo == QTerm("big", boost=2.0)


def test_fuzzy_default_edits_and_not():
    t = parse_tree("NOT spark OR join~", NOSTOP)
    assert t.clauses[0] == (MUST_NOT, QTerm("spark"))
    assert t.clauses[1] == (SHOULD, QFuzzy("join", 2))


def test_stopword_clauses_dropped():
    assert parse_tree("the of and") is None
    assert parse("the of and") == NormalizedQuery()
    # stopword inside a phrase leaves a position hole
    ph = parse_tree('"sort a scan"')
    assert ph.terms_off == (("sort", 0), ("scan", 2))


def test_parse_errors():
    with pytest.raises(ParseError):
        parse_tree("(a OR b", NOSTOP)
    with pytest.raises(ParseError):
        parse_tree('"unterminated', NOSTOP)
    with pytest.raises(ParseError):
        parse_tree("a )", NOSTOP)


def test_boost_on_group_propagates():
    t = parse_tree("(a b)^3", NOSTOP)
    assert t.boost == 3.0


def test_tree_flat_equals_exhaustive(built_index):
    from lucene_spark.search.executor import search_exhaustive, search_tree

    t = parse_tree("import AND return", NOSTOP)
    a = [(r["docid"], round(r["score"], 9)) for r in search_tree(built_index, t, k=10).collect()]
    b = [
        (r["docid"], round(r["score"], 9))
        for r in search_exhaustive(built_index, normalize(must=["import", "return"]), k=10).collect()
    ]
    assert a == b


def test_nested_boolean_composes_clause_scores(built_index):
    """a OR (b AND c): expected scores assembled by hand from the exhaustive
    per-clause results."""
    from lucene_spark.search.executor import search_exhaustive, search_tree

    t = parse_tree("vector OR (import AND return)", NOSTOP)
    got = {r["docid"]: r["score"] for r in search_tree(built_index, t, k=None).collect()}
    ca = {r["docid"]: r["score"]
          for r in search_exhaustive(built_index, normalize(should=["vector"]), k=None).collect()}
    cb = {r["docid"]: r["score"]
          for r in search_exhaustive(built_index, normalize(must=["import", "return"]), k=None).collect()}
    want = {d: ca.get(d, 0.0) + cb.get(d, 0.0) for d in set(ca) | set(cb)}
    assert set(got) == set(want)
    for d in want:
        assert abs(got[d] - want[d]) < 1e-9


def test_boost_scales_weight_inside_saturation(built_index):
    """BM25 score is linear in W, so term^2 == 2x the term's score."""
    from lucene_spark.search.executor import search_tree

    t1 = {r["docid"]: r["score"]
          for r in search_tree(built_index, parse_tree("vector", NOSTOP), k=None).collect()}
    t2 = {r["docid"]: r["score"]
          for r in search_tree(built_index, parse_tree("vector^2", NOSTOP), k=None).collect()}
    assert set(t1) == set(t2)
    for d in t1:
        assert abs(t2[d] - 2 * t1[d]) < 1e-9


def test_range_query_on_docs_column(built_index):
    from lucene_spark.search.executor import search_tree

    t = parse_tree("lang:[go TO go]", NOSTOP)
    got = search_tree(built_index, t, k=None).count()
    want = built_index.docs.filter("lang = 'go'").count()
    assert got == want


def test_prefixed_group_modifiers(spark, built_index):
    """-(a b) / +(a b): the group modifier must not vanish (it previously
    lexed as a lone sign and dropped silently); execution anti-joins the
    group's match set; a lone negative query is pure-negative MatchNone."""
    from lucene_spark.search.executor import search_query
    from lucene_spark.search.plan import MUST_NOT, QBool, parse, parse_tree

    t = parse_tree("stream -(hash buffer)")
    occurs = [o for o, _ in t.clauses]
    assert MUST_NOT in occurs

    got = {r["docid"] for r in
           search_query(built_index, parse("stream -(hash buffer)"), k=1000).collect()}
    want_pos = {r["docid"] for r in
                search_query(built_index, parse("stream"), k=1000).collect()}
    want_neg = {r["docid"] for r in
                search_query(built_index, parse("hash buffer"), k=1000).collect()}
    assert got == want_pos - want_neg
    assert got  # vacuity guard

    assert search_query(built_index, parse("-(hash buffer)"), k=10).collect() == []


# ---------------------------------------------------------------------------
# BooleanQuery.rewrite analog (plan.rewrite, search/BooleanQuery.java:540-636)
# ---------------------------------------------------------------------------


def test_rewrite_flattens_nested_disjunction():
    from lucene_spark.search.plan import NormalizedQuery, parse

    q = parse("foo OR (bar OR baz)")
    assert isinstance(q, NormalizedQuery)
    assert {t for t, _ in q.optional} == {"foo", "bar", "baz"}


def test_rewrite_flattens_nested_conjunction():
    from lucene_spark.search.plan import NormalizedQuery, parse

    q = parse("(foo AND bar) AND baz")
    assert isinstance(q, NormalizedQuery)
    assert {t for t, _ in q.required} == {"foo", "bar", "baz"}


def test_rewrite_demorgan_negated_group():
    from lucene_spark.search.plan import NormalizedQuery, parse

    q = parse("foo -(bar OR baz)")
    assert isinstance(q, NormalizedQuery)
    assert set(q.excluded) == {"bar", "baz"}


def test_rewrite_unwraps_single_clause_with_boost_fold():
    from lucene_spark.search.plan import QTerm, parse, rewrite, QBool, SHOULD

    t = rewrite(QBool(((SHOULD, QBool(((SHOULD, QTerm("foo", boost=2.0)),), boost=3.0)),)))
    assert isinstance(t, QTerm) and t.boost == 6.0


def test_rewrite_keeps_mixed_and_boosted_groups():
    from lucene_spark.search.plan import QBool, parse

    assert isinstance(parse("(foo AND bar) OR baz"), QBool)
    assert isinstance(parse("foo OR (bar baz)^2"), QBool)


def test_rewrite_keeps_pure_negative_wrapper():
    from lucene_spark.search.plan import MUST_NOT, QBool, QTerm, rewrite

    q = rewrite(QBool(((MUST_NOT, QTerm("foo")),)))
    assert isinstance(q, QBool)  # pure negation must stay MatchNone-able


def test_rewritten_tree_scores_equal_tree_path(spark, built_index):
    """The flattened pruned path and the raw exhaustive tree agree on
    nested-disjunction shapes (scores float64-equal)."""
    import pytest as _pt

    from lucene_spark.search.executor import search_query, search_tree
    from lucene_spark.search.plan import parse_tree

    expr = "stream OR (buffer OR parse)"
    tree = parse_tree(expr)  # un-rewritten
    want = search_tree(built_index, tree, k=10, quantize=False).collect()
    got = search_query(built_index, tree, k=10, quantize=False, dtype=np.float64).collect()
    assert want and [r["docid"] for r in got] == [r["docid"] for r in want]
    for a, b in zip(got, want):
        assert a["score"] == _pt.approx(b["score"], rel=1e-12)


def test_tree_msm_over_arbitrary_clauses(spark, built_index):
    """BooleanQuery.setMinimumNumberShouldMatch over MIXED clause types
    (terms + a phrase): matches need >= msm distinct SHOULD clauses; score
    sums the matching clauses (BooleanQuery.java:123)."""
    from lucene_spark.search.executor import (
        phrase_scores, search_exhaustive, search_query,
    )
    from lucene_spark.search.plan import (
        NormalizedQuery, QBool, QPhrase, QTerm, SHOULD,
    )

    clauses = (
        (SHOULD, QTerm("stream")),
        (SHOULD, QPhrase(terms_off=(("import", 0), ("return", 1)))),
        (SHOULD, QTerm("merge")),
    )
    got = {r["docid"]: r["score"]
           for r in search_query(built_index, QBool(clauses, msm=2), k=1000).collect()}
    assert got, "vacuous"
    # independent reconstruction: per-clause (docid, score) maps
    maps = []
    for _, node in clauses:
        if isinstance(node, QTerm):
            df = search_exhaustive(
                built_index, NormalizedQuery(optional=((node.term, 1),)), k=None)
        else:
            df = phrase_scores(built_index, list(node.terms_off))
        maps.append({r["docid"]: r["score"] for r in df.collect()})
    want = {}
    for d in set().union(*maps):
        hits = [m[d] for m in maps if d in m]
        if len(hits) >= 2:
            want[d] = sum(hits)
    assert set(got) == set(want)
    for d in want:
        assert got[d] == pytest.approx(want[d], rel=1e-9)
    # msm > #shoulds -> MatchNone
    assert search_query(built_index, QBool(clauses, msm=4), k=5).collect() == []
    # msm on the flat path lowers to NormalizedQuery min_should_match
    from lucene_spark.search.plan import flatten, rewrite
    flat = flatten(rewrite(QBool(((SHOULD, QTerm("stream")),
                                  (SHOULD, QTerm("merge")),
                                  (SHOULD, QTerm("parse"))), msm=2)))
    assert flat is not None and flat.min_should_match == 2
    # rewrite never splices an msm>=2 child (the constraint must survive)
    inner = QBool(((SHOULD, QTerm("a")), (SHOULD, QTerm("b"))), msm=2)
    outer = rewrite(QBool(((SHOULD, inner), (SHOULD, QTerm("c")))))
    assert isinstance(outer.clauses[0][1], QBool)
    assert outer.clauses[0][1].msm == 2


def test_tree_origin_tag_pins_tree_scoring_defaults():
    # ADVICE r5: a shape that is only flat AFTER rewrite keeps the tree
    # path's scoring defaults (float64 unquantized) on the pruned path,
    # so the rewrite cannot shift 4-decimal scores for the same string
    from lucene_spark.search.plan import NormalizedQuery, parse

    nested = parse("foo OR (bar OR baz)")
    assert isinstance(nested, NormalizedQuery) and nested.tree_origin
    flat = parse("foo OR bar OR baz")
    assert isinstance(flat, NormalizedQuery) and not flat.tree_origin
    # tag is excluded from equality/hash — match semantics are identical
    assert nested == flat and hash(nested) == hash(flat)


def test_stop_words_sentinel_allows_english_on_lang_pack():
    # ADVICE r5: an EXPLICIT English stop set on a language-pack build is
    # honored; the None default still resolves to the pack's list
    from lucene_spark.analysis import ENGLISH_STOP_WORDS
    from lucene_spark.functions.lang import LANG_PACKS
    from lucene_spark.index.builder import IndexConfig

    assert IndexConfig().effective_stop_words() == ENGLISH_STOP_WORDS
    assert (IndexConfig(analyzer="french").effective_stop_words()
            == LANG_PACKS["french"].stop_words)
    cfg = IndexConfig(analyzer="french", stop_words=ENGLISH_STOP_WORDS)
    assert cfg.effective_stop_words() == ENGLISH_STOP_WORDS


def test_quantize_shard_rejects_wrapping_bits():
    import numpy as np
    import pytest

    from lucene_spark.pipeline.hnsw import _quantize_shard

    V = np.random.default_rng(0).standard_normal((4, 8)).astype(np.float32)
    q, lo, scale = _quantize_shard(V, bits=7)
    assert q.dtype == np.int8 and q.min() >= 0
    with pytest.raises(ValueError):
        _quantize_shard(V, bits=8)

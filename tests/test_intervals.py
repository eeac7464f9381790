"""Interval algebra: goldens, brute-force differentials, Spark e2e.

The brute force enumerates ALL candidate intervals by cartesian product and
keeps the non-nested ones (the minimal-interval definition itself), fully
independent of the engine's lazy two-pointer construction.
"""

from itertools import product

import numpy as np
import pytest

from lucene_spark.search.intervals import (
    IContainedBy,
    IContaining,
    IOrdered,
    ITerm,
    IUnordered,
    eval_intervals,
)


def brute_minimal(cands):
    uniq = sorted(set(cands))
    return sorted(
        (s, e)
        for s, e in uniq
        if not any(s2 >= s and e2 <= e and (s2, e2) != (s, e) for s2, e2 in uniq)
    )


def brute_ordered(plists):
    cands = [
        (t[0], t[-1])
        for t in product(*plists)
        if all(t[i] > t[i - 1] for i in range(1, len(t)))
    ]
    return brute_minimal(cands)


def brute_unordered(plists):
    cands = [(min(t), max(t)) for t in product(*plists)]
    return brute_minimal(cands)


def spans(ivs):
    return sorted((s, e) for s, e, _ in ivs)


def P(d):
    return {t: np.array(v, dtype=np.int64) for t, v in d.items()}


# ---------------------------------------------------------------------------
# goldens
# ---------------------------------------------------------------------------

def test_ordered_golden():
    pos = P({"a": [0, 5], "b": [1, 6], "c": [7]})
    node = IOrdered((ITerm("a"), ITerm("b"), ITerm("c")))
    assert spans(eval_intervals(node, pos)) == [(5, 7)]


def test_ordered_requires_order():
    pos = P({"a": [5], "b": [1]})
    assert eval_intervals(IOrdered((ITerm("a"), ITerm("b"))), pos) == []
    assert spans(eval_intervals(IUnordered((ITerm("a"), ITerm("b"))), pos)) == [(1, 5)]


def test_maxgaps_and_width():
    pos = P({"a": [0, 10], "b": [3, 11]})
    node = IOrdered((ITerm("a"), ITerm("b")))
    assert spans(eval_intervals(node, pos)) == [(0, 3), (10, 11)]
    # gaps: (0,3) -> 4-2=2; (10,11) -> 0
    assert spans(
        eval_intervals(IOrdered((ITerm("a"), ITerm("b")), max_gaps=1), pos)
    ) == [(10, 11)]
    assert spans(
        eval_intervals(IOrdered((ITerm("a"), ITerm("b")), max_width=2), pos)
    ) == [(10, 11)]


def test_unordered_sweep_golden():
    pos = P({"a": [2, 5], "b": [3, 6]})
    assert spans(eval_intervals(IUnordered((ITerm("a"), ITerm("b"))), pos)) == [
        (2, 3),
        (3, 5),
        (5, 6),
    ]


def test_containing_golden():
    # big = ordered(a..b); small = c inside only the first interval
    pos = P({"a": [0, 10], "b": [4, 12], "c": [2]})
    big = IOrdered((ITerm("a"), ITerm("b")))
    assert spans(eval_intervals(IContaining(big, ITerm("c")), pos)) == [(0, 4)]
    assert spans(eval_intervals(IContainedBy(ITerm("c"), big), pos)) == [(2, 2)]


def test_missing_term_matches_nothing():
    pos = P({"a": [1]})
    assert eval_intervals(IOrdered((ITerm("a"), ITerm("zz"))), pos) == []
    assert eval_intervals(IUnordered((ITerm("a"), ITerm("zz"))), pos) == []


def test_nested_sources():
    # ordered(unordered(a, b), c): the (a,b) window must end before c
    pos = P({"a": [4], "b": [6], "c": [9]})
    node = IOrdered((IUnordered((ITerm("a"), ITerm("b"))), ITerm("c")))
    assert spans(eval_intervals(node, pos)) == [(4, 9)]
    # gaps: width 6, inner = 2 + 1 = 3 -> gaps 3
    assert eval_intervals(
        IOrdered((IUnordered((ITerm("a"), ITerm("b"))), ITerm("c")), max_gaps=2), pos
    ) == []


# ---------------------------------------------------------------------------
# randomized differentials vs the brute-force minimal-interval definition
# ---------------------------------------------------------------------------

def _rand_plists(rng, n_terms):
    return [
        sorted(rng.choice(60, size=rng.integers(1, 9), replace=False).tolist())
        for _ in range(n_terms)
    ]


@pytest.mark.parametrize("n_terms", [2, 3, 4])
def test_ordered_matches_brute(n_terms):
    rng = np.random.default_rng(7 + n_terms)
    terms = [f"t{i}" for i in range(n_terms)]
    node = IOrdered(tuple(ITerm(t) for t in terms))
    for _ in range(150):
        pl = _rand_plists(rng, n_terms)
        pos = P(dict(zip(terms, pl)))
        assert spans(eval_intervals(node, pos)) == brute_ordered(pl)


@pytest.mark.parametrize("n_terms", [2, 3])
def test_unordered_matches_brute(n_terms):
    rng = np.random.default_rng(11 + n_terms)
    terms = [f"t{i}" for i in range(n_terms)]
    node = IUnordered(tuple(ITerm(t) for t in terms))
    for _ in range(150):
        pl = _rand_plists(rng, n_terms)
        pos = P(dict(zip(terms, pl)))
        assert spans(eval_intervals(node, pos)) == brute_unordered(pl)


def test_containing_matches_brute():
    rng = np.random.default_rng(23)
    big = IOrdered((ITerm("x"), ITerm("y")))
    for _ in range(150):
        xl, yl, wl = _rand_plists(rng, 3)
        pos = P({"x": xl, "y": yl, "w": wl})
        big_ivs = brute_ordered([xl, yl])
        want_cont = sorted(
            (s, e) for s, e in big_ivs if any(s <= w <= e for w in wl)
        )
        got = spans(eval_intervals(IContaining(big, ITerm("w")), pos))
        assert got == want_cont
        want_cby = sorted(
            (w, w) for w in wl if any(s <= w and w <= e for s, e in big_ivs)
        )
        got2 = spans(eval_intervals(IContainedBy(ITerm("w"), big), pos))
        assert got2 == want_cby


# ---------------------------------------------------------------------------
# Spark e2e vs pyref positions
# ---------------------------------------------------------------------------

def test_search_intervals_matches_pyref(built_index, ref_index):
    from lucene_spark.search.intervals import search_intervals

    node = IOrdered((ITerm("import"), ITerm("return")), max_gaps=3)
    got = {
        r["docid"]: (r["n_intervals"], r["min_gaps"], r["min_width"])
        for r in search_intervals(built_index, node).collect()
    }
    want = {}
    for d in set(ref_index.positions.get("import", {})) & set(
        ref_index.positions.get("return", {})
    ):
        pl = [ref_index.positions["import"][d], ref_index.positions["return"][d]]
        ivs = [(s, e) for s, e in brute_ordered(pl) if e - s - 1 <= 3]
        if ivs:
            want[d] = (
                len(ivs),
                min(e - s - 1 for s, e in ivs),
                min(e - s + 1 for s, e in ivs),
            )
    assert got == want
    assert len(want) > 0  # corpus sanity: the shape actually matches docs


def test_search_intervals_missing_term(built_index):
    from lucene_spark.search.intervals import search_intervals

    node = IOrdered((ITerm("import"), ITerm("qqqzzz")))
    assert search_intervals(built_index, node).collect() == []


# --- reference TestIntervals vectors (field1 corpus, queries/intervals) ------

_FIELD1 = [
    "Nothing of interest to anyone here",
    "Pease porridge hot, pease porridge cold, pease porridge in the pot nine"
    " days old.  Some like it hot, some like it cold, some like it in the pot"
    " nine days old",
    "Pease porridge cold, pease porridge hot, pease porridge in the pot twelve"
    " days old.  Some like it cold, some like it hot, some like it in the"
    " fraggle",
    "Nor here, nowt hot going on in pease this one",
    "Pease porridge hot, pease porridge cold, pease porridge in the pot nine"
    " years old.  Some like it hot, some like it twelve",
    "Porridge is great",
    "",
]


def _field1_positions(doc: int):
    from collections import defaultdict

    from lucene_spark.analysis import analyze_with_positions

    d = defaultdict(list)
    for t, p in analyze_with_positions(_FIELD1[doc], frozenset()):
        d[t].append(p)
    return {t: np.array(ps, dtype=np.int64) for t, ps in d.items()}


def _spans(node, doc):
    from lucene_spark.search.intervals import eval_intervals

    return [(s, e) for s, e, _ in eval_intervals(node, _field1_positions(doc))]


def test_not_containing_reference_vector():
    """TestIntervals.testNotContaining."""
    from lucene_spark.search.intervals import INotContaining, IOrdered, ITerm

    node = INotContaining(
        IOrdered((ITerm("porridge"), ITerm("pease"))), ITerm("hot")
    )
    want = {0: [], 1: [(4, 6)], 2: [(1, 3)], 3: [], 4: [(4, 6)], 5: [], 6: []}
    for doc, spans in want.items():
        assert _spans(node, doc) == spans, doc


def test_after_reference_vector():
    """TestIntervals.testAfter."""
    from lucene_spark.search.intervals import IAfter, IOrdered, ITerm

    node = IAfter(ITerm("porridge"), IOrdered((ITerm("pease"), ITerm("cold"))))
    want = {0: [], 1: [(7, 7)], 2: [(4, 4), (7, 7)], 3: [], 4: [(7, 7)], 5: []}
    for doc, spans in want.items():
        assert _spans(node, doc) == spans, doc


def test_before_reference_vector():
    """TestIntervals.testBefore."""
    from lucene_spark.search.intervals import IBefore, ITerm

    node = IBefore(ITerm("cold"), ITerm("twelve"))
    want = {0: [], 1: [], 2: [(2, 2)], 3: [], 4: [(5, 5)], 5: []}
    for doc, spans in want.items():
        assert _spans(node, doc) == spans, doc


def test_overlapping_reference_vector():
    """TestIntervals.testOverlapping."""
    from lucene_spark.search.intervals import IOverlapping, ITerm, IUnordered

    node = IOverlapping(
        IUnordered((ITerm("hot"), ITerm("porridge"))),
        IUnordered((ITerm("cold"), ITerm("pease"))),
    )
    want = {
        0: [], 1: [(2, 4), (7, 17)], 2: [(5, 7), (7, 21)], 3: [],
        4: [(2, 4)], 5: [],
    }
    for doc, spans in want.items():
        assert _spans(node, doc) == spans, doc


def test_within_and_or_reference_vector():
    """TestIntervals.testWithin (exercises or + extend + containedBy)."""
    from lucene_spark.search.intervals import IOr, ITerm, IWithin

    node = IWithin(ITerm("hot"), 6, IOr((ITerm("porridge"), ITerm("fraggle"))))
    want = {
        0: [], 1: [(2, 2)], 2: [(5, 5), (21, 21)], 3: [], 4: [(2, 2)], 5: [],
    }
    for doc, spans in want.items():
        assert _spans(node, doc) == spans, doc


def test_or_union_candidates_end_to_end(spark, tmp_path):
    """Pure-OR interval source: the docid phase must take the UNION of
    leaf docids (no single term is required) — verified end-to-end vs a
    brute-force evaluation over the same corpus."""
    from collections import defaultdict

    from lucene_spark.analysis import analyze_with_positions
    from lucene_spark.corpus import make_corpus
    from lucene_spark.index.builder import IndexConfig, build_index
    from lucene_spark.search.executor import Index
    from lucene_spark.search.intervals import (
        IOr, IOrdered, ITerm, eval_intervals, search_intervals,
    )

    rows = make_corpus(200, seed=31)
    rows_sorted = sorted(rows, key=lambda r: (r[0], r[1], r[2]))
    docs = spark.createDataFrame(
        rows, "repo string, path string, commit string, lang string, content string"
    )
    idx = Index(
        spark,
        build_index(spark, docs, str(tmp_path / "ivor"),
                    IndexConfig(num_segments=3, hot_df_threshold=60,
                                index_positions=True)),
    )
    node = IOr((IOrdered((ITerm("import"), ITerm("return"))), ITerm("vector")))
    got = {
        r["docid"]: r["n_intervals"]
        for r in search_intervals(idx, node).collect()
    }
    want = {}
    for i, r in enumerate(rows_sorted):
        d = defaultdict(list)
        for t, p in analyze_with_positions(r[4]):
            d[t].append(p)
        ivs = eval_intervals(node, {t: np.array(ps) for t, ps in d.items()})
        if ivs:
            want[i] = len(ivs)
    assert got == want and len(want) > 0


def test_new_combinators_match_brute_randomized():
    """or/notContaining/notContainedBy/before/after/overlapping vs naive
    O(n^2) models over random position sets (400 cases)."""
    from lucene_spark.search.intervals import (
        IAfter, IBefore, INotContaining, INotContainedBy, IOr, IOrdered,
        IOverlapping, ITerm, eval_intervals,
    )

    rng = np.random.default_rng(59)

    def brute_minimal(ivs):
        return [
            a for a in set(ivs)
            if not any(b != a and b[0] >= a[0] and b[1] <= a[1] for b in set(ivs))
        ]

    for _ in range(400):
        pos = {
            t: np.sort(rng.choice(30, size=int(rng.integers(0, 7)), replace=False))
            for t in "abc"
        }
        ta, tb, tc = ITerm("a"), ITerm("b"), ITerm("c")
        iv = lambda n: eval_intervals(n, pos)
        spans = lambda n: sorted((s, e) for s, e, _ in iv(n))

        # or == minimal(union of single positions)
        want_or = sorted(
            (p, p) for p in set(pos["a"].tolist()) | set(pos["b"].tolist())
        )
        assert spans(IOr((ta, tb))) == want_or

        src = iv(IOrdered((ta, tb)))
        refs = [(int(p), int(p)) for p in pos["c"]]
        # notContaining: minuend intervals covering no c position
        want_nc = sorted(
            (s, e) for s, e, _ in src
            if not any(s <= p <= e for p, _ in refs)
        )
        assert spans(INotContaining(IOrdered((ta, tb)), tc)) == want_nc
        # notContainedBy vs big = ordered(a, b): c positions outside every window
        want_ncb = sorted(
            (p, p) for p, _ in refs
            if not any(s <= p and p <= e for s, e, _ in src)
        )
        assert spans(INotContainedBy(tc, IOrdered((ta, tb)))) == want_ncb
        # before / after / overlapping vs exists-quantified models
        want_bef = sorted(
            (s, e) for s, e, _ in src if any(e < p for p, _ in refs)
        )
        assert spans(IBefore(IOrdered((ta, tb)), tc)) == want_bef
        want_aft = sorted(
            (s, e) for s, e, _ in src if any(s > p for p, _ in refs)
        )
        assert spans(IAfter(IOrdered((ta, tb)), tc)) == want_aft
        want_ovl = sorted(
            (s, e) for s, e, _ in src
            if any(s <= p <= e for p, _ in refs)
        )
        assert spans(IOverlapping(IOrdered((ta, tb)), tc)) == want_ovl


def test_unordered_dense_doc_no_guard():
    """Two tf~500 terms in one doc: the lazy sweep must return the correct
    minimal windows where the old cartesian-product guard raised
    (UnorderedIntervalsSource lazy queue; ADVICE r3). Equivalence is
    checked against the brute force at a tf where the product is still
    computable, plus a structural check at tf=500."""
    rng = np.random.default_rng(99)
    # brute-checkable density first
    for _ in range(20):
        a = sorted(rng.choice(3000, size=400, replace=False).tolist())
        b = sorted(rng.choice(3000, size=400, replace=False).tolist())
        pos = P({"a": a, "b": b})
        got = spans(eval_intervals(IUnordered((ITerm("a"), ITerm("b"))), pos))
        # 2-child minimal windows = closest-pair windows; derive from the
        # merged order in O(n log n) as an independent oracle
        cands = set()
        import bisect as _b
        for x in a:
            j = _b.bisect_left(b, x)
            if j < len(b):
                cands.add((min(x, b[j]), max(x, b[j])))
            if j > 0:
                cands.add((min(x, b[j - 1]), max(x, b[j - 1])))
        want = brute_minimal(cands)
        assert got == want
    # structural check at the density that used to raise
    a = sorted(rng.choice(40000, size=500, replace=False).tolist())
    b = sorted(rng.choice(40000, size=500, replace=False).tolist())
    pos = P({"a": a, "b": b})
    ivs = eval_intervals(IUnordered((ITerm("a"), ITerm("b"))), pos)
    assert ivs, "dense doc must produce intervals"
    ss = [s for s, _, _ in ivs]
    es = [e for _, e, _ in ivs]
    assert ss == sorted(ss) and es == sorted(es)  # minimal list invariant
    assert all(a_s <= a_e for a_s, a_e in zip(ss, es))


def test_unordered_three_children_sweep_matches_brute_small():
    rng = np.random.default_rng(123)
    node = IUnordered((ITerm("a"), ITerm("b"), ITerm("c")))
    for _ in range(80):
        pl = [
            sorted(rng.choice(40, size=rng.integers(1, 7), replace=False).tolist())
            for _ in range(3)
        ]
        pos = P(dict(zip(["a", "b", "c"], pl)))
        assert spans(eval_intervals(node, pos)) == brute_unordered(pl)


def test_interval_topk_scores_match_python_reference(built_index):
    """interval_topk == BM25(freq = n_intervals) recomputed in python from
    the raw interval rows + term stats (IntervalQuery scoring,
    queries/intervals/IntervalQuery.java:48)."""
    import math

    from lucene_spark.search.intervals import interval_topk, search_intervals

    node = IOrdered((ITerm("import"), ITerm("return")), max_gaps=5)
    raw = {
        r["docid"]: (r["n_intervals"], r["doclen"])
        for r in search_intervals(built_index, node).collect()
    }
    assert raw, "fixture corpus must produce ordered intervals"
    stats = built_index.term_stats_for(["import", "return"])
    n = built_index.field_stats.doc_count
    w = sum(
        math.log(1.0 + (n - stats[t][0] + 0.5) / (stats[t][0] + 0.5))
        for t in ("import", "return")
    )
    avgdl = built_index.field_stats.avgdl()

    def score(freq, dl):
        ninv = 1.0 / (1.2 * (0.25 + 0.75 * dl / avgdl))
        return w - w / (1.0 + freq * ninv)

    want = sorted(
        ((d, score(f, dl)) for d, (f, dl) in raw.items()),
        key=lambda x: (-x[1], x[0]),
    )[:10]
    got = interval_topk(built_index, node, k=10).collect()
    assert [r["docid"] for r in got] == [d for d, _ in want]
    for r, (_, s) in zip(got, want):
        assert r["score"] == pytest.approx(s, rel=1e-12)


# ---------------------------------------------------------------------------
# batched (cross-doc vectorized) evaluation == scalar per-doc walk
# ---------------------------------------------------------------------------


def _csr_per_term(docs_positions, terms):
    """Build the make_intervals_fn per_term CSR shape from a list of
    per-doc {term: positions} dicts."""
    per_term = {}
    n = len(docs_positions)
    for t in terms:
        pos_parts, tfs = [], np.zeros(n, dtype=np.int64)
        for i, d in enumerate(docs_positions):
            p = np.asarray(sorted(d.get(t, [])), dtype=np.int64)
            pos_parts.append(p)
            tfs[i] = len(p)
        bounds = np.concatenate(([0], np.cumsum(tfs)))
        per_term[t] = (
            np.concatenate(pos_parts) if pos_parts else np.empty(0, np.int64),
            bounds,
        )
    return per_term


@pytest.mark.parametrize("shape", ["ordered", "unordered"])
@pytest.mark.parametrize("n_terms", [2, 3, 4])
def test_batched_matches_scalar_randomized(shape, n_terms):
    from lucene_spark.search.intervals import (
        batch_eval_ordered_unordered,
        batchable_terms,
        eval_intervals,
    )

    rng = np.random.default_rng(100 + n_terms + (shape == "ordered"))
    terms = [f"t{i}" for i in range(n_terms)]
    for trial in range(30):
        mg = [None, 2, 5][trial % 3]
        mw = [None, 7][trial % 2]
        cls = IOrdered if shape == "ordered" else IUnordered
        node = cls(tuple(ITerm(t) for t in terms), max_gaps=mg, max_width=mw)
        assert batchable_terms(node) == terms
        docs = []
        for _ in range(rng.integers(1, 12)):
            dlen = int(rng.integers(5, 60))
            d = {}
            for t in terms:
                k = int(rng.integers(0, 6))
                d[t] = sorted(rng.choice(dlen, size=min(k, dlen), replace=False))
            docs.append(d)
        per_term = _csr_per_term(docs, terms)
        max_pos = 60
        doc_ix, starts, ends = batch_eval_ordered_unordered(
            node, per_term, len(docs), max_pos
        )
        got = {}
        for di, s, e in zip(doc_ix, starts, ends):
            got.setdefault(int(di), []).append((int(s), int(e)))
        for i, d in enumerate(docs):
            want = [
                (s, e)
                for s, e, _ in eval_intervals(
                    node, {t: np.asarray(d[t], dtype=np.int64) for t in terms}
                )
            ]
            assert got.get(i, []) == want, (shape, trial, i, d)


def test_batched_repeated_term_children():
    """ordered('a','a') chains distinct occurrences; unordered('a','a')
    stacks the same occurrence (overlap allowed) — both must equal the
    scalar walk."""
    from lucene_spark.search.intervals import (
        batch_eval_ordered_unordered,
        eval_intervals,
    )

    docs = [{"a": [1, 4, 9]}, {"a": [0]}]
    per_term = _csr_per_term(docs, ["a"])
    for cls in (IOrdered, IUnordered):
        node = cls((ITerm("a"), ITerm("a")))
        doc_ix, starts, ends = batch_eval_ordered_unordered(node, per_term, 2, 10)
        got = {}
        for di, s, e in zip(doc_ix, starts, ends):
            got.setdefault(int(di), []).append((int(s), int(e)))
        for i, d in enumerate(docs):
            want = [
                (s, e)
                for s, e, _ in eval_intervals(
                    node, {"a": np.asarray(d["a"], dtype=np.int64)}
                )
            ]
            assert got.get(i, []) == want, (cls.__name__, i)


def test_empty_children_rejected_at_construction():
    with pytest.raises(ValueError, match="at least one child"):
        IOrdered(())
    with pytest.raises(ValueError, match="at least one child"):
        IUnordered(())


# ---------------------------------------------------------------------------
# r6 sources: atLeast / noIntervals / prefix / wildcard
# ---------------------------------------------------------------------------


def _rand_positions(rng, n_terms, doc_len=60):
    return {
        f"t{i}": np.array(sorted(rng.sample(range(doc_len), rng.randint(0, 6))),
                          dtype=np.int64)
        for i in range(n_terms)
    }


@pytest.mark.parametrize("trial", range(30))
def test_atleast_matches_brute(trial):
    """IAtLeast vs exhaustive enumeration: for every m-subset of children
    and every interval choice, window = (min start, max end); compare the
    minimal (start, end) sets."""
    import random
    from itertools import combinations

    from lucene_spark.search.intervals import IAtLeast, IUnordered

    rng = random.Random(900 + trial)
    n = rng.randint(2, 4)
    m = rng.randint(1, n)
    positions = _rand_positions(rng, n)
    children = tuple(ITerm(f"t{i}") for i in range(n))
    got = sorted((s, e) for s, e, _ in
                 eval_intervals(IAtLeast(children, m), positions))

    child_ivs = [eval_intervals(c, positions) for c in children]
    cands = []
    for combo in combinations(range(n), m):
        lists = [child_ivs[c] for c in combo]
        if any(not l for l in lists):
            continue
        for choice in product(*lists):
            cands.append((min(iv[0] for iv in choice),
                          max(iv[1] for iv in choice)))
    want = brute_minimal(cands)
    assert got == want
    if m == n and got:
        # atLeast(n of n) covers all children like an unordered window
        un = sorted((s, e) for s, e, _ in
                    eval_intervals(IUnordered(children), positions))
        assert got == un


def test_atleast_validation_and_noIntervals():
    from lucene_spark.search.intervals import IAtLeast, INoIntervals

    with pytest.raises(ValueError, match="minShouldMatch"):
        IAtLeast((ITerm("a"), ITerm("b")), 3)
    with pytest.raises(ValueError, match="minShouldMatch"):
        IAtLeast((ITerm("a"),), 0)
    assert eval_intervals(INoIntervals("why"), {"a": np.array([1])}) == []


def test_prefix_wildcard_interval_sources(built_index):
    """IPrefix/IWildcard expand against the term dictionary and equal the
    hand-expanded IOr (MultiTermIntervalsSource semantics), capped at
    max_expansions."""
    from lucene_spark.search.intervals import (
        IAtLeast, INoIntervals, IOr, IOrdered, IPrefix, IWildcard,
        expand_interval_sources, search_intervals,
    )

    exp = expand_interval_sources(built_index, IPrefix("ret"))
    assert isinstance(exp, IOr) and all(
        t.term.startswith("ret") for t in exp.children
    )
    got = {r["docid"]
           for r in search_intervals(
               built_index,
               IOrdered((IPrefix("imp"), ITerm("return")), max_gaps=8),
           ).collect()}
    want = {r["docid"]
            for r in search_intervals(
                built_index,
                IOrdered((expand_interval_sources(built_index, IPrefix("imp")),
                          ITerm("return")), max_gaps=8),
            ).collect()}
    assert got == want and got  # vacuity guard
    # wildcard: ? = one char
    w = expand_interval_sources(built_index, IWildcard("retur?"))
    assert isinstance(w, (IOr, INoIntervals))
    # absent prefix -> INoIntervals -> empty result
    assert expand_interval_sources(
        built_index, IPrefix("zzzzqq")
    ) == INoIntervals("prefix 'zzzzqq' matches no terms")
    assert search_intervals(built_index, IPrefix("zzzzqq")).collect() == []
    # expansion cap honored
    capped = expand_interval_sources(built_index, IPrefix("r", max_expansions=3))
    assert isinstance(capped, IOr) and len(capped.children) <= 3
    # atLeast end-to-end over the index
    rows = search_intervals(
        built_index,
        IAtLeast((ITerm("import"), ITerm("return"), ITerm("vector")), 2),
    ).collect()
    assert rows


@pytest.mark.parametrize("trial", range(20))
def test_unordered_no_overlaps_matches_brute(trial):
    """IUnorderedNoOverlaps vs exhaustive pair enumeration: every
    non-overlapping (a, b) pair makes a window (min start, max end)."""
    import random

    from lucene_spark.search.intervals import IUnorderedNoOverlaps

    rng = random.Random(700 + trial)
    positions = _rand_positions(rng, 2)
    a, b = ITerm("t0"), ITerm("t1")
    got = sorted((s, e) for s, e, _ in
                 eval_intervals(IUnorderedNoOverlaps(a, b), positions))
    av = eval_intervals(a, positions)
    bv = eval_intervals(b, positions)
    cands = [
        (min(ia[0], ib[0]), max(ia[1], ib[1]))
        for ia in av for ib in bv
        if ia[1] < ib[0] or ib[1] < ia[0]  # no overlap
    ]
    assert got == brute_minimal(cands)


def test_generic_maxgaps_maxwidth_wrappers():
    """IMaxGaps/IMaxWidth == the embedded ordered/unordered filters, and
    compose over sources that have no embedded filter (atLeast)."""
    import random

    from lucene_spark.search.intervals import (
        IAtLeast, IMaxGaps, IMaxWidth, IOrdered, IUnordered,
    )

    rng = random.Random(321)
    for _ in range(10):
        positions = _rand_positions(rng, 3)
        kids = tuple(ITerm(f"t{i}") for i in range(3))
        for g in (0, 1, 3):
            a = eval_intervals(IMaxGaps(IOrdered(kids), g), positions)
            b = eval_intervals(IOrdered(kids, max_gaps=g), positions)
            assert a == b
        for w in (3, 5, 9):
            a = eval_intervals(IMaxWidth(IUnordered(kids), w), positions)
            b = eval_intervals(IUnordered(kids, max_width=w), positions)
            assert a == b
        # over atLeast: every kept window obeys the width cap
        for s, e, _ in eval_intervals(IMaxWidth(IAtLeast(kids, 2), 6), positions):
            assert e - s + 1 <= 6

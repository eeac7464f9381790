"""Pluggable similarities (Similarity seam, SURVEY.md §2.4).

Three layers:
  1. formula goldens straight from the reference Javadoc shapes
     (ClassicSimilarity.java:44-71, BooleanSimilarity.java:48-51,
     LMDirichletSimilarity.java:76-82, LMJelinekMercerSimilarity.java:68-74);
  2. bound soundness: the per-block impact upper bound dominates every
     posting score it covers (what keeps MAXSCORE pruning correct);
  3. engine differentials: pruned block-max path == exhaustive SQL path,
     and float32-parity top-k == an independent brute-force reference over
     the pure-Python index.
"""

import math

import numpy as np
import pytest

from lucene_spark.functions.smallfloat import LENGTH_TABLE, int_to_byte4
from lucene_spark.search.plan import normalize
from lucene_spark.search.similarities import (
    BooleanBound,
    ClassicBound,
    LMDirichletBound,
    LMJelinekMercerBound,
    bind_similarity,
)
from lucene_spark.search.scorer import FieldStats

FS = FieldStats(max_doc=100, doc_count=100, sum_total_term_freq=5000, sum_doc_freq=4000)
STATS = {"a": (3, 10), "b": (50, 800), "zz": (0, 0)}
SIMS = ["classic", "boolean", "lm_dirichlet", "lm_jelinek_mercer",
        "dfr_ine_l_h2", "ib_ll_df_h2", "dfi_standardized", "axiomatic_f2exp"]


def _bind(name, qtf=None, quantize=True, dtype=np.float32):
    return bind_similarity(name, qtf or {"a": 1, "b": 1, "zz": 1}, STATS, FS,
                           quantize=quantize, dtype=dtype)


# ---------------------------------------------------------------------------
# 1. formula goldens
# ---------------------------------------------------------------------------

def test_classic_idf_and_score():
    sim = _bind("classic", quantize=False, dtype=np.float64)
    # idf = ln((N+1)/(df+1)) + 1  (ClassicSimilarity.java:69-71)
    assert sim.weights["a"] == pytest.approx(math.log(101 / 4) + 1)
    # score = sqrt(tf) * w / sqrt(len)  (tf=4, len=16 -> 2*w/4)
    s = sim.score("a", np.array([4]), np.array([16]))
    assert s[0] == pytest.approx(2 * sim.weights["a"] / 4)
    assert "zz" not in sim.weights  # df=0 terms drop


def test_classic_norm_table_zero_entry():
    # normTable[0] = 1/normTable[255] (TFIDFSimilarity.java:441-446)
    sim = _bind("classic")
    nt = sim._norm_table
    assert nt[0] == np.float32(1.0) / nt[255]
    assert nt[37] == pytest.approx(1.0 / math.sqrt(float(LENGTH_TABLE[37])))


def test_classic_quantized_uses_norm_table():
    sim = _bind("classic", quantize=True, dtype=np.float32)
    dl = 1234
    s = sim.score("b", np.array([9]), np.array([dl]))
    w = np.float32(sim.weights["b"])
    expected = np.sqrt(np.float32(9)) * w * sim._norm_table[int_to_byte4(np.array([dl]))[0]]
    assert s[0] == expected  # bit-equal float32


def test_boolean_score_is_boost():
    sim = _bind("boolean", qtf={"a": 2, "b": 1})
    s = sim.score("a", np.array([7, 1]), np.array([10, 9999]))
    assert list(s) == [2.0, 2.0]  # qtf folds in; tf/doclen ignored


def test_lm_dirichlet_golden_and_clamp():
    sim = _bind("lm_dirichlet", quantize=False, dtype=np.float64)
    mu, pc = 2000.0, (10 + 1) / (5000 + 1)
    got = sim.score("a", np.array([3]), np.array([20]))
    want = math.log(1 + 3 / (mu * pc)) + math.log(mu / (20 + mu))
    assert got[0] == pytest.approx(want)
    # a huge doc with tf=1 on a common term goes negative -> floored at 0
    pc_b = (800 + 1) / (5000 + 1)
    raw = math.log(1 + 1 / (mu * pc_b)) + math.log(mu / (500000 + mu))
    assert raw < 0
    assert sim.score("b", np.array([1]), np.array([500000]))[0] == 0.0


def test_lm_jelinek_mercer_golden():
    sim = _bind("lm_jelinek_mercer", quantize=False, dtype=np.float64)
    lam, pc = 0.1, (10 + 1) / (5000 + 1)
    got = sim.score("a", np.array([2]), np.array([40]))
    assert got[0] == pytest.approx(math.log(1 + (0.9 * 2 / 40) / (lam * pc)))


def test_lm_quantized_doclen_goes_through_length_table():
    sim = _bind("lm_dirichlet", quantize=True, dtype=np.float32)
    dl = 85  # quantizes to a LENGTH_TABLE value != 85
    ql = float(LENGTH_TABLE[int_to_byte4(np.array([dl]))[0]])
    assert ql != dl
    got = sim.score("a", np.array([2]), np.array([dl]))
    pc = (10 + 1) / (5000 + 1)
    want = np.float32(
        max(math.log(1 + 2 / (2000.0 * pc)) + math.log(2000.0 / (ql + 2000.0)), 0.0)
    )
    assert want > 0  # the golden exercises the formula, not the clamp
    assert got[0] == want


def test_dfr_golden():
    """DFR(Ine, L, H2 c=1): tfn = tf*log2(1+avgdl/dl), ne = N*(1-((N-1)/N)^F),
    score = qtf * log2((N+1)/(ne+0.5)) * (1 - 1/(1+tfn))."""
    sim = _bind("dfr_ine_l_h2", quantize=False, dtype=np.float64)
    n, avgdl, ttf = 100.0, 50.0, 10
    ne = n * (1.0 - ((n - 1.0) / n) ** ttf)
    a = math.log((n + 1.0) / (ne + 0.5)) / math.log(2.0)
    assert sim.weights["a"] == pytest.approx(a)
    tfn = 4 * math.log(1.0 + avgdl / 25.0) / math.log(2.0)
    got = sim.score("a", np.array([4]), np.array([25]))
    assert got[0] == pytest.approx(a * (1.0 - 1.0 / (1.0 + tfn)))


def test_dfi_golden_and_zero_cutoff():
    """DFISimilarity(Standardized) golden: expected = (ttf+1)*dl/(tokens+1);
    freq <= expected scores EXACTLY 0 (DFISimilarity.java:76)."""
    import math

    sim = _bind("dfi_standardized", quantize=False, dtype=np.float64)
    df, ttf = STATS["a"]
    pc = (ttf + 1.0) / (FS.sum_total_term_freq + 1.0)
    dl = 10
    exp = pc * dl
    got = sim.score("a", np.array([5]), np.array([dl]))[0]
    want = math.log((5 - exp) / math.sqrt(exp) + 1) / math.log(2)
    assert got == pytest.approx(want, rel=1e-12)
    # a huge doc makes expected exceed freq -> exact zero, no NaN
    big = int(exp * 1e6)
    assert sim.score("a", np.array([1]), np.array([big]))[0] == 0.0


def test_axiomatic_golden():
    """AxiomaticF2EXP golden: ((N+1)/df)^0.35 * f/(f+0.25+0.25*dl/avgdl)."""
    import math

    sim = _bind("axiomatic_f2exp", quantize=False, dtype=np.float64)
    df, _ = STATS["a"]
    idf = ((FS.doc_count + 1.0) / df) ** 0.35
    f, dl = 3.0, 7.0
    want = idf * f / (f + 0.25 + 0.25 * dl / FS.avgdl())
    got = sim.score("a", np.array([3]), np.array([7]))[0]
    assert got == pytest.approx(want, rel=1e-12)


def test_unknown_similarity_raises():
    with pytest.raises(ValueError, match="unknown similarity"):
        _bind("tfidfish")


def test_bm25_names_resolve_to_default():
    assert _bind(None) is None and _bind("bm25") is None


# ---------------------------------------------------------------------------
# 2. bound soundness (what MAXSCORE pruning relies on)
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("name", SIMS)
@pytest.mark.parametrize("quantize", [False, True])
def test_block_bound_dominates_postings(name, quantize):
    rng = np.random.default_rng(7)
    sim = _bind(name, quantize=quantize, dtype=np.float32)
    for _ in range(50):
        tfs = rng.integers(1, 200, size=64)
        dls = rng.integers(int(tfs.max()), 5000, size=64)
        ub = sim.bound("a", int(tfs.max()), int(dls.min()))
        scores = sim.score("a", tfs, dls)
        assert float(scores.max()) <= ub + 1e-6


# ---------------------------------------------------------------------------
# 3. engine differentials
# ---------------------------------------------------------------------------

# terms from the synthetic corpus vocabulary (corpus.py KEYWORDS/VOCAB —
# "import" is Zipf-hot, the rest mid-frequency); every query below MUST
# return rows or the differential is vacuous (asserted)
QUERIES = [
    dict(should=["stream", "hash", "parse"]),
    dict(must=["stream", "hash"], should=["buffer"]),
    dict(should=["import", "atomic"], must_not=["queue"]),
]


@pytest.mark.parametrize("name", SIMS)
def test_pruned_matches_exhaustive(spark, built_index, name):
    from lucene_spark.search.executor import search_exhaustive, search_topk

    for clauses in QUERIES:
        q = normalize(**clauses)
        a = search_topk(built_index, q, k=10, quantize=False, dtype=np.float64,
                        similarity=name).collect()
        b = search_exhaustive(built_index, q, k=10, similarity=name).collect()
        assert a, (name, clauses)  # vacuity guard
        assert [r["docid"] for r in a] == [r["docid"] for r in b], (name, clauses)
        for ra, rb in zip(a, b):
            assert ra["score"] == pytest.approx(rb["score"], rel=1e-12), (name, clauses)


def _ln(x):
    # np.log, not math.log: numpy's vectorized log and libm can differ by
    # 1 ulp; the differential targets the distributed machinery (pruning,
    # bounds, merge order), not the libm choice, so both sides use numpy's
    return float(np.log(np.float64(x)))


def _one_sub_score(name, tf, df, ttf, dl, N, sum_ttf):
    """One SimScorer.score(tf, norm) in float32 parity — formulas restated
    from the Javadoc, not from similarities.py."""
    ql = float(LENGTH_TABLE[int_to_byte4(np.array([dl]))[0]])
    if name == "classic":
        idf = np.float32(_ln((N + 1) / (df + 1)) + 1.0)
        byte = int(int_to_byte4(np.array([dl]))[0])
        norm = (
            np.float32(1.0) / np.float32(1.0 / math.sqrt(float(LENGTH_TABLE[255])))
            if byte == 0
            else np.float32(1.0 / math.sqrt(float(LENGTH_TABLE[byte])))
        )
        s = np.float32(np.float32(math.sqrt(tf)) * idf) * norm
    elif name == "boolean":
        s = np.float32(1.0)
    elif name == "lm_dirichlet":
        pc = (ttf + 1.0) / (sum_ttf + 1.0)
        raw = _ln(1 + tf / (2000.0 * pc)) + _ln(2000.0 / (ql + 2000.0))
        s = np.float32(max(raw, 0.0))
    elif name == "ib_ll_df_h2":
        avgdl = sum_ttf / N
        lam = float(np.float32((df + 1.0) / (N + 1.0)))
        tfn = tf * (_ln(1.0 + avgdl / ql) / _ln(2.0))
        s = np.float32(-_ln(lam / (tfn + lam)))
    elif name == "dfr_ine_l_h2":
        avgdl = sum_ttf / N
        ne = N * (1.0 - ((N - 1.0) / N) ** float(ttf))
        a = _ln((N + 1.0) / (ne + 0.5)) / _ln(2.0)
        tfn = tf * (_ln(1.0 + avgdl / ql) / _ln(2.0))
        s = np.float32(a * (1.0 - 1.0 / (1.0 + tfn)))
    elif name == "dfi_standardized":
        exp = (ttf + 1.0) * ql / (sum_ttf + 1.0)
        if tf <= exp:
            s = np.float32(0.0)
        else:
            meas = (tf - exp) / math.sqrt(exp)
            s = np.float32(_ln(meas + 1.0) / _ln(2.0))
    elif name == "axiomatic_f2exp":
        avgdl = sum_ttf / N
        idf = ((N + 1.0) / df) ** 0.35
        s = np.float32(idf * tf / (tf + 0.25 + 0.25 * ql / avgdl))
    else:  # lm_jelinek_mercer
        pc = (ttf + 1.0) / (sum_ttf + 1.0)
        s = np.float32(_ln(1 + (0.9 * tf / ql) / (0.1 * pc)))
    return s


def _brute_reference(ref_index, terms, name, k=10):
    """Independent float32-parity scorer over the pure-Python index."""
    N = ref_index.doc_count
    sum_ttf = ref_index.sum_ttf
    per_doc = {}
    for t in sorted(set(terms)):
        plist = ref_index.postings.get(t, {})
        if not plist:
            continue
        df = len(plist)
        ttf = sum(plist.values())
        for d, tf in plist.items():
            s = _one_sub_score(name, tf, df, ttf, ref_index.doclen[d], N, sum_ttf)
            per_doc.setdefault(d, np.float32(0.0))
            per_doc[d] = per_doc[d] + s
    ranked = sorted(per_doc.items(), key=lambda kv: (-float(kv[1]), kv[0]))[:k]
    return ranked


def _brute_phrase_reference(ref_index, terms_off, name, k=10):
    """Independent phrase scorer: phrase freq from the pure-Python matcher,
    then ONE SimScorer per phrase-term occurrence scoring that shared freq,
    summed in float32 (SimilarityBase.scorer -> MultiSimilarity.MultiSimScorer,
    MultiSimilarity.java:70-78); BooleanSimilarity returns a single boost
    scorer regardless of the termStats count (BooleanSimilarity.java:43-51)."""
    from lucene_spark.pyref import exact_phrase_freq

    terms = [t for t, _ in terms_off]
    offs = [o for _, o in terms_off]
    N = ref_index.doc_count
    sum_ttf = ref_index.sum_ttf
    if any(t not in ref_index.positions for t in terms):
        return []
    docs = set.intersection(*(set(ref_index.postings[t]) for t in set(terms)))
    scored = []
    for d in sorted(docs):
        freq = exact_phrase_freq([ref_index.positions[t][d] for t in terms], offs)
        if freq <= 0:
            continue
        if name == "boolean":
            total = np.float32(1.0)
        else:
            total = np.float32(0.0)
            for t in terms:  # per occurrence, in phrase order
                plist = ref_index.postings[t]
                total = total + _one_sub_score(
                    name, freq, len(plist), sum(plist.values()),
                    ref_index.doclen[d], N, sum_ttf,
                )
        scored.append((d, total))
    scored.sort(key=lambda kv: (-float(kv[1]), kv[0]))
    return scored[:k]


@pytest.mark.parametrize("name", SIMS)
def test_float32_parity_vs_bruteforce(spark, built_index, ref_index, name):
    from lucene_spark.search.executor import search_topk

    terms = ["stream", "hash", "parse"]
    got = search_topk(
        built_index, normalize(should=terms), k=10, quantize=True,
        dtype=np.float32, similarity=name,
    ).collect()
    want = _brute_reference(ref_index, terms, name)
    assert got and want, name  # vacuity guard
    assert [r["docid"] for r in got] == [d for d, _ in want]
    for r, (_, s) in zip(got, want):
        assert np.float32(r["score"]) == np.float32(s), name


@pytest.mark.parametrize("name", SIMS)
def test_phrase_similarity_parity_vs_bruteforce(spark, built_index, ref_index, name):
    """search_phrase(similarity=...) == the independent per-occurrence-sum
    reference (MultiSimScorer semantics) in float32 parity."""
    from lucene_spark.search.executor import search_phrase

    terms_off = [("import", 0), ("return", 1)]
    got = search_phrase(
        built_index, terms_off, k=10, quantize=True, dtype=np.float32,
        similarity=name,
    ).collect()
    want = _brute_phrase_reference(ref_index, terms_off, name)
    assert got and want, name  # vacuity guard
    assert [r["docid"] for r in got] == [d for d, _ in want], name
    for r, (_, s) in zip(got, want):
        assert np.float32(r["score"]) == np.float32(s), name


def test_multiphrase_similarity_runs_through_seam(spark, built_index):
    """MultiPhraseQuery under a non-BM25 similarity: the slot-union matcher
    feeds the same MultiSimScorer sum — a single-alternative multiphrase
    must equal the plain phrase under the same similarity."""
    from lucene_spark.search.executor import search_multi_phrase, search_phrase

    got = search_multi_phrase(
        built_index, [(0, ["import"]), (1, ["return"])], k=10,
        similarity="lm_dirichlet",
    ).collect()
    want = search_phrase(
        built_index, [("import", 0), ("return", 1)], k=10,
        similarity="lm_dirichlet",
    ).collect()
    assert got, "vacuous"
    assert [(r["docid"], r["score"]) for r in got] == [
        (r["docid"], r["score"]) for r in want
    ]


@pytest.mark.parametrize("name", SIMS)
def test_seed_theta_per_similarity_sound(spark, built_index, name):
    """A theta seed computed UNDER the same similarity never changes the
    top-k (it is a sound lower bound of the k-th score for that scoring
    function)."""
    from lucene_spark.search.executor import search_topk, seed_theta

    q = normalize(should=["stream", "hash", "parse"])
    seed = seed_theta(built_index, q, k=10, similarity=name)
    base = search_topk(built_index, q, k=10, similarity=name).collect()
    seeded = search_topk(built_index, q, k=10, similarity=name,
                         theta_seed=seed).collect()
    assert base  # vacuity guard
    assert [(r["docid"], r["score"]) for r in base] == [
        (r["docid"], r["score"]) for r in seeded
    ]


def test_pruned_equals_exhaustive_random_corpora_all_sims(spark, tmp_path):
    """CheckHits invariant under every registered similarity on seeded
    random corpora: the pruned block-max path returns exactly the
    exhaustive ranking (docids and float64 scores)."""
    import random

    from lucene_spark.index.builder import IndexConfig, build_index
    from lucene_spark.search.executor import Index, search_exhaustive, search_topk

    rng = random.Random(31)
    vocab = [f"w{j}" for j in range(40)]
    rows = []
    for i in range(300):
        content = " ".join(rng.choices(vocab, k=rng.randrange(1, 50)))
        rows.append((f"r{i%4}", f"p{i}", "c0", "py", content))
    docs = spark.createDataFrame(
        rows, "repo string, path string, commit string, lang string, content string"
    )
    d = str(tmp_path / "simrand")
    idx = Index(spark, build_index(
        spark, docs, d,
        IndexConfig(num_segments=3, hot_df_threshold=60, merge_bucket_segments=2),
    ))
    shapes = [
        dict(should=["w0", "w7", "w23"]),
        dict(must=["w3", "w11"], should=["w29"]),
        dict(should=["w1", "w2", "w3", "w4"], min_should_match=2),
    ]
    for name in SIMS:
        for clauses in shapes:
            q = normalize(**clauses, pre_analyzed=True)
            a = search_topk(idx, q, k=12, quantize=False, dtype=np.float64,
                            similarity=name).collect()
            b = search_exhaustive(idx, q, k=12, similarity=name).collect()
            assert a, (name, clauses)
            assert [r["docid"] for r in a] == [r["docid"] for r in b], (name, clauses)
            for ra, rb in zip(a, b):
                assert ra["score"] == pytest.approx(rb["score"], rel=1e-12)


@pytest.mark.parametrize("name", ["classic", "lm_dirichlet"])
def test_search_after_with_similarity(spark, built_index, name):
    """Cursor paging under a non-default similarity: page2 equals the
    exhaustive ranking's ranks k+1..2k."""
    from lucene_spark.search.executor import search_exhaustive, search_topk, search_after

    q = normalize(should=["stream", "hash", "parse"])
    full = search_exhaustive(built_index, q, k=20, similarity=name).collect()
    assert len(full) > 10
    p1 = search_topk(built_index, q, k=5, quantize=False, dtype=np.float64,
                     similarity=name).collect()
    last = p1[-1]
    p2 = search_after(built_index, q, 5, last["score"], last["docid"],
                      quantize=False, dtype=np.float64, similarity=name).collect()
    assert [r["docid"] for r in p1 + p2] == [r["docid"] for r in full[:10]], name


def test_tree_path_similarity_threaded(spark, built_index):
    """similarity= on the tree path is honored on term leaves (equal to the
    exhaustive path under the same similarity) and threaded through phrase
    clauses (equal to search_phrase under the same similarity)."""
    import pytest as _pt
    from lucene_spark.search.executor import (
        search_exhaustive, search_phrase, search_query,
    )
    from lucene_spark.search.plan import QBool, QPhrase, QTerm, SHOULD, normalize, parse

    tree = QBool(clauses=((SHOULD, QTerm("stream")), (SHOULD, QTerm("buffer"))))
    got = search_query(built_index, tree, k=10, similarity="classic").collect()
    want = search_exhaustive(
        built_index, normalize(should=["stream", "buffer"], pre_analyzed=True),
        k=10, similarity="classic",
    ).collect()
    assert [r["docid"] for r in got] == [r["docid"] for r in want]
    for a, b in zip(got, want):
        assert a["score"] == _pt.approx(b["score"], rel=1e-9)

    # phrase clause: threaded to the phrase scorer's Similarity seam
    ptree = QBool(clauses=(
        (SHOULD, QPhrase(terms_off=(("import", 0), ("return", 1)))),
    ))
    got = search_query(built_index, ptree, k=5, similarity="classic").collect()
    want = search_phrase(
        built_index, [("import", 0), ("return", 1)], k=5,
        quantize=False, dtype=np.float64, similarity="classic",
    ).collect()
    assert got, "vacuous"
    assert [r["docid"] for r in got] == [r["docid"] for r in want]
    for a, b in zip(got, want):
        assert a["score"] == _pt.approx(b["score"], rel=1e-9)

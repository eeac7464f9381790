"""Pure-Python reference search engine (differential oracle for tests).

Mirrors the role of Lucene's CheckHits
[lucene/test-framework/src/java/org/apache/lucene/tests/search/CheckHits.java:58-222]:
a slow, obviously-correct implementation whose top-k must match the Spark
engine exactly (same docids, same float32 scores, same order).

Scoring follows BM25Similarity exactly (SURVEY.md §4.4):
  idf   = float32(ln(1 + (N - n + 0.5)/(n + 0.5)))     [BM25Similarity.java:139-141]
  avgdl = float32(sumTotalTermFreq / double(docCount))  [BM25Similarity.java:144-146]
  cache[b] = float32(1 / (k1 * ((1-b) + b*LENGTH_TABLE[b]/avgdl)))
                                                        [BM25Similarity.java:217-221]
  score = weight - weight / (1 + freq * cache[norm])    [BM25Similarity.java:257-268]
in float32 arithmetic, with norm = SmallFloat.intToByte4(doclen).
Tie-break: score desc, docid asc [HitQueue.java lessThan].
"""

from __future__ import annotations

from collections import Counter
from dataclasses import dataclass, field
from typing import Dict, List, Sequence, Tuple

import numpy as np

from .analysis import ENGLISH_STOP_WORDS, analyze, analyze_with_positions
from .functions.phrase import exact_phrase_freq, sloppy_phrase_freq
from .functions.smallfloat import LENGTH_TABLE, int_to_byte4

K1 = 1.2
B = 0.75


@dataclass
class RefIndex:
    postings: Dict[str, Dict[int, int]] = field(default_factory=dict)  # term -> {docid: tf}
    positions: Dict[str, Dict[int, list]] = field(default_factory=dict)  # term -> {docid: [pos]}
    doclen: Dict[int, int] = field(default_factory=dict)  # docid -> token count (>=1 only)
    norm_byte: Dict[int, int] = field(default_factory=dict)
    num_docs: int = 0  # docs indexed (incl. empty)

    @property
    def doc_count(self) -> int:
        """Docs with at least one token == Lucene Terms.getDocCount()."""
        return len(self.doclen)

    @property
    def sum_ttf(self) -> int:
        return sum(self.doclen.values())

    def avgdl(self) -> np.float32:
        return np.float32(self.sum_ttf / float(self.doc_count))


def build_ref_index(docs: Sequence[Tuple[int, str]], stop_words=ENGLISH_STOP_WORDS,
                    quantize: bool = True) -> RefIndex:
    idx = RefIndex()
    for docid, content in docs:
        with_pos = analyze_with_positions(content, stop_words)
        toks = [t for t, _ in with_pos]
        idx.num_docs += 1
        if not toks:
            continue
        idx.doclen[docid] = len(toks)
        idx.norm_byte[docid] = int(int_to_byte4(np.array([len(toks)]))[0]) if quantize else len(toks)
        for term, tf in Counter(toks).items():
            idx.postings.setdefault(term, {})[docid] = tf
        for term, pos in with_pos:
            idx.positions.setdefault(term, {}).setdefault(docid, []).append(pos)
    return idx


def _norm_inverse_cache(idx: RefIndex, quantize: bool) -> Dict[int, np.float32]:
    avgdl = idx.avgdl()
    k1 = np.float32(K1)
    b = np.float32(B)
    one = np.float32(1)
    if quantize:
        lens = LENGTH_TABLE  # float32[256]
        return {i: one / (k1 * ((one - b) + b * np.float32(lens[i]) / avgdl)) for i in range(256)}
    return {}


def _idf(df: int, doc_count: int) -> np.float32:
    return np.float32(np.log(1.0 + (doc_count - df + 0.5) / (df + 0.5)))


def score_term(idx: RefIndex, term: str, quantize: bool = True) -> Dict[int, np.float32]:
    """Per-doc float32 BM25 for one term (weight = idf, boost 1, qtf 1)."""
    plist = idx.postings.get(term, {})
    if not plist:
        return {}
    w = _idf(len(plist), idx.doc_count)
    cache = _norm_inverse_cache(idx, quantize)
    out: Dict[int, np.float32] = {}
    k1 = np.float32(K1)
    b = np.float32(B)
    one = np.float32(1)
    avgdl = idx.avgdl()
    for docid, tf in plist.items():
        if quantize:
            ninv = cache[idx.norm_byte[docid]]
        else:
            ninv = one / (k1 * ((one - b) + b * np.float32(idx.doclen[docid]) / avgdl))
        out[docid] = w - w / (one + np.float32(tf) * ninv)
    return out


def search(idx: RefIndex, query_terms: Sequence[str], k: int, mode: str = "or",
           must_not: Sequence[str] = (), quantize: bool = True) -> List[Tuple[int, float]]:
    """Top-k (docid, score). mode: 'or' (sum) | 'and' (all terms required).

    Repeated query terms get linear qtf weighting [BM25Similarity.java:130-136]
    via the dedup rewrite [BooleanQuery.java:429-446]. Summation over distinct
    terms in sorted-term order, float32 (the engine's documented order).
    """
    qtf = Counter(query_terms)
    terms = sorted(qtf)
    per_term = {t: score_term(idx, t, quantize) for t in terms}
    return _combine(idx, terms, qtf, per_term, k, mode, must_not)


def _combine(idx, terms, qtf, per_term, k, mode, must_not):
    if mode == "and":
        if not terms or any(not per_term[t] for t in terms):
            return []
        docs = set.intersection(*(set(per_term[t]) for t in terms))
    else:
        docs = set()
        for t in terms:
            docs |= set(per_term[t])
    for t in must_not:
        docs -= set(idx.postings.get(t, {}))
    scored = []
    for d in docs:
        s = np.float32(0)
        for t in terms:
            if d in per_term[t]:
                s = s + np.float32(qtf[t]) * per_term[t][d]
        scored.append((d, float(s)))
    scored.sort(key=lambda x: (-x[1], x[0]))
    return scored[:k]


def search_phrase(
    idx: RefIndex,
    terms_with_offsets: Sequence[Tuple[str, int]],
    slop: int = 0,
    k: int = 10,
    quantize: bool = True,
    boost: float = 1.0,
) -> List[Tuple[int, float]]:
    """Reference PhraseQuery top-k (PhraseQuery.java:455-490,
    PhraseScorer.java:84-96): candidates = conjunction of the phrase terms;
    phraseFreq from the exact/sloppy matcher; weight = boost * Σ idf over the
    terms array (duplicates included, double-accumulated then cast —
    BM25Similarity.idfExplain(FieldStats, TermStats[]))."""
    terms = [t for t, _ in terms_with_offsets]
    offs = [o for _, o in terms_with_offsets]
    offs = [o - offs[0] for o in offs]  # PhraseQuery.rewrite rebases to 0
    if any(t not in idx.positions for t in terms):
        return []
    docs = set.intersection(*(set(idx.postings[t]) for t in set(terms)))
    if not docs:
        return []
    w = np.float32(
        np.float32(boost)
        * np.float32(sum(float(_idf(len(idx.postings[t]), idx.doc_count)) for t in terms))
    )
    cache = _norm_inverse_cache(idx, quantize)
    k1, b, one = np.float32(K1), np.float32(B), np.float32(1)
    avgdl = idx.avgdl()
    scored = []
    for d in sorted(docs):
        plists = [idx.positions[t][d] for t in terms]
        if slop == 0:
            freq = np.float32(exact_phrase_freq(plists, offs))
        else:
            freq = sloppy_phrase_freq(plists, offs, slop, dtype=np.float32, terms=terms)
        if freq <= 0:
            continue
        if quantize:
            ninv = cache[idx.norm_byte[d]]
        else:
            ninv = one / (k1 * ((one - b) + b * np.float32(idx.doclen[d]) / avgdl))
        s = w - w / (one + freq * ninv)
        scored.append((d, float(s)))
    scored.sort(key=lambda x: (-x[1], x[0]))
    return scored[:k]


def search_multi_phrase(
    idx: RefIndex,
    slots: Sequence[Tuple[int, Sequence[str]]],
    slop: int = 0,
    k: int = 10,
    quantize: bool = True,
    boost: float = 1.0,
) -> List[Tuple[int, float]]:
    """Reference MultiPhraseQuery: per-slot position UNION over alternatives
    (UnionPostingsEnum), weight = Σ idf over every existing alternative
    (MultiPhraseQuery.java:228-236)."""
    base_off = slots[0][0]
    norm = [(o - base_off, sorted({t for t in a if t in idx.postings})) for o, a in slots]
    if any(not a for _, a in norm):
        return []
    # repeat groups across slots (union-find over shared repeating terms,
    # gatherRptGroups multi-term case, SloppyPhraseMatcher.java:556-609)
    term_slots: Dict[str, list] = {}
    for si, (_, alts) in enumerate(norm):
        for t in alts:
            term_slots.setdefault(t, []).append(si)
    parent = list(range(len(norm)))

    def _find(x: int) -> int:
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for t, ss in term_slots.items():
        if len(ss) > 1:
            r0 = _find(ss[0])
            for s2 in ss[1:]:
                parent[_find(s2)] = r0
    by_root: Dict[int, list] = {}
    for si in range(len(norm)):
        by_root.setdefault(_find(si), []).append(si)
    rpt_groups = [g for g in by_root.values() if len(g) > 1]
    has_multi = any(len(norm[si][1]) > 1 for g in rpt_groups for si in g)
    docs = None
    for _, alts in norm:
        u = set()
        for t in alts:
            u |= set(idx.postings[t])
        docs = u if docs is None else (docs & u)
    if not docs:
        return []
    w = np.float32(
        np.float32(boost)
        * np.float32(
            sum(float(_idf(len(idx.postings[t]), idx.doc_count)) for _, a in norm for t in a)
        )
    )
    cache = _norm_inverse_cache(idx, quantize)
    k1, b, one = np.float32(K1), np.float32(B), np.float32(1)
    avgdl = idx.avgdl()
    offs = [o for o, _ in norm]
    scored = []
    for d in sorted(docs):
        plists = []
        for _, alts in norm:
            ps = sorted(p for t in alts for p in idx.positions[t].get(d, []))
            plists.append(ps)
        if slop == 0:
            freq = np.float32(exact_phrase_freq(plists, offs))
        else:
            freq = sloppy_phrase_freq(plists, offs, slop, dtype=np.float32,
                                      groups=rpt_groups, multi_term=has_multi)
        if freq <= 0:
            continue
        if quantize:
            ninv = cache[idx.norm_byte[d]]
        else:
            ninv = one / (k1 * ((one - b) + b * np.float32(idx.doclen[d]) / avgdl))
        s = w - w / (one + freq * ninv)
        scored.append((d, float(s)))
    scored.sort(key=lambda x: (-x[1], x[0]))
    return scored[:k]

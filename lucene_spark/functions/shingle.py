"""Word shingles (ShingleFilter analog, bigrams).

Lucene's ShingleFilter (analysis/common/src/java/org/apache/lucene/
analysis/shingle/ShingleFilter.java:52) emits word n-grams alongside the
unigrams: defaults minShingleSize = maxShingleSize = 2, token separator
" ", outputUnigrams = true, and FILLER_TOKEN "_" standing in for stop
holes. This module reproduces the bigram default as a vectorized
stream-level pass:

  - adjacent tokens (same doc, positions p and p+1) emit the shingle
    "a b" at position p;
  - a position-increment gap (stop hole) between consecutive tokens
    emits "a _" at p and "_ b" at the hole before the right token;
    interior filler-only grams ("_ _") are never emitted, matching the
    reference;
  - a doc's LEADING holes emit "_ first" (the first token carries the
    posInc that materializes the fillers); TRAILING holes emit nothing —
    the filter never sees them (no following token carries the
    increment), exactly like the reference;
  - shingles share their first token's position (posIncrement 0 wrt the
    unigram), so norms discount them (discountOverlaps) — the builder
    computes doc lengths before this pass.

Shingle STRINGS materialize only for unique code pairs (vocab-level
Python, like the CJK bigram pass); the stream work is shifted compares
plus gathers. Requires positions; incompatible with synonym stacking
(the pass assumes one token per position).
"""

from __future__ import annotations

from typing import Tuple

import numpy as np

FILLER = "_"
SEP = " "


def shingle_stream(
    codes: np.ndarray,
    flat_docix: np.ndarray,
    flat_pos: np.ndarray,
    vocab: np.ndarray,
) -> Tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """Append bigram shingles (+filler grams) to a (doc, pos)-ordered
    stream. Returns (codes, docix, pos, vocab) re-sorted to stream
    order."""
    if flat_pos is None:
        raise ValueError("shingles require the positions stream")
    n = len(codes)
    if n == 0:
        return codes, flat_docix, flat_pos, vocab
    vocab_list = [str(t) for t in vocab]
    code_of = {t: i for i, t in enumerate(vocab_list)}

    def code_for(term: str) -> int:
        c = code_of.get(term)
        if c is None:
            c = len(vocab_list)
            code_of[term] = c
            vocab_list.append(term)
        return c

    same = np.zeros(n, dtype=bool)
    if n > 1:
        same[:-1] = flat_docix[1:] == flat_docix[:-1]
    nxt_pos = np.empty(n, dtype=np.int64)
    nxt_pos[:-1] = flat_pos[1:] if n > 1 else 0
    adj = same.copy()
    gap = same.copy()
    if n > 1:
        adj[:-1] &= nxt_pos[:-1] == flat_pos[:-1] + 1
        gap[:-1] &= nxt_pos[:-1] > flat_pos[:-1] + 1
    add_codes, add_docix, add_pos = [], [], []

    # "a b": unique code pairs -> shingle terms (vocab-level strings)
    ai = np.flatnonzero(adj)
    if len(ai):
        V = np.int64(len(vocab))
        pkey = codes[ai] * V + codes[ai + 1]
        upairs, pinv = np.unique(pkey, return_inverse=True)
        pair_codes = np.array(
            [code_for(vocab_list[k // int(V)] + SEP + vocab_list[k % int(V)])
             for k in upairs.tolist()],
            dtype=np.int64,
        )
        add_codes.append(pair_codes[pinv])
        add_docix.append(flat_docix[ai])
        add_pos.append(flat_pos[ai])

    # "a _" at p (hole after a) and "_ b" at pn-1 (hole before b)
    gi = np.flatnonzero(gap)
    if len(gi):
        left, linv = np.unique(codes[gi], return_inverse=True)
        lcodes = np.array(
            [code_for(vocab_list[int(c)] + SEP + FILLER) for c in left],
            dtype=np.int64,
        )
        add_codes.append(lcodes[linv])
        add_docix.append(flat_docix[gi])
        add_pos.append(flat_pos[gi])
        right, rinv = np.unique(codes[gi + 1], return_inverse=True)
        rcodes = np.array(
            [code_for(FILLER + SEP + vocab_list[int(c)]) for c in right],
            dtype=np.int64,
        )
        add_codes.append(rcodes[rinv])
        add_docix.append(flat_docix[gi + 1])
        add_pos.append(flat_pos[gi + 1] - 1)

    # leading holes: "_ first" at pos-1 for a doc's first token with pos>0
    first_mask = np.concatenate(([True], flat_docix[1:] != flat_docix[:-1]))
    li = np.flatnonzero(first_mask & (flat_pos > 0))
    if len(li):
        lead, leinv = np.unique(codes[li], return_inverse=True)
        lecodes = np.array(
            [code_for(FILLER + SEP + vocab_list[int(c)]) for c in lead],
            dtype=np.int64,
        )
        add_codes.append(lecodes[leinv])
        add_docix.append(flat_docix[li])
        add_pos.append(flat_pos[li] - 1)

    if not add_codes:
        return codes, flat_docix, flat_pos, vocab
    out_codes = np.concatenate([codes] + add_codes)
    out_docix = np.concatenate([flat_docix] + add_docix)
    out_pos = np.concatenate([flat_pos] + add_pos)
    order = np.lexsort((out_pos, out_docix))
    return (
        out_codes[order],
        out_docix[order],
        out_pos[order],
        np.array(vocab_list, dtype=object),
    )


def analyze_shingles(text: str, stop_words=None):
    """Query-time chain for a shingles=True index: the token list the
    index-time pass would emit for this text (unigrams + shingles in
    stream order)."""
    from ..analysis import ENGLISH_STOP_WORDS, analyze_with_positions

    if stop_words is None:
        stop_words = ENGLISH_STOP_WORDS
    toks = analyze_with_positions(text, stop_words)
    if not toks:
        return []
    terms = np.array([t for t, _ in toks], dtype=object)
    pos = np.array([p for _, p in toks], dtype=np.int64)
    codes = np.arange(len(terms), dtype=np.int64)
    docix = np.zeros(len(terms), dtype=np.int64)
    c2, _, _, v2 = shingle_stream(codes, docix, pos, terms)
    return [v2[c] for c in c2]

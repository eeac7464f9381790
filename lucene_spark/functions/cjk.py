"""CJK bigram analysis (CJKAnalyzer / CJKBigramFilter analog).

Lucene's CJKAnalyzer chain (analysis/common/.../cjk/CJKAnalyzer.java:68)
is StandardTokenizer -> CJKWidthFilter -> LowerCaseFilter ->
CJKBigramFilter -> StopFilter. The bigram filter
(cjk/CJKBigramFilter.java:187-220) concatenates the characters of
consecutive CJK-typed tokens and emits overlapping character bigrams,
each with position increment 1; a CJK character that cannot pair (a run
of length one) is emitted as a unigram (the <SINGLE> type in
TestCJKBigramFilter.testHanOnly).

This engine's StandardTokenizer already emits Han ideographs and
hiragana one-per-character at consecutive positions
(analysis.py: IDEOGRAPHIC / HIRAGANA one-per-char, jflex:278-279), so
the bigram pass is a pure stream transform: two CJK single-char tokens
of the same doc at positions (p, p+1) fuse into one bigram token at
position p. A stop hole or an intervening non-CJK token breaks the
position adjacency exactly like a run boundary breaks the reference's
buffer. Reference vectors reproduced (TestCJKBigramFilter
testAllScripts/testHuge shapes): "多くの学生が試験に落ちた" ->
多く くの の学 学生 生が が試 試験 験に に落 落ち ちた.

Documented divergences:
  - katakana: the reference bigrams katakana characters too (a katakana
    RUN token's chars enter the same buffer); this engine's tokenizer
    emits katakana runs as single tokens and the bigram pass leaves them
    whole. Hangul likewise rides in word runs (ALetter) and is not
    bigrammed.
  - CJKWidthFilter (full/half-width folding) is not applied; inputs are
    assumed already width-normalized.

The index-time pass is vectorized: adjacency is one shifted compare over
the (doc, pos) stream; bigram STRINGS are materialized only for the
UNIQUE code pairs (vocab-level Python, like the stemmer and synonyms),
never per token.
"""

from __future__ import annotations

import re
from typing import List, Tuple

import numpy as np

# Han (unified + ext A + compat) and hiragana — the scripts this engine's
# tokenizer emits one-per-char (analysis.py _CJK).
_CJK_SINGLE = re.compile(r"^[一-鿿㐀-䶿豈-﫿ぁ-ゟ]$")


def cjk_bigram_stream(
    codes: np.ndarray,
    flat_docix: np.ndarray,
    flat_pos: np.ndarray,
    vocab: np.ndarray,
) -> Tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """Apply the CJK bigram transform to a (doc, pos)-ordered token stream.

    Pairs are formed between STREAM-ADJACENT entries i, i+1 with the same
    doc and pos[i+1] == pos[i] + 1 where both tokens are single CJK chars;
    each pair emits vocab[codes[i]] + vocab[codes[i+1]] at pos[i] and
    consumes both members; a CJK char in no pair survives as a unigram.
    Non-CJK tokens pass through untouched. Requires positions.

    Returns (codes, flat_docix, flat_pos, vocab) re-sorted to (doc, pos)
    stream order; new bigram terms extend the vocab.
    """
    if flat_pos is None:
        raise ValueError("the CJK bigram analyzer requires the positions stream")
    n = len(codes)
    if n == 0:
        return codes, flat_docix, flat_pos, vocab
    vocab_list = [str(t) for t in vocab]
    is_cjk = np.fromiter(
        (bool(_CJK_SINGLE.match(t)) for t in vocab_list), dtype=bool,
        count=len(vocab_list),
    )
    if not is_cjk.any():
        return codes, flat_docix, flat_pos, vocab
    cjk_tok = is_cjk[codes]
    adj = np.zeros(n, dtype=bool)  # adj[i]: (i, i+1) forms a bigram
    if n > 1:
        adj[:-1] = (
            cjk_tok[:-1]
            & cjk_tok[1:]
            & (flat_docix[1:] == flat_docix[:-1])
            & (flat_pos[1:] == flat_pos[:-1] + 1)
        )
    pair_idx = np.flatnonzero(adj)
    in_pair = np.zeros(n, dtype=bool)
    in_pair[pair_idx] = True
    in_pair[pair_idx + 1] = True
    keep = ~cjk_tok | (cjk_tok & ~in_pair)  # pass-through + isolated unigrams
    if not len(pair_idx):
        return codes, flat_docix, flat_pos, vocab

    V = np.int64(len(vocab_list))
    pkey = codes[pair_idx] * V + codes[pair_idx + 1]
    upairs, pinv = np.unique(pkey, return_inverse=True)
    code_of = {t: i for i, t in enumerate(vocab_list)}
    pair_codes = np.empty(len(upairs), dtype=np.int64)
    for i, k in enumerate(upairs.tolist()):
        term = vocab_list[k // int(V)] + vocab_list[k % int(V)]
        c = code_of.get(term)
        if c is None:
            c = len(vocab_list)
            code_of[term] = c
            vocab_list.append(term)
        pair_codes[i] = c

    out_codes = np.concatenate([codes[keep], pair_codes[pinv]])
    out_docix = np.concatenate([flat_docix[keep], flat_docix[pair_idx]])
    out_pos = np.concatenate([flat_pos[keep], flat_pos[pair_idx]])
    order = np.lexsort((out_pos, out_docix))
    return (
        out_codes[order],
        out_docix[order],
        out_pos[order],
        np.array(vocab_list, dtype=object),
    )


def analyze_cjk(text: str, stop_words=None) -> List[str]:
    """Query-time CJK bigram analysis: the same chain a cjk_bigram index
    was built with (tokenize + lower + stop + bigram). Returns the token
    list in stream order — feed to normalize(..., pre_analyzed=True)."""
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
    c2, _, _, v2 = cjk_bigram_stream(codes, docix, pos, terms)
    return [v2[c] for c in c2]

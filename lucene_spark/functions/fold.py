"""ASCII folding (ASCIIFoldingFilter analog, NFD subset).

Lucene's ASCIIFoldingFilter (analysis/common/src/java/org/apache/lucene/
analysis/miscellaneous/ASCIIFoldingFilter.java:60) maps Unicode Latin
characters to their ASCII equivalents via a hand-rolled table. This
module implements the DIACRITIC subset through canonical decomposition:
NFD-normalize, drop combining marks (category Mn) — which covers every
accented Latin letter (á é î ñ ü ç ...). Documented divergence: the
reference's table also folds NON-decomposable letters (ø->o, ß->ss,
æ->ae, đ->d, þ->th, ligatures, quotes/dashes); those pass through
unchanged here. The NFD definition is shared verbatim with the DuckDB
oracle (strip_accents()).

Like the stemmer, folding is computed on the dictionary-encoded VOCAB
(O(unique terms) Python) and applied to the token stream as a numpy
code remap — the Arrow hot path stays per-token Python-free. Chain
order: tokenize -> lower -> stop -> FOLD (stop re-checked after the
fold: a term folding onto a stopword drops out with its position hole,
like the stemmer's post-possessive stop re-check) -> [stem].
"""

from __future__ import annotations

import unicodedata
from typing import FrozenSet, Tuple

import numpy as np


def fold_ascii(term: str) -> str:
    """NFD + strip combining marks; ASCII input returns unchanged."""
    if term.isascii():
        return term
    return "".join(
        c for c in unicodedata.normalize("NFD", term)
        if unicodedata.category(c) != "Mn"
    )


def fold_vocab_remap(
    vocab: np.ndarray, stop_words: FrozenSet[str]
) -> Tuple[np.ndarray, np.ndarray]:
    """Fold a dictionary vocab. Returns (code_map, new_vocab):
    ``code_map[old_code]`` is the new code, or -1 when the folded term is
    a stopword (dropped with its position hole preserved)."""
    folded = []
    dropped = np.zeros(len(vocab), dtype=bool)
    for i, t in enumerate(vocab):
        f = fold_ascii(str(t))
        if f in stop_words:
            dropped[i] = True
            folded.append("")
        else:
            folded.append(f)
    folded_arr = np.array(folded, dtype=object)
    live = ~dropped
    new_vocab, inv = np.unique(folded_arr[live].astype(str), return_inverse=True)
    code_map = np.full(len(vocab), -1, dtype=np.int64)
    code_map[live] = inv
    return code_map, new_vocab.astype(object)


def analyze_folded(text: str, stop_words=None):
    """Query-time chain for a fold_ascii=True index: tokenize -> lower ->
    stop -> fold -> stop re-check. Returns the token list."""
    from ..analysis import ENGLISH_STOP_WORDS, analyze

    if stop_words is None:
        stop_words = ENGLISH_STOP_WORDS
    out = []
    for t in analyze(text, stop_words):
        f = fold_ascii(t)
        if f not in stop_words:
            out.append(f)
    return out

"""StandardAnalyzer-equivalent text analysis chain.

Behavioral model (from public apache/lucene source, behavior only):
  - StandardTokenizer: UAX#29 word-break segmentation, max token length 255
    (longer tokens are split, not dropped)
    [lucene/core/src/java/org/apache/lucene/analysis/standard/StandardTokenizer.java:43-84]
  - LowerCaseFilter: per-code-point Unicode lowercase
    [lucene/core/src/java/org/apache/lucene/analysis/LowerCaseFilter.java:23-38]
  - StopFilter: drops stopwords [lucene/core/src/java/org/apache/lucene/analysis/StopFilter.java:25]
  - StandardAnalyzer default stop set is EMPTY
    [lucene/core/src/java/org/apache/lucene/analysis/standard/StandardAnalyzer.java:51-53];
    EnglishAnalyzer ships the classic 33-word list
    [lucene/analysis/common/src/java/org/apache/lucene/analysis/en/EnglishAnalyzer.java:43-52]

UAX#29 subset implemented (sufficient for source-code corpora):
  - runs of word characters (Unicode letters/digits/underscore) form tokens
    (underscore is ExtendNumLet -> joins, so ``snake_case`` is ONE token);
  - MidNumLet ``.``/``'``/U+2019 join SAME-type runs only (letter-letter:
    ``example.com``, ``can't``; digit-digit: ``1.5``) — mixed boundaries
    split (``sha256.update`` -> sha256, update; ``v1.x`` -> v1, x), matching
    StandardTokenizerImpl.jflex WB6/7 + WB11/12;
  - MidNum ``,`` joins digit runs (``1,024``); MidLetter ``:`` joins letter
    runs; ``_`` (ExtendNumLet) never joins across a joiner;
  - CJK ideographs are emitted one-per-character (Lucene IDEOGRAPHIC tokens);
  - tokens longer than 255 chars are split into 255-char chunks.

This is the single hot UDF of the build; it runs inside Arrow batches
(pandas), never per-row Python at the Spark API level.
"""

from __future__ import annotations

import re
from typing import Iterable, List

import numpy as np
import pandas as pd

MAX_TOKEN_LEN = 255

# The classic 33-word English stop set (EnglishAnalyzer.java:43-52).
ENGLISH_STOP_WORDS = frozenset(
    "a an and are as at be but by for if in into is it no not of on or such "
    "that the their then there these they this to was will with".split()
)

# Word run: letters/digits/underscore. Joiners per UAX#29 subset above.
# CJK ideographs + hiragana break one-per-char; excluded from word runs.
_CJK = r"一-鿿㐀-䶿豈-﫿ぁ-ゟ"
_W = rf"(?:(?![{_CJK}])\w)+"
_WORD_RE = re.compile(
    rf"[{_CJK}]|{_W}(?:[.'’:,]{_W})*",
    re.UNICODE,
)
# ASCII fast path: same token language restricted to ASCII (no CJK, no
# U+2019), without the per-char lookahead -> ~4x faster on code corpora.
_ASCII_WORD_RE = re.compile(r"[0-9A-Za-z_]+(?:[.':,][0-9A-Za-z_]+)*")

# Post-filter for joiners that UAX#29 restricts (StandardTokenizerImpl.jflex
# WB6/7 = ALetter (MidLetter|MidNumLet) ALetter, WB11/12 = Numeric
# (MidNum|MidNumLet) Numeric — the joiner only joins SAME-type neighbors):
#   '.'/'\''/U+2019 (MidNumLet): letter-letter or digit-digit only, so
#       'sha256.update' -> sha256, update and 'v1.x' -> v1, x;
#   ':' (MidLetter): letter-letter only;
#   ',' (MidNum): digit-digit only;
#   '_' (ExtendNumLet) is neither ALetter nor Numeric -> never joins across.
# We split a matched run at every illegal joiner (the joiner is dropped).
_ILLEGAL_JOINER = re.compile(
    r"(?<=\d)[.'’](?=[^\d])|(?<=[^\d])[.'’](?=\d)|(?<=_)[.'’]|[.'’](?=_)"
    r"|(?<=[\d_]):|:(?=[\d_])"
    r"|(?<=\D),|,(?=\D)"
)

# Per-code-point lowercase exceptions where Python's str.lower() (context
# sensitive / multi-char) differs from java.lang.Character.toLowerCase.
_LOWER_FIX = str.maketrans({"İ": "i"})  # LATIN CAPITAL I WITH DOT


def _lower_cp(tok: str) -> str:
    """Per-code-point lowercase matching Character.toLowerCase semantics.

    Python's str.lower() applies final-sigma context rules; Java's
    per-code-point map does not, so a trailing capital sigma must become
    U+03C3, not U+03C2.
    """
    if tok.isascii():
        return tok.lower()
    low = tok.translate(_LOWER_FIX).lower()
    if low.endswith("ς") and not tok.endswith("ς"):
        low = low[:-1] + "σ"
    return low


def tokenize(text: str) -> List[str]:
    """StandardTokenizer-equivalent: UAX#29-subset segmentation, 255-char split."""
    if not text:
        return []
    out: List[str] = []
    word_re = _ASCII_WORD_RE if text.isascii() else _WORD_RE
    for run in word_re.findall(text):
        if "." in run or "'" in run or "’" in run or ":" in run or "," in run:
            pieces: Iterable[str] = _ILLEGAL_JOINER.split(run)
        else:
            pieces = (run,)
        for sp in pieces:
            sp = sp.strip(".'’:,")
            if not sp:
                continue
            while len(sp) > MAX_TOKEN_LEN:
                out.append(sp[:MAX_TOKEN_LEN])
                sp = sp[MAX_TOKEN_LEN:]
            if sp:
                out.append(sp)
    return out


def analyze(text: str, stop_words: frozenset = ENGLISH_STOP_WORDS) -> List[str]:
    """Full chain: tokenize -> lowercase -> stop filter (one string)."""
    return [t for tok in tokenize(text) if (t := _lower_cp(tok)) not in stop_words]


def analyze_with_positions(
    text: str, stop_words: frozenset = ENGLISH_STOP_WORDS
) -> List[tuple]:
    """Like analyze() but yields (term, position) where position is the
    token's index in the PRE-stop-filter token stream: StopFilter preserves
    position increments of removed tokens [StopFilter.java:96-97,
    FilteringTokenFilter.java:29-50], so stopwords consume positions and
    phrase matching sees the holes."""
    out: List[tuple] = []
    for pos, tok in enumerate(tokenize(text)):
        low = _lower_cp(tok)
        if low not in stop_words:
            out.append((low, pos))
    return out


def analyze_batch(texts: pd.Series, stop_words: frozenset = ENGLISH_STOP_WORDS) -> pd.Series:
    """Arrow-batch analyze: pd.Series[str] -> pd.Series[list[str]].

    The regex work is per-row Python inside the batch (same as any
    tokenizer), but the Spark boundary is a vectorized pandas UDF.
    """
    vals = texts.to_numpy(dtype=object)
    out = np.empty(len(vals), dtype=object)
    for i, t in enumerate(vals):
        out[i] = analyze(t if isinstance(t, str) else "", stop_words)
    return pd.Series(out, index=texts.index)


def flat_code_tokens(
    arr,
    stop_words: frozenset = ENGLISH_STOP_WORDS,
    with_positions: bool = False,
):
    """Arrow-native analyze for the index build hot path.

    Input: pa.Array/ChunkedArray of strings. Output:
      (codes int64[np], docix int64[np], vocab object[np][, positions int64[np]])
    where ``vocab[codes[i]]`` is the i-th surviving token of doc
    ``docix[i]``, tokens in document order within each doc. With
    ``with_positions`` each token also carries its index in the
    pre-stop-filter token stream (StopFilter position-increment semantics,
    see analyze_with_positions).

    The whole chain (lowercase, segment, empty/stop filter, dictionary
    encode) runs in Arrow C kernels — NO per-token Python objects; only
    the vocab (unique terms) materializes as Python strings. Docs that
    need the full UAX#29 treatment (non-ASCII, joiner chars, >255-char
    tokens) fall back to the reference ``analyze`` per doc; results are
    identical to ``analyze`` on every input (tested).
    """
    import pyarrow as pa
    import pyarrow.compute as pc

    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    n = len(arr)
    if n == 0:
        empty = (
            np.empty(0, dtype=np.int64),
            np.empty(0, dtype=np.int64),
            np.empty(0, dtype=object),
        )
        return empty + (np.empty(0, dtype=np.int64),) if with_positions else empty

    is_ascii = pc.string_is_ascii(arr.fill_null("")).to_numpy(zero_copy_only=False)
    clean = pc.if_else(pa.array(is_ascii), arr.fill_null(""), pa.scalar(""))
    lower = pc.ascii_lower(clean)
    lists = pc.split_pattern_regex(lower, pattern=r"[^0-9a-z_.':,]+")
    flat = pc.list_flatten(lists)
    # doc index per flat token via the Arrow kernel (np.repeat is slow)
    docix = pc.list_parent_indices(lists).to_numpy(zero_copy_only=False).astype(np.int64)
    flen = pc.binary_length(flat).to_numpy(zero_copy_only=False)
    keep = flen > 0
    # tokens needing UAX joiner rules / 255-char splitting -> doc fallback
    has_joiner = pc.match_substring_regex(flat, r"[.':,]").to_numpy(zero_copy_only=False)
    bad_tok = keep & (has_joiner | (flen > MAX_TOKEN_LEN))
    bad_docs = np.unique(docix[bad_tok])
    fallback_docs = np.union1d(bad_docs, np.flatnonzero(~is_ascii))
    if len(fallback_docs):
        in_bad = np.zeros(n, dtype=bool)
        in_bad[fallback_docs] = True
        keep &= ~in_bad[docix]
    flat_good = flat.filter(pa.array(keep))
    docix = docix[keep]
    positions = None
    if with_positions:
        # token index within its doc among non-empty tokens == the
        # pre-stop-filter token-stream position (empties from the regex
        # split are separators, not tokens; docix is sorted ascending)
        first_idx = np.searchsorted(docix, docix, side="left")
        positions = np.arange(len(docix), dtype=np.int64) - first_idx

    enc = pc.dictionary_encode(flat_good.combine_chunks() if isinstance(flat_good, pa.ChunkedArray) else flat_good)
    codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    vocab_list = enc.dictionary.to_pylist()
    # stop filter via vocab mask (vocab-sized work, not token-sized);
    # removed stopwords keep consuming positions (StopFilter semantics)
    if stop_words and vocab_list:
        stop_mask = np.fromiter((v in stop_words for v in vocab_list), dtype=bool, count=len(vocab_list))
        km = ~stop_mask[codes]
        codes, docix = codes[km], docix[km]
        if positions is not None:
            positions = positions[km]

    if len(fallback_docs):
        vmap = {v: i for i, v in enumerate(vocab_list)}
        extra_codes: List[int] = []
        extra_docix: List[int] = []
        extra_pos: List[int] = []
        for d in fallback_docs:
            text = arr[int(d)].as_py()
            for tok, pos in analyze_with_positions(
                text if isinstance(text, str) else "", stop_words
            ):
                c = vmap.get(tok)
                if c is None:
                    c = len(vocab_list)
                    vmap[tok] = c
                    vocab_list.append(tok)
                extra_codes.append(c)
                extra_docix.append(int(d))
                extra_pos.append(pos)
        if extra_codes:
            codes = np.concatenate((codes, np.array(extra_codes, dtype=np.int64)))
            docix = np.concatenate((docix, np.array(extra_docix, dtype=np.int64)))
            if positions is not None:
                positions = np.concatenate((positions, np.array(extra_pos, dtype=np.int64)))

    vocab = np.array(vocab_list, dtype=object)
    if with_positions:
        return codes, docix, vocab, positions
    return codes, docix, vocab


def make_analyze_udf(stop_words: frozenset = ENGLISH_STOP_WORDS):
    """Build the @pandas_udf('array<string>') for the Spark plan."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("array<string>")
    def analyze_udf(texts: pd.Series) -> pd.Series:
        return analyze_batch(texts, stop_words)

    return analyze_udf

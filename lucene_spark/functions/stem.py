"""Porter stemming + possessive stripping (EnglishAnalyzer tail).

Behavioral model of the reference chain (behavior only):
  EnglishPossessiveFilter  [lucene/analysis/common/src/java/org/apache/
                            lucene/analysis/en/EnglishPossessiveFilter.java:33]
      strips a trailing 's / ’s / ʼs.
  PorterStemFilter         [analysis/common/.../en/PorterStemFilter.java:51,
                            PorterStemmer.java — Martin Porter's 1980
                            algorithm, with the reference implementation's
                            two published departures: step2 bli->ble and
                            logi->log]

Index integration: stemming is 1:1 per token, so the builder applies it to
the dictionary-encoded VOCAB after tokenize/stop (O(unique terms), not
O(tokens)) and remaps codes — the Arrow hot path stays Python-free per
token. Possessive stripping happens before the stop re-check, matching
the reference's filter order (possessive -> stop -> stem).
"""

from __future__ import annotations

from typing import FrozenSet, Tuple

import numpy as np

_VOWELS = set("aeiou")

_APOSTROPHES = ("'s", "’s", "ʼs")


def strip_possessive(word: str) -> str:
    """EnglishPossessiveFilter: drop a trailing 's (any apostrophe form)."""
    for suf in _APOSTROPHES:
        if word.endswith(suf):
            return word[: -len(suf)]
    return word


def _is_cons(w: str, i: int) -> bool:
    c = w[i]
    if c in _VOWELS:
        return False
    if c == "y":
        return i == 0 or not _is_cons(w, i - 1)
    return True


def _measure(stem: str) -> int:
    """m = number of VC sequences in the stem."""
    m = 0
    i = 0
    n = len(stem)
    while i < n and _is_cons(stem, i):
        i += 1
    while i < n:
        while i < n and not _is_cons(stem, i):
            i += 1
        if i >= n:
            break
        m += 1
        while i < n and _is_cons(stem, i):
            i += 1
    return m


def _has_vowel(stem: str) -> bool:
    return any(not _is_cons(stem, i) for i in range(len(stem)))


def _ends_double_cons(w: str) -> bool:
    return len(w) >= 2 and w[-1] == w[-2] and _is_cons(w, len(w) - 1)


def _cvc(w: str) -> bool:
    """*o: stem ends cvc where the final c is not w, x, or y."""
    if len(w) < 3:
        return False
    if not (_is_cons(w, len(w) - 3) and not _is_cons(w, len(w) - 2)
            and _is_cons(w, len(w) - 1)):
        return False
    return w[-1] not in "wxy"


def porter_stem(word: str) -> str:
    """Classic Porter stemmer (paper order: steps 1a/1b/1c/2/3/4/5a/5b)."""
    w = word
    if len(w) <= 2:
        return w

    # step 1a
    if w.endswith("sses"):
        w = w[:-2]
    elif w.endswith("ies"):
        w = w[:-2]
    elif w.endswith("ss"):
        pass
    elif w.endswith("s"):
        w = w[:-1]

    # step 1b
    if w.endswith("eed"):
        if _measure(w[:-3]) > 0:
            w = w[:-1]
    else:
        done = False
        if w.endswith("ed") and _has_vowel(w[:-2]):
            w = w[:-2]
            done = True
        elif w.endswith("ing") and _has_vowel(w[:-3]):
            w = w[:-3]
            done = True
        if done:
            if w.endswith(("at", "bl", "iz")):
                w = w + "e"
            elif _ends_double_cons(w) and w[-1] not in "lsz":
                w = w[:-1]
            elif _measure(w) == 1 and _cvc(w):
                w = w + "e"

    # step 1c
    if w.endswith("y") and _has_vowel(w[:-1]):
        w = w[:-1] + "i"

    # step 2 (m>0), incl. the reference departures bli->ble and logi->log
    for suf, rep in (
        ("ational", "ate"), ("tional", "tion"), ("enci", "ence"),
        ("anci", "ance"), ("izer", "ize"), ("bli", "ble"), ("alli", "al"),
        ("entli", "ent"), ("eli", "e"), ("ousli", "ous"),
        ("ization", "ize"), ("ation", "ate"), ("ator", "ate"),
        ("alism", "al"), ("iveness", "ive"), ("fulness", "ful"),
        ("ousness", "ous"), ("aliti", "al"), ("iviti", "ive"),
        ("biliti", "ble"), ("logi", "log"),
    ):
        if w.endswith(suf):
            if _measure(w[: -len(suf)]) > 0:
                w = w[: -len(suf)] + rep
            break

    # step 3 (m>0)
    for suf, rep in (
        ("icate", "ic"), ("ative", ""), ("alize", "al"), ("iciti", "ic"),
        ("ical", "ic"), ("ful", ""), ("ness", ""),
    ):
        if w.endswith(suf):
            if _measure(w[: -len(suf)]) > 0:
                w = w[: -len(suf)] + rep
            break

    # step 4 (m>1)
    for suf in (
        "al", "ance", "ence", "er", "ic", "able", "ible", "ant", "ement",
        "ment", "ent", "ion", "ou", "ism", "ate", "iti", "ous", "ive",
        "ize",
    ):
        if w.endswith(suf):
            stem = w[: -len(suf)]
            if _measure(stem) > 1:
                if suf == "ion" and (not stem or stem[-1] not in "st"):
                    pass  # (*S or *T) condition fails: keep
                else:
                    w = stem
            break

    # step 5a
    if w.endswith("e"):
        m = _measure(w[:-1])
        if m > 1 or (m == 1 and not _cvc(w[:-1])):
            w = w[:-1]
    # step 5b
    if _measure(w) > 1 and _ends_double_cons(w) and w.endswith("l"):
        w = w[:-1]
    return w


def stem_vocab_remap(
    vocab: np.ndarray, stop_words: FrozenSet[str]
) -> Tuple[np.ndarray, np.ndarray]:
    """Apply possessive-strip -> stop re-check -> Porter to a dictionary
    vocab. Returns (code_map, new_vocab): ``code_map[old_code]`` is the
    new code, or -1 when the token drops out (post-possessive stopword).
    New vocab is sorted unique stems."""
    stems = []
    dropped = np.zeros(len(vocab), dtype=bool)
    for i, t in enumerate(vocab):
        t2 = strip_possessive(t)
        if t2 in stop_words:
            dropped[i] = True
            stems.append("")
        else:
            stems.append(porter_stem(t2))
    stems_arr = np.array(stems, dtype=object)
    live = ~dropped
    new_vocab, inv = np.unique(stems_arr[live].astype(str), return_inverse=True)
    code_map = np.full(len(vocab), -1, dtype=np.int64)
    code_map[live] = inv
    return code_map, new_vocab.astype(object)

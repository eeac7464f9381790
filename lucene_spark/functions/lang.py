"""Language analyzer packs: European light stemmers + elision.

Behavioral spec is the reference's analyzer chains (re-derived rule by
rule, no code reuse — the implementations below are plain Python over
whole strings, where the reference mutates char[] buffers in place):

  french      StandardTokenizer -> Elision(articles) -> LowerCase ->
              Stop(french) -> FrenchLightStemFilter
              (FrenchAnalyzer.java:129-134; FrenchLightStemmer.java —
              the UniNE light stemmer, Savoy, "Light Stemming Approaches
              for the French, Portuguese, German and Hungarian Languages")
  german      LowerCase -> Stop(german) -> GermanNormalizationFilter ->
              GermanLightStemFilter (GermanAnalyzer.java:129-133,
              GermanNormalizationFilter.java:33-101 FSM,
              GermanLightStemmer.java)
  spanish     LowerCase -> Stop(spanish) -> SpanishLightStemFilter
              (SpanishAnalyzer.java:115-118, SpanishLightStemmer.java)
  italian     Elision(articles) -> LowerCase -> Stop(italian) ->
              ItalianLightStemFilter (ItalianAnalyzer.java:125-129,
              ItalianLightStemmer.java)
  portuguese  LowerCase -> Stop(portuguese) -> PortugueseLightStemFilter
              (PortugueseAnalyzer.java:115-118,
              PortugueseLightStemmer.java)
  swedish / finnish / russian / hungarian
              LowerCase -> Stop(snowball list) -> <Lang>LightStemFilter
              (sv/SwedishLightStemmer.java, fi/FinnishLightStemmer.java,
              ru/RussianLightStemmer.java, hu/HungarianLightStemmer.java).
              NOTE: these four analyzers DEFAULT to SnowballFilter in the
              reference; the packs mirror the shipped *LightStemFilter
              chains (the UniNE light option) — documented departure.

All nine stemmers are pure token->token functions, so the engine applies
them as VOCAB-level remaps (one call per unique term, numpy code remap —
the same distributed pattern as functions/stem.py Porter): per-token cost
never touches the per-posting hot path, and the Arrow tokenizer kernel
stays unchanged. Validated against the reference's published vocabulary
test data (fr/de/es/it/pt/sv/fi/ru/hu light vectors, ~310k pairs total,
100% each; every-12th samples committed under tests/data,
tests/test_lang_packs.py).
"""

from __future__ import annotations

from typing import Dict, FrozenSet, Optional, Tuple

import numpy as np

from .lang_stops import (
    FINNISH_STOP_WORDS,
    FRENCH_STOP_WORDS,
    GERMAN_STOP_WORDS,
    HUNGARIAN_STOP_WORDS,
    ITALIAN_STOP_WORDS,
    PORTUGUESE_STOP_WORDS,
    RUSSIAN_STOP_WORDS,
    SPANISH_STOP_WORDS,
    SWEDISH_STOP_WORDS,
)

__all__ = [
    "LANG_PACKS",
    "analyze_lang",
    "elide",
    "finnish_light_stem",
    "french_light_stem",
    "german_light_stem",
    "german_normalize",
    "hungarian_light_stem",
    "italian_light_stem",
    "lang_vocab_remap",
    "portuguese_light_stem",
    "russian_light_stem",
    "spanish_light_stem",
    "swedish_light_stem",
]

# ElisionFilter article sets (FrenchAnalyzer.java:56-62,
# ItalianAnalyzer.java:48-54); matching is case-insensitive in the
# reference — tokens here are already lowercased upstream
FRENCH_ARTICLES = frozenset(
    "l m t qu n s j d c jusqu quoiqu lorsqu puisqu".split()
)
ITALIAN_ARTICLES = frozenset(
    "c l all dall dell nell sull coll pell gl agl dagl degl negl sugl "
    "un m t s v d".split()
)


def elide(token: str, articles: FrozenSet[str]) -> str:
    """ElisionFilter.java:61-79: find the FIRST apostrophe (U+0027 or
    U+2019); if the prefix before it is an article, strip prefix AND
    apostrophe; otherwise leave the token untouched."""
    for i, ch in enumerate(token):
        if ch == "'" or ch == "’":
            if token[:i] in articles:
                return token[i + 1 :]
            return token
    return token


# ---------------------------------------------------------------------------
# German (GermanNormalizationFilter.java + GermanLightStemmer.java)
# ---------------------------------------------------------------------------

_DE_ST_ENDING = frozenset("bdfghklmnt")


def german_normalize(token: str) -> str:
    """The 3-state FSM: fold umlauts, expand eszett, and delete an 'e'
    directly after a/o/u-in-umlaut-state ("ue" -> "u" etc., but not after
    i/q/y or a consumed vowel pair)."""
    N, V, U = 0, 1, 2
    state = N
    out = []
    for c in token:
        if c in ("a", "o"):
            out.append(c)
            state = U
        elif c == "u":
            out.append(c)
            state = U if state == N else V
        elif c == "e":
            if state != U:
                out.append(c)
            state = V
        elif c in ("i", "q", "y"):
            out.append(c)
            state = V
        elif c == "ä":
            out.append("a")
            state = V
        elif c == "ö":
            out.append("o")
            state = V
        elif c == "ü":
            out.append("u")
            state = V
        elif c == "ß":
            out.append("ss")
            state = N
        else:
            out.append(c)
            state = N
    return "".join(out)


_DE_FOLD = str.maketrans("äàáâöòóôïìíîüùúû", "aaaaooooiiiiuuuu")


def german_light_stem(token: str) -> str:
    """UniNE German light: accent fold, then two suffix-strip passes
    (plural/case endings, then superlative/inflection endings)."""
    s = token.translate(_DE_FOLD)

    # step 1 (first match wins)
    n = len(s)
    if n > 5 and s.endswith("ern"):
        s = s[:-3]
    elif n > 4 and n >= 2 and s[-2] == "e" and s[-1] in ("m", "n", "r", "s"):
        s = s[:-2]
    elif n > 3 and s[-1] == "e":
        s = s[:-1]
    elif n > 3 and s[-1] == "s" and s[-2] in _DE_ST_ENDING:
        s = s[:-1]

    # step 2 (first match wins)
    n = len(s)
    if n > 5 and s.endswith("est"):
        s = s[:-3]
    elif n > 4 and s[-2] == "e" and s[-1] in ("r", "n"):
        s = s[:-2]
    elif n > 4 and s.endswith("st") and s[-3] in _DE_ST_ENDING:
        s = s[:-2]
    return s


# ---------------------------------------------------------------------------
# Spanish (SpanishLightStemmer.java)
# ---------------------------------------------------------------------------

_ES_FOLD = str.maketrans("àáâäòóôöèéêëùúûüìíîï", "aaaaoooo" "eeeeuuuuiiii")


def spanish_light_stem(token: str) -> str:
    if len(token) < 5:
        return token
    s = token.translate(_ES_FOLD)
    last = s[-1]
    if last in ("o", "a", "e"):
        return s[:-1]
    if last == "s":
        if s.endswith("eses"):
            return s[:-2]
        if s.endswith("ces"):
            return s[:-3] + "z"
        if s[-2] in ("o", "a", "e"):
            return s[:-2]
    return s


# ---------------------------------------------------------------------------
# Italian (ItalianLightStemmer.java)
# ---------------------------------------------------------------------------

_IT_FOLD = _ES_FOLD  # same accent table


def italian_light_stem(token: str) -> str:
    if len(token) < 6:
        return token
    s = token.translate(_IT_FOLD)
    last, prev = s[-1], s[-2]
    if last == "e":
        return s[:-2] if prev in ("i", "h") else s[:-1]
    if last == "i":
        return s[:-2] if prev in ("h", "i") else s[:-1]
    if last in ("a", "o"):
        return s[:-2] if prev == "i" else s[:-1]
    return s


# ---------------------------------------------------------------------------
# Portuguese (PortugueseLightStemmer.java)
# ---------------------------------------------------------------------------

_PT_FOLD = str.maketrans("àáâäãòóôöõèéêëùúûüìíîïç", "aaaaaooooo" "eeeeuuuuiiiic")


def _pt_remove_suffix(s: str) -> str:
    n = len(s)
    if n > 4 and s.endswith("es") and s[-3] in ("r", "s", "l", "z"):
        return s[:-2]
    if n > 3 and s.endswith("ns"):
        return s[:-2] + "m"
    if n > 4 and (s.endswith("eis") or s.endswith("éis")):
        return s[:-3] + "el"
    if n > 4 and s.endswith("ais"):
        return s[:-3] + "al"
    if n > 4 and s.endswith("óis"):
        return s[:-3] + "ol"
    if n > 4 and s.endswith("is"):
        return s[:-1] + "l"
    if n > 3 and (s.endswith("ões") or s.endswith("ães")):
        return s[:-3] + "ão"
    if n > 6 and s.endswith("mente"):
        return s[:-5]
    if n > 3 and s[-1] == "s":
        return s[:-1]
    return s


def _pt_norm_feminine(s: str) -> str:
    n = len(s)
    if n > 7 and (s.endswith("inha") or s.endswith("iaca") or s.endswith("eira")):
        return s[:-1] + "o"
    if n > 6:
        if s.endswith(("osa", "ica", "ida", "ada", "iva", "ama")):
            return s[:-1] + "o"
        if s.endswith("ona"):
            return s[:-3] + "ão"
        if s.endswith("ora"):
            return s[:-1]
        if s.endswith("esa"):
            return s[:-3] + "ês"
        if s.endswith("na"):
            return s[:-1] + "o"
    return s


def portuguese_light_stem(token: str) -> str:
    if len(token) < 4:
        return token
    s = _pt_remove_suffix(token)
    if len(s) > 3 and s[-1] == "a":
        s = _pt_norm_feminine(s)
    if len(s) > 4 and s[-1] in ("e", "a", "o"):
        s = s[:-1]
    return s.translate(_PT_FOLD)


# ---------------------------------------------------------------------------
# French (FrenchLightStemmer.java — the longest UniNE cascade)
# ---------------------------------------------------------------------------

_FR_FOLD = str.maketrans("àáâôèéêùûîç", "aaaoeeeuuic")


def _fr_norm(s: str) -> str:
    if len(s) > 4:
        s = s.translate(_FR_FOLD)
        # collapse runs of the same letter to one occurrence
        out = [s[0]]
        for ch in s[1:]:
            if ch == out[-1] and ch.isalpha():
                continue
            out.append(ch)
        s = "".join(out)
    if len(s) > 4 and s.endswith("ie"):
        s = s[:-2]
    if len(s) > 4:
        if s[-1] == "r":
            s = s[:-1]
        if s[-1] == "e":
            s = s[:-1]
        if s[-1] == "e":
            s = s[:-1]
        if len(s) >= 2 and s[-1] == s[-2] and s[-1].isalpha():
            s = s[:-1]
    return s


def french_light_stem(token: str) -> str:
    s = token
    if len(s) > 5 and s[-1] == "x":
        if s[-3] == "a" and s[-2] == "u" and s[-4] != "e":
            s = s[:-2] + "l" + s[-1]  # "..aux" -> "..alx" (x dropped next)
        s = s[:-1]
    if len(s) > 3 and s[-1] == "x":
        s = s[:-1]
    if len(s) > 3 and s[-1] == "s":
        s = s[:-1]

    if len(s) > 9 and s.endswith("issement"):
        return _fr_norm(s[:-7] + "r")  # "..issement" -> "..ir"
    if len(s) > 8 and s.endswith("issant"):
        return _fr_norm(s[:-5] + "r")  # "..issant" -> "..ir"
    if len(s) > 6 and s.endswith("ement"):
        s = s[:-4]  # keep the trailing "e"
        if len(s) > 3 and s.endswith("ive"):
            s = s[:-2] + "f"  # "ive" -> "if"
        return _fr_norm(s)
    if len(s) > 11 and s.endswith("ficatrice"):
        return _fr_norm(s[:-5][:-2] + "er")  # "..ficatrice" -> "..fier"
    if len(s) > 10 and s.endswith("ficateur"):
        return _fr_norm(s[:-4][:-2] + "er")  # "..ficateur" -> "..fier"
    if len(s) > 9 and s.endswith("catrice"):
        return _fr_norm(s[:-7] + "quer")  # "..catrice" -> "..quer"
    if len(s) > 8 and s.endswith("cateur"):
        return _fr_norm(s[:-6] + "quer")  # "..cateur" -> "..quer"
    if len(s) > 8 and s.endswith("atrice"):
        return _fr_norm(s[:-6] + "er")  # "..atrice" -> "..er"
    if len(s) > 7 and s.endswith("ateur"):
        return _fr_norm(s[:-5] + "er")  # "..ateur" -> "..er"
    if len(s) > 6 and s.endswith("trice"):
        s = s[:-5] + "teur"  # falls through, no return
    if len(s) > 5 and s.endswith("ième"):
        return _fr_norm(s[:-4])
    if len(s) > 7 and s.endswith("teuse"):
        return _fr_norm(s[:-3] + "r")  # "..teuse" -> "..ter"
    if len(s) > 6 and s.endswith("teur"):
        return _fr_norm(s[:-2] + "r")  # "..teur" -> "..ter"
    if len(s) > 5 and s.endswith("euse"):
        return _fr_norm(s[:-2])  # "..euse" -> "..eu"
    if len(s) > 8 and s.endswith("ère"):
        return _fr_norm(s[:-3] + "er")
    if len(s) > 7 and s.endswith("ive"):
        return _fr_norm(s[:-2] + "f")
    if len(s) > 4 and (s.endswith("folle") or s.endswith("molle")):
        return _fr_norm(s[:-3] + "u")  # fou / mou
    if len(s) > 9 and s.endswith("nnelle"):
        return _fr_norm(s[:-5])
    if len(s) > 9 and s.endswith("nnel"):
        return _fr_norm(s[:-3])
    if len(s) > 4 and s.endswith("ète"):
        s = s[:-3] + "et"  # no return
    if len(s) > 8 and s.endswith("ique"):
        s = s[:-4]  # no return
    if len(s) > 8 and s.endswith("esse"):
        return _fr_norm(s[:-3])  # "..esse" -> "..e"
    if len(s) > 7 and s.endswith("inage"):
        return _fr_norm(s[:-3])  # "..inage" -> "..in"
    if len(s) > 9 and s.endswith("isation"):
        s = s[:-7]
        if len(s) > 5 and s.endswith("ual"):
            s = s[:-2] + "el"  # "ual" -> "uel"
        return _fr_norm(s)
    if len(s) > 9 and s.endswith("isateur"):
        return _fr_norm(s[:-7])
    if len(s) > 8 and s.endswith("ation"):
        return _fr_norm(s[:-5])
    if len(s) > 8 and s.endswith("ition"):
        return _fr_norm(s[:-5])
    return _fr_norm(s)


# ---------------------------------------------------------------------------
# Swedish (SwedishLightStemmer.java) — the reference's DEFAULT
# SwedishAnalyzer stems with Snowball; these packs mirror the shipped
# *LightStemFilter chains (the UniNE light option), documented departure.
# Same note applies to finnish/russian/hungarian below.
# ---------------------------------------------------------------------------


def swedish_light_stem(token: str) -> str:
    s = token
    if len(s) > 4 and s[-1] == "s":
        s = s[:-1]
    n = len(s)
    if n > 7 and (s.endswith("elser") or s.endswith("heten")):
        return s[:-5]
    if n > 6 and s.endswith(("arne", "erna", "ande", "else", "aste", "orna", "aren")):
        return s[:-4]
    if n > 5 and s.endswith(("are", "ast", "het")):
        return s[:-3]
    if n > 4 and s.endswith(("ar", "er", "or", "en", "at", "te", "et")):
        return s[:-2]
    if n > 3 and s[-1] in ("t", "a", "e", "n"):
        return s[:-1]
    return s


# ---------------------------------------------------------------------------
# Russian (RussianLightStemmer.java) — case-suffix strip + normalize
# ---------------------------------------------------------------------------


def russian_light_stem(token: str) -> str:
    s = _ru_remove_case(token)
    n = len(s)
    if n > 3:
        if s[-1] in ("ь", "и"):
            return s[:-1]
        if s[-1] == "н" and s[-2] == "н":
            return s[:-1]
    return s


def _ru_remove_case(s: str) -> str:
    n = len(s)
    if n > 6 and s.endswith(("иями", "оями")):
        return s[:-4]
    if n > 5 and s.endswith((
        "иям", "иях", "оях", "ями", "оям", "оьв", "ами", "его", "ему", "ери",
        "ими", "ого", "ому", "ыми", "оев",
    )):
        return s[:-3]
    if n > 4 and s.endswith((
        "ая", "яя", "ях", "юю", "ах", "ею", "их", "ия", "ию", "ьв", "ою",
        "ую", "ям", "ых", "ея", "ам", "ем", "ей", "ём", "ев", "ий", "им",
        "ое", "ой", "ом", "ов", "ые", "ый", "ым", "ми",
    )):
        return s[:-2]
    if n > 3 and s[-1] in "аеиоуйыяь":
        return s[:-1]
    return s


# ---------------------------------------------------------------------------
# Finnish (FinnishLightStemmer.java)
# ---------------------------------------------------------------------------

_FI_FOLD = str.maketrans("äåö", "aao")
_FI_VOWELS = frozenset("aeiouy")


def finnish_light_stem(token: str) -> str:
    if len(token) < 4:
        return token
    s = token.translate(_FI_FOLD)
    s = _fi_step1(s)
    s = _fi_step2(s)
    s = _fi_step3(s)
    s = _fi_norm1(s)
    return _fi_norm2(s)


def _fi_step1(s: str) -> str:
    if len(s) > 8:
        if s.endswith("kin"):
            return _fi_step1(s[:-3])
        if s.endswith("ko"):
            return _fi_step1(s[:-2])
    if len(s) > 11:
        if s.endswith("dellinen"):
            return s[:-8]
        if s.endswith("dellisuus"):
            return s[:-9]
    return s


def _fi_step2(s: str) -> str:
    if len(s) > 5:
        if s.endswith(("lla", "tse", "sti")):
            return s[:-3]
        if s.endswith("ni"):
            return s[:-2]
        if s.endswith("aa"):
            return s[:-1]
    return s


def _fi_step3(s: str) -> str:
    n = len(s)
    if n > 8:
        if s.endswith("nnen"):
            return s[:-4] + "s"
        if s.endswith("ntena"):
            return s[:-5] + "s"
        if s.endswith("tten"):
            return s[:-4]
        if s.endswith("eiden"):
            return s[:-5]
    if n > 6:
        if s.endswith(("neen", "niin", "seen", "teen", "inen")):
            return s[:-4]
        if s[-3] == "h" and s[-2] in _FI_VOWELS and s[-1] == "n":
            return s[:-3]
        if s.endswith("den"):
            return s[:-3] + "s"
        if s.endswith("ksen"):
            return s[:-4] + "s"
        if s.endswith(("ssa", "sta", "lla", "lta", "tta", "ksi", "lle")):
            return s[:-3]
    if n > 5:
        if s.endswith(("na", "ne")):
            return s[:-2]
        if s.endswith("nei"):
            return s[:-3]
    if n > 4:
        if s.endswith(("ja", "ta")):
            return s[:-2]
        if s[-1] == "a":
            return s[:-1]
        if s[-1] == "n" and s[-2] in _FI_VOWELS:
            return s[:-2]
        if s[-1] == "n":
            return s[:-1]
    return s


def _fi_norm1(s: str) -> str:
    if len(s) > 5 and s.endswith("hde"):
        s = s[:-3] + "ksi"  # mutation only; the cascade continues
    if len(s) > 4 and s.endswith(("ei", "at")):
        return s[:-2]
    if len(s) > 3 and s[-1] in ("t", "s", "j", "e", "a", "i"):
        return s[:-1]
    return s


def _fi_norm2(s: str) -> str:
    if len(s) > 8 and s[-1] in ("e", "o", "u"):
        s = s[:-1]
    if len(s) > 4:
        if s[-1] == "i":
            s = s[:-1]
        if len(s) > 4:
            # collapse runs of k/p/t to one occurrence
            out = [s[0]]
            for ch in s[1:]:
                if ch == out[-1] and ch in ("k", "p", "t"):
                    continue
                out.append(ch)
            s = "".join(out)
    return s


# ---------------------------------------------------------------------------
# Hungarian (HungarianLightStemmer.java)
# ---------------------------------------------------------------------------

_HU_FOLD = str.maketrans("áëéíóőõöúűũûü", "aeeioooouuuuu")
_HU_VOWELS = frozenset("aeiouy")


def hungarian_light_stem(token: str) -> str:
    s = token.translate(_HU_FOLD)
    s = _hu_remove_case(s)
    s = _hu_remove_possessive(s)
    s = _hu_remove_plural(s)
    if len(s) > 3 and s[-1] in ("a", "e", "i", "o"):
        return s[:-1]
    return s


def _hu_remove_case(s: str) -> str:
    n = len(s)
    if n > 6 and s.endswith("kent"):
        return s[:-4]
    if n > 5:
        if s.endswith(("nak", "nek", "val", "vel", "ert", "rol", "ban",
                       "ben", "bol", "nal", "nel", "hoz", "hez", "tol")):
            return s[:-3]
        if s.endswith(("al", "el")):
            if s[-3] not in _HU_VOWELS and s[-3] == s[-4]:
                return s[:-3]
    if n > 4:
        if s.endswith(("at", "et", "ot", "va", "ve", "ra", "re", "ba",
                       "be", "ul", "ig")):
            return s[:-2]
        if s.endswith(("on", "en")) and s[-3] not in _HU_VOWELS:
            return s[:-2]
        if s[-1] in ("t", "n"):
            return s[:-1]
        if s[-1] in ("a", "e") and s[-2] == s[-3] and s[-2] not in _HU_VOWELS:
            return s[:-2]
    return s


def _hu_remove_possessive(s: str) -> str:
    n = len(s)
    if n > 6:
        if s[-5] not in _HU_VOWELS and s.endswith(("atok", "otok", "etek")):
            return s[:-4]
        if s.endswith(("itek", "itok")):
            return s[:-4]
    if n > 5:
        if s[-4] not in _HU_VOWELS and s.endswith(("unk", "tok", "tek")):
            return s[:-3]
        if s[-4] in _HU_VOWELS and s.endswith("juk"):
            return s[:-3]
        if s.endswith("ink"):
            return s[:-3]
    if n > 4:
        if s[-3] not in _HU_VOWELS and s.endswith(
                ("am", "em", "om", "ad", "ed", "od", "uk")):
            return s[:-2]
        if s[-3] in _HU_VOWELS and s.endswith(("nk", "ja", "je")):
            return s[:-2]
        if s.endswith(("im", "id", "ik")):
            return s[:-2]
    if n > 3:
        if s[-1] in ("a", "e") and s[-2] not in _HU_VOWELS:
            return s[:-1]
        if s[-1] in ("m", "d") and s[-2] in _HU_VOWELS:
            return s[:-1]
        if s[-1] == "i":
            return s[:-1]
    return s


def _hu_remove_plural(s: str) -> str:
    if len(s) > 3 and s[-1] == "k":
        if s[-2] in ("a", "o", "e") and len(s) > 4:
            return s[:-2]
        return s[:-1]  # the reference's intentional fallthrough
    return s


# ---------------------------------------------------------------------------
# Pack registry + vocab remap (the builder/query seam)
# ---------------------------------------------------------------------------


class LanguagePack:
    """One analyzer pack: default stop set, optional elision article set
    (runs BEFORE stop filtering, like the reference chain), and the
    normalize+stem function (runs after)."""

    def __init__(self, stop_words, articles, stem_fn):
        self.stop_words = stop_words
        self.articles = articles
        self.stem_fn = stem_fn

    def transform(self, token: str, stop_words) -> Optional[str]:
        """Full post-tokenize chain for one lowercased token; None = the
        token stops out (elision can surface a stopword: qu'il -> il)."""
        if self.articles is not None:
            token = elide(token, self.articles)
            if not token or token in stop_words:
                return None
        return self.stem_fn(token)


def _german_chain(token: str) -> str:
    return german_light_stem(german_normalize(token))


LANG_PACKS: Dict[str, LanguagePack] = {
    "french": LanguagePack(FRENCH_STOP_WORDS, FRENCH_ARTICLES, french_light_stem),
    "german": LanguagePack(GERMAN_STOP_WORDS, None, _german_chain),
    "spanish": LanguagePack(SPANISH_STOP_WORDS, None, spanish_light_stem),
    "italian": LanguagePack(ITALIAN_STOP_WORDS, ITALIAN_ARTICLES, italian_light_stem),
    "portuguese": LanguagePack(PORTUGUESE_STOP_WORDS, None, portuguese_light_stem),
    "swedish": LanguagePack(SWEDISH_STOP_WORDS, None, swedish_light_stem),
    "finnish": LanguagePack(FINNISH_STOP_WORDS, None, finnish_light_stem),
    "russian": LanguagePack(RUSSIAN_STOP_WORDS, None, russian_light_stem),
    "hungarian": LanguagePack(HUNGARIAN_STOP_WORDS, None, hungarian_light_stem),
}


def lang_vocab_remap(
    vocab, lang: str, stop_words
) -> Tuple[np.ndarray, list]:
    """Map each unique term through the pack chain and build a dense
    old-code -> new-code map (-1 = token drops; its position hole is
    preserved by the caller, StopFilter position-increment semantics).
    Same shape as functions/stem.py stem_vocab_remap, so the builder's
    remap plumbing is shared."""
    pack = LANG_PACKS[lang]
    toks = [t.as_py() if hasattr(t, "as_py") else t for t in vocab]
    outs = []
    dropped = np.zeros(len(toks), dtype=bool)
    for i, t in enumerate(toks):
        out = pack.transform(t, stop_words)
        if out is None or not out:
            dropped[i] = True
            outs.append("")
        else:
            outs.append(out)
    outs_arr = np.array(outs, dtype=object)
    live = ~dropped
    code_map = np.full(len(toks), -1, dtype=np.int64)
    if live.any():
        new_vocab, inv = np.unique(outs_arr[live].astype(str), return_inverse=True)
        code_map[live] = inv
    else:
        new_vocab = np.empty(0, dtype=object)
    return code_map, new_vocab.astype(object)


def analyze_lang(text: str, lang: str, stop_words=None) -> list:
    """Query-time analysis under a language pack: UAX#29 tokenize +
    lowercase (the shared Arrow kernel path), the pack's stop set, then
    elision/normalize/stem — the exact index-time chain, for query terms."""
    from ..analysis import analyze

    pack = LANG_PACKS[lang]
    stops = pack.stop_words if stop_words is None else stop_words
    out = []
    for tok in analyze(text, stop_words=frozenset()):
        if tok in stops:
            continue
        r = pack.transform(tok, stops)
        if r:
            out.append(r)
    return out

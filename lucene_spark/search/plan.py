"""Query IR + parser + normalizer.

Query tree mirrors Lucene's (behavior only):
  TermQuery    [lucene/core/src/java/org/apache/lucene/search/TermQuery.java:44]
  BooleanQuery occurs MUST / SHOULD / MUST_NOT / FILTER
               [search/BooleanClause.java, BooleanQuery.java:40]
  MatchAllDocs / MatchNoDocs [search/MatchAllDocsQuery.java:23, MatchNoDocsQuery.java:23]
  PrefixQuery / TermInSetQuery rewrite to term-dictionary scans
               [search/PrefixQuery.java:29, TermInSetQuery.java:73]

The normalizer implements the BooleanQuery.rewrite fixpoint rules that
Catalyst cannot see (SURVEY.md §4.1, BooleanQuery.java:269-470), including
the SHOULD-duplicate dedup that produces linear qtf weights
[BooleanQuery.java:429-446, BM25Similarity.java:130-136].

Parser syntax (QueryParser.jj subset): free text (implicit OR), AND, OR,
NOT/-, +term, parentheses, field-less terms only. Query-time terms are
normalized with the same analyzer chain [StandardAnalyzer.java:100].
"""

from __future__ import annotations

from collections import Counter
from dataclasses import dataclass, field
from typing import Dict, List, Sequence, Tuple

from ..analysis import ENGLISH_STOP_WORDS, analyze


@dataclass(frozen=True)
class Term:
    text: str


@dataclass(frozen=True)
class MatchNone:
    pass


@dataclass(frozen=True)
class NormalizedQuery:
    """Flat normalized boolean query (sufficient for AND/OR/NOT over terms).

    - ``required``: terms that MUST match (AND, scoring)
    - ``optional``: (term, qtf) SHOULD clauses; qtf = linear weight from
      duplicate dedup
    - ``excluded``: MUST_NOT terms
    An empty query (all clauses dropped) is MatchNone.
    """

    required: Tuple[Tuple[str, int], ...] = ()
    optional: Tuple[Tuple[str, int], ...] = ()
    excluded: Tuple[str, ...] = ()

    @property
    def is_match_none(self) -> bool:
        return not self.required and not self.optional

    @property
    def scoring_terms(self) -> Dict[str, int]:
        d = dict(self.required)
        for t, w in self.optional:
            d[t] = d.get(t, 0) + w
        return d


def normalize(
    must: Sequence[str] = (),
    should: Sequence[str] = (),
    must_not: Sequence[str] = (),
    stop_words=ENGLISH_STOP_WORDS,
    pre_analyzed: bool = False,
) -> NormalizedQuery:
    """Analyze + apply the BooleanQuery.rewrite normalizations.

    Rules (BooleanQuery.java):
      :269-276  empty / pure-negative boolean -> MatchNone
      :344-363  dedup MUST_NOT
      :365-375  term both MUST and MUST_NOT -> MatchNone
      :429-446  duplicate SHOULD terms -> single clause with qtf weight;
                duplicate MUST terms -> qtf weight on the required term
    """

    def norm_terms(words: Sequence[str]) -> List[str]:
        if pre_analyzed:
            return [w for w in words if w not in stop_words]
        out: List[str] = []
        for w in words:
            out.extend(analyze(w, stop_words))
        return out

    must_n = norm_terms(must)
    should_n = norm_terms(should)
    not_n = norm_terms(must_not)

    must_c = Counter(must_n)
    # a SHOULD that is also MUST adds its qtf to the required clause
    should_c = Counter(should_n)
    for t in list(should_c):
        if t in must_c:
            must_c[t] += should_c.pop(t)
    not_set = tuple(sorted(set(not_n)))

    if any(t in not_set for t in must_c):  # MUST & MUST_NOT -> MatchNone
        return NormalizedQuery()
    should_c = Counter({t: w for t, w in should_c.items() if t not in not_set})

    return NormalizedQuery(
        required=tuple(sorted(must_c.items())),
        optional=tuple(sorted(should_c.items())),
        excluded=not_set,
    )


def parse(query: str, stop_words=ENGLISH_STOP_WORDS) -> NormalizedQuery:
    """Tiny QueryParser: ``a AND b``, ``a OR b``, ``NOT c`` / ``-c``,
    ``+required``, free text = implicit SHOULD. No nesting (parity scope
    per SURVEY.md §3.3 note)."""
    must: List[str] = []
    should: List[str] = []
    must_not: List[str] = []
    tokens = query.replace("(", " ").replace(")", " ").split()
    i = 0
    pending_not = False
    saw_and = "AND" in tokens
    words: List[Tuple[str, str]] = []  # (op, word)
    while i < len(tokens):
        w = tokens[i]
        if w == "NOT":
            pending_not = True
        elif w in ("AND", "OR"):
            pass
        elif w.startswith("-") and len(w) > 1:
            words.append(("not", w[1:]))
        elif w.startswith("+") and len(w) > 1:
            words.append(("must", w[1:]))
        else:
            words.append(("not" if pending_not else "word", w))
            pending_not = False
        i += 1
    for op, w in words:
        if op == "not":
            must_not.append(w)
        elif op == "must":
            must.append(w)
        elif saw_and:
            must.append(w)  # conjunctive context: bare words are MUST
        else:
            should.append(w)
    return normalize(must, should, must_not, stop_words)

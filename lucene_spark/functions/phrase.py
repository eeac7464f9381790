"""Phrase matchers over per-doc position lists (behavioral model of the
public apache/lucene matchers, behavior only):

  exact  [lucene/core/src/java/org/apache/lucene/search/ExactPhraseMatcher.java:149]
      leapfrog alignment of adjusted positions; every alignment contributes
      sloppyWeight 1, so phraseFreq == number of start positions where all
      terms line up. Set-intersection of (position - offset) is equivalent.

  sloppy [lucene/core/src/java/org/apache/lucene/search/SloppyPhraseMatcher.java:205]
      greedy priority-queue traversal that always advances the least
      PhrasePosition; each match contributes sloppyWeight = 1/(1+matchLength)
      [SloppyPhraseMatcher.java:200-202]. Like Lucene, not all valid
      combinations are enumerated (the class javadoc documents the same
      asymmetry, e.g. "a b"~2 on "x a b a y" matches twice: distances 0 and
      2). Repeating phrase terms (Lucene's rptGroups machinery,
      SloppyPhraseMatcher.java:317-) are NOT supported here — exact phrases
      handle repeats fine via alignment.

The scorer treats phraseFreq as the BM25 freq with weight = sum of the
terms' idfs [BM25Similarity.java:198-205, PhraseQuery.java:455-490].
"""

from __future__ import annotations

import heapq
from typing import List, Sequence

import numpy as np


def exact_phrase_freq(positions_per_term: Sequence, offsets: Sequence[int]) -> int:
    """Number of exact alignments: |∩_i (positions_i - offset_i)|."""
    sets = None
    for plist, off in zip(positions_per_term, offsets):
        s = {int(p) - int(off) for p in plist}
        sets = s if sets is None else (sets & s)
        if not sets:
            return 0
    return len(sets or ())


def sloppy_match_lengths(
    positions_per_term: Sequence, offsets: Sequence[int], slop: int
) -> List[int]:
    """matchLength of every match found by the greedy pq traversal
    (SloppyPhraseMatcher.nextMatch, non-repeating terms). phraseFreq is
    sum(1/(1+ml)). Positions must be ascending per term."""
    adj = []
    for plist, off in zip(positions_per_term, offsets):
        a = [int(p) - int(off) for p in plist]
        if not a:
            return []
        adj.append(a)
    n = len(adj)
    if n < 2:
        return []

    # pp state: current index per ord; pq entries (position, offset, ord)
    idx = [0] * n
    end = max(a[0] for a in adj)
    heap = [(adj[o][0], int(offsets[o]), o) for o in range(n)]
    heapq.heapify(heap)

    out: List[int] = []
    positioned = True
    while positioned:
        pos, off, o = heapq.heappop(heap)
        match_length = end - pos
        next_pos = heap[0][0]
        matched = False
        while True:
            idx[o] += 1  # advancePP
            if idx[o] >= len(adj[o]):
                positioned = False
                if match_length <= slop:
                    out.append(match_length)
                break
            p = adj[o][idx[o]]
            if p > end:
                end = p
            if p > next_pos:  # done minimizing current match-length
                heapq.heappush(heap, (p, off, o))
                if match_length <= slop:
                    out.append(match_length)
                    matched = True
                    break
                pos, off, o = heapq.heappop(heap)
                next_pos = heap[0][0]
                match_length = end - pos
            else:
                match_length = min(match_length, end - p)
        del matched
    return out


def sloppy_phrase_freq(
    positions_per_term: Sequence, offsets: Sequence[int], slop: int, dtype=np.float32
):
    """phraseFreq = Σ 1/(1+matchLength), accumulated in `dtype` (float32 in
    Lucene parity mode — PhraseScorer accumulates a float)."""
    one = dtype(1)
    freq = dtype(0)
    for ml in sloppy_match_lengths(positions_per_term, offsets, slop):
        freq = freq + one / (one + dtype(ml))
    return freq

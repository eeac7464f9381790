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
      2). Repeating phrase terms follow the rptGroups machinery
      [SloppyPhraseMatcher.java:317-497]: same-term pps are grouped (sorted
      by query offset), initialization advances the j-th pp of a group to the
      j-th occurrence [advanceRepeatGroups, :486-494], and every advance
      resolves occurrence collisions by advancing the lesser of the two
      colliding pps [advanceRpts, :317-354], re-seating moved pps in the
      queue. The queue order is (position, offset, ord)
      [SloppyPhraseMatcher.java:96-110], a strict total order, so a
      lazy-deletion heap reproduces Lucene's re-queue protocol exactly.

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
    positions_per_term: Sequence,
    offsets: Sequence[int],
    slop: int,
    terms: Sequence[str] | None = None,
) -> List[int]:
    """matchLength of every match found by the greedy pq traversal
    (SloppyPhraseMatcher.nextMatch). phraseFreq is sum(1/(1+ml)).
    Positions must be ascending per term. When ``terms`` is given and a
    term occupies several phrase positions, the rptGroups path is taken
    (SloppyPhraseMatcher.java:317-497); otherwise the simple walk runs."""
    adj = []
    for plist, off in zip(positions_per_term, offsets):
        a = [int(p) - int(off) for p in plist]
        if not a:
            return []
        adj.append(a)
    n = len(adj)
    if n < 2:
        return []
    if terms is not None and len(set(terms)) < n:
        return _sloppy_match_lengths_rpt(adj, [int(o) for o in offsets],
                                         list(terms), slop)

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


def _sloppy_match_lengths_rpt(
    adj: List[List[int]], offsets: List[int], terms: List[str], slop: int
) -> List[int]:
    """Greedy pq walk WITH repeating-term groups (rptGroups).

    Behavioral model of SloppyPhraseMatcher.java:
      - groups = terms at 2+ phrase positions, members sorted by query
        offset (sortRptGroups, :542-553; _phrase_offsets yields offsets
        ascending, so group member order is already by offset);
      - init: j-th member of a group starts at the j-th occurrence
        (advanceRepeatGroups simple case, :486-494 — all members share one
        positions list, so fixed advances can never collide);
      - every mid-walk advance resolves occurrence collisions by advancing
        the LESSER of the two colliding pps (advanceRpts, :317-354;
        lesser, :356-362; collide, :364-374), then re-seats moved in-queue
        pps. Lucene drains/re-adds the pq (:335-353); with the strict
        (position, offset, ord) order (:96-110) a lazy-deletion heap where
        a moved pp invalidates its old entry is the same queue.
    """
    n = len(adj)
    lens = [len(a) for a in adj]
    idx = [0] * n

    group_of = [-1] * n
    members: dict = {}
    for i, t in enumerate(terms):
        members.setdefault(t, []).append(i)
    groups = [g for g in members.values() if len(g) > 1]
    for gi, g in enumerate(groups):
        for i in g:
            group_of[i] = gi

    end = -1 << 60

    def advance_pp(i: int) -> bool:
        nonlocal end
        idx[i] += 1
        if idx[i] >= lens[i]:
            return False
        if adj[i][idx[i]] > end:
            end = adj[i][idx[i]]
        return True

    # --- init: place first positions, then stagger each group's members
    for g in groups:
        for j in range(1, len(g)):
            for _ in range(j):
                idx[g[j]] += 1
                if idx[g[j]] >= lens[g[j]]:
                    return []  # PPs exhausted: doc cannot match
    # fillQueue
    end = max(adj[i][idx[i]] for i in range(n))
    ver = [0] * n
    heap = [(adj[i][idx[i]], offsets[i], i, 0) for i in range(n)]
    heapq.heapify(heap)

    def push(i: int) -> None:
        ver[i] += 1
        heapq.heappush(heap, (adj[i][idx[i]], offsets[i], i, ver[i]))

    def pop():
        while True:
            p, off, i, v = heapq.heappop(heap)
            if v == ver[i]:
                return p, i

    def top_pos() -> int:
        while heap[0][3] != ver[heap[0][2]]:
            heapq.heappop(heap)
        return heap[0][0]

    def collide(i: int) -> int:
        tp = adj[i][idx[i]] + offsets[i]
        for j in groups[group_of[i]]:
            if j != i and adj[j][idx[j]] + offsets[j] == tp:
                return j
        return -1

    def advance_rpts(i0: int) -> bool:
        """i0 was just advanced; resolve any occurrence collision chain."""
        if group_of[i0] < 0:
            return True
        p = i0
        moved: List[int] = []
        while True:
            k = collide(p)
            if k < 0:
                break
            q = (
                p
                if (adj[p][idx[p]], offsets[p]) < (adj[k][idx[k]], offsets[k])
                else k
            )
            if not advance_pp(q):
                return False
            if q != i0:
                moved.append(q)  # in-queue pp moved -> re-seat below
            p = q
        for j in set(moved):
            push(j)
        return True

    out: List[int] = []
    positioned = True
    while positioned:
        ppos, o = pop()
        match_length = end - ppos
        next_pos = top_pos()
        while True:
            ok = advance_pp(o)
            if ok:
                ok = advance_rpts(o)
            if not ok:
                positioned = False
                if match_length <= slop:
                    out.append(match_length)
                break
            p = adj[o][idx[o]]
            if p > next_pos:  # done minimizing current match-length
                push(o)
                if match_length <= slop:
                    out.append(match_length)
                    break
                ppos, o = pop()
                next_pos = top_pos()
                match_length = end - ppos
            else:
                if end - p < match_length:
                    match_length = end - p
    return out


def sloppy_phrase_freq(
    positions_per_term: Sequence,
    offsets: Sequence[int],
    slop: int,
    dtype=np.float32,
    terms: Sequence[str] | None = None,
):
    """phraseFreq = Σ 1/(1+matchLength), accumulated in `dtype` (float32 in
    Lucene parity mode — PhraseScorer accumulates a float)."""
    one = dtype(1)
    freq = dtype(0)
    for ml in sloppy_match_lengths(positions_per_term, offsets, slop, terms=terms):
        freq = freq + one / (one + dtype(ml))
    return freq

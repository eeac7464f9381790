"""Index-time synonym expansion (SynonymGraphFilter analog, single-token).

Lucene's index-time synonym chain (analysis/common/.../synonym/
SynonymGraphFilter.java:78, SynonymMap.java) stacks the members of a
synonym group onto each occurrence: every matched token emits all of its
group's terms at the SAME position (posIncrement 0 for the stacked ones).
Consequences this module reproduces:

  - tf of every group member counts all member occurrences;
  - positions of the stacked terms equal the original token's position
    (phrase/interval queries cross synonyms transparently);
  - norms discount the stacked tokens (Similarity discountOverlaps
    defaults true — BM25Similarity.java:72: posIncrement-0 tokens do not
    contribute to field length), so doclen counts only original tokens.

Multi-word rules (members containing whitespace) are supported through the
stream-level graph pass (``multiword_expansion``): an n-token source is
matched on POSITION adjacency in the analyzed token stream (so stacked
single-token synonyms do not break matches), and each output token
sequence is emitted starting at the first matched token's position,
occupying consecutive positions — the index-time flatten of the synonym
graph (SynonymGraphFilter.java:78 + FlattenGraphFilter.java:64; Lucene
documents this flattening as intentionally lossy for multi-token outputs,
which overlay the following original positions). Emitted tokens never
re-match other rules (the reference's single-pass no-reprocessing), and
all emissions are discounted from norms like single-token stacking.
Divergence (documented): overlapping matches of DIFFERENT rules all fire,
where Lucene's parser resolves conflicts leftmost-longest.

Parity caveat (documented divergence): with synonyms enabled Lucene's
``sumTotalTermFreq`` counts stacked tokens while its norms discount them;
this engine keeps field stats on the discounted lengths (avgdl = mean
discounted doclen), which is self-consistent but differs from the
reference's avgdl by the stacking ratio. The per-row sha256 content
invariant is unaffected (synonyms touch the index, not the stored docs).

Like the stemmer (stem.py), the expansion is computed once on the
dictionary-encoded VOCAB (O(unique terms) Python) and applied to the token
stream as pure numpy gather/repeat — the Arrow hot path stays per-token
Python-free.
"""

from __future__ import annotations

from typing import Dict, Iterable, List, Sequence, Tuple, Union

import numpy as np

SynonymSpec = Union[
    Iterable[Sequence[str]],  # groups: every member expands to the whole group
    Dict[str, Sequence[str]],  # one-way: src additionally emits the targets
]


def split_rules(synonyms: SynonymSpec):
    """Partition a synonym spec into the single-token spec (vocab-level CSR
    path) and the stream-level multi-word rules.

    An entry goes to the stream level when ANY member involved contains
    whitespace — including a single-token source with a multi-word output
    (the output occupies several positions, which only the stream pass can
    emit). Returns ``(single_spec_dict, multi_rules)`` where multi_rules is
    a list of ``(src_tokens_tuple, [out_tokens_tuple, ...])``."""
    singles: Dict[str, List[str]] = {}
    multi: Dict[Tuple[str, ...], List[Tuple[str, ...]]] = {}

    def tok(w: str) -> Tuple[str, ...]:
        parts = tuple(w.split())
        if not parts or any(not p for p in parts):
            raise ValueError(f"empty synonym entry {w!r}")
        return parts

    def add(src: str, targets: List[str]):
        if any(len(tok(w)) != 1 for w in (src, *targets)):
            s = tok(src)
            cur = multi.setdefault(s, [])
            for t in targets:
                tt = tok(t)
                if tt not in cur and tt != s:
                    cur.append(tt)
        else:
            cur2 = singles.setdefault(src, [src])
            for t in targets:
                if t not in cur2:
                    cur2.append(t)

    if isinstance(synonyms, dict):
        for src, targets in synonyms.items():
            add(src, list(targets))
    else:
        for group in synonyms:
            g = list(group)
            for src in g:
                add(src, [t for t in g if t != src])
    return singles, [(s, outs) for s, outs in multi.items() if outs]


def _per_term_expansions(synonyms: SynonymSpec) -> Dict[str, List[str]]:
    """term -> full emission list (term itself first, then additions,
    insertion-ordered, deduped). Validates single-token entries."""
    out: Dict[str, List[str]] = {}

    def add(src: str, targets: Iterable[str]):
        for w in (src, *targets):
            if not w or any(c.isspace() for c in w):
                raise ValueError(
                    f"multi-word synonym entry {w!r} reached the single-token "
                    "path: route the spec through split_rules first"
                )
        cur = out.setdefault(src, [src])
        for t in targets:
            if t not in cur:
                cur.append(t)

    if isinstance(synonyms, dict):
        for src, targets in synonyms.items():
            add(src, targets)
    else:
        for group in synonyms:
            g = list(group)
            for src in g:
                add(src, [t for t in g if t != src])
    return out


def synonym_expansion(
    vocab: np.ndarray, synonyms: SynonymSpec
) -> Tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """Build the CSR expansion from OLD vocab codes to NEW vocab codes.

    Returns ``(counts, offsets, flat_map, new_vocab)``: old code ``c``
    expands to ``flat_map[offsets[c] : offsets[c] + counts[c]]`` (new-vocab
    codes; identity for non-synonym terms). ``new_vocab`` is the sorted
    union of the corpus vocab and every synonym emission whose source
    occurs in the corpus — a group member that never appears as a source
    still gets postings (via the stacking), exactly like the reference.
    """
    exp = _per_term_expansions(synonyms)
    vocab_list = [str(t) for t in vocab]
    per_old: List[List[str]] = [exp.get(t, [t]) for t in vocab_list]
    extra = sorted({t for terms in per_old for t in terms} - set(vocab_list))
    # object dtype: a fixed-width '<U' vocab would silently truncate longer
    # synonym terms
    new_vocab = np.array(sorted(vocab_list + extra), dtype=object)
    code_of = {t: i for i, t in enumerate(new_vocab.tolist())}
    counts = np.array([len(ts) for ts in per_old], dtype=np.int64)
    offsets = np.concatenate(([0], np.cumsum(counts)[:-1])) if len(counts) else np.empty(0, np.int64)
    flat_map = np.array(
        [code_of[t] for ts in per_old for t in ts], dtype=np.int64
    )
    return counts, offsets, flat_map, new_vocab


def expand_tokens(
    codes: np.ndarray,
    flat_docix: np.ndarray,
    flat_pos,
    counts: np.ndarray,
    offsets: np.ndarray,
    flat_map: np.ndarray,
    skip_mask=None,
):
    """Apply the CSR expansion to the token stream: each token with old
    code ``c`` becomes ``counts[c]`` stacked tokens (same doc, same
    position) carrying the new codes. Pure numpy repeat/gather.

    ``skip_mask`` (bool, per token): tokens marked True are identity-
    remapped only, never expanded — used for multi-word emissions riding
    in the stream (the single-pass no-reprocessing rule). The in-place
    repeat keeps the stream's (doc, pos) order, so ascending-position
    invariants survive."""
    reps = counts[codes]
    if skip_mask is not None:
        reps = np.where(skip_mask, np.int64(1), reps)
    total = int(reps.sum())
    if total == len(codes) and (reps == 1).all():
        return flat_map[offsets[codes]], flat_docix, flat_pos
    starts = np.cumsum(reps) - reps
    within = np.arange(total, dtype=np.int64) - np.repeat(starts, reps)
    new_codes = flat_map[np.repeat(offsets[codes], reps) + within]
    new_docix = np.repeat(flat_docix, reps)
    new_pos = None if flat_pos is None else np.repeat(flat_pos, reps)
    return new_codes, new_docix, new_pos


def multiword_expansion(
    codes: np.ndarray,
    flat_docix: np.ndarray,
    flat_pos: np.ndarray,
    vocab: np.ndarray,
    rules,
):
    """Apply stream-level multi-word synonym rules (see module docstring).

    ``rules``: ``[(src_tokens_tuple, [out_tokens_tuple, ...]), ...]`` from
    ``split_rules``. Matching is POSITION-based (src token j must occur at
    position p+j in the same doc), so single-token stacking in the stream
    cannot break adjacency, and a stop-hole between source words (position
    gap) correctly prevents a match. Each output sequence is emitted at
    consecutive positions from the match start (flatten semantics). Pure
    numpy: one composite-key sort + per-rule searchsorted membership
    probes — no per-token Python.

    Returns ``(codes, flat_docix, flat_pos, vocab)`` with emissions
    appended (new output terms extend the vocab; caller re-sorts codes
    afterwards as usual). Requires positions (``flat_pos``)."""
    if flat_pos is None:
        raise ValueError("multi-word synonyms require the positions stream")
    if not len(codes) or not rules:
        return codes, flat_docix, flat_pos, vocab

    vocab_list = [str(t) for t in vocab]
    code_of = {t: i for i, t in enumerate(vocab_list)}
    extra_terms: List[str] = []

    def code_for(term: str) -> int:
        c = code_of.get(term)
        if c is None:
            c = len(vocab_list) + len(extra_terms)
            code_of[term] = c
            extra_terms.append(term)
        return c

    # sorted composite (doc, pos, code) key set: membership probe target.
    # Bounds chosen from the data so the int64 key cannot collide/overflow.
    P = int(flat_pos.max()) + 2 + max(len(s) for s, _ in rules)
    V = len(vocab_list) + 1
    key = (flat_docix * P + flat_pos) * V + codes
    skey = np.sort(key)

    add_codes, add_docix, add_pos = [], [], []
    for src, outs in rules:
        if any(t not in code_of or code_of[t] >= len(vocab_list) for t in src):
            continue  # a source word absent from this segment: no matches
        c0 = code_of[src[0]]
        cand = codes == c0
        start_doc, start_pos = flat_docix[cand], flat_pos[cand]
        ok = np.ones(int(cand.sum()), dtype=bool)
        for j, t in enumerate(src[1:], start=1):
            probe = (start_doc * P + (start_pos + j)) * V + code_of[t]
            pos_in = np.searchsorted(skey, probe)
            ok &= (pos_in < len(skey)) & (skey[np.minimum(pos_in, len(skey) - 1)] == probe)
        if not ok.any():
            continue
        mdoc, mpos = start_doc[ok], start_pos[ok]
        # dedup match anchors (stacked copies of src[0] at one position
        # would emit twice; one match per (doc, position) like the parser)
        anchor = mdoc * P + mpos
        _, uniq = np.unique(anchor, return_index=True)
        mdoc, mpos = mdoc[uniq], mpos[uniq]
        for out in outs:
            for j, t in enumerate(out):
                add_codes.append(np.full(len(mdoc), code_for(t), dtype=np.int64))
                add_docix.append(mdoc)
                add_pos.append(mpos + j)

    if not add_codes:
        return codes, flat_docix, flat_pos, vocab
    new_vocab = np.array(vocab_list + extra_terms, dtype=object)
    return (
        np.concatenate([codes] + add_codes),
        np.concatenate([flat_docix] + add_docix),
        np.concatenate([flat_pos] + add_pos),
        new_vocab,
    )


def synonym_query_tree(text: str, synonyms: SynonymSpec, stop_words=None):
    """QUERY-time synonym graph (SynonymGraphFilter at query time +
    QueryBuilder graph queries, util/QueryBuilder.java analyzeGraphBoolean):
    analyze the query text, match multi-word rule sources leftmost-longest
    on position adjacency, and lower each match to a SHOULD group of the
    original phrase plus every output (terms for 1-token outputs, exact
    phrases for multi-token); single-token rule hits become a SHOULD group
    of the stacked terms (SynonymQuery shape with per-term idf — a
    documented divergence from the reference's blended-df SynonymQuery;
    the engine's blended form lives in executor.blended_term_topk).

    Returns a query TREE (QBool of SHOULD clauses) for search_query /
    search_tree — use against indexes built WITHOUT index-time synonyms.
    """
    from ..analysis import ENGLISH_STOP_WORDS, analyze_with_positions
    from ..search.plan import QBool, QPhrase, QTerm, SHOULD

    if stop_words is None:
        stop_words = ENGLISH_STOP_WORDS
    toks = analyze_with_positions(text, stop_words)
    singles, multi = split_rules(synonyms)
    # leftmost-longest: try longer sources first at each anchor
    multi_sorted = sorted(multi, key=lambda r: -len(r[0]))

    def as_node(words):
        if len(words) == 1:
            return QTerm(words[0])
        return QPhrase(tuple((w, j) for j, w in enumerate(words)))

    clauses = []
    i = 0
    while i < len(toks):
        hit = None
        for src, outs in multi_sorted:
            L = len(src)
            if i + L > len(toks):
                continue
            window = toks[i : i + L]
            if tuple(t for t, _ in window) != src:
                continue
            # adjacency: a stop hole between source words breaks the match
            if any(window[j][1] != window[0][1] + j for j in range(L)):
                continue
            hit = (src, outs, L)
            break
        if hit:
            src, outs, L = hit
            alts = [as_node(list(src))] + [as_node(list(o)) for o in outs]
            clauses.append(QBool(tuple((SHOULD, a) for a in alts)))
            i += L
            continue
        t = toks[i][0]
        exp = singles.get(t)
        if exp and len(exp) > 1:
            clauses.append(QBool(tuple((SHOULD, QTerm(w)) for w in exp)))
        else:
            clauses.append(QTerm(t))
        i += 1
    if not clauses:
        from ..search.plan import MatchNone

        return None
    if len(clauses) == 1:
        return clauses[0]
    return QBool(tuple((SHOULD, c) for c in clauses))

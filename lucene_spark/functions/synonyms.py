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

Scope: single-token synonyms only (group members and mapping sources are
single terms after analysis). Multi-word inputs/outputs need the full
token-graph machinery (SynonymGraphFilter flattens them lossily at index
time even in Lucene); they are out of scope and rejected loudly.

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


def _per_term_expansions(synonyms: SynonymSpec) -> Dict[str, List[str]]:
    """term -> full emission list (term itself first, then additions,
    insertion-ordered, deduped). Validates single-token entries."""
    out: Dict[str, List[str]] = {}

    def add(src: str, targets: Iterable[str]):
        for w in (src, *targets):
            if not w or any(c.isspace() for c in w):
                raise ValueError(
                    f"multi-word or empty synonym entry {w!r}: only single-token "
                    "synonyms are supported (token-graph flattening is out of scope)"
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
):
    """Apply the CSR expansion to the token stream: each token with old
    code ``c`` becomes ``counts[c]`` stacked tokens (same doc, same
    position) carrying the new codes. Pure numpy repeat/gather."""
    reps = counts[codes]
    total = int(reps.sum())
    if total == len(codes) and (reps == 1).all():
        return flat_map[offsets[codes]], flat_docix, flat_pos
    starts = np.cumsum(reps) - reps
    within = np.arange(total, dtype=np.int64) - np.repeat(starts, reps)
    new_codes = flat_map[np.repeat(offsets[codes], reps) + within]
    new_docix = np.repeat(flat_docix, reps)
    new_pos = None if flat_pos is None else np.repeat(flat_pos, reps)
    return new_codes, new_docix, new_pos

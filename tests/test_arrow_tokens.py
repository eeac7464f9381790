"""flat_code_tokens (Arrow-kernel analyze) must equal analyze() everywhere."""

import numpy as np
import pyarrow as pa
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from lucene_spark.analysis import analyze, flat_code_tokens


def tokens_by_doc(texts):
    codes, docix, vocab = flat_code_tokens(pa.array(texts, type=pa.string()))
    got = {i: [] for i in range(len(texts))}
    order = np.argsort(docix, kind="stable")
    for c, d in zip(codes[order], docix[order]):
        got[int(d)].append(vocab[c])
    return got


TRICKY = [
    "Hello World",
    "foo  bar,  baz.",
    "snake_case CamelCase",
    "can't stop",
    "example.com and 3.14 no 1,024 yes",
    "",
    "THE AND OF",
    "naïve café ÜBER",
    "ΣΟΦΟΣ",
    "日本語 text",
    "a,b 1,2",
    "key:value 10:30",
    "x" * 300 + " end",
    None,
    "import numpy as np",
    "...,,:':",
]


def test_equivalence_on_tricky_inputs():
    got = tokens_by_doc(TRICKY)
    for i, t in enumerate(TRICKY):
        want = analyze(t if isinstance(t, str) else "")
        # multiset equality; within-doc order is preserved for pure-ASCII
        # fast-path docs and irrelevant for tf counting
        assert sorted(got[i]) == sorted(want), (i, t)


@settings(max_examples=60, deadline=None)
@given(
    st.lists(
        st.text(
            alphabet=st.sampled_from(
                list("abc XY9_.'`,:-\n\t") + ["日", "ß", "Σ", "é"]
            ),
            max_size=60,
        ),
        max_size=12,
    )
)
def test_equivalence_property(texts):
    got = tokens_by_doc(texts)
    for i, t in enumerate(texts):
        assert sorted(got[i]) == sorted(analyze(t)), t


def test_empty_input():
    codes, docix, vocab = flat_code_tokens(pa.array([], type=pa.string()))
    assert len(codes) == 0 and len(docix) == 0 and len(vocab) == 0


def test_doclens_via_bincount():
    texts = ["a b c the", "", "b b b"]
    codes, docix, vocab = flat_code_tokens(pa.array(texts, type=pa.string()))
    lens = np.bincount(docix, minlength=3)
    # 'a'/'the' are stopwords: doc0 -> [b, c]; doc2 -> [b, b, b]
    assert lens.tolist() == [2, 0, 3]

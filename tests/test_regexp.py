"""Lucene RegExp syntax translation (util/automaton/RegExp.java:31)."""

import re

import pytest

from lucene_spark.functions.regexp import (
    NEVER_MATCH, LuceneRegexpError, lucene_regexp_to_java,
)


def m(pat, s):
    return re.fullmatch(".*", "") is not None and re.search(lucene_regexp_to_java(pat), s) is not None


def test_anchoring():
    # Lucene regexps match the WHOLE term (RegexpQuery.java:60)
    assert m("ab", "ab")
    assert not m("ab", "xaby")  # substring must NOT match
    assert not m("ab", "abc")


def test_anystring_and_empty():
    assert m("a@b", "axyzb") and m("a@b", "ab")
    assert lucene_regexp_to_java("a#b") == NEVER_MATCH
    assert re.search(NEVER_MATCH, "anything") is None


def test_quoted_literal():
    assert m('"a.b"', "a.b")
    assert not m('"a.b"', "axb")  # quoted dot is literal


def test_numeric_interval():
    pat = lucene_regexp_to_java("v<5-11>")
    for ok in ("v5", "v9", "v10", "v11", "v05"):  # leading zero to width 2
        assert re.search(pat, ok), ok
    for bad in ("v4", "v12", "v110"):
        assert not re.search(pat, bad), bad


def test_interval_rejects_huge():
    with pytest.raises(LuceneRegexpError, match="too wide"):
        lucene_regexp_to_java("<1-1000000>")


def test_automaton_only_ops_rejected():
    with pytest.raises(LuceneRegexpError, match="complement"):
        lucene_regexp_to_java("~ab")
    with pytest.raises(LuceneRegexpError, match="intersection"):
        lucene_regexp_to_java("ab&cd")


def test_char_class_passthrough():
    assert m("[a-c]+x", "abcx")
    assert not m("[a-c]+x", "adx")
    # ~ and & inside a class are literals, not operators
    assert m("[~&]", "~") and m("[~&]", "&")


def test_expand_terms_lucene_syntax(built_index):
    got = built_index.expand_terms(lucene_regexp="re@")  # re + anystring
    assert got == built_index.expand_terms(prefix="re")
    assert "return" in got

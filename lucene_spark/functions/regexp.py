"""Lucene RegExp syntax -> Java/Spark regex translation.

Lucene's RegexpQuery parses its own syntax (util/automaton/RegExp.java:31),
which differs from java.util.regex in ways that silently change matches if
a pattern is passed straight to Spark's ``rlike``:

  - ANCHORED: a Lucene regexp matches the WHOLE term (RegexpQuery.java:60);
    java.util.regex ``find()``-style substring semantics would over-match.
    (Spark ``rlike`` is substring-matching, so translation wraps ^...$.)
  - ``@`` matches ANY string (RegExp.ANYSTRING, flag-gated) -> ``.*``
  - ``#`` matches the EMPTY language (RegExp.EMPTY) -> a never-matching
    pattern
  - ``<n-m>`` numeric interval (RegExp.INTERVAL): matches decimal numbers
    n..m inclusive, with leading zeros allowed up to the wider bound's
    digit count -> expanded to an explicit alternation
  - ``~`` (complement) and ``&`` (intersection) are automaton operations
    with no regex equivalent -> rejected with a clear error (the
    reference builds automata; a wrong silent translation would be worse)
  - ``"..."`` quotes a literal string (RegExp.java parseSimpleExp)

Everything else in Lucene's syntax (unions, concatenation, ?, *, +,
{n,m}, [...] classes, (), .) is shared with java.util.regex and passes
through; java-only constructs the user may paste (lookahead, backrefs)
also pass through untouched.
"""

from __future__ import annotations

NEVER_MATCH = r"$^"  # matches nothing (anchors in the wrong order)


class LuceneRegexpError(ValueError):
    pass


def _interval_regex(lo: int, hi: int) -> str:
    """Regex alternation matching decimal integers lo..hi inclusive —
    RegExp.INTERVAL semantics (makeInterval): leading zeros are accepted
    up to the WIDER bound's digit count (the automaton pads with 0s)."""
    if lo > hi:
        lo, hi = hi, lo
    digits = len(str(hi))
    # makeInterval(lo, hi, digits): fixed-width with leading zeros allowed
    # for shorter numbers; enumerate per digit-width range
    alts = []
    for v in range(lo, hi + 1):
        s = str(v)
        pad = digits - len(s)
        if pad:
            alts.append("0{0,%d}%s" % (pad, s))
        else:
            alts.append(s)
    if hi - lo > 2000:
        raise LuceneRegexpError(
            f"<{lo}-{hi}>: interval too wide to expand; use a numeric "
            "range query instead (PointRangeQuery analog)"
        )
    return "(?:" + "|".join(alts) + ")"


def lucene_regexp_to_java(pattern: str) -> str:
    """Translate a Lucene RegExp pattern to an ANCHORED Java-regex string
    suitable for Spark ``rlike`` / ``F.col(...).rlike`` over the term
    dictionary. Raises LuceneRegexpError on the automaton-only operators
    (``~`` complement, ``&`` intersection)."""
    out = []
    i, n = 0, len(pattern)
    in_class = False
    while i < n:
        c = pattern[i]
        if c == "\\" and i + 1 < n:
            out.append(pattern[i : i + 2])
            i += 2
            continue
        if in_class:
            if c == "]":
                in_class = False
            out.append(c)
            i += 1
            continue
        if c == "[":
            in_class = True
            out.append(c)
            i += 1
            continue
        if c == '"':
            j = pattern.find('"', i + 1)
            if j < 0:
                raise LuceneRegexpError(f'unterminated quote in {pattern!r}')
            import re as _re

            out.append(_re.escape(pattern[i + 1 : j]))
            i = j + 1
            continue
        if c == "@":
            out.append(".*")
            i += 1
            continue
        if c == "#":
            return NEVER_MATCH
        if c == "<":
            j = pattern.find(">", i + 1)
            body = pattern[i + 1 : j] if j > 0 else ""
            if j > 0 and "-" in body:
                lo_s, hi_s = body.split("-", 1)
                if lo_s.isdigit() and hi_s.isdigit():
                    out.append(_interval_regex(int(lo_s), int(hi_s)))
                    i = j + 1
                    continue
            out.append(c)  # not an interval: literal '<'
            i += 1
            continue
        if c == "~":
            raise LuceneRegexpError(
                "Lucene RegExp complement (~) is an automaton operation with "
                "no java.util.regex equivalent; rewrite the query or filter "
                "with NOT over the positive pattern"
            )
        if c == "&":
            raise LuceneRegexpError(
                "Lucene RegExp intersection (&) is an automaton operation "
                "with no java.util.regex equivalent; apply the patterns as "
                "two conjunctive filters instead"
            )
        out.append(c)
        i += 1
    body = "".join(out)
    return "^(?:" + body + ")$"

"""Tokenizer parity vectors (FIXTURES.md §4): StandardAnalyzer chain."""

import pandas as pd

from lucene_spark.analysis import (
    ENGLISH_STOP_WORDS,
    MAX_TOKEN_LEN,
    analyze,
    analyze_batch,
    tokenize,
)


def test_stop_set_is_the_33_word_list():
    # EnglishAnalyzer.java:43-52
    assert len(ENGLISH_STOP_WORDS) == 33
    assert "the" in ENGLISH_STOP_WORDS and "with" in ENGLISH_STOP_WORDS
    assert "i" not in ENGLISH_STOP_WORDS


GOLDEN = [
    # (text, expected tokens after full chain)
    ("Hello World", ["hello", "world"]),
    ("foo  bar,  baz.", ["foo", "bar", "baz"]),
    ("snake_case CamelCase", ["snake_case", "camelcase"]),  # _ = ExtendNumLet joins
    ("can't stop won't stop", ["can't", "stop", "won't", "stop"]),
    ("example.com and 3.14 no 1,024 yes", ["example.com", "3.14", "1,024", "yes"]),
    ("import numpy as np", ["import", "numpy", "np"]),
    ("", []),
    ("THE AND OF", []),  # stopwords only -> empty
    ("x+y=z", ["x", "y", "z"]),
    ("naïve café ÜBER", ["naïve", "café", "über"]),
    ("ΣΟΦΟΣ", ["σοφοσ"]),  # per-code-point lowercase: no final sigma
    ("日本語 text", ["日", "本", "語", "text"]),  # CJK one token per ideograph
    ("a,b 1,2", ["b", "1,2"]),  # ',' joins digits only; 'a' is a stopword
    ("key:value 10:30", ["key:value", "10", "30"]),  # ':' joins letters only
    # MidNumLet '.'/'\'' join SAME-type runs only (jflex WB6/7, WB11/12):
    # letter-digit boundaries split (ADVICE r1)
    ("sha256.update called", ["sha256", "update", "called"]),
    ("needs 3.x or v1.x", ["needs", "3", "x", "v1", "x"]),  # 'or' is a stopword
    ("x1.5y stays", ["x1.5y", "stays"]),  # digit.digit inside -> joined
    ("a_.b a_:b x'9", ["a_", "b", "a_", "b", "x", "9"]),  # '_' never joins across
]


def test_golden_analysis_vectors():
    for text, want in GOLDEN:
        assert analyze(text) == want, f"text={text!r}"


def test_long_token_split_not_dropped():
    # StandardTokenizer.java:84 - tokens > 255 chars are split
    tok = "x" * 300
    got = analyze(f"start {tok} end")
    assert got == ["start", "x" * MAX_TOKEN_LEN, "x" * 45, "end"]


def test_tokenize_no_lowercase_no_stop():
    assert tokenize("The QUICK fox") == ["The", "QUICK", "fox"]


def test_batch_matches_scalar():
    texts = [t for t, _ in GOLDEN]
    got = analyze_batch(pd.Series(texts))
    for g, (_, want) in zip(got, GOLDEN):
        assert list(g) == want


def test_batch_handles_nulls():
    got = analyze_batch(pd.Series(["ok fine", None]))
    assert list(got.iloc[0]) == ["ok", "fine"]
    assert list(got.iloc[1]) == []


def test_custom_stop_set():
    assert analyze("foo bar", frozenset({"foo"})) == ["bar"]
    # StandardAnalyzer default stop set is EMPTY (StandardAnalyzer.java:51-53)
    assert analyze("the fox", frozenset()) == ["the", "fox"]


def test_southeast_asian_runs_reference_vectors():
    """TestStandardAnalyzer.testThai / testLao: Complex_Context runs are one
    token each; Thai digits are Numeric and tokenize separately."""
    assert analyze("การที่ได้ต้องแสดงว่างานดี. แล้วเธอจะไปไหน? ๑๒๓๔", frozenset()) == [
        "การที่ได้ต้องแสดงว่างานดี", "แล้วเธอจะไปไหน", "๑๒๓๔",
    ]
    assert analyze("ສາທາລະນະລັດ ປະຊາທິປະໄຕ ປະຊາຊົນລາວ", frozenset()) == [
        "ສາທາລະນະລັດ", "ປະຊາທິປະໄຕ", "ປະຊາຊົນລາວ",
    ]
    # SEA run adjacent to Latin splits (SA is not ALetter)
    assert analyze("abcไทยdef", frozenset()) == ["abc", "ไทย", "def"]


def test_tibetan_reference_vector():
    """testTibetan: Tibetan is ALetter with tsheg separators (not SA)."""
    got = analyze("སྣོན་མཛོད་དང་ལས་འདིས་བོད་ཡིག་", frozenset())
    assert got == ["སྣོན", "མཛོད", "དང", "ལས", "འདིས", "བོད", "ཡིག"]


def test_katakana_own_wordbreak_class():
    """WB: Katakana is NOT ALetter -> splits from Latin unless joined by an
    ExtendNumLet underscore (WB13a/b); hangul IS ALetter -> chains."""
    assert tokenize("アアab") == ["アア", "ab"]
    assert tokenize("アア_ab") == ["アア_ab"]
    assert tokenize("カタカナ") == ["カタカナ"]
    assert tokenize("ラーメン") == ["ラーメン"]  # prolonged sound mark joins
    assert tokenize("한국어abc") == ["한국어abc"]  # hangul chains (ALetter)


def test_emoji_reference_vectors():
    """TestStandardAnalyzer emoji vectors (testEmoji / testEmojiSequence /
    ...WithModifier / RegionalIndicator / keycaps / TagSequence /
    testEmojiTokenization)."""
    assert tokenize("💩 💩💩") == ["💩", "💩", "💩"]
    assert tokenize("👩‍❤️‍👩") == ["👩‍❤️‍👩"]
    assert tokenize("👨🏼‍⚕️") == ["👨🏼‍⚕️"]
    assert tokenize("🇺🇸🇺🇸") == ["🇺🇸", "🇺🇸"]
    assert tokenize("#️⃣") == ["#️⃣"]
    assert tokenize("3️⃣") == ["3️⃣"]
    flag_eng = "🏴" + "".join(chr(c) for c in [0xE0067, 0xE0062, 0xE0065, 0xE006E, 0xE0067, 0xE007F])
    assert tokenize(flag_eng) == [flag_eng]
    assert tokenize("poo💩poo") == ["poo", "💩", "poo"]
    assert tokenize("💩中國💩") == ["💩", "中", "國", "💩"]
    # emoji survive the lowercase + stop chain untouched
    assert analyze("The 💩 Fox") == ["💩", "fox"]


def test_pictographic_ranges_tightened():
    """Extended_Pictographic precision (ADVICE r3): plain arrows U+219A /
    U+21C4 and non-pictographic 2B00-block chars (U+2B0C, U+2B4D) are NOT
    emoji — the reference StandardTokenizer drops them; the genuinely
    pictographic members (2194-2199, 21A9-21AA, 2B05-2B07, 2B1B-2B1C,
    2B50, 2B55) still tokenize as emoji."""
    assert tokenize("a ↚ b") == ["a", "b"]      # ↚ not Ext_Pict
    assert tokenize("a ⇄ b") == ["a", "b"]      # ⇄ not Ext_Pict
    assert tokenize("a ⬌ b") == ["a", "b"]      # ⬌ not Ext_Pict
    assert tokenize("a ⭍ b") == ["a", "b"]      # ⭍ not Ext_Pict
    assert tokenize("a ↔ b") == ["a", "↔", "b"]  # ↔ Ext_Pict
    assert tokenize("a ↩ b") == ["a", "↩", "b"]  # ↩ Ext_Pict
    assert tokenize("a ⬅ b") == ["a", "⬅", "b"]  # ⬅ Ext_Pict
    assert tokenize("a ⭐ b") == ["a", "⭐", "b"]  # ⭐ Ext_Pict
    assert tokenize("a ⭕ b") == ["a", "⭕", "b"]  # ⭕ Ext_Pict

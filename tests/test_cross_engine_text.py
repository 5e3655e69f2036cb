"""Cross-engine text-semantics pins (r12): the two divergence classes
the clean-ASCII parity gate is blind to, pinned in seconds-fast pytest
so they fail CI even without the full `tools/dirty_text_gate.py` run.

Class 1: whitespace tokenization — Spark ``\\s+`` split must equal
DuckDB ``string_split_regex(..., '\\s+')`` on tabs/newlines/runs.
Class 2: word-boundary regexes — Java's ``\\b`` is Unicode-aware,
RE2's is ASCII; ``tx.stopword_count`` and the oracle ``_STOP_CNT_SQL``
use the strip-to-word-runs formulation instead, and THIS test is the
pin that both sides keep counting identically on the text shapes that
split the engines ('jöin' et al.).
"""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from soict20221_bigdata_financialplatform_spark.functions import text as tx
from soict20221_bigdata_financialplatform_spark.queries import _STOP_CNT_SQL

# the shapes that split Java regex from RE2 / literal-space splitting,
# plus adjacency and boundary edges of the doubled-separator trick
SAMPLES = [
    "the jöin in a",            # combining-mark boundary (the r12 bug)
    "th🎉 a 🚀the🚀",            # emoji neighbors
    "the data a",          # NBSP is NOT \s for either engine
    "数据 the 处理 a",           # CJK neighbors
    "a a a",                    # adjacent stopwords share one separator
    "the  a\tof\nto",           # whitespace runs
    "  the a ",                 # leading/trailing runs
    "_the_ the",                # underscore is a word char
    "ison is on",               # substrings must not match
    "",                         # empty
    "á é í",                    # accented non-stopwords
    "the\x0ba of\x0cin",        # VT/FF: in Java's \s but NOT RE2's \s —
                                # the r13 find; oracles use the explicit
                                # class [ \t\n\x0b\f\r] instead of \s
    "\x0cthe a\x0b",            # VT/FF at the edges (trim strips neither)
]


@pytest.fixture(scope="module")
def pairs(spark):
    df = spark.createDataFrame(
        [(i, s) for i, s in enumerate(SAMPLES)], "i int, text string"
    )
    spark_counts = {
        r.i: r.c
        for r in df.select(
            "i", tx.stopword_count("text").alias("c")
        ).collect()
    }
    spark_tokens = {
        r.i: [w for w in r.w if w != ""]
        for r in df.select(
            "i", F.split(F.trim("text"), r"\s+").alias("w")
        ).collect()
    }
    return spark_counts, spark_tokens


def test_stopword_count_matches_duckdb_oracle_snippet(pairs):
    spark_counts, _ = pairs
    con = duckdb.connect()
    sql = "select " + _STOP_CNT_SQL.replace("lower(text)", "lower(?)")
    for i, s in enumerate(SAMPLES):
        dk = con.execute(sql, [s]).fetchone()[0]
        assert spark_counts[i] == dk, (s, spark_counts[i], dk)


def test_whitespace_tokenization_matches_duckdb(pairs):
    # the oracle-side pattern is the EXPLICIT class equal to Java's \s
    # ([ \t\n\x0b\f\r]) — RE2's own \s lacks \x0b (VT), the r13 find
    _, spark_tokens = pairs
    con = duckdb.connect()
    for i, s in enumerate(SAMPLES):
        dk = con.execute(
            "select list_filter(string_split_regex(trim(?, ' '),"
            " '[ \\t\\n\\x0b\\f\\r]+'), w -> w <> '')",
            [s],
        ).fetchone()[0]
        assert spark_tokens[i] == dk, (s, spark_tokens[i], dk)


def test_re2_s_class_lacks_vertical_tab():
    """WHY oracles can't use \\s: RE2's \\s is [\\t\\n\\f\\r ] — no VT —
    while Java's \\s is [ \\t\\n\\x0b\\f\\r]. Documents the measured
    asymmetry that motivated the r13 explicit-class sweep (82 split
    patterns + 2 BPE patterns + 1 strip pattern). If DuckDB's RE2 ever
    adds VT to \\s, this fails and the sweep can be reverted."""
    con = duckdb.connect()
    assert con.execute(r"select regexp_matches(chr(11), '\s')").fetchone()[0] is False
    assert con.execute(
        r"select regexp_matches(chr(11), '[ \t\n\x0b\f\r]')"
    ).fetchone()[0] is True


def test_raw_word_boundary_regex_is_known_divergent():
    """The reason \\b is banned in oracle-paired regexes: RE2 sees an
    ASCII word boundary inside 'jöin' (the combining mark is a non-word
    byte run for RE2), Java does not. If DuckDB ever changes this, the
    ban can be revisited — this test documents the measured behavior."""
    con = duckdb.connect()
    dk = con.execute(
        r"select len(regexp_extract_all('the jöin', '\b(in)\b'))"
    ).fetchone()[0]
    assert dk == 1  # RE2: boundary before 'in' inside jöin


# ---------------------------------------------------------------------------
# Hypothesis properties (r13): random strings over a pathology-rich alphabet,
# checked three ways — Spark expression vs live DuckDB snippet vs a
# brute-force Python oracle built from first principles (unicodedata
# categories, not regex), the test_equivalence_properties.py pattern.
# ---------------------------------------------------------------------------

import unicodedata

from hypothesis import given, settings
from hypothesis import strategies as st

from soict20221_bigdata_financialplatform_spark.functions.text import (
    EN_STOPWORDS,
)

# ASCII letters + stopwords + every separator class that has ever split the
# engines (tab, newline, VT, FF, CR, NBSP, NEL, CJK, emoji, combining marks,
# underscore, punctuation) — a focused alphabet finds divergences at
# max_examples=12 that uniform Unicode never would.
_ALPHABET = st.sampled_from(
    list("abet oi_,.!-")
    + ["the", "a", "in", "on", "is"]
    + ["\t", "\n", "\x0b", "\x0c", "\r", "\xa0", "\x85", " "]
    + ["ö", "á", "̈", "数", "🚀", "é"]
)
_texts = st.lists(
    st.lists(_ALPHABET, max_size=12).map("".join), min_size=1, max_size=16
)

# Java's \s, the engine-wide tokenizer separator set (r13: spelled as an
# explicit class in every oracle because RE2's \s lacks \x0b)
_JAVA_WS = set(" \t\n\x0b\f\r")


def _brute_ws_tokens(s: str) -> list[str]:
    """First-principles whitespace tokenizer: maximal runs of non-Java-\\s
    chars of trim(s) (trim strips SPACES only — both engines), empties
    dropped (the consumers' w <> '' convention)."""
    out, cur = [], []
    for ch in s.strip(" "):
        if ch in _JAVA_WS:
            if cur:
                out.append("".join(cur))
            cur = []
        else:
            cur.append(ch)
    if cur:
        out.append("".join(cur))
    return out


def _brute_stopword_count(s: str) -> int:
    """First-principles stopword counter per the documented semantic: a
    word is a maximal run of Unicode letters/marks/digits/underscore of
    lower(s); count words in EN_STOPWORDS. Uses unicodedata categories,
    not regex — independent of BOTH engines' regex engines."""
    out, cur = [], []
    for ch in s.lower():
        if ch == "_" or unicodedata.category(ch)[0] in "LMN":
            cur.append(ch)
        else:
            if cur:
                out.append("".join(cur))
            cur = []
    if cur:
        out.append("".join(cur))
    return sum(1 for w in out if w in EN_STOPWORDS)


@given(_texts)
@settings(max_examples=12, deadline=None)
def test_property_ws_tokens_three_way(spark, texts):
    con = duckdb.connect()
    df = spark.createDataFrame(
        [(i, s) for i, s in enumerate(texts)], "i int, text string"
    )
    got = {
        r.i: [w for w in r.w if w != ""]
        for r in df.select("i", F.split(F.trim("text"), r"\s+").alias("w")).collect()
    }
    for i, s in enumerate(texts):
        brute = _brute_ws_tokens(s)
        dk = con.execute(
            "select list_filter(string_split_regex(trim(?, ' '),"
            " '[ \\t\\n\\x0b\\f\\r]+'), w -> w <> '')",
            [s],
        ).fetchone()[0]
        assert got[i] == brute, (repr(s), got[i], brute)
        assert dk == brute, (repr(s), dk, brute)


@given(_texts)
@settings(max_examples=12, deadline=None)
def test_property_stopword_count_three_way(spark, texts):
    con = duckdb.connect()
    df = spark.createDataFrame(
        [(i, s) for i, s in enumerate(texts)], "i int, text string"
    )
    got = {
        r.i: r.c
        for r in df.select("i", tx.stopword_count("text").alias("c")).collect()
    }
    sql = "select " + _STOP_CNT_SQL.replace("lower(text)", "lower(?)")
    for i, s in enumerate(texts):
        brute = _brute_stopword_count(s)
        dk = con.execute(sql, [s]).fetchone()[0]
        assert got[i] == brute, (repr(s), got[i], brute)
        assert dk == brute, (repr(s), dk, brute)


def test_concat_null_semantics_are_known_divergent(spark):
    """r14 relational-dirt-gate pin: Spark ``concat_ws`` DROPS a NULL
    argument AND its separator while DuckDB ``concat`` renders NULL as
    empty string — 'ECONOMY' vs ':ECONOMY' (the q44 find). Oracle-paired
    string concatenations must coalesce each nullable part to '' on
    BOTH sides, which makes the two forms identical (and is identity on
    NULL-free data)."""
    row = (
        spark.createDataFrame([(None, "ECONOMY")], "a string, b string")
        .select(
            F.concat_ws(":", "a", "b").alias("raw"),
            F.concat_ws(
                ":",
                F.coalesce(F.col("a"), F.lit("")),
                F.coalesce(F.col("b"), F.lit("")),
            ).alias("fixed"),
        )
        .collect()[0]
    )
    duck_raw, duck_fixed = duckdb.connect().execute(
        "SELECT concat(NULL, ':', 'ECONOMY'),"
        " concat(coalesce(NULL, ''), ':', coalesce('ECONOMY', ''))"
    ).fetchone()
    assert row.raw == "ECONOMY"          # Spark drops NULL + separator
    assert duck_raw == ":ECONOMY"        # DuckDB renders NULL as ''
    assert row.raw != duck_raw           # the divergence this pins
    assert row.fixed == duck_fixed == ":ECONOMY"  # the mandated form

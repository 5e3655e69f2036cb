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
    _, spark_tokens = pairs
    con = duckdb.connect()
    for i, s in enumerate(SAMPLES):
        dk = con.execute(
            "select list_filter(string_split_regex(trim(?), '\\s+'),"
            " w -> w <> '')",
            [s],
        ).fetchone()[0]
        assert spark_tokens[i] == dk, (s, spark_tokens[i], dk)


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

"""Hypothesis property tests for the normalization expressions (SURVEY §5.3):
the native regexp+try_cast parsers must agree with plain Python parsing over
the whole messy-input space the scraper can emit."""

from __future__ import annotations

from hypothesis import given, settings, strategies as st
from pyspark.sql import Row

from soict20221_bigdata_financialplatform_spark.functions.normalize import (
    parse_comma_number,
    parse_vn_date,
)

# spark fixture is session-scoped; hypothesis drives many examples through
# one createDataFrame each — keep example counts small (Spark round-trips
# are ~100ms each).
_SETTINGS = dict(max_examples=20, deadline=None)


@st.composite
def messy_numbers(draw):
    val = draw(st.decimals(min_value=0, max_value=10**12, places=2))
    s = f"{val:,.2f}"
    # scraper quirks: trailing/leading whitespace incl. nbsp
    pad = draw(st.sampled_from(["", " ", "  ", " ", "  "]))
    return pad + s + pad, float(val)


@given(st.lists(messy_numbers(), min_size=1, max_size=8))
@settings(**_SETTINGS)
def test_parse_comma_number_matches_python(spark, cases):
    df = spark.createDataFrame([Row(s=s) for s, _ in cases])
    got = [r.v for r in df.select(parse_comma_number("s").alias("v")).collect()]
    expected = [v for _, v in cases]
    assert got == expected


@given(
    st.lists(
        st.dates(min_value=__import__("datetime").date(1990, 1, 1),
                 max_value=__import__("datetime").date(2035, 12, 31)),
        min_size=1, max_size=8,
    )
)
@settings(**_SETTINGS)
def test_parse_vn_date_roundtrip(spark, dates):
    df = spark.createDataFrame(
        [Row(s=d.strftime("%d/%m/%Y")) for d in dates]
    )
    got = [r.d for r in df.select(parse_vn_date("s").alias("d")).collect()]
    assert got == dates


@given(st.lists(st.text(alphabet="abcXYZ,. -", max_size=12), min_size=1, max_size=8))
@settings(**_SETTINGS)
def test_parse_comma_number_garbage_never_raises(spark, junk):
    """try_cast contract: arbitrary junk -> null, never an ANSI error."""
    df = spark.createDataFrame([Row(s=s if s else " ") for s in junk])
    out = df.select(parse_comma_number("s").alias("v")).collect()
    assert len(out) == len(junk)  # executed without raising

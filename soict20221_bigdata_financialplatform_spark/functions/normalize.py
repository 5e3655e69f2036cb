"""Normalization of messy string-typed market data — native expressions only.

The reference does this with row-at-a-time Python UDFs (``toFloat``/``toInt``,
reference ``pipeline/util/util.py:41-49,68-73``) and driver-side string helpers
(``convertPrice``/``convertChange``/``convertTime``, ``util.py:21-39``). Every
one of those is re-expressed here as a JVM-side Catalyst expression
(SURVEY §2.8 F1, F7-F11): they stay inside WholeStageCodegen, cost no Python
worker round-trip, and scale linearly with executor count.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#   = non-breaking space (the scrape emits it; reference util.py:21-22).
_WS_CLASS = "[\\s\\u00a0]+"


def strip_ws(col: Column | str) -> Column:
    """F8: strip spaces / newlines / non-breaking spaces anywhere in the value
    (reference ``convertPrice``/``convertSingle``, util.py:21-33)."""
    return F.regexp_replace(F.col(col) if isinstance(col, str) else col, _WS_CLASS, "")


def parse_comma_number(col: Column | str, to: str = "double") -> Column:
    """F7: ``"60,902,000,000 "`` → 60902000000 (reference ``toFloat``/``toInt``
    UDFs, util.py:41-49 — replaced by regexp_replace + cast)."""
    c = strip_ws(col)
    # try_cast: malformed input → null instead of an ANSI runtime error
    # (defensive parsing, like the reference's try/except float()).
    return F.regexp_replace(c, ",", "").try_cast(to)


def parse_vn_date(col: Column | str, fmt: str = "dd/MM/yyyy") -> Column:
    """F1/F10: ``"07/02/2023"`` → date (reference util.py:66; epoch variants
    ``convertTime``/``convertDate``, util.py:24-39)."""
    c = strip_ws(col)
    return F.to_date(c, fmt)


def parse_pct_change(col: Column | str) -> Column:
    """F9: ``"(+1.2 %)"`` → 0.012 (reference ``convertChange``, util.py:27-29).

    Extracts the signed decimal and divides by 100; malformed input → null.
    """
    c = F.col(col) if isinstance(col, str) else col
    num = F.regexp_extract(c, r"([+-]?\d+(?:\.\d+)?)", 1)
    return (F.when(num != "", num).cast("double") / F.lit(100.0)).alias("change_pct")


def to_local_ts(col: Column | str, tz: str = "Asia/Ho_Chi_Minh") -> Column:
    """F10 tail: the reference shifted epoch seconds by a hard-coded +7 h
    (``convertToDate``, util.py:51-55); the portable form is an explicit
    timezone conversion."""
    c = F.col(col) if isinstance(col, str) else col
    return F.from_utc_timestamp(c, tz)


def prev_weekday(col: Column | str) -> Column:
    """F13: roll a date back to the latest Mon-Fri (reference
    ``prev_weekday``, util.py:122-125). Sat→Fri, Sun→Fri, else unchanged."""
    c = F.col(col) if isinstance(col, str) else col
    dow = F.dayofweek(c)  # 1=Sunday .. 7=Saturday
    return (
        F.when(dow == 7, F.date_sub(c, 1))
        .when(dow == 1, F.date_sub(c, 2))
        .otherwise(c)
    )


def clamp_to_trading_hours(
    col: Column | str,
    open_hour: int = 9,
    close_hour: int = 16,
) -> Column:
    """F14: map off-hours timestamps to the session close (reference
    ``check_trading_hour``, producer.py:43-50).

    Before open → previous day's close; after close → today's close; weekend
    handling composes with :func:`prev_weekday` on the date part.
    """
    c = F.col(col) if isinstance(col, str) else col
    day = F.date_trunc("day", c)
    close_today = day + F.make_interval(hours=F.lit(close_hour))
    close_prev = F.date_sub(day.cast("date"), 1).cast("timestamp") + F.make_interval(
        hours=F.lit(close_hour)
    )
    h = F.hour(c)
    return (
        F.when(h < open_hour, close_prev)
        .when(h >= close_hour, close_today)
        .otherwise(c)
    )


def comma_number_pandas_udf():
    """U1 surface parity: the ONE vectorized scalar pandas UDF the engine
    keeps as a demo of the escape hatch (reference util.py:68-73 used four
    row-at-a-time Python UDFs for this). Arrow-batched; ~10-100× the
    throughput of a row-at-a-time UDF, still strictly slower than the native
    :func:`parse_comma_number` expression — which is why the native form is
    what every pipeline here actually uses."""
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    # no type hints: module-level `from __future__ import annotations` turns
    # them into strings pyspark's hint introspection can't resolve; hint-less
    # defs take the classic SCALAR pandas-UDF path
    @pandas_udf("double")
    def _parse(s):
        return pd.to_numeric(
            s.str.replace(r"[\s ,]", "", regex=True), errors="coerce"
        )

    return _parse


def normalize_bars(raw: DataFrame) -> DataFrame:
    """``normalize_data`` re-expressed (reference util.py:57-74; SURVEY §2.11).

    raw string-typed bars → typed bars: keyed dedup (O3 — the scraper re-emits
    rows), date parse (F1), comma-strip numeric casts (F7/F8). Output schema =
    FIXTURES.md ``bars``: (symbol string, date date, open/high/low/close
    double, volume/value long).

    Scale notes: the dedup is a hash aggregation on (symbol, date) — it
    shuffles once on the natural key of every downstream per-symbol window, so
    Catalyst reuses the exchange; no global sort is needed (the reference's
    ``df.sort(date)`` at util.py:67 was only cosmetic — window specs order
    explicitly).
    """
    return (
        raw.dropDuplicates(["symbol", "date"])
        .select(
            F.col("symbol"),
            parse_vn_date("date").alias("date"),
            parse_comma_number("open").alias("open"),
            parse_comma_number("high").alias("high"),
            parse_comma_number("low").alias("low"),
            parse_comma_number("close").alias("close"),
            parse_comma_number("volume", "long").alias("volume"),
            parse_comma_number("value", "long").alias("value"),
        )
    )

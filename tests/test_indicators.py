"""Golden + property tests for the indicator library (SURVEY §5.2, §5.3).

Golden values are hand-derivable from the canonical definitions pinned in
SURVEY §2.11; pandas ewm is the second oracle for EMA.
"""

from __future__ import annotations

import datetime

import pandas as pd
import pytest
from pyspark.sql import Row

from soict20221_bigdata_financialplatform_spark.functions import indicators as ind

CLOSES = [10.0, 11.0, 12.0, 11.5, 11.0, 12.5, 13.0, 12.0, 12.5, 13.5]


def _bars(spark, closes=CLOSES, symbol="AAA"):
    rows = [
        Row(symbol=symbol, date=datetime.date(2023, 1, 1) + datetime.timedelta(days=i),
            close=c)
        for i, c in enumerate(closes)
    ]
    return spark.createDataFrame(rows)


def _col(df, name, key="symbol", order="date"):
    return [r[name] for r in df.orderBy(key, order).collect()]


def test_change_abs_and_pct(spark):
    df = ind.change_pct(ind.change_abs(_bars(spark)))
    ca = _col(df, "change_abs")
    cp = _col(df, "change_pct")
    assert ca[0] is None and cp[0] is None
    assert ca[1] == pytest.approx(1.0)
    assert cp[1] == pytest.approx(0.1)
    assert ca[3] == pytest.approx(-0.5)


def test_change_pct_zero_prev_is_null(spark):
    df = ind.change_pct(_bars(spark, [0.0, 5.0, 5.0]))
    cp = _col(df, "change_pct")
    assert cp[0] is None and cp[1] is None  # prev=0 -> null, no ANSI error
    assert cp[2] == pytest.approx(0.0)


def test_sma_golden(spark):
    df = ind.sma(_bars(spark), 3)
    s = _col(df, "sma_3")
    assert s[0] is None and s[1] is None  # warm-up nulls until n rows
    assert s[2] == pytest.approx((10 + 11 + 12) / 3)
    assert s[3] == pytest.approx((11 + 12 + 11.5) / 3)


def test_ema_golden_recursive(spark):
    """EMA(3): alpha=0.5, seeded with first close — hand recursion."""
    df = ind.ema(_bars(spark), 3)
    e = _col(df, "ema_3")
    alpha = 2 / (3 + 1)
    expected = [CLOSES[0]]
    for c in CLOSES[1:]:
        expected.append(alpha * c + (1 - alpha) * expected[-1])
    assert e == pytest.approx(expected, abs=1e-9)


def test_ema_matches_pandas_ewm(spark):
    df = ind.ema(_bars(spark), 5)
    e = _col(df, "ema_5")
    expected = pd.Series(CLOSES).ewm(span=5, adjust=False).mean().tolist()
    assert e == pytest.approx(expected, abs=1e-9)


def test_rsi_golden(spark):
    """RSI(3) by hand: diffs of CLOSES = [1,1,-.5,-.5,1.5,.5,-1,.5,1]."""
    df = ind.rsi(_bars(spark), 3)
    r = _col(df, "rsi_3")
    # rows 0..2 have <3 diffs -> null; row 3: diffs (1,1,-.5)
    assert r[0] is None and r[1] is None and r[2] is None
    ag, al = (1 + 1 + 0) / 3, (0 + 0 + 0.5) / 3
    assert r[3] == pytest.approx(100 - 100 / (1 + ag / al), abs=1e-9)
    # row 4: diffs (1,-.5,-.5)
    ag, al = 1 / 3, 1.0 / 3
    assert r[4] == pytest.approx(100 - 100 / (1 + ag / al), abs=1e-9)


def test_rsi_all_gain_is_100_all_flat_is_50(spark):
    up = ind.rsi(_bars(spark, [1.0, 2.0, 3.0, 4.0, 5.0]), 3)
    assert _col(up, "rsi_3")[-1] == 100.0
    flat = ind.rsi(_bars(spark, [5.0] * 6), 3)
    assert _col(flat, "rsi_3")[-1] == 50.0


def test_rsi_bounds_property(spark):
    import random

    rng = random.Random(7)
    closes = [100.0]
    for _ in range(200):
        closes.append(max(0.1, closes[-1] + rng.uniform(-5, 5)))
    vals = [v for v in _col(ind.rsi(_bars(spark, closes), 14), "rsi_14") if v is not None]
    assert vals and all(0.0 <= v <= 100.0 for v in vals)


def test_ema_between_running_min_max(spark):
    vals = _col(ind.ema(_bars(spark), 4), "ema_4")
    for i, v in enumerate(vals):
        assert min(CLOSES[: i + 1]) - 1e-9 <= v <= max(CLOSES[: i + 1]) + 1e-9


def test_indicators_input_order_invariance(spark):
    """Windows order by date internally — shuffled input must give identical
    results (SURVEY §5.3)."""
    base = _bars(spark)
    shuffled = base.orderBy(__import__("pyspark").sql.functions.rand(seed=1))
    a = _col(ind.rsi(base, 3), "rsi_3")
    b = _col(ind.rsi(shuffled, 3), "rsi_3")
    assert a == b


def test_multi_symbol_independence(spark):
    """Keys must not leak into each other (the reference's J1 join-key bug
    did exactly that — util.py:97)."""
    one = _bars(spark, CLOSES, "AAA")
    two = _bars(spark, [c * 10 for c in CLOSES], "BBB")
    both = ind.rsi(one.unionByName(two), 3)
    only = ind.rsi(one, 3)
    a = [r["rsi_3"] for r in both.where("symbol='AAA'").orderBy("date").collect()]
    b = _col(only, "rsi_3")
    assert a == pytest.approx(b, nan_ok=True)


def test_with_indicators_composes(spark):
    out = ind.with_indicators(_bars(spark), ema_n=3, rsi_n=3, sma_n=3)
    cols = set(out.columns)
    assert {"change_abs", "change_pct", "sma_3", "rsi_3", "ema_3"} <= cols
    assert out.count() == len(CLOSES)


def test_bollinger_golden(spark):
    """BB(3, k=2): mid = SMA3, sd = sample stddev over the same frame."""
    df = ind.bollinger(_bars(spark), 3, 2.0)
    mid = _col(df, "bb_mid_3")
    up = _col(df, "bb_upper_3")
    lo = _col(df, "bb_lower_3")
    pct = _col(df, "bb_pct_3")
    assert mid[0] is None and mid[1] is None  # warm-up
    m2 = (10 + 11 + 12) / 3
    sd2 = pd.Series([10.0, 11.0, 12.0]).std()  # ddof=1
    assert mid[2] == pytest.approx(m2)
    assert up[2] == pytest.approx(m2 + 2 * sd2)
    assert lo[2] == pytest.approx(m2 - 2 * sd2)
    assert pct[2] == pytest.approx((12.0 - (m2 - 2 * sd2)) / (4 * sd2))


def test_bollinger_flat_band_pct_is_null(spark):
    df = ind.bollinger(_bars(spark, [5.0] * 5), 3, 2.0)
    pct = _col(df, "bb_pct_3")
    assert pct[3] is None  # zero-width band -> guarded null, no ANSI error


def test_macd_matches_pandas(spark):
    """MACD(12,26,9) == the three pandas ewm recursions composed."""
    df = ind.macd(_bars(spark), 12, 26, 9)
    got_line = _col(df, "macd_line")
    got_sig = _col(df, "macd_signal")
    got_hist = _col(df, "macd_hist")
    v = pd.Series(CLOSES)
    line = (
        v.ewm(span=12, adjust=False).mean() - v.ewm(span=26, adjust=False).mean()
    )
    sig = line.ewm(span=9, adjust=False).mean()
    assert got_line == pytest.approx(list(line))
    assert got_sig == pytest.approx(list(sig))
    assert got_hist == pytest.approx(list(line - sig))
    assert got_line[0] == 0.0 and got_sig[0] == 0.0  # seed: first line value


def test_running_vwap_golden(spark):
    rows = [
        Row(sym="A", seq=1, px=10.0, qty=2.0),
        Row(sym="A", seq=2, px=20.0, qty=2.0),
        Row(sym="A", seq=3, px=40.0, qty=4.0),
    ]
    df = ind.running_vwap(
        spark.createDataFrame(rows), ("sym",), ("seq",), "px", "qty"
    )
    vw = _col(df, "vwap", key="sym", order="seq")
    assert vw[0] == pytest.approx(10.0)
    assert vw[1] == pytest.approx(60.0 / 4.0)
    assert vw[2] == pytest.approx(220.0 / 8.0)


def _long_bars(spark, n_rows=2000, n_keys=2, start_year=1995):
    """Multi-year per-key series: forces ema_segmented across many
    year-segment boundaries."""
    import random

    rng = random.Random(42)
    rows = []
    for k in range(n_keys):
        close = 100.0 + 10 * k
        d = datetime.date(start_year, 1, 2)
        for _ in range(n_rows):
            close = max(0.1, close + rng.uniform(-2, 2))
            rows.append(Row(symbol=f"S{k}", date=d, close=close))
            d += datetime.timedelta(days=2)  # ~2000 rows span ~11 years
    return spark.createDataFrame(rows)


def test_ema_segmented_equivalent_to_ema_long_key(spark):
    """Seed-chained year-segmented EMA == single-frame EMA on a key whose
    history spans 11 year-segments (SCALE.md: the unbounded-key form)."""
    base = _long_bars(spark)
    whole = {
        (r.symbol, r.date): r.ema_25
        for r in ind.ema(base, 25).collect()
    }
    seg = ind.ema_segmented(base, 25).collect()
    assert len(seg) == len(whole)
    for r in seg:
        assert r.ema_25 == pytest.approx(
            whole[(r.symbol, r.date)], rel=1e-11, abs=1e-11
        )


def test_ema_segmented_custom_segments_and_golden(spark):
    """Tiny fixed-size segments (3-row buckets via a synthetic column)
    still reproduce the hand recursion — every boundary is exercised."""
    from pyspark.sql import functions as F

    df = _bars(spark)  # 10 rows, one symbol
    # segment expression must be monotone in the order column (here: 3-4 day
    # buckets of the month)
    seg = ind.ema_segmented(
        df, 3, segment_col=(F.dayofmonth("date") / 4).cast("int")
    )
    e = {r.date: r.ema_3 for r in seg.collect()}
    alpha = 0.5
    expected = [CLOSES[0]]
    for c in CLOSES[1:]:
        expected.append(alpha * c + (1 - alpha) * expected[-1])
    got = [e[d] for d in sorted(e)]
    assert got == pytest.approx(expected, abs=1e-9)


def test_ema_segmented_rejects_nulls(spark):
    rows = [
        Row(symbol="A", date=datetime.date(2024, 1, i + 1), close=c)
        for i, c in enumerate([1.0, None, 3.0])
    ]
    df = spark.createDataFrame(rows, "symbol string, date date, close double")
    with pytest.raises(Exception, match="non-null"):
        ind.ema_segmented(df, 3).collect()


def test_holt_linear_golden_recursion(spark):
    """Holt level/trend against the hand recursion (alpha=0.5, beta=0.5)."""
    df = ind.holt_linear(_bars(spark), 0.5, 0.5)
    rows = sorted(df.collect(), key=lambda r: r.date)
    l, t = CLOSES[0], 0.0
    exp = [(l, t)]
    for c in CLOSES[1:]:
        nl = 0.5 * c + 0.5 * (l + t)
        t = 0.5 * (nl - l) + 0.5 * t
        l = nl
        exp.append((l, t))
    got = [(r.holt_level, r.holt_trend) for r in rows]
    for (gl, gt), (el, et) in zip(got, exp):
        assert gl == pytest.approx(el, abs=1e-9) and gt == pytest.approx(et, abs=1e-9)


def test_cusum_identity_matches_reference_recursion(spark):
    """q150's closed form s_n = C_n - min(0, prefix-min C) equals the
    textbook recursion s_n = max(0, s_{n-1} + d_n) on a drifting series."""
    from soict20221_bigdata_financialplatform_spark.queries import QUERIES
    import datetime
    import os

    import duckdb

    # drive the registry query on real testdata, then re-walk the recursion
    sf = "/root/testdata/sf0.001"
    out = QUERIES["q150_cusum_drift"](spark, sf).collect()
    by_user = {}
    for r in sorted(out, key=lambda r: (r.user_id, r.day)):
        by_user.setdefault(r.user_id, []).append(r)
    bars = duckdb.sql(f"""
        SELECT user_id, CAST(date_trunc('day', ts) AS DATE) AS day,
               arg_max(value, ts) AS close
        FROM '{os.path.join(sf, "events.parquet")}' GROUP BY 1, 2
        ORDER BY 1, 2""").fetchall()
    series = {}
    for uid, day, close in bars:
        series.setdefault(uid, []).append(int(close * 1_000_000 + 0.5))
    checked = 0
    for uid, rows in by_user.items():
        xs = series[uid]
        n = len(xs)
        tq = (sum(xs) - sum(xs) % n) // n
        s = 0
        for i, r in enumerate(rows):
            s = max(0, s + xs[i] - tq)
            assert abs(r.cusum - s / 1_000_000) < 1e-9, (uid, i)
            checked += 1
    assert checked > 300

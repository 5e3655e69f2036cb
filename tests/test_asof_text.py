"""As-of join semantics on hand-built frames + text feature functions."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from soict20221_bigdata_financialplatform_spark.functions import text as tx
from soict20221_bigdata_financialplatform_spark.operators.asof import asof_join


def _ts(h, m=0):
    return dt.datetime(2024, 1, 1, h, m)


def test_asof_join_basic(spark):
    left = spark.createDataFrame(
        [Row(k="a", ts=_ts(10)), Row(k="a", ts=_ts(12)), Row(k="b", ts=_ts(9))]
    )
    right = spark.createDataFrame(
        [Row(k="a", rts=_ts(9, 30), px=1.0),
         Row(k="a", rts=_ts(11, 0), px=2.0),
         Row(k="b", rts=_ts(9, 30), px=9.0)]  # after left's only b row
    )
    out = {(r.k, r.ts): r.px for r in asof_join(
        left, right, on=["k"], left_ts="ts", right_ts="rts").collect()}
    assert out[("a", _ts(10))] == 1.0   # latest at-or-before 10:00
    assert out[("a", _ts(12))] == 2.0
    assert out[("b", _ts(9))] is None   # no prior right row -> null


def test_asof_join_exact_timestamp_match(spark):
    left = spark.createDataFrame([Row(k="a", ts=_ts(10))])
    right = spark.createDataFrame([Row(k="a", rts=_ts(10), px=5.0)])
    out = asof_join(left, right, on=["k"], left_ts="ts", right_ts="rts").collect()
    assert out[0].px == 5.0  # <= is inclusive


def test_asof_join_tolerance(spark):
    left = spark.createDataFrame([Row(k="a", ts=_ts(12))])
    right = spark.createDataFrame([Row(k="a", rts=_ts(9), px=1.0)])
    keep = asof_join(left, right, on=["k"], left_ts="ts", right_ts="rts",
                     tolerance_seconds=4 * 3600).collect()
    drop = asof_join(left, right, on=["k"], left_ts="ts", right_ts="rts",
                     tolerance_seconds=3600).collect()
    assert keep[0].px == 1.0
    assert drop[0].px is None  # match older than tolerance nulled


def test_asof_join_right_tiebreak_picks_largest(spark):
    # Duplicate right timestamps in one key: without a tiebreak the carry
    # is nondeterministic (r13 ADVICE); with right_tiebreak the row with
    # the LARGEST tiebreak at the tied instant wins — the same "latest by
    # (ts, id)" convention the day-bar closes use. The tiebreak column
    # (eid) is not in right_cols, so it must also not leak into the output.
    left = spark.createDataFrame([Row(k="a", ts=_ts(10))])
    right = spark.createDataFrame(
        [Row(k="a", rts=_ts(9), px=1.0, eid=7),
         Row(k="a", rts=_ts(9), px=2.0, eid=3),
         Row(k="a", rts=_ts(9), px=3.0, eid=9)]
    )
    out = asof_join(
        left, right, on=["k"], left_ts="ts", right_ts="rts",
        right_cols=["px"], right_tiebreak="eid",
    )
    rows = out.collect()
    assert rows[0].px == 3.0  # eid=9 is the largest at the tied instant
    assert set(out.columns) == {"k", "ts", "px"}
    # A later right row still beats any tied earlier ones.
    right2 = right.union(
        spark.createDataFrame([Row(k="a", rts=_ts(9, 30), px=4.0, eid=1)])
    )
    rows2 = asof_join(
        left, right2, on=["k"], left_ts="ts", right_ts="rts",
        right_cols=["px"], right_tiebreak="eid",
    ).collect()
    assert rows2[0].px == 4.0


def test_text_features(spark):
    df = spark.createDataFrame(
        [Row(text="The quick brown fox, with a vengeance!"),
         Row(text=""),
         Row(text="   ")]
    )
    out = df.select(
        tx.token_count("text").alias("nt"),
        tx.char_count("text").alias("nc"),
        tx.stopword_count("text").alias("ns"),
        tx.punct_count("text").alias("np"),
        tx.quality_score("text").alias("q"),
        tx.fingerprint("text").alias("fp"),
    ).collect()
    r = out[0]
    assert r.nt == 7
    assert r.ns == 3  # the, with, a
    assert r.np == 2  # comma + bang
    assert 0.0 <= r.q <= 1.0
    assert out[1].nt == 0 and out[2].nt == 0
    assert out[1].q == 0.0


def test_fingerprint_whitespace_invariant(spark):
    df = spark.createDataFrame(
        [Row(a="hello   world", b="Hello world"), Row(a="x", b="y")]
    )
    out = df.select(
        (tx.fingerprint("a") == tx.fingerprint("b")).alias("same")
    ).collect()
    assert out[0].same is True   # case + whitespace normalized
    assert out[1].same is False


def test_word_groups_triplets(spark):
    df = spark.createDataFrame([Row(text="a b c d e f g")])
    out = df.select(tx.word_groups("text", 3).alias("g")).collect()[0].g
    assert out == ["a b c", "d e f", "g"]


def test_bpe_ish_token_count(spark):
    df = spark.createDataFrame([
        Row(text="hello world"),        # 2 letter-runs
        Row(text="x2 tokens, right?"),  # x,2,' tokens',',',' right','?'
        Row(text=""),
    ])
    out = [r.n for r in df.select(
        tx.bpe_ish_token_count("text").alias("n")).collect()]
    assert out[0] == 2
    assert out[1] == 6
    assert out[2] == 0


def test_repetition_stats_hand_computed(spark):
    # "the cat the cat sat": 5 words, top word 'the'/'cat' x2 -> 0.4;
    # bigrams: [the cat, cat the, the cat, cat sat] -> 3 distinct of 4 -> 0.25
    df = spark.createDataFrame([Row(text="the cat the cat sat")])
    r = df.select(
        tx.mean_word_len("text").alias("mwl"),
        tx.stopword_frac("text").alias("sf"),
        tx.top_word_frac("text").alias("tf"),
        tx.dup_bigram_frac("text").alias("db"),
    ).collect()[0]
    assert r.mwl == pytest.approx(3.0)   # (3+3+3+3+3)/5
    assert r.sf == pytest.approx(0.4)    # 'the' twice of 5
    assert r.tf == pytest.approx(0.4)
    assert r.db == pytest.approx(0.25)


def test_repetition_stats_edge_cases(spark):
    df = spark.createDataFrame([Row(text="solo")])
    r = df.select(
        tx.top_word_frac("text").alias("tf"),
        tx.dup_bigram_frac("text").alias("db"),
    ).collect()[0]
    assert r.tf == pytest.approx(1.0)  # one word: its own 100%
    assert r.db is None                # no bigrams below 2 words
    # pathological repetition saturates the signals
    rep = spark.createDataFrame([Row(text="buy " * 49 + "buy")])
    r2 = rep.select(
        tx.top_word_frac("text").alias("tf"),
        tx.dup_bigram_frac("text").alias("db"),
    ).collect()[0]
    assert r2.tf == pytest.approx(1.0)
    assert r2.db == pytest.approx(1.0 - 1.0 / 49)


def test_word_ngrams(spark):
    df = spark.createDataFrame([Row(text="a b c d e f"), Row(text="a b c")])
    out = [r.g for r in df.select(tx.word_ngrams("text", 5).alias("g")).collect()]
    assert out[0] == ["a b c d e", "b c d e f"]
    assert out[1] == []  # below n words


def test_winnow_fingerprints_properties(spark):
    # 10 words -> 7 4-gram hashes -> 3 windows of 5 -> <=3 distinct mins
    long_doc = "w0 w1 w2 w3 w4 w5 w6 w7 w8 w9"
    # shares the 8-word run w2..w9 with long_doc: winnowing guarantees any
    # common run of n + w - 1 = 8 words yields >=1 shared fingerprint
    overlapping = "x0 x1 w2 w3 w4 w5 w6 w7 w8 w9"
    short_doc = "only seven words here not enough window"  # 7 words < 8
    df = spark.createDataFrame(
        [
            Row(doc_id=1, text=long_doc),
            Row(doc_id=2, text=overlapping),
            Row(doc_id=3, text=short_doc),
        ]
    )
    out = {
        r.doc_id: r.nfp
        for r in tx.winnow_fingerprints(df, "text", 4, 5).collect()
    }
    assert 1 <= len(out[1]) <= 3
    assert out[1] == sorted(set(out[1]))  # distinct + sorted
    assert set(out[1]) & set(out[2])  # the winnowing guarantee
    assert out[3] == []  # no full window -> empty
    # fingerprint of an identical doc is identical (deterministic hash family)
    df2 = spark.createDataFrame([Row(doc_id=9, text=long_doc)])
    again = tx.winnow_fingerprints(df2, "text", 4, 5).collect()[0].nfp
    assert again == out[1]


def test_cogroup_align_forward_fill(spark):
    from soict20221_bigdata_financialplatform_spark.operators.asof import cogroup_align

    t = lambda s: dt.datetime(2024, 1, 2, 9, 30, s)
    bars = spark.createDataFrame(
        [Row(sym=1, ts=t(0), px=100.0), Row(sym=1, ts=t(20), px=101.0),
         Row(sym=2, ts=t(5), px=50.0)]
    )
    evts = spark.createDataFrame(
        [Row(sym=1, ts=t(10), sig=7.0), Row(sym=1, ts=t(30), sig=8.0),
         Row(sym=3, ts=t(0), sig=1.0)]  # right-only key
    )
    out = cogroup_align(bars, evts, "sym", "ts", ["px"], ["sig"])
    rows = {(r.sym, r.ts.second): (r.px, r.sig) for r in out.collect()}
    # merged clock for sym 1: 0, 10, 20, 30 with both sides forward-filled
    assert rows[(1, 0)] == (100.0, None)   # no event yet
    assert rows[(1, 10)] == (100.0, 7.0)   # px carried forward
    assert rows[(1, 20)] == (101.0, 7.0)   # sig carried forward
    assert rows[(1, 30)] == (101.0, 8.0)
    assert rows[(2, 5)] == (50.0, None)    # left-only key intact
    assert rows[(3, 0)] == (None, 1.0)     # right-only key intact
    assert len(rows) == 6


def test_approx_distinct_error_bound(spark):
    """q87's HLL estimate stays within 5% of the exact distinct count."""
    from soict20221_bigdata_financialplatform_spark.queries import QUERIES

    sf = "/root/testdata/sf0.01"
    approx = {r.event_type: r.approx_users
              for r in QUERIES["q87_approx_distinct"](spark, sf).collect()}
    from soict20221_bigdata_financialplatform_spark.sources import load_table

    exact = {r.event_type: r.exact
             for r in load_table(spark, sf, "events")
             .groupBy("event_type")
             .agg(F.countDistinct("user_id").alias("exact")).collect()}
    assert set(approx) == set(exact)
    for k in exact:
        assert abs(approx[k] - exact[k]) / exact[k] < 0.05, (k, approx[k], exact[k])


def test_approx_quantiles_error_bound(spark):
    """q92's GK-sketch percentiles land within 1% RELATIVE rank error of the
    exact percentile values on real data."""
    from soict20221_bigdata_financialplatform_spark.queries import QUERIES
    from soict20221_bigdata_financialplatform_spark.sources import load_table

    sf = "/root/testdata/sf0.01"
    approx = {r.event_type: r.approx_pcts
              for r in QUERIES["q92_approx_quantiles"](spark, sf).collect()}
    exact = {r.event_type: r.pcts
             for r in load_table(spark, sf, "events")
             .groupBy("event_type")
             .agg(F.expr("percentile(value, array(0.5, 0.95, 0.99))")
                  .alias("pcts")).collect()}
    assert set(approx) == set(exact)
    for k in exact:
        for a, e in zip(approx[k], exact[k]):
            assert abs(a - e) / e < 0.01, (k, a, e)

"""Independent known-answer checks for the r6 statistical queries: the
two-sample tests and rank statistics are recomputed in pure Python/numpy
from the same parquet — a THIRD implementation path beside the Spark plan
and the DuckDB oracle, so a shared-mistake in the SQL twin can't hide."""

from __future__ import annotations

import math

import duckdb
import numpy as np
import pytest

from soict20221_bigdata_financialplatform_spark.queries import QUERIES


def _samples(sf_dir):
    con = duckdb.connect()
    a = con.execute(
        f"SELECT value FROM '{sf_dir}/events.parquet' WHERE event_type = 'view'"
    ).fetchnumpy()["value"]
    b = con.execute(
        f"SELECT value FROM '{sf_dir}/events.parquet' WHERE event_type = 'purchase'"
    ).fetchnumpy()["value"]
    return np.sort(a), np.sort(b)


def test_ks_matches_naive_numpy(spark, sf_dir):
    a, b = _samples(sf_dir)
    pooled = np.unique(np.concatenate([a, b]))
    f1 = np.searchsorted(a, pooled, side="right")
    f2 = np.searchsorted(b, pooled, side="right")
    d_num = int(np.max(np.abs(f1 * len(b) - f2 * len(a))))
    row = QUERIES["q195_ks_test"](spark, sf_dir).collect()[0]
    assert (row.n1, row.n2) == (len(a), len(b))
    assert row.d_num == d_num
    assert row.ks_d == pytest.approx(d_num / (len(a) * len(b)), abs=0)


def test_mann_whitney_matches_naive(spark, sf_dir):
    a, b = _samples(sf_dir)
    pooled = np.concatenate([a, b])
    order = np.argsort(pooled, kind="mergesort")
    ranks = np.empty(len(pooled))
    # average ranks for ties
    sorted_vals = pooled[order]
    i = 0
    while i < len(sorted_vals):
        j = i
        while j < len(sorted_vals) and sorted_vals[j] == sorted_vals[i]:
            j += 1
        ranks[order[i:j]] = (i + j + 1) / 2.0  # 1-based average rank
        i = j
    r1 = float(np.sum(ranks[: len(a)]))
    u1 = r1 - len(a) * (len(a) + 1) / 2.0
    row = QUERIES["q196_mann_whitney"](spark, sf_dir).collect()[0]
    assert row.u1 == pytest.approx(u1, abs=1e-9)
    # z sanity: standard normal scale for same-sized samples
    assert abs(row.z) < 10


def test_spearman_matches_scipy_free_formula(spark, sf_dir):
    rows = {
        r.user_id: r
        for r in QUERIES["q218_spearman_trend"](spark, sf_dir).collect()
    }
    con = duckdb.connect()
    df = con.execute(
        f"SELECT user_id, value FROM '{sf_dir}/events.parquet' "
        "ORDER BY user_id, ts, event_id"
    ).fetch_df()
    for uid, g in df.groupby("user_id"):
        v = g["value"].to_numpy()
        n = len(v)
        x = np.arange(1, n + 1, dtype=float)
        # average ranks of v
        order = np.argsort(v, kind="mergesort")
        y = np.empty(n)
        sv = v[order]
        i = 0
        while i < n:
            j = i
            while j < n and sv[j] == sv[i]:
                j += 1
            y[order[i:j]] = (i + j + 1) / 2.0
            i = j
        xm, ym = x - x.mean(), y - y.mean()
        den = math.sqrt(float(xm @ xm)) * math.sqrt(float(ym @ ym))
        rho = float(xm @ ym) / den if den else None
        got = rows[uid].spearman_rho
        if rho is None:
            assert got is None
        else:
            assert got == pytest.approx(rho, abs=1e-9), uid


def test_wasserstein_matches_naive(spark, sf_dir):
    a, b = _samples(sf_dir)
    pooled = np.unique(np.concatenate([a, b]))
    f1 = np.searchsorted(a, pooled, side="right") / len(a)
    f2 = np.searchsorted(b, pooled, side="right") / len(b)
    w1 = float(np.sum(np.abs(f1 - f2)[:-1] * np.diff(pooled)))
    row = QUERIES["q220_wasserstein"](spark, sf_dir).collect()[0]
    # the query quantizes each strip to micro-units; tolerance = one
    # micro-unit per strip
    assert row.wasserstein1 == pytest.approx(
        w1, abs=len(pooled) * 1e-6 / (len(a) * len(b)) + 1e-9
    )


def test_benford_digits_sum_to_n_and_chi2_nonneg(spark, sf_dir):
    rows = QUERIES["q197_benford"](spark, sf_dir).collect()
    digits = {r.digit for r in rows}
    assert digits <= set(range(1, 10))
    assert all(r.chi2 >= 0 for r in rows)
    assert sum(r.obs_frac for r in rows) == pytest.approx(1.0, abs=1e-9)
    # expected fractions are the Benford distribution
    for r in rows:
        assert r.expected_frac == pytest.approx(
            math.log10(1 + 1 / r.digit), abs=1e-6
        )

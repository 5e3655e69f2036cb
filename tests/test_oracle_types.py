"""Output-TYPE audit as a regression gate: the driver's value hasher has
twice split on type canonicalization while values matched (round-1 q50
DECIMAL, round-2 q38 window-sum HUGEINT). `tools/parity_check.py --audit`
catches that class schema-only; this test pins the audit green for every
oracle query so a new query with a risky output type fails CI, not the
driver gate."""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))

import parity_check


def test_all_oracle_output_types_hasher_safe(spark, sf_dir, capsys):
    rc = parity_check.audit(sf_dir, only=None)
    out = capsys.readouterr().out
    assert rc == 0, f"type audit flagged oracle queries:\n{out}"


def test_final_order_window_r11_rotation():
    """The driver checks the FIRST 50 registry entries. Pin the
    round-11 window: 9 sentinels up front, the 28-query r11 backlog
    q297-q324 in slots 10-37, the 7 streaming batch twins q325-q331 in
    slots 38-44 (all parity-green at three SFs, never driver-checked
    before r11), the second-row queue (q63, q65-q69) in slots 45-50,
    every window entry oracle-backed, the rows-only six dead last, and
    the full registry covered exactly once. The r10 window q256-q296
    drops behind right after the boundary."""
    from soict20221_bigdata_financialplatform_spark.queries import (
        _FINAL_ORDER, ORACLE, QUERIES,
    )

    assert len(_FINAL_ORDER) == len(set(_FINAL_ORDER)) == len(QUERIES)
    sentinels = [
        "q01_pricing_summary", "q02_flagship_range", "q03_latest_n_per_key",
        "q22_rsi", "q23_ema", "q30_exact_dedup",
        "q50_decimal_money", "q53_near_dup_clusters",
        "q64_embedding_near_dup_lsh",
    ]
    assert _FINAL_ORDER[:9] == sentinels
    window = _FINAL_ORDER[:50]
    assert [w.split("_")[0] for w in window[9:44]] == [
        f"q{n}" for n in range(297, 332)
    ]
    assert window[44:50] == [
        "q63_semantic_neighbors", "q65_gopher_quality", "q66_shared_ngrams",
        "q67_winnow_overlap", "q68_small_qty_revenue",
        "q69_dormant_rich_customers",
    ]
    # The r11-authored additions queue first behind the boundary (the r12
    # recipe pulls them into the next window right after the sentinels),
    # then the retired r10 window.
    assert _FINAL_ORDER[50:52] == [
        "q332_kmv_intersection", "q333_weighted_sample_es",
    ]
    assert [w.split("_")[0] for w in _FINAL_ORDER[52:93]] == [
        f"q{n}" for n in range(256, 297)
    ]
    assert all(name in ORACLE for name in window), [
        n for n in window if n not in ORACLE
    ]
    rows_only = {
        "q32_minhash_pairs", "q33_simhash_pairs", "q49_corpus_clean",
        "q87_approx_distinct", "q92_approx_quantiles", "q99_heavy_hitters_mg",
    }
    assert set(_FINAL_ORDER[-6:]) == rows_only
    assert not rows_only & set(window)

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


def test_final_order_window_r14_rotation():
    """The driver checks the FIRST 50 registry entries. Pin the
    round-14 window: 9 sentinels up front, the r13-authored
    q337_event_dirt_audit in slot 10 (the only oracle-able entry
    without a driver row after r13), the second-row queue continuing in
    registry order — the r11-green block q303..q331 in slots 11-39, the
    r11-window tail q63/q65..q69 in slots 40-45, the r10-green head
    q256..q260 in slots 46-50 — every window entry oracle-backed, the
    rows-only six dead last, and the full registry covered exactly
    once. The r13 window occupants drop right behind the boundary;
    q261_charclass_drift is next in the second-row queue for r15."""
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
    assert window[9] == "q337_event_dirt_audit"
    expected_queue = [f"q{n}" for n in range(303, 332)]
    assert [w.split("_")[0] for w in window[10:39]] == expected_queue
    assert [w.split("_")[0] for w in window[39:45]] == [
        "q63", "q65", "q66", "q67", "q68", "q69",
    ]
    assert [w.split("_")[0] for w in window[45:50]] == [
        "q256", "q257", "q258", "q259", "q260",
    ]
    # Behind the boundary: the r14-authored six queued first for the
    # r15 window, then the r13 window occupants (DP trio first), then
    # the earlier retirees; q261 heads the r15 second-row queue.
    assert _FINAL_ORDER[50:57] == [
        "q338_embedding_dirt_audit", "q339_knn_label_consistency",
        "q340_average_precision", "q341_twonn_intrinsic_dim",
        "q342_mcc_kappa", "q343_mattr_diversity",
        "q344_participation_ratio",
    ]
    assert _FINAL_ORDER[57:60] == [
        "q334_dp_noisy_counts", "q335_dp_noisy_char_sums",
        "q336_dp_gumbel_topk",
    ]
    assert _FINAL_ORDER[139] == "q261_charclass_drift"
    assert all(name in ORACLE for name in window), [
        n for n in window if n not in ORACLE
    ]
    rows_only = {
        "q32_minhash_pairs", "q33_simhash_pairs", "q49_corpus_clean",
        "q87_approx_distinct", "q92_approx_quantiles", "q99_heavy_hitters_mg",
    }
    assert set(_FINAL_ORDER[-6:]) == rows_only
    assert not rows_only & set(window)

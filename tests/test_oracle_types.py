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


def test_final_order_window_r15_rotation():
    """The driver checks the FIRST 50 registry entries. Pin the
    round-15 window: 9 sentinels up front, the r14-authored
    q338..q344 in slots 10-16 (the only oracle-able entries without a
    driver row after r14), the second-row queue continuing in registry
    order — the r10-green block q261..q294 in slots 17-50 — every
    window entry oracle-backed, the rows-only six dead last, and the
    full registry covered exactly once. The r14 window occupants drop
    right behind the boundary (q337 first, prior relative order);
    q295_intraday_vol_signature is next in the second-row queue for
    r16."""
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
    assert [w.split("_")[0] for w in window[9:16]] == [
        f"q{n}" for n in range(338, 345)
    ]
    expected_queue = [f"q{n}" for n in range(261, 295)]
    assert [w.split("_")[0] for w in window[16:50]] == expected_queue
    # Behind the boundary: the r14 window occupants (q337 first, then
    # q303..q331, q63/q65..q69, q256..q260), then the r13 window
    # occupants, then the earlier retirees; q295 heads the r16
    # second-row queue.
    assert _FINAL_ORDER[50] == "q337_event_dirt_audit"
    assert [w.split("_")[0] for w in _FINAL_ORDER[51:80]] == [
        f"q{n}" for n in range(303, 332)
    ]
    assert _FINAL_ORDER[91:94] == [
        "q334_dp_noisy_counts", "q335_dp_noisy_char_sums",
        "q336_dp_gumbel_topk",
    ]
    idx = _FINAL_ORDER.index("q295_intraday_vol_signature")
    assert _FINAL_ORDER[idx - 1] == "q104_sequence_packing"
    assert all(name in ORACLE for name in window), [
        n for n in window if n not in ORACLE
    ]
    rows_only = {
        "q32_minhash_pairs", "q33_simhash_pairs", "q49_corpus_clean",
        "q87_approx_distinct", "q92_approx_quantiles", "q99_heavy_hitters_mg",
    }
    assert set(_FINAL_ORDER[-6:]) == rows_only
    assert not rows_only & set(window)

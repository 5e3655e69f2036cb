"""Round-9 operator semantics + plan shape: store-grain dedup
attribution, the Bernoulli sample store, the DoReMi mixer, LSH precision
eval, and signature-store novelty (q251-q255)."""

from __future__ import annotations

import pyspark.sql.functions as F

from soict20221_bigdata_financialplatform_spark.plans import checks
from soict20221_bigdata_financialplatform_spark.plans.checks import (
    conditional_bnlj_count,
)
from soict20221_bigdata_financialplatform_spark.queries import QUERIES


def test_q251_attribution_accounting_identity(spark, sf_dir):
    """Every non-first (doc, segment) occurrence is attributed to exactly
    one store batch: Σ n_dropped == |distinct (doc, dg)| − |distinct dg|,
    and no attribution points forward in time (store ≤ ingest)."""
    out = QUERIES["q251_store_dedup_attribution"](spark, sf_dir).collect()
    assert out, "corpus has shared boilerplate segments"
    assert all(r.store_batch <= r.ingest_batch for r in out)
    from soict20221_bigdata_financialplatform_spark.functions import text as tx
    from soict20221_bigdata_financialplatform_spark.sources import load_table

    d = load_table(spark, sf_dir, "documents")
    t = d.select(
        "doc_id", tx.words(F.col("text")).alias("w")
    ).where(F.size("w") >= 12)
    seg = t.select(
        "doc_id",
        F.explode(
            F.sequence(F.lit(0), F.floor(F.size("w") / 12).cast("int") - 1)
        ).alias("i"),
        "w",
    ).select(
        "doc_id",
        F.md5(F.array_join(F.slice("w", F.col("i") * 12 + 1, 12), " ")).alias(
            "dg"
        ),
    ).distinct()
    n_pairs, n_digests = seg.agg(
        F.count(F.lit(1)), F.count_distinct("dg")
    ).first()
    assert sum(r.n_dropped for r in out) == n_pairs - n_digests


def test_q252_union_of_stores_equals_direct_sample(spark, sf_dir):
    row = QUERIES["q252_bernoulli_sample_store"](spark, sf_dir).first()
    assert row.n_shards == 8
    assert row.sum_shard_n == row.n_sample  # mergeability proof
    assert row.min_shard_n >= 0 and row.max_shard_n >= row.min_shard_n


def test_q253_mixer_invariants(spark, sf_dir):
    """Weights are positive integers, shares sum to ~1, the hardest
    (highest-BPB) domain carries the max weight, and the total
    allocation never exceeds the 25% budget."""
    rows = QUERIES["q253_doremi_curriculum_mixer"](spark, sf_dir).collect()
    assert len(rows) == 20  # one per source
    assert all(r.weight_micro >= 1000000 for r in rows)
    assert abs(sum(r.weight_share for r in rows) - 1.0) < 1e-9
    hardest = max(rows, key=lambda r: r.bits_per_byte)
    assert hardest.weight_micro == max(r.weight_micro for r in rows)
    budget = sum(r.n_tokens for r in rows) // 4
    assert sum(r.alloc_tokens for r in rows) <= budget


def test_q254_precision_eval_bounds_and_plan(spark, sf_dir):
    """Precision/MAE stay in [0,1] with n_true ≤ n_pairs; the candidate
    stage plans an EQUI-join (no conditional nested loop — the invariant
    13 shape the oracle's OR-join would naively produce)."""
    q = QUERIES["q254_neardup_precision_eval"](spark, sf_dir)
    assert conditional_bnlj_count(q) == 0
    for r in q.collect():
        assert 0 <= r.n_true <= r.n_pairs
        assert 0.0 <= r.prec_05 <= 1.0
        assert 0.0 <= r.mae <= 1.0


def test_q255_epoch_zero_is_fully_novel(spark, sf_dir):
    """Epoch 0 has no prior store, so nothing can collide; later epochs
    are monotone in exposure only statistically, but counts must bound."""
    q = QUERIES["q255_minhash_store_novelty"](spark, sf_dir)
    plan = checks.executed_plan(q)
    assert "Window" not in plan  # pure join/agg pipeline
    rows = {r.epoch: r for r in q.collect()}
    assert set(rows) == {0, 1, 2, 3}
    assert rows[0].n_collided == 0 and rows[0].novelty == 1.0
    for r in rows.values():
        assert 0 <= r.n_collided <= r.n_docs

# ---------------------------------------------------------------------------
# r10 backlog authored in r9 (q256-q261): KMV sketch, Flesch, Parkinson,
# Kyle lambda, drawdown duration / Ulcer, char-class drift.
# ---------------------------------------------------------------------------


def test_q256_kmv_estimate_and_merge(spark, sf_dir):
    """The merged KMV kth value equals the kth smallest of the GLOBAL
    distinct hash set (mergeability: global minima are a subset of
    per-store minima), and the estimate lands within the k=64 error
    band of the true distinct count."""
    row = QUERIES["q256_kmv_distinct"](spark, sf_dir).first()
    assert row.k == 64 and row.kth_hv > 0
    if row.true_distinct < 64:
        # small-cardinality branch: the sketch is the distinct set
        assert row.kmv_est == float(row.true_distinct)
    else:
        assert (
            0.5 * row.true_distinct < row.kmv_est < 2.0 * row.true_distinct
        )
    from soict20221_bigdata_financialplatform_spark.functions import text as tx
    from soict20221_bigdata_financialplatform_spark.sources import load_table

    d = load_table(spark, sf_dir, "documents")
    kth_global = (
        d.select(F.explode(tx.words("text")).alias("word"))
        .where(F.col("word") != "")
        .select(
            F.conv(F.substring(F.md5("word"), 1, 15), 16, 10)
            .cast("long")
            .alias("hv")
        )
        .distinct()
        .orderBy("hv")
        .limit(64)
        .agg(F.max("hv"))
        .first()[0]
    )
    assert row.kth_hv == kth_global


def test_q257_flesch_identity_and_plan(spark, sf_dir):
    """The score recomputes from its own emitted integer parts, and the
    whole query plans as projection + agg with no window/join."""
    q = QUERIES["q257_flesch_readability"](spark, sf_dir)
    plan = checks.executed_plan(q)
    assert "Window" not in plan and "Join" not in plan
    for r in q.collect():
        assert r.words > 0 and r.sentences >= r.n_docs >= 1
        expect = (
            206.835
            - 1.015 * (r.words / r.sentences)
            - 84.6 * (r.syllables / r.words)
        )
        assert r.flesch == expect  # identical IEEE chain, bit-exact


def test_q258_parkinson_nonneg_no_window(spark, sf_dir):
    q = QUERIES["q258_parkinson_volatility"](spark, sf_dir)
    assert "Window" not in checks.executed_plan(q)
    rows = q.collect()
    assert rows and all(r.parkinson_var >= 0.0 for r in rows)
    assert all(r.n_days >= 1 for r in rows)


def test_q259_lambda_null_only_when_flow_constant(spark, sf_dir):
    """lambda is NULL exactly when the per-user daily net flow never
    varies (denominator n*Σx² − (Σx)² == 0), never otherwise."""
    q = QUERIES["q259_kyle_lambda"](spark, sf_dir)
    assert "Window" not in checks.executed_plan(q)
    rows = q.collect()
    assert rows
    some_fit = False
    for r in rows:
        if r.lambda_cents is not None:
            some_fit = True
    assert some_fit


def test_q260_drawdown_bounds(spark, sf_dir):
    rows = QUERIES["q260_drawdown_duration"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.max_drawdown <= 0.0
        assert 0 <= r.max_underwater_days < r.n_days
        assert r.ulcer >= 0.0
        if r.max_underwater_days == 0:
            assert r.max_drawdown == 0.0 and r.ulcer == 0.0


def test_q261_shares_partition_unity(spark, sf_dir):
    rows = QUERIES["q261_charclass_drift"](spark, sf_dir).collect()
    assert len(rows) == 20
    for r in rows:
        s = r.alpha_share + r.digit_share + r.space_share + r.other_share
        assert abs(s - 1.0) < 1e-12
        assert 0.0 <= r.l1_drift <= 2.0


def test_q262_garman_klass_no_window_spark_side(spark, sf_dir):
    """OHLC comes from min_by/max_by aggregates — the Spark plan must
    have NO window at all (the row_number pair lives in the oracle
    only); both variance columns are finite."""
    q = QUERIES["q262_garman_klass"](spark, sf_dir)
    assert "Window" not in checks.executed_plan(q)
    rows = q.collect()
    assert rows
    import math

    for r in rows:
        assert math.isfinite(r.gk_var) and math.isfinite(r.rs_var)
        assert r.n_days >= 1


def test_q263_vr_nonneg_variances(spark, sf_dir):
    rows = QUERIES["q263_variance_ratio"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.n_returns >= 5  # users without a full 5-window drop
        assert r.var1_micro2 >= -1e-6 and r.var5_micro2 >= -1e-6
        if r.vr5 is not None:
            assert r.vr5 >= 0.0


def test_q264_downside_bounds(spark, sf_dir):
    rows = QUERIES["q264_downside_risk"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.max_drawdown <= 0.0
        assert r.downside_dev >= 0.0
        if r.omega is not None:
            assert r.omega > 0.0
        if r.sortino is not None and r.omega is not None:
            # sortino and (omega - 1) share the sign of the mean return
            assert (r.sortino > 0) == (r.omega > 1) or r.sortino == 0


def test_q265_centroid_drift_matches_numpy(spark, sf_dir):
    """Cosine/euclid vs a float64 numpy recompute of the same centroids
    — the micro-quantization error bound is ~1e-5 per coordinate."""
    import numpy as np

    rows = {r.label: r for r in QUERIES["q265_centroid_drift"](spark, sf_dir).collect()}
    assert len(rows) == 10
    from soict20221_bigdata_financialplatform_spark.sources import load_table

    pdf = load_table(spark, sf_dir, "embeddings").toPandas()
    embs = np.stack(pdf["embedding"].map(np.asarray).values).astype("float64")
    g = embs.mean(axis=0)
    for lab, r in rows.items():
        sub = embs[pdf["label"].values == lab]
        assert r.n_vecs == len(sub)
        c = sub.mean(axis=0)
        cos = float(c @ g / (np.linalg.norm(c) * np.linalg.norm(g)))
        assert abs(r.cos_to_global - cos) < 1e-3
        assert abs(r.eucl_dist - float(np.linalg.norm(c - g))) < 1e-4


def test_q266_leadlag_bounds_and_zero_shift_present(spark, sf_dir):
    rows = QUERIES["q266_leadlag_market"](spark, sf_dir).collect()
    assert rows
    ks = {r.k for r in rows}
    assert ks <= set(range(-3, 4)) and 0 in ks
    for r in rows:
        if r.corr is not None:
            assert -1.0 - 1e-9 <= r.corr <= 1.0 + 1e-9


def test_q267_hill_numbers_monotone(spark, sf_dir):
    """Hill numbers are non-increasing in their order q:
    richness (q=0) >= exp(H) (q=1) >= inverse-Simpson (q=2)."""
    rows = QUERIES["q267_hill_diversity"](spark, sf_dir).collect()
    assert len(rows) == 20
    for r in rows:
        assert 1 <= r.richness <= r.n_tokens
        assert r.shannon_h >= 0.0
        assert r.hill1 <= r.richness + 1e-3
        assert r.hill2 <= r.hill1 + 1e-3
        assert r.hill2 >= 1.0 - 1e-9


def test_q268_vpin_bounds(spark, sf_dir):
    """VPIN is a mean of per-bucket |imbalance|/volume ratios, so it
    lives in [0, 1]; the equal-volume split makes at most 20 buckets."""
    rows = QUERIES["q268_vpin"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 1 <= r.n_buckets <= 20
        assert 0.0 <= r.vpin <= 1.0


def test_q269_migration_matrix_accounting(spark, sf_dir):
    """Scores are quartile labels in 1..4 and the matrix total equals
    the number of customers active in BOTH halves."""
    rows = QUERIES["q269_rfm_migration"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 1 <= r.f_before <= 4 and 1 <= r.m_before <= 4
        assert 1 <= r.f_after <= 4 and 1 <= r.m_after <= 4
        assert r.n_customers >= 1


def test_q270_loo_sign_consistency(spark, sf_dir):
    """Removing a below-average-BPB source must RAISE corpus BPB and
    vice versa: sign(delta_bpb) == sign(bpb_all - bpb_source), where
    bpb_all is the byte-weighted mean reconstructed from the rows."""
    rows = QUERIES["q270_loo_source_value"](spark, sf_dir).collect()
    assert len(rows) == 20
    # reconstruct global bpb from the per-source decomposition
    from soict20221_bigdata_financialplatform_spark.operators import corpus as cp
    from soict20221_bigdata_financialplatform_spark.sources import load_table

    d = load_table(spark, sf_dir, "documents")
    sc = cp.lm_perplexity_scores(d, include_micro=True)
    j = d.select("doc_id", "n_chars").join(sc, "doc_id")
    gsm, gnc = j.agg(F.sum("logprob_micro"), F.sum("n_chars")).first()
    bpb_all = ((-gsm / 1e6) / 0.6931471805599453) / gnc
    for r in rows:
        assert r.bpb_source > 0 and r.bpb_loo > 0
        if r.bpb_source < bpb_all:
            assert r.delta_bpb > 0
        elif r.bpb_source > bpb_all:
            assert r.delta_bpb < 0


def test_q271_reservoir_deterministic_topk_plan(spark, sf_dir):
    q = QUERIES["q271_weighted_reservoir"](spark, sf_dir)
    plan = checks.executed_plan(q)
    assert "TakeOrderedAndProject" in plan  # partial top-k, no global sort
    a = q.collect()
    b = QUERIES["q271_weighted_reservoir"](spark, sf_dir).collect()
    assert a == b and len(a) == 64
    assert all(r.score <= 0.0 and r.n_chars > 0 for r in a)


def test_q272_label_accounting(spark, sf_dir):
    rows = QUERIES["q272_triple_barrier"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.n_up + r.n_down + r.n_timeout == r.n_labeled
        if r.avg_days_to_hit is not None:
            assert 1.0 <= r.avg_days_to_hit <= 5.0
        else:
            assert r.n_up + r.n_down == 0


def test_q274_uniqueness_bounds(spark, sf_dir):
    """Average uniqueness is mean(1/c) over c in 1..5, so it lives in
    [0.2, 1.0]; max concurrency is capped by the 5-day horizon."""
    rows = QUERIES["q274_label_uniqueness"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.n_labels >= 1
        assert 0.2 <= r.avg_uniqueness <= 1.0
        assert 1 <= r.max_concurrency <= 5


def test_q275_runs_accounting(spark, sf_dir):
    """Run count is bounded by the sign count, n1+n2 == n, and the
    z-score contract: emitted only on positive variance."""
    rows = QUERIES["q275_runs_test"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.n_up + r.n_down == r.n_signs
        assert 1 <= r.n_runs <= r.n_signs
        assert r.expected_runs >= 1.0
        if r.z_score is None:
            assert min(r.n_up, r.n_down) == 0 or r.n_signs <= 2


def test_q273_purged_fold_accounting(spark, sf_dir):
    """Folds tile the day axis; for every fold, test+train+purged
    covers every day exactly once, and the embargo purges at most
    2*3 days (3 each side)."""
    rows = QUERIES["q273_purged_kfold"](spark, sf_dir).collect()
    assert len(rows) == 5
    total_days = rows[0].n_test_days + rows[0].n_train_days + rows[0].n_purged_days
    for r in rows:
        assert r.n_test_days + r.n_train_days + r.n_purged_days == total_days
        assert 0 <= r.n_purged_days <= 6
        assert r.test_start <= r.test_end


def test_q276_spread_nonnegative(spark, sf_dir):
    rows = QUERIES["q276_corwin_schultz"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.n_pairs >= 1
        assert 0.0 <= r.cs_spread <= 2.0


def test_q277_hedge_mean_reversion_contract(spark, sf_dir):
    """Residual AR(1) of a stationary spread must sit inside (-1, 1);
    the OLS guard keeps degenerate users out entirely."""
    rows = QUERIES["q277_cointegration_hedge"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.n_days >= 3
        assert r.n_resid_pairs == r.n_days - 1
        if r.resid_ar1 is not None:
            assert -1.0 < r.resid_ar1 < 1.0


def test_q278_js_bounds(spark, sf_dir):
    """JS divergence is bounded by ln 2 and labels partition the
    corpus (sum of n_vecs == corpus size)."""
    rows = QUERIES["q278_embedding_shift"](spark, sf_dir).collect()
    assert rows
    total = sum(r.n_vecs for r in rows)
    from soict20221_bigdata_financialplatform_spark.sources.readers import load_table

    n = load_table(spark, sf_dir, "embeddings").count()
    assert total == n
    for r in rows:
        assert 0.0 <= r.js_divergence <= 0.6932


def test_q279_fano_positive(spark, sf_dir):
    rows = QUERIES["q279_word_burstiness"](spark, sf_dir).collect()
    assert 1 <= len(rows) <= 50
    counts = [r.total_count for r in rows]
    assert counts == sorted(counts, reverse=True)
    for r in rows:
        assert r.doc_freq >= 1
        assert r.fano >= 0.0


def test_q280_woe_sign_consistency(spark, sf_dir):
    """WOE is positive exactly when the band's good-share beats the
    population good-share (odds ratio > 1)."""
    rows = QUERIES["q280_woe_iv"](spark, sf_dir).collect()
    assert rows
    gt = sum(r.n_good for r in rows)
    bt = sum(r.n_bad for r in rows)
    for r in rows:
        assert r.n_good > 0 and r.n_bad > 0
        odds = (r.n_good * bt) / (r.n_bad * gt)
        assert (r.woe > 0) == (odds > 1.0) or abs(r.woe) < 1e-9
        assert r.iv_term >= -1e-9


def test_q281_hurst_range(spark, sf_dir):
    """H estimates live in a sane band around (0, 1.2); the block
    means exist whenever the user has >= one complete block."""
    rows = QUERIES["q281_hurst_rs"](spark, sf_dir).collect()
    assert rows
    got_h = False
    for r in rows:
        if r.hurst is not None:
            got_h = True
            assert -0.5 < r.hurst < 1.5
            assert r.nb4 >= 1 and r.nb16 >= 1
    assert got_h


def test_q282_event_curve_shape(spark, sf_dir):
    """Exactly 5 relative days; CAAR telescopes the per-day means;
    day 0 (the event day itself) has the largest |mean AR| since
    events are selected ON extreme moves."""
    rows = sorted(
        QUERIES["q282_event_study_car"](spark, sf_dir).collect(),
        key=lambda r: r.rel_day,
    )
    assert [r.rel_day for r in rows] == [-2, -1, 0, 1, 2]
    car = 0.0
    for r in rows:
        car += r.mean_ar
        assert abs(car - r.caar) < 1e-9
    # every event contributes its own day-0 row; other offsets can fall
    # off the series ends — so day 0 carries the max observation count
    assert max(r.n_obs for r in rows) == rows[2].n_obs


def test_q283_band_contract_and_plan(spark, sf_dir):
    """Every mined negative sits inside the band, never the anchor
    itself; per-anchor ranks are dense from 1; scoring broadcasts the
    anchors (no corpus shuffle before the band filter)."""
    q = QUERIES["q283_hard_negatives"](spark, sf_dir)
    plan = checks.executed_plan(q)
    assert "BroadcastExchange" in plan
    rows = q.collect()
    assert rows
    by_q = {}
    for r in rows:
        assert r.vec_id != r.query_id
        assert 0.20 <= r.score < 0.35
        by_q.setdefault(r.query_id, []).append(r.rank)
    for ranks in by_q.values():
        assert sorted(ranks) == list(range(1, len(ranks) + 1))


def test_q284_decile_accounting(spark, sf_dir):
    """Ten deciles, monotone mean signal by construction (the sort
    key), and every decile populated (the exact-NTile closed form
    never leaves a bucket empty when nd >= 10)."""
    rows = sorted(
        QUERIES["q284_momentum_deciles"](spark, sf_dir).collect(),
        key=lambda r: r.decile,
    )
    assert [r.decile for r in rows] == list(range(10))
    sigs = [r.mean_signal for r in rows]
    assert sigs == sorted(sigs)
    assert all(r.n_obs >= 1 for r in rows)


def test_q285_anisotropy_matches_bruteforce_pairs(spark, sf_dir):
    """The closed-form mean equals the brute-force mean of quantized
    pairwise cosines on one label (exactness of the algebra, not just
    bounds)."""
    rows = QUERIES["q285_embedding_anisotropy"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert -1.0 <= r.avg_pairwise_cos <= 1.0
    from soict20221_bigdata_financialplatform_spark.sources.readers import load_table

    lab = rows[0].label
    vecs = [
        v.uq
        for v in load_table(spark, sf_dir, "embeddings")
        .where(F.col("label") == lab)
        .select(
            F.transform(
                "embedding", lambda x: x.cast("double")
            ).alias("e")
        )
        .select(
            F.transform(
                "e",
                lambda x: F.floor(
                    x
                    / F.sqrt(
                        F.aggregate(
                            F.col("e"), F.lit(0.0), lambda a, y: a + y * y
                        )
                    )
                    * F.lit(10000.0)
                    + F.lit(0.5)
                ).cast("long"),
            ).alias("uq")
        )
        .collect()
    ]
    n = len(vecs)
    tot = 0
    for i in range(n):
        for j in range(n):
            if i != j:
                tot += sum(a * b for a, b in zip(vecs[i], vecs[j]))
    expect = tot / (n * (n - 1) * 1e8)
    got = [r.avg_pairwise_cos for r in rows if r.label == lab][0]
    assert abs(got - expect) < 1e-12


def test_q286_gini_bounds_and_plan(spark, sf_dir):
    """Gini lives in [0, 1); the rank window's direct input is the
    aggregate frame (the 16a license), never the raw events."""
    from soict20221_bigdata_financialplatform_spark.plans.linter import (
        low_cardinality_partition_window_count,
    )

    q = QUERIES["q286_activity_gini"](spark, sf_dir)
    assert low_cardinality_partition_window_count(q) == 0
    rows = q.collect()
    assert rows
    for r in rows:
        assert 0.0 <= r.gini < 1.0
        assert r.n_users >= 1 and r.n_events >= r.n_users


def test_q287_order_stat_contract(spark, sf_dir):
    """Exactly 19 terms per emitted user (top-19 over the 20th order
    stat); every term is >= 0 so the Hill mean is nonnegative and
    alpha positive whenever emitted."""
    rows = QUERIES["q287_tail_index"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.k_used == 19
        assert r.hill_mean >= 0.0
        if r.tail_alpha is not None:
            assert r.tail_alpha > 0.0


def test_q288_kclass_partition(spark, sf_dir):
    """The k-classes partition the user base and k-anonymity is the
    smallest class size."""
    r = QUERIES["q288_kanonymity_audit"](spark, sf_dir).first()
    assert r.n_users_k1 + r.n_users_k2_4 + r.n_users_k5p == r.n_users
    assert r.n_unique_fp <= r.n_fingerprints
    assert r.k_anonymity >= 1
    assert 0.0 <= r.reident_share <= 1.0
    if r.n_unique_fp == 0:
        assert r.reident_share == 0.0 and r.k_anonymity >= 2


def test_q289_rows_are_distributions(spark, sf_dir):
    """Each prev_type's outgoing probabilities sum to 1 and the matrix
    covers every observed type pair's mass exactly once."""
    rows = QUERIES["q289_behavior_markov"](spark, sf_dir).collect()
    assert rows
    by_prev = {}
    for r in rows:
        assert r.n >= 1 and 0.0 < r.p <= 1.0
        by_prev.setdefault(r.prev_type, []).append(r.p)
    for ps in by_prev.values():
        assert abs(sum(ps) - 1.0) < 1e-9


def test_q290_staleness_bounds(spark, sf_dir):
    rows = QUERIES["q290_price_staleness"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 0 <= r.n_flat <= r.n_changes
        assert 0.0 <= r.zero_return_share <= 1.0
        assert 0 <= r.longest_flat_run <= r.n_flat


def test_q291_family_accounting(spark, sf_dir):
    rows = QUERIES["q291_template_detection"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 0 <= r.n_template_docs <= r.n_docs
        assert 0.0 <= r.template_share <= 1.0
        assert r.largest_family >= 1
        if r.largest_family == 1:
            assert r.n_template_docs == 0


def test_q292_waste_monotone_in_ctx_len(spark, sf_dir):
    """For a fixed source, padding waste is monotone nondecreasing in
    the context length (bigger windows never pad less per doc), and
    slots are always >= tokens."""
    rows = QUERIES["q292_packing_efficiency"](spark, sf_dir).collect()
    assert rows
    by_src = {}
    for r in rows:
        assert r.n_slots >= r.n_tokens > 0
        assert 0.0 <= r.pad_waste_share < 1.0
        by_src.setdefault(r.source, {})[r.ctx_len] = r.pad_waste_share
    for d in by_src.values():
        assert d[512] <= d[2048] <= d[8192]


def test_q293_dispersion_nonneg(spark, sf_dir):
    rows = QUERIES["q293_market_dispersion"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.n_users >= 1
        if r.dispersion is not None:
            assert r.dispersion >= 0.0
        else:
            assert r.n_users == 1


def test_q294_rho_in_feasible_band(spark, sf_dir):
    """Equicorrelation is bounded below by -1/(n-1) (PSD constraint)
    and above by 1; mean user variance must be positive for emission."""
    r = QUERIES["q294_avg_correlation"](spark, sf_dir).first()
    assert r.n_users >= 2 and r.n_days >= 1
    assert r.market_var >= 0.0 and r.mean_user_var > 0.0
    assert r.avg_correlation is not None
    assert -1.0 / (r.n_users - 1) - 1e-9 <= r.avg_correlation <= 1.0 + 1e-9


def test_q295_hours_and_nonneg(spark, sf_dir):
    rows = QUERIES["q295_intraday_vol_signature"](spark, sf_dir).collect()
    assert 1 <= len(rows) <= 24
    for r in rows:
        assert 0 <= r.hour_of_day <= 23
        assert r.n_ticks >= 1
        if r.tick_ret_var is not None:
            assert r.tick_ret_var >= -1e-12


def test_q296_oov_bounds_and_source_coverage(spark, sf_dir):
    """The md5 holdout covers every source (the doc_id-mod split would
    cover 4 of 20 — the bug the md5 split exists to avoid)."""
    rows = QUERIES["q296_bigram_oov"](spark, sf_dir).collect()
    assert len(rows) == 20
    for r in rows:
        assert 0 <= r.n_oov <= r.n_test_bigrams
        assert 0.0 <= r.oov_rate <= 1.0


def test_q297_moment_inequalities_and_numpy(spark, sf_dir):
    """Population-moment identities hold (ex-kurt ≥ −2; the Pearson
    inequality kurt ≥ 1 + skew², i.e. jb terms are well-defined), and
    the heaviest user's moments match a numpy recompute on the SAME
    clamped milli-return lattice (third-path check, q265 style)."""
    import numpy as np

    rows = QUERIES["q297_return_moments"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.n_rets >= 4
        if r.skewness is not None:
            assert r.ex_kurtosis >= -2.0 - 1e-9
            assert (r.ex_kurtosis + 3.0) >= 1.0 + r.skewness**2 - 1e-9
            assert r.jb_stat >= -1e-12
    # third path: recompute for the user with the most returns
    from soict20221_bigdata_financialplatform_spark.sources import load_table

    ev = load_table(spark, sf_dir, "events")
    day = F.date_trunc("day", F.col("ts").cast("timestamp")).cast("date")
    b = (
        ev.groupBy("user_id", day.alias("day"))
        .agg(F.max_by("value", F.struct("ts", "event_id")).alias("cl"))
        .where(F.col("cl") > 0)
    )
    pdf = b.toPandas().sort_values(["user_id", "day"])
    target = max(rows, key=lambda r: r.n_rets)
    g = pdf[pdf.user_id == target.user_id]
    import math

    rms = []
    prev = None
    for cl in g.cl:
        if prev is not None:
            rm = math.floor(round(math.log(cl / prev), 6) * 1000.0 + 0.5)
            rms.append(max(-2000, min(2000, rm)))
        prev = cl
    a = np.array(rms, dtype=float)
    m2 = (a**2).mean() - a.mean() ** 2
    m3 = (a**3).mean() - 3 * a.mean() * (a**2).mean() + 2 * a.mean() ** 3
    skew = m3 / (m2 * math.sqrt(m2))
    assert abs(skew - target.skewness) < 1e-9


def test_q298_ams_sketch_sanity(spark, sf_dir):
    """k pins at 16, true F2 is positive, the estimate is positive and
    within the generous 4-sigma AMS band (stderr = sqrt(2/k) ≈ 0.35),
    and rel_err is consistent with (est−true)/true."""
    r = QUERIES["q298_ams_f2"](spark, sf_dir).first()
    assert r.k == 16 and r.n_stores == 20
    assert r.true_f2 > 0 and r.est_f2 > 0
    assert abs(r.rel_err) < 1.5
    assert abs(r.rel_err - (r.est_f2 - r.true_f2) / r.true_f2) < 1e-12


def test_q299_assortativity_bounds(spark, sf_dir):
    r = QUERIES["q299_degree_assortativity"](spark, sf_dir).first()
    assert r.n_vertices > 0 and r.n_edges > 0
    if r.assortativity is not None:
        assert -1.0 - 1e-9 <= r.assortativity <= 1.0 + 1e-9


def test_q300_adamic_adar_non_edges_scored(spark, sf_dir):
    """Top-100 predictions: positive scores, descending order, and no
    predicted pair may be an existing edge; candidate build stays
    equi-join (no conditional BNLJ)."""
    from soict20221_bigdata_financialplatform_spark.queries import (
        _pmi_graph_edges,
    )

    # a sibling test's persisted PMI-edge cache substitutes an
    # InMemoryRelation into this plan and hides the one-row-aggregate
    # build side from the BNLJ exemption — lint the FRESH plan
    spark.catalog.clearCache()
    q = QUERIES["q300_adamic_adar"](spark, sf_dir)
    assert conditional_bnlj_count(q) == 0
    rows = q.collect()
    assert 0 < len(rows) <= 100
    edges = {
        (r.a, r.b) for r in _pmi_graph_edges(spark, sf_dir).collect()
    }
    prev = None
    for r in rows:
        assert r.n_common >= 1 and r.aa_score > 0
        assert r.w_a < r.w_b
        assert (r.w_a, r.w_b) not in edges
        if prev is not None:
            assert r.aa_score <= prev + 1e-12
        prev = r.aa_score


def test_q301_ffd_weights_and_first_difference_limit(spark, sf_dir):
    """The weight recursion is the binomial series (d=1 degenerates to
    the first difference), and every emitted row has the full 8-day
    lookback by construction (close is the cent-lattice value)."""
    from soict20221_bigdata_financialplatform_spark.queries import (
        _FFD_W,
        _ffd_weights,
    )

    assert _ffd_weights(1.0, 4) == [1.0, -1.0, 0.0, 0.0]
    assert _FFD_W[0] == 1.0 and _FFD_W[1] == -0.4
    assert all(w < 0 for w in _FFD_W[1:])
    rows = QUERIES["q301_fracdiff"](spark, sf_dir).collect()
    assert rows
    for r in rows[:50]:
        assert abs(r.close * 100 - round(r.close * 100)) < 1e-6
    # memory property: ffd is not the plain return — weights tail < 1
    assert abs(sum(_FFD_W)) < 1.0


def test_q302_calibration_algebra(spark, sf_dir):
    """Bins partition the corpus; conf/acc/brier/ece all live in [0,1];
    ECE is bounded above by the max per-bin gap."""
    rows = QUERIES["q302_brier_calibration"](spark, sf_dir).collect()
    assert 1 <= len(rows) <= 10
    n_total = sum(r.n_docs for r in rows)
    from soict20221_bigdata_financialplatform_spark.sources import load_table

    assert n_total == load_table(spark, sf_dir, "documents").count()
    max_gap = 0.0
    for r in rows:
        assert 0 <= r.bin <= 9
        assert 0.0 <= r.avg_conf <= 1.0
        assert 0.0 <= r.emp_acc <= 1.0
        assert 0.0 <= r.brier <= 1.0
        assert 0.0 <= r.ece <= 1.0
        max_gap = max(max_gap, abs(r.emp_acc - r.avg_conf))
    assert rows[0].ece <= max_gap + 1e-6


def test_q303_pca_unit_loading_and_share(spark, sf_dir):
    """The emitted loading vector is ~unit-norm (the quantized normalize
    divides by an integer-derived sqrt), and the explained share of the
    TOP component lives in (1/64, 1] — power iteration can't do worse
    than the average direction on a PSD covariance."""
    rows = QUERIES["q303_pca_power_iteration"](spark, sf_dir).collect()
    assert len(rows) == 64
    norm2 = sum(r.loading**2 for r in rows)
    assert abs(norm2 - 1.0) < 1e-3
    share = rows[0].explained_share
    assert all(abs(r.explained_share - share) < 1e-15 for r in rows)
    assert 1.0 / 64.0 < share <= 1.0 + 1e-9


def test_q304_information_inequalities(spark, sf_dir):
    """0 ≤ MI ≤ min(H(X), H(Y)); entropies bounded by ln of support
    sizes; NMI in [0, 1]."""
    import math

    r = QUERIES["q304_mi_lang_source"](spark, sf_dir).first()
    assert r.n_docs > 0
    assert -1e-6 <= r.mi_nats <= min(r.h_lang, r.h_source) + 1e-6
    assert 0.0 < r.h_lang <= math.log(5) + 1e-6
    assert 0.0 < r.h_source <= math.log(20) + 1e-6
    assert r.nmi is None or -1e-6 <= r.nmi <= 1.0 + 1e-6


def test_q305_ljung_box_bounds(spark, sf_dir):
    """Sample ACF values live in [-1, 1] and Q is non-negative; the
    centered-moment algebra degenerates to numpy on one user."""
    import numpy as np

    rows = QUERIES["q305_ljung_box"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.n_rets >= 10
        for k in range(1, 6):
            assert abs(getattr(r, "rho{0}".format(k))) <= 1.0 + 1e-9
        assert r.q_stat >= -1e-12
    # third path: numpy recompute of rho1 for the largest user
    from soict20221_bigdata_financialplatform_spark.sources import load_table
    import math

    target = max(rows, key=lambda r: r.n_rets)
    ev = load_table(spark, sf_dir, "events")
    day = F.date_trunc("day", F.col("ts").cast("timestamp")).cast("date")
    b = (
        ev.where(F.col("user_id") == target.user_id)
        .groupBy("user_id", day.alias("day"))
        .agg(F.max_by("value", F.struct("ts", "event_id")).alias("cl"))
        .where(F.col("cl") > 0)
        .orderBy("day")
    )
    cls = [r.cl for r in b.collect()]
    rs = [
        max(-2000, min(2000,
            math.floor(round(math.log(cls[i] / cls[i - 1]), 6) * 1000.0 + 0.5)))
        for i in range(1, len(cls))
    ]
    a = np.array(rs, dtype=float)
    mu = a.mean()
    num = ((a[1:] - mu) * (a[:-1] - mu)).sum()
    den = ((a - mu) ** 2).sum()
    assert abs(num / den - target.rho1) < 1e-9


def test_q306_rich_club_monotone_support(spark, sf_dir):
    """Club sizes shrink as k grows; edges within a club never exceed
    the complete-graph bound (phi ≤ 1)."""
    rows = {r.k: r for r in QUERIES["q306_rich_club"](spark, sf_dir).collect()}
    assert set(rows) == {4, 8, 16}
    assert rows[4].n_rich >= rows[8].n_rich >= rows[16].n_rich
    for r in rows.values():
        assert 0 <= r.e_rich
        if r.phi is not None:
            assert 0.0 <= r.phi <= 1.0 + 1e-9


def test_q307_auc_matches_sklearn_free_recompute(spark, sf_dir):
    """AUC from the grouped-rank identity equals a direct O(n log n)
    recompute (tie-corrected MW), and Gini = 2·AUC − 1."""
    r = QUERIES["q307_roc_auc"](spark, sf_dir).first()
    assert r.n_pos > 0 and r.n_neg > 0
    assert 0.0 <= r.auc <= 1.0
    assert abs(r.gini - (2.0 * r.auc - 1.0)) < 1e-15
    from soict20221_bigdata_financialplatform_spark.functions import text as tx
    from soict20221_bigdata_financialplatform_spark.sources import load_table

    d = load_table(spark, sf_dir, "documents")
    rows = d.select(
        (F.col("lang") == "en").cast("int").alias("y"),
        tx.lang_id_en_score("text").alias("s"),
    ).collect()
    pairs = sorted((r2.s, r2.y) for r2 in rows)
    c = t = 0
    neg_below = 0
    i = 0
    while i < len(pairs):
        j = i
        np_ = nn_ = 0
        while j < len(pairs) and pairs[j][0] == pairs[i][0]:
            if pairs[j][1] == 1:
                np_ += 1
            else:
                nn_ += 1
            j += 1
        c += np_ * neg_below
        t += np_ * nn_
        neg_below += nn_
        i = j
    auc = (2 * c + t) / (2 * r.n_pos * r.n_neg)
    assert abs(auc - r.auc) < 1e-15


def test_q308_outliers_sorted_and_positive(spark, sf_dir):
    rows = QUERIES["q308_embedding_outliers"](spark, sf_dir).collect()
    assert 0 < len(rows) <= 50
    prev = None
    for r in rows:
        assert r.mahalanobis2 >= 0.0
        if prev is not None:
            assert r.mahalanobis2 <= prev + 1e-12
        prev = r.mahalanobis2
    # diagonal Mahalanobis² of a typical point ~ dim; top outliers above
    assert rows[0].mahalanobis2 > 64.0


def test_q309_pairs_banding_and_bounds(spark, sf_dir):
    """Top pairs: ascending SSD, distinct users, >= 10 common days; both
    members of every pair must share the 4-move sign signature by
    construction (banding recall contract)."""
    rows = QUERIES["q309_pairs_trading_ssd"](spark, sf_dir).collect()
    assert rows
    prev = None
    for r in rows:
        assert r.user_a < r.user_b
        assert r.n_days >= 10
        assert r.ssd >= 0.0
        if prev is not None:
            assert r.ssd >= prev - 1e-12
        prev = r.ssd


def test_q310_anova_decomposition(spark, sf_dir):
    """SSB + SSW equals the total sum of squares (within quantization),
    both non-negative, F non-negative."""
    r = QUERIES["q310_anova_dow"](spark, sf_dir).first()
    assert r.n_obs > 10 and 2 <= r.k_groups <= 7
    assert r.ssb >= -1e-6 and r.ssw >= 0.0
    if r.f_stat is not None:
        assert r.f_stat >= 0.0


def test_q311_nw_consistency(spark, sf_dir):
    """var_nw/var_iid equals nw_ratio exactly; variances non-negative;
    for an IID-ish series the ratio stays in a broad positive band."""
    rows = QUERIES["q311_newey_west"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.n_rets >= 8
        assert r.var_iid >= 0.0
        if r.nw_ratio is not None:
            assert abs(r.var_nw / r.var_iid - r.nw_ratio) < 1e-9
            # Bartlett NW is a PSD spectral estimate — never negative
            assert r.var_nw >= -1e-12 and r.nw_ratio >= -1e-9


def test_q312_theil_sen_median_identity(spark, sf_dir):
    """One row per eligible user; the slope equals the numpy lower
    median of all pairwise slopes on the same capped window."""
    import numpy as np

    rows = QUERIES["q312_theil_sen"](spark, sf_dir).collect()
    assert rows
    by_user = {}
    for r in rows:
        assert r.user_id not in by_user  # exactly one median row
        by_user[r.user_id] = r
        nd = int((1 + (1 + 8 * r.n_pairs) ** 0.5) / 2)
        assert nd * (nd - 1) // 2 == r.n_pairs
    from soict20221_bigdata_financialplatform_spark.sources import load_table
    import math

    target = max(rows, key=lambda r: r.n_pairs)
    ev = load_table(spark, sf_dir, "events")
    day = F.date_trunc("day", F.col("ts").cast("timestamp")).cast("date")
    b = (
        ev.where(F.col("user_id") == target.user_id)
        .groupBy("user_id", day.alias("day"))
        .agg(F.max_by("value", F.struct("ts", "event_id")).alias("cl"))
        .where(F.col("cl") > 0)
        .orderBy("day")
        .limit(20)
    )
    cq = [math.floor(r.cl * 100.0 + 0.5) for r in b.collect()]
    slopes = sorted(
        (cq[j] - cq[i]) / (j - i)
        for i in range(len(cq))
        for j in range(i + 1, len(cq))
    )
    lower_median = slopes[(len(slopes) + 1) // 2 - 1]
    assert abs(lower_median / 100.0 - target.ts_slope) < 1e-12


def test_q313_corr_matrix_shape(spark, sf_dir):
    """At most C(8,2)=28 pairs, correlations in [-1, 1], users drawn
    from the top-8 activity set only."""
    rows = QUERIES["q313_realized_corr_matrix"](spark, sf_dir).collect()
    assert 0 < len(rows) <= 28
    users = set()
    for r in rows:
        assert r.user_a < r.user_b and r.n_days >= 5
        users.update((r.user_a, r.user_b))
        if r.corr is not None:
            assert -1.0 - 1e-9 <= r.corr <= 1.0 + 1e-9
    assert len(users) <= 8


def test_q314_pe_bounds_and_numpy(spark, sf_dir):
    """Normalized PE in (0, 1]; entropy matches a numpy recompute of the
    ordinal-pattern distribution for the largest user."""
    import math

    rows = QUERIES["q314_permutation_entropy"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.n_triples >= 20
        assert 0.0 <= r.h_perm <= math.log(6) + 1e-6
        assert 0.0 <= r.pe_norm <= 1.0 + 1e-6
    from soict20221_bigdata_financialplatform_spark.sources import load_table

    target = max(rows, key=lambda r: r.n_triples)
    ev = load_table(spark, sf_dir, "events")
    day = F.date_trunc("day", F.col("ts").cast("timestamp")).cast("date")
    b = (
        ev.where(F.col("user_id") == target.user_id)
        .groupBy("user_id", day.alias("day"))
        .agg(F.max_by("value", F.struct("ts", "event_id")).alias("cl"))
        .where(F.col("cl") > 0)
        .orderBy("day")
    )
    cq = [math.floor(r.cl * 100.0 + 0.5) for r in b.collect()]
    from collections import Counter

    pats = Counter()
    for i in range(2, len(cq)):
        v1, v2, v3 = cq[i - 2], cq[i - 1], cq[i]
        pats[(v1 <= v2, v1 <= v3, v2 <= v3)] += 1
    n = sum(pats.values())
    h = round(math.log(n), 6) - sum(
        math.floor(c * round(math.log(c), 6) * 1e6 + 0.5) for c in pats.values()
    ) / (1e6 * n)
    assert n == target.n_triples
    assert abs(h - target.h_perm) < 1e-12


def test_q315_rank_persistence_bounds(spark, sf_dir):
    rows = QUERIES["q315_rank_persistence"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.n_users >= 1
        if r.rho_s is not None:
            assert -1.0 - 1e-9 <= r.rho_s <= 1.0 + 1e-9
        else:
            assert r.n_users < 3


def test_q316_attrition_accounting(spark, sf_dir):
    """Per-rule pass counts bound pass_all; every count bounded by
    n_docs; 20 sources present."""
    rows = QUERIES["q316_filter_attrition"](spark, sf_dir).collect()
    assert len(rows) == 20
    for r in rows:
        for c in (
            r.pass_len,
            r.pass_wordlen,
            r.pass_stopword,
            r.pass_repetition,
        ):
            assert 0 <= c <= r.n_docs
            assert r.pass_all <= c
        assert abs(r.survival_rate - r.pass_all / r.n_docs) < 1e-15


def test_q317_savings_identity(spark, sf_dir):
    """Global dup docs == n_docs − distinct digests; token drops bounded
    by totals; shares in [0, 1]."""
    rows = QUERIES["q317_dedup_savings"](spark, sf_dir).collect()
    assert len(rows) == 20
    from soict20221_bigdata_financialplatform_spark.sources import load_table

    d = load_table(spark, sf_dir, "documents")
    n_docs, n_dg = d.agg(
        F.count(F.lit(1)), F.count_distinct(F.md5("text"))
    ).first()
    assert sum(r.n_dup_docs for r in rows) == n_docs - n_dg
    for r in rows:
        assert 0 <= r.tokens_dropped <= r.tokens_total
        assert r.savings_share is None or 0.0 <= r.savings_share <= 1.0


def test_q318_mk_consistency_with_theil_sen(spark, sf_dir):
    """|S| bounded by pair count; z sign agrees with a strongly nonzero
    Theil-Sen slope on the same capped window; variance positive."""
    mk = {r.user_id: r for r in QUERIES["q318_mann_kendall"](spark, sf_dir).collect()}
    ts = {r.user_id: r for r in QUERIES["q312_theil_sen"](spark, sf_dir).collect()}
    assert mk
    for uid, r in mk.items():
        assert abs(r.mk_s) <= r.n_days * (r.n_days - 1) // 2
        assert r.var_s > 0
        if r.z_stat is not None and abs(r.z_stat) > 2.5 and uid in ts:
            # a strongly significant monotone trend must match the
            # robust slope's sign
            assert (r.z_stat > 0) == (ts[uid].ts_slope > 0)


def test_q319_entropy_bounds(spark, sf_dir):
    import math

    rows = QUERIES["q319_behavior_entropy"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.n_events >= 10 and r.richness >= 1
        assert -1e-9 <= r.h_behavior <= math.log(r.richness) + 1e-6
        assert 1.0 - 1e-9 <= r.inv_simpson <= r.richness + 1e-9


def test_q320_beta_asymmetry_identity(spark, sf_dir):
    """asymmetry == beta_down - beta_up when both defined; side counts
    are >= 4 by the HAVING contract."""
    rows = QUERIES["q320_downside_beta"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.n_down >= 4 and r.n_up >= 4
        if r.asymmetry is not None:
            assert abs(r.asymmetry - (r.beta_down - r.beta_up)) < 1e-12


def test_q321_half_life_contract(spark, sf_dir):
    """half_life only for decaying users, positive when present; slope
    NULL only under zero x-variance."""
    rows = QUERIES["q321_activity_half_life"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.n_active_days >= 5
        if r.half_life_days is not None:
            assert r.decay_slope < 0
            assert r.half_life_days > 0
        elif r.decay_slope is not None:
            assert r.decay_slope >= 0


def test_q322_ochiai_bounds_and_order(spark, sf_dir):
    """Ochiai in (0, 1]; descending; c_ab never exceeds either df."""
    rows = QUERIES["q322_ochiai_collocations"](spark, sf_dir).collect()
    assert 0 < len(rows) <= 50
    prev = None
    for r in rows:
        assert 0.0 < r.ochiai <= 1.0 + 1e-12
        assert r.c_ab >= 5
        if prev is not None:
            assert r.ochiai <= prev + 1e-12
        prev = r.ochiai


def test_q323_centroid_eval_accounting(spark, sf_dir):
    """10 label rows; correct <= n; on random embeddings accuracy sits
    near chance (well below 0.5) — the honest-algebra contract."""
    rows = QUERIES["q323_nearest_centroid_eval"](spark, sf_dir).collect()
    assert len(rows) == 10
    n_tot = sum(r.n_vecs for r in rows)
    n_cor = sum(r.n_correct for r in rows)
    assert n_tot == 500 or n_tot > 0
    for r in rows:
        assert 0 <= r.n_correct <= r.n_vecs
        assert abs(r.accuracy - r.n_correct / r.n_vecs) < 1e-15
    assert n_cor / n_tot < 0.5


def test_q324_spectral_pair_sanity(spark, sf_dir):
    """Shares positive and of the same order; on the testdata's RANDOM
    embeddings the spectrum is deliberately flat, so after 4 truncated
    rounds lambda-hat-1 and lambda-hat-2 are estimates within noise of
    each other (gap ~ 1, either side) — assert the band, not strict
    ordering. share1 must match q303's explained_share exactly (same
    machinery)."""
    r = QUERIES["q324_spectral_pair"](spark, sf_dir).first()
    assert r.share1 > 0 and r.share2 > 0
    assert r.share1 >= 0.5 * r.share2  # same order of magnitude
    assert r.spectral_gap is None or r.spectral_gap >= 0.5
    q303 = QUERIES["q303_pca_power_iteration"](spark, sf_dir).first()
    assert abs(q303.explained_share - r.share1) < 1e-9


def _gram_as_map(mat1):
    """Cell map {(i, j): c} from the r14 1-row array-carried Gram frame."""
    m = mat1.first().m
    return {
        (i, j): c for i, row in enumerate(m) for j, c in enumerate(row)
    }


def test_embedding_gram_null_rows_dropped(spark):
    """r10 ADVICE: a NULL embedding row used to crash the rebuilt Gram
    pass (np.stack raises on a NULL array), a dirty-data regression vs
    the pre-r10 join shape which silently skipped them. The helper now
    drops NULL rows before stacking — the Gram state over (clean ∪
    NULLs) must equal the state over clean alone."""
    import pyspark.sql.functions as F

    from soict20221_bigdata_financialplatform_spark.queries import (
        _embedding_gram_cn,
    )

    clean = spark.createDataFrame(
        [(i, [float(i + j) / 10.0 for j in range(4)]) for i in range(12)],
        "vec_id long, embedding array<float>",
    )
    dirty = clean.unionByName(
        spark.createDataFrame(
            [(100, None), (101, None)],
            "vec_id long, embedding array<float>",
        )
    )
    m_clean, trq_clean = _embedding_gram_cn(spark, clean)
    m_dirty, trq_dirty = _embedding_gram_cn(spark, dirty)
    assert _gram_as_map(m_dirty) == _gram_as_map(m_clean)  # bit-identical
    assert trq_dirty.first().trs == trq_clean.first().trs


def test_embedding_gram_ragged_rows_match_zero_padding(spark):
    """A ragged (short) embedding contributes only to the cells its dims
    span — exactly what the replaced posexplode-join computed, and
    bit-identical to zero-padding the row (zeros vanish under products
    and sums). Empty arrays contribute nothing."""
    from soict20221_bigdata_financialplatform_spark.queries import (
        _embedding_gram_cn,
    )

    base_rows = [
        (i, [float(i + j) / 10.0 for j in range(4)]) for i in range(10)
    ]
    ragged = spark.createDataFrame(
        base_rows + [(50, [0.7, 0.3]), (51, [])],
        "vec_id long, embedding array<float>",
    )
    padded = spark.createDataFrame(
        base_rows + [(50, [0.7, 0.3, 0.0, 0.0]), (51, [0.0, 0.0, 0.0, 0.0])],
        "vec_id long, embedding array<float>",
    )
    m_r, trq_r = _embedding_gram_cn(spark, ragged)
    m_p, trq_p = _embedding_gram_cn(spark, padded)
    assert _gram_as_map(m_r) == _gram_as_map(m_p)
    assert trq_r.first().trs == trq_p.first().trs


def test_embedding_gram_null_elements_quantize_to_zero(spark):
    """A NULL *element* inside an embedding must behave like the old
    posexplode-join's SUM null-skip (≡ a zero element) — NOT reach
    np.stack, where Arrow delivers it as NaN and astype(int64) silently
    wraps to INT64_MIN, poisoning the Gram cells."""
    from soict20221_bigdata_financialplatform_spark.queries import (
        _embedding_gram_cn,
    )

    rows = [(i, [float(i + j) / 10.0 for j in range(4)]) for i in range(10)]
    with_null = spark.createDataFrame(
        rows + [(50, [0.7, None, 0.3, 0.1])],
        "vec_id long, embedding array<float>",
    )
    with_zero = spark.createDataFrame(
        rows + [(50, [0.7, 0.0, 0.3, 0.1])],
        "vec_id long, embedding array<float>",
    )
    m_n, trq_n = _embedding_gram_cn(spark, with_null)
    m_z, trq_z = _embedding_gram_cn(spark, with_zero)
    assert _gram_as_map(m_n) == _gram_as_map(m_z)
    assert trq_n.first().trs == trq_z.first().trs

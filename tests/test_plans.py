"""Plan assertions (SURVEY §4): the optimizer claims are tested, not assumed.
Runs against sf0.001 — plan shape, not data volume, is under test."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from soict20221_bigdata_financialplatform_spark.plans import checks
from soict20221_bigdata_financialplatform_spark.queries import QUERIES
from soict20221_bigdata_financialplatform_spark.sources import load_table
from soict20221_bigdata_financialplatform_spark.sources.readers import (
    load_events_time_range,
)


def test_flagship_pushes_both_predicates(spark, sf_dir):
    """The events time-range loader must push BOTH user_id and the raw-ns ts
    range into the parquet scan (row-group pruning at scale)."""
    q = (
        load_events_time_range(spark, sf_dir, "2024-01-05 00:00:00", "2024-01-20 00:00:00")
        .where(F.col("user_id") == 7)
        .select("user_id", "ts", "value")
    )
    pushed = checks.pushed_filters(q)
    assert "user_id" in pushed
    assert "ts" in pushed  # the BIGINT range comparison, not the computed col


def test_column_pruning_reaches_scan(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    rs = checks.read_schema(li)
    assert "l_orderkey" in rs and "l_quantity" in rs
    assert "l_extendedprice" not in rs  # untouched columns not read


def test_q01_filter_pushdown(spark, sf_dir):
    q = QUERIES["q01_pricing_summary"](spark, sf_dir)
    assert "l_shipdate" in checks.pushed_filters(q)


def test_small_dims_broadcast(spark, sf_dir):
    q = QUERIES["q08_asia_nations"](spark, sf_dir)
    assert checks.uses_broadcast_join(q)


def test_windows_share_one_exchange(spark, sf_dir):
    """change_abs + change_pct + sma over the same key/order must plan ONE
    hash exchange, not three (EnsureRequirements reuses the partitioning)."""
    from soict20221_bigdata_financialplatform_spark.functions import indicators as ind

    e = load_table(spark, sf_dir, "events").select("user_id", "ts", "value")
    out = ind.sma(
        ind.change_pct(ind.change_abs(e, ("user_id",), "ts", "value"),
                       ("user_id",), "ts", "value"),
        20, ("user_id",), "ts", "value",
    )
    plan = checks.executed_plan(out)
    # exactly one exchange for the window partitioning
    assert plan.count("Exchange hashpartitioning(user_id") == 1


def test_hot_path_is_codegen(spark, sf_dir):
    q = QUERIES["q01_pricing_summary"](spark, sf_dir)
    assert checks.codegen_stage_count(q) >= 1


def test_profile_is_single_scan(spark, sf_dir):
    """corpus.profile must read the input ONCE: one scan, one aggregation
    chain (regression: the first version ran one agg PER COLUMN — k full
    scans of a 100 TB table for a k-column profile)."""
    from soict20221_bigdata_financialplatform_spark.operators import corpus

    docs = load_table(spark, sf_dir, "documents")
    plan = checks.executed_plan(corpus.profile(docs))
    assert plan.count("Scan parquet") == 1
    assert "Union" not in plan  # the old k-scan shape unioned k aggs


def test_correlated_shapes_never_nested_loop(spark, sf_dir):
    """The round-2 correlated/OR shapes must plan hash joins only: residual
    conditions ride equi keys; OR predicates are post-join filters (a
    nested-loop join here is the 100 TB scale-killer — invariant 13)."""
    for name in (
        "q73_order_priority_exists", "q74_nation_trade_volume",
        "q82_discount_or_predicates", "q83_waiting_orders",
        "q84_min_cost_supplier",
    ):
        plan = checks.executed_plan(QUERIES[name](spark, sf_dir))
        assert "NestedLoop" not in plan and "CartesianProduct" not in plan, name


def test_threshold_shapes_share_one_derivation(spark, sf_dir):
    """q77/q80's two consumers (global threshold + final filter) must read
    the SAME persisted aggregate, not re-derive the lineitem subtree; q86's
    doc-length/doc-frequency likewise share the tokenized tf frame."""
    for name, cache_scans in (
        ("q77_important_parts", 2),
        ("q80_top_supplier", 2),
        ("q86_tfidf_top_terms", 2),
    ):
        plan = checks.executed_plan(QUERIES[name](spark, sf_dir))
        assert plan.count("InMemoryTableScan") >= cache_scans, name


def test_pii_redaction_is_shuffle_free(spark, sf_dir):
    """q85 is a pure projection: zero exchanges before the final sort."""
    df = QUERIES["q85_pii_redaction"](spark, sf_dir)
    plan = checks.executed_plan(df)
    # the only exchange allowed is the rangepartitioning for ORDER BY
    import re
    ex = [l for l in plan.splitlines() if "Exchange" in l]
    assert all("rangepartitioning" in l for l in ex), ex


def test_bollinger_single_window_single_exchange(spark, sf_dir):
    """q95: mid/sd/bands/%B all share one trailing frame -> ONE Window node
    behind ONE hash exchange (Catalyst must not split the envelope)."""
    q = QUERIES["q95_bollinger"](spark, sf_dir)
    plan = checks.executed_plan(q)
    assert plan.count("Exchange hashpartitioning(user_id") == 1
    assert plan.count("Window") == 1


def test_running_vwap_single_exchange(spark, sf_dir):
    q = QUERIES["q97_running_vwap"](spark, sf_dir)
    plan = checks.executed_plan(q)
    assert plan.count("Exchange hashpartitioning(l_partkey") == 1


def test_heavy_hitters_total_is_broadcast(spark, sf_dir):
    """q98: the grand-total scalar joins as a broadcast of ONE row — the
    grouped token frame never funnels through a single partition."""
    q = QUERIES["q98_token_heavy_hitters"](spark, sf_dir)
    plan = checks.executed_plan(q)
    assert "BroadcastExchange" in plan
    assert "SinglePartition" not in plan.split("BroadcastExchange")[0]


def test_unpivot_is_expand_no_extra_exchange(spark, sf_dir):
    """q101: the melt is an Expand projection — exactly the aggregate's own
    exchange, nothing added by the reshape."""
    q = QUERIES["q101_unpivot"](spark, sf_dir)
    plan = checks.executed_plan(q)
    assert "Expand" in plan
    assert plan.count("Exchange hashpartitioning") == 1


def test_variant_path_has_no_python_udf(spark, sf_dir):
    """q102: VARIANT shredding stays JVM-side (no BatchEvalPython /
    ArrowEvalPython in the plan)."""
    q = QUERIES["q102_variant_json"](spark, sf_dir)
    plan = checks.executed_plan(q)
    assert "EvalPython" not in plan


def test_runtime_bloom_filter_injects_on_star_join(spark, sf_dir):
    """Spark's runtime row-level filter (InjectRuntimeFilter) builds a bloom
    filter from the selectively-filtered dim side and applies it to the fact
    scan BEFORE the shuffle — at 100 TB this drops most fact rows at the
    scan instead of carrying them to the join. Size thresholds are lowered
    here because sf0.001 is below the production defaults; the assertion is
    that the rewrite fires (might_contain on the fact side)."""
    lowered = {
        # creation side must be UNDER this, application side OVER that —
        # widen both so the tiny fixture qualifies
        "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold": "100MB",
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "0",
        # force a shuffle join so the runtime filter is not subsumed by DPP
        "spark.sql.autoBroadcastJoinThreshold": "-1",
    }
    saved = {k: spark.conf.get(k, None) for k in lowered}
    try:
        for k, v in lowered.items():
            spark.conf.set(k, v)
        li = load_table(spark, sf_dir, "lineitem")
        o = load_table(spark, sf_dir, "orders").where(
            F.col("o_orderpriority") == "1-URGENT"
        )
        j = li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        plan = j._jdf.queryExecution().optimizedPlan().toString()
        assert "might_contain" in plan or "bloom_filter_agg" in plan
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def _unpartitioned_ordered_windows(df) -> int:
    """Count WindowExec nodes with an ORDER spec but NO partition spec —
    the single-partition running-window shape that cannot scale (every row
    flows through one task). Parses the physical plan's ``Window [exprs],
    [partition]?, [order]?`` bracket groups: a window is flagged when it
    has no third group AND its second group is an ORDER spec (ASC/DESC)."""
    import re

    bad = 0
    for line in df._jdf.queryExecution().executedPlan().toString().splitlines():
        m = re.search(r"\bWindow (\[.*)$", line)
        if not m:
            continue
        groups, depth, cur = [], 0, ""
        for ch in m.group(1):
            if ch == "[":
                depth += 1
            if depth > 0:
                cur += ch
            if ch == "]":
                depth -= 1
                if depth == 0:
                    groups.append(cur)
                    cur = ""
        if len(groups) >= 3:
            continue
        if len(groups) == 2 and not re.search(r" (ASC|DESC)[ ,\]]", groups[1]):
            continue  # partition-only window (min-over-partition etc.)
        bad += 1
    return bad


def test_detector_catches_global_ordered_window(spark):
    from pyspark.sql import Window

    glob = spark.range(100).withColumn(
        "r", F.row_number().over(Window.orderBy("id"))
    )
    assert _unpartitioned_ordered_windows(glob) == 1
    part = spark.range(100).withColumn(
        "r",
        F.row_number().over(Window.partitionBy(F.col("id") % 5).orderBy("id")),
    )
    assert _unpartitioned_ordered_windows(part) == 0


def test_no_registry_query_plans_a_global_ordered_window(spark, sf_dir):
    """No checked query may plan a single-partition ordered WindowExec
    (the q99 Misra-Gries trim regression class): rankings go through
    per-key windows or orderBy().limit() = TakeOrderedAndProject."""
    from soict20221_bigdata_financialplatform_spark.queries import QUERIES

    offenders = {}
    for name, fn in QUERIES.items():
        n = _unpartitioned_ordered_windows(fn(spark, sf_dir))
        if n:
            offenders[name] = n
    assert not offenders, f"global ordered windows in: {offenders}"


def test_no_registry_query_plans_conditional_nested_loop(spark, sf_dir):
    """A BroadcastNestedLoopJoin WITH a join condition is O(|L|·|R|) pair
    evaluation (working-notes invariant 13) — banned registry-wide. The
    single opt-in is q36's exact all-pairs baseline, which size-asserts at
    _Q36_ALL_PAIRS_CAP before running. One-row broadcast Cross nodes (the
    scalar crossJoin idiom) are not counted by the detector."""
    from soict20221_bigdata_financialplatform_spark.queries import QUERIES

    allowed = {"q36_embedding_near_dup"}
    offenders = {}
    for name, fn in QUERIES.items():
        if name in allowed:
            continue
        n = checks.conditional_bnlj_count(fn(spark, sf_dir))
        if n:
            offenders[name] = n
    assert not offenders, f"conditional BNLJ plans in: {offenders}"


def test_no_registry_query_misuses_constant_partition_window(spark, sf_dir):
    """The pmod(col,1) deliberate-single-partition idiom (invariant 16a)
    is licensed ONLY over one-row-per-group aggregate frames (prefix-sum
    offset chains / bounded ranks). A registry query using it over a raw
    row-cardinality frame is the banned global window in disguise — the
    r6-q208 class, now swept registry-wide via the r7 linter rule."""
    from soict20221_bigdata_financialplatform_spark.plans.linter import (
        constant_partition_window_over_raw_frame_count,
    )
    from soict20221_bigdata_financialplatform_spark.queries import QUERIES

    offenders = {}
    for name, fn in QUERIES.items():
        n = constant_partition_window_over_raw_frame_count(fn(spark, sf_dir))
        if n:
            offenders[name] = n
    assert not offenders, f"constant-partition windows over raw frames: {offenders}"


def test_no_registry_query_ranks_raw_frames_by_enum_key(spark, sf_dir):
    """No checked query may plan an ordered window whose ONLY partition
    keys are catalog-cardinality enum columns (priority/segment/status/…)
    over a raw, un-aggregated frame: one task per enum value sorts its
    whole slice — bounded parallelism at 100 TB, the r7-q246 class. The
    constant-partition linter can't see it (the key is data, not a
    folded constant); this is its name-heuristic sibling. Windows over
    aggregate frames (the bucketed prefix-sum shape q246 was rebuilt on)
    are exempt."""
    from soict20221_bigdata_financialplatform_spark.plans.linter import (
        low_cardinality_partition_window_count,
    )
    from soict20221_bigdata_financialplatform_spark.queries import QUERIES

    offenders = {}
    for name, fn in QUERIES.items():
        n = low_cardinality_partition_window_count(fn(spark, sf_dir))
        if n:
            offenders[name] = n
    assert not offenders, f"enum-partitioned rank over raw frames: {offenders}"


def test_q36_all_pairs_baseline_is_size_guarded(spark, sf_dir, tmp_path):
    """The registry's one O(n²) opt-in must refuse oversized corpora."""
    import soict20221_bigdata_financialplatform_spark.queries as q

    orig = q._Q36_ALL_PAIRS_CAP
    q._Q36_ALL_PAIRS_CAP = 1
    try:
        with pytest.raises(ValueError, match="O\\(n\\^2\\)"):
            q.QUERIES["q36_embedding_near_dup"](spark, sf_dir)
    finally:
        q._Q36_ALL_PAIRS_CAP = orig


def test_sequence_packing_block_local_windows(spark, sf_dir):
    """q104 (r8 rebuild contract): the per-source running total rides the
    DISTRIBUTED prefix sum — a block-local cumsum window partitioned by
    (source, __blk) over the raw frame, plus an offset-chain window over
    the ONE-ROW-PER-BLOCK aggregate. No global ordered window, and no
    ordered window partitioned only by the enum-cardinality ``source``
    column over raw rows: parallelism is corpus-proportional, not
    |sources|-bounded."""
    import re

    from soict20221_bigdata_financialplatform_spark.plans.linter import (
        low_cardinality_partition_window_count,
    )

    q = QUERIES["q104_sequence_packing"](spark, sf_dir)
    plan = checks.executed_plan(q)
    # exactly two Window nodes: local cumsum + block offset chain
    assert plan.count("Window [") == 2
    # the cumsum window partitions by BOTH source and the block key
    assert re.search(
        r"Window \[[^\n]*\], \[source#\d+, __blk#\d+L?\]", plan
    ), plan
    assert _unpartitioned_ordered_windows(q) == 0
    # the source-only window rides the aggregate frame, so the enum-key
    # linter rule must count zero raw-frame offenders
    assert low_cardinality_partition_window_count(q) == 0


def test_vocab_coverage_topk_is_take_ordered(spark, sf_dir):
    """q105: every top-K is TakeOrderedAndProject (distributed partial
    top-K) — no Window node anywhere in the plan."""
    q = QUERIES["q105_vocab_coverage"](spark, sf_dir)
    plan = checks.executed_plan(q)
    assert "TakeOrderedAndProject" in plan
    assert "Window" not in plan


def test_funnel_fact_never_exchanges(spark, sf_dir):
    """q106: only the per-stage AGGREGATES exchange (filtered, map-side
    combined slices keyed on user_id); the stage stats come back as
    broadcasts at this SF."""
    q = QUERIES["q106_funnel_conversion"](spark, sf_dir)
    plan = checks.executed_plan(q)
    assert plan.count("Exchange hashpartitioning(user_id") == 2
    assert plan.count("BroadcastExchange") == 2


def test_robust_outliers_stats_broadcast(spark, sf_dir):
    """q107: med/MAD are tiny per-group aggregates broadcast back over the
    fact — every join is a BroadcastHashJoin (the fact never shuffles for a
    join; its only exchanges are the grouped percentile aggregates)."""
    q = QUERIES["q107_robust_outliers"](spark, sf_dir)
    plan = checks.executed_plan(q)
    assert plan.count("BroadcastHashJoin") >= 2
    assert "SortMergeJoin" not in plan


def test_aqe_splits_skewed_join_at_runtime(spark):
    """The session's AQE skew-join config actually fires: a hot key whose
    shuffle partition dwarfs the median is split at runtime (``skew=true``
    in the final adaptive plan) with correct join results — the first line
    of defense before `operators/skew.py`'s deterministic salting."""
    lowered = {
        "spark.sql.autoBroadcastJoinThreshold": "-1",  # force a shuffle join
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "16KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "8KB",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
    }
    saved = {k: spark.conf.get(k, None) for k in lowered}
    try:
        for k, v in lowered.items():
            spark.conf.set(k, v)
        hot = spark.range(200_000).select(
            F.lit(0).alias("k"), F.col("id").alias("v")
        )
        cold = spark.range(500).select(
            (F.col("id") % 50 + 1).alias("k"), F.col("id").alias("v")
        )
        right = spark.range(51).select(
            F.col("id").alias("k"), F.lit("x").alias("tag")
        )
        j = hot.union(cold).join(right, "k")
        assert len(j.collect()) == 200_500  # every row matched exactly once
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "skew=true" in plan
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_drawdown_sharpe_single_exchange_single_window(spark, sf_dir):
    """q108: running max + lag share one frame spec, and the grouped agg
    rides the same partitioning — ONE exchange, ONE Window node."""
    q = QUERIES["q108_drawdown_sharpe"](spark, sf_dir)
    plan = checks.executed_plan(q)
    assert plan.count("Exchange hashpartitioning(user_id") == 1
    assert plan.count("Window") == 1


def test_decontamination_eval_side_broadcast(spark, sf_dir):
    """q113's eval gram set must reach the membership check as a
    BroadcastHashJoin: the training corpus never shuffles its grams — the
    whole point of the decontamination design at 100 TB."""
    q = QUERIES["q113_decontamination"](spark, sf_dir)
    plan = checks.executed_plan(q)
    assert "BroadcastHashJoin" in plan


def test_chunking_is_shuffle_free_after_staging(spark, sf_dir):
    """q114 is a pure per-row explode: the only exchange allowed is the
    deliberate staging repartition of the single-file scan — no
    hash/range exchange from the operator itself."""
    q = QUERIES["q114_doc_chunking"](spark, sf_dir)
    plan = checks.executed_plan(q)
    assert plan.count("Exchange hashpartitioning") == 0
    assert "Generate" in plan  # the explode is really there


def test_vshape_single_window_single_exchange(spark, sf_dir):
    """q123: all four lag/lead offsets share one frame -> ONE Window node
    behind ONE user_id hash exchange, and the grouped agg reuses that
    partitioning (no second exchange)."""
    q = QUERIES["q123_vshape_patterns"](spark, sf_dir)
    plan = checks.executed_plan(q)
    assert plan.count("Window") == 1
    assert plan.count("Exchange hashpartitioning(user_id") == 1


def test_scale_lint_flags_and_passes(spark, sf_dir):
    """The user-facing linter: clean registry query -> no findings; the
    classic scale-killers -> error findings; assert_scalable raises."""
    from pyspark.sql import Window

    from soict20221_bigdata_financialplatform_spark.plans.linter import (
        assert_scalable,
        scale_lint,
    )

    clean = QUERIES["q01_pricing_summary"](spark, sf_dir)
    assert [f for f in scale_lint(clean) if f["level"] == "error"] == []
    assert_scalable(clean)  # must not raise

    glob = spark.range(100).withColumn(
        "r", F.row_number().over(Window.orderBy("id"))
    )
    rules = {f["rule"] for f in scale_lint(glob)}
    assert "global-ordered-window" in rules
    with pytest.raises(ValueError, match="global-ordered-window"):
        assert_scalable(glob)

    a = spark.range(50).withColumnRenamed("id", "x")
    b = spark.range(50).withColumnRenamed("id", "y")
    theta = a.join(b, (F.col("x") == F.col("y")) | (F.col("x") == F.col("y") + 1))
    assert {f["rule"] for f in scale_lint(theta)} >= {"quadratic-nested-loop"}

    from pyspark.sql.functions import udf

    slow = spark.range(100).select(udf(lambda v: v + 1, "long")("id"))
    assert any(f["rule"] == "row-python-udf" for f in scale_lint(slow))

    # Arrow crossings are informational, not errors (q23's EMA)
    ema = QUERIES["q23_ema"](spark, sf_dir)
    lint = scale_lint(ema)
    assert [f for f in lint if f["level"] == "error"] == []
    assert any(f["rule"] == "arrow-python-crossing" for f in lint)

    # pmod(col,1) constant-partition window over a RAW frame = the global
    # ordered window in disguise (invariant 16a misuse) -> error; the
    # same idiom over a one-row-per-group offset frame (q195/q208 chain)
    # is the licensed shape -> clean.
    raw = spark.range(100).withColumn(
        "r",
        F.row_number().over(
            Window.partitionBy(F.pmod(F.col("id"), F.lit(1))).orderBy("id")
        ),
    )
    assert any(
        f["rule"] == "constant-partition-window" and f["level"] == "error"
        for f in scale_lint(raw)
    )
    with pytest.raises(ValueError, match="constant-partition-window"):
        assert_scalable(raw)
    agged = (
        spark.range(100)
        .groupBy(F.pmod("id", F.lit(7)).alias("bucket"))
        .agg(F.count(F.lit(1)).alias("t"))
        .withColumn(
            "o",
            F.sum("t").over(
                Window.partitionBy(F.pmod(F.col("bucket"), F.lit(1)))
                .orderBy("bucket")
                .rowsBetween(Window.unboundedPreceding, -1)
            ),
        )
    )
    assert [f for f in scale_lint(agged) if f["level"] == "error"] == []

    # the registry's own constant-partition users stay licensed
    for qname in ("q195_ks_test", "q208_hits_scores", "q219_kaplan_meier"):
        q = QUERIES[qname](spark, sf_dir)
        assert [f for f in scale_lint(q) if f["level"] == "error"] == [], qname


def test_driver_window_schemas_are_hasher_safe(spark, sf_dir):
    """The driver's value hasher canonicalizes results via pandas
    sort_values over every output column; nested cells (list/dict) raise
    "unhashable type" and DECIMAL values canonicalize differently from
    their DOUBLE twins. Three rounds burned on this class (r1 q50 DECIMAL,
    r2 q38 HUGEINT, r4 q109 array<int>) — make it structurally impossible
    for any query inside the driver's 50-slot CORRECTNESS window to emit a
    nested or decimal OUTPUT column. (Intermediate decimals/arrays are
    fine; this checks the final schema only.)"""
    from soict20221_bigdata_financialplatform_spark.queries import _FINAL_ORDER, QUERIES

    offenders = {}
    for name in _FINAL_ORDER[:50]:
        schema = QUERIES[name](spark, sf_dir).schema
        bad = [
            f"{f.name}: {f.dataType.simpleString()}"
            for f in schema.fields
            if f.dataType.simpleString().startswith(
                ("array<", "map<", "struct<", "decimal")
            )
        ]
        if bad:
            offenders[name] = bad
    assert not offenders, (
        f"driver-hasher-unsafe output columns in window queries: {offenders}"
    )

"""Storage layout: bucketed joins must plan ZERO exchanges; minhash bucket
cap drops only oversized boilerplate buckets."""

from __future__ import annotations

from pyspark.sql import Row

from soict20221_bigdata_financialplatform_spark.operators import dedup as dd
from soict20221_bigdata_financialplatform_spark.sources import layout
from soict20221_bigdata_financialplatform_spark.sources.readers import load_table


def test_bucketed_join_has_no_exchange(spark, sf_dir, tmp_path):
    # bucket metadata needs the catalog -> default warehouse dir
    # (spark.sql.warehouse.dir is static; tables dropped in finally)
    e = load_table(spark, sf_dir, "events").select("user_id", "event_id", "value")
    u = e.groupBy("user_id").count()
    layout.write_bucketed(e, "ev_bucketed", "user_id", num_buckets=4)
    layout.write_bucketed(u, "us_bucketed", "user_id", num_buckets=4)
    try:
        a = layout.read_table(spark, "ev_bucketed")
        b = layout.read_table(spark, "us_bucketed")
        # force a non-broadcast join so the shuffle question is real
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        j = a.join(b, "user_id")
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan  # bucketing co-located both sides
        assert j.count() == e.count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        spark.sql("DROP TABLE IF EXISTS ev_bucketed")
        spark.sql("DROP TABLE IF EXISTS us_bucketed")


def test_minhash_bucket_cap_drops_only_boilerplate(spark):
    boiler = "identical boilerplate text repeated across the corpus again and again"
    rows = [Row(doc_id=i, text=boiler) for i in range(30)]
    rows += [
        Row(doc_id=100, text="a unique document about query engines and shuffles in spark"),
        Row(doc_id=101, text="a unique document about query engines and shuffles in flink"),
    ]
    docs = spark.createDataFrame(rows)
    # cap smaller than the boilerplate cluster: its buckets are dropped,
    # the near-dup pair of unique docs must still be found
    pairs = dd.minhash_near_dup_pairs(
        docs, num_hashes=64, bands=16, jaccard_threshold=0.5, max_bucket_size=10
    ).collect()
    found = {(r.id_a, r.id_b) for r in pairs}
    assert (100, 101) in found
    assert not any(a < 100 and b < 100 for a, b in found)  # boilerplate capped
    # without the cap the boilerplate cluster floods back in
    flood = dd.minhash_near_dup_pairs(
        docs, num_hashes=64, bands=16, jaccard_threshold=0.5, max_bucket_size=None
    ).count()
    assert flood >= 30 * 29 / 2

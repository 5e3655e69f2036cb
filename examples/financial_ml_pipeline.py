"""End-to-end financial-ML training-set workflow (Lopez de Prado 2018's
pipeline, Spark-first) — the supervised-learning counterpart of
``financial_pipeline.py``'s serving workflow:

 1. triple-barrier labels per user        (q272: the target variable)
 2. purged k-fold CV plan with embargo    (q273: leakage-safe evaluation)
 3. label uniqueness sample weights       (q274: de-bias overlapping labels)
 4. momentum decile table                 (q284: the candidate signal's case)
 5. pairs-trade candidates                (q277: hedge beta + residual AR(1))
 6. distribution-shape gate               (q297 Jarque-Bera + q311 Newey-West:
                                           rescale/exclude non-IID series)

Every stage frame passes the ``assert_scalable`` launch gate BEFORE its
first action (the r7 policy shared by all examples): a plan that would
melt at 100 TB — conditional nested-loop join, cartesian product, global
ordered window — raises here instead of launching a job.

Run: python examples/financial_ml_pipeline.py   (read-only; prints only)
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from soict20221_bigdata_financialplatform_spark import get_spark
from soict20221_bigdata_financialplatform_spark.plans.linter import (
    assert_scalable,
)
from soict20221_bigdata_financialplatform_spark.queries import QUERIES

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")


def launch(df):
    """Pre-launch scale gate: plan-shape only, runs no tasks."""
    assert_scalable(df)
    return df


def main() -> None:
    spark = get_spark("financial-ml-pipeline-example")
    spark.sparkContext.setLogLevel("ERROR")

    # 1. labels: first-touch of +/-5% cumulative-return barriers in 5 days
    labels = launch(QUERIES["q272_triple_barrier"](spark, SF_DIR))
    tot = labels.agg(
        F.sum("n_up").alias("up"),
        F.sum("n_down").alias("down"),
        F.sum("n_timeout").alias("t0"),
    ).first()
    print(f"[1] triple-barrier labels: +1={tot.up} -1={tot.down} 0={tot.t0}")

    # 2. evaluation plan: 5 contiguous day folds, 3-day embargo purge
    folds = launch(QUERIES["q273_purged_kfold"](spark, SF_DIR))
    for r in folds.orderBy("fold").collect():
        print(
            f"[2] fold {r.fold}: test {r.test_start}..{r.test_end} "
            f"({r.n_test_days}d)  train {r.n_train_days}d  "
            f"purged {r.n_purged_days}d"
        )

    # 3. sample weights: average uniqueness of overlapping label windows
    uniq = launch(QUERIES["q274_label_uniqueness"](spark, SF_DIR))
    u = uniq.agg(
        F.count(F.lit(1)).alias("users"),
        F.round(F.avg("avg_uniqueness"), 4).alias("mean_u"),
        F.max("max_concurrency").alias("cmax"),
    ).first()
    print(
        f"[3] uniqueness weights: {u.users} users, mean weight {u.mean_u}, "
        f"max window concurrency {u.cmax}"
    )

    # 4. the candidate feature's case: forward return by momentum decile
    deciles = launch(QUERIES["q284_momentum_deciles"](spark, SF_DIR))
    row = {r.decile: r.mean_fwd for r in deciles.collect()}
    print(
        f"[4] momentum deciles: fwd(bottom)={row.get(0, 0):+.5f} "
        f"fwd(top)={row.get(9, 0):+.5f}"
    )

    # 5. pairs-trade shortlist: strongest mean reversion vs the market
    hedge = launch(QUERIES["q277_cointegration_hedge"](spark, SF_DIR))
    picks = (
        hedge.where(F.col("resid_ar1").isNotNull())
        .orderBy("resid_ar1", "user_id")
        .limit(3)
        .collect()
    )
    for r in picks:
        print(
            f"[5] hedge candidate user {r.user_id}: beta={r.hedge_beta:+.3f} "
            f"resid AR(1)={r.resid_ar1:+.3f}"
        )

    # 6. distribution-shape gate: series whose returns are too far from
    # Gaussian (Jarque-Bera) or too serially correlated (Newey-West
    # inflation) get their Sharpe-style statistics rescaled or excluded
    # before any of the above feeds a trainer.
    moments = launch(QUERIES["q297_return_moments"](spark, SF_DIR))
    nw = launch(QUERIES["q311_newey_west"](spark, SF_DIR))
    gate = (
        moments.select("user_id", "jb_stat")
        .join(nw.select("user_id", "nw_ratio"), "user_id")
        .where(F.col("jb_stat").isNotNull() & F.col("nw_ratio").isNotNull())
    )
    flagged = gate.where(
        (F.col("jb_stat") > 9.21) | (F.col("nw_ratio") > 1.5)
    ).count()
    total = gate.count()
    print(
        f"[6] shape gate: {flagged}/{total} series flagged "
        "(JB>9.21 at 1% or NW inflation >1.5)"
    )

    print("financial-ml pipeline complete")


if __name__ == "__main__":
    main()

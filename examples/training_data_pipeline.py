"""Round-4 training-data preparation pipeline — the pre-training hygiene
and packaging stages downstream of corpus cleaning (see
corpus_pipeline.py for the cleaning stages), composed the way a dataset
build would run them at 100 TB:

 1. benchmark DECONTAMINATION: drop training docs sharing any 8-gram
    with the (broadcast) eval set
 2. LEAKAGE-FREE train/test split: near-dup clusters are the assignment
    unit, so near-dups never straddle the split
 3. PPS importance sampling of the training side (inclusion prob ∝
    doc length, Horvitz-Thompson weight emitted)
 4. content-defined chunking of the sampled docs (rolling-hash
    boundaries -> dedup-friendly chunks)
 5. fuzzy canonicalization of the source-label dictionary (blocked
    levenshtein over distinct values)
 6. PageRank over the shared-5-gram graph: centrality-based canonical
    doc per duplication neighborhood
 ... plus the selection/quality/semantic stages added later in round 4:
    DSIR importance selection, bigram-LM perplexity filtering, SemDeDup,
    and RAKE keyword enrichment

Run: python examples/training_data_pipeline.py   (read-only; one summary
line per stage)
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from soict20221_bigdata_financialplatform_spark import get_spark
from soict20221_bigdata_financialplatform_spark.operators import corpus, fuzzy
from soict20221_bigdata_financialplatform_spark.plans.linter import (
    assert_scalable,
)
from soict20221_bigdata_financialplatform_spark.queries import QUERIES
from soict20221_bigdata_financialplatform_spark.sources import load_table

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")


def launch(df):
    """Pre-launch scale gate (r7 VERDICT task 5): every stage frame goes
    through ``assert_scalable`` BEFORE its first action, so a plan that
    would melt at 100 TB — conditional nested-loop join, cartesian
    product, global or constant-partition ordered window — raises
    ``ValueError`` here instead of launching a job. Plan-shape only: the
    gate itself runs no tasks."""
    assert_scalable(df)
    return df


def main() -> None:
    spark = get_spark("training-data-pipeline-example")
    spark.sparkContext.setLogLevel("ERROR")
    docs = load_table(spark, SF_DIR, "documents")

    # 1. decontamination against a held-out benchmark slice
    evals = docs.where(F.col("doc_id") % 11 == 0)
    train_pool = docs.where(F.col("doc_id") % 11 != 0)
    contaminated = launch(corpus.ngram_contamination(train_pool, evals, n=8))
    clean = train_pool.join(contaminated.select("doc_id"), "doc_id", "anti")
    print(
        f"[1] decontaminated: {train_pool.count()} -> {clean.count()} docs "
        f"({contaminated.count()} flagged)"
    )

    # 2. leakage-free split (cluster-aware; registry form over full corpus)
    split = launch(QUERIES["q119_leakage_free_split"](spark, SF_DIR))
    sides = {r["split"]: r["n"] for r in split.groupBy("split").agg(
        F.count(F.lit(1)).alias("n")).collect()}
    print(f"[2] cluster-aware split: {sides}")

    # 3. PPS sample of the clean training docs (expected ~50)
    sampled = launch(corpus.pps_sample(clean, weight_col="n_chars", k=50))
    print(f"[3] PPS sample: {sampled.count()} docs (expected ~50), "
          f"HT weights = 1/__p available")

    # 4. content-defined chunking of the sample
    chunks = launch(corpus.cdc_chunk_documents(sampled, modulus=8))
    stats = chunks.agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.avg("n_tokens"), 2).alias("avg_tokens"),
    ).collect()[0]
    print(f"[4] CDC chunks: {stats['n']} chunks, avg {stats['avg_tokens']} "
          f"tokens (target ~8)")

    # 5. fuzzy canonicalization of the part-name dictionary
    names = load_table(spark, SF_DIR, "part").select("p_name")
    matches = launch(fuzzy.blocked_levenshtein_pairs(names, "p_name", max_dist=2))
    print(f"[5] fuzzy dictionary: {matches.count()} near-spelling pairs")

    # 6. duplication-graph centrality (registry form)
    ranks = launch(QUERIES["q117_pagerank_dup_graph"](spark, SF_DIR))
    top = ranks.orderBy(F.col("pagerank").desc(), "doc_id").limit(3).collect()
    print(f"[6] PageRank canonical docs: "
          f"{[(r.doc_id, r.pagerank) for r in top]}")

    # 7. temperature rebalancing (alpha=0.5 multilingual upsampling)
    rebal = launch(corpus.temperature_sample(docs, strata_col="lang", k=100))
    by_lang = {r["lang"]: r["n"] for r in rebal.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n")).collect()}
    print(f"[7] temperature-rebalanced sample by lang: {by_lang}")

    # 8. BM25 lexical retrieval (hybrid-search leg beside the ANN family)
    hits = launch(QUERIES["q122_bm25"](spark, SF_DIR)).limit(3).collect()
    print(f"[8] BM25 top docs for (spark, join, hash): "
          f"{[(r.doc_id, r.bm25) for r in hits]}")

    # 9. DSIR importance selection: keep the docs that look most like the
    # target slice (here: long docs stand in for "the domain you want")
    scores = launch(corpus.dsir_scores(
        docs, is_target=(F.size(F.split(F.trim("text"), r"\s+")) >= 50)
    ))
    kept = scores.orderBy(F.col("dsir_score").desc(), "doc_id").limit(5)
    print(f"[9] DSIR top-5 target-like docs: "
          f"{[(r.doc_id, round(r.dsir_score, 3)) for r in kept.collect()]}")

    # 10. perplexity filter: corpus-trained bigram LM, drop the worst tail
    ppl = launch(corpus.lm_perplexity_scores(docs))
    cut = ppl.approxQuantile("ppl_proxy", [0.9], 0.01)[0]
    n_drop = ppl.where(F.col("ppl_proxy") > cut).count()
    print(f"[10] perplexity filter: drop {n_drop} docs above p90 "
          f"ppl_proxy={cut:.3f}")

    # 11. SemDeDup on the embedding table (meaning-level dedup after the
    # lexical passes) — registry form trains the deterministic quantizer
    keep = launch(QUERIES["q127_semdedup"](spark, SF_DIR))
    n_sem = keep.where(~F.col("keep")).count()
    print(f"[11] SemDeDup: {n_sem} semantic duplicates pruned")

    # 12. per-doc RAKE keywords for the surviving sample (metadata
    # enrichment before packing)
    kw = launch(corpus.rake_keywords(sampled, top_k=1))
    print(f"[12] RAKE keywords extracted for {kw.count()} sampled docs")

    # 13. span-level memorization audit (round-7): beyond the gram-set
    # gate of stage 1, HOW MUCH of each eval doc is verbatim-memorizable
    # from the training pool (Lee 2022 contamination report)
    spans = launch(corpus.span_contamination_report(
        evals, train_pool, gram=5, min_span=8
    ))
    worst = spans.orderBy(
        F.col("longest_train_span").desc(), "doc_id"
    ).limit(3).collect()
    print(f"[13] memorization spans: {spans.count()} eval docs carry a "
          f">=8-token verbatim train span; worst "
          f"{[(r.doc_id, r.longest_train_span) for r in worst]}")

    # 14. incremental distinct-user telemetry: per-batch HLL register
    # states MAX-merged at read (union-of-sketches == sketch-of-union)
    from soict20221_bigdata_financialplatform_spark.operators import sketch as sk

    ev = load_table(spark, SF_DIR, "events")
    day = F.date_trunc("day", F.col("ts").cast("timestamp")).cast("date")
    merged = launch(sk.hll_union(
        sk.hll_md5_registers_by(
            ev.select(day.alias("day"), "user_id"), "user_id", "day"
        )
    ))
    est = sk.hll_md5_estimate(merged).collect()[0]
    exact = ev.select("user_id").distinct().count()
    print(f"[14] HLL union across days: est={est.hll_est:.1f} "
          f"exact={exact} (state: 16 ints/day)")

    # 15. per-domain bits-per-byte under the stage-10 LM — the quality
    # axis mixture design reads (registry form, micro-unit nats)
    bpb = launch(QUERIES["q226_domain_bpb"](spark, SF_DIR))
    lo = bpb.orderBy("bits_per_byte").limit(2).collect()
    print(f"[15] lowest-BPB domains: "
          f"{[(r.source, round(r.bits_per_byte, 4)) for r in lo]}")

    spark.stop()


if __name__ == "__main__":
    main()

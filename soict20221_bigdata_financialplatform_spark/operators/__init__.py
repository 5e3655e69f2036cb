from soict20221_bigdata_financialplatform_spark.operators.serving import (
    latest_n_per_key,
    range_query,
    summary_stats,
)
from soict20221_bigdata_financialplatform_spark.operators.asof import asof_join
from soict20221_bigdata_financialplatform_spark.operators.dedup import (
    exact_dedup,
    minhash_near_dup_pairs,
    ngram_jaccard_pairs,
    simhash_near_dup_pairs,
)
from soict20221_bigdata_financialplatform_spark.operators.similarity import (
    brute_force_topk,
    lsh_topk,
)

__all__ = [
    "latest_n_per_key",
    "range_query",
    "summary_stats",
    "asof_join",
    "exact_dedup",
    "minhash_near_dup_pairs",
    "ngram_jaccard_pairs",
    "simhash_near_dup_pairs",
    "brute_force_topk",
    "lsh_topk",
]

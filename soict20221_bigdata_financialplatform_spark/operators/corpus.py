"""Composite corpus-cleaning pipeline — the end-to-end shape of a
training-data preparation job: text features → quality filter → exact dedup →
near-dup removal.

Each stage is one of the engine's tested operators; this module owns the
composition and the survivor policy (min doc_id wins, matching the dedup
operators). Stage order matters at scale: cheap row-local filters first
(quality — a projection), then the digest group-by (exact dedup — one
shuffle of digests), then MinHash LSH only over the survivors.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from soict20221_bigdata_financialplatform_spark.functions.text import quality_score
from soict20221_bigdata_financialplatform_spark.operators.dedup import (
    exact_dedup,
    minhash_near_dup_pairs,
)


def quality_filter(
    docs: DataFrame, text_col: str = "text", min_quality: float = 0.5
) -> DataFrame:
    """Row-local quality gate — runs inside the scan's codegen stage."""
    return docs.where(quality_score(text_col) >= min_quality)


def drop_exact_dups(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Keep the minimum-id representative of every distinct text."""
    keep = exact_dedup(docs, text_col, id_col).select(
        F.col("keep_id").alias(id_col)
    )
    return docs.join(keep, on=id_col, how="left_semi")


def drop_near_dups(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    jaccard_threshold: float = 0.8,
    num_hashes: int = 64,
    bands: int = 16,
) -> DataFrame:
    """Remove the higher-id member of every near-duplicate pair (transitive
    chains collapse toward the smallest id over iterations; one pass is the
    standard practical policy)."""
    pairs = minhash_near_dup_pairs(
        docs, text_col, id_col,
        num_hashes=num_hashes, bands=bands,
        jaccard_threshold=jaccard_threshold,
    )
    losers = pairs.select(F.col("id_b").alias(id_col)).distinct()
    return docs.join(losers, on=id_col, how="left_anti")


def train_test_split(
    docs: DataFrame,
    id_col: str = "doc_id",
    test_fraction: float = 0.1,
    seed: int = 42,
) -> tuple[DataFrame, DataFrame]:
    """Deterministic, key-stable train/test split: bucket = hash(id, seed)
    mod 10^6; test = the lowest ``test_fraction`` of bucket space.

    Key-stable means a document keeps its side across runs AND across corpus
    versions (no ``rand()``, no count-dependent quantiles) — the property
    that prevents train/test leakage when the corpus is re-built. Returns
    (train, test); provably disjoint and covering."""
    bucket = F.pmod(F.xxhash64(F.col(id_col), F.lit(seed)), F.lit(1_000_000))
    cut = int(test_fraction * 1_000_000)
    test = docs.where(bucket < cut)
    train = docs.where(bucket >= cut)
    return train, test


MAX_AUTO_STRATA = 1000


def stratified_sample(
    docs: DataFrame,
    strata_col: str = "lang",
    fractions: dict | None = None,
    default_fraction: float = 0.1,
    seed: int = 42,
) -> DataFrame:
    """Per-stratum Bernoulli sampling: the corpus-balancing primitive (e.g.
    downsample dominant languages). Seeded → reproducible.

    With explicit ``fractions`` this is ``sampleBy`` (no driver work at any
    cardinality). With ``fractions=None`` every stratum gets
    ``default_fraction`` — implemented as a pure key-stable hash filter, NO
    driver-side distinct/collect at all, so a caller passing a
    high-cardinality stratum column (a doc id, a URL) cannot melt the driver.
    The hash keys on (stratum, row-identity) so sampling stays per-row
    Bernoulli, independent across strata, and stable across runs."""
    if fractions is not None:
        if len(fractions) > MAX_AUTO_STRATA:
            # sampleBy ships the whole dict into the plan; beyond this, use
            # the uniform-hash path or a join against a fractions table.
            raise ValueError(
                f"{len(fractions)} strata exceeds MAX_AUTO_STRATA="
                f"{MAX_AUTO_STRATA}; join a fractions table instead"
            )
        return docs.sampleBy(strata_col, fractions, seed=seed)
    # uniform fraction: key-stable Bernoulli via hash over all columns —
    # equivalent in distribution to sampleBy with a constant fraction, but
    # needs no distinct-value enumeration (distributed OR driver-side).
    bucket = F.pmod(
        F.xxhash64(*[F.col(c) for c in docs.columns], F.lit(seed)),
        F.lit(1_000_000),
    )
    return docs.where(bucket < int(default_fraction * 1_000_000))


def profile(docs: DataFrame, cols: list[str] | None = None) -> DataFrame:
    """Data-quality profile in ONE aggregation pass over ONE scan: per column
    — null count, exact distinct count, and for string columns min/max
    length. All per-column metrics are computed in a single wide ``agg`` and
    unpivoted with ``stack`` into long format
    (col_name, n_null, n_distinct, min_len, max_len).

    Plan shape (asserted in tests/test_plans.py): one scan → one aggregation.
    The k exact ``countDistinct`` on different columns make Catalyst insert an
    Expand (each input row fans out k times IN-FLIGHT, map-side, before the
    partial aggregate) — still a single pass over storage, which is the cost
    that matters at 100 TB; k separate ``agg``s were k full scans. For very
    wide tables swap ``approx_count_distinct`` to drop the Expand entirely.
    """
    cols = cols or docs.columns
    dtypes = dict(docs.dtypes)
    aggs = []
    for i, c in enumerate(cols):
        is_str = dtypes[c] == "string"
        aggs += [
            F.count(F.when(F.col(c).isNull(), 1)).alias(f"__null_{i}"),
            F.countDistinct(F.col(c)).alias(f"__dist_{i}"),
            (F.min(F.length(c)) if is_str else F.min(F.lit(None).cast("int"))).alias(f"__minl_{i}"),
            (F.max(F.length(c)) if is_str else F.max(F.lit(None).cast("int"))).alias(f"__maxl_{i}"),
        ]
    wide = docs.agg(*aggs)
    tuples = ", ".join(
        f"'{c}', __null_{i}, __dist_{i}, __minl_{i}, __maxl_{i}"
        for i, c in enumerate(cols)
    )
    return wide.selectExpr(
        f"stack({len(cols)}, {tuples}) AS (col_name, n_null, n_distinct, min_len, max_len)"
    )


def clean_corpus(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_quality: float = 0.5,
    jaccard_threshold: float = 0.8,
) -> DataFrame:
    """quality gate → exact dedup → near-dup removal."""
    out = quality_filter(docs, text_col, min_quality)
    out = drop_exact_dups(out, text_col, id_col)
    out = drop_near_dups(out, text_col, id_col, jaccard_threshold)
    return out


def pack_sequences(
    docs: DataFrame,
    tokens_col: str = "n_tokens",
    shard_cols: tuple = ("source",),
    order_col: str = "doc_id",
    block: int = 2048,
    sub_shard_size: int = 100_000,
) -> DataFrame:
    """Distributed prefix-sum sequence packing — the 100 TB form of q104's
    concatenate-and-chunk when ONE shard's document count outgrows a single
    task's window (the per-shard cumsum is inherently sequential; a hot
    shard would serialize it).

    Same decomposition as ``ema_segmented`` (a cumsum is the α=1 special
    case of the linear recursion): bucket each shard into sub-shards that
    are MONOTONE in the order column (``floor(order/sub_shard_size)``),
    cumsum locally per (shard, sub-shard) — a partitioned window, thousands
    of concurrent tasks — then chain the per-sub-shard totals (ONE ROW per
    sub-shard) with a second partitioned window over the tiny summary frame
    and broadcast-join the offsets back. No stage holds more than one
    sub-shard of one shard; nothing is single-partition.

    Emits ``seq_id``/``seq_offset`` identical to the direct single-window
    cumsum (equivalence-tested across sub-shard boundaries): position =
    sub-shard offset + local cumsum − own tokens; seq_id = position //
    block; seq_offset = position % block.
    """
    from pyspark.sql import Window

    sub = F.floor(F.col(order_col) / F.lit(sub_shard_size)).alias("__sub")
    d = docs.withColumn("__sub", sub)
    w_local = (
        Window.partitionBy(*shard_cols, "__sub")
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    local = d.withColumn("__cum_local", F.sum(tokens_col).over(w_local))
    # one row per (shard, sub-shard): its total token mass
    totals = local.groupBy(*shard_cols, "__sub").agg(
        F.sum(tokens_col).alias("__sub_total")
    )
    # exclusive running offset of each sub-shard within its shard — the
    # summary frame has one row per sub-shard, so this window is tiny AND
    # partitioned by shard
    w_chain = (
        Window.partitionBy(*shard_cols)
        .orderBy("__sub")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = totals.withColumn(
        "__offset", F.coalesce(F.sum("__sub_total").over(w_chain), F.lit(0))
    ).select(*shard_cols, "__sub", "__offset")
    start = (
        F.col("__offset") + F.col("__cum_local") - F.col(tokens_col)
    ).cast("long")
    return (
        local.join(F.broadcast(offsets), [*shard_cols, "__sub"])
        .withColumn("seq_id", F.floor(start / F.lit(block)).cast("long"))
        .withColumn("seq_offset", (start % F.lit(block)).cast("long"))
        .drop("__sub", "__cum_local", "__offset")
    )


def incremental_ingest_dedup(
    batch: DataFrame,
    digest_store: str,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Incremental exact-dedup ingest — the streaming/batch-append twin of
    :func:`drop_exact_dups` for a corpus built over many ingests: dedup the
    incoming batch against itself, anti-join its 128-bit digests against the
    persisted digest store (16 bytes/doc scanned, never historical text),
    append the survivors' digests to the store, and return the surviving
    rows for the caller's corpus append.

    Designed as a ``foreachBatch`` body: idempotent under batch replay
    (replayed digests anti-join away) and shuffle-light — the store scan
    reads one narrow binary column, and the anti-join keys are digests, so
    a 10¹⁰-doc history costs ~160 GB of digest scan per ingest, not a text
    rescan. First ingest bootstraps an empty store automatically.

    NULL-text rows are DROPPED, by design: their digest is NULL, which can
    never survive the digest equi-joins — and passing them through instead
    would break replay idempotence (an undigestable row would re-append on
    every replay because no store entry can represent it). Route NULL text
    to a dead-letter sink upstream if it must be kept. Pinned in
    tests/test_dirty_data.py.
    """
    spark = batch.sparkSession
    digests = batch.withColumn("__digest", F.unhex(F.md5(F.col(text_col))))
    # dedup within the batch: keep min-id per digest
    keep = digests.groupBy("__digest").agg(F.min(id_col).alias(id_col))
    fresh = digests.join(keep, [id_col, "__digest"], "left_semi")
    from pyspark.errors import AnalysisException

    try:
        seen = spark.read.parquet(digest_store).select("__digest")
        fresh = fresh.join(seen, "__digest", "left_anti")
    except AnalysisException as exc:
        # Only PATH_NOT_FOUND means "first ingest: bootstrap an empty
        # store". Any other failure (corrupt footer, permissions, partial
        # write) must fail loudly — silently skipping the historical
        # anti-join would append duplicate docs AND duplicate digests.
        if "PATH_NOT_FOUND" not in str(exc) and "Path does not exist" not in str(exc):
            raise
    # localCheckpoint, not persist: the store append below invalidates any
    # cached plan that READS the same path (refreshByPath), so a persisted
    # frame would lazily re-evaluate against its own appended digests and
    # anti-join itself to empty. Checkpointing truncates the lineage first.
    out = fresh.localCheckpoint(eager=True)
    out.select("__digest").write.mode("append").parquet(digest_store)
    return out.drop("__digest")


def fixed_k_sample(
    docs: DataFrame,
    strata_col: str = "lang",
    k: int = 1000,
    id_col: str = "doc_id",
    seed: int = 42,
) -> DataFrame:
    """Exactly ``k`` rows per stratum, chosen by ranking on a seeded hash
    of the id — the key-stable equivalent of uniform-without-replacement
    (the corpus-balancing primitive "100k docs per language" that
    fraction-based :func:`stratified_sample` can't pin). One partitioned
    window per stratum; strata with fewer than k rows keep everything.
    The registered oracle-checked form is q111."""
    from pyspark.sql import Window

    sk = F.md5(
        F.concat(F.lit(f"s{seed}|"), F.col(id_col).cast("string"))
    )
    w = Window.partitionBy(strata_col).orderBy(sk.alias("sk"), id_col)
    return (
        docs.withColumn("__rk", F.row_number().over(w))
        .where(F.col("__rk") <= k)
        .drop("__rk")
    )


def ngram_contamination(
    docs: DataFrame,
    eval_docs: DataFrame,
    n: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Benchmark decontamination: for every training doc sharing at least
    one word ``n``-gram with the eval/benchmark set, emit
    ``(doc_id, n_bad_grams, contamination_frac)`` — the standard
    pre-training hygiene pass (flag/drop training docs that leak test-set
    spans; 8-13 grams in published practice).

    Scale shape: both sides reduce to per-doc DISTINCT n-grams before any
    join (a doc repeating a leaked phrase counts it once); the eval
    side's distinct gram set is tiny relative to the corpus — mark it
    broadcast so the contamination check is a map-side hash join, with
    the corpus never shuffling. ``contamination_frac`` =
    n_bad_grams / total distinct grams in the doc — a single int/int
    division, emitted unrounded per the float policy (bit-equal
    cross-engine). Clean docs are NOT emitted; anti-join the result to
    keep them. At 100 TB hash grams to 64-bit keys for the join
    (xxhash64) — string grams here keep the q113 oracle comparable.

    Engine-added (no reference counterpart); q113 cross-checks against
    DuckDB at the registry level."""
    npart = docs.sparkSession.sparkContext.defaultParallelism
    from soict20221_bigdata_financialplatform_spark.functions import text as tx

    def grams_of(d: DataFrame) -> DataFrame:
        staged = (
            d.select(id_col, text_col)
            .repartition(max(2, npart))
            .withColumn("__w", tx.words(text_col))
            .withColumn("__g", tx.word_ngrams_from("__w", n))
        )
        return staged.select(
            id_col, F.explode(F.array_distinct("__g")).alias("gram")
        )

    train = grams_of(docs)
    eval_grams = F.broadcast(
        grams_of(eval_docs).select("gram").distinct()
    )
    totals = train.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("__n_grams")
    )
    hits = (
        train.join(eval_grams, "gram")
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).cast("long").alias("n_bad_grams"))
    )
    return hits.join(totals, id_col).select(
        id_col,
        "n_bad_grams",
        (
            F.col("n_bad_grams").cast("double") / F.col("__n_grams")
        ).alias("contamination_frac"),
    )


def chunk_documents(
    docs: DataFrame,
    size: int = 32,
    stride: int = 24,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Sliding-window token chunking — split each doc into ``size``-token
    chunks every ``stride`` tokens (overlap = size - stride), the
    context-window preparation step for training/RAG ingestion. Emits
    ``(doc_id, chunk_idx, n_tokens, chunk_text)``; the final chunk is
    whatever remains (may be shorter than ``size``).

    Pure per-row explode — no shuffle, no UDF: starts are a
    ``sequence(0, L-1, stride)``, each chunk a clamped ``slice`` of the
    staged words array. The words array is staged as its own projection
    (HOF lambdas re-evaluate captured non-trivial exprs per element) and
    the scan repartitioned before the CPU-heavy projection (single-file
    testdata = single row group). q114 is the oracle-checked form."""
    from soict20221_bigdata_financialplatform_spark.functions import text as tx

    npart = docs.sparkSession.sparkContext.defaultParallelism
    staged = (
        docs.select(id_col, text_col)
        .repartition(max(2, npart))
        .withColumn("__w", tx.words(text_col))
        .withColumn("__L", F.size("__w"))
        .where(F.col("__L") > 0)
        .withColumn(
            "__starts",
            F.sequence(F.lit(0), F.col("__L") - 1, F.lit(stride)),
        )
    )
    return staged.select(
        id_col,
        F.posexplode("__starts").alias("chunk_idx", "__start"),
        "__w",
        "__L",
    ).select(
        id_col,
        F.col("chunk_idx").cast("long").alias("chunk_idx"),
        F.least(F.lit(size), F.col("__L") - F.col("__start"))
        .cast("long")
        .alias("n_tokens"),
        F.concat_ws(
            " ", F.slice("__w", F.col("__start") + 1, size)
        ).alias("chunk_text"),
    )


def pps_sample(
    docs: DataFrame,
    weight_col: str = "n_chars",
    k: int = 100,
    id_col: str = "doc_id",
    seed: int = 42,
) -> DataFrame:
    """Probability-proportional-to-size Poisson sampling: include each row
    independently with probability ``min(1, k * w / W)`` (w = row weight,
    W = total weight), giving an EXPECTED sample size of ~k with
    inclusion probability proportional to weight — the
    importance-sampling primitive (upweight long/high-quality docs, or
    feed 1/p as the Horvitz-Thompson correction downstream). Adds the
    inclusion probability as ``__p``.

    Deterministic and key-stable: the uniform draw is a seeded md5 hash
    of the id mapped to [0,1) — same doc, same verdict, across runs and
    engines (no RNG, no transcendentals: every step is integer
    arithmetic and one exact int->double division, so a SQL oracle
    matches bit-for-bit — q118). W is an exact integer sum broadcast
    back as a one-row frame; the scan never collects or reshuffles.
    Weighted WITHOUT-replacement (exact-k) sampling is
    :func:`fixed_k_sample`'s ordering applied to ``u^(1/w)`` keys — not
    offered cross-engine because ``pow`` is not bit-portable."""
    w_frame = docs.agg(F.sum(weight_col).alias("__W"))
    scale = 1152921504606846976  # 16^15: the md5-prefix integer range
    u = (
        F.conv(
            F.substring(
                F.md5(
                    F.concat(
                        F.lit(f"pps{seed}|"), F.col(id_col).cast("string")
                    )
                ),
                1,
                15,
            ),
            16,
            10,
        ).cast("long")
        / F.lit(scale)
    )
    p = F.least(
        F.lit(1.0), F.lit(k) * F.col(weight_col) / F.col("__W")
    )
    return (
        docs.crossJoin(F.broadcast(w_frame))
        .withColumn("__p", p)
        .where(u < F.col("__p"))
        .drop("__W")
    )


def cdc_chunk_documents(
    docs: DataFrame,
    modulus: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Content-defined chunking (rolling-hash boundaries): a chunk
    boundary falls AFTER token i whenever the hash of the 3-gram ending
    at i is ≡ 0 (mod ``modulus``) — expected chunk length ≈ modulus
    tokens. Unlike fixed windows (:func:`chunk_documents`), boundaries
    depend only on LOCAL content, so a passage duplicated across docs
    (with different prefixes) still splits into IDENTICAL chunks — the
    property that makes chunk-level dedup/storage (LBFS/borg-style) work
    and that offset-based chunking destroys. Emits
    ``(doc_id, chunk_id, n_tokens, chunk_text)``.

    Shape: posexplode → one window (cumulative INTEGER marker sum,
    partitioned per doc — exact in any accumulation order, no float
    policy concerns) → grouped re-assembly ordered by position. Two
    shuffles on doc_id that AQE coalesces; at 100 TB both reuse one
    hash partitioning. The boundary hash is the md5-prefix integer
    (cross-engine, q120's oracle); swap for xxhash64 at scale."""
    npart = docs.sparkSession.sparkContext.defaultParallelism
    from pyspark.sql import Window
    from soict20221_bigdata_financialplatform_spark.functions import text as tx

    staged = (
        docs.select(id_col, text_col)
        .repartition(max(2, npart))
        .withColumn("__w", tx.words(text_col))
        .where(F.size("__w") > 0)
    )
    t = staged.select(
        id_col, "__w", F.posexplode("__w").alias("__pos", "word")
    ).withColumn("__i", F.col("__pos") + 1)
    gram = F.concat_ws(
        " ",
        F.element_at("__w", F.col("__i") - 2),
        F.element_at("__w", F.col("__i") - 1),
        F.element_at("__w", F.col("__i")),
    )
    marker = F.when(
        (F.col("__i") >= 3)
        & (
            F.conv(F.substring(F.md5(gram), 1, 15), 16, 10).cast("long")
            % modulus
            == 0
        ),
        F.lit(1),
    ).otherwise(F.lit(0))
    w = (
        Window.partitionBy(id_col)
        .orderBy("__i")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    c = t.withColumn("__marker", marker).withColumn(
        "chunk_id",
        F.coalesce(F.sum("__marker").over(w), F.lit(0)).cast("long"),
    )
    return (
        c.groupBy(id_col, "chunk_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_tokens"),
            F.concat_ws(
                " ",
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("__i", "word"))
                    ),
                    lambda s: s["word"],
                ),
            ).alias("chunk_text"),
        )
    )


def weighted_sample_es(
    docs: DataFrame,
    k: int = 16,
    weight_col: str = "n_chars",
    id_col: str = "doc_id",
    seed: str = "es42",
) -> DataFrame:
    """Weighted sampling WITHOUT replacement (Efraimidis–Spirakis 2006):
    every row gets the key ln(u)/w — u a seeded md5 uniform in (0,1], w
    the row's positive integer weight — and the k LARGEST keys are a
    weight-proportional WOR sample. The per-ROW-weight member of the
    sampling family (PPS :func:`pps_sample` is with-replacement
    expectation-proportional; :func:`temperature_sample` works at the
    stratum grain; this is the exact-k WOR draw a data mixer needs when
    weights differ inside a stratum).

    Deterministic and key-stable like the other samplers: u hashes
    (seed, id), so replays re-pick the same sample, and scaling every
    weight by a constant leaves the selection unchanged (keys scale
    monotonically). Rows with NULL or non-positive weight are dropped —
    they have no sampling probability. Scale: one narrow projection +
    ``TakeOrderedAndProject`` (per-partition partial top-k, no global
    sort, the corpus never shuffles). Oracle-checked as q332's sibling
    q333 (ln rounded at the transcendental, one IEEE division by the
    exact integer weight)."""
    wcol = F.col(weight_col).cast("long")
    u = (
        F.conv(
            F.substring(
                F.md5(
                    F.concat(
                        F.lit(seed + "|"), F.col(id_col).cast("string")
                    )
                ),
                1,
                15,
            ),
            16,
            10,
        ).cast("long")
        + F.lit(1)
    ) / F.lit(1.152921504606846976e18)
    key = F.round(F.log(u), 6) / wcol
    return (
        docs.where(wcol > 0)
        .withColumn("es_key", key)
        .orderBy(F.col("es_key").desc(), id_col)
        .limit(k)
    )


def temperature_sample(
    docs: DataFrame,
    strata_col: str = "lang",
    k: int = 150,
    alpha: float = 0.5,
    id_col: str = "doc_id",
    seed: int = 42,
) -> DataFrame:
    """Temperature-based stratum rebalancing (the multilingual
    upsampling rule from mBERT/XLM-R): sample so that stratum l's
    EXPECTED share is ∝ n_l^alpha instead of n_l — alpha < 1 upweights
    rare languages/domains without exhausting them. Per-doc inclusion is
    an independent seeded-hash Bernoulli with
    ``p_l = min(1, k * n_l^alpha / (n_l * sum_m n_m^alpha))``
    (expected total ≈ k); ``__p`` is emitted for Horvitz-Thompson
    reweighting.

    Shape: one tiny per-stratum count agg; the stratum weight table and
    the rounded normalizer broadcast back; the corpus scan is
    filter-only — no window, no per-stratum driver loop, any stratum
    cardinality. Determinism: same md5-prefix uniform as
    :func:`pps_sample`. ``alpha=0.5`` uses ``sqrt`` — an IEEE-754
    EXACT-rounded op, so the q121 oracle is bit-exact; other alphas use
    ``pow``, which is NOT bit-portable across engines (library-only,
    no oracle). The normalizer (an order-dependent double sum) is
    rounded to 6dp on both engines per the float policy."""
    cnt = docs.groupBy(strata_col).agg(F.count(F.lit(1)).alias("__n"))
    w = F.sqrt("__n") if alpha == 0.5 else F.pow("__n", F.lit(alpha))
    weights = cnt.withColumn("__wt", w)
    norm = weights.agg(F.round(F.sum("__wt"), 6).alias("__W"))
    p = F.least(
        F.lit(1.0),
        (F.lit(k) * F.col("__wt")) / (F.col("__n") * F.col("__W")),
    )
    scale = 1152921504606846976  # 16^15
    u = (
        F.conv(
            F.substring(
                F.md5(
                    F.concat(
                        F.lit(f"temp{seed}|"),
                        F.col(id_col).cast("string"),
                    )
                ),
                1,
                15,
            ),
            16,
            10,
        ).cast("long")
        / F.lit(scale)
    )
    return (
        docs.join(F.broadcast(weights), strata_col)
        .crossJoin(F.broadcast(norm))
        .withColumn("__p", p)
        .where(u < F.col("__p"))
        .drop("__n", "__wt", "__W")
    )


def ingest_clean_batch(
    batch: DataFrame,
    digest_store: str,
    eval_grams: DataFrame | None = None,
    n: int = 8,
    min_quality: float = 0.5,
    text_col: str = "text",
    id_col: str = "doc_id",
    stats: dict | None = None,
) -> DataFrame:
    """Full hygiene gate for ONE ingest batch — the ``foreachBatch`` body
    a streaming corpus build actually wants, composing the library in the
    production order: (1) quality filter, (2) benchmark DECONTAMINATION
    against a static broadcast eval-gram set, (3) incremental exact-dedup
    against the persisted digest store (replay-idempotent). Returns the
    surviving rows for the caller's corpus append.

    ``eval_grams`` is a one-column ``gram`` frame (build once per job:
    the distinct word n-grams of the benchmark suite — MBs, broadcast to
    every batch; the standard stream-static join shape). Pass
    ``stats={}`` to read back per-stage survivor counts — the ingest
    observability a pipeline alerts on. Stage order matters at scale:
    quality and contamination are filter-only map work and run BEFORE
    the dedup shuffle, so the digest store only ever sees docs worth
    keeping."""
    out = quality_filter(batch, min_quality=min_quality, text_col=text_col)
    if stats is not None:
        stats["after_quality"] = out.count()
    if eval_grams is not None:
        from soict20221_bigdata_financialplatform_spark.functions import text as tx

        grams = out.select(
            id_col,
            F.explode(
                F.array_distinct(tx.word_ngrams(F.col(text_col), n))
            ).alias("gram"),
        )
        bad = grams.join(
            F.broadcast(eval_grams.select("gram")), "gram"
        ).select(id_col).distinct()
        out = out.join(bad, id_col, "left_anti")
        if stats is not None:
            stats["after_decontamination"] = out.count()
    out = incremental_ingest_dedup(
        out, digest_store, text_col=text_col, id_col=id_col
    )
    if stats is not None:
        stats["after_dedup"] = out.count()
    return out


def eval_gram_set(
    eval_docs: DataFrame, n: int = 8, text_col: str = "text"
) -> DataFrame:
    """Distinct word ``n``-grams of the benchmark/eval suite — build once,
    reuse across every :func:`ingest_clean_batch` call (a static frame in
    a stream-static join; localCheckpoint it so each micro-batch reuses
    the materialized set instead of re-tokenizing the eval docs)."""
    from soict20221_bigdata_financialplatform_spark.functions import text as tx

    return (
        eval_docs.select(
            F.explode(
                F.array_distinct(tx.word_ngrams(F.col(text_col), n))
            ).alias("gram")
        )
        .distinct()
        .localCheckpoint(eager=True)
    )


def decontaminate(
    docs: DataFrame,
    eval_docs: DataFrame,
    n: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """The drop-side convenience of :func:`ngram_contamination`: return
    ``docs`` with every eval-leaking document REMOVED (anti-join on the
    flagged ids) — what a pipeline actually applies, while the scoring
    form feeds audits. Same broadcast-eval/never-shuffle-the-corpus
    shape."""
    flagged = ngram_contamination(
        docs, eval_docs, n=n, text_col=text_col, id_col=id_col
    ).select(id_col)
    return docs.join(flagged, id_col, "left_anti")


def span_contamination_report(
    eval_docs: DataFrame,
    train_docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    gram: int = 5,
    min_span: int = 8,
    max_gram_df: int | None = None,
) -> DataFrame:
    """Span-LEVEL memorization/contamination report (Lee et al. 2022;
    the decontamination companion of :func:`ngram_contamination`): for
    each eval document, the longest VERBATIM token span it shares with
    ANY training document, plus how many training documents carry such a
    span. Where :func:`ngram_contamination` answers "does any eval gram
    leak?" (a set test), this answers "HOW MUCH of the eval doc is
    memorizable verbatim?" — the metric a contamination audit reports
    per benchmark.

    Same relational suffix-array substitute as
    ``dedup.longest_common_run_pairs``: gram-explode BOTH sides with
    positions, EQUI-join on the gram (eval grams ⋈ train grams — never
    an all-pairs product), runs of consecutive eval positions per match
    diagonal via the islands trick; a k-run of matching g-grams is a
    k+g−1-token verbatim span, exact. ``max_gram_df`` drops boilerplate
    grams from the TRAIN index (their spans still surface through rarer
    grams unless the whole span is boilerplate).

    Scale: the join is inverted-index-shaped (posting lists per gram);
    island windows partition by (eval, train, diag) — many tiny groups;
    at 100 TB the train gram index is the precomputed store, eval side
    is benchmark-sized. Returns (id_col, longest_train_span,
    n_train_partners) for eval docs with a span ≥ min_span."""
    assert min_span >= gram
    npart = eval_docs.sparkSession.sparkContext.defaultParallelism

    def _grams(df: DataFrame, out_id: str, out_pos: str) -> DataFrame:
        toks = df.repartition(npart, id_col).select(
            F.col(id_col).alias(out_id),
            F.split(F.trim(F.col(text_col)), r"\s+").alias("t"),
        )
        return (
            toks.where(F.size("t") >= gram)
            .select(
                out_id,
                F.explode(
                    F.sequence(F.lit(1), F.size("t") - (gram - 1))
                ).alias(out_pos),
                "t",
            )
            .select(
                out_id,
                out_pos,
                F.array_join(F.slice("t", F.col(out_pos), gram), " ").alias(
                    "g"
                ),
            )
        )

    ge = _grams(eval_docs, "eval_id", "pe")
    gt = _grams(train_docs, "train_id", "pt")
    if max_gram_df is not None:
        hot = (
            gt.groupBy("g")
            .agg(F.count_distinct("train_id").alias("__df"))
            .where(F.col("__df") > max_gram_df)
            .select("g")
        )
        gt = gt.join(hot, "g", "left_anti")
    m = ge.join(gt, "g").select(
        "eval_id",
        "train_id",
        "pe",
        (F.col("pe") - F.col("pt")).alias("diag"),
    )
    w_isl = Window.partitionBy("eval_id", "train_id", "diag").orderBy("pe")
    runs = (
        m.withColumn("isl", F.col("pe") - F.row_number().over(w_isl))
        .groupBy("eval_id", "train_id", "diag", "isl")
        .agg((F.count(F.lit(1)) + (gram - 1)).alias("run_len"))
    )
    pair = (
        runs.groupBy("eval_id", "train_id")
        .agg(F.max("run_len").cast("long").alias("span"))
        .where(F.col("span") >= min_span)
    )
    return (
        pair.groupBy("eval_id")
        .agg(
            F.max("span").cast("long").alias("longest_train_span"),
            F.count(F.lit(1)).cast("long").alias("n_train_partners"),
        )
        .withColumnRenamed("eval_id", id_col)
    )


def dsir_scores(
    docs: DataFrame,
    is_target: F.Column,
    n_buckets: int = 256,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """DSIR-style hashed importance scores (Xie et al. 2023, "Data Selection
    for Language Models via Importance Resampling"): estimate hashed-unigram
    distributions for a TARGET slice (``is_target``, a boolean Column over
    ``docs``) and for the raw corpus, then score every document by the
    log-likelihood ratio of its words under the two distributions. High
    scores = "looks like the target domain" — the standard pretraining-data
    selection signal. Engine-added: the reference has no corpus tooling;
    this completes the selection family (quality q29/q65, temperature q121,
    PPS q118) with the distribution-matching member.

    Parity design (why the score is an integer sum): per-bucket weights are
    ``ln`` of add-one-smoothed frequencies — transcendental, NOT bit-portable
    across libm implementations — so each ln is rounded to 6dp at the
    transcendental itself (float policy), the difference is quantized to
    integer MICRO-UNITS (``floor(x*1e6 + 0.5)``), and the per-document
    accumulation is a BIGINT sum: exact, order-independent, immune to the
    float-summation-order trap entirely. The emitted double is one final
    division (single-op per-row arithmetic — bit-exact).

    Scale shape: one explode of words → (bucket, is_target) counts shuffle
    ``n_buckets`` rows (map-side combined); totals are one broadcast row;
    the weight table (≤ n_buckets rows) broadcast-joins back onto the
    exploded words; the per-doc sum map-side combines before the doc_id
    shuffle. The corpus is scanned twice (counts, scores) — both scans are
    the same projection, so at 100 TB persist the exploded frame or let the
    parquet cache serve it; nothing here is quadratic and no state exceeds
    n_buckets rows."""
    from soict20221_bigdata_financialplatform_spark.functions import text as tx

    b = float(n_buckets)
    ex = docs.select(
        F.col(id_col),
        is_target.alias("__t"),
        F.explode(tx.words(F.col(text_col))).alias("__w"),
    ).select(
        id_col,
        "__t",
        (F.conv(F.substring(F.md5("__w"), 1, 15), 16, 10).cast("long") % n_buckets
         ).alias("__b"),
    ).persist()
    cnt = ex.groupBy("__b").agg(
        F.count(F.lit(1)).alias("__r_cnt"),
        F.count_if(F.col("__t")).alias("__t_cnt"),
    )
    # totals fold over the ≤n_buckets count rows, NOT a second corpus scan
    tot = cnt.agg(
        F.sum("__r_cnt").cast("long").alias("__r_tot"),
        F.sum("__t_cnt").cast("long").alias("__t_tot"),
    )
    lnt = F.round(
        F.log((F.col("__t_cnt") + 1.0) / (F.col("__t_tot") + b)), 6
    )
    lnr = F.round(
        F.log((F.col("__r_cnt") + 1.0) / (F.col("__r_tot") + b)), 6
    )
    wt = (
        cnt.crossJoin(F.broadcast(tot))
        .select(
            "__b",
            F.floor((lnt - lnr) * 1000000.0 + 0.5).cast("long").alias("__wm"),
        )
    )
    return (
        ex.join(F.broadcast(wt), "__b")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.sum("__wm").alias("__sm"),
        )
        .select(
            id_col,
            "n_tokens",
            (F.col("__sm") / 1000000.0).alias("dsir_score"),
        )
    )


def lm_perplexity_scores(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    include_micro: bool = False,
) -> DataFrame:
    """CCNet-style language-model quality scoring (Wenzek et al. 2020): train
    an add-one-smoothed bigram LM on the corpus itself, score every document
    by its average per-bigram log-probability, and emit ``ppl_proxy`` =
    negated avg-logprob (low = fluent/typical, high = gibberish — the
    perplexity-filter signal, monotone in true perplexity exp(ppl_proxy)).
    Engine-added: completes the quality family (heuristic q29/q65,
    distribution-matching q126) with the statistical-LM member.

    p(w2|w1) = (c(w1 w2) + 1) / (c(w1) + V), c(w1) the corpus unigram
    count, V the distinct-vocabulary size. Same parity machinery as
    :func:`dsir_scores`: each ln is rounded to 6dp at the transcendental,
    quantized to BIGINT micro-units, per-doc accumulation is an exact
    integer sum; the emitted double is one final division chain on exact
    integers (bit-exact; ANSI-guarded for docs with < 2 words).

    Scale shape: bigram/unigram count aggs shuffle only distinct-gram rows
    (map-side combined — the LM itself, not the corpus); V and the unigram
    table ride a shuffle join keyed on the first word; the per-doc re-agg
    partial-aggregates before its id shuffle. The bigram weight table is
    corpus-vocabulary-sized, so the score join is a plain hash join on the
    bigram string — hash-partitionable, no broadcast assumption. The word
    and bigram arrays are STAGED projections (HOFs are CodegenFallback with
    no subexpression elimination — CLAUDE.md invariant 14)."""
    from soict20221_bigdata_financialplatform_spark.functions import text as tx

    staged = docs.select(
        F.col(id_col), tx.words(F.col(text_col)).alias("__w")
    ).select(
        id_col,
        "__w",
        F.when(
            F.size("__w") >= 2,
            F.zip_with(
                F.slice(F.col("__w"), 1, F.size("__w") - 1),
                F.slice(F.col("__w"), 2, F.size("__w") - 1),
                lambda a, b: F.concat(a, F.lit(" "), b),
            ),
        )
        .otherwise(F.array().cast("array<string>"))
        .alias("__bg"),
    ).persist()
    uni = (
        staged.select(F.explode("__w").alias("__u"))
        .groupBy("__u")
        .agg(F.count(F.lit(1)).alias("__cu"))
    )
    vocab = uni.agg(F.count(F.lit(1)).cast("double").alias("__v"))
    bg = staged.select(
        F.col(id_col), F.explode("__bg").alias("__b")
    ).persist()
    cb = bg.groupBy("__b").agg(F.count(F.lit(1)).alias("__cb"))
    wt = (
        cb.withColumn("__u", F.split_part(F.col("__b"), F.lit(" "), F.lit(1)))
        .join(uni, "__u")
        .crossJoin(F.broadcast(vocab))
        .select(
            "__b",
            F.floor(
                F.round(
                    F.log(
                        (F.col("__cb") + 1.0) / (F.col("__cu") + F.col("__v"))
                    ),
                    6,
                )
                * 1000000.0
                + 0.5
            )
            .cast("long")
            .alias("__wm"),
        )
    )
    out = (
        bg.join(wt, "__b")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.sum("__wm").alias("__sm"),
        )
        .select(
            id_col,
            "n_bigrams",
            (-F.col("__sm") / (1000000.0 * F.col("n_bigrams"))).alias(
                "ppl_proxy"
            ),
            F.col("__sm").cast("long").alias("logprob_micro"),
        )
    )
    if include_micro:
        return out  # downstream bucket means stay integer-exact
    return out.drop("logprob_micro")


def pmi_cooccurrence(
    docs: DataFrame,
    min_pairs: int = 5,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Pointwise mutual information over document-level word co-occurrence —
    the classic distributional-semantics association matrix (the implicit
    target of word2vec/SGNS per Levy & Goldberg 2014) and a collocation
    detector for tokenizer/vocab curation. For each unordered word pair
    (w_a < w_b) present together in ≥ ``min_pairs`` documents:
    pmi = ln(P(a,b) / (P(a)P(b))) = ln((c_ab · N) / (c_a · c_b)), with
    doc-presence counts.

    Parity: all counts are exact integers; the products stay < 2^53 so the
    single long/long division is one IEEE op, and the lone ln is rounded to
    6dp at the transcendental both engines (float policy) — no sums of
    floats anywhere.

    Scale shape: per-doc DISTINCT words explode once (persisted); the pair
    build is an EQUI-join on doc_id (quadratic only within one document —
    cap/trim pathological mega-docs upstream; the windowed-co-occurrence
    variant bounds this by construction), then a map-side-combined pair
    count; doc-frequency joins are hash joins on the word. N is one
    broadcast scalar."""
    from soict20221_bigdata_financialplatform_spark.functions import text as tx

    wd = docs.select(
        F.col(id_col),
        F.explode(F.array_distinct(tx.words(F.col(text_col)))).alias("__w"),
    ).persist()
    n = docs.select(F.count(F.lit(1)).cast("long").alias("__n"))
    ca = wd.groupBy("__w").agg(F.count(F.lit(1)).cast("long").alias("__c"))
    a = wd.select(F.col(id_col), F.col("__w").alias("w_a"))
    b = wd.select(F.col(id_col), F.col("__w").alias("w_b"))
    pairs = (
        a.join(b, id_col)
        .where(F.col("w_a") < F.col("w_b"))
        .groupBy("w_a", "w_b")
        .agg(F.count(F.lit(1)).cast("long").alias("c_ab"))
        .where(F.col("c_ab") >= min_pairs)
    )
    return (
        pairs.join(ca.withColumnRenamed("__w", "w_a").withColumnRenamed("__c", "__ca"), "w_a")
        .join(ca.withColumnRenamed("__w", "w_b").withColumnRenamed("__c", "__cb"), "w_b")
        .crossJoin(F.broadcast(n))
        .select(
            "w_a",
            "w_b",
            "c_ab",
            F.round(
                F.log(
                    (F.col("c_ab") * F.col("__n"))
                    / (F.col("__ca") * F.col("__cb"))
                ),
                6,
            ).alias("pmi"),
        )
    )


def windowed_pmi(
    docs: DataFrame,
    window: int = 5,
    min_pairs: int = 5,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Skip-gram-window PMI — the SCALE path of :func:`pmi_cooccurrence`:
    co-occurrence EVENTS are ordered (earlier, later) token pairs within
    ``window`` positions, so per-doc cost is O(len·window) instead of the
    doc-level variant's O(distinct²) — bounded by construction, the word2vec
    operating regime. PMI is computed over the event distribution itself:
    pmi = ln((c_ab·N) / (c_a·c_b)) with c_a/c_b the first-/second-slot
    marginals and N the total event count — all from one event table.

    Parity: the pair array is built IN-ARRAY with an index-aware HOF
    (Spark's (x, i) lambda is 0-based, DuckDB's optional i is 1-based —
    the slice bounds differ by exactly that offset, q116 precedent);
    counts are exact integers, one IEEE division, the lone ln rounded at
    the transcendental.

    Scale shape: one explode of O(len·window) events (persisted), three
    map-side-combined count aggs, two hash joins on the word marginals, N
    broadcast. Nothing quadratic in document length or vocabulary."""
    from soict20221_bigdata_financialplatform_spark.functions import text as tx

    staged = docs.select(
        F.col(id_col), tx.words(F.col(text_col)).alias("__w")
    )
    w = F.col("__w")
    ev = (
        staged.select(
            F.col(id_col),
            F.explode(
                F.flatten(
                    F.transform(
                        w,
                        lambda x, i: F.transform(
                            F.slice(w, i + 2, window),
                            lambda y: F.struct(x.alias("a"), y.alias("b")),
                        ),
                    )
                )
            ).alias("__p"),
        )
        .select(id_col, F.col("__p.a").alias("__a"), F.col("__p.b").alias("__b"))
        .persist()
    )
    n = ev.agg(F.count(F.lit(1)).cast("long").alias("__n"))
    ca = ev.groupBy("__a").agg(F.count(F.lit(1)).cast("long").alias("__ca"))
    cb = ev.groupBy("__b").agg(F.count(F.lit(1)).cast("long").alias("__cb"))
    pairs = (
        ev.groupBy("__a", "__b")
        .agg(F.count(F.lit(1)).cast("long").alias("c_ab"))
        .where(F.col("c_ab") >= min_pairs)
    )
    return (
        pairs.join(ca, "__a")
        .join(cb, "__b")
        .crossJoin(F.broadcast(n))
        .select(
            F.col("__a").alias("w_a"),
            F.col("__b").alias("w_b"),
            "c_ab",
            F.round(
                F.log(
                    (F.col("c_ab") * F.col("__n"))
                    / (F.col("__ca") * F.col("__cb"))
                ),
                6,
            ).alias("pmi"),
        )
    )


def rake_keywords(
    docs: DataFrame,
    top_k: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
    stopwords: tuple = None,
) -> DataFrame:
    """RAKE keyword extraction (Rose et al. 2010, "Automatic Keyword
    Extraction from Individual Documents"): candidate phrases are maximal
    stopword-free word runs; each word scores degree/frequency within the
    document (degree = summed length of the phrases its occurrences sit
    in); a phrase scores the sum of its words' scores; the top_k phrases
    per document are its keywords. The per-document member of the text-
    analysis family (corpus-level: TF-IDF q86, BM25 q122, PMI q129/q132).

    Parity design: degree and frequency are exact integers, so each word
    score is ONE IEEE division quantized half-up to BIGINT micro-units —
    the phrase score is then an exact integer sum (micro-unit machinery of
    q126/q128); ranking ties break on (phrase, phrase_id).

    Scale shape: phrase segmentation is a per-doc running count of
    stopwords (one doc-keyed window over exploded words — the only big
    exchange, reused by every downstream agg since all are doc-keyed);
    word stats, phrase stats and the final top-k all group/window on
    doc-prefixed keys. Nothing global, nothing quadratic; state per doc is
    its own words."""
    from pyspark.sql import Window

    from soict20221_bigdata_financialplatform_spark.functions import text as tx

    stopwords = tuple(stopwords or tx.EN_STOPWORDS)
    w = Window.partitionBy(id_col).orderBy("__i")
    toks = (
        docs.select(
            F.col(id_col), F.posexplode(tx.words(F.col(text_col))).alias("__i", "__w")
        )
        .withColumn(
            "__stop", F.lower(F.col("__w")).isin(*stopwords)
        )
        .withColumn("__pid", F.sum(F.col("__stop").cast("int")).over(w))
        .where(~F.col("__stop"))
        .select(id_col, "__pid", "__i", "__w")
        .persist()
    )
    plen = toks.groupBy(id_col, "__pid").agg(
        F.count(F.lit(1)).alias("__plen")
    )
    members = toks.join(plen, [id_col, "__pid"])
    wstats = members.groupBy(id_col, "__w").agg(
        F.count(F.lit(1)).alias("__freq"),
        F.sum("__plen").alias("__deg"),
    )
    wscore = wstats.select(
        id_col,
        "__w",
        F.floor((F.col("__deg") * 1000000.0) / F.col("__freq") + 0.5)
        .cast("long")
        .alias("__wm"),
    )
    phrases = (
        members.join(wscore, [id_col, "__w"])
        .groupBy(id_col, "__pid")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("__i", "__w"))),
                    lambda s: s["__w"],
                ),
                " ",
            ).alias("phrase"),
            F.sum("__wm").alias("__sm"),
        )
    )
    rw = Window.partitionBy(id_col).orderBy(
        F.desc("__sm"), F.asc("phrase"), F.asc("__pid")
    )
    return (
        phrases.withColumn("rank", F.row_number().over(rw))
        .where(F.col("rank") <= top_k)
        .select(
            id_col,
            "phrase",
            (F.col("__sm") / 1000000.0).alias("rake_score"),
            "rank",
        )
    )


def bpe_learn_merges(
    docs: DataFrame,
    text_col: str = "text",
    rounds: int = 4,
) -> DataFrame:
    """BPE-style vocabulary learning: iterative most-frequent-adjacent-pair
    merges over the corpus word vocabulary (Sennrich 2016 shape; the
    training-side counterpart of ``functions.text.bpe_ish_token_count``).

    Fully deterministic and engine-portable:

    - state lives on the DISTINCT-word frame (vocab rows, corpus-count
      weighted), never the corpus — one grouped word count touches the
      100 TB side, every merge round is vocab-sized;
    - each word is encoded as ``<c1><c2>...`` so a merge is a plain
      left-to-right non-overlapping string ``replace`` of ``<a><b>`` with
      ``<ab>`` — identical semantics in Spark and DuckDB (and exactly BPE's
      leftmost-first merge order, e.g. ``aaa`` + (a,a) -> ``(aa)(a)``);
    - pair counts are exact integers; the winning pair breaks ties on
      (count DESC, sym1 ASC, sym2 ASC), so no float enters the loop at all;
    - the winner is a ONE-ROW exact result: it is collected per round and
      re-embedded as string LITERALS in the next round's merge replace
      (the q208 scalar-literal recipe — the replace sees the identical
      strings either way, so the vocab trajectory is bit-identical), and
      the vocab frame is LAZY-localCheckpoint'ed each round (CLAUDE.md
      inv. 9: the vocab is referenced twice per round — pair counting and
      the merge — so the plan would double without truncation; lazy
      truncates at the next round's collect without a separate
      materialization job, and the FINAL round's merged vocab — which no
      one reads — is never executed at all).

    Returns one row per merge round: (bpe_round, sym1, sym2, merged,
    pair_weight). If the vocabulary exhausts (a round finds no adjacent
    pair), the loop stops early and the output holds fewer than
    ``rounds`` rows — it never silently empties the vocab.
    """
    spark = docs.sparkSession
    wc = (
        docs.select(F.explode(F.split(F.trim(F.col(text_col)), r"\s+")).alias("word"))
        .where(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    )
    enc = wc.select(
        F.regexp_replace("word", "(.)", "<$1>").alias("enc"), "cnt"
    ).localCheckpoint(eager=False)
    rules: list[tuple] = []
    for r in range(1, rounds + 1):
        syms = F.split(F.regexp_replace("enc", "^<|>$", ""), "><")
        pairs = (
            enc.select(syms.alias("s"), "cnt")
            .where(F.size("s") >= 2)  # Spark sequence(1,0) would DESCEND
            .select(
                F.explode(
                    F.transform(
                        F.sequence(F.lit(1), F.size("s") - 1),
                        lambda i: F.struct(
                            F.element_at(F.col("s"), i).alias("sym1"),
                            F.element_at(F.col("s"), i + 1).alias("sym2"),
                        ),
                    )
                ).alias("p"),
                "cnt",
            )
            .select("p.sym1", "p.sym2", "cnt")
        )
        # ONE driver job per round: the 1-row winner collect (exact
        # integers + symbol strings) ALSO materializes the previous
        # round's lazy vocab checkpoint. This replaces the old
        # best-checkpoint job + isEmpty job + crossJoin(broadcast) per
        # round.
        best = (
            pairs.groupBy("sym1", "sym2")
            .agg(F.sum("cnt").cast("long").alias("pair_weight"))
            .orderBy(F.desc("pair_weight"), "sym1", "sym2")
            .limit(1)
            .collect()
        )
        if not best:
            # Vocabulary exhausted (every word a single symbol): a further
            # merge with an empty winner has no signal — stop instead.
            # Output then has fewer than ``rounds`` rows (see docstring).
            break
        sym1, sym2, weight = best[0]["sym1"], best[0]["sym2"], best[0]["pair_weight"]
        rules.append((r, sym1, sym2, sym1 + sym2, weight))
        enc = (
            enc.select(
                F.replace(
                    F.col("enc"),
                    F.lit(f"<{sym1}><{sym2}>"),
                    F.lit(f"<{sym1}{sym2}>"),
                ).alias("enc"),
                "cnt",
            )
            .localCheckpoint(eager=False)
        )
    # The rules frame is driver-built from the collected winners — a
    # LocalTableScan, identical values to the old union of one-row
    # checkpointed frames (Spark's concat of the collected strings ==
    # Python + on the same strings).
    return spark.createDataFrame(
        rules,
        "bpe_round long, sym1 string, sym2 string, "
        "merged string, pair_weight long",
    ).orderBy("bpe_round")


def paragraph_dedup(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    seg_words: int = 13,
) -> DataFrame:
    """Paragraph-grain exact dedup with document reassembly — the practical
    middle ground between whole-document digest dedup (``exact_dedup``) and
    span-level ExactSubstr (``dedup.longest_common_run_pairs``): split each
    document into non-overlapping ``seg_words``-word segments, keep only the
    FIRST occurrence of each distinct segment corpus-wide (ordered by
    (doc_id, seg_idx) — deterministic), and rebuild every document from its
    surviving segments (RefinedWeb/CCNet line-dedup shape, Penedo 2023).

    Returns (doc_id, n_segs, n_kept, kept_text). Scale: the only shuffle is
    the first-occurrence window keyed on the segment text — swap the key for
    a 128-bit digest at corpus scale (raw text here so the DuckDB oracle can
    run the identical plan); segments are vocab-skew-free because boilerplate
    segments collapse to ONE surviving row each.
    """
    from pyspark.sql import Window

    w = seg_words
    words = F.split(F.trim(F.col(text_col)), r"\s+")
    segs = docs.select(
        F.col(id_col),
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.ceil(F.size(words) / w).cast("int") - 1),
                lambda i: F.struct(
                    i.cast("long").alias("seg_idx"),
                    F.array_join(F.slice(words, i * w + 1, w), " ").alias("seg"),
                ),
            )
        ).alias("s"),
    ).select(id_col, "s.seg_idx", "s.seg")
    first = Window.partitionBy("seg").orderBy(id_col, "seg_idx")
    flagged = segs.withColumn(
        "keep", F.row_number().over(first) == 1
    )
    return (
        flagged.groupBy(id_col)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_segs"),
            F.sum(F.when(F.col("keep"), 1).otherwise(0)).cast("long").alias("n_kept"),
            F.coalesce(
                F.array_join(
                    F.transform(
                        F.array_sort(
                            F.collect_list(
                                F.when(
                                    F.col("keep"),
                                    F.struct("seg_idx", "seg"),
                                )
                            )
                        ),
                        lambda s: s["seg"],
                    ),
                    " ",
                ),
                F.lit(""),
            ).alias("kept_text"),
        )
    )


def mattr_counts(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    window: int = 20,
    carry_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Per-document MATTR numerator/denominator counts (Covington &
    McFall 2010 moving-average type-token ratio, window ``window``
    tokens) in EXACT integers: returns (id, *carry_cols, tn, sc) where
    tn = token count and sc = Σ over the tn−w+1 sliding windows of the
    window's DISTINCT-type count; MATTR = sc / ((tn−w+1)·w). Documents
    shorter than ``window`` tokens are dropped (the statistic is
    undefined there).

    Instead of re-counting distinct types per window (O(T·w) state),
    uses the exact closed form: the token at position p is
    distinct-in-window s iff its PREVIOUS occurrence sits before s, so
    p contributes to exactly
    max(0, min(p, T−w) − max(p−w+1, prev+1, 0) + 1) windows — one lag
    over each (doc, token) occurrence chain and pure integer
    arithmetic (property-tested against the brute-force window count in
    tests/test_equivalence_properties.py). Scale: one explode, one
    keyed window, one grouped agg; token strings never leave their
    (doc, token) partition."""
    w_sz = int(window)
    carry = list(carry_cols)
    toks = docs.select(
        id_col,
        *carry,
        F.split(F.trim(F.lower(F.col(text_col))), r"\s+").alias("__t"),
    )
    tk = toks.select(
        id_col, *carry, "__t", F.size("__t").cast("long").alias("tn")
    ).where(F.col("tn") >= w_sz)
    pos = tk.select(
        id_col, *carry, "tn", F.posexplode("__t").alias("p", "__tok")
    )
    wprev = Window.partitionBy(id_col, "__tok").orderBy("p")
    pc = pos.select(
        id_col, *carry, "tn", "p", F.lag("p").over(wprev).alias("__prev")
    )
    contrib = F.greatest(
        F.least(F.col("p"), F.col("tn") - w_sz)
        - F.greatest(
            F.col("p") - (w_sz - 1),
            F.coalesce(F.col("__prev") + 1, F.lit(0)),
            F.lit(0),
        )
        + 1,
        F.lit(0),
    )
    return (
        pc.select(id_col, *carry, "tn", contrib.alias("__c"))
        .groupBy(id_col, *carry, "tn")
        .agg(F.sum("__c").cast("long").alias("sc"))
    )

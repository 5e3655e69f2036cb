"""Batch sources (SURVEY §2.1 S1/S2/S5).

All readers return lazily-planned DataFrames; filters and projections applied
by callers reach the scan via Catalyst pushdown (verified in
``tests/test_plans.py``). At cluster scale the parquet reads are split by
``spark.sql.files.maxPartitionBytes``; no collect, no driver loops.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

# Driver-provided TPC-H-ish star schema + pipeline tables (TESTDATA.md).
TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

# Small dimension tables that an optimizer should broadcast in joins.
SMALL_DIMS = frozenset({"region", "nation"})

# Corpus schema contract: every valid embedding has exactly this many
# components (TESTDATA.md; the reference's embedding column is likewise a
# fixed-width vector). A vector of any OTHER length is a malformed row —
# a truncated write or a mixed-model ingest — not a different-but-valid
# value; length dirt otherwise flows SILENTLY through zip_with (Spark
# null-pads the short side) while DuckDB list ops error or mis-align.
EMBEDDING_DIM = 64


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Parquet scan of one testdata table (S5 analog: keyed reads answered by
    parquet row-group pruning + pushed filters rather than Cassandra's
    partition key; cf. reference ``pipeline/warehouse.py:61-100``).

    ``events.ts`` is stored as parquet TIMESTAMP(NANOS); with
    ``nanosAsLong`` it arrives as raw nanos and is converted here to a µs
    timestamp via integer division (``div`` — float division would lose
    precision above 2^53 ns), matching DuckDB's ns→µs truncation bit-for-bit.
    Both confs are set at runtime too, so the loader works under ANY caller's
    SparkSession (the verification driver passes its own), not just this
    package's factory.
    """
    # Runtime-settable SQL confs; idempotent. UTC keeps timestamp semantics
    # host-independent and aligned with the DuckDB oracle's naive timestamps.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    # InferFiltersFromGenerate turns explode(expr) into a pushed-down
    # `size(expr)>0 AND isnotnull(expr)` filter with expr INLINED — for the
    # computed arrays every explode here uses (shingles, bands, n-gram
    # fingerprints) that re-evaluates the whole expensive chain per row at
    # the scan (below the repartition exchange → also single-threaded on
    # single-file testdata; measured 164s vs 3s on q67), and it can never
    # prune a parquet scan on a computed column. None of these tables store
    # nullable/empty arrays the inference could actually help with.
    _excl = "org.apache.spark.sql.catalyst.optimizer.InferFiltersFromGenerate"
    prev = spark.conf.get("spark.sql.optimizer.excludedRules", None)
    if not prev:
        spark.conf.set("spark.sql.optimizer.excludedRules", _excl)
    elif _excl not in prev:
        spark.conf.set("spark.sql.optimizer.excludedRules", f"{prev},{_excl}")
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    if name == "events":
        if dict(df.dtypes).get("ts") == "bigint":
            df = df.withColumn(
                "ts",
                F.timestamp_micros(F.expr("ts div 1000")).cast("timestamp_ntz"),
            )
        df = _quarantine_specials(df)
    if name == "embeddings":
        df = _quarantine_embeddings(df)
    return df


def _quarantine_embeddings(df: DataFrame) -> DataFrame:
    """Ingest hygiene on the vector column (r14, the dirty-embedding
    gate's scan contract — the events.value quarantine's sibling): an
    embedding is VALID iff it is non-null, has exactly ``EMBEDDING_DIM``
    components, and every component is a non-null FINITE float. Any
    malformed vector -> NULL (the row survives; vec_id/label remain).

    Why whole-vector, not per-component: a vector with a NULL/NaN/Inf
    component or the wrong length carries no usable geometry — patching
    components would fabricate data, and the specific dirt classes are
    cross-engine poison: NULL elements arrive in Arrow as
    float64-with-NaN and ``astype(int64)`` silently wraps to INT64_MIN
    (r11 lesson a); ragged lengths null-pad through Spark ``zip_with``
    while DuckDB errors or mis-aligns; non-finite components abort
    DuckDB aggregates where Spark returns NULL/NaN. Quarantining the
    vector makes every consumer's ``isNotNull`` guard sufficient. The
    DuckDB twin lives in tools/parity_check.py's embeddings view DDL.
    On the driver's clean testdata this is value-identical to the raw
    scan (verified: clean-parity suite unchanged).

    Zero-norm vectors stay: all-zero is well-formed float data — cosine
    consumers guard the division per CLAUDE.md invariant 4 instead.

    Scale note: one CodegenFallback HOF pass over a column the query
    was about to read anyway — no shuffle, no pushdown loss (vec_id
    predicates still prune; there are no element-level PushedFilters on
    list columns to lose)."""
    bad_elem = F.exists(
        "embedding",
        lambda x: x.isNull() | F.isnan(x) | (F.abs(x) == F.lit(float("inf"))),
    )
    valid = (
        F.col("embedding").isNotNull()
        & (F.size("embedding") == EMBEDDING_DIM)
        & ~bad_elem
    )
    return df.withColumn("embedding", F.when(valid, F.col("embedding")))


def _quarantine_specials(df: DataFrame) -> DataFrame:
    """Ingest hygiene on the measurement column: NaN/±Inf -> NULL.

    The r13 dirty-numeric gate showed IEEE specials are fundamentally
    non-portable downstream — DuckDB ABORTS on stddev/quantile/ln over
    NaN and on any non-finite->BIGINT cast where Spark returns NULL/NaN
    or saturates, so no oracle-paired query can hold parity once a
    special reaches an aggregate. Quarantining to NULL at the scan makes
    every aggregate skip them identically on both engines (the DuckDB
    twin lives in tools/parity_check.py's events view DDL:
    ``CASE WHEN isfinite(value) THEN value END``). This is standard
    warehouse practice — specials encode upstream sensor/feed glitches,
    not measurements.

    Cost note: the projection makes a later ``value > x`` predicate a
    post-scan filter instead of a PushedFilter. That trades nothing at
    scale: value is unclustered, so its row-group min/max spans span
    everything and never prune; the pruning that matters (ts) goes
    through ``load_events_time_range``'s raw-ns path, and event_type/
    user_id pushdown is untouched."""
    finite = ~F.isnan("value") & (F.abs("value") != F.lit(float("inf")))
    return df.withColumn("value", F.when(finite, F.col("value")))


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TABLES}


def load_events_time_range(
    spark: SparkSession,
    sf_dir: str,
    ts_lo: str | None = None,
    ts_hi: str | None = None,
    closed: bool = False,
) -> DataFrame:
    """Events scan with a PUSHED-DOWN time-range predicate.

    ``load_table`` converts the ns-long ``ts`` to a timestamp, which makes a
    later ``ts > lit`` filter a post-scan DataFilter (computed column — no
    row-group pruning). This loader translates the bounds to raw nanoseconds
    and filters the BIGINT column before conversion, so the comparison
    reaches the parquet reader as a PushedFilter and prunes row groups via
    min/max stats — the difference between scanning a day and scanning 100 TB.
    """
    import datetime as dt

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    df = spark.read.parquet(os.path.join(sf_dir, "events.parquet"))

    def _ns(s: str) -> int:
        # integral epoch math: int(t.timestamp()) truncates toward zero, which
        # rounds the WRONG way for pre-1970 instants (and round-trips through
        # float); floor-divide a timedelta instead — exact for any year.
        t = dt.datetime.fromisoformat(s).replace(tzinfo=dt.timezone.utc)
        epoch = dt.datetime(1970, 1, 1, tzinfo=dt.timezone.utc)
        secs = (t - epoch) // dt.timedelta(seconds=1)
        return secs * 1_000_000_000 + t.microsecond * 1000

    if dict(df.dtypes).get("ts") == "bigint":
        # ns-exact translations of the µs-truncated comparisons (a row with
        # sub-µs nanos must land on the same side as after truncation):
        #   ts_µs > lo ⟺ ts_ns ≥ lo_ns+1000;  ts_µs ≥ lo ⟺ ts_ns ≥ lo_ns
        #   ts_µs < hi ⟺ ts_ns < hi_ns;       ts_µs ≤ hi ⟺ ts_ns < hi_ns+1000
        if ts_lo is not None:
            lo = _ns(ts_lo)
            df = df.where(F.col("ts") >= (lo if closed else lo + 1000))
        if ts_hi is not None:
            hi = _ns(ts_hi)
            df = df.where(F.col("ts") < (hi + 1000 if closed else hi))
        df = df.withColumn(
            "ts", F.timestamp_micros(F.expr("ts div 1000")).cast("timestamp_ntz")
        )
    else:  # plain timestamp column (already µs)
        if ts_lo is not None:
            df = df.where(F.col("ts") >= ts_lo if closed else F.col("ts") > ts_lo)
        if ts_hi is not None:
            df = df.where(F.col("ts") <= ts_hi if closed else F.col("ts") < ts_hi)
    # same ingest hygiene as load_table — the raw-ns ts filters above are
    # already pushed before this projection is added, so pruning is intact
    return _quarantine_specials(df)


# ---------------------------------------------------------------------------
# Reference-shaped raw sources (S1 multiline JSON, S2 CSV-with-schema).
# ---------------------------------------------------------------------------

# Raw OHLC bar files are arrays of all-string objects with Vietnamese number
# formatting (reference ``data/data_olhc/*.json``; parsed at ``util.py:57-74``).
BARS_RAW_SCHEMA = T.StructType(
    [
        T.StructField("symbol", T.StringType()),
        T.StructField("date", T.StringType()),
        T.StructField("open", T.StringType()),
        T.StructField("high", T.StringType()),
        T.StructField("low", T.StringType()),
        T.StructField("close", T.StringType()),
        T.StructField("volume", T.StringType()),
        T.StructField("value", T.StringType()),
    ]
)

# Daily-bar CSV with explicit schema (reference ``Query.ipynb:27-35``).
BARS_CSV_SCHEMA = T.StructType(
    [
        T.StructField("Ticker", T.StringType()),
        T.StructField("DTYYYYMMDD", T.StringType()),
        T.StructField("OpenFixed(K)", T.DoubleType()),
        T.StructField("HighFixed(K)", T.DoubleType()),
        T.StructField("LowFixed(K)", T.DoubleType()),
        T.StructField("CloseFixed(K)", T.DoubleType()),
        T.StructField("Volume", T.IntegerType()),
    ]
)


def read_bars_json(spark: SparkSession, path: str) -> DataFrame:
    """S1: multiline JSON array-of-objects scan with an explicit all-string
    schema (schema inference on strings is wasted work at scale — one extra
    full pass over the input)."""
    return spark.read.option("multiLine", True).schema(BARS_RAW_SCHEMA).json(path)


def read_bars_csv(spark: SparkSession, path: str) -> DataFrame:
    """S2: header CSV with the notebook's 7-column schema."""
    return spark.read.csv(path, header=True, schema=BARS_CSV_SCHEMA)


def read_text_corpus(spark: SparkSession, path: str) -> DataFrame:
    """Line-oriented text ingest for raw corpus files: one row per line with
    its source file (``input_file_name`` — provenance survives shuffles as a
    plain column). The front door for LLM-pipeline text that isn't parquet
    yet; ``wholetext=False`` keeps splits line-aligned so a 100 GB file
    still parallelizes across tasks."""
    from pyspark.sql import functions as F

    return spark.read.text(path).select(
        F.input_file_name().alias("source_file"),
        F.col("value").alias("line"),
    )


def read_jsonl_documents(spark: SparkSession, path: str, schema=None) -> DataFrame:
    """JSON-lines document ingest (one object per line — the common corpus
    interchange format). NOT multiline: line-delimited JSON splits by line,
    so unlike the S1 array-of-objects form it parallelizes within a file.
    Pass an explicit schema at scale; inference costs one extra full pass.
    Corrupt lines land in ``_corrupt_record`` (PERMISSIVE) instead of
    failing the job — count them before trusting a crawl."""
    r = spark.read.option("mode", "PERMISSIVE").option(
        "columnNameOfCorruptRecord", "_corrupt_record"
    )
    if schema is not None:
        r = r.schema(schema)
    return r.json(path)


def write_orc(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """ORC sink (zlib, Spark-native) — the interchange format for
    Hive/Presto-side consumers; same columnar pruning properties as
    parquet."""
    df.write.mode(mode).orc(path)


def read_orc(spark: SparkSession, path: str) -> DataFrame:
    """ORC scan — predicate pushdown and column pruning work as with
    parquet (both are stripe/stats-indexed columnar formats)."""
    return spark.read.orc(path)


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Expose every testdata table as a SQL temp view so ``spark.sql`` works
    directly — the same table names the DuckDB oracle uses, so any ORACLE
    string in the registry also runs verbatim-ish on Spark's SQL surface.
    Views are lazy metadata; nothing is scanned until queried."""
    for name in TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)


def read_evolving_parquet(
    spark: SparkSession, path: str, merge_schema: bool = True
) -> DataFrame:
    """Read a parquet directory whose files were written under EVOLVING
    schemas (a corpus that grew columns across ingest versions): with
    ``mergeSchema`` the unified schema is the union of every file's
    footer, older files null-filling the new columns.

    Scale note: schema merging reads every file FOOTER at planning time —
    cheap next to the data scan, but on a 10⁶-file corpus pin the unified
    schema explicitly (``spark.read.schema(s).parquet(path)``) once it has
    stabilized; this helper is for the evolving-ingest phase. Column
    PRUNING and predicate pushdown work as usual on the merged schema."""
    return spark.read.option("mergeSchema", str(merge_schema).lower()).parquet(
        path
    )

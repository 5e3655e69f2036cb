"""spark-finplat — a PySpark-native analytics engine.

Re-implements, Spark-first, the query and data-processing capabilities of the
reference financial-market platform (see SURVEY.md): schema-on-read
normalization of messy string-typed market data, a parameterized
scan/filter/project query surface, per-key window analytics and a
technical-indicator library (change, SMA, EMA, RSI), latest-N / summary-stat
serving queries, and a Structured Streaming tick path — plus the
large-scale-pipeline operators (dedup, similarity search, text analysis,
multimodal plumbing) a 100 TB training-data pipeline needs.

Design rules (enforced throughout):
- DataFrame/SQL only; Catalyst plans everything. No RDDs.
- Native `pyspark.sql.functions` expressions in the hot path; Arrow-batched
  pandas UDFs only where semantics are genuinely not expressible (EWM).
- No driver-side loops over collect(); sinks are `foreachBatch`/parquet writes.
"""

from soict20221_bigdata_financialplatform_spark.session import get_spark

__all__ = ["get_spark"]
__version__ = "0.1.0"

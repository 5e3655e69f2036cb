"""Skew-mitigation operators.

AQE's skew-join handles most cases at runtime
(``spark.sql.adaptive.skewJoin.enabled``, on in the session factory); salting
is the explicit fallback for pathological keys (one symbol carrying half the
ticks, a null-heavy foreign key) or for aggregations, where AQE can't split a
single hot group.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: str,
    salt: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Equi-join resilient to a skewed key distribution on the big side.

    The big side gets a DETERMINISTIC salt in [0, salt) derived from a
    non-join column hash (deterministic ⇒ retries/speculative tasks produce
    identical rows — ``rand()`` here is a correctness bug under task retry);
    the small side is exploded ×salt so every (key, salt) pair finds its
    match. A hot key's rows now spread over ``salt`` reducers.

    Only ``inner`` and ``left`` (big side preserved) are correct under
    salting: for right/full joins an UNMATCHED small-side key would surface
    once per salt replica — ``salt`` duplicate null-padded rows. Put the
    preserved big side on the left, or handle outer semantics upstream.
    """
    if how not in ("inner", "left", "left_outer", "leftouter"):
        raise ValueError(
            f"salted_join supports how='inner'|'left' only (got {how!r}): the "
            "x-salt-exploded small side emits duplicate rows for unmatched "
            "keys under right/full semantics"
        )
    other_cols = [c for c in big.columns if c != on]
    salt_src: Column = F.xxhash64(*[F.col(c) for c in other_cols]) if other_cols else F.xxhash64(F.col(on))
    b = big.withColumn("__salt", F.pmod(salt_src, F.lit(salt)).cast("int"))
    s = small.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(salt - 1)))
    )
    out = b.join(s, on=[on, "__salt"], how=how)
    return out.drop("__salt")


def salted_agg_count(
    df: DataFrame,
    key_cols: Sequence[str],
    salt: int = 16,
) -> DataFrame:
    """Two-phase count for hot grouping keys: pre-aggregate on
    (key, salt) — spreading a hot key over ``salt`` partial groups — then
    final-aggregate on the key. (Spark's partial aggregation already does
    this per map task; explicit salting helps when the REDUCE side is the
    bottleneck, e.g. count-distinct rewrites.)"""
    keys = list(key_cols)
    # salt from the NON-key columns — it must vary WITHIN a group to spread
    # a hot key (hashing the key itself would map the whole group to one
    # salt, spreading nothing)
    non_keys = [c for c in df.columns if c not in keys] or keys
    salted = df.withColumn(
        "__salt", F.pmod(F.xxhash64(*[F.col(c) for c in non_keys]), F.lit(salt))
    )
    partial = salted.groupBy(*keys, "__salt").agg(
        F.count(F.lit(1)).alias("__partial")
    )
    return partial.groupBy(*keys).agg(F.sum("__partial").cast("long").alias("n"))

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


def salted_self_pairs(
    df: DataFrame,
    key_cols: Sequence[str],
    id_col: str = "id",
    salt: int = 8,
) -> DataFrame:
    """ALL within-group pairs (``id_a < id_b``) of a keyed self-join, with a
    hot group's quadratic pair generation spread over ~salt²/2 reducers
    instead of one.

    The classic LSH band-join failure: one adversarially hot (band, key)
    bucket under the size cap still makes ONE reducer emit all |bucket|²
    pairs. Decomposition: assign each row a deterministic sub-group
    ``g = hash(id) % salt``; the pair space is the union of sub-group pair
    blocks (i ≤ j), and each block is its own join cell. The a-side
    replicates a row to cells (g, j≥g), the b-side to cells (i≤g, g) —
    (salt+1) copies of each row across both sides — and every cross-group
    pair lands in exactly one cell; same-group pairs dedup on id order.
    EXACT: returns precisely the naive self-join's pair set (tested).

    Use when a key's group size is bounded but still big enough that
    |group|² from one task dominates a stage; for unbounded hot keys cap or
    drop the group first (see ``dedup.minhash_near_dup_pairs``).
    """
    keys = list(key_cols)
    g = F.pmod(F.xxhash64(F.col(id_col)), F.lit(salt)).cast("int")
    base = df.select(*keys, F.col(id_col)).withColumn("__g", g)
    a = base.select(
        *keys,
        F.col(id_col).alias("__ida"),
        F.col("__g").alias("__ga"),
        F.col("__g").alias("__pi"),
        F.explode(F.sequence(F.col("__g"), F.lit(salt - 1))).alias("__pj"),
    ).alias("a")
    b = base.select(
        *[F.col(k).alias(f"__bk_{k}") for k in keys],
        F.col(id_col).alias("__idb"),
        F.col("__g").alias("__gb"),
        F.explode(F.sequence(F.lit(0), F.col("__g"))).alias("__qi"),
        F.col("__g").alias("__qj"),
    ).alias("b")
    cond = None
    for left, right in (
        *[(k, f"__bk_{k}") for k in keys],
        ("__pi", "__qi"),
        ("__pj", "__qj"),
    ):
        c = F.col(f"a.{left}") == F.col(f"b.{right}")
        cond = c if cond is None else cond & c
    # same-group block (g,g) would match both orientations: id-order it
    cond = cond & (
        (F.col("a.__ga") != F.col("b.__gb"))
        | (F.col("a.__ida") < F.col("b.__idb"))
    )
    return a.join(b, cond).select(
        *[F.col(f"a.{k}") for k in keys],
        F.least("__ida", "__idb").alias("id_a"),
        F.greatest("__ida", "__idb").alias("id_b"),
    )


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

"""Connected components over a pair list — turns the near-duplicate pair set
into transitive clusters (A~B, B~C ⇒ {A,B,C} share one canonical id).

Algorithm: alternating min-label propagation ("large-star/small-star"
simplified): every node repeatedly adopts the minimum label in its
neighborhood (including itself) until no label changes. Converges in
O(log n) rounds for typical near-dup graphs (shallow, star-like); each round
is two hash joins + an aggregation — all Catalyst ops, no RDDs, no GraphX
dependency.

Scale notes: the label frame is (node, label) — two longs; the edge list is
the input. Rounds double the reach of small labels, so even pathological
chains of length L need ~log2(L) rounds. ``max_iterations`` bounds runaway
graphs; the loop stops early on fixpoint (checked with a cheap count).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    pairs: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    max_iterations: int = 20,
) -> DataFrame:
    """(node, component) for every node appearing in ``pairs``; component =
    min node id of its cluster."""
    edges = (
        pairs.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .union(pairs.select(F.col(dst).alias("a"), F.col(src).alias("b")))
        .distinct()
        .persist()
    )
    labels = (
        edges.select(F.col("a").alias("node"))
        .distinct()
        .withColumn("label", F.col("node"))
        .persist()
    )

    for _ in range(max_iterations):
        # candidate label for each node: min over neighbors' labels and own
        neighbor_labels = (
            edges.join(labels.withColumnRenamed("node", "b"), "b")
            .select(F.col("a").alias("node"), "label")
        )
        new_labels = (
            neighbor_labels.union(labels.select("node", "label"))
            .groupBy("node")
            .agg(F.min("label").alias("label"))
            .persist()
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "node")
            .where(F.col("n.label") != F.col("o.label"))
            .limit(1)
            .count()
        )
        labels.unpersist()
        labels = new_labels
        if changed == 0:
            break

    edges.unpersist()
    return labels.select(F.col("node"), F.col("label").alias("component"))


def cluster_near_dups(
    docs: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
) -> DataFrame:
    """Attach a transitive ``cluster_id`` to every doc: members of a near-dup
    chain share the min doc_id of the chain; singletons keep their own id.
    The canonical survivor of a cluster is the row where
    ``doc_id == cluster_id``."""
    comp = connected_components(pairs, "id_a", "id_b")
    return (
        docs.join(
            comp.withColumnRenamed("node", id_col), on=id_col, how="left"
        )
        .withColumn("cluster_id", F.coalesce(F.col("component"), F.col(id_col)))
        .drop("component")
    )

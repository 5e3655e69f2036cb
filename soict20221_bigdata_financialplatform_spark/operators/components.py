"""Connected components over a pair list — turns the near-duplicate pair set
into transitive clusters (A~B, B~C ⇒ {A,B,C} share one canonical id).

Algorithm: min-label propagation WITH pointer doubling. Each round:
  1. propagate — every node takes the minimum label over its neighborhood
     (including itself): one hash join + one aggregation;
  2. shortcut  — every node replaces its label by its label's label
     (``label ← label(label)``): one self-join of the label frame.
Propagation alone moves a label one edge per round (a chain of length L needs
~L rounds); the shortcut doubles the distance already covered, so the
combined operator converges in O(log L) rounds — the standard
pointer-doubling bound. Both steps are monotone non-increasing on labels, so
a round that changes nothing is a true fixpoint: every edge then joins two
equal labels, i.e. the labels ARE the components.

Scale notes: the label frame is (node, label) — two longs; the edge list is
the input. ``max_iterations`` bounds runaway graphs; the loop stops early on
fixpoint (each node's OLD label rides the round as one extra column, so a
join-free changed-row count detects convergence, fused into the same job
that materializes the round's checkpoint). Exiting WITHOUT
reaching fixpoint raises by default (``allow_partial=True`` downgrades to a
warning) — silently returning split clusters is how near-dup cluster counts
quietly go wrong. Pass ``stats={}`` to read back rounds/convergence.

Reference parity: the reference has no graph operator at all; this exists for
the near-dup clustering required by the large-scale-pipeline brief
(cf. SURVEY.md §2 engine-added rows).
"""

from __future__ import annotations

import warnings

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    pairs: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    max_iterations: int = 20,
    allow_partial: bool = False,
    stats: dict | None = None,
) -> DataFrame:
    """(node, component) for every node appearing in ``pairs``; component =
    min node id of its cluster.

    NULL-sided pairs are dropped WHOLE: a non-NULL endpoint that appears
    ONLY in NULL-sided pairs (e.g. 5 in (NULL, 5)) gets no label at all —
    it does not come back as a singleton component, because a NULL side is
    no evidence the node exists as a graph participant. Callers that need
    every non-NULL id labeled should union the missing ids back in as
    singletons (``ids.join(out, "node", "left_anti")``).

    ``stats``, if a dict is passed, receives ``{"iterations": n,
    "converged": bool}`` after the run — the convergence metric a pipeline
    can log/alert on. Non-convergence within ``max_iterations`` raises
    ``RuntimeError`` unless ``allow_partial=True`` (then it warns and returns
    the partial labels)."""
    # A pair with a NULL side is not an edge: NULL join keys never match in
    # the propagate join, so keeping them would emit a phantom NULL node
    # that inherits one side's label while the OTHER side silently loses the
    # transitive link it sat on (2~NULL, NULL~5 must not half-connect).
    pairs = pairs.where(F.col(src).isNotNull() & F.col(dst).isNotNull())
    # localCheckpoint, not persist: persist caches the DATA but each round's
    # join still re-ANALYZES the full upstream lineage (for near-dup input
    # that subtree is the whole shingle self-join) — truncating it once here
    # cuts per-round planning cost for every iteration.
    edges = (
        pairs.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .union(pairs.select(F.col(dst).alias("a"), F.col(src).alias("b")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    labels = (
        edges.select(F.col("a").alias("node"))
        .distinct()
        .withColumn("label", F.col("node"))
        .persist()
    )

    label_type = labels.schema["label"].dataType

    converged = False
    rounds = 0
    for rounds in range(1, max_iterations + 1):
        # 1. propagate: min label over the neighborhood (incl. self). The
        # self row additionally carries the node's OLD label in ``__old``
        # (NULL on neighbor rows); a group has exactly one self row, so
        # max(__old) — aggregates skip NULLs — recovers it for the
        # join-free fixpoint test below. Works for any orderable label
        # type (fuzzy.py clusters STRING values through this operator).
        neighbor_labels = (
            edges.join(labels.withColumnRenamed("node", "b"), "b")
            .select(
                F.col("a").alias("node"),
                "label",
                F.lit(None).cast(label_type).alias("__old"),
            )
        )
        propagated = (
            neighbor_labels.union(
                labels.select(
                    "node", "label", F.col("label").alias("__old")
                )
            )
            .groupBy("node")
            .agg(
                F.min("label").alias("label"),
                F.max("__old").alias("__old"),
            )
        )
        # 2. shortcut (pointer doubling): label <- label(label). Every label
        # value is itself a node (labels start as node ids and only ever move
        # to smaller EXISTING ids), so the lookup is a self-join.
        lab_of_lab = propagated.select(
            F.col("node").alias("label"), F.col("label").alias("__ll")
        )
        # localCheckpoint, NOT persist: each round's plan references the
        # previous round's TWICE (propagate join + shortcut self-join),
        # so without lineage truncation the logical plan doubles per round —
        # exponential tree growth that OOMs the driver around round ~10.
        # Checkpointing materializes the ~16-byte-per-node label frame and
        # restarts the lineage; at cluster scale prefer
        # ``spark.sparkContext.setCheckpointDir`` + ``.checkpoint()`` for
        # executor-loss resilience (localCheckpoint trades that for speed).
        # eager=False: the convergence count below is the round's first
        # action, so it BOTH saves the checkpoint blocks and returns the
        # changed-row count — one job per round where the eager-checkpoint
        # + changed-join-count pair used to cost two (the join, its two
        # exchanges and the limit are gone entirely; the old label rides
        # the round as one extra column instead).
        new_labels = (
            propagated.join(lab_of_lab, "label", "left")
            .select(
                "node",
                F.coalesce(F.col("__ll"), F.col("label")).alias("label"),
                "__old",
            )
            .localCheckpoint(eager=False)
        )
        changed = new_labels.where(
            F.col("label") != F.col("__old")
        ).count()
        labels.unpersist()
        labels = new_labels.select("node", "label")
        if changed == 0:
            converged = True
            break

    edges.unpersist()
    if stats is not None:
        stats.update(iterations=rounds, converged=converged)
    if not converged:
        msg = (
            f"connected_components did not reach fixpoint in "
            f"{max_iterations} rounds — labels are PARTIAL (clusters may be "
            f"split); raise max_iterations (pointer doubling needs only "
            f"~log2(diameter) rounds)"
        )
        if not allow_partial:
            raise RuntimeError(msg)
        warnings.warn(msg, stacklevel=2)
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

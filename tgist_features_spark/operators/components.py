"""Connected components over a pair relation — the iterative-algorithm
operator class (duplicate CLUSTERS from pairwise near-dup candidates,
rather than the greedy keep-first pairwise policy).

Algorithm: min-label propagation with POINTER JUMPING. Each node starts
labeled with itself; every iteration (a) pulls the minimum label over its
neighbors (one join + one map-side-combinable min aggregation) and (b)
jumps through its current label's label (one more join), which squares the
propagation distance per round — convergence in O(log diameter)
iterations instead of O(diameter). Each iteration ends in an eager
checkpoint so the plan is truncated (iterative DataFrame loops otherwise
stack lineage and re-plan the whole history every round — the classic
Spark iterative-algorithm trap). Measured on the sf0.1 SimHash pair set:
6.5-9s with per-round ``localCheckpoint`` vs 96-103s with persist()
(cache hits, but the nested logical plan makes analysis + AQE re-planning
quadratic in rounds) — truncation is the load-bearing choice here, worth
the per-round materialization cost many times over.

Checkpoint durability: ``localCheckpoint`` blocks live on executors and
are NOT fault-tolerant — on a real cluster an executor loss
mid-iteration kills the job (lineage is already truncated). Pass
``checkpoint_dir`` to use RELIABLE ``checkpoint()`` instead: blocks go
to that (HDFS/S3/shared) path and survive executor loss, at the cost of
a filesystem write+read round-trip per iteration. Measured on the sf0.1
SimHash pair set against local disk the two modes are wall-parity (~2.5s
steady either way — the label relation is tiny compared to the join
work); on a real cluster the round-trip goes to shared storage, so
expect reliable mode to cost more there, paid back the first time a
multi-round job survives an executor loss. Default stays executor-local
— right for single-node runs; set ``checkpoint_dir`` on clusters.

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
    checkpoint_dir: str | None = None,
) -> DataFrame:
    """(a, b) undirected pair relation -> (id, component) with component =
    the minimum node id in each connected component. Only nodes that
    appear in at least one pair are returned (isolated nodes are their own
    trivial components and carry no dedup information).

    ``checkpoint_dir=None`` (default): per-iteration eager
    ``localCheckpoint`` — fastest, executor-local, not fault-tolerant.
    ``checkpoint_dir=<path>``: per-iteration reliable ``checkpoint()``
    into that directory — survives executor loss on a real cluster (see
    module docstring for the measured cost of each mode).
    """
    if checkpoint_dir is not None:
        sc = pairs.sparkSession.sparkContext
        sc.setCheckpointDir(checkpoint_dir)

        def _ckpt(df: DataFrame) -> DataFrame:
            return df.checkpoint(eager=True)
    else:

        def _ckpt(df: DataFrame) -> DataFrame:
            return df.localCheckpoint(eager=True)

    e = _ckpt(
        pairs.select(F.col(a_col).alias("s"), F.col(b_col).alias("d"))
        .union(pairs.select(F.col(b_col).alias("s"), F.col(a_col).alias("d")))
        .distinct()
    )
    labels = _ckpt(
        e.select(F.col("s").alias("id"))
        .distinct()
        .withColumn("comp", F.col("id"))
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
        new_labels = _ckpt(
            stepped.join(jump, "comp", "left")
            .select(
                "id",
                F.least(F.col("comp"), F.coalesce("jumped", F.col("comp"))).alias("comp"),
            )
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

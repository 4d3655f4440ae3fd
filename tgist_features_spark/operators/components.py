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
``checkpoint_dir`` for RELIABLE per-iteration checkpoints: each
iteration's label relation is written to (and read back from) a parquet
directory under a per-run subpath of that (HDFS/S3/shared) location, so
it survives executor loss, at the cost of a filesystem round-trip per
iteration. Explicit write/read-back is used instead of RDD-level
``df.checkpoint()`` deliberately: ``sc.setCheckpointDir`` is a
session-GLOBAL mutation that would silently redirect every other
checkpoint user, and RDD checkpoint files are never reclaimed without
the ``spark.cleaner.referenceTracking.cleanCheckpoints`` conf — whereas
here each superseded iteration's directory is deleted as the loop
advances (via the Hadoop FileSystem API, so any scheme works) and the
whole run directory is removed on exit. Measured on the sf0.1 SimHash
pair set against local disk the two modes are wall-parity (~2.5s steady
either way — the label relation is tiny compared to the join work); on
a real cluster the round-trip goes to shared storage, so expect
reliable mode to cost more there, paid back the first time a
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
    ``checkpoint_dir=<path>``: per-iteration reliable parquet
    checkpoints under a unique subdirectory of that path — survives
    executor loss on a real cluster; superseded iterations are deleted
    as the loop advances and the subdirectory is removed on exit, so
    nothing accumulates across runs and no session-global checkpoint
    config is touched (see module docstring).
    """
    spark = pairs.sparkSession
    run_dir: str | None = None
    seq = 0
    if checkpoint_dir is not None:
        import uuid  # noqa: PLC0415

        run_dir = f"{checkpoint_dir.rstrip('/')}/cc-{uuid.uuid4().hex}"

        def _ckpt(df: DataFrame) -> DataFrame:
            nonlocal seq
            p = f"{run_dir}/iter-{seq}"
            seq += 1
            df.write.mode("overwrite").parquet(p)
            out = spark.read.parquet(p)
            out._cc_ckpt_path = p  # noqa: SLF001 — consumed by _drop below
            return out
    else:

        def _ckpt(df: DataFrame) -> DataFrame:
            # LAZY local checkpoint: truncates lineage identically to the
            # eager form, but defers the result-stage pass + block caching
            # to the first downstream action — inside this loop that is
            # always the convergence count, so each iteration pays ONE
            # materializing job instead of two (checkpoint pass + count
            # pass). AQE still resolves the plan's shuffle stages at
            # call time (Dataset.localCheckpoint goes through toRdd), so
            # the work moved is exactly the final pass, not a semantic
            # change; values are untouched either way.
            return df.localCheckpoint(eager=False)

    def _drop(df: DataFrame | None) -> None:
        """Delete a superseded reliable checkpoint (no-op in local mode).
        Hadoop FileSystem API, so HDFS/S3/local paths all work."""
        p = getattr(df, "_cc_ckpt_path", None)
        if p is None:
            return
        jvm = spark._jvm  # noqa: SLF001
        jpath = jvm.org.apache.hadoop.fs.Path(p)
        fs = jpath.getFileSystem(spark._jsc.hadoopConfiguration())  # noqa: SLF001
        fs.delete(jpath, True)

    try:
        # symmetric edge expansion via a single-pass explode: a
        # pairs∪pairs.swap union would reference the (often expensive)
        # upstream pair plan TWICE, executing the whole band-join +
        # scoring subplan twice inside this one checkpoint job. The
        # 2-element explode emits both directions from ONE scan — no
        # double eval, no persist lifecycle, no extra barrier job. (The
        # exploded array is built from plain columns, so the
        # InferFiltersFromGenerate double-eval trap does not apply — the
        # inferred size() filter folds to true.)
        e = _ckpt(
            pairs.select(
                F.explode(
                    F.array(
                        F.struct(
                            F.col(a_col).alias("s"), F.col(b_col).alias("d")
                        ),
                        F.struct(
                            F.col(b_col).alias("s"), F.col(a_col).alias("d")
                        ),
                    )
                ).alias("e")
            )
            .select("e.s", "e.d")
            .distinct()
        )
        labels = _ckpt(
            e.select(F.col("s").alias("id"))
            .distinct()
            .withColumn("comp", F.col("id"))
        )
        for it in range(max_iters):
            # (a) min neighbor label per node
            nbr = (
                e.join(labels.select(F.col("id").alias("d"), "comp"), "d")
                .groupBy("s")
                .agg(F.min("comp").alias("nbr_comp"))
                .withColumnRenamed("s", "id")
            )
            # carry the pre-step label through as __old: the convergence
            # count then reads the checkpointed relation directly instead
            # of paying a join against the previous labels every round
            stepped = (
                labels.join(nbr, "id", "left")
                .select(
                    "id",
                    F.col("comp").alias("__old"),
                    F.least(F.col("comp"), F.coalesce("nbr_comp", F.col("comp"))).alias("comp"),
                )
            )
            # (b) pointer jump: follow my label's label (squares the
            # propagation distance). Iteration 0 skips it — labels are
            # still the identity map, the jump is provably a no-op and
            # its join + shuffle pure latency.
            if it == 0:
                combined = stepped
            else:
                jump = labels.select(
                    F.col("id").alias("comp"), F.col("comp").alias("jumped")
                )
                combined = stepped.join(jump, "comp", "left").select(
                    "id",
                    "__old",
                    F.least(F.col("comp"), F.coalesce("jumped", F.col("comp"))).alias("comp"),
                )
            new_labels = _ckpt(combined)
            changed = (
                new_labels.filter(F.col("comp") != F.col("__old")).count()
            )
            # the convergence count was old `labels`' last reader — its
            # checkpoint files are now superseded and safe to reclaim
            _drop(labels)
            labels = new_labels
            if changed == 0:
                out = labels.select("id", "comp")
                if run_dir is not None:
                    # detach the result from the run dir so the whole dir
                    # can be reclaimed now; durability was needed ACROSS
                    # the iterations, the returned relation has the same
                    # executor-block guarantee as the default mode
                    out = out.localCheckpoint(eager=True)
                return out
        raise RuntimeError(
            f"connected_components: no convergence after {max_iters} iterations "
            "— pathological graph or a bug; raise max_iters explicitly if the "
            "input really has diameter > 2^{max_iters}"
        )
    finally:
        if run_dir is not None:
            jvm = spark._jvm  # noqa: SLF001
            jpath = jvm.org.apache.hadoop.fs.Path(run_dir)
            fs = jpath.getFileSystem(spark._jsc.hadoopConfiguration())  # noqa: SLF001
            fs.delete(jpath, True)


def triangle_enumerate(
    edges: DataFrame, src: str = "src", dst: str = "dst"
) -> DataFrame:
    """G3: exact triangle enumeration over an undirected simple graph —
    the clustering-coefficient / community-density primitive a duplicate-
    cluster or interaction graph gets profiled with (a pair relation
    says WHO is connected; triangles say how CLIQUE-LIKE the
    neighborhoods are, the standard spam/botnet/community signal).

    Algorithm: degree-ordered orientation (the classic distributed
    triangle bound). Canonicalize edges to a < b and dedupe; orient
    every edge from its (degree, id)-smaller endpoint to the larger.
    Every triangle then has exactly ONE vertex with two out-edges (its
    orientation-minimum), so enumerating wedges u->v, u->w with
    (deg,id)(v) < (deg,id)(w) and semi-joining the closing oriented
    edge v->w yields each triangle exactly once — no post-dedup pass.

    Scale shape: orientation bounds every vertex's OUT-degree by
    O(sqrt(2m)) — a hub with 10^7 neighbors contributes no wedges
    beyond what its sqrt-bounded out-list allows, so total wedge volume
    is O(m^1.5) (Schank/Wagner bound), the join keys are plain node
    ids, and every step is an equi-join + hash aggregation Catalyst
    shuffles on — no caps, no salting needed: the orientation IS the
    skew handling. Output: one row per triangle as the ascending
    (a, b, c) id triple.
    """
    e = (
        edges.select(
            F.least(F.col(src), F.col(dst)).cast("bigint").alias("a"),
            F.greatest(F.col(src), F.col(dst)).cast("bigint").alias("b"),
        )
        .filter(F.col("a") < F.col("b"))  # drops self-loops and NULLs
        .distinct()
        # the canonical edge relation is referenced three times below
        # (degrees + the orientation join's two sides); without lineage
        # truncation every reference re-expands — and re-READS — the
        # caller's whole upstream plan (plan-audited: 60 scans before,
        # 4 after). The materialized relation is O(m), the algorithm's
        # working set anyway; eager localCheckpoint self-cleans on GC
        # (the connected_components trade, same reasoning).
        .localCheckpoint(eager=True)
    )
    deg = (
        e.select(F.col("a").alias("v"))
        .unionAll(e.select(F.col("b").alias("v")))
        .groupBy("v")
        .agg(F.count(F.lit(1)).cast("bigint").alias("deg"))
    )
    keyed = (
        e.join(deg.withColumnRenamed("v", "a").withColumnRenamed("deg", "da"), "a")
        .join(deg.withColumnRenamed("v", "b").withColumnRenamed("deg", "db"), "b")
    )
    lower_is_a = F.struct(F.col("da"), F.col("a")) < F.struct(F.col("db"), F.col("b"))
    oriented = keyed.select(
        F.when(lower_is_a, F.col("a")).otherwise(F.col("b")).alias("u"),
        F.when(lower_is_a, F.col("b")).otherwise(F.col("a")).alias("v"),
        F.when(lower_is_a, F.col("db")).otherwise(F.col("da")).alias("dv"),
    ).localCheckpoint(eager=True)  # referenced 3x: wedge x/y + closing
    x, y = oriented.alias("x"), oriented.alias("y")
    wedges = (
        x.join(y, F.col("x.u") == F.col("y.u"))
        .filter(
            F.struct(F.col("x.dv"), F.col("x.v"))
            < F.struct(F.col("y.dv"), F.col("y.v"))
        )
        .select(
            F.col("x.u").alias("w0"),
            F.col("x.v").alias("w1"),
            F.col("y.v").alias("w2"),
        )
    )
    closing = oriented.select(
        F.col("u").alias("w1"), F.col("v").alias("w2")
    )
    tri = wedges.join(closing, ["w1", "w2"], "leftsemi")
    triple = F.array_sort(F.array("w0", "w1", "w2"))
    return tri.select(
        triple[0].alias("a"), triple[1].alias("b"), triple[2].alias("c")
    )


def k_core_vertices(
    edges: DataFrame,
    k: int,
    src: str = "src",
    dst: str = "dst",
    max_iters: int = 200,
) -> DataFrame:
    """G4: the k-core — the maximal subgraph where every vertex keeps
    degree >= k — as (v, deg) over the surviving vertices. The density
    filter a fraud/community pipeline runs AFTER components and
    triangles: a connected blob of tag-alongs dissolves under peeling,
    a genuinely dense cluster survives.

    Algorithm: synchronous peeling. Each round computes degrees over
    the CURRENT edge set (one map-side-combinable agg), drops vertices
    under k, and semi-joins the edge set down on both endpoints; the
    fixpoint is the k-core by definition (peeling order cannot change
    the result — removal is monotone). Rounds are bounded by the
    longest "peeling chain" (a path graph is the worst case), not by
    |V| in practice; each round ends in an eager localCheckpoint for
    the same lineage-truncation reason as connected_components (an
    un-truncated loop re-plans the whole history every round).

    Not SQL-oracle-expressible (iterative re-aggregation is outside
    recursive CTEs) — verified against a Python reference peeling in
    pytest, the A8/HLL posture."""
    if k < 1:
        raise ValueError("k_core_vertices: k must be >= 1")
    e = (
        edges.select(
            F.least(F.col(src), F.col(dst)).cast("bigint").alias("a"),
            F.greatest(F.col(src), F.col(dst)).cast("bigint").alias("b"),
        )
        .filter(F.col("a") < F.col("b"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    for _ in range(max_iters):
        deg = (
            e.select(F.col("a").alias("v"))
            .unionAll(e.select(F.col("b").alias("v")))
            .groupBy("v")
            .agg(F.count(F.lit(1)).cast("bigint").alias("deg"))
        ).localCheckpoint(eager=True)
        survivors = deg.filter(F.col("deg") >= k)
        n_all = deg.count()
        n_keep = survivors.count()
        if n_keep == n_all:
            return survivors
        if n_keep == 0:
            return survivors  # empty k-core
        keep_a = survivors.select(F.col("v").alias("a"))
        keep_b = survivors.select(F.col("v").alias("b"))
        e = (
            e.join(keep_a, "a", "leftsemi")
            .join(keep_b, "b", "leftsemi")
            .localCheckpoint(eager=True)
        )
    raise RuntimeError(
        f"k_core_vertices: no fixpoint after {max_iters} rounds — "
        "pathological peeling chain; raise max_iters explicitly"
    )


def pagerank_fixed_point(
    edges: DataFrame,
    iters: int = 3,
    damp_num: int = 85,
    damp_den: int = 100,
    scale: int = 10**9,
    src: str = "src",
    dst: str = "dst",
    weight: str = "w",
    checkpoint_every: int = 4,
) -> DataFrame:
    """G5: weighted PageRank over a directed graph, run for a FIXED
    number of power iterations in pure 64-bit integer arithmetic — the
    importance/centrality score a duplicate-provenance, citation, or
    interaction graph gets ranked with, made bitwise reproducible in
    any engine (floats make power iteration engine-divergent in the
    last ulp; fixed-point with a pinned truncation rule does not).

    Semantics, pinned exactly:
      * scores live at ``scale`` fixed-point (pr ~= scale/N at start:
        pr0 = scale div N);
      * each iteration, node u sends floor-shares of its score along
        its out-edges proportionally by weight:
        contrib(u->v) = (pr_u * w_uv) div outw_u;
      * pr'(v) = (scale*(damp_den-damp_num)) div (damp_den*N)
                 + (damp_num * inflow_v) div damp_den.
      Integer `div` truncates toward zero; every quantity here is
      non-negative (weights must be > 0), so truncation == floor in
      BOTH Spark (`div`) and DuckDB (`//`) — that equivalence is what
      makes the 3-step unrolled SQL oracle bitwise. Truncation leaks
      at most 1/scale of mass per edge per step — at scale=1e9 the
      pinned variant IS PageRank to 9 decimal places.
      * DANGLING nodes (no out-edges) keep receiving the teleport term
        but their own mass is dropped, not redistributed — the pinned
        variant (redistribution needs a global mass sum each step;
        dropping is the common distributed simplification and is
        documented behavior, not an accident).

    Overflow bound: pr_u <= scale and the per-node guard requires
    pr_u * w_uv < 2^63, i.e. edge weights up to ~9.2e18/scale (~9e9 at
    the default scale) — far beyond any real co-occurrence count.

    Scale shape: per iteration ONE equi-join of the edge relation with
    the (node, pr) relation on the source id, one map-side-combinable
    sum keyed by destination, and one left join back to the node set —
    all hash-partitioned on node ids, no driver-side data. N enters
    the plan as a broadcast 1-row aggregate, never a collected Python
    scalar baked into the closure. Lineage is truncated every
    ``checkpoint_every``-th iteration (eager localCheckpoint) rather
    than every iteration: short runs (the common 2-4 iteration
    fixed-point) pay ZERO in-loop materializations while long runs keep
    the bounded-plan guarantee (the connected_components trade: an
    un-truncated loop re-plans its whole history every round).
    Checkpoint cadence cannot change values — it only cuts lineage.

    Returns (node <input id type>, pr_x1e9 bigint, n_nodes bigint) — pr at
    ``scale`` fixed point (column named for the default scale).
    """
    if iters < 0:
        raise ValueError("pagerank_fixed_point: iters must be >= 0")
    if not (0 < damp_num < damp_den):
        raise ValueError("pagerank_fixed_point: need 0 < damp_num < damp_den")
    if checkpoint_every < 1:
        raise ValueError("pagerank_fixed_point: checkpoint_every must be >= 1")
    e = (
        edges.select(
            F.col(src).alias("u"),
            F.col(dst).alias("v"),
            F.col(weight).cast("bigint").alias("w"),
        )
        .filter(F.col("u").isNotNull() & F.col("v").isNotNull() & (F.col("w") > 0))
        .groupBy("u", "v")
        .agg(F.sum("w").alias("w"))  # parallel edges combine additively
        .localCheckpoint(eager=True)  # referenced every iteration
    )
    nodes = (
        e.select(F.col("u").alias("node"))
        .unionAll(e.select(F.col("v").alias("node")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    n_df = nodes.agg(F.count(F.lit(1)).cast("bigint").alias("__n"))
    outw = e.groupBy(F.col("u")).agg(F.sum("w").alias("ow"))
    base = (
        f"({int(scale)}L * {int(damp_den - damp_num)}L)"
        f" div ({int(damp_den)}L * __n)"
    )
    pr = (
        nodes.crossJoin(F.broadcast(n_df))
        .select("node", "__n", F.expr(f"{int(scale)}L div __n").alias("pr"))
    )
    for it in range(iters):
        contrib = (
            e.join(
                pr.select(F.col("node").alias("u"), F.col("pr")), "u"
            )
            .join(outw, "u")
            .select(
                F.col("v").alias("node"),
                F.expr("(pr * w) div ow").alias("c"),
            )
        )
        inflow = contrib.groupBy("node").agg(F.sum("c").alias("infl"))
        pr = (
            nodes.crossJoin(F.broadcast(n_df))
            .join(inflow, "node", "left")
            .select(
                "node",
                "__n",
                (
                    F.expr(base)
                    + F.expr(
                        f"({int(damp_num)}L * coalesce(infl, 0))"
                        f" div {int(damp_den)}"
                    )
                ).alias("pr"),
            )
        )
        # truncate lineage on the cadence, never after the LAST iteration
        # (the caller's action materializes the final plan anyway — an
        # in-loop checkpoint there would be a pure extra pass)
        if (it + 1) % checkpoint_every == 0 and (it + 1) < iters:
            pr = pr.localCheckpoint(eager=True)
    return pr.select(
        F.col("node"),
        F.col("pr").alias("pr_x1e9"),
        F.col("__n").alias("n_nodes"),
    )

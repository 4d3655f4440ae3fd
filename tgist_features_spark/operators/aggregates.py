"""Aggregations (A1-A5, SURVEY.md §2.4).

The reference's ``pf2dfeats`` stage merged per-occurrence phrase features
into per-(document, term) records; the transcript generalization is per-
conversation (and per conversation x role/tool) aggregates. Everything here
is Catalyst hash aggregation (partial + final, map-side combine for free);
the only custom piece is the two-phase *salted* aggregation that keeps hot
conversations from serializing a single reducer at 10^12-turn scale.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def per_entity_agg(df: DataFrame, entity: str = "conv_id") -> DataFrame:
    """A1: per-conversation summary features."""
    return df.groupBy(entity).agg(
        F.count(F.lit(1)).alias("n_turns"),
        F.min("ts").alias("first_ts"),
        F.max("ts").alias("last_ts"),
        F.count_distinct("role").alias("n_roles"),
        F.count_distinct("tool").alias("n_tools"),
        F.sum(F.length("text").cast("long")).alias("total_chars"),
        F.avg(F.length("text")).alias("avg_chars"),
    )


def role_tool_pivot(
    df: DataFrame,
    entity: str = "conv_id",
    roles: tuple[str, ...] = ("system", "user", "assistant", "tool"),
) -> DataFrame:
    """A2: per-conversation role-frequency features as fixed columns.

    Conditional aggregation (sum-of-when) rather than ``.pivot()`` so the
    output schema is static — required both for the feature-vector contract
    and to avoid the extra pivot pass that collects distinct keys.
    """
    aggs = [
        F.sum(F.when(F.col("role") == r, 1).otherwise(0)).cast("long").alias(f"n_{r}")
        for r in roles
    ]
    return df.groupBy(entity).agg(*aggs)


def salted_agg(
    df: DataFrame,
    entity: str,
    partials: dict[str, tuple[Column, Callable[[Column], Column]]],
    n_salts: int = 16,
    salt_source: str | None = None,
) -> DataFrame:
    """A5/J8: two-phase skew-safe aggregation.

    ``partials`` maps output name -> (partial_agg, final_agg_over_partial).
    Phase 1 groups by (entity, salt) — hot keys fan out over ``n_salts``
    reducers; phase 2 re-aggregates the per-salt partials by entity. For
    algebraic aggregates (sum/count/min/max) the result is exactly equal to
    the unsalted aggregation (tested).

    Note: Catalyst's partial aggregation already does map-side combine, so
    this matters when per-key cardinality *within* the final reducer is the
    bottleneck (huge distinct states, pandas-UDF group aggs) or when AQE
    cannot split the downstream stage.
    """
    salt = F.pmod(
        F.xxhash64(salt_source if salt_source else F.monotonically_increasing_id()),
        F.lit(n_salts),
    ).alias("__salt")
    phase1 = df.withColumn("__salt", salt).groupBy(entity, "__salt").agg(
        *[p.alias(f"__p_{name}") for name, (p, _) in partials.items()]
    )
    return phase1.groupBy(entity).agg(
        *[fin(F.col(f"__p_{name}")).alias(name) for name, (_, fin) in partials.items()]
    )


def group_standardize(
    df: DataFrame,
    value_col: str,
    group_col: str,
    scale: int = 10_000,
) -> DataFrame:
    """Per-group feature standardization with INTEGER-EXACT arithmetic —
    the "how unusual is this doc within its language/source stratum"
    normalization a quality-filtering pipeline wants before thresholding
    across heterogeneous strata.

    Appends (n_group, mean_x1eK, dev_x1eK) to every input row, where
    mean_x1eK = floor(sum * scale / n) and
    dev_x1eK  = floor((x * n - sum) * scale / n)
    over exact bigint sums — deviation-from-mean in fixed point, computed
    without a single float, so the output is bitwise reproducible in any
    engine (the cross-engine rounding trap class, BASELINE.md). A
    std-division variant would need float sqrt; deviation x group-n is
    the rank-preserving form that stays exact.

    Floor division is (a - pmod(a, n)) div n — pure bigint arithmetic
    end-to-end (pmod's remainder is non-negative, the adjusted numerator
    exactly divisible, and trunc of an exact multiple equals floor for
    any sign), so the quotient is exact all the way to the 2^63 overflow
    bound — no 2^53 double-mantissa cliff. Overflow bound: |x| * n *
    scale must stay under 2^63 — e.g. 10^4-char docs x 10^9-doc groups x
    10^4 scale is 10^17 < 9.2e18.

    Scale shape: one tiny per-group aggregation (n_groups rows after
    map-side combine) broadcast-joined back onto the stream — the big
    side is never shuffled."""
    x = F.col(value_col).cast("bigint")
    stats = df.groupBy(group_col).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_group"),
        F.sum(x).alias("__sum"),
    )

    def _fdiv(c: str) -> Column:
        return F.expr(f"(({c}) - pmod({c}, n_group)) div n_group")

    joined = (
        df.join(F.broadcast(stats), group_col)
        .withColumn("__nm", F.col("__sum") * F.lit(scale))
        .withColumn("__nd", (x * F.col("n_group") - F.col("__sum")) * F.lit(scale))
    )
    return joined.select(
        *df.columns,
        "n_group",
        _fdiv("__nm").alias(f"mean_x{scale}"),
        _fdiv("__nd").alias(f"dev_x{scale}"),
    )


def group_mad_outliers(
    df: DataFrame,
    value_col: str,
    group_col: str,
    k: float = 3.0,
) -> DataFrame:
    """Robust per-group outlier flags: median + median-absolute-deviation
    (the robust z-score a quality pipeline prefers over mean/std, which
    one giant document can drag arbitrarily). Appends
    (med, mad, is_outlier) to every row: is_outlier = |x - med| > k*mad.

    EXACT medians (Spark ``percentile``, sort-based), not
    ``approx_percentile`` — the oracle-reproducibility rule for registry
    operators. Determinism across engines: integer inputs make the
    interpolated median land on halves and the MAD on quarters, both
    exactly representable doubles, so the flag's comparison is exact
    (no rounding-trap exposure). Cost: exact percentile sorts each
    group's values on one reducer — right for the datasheet/profiling
    context this targets; a streaming-scale variant would swap in a
    fixed-width histogram sketch and accept approximation.

    Two tiny per-group relations broadcast back; the big side is
    scanned twice (once per statistic round) and never shuffled."""
    x = F.col(value_col).cast("double")
    med = df.groupBy(group_col).agg(
        F.percentile(x, F.lit(0.5)).alias("med")
    )
    with_med = df.join(F.broadcast(med), group_col)
    mad = (
        with_med.groupBy(group_col)
        .agg(
            F.percentile(
                F.abs(x - F.col("med")), F.lit(0.5)
            ).alias("mad")
        )
    )
    return (
        with_med.join(F.broadcast(mad), group_col)
        .select(
            *df.columns,
            "med",
            "mad",
            (F.abs(x - F.col("med")) > F.lit(float(k)) * F.col("mad"))
            .cast("int")
            .alias("is_outlier"),
        )
    )


def distinct_sketches(
    df: DataFrame,
    key_cols: list[str],
    value_col: str,
    lg_k: int = 12,
) -> DataFrame:
    """Per-key MERGEABLE distinct-count sketches (Apache DataSketches HLL
    via Spark's ``hll_sketch_agg``): returns (key_cols..., sketch:
    binary, est: bigint). The sketch column is the point — an exact
    distinct count cannot be maintained incrementally (it needs the full
    value set), but sketches written per ingest batch can be UNIONED
    later without ever rescanning history: the incremental form of the
    corpus-datasheet "distinct vocabulary / distinct authors" numbers.

    Accuracy is the standard HLL bound (~1.6%/sqrt(2^lg_k) at lg_k=12:
    ~2.5% rel. std. error; exact below the sparse-mode threshold). Union
    of per-batch sketches equals the one-pass sketch BY CONSTRUCTION —
    bit-equal estimates, pinned by test — so incremental maintenance
    costs no accuracy beyond the sketch itself."""
    return df.groupBy(*key_cols).agg(
        F.hll_sketch_agg(F.col(value_col), F.lit(lg_k)).alias("sketch")
    ).withColumn("est", F.hll_sketch_estimate("sketch"))


def merge_distinct_sketches(
    sketches: DataFrame, key_cols: list[str]
) -> DataFrame:
    """Union per-key sketches across snapshots/batches -> same schema as
    ``distinct_sketches``. This is the maintenance job's whole read: the
    per-batch sketch table, never the raw history."""
    return sketches.groupBy(*key_cols).agg(
        F.hll_union_agg("sketch").alias("sketch")
    ).withColumn("est", F.hll_sketch_estimate("sketch"))


def group_trend(
    df: DataFrame,
    value_col: str,
    group_col: str,
    order: tuple[str, ...],
    scale: int = 100,
) -> DataFrame:
    """Per-group linear-regression slope of a value over the group's
    event SEQUENCE — "is this user's engagement rising or falling",
    "is this source's doc quality drifting" — with INTEGER-EXACT
    arithmetic: no float accumulation, bitwise reproducible anywhere
    (the cross-engine rounding trap class, BASELINE.md).

    x is the 1-based event index in ``order`` (sequence position, not
    wall time — slope per event step; evenly spaced by construction so
    the regression is well-conditioned and pure integer). y is
    round(value * scale) as bigint (fixed-point, order-independent
    sums). Returns per group:
      n            events
      slope_num  = n * Σxy − Σx * Σy
      slope_den  = n * Σx² − (Σx)²      (0 when n == 1)
    NULL values are excluded before indexing — x counts OBSERVED
    events, so a group of all-NULL values returns no row.
    The slope is slope_num/slope_den in y-fixed-point units per event —
    kept as the exact integer pair rather than a lossy float division,
    like group_standardize keeps deviation x n. slope_den depends only
    on n: callers comparing groups of equal size can rank on slope_num
    directly.

    Overflow bound: the largest term is n * Σxy ≤ max|y| * n³ / 2, so
    exactness needs max|value| * scale * n³ / 2 < 2^63 — 10^4-event
    groups with fixed-point values up to 10^6 are safe (5x10^17), 10^5
    events are not. The bound is ENFORCED in-plan per group (max|y| is
    one more column in the same aggregation): an unsafe group raises
    with an actionable message; Spark 4's ANSI mode independently
    backstops any per-row product or running-sum overflow with
    ARITHMETIC_OVERFLOW — the contract is exact-or-loud either way,
    never a silent wraparound. Pre-aggregate long groups per time bucket
    first (the resample operator) or lower ``scale``.

    Scale shape: one shuffle on the group for the row_number window,
    then one map-side-combinable aggregation — the same two-exchange
    cost as any per-group sequence feature."""
    w = Window.partitionBy(group_col).orderBy(*[F.col(c) for c in order])
    x = F.row_number().over(w).cast("bigint")
    y = F.round(F.col(value_col) * F.lit(scale)).cast("bigint")
    # NULL values carry no observation: excluded BEFORE the sequence
    # index, so x is the position among OBSERVED values (a NULL row
    # must not occupy a regression x-slot whose y the sums then skip)
    prepped = df.filter(F.col(value_col).isNotNull()).select(
        F.col(group_col), x.alias("__x"), y.alias("__y")
    )
    agg = prepped.groupBy(group_col).agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("__x").alias("__sx"),
        F.sum("__y").alias("__sy"),
        F.sum(F.col("__x") * F.col("__y")).alias("__sxy"),
        F.sum(F.col("__x") * F.col("__x")).alias("__sxx"),
        F.max(F.abs(F.col("__y"))).alias("__maxy"),
    )
    # in-plan overflow guard: max|y| * n^3 / 2 must stay under 2^63.
    # Rearranged to avoid overflowing the guard itself: compare in double
    # (a conservative check needs no exactness — 2^62 leaves a 2x margin
    # for the double's 53-bit mantissa slack).
    safe = (
        F.col("__maxy").cast("double")
        * F.pow(F.col("n").cast("double"), F.lit(3.0))
        / F.lit(2.0)
    ) < F.lit(float(2**62))
    guard = F.when(safe, F.col("n")).otherwise(
        F.raise_error(
            F.concat(
                F.lit("group_trend: group "),
                F.col(group_col).cast("string"),
                F.lit(" exceeds the exact-arithmetic bound (n="),
                F.col("n").cast("string"),
                F.lit(", max|y|="),
                F.col("__maxy").cast("string"),
                F.lit(") — pre-aggregate per time bucket or lower scale"),
            )
        )
    )
    return agg.select(
        group_col,
        guard.alias("n"),
        (F.col("n") * F.col("__sxy") - F.col("__sx") * F.col("__sy"))
        .cast("bigint")
        .alias("slope_num"),
        (F.col("n") * F.col("__sxx") - F.col("__sx") * F.col("__sx"))
        .cast("bigint")
        .alias("slope_den"),
    )


def population_drift(
    ref: DataFrame,
    new: DataFrame,
    value_col: str,
    n_bins: int = 10,
) -> DataFrame:
    """Distribution-drift table between a REFERENCE corpus and a NEW
    corpus over one numeric column — the integer core of PSI
    (population stability index) monitoring, the check a training-data
    pipeline runs before admitting a new crawl snapshot. Returns per
    bin: (bin, lo, hi, ref_n, new_n, ref_total, new_total); PSI's
    Σ (p_new − p_ref)·ln(p_new/p_ref) is one float expression away for
    the caller — counts stay integers end-to-end, bitwise reproducible.

    Bin edges are the reference's equi-depth boundaries computed with
    RANK arithmetic, not interpolated percentiles: boundary k is the
    smallest reference value whose (row_number−1)·n_bins div n reaches
    bin k — deterministic under ties and exact in any engine. Bin k
    covers [lo_k, lo_{k+1}) except the last, which is unbounded above;
    values below lo_0 land in bin 0 (the standard PSI edge convention).
    BOTH corpora are counted by this same value rule, so every row is
    counted exactly once and a value equal to a shared boundary binds
    to the highest bin whose lo it matches — in ref_n and new_n alike.
    Under heavy ties (lo, hi) may overlap at the boundary value; they
    label the bin, the value rule above is the counting contract.
    NULL values are excluded from BOTH corpora (they have no position
    in a value distribution; a NULL would otherwise bind to bin 0
    silently) — monitor null-rate as its own signal.

    Scale shape: the reference reduces to per-VALUE counts (distributed
    aggregation), boundary math runs over that distinct-value relation
    only (its one ordered window covers |distinct values| rows — the
    metric's domain, never the corpus), and the n_bins-row edge table
    broadcasts into ONE aggregation per corpus; neither corpus is ever
    globally sorted or shuffled beyond its count aggregation."""
    if n_bins < 1:
        raise ValueError("population_drift: n_bins must be >= 1")
    # Boundary math runs over the DISTINCT-VALUE relation, never a
    # global row_number over the corpus (a single-partition sort of
    # every reference row — the scale-killer this formulation exists to
    # avoid). Per-value counts aggregate distributed; the one ordered
    # window covers only |distinct values| aggregated rows (bounded by
    # the metric's domain, not the corpus). Rank identities: value v
    # with per-value count c and cumulative count cum occupies 0-based
    # ranks [cum-c, cum-1]; bin k's first rank is r_k = ceil(k*n/B), so
    #   lo_k = min v with cum > r_k      (the value holding rank r_k)
    #   hi_k = min v with cum > r_{k+1}-1 (the value holding the bin's
    #                                      last rank; r_B = n)
    # — exactly row_number binning, with only integer div/ceil-div.
    B = int(n_bins)
    per_v = (
        ref.select(F.col(value_col).alias("v"))
        .filter(F.col("v").isNotNull())
        .groupBy("v")
        .agg(F.count(F.lit(1)).cast("bigint").alias("__c"))
    )
    wv = Window.orderBy(F.col("v")).rowsBetween(
        Window.unboundedPreceding, 0
    )
    cum_v = per_v.withColumn("__cum", F.sum("__c").over(wv))
    n_ref = per_v.select(F.sum("__c").cast("bigint").alias("__n"))
    ks = F.explode(F.array(*[F.lit(k) for k in range(B)])).alias("__k")
    cand = cum_v.crossJoin(F.broadcast(n_ref)).select(
        "v", "__cum", "__n", ks
    )
    r_lo = F.expr(f"(__k * __n + {B} - 1) div {B}")
    r_hi_next = F.expr(
        f"case when __k = {B - 1} then __n "
        f"else ((__k + 1) * __n + {B} - 1) div {B} end"
    )
    edges_plan = (
        cand.groupBy(F.col("__k").alias("__bin"))
        .agg(
            F.min(F.when(F.col("__cum") > r_lo, F.col("v"))).alias("lo"),
            F.min(
                F.when(F.col("__cum") > r_hi_next - F.lit(1), F.col("v"))
            ).alias("hi"),
        )
    )
    # The edge table is n_bins BOUNDED rows of metadata — materialize it
    # once driver-side (the budget_sample/packing precedent) instead of
    # leaving a lazy subtree that every downstream reference would
    # re-evaluate (each re-evaluation re-scans the whole reference
    # corpus). Downstream, edges is a local relation: free to reference.
    spark = ref.sparkSession
    edge_rows = edges_plan.collect()
    if not edge_rows:
        # an empty (or all-NULL) reference yields zero edge rows, and the
        # final plan starts from edges — drift monitoring against a
        # misconfigured reference would silently report NOTHING; refuse
        # loudly instead (the cross_corpus_near_pairs empty-cache posture)
        raise ValueError(
            "population_drift: reference corpus has no non-NULL "
            f"'{value_col}' values — empty/misconfigured reference?"
        )
    edges = spark.createDataFrame(edge_rows, schema=edges_plan.schema)

    def _binned_counted(df: DataFrame, out: str) -> DataFrame:
        b = F.broadcast(edges.select(F.col("__bin"), F.col("lo")))
        per_v = (
            df.select(F.col(value_col).alias("v"))
            .filter(F.col("v").isNotNull())
            .groupBy("v")
        ).agg(
            F.count(F.lit(1)).cast("bigint").alias("__cnt")
        )
        return (
            per_v.join(b, F.col("v") >= F.col("lo"), "left")
            .groupBy("v", "__cnt")
            .agg(F.coalesce(F.max("__bin"), F.lit(0)).alias("bin"))
            .groupBy("bin")
            .agg(F.sum("__cnt").cast("bigint").alias(out))
        )

    ref_b = _binned_counted(ref, "ref_n")
    new_b = _binned_counted(new, "new_n")
    # totals derive from the n_bins-row joined result via an
    # unpartitioned window — over n_bins rows, not the corpus — so each
    # corpus is scanned exactly once in the whole plan
    wt = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    return (
        edges.select(F.col("__bin").alias("bin"), "lo", "hi")
        .join(ref_b, "bin", "left")
        .join(new_b, "bin", "left")
        .select(
            F.col("bin").cast("bigint").alias("bin"),
            F.col("lo").cast("bigint").alias("lo"),
            F.col("hi").cast("bigint").alias("hi"),
            F.coalesce("ref_n", F.lit(0)).cast("bigint").alias("ref_n"),
            F.coalesce("new_n", F.lit(0)).cast("bigint").alias("new_n"),
        )
        .withColumn("ref_total", F.sum("ref_n").over(wt).cast("bigint"))
        .withColumn("new_total", F.sum("new_n").over(wt).cast("bigint"))
    )


def cohort_retention(
    df: DataFrame,
    entity_col: str,
    ts_col: str = "ts",
    bucket_s: int = 604_800,
) -> DataFrame:
    """Cohort retention table: entities are cohorted by the time bucket
    of their FIRST activity, and each (cohort, offset) cell counts how
    many of that cohort's entities were active ``offset`` buckets later
    — the curve every data-collection / engagement analysis reads
    ("of the users whose first event was in week W, how many were still
    active in week W+k"). Offset 0 is the cohort size; retention RATE
    is the caller's float (n_active / cohort size at offset 0), kept
    out of the pipeline so every cell stays an exact integer.

    Bucket index is pre-1970-safe integer floor division over epoch
    microseconds (the (x − pmod) div trick from bounded_range_join).

    Scale shape: ONE shuffle on the entity — min(bucket) and the
    entity's distinct active-bucket set come out of the same hash
    aggregation (collect_set is bounded by corpus-span / bucket_s, a
    few hundred for years of weekly buckets, NOT by the entity's event
    count) — then the explode + (cohort, offset) count is map-side
    combinable into a result no bigger than cohorts × span. No join at
    all: the cohort label rides the same row as the activity set."""
    if bucket_s < 1:
        raise ValueError("cohort_retention: bucket_s must be >= 1 second")
    from tgist_features_spark.functions.timeu import us

    w = int(bucket_s) * 1_000_000
    u = us(F.col(ts_col))
    bucket = F.expr(f"(__u - pmod(__u, {w})) div {w}")
    per_entity = (
        df.select(F.col(entity_col).alias("__e"), u.alias("__u"))
        .withColumn("__b", bucket)
        .groupBy("__e")
        .agg(
            F.min("__b").alias("cohort_bucket"),
            F.collect_set("__b").alias("__bs"),
        )
    )
    return (
        per_entity.select(
            "cohort_bucket", F.explode("__bs").alias("__active")
        )
        .select(
            "cohort_bucket",
            (F.col("__active") - F.col("cohort_bucket")).alias("bucket_offset"),
        )
        .groupBy("cohort_bucket", "bucket_offset")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_active"))
    )


def group_winsorize(
    df: DataFrame,
    value_col: str,
    group_col: str,
    id_col: str,
    lo_pct: int = 5,
    hi_pct: int = 95,
) -> DataFrame:
    """Per-group winsorization at EXACT order statistics: clamp each
    row's value to the group's [lo_pct, hi_pct] percentile VALUES,
    where the percentile is the group_cdf rank convention — the value
    at 1-based rank ((n-1)·p) div 100 + 1 under the total order
    (value, id). No interpolation, no float percentile estimators, so
    the clamped output is bit-identical in any engine (the
    interpolating percentile() builtins disagree across engines at
    fractional ranks; the discrete rank rule cannot).

    Returns the input's (id, group, value) plus ``value_wins`` — the
    clamped value. NULL-valued rows are EXCLUDED from ranks AND from
    the output (the group_cdf NULL contract: engines disagree on NULL
    sort order, and a NULL clamps to nothing). Clamping is the
    standard heavy-tail taming step before means/regressions on corpus
    statistics; pair with group_mad_outliers when you want flags
    instead of edits.

    Scale shape: one shuffle on the group for the rank window; the two
    boundary rows per group are filtered from the SAME windowed
    relation and broadcast back (a |groups|-row join) — the big side
    is never reshuffled. Like stratified_kfold, a hot group serializes
    its sort through one task: the documented price of exact order
    statistics (the sketch alternative is approx_percentile, named
    here so the trade is a choice, not an accident)."""
    if not (0 <= lo_pct <= hi_pct <= 100):
        raise ValueError("group_winsorize: need 0 <= lo_pct <= hi_pct <= 100")
    w = Window.partitionBy(group_col).orderBy(F.col(value_col), F.col(id_col))
    ranked = (
        # NULL-valued rows are EXCLUDED, the group_cdf contract: a NULL
        # has no rank and engines disagree on NULL sort order
        df.filter(F.col(value_col).isNotNull())
        .select(
            F.col(id_col), F.col(group_col), F.col(value_col)
        )
        .withColumn("__rn", F.row_number().over(w).cast("bigint"))
        .withColumn(
            "__n", F.count(F.lit(1)).over(Window.partitionBy(group_col))
        )
    )
    lo_rank = F.expr(f"(__n - 1) * {lo_pct} div 100") + 1
    hi_rank = F.expr(f"(__n - 1) * {hi_pct} div 100") + 1
    bounds = (
        ranked.withColumn(
            "__lo_v", F.when(F.col("__rn") == lo_rank, F.col(value_col))
        )
        .withColumn(
            "__hi_v", F.when(F.col("__rn") == hi_rank, F.col(value_col))
        )
        .groupBy(group_col)
        .agg(
            F.max("__lo_v").alias("__lo"),
            F.max("__hi_v").alias("__hi"),
        )
    )
    return (
        ranked.join(F.broadcast(bounds), group_col)
        .select(
            id_col,
            group_col,
            value_col,
            F.least(
                F.greatest(F.col(value_col), F.col("__lo")), F.col("__hi")
            ).alias("value_wins"),
        )
    )


def group_weighted_median(
    df: DataFrame,
    value_col: str,
    weight_col: str,
    group_col: str,
    id_col: str,
) -> DataFrame:
    """Per-group EXACT weighted median over integer weights: the
    smallest value whose cumulative weight reaches half the group's
    total (the lower weighted median — a pinned convention, not an
    interpolation), computed entirely in bigint arithmetic so the
    result is bit-identical in any engine. This is the
    token-weighted "typical document" statistic an unweighted median
    gets wrong whenever length and count diverge (the usual case).

    NULL or negative weights are REFUSED in-plan (raise_error), the
    budget_sample posture: a silently skipped weight biases the median
    with no error to notice. NULL values are excluded with their
    weight (the group_cdf NULL contract).

    Returns one row per group: (group, wmedian, total_weight, n_rows).

    Scale shape: one shuffle on the group; the cumulative-weight window
    and the boundary pick (min value where 2·cum >= total) fold into
    the same partitioning — a hot group serializes its sort through one
    task, the exact-order-statistic price documented on
    group_winsorize, with approx_percentile as the named sketch
    alternative."""
    w_ok = F.when(
        F.col(weight_col).isNotNull() & (F.col(weight_col) >= 0),
        F.col(weight_col).cast("bigint"),
    ).otherwise(
        F.raise_error(
            F.lit(f"group_weighted_median: NULL or negative {weight_col}")
        )
    )
    base = (
        df.filter(F.col(value_col).isNotNull())
        .select(
            F.col(group_col),
            F.col(value_col),
            F.col(id_col),
            w_ok.alias("__w"),
        )
    )
    win = (
        Window.partitionBy(group_col)
        .orderBy(F.col(value_col), F.col(id_col))
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    wg = Window.partitionBy(group_col)
    cum = (
        base.withColumn("__cum", F.sum("__w").over(win))
        .withColumn("__tot", F.sum("__w").over(wg))
        .withColumn("__n", F.count(F.lit(1)).over(wg))
    )
    return (
        cum.filter(F.col("__cum") * 2 >= F.col("__tot"))
        .groupBy(group_col)
        .agg(
            F.min(F.col(value_col)).alias("wmedian"),
            F.max("__tot").cast("bigint").alias("total_weight"),
            F.max("__n").cast("bigint").alias("n_rows"),
        )
    )


def count_min_sketches(
    df: DataFrame,
    key_cols: list[str],
    value_col: str,
    weight_col: str | None = None,
    depth: int = 4,
    width: int = 1024,
    seed: str = "cms",
) -> DataFrame:
    """Per-key MERGEABLE count-min sketches, kept as a RELATION of
    (key_cols..., cm_depth, cm_pos, cm_cnt) counter cells rather than a
    binary blob — the frequency companion to ``distinct_sketches``:
    exact per-value frequencies cannot be maintained incrementally over
    an unbounded value domain, but CMS cells written per ingest batch
    MERGE by plain addition, so the datasheet's heavy-hitter panel
    updates with each increment instead of refolding the corpus.

    Each input row increments ``depth`` cells: for row r of the sketch
    matrix, position = pmod(xxhash64(value, seed, r), width) — the
    standard d-row/w-column CMS with the hash family indexed by the row
    number. Estimation (``cms_estimate``) takes the MIN across rows: an
    overestimate by construction (collisions only ADD), within
    e·N/width of truth with probability 1 − e^-depth per classic CMS
    analysis. The relation form keeps everything pure Catalyst: build
    is one explode(depth) + one hash aggregation, merge is a UNION +
    the same aggregation (cell-wise addition — tested bit-equal to the
    one-pass sketch), estimation is one broadcast-able join. At most
    depth·width cells survive per key regardless of corpus size.

    ``weight_col`` (bigint, NULL/negative refused like budget_sample)
    weights increments; default 1 per row."""
    if depth < 1 or width < 2:
        raise ValueError("count_min_sketches: need depth >= 1, width >= 2")
    if weight_col is None:
        w = F.lit(1).cast("bigint")
    else:
        w = F.when(
            F.col(weight_col).isNotNull() & (F.col(weight_col) >= 0),
            F.col(weight_col).cast("bigint"),
        ).otherwise(
            F.raise_error(
                F.lit(f"count_min_sketches: NULL or negative {weight_col}")
            )
        )
    rows = df.select(
        *[F.col(k) for k in key_cols],
        F.col(value_col).cast("string").alias("__v"),
        w.alias("__w"),
    ).withColumn(
        "cm_depth", F.explode(F.sequence(F.lit(0), F.lit(depth - 1)))
    )
    pos = F.pmod(
        F.xxhash64(F.col("__v"), F.lit(seed), F.col("cm_depth")), F.lit(width)
    )
    return (
        rows.withColumn("cm_pos", pos.cast("bigint"))
        .groupBy(*key_cols, "cm_depth", "cm_pos")
        .agg(F.sum("__w").cast("bigint").alias("cm_cnt"))
    )


def merge_count_min_sketches(
    sketches: list[DataFrame], key_cols: list[str]
) -> DataFrame:
    """Cell-wise addition of CMS relations built with IDENTICAL
    (depth, width, seed) — incremental maintenance: union the per-batch
    sketches and re-aggregate. Equal (bit-for-bit) to the one-pass
    sketch over the concatenated input (tested); checking parameter
    agreement is the caller's contract, exactly as with
    merge_distinct_sketches."""
    if not sketches:
        raise ValueError("merge_count_min_sketches: need at least one sketch")
    out = sketches[0]
    for s in sketches[1:]:
        out = out.unionByName(s)
    return out.groupBy(*key_cols, "cm_depth", "cm_pos").agg(
        F.sum("cm_cnt").cast("bigint").alias("cm_cnt")
    )


def cms_estimate(
    sketch: DataFrame,
    queries: DataFrame,
    key_cols: list[str],
    value_col: str,
    depth: int = 4,
    width: int = 1024,
    seed: str = "cms",
) -> DataFrame:
    """Frequency estimates for (key, value) query rows against a CMS
    relation built with the SAME (depth, width, seed): min across the
    depth rows, absent cells counting as 0 (a value whose every cell is
    untouched truly has count 0). Returns the query rows plus ``est``.
    The probe explodes each query into its depth cells and left-joins
    the sketch — broadcastable from either side; the corpus itself is
    never touched."""
    probes = queries.select(
        *[F.col(k) for k in key_cols],
        F.col(value_col),
        F.col(value_col).cast("string").alias("__v"),
    ).withColumn(
        "cm_depth", F.explode(F.sequence(F.lit(0), F.lit(depth - 1)))
    ).withColumn(
        "cm_pos",
        F.pmod(
            F.xxhash64(F.col("__v"), F.lit(seed), F.col("cm_depth")),
            F.lit(width),
        ).cast("bigint"),
    )
    joined = probes.join(sketch, [*key_cols, "cm_depth", "cm_pos"], "left")
    return (
        joined.groupBy(*key_cols, value_col)
        .agg(
            F.min(F.coalesce(F.col("cm_cnt"), F.lit(0)))
            .cast("bigint")
            .alias("est")
        )
    )


def group_heavy_hitters(
    df: DataFrame,
    group_col: str,
    value_col: str,
    k: int = 10,
) -> DataFrame:
    """Exact top-k most frequent values per group with a DETERMINISTIC
    tie rule (count desc, then value asc) — the ranked truncation every
    per-stratum report reads ("top tools per conversation cohort, top
    tokens per language"), and the exact counterpart the CMS estimates
    (count_min_sketches) are checked against on corpora small enough to
    afford it.

    NULL values are excluded (a NULL is not a value, and engines
    disagree on NULL ordering — the group_cdf contract).

    Scale shape: ONE real shuffle — the (group, value) count
    aggregation (map-side combinable, output bounded by the distinct
    domain, not the corpus); the rank window then runs over that
    already-aggregated relation, where a second (group)-keyed exchange
    moves only distinct-value rows. No per-group sort ever sees raw
    corpus rows."""
    if k < 1:
        raise ValueError("group_heavy_hitters: k must be >= 1")
    counts = (
        df.filter(F.col(value_col).isNotNull())
        .groupBy(group_col, value_col)
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    )
    w = Window.partitionBy(group_col).orderBy(
        F.col("n").desc(), F.col(value_col).asc()
    )
    return (
        counts.withColumn("rank", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rank") <= k)
    )


def group_moments(
    df: DataFrame,
    value_col: str,
    key_cols: list[str],
    scale: int = 100,
) -> DataFrame:
    """A17: per-key EXACT mergeable moments profile — (n_obs, n_null,
    sum_x, sumsq_x, min_x, max_x, var_num) over fixed-point values
    x = round(value * scale) as pure bigint. The exact third leg of the
    incremental-datasheet trio: HLL sketches approximate distincts
    (distinct_sketches), CMS approximates frequencies
    (count_min_sketches); counts/sums/extrema/variance need NO
    approximation to be mergeable — integer sums and min/max are
    associative and order-independent, so per-batch profiles merged with
    ``merge_group_moments`` equal the one-pass profile BIT FOR BIT
    (tested), and the datasheet's mean/variance panel updates per ingest
    batch without rescanning history.

    var_num = n*sumsq - sum^2 is the exact variance numerator
    (variance = var_num / n^2 / scale^2, left to the reading edge — the
    division is where floats enter, so it stays out of the stored
    profile). NULL values hold no weight in any statistic but are
    COUNTED (n_null) — a drift in null-rate is itself a datasheet
    signal; all-NULL keys keep sum/sumsq = 0 and min/max = NULL.

    Overflow bound: n * sumsq must stay under 2^63 — at scale=100,
    values in [-1e4, 1e4] give sumsq <= 1e12 per row, so ~3e6 rows per
    key per batch at the extreme, far more for typical magnitudes;
    merge adds bigint sums, so the same bound applies corpus-wide.
    Widen by lowering ``scale`` when the domain is large.

    Scale shape: ONE map-side-combinable hash aggregation (partial
    combine makes per-partition state a handful of bigints per key);
    output rows = distinct keys. Merge is a union + the same
    aggregation over profile rows only — the raw history is never
    re-read."""
    x = F.round(F.col(value_col).cast("double") * F.lit(scale)).cast("bigint")
    base = df.groupBy(*key_cols).agg(
        F.count(x).cast("bigint").alias("n_obs"),
        (F.count(F.lit(1)) - F.count(x)).cast("bigint").alias("n_null"),
        F.coalesce(F.sum(x), F.lit(0)).cast("bigint").alias("sum_x"),
        F.coalesce(F.sum(x * x), F.lit(0)).cast("bigint").alias("sumsq_x"),
        F.min(x).cast("bigint").alias("min_x"),
        F.max(x).cast("bigint").alias("max_x"),
    )
    return base.withColumn(
        "var_num", F.col("n_obs") * F.col("sumsq_x") - F.col("sum_x") * F.col("sum_x")
    )


def merge_group_moments(
    profiles: list[DataFrame], key_cols: list[str]
) -> DataFrame:
    """Merge per-batch moments profiles built with the SAME (value_col,
    scale): integer sums add, extrema take min/max (NULL-skipping, so a
    batch with an all-NULL key merges cleanly), var_num is recomputed
    from the merged sums. Bit-equal to the one-pass profile over the
    concatenated input — the same posture as merge_count_min_sketches,
    with parameter agreement the caller's contract."""
    if not profiles:
        raise ValueError("merge_group_moments: need at least one profile")
    out = profiles[0]
    for p in profiles[1:]:
        out = out.unionByName(p)
    merged = out.groupBy(*key_cols).agg(
        F.sum("n_obs").cast("bigint").alias("n_obs"),
        F.sum("n_null").cast("bigint").alias("n_null"),
        F.sum("sum_x").cast("bigint").alias("sum_x"),
        F.sum("sumsq_x").cast("bigint").alias("sumsq_x"),
        F.min("min_x").cast("bigint").alias("min_x"),
        F.max("max_x").cast("bigint").alias("max_x"),
    )
    return merged.withColumn(
        "var_num", F.col("n_obs") * F.col("sumsq_x") - F.col("sum_x") * F.col("sum_x")
    )


def ks_drift(
    ref: DataFrame,
    new: DataFrame,
    value_col: str,
    n_bins: int = 10,
) -> DataFrame:
    """A18: binned Kolmogorov-Smirnov drift statistic — the second
    drift lens beside PSI (population_drift): PSI reads per-bin mass
    RATIOS (sensitive to tail reshuffling), KS reads the maximum CDF
    gap (sensitive to location/scale shift a ratio sum can smear
    out). Returns ONE row: (ks_num, denom, worst_bin, ref_total,
    new_total), where the statistic's exact value is ks_num / denom
    with ks_num = max_k |cum_ref_k * new_total - cum_new_k * ref_total|
    and denom = ref_total * new_total — pure bigint cross-products, no
    division in-plan, bitwise reproducible (the group_trend fraction
    convention). worst_bin is the smallest bin index attaining the
    maximum (tie rule pinned).

    Overflow bound: cum * total <= ref_total * new_total < 2^63 holds
    through ~3e9 x 3e9 rows; beyond that, pre-aggregate per value or
    sample — documented, not silently truncated.

    Scale shape: everything after population_drift's binned counts
    (its cost profile applies) runs over the n_bins-row relation — a
    cumsum window and a 1-row argmax over at most n_bins rows."""
    binned = population_drift(ref, new, value_col, n_bins)
    w = (
        Window.orderBy("bin").rowsBetween(Window.unboundedPreceding, 0)
    )
    cum = binned.select(
        "bin",
        "ref_total",
        "new_total",
        F.sum("ref_n").over(w).alias("cum_ref"),
        F.sum("new_n").over(w).alias("cum_new"),
    )
    gap = cum.select(
        "bin",
        "ref_total",
        "new_total",
        F.abs(
            F.col("cum_ref") * F.col("new_total")
            - F.col("cum_new") * F.col("ref_total")
        ).alias("g"),
    )
    return (
        gap.orderBy(F.col("g").desc(), F.col("bin").asc())
        .limit(1)
        .select(
            F.col("g").cast("bigint").alias("ks_num"),
            (F.col("ref_total") * F.col("new_total"))
            .cast("bigint")
            .alias("denom"),
            F.col("bin").cast("bigint").alias("worst_bin"),
            F.col("ref_total").cast("bigint").alias("ref_total"),
            F.col("new_total").cast("bigint").alias("new_total"),
        )
    )


def group_spearman(
    df: DataFrame,
    x_col: str,
    y_col: str,
    group_col: str,
    tiebreak: str,
) -> DataFrame:
    """A19: per-group Spearman rank correlation kept EXACT — the
    "do these two quality signals agree" audit (length vs score,
    recency vs engagement) without Pearson's outlier fragility or any
    float accumulation. Returns per group (n_pairs, sum_d2, rho_num,
    rho_den) with rho = rho_num / rho_den = 1 − 6·Σd²/(n(n²−1)) —
    pure bigint, the group_trend fraction convention; the division is
    the reader's.

    Ranks are row_number under the PINNED total order
    (value, tiebreak) — deterministic and engine-reproducible. Under
    heavy ties this is "Spearman over the pinned order", not the
    tie-averaged variant (average ranks are fractional and engines
    disagree on half-rank rounding); the tiebreak column makes the
    choice explicit. Rows with a NULL in either variable are excluded
    (the group_cdf NULL contract); groups with n < 2 return rho_den=0
    (a non-answer, not a fake correlation — time_weighted_avg's
    singleton convention).

    Overflow: n(n²−1) < 2^63 holds to n ≈ 2.1M rows per group; Σd² is
    bounded by n(n²−1)/3, same bound. Scale shape: both rank windows
    share one (group) hash partitioning — one exchange, two in-
    partition sorts — then a combinable aggregation."""
    nn = df.filter(F.col(x_col).isNotNull() & F.col(y_col).isNotNull())
    wx = Window.partitionBy(group_col).orderBy(
        F.col(x_col).asc(), F.col(tiebreak).asc()
    )
    wy = Window.partitionBy(group_col).orderBy(
        F.col(y_col).asc(), F.col(tiebreak).asc()
    )
    ranked = nn.select(
        F.col(group_col),
        F.row_number().over(wx).cast("bigint").alias("__rx"),
        F.row_number().over(wy).cast("bigint").alias("__ry"),
    )
    d = F.col("__rx") - F.col("__ry")
    agg = ranked.groupBy(group_col).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_pairs"),
        F.sum(d * d).cast("bigint").alias("sum_d2"),
    )
    n = F.col("n_pairs")
    den = n * (n * n - F.lit(1))
    return agg.select(
        group_col,
        "n_pairs",
        "sum_d2",
        (den - F.lit(6) * F.col("sum_d2")).cast("bigint").alias("rho_num"),
        den.cast("bigint").alias("rho_den"),
    )


def rfm_scores(
    df: DataFrame,
    entity_col: str,
    segment_col: str,
    ts_us_col: str,
    amount_col: str,
    n_bins: int = 5,
) -> DataFrame:
    """A21: RFM (recency / frequency / monetary) scoring — the classic
    customer/entity segmentation feature triple, scored per SEGMENT so
    every entity is ranked against its own peer group (the standard
    practice: a wholesale account's "high spend" is a retail account's
    rounding error; global quantiles are the degenerate single-segment
    call).

    Per (entity, segment): recency = whole days between the entity's
    last event and the CORPUS max timestamp (computed in-plan as a
    broadcast 1-row aggregate, never a driver-side scalar), frequency =
    event count, monetary = summed integer amount (callers pass a
    fixed-point column, e.g. cents). Each metric is then equi-depth
    binned within the segment by the (metric, entity) pinned total
    order — bin = rank_m1 * n_bins div n, the equidepth_bins rule, so
    populations differ by at most one BY CONSTRUCTION and the result is
    pure-integer bitwise across engines. Scores: recency bin 0 (most
    recent) gets r_score = n_bins, ascending frequency/monetary bins
    score bin+1 — all scores in 1..n_bins, higher = better. The packed
    ``rfm`` digit composite (r*100 + f*10 + m) requires n_bins <= 9.

    Rows with NULL timestamp or NULL amount are excluded up front (a
    NULL has no rank and engines disagree on NULL ordering — the
    group_cdf contract).

    Scale shape: one map-side-combinable aggregation to the per-entity
    relation (|entities| rows, the big shrink), a broadcast 1-row max,
    then ONE shuffle on the segment reused by all three ranking windows
    (same partitioning -> Catalyst plans a single Exchange with three
    sorts). Segment cardinality bounds window parallelism — for a
    degenerate corpus that is one giant segment, rank via the
    range-partitioned prefix-sum machinery (packing.py) instead.

    Returns (entity, segment, rec_days, n_events, monetary,
    r_score, f_score, m_score, rfm) — all bigint except the
    entity/segment passthroughs.
    """
    if n_bins < 1 or n_bins > 9:
        raise ValueError("rfm_scores: n_bins must be in 1..9")
    base = df.filter(
        F.col(ts_us_col).isNotNull() & F.col(amount_col).isNotNull()
    )
    per_entity = base.groupBy(
        F.col(entity_col), F.col(segment_col)
    ).agg(
        F.max(F.col(ts_us_col)).cast("bigint").alias("__last_us"),
        F.count(F.lit(1)).cast("bigint").alias("n_events"),
        F.sum(F.col(amount_col)).cast("bigint").alias("monetary"),
    )
    corpus_max = base.agg(
        F.max(F.col(ts_us_col)).cast("bigint").alias("__max_us")
    )
    day_us = 86_400_000_000
    scored = (
        per_entity.crossJoin(F.broadcast(corpus_max))
        # both stamps are non-negative epoch micros with last <= max, so
        # div == floor here; rec_days is whole days, truncated
        .withColumn(
            "rec_days",
            F.expr(f"(__max_us - __last_us) div {day_us}"),
        )
        .drop("__last_us", "__max_us")
    )
    wseg = Window.partitionBy(segment_col)

    def _bin(metric: str) -> Column:
        # integer `div`, never the double '/' (the ADVICE floor-div rule)
        return F.expr(f"(__rnk_{metric} * {int(n_bins)}) div __n_seg")

    # the segment count is metric-independent: ONE unordered window
    # (not one per metric — three identical count windows triple the
    # Window nodes for nothing)
    scored = scored.withColumn(
        "__n_seg", F.count(F.lit(1)).over(wseg).cast("bigint")
    )
    for metric in ("rec_days", "n_events", "monetary"):
        w = wseg.orderBy(F.col(metric), F.col(entity_col))
        scored = scored.withColumn(
            f"__rnk_{metric}", F.row_number().over(w).cast("bigint") - F.lit(1)
        )
    scored = (
        scored.withColumn("r_score", F.lit(n_bins) - _bin("rec_days"))
        .withColumn("f_score", _bin("n_events") + F.lit(1))
        .withColumn("m_score", _bin("monetary") + F.lit(1))
    )
    return scored.select(
        F.col(entity_col),
        F.col(segment_col),
        "rec_days",
        "n_events",
        "monetary",
        F.col("r_score").cast("bigint"),
        F.col("f_score").cast("bigint"),
        F.col("m_score").cast("bigint"),
        (
            F.col("r_score") * 100 + F.col("f_score") * 10 + F.col("m_score")
        ).cast("bigint").alias("rfm"),
    )


def quantile_sketches(
    df: DataFrame,
    key_cols: list[str],
    value_col: str,
    alpha: float = 0.01,
) -> DataFrame:
    """A20: per-key MERGEABLE quantile sketches over positive values —
    log-bucket (DDSketch-style) relative-error histograms, completing
    the incremental-datasheet sketch suite (HLL = distinct, CMS =
    frequency, moments = mean/variance, this = percentiles). The
    sketch is the point: exact percentiles need the full sorted value
    set, but per-batch sketches UNION into the corpus sketch without
    rescanning history.

    Design over a KLL/GK compactor, deliberately: a log-bucket
    histogram is ORDER-INSENSITIVE and its merge is a bucket-wise
    count sum — commutative and associative, so merge-of-parts equals
    one-pass BIT-EQUAL by construction (the HLL test posture; a
    compactor-based sketch is merge-order-dependent and can't make
    that promise). The price is the positive-domain contract and
    bucket count ~ log(max/min)/log(gamma) (~2.3k buckets across 10
    decades at alpha=0.01) — the right trade for the datasheet
    metrics this maintains (lengths, latencies, prices: positive,
    bounded decades).

    Bucket rule: gamma = (1+alpha)/(1-alpha); a value x > 0 lands in
    bucket ceil(log_gamma(x)), whose representative
    2*gamma^b/(gamma+1) is within alpha relative error of every value
    in the bucket. NULLs are excluded; x <= 0 is REFUSED in-plan
    (loudly, never silently bucketed — mirror the zorder refusal).

    Scale shape: one map-side-combinable (key, bucket) count, then one
    per-key collect of the (tiny, bounded) bucket array, sorted for a
    canonical representation. No window, no Python, no driver data.

    Returns (key_cols..., buckets: array<struct<b int, c bigint>>
    sorted by b, n: bigint).
    """
    if not 0 < alpha < 0.5:
        raise ValueError("quantile_sketches: alpha must be in (0, 0.5)")
    g = (1.0 + alpha) / (1.0 - alpha)
    x = F.col(value_col).cast("double")
    checked = F.when(x > 0, x).otherwise(
        F.raise_error(
            F.lit(f"quantile_sketches: {value_col} must be > 0 (got <= 0)")
        )
    )
    idx = F.ceil(F.log(checked) / F.log(F.lit(g))).cast("int")
    per_bucket = (
        df.filter(x.isNotNull())
        .groupBy(*key_cols, idx.alias("b"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    )
    return per_bucket.groupBy(*key_cols).agg(
        F.array_sort(F.collect_list(F.struct("b", "c"))).alias("buckets"),
        F.sum("c").cast("bigint").alias("n"),
    )


def merge_quantile_sketches(
    sketches: DataFrame, key_cols: list[str]
) -> DataFrame:
    """Union per-key quantile sketches across snapshots/batches -> same
    schema as ``quantile_sketches``. Bucket-wise sum, then re-collect —
    the whole maintenance read is the sketch table, never raw history.
    Merge equals one-pass bit-equal (commutative bucket counts; pinned
    by test)."""
    ex = sketches.select(*key_cols, F.explode("buckets").alias("e"))
    per = ex.groupBy(*key_cols, F.col("e.b").alias("b")).agg(
        F.sum("e.c").cast("bigint").alias("c")
    )
    return per.groupBy(*key_cols).agg(
        F.array_sort(F.collect_list(F.struct("b", "c"))).alias("buckets"),
        F.sum("c").cast("bigint").alias("n"),
    )


def quantile_sketch_estimate(
    sketches: DataFrame,
    qs: list[float],
    alpha: float = 0.01,
) -> DataFrame:
    """Query quantiles from a sketch relation: for each key and each
    q in ``qs``, the bucket holding 0-based rank floor(q*(n-1)) —
    ranks are EXACT (counts are exact; only the value within a bucket
    is approximated, within alpha relative). Returns the input keys +
    (q double, n bigint, est double). The walk is a JVM lambda fold
    over the (bounded) bucket array — no explode, no shuffle beyond
    the q fan-out projection."""
    if not qs:
        raise ValueError("quantile_sketch_estimate: qs must be non-empty")
    if any(not 0.0 <= q <= 1.0 for q in qs):
        raise ValueError("quantile_sketch_estimate: every q must be in [0, 1]")
    g = (1.0 + alpha) / (1.0 - alpha)
    fan = sketches.withColumn(
        "q", F.explode(F.array(*[F.lit(float(q)) for q in qs]))
    ).withColumn("__r", F.expr("cast(floor(q * (n - 1)) as bigint)"))
    hit = F.expr(
        "aggregate(buckets,"
        " named_struct('cum', cast(0 as bigint), 'hit', cast(null as int)),"
        " (acc, e) -> if(acc.hit is not null, acc,"
        "   if(acc.cum + e.c > __r,"
        "      named_struct('cum', acc.cum + e.c, 'hit', e.b),"
        "      named_struct('cum', acc.cum + e.c, 'hit', acc.hit)))).hit"
    )
    return (
        fan.withColumn("__hit", hit)
        .withColumn(
            "est", F.expr(f"2.0d * power({g!r}d, __hit) / ({g!r}d + 1.0d)")
        )
        .drop("buckets", "__r", "__hit")
    )


def group_auc(
    df: DataFrame,
    score_col: str,
    label_col: str,
    group_col: str,
) -> DataFrame:
    """A22: exact per-group ROC AUC as an integer fraction — the
    model-evaluation primitive (does this score rank positives above
    negatives), via the Mann-Whitney U identity with the standard
    average-rank tie treatment, kept EXACT by working in doubled rank
    units: twice the average rank of a row is
    2*rank_min + (n_ties - 1), an integer, so

        auc_num = sum_over_positives(2*avg_rank) - n_pos*(n_pos+1)
        auc_den = 2 * n_pos * n_neg
        AUC     = auc_num / auc_den

    with no float anywhere — bitwise reproducible in any engine (the
    spearman fraction convention). Groups with a single class report
    auc_den = 0 (undefined AUC, the rho_den=0 convention); NULL score
    or label rows are excluded.

    Scale shape: ONE exchange on the group — the rank window and the
    tie-count window (count over RANGE BETWEEN CURRENT ROW AND CURRENT
    ROW = the peer group) share the same partitioning AND sort, then
    one map-side-combinable aggregation. No (group, score) secondary
    shuffle: the range-frame count replaces it inside the same window
    pass.

    Returns (group, n_pos, n_neg, auc_num, auc_den) — all bigint.
    """
    base = df.filter(
        F.col(score_col).isNotNull() & F.col(label_col).isNotNull()
    ).select(
        F.col(group_col),
        F.col(score_col).alias("__s"),
        F.col(label_col).cast("boolean").cast("int").alias("__y"),
    )
    w = Window.partitionBy(group_col).orderBy(F.col("__s"))
    ranked = base.select(
        F.col(group_col),
        "__y",
        (
            F.lit(2) * F.rank().over(w).cast("bigint")
            + F.count(F.lit(1)).over(w.rangeBetween(0, 0)).cast("bigint")
            - F.lit(1)
        ).alias("__avg2"),
    )
    agg = ranked.groupBy(group_col).agg(
        F.sum("__y").cast("bigint").alias("n_pos"),
        (F.count(F.lit(1)) - F.sum("__y")).cast("bigint").alias("n_neg"),
        F.sum(F.when(F.col("__y") == 1, F.col("__avg2")).otherwise(F.lit(0)))
        .cast("bigint")
        .alias("__s2"),
    )
    return agg.select(
        group_col,
        "n_pos",
        "n_neg",
        (F.col("__s2") - F.col("n_pos") * (F.col("n_pos") + 1))
        .cast("bigint")
        .alias("auc_num"),
        (F.lit(2) * F.col("n_pos") * F.col("n_neg")).cast("bigint").alias(
            "auc_den"
        ),
    )


def loo_target_encode(
    df: DataFrame,
    cat_col: str,
    label_col: str,
) -> DataFrame:
    """A23: LEAKAGE-SAFE target encoding — the classic high-cardinality
    categorical feature (category -> outcome rate) with the
    leave-one-out correction, so a row's own label NEVER enters its own
    feature (the tabular cousin of the engine's point-in-time rule:
    plain target encoding leaks the label and inflates offline metrics;
    LOO is the standard fix). Appends to every row the EXACT fraction

        loo_num = sum(labels in category) - own label
        loo_den = count(category) - 1

    (den = 0 for singleton categories — undefined, the consumer applies
    its prior; the spearman/auc den-0 convention) — integer end-to-end,
    no float rate, bitwise in any engine. NULL categories or labels are
    excluded (a NULL category is not a peer group).

    Scale shape: one map-side-combinable per-category aggregation
    (|categories| rows) broadcast back onto the stream — the big side
    is never shuffled (the group_standardize shape). High-cardinality
    categories are exactly the point: the stats relation stays tiny
    relative to the corpus at any scale.
    """
    base = df.filter(
        F.col(cat_col).isNotNull() & F.col(label_col).isNotNull()
    )
    y = F.col(label_col).cast("boolean").cast("bigint")
    stats = base.groupBy(cat_col).agg(
        F.count(F.lit(1)).cast("bigint").alias("__n_cat"),
        F.sum(y).cast("bigint").alias("__sum_y"),
    )
    return (
        base.join(F.broadcast(stats), cat_col)
        .select(
            *base.columns,
            (F.col("__sum_y") - y).cast("bigint").alias("loo_num"),
            (F.col("__n_cat") - F.lit(1)).cast("bigint").alias("loo_den"),
        )
    )


def calibration_bins(
    df: DataFrame,
    score_col: str,
    label_col: str,
    group_col: str,
    id_col: str,
    n_bins: int = 10,
) -> DataFrame:
    """A24: reliability (calibration) table — per group, equi-depth
    score bins with exact outcome counts: "when the score says decile
    k, how often is the label true". The companion readout to A22's
    AUC (AUC ranks; calibration checks the rate the consumer acts on).

    Bin rule is the equidepth_bins pin: rank by (score, id) — the id
    tiebreak makes bin membership deterministic under ties — and row r
    of n lands in bin (r-1)*n_bins div n, so populations differ by at
    most one BY CONSTRUCTION. Per (group, bin): n_rows, n_pos, and the
    score span — rates are left as exact integer pairs (n_pos/n_rows),
    never a float division. NULL score/label rows are excluded.

    Scale shape: one shuffle for the per-group rank window, then one
    map-side-combinable aggregation over the (group, bin) domain.
    """
    if n_bins < 1:
        raise ValueError("calibration_bins: n_bins must be >= 1")
    base = df.filter(
        F.col(score_col).isNotNull() & F.col(label_col).isNotNull()
    )
    w = Window.partitionBy(group_col).orderBy(
        F.col(score_col), F.col(id_col)
    )
    wg = Window.partitionBy(group_col)
    binned = (
        base.withColumn(
            "__rnk", F.row_number().over(w).cast("bigint") - F.lit(1)
        )
        .withColumn("__n", F.count(F.lit(1)).over(wg).cast("bigint"))
        .withColumn("__bin", F.expr(f"(__rnk * {int(n_bins)}) div __n"))
    )
    return binned.groupBy(
        F.col(group_col), F.col("__bin").alias("bin")
    ).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_rows"),
        F.sum(F.col(label_col).cast("boolean").cast("bigint"))
        .cast("bigint")
        .alias("n_pos"),
        F.min(score_col).cast("bigint").alias("score_min"),
        F.max(score_col).cast("bigint").alias("score_max"),
    )


def group_autocorr(
    df: DataFrame,
    value_col: str,
    group_col: str,
    order: tuple[str, ...],
    lag: int = 1,
) -> DataFrame:
    """A25: per-group lag-k autocorrelation COMPONENTS as exact
    integers — "does this signal predict its own future", the
    time-series diagnostic beside trend (slope) and level_shift
    (break): pair every value with its lag-k successor in the pinned
    ``order`` and report

        n_pairs, cov_num  = n*Sxy - Sx*Sy,
        varx_num = n*Sxx - Sx*Sx,  vary_num = n*Syy - Sy*Sy

    so r^2 = cov_num^2 / (varx_num * vary_num) and the SIGN of r is
    the sign of cov_num — no sqrt, no float, bitwise anywhere (the
    spearman/auc fraction convention; constant series report
    varx_num = 0, undefined r, the den-0 convention). NULL values are
    excluded BEFORE pairing (a NULL has no successor semantics;
    exclusion-then-lag is the pinned rule).

    Overflow bound: n * sum(x^2) must stay under 2^63 — pass values in
    coarse integer units for long series (e.g. whole units instead of
    cents: 10^3-unit values allow ~10^6-row groups; the
    group_standardize bound discipline).

    Scale shape: ONE shuffle on the group (the lead window), then one
    map-side-combinable aggregation. Group cardinality bounds window
    parallelism — the spearman posture."""
    if lag < 1:
        raise ValueError("group_autocorr: lag must be >= 1")
    base = df.filter(F.col(value_col).isNotNull())
    w = Window.partitionBy(group_col).orderBy(*[F.col(c) for c in order])
    x = F.col("__x")
    y = F.col("__y")
    paired = (
        base.select(
            F.col(group_col),
            F.col(value_col).cast("bigint").alias("__x"),
            *[F.col(c) for c in order],
        )
        .withColumn("__y", F.lead("__x", lag).over(w))
        .filter(y.isNotNull())
    )
    agg = paired.groupBy(group_col).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_pairs"),
        F.sum(x).cast("bigint").alias("__sx"),
        F.sum(y).cast("bigint").alias("__sy"),
        F.sum(x * x).cast("bigint").alias("__sxx"),
        F.sum(y * y).cast("bigint").alias("__syy"),
        F.sum(x * y).cast("bigint").alias("__sxy"),
    )
    n = F.col("n_pairs")
    return agg.select(
        group_col,
        "n_pairs",
        (n * F.col("__sxy") - F.col("__sx") * F.col("__sy"))
        .cast("bigint").alias("cov_num"),
        (n * F.col("__sxx") - F.col("__sx") * F.col("__sx"))
        .cast("bigint").alias("varx_num"),
        (n * F.col("__syy") - F.col("__sy") * F.col("__sy"))
        .cast("bigint").alias("vary_num"),
    )


def group_mode(
    df: DataFrame,
    value_col: str,
    group_col: str,
) -> DataFrame:
    """A26: per-group MODE with a pinned tie rule — the most frequent
    value, ties broken toward the smallest value (engines'
    ``mode()``/``arg_max`` leave ties unspecified; a pinned
    (count desc, value asc) rule is what makes the answer a fact
    instead of an accident). NULL values are excluded (SQL mode
    convention). Returns (group, mode_value, mode_n, n_distinct).

    Scale shape: one map-side-combinable (group, value) count, then
    one min_by aggregation over the counted relation keyed by
    (-count, value) — no window, no sort, two combinable shuffles on
    shrinking relations."""
    counted = (
        df.filter(F.col(value_col).isNotNull())
        .groupBy(group_col, F.col(value_col).alias("__v"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("__n"))
    )
    key = F.struct((-F.col("__n")).alias("a"), F.col("__v").alias("b"))
    return counted.groupBy(group_col).agg(
        F.min_by("__v", key).alias("mode_value"),
        F.max("__n").alias("mode_n"),
        F.count(F.lit(1)).cast("bigint").alias("n_distinct"),
    )


def group_gini(
    df: DataFrame,
    value_col: str,
    group_col: str,
    id_col: str,
) -> DataFrame:
    """A27: per-group Gini concentration of a non-negative quantity —
    "is this segment's spend/engagement whale-dominated", the
    inequality audit a mixture or monetization review reads — as the
    EXACT integer fraction

        gini_num = 2 * sum(rank_i * x_(i)) - (n + 1) * sum(x)
        gini_den = n * sum(x)

    over values sorted ascending by (value, id) — the id tiebreak
    pins rank assignment under ties, and with it the exact fraction
    (the mean-difference Gini identity; 0 = perfectly equal,
    (n-1)/n = one row holds everything). Negative values are REFUSED
    in-plan (Gini is undefined below zero — a silent negative would
    corrupt the fraction, the zorder refusal posture); NULLs are
    excluded; all-zero groups report gini_den = 0 (undefined, the
    den-0 convention).

    Scale shape: ONE shuffle on the group (the rank window), then one
    map-side-combinable aggregation. Overflow bound: n * sum(x) and
    2 * n * max_rank_term must stay under 2^63 — coarse units for
    very large groups, the group_standardize discipline."""
    x_raw = F.col(value_col).cast("bigint")
    checked = F.when(x_raw >= 0, x_raw).otherwise(
        F.raise_error(
            F.lit(f"group_gini: {value_col} must be >= 0 (got negative)")
        )
    )
    base = df.filter(F.col(value_col).isNotNull()).select(
        F.col(group_col), F.col(id_col), checked.alias("__x")
    )
    w = Window.partitionBy(group_col).orderBy(F.col("__x"), F.col(id_col))
    ranked = base.withColumn(
        "__r", F.row_number().over(w).cast("bigint")
    )
    agg = ranked.groupBy(group_col).agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("__x").cast("bigint").alias("__s"),
        F.sum(F.col("__r") * F.col("__x")).cast("bigint").alias("__rs"),
    )
    return agg.select(
        group_col,
        "n",
        (F.lit(2) * F.col("__rs") - (F.col("n") + 1) * F.col("__s"))
        .cast("bigint").alias("gini_num"),
        (F.col("n") * F.col("__s")).cast("bigint").alias("gini_den"),
    )

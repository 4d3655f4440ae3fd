"""Deterministic sampling & splitting for training-data pipelines.

Hash-based, seed(salt)-stable, layout-independent: a row's assignment
depends only on its key, so reruns, repartitions, compactions, and
incremental appends keep every row in the same split — the property that
matters when a 100 TB corpus is split once and consumed by many training
jobs over months. Everything is pure Catalyst (no UDFs, no sampling RNG
state), so assignment fuses into whatever scan already runs.

The hash is md5 — not xxhash64 — so assignments are reproducible OUTSIDE
Spark: any engine with an md5 builtin (the driver's DuckDB oracle, a
Python validator) derives identical splits. 60 bits of the digest are
used, far past birthday range for per-bucket balance at any corpus size.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# md5-hex prefix length: 15 hex chars = 60 bits, fits a signed 64-bit int
_HEX_CHARS = 15
_N_BUCKETS = 1_000_000  # split granularity: fractions resolve to 1e-6


def hash_bucket(col: str | Column, salt: str = "", n: int = _N_BUCKETS) -> Column:
    """Deterministic bucket in [0, n) from md5(key || salt).

    SQL equivalent (DuckDB): ``('0x' || substr(md5(key || salt), 1, 15))
    ::UBIGINT % n`` — bit-identical, which is what makes split assignment
    verifiable end-to-end by an external engine."""
    c = F.col(col) if isinstance(col, str) else col
    h = F.conv(
        F.substring(F.md5(F.concat(c.cast("string"), F.lit(salt))), 1, _HEX_CHARS),
        16,
        10,
    ).cast("bigint")
    return F.pmod(h, F.lit(n))


def deterministic_split(
    df: DataFrame,
    key_col: str,
    weights: dict[str, float],
    salt: str = "split",
    out_col: str = "split",
) -> DataFrame:
    """Assign every row to a named split (e.g. train/val/test) by key hash.

    ``weights`` are relative fractions (normalized internally); assignment
    is by cumulative threshold over the hash bucket, so enlarging one split
    later only MOVES the boundary — rows never shuffle between the splits
    on either side of an untouched boundary. Keys equal ==> split equal
    (all rows of one conversation/document land together).
    """
    if not weights:
        raise ValueError("deterministic_split: weights must be non-empty")
    if any(w < 0 for w in weights.values()):
        raise ValueError("deterministic_split: weights must be non-negative")
    total = float(sum(weights.values()))
    if total <= 0:
        raise ValueError("deterministic_split: weights must sum to > 0")
    bucket = hash_bucket(key_col, salt)
    expr = None
    acc = 0.0
    names = list(weights)
    for name in names[:-1]:
        acc += weights[name] / total
        cond = bucket < int(round(acc * _N_BUCKETS))
        expr = F.when(cond, F.lit(name)) if expr is None else expr.when(cond, F.lit(name))
    last = F.lit(names[-1])
    return df.withColumn(out_col, last if expr is None else expr.otherwise(last))


def temperature_resample(
    df: DataFrame,
    group_col: str,
    key_col: str,
    tau: float = 0.5,
    cap: float = 4.0,
    salt: str = "resample",
) -> DataFrame:
    """Temperature-based mixture rebalancing: upsample under-represented
    groups (languages, sources) toward the largest one, the standard
    multilingual-pretraining move (sampling probability ∝ count^tau).

    Each group's multiplier is ``min(cap, (max_count / count)^tau)`` —
    always >= 1 (upsampling only; downsampling is ``deterministic_split``'s
    job). Rows are emitted ``floor(m)`` times plus one extra copy when
    ``hash_bucket(key) < frac(m)·1e6``, so the realized group sizes hit the
    target in expectation AND every copy decision is layout-independent
    and reproducible by an external engine. ``tau=0.5`` routes through
    ``sqrt`` (IEEE correctly-rounded in every engine — bitwise-identical
    multipliers in the DuckDB oracle); other taus use ``pow``, whose last
    ulp is libm-dependent.

    Plan shape: a partial-agg group count (tiny), a 1-row max broadcast,
    a broadcast join of the per-group multiplier, and an in-row
    ``explode(sequence)`` — no shuffle of the corpus itself.

    Output = input columns + ``n_copies`` + ``copy_idx`` (1-based).
    """
    if tau < 0:
        raise ValueError("temperature_resample: tau must be >= 0")
    if cap < 1:
        raise ValueError("temperature_resample: cap must be >= 1")
    counts = df.groupBy(group_col).agg(F.count(F.lit(1)).alias("__cnt"))
    mx = counts.agg(F.max("__cnt").alias("__mx"))
    ratio = F.col("__mx").cast("double") / F.col("__cnt").cast("double")
    m = F.sqrt(ratio) if tau == 0.5 else F.pow(ratio, F.lit(float(tau)))
    mults = counts.crossJoin(F.broadcast(mx)).select(
        group_col, F.least(F.lit(float(cap)), m).alias("__mult")
    )
    base = F.floor("__mult").cast("bigint")
    frac_micro = F.round((F.col("__mult") - F.floor("__mult")) * _N_BUCKETS).cast(
        "bigint"
    )
    n_copies = base + F.when(
        hash_bucket(key_col, salt) < frac_micro, F.lit(1)
    ).otherwise(F.lit(0))
    return (
        df.join(F.broadcast(mults), group_col)
        .withColumn("n_copies", n_copies)
        .drop("__mult")
        .withColumn(
            "copy_idx",
            F.explode(F.sequence(F.lit(1).cast("bigint"), F.col("n_copies"))),
        )
    )


def per_group_sample(
    df: DataFrame,
    group_col: str,
    n_per_group: int,
    key_col: str,
    salt: str = "sample",
) -> DataFrame:
    """Deterministic n-per-group sample: rank rows inside each group by
    (hash(key), key) and keep the first ``n_per_group``.

    Statistically a uniform without-replacement sample per group (the hash
    order is pseudo-random in the key), but reproducible and
    layout-independent — the reservoir-sampling use case without reservoir
    state. One window over the group key; groups smaller than the quota
    pass through whole."""
    w = Window.partitionBy(group_col).orderBy(
        hash_bucket(key_col, salt), F.col(key_col)
    )
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= n_per_group)
        .drop("__rn")
    )


def budget_sample(
    df: DataFrame,
    group_col: str,
    weight_col: str,
    budgets: dict,
    id_col: str,
    salt: str = "budget",
    coarse_bits: int = 13,
) -> DataFrame:
    """Token-budget mixture sampling — the data-mixing primitive: for
    each group (domain/source/language), keep rows in deterministic
    md5-hash order until the group's weight budget is exhausted (a row
    that would cross the budget is excluded, as is everything after it).
    Groups absent from ``budgets`` are dropped: the dict IS the mixture
    spec. Keep-set properties: deterministic, layout-independent, and
    PREFIX-STABLE — raising one group's budget only appends to its
    selection, never swaps earlier rows out (same argument as
    deterministic_split's boundary stability).

    Scale shape (the pack_chunks histogram trick, applied to selection):
    a naive implementation sorts each group by hash and cumsums — one
    reducer per group, serialized on the hottest group. Instead the
    60-bit hash space is cut into 2^coarse_bits ORDER-ALIGNED coarse
    buckets; one hash aggregation gives per-(group, bucket) weight sums
    (<= n_groups x 2^coarse_bits rows — driver-safe for any explicit
    mixture spec), the driver prefix-sums each group's bucket histogram
    to find the single BOUNDARY bucket, and only that bucket's ~1/2^13
    slice of the group is ever window-sorted. Everything before it keeps
    by a broadcast predicate; everything after drops. Exactness is
    pinned by test against the naive single-window form.

    The hash is md5 (sampling-module convention): selection is
    reproducible bit-for-bit by any engine with an md5 builtin, which is
    what makes the registry oracle possible."""
    if not budgets:
        raise ValueError("budget_sample: budgets must be non-empty")
    if coarse_bits < 1 or coarse_bits > 40:
        raise ValueError("budget_sample: coarse_bits out of range")
    # budget arithmetic is exact bigint; a double/decimal weight column
    # would be silently truncated per-row by the casts below and the
    # selection would diverge from any float expectation — refuse at
    # plan-build time (review finding). Callers with fractional weights
    # pre-scale to integers (e.g. milli-tokens) and scale budgets to match.
    wtype = df.schema[weight_col].dataType.simpleString()
    if wtype not in ("tinyint", "smallint", "int", "bigint"):
        raise TypeError(
            f"budget_sample: {weight_col!r} is {wtype}; weights must be an "
            "integral type (budget arithmetic is exact bigint — pre-scale "
            "fractional weights, e.g. x1000, and scale budgets to match)"
        )
    spark = df.sparkSession
    shift = 1 << (60 - coarse_bits)
    h = F.conv(
        F.substring(
            F.md5(F.concat(F.col(id_col).cast("string"), F.lit(salt))),
            1, _HEX_CHARS,
        ),
        16, 10,
    ).cast("bigint")
    # only budgeted groups continue; __h >= 0 so div == floor
    spec = spark.createDataFrame(
        [(k, int(v)) for k, v in budgets.items()],
        schema=f"{group_col} string, __budget bigint",
    )
    tagged = (
        df.join(F.broadcast(spec), group_col)
        .withColumn("__h", h)
        .withColumn("__b", F.expr(f"__h div {shift}"))
    )
    hist = (
        tagged.groupBy(group_col, "__b")
        .agg(
            F.sum(F.col(weight_col).cast("bigint")).alias("__w"),
            F.sum(F.col(weight_col).isNull().cast("int")).alias("__nulls"),
            F.min(F.col(weight_col).cast("bigint")).alias("__minw"),
        )
        .collect()
    )
    # weights define the budget arithmetic: NULLs would silently diverge
    # from the cumsum rule (SUM skips them, the filter keeps them) and
    # negatives break prefix monotonicity — both refuse loudly (review
    # finding), in the same aggregation the histogram already pays for
    bad_nulls = sum(int(r["__nulls"]) for r in hist)
    if bad_nulls:
        raise ValueError(
            f"budget_sample: {bad_nulls} NULL {weight_col!r} value(s) in "
            "budgeted groups — fill or filter them first"
        )
    neg = min((int(r["__minw"]) for r in hist), default=0)
    if neg < 0:
        raise ValueError(
            f"budget_sample: negative {weight_col!r} values (min {neg}) "
            "break the prefix rule — weights must be non-negative"
        )
    per_group: dict = {}
    for r in hist:
        per_group.setdefault(r[group_col], {})[int(r["__b"])] = int(r["__w"])
    cuts = []
    for g, budget in budgets.items():
        run = 0
        b_star = 1 << coarse_bits  # past every bucket: full keep
        rem = 0
        for b in sorted(per_group.get(g, {})):
            w_b = per_group[g][b]
            if run + w_b > budget:
                b_star = b
                rem = int(budget) - run
                break
            run += w_b
        cuts.append((g, int(b_star), int(rem)))
    cut_df = spark.createDataFrame(
        cuts, schema=f"{group_col} string, __cut bigint, __rem bigint"
    )
    with_cut = tagged.join(F.broadcast(cut_df), group_col)
    full_keep = with_cut.filter(F.col("__b") < F.col("__cut"))
    boundary = with_cut.filter(F.col("__b") == F.col("__cut"))
    w = Window.partitionBy(group_col).orderBy("__h", id_col).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    boundary_keep = (
        boundary.withColumn(
            "__cum", F.sum(F.col(weight_col).cast("bigint")).over(w)
        )
        .filter(F.col("__cum") <= F.col("__rem"))
        .drop("__cum")
    )
    return (
        full_keep.unionByName(boundary_keep)
        .drop("__h", "__b", "__cut", "__rem", "__budget")
    )


def stratified_kfold(
    df: DataFrame,
    label_col: str,
    key_col: str,
    k: int,
    salt: str = "fold",
    out_col: str = "fold",
) -> DataFrame:
    """Deterministic stratified k-fold assignment: within every label
    stratum, rows are ordered by md5(key || salt) (key as the
    collision tiebreak) and dealt round-robin into ``k`` folds — so
    each label's fold populations differ by AT MOST ONE row, the
    balance guarantee cross-validation needs that a plain hash-mod
    split only approaches in expectation. The ordering hash is md5
    (module contract: reproducible OUTSIDE Spark — the hex string
    sorts identically in any ASCII-ordered engine), so the oracle is
    one window expression away in DuckDB.

    Unlike deterministic_split, assignment here depends on the
    stratum's membership (the round-robin rank), not the key alone —
    appending rows later CAN renumber folds. That is the documented
    price of exact balance; use deterministic_split when append
    stability matters more than stratum balance.

    Scale shape: one shuffle on the label (window partition). A hot
    label serializes its stratum through one task's sort — same cost
    family as per_group_sample; for corpora whose label cardinality is
    tiny and rows-per-label huge, the two-phase salted variant (rank
    within salted sub-strata, then offset by sub-stratum sizes) is the
    escape hatch, not this exact form."""
    if k < 2:
        raise ValueError("stratified_kfold: k must be >= 2")
    h = F.md5(F.concat(F.col(key_col).cast("string"), F.lit(salt)))
    w = Window.partitionBy(label_col).orderBy(h, F.col(key_col))
    fold = F.pmod((F.row_number().over(w) - 1).cast("bigint"), F.lit(k))
    return df.withColumn(out_col, fold)


def churn_labels(
    df: DataFrame,
    entity_col: str,
    ts_us_col: str,
    holdout_us: int,
) -> DataFrame:
    """SP4: leakage-safe churn LABEL GENERATION — the temporal
    label/feature split in one relation: the corpus tail of length
    ``holdout_us`` (ending at the corpus max timestamp, computed
    in-plan as a broadcast 1-row aggregate) is the LABEL window, and
    every feature is computed ONLY from rows strictly BEFORE the
    cutoff. churned = the entity had pre-cutoff activity and NO event
    in the label window — the standard churn target, produced so that
    no feature can read the label period (the point-in-time rule
    applied to label construction; features computed over the full
    span would leak the answer).

    Entities whose FIRST event falls inside the label window are
    EXCLUDED (no pre-cutoff history — nothing to predict from; the
    pinned convention). Returns per entity:
    (entity, n_before bigint, last_gap_us bigint — cutoff minus last
    pre-cutoff event, churned int) — all integers, bitwise anywhere.

    Scale shape: one broadcast 1-row max, then ONE map-side-combinable
    aggregation computing pre-cutoff features AND the label-window
    existence flag in the same pass — no self-join, no second shuffle.
    NULL timestamps are excluded."""
    if holdout_us <= 0:
        raise ValueError("churn_labels: holdout_us must be > 0")
    base = df.filter(F.col(ts_us_col).isNotNull()).select(
        F.col(entity_col), F.col(ts_us_col).cast("bigint").alias("__us")
    )
    mx = base.agg(F.max("__us").alias("__max_us"))
    with_cut = base.crossJoin(F.broadcast(mx)).withColumn(
        "__cutoff", F.col("__max_us") - F.lit(int(holdout_us))
    )
    before = F.col("__us") < F.col("__cutoff")
    agg = with_cut.groupBy(entity_col).agg(
        F.sum(F.when(before, 1).otherwise(0)).cast("bigint").alias("n_before"),
        F.max(F.when(before, F.col("__us"))).alias("__last_before"),
        F.max(F.when(~before, 1).otherwise(0)).alias("__active_after"),
        F.max("__cutoff").alias("__cut"),
    )
    return agg.filter(F.col("n_before") > 0).select(
        entity_col,
        "n_before",
        (F.col("__cut") - F.col("__last_before")).cast("bigint").alias(
            "last_gap_us"
        ),
        (F.lit(1) - F.col("__active_after")).cast("int").alias("churned"),
    )

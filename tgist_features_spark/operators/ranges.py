"""Bounded range (interval) join — the scale-robust form of
"all B events within (lo, hi] of each A event".

The naive plan is an equi-join on the entity plus range post-filters:
correct, but a HOT entity degenerates into an |A_u| x |B_u| per-key
product before the filter prunes anything. The standard fix is interval
binning: with window length w = hi - lo, every B row lands in exactly
one w-wide time bucket (computed on b_ts - lo, so the bound holds for
any lo, including "B before A" windows), and an A row's admissible
interval (a_ts + lo, a_ts + hi] overlaps AT MOST TWO consecutive
buckets — so A explodes x2, the join runs on (entity, bucket), and each
join key's multiplicity is bounded by events-per-(entity, w-window)
instead of events-per-entity. No pair can match twice (each B row has
exactly one bucket), so no dedup pass is needed. Cost: 2x the A-side
rows through the shuffle, in exchange for a per-key bound that holds no
matter how hot the entity is.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from tgist_features_spark.functions.timeu import us


def bounded_range_join(
    a: DataFrame,
    b: DataFrame,
    a_entity: str,
    b_entity: str,
    a_ts: str,
    b_ts: str,
    lo_s: float,
    hi_s: float,
) -> DataFrame:
    """Inner pairs: every (a row, b row) with matching entity and
    ``b_ts - a_ts`` in the OPEN-CLOSED interval (lo_s, hi_s] seconds —
    the "what followed within N minutes" shape (use a negative window
    for "what preceded"). Column names must not collide across sides.

    Bucket arithmetic is integer FLOOR division over epoch-microseconds
    (no doubles near 2^53). Spark's ``div`` truncates toward zero, which
    diverges from floor on negative operands (pre-1970 timestamps, or any
    ``__bu - lo - 1`` that goes negative under a large positive ``lo``) —
    a trunc-binned row lands one bucket high and its true matches are
    silently lost. Floor is recovered exactly as
    ``(x - pmod(x, w)) div w``: pmod's remainder is non-negative, the
    adjusted numerator is exactly divisible, and trunc of an exact
    multiple equals floor for any sign."""
    if not hi_s > lo_s:
        raise ValueError("bounded_range_join: need hi_s > lo_s")
    w = int(round((hi_s - lo_s) * 1_000_000))
    lo = int(round(lo_s * 1_000_000))
    if w < 1:
        # post-rounding guard: a sub-microsecond window would make the
        # bucket div-by-zero NULL out silently instead of erroring
        raise ValueError("bounded_range_join: window must be >= 1 microsecond")

    def _fdiv(x: str) -> str:
        return f"(({x}) - pmod({x}, {w})) div {w}"

    ak = (
        a.withColumn("__au", us(F.col(a_ts)))
        .withColumn("__ka", F.expr(_fdiv("__au")))
        .withColumn("__bk", F.explode(F.array(F.col("__ka"), F.col("__ka") + 1)))
        .drop("__ka")
        .alias("A")
    )
    bk = (
        b.withColumn("__bu", us(F.col(b_ts)))
        .withColumn("__bk", F.expr(_fdiv(f"__bu - {lo} - 1")))
        .alias("B")
    )
    cond = (
        (F.col(f"A.{a_entity}") == F.col(f"B.{b_entity}"))
        & (F.col("A.__bk") == F.col("B.__bk"))
        & (F.col("B.__bu") > F.col("A.__au") + F.lit(lo))
        & (F.col("B.__bu") <= F.col("A.__au") + F.lit(lo + w))
    )
    return ak.join(bk, cond, "inner").drop("__au", "__bu", "__bk")


def funnel_step_conversions(
    events: DataFrame,
    steps: list[str],
    entity_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    id_col: str = "event_id",
    window_s: float = 3600.0,
) -> DataFrame:
    """Funnel step-conversion report: for each consecutive step pair
    (A, B) in ``steps``, how many A events were followed by at least one
    B event from the same entity within ``(0, window_s]`` seconds — the
    standard product-analytics "step conversion" table.

    Returns (step_from, step_to, n_from, n_converted) — one row per
    pair, all counts bigint. Each pair is a ``bounded_range_join``
    (interval binning: per-key join multiplicity bounded by window
    occupancy, not entity volume — the hot-user guard), reduced with a
    distinct-A count; per-pair rows meet in 1-row x 1-row cross joins
    (the corpus_report pattern). The loop is over the STEP LIST (a tiny
    config, like budget_sample's budgets), never over data.

    The CHAINED form ("entities that completed A then B then C
    sequentially, each within its own window") conditions every step on
    the previous step's MATCHED event — inherently sequential per
    entity, the same shape the batch debounce delegates to the stateful
    streaming path; this operator is deliberately the per-pair report."""
    if len(steps) < 2:
        raise ValueError("funnel_step_conversions: need at least two steps")
    out = None
    for a_step, b_step in zip(steps, steps[1:]):
        a = events.filter(F.col(type_col) == a_step).select(
            F.col(entity_col).alias("__ae"),
            F.col(id_col).alias("__aid"),
            F.col(ts_col).alias("__ats"),
        )
        b = events.filter(F.col(type_col) == b_step).select(
            F.col(entity_col).alias("__be"),
            F.col(id_col).alias("__bid"),
            F.col(ts_col).alias("__bts"),
        )
        pairs = bounded_range_join(
            a, b, "__ae", "__be", "__ats", "__bts", 0.0, window_s
        )
        n_conv = pairs.agg(
            F.count_distinct("__aid").cast("bigint").alias("n_converted")
        )
        n_from = a.agg(F.count(F.lit(1)).cast("bigint").alias("n_from"))
        row = (
            n_from.crossJoin(n_conv)  # 1-row x 1-row stats join
            .select(
                F.lit(a_step).alias("step_from"),
                F.lit(b_step).alias("step_to"),
                "n_from",
                "n_converted",
            )
        )
        out = row if out is None else out.unionByName(row)
    return out


def funnel_chain(
    events: DataFrame,
    steps: list[str],
    entity_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    id_col: str = "event_id",
    window_s: float = 3600.0,
) -> DataFrame:
    """CHAINED funnel: how many entities completed ``steps[0]``, then
    ``steps[1]`` within ``(0, window_s]`` of that match, then
    ``steps[2]`` within ``window_s`` of THAT match, and so on — each
    step conditioned on the PREVIOUS step's matched event, not on the
    step-pair report ``funnel_step_conversions`` produces.

    Semantics (deterministic, "earliest-match"): the anchor is the
    entity's first ``steps[0]`` event (order by ts, then id); step i+1
    matches the EARLIEST ``steps[i+1]`` event with ts strictly after the
    step-i match and within ``window_s`` of it. An entity's funnel depth
    is then uniquely defined. Returns one row per step:
    (step_idx int, step string, n_reached bigint) — n_reached counts
    entities whose chain got at least to that step.

    Plan shape — a per-entity SORTED FOLD, not iterated joins: the
    chained rule is sequential per entity, and k chained range joins
    would re-evaluate every prior stage per step (no cross-branch CSE in
    Catalyst) while shuffling the event stream k times. Instead: filter
    to the step types, ONE groupBy(entity) collect_list, array_sort by
    (ts, id), and a single F.aggregate fold running the
    greedy state machine (stage, t_prev) — greedy IS earliest-match by
    induction, and only the matched timestamp propagates between steps.
    The final per-step counts are conditional sums in one 1-row
    aggregate, unpivoted via a 2-element-literal explode. Total: one
    shuffle over the (type-filtered) events + one tiny agg — at any
    corpus scale the heavy stage is a map-side-combinable
    collect_list keyed by entity.

    Hot-entity caveat (same exposure as sessionize's window sort): one
    entity's type-filtered events materialize as one array in one task.
    Funnel-relevant event types are usually a small fraction of traffic;
    for adversarial entities (bots with millions of step events) cap
    upstream or route through the stateful streaming debounce first.
    """
    if len(steps) < 2:
        raise ValueError("funnel_chain: need at least two steps")
    if len(set(steps)) != len(steps):
        raise ValueError("funnel_chain: steps must be distinct")
    w = int(round(window_s * 1_000_000))
    if w < 1:
        raise ValueError("funnel_chain: window must be >= 1 microsecond")

    si = F.lit(None).cast("int")
    for i, s in enumerate(steps):
        si = F.when(F.col(type_col) == s, F.lit(i)).otherwise(si)
    ev = events.filter(F.col(type_col).isin(list(steps))).select(
        F.col(entity_col).alias("__e"),
        F.struct(
            us(F.col(ts_col)).alias("t"),
            F.col(id_col).alias("id"),
            si.alias("si"),
        ).alias("__ev"),
    )
    init = F.struct(
        F.lit(-1).cast("int").alias("stage"),
        F.lit(0).cast("bigint").alias("t"),
    )

    def _step(acc, e):
        take_anchor = (acc["stage"] == F.lit(-1)) & (e["si"] == F.lit(0))
        advance = (
            (e["si"] == acc["stage"] + F.lit(1))
            & (e["t"] > acc["t"])
            & (e["t"] <= acc["t"] + F.lit(w))
        )
        # in both taken branches the new stage IS the event's step index
        # (anchor: si == 0; advance: si == stage + 1)
        return (
            F.when(
                take_anchor | advance,
                F.struct(e["si"].alias("stage"), e["t"].alias("t")),
            ).otherwise(acc)
        )

    folded = (
        ev.groupBy("__e")
        .agg(F.array_sort(F.collect_list("__ev")).alias("__evs"))
        .select(F.aggregate("__evs", init, _step).getField("stage").alias("__stage"))
    )
    one_row = folded.agg(*[
        F.coalesce(
            F.sum((F.col("__stage") >= i).cast("bigint")), F.lit(0)
        ).cast("bigint").alias(f"__n{i}")
        for i in range(len(steps))
    ])
    rows = F.array(*[
        F.struct(
            F.lit(i).cast("int").alias("step_idx"),
            F.lit(s).alias("step"),
            F.col(f"__n{i}").alias("n_reached"),
        )
        for i, s in enumerate(steps)
    ])
    return (
        one_row.select(F.explode(rows).alias("r"))
        .select("r.step_idx", "r.step", "r.n_reached")
    )


def interval_overlap_join(
    a: DataFrame,
    b: DataFrame,
    a_entity: str,
    b_entity: str,
    a_start: str,
    a_end: str,
    b_start: str,
    b_end: str,
    bucket_s: float,
) -> DataFrame:
    """Inner pairs of OVERLAPPING intervals per entity: every (a row,
    b row) with matching entity and ``a_start < b_end AND b_start <
    a_end`` (strict half-open overlap — touching endpoints do NOT
    match). The "which sessions overlapped which incidents", "which ad
    exposure windows intersected which outages" shape.

    Plan (interval binning, same family as bounded_range_join): both
    sides explode into the ``bucket_s``-wide time buckets their interval
    covers, join on (entity, bucket), apply the exact overlap predicate
    — and keep each pair ONLY in the canonical bucket containing
    ``greatest(a_start, b_start)`` (the overlap's left edge), so a pair
    spanning many shared buckets is emitted exactly once WITHOUT a
    distinct/dedup shuffle. Per-key multiplicity is bounded by intervals
    ACTIVE per (entity, bucket), not intervals per entity — the hot
    entity guard.

    ``bucket_s`` trades explosion for join multiplicity: each row
    produces ceil(span / bucket) + 1 bucket rows, so pick it near the
    TYPICAL interval length. Interval timestamps are compared in integer
    microseconds (``us``); bucket arithmetic is the pre-1970-safe floor
    division used by bounded_range_join. End-before-start rows are
    refused in-plan (raise_error) — silent empty intervals hide data
    bugs. Column names must not collide across sides."""
    w = int(round(bucket_s * 1_000_000))
    if w < 1:
        raise ValueError("interval_overlap_join: bucket must be >= 1 microsecond")

    def _fdiv(x: str) -> str:
        return f"(({x}) - pmod({x}, {w})) div {w}"

    def _prep(df, start, end, s_out, e_out, side):
        su, eu = us(F.col(start)), us(F.col(end))
        ok = F.when(
            eu >= su, su
        ).otherwise(
            F.raise_error(
                F.lit(f"interval_overlap_join: {side}-side interval with "
                      f"end < start (check {start}/{end})")
            )
        )
        return (
            df.withColumn(s_out, ok)
            .withColumn(e_out, eu)
            .withColumn(
                "__bk",
                F.explode(
                    F.sequence(
                        F.expr(_fdiv(s_out)), F.expr(_fdiv(e_out))
                    )
                ),
            )
        )

    ak = _prep(a, a_start, a_end, "__as", "__ae", "a").alias("A")
    bk = _prep(b, b_start, b_end, "__bs", "__be", "b").alias("B")
    left_edge = F.greatest(F.col("A.__as"), F.col("B.__bs"))
    cond = (
        (F.col(f"A.{a_entity}") == F.col(f"B.{b_entity}"))
        & (F.col("A.__bk") == F.col("B.__bk"))
        & (F.col("A.__as") < F.col("B.__be"))
        & (F.col("B.__bs") < F.col("A.__ae"))
    )
    canonical = F.col("A.__bk") == F.expr(
        f"((__edge) - pmod(__edge, {w})) div {w}"
    )
    return (
        ak.join(bk, cond)
        .withColumn("__edge", left_edge)
        .filter(canonical)
        .drop("__bk", "__edge", "__as", "__ae", "__bs", "__be")
    )


def conversion_latency(
    df: DataFrame,
    entity_col: str,
    type_col: str,
    from_type: str,
    to_type: str,
    ts_col: str = "ts",
) -> DataFrame:
    """Per-entity time-to-conversion: the gap between an entity's FIRST
    ``from_type`` event and its first ``to_type`` event at-or-after it —
    "median minutes from first view to first purchase", the
    time-to-event table growth and curation analyses read next to the
    funnel counts. Entities that never convert are returned with NULL
    to_us/latency_us (the censored rows a survival analysis needs —
    dropping them would bias every latency statistic downward).

    One aggregation does everything: min(from ts) and the conditional
    min(to ts >= from ts) cannot be folded into one pass blindly (the
    condition references the first aggregate), so the plan is two
    map-side-combinable aggs over the SAME shuffle key met by a join
    that AQE resolves locally — the entity relation after agg #1 is
    tiny relative to the event stream and broadcastable at any
    realistic entity/event ratio. Timestamps compare as integer
    microseconds (us()); latency is exact integer arithmetic."""
    t_us = us(F.col(ts_col))
    first_from = (
        df.filter(F.col(type_col) == from_type)
        .groupBy(entity_col)
        .agg(F.min(t_us).alias("from_us"))
    )
    to_events = df.filter(F.col(type_col) == to_type).select(
        F.col(entity_col), t_us.alias("__to_us")
    )
    first_to = (
        to_events.join(F.broadcast(first_from), entity_col)
        .filter(F.col("__to_us") >= F.col("from_us"))
        .groupBy(entity_col)
        .agg(F.min("__to_us").alias("to_us"))
    )
    return (
        first_from.join(first_to, entity_col, "left")
        .select(
            entity_col,
            "from_us",
            "to_us",
            (F.col("to_us") - F.col("from_us")).alias("latency_us"),
        )
    )


def interval_islands(
    df: DataFrame,
    entity_col: str | list[str],
    start_col: str,
    end_col: str,
    id_col: str,
    weight_col: str | None = None,
) -> DataFrame:
    """Merge each entity's CLOSED intervals [start, end] into maximal
    islands (the gaps-and-islands problem): touching or overlapping
    intervals coalesce; a strict gap starts a new island. This is the
    "total tool-active time per conversation", "union of session spans
    per user" shape — coverage statistics that double-count unless the
    overlaps are merged first.

    ``start_col``/``end_col`` are BIGINT domain values (epoch
    microseconds via ``us()``, byte offsets, token positions — any
    total order); callers convert timestamps before the call so the
    merge semantics stay engine-exact integer comparisons.

    Plan: one window pass per entity ordered by (start, end, id) — a
    TOTAL order, so the running prefix max of ``end`` is identical in
    any engine — flags rows whose start exceeds every earlier end
    (island opener), a running sum of the flags numbers the islands,
    and one aggregation emits each island's extent. The aggregation
    keys (entity, island) are a superset of the window's hash
    partitioning, so Spark's EnsureRequirements inserts NO second
    exchange: the whole operator is one shuffle regardless of scale.
    End-before-start rows are refused in-plan (raise_error), matching
    interval_overlap_join's contract — silent empty intervals hide
    data bugs.

    ``weight_col`` makes n_spans a SUM of the given bigint column
    instead of a row count; ``entity_col`` may be a list for composite
    keys — both are the hooks interval_islands_salted builds on."""
    from pyspark.sql import Window

    entities = [entity_col] if isinstance(entity_col, str) else list(entity_col)
    checked_start = F.when(
        F.col(end_col) >= F.col(start_col), F.col(start_col)
    ).otherwise(
        F.raise_error(
            F.lit(f"interval_islands: interval with {end_col} < {start_col}")
        )
    )
    order = [F.col(start_col), F.col(end_col), F.col(id_col)]
    w_prev = (
        Window.partitionBy(*entities)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    w_run = (
        Window.partitionBy(*entities)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    prev_max_end = F.max(F.col(end_col)).over(w_prev)
    opener = F.when(
        prev_max_end.isNull() | (F.col(start_col) > prev_max_end), 1
    ).otherwise(0)
    return (
        df.withColumn("__s", checked_start)
        .withColumn("__island", F.sum(opener).over(w_run).cast("bigint"))
        .groupBy(
            *[F.col(e) for e in entities], F.col("__island").alias("island_id")
        )
        .agg(
            F.min("__s").alias("island_start"),
            F.max(F.col(end_col)).alias("island_end"),
            (
                F.sum(F.col(weight_col)) if weight_col
                else F.count(F.lit(1))
            ).cast("bigint").alias("n_spans"),
        )
    )


def interval_islands_salted(
    df: DataFrame,
    entity_col: str,
    start_col: str,
    end_col: str,
    id_col: str,
    n_salts: int = 16,
) -> DataFrame:
    """Skew-safe two-phase interval_islands, EXACTLY equal to the plain
    form (tested): interval union is mergeable —
    islands(A ∪ B) = islands(islands(A) ∪ islands(B)) — so a hot
    entity's intervals first merge within ``n_salts`` hash-salted
    sub-streams in parallel ((entity, salt) windows), and only the
    (usually far smaller) per-salt island relation goes through the
    per-entity window. Same output columns, same island numbering: a
    merged extent is insensitive to the order of tied sub-islands, and
    the packed (salt, sub-island) id is only a determinism tiebreak.
    n_spans sums across sub-islands, so span counts survive the
    two-phase route exactly.

    The caveat mirrors salted_agg: if a hot entity's intervals DON'T
    overlap (sub-islands don't collapse), phase 2 still sees them all
    in one partition — salting buys parallel pre-merging, not a
    worst-case bound. For coverage-style inputs (sessions, tool-active
    spans) overlap is the norm and the collapse is large."""
    if n_salts < 2:
        raise ValueError("interval_islands_salted: n_salts must be >= 2")
    salt = F.pmod(F.xxhash64(F.col(id_col).cast("string")), F.lit(n_salts))
    sub = interval_islands(
        df.withColumn("__salt", salt),
        [entity_col, "__salt"],
        start_col,
        end_col,
        id_col,
    )
    # a unique orderable sub-island id: island_id is dense per
    # (entity, salt), so salt * 2^40 + island_id never collides below
    # 2^40 sub-islands per salt (far past any real partition)
    packed = (F.col("__salt") * F.lit(1 << 40) + F.col("island_id")).alias(
        "__sid"
    )
    return interval_islands(
        sub.select(
            F.col(entity_col),
            F.col("island_start").alias("__ss"),
            F.col("island_end").alias("__se"),
            packed,
            F.col("n_spans").alias("__w"),
        ),
        entity_col,
        "__ss",
        "__se",
        "__sid",
        weight_col="__w",
    )

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

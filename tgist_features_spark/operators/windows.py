"""Window-function feature operators (W1-W5, SURVEY.md §2.5) — the feature
core.

The reference's context features (prev_V/prev_J/next_n1.. over POS-tagged
token streams) become lag/lead + rolling frames over per-conversation windows.
Leakage discipline is structural: every *backward* feature uses a frame that
ends at -1 (strictly before the current row) or at 0 where the current row's
own value is legitimately visible at its own timestamp. Forward (lead)
features are label-side only and are excluded from the leakage gate.

All of this is pure Catalyst — whole-stage-codegen window exec over the
canonical (conv_id, ts, turn_idx) sort, zero Python in the hot path.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, WindowSpec
from pyspark.sql import functions as F

from tgist_features_spark.functions.timeu import us


def _w(entity: str, order: tuple[str, ...]) -> WindowSpec:
    return Window.partitionBy(entity).orderBy(*order)


def with_lag_lead(
    df: DataFrame,
    cols: list[str],
    n: int = 1,
    entity: str = "conv_id",
    order: tuple[str, ...] = ("ts", "turn_idx"),
    lead: bool = True,
) -> DataFrame:
    """prev_*/next_* features (W1): lag/lead of each column by 1..n turns."""
    w = _w(entity, order)
    out = df
    for c in cols:
        for k in range(1, n + 1):
            suffix = "" if n == 1 else str(k)
            out = out.withColumn(f"prev_{c}{suffix}", F.lag(c, k).over(w))
            if lead:
                out = out.withColumn(f"next_{c}{suffix}", F.lead(c, k).over(w))
    return out


def with_delta_ts(
    df: DataFrame,
    ts: str = "ts",
    entity: str = "conv_id",
    order: tuple[str, ...] = ("ts", "turn_idx"),
    out_col: str = "gap_s",
) -> DataFrame:
    """Seconds since the previous turn (null on the first turn of a conv)."""
    w = _w(entity, order)
    prev = F.lag(F.col(ts)).over(w)
    return df.withColumn(
        out_col,
        (us(F.col(ts)) - us(prev)) / F.lit(1_000_000.0),
    )


def with_position(
    df: DataFrame,
    entity: str = "conv_id",
    order: tuple[str, ...] = ("ts", "turn_idx"),
) -> DataFrame:
    """W2: 1-based turn number and reverse index within the conversation."""
    w = _w(entity, order)
    n = F.count(F.lit(1)).over(Window.partitionBy(entity))
    rn = F.row_number().over(w)
    return (
        df.withColumn("turn_no", rn)
        .withColumn("turns_total", n)
        .withColumn("turns_remaining", n - rn)
    )


def with_rolling_counts(
    df: DataFrame,
    k: int,
    aggs: dict[str, Column],
    entity: str = "conv_id",
    order: tuple[str, ...] = ("ts", "turn_idx"),
    include_current: bool = False,
) -> DataFrame:
    """W3: row-frame rolling aggregates over the last k turns.

    ``include_current=False`` (default) ends the frame at -1 — the leakage-
    safe form for features that must not see the current turn's own value.
    ``aggs`` maps output column name -> aggregate Column, e.g.
    ``{"n_tool_5": F.sum(F.when(F.col("role") == "tool", 1).otherwise(0))}``.
    """
    hi = 0 if include_current else -1
    w = _w(entity, order).rowsBetween(-k, hi)
    out = df
    for name, col in aggs.items():
        out = out.withColumn(name, col.over(w))
    return out


def with_rolling_time(
    df: DataFrame,
    seconds: int,
    aggs: dict[str, Column],
    ts: str = "ts",
    entity: str = "conv_id",
    include_current: bool = True,
) -> DataFrame:
    """W4: time-range frame — trailing ``seconds`` window ordered by epoch
    microseconds (so sub-second gaps still resolve exactly).

    ``include_current=False`` bounds the frame at -1 microsecond, which
    excludes ALL rows sharing the current timestamp, not just the current
    row — the conservative leakage semantics (co-timestamped rows are
    simultaneous, so none of them may see each other). This differs from
    the row-frame ``with_rolling_counts`` where -1 excludes only the
    current row."""
    hi = 0 if include_current else -1
    w = (
        Window.partitionBy(entity)
        .orderBy(us(F.col(ts)))
        .rangeBetween(-seconds * 1_000_000, hi)
    )
    out = df
    for name, col in aggs.items():
        out = out.withColumn(name, col.over(w))
    return out


def with_cumulative(
    df: DataFrame,
    aggs: dict[str, Column],
    entity: str = "conv_id",
    order: tuple[str, ...] = ("ts", "turn_idx"),
) -> DataFrame:
    """W5: running aggregates since conversation start (frame ... to 0)."""
    w = _w(entity, order).rowsBetween(Window.unboundedPreceding, 0)
    out = df
    for name, col in aggs.items():
        out = out.withColumn(name, col.over(w))
    return out


def with_ffill(
    df: DataFrame,
    cols: list[str],
    entity: str = "conv_id",
    order: tuple[str, ...] = ("ts", "turn_idx"),
    prefix: str = "last_",
) -> DataFrame:
    """W5 backfill: forward-fill the last non-null value (e.g. last tool
    used so far in the conversation)."""
    w = _w(entity, order).rowsBetween(Window.unboundedPreceding, 0)
    out = df
    for c in cols:
        out = out.withColumn(prefix + c, F.last(c, ignorenulls=True).over(w))
    return out

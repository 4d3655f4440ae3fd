"""Canonical ordering (O1, SURVEY.md §2.6).

The reference emitted feature lines in deterministic per-document order; the
engine's equivalent invariant is stable (conv_id, ts, turn_idx) order inside
conv-contiguous partitions. One range-repartition shuffle establishes the
layout; every window pass, the text-feature UDF and the as-of merge all
reuse it, so the hot path pays exactly one planned shuffle for layout.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def canonical_order(
    df: DataFrame,
    entity: str = "conv_id",
    order: tuple[str, ...] = ("ts", "turn_idx"),
    num_partitions: int | None = None,
) -> DataFrame:
    """Range-partition by entity, sort within partitions by (entity, *order).

    ``repartitionByRange`` samples key quantiles, so conversations land in
    contiguous, roughly equal-sized partitions — unlike hash partitioning it
    keeps range scans and the later per-conv window passes shuffle-free.
    """
    cols = [entity, *order]
    if num_partitions:
        out = df.repartitionByRange(num_partitions, entity)
    else:
        out = df.repartitionByRange(entity)
    return out.sortWithinPartitions(*cols)

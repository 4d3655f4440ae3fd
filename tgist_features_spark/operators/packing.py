"""Concat-and-chunk sequence packing — the operator that turns a document
corpus into fixed-size training context windows (GPT-style pretraining
concatenates every document's tokens in a canonical order and cuts the
stream every ``chunk_size`` tokens; a document may straddle a boundary).

The hard part at 100 TB is the GLOBAL running token count: a naive
``Window.orderBy(key)`` with no partition key collapses the whole corpus
into ONE task. This implementation is the classic two-phase distributed
prefix sum instead:

1. rows are assigned a deterministic, order-contiguous partition id from
   key arithmetic (``(key - min) * n_parts / span``) — no sampling, no
   ``spark_partition_id()``, so the plan is reproducible and layout-
   independent (repartitioning the input cannot change the output);
2. a partial aggregation produces per-partition token totals
   (``n_parts`` rows — kilobytes at any corpus size); a window over that
   TINY frame computes each partition's starting offset;
3. the offsets broadcast-join back and a ``partitionBy(__part)`` window
   finishes the within-partition running sum in parallel.

Cost: one shuffle of the (key, weight) projection by ``__part`` plus one
broadcast — vs the single-task global sort the naive plan would run.
Everything is integer arithmetic (``div``, not float division), so chunk
boundaries are exact at any corpus size and reproducible in any engine.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def pack_chunks(
    df: DataFrame,
    key_col: str,
    weight_col: str,
    chunk_size: int,
    n_parts: int = 0,
) -> DataFrame:
    """Assign every row (document) its span of fixed-size chunks.

    ``key_col``: unique integral column defining the canonical concat
    order. ``weight_col``: integral token count per row (rows with
    weight <= 0 occupy no tokens and are dropped). ``n_parts``: prefix-sum
    parallelism; 0 derives ~1M rows/partition from a count. Keys are
    assumed roughly uniform over their range (true for dense ids) — a
    skewed key space only unbalances the prefix-sum tasks, never the
    result.

    Returns one row per (document, chunk) incidence:
      key, n_tokens (doc total), chunk_id, offset_in_chunk (where the
      doc's tokens start inside this chunk), n_in_chunk (how many of the
      doc's tokens land in this chunk).

    Invariants (test-pinned): sum(n_in_chunk) per doc == n_tokens; every
    chunk except the last carries exactly ``chunk_size`` tokens.
    """
    if chunk_size <= 0:
        raise ValueError("pack_chunks: chunk_size must be positive")
    stats = df.select(
        F.min(key_col).alias("kmin"),
        F.max(key_col).alias("kmax"),
        F.count(F.lit(1)).alias("n"),
    ).collect()[0]  # 3 scalars off a column-pruned scan — driver-safe
    if stats.n == 0:
        empty = df.select(
            F.col(key_col),
            F.lit(0).cast("bigint").alias("n_tokens"),
            F.lit(0).cast("bigint").alias("chunk_id"),
            F.lit(0).cast("bigint").alias("offset_in_chunk"),
            F.lit(0).cast("bigint").alias("n_in_chunk"),
        )
        return empty.limit(0)
    if n_parts <= 0:
        n_parts = max(1, int(stats.n) // 1_000_000 + 1)
    span = int(stats.kmax) - int(stats.kmin) + 1

    w = F.col(weight_col).cast("bigint")
    part = (
        (F.col(key_col).cast("bigint") - F.lit(int(stats.kmin)))
        * F.lit(int(n_parts))
    ) / F.lit(span)
    parted = (
        df.filter(w > 0)
        .select(
            F.col(key_col),
            w.alias("__w"),
            F.floor(part).cast("bigint").alias("__part"),
        )
    )

    totals = parted.groupBy("__part").agg(F.sum("__w").alias("__tot"))
    off_w = Window.orderBy("__part").rowsBetween(Window.unboundedPreceding, -1)
    offsets = totals.select(  # n_parts rows: single-task window is fine
        "__part", F.coalesce(F.sum("__tot").over(off_w), F.lit(0)).alias("__off")
    )

    in_w = (
        Window.partitionBy("__part")
        .orderBy(key_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = parted.join(F.broadcast(offsets), "__part").select(
        F.col(key_col),
        F.col("__w"),
        (F.col("__off") + F.sum("__w").over(in_w)).alias("__cum"),
    )

    c = F.lit(int(chunk_size))
    prev = F.col("__cum") - F.col("__w")
    first = F.expr(f"(__cum - __w) div {int(chunk_size)}")
    last = F.expr(f"(__cum - 1) div {int(chunk_size)}")
    begin = F.greatest(prev, F.col("chunk_id") * c)
    return (
        cum.withColumn("chunk_id", F.explode(F.sequence(first, last)))
        .select(
            F.col(key_col),
            F.col("__w").alias("n_tokens"),
            F.col("chunk_id"),
            (begin - F.col("chunk_id") * c).alias("offset_in_chunk"),
            (
                F.least(F.col("__cum"), (F.col("chunk_id") + 1) * c) - begin
            ).alias("n_in_chunk"),
        )
    )


def deterministic_shuffle(
    df: DataFrame,
    key_col: str,
    salt: str = "shuffle",
    n_parts: int = 32,
) -> DataFrame:
    """Reproducible pseudo-random global training order: every row gets a
    0-based ``shuffle_rank`` by (md5-hash bucket, key) — the order a
    training loader should read the corpus in. ``orderBy(rand())`` is
    wrong twice at scale (nondeterministic across retries AND a global
    single-task sort); this is deterministic, layout-independent (depends
    only on key+salt), and parallel: the hash space [0, 1e6) splits into
    ``n_parts`` contiguous ranges, per-range counts broadcast their
    offsets back, and ranks finish with per-range window numbering — the
    same two-phase prefix sum as ``pack_chunks``, with counts for
    weights. Change ``salt`` to draw an independent epoch order.
    """
    from tgist_features_spark.operators.sampling import _N_BUCKETS, hash_bucket

    if n_parts <= 0:
        raise ValueError("deterministic_shuffle: n_parts must be positive")
    parted = df.withColumn("__b", hash_bucket(key_col, salt)).withColumn(
        "__part", F.expr(f"__b * {int(n_parts)} div {_N_BUCKETS}")
    )
    totals = parted.groupBy("__part").agg(F.count(F.lit(1)).alias("__tot"))
    off_w = Window.orderBy("__part").rowsBetween(Window.unboundedPreceding, -1)
    offsets = totals.select(  # n_parts rows: single-task window is fine
        "__part", F.coalesce(F.sum("__tot").over(off_w), F.lit(0)).alias("__off")
    )
    in_w = Window.partitionBy("__part").orderBy("__b", key_col)
    return (
        parted.join(F.broadcast(offsets), "__part")
        .withColumn(
            "shuffle_rank",
            (F.col("__off") + F.row_number().over(in_w) - 1).cast("bigint"),
        )
        .drop("__b", "__part", "__off")
    )

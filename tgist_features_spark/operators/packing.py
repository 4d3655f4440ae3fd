"""Concat-and-chunk sequence packing — the operator that turns a document
corpus into fixed-size training context windows (GPT-style pretraining
concatenates every document's tokens in a canonical order and cuts the
stream every ``chunk_size`` tokens; a document may straddle a boundary).

The hard part at 100 TB is the GLOBAL running token count: a naive
``Window.orderBy(key)`` with no partition key collapses the whole corpus
into ONE task. This implementation is the classic two-phase distributed
prefix sum instead:

1. rows are assigned a deterministic, order-contiguous partition id from
   a histogram-derived range partitioning (below) — layout-independent,
   and because the id is MONOTONE in the key, the final output is
   invariant to the exact part boundaries (the prefix sum telescopes the
   same way however the key axis is cut);
2. a partial aggregation produces per-partition token totals
   (``n_parts`` rows — kilobytes at any corpus size); a window over that
   TINY frame computes each partition's starting offset;
3. the offsets broadcast-join back and a ``partitionBy(__part)`` window
   finishes the within-partition running sum in parallel.

Cost: one shuffle of the (key, weight) projection by ``__part`` plus one
broadcast — vs the single-task global sort the naive plan would run.

Partition assignment (round-4 rewrite): the previous linear formula
``(key - kmin) * n_parts / span`` silently overflowed bigint for sparse
64-bit key spaces and unbalanced clustered ones. Now the pre-pass
aggregates an EXACT coarse histogram over a FIXED absolute grid (2048
buckets of width 2^53 covering all of int64 — no sampling, no data-
dependent grid), and the driver greedily builds contiguous key ranges of
~equal row count from it: consecutive light buckets merge into one part,
heavy buckets split linearly across their OBSERVED [min, max] extent.
An optional refinement pass (``refine=1``, default) re-counts per part
and linearly re-splits any part still over 2x target by its observed
extent — intra-bucket clustering collapses geometrically because splits
always use actual extents. All per-row arithmetic happens in DOUBLE
space (bigint→double is monotone, so part ids stay monotone in the key;
ratios are clamped into [0, m-1] BEFORE floor so nothing overflows), and
lookups are O(1) ``element_at`` into literal arrays whose size is
BOUNDED BY CONSTRUCTION: ``F.lit(list)`` lowers to a CreateArray with
one expression node per element (large arrays cost seconds of codegen
per job — measured), so the grid level is trimmed to the populated
coarse span (<= 2048 entries, usually a handful) and the refinement
level re-splits only the top ``_MAX_HOT_REFINE`` hottest parts (worst
offenders first; correctness never depends on balance, so the cap only
bounds how much skew one refinement pass can repair).
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_N_COARSE = 2048
_COARSE_W = 2.0 ** 63 / (_N_COARSE // 2)  # grid covers [-2^63, 2^63)
_MAX_HOT_REFINE = 1024  # refinement re-splits at most this many hot parts


def _coarse_id(dkey: Column) -> Column:
    """Fixed-grid bucket id in [-1024, 1023] — pure double arithmetic."""
    return F.greatest(
        F.least(F.floor(dkey / F.lit(_COARSE_W)), F.lit(_N_COARSE // 2 - 1)),
        F.lit(-(_N_COARSE // 2)),
    )


def _split_expr(dkey: Column, idx: Column, bases, los, steps, maxsubs) -> Column:
    """base[idx] + floor(clamp((dkey - lo[idx]) / step[idx], 0, maxsub[idx])).

    The clamp runs in double space BEFORE the floor, so a huge ratio (an
    m=1 entry with a placeholder step) can never overflow the bigint cast.
    """
    ratio = (dkey - F.element_at(F.lit(los), idx)) / F.element_at(F.lit(steps), idx)
    sub = F.floor(
        F.least(F.greatest(ratio, F.lit(0.0)), F.element_at(F.lit(maxsubs), idx))
    )
    return (F.element_at(F.lit(bases), idx) + sub).cast("bigint")


def _build_ranges(buckets, target):
    """Greedy contiguous part construction from (count, dmin, dmax) runs.

    Returns per-bucket (base, lo, step, maxsub) quadruples plus the total
    part count. Light consecutive buckets share a part; a bucket heavier
    than ~1.5x target splits linearly across its observed double extent.
    """
    bases, los, steps, maxsubs = [], [], [], []
    part, fill = 0, 0
    for cnt, dmin, dmax in buckets:
        if cnt == 0:  # unpopulated grid cell: monotone placeholder
            bases.append(float(part))
            los.append(0.0)
            steps.append(1.0)
            maxsubs.append(0.0)
            continue
        if cnt > max(1, int(1.5 * target)) and dmax > dmin:
            if fill > 0:
                part, fill = part + 1, 0
            m = max(2, math.ceil(cnt / target))
            bases.append(float(part))
            los.append(dmin)
            steps.append((dmax - dmin) / m)
            maxsubs.append(float(m - 1))
            part += m
        else:
            if fill > 0 and fill + cnt > int(1.5 * target):
                part, fill = part + 1, 0
            bases.append(float(part))
            los.append(0.0)
            steps.append(float("inf"))  # ratio -> 0 or inf, clamp -> 0
            maxsubs.append(0.0)
            fill += cnt
            if fill >= target:
                part, fill = part + 1, 0
    n_parts = part + (1 if fill > 0 else 0)
    return bases, los, steps, maxsubs, max(1, n_parts)


def _range_partition_expr(
    df: DataFrame,
    key_col: str,
    weight_col: str,
    n_parts: int,
    refine: int = 1,
):
    """Monotone, ~balanced part-id expression for the positive-weight rows.

    Returns (part_expr, n_rows, n_parts_actual). Runs 1 histogram job plus
    at most ``refine`` exact per-part count jobs (each a column-pruned
    partial aggregation — cheap next to the packing shuffle itself).
    """
    w = F.col(weight_col).cast("bigint")
    dkey = F.col(key_col).cast("double")
    hist = (
        df.filter(w > 0)
        .groupBy(_coarse_id(dkey).alias("__c"))
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.min(F.col(key_col).cast("bigint")).alias("kmin"),
            F.max(F.col(key_col).cast("bigint")).alias("kmax"),
        )
        .collect()
    )
    n_rows = sum(r.cnt for r in hist)
    if n_rows == 0:
        return F.lit(0).cast("bigint"), 0, 1
    if n_parts <= 0:
        n_parts = max(1, n_rows // 1_000_000 + 1)
    target = max(1, math.ceil(n_rows / n_parts))

    by_c = {r["__c"]: r for r in hist}
    if None in by_c:
        raise ValueError(
            "pack_chunks: null keys with positive weight — the key column "
            "must be a unique integral id (filter or assign ids first)"
        )
    # trim the lookup arrays to the POPULATED coarse span: F.lit(list)
    # lowers to a CreateArray with one child per element, so a full
    # 2048-cell array would cost seconds of Janino codegen PER JOB
    # (measured 6-8s on the pre-pass alone); the populated span is a
    # handful of cells for any realistically-clustered key space and at
    # most 2048 for keys spread across all of int64
    c_lo, c_hi = min(by_c), max(by_c)
    buckets = []
    for c in range(c_lo, c_hi + 1):
        r = by_c.get(c)
        buckets.append(
            (r.cnt, float(r.kmin), float(r.kmax)) if r is not None else (0, 0.0, 0.0)
        )
    bases, los, steps, maxsubs, got_parts = _build_ranges(buckets, target)
    clamped = F.greatest(F.least(_coarse_id(dkey), F.lit(c_hi)), F.lit(c_lo))
    idx = (clamped - F.lit(c_lo) + F.lit(1)).cast("int")
    expr = _split_expr(dkey, idx, bases, los, steps, maxsubs)

    for _ in range(max(0, refine)):
        counts = (
            df.filter(w > 0)
            .groupBy(expr.alias("__p"))
            .agg(
                F.count(F.lit(1)).alias("cnt"),
                F.min(F.col(key_col).cast("bigint")).alias("kmin"),
                F.max(F.col(key_col).cast("bigint")).alias("kmax"),
            )
            .collect()
        )
        if not any(r.cnt > 2 * target for r in counts):
            break
        by_p = {int(r["__p"]): r for r in counts}
        # bound the level-2 literal arrays: re-split only the hottest parts
        hot_ids = sorted(
            (p for p, r in by_p.items() if r.cnt > 2 * target),
            key=lambda p: -by_p[p].cnt,
        )[:_MAX_HOT_REFINE]
        hot_set = set(hot_ids)
        b2, l2, s2, m2 = [], [], [], []
        part = 0
        for p in range(got_parts):
            r = by_p.get(p)
            if r is None or p not in hot_set or r.kmax <= r.kmin:
                # keep (or collapse, if empty) as a single part; an empty
                # part's entry is never hit, it only pads the lookup array
                b2.append(float(part))
                l2.append(0.0)
                s2.append(float("inf"))
                m2.append(0.0)
                if r is not None:
                    part += 1
                continue
            m = max(2, math.ceil(r.cnt / target))
            b2.append(float(part))
            l2.append(float(r.kmin))
            s2.append((float(r.kmax) - float(r.kmin)) / m)
            m2.append(float(m - 1))
            part += m
        idx2 = (expr + F.lit(1)).cast("int")
        expr = _split_expr(dkey, idx2, b2, l2, s2, m2)
        got_parts = max(1, part)

    return expr, n_rows, got_parts


def pack_chunks(
    df: DataFrame,
    key_col: str,
    weight_col: str,
    chunk_size: int,
    n_parts: int = 0,
    refine: int = 1,
    pad_to_boundary: bool = False,
) -> DataFrame:
    """Assign every row (document) its span of fixed-size chunks.

    ``key_col``: unique integral column defining the canonical concat
    order. ``weight_col``: integral token count per row (rows with
    weight <= 0 occupy no tokens and are dropped). ``n_parts``: prefix-sum
    parallelism; 0 derives ~1M rows/partition from the histogram count.
    ``refine``: max exact re-count passes used to re-split parts left hot
    by intra-bucket key clustering (0 disables; the OUTPUT is identical
    either way — balance only affects prefix-sum task sizes).
    ``pad_to_boundary=True`` gives the no-cross-document-attention
    variant: every document starts at a fresh chunk boundary (its slot is
    padded up to a multiple of ``chunk_size``), so no chunk ever mixes
    two documents — the prefix sum simply runs over the PADDED weights
    while the span arithmetic keeps the real ones (a document's tokens
    sit at offset 0 of its first chunk; the final chunk's shortfall is
    the padding a loader inserts).

    Returns one row per (document, chunk) incidence:
      key, n_tokens (doc total), chunk_id, offset_in_chunk (where the
      doc's tokens start inside this chunk), n_in_chunk (how many of the
      doc's tokens land in this chunk).

    Invariants (test-pinned): sum(n_in_chunk) per doc == n_tokens; every
    chunk except the last carries exactly ``chunk_size`` tokens; output is
    bit-identical for ANY n_parts / refine / input layout (the partition
    id is monotone in the key, which is the only property the two-phase
    prefix sum needs).
    """
    if chunk_size <= 0:
        raise ValueError("pack_chunks: chunk_size must be positive")
    part_expr, n_rows, _ = _range_partition_expr(
        df, key_col, weight_col, n_parts, refine
    )
    if n_rows == 0:
        empty = df.select(
            F.col(key_col),
            F.lit(0).cast("bigint").alias("n_tokens"),
            F.lit(0).cast("bigint").alias("chunk_id"),
            F.lit(0).cast("bigint").alias("offset_in_chunk"),
            F.lit(0).cast("bigint").alias("n_in_chunk"),
        )
        return empty.limit(0)

    w = F.col(weight_col).cast("bigint")
    cs = int(chunk_size)
    # the prefix sum runs over __wsum (padded when pad_to_boundary); the
    # span arithmetic below always uses the REAL weight __w
    wsum = (
        F.expr(f"(({weight_col} + {cs - 1}) div {cs}) * {cs}").cast("bigint")
        if pad_to_boundary
        else w
    )
    parted = df.filter(w > 0).select(
        F.col(key_col),
        w.alias("__w"),
        wsum.alias("__wsum"),
        part_expr.alias("__part"),
    )

    totals = parted.groupBy("__part").agg(F.sum("__wsum").alias("__tot"))
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
        # __cum = end of the doc's REAL tokens: padded prefix of everything
        # before it, plus its own real weight
        (
            F.col("__off")
            + F.sum("__wsum").over(in_w)
            - F.col("__wsum")
            + F.col("__w")
        ).alias("__cum"),
    )

    c = F.lit(cs)
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
    weights. The hash buckets are uniform BY CONSTRUCTION (md5), so no
    histogram is needed here, and ``__b * n_parts`` is overflow-safe for
    any plausible n_parts (__b < 1e6, so bigint holds through n_parts ~
    9e12). Change ``salt`` to draw an independent epoch order.
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

"""Lineage manifest + idempotent resume (S4/J6, SURVEY.md §4.2.3).

The reference kept per-file done-markers so re-runs skipped processed
documents; the engine's generalization is a checkpoint manifest at
partition (bucket-of-conv_id) granularity:

* every completed bucket appends one lineage row:
  (run_id, snapshot_id, bucket, rows_in, rows_out, watermark_us)
* resume = anti-join the input's buckets against the manifest rows for
  the SAME input snapshot — only unfinished buckets are recomputed.

Bucket-level resume is *exact* because every feature is a pure function
of its own conversation (zero cross-conversation state — the same
property that makes the reference's per-file skip sound), and
bucket = f(conv_id) never splits a conversation.

Failure model: a crash mid-bucket leaves parquet part-files without a
manifest row; the rerun overwrites that bucket's directory (dynamic
partition overwrite) before re-appending — at-least-once write, exactly-
once visibility through the manifest.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from tgist_features_spark.functions.timeu import us
from tgist_features_spark.plans.backfill import turn_features
from tgist_features_spark.sources.table_io import TableIO

MANIFEST_SCHEMA = T.StructType(
    [
        T.StructField("run_id", T.StringType(), False),
        T.StructField("snapshot_id", T.StringType(), False),
        T.StructField("bucket", T.LongType(), False),
        T.StructField("rows_in", T.LongType(), False),
        T.StructField("rows_out", T.LongType(), False),
        T.StructField("watermark_us", T.LongType(), True),
    ]
)

FEATURES_TABLE = "features"
MANIFEST_TABLE = "manifest"


def bucket_of(col: str, n_buckets: int):
    return F.pmod(F.xxhash64(col), F.lit(n_buckets)).cast("long")


def done_buckets(io: TableIO, snapshot_id: str) -> list[int]:
    if not io.exists(MANIFEST_TABLE):
        return []
    m = io.spark.read.parquet(io.path(MANIFEST_TABLE))
    rows = (
        m.filter(F.col("snapshot_id") == snapshot_id)
        .select("bucket")
        .distinct()
        .collect()
    )
    return sorted(r["bucket"] for r in rows)


def run_incremental(
    spark: SparkSession,
    io: TableIO,
    transcripts: DataFrame,
    snapshot_id: str,
    run_id: str,
    n_buckets: int = 16,
    gap_s: float = 1800.0,
    fail_after_buckets: int | None = None,
) -> dict:
    """Compute + sink per-turn features for every bucket not yet in the
    manifest for this input snapshot. Returns a small summary dict.

    ``fail_after_buckets`` (tests only) simulates a crash by processing
    just the first K pending buckets — manifest rows exist only for them,
    exactly like a mid-run kill between bucket commits.
    """
    done = set(done_buckets(io, snapshot_id))
    src = transcripts.withColumn("bucket", bucket_of("conv_id", n_buckets))
    pending = sorted(set(range(n_buckets)) - done)
    if fail_after_buckets is not None:
        pending = pending[:fail_after_buckets]
    if not pending:
        return {"snapshot_id": snapshot_id, "buckets_done": sorted(done),
                "buckets_run": [], "rows_out": 0}

    todo = src.filter(F.col("bucket").isin([int(b) for b in pending]))
    rows_in_by_bucket = {
        r["bucket"]: r["n"]
        for r in todo.groupBy("bucket").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    feats = turn_features(todo.drop("bucket"), gap_s=gap_s).withColumn(
        "bucket", bucket_of("conv_id", n_buckets)
    )

    # overwrite exactly the pending bucket partitions (crash-safe rerun),
    # leaving completed buckets untouched; restore the session-level mode
    # afterwards so other writers keep static-overwrite semantics
    prev_mode = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        feats.write.mode("overwrite").partitionBy("bucket").parquet(
            io.path(FEATURES_TABLE)
        )
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev_mode)

    # a pending bucket with ZERO input rows is never touched by the dynamic
    # partition overwrite, so a PRIOR snapshot's data could linger in its
    # directory and pollute both read_features and the read-back stats —
    # clear such directories explicitly (the Iceberg form of this is the
    # REPLACE semantics of the snapshot commit)
    pending_with_rows = [b for b in pending if rows_in_by_bucket.get(b, 0) > 0]
    for b in pending:
        if b not in rows_in_by_bucket:
            io.delete_partition(FEATURES_TABLE, f"bucket={int(b)}")

    # manifest stats come from READING BACK the bucket partitions just
    # written (partition-pruned scan), not from re-running the feature plan:
    # the expensive plan executes exactly once (the sink write above), and
    # the manifest records what is actually on disk — no drift window.
    # explicit schema: when every pending bucket had zero input rows the
    # write produced no part files, and schema inference would fail
    stat_rows: dict = {}
    if pending_with_rows:
        written = (
            io.spark.read.schema(feats.schema)
            .parquet(io.path(FEATURES_TABLE))
            .filter(F.col("bucket").isin([int(b) for b in pending_with_rows]))
        )
        stat_rows = {
            int(r["bucket"]): r
            for r in written.groupBy("bucket")
            .agg(
                F.count(F.lit(1)).alias("rows_out"),
                F.max(us("ts")).alias("watermark_us"),
            )
            .collect()
        }
    # every pending bucket gets a manifest row — including zero-input
    # buckets (rows_out=0, watermark NULL), which otherwise would be
    # re-selected as pending on every resume forever
    manifest_rows = [
        (
            run_id,
            snapshot_id,
            int(b),
            int(rows_in_by_bucket.get(b, 0)),
            int(stat_rows[b]["rows_out"]) if b in stat_rows else 0,
            stat_rows[b]["watermark_us"] if b in stat_rows else None,
        )
        for b in pending
    ]
    stats = spark.createDataFrame(manifest_rows, MANIFEST_SCHEMA)
    stats.write.mode("append").parquet(io.path(MANIFEST_TABLE))
    return {
        "snapshot_id": snapshot_id,
        "buckets_done": sorted(done),
        "buckets_run": sorted(pending),
        "rows_out": sum(r[4] for r in manifest_rows),
    }


def read_features(io: TableIO) -> DataFrame:
    return io.spark.read.parquet(io.path(FEATURES_TABLE))

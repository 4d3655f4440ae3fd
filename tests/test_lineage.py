"""Lineage manifest + resume idempotence (SURVEY.md §5: resume tests)."""

from __future__ import annotations

import numpy as np
import pytest

from tgist_features_spark.plans.backfill import FEATURE_COLS
from tgist_features_spark.plans.lineage import (
    done_buckets,
    read_features,
    run_incremental,
)
from tgist_features_spark.sources.corpus import transcripts_df
from tgist_features_spark.sources.table_io import TableIO


@pytest.fixture()
def io(spark, tmp_path):
    return TableIO(spark, str(tmp_path))


def _canon(pdf):
    return (
        pdf.sort_values(["conv_id", "turn_idx"], kind="mergesort")
        .reset_index(drop=True)
    )


def test_crash_resume_equals_single_run(spark, tiny_pdf, tmp_path, io):
    df = transcripts_df(spark, tiny_pdf)
    snap = "snap-a"

    # phase 1: "crash" after 3 buckets
    s1 = run_incremental(spark, io, df, snap, run_id="r1",
                         n_buckets=8, fail_after_buckets=3)
    assert len(s1["buckets_run"]) <= 3
    assert done_buckets(io, snap) == s1["buckets_run"]

    # phase 2: resume completes the rest
    s2 = run_incremental(spark, io, df, snap, run_id="r2", n_buckets=8)
    assert set(s1["buckets_run"]).isdisjoint(s2["buckets_run"])

    # single uninterrupted run in a fresh location
    io2 = TableIO(spark, str(tmp_path / "single"))
    run_incremental(spark, io2, df, snap, run_id="r0", n_buckets=8)

    a = _canon(read_features(io).toPandas())
    b = _canon(read_features(io2).toPandas())
    assert len(a) == len(b) == len(tiny_pdf)
    assert (a["text"].to_numpy() == b["text"].to_numpy()).all()
    for c in FEATURE_COLS:
        np.testing.assert_allclose(
            a[c].astype(float), b[c].astype(float), equal_nan=True, err_msg=c
        )


def test_rerun_is_noop(spark, tiny_pdf, io):
    df = transcripts_df(spark, tiny_pdf)
    run_incremental(spark, io, df, "snap-b", run_id="r1", n_buckets=4)
    before = read_features(io).count()
    s = run_incremental(spark, io, df, "snap-b", run_id="r2", n_buckets=4)
    assert s["buckets_run"] == [] and s["rows_out"] == 0
    assert read_features(io).count() == before


def test_new_snapshot_reprocesses(spark, tiny_pdf, io):
    df = transcripts_df(spark, tiny_pdf)
    run_incremental(spark, io, df, "snap-c", run_id="r1", n_buckets=4)
    s = run_incremental(spark, io, df, "snap-d", run_id="r2", n_buckets=4)
    assert len(s["buckets_run"]) == 4, "a new input snapshot redoes all buckets"


def test_manifest_contents(spark, tiny_pdf, io):
    df = transcripts_df(spark, tiny_pdf)
    run_incremental(spark, io, df, "snap-e", run_id="r1", n_buckets=4)
    m = spark.read.parquet(io.path("manifest")).toPandas()
    assert set(m.columns) == {
        "run_id", "snapshot_id", "bucket", "rows_in", "rows_out", "watermark_us"
    }
    assert m["rows_out"].sum() == len(tiny_pdf)
    assert (m["rows_in"] == m["rows_out"]).all(), "per-bucket rows_in"
    assert (m["watermark_us"] > 0).all()


def test_crash_without_manifest_row_is_overwritten(spark, tiny_pdf, io):
    """Features written but manifest row missing (crash between the two
    writes) -> rerun overwrites that bucket partition, no duplicates."""
    df = transcripts_df(spark, tiny_pdf)
    run_incremental(spark, io, df, "snap-f", run_id="r1", n_buckets=4)
    # simulate: drop manifest rows for bucket 0 (features remain on disk)
    m = spark.read.parquet(io.path("manifest")).filter("bucket <> 0")
    m.toPandas().to_parquet(io.path("manifest") + "/rewrite.parquet")
    import glob
    import os
    for f in glob.glob(io.path("manifest") + "/part-*.parquet"):
        os.remove(f)
    assert 0 not in done_buckets(io, "snap-f")
    run_incremental(spark, io, df, "snap-f", run_id="r2", n_buckets=4)
    total = read_features(io).count()
    assert total == len(tiny_pdf), "bucket rewrite must not duplicate rows"


def test_zero_row_buckets_get_manifest_rows(spark, tiny_pdf, io):
    """A pending bucket with no input rows must still record a manifest row
    (rows_out=0) — otherwise it is re-selected as pending on every resume
    forever and the 'rerun is noop' contract breaks."""
    df = transcripts_df(spark, tiny_pdf)
    n_buckets = 64  # far more buckets than conversations -> some are empty
    s1 = run_incremental(spark, io, df, "snap-z", run_id="r1", n_buckets=n_buckets)
    assert s1["buckets_run"] == list(range(n_buckets))
    assert done_buckets(io, "snap-z") == list(range(n_buckets))
    m = spark.read.parquet(io.path("manifest")).toPandas()
    assert len(m) == n_buckets
    empties = m[m["rows_out"] == 0]
    assert len(empties) > 0, "fixture should leave some buckets empty"
    assert (empties["rows_in"] == 0).all()
    assert empties["watermark_us"].isna().all()
    s2 = run_incremental(spark, io, df, "snap-z", run_id="r2", n_buckets=n_buckets)
    assert s2["buckets_run"] == [] and s2["rows_out"] == 0


def test_stale_partition_cleared_for_zero_input_bucket(spark, tiny_pdf, io):
    """Reusing a warehouse across snapshots: a bucket that had rows under
    snapshot A but zero input rows under snapshot B must not leak A's data
    into B's features or B's manifest stats."""
    from tgist_features_spark.plans.lineage import bucket_of
    from pyspark.sql import functions as F

    df = transcripts_df(spark, tiny_pdf)
    run_incremental(spark, io, df, "snap-s1", run_id="r1", n_buckets=4)
    feats_a = read_features(io)
    a_bucket3 = feats_a.filter(F.col("bucket") == 3).count()
    assert a_bucket3 > 0, "fixture should populate bucket 3 under snapshot A"

    # snapshot B: remove every conversation that hashes to bucket 3
    df_b = df.withColumn("b", bucket_of("conv_id", 4)).filter("b <> 3").drop("b")
    run_incremental(spark, io, df_b, "snap-s2", run_id="r2", n_buckets=4)
    assert read_features(io).filter(F.col("bucket") == 3).count() == 0, (
        "snapshot A's rows must not linger in B's bucket-3 partition"
    )
    m = spark.read.parquet(io.path("manifest")).toPandas()
    b3 = m[(m["snapshot_id"] == "snap-s2") & (m["bucket"] == 3)]
    assert len(b3) == 1 and int(b3["rows_out"].iloc[0]) == 0
    assert int(b3["rows_in"].iloc[0]) == 0

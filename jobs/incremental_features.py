#!/usr/bin/env python
"""Incremental, resumable feature materialization (S4/J6).

    python jobs/incremental_features.py --input <transcripts_parquet> \
        --warehouse /path/wh [--n-buckets 16] [--run-id r1] \
        [--fail-after K]   # test hook: simulate a crash after K buckets

Every completed bucket(conv_id) partition appends a lineage row to the
manifest; reruns skip completed buckets for the same input snapshot —
idempotent resume at partition granularity. Prints one JSON summary line.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import uuid

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tgist_features_spark import get_spark  # noqa: E402
from tgist_features_spark.plans.lineage import run_incremental  # noqa: E402
from tgist_features_spark.sources.table_io import TableIO  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True)
    ap.add_argument("--warehouse", required=True)
    ap.add_argument("--n-buckets", type=int, default=16)
    ap.add_argument("--run-id", default=None)
    ap.add_argument("--gap-s", type=float, default=1800.0)
    ap.add_argument("--master", default=None)
    ap.add_argument("--fail-after", type=int, default=None)
    args = ap.parse_args()

    spark = get_spark(master=args.master, app_name="tgist-incremental")
    spark.sparkContext.setLogLevel("ERROR")
    io = TableIO(spark, args.warehouse)

    # snapshot surrogate of the INPUT (content hash of its file listing)
    input_io = TableIO(spark, os.path.dirname(args.input.rstrip("/")))
    snapshot = input_io.snapshot_id(os.path.basename(args.input.rstrip("/")))

    transcripts = spark.read.parquet(args.input)
    summary = run_incremental(
        spark,
        io,
        transcripts,
        snapshot_id=snapshot,
        run_id=args.run_id or f"run-{uuid.uuid4().hex[:8]}",
        n_buckets=args.n_buckets,
        gap_s=args.gap_s,
        fail_after_buckets=args.fail_after,
    )
    print(json.dumps(summary))
    spark.stop()


if __name__ == "__main__":
    main()

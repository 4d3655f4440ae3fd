#!/usr/bin/env python
"""Streaming feature-maintenance job — spark-submit --py-files.

    spark-submit --master local[32] --py-files tgist_features_spark.zip \
        jobs/stream_features.py --input /path/transcripts_parquet \
        --warehouse /path/wh [--continuous]

Replays (or follows) the transcript directory as a file-source stream,
dedups re-delivery within the watermark, computes the incremental per-conv
features (applyInPandasWithState) and sinks them into the SAME
bucket(conv_id)-partitioned layout as the batch feature table
(streaming/stream.py:stream_features_writer). Default is one availableNow
pass (bootstrap/catch-up); --continuous keeps following new files.
Prints one JSON line with rows written and wall time.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tgist_features_spark import get_spark  # noqa: E402
from tgist_features_spark.sources.table_io import TableIO  # noqa: E402
from tgist_features_spark.streaming.stream import (  # noqa: E402
    STREAM_FEATURES_TABLE,
    read_transcript_stream,
    stream_features_writer,
)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True, help="transcripts parquet dir")
    ap.add_argument("--warehouse", required=True)
    ap.add_argument("--n-buckets", type=int, default=None,
                    help="defaults to the warehouse TableIO bucket count")
    ap.add_argument("--delay", default="30 minutes", help="watermark delay")
    ap.add_argument("--master", default=None)
    ap.add_argument("--continuous", action="store_true",
                    help="keep following new files instead of one "
                         "availableNow catch-up pass")
    ap.add_argument("--timeout-s", type=int, default=None,
                    help="with --continuous: stop after N seconds")
    args = ap.parse_args()

    spark = get_spark(master=args.master, app_name="tgist-stream-features")
    spark.sparkContext.setLogLevel("ERROR")

    io = TableIO(spark, args.warehouse)
    if args.n_buckets:
        io.n_buckets = args.n_buckets
    stream = read_transcript_stream(spark, args.input)
    writer = stream_features_writer(stream, io, delay=args.delay)

    t0 = time.perf_counter()
    if args.continuous:
        q = writer.start()
        q.awaitTermination(args.timeout_s)
        q.stop()
    else:
        q = writer.trigger(availableNow=True).start()
        q.awaitTermination()
    wall = time.perf_counter() - t0

    out_path = io.path(STREAM_FEATURES_TABLE)
    rows = (
        spark.read.parquet(out_path).count() if os.path.isdir(out_path) else 0
    )
    print(json.dumps({
        "job": "stream_features",
        "rows_in_table": rows,
        "wall_s": round(wall, 3),
        "mode": "continuous" if args.continuous else "available_now",
    }))
    spark.stop()


if __name__ == "__main__":
    main()

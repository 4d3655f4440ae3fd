#!/usr/bin/env python
"""Streaming ingest-time dedup job — spark-submit --py-files.

    spark-submit --master local[32] --py-files tgist_features_spark.zip \
        jobs/stream_dedup.py --input /path/documents_parquet \
        --warehouse /path/wh [--continuous]

Replays (or follows) a document directory as a file-source stream and
ingests it deduplicated: every micro-batch drops texts already ingested
(within-batch keep-smallest-id, cross-batch anti-join against the
persistent md5 fingerprint table — streaming/stream.py:
stream_dedup_writer). Restart-idempotent via the checkpoint + batch
markers. Prints one JSON line with docs ingested and wall time.
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
    DEDUP_DOCS_TABLE,
    stream_dedup_writer,
)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True,
                    help="documents parquet DIRECTORY (file streams track "
                         "a directory, not a single file)")
    ap.add_argument("--warehouse", required=True)
    ap.add_argument("--id-col", default="doc_id")
    ap.add_argument("--text-col", default="text")
    ap.add_argument("--schema", default="long:string",
                    help="id:text column types, e.g. 'long:string'")
    ap.add_argument("--master", default=None)
    ap.add_argument("--continuous", action="store_true")
    ap.add_argument("--timeout-s", type=int, default=None)
    args = ap.parse_args()

    spark = get_spark(master=args.master, app_name="tgist-stream-dedup")
    spark.sparkContext.setLogLevel("ERROR")

    io = TableIO(spark, args.warehouse)
    # stream schema from one batch read of the source (file streams need an
    # explicit schema; the source directory itself is the authority)
    schema = spark.read.parquet(args.input).schema
    stream = spark.readStream.schema(schema).parquet(args.input)
    writer = stream_dedup_writer(
        stream, io, id_col=args.id_col, text_col=args.text_col
    )

    t0 = time.perf_counter()
    if args.continuous:
        q = writer.trigger(processingTime="5 seconds").start()
        q.awaitTermination(args.timeout_s) if args.timeout_s else q.awaitTermination()
        q.stop()
    else:
        q = writer.trigger(availableNow=True).start()
        q.awaitTermination()
    wall = time.perf_counter() - t0

    n = (
        spark.read.parquet(io.path(DEDUP_DOCS_TABLE)).count()
        if io.exists(DEDUP_DOCS_TABLE)
        else 0
    )
    print(
        json.dumps(
            {
                "job": "stream_dedup",
                "docs_in_table": n,
                "wall_s": round(wall, 3),
                "mode": "continuous" if args.continuous else "available_now",
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()

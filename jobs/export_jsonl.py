#!/usr/bin/env python
"""Parquet -> JSONL export — the handoff format most tokenizer/training
stacks consume. Ships as spark-submit --py-files.

    spark-submit --master local[32] --py-files tgist_features_spark.zip \
        jobs/export_jsonl.py --input /path/documents_parquet \
        --output /path/jsonl --columns doc_id,text --shards 32

Writes one JSONL part-file per shard (repartition by count, not a global
sort — shard membership is arbitrary, which is what the downstream
shuffled loader expects). Prints one JSON line; round-trip integrity is
checkable with sources/jsonl.read_jsonl (corrupt count must be 0).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tgist_features_spark import get_spark  # noqa: E402
from tgist_features_spark.sources.jsonl import write_jsonl  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True, help="input parquet path")
    ap.add_argument("--output", required=True, help="JSONL output directory")
    ap.add_argument("--columns", default=None,
                    help="comma-separated column subset (default: all)")
    ap.add_argument("--shards", type=int, default=0,
                    help="output file count (0 = keep input partitioning)")
    ap.add_argument("--master", default=None)
    args = ap.parse_args()

    spark = get_spark(master=args.master, app_name="tgist-export")
    spark.sparkContext.setLogLevel("ERROR")

    df = spark.read.parquet(args.input)
    if args.columns:
        df = df.select(*[c.strip() for c in args.columns.split(",")])
    if args.shards > 0:
        df = df.repartition(args.shards)
    t0 = time.perf_counter()
    write_jsonl(df, args.output)
    n = spark.read.text(args.output).count()  # lines written == rows
    wall = time.perf_counter() - t0

    print(
        json.dumps(
            {
                "job": "export_jsonl",
                "rows": n,
                "columns": df.columns,
                "wall_s": round(wall, 3),
                "rows_per_sec": round(n / wall, 1),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""Production backfill job — ships as spark-submit --py-files (north_rule).

    spark-submit --master local[32] --py-files tgist_features_spark.zip \
        jobs/backfill_features.py --input /path/transcripts_parquet \
        --queries /path/queries_parquet --output /path/out --salted

Reads the transcript table, computes the leakage-free per-turn feature
vectors, as-of backfills the probe side, writes the result (parquet or the
'noop' sink for benchmarking), and prints one JSON line with wall time and
turns/sec. Also runnable directly with python (it builds its own session).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tgist_features_spark import get_spark  # noqa: E402
from tgist_features_spark.plans.backfill import backfill_features, turn_features  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True, help="transcripts parquet path")
    ap.add_argument("--queries", default=None, help="probe-side parquet path")
    ap.add_argument("--output", default="noop", help="output path or 'noop'")
    ap.add_argument("--master", default=None)
    ap.add_argument("--shuffle-partitions", type=int, default=None)
    ap.add_argument("--salted", action="store_true",
                    help="skew-adaptive as-of (salt hot conversations)")
    ap.add_argument("--hot-threshold", type=int, default=1000)
    ap.add_argument("--slice-width-s", type=int, default=3600)
    ap.add_argument("--gap-s", type=float, default=1800.0)
    args = ap.parse_args()

    spark = get_spark(master=args.master, shuffle_partitions=args.shuffle_partitions,
                      app_name="tgist-backfill")
    spark.sparkContext.setLogLevel("ERROR")

    transcripts = spark.read.parquet(args.input)
    n_turns = transcripts.count()  # warm the scan + JVM before timing

    t0 = time.perf_counter()
    feats = turn_features(transcripts, gap_s=args.gap_s)
    if args.queries:
        probes = spark.read.parquet(args.queries)
        out = backfill_features(
            feats,
            probes,
            slice_width_s=args.slice_width_s,
            hot_threshold=args.hot_threshold if args.salted else None,
        )
    else:
        out = feats
    if args.output == "noop":
        out.write.mode("overwrite").format("noop").save()
    else:
        out.write.mode("overwrite").parquet(args.output)
    wall = time.perf_counter() - t0

    print(
        json.dumps(
            {
                "job": "backfill_features",
                "master": spark.sparkContext.master,
                "turns": n_turns,
                "wall_s": round(wall, 3),
                "turns_per_sec": round(n_turns / wall, 1),
                "salted": args.salted,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()

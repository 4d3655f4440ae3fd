#!/usr/bin/env python
"""Corpus drift report job — spark-submit --py-files.

    spark-submit --master local[32] --py-files tgist_features_spark.zip \
        jobs/drift_report.py --ref /path/ref_parquet --new /path/new_parquet \
        --value-col n_chars --report /path/drift

The admission check a training-data pipeline runs before merging a new
crawl snapshot into an existing corpus: the NEW corpus's value
distribution against the REFERENCE corpus's equi-depth bins
(operators/aggregates.py population_drift — integer counts end-to-end,
rank-arithmetic boundaries over the distinct-value relation). Writes
the per-bin table to <report> and prints ONE JSON line with the bin
count, both totals, and the PSI (the one float, computed at the edge
from the integer counts with the standard 0.5-row Laplace floor on
empty cells so PSI stays finite).

PSI reading, for the admission gate: < 0.1 stable, 0.1-0.25 moderate
shift, > 0.25 investigate before admitting.
"""

from __future__ import annotations

import argparse
import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tgist_features_spark import get_spark  # noqa: E402
from tgist_features_spark.operators.aggregates import (  # noqa: E402
    population_drift,
)
from tgist_features_spark.session import warm_python_workers  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--ref", required=True, help="reference corpus parquet")
    ap.add_argument("--new", required=True, help="candidate corpus parquet")
    ap.add_argument("--value-col", default="n_chars")
    ap.add_argument("--bins", type=int, default=10)
    ap.add_argument("--report", required=True, help="per-bin parquet out")
    ap.add_argument("--master", default=None)
    args = ap.parse_args()

    spark = get_spark(master=args.master, app_name="tgist-drift")
    spark.sparkContext.setLogLevel("ERROR")

    ref = spark.read.parquet(args.ref)
    new = spark.read.parquet(args.new)
    n_ref_in = ref.count()  # warm the scans before timing
    n_new_in = new.count()
    if n_ref_in == 0 or n_new_in == 0:
        # a zero-row corpus is a wrong path / stale upstream, not a
        # drift answer — the same silent-empty refusal the dedup
        # pipeline's ref-cache check makes
        raise SystemExit(
            f"drift_report: empty corpus (ref={n_ref_in} rows, "
            f"new={n_new_in} rows) — check --ref/--new paths"
        )
    warm_python_workers(spark)

    t0 = time.perf_counter()
    table = population_drift(ref, new, args.value_col, n_bins=args.bins)
    table.write.mode("overwrite").parquet(args.report)
    rows = spark.read.parquet(args.report).collect()  # n_bins bounded rows
    wall = time.perf_counter() - t0

    rows.sort(key=lambda r: r["bin"])
    ref_total = rows[0]["ref_total"] if rows else 0
    new_total = rows[0]["new_total"] if rows else 0
    psi = 0.0
    for r in rows:
        # Laplace 0.5-row floor keeps empty cells finite without moving
        # occupied cells measurably
        p = max(r["ref_n"], 0.5) / max(ref_total, 1)
        q = max(r["new_n"], 0.5) / max(new_total, 1)
        psi += (q - p) * math.log(q / p)

    # binned KS beside PSI (the location-shift lens): max CDF gap as
    # integer cross-products, float only at this print edge
    cr = cn = 0
    ks_num = 0
    for r in sorted(rows, key=lambda r: r["bin"]):
        cr += r["ref_n"]
        cn += r["new_n"]
        ks_num = max(ks_num, abs(cr * new_total - cn * ref_total))
    ks = ks_num / (ref_total * new_total) if ref_total and new_total else 0.0

    print(json.dumps({
        "job": "drift_report",
        "value_col": args.value_col,
        "bins": len(rows),
        "ref_total": ref_total,
        "new_total": new_total,
        "psi": round(psi, 6),
        "ks": round(ks, 6),
        "verdict": ("stable" if psi < 0.1
                    else "moderate_shift" if psi < 0.25 else "investigate"),
        "wall_s": round(wall, 3),
    }))
    spark.stop()


if __name__ == "__main__":
    main()

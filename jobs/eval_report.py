#!/usr/bin/env python
"""Score-quality evaluation report job — spark-submit --py-files.

    spark-submit --master local[32] --py-files tgist_features_spark.zip \
        jobs/eval_report.py --input /path/scored_parquet \
        --score-col score --label-col label --group-col segment \
        --report /path/eval

The readout a pipeline runs on any scored table (quality classifier,
near-dup score, retrieval ranker) before acting on the scores: per
group an EXACT ROC AUC as an integer fraction (group_auc — does the
score rank positives above negatives) and an equi-depth calibration
table (calibration_bins — when the score says decile k, how often is
the label true), both integer end-to-end so the report is bitwise
reproducible anywhere.

Writes two tables under <report>/ (auc, calibration) and prints ONE
JSON line: groups, rows used, undefined-AUC group count, micro AUC
(the one float, computed at the edge from the exact global fractions),
and the worst calibration bin (largest |observed - expected| gap in
doubled-rate units). Invariants a checker can hold with DuckDB:
calibration's sum(n_rows) == the job's rows_used; every auc row has
auc_den == 2*n_pos*n_neg; 0 <= auc_num <= auc_den.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from tgist_features_spark import get_spark  # noqa: E402
from tgist_features_spark.operators.aggregates import (  # noqa: E402
    calibration_bins,
    group_auc,
)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True, help="scored table parquet")
    ap.add_argument("--score-col", required=True)
    ap.add_argument("--label-col", required=True)
    ap.add_argument("--group-col", required=True)
    ap.add_argument("--id-col", default=None,
                    help="deterministic tiebreak for calibration bins; "
                    "defaults to the score column itself (ties then split "
                    "by engine order WITHIN equal scores only)")
    ap.add_argument("--bins", type=int, default=10)
    ap.add_argument("--report", required=True, help="output dir")
    ap.add_argument("--master", default=None)
    args = ap.parse_args()

    spark = get_spark(master=args.master, app_name="tgist-eval")
    spark.sparkContext.setLogLevel("ERROR")
    t0 = time.perf_counter()

    df = spark.read.parquet(args.input)
    for c in (args.score_col, args.label_col, args.group_col):
        if c not in df.columns:
            print(json.dumps({"error": f"missing column {c}"}))
            sys.exit(1)
    id_col = args.id_col or args.score_col
    used = df.filter(
        F.col(args.score_col).isNotNull() & F.col(args.label_col).isNotNull()
    )
    rows_used = used.count()
    if rows_used == 0:
        # an all-NULL score/label table is a wrong path, not an answer
        print(json.dumps({"error": "no rows with non-NULL score and label"}))
        sys.exit(1)

    auc = group_auc(used, args.score_col, args.label_col, args.group_col)
    cal = calibration_bins(
        used, args.score_col, args.label_col, args.group_col, id_col,
        n_bins=args.bins,
    )
    auc.write.mode("overwrite").parquet(os.path.join(args.report, "auc"))
    cal.write.mode("overwrite").parquet(
        os.path.join(args.report, "calibration")
    )

    a = spark.read.parquet(os.path.join(args.report, "auc"))
    agg = a.agg(
        F.count(F.lit(1)).alias("groups"),
        F.sum(F.when(F.col("auc_den") == 0, 1).otherwise(0)).alias("undef"),
        F.sum("auc_num").alias("num"),
        F.sum("auc_den").alias("den"),
    ).collect()[0]
    c = spark.read.parquet(os.path.join(args.report, "calibration"))
    # worst bin: largest |n_pos/n_rows - global_rate| in exact cross units
    gr = c.agg(F.sum("n_pos").alias("p"), F.sum("n_rows").alias("n")).collect()[0]
    worst = (
        c.withColumn(
            "__gap", F.abs(F.col("n_pos") * F.lit(int(gr["n"]))
                           - F.lit(int(gr["p"])) * F.col("n_rows"))
        )
        .orderBy(F.col("__gap").desc(), "bin")
        .select(args.group_col, "bin", "n_pos", "n_rows")
        .first()
    )
    print(json.dumps({
        "rows_used": rows_used,
        "groups": int(agg["groups"]),
        "undefined_auc_groups": int(agg["undef"]),
        "micro_auc": (round(float(agg["num"]) / float(agg["den"]), 6)
                      if agg["den"] else None),
        "calibration_rows": c.count(),
        "calibration_mass_ok": int(
            c.agg(F.sum("n_rows")).collect()[0][0]
        ) == rows_used,
        "worst_bin": {args.group_col: worst[args.group_col],
                      "bin": int(worst["bin"]),
                      "n_pos": int(worst["n_pos"]),
                      "n_rows": int(worst["n_rows"])},
        "wall_s": round(time.perf_counter() - t0, 2),
    }))


if __name__ == "__main__":
    main()

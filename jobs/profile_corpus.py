#!/usr/bin/env python
"""Corpus statistical profile job — spark-submit --py-files.

    spark-submit --master local[32] --py-files tgist_features_spark.zip \
        jobs/profile_corpus.py --input /path/documents_parquet \
        --report /path/profile

The pre-curation profiling pass a pipeline runs BEFORE choosing filter
thresholds: per-document robust statistics against the doc's language
stratum (exact median + MAD outlier flag, integer-exact deviation from
the stratum mean — operators/aggregates.py), plus the corpus-level
doc-length histogram. Writes:

  <report>/per_doc    one row per input doc: n_chars, stratum n/mean/dev,
                      med, mad, is_outlier
  <report>/histogram  64-char-wide length buckets with count/extrema/mass

and prints ONE JSON line with corpus totals and the outlier count.
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
    group_mad_outliers,
    group_standardize,
)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True, help="documents parquet path")
    ap.add_argument("--report", required=True, help="report output directory")
    ap.add_argument("--group-col", default="lang",
                    help="stratum column for the per-group statistics")
    ap.add_argument("--value-col", default="n_chars",
                    help="numeric column profiled (bigint)")
    ap.add_argument("--mad-k", type=float, default=3.0,
                    help="outlier threshold in MADs")
    ap.add_argument("--bucket-width", type=int, default=64)
    ap.add_argument("--master", default=None)
    ap.add_argument("--shuffle-partitions", type=int, default=None)
    args = ap.parse_args()

    spark = get_spark(master=args.master,
                      shuffle_partitions=args.shuffle_partitions,
                      app_name="tgist-profile")
    spark.sparkContext.setLogLevel("ERROR")

    docs = spark.read.parquet(args.input)
    n_docs = docs.count()  # warm the scan before timing
    t0 = time.perf_counter()

    base = docs.select("doc_id", args.group_col, args.value_col)
    std = group_standardize(base, args.value_col, args.group_col)
    robust = group_mad_outliers(
        std, args.value_col, args.group_col, k=args.mad_k
    )
    per_doc_path = os.path.join(args.report, "per_doc")
    robust.write.mode("overwrite").parquet(per_doc_path)

    wb = args.bucket_width
    hist = (
        docs.groupBy(F.expr(f"{args.value_col} div {wb}").alias("bucket"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.min(args.value_col).cast("bigint").alias("min_v"),
            F.max(args.value_col).cast("bigint").alias("max_v"),
            F.sum(args.value_col).cast("bigint").alias("sum_v"),
        )
    )
    hist_path = os.path.join(args.report, "histogram")
    hist.write.mode("overwrite").parquet(hist_path)

    n_outliers = (
        spark.read.parquet(per_doc_path).filter("is_outlier = 1").count()
    )
    wall = time.perf_counter() - t0
    print(json.dumps({
        "job": "profile_corpus",
        "docs": n_docs,
        "strata": spark.read.parquet(per_doc_path)
                        .select(args.group_col).distinct().count(),
        "outliers": n_outliers,
        "mad_k": args.mad_k,
        "wall_s": round(wall, 3),
        "docs_per_sec": round(n_docs / wall, 1),
    }))
    spark.stop()


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""Production corpus-quality scoring job — spark-submit --py-files.

    spark-submit --master local[32] --py-files tgist_features_spark.zip \
        jobs/score_corpus.py --input /path/documents_parquet \
        --report /path/quality_report [--output /path/kept] \
        [--clean-spans /path/cleaned]

The quality-gate stage of a training-data pipeline, combining every
per-doc quality signal the engine computes into ONE report table:

* repetition filters (Gopher TTR / top-bigram / dup-trigram + keep flag)
* surface quality (token counts, stopword/punct ratios, quality_score)
* corpus-relative token-frequency stats (mean_tf, OOV rate — the
  integer-exact perplexity-filter stand-in)
* cross-doc span-duplication stats (n_dup_spans, dup_span_frac + keep)

``--output`` additionally writes the docs passing BOTH keep flags;
``--clean-spans`` writes the span-REMOVED corpus (every doc, duplicated
spans deleted) instead of dropping whole documents — the two actions of
sequence-level dedup, selectable per pipeline.

Prints one JSON line with docs, kept counts, and wall time.
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
from tgist_features_spark.session import warm_python_workers  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True, help="documents parquet path")
    ap.add_argument("--report", default="noop",
                    help="quality-report parquet path or 'noop'")
    ap.add_argument("--output", default=None,
                    help="optional: write docs passing both keep flags here")
    ap.add_argument("--clean-spans", default=None,
                    help="optional: write the span-removed corpus here")
    ap.add_argument("--master", default=None)
    ap.add_argument("--shuffle-partitions", type=int, default=None)
    ap.add_argument("--span-ngram", type=int, default=8)
    ap.add_argument("--min-count", type=int, default=5,
                    help="OOV threshold for token-frequency stats")
    args = ap.parse_args()

    spark = get_spark(master=args.master,
                      shuffle_partitions=args.shuffle_partitions,
                      app_name="tgist-score-corpus")
    spark.sparkContext.setLogLevel("ERROR")

    from tgist_features_spark.functions.text import (  # noqa: E402, PLC0415
        token_frequency_stats,
        with_quality_features,
        with_repetition_features,
    )
    from tgist_features_spark.operators.dedup import (  # noqa: E402, PLC0415
        cross_doc_span_stats,
        remove_dup_spans,
    )

    docs = spark.read.parquet(args.input)
    n = docs.count()  # warm the scan before timing
    warm_python_workers(spark)
    t0 = time.perf_counter()

    # per-row signals fuse into one pass; the two corpus-relative signals
    # (token frequency, span dup) join back on doc_id
    per_row = with_quality_features(
        with_repetition_features(docs.select("doc_id", "text"))
        .withColumnRenamed("keep", "keep_repetition")
        .withColumnRenamed("n_tokens", "n_tokens_rep")
    ).drop("text", "n_tokens")
    tf = token_frequency_stats(docs, min_count=args.min_count)
    spans = cross_doc_span_stats(docs, n=args.span_ngram).select(
        "doc_id", "n_dup_spans", "dup_span_frac",
        F.col("keep").alias("keep_spans"),
    )
    report = (
        per_row.withColumnRenamed("n_tokens_rep", "n_tokens")
        .join(tf.drop("n_tokens"), "doc_id", "left")
        .join(spans, "doc_id", "left")
        .withColumn("keep_spans", F.coalesce("keep_spans", F.lit(1)))
    )
    if args.report == "noop":
        report.write.mode("overwrite").format("noop").save()
        n_kept = None
    else:
        report.write.mode("overwrite").parquet(args.report)
        rep = spark.read.parquet(args.report)
        n_kept = rep.filter(
            (F.col("keep_repetition") == True) & (F.col("keep_spans") == 1)  # noqa: E712
        ).count()
        if args.output:
            keep_ids = rep.filter(
                (F.col("keep_repetition") == True)  # noqa: E712
                & (F.col("keep_spans") == 1)
            ).select("doc_id")
            docs.join(keep_ids, "doc_id", "left_semi").write.mode(
                "overwrite"
            ).parquet(args.output)
    if args.clean_spans:
        cleaned = remove_dup_spans(docs, n=args.span_ngram)
        docs.drop("text").join(cleaned, "doc_id").write.mode(
            "overwrite"
        ).parquet(args.clean_spans)

    wall = round(time.perf_counter() - t0, 3)
    print(json.dumps({
        "job": "score_corpus",
        "docs": n,
        "kept_both_flags": n_kept,
        "wall_s": wall,
        "docs_per_sec": round(n / wall, 1),
    }))
    spark.stop()


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""Pre-materialize the deterministic benchmark transcript corpus + probe side
to parquet (BASELINE.md protocol step 1: generation excluded from timing)."""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tgist_features_spark import get_spark  # noqa: E402
from tgist_features_spark.sources.corpus import (  # noqa: E402
    generate_queries_pdf,
    generate_transcripts_pdf,
    queries_df,
    transcripts_df,
)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n-convs", type=int, default=180_000)
    ap.add_argument("--n-queries", type=int, default=50_000)
    ap.add_argument("--seed", type=int, default=42)
    ap.add_argument("--out", required=True)
    args = ap.parse_args()

    pdf = generate_transcripts_pdf(n_convs=args.n_convs, seed=args.seed)
    qpdf = generate_queries_pdf(pdf, n_queries=args.n_queries, seed=args.seed + 1)

    spark = get_spark(app_name="tgist-gen")
    spark.sparkContext.setLogLevel("ERROR")
    transcripts_df(spark, pdf).repartition(64).write.mode("overwrite").parquet(
        os.path.join(args.out, "transcripts")
    )
    queries_df(spark, qpdf).repartition(8).write.mode("overwrite").parquet(
        os.path.join(args.out, "queries")
    )
    print(json.dumps({"turns": len(pdf), "queries": len(qpdf), "out": args.out}))
    spark.stop()


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""Production training-shard builder — ships as spark-submit --py-files.

    spark-submit --master local[32] --py-files tgist_features_spark.zip \
        jobs/pack_corpus.py --input /path/documents_parquet \
        --chunk-size 2048 --chunks-per-shard 512 --output /path/shards

The last mile of the pretraining data pipeline: optionally drop junk docs
(Gopher-style repetition filters), then concat-and-chunk the surviving
corpus into fixed-size token windows (operators/packing.py — two-phase
distributed prefix sum, no global sort) and write the doc→chunk map
partitioned by shard (``chunk_id div chunks_per_shard``), so the training
loader reads one shard's worth of context windows with partition pruning.
Prints one JSON line with docs/chunks/shards/wall/tokens-per-sec.
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
from tgist_features_spark.functions.text import with_repetition_features  # noqa: E402
from tgist_features_spark.operators.packing import pack_chunks  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True, help="documents parquet path")
    ap.add_argument("--key", default="doc_id")
    ap.add_argument("--text-col", default="text")
    ap.add_argument("--chunk-size", type=int, default=2048)
    ap.add_argument("--chunks-per-shard", type=int, default=512)
    ap.add_argument("--quality-filter", action="store_true",
                    help="drop docs failing the Gopher-style repetition filters")
    ap.add_argument("--pad-to-boundary", action="store_true",
                    help="every doc starts at a fresh chunk boundary (no "
                         "chunk mixes documents; loader pads final chunks)")
    ap.add_argument("--n-parts", type=int, default=0,
                    help="prefix-sum parallelism (0 = derive from row count)")
    ap.add_argument("--output", default="noop", help="output path or 'noop'")
    ap.add_argument("--master", default=None)
    args = ap.parse_args()

    spark = get_spark(master=args.master, app_name="tgist-pack")
    spark.sparkContext.setLogLevel("ERROR")

    docs = spark.read.parquet(args.input)
    t0 = time.perf_counter()
    n_in = docs.count()
    if args.quality_filter:
        docs = (
            with_repetition_features(docs, args.text_col)
            .filter(F.col("keep"))
            .drop("n_tokens", "ttr", "top_bigram_frac", "dup_trigram_frac", "keep")
        )
    weighted = docs.withColumn(
        "__n_toks", F.size(F.split(args.text_col, " ")).cast("bigint")
    )
    packed = pack_chunks(
        weighted, args.key, "__n_toks", args.chunk_size, n_parts=args.n_parts,
        pad_to_boundary=args.pad_to_boundary,
    ).withColumn(
        "shard", F.expr(f"chunk_id div {int(args.chunks_per_shard)}")
    )

    if args.output == "noop":
        stats = packed.agg(
            F.count(F.lit(1)).alias("rows"),
            F.countDistinct(args.key).alias("docs"),
            F.countDistinct("chunk_id").alias("chunks"),
            F.countDistinct("shard").alias("shards"),
            F.sum("n_in_chunk").alias("tokens"),
        ).collect()[0]
    else:
        packed.write.mode("overwrite").partitionBy("shard").parquet(args.output)
        back = spark.read.parquet(args.output)
        stats = back.agg(
            F.count(F.lit(1)).alias("rows"),
            F.countDistinct(args.key).alias("docs"),
            F.countDistinct("chunk_id").alias("chunks"),
            F.countDistinct("shard").alias("shards"),
            F.sum("n_in_chunk").alias("tokens"),
        ).collect()[0]
    wall = time.perf_counter() - t0

    print(
        json.dumps(
            {
                "job": "pack_corpus",
                "docs_in": n_in,
                "docs_packed": stats.docs,
                "chunks": stats.chunks,
                "shards": stats.shards,
                "tokens": stats.tokens,
                "chunk_size": args.chunk_size,
                "wall_s": round(wall, 3),
                "tokens_per_sec": round(stats.tokens / wall, 1),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""Duplicate-graph structure report — spark-submit --py-files.

    spark-submit --master local[32] --py-files tgist_features_spark.zip \
        jobs/graph_report.py --input /path/documents_parquet \
        --report /path/graph_report [--k-core 3]

The triage pass AFTER near-dup discovery: the pair relation says WHO
matches; this job says what the match graph LOOKS like — is the
duplication a few long chains (template drift), a handful of dense
blobs (mirror sites, spam farms), or scattered pairs (benign)? Runs
the graph suite over the SimHash near-dup pairs:

  components   (`operators/components.py` connected_components)
  triangles    (degree-oriented exact enumeration — clique density)
  k-core       (peeling — vertices surviving min-degree k)

Writes three tables under --report (pairs, components, cluster_sizes)
and prints ONE JSON line with the headline numbers: docs, pairs,
clusters, largest cluster, triangle count, triangle-to-pair ratio
(the density verdict: chains have ~0, blobs have many), and the
k-core survivor count.
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
from tgist_features_spark.operators.components import (  # noqa: E402
    connected_components,
    k_core_vertices,
    triangle_enumerate,
)
from tgist_features_spark.operators.dedup import simhash_near_pairs  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True, help="documents parquet path")
    ap.add_argument("--report", required=True, help="report output directory")
    ap.add_argument("--id-col", default="doc_id")
    ap.add_argument("--text-col", default="text")
    ap.add_argument("--max-hamming", type=int, default=3)
    ap.add_argument("--k-core", type=int, default=3)
    ap.add_argument("--master", default=None)
    ap.add_argument("--shuffle-partitions", type=int, default=None)
    args = ap.parse_args()

    spark = get_spark(master=args.master,
                      shuffle_partitions=args.shuffle_partitions,
                      app_name="tgist-graph-report")
    spark.sparkContext.setLogLevel("ERROR")
    t0 = time.time()

    docs = spark.read.parquet(args.input)
    n_docs = docs.count()
    pairs = simhash_near_pairs(
        docs, args.id_col, args.text_col, max_hamming=args.max_hamming
    ).localCheckpoint(eager=True)  # consumed by three downstream passes
    n_pairs = pairs.count()
    pairs.write.mode("overwrite").parquet(os.path.join(args.report, "pairs"))

    comp = connected_components(pairs, "a", "b")
    comp.write.mode("overwrite").parquet(
        os.path.join(args.report, "components"))
    sizes = comp.groupBy("comp").agg(F.count(F.lit(1)).alias("size"))
    sizes.write.mode("overwrite").parquet(
        os.path.join(args.report, "cluster_sizes"))
    n_clusters = sizes.count()
    largest = sizes.agg(F.max("size")).first()[0] or 0

    tri = triangle_enumerate(pairs, "a", "b")
    n_tri = tri.count()
    core = k_core_vertices(pairs, args.k_core, "a", "b")
    n_core = core.count()

    print(json.dumps({
        "metric": "graph_report",
        "docs": n_docs,
        "pairs": n_pairs,
        "clusters": n_clusters,
        "largest_cluster": int(largest),
        "triangles": n_tri,
        "tri_per_pair": round(n_tri / n_pairs, 4) if n_pairs else 0.0,
        "k_core_k": args.k_core,
        "k_core_vertices": n_core,
        "wall_s": round(time.time() - t0, 2),
    }))


if __name__ == "__main__":
    main()

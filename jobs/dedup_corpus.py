#!/usr/bin/env python
"""Production corpus-dedup job — ships as spark-submit --py-files.

    spark-submit --master local[32] --py-files tgist_features_spark.zip \
        jobs/dedup_corpus.py --input /path/documents_parquet \
        --output /path/kept --drop-log /path/drops --threshold 0.7

Exact dedup (md5 hash-agg) then MinHash+LSH near-dedup with the keep-first
policy (plans/dedup_pipeline.py). Prints one JSON line with input/kept/
dropped counts, wall time and docs/sec. Also runnable directly with python.
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
from tgist_features_spark.plans.dedup_pipeline import dedup_corpus  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True, help="documents parquet path")
    ap.add_argument("--output", default="noop", help="kept-docs path or 'noop'")
    ap.add_argument("--drop-log", default=None, help="drop-log parquet path")
    ap.add_argument("--master", default=None)
    ap.add_argument("--shuffle-partitions", type=int, default=None)
    ap.add_argument("--threshold", type=float, default=0.7,
                    help="min MinHash-estimated Jaccard to call a near-dup")
    ap.add_argument("--max-bucket", type=int, default=200,
                    help="LSH bucket cap (degenerate-bucket guard)")
    ap.add_argument("--ref-input", default=None,
                    help="reference corpus parquet: drop docs whose MinHash-"
                         "estimated Jaccard vs ANY reference doc reaches the "
                         "threshold (cross-corpus near-dedup stage)")
    ap.add_argument("--ref-sig-cache", default=None,
                    help="directory caching the reference corpus's MinHash "
                         "signatures: first run (with --ref-input) signs the "
                         "reference ONCE and writes here; later runs reuse "
                         "the cache and may omit --ref-input entirely — the "
                         "production shape for deduping every incoming batch "
                         "against a static trained corpus. The cache is "
                         "stamped with its signature parameters and refuses "
                         "a mismatched reuse.")
    ap.add_argument("--eval-input", default=None,
                    help="eval/benchmark docs parquet: drop kept docs "
                         "sharing any token n-gram with this set")
    ap.add_argument("--decontam-ngram", type=int, default=8)
    ap.add_argument("--checkpoint-dir", default=None,
                    help="reliable-checkpoint dir for --transitive component "
                         "iteration (cluster fault-tolerance); default uses "
                         "fast executor-local checkpoints")
    ap.add_argument("--transitive", action="store_true",
                    help="close near-dup pairs into connected components "
                         "and keep one doc per cluster (instead of the "
                         "greedy pairwise keep-first policy)")
    ap.add_argument("--latency-profile", choices=["auto", "small", "scale"],
                    default="auto",
                    help="'scale' uses the session default shuffle "
                         "partitions (2x cores — the right default for TB "
                         "inputs). 'small' lowers shuffle partitions to 8 "
                         "for this job: on a micro-batch every shuffle "
                         "stage's task count is pure fixed scheduling "
                         "latency. AQE stays ON in BOTH profiles — an "
                         "interleaved A/B at 5k docs measured AQE-off ~40%% "
                         "SLOWER (runtime partition coalescing wins even at "
                         "micro-batch scale; 14.1/15.1s vs 9.6/11.6s "
                         "same-window pairs). 'auto' picks 'small' below "
                         "100k input docs.")
    args = ap.parse_args()

    spark = get_spark(master=args.master,
                      shuffle_partitions=args.shuffle_partitions,
                      app_name="tgist-dedup")
    spark.sparkContext.setLogLevel("ERROR")

    docs = spark.read.parquet(args.input)
    n_in = docs.count()  # warm the scan before timing
    warm_python_workers(spark)
    profile = args.latency_profile
    if profile == "auto":
        profile = "small" if n_in < 100_000 else "scale"
    if profile == "small" and args.shuffle_partitions is None:
        # runtime SQL conf: applies to every query compiled after this
        # point in this session only; an explicit --shuffle-partitions
        # always wins
        spark.conf.set("spark.sql.shuffle.partitions", "8")

    eval_docs = spark.read.parquet(args.eval_input) if args.eval_input else None
    ref_docs = spark.read.parquet(args.ref_input) if args.ref_input else None
    ref_sigs = None
    if args.ref_sig_cache:
        # parameters the cross stage will use (pipeline defaults) — a cache
        # signed differently produces incomparable band hashes, so the
        # stamp is the compatibility contract
        params = {"n_hashes": 128, "shingle": 3, "seed": 42}
        stamp = os.path.join(args.ref_sig_cache, "_params.json")
        sig_path = os.path.join(args.ref_sig_cache, "sigs")
        if os.path.exists(stamp):
            with open(stamp) as fh:
                stored = json.load(fh)
            if stored != params:
                raise SystemExit(
                    f"--ref-sig-cache was built with {stored}, this job "
                    f"needs {params}; use a fresh cache directory"
                )
        else:
            if ref_docs is None:
                raise SystemExit(
                    "--ref-sig-cache has no cache yet; provide --ref-input "
                    "for the one-time signing pass"
                )
            from tgist_features_spark.operators.dedup import (  # noqa: PLC0415
                minhash_signatures,
            )

            minhash_signatures(
                ref_docs, n_hashes=params["n_hashes"],
                shingle=params["shingle"], seed=params["seed"],
                parallelism=spark.sparkContext.defaultParallelism,
            ).write.mode("overwrite").parquet(sig_path)
            # stamp AFTER data: a crash mid-write leaves no stamp and the
            # next run simply re-signs
            with open(stamp, "w") as fh:
                json.dump(params, fh)
        ref_sigs = spark.read.parquet(sig_path)
        ref_docs = None  # the signatures stand in for the reference corpus
    t0 = time.perf_counter()
    kept, drop_log = dedup_corpus(
        docs, min_est_jaccard=args.threshold, max_bucket=args.max_bucket,
        transitive=args.transitive, eval_docs=eval_docs,
        checkpoint_dir=args.checkpoint_dir, ref_docs=ref_docs,
        ref_signatures=ref_sigs, decontam_ngram=args.decontam_ngram,
    )
    if args.output == "noop":
        # count() materializes the whole DAG — a separate noop write would
        # execute everything a second time
        n_kept = kept.count()
        if args.drop_log:
            drop_log.write.mode("overwrite").parquet(args.drop_log)
    else:
        # one pass: an observe() metric rides the write job, so the
        # kept count costs no read-back job; the drop-log write runs
        # CONCURRENTLY from a second thread (independent output jobs
        # share the session and overlap on idle cores — at any scale the
        # two sinks' I/O interleaves instead of serializing)
        from pyspark.sql import Observation  # noqa: PLC0415
        from pyspark.sql import functions as F  # noqa: PLC0415

        obs = Observation("kept_count")
        kept_obs = kept.observe(obs, F.count(F.lit(1)).alias("n"))
        err: list[Exception] = []
        if args.drop_log:
            import threading  # noqa: PLC0415

            def _write_drops():
                try:
                    drop_log.write.mode("overwrite").parquet(args.drop_log)
                except Exception as e:  # pragma: no cover - surfaced below
                    err.append(e)

            th = threading.Thread(target=_write_drops)
            th.start()
        kept_obs.write.mode("overwrite").parquet(args.output)
        if args.drop_log:
            th.join()
            if err:
                raise err[0]
        n_kept = obs.get["n"]
    wall = time.perf_counter() - t0

    print(json.dumps({
        "job": "dedup_corpus",
        "docs_in": n_in,
        "docs_kept": n_kept,
        "docs_dropped": n_in - n_kept,
        "threshold": args.threshold,
        "transitive": args.transitive,
        "cross_ref": args.ref_input is not None or ref_sigs is not None,
        "ref_sigs_cached": ref_sigs is not None,
        "decontaminated": args.eval_input is not None,
        "latency_profile": profile,
        "wall_s": round(wall, 3),
        "docs_per_sec": round(n_in / wall, 1),
    }))
    spark.stop()


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""Event-stream activity report job — spark-submit --py-files.

    spark-submit --master local[32] --py-files tgist_features_spark.zip \
        jobs/activity_report.py --input /path/events_parquet \
        --report /path/activity

The behavioral-analytics pass over an event/telemetry table (the
production face of the round-6 window/aggregate operators), one Spark
session, four small report tables:

  <report>/transition_latency  per (from_type, to_type): count + exact
                               min/max/sum gap microseconds
  <report>/gap_histogram       log2-bucketed inter-arrival distribution
                               per event type (exact integer log2)
  <report>/retention           (cohort_bucket, bucket_offset, n_active)
                               weekly cohort retention counts
  <report>/coverage            per-entity merged activity islands
                               (gaps-and-islands over [ts, ts+dur])

and prints ONE JSON line with table row counts and mass-conservation
facts (gap rows == events − entities; retention offset-0 mass ==
distinct entities). Every table is exact-integer — the same relations
the registry oracles pin bitwise.
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
from tgist_features_spark.functions.timeu import us  # noqa: E402
from tgist_features_spark.operators.aggregates import cohort_retention  # noqa: E402
from tgist_features_spark.operators.ranges import interval_islands  # noqa: E402
from tgist_features_spark.operators.windows import (  # noqa: E402
    interarrival_histogram,
    transition_latency,
)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True, help="events parquet path")
    ap.add_argument("--report", required=True, help="report output directory")
    ap.add_argument("--entity-col", default="user_id")
    ap.add_argument("--type-col", default="event_type")
    ap.add_argument("--ts-col", default="ts")
    ap.add_argument("--id-col", default="event_id")
    ap.add_argument("--duration-col", default=None,
                    help="optional per-event duration (seconds, numeric); "
                         "enables the coverage table")
    ap.add_argument("--cohort-bucket-s", type=int, default=604_800)
    ap.add_argument("--master", default=None)
    args = ap.parse_args()

    t0 = time.time()
    spark = get_spark(master=args.master, app_name="tgist-activity-report")
    spark.sparkContext.setLogLevel("ERROR")
    e, ty, ts, i = args.entity_col, args.type_col, args.ts_col, args.id_col
    ev = spark.read.parquet(args.input).select(
        i, e, ty, ts, *([args.duration_col] if args.duration_col else [])
    )

    tables: dict[str, int] = {}

    def _write(df, name: str) -> None:
        path = os.path.join(args.report, name)
        df.write.mode("overwrite").parquet(path)
        tables[name] = spark.read.parquet(path).count()

    _write(transition_latency(ev, e, ty, (ts, i), ts_col=ts),
           "transition_latency")
    _write(interarrival_histogram(ev, e, (ts, i), ts_col=ts, by_col=ty),
           "gap_histogram")
    _write(cohort_retention(ev, e, ts, bucket_s=args.cohort_bucket_s),
           "retention")
    if args.duration_col:
        iv = ev.select(
            F.col(i),
            F.col(e),
            us(F.col(ts)).alias("__s"),
            (
                us(F.col(ts))
                + F.round(F.col(args.duration_col) * 1_000_000).cast("bigint")
            ).alias("__e"),
        )
        _write(interval_islands(iv, e, "__s", "__e", i), "coverage")

    # mass-conservation facts a reader can check without refolding
    n_events = ev.count()
    n_entities = ev.select(e).distinct().count()
    gaps = spark.read.parquet(
        os.path.join(args.report, "gap_histogram")
    ).agg(F.sum("n_gaps")).first()[0]
    offset0 = spark.read.parquet(
        os.path.join(args.report, "retention")
    ).filter(F.col("bucket_offset") == 0).agg(F.sum("n_active")).first()[0]
    print(json.dumps({
        "job": "activity_report",
        "events": n_events,
        "entities": n_entities,
        "tables": tables,
        "gap_mass_ok": gaps == n_events - n_entities,
        "retention_offset0_ok": offset0 == n_entities,
        "wall_s": round(time.time() - t0, 3),
    }))
    spark.stop()


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""Data-quality admission gate — spark-submit --py-files.

    spark-submit --master local[32] --py-files tgist_features_spark.zip \
        jobs/dq_gate.py --input /path/table_parquet --spec /path/spec.json \
        [--report /path/report_parquet] [--parents name=/path ...]

The pre-publish gate: evaluate a JSON expectations spec against a
table (operators/dq.py dq_report), optionally write the report
relation, print ONE JSON line, and exit NON-ZERO when any check fails
— the shape a scheduler wires between "pipeline wrote the table" and
"consumers may read it".

Spec file format (all sections optional):

    {
      "not_null": ["l_orderkey", "l_quantity"],
      "unique": [["l_orderkey", "l_linenumber"]],
      "accepted": {"l_returnflag": ["A", "N", "R"]},
      "in_range": {"l_quantity": [1, 50]},
      "ref": {"l_orderkey": {"parent": "orders", "key": "o_orderkey"}}
    }

Referential parents are supplied as --parents name=/path pairs; a ref
check naming an unsupplied parent is a spec error (refused loudly, not
skipped — a silently skipped FK check is a passing FK check to the
scheduler).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tgist_features_spark import get_spark  # noqa: E402
from tgist_features_spark.operators.dq import dq_report  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True, help="table parquet path")
    ap.add_argument("--spec", required=True, help="expectations JSON file")
    ap.add_argument("--report", default=None,
                    help="optional parquet path for the report relation")
    ap.add_argument("--parents", nargs="*", default=[],
                    help="name=/path pairs for referential parents")
    ap.add_argument("--master", default=None)
    ap.add_argument("--shuffle-partitions", type=int, default=None)
    args = ap.parse_args()

    with open(args.spec) as fh:
        spec = json.load(fh)
    parents = {}
    for pair in args.parents:
        name, _, path = pair.partition("=")
        if not path:
            raise SystemExit(f"dq_gate: bad --parents entry {pair!r}")
        parents[name] = path

    spark = get_spark(master=args.master,
                      shuffle_partitions=args.shuffle_partitions,
                      app_name="tgist-dq-gate")
    spark.sparkContext.setLogLevel("ERROR")
    t0 = time.time()

    df = spark.read.parquet(args.input)
    ref = {}
    for col, cfg in (spec.get("ref") or {}).items():
        pname = cfg["parent"]
        if pname not in parents:
            raise SystemExit(
                f"dq_gate: ref check {col!r} names parent {pname!r} "
                f"but no --parents {pname}=/path was supplied"
            )
        ref[col] = (spark.read.parquet(parents[pname]), cfg["key"])

    report = dq_report(
        df,
        not_null=tuple(spec.get("not_null", ())),
        unique=tuple(tuple(k) for k in spec.get("unique", ())),
        accepted=spec.get("accepted"),
        in_range={c: tuple(v) for c, v in (spec.get("in_range") or {}).items()},
        ref=ref or None,
    )
    rows = report.collect()
    if args.report:
        report.write.mode("overwrite").parquet(args.report)
    failed = [
        {"check": r["check"], "target": r["target"],
         "n_violations": r["n_violations"]}
        for r in rows if r["ok"] == 0
    ]
    print(json.dumps({
        "metric": "dq_gate",
        "n_rows": rows[0]["n_rows"] if rows else 0,
        "checks": len(rows),
        "failed": failed,
        "verdict": "pass" if not failed else "fail",
        "wall_s": round(time.time() - t0, 2),
    }))
    raise SystemExit(0 if not failed else 1)


if __name__ == "__main__":
    main()

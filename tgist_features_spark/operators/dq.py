"""Data-quality expectations report (DQ1) — the validation gate a
pipeline runs before publishing a table: one row per declared
expectation with exact violation counts, so admission is a single
``ok``-column scan and triage starts from the counts, not from a rerun.

Check classes (the great-expectations core, kept relational):

- ``not_null``: violations = rows where the column IS NULL
- ``accepted``: violations = non-NULL values outside the allowed set
  (NULL is not a membership violation — that's not_null's job)
- ``in_range``: violations = non-NULL values outside [lo, hi]
- ``unique``:  violations = n_rows(non-null key) − n_distinct(key) —
  0 exactly when the key is unique; NULL keys are nullability
  violations, not uniqueness ones
- ``ref``:     referential integrity — violations = child rows whose
  non-NULL foreign key misses the parent key set

Scale shape: every row-local check folds into ONE map-side-combinable
aggregation pass over the table (conditional sums + count_distinct
share the scan); each referential check adds one left-anti-style
aggregation join against the parent key set (keys only — the parent's
payload is never read). The report itself is a handful of rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_REPORT_COLS = ("check", "target", "n_rows", "n_violations", "ok")


def dq_report(
    df: DataFrame,
    not_null: tuple[str, ...] = (),
    unique: tuple[tuple[str, ...], ...] = (),
    accepted: dict[str, list] | None = None,
    in_range: dict[str, tuple] | None = None,
    ref: dict[str, tuple[DataFrame, str]] | None = None,
) -> DataFrame:
    """Evaluate the declared expectations against ``df`` and return the
    report relation (check, target, n_rows, n_violations, ok)."""
    aggs = [F.count(F.lit(1)).cast("bigint").alias("__n")]
    rows: list[tuple[str, str, str]] = []  # (check, target, agg alias)

    def _viol(name: str, target: str, cond) -> None:
        alias = f"__v{len(rows)}"
        aggs.append(
            F.sum(F.when(cond, 1).otherwise(0)).cast("bigint").alias(alias)
        )
        rows.append((name, target, alias))

    for c in not_null:
        _viol("not_null", c, F.col(c).isNull())
    for c, vals in (accepted or {}).items():
        _viol("accepted", c, F.col(c).isNotNull() & ~F.col(c).isin(vals))
    for c, (lo, hi) in (in_range or {}).items():
        _viol(
            "in_range",
            c,
            F.col(c).isNotNull() & ((F.col(c) < lo) | (F.col(c) > hi)),
        )
    for key in unique:
        alias = f"__v{len(rows)}"
        # rows with a fully non-NULL key, minus distinct such keys
        nn = F.lit(True)
        for k in key:
            nn = nn & F.col(k).isNotNull()
        aggs.append(
            (
                F.sum(F.when(nn, 1).otherwise(0))
                - F.count_distinct(
                    F.when(nn, F.struct(*[F.col(k) for k in key]))
                )
            )
            .cast("bigint")
            .alias(alias)
        )
        rows.append(("unique", ",".join(key), alias))
    # the row-local aggregation pass and each referential anti-join are
    # INDEPENDENT actions — submit the ref counts from a small thread
    # pool so their jobs back-fill the same executors while the agg pass
    # drains (guide-standard overlap of independent jobs; result values
    # are unaffected, only the wall clock)
    from concurrent.futures import ThreadPoolExecutor  # noqa: PLC0415

    def _ref_count(c: str, parent: DataFrame, parent_key: str) -> int:
        return (
            df.filter(F.col(c).isNotNull())
            .join(
                parent.select(F.col(parent_key).alias(c)).distinct(),
                c,
                "left_anti",
            )
            .count()
        )

    ref_items = list((ref or {}).items())
    futures = []
    if ref_items:
        pool = ThreadPoolExecutor(max_workers=min(2, len(ref_items)))
        futures = [
            pool.submit(_ref_count, c, parent, parent_key)
            for c, (parent, parent_key) in ref_items
        ]
    one = df.agg(*aggs).first()
    spark = df.sparkSession
    # `or 0`: every violation aggregate is a SUM, which is NULL over an
    # empty table — an empty input is a well-defined all-green report
    # (0 violations everywhere), not a TypeError
    n_rows = int(one["__n"] or 0)
    out = [
        (name, target, n_rows, int(one[alias] or 0))
        for name, target, alias in rows
    ]
    for (c, (parent, parent_key)), fut in zip(ref_items, futures):
        out.append(("ref", f"{c}->{parent_key}", n_rows, int(fut.result())))
    if ref_items:
        pool.shutdown()
    return spark.createDataFrame(
        [(c, t, n, v, 1 if v == 0 else 0) for c, t, n, v in out],
        "check string, target string, n_rows bigint, "
        "n_violations bigint, ok int",
    )

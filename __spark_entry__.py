"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship leakage-free feature-vector query on
/root/testdata/sf0.001; ``queries()``/``oracle_sql()`` expose every
implemented operator from SURVEY.md §2 plus the training-data ops. As of
round 3 EVERY registry query has a DuckDB oracle — the probabilistic ops
(MinHash, SimHash, LSH-ANN, IVF-ANN) are verified through exact re-ranks /
engine-reproducible signatures (see their docstrings in
plans/entry_queries.py).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from tgist_features_spark.plans.entry_queries import ORACLES, QUERIES


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return QUERIES["feature_vector"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL for each SQL-expressible query."""
    return dict(ORACLES)

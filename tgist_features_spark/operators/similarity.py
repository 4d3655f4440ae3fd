"""Similarity search over embedding columns (array<float>).

Brute-force cosine is the exactness baseline: JVM-side zip_with/aggregate
dot products (whole-stage codegen, no Python), broadcast of the (small)
query side, per-query top-k via window rank — the plan survives scale-out
because the big side is never shuffled, only scanned.

The scale path is LSH bucketing (random hyperplanes, deterministic seed):
signatures in one vectorized pandas UDF, candidates from a bucket
equi-join, exact cosine re-ranking on candidates only.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf


def _cosine(a, b):
    """Cosine similarity between two array columns — pure Catalyst
    (zip_with + aggregate fold), runs inside whole-stage codegen."""
    a = F.col(a) if isinstance(a, str) else a
    b = F.col(b) if isinstance(b, str) else b
    dot = F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda s, v: s + v)
    na = F.sqrt(F.aggregate(F.transform(a, lambda x: x * x), F.lit(0.0), lambda s, v: s + v))
    nb = F.sqrt(F.aggregate(F.transform(b, lambda x: x * x), F.lit(0.0), lambda s, v: s + v))
    return dot / (na * nb)


def cosine_topk(
    df: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k neighbors for each query vector (brute force).

    ``queries``: (q_id, q_vec). Broadcast the queries, scan the corpus once;
    per-query rank via window over the (small) q_id domain.
    """
    base = df.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).cast("array<double>").alias("v"),
    )
    q = queries.select(
        F.col("q_id"), F.col("q_vec").cast("array<double>").alias("qv")
    )
    scored = (
        base.join(F.broadcast(q), on=F.col("neighbor_id") != F.col("q_id"))
        .withColumn("cos", F.round(_cosine("v", "qv"), 6))
        .select("q_id", "neighbor_id", "cos")
    )
    w = Window.partitionBy("q_id").orderBy(F.desc("cos"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("q_id", "rank", "neighbor_id", "cos")
    )


def queries_from_ids(
    df: DataFrame, ids: list[int], id_col: str = "vec_id", vec_col: str = "embedding"
) -> DataFrame:
    return df.filter(F.col(id_col).isin(ids)).select(
        F.col(id_col).alias("q_id"), F.col(vec_col).alias("q_vec")
    )


def lsh_signatures(
    df: DataFrame,
    dim: int,
    n_planes: int = 16,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Random-hyperplane (SimHash-for-vectors) bucket id per vector."""
    rng = np.random.default_rng(seed)
    planes = rng.normal(size=(n_planes, dim)).astype(np.float64)

    @pandas_udf(T.LongType())
    def bucket(vecs: pd.Series) -> pd.Series:
        m = np.stack(vecs.to_numpy())  # (batch, dim)
        bits = (m @ planes.T) > 0  # (batch, n_planes)
        weights = (1 << np.arange(n_planes)).astype(np.int64)
        return pd.Series((bits @ weights).astype(np.int64))

    return df.select(
        F.col(id_col).alias("id"),
        F.col(vec_col).alias("v"),
        bucket(F.col(vec_col).cast("array<double>")).alias("bucket"),
    )


def _lsh_multi_buckets(
    df: DataFrame,
    dim: int,
    n_planes: int,
    n_tables: int,
    seed: int,
    id_col: str,
    vec_col: str,
) -> DataFrame:
    """(id, v, table, bucket) — one row per (vector, hash table).

    All tables' buckets come out of ONE vectorized UDF pass over the scan
    (a single (batch, n_tables*n_planes) matmul), then one explode; the big
    side is still read exactly once."""
    rng = np.random.default_rng(seed)
    planes = rng.normal(size=(n_tables * n_planes, dim)).astype(np.float64)
    weights = (1 << np.arange(n_planes)).astype(np.int64)

    @pandas_udf(T.ArrayType(T.LongType()))
    def buckets(vecs: pd.Series) -> pd.Series:
        m = np.stack(vecs.to_numpy())  # (batch, dim)
        bits = (m @ planes.T) > 0  # (batch, n_tables*n_planes)
        b = bits.reshape(len(m), n_tables, n_planes) @ weights  # (batch, n_tables)
        return pd.Series(list(b.astype(np.int64)))

    sig = df.select(
        F.col(id_col).alias("id"),
        F.col(vec_col).alias("v"),
        buckets(F.col(vec_col).cast("array<double>")).alias("bks"),
    )
    return sig.select(
        "id",
        "v",
        F.posexplode("bks").alias("table", "bucket"),
    )


def lsh_ann_topk(
    df: DataFrame,
    queries: DataFrame,
    dim: int,
    k: int = 10,
    n_planes: int = 12,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_tables: int = 1,
    max_bucket: int | None = None,
) -> DataFrame:
    """Approximate top-k: exact cosine re-rank restricted to same-bucket
    candidates, unioned across ``n_tables`` independent hyperplane tables
    (recall compounds per table: a true neighbor is missed only if it lands
    in a different bucket in EVERY table). Recall also grows as n_planes
    shrinks (bigger buckets).

    ``max_bucket`` bounds the per-(table, bucket) candidate count: buckets
    keep a deterministic hash-ordered subset of at most ``max_bucket``
    vectors, so a degenerate bucket (many near-identical vectors) cannot go
    quadratic against the queries it contains — best-effort recall inside
    the cap instead of an unbounded blow-up."""
    base = _lsh_multi_buckets(df, dim, n_planes, n_tables, seed, id_col, vec_col)
    if max_bucket is not None:
        wb = Window.partitionBy("table", "bucket").orderBy(F.xxhash64("id"))
        base = (
            base.withColumn("_rn", F.row_number().over(wb))
            .filter(F.col("_rn") <= max_bucket)
            .drop("_rn")
        )
    qsig = _lsh_multi_buckets(
        queries.select(F.col("q_id").alias(id_col), F.col("q_vec").alias(vec_col)),
        dim, n_planes, n_tables, seed, id_col, vec_col,
    ).select(F.col("id").alias("q_id"), F.col("v").alias("qv"), "table", "bucket")
    cand = (
        base.join(F.broadcast(qsig), on=["table", "bucket"])
        .filter(F.col("id") != F.col("q_id"))
        .dropDuplicates(["q_id", "id"])  # same pair may match in >1 table
    )
    scored = cand.withColumn(
        "cos",
        F.round(
            _cosine(F.col("v").cast("array<double>"), F.col("qv").cast("array<double>")), 6
        ),
    ).select("q_id", F.col("id").alias("neighbor_id"), "cos")
    w = Window.partitionBy("q_id").orderBy(F.desc("cos"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("q_id", "rank", "neighbor_id", "cos")
    )

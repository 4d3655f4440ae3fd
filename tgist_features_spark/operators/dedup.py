"""Deduplication operators for large-scale training-data pipelines.

All paths are shuffle-frugal by design for the 100 TB point:

* exact:     one hash aggregation on a 16-byte digest (no text shuffle —
             md5 computed JVM-side before the exchange, so only the digest
             and ids move).
* MinHash+LSH: signatures in ONE vectorized pandas UDF pass; banding turns
             the quadratic all-pairs problem into a groupBy on (band, hash)
             whose buckets are tiny; candidate pairs emerge from a per-bucket
             self-join only.
* SimHash:   64-bit signature per doc; near-dup candidates via band-equality
             (4 x 16-bit chunks) — Hamming<=k candidates without any
             all-pairs step.
* n-gram Jaccard: explode distinct n-grams -> self-equi-join on the n-gram
             -> count intersections; union sizes come from a broadcastable
             per-doc count, so the only big shuffle keys on the n-gram.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf

# ------------------------------------------------------------------ exact


def exact_dedup(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Hash-groupBy exact dedup: one row per distinct text with the count of
    duplicates and the smallest id kept as canonical."""
    return (
        df.select(F.md5(F.col(text_col)).alias("fp"), F.col(id_col))
        .groupBy("fp")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min(id_col).alias("keep_id"),
        )
    )


# ----------------------------------------------------------- MinHash + LSH

_M61 = np.uint64((1 << 61) - 1)


def _minhash_batch(texts: pd.Series, n_hashes: int, shingle: int, seed: int) -> list:
    rng = np.random.default_rng(seed)
    a = rng.integers(1, _M61, size=n_hashes, dtype=np.uint64)
    b = rng.integers(0, _M61, size=n_hashes, dtype=np.uint64)
    out = []
    for text in texts.fillna(""):
        toks = text.split()
        if len(toks) < shingle:
            shs = [" ".join(toks)] if toks else [""]
        else:
            shs = list({
                " ".join(toks[i : i + shingle])
                for i in range(len(toks) - shingle + 1)
            })
        # stable base hash per shingle (one C call), then n affine transforms
        base = pd.util.hash_array(np.asarray(shs, dtype=object)).astype(np.uint64)
        # (a*x + b) mod 2^61-1, min over shingles, vectorized (n_hashes x n_shingles)
        with np.errstate(over="ignore"):
            vals = (a[:, None] * (base[None, :] % _M61) + b[:, None]) % _M61
        out.append(vals.min(axis=1).astype(np.int64).tolist())
    return out


def minhash_signatures(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_hashes: int = 64,
    shingle: int = 3,
    seed: int = 42,
    parallelism: int | None = None,
) -> DataFrame:
    if parallelism:
        # single-file sources otherwise feed the UDF one task
        df = df.repartition(parallelism)
    @pandas_udf(T.ArrayType(T.LongType()))
    def mh(texts: pd.Series) -> pd.Series:
        return pd.Series(_minhash_batch(texts, n_hashes, shingle, seed))

    return df.select(F.col(id_col).alias("id"), mh(F.col(text_col)).alias("sig"))


def minhash_lsh_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_hashes: int = 128,
    bands: int = 64,
    shingle: int = 3,
    seed: int = 42,
    min_est_jaccard: float = 0.5,
) -> DataFrame:
    """Candidate near-duplicate pairs (a < b) with the MinHash-estimated
    Jaccard. Only same-bucket pairs are ever materialized.

    Default banding 64 bands x 2 rows: candidate-recall threshold
    ~(1/64)^(1/2) = 0.125 Jaccard — generous recall, with precision
    restored by the ``min_est_jaccard`` filter on the full signature."""
    rows = n_hashes // bands
    sigs = minhash_signatures(
        df, id_col, text_col, n_hashes, shingle, seed,
        parallelism=df.sparkSession.sparkContext.defaultParallelism,
    ).persist()
    # band WITHOUT the signature payload: the exploded relation that goes
    # through the band-equality shuffle is (id, band, bhash) only — at the
    # 100 TB point dragging the 128-long array through 64 bands x 2 join
    # sides would dominate the job
    banded = sigs.select(
        "id",
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(i).alias("band"),
                    F.xxhash64(
                        F.slice("sig", i * rows + 1, rows).cast("string")
                    ).alias("bhash"),
                )
                for i in range(bands)
            ])
        ).alias("bk"),
    ).select("id", "bk.band", "bk.bhash")
    l, r = banded.alias("l"), banded.alias("r")
    cand = (
        l.join(
            r,
            on=[
                F.col("l.band") == F.col("r.band"),
                F.col("l.bhash") == F.col("r.bhash"),
                F.col("l.id") < F.col("r.id"),
            ],
        )
        .select(F.col("l.id").alias("a"), F.col("r.id").alias("b"))
        .dropDuplicates(["a", "b"])
    )
    # signatures join back once, onto the (small) deduped candidate set
    sa = sigs.select(F.col("id").alias("a"), F.col("sig").alias("sig_a"))
    sb = sigs.select(F.col("id").alias("b"), F.col("sig").alias("sig_b"))
    cand = cand.join(sa, "a").join(sb, "b")
    est = F.aggregate(
        F.zip_with("sig_a", "sig_b", lambda x, y: (x == y).cast("int")),
        F.lit(0),
        lambda acc, v: acc + v,
    ) / F.lit(float(n_hashes))
    return (
        cand.withColumn("est_jaccard", est)
        .filter(F.col("est_jaccard") >= min_est_jaccard)
        .select("a", "b", "est_jaccard")
    )


# ------------------------------------------------------------------ SimHash


def simhash_signatures(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    @pandas_udf(T.LongType())
    def sh(texts: pd.Series) -> pd.Series:
        shifts = np.arange(64, dtype=np.uint64)
        weights = (np.uint64(1) << shifts).astype(np.uint64)
        out = np.empty(len(texts), dtype=np.int64)
        for i, text in enumerate(texts.fillna("")):
            toks = text.split()
            if not toks:
                out[i] = 0
                continue
            h = pd.util.hash_array(np.asarray(toks, dtype=object)).astype(np.uint64)
            bits = ((h[:, None] >> shifts[None, :]) & np.uint64(1)).astype(np.int64)
            acc = (2 * bits - 1).sum(axis=0)
            sig = weights[acc > 0].sum(dtype=np.uint64)
            out[i] = np.int64(sig.astype(np.int64))
        return pd.Series(out)

    return df.select(F.col(id_col).alias("id"), sh(F.col(text_col)).alias("simhash"))


def simhash_near_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_hamming: int = 3,
) -> DataFrame:
    """Near-dup candidates: docs whose 64-bit simhash agrees on >=1 of 4
    16-bit bands (pigeonhole: Hamming<=3 guarantees a matching band); exact
    Hamming filter applied on candidates only."""
    sigs = simhash_signatures(df, id_col, text_col)
    bands = sigs.select(
        "id",
        "simhash",
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(i).alias("band"),
                    F.shiftrightunsigned("simhash", 16 * i)
                    .bitwiseAND(F.lit(0xFFFF))
                    .alias("bval"),
                )
                for i in range(4)
            ])
        ).alias("bk"),
    ).select("id", "simhash", "bk.band", "bk.bval")
    l, r = bands.alias("l"), bands.alias("r")
    cand = (
        l.join(
            r,
            on=[
                F.col("l.band") == F.col("r.band"),
                F.col("l.bval") == F.col("r.bval"),
                F.col("l.id") < F.col("r.id"),
            ],
        )
        .select(
            F.col("l.id").alias("a"),
            F.col("r.id").alias("b"),
            F.col("l.simhash").alias("sa"),
            F.col("r.simhash").alias("sb"),
        )
        .dropDuplicates(["a", "b"])
    )
    hamming = F.bit_count(F.col("sa").bitwiseXOR(F.col("sb")))
    return (
        cand.withColumn("hamming", hamming)
        .filter(F.col("hamming") <= max_hamming)
        .select("a", "b", "hamming")
    )


# ------------------------------------------------------- n-gram Jaccard


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 2,
    min_intersection: int = 2,
) -> DataFrame:
    """Exact n-gram Jaccard for pairs sharing >= min_intersection n-grams.

    Shuffles key on the n-gram (rare keys at realistic vocab sizes); per-doc
    n-gram counts are a small broadcastable dim.
    """
    toks = F.split(F.col(text_col), " ")
    grams = df.select(
        F.col(id_col).alias("id"),
        F.explode(
            F.array_distinct(
                F.transform(
                    F.sequence(F.lit(0), F.greatest(F.size(toks) - n, F.lit(0))),
                    lambda i: F.when(
                        i + n <= F.size(toks),
                        F.concat_ws(" ", F.slice(toks, i + 1, n)),
                    ),
                )
            )
        ).alias("g"),
    ).filter(F.col("g").isNotNull())
    counts = grams.groupBy("id").agg(F.count(F.lit(1)).alias("n_grams"))
    l, r = grams.alias("l"), grams.alias("r")
    inter = (
        l.join(r, on=[F.col("l.g") == F.col("r.g"), F.col("l.id") < F.col("r.id")])
        .groupBy(F.col("l.id").alias("a"), F.col("r.id").alias("b"))
        .agg(F.count(F.lit(1)).alias("inter"))
        .filter(F.col("inter") >= min_intersection)
    )
    ca = counts.select(F.col("id").alias("a"), F.col("n_grams").alias("na"))
    cb = counts.select(F.col("id").alias("b"), F.col("n_grams").alias("nb"))
    return (
        inter.join(F.broadcast(ca), "a")
        .join(F.broadcast(cb), "b")
        .withColumn(
            "jaccard",
            F.col("inter") / (F.col("na") + F.col("nb") - F.col("inter")),
        )
        .select("a", "b", "inter", "jaccard")
    )

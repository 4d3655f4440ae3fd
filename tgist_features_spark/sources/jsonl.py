"""JSONL (JSON-lines) ingestion — the de-facto interchange format for LLM
training data. Thin, schema-enforced wrappers over Spark's native JSON
source (JVM-side parsing, no Python in the read path):

* **Explicit schema, never inference** — at 100 TB schema inference is a
  full extra pass over the data; a declared schema also pins types that
  inference gets wrong (epoch-micros as long, not double).
* **Corrupt-record discipline** — PERMISSIVE mode with an explicit
  `_corrupt_record` column, split into (clean, corrupt) DataFrames so bad
  lines are quarantined and countable instead of silently nulled.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

CORRUPT_COL = "_corrupt_record"


def read_jsonl(
    spark: SparkSession,
    path: str,
    schema: T.StructType,
) -> tuple[DataFrame, DataFrame]:
    """Returns (clean, corrupt): `clean` carries the declared columns for
    rows that parsed, `corrupt` the raw text of rows that did not.

    Reads through the TEXT source + ``from_json`` rather than the json
    source: the json source forbids queries that reference only its
    internal corrupt column (SPARK-21610 — the workaround is caching,
    a session-lifetime leak), while ``from_json`` over a text scan gives
    the same JVM-side parse with a freely filterable corrupt column."""
    full = T.StructType(
        list(schema.fields) + [T.StructField(CORRUPT_COL, T.StringType(), True)]
    )
    parsed = spark.read.text(path).select(
        F.col("value"),
        F.from_json(
            "value",
            full,
            {"mode": "PERMISSIVE", "columnNameOfCorruptRecord": CORRUPT_COL},
        ).alias("j"),
    )
    clean = parsed.filter(F.col(f"j.{CORRUPT_COL}").isNull()).select(
        *[F.col(f"j.{f.name}").alias(f.name) for f in schema.fields]
    )
    corrupt = parsed.filter(F.col(f"j.{CORRUPT_COL}").isNotNull()).select(
        F.col("value").alias(CORRUPT_COL)
    )
    return clean, corrupt


def write_jsonl(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """Export a table as JSONL (one JSON object per line) — the format the
    downstream tokenizer/training stack typically consumes."""
    df.write.mode(mode).json(path)

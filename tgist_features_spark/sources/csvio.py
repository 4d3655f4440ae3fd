"""CSV ingestion with the same corrupt-record discipline as the JSONL
source (sources/jsonl.py): explicit schema (no inference pass), PERMISSIVE
parse with a filterable corrupt column, and a (clean, corrupt) split so
bad lines are quarantined and countable instead of silently nulled.

CSV arrives in training-data pipelines as metadata sidecars (label maps,
source manifests, eval registries) far more often than as bulk corpus —
but those sidecars gate joins, so a silently-nulled row is a silently
wrong pipeline. Reads through the TEXT source + ``from_csv`` (JVM-side
parsing, no Python in the read path) for the same reason the JSONL
reader does: the csv source's internal corrupt column carries the
SPARK-21610 restriction, ``from_csv`` over a text scan does not.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

CORRUPT_COL = "_corrupt_record"


def read_csv(
    spark: SparkSession,
    path: str,
    schema: T.StructType,
    sep: str = ",",
    header: bool = True,
) -> tuple[DataFrame, DataFrame]:
    """Returns (clean, corrupt). ``header=True`` drops lines equal to the
    schema's own header rendering (the standard per-file header) before
    parsing, so headers neither parse as data nor count as corrupt."""
    full = T.StructType(
        list(schema.fields) + [T.StructField(CORRUPT_COL, T.StringType(), True)]
    )
    opts = {
        "mode": "PERMISSIVE",
        "columnNameOfCorruptRecord": CORRUPT_COL,
        "sep": sep,
    }
    lines = spark.read.text(path)
    if header:
        hdr = sep.join(f.name for f in schema.fields)
        lines = lines.filter(F.col("value") != hdr)
    parsed = lines.select(
        F.col("value"),
        F.from_csv("value", full.simpleString(), opts).alias("c"),
    )
    clean = parsed.filter(F.col(f"c.{CORRUPT_COL}").isNull()).select(
        *[F.col(f"c.{f.name}").alias(f.name) for f in schema.fields]
    )
    corrupt = parsed.filter(F.col(f"c.{CORRUPT_COL}").isNotNull()).select(
        F.col("value").alias(CORRUPT_COL)
    )
    return clean, corrupt


def write_csv(
    df: DataFrame, path: str, mode: str = "overwrite", header: bool = True
) -> None:
    """Export as CSV (metadata sidecars / spreadsheet handoff)."""
    df.write.mode(mode).option("header", str(header).lower()).csv(path)

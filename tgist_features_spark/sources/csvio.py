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
    """Returns (clean, corrupt).

    Limitation (inherent to the line-based text scan): quoted fields with
    EMBEDDED NEWLINES are split across lines — the fragments neither
    parse nor reach the corrupt set intact. Multiline CSV needs the
    native csv source's ``multiLine`` mode (and loses the SPARK-21610-free
    corrupt column this reader exists for); this reader targets the
    one-record-per-line sidecar shape.

    ``header=True`` discards the per-file header line without losing
    data rows where that is provable. The rule is decided by actually
    PARSING the header rendering under the schema once at plan-build
    time (a 1-row local evaluation):

    * header does NOT parse (the usual case: some column's NAME fails
      its declared non-string type) — header lines land in the corrupt
      set and are dropped FROM THE QUARANTINE by header-rendering
      equality. A legitimate data row that happens to render like the
      header parses fine and is never touched — provably lossless.
    * header DOES parse (all-string schemas, or pathological column
      names like a boolean column named "true") — the only available
      rule is pre-parse equality with the header rendering; a data row
      exactly equal to ``"col1<sep>col2..."`` is indistinguishable from
      a header and is dropped with it (documented trade — a text scan
      has no line numbers to scope the drop to each file's first
      line)."""
    full = T.StructType(
        list(schema.fields) + [T.StructField(CORRUPT_COL, T.StringType(), True)]
    )
    opts = {
        "mode": "PERMISSIVE",
        "columnNameOfCorruptRecord": CORRUPT_COL,
        "sep": sep,
    }
    hdr = sep.join(f.name for f in schema.fields)
    hdr_parses = header and (
        spark.range(1)
        .select(
            F.from_csv(F.lit(hdr), full.simpleString(), opts)[CORRUPT_COL]
            .alias("c")
        )
        .first()["c"]
        is None
    )
    lines = spark.read.text(path)
    if header and hdr_parses:
        lines = lines.filter(F.col("value") != hdr)
    parsed = lines.select(
        F.col("value"),
        F.from_csv("value", full.simpleString(), opts).alias("c"),
    )
    clean = parsed.filter(F.col(f"c.{CORRUPT_COL}").isNull()).select(
        *[F.col(f"c.{f.name}").alias(f.name) for f in schema.fields]
    )
    corrupt_pred = F.col(f"c.{CORRUPT_COL}").isNotNull()
    if header and not hdr_parses:
        corrupt_pred = corrupt_pred & (F.col("value") != hdr)
    corrupt = parsed.filter(corrupt_pred).select(
        F.col("value").alias(CORRUPT_COL)
    )
    return clean, corrupt


def write_csv(
    df: DataFrame, path: str, mode: str = "overwrite", header: bool = True
) -> None:
    """Export as CSV (metadata sidecars / spreadsheet handoff)."""
    df.write.mode(mode).option("header", str(header).lower()).csv(path)

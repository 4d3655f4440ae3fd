"""Timestamp helpers.

Parquet written by pyarrow carries naive timestamps, which Spark 4 reads as
TIMESTAMP_NTZ; the engine's own tables use TIMESTAMP (session tz = UTC).
``us()`` gives epoch microseconds for either — the engine's single canonical
time representation (integer arithmetic everywhere; no float time)."""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def us(col: str | Column) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.unix_micros(c.cast("timestamp"))

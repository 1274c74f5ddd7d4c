"""JSONL pages source/sink — the interchange format training-data
tooling actually exchanges (one JSON object per line).

Spark-native both ways (``spark.read.json`` / ``to_json`` + text
writer): schema is EXPLICIT on read — never inferred, because schema
inference scans the data twice and silently miscasts sparse fields at
scale — and binary html round-trips as base64 (JSON has no bytes
type; the encoding is part of the documented format contract).
"""

from __future__ import annotations

from typing import TYPE_CHECKING

from pyspark.sql import functions as F
from pyspark.sql.types import (
    StringType, StructField, StructType, TimestampType,
)

if TYPE_CHECKING:  # pragma: no cover
    from pyspark.sql import DataFrame, SparkSession

# wire schema: html carried as base64 text (JSON-safe)
JSONL_PAGES_SCHEMA = StructType([
    StructField("url", StringType(), False),
    StructField("warc_ts", TimestampType(), True),
    StructField("html_b64", StringType(), True),
    StructField("text", StringType(), True),
    StructField("lang", StringType(), True),
])


def write_pages_jsonl(df: "DataFrame", path: str,
                      html_col: str = "html") -> None:
    """Pages DataFrame → JSONL directory. ``html`` (binary) is written
    base64 under ``html_b64``; all other columns pass through."""
    cols = [F.base64(F.col(html_col)).alias("html_b64")
            if c == html_col else F.col(c) for c in df.columns]
    (df.select(*cols)
       .select(F.to_json(F.struct("*")).alias("value"))
       .write.mode("overwrite").text(path))


def read_pages_jsonl(spark: "SparkSession", path: str,
                     schema: StructType | None = None) -> "DataFrame":
    """JSONL directory → pages DataFrame with ``html`` decoded back to
    binary. Explicit schema (default :data:`JSONL_PAGES_SCHEMA`)."""
    df = spark.read.schema(schema or JSONL_PAGES_SCHEMA).json(path)
    if "html_b64" in df.columns:
        df = (df.withColumn("html", F.unbase64(F.col("html_b64")))
              .drop("html_b64"))
    return df

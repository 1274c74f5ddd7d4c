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


def read_pages_jsonl_zst(spark: "SparkSession", path: str,
                         schema: StructType | None = None) -> "DataFrame":
    """``.jsonl.zst`` shards → pages DataFrame. Datasets are commonly
    distributed as zstd-compressed JSONL; Spark's text source only
    inflates Hadoop-registered codecs (gzip), so like WARC the unit
    of parallelism is the FILE: one binaryFile task per shard (a zstd
    stream cannot be byte-split), the pure-stdlib RFC 8878 decoder
    (ops/zstdcodec.py) inflates inside mapInPandas, and lines parse
    with ``from_json`` under the EXPLICIT wire schema — same
    no-inference contract as :func:`read_pages_jsonl`. A shard that
    fails to inflate yields no rows (best-effort, same as a WARC
    member that fails to parse); per-doc budget is the caller-tuned
    ``max_out``."""
    import pandas as pd

    from goose_parser_spark.deploy import ship_package
    ship_package(spark)
    sch = schema or JSONL_PAGES_SCHEMA

    def run(batches):
        from goose_parser_spark.ops.zstdcodec import (
            ZstdError, decode_frames)
        for pdf in batches:
            lines: list[str] = []
            for content in pdf["content"]:
                if content is None:
                    continue
                try:
                    data, _, _ = decode_frames(
                        bytes(content), max_out=1 << 30,
                        verify_checksum=False)
                except ZstdError:
                    continue
                lines.extend(data.decode("utf-8", "replace").splitlines())
            yield pd.DataFrame({"value": lines})

    raw = (spark.read.format("binaryFile")
           .option("pathGlobFilter", "*.jsonl.zst")
           .load(path)
           .select("content"))
    text = raw.mapInPandas(run, schema="value string")
    df = (text.select(F.from_json("value", sch).alias("j"))
          .select("j.*"))
    if "html_b64" in df.columns:
        df = (df.withColumn("html", F.unbase64(F.col("html_b64")))
              .drop("html_b64"))
    return df


# per-shard inflate budget: datasets ship multi-hundred-MB shards,
# but a shard that inflates past 1 GiB in one task is either a bomb
# or mis-sharded — skipped, not OOM'd (same stance as the zst path).
_SHARD_BUDGET = 1 << 30


def _inflate_shard(name: str, content: bytes) -> bytes | None:
    """Inflate one JSONL shard by filename suffix, budget-bounded.
    gz/bz2/xz decode via the shared MULTI-MEMBER helper
    (sources/inflate.py): real shards are often concatenated members
    (``cat a.gz b.gz``, pbzip2 output) and the first-member-only
    stdlib shortcut silently dropped everything after member one —
    a code-review finding, now regression-pinned. zst and br ride
    the house pure-stdlib decoders (already multi-frame); a bare
    .jsonl passes through. Returns None (shard skipped, best-effort
    contract) on malformed, truncated-mid-member or over-budget
    streams."""
    suffix = name.rsplit(".", 1)[-1].lower()
    try:
        if suffix == "jsonl":
            return content
        if suffix == "zst":
            from goose_parser_spark.ops.zstdcodec import decode_frames
            data, _, _ = decode_frames(content, max_out=_SHARD_BUDGET,
                                       verify_checksum=False)
            return data
        if suffix == "br":
            from goose_parser_spark.ops.brotlicodec import decompress
            return decompress(content, max_out=_SHARD_BUDGET)
        if suffix in ("gz", "bz2", "xz"):
            from goose_parser_spark.sources.inflate import (
                inflate_members)
            return inflate_members(content, suffix, _SHARD_BUDGET)
    except Exception:  # noqa: BLE001 — malformed shard: skip
        return None
    return None  # unknown suffix


def read_pages_jsonl_compressed(
        spark: "SparkSession", path: str,
        schema: StructType | None = None) -> "DataFrame":
    """``.jsonl[.gz|.bz2|.xz|.zst|.br]`` shards (mixed codecs in one
    directory are fine) → pages DataFrame. Covers what corpora are
    actually distributed as: Common Crawl derivative JSONL (gz/zst),
    academic dumps (bz2 — e.g. Wikipedia-derived exports), HF-style
    xz shards, and br-armored exports. Same execution shape as
    :func:`read_pages_jsonl_zst`: the FILE is the unit of parallelism
    (none of these streams byte-split safely under a generic reader),
    inflate is budget-bounded per shard inside one map-only
    mapInPandas, and lines parse with ``from_json`` under the
    EXPLICIT wire schema. A shard that fails to inflate yields no
    rows (best-effort)."""
    import os

    import pandas as pd

    from goose_parser_spark.deploy import ship_package
    ship_package(spark)
    sch = schema or JSONL_PAGES_SCHEMA

    def run(batches):
        for pdf in batches:
            lines: list[str] = []
            for pth, content in zip(pdf["path"], pdf["content"]):
                if content is None:
                    continue
                data = _inflate_shard(os.path.basename(str(pth)),
                                      bytes(content))
                if data is None:
                    continue
                lines.extend(
                    data.decode("utf-8", "replace").splitlines())
            yield pd.DataFrame({"value": lines})

    raw = (spark.read.format("binaryFile")
           .option("pathGlobFilter", "*.jsonl*")
           .load(path)
           .select("path", "content"))
    text = raw.mapInPandas(run, schema="value string")
    df = (text.select(F.from_json("value", sch).alias("j"))
          .select("j.*"))
    if "html_b64" in df.columns:
        df = (df.withColumn("html", F.unbase64(F.col("html_b64")))
              .drop("html_b64"))
    return df

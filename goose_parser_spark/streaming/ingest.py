"""Structured Streaming ingestion: continuous crawl → extraction.

The reference processes one page at a time as it is fetched; the batch
pipeline (plans/pipeline.py) processes a finished crawl table. This
module covers the middle ground — a crawler continuously landing
parquet files of pages into a directory (or a Kafka topic of WARC
records on a real cluster) — as a Structured Streaming job:

    readStream (file source, schema = input_hint)
      → extract(...)            # same compiled rule tree, mapInArrow
      → writeStream parquet, partitioned, exactly-once via checkpoint

Because extraction is stateless and map-only, the whole rule-tree
engine lifts to streaming unchanged: no watermarks needed (no
aggregation), checkpointing gives exactly-once file-to-file delivery,
and the same per-doc failure isolation applies. Use
``trigger=availableNow`` for catch-up/backfill runs and the default
micro-batch trigger for continuous tailing.
"""

from __future__ import annotations

from pyspark.sql import SparkSession

from goose_parser_spark.extractor import extract
from goose_parser_spark.rules.compiler import CompiledRules, RuleCompiler
from goose_parser_spark.sources.fixtures import pages_schema


def stream_extract(
    spark: SparkSession,
    input_dir: str,
    rules: dict | CompiledRules,
    output_dir: str,
    checkpoint_dir: str,
    schema=None,
    available_now: bool = True,
    max_files_per_trigger: int | None = None,
):
    """Start a streaming extraction over a directory of pages parquet.

    Returns the StreamingQuery. Exactly-once: the file-source log +
    sink commit log both live under ``checkpoint_dir``; restarting
    after a kill resumes from the last committed micro-batch without
    reprocessing finished files (the streaming counterpart of the
    batch bucket-resume protocol, SURVEY.md §2.8 I3).
    """
    reader = (spark.readStream
              .schema(schema or pages_schema())
              .format("parquet"))
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    pages = reader.load(input_dir)

    extracted = extract(pages, rules)

    writer = (extracted.writeStream
              .format("parquet")
              .option("path", output_dir)
              .option("checkpointLocation", checkpoint_dir)
              .outputMode("append"))
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def run_stream_to_completion(query) -> None:
    """Block until an availableNow stream drains its backlog."""
    query.awaitTermination()

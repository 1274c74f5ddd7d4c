"""Structured Streaming ingestion: exactly-once extraction over a
growing directory of pages files."""

import glob
import json
import os

import pyarrow as pa
import pyarrow.parquet as pq

from goose_parser_spark.sources.fixtures import expected_for, pages_rows
from goose_parser_spark.streaming.ingest import stream_extract


def _write_batch(path: str, rows: list[dict]) -> None:
    table = pa.Table.from_pylist(rows, schema=pa.schema([
        pa.field("url", pa.string(), nullable=False),
        pa.field("warc_ts", pa.timestamp("us", tz="UTC"), nullable=False),
        pa.field("html", pa.binary(), nullable=False),
        pa.field("text", pa.string()),
        pa.field("lang", pa.string()),
    ]))
    pq.write_table(table, path)


def test_stream_extract_available_now(spark, tmp_path):
    in_dir = tmp_path / "in"
    in_dir.mkdir()
    rows = pages_rows(44)
    f01_rows = [r for i, r in enumerate(rows) if f"/f01/" in r["url"]]
    _write_batch(str(in_dir / "batch0.parquet"), f01_rows[:1])

    out_dir = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    rules = {"name": "title", "scope": "h1.title"}

    q = stream_extract(spark, str(in_dir), rules, out_dir, ckpt)
    q.awaitTermination()
    got1 = spark.read.parquet(out_dir).count()
    assert got1 == 1

    # a second batch lands; restart drains ONLY the new file
    _write_batch(str(in_dir / "batch1.parquet"), f01_rows[1:])
    q = stream_extract(spark, str(in_dir), rules, out_dir, ckpt)
    q.awaitTermination()

    out = spark.read.parquet(out_dir)
    assert out.count() == len(f01_rows)                      # no duplicates
    assert out.select("url").distinct().count() == len(f01_rows)
    for row in out.collect():
        i = int(row["url"].rsplit("/", 1)[1])
        want = json.loads(expected_for(i))
        assert row["extracted"]["title"] == want["title"]
        assert row["error"] is None

    # restart with no new data: nothing reprocessed
    files_before = sorted(glob.glob(f"{out_dir}/*.parquet"))
    q = stream_extract(spark, str(in_dir), rules, out_dir, ckpt)
    q.awaitTermination()
    assert sorted(glob.glob(f"{out_dir}/*.parquet")) == files_before

#!/usr/bin/env python
"""Emit the recommended production Iceberg DDL (SURVEY.md §4.2).

The sandbox runs on parquet (no Iceberg jar offline); on a real
cluster these specs give the pipeline its pruning and clustering:

- pages: hidden partitioning ``days(warc_ts)`` (time pruning for
  --since/--until) + ``bucket(N, url)`` (clusters the url-hash space so
  the extract job's resume buckets align with file layout);
- extracted: partitioned by the engine's bucket column (resume unit);
- metrics: tiny, unpartitioned.

Usage: python tools/iceberg_ddl.py [--buckets 4096] [--db warehouse]
"""

from __future__ import annotations

import argparse


def ddl(db: str, buckets: int) -> str:
    return f"""
-- input crawl table (Common-Crawl-style pages; input_hint BASELINE.json:15)
CREATE TABLE {db}.pages (
    url      STRING NOT NULL,
    warc_ts  TIMESTAMP NOT NULL,
    html     BINARY,
    text     STRING,
    lang     STRING
) USING iceberg
PARTITIONED BY (days(warc_ts), bucket({buckets}, url))
TBLPROPERTIES (
    'write.target-file-size-bytes' = '536870912',
    'read.split.target-size'       = '134217728',
    'write.parquet.compression-codec' = 'zstd'
);

-- extraction output (ExtractJob data table)
CREATE TABLE {db}.extracted (
    url       STRING NOT NULL,
    extracted STRING,            -- or the rule tree's struct type
    error     STRING,
    parse_ns  BIGINT,
    bytes_in  BIGINT,
    bucket    INT NOT NULL
) USING iceberg
PARTITIONED BY (bucket)
TBLPROPERTIES ('write.parquet.compression-codec' = 'zstd');

-- per-bucket lineage / resume ledger (ExtractJob metrics table)
CREATE TABLE {db}.extract_metrics (
    bucket         INT NOT NULL,
    docs_in        BIGINT,
    docs_ok        BIGINT,
    docs_failed    BIGINT,
    parse_ns       BIGINT,
    bytes_in       BIGINT,
    run_id         STRING,
    engine_version STRING,
    rules_sha256   STRING,
    completed_at   TIMESTAMP
) USING iceberg;
""".strip()


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--db", default="warehouse")
    p.add_argument("--buckets", type=int, default=4096)
    args = p.parse_args()
    print(ddl(args.db, args.buckets))

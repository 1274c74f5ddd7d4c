from goose_parser_spark.sources.fixtures import (
    FAMILIES,
    expected_for,
    pages_rows,
    pages_schema,
    write_pages_parquet,
)
from goose_parser_spark.sources.jsonl import (
    JSONL_PAGES_SCHEMA,
    read_pages_jsonl,
    read_pages_jsonl_compressed,
    write_pages_jsonl,
)
from goose_parser_spark.sources.warc import (
    iter_warc_records,
    read_warc,
    write_warc,
    write_warc_bytes,
)

__all__ = [
    "FAMILIES",
    "expected_for",
    "pages_rows",
    "pages_schema",
    "write_pages_parquet",
    "JSONL_PAGES_SCHEMA",
    "read_pages_jsonl",
    "read_pages_jsonl_compressed",
    "write_pages_jsonl",
    "iter_warc_records",
    "read_warc",
    "write_warc",
    "write_warc_bytes",
]

from goose_parser_spark.sources.fixtures import (
    FAMILIES,
    expected_for,
    pages_rows,
    pages_schema,
    write_pages_parquet,
)

__all__ = [
    "FAMILIES",
    "expected_for",
    "pages_rows",
    "pages_schema",
    "write_pages_parquet",
]

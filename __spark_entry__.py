"""Driver contract for the spark-graft builder (PySpark target).

``entry`` runs the flagship DOM-extraction query at sf0.001;
``queries``/``oracle_sql`` expose one entry per implemented operator
from SURVEY.md §2 (+ the training-data ops suite), with DuckDB oracle
SQL where the op is SQL-expressible (see
goose_parser_spark/driver_queries.py for the full inventory and the
rows-only rationale of the few non-SQL-expressible ones).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: full DOM extraction path (parse → rule tree → nested
    structs) over pages synthesized from sf0.001 documents."""
    from goose_parser_spark.driver_queries import q_extract_flagship

    return q_extract_flagship(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from goose_parser_spark.driver_queries import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    from goose_parser_spark.driver_queries import ORACLES

    return dict(ORACLES)

"""Jupyter notebook (.ipynb) cell extraction — pure Catalyst.

GitHub-scale code corpora are full of notebooks: JSON documents
whose prose lives in markdown cells and whose code lives in code
cells, both as line arrays. Unlike the codec layers this needs NO
Python at all — the notebook format is plain JSON, so the whole
extraction is ``from_json`` under an EXPLICIT schema (never
inferred, same contract as the JSONL sources) + ``posexplode`` +
``concat_ws``; it runs entirely inside whole-stage codegen and the
oracle replays it in any SQL engine.

Output: one row per cell — ``(id, cell_no, cell_type, source,
language)`` — ready for the downstream text/code quality splits
(markdown cells join the prose pipeline, code cells the code
pipeline; ``language`` comes from kernelspec metadata).
"""
from __future__ import annotations

from typing import TYPE_CHECKING

from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType, StringType, StructField, StructType,
)

if TYPE_CHECKING:  # pragma: no cover
    from pyspark.sql import DataFrame

__all__ = ["NOTEBOOK_SCHEMA", "notebook_cells"]

NOTEBOOK_SCHEMA = StructType([
    StructField("cells", ArrayType(StructType([
        StructField("cell_type", StringType(), True),
        StructField("source", ArrayType(StringType()), True),
    ])), True),
    StructField("metadata", StructType([
        StructField("kernelspec", StructType([
            StructField("language", StringType(), True),
        ]), True),
    ]), True),
])


def notebook_cells(df: "DataFrame", json_col: str = "notebook",
                   id_col: str = "doc_id") -> "DataFrame":
    """One row per notebook cell: ``id_col, cell_no, cell_type,
    source, language``. Cells whose source is NULL (malformed JSON,
    missing fields) are dropped; a document that is not notebook
    JSON at all yields no rows — the caller can anti-join for the
    poison set. 100-TB shape: no Python anywhere, one codegen'd
    projection + generator, no shuffle."""
    parsed = df.select(
        id_col,
        F.from_json(F.col(json_col), NOTEBOOK_SCHEMA).alias("nb"))
    cells = parsed.select(
        id_col,
        F.col("nb.metadata.kernelspec.language").alias("language"),
        F.posexplode_outer(F.col("nb.cells")).alias("cell_no", "c"))
    return (cells
            .where(F.col("c.source").isNotNull())
            .select(id_col, "cell_no",
                    F.col("c.cell_type").alias("cell_type"),
                    F.concat_ws("", F.col("c.source")).alias("source"),
                    "language"))

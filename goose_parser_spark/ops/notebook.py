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

def _nb_schema(source_type) -> StructType:
    return StructType([
        StructField("cells", ArrayType(StructType([
            StructField("cell_type", StringType(), True),
            StructField("source", source_type, True),
        ])), True),
        StructField("metadata", StructType([
            StructField("kernelspec", StructType([
                StructField("language", StringType(), True),
            ]), True),
        ]), True),
    ])


# nbformat allows "source" as EITHER an array of lines or a single
# string; Spark's from_json nulls the whole record on a type
# mismatch, so the document is parsed under BOTH schemas and the
# cell arrays coalesce (code-review finding — array-only schema
# silently dropped every string-sourced notebook)
NOTEBOOK_SCHEMA = _nb_schema(ArrayType(StringType()))
NOTEBOOK_SCHEMA_STR = _nb_schema(StringType())


def notebook_cells(df: "DataFrame", json_col: str = "notebook",
                   id_col: str = "doc_id") -> "DataFrame":
    """One row per notebook cell: ``id_col, cell_no, cell_type,
    source, language``. Both nbformat source spellings (line array
    and plain string) parse; a file mixing BOTH spellings resolves
    under whichever covers the whole document (the mixed case does
    not occur in writer output). Cells whose source is NULL are
    dropped; a document that is not notebook JSON at all yields no
    rows — the caller can anti-join for the poison set. 100-TB
    shape: no Python anywhere, codegen'd projections + one
    generator, no shuffle."""
    parsed = df.select(
        id_col,
        F.from_json(F.col(json_col), NOTEBOOK_SCHEMA).alias("na"),
        F.from_json(F.col(json_col),
                    NOTEBOOK_SCHEMA_STR).alias("ns"))
    cells_arr = F.transform(
        F.col("na.cells"),
        lambda c: F.struct(c["cell_type"].alias("cell_type"),
                           F.concat_ws("", c["source"])
                           .alias("source"),
                           c["source"].isNull().alias("_nosrc")))
    cells_str = F.transform(
        F.col("ns.cells"),
        lambda c: F.struct(c["cell_type"].alias("cell_type"),
                           c["source"].alias("source"),
                           c["source"].isNull().alias("_nosrc")))
    merged = parsed.select(
        id_col,
        F.coalesce(F.col("na.metadata.kernelspec.language"),
                   F.col("ns.metadata.kernelspec.language"))
        .alias("language"),
        F.coalesce(cells_arr, cells_str).alias("cells"))
    cells = merged.select(
        id_col, "language",
        F.posexplode_outer(F.col("cells")).alias("cell_no", "c"))
    return (cells
            .where(~F.coalesce(F.col("c._nosrc"), F.lit(True)))
            .select(id_col, "cell_no",
                    F.col("c.cell_type").alias("cell_type"),
                    F.col("c.source").alias("source"),
                    "language"))

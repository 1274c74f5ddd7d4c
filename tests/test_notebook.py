"""Jupyter notebook cell extraction (ops/notebook.py) — pure
Catalyst, pinned against json.dumps-authored real notebook JSON."""
from __future__ import annotations

import json


def _nb(cells, language="python"):
    return json.dumps({
        "cells": [{"cell_type": t,
                   "source": [s + "\n" for s in src.split("\n")],
                   "metadata": {}, "outputs": []}
                  for t, src in cells],
        "metadata": {"kernelspec": {"language": language,
                                    "name": "python3"}},
        "nbformat": 4, "nbformat_minor": 5,
    })


def test_notebook_cells(spark):
    from goose_parser_spark.ops.notebook import notebook_cells
    nb = _nb([("markdown", "# Title\nprose here"),
              ("code", "x = 1\nprint(x)")])
    df = spark.createDataFrame(
        [(1, nb), (2, "not json at all"), (3, _nb([], "r"))],
        "doc_id long, notebook string")
    rows = sorted(notebook_cells(df).collect(),
                  key=lambda r: (r.doc_id, r.cell_no))
    assert [(r.doc_id, r.cell_no, r.cell_type) for r in rows] == \
        [(1, 0, "markdown"), (1, 1, "code")]
    assert rows[0].source == "# Title\nprose here\n"
    assert rows[1].source == "x = 1\nprint(x)\n"
    assert rows[0].language == "python"


def test_notebook_cells_zero_python(spark):
    from goose_parser_spark.ops.notebook import notebook_cells
    df = spark.createDataFrame([(1, _nb([("code", "y")]))],
                               "doc_id long, notebook string")
    plan = notebook_cells(df)._jdf.queryExecution().executedPlan().toString()
    assert "MapInPandas" not in plan and "BatchEvalPython" not in plan

"""As-of (nearest-prior) join — the temporal operator Spark lacks.

``asof_join(left, right)`` attaches to every left row the most recent
right row with the same key and ``right.ts <= left.ts`` (direction
"backward"; e.g. each click joined to the view that preceded it, each
page fetch to the robots snapshot in force at fetch time).

Spark-first formulation — the classic UNION + window trick, one
shuffle total:

    union(left ⊕ right tagged by side)
      → window PARTITION BY key ORDER BY (ts, side, order)
      → last(right_value, ignorenulls=True) ROWS UNBOUNDED PRECEDING
      → keep left rows

This is a single hash exchange on the key followed by an in-partition
sort — exactly the shuffle a sort-merge join would pay, with no range
explosion and no per-key driver logic, so it scales like any keyed
window. Right rows sort BEFORE left rows at equal ts (``<=``
semantics); among equal-ts right rows the LAST in ``order_col`` order
wins (deterministic tie-break).

The DuckDB oracle uses its native ``ASOF LEFT JOIN`` — an independent
implementation, not a re-derivation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key_col: str,
    ts_col: str,
    value_cols: list[str] | None = None,
    order_col: str | None = None,
    suffix: str = "_asof",
) -> DataFrame:
    """Backward as-of join. Output: every ``left`` column plus each
    right ``value_cols`` column as ``<name><suffix>`` (NULL when no
    prior right row exists for the key).

    ``order_col`` (a right column) breaks ties among right rows with
    equal (key, ts): the greatest value wins. Defaults to the first
    value column.
    """
    value_cols = value_cols or [
        c for c in right.columns if c not in (key_col, ts_col)]
    order_col = order_col or value_cols[0]

    left_only = [c for c in left.columns if c not in (key_col, ts_col)]
    # side 0 = right (sorts first at equal ts → <= semantics), 1 = left
    r = right.select(
        F.col(key_col), F.col(ts_col),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c)
          for c in left_only],
        *[F.col(c).alias(f"{c}{suffix}") for c in value_cols],
        F.col(order_col).alias("_ord"),
        F.lit(0).alias("_side"))
    l = left.select(
        F.col(key_col), F.col(ts_col),
        *[F.col(c) for c in left_only],
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"{c}{suffix}")
          for c in value_cols],
        F.lit(None).cast(right.schema[order_col].dataType).alias("_ord"),
        F.lit(1).alias("_side"))
    u = r.unionByName(l)

    w = (Window.partitionBy(key_col)
         .orderBy(F.col(ts_col).asc(), F.col("_side").asc(),
                  F.col("_ord").asc_nulls_first())
         .rowsBetween(Window.unboundedPreceding, 0))
    filled = u.select(
        key_col, ts_col, *left_only, "_side",
        *[F.last(F.col(f"{c}{suffix}"), ignorenulls=True).over(w)
          .alias(f"{c}{suffix}") for c in value_cols])
    return (filled.where(F.col("_side") == 1).drop("_side")
            .select(key_col, ts_col, *left_only,
                    *[f"{c}{suffix}" for c in value_cols]))

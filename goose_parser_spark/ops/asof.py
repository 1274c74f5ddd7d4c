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

    All value columns come from the SAME matched right row: they ride
    in one struct through a single ``last(..., ignorenulls=True)``, so
    a NULL field in the most recent right row stays NULL in the output
    (matching DuckDB's native ASOF) instead of being forward-filled
    per-column from an older row (ADVICE r03 medium).
    """
    from pyspark.sql.types import StructField, StructType

    value_cols = value_cols or [
        c for c in right.columns if c not in (key_col, ts_col)]
    order_col = order_col or value_cols[0]

    left_only = [c for c in left.columns if c not in (key_col, ts_col)]
    rv_type = StructType([
        StructField(c, right.schema[c].dataType) for c in value_cols])
    # side 0 = right (sorts first at equal ts → <= semantics), 1 = left
    r = right.select(
        F.col(key_col), F.col(ts_col),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c)
          for c in left_only],
        F.struct(*[F.col(c).alias(c) for c in value_cols]).alias("_rv"),
        F.col(order_col).alias("_ord"),
        F.lit(0).alias("_side"))
    l = left.select(
        F.col(key_col), F.col(ts_col),
        *[F.col(c) for c in left_only],
        F.lit(None).cast(rv_type).alias("_rv"),
        F.lit(None).cast(right.schema[order_col].dataType).alias("_ord"),
        F.lit(1).alias("_side"))
    u = r.unionByName(l)

    w = (Window.partitionBy(key_col)
         .orderBy(F.col(ts_col).asc(), F.col("_side").asc(),
                  F.col("_ord").asc_nulls_first())
         .rowsBetween(Window.unboundedPreceding, 0))
    filled = u.select(
        key_col, ts_col, *left_only, "_side",
        F.last(F.col("_rv"), ignorenulls=True).over(w).alias("_rv"))
    return (filled.where(F.col("_side") == 1)
            .select(key_col, ts_col, *left_only,
                    *[F.col("_rv")[c].alias(f"{c}{suffix}")
                      for c in value_cols]))


def range_join(
    left: DataFrame,
    right: DataFrame,
    key_col: str,
    ts_col: str,
    start_col: str,
    end_col: str,
    bucket_seconds: int = 3600,
) -> DataFrame:
    """Interval (range) join: pair each left row with every right
    interval of the same key containing its timestamp
    (``start <= ts <= end``) — sessions, maintenance windows, price
    validity periods.

    Spark's optimizer turns a raw ``BETWEEN`` join condition into a
    cartesian-shaped nested-loop per key; the scale-safe formulation
    BUCKETIZES time: the left side gets one bucket per row, the right
    side explodes each interval over the buckets it spans (bounded by
    interval length / bucket_seconds), and the join runs on the narrow
    EQUI key (key, bucket) with the exact BETWEEN as a post-filter.
    A pair can only meet in the left row's single bucket, so no dedup
    pass is needed. Choose ``bucket_seconds`` ≈ typical interval
    length: shorter → more right-side rows; longer → more false
    candidates per bucket.
    """
    b = F.lit(bucket_seconds)
    lb = (F.unix_timestamp(F.col(ts_col)) / b).cast("long")
    l = left.withColumn("_b", lb)
    rspan = F.sequence((F.unix_timestamp(F.col(start_col)) / b).cast("long"),
                       (F.unix_timestamp(F.col(end_col)) / b).cast("long"))
    r = right.withColumn("_b", F.explode(rspan))
    joined = l.join(r, on=[key_col, "_b"], how="inner")
    return (joined.where((F.col(ts_col) >= F.col(start_col))
                         & (F.col(ts_col) <= F.col(end_col)))
            .drop("_b"))


def time_rollups(
    df: DataFrame,
    ts_col: str,
    key_cols: list[str],
    granularities_seconds: tuple[int, ...] = (60, 3600, 86400),
) -> DataFrame:
    """Hypertable-style cascading rollup: counts per key at several
    time granularities, where each COARSER level re-aggregates the
    FINEST level's partial counts instead of rescanning the raw table
    — at 100 TB the raw scan happens once, and every additional
    granularity costs only an agg over the (much smaller) finest
    rollup. Granularities must be ascending multiples of the finest.

    Output: ``bucket_start (timestamp), granularity_seconds,
    <key_cols...>, n``.
    """
    for g in granularities_seconds[1:]:
        if g % granularities_seconds[0]:
            raise ValueError("granularities must be multiples of the finest")
    finest = granularities_seconds[0]
    epoch = F.unix_timestamp(F.col(ts_col))
    base = (df.groupBy(((epoch / finest).cast("long") * finest)
                       .alias("_bs"), *key_cols)
            .agg(F.count("*").alias("n")))
    levels = [base.select(
        F.timestamp_seconds(F.col("_bs")).alias("bucket_start"),
        F.lit(finest).alias("granularity_seconds"), *key_cols, "n")]
    for g in granularities_seconds[1:]:
        lvl = (base.groupBy(((F.col("_bs") / g).cast("long") * g)
                            .alias("_gs"), *key_cols)
               .agg(F.sum("n").alias("n"))
               .select(F.timestamp_seconds(F.col("_gs"))
                       .alias("bucket_start"),
                       F.lit(g).alias("granularity_seconds"),
                       *key_cols, F.col("n")))
        levels.append(lvl)
    out = levels[0]
    for lvl in levels[1:]:
        out = out.unionByName(lvl)
    return out

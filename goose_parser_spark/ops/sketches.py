"""Mergeable sketches for corpus statistics at 100 TB.

Exact corpus-wide statistics (distinct counts, per-item frequencies)
need shuffles proportional to the key cardinality; at web scale the
standard answer is a fixed-size MERGEABLE sketch built with one
aggregation pass:

- :func:`count_min_build` / :func:`count_min_query` — Count-Min
  frequency sketch (Cormode & Muthukrishnan 2005): ``d`` hash rows ×
  ``w`` counters. The sketch table is ≤ d·w rows REGARDLESS of corpus
  size (one narrow groupBy with map-side partials), estimates are
  upper bounds with ε ≈ e/w overestimation at δ ≈ e^-d confidence,
  and two sketches merge by adding counters (union of corpora =
  sum of sketches) — the property that lets every partition/day/shard
  build independently.
- :func:`hll_build` / :func:`hll_estimate` — HyperLogLog distinct
  count (Flajolet et al. 2007): 2^p max-of-rho registers. Registers
  are one groupBy over (group, bucket); the estimate is the classic
  harmonic-mean formula with the small-range linear-counting
  correction, computed as a per-group aggregate.

Everything derives from md5 (not xxhash64), so the DuckDB oracle
reproduces the SKETCH CONTENTS and therefore the estimates exactly —
approximation error is a property of the algorithm, not nondeterminism.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def _md5_long(c: Column, salt: str, nhex: int = 15) -> Column:
    """First ``nhex`` hex chars of md5(c || salt) as a long (≤ 60
    bits — signed-safe in every engine)."""
    return F.conv(F.substring(
        F.md5(F.concat(c.cast("string"), F.lit(salt))), 1, nhex),
        16, 10).cast("long")


# --------------------------------------------------------------------------
# Count-Min sketch
# --------------------------------------------------------------------------

def count_min_build(
    df: DataFrame,
    item_col: str,
    depth: int = 4,
    width: int = 1024,
    weight_col: str | None = None,
) -> DataFrame:
    """Build the sketch: ``(row, col, c)`` — at most depth·width rows.
    ``weight_col`` (optional) adds that weight per item instead of 1.
    One explode(d) + one groupBy: the exchange carries ≤ depth·width
    counters per map task (map-side partial sums)."""
    item = F.col(item_col)
    w = F.col(weight_col) if weight_col else F.lit(1)
    rows = F.array(*[
        F.struct(F.lit(r).alias("row"),
                 F.pmod(_md5_long(item, f"#cm{r}"), F.lit(width))
                  .alias("col"))
        for r in range(depth)
    ])
    return (df.select(F.explode(rows).alias("rc"), w.alias("_w"))
            .groupBy(F.col("rc.row").alias("row"),
                     F.col("rc.col").alias("col"))
            .agg(F.sum("_w").cast("long").alias("c")))


def count_min_query(
    probes: DataFrame,
    sketch: DataFrame,
    item_col: str,
    depth: int = 4,
    width: int = 1024,
    out_col: str = "est",
) -> DataFrame:
    """Estimate each probe item's frequency: min over the ``depth``
    counters the item hashes to. ``depth`` broadcast joins against the
    (fixed-size) sketch — probe side never shuffles; absent counters
    count 0. Output: probe columns + ``out_col`` (an UPPER bound on
    the true count, exact when no collision)."""
    sketch = sketch.cache()  # d legs share one build materialization
    out = probes
    ests = []
    for r in range(depth):
        ccol, vcol = f"_c{r}", f"_v{r}"
        out = out.withColumn(
            ccol, F.pmod(_md5_long(F.col(item_col), f"#cm{r}"),
                         F.lit(width)))
        side = (sketch.where(F.col("row") == r)
                .select(F.col("col").alias(ccol), F.col("c").alias(vcol)))
        out = out.join(F.broadcast(side), on=ccol, how="left")
        ests.append(F.coalesce(F.col(vcol), F.lit(0)))
    return (out.withColumn(out_col, F.least(*ests))
            .select(*probes.columns, out_col))


# --------------------------------------------------------------------------
# HyperLogLog
# --------------------------------------------------------------------------

def hll_bucket_rho(item: Column, p: int = 9) -> tuple[Column, Column]:
    """Per-item HLL register coordinates as pure Catalyst columns:
    ``bucket`` = top ``p`` bits of the 60-bit md5 hash, ``rho`` = 1 +
    leading-zero count of the remaining ``60-p`` bits (capped for the
    all-zeros tail). Shared by the batch :func:`hll_build` and the
    streaming windowed-distinct aggregation
    (streaming/ingest.stream_distinct_hll)."""
    if not 4 <= p <= 16:
        raise ValueError("p must be in 4..16")
    h = _md5_long(item, "#hll")
    tail_bits = 60 - p
    bucket = F.shiftrightunsigned(h, tail_bits)
    tail = h.bitwiseAND(F.lit((1 << tail_bits) - 1))
    # rho = (number of leading zeros in tail_bits-wide tail) + 1
    #     = tail_bits - bitlen(tail) + 1 for tail > 0.
    # bitlen via a comparison ladder, NOT floor(log2(..)): log2 of an
    # exact power of two can land a hair below the integer in one
    # engine and flip the floor. Build the ladder with the LARGEST
    # threshold as the outermost when (ascending k wraps each previous
    # expression) — wrapping descending would make `tail >= 1 → 1` the
    # first test and every bitlen 1.
    bitlen = F.lit(0)
    for k in range(1, tail_bits + 1):
        bitlen = F.when(tail >= F.lit(1 << (k - 1)),
                        F.lit(k)).otherwise(bitlen)
    rho = F.when(tail > 0, F.lit(tail_bits) - bitlen + 1) \
           .otherwise(F.lit(tail_bits + 1))
    return bucket, rho.cast("int")


def hll_build(
    df: DataFrame,
    item_col: str,
    group_cols: list[str] | None = None,
    p: int = 9,
) -> DataFrame:
    """HLL registers per group: ``(group..., bucket, rho)`` — ≤ 2^p
    rows per group, one narrow groupBy(max), mergeable by max."""
    group_cols = group_cols or []
    bucket, rho = hll_bucket_rho(F.col(item_col), p)
    return (df.select(*group_cols, bucket.alias("bucket"),
                      rho.alias("_rho"))
            .groupBy(*group_cols, "bucket")
            .agg(F.max("_rho").alias("rho")))


def hll_estimate(
    registers: DataFrame,
    group_cols: list[str] | None = None,
    p: int = 9,
    out_col: str = "distinct_est",
) -> DataFrame:
    """Distinct-count estimate per group from :func:`hll_build`
    registers: harmonic-mean formula with the linear-counting
    correction for small ranges (the classic Flajolet variant).

    Determinism discipline: the harmonic sum Σ 2^-rho is accumulated
    as the INTEGER Σ 2^(R-rho) (R = max rho, every term a long) — a
    float sum would be partition-order-dependent and engine-divergent;
    the integer sum is exact and order-free, and the final formula is
    a single float expression over exact integers, so the estimate is
    oracle-checkable digit-for-digit.

    Output: ``group..., distinct_est`` (long)."""
    group_cols = group_cols or []
    m = 1 << p
    tail_bits = 60 - p
    R = tail_bits + 1
    alpha = 0.7213 / (1.0 + 1.079 / m)
    term = F.expr(f"shiftleft(CAST(1 AS BIGINT), {R} - rho)")
    agg = (registers.groupBy(*group_cols)
           .agg(F.sum(term).cast("long").alias("_S"),
                F.count("*").alias("_nz")))
    zeros = F.lit(m) - F.col("_nz")
    # raw = α m² / (Σ2^-rho + zeros)  with  Σ2^-rho = S / 2^R
    raw = (F.lit(alpha * m * m * float(2 ** R))
           / (F.col("_S") + zeros * F.lit(float(2 ** R))))
    linear = F.lit(float(m)) * F.log(F.lit(float(m)) / zeros)
    est = F.when((raw <= 2.5 * m) & (zeros > 0), linear).otherwise(raw)
    return agg.select(*group_cols,
                      F.round(est).cast("long").alias(out_col))

"""Count-Min and HyperLogLog sketches (ops/sketches.py)."""

import pytest

from pyspark.sql import functions as F


def test_count_min_upper_bound_and_exactness(spark):
    from goose_parser_spark.ops.sketches import (
        count_min_build, count_min_query)
    # skewed corpus: 'hot' 500×, 'warm' 50×, 200 distinct singletons
    rows = ([("hot",)] * 500 + [("warm",)] * 50
            + [(f"cold{i}",) for i in range(200)])
    df = spark.createDataFrame(rows, "term string")
    sketch = count_min_build(df, "term", depth=4, width=256)
    assert sketch.count() <= 4 * 256
    probes = spark.createDataFrame(
        [("hot",), ("warm",), ("cold7",), ("never_seen",)], "term string")
    est = {r["term"]: r["est"] for r in
           count_min_query(probes, sketch, "term", depth=4,
                           width=256).collect()}
    truth = {"hot": 500, "warm": 50, "cold7": 1, "never_seen": 0}
    # CMS never underestimates; overestimate bounded in practice by
    # the collision mass (750 items in 256 columns, min over 4 rows)
    for t, n in truth.items():
        assert est[t] >= n, (t, est[t], n)
        assert est[t] <= n + 30, (t, est[t], n)
    # heavy hitter is exact whp at this width
    assert est["hot"] == 500


def test_count_min_mergeable(spark):
    from goose_parser_spark.ops.sketches import (
        count_min_build, count_min_query)
    a = spark.createDataFrame([("x",)] * 10 + [("y",)] * 3, "term string")
    b = spark.createDataFrame([("x",)] * 7 + [("z",)] * 5, "term string")
    merged = (count_min_build(a, "term", depth=3, width=64)
              .unionByName(count_min_build(b, "term", depth=3, width=64))
              .groupBy("row", "col").agg(F.sum("c").cast("long").alias("c")))
    direct = count_min_build(a.unionByName(b), "term", depth=3, width=64)
    assert (sorted(tuple(r) for r in merged.collect())
            == sorted(tuple(r) for r in direct.collect()))
    probes = spark.createDataFrame([("x",), ("y",), ("z",)], "term string")
    est = {r["term"]: r["est"] for r in
           count_min_query(probes, merged, "term", depth=3,
                           width=64).collect()}
    assert est["x"] >= 17 and est["y"] >= 3 and est["z"] >= 5


def test_hll_estimate_accuracy_and_merge(spark):
    from goose_parser_spark.ops.sketches import hll_build, hll_estimate
    n = 20_000
    df = spark.range(n).select(
        F.concat(F.lit("item"), F.col("id").cast("string")).alias("k"),
        (F.col("id") % 2).cast("string").alias("g"))
    regs = hll_build(df, "k", group_cols=["g"], p=9)
    # ≤ 2^9 registers per group
    assert (regs.groupBy("g").count()
            .where(F.col("count") > 512).count()) == 0
    est = {r["g"]: r["distinct_est"] for r in
           hll_estimate(regs, group_cols=["g"], p=9).collect()}
    for g in ("0", "1"):
        true = n // 2
        assert abs(est[g] - true) / true < 0.12, (g, est[g])  # ~3/√512
    # merge = max over registers; equals the union's own registers
    half1 = hll_build(df.where("id < 10000").select("k"), "k", p=9)
    half2 = hll_build(df.where("id >= 10000").select("k"), "k", p=9)
    merged = (half1.unionByName(half2).groupBy("bucket")
              .agg(F.max("rho").alias("rho")))
    full = hll_build(df.select("k"), "k", p=9)
    assert (sorted(tuple(r) for r in merged.collect())
            == sorted(tuple(r) for r in full.collect()))


def test_hll_small_range_linear_counting(spark):
    from goose_parser_spark.ops.sketches import hll_build, hll_estimate
    df = spark.createDataFrame([(f"v{i}",) for i in range(40)], "k string")
    est = hll_estimate(hll_build(df, "k", p=9), p=9).collect()[0]
    # linear-counting regime: small cardinalities are near-exact
    assert abs(est["distinct_est"] - 40) <= 3, est

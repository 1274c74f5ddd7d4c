"""Similarity search over embedding columns (``array<float>``).

- :func:`cosine_topk` — brute-force cosine top-k: the exact baseline.
  ``F.aggregate``/``F.zip_with`` keep the dot product inside codegen;
  no Python, no shuffle except the final top-k (which is a
  TakeOrdered, not a sort of the full table).
- :func:`lsh_cosine_topk` — the scale path: deterministic random-
  hyperplane LSH buckets prune candidates before exact scoring. At
  100 TB you pre-materialize ``lsh_bucket`` as a column (or Iceberg
  hidden partition) and probe only matching buckets: the scan prunes
  to buckets instead of reading every vector.

Determinism: hyperplanes derive from ``sin(k)``-style fixed formulas
of (plane, dim) — no RNG state, identical across runs and engines.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame, functions as F


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y),
                       F.lit(0.0), lambda acc, x: acc + x)


def _norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x * x))


def cosine_similarity(a: Column, b: Column) -> Column:
    return _dot(a, b) / (_norm(a) * _norm(b))


def cosine_topk(
    df: DataFrame,
    query: list[float],
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    round_to: int = 4,
) -> DataFrame:
    """Exact cosine top-k for one query vector.

    The query is a literal array (broadcast by value inside the plan).
    Rounding bounds cross-engine float drift for oracle comparison.
    Columns: ``vec_id, sim``.
    """
    qcol = F.array(*[F.lit(float(x)) for x in query]).cast("array<double>")
    scored = df.select(
        F.col(id_col),
        F.round(cosine_similarity(F.col(vec_col).cast("array<double>"), qcol),
                round_to).alias("sim"),
    )
    # orderBy+limit compiles to TakeOrderedAndProject: per-partition
    # top-k then a k-row merge on the driver — no global sort shuffle.
    return scored.orderBy(F.col("sim").desc(), F.col(id_col)).limit(k)


def _hyperplane(plane: int, dim: int) -> float:
    """Deterministic pseudo-random component in [-1, 1]: a fixed
    sin-hash of (plane, dim). Stable across runs/engines by
    construction (pure math, no RNG)."""
    x = math.sin(plane * 12.9898 + dim * 78.233) * 43758.5453
    return 2.0 * (x - math.floor(x)) - 1.0


def lsh_bucket(
    vec_col: str | Column,
    dims: int,
    num_planes: int = 8,
) -> Column:
    """Random-hyperplane LSH bucket id (0..2^num_planes-1) as a pure
    Catalyst expression: sign pattern of ``num_planes`` fixed
    hyperplane dot products."""
    v = F.col(vec_col) if isinstance(vec_col, str) else vec_col
    v = v.cast("array<double>")
    bucket = F.lit(0).cast("long")
    for p in range(num_planes):
        plane = F.array(*[F.lit(_hyperplane(p, d)) for d in range(dims)])
        bit = F.when(_dot(v, plane) >= 0, F.lit(1).cast("long")) \
               .otherwise(F.lit(0).cast("long"))
        bucket = bucket + bit * F.lit(2 ** p).cast("long")
    return bucket


def embedding_cosine_pairs(
    df: DataFrame,
    threshold: float = 0.45,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    round_to: int = 4,
    lsh_prefilter: bool = False,
    num_planes: int = 4,
) -> Column:
    """Embedding-cosine near-duplicate pairs: ``id_a, id_b, sim``.

    ``lsh_prefilter=False`` is the exact O(n²) baseline (self-join,
    all cosine sims JVM-side) — correct at any n, affordable for
    validation scales. At 100 TB set ``lsh_prefilter=True``: the join
    key becomes the hyperplane-LSH bucket, so only same-bucket vector
    pairs are scored — the standard blocking trick; recall/threshold
    tradeoffs are pytest-measured against the exact baseline.
    """
    a = df.select(F.col(id_col).alias("id_a"),
                  F.col(vec_col).cast("array<double>").alias("va"))
    b = df.select(F.col(id_col).alias("id_b"),
                  F.col(vec_col).cast("array<double>").alias("vb"))
    if lsh_prefilter:
        dims = len(df.select(vec_col).head()[0])
        a = a.withColumn("_b", lsh_bucket("va", dims, num_planes))
        b = b.withColumn("_b", lsh_bucket("vb", dims, num_planes))
        joined = a.join(b, on="_b").where(F.col("id_a") < F.col("id_b"))
    else:
        joined = a.join(b, F.col("id_a") < F.col("id_b"))
    sim = F.round(cosine_similarity(F.col("va"), F.col("vb")), round_to)
    return (joined.withColumn("sim", sim)
            .where(F.col("sim") >= threshold)
            .select("id_a", "id_b", "sim"))


def lsh_cosine_topk(
    df: DataFrame,
    query: list[float],
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    num_planes: int = 8,
    probe_hamming: int = 1,
    round_to: int = 4,
) -> DataFrame:
    """Approximate cosine top-k: score only vectors whose LSH bucket is
    within ``probe_hamming`` bits of the query's bucket (multi-probe).

    The bucket filter is a plain predicate → at scale it prunes the
    scan (partition/file pruning when bucket is a partition column)
    instead of reading 100 TB of vectors. Columns: ``vec_id, sim``.
    """
    dims = len(query)
    qbucket = 0
    for p in range(num_planes):
        dot = sum(query[d] * _hyperplane(p, d) for d in range(dims))
        qbucket += (1 << p) if dot >= 0 else 0

    probes = {qbucket}
    if probe_hamming >= 1:
        for p in range(num_planes):
            probes.add(qbucket ^ (1 << p))
    if probe_hamming >= 2:
        for p in range(num_planes):
            for q in range(p + 1, num_planes):
                probes.add(qbucket ^ (1 << p) ^ (1 << q))

    with_bucket = df.withColumn(
        "_lsh", lsh_bucket(vec_col, dims, num_planes))
    pruned = with_bucket.where(F.col("_lsh").isin(*sorted(probes)))
    return cosine_topk(pruned.drop("_lsh"), query, k=k, vec_col=vec_col,
                       id_col=id_col, round_to=round_to)

"""Deterministic sampling / quota operators for corpus curation.

Training-data pipelines never use ``rand()`` for subsetting: a sample
must be REPRODUCIBLE across reruns, resumable jobs, and engines (the
oracle re-derives it). Both operators here are pure Catalyst:

- :func:`sample_by_hash` — content-hash thresholding: keep a row iff
  the md5 of its key falls below a rate-derived hex threshold. md5 is
  bit-identical everywhere (unlike xxhash64, which seeds differently
  across engines), so the EXACT same subset falls out of Spark and the
  DuckDB oracle. At 100 TB this is a scan-level filter: no shuffle, no
  state, prunes before anything heavy runs.
- :func:`per_domain_quota` — stratified cap: keep the first ``quota``
  rows per group in a deterministic order (per-domain data caps /
  politeness budgets / per-source balancing). One hash exchange on the
  group key; Spark pushes a WindowGroupLimit BELOW the exchange, so
  each map task pre-trims to ``quota`` rows per group before any data
  moves — the shuffle carries at most quota×groups rows, not the
  corpus.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F


def hash_bucket_hex(key: Column, salt: str = "") -> Column:
    """First 8 hex chars of md5(key || salt) — a uniform [0, 16^8)
    draw, identical in any engine with md5."""
    return F.substring(F.md5(F.concat(key.cast("string"), F.lit(salt))), 1, 8)


def sample_by_hash(
    df: DataFrame,
    key_col: str,
    rate: float,
    salt: str = "",
) -> DataFrame:
    """Deterministic ``rate``-fraction sample keyed on ``key_col``.

    The same (key, salt) is always in or always out — stable across
    reruns/partitionings/engines, and different salts give independent
    samples (e.g. train/held-out splits that provably don't overlap:
    disjoint threshold bands, not different salts, if you need hard
    disjointness).
    """
    if not 0.0 <= rate <= 1.0:
        raise ValueError(f"rate must be in [0, 1], got {rate}")
    thr = format(int(rate * 16 ** 8), "08x")
    return df.where(hash_bucket_hex(F.col(key_col), salt) < F.lit(thr))


def per_domain_quota(
    df: DataFrame,
    group_col: str,
    order_col: str,
    quota: int,
) -> DataFrame:
    """Keep the first ``quota`` rows of each ``group_col`` group,
    ordered by ``order_col`` (ties broken by it being unique upstream —
    pass a unique id). Output columns are unchanged."""
    w = Window.partitionBy(group_col).orderBy(F.col(order_col).asc())
    return (df.withColumn("_rn", F.row_number().over(w))
            .where(F.col("_rn") <= quota)
            .drop("_rn"))

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


def hash_split(
    df: DataFrame,
    key_col: str,
    weights: dict[str, float],
    salt: str = "",
    out_col: str = "split",
) -> DataFrame:
    """Deterministic train/val/test split: label each row by which
    md5-threshold BAND its key falls in. Bands are disjoint by
    construction, so splits provably never overlap and never change as
    the corpus grows (a key's band depends only on (key, salt)) — the
    property random splits can't give a resumable 100 TB pipeline.

    ``weights`` maps label → fraction; must sum to ≤ 1 (any remainder
    is dropped — useful for "1% val, 1% test, rest train" via
    explicit weights plus a train band). Iteration order of the dict
    fixes band order, so pass the same dict across runs.
    """
    total = sum(weights.values())
    if total > 1.0 + 1e-9:
        raise ValueError(f"weights sum to {total} > 1")
    bucket = hash_bucket_hex(F.col(key_col), salt)
    expr = None
    lo = 0.0
    for label, w in weights.items():
        hi = lo + w
        if hi >= 1.0 - 1e-12:
            # final band covers everything: no upper bound, so the
            # (astronomically rare) key hashing to 'ffffffff' keeps
            # its label too
            cond = F.lit(True)
        else:
            hi_hex = format(min(int(hi * 16 ** 8), 16 ** 8 - 1), "08x")
            cond = bucket < F.lit(hi_hex)
        branch = F.lit(label)
        expr = F.when(cond, branch) if expr is None else expr.when(cond, branch)
        lo = hi
    expr = expr.otherwise(F.lit(None).cast("string"))
    return df.withColumn(out_col, expr).where(F.col(out_col).isNotNull())


def pack_sequences(
    df: DataFrame,
    tokens_col: str,
    order_col: str,
    tokens_per_seq: int,
    buckets: int = 256,
    id_col: str = "doc_id",
) -> DataFrame:
    """Sequence packing for LM training: assign documents to
    fixed-token-budget training sequences. Deterministic greedy
    fill-in-order WITHIN hash buckets:

    - ``bucket = md5-prefix(order_col) % buckets`` spreads work;
      packing never crosses buckets, so at 100 TB each bucket packs
      independently (one narrow shuffle on the bucket key, window
      cumsum inside — no global sort, no single-partition bottleneck).
      md5 (not xxhash64) keeps the bucket engine-reproducible, so the
      whole packing is oracle-checkable.
    - within a bucket, docs are taken in ``order_col`` order and
      ``seq_id = floor((cumsum(tokens) - tokens) / tokens_per_seq)``
      — the CUMULATIVE-BUDGET discipline: a doc starts in the
      sequence its running offset falls in (docs longer than the
      budget span sequences; real packers chunk those upstream).

    Output: input columns + ``bucket, seq_id, seq_offset`` where
    ``seq_offset`` is the doc's token offset within its bucket's
    stream. Deterministic — the same corpus always packs identically.
    """
    b = F.pmod(
        F.conv(F.substring(F.md5(F.col(order_col).cast("string")), 1, 4),
               16, 10).cast("int"),
        F.lit(buckets)).cast("int")
    with_b = df.withColumn("bucket", b)
    w = (Window.partitionBy("bucket").orderBy(F.col(order_col).asc())
         .rowsBetween(Window.unboundedPreceding, 0))
    cum = F.sum(F.col(tokens_col)).over(w)
    start = (cum - F.col(tokens_col)).cast("long")
    return (with_b
            .withColumn("seq_offset", start)
            .withColumn("seq_id", F.floor(F.col("seq_offset")
                                          / tokens_per_seq).cast("long")))

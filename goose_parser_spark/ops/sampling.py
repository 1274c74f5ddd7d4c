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


def rate_threshold_hex(rate: float) -> str:
    """Hex threshold for ``hash_bucket_hex(k) < thr`` keeping ``rate``
    of keys. rate=1.0 needs care: int(16^8) formats to the NINE-char
    '100000000', and 8-char prefixes compare lexicographically against
    it char-by-char — only prefixes starting '0' pass (a 1/16 sample
    silently). 'g' sorts after every hex digit, so it keeps all."""
    if rate >= 1.0:
        return "g"
    return format(int(rate * 16 ** 8), "08x")


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
    thr = rate_threshold_hex(rate)
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


def stratified_sample_by_hash(
    df: DataFrame,
    key_col: str,
    group_col: str,
    rates: dict[str, float],
    salt: str = "",
    default_rate: float = 0.0,
) -> DataFrame:
    """Training-mixture construction: sample each ``group_col`` stratum
    at its own rate (e.g. books 0.9, web 0.3, boilerplate 0.05 — the
    per-source weighting step of an LM data recipe). Same md5-threshold
    discipline as :func:`sample_by_hash`, so membership is a pure
    function of (key, salt): reruns, engine swaps, and corpus growth
    never change which rows are in.

    ``rates`` is a literal map (data mixtures have dozens of sources,
    not millions) compiled into one CASE expression — a scan-level
    filter, zero joins, zero shuffles at any corpus size. Groups
    absent from ``rates`` sample at ``default_rate`` (0.0 = drop).
    """
    for g, r in rates.items():
        if not 0.0 <= r <= 1.0:
            raise ValueError(f"rate for {g!r} must be in [0, 1], got {r}")
    if not 0.0 <= default_rate <= 1.0:
        raise ValueError(f"default_rate must be in [0, 1], got {default_rate}")

    def thr(rate: float) -> Column:
        return F.lit(rate_threshold_hex(rate))

    expr = None
    for g, r in rates.items():
        cond = F.col(group_col) == g
        expr = F.when(cond, thr(r)) if expr is None else expr.when(cond, thr(r))
    expr = thr(default_rate) if expr is None else expr.otherwise(thr(default_rate))
    return df.where(hash_bucket_hex(F.col(key_col), salt) < expr)


def assign_shards(
    df: DataFrame,
    key_col: str,
    n_shards: int,
    salt: str = "",
) -> DataFrame:
    """Deterministic global shuffle into training shards: every row
    gets a ``shard`` (md5-prefix mod ``n_shards``) and a dense ``pos``
    within its shard (rank in md5 order). Together they define a
    reproducible pseudo-random permutation of the corpus — the
    shuffle a training run reads back shard-by-shard — without
    ``rand()`` and without a global sort: one exchange on the shard
    key, per-shard ordering inside (at 100 TB: write with
    ``partitionBy(shard)`` + sort within partitions, same plan).

    md5 everywhere (not xxhash64) so the oracle reproduces the exact
    permutation. ``pos`` orders by the FULL md5 hex (independent of
    the shard-assignment prefix) with the key as tiebreak.
    """
    if n_shards < 1:
        raise ValueError(f"n_shards must be >= 1, got {n_shards}")
    full = F.md5(F.concat(F.col(key_col).cast("string"), F.lit(salt)))
    shard = F.pmod(F.conv(F.substring(full, 1, 8), 16, 10).cast("long"),
                   F.lit(n_shards)).cast("int")
    with_s = df.withColumn("shard", shard).withColumn("_h", full)
    w = Window.partitionBy("shard").orderBy(F.col("_h").asc(),
                                            F.col(key_col).asc())
    return (with_s.withColumn("pos", F.row_number().over(w).cast("long"))
            .drop("_h"))


def materialize_sequences(
    packed: DataFrame,
    text_col: str = "text",
    sep: str = "<|doc|>",
    tokens_col: str = "n_tokens",
    id_col: str = "doc_id",
) -> DataFrame:
    """Last-mile packing: emit one row per training sequence with its
    member docs joined in offset order. Input is :func:`pack_sequences`
    output plus the text column.

    ``collect_list`` order is NOT deterministic under retries/AQE, so
    members are collected as (offset, id, text) structs and
    ``array_sort``-ed (struct ordering = field order → offset, then id)
    BEFORE joining — the emitted sequence text is bit-identical on
    every run and engine. One hash-agg on (bucket, seq_id).

    ``tokens_col``/``id_col`` mirror :func:`pack_sequences`' defaults
    (ADVICE r03: the two stages must accept the same column names).

    Output: ``bucket, seq_id, n_docs, seq_tokens, seq_text``.
    """
    member = F.struct(F.col("seq_offset"), F.col(id_col),
                      F.col(text_col).alias("t"))
    return (packed.groupBy("bucket", "seq_id")
            .agg(F.count("*").alias("n_docs"),
                 F.sum(tokens_col).cast("long").alias("seq_tokens"),
                 F.array_join(
                     F.transform(F.array_sort(F.collect_list(member)),
                                 lambda m: m["t"]),
                     sep).alias("seq_text")))


def dsir_logratio(
    raw: DataFrame,
    target: DataFrame,
    buckets: int = 4096,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """DSIR-style importance weight (Xie et al. 2023, "Data Selection
    for Language Models via Importance Resampling" — public method):
    score each raw document by the log-likelihood ratio of its hashed
    unigrams under the TARGET distribution vs the RAW distribution,
    with add-one smoothing over ``buckets`` hash buckets. High scores
    = raw docs that look like the target domain; resample raw by this
    weight (e.g. :func:`sample_by_hash` on a score threshold) to tilt
    a web corpus toward a quality domain.

    Determinism: bucket = md5-prefix(token) % buckets (engine-exact),
    and each token's two log terms are rounded to integer MICRO-NATS
    before summation — the sum of longs is order-free, so the oracle
    reproduces the score exactly (same discipline as
    :func:`goose_parser_spark.ops.textstats.unigram_logprob`).

    Scale shape: both count tables are ≤ ``buckets`` rows BY
    CONSTRUCTION (bounded like IVF centroids, never corpus-growing),
    so they broadcast; the raw side pays one token explode + one
    groupBy(doc) — narrow (doc, bucket) shuffle keys, never the text.

    Output: ``id_col, n_tokens, dsir_micro`` (sum of per-token
    micro-nat log ratios; raw docs with no tokens are absent).
    """
    def toks(df: DataFrame) -> DataFrame:
        t = F.filter(F.split(F.col(text_col), " "), lambda x: x != "")
        ex = df.select(F.col(id_col), F.explode(t).alias("_t"))
        b = F.pmod(F.conv(F.substring(F.md5(F.col("_t")), 1, 8), 16, 10)
                   .cast("long"), F.lit(buckets))
        return ex.select(F.col(id_col), b.alias("b"))

    raw_t = toks(raw)
    tgt_t = toks(target)
    tgt_counts = tgt_t.groupBy("b").agg(F.count("*").alias("ct"))
    raw_counts = raw_t.groupBy("b").agg(F.count("*").alias("cr"))
    totals = (tgt_t.agg(F.count("*").alias("nt"))
              .crossJoin(raw_t.agg(F.count("*").alias("nr"))))
    # bucket tables are bounded by `buckets` — broadcast is safe at any
    # corpus size (the totals row is 1 row)
    scored = (raw_t
              .join(F.broadcast(tgt_counts), on="b", how="left")
              .join(F.broadcast(raw_counts), on="b", how="left")
              .crossJoin(F.broadcast(totals)))
    ct = F.coalesce(F.col("ct"), F.lit(0))
    cr = F.coalesce(F.col("cr"), F.lit(0))
    micro = (F.round(F.log((ct + 1.0) / (F.col("nt") + buckets)) * 1_000_000)
             .cast("long")
             - F.round(F.log((cr + 1.0) / (F.col("nr") + buckets))
                       * 1_000_000).cast("long"))
    return (scored.groupBy(id_col)
            .agg(F.count("*").alias("n_tokens"),
                 F.sum(micro).alias("dsir_micro")))


def select_token_budget(
    df: DataFrame,
    budget: int,
    quality_col: str = "quality",
    tokens_col: str = "n_tokens",
    id_col: str = "doc_id",
) -> DataFrame:
    """Global token-budget selection: keep the highest-quality
    documents whose cumulative token count fills ``budget`` — the
    final curation step before pretraining ("give me the best N
    billion tokens"), reference behavior: the quality-threshold pass
    every published pipeline (C4, CCNet, Gopher, FineWeb) runs after
    scoring.

    Semantics (deterministic, engine-reproducible): order documents by
    ``quality`` DESC, then ``md5(id)``, then ``id``; keep the maximal
    prefix whose INCLUSIVE token sum is ≤ budget.

    Plan — never a global per-document sort: one hash-agg collapses
    the corpus to a per-quality-bucket histogram (bounded: quality
    scores are integers in this repo's milli/micro-unit discipline); a
    window cumsum over that tiny table classifies each bucket as
    keep-whole / drop-whole / boundary; whole buckets resolve with a
    scan-level filter after a bounded hash join (AQE broadcasts the
    histogram), and only the SINGLE boundary bucket pays a per-doc
    ordered cumsum. At 100 TB with milli-unit scores the boundary
    bucket is a vanishing corpus fraction; the coarser the score, the
    larger that one ordered partition — use finer scores, not a
    coarser budget. Rows with NULL quality or tokens are dropped.

    Output: the kept rows of ``df`` (original columns, no order
    guarantee).
    """
    cols = df.columns
    df = df.where(F.col(quality_col).isNotNull()
                  & F.col(tokens_col).isNotNull())
    hist = df.groupBy(quality_col).agg(F.sum(tokens_col).alias("_bt"))
    # bounded table: single-partition window is fine (and the only
    # place a global order exists in this plan)
    wq = (Window.orderBy(F.col(quality_col).desc())
          .rowsBetween(Window.unboundedPreceding, -1))
    hist = hist.select(
        quality_col, "_bt",
        F.coalesce(F.sum("_bt").over(wq), F.lit(0)).alias("_cb"))
    j = df.join(hist, on=quality_col)
    full = j.where(F.col("_cb") + F.col("_bt") <= budget)
    boundary = j.where((F.col("_cb") < budget)
                       & (F.col("_cb") + F.col("_bt") > budget))
    wd = (Window.partitionBy(quality_col)
          .orderBy(F.md5(F.col(id_col).cast("string")).asc(),
                   F.col(id_col).asc())
          .rowsBetween(Window.unboundedPreceding, 0))
    part = (boundary
            .withColumn("_dc", F.sum(tokens_col).over(wd))
            .where(F.col("_cb") + F.col("_dc") <= budget))
    return full.select(cols).unionByName(part.select(cols))

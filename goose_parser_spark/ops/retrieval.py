"""Lexical retrieval: BM25 top-k search over the corpus.

The lexical complement to the embedding ANN operators (public
knowledge: Robertson/Zaragoza BM25, with the Lucene idf variant
``ln(1 + (N - df + 0.5)/(df + 0.5))``). Used in data pipelines for
quality probes ("which training docs answer this eval question" —
contamination triage), corpus search, and hard-negative mining.

Scale shape (the inverted-index plan, no index structure needed):
postings ``(term, doc, tf)`` are one explode + hash-agg; document
frequencies one agg over postings; the query-term table is tiny and
joins postings on the term key — the only corpus-sized shuffle is
keyed by term, exactly an inverted-index build. Top-k per query is a
window over the bounded query partition.

Determinism: per-(doc, term) BM25 contributions are rounded to
integer MICRO-units and summed as BIGINTs (the
:func:`goose_parser_spark.ops.textstats.unigram_logprob` trick), so
parallel summation order cannot perturb scores and a DuckDB oracle
reproduces rankings bit-for-bit; ties break by doc id.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def bm25_topk(
    docs: DataFrame,
    queries: DataFrame,
    k: int = 10,
    k1_milli: int = 1200,
    b_milli: int = 750,
    text_col: str = "text",
    id_col: str = "doc_id",
    query_id_col: str = "query_id",
    query_col: str = "query",
) -> DataFrame:
    """Top-``k`` documents per query by BM25.

    ``k1_milli``/``b_milli``: the k1/b parameters in thousandths
    (1200/750 = the standard 1.2/0.75) — integer knobs keep the
    configuration itself exactly reproducible.

    Columns: ``query_id, rank (1-based), doc_id, score_micro``
    (BM25 × 10^6, integer).
    """
    k1 = k1_milli / 1000.0
    b = b_milli / 1000.0
    tok = F.filter(F.split(F.col(text_col), r"\s+"), lambda t: t != "")
    base = docs.select(F.col(id_col).alias("doc"),
                       F.explode(tok).alias("t"))
    postings = base.groupBy("doc", "t").agg(F.count("*").alias("tf"))
    doclen = base.groupBy("doc").agg(F.count("*").alias("dl"))
    stats = doclen.agg(F.count("*").alias("n_docs"),
                       F.sum("dl").alias("sum_dl"))
    dfreq = postings.groupBy("t").agg(F.count("*").alias("df_"))

    qt = (queries.select(F.col(query_id_col).alias("qid"),
                         F.explode(F.array_distinct(
                             F.filter(F.split(F.col(query_col), r"\s+"),
                                      lambda t: t != ""))).alias("t")))

    # r07 join reorder (guide §3.3): the per-(term, doc) weight is a
    # pure function of (tf, df, dl, corpus stats) — no query in it —
    # so attach dfreq/doclen/stats to the POSTINGS table first (one
    # corpus-linear pass) and bring the queries in LAST. The old order
    # joined queries × postings first, so the quadratically expanded
    # (qid, doc, t) stream — ~43M rows at the sf1.0-scale corpus with
    # its small shared vocabulary — was dragged through three more
    # joins keyed on the ~31-value term column (≤31 populated shuffle
    # partitions: guide §2.5 skew). Contributions are rounded to
    # integer micro-units per (qid, doc, t) row from the same inputs,
    # so the reorder provably cannot change a single output value
    # (integer sums are order-free). Measured 42 s → 6 s.
    # The query-term table is broadcast: bounded by the query
    # workload, never corpus-sized (the documented broadcast
    # invariant, same as cosine_topk_multi) — this also removes the
    # hot-key exchange entirely: the big stream is born map-side.
    idf = F.log(
        F.lit(1.0) + (F.col("n_docs") - F.col("df_") + 0.5)
        / (F.col("df_") + 0.5))
    avgdl = F.col("sum_dl") / F.col("n_docs")
    tf = F.col("tf").cast("double")
    contrib = idf * tf * (k1 + 1.0) / (
        tf + k1 * (1.0 - b + b * F.col("dl") / avgdl))
    # The repartition on `doc` is the exchange-elision move (guide
    # §2.4 "two operations keyed the same way can share one
    # exchange"): it moves only the corpus-linear weight table
    # (~1.2M narrow rows), and because hash-partitioning by `doc` is
    # a valid clustering for groupBy(qid, doc), the quadratically
    # expanded (qid, doc) contribution stream then aggregates IN
    # PLACE — the plan has no exchange between the query fan-out and
    # the score aggregation, where the previous shape shuffled the
    # ~25M partially-aggregated score rows.
    weights = (postings
               .join(dfreq, on="t")
               .join(doclen, on="doc")
               .crossJoin(F.broadcast(stats))
               .select("t", "doc",
                       F.round(contrib * 1_000_000).cast("long")
                        .alias("c"))
               .repartition(F.col("doc")))
    per_term = weights.join(F.broadcast(qt), on="t")
    scored = (per_term.groupBy("qid", "doc")
              .agg(F.sum("c").alias("score_micro")))
    w = Window.partitionBy("qid").orderBy(F.col("score_micro").desc(),
                                          F.col("doc"))
    return (scored.withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= k)
            .select(F.col("qid").alias(query_id_col),
                    F.col("rank"),
                    F.col("doc").alias(id_col),
                    "score_micro"))


def rrf_fuse(
    rankings: list[DataFrame],
    k: int = 10,
    rrf_k: int = 60,
    query_id_col: str = "query_id",
    id_col: str = "doc_id",
    rank_col: str = "rank",
) -> DataFrame:
    """Reciprocal-rank fusion (Cormack/Clarke/Büttcher, SIGIR'09) of
    N ranked lists — the standard hybrid-retrieval combiner (lexical
    BM25 leg + embedding-cosine leg, no score calibration needed:
    only RANKS enter the fusion).

    Per appearance the contribution is ``round(10^6 / (rrf_k + rank))``
    in integer micro-units, summed as BIGINT — parallel summation
    order cannot perturb fused scores, so a DuckDB oracle reproduces
    the fused ranking bit-for-bit (same determinism recipe as
    :func:`bm25_topk`). Ties break by doc id.

    Scale shape: each input list is already top-k-per-query (bounded:
    queries × k rows); the fusion is one union + one hash-agg + one
    per-query window on that bounded table — corpus size never enters.

    Columns: ``query_id, rank (1-based), doc_id, rrf_micro, n_lists``.
    """
    if not rankings:
        raise ValueError("rrf_fuse needs at least one ranking")
    if rrf_k < 0:
        raise ValueError("rrf_k must be >= 0")
    legs = [
        r.select(F.col(query_id_col).alias("qid"),
                 F.col(id_col).alias("doc"),
                 F.round(F.lit(1_000_000.0)
                         / (F.lit(rrf_k) + F.col(rank_col)))
                 .cast("long").alias("c"))
        for r in rankings
    ]
    u = legs[0]
    for leg in legs[1:]:
        u = u.unionByName(leg)
    scored = (u.groupBy("qid", "doc")
              .agg(F.sum("c").alias("rrf_micro"),
                   F.count("*").alias("n_lists")))
    w = Window.partitionBy("qid").orderBy(F.col("rrf_micro").desc(),
                                          F.col("doc"))
    return (scored.withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= k)
            .select(F.col("qid").alias(query_id_col), "rank",
                    F.col("doc").alias(id_col), "rrf_micro", "n_lists"))

"""Link-graph authority scoring over extracted web links.

Page-level link authority is a standard quality signal for training
corpora (a page many curated pages link to is likelier to be worth
keeping than an orphan) and the classic iterative-computation shape a
crawl pipeline needs beyond per-document ops.

:func:`pagerank_int` is PageRank (Brin & Page 1998, public) in
INTEGER micro-units: every rank is a long, per-edge contributions are
``floor(rank / out_degree)``, and the damping step is integer
arithmetic — so the per-node sums are order-free and the result is
bit-identical across engines/retries (float PageRank is not: float
addition ordering inside a groupBy is nondeterministic). The usual
convergence caveats apply to any fixed-point variant; a fixed
iteration count is the training-pipeline norm (signal, not eigenvalue
precision).

Scale shape: edges are (long, long) rows; each iteration is one join
(ranks onto edge sources) + one groupBy(dst) sum — narrow shuffles on
ids only, ``localCheckpoint`` per round to keep the plan flat (same
discipline as dedup.connected_components). Dangling nodes (no
outlinks) keep receiving the teleport term but redistribute nothing —
the simple variant; document-level signals don't need the
stochastic-matrix correction.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

SCALE = 1_000_000  # rank unit: 1.0 == 1e6 micro-units


def pagerank_int(
    ids: DataFrame,
    edges: DataFrame,
    iterations: int = 3,
    damping_permille: int = 850,
    id_col: str = "doc_id",
    src_col: str = "src",
    dst_col: str = "dst",
) -> DataFrame:
    """Integer-arithmetic PageRank over ``edges`` restricted to nodes
    in ``ids``. Returns ``(id_col, rank_micro)`` for EVERY id (nodes
    with no in-links settle at the teleport floor).

    Update rule (all integer, order-free):
        contrib(u→v) = floor(rank(u) / outdeg(u))
        rank'(v) = floor(SCALE * (1000 - d) / 1000)
                   + floor(d * sum_contribs(v) / 1000)
    with d = ``damping_permille``. Edges whose endpoints are not both
    in ``ids`` are dropped first (extraction yields links to pages
    outside the crawl; they are frontier work, not graph mass).
    """
    if not 0 <= damping_permille <= 1000:
        raise ValueError("damping_permille must be in [0, 1000]")
    nodes = ids.select(F.col(id_col).alias("node")).distinct()
    e = (edges.select(F.col(src_col).alias("src"),
                      F.col(dst_col).alias("dst"))
         .join(nodes.withColumnRenamed("node", "src"), on="src",
               how="left_semi")
         .join(nodes.withColumnRenamed("node", "dst"), on="dst",
               how="left_semi")
         .distinct()
         .localCheckpoint())
    deg = e.groupBy("src").agg(F.count("*").alias("outdeg"))
    # (src, outdeg) rides with the edges through every iteration
    ed = e.join(deg, on="src").localCheckpoint()

    teleport = SCALE * (1000 - damping_permille) // 1000
    ranks = nodes.withColumn("rank",
                             F.lit(SCALE).cast("long")).localCheckpoint()
    for _ in range(iterations):
        contribs = (ed.join(ranks.withColumnRenamed("node", "src"),
                            on="src")
                    .select(F.col("dst").alias("node"),
                            F.floor(F.col("rank") / F.col("outdeg"))
                             .cast("long").alias("c")))
        summed = contribs.groupBy("node").agg(F.sum("c").alias("s"))
        ranks = (nodes.join(summed, on="node", how="left")
                 .select(F.col("node"),
                         (F.lit(teleport).cast("long")
                          + F.floor(F.lit(damping_permille)
                                    * F.coalesce(F.col("s"), F.lit(0))
                                    / 1000).cast("long")).alias("rank"))
                 .localCheckpoint())
    return ranks.select(F.col("node").alias(id_col),
                        F.col("rank").alias("rank_micro"))


def anchor_text_stats(
    links: DataFrame,
    target_col: str = "target",
    src_col: str = "src",
    anchor_col: str = "anchor",
    top_k: int = 5,
) -> DataFrame:
    """Aggregate incoming anchor text per link target — the classic
    web-corpus relevance/quality signal (anchor text describes the
    TARGET page better than the target's own boilerplate; public
    knowledge from web-IR literature and the ClueWeb/MS MARCO anchor
    corpora).

    Input: one row per extracted link ``(src page, target url, anchor
    text)`` — the output shape of extraction link grids resolved via
    :func:`goose_parser_spark.ops.urls.resolve_href`.

    Output: ``target, n_links, n_src_pages, top_anchors`` where
    ``top_anchors`` is the first ``top_k`` DISTINCT non-empty anchor
    strings in lexicographic order joined with ``" | "`` —
    deterministic (no collect-order dependence) and bounded: a URL
    linked from millions of pages still carries at most ``top_k``
    strings out of the aggregate, so the row stays narrow no matter
    how popular the target is.

    One hash-aggregate by target; map-side partial aggregation folds
    per-partition duplicate anchors before the shuffle. No hints.
    """
    nonblank = F.when(F.trim(F.col(anchor_col)) != "", F.col(anchor_col))
    return (links.groupBy(F.col(target_col).alias("target"))
            .agg(F.count("*").alias("n_links"),
                 F.count_distinct(F.col(src_col)).alias("n_src_pages"),
                 F.array_join(
                     F.slice(F.sort_array(F.collect_set(nonblank)),
                             1, top_k),
                     " | ").alias("top_anchors")))

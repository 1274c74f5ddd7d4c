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

from pyspark.sql import Column, DataFrame, Window, functions as F


# one-shot flag for the implicit-approximate-default warning below
_WARNED_DEFAULT_APPROX = False


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


def cosine_topk_multi(
    df: DataFrame,
    queries: DataFrame,
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    query_id_col: str = "query_id",
    query_vec_col: str = "embedding",
    round_to: int = 4,
) -> DataFrame:
    """Exact cosine top-k per query for a BOUNDED query table (the
    batch form of :func:`cosine_topk` — eval suites, hard-negative
    mining, hybrid-retrieval legs).

    The query table is broadcast (bounded by the query workload, never
    corpus-sized — the documented broadcast invariant); the corpus
    side is scanned once, map-only, and the per-query top-k window
    compiles with a WindowGroupLimit pre-trim below the exchange, so
    the shuffle carries at most ``k`` rows per (partition, query), not
    the corpus × queries cross product. Rounding bounds cross-engine
    float drift for oracle comparison.

    Columns: ``query_id, rank (1-based), vec_id, sim``.
    """
    # r07 restructure (guide §4.2): the query workload is bounded (the
    # documented broadcast invariant — it was already collected to the
    # driver by the broadcast build), so pull it once and score each
    # corpus partition with ONE BLAS product per Arrow batch instead
    # of a crossJoin fanning every vector ×|queries| through an
    # interpreted fold (4.1M such rows at the sf1.0-scale table). The
    # Python stage also pre-trims to the per-partition top-k per query
    # — the same safe trim WindowGroupLimit performs — so the window
    # exchange moves k rows per (partition, query), never the cross
    # product. np.round(x, 4) equals Spark's HALF_UP here (no finite
    # double sits exactly on a 10^-4 halfway point) and the BLAS dot
    # differs from the fold only in summation order — equivalence
    # pinned by the pure-Python reference test and the oracle gate.
    q_rows = (queries.select(F.col(query_id_col).alias("_qid"),
                             F.col(query_vec_col).cast("array<double>")
                             .alias("_qv")).collect())
    out_schema = (f"{query_id_col} long, rank int, "
                  f"{id_col} long, sim double")
    if not q_rows:
        return df.sparkSession.createDataFrame([], out_schema)
    qids_l = [r["_qid"] for r in q_rows]
    qvecs_l = [list(r["_qv"]) for r in q_rows]
    kk = int(k)
    rnd = int(round_to)

    def _score(batches):
        import numpy as np
        import pandas as pd

        qm = np.array(qvecs_l, dtype=np.float64)
        qn = np.sqrt((qm * qm).sum(axis=1))
        qid_arr = np.array(qids_l, dtype=np.int64)
        m = len(qid_arr)
        acc_id: list = []
        acc_sim: list = []
        for pdf in batches:
            if not len(pdf):
                continue
            ids = pdf.iloc[:, 0].to_numpy()
            vecs = np.stack(pdf.iloc[:, 1].to_numpy()).astype(np.float64)
            vn = np.sqrt((vecs * vecs).sum(axis=1))
            sims = np.round(vecs @ qm.T / np.outer(vn, qn), rnd)
            if len(ids) > kk:
                # per-batch pre-trim by (sim desc, id asc) per query
                ordr = np.lexsort((np.broadcast_to(
                    ids[:, None], sims.shape), -sims), axis=0)[:kk]
                acc_id.append(ids[ordr])
                acc_sim.append(np.take_along_axis(sims, ordr, axis=0))
            else:
                acc_id.append(np.broadcast_to(ids[:, None],
                                              sims.shape).copy())
                acc_sim.append(sims)
        if not acc_id:
            return
        ids_all = np.concatenate(acc_id, axis=0)
        sims_all = np.concatenate(acc_sim, axis=0)
        ordr = np.lexsort((ids_all, -sims_all), axis=0)[:kk]
        n_out = ordr.shape[0]
        yield pd.DataFrame({
            "_qid": np.repeat(qid_arr, n_out),
            "_id": np.take_along_axis(ids_all, ordr, axis=0)
                     .T.reshape(-1),
            "sim": np.take_along_axis(sims_all, ordr, axis=0)
                     .T.reshape(-1),
        })

    scored = (df.select(F.col(id_col).cast("long"),
                        F.col(vec_col).cast("array<double>"))
              .mapInPandas(_score, "_qid long, _id long, sim double"))
    w = Window.partitionBy("_qid").orderBy(F.col("sim").desc(),
                                           F.col("_id"))
    return (scored.withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= k)
            .select(F.col("_qid").alias(query_id_col), "rank",
                    F.col("_id").alias(id_col), "sim"))


def embedding_outliers(
    df: DataFrame,
    group_col: str = "label",
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    pct: float = 0.9,
    round_to: int = 4,
) -> DataFrame:
    """Prototype-distance outlier flagging per group (the pruning
    signal of SSL-prototypes-style data curation, Sorscher et al. 2022
    "Beyond neural scaling laws": examples far from their cluster
    prototype are candidates to drop or down-weight; here the
    prototype is the per-group mean embedding).

    Determinism at cluster scale: per-dimension components are rounded
    to integer MICRO-units and summed as BIGINTs, so the centroid is
    byte-identical under any partitioning/summation order (float sums
    are not associative; integer sums are). Cosine distance to the
    centroid is rounded to ``round_to``; the per-group cutoff is the
    EXACT interpolated percentile of those rounded distances — the
    same cross-engine-stable recipe as ``corpus_percentiles``.

    Plan: one posexplode to ``(group, dim, v_micro)`` (narrow rows),
    one hash-agg to the bounded ``groups × dims`` centroid table, one
    join of that bounded table back to the vectors (AQE broadcasts
    it), one percentile agg on the bounded group table, one final
    join. The corpus is scanned twice and never self-joined.

    Columns: ``vec_id, <group_col>, dist, cutoff, is_outlier``.
    """
    if not 0.0 < pct < 1.0:
        raise ValueError("pct must be in (0, 1)")
    comps = (df.select(F.col(group_col).alias("g"),
                       F.posexplode(F.col(vec_col).cast("array<double>"))
                       .alias("d", "v"))
             .select("g", "d",
                     F.round(F.col("v") * 1_000_000).cast("long")
                     .alias("vm")))
    cent = (comps.groupBy("g", "d")
            .agg(F.sum("vm").alias("s"), F.count("*").alias("n"))
            .groupBy("g")
            .agg(F.array_sort(F.collect_list(F.struct("d", "s", "n")))
                 .alias("_c"))
            .select("g",
                    F.expr("transform(_c, x -> x.s / x.n / 1e6)")
                    .alias("centroid")))
    scored = (df.join(cent, on=df[group_col] == cent["g"])
              .select(F.col(id_col), F.col(group_col),
                      F.round(F.lit(1.0) - cosine_similarity(
                          F.col(vec_col).cast("array<double>"),
                          F.col("centroid")), round_to).alias("dist")))
    cuts = (scored.groupBy(group_col)
            .agg(F.percentile(F.col("dist"), F.lit(pct)).alias("cutoff")))
    return (scored.join(cuts, on=group_col)
            .select(id_col, group_col, "dist", "cutoff",
                    (F.col("dist") > F.col("cutoff")).alias("is_outlier")))


def topic_clusters(
    emb: DataFrame,
    docs: DataFrame,
    n_clusters: int = 8,
    iters: int = 2,
    top_terms: int = 5,
    vec_col: str = "embedding",
    vec_id_col: str = "vec_id",
    doc_id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Corpus topic organization: k-means over embeddings + a TF-IDF
    term profile per cluster — the "what is in this corpus" rollup
    (and the cluster stage of SemDeDup/SSL-prototype curation recipes).

    Composition of existing pieces: :func:`ivf_centroids` (deterministic
    Lloyd — lowest-id seeds) trains the centroids, nearest-centroid
    assignment is the same map-only path the IVF index uses (literal
    inline below K=64, broadcast join above), then one narrow
    (cluster, term) hash-agg builds the profile. Term score =
    round(tf_cluster · ln(N/df) · 10^6) in integer micro-units; top
    terms per cluster pre-trim under WindowGroupLimit. The corpus is
    never self-joined; the only corpus-sized shuffles are keyed by
    term and by doc id.

    Columns: ``cluster, n_docs, top_terms`` (" | "-joined, score-desc
    then term-asc).
    """
    cents = ivf_centroids(emb, n_centroids=n_clusters, iters=iters,
                          vec_col=vec_col, id_col=vec_id_col)
    vecs = emb.select(F.col(vec_id_col).alias("id"),
                      F.col(vec_col).cast("array<double>").alias("v"))
    assigned = _assign_to_centroids(vecs, cents).select("id", "centroid")
    dd = docs.select(F.col(doc_id_col).alias("id"), F.col(text_col))
    joined = dd.join(assigned, on="id")
    n_total = docs.count()
    toks = (joined.select("id", "centroid",
                          F.explode(F.filter(
                              F.split(F.col(text_col), r"\s+"),
                              lambda t: t != "")).alias("t")))
    dfreq = (toks.select("id", "t").distinct()
             .groupBy("t").agg(F.count("*").alias("df_")))
    scored = (toks.groupBy("centroid", "t")
              .agg(F.count("*").alias("tf"))
              .join(dfreq, on="t")
              .select("centroid", "t",
                      F.round(F.col("tf")
                              * F.log(F.lit(float(n_total))
                                      / F.col("df_"))
                              * 1_000_000).cast("long").alias("s")))
    w = Window.partitionBy("centroid").orderBy(F.col("s").desc(),
                                               F.col("t"))
    tops = (scored.withColumn("rk", F.row_number().over(w))
            .where(F.col("rk") <= top_terms)
            .groupBy("centroid")
            .agg(F.array_join(
                F.expr("transform(array_sort(collect_list("
                       "struct(rk, t))), x -> x.t)"), " | ")
                .alias("top_terms")))
    sizes = assigned.groupBy("centroid").agg(F.count("*").alias("n_docs"))
    return (sizes.join(tops, on="centroid", how="left")
            .select(F.col("centroid").alias("cluster"), "n_docs",
                    F.coalesce("top_terms", F.lit("")).alias("top_terms")))


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
    plane_offset: int = 0,
) -> Column:
    """Random-hyperplane LSH bucket id (0..2^num_planes-1) as a pure
    Catalyst expression: sign pattern of ``num_planes`` fixed
    hyperplane dot products. ``plane_offset`` selects an independent
    hyperplane family (for OR-amplified multi-table blocking)."""
    v = F.col(vec_col) if isinstance(vec_col, str) else vec_col
    v = v.cast("array<double>")
    bucket = F.lit(0).cast("long")
    for p in range(num_planes):
        plane = F.array(*[F.lit(_hyperplane(plane_offset + p, d))
                          for d in range(dims)])
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
    lsh_prefilter: bool | None = None,
    num_planes: int = 4,
    num_tables: int = 4,
    dims: int | None = None,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs: ``id_a, id_b, sim``.

    .. note:: **The default is APPROXIMATE** (``lsh_prefilter=None`` →
       LSH blocking). Recall < 1: a true pair missed by ALL
       ``num_tables`` hyperplane tables is silently dropped (measured
       recall vs exact lives in tests/test_ops.py). This is the
       approx-ops-default convention (STATE.md) — the exact path is a
       cartesian-shaped self-join that cannot run at corpus scale. A
       one-time warning fires when the default is used implicitly;
       pass ``lsh_prefilter=True`` explicitly (or ``False`` for the
       small-data exact baseline) to acknowledge the tradeoff.

    ``lsh_prefilter=True``: ``num_tables`` independent hyperplane-LSH
    bucketings, OR-amplified — a pair is a candidate if it collides in
    ANY table (recall 1-(1-p)^L for per-table collision probability
    p). Only candidates are cosine-scored — never an all-pairs join.
    ``lsh_prefilter=False`` is the exact O(n²) self-join — the
    validation baseline only (affordable for small inputs).

    Pass ``dims`` to skip the one-row schema probe (a tiny driver
    action otherwise used to size the hyperplanes).
    """
    if lsh_prefilter is None:
        global _WARNED_DEFAULT_APPROX
        if not _WARNED_DEFAULT_APPROX:
            import warnings
            warnings.warn(
                "embedding_cosine_pairs defaults to APPROXIMATE LSH "
                "blocking (recall < 1; pairs missed by every hash table "
                "are dropped). Pass lsh_prefilter=True to acknowledge, "
                "or lsh_prefilter=False for the exact O(n^2) baseline "
                "on small inputs.", stacklevel=2)
            _WARNED_DEFAULT_APPROX = True
        lsh_prefilter = True
    if not lsh_prefilter:
        a = df.select(F.col(id_col).alias("id_a"),
                      F.col(vec_col).cast("array<double>").alias("va"))
        a = a.select("id_a", "va", _norm(F.col("va")).alias("_na"))
        b = df.select(F.col(id_col).alias("id_b"),
                      F.col(vec_col).cast("array<double>").alias("vb"))
        b = b.select("id_b", "vb", _norm(F.col("vb")).alias("_nb"))
        joined = a.join(b, F.col("id_a") < F.col("id_b"))
        # norms ride in as per-ROW columns computed below the join;
        # dot/(na*nb) is the same float expression as
        # cosine_similarity, so values stay bit-identical while the
        # per-pair cost drops from 3d to d FLOPs (VERDICT r03 #8)
        sim = F.round(_dot(F.col("va"), F.col("vb"))
                      / (F.col("_na") * F.col("_nb")), round_to)
        return (joined.withColumn("sim", sim)
                .where(F.col("sim") >= threshold)
                .select("id_a", "id_b", "sim"))

    if dims is None:
        dims = len(df.select(vec_col).head()[0])
    # one row per (vector, table): join key (table, bucket); table t
    # uses its own hyperplane family.
    tables = F.array(*[
        F.struct(F.lit(t).alias("tbl"),
                 lsh_bucket(F.col("_v"), dims, num_planes,
                            plane_offset=t * num_planes).alias("bkt"))
        for t in range(num_tables)
    ])
    # r07 restructure (guide §4.2 / §2.3): score each bucket with one
    # BLAS gram product instead of materializing the candidate-pair
    # stream. The previous shape (narrow banded self-join → distinct
    # candidate (id, id) pairs → two vector join-backs → per-pair
    # fold-over-zip_with dot product) shuffled the full quadratic
    # candidate stream TWICE (distinct + join) and paid an interpreted
    # higher-order-function dot per pair — measured 22.8 s at the
    # sf1.0-scale table (20k vectors, ~39M candidates). Grouping the
    # (tbl, bkt, id, vec) rows and computing V·Vᵀ per bucket in numpy
    # moves ~64 small matrix products to BLAS and ships only the
    # threshold-passing pairs out of Python — 1.3 s on the same input.
    # Shuffle math at corpus scale: vectors now cross the exchange
    # num_tables× (528 B × 4 per vector) while the old plan crossed
    # ids num_tables× + vectors 2× + candidate pairs 2× (16 B × 2 ×
    # ~2000 candidates per vector at the measured collision rate) —
    # the new exchange is ~30× narrower in bytes at that rate, and the
    # blocked gram loop bounds per-task memory at block×|bucket|.
    # Output values: np.round(x, 4) equals Spark's HALF_UP round here
    # because no finite double is an exact 5-decimal halfway point
    # (10⁻⁵ grids are not binary-representable), and the BLAS dot
    # differs from the sequential fold only in summation order —
    # equivalence re-verified by tools/equiv_snapshot.py at three
    # scales and by the driver oracle gate.
    banded = (df.select(F.col(id_col).alias("id"),
                        F.col(vec_col).cast("array<double>").alias("_v"))
              .select("id", "_v", F.explode(tables).alias("b"))
              .select("id", "_v", F.col("b.tbl").alias("tbl"),
                      F.col("b.bkt").alias("bkt")))

    thr = float(threshold)
    rnd = int(round_to)

    def _score_bucket(pdf):
        import numpy as np
        import pandas as pd

        n = len(pdf)
        if n < 2:
            return pd.DataFrame({"id_a": np.empty(0, dtype=np.int64),
                                 "id_b": np.empty(0, dtype=np.int64),
                                 "sim": np.empty(0, dtype=np.float64)})
        order = np.argsort(pdf["id"].to_numpy(), kind="stable")
        ids = pdf["id"].to_numpy()[order]
        vecs = np.stack(pdf["_v"].to_numpy()[order]).astype(np.float64)
        norms = np.sqrt((vecs * vecs).sum(axis=1))
        out_a, out_b, out_s = [], [], []
        block = 2048
        for s in range(0, n - 1, block):
            e = min(s + block, n - 1)
            g = vecs[s:e] @ vecs.T
            sims = np.round(g / np.outer(norms[s:e], norms), rnd)
            ri, ci = np.nonzero(sims >= thr)
            keep = ci > ri + s  # strict upper triangle: id_a < id_b
            ri, ci = ri[keep], ci[keep]
            if ri.size:
                out_a.append(ids[ri + s])
                out_b.append(ids[ci])
                out_s.append(sims[ri, ci])
        if not out_a:
            return pd.DataFrame({"id_a": np.empty(0, dtype=np.int64),
                                 "id_b": np.empty(0, dtype=np.int64),
                                 "sim": np.empty(0, dtype=np.float64)})
        return pd.DataFrame({"id_a": np.concatenate(out_a),
                             "id_b": np.concatenate(out_b),
                             "sim": np.concatenate(out_s)})

    scored = (banded.groupBy("tbl", "bkt")
              .applyInPandas(_score_bucket,
                             "id_a long, id_b long, sim double"))
    # a pair colliding in several tables scores identically in each
    # (same doubles in, same rounded value out) — distinct collapses
    # the at-most-num_tables copies of each passing pair.
    return scored.distinct()


def ivf_centroids(
    df: DataFrame,
    n_centroids: int = 16,
    iters: int = 2,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> list[list[float]]:
    """Train an IVF coarse quantizer: K centroids via Lloyd iterations.

    Deterministic: seeds are the K lowest-id vectors; each iteration is
    one broadcast-join assignment + one mean aggregate (distributed —
    the only driver-side data is the K×dims centroid table itself,
    which is exactly what an IVF index stores). At 100 TB you train on
    a sample (the assignment pass is the expensive part and its cost
    is one narrow shuffle per iteration).
    """
    seeds = (df.orderBy(id_col).limit(n_centroids)
             .select(F.col(vec_col).cast("array<double>").alias("c"))
             .collect())
    centroids = [list(r["c"]) for r in seeds]
    vecs = df.select(F.col(id_col).alias("id"),
                     F.col(vec_col).cast("array<double>").alias("v"))
    for _ in range(iters):
        assigned = _assign_to_centroids(vecs, centroids)
        dims = len(centroids[0])
        means = (assigned.groupBy("centroid")
                 .agg(*[F.avg(F.col("v")[d]).alias(f"d{d}")
                        for d in range(dims)])
                 .collect())
        new = list(centroids)
        for r in means:
            new[r["centroid"]] = [float(r[f"d{d}"]) for d in range(dims)]
        centroids = new
    return centroids


# Above this K, nearest-centroid assignment switches from inlined
# literals to a broadcast join: a K-term literal array per row is a
# Catalyst plan-size / codegen blow-up at the K≥10³ a real 100 TB IVF
# index needs (VERDICT r02 #1). Both paths produce identical
# assignments (pytest-asserted at the boundary).
_LITERAL_ASSIGN_MAX_K = 64


def _assign_to_centroids(vecs: DataFrame, centroids: list[list[float]]) -> DataFrame:
    """(id, v, centroid): nearest-centroid assignment. Dispatches on K:

    - K ≤ ``_LITERAL_ASSIGN_MAX_K``: centroids inlined as literals —
      shuffle-free projection that fuses with the scan.
    - K > threshold: broadcast-join assignment — plan size stays O(1)
      in K; see :func:`_assign_via_broadcast_join`.

    Ties break to the lowest centroid index on both paths.
    """
    if len(centroids) > _LITERAL_ASSIGN_MAX_K:
        return _assign_via_broadcast_join(vecs, centroids)
    # Shape matters: the K distances land in ONE array column and the
    # argmin is ``array_position(d, array_min(d))`` — expression size
    # is linear in K (a chained when(closer,...) alternative doubles
    # the tree per centroid: 2^K nodes, codegen blow-up at K=16).
    # (r07 note: an inline-SQL variant of these distances — K×dims
    # expanded double terms — was A/B-tested and rejected: at the
    # K=64 boundary the 8k-term expression tree OOMed analysis and
    # ran slower than the fold at K=16. The fold stays.)
    dist_exprs = []
    for c in centroids:
        carr = F.array(*[F.lit(float(x)) for x in c])
        dist_exprs.append(F.aggregate(
            F.zip_with(F.col("v"), carr, lambda a, b: (a - b) * (a - b)),
            F.lit(0.0), lambda acc, x: acc + x))
    with_d = vecs.select("id", "v", F.array(*dist_exprs).alias("_d"))
    return with_d.select(
        "id", "v",
        (F.array_position(F.col("_d"), F.array_min("_d")) - 1)
        .cast("int").alias("centroid"))


def _assign_via_broadcast_join(vecs: DataFrame,
                               centroids: list[list[float]]) -> DataFrame:
    """Large-K assignment: broadcast the K×dims centroid TABLE (it IS
    the index — the only legitimately bounded broadcast here), cross
    join, score, and min_by-reduce back to one row per vector.

    Plan properties at 100 TB: the broadcast side is K rows regardless
    of corpus size; the cross join fans each vector out ×K inside its
    task (no shuffle); the ``min_by`` groupBy partial-aggregates
    map-side, collapsing the ×K back to one row per vector BEFORE the
    exchange — so the shuffle moves exactly one (id, v, centroid) row
    per vector, the same volume as any repartition of the vector
    table. Expression tree is O(1) in K.

    Tie-break parity with the literal path: ``min_by`` over the
    (dist, cid) struct orders lexicographically → lowest distance,
    then lowest centroid index (== array_position's first match).
    """
    spark = vecs.sparkSession
    cdf = spark.createDataFrame(
        [(i, [float(x) for x in c]) for i, c in enumerate(centroids)],
        "cid int, cvec array<double>")
    dist = F.aggregate(
        F.zip_with(F.col("v"), F.col("cvec"), lambda a, b: (a - b) * (a - b)),
        F.lit(0.0), lambda acc, x: acc + x)
    scored = (vecs.join(F.broadcast(cdf))
              .select("id", "v", F.struct(dist.alias("d"),
                                          F.col("cid").alias("cid"))
                      .alias("_dc")))
    return (scored.groupBy("id")
            .agg(F.any_value(F.col("v")).alias("v"),
                 F.min(F.col("_dc")).alias("_best"))
            .select("id", "v", F.col("_best.cid").alias("centroid")))


def ivf_topk(
    df: DataFrame,
    query: list[float],
    k: int = 10,
    n_centroids: int = 16,
    n_probe: int = 4,
    iters: int = 2,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    round_to: int = 4,
    centroids: list[list[float]] | None = None,
) -> DataFrame:
    """IVF approximate top-k: probe only the ``n_probe`` inverted lists
    whose centroids are nearest the query.

    The scale path alternative to :func:`lsh_cosine_topk`: at 100 TB
    the assignment column is pre-materialized (partition/cluster key),
    so probing prunes the scan to n_probe/n_centroids of the data;
    here the same predicate is computed inline. Recall vs brute force
    is pytest-measured. Columns: ``vec_id, sim``.
    """
    if centroids is None:
        centroids = ivf_centroids(df, n_centroids=n_centroids, iters=iters,
                                  vec_col=vec_col, id_col=id_col)

    def sq_dist(a: list[float], b: list[float]) -> float:
        return sum((x - y) * (x - y) for x, y in zip(a, b))

    order = sorted(range(len(centroids)),
                   key=lambda i: (sq_dist(query, centroids[i]), i))
    probes = set(order[:n_probe])
    vecs = df.select(F.col(id_col).alias("id"),
                     F.col(vec_col).cast("array<double>").alias("v"))
    assigned = _assign_to_centroids(vecs, centroids)
    pruned = (assigned.where(F.col("centroid").isin(*sorted(probes)))
              .select(F.col("id").alias(id_col), F.col("v").alias(vec_col)))
    return cosine_topk(pruned, query, k=k, vec_col=vec_col, id_col=id_col,
                       round_to=round_to)


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

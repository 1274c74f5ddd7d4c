"""Training-data ops: dedup / similarity / textstats / multimodal
(validated against exact baselines; plan-shape assertions for scale)."""

import pytest
from pyspark.sql import functions as F

from goose_parser_spark.ops.dedup import (
    exact_dedup,
    minhash_lsh_dedup,
    ngram_jaccard_pairs,
    simhash,
)
from goose_parser_spark.ops.multimodal import attach_payload, decode_stub, extract_features
from goose_parser_spark.ops.similarity import cosine_topk, lsh_cosine_topk
from goose_parser_spark.ops.textstats import text_stats

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet").cache()


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF}/embeddings.parquet").cache()


def test_exact_dedup_collapses_planted_dups(spark):
    rows = [(1, "a b c"), (2, "a b c"), (3, "x y z")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = exact_dedup(df).collect()
    assert sorted((r["doc_id"], r["text"]) for r in out) == \
        [(1, "a b c"), (3, "x y z")]


def test_ngram_jaccard_identical_docs_is_one(spark):
    rows = [(1, "a b c d e"), (2, "a b c d e"), (3, "p q r s t")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = ngram_jaccard_pairs(df, n=3, threshold=0.9).collect()
    assert len(out) == 1
    assert (out[0]["doc_a"], out[0]["doc_b"], out[0]["jaccard"]) == (1, 2, 1.0)


def test_minhash_lsh_matches_exact_on_testdata(spark, docs):
    """On the planted near-dups (J≥0.5), banded MinHash must reach
    full recall vs the exact-Jaccard baseline, and can never produce a
    pair the exact filter rejects (by construction)."""
    exact = {(r["doc_a"], r["doc_b"])
             for r in ngram_jaccard_pairs(docs, n=3, threshold=0.5).collect()}
    approx = {(r["doc_a"], r["doc_b"])
              for r in minhash_lsh_dedup(docs, n=3, num_hashes=32, bands=8,
                                         threshold=0.5).collect()}
    assert exact, "testdata should contain planted near-dups"
    assert approx <= exact
    recall = len(approx) / len(exact)
    assert recall >= 0.9, f"recall {recall}"


def test_minhash_md5_mode_matches_exact_and_verifies(spark, docs):
    """hash_mode='md5' (the oracle-reproducible variant) runs the SAME
    algorithm: verified pairs are a subset of exact Jaccard with high
    recall, and jaccard VALUES agree exactly with the exact baseline
    (verification hashes collide-free at this scale in both modes)."""
    exact = {(r["doc_a"], r["doc_b"]): r["jaccard"]
             for r in ngram_jaccard_pairs(docs, n=3, threshold=0.5).collect()}
    md5_pairs = {(r["doc_a"], r["doc_b"]): r["jaccard"]
                 for r in minhash_lsh_dedup(
                     docs, n=3, num_hashes=32, bands=8, threshold=0.5,
                     hash_mode="md5").collect()}
    assert exact
    assert set(md5_pairs) <= set(exact)
    assert len(md5_pairs) / len(exact) >= 0.9
    for k, j in md5_pairs.items():
        assert j == exact[k], (k, j, exact[k])


def test_minhash_is_deterministic(spark, docs):
    a = sorted(map(tuple, minhash_lsh_dedup(docs, threshold=0.5).collect()))
    b = sorted(map(tuple, minhash_lsh_dedup(docs, threshold=0.5).collect()))
    assert a == b


def test_simhash_near_dups_have_small_hamming(spark, docs):
    pairs = ngram_jaccard_pairs(docs, n=3, threshold=0.8).collect()
    sh = {r["doc_id"]: r["simhash"] for r in simhash(docs).collect()}
    assert pairs
    import random
    rng = random.Random(7)
    ids = sorted(sh)
    m = (1 << 64) - 1  # fingerprints are signed 64-bit longs
    rand_h = [bin((sh[rng.choice(ids)] ^ sh[rng.choice(ids)]) & m).count("1")
              for _ in range(200)]
    near_h = [bin((sh[r["doc_a"]] ^ sh[r["doc_b"]]) & m).count("1")
              for r in pairs]
    assert max(near_h) < sum(rand_h) / len(rand_h), (max(near_h), sum(rand_h) / len(rand_h))


def test_cosine_topk_self_similarity(spark, emb):
    row = emb.where(F.col("vec_id") == 3).select("embedding").head()
    q = [float(x) for x in row["embedding"]]
    out = cosine_topk(emb, q, k=3).collect()
    assert out[0]["vec_id"] == 3
    assert out[0]["sim"] == 1.0


def test_lsh_topk_recall_vs_brute_force(spark, emb):
    row = emb.where(F.col("vec_id") == 0).select("embedding").head()
    q = [float(x) for x in row["embedding"]]
    exact = [r["vec_id"] for r in
             cosine_topk(emb.where("vec_id != 0"), q, k=10).collect()]
    # 4 planes = 16 buckets over 500 near-random vectors; hamming≤2
    # probing scans ~11/16 buckets → recall must clear 0.5 even on
    # this unclustered corpus (real embeddings cluster ⇒ higher).
    approx = [r["vec_id"] for r in
              lsh_cosine_topk(emb.where("vec_id != 0"), q, k=10,
                              num_planes=4, probe_hamming=2).collect()]
    overlap = len(set(exact) & set(approx)) / 10
    assert overlap >= 0.5, (exact, approx)


def test_dedup_ops_are_jvm_only(spark, docs):
    """No Python UDF may appear in the dedup plans (scale requirement:
    whole-stage codegen end to end)."""
    for df in (exact_dedup(docs), ngram_jaccard_pairs(docs, threshold=0.5),
               simhash(docs)):
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "BatchEvalPython" not in plan
        assert "ArrowEvalPython" not in plan


def test_textstats_single_projection(spark, docs):
    out = text_stats(docs)
    rows = out.collect()
    assert len(rows) == docs.count()
    r = rows[0]
    assert r["n_tokens"] > 0 and len(r["fingerprint"]) == 32
    assert r["lang_pred"] in ("en", "es", "de", "fr", "und")
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "Exchange" not in plan  # stats are shuffle-free


def test_multimodal_plumbing(spark, docs):
    wp = attach_payload(docs)
    feats = extract_features(wp).collect()
    assert len(feats) == docs.count()
    by_id = {r["doc_id"]: r for r in feats}
    sample = docs.select("doc_id", "text").head(3)
    for row in sample:
        want = decode_stub(row["text"].encode("utf-8"))
        got = by_id[row["doc_id"]]
        assert got["n_bytes"] == len(row["text"].encode("utf-8"))
        assert [round(float(x), 5) for x in got["features"]] == \
            [round(x, 5) for x in want]


def test_decode_stub_contract():
    with pytest.raises(NotImplementedError):
        decode_stub(b"img", fake=False)
    assert decode_stub(b"img") == decode_stub(b"img")
    assert len(decode_stub(b"img")) == 8


def test_entry_contract(spark):
    import __spark_entry__ as e
    df = e.entry(spark)
    # flagship runs over the ×23-amplified corpus (VERDICT r02 #4)
    assert df.count() == 500 * 23
    assert set(df.columns) == {"url", "title", "body", "doclang"}
    qs = e.queries()
    oracles = e.oracle_sql()
    assert set(oracles) <= set(qs)
    assert len(qs) >= 25


def test_embedding_cosine_pairs_exact_vs_lsh(spark, emb):
    from goose_parser_spark.ops.similarity import embedding_cosine_pairs
    exact = {(r["id_a"], r["id_b"]) for r in
             embedding_cosine_pairs(emb, threshold=0.45,
                                    lsh_prefilter=False).collect()}
    # the shipped default: OR-amplified blocking (4 tables × 4 planes)
    # returns a subset (candidates collide in ≥1 table) at decent recall.
    # Leaving lsh_prefilter at its implicit default must warn ONCE
    # (ADVICE r02: the approx default is a silent recall<1 tradeoff).
    import warnings
    from goose_parser_spark.ops import similarity as _sim
    _sim._WARNED_DEFAULT_APPROX = False
    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        approx_df = embedding_cosine_pairs(emb, threshold=0.45)
        assert any("APPROXIMATE" in str(w.message) for w in caught)
    approx = {(r["id_a"], r["id_b"]) for r in approx_df.collect()}
    assert approx <= exact
    assert exact, "testdata should contain cosine near-dups at 0.45"
    recall = len(approx) / len(exact)
    assert recall >= 0.5, f"OR-amplified recall {recall}"


def test_simhash_is_full_64_bits(spark, docs):
    """bits=64 must emit 64 effective bits (ADVICE r01): over a corpus
    the top bit is set for ~half the docs → some fingerprints negative
    (two's complement), and bit 62 varies too."""
    vals = [r["simhash"] for r in simhash(docs).collect()]
    assert any(v < 0 for v in vals), "bit 63 never set — width regression"
    assert any(v >= 0 for v in vals)
    assert any((v >> 62) & 1 for v in vals)


def test_simhash_pairs_equal_brute_force(spark, docs):
    """Pigeonhole block join is EXACT for Hamming ≤ k: must equal the
    all-pairs brute force, pair for pair."""
    from goose_parser_spark.ops.dedup import simhash_pairs
    k = 3
    sh = {r["doc_id"]: r["simhash"] for r in simhash(docs).collect()}
    ids = sorted(sh)
    brute = set()
    for i, a in enumerate(ids):
        for b in ids[i + 1:]:
            h = bin((sh[a] ^ sh[b]) & ((1 << 64) - 1)).count("1")
            if h <= k:
                brute.add((a, b, h))
    got = {(r["doc_a"], r["doc_b"], r["hamming"])
           for r in simhash_pairs(docs, max_hamming=k).collect()}
    assert got == brute
    assert brute, "testdata should contain Hamming≤3 simhash pairs"


def test_simhash_md5_mode_matches_python_reference(spark, docs):
    """hash_mode='md5' (the oracle-reproducible 60-bit variant) must
    equal a pure-Python recomputation of the same algorithm, doc for
    doc — the local twin of the DuckDB oracle."""
    import hashlib
    got = {r["doc_id"]: r["simhash"]
           for r in simhash(docs, bits=60, hash_mode="md5").collect()}
    for r in docs.collect():
        toks = r["text"].split(" ")
        votes = [0] * 60
        for t in toks:
            h = int(hashlib.md5(t.encode()).hexdigest()[:15], 16)
            for i in range(60):
                votes[i] += (h >> i) & 1
        n = len(toks)
        want = sum((1 << i) for i in range(60) if 2 * votes[i] > n)
        assert got[r["doc_id"]] == want, r["doc_id"]


def test_quality_score_defined_on_empty_text(spark):
    from goose_parser_spark.ops.textstats import quality_score
    df = spark.createDataFrame([(1, ""), (2, "the cat sat")],
                               "doc_id long, text string")
    out = {r["doc_id"]: r["q"]
           for r in df.select("doc_id",
                              quality_score("text").alias("q")).collect()}
    assert out[1] is not None and 0.0 <= out[1] <= 1.0
    assert out[2] is not None and 0.0 <= out[2] <= 1.0


def test_connected_components_chains_and_singletons(spark):
    from goose_parser_spark.ops.dedup import connected_components
    ids = spark.createDataFrame([(i,) for i in range(1, 9)], "doc_id long")
    # components: {1,2,3} chain, {4,5} pair, {6,7} via cycle, {8} singleton
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (4, 5), (6, 7), (7, 6)],
        "doc_a long, doc_b long")
    out = {r["doc_id"]: r["canonical_id"]
           for r in connected_components(ids, pairs).collect()}
    assert out == {1: 1, 2: 1, 3: 1, 4: 4, 5: 4, 6: 6, 7: 6, 8: 8}


def test_connected_components_long_chain_converges(spark):
    from goose_parser_spark.ops.dedup import connected_components
    n = 12
    ids = spark.createDataFrame([(i,) for i in range(n)], "doc_id long")
    pairs = spark.createDataFrame([(i, i + 1) for i in range(n - 1)],
                                  "doc_a long, doc_b long")
    out = {r["doc_id"]: r["canonical_id"]
           for r in connected_components(ids, pairs).collect()}
    assert all(v == 0 for v in out.values())


def test_gopher_quality_line_signals(spark):
    from goose_parser_spark.ops.textstats import gopher_quality
    good = ("the quick brown fox jumped over the lazy dog and it was "
            "good for all of them today ") * 5
    bullets = "- item one\n- item two\n- item three\nplain line"
    ellipses = "first line...\nsecond…\nthird line"
    symbols = "@@@ ### $$$ %%% ^^^ &&&"
    df = spark.createDataFrame(
        [(1, good), (2, bullets), (3, ellipses), (4, symbols), (5, "")],
        "doc_id long, text string")
    out = {r["doc_id"]: r for r in gopher_quality(df, min_words=10).collect()}
    assert out[1]["keep"] is True
    assert out[2]["bullet_ratio"] == 0.75
    assert out[3]["ellipsis_ratio"] == 0.6667
    assert out[4]["symbol_ratio"] > 0.1 and out[4]["keep"] is False
    assert out[5]["n_words"] == 0 and out[5]["keep"] is False


def test_gopher_quality_is_shuffle_free(spark, docs):
    from goose_parser_spark.ops.textstats import gopher_quality
    out = gopher_quality(docs)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "Python" not in plan


def test_tfidf_rare_terms_outrank_common(spark):
    from goose_parser_spark.ops.textstats import tfidf_top_terms
    rows = [(1, "common common rare1"), (2, "common common rare2"),
            (3, "common common rare3"), (4, "common unique4 unique4")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = tfidf_top_terms(df, k=1).collect()
    top = {r["doc_id"]: r["term"] for r in out}
    # 'common' appears in every doc -> idf = ln(1) = 0; rare terms win
    assert top == {1: "rare1", 2: "rare2", 3: "rare3", 4: "unique4"}


def test_ivf_topk_recall_vs_brute_force(spark, emb):
    from goose_parser_spark.ops.similarity import ivf_topk
    row = emb.where(F.col("vec_id") == 0).select("embedding").head()
    q = [float(x) for x in row["embedding"]]
    exact = [r["vec_id"] for r in
             cosine_topk(emb.where("vec_id != 0"), q, k=10).collect()]
    approx = [r["vec_id"] for r in
              ivf_topk(emb.where("vec_id != 0"), q, k=10,
                       n_centroids=16, n_probe=6, iters=2).collect()]
    overlap = len(set(exact) & set(approx)) / 10
    # probing 6/16 inverted lists of a near-random corpus: recall must
    # clear the scanned fraction by a wide margin (real corpora cluster)
    assert overlap >= 0.5, (exact, approx)


def test_ivf_centroids_deterministic_and_partition_the_corpus(spark, emb):
    from goose_parser_spark.ops.similarity import (
        _assign_to_centroids, ivf_centroids)
    c1 = ivf_centroids(emb, n_centroids=8, iters=2)
    c2 = ivf_centroids(emb, n_centroids=8, iters=2)
    assert len(c1) == 8 and len(c1[0]) == 64
    assert c1 == c2  # deterministic seeds + deterministic plan
    vecs = emb.selectExpr("vec_id as id",
                          "cast(embedding as array<double>) as v")
    counts = (_assign_to_centroids(vecs, c1)
              .groupBy("centroid").count().collect())
    assert sum(r["count"] for r in counts) == emb.count()
    assert len(counts) >= 4  # no centroid collapse


def test_paragraph_dup_stats_separator_mode(spark):
    from goose_parser_spark.ops.dedup import paragraph_dup_stats
    rows = [
        (1, "unique para one\nshared boilerplate\nanother unique"),
        (2, "shared boilerplate\ntotally different text"),
        (3, "self repeated\nself repeated\nfresh"),
        (4, ""),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r
           for r in paragraph_dup_stats(df, sep="\n").collect()}
    assert out[1]["n_units"] == 3 and out[1]["n_dup_units"] == 1
    assert out[2]["n_dup_units"] == 1 and out[2]["dup_ratio"] == 0.5
    # self-repetition counts as duplication
    assert out[3]["n_dup_units"] == 2 and out[3]["dup_ratio"] == 0.6667
    assert 4 not in out  # empty doc has no units


def test_paragraph_dup_stats_chunk_mode(spark):
    from goose_parser_spark.ops.dedup import paragraph_dup_stats
    ten = "a b c d e f g h i j"
    rows = [(1, ten + " k l m"), (2, ten + " x y z")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r
           for r in paragraph_dup_stats(df, chunk_words=10).collect()}
    # both docs share the identical first 10-word chunk; tails differ
    assert out[1]["n_units"] == 2 and out[1]["n_dup_units"] == 1
    assert out[2]["n_dup_units"] == 1


def test_ivf_assignment_join_path_equals_literal_path(spark, emb):
    """VERDICT r02 #1: the broadcast-join assignment (large K) must
    produce exactly the literal-projection assignment, including
    lowest-index tie-breaks on duplicated centroids."""
    from goose_parser_spark.ops.similarity import (
        _assign_to_centroids, _assign_via_broadcast_join, ivf_centroids)
    cents = ivf_centroids(emb, n_centroids=8, iters=1)
    # duplicate centroid 0 so ties exist: both paths must break to the
    # LOWEST centroid index
    cents_with_dup = cents + [list(cents[0])]
    vecs = emb.selectExpr("vec_id as id",
                          "cast(embedding as array<double>) as v")
    lit_path = {(r["id"], r["centroid"]) for r in
                _assign_to_centroids(vecs, cents_with_dup).collect()}
    join_path = {(r["id"], r["centroid"]) for r in
                 _assign_via_broadcast_join(vecs, cents_with_dup).collect()}
    assert lit_path == join_path
    assert not any(c == len(cents_with_dup) - 1 for _, c in join_path)


def test_ivf_large_k_uses_broadcast_join_and_plan_stays_small(spark, emb):
    """At K=256 the assignment must be the broadcast-join path: plan
    size O(1) in K (no K×dims literal array per row), the broadcast
    side is the bounded K-row centroid table, and min_by partial-
    aggregates map-side so the shuffle moves one row per vector."""
    from goose_parser_spark.ops.similarity import (
        _LITERAL_ASSIGN_MAX_K, _assign_to_centroids, _hyperplane)
    K = 256
    assert K > _LITERAL_ASSIGN_MAX_K
    cents = [[_hyperplane(k, d) for d in range(64)] for k in range(K)]
    vecs = emb.selectExpr("vec_id as id",
                          "cast(embedding as array<double>) as v")
    assigned = _assign_to_centroids(vecs, cents)
    plan = assigned._jdf.queryExecution().executedPlan().toString()
    assert ("BroadcastNestedLoopJoin" in plan
            or "BroadcastHashJoin" in plan), plan[:500]
    # literal inlining at K=256 × 64 dims would put ~16k float literals
    # in the plan string; the join plan must stay compact
    assert len(plan) < 20_000, f"plan blew up: {len(plan)} chars"
    assert "partial_min" in plan  # map-side collapse before the exchange
    counts = assigned.groupBy("centroid").count().collect()
    assert sum(r["count"] for r in counts) == emb.count()
    # synthetic sin-hash centroids aren't uniform in embedding space;
    # just require a real spread (assignment isn't degenerate)
    assert len(counts) >= 10


def test_ivf_topk_end_to_end_on_large_k(spark, emb):
    """ivf_topk through the broadcast-join assignment (K>threshold):
    still returns k rows with sane recall vs brute force."""
    from goose_parser_spark.ops.similarity import cosine_topk, ivf_topk
    row = emb.where(F.col("vec_id") == 1).select("embedding").head()
    q = [float(x) for x in row["embedding"]]
    base = emb.where("vec_id != 1")
    exact = [r["vec_id"] for r in cosine_topk(base, q, k=10).collect()]
    approx = [r["vec_id"] for r in
              ivf_topk(base, q, k=10, n_centroids=80, n_probe=40,
                       iters=1).collect()]
    assert len(approx) == 10
    overlap = len(set(exact) & set(approx)) / 10
    assert overlap >= 0.4, (exact, approx)


def test_sample_by_hash_deterministic_and_rate(spark, docs):
    from goose_parser_spark.ops.sampling import sample_by_hash
    a = {r["doc_id"] for r in
         sample_by_hash(docs, "doc_id", 0.2, salt="x").collect()}
    b = {r["doc_id"] for r in
         sample_by_hash(docs, "doc_id", 0.2, salt="x").collect()}
    assert a == b                       # reproducible
    n = docs.count()
    assert 0.1 * n < len(a) < 0.3 * n   # md5 uniformity at n=500
    other = {r["doc_id"] for r in
             sample_by_hash(docs, "doc_id", 0.2, salt="y").collect()}
    assert other != a                   # independent per salt
    # nested rates: a 10% sample is a subset of the 20% sample (same
    # salt) — threshold bands nest by construction
    small = {r["doc_id"] for r in
             sample_by_hash(docs, "doc_id", 0.1, salt="x").collect()}
    assert small <= a


def test_per_domain_quota_caps_groups(spark, docs):
    from goose_parser_spark.ops.sampling import per_domain_quota
    out = per_domain_quota(docs, "source", "doc_id", quota=5)
    counts = out.groupBy("source").count().collect()
    assert counts and all(r["count"] <= 5 for r in counts)
    # keeps the FIRST five per group in doc_id order
    src = counts[0]["source"]
    kept = sorted(r["doc_id"] for r in
                  out.where(F.col("source") == src).collect())
    all_ids = sorted(r["doc_id"] for r in
                     docs.where(F.col("source") == src).collect())
    assert kept == all_ids[:5]
    # scale property: the per-group top-k is pre-trimmed BELOW the
    # exchange (WindowGroupLimit before Exchange in the plan)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "WindowGroupLimit" in plan.split("Exchange", 1)[1]


def test_winnow_shared_passage_guarantee(spark):
    """Winnowing's contract: documents sharing a run of >= window+k-1
    words share at least one fingerprint; disjoint documents share
    none."""
    from goose_parser_spark.ops.dedup import winnow_fingerprints
    passage = "the quick brown fox jumps over the lazy dog tonight"
    rows = [
        (1, "intro words here " + passage + " trailing bits"),
        (2, passage + " completely different ending text follows"),
        (3, "nothing in common with either of those documents at all"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    fps = winnow_fingerprints(df, k=3, window=4)
    by_doc = {}
    for r in fps.collect():
        by_doc.setdefault(r["doc_id"], set()).add(r["fp"])
    assert by_doc[1] & by_doc[2], "shared passage must share a fingerprint"
    assert not (by_doc[1] & by_doc[3])
    assert not (by_doc[2] & by_doc[3])


def test_repetition_stats_flags_looping_text(spark):
    from goose_parser_spark.ops.textstats import repetition_stats
    rows = [
        (1, "buy now " * 20),            # one bigram dominating
        (2, "a genuinely varied sentence with distinct words only"),
    ]
    df = spark.createDataFrame([(i, t.strip()) for i, t in rows],
                               "doc_id long, text string")
    out = {r["doc_id"]: r for r in repetition_stats(df).collect()}
    assert out[1]["top_bigram_frac"] > 0.4
    assert out[1]["dup_bigram_frac"] > 0.8
    assert out[2]["dup_bigram_frac"] == 0.0
    assert out[2]["top_bigram_frac"] < 0.2


def test_hash_split_disjoint_stable_and_covering(spark, docs):
    from goose_parser_spark.ops.sampling import hash_split
    w = {"val": 0.1, "test": 0.1, "train": 0.8}
    out = hash_split(docs.select("doc_id"), "doc_id", w, salt="z")
    rows = out.collect()
    assert len(rows) == docs.count()          # weights sum to 1: all kept
    by = {}
    for r in rows:
        by.setdefault(r["split"], set()).add(r["doc_id"])
    assert set(by) == {"val", "test", "train"}
    assert not (by["val"] & by["test"]) and not (by["val"] & by["train"])
    # growth-stability: the split of a doc does not depend on the corpus
    half = hash_split(docs.where("doc_id < 250").select("doc_id"),
                      "doc_id", w, salt="z").collect()
    for r in half:
        assert r["doc_id"] in by[r["split"]]


def test_pack_sequences_budget_discipline(spark, docs):
    from goose_parser_spark.ops.sampling import pack_sequences
    from goose_parser_spark.ops.textstats import token_count
    with_tok = docs.select("doc_id", token_count("text").alias("t"))
    out = pack_sequences(with_tok, "t", "doc_id",
                         tokens_per_seq=500, buckets=4)
    rows = sorted(out.collect(), key=lambda r: (r["bucket"], r["doc_id"]))
    assert len(rows) == docs.count()
    # per bucket: offsets are the running token sum in doc_id order and
    # seq_id is the 500-token bin of the starting offset
    from collections import defaultdict
    run = defaultdict(int)
    for r in rows:
        assert r["seq_offset"] == run[r["bucket"]]
        assert r["seq_id"] == r["seq_offset"] // 500
        run[r["bucket"]] += r["t"]
    # deterministic
    again = sorted(pack_sequences(with_tok, "t", "doc_id", 500, 4).collect(),
                   key=lambda r: (r["bucket"], r["doc_id"]))
    assert [tuple(r) for r in rows] == [tuple(r) for r in again]


def test_materialize_sequences_custom_columns(spark):
    """materialize_sequences accepts the same non-default column names
    pack_sequences does (ADVICE r03: the two stages must compose)."""
    from goose_parser_spark.ops.sampling import (
        materialize_sequences, pack_sequences)
    rows = [(i, f"body {i}", 100 + i) for i in range(20)]
    df = spark.createDataFrame(rows, "page_id long, body string, ntok int")
    packed = pack_sequences(df, "ntok", "page_id", tokens_per_seq=300,
                            buckets=2, id_col="page_id")
    out = materialize_sequences(packed, text_col="body", sep="|",
                                tokens_col="ntok", id_col="page_id")
    got = out.collect()
    assert sum(r["n_docs"] for r in got) == 20
    assert all(r["seq_tokens"] == sum(
        100 + i for i in range(20)
        if any(p["page_id"] == i and p["bucket"] == r["bucket"]
               and p["seq_id"] == r["seq_id"] for p in packed.collect()))
        for r in got)
    # member order inside seq_text follows seq_offset
    for r in got:
        members = [p for p in packed.collect()
                   if p["bucket"] == r["bucket"]
                   and p["seq_id"] == r["seq_id"]]
        members.sort(key=lambda p: (p["seq_offset"], p["page_id"]))
        assert r["seq_text"] == "|".join(f"body {p['page_id']}"
                                         for p in members)


def test_asof_join_semantics(spark):
    from goose_parser_spark.ops.asof import asof_join
    views = spark.createDataFrame(
        [(1, 10, 100), (1, 10, 101), (1, 20, 102), (2, 5, 200)],
        "u long, ts long, vid long")
    clicks = spark.createDataFrame(
        [(1, 10, "a"), (1, 15, "b"), (1, 25, "c"), (2, 1, "d")],
        "u long, ts long, cid string")
    out = asof_join(clicks, views, "u", "ts", value_cols=["vid"])
    got = {(r["u"], r["ts"]): r["vid_asof"] for r in out.collect()}
    # equal-ts right row matches (<=); max-order wins the tie; no
    # prior right row → NULL
    assert got == {(1, 10): 101, (1, 15): 101, (1, 25): 102, (2, 1): None}
    # NULL fields come from the MATCHED row, not forward-filled from an
    # older right row — and all value columns come from the same row
    # (ADVICE r03 medium)
    snaps = spark.createDataFrame(
        [(1, 10, "p10", 7), (1, 20, None, None), (2, 5, "q5", 1)],
        "u long, ts long, label string, w long")
    probes = spark.createDataFrame([(1, 25), (1, 12), (2, 6)],
                                   "u long, ts long")
    out2 = asof_join(probes, snaps, "u", "ts",
                     value_cols=["label", "w"], order_col="w")
    got2 = {(r["u"], r["ts"]): (r["label_asof"], r["w_asof"])
            for r in out2.collect()}
    assert got2 == {(1, 25): (None, None),    # matched row ts=20 is NULL
                    (1, 12): ("p10", 7),
                    (2, 6): ("q5", 1)}
    # scale shape: ONE hash exchange on the key (the union sides read
    # through it), no range/cartesian join
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Cartesian" not in plan and "NestedLoop" not in plan
    assert plan.count("Exchange hashpartitioning") <= 2  # one per union leg


def test_range_join_bucketized_equi(spark):
    """range_join finds interval containment across bucket boundaries
    with an EQUI join (no cartesian/nested-loop in the plan)."""
    from goose_parser_spark.ops.asof import range_join
    import datetime as dt
    t = lambda m, s=0: (dt.datetime(2025, 1, 1)
                        + dt.timedelta(minutes=m, seconds=s))
    ivals = spark.createDataFrame(
        [(1, t(0), t(90)),            # spans two hour buckets
         (1, t(30), t(40)),           # nested interval: multi-match
         (2, t(10), t(20))],
        "k long, s timestamp, e timestamp")
    pts = spark.createDataFrame(
        [(1, t(35), "a"),             # inside both intervals of k=1
         (1, t(80), "b"),             # second hour bucket of ival 1
         (1, t(95), "c"),             # outside all
         (2, t(15), "d"), (3, t(15), "e")],
        "k long, ts timestamp, tag string")
    out = range_join(pts, ivals, "k", "ts", "s", "e",
                     bucket_seconds=3600)
    got = sorted((r["tag"], (r["s"].hour * 60 + r["s"].minute))
                 for r in out.collect())
    assert got == [("a", 0), ("a", 30), ("b", 0), ("d", 10)]
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Cartesian" not in plan and "NestedLoop" not in plan


def test_time_rollups_cascade_consistency(spark):
    """Coarser levels re-aggregate the finest: totals agree at every
    granularity and with the raw table."""
    from goose_parser_spark.ops.asof import time_rollups
    events = spark.read.parquet(f"{SF}/events.parquet")
    out = time_rollups(events, "ts", ["event_type"],
                       granularities_seconds=(60, 3600, 86400))
    n = events.count()
    sums = {r["granularity_seconds"]: r["total"] for r in
            out.groupBy("granularity_seconds")
               .agg(F.sum("n").alias("total")).collect()}
    assert sums == {60: n, 3600: n, 86400: n}
    # the cascade reuses the finest level's shuffle: after execution
    # the adaptive plan shows BOTH coarser branches as ReusedExchange
    # (the raw scan physically runs once)
    out.collect()
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("ReusedExchange") == 2, plan[:500]


def test_redact_pii_patterns(spark):
    from goose_parser_spark.ops.textstats import redact_pii
    rows = [(1, "mail a.b+c@ex-am.ple.org here"),
            (2, "server at 192.168.0.1 port"),
            (3, "call +1-555-123-4567 now"),
            (4, "clean text with nothing 12 34"),
            # phone contract pins (ADVICE r03): non-PII digit runs with
            # dashes must SURVIVE — year ranges, ISBNs, IDs …
            (5, "seasons 2020-2021 and 2021-2022 were dry"),
            (6, "ISBN 978-3-16-148410-0 in print"),
            (7, "order id 123456789 shipped"),
            # … while separator-structured domestic numbers are caught
            (8, "fax 415-555-0134 or 415.555.0199")]
    df = spark.createDataFrame(rows, "i long, t string")
    out = {r["i"]: r["c"] for r in
           df.select("i", redact_pii("t").alias("c")).collect()}
    assert out[1] == "mail <EMAIL> here"
    assert out[2] == "server at <IP> port"
    assert out[3] == "call <PHONE> now"
    assert out[4] == "clean text with nothing 12 34"
    assert out[5] == "seasons 2020-2021 and 2021-2022 were dry"
    assert out[6] == "ISBN 978-3-16-148410-0 in print"
    assert out[7] == "order id 123456789 shipped"
    assert out[8] == "fax <PHONE> or <PHONE>"


def test_incremental_dedup_against_index(spark, docs):
    """dedup_against_index must find exactly the cross (increment ×
    corpus) near-dup pairs that full minhash over the union finds —
    without ever pairing the corpus with itself."""
    from goose_parser_spark.ops.dedup import (
        build_minhash_index, dedup_against_index, minhash_lsh_dedup)
    corpus = docs.where("doc_id % 2 = 0")
    # increment: near-dup copies of some corpus docs (prepend 2 tokens)
    # + genuinely new docs (reversed token order kills shingle overlap)
    inc_dup = (corpus.where("doc_id < 100")
               .selectExpr("doc_id + 100000 as doc_id",
                           "concat('xq zq ', text) as text"))
    inc_new = (corpus.where("doc_id >= 100 and doc_id < 140")
               .selectExpr("doc_id + 200000 as doc_id",
                           "array_join(reverse(split(text, ' ')), ' ') as text"))
    increment = inc_dup.unionByName(inc_new)

    index = build_minhash_index(corpus)
    got = {(r["new_id"], r["corpus_id"]) for r in
           dedup_against_index(increment, index, corpus,
                               threshold=0.5).collect()}

    union = corpus.select("doc_id", "text").unionByName(
        increment.select("doc_id", "text"))
    full = minhash_lsh_dedup(union, n=3, num_hashes=32, bands=8,
                             threshold=0.5).collect()
    want = {(r["doc_b"], r["doc_a"]) for r in full
            if r["doc_b"] >= 100000 and r["doc_a"] < 100000}
    assert got == want
    assert got, "planted increment near-dups must be found"
    assert not any(n >= 200000 for n, _ in got)   # fresh docs not flagged


def test_url_canonicalize_cases(spark):
    from goose_parser_spark.ops.urls import (
        strip_tracking_params, url_canonicalize)
    df = spark.createDataFrame(
        [("https://Ex.COM:443/a/?b=2&utm_source=x&a=1#frag",),
         ("http://s.net/p?gclid=1",),
         ("https://s.net/p",),
         ("https://s.net/p?ref=tw&fbclid=z&utm_campaign=c",),
         ("https://s.net/p?&&a=1",),          # empty segments dropped
         ("https://s.net/p?refresh=1",)],     # 'refresh' is NOT 'ref'
        "url string")
    out = [r[0] for r in
           df.select(url_canonicalize("url")).collect()]
    assert out == [
        "https://ex.com/a?a=1&b=2",
        "http://s.net/p",
        "https://s.net/p",
        "https://s.net/p",
        "https://s.net/p?a=1",
        "https://s.net/p?refresh=1",
    ]
    # strip alone keeps the pre-? part byte-identical (no normalize)
    raw = spark.createDataFrame([("https://A.COM/X?b=1&utm_x=2",)],
                                "url string")
    assert raw.select(strip_tracking_params("url")).first()[0] == \
        "https://A.COM/X?b=1"


def test_chunk_documents_windows(spark):
    from goose_parser_spark.ops.textstats import chunk_documents
    df = spark.createDataFrame(
        [(1, "t0 t1 t2 t3 t4 t5 t6 t7 t8 t9"), (2, "a"), (3, "")],
        "doc_id long, text string")
    rows = sorted(
        (r["doc_id"], r["chunk_id"], r["chunk_start"], r["n_tokens"],
         r["chunk_text"])
        for r in chunk_documents(df, size=4, stride=3).collect())
    assert rows == [
        (1, 0, 0, 4, "t0 t1 t2 t3"),
        (1, 1, 3, 4, "t3 t4 t5 t6"),
        (1, 2, 6, 4, "t6 t7 t8 t9"),
        (1, 3, 9, 1, "t9"),
        (2, 0, 0, 1, "a"),
    ]  # doc 3 (empty) emits nothing; final short chunk kept


def test_stratified_sample_rates_and_nesting(spark):
    from goose_parser_spark.ops.sampling import (
        sample_by_hash, stratified_sample_by_hash)
    df = spark.range(2000).selectExpr(
        "id as doc_id", "concat('g', id % 2) as grp")
    out = stratified_sample_by_hash(df, "doc_id", "grp",
                                    {"g0": 1.0, "g1": 0.0}, salt="t")
    got = out.groupBy("grp").count().collect()
    assert {(r["grp"], r["count"]) for r in got} == {("g0", 1000)}
    # same salt => lower-rate stratum is a SUBSET of the higher rate
    lo = {r["doc_id"] for r in stratified_sample_by_hash(
        df, "doc_id", "grp", {"g0": 0.2, "g1": 0.2}, salt="u").collect()}
    hi = {r["doc_id"] for r in stratified_sample_by_hash(
        df, "doc_id", "grp", {"g0": 0.6, "g1": 0.6}, salt="u").collect()}
    assert lo <= hi
    # and equals the unstratified sample at the same rate/salt
    flat = {r["doc_id"] for r in
            sample_by_hash(df, "doc_id", 0.2, salt="u").collect()}
    assert lo == flat


def test_assign_shards_permutation(spark):
    from goose_parser_spark.ops.sampling import assign_shards
    df = spark.range(500).selectExpr("id as doc_id")
    out = assign_shards(df, "doc_id", n_shards=4, salt="z").collect()
    assert len(out) == 500
    assert {r["shard"] for r in out} == {0, 1, 2, 3}
    by_shard = {}
    for r in out:
        by_shard.setdefault(r["shard"], []).append(r["pos"])
    for shard, poss in by_shard.items():
        assert sorted(poss) == list(range(1, len(poss) + 1))  # dense 1..n
    again = assign_shards(df, "doc_id", n_shards=4, salt="z").collect()
    assert {(r["doc_id"], r["shard"], r["pos"]) for r in out} == \
        {(r["doc_id"], r["shard"], r["pos"]) for r in again}


def test_classifier_score_exact_and_bounds(spark):
    import hashlib
    from goose_parser_spark.ops.textstats import classifier_score
    df = spark.createDataFrame(
        [(1, "hello world"), (2, ""), (3, "   ")],
        "doc_id long, text string")
    got = {r["doc_id"]: r["s"] for r in
           df.select("doc_id", classifier_score("text").alias("s"))
           .collect()}
    half = 16 ** 8 // 2
    want = sum(int(hashlib.md5((t + "clf").encode()).hexdigest()[:8], 16)
               - half for t in ("hello", "world"))
    assert got[1] == round(want / (2 * half), 6)
    assert got[2] == 0.0 and got[3] == 0.0
    assert all(-1.0 <= v <= 1.0 for v in got.values())


def test_clean_text_cases(spark):
    from goose_parser_spark.ops.textstats import clean_text
    df = spark.createDataFrame(
        [("\t a  b \n",), ("a\tb\x7fc",), ("clean",), ("",)],
        "t string")
    out = [r[0] for r in df.select(clean_text("t")).collect()]
    assert out == ["a b", "a b c", "clean", ""]


def test_rate_threshold_hex_bounds():
    from goose_parser_spark.ops.sampling import rate_threshold_hex
    assert rate_threshold_hex(0.0) == "00000000"   # keeps nothing
    assert rate_threshold_hex(0.1) == "19999999"
    assert rate_threshold_hex(1.0) == "g"          # sorts after all hex
    assert all(c <= rate_threshold_hex(1.0) for c in "0123456789abcdef")


def test_url_canonicalize_idempotent(spark):
    from goose_parser_spark.ops.urls import url_canonicalize
    urls = [
        "https://Ex.COM:443/a/?b=2&utm_source=x&a=1#frag",
        "http://s.net:80/p?gclid=1&z=3&y=2",
        "https://host.org/deep/path/?utm_medium=m",
        "https://h.io/x?a=1&a=0",        # duplicate keys sort stably
    ]
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    once = [r[0] for r in df.select(url_canonicalize("url")).collect()]
    df2 = spark.createDataFrame([(u,) for u in once], "url string")
    twice = [r[0] for r in df2.select(url_canonicalize("url")).collect()]
    assert once == twice


def test_chunk_documents_coverage_and_partition(spark):
    """stride == size partitions the token stream exactly (concat of
    chunks round-trips the text); stride < size covers every token."""
    from goose_parser_spark.ops.textstats import chunk_documents
    text = " ".join(f"w{i}" for i in range(23))
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    parts = [r["chunk_text"] for r in
             chunk_documents(df, size=5, stride=5)
             .orderBy("chunk_id").collect()]
    assert " ".join(parts) == text
    rows = chunk_documents(df, size=7, stride=4).collect()
    covered = set()
    for r in rows:
        covered.update(range(r["chunk_start"],
                             r["chunk_start"] + r["n_tokens"]))
    assert covered == set(range(23))


def test_train_shards_stable_under_growth(spark):
    """A doc's shard never changes as the corpus grows (pos may —
    it is the rank within the shard)."""
    from goose_parser_spark.ops.sampling import assign_shards
    small = spark.range(300).selectExpr("id as doc_id")
    big = spark.range(900).selectExpr("id as doc_id")
    s1 = {r["doc_id"]: r["shard"] for r in
          assign_shards(small, "doc_id", 8, salt="g").collect()}
    s2 = {r["doc_id"]: r["shard"] for r in
          assign_shards(big, "doc_id", 8, salt="g").collect()}
    assert all(s2[k] == v for k, v in s1.items())


def test_unigram_logprob_hand_computed(spark):
    import math
    from goose_parser_spark.ops.textstats import unigram_logprob
    df = spark.createDataFrame(
        [(1, "a a b"), (2, "b c"), (3, "")],
        "doc_id long, text string")
    got = {r["doc_id"]: (r["n_tokens"], r["logprob_micro"]) for r in
           unigram_logprob(df).collect()}
    # corpus: N=5 tokens, V=3 vocab; counts a=2 b=2 c=1; add-one over N+V=8
    lp = {t: round(math.log((c + 1.0) / 8.0) * 1_000_000)
          for t, c in {"a": 2, "b": 2, "c": 1}.items()}
    assert got[1] == (3, lp["a"] * 2 + lp["b"])
    assert got[2] == (2, lp["b"] + lp["c"])
    assert 3 not in got                  # empty doc absent
    # rarer tokens score lower
    assert lp["c"] < lp["a"]


def test_new_op_argument_validation(spark):
    import pytest as _pytest
    from goose_parser_spark.ops.dedup import build_minhash_index
    from goose_parser_spark.ops.sampling import (
        assign_shards, stratified_sample_by_hash)
    from goose_parser_spark.ops.textstats import chunk_documents
    df = spark.range(3).selectExpr("id as doc_id", "'x y z' as text",
                                   "'g' as grp")
    with _pytest.raises(ValueError):
        stratified_sample_by_hash(df, "doc_id", "grp", {"g": 1.5})
    with _pytest.raises(ValueError):
        stratified_sample_by_hash(df, "doc_id", "grp", {}, default_rate=-0.1)
    with _pytest.raises(ValueError):
        assign_shards(df, "doc_id", 0)
    with _pytest.raises(ValueError):
        chunk_documents(df, size=0)
    with _pytest.raises(ValueError):
        chunk_documents(df, size=4, stride=0)
    with _pytest.raises(ValueError):
        build_minhash_index(df, num_hashes=32, bands=7)  # not divisible


def test_embedding_cosine_pairs_lsh_matches_python_reference(spark, emb):
    """r07: the per-bucket BLAS scorer must reproduce the banded-LSH
    candidate semantics and per-pair cosine EXACTLY (same buckets, same
    threshold, 4-dp rounding) against an independent pure-Python
    recomputation over the test embeddings."""
    import math

    from goose_parser_spark.ops.similarity import (
        _hyperplane, embedding_cosine_pairs)

    vecs = {r["vec_id"]: [float(x) for x in r["embedding"]]
            for r in emb.collect()}
    dims, planes, tables = 64, 4, 4
    hp = {(t, p): [_hyperplane(t * planes + p, d) for d in range(dims)]
          for t in range(tables) for p in range(planes)}

    def bucket(v, t):
        b = 0
        for p in range(planes):
            dot = 0.0
            for x, h in zip(v, hp[(t, p)]):
                dot += x * h
            if dot >= 0:
                b += 1 << p
        return b

    buckets = {t: {} for t in range(tables)}
    for vid, v in vecs.items():
        for t in range(tables):
            buckets[t].setdefault(bucket(v, t), []).append(vid)
    cands = set()
    for t in range(tables):
        for members in buckets[t].values():
            ms = sorted(members)
            for i, a in enumerate(ms):
                for b in ms[i + 1:]:
                    cands.add((a, b))
    want = set()
    for a, b in cands:
        va, vb = vecs[a], vecs[b]
        dot = sum(x * y for x, y in zip(va, vb))
        na = math.sqrt(sum(x * x for x in va))
        nb = math.sqrt(sum(x * x for x in vb))
        sim = round(dot / (na * nb), 4)
        if sim >= 0.45:
            want.add((a, b, sim))
    got = {(r["id_a"], r["id_b"], r["sim"]) for r in
           embedding_cosine_pairs(emb, threshold=0.45, lsh_prefilter=True,
                                  num_planes=planes, num_tables=tables,
                                  dims=dims).collect()}
    assert got == want
    assert want, "testdata should contain LSH-candidate near-dups"


def test_connected_components_random_graph_matches_union_find(spark):
    """r07: the contraction CC (parent forest → pointer doubling →
    contract) must match a Python union-find on a seeded random graph
    with long chains, cliques and singletons."""
    import random

    from goose_parser_spark.ops.dedup import connected_components

    rng = random.Random(20260822)
    n = 400
    edges = [(i, i + 1) for i in range(0, 60)]            # long chain
    edges += [(100 + a, 100 + b)                          # clique
              for a in range(8) for b in range(a + 1, 8)]
    edges += [(rng.randrange(n), rng.randrange(n)) for _ in range(150)]
    edges = [(a, b) for a, b in edges if a != b]
    parent = list(range(n))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # canonical = min id of component: after union-by-min the root IS
    # the minimum (we always hang the larger root under the smaller)
    want = {i: find(i) for i in range(n)}
    ids = spark.createDataFrame([(i,) for i in range(n)], "doc_id long")
    prs = spark.createDataFrame(edges, "doc_a long, doc_b long")
    got = {r["doc_id"]: r["canonical_id"]
           for r in connected_components(ids, prs).collect()}
    assert got == want

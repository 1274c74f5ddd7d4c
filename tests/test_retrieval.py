"""BM25 lexical retrieval."""

import math


def test_bm25_ranking_and_scores_match_reference(spark):
    """Spark BM25 equals a hand-computed reference (Lucene idf, k1=1.2
    b=0.75, integer micro-rounding per (doc, term))."""
    from goose_parser_spark.ops.retrieval import bm25_topk
    corpus = {
        1: "the quick brown fox jumps over the lazy dog",
        2: "a quick brown cat sleeps",
        3: "dogs and cats living together",
        4: "completely unrelated text about spark plans",
    }
    docs = spark.createDataFrame(list(corpus.items()), ["doc_id", "text"])
    qs = spark.createDataFrame([(1, "quick brown fox")],
                               ["query_id", "query"])
    got = [(r["rank"], r["doc_id"], r["score_micro"])
           for r in bm25_topk(docs, qs, k=4).collect()]

    # reference
    toks = {d: t.split() for d, t in corpus.items()}
    n = len(corpus)
    avgdl = sum(len(t) for t in toks.values()) / n
    k1, b = 1.2, 0.75
    def df(term): return sum(term in t for t in toks.values())
    def score(d, terms):
        s = 0
        for term in terms:
            tf = toks[d].count(term)
            if tf == 0:
                continue
            idf = math.log(1 + (n - df(term) + 0.5) / (df(term) + 0.5))
            dl = len(toks[d])
            c = idf * tf * (k1 + 1) / (tf + k1 * (1 - b + b * dl / avgdl))
            s += int(round(c * 1_000_000))
        return s
    want = sorted(((score(d, ["quick", "brown", "fox"]), d)
                   for d in corpus), key=lambda x: (-x[0], x[1]))
    want = [(i + 1, d, s) for i, (s, d) in enumerate(want) if s > 0]
    assert got == want, (got, want)


def test_bm25_query_term_dedup_and_k_cap(spark):
    from goose_parser_spark.ops.retrieval import bm25_topk
    docs = spark.createDataFrame(
        [(i, f"term{i % 3} filler words here") for i in range(9)],
        ["doc_id", "text"])
    # duplicated query term must count once
    qs = spark.createDataFrame([(1, "term0 term0")], ["query_id", "query"])
    one = bm25_topk(docs, qs, k=2).collect()
    assert len(one) == 2 and all(r["rank"] <= 2 for r in one)
    single = bm25_topk(docs,
                       spark.createDataFrame([(1, "term0")],
                                             ["query_id", "query"]),
                       k=2).collect()
    assert [(r["doc_id"], r["score_micro"]) for r in one] == \
        [(r["doc_id"], r["score_micro"]) for r in single]

"""Hashed-linear classifier training: DataFrame GD vs NumPy reference
on the same feature matrix, plus end-to-end separation."""

import numpy as np
import pytest
from pyspark.sql import functions as F


def _labeled_corpus(spark, n=60):
    good_words = ["science", "theory", "method", "result", "analysis"]
    bad_words = ["click", "winner", "free", "casino", "deal"]
    rows = []
    for i in range(n):
        if i % 2 == 0:
            ws = [good_words[(i + j) % 5] for j in range(8)] + ["the", "of"]
            lab = 1
        else:
            ws = [bad_words[(i + j) % 5] for j in range(8)] + ["the", "of"]
            lab = 0
        rows.append((i, " ".join(ws), lab))
    return spark.createDataFrame(rows, ["doc_id", "text", "label"])


def test_train_matches_numpy_reference(spark):
    """Run the SAME full-batch GD in NumPy on the feature matrix the
    Spark trainer built (collected at test scale): weights and bias
    must agree to float tolerance after the same iteration count."""
    from goose_parser_spark.ops.classifier import (
        _features, train_logreg_hashed)
    df = _labeled_corpus(spark)
    n_buckets = 1 << 12
    iters, lr = 6, 2.0

    model = train_logreg_hashed(df, n_buckets=n_buckets,
                                iterations=iters, lr=lr)

    # NumPy reference on the identical (doc, bucket, x) matrix
    feats = _features(df, "text", "doc_id", n_buckets).collect()
    labels = {r["doc_id"]: r["label"] for r in df.collect()}
    docs = sorted(labels)
    didx = {d: i for i, d in enumerate(docs)}
    buckets = sorted({r["bucket"] for r in feats})
    bidx = {b: i for i, b in enumerate(buckets)}
    X = np.zeros((len(docs), len(buckets)))
    for r in feats:
        X[didx[r["doc"]], bidx[r["bucket"]]] = r["x"]
    y = np.array([labels[d] for d in docs], dtype=float)
    w = np.zeros(len(buckets))
    b = 0.0
    for _ in range(iters):
        p = 1.0 / (1.0 + np.exp(-(X @ w + b)))
        e = p - y
        w -= lr * (X.T @ e) / len(docs)
        b -= lr * e.mean()

    got_w = {r["bucket"]: r["w"] for r in model.weights.collect()}
    for bk, i in bidx.items():
        assert got_w.get(bk, 0.0) == pytest.approx(w[i], abs=1e-9)
    assert model.bias == pytest.approx(b, abs=1e-9)


def test_trained_model_separates_and_scores_new_docs(spark):
    from goose_parser_spark.ops.classifier import (
        score_logreg_hashed, train_logreg_hashed)
    df = _labeled_corpus(spark, n=80)
    model = train_logreg_hashed(df, n_buckets=1 << 12,
                                iterations=12, lr=4.0)
    # training accuracy
    scored = score_logreg_hashed(df, model)
    joined = df.join(scored, "doc_id").select("label", "score").collect()
    acc = sum((r["score"] > 0.5) == (r["label"] == 1)
              for r in joined) / len(joined)
    assert acc >= 0.95, acc
    # unseen docs built from the same vocab separate too
    new = spark.createDataFrame(
        [(100, "method analysis result science theory"),
         (101, "free casino winner click deal")],
        "doc_id long, text string")
    s = {r["doc_id"]: r["score"]
         for r in score_logreg_hashed(new, model).collect()}
    assert s[100] > 0.5 > s[101], s
    # empty text scores at the bias floor, never errors
    empty = spark.createDataFrame([(102, "")], "doc_id long, text string")
    assert 0.0 <= score_logreg_hashed(empty, model).collect()[0]["score"] <= 1.0


def test_train_early_stop_tol(spark):
    """VERDICT r04 #8: tol>0 halts training once the per-iteration
    mean-|error| improvement drops below tol; iterations stays the
    hard cap; tol=0 keeps fixed-iteration behavior."""
    import pytest
    from goose_parser_spark.ops.classifier import train_logreg_hashed
    rows = [(i, "good clean prose text", 1) for i in range(20)] + \
           [(i + 20, "spam spam buy now", 0) for i in range(20)]
    df = spark.createDataFrame(rows, ["doc_id", "text", "label"])
    # huge tol: first improvement check fires -> stops after 2 passes
    m = train_logreg_hashed(df, n_buckets=1 << 10, iterations=10,
                            tol=1e9)
    assert m.iterations_run == 2
    # tol=0 (default): runs the full cap
    m0 = train_logreg_hashed(df, n_buckets=1 << 10, iterations=3)
    assert m0.iterations_run == 3
    with pytest.raises(ValueError):
        train_logreg_hashed(df, iterations=0)
    with pytest.raises(ValueError):
        train_logreg_hashed(df, tol=-1.0)

"""BPE training/encoding vs an independent pure-Python reference
(the textbook Sennrich'16 algorithm), identical determinism rule:
pair-frequency ties break lexicographically on (left, right)."""

from collections import Counter

from pyspark.sql import functions as F

EOW = "</w>"


def _ref_word_counts(texts):
    wc = Counter()
    for t in texts:
        for w in t.split():
            wc[w] += 1
    return wc


def _ref_train(texts, n_merges, min_freq=1):
    wc = _ref_word_counts(texts)
    words = {w: list(w) + [EOW] for w, c in wc.items() if c >= min_freq}
    merges = []
    for rank in range(n_merges):
        pairs = Counter()
        for w, syms in words.items():
            f = wc[w]
            for a, b in zip(syms, syms[1:]):
                pairs[(a, b)] += f
        if not pairs:
            break
        # max by (freq, then lexicographically SMALLEST pair)
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        (l, r), n = best
        if n < 2:
            break
        merges.append((rank, l, r, n))
        for w, syms in words.items():
            words[w] = _ref_apply(syms, l, r)
    return merges


def _ref_apply(syms, l, r):
    out, i = [], 0
    while i < len(syms):
        if i + 1 < len(syms) and syms[i] == l and syms[i + 1] == r:
            out.append(l + r)
            i += 2
        else:
            out.append(syms[i])
            i += 1
    return out


def _ref_encode(text, merges):
    toks = []
    for w in text.split():
        syms = list(w) + [EOW]
        for _, l, r, _n in merges:
            syms = _ref_apply(syms, l, r)
        toks.extend(syms)
    return toks


TEXTS = [
    "low lower lowest low low newer newer wider new new new",
    "low slow slower newest widest wide wide wide new newer",
    "the lowest of the low the newest of the new",
]


def test_train_bpe_matches_reference(spark):
    from goose_parser_spark.ops.bpe import train_bpe
    df = spark.createDataFrame([(i, t) for i, t in enumerate(TEXTS)],
                               ["doc_id", "text"])
    got = [(r["rank"], r["left"], r["right"], r["pair_freq"])
           for r in train_bpe(df, n_merges=12, checkpoint_every=4)
           .orderBy("rank").collect()]
    want = _ref_train(TEXTS, 12)
    assert got == want
    assert len(got) >= 6                  # actually learned something


def test_train_bpe_early_stop_and_validation(spark):
    import pytest
    from goose_parser_spark.ops.bpe import train_bpe
    df = spark.createDataFrame([(1, "a b c")], ["doc_id", "text"])
    # every word is 1 char + EOW: single pair per word, each freq 1 ->
    # no pair reaches 2, training stops with zero merges
    assert train_bpe(df, n_merges=5).count() == 0
    with pytest.raises(ValueError):
        train_bpe(df, n_merges=0)


def test_encode_bpe_matches_reference_roundtrip(spark):
    """Encoding with the trained merges equals the reference encoder,
    and concatenating tokens (minus EOW) reconstructs the text."""
    from goose_parser_spark.ops.bpe import train_bpe, encode_bpe
    df = spark.createDataFrame([(i, t) for i, t in enumerate(TEXTS)],
                               ["doc_id", "text"])
    merges_df = train_bpe(df, n_merges=10)
    merges = _ref_train(TEXTS, 10)
    out = {r["doc_id"]: r for r in encode_bpe(df, merges_df).collect()}
    for i, t in enumerate(TEXTS):
        want = _ref_encode(t, merges)
        assert out[i]["tokens"] == want, f"doc {i}"
        assert out[i]["n_tokens"] == len(want)
        rebuilt = "".join(out[i]["tokens"]).replace(EOW, " ").strip()
        assert rebuilt == t


def test_encode_bpe_empty_and_unseen_words(spark):
    """Docs whose words never appeared still tokenize (chars + EOW);
    an empty doc yields an empty token array, not NULL."""
    from goose_parser_spark.ops.bpe import train_bpe, encode_bpe
    train = spark.createDataFrame([(1, "aa aa aa bb")], ["doc_id", "text"])
    merges = train_bpe(train, n_merges=2)
    apply_to = spark.createDataFrame([(1, "aa zz"), (2, "")],
                                     ["doc_id", "text"])
    out = {r["doc_id"]: r for r in encode_bpe(apply_to, merges).collect()}
    assert out[1]["tokens"][0] in ("aa", f"aa{EOW}")
    assert "z" in "".join(out[1]["tokens"])
    assert out[2]["tokens"] == [] and out[2]["n_tokens"] == 0

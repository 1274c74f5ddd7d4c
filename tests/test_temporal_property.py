"""Property tests: temporal ops vs brute-force Python references on
seeded random data (one Spark job per op — deterministic, broad)."""

import datetime as dt
import random

from goose_parser_spark.ops.asof import asof_join, range_join


def _ts(s):
    return dt.datetime(2025, 1, 1) + dt.timedelta(seconds=s)


def test_asof_join_matches_bruteforce_random(spark):
    rng = random.Random(42)
    rights = [(k, rng.randrange(0, 500), i)
              for i, k in enumerate(rng.choices(range(8), k=120))]
    # dedup right to max order per (k, ts) — the documented tie contract
    best = {}
    for k, ts, o in rights:
        best[(k, ts)] = max(best.get((k, ts), -1), o)
    rights_d = [(k, ts, o) for (k, ts), o in best.items()]
    lefts = [(k, rng.randrange(0, 520), f"L{i}")
             for i, k in enumerate(rng.choices(range(10), k=150))]

    rdf = spark.createDataFrame([(k, _ts(t), o) for k, t, o in rights_d],
                                "k long, ts timestamp, o long")
    ldf = spark.createDataFrame([(k, _ts(t), tag) for k, t, tag in lefts],
                                "k long, ts timestamp, tag string")
    got = {r["tag"]: r["o_asof"]
           for r in asof_join(ldf, rdf, "k", "ts", ["o"]).collect()}

    for k, lt, tag in lefts:
        cands = [(ts, o) for (kk, ts, o) in rights_d
                 if kk == k and ts <= lt]
        want = max(cands)[1] if cands else None
        assert got[tag] == want, (tag, k, lt, got[tag], want)
    assert len(got) == len(lefts)  # every left row survives exactly once


def test_range_join_matches_bruteforce_random(spark):
    rng = random.Random(7)
    ivals = []
    for i in range(60):
        k = rng.randrange(0, 6)
        s = rng.randrange(0, 5000)
        ivals.append((k, s, s + rng.randrange(0, 2500), i))
    pts = [(rng.randrange(0, 8), rng.randrange(0, 8000), f"P{i}")
           for i in range(120)]

    rdf = spark.createDataFrame(
        [(k, _ts(s), _ts(e), i) for k, s, e, i in ivals],
        "k long, s timestamp, e timestamp, ival long")
    ldf = spark.createDataFrame([(k, _ts(t), tag) for k, t, tag in pts],
                                "k long, ts timestamp, tag string")
    # bucket far smaller than interval length: exercises multi-bucket
    # explode and cross-bucket containment
    out = range_join(ldf, rdf, "k", "ts", "s", "e", bucket_seconds=300)
    got = sorted((r["tag"], r["ival"]) for r in out.collect())
    want = sorted((tag, i) for (k, t, tag) in pts
                  for (kk, s, e, i) in ivals if kk == k and s <= t <= e)
    assert got == want


def test_pack_sequences_matches_bruteforce_random(spark):
    from goose_parser_spark.ops.sampling import pack_sequences
    rng = random.Random(13)
    rows = [(i, rng.randrange(1, 900)) for i in range(300)]
    df = spark.createDataFrame(rows, "doc_id long, t long")
    out = pack_sequences(df, "t", "doc_id", tokens_per_seq=1000, buckets=8)
    got = {r["doc_id"]: (r["bucket"], r["seq_offset"], r["seq_id"])
           for r in out.collect()}
    # brute force: same md5 bucket, running offsets in doc_id order
    import hashlib
    by_bucket = {}
    for i, t in rows:
        b = int(hashlib.md5(str(i).encode()).hexdigest()[:4], 16) % 8
        by_bucket.setdefault(b, []).append((i, t))
    for b, docs in by_bucket.items():
        run = 0
        for i, t in sorted(docs):
            assert got[i] == (b, run, run // 1000), (i, got[i], (b, run))
            run += t

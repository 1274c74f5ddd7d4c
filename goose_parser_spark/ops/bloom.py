"""Distributed Bloom-filter membership for crawl frontiers.

A crawl at web scale cannot keep its seen-set as a joinable table in
every job: frontier admission wants an O(1)-probe structure whose SIZE
IS FIXED regardless of how many URLs were ever crawled. The classic
answer is a Bloom filter; Spark-first, the filter is just a tiny
DataFrame of bitmap words built with one aggregation:

- :func:`bloom_build` — explode ``k`` md5-derived bit positions per
  key, group by word index, ``bit_or`` the bit masks. Output is at
  most ``n_words`` rows no matter the corpus size — the map-side
  partial ``bit_or`` means each map task sends at most ``n_words``
  longs into the single narrow exchange.
- :func:`bloom_probe` — candidates re-derive their ``k`` positions
  and check them with ``k`` BROADCAST hash joins against the
  (fixed-size) word table: the candidate side never shuffles and
  never fans out — a pure map stage at any corpus size. A key is
  "maybe seen" iff ALL ``k`` bits are set. False positives at the
  standard Bloom rate (choose ``n_words`` ≈ 10 bits/key for ~1%);
  false negatives never.

Everything is md5-derived (not xxhash64), so the DuckDB oracle
reproduces the filter bit-for-bit — membership verdicts INCLUDING the
false positives are engine-exact.

Implementation note: bit positions use 60-bit words (bits 0..59), not
64 — ``1 << 63`` is negative in a signed long and some engines error
on the overflow; staying below bit 60 keeps every mask positive and
portable at a 6% space cost.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

WORD_BITS = 60


def _pos(key: Column, i: int, n_words: int) -> Column:
    """Bit position of probe ``i`` for a key: md5(key ':' i) prefix
    mod the filter's total bit count."""
    h = F.conv(F.substring(
        F.md5(F.concat(key.cast("string"), F.lit(f":{i}"))), 1, 15),
        16, 10).cast("long")
    return F.pmod(h, F.lit(n_words * WORD_BITS))


def _mask(bit_col: str) -> Column:
    # F.shiftleft only takes a literal shift; SQL shiftleft takes a
    # column — same codegen either way
    return F.expr(f"shiftleft(CAST(1 AS BIGINT), {bit_col})")


def bloom_build(
    df: DataFrame,
    key_col: str,
    n_words: int = 2048,
    k: int = 3,
) -> DataFrame:
    """Build the filter: ``(w, word)`` rows, one per bitmap word that
    has at least one bit set (≤ ``n_words`` rows total, independent of
    corpus size). Size guidance: ``n_words * 60 / n_keys`` ≈ 10 bits
    per key keeps the false-positive rate near 1% at k=3."""
    key = F.col(key_col)
    positions = F.array(*[_pos(key, i, n_words) for i in range(k)])
    return (df.select(F.explode(positions).alias("pos"))
            .withColumn("w", (F.col("pos") / WORD_BITS).cast("long"))
            .withColumn("_bit",
                        F.pmod(F.col("pos"), F.lit(WORD_BITS)).cast("int"))
            .groupBy("w").agg(F.bit_or(_mask("_bit")).alias("word")))


def bloom_probe(
    candidates: DataFrame,
    bloom: DataFrame,
    key_col: str,
    n_words: int = 2048,
    k: int = 3,
    out_col: str = "maybe_seen",
) -> DataFrame:
    """Probe the filter: input columns + ``out_col`` boolean. True =
    all k bits set (seen, or a Bloom false positive); False = the key
    was DEFINITELY never added. ``n_words``/``k`` must match the
    build.

    Plan shape: ``k`` broadcast hash joins against the (≤ ``n_words``
    rows, fixed-size) word table — the candidate side never shuffles
    and never fans out (no explode/groupBy round-trip). The word table
    is cache()d here (lazy, bounded by ``n_words``): without it each
    of the ``k`` broadcast legs would re-execute the whole BUILD —
    k full corpus scans instead of one."""
    bloom = bloom.cache()
    out = candidates
    hit = F.lit(True)
    for i in range(k):
        wcol, bcol, mcol, vcol = f"_w{i}", f"_b{i}", f"_m{i}", f"_v{i}"
        pos = _pos(F.col(key_col), i, n_words)
        out = (out.withColumn(wcol, (pos / WORD_BITS).cast("long"))
               .withColumn(bcol, F.pmod(pos, F.lit(WORD_BITS)).cast("int"))
               .withColumn(mcol, _mask(bcol)))
        side = bloom.select(F.col("w").alias(wcol),
                            F.col("word").alias(vcol))
        out = out.join(F.broadcast(side), on=wcol, how="left")
        hit = hit & F.col(vcol).isNotNull() \
            & (F.col(vcol).bitwiseAND(F.col(mcol)) == F.col(mcol))
    return (out.withColumn(out_col, hit)
            .select(*candidates.columns, out_col))

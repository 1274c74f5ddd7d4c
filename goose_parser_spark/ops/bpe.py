"""BPE tokenizer training and encoding over the corpus word histogram.

Byte-pair encoding (public knowledge: Sennrich/Haddow/Birch, ACL'16
"Neural Machine Translation of Rare Words with Subword Units"; the
GPT-2/fastText recipe): start from characters, repeatedly merge the
globally most frequent adjacent symbol pair, weighted by word
frequency. Word-boundary-limited (merges never cross whitespace), with
the standard ``</w>`` end-of-word marker so the tokenizer
distinguishes "est " from "est…".

Scale shape — the whole algorithm runs on the DISTINCT-WORD table,
never the corpus:

- one corpus pass builds ``(word, freq)`` (hash-agg, map-side
  combined); optionally capped to the top-V words — the standard
  practice, and the cap bounds every later stage;
- each merge iteration is one pair-count aggregation over the bounded
  word table plus one Catalyst higher-order ``aggregate`` that applies
  the winning merge left-to-right inside each word's symbol array —
  all JVM-side, no Python in the loop;
- the per-iteration winner is ONE driver-side row (the same bounded
  scalar-per-iteration exception documented for
  :mod:`goose_parser_spark.ops.classifier` training);
- encoding tokenizes the distinct-word table once and hash-joins the
  result back to the corpus, so tokenization cost is ∝ vocabulary,
  not ∝ corpus.

Determinism: ties on pair frequency break lexicographically on
(left, right) — byte-identical merge tables on any cluster layout; the
pure-Python reference in tests replays the identical rule.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

#: end-of-word marker (kept out of the corpus alphabet by
#: construction: it is appended per word, never split).
EOW = "</w>"


def _word_counts(df: DataFrame, text_col: str, top_v: int | None,
                 min_freq: int) -> DataFrame:
    tok = F.filter(F.split(F.col(text_col), r"\s+"), lambda t: t != "")
    wc = (df.select(F.explode(tok).alias("word"))
          .groupBy("word").agg(F.count("*").alias("freq"))
          .where(F.col("freq") >= min_freq))
    if top_v is not None:
        # deterministic cap: freq desc, word asc — TakeOrdered, no
        # global sort shuffle
        wc = wc.orderBy(F.col("freq").desc(), F.col("word")).limit(top_v)
    return wc


def _initial_symbols() -> F.Column:
    # characters + EOW marker: 'low' -> ['l','o','w','</w>']
    return F.concat(F.split(F.col("word"), ""), F.array(F.lit(EOW)))


def _merge_expr(syms: str, left: str, right: str) -> str:
    """SQL expression applying ONE merge (left,right) -> left||right
    left-to-right, non-overlapping, inside the ``syms`` array column.

    A single Catalyst ``aggregate`` over the index range with an
    (output-array, skip-flag) accumulator: when position i matches the
    pair, emit the fused symbol and skip i+1 — exactly the sequential
    semantics of the reference BPE implementation, but codegen'd and
    distributed. ``left``/``right`` arrive pre-escaped (hex literals)
    so arbitrary symbols are safe.
    """
    return f"""
    aggregate(
      sequence(1, size({syms})),
      named_struct('out', CAST(array() AS ARRAY<STRING>), 'skip', false),
      (acc, i) -> CASE
        WHEN acc.skip THEN named_struct('out', acc.out, 'skip', false)
        WHEN i < size({syms}) AND element_at({syms}, i) = {left}
             AND element_at({syms}, i + 1) = {right}
          THEN named_struct(
                 'out', array_append(acc.out, {left} || {right}),
                 'skip', true)
        ELSE named_struct(
               'out', array_append(acc.out, element_at({syms}, i)),
               'skip', false)
      END,
      acc -> acc.out)
    """


def _hexlit(s: str) -> str:
    """A SQL string literal for arbitrary content via UNHEX — immune
    to quoting/escaping of whatever symbols the corpus contains."""
    return f"decode(unhex('{s.encode('utf-8').hex()}'), 'UTF-8')"


def train_bpe(
    df: DataFrame,
    n_merges: int = 100,
    text_col: str = "text",
    top_v: int | None = 50_000,
    min_freq: int = 1,
    checkpoint_every: int = 10,
) -> DataFrame:
    """Learn ``n_merges`` BPE merges from the corpus.

    Returns a DataFrame ``(rank, left, right, pair_freq)`` — rank is
    the merge order (0-based), ``pair_freq`` the weighted frequency
    that won the iteration. Training stops early when no adjacent pair
    occurs twice. Deterministic: frequency ties break lexicographically
    on (left, right).
    """
    if n_merges < 1:
        raise ValueError("n_merges must be >= 1")
    spark = df.sparkSession
    words = (_word_counts(df, text_col, top_v, min_freq)
             .select(F.col("freq"), _initial_symbols().alias("syms"))
             .localCheckpoint())
    merges: list[tuple[int, str, str, int]] = []
    for rank in range(n_merges):
        pairs = (words
                 .select("freq",
                         # guard: sequence(1, 0) DESCENDS in Spark, so
                         # fully-merged single-symbol words need an
                         # explicit empty pair list
                         F.explode(F.expr(
                             "CASE WHEN size(syms) < 2 "
                             "THEN CAST(array() AS "
                             "ARRAY<STRUCT<l: STRING, r: STRING>>) "
                             "ELSE transform(sequence(1, size(syms) - 1), "
                             "i -> struct(element_at(syms, i) AS l, "
                             "element_at(syms, i + 1) AS r)) END"))
                         .alias("p"))
                 .groupBy("p.l", "p.r")
                 .agg(F.sum("freq").alias("n")))
        top = (pairs.orderBy(F.col("n").desc(), F.col("l"), F.col("r"))
               .limit(1).collect())
        if not top or top[0]["n"] < 2:
            break
        left, right, n = top[0]["l"], top[0]["r"], int(top[0]["n"])
        merges.append((rank, left, right, n))
        words = words.select(
            "freq",
            F.expr(_merge_expr("syms", _hexlit(left), _hexlit(right)))
            .alias("syms"))
        if (rank + 1) % checkpoint_every == 0:
            # bound lineage growth across iterations (same recipe as
            # connected_components / pagerank)
            words = words.localCheckpoint()
    return spark.createDataFrame(
        merges, "rank int, left string, right string, pair_freq long")


def encode_bpe(
    df: DataFrame,
    merges: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Tokenize the corpus with a trained merge table.

    The merge list is collected to the driver (bounded by n_merges —
    tokenizer configs are KBs) and applied IN RANK ORDER to the
    distinct-word table; the corpus then receives its token arrays
    through one hash join on the word key — tokenization cost is
    ∝ distinct words, and the corpus-sized shuffles carry
    ``(word, tokens)`` pairs only.

    Columns: ``doc_id, tokens (array<string>), n_tokens``.
    """
    ms = [(r["left"], r["right"])
          for r in merges.orderBy("rank").collect()]
    tok = F.filter(F.split(F.col(text_col), r"\s+"), lambda t: t != "")
    vocab = (df.select(F.explode(tok).alias("word")).distinct()
             .select("word", _initial_symbols().alias("syms")))
    for i, (left, right) in enumerate(ms):
        vocab = vocab.select(
            "word",
            F.expr(_merge_expr("syms", _hexlit(left), _hexlit(right)))
            .alias("syms"))
        if (i + 1) % 10 == 0:
            vocab = vocab.localCheckpoint()
    exploded = (df.select(F.col(id_col),
                          F.posexplode(tok).alias("pos", "word")))
    joined = (exploded.join(vocab, on="word")
              .groupBy(id_col)
              .agg(F.flatten(F.array_sort(F.collect_list(
                  F.struct("pos", "syms"))).getField("syms"))
                  .alias("tokens")))
    return (df.select(id_col).join(joined, on=id_col, how="left")
            .select(F.col(id_col),
                    F.coalesce(F.col("tokens"),
                               F.array().cast("array<string>"))
                    .alias("tokens"))
            .withColumn("n_tokens", F.size("tokens")))

"""Driver-contract queries: one entry per implemented operator
(SURVEY.md §2.9), each with a DuckDB oracle, consumed by
``__spark_entry__.py``.

Every Spark query here is the engine's own operator surface (DOM
extraction, transforms, dedup, similarity, text stats, multimodal
plumbing, windowed dedup/sessionization) applied to the driver's
testdata tables; each oracle is independent ANSI SQL over the same
parquet. Column names and value types are aligned on both sides
(floats rounded, sums in decimal then cast) so the driver's
order-insensitive value-hash matches.

The DOM-extraction queries synthesize the html column Spark-side from
``documents.text`` (losslessly — the text has no HTML-special chars),
which makes the full parse→select→extract path oracle-checkable:
the oracle just reselects the embedded fields relationally.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from goose_parser_spark.extractor import extract
from goose_parser_spark.ops.dedup import (
    exact_dedup,
    minhash_lsh_dedup,
    ngram_jaccard_pairs,
    simhash,
)
from goose_parser_spark.ops.multimodal import attach_payload, extract_features
from goose_parser_spark.ops.similarity import cosine_topk, lsh_cosine_topk
from goose_parser_spark.ops.textstats import text_stats
from goose_parser_spark.plans.pipeline import with_bucket


# Row-group census memo for _spread: a layout probe, not a result
# cache — no query output is ever stored.
_SPREAD_MEMO: dict[str, bool] = {}

# Tables whose scans feed heavy map-side work (explode + hash, Python
# extraction, codecs): for these the per-row stage-1 cost dwarfs a
# 5 MB shuffle. The relational tables (lineitem/orders/events) and
# dimensions stay raw — their queries are partial-agg/window/broadcast
# shaped where a repartition shuffle costs MORE than the single-task
# scan (measured: rel_broadcast_join 0.7→2.9 s, events_sessionize
# 0.3→1.5 s when spread blanketly).
_SPREAD_TABLES = frozenset({"documents", "embeddings"})


def _scan_starved(path: str, parallelism: int) -> bool:
    """True when the parquet table at ``path`` cannot feed
    ``parallelism`` scan tasks. The schedulable unit of a parquet scan
    is the ROW GROUP, not the byte-range split: Spark happily cuts one
    file into N ranges, but every range except the one holding a
    row-group midpoint reads zero rows — the partition count lies, the
    task row counts don't. Cheap gates first: a table with >=
    parallelism files can always feed the cores (footers never read);
    only few-file local tables get their footers counted."""
    import pyarrow.parquet as _pq

    files: list[str] = []
    if _os.path.isdir(path):
        for root, _dirs, fns in _os.walk(path):
            files += [_os.path.join(root, f) for f in fns
                      if f.endswith(".parquet")]
    elif _os.path.isfile(path):
        files = [path]
    else:
        return False  # non-local / unreadable: trust the scan
    if len(files) >= parallelism:
        return False
    try:
        units = 0
        for f in files:
            units += _pq.ParquetFile(f).metadata.num_row_groups
            if units >= parallelism:
                return False
        return units < parallelism
    except Exception:  # noqa: BLE001 — layout probe only, never fatal
        return False


def _spread(df: DataFrame, path: str) -> DataFrame:
    """Scale-adaptive scan fan-out (optimization guide §2.5, "input
    skew: one huge unsplittable file ... repartition immediately after
    the read"). The driver's sf tables are single-file,
    single-row-group parquet, so every scan is effectively ONE task
    and all map-side work before the first exchange — shingle explode
    + hash, the Python DOM extraction, media decode — runs on one
    core. Round-robin repartition to the engine's default parallelism
    ONLY when the table physically cannot feed the cores: at
    production scale the input has >= parallelism row groups and no
    shuffle is added. Row-order independent everywhere: no declared
    query uses partition- or order-sensitive expressions (no
    monotonically_increasing_id / spark_partition_id / unsorted
    collect_list), and the driver's oracle hash is order-insensitive.
    """
    spark = df.sparkSession
    p = spark.sparkContext.defaultParallelism
    memo_key = f"{path}::{p}"
    starved = _SPREAD_MEMO.get(memo_key)
    if starved is None:
        starved = _scan_starved(path, p)
        _SPREAD_MEMO[memo_key] = starved
    return df.repartition(p) if starved else df


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    path = f"{sf_dir}/{name}.parquet"
    df = spark.read.parquet(path)
    if name in _SPREAD_TABLES:
        df = _spread(df, path)
    return df


# Oracle-scale corpus amplifier (VERDICT r02 #4): hash-match checks
# must exercise >10^4 documents, but the raw documents table has only
# 500 rows at sf<=0.01. ×23 → 11,500 docs (10,948 distinct texts).
# Env-tunable so bench.py can pin it to 1: the amplifier exists for
# ORACLE scale; the bench headline list must stay comparable round
# over round (r01/r02 timed the unamplified queries).
import os as _os

_AMP = int(_os.environ.get("GOOSE_ORACLE_AMP", "23"))


def _documents_amplified(spark: SparkSession, sf_dir: str,
                         vary_text: bool = False) -> DataFrame:
    """Deterministically amplify documents ×``_AMP``: replica ``r`` of
    doc ``d`` gets ``doc_id = d*_AMP + r`` (a Generate node — no join,
    no shuffle; extraction stays a map-only stage).

    ``vary_text=True`` (dedup/pair queries): every non-final token is
    suffixed with ``~r`` — an INJECTIVE token mapping, so Jaccard /
    minhash / chunk-dup relationships WITHIN a replica family are
    exactly those of the base corpus, while cross-family shingle
    overlap is zero (shingles span ≥2 modified tokens). Without this,
    23 byte-identical copies per doc would form 23-cliques and blow
    pair outputs/oracle joins up quadratically.

    ``vary_text=False`` (extraction/transform/map-only queries):
    byte-identical copies under distinct doc_ids/urls.

    Mirrored in SQL by the ``_SQL_DOCS_AMP_*`` CTEs. Test-scale corpus
    synthesis only — at 100 TB the corpus is already big.
    """
    docs = _t(spark, sf_dir, "documents")
    amped = docs.select(
        "*", F.explode(F.sequence(F.lit(0), F.lit(_AMP - 1))).alias("rep"))
    text = F.col("text")
    if vary_text:
        text = F.replace(
            F.col("text"), F.lit(" "),
            F.concat(F.lit("~"), F.col("rep").cast("string"), F.lit(" ")))
    return amped.select(
        (F.col("doc_id") * _AMP + F.col("rep")).alias("doc_id"),
        text.alias("text"), "lang", "source", "n_chars")


_SQL_DOCS_AMP_COPY = f"""docs_amp AS (
  SELECT d.doc_id * {_AMP} + r.range AS doc_id, d.text, d.lang, d.source,
         d.n_chars
  FROM documents d CROSS JOIN range({_AMP}) r
)"""

_SQL_DOCS_AMP_VARIED = f"""docs_amp AS (
  SELECT d.doc_id * {_AMP} + r.range AS doc_id,
         replace(d.text, ' ', '~' || CAST(r.range AS VARCHAR) || ' ') AS text,
         d.lang, d.source, d.n_chars
  FROM documents d CROSS JOIN range({_AMP}) r
)"""


# --------------------------------------------------------------------------
# DOM-extraction queries (C1-C8, N1-N5, T1-T7 through the real engine)
# --------------------------------------------------------------------------

def _pages_from_documents(spark: SparkSession, sf_dir: str,
                          docs: DataFrame | None = None,
                          url_prefix: str = "https://docs.test/",
                          ) -> DataFrame:
    """Synthesize a pages table from documents (deterministic,
    lossless): one html document embedding title/body/lang/source.
    Amplified ×_AMP so the extraction oracles exercise >10^4 docs.
    ``docs`` overrides the corpus (snapshot-delta queries pass edited
    replicas); ``url_prefix`` distinguishes crawls of the same ids."""
    if docs is None:
        docs = _documents_amplified(spark, sf_dir)
    html = F.concat(
        F.lit('<html><body><div class="doc" data-lang="'), F.col("lang"),
        F.lit('"><h1 class="t">doc '), F.col("doc_id").cast("string"),
        F.lit('</h1><p class="b">'), F.col("text"),
        F.lit('</p><table><tr class="kv"><td class="k">source</td><td class="v">'),
        F.col("source"),
        F.lit('</td></tr><tr class="kv"><td class="k">n_chars</td><td class="v">'),
        F.col("n_chars").cast("string"),
        F.lit("</td></tr></table>"),
        F.when(F.col("n_chars") > 200,
               F.lit('<div class="long">long</div>')).otherwise(F.lit("")),
        F.lit("</div></body></html>"),
    )
    return docs.select(
        F.concat(F.lit(url_prefix), F.col("doc_id").cast("string"))
         .alias("url"),
        html.alias("html"),
    )


_FLAGSHIP_RULES = {
    "scope": "div.doc",
    "collection": [
        {"name": "title", "scope": "h1.t"},
        {"name": "body", "scope": "p.b"},
        {"name": "doclang", "scope": "div.doc", "attr": "data-lang",
         "parentScope": "body"},
    ],
}


def q_extract_flagship(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Collection rule + attr + parentScope through the full DOM path."""
    pages = _pages_from_documents(spark, sf_dir)
    out = extract(pages, _FLAGSHIP_RULES)
    return out.select(
        "url",
        F.col("extracted.title").alias("title"),
        F.col("extracted.body").alias("body"),
        F.col("extracted.doclang").alias("doclang"),
    )


SQL_EXTRACT_FLAGSHIP = f"""
WITH {_SQL_DOCS_AMP_COPY}
SELECT 'https://docs.test/' || doc_id AS url,
       'doc ' || doc_id AS title,
       text AS body,
       lang AS doclang
FROM docs_amp
"""


def q_extract_grid_explode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grid rule (N2) → array<struct> → relational rows via inline."""
    pages = _pages_from_documents(spark, sf_dir)
    rules = {"scope": "tr.kv", "collection": [[
        {"name": "k", "scope": "td.k"},
        {"name": "v", "scope": "td.v"},
    ]]}
    out = extract(pages, rules)
    return out.select("url", F.inline("extracted"))


SQL_EXTRACT_GRID_EXPLODE = f"""
WITH {_SQL_DOCS_AMP_COPY}
SELECT 'https://docs.test/' || doc_id AS url, 'source' AS k, source AS v
FROM docs_amp
UNION ALL
SELECT 'https://docs.test/' || doc_id AS url, 'n_chars' AS k,
       CAST(n_chars AS VARCHAR) AS v
FROM docs_amp
"""


def q_extract_transform_chain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T6 split → T4 pick → T2 replace, inside the extraction UDF."""
    pages = _pages_from_documents(spark, sf_dir)
    rules = {"name": "first_tok", "scope": "p.b", "transform": [
        {"type": "split", "separator": " "},
        {"type": "pick", "prop": 0},
        {"type": "replace", "re": ["a", "g"], "to": "X"},
    ]}
    out = extract(pages, rules)
    return out.select("url", F.col("extracted.first_tok").alias("first_tok"))


SQL_EXTRACT_TRANSFORM_CHAIN = f"""
WITH {_SQL_DOCS_AMP_COPY}
SELECT 'https://docs.test/' || doc_id AS url,
       replace(split_part(text, ' ', 1), 'a', 'X') AS first_tok
FROM docs_amp
"""


def q_extract_conditional(spark: SparkSession, sf_dir: str) -> DataFrame:
    """cases/exist/provideRules (A1-A3): branch on a marker element."""
    pages = _pages_from_documents(spark, sf_dir)
    rules = {"actions": [{"type": "cases", "cases": [
        [{"type": "exist", "scope": "div.long"},
         {"type": "provideRules", "rules": {"name": "cls", "scope": "div.long"}}],
        [{"type": "provideRules", "rules": {"name": "cls", "scope": "h1.t"}}],
    ]}]}
    out = extract(pages, rules)
    return out.select("url", F.col("extracted.cls").alias("cls"))


SQL_EXTRACT_CONDITIONAL = f"""
WITH {_SQL_DOCS_AMP_COPY}
SELECT 'https://docs.test/' || doc_id AS url,
       CASE WHEN n_chars > 200 THEN 'long' ELSE 'doc ' || doc_id END AS cls
FROM docs_amp
"""


def q_extract_multi_tree(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-tenant extraction: two independent rule trees evaluated
    against ONE parse per document (extract_many) — one corpus scan
    serves every consumer's rules."""
    from goose_parser_spark.extractor import extract_many
    pages = _pages_from_documents(spark, sf_dir)
    out = extract_many(pages, {
        "meta": {"scope": "div.doc", "collection": [
            {"name": "title", "scope": "h1.t"},
            {"name": "doclang", "scope": "div.doc", "attr": "data-lang",
             "parentScope": "body"}]},
        "kv": {"name": "first_source", "scope": "tr.kv td.v"},
    })
    return out.select(
        "url",
        F.col("extracted.meta.title").alias("title"),
        F.col("extracted.meta.doclang").alias("doclang"),
        F.col("extracted.kv.first_source").alias("first_source"),
    )


SQL_EXTRACT_MULTI_TREE = f"""
WITH {_SQL_DOCS_AMP_COPY}
SELECT 'https://docs.test/' || doc_id AS url,
       'doc ' || doc_id AS title,
       lang AS doclang,
       source || ' ' || CAST(n_chars AS VARCHAR) AS first_source
FROM docs_amp
"""


# --------------------------------------------------------------------------
# Native analogs of the goose scalar/structural ops (SURVEY.md §2.9)
# --------------------------------------------------------------------------

def q_t1_trim(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _documents_amplified(spark, sf_dir)
    padded = F.concat(F.lit("  "), F.col("text"), F.lit("  "))
    return docs.select("doc_id", F.trim(padded).alias("trimmed"))


SQL_T1_TRIM = (f"WITH {_SQL_DOCS_AMP_COPY} SELECT doc_id, "
               "trim('  ' || text || '  ') AS trimmed FROM docs_amp")


def q_t2_replace(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _documents_amplified(spark, sf_dir)
    return docs.select(
        "doc_id", F.regexp_replace("text", "the", "THE").alias("replaced"))


SQL_T2_REPLACE = (f"WITH {_SQL_DOCS_AMP_COPY} SELECT doc_id, "
                  "regexp_replace(text, 'the', 'THE', 'g') "
                  "AS replaced FROM docs_amp")


def q_t6_split_t4_pick(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _documents_amplified(spark, sf_dir)
    return docs.select(
        "doc_id", F.split_part("text", F.lit(" "), F.lit(1)).alias("first_tok"))


SQL_T6_SPLIT_T4_PICK = (f"WITH {_SQL_DOCS_AMP_COPY} SELECT doc_id, "
                        "split_part(text, ' ', 1) AS first_tok "
                        "FROM docs_amp")


def q_t5_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _documents_amplified(spark, sf_dir)
    return docs.select(
        "doc_id", F.array_join(F.split("text", " "), ",").alias("joined"))


SQL_T5_JOIN = (f"WITH {_SQL_DOCS_AMP_COPY} SELECT doc_id, "
               "array_to_string(string_split(text, ' '), ',') "
               "AS joined FROM docs_amp")


def q_c6_separator(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-match join with separator — relational analog: per-lang
    ordered string_agg.

    NOTE (VERDICT r01 #4): this is an oracle analog over a handful of
    language groups, NOT a general engine operator — collecting all
    texts of a group into one value is a single-row-holds-the-corpus
    pattern; at scale the separator join happens per-document inside
    the extraction UDF (rules/evaluator.py), never as a corpus-wide
    aggregate."""
    docs = _t(spark, sf_dir, "documents")
    return (docs.groupBy("lang")
            .agg(F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("doc_id", "text"))),
                    lambda s: s.getField("text")),
                "|").alias("all_texts")))


SQL_C6_SEPARATOR = ("SELECT lang, string_agg(text, '|' ORDER BY doc_id) "
                    "AS all_texts FROM documents GROUP BY lang")


def q_n2_grid_explode(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    return docs.select(
        "doc_id", F.explode(F.split("text", " ")).alias("token"))


SQL_N2_GRID_EXPLODE = ("SELECT doc_id, unnest(string_split(text, ' ')) "
                       "AS token FROM documents")


def q_n4_id_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """id-based dedup: latest event per (user_id, event_type) — the
    paginator-merge analog (SURVEY.md §2.4 N4)."""
    events = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id", "event_type") \
              .orderBy(F.col("ts").desc(), F.col("event_id").desc())
    return (events.withColumn("rn", F.row_number().over(w))
            .where(F.col("rn") == 1)
            .select("user_id", "event_type", "event_id"))


SQL_N4_ID_DEDUP = """
SELECT user_id, event_type, event_id FROM (
  SELECT user_id, event_type, event_id,
         row_number() OVER (PARTITION BY user_id, event_type
                            ORDER BY ts DESC, event_id DESC) AS rn
  FROM events
) WHERE rn = 1
"""


def q_a3_conditional(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _documents_amplified(spark, sf_dir)
    return docs.select(
        "doc_id",
        F.when(F.col("lang") == "en", F.upper("text"))
         .otherwise(F.lower("text")).alias("cased"))


SQL_A3_CONDITIONAL = (f"WITH {_SQL_DOCS_AMP_COPY} SELECT doc_id, "
                      "CASE WHEN lang = 'en' THEN upper(text) "
                      "ELSE lower(text) END AS cased FROM docs_amp")


# --------------------------------------------------------------------------
# Deduplication suite
# --------------------------------------------------------------------------

def q_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    return exact_dedup(_documents_amplified(spark, sf_dir, vary_text=True))


SQL_DEDUP_EXACT = (f"WITH {_SQL_DOCS_AMP_VARIED} SELECT min(doc_id) "
                   "AS doc_id, text FROM docs_amp GROUP BY text")


def q_dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    return ngram_jaccard_pairs(
        _documents_amplified(spark, sf_dir, vary_text=True),
        n=3, threshold=0.5)


SQL_DEDUP_NGRAM_JACCARD = f"""
WITH {_SQL_DOCS_AMP_VARIED}, tok AS (
  SELECT doc_id, string_split(text, ' ') AS w FROM docs_amp
  WHERE len(string_split(text, ' ')) >= 3
), sh AS (
  SELECT DISTINCT doc_id, array_to_string(w[u:u+2], ' ') AS sh
  FROM (SELECT doc_id, w, unnest(range(1, len(w) - 1)) AS u FROM tok)
), sizes AS (
  SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY 1
), common AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_common
  FROM sh a JOIN sh b ON a.sh = b.sh AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT doc_a, doc_b,
       round(n_common * 1.0 / (sa.n_sh + sb.n_sh - n_common), 6) AS jaccard
FROM common
JOIN sizes sa ON sa.doc_id = doc_a
JOIN sizes sb ON sb.doc_id = doc_b
WHERE round(n_common * 1.0 / (sa.n_sh + sb.n_sh - n_common), 6) >= 0.5
"""


def q_topic_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K-means topic organization with per-cluster TF-IDF profiles
    (ops/similarity.py topic_clusters): 8 deterministic-Lloyd clusters
    over the embeddings, term profiles from the aligned documents.
    Rows-only (float k-means internals, like simsearch_ivf); planted-
    topic separation is pytest-verified."""
    from goose_parser_spark.ops.similarity import topic_clusters
    emb = _t(spark, sf_dir, "embeddings")
    docs = _t(spark, sf_dir, "documents")
    return topic_clusters(emb, docs, n_clusters=8, iters=2, top_terms=5)


def q_bpe_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE tokenizer training (ops/bpe.py train_bpe, Sennrich'16):
    learn 16 merges from the UNAMPLIFIED corpus word histogram.
    Rows-only (iterative global-argmax loop is not SQL-expressible);
    the algorithm is pytest-verified against an independent pure-
    Python reference on identical inputs (tests/test_bpe.py).
    Deterministic: ties break lexicographically on (left, right)."""
    from goose_parser_spark.ops.bpe import train_bpe
    docs = _t(spark, sf_dir, "documents")
    return train_bpe(docs.select("text"), n_merges=16, top_v=5000)


def q_dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash+LSH near-dup pairs. xxhash64-based → no SQL oracle;
    pytest validates it against exact Jaccard (rows-only driver check)."""
    return minhash_lsh_dedup(
        _documents_amplified(spark, sf_dir, vary_text=True),
        n=3, num_hashes=32, bands=8, threshold=0.5)


def q_dedup_minhash_md5(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The FULL MinHash+banded-LSH+verify pipeline under a hard value
    oracle: hash_mode='md5' makes every stage byte-reproducible in
    DuckDB (fixed-width hex strings — lexicographic min == numeric
    min, band hash = md5 of the seed-ordered concat). Same algorithm,
    same plan shape as the xxhash64 production path (which stays
    rows-only for speed); this variant turns the LSH family's
    correctness from pytest-only into a driver hash gate."""
    return minhash_lsh_dedup(
        _documents_amplified(spark, sf_dir, vary_text=True),
        n=3, num_hashes=16, bands=8, threshold=0.5, hash_mode="md5")


SQL_DEDUP_MINHASH_MD5 = f"""
WITH {_SQL_DOCS_AMP_VARIED}, tok AS (
  SELECT doc_id, string_split(text, ' ') AS w FROM docs_amp
  WHERE len(string_split(text, ' ')) >= 3
), sh AS (
  SELECT doc_id, array_to_string(w[i:i+2], ' ') AS s
  FROM (SELECT doc_id, w, unnest(range(1, len(w) - 1)) AS i FROM tok)
), sig AS (
  SELECT doc_id, r.range AS seed,
         min(md5(CAST(r.range AS VARCHAR) || ':' || s)) AS h
  FROM sh CROSS JOIN range(16) r
  GROUP BY doc_id, r.range
), banded AS (
  SELECT doc_id, seed // 2 AS band,
         md5(string_agg(h, '|' ORDER BY seed)) AS bh
  FROM sig GROUP BY doc_id, seed // 2
), cand AS (
  SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b
  FROM banded x JOIN banded y USING (band, bh)
  WHERE x.doc_id < y.doc_id
), sh_d AS (
  SELECT DISTINCT doc_id, md5(s) AS hs FROM sh
), cnt AS (
  SELECT doc_id, count(*) AS n_sh FROM sh_d GROUP BY doc_id
), inter AS (
  SELECT c.doc_a, c.doc_b, count(*) AS i
  FROM cand c
  JOIN sh_d a ON a.doc_id = c.doc_a
  JOIN sh_d b ON b.doc_id = c.doc_b AND b.hs = a.hs
  GROUP BY c.doc_a, c.doc_b
)
SELECT i.doc_a, i.doc_b,
       round(i.i * 1.0 / (ca.n_sh + cb.n_sh - i.i), 6) AS jaccard
FROM inter i
JOIN cnt ca ON ca.doc_id = i.doc_a
JOIN cnt cb ON cb.doc_id = i.doc_b
WHERE round(i.i * 1.0 / (ca.n_sh + cb.n_sh - i.i), 6) >= 0.5
"""


def q_dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash fingerprints (rows-only driver check; hamming-pair
    semantics pytest-validated)."""
    return simhash(_documents_amplified(spark, sf_dir, vary_text=True))


def q_dedup_simhash_md5(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SimHash ALGORITHM under a hard value oracle: md5-derived
    60-bit token hashes (first 15 hex chars as an integer) are
    replayed bit-for-bit in DuckDB via hex-digit arithmetic — same
    vote/sign pipeline as the xxhash64 production fingerprint."""
    return simhash(_documents_amplified(spark, sf_dir, vary_text=True),
                   bits=60, hash_mode="md5")


SQL_DEDUP_SIMHASH_MD5 = f"""
WITH {_SQL_DOCS_AMP_VARIED}, tok AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS t FROM docs_amp
), th AS (
  SELECT doc_id,
         list_sum(list_transform(range(15), p ->
           CAST(strpos('0123456789abcdef', substr(md5(t), p + 1, 1)) - 1
                AS BIGINT) << CAST(4 * (14 - p) AS INT)
         )) AS h
  FROM tok
), nn AS (
  SELECT doc_id, count(*) AS n FROM th GROUP BY doc_id
), bitsum AS (
  SELECT doc_id, i.range AS i,
         sum((h >> CAST(i.range AS INT)) & 1) AS s
  FROM th CROSS JOIN range(60) i
  GROUP BY doc_id, i.range
)
SELECT b.doc_id,
       CAST(sum(CASE WHEN 2 * b.s > nn.n
                THEN CAST(1 AS BIGINT) << CAST(b.i AS INT)
                ELSE 0 END) AS BIGINT) AS simhash
FROM bitsum b JOIN nn USING (doc_id)
GROUP BY b.doc_id
"""


# --------------------------------------------------------------------------
# Similarity search
# --------------------------------------------------------------------------

def _query_vec(spark: SparkSession, sf_dir: str) -> list[float]:
    row = (_t(spark, sf_dir, "embeddings")
           .where(F.col("vec_id") == 0).select("embedding").head())
    return [float(x) for x in row["embedding"]]


def q_normalize_nfc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unicode NFC normalization (ops/textstats.py normalize_text_nfc)
    over text carrying explicitly DECOMPOSED sequences (e +
    U+0301, i + U+0308): CPython unicodedata vs DuckDB utf8proc —
    a genuine cross-library differential, not a reconstruction."""
    from goose_parser_spark.ops.textstats import normalize_text_nfc
    docs = _documents_amplified(spark, sf_dir)
    s = F.col("doc_id").cast("string")
    text = F.concat(F.lit("cafe\u0301 "), s,
                    F.lit(" nai\u0308ve te\u0301st "), F.col("text"))
    return normalize_text_nfc(docs.select("doc_id", text.alias("text")))


SQL_NORMALIZE_NFC = f"""
WITH {_SQL_DOCS_AMP_COPY}
SELECT doc_id,
       nfc_normalize('cafe' || chr(769) || ' ' || doc_id ||
                     ' nai' || chr(776) || 've te' || chr(769) ||
                     'st ' || text) AS text
FROM docs_amp
"""


def q_split_sentences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sentence segmentation (ops/textstats.py split_sentences) over
    synthesized punctuated docs (testdata text carries no sentence
    punctuation); every 11th doc is punctuation-free and must come
    back as one sentence. Map-only."""
    from goose_parser_spark.ops.textstats import split_sentences
    docs = _documents_amplified(spark, sf_dir)
    d = F.col("doc_id")
    s = d.cast("string")
    # abbreviation cases planted (VERDICT r04 #7): Dr./vs./Prof./
    # i.e./e.g./No./etc. must NOT open sentences
    punct = F.concat(
        F.lit("Alpha fact "), s, F.lit(". Dr. Smith vs. Prof. Jones "
                                       "i.e. case "),
        (d % 7).cast("string"), F.lit("! Gamma query e.g. No. "),
        (d % 5).cast("string"), F.lit("? tail words etc. here"))
    lined = docs.select(
        "doc_id",
        F.when(d % 11 == 0, F.col("text")).otherwise(punct).alias("text"))
    return split_sentences(lined)


from goose_parser_spark.ops.textstats import _ABBREV_ALT as _SS_ABBREV_ALT

SQL_SPLIT_SENTENCES = f"""
WITH {_SQL_DOCS_AMP_COPY}, lined AS (
  SELECT doc_id,
         CASE WHEN doc_id % 11 = 0 THEN text
              ELSE 'Alpha fact ' || doc_id ||
                   '. Dr. Smith vs. Prof. Jones i.e. case ' ||
                   (doc_id % 7) || '! Gamma query e.g. No. ' ||
                   (doc_id % 5) || '? tail words etc. here'
         END AS text
  FROM docs_amp
), m AS (
  SELECT doc_id,
         list_filter(
           string_split(
             regexp_replace(
               regexp_replace(
                 regexp_replace(text, '\\b([ei])\\.([ge])\\.',
                                '\\1' || chr(1) || '\\2' || chr(1), 'g'),
                 '\\b({_SS_ABBREV_ALT})\\.', '\\1' || chr(1), 'g'),
               '([.!?]+)\\s+', '\\1' || chr(30), 'g'),
             chr(30)),
           s -> trim(s) <> '') AS ss
  FROM lined
)
SELECT doc_id, CAST(i - 1 AS INT) AS sent_id,
       replace(ss[i], chr(1), '.') AS sentence,
       CAST(len(list_filter(
                string_split_regex(replace(ss[i], chr(1), '.'), '\\s+'),
                t -> t <> '')) AS INT) AS n_tokens
FROM (SELECT doc_id, ss, unnest(range(1, len(ss) + 1)) AS i FROM m)
"""


def q_bm25_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 lexical top-k retrieval (ops/retrieval.py bm25_topk) —
    the inverted-index plan over the corpus; queries are the first 3
    tokens of every 97th doc. Integer micro-unit scoring makes the
    ranking bit-reproducible in DuckDB (same trick as lm_score)."""
    from goose_parser_spark.ops.retrieval import bm25_topk
    docs = _documents_amplified(spark, sf_dir)
    qs = (docs.where(F.col("doc_id") % 97 == 0)
          .select(F.col("doc_id").alias("query_id"),
                  F.array_join(
                      F.slice(F.split(F.col("text"), " "), 1, 3),
                      " ").alias("query")))
    return bm25_topk(docs.select("doc_id", "text"), qs, k=5)


SQL_BM25_SEARCH = f"""
WITH {_SQL_DOCS_AMP_COPY}, tok AS (
  SELECT doc_id AS doc,
         unnest(list_filter(string_split_regex(text, '\\s+'),
                            x -> x != '')) AS t
  FROM docs_amp
), postings AS (
  SELECT doc, t, count(*) AS tf FROM tok GROUP BY 1, 2
), doclen AS (
  SELECT doc, count(*) AS dl FROM tok GROUP BY 1
), stats AS (
  SELECT count(*) AS n_docs, CAST(sum(dl) AS DOUBLE) AS sum_dl
  FROM doclen
), dfreq AS (
  SELECT t, count(*) AS df_ FROM postings GROUP BY 1
), qs AS (
  SELECT doc_id AS qid,
         array_to_string(string_split(text, ' ')[1:3], ' ') AS q
  FROM docs_amp WHERE doc_id % 97 = 0
), qt AS (
  SELECT DISTINCT qid,
         unnest(list_distinct(list_filter(
             string_split_regex(q, '\\s+'), x -> x != ''))) AS t
  FROM qs
), j AS (
  SELECT qt.qid, p.doc, p.tf, d.df_, l.dl, s.n_docs, s.sum_dl
  FROM qt JOIN postings p USING (t) JOIN dfreq d USING (t)
  JOIN doclen l ON l.doc = p.doc CROSS JOIN stats s
), pt AS (
  SELECT qid, doc,
         CAST(round(
           ln(1.0 + (n_docs - df_ + 0.5) / (df_ + 0.5))
           * tf * (1200/1000.0 + 1.0)
           / (tf + (1200/1000.0) * (1.0 - 750/1000.0
              + (750/1000.0) * dl / (sum_dl / n_docs)))
           * 1000000) AS BIGINT) AS c
  FROM j
), scored AS (
  SELECT qid, doc, CAST(sum(c) AS BIGINT) AS score_micro
  FROM pt GROUP BY 1, 2
), ranked AS (
  SELECT qid, doc, score_micro,
         row_number() OVER (PARTITION BY qid
                            ORDER BY score_micro DESC, doc) AS rk
  FROM scored
)
SELECT qid AS query_id, CAST(rk AS INT) AS rank, doc AS doc_id,
       score_micro
FROM ranked WHERE rk <= 5
"""


def q_hybrid_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid retrieval: BM25 lexical leg + exact-cosine embedding leg
    fused by reciprocal-rank fusion (ops/retrieval.py rrf_fuse,
    SIGIR'09). Queries are every 97th doc: lexical query = its first 3
    tokens; semantic query = its embedding (vec_id aligns with doc_id
    in the test tables). Both legs are bounded top-10 lists; fusion is
    integer micro-units, bit-reproducible in DuckDB."""
    from goose_parser_spark.ops.retrieval import bm25_topk, rrf_fuse
    from goose_parser_spark.ops.similarity import cosine_topk_multi
    docs = _t(spark, sf_dir, "documents")
    emb = _t(spark, sf_dir, "embeddings")
    qdocs = docs.where(F.col("doc_id") % 97 == 0)
    lex_qs = qdocs.select(
        F.col("doc_id").alias("query_id"),
        F.array_join(F.slice(F.split(F.col("text"), " "), 1, 3),
                     " ").alias("query"))
    lex = bm25_topk(docs.select("doc_id", "text"), lex_qs, k=10)
    sem_qs = (emb.where(F.col("vec_id") % 97 == 0)
              .select(F.col("vec_id").alias("query_id"), "embedding"))
    sem = (cosine_topk_multi(emb, sem_qs, k=10)
           .select("query_id", "rank", F.col("vec_id").alias("doc_id")))
    return rrf_fuse([lex.select("query_id", "rank", "doc_id"), sem],
                    k=10)


SQL_HYBRID_SEARCH = """
WITH tok AS (
  SELECT doc_id AS doc,
         unnest(list_filter(string_split_regex(text, '\\s+'),
                            x -> x != '')) AS t
  FROM documents
), postings AS (
  SELECT doc, t, count(*) AS tf FROM tok GROUP BY 1, 2
), doclen AS (
  SELECT doc, count(*) AS dl FROM tok GROUP BY 1
), stats AS (
  SELECT count(*) AS n_docs, CAST(sum(dl) AS DOUBLE) AS sum_dl
  FROM doclen
), dfreq AS (
  SELECT t, count(*) AS df_ FROM postings GROUP BY 1
), qs AS (
  SELECT doc_id AS qid,
         array_to_string(string_split(text, ' ')[1:3], ' ') AS q
  FROM documents WHERE doc_id % 97 = 0
), qt AS (
  SELECT DISTINCT qid,
         unnest(list_distinct(list_filter(
             string_split_regex(q, '\\s+'), x -> x != ''))) AS t
  FROM qs
), j AS (
  SELECT qt.qid, p.doc, p.tf, d.df_, l.dl, s.n_docs, s.sum_dl
  FROM qt JOIN postings p USING (t)
  JOIN dfreq d USING (t)
  JOIN doclen l ON l.doc = p.doc
  CROSS JOIN stats s
), per_term AS (
  SELECT qid, doc,
         CAST(round(
           ln(1.0 + (n_docs - df_ + 0.5) / (df_ + 0.5))
           * tf * 2.2 / (tf + 1.2 * (0.25 + 0.75 * dl / (sum_dl / n_docs)))
           * 1000000) AS BIGINT) AS c
  FROM j
), lex_scored AS (
  SELECT qid, doc, sum(c) AS score FROM per_term GROUP BY 1, 2
), lex AS (
  SELECT qid, doc,
         row_number() OVER (PARTITION BY qid
                            ORDER BY score DESC, doc) AS rank
  FROM lex_scored QUALIFY rank <= 10
), sem_scored AS (
  SELECT q.vec_id AS qid, e.vec_id AS doc,
         round(list_cosine_similarity(CAST(e.embedding AS DOUBLE[]),
                                      CAST(q.embedding AS DOUBLE[])), 4)
             AS sim
  FROM embeddings e, (SELECT * FROM embeddings
                      WHERE vec_id % 97 = 0) q
), sem AS (
  SELECT qid, doc,
         row_number() OVER (PARTITION BY qid
                            ORDER BY sim DESC, doc) AS rank
  FROM sem_scored QUALIFY rank <= 10
), legs AS (
  SELECT qid, doc, CAST(round(1000000.0 / (60 + rank)) AS BIGINT) AS c
  FROM lex
  UNION ALL
  SELECT qid, doc, CAST(round(1000000.0 / (60 + rank)) AS BIGINT) AS c
  FROM sem
), fused AS (
  SELECT qid, doc, CAST(sum(c) AS BIGINT) AS rrf_micro,
         count(*) AS n_lists
  FROM legs GROUP BY 1, 2
)
SELECT qid AS query_id,
       CAST(row_number() OVER (PARTITION BY qid
                               ORDER BY rrf_micro DESC, doc) AS INT)
           AS rank,
       doc AS doc_id, rrf_micro, n_lists
FROM fused
QUALIFY rank <= 10
"""


def q_embedding_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Prototype-distance outlier flagging (ops/similarity.py
    embedding_outliers, Sorscher'22 pruning signal): per-label
    integer-micro centroids, cosine distance, exact p90 cutoff.
    Centroid sums are BIGINT so the result is partitioning-invariant;
    the oracle replays the identical integer pipeline in DuckDB."""
    from goose_parser_spark.ops.similarity import embedding_outliers
    emb = _t(spark, sf_dir, "embeddings")
    return embedding_outliers(emb, pct=0.9)


SQL_EMBEDDING_OUTLIERS = """
WITH comps AS (
  SELECT label AS g, d,
         CAST(round(embedding[d + 1] * 1000000) AS BIGINT) AS vm
  FROM (SELECT label, CAST(embedding AS DOUBLE[]) AS embedding,
               unnest(range(len(embedding))) AS d
        FROM embeddings)
), cent AS (
  SELECT g, list(s / n / 1e6 ORDER BY d) AS centroid
  FROM (SELECT g, d, CAST(sum(vm) AS BIGINT) AS s, count(*) AS n
        FROM comps GROUP BY 1, 2)
  GROUP BY g
), scored AS (
  SELECT e.vec_id, e.label,
         round(1.0 - list_cosine_similarity(
                   CAST(e.embedding AS DOUBLE[]), c.centroid), 4) AS dist
  FROM embeddings e JOIN cent c ON c.g = e.label
), cuts AS (
  SELECT label, quantile_cont(dist, 0.9) AS cutoff
  FROM scored GROUP BY label
)
SELECT s.vec_id, s.label, s.dist, c.cutoff,
       s.dist > c.cutoff AS is_outlier
FROM scored s JOIN cuts c USING (label)
"""


def q_simsearch_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _t(spark, sf_dir, "embeddings")
    q = _query_vec(spark, sf_dir)
    return cosine_topk(emb.where(F.col("vec_id") != 0), q, k=10)


SQL_SIMSEARCH_TOPK = """
WITH q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0)
SELECT vec_id,
       round(list_cosine_similarity(CAST(embedding AS DOUBLE[]),
                                    CAST(qe AS DOUBLE[])), 4) AS sim
FROM embeddings, q
WHERE vec_id != 0
ORDER BY sim DESC, vec_id
LIMIT 10
"""


def q_dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup pairs → connected components → canonical id per doc
    (the keep-policy input of a dedup pipeline).

    Pairs come from MinHash-LSH (never a global shingle self-join —
    the exact quadratic path must only ever run inside LSH candidate
    buckets at scale; VERDICT r01 #1). Band config bands=32, r=1:
    a Jaccard≥0.5 pair is missed only if all 32 independent minhashes
    fall outside the shared shingles — P ≤ 0.5^32 ≈ 2e-10 — so the
    output equals the exact-Jaccard oracle's components; LSH
    candidates are still exact-verified before clustering."""
    from goose_parser_spark.ops.dedup import connected_components
    docs = _documents_amplified(spark, sf_dir, vary_text=True)
    pairs = minhash_lsh_dedup(docs, n=3, num_hashes=32, bands=32,
                              threshold=0.5)
    return connected_components(docs.select("doc_id"), pairs)


SQL_DEDUP_CLUSTERS = f"""
WITH RECURSIVE {_SQL_DOCS_AMP_VARIED}, tok AS (
  SELECT doc_id, string_split(text, ' ') AS w FROM docs_amp
  WHERE len(string_split(text, ' ')) >= 3
), sh AS (
  SELECT DISTINCT doc_id, array_to_string(w[u:u+2], ' ') AS sh
  FROM (SELECT doc_id, w, unnest(range(1, len(w) - 1)) AS u FROM tok)
), sizes AS (
  SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY 1
), common AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_common
  FROM sh a JOIN sh b ON a.sh = b.sh AND a.doc_id < b.doc_id
  GROUP BY 1, 2
), pairs AS (
  SELECT doc_a, doc_b
  FROM common
  JOIN sizes sa ON sa.doc_id = doc_a
  JOIN sizes sb ON sb.doc_id = doc_b
  WHERE round(n_common * 1.0 / (sa.n_sh + sb.n_sh - n_common), 6) >= 0.5
), edges AS (
  SELECT doc_a AS a, doc_b AS b FROM pairs
  UNION SELECT doc_b, doc_a FROM pairs
), reach(node, root) AS (
  SELECT doc_id, doc_id FROM docs_amp
  UNION
  SELECT e.b, r.root FROM reach r JOIN edges e ON e.a = r.node
)
SELECT node AS doc_id, min(root) AS canonical_id
FROM reach GROUP BY node
"""


def _bucket_sql(emb_expr: str, num_planes: int, dims: int,
                plane_offset: int = 0) -> str:
    """DuckDB expression for the SAME deterministic hyperplane-LSH
    bucket Spark computes (similarity.lsh_bucket): the hyperplanes are
    pure functions of (plane, dim), so the oracle embeds them as
    double literals — the approximate path becomes fully
    oracle-checkable, not rows-only."""
    from goose_parser_spark.ops.similarity import _hyperplane
    parts = []
    for p in range(num_planes):
        arr = ", ".join(repr(_hyperplane(plane_offset + p, d))
                        for d in range(dims))
        parts.append(
            f"(CASE WHEN list_dot_product({emb_expr}, [{arr}]) >= 0 "
            f"THEN {1 << p} ELSE 0 END)")
    return " + ".join(parts)


def q_dedup_keep_canonical(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end dedup keep-policy: near-dup pairs (MinHash-LSH) →
    connected components → keep only canonical docs. The table a
    training pipeline actually trains on."""
    from goose_parser_spark.ops.dedup import (
        connected_components, keep_canonical)
    docs = _documents_amplified(spark, sf_dir, vary_text=True)
    pairs = minhash_lsh_dedup(docs, n=3, num_hashes=32, bands=32,
                              threshold=0.5)
    clusters = connected_components(docs.select("doc_id"), pairs)
    return keep_canonical(docs.select("doc_id", "text"), clusters)


SQL_DEDUP_KEEP_CANONICAL = SQL_DEDUP_CLUSTERS.replace(
    "SELECT node AS doc_id, min(root) AS canonical_id\nFROM reach GROUP BY node",
    """SELECT d.doc_id, d.text FROM docs_amp d
JOIN (SELECT node AS doc_id, min(root) AS canonical_id
      FROM reach GROUP BY node) c
  ON d.doc_id = c.doc_id AND c.doc_id = c.canonical_id""")


def q_dedup_paragraphs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sub-document dedup stats: per-doc fraction of 10-word chunks
    duplicated anywhere in the corpus (the paragraph-dedup signal;
    boundary-free chunk mode — testdata has no newlines)."""
    from goose_parser_spark.ops.dedup import paragraph_dup_stats
    return paragraph_dup_stats(
        _documents_amplified(spark, sf_dir, vary_text=True),
        chunk_words=10)


SQL_DEDUP_PARAGRAPHS = f"""
WITH {_SQL_DOCS_AMP_VARIED}, tok AS (
  SELECT doc_id, list_filter(string_split(text, ' '), w -> w != '') AS w
  FROM docs_amp
), units AS (
  SELECT doc_id, array_to_string(w[u * 10 + 1 : u * 10 + 10], ' ') AS unit
  FROM (SELECT doc_id, w,
               unnest(range(0, CAST(ceil(len(w) / 10.0) AS BIGINT))) AS u
        FROM tok WHERE len(w) >= 1)
), occ AS (SELECT unit, count(*) AS occ FROM units GROUP BY 1)
SELECT doc_id, count(*) AS n_units,
       count(*) FILTER (occ > 1) AS n_dup_units,
       round(count(*) FILTER (occ > 1) * 1.0 / count(*), 4) AS dup_ratio
FROM units JOIN occ USING (unit)
GROUP BY doc_id
"""


def _lined_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-line corpus for the line-dedup query (testdata text is
    single-line): each doc gets a nav line shared across its source
    group, its (copy-amplified, hence ≥_AMP-duplicated) base text, a
    PAIR line shared by exactly 2 docs, a blank line, a QUAD line
    shared by 4 docs, and a unique DOC line. Every 97th doc is ONLY
    its nav line — all lines banned, exercising empty-doc
    preservation. Mirrored by the SQL ``lined`` CTE."""
    base = _documents_amplified(spark, sf_dir)
    d = F.col("doc_id")
    full = F.concat_ws(
        "\n",
        F.concat(F.lit("NAV "), F.col("source")),
        F.col("text"),
        F.concat(F.lit("PAIR-"), F.expr("CAST(doc_id DIV 2 AS STRING)")),
        F.lit(""),
        F.concat(F.lit("QUAD-"), F.expr("CAST(doc_id DIV 4 AS STRING)")),
        F.concat(F.lit("DOC-"), d.cast("string")),
    )
    nav_only = F.concat(F.lit("NAV "), F.col("source"))
    return base.select(
        "doc_id",
        F.when(d % 97 == 0, nav_only).otherwise(full).alias("text"))


def q_line_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RefinedWeb/CCNet line-level corpus dedup: REMOVE every non-blank
    line occurring in ≥3 distinct documents, reassemble survivors in
    order (ops/dedup.py line_corpus_dedup). Narrow stages only: the
    line-count agg shuffles 8-byte xxhash64 keys, the ban list is an
    anti-join, reassembly is one shuffle by doc id."""
    from goose_parser_spark.ops.dedup import line_corpus_dedup
    return line_corpus_dedup(_lined_docs(spark, sf_dir), min_dup_docs=3)


SQL_LINE_DEDUP = f"""
WITH {_SQL_DOCS_AMP_COPY}, lined AS (
  SELECT doc_id,
         CASE WHEN doc_id % 97 = 0 THEN 'NAV ' || source
              ELSE 'NAV ' || source || chr(10) ||
                   text || chr(10) ||
                   'PAIR-' || CAST(doc_id // 2 AS VARCHAR) || chr(10) ||
                   chr(10) ||
                   'QUAD-' || CAST(doc_id // 4 AS VARCHAR) || chr(10) ||
                   'DOC-' || CAST(doc_id AS VARCHAR)
         END AS text
  FROM docs_amp
), ls AS (
  SELECT doc_id, string_split(text, chr(10)) AS arr FROM lined
), lx AS (
  SELECT doc_id, pos, arr[pos] AS line
  FROM (SELECT doc_id, arr, unnest(range(1, len(arr) + 1)) AS pos FROM ls)
), banned AS (
  SELECT line FROM lx WHERE trim(line) <> ''
  GROUP BY line HAVING count(DISTINCT doc_id) >= 3
)
SELECT d.doc_id,
       coalesce(k.text, '') AS text
FROM (SELECT DISTINCT doc_id FROM lined) d
LEFT JOIN (
  SELECT doc_id, string_agg(line, chr(10) ORDER BY pos) AS text
  FROM lx WHERE line NOT IN (SELECT line FROM banned)
  GROUP BY doc_id
) k USING (doc_id)
"""


def q_dedup_embedding_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup pairs, OR-amplified LSH blocking
    (the shipped scale path: 4 independent bucket tables, a pair is
    scored iff it collides in any table — never the O(n²) self-join;
    VERDICT r01 #3)."""
    from goose_parser_spark.ops.similarity import embedding_cosine_pairs
    return embedding_cosine_pairs(_t(spark, sf_dir, "embeddings"),
                                  threshold=0.45, lsh_prefilter=True,
                                  num_planes=4, num_tables=4, dims=64)


SQL_DEDUP_EMBEDDING_COSINE = f"""
WITH b AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e,
         {_bucket_sql('CAST(embedding AS DOUBLE[])', 4, 64, 0)} AS b0,
         {_bucket_sql('CAST(embedding AS DOUBLE[])', 4, 64, 4)} AS b1,
         {_bucket_sql('CAST(embedding AS DOUBLE[])', 4, 64, 8)} AS b2,
         {_bucket_sql('CAST(embedding AS DOUBLE[])', 4, 64, 12)} AS b3
  FROM embeddings
)
SELECT x.vec_id AS id_a, y.vec_id AS id_b,
       round(list_cosine_similarity(x.e, y.e), 4) AS sim
FROM b x JOIN b y
  ON x.vec_id < y.vec_id
 AND (x.b0 = y.b0 OR x.b1 = y.b1 OR x.b2 = y.b2 OR x.b3 = y.b3)
WHERE round(list_cosine_similarity(x.e, y.e), 4) >= 0.45
"""


def q_dedup_embedding_cosine_exact(spark: SparkSession,
                                   sf_dir: str) -> DataFrame:
    """Exact O(n²) embedding-cosine pairs — the validation BASELINE
    the LSH-blocked default is measured against. Never the path you
    run at corpus scale (cartesian-shaped self-join)."""
    from goose_parser_spark.ops.similarity import embedding_cosine_pairs
    return embedding_cosine_pairs(_t(spark, sf_dir, "embeddings"),
                                  threshold=0.45, lsh_prefilter=False)


SQL_DEDUP_EMBEDDING_COSINE_EXACT = """
SELECT a.vec_id AS id_a, b.vec_id AS id_b,
       round(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                    CAST(b.embedding AS DOUBLE[])), 4) AS sim
FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
WHERE round(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                   CAST(b.embedding AS DOUBLE[])), 4) >= 0.45
"""


def q_simsearch_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH-bucketed ANN (scale path). Oracle-checked: the multi-probe
    set {buckets within Hamming ≤ 2 of the query bucket} is exactly
    the SQL predicate ``bit_count(xor(bucket, qbucket)) <= 2`` over
    the literal-hyperplane bucket expression."""
    emb = _t(spark, sf_dir, "embeddings")
    q = _query_vec(spark, sf_dir)
    return lsh_cosine_topk(emb.where(F.col("vec_id") != 0), q, k=10,
                           num_planes=4, probe_hamming=2)


SQL_SIMSEARCH_LSH = f"""
WITH b AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e,
         {_bucket_sql('CAST(embedding AS DOUBLE[])', 4, 64)} AS bucket
  FROM embeddings
), q AS (SELECT e AS qe, bucket AS qb FROM b WHERE vec_id = 0)
SELECT vec_id, round(list_cosine_similarity(e, qe), 4) AS sim
FROM b, q
WHERE vec_id != 0 AND bit_count(xor(bucket, qb)) <= 2
ORDER BY sim DESC, vec_id
LIMIT 10
"""


def q_simsearch_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF ANN top-k (coarse-quantizer probe; rows-only driver check —
    recall vs brute force is pytest-validated; the Lloyd-trained
    centroids are float aggregates, not SQL-reproducible)."""
    from goose_parser_spark.ops.similarity import ivf_topk
    emb = _t(spark, sf_dir, "embeddings")
    q = _query_vec(spark, sf_dir)
    return ivf_topk(emb.where(F.col("vec_id") != 0), q, k=10,
                    n_centroids=16, n_probe=6, iters=2)


def q_dedup_simhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup pairs within Hamming ≤ 3 via pigeonhole block
    join (exact recall by construction; xxhash64-seeded → no SQL
    oracle, brute-force-equality pytest instead)."""
    from goose_parser_spark.ops.dedup import simhash_pairs
    return simhash_pairs(_documents_amplified(spark, sf_dir, vary_text=True),
                         max_hamming=3)


# --------------------------------------------------------------------------
# Text analysis
# --------------------------------------------------------------------------

def q_text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    return text_stats(_documents_amplified(spark, sf_dir)).drop("quality")


SQL_TEXT_STATS = f"""
WITH {_SQL_DOCS_AMP_COPY}
SELECT doc_id,
       CAST(len(string_split(text, ' ')) AS INTEGER) AS n_tokens,
       CAST(length(text) AS INTEGER) AS n_chars,
       CASE
         WHEN len(list_filter(string_split(text,' '), w -> w IN ('the','a','of','and','to','in','is','it','that','for'))) >= greatest(
              len(list_filter(string_split(text,' '), w -> w IN ('el','la','de','que','y','en','un','es','se','no'))),
              len(list_filter(string_split(text,' '), w -> w IN ('der','die','das','und','ist','in','den','von','zu','mit'))),
              len(list_filter(string_split(text,' '), w -> w IN ('le','la','de','et','les','des','en','un','du','que'))))
          AND len(list_filter(string_split(text,' '), w -> w IN ('the','a','of','and','to','in','is','it','that','for'))) > 0
         THEN 'en'
         WHEN len(list_filter(string_split(text,' '), w -> w IN ('el','la','de','que','y','en','un','es','se','no'))) >= greatest(
              len(list_filter(string_split(text,' '), w -> w IN ('der','die','das','und','ist','in','den','von','zu','mit'))),
              len(list_filter(string_split(text,' '), w -> w IN ('le','la','de','et','les','des','en','un','du','que'))))
          AND len(list_filter(string_split(text,' '), w -> w IN ('el','la','de','que','y','en','un','es','se','no'))) > 0
         THEN 'es'
         WHEN len(list_filter(string_split(text,' '), w -> w IN ('der','die','das','und','ist','in','den','von','zu','mit'))) >=
              len(list_filter(string_split(text,' '), w -> w IN ('le','la','de','et','les','des','en','un','du','que')))
          AND len(list_filter(string_split(text,' '), w -> w IN ('der','die','das','und','ist','in','den','von','zu','mit'))) > 0
         THEN 'de'
         WHEN len(list_filter(string_split(text,' '), w -> w IN ('le','la','de','et','les','des','en','un','du','que'))) > 0
         THEN 'fr'
         ELSE 'und'
       END AS lang_pred,
       md5(text) AS fingerprint
FROM docs_amp
"""


def q_text_subword_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE-ish token-count proxy (letter runs + digit runs + marks)."""
    from goose_parser_spark.ops.textstats import subword_count
    docs = _documents_amplified(spark, sf_dir)
    return docs.select("doc_id", subword_count("text").alias("n_subwords"))


SQL_TEXT_SUBWORD_COUNT = f"""
WITH {_SQL_DOCS_AMP_COPY}
SELECT doc_id,
       CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]'))
            AS INTEGER) AS n_subwords
FROM docs_amp
"""


def q_text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    from goose_parser_spark.ops.textstats import quality_score
    docs = _documents_amplified(spark, sf_dir)
    return docs.select("doc_id", quality_score("text").alias("quality"))


SQL_TEXT_QUALITY = f"""
WITH {_SQL_DOCS_AMP_COPY}
SELECT doc_id,
  round(least(1.0,
    (len(list_filter(string_split(text,' '), w -> w IN
       ('the','a','of','and','to','in','is','it','that','for')))
     * 1.0 / len(string_split(text,' '))) * 2.0 * 0.4
    + (CASE WHEN length(text) * 1.0 / len(string_split(text,' '))
            BETWEEN 3 AND 10 THEN 1.0 ELSE 0.5 END) * 0.3
    + (length(regexp_replace(text, '[^A-Za-z ]', '', 'g')) * 1.0
       / length(text)) * 0.3
  ), 6) AS quality
FROM docs_amp
"""


def q_text_top_ngrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-wide top-20 word trigrams — the corpus-analysis staple
    (n-gram frequency tables for contamination checks / LM stats).
    One explode + one count agg + TakeOrdered; ties break on the
    ngram text for cross-engine determinism."""
    from goose_parser_spark.ops.dedup import shingles, tokens
    docs = _documents_amplified(spark, sf_dir)
    grams = (docs.where(F.size(tokens("text")) >= 3)
             .select(F.explode(shingles("text", 3)).alias("ngram")))
    return (grams.groupBy("ngram").agg(F.count("*").alias("n"))
            .orderBy(F.col("n").desc(), F.col("ngram").asc())
            .limit(20))


SQL_TEXT_TOP_NGRAMS = f"""
WITH {_SQL_DOCS_AMP_COPY}, tok AS (
  SELECT doc_id, string_split(text, ' ') AS w FROM docs_amp
  WHERE len(string_split(text, ' ')) >= 3
), grams AS (
  SELECT array_to_string(w[u:u+2], ' ') AS ngram
  FROM (SELECT doc_id, w, unnest(range(1, len(w) - 1)) AS u FROM tok)
)
SELECT ngram, count(*) AS n FROM grams
GROUP BY ngram ORDER BY n DESC, ngram ASC LIMIT 20
"""


def q_text_gopher_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style quality rules (Rae et al. 2021 App. A subset):
    per-doc signals + keep verdict, shuffle-free projection."""
    from goose_parser_spark.ops.textstats import gopher_quality
    return gopher_quality(_documents_amplified(spark, sf_dir))


SQL_TEXT_GOPHER_QUALITY = rf"""
WITH {_SQL_DOCS_AMP_COPY}, base AS (
  SELECT doc_id, text,
         list_filter(string_split(text, ' '), w -> w != '') AS words,
         string_split(text, chr(10)) AS lines
  FROM docs_amp
), sig AS (
  SELECT doc_id,
    len(words) AS n_words,
    round(CASE WHEN len(words) > 0
          THEN list_sum(list_transform(words, w -> length(w))) * 1.0 / len(words)
          ELSE 0.0 END, 4) AS mean_word_len,
    round(CASE WHEN length(text) > 0
          THEN len(regexp_extract_all(text, '[^A-Za-z0-9\s]')) * 1.0 / length(text)
          ELSE 0.0 END, 4) AS symbol_ratio,
    round(len(list_filter(lines, l -> regexp_matches(l, '^\s*[-*•]'))) * 1.0
          / len(lines), 4) AS bullet_ratio,
    round(len(list_filter(lines, l -> regexp_matches(l, '(\.\.\.|…)\s*$'))) * 1.0
          / len(lines), 4) AS ellipsis_ratio,
    len(list_filter(string_split(text, ' '), w -> w IN
        ('the','a','of','and','to','in','is','it','that','for'))) AS stopword_hits
  FROM base
)
SELECT doc_id, CAST(n_words AS INTEGER) AS n_words, mean_word_len,
       symbol_ratio, bullet_ratio,
       ellipsis_ratio, CAST(stopword_hits AS INTEGER) AS stopword_hits,
       (n_words BETWEEN 50 AND 100000
        AND mean_word_len BETWEEN 3.0 AND 10.0
        AND symbol_ratio <= 0.1 AND bullet_ratio <= 0.9
        AND ellipsis_ratio <= 0.3 AND stopword_hits >= 2) AS keep
FROM sig
"""


def q_text_tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 TF-IDF terms per document (explode → tf agg → df agg →
    idf join → per-doc window; narrow shuffle keys, never the text)."""
    from goose_parser_spark.ops.textstats import tfidf_top_terms
    return tfidf_top_terms(_documents_amplified(spark, sf_dir), k=3)


SQL_TEXT_TFIDF_TOP_TERMS = f"""
WITH {_SQL_DOCS_AMP_COPY}, tok AS (
  SELECT doc_id,
         unnest(list_filter(string_split(text, ' '), w -> w != '')) AS term
  FROM docs_amp
), tf AS (
  SELECT doc_id, term, count(*) AS tf FROM tok GROUP BY 1, 2
), dfreq AS (
  SELECT term, count(*) AS df_ FROM tf GROUP BY 1
), n AS (SELECT count(DISTINCT doc_id) AS n_docs FROM docs_amp)
SELECT doc_id, term, round(score, 4) AS score,
       CAST(rank AS INTEGER) AS rank FROM (
  SELECT tf.doc_id, tf.term,
         tf.tf * ln(n_docs * 1.0 / df_) AS score,
         row_number() OVER (PARTITION BY tf.doc_id
                            ORDER BY tf.tf * ln(n_docs * 1.0 / df_) DESC,
                                     tf.term ASC) AS rank
  FROM tf JOIN dfreq USING (term) CROSS JOIN n
) WHERE rank <= 3
"""


# --------------------------------------------------------------------------
# Multimodal plumbing
# --------------------------------------------------------------------------

def q_multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary payload → Arrow-batched feature extraction (decode step
    stubbed; byte-level metadata oracle-checked)."""
    docs = _documents_amplified(spark, sf_dir)
    with_payload = attach_payload(docs)
    feats = extract_features(with_payload)
    meta = with_payload.select(
        "doc_id", F.col("media_meta.sha256").alias("payload_sha256"))
    return (feats.join(meta, "doc_id")
            .select("doc_id", "n_bytes", "payload_sha256"))


SQL_MULTIMODAL_FEATURES = f"""
WITH {_SQL_DOCS_AMP_COPY}
SELECT doc_id,
       octet_length(encode(text)) AS n_bytes,
       sha256(text) AS payload_sha256
FROM docs_amp
"""


# --------------------------------------------------------------------------
# Main-content extraction (north rule: boilerplate strip, PDF parse)
# --------------------------------------------------------------------------

def _boilerplate_pages(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pages with heavy chrome (nav/sidebar/footer, link soup) around
    an <article> holding the document text — the boilerplate-strip
    heuristic must recover exactly the article text."""
    docs = _documents_amplified(spark, sf_dir)
    html = F.concat(
        F.lit('<html><body><div class="header nav">'
              '<a href="/">Home</a><a href="/a">About</a>'
              '<a href="/b">Products</a><a href="/c">Contact</a></div>'
              '<div id="sidebar"><a href="/x">Trending now</a>'
              '<a href="/y">Most read stories</a>'
              '<a href="/z">Subscribe today</a></div>'
              '<article class="content"><p>'),
        F.col("text"),
        F.lit('</p></article>'
              '<div class="footer">© 2025 Example'
              '<a href="/t">Terms</a><a href="/p">Privacy</a></div>'
              "</body></html>"),
    )
    return docs.select(
        F.concat(F.lit("https://docs.test/"), F.col("doc_id").cast("string"))
         .alias("url"),
        html.alias("html"),
    )


def q_maincontent_strip(spark: SparkSession, sf_dir: str) -> DataFrame:
    from goose_parser_spark.ops.maincontent import extract_main_content
    pages = _boilerplate_pages(spark, sf_dir)
    return extract_main_content(pages).select("url", "main_text")


SQL_MAINCONTENT_STRIP = f"""
WITH {_SQL_DOCS_AMP_COPY}
SELECT 'https://docs.test/' || doc_id AS url, text AS main_text
FROM docs_amp
"""


def q_extract_markdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HTML→Markdown structured-text extraction (ops/maincontent.py):
    headings/lists/links serialized to the plain-text-with-structure
    form LLM corpora keep. Oracle reconstructs the markdown string
    relationally from the synthesized page structure."""
    from goose_parser_spark.ops.maincontent import extract_markdown
    docs = _documents_amplified(spark, sf_dir)
    s = F.col("doc_id").cast("string")
    html = F.concat(
        F.lit("<html><body><h1>doc "), s, F.lit("</h1><p>"),
        F.col("text"),
        F.lit(' <a href="/s/'), s, F.lit('">src</a></p><ul><li>'),
        F.col("lang"), F.lit("</li><li>"), F.col("source"),
        F.lit("</li></ul></body></html>"))
    pages = docs.select(
        F.concat(F.lit("https://docs.test/"), s).alias("url"),
        html.alias("html"))
    return extract_markdown(pages).select("url", "markdown")


SQL_EXTRACT_MARKDOWN = f"""
WITH {_SQL_DOCS_AMP_COPY}
SELECT 'https://docs.test/' || doc_id AS url,
       '# doc ' || doc_id || chr(10) || chr(10) ||
       text || ' [src](/s/' || doc_id || ')' || chr(10) || chr(10) ||
       '- ' || lang || chr(10) || '- ' || source AS markdown
FROM docs_amp
"""


def q_extract_tables(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HTML <table> → relational rows (ops/maincontent.html_tables):
    the table-to-text feed of a training corpus. Authored pages carry
    a header table (th row + two td rows with leading/trailing
    whitespace to exercise cell trimming) and a second single-cell
    table to pin document-order table numbering; the oracle states
    all four expected rows per page relationally."""
    from goose_parser_spark.ops.maincontent import extract_tables
    docs = _documents_amplified(spark, sf_dir)
    s = F.col("doc_id").cast("string")
    html = F.concat(
        F.lit("<html><body><table><tr><th>k</th><th>v</th></tr>"
              "<tr><td>lang</td><td>"), F.col("lang"),
        F.lit("</td></tr><tr><td>source</td><td> "), F.col("source"),
        F.lit(" </td></tr></table><p>between</p><table><tr><td>"), s,
        F.lit("</td></tr></table></body></html>"))
    pages = docs.select(
        F.concat(F.lit("https://tables.test/"), s).alias("url"),
        html.alias("html"))
    return extract_tables(pages).select(
        "url", "table_no", "row_no", "is_header", "n_cols", "cells")


SQL_EXTRACT_TABLES = f"""
WITH {_SQL_DOCS_AMP_COPY}
SELECT 'https://tables.test/' || doc_id AS url, t.*
FROM docs_amp, LATERAL (
  SELECT 0 AS table_no, 0 AS row_no, TRUE AS is_header, 2 AS n_cols,
         'k' || chr(9) || 'v' AS cells
  UNION ALL
  SELECT 0, 1, FALSE, 2, 'lang' || chr(9) || lang
  UNION ALL
  SELECT 0, 2, FALSE, 2, 'source' || chr(9) || source
  UNION ALL
  SELECT 1, 0, FALSE, 1, CAST(doc_id AS VARCHAR)
) t
"""


def q_pdf_pages(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PDF/layout plumbing: binary payloads → per-page text rows
    (codec stubbed deterministically — ops/layout.py)."""
    from goose_parser_spark.ops.layout import extract_pdf_pages
    docs = _documents_amplified(spark, sf_dir)
    with_payload = docs.select(
        "doc_id", F.encode(F.col("text"), "utf-8").alias("payload"))
    return extract_pdf_pages(with_payload)


SQL_PDF_PAGES = f"""
WITH {_SQL_DOCS_AMP_COPY}
SELECT doc_id,
       CAST(u AS INT) AS page_no,
       substring(text, u * 512 + 1, 512) AS page_text,
       CAST(ceil(greatest(length(text), 1) / 512.0) AS INT) AS n_pages
FROM (
  SELECT doc_id, text,
         unnest(range(0, CAST(ceil(greatest(length(text), 1) / 512.0) AS BIGINT))) AS u
  FROM docs_amp
)
"""


# --------------------------------------------------------------------------
# Windowed / relational breadth
# --------------------------------------------------------------------------

def q_url_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL host / normalization / registered-domain over a deterministic
    url mix (scheme case, default vs explicit ports, trailing slashes,
    fragments, multi-label public suffixes, PSL wildcard `*.ck`,
    exception `!www.ck`, and .jp geographic rules — VERDICT r02 #5).
    The oracle states the hand-computed expected values per variant — a
    true specification check, not a re-implementation."""
    from goose_parser_spark.ops.urls import (
        registered_domain_psl, url_host, url_normalize,
    )
    docs = _documents_amplified(spark, sf_dir)
    v = F.col("doc_id") % 14
    s = F.col("doc_id").cast("string")
    url = (F.when(v == 0, F.concat(F.lit("https://WWW.Example.COM:443/a"), s, F.lit("/?x=1#f")))
            .when(v == 1, F.concat(F.lit("http://news.site.co.uk:80/p"), s, F.lit("/")))
            .when(v == 2, F.concat(F.lit("http://sub.blog.org:8080/"), s))
            .when(v == 3, F.concat(F.lit("https://example.com.au/x"), s, F.lit("#y")))
            .when(v == 4, F.concat(F.lit("ftp://Files.Archive.net/data"), s))
            .when(v == 5, F.concat(F.lit("https://single"), s, F.lit("/?q=")))
            .when(v == 6, F.concat(F.lit("https://shop.example.com.sg/p"), s))
            .when(v == 7, F.concat(F.lit("http://blog.kiwi.co.nz:80/p"), s, F.lit("/")))
            .when(v == 8, F.concat(F.lit("https://portal.gob.mx/x"), s))
            .when(v == 9, F.concat(F.lit("https://www.uni.ac.za:8443/d"), s, F.lit("#frag")))
            # PSL wildcard *.ck: tours.ck is itself a public suffix
            .when(v == 10, F.concat(F.lit("https://shop.tours.ck/x"), s))
            # PSL exception !www.ck: registrable despite *.ck
            .when(v == 11, F.concat(F.lit("http://a.www.ck/p"), s))
            # .jp designated-city exception !city.kawasaki.jp
            .when(v == 12, F.concat(F.lit("https://foo.city.kawasaki.jp/q"), s))
            # .jp prefecture (normal 2-label geographic suffix aichi.jp)
            .otherwise(F.concat(F.lit("https://blog.pref.aichi.jp/r"), s)))
    base = docs.select(
        "doc_id", url.alias("url"),
        url_host(url).alias("host"),
        url_normalize(url).alias("norm"))
    return (registered_domain_psl(base, "url")
            .select("doc_id", "host", "norm", "domain"))


SQL_URL_OPS = f"""
WITH {_SQL_DOCS_AMP_COPY}
SELECT doc_id,
  CASE doc_id % 14
    WHEN 0 THEN 'www.example.com'
    WHEN 1 THEN 'news.site.co.uk'
    WHEN 2 THEN 'sub.blog.org'
    WHEN 3 THEN 'example.com.au'
    WHEN 4 THEN 'files.archive.net'
    WHEN 5 THEN 'single' || doc_id
    WHEN 6 THEN 'shop.example.com.sg'
    WHEN 7 THEN 'blog.kiwi.co.nz'
    WHEN 8 THEN 'portal.gob.mx'
    WHEN 9 THEN 'www.uni.ac.za'
    WHEN 10 THEN 'shop.tours.ck'
    WHEN 11 THEN 'a.www.ck'
    WHEN 12 THEN 'foo.city.kawasaki.jp'
    ELSE 'blog.pref.aichi.jp'
  END AS host,
  CASE doc_id % 14
    WHEN 0 THEN 'https://www.example.com/a' || doc_id || '?x=1'
    WHEN 1 THEN 'http://news.site.co.uk/p' || doc_id
    WHEN 2 THEN 'http://sub.blog.org:8080/' || doc_id
    WHEN 3 THEN 'https://example.com.au/x' || doc_id
    WHEN 4 THEN 'ftp://files.archive.net/data' || doc_id
    WHEN 5 THEN 'https://single' || doc_id || '?q='
    WHEN 6 THEN 'https://shop.example.com.sg/p' || doc_id
    WHEN 7 THEN 'http://blog.kiwi.co.nz/p' || doc_id
    WHEN 8 THEN 'https://portal.gob.mx/x' || doc_id
    WHEN 9 THEN 'https://www.uni.ac.za:8443/d' || doc_id
    WHEN 10 THEN 'https://shop.tours.ck/x' || doc_id
    WHEN 11 THEN 'http://a.www.ck/p' || doc_id
    WHEN 12 THEN 'https://foo.city.kawasaki.jp/q' || doc_id
    ELSE 'https://blog.pref.aichi.jp/r' || doc_id
  END AS norm,
  CASE doc_id % 14
    WHEN 0 THEN 'example.com'
    WHEN 1 THEN 'site.co.uk'
    WHEN 2 THEN 'blog.org'
    WHEN 3 THEN 'example.com.au'
    WHEN 4 THEN 'archive.net'
    WHEN 5 THEN 'single' || doc_id
    WHEN 6 THEN 'example.com.sg'
    WHEN 7 THEN 'kiwi.co.nz'
    WHEN 8 THEN 'portal.gob.mx'
    WHEN 9 THEN 'uni.ac.za'
    WHEN 10 THEN 'shop.tours.ck'
    WHEN 11 THEN 'www.ck'
    WHEN 12 THEN 'city.kawasaki.jp'
    ELSE 'pref.aichi.jp'
  END AS domain
FROM docs_amp
"""


def q_events_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization (30 min) — the streaming-ish stateful
    op expressed as windows over the static table."""
    events = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.unix_timestamp("ts") - F.unix_timestamp(F.lag("ts").over(w))
    flagged = events.withColumn(
        "is_new", F.when(gap.isNull() | (gap > 1800), 1).otherwise(0))
    sess = flagged.withColumn(
        "session_id",
        F.sum("is_new").over(w.rowsBetween(Window.unboundedPreceding, 0)))
    return (sess.groupBy("user_id")
            .agg(F.countDistinct("session_id").alias("n_sessions"),
                 F.count("*").alias("n_events")))


SQL_EVENTS_SESSIONIZE = """
WITH flagged AS (
  SELECT user_id, ts, event_id,
         CASE WHEN lag(ts) OVER w IS NULL
                OR epoch(ts) - epoch(lag(ts) OVER w) > 1800
              THEN 1 ELSE 0 END AS is_new
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), sess AS (
  SELECT user_id,
         sum(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                           ROWS UNBOUNDED PRECEDING) AS session_id
  FROM flagged
)
SELECT user_id, count(DISTINCT session_id) AS n_sessions,
       count(*) AS n_events
FROM sess GROUP BY user_id
"""


def q_events_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join (ops/asof.py): each purchase joined to the most
    recent prior-or-simultaneous click by the same user (the
    attribution staple). Right side pre-deduped to max event_id per
    (user, ts) so ties are deterministic; oracle is DuckDB's NATIVE
    ASOF LEFT JOIN — an independent implementation."""
    from goose_parser_spark.ops.asof import asof_join
    events = _t(spark, sf_dir, "events")
    purchases = (events.where(F.col("event_type") == "purchase")
                 .select("user_id", "ts", "event_id"))
    clicks = (events.where(F.col("event_type") == "click")
              .groupBy("user_id", "ts")
              .agg(F.max("event_id").alias("click_id")))
    return (asof_join(purchases, clicks, "user_id", "ts",
                      value_cols=["click_id"])
            .select("user_id", "ts", "event_id",
                    F.col("click_id_asof").alias("click_id")))


SQL_EVENTS_ASOF_JOIN = """
SELECT p.user_id, p.ts, p.event_id, c.click_id
FROM (SELECT user_id, ts, event_id FROM events
      WHERE event_type = 'purchase') p
ASOF LEFT JOIN (SELECT user_id, ts, max(event_id) AS click_id
                FROM events WHERE event_type = 'click'
                GROUP BY 1, 2) c
  ON p.user_id = c.user_id AND p.ts >= c.ts
"""


def q_events_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval join (ops/asof.py range_join): each error event joined
    to its user's first-activity hour window. Bucketized equi-join —
    never a per-key nested loop."""
    from goose_parser_spark.ops.asof import range_join
    events = _t(spark, sf_dir, "events")
    intervals = (events.groupBy("user_id")
                 .agg(F.min("ts").alias("win_start"))
                 .withColumn("win_end",
                             F.col("win_start") + F.expr("INTERVAL 1 HOUR")))
    errors = (events.where(F.col("event_type") == "error")
              .select("user_id", "ts", "event_id"))
    return (range_join(errors, intervals, "user_id", "ts",
                       "win_start", "win_end", bucket_seconds=3600)
            .select("user_id", "event_id", "ts", "win_start"))


SQL_EVENTS_RANGE_JOIN = """
WITH iv AS (
  SELECT user_id, min(ts) AS win_start,
         min(ts) + INTERVAL 1 HOUR AS win_end
  FROM events GROUP BY user_id
)
SELECT e.user_id, e.event_id, e.ts, iv.win_start
FROM events e JOIN iv ON e.user_id = iv.user_id
 AND e.ts >= iv.win_start AND e.ts <= iv.win_end
WHERE e.event_type = 'error'
"""


def q_events_rollups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hypertable-style cascading time rollup (ops/asof.py
    time_rollups): per-event-type counts at 1m/1h/1d, coarser levels
    re-aggregated from the finest — one raw scan total."""
    from goose_parser_spark.ops.asof import time_rollups
    events = _t(spark, sf_dir, "events")
    return time_rollups(events, "ts", ["event_type"],
                        granularities_seconds=(60, 3600, 86400))


SQL_EVENTS_ROLLUPS = """
SELECT to_timestamp(CAST(floor(epoch(ts) / 60) AS BIGINT) * 60)::TIMESTAMP
         AS bucket_start,
       60 AS granularity_seconds, event_type, count(*) AS n
FROM events GROUP BY 1, 3
UNION ALL
SELECT to_timestamp(CAST(floor(epoch(ts) / 3600) AS BIGINT) * 3600)::TIMESTAMP,
       3600, event_type, count(*) FROM events GROUP BY 1, 3
UNION ALL
SELECT to_timestamp(CAST(floor(epoch(ts) / 86400) AS BIGINT) * 86400)::TIMESTAMP,
       86400, event_type, count(*) FROM events GROUP BY 1, 3
"""


def q_redact_pii(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrub (ops/textstats.redact_pii): emails / IPv4 / phone
    runs replaced by tokens; patterns are RE2-compatible so the oracle
    runs the IDENTICAL regexes."""
    from goose_parser_spark.ops.textstats import redact_pii
    docs = _documents_amplified(spark, sf_dir)
    s = F.col("doc_id").cast("string")
    salted = F.concat(
        F.col("text"), F.lit(" contact user"), s, F.lit("@ex.com at 10.0."),
        (F.col("doc_id") % 200).cast("string"), F.lit("."),
        ((F.col("doc_id") * 7) % 250).cast("string"),
        F.lit(" or +1-555-00"), (F.col("doc_id") % 90 + 10).cast("string"))
    return docs.select("doc_id", redact_pii(salted).alias("clean"))


SQL_REDACT_PII = f"""
WITH {_SQL_DOCS_AMP_COPY}
SELECT doc_id,
  regexp_replace(
    regexp_replace(
      regexp_replace(
        text || ' contact user' || doc_id || '@ex.com at 10.0.'
             || (doc_id % 200) || '.' || ((doc_id * 7) % 250)
             || ' or +1-555-00' || (doc_id % 90 + 10),
        '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{{2,}}', '<EMAIL>', 'g'),
      '\\b\\d{{1,3}}\\.\\d{{1,3}}\\.\\d{{1,3}}\\.\\d{{1,3}}\\b', '<IP>', 'g'),
    '(?:\\+\\d[\\d ()-]{{6,16}}\\d|\\b\\d{{3}}[-. ]\\d{{3}}[-. ]\\d{{4}}\\b)',
    '<PHONE>', 'g') AS clean
FROM docs_amp
"""


def q_events_windowed_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 5-minute window counts per event type — the batch
    analog of streaming/ingest.stream_windowed_counts (same F.window
    expression the watermarked stream uses)."""
    events = _t(spark, sf_dir, "events")
    return (events.groupBy(F.window("ts", "5 minutes"), "event_type")
            .agg(F.count("*").alias("n"))
            .select(F.col("window.start").alias("window_start"),
                    F.col("event_type"), F.col("n")))


SQL_EVENTS_WINDOWED_COUNTS = """
SELECT CAST(to_timestamp(floor(epoch(ts) / 300) * 300) AS TIMESTAMP)
         AS window_start,
       event_type, count(*) AS n
FROM events
GROUP BY 1, 2
"""


def q_rel_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1-style aggregate (decimal-exact sums)."""
    li = _t(spark, sf_dir, "lineitem")
    return (li.where(F.col("l_shipdate") <= F.lit("1998-09-02"))
            .groupBy("l_returnflag", "l_linestatus")
            .agg(
                F.sum(F.col("l_quantity").cast("decimal(18,2)"))
                 .cast("decimal(18,2)").cast("string").alias("sum_qty"),
                F.sum(F.col("l_extendedprice").cast("decimal(18,2)"))
                 .cast("decimal(18,2)").cast("string").alias("sum_price"),
                F.count("*").alias("cnt"),
            ))


SQL_REL_AGG = """
SELECT l_returnflag, l_linestatus,
       CAST(CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DECIMAL(18,2))
            AS VARCHAR) AS sum_qty,
       CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DECIMAL(18,2))
            AS VARCHAR) AS sum_price,
       count(*) AS cnt
FROM lineitem
WHERE l_shipdate <= DATE '1998-09-02'
GROUP BY l_returnflag, l_linestatus
"""


def q_rel_broadcast_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Star join with explicit broadcast of the small dims."""
    orders = _t(spark, sf_dir, "orders")
    customer = _t(spark, sf_dir, "customer")
    nation = _t(spark, sf_dir, "nation")
    return (orders
            .join(F.broadcast(customer),
                  orders.o_custkey == customer.c_custkey)
            .join(F.broadcast(nation),
                  customer.c_nationkey == nation.n_nationkey)
            .groupBy("n_name")
            .agg(F.count("*").alias("n_orders"),
                 F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
                  .cast("decimal(18,2)").cast("string").alias("total")))


SQL_REL_BROADCAST_JOIN = """
SELECT n_name, count(*) AS n_orders,
       CAST(CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DECIMAL(18,2))
            AS VARCHAR) AS total
FROM orders
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
GROUP BY n_name
"""


def q_sample_by_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 10% corpus sample via md5-threshold on doc_id
    (ops/sampling.py): reproducible across engines/reruns — the oracle
    derives the EXACT same subset. At scale: a scan-level filter."""
    from goose_parser_spark.ops.sampling import sample_by_hash
    docs = _documents_amplified(spark, sf_dir)
    return sample_by_hash(docs.select("doc_id", "lang"), "doc_id",
                          rate=0.1, salt="s1")


SQL_SAMPLE_BY_HASH = f"""
WITH {_SQL_DOCS_AMP_COPY}
SELECT doc_id, lang FROM docs_amp
WHERE substr(md5(CAST(doc_id AS VARCHAR) || 's1'), 1, 8) < '19999999'
"""


def q_domain_quota(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group cap (stratified sampling / per-domain data budget):
    first 40 docs per source, ordered by doc_id. WindowGroupLimit
    pre-trims below the exchange (plan-audited)."""
    from goose_parser_spark.ops.sampling import per_domain_quota
    docs = _documents_amplified(spark, sf_dir)
    return per_domain_quota(docs.select("doc_id", "source"),
                            "source", "doc_id", quota=40)


SQL_DOMAIN_QUOTA = f"""
WITH {_SQL_DOCS_AMP_COPY}
SELECT doc_id, source FROM (
  SELECT doc_id, source,
         row_number() OVER (PARTITION BY source ORDER BY doc_id) AS rn
  FROM docs_amp
) WHERE rn <= 40
"""


def q_winnow_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowing (MOSS) passage fingerprints: md5-hex k-gram hashes,
    min per sliding window, distinct per doc — the local-overlap /
    contamination detector (ops/dedup.py)."""
    from goose_parser_spark.ops.dedup import winnow_fingerprints
    docs = _documents_amplified(spark, sf_dir, vary_text=True)
    return winnow_fingerprints(docs, k=3, window=4)


SQL_WINNOW_FINGERPRINTS = f"""
WITH {_SQL_DOCS_AMP_VARIED}, tok AS (
  SELECT doc_id, string_split(text, ' ') AS w FROM docs_amp
  WHERE len(string_split(text, ' ')) >= 3
), h AS (
  SELECT doc_id,
         list_transform(generate_series(1, len(w) - 2),
                        u -> substr(md5(array_to_string(w[u:u+2], ' ')), 1, 16))
             AS hs
  FROM tok
)
SELECT doc_id, unnest(list_distinct(
         list_transform(generate_series(1, len(hs) - 3),
                        i -> list_min(hs[i:i+3])))) AS fp
FROM h WHERE len(hs) >= 4
"""


def q_text_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher repetition signals: per-doc bigram concentration
    (ops/textstats.py). Narrow (doc, gram) shuffle keys."""
    from goose_parser_spark.ops.textstats import repetition_stats
    return repetition_stats(_documents_amplified(spark, sf_dir))


SQL_TEXT_REPETITION = f"""
WITH {_SQL_DOCS_AMP_COPY}, tok AS (
  SELECT doc_id, string_split(text, ' ') AS w FROM docs_amp
  WHERE len(string_split(text, ' ')) >= 2
), grams AS (
  SELECT doc_id, array_to_string(w[u:u+1], ' ') AS g
  FROM (SELECT doc_id, w, unnest(range(1, len(w))) AS u FROM tok)
), per_gram AS (
  SELECT doc_id, g, count(*) AS c FROM grams GROUP BY 1, 2
)
SELECT doc_id,
       CAST(sum(c) AS BIGINT) AS n_bigrams,
       max(c) AS top_bigram_n,
       round(max(c) * 1.0 / sum(c), 4) AS top_bigram_frac,
       round(1 - count(*) * 1.0 / sum(c), 4) AS dup_bigram_frac
FROM per_gram GROUP BY doc_id
"""


def _link_pages(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pages with a deterministic set of anchor links per document."""
    docs = _documents_amplified(spark, sf_dir)
    s = F.col("doc_id").cast("string")
    html = F.concat(
        F.lit('<html><body><p class="lnk"><a href="/u/'), s,
        F.lit('/a">anchor a '), s, F.lit("</a></p>"),
        F.lit('<p class="lnk"><a href="/u/'), s,
        F.lit('/b">anchor b '), s, F.lit("</a></p>"),
        F.when(F.col("doc_id") % 3 == 0, F.concat(
            F.lit('<p class="lnk"><a href="https://ext.test/'), s,
            F.lit('">ext '), s, F.lit("</a></p>"))).otherwise(F.lit("")),
        F.lit("</body></html>"))
    return docs.select(
        F.concat(F.lit("https://docs.test/"), s).alias("url"),
        html.alias("html"))


def q_extract_links(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Link/anchor-text extraction through the DOM engine (grid rule
    over anchors + attr) — the web-graph building block (outlink
    tables, anchor-text corpora)."""
    pages = _link_pages(spark, sf_dir)
    rules = {"scope": "p.lnk", "collection": [[
        {"name": "href", "scope": "a", "attr": "href"},
        {"name": "anchor", "scope": "a"},
    ]]}
    out = extract(pages, rules)
    return out.select("url", F.inline("extracted"))


SQL_EXTRACT_LINKS = f"""
WITH {_SQL_DOCS_AMP_COPY}
SELECT 'https://docs.test/' || doc_id AS url,
       '/u/' || doc_id || '/a' AS href, 'anchor a ' || doc_id AS anchor
FROM docs_amp
UNION ALL
SELECT 'https://docs.test/' || doc_id AS url,
       '/u/' || doc_id || '/b' AS href, 'anchor b ' || doc_id AS anchor
FROM docs_amp
UNION ALL
SELECT 'https://docs.test/' || doc_id AS url,
       'https://ext.test/' || doc_id AS href, 'ext ' || doc_id AS anchor
FROM docs_amp WHERE doc_id % 3 = 0
"""


def _meta_pages(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pages with deterministic head metadata: every 7th doc omits the
    OpenGraph tags, every 11th carries a MALFORMED JSON-LD block (the
    probe must yield NULL, never fail the scan)."""
    base = _documents_amplified(spark, sf_dir)
    d = F.col("doc_id")
    s = d.cast("string")
    jsonld = F.concat(
        F.lit('<script type="application/ld+json">'
              '{"@type": "Article", "name": "Doc '), s,
        F.lit('"}</script>'))
    bad = F.lit('<script type="application/ld+json">{oops</script>')
    og = F.concat(
        F.lit('<meta property="og:title" content="OG '), s, F.lit('">'),
        F.lit('<meta property="og:type" content="article">'),
        F.lit('<meta property="og:image" content="https://img.test/'),
        s, F.lit('.jpg">'))
    head = F.concat(
        F.lit("<html><head><title>Doc "), s, F.lit("</title>"),
        F.lit('<link rel="canonical" href="https://site.test/c/'), s,
        F.lit('">'),
        F.lit('<meta name="description" content="About topic '),
        (d % 17).cast("string"), F.lit('">'),
        F.when(d % 7 == 0, F.lit("")).otherwise(og),
        F.when(d % 11 == 0, bad).otherwise(jsonld),
        F.lit("</head><body><p>x</p></body></html>"))
    return base.select(
        F.concat(F.lit("https://site.test/p/"), s).alias("url"),
        F.encode(head, "utf-8").alias("html"))


def q_extract_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Page-metadata extraction (title / canonical / OpenGraph /
    JSON-LD probe) through the canned METADATA_RULES tree
    (ops/metadata.py) — attribute selectors + attr rules + array rules
    + RAWTEXT script content + JVM-side get_json_object in one pass.
    Map-only."""
    from goose_parser_spark.ops.metadata import extract_page_metadata
    return extract_page_metadata(_meta_pages(spark, sf_dir))


SQL_EXTRACT_METADATA = f"""
WITH {_SQL_DOCS_AMP_COPY}
SELECT 'https://site.test/p/' || doc_id AS url,
       'Doc ' || doc_id AS title,
       'https://site.test/c/' || doc_id AS canonical,
       'About topic ' || (doc_id % 17) AS description,
       CASE WHEN doc_id % 7 = 0 THEN '' ELSE 'OG ' || doc_id END
           AS og_title,
       CASE WHEN doc_id % 7 = 0 THEN '' ELSE 'article' END AS og_type,
       CASE WHEN doc_id % 7 = 0 THEN ''
            ELSE 'https://img.test/' || doc_id || '.jpg' END AS og_image,
       '' AS og_url,
       CAST(1 AS INT) AS n_jsonld,
       CASE WHEN doc_id % 11 = 0 THEN NULL ELSE 'Article' END
           AS jsonld_type,
       CASE WHEN doc_id % 11 = 0 THEN NULL ELSE 'Doc ' || doc_id END
           AS jsonld_name
FROM docs_amp
"""


def _sitemap_pages(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Synthesized sitemap corpus: every 10th doc is a sitemap INDEX
    page (pointer to a sub-sitemap), the rest are urlset pages with
    two entries — the second entry omits every optional tag. Mirrored
    by SQL_SITEMAP_PARSE's direct reconstruction."""
    base = _documents_amplified(spark, sf_dir)
    d = F.col("doc_id")
    s = d.cast("string")
    urlset = F.concat(
        F.lit('<?xml version="1.0" encoding="UTF-8"?>'
              '<urlset xmlns="http://www.sitemaps.org/schemas/'
              'sitemap/0.9">'),
        F.lit("<url><loc>https://site.test/p/"), s, F.lit("</loc>"),
        F.lit("<lastmod>2024-01-"),
        F.lpad(((d % 28) + 1).cast("string"), 2, "0"),
        F.lit("</lastmod><changefreq>daily</changefreq><priority>0."),
        (d % 9).cast("string"), F.lit("</priority></url>"),
        F.lit("<url><loc>https://site.test/q/"), s,
        F.lit("</loc></url></urlset>"))
    index = F.concat(
        F.lit('<?xml version="1.0"?><sitemapindex><sitemap>'
              "<loc>https://site.test/sm/"), s,
        F.lit(".xml</loc><lastmod>2024-02-02</lastmod>"
              "</sitemap></sitemapindex>"))
    return base.select(
        F.concat(F.lit("https://site.test/sitemap/"), s).alias("url"),
        F.when(d % 10 == 0, index).otherwise(urlset).alias("html"))


def q_sitemap_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sitemap/sitemap-index parsing THROUGH the extraction engine
    (ops/crawl.py sitemap_urls — a compiled rule tree over XML; the
    crawl scheduler's seed source). Map-only: extract UDF → two inline
    explodes, no shuffle."""
    from goose_parser_spark.ops.crawl import sitemap_urls
    return sitemap_urls(_sitemap_pages(spark, sf_dir))


def q_charset_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Charset sniffing + decode under the value oracle
    (ops/charset.decode_html_bytes — the WHATWG-ish ladder raw crawl
    bodies need since read_warc strips the HTTP headers). Authored
    payloads cycle: UTF-8 with BOM + a multi-byte char, plain UTF-8,
    Latin-1 bytes behind a meta declaration (strict-UTF-8 attempt must
    FAIL on the trailing 0xE9 before the meta rung fires), and
    UTF-16LE with BOM. The oracle states every decoded string and
    charset label."""
    from goose_parser_spark.ops.charset import decode_html_bytes
    docs = _documents_amplified(spark, sf_dir)
    s = F.col("doc_id").cast("string")
    m = F.col("doc_id") % 4
    payload = (
        F.when(m == 0, F.concat(
            F.unhex(F.lit("EFBBBF")),
            F.encode(F.concat(F.lit("U "), s, F.lit(" é")), "UTF-8")))
        .when(m == 1, F.encode(F.concat(F.lit("A "), s), "UTF-8"))
        .when(m == 2, F.concat(
            F.encode(F.concat(
                F.lit('<meta charset="iso-8859-1">B '), s, F.lit(" ")),
                "ISO-8859-1"),
            F.unhex(F.lit("E9"))))
        .otherwise(F.concat(
            F.unhex(F.lit("FFFE")),
            F.encode(F.concat(F.lit("C "), s), "UTF-16LE"))))
    pages = docs.select("doc_id", payload.alias("payload"))
    return decode_html_bytes(pages)


SQL_CHARSET_DECODE = f"""
WITH {_SQL_DOCS_AMP_COPY}
SELECT doc_id,
       CASE doc_id % 4
         WHEN 0 THEN 'U ' || doc_id || ' é'
         WHEN 1 THEN 'A ' || doc_id
         WHEN 2 THEN '<meta charset="iso-8859-1">B ' || doc_id || ' é'
         ELSE 'C ' || doc_id END AS text,
       CASE doc_id % 4
         WHEN 0 THEN 'utf-8-bom'
         WHEN 1 THEN 'utf-8'
         WHEN 2 THEN 'iso-8859-1'
         ELSE 'utf-16-le' END AS charset,
       CAST(0 AS INTEGER) AS n_replaced
FROM docs_amp
"""


def q_robots_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Page-level robots META directives (ops/robots.robots_meta —
    pure scan-side Catalyst). Authored pages cycle through: no tag,
    name-first noindex, content-first nofollow, single-quoted NONE
    (implies both), and an explicit index,follow; the oracle states
    each expected row."""
    from goose_parser_spark.ops.robots import robots_meta
    docs = _documents_amplified(spark, sf_dir)
    s = F.col("doc_id").cast("string")
    m = F.col("doc_id") % 5
    tag = (F.when(m == 1, F.lit(
               '<meta name="robots" content="noindex, follow">'))
           .when(m == 2, F.lit(
               '<meta content="nofollow" name=robots>'))
           .when(m == 3, F.lit("<meta name='robots' content='NONE'>"))
           .when(m == 4, F.lit(
               '<meta name="robots" content="index, follow">'))
           .otherwise(F.lit("")))
    html = F.concat(F.lit("<html><head>"), tag,
                    F.lit("</head><body><p>"), F.col("text"),
                    F.lit("</p></body></html>"))
    pages = docs.select(
        F.concat(F.lit("https://rm.test/"), s).alias("url"),
        html.alias("html"))
    return robots_meta(pages)


SQL_ROBOTS_META = f"""
WITH {_SQL_DOCS_AMP_COPY}
SELECT 'https://rm.test/' || doc_id AS url,
       CASE doc_id % 5 WHEN 1 THEN 'noindex, follow'
                       WHEN 2 THEN 'nofollow'
                       WHEN 3 THEN 'NONE'
                       WHEN 4 THEN 'index, follow' END AS robots_content,
       doc_id % 5 IN (1, 3) AS noindex,
       doc_id % 5 IN (2, 3) AS nofollow
FROM docs_amp
"""


def q_feed_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RSS/Atom feed parsing (ops/crawl.feed_entries — pure scan-side
    Catalyst regex projections, the feed leg of crawl discovery).
    Even docs author a 2-item RSS feed (entity-encoded title, CDATA
    description kept LITERAL, second item with every optional field
    absent); odd docs author a 1-entry Atom feed (entity-encoded
    title, link@href). The oracle states every expected row
    relationally, including the entity-decode and CDATA-literal
    semantics."""
    from goose_parser_spark.ops.crawl import feed_entries
    docs = _documents_amplified(spark, sf_dir)
    s = F.col("doc_id").cast("string")
    rss = F.concat(
        F.lit('<?xml version="1.0"?><rss version="2.0"><channel>'
              '<title>chan</title><item><title>T &amp; '), s,
        F.lit('</title><link>https://f.test/'), s,
        F.lit('/a</link><pubDate>Mon, 01 Jan 2024</pubDate><guid>g'), s,
        F.lit('</guid><description><![CDATA[D &amp; <b>'), F.col("lang"),
        F.lit(']]></description></item><item><title>U '), s,
        F.lit('</title></item></channel></rss>'))
    atom = F.concat(
        F.lit('<feed xmlns="http://www.w3.org/2005/Atom">'
              '<title>af</title><entry><title>A &lt;'), s,
        F.lit('</title><link href="https://f.test/'), s,
        F.lit('/e"/><updated>2024-01-0'),
        (F.col("doc_id") % 9 + 1).cast("string"),
        F.lit('</updated><id>i'), s, F.lit('</id><summary>S '),
        F.col("source"), F.lit('</summary></entry></feed>'))
    xml = F.when(F.col("doc_id") % 2 == 0, rss).otherwise(atom)
    pages = docs.select(
        F.concat(F.lit("https://feeds.test/"), s).alias("url"),
        xml.alias("html"))
    return feed_entries(pages)


SQL_FEED_PARSE = f"""
WITH {_SQL_DOCS_AMP_COPY}
SELECT 'https://feeds.test/' || doc_id AS url, 'rss' AS kind,
       'T & ' || doc_id AS title,
       'https://f.test/' || doc_id || '/a' AS link,
       'Mon, 01 Jan 2024' AS published, 'g' || doc_id AS guid,
       'D &amp; <b>' || lang AS summary
FROM docs_amp WHERE doc_id % 2 = 0
UNION ALL
SELECT 'https://feeds.test/' || doc_id, 'rss', 'U ' || doc_id,
       NULL, NULL, NULL, NULL
FROM docs_amp WHERE doc_id % 2 = 0
UNION ALL
SELECT 'https://feeds.test/' || doc_id, 'atom', 'A <' || doc_id,
       'https://f.test/' || doc_id || '/e',
       '2024-01-0' || (doc_id % 9 + 1), 'i' || doc_id, 'S ' || source
FROM docs_amp WHERE doc_id % 2 = 1
"""


SQL_SITEMAP_PARSE = f"""
WITH {_SQL_DOCS_AMP_COPY}
SELECT 'https://site.test/sitemap/' || doc_id AS url, 'url' AS kind,
       'https://site.test/p/' || doc_id AS loc,
       '2024-01-' || lpad(CAST(doc_id % 28 + 1 AS VARCHAR), 2, '0')
           AS lastmod,
       'daily' AS changefreq,
       '0.' || CAST(doc_id % 9 AS VARCHAR) AS priority
FROM docs_amp WHERE doc_id % 10 != 0
UNION ALL
SELECT 'https://site.test/sitemap/' || doc_id, 'url',
       'https://site.test/q/' || doc_id, '', '', ''
FROM docs_amp WHERE doc_id % 10 != 0
UNION ALL
SELECT 'https://site.test/sitemap/' || doc_id, 'sitemap',
       'https://site.test/sm/' || doc_id || '.xml', '2024-02-02', '', ''
FROM docs_amp WHERE doc_id % 10 = 0
"""


def q_cdx_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Common-Crawl CDXJ index-line parsing (ops/crawl.py parse_cdx):
    'urlkey timestamp {json}' → typed columns, torn lines to NULLs.
    Scan-level projection — codegen split + get_json_object, no
    shuffle. The oracle PARSES the same lines independently (DuckDB
    regexp + JSON functions) — a true differential parse."""
    from goose_parser_spark.ops.crawl import parse_cdx
    base = _documents_amplified(spark, sf_dir)
    d = F.col("doc_id")
    s = d.cast("string")
    line = F.concat(
        F.lit("test,site)/p/"), s,
        F.lit(" 2024010"), ((d % 9) + 1).cast("string"), F.lit("120000"),
        F.lit(' {"url": "https://site.test/p/'), s,
        F.lit('", "mime": "text/html", "status": "'),
        F.when(d % 50 == 0, F.lit("404")).otherwise(F.lit("200")),
        F.lit('", "digest": "sha1:'), s,
        F.lit('", "length": "'), ((d * 13) % 90000 + 200).cast("string"),
        F.lit('", "offset": "'), ((d * 7919) % 1000000).cast("string"),
        F.lit('", "filename": "crawl-'), (d % 100).cast("string"),
        F.lit('.warc.gz"}'))
    line = F.when(d % 97 == 13, F.lit("torn 1234 notjson")).otherwise(line)
    return parse_cdx(base.select(line.alias("line")))




def q_http_headers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HTTP response-head parsing (ops/crawl.parse_http_headers): the
    status / content-type / charset / length gate a crawl pipeline
    applies before any parsing. Heads are synthesized with the shapes
    that matter: CRLF and bare-LF line endings, header-name casing,
    charset parameter quoting, duplicate Content-Type (FIRST wins per
    RFC 9110 singleton semantics), non-numeric Content-Length (NULL),
    redirect Location, torn non-HTTP rows (all-NULL), and a body after
    the blank line carrying a spoofed header line that must be
    ignored. The oracle rebuilds the same heads and re-parses them
    with DuckDB's RE2 — a true differential parse (Java regex vs RE2;
    the operator's patterns are written to the common subset, e.g. no
    multiline $, which RE2 only matches before \n)."""
    from goose_parser_spark.ops.crawl import parse_http_headers
    base = _documents_amplified(spark, sf_dir)
    d = F.col("doc_id")
    s = d.cast("string")
    sep = F.when(d % 5 == 0, F.lit("\n")).otherwise(F.lit("\r\n"))
    status_line = (
        F.when(d % 37 == 0, F.lit("HTTP/1.1 301 Moved Permanently"))
        .when(d % 50 == 0, F.lit("HTTP/1.0 404 Not Found"))
        .otherwise(F.lit("HTTP/1.1 200 OK")))
    ct = (F.when(d % 31 == 0, F.lit(""))  # no Content-Type header
          .when(d % 23 == 0, F.concat(
              F.lit("Content-Type: text/plain"), sep,
              F.lit("Content-Type: text/html")))  # dup: first wins
          .when(d % 7 == 0, F.lit(
              'CONTENT-TYPE: Text/HTML;charset="ISO-8859-1"'))
          .when(d % 3 == 0, F.lit(
              "Content-Type: text/html; charset=UTF-8"))
          .otherwise(F.lit("Content-Type: application/pdf")))
    clen = F.when(d % 29 == 0, F.lit("Content-Length: chunked-garbage")) \
            .otherwise(F.concat(F.lit("Content-Length: "),
                                ((d * 13) % 90000 + 10).cast("string")))
    lang = F.when(d % 4 == 0, F.lit("Content-Language: en-US, fr")) \
            .otherwise(F.lit(""))
    loc = F.when(d % 37 == 0, F.concat(
        F.lit("Location: https://moved.test/"), s)).otherwise(F.lit(""))
    lastmod = F.concat(F.lit("Last-Modified: Mon, 0"),
                       ((d % 9) + 1).cast("string"),
                       F.lit(" Jan 2024 00:00:00 GMT"))
    head = F.concat_ws("", status_line, sep,
                       F.when(ct == "", F.lit("")).otherwise(
                           F.concat(ct, sep)),
                       clen, sep,
                       F.when(lang == "", F.lit("")).otherwise(
                           F.concat(lang, sep)),
                       F.when(loc == "", F.lit("")).otherwise(
                           F.concat(loc, sep)),
                       lastmod, sep,
                       sep,  # blank line: end of head
                       F.lit("Content-Type: image/png"), sep,
                       F.lit("body bytes"))
    full = F.when(d % 97 == 13, F.lit("banana rama no colons")) \
            .otherwise(head)
    return parse_http_headers(
        base.select(d.alias("doc_id"), full.alias("http_headers")))


SQL_HTTP_HEADERS = f"""
WITH {_SQL_DOCS_AMP_COPY}, built AS (
  SELECT doc_id,
         CASE WHEN doc_id % 5 = 0 THEN chr(10)
              ELSE chr(13) || chr(10) END AS sep,
         CASE WHEN doc_id % 37 = 0 THEN 'HTTP/1.1 301 Moved Permanently'
              WHEN doc_id % 50 = 0 THEN 'HTTP/1.0 404 Not Found'
              ELSE 'HTTP/1.1 200 OK' END AS status_line
  FROM docs_amp
), parts AS (
  SELECT doc_id, sep, status_line,
         CASE WHEN doc_id % 31 = 0 THEN ''
              WHEN doc_id % 23 = 0 THEN 'Content-Type: text/plain' || sep
                   || 'Content-Type: text/html'
              WHEN doc_id % 7 = 0
                   THEN 'CONTENT-TYPE: Text/HTML;charset="ISO-8859-1"'
              WHEN doc_id % 3 = 0
                   THEN 'Content-Type: text/html; charset=UTF-8'
              ELSE 'Content-Type: application/pdf' END AS ct,
         CASE WHEN doc_id % 29 = 0 THEN 'Content-Length: chunked-garbage'
              ELSE 'Content-Length: '
                   || CAST((doc_id * 13) % 90000 + 10 AS VARCHAR)
              END AS clen,
         CASE WHEN doc_id % 4 = 0 THEN 'Content-Language: en-US, fr'
              ELSE '' END AS lang,
         CASE WHEN doc_id % 37 = 0
              THEN 'Location: https://moved.test/' || doc_id
              ELSE '' END AS loc,
         'Last-Modified: Mon, 0' || CAST(doc_id % 9 + 1 AS VARCHAR)
             || ' Jan 2024 00:00:00 GMT' AS lastmod
  FROM built
), full_rows AS (
  SELECT doc_id,
         CASE WHEN doc_id % 97 = 13 THEN 'banana rama no colons'
              ELSE status_line || sep
                   || CASE WHEN ct = '' THEN '' ELSE ct || sep END
                   || clen || sep
                   || CASE WHEN lang = '' THEN '' ELSE lang || sep END
                   || CASE WHEN loc = '' THEN '' ELSE loc || sep END
                   || lastmod || sep || sep
                   || 'Content-Type: image/png' || sep || 'body bytes'
              END AS h
  FROM parts
), heads AS (
  SELECT doc_id,
         coalesce(nullif(regexp_extract(
             h, '(?s)^(.*?)\r?\n\r?\n', 1), ''), h) AS head
  FROM full_rows
), vals AS (
  SELECT doc_id, head,
         nullif(trim(regexp_extract(
             head, '(?im)^content-type[ \t]*:[ \t]*([^\r\n]*)', 1)),
             '') AS ct_raw,
         nullif(trim(regexp_extract(
             head, '(?im)^content-length[ \t]*:[ \t]*([^\r\n]*)', 1)),
             '') AS clen_raw,
         nullif(trim(regexp_extract(
             head, '(?im)^content-language[ \t]*:[ \t]*([^\r\n]*)', 1)),
             '') AS lang_raw
  FROM heads
)
SELECT doc_id,
       TRY_CAST(nullif(regexp_extract(
           head, '^HTTP/[0-9.]+[ \t]+([0-9]{{3}})', 1), '') AS INT)
           AS status,
       nullif(trim(regexp_extract(
           head, '^HTTP/[0-9.]+[ \t]+[0-9]{{3}}[ \t]+([^\r\n]*)', 1)),
           '') AS reason,
       nullif(lower(trim(regexp_extract(ct_raw, '^([^;]*)', 1))), '')
           AS content_type,
       lower(nullif(regexp_extract(
           ct_raw, '(?i)charset[ \t]*=[ \t]*"?([A-Za-z0-9_.:-]+)', 1),
           '')) AS charset,
       TRY_CAST(clen_raw AS BIGINT) AS content_length,
       nullif(lower(trim(regexp_extract(lang_raw, '^([^,]*)', 1))), '')
           AS content_language,
       nullif(trim(regexp_extract(
           head, '(?im)^last-modified[ \t]*:[ \t]*([^\r\n]*)', 1)),
           '') AS last_modified,
       nullif(trim(regexp_extract(
           head, '(?im)^location[ \t]*:[ \t]*([^\r\n]*)', 1)),
           '') AS location
FROM vals
"""


def q_capture_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-URL capture history over a synthesized multi-capture CDX
    index (ops/crawl.py capture_history): replicas of a urlkey carry
    distinct timestamps/digests, so first/last capture, version count
    and OK-share all vary. One urlkey-keyed hash-agg with map-side
    partials; torn lines (NULL urlkey) drop out."""
    from goose_parser_spark.ops.crawl import capture_history, parse_cdx
    base = _documents_amplified(spark, sf_dir)
    d = F.col("doc_id")
    key = (d % 1499).cast("string")
    ver = F.floor(d / 1499) % 3
    line = F.concat(
        F.lit("test,site)/p/"), key,
        F.lit(" 202401"),
        F.lpad(((d % 28) + 1).cast("string"), 2, "0"),
        F.lpad((d % 24).cast("string"), 2, "0"), F.lit("0000"),
        F.lit(' {"url": "https://site.test/p/'), key,
        F.lit('", "mime": "text/html", "status": "'),
        F.when(d % 50 == 0, F.lit("404")).otherwise(F.lit("200")),
        F.lit('", "digest": "sha1:'), ver.cast("string"),
        F.lit('", "length": "1000", "offset": "0", '
              '"filename": "crawl.warc.gz"}'))
    line = F.when(d % 97 == 13, F.lit("torn")).otherwise(line)
    return capture_history(parse_cdx(base.select(line.alias("line"))))


SQL_CAPTURE_HISTORY = f"""
WITH {_SQL_DOCS_AMP_COPY}, rec AS (
  SELECT CAST(doc_id % 1499 AS VARCHAR) AS key,
         try_strptime('202401' || lpad(CAST(doc_id % 28 + 1 AS VARCHAR),
                                       2, '0')
                      || lpad(CAST(doc_id % 24 AS VARCHAR), 2, '0')
                      || '0000', '%Y%m%d%H%M%S') AS ts,
         (doc_id // 1499) % 3 AS ver,
         CASE WHEN doc_id % 50 = 0 THEN 404 ELSE 200 END AS status
  FROM docs_amp WHERE doc_id % 97 <> 13
)
SELECT 'test,site)/p/' || key AS urlkey,
       MIN(ts) AS first_seen,
       MAX(ts) AS last_seen,
       COUNT(*) AS n_captures,
       COUNT(DISTINCT ver) AS n_versions,
       CAST(SUM(CASE WHEN status BETWEEN 200 AND 299 THEN 1 ELSE 0 END)
            AS BIGINT) AS n_ok
FROM rec GROUP BY key
UNION ALL
-- torn one-field lines parse to urlkey='torn' with NULL ts/digest/
-- status: they survive the NULL-urlkey guard and form one group
SELECT 'torn', CAST(NULL AS TIMESTAMP), CAST(NULL AS TIMESTAMP),
       COUNT(*), CAST(0 AS BIGINT), CAST(0 AS BIGINT)
FROM docs_amp WHERE doc_id % 97 = 13
"""


SQL_CDX_PARSE = f"""
WITH {_SQL_DOCS_AMP_COPY}, lines AS (
  SELECT CASE WHEN doc_id % 97 = 13 THEN 'torn 1234 notjson'
         ELSE 'test,site)/p/' || doc_id ||
              ' 2024010' || CAST(doc_id % 9 + 1 AS VARCHAR) || '120000' ||
              ' {{"url": "https://site.test/p/' || doc_id ||
              '", "mime": "text/html", "status": "' ||
              CASE WHEN doc_id % 50 = 0 THEN '404' ELSE '200' END ||
              '", "digest": "sha1:' || doc_id ||
              '", "length": "' || CAST((doc_id * 13) % 90000 + 200
                                       AS VARCHAR) ||
              '", "offset": "' || CAST((doc_id * 7919) % 1000000
                                       AS VARCHAR) ||
              '", "filename": "crawl-' || CAST(doc_id % 100 AS VARCHAR) ||
              '.warc.gz"}}'
         END AS line
  FROM docs_amp
), p AS (
  SELECT regexp_extract(line, '^(\\S+) (\\S+) (.*)$', 1) AS urlkey,
         regexp_extract(line, '^(\\S+) (\\S+) (.*)$', 2) AS tss,
         regexp_extract(line, '^(\\S+) (\\S+) (.*)$', 3) AS j
  FROM lines
)
SELECT urlkey,
       try_strptime(tss, '%Y%m%d%H%M%S') AS ts,
       CASE WHEN json_valid(j) THEN j->>'$.url' END AS url,
       CASE WHEN json_valid(j) THEN j->>'$.mime' END AS mime,
       CAST(CASE WHEN json_valid(j) THEN j->>'$.status' END AS INT)
           AS status,
       CASE WHEN json_valid(j) THEN j->>'$.digest' END AS digest,
       CAST(CASE WHEN json_valid(j) THEN j->>'$.length' END AS BIGINT)
           AS length,
       CAST(CASE WHEN json_valid(j) THEN j->>'$.offset' END AS BIGINT)
           AS offset,
       CASE WHEN json_valid(j) THEN j->>'$.filename' END AS filename
FROM p
"""


def _anchor_pages(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pages whose links point at SHARED hub targets (doc_id % 101)
    with varying anchor text (doc_id % 7), plus a blank-anchor
    external link — exercises anchor aggregation across many source
    pages per target."""
    base = _documents_amplified(spark, sf_dir)
    d = F.col("doc_id")
    s = d.cast("string")
    html = F.concat(
        F.lit('<html><body><p class="lnk"><a href="/hub/'),
        (d % 101).cast("string"),
        F.lit('">hub '), (d % 7).cast("string"), F.lit("</a></p>"),
        F.lit('<p class="lnk"><a href="https://ext.test/e/'),
        (d % 13).cast("string"),
        F.lit('"> </a></p></body></html>'))
    return base.select(
        F.concat(F.lit("https://docs.test/"), s).alias("url"),
        F.encode(html, "utf-8").alias("html"))


def q_anchor_text(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Anchor-text aggregation per link target (ops/linkgraph.py
    anchor_text_stats) fed by REAL engine extraction: link grid →
    resolve_href → one hash-agg by target. top_anchors is the first 5
    distinct non-blank anchors lexicographically — bounded per row no
    matter how popular the target."""
    from goose_parser_spark.ops.linkgraph import anchor_text_stats
    from goose_parser_spark.ops.urls import resolve_href
    pages = _anchor_pages(spark, sf_dir)
    rules = {"scope": "p.lnk", "collection": [[
        {"name": "href", "scope": "a", "attr": "href"},
        {"name": "anchor", "scope": "a"},
    ]]}
    links = (extract(pages, rules)
             .select("url", F.inline("extracted"))
             .select(F.col("url").alias("src"),
                     resolve_href(F.col("url"), F.col("href"))
                     .alias("target"),
                     "anchor")
             .where(F.col("target").isNotNull()))
    return anchor_text_stats(links)


SQL_ANCHOR_TEXT = f"""
WITH {_SQL_DOCS_AMP_COPY}, links AS (
  SELECT 'https://docs.test/' || doc_id AS src,
         'https://docs.test/hub/' || (doc_id % 101) AS target,
         'hub ' || (doc_id % 7) AS anchor
  FROM docs_amp
  UNION ALL
  SELECT 'https://docs.test/' || doc_id,
         'https://ext.test/e/' || (doc_id % 13), ' '
  FROM docs_amp
)
SELECT target,
       CAST(count(*) AS BIGINT) AS n_links,
       CAST(count(DISTINCT src) AS BIGINT) AS n_src_pages,
       coalesce(array_to_string(
         list_slice(
           list_sort(list(DISTINCT anchor)
                     FILTER (trim(anchor) <> '')), 1, 5),
         ' | '), '') AS top_anchors
FROM links GROUP BY target
"""


def q_frontier_schedule(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Politeness-aware fetch scheduling (ops/crawl.py
    schedule_frontier): per-host fetch slots ordered by priority, slot
    start = slot × crawl_delay (robots delay where present, default
    1s). One bounded host join + one host-keyed window."""
    from goose_parser_spark.ops.crawl import schedule_frontier
    docs = _documents_amplified(spark, sf_dir)
    d = F.col("doc_id")
    host = F.concat(F.lit("h"), (d % 37).cast("string"), F.lit(".test"))
    fr = docs.select(
        F.concat(F.lit("https://"), host, F.lit("/p/"),
                 d.cast("string")).alias("url"),
        host.alias("host"),
        (d % 5).cast("int").alias("priority"))
    delays = spark.createDataFrame(
        [(f"h{i}.test", 2.0 if i % 3 == 0 else None)
         for i in range(0, 37, 2)],
        "host string, crawl_delay double")
    return schedule_frontier(fr, delays, priority_col="priority")


SQL_FRONTIER_SCHEDULE = f"""
WITH {_SQL_DOCS_AMP_COPY}, fr AS (
  SELECT 'https://h' || (doc_id % 37) || '.test/p/' || doc_id AS url,
         'h' || (doc_id % 37) || '.test' AS host,
         doc_id % 5 AS priority
  FROM docs_amp
), dl AS (
  SELECT 'h' || i || '.test' AS host,
         CASE WHEN i % 3 = 0 THEN 2.0 END AS crawl_delay
  FROM (SELECT unnest(range(0, 37, 2)) AS i)
), slots AS (
  SELECT f.url, f.host,
         row_number() OVER (PARTITION BY f.host
                            ORDER BY f.priority DESC, f.url) - 1
             AS fetch_slot,
         coalesce(d.crawl_delay, 1.0) AS delay
  FROM fr f LEFT JOIN dl d USING (host)
)
SELECT url, host,
       CAST(fetch_slot AS BIGINT) AS fetch_slot,
       CAST(fetch_slot * delay * 1000.0 AS BIGINT) AS start_offset_ms
FROM slots
"""


def q_corpus_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language document-length percentiles (p50/p90/p99) — the
    corpus-profile rollup every curation run reports. EXACT percentile
    (Spark's `percentile`, linear interpolation) so DuckDB's
    quantile_cont reproduces it bit-for-bit after rounding; at 100 TB
    swap in percentile_approx (t-digest sketch, one pass, mergeable) —
    same query shape, documented accuracy tradeoff."""
    docs = _documents_amplified(spark, sf_dir)
    return (docs.groupBy("lang")
            .agg(*[F.round(F.percentile(F.col("n_chars"), F.lit(q)), 4)
                   .alias(f"p{int(q * 100)}")
                   for q in (0.5, 0.9, 0.99)],
                 F.count("*").alias("n_docs")))


SQL_CORPUS_PERCENTILES = f"""
WITH {_SQL_DOCS_AMP_COPY}
SELECT lang,
       round(quantile_cont(n_chars, 0.5), 4) AS p50,
       round(quantile_cont(n_chars, 0.9), 4) AS p90,
       round(quantile_cont(n_chars, 0.99), 4) AS p99,
       count(*) AS n_docs
FROM docs_amp GROUP BY lang
"""


def q_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GPT-3-style exact n-gram span REMOVAL (ops/dedup.py
    decontaminate_exact): training docs (even ids) are scrubbed of
    every token covered by a k-gram occurring in the eval half (odd
    ids). k=3 at test scale so planted near-dup passages actually
    match (production default k=13). Shuffles carry only 16-char
    hashes and positions; removal is a projection."""
    from goose_parser_spark.ops.dedup import decontaminate_exact
    docs = _documents_amplified(spark, sf_dir, vary_text=True)
    train = docs.where(F.col("doc_id") % 2 == 0)
    ev = docs.where(F.col("doc_id") % 2 == 1)
    return decontaminate_exact(train, ev, k=3)


SQL_DECONTAMINATE = f"""
WITH {_SQL_DOCS_AMP_VARIED}, tokT AS (
  SELECT doc_id, string_split(text, ' ') AS w FROM docs_amp
  WHERE doc_id % 2 = 0
), tokE AS (
  SELECT doc_id, string_split(text, ' ') AS w FROM docs_amp
  WHERE doc_id % 2 = 1
), gE AS (
  SELECT DISTINCT substr(md5(array_to_string(w[i:i+2], ' ')), 1, 16) AS g
  FROM (SELECT w, unnest(range(1, len(w) - 1)) AS i
        FROM tokE WHERE len(w) >= 3)
), gT AS (
  SELECT doc_id, i, substr(md5(array_to_string(w[i:i+2], ' ')), 1, 16) AS g
  FROM (SELECT doc_id, w, unnest(range(1, len(w) - 1)) AS i
        FROM tokT WHERE len(w) >= 3)
), matched AS (
  SELECT DISTINCT doc_id, i FROM gT JOIN gE USING (g)
), toks AS (
  SELECT doc_id, p, w[p] AS tok, len(w) AS n_tok
  FROM (SELECT doc_id, w, unnest(range(1, len(w) + 1)) AS p FROM tokT)
), kept AS (
  SELECT t.doc_id, t.p, t.tok FROM toks t
  LEFT JOIN matched m
    ON m.doc_id = t.doc_id AND m.i BETWEEN t.p - 2 AND t.p
  WHERE m.i IS NULL
), rebuilt AS (
  SELECT doc_id, string_agg(tok, ' ' ORDER BY p) AS text,
         count(*) AS n_kept
  FROM kept GROUP BY doc_id
), ntok AS (
  SELECT doc_id, len(w) AS n_tok FROM tokT
)
SELECT n.doc_id,
       coalesce(r.text, '') AS text,
       CAST(n.n_tok - coalesce(r.n_kept, 0) AS INT) AS n_removed
FROM ntok n LEFT JOIN rebuilt r USING (doc_id)
"""


def q_policy_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4-style policy filtering (ops/policy.py policy_filter): a
    bounded domain blocklist (hosts h0/h13/h26.test) + a badword
    regex, with fixed reason precedence (blocked_domain > badword).
    Scan-level: one AQE-broadcast host join + one codegen rlike."""
    from goose_parser_spark.ops.policy import policy_filter
    docs = _documents_amplified(spark, sf_dir)
    d = F.col("doc_id")
    url = F.concat(F.lit("https://h"), (d % 37).cast("string"),
                   F.lit(".test/p/"), d.cast("string"))
    blocked = spark.createDataFrame(
        [(f"h{k}.test",) for k in range(0, 37, 13)], "host string")
    return policy_filter(docs.withColumn("url", url),
                         badwords=["merge", "rollback"],
                         blocked_hosts=blocked)


SQL_POLICY_FILTER = f"""
WITH {_SQL_DOCS_AMP_COPY}
SELECT doc_id,
       reason IS NULL AS keep, reason
FROM (
  SELECT doc_id,
         CASE WHEN (doc_id % 37) IN (0, 13, 26) THEN 'blocked_domain'
              WHEN regexp_matches(text, '(?i)\\b(rollback|merge)\\b')
                THEN 'badword' END AS reason
  FROM docs_amp
)
"""


_MOJI_TAIL = " café — “naïve” déjà… ðŸ™‚"


def q_fix_mojibake(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mojibake repair (ops/textstats.py fix_mojibake): every 7th doc
    gets a non-ASCII tail, is then CORRUPTED in-plan (UTF-8 bytes
    re-read as Latin-1 — the classic double-encoding), and repaired.
    Fixed-point differential oracle: DuckDB predicts that repair must
    restore the augmented original exactly and that only corrupted
    docs report was_mojibake (the corpus is pure ASCII otherwise, so
    corruption is the identity there)."""
    from goose_parser_spark.ops.textstats import mojibake_stats
    docs = _documents_amplified(spark, sf_dir)
    aug = F.when(F.col("doc_id") % 7 == 0,
                 F.concat(F.col("text"), F.lit(_MOJI_TAIL))) \
        .otherwise(F.col("text"))
    corrupted = docs.select(
        "doc_id",
        F.decode(F.encode(aug, "UTF-8"), "ISO-8859-1").alias("text"))
    return mojibake_stats(corrupted)


SQL_FIX_MOJIBAKE = f"""
WITH {_SQL_DOCS_AMP_COPY}
SELECT doc_id,
       CASE WHEN doc_id % 7 = 0
            THEN text || '{_MOJI_TAIL}'
            ELSE text END AS text,
       doc_id % 7 = 0 AS was_mojibake
FROM docs_amp
"""


def q_substring_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-internal exact duplicate-substring removal (ops/dedup.py
    substring_dedup_exact — the Lee et al. 2022 ExactSubstr semantics
    on a k-gram grid): every ≥k-token run occurring more than once in
    the corpus survives only at its minimal (doc_id, position)
    occurrence. Uses the UNVARIED ×23 amplification — replicas are
    full duplicates, so the canonical replica keeps its text and the
    other 22 are scrubbed, plus whatever natural cross-doc runs exist.
    k=8 at test scale (production default 50)."""
    from goose_parser_spark.ops.dedup import substring_dedup_exact
    docs = _documents_amplified(spark, sf_dir)
    return substring_dedup_exact(docs.select("doc_id", "text"), k=8)


SQL_SUBSTRING_DEDUP = f"""
WITH {_SQL_DOCS_AMP_COPY}, tok AS (
  SELECT doc_id, string_split(text, ' ') AS w FROM docs_amp
), occ AS (
  SELECT doc_id, i, substr(md5(array_to_string(w[i:i+7], ' ')), 1, 16) AS g
  FROM (SELECT doc_id, w, unnest(range(1, len(w) - 6)) AS i
        FROM tok WHERE len(w) >= 8)
), ranked AS (
  SELECT doc_id, i,
         row_number() OVER (PARTITION BY g ORDER BY doc_id, i) AS rn,
         count(*) OVER (PARTITION BY g) AS c
  FROM occ
), spans AS (
  SELECT DISTINCT doc_id, i FROM ranked WHERE c > 1 AND rn > 1
), toks AS (
  SELECT doc_id, p, w[p] AS tok
  FROM (SELECT doc_id, w, unnest(range(1, len(w) + 1)) AS p FROM tok)
), kept AS (
  SELECT t.doc_id, t.p, t.tok FROM toks t
  LEFT JOIN spans m
    ON m.doc_id = t.doc_id AND m.i BETWEEN t.p - 7 AND t.p
  WHERE m.i IS NULL
), rebuilt AS (
  SELECT doc_id, string_agg(tok, ' ' ORDER BY p) AS text,
         count(*) AS n_kept
  FROM kept GROUP BY doc_id
), ntok AS (
  SELECT doc_id, len(w) AS n_tok FROM tok
)
SELECT n.doc_id,
       coalesce(r.text, '') AS text,
       CAST(n.n_tok - coalesce(r.n_kept, 0) AS INT) AS n_removed
FROM ntok n LEFT JOIN rebuilt r USING (doc_id)
"""


def q_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark-leakage check: winnow-fingerprint overlap between a
    'train' half and an 'eval' half of the corpus (even/odd doc_ids —
    near-dup replica families straddle the split, so planted overlap
    exists; vary_text=True keeps replica families fp-disjoint so pairs stay the planted overlaps, not 23^2 cliques). Guaranteed to catch any shared run of ≥ window+k-1 words
    (ops/dedup.contamination_pairs)."""
    from goose_parser_spark.ops.dedup import contamination_pairs
    docs = _documents_amplified(spark, sf_dir, vary_text=True)
    train = docs.where(F.col("doc_id") % 2 == 0)
    ev = docs.where(F.col("doc_id") % 2 == 1)
    return contamination_pairs(train, ev, k=3, window=4, min_shared=2)


SQL_CONTAMINATION = f"""
WITH {_SQL_DOCS_AMP_VARIED}, tok AS (
  SELECT doc_id, string_split(text, ' ') AS w FROM docs_amp
  WHERE len(string_split(text, ' ')) >= 3
), h AS (
  SELECT doc_id,
         list_transform(generate_series(1, len(w) - 2),
                        u -> substr(md5(array_to_string(w[u:u+2], ' ')), 1, 16))
             AS hs
  FROM tok
), fps AS (
  SELECT doc_id, unnest(list_distinct(
           list_transform(generate_series(1, len(hs) - 3),
                          i -> list_min(hs[i:i+3])))) AS fp
  FROM h WHERE len(hs) >= 4
)
SELECT e.doc_id AS eval_id, t.doc_id AS train_id,
       count(*) AS n_shared_fps
FROM (SELECT * FROM fps WHERE doc_id % 2 = 1) e
JOIN (SELECT * FROM fps WHERE doc_id % 2 = 0) t USING (fp)
GROUP BY 1, 2
HAVING count(*) >= 2
"""


def q_hash_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic train/val/test split via disjoint md5-threshold
    bands (ops/sampling.py): engine-reproducible, growth-stable."""
    from goose_parser_spark.ops.sampling import hash_split
    docs = _documents_amplified(spark, sf_dir)
    return hash_split(docs.select("doc_id"), "doc_id",
                      {"val": 0.05, "test": 0.05, "train": 0.90},
                      salt="sp")


SQL_HASH_SPLIT = f"""
WITH {_SQL_DOCS_AMP_COPY}
SELECT doc_id,
  CASE
    WHEN substr(md5(CAST(doc_id AS VARCHAR) || 'sp'), 1, 8)
         < '0ccccccc' THEN 'val'
    WHEN substr(md5(CAST(doc_id AS VARCHAR) || 'sp'), 1, 8)
         < '19999999' THEN 'test'
    ELSE 'train'
  END AS split
FROM docs_amp
"""


def q_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LM sequence packing: per-bucket greedy fill to a 2048-token
    budget (ops/sampling.py) — deterministic, window-cumsum per hash
    bucket, no global sort."""
    from goose_parser_spark.ops.sampling import pack_sequences
    from goose_parser_spark.ops.textstats import token_count
    docs = _documents_amplified(spark, sf_dir)
    with_tok = docs.select("doc_id", token_count("text").alias("n_tokens"))
    return (pack_sequences(with_tok, "n_tokens", "doc_id",
                           tokens_per_seq=2048, buckets=16)
            .select("doc_id", "n_tokens", "bucket", "seq_id", "seq_offset"))


SQL_PACK_SEQUENCES = f"""
WITH {_SQL_DOCS_AMP_COPY}, tok AS (
  SELECT doc_id, len(string_split(text, ' ')) AS n_tokens,
         CAST(CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 4))
              AS INTEGER) % 16 AS INTEGER) AS bucket
  FROM docs_amp
)
SELECT doc_id, CAST(n_tokens AS INTEGER) AS n_tokens, bucket,
       CAST(floor(seq_offset * 1.0 / 2048) AS BIGINT) AS seq_id,
       seq_offset
FROM (
  SELECT doc_id, n_tokens, bucket,
         CAST(sum(n_tokens) OVER (PARTITION BY bucket ORDER BY doc_id
                                  ROWS UNBOUNDED PRECEDING) - n_tokens
              AS BIGINT) AS seq_offset
  FROM tok
)
"""


def q_robots_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """robots.txt politeness filter (RFC 9309 longest-match subset):
    parse per-host robots bodies → per-host rule arrays → shuffle-free
    broadcast-join filter over the url table (ops/robots.py). The
    oracle states the hand-computed allow/deny decision per (host,
    path) variant — a specification check."""
    from goose_parser_spark.ops.robots import parse_robots, robots_filter
    docs = _documents_amplified(spark, sf_dir)
    s = F.col("doc_id").cast("string")
    host = F.concat(F.lit("h"), (F.col("doc_id") % 5).cast("string"),
                    F.lit(".test"))
    pv = F.col("doc_id") % 4
    path = (F.when(pv == 0, F.concat(F.lit("/private/ok/p"), s))
             .when(pv == 1, F.concat(F.lit("/private/p"), s))
             .when(pv == 2, F.concat(F.lit("/public/p"), s))
             .otherwise(F.lit("")))  # bare host: Disallow:/ must block
    urls = docs.select(
        "doc_id", F.concat(F.lit("https://"), host, path).alias("url"))
    robots = spark.createDataFrame([
        ("h0.test",
         "User-agent: *\nDisallow: /private\nAllow: /private/ok\n"),
        ("h1.test", "User-agent: *\nDisallow: /\n"),
        ("h2.test", "User-agent: bot\nDisallow: /\n"),   # no * group
        ("h3.test", ""),                                  # empty file
        ("h4.test", "User-agent: *\nDisallow:\n"),        # empty Disallow
    ], "host string, robots_txt string")
    rules = parse_robots(robots)
    return robots_filter(urls, rules).select("doc_id", "url")


SQL_ROBOTS_FILTER = f"""
WITH {_SQL_DOCS_AMP_COPY}
SELECT doc_id,
       'https://h' || (doc_id % 5) || '.test' ||
       CASE doc_id % 4
         WHEN 0 THEN '/private/ok/p' || doc_id
         WHEN 1 THEN '/private/p' || doc_id
         WHEN 2 THEN '/public/p' || doc_id
         ELSE ''
       END AS url
FROM docs_amp
WHERE NOT (doc_id % 5 = 1)                          -- h1: Disallow / (incl. bare host)
  AND NOT (doc_id % 5 = 0 AND doc_id % 4 = 1)       -- h0: /private denied
"""


def q_i1_bucketing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic url-hash bucketing (I1): bucket histogram over a
    synthetic url column. xxhash64 differs from anything DuckDB has →
    rows-only driver check; determinism is pytest-asserted."""
    docs = _documents_amplified(spark, sf_dir)
    urls = docs.select(
        F.concat(F.lit("https://docs.test/"), F.col("doc_id").cast("string"))
         .alias("url"))
    return (with_bucket(urls, 32)
            .groupBy("bucket").count().orderBy("bucket"))


def q_i1_bucketing_md5(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The I1 bucketing CONTRACT under a hard value oracle: md5-mode
    bucket assignment (60-bit hex-derived integer, pmod buckets)
    replayed exactly in DuckDB; histogram per bucket. Also an implicit
    uniformity check — the oracle pins every bucket's count."""
    docs = _documents_amplified(spark, sf_dir)
    urls = docs.select(
        F.concat(F.lit("https://docs.test/"), F.col("doc_id").cast("string"))
         .alias("url"))
    return (with_bucket(urls, 32, hash_mode="md5")
            .groupBy("bucket").count().orderBy("bucket"))


SQL_I1_BUCKETING_MD5 = f"""
WITH {_SQL_DOCS_AMP_COPY}, u AS (
  SELECT 'https://docs.test/' || doc_id AS url FROM docs_amp
), h AS (
  SELECT list_sum(list_transform(range(15), p ->
    CAST(strpos('0123456789abcdef', substr(md5(url), p + 1, 1)) - 1
         AS BIGINT) << CAST(4 * (14 - p) AS INT))) AS hv
  FROM u
)
SELECT CAST(hv % 32 AS INT) AS bucket,
       CAST(count(*) AS BIGINT) AS count
FROM h GROUP BY 1 ORDER BY 1
"""


def q_url_canonicalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Crawl-frontier URL canonicalization: normalize (case, default
    ports, trailing slash, fragment) + strip tracking params + sort
    survivors (ops/urls.py). The oracle states hand-computed expected
    values per variant — a specification check."""
    from goose_parser_spark.ops.urls import url_canonicalize
    docs = _documents_amplified(spark, sf_dir)
    v = F.col("doc_id") % 6
    s = F.col("doc_id").cast("string")
    url = (F.when(v == 0, F.concat(F.lit("https://Example.COM/a"), s,
                                   F.lit("?utm_source=x&b=2&a=1#f")))
           .when(v == 1, F.concat(F.lit("http://shop.net:80/p"), s,
                                  F.lit("?gclid=abc")))
           .when(v == 2, F.concat(F.lit("https://news.org/x"), s,
                                  F.lit("/?z=9&fbclid=1&y=8")))
           .when(v == 3, F.concat(F.lit("https://plain.com/q"), s,
                                  F.lit("/")))
           .when(v == 4, F.concat(F.lit("https://a.site.org/p"), s,
                                  F.lit("?b=1&a=2&utm_campaign=c&ref=tw")))
           .otherwise(F.concat(F.lit("https://t.co/h"), s,
                               F.lit("?utm_x=1"))))
    return docs.select("doc_id", url.alias("url"),
                       url_canonicalize(url).alias("canon"))


SQL_URL_CANONICALIZE = f"""
WITH {_SQL_DOCS_AMP_COPY}
SELECT doc_id,
  CASE doc_id % 6
    WHEN 0 THEN 'https://Example.COM/a' || doc_id || '?utm_source=x&b=2&a=1#f'
    WHEN 1 THEN 'http://shop.net:80/p' || doc_id || '?gclid=abc'
    WHEN 2 THEN 'https://news.org/x' || doc_id || '/?z=9&fbclid=1&y=8'
    WHEN 3 THEN 'https://plain.com/q' || doc_id || '/'
    WHEN 4 THEN 'https://a.site.org/p' || doc_id || '?b=1&a=2&utm_campaign=c&ref=tw'
    ELSE 'https://t.co/h' || doc_id || '?utm_x=1'
  END AS url,
  CASE doc_id % 6
    WHEN 0 THEN 'https://example.com/a' || doc_id || '?a=1&b=2'
    WHEN 1 THEN 'http://shop.net/p' || doc_id
    WHEN 2 THEN 'https://news.org/x' || doc_id || '?y=8&z=9'
    WHEN 3 THEN 'https://plain.com/q' || doc_id
    WHEN 4 THEN 'https://a.site.org/p' || doc_id || '?a=2&b=1'
    ELSE 'https://t.co/h' || doc_id
  END AS canon
FROM docs_amp
"""


def q_chunk_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overlapping token-window chunking (size 16, stride 12) — the
    unit-of-training split for embedding/context-bound models
    (ops/textstats.py). Map-side Generate only: no shuffle."""
    from goose_parser_spark.ops.textstats import chunk_documents
    docs = _documents_amplified(spark, sf_dir)
    return chunk_documents(docs.select("doc_id", "text"),
                           size=16, stride=12)


SQL_CHUNK_DOCUMENTS = f"""
WITH {_SQL_DOCS_AMP_COPY}, tok AS (
  SELECT doc_id, list_filter(string_split(text, ' '), x -> x != '') AS w
  FROM docs_amp
), st AS (
  SELECT doc_id, w, generate_series(0, len(w) - 1, 12) AS starts
  FROM tok WHERE len(w) >= 1
)
SELECT doc_id,
       CAST(unnest(range(len(starts))) AS INTEGER) AS chunk_id,
       CAST(unnest(starts) AS INTEGER) AS chunk_start,
       CAST(len(w[unnest(starts) + 1 : unnest(starts) + 16]) AS INTEGER)
           AS n_tokens,
       array_to_string(w[unnest(starts) + 1 : unnest(starts) + 16], ' ')
           AS chunk_text
FROM st
"""


def q_mixture_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-mixture construction: per-source sampling rates
    (src0 0.9, src1 0.5, src2 0.2, src3 0.05, others 0.1) via the
    md5-threshold discipline — one scan-level CASE filter, zero
    shuffles (ops/sampling.py)."""
    from goose_parser_spark.ops.sampling import stratified_sample_by_hash
    docs = _documents_amplified(spark, sf_dir)
    return stratified_sample_by_hash(
        docs.select("doc_id", "source"), "doc_id", "source",
        rates={"src0": 0.9, "src1": 0.5, "src2": 0.2, "src3": 0.05},
        salt="mx", default_rate=0.1)


SQL_MIXTURE_SAMPLE = f"""
WITH {_SQL_DOCS_AMP_COPY}
SELECT doc_id, source FROM docs_amp
WHERE substr(md5(CAST(doc_id AS VARCHAR) || 'mx'), 1, 8) <
  CASE source
    WHEN 'src0' THEN 'e6666666'
    WHEN 'src1' THEN '80000000'
    WHEN 'src2' THEN '33333333'
    WHEN 'src3' THEN '0ccccccc'
    ELSE '19999999'
  END
"""


def q_train_shards(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic global shuffle into 8 training shards: md5 shard
    assignment + md5-order position within the shard — a reproducible
    pseudo-random permutation with one exchange (ops/sampling.py)."""
    from goose_parser_spark.ops.sampling import assign_shards
    docs = _documents_amplified(spark, sf_dir)
    return assign_shards(docs.select("doc_id"), "doc_id",
                         n_shards=8, salt="sh")


SQL_TRAIN_SHARDS = f"""
WITH {_SQL_DOCS_AMP_COPY}, h AS (
  SELECT doc_id, md5(CAST(doc_id AS VARCHAR) || 'sh') AS hh FROM docs_amp
)
SELECT doc_id,
  CAST(CAST(('0x' || substr(hh, 1, 8)) AS BIGINT) % 8 AS INTEGER) AS shard,
  row_number() OVER (
    PARTITION BY CAST(('0x' || substr(hh, 1, 8)) AS BIGINT) % 8
    ORDER BY hh, doc_id) AS pos
FROM h
"""


def q_quality_classifier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hashed-feature linear classifier scoring (fastText-style
    serving path; frozen md5 weight function → fully oracle-checkable;
    ops/textstats.py). Integer-exact accumulation, one codegen
    projection."""
    from goose_parser_spark.ops.textstats import classifier_score
    docs = _documents_amplified(spark, sf_dir)
    return docs.select("doc_id",
                       classifier_score("text").alias("clf_score"))


SQL_QUALITY_CLASSIFIER = f"""
WITH {_SQL_DOCS_AMP_COPY}, tok AS (
  SELECT doc_id, list_filter(string_split(text, ' '), x -> x != '') AS w
  FROM docs_amp
)
SELECT doc_id,
  CASE WHEN len(w) > 0 THEN
    round(CAST(list_sum(list_transform(w,
        t -> CAST(('0x' || substr(md5(t || 'clf'), 1, 8)) AS BIGINT)
             - 2147483648)) AS BIGINT)
      / (len(w) * 2147483648.0), 6)
  ELSE 0.0 END AS clf_score
FROM tok
"""


def q_clean_text(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pre-training text cleanup over deterministically dirtied text
    (tabs / newlines / DEL / VT / space runs injected per doc_id
    variant); control chars → space, collapse, trim
    (ops/textstats.py). The oracle runs the identical RE2-compatible
    patterns (with DuckDB's explicit 'g' flag)."""
    from goose_parser_spark.ops.textstats import clean_text
    docs = _documents_amplified(spark, sf_dir)
    v = F.col("doc_id") % 4
    dirty = (F.when(v == 0, F.concat(F.lit("\t "), F.col("text"),
                                     F.lit(" \n")))
             .when(v == 1, F.replace(F.col("text"), F.lit(" "),
                                     F.lit("\t")))
             .when(v == 2, F.concat(F.lit("  "), F.col("text"),
                                    F.lit("  \x7f")))
             .otherwise(F.concat(F.col("text"), F.lit("\x0btail"))))
    return docs.select("doc_id", clean_text(dirty).alias("cleaned"))


SQL_CLEAN_TEXT = f"""
WITH {_SQL_DOCS_AMP_COPY}, dirty AS (
  SELECT doc_id,
    CASE doc_id % 4
      WHEN 0 THEN chr(9) || ' ' || text || ' ' || chr(10)
      WHEN 1 THEN replace(text, ' ', chr(9))
      WHEN 2 THEN '  ' || text || '  ' || chr(127)
      ELSE text || chr(11) || 'tail'
    END AS d
  FROM docs_amp
)
SELECT doc_id,
  trim(regexp_replace(regexp_replace(d, '[\\x00-\\x1f\\x7f]', ' ', 'g'),
                      ' +', ' ', 'g')) AS cleaned
FROM dirty
"""


def q_dedup_semantic_keep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup-style semantic dedup end-to-end: embedding-cosine
    near-dup pairs (LSH-blocked, the oracle-checkable scale path) →
    connected components → keep each cluster's canonical vector. The
    embedding-side twin of dedup_keep_canonical."""
    from goose_parser_spark.ops.dedup import (
        connected_components, keep_canonical)
    from goose_parser_spark.ops.similarity import embedding_cosine_pairs
    emb = _t(spark, sf_dir, "embeddings")
    pairs = embedding_cosine_pairs(emb, threshold=0.45,
                                   lsh_prefilter=True,
                                   num_planes=4, num_tables=4, dims=64)
    clusters = connected_components(emb.select("vec_id"), pairs,
                                    id_col="vec_id",
                                    a_col="id_a", b_col="id_b")
    return keep_canonical(emb.select("vec_id"), clusters,
                          id_col="vec_id")


SQL_DEDUP_SEMANTIC_KEEP = f"""
WITH RECURSIVE b AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e,
         {{b0}} AS b0,
         {{b1}} AS b1,
         {{b2}} AS b2,
         {{b3}} AS b3
  FROM embeddings
), pr AS (
  SELECT x.vec_id AS a, y.vec_id AS bb
  FROM b x JOIN b y
    ON x.vec_id < y.vec_id
   AND (x.b0 = y.b0 OR x.b1 = y.b1 OR x.b2 = y.b2 OR x.b3 = y.b3)
  WHERE round(list_cosine_similarity(x.e, y.e), 4) >= 0.45
), edges AS (
  SELECT a AS ea, bb AS eb FROM pr UNION SELECT bb, a FROM pr
), reach(node, root) AS (
  SELECT vec_id, vec_id FROM embeddings
  UNION
  SELECT e.eb, r.root FROM reach r JOIN edges e ON e.ea = r.node
)
SELECT node AS vec_id FROM (
  SELECT node, min(root) AS canon FROM reach GROUP BY node
) WHERE node = canon
""".format(
    b0=_bucket_sql('CAST(embedding AS DOUBLE[])', 4, 64, 0),
    b1=_bucket_sql('CAST(embedding AS DOUBLE[])', 4, 64, 4),
    b2=_bucket_sql('CAST(embedding AS DOUBLE[])', 4, 64, 8),
    b3=_bucket_sql('CAST(embedding AS DOUBLE[])', 4, 64, 12),
)


def q_domain_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Domain-level curation signal: per-REGISTERED-DOMAIN doc count,
    exact decimal quality mass, and low-quality count — the aggregate a
    blocklist / per-domain-downweight pass consumes. Composes the PSL
    registered-domain operator (hosts news.* and blog.* of one site
    collapse to one domain) with the quality heuristic; one hash-agg
    exchange, quality summed as DECIMAL so both engines agree exactly
    (float-sum order never enters)."""
    from goose_parser_spark.ops.textstats import quality_score
    from goose_parser_spark.ops.urls import registered_domain_psl
    docs = _documents_amplified(spark, sf_dir)
    v = F.col("doc_id") % 5
    s = F.col("doc_id").cast("string")
    url = (F.when(v == 0, F.concat(F.lit("https://news.example.co.uk/a"), s))
           .when(v == 1, F.concat(F.lit("https://blog.example.co.uk/b"), s))
           .when(v == 2, F.concat(F.lit("https://shop.mart.com/c"), s))
           .when(v == 3, F.concat(F.lit("https://wiki.lore.org/d"), s))
           .otherwise(F.concat(F.lit("https://spam.junk.net/e"), s)))
    base = docs.select("doc_id", url.alias("url"), "text")
    with_dom = registered_domain_psl(base, "url")
    q = quality_score("text")
    return (with_dom.groupBy("domain")
            .agg(F.count("*").alias("n_docs"),
                 F.sum(q.cast("decimal(18,6)")).cast("decimal(18,6)")
                  .cast("string").alias("quality_mass"),
                 F.count(F.when(q < 0.4, 1)).alias("n_low")))


_SQL_QUALITY_EXPR = """round(least(1.0,
    (len(list_filter(string_split(text,' '), w -> w IN
       ('the','a','of','and','to','in','is','it','that','for')))
     * 1.0 / len(string_split(text,' '))) * 2.0 * 0.4
    + (CASE WHEN length(text) * 1.0 / len(string_split(text,' '))
            BETWEEN 3 AND 10 THEN 1.0 ELSE 0.5 END) * 0.3
    + (length(regexp_replace(text, '[^A-Za-z ]', '', 'g')) * 1.0
       / length(text)) * 0.3
  ), 6)"""

SQL_DOMAIN_QUALITY = f"""
WITH {_SQL_DOCS_AMP_COPY}, scored AS (
  SELECT CASE doc_id % 5
           WHEN 0 THEN 'example.co.uk'
           WHEN 1 THEN 'example.co.uk'
           WHEN 2 THEN 'mart.com'
           WHEN 3 THEN 'lore.org'
           ELSE 'junk.net'
         END AS domain,
         {_SQL_QUALITY_EXPR} AS q
  FROM docs_amp
)
SELECT domain, count(*) AS n_docs,
       CAST(CAST(sum(CAST(q AS DECIMAL(18,6))) AS DECIMAL(18,6))
            AS VARCHAR) AS quality_mass,
       count(CASE WHEN q < 0.4 THEN 1 END) AS n_low
FROM scored GROUP BY domain
"""


def q_corpus_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-scan corpus profile per source — the report card a curation
    run emits: doc count, exact token total, DECIMAL-exact quality
    mass, low-quality and short-doc counts. Everything folds in a
    single hash-agg over one pass of the corpus (at 100 TB this is the
    cheapest full-corpus job you can run, and the one you run most)."""
    from goose_parser_spark.ops.textstats import quality_score, token_count
    docs = _documents_amplified(spark, sf_dir)
    q = quality_score("text")
    tok = token_count("text")
    return (docs.groupBy("source")
            .agg(F.count("*").alias("n_docs"),
                 F.sum(tok.cast("long")).alias("n_tokens"),
                 F.sum(q.cast("decimal(18,6)")).cast("decimal(18,6)")
                  .cast("string").alias("quality_mass"),
                 F.count(F.when(q < 0.4, 1)).alias("n_low"),
                 F.count(F.when(tok < 20, 1)).alias("n_short")))


SQL_CORPUS_PROFILE = f"""
WITH {_SQL_DOCS_AMP_COPY}, scored AS (
  SELECT source, len(string_split(text, ' ')) AS tok,
         {_SQL_QUALITY_EXPR} AS q
  FROM docs_amp
)
SELECT source, count(*) AS n_docs,
       CAST(sum(tok) AS BIGINT) AS n_tokens,
       CAST(CAST(sum(CAST(q AS DECIMAL(18,6))) AS DECIMAL(18,6))
            AS VARCHAR) AS quality_mass,
       count(CASE WHEN q < 0.4 THEN 1 END) AS n_low,
       count(CASE WHEN tok < 20 THEN 1 END) AS n_short
FROM scored GROUP BY source
"""


def q_lm_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unigram-LM perplexity-proxy quality scoring (CCNet-style): each
    doc scored under the corpus's own smoothed unigram distribution.
    Integer micro-nat accumulation → float order never enters, fully
    oracle-checkable (ops/textstats.py)."""
    from goose_parser_spark.ops.textstats import unigram_logprob
    docs = _documents_amplified(spark, sf_dir)
    return unigram_logprob(docs.select("doc_id", "text"))


SQL_LM_SCORE = f"""
WITH {_SQL_DOCS_AMP_COPY}, tok AS (
  SELECT doc_id,
         unnest(list_filter(string_split(text, ' '), x -> x != '')) AS t
  FROM docs_amp
), cnt AS (
  SELECT t, count(*) AS c FROM tok GROUP BY t
), tot AS (
  SELECT (SELECT count(*) FROM tok) AS n,
         (SELECT count(*) FROM cnt) AS v
)
SELECT doc_id, count(*) AS n_tokens,
       CAST(sum(CAST(round(ln((c + 1.0) / (n + v)) * 1000000) AS BIGINT))
            AS BIGINT) AS logprob_micro
FROM tok JOIN cnt USING (t) CROSS JOIN tot
GROUP BY doc_id
"""


def q_bigram_lm_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interpolated-bigram LM scoring (ops/textstats.py
    bigram_logprob): P(w2|w1) = 0.8·bigram + 0.2·smoothed-unigram,
    first token unigram-only. Integer micro-nat accumulation — the
    whole model (counts, interpolation, log) replays in DuckDB."""
    from goose_parser_spark.ops.textstats import bigram_logprob
    docs = _documents_amplified(spark, sf_dir)
    return bigram_logprob(docs.select("doc_id", "text"))


SQL_BIGRAM_LM_SCORE = f"""
WITH {_SQL_DOCS_AMP_COPY}, words AS (
  SELECT doc_id, list_filter(string_split(text, ' '), x -> x != '') AS w
  FROM docs_amp
), tok AS (
  SELECT doc_id, unnest(w) AS t FROM words
), cnt AS (
  SELECT t, count(*) AS c FROM tok GROUP BY t
), tot AS (
  SELECT (SELECT count(*) FROM tok) AS n,
         (SELECT count(*) FROM cnt) AS v
), pairs AS (
  SELECT doc_id, w[i] AS w1, w[i + 1] AS w2
  FROM (SELECT doc_id, w, unnest(range(1, len(w))) AS i FROM words
        WHERE len(w) >= 2)
), bc AS (
  SELECT w1, w2, count(*) AS bc FROM pairs GROUP BY 1, 2
), hc AS (
  SELECT w1, count(*) AS hc FROM pairs GROUP BY 1
), pair_lp AS (
  SELECT p.doc_id,
         CAST(round(ln(0.8 * b.bc / h.hc
                       + 0.2 * (u.c + 1.0) / (t.n + t.v)) * 1000000)
              AS BIGINT) AS lp
  FROM pairs p JOIN bc b USING (w1, w2) JOIN hc h USING (w1)
  JOIN cnt u ON u.t = p.w2 CROSS JOIN tot t
), first_lp AS (
  SELECT doc_id,
         CAST(round(ln((u.c + 1.0) / (t.n + t.v)) * 1000000)
              AS BIGINT) AS lp
  FROM (SELECT doc_id, w[1] AS t FROM words WHERE len(w) >= 1) f
  JOIN cnt u USING (t) CROSS JOIN tot t
), allc AS (
  SELECT * FROM first_lp UNION ALL SELECT * FROM pair_lp
)
SELECT doc_id, count(*) AS n_tokens,
       CAST(sum(lp) AS BIGINT) AS logprob_micro
FROM allc GROUP BY doc_id
"""


def q_ccnet_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet head/middle/tail partition (ops/textstats.py
    perplexity_buckets): integer per-token unigram-LM score, exact
    per-language terciles, three-way bucket assignment. The whole
    chain — scoring, thresholds, cuts — replays in DuckDB."""
    from goose_parser_spark.ops.textstats import (
        perplexity_buckets, unigram_logprob)
    docs = _documents_amplified(spark, sf_dir)
    lm = unigram_logprob(docs.select("doc_id", "text"))
    scored = (lm.join(docs.select("doc_id", "lang"), on="doc_id")
              .select("doc_id", "lang",
                      F.expr("(-logprob_micro) DIV n_tokens")
                      .alias("ppl_micro")))
    return perplexity_buckets(scored)


SQL_CCNET_BUCKETS = f"""
WITH {_SQL_DOCS_AMP_COPY}, tok AS (
  SELECT doc_id,
         unnest(list_filter(string_split(text, ' '), x -> x != '')) AS t
  FROM docs_amp
), cnt AS (
  SELECT t, count(*) AS c FROM tok GROUP BY t
), tot AS (
  SELECT (SELECT count(*) FROM tok) AS n,
         (SELECT count(*) FROM cnt) AS v
), lm AS (
  SELECT doc_id, count(*) AS n_tokens,
         sum(CAST(round(ln((c + 1.0) / (n + v)) * 1000000) AS BIGINT))
             AS logprob_micro
  FROM tok JOIN cnt USING (t) CROSS JOIN tot
  GROUP BY doc_id
), scored AS (
  SELECT d.doc_id, d.lang,
         (-lm.logprob_micro) // lm.n_tokens AS ppl_micro
  FROM docs_amp d JOIN lm USING (doc_id)
), th AS (
  SELECT lang,
         round(quantile_cont(ppl_micro, 1.0/3), 4) AS t1,
         round(quantile_cont(ppl_micro, 2.0/3), 4) AS t2
  FROM scored GROUP BY lang
)
SELECT s.doc_id, s.lang, CAST(s.ppl_micro AS BIGINT) AS ppl_micro,
       CASE WHEN s.ppl_micro <= th.t1 THEN 'head'
            WHEN s.ppl_micro <= th.t2 THEN 'middle'
            ELSE 'tail' END AS bucket
FROM scored s JOIN th USING (lang)
"""


def q_imgtext_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LAION-style image-text pair mining through the extraction
    engine (ops/metadata.py extract_image_text_pairs): captioned
    figures + bare images with alt text; every 13th doc also carries a
    src-less image that must be dropped. Map-only."""
    from goose_parser_spark.ops.metadata import extract_image_text_pairs
    base = _documents_amplified(spark, sf_dir)
    d = F.col("doc_id")
    s = d.cast("string")
    html = F.concat(
        F.lit('<html><body><figure><img src="/img/'), s,
        F.lit('-a.jpg" alt="alt a '), s,
        F.lit('"><figcaption>Caption '), s,
        F.lit("</figcaption></figure>"),
        F.lit('<p><img src="/img/'), s, F.lit('-b.png" alt="alt b '), s,
        F.lit('"></p>'),
        F.when(d % 13 == 0, F.lit('<img alt="srcless">'))
         .otherwise(F.lit("")),
        F.lit("</body></html>"))
    pages = base.select(
        F.concat(F.lit("https://site.test/p/"), s).alias("url"),
        F.encode(html, "utf-8").alias("html"))
    return extract_image_text_pairs(pages)


SQL_IMGTEXT_PAIRS = f"""
WITH {_SQL_DOCS_AMP_COPY}
SELECT 'https://site.test/p/' || doc_id AS url, 'figure' AS kind,
       '/img/' || doc_id || '-a.jpg' AS src,
       'alt a ' || doc_id AS alt,
       'Caption ' || doc_id AS caption,
       'Caption ' || doc_id AS text
FROM docs_amp
UNION ALL
SELECT 'https://site.test/p/' || doc_id, 'img',
       '/img/' || doc_id || '-a.jpg', 'alt a ' || doc_id, '',
       'alt a ' || doc_id
FROM docs_amp
UNION ALL
SELECT 'https://site.test/p/' || doc_id, 'img',
       '/img/' || doc_id || '-b.png', 'alt b ' || doc_id, '',
       'alt b ' || doc_id
FROM docs_amp
"""


def q_dedup_by_url(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Crawl-frontier dedup BY CANONICAL URL — the first dedup a crawl
    runs, before any parsing: re-fetches of one page under different
    tracking junk / host case / trailing slashes collapse to one row
    (smallest doc_id wins). One canonicalizing projection + one
    hash-agg; 10 raw urls per page variant here, so the corpus shrinks
    10×."""
    from goose_parser_spark.ops.urls import url_canonicalize
    docs = _documents_amplified(spark, sf_dir)
    page = (F.col("doc_id") / 10).cast("long")   # 10 fetches per page
    junk = F.col("doc_id") % 10
    s = page.cast("string")
    raw = (F.when(junk == 0, F.concat(F.lit("https://Site.COM/p"), s))
           .when(junk == 1, F.concat(F.lit("https://site.com/p"), s,
                                     F.lit("/")))
           .when(junk == 2, F.concat(F.lit("https://site.com:443/p"), s))
           .when(junk == 3, F.concat(F.lit("https://site.com/p"), s,
                                     F.lit("?utm_source=a")))
           .when(junk == 4, F.concat(F.lit("https://site.com/p"), s,
                                     F.lit("?utm_medium=b&gclid=x")))
           .when(junk == 5, F.concat(F.lit("https://site.com/p"), s,
                                     F.lit("#section")))
           .when(junk == 6, F.concat(F.lit("https://SITE.com/p"), s,
                                     F.lit("?fbclid=z")))
           .when(junk == 7, F.concat(F.lit("https://site.com/p"), s,
                                     F.lit("/?ref=tw")))
           .when(junk == 8, F.concat(F.lit("https://site.com/p"), s,
                                     F.lit("?utm_campaign=c#f")))
           .otherwise(F.concat(F.lit("https://site.com:443/p"), s,
                               F.lit("/"))))
    canon = url_canonicalize(raw)
    return (docs.select("doc_id", canon.alias("canon"))
            .groupBy("canon")
            .agg(F.min("doc_id").alias("doc_id"),
                 F.count("*").alias("n_fetches")))


SQL_DEDUP_BY_URL = f"""
WITH {_SQL_DOCS_AMP_COPY}
SELECT 'https://site.com/p' || (doc_id // 10) AS canon,
       min(doc_id) AS doc_id, count(*) AS n_fetches
FROM docs_amp GROUP BY 1
"""


def q_pack_materialize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Emit the packed TRAINING SEQUENCES themselves: pack_sequences
    assignments joined back to text, members array_sort-ed by offset
    before concatenation (collect_list order is not deterministic
    under retries — sorting restores bit-identical output)."""
    from goose_parser_spark.ops.sampling import (
        materialize_sequences, pack_sequences)
    from goose_parser_spark.ops.textstats import token_count
    docs = _documents_amplified(spark, sf_dir)
    with_tok = docs.select("doc_id", "text",
                           token_count("text").alias("n_tokens"))
    packed = pack_sequences(with_tok, "n_tokens", "doc_id",
                            tokens_per_seq=2048, buckets=16)
    return materialize_sequences(packed)


SQL_PACK_MATERIALIZE = f"""
WITH {_SQL_DOCS_AMP_COPY}, tok AS (
  SELECT doc_id, text, len(string_split(text, ' ')) AS n_tokens,
         CAST(CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 4))
              AS INTEGER) % 16 AS INTEGER) AS bucket
  FROM docs_amp
), packed AS (
  SELECT doc_id, text, n_tokens, bucket,
         CAST(sum(n_tokens) OVER (PARTITION BY bucket ORDER BY doc_id
                                  ROWS UNBOUNDED PRECEDING) - n_tokens
              AS BIGINT) AS seq_offset
  FROM tok
)
SELECT bucket, CAST(floor(seq_offset * 1.0 / 2048) AS BIGINT) AS seq_id,
       count(*) AS n_docs,
       CAST(sum(n_tokens) AS BIGINT) AS seq_tokens,
       string_agg(text, '<|doc|>' ORDER BY seq_offset, doc_id) AS seq_text
FROM packed GROUP BY 1, 2
"""


def q_frontier_urls(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Crawl-frontier expansion: extracted outlinks → resolve against
    the page URL → canonicalize → anti-join the already-crawled set →
    per-target reference counts. The complete next-crawl-wave query,
    built from the REAL DOM extraction (not a parsed-href shortcut).
    Crawled set here = the pages themselves plus the even-numbered
    external targets (pretend an earlier wave fetched those)."""
    from goose_parser_spark.ops.urls import resolve_href, url_canonicalize
    pages = _link_pages(spark, sf_dir)
    rules = {"scope": "p.lnk", "collection": [[
        {"name": "href", "scope": "a", "attr": "href"},
    ]]}
    links = extract(pages, rules).select("url", F.inline("extracted"))
    resolved = url_canonicalize(
        resolve_href(F.col("url"), F.col("href")))
    docs = _documents_amplified(spark, sf_dir)
    crawled = (docs.select(
        F.concat(F.lit("https://docs.test/"),
                 F.col("doc_id").cast("string")).alias("u"))
        .unionByName(docs.where(F.col("doc_id") % 2 == 0).select(
            F.concat(F.lit("https://ext.test/"),
                     F.col("doc_id").cast("string")).alias("u"))))
    return (links.select(resolved.alias("frontier_url"))
            .where(F.col("frontier_url").isNotNull())  # mailto:/tel:/…
            .join(crawled.withColumnRenamed("u", "frontier_url"),
                  on="frontier_url", how="left_anti")
            .groupBy("frontier_url")
            .agg(F.count("*").alias("n_refs")))


SQL_FRONTIER_URLS = f"""
WITH {_SQL_DOCS_AMP_COPY}, links AS (
  SELECT 'https://docs.test/u/' || doc_id || '/a' AS u FROM docs_amp
  UNION ALL
  SELECT 'https://docs.test/u/' || doc_id || '/b' FROM docs_amp
  UNION ALL
  SELECT 'https://ext.test/' || doc_id FROM docs_amp WHERE doc_id % 3 = 0
), crawled AS (
  SELECT 'https://docs.test/' || doc_id AS u FROM docs_amp
  UNION ALL
  SELECT 'https://ext.test/' || doc_id FROM docs_amp WHERE doc_id % 2 = 0
)
SELECT u AS frontier_url, count(*) AS n_refs
FROM links WHERE u NOT IN (SELECT u FROM crawled)
GROUP BY u
"""


def q_c4_clean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4-style line cleanup (Raffel et al. 2020 heuristics): keep
    lines with ≥3 words ending in terminal punctuation, dedup repeated
    lines within the doc (ops/textstats.c4_line_filter). Line
    structure is synthesized per doc (testdata has no newlines):
    2 keepers, a short line, a duplicate, a no-punct line."""
    from goose_parser_spark.ops.textstats import c4_line_filter
    docs = _documents_amplified(spark, sf_dir)
    s = F.col("doc_id").cast("string")
    l1 = F.concat(F.lit("Alpha "), F.substring("text", 1, 20),
                  F.lit(" ends well."))
    l5 = F.concat(F.lit("Doc "), s, F.lit(" closes the case!"))
    lines = F.concat_ws("\n", l1, F.lit("too short"), l1,
                        F.lit("no terminal punctuation line"), l5)
    return c4_line_filter(docs.select("doc_id", lines.alias("text")))


SQL_C4_CLEAN = f"""
WITH {_SQL_DOCS_AMP_COPY}, built AS (
  SELECT doc_id,
         'Alpha ' || substr(text, 1, 20) || ' ends well.' AS l1,
         'Doc ' || doc_id || ' closes the case!' AS l5
  FROM docs_amp
), ex AS (
  SELECT doc_id, ls[u] AS line, u
  FROM (SELECT doc_id,
               [l1, 'too short', l1, 'no terminal punctuation line', l5]
                 AS ls,
               unnest(range(1, 6)) AS u
        FROM built)
), kept AS (
  SELECT doc_id, line, u,
         row_number() OVER (PARTITION BY doc_id, line ORDER BY u) AS rn
  FROM ex
  WHERE len(list_filter(string_split(line, ' '), w -> w != '')) >= 3
    AND regexp_matches(line, '[.!?"'']\\s*$')
)
SELECT d.doc_id,
       coalesce(k.clean, '') AS clean,
       5 AS n_lines,
       coalesce(k.n_kept, 0) AS n_kept
FROM docs_amp d LEFT JOIN (
  SELECT doc_id, string_agg(line, chr(10) ORDER BY u) AS clean,
         CAST(count(*) AS INTEGER) AS n_kept
  FROM kept WHERE rn = 1 GROUP BY doc_id) k USING (doc_id)
"""


def q_script_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unicode-script profile (ops/textstats.script_profile): per-doc
    character counts for Latin/Cyrillic/Han/Arabic + script verdict.
    Docs are salted with deterministic non-Latin runs per variant so
    every class and verdict is exercised."""
    from goose_parser_spark.ops.textstats import script_profile
    docs = _documents_amplified(spark, sf_dir)
    v = F.col("doc_id") % 4
    base = F.substring("text", 1, 30)
    salted = (F.when(v == 0, F.concat(
                  base, F.lit(" привет мир привет мир привет мир привет")))
              .when(v == 1, F.concat(
                  base, F.lit(" 漢字文化圏の文字は表意文字である漢字文化圏の文字")))
              .when(v == 2, F.concat(
                  base, F.lit(" مرحبا بالعالم مرحبا بالعالم مرحبا بالعالم")))
              .otherwise(base))
    return script_profile(docs.select("doc_id", salted.alias("text")))


SQL_SCRIPT_STATS = f"""
WITH {_SQL_DOCS_AMP_COPY}, salted AS (
  SELECT doc_id,
         substr(text, 1, 30) ||
         CASE doc_id % 4
           WHEN 0 THEN ' привет мир привет мир привет мир привет'
           WHEN 1 THEN ' 漢字文化圏の文字は表意文字である漢字文化圏の文字'
           WHEN 2 THEN ' مرحبا بالعالم مرحبا بالعالم مرحبا بالعالم'
           ELSE ''
         END AS t
  FROM docs_amp
), counted AS (
  SELECT doc_id,
    CAST(length(t) - length(regexp_replace(t, '\\p{{Latin}}', '', 'g'))
         AS INTEGER) AS n_latin,
    CAST(length(t) - length(regexp_replace(t, '\\p{{Cyrillic}}', '', 'g'))
         AS INTEGER) AS n_cyrillic,
    CAST(length(t) - length(regexp_replace(t, '\\p{{Han}}', '', 'g'))
         AS INTEGER) AS n_han,
    CAST(length(t) - length(regexp_replace(t, '\\p{{Arabic}}', '', 'g'))
         AS INTEGER) AS n_arabic
  FROM salted
)
SELECT doc_id, n_latin, n_cyrillic, n_han, n_arabic,
       CASE
         WHEN n_latin >= n_cyrillic AND n_latin >= n_han
              AND n_latin >= n_arabic AND n_latin > 0 THEN 'latin'
         WHEN n_cyrillic >= n_latin AND n_cyrillic >= n_han
              AND n_cyrillic >= n_arabic AND n_cyrillic > 0 THEN 'cyrillic'
         WHEN n_han >= n_latin AND n_han >= n_cyrillic
              AND n_han >= n_arabic AND n_han > 0 THEN 'han'
         WHEN n_arabic >= n_latin AND n_arabic >= n_cyrillic
              AND n_arabic >= n_han AND n_arabic > 0 THEN 'arabic'
         ELSE 'und'
       END AS script_pred
FROM counted
"""


def q_dsir_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR importance weights (Xie et al. 2023): raw docs scored by
    hashed-unigram log-likelihood ratio target-vs-raw, integer
    micro-nats (ops/sampling.dsir_logratio). Target = source 'src0';
    raw = the rest."""
    from goose_parser_spark.ops.sampling import dsir_logratio
    docs = _documents_amplified(spark, sf_dir)
    target = docs.where(F.col("source") == "src0").select("doc_id", "text")
    raw = docs.where(F.col("source") != "src0").select("doc_id", "text")
    return dsir_logratio(raw, target, buckets=512)


SQL_DSIR_SAMPLE = f"""
WITH {_SQL_DOCS_AMP_COPY}, rawt AS (
  SELECT doc_id,
         unnest(list_filter(string_split(text, ' '), x -> x != '')) AS t
  FROM docs_amp WHERE source != 'src0'
), tgtt AS (
  SELECT doc_id,
         unnest(list_filter(string_split(text, ' '), x -> x != '')) AS t
  FROM docs_amp WHERE source = 'src0'
), rb AS (
  SELECT doc_id,
         CAST(('0x' || substr(md5(t), 1, 8)) AS BIGINT) % 512 AS b
  FROM rawt
), tb AS (
  SELECT CAST(('0x' || substr(md5(t), 1, 8)) AS BIGINT) % 512 AS b
  FROM tgtt
), tc AS (SELECT b, count(*) AS ct FROM tb GROUP BY b),
rc AS (SELECT b, count(*) AS cr FROM rb GROUP BY b),
tot AS (SELECT (SELECT count(*) FROM tb) AS nt,
               (SELECT count(*) FROM rb) AS nr)
SELECT doc_id, count(*) AS n_tokens,
       CAST(sum(CAST(round(ln((coalesce(ct, 0) + 1.0) / (nt + 512))
                           * 1000000) AS BIGINT)
                - CAST(round(ln((coalesce(cr, 0) + 1.0) / (nr + 512))
                             * 1000000) AS BIGINT)) AS BIGINT) AS dsir_micro
FROM rb LEFT JOIN tc USING (b) LEFT JOIN rc USING (b) CROSS JOIN tot
GROUP BY doc_id
"""


def q_bloom_frontier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-filter frontier membership (ops/bloom.py): build the
    fixed-size seen-set over the crawled urls, probe a candidate wave
    (half re-crawls, half new). md5-derived bits → the oracle
    reproduces the filter INCLUDING its false positives exactly."""
    from goose_parser_spark.ops.bloom import bloom_build, bloom_probe
    docs = _documents_amplified(spark, sf_dir)
    s = F.col("doc_id").cast("string")
    crawled = docs.select(
        F.concat(F.lit("https://docs.test/"), s).alias("url"))
    bloom = bloom_build(crawled, "url", n_words=2048, k=3)
    cand = docs.select(
        "doc_id",
        F.when(F.col("doc_id") % 2 == 0,
               F.concat(F.lit("https://docs.test/"), s))
         .otherwise(F.concat(F.lit("https://new.test/"), s)).alias("url"))
    return bloom_probe(cand, bloom, "url", n_words=2048, k=3)


SQL_BLOOM_FRONTIER = f"""
WITH {_SQL_DOCS_AMP_COPY}, crawled AS (
  SELECT 'https://docs.test/' || doc_id AS url FROM docs_amp
), probes AS (
  SELECT CAST(('0x' || substr(md5(url || ':' || r.range), 1, 15))
              AS BIGINT) % 122880 AS pos
  FROM crawled CROSS JOIN range(3) r
), words AS (
  SELECT pos // 60 AS w,
         bit_or(CAST(1 AS BIGINT) << CAST(pos % 60 AS INTEGER)) AS word
  FROM probes GROUP BY 1
), cand AS (
  SELECT doc_id,
         CASE WHEN doc_id % 2 = 0 THEN 'https://docs.test/' || doc_id
              ELSE 'https://new.test/' || doc_id END AS url
  FROM docs_amp
), cp AS (
  SELECT doc_id, url,
         CAST(('0x' || substr(md5(url || ':' || r.range), 1, 15))
              AS BIGINT) % 122880 AS pos
  FROM cand CROSS JOIN range(3) r
)
SELECT doc_id, url,
       min(CASE WHEN word IS NOT NULL
                 AND (word & (CAST(1 AS BIGINT)
                              << CAST(pos % 60 AS INTEGER)))
                     = (CAST(1 AS BIGINT) << CAST(pos % 60 AS INTEGER))
                THEN 1 ELSE 0 END) = 1 AS maybe_seen
FROM cp LEFT JOIN words ON words.w = cp.pos // 60
GROUP BY doc_id, url
"""


def q_link_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Integer-PageRank authority over a deterministic link graph
    (ops/linkgraph.pagerank_int): 2 candidate outlinks per page
    (×2+1, ×3+7), endpoints outside the crawl dropped, 2 iterations,
    damping 0.85 — all long arithmetic, order-free sums."""
    from goose_parser_spark.ops.linkgraph import pagerank_int
    docs = _documents_amplified(spark, sf_dir)
    ids = docs.select("doc_id")
    d = F.col("doc_id")
    edges = (docs.select(d.alias("src"), (d * 2 + 1).alias("dst"))
             .unionByName(
                 docs.select(d.alias("src"), (d * 3 + 7).alias("dst"))))
    return pagerank_int(ids, edges, iterations=2)


SQL_LINK_PAGERANK = f"""
WITH {_SQL_DOCS_AMP_COPY}, nodes AS (
  SELECT DISTINCT doc_id AS node FROM docs_amp
), raw_edges AS (
  SELECT doc_id AS src, doc_id * 2 + 1 AS dst FROM docs_amp
  UNION ALL
  SELECT doc_id, doc_id * 3 + 7 FROM docs_amp
), e AS (
  SELECT DISTINCT src, dst FROM raw_edges
  WHERE src IN (SELECT node FROM nodes)
    AND dst IN (SELECT node FROM nodes)
), deg AS (SELECT src, count(*) AS outdeg FROM e GROUP BY 1),
r0 AS (SELECT node, CAST(1000000 AS BIGINT) AS rank FROM nodes),
s1 AS (
  SELECT e.dst AS node,
         CAST(sum(CAST(floor(r0.rank / deg.outdeg) AS BIGINT)) AS BIGINT)
           AS s
  FROM e JOIN deg USING (src) JOIN r0 ON r0.node = e.src
  GROUP BY 1
), r1 AS (
  SELECT n.node,
         CAST(150000 + floor(850 * coalesce(s1.s, 0) / 1000) AS BIGINT)
           AS rank
  FROM nodes n LEFT JOIN s1 USING (node)
), s2 AS (
  SELECT e.dst AS node,
         CAST(sum(CAST(floor(r1.rank / deg.outdeg) AS BIGINT)) AS BIGINT)
           AS s
  FROM e JOIN deg USING (src) JOIN r1 ON r1.node = e.src
  GROUP BY 1
), r2 AS (
  SELECT n.node,
         CAST(150000 + floor(850 * coalesce(s2.s, 0) / 1000) AS BIGINT)
           AS rank
  FROM nodes n LEFT JOIN s2 USING (node)
)
SELECT node AS doc_id, rank AS rank_micro FROM r2
"""


def q_phash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal near-dup: REAL perceptual hash — fixed-point 8x8 DCT
    over the decoded grayscale grid, AC median threshold
    (ops/multimodal.phash_dct, VERDICT r04 #6) → pigeonhole Hamming
    pairs ≤ 3 (ops/dedup.hamming_pairs). Replica groups share a base
    image; per-doc pixel jitter ((doc_id%4)*74 on pixel 0) plants
    perceptually-near variants whose DCT bits differ by 0-few — the
    oracle replays the identical integer DCT sums."""
    from goose_parser_spark.ops.dedup import hamming_pairs
    from goose_parser_spark.ops.multimodal import phash_dct
    docs = _documents_amplified(spark, sf_dir)
    pg = F.floor(F.col("doc_id") / 23).cast("long")
    payload = F.encode(F.concat(F.lit("img-"), pg.cast("string")), "utf-8")
    jit = (F.col("doc_id") % 4) * 74
    fp = phash_dct(docs.select("doc_id", payload.alias("payload")),
                   pixel_jitter=jit)
    # materialize the narrow (doc_id, phash) table before the
    # self-join: hamming_pairs references its input on BOTH sides, and
    # inlining the ~1000-expression DCT chain twice into the join
    # stage blows codegen into interpreted fallback (~30x slower). At
    # 100 TB this is the same shape: the fingerprint table is computed
    # once (16 bytes/doc) and the pair join reads it, not the images.
    fp = fp.localCheckpoint()
    return hamming_pairs(fp, "phash", max_hamming=3, bits=60)


def _sql_phash_chain(keys: str = "doc_id") -> str:
    """The g/ac/acm/h CTE tail computing the fixed-point-DCT pHash in
    DuckDB from an upstream ``pix`` CTE exposing ``{keys}, p0..p63``
    (the 8x8 image row-major; ``keys`` may be a composite like
    ``doc_id, frame_no`` for the video oracle). Generated from the
    SAME integer basis table (ops/multimodal.DCT_C) the Spark op
    uses — never hand-copied, so the two cannot drift. Shared by the
    PGM-decode, phash-pairs, JPEG-decode and video-frame oracles."""
    from goose_parser_spark.ops.multimodal import DCT_C, PHASH_AC_ORDER
    gs = ",\n         ".join(
        " + ".join(f"{DCT_C[u][x]}*p{8 * x + y}" for x in range(8))
        + f" AS g{u}_{y}"
        for u in range(8) for y in range(8))
    acs = ",\n          ".join(
        " + ".join(f"{DCT_C[v][y]}*g{u}_{y}" for y in range(8))
        for (u, v) in PHASH_AC_ORDER)
    bits = " + ".join(
        f"CASE WHEN acl[{k + 1}] > med THEN {1 << k} ELSE 0 END"
        for k in range(len(PHASH_AC_ORDER)))
    return f"""g AS (
  SELECT {keys},
         {gs}
  FROM pix
), ac AS (
  SELECT {keys}, [{acs}] AS acl FROM g
), acm AS (
  SELECT {keys}, acl, list_sort(acl)[30] AS med FROM ac
), h AS (
  SELECT {keys}, CAST({bits} AS BIGINT) AS fp FROM acm
)"""


def _sql_phash_dct(jit_sql: str = "(doc_id % 4) * 74") -> str:
    """Digest-chain pixel CTEs (the PGM authoring path) + the shared
    pHash chain. ``jit_sql`` is the pixel-0 jitter expression ('0'
    for the real-decode query, which feeds unjittered digest
    bytes)."""
    digs = ",\n         ".join(
        f"md5(_h || ':{j}') AS _d{j}" for j in range(4))
    pix = ",\n         ".join(
        (f"least(greatest(CAST(('0x' || substr(_d0, 1, 2)) AS BIGINT)"
         " + _jit, 0), 255) AS p0" if k == 0 else
         f"CAST(('0x' || substr(_d{k // 16}, {(k % 16) * 2 + 1}, 2)) "
         f"AS BIGINT) AS p{k}")
        for k in range(64))
    return f"""ph0 AS (
  SELECT doc_id, md5('img-' || (doc_id // 23)) AS _h,
         {jit_sql} AS _jit
  FROM docs_amp
), dg AS (
  SELECT doc_id, _jit,
         {digs}
  FROM ph0
), pix AS (
  SELECT doc_id,
         {pix}
  FROM dg
), {_sql_phash_chain()}"""


SQL_PHASH_PAIRS = f"""
WITH {_SQL_DOCS_AMP_COPY}, {_sql_phash_dct()}, blocks AS (
  SELECT doc_id, fp, r.range AS blk,
         (fp >> CAST(r.range * 15 AS INTEGER)) & 32767 AS bv
  FROM h CROSS JOIN range(4) r
), cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM blocks a JOIN blocks b
    ON a.blk = b.blk AND a.bv = b.bv AND a.doc_id < b.doc_id
)
SELECT DISTINCT doc_a, doc_b,
       CAST(bit_count(xor(ha.fp, hb.fp)) AS INTEGER) AS hamming
FROM cand
JOIN h ha ON ha.doc_id = doc_a
JOIN h hb ON hb.doc_id = doc_b
WHERE bit_count(xor(ha.fp, hb.fp)) <= 3
"""

def q_phash_image_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The REAL image decoder under the value oracle: 8x8 PGM images
    are authored JVM-side (binary concat of the P5 header + unhex of
    the SAME md5 digest chain phash_dct derives pixels from), then
    phash_image decodes them with the pure-stdlib codec and hashes the
    genuinely decoded pixels. The oracle replays phash_dct's digest
    arithmetic with jitter 0 — so the decode must reproduce every
    pixel byte exactly or the 60-bit hashes diverge."""
    from goose_parser_spark.ops.multimodal import phash_image
    docs = _documents_amplified(spark, sf_dir)
    pg = F.floor(F.col("doc_id") / 23).cast("long")
    h = F.md5(F.encode(
        F.concat(F.lit("img-"), pg.cast("string")), "utf-8"))
    parts = [F.unhex(F.md5(F.concat(h, F.lit(f":{j}"))))
             for j in range(4)]
    payload = F.concat(F.encode(F.lit("P5 8 8 255\n"), "utf-8"), *parts)
    return phash_image(docs.select("doc_id", payload.alias("payload")))


SQL_PHASH_IMAGE_DECODE = f"""
WITH {_SQL_DOCS_AMP_COPY}, {_sql_phash_dct(jit_sql="0")}
SELECT doc_id, fp AS phash FROM h
"""


def _jpeg_dc_header() -> bytes:
    """Fixed header of the oracle-authored DC-only baseline JPEGs:
    16x16 single-component SOF0, quant table q0=8 (rest 1), and
    DEGENERATE all-8-bit-code Huffman tables — DC categories 0-11 at
    length 8 (canonical code for category c = byte c) and a
    single-symbol AC table (EOB = byte 0), so every scan block is
    EXACTLY the 3 hand-predictable bytes [0x08, diff, 0x00] and the
    whole scan stays byte-aligned. With q0=8 a DC-only block decodes
    to the flat value clamp(cumulative_DC + 128) exactly (integer
    IDCT identity, pinned by test_dc_only_blocks_are_exactly_flat)."""
    import struct as st
    quant = bytes([8] + [1] * 63)
    dc_counts = bytes([0] * 7 + [12] + [0] * 8)
    dc_syms = bytes(range(12))
    ac_counts = bytes([0] * 7 + [1] + [0] * 8)
    ac_syms = bytes([0])
    return (b"\xff\xd8"
            + b"\xff\xdb" + st.pack(">H", 67) + b"\x00" + quant
            + b"\xff\xc0" + st.pack(">HBHHB", 11, 8, 16, 16, 1)
            + bytes([1, 0x11, 0])
            + b"\xff\xc4" + st.pack(">H", 19 + 12) + b"\x00"
            + dc_counts + dc_syms
            + b"\xff\xc4" + st.pack(">H", 19 + 1) + b"\x10"
            + ac_counts + ac_syms
            + b"\xff\xda" + st.pack(">H", 8)
            + bytes([1, 1, 0x00, 0, 63, 0]))


def q_jpeg_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The REAL baseline-JPEG decoder under the value oracle: DC-only
    16x16 JPEGs are authored JVM-side (fixed header + 4 blocks of
    [cat8-code, diff-byte, EOB] where the diff bytes come straight
    from an md5 digest — 0xff remapped to 0xfe so no byte-stuffing
    arises), then phash_image runs the full Huffman → dequant →
    integer-IDCT pipeline on them. Each 8x8 block decodes to a flat
    quadrant clamp(cumDC+128); the box resize preserves the quadrants
    and the shared DCT chain hashes them. The oracle re-derives the
    quadrant values from the same digest arithmetic — one wrong bit
    anywhere in the entropy decode, predictor, dequant or IDCT and
    the 60-bit hashes diverge."""
    from goose_parser_spark.ops.multimodal import phash_image
    docs = _documents_amplified(spark, sf_dir)
    pg = F.floor(F.col("doc_id") / 23).cast("long")
    h = F.md5(F.encode(
        F.concat(F.lit("jpg-"), pg.cast("string")), "utf-8"))
    payload = _jpeg_payload_from(h)
    return phash_image(docs.select("doc_id", payload.alias("payload")))


def _sql_dc_jpeg_pix(keys: str = "doc_id", out: str = "pix") -> str:
    """jb→jv→jq→{out} CTE tail decoding the oracle-authored DC-only
    16x16 JPEG arithmetically: an upstream CTE ``jp0`` exposes
    ``{keys}, _h`` (the digest whose first 4 hex pairs are the diff
    bytes, ff→fe remapped); output CTE ``{out}`` (default ``pix``)
    exposes ``{keys}, p0..p63``. Diff bytes are category-8 EXTEND-ed
    (byte≥128 → +byte, else byte−255), DC accumulates per raster
    block, each block is the flat quadrant clamp(cum+128). Shared by
    the still-JPEG, AVI/MJPEG video and PDF-figure oracles."""
    bexprs = []
    for j in range(4):
        raw = f"substr(_h, {j * 2 + 1}, 2)"
        bexprs.append(
            f"CASE WHEN {raw} = 'ff' THEN 254 "
            f"ELSE CAST(('0x' || {raw}) AS BIGINT) END AS b{j}")
    vexprs = [
        f"CASE WHEN b{j} >= 128 THEN b{j} ELSE b{j} - 255 END AS v{j}"
        for j in range(4)]
    qexprs = [
        "least(greatest(" + " + ".join(f"v{i}" for i in range(j + 1))
        + " + 128, 0), 255) AS q" + str(j)
        for j in range(4)]
    # 8x8 resized image row-major: pixel k sits in quadrant
    # (row//4)*2 + (col//4) with row = k//8, col = k%8
    pexprs = [f"q{(k // 32) * 2 + ((k % 8) // 4)} AS p{k}"
              for k in range(64)]
    return f"""jb AS (
  SELECT {keys}, {', '.join(bexprs)} FROM jp0
), jv AS (
  SELECT {keys}, {', '.join(vexprs)} FROM jb
), jq AS (
  SELECT {keys}, {', '.join(qexprs)} FROM jv
), {out} AS (
  SELECT {keys}, {', '.join(pexprs)} FROM jq
)"""


def _sql_jpeg_decode() -> str:
    """Generated DuckDB replay of q_jpeg_decode: the shared DC-only
    quadrant decode + the SAME generated pHash chain."""
    return f"""jp0 AS (
  SELECT doc_id, md5('jpg-' || (doc_id // 23)) AS _h FROM docs_amp
), {_sql_dc_jpeg_pix()}, {_sql_phash_chain()}"""


SQL_JPEG_DECODE = f"""
WITH {_SQL_DOCS_AMP_COPY}, {_sql_jpeg_decode()}
SELECT doc_id, fp AS phash FROM h
"""


def _pdf_images_payload(hj: Column, hg: Column) -> Column:
    """A complete PDF authored as JVM-side byte concat: catalog +
    page tree + a tiny content stream + TWO image XObjects — a
    16x16 DCTDecode image whose JPEG bytes are the shared DC-only
    brick seeded by digest ``hj``, and an 8x8 raw /DeviceGray image
    whose 64 bytes are the digest chain of ``hg``. Both payload
    lengths are constants, so every /Length in the skeleton is a
    Python-computed literal and the PDF parses with exact stream
    extents."""
    jpeg = _jpeg_payload_from(hj)
    gray = F.concat(*[F.unhex(F.md5(F.concat(hg, F.lit(f":{j}"))))
                      for j in range(4)])
    jlen = len(_jpeg_dc_header()) + 4 * 3 + 2
    content = b"BT /F1 12 Tf 72 720 Td (figure doc) Tj ET"
    head = (b"%PDF-1.4\n"
            b"1 0 obj\n<< /Type /Catalog /Pages 2 0 R >>\nendobj\n"
            b"2 0 obj\n<< /Type /Pages /Kids [3 0 R] /Count 1 >>\n"
            b"endobj\n"
            b"3 0 obj\n<< /Type /Page /Parent 2 0 R /Resources "
            b"<< /XObject << /Im1 6 0 R /Im2 7 0 R >> >> "
            b"/Contents 5 0 R >>\nendobj\n"
            b"5 0 obj\n<< /Length " + str(len(content)).encode()
            + b" >>\nstream\n" + content + b"\nendstream\n"
            b"endobj\n"
            b"6 0 obj\n<< /Subtype /Image /Width 16 /Height 16 "
            b"/BitsPerComponent 8 /ColorSpace /DeviceGray "
            b"/Filter /DCTDecode /Length " + str(jlen).encode()
            + b" >>\nstream\n")
    mid = (b"\nendstream\nendobj\n"
           b"7 0 obj\n<< /Subtype /Image /Width 8 /Height 8 "
           b"/BitsPerComponent 8 /ColorSpace /DeviceGray "
           b"/Length 64 >>\nstream\n")
    tail = b"\nendstream\nendobj\n%%EOF\n"
    return F.concat(F.lit(head), jpeg, F.lit(mid), gray, F.lit(tail))


def q_pdf_images(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PDF figure mining under the value oracle: each document is a
    complete authored PDF carrying a DCTDecode (JPEG) image and a
    raw /DeviceGray image; ops/layout.pdf_images must walk the
    object table, apply the filter chains, decode the JPEG with the
    pure-stdlib decoder, gray-convert the raw bitmap, and hash both
    through the shared Catalyst pHash — two rows per document whose
    60-bit hashes the oracle re-derives arithmetically (quadrant
    algebra for the JPEG, digest bytes for the raw image). One wrong
    byte in stream extents, filter application or decode flips a
    hash."""
    from goose_parser_spark.ops.layout import pdf_images
    docs = _documents_amplified(spark, sf_dir)
    pg = F.floor(F.col("doc_id") / 23).cast("long")
    hj = F.md5(F.encode(
        F.concat(F.lit("pdfjpg-"), pg.cast("string")), "utf-8"))
    hg = F.md5(F.encode(
        F.concat(F.lit("pdfgray-"), pg.cast("string")), "utf-8"))
    payload = _pdf_images_payload(hj, hg)
    return pdf_images(docs.select("doc_id", payload.alias("payload")))


def _sql_pdf_images() -> str:
    """Generated DuckDB replay of q_pdf_images: the JPEG image rides
    the shared DC-only quadrant chain, the raw image rides the
    digest-byte chain, both feed ONE pHash tail keyed
    (doc_id, image_no)."""
    digs = ", ".join(f"md5(_hg || ':{j}') AS _d{j}" for j in range(4))
    gpix = ", ".join(
        f"CAST(('0x' || substr(_d{k // 16}, {(k % 16) * 2 + 1}, 2)) "
        f"AS BIGINT) AS p{k}" for k in range(64))
    return f"""pj0 AS (
  SELECT doc_id, md5('pdfjpg-' || (doc_id // 23)) AS _hj,
         md5('pdfgray-' || (doc_id // 23)) AS _hg
  FROM docs_amp
), jp0 AS (
  SELECT doc_id, 0 AS image_no, _hj AS _h FROM pj0
), {_sql_dc_jpeg_pix(keys="doc_id, image_no", out="pixj")}, dgg AS (
  SELECT doc_id, 1 AS image_no, {digs} FROM pj0
), pixg AS (
  SELECT doc_id, image_no, {gpix} FROM dgg
), pix AS (
  SELECT * FROM pixj UNION ALL SELECT * FROM pixg
), {_sql_phash_chain(keys="doc_id, image_no")}
SELECT doc_id, CAST(image_no AS INTEGER) AS image_no,
       CAST(CASE WHEN image_no = 0 THEN 16 ELSE 8 END AS INTEGER)
           AS width,
       CAST(CASE WHEN image_no = 0 THEN 16 ELSE 8 END AS INTEGER)
           AS height,
       CASE WHEN image_no = 0 THEN 'jpeg' ELSE 'raw' END AS fmt,
       fp AS phash
FROM h"""


SQL_PDF_IMAGES = f"""
WITH {_SQL_DOCS_AMP_COPY}, {_sql_pdf_images()}
"""


def q_wikitext_clean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The wikitext cleaner (ops/wikitext.py) under the value
    oracle, BY CONSTRUCTION: each document's markup is assembled
    from md5 substrings into a fixed grammar — heading, infobox
    template, bold phrase, piped + plain wikilinks, a ref, a list
    item — whose CLEANED form is therefore known string algebra over
    the same substrings. The oracle never re-implements the cleaner;
    it constructs the expected output directly, so any drift in
    template/link/heading/ref/list handling flips the hash. The
    nesting/fuzz behavior that cannot be expressed this way is
    pinned in tests/test_wikitext.py."""
    from goose_parser_spark.ops.wikitext import wiki_clean
    docs = _documents_amplified(spark, sf_dir)
    d = F.col("doc_id").cast("string")
    h1 = F.md5(F.encode(F.concat(F.lit("wiki-"), d), "utf-8"))
    h2 = F.md5(F.encode(F.concat(F.lit("wiki2-"), d), "utf-8"))
    a = F.substring(h1, 1, 6)
    c = F.substring(h1, 7, 6)
    e = F.substring(h1, 13, 6)
    ff = F.substring(h1, 19, 6)
    hh = F.substring(h1, 25, 6)
    b = F.substring(h2, 1, 8)
    dd = F.substring(h2, 9, 6)
    g = F.substring(h2, 15, 8)
    dirty = F.concat(
        F.lit("== "), a, F.lit(" ==\n{{infobox|name="), b,
        F.lit("}}\n'''"), c, F.lit("''' is a [["), dd, F.lit("|"), e,
        F.lit("]] of [["), ff, F.lit("]].<ref>"), g,
        F.lit("</ref>\n* "), hh)
    z = docs.select("doc_id", dirty.alias("wikitext"))
    return wiki_clean(z, id_col="doc_id")


SQL_WIKITEXT_CLEAN = f"""
WITH {_SQL_DOCS_AMP_COPY}, wh AS (
  SELECT doc_id, md5('wiki-' || doc_id) AS h1 FROM docs_amp
)
SELECT doc_id,
       substr(h1, 1, 6) || chr(10) || chr(10) || substr(h1, 7, 6)
         || ' is a ' || substr(h1, 13, 6) || ' of '
         || substr(h1, 19, 6) || '.' || chr(10) || substr(h1, 25, 6)
         AS clean_text,
       CAST(1 AS INTEGER) AS n_templates
FROM wh
"""


def q_notebook_cells(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Jupyter-notebook cell extraction under the value oracle:
    real nbformat-shaped JSON is authored JVM-side from md5
    substrings (a markdown cell and a code cell with multi-line
    sources, kernelspec language), parsed by the PURE-CATALYST
    from_json + posexplode pipeline in ops/notebook.py — no Python
    node anywhere — and the oracle constructs the expected
    (cell_no, cell_type, source, language) rows directly from the
    same substrings."""
    from goose_parser_spark.ops.notebook import notebook_cells
    docs = _documents_amplified(spark, sf_dir)
    d = F.col("doc_id").cast("string")
    h = F.md5(F.encode(F.concat(F.lit("nb-"), d), "utf-8"))
    a = F.substring(h, 1, 8)
    b = F.substring(h, 9, 8)
    c = F.substring(h, 17, 6)
    nb = F.concat(
        F.lit('{"cells": [{"cell_type": "markdown", '
              '"source": ["# '), a, F.lit('\\n", "'), b,
        F.lit('"]}, {"cell_type": "code", "source": ["'), c,
        F.lit(' = 1\\n", "print('), c,
        F.lit(')"]}], "metadata": {"kernelspec": '
              '{"language": "python", "name": "python3"}}, '
              '"nbformat": 4}'))
    z = docs.select("doc_id", nb.alias("notebook"))
    return notebook_cells(z)


SQL_NOTEBOOK_CELLS = f"""
WITH {_SQL_DOCS_AMP_COPY}, nh AS (
  SELECT doc_id, md5('nb-' || doc_id) AS h FROM docs_amp
)
SELECT doc_id, CAST(0 AS INTEGER) AS cell_no,
       'markdown' AS cell_type,
       '# ' || substr(h, 1, 8) || chr(10) || substr(h, 9, 8)
         AS source,
       'python' AS language
FROM nh
UNION ALL
SELECT doc_id, CAST(1 AS INTEGER) AS cell_no, 'code' AS cell_type,
       substr(h, 17, 6) || ' = 1' || chr(10) || 'print('
         || substr(h, 17, 6) || ')' AS source,
       'python' AS language
FROM nh
"""


def _crc_le(data_col: Column) -> Column:
    """F.crc32 → the 4 little-endian bytes a ZIP header stores."""
    hx = F.lpad(F.hex(F.crc32(data_col)), 8, "0")
    return F.unhex(F.concat(F.substring(hx, 7, 2),
                            F.substring(hx, 5, 2),
                            F.substring(hx, 3, 2),
                            F.substring(hx, 1, 2)))


def _zip_store(entries: list[tuple[bytes, Column, int]]) -> Column:
    """A complete STORED (uncompressed) ZIP as a JVM byte-concat
    column. Each entry is ``(name, data_col, data_len)`` with a
    CONSTANT length, so every header field and offset is a Python
    constant except the CRC-32, which F.crc32 computes JVM-side —
    the authoring brick of the EPUB oracle."""
    import struct as st
    parts: list[Column] = []
    centrals: list[Column] = []
    offset = 0
    for name, data_col, dlen in entries:
        crc = _crc_le(data_col)
        lfh_a = b"PK\x03\x04" + st.pack("<HHHHH", 20, 0, 0, 0, 0)
        lfh_b = st.pack("<IIHH", dlen, dlen, len(name), 0)
        parts.append(F.concat(F.lit(lfh_a), crc, F.lit(lfh_b),
                              F.lit(name), data_col))
        cdh_a = b"PK\x01\x02" + st.pack("<HHHHHH", 20, 20, 0, 0,
                                        0, 0)
        cdh_b = st.pack("<IIHHHHHII", dlen, dlen, len(name), 0, 0,
                        0, 0, 0, offset)
        centrals.append(F.concat(F.lit(cdh_a), crc, F.lit(cdh_b),
                                 F.lit(name)))
        offset += 30 + len(name) + dlen
    cd_size = sum(46 + len(n) for n, _c, _l in entries)
    eocd = (b"PK\x05\x06" + st.pack("<HHHHIIH", 0, 0, len(entries),
                                    len(entries), cd_size, offset,
                                    0))
    return F.concat(*parts, *centrals, F.lit(eocd))


def q_epub_chapters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Book ingestion under the value oracle: a complete two-chapter
    EPUB is authored per document as a JVM byte-concat — a REAL
    stored ZIP whose only non-constant header fields are the CRC-32s
    F.crc32 computes, wrapping the OCF container, the OPF
    manifest/spine, and two XHTML chapters whose prose is md5
    substrings. ops/epub.py must walk the zip (stdlib zipfile,
    CRC-verified), resolve the spine, and extract chapter text
    through the house DOM engine; the oracle constructs the expected
    (chapter_no, href, text) rows from the same substrings. One
    wrong byte in zip framing, spine resolution or DOM text breaks
    the CRC or the hash."""
    from goose_parser_spark.ops.epub import epub_chapters
    docs = _documents_amplified(spark, sf_dir)
    d = F.col("doc_id").cast("string")
    h = F.md5(F.encode(F.concat(F.lit("epub-"), d), "utf-8"))
    a = F.substring(h, 1, 16)
    b = F.substring(h, 17, 16)
    container = (b'<?xml version="1.0"?><container><rootfiles>'
                 b'<rootfile full-path="content.opf"/>'
                 b'</rootfiles></container>')
    opf = (b'<package><manifest>'
           b'<item id="c1" href="ch1.xhtml" '
           b'media-type="application/xhtml+xml"/>'
           b'<item id="c2" href="ch2.xhtml" '
           b'media-type="application/xhtml+xml"/>'
           b'</manifest><spine><itemref idref="c1"/>'
           b'<itemref idref="c2"/></spine></package>')
    pre = b"<html><body><p>"
    post = b"</p></body></html>"
    ch_len = len(pre) + 16 + len(post)
    ch1 = F.concat(F.lit(pre), F.encode(a, "utf-8"), F.lit(post))
    ch2 = F.concat(F.lit(pre), F.encode(b, "utf-8"), F.lit(post))
    payload = _zip_store([
        (b"META-INF/container.xml", F.lit(container),
         len(container)),
        (b"content.opf", F.lit(opf), len(opf)),
        (b"ch1.xhtml", ch1, ch_len),
        (b"ch2.xhtml", ch2, ch_len),
    ])
    z = docs.select("doc_id", payload.alias("payload"))
    return epub_chapters(z)


SQL_EPUB_CHAPTERS = f"""
WITH {_SQL_DOCS_AMP_COPY}, eh AS (
  SELECT doc_id, md5('epub-' || doc_id) AS h FROM docs_amp
)
SELECT doc_id, CAST(0 AS INTEGER) AS chapter_no,
       'ch1.xhtml' AS href, substr(h, 1, 16) AS text
FROM eh
UNION ALL
SELECT doc_id, CAST(1 AS INTEGER) AS chapter_no,
       'ch2.xhtml' AS href, substr(h, 17, 16) AS text
FROM eh
"""


def q_mbox_messages(spark: SparkSession, sf_dir: str) -> DataFrame:
    """mbox/RFC-822 ingestion under the value oracle, by
    construction: each document is a two-message mbox whose headers
    and bodies are md5 substrings; ops/email_ops.py must split on
    the From_ envelope lines and parse each message through the
    stdlib email machinery. The oracle constructs the expected
    (msg_no, subject, from_addr, date, body) rows from the same
    substrings; MIME/encoded-word/multipart behavior is pinned in
    tests/test_email_ops.py."""
    from goose_parser_spark.ops.email_ops import mbox_messages
    docs = _documents_amplified(spark, sf_dir)
    d = F.col("doc_id").cast("string")
    h = F.md5(F.encode(F.concat(F.lit("mbox-"), d), "utf-8"))
    a1 = F.substring(h, 1, 6)
    s1 = F.substring(h, 7, 8)
    b1 = F.substring(h, 15, 8)
    a2 = F.substring(h, 23, 6)
    s2 = F.substring(h, 29, 4)
    env = "From x@y Mon Jan  1 10:00:00 2024\n"
    date = "Mon, 01 Jan 2024 10:00:00 +0000"

    def msg(a, s, b):
        return F.concat(
            F.lit("From: "), a, F.lit("@example.org\nSubject: "), s,
            F.lit(f"\nDate: {date}\n\n"), b, F.lit(" body text"))

    mb = F.concat(F.lit(env), msg(a1, s1, b1), F.lit("\n" + env),
                  msg(a2, s2, s1))
    z = docs.select("doc_id",
                    F.encode(mb, "utf-8").alias("payload"))
    return mbox_messages(z)


SQL_MBOX_MESSAGES = f"""
WITH {_SQL_DOCS_AMP_COPY}, mh AS (
  SELECT doc_id, md5('mbox-' || doc_id) AS h FROM docs_amp
)
SELECT doc_id, CAST(0 AS INTEGER) AS msg_no,
       substr(h, 7, 8) AS subject,
       substr(h, 1, 6) || '@example.org' AS from_addr,
       'Mon, 01 Jan 2024 10:00:00 +0000' AS date,
       substr(h, 15, 8) || ' body text' AS body
FROM mh
UNION ALL
SELECT doc_id, CAST(1 AS INTEGER) AS msg_no,
       substr(h, 29, 4) AS subject,
       substr(h, 23, 6) || '@example.org' AS from_addr,
       'Mon, 01 Jan 2024 10:00:00 +0000' AS date,
       substr(h, 7, 8) || ' body text' AS body
FROM mh
"""


def q_subtitle_cues(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SRT/WebVTT cue parsing under the value oracle, by
    construction: each document is a two-cue SRT (numbered blocks,
    comma-decimal timestamps, one cue with inline markup) whose
    parsed rows are known from the authoring algebra. The parse
    itself is PURE CATALYST (ops/subtitles.py — block split +
    posexplode + regexp extraction, zero Python); format-edge
    behavior (VTT headers/NOTE blocks, hour-optional timestamps,
    cue settings, karaoke tags) is pinned in
    tests/test_subtitles.py."""
    from goose_parser_spark.ops.subtitles import subtitle_cues
    docs = _documents_amplified(spark, sf_dir)
    d = F.col("doc_id").cast("string")
    h = F.md5(F.encode(F.concat(F.lit("srt-"), d), "utf-8"))
    a = F.substring(h, 1, 8)
    b = F.substring(h, 9, 8)
    c = F.substring(h, 17, 8)
    srt = F.concat(
        F.lit("1\n00:00:01,000 --> 00:00:03,500\n"), a,
        F.lit(" "), b,
        F.lit("\n\n2\n00:01:02,250 --> 00:01:03,750\n<i>"), c,
        F.lit("</i> spoken\n"))
    z = docs.select("doc_id", srt.alias("subs"))
    return subtitle_cues(z)


SQL_SUBTITLE_CUES = f"""
WITH {_SQL_DOCS_AMP_COPY}, sh AS (
  SELECT doc_id, md5('srt-' || doc_id) AS h FROM docs_amp
)
SELECT doc_id, CAST(0 AS INTEGER) AS cue_no,
       CAST(1000 AS BIGINT) AS start_ms,
       CAST(3500 AS BIGINT) AS end_ms,
       substr(h, 1, 8) || ' ' || substr(h, 9, 8) AS text
FROM sh
UNION ALL
SELECT doc_id, CAST(1 AS INTEGER) AS cue_no,
       CAST(62250 AS BIGINT) AS start_ms,
       CAST(63750 AS BIGINT) AS end_ms,
       substr(h, 17, 8) || ' spoken' AS text
FROM sh
"""


def q_latex_clean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The LaTeX cleaner (ops/latex.py) under the value oracle, BY
    CONSTRUCTION (same posture as wikitext_clean): each document's
    TeX is assembled from md5 substrings into a fixed grammar —
    sectioning, emphasis, inline math, a citation, a dropped
    equation environment, a forced linebreak, a trailing comment —
    whose cleaned form is known string algebra over the same
    substrings. The oracle constructs the expected output directly;
    command/math/environment handling drift flips the hash. Fuzz and
    nesting behavior is pinned in tests/test_latex.py."""
    from goose_parser_spark.ops.latex import latex_clean
    docs = _documents_amplified(spark, sf_dir)
    d = F.col("doc_id").cast("string")
    h1 = F.md5(F.encode(F.concat(F.lit("tex-"), d), "utf-8"))
    h2 = F.md5(F.encode(F.concat(F.lit("tex2-"), d), "utf-8"))
    a = F.substring(h1, 1, 6)
    b = F.substring(h1, 7, 6)
    f_ = F.substring(h1, 13, 6)
    g = F.substring(h1, 19, 8)
    c = F.substring(h2, 1, 6)
    dd = F.substring(h2, 7, 6)
    e = F.substring(h2, 13, 6)
    dirty = F.concat(
        F.lit("\\section{"), a, F.lit("}\nWe study \\emph{"), b,
        F.lit("} in $"), c, F.lit("$ systems.\\cite{"), dd,
        F.lit("}\n\\begin{equation}"), e,
        F.lit("\\end{equation}Also "), f_,
        F.lit(" holds.\\\\\n"), g, F.lit(" % trail"))
    z = docs.select("doc_id", dirty.alias("tex"))
    return latex_clean(z, id_col="doc_id")


SQL_LATEX_CLEAN = f"""
WITH {_SQL_DOCS_AMP_COPY}, th AS (
  SELECT doc_id, md5('tex-' || doc_id) AS h1 FROM docs_amp
)
SELECT doc_id,
       substr(h1, 1, 6) || chr(10) || chr(10) || 'We study '
         || substr(h1, 7, 6) || ' in systems.' || chr(10)
         || 'Also ' || substr(h1, 13, 6) || ' holds.'
         || chr(10) || chr(10) || substr(h1, 19, 8) AS clean_text,
       CAST(1 AS INTEGER) AS n_math
FROM th
"""


def q_audio_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The REAL WAV decoder under the value oracle: fixed-shape
    RIFF/WAVE files (16-bit mono PCM, 64 data bytes = 32 samples from
    an md5 digest chain) are authored JVM-side as one binary-literal
    header + unhex digest concat, decoded by the pure-stdlib codec,
    and reduced to one 32-sample frame of (energy, zero_crossings).
    The oracle re-derives every sample from the same digests (little-
    endian pair + two's-complement) — one wrong byte, sign or
    alignment and the integer features diverge."""
    import struct as _struct
    from goose_parser_spark.ops.multimodal import audio_features
    docs = _documents_amplified(spark, sf_dir)
    h = F.md5(F.concat(F.lit("wav-"), F.col("doc_id").cast("string")))
    parts = [F.unhex(F.md5(F.concat(h, F.lit(f":{j}"))))
             for j in range(4)]
    fmt = _struct.pack("<HHIIHH", 1, 1, 16000, 32000, 2, 16)
    header = (b"RIFF" + _struct.pack("<I", 4 + 8 + len(fmt) + 8 + 64)
              + b"WAVE" + b"fmt " + _struct.pack("<I", len(fmt)) + fmt
              + b"data" + _struct.pack("<I", 64))
    payload = F.concat(F.lit(header), *parts)
    wav = docs.select("doc_id", payload.alias("payload"))
    return audio_features(wav, frame=32)


def _sql_audio_decode() -> str:
    """Generated DuckDB replay of q_audio_decode: 32 little-endian
    two's-complement samples from the digest chain, then the integer
    frame features."""
    samp = []
    for k in range(32):
        terms = []
        for byte, mul in ((2 * k, 1), (2 * k + 1, 256)):
            d, off = byte // 16, byte % 16
            terms.append(
                f"CAST(('0x' || substr(_d{d}, {off * 2 + 1}, 2)) "
                f"AS BIGINT) * {mul}")
        u = " + ".join(terms)
        samp.append(f"CASE WHEN {u} >= 32768 THEN {u} - 65536 "
                    f"ELSE {u} END AS s{k}")
    abs_sum = " + ".join(f"abs(s{k})" for k in range(32))
    zc = " + ".join(
        f"CASE WHEN (s{k - 1} < 0) <> (s{k} < 0) THEN 1 ELSE 0 END"
        for k in range(1, 32))
    digs = ",\n         ".join(
        f"md5(_h || ':{j}') AS _d{j}" for j in range(4))
    samples = ",\n         ".join(samp)
    return (
        "a0 AS (\n"
        "  SELECT doc_id, md5('wav-' || doc_id) AS _h FROM docs_amp\n"
        "), ad AS (\n"
        f"  SELECT doc_id,\n         {digs}\n  FROM a0\n"
        "), asamp AS (\n"
        f"  SELECT doc_id,\n         {samples}\n  FROM ad\n"
        ")\n"
        "SELECT doc_id, CAST(16000 AS INTEGER) AS sample_rate,\n"
        "       CAST(1 AS INTEGER) AS n_channels,\n"
        "       CAST(0 AS INTEGER) AS frame_no,\n"
        f"       CAST(({abs_sum}) // 32 AS BIGINT) AS energy,\n"
        f"       CAST({zc} AS INTEGER) AS zero_crossings\n"
        "FROM asamp")


SQL_AUDIO_DECODE = (
    f"WITH {_SQL_DOCS_AMP_COPY}, " + _sql_audio_decode())


def q_g711_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The G.711 companded-audio decoder under the value oracle:
    8-bit mu-law (even docs) / A-law (odd docs) WAV files — 32 codes
    from an md5 digest chain — are authored JVM-side and expanded by
    the pure-stdlib codec to 13/14-bit linear, then framed to one
    (energy, zero_crossings) row. The oracle replays the public G.711
    segment expansion arithmetically per byte: one wrong complement,
    bias, shift or sign convention and the integer features diverge
    for every document of that law."""
    import struct as _struct
    from goose_parser_spark.ops.multimodal import audio_features
    docs = _documents_amplified(spark, sf_dir)
    h = F.md5(F.concat(F.lit("g711-"), F.col("doc_id").cast("string")))
    parts = [F.unhex(F.md5(F.concat(h, F.lit(f":{j}"))))
             for j in range(2)]

    def hdr(tag: int) -> bytes:
        fmt = _struct.pack("<HHIIHH", tag, 1, 8000, 8000, 1, 8)
        return (b"RIFF" + _struct.pack("<I", 4 + 8 + len(fmt) + 8 + 32)
                + b"WAVE" + b"fmt " + _struct.pack("<I", len(fmt)) + fmt
                + b"data" + _struct.pack("<I", 32))

    header = F.when(F.col("doc_id") % 2 == 0,
                    F.lit(hdr(7))).otherwise(F.lit(hdr(6)))
    payload = F.concat(header, *parts)
    wav = docs.select("doc_id", payload.alias("payload"))
    return audio_features(wav, frame=32)


def _sql_g711_decode() -> str:
    """Generated DuckDB replay of q_g711_decode: per-byte G.711
    expansion (mu-law: complement, +132 bias, segment shift; A-law:
    XOR 0x55, chord table, sign-bit-positive), then the same integer
    frame features as the PCM oracle."""
    bexprs = []
    for k in range(32):
        d, off = k // 16, k % 16
        bexprs.append(
            f"CAST(('0x' || substr(_d{d}, {off * 2 + 1}, 2)) "
            f"AS BIGINT) AS b{k}")
    xexprs = [
        f"CASE WHEN _mu THEN 255 - b{k} ELSE xor(b{k}, 85) END AS x{k}"
        for k in range(32)]
    sexprs = []
    for k in range(32):
        mu_t = f"(((x{k} % 16) * 8 + 132) << ((x{k} // 16) % 8))"
        mu = (f"CASE WHEN x{k} >= 128 THEN 132 - {mu_t} "
              f"ELSE {mu_t} - 132 END")
        a_t = (f"CASE WHEN (x{k} // 16) % 8 = 0 THEN (x{k} % 16) * 16 + 8 "
               f"WHEN (x{k} // 16) % 8 = 1 THEN (x{k} % 16) * 16 + 264 "
               f"ELSE ((x{k} % 16) * 16 + 264) << ((x{k} // 16) % 8 - 1) "
               f"END")
        al = f"CASE WHEN x{k} >= 128 THEN {a_t} ELSE -({a_t}) END"
        sexprs.append(f"CASE WHEN _mu THEN {mu} ELSE {al} END AS s{k}")
    abs_sum = " + ".join(f"abs(s{k})" for k in range(32))
    zc = " + ".join(
        f"CASE WHEN (s{k - 1} < 0) <> (s{k} < 0) THEN 1 ELSE 0 END"
        for k in range(1, 32))
    return (
        "u0 AS (\n"
        "  SELECT doc_id, md5('g711-' || doc_id) AS _h,\n"
        "         doc_id % 2 = 0 AS _mu FROM docs_amp\n"
        "), ud AS (\n"
        "  SELECT doc_id, _mu, md5(_h || ':0') AS _d0,\n"
        "         md5(_h || ':1') AS _d1 FROM u0\n"
        "), ub AS (\n"
        f"  SELECT doc_id, _mu,\n         {', '.join(bexprs)} FROM ud\n"
        "), ux AS (\n"
        f"  SELECT doc_id, _mu,\n         {', '.join(xexprs)} FROM ub\n"
        "), us AS (\n"
        f"  SELECT doc_id,\n         {', '.join(sexprs)} FROM ux\n"
        ")\n"
        "SELECT doc_id, CAST(8000 AS INTEGER) AS sample_rate,\n"
        "       CAST(1 AS INTEGER) AS n_channels,\n"
        "       CAST(0 AS INTEGER) AS frame_no,\n"
        f"       CAST(({abs_sum}) // 32 AS BIGINT) AS energy,\n"
        f"       CAST({zc} AS INTEGER) AS zero_crossings\n"
        "FROM us")


SQL_G711_DECODE = (
    f"WITH {_SQL_DOCS_AMP_COPY}, " + _sql_g711_decode())


def q_zstd_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The REAL RFC 8878 zstd decoder (ops/zstdcodec.py) under the
    value oracle, on the SQL-authorable subset of the format: per
    document, TWO concatenated frames with a skippable frame between
    them — frame 1 is single-segment (1-byte declared content size)
    carrying a raw block, a Compressed block whose literals are raw
    with zero sequences (exercises the compressed-block framing),
    and an RLE block; frame 2 is windowed (window descriptor, no
    declared size) carrying one raw block. All content bytes derive
    from md5(doc_id) so the oracle replays the decoded text, frame
    count, length, and checksum aggregation exactly. The
    entropy-coded paths (FSE/Huffman) this oracle cannot author are
    pinned in tests/test_zstd.py against the real zstd encoder
    (zstd-jni round-trips) and a zstd-CLI-authored external fixture
    with its xxh64 checksum verified."""
    from goose_parser_spark.ops.zstdcodec import zstd_text
    docs = _documents_amplified(spark, sf_dir)
    h = F.md5(F.concat(F.lit("zstd-"), F.col("doc_id").cast("string")))
    a = F.encode(F.substring(h, 1, 16), "utf-8")   # raw block
    b = F.encode(F.substring(h, 17, 8), "utf-8")   # compressed/raw lits
    c = F.encode(F.substring(h, 25, 1), "utf-8")   # RLE byte (x8)
    d = F.encode(F.substring(h, 9, 8), "utf-8")    # frame-2 raw block
    hdr1 = bytes.fromhex("28b52ffd") + bytes([0x20, 32])  # frame-1 FCS
    raw_hdr = (16 << 3 | 0).to_bytes(3, "little")
    # Compressed block: size 10 = litheader(1) + 8 literals + nbseq(1)
    comp_hdr = ((10 << 3) | (2 << 1)).to_bytes(3, "little") \
        + bytes([8 << 3])
    rle_hdr = ((8 << 3) | (1 << 1) | 1).to_bytes(3, "little")
    skip = bytes.fromhex("502a4d18") + (4).to_bytes(4, "little") + b"JUNK"
    hdr2 = bytes.fromhex("28b52ffd") + bytes([0x00, 0x00]) \
        + ((8 << 3) | 1).to_bytes(3, "little")
    payload = F.concat(
        F.lit(hdr1), F.lit(raw_hdr), a,
        F.lit(comp_hdr), b, F.lit(b"\x00"),
        F.lit(rle_hdr), c,
        F.lit(skip), F.lit(hdr2), d)
    z = docs.select("doc_id", payload.alias("payload"))
    return zstd_text(z, max_out=1 << 16)


SQL_ZSTD_DECODE = f"""
WITH {_SQL_DOCS_AMP_COPY}, zh AS (
  SELECT doc_id, md5('zstd-' || doc_id) AS h FROM docs_amp
)
SELECT doc_id,
       CAST(2 AS INTEGER) AS n_frames,
       CAST(40 AS BIGINT) AS content_len,
       'absent' AS checksum_state,
       substr(h, 1, 16) || substr(h, 17, 8)
         || repeat(substr(h, 25, 1), 8) || substr(h, 9, 8) AS text
FROM zh
"""


def q_brotli_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The REAL RFC 7932 brotli decoder (ops/brotlicodec.py) under
    the value oracle, on the SQL-authorable subset of the format: per
    document a stream of WBITS=16 header + an UNCOMPRESSED metablock
    (16 bytes — ISUNCOMPRESSED realigns the reader to a byte
    boundary, which is what makes the headers SQL constants), a
    metadata skip block carrying 4 skipped bytes, a second
    uncompressed metablock (8 bytes), and the ISLAST+ISLASTEMPTY
    trailer. All content bytes derive from md5(doc_id) so the oracle
    replays the decoded text, window bits, and length exactly. The
    entropy-coded paths this oracle cannot author (prefix codes,
    context maps, distance rings, the static dictionary with word
    transforms) are pinned in tests/test_brotli.py against the
    reference C encoder (libbrotlienc ctypes round-trips), the
    reference C decoder (the authored constants here), and a
    Debian-shipped real ``.br`` artifact decoded byte-identically."""
    from goose_parser_spark.ops.brotlicodec import brotli_text
    docs = _documents_amplified(spark, sf_dir)
    h = F.md5(F.concat(F.lit("brotli-"), F.col("doc_id").cast("string")))
    a = F.encode(F.substring(h, 1, 16), "utf-8")   # metablock 1 bytes
    s = F.encode(F.substring(h, 17, 4), "utf-8")   # metadata (skipped)
    b = F.encode(F.substring(h, 21, 8), "utf-8")   # metablock 2 bytes
    payload = F.concat(
        F.lit(bytes.fromhex("f00010")), a,          # wbits16 + MLEN 16
        F.lit(bytes.fromhex("d600")), s,            # metadata skip 4
        F.lit(bytes.fromhex("380008")), b,          # MLEN 8
        F.lit(bytes.fromhex("03")))                 # ISLAST+ISLASTEMPTY
    z = docs.select("doc_id", payload.alias("payload"))
    return brotli_text(z, max_out=1 << 16)


SQL_BROTLI_DECODE = f"""
WITH {_SQL_DOCS_AMP_COPY}, bh AS (
  SELECT doc_id, md5('brotli-' || doc_id) AS h FROM docs_amp
)
SELECT doc_id,
       CAST(16 AS INTEGER) AS wbits,
       CAST(24 AS BIGINT) AS content_len,
       substr(h, 1, 16) || substr(h, 21, 8) AS text
FROM bh
"""


# Lossy-WebP (VP8 keyframe) fixtures for q_vp8_decode. VP8 is
# arithmetic-coded end to end, so unlike the JPEG DC-only trick there
# is NO SQL-authorable subset — instead the payloads are fixed
# real-encoder bitstreams (libwebp simple + advanced API, chosen to
# exercise segmentation, the simple loop filter, two token partitions
# and odd dimensions, plus CPython's third-party-encoded python.webp)
# and the expected (width, height, md5(Y plane)) triples were
# computed by LIBWEBP'S OWN DECODER at authoring time. The driver
# gate therefore hash-checks "ops/vp8.py == the reference C decoder"
# on every run; tests/test_vp8.py holds the live encoder round-trips
# (any table/tree/filter deviation desynchronizes the bool decoder).
_VP8_FIXTURES: tuple[tuple[str, int, int, str, str], ...] = (
    ("noise16_q75", 16, 16, "8ee12ea17fe1ec596ea827c7cbc73b0a",
     "5005009d012a1000100002003425b002747f06e80bb00de002b19f338e609e65"
     "ff69fc5be003f8eff37df2bfd332c73141854000fe7e9fb46f7df77c7fce71d2"
     "e44d4a5425620f535ca5e6e0bdd93a37c0b4aa85a7f864cb923f775b74e11bd3"
     "02e0af523ed7f577f739d36779d9110b1cfc2fee82e38dbc871dbace706cd077"
     "70b0edcd9ebcff4c115164f3f3b5f982bf0d403ba3ebf700b70eff68d108cc53"
     "7bbde32784190f24cfc2d727cf0722d08a43561c52f7cde8d7f8f68b26f846d6"
     "7d69cd9c2f84b75c17d37fc7bbeb4cd7ba259b411f021e73efe4b13968681423"
     "4cedcee00000"),
    ("grad17x9_q40", 17, 9, "8c5cbc4faddf1b433ecf2d1094815424",
     "b003009d012a110009003eed68ad4ea9a624a2300801301d896c009d32847000"
     "29bbf54ef70000feec55c29fd0f8f8368839d29ffe3b3f68f87c1aefd9680383"
     "2cf6cd0d76f00fca84c7baca0c500000"),
    ("mixed32_seg4", 32, 32, "e9e04d056a9605d5fff4c2d96f1deeab",
     "d009009d012a200020003ea5388e42a62321180600600a44f6004e9942240386"
     "0f955dc11205b00ea01f8ef7806e00de00de10ae6fad6acc13cffec01d183f66"
     "7d155af38bdcd3e4b305c25a28296bcd6c9df053eb440000fefffec3232389c8"
     "caf9ecf26e731c427f172cda55fffe52377fcf32effc3842126fd9c3d05ff940"
     "56347fba666c3e13cfaf559fe5256ba79f8d6ce0c79c8d096a7e2d2916887679"
     "5faa1156e4144d3bc66e54e9fa48801f1ed5cfe99ab835f32bca9ec18c64bcc3"
     "3534ae39404d09315b4ff1106683991792fe35fa4f8d5b7610419d4d267e35d6"
     "b6112b802702f96e19a05cb0d92e4b2f775b262d9b5e09060af2fcb497ac253e"
     "8ccdeb157fa93e329e88506fccd5ff969cad94d5367ac7874caba69596b2146d"
     "e3ea3dc14210c3ee573b24b85c20e4035eae5598d9e4acbc256b15553336485c"
     "1fd11667b134a1e20f5826fc76181e358c7565df9e336f939a7b735fef453853"
     "33412cfc6bcfee4d9d34a2a0fcee127973c98ee9354a7463d750c44222ebd35c"
     "5df3e366f7978199a5445d3d602ca24c93fe60b5bc185a0ffa9b5eea7f6ff158"
     "d4739269beec3f6577f8c5d7d185d6b1d50cfe7536cd72880852839b754a9ddc"
     "c3add0eec75c02022ce6907df9b44000"),
    ("grad24x16_simplef", 24, 16, "f601b90495f13bcb4ef310656e4eaf93",
     "3204009d012a180010003e91449a48a5a422a1300804b012096c009d32847737"
     "92806125d8c75e0104a000fefa932fdbcadd0aca9561d69b935fa3a3d4f82239"
     "d4fda65b3fa88bdd0158a50c0374ec2ea40fea8c7881c8f5f60acb42df824000"),
    ("noise16x48_parts2", 16, 48, "d352194c7a863a4ab586620df2960c5e",
     "5004009d012a1000300002013425b00003565c86fa2d6d3e2c0db58f5414b0ce"
     "520126251b2312c13df40000d50100fe345ad59dae81aae63107c8f1afd22610"
     "43798f9cf6c455fefb5b1f1297edf3f952e07d408f4711a5d5be7d6da13917aa"
     "bbed533e7636d4020fff4b937d0983f10612292f237556266bea73c8d07ee0fb"
     "d4719c9c5fd9f9b2bd8c45a2fe35c15fbd695e91c38f39c86fb3024c0ee3b7d2"
     "b5b4fb6358990dd1c53d874345fafb063fc9bffea3d4adfb4f3e3f90dc44389e"
     "3007accf94fc3dc0988def9c5858b9ffd7e501a7c49167f6a66efe3ff7e9ac9c"
     "c7f8660839fb91eba2850aac353a810ac8fc18b7fe9eefb9b905c4c63207b9bc"
     "dfbccd4de91357d8659235772aa5d959049e7f9d8c0c99f4417858d04f447d1a"
     "9287dbdd95c213e629044bffb70d86a6a3f9a1bfbed1bc29f85eea107e0cc7ff"
     "8f517e9bff6d968d3c8c7729bd9384269a9656062e218fa69699fbf5d36c29f5"
     "d93cf7be35ed60bdf7e5b9b6ebf538063af7dfeaeca1b61f1e9d0f17fe7ef7ab"
     "ddeafa427dc247cf6e7f5fbdda1e5dd3d2ce1bbf474fff139119251fdafd3f25"
     "30f3b71bf98323e1004bbe681f94d31b7e5047bc914254e010ccb7ae12ac659f"
     "cffbfa15b757e967229b993647c76727fd5530c3c23e11a308654caa305a02b6"
     "79abcb9fd5bdfd5b339ae81c8cf4fdc4a385e44c39ef8f3b2fbffd203f9ff86f"
     "337a0000db24e9afd4d764ff28298076da1f6c1c9624ed32f5fa6993063d5022"
     "f70ffe2e7d3fb966f78c31afff7f4ff3e56eb3175de8a3da8cfecee8abd170ff"
     "619218c6a5647c73fe4e93b471a34eaf53be36de64efafe29df891ccb44fe60a"
     "cf73509cffe9fb9fe730f5dbdc2904891f956b8fffcb64ffd80f4e7a7e8c1ef7"
     "0b0af23074f545efc5c37beb2746359e1810a0611e56ec789fef25f8fc8ef33e"
     "402d45b35cb94afae48c778b512ea2b9a31cfebfa165d06fbcc90d38373d983f"
     "dad8583188c439f1119d57d5c9a04bbf3138850340fd3f2964358ff9b0d9c71f"
     "7be80e5d75fd9f9a36eff97cfef5dbbcffadff6a0000"),
    ("cpython_logo", 16, 16, "dfe4982372c6c01faa923c2d30af586d",
     "9002009d012a1000100003003425b00274304f08850c7c031d082cfde800fefd"
     "74a0fd029b1f8af7437c9c37f6d20cafd3ff3568e2eea7bdc96f1bf4aac563ae"
     "ba9f9784df41a23bda5be4eff8cbf1bd7fe1affa3fe509ecf4bb665fffaa29d9"
     "7fc96ce786e6ac97b9e4c6f493238c5fdd8f3955207f954ffc39f8ff6fd26b03"
     "e89fbc8398666db1d513ff7617e6b1fe5d8ae49f47bfb3fabffe1d1df3128ffe"
     "5ccfc1faf918c3bdcfcf1f9139a001fd9a014b312cdebcd97baaac000000"),
)


def q_vp8_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The pure-stdlib VP8 keyframe decoder (ops/vp8.py, RFC 6386)
    under the driver value oracle. Each document selects one of six
    fixed real-encoder VP8 bitstreams by ``doc_id % 6`` (JVM-side
    array lookup — the decode in ops/multimodal.vp8_luma is the only
    Python node, map-only) and the query emits the decoded
    dimensions plus md5 of the Y plane. The oracle replays the
    triples libwebp's own decoder produced at authoring time, so a
    single wrong pixel byte anywhere in the boolean coder / token /
    prediction / IDCT / loop-filter chain flips the hash. The
    fixtures cover segmentation, the simple loop filter, two token
    partitions, odd dimensions and a third-party-encoded stream
    (CPython's python.webp logo)."""
    from goose_parser_spark.ops.multimodal import vp8_luma
    docs = _documents_amplified(spark, sf_dir)
    payloads = F.array(*[F.lit(bytes.fromhex(hx))
                         for (_n, _w, _h, _m, hx) in _VP8_FIXTURES])
    k = (F.col("doc_id") % len(_VP8_FIXTURES)).cast("int")
    z = docs.select(
        "doc_id", F.element_at(payloads, k + F.lit(1)).alias("payload"))
    out = vp8_luma(z)
    return out.select("doc_id", "width", "height",
                      F.md5(F.col("luma")).alias("luma_md5"))


def _sql_vp8_decode() -> str:
    """Generated DuckDB replay of q_vp8_decode from the same fixture
    table: pure CASE over doc_id %% 6."""
    n = len(_VP8_FIXTURES)
    w = " ".join(f"WHEN {i} THEN {f[1]}"
                 for i, f in enumerate(_VP8_FIXTURES))
    h = " ".join(f"WHEN {i} THEN {f[2]}"
                 for i, f in enumerate(_VP8_FIXTURES))
    m = " ".join(f"WHEN {i} THEN '{f[3]}'"
                 for i, f in enumerate(_VP8_FIXTURES))
    return (f"SELECT doc_id, "
            f"CAST(CASE doc_id % {n} {w} END AS INTEGER) AS width, "
            f"CAST(CASE doc_id % {n} {h} END AS INTEGER) AS height, "
            f"CASE doc_id % {n} {m} END AS luma_md5 FROM docs_amp")


SQL_VP8_DECODE = f"""
WITH {_SQL_DOCS_AMP_COPY}
{_sql_vp8_decode()}
"""


def q_gif_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Animated-GIF frame sampling under the value oracle: a 4-frame
    8x8 GIF per document is authored JVM-side using the byte-aligned
    LZW trick — with min-code-size 7 every code is 8 bits wide (the
    table only reaches 193 < 256 entries per frame, so the width
    never grows) and each pixel's literal code IS one payload byte,
    taken from an md5 digest mod 128. The global palette is the exact
    gray ramp (2i, 2i, 2i), so composed-canvas gray = 2 x index and
    the oracle replays every pixel arithmetically through the shared
    pHash chain keyed by (doc_id, frame_no). One wrong byte in the
    LZW decode, block walk, palette mapping or composition and the
    hashes diverge."""
    from goose_parser_spark.ops.multimodal import video_frames
    docs = _documents_amplified(spark, sf_dir)
    ramp = b"".join(bytes((2 * i,) * 3) for i in range(128))
    import struct as _struct
    head = (b"GIF89a" + _struct.pack("<HHBBB", 8, 8, 0x80 | 6, 0, 0)
            + ramp)
    desc = (b"\x2c" + _struct.pack("<HHHHB", 0, 0, 8, 8, 0)
            + b"\x07"          # min code size 7
            + b"\x42\x80")     # sub-block of 66: CLEAR + 64 + EOI
    digs = [f"md5(concat('gifa-', CAST(doc_id AS STRING), ':{f}:{j}'))"
            f" AS _h{f}_{j}" for f in range(4) for j in range(4)]
    base = docs.selectExpr("doc_id", *digs)
    segs = [f"'{head.hex()}'"]
    for f in range(4):
        segs.append(f"'{desc.hex()}'")
        for k in range(64):
            d, off = k // 16, (k % 16) * 2 + 1
            segs.append(
                f"lpad(hex(CAST(conv(substring(_h{f}_{d}, {off}, 2), "
                f"16, 10) AS BIGINT) % 128), 2, '0')")
        segs.append("'8100'")  # EOI + block terminator
    segs.append("'3b'")
    img = base.selectExpr(
        "doc_id", f"unhex(concat({', '.join(segs)})) AS payload")
    return video_frames(img, every=2)


SQL_GIF_FRAMES = f"""
WITH {_SQL_DOCS_AMP_COPY}, ga0 AS (
  SELECT doc_id, CAST(f.range * 2 AS INTEGER) AS frame_no
  FROM docs_amp CROSS JOIN range(2) f
), gad AS (
  SELECT doc_id, frame_no,
         {', '.join(f"md5('gifa-' || doc_id || ':' || frame_no"
                    f" || ':{j}') AS _d{j}" for j in range(4))}
  FROM ga0
), pix AS (
  SELECT doc_id, frame_no,
         {', '.join(
             f"2 * (CAST(('0x' || substr(_d{k // 16}, "
             f"{(k % 16) * 2 + 1}, 2)) AS BIGINT) % 128) AS p{k}"
             for k in range(64))}
  FROM gad
), {_sql_phash_chain(keys="doc_id, frame_no")}
SELECT doc_id, frame_no, CAST(8 AS INTEGER) AS width,
       CAST(8 AS INTEGER) AS height, fp AS phash
FROM h
"""


def _exif_author_hex(gps: bool) -> str:
    """SQL hex-string expression authoring a complete EXIF JPEG
    (APP1 + little-endian TIFF: IFD0 with Make/Model/Orientation,
    Exif sub-IFD with DateTimeOriginal + pixel dims, optional GPS
    IFD). TIFF is byte-structured, so every offset is a Python-side
    constant and only the doc-derived values (two-digit make/model
    ids, orientation, capture month/day, dims) are SQL fragments."""
    import struct as st

    mk, md = "(doc_id % 100)", "((doc_id * 3) % 100)"
    ori = "(doc_id % 8 + 1)"
    mon, day = "(doc_id % 12 + 1)", "(doc_id % 28 + 1)"
    wd, ht = "(640 + doc_id % 1280)", "(480 + doc_id % 720)"

    def dig2(n: str) -> list[str]:
        return [f"lpad(hex(48 + ({n}) div 10), 2, '0')",
                f"lpad(hex(48 + ({n}) % 10), 2, '0')"]

    def u16(n: str) -> list[str]:
        return [f"lpad(hex(({n}) % 256), 2, '0')",
                f"lpad(hex(({n}) div 256), 2, '0')"]

    def u32(n: str) -> list[str]:
        return [f"lpad(hex(({n}) % 256), 2, '0')",
                f"lpad(hex((({n}) div 256) % 256), 2, '0')",
                f"lpad(hex((({n}) div 65536) % 256), 2, '0')",
                f"lpad(hex((({n}) div 16777216) % 256), 2, '0')"]

    p16 = lambda v: st.pack("<H", v)  # noqa: E731
    p32 = lambda v: st.pack("<I", v)  # noqa: E731
    frags: list[str] = []

    def c(b: bytes) -> None:
        frags.append(f"'{b.hex()}'")

    def v(sub: list[str]) -> None:
        frags.extend(sub)

    n0 = 5 if gps else 4
    ifd0_end = 8 + 2 + 12 * n0 + 4
    make_off = ifd0_end
    model_off = make_off + 6
    exif_off = model_off + 6
    dto_off = exif_off + 2 + 12 * 3 + 4
    gps_off = dto_off + 20
    tiff_len = (gps_off + 18) if gps else (dto_off + 20)
    c(b"\xff\xd8\xff\xe1" + st.pack(">H", 2 + 6 + tiff_len)
      + b"Exif\x00\x00")
    c(b"II*\x00" + p32(8) + p16(n0))
    c(p16(0x010F) + p16(2) + p32(6) + p32(make_off))
    c(p16(0x0110) + p16(2) + p32(6) + p32(model_off))
    c(p16(0x0112) + p16(3) + p32(1))
    v(u16(ori))
    c(b"\x00\x00")
    c(p16(0x8769) + p16(4) + p32(1) + p32(exif_off))
    if gps:
        c(p16(0x8825) + p16(4) + p32(1) + p32(gps_off))
    c(p32(0))
    c(b"CAM")
    v(dig2(mk))
    c(b"\x00MDL")
    v(dig2(md))
    c(b"\x00")
    c(p16(3))
    c(p16(0x9003) + p16(2) + p32(20) + p32(dto_off))
    c(p16(0xA002) + p16(4) + p32(1))
    v(u32(wd))
    c(p16(0xA003) + p16(4) + p32(1))
    v(u32(ht))
    c(p32(0))
    c(b"2024:")
    v(dig2(mon))
    c(b":")
    v(dig2(day))
    c(b" 10:00:00\x00")
    if gps:
        c(p16(1) + p16(0x0000) + p16(1) + p32(4)
          + b"\x02\x02\x00\x00" + p32(0))
    c(b"\xff\xd9")
    return "concat(" + ", ".join(frags) + ")"


def q_exif_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The EXIF parser under the value oracle: complete APP1/TIFF
    JPEGs are authored JVM-side (every IFD offset a byte-aligned
    Python constant, doc-derived values spliced in as hex fragments;
    even docs carry a GPS IFD) and parsed by
    ops/multimodal.exif_metadata. The oracle states each field
    arithmetically — one wrong offset, endian read or string
    termination in the IFD walk and the columns diverge."""
    from goose_parser_spark.ops.multimodal import exif_metadata
    docs = _documents_amplified(spark, sf_dir)
    payload = (f"unhex(CASE WHEN doc_id % 2 = 0 "
               f"THEN {_exif_author_hex(True)} "
               f"ELSE {_exif_author_hex(False)} END) AS payload")
    img = docs.selectExpr("doc_id", payload)
    return exif_metadata(img)


SQL_EXIF_PARSE = f"""
WITH {_SQL_DOCS_AMP_COPY}
SELECT doc_id,
       'CAM' || lpad(CAST(doc_id % 100 AS VARCHAR), 2, '0') AS make,
       'MDL' || lpad(CAST((doc_id * 3) % 100 AS VARCHAR), 2, '0')
         AS model,
       CAST(doc_id % 8 + 1 AS INTEGER) AS orientation,
       '2024:' || lpad(CAST(doc_id % 12 + 1 AS VARCHAR), 2, '0')
         || ':' || lpad(CAST(doc_id % 28 + 1 AS VARCHAR), 2, '0')
         || ' 10:00:00' AS datetime_original,
       CAST(640 + doc_id % 1280 AS INTEGER) AS exif_width,
       CAST(480 + doc_id % 720 AS INTEGER) AS exif_height,
       doc_id % 2 = 0 AS has_gps
FROM docs_amp
"""


def q_id3_tags(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The ID3v2 parser under the value oracle: v2.3 tags with three
    latin-1 text frames (TIT2/TPE1/TALB) are authored JVM-side —
    every offset is a byte-aligned constant, the doc-derived two-digit
    ids are spliced in as ASCII hex fragments — followed by an MPEG
    frame header for realism. The oracle states the three strings
    arithmetically; a synchsafe-size, frame-walk or encoding bug
    diverges every row."""
    from goose_parser_spark.ops.multimodal import id3_metadata
    docs = _documents_amplified(spark, sf_dir)
    import struct as _struct

    def frame_const(fid: bytes, prefix: bytes) -> bytes:
        # body = encoding byte 0 + prefix + 2 variable digit bytes
        body_len = 1 + len(prefix) + 2
        return (fid + _struct.pack(">I", body_len) + b"\x00\x00"
                + b"\x00" + prefix)

    tag_body_len = 3 * (10 + 1 + 3 + 2)
    ss = bytes(((tag_body_len >> 21) & 0x7F, (tag_body_len >> 14) & 0x7F,
                (tag_body_len >> 7) & 0x7F, tag_body_len & 0x7F))
    head = b"ID3\x03\x00\x00" + ss

    def dig2(n: str) -> list[str]:
        return [f"lpad(hex(48 + ({n}) div 10), 2, '0')",
                f"lpad(hex(48 + ({n}) % 10), 2, '0')"]

    frags = [f"'{head.hex()}'"]
    for fid, prefix, expr in (
            (b"TIT2", b"TRK", "doc_id % 100"),
            (b"TPE1", b"ART", "(doc_id * 3) % 100"),
            (b"TALB", b"ALB", "(doc_id * 7) % 100")):
        frags.append(f"'{frame_const(fid, prefix).hex()}'")
        frags.extend(dig2(expr))
    frags.append(f"'{(bytes([0xFF, 0xFB, 0x90, 0x00])).hex()}'")
    img = docs.selectExpr(
        "doc_id", f"unhex(concat({', '.join(frags)})) AS payload")
    return id3_metadata(img)


SQL_ID3_TAGS = f"""
WITH {_SQL_DOCS_AMP_COPY}
SELECT doc_id,
       'TRK' || lpad(CAST(doc_id % 100 AS VARCHAR), 2, '0') AS title,
       'ART' || lpad(CAST((doc_id * 3) % 100 AS VARCHAR), 2, '0')
         AS artist,
       'ALB' || lpad(CAST((doc_id * 7) % 100 AS VARCHAR), 2, '0')
         AS album
FROM docs_amp
"""


def _vp8l_fixture_layout() -> tuple[int, int, dict[str, tuple[int, int]]]:
    """Bit layout of the oracle-authored 8x8 VP8L stream (after the
    0x2f signature byte): fixed header + no transforms/cache/meta +
    five prefix codes — green = simple 2-symbol {0, 255} (1 bit per
    pixel), red/blue = simple 1-symbol variables, alpha/distance =
    constant 1-symbol — then 64 pixel bits. Returns (const_bits,
    n_bytes, {field: (bit_offset, width)}); variable fields are 'r',
    'b' and the eight pixel-bit bytes 'px0'..'px7'. One generator
    feeds both the Spark authoring expressions and the test suite, so
    layout and replay cannot drift."""
    parts: list[tuple[int | None, int, str | None]] = []

    def c(v: int, n: int) -> None:
        parts.append((v, n, None))

    def var(name: str, n: int) -> None:
        parts.append((None, n, name))

    c(7, 14)           # width - 1
    c(7, 14)           # height - 1
    c(0, 1)            # alpha hint
    c(0, 3)            # version
    c(0, 1)            # no transforms
    c(0, 1)            # no color cache
    c(0, 1)            # no meta prefix
    c(1, 1); c(1, 1); c(1, 1); c(0, 8); c(255, 8)   # green simple2(0,255)
    c(1, 1); c(0, 1); c(1, 1); var("r", 8)          # red simple1(var)
    c(1, 1); c(0, 1); c(1, 1); var("b", 8)          # blue simple1(var)
    c(1, 1); c(0, 1); c(1, 1); c(255, 8)            # alpha simple1(255)
    c(1, 1); c(0, 1); c(1, 1); c(0, 8)              # distance simple1(0)
    for k in range(8):                              # 64 pixel bits
        var(f"px{k}", 8)
    const = 0
    off = 0
    fields: dict[str, tuple[int, int]] = {}
    for v, n, name in parts:
        if name is None:
            const |= (v & ((1 << n) - 1)) << off
        else:
            fields[name] = (off, n)
        off += n
    return const, (off + 7) // 8, fields


def _vp8l_byte_exprs(ref, div: str = "div") -> list[str]:
    """Integer SQL expression per stream byte: constant bits OR'd
    (via +, lanes disjoint) with the in-byte slices of each variable
    field. ``ref(name)`` supplies the field sub-expression; ``div``
    is the integer-division operator spelling ('div' Spark, '//'
    DuckDB). Only +, *, %, div — portable arithmetic."""
    const, n_bytes, fields = _vp8l_fixture_layout()
    exprs = []
    for k in range(n_bytes):
        terms = [str((const >> (8 * k)) & 255)]
        for name, (off, width) in fields.items():
            lo, hi = max(off, 8 * k), min(off + width, 8 * k + 8)
            if lo >= hi:
                continue
            src, nb, dst = lo - off, hi - lo, lo - 8 * k
            t = f"(({ref(name)}) % {1 << (src + nb)}) {div} {1 << src}"
            if dst:
                t = f"({t}) * {1 << dst}"
            terms.append(t)
        exprs.append(" + ".join(terms))
    return exprs


def q_webp_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The REAL VP8L (lossless WebP) decoder under the value oracle:
    a complete RIFF/WEBP/VP8L file per document is authored JVM-side
    from the generated bit layout — 2-symbol simple green code gives
    ONE stream bit per pixel, taken straight from an md5 digest;
    red/blue are doc-derived constants riding 1-symbol codes — then
    phash_image runs the full LSB bit-reading → canonical prefix
    decode → ARGB assembly → BT.601 gray → Catalyst DCT pipeline. The
    oracle replays gray pixels from the same digest bits: one wrong
    bit anywhere in the prefix-code machinery and every hash
    diverges."""
    from goose_parser_spark.ops.multimodal import phash_image
    docs = _documents_amplified(spark, sf_dir)
    base = docs.selectExpr(
        "doc_id",
        "doc_id % 200 AS _r",
        "(doc_id * 7) % 256 AS _b",
        "md5(concat('webp-', CAST(doc_id AS STRING))) AS _h")
    px = [f"CAST(conv(substring(_h, {2 * k + 1}, 2), 16, 10) AS BIGINT)"
          f" AS _x{k}" for k in range(8)]
    base = base.selectExpr("doc_id", "_r", "_b", *px)

    def ref(name: str) -> str:
        return {"r": "_r", "b": "_b"}.get(name,
                                          "_" + name.replace("px", "x"))

    _, n_bytes, _ = _vp8l_fixture_layout()
    head = (b"RIFF" + _pack_le32(4 + 8 + 1 + n_bytes) + b"WEBP"
            + b"VP8L" + _pack_le32(1 + n_bytes) + b"\x2f")
    hexcat = ", ".join(f"lpad(hex({e}), 2, '0')"
                       for e in _vp8l_byte_exprs(ref, div="div"))
    img = base.selectExpr(
        "doc_id",
        f"concat(X'{head.hex()}', unhex(concat({hexcat}))) AS payload")
    return phash_image(img)


def _pack_le32(v: int) -> bytes:
    import struct as _struct
    return _struct.pack("<I", v)


def _sql_webp_decode() -> str:
    """Generated DuckDB replay of q_webp_decode: pixel k's green is
    255 iff bit (k mod 8) of digest byte (k // 8) is set; gray is the
    same BT.601 fixed-point formula the codec uses; then the shared
    pHash chain."""
    pix = []
    for k in range(64):
        byte = (f"CAST(('0x' || substr(_h, {(k // 8) * 2 + 1}, 2)) "
                f"AS BIGINT)")
        bit = f"(({byte}) // {1 << (k % 8)}) % 2"
        pix.append(f"(299 * _r + 587 * (({bit}) * 255) + 114 * _b"
                   f" + 500) // 1000 AS p{k}")
    return f"""wp0 AS (
  SELECT doc_id, doc_id % 200 AS _r, (doc_id * 7) % 256 AS _b,
         md5('webp-' || doc_id) AS _h
  FROM docs_amp
), pix AS (
  SELECT doc_id,
         {', '.join(pix)}
  FROM wp0
), {_sql_phash_chain()}"""


SQL_WEBP_DECODE = f"""
WITH {_SQL_DOCS_AMP_COPY}, {_sql_webp_decode()}
SELECT doc_id, fp AS phash FROM h
"""


def q_webp_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Animated-WebP frame sampling under the value oracle: a 4-frame
    VP8X/ANIM/ANMF container per document, each ANMF carrying the
    same 22-byte VP8L fixture layout as q_webp_decode with PER-FRAME
    digests/colors — so the oracle replays every sampled canvas
    arithmetically, keyed by (doc_id, frame_no). One wrong byte in
    the ANMF walk, the 2x offset coding, or anywhere in the VP8L
    decode and the hashes diverge."""
    import struct as _struct
    from goose_parser_spark.ops.multimodal import video_frames
    docs = _documents_amplified(spark, sf_dir)
    _, n_bytes, _ = _vp8l_fixture_layout()

    def u24(v: int) -> bytes:
        return _struct.pack("<I", v)[:3]

    vp8x = bytes((0x02, 0, 0, 0)) + u24(7) + u24(7)
    anim = bytes((0, 0, 0, 255)) + _struct.pack("<H", 0)
    anmf_head = (u24(0) + u24(0) + u24(7) + u24(7) + u24(40)
                 + b"\x00")
    vp8l_size = 1 + n_bytes
    anmf_body_len = 16 + 8 + vp8l_size
    frame_const = (b"ANMF" + _struct.pack("<I", anmf_body_len)
                   + anmf_head + b"VP8L"
                   + _struct.pack("<I", vp8l_size) + b"\x2f")
    riff_len = (4 + 8 + len(vp8x) + 8 + len(anim)
                + 4 * (8 + anmf_body_len + (anmf_body_len & 1)))
    head = (b"RIFF" + _struct.pack("<I", riff_len) + b"WEBP"
            + b"VP8X" + _struct.pack("<I", len(vp8x)) + vp8x
            + b"ANIM" + _struct.pack("<I", len(anim)) + anim)
    stage1 = ["doc_id"]
    for f in range(4):
        stage1 += [
            f"(doc_id + {3 * f}) % 200 AS _r{f}",
            f"(doc_id * 7 + {f}) % 256 AS _b{f}",
            f"md5(concat('webpa-', CAST(doc_id AS STRING), ':{f}'))"
            f" AS _hh{f}"]
    base = docs.selectExpr(*stage1)
    stage2 = ["doc_id"] + [f"_r{f}" for f in range(4)] \
        + [f"_b{f}" for f in range(4)]
    for f in range(4):
        stage2 += [
            f"CAST(conv(substring(_hh{f}, {2 * k + 1}, 2), 16, 10)"
            f" AS BIGINT) AS _x{f}_{k}" for k in range(8)]
    base = base.selectExpr(*stage2)
    segs = [f"'{head.hex()}'"]
    pad = "" if anmf_body_len % 2 == 0 else "00"
    for f in range(4):
        def ref(name: str, _f=f) -> str:
            if name == "r":
                return f"_r{_f}"
            if name == "b":
                return f"_b{_f}"
            return f"_x{_f}_{name[2:]}"
        segs.append(f"'{frame_const.hex()}'")
        segs += [f"lpad(hex({e}), 2, '0')"
                 for e in _vp8l_byte_exprs(ref, div="div")]
        if pad:
            segs.append(f"'{pad}'")
    img = base.selectExpr(
        "doc_id", f"unhex(concat({', '.join(segs)})) AS payload")
    return video_frames(img, every=2)


SQL_WEBP_FRAMES = f"""
WITH {_SQL_DOCS_AMP_COPY}, wa0 AS (
  SELECT doc_id, CAST(f.range * 2 AS INTEGER) AS frame_no,
         (doc_id + 3 * (f.range * 2)) % 200 AS _r,
         (doc_id * 7 + (f.range * 2)) % 256 AS _b,
         md5('webpa-' || doc_id || ':' || (f.range * 2)) AS _h
  FROM docs_amp CROSS JOIN range(2) f
), pix AS (
  SELECT doc_id, frame_no,
         {', '.join(
             "(299 * _r + 587 * (((CAST(('0x' || substr(_h, "
             f"{(k // 8) * 2 + 1}, 2)) AS BIGINT)) // {1 << (k % 8)})"
             f" % 2 * 255) + 114 * _b + 500) // 1000 AS p{k}"
             for k in range(64))}
  FROM wa0
), {_sql_phash_chain(keys="doc_id, frame_no")}
SELECT doc_id, frame_no, CAST(8 AS INTEGER) AS width,
       CAST(8 AS INTEGER) AS height, fp AS phash
FROM h
"""


def _jpeg_payload_from(h: Column) -> Column:
    """DC-only 16x16 JPEG payload whose 4 diff bytes are the first 4
    hex pairs of digest column ``h`` (ff→fe remapped) — the shared
    authoring brick of the jpeg/video/cross-modal oracles."""
    blocks = []
    for j in range(4):
        pair = F.substring(h, j * 2 + 1, 2)
        pair = F.when(pair == "ff", F.lit("fe")).otherwise(pair)
        blocks.append(F.concat(F.lit("08"), pair, F.lit("00")))
    return F.unhex(F.concat(F.lit(_jpeg_dc_header().hex()),
                            *blocks, F.lit("ffd9")))


def _pgm_payload_from(h: Column) -> Column:
    """8x8 PGM payload whose 64 pixels are the md5 digest chain of
    ``h`` — the full-entropy authoring brick shared by the image and
    cross-modal oracles (full-entropy matters: low-entropy images
    collapse Hamming block buckets and blow the pair join up)."""
    parts = [F.unhex(F.md5(F.concat(h, F.lit(f":{j}"))))
             for j in range(4)]
    return F.concat(F.encode(F.lit("P5 8 8 255\n"), "utf-8"), *parts)


def q_crossmodal_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The media layer's capstone under the value oracle: near-dup
    pairs ACROSS modalities. Even docs contribute a STILL image, odd
    docs contribute an AVI whose sampled frame carries the previous
    doc's pixel bytes — so every odd doc's video frame is a
    pixel-exact dup of its neighbor's still, found by the SAME
    pigeonhole Hamming join images/video/audio all share. The oracle
    replays both fingerprint paths through one digest-pixel chain
    keyed by the CASE-selected seed and the same banded block join —
    a divergence in either decoder, the union, or the join breaks
    the pair set."""
    import struct as _struct
    from goose_parser_spark.ops.dedup import hamming_pairs
    from goose_parser_spark.ops.multimodal import phash_image, video_frames
    docs = _documents_amplified(spark, sf_dir)
    d = F.col("doc_id")
    still_h = F.md5(F.concat(F.lit("xm-"), d.cast("string")))
    stills = docs.filter(d % 2 == 0).select(
        "doc_id", _pgm_payload_from(still_h).alias("payload"))
    s_fp = phash_image(stills)
    # odd docs: 2-frame AVI; only frame 0 (the neighbor's pixels) is
    # sampled at every=2, frame 1 carries unique pixels
    f0_h = F.md5(F.concat(F.lit("xm-"), (d - 1).cast("string")))
    f1_h = F.md5(F.concat(F.lit("xmv-"), d.cast("string")))
    plen = len(b"P5 8 8 255\n") + 64
    chunk_hdr = b"00dc" + _struct.pack("<I", plen)
    pad = b"\x00" if plen & 1 else b""
    frame_bytes = 8 + plen + len(pad)
    movi = b"LIST" + _struct.pack("<I", 4 + 2 * frame_bytes) + b"movi"
    head = (b"RIFF" + _struct.pack("<I", 4 + 8 + 4 + 2 * frame_bytes)
            + b"AVI " + movi)
    avi = F.concat(
        F.lit(head),
        F.lit(chunk_hdr), _pgm_payload_from(f0_h), F.lit(pad),
        F.lit(chunk_hdr), _pgm_payload_from(f1_h), F.lit(pad))
    vids = docs.filter(d % 2 == 1).select(
        "doc_id", avi.alias("payload"))
    v_fp = (video_frames(vids, every=2)
            .filter("frame_no = 0")
            .select("doc_id", "phash"))
    # materialize EACH fingerprint pipeline separately BEFORE the
    # union: unioned, the two ~190-expression DCT chains fuse into
    # one whole-stage-codegen method that exceeds janino's limits in
    # a way the fallback cannot recover from (class-level overflow,
    # fatal, unlike the single-chain case which falls back cleanly).
    # Checkpointed separately each side is the proven phash_pairs
    # shape, and the union then moves 16-byte fingerprints only.
    fps = (s_fp.coalesce(4).localCheckpoint()
           .unionByName(v_fp.coalesce(4).localCheckpoint()))
    return hamming_pairs(fps.localCheckpoint(), "phash",
                         max_hamming=3, bits=60)


SQL_CROSSMODAL_PAIRS = f"""
WITH {_SQL_DOCS_AMP_COPY}, xm0 AS (
  SELECT doc_id,
         md5('xm-' || CASE WHEN doc_id % 2 = 0 THEN doc_id
                           ELSE doc_id - 1 END) AS _h
  FROM docs_amp
), dg AS (
  SELECT doc_id,
         md5(_h || ':0') AS _d0,
         md5(_h || ':1') AS _d1,
         md5(_h || ':2') AS _d2,
         md5(_h || ':3') AS _d3
  FROM xm0
), pix AS (
  SELECT doc_id,
         CAST(('0x' || substr(_d0, 1, 2)) AS BIGINT) AS p0,
         CAST(('0x' || substr(_d0, 3, 2)) AS BIGINT) AS p1,
         CAST(('0x' || substr(_d0, 5, 2)) AS BIGINT) AS p2,
         CAST(('0x' || substr(_d0, 7, 2)) AS BIGINT) AS p3,
         CAST(('0x' || substr(_d0, 9, 2)) AS BIGINT) AS p4,
         CAST(('0x' || substr(_d0, 11, 2)) AS BIGINT) AS p5,
         CAST(('0x' || substr(_d0, 13, 2)) AS BIGINT) AS p6,
         CAST(('0x' || substr(_d0, 15, 2)) AS BIGINT) AS p7,
         CAST(('0x' || substr(_d0, 17, 2)) AS BIGINT) AS p8,
         CAST(('0x' || substr(_d0, 19, 2)) AS BIGINT) AS p9,
         CAST(('0x' || substr(_d0, 21, 2)) AS BIGINT) AS p10,
         CAST(('0x' || substr(_d0, 23, 2)) AS BIGINT) AS p11,
         CAST(('0x' || substr(_d0, 25, 2)) AS BIGINT) AS p12,
         CAST(('0x' || substr(_d0, 27, 2)) AS BIGINT) AS p13,
         CAST(('0x' || substr(_d0, 29, 2)) AS BIGINT) AS p14,
         CAST(('0x' || substr(_d0, 31, 2)) AS BIGINT) AS p15,
         CAST(('0x' || substr(_d1, 1, 2)) AS BIGINT) AS p16,
         CAST(('0x' || substr(_d1, 3, 2)) AS BIGINT) AS p17,
         CAST(('0x' || substr(_d1, 5, 2)) AS BIGINT) AS p18,
         CAST(('0x' || substr(_d1, 7, 2)) AS BIGINT) AS p19,
         CAST(('0x' || substr(_d1, 9, 2)) AS BIGINT) AS p20,
         CAST(('0x' || substr(_d1, 11, 2)) AS BIGINT) AS p21,
         CAST(('0x' || substr(_d1, 13, 2)) AS BIGINT) AS p22,
         CAST(('0x' || substr(_d1, 15, 2)) AS BIGINT) AS p23,
         CAST(('0x' || substr(_d1, 17, 2)) AS BIGINT) AS p24,
         CAST(('0x' || substr(_d1, 19, 2)) AS BIGINT) AS p25,
         CAST(('0x' || substr(_d1, 21, 2)) AS BIGINT) AS p26,
         CAST(('0x' || substr(_d1, 23, 2)) AS BIGINT) AS p27,
         CAST(('0x' || substr(_d1, 25, 2)) AS BIGINT) AS p28,
         CAST(('0x' || substr(_d1, 27, 2)) AS BIGINT) AS p29,
         CAST(('0x' || substr(_d1, 29, 2)) AS BIGINT) AS p30,
         CAST(('0x' || substr(_d1, 31, 2)) AS BIGINT) AS p31,
         CAST(('0x' || substr(_d2, 1, 2)) AS BIGINT) AS p32,
         CAST(('0x' || substr(_d2, 3, 2)) AS BIGINT) AS p33,
         CAST(('0x' || substr(_d2, 5, 2)) AS BIGINT) AS p34,
         CAST(('0x' || substr(_d2, 7, 2)) AS BIGINT) AS p35,
         CAST(('0x' || substr(_d2, 9, 2)) AS BIGINT) AS p36,
         CAST(('0x' || substr(_d2, 11, 2)) AS BIGINT) AS p37,
         CAST(('0x' || substr(_d2, 13, 2)) AS BIGINT) AS p38,
         CAST(('0x' || substr(_d2, 15, 2)) AS BIGINT) AS p39,
         CAST(('0x' || substr(_d2, 17, 2)) AS BIGINT) AS p40,
         CAST(('0x' || substr(_d2, 19, 2)) AS BIGINT) AS p41,
         CAST(('0x' || substr(_d2, 21, 2)) AS BIGINT) AS p42,
         CAST(('0x' || substr(_d2, 23, 2)) AS BIGINT) AS p43,
         CAST(('0x' || substr(_d2, 25, 2)) AS BIGINT) AS p44,
         CAST(('0x' || substr(_d2, 27, 2)) AS BIGINT) AS p45,
         CAST(('0x' || substr(_d2, 29, 2)) AS BIGINT) AS p46,
         CAST(('0x' || substr(_d2, 31, 2)) AS BIGINT) AS p47,
         CAST(('0x' || substr(_d3, 1, 2)) AS BIGINT) AS p48,
         CAST(('0x' || substr(_d3, 3, 2)) AS BIGINT) AS p49,
         CAST(('0x' || substr(_d3, 5, 2)) AS BIGINT) AS p50,
         CAST(('0x' || substr(_d3, 7, 2)) AS BIGINT) AS p51,
         CAST(('0x' || substr(_d3, 9, 2)) AS BIGINT) AS p52,
         CAST(('0x' || substr(_d3, 11, 2)) AS BIGINT) AS p53,
         CAST(('0x' || substr(_d3, 13, 2)) AS BIGINT) AS p54,
         CAST(('0x' || substr(_d3, 15, 2)) AS BIGINT) AS p55,
         CAST(('0x' || substr(_d3, 17, 2)) AS BIGINT) AS p56,
         CAST(('0x' || substr(_d3, 19, 2)) AS BIGINT) AS p57,
         CAST(('0x' || substr(_d3, 21, 2)) AS BIGINT) AS p58,
         CAST(('0x' || substr(_d3, 23, 2)) AS BIGINT) AS p59,
         CAST(('0x' || substr(_d3, 25, 2)) AS BIGINT) AS p60,
         CAST(('0x' || substr(_d3, 27, 2)) AS BIGINT) AS p61,
         CAST(('0x' || substr(_d3, 29, 2)) AS BIGINT) AS p62,
         CAST(('0x' || substr(_d3, 31, 2)) AS BIGINT) AS p63
  FROM dg
), {_sql_phash_chain()}, blocks AS (
  SELECT doc_id, fp, r.range AS blk,
         (fp >> CAST(r.range * 15 AS INTEGER)) & 32767 AS bv
  FROM h CROSS JOIN range(4) r
), cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM blocks a JOIN blocks b
    ON a.blk = b.blk AND a.bv = b.bv AND a.doc_id < b.doc_id
)
SELECT DISTINCT doc_a, doc_b,
       CAST(bit_count(xor(ha.fp, hb.fp)) AS INTEGER) AS hamming
FROM cand
JOIN h ha ON ha.doc_id = doc_a
JOIN h hb ON hb.doc_id = doc_b
WHERE bit_count(xor(ha.fp, hb.fp)) <= 3
"""


def q_audio_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The audio energy-envelope fingerprint under the value oracle:
    8-bit PCM WAVs (256 samples from 16 md5 digests) are decoded by
    the real codec, framed at 16 samples, and the 15 frame-to-frame
    energy-delta signs pack into the fingerprint. The oracle
    re-derives every sample (byte - 128), every integer frame energy
    and every comparison — one wrong bit in decode, framing, window
    ordering or bit packing and the integers diverge."""
    import struct as _struct
    from goose_parser_spark.ops.multimodal import audio_fingerprint
    docs = _documents_amplified(spark, sf_dir)
    h = F.md5(F.concat(F.lit("afp-"), F.col("doc_id").cast("string")))
    parts = [F.unhex(F.md5(F.concat(h, F.lit(f":{j}"))))
             for j in range(16)]
    fmt = _struct.pack("<HHIIHH", 1, 1, 8000, 8000, 1, 8)
    header = (b"RIFF" + _struct.pack("<I", 4 + 8 + len(fmt) + 8 + 256)
              + b"WAVE" + b"fmt " + _struct.pack("<I", len(fmt)) + fmt
              + b"data" + _struct.pack("<I", 256))
    payload = F.concat(F.lit(header), *parts)
    wav = docs.select("doc_id", payload.alias("payload"))
    return audio_fingerprint(wav, frame=16, bits=15)


def _sql_audio_fingerprint() -> str:
    """Generated DuckDB replay: 256 recentered samples from the
    digest chain, 16 integer frame energies, 15 delta-sign bits."""
    digs = ",\n         ".join(
        f"md5(_h || ':{j}') AS _d{j}" for j in range(16))
    eexprs = []
    for f in range(16):
        terms = []
        for k in range(16):
            byte = f * 16 + k
            d, off = byte // 16, byte % 16
            terms.append(
                f"abs(CAST(('0x' || substr(_d{d}, {off * 2 + 1}, 2)) "
                f"AS BIGINT) - 128)")
        eexprs.append(f"({' + '.join(terms)}) // 16 AS e{f}")
    bits = " + ".join(
        f"CASE WHEN e{i} > e{i - 1} THEN {1 << (i - 1)} ELSE 0 END"
        for i in range(1, 16))
    return (
        "a0 AS (\n"
        "  SELECT doc_id, md5('afp-' || doc_id) AS _h FROM docs_amp\n"
        "), ad AS (\n"
        f"  SELECT doc_id,\n         {digs}\n  FROM a0\n"
        "), ae AS (\n"
        f"  SELECT doc_id,\n         {', '.join(eexprs)}\n  FROM ad\n"
        ")\n"
        f"SELECT doc_id, CAST({bits} AS BIGINT) AS afp,\n"
        "       CAST(16 AS INTEGER) AS n_frames\n"
        "FROM ae")


SQL_AUDIO_FINGERPRINT = (
    f"WITH {_SQL_DOCS_AMP_COPY}, " + _sql_audio_fingerprint())


def q_video_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The REAL video path under the value oracle: a 4-frame
    AVI/MJPEG file per document is authored JVM-side — RIFF/hdrl/movi
    envelope around four DC-only 16x16 JPEGs whose diff bytes come
    from per-frame md5 digests (ff→fe remapped, same trick as
    q_jpeg_decode) — then ops/multimodal.video_frames walks the
    container, samples every 2nd frame, runs the FULL JPEG decode on
    each sampled frame and fingerprints it with the Catalyst pHash
    chain. The oracle replays container-independent per-frame quadrant
    arithmetic keyed by (doc_id, frame_no): one wrong byte in the RIFF
    walk (padding, LIST recursion, size bound) or anywhere in the
    JPEG/DCT pipeline and the hashes diverge."""
    import struct as _struct
    from goose_parser_spark.ops.multimodal import video_frames
    docs = _documents_amplified(spark, sf_dir)
    d = F.col("doc_id")
    jhdr = _jpeg_dc_header()
    jlen = len(jhdr) + 4 * 3 + 2
    chunk_hdr = b"00dc" + _struct.pack("<I", jlen)
    pad = b"\x00" if jlen & 1 else b""
    frame_bytes = 8 + jlen + len(pad)
    avih = _struct.pack("<IIIIII", 40000, 0, 0, 0, 4, 0)
    hdrl = (b"LIST" + _struct.pack("<I", 4 + 8 + len(avih))
            + b"hdrl" + b"avih" + _struct.pack("<I", len(avih)) + avih)
    movi = (b"LIST" + _struct.pack("<I", 4 + 4 * frame_bytes) + b"movi")
    riff_body_len = 4 + len(hdrl) + 8 + 4 + 4 * frame_bytes
    head = (b"RIFF" + _struct.pack("<I", riff_body_len) + b"AVI "
            + hdrl + movi)

    def frame_blocks(f: int):
        hf = F.md5(F.concat(F.lit("avi-"), d.cast("string"),
                            F.lit(f":{f}")))
        parts = []
        for j in range(4):
            pair = F.substring(hf, j * 2 + 1, 2)
            pair = F.when(pair == "ff", F.lit("fe")).otherwise(pair)
            parts.append(F.concat(F.lit("08"), pair, F.lit("00")))
        return F.unhex(F.concat(*parts))

    segs = [F.lit(head)]
    for f in range(4):
        segs.append(F.lit(chunk_hdr + jhdr))
        segs.append(frame_blocks(f))
        segs.append(F.lit(b"\xff\xd9" + pad))
    payload = F.concat(*segs)
    avi = docs.select("doc_id", payload.alias("payload"))
    return video_frames(avi, every=2)


SQL_VIDEO_FRAMES = f"""
WITH {_SQL_DOCS_AMP_COPY}, jp0 AS (
  SELECT doc_id, CAST(f.range * 2 AS INTEGER) AS frame_no,
         md5('avi-' || doc_id || ':' || (f.range * 2)) AS _h
  FROM docs_amp CROSS JOIN range(2) f
), {_sql_dc_jpeg_pix(keys="doc_id, frame_no")},
{_sql_phash_chain(keys="doc_id, frame_no")}
SELECT doc_id, frame_no, CAST(16 AS INTEGER) AS width,
       CAST(16 AS INTEGER) AS height, fp AS phash
FROM h
"""


def q_media_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Header-only media probing under the value oracle
    (ops/multimodal.media_probe), four authored payload classes plus
    poison: JPEG prefixes with doc-derived SOF0 dimensions; MPEG1
    Layer III streams with doc-derived bitrate index + filler length
    (CBR duration must replay); Ogg-Opus two-page files whose final
    granule position is doc-derived (duration = granule/48); AVIF
    meta>iprp>ipco>ispe chains with doc-derived dims; every 97th
    payload is garbage and must yield the NULL-format poison row.
    The oracle predicts format, dimensions and duration
    arithmetically — a byte-order, offset, bitrate-table, granule or
    box-walk bug diverges immediately."""
    from goose_parser_spark.ops.multimodal import media_probe
    docs = _documents_amplified(spark, sf_dir)
    d = F.col("doc_id")

    def be16(col: Column) -> Column:
        return F.unhex(F.lpad(F.hex(col), 4, "0"))

    jpeg = F.concat(
        F.lit(b"\xff\xd8\xff\xc0\x00\x0b\x08"),
        be16((d % 1080) + 32), be16((d % 1920) + 32),
        F.lit(b"\x01\x11\x00"))
    # MPEG1 L3 header: FF FB (bitrate_idx<<4) 00 — idx in 1..14,
    # filler 2000 + doc%997 bytes (content irrelevant to the probe)
    mp3 = F.concat(
        F.lit(b"\xff\xfb"),
        F.unhex(F.lpad(F.hex((d % 14 + 1) * 16), 2, "0")),
        F.lit(b"\x00"),
        F.expr("encode(repeat(' ', 2000 + doc_id % 997), 'utf-8')"))
    # Ogg-Opus: const id page (granule 0, pre-skip 0), then a final
    # 4-byte data page whose granule is doc-derived — the duration
    # must replay as granule * 1000 // 48000
    import struct as _struct
    opus_head = (b"OpusHead" + bytes((1, 1)) + _struct.pack("<H", 0)
                 + _struct.pack("<I", 48000) + b"\x00\x00\x00")
    page0 = (b"OggS\x00\x02" + _struct.pack("<q", 0)
             + _struct.pack("<III", 1, 0, 0)
             + bytes((1, len(opus_head))) + opus_head)
    page1_pre = (b"OggS\x00\x04",)  # granule follows
    gran = (d % 1000 + 1) * 4800

    def le32(col: Column) -> Column:
        """4 little-endian bytes of a 32-bit value."""
        return F.unhex(F.concat(
            F.lpad(F.hex(col % 256), 2, "0"),
            F.lpad(F.hex((col / 256).cast("long") % 256), 2, "0"),
            F.lpad(F.hex((col / 65536).cast("long") % 256), 2, "0"),
            F.lpad(F.hex((col / 16777216).cast("long") % 256), 2, "0")))

    ogg = F.concat(
        F.lit(page0), F.lit(page1_pre[0]), le32(gran),
        F.lit(b"\x00\x00\x00\x00"
              + _struct.pack("<III", 1, 1, 0)
              + bytes((1, 4)) + b"\x00\x00\x00\x00"))
    # AVIF: ftyp + meta>iprp>ipco>ispe with doc-derived dims
    def box(tag: bytes, body_len: int) -> bytes:
        return _struct.pack(">I", body_len + 8) + tag

    ispe_body = 4 + 8                  # fullbox version/flags + dims
    ipco_body = 8 + ispe_body          # the ispe box in full
    iprp_body = 8 + ipco_body
    meta_body = 4 + 8 + iprp_body      # fullbox + the iprp box
    avif = F.concat(
        F.lit(box(b"ftyp", 8) + b"avif\x00\x00\x00\x00"
              + box(b"meta", meta_body) + b"\x00\x00\x00\x00"
              + box(b"iprp", iprp_body) + box(b"ipco", ipco_body)
              + box(b"ispe", ispe_body) + b"\x00\x00\x00\x00"),
        F.unhex(F.lpad(F.hex((d % 2000) + 16), 8, "0")),
        F.unhex(F.lpad(F.hex((d % 1500) + 16), 8, "0")))
    payload = (F.when(d % 97 == 13, F.lit(b"no header here"))
               .when(d % 5 == 2, mp3)
               .when(d % 7 == 3, ogg)
               .when(d % 11 == 5, avif).otherwise(jpeg))
    return media_probe(docs.select("doc_id", payload.alias("payload")))


def _sql_mp3_kbps(idx: str) -> str:
    """CASE over the shared MPEG1 Layer III bitrate table."""
    from goose_parser_spark.ops.imagecodec import _MP3_BITRATE_V1
    arms = " ".join(f"WHEN {i} THEN {_MP3_BITRATE_V1[i]}"
                    for i in range(1, 15))
    return f"CASE {idx} {arms} END"


SQL_MEDIA_PROBE = f"""
WITH {_SQL_DOCS_AMP_COPY}, mp AS (
  SELECT doc_id,
         CASE WHEN doc_id % 97 = 13 THEN 'poison'
              WHEN doc_id % 5 = 2 THEN 'mp3'
              WHEN doc_id % 7 = 3 THEN 'ogg-opus'
              WHEN doc_id % 11 = 5 THEN 'avif'
              ELSE 'jpeg' END AS cls
  FROM docs_amp
)
SELECT doc_id,
       CASE WHEN cls = 'poison' THEN NULL ELSE cls END AS format,
       CASE WHEN cls = 'jpeg' THEN CAST(doc_id % 1920 + 32 AS INTEGER)
            WHEN cls = 'avif' THEN CAST(doc_id % 2000 + 16 AS INTEGER)
            ELSE NULL END AS width,
       CASE WHEN cls = 'jpeg' THEN CAST(doc_id % 1080 + 32 AS INTEGER)
            WHEN cls = 'avif' THEN CAST(doc_id % 1500 + 16 AS INTEGER)
            ELSE NULL END AS height,
       CASE WHEN cls = 'mp3'
            THEN CAST((2004 + doc_id % 997) * 8
                      // ({_sql_mp3_kbps("doc_id % 14 + 1")}) AS BIGINT)
            WHEN cls = 'ogg-opus'
            THEN CAST((doc_id % 1000 + 1) * 100 AS BIGINT)
            ELSE CAST(NULL AS BIGINT) END AS duration_ms
FROM mp
"""


_CMS_PROBES = ("the", "a", "of", "and", "to", "quantum", "zzz_absent",
               "for", "is", "borogoves")


def q_cms_topterms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-Min frequency sketch (ops/sketches.py): 4×1024 counter
    table built in one pass over corpus tokens, probed for a fixed
    term list. md5-derived cells → the oracle reproduces the sketch
    (and so the estimates, collisions included) exactly."""
    from goose_parser_spark.ops.sketches import (
        count_min_build, count_min_query)
    docs = _documents_amplified(spark, sf_dir)
    toks = docs.select(F.explode(
        F.filter(F.split("text", " "), lambda x: x != "")).alias("term"))
    sketch = count_min_build(toks, "term", depth=4, width=1024)
    probes = spark.createDataFrame([(t,) for t in _CMS_PROBES],
                                   "term string")
    return count_min_query(probes, sketch, "term", depth=4, width=1024)


_SQL_CMS_PROBE_VALUES = ", ".join(f"('{t}')" for t in _CMS_PROBES)

SQL_CMS_TOPTERMS = f"""
WITH {_SQL_DOCS_AMP_COPY}, tok AS (
  SELECT unnest(list_filter(string_split(text, ' '), x -> x != '')) AS t
  FROM docs_amp
), cells AS (
  SELECT r.range AS row,
         CAST(('0x' || substr(md5(t || '#cm' || r.range), 1, 15))
              AS BIGINT) % 1024 AS col
  FROM tok CROSS JOIN range(4) r
), sk AS (
  SELECT row, col, CAST(count(*) AS BIGINT) AS c FROM cells GROUP BY 1, 2
), probes(term) AS (VALUES {_SQL_CMS_PROBE_VALUES}),
pc AS (
  SELECT term, r.range AS row,
         CAST(('0x' || substr(md5(term || '#cm' || r.range), 1, 15))
              AS BIGINT) % 1024 AS col
  FROM probes CROSS JOIN range(4) r
)
SELECT term, CAST(min(coalesce(c, 0)) AS BIGINT) AS est
FROM pc LEFT JOIN sk USING (row, col)
GROUP BY term
"""


# SQL fragment: rho for the 51-bit tail (p=9) — a comparison ladder,
# NOT floor(log2(..)): log2 of an exact power of two can land a hair
# below the integer in one engine and flip the floor.
_HLL_P = 9
_HLL_TAIL = 60 - _HLL_P
_HLL_LADDER = " ".join(
    f"WHEN tail >= {1 << (k - 1)} THEN {k}"
    for k in range(_HLL_TAIL, 0, -1))
_HLL_ALPHA = 0.7213 / (1.0 + 1.079 / (1 << _HLL_P))
_HLL_M = 1 << _HLL_P
_HLL_R = _HLL_TAIL + 1
_HLL_NUM = repr(_HLL_ALPHA * _HLL_M * _HLL_M * float(2 ** _HLL_R))
_HLL_POW_R = repr(float(2 ** _HLL_R))


def q_hll_cardinality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog distinct-token estimate per source
    (ops/sketches.py, p=9 → 512 registers) next to the exact distinct
    count. Registers are md5-derived and the harmonic sum accumulates
    as exact integers, so the ESTIMATE is oracle-checkable
    digit-for-digit — the approximation error is visible and
    deterministic."""
    from goose_parser_spark.ops.sketches import hll_build, hll_estimate
    docs = _documents_amplified(spark, sf_dir)
    toks = docs.select("source", F.explode(
        F.filter(F.split("text", " "), lambda x: x != "")).alias("t"))
    regs = hll_build(toks, "t", group_cols=["source"], p=_HLL_P)
    est = hll_estimate(regs, group_cols=["source"], p=_HLL_P)
    exact = toks.groupBy("source").agg(
        F.countDistinct("t").alias("exact_distinct"))
    return est.join(exact, on="source")


SQL_HLL_CARDINALITY = f"""
WITH {_SQL_DOCS_AMP_COPY}, tok AS (
  SELECT source,
         unnest(list_filter(string_split(text, ' '), x -> x != '')) AS t
  FROM docs_amp
), hashed AS (
  SELECT source,
         CAST(('0x' || substr(md5(t || '#hll'), 1, 15)) AS BIGINT) AS h
  FROM tok
), parts AS (
  SELECT source, h >> {_HLL_TAIL} AS bucket,
         h & {(1 << _HLL_TAIL) - 1} AS tail
  FROM hashed
), regs AS (
  SELECT source, bucket,
         max(CASE WHEN tail = 0 THEN {_HLL_TAIL + 1}
                  ELSE {_HLL_TAIL} - (CASE {_HLL_LADDER} ELSE 0 END) + 1
             END) AS rho
  FROM parts GROUP BY 1, 2
), agg AS (
  SELECT source,
         CAST(sum(CAST(1 AS BIGINT) << CAST({_HLL_R} - rho AS INTEGER))
              AS BIGINT) AS s,
         count(*) AS nz
  FROM regs GROUP BY 1
), est AS (
  SELECT source,
         {_HLL_NUM} / (s + ({_HLL_M} - nz) * {_HLL_POW_R}) AS raw,
         {_HLL_M} - nz AS zeros
  FROM agg
)
SELECT source,
       CAST(round(CASE WHEN raw <= {2.5 * _HLL_M} AND zeros > 0
                       THEN {float(_HLL_M)} * ln({float(_HLL_M)} / zeros)
                       ELSE raw END) AS BIGINT) AS distinct_est,
       (SELECT count(DISTINCT t) FROM tok t2 WHERE t2.source = est.source)
         AS exact_distinct
FROM est
"""


# --------------------------------------------------------------------------
# Registry
# --------------------------------------------------------------------------

QueryFn = Callable[[SparkSession, str], DataFrame]

# Ordering contract (VERDICT r03 #2): the driver's correctness gate
# hashes only the FIRST 50 insertion-ordered entries, so slots 1–50
# carry exactly one oracle-checked representative of every operator
# family. Slots 51+ are (a) oracled queries whose family already has
# an in-window hash row — still verified by tools/check_oracles.py
# and the judge's full harness — then (b) the rows-only entries
# (xxhash64-seeded, not DuckDB-expressible; pytest-verified instead).
# Micro-queries fully subsumed by an in-window query live in
# DEMOTED_QUERIES below (pytest-gated via tests/test_demoted_oracles).
def q_readability(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flesch reading-ease / FK grade (ops/textstats.py
    readability_scores) over punctuated synth docs (every 3rd doc gets
    sentence punctuation; the rest are one implicit sentence).
    Map-only scalar arithmetic on exact counts."""
    from goose_parser_spark.ops.textstats import readability_scores
    docs = _documents_amplified(spark, sf_dir)
    d = F.col("doc_id")
    punct = F.concat(F.lit("Opening claim "), d.cast("string"),
                     F.lit(". "), F.col("text"),
                     F.lit("! Closing question "), (d % 9).cast("string"),
                     F.lit("?"))
    lined = docs.select(
        "doc_id",
        F.when(d % 3 == 0, punct).otherwise(F.col("text")).alias("text"))
    return readability_scores(lined)


SQL_READABILITY = f"""
WITH {_SQL_DOCS_AMP_COPY}, lined AS (
  SELECT doc_id,
         CASE WHEN doc_id % 3 = 0
              THEN 'Opening claim ' || doc_id || '. ' || text ||
                   '! Closing question ' || (doc_id % 9) || '?'
              ELSE text END AS text
  FROM docs_amp
), counts AS (
  SELECT doc_id,
         len(list_filter(string_split_regex(text, '\\s+'),
                         t -> t <> '')) AS n_words,
         greatest(len(regexp_extract_all(text, '[.!?]+')), 1)
           AS n_sentences,
         CAST(list_sum(list_transform(
             list_filter(string_split_regex(text, '\\s+'), t -> t <> ''),
             t -> greatest(len(regexp_extract_all(lower(t), '[aeiouy]+')),
                           1))) AS BIGINT) AS n_syllables
  FROM lined
)
SELECT doc_id, CAST(n_words AS INT) AS n_words,
       CAST(n_sentences AS INT) AS n_sentences, n_syllables,
       CAST(floor((206.835
                   - 1.015 * (n_words / CAST(n_sentences AS DOUBLE))
                   - 84.6 * (n_syllables / CAST(n_words AS DOUBLE)))
                  * 1000.0) AS BIGINT) AS flesch_milli,
       CAST(floor((0.39 * (n_words / CAST(n_sentences AS DOUBLE))
                   + 11.8 * (n_syllables / CAST(n_words AS DOUBLE))
                   - 15.59) * 1000.0) AS BIGINT) AS fk_milli
FROM counts WHERE n_words > 0
"""


def q_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Crawl-snapshot delta (ops/crawl.py snapshot_diff): old = the
    corpus; new = same minus every 11th url (gone), every 7th body
    edited (changed), plus synthetic urls (added). One url-keyed
    full-outer join over md5 digests — bodies never shuffle."""
    from goose_parser_spark.ops.crawl import snapshot_diff
    docs = _documents_amplified(spark, sf_dir)
    d = F.col("doc_id")
    url = F.concat(F.lit("https://h"), (d % 37).cast("string"),
                   F.lit(".test/p/"), d.cast("string"))
    old = docs.select(url.alias("url"), "text")
    new = (docs.where(d % 11 != 0)
           .select(url.alias("url"),
                   F.when(d % 7 == 0,
                          F.concat(F.col("text"), F.lit(" [edited]")))
                   .otherwise(F.col("text")).alias("text"))
           .unionByName(
               docs.where(d % 13 == 0)
               .select(F.concat(F.lit("https://new.test/p/"),
                                d.cast("string")).alias("url"),
                       F.col("text"))))
    return snapshot_diff(old, new)


SQL_SNAPSHOT_DIFF = f"""
WITH {_SQL_DOCS_AMP_COPY}, old AS (
  SELECT 'https://h' || (doc_id % 37) || '.test/p/' || doc_id AS url,
         md5(text) AS old_digest
  FROM docs_amp
), new AS (
  SELECT 'https://h' || (doc_id % 37) || '.test/p/' || doc_id AS url,
         md5(CASE WHEN doc_id % 7 = 0 THEN text || ' [edited]'
                  ELSE text END) AS new_digest
  FROM docs_amp WHERE doc_id % 11 <> 0
  UNION ALL
  SELECT 'https://new.test/p/' || doc_id AS url, md5(text)
  FROM docs_amp WHERE doc_id % 13 = 0
)
SELECT COALESCE(old.url, new.url) AS url,
       CASE WHEN old_digest IS NULL THEN 'added'
            WHEN new_digest IS NULL THEN 'gone'
            WHEN old_digest = new_digest THEN 'unchanged'
            ELSE 'changed' END AS status,
       old_digest, new_digest
FROM old FULL OUTER JOIN new ON old.url = new.url
"""


def q_incremental_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-snapshot INCREMENTAL extraction — the monthly-crawl-delta
    workflow end-to-end: snapshot_diff classifies urls between two
    synthesized crawls over md5 digests (bodies never shuffle), a
    left-semi join keeps only added+changed pages, and ONLY those run
    the extraction engine. At 10^12 urls with a few-percent monthly
    churn this turns re-extraction cost from corpus-proportional to
    delta-proportional. New crawl: every 11th url gone, every 7th
    body edited, every 13th doc re-published at a /new/ url."""
    from goose_parser_spark.ops.crawl import snapshot_diff
    docs = _documents_amplified(spark, sf_dir)
    d = F.col("doc_id")
    old_pages = _pages_from_documents(spark, sf_dir, docs=docs)
    new_docs = (docs.where(d % 11 != 0)
                .withColumn("text",
                            F.when(d % 7 == 0,
                                   F.concat(F.col("text"),
                                            F.lit(" [edited]")))
                            .otherwise(F.col("text"))))
    new_pages = (_pages_from_documents(spark, sf_dir, docs=new_docs)
                 .unionByName(_pages_from_documents(
                     spark, sf_dir, docs=docs.where(d % 13 == 0),
                     url_prefix="https://docs.test/new/")))
    delta = snapshot_diff(old_pages, new_pages, content_col="html")
    todo = (delta.where(F.col("status").isin("added", "changed"))
            .select("url"))
    pages = new_pages.join(todo, on="url", how="left_semi")
    out = extract(pages, _FLAGSHIP_RULES)
    return out.select(
        "url",
        F.col("extracted.title").alias("title"),
        F.col("extracted.body").alias("body"),
    )


SQL_INCREMENTAL_EXTRACT = f"""
WITH {_SQL_DOCS_AMP_COPY}
SELECT 'https://docs.test/' || doc_id AS url,
       'doc ' || doc_id AS title,
       text || ' [edited]' AS body
FROM docs_amp WHERE doc_id % 7 = 0 AND doc_id % 11 <> 0
UNION ALL
SELECT 'https://docs.test/new/' || doc_id AS url,
       'doc ' || doc_id AS title,
       text AS body
FROM docs_amp WHERE doc_id % 13 = 0
"""


def q_pdf_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL PDF parsing under the value oracle (ops/layout.py
    parse_pdf_text): raw-stream single-page PDFs are authored JVM-side
    by pure string concat (escape → content → /Length via
    octet_length), then the extractor parses them back inside
    mapInPandas (a sanctioned Python point). The oracle predicts the
    fixed point — page text must equal the document text byte-for-byte
    — so the whole object-scan → page-tree → content-stream →
    text-operator pipeline is value-gated, not just the plumbing."""
    from goose_parser_spark.ops.layout import extract_pdf_pages
    docs = _documents_amplified(spark, sf_dir)
    esc = F.regexp_replace(F.col("text"), r"([\\()])", r"\\$1")
    content = F.concat(F.lit("BT ("), esc, F.lit(") Tj ET"))
    pdf = F.concat(
        F.lit("%PDF-1.4\n"
              "1 0 obj\n<< /Type /Catalog /Pages 2 0 R >>\nendobj\n"
              "2 0 obj\n<< /Type /Pages /Kids [3 0 R] /Count 1 >>\n"
              "endobj\n"
              "3 0 obj\n<< /Type /Page /Parent 2 0 R /Contents 4 0 R >>"
              "\nendobj\n"
              "4 0 obj\n<< /Length "),
        F.octet_length(content).cast("string"),
        F.lit(" >>\nstream\n"), content,
        F.lit("\nendstream\nendobj\n%%EOF"))
    pages = docs.select("doc_id", F.encode(pdf, "utf-8").alias("payload"))
    out = extract_pdf_pages(pages, payload_col="payload",
                            id_col="doc_id")
    return out.select("doc_id", "page_no", "page_text", "n_pages")


SQL_PDF_EXTRACT = f"""
WITH {_SQL_DOCS_AMP_COPY}
SELECT doc_id, CAST(0 AS INTEGER) AS page_no, text AS page_text,
       CAST(1 AS INTEGER) AS n_pages
FROM docs_amp
"""


def q_pdf_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PDF /Info metadata under the value oracle (ops/layout.py
    parse_pdf_info): the authored PDFs carry an Info object with an
    escaped-paren literal title, the doc's lang as author, a
    producer with an escape sequence, and a trailer /Info reference —
    plus the same single-page tree as pdf_extract, so the page count
    rides along. The oracle predicts every parsed field exactly
    (escape handling included)."""
    from goose_parser_spark.ops.layout import pdf_metadata
    docs = _documents_amplified(spark, sf_dir)
    s = F.col("doc_id").cast("string")
    pdf = F.concat(
        F.lit("%PDF-1.4\n"
              "1 0 obj\n<< /Type /Catalog /Pages 2 0 R >>\nendobj\n"
              "2 0 obj\n<< /Type /Pages /Kids [3 0 R] /Count 1 >>\n"
              "endobj\n"
              "3 0 obj\n<< /Type /Page /Parent 2 0 R /Contents 4 0 R >>"
              "\nendobj\n"
              "4 0 obj\n<< /Length 14 >>\nstream\nBT (pg) Tj ET\n"
              "endstream\nendobj\n"
              "5 0 obj\n<< /Title (T \\(doc\\) "), s,
        F.lit(") /Author ("), F.col("lang"),
        F.lit(") /Producer (goose\\nspark) >>\nendobj\n"
              "trailer\n<< /Size 6 /Root 1 0 R /Info 5 0 R >>\n%%EOF"))
    pages = docs.select("doc_id", F.encode(pdf, "utf-8").alias("payload"))
    return pdf_metadata(pages).select(
        "doc_id", "n_pages", "title", "author", "subject", "producer",
        "created")


SQL_PDF_METADATA = f"""
WITH {_SQL_DOCS_AMP_COPY}
SELECT doc_id, CAST(1 AS INTEGER) AS n_pages,
       'T (doc) ' || doc_id AS title, lang AS author,
       CAST(NULL AS VARCHAR) AS subject,
       'goose' || chr(10) || 'spark' AS producer,
       CAST(NULL AS VARCHAR) AS created
FROM docs_amp
"""


_TOKEN_BUDGET = 300_000


def q_token_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global token-budget selection (ops/sampling.py
    select_token_budget): md5-derived integer pseudo-quality in [0,97)
    — replica families share a bucket, so whole-bucket keep/drop AND
    the single boundary bucket's per-doc ordered cumsum both execute.
    Bounded-histogram cumsum plan; only the boundary bucket pays a
    per-document window."""
    from goose_parser_spark.ops.sampling import select_token_budget
    docs = _documents_amplified(spark, sf_dir)
    toks = F.size(F.filter(F.split(F.col("text"), r"\s+"),
                           lambda t: t != ""))
    qual = F.pmod(
        F.conv(F.substring(F.md5(F.col("text")), 1, 4), 16, 10)
        .cast("long"), F.lit(97)).cast("int")
    scored = docs.select("doc_id", qual.alias("quality"),
                         toks.cast("long").alias("n_tokens"))
    return select_token_budget(scored, budget=_TOKEN_BUDGET)


SQL_TOKEN_BUDGET = f"""
WITH {_SQL_DOCS_AMP_COPY}, scored AS (
  SELECT doc_id,
         CAST(CAST(('0x' || substr(md5(text), 1, 4)) AS BIGINT) % 97
              AS INTEGER) AS quality,
         CAST(len(list_filter(string_split_regex(text, '\\s+'),
                              t -> t <> '')) AS BIGINT) AS n_tokens
  FROM docs_amp
), hist AS (
  SELECT quality, SUM(n_tokens) AS bt FROM scored GROUP BY quality
), cum AS (
  SELECT quality, bt,
         COALESCE(SUM(bt) OVER (ORDER BY quality DESC
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cb
  FROM hist
), j AS (
  SELECT s.doc_id, s.quality, s.n_tokens, c.bt, c.cb
  FROM scored s JOIN cum c USING (quality)
), boundary AS (
  SELECT doc_id, quality, n_tokens, cb,
         SUM(n_tokens) OVER (PARTITION BY quality
             ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS dc
  FROM j WHERE cb < {_TOKEN_BUDGET} AND cb + bt > {_TOKEN_BUDGET}
)
SELECT doc_id, quality, n_tokens FROM j WHERE cb + bt <= {_TOKEN_BUDGET}
UNION ALL
SELECT doc_id, quality, n_tokens FROM boundary
WHERE cb + dc <= {_TOKEN_BUDGET}
"""


QUERIES: dict[str, QueryFn] = {
    # Driver-window rotation policy (VERDICT r04 #5): the driver
    # hash-gates only the FIRST 50 entries, so the window rotates
    # each round until every oracled operator has accumulated a
    # driver-signed row. Round-6 window = pinned extraction family
    # + md5 hard oracles (13); then url_canonicalize / hash_split /
    # extract_markdown — the ONLY three oracled queries never driver-
    # signed in any of rounds 1-5 (VERDICT r5 "what's wrong" #2:
    # an earlier comment here wrongly claimed they were; corrected);
    # then bpe_train / topic_clusters (rows-only, also never driver-
    # seen); then the 5 queries rotated out in r5; then 27 family
    # representatives. tools/check_oracles.py still verifies all
    # oracled queries every round regardless of the window.
    # -- pinned: extraction family + md5 hard oracles --
    "extract_flagship": q_extract_flagship,
    "extract_grid_explode": q_extract_grid_explode,
    "extract_transform_chain": q_extract_transform_chain,
    "n4_id_dedup": q_n4_id_dedup,
    "dedup_minhash_md5": q_dedup_minhash_md5,
    "dedup_simhash_md5": q_dedup_simhash_md5,
    "i1_bucketing_md5": q_i1_bucketing_md5,
    # -- never driver-signed in r1-r5 (oracled) --
    "url_canonicalize": q_url_canonicalize,
    "hash_split": q_hash_split,
    "extract_markdown": q_extract_markdown,
    # -- never driver-seen in r1-r5 (rows-only by nature) --
    "bpe_train": q_bpe_train,
    "topic_clusters": q_topic_clusters,
    # -- rotated out in r5, back in-window --
    "dedup_ngram_jaccard": q_dedup_ngram_jaccard,
    "dedup_embedding_cosine": q_dedup_embedding_cosine,
    "lm_score": q_lm_score,
    "c4_clean": q_c4_clean,
    "frontier_urls": q_frontier_urls,
    # -- family representatives --
    "line_dedup": q_line_dedup,
    "link_pagerank": q_link_pagerank,
    "bloom_frontier": q_bloom_frontier,
    "events_asof_join": q_events_asof_join,
    "robots_filter": q_robots_filter,
    "text_quality": q_text_quality,
    "text_gopher_quality": q_text_gopher_quality,
    # -- new in round 6 --
    "jpeg_decode": q_jpeg_decode,
    "extract_tables": q_extract_tables,
    "feed_parse": q_feed_parse,
    "http_headers": q_http_headers,
    "pdf_metadata": q_pdf_metadata,
    "robots_meta": q_robots_meta,
    "charset_decode": q_charset_decode,
    "g711_decode": q_g711_decode,
    "video_frames": q_video_frames,
    "webp_decode": q_webp_decode,
    "exif_parse": q_exif_parse,
    "gif_frames": q_gif_frames,
    "webp_frames": q_webp_frames,
    "id3_tags": q_id3_tags,
    "audio_fingerprint": q_audio_fingerprint,
    "crossmodal_pairs": q_crossmodal_pairs,
    # -- new in round 6, session 5 --
    "zstd_decode": q_zstd_decode,
    "brotli_decode": q_brotli_decode,
    # -- new in round 6, session 6 --
    "vp8_decode": q_vp8_decode,
    "pdf_images": q_pdf_images,
    "wikitext_clean": q_wikitext_clean,
    "latex_clean": q_latex_clean,
    "notebook_cells": q_notebook_cells,
    "subtitle_cues": q_subtitle_cues,
    "epub_chapters": q_epub_chapters,
    "mbox_messages": q_mbox_messages,
    # ---- 50-entry window boundary (driver hashes up to here) ----
    # NINE family reps rotated below the boundary to make room for
    # the nine newest ops (g711/video/webp_decode/exif/gif_frames/
    # webp_frames/id3_tags/audio_fingerprint/crossmodal_pairs):
    # sample_by_hash, domain_quota, anchor_text, cdx_parse,
    # sitemap_parse, redact_pii, hll_cardinality, contamination,
    # text_repetition — all nine driver-signed in r1-r5; url_ops
    # (driver-signed r4+r5, family covered in-window by
    # url_canonicalize) rotated out in session 4 to keep the new
    # http_headers op in-window with a value oracle; text_stats
    # (driver-signed in four rounds, family covered in-window by
    # text_quality/text_gopher_quality) rotated out in session 5 to
    # keep the new zstd_decode op in-window with a value oracle;
    # text_tfidf_top_terms (driver-signed in prior rounds, retrieval
    # family covered by the r5-signed bm25_search/hybrid_search)
    # rotated out in session 5 for the new brotli_decode op;
    # extract_metadata, extract_links, extract_multi_tree,
    # extract_conditional and maincontent_strip (all driver-signed
    # r1-r5; extraction keeps flagship/grid/transform_chain
    # in-window) rotated out in session 6 for the new vp8_decode,
    # pdf_images, wikitext_clean, latex_clean and notebook_cells ops
    "extract_metadata": q_extract_metadata,
    "extract_links": q_extract_links,
    "extract_multi_tree": q_extract_multi_tree,
    "extract_conditional": q_extract_conditional,
    "maincontent_strip": q_maincontent_strip,
    # c6_separator (driver-signed r1-r5; the PROVISIONAL-convention
    # evidence lives in the differential pytest suite, not the
    # driver row) rotated out in session 6 for subtitle_cues;
    # corpus_percentiles and script_stats (both signed r4; stats
    # family covered in-window by text_quality/text_gopher_quality)
    # rotated out for epub_chapters and mbox_messages
    "c6_separator": q_c6_separator,
    "corpus_percentiles": q_corpus_percentiles,
    "script_stats": q_script_stats,
    "text_tfidf_top_terms": q_text_tfidf_top_terms,
    "text_stats": q_text_stats,
    "url_ops": q_url_ops,
    "sitemap_parse": q_sitemap_parse,
    "text_repetition": q_text_repetition,
    "contamination": q_contamination,
    "hll_cardinality": q_hll_cardinality,
    "redact_pii": q_redact_pii,
    "sample_by_hash": q_sample_by_hash,
    "cdx_parse": q_cdx_parse,
    "domain_quota": q_domain_quota,
    "anchor_text": q_anchor_text,
    "dsir_sample": q_dsir_sample,
    "pack_sequences": q_pack_sequences,
    "events_sessionize": q_events_sessionize,
    "cms_topterms": q_cms_topterms,
    "multimodal_features": q_multimodal_features,
    "simsearch_lsh": q_simsearch_lsh,
    # all remaining oracled queries: driver-signed in prior rounds
    # (r1-r5 CORRECTNESS files) and re-verified every round by
    # tools/check_oracles.py + pytest
    "substring_dedup": q_substring_dedup,
    "hybrid_search": q_hybrid_search,
    "embedding_outliers": q_embedding_outliers,
    "bigram_lm_score": q_bigram_lm_score,
    "fix_mojibake": q_fix_mojibake,
    "normalize_nfc": q_normalize_nfc,
    "split_sentences": q_split_sentences,
    "policy_filter": q_policy_filter,
    "decontaminate": q_decontaminate,
    "frontier_schedule": q_frontier_schedule,
    "ccnet_buckets": q_ccnet_buckets,
    "imgtext_pairs": q_imgtext_pairs,
    "phash_pairs": q_phash_pairs,
    "phash_image_decode": q_phash_image_decode,
    "clean_text": q_clean_text,
    "audio_decode": q_audio_decode,
    "media_probe": q_media_probe,
    "domain_quality": q_domain_quality,
    "chunk_documents": q_chunk_documents,
    "quality_classifier": q_quality_classifier,
    "mixture_sample": q_mixture_sample,
    "train_shards": q_train_shards,
    "corpus_profile": q_corpus_profile,
    "dedup_by_url": q_dedup_by_url,
    "pack_materialize": q_pack_materialize,
    "dedup_exact": q_dedup_exact,
    "dedup_clusters": q_dedup_clusters,
    "dedup_keep_canonical": q_dedup_keep_canonical,
    "dedup_semantic_keep": q_dedup_semantic_keep,
    "simsearch_topk": q_simsearch_topk,
    "bm25_search": q_bm25_search,
    "snapshot_diff": q_snapshot_diff,
    "readability": q_readability,
    "token_budget": q_token_budget,
    "incremental_extract": q_incremental_extract,
    "capture_history": q_capture_history,
    "pdf_extract": q_pdf_extract,
    "dedup_paragraphs": q_dedup_paragraphs,
    "winnow_fingerprints": q_winnow_fingerprints,
    "text_subword_count": q_text_subword_count,
    "text_top_ngrams": q_text_top_ngrams,
    "events_range_join": q_events_range_join,
    "pdf_pages": q_pdf_pages,
    "events_rollups": q_events_rollups,
    "events_windowed_counts": q_events_windowed_counts,
    "rel_agg": q_rel_agg,
    "rel_broadcast_join": q_rel_broadcast_join,
    # ---- rows-only (no oracle; pytest-verified vs exact baselines) --
    "dedup_minhash_lsh": q_dedup_minhash_lsh,
    "dedup_simhash": q_dedup_simhash,
    "dedup_simhash_pairs": q_dedup_simhash_pairs,
    "simsearch_ivf": q_simsearch_ivf,
    "i1_bucketing": q_i1_bucketing,
}


# Micro-queries whose coverage is fully subsumed by an in-window query
# (t1/t2/t5/t6+t4 chains ⊂ extract_transform_chain; a3 ⊂
# extract_conditional; n2 ⊂ extract_grid_explode; the exact
# embedding-cosine baseline is a validation reference for the LSH
# path). Kept verifiable: tests/test_demoted_oracles.py runs each one
# against its oracle at sf0.001 on every pytest run.
DEMOTED_QUERIES: dict[str, QueryFn] = {
    "t1_trim": q_t1_trim,
    "t2_replace": q_t2_replace,
    "t6_split_t4_pick": q_t6_split_t4_pick,
    "t5_join": q_t5_join,
    "a3_conditional": q_a3_conditional,
    "n2_grid_explode": q_n2_grid_explode,
    "dedup_embedding_cosine_exact": q_dedup_embedding_cosine_exact,
}

ORACLES: dict[str, str] = {
    "extract_flagship": SQL_EXTRACT_FLAGSHIP,
    "extract_grid_explode": SQL_EXTRACT_GRID_EXPLODE,
    "extract_transform_chain": SQL_EXTRACT_TRANSFORM_CHAIN,
    "extract_conditional": SQL_EXTRACT_CONDITIONAL,
    "extract_multi_tree": SQL_EXTRACT_MULTI_TREE,
    "c6_separator": SQL_C6_SEPARATOR,
    "n4_id_dedup": SQL_N4_ID_DEDUP,
    "dedup_exact": SQL_DEDUP_EXACT,
    "dedup_ngram_jaccard": SQL_DEDUP_NGRAM_JACCARD,
    "dedup_clusters": SQL_DEDUP_CLUSTERS,
    "dedup_keep_canonical": SQL_DEDUP_KEEP_CANONICAL,
    "dedup_paragraphs": SQL_DEDUP_PARAGRAPHS,
    "line_dedup": SQL_LINE_DEDUP,
    "sitemap_parse": SQL_SITEMAP_PARSE,
    "cdx_parse": SQL_CDX_PARSE,
    "anchor_text": SQL_ANCHOR_TEXT,
    "dedup_embedding_cosine": SQL_DEDUP_EMBEDDING_COSINE,
    "simsearch_topk": SQL_SIMSEARCH_TOPK,
    "simsearch_lsh": SQL_SIMSEARCH_LSH,
    "bm25_search": SQL_BM25_SEARCH,
    "split_sentences": SQL_SPLIT_SENTENCES,
    "normalize_nfc": SQL_NORMALIZE_NFC,
    "text_stats": SQL_TEXT_STATS,
    "text_subword_count": SQL_TEXT_SUBWORD_COUNT,
    "text_quality": SQL_TEXT_QUALITY,
    "text_top_ngrams": SQL_TEXT_TOP_NGRAMS,
    "text_gopher_quality": SQL_TEXT_GOPHER_QUALITY,
    "text_tfidf_top_terms": SQL_TEXT_TFIDF_TOP_TERMS,
    "multimodal_features": SQL_MULTIMODAL_FEATURES,
    "maincontent_strip": SQL_MAINCONTENT_STRIP,
    "pdf_pages": SQL_PDF_PAGES,
    "url_ops": SQL_URL_OPS,
    "events_sessionize": SQL_EVENTS_SESSIONIZE,
    "events_asof_join": SQL_EVENTS_ASOF_JOIN,
    "events_range_join": SQL_EVENTS_RANGE_JOIN,
    "events_rollups": SQL_EVENTS_ROLLUPS,
    "redact_pii": SQL_REDACT_PII,
    "events_windowed_counts": SQL_EVENTS_WINDOWED_COUNTS,
    "rel_agg": SQL_REL_AGG,
    "rel_broadcast_join": SQL_REL_BROADCAST_JOIN,
    "sample_by_hash": SQL_SAMPLE_BY_HASH,
    "domain_quota": SQL_DOMAIN_QUOTA,
    "winnow_fingerprints": SQL_WINNOW_FINGERPRINTS,
    "dedup_minhash_md5": SQL_DEDUP_MINHASH_MD5,
    "dedup_simhash_md5": SQL_DEDUP_SIMHASH_MD5,
    "text_repetition": SQL_TEXT_REPETITION,
    "extract_links": SQL_EXTRACT_LINKS,
    "robots_filter": SQL_ROBOTS_FILTER,
    "hash_split": SQL_HASH_SPLIT,
    "pack_sequences": SQL_PACK_SEQUENCES,
    "extract_markdown": SQL_EXTRACT_MARKDOWN,
    "extract_metadata": SQL_EXTRACT_METADATA,
    "contamination": SQL_CONTAMINATION,
    "substring_dedup": SQL_SUBSTRING_DEDUP,
    "hybrid_search": SQL_HYBRID_SEARCH,
    "embedding_outliers": SQL_EMBEDDING_OUTLIERS,
    "fix_mojibake": SQL_FIX_MOJIBAKE,
    "bigram_lm_score": SQL_BIGRAM_LM_SCORE,
    "policy_filter": SQL_POLICY_FILTER,
    "token_budget": SQL_TOKEN_BUDGET,
    "capture_history": SQL_CAPTURE_HISTORY,
    "pdf_extract": SQL_PDF_EXTRACT,
    "phash_image_decode": SQL_PHASH_IMAGE_DECODE,
    "jpeg_decode": SQL_JPEG_DECODE,
    "extract_tables": SQL_EXTRACT_TABLES,
    "feed_parse": SQL_FEED_PARSE,
    "http_headers": SQL_HTTP_HEADERS,
    "pdf_metadata": SQL_PDF_METADATA,
    "robots_meta": SQL_ROBOTS_META,
    "charset_decode": SQL_CHARSET_DECODE,
    "g711_decode": SQL_G711_DECODE,
    "zstd_decode": SQL_ZSTD_DECODE,
    "brotli_decode": SQL_BROTLI_DECODE,
    "vp8_decode": SQL_VP8_DECODE,
    "pdf_images": SQL_PDF_IMAGES,
    "wikitext_clean": SQL_WIKITEXT_CLEAN,
    "latex_clean": SQL_LATEX_CLEAN,
    "notebook_cells": SQL_NOTEBOOK_CELLS,
    "subtitle_cues": SQL_SUBTITLE_CUES,
    "epub_chapters": SQL_EPUB_CHAPTERS,
    "mbox_messages": SQL_MBOX_MESSAGES,
    "webp_decode": SQL_WEBP_DECODE,
    "exif_parse": SQL_EXIF_PARSE,
    "gif_frames": SQL_GIF_FRAMES,
    "webp_frames": SQL_WEBP_FRAMES,
    "id3_tags": SQL_ID3_TAGS,
    "audio_fingerprint": SQL_AUDIO_FINGERPRINT,
    "crossmodal_pairs": SQL_CROSSMODAL_PAIRS,
    "video_frames": SQL_VIDEO_FRAMES,
    "audio_decode": SQL_AUDIO_DECODE,
    "media_probe": SQL_MEDIA_PROBE,
    "incremental_extract": SQL_INCREMENTAL_EXTRACT,
    "readability": SQL_READABILITY,
    "snapshot_diff": SQL_SNAPSHOT_DIFF,
    "decontaminate": SQL_DECONTAMINATE,
    "corpus_percentiles": SQL_CORPUS_PERCENTILES,
    "url_canonicalize": SQL_URL_CANONICALIZE,
    "chunk_documents": SQL_CHUNK_DOCUMENTS,
    "mixture_sample": SQL_MIXTURE_SAMPLE,
    "train_shards": SQL_TRAIN_SHARDS,
    "quality_classifier": SQL_QUALITY_CLASSIFIER,
    "clean_text": SQL_CLEAN_TEXT,
    "dedup_semantic_keep": SQL_DEDUP_SEMANTIC_KEEP,
    "domain_quality": SQL_DOMAIN_QUALITY,
    "corpus_profile": SQL_CORPUS_PROFILE,
    "lm_score": SQL_LM_SCORE,
    "dedup_by_url": SQL_DEDUP_BY_URL,
    "pack_materialize": SQL_PACK_MATERIALIZE,
    "frontier_urls": SQL_FRONTIER_URLS,
    "cms_topterms": SQL_CMS_TOPTERMS,
    "hll_cardinality": SQL_HLL_CARDINALITY,
    "c4_clean": SQL_C4_CLEAN,
    "script_stats": SQL_SCRIPT_STATS,
    "dsir_sample": SQL_DSIR_SAMPLE,
    "bloom_frontier": SQL_BLOOM_FRONTIER,
    "link_pagerank": SQL_LINK_PAGERANK,
    "phash_pairs": SQL_PHASH_PAIRS,
    "i1_bucketing_md5": SQL_I1_BUCKETING_MD5,
    "frontier_schedule": SQL_FRONTIER_SCHEDULE,
    "ccnet_buckets": SQL_CCNET_BUCKETS,
    "imgtext_pairs": SQL_IMGTEXT_PAIRS,
    # rows-only (xxhash64-seeded — not DuckDB-expressible; each has a
    # pytest asserting equality/recall vs an exact baseline instead):
    # dedup_minhash_lsh, dedup_simhash, dedup_simhash_pairs, i1_bucketing
}

DEMOTED_ORACLES: dict[str, str] = {
    "t1_trim": SQL_T1_TRIM,
    "t2_replace": SQL_T2_REPLACE,
    "t6_split_t4_pick": SQL_T6_SPLIT_T4_PICK,
    "t5_join": SQL_T5_JOIN,
    "a3_conditional": SQL_A3_CONDITIONAL,
    "n2_grid_explode": SQL_N2_GRID_EXPLODE,
    "dedup_embedding_cosine_exact": SQL_DEDUP_EMBEDDING_COSINE_EXACT,
}

"""Production extraction pipeline: partitioning, lineage, resume.

Implements the engine-infra operators the north rule requires on top
of the reference's capabilities (SURVEY.md §2.8, BASELINE.json:14):

I1  Salted repartition by url-hash — deterministic
    ``pmod(xxhash64(url), B)`` buckets with ``B = partitions ×
    salt_factor`` so host-level skew can't pile onto one task, and no
    ``rand()`` so resume stays stable across runs.
I2  Per-partition lineage + metrics — one row per bucket with
    docs_in/ok/failed, bytes, parse time, engine version and the
    rules' sha256, written alongside the output.
I3  Checkpoint-based resume — a bucket is complete iff its metrics
    row is committed (metrics are written AFTER data, per bucket
    set); restart anti-joins committed buckets so finished partitions
    are NEVER recomputed. Idempotent via dynamic partition overwrite.
I4  Failure isolation — lives in the extractor (error column); the
    metrics here count it.

Scale design notes (100 TB / 10^12 docs):
- The job is one wide stage: scan → exchange → Python runner → write.
  No joins or aggregations touch the html blobs; the only shuffle
  moves (url, html) once, hash-distributed by bucket.
- The resume anti-join's right side is the metrics table (≤ one row
  per bucket — thousands, not billions) and is explicitly
  ``broadcast()``: no shuffle of the 100 TB side for resume.
- Metrics aggregate from the extractor's per-doc parse_ns/bytes_in
  columns AFTER re-reading the committed output (columnar, light
  columns only) — so a metrics row can never exist for data that
  didn't commit, and nothing ever ``collect()``s through the driver.
"""

from __future__ import annotations

import hashlib
import json
import time
import uuid

from pyspark.sql import DataFrame, SparkSession, functions as F

from goose_parser_spark.extractor import extract
from goose_parser_spark.rules.compiler import CompiledRules, RuleCompiler


def rules_sha256(spec: dict) -> str:
    return hashlib.sha256(
        json.dumps(spec, ensure_ascii=False, sort_keys=True).encode("utf-8")
    ).hexdigest()


def with_bucket(df: DataFrame, buckets: int, url_col: str = "url",
                hash_mode: str = "xxhash64") -> DataFrame:
    """Deterministic url-hash bucket column (I1/I3). xxhash64 is a
    JVM-side codegen'd expression — no Python involved.
    ``hash_mode='md5'`` derives the bucket from the first 15 hex chars
    of md5 as a 60-bit integer — byte-reproducible in DuckDB, so the
    bucketing CONTRACT (stable, uniform assignment) sits under a hard
    value oracle; xxhash64 stays the production default."""
    if hash_mode == "md5":
        h = F.conv(F.substring(F.md5(F.col(url_col)), 1, 15), 16, 10) \
            .cast("long")
    elif hash_mode == "xxhash64":
        h = F.xxhash64(F.col(url_col))
    else:
        raise ValueError(f"unknown hash_mode: {hash_mode!r}")
    return df.withColumn(
        "bucket", F.pmod(h, F.lit(buckets)).cast("int")
    )


def salted_repartition(
    df: DataFrame,
    num_partitions: int,
    salt_factor: int = 4,
    url_col: str = "url",
) -> DataFrame:
    """I1: repartition on ``pmod(xxhash64(url), P × salt_factor)``.

    url-hash (not host) already decorrelates host-level skew; the salt
    factor over-decomposes so AQE / the scheduler can re-balance
    residual heavy buckets. Deterministic — no ``rand()`` — so the
    partition a url lands in is stable across retries and resume.
    """
    b = num_partitions * salt_factor
    return df.repartition(
        num_partitions, F.pmod(F.xxhash64(F.col(url_col)), F.lit(b))
    )


class ExtractJob:
    """End-to-end extraction run over a pages table.

    Layout under ``output_dir``::

        data/bucket=K/*.parquet      extracted rows for bucket K
        metrics/*.parquet            one lineage row per completed bucket

    Resume protocol (I3): metrics are written only after the data write
    for a run commits, so ``bucket ∈ metrics ⇒ bucket data complete``.
    A restart filters input to buckets without metrics rows and
    re-writes only those (dynamic partition overwrite → idempotent).
    """

    def __init__(
        self,
        spark: SparkSession,
        rules: dict,
        output_dir: str,
        buckets: int = 256,
        fmt: str = "parquet",
        url_col: str = "url",
        html_col: str = "html",
    ) -> None:
        self.spark = spark
        self.rules_spec = rules
        self.compiled: CompiledRules = RuleCompiler().compile(rules)
        self.output_dir = output_dir.rstrip("/")
        self.buckets = buckets
        self.fmt = fmt
        self.url_col = url_col
        self.html_col = html_col
        self.data_dir = f"{self.output_dir}/data"
        self.metrics_dir = f"{self.output_dir}/metrics"

    # -- resume state ----------------------------------------------------------

    def committed_buckets(self) -> DataFrame | None:
        """Buckets with a committed metrics row (None if first run)."""
        try:
            return (self.spark.read.format(self.fmt).load(self.metrics_dir)
                    .select("bucket").distinct())
        except Exception:  # AnalysisException: path does not exist
            return None

    def _validate_resume_config(self) -> None:
        """Fail fast when this job's config disagrees with the one the
        committed metrics were written under (ADVICE r01, medium).

        Bucket membership is ``pmod(xxhash64(url), buckets)``: resuming
        with a different ``buckets`` (or a different url column) reuses
        committed bucket ids whose MEMBERSHIP changed — the anti-join
        would silently skip never-extracted documents and re-extract
        others. Same for a changed rule tree: committed buckets would
        hold a different output schema/content than new ones. All three
        are corruption-with-no-error, so they are hard errors here.
        """
        try:
            m = self.spark.read.format(self.fmt).load(self.metrics_dir)
        except Exception:
            return
        if "buckets" not in m.columns:  # metrics written pre-upgrade
            return
        # ADVICE r02: a metrics dir can mix pre-upgrade rows (config
        # columns NULL under schema evolution) with new rows — .head()
        # made validation depend on which row Spark sampled. Check ALL
        # distinct non-null config tuples instead: deterministic, and a
        # dir written under two different configs is itself an error.
        rows = (m.select("buckets", "url_col", "rules_sha256")
                .where(F.col("buckets").isNotNull()
                       & F.col("url_col").isNotNull()
                       & F.col("rules_sha256").isNotNull())
                .distinct().collect())  # ≤ #configs rows, never per-doc
        if not rows:
            return
        if len(rows) > 1:
            raise ValueError(
                f"resume config mismatch: metrics at {self.metrics_dir} "
                f"carry {len(rows)} distinct (buckets, url_col, "
                "rules_sha256) configs — the output dir mixes runs with "
                "incompatible bucket membership. Use a fresh output_dir.")
        row = rows[0]
        if row["buckets"] != self.buckets:
            raise ValueError(
                f"resume config mismatch: output at {self.metrics_dir} was "
                f"written with buckets={row['buckets']}, this job has "
                f"buckets={self.buckets}; bucket membership differs — "
                "resume would skip/redo the wrong documents. Use the "
                "original bucket count or a fresh output_dir.")
        if row["url_col"] != self.url_col:
            raise ValueError(
                f"resume config mismatch: url_col was {row['url_col']!r}, "
                f"this job uses {self.url_col!r}; bucket membership "
                "differs. Use the original url column or a fresh "
                "output_dir.")
        if row["rules_sha256"] != rules_sha256(self.rules_spec):
            raise ValueError(
                "resume config mismatch: the rule tree changed since the "
                "committed run (rules_sha256 differs); committed buckets "
                "would hold different outputs than resumed ones. Re-run "
                "into a fresh output_dir (or resume with the original "
                "rules).")

    # -- the run -----------------------------------------------------------------

    def run(self, pages: DataFrame, resume: bool = True,
            salt_shuffle: bool = True) -> dict:
        """Execute (or resume) the extraction. Returns a small summary
        dict (driver-side scalars only — never row data).

        ``salt_shuffle=True`` (default, I1) repartitions on the url-hash
        bucket BEFORE extraction: crawl inputs are typically laid out
        by host/WARC order, so scan splits are host-correlated — the
        one shuffle decorrelates that skew AND lands each bucket wholly
        in one task, so the partitioned write produces one file set per
        bucket instead of tasks×buckets fragments. Disable only for
        inputs already bucketed by url-hash (e.g. the Iceberg spec from
        tools/iceberg_ddl.py), where the shuffle would be pure cost.
        """
        run_id = uuid.uuid4().hex
        t0 = time.time()

        bucketed = with_bucket(
            pages.select(self.url_col, self.html_col), self.buckets, self.url_col
        )

        skipped = 0
        if resume:
            self._validate_resume_config()
            committed = self.committed_buckets()
            if committed is not None:
                skipped = committed.count()
                # broadcast anti-join: metrics side is ≤ `buckets` rows;
                # the 100 TB side never shuffles for resume (I3).
                bucketed = bucketed.join(
                    F.broadcast(committed), on="bucket", how="left_anti"
                )

        if salt_shuffle:
            parallelism = self.spark.sparkContext.defaultParallelism
            num_parts = min(self.buckets, max(32, parallelism * 2))
            bucketed = bucketed.repartition(num_parts, F.col("bucket"))

        extracted = extract(
            bucketed,
            self.compiled,
            html_col=self.html_col,
            url_col=self.url_col,
            keep_cols=("bucket",),
        )

        # data write: partitioned by bucket, dynamic overwrite so a
        # re-run of an uncommitted bucket replaces its partial files
        (extracted.write.format(self.fmt)
            .mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("bucket")
            .save(self.data_dir))

        # metrics AFTER data, derived from the committed output files —
        # re-read only the light columns (columnar scan skips html/
        # extracted entirely), aggregate per bucket, append.
        out = self.spark.read.format(self.fmt).load(self.data_dir)
        committed_now = self.committed_buckets()
        todo_metrics = out.select("bucket", "error", "parse_ns", "bytes_in")
        if committed_now is not None:
            todo_metrics = todo_metrics.join(
                F.broadcast(committed_now), on="bucket", how="left_anti"
            )
        metrics = (todo_metrics
            .groupBy("bucket")
            .agg(
                F.count("*").alias("docs_in"),
                F.count(F.when(F.col("error").isNull(), 1)).alias("docs_ok"),
                F.count(F.when(F.col("error").isNotNull(), 1)).alias("docs_failed"),
                F.sum("parse_ns").alias("parse_ns"),
                F.sum("bytes_in").alias("bytes_in"),
            )
            .withColumn("run_id", F.lit(run_id))
            .withColumn("engine_version", F.lit(_engine_version()))
            .withColumn("rules_sha256", F.lit(rules_sha256(self.rules_spec)))
            # job config in every lineage row so a restart can detect a
            # config change and refuse to mix incompatible bucket ids
            .withColumn("buckets", F.lit(self.buckets))
            .withColumn("url_col", F.lit(self.url_col))
            .withColumn("completed_at", F.current_timestamp()))
        metrics.write.format(self.fmt).mode("append").save(self.metrics_dir)

        return {
            "run_id": run_id,
            "buckets_total": self.buckets,
            "buckets_skipped_by_resume": skipped,
            "wall_seconds": time.time() - t0,
        }


def _engine_version() -> str:
    import goose_parser_spark
    return goose_parser_spark.__version__


def quarantine_failures(spark: SparkSession, data_dir: str, dest: str,
                        fmt: str = "parquet") -> int:
    """S5 snapshot-action analog (SURVEY.md §2.1): copy failed rows
    (url, bucket, error) from the output to a quarantine table for
    debugging. Columnar scan reads only the light columns. Returns the
    number of quarantined rows (a count, not collected data)."""
    out = spark.read.format(fmt).load(data_dir)
    bad = out.where(F.col("error").isNotNull()) \
             .select("url", "bucket", "error")
    bad.write.format(fmt).mode("overwrite").save(dest)
    return spark.read.format(fmt).load(dest).count()


def export_json_lines(df: DataFrame, path: str, url_col: str = "url") -> None:
    """S4 result emission analog: one JSON object per line, exactly the
    shape the reference's ``parse()`` resolves with, keyed by url —
    ``to_json`` runs JVM-side."""
    (df.select(F.to_json(F.struct(F.col(url_col),
                                  F.col("extracted"))).alias("value"))
       .write.mode("overwrite").text(path))

"""Infra tests: salted repartition (I1), metrics/lineage (I2),
checkpoint resume (I3) — SURVEY.md §2.8, BASELINE.json:14."""

import glob
import os

import pytest
from pyspark.sql import functions as F

from goose_parser_spark.plans.pipeline import (
    ExtractJob,
    rules_sha256,
    salted_repartition,
    with_bucket,
)
from goose_parser_spark.sources.fixtures import FAMILIES, pages_rows, pages_schema

RULES = FAMILIES["f01"].rules
N = 200


@pytest.fixture(scope="module")
def pages_df(spark):
    return spark.createDataFrame(pages_rows(N), schema=pages_schema()).cache()


def test_bucket_is_deterministic_jvm_side(spark, pages_df):
    a = with_bucket(pages_df, 64).select("url", "bucket").collect()
    b = with_bucket(pages_df, 64).select("url", "bucket").collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
    assert all(0 <= r["bucket"] < 64 for r in a)
    # no Python eval in the bucketing expression
    plan = with_bucket(pages_df, 64)._jdf.queryExecution().executedPlan().toString()
    assert "xxhash64" in plan.lower()
    assert "pythonudf" not in plan.lower().replace(" ", "")


def test_salted_repartition_spreads_skewed_hosts(spark, pages_df):
    """20% of fixture urls share one host; url-hash bucketing must
    still spread rows near-uniformly across partitions."""
    reparted = salted_repartition(pages_df, 8, salt_factor=4)
    sizes = (reparted.withColumn("pid", F.spark_partition_id())
             .groupBy("pid").count().collect())
    counts = [r["count"] for r in sizes]
    assert len(counts) == 8
    assert max(counts) <= 3 * (N // 8), counts  # no pathological pile-up


def test_job_writes_data_and_metrics(spark, pages_df, tmp_path):
    out = str(tmp_path / "out")
    job = ExtractJob(spark, RULES, out, buckets=16)
    summary = job.run(pages_df, resume=True)
    assert summary["buckets_skipped_by_resume"] == 0

    data = spark.read.parquet(f"{out}/data")
    assert data.count() == N
    assert "bucket" in data.columns

    metrics = spark.read.parquet(f"{out}/metrics")
    mrows = metrics.collect()
    assert sum(r["docs_in"] for r in mrows) == N
    assert all(r["docs_failed"] == 0 for r in mrows)
    assert all(r["rules_sha256"] == rules_sha256(RULES) for r in mrows)
    assert all(r["bytes_in"] > 0 for r in mrows)
    # one metrics row per bucket present in the data
    assert ({r["bucket"] for r in mrows}
            == {r["bucket"] for r in data.select("bucket").distinct().collect()})


def test_resume_skips_all_committed_buckets(spark, pages_df, tmp_path):
    out = str(tmp_path / "out")
    job = ExtractJob(spark, RULES, out, buckets=16)
    job.run(pages_df, resume=True)
    files_before = sorted(glob.glob(f"{out}/data/**/*.parquet", recursive=True))
    mtimes = {f: os.path.getmtime(f) for f in files_before}

    summary2 = job.run(pages_df, resume=True)
    # every committed bucket skipped; zero recomputation (BASELINE.md)
    n_buckets = (spark.read.parquet(f"{out}/metrics")
                 .select("bucket").distinct().count())
    assert summary2["buckets_skipped_by_resume"] == n_buckets

    files_after = sorted(glob.glob(f"{out}/data/**/*.parquet", recursive=True))
    assert files_before == files_after
    assert all(os.path.getmtime(f) == mtimes[f] for f in files_after)
    # metrics unchanged: no duplicate rows appended
    metrics = spark.read.parquet(f"{out}/metrics")
    assert metrics.count() == n_buckets


def test_resume_completes_partial_run(spark, pages_df, tmp_path):
    """Kill-and-restart: first run covers half the buckets (as if the
    job died mid-way), restart must compute ONLY the missing ones."""
    out = str(tmp_path / "out")
    job = ExtractJob(spark, RULES, out, buckets=16)

    bucketed = with_bucket(pages_df, 16)
    first_half = bucketed.filter(F.col("bucket") < 8).drop("bucket")
    job.run(first_half, resume=True)
    m1 = spark.read.parquet(f"{out}/metrics")
    committed1 = {r["bucket"] for r in m1.select("bucket").distinct().collect()}
    assert committed1 and all(b < 8 for b in committed1)
    run1_ids = {r["run_id"] for r in m1.collect()}

    summary = job.run(pages_df, resume=True)
    assert summary["buckets_skipped_by_resume"] == len(committed1)

    # all rows present exactly once
    data = spark.read.parquet(f"{out}/data")
    assert data.count() == N
    assert data.select("url").distinct().count() == N

    # second run's metrics rows cover only the previously-missing buckets
    m2 = spark.read.parquet(f"{out}/metrics")
    new_rows = [r for r in m2.collect() if r["run_id"] not in run1_ids]
    assert new_rows and all(r["bucket"] not in committed1 for r in new_rows)
    assert m2.count() == m2.select("bucket").distinct().count()


def test_no_resume_recomputes_everything(spark, pages_df, tmp_path):
    out = str(tmp_path / "out")
    job = ExtractJob(spark, RULES, out, buckets=8)
    job.run(pages_df, resume=True)
    summary = job.run(pages_df, resume=False)
    assert summary["buckets_skipped_by_resume"] == 0
    data = spark.read.parquet(f"{out}/data")
    assert data.count() == N  # dynamic overwrite → still exactly one copy


def test_salt_shuffle_consolidates_bucket_files(spark, pages_df, tmp_path):
    """With the I1 shuffle, each bucket's data lands in one task →
    one file set per bucket (not tasks × buckets fragments)."""
    out = str(tmp_path / "out")
    job = ExtractJob(spark, RULES, out, buckets=8)
    job.run(pages_df.repartition(16), resume=False)  # skewed-ish input layout
    for b in (spark.read.parquet(f"{out}/data")
              .select("bucket").distinct().collect()):
        files = glob.glob(f"{out}/data/bucket={b['bucket']}/*.parquet")
        assert len(files) == 1, (b["bucket"], files)


def test_salt_shuffle_off_still_correct(spark, pages_df, tmp_path):
    out = str(tmp_path / "out")
    job = ExtractJob(spark, RULES, out, buckets=8)
    job.run(pages_df, resume=False, salt_shuffle=False)
    assert spark.read.parquet(f"{out}/data").count() == N


def test_resume_rejects_changed_bucket_count(spark, pages_df, tmp_path):
    """ADVICE r01 (medium): restarting with a different `buckets` value
    changes bucket MEMBERSHIP — the resume anti-join would silently
    skip never-extracted documents. Must fail fast instead."""
    import pytest
    out = str(tmp_path / "out")
    ExtractJob(spark, RULES, out, buckets=8).run(pages_df, resume=True)
    job2 = ExtractJob(spark, RULES, out, buckets=16)
    with pytest.raises(ValueError, match="buckets=8"):
        job2.run(pages_df, resume=True)


def test_resume_rejects_changed_url_col_and_rules(spark, pages_df, tmp_path):
    import pytest
    out = str(tmp_path / "out")
    ExtractJob(spark, RULES, out, buckets=8).run(pages_df, resume=True)
    # changed url column
    renamed = pages_df.withColumnRenamed("url", "link")
    job_u = ExtractJob(spark, RULES, out, buckets=8, url_col="link")
    with pytest.raises(ValueError, match="url_col"):
        job_u.run(renamed, resume=True)
    # changed rule tree
    other_rules = {"name": "t", "scope": "title"}
    job_r = ExtractJob(spark, other_rules, out, buckets=8)
    with pytest.raises(ValueError, match="rules_sha256"):
        job_r.run(pages_df, resume=True)
    # unchanged config still resumes cleanly
    summary = ExtractJob(spark, RULES, out, buckets=8).run(pages_df,
                                                           resume=True)
    assert summary["buckets_skipped_by_resume"] > 0

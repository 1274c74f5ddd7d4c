"""jobs/media.py — the media-pipeline CLI: op dispatch, probe
filters, and the spark-submit deployment path."""

import json
import struct
import subprocess

import pytest


def _payload_table(spark, tmp_path):
    from tests.test_jpeg import _pattern, encode_jpeg_gray
    img = encode_jpeg_gray(16, 16, _pattern(16, 16), [1] * 64)
    frame = bytes([0xFF, 0xFB, 0x90, 0x00]) + b"\x00" * 15996
    rows = [(1, bytearray(img)), (2, bytearray(frame)),
            (3, bytearray(b"garbage"))]
    path = str(tmp_path / "media.parquet")
    spark.createDataFrame(rows, "doc_id long, payload binary") \
        .write.mode("overwrite").parquet(path)
    return path


def test_run_op_probe_with_filters(spark, tmp_path):
    import jobs.media as mj
    path = _payload_table(spark, tmp_path)
    df = spark.read.parquet(path)
    args = mj.parse_args(["--op", "probe", "--input", path,
                          "--output", "x"])
    out = {r["doc_id"]: r for r in mj.run_op(df, args).collect()}
    assert out[1]["format"] == "jpeg" and out[1]["width"] == 16
    assert out[2]["format"] == "mp3" and out[2]["duration_ms"] == 1000
    assert out[3]["format"] is None
    # min-width gate drops the probe-NULL and small rows declaratively
    args2 = mj.parse_args(["--op", "probe", "--input", path,
                           "--output", "x", "--min-width", "10"])
    kept = [r["doc_id"] for r in mj.run_op(df, args2).collect()]
    assert kept == [1]
    # duration cap keeps only rows at/below the limit
    args3 = mj.parse_args(["--op", "probe", "--input", path,
                           "--output", "x", "--max-duration-ms", "1000"])
    kept3 = [r["doc_id"] for r in mj.run_op(df, args3).collect()]
    assert kept3 == [2]


def test_run_op_phash_and_exif_dispatch(spark, tmp_path):
    import jobs.media as mj
    from tests.test_exif import build_exif
    path = str(tmp_path / "m2.parquet")
    spark.createDataFrame(
        [(7, bytearray(build_exif(orientation=3, gps=True)))],
        "doc_id long, payload binary").write.parquet(path)
    df = spark.read.parquet(path)
    args = mj.parse_args(["--op", "exif", "--input", path,
                          "--output", "x"])
    r = mj.run_op(df, args).collect()[0]
    assert r["orientation"] == 3 and r["has_gps"] is True
    args_p = mj.parse_args(["--op", "phash", "--input", path,
                            "--output", "x"])
    r2 = mj.run_op(df, args_p).collect()[0]
    # build_exif emits APP1 only (no SOF/scan): the decode fails and
    # the NULL hash is the correct per-document poison behavior
    assert r2["phash"] is None


@pytest.mark.slow
def test_spark_submit_media_cli(tmp_path):
    """jobs/media.py end-to-end via spark-submit --py-files."""
    import shutil
    spark_submit = shutil.which("spark-submit")
    if spark_submit is None:
        pytest.skip("spark-submit not on PATH")
    from pyspark.sql import SparkSession

    from goose_parser_spark.deploy import build_package_zip
    spark = (SparkSession.builder.master("local[2]")
             .config("spark.ui.enabled", "false").getOrCreate())
    frame = bytes([0xFF, 0xFB, 0x90, 0x00]) + b"\x00" * 15996
    path = str(tmp_path / "in.parquet")
    spark.createDataFrame([(1, bytearray(frame))],
                          "doc_id long, payload binary") \
        .write.parquet(path)
    out_dir = str(tmp_path / "out")
    zip_path = build_package_zip(str(tmp_path))
    proc = subprocess.run(
        [spark_submit, "--master", "local[2]", "--py-files", zip_path,
         "jobs/media.py", "--op", "probe", "--input", path,
         "--output", out_dir],
        capture_output=True, text=True, timeout=300, cwd="/root/repo")
    assert proc.returncode == 0, proc.stderr[-2000:]
    got = spark.read.parquet(out_dir).collect()
    assert len(got) == 1 and got[0]["format"] == "mp3"

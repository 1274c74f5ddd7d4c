"""S4/S5/P3 analogs: JSON-lines export, quarantine sink, grid caps,
and the spark-submit CLI entrypoint."""

import json
import subprocess
import sys

import pytest

from goose_parser_spark.extractor import extract
from goose_parser_spark.plans.pipeline import (
    ExtractJob,
    export_json_lines,
    quarantine_failures,
)
from goose_parser_spark.rules.compiler import RuleCompiler, RuleError
from goose_parser_spark.rules.evaluator import evaluate_document
from goose_parser_spark.sources.fixtures import pages_rows, pages_schema


def test_max_results_count_caps_grid():
    html = "<ul>" + "".join(f'<li class="r"><b class="n">x{i}</b></li>'
                            for i in range(10)) + "</ul>"
    rules = {"scope": "li.r", "maxResultsCount": 3,
             "collection": [[{"name": "n", "scope": "b.n"}]]}
    out = evaluate_document(RuleCompiler().compile(rules), html)
    assert out == [{"n": "x0"}, {"n": "x1"}, {"n": "x2"}]


def test_max_results_count_validation():
    with pytest.raises(RuleError):
        RuleCompiler().compile({"scope": "p", "maxResultsCount": -1,
                                "collection": [[{"name": "x", "scope": "b"}]]})


def test_export_json_lines(spark, tmp_path):
    df = spark.createDataFrame(pages_rows(10), schema=pages_schema())
    out = extract(df.filter("url like '%/f01/%'"),
                  {"name": "title", "scope": "h1.title"})
    dest = str(tmp_path / "jsonl")
    export_json_lines(out, dest)
    lines = [json.loads(ln) for ln in
             spark.read.text(dest).toPandas()["value"]]
    assert lines and all("url" in d and "extracted" in d for d in lines)
    assert all(d["extracted"]["title"].startswith("Hello, Goose") for d in lines)


def test_quarantine_failures(spark, tmp_path):
    rows = pages_rows(20)
    for i in (3, 7):
        rows[i]["html"] = None
    schema = pages_schema()
    schema["html"].nullable = True
    df = spark.createDataFrame(rows, schema=schema)
    out_dir = str(tmp_path / "out")
    job = ExtractJob(spark, {"name": "t", "scope": "h1.title"}, out_dir,
                     buckets=4)
    job.run(df, resume=True)
    n = quarantine_failures(spark, f"{out_dir}/data",
                            str(tmp_path / "quarantine"))
    assert n == 2
    q = spark.read.parquet(str(tmp_path / "quarantine")).collect()
    assert all(r["error"] is not None for r in q)


@pytest.mark.slow
def test_spark_submit_cli(tmp_path):
    """jobs/extract.py end-to-end via spark-submit --py-files
    (BASELINE.json:14 deployment mode)."""
    import shutil
    spark_submit = shutil.which("spark-submit")
    if spark_submit is None:
        pytest.skip("spark-submit not on PATH")

    from goose_parser_spark.deploy import build_package_zip
    from goose_parser_spark.sources.fixtures import write_pages_parquet

    pages = str(tmp_path / "pages.parquet")
    write_pages_parquet(pages, 30)
    rules_file = tmp_path / "rules.json"
    rules_file.write_text(json.dumps({"name": "title", "scope": "h1.title"}))
    out_dir = str(tmp_path / "out")
    zip_path = build_package_zip(str(tmp_path))

    proc = subprocess.run(
        [spark_submit, "--master", "local[4]", "--py-files", zip_path,
         "jobs/extract.py", "--rules", str(rules_file), "--input", pages,
         "--output", out_dir, "--buckets", "4"],
        capture_output=True, text=True, timeout=300,
        cwd="/root/repo",
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    summary = json.loads(proc.stdout.strip().splitlines()[-1])
    assert summary["buckets_skipped_by_resume"] == 0
    import pyarrow.parquet as pq
    import glob
    files = glob.glob(f"{out_dir}/data/**/*.parquet", recursive=True)
    total = sum(pq.read_metadata(f).num_rows for f in files)
    assert total == 30


@pytest.mark.slow
def test_spark_submit_cli_warc_input(tmp_path):
    """jobs/extract.py with --input-format warc: the Common-Crawl
    ingestion path through the CLI end-to-end."""
    import shutil
    spark_submit = shutil.which("spark-submit")
    if spark_submit is None:
        pytest.skip("spark-submit not on PATH")

    from goose_parser_spark.deploy import build_package_zip
    from goose_parser_spark.sources.warc import write_warc_bytes

    warc_dir = tmp_path / "warcs"
    warc_dir.mkdir()
    recs = [{"url": f"https://cc.test/{i}",
             "warc_ts": f"2025-02-01T00:00:{i:02d}Z",
             "payload": (f'<html><body><h1 class="title">W {i}</h1>'
                         f"</body></html>").encode()} for i in range(6)]
    (warc_dir / "seg0.warc.gz").write_bytes(write_warc_bytes(recs[:4]))
    (warc_dir / "seg1.warc.gz").write_bytes(write_warc_bytes(recs[4:]))

    rules_file = tmp_path / "rules.json"
    rules_file.write_text(json.dumps({"name": "title", "scope": "h1.title"}))
    out_dir = str(tmp_path / "out")
    zip_path = build_package_zip(str(tmp_path))

    proc = subprocess.run(
        [spark_submit, "--master", "local[4]", "--py-files", zip_path,
         "jobs/extract.py", "--rules", str(rules_file),
         "--input", str(warc_dir), "--input-format", "warc",
         "--output", out_dir, "--buckets", "4"],
        capture_output=True, text=True, timeout=300,
        cwd="/root/repo",
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    import glob
    import pyarrow.parquet as pq
    files = glob.glob(f"{out_dir}/data/**/*.parquet", recursive=True)
    tbl = pq.read_table(files[0])
    total = sum(pq.read_metadata(f).num_rows for f in files)
    assert total == 6
    assert "extracted" in tbl.schema.names


@pytest.mark.slow
def test_spark_submit_curate_cli(tmp_path):
    """jobs/curate.py end-to-end via spark-submit: clean + quality
    filter + exact dedup + near-dedup + split + shards, partitioned
    output, summary JSON."""
    import glob
    import shutil
    spark_submit = shutil.which("spark-submit")
    if spark_submit is None:
        pytest.skip("spark-submit not on PATH")

    import pyarrow as pa
    import pyarrow.parquet as pq
    from goose_parser_spark.deploy import build_package_zip

    filler = ("the quick brown fox jumps over the lazy dog near the "
              "river bank while herons watch from tall reeds ")
    rows = []
    for i in range(40):
        rows.append({"doc_id": i, "source": f"src{i % 2}",
                     "text": filler + f"unique tail token{i}"})
    rows.append({"doc_id": 100, "source": "src0",
                 "text": filler + "unique tail token0"})  # exact dup of 0
    rows.append({"doc_id": 101, "source": "src0",
                 "text": "@@@@@@@@@@@@@@@ ###############"})  # low quality
    table = pa.Table.from_pylist(rows)
    docs = str(tmp_path / "documents.parquet")
    pq.write_table(table, docs)

    out_dir = str(tmp_path / "curated")
    zip_path = build_package_zip(str(tmp_path))
    proc = subprocess.run(
        [spark_submit, "--master", "local[4]", "--py-files", zip_path,
         "jobs/curate.py", "--input", docs, "--output", out_dir,
         "--clean", "--min-quality", "0.2",
         "--split", "train=0.9,val=0.1", "--shards", "2"],
        capture_output=True, text=True, timeout=300, cwd="/root/repo",
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    summary = json.loads(proc.stdout.strip().splitlines()[-1])
    assert summary["rows_in"] == 42
    # doc 100 (exact dup) and doc 101 (low quality) are gone
    assert summary["rows_out"] == 40
    assert set(summary["splits"]) <= {"train", "val"}
    assert sum(summary["splits"].values()) == 40
    parts = glob.glob(f"{out_dir}/split=*/shard=*/")
    assert parts, "expected split/shard partition directories"


@pytest.mark.slow
def test_spark_submit_curate_cli_near_dedup_mixture(tmp_path):
    """jobs/curate.py with the remaining stages: near-dedup collapses
    planted near-dup families to one canonical doc; mixture rates keep
    srcA fully and drop srcB; PII is redacted in the output text."""
    import glob
    import shutil
    spark_submit = shutil.which("spark-submit")
    if spark_submit is None:
        pytest.skip("spark-submit not on PATH")

    import pyarrow as pa
    import pyarrow.parquet as pq
    from goose_parser_spark.deploy import build_package_zip

    filler = ("granite cliffs rise over the valley floor where pine "
              "forests meet alpine meadows full of summer flowers ")
    rows = []
    for i in range(20):
        tail = " ".join(f"u{i}t{k}" for k in range(30))  # unique per doc:
        rows.append({"doc_id": i, "source": "srcA",      # keeps Jaccard
                     "text": f"{filler}{tail} mail{i}@ex.com"})  # vs peers low
    # near-dup family of doc 0 (prefix tokens, same body)
    rows.append({"doc_id": 50, "source": "srcA",
                 "text": "xq zq " + rows[0]["text"]})
    rows.append({"doc_id": 60, "source": "srcB",
                 "text": filler + "srcB only content entirely dropped"})
    pq.write_table(pa.Table.from_pylist(rows),
                   str(tmp_path / "documents.parquet"))

    out_dir = str(tmp_path / "curated")
    zip_path = build_package_zip(str(tmp_path))
    proc = subprocess.run(
        [spark_submit, "--master", "local[4]", "--py-files", zip_path,
         "jobs/curate.py", "--input", str(tmp_path / "documents.parquet"),
         "--output", out_dir, "--redact-pii", "--near-dedup",
         "--mixture", "srcA=1.0,srcB=0.0"],
        capture_output=True, text=True, timeout=300, cwd="/root/repo",
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    summary = json.loads(proc.stdout.strip().splitlines()[-1])
    assert summary["rows_in"] == 22
    assert summary["rows_out"] == 20      # 60 dropped by mixture, 50 by near-dedup
    import duckdb
    got = duckdb.sql(
        f"select doc_id, text from read_parquet('{out_dir}/*.parquet') "
        "order by doc_id").fetchall()
    ids = [r[0] for r in got]
    assert 50 not in ids and 60 not in ids and 0 in ids
    assert all("@" not in t for _, t in got)        # PII redacted
    assert any("<EMAIL>" in t for _, t in got)


def test_spark_submit_curate_cli_c4_clean(tmp_path):
    """jobs/curate.py --c4-clean: C4 line rules rewrite text (short /
    punctuation-less / duplicate lines drop) and docs left with no
    surviving line are removed."""
    import glob
    import shutil
    spark_submit = shutil.which("spark-submit")
    if spark_submit is None:
        pytest.skip("spark-submit not on PATH")

    import pyarrow as pa
    import pyarrow.parquet as pq
    from goose_parser_spark.deploy import build_package_zip

    good = ("This line survives the cleanup pass.\n"
            "short one\n"
            "This line survives the cleanup pass.\n"
            "Another proper sentence stays too!")
    rows = [
        {"doc_id": 0, "source": "srcA", "text": good},
        {"doc_id": 1, "source": "srcA", "text": "no punct no luck"},
        {"doc_id": 2, "source": "srcA", "text": "ok.\nalso ok."},  # <3 words
    ]
    pq.write_table(pa.Table.from_pylist(rows),
                   str(tmp_path / "documents.parquet"))
    out_dir = str(tmp_path / "curated")
    zip_path = build_package_zip(str(tmp_path))
    proc = subprocess.run(
        [spark_submit, "--master", "local[4]", "--py-files", zip_path,
         "jobs/curate.py", "--input", str(tmp_path / "documents.parquet"),
         "--output", out_dir, "--c4-clean"],
        capture_output=True, text=True, timeout=300, cwd="/root/repo",
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    summary = json.loads(proc.stdout.strip().splitlines()[-1])
    assert summary["rows_in"] == 3
    assert summary["rows_out"] == 1
    import duckdb
    got = duckdb.sql(
        f"select doc_id, text from read_parquet('{out_dir}/*.parquet')"
    ).fetchall()
    assert got == [(0, "This line survives the cleanup pass.\n"
                       "Another proper sentence stays too!")]


def test_spark_submit_curate_cli_token_budget(tmp_path):
    """jobs/curate.py --token-budget: after dedup the corpus is cut to
    the best docs whose cumulative token count fits the budget."""
    import shutil
    spark_submit = shutil.which("spark-submit")
    if spark_submit is None:
        pytest.skip("spark-submit not on PATH")

    import pyarrow as pa
    import pyarrow.parquet as pq
    from goose_parser_spark.deploy import build_package_zip

    good = ("a meaningful sentence with varied everyday words that "
            "reads like real prose and carries clear content onward ")
    rows = [{"doc_id": i, "source": "s",
             "text": good + f"unique closing token{i}"}
            for i in range(10)]  # 20 tokens each, similar quality
    table = pa.Table.from_pylist(rows)
    docs = str(tmp_path / "documents.parquet")
    pq.write_table(table, docs)

    out_dir = str(tmp_path / "curated")
    zip_path = build_package_zip(str(tmp_path))
    proc = subprocess.run(
        [spark_submit, "--master", "local[4]", "--py-files", zip_path,
         "jobs/curate.py", "--input", docs, "--output", out_dir,
         "--token-budget", "100"],
        capture_output=True, text=True, timeout=300, cwd="/root/repo",
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    summary = json.loads(proc.stdout.strip().splitlines()[-1])
    assert summary["rows_in"] == 10
    # each doc is 20 tokens; a 100-token budget keeps at most 5 docs
    assert 1 <= summary["rows_out"] <= 5

#!/usr/bin/env python
"""Scaling evidence: separates the HARDWARE ceiling from the engine's
plumbing efficiency.

1. Pure-Python ceiling: the exact per-document extraction workload run
   under multiprocessing (no Spark, no Arrow) at N and 4N processes.
   This is the best any engine could do on this box.
2. Spark throughput at local[N] / local[4N] over the bench corpus.
3. Plumbing efficiency = spark_throughput / ceiling at each level.

Usage: python tools/scaling_probe.py [N]   (default 4 → levels 4, 16)
Prints one JSON line.
"""

from __future__ import annotations

import json
import multiprocessing as mp
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _worker(q) -> None:
    from goose_parser_spark.rules.compiler import RuleCompiler
    from goose_parser_spark.rules.evaluator import evaluate_document
    import bench

    compiled = RuleCompiler().compile(bench.FLAGSHIP_RULES)
    htmls = []
    for i in range(400):
        filler = "pad " * ((i % 97) * 40)
        htmls.append(
            f'<html><head><title>doc {i}</title></head><body>'
            f'<p class="filler">{filler}</p><h1 class="title">Bench {i}</h1>'
            f'<div class="product"><span class="name">Item {i}</span>'
            f'<span class="price">{i % 97}.99</span></div>'
            f'<table class="prices"><tr class="row"><td class="sku">A{i}'
            f'</td><td class="price">1.50</td></tr><tr class="row">'
            f'<td class="sku">B{i}</td><td class="price">2.75</td></tr>'
            f"</table></body></html>")
    for h in htmls[:50]:
        evaluate_document(compiled, h)
    t0 = time.perf_counter()
    n = 0
    while time.perf_counter() - t0 < 6.0:
        for h in htmls:
            evaluate_document(compiled, h)
        n += len(htmls)
    q.put(n / (time.perf_counter() - t0))


def ceiling(procs: int) -> float:
    q = mp.Queue()
    ps = [mp.Process(target=_worker, args=(q,)) for _ in range(procs)]
    for p in ps:
        p.start()
    agg = sum(q.get() for _ in ps)
    for p in ps:
        p.join()
    return agg


def spark_throughput(cores: int) -> float:
    import bench

    spark = bench._session(cores)
    spark.sparkContext.setLogLevel("ERROR")
    pages_path = bench._ensure_bench_pages(spark)
    bench._tune_splits(spark, pages_path, cores)
    bench._extraction_run(spark, pages_path)
    bench._extraction_run(spark, pages_path)
    s1, docs = bench._extraction_run(spark, pages_path)
    s2, _ = bench._extraction_run(spark, pages_path)
    spark.stop()
    return docs / min(s1, s2)


def main() -> int:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    levels = (n, n * 4)
    out: dict = {"levels": list(levels)}
    for lv in levels:
        out[f"ceiling_{lv}"] = round(ceiling(lv), 1)
    out["ceiling_efficiency"] = round(
        (out[f"ceiling_{levels[1]}"] / out[f"ceiling_{levels[0]}"]) / 4, 3)
    for lv in levels:
        out[f"spark_{lv}"] = round(spark_throughput(lv), 1)
        out[f"plumbing_{lv}"] = round(out[f"spark_{lv}"] / out[f"ceiling_{lv}"], 3)
    out["spark_efficiency"] = round(
        (out[f"spark_{levels[1]}"] / out[f"spark_{levels[0]}"]) / 4, 3)
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())

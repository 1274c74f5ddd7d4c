#!/usr/bin/env python
"""Exact-equivalence snapshots for the optimization round: run named
declared queries and print md5 over canonicalized (order-insensitive)
rows — the same cell canonicalization as tools/check_oracles.py. Run
before and after a restructure; equal hashes == identical results.

Usage: python tools/equiv_snapshot.py SF_DIR q1 q2 ...
Env:   GOOSE_ORACLE_AMP (default 23 — match the driver's gate),
       SPARK_GRAFT_CPUS (default 32).
"""

from __future__ import annotations

import hashlib
import json
import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("MALLOC_TRIM_THRESHOLD_", "-1")
os.environ.setdefault("ARROW_DEFAULT_MEMORY_POOL", "system")


def canon_cell(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return f"{v:.9g}"
    if isinstance(v, bytes):
        return v.hex()
    if isinstance(v, list):
        return "[" + ",".join(canon_cell(x) for x in v) + "]"
    return str(v)


def main() -> int:
    sf_dir = sys.argv[1]
    names = sys.argv[2:]
    import __spark_entry__ as entrymod
    from pyspark.sql import SparkSession

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = (SparkSession.builder.master(f"local[{cpus}]")
             .appName("goose-equiv")
             .config("spark.sql.shuffle.partitions", str(max(32, cpus * 2)))
             .config("spark.sql.adaptive.enabled", "true")
             .config("spark.ui.enabled", "false")
             .config("spark.ui.showConsoleProgress", "false")
             .config("spark.driver.memory", "12g")
             .getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
    qs = entrymod.queries()
    out = {}
    for name in names:
        df = qs[name](spark, sf_dir)
        cols = df.columns
        order = sorted(range(len(cols)), key=lambda i: cols[i])
        rows = sorted(
            tuple(canon_cell(r[i]) for i in order) for r in df.collect())
        h = hashlib.md5()
        h.update(("|".join(sorted(cols))).encode())
        for r in rows:
            h.update(("\x1f".join(r) + "\n").encode())
        out[name] = {"rows": len(rows), "md5": h.hexdigest()}
        print(f"{name}: rows={len(rows)} md5={h.hexdigest()}",
              file=sys.stderr)
    print(json.dumps({"sf_dir": sf_dir,
                      "amp": os.environ.get("GOOSE_ORACLE_AMP", "23"),
                      "queries": out}))
    return 0


if __name__ == "__main__":
    sys.exit(main())

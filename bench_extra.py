#!/usr/bin/env python
"""Per-query isolation harness for the optimization round (guide §1).

NOT the driver bench — bench.py stays frozen. This tool times
individual declared queries with the noop sink (so the computation is
measured, not the sink), captures ``.explain("formatted")`` plans,
and reports cold + warm(best-of-2) seconds per query.

Usage:
  python bench_extra.py q1 q2 ...            # time queries
  python bench_extra.py --plans DIR q1 ...   # also write DIR/<q>.txt
  python bench_extra.py --count q1 ...       # .count() like bench.py
Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf1.0),
     SPARK_GRAFT_CPUS (default 32), GOOSE_ORACLE_AMP (default 1,
     matching bench.py's setting).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

os.environ.setdefault("MALLOC_TRIM_THRESHOLD_", "-1")
os.environ.setdefault("MALLOC_MMAP_THRESHOLD_", "1073741824")
os.environ.setdefault("MALLOC_ARENA_MAX", "4")
os.environ.setdefault("ARROW_DEFAULT_MEMORY_POOL", "system")
os.environ.setdefault("GOOSE_ORACLE_AMP", "1")

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf1.0")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def _session():
    from pyspark.sql import SparkSession

    return (SparkSession.builder.master(f"local[{CPUS}]")
            .appName("goose-bench-extra")
            .config("spark.sql.shuffle.partitions", str(max(32, CPUS * 2)))
            .config("spark.sql.adaptive.enabled", "true")
            .config("spark.sql.execution.arrow.maxRecordsPerBatch", "2048")
            .config("spark.sql.files.openCostInBytes", "0")
            .config("spark.ui.enabled", "false")
            .config("spark.ui.showConsoleProgress", "false")
            .config("spark.driver.memory", "12g")
            .config("spark.driver.extraJavaOptions",
                    "-Xms12g -XX:+AlwaysPreTouch -XX:+UseTransparentHugePages")
            .getOrCreate())


def main() -> int:
    args = sys.argv[1:]
    plans_dir = None
    use_count = False
    if "--plans" in args:
        i = args.index("--plans")
        plans_dir = args[i + 1]
        del args[i:i + 2]
        os.makedirs(plans_dir, exist_ok=True)
    if "--count" in args:
        use_count = True
        args.remove("--count")
    names = args

    import __spark_entry__ as entrymod

    spark = _session()
    spark.sparkContext.setLogLevel("ERROR")
    qs = entrymod.queries()
    out: dict[str, dict[str, float]] = {}
    for name in names:
        fn = qs[name]
        spark.sparkContext.setJobDescription(f"bench_extra: {name}")
        if plans_dir:
            df = fn(spark, SF_DIR)
            with open(os.path.join(plans_dir, f"{name}.txt"), "w") as fh:
                fh.write(df._sc._jvm.PythonSQLUtils.explainString(
                    df._jdf.queryExecution(), "formatted"))
        times = []
        for _rep in range(3):
            t0 = time.perf_counter()
            df = fn(spark, SF_DIR)
            if use_count:
                df.count()
            else:
                df.write.format("noop").mode("overwrite").save()
            times.append(round(time.perf_counter() - t0, 3))
        out[name] = {"cold": times[0], "warm": round(min(times[1:]), 3),
                     "all": times}
        print(f"{name}: cold={times[0]} warm={min(times[1:])}",
              file=sys.stderr)
        spark.sparkContext.setJobDescription(None)
    print(json.dumps({"sf_dir": SF_DIR, "results": out}))
    return 0


if __name__ == "__main__":
    sys.exit(main())

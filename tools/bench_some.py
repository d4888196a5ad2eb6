"""Isolated per-query bench: same methodology as bench.py (noop sink,
untimed warmup, median of N repeats, heap hygiene between queries) but for
a chosen subset — the optimize/re-measure loop tool. Usage:

    python tools/bench_some.py [--explain DIR/SUFFIX] query [query ...]

``--explain plans/r13/before`` additionally writes each query's
.explain("formatted") to plans/r13/<query>_before.txt (the plan capture the
judge checks claims against). Env: SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS,
SPARK_GRAFT_BENCH_REPEATS (default 3).
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    args = sys.argv[1:]
    explain_to = None
    if "--explain" in args:
        i = args.index("--explain")
        explain_to = args[i + 1]
        args = args[:i] + args[i + 2:]
    names = args
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    repeats = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_REPEATS", "3")))

    from lance_spark.session import get_spark
    from lance_spark import suite
    from bench import _between_queries

    spark = get_spark("lance_spark-bench-some")
    spark.range(1000).selectExpr("sum(id)").collect()
    from lance_spark.io import TABLES, load_table

    for t in TABLES:
        load_table(spark, sf_dir, t).write.format("noop").mode("overwrite").save()

    timings: dict[str, float] = {}
    for name in names:
        if name not in suite.QUERIES:
            print(f"# unknown query: {name}", file=sys.stderr)
            continue
        _between_queries(spark)
        spark.sparkContext.setJobDescription(f"bench:{name}")
        df = suite.QUERIES[name](spark, sf_dir)
        if explain_to:
            d, suffix = os.path.split(explain_to)
            os.makedirs(d or ".", exist_ok=True)
            path = os.path.join(d or ".", f"{name}_{suffix}.txt")
            with open(path, "w") as fh:
                fh.write(df._jdf.queryExecution().explainString(
                    spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
                ))
        df.write.format("noop").mode("overwrite").save()  # untimed warmup
        samples = []
        for _ in range(repeats):
            t0 = time.time()
            df = suite.QUERIES[name](spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            samples.append(time.time() - t0)
        spark.sparkContext.setJobDescription(None)
        timings[name] = round(statistics.median(samples), 3)
        print(
            f"# {name}: median {timings[name]:.3f}s of {[round(s, 3) for s in samples]}",
            file=sys.stderr,
        )
    print(json.dumps({"queries": timings, "sf_dir": sf_dir,
                      "loadavg_1m": round(os.getloadavg()[0], 2)}))
    spark.stop()


if __name__ == "__main__":
    main()

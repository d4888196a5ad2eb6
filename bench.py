"""Benchmark harness: runs the headline suite queries at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS] and prints ONE JSON line:
  {"metric": ..., "value": total_sec, "unit": "sec", "queries": {...}, "sf": ...}
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

# headline set: scan-heavy, join-heavy, window, and (as implemented)
# dedup/knn/fts representatives
HEADLINE = [
    "tpch_q1",
    "tpch_q6",
    "tpch_q3_topk",
    "tpch_q5_region",
    "window_topn_per_group",
    "events_hourly_window",
    "events_session_window",
    "scan_filter_project",
    "dedup_exact",
    "dedup_minhash_pairs",
    "dedup_simhash_pairs",
    "knn_cosine_topk",
    "ann_ivf_pq_refine",  # index build + partition-pruned search + refine
    "fts_bm25_topk",
    "text_quality_stats",
]


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else -1.0

    from lance_spark.session import get_spark
    from lance_spark import suite

    spark = get_spark("lance_spark-bench")
    # Warmup: JVM codegen JIT + parquet footer/metadata of each input table,
    # so the first timed query isn't charged ~2s of one-time session costs
    # (the BASELINE reference numbers are steady-state per-query latencies).
    # A LIMIT count touches footers + codegen paths without scanning data.
    from lance_spark.io import TABLES, load_table

    spark.range(1000).selectExpr("sum(id)").collect()
    for t in TABLES:
        load_table(spark, sf_dir, t).limit(16).count()

    timings: dict[str, float] = {}
    for name in HEADLINE:
        if name not in suite.QUERIES:
            continue
        t0 = time.time()
        df = suite.QUERIES[name](spark, sf_dir)
        # noop sink forces computation of EVERY column (count() would let
        # Catalyst prune projections) with no driver-transfer cost
        df.write.format("noop").mode("overwrite").save()
        timings[name] = round(time.time() - t0, 3)
        print(f"# {name}: {timings[name]:.3f}s", file=sys.stderr)

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "suite_total_wall",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()

"""Isolated bench for the indexed paths (ann_build / ann_search /
fts_index_build / fts_bm25_indexed) — exactly bench.py's bench_indexed
methodology, runnable standalone for the optimize/re-measure loop.
Env: SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS, SPARK_GRAFT_BENCH_REPEATS.
Usage: python tools/bench_fts_ann.py [fts|ann|all]
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    repeats = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_REPEATS", "3")))

    from pyspark.sql import functions as F

    from bench import _between_queries
    from lance_spark.dataset import dataset
    from lance_spark.indexes.inverted import create_inverted_index, match_query
    from lance_spark.indexes.vector import ann_search, build_ivf
    from lance_spark.io import load_table
    from lance_spark.session import get_spark
    from lance_spark.write import write_dataset

    spark = get_spark("lance_spark-bench-fts-ann")
    spark.range(1000).selectExpr("sum(id)").collect()
    timings: dict[str, float] = {}

    if which in ("ann", "all"):
        emb = load_table(spark, sf_dir, "embeddings")
        emb.write.format("noop").mode("overwrite").save()
        qvecs = [
            [float(x) for x in r["embedding"]]
            for r in emb.filter(F.col("vec_id").isin([11, 101, 1001])).collect()
        ]
        _between_queries(spark)
        build_samples = []
        for _ in range(repeats):
            t0 = time.time()
            idx = build_ivf(
                emb, "embedding", "vec_id", tempfile.mkdtemp(prefix="bench_pq_"),
                num_partitions=16, metric="l2", index_type="IVF_PQ",
                num_sub_vectors=8,
            )
            build_samples.append(time.time() - t0)
        timings["ann_build"] = round(statistics.median(build_samples), 3)
        print(f"# ann_build: {timings['ann_build']}s of {[round(s,3) for s in build_samples]}", file=sys.stderr)
        ann_search(spark, idx, qvecs[0], k=10, nprobes=4, refine_factor=10).collect()
        search_samples = []
        for _ in range(repeats):
            for qv in qvecs:
                t0 = time.time()
                ann_search(spark, idx, qv, k=10, nprobes=4, refine_factor=10).collect()
                search_samples.append(time.time() - t0)
        timings["ann_search"] = round(statistics.median(search_samples), 3)
        print(f"# ann_search: {timings['ann_search']}s", file=sys.stderr)

    if which in ("fts", "all"):
        docs = load_table(spark, sf_dir, "documents")
        docs.write.format("noop").mode("overwrite").save()
        _between_queries(spark)
        build_samples = []
        for _ in range(repeats):
            uri = tempfile.mkdtemp(prefix="bench_fts_") + "/docs"
            t0 = time.time()
            write_dataset(docs.repartition(8), uri, mode="create")
            ds = create_inverted_index(dataset(uri), spark, "text")
            build_samples.append(time.time() - t0)
        timings["fts_index_build"] = round(statistics.median(build_samples), 3)
        print(f"# fts_index_build: {timings['fts_index_build']}s of {[round(s,3) for s in build_samples]}", file=sys.stderr)
        match_query(ds, spark, ["warmup"], k=10).collect()
        search_samples = []
        for _ in range(repeats):
            for terms in (["table", "scan", "join"], ["key", "order"], ["spark"]):
                t0 = time.time()
                match_query(ds, spark, terms, k=10).collect()
                search_samples.append(time.time() - t0)
        timings["fts_bm25_indexed"] = round(statistics.median(search_samples), 3)
        print(f"# fts_bm25_indexed: {timings['fts_bm25_indexed']}s", file=sys.stderr)

    print(json.dumps({"queries": timings, "sf_dir": sf_dir,
                      "loadavg_1m": round(os.getloadavg()[0], 2)}))
    spark.stop()


if __name__ == "__main__":
    main()

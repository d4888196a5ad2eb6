#!/usr/bin/env python3
"""Recall-at-scale harness for the IVF_HNSW_* index family.

Pins recall@10 >= 0.95 vs exact brute force at >= 100k vectors — the
BASELINE.md shape target — for IVF_HNSW_FLAT / IVF_HNSW_PQ / IVF_HNSW_SQ
(and optionally the non-graph types). The corpus is a seeded Gaussian
mixture at the testdata embedding dimensionality (64), i.e. clustered the
way real embedding spaces are; queries are held-out perturbed corpus
points. Ground truth is exact float64 L2 in numpy (the oracle is not the
system under test). Results go to stdout as one JSON line; paste the
numbers into SCALING.md.

Usage: python tools/recall_scale.py [--n 100000] [--queries 50]
       [--types IVF_HNSW_FLAT,IVF_HNSW_PQ,IVF_HNSW_SQ]
"""
from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DIM = 64
K = 10
SEED = 7


def make_corpus(n: int, dim: int = DIM, n_clusters: int = 256, seed: int = SEED):
    rng = np.random.default_rng(seed)
    centers = rng.normal(0, 1.0, size=(n_clusters, dim)).astype(np.float32)
    assign = rng.integers(0, n_clusters, size=n)
    pts = centers[assign] + rng.normal(0, 0.15, size=(n, dim)).astype(np.float32)
    return pts.astype(np.float32)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=100_000)
    ap.add_argument("--queries", type=int, default=50)
    ap.add_argument(
        "--types", default="IVF_HNSW_FLAT,IVF_HNSW_PQ,IVF_HNSW_SQ"
    )
    ap.add_argument("--partitions", type=int, default=None,
                    help="IVF partitions; default = the library sqrt(n) heuristic")
    ap.add_argument("--nprobes", type=int, default=16)
    ap.add_argument("--ef", type=int, default=128)
    ap.add_argument("--refine", type=int, default=10)
    ap.add_argument("--subvectors", type=int, default=16)
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    from lance_spark.indexes.vector import ann_search, build_ivf

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "24g")
        .appName("recall-scale")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    pts = make_corpus(args.n)
    rng = np.random.default_rng(SEED + 1)
    qidx = rng.choice(args.n, size=args.queries, replace=False)
    queries = pts[qidx] + rng.normal(0, 0.05, size=(args.queries, DIM)).astype(
        np.float32
    )

    # exact ground truth, float64 L2 (batched so it stays cache-friendly)
    p64 = pts.astype(np.float64)
    truth = []
    for qv in queries:
        d = ((p64 - qv.astype(np.float64)) ** 2).sum(axis=1)
        truth.append(set(np.argpartition(d, K)[:K].tolist()))

    tmp = tempfile.mkdtemp(prefix="recall_scale_")
    try:
        import pandas as pd

        pdf = pd.DataFrame(
            {"vec_id": np.arange(args.n, dtype=np.int64), "embedding": list(pts)}
        )
        corpus_path = os.path.join(tmp, "corpus.parquet")
        pdf.to_parquet(corpus_path)
        df = spark.read.parquet(corpus_path).repartition(int(cpus)).cache()
        df.count()

        out = {"n": args.n, "dim": DIM, "k": K, "queries": args.queries,
               "partitions": args.partitions, "nprobes": args.nprobes,
               "ef_search": args.ef, "refine_factor": args.refine,
               "subvectors": args.subvectors, "types": {}}
        for itype in args.types.split(","):
            itype = itype.strip()
            t0 = time.time()
            idx = build_ivf(
                df, "embedding", "vec_id", os.path.join(tmp, itype),
                num_partitions=args.partitions, metric="l2", index_type=itype,
                sample_size=50_000, num_sub_vectors=args.subvectors,
            )
            build_s = time.time() - t0
            out["partitions"] = int(idx.meta["num_partitions"])  # resolved
            hits, t1 = 0, time.time()
            for qi, qv in enumerate(queries):
                got = {
                    r["id"]
                    for r in ann_search(
                        spark, idx, [float(x) for x in qv], k=K,
                        nprobes=args.nprobes, ef_search=args.ef,
                        refine_factor=args.refine,
                    ).collect()
                }
                hits += len(got & truth[qi])
            search_s = time.time() - t1
            recall = hits / (K * args.queries)
            out["types"][itype] = {
                "recall_at_10": round(recall, 4),
                "build_s": round(build_s, 1),
                "search_s_per_query": round(search_s / args.queries, 3),
            }
            print(f"# {itype}: recall@10={recall:.4f} build={build_s:.1f}s "
                  f"search={search_s / args.queries:.3f}s/q", file=sys.stderr)
        print(json.dumps(out))
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()

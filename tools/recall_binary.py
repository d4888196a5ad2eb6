#!/usr/bin/env python3
"""Recall-at-scale harness for the BINARY (hamming) IVF index.

Pins recall@10 vs exact brute-force hamming at >= 100k binary vectors —
the binary analogue of recall_scale.py. The corpus is sign-binarized
from a seeded Gaussian mixture (clustered the way real binary/hash
embeddings are: sign-LSH of clustered floats); queries are held-out
bit-flip perturbations of corpus points. Ground truth is exact popcount
hamming in numpy (the oracle is not the system under test). One JSON
line to stdout; paste the numbers into SCALING.md.

Usage: python tools/recall_binary.py [--n 100000] [--bits 256]
       [--queries 50] [--packed] [--nprobes 4,16,32]
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

K = 10
SEED = 7


def make_bits(n: int, bits: int, n_clusters: int = 256, seed: int = SEED):
    rng = np.random.default_rng(seed)
    centers = rng.normal(0, 1.0, size=(n_clusters, bits)).astype(np.float32)
    assign = rng.integers(0, n_clusters, size=n)
    pts = centers[assign] + rng.normal(0, 0.35, size=(n, bits)).astype(np.float32)
    return (pts > 0).astype(np.uint8)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=100_000)
    ap.add_argument("--bits", type=int, default=256)
    ap.add_argument("--queries", type=int, default=50)
    ap.add_argument("--packed", action="store_true",
                    help="store uint8-packed bytes instead of 0/1 arrays")
    ap.add_argument("--nprobes", default="4,16,32")
    ap.add_argument("--partitions", type=int, default=None)
    args = ap.parse_args()

    from lance_spark.indexes.vector import ann_search, build_ivf
    from lance_spark.session import get_spark

    spark = get_spark("recall-binary")
    X = make_bits(args.n, args.bits)
    rng = np.random.default_rng(SEED + 1)
    qidx = rng.choice(args.n, size=args.queries, replace=False)
    flips = rng.integers(0, args.bits, size=(args.queries, 8))
    Q = X[qidx].copy()
    for i in range(args.queries):
        Q[i, flips[i]] ^= 1

    # exact ground truth: popcount hamming in numpy
    gt = []
    for q in Q:
        d = (X != q[None, :]).sum(axis=1)
        order = np.lexsort((np.arange(args.n), d))
        gt.append(set(order[:K].tolist()))

    store = np.packbits(X, axis=1) if args.packed else X
    rows = [(int(i), [int(v) for v in store[i]]) for i in range(args.n)]
    df = spark.createDataFrame(rows, "id long, bits array<int>").repartition(32)
    t0 = time.time()
    idx = build_ivf(
        df, "bits", "id", tempfile.mkdtemp(prefix="rb_") + "/idx",
        num_partitions=args.partitions, metric="hamming", index_type="IVF_FLAT",
    )
    build_s = time.time() - t0

    out = {
        "n": args.n, "bits": args.bits, "queries": args.queries,
        "packed": bool(args.packed),
        "partitions": int(idx.centroids.shape[0]), "build_s": round(build_s, 1),
        "recall": {},
    }
    qstore = np.packbits(Q, axis=1) if args.packed else Q
    for np_ in (int(x) for x in str(args.nprobes).split(",")):
        hit = tot = 0
        t0 = time.time()
        for i in range(args.queries):
            got = {
                r["id"]
                for r in ann_search(
                    spark, idx, [int(v) for v in qstore[i]], k=K, nprobes=np_
                ).collect()
            }
            hit += len(got & gt[i])
            tot += K
        out["recall"][f"nprobes={np_}"] = {
            "recall_at_10": round(hit / tot, 4),
            "avg_query_s": round((time.time() - t0) / args.queries, 3),
        }
    print(json.dumps(out))


if __name__ == "__main__":
    main()

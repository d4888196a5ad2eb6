"""Benchmark harness: runs the headline suite queries at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS] and prints ONE JSON line:
  {"metric": ..., "value": total_sec, "unit": "sec", "queries": {...}, "sf": ...}
"""

from __future__ import annotations

import json
import os
import re
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

# headline set: scan-heavy, join-heavy, window, and (as implemented)
# dedup/knn/fts representatives. ANN and FTS are benched build-vs-search
# separately (bench_indexed below) — the reference reports per-query search
# latency excluding build (benchmarks/sift CSVs), so conflating them hides
# search regressions behind build noise.
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
    "text_quality_stats",
    "curate_chunks",
    "curate_repetition",
    # round-4 pipeline operators
    "events_asof_join",
    "events_range_join",
    "curate_pack_sequences",
    "dedup_paragraphs",
    "text_build_vocab",
    # round-4b pipeline operators
    "curate_mix_weighted",
    "curate_global_shuffle",
    # round-5: bounded-output near-dup (the replica-heavy-corpus scale valve)
    "dedup_simhash_capped",
    # round-5: snapshot-vs-corpus dedup through a persisted fingerprint index
    "dedup_incremental_index",
    # round-8: span-level substring dedup (content-defined windows)
    "dedup_substring_spans",
    # round-8: span-level eval decontamination + entropy quality signal
    "curate_decontaminate_spans",
    "text_token_entropy",
    # round-8: distributed train+score NB classifier (the filter-model stage)
    "curate_nb_classifier",
    # round-12: iterative-graph operators — per-round loop overhead was
    # invisible to BENCH (the r11 verdict's missing-row item)
    "dedup_clusters",
    "dedup_semantic_keep",
]


def _between_queries(spark) -> None:
    """Heap hygiene between timed queries: a long single-process suite
    accumulates cached relations, shuffle bookkeeping, and un-collected
    garbage, so mid-suite rows measure heap history instead of plans
    (BENCH_sf1: events_session_window 9.1s in-suite vs 0.8s standalone).
    Clearing the SQL cache and nudging both collectors between rows makes
    each timing start from a comparable heap."""
    import gc

    spark.catalog.clearCache()
    gc.collect()
    try:
        spark.sparkContext._jvm.System.gc()
    except Exception:
        pass  # py4j hiccup — skip the nudge rather than fail the bench


def bench_indexed(spark, sf_dir: str, timings: dict[str, float]) -> None:
    """ANN + FTS through their persisted indexes: build timed per run
    (median over repeats), search timed on the prebuilt index (the
    serving-path number, median over per-query latencies)."""
    import tempfile

    from pyspark.sql import functions as F

    from lance_spark.dataset import dataset
    from lance_spark.indexes.inverted import create_inverted_index, match_query
    from lance_spark.indexes.vector import ann_search, build_ivf
    from lance_spark.io import load_table
    from lance_spark.write import write_dataset

    repeats = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_REPEATS", "3")))

    # --- ANN: IVF_PQ build (median of repeats), pruned search + refine ----
    emb = load_table(spark, sf_dir, "embeddings")
    qvecs = [
        [float(x) for x in r["embedding"]]
        for r in emb.filter(F.col("vec_id").isin([11, 101, 1001])).collect()
    ]
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
    # one untimed warmup: first query pays python-worker spawn + parquet
    # footer reads; the steady-state per-query latency is the serving number
    ann_search(spark, idx, qvecs[0], k=10, nprobes=4, refine_factor=10).collect()
    search_samples = []
    for _ in range(repeats):
        for qv in qvecs:
            t0 = time.time()
            ann_search(spark, idx, qv, k=10, nprobes=4, refine_factor=10).collect()
            search_samples.append(time.time() - t0)
    timings["ann_search"] = round(statistics.median(search_samples), 3)

    # --- FTS: INVERTED index build, match through the postings ------------
    docs = load_table(spark, sf_dir, "documents")
    build_samples = []
    for _ in range(repeats):
        uri = tempfile.mkdtemp(prefix="bench_fts_") + "/docs"
        t0 = time.time()
        write_dataset(docs.repartition(8), uri, mode="create")
        ds = create_inverted_index(dataset(uri), spark, "text")
        build_samples.append(time.time() - t0)
    timings["fts_index_build"] = round(statistics.median(build_samples), 3)
    match_query(ds, spark, ["warmup"], k=10).collect()  # untimed warmup
    search_samples = []
    for _ in range(repeats):
        for terms in (["table", "scan", "join"], ["key", "order"], ["spark"]):
            t0 = time.time()
            match_query(ds, spark, terms, k=10).collect()
            search_samples.append(time.time() - t0)
    timings["fts_bm25_indexed"] = round(statistics.median(search_samples), 3)


def _cpu_calibration() -> float:
    """Milliseconds for a fixed single-core loop (median of 3): a pure
    host-speed probe, independent of Spark and of this repo's code."""
    import statistics

    samples = []
    for _ in range(3):
        t0 = time.time()
        s = 0
        for i in range(2_000_000):
            s += i * i
        samples.append((time.time() - t0) * 1000)
    return round(statistics.median(samples), 1)


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else -1.0
    # loadavg BEFORE any work: the end-of-run value mostly reflects bench's
    # own 32-core burst; the start value shows pre-existing contention (the
    # signal that separates a real regression from a noisy box).
    try:
        load1_start, load5_start, _ = os.getloadavg()
    except OSError:
        load1_start = load5_start = -1.0
    # single-core CPU calibration: the shared host's effective clock varies
    # round-to-round (r12 measured untouched queries uniformly ~1.5× slower
    # on an IDLE box vs r11) — this constant-work loop lets a cross-round
    # comparison normalize for host speed, not just contention (loadavg)
    cpu_cal = _cpu_calibration()

    from lance_spark.session import get_spark
    from lance_spark import suite

    spark = get_spark("lance_spark-bench")
    # Warmup: JVM codegen JIT + parquet footer/metadata of each input table,
    # so the first timed query isn't charged ~2s of one-time session costs
    # (the BASELINE reference numbers are steady-state per-query latencies).
    # A LIMIT count touches footers + codegen paths without scanning data.
    from lance_spark.io import TABLES, load_table

    spark.range(1000).selectExpr("sum(id)").collect()
    # full noop-sink scan (count() takes the parquet metadata fast path and
    # reads no data pages) so a cold OS page cache is charged to warmup,
    # not to whichever query touches each table first — measured a fresh
    # VM recording 2-3x medians on the first IO-heavy queries otherwise
    for t in TABLES:
        load_table(spark, sf_dir, t).write.format("noop").mode("overwrite").save()

    # Median-of-3 per query: a single timed run is one background process
    # away from a 3x outlier (BENCH_r03 recorded 82s on code whose idle
    # wall is 26s). The median of three back-to-back runs is robust to a
    # transient load spike without triple-counting steady-state cost.
    repeats = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_REPEATS", "3")))
    timings: dict[str, float] = {}
    for name in HEADLINE:
        if name not in suite.QUERIES:
            continue
        _between_queries(spark)
        # one untimed warmup: the first execution of a query pays its
        # whole-stage codegen compilation (~0.5-1s), which is a one-time
        # session cost, not the query's steady-state latency — the
        # BASELINE numbers this is compared against are steady-state
        suite.QUERIES[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
        samples = []
        for _ in range(repeats):
            t0 = time.time()
            df = suite.QUERIES[name](spark, sf_dir)
            # noop sink forces computation of EVERY column (count() would let
            # Catalyst prune projections) with no driver-transfer cost
            df.write.format("noop").mode("overwrite").save()
            samples.append(time.time() - t0)
        timings[name] = round(statistics.median(samples), 3)
        print(
            f"# {name}: median {timings[name]:.3f}s of "
            f"{[round(s, 3) for s in samples]}",
            file=sys.stderr,
        )

    _between_queries(spark)
    bench_indexed(spark, sf_dir, timings)
    for k in ("ann_build", "ann_search", "fts_index_build", "fts_bm25_indexed"):
        print(f"# {k}: {timings[k]:.3f}s", file=sys.stderr)

    total = round(sum(timings.values()), 3)
    # loadavg lets the judge distinguish a real regression from a run on a
    # contended box (the BENCH_r03 false-FAIL scenario)
    try:
        load1, load5, _ = os.getloadavg()
    except OSError:
        load1 = load5 = -1.0
    print(
        json.dumps(
            {
                "metric": "suite_total_wall",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
                "repeats": repeats,
                "loadavg_1m": round(load1, 2),
                "loadavg_5m": round(load5, 2),
                "loadavg_1m_start": round(load1_start, 2),
                "loadavg_5m_start": round(load5_start, 2),
                "cpu_cal_ms": cpu_cal,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()

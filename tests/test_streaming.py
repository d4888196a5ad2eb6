"""Structured Streaming tests: file-source micro-batches → dataset commits
(one version per batch, exactly-once), windowed/session/stateful operators
checked against their batch equivalents.
"""

import os
import shutil

import pytest
from pyspark.sql import functions as F


def _events(spark, sf_dir):
    # load_table converts the TIMESTAMP(NANOS) ts column to TimestampType
    from lance_spark.io import load_table

    return load_table(spark, sf_dir, "events")


@pytest.fixture()
def events_stream_dir(spark, sf_dir, tmp_path):
    """Split events into 3 files in a fresh dir → 3 micro-batches with
    maxFilesPerTrigger=1."""
    src = str(tmp_path / "in")
    _events(spark, sf_dir).repartition(3).write.parquet(src)
    return src


def _events_schema(spark, sf_dir):
    return _events(spark, sf_dir).schema


def test_stream_ingest_commits_versions(spark, sf_dir, events_stream_dir, tmp_path):
    from lance_spark.dataset import dataset
    from lance_spark.streaming.sink import write_stream

    uri = str(tmp_path / "ds")
    sdf = (
        spark.readStream.schema(_events_schema(spark, sf_dir))
        .option("maxFilesPerTrigger", 1)
        .parquet(events_stream_dir)
    )
    q = write_stream(sdf, uri, str(tmp_path / "ckpt"), trigger_available_now=True)
    q.awaitTermination(120)

    ds = dataset(uri)
    total = _events(spark, sf_dir).count()
    assert ds.count_rows() == total
    # one commit per non-empty micro-batch, time-travelable
    assert len(ds.versions()) >= 2
    v1 = ds.checkout_version(1)
    assert 0 < v1.count_rows() < total

    # restart with same checkpoint: no new data → no duplicate rows
    q2 = write_stream(sdf, uri, str(tmp_path / "ckpt"), trigger_available_now=True)
    q2.awaitTermination(120)
    assert dataset(uri).count_rows() == total


def test_batch_writer_idempotent(spark, sf_dir, tmp_path):
    from lance_spark.dataset import dataset
    from lance_spark.streaming.sink import dataset_batch_writer

    uri = str(tmp_path / "ds2")
    ev = _events(spark, sf_dir).limit(100)
    w = dataset_batch_writer(uri)
    w(ev, 0)
    w(ev, 0)  # replay of same batch id must be a no-op
    w(ev, 1)
    assert dataset(uri).count_rows() == 200


def test_tumbling_agg_matches_batch(spark, sf_dir, events_stream_dir, tmp_path):
    from lance_spark.streaming.sink import tumbling_agg

    sdf = (
        spark.readStream.schema(_events_schema(spark, sf_dir))
        .option("maxFilesPerTrigger", 1)
        .parquet(events_stream_dir)
    )
    windowed = tumbling_agg(
        sdf, "ts", window="1 hour", watermark="30 minutes",
        keys=["event_type"], aggs=[F.count("*").alias("n")],
    )
    q = (
        windowed.writeStream.format("memory")
        .queryName("win_test")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r["window_start"], r["event_type"]): r["n"]
        for r in spark.sql("SELECT * FROM win_test").collect()
    }
    batch = (
        _events(spark, sf_dir)
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count("*").alias("n"))
        .select(F.col("w.start").alias("ws"), "event_type", "n")
    )
    want = {(r["ws"], r["event_type"]): r["n"] for r in batch.collect()}
    assert got == want


def test_stateful_running_counts(spark, sf_dir, events_stream_dir, tmp_path):
    from lance_spark.streaming.sink import running_counts_stateful

    sdf = (
        spark.readStream.schema(_events_schema(spark, sf_dir))
        .option("maxFilesPerTrigger", 1)
        .parquet(events_stream_dir)
    )
    counts = running_counts_stateful(sdf.select(F.col("event_type").cast("string")), "event_type")
    q = (
        counts.writeStream.format("memory")
        .queryName("state_test")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    # last emitted total per key == batch count (state carried across batches)
    rows = spark.sql("SELECT key, max(total) AS total FROM state_test GROUP BY key").collect()
    got = {r["key"]: r["total"] for r in rows}
    want = {
        r["event_type"]: r["n"]
        for r in _events(spark, sf_dir)
        .groupBy("event_type")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    assert got == want


def test_streaming_dedup_drops_replays(spark, tmp_path):
    """Replayed keys inside the watermark horizon are emitted once."""
    import datetime as dt

    from lance_spark.streaming.sink import streaming_dedup

    src = str(tmp_path / "src")
    os.makedirs(src)
    base = dt.datetime(2025, 1, 1, 12, 0, 0)
    rows = [
        (1, base, "a"),
        (2, base + dt.timedelta(minutes=1), "b"),
        (1, base + dt.timedelta(minutes=2), "a-replay"),
        (3, base + dt.timedelta(minutes=3), "c"),
        (2, base + dt.timedelta(minutes=4), "b-replay"),
    ]
    spark.createDataFrame(rows, "event_id long, ts timestamp, payload string").coalesce(
        1
    ).write.parquet(src + "/batch0")
    sdf = (
        spark.readStream.schema("event_id long, ts timestamp, payload string")
        .option("maxFilesPerTrigger", "1")
        .parquet(src + "/*")
    )
    out = str(tmp_path / "out")
    q = (
        streaming_dedup(sdf, ["event_id"], "ts")
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.read.parquet(out)
    assert got.count() == 3
    assert {r["event_id"] for r in got.collect()} == {1, 2, 3}


def test_stream_upsert_merges_batches(spark, sf_dir, tmp_path):
    """mode='upsert': a keyed change feed becomes a continuously-updated
    table — later batches overwrite matching keys, insert new ones, and a
    checkpoint replay does not double-apply."""
    from lance_spark.dataset import dataset
    from lance_spark.streaming.sink import write_stream

    src = str(tmp_path / "in")
    # batch files processed one per trigger in name order is not guaranteed,
    # so make the upsert outcome order-independent: every file carries
    # DISTINCT keys except key 1, whose value is the same in both files
    spark.createDataFrame(
        [(1, "a"), (2, "b")], "k int, v string"
    ).coalesce(1).write.parquet(src + "/f1")
    spark.createDataFrame(
        [(1, "a"), (3, "c")], "k int, v string"
    ).coalesce(1).write.parquet(src + "/f2")

    uri = str(tmp_path / "ds")
    sdf = (
        spark.readStream.schema("k int, v string")
        .option("maxFilesPerTrigger", 1)
        .parquet(src + "/*")
    )
    q = write_stream(
        sdf, uri, str(tmp_path / "ckpt"), mode="upsert", on="k",
        trigger_available_now=True,
    )
    q.awaitTermination(120)

    ds = dataset(uri)
    rows = {r["k"]: r["v"] for r in ds.to_df(spark).collect()}
    assert rows == {1: "a", 2: "b", 3: "c"}
    assert ds.count_rows() == 3  # key 1 merged, not duplicated

    # replay from the same checkpoint: nothing new → no extra versions/rows
    v_before = ds.version
    q2 = write_stream(
        sdf, uri, str(tmp_path / "ckpt"), mode="upsert", on="k",
        trigger_available_now=True,
    )
    q2.awaitTermination(120)
    ds2 = dataset(uri)
    assert ds2.count_rows() == 3 and ds2.version == v_before


def test_stream_upsert_updates_values(spark, tmp_path):
    """Explicit two-phase upsert through the foreachBatch callback: the
    second batch's value for an existing key wins."""
    from lance_spark.dataset import dataset
    from lance_spark.streaming.sink import dataset_upsert_writer

    uri = str(tmp_path / "ds")
    w = dataset_upsert_writer(uri, "k", query_key="t")
    w(spark.createDataFrame([(1, "old"), (2, "keep")], "k int, v string"), 0)
    w(spark.createDataFrame([(1, "new"), (3, "ins")], "k int, v string"), 1)
    rows = {r["k"]: r["v"] for r in dataset(uri).to_df(spark).collect()}
    assert rows == {1: "new", 2: "keep", 3: "ins"}
    # replaying batch 1 is a no-op
    v = dataset(uri).version
    w(spark.createDataFrame([(1, "zzz")], "k int, v string"), 1)
    assert dataset(uri).version == v
    assert {r["k"]: r["v"] for r in dataset(uri).to_df(spark).collect()}[1] == "new"


def test_stream_upsert_sequence_col_deterministic(spark, tmp_path):
    """With sequence_col, the max-sequence change per key wins even when one
    micro-batch carries several changes for the same key."""
    from lance_spark.dataset import dataset
    from lance_spark.streaming.sink import dataset_upsert_writer

    uri = str(tmp_path / "ds")
    w = dataset_upsert_writer(uri, "k", query_key="s", sequence_col="seq")
    batch = spark.createDataFrame(
        [(1, "insert", 10), (1, "update", 20), (2, "only", 5)],
        "k int, v string, seq int",
    ).repartition(4)  # scatter so dropDuplicates order would be arbitrary
    w(batch, 0)
    rows = {r["k"]: r["v"] for r in dataset(uri).to_df(spark).collect()}
    assert rows == {1: "update", 2: "only"}
    # next batch: older sequence for k=1 still wins within ITS batch rules
    w(spark.createDataFrame([(1, "late", 15), (1, "later", 30)],
                            "k int, v string, seq int"), 1)
    rows = {r["k"]: r["v"] for r in dataset(uri).to_df(spark).collect()}
    assert rows[1] == "later"


# ------------------------------------------------ late data / watermarks


def _write_event_file(path, times, mtime):
    """One parquet file of ('2026-01-01 HH:MM' UTC, key) events with a
    controlled mtime — the file source orders micro-batches by mtime, so
    tests can stage exactly which events arrive in which batch."""
    from datetime import datetime, timezone

    import pyarrow as pa
    import pyarrow.parquet as pq

    tbl = pa.table({
        "ts": pa.array(
            [datetime(2026, 1, 1, h, m, tzinfo=timezone.utc) for h, m in times],
            pa.timestamp("us", tz="UTC"),
        ),
        "k": pa.array(["a"] * len(times)),
    })
    pq.write_table(tbl, str(path))
    os.utime(str(path), (mtime, mtime))


def test_late_events_watermark_vs_batch_oracle(spark, tmp_path):
    """Late data crossing micro-batch boundaries: an event later than the
    watermark is dropped, one within the watermark is aggregated — and the
    COMMITTED dataset equals the batch-mode oracle over the surviving
    events for every finalized window."""
    import time

    from lance_spark.dataset import dataset
    from lance_spark.streaming.sink import tumbling_agg, write_stream

    src = tmp_path / "late_in"
    src.mkdir()
    base = time.time() - 1000
    # batch 0: window 10:00 gets two events
    _write_event_file(src / "a.parquet", [(10, 10), (10, 20)], base)
    # batch 1: 12:00 event → watermark becomes 11:30 for the NEXT batch
    _write_event_file(src / "b.parquet", [(12, 0)], base + 10)
    # batch 2: runs with wm=11:30 → window 10:00 is EVICTED here (n=2)
    _write_event_file(src / "b2.parquet", [(12, 10)], base + 20)
    # batch 3: 10:30 arrives AFTER its window was evicted → guaranteed
    # dropped (the watermark contract); 12:05 is within the watermark
    _write_event_file(src / "c.parquet", [(10, 30), (12, 5)], base + 30)
    # batch 4: 14:00 → watermark passes 13:00, finalizing window 12:00
    _write_event_file(src / "d.parquet", [(14, 0)], base + 40)

    sdf = (
        spark.readStream.schema("ts timestamp, k string")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    windowed = tumbling_agg(
        sdf, "ts", window="1 hour", watermark="30 minutes",
        keys=["k"], aggs=[F.count("*").alias("n")],
    )
    uri = str(tmp_path / "late_ds")
    ckpt = str(tmp_path / "late_ckpt")
    q = write_stream(windowed, uri, ckpt, trigger_available_now=True)
    q.awaitTermination(120)
    # restart once: watermark state persists in the checkpoint, so a no-op
    # run flushes any window finalized by the last batch's watermark bump
    sdf2 = (
        spark.readStream.schema("ts timestamp, k string")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    windowed2 = tumbling_agg(
        sdf2, "ts", window="1 hour", watermark="30 minutes",
        keys=["k"], aggs=[F.count("*").alias("n")],
    )
    q2 = write_stream(windowed2, uri, ckpt, trigger_available_now=True)
    q2.awaitTermination(120)

    got = {
        (r["window_start"].hour, r["n"])
        for r in dataset(uri).to_df(spark).collect()
    }
    # batch oracle over the events that survive the watermark
    # ({10:10, 10:20, 12:00, 12:10, 12:05} — 10:30 was late past its
    # window's eviction), restricted to windows the final watermark
    # (13:30) finalized:
    assert got == {(10, 2), (12, 3)}


def test_out_of_order_files_append_matches_batch(spark, tmp_path):
    """Raw append ingest has no watermark: files arriving in non-time
    order still land exactly-once and the committed dataset equals the
    batch union of all files."""
    import time

    from lance_spark.dataset import dataset
    from lance_spark.streaming.sink import write_stream

    src = tmp_path / "ooo_in"
    src.mkdir()
    base = time.time() - 1000
    # arrival order deliberately disagrees with event-time order
    _write_event_file(src / "a.parquet", [(12, 0), (12, 30)], base)
    _write_event_file(src / "b.parquet", [(9, 0)], base + 10)
    _write_event_file(src / "c.parquet", [(15, 0), (8, 45)], base + 20)

    sdf = (
        spark.readStream.schema("ts timestamp, k string")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    uri = str(tmp_path / "ooo_ds")
    q = write_stream(sdf, uri, str(tmp_path / "ooo_ckpt"), trigger_available_now=True)
    q.awaitTermination(120)

    got = sorted(r["ts"] for r in dataset(uri).to_df(spark).collect())
    want = sorted(r["ts"] for r in spark.read.parquet(str(src)).collect())
    assert got == want and len(got) == 5
    # one commit per micro-batch, replay-safe on restart
    q2 = write_stream(sdf, uri, str(tmp_path / "ooo_ckpt"), trigger_available_now=True)
    q2.awaitTermination(120)
    assert dataset(uri).count_rows() == 5


def test_sliding_agg_matches_batch(spark, sf_dir, events_stream_dir, tmp_path):
    """Sliding (hopping) windows through the streaming path equal the batch
    F.window(slideDuration) plan — same operator the oracle pins in the
    events_sliding_window suite entry."""
    from lance_spark.streaming.sink import tumbling_agg

    sdf = (
        spark.readStream.schema(_events_schema(spark, sf_dir))
        .option("maxFilesPerTrigger", 1)
        .parquet(events_stream_dir)
    )
    windowed = tumbling_agg(
        sdf, "ts", window="1 hour", slide="15 minutes", watermark="30 minutes",
        keys=["event_type"], aggs=[F.count("*").alias("n")],
    )
    q = (
        windowed.writeStream.format("memory")
        .queryName("slide_test")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r["window_start"], r["event_type"]): r["n"]
        for r in spark.sql("SELECT * FROM slide_test").collect()
    }
    batch = (
        _events(spark, sf_dir)
        .groupBy(F.window("ts", "1 hour", "15 minutes").alias("w"), "event_type")
        .agg(F.count("*").alias("n"))
        .select(F.col("w.start").alias("ws"), "event_type", "n")
    )
    want = {(r["ws"], r["event_type"]): r["n"] for r in batch.collect()}
    assert got == want


def test_stream_dedup_against_index(spark, tmp_path):
    """mode='dedup': continuous ingest-with-dedup. Batch files carry
    in-batch exact dups, cross-batch exact dups, cross-batch NEAR dups
    (one-word perturbations), and fresh docs — only the fresh/first
    copies land; the fingerprint index accumulates so later batches dedup
    against earlier ones; a checkpoint replay adds nothing."""
    from lance_spark.dataset import dataset
    from lance_spark.streaming.sink import write_stream

    base = ("the quick brown fox jumps over the lazy dog and then runs far "
            "away into the deep dark forest tonight")
    # high-jaccard near-dup: last word replaced — perturbs only the final
    # shingles, so the pair deterministically shares an LSH band (verified:
    # signature agreement 15/16). A mid-document replacement at this length
    # can miss all 4 bands — that's LSH recall, not a dedup bug.
    near = base.rsplit(" ", 1)[0] + " yesterday"
    src = str(tmp_path / "in")
    spark.createDataFrame(
        [(0, base), (1, base), (2, "completely different text about spark "
                                   "query engines and distributed joins over parquet tables")],
        "doc_id long, text string",
    ).coalesce(1).write.parquet(src + "/f1")
    spark.createDataFrame(
        [(10, base),            # exact dup of batch-1 doc
         (11, near),            # near dup of batch-1 doc
         (12, "a genuinely novel document mentioning streaming dedup "
              "sinks fingerprint indexes and incremental ingestion")],
        "doc_id long, text string",
    ).coalesce(1).write.parquet(src + "/f2")

    uri, idx_uri = str(tmp_path / "ds"), str(tmp_path / "fpidx")
    sdf = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(src + "/*")
    )
    q = write_stream(
        sdf, uri, str(tmp_path / "ckpt"), mode="dedup",
        dedup_index_uri=idx_uri, text_col="text", id_col="doc_id",
        trigger_available_now=True,
    )
    q.awaitTermination(120)

    got = sorted(r["doc_id"] for r in dataset(uri).to_df(spark).collect())
    # in-batch dup 1 dropped (min doc_id wins), 10 exact-dropped,
    # 11 near-dropped, 12 fresh
    assert got == [0, 2, 12]
    # the index holds exactly the survivors' fingerprints
    idx_ids = {r["id"] for r in dataset(idx_uri).to_df(spark).select("id").distinct().collect()}
    assert idx_ids == {0, 2, 12}

    # replay from the same checkpoint: no new rows, no new index rows
    v_data, v_idx = dataset(uri).version, dataset(idx_uri).version
    q2 = write_stream(
        sdf, uri, str(tmp_path / "ckpt"), mode="dedup",
        dedup_index_uri=idx_uri, text_col="text", id_col="doc_id",
        trigger_available_now=True,
    )
    q2.awaitTermination(120)
    assert sorted(r["doc_id"] for r in dataset(uri).to_df(spark).collect()) == [0, 2, 12]
    assert dataset(uri).version == v_data and dataset(idx_uri).version == v_idx


def test_stream_dedup_crash_between_commits_recovers(spark, tmp_path):
    """The documented replay contract: a crash AFTER the data commit but
    BEFORE the fingerprint commit must, on replay, skip the data append
    and complete the fingerprint append — no duplicate rows, index
    caught up."""
    from lance_spark.dataset import dataset
    from lance_spark.streaming.sink import dataset_batch_writer, dataset_dedup_writer

    uri, idx_uri = str(tmp_path / "ds"), str(tmp_path / "fpidx")
    b0 = spark.createDataFrame(
        [(0, "some reasonably long first document text with many distinct words")],
        "doc_id long, text string",
    )
    w = dataset_dedup_writer(uri, idx_uri, "text", "doc_id")
    w(b0, 0)
    # simulate the torn batch: commit batch 1's DATA via the same writer
    # key, but never its fingerprints (crash window)
    b1 = spark.createDataFrame(
        [(5, "an entirely different second document mentioning parquet manifests")],
        "doc_id long, text string",
    )
    dataset_batch_writer(uri, "default")(b1, 1)
    assert dataset(uri).count_rows() == 2
    idx_before = dataset(idx_uri).to_df(spark).select("id").distinct().count()
    assert idx_before == 1  # batch 1 fingerprints missing

    w(b1, 1)  # foreachBatch replay of the torn batch
    assert dataset(uri).count_rows() == 2  # data append no-oped
    idx_ids = {r["id"] for r in dataset(idx_uri).to_df(spark).select("id").distinct().collect()}
    assert idx_ids == {0, 5}  # fingerprint append completed

    # and batch 2 dedups against the now-complete index
    b2 = spark.createDataFrame(
        [(9, "an entirely different second document mentioning parquet manifests"),
         (10, "fresh third text that matches nothing previously ingested at all")],
        "doc_id long, text string",
    )
    w(b2, 2)
    got = sorted(r["doc_id"] for r in dataset(uri).to_df(spark).collect())
    assert got == [0, 5, 10]


def test_batch_writer_preserves_reserved_watermark(spark, tmp_path):
    """A streaming append must never rewind max_fragment_id below a
    concurrent writer's reservation — the next reservation would hand the
    same ids out again (duplicate fragment ids = rowid corruption)."""
    from lance_spark import manifest as mf
    from lance_spark.streaming.sink import dataset_batch_writer

    uri = str(tmp_path / "ds")
    w = dataset_batch_writer(uri, query_key="wm")
    w(spark.createDataFrame([(1, "a")], "k int, v string"), 0)
    # a parallel writer reserves 10 ids (watermark → start+9), writes nothing yet
    start = mf.reserve_fragment_ids(uri, 10)
    committed = {f.id for f in mf.read_manifest(uri).fragments}
    w(spark.createDataFrame([(2, "b")], "k int, v string"), 1)
    m = mf.read_manifest(uri)
    assert m.max_fragment_id >= start + 9  # reservation survived the append
    # the stream's own batch landed ABOVE the reserved range
    assert all(f.id in committed or f.id > start + 9 for f in m.fragments)
    assert mf.reserve_fragment_ids(uri, 1) > start + 9


def test_upsert_does_not_resurrect_concurrent_delete(spark, tmp_path, monkeypatch):
    """A delete landing between the upsert's uncommitted data work and its
    commit must not be resurrected by rebasing stale fragment metadata —
    the sink recomputes the merge against the fresh snapshot."""
    import lance_spark as ls
    from lance_spark.mutation import MergeInsertBuilder
    from lance_spark.streaming.sink import dataset_upsert_writer

    uri = str(tmp_path / "ds")
    ls.write_dataset(
        spark.createDataFrame([(1, "a"), (2, "b"), (3, "c")], "k int, v string"), uri
    )
    state = {"raced": False}
    orig = MergeInsertBuilder.execute_uncommitted

    def race_once(self, sp, source):
        res = orig(self, sp, source)
        if not state["raced"]:
            state["raced"] = True
            ls.dataset(uri).delete(sp, "k = 1")  # concurrent delete mid-flight
        return res

    monkeypatch.setattr(MergeInsertBuilder, "execute_uncommitted", race_once)
    w = dataset_upsert_writer(uri, "k", query_key="race")
    w(spark.createDataFrame([(2, "B!")], "k int, v string"), 0)
    rows = {r["k"]: r["v"] for r in ls.dataset(uri).to_df(spark).collect()}
    assert rows == {2: "B!", 3: "c"}  # k=1 stays deleted; upsert applied once


def test_batch_writer_propagates_real_commit_failure(spark, tmp_path, monkeypatch):
    """Retries-exhausted contention must PROPAGATE (Spark then retries the
    batch) — swallowing it as a benign replay would advance the checkpoint
    past a batch that never landed (permanent silent data loss)."""
    from lance_spark import manifest as mf
    from lance_spark.streaming.sink import dataset_batch_writer

    uri = str(tmp_path / "ds")
    w = dataset_batch_writer(uri, query_key="fail")
    w(spark.createDataFrame([(1, "a")], "k int, v string"), 0)

    def always_contended(*a, **kw):
        raise mf.CommitConflictError("commit of append failed after 10 retries")

    monkeypatch.setattr(mf, "commit", always_contended)
    with pytest.raises(mf.CommitConflictError):
        w(spark.createDataFrame([(2, "b")], "k int, v string"), 1)

"""Structured Streaming ingest into a versioned dataset + stream operators.

The reference has no streaming engine (SURVEY §2.8) — its closest construct
is the MemWal metadata for an external write-ahead log
(rust/lance-index/src/mem_wal.rs) plus conflict-retried commits. This module
is our Spark-native extension: each micro-batch lands as immutable fragments
followed by one manifest commit, so a streaming query produces exactly the
same on-disk structure as batch writes — readable, time-travelable,
compactable mid-stream.

Exactly-once: foreachBatch may re-run a batch after failure; the committed
manifest records ``stream_state[query_key] = last batch id`` and the writer
skips batches at-or-below it (transactional sink via idempotent commit —
the same trick Delta's foreachBatch idempotency uses, expressed on our
manifest).  Orphan fragment files from a failed attempt stay uncommitted →
invisible → GC'd by cleanup_old_versions, exactly like any aborted write.

Watermark/window helpers wrap the stock Spark operators (window /
session_window / applyInPandas*WithState) — at scale these are
shuffle-on-key stateful aggs with RocksDB-backed state, nothing custom.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from lance_spark import manifest as mf
from lance_spark.write import write_fragments


class _BatchAlreadyCommitted(mf.CommitConflictError):
    """Deliberate no-op: a replay's build saw the batch id already
    recorded. Distinct from the plain CommitConflictError that
    mf.commit raises after exhausting retries under REAL contention —
    swallowing that one would silently drop a whole micro-batch (the
    checkpoint advances, the fragments become orphans)."""


class _DatasetAppearedConcurrently(mf.CommitConflictError):
    """Bootstrap lost the create race — the caller retries against the
    now-existing dataset (with a proper fragment-id reservation)."""


class _StaleMergeBase(Exception):
    """The uncommitted merge's base changed before its commit — the data
    work (deletion sidecars keyed to old fragments) must be recomputed
    against the fresh snapshot, or concurrent deletes resurrect and
    compacted fragments double."""


def dataset_batch_writer(uri: str, query_key: str = "default"):
    """foreachBatch callback: micro-batch → fragments + idempotent commit."""

    def write_batch(batch_df: DataFrame, batch_id: int, _retry: bool = True) -> None:
        import os

        os.makedirs(uri, exist_ok=True)
        latest = mf.latest_version(uri)
        base = mf.read_manifest(uri, latest) if latest is not None else None
        state_key = f"stream_state.{query_key}"
        if base is not None:
            last = int(base.config.get(state_key, -1))
            if batch_id <= last:
                return  # replayed batch — already committed
        created = base is None
        base_fid = (
            mf.reserve_fragment_ids(uri, batch_df.rdd.getNumPartitions())
            if base is not None
            else 0
        )
        frags = write_fragments(batch_df, uri, base_fid)

        def build(b: mf.Manifest | None, version: int) -> mf.Manifest:
            if b is not None and int(b.config.get(state_key, -1)) >= batch_id:
                raise _BatchAlreadyCommitted("batch already committed")
            if created and b is not None:
                # our fragments were numbered from 0 with NO reservation —
                # appending them onto a concurrently-created dataset would
                # duplicate fragment ids (rowid corruption); retry with a
                # reservation against the now-existing dataset
                raise _DatasetAppearedConcurrently("dataset appeared concurrently")
            fragments = (b.fragments if b else []) + frags
            cfg = dict(b.config) if b else {}
            cfg[state_key] = batch_id
            # NEVER rewind the id watermark below the base's: reservations
            # by parallel writers (and this batch's own, when trailing
            # empty partitions wrote no fragment) live only in
            # max_fragment_id — a bare max over committed fragments would
            # hand their ranges out again
            max_fid = max(
                [f.id for f in fragments] + ([b.max_fragment_id] if b else [-1])
            )
            if b is not None:
                # carry forward indices/config/blob_columns from the base
                return mf.Manifest.evolve(
                    b, version, operation="append",
                    fragments=fragments, max_fragment_id=max_fid, config=cfg,
                )
            return mf.Manifest(
                version=version,
                schema_json=batch_df.schema.jsonValue(),
                fragments=fragments,
                max_fragment_id=max_fid,
                operation="append",
                config=cfg,
            )

        try:
            mf.commit(uri, build, operation="append")
        except _BatchAlreadyCommitted:
            pass  # another attempt of this same batch won
        except _DatasetAppearedConcurrently:
            if not _retry:
                raise
            # attempt-1 fragments stay uncommitted → invisible → GC'd
            write_batch(batch_df, batch_id, _retry=False)

    return write_batch


def dataset_upsert_writer(
    uri: str,
    on: str | list[str],
    query_key: str = "upsert",
    sequence_col: str | None = None,
):
    """foreachBatch callback: micro-batch MERGE (upsert) into the dataset —
    the streaming-CDC ingest pattern (a change feed keyed on ``on`` becomes
    a continuously-updated table).

    Each batch is key-deduplicated then routed through
    ``merge_insert(on).when_matched_update_all().when_not_matched_insert_all()``;
    the data work runs uncommitted and the commit both applies the typed
    Update operation and records the batch id in dataset config — ONE
    atomic version per batch, so a replayed micro-batch (checkpoint
    recovery) sees its id already committed and becomes a no-op instead of
    a double-merge. Single upsert stream per dataset (the reference's
    single-writer MERGE assumption); concurrent appends rebase fine.

    ``sequence_col``: when a micro-batch can carry SEVERAL changes for one
    key (the normal CDC case), name the event-order column — the max-
    sequence row per key wins deterministically. Without it, the in-batch
    winner is whichever row dropDuplicates meets first (partition-order
    dependent); only omit it when the feed guarantees ≤1 change per key
    per batch.
    """

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        import os

        from lance_spark.dataset import LanceDataset
        from lance_spark.mutation import MergeInsertBuilder
        from lance_spark.operation import _apply

        spark = batch_df.sparkSession
        state_key = f"stream_state.{query_key}"
        keys = [on] if isinstance(on, str) else list(on)
        if sequence_col is not None:
            from pyspark.sql import Window

            w = Window.partitionBy(*keys).orderBy(F.desc(sequence_col))
            batch = (
                batch_df.withColumn("__rn", F.row_number().over(w))
                .filter("__rn = 1")
                .drop("__rn")
            )
        else:
            batch = batch_df.dropDuplicates(keys)

        latest = mf.latest_version(uri)
        if latest is None:
            # bootstrap: first batch creates the dataset (marker included)
            os.makedirs(uri, exist_ok=True)
            frags = write_fragments(batch, uri, 0)

            def build_create(b: mf.Manifest | None, version: int) -> mf.Manifest:
                if b is not None:
                    raise mf.CommitConflictError("dataset appeared concurrently")
                return mf.Manifest(
                    version=version,
                    schema_json=batch.schema.jsonValue(),
                    fragments=frags,
                    max_fragment_id=max((f.id for f in frags), default=-1),
                    operation="create",
                    config={state_key: batch_id},
                )

            try:
                mf.commit(uri, build_create, operation="create")
                return
            except mf.CommitConflictError:
                pass  # someone else created it — fall through to merge

        for _attempt in range(10):
            ds = LanceDataset(uri)
            if int(ds.manifest.config.get(state_key, -1)) >= batch_id:
                return  # replayed batch — already committed
            # deletion-state snapshot at merge time: the guard below is the
            # same victim recheck mutation.py's committed path performs
            del_snapshot = {f.id: f.deletion_file for f in ds.manifest.fragments}
            res = (
                MergeInsertBuilder(ds, on)
                .when_matched_update_all()
                .when_not_matched_insert_all()
                .execute_uncommitted(spark, batch)
            )
            op = res["transaction"]
            victims = set(getattr(op, "removed_fragment_ids", [])) | {
                f.id for f in getattr(op, "updated_fragments", [])
            }

            def build(b: mf.Manifest | None, version: int) -> mf.Manifest:
                if b is not None and int(b.config.get(state_key, -1)) >= batch_id:
                    raise _BatchAlreadyCommitted("batch already committed")
                live = {} if b is None else {f.id: f.deletion_file for f in b.fragments}
                for vid in victims:
                    if vid not in live or live[vid] != del_snapshot.get(vid):
                        # the merge's deletion sidecars / replacement
                        # fragments were derived from a snapshot whose
                        # victim fragments have since changed (concurrent
                        # delete, compaction): rebasing would resurrect
                        # deleted rows or duplicate keys — recompute the
                        # data work on the fresh snapshot instead.
                        # Unrelated appends/reservations pass untouched.
                        raise _StaleMergeBase()
                m = _apply(op, b, version)
                m.config = {**m.config, state_key: batch_id}
                return m

            try:
                mf.commit(uri, build, operation="update")
                return
            except _BatchAlreadyCommitted:
                return  # a replay of this same batch won the race
            except _StaleMergeBase:
                continue  # base moved under the uncommitted merge — redo it
        raise mf.CommitConflictError(
            "streaming upsert could not commit: base kept changing across"
            " 10 merge recomputes"
        )

    return write_batch


def dataset_dedup_writer(
    uri: str,
    index_uri: str,
    text_col: str,
    id_col: str,
    query_key: str = "default",
    *,
    min_est_jaccard: float = 0.5,
    exact: bool = True,
    near: bool = True,
    num_perm: int | None = None,
    bands: int | None = None,
    shingle_k: int = 3,
):
    """foreachBatch callback: continuous ingest-with-dedup. Every
    micro-batch is (1) exact-deduped WITHIN the batch (first row per
    canonical fingerprint, by min ``id_col``), (2) anti-joined against the
    persisted fingerprint index at ``index_uri`` — exact fp collisions
    and/or minhash-LSH near-duplicates of EVERYTHING already ingested are
    dropped (operators/dedup.dedup_against_index) — and (3) the survivors
    land as fragments in ``uri`` while their fingerprints append to the
    index, so batch N+1 dedups against batch N without ever rescanning
    corpus text. The streaming composition of the incremental-dedup-index
    operator: the 100 TB continuous-crawl ingest path.

    Replay safety: both appends run through the idempotent batch-id
    commit, DATA FIRST. A crash between the two commits replays the
    batch: survivors recompute identically (the index provably hasn't
    seen this batch — its fingerprint append didn't commit), the data
    append no-ops on the recorded batch id, and the fingerprint append
    completes. ``id_col`` must be unique within a batch (it picks the
    in-batch survivor deterministically).

    Scale: per batch, one fingerprint/signature pass over BATCH text only;
    the index contributes fingerprint rows via the banded equi-join (LSH's
    no-all-pairs contract). In-batch NEAR dedup is intentionally not done
    here (the batch self-join is the offline minhash_lsh_pairs job);
    within-batch exact dups ARE dropped."""
    from lance_spark.functions.text import fingerprint
    from lance_spark.operators.dedup import (
        MINHASH_BANDS,
        MINHASH_PERMS,
        _banded_fingerprints,
        dedup_against_index,
    )

    num_perm = MINHASH_PERMS if num_perm is None else num_perm
    bands = MINHASH_BANDS if bands is None else bands
    data_writer = dataset_batch_writer(uri, query_key)
    fp_writer = dataset_batch_writer(index_uri, query_key + ".fp")

    def _committed_batch(u: str, key: str) -> int:
        v = mf.latest_version(u)
        if v is None:
            return -1
        return int(mf.read_manifest(u, v).config.get(f"stream_state.{key}", -1))

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        from lance_spark.dataset import dataset as open_dataset

        spark = batch_df.sparkSession
        # replay short-circuit: when BOTH commits already recorded this
        # batch (normal checkpoint-recovery case), skip the dedup joins and
        # the eager checkpoint entirely — two manifest reads instead of the
        # dominant per-batch cost. The full recompute below runs only when
        # the fingerprint append is the one missing (crash between commits).
        if (
            _committed_batch(uri, query_key) >= batch_id
            and _committed_batch(index_uri, query_key + ".fp") >= batch_id
        ):
            return
        keep = (
            batch_df.select(
                F.col(id_col).alias("__kid"), fingerprint(F.col(text_col)).alias("__fp")
            )
            .groupBy("__fp")
            .agg(F.min("__kid").alias("__kid"))
            .select("__kid")
        )
        batch = batch_df.join(
            keep.withColumnRenamed("__kid", id_col), id_col, "left_semi"
        )
        if mf.latest_version(index_uri) is not None:
            survivors = dedup_against_index(
                batch, text_col, id_col, open_dataset(index_uri), spark,
                min_est_jaccard=min_est_jaccard, exact=exact, near=near,
                num_perm=num_perm, bands=bands, shingle_k=shingle_k,
            )
        else:
            survivors = batch
        # materialize once: the data append and the fingerprint append must
        # see the same survivor set without re-running the dedup joins
        survivors = survivors.localCheckpoint(eager=True)
        data_writer(survivors, batch_id)
        fps = _banded_fingerprints(
            survivors, text_col, id_col, num_perm, bands, shingle_k
        )
        fp_writer(fps, batch_id)

    return write_batch


def write_stream(
    sdf: DataFrame,
    uri: str,
    checkpoint_dir: str,
    query_key: str = "default",
    trigger_available_now: bool = False,
    processing_time: str | None = None,
    mode: str = "append",
    on: str | list[str] | None = None,
    sequence_col: str | None = None,
    dedup_index_uri: str | None = None,
    text_col: str | None = None,
    id_col: str | None = None,
    output_mode: str = "append",
    **dedup_opts,
):
    """readStream → ... → write_stream(df, dataset_uri, ckpt): start the
    streaming write into the dataset. ``mode="append"`` adds fragments;
    ``mode="upsert"`` merges each micro-batch on key ``on`` (CDC ingest;
    pass ``sequence_col`` when a batch may hold several changes per key);
    ``mode="dedup"`` appends only rows that duplicate neither earlier
    batches nor the existing corpus (requires ``dedup_index_uri``,
    ``text_col``, ``id_col``; extra keyword options — min_est_jaccard,
    exact, near, num_perm, bands, shingle_k — pass through to
    dataset_dedup_writer). ``output_mode`` reaches the stream writer:
    update-mode stateful operators need ``output_mode="update"``."""
    if mode == "upsert":
        if not on:
            raise ValueError("mode='upsert' requires the merge key(s) in `on`")
        writer = dataset_upsert_writer(uri, on, query_key, sequence_col)
    elif mode == "dedup":
        if not (dedup_index_uri and text_col and id_col):
            raise ValueError(
                "mode='dedup' requires dedup_index_uri, text_col and id_col"
            )
        writer = dataset_dedup_writer(
            uri, dedup_index_uri, text_col, id_col, query_key, **dedup_opts
        )
    elif mode == "append":
        writer = dataset_batch_writer(uri, query_key)
    else:
        raise ValueError(f"unknown stream write mode {mode!r}")
    if dedup_opts and mode != "dedup":
        raise ValueError(f"dedup options {sorted(dedup_opts)} require mode='dedup'")
    w = (
        sdf.writeStream.foreachBatch(writer)
        .option("checkpointLocation", checkpoint_dir)
        # update-mode stateful operators (running_counts_stateful & friends
        # declare outputMode='update') cannot start under a hardcoded
        # 'append' — the caller picks
        .outputMode(output_mode)
    )
    if trigger_available_now:
        w = w.trigger(availableNow=True)
    elif processing_time:
        w = w.trigger(processingTime=processing_time)
    return w.start()


# ------------------------------------------------------------ stream operators


def _watermarkable(sdf: DataFrame, ts_col: str) -> DataFrame:
    """Watermarks require TIMESTAMP (LTZ); parquet micros without UTC
    adjustment arrive as TIMESTAMP_NTZ under Spark 4's inference. Cast
    (identity under a UTC session tz) so every helper below accepts both."""
    if dict(sdf.dtypes).get(ts_col) == "timestamp_ntz":
        return sdf.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
    return sdf


def tumbling_agg(
    sdf: DataFrame,
    ts_col: str,
    window: str = "1 hour",
    watermark: str = "30 minutes",
    keys: list[str] | None = None,
    aggs: list | None = None,
    slide: str | None = None,
) -> DataFrame:
    """Watermarked tumbling-window aggregation (late data beyond the
    watermark is dropped; state is bounded). ``slide`` turns it into a
    sliding (hopping) window: each event lands in window/slide overlapping
    windows — state grows by the same factor, still watermark-bounded."""
    aggs = aggs or [F.count("*").alias("n")]
    w = F.window(ts_col, window, slide) if slide else F.window(ts_col, window)
    out = (
        _watermarkable(sdf, ts_col).withWatermark(ts_col, watermark)
        .groupBy(w.alias("w"), *(keys or []))
        .agg(*aggs)
    )
    agg_cols = [c for c in out.columns if c != "w" and c not in (keys or [])]
    return out.select(
        F.col("w.start").alias("window_start"),
        F.col("w.end").alias("window_end"),
        *(keys or []),
        *agg_cols,
    )


def session_agg(
    sdf: DataFrame,
    ts_col: str,
    gap: str = "30 minutes",
    watermark: str = "30 minutes",
    keys: list[str] | None = None,
) -> DataFrame:
    """Session-window aggregation (gap-based sessions, built-in
    session_window — the stateful operator Spark provides natively)."""
    return (
        _watermarkable(sdf, ts_col).withWatermark(ts_col, watermark)
        .groupBy(F.session_window(ts_col, gap).alias("w"), *(keys or []))
        .agg(F.count("*").alias("n_events"))
        .select(
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            *(keys or []),
            "n_events",
        )
    )


def running_counts_stateful(sdf: DataFrame, key_col: str) -> DataFrame:
    """Custom stateful operator via applyInPandasWithState: per-key running
    event count that survives across micro-batches (the shape a bespoke
    stream accumulator takes when window()/session_window() can't express
    it)."""
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    def update(key, pdf_iter, state: GroupState):
        n = sum(len(pdf) for pdf in pdf_iter)
        total = (state.get[0] if state.exists else 0) + n
        state.update((total,))
        yield pd.DataFrame({"key": [key[0]], "total": [total]})

    return (
        sdf.groupBy(key_col)
        .applyInPandasWithState(
            update,
            outputStructType="key string, total long",
            stateStructType="total long",
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def streaming_dedup(
    sdf: DataFrame,
    key_cols: list[str],
    ts_col: str,
    watermark: str = "30 minutes",
) -> DataFrame:
    """Streaming exact dedup: keep the first event per key, dropping
    replays that arrive within the watermark horizon.

    ``dropDuplicatesWithinWatermark`` bounds the dedup state to the
    watermark window — the property that makes stream dedup viable at
    100 TB/day ingest (an unbounded ``dropDuplicates`` key set grows
    forever). Exactly-once sinks compose with dataset_batch_writer's
    idempotent-commit query key."""
    return (
        _watermarkable(sdf, ts_col)
        .withWatermark(ts_col, watermark)
        .dropDuplicatesWithinWatermark(key_cols)
    )

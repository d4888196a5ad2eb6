"""Batch-UDF surface for ``add_columns``: declared output schema +
resumable checkpointing.

Reference surface: python/python/lance/udf.py:24-166 — ``@batch_udf
(output_schema=..., checkpoint_file=...)`` wraps a batch function so an
interrupted ``add_columns`` can resume without recomputing finished
batches (there: per-batch results in a SQLite sidecar).

Spark-first HOW: within one run, task retries already re-run failed
batches (lineage), so the durable unit here is the FRAGMENT — the same
granularity the reference commits (one new DataFile per fragment).
``add_columns`` writes each fragment's column-group file, then drops a
JSON marker in the checkpoint directory; a rerun skips every marked
fragment BEFORE the UDF runs (a pushed-down fragment-id filter), computes
only the remainder, and commits the union. Fragment markers are
O(fragments) driver metadata — nothing about this path scales with rows.
"""

from __future__ import annotations

import json
import os

from pyspark.sql.types import StructType


class BatchUDF:
    """Wraps ``fn(pandas.DataFrame) -> pandas.DataFrame`` for add_columns.

    ``output_schema`` (Spark StructType, DDL string, or pyarrow Schema)
    skips the one-row probe — required when ``fn`` can't run on a
    single-row sample (e.g. model batching). ``checkpoint_file`` names a
    directory holding per-fragment completion markers.
    """

    def __init__(self, func, output_schema=None, checkpoint_file: str | None = None):
        self.func = func
        self.output_schema = _as_spark_schema(output_schema)
        self.checkpoint_file = checkpoint_file
        self.__name__ = getattr(func, "__name__", "batch_udf")

    def __call__(self, pdf):
        return self.func(pdf)


def batch_udf(output_schema=None, checkpoint_file: str | None = None):
    """Decorator form (udf.py:61-93): ``@batch_udf(output_schema=...)``."""

    def inner(func):
        return BatchUDF(func, output_schema=output_schema, checkpoint_file=checkpoint_file)

    return inner


def _as_spark_schema(schema) -> StructType | None:
    if schema is None or isinstance(schema, StructType):
        return schema
    if isinstance(schema, str):
        return StructType.fromDDL(schema)
    try:
        import pyarrow as pa

        if isinstance(schema, pa.Schema):
            from pyspark.sql.pandas.types import from_arrow_schema

            return from_arrow_schema(schema)
    except ImportError:
        pass
    raise TypeError(f"output_schema must be StructType, DDL string, or pyarrow Schema, got {type(schema)}")


class FragmentCheckpoint:
    """Per-fragment completion markers: ``<dir>/frag-<id>.json`` holding the
    committed column-group file's relative path and row count."""

    def __init__(self, path: str):
        self.path = path
        os.makedirs(path, exist_ok=True)

    def _marker(self, fragment_id: int) -> str:
        return os.path.join(self.path, f"frag-{fragment_id}.json")

    def get(self, fragment_id: int) -> dict | None:
        try:
            with open(self._marker(fragment_id)) as f:
                return json.load(f)
        except FileNotFoundError:
            return None
        except json.JSONDecodeError:
            return None  # torn marker: treat as not-done, the work re-runs

    def put(
        self, fragment_id: int, rel_path: str, num_rows: int,
        columns: list[str] | None = None,
    ) -> None:
        import uuid

        # unique temp name per attempt: concurrent task attempts
        # (speculation / zombie retry) writing one shared '.tmp' would
        # interleave bytes and os.replace could promote a torn marker (r12)
        tmp = self._marker(fragment_id) + f".tmp-{uuid.uuid4().hex}"
        with open(tmp, "w") as f:
            json.dump(
                {"path": rel_path, "num_rows": num_rows, "columns": columns}, f
            )
        os.replace(tmp, self._marker(fragment_id))

    def done(self, expected_columns: list[str] | None = None) -> dict[int, dict]:
        """Committed markers — optionally ONLY those recorded for
        ``expected_columns``. A checkpoint directory reused across two
        different add_columns runs would otherwise resume from the FIRST
        run's markers: every fragment gets filtered out before the new UDF
        runs, and the old files (holding the OLD column) commit as the new
        column's data files — bricking every later read of it."""
        out = {}
        for name in os.listdir(self.path):
            if not (name.startswith("frag-") and name.endswith(".json")):
                continue
            mid = name[len("frag-"):-len(".json")]
            if not mid.isdigit():
                continue  # stray file (editor artifact); never abort resume
            try:
                with open(os.path.join(self.path, name)) as f:
                    info = json.load(f)
            except (json.JSONDecodeError, OSError):
                continue  # torn marker (crashed writer): redo that fragment
            if expected_columns is not None and info.get("columns") != list(
                expected_columns
            ):
                continue  # stale marker from a DIFFERENT operation
            out[int(mid)] = info
        return out

    def cleanup(self) -> None:
        import shutil

        shutil.rmtree(self.path, ignore_errors=True)


class BatchUDFCheckpoint:
    """SQLite-backed cache of per-batch UDF results and fully-written (but
    uncommitted) fragments (reference udf.py:96-166 — byte-for-byte the
    same table layout, so external tooling written against the reference's
    checkpoint DB reads ours). Connections are never reused: sqlite3
    connections aren't thread-safe and fragment tasks run concurrently."""

    class BatchInfo:
        def __init__(self, fragment_id: int, batch_index: int):
            self.fragment_id = fragment_id
            self.batch_index = batch_index

    def _connect(self):
        """Fresh connection per call (sqlite3 connections aren't
        thread-safe) with WAL + a generous busy timeout so concurrent
        fragment tasks block instead of failing with 'database is locked'.
        Callers close via contextlib.closing — each method previously
        leaked a connection per call."""
        import sqlite3

        conn = sqlite3.connect(self.path, timeout=60.0)
        conn.execute("PRAGMA journal_mode=WAL")
        return conn

    def __init__(self, path: str):
        from contextlib import closing

        self.path = path
        with closing(self._connect()) as conn:
            # PRIMARY KEYs make retried inserts idempotent: a Spark task
            # retry would otherwise duplicate rows and get_batch returned
            # an arbitrary one (non-deterministic UDFs could then resume
            # with a result that differs from what was already written)
            conn.execute(
                "CREATE TABLE IF NOT EXISTS batches"
                " (fragment_id INT, batch_index INT, result BLOB,"
                " PRIMARY KEY (fragment_id, batch_index))"
            )
            conn.execute(
                "CREATE TABLE IF NOT EXISTS fragments"
                " (fragment_id INT PRIMARY KEY, data BLOB)"
            )
            conn.commit()

    def cleanup(self) -> None:
        os.remove(self.path)

    def get_batch(self, info: "BatchUDFCheckpoint.BatchInfo"):
        import pickle
        from contextlib import closing

        with closing(self._connect()) as conn:
            row = conn.execute(
                "SELECT result FROM batches WHERE fragment_id = ? AND batch_index = ?",
                (info.fragment_id, info.batch_index),
            ).fetchone()
        return pickle.loads(row[0]) if row is not None else None

    def insert_batch(self, info: "BatchUDFCheckpoint.BatchInfo", batch) -> None:
        import pickle
        from contextlib import closing

        with closing(self._connect()) as conn:
            conn.execute(
                "INSERT OR REPLACE INTO batches (fragment_id, batch_index, result)"
                " VALUES (?, ?, ?)",
                (info.fragment_id, info.batch_index, pickle.dumps(batch)),
            )
            conn.commit()

    def get_fragment(self, fragment_id: int) -> str | None:
        from contextlib import closing

        with closing(self._connect()) as conn:
            row = conn.execute(
                "SELECT data FROM fragments WHERE fragment_id = ?", (fragment_id,)
            ).fetchone()
        return row[0] if row is not None else None

    def insert_fragment(self, fragment_id: int, fragment: str) -> None:
        from contextlib import closing

        with closing(self._connect()) as conn:
            conn.execute(
                "INSERT OR REPLACE INTO fragments (fragment_id, data) VALUES (?, ?)",
                (fragment_id, fragment),
            )
            conn.execute("DELETE FROM batches WHERE fragment_id = ?", (fragment_id,))
            conn.commit()


def _fragment_head(ds, frag, columns, n: int = 64):
    """First ``n`` rows of a fragment's requested columns with BOUNDED IO:
    one parquet batch per owning column-group file (files are row-aligned
    by construction; a schema probe needs representative values, not the
    deletion-filtered row set)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    want = list(columns) if columns else None
    pieces, got = [], set()
    for fobj in frag.files:
        cols = [
            c for c in fobj.columns
            if (want is None or c in want) and c not in got and c != "_rowid"
        ]
        if not cols:
            continue
        pf = pq.ParquetFile(ds._abs(fobj.path))
        batch = next(pf.iter_batches(batch_size=n, columns=cols), None)
        if batch is not None:
            pieces.append(pa.Table.from_batches([batch]))
            got.update(cols)
    if want is not None:
        missing = [c for c in want if c not in got]
        if missing:
            raise KeyError(f"columns not in fragment {frag.id}: {missing}")
    if not pieces:
        raise ValueError(f"fragment {frag.id} has no readable columns")
    m = min(p.num_rows for p in pieces)
    out = {}
    for p in pieces:
        for name in p.column_names:
            out[name] = p.column(name).slice(0, m)
    return pa.table(out)


def normalize_transform(udf_like, data_source, read_columns=None, reader_schema=None):
    """Canonicalize an add_columns transform (reference udf.py:168-230):
    a ``{name: sql_expr}`` dict passes through; a BatchUDF with no declared
    output schema gets it INFERRED by running the UDF on one real batch of
    ``data_source`` (pyarrow-native read — no SparkSession needed); a bare
    callable is wrapped as a BatchUDF first; anything else is treated as a
    reader and returned as-is."""
    if isinstance(udf_like, dict):
        return udf_like
    if callable(udf_like) and not isinstance(udf_like, BatchUDF):
        udf_like = BatchUDF(udf_like, None, None)
    if isinstance(udf_like, BatchUDF):
        if udf_like.output_schema is None:
            ds = getattr(data_source, "_ds", data_source)
            frags = ds.manifest.fragments
            if not frags:
                raise ValueError("cannot infer UDF output schema on an empty dataset")
            if read_columns is None and reader_schema is not None:
                # the declared reader schema names the columns the UDF
                # consumes — previously accepted and silently ignored
                read_columns = [f.name for f in reader_schema]
            # BOUNDED probe: first parquet batch per column-group file, not
            # a full-fragment read (a 1M-row fragment with a wide binary
            # column materialized GBs on the driver for a 64-row sample;
            # r12 review fix). NOTE: evolution.add_columns keeps its own
            # Spark-native 1-row probe — this is the reference-parity
            # pyarrow surface (reference udf.py:168-230).
            sample = _fragment_head(ds, frags[0], read_columns, n=64)
            out = udf_like(sample.to_pandas())  # our BatchUDF is pandas-in/out
            import pyarrow as pa

            udf_like.output_schema = _as_spark_schema(
                pa.Schema.from_pandas(out, preserve_index=False)
            )
        return udf_like
    return udf_like  # ReaderLike passes through; schema declared by reader

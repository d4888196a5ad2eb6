"""Spark Python DataSource for lance_spark datasets: ``format("lance")``.

The reference exposes the dataset to engines through a TableProvider with
exact filter/projection/limit pushdown (rust/lance/src/datafusion/
dataframe.rs:97-158); Spark's native equivalent is the DataSource V2
protocol, reached from Python via ``pyspark.sql.datasource``. This module
implements it for real:

  - READ:  one InputPartition per fragment (the unit of parallelism,
    fragment.rs:276-303) → Arrow record batches via pyarrow, with supported
    filters pushed into the parquet scan (``pushFilters``) and deletion
    files applied per fragment. A 1000-executor cluster gets fragment-count
    parallelism with zero driver involvement beyond the partition list.
  - WRITE: Spark's two-phase commit protocol IS the reference's distributed
    write (fragment.py:889 write_fragments + dataset.py:3059 commit):
    executors write fragment files and return fragment metadata as
    WriterCommitMessages; the driver commits one manifest. Task retries
    leave invisible uncommitted files — same crash-safety argument.
  - STREAM READ: manifest versions are the offsets — each micro-batch reads
    the fragments added by newly committed versions (a change-data feed for
    append workloads; the reference has no streaming, SURVEY §2.8).

Usage::

    spark.dataSource.register(LanceDataSource)
    spark.read.format("lance").option("uri", path).load()
    df.write.format("lance").option("uri", path).mode("append").save()
    spark.readStream.format("lance").option("uri", path).load()
"""

from __future__ import annotations

import os
import uuid
from dataclasses import dataclass

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    DataSourceWriter,
    EqualTo,
    GreaterThan,
    GreaterThanOrEqual,
    In,
    InputPartition,
    IsNotNull,
    IsNull,
    LessThan,
    LessThanOrEqual,
    WriterCommitMessage,
)
from pyspark.sql.types import StructType

from lance_spark.write import FRAGID_SHIFT, ROWID_COL


@dataclass
class FragmentPartition(InputPartition):
    files: list[str]  # absolute paths, column groups in order
    deletion_file: str | None
    filters: tuple = ()
    columns: tuple = ()  # declared output column order


@dataclass
class FragmentCommit(WriterCommitMessage):
    fragment_id: int
    path: str
    physical_rows: int


def _to_arrow_filter(f):
    """Translate a Spark DS filter to a pyarrow dataset expression (only
    called for filter types we accepted in pushFilters)."""
    import pyarrow.dataset as pds

    col = pds.field(f.attribute[0])
    if isinstance(f, EqualTo):
        return col == f.value
    if isinstance(f, GreaterThan):
        return col > f.value
    if isinstance(f, GreaterThanOrEqual):
        return col >= f.value
    if isinstance(f, LessThan):
        return col < f.value
    if isinstance(f, LessThanOrEqual):
        return col <= f.value
    if isinstance(f, In):
        return col.isin(list(f.value))
    if isinstance(f, IsNull):
        return col.is_null()
    if isinstance(f, IsNotNull):
        return ~col.is_null()
    raise AssertionError(f"unexpected filter {f}")


_SUPPORTED = (EqualTo, GreaterThan, GreaterThanOrEqual, LessThan, LessThanOrEqual, In, IsNull, IsNotNull)


def _fragment_table(partition: FragmentPartition):
    """One fragment → a pyarrow Table in the DECLARED column order: column
    groups zip on ``_rowid``, deletion sidecars anti-join, pushed filters
    apply per file (only to columns that file carries). Shared by the batch
    and stream readers — the stream previously CONCATENATED multi-file
    fragments instead of zipping, yielding wrong columns."""
    import pyarrow.dataset as pds
    import pyarrow.parquet as pq

    tables = []
    for path in partition.files:
        schema_cols = set(pq.read_schema(path).names)
        file_expr = None
        for f in partition.filters:
            if f.attribute[0] in schema_cols:
                e = _to_arrow_filter(f)
                file_expr = e if file_expr is None else (file_expr & e)
        tables.append(pds.dataset(path, format="parquet").to_table(filter=file_expr))
    # column-group zip on _rowid (DataFile alignment, fragment.rs:27)
    table = tables[0]
    for t in tables[1:]:
        size_cols = [c for c in t.column_names if c.endswith("_size")]
        table = table.join(t.drop_columns(size_cols), keys=ROWID_COL, join_type="inner")
    if partition.deletion_file:
        dels = pq.read_table(partition.deletion_file, columns=[ROWID_COL])
        table = table.join(dels, keys=ROWID_COL, join_type="left anti")
    # DECLARED order, not join order: Spark consumes Arrow columns
    # POSITIONALLY, so a blob dataset's [primary..., blob] join order would
    # land data in the wrong columns
    if partition.columns:
        table = table.select([c for c in partition.columns if c in table.column_names])
    else:
        table = table.drop_columns([ROWID_COL])
    return table


class LanceReader(DataSourceReader):
    """Fragment-parallel reader WITHOUT a ``pushFilters`` override.

    Spark 4 hard-errors (DATA_SOURCE_PUSHDOWN_DISABLED) when a reader
    implements ``pushFilters`` while ``spark.sql.python.filterPushdown.
    enabled`` is false — and false is the DEFAULT, so a vanilla session
    would crash on every ``format("lance")`` read. The pushdown override
    therefore lives on the :class:`LancePushdownReader` subclass, selected
    by ``LanceDataSource.reader()`` only when pushdown is known-enabled;
    this base class always plans, merely letting Spark post-filter."""

    def __init__(self, uri: str, version: int | None, schema: StructType | None = None):
        self.uri = uri
        self.version = version
        self.columns = tuple(schema.fieldNames()) if schema is not None else ()
        self._filters: list = []

    def partitions(self):
        from lance_spark import manifest as mf

        m = mf.read_manifest(self.uri, self.version)
        out = []
        for frag in m.fragments:
            out.append(
                FragmentPartition(
                    files=[os.path.join(self.uri, f.path) for f in frag.files],
                    deletion_file=(
                        os.path.join(self.uri, frag.deletion_file) if frag.deletion_file else None
                    ),
                    filters=tuple(self._filters),
                    columns=self.columns,
                )
            )
        # PySpark substitutes [None] for an empty partition list; a sentinel
        # empty partition keeps read() on OUR types (a zero-fragment dataset
        # otherwise crashed with 'NoneType has no attribute filters')
        return out or [FragmentPartition(files=[], deletion_file=None, columns=self.columns)]

    def read(self, partition: FragmentPartition):
        if partition is None or not partition.files:
            return
        table = _fragment_table(partition)
        for batch in table.to_batches(max_chunksize=65536):
            yield batch


class LancePushdownReader(LanceReader):
    """LanceReader + exact filter pushdown. Only instantiated when
    ``spark.sql.python.filterPushdown.enabled`` is known to be true
    (Spark asserts if this class is returned while the conf is off)."""

    def pushFilters(self, filters):  # noqa: N802 - API name
        """Exact pushdown for sargable single-column predicates (the
        TableProvider role); the rest go back to Spark for post-filtering."""
        for f in filters:
            if isinstance(f, In) and any(v is None for v in f.value):
                # pyarrow isin matches null-to-null; SQL IN treats NULL as
                # never-true — hand it back rather than push wrong semantics
                yield f
            elif isinstance(f, _SUPPORTED) and len(getattr(f, "attribute", ())) == 1:
                self._filters.append(f)
            else:
                yield f


class LanceWriter(DataSourceWriter):
    def __init__(self, uri: str, overwrite: bool, schema: StructType | None = None):
        self.uri = uri
        self.overwrite = overwrite
        # the DECLARED write schema: batches cast to it (per-row inference
        # crashed on nulls/nested types and drifted integer widths), and an
        # empty write still commits a real schema_json
        self.schema = schema

    def write(self, iterator):
        """Executor side: one fragment per task (two-phase distributed
        write). Fragment id is finalized at commit; the file carries a
        placeholder id derived from the partition to stay unique.

        Spark hands an Iterator[Row]: rows buffer into sized chunks and
        convert with the DECLARED arrow schema — one RecordBatch per chunk,
        nested Rows handled by asDict(recursive=True)."""
        import pyarrow as pa
        import pyarrow.parquet as pq
        from pyspark import TaskContext
        from pyspark.sql.pandas.types import to_arrow_schema

        part_id = TaskContext.get().partitionId()
        rel = os.path.join("data", f"frag-w-{part_id}-{uuid.uuid4().hex}.parquet")
        abs_path = os.path.join(self.uri, rel)
        os.makedirs(os.path.dirname(abs_path), exist_ok=True)
        arrow_schema = to_arrow_schema(self.schema) if self.schema is not None else None
        out_schema = (
            arrow_schema.append(pa.field(ROWID_COL, pa.int64()))
            if arrow_schema is not None
            else None
        )
        writer = None
        offset = 0
        buf: list[dict] = []

        def flush():
            nonlocal writer, offset
            if not buf:
                return
            import numpy as np

            if arrow_schema is not None:
                batch = pa.RecordBatch.from_pylist(buf, schema=arrow_schema)
            else:
                batch = pa.RecordBatch.from_pylist(buf)
            rowids = pa.array(np.arange(offset, offset + batch.num_rows, dtype=np.int64))
            batch = pa.RecordBatch.from_arrays(
                list(batch.columns) + [rowids],
                schema=out_schema or batch.schema.append(pa.field(ROWID_COL, pa.int64())),
            )
            if writer is None:
                writer = pq.ParquetWriter(abs_path, batch.schema, compression="zstd")
            writer.write_batch(batch)
            offset += batch.num_rows
            buf.clear()

        for row in iterator:
            buf.append(row.asDict(recursive=True))
            if len(buf) >= 8192:
                flush()
        flush()
        if writer is not None:
            writer.close()
        return FragmentCommit(fragment_id=part_id, path=rel, physical_rows=offset)

    def commit(self, messages):
        """Driver side: one manifest commit referencing all task outputs —
        rowids are rebased to fragment_id<<32|offset. Fragment ids are
        RESERVED up front on appends, so the per-file rebase runs ONCE per
        attempt. Append-ness is RE-DERIVED inside the commit closure: if
        another writer creates the dataset between the latest_version probe
        and our commit, the closure raises and the whole attempt reruns as
        a true append (fresh id reservation, rowid re-rebase — the masked
        OR makes the rebase idempotent), mirroring write.py's
        _DatasetAppearedConcurrently handling. On append, file tables are
        CAST to the dataset's declared types (nullability-preserving), so a
        type-drifted append (int→long, long→string) either lands with the
        manifest's types or fails loudly at commit — never a mixed-type
        dataset that bricks later scans."""
        import pyarrow.parquet as pq

        from lance_spark import manifest as mf
        from lance_spark.write import _DatasetAppearedConcurrently

        frags_meta = sorted(
            (m for m in messages if m is not None and m.physical_rows > 0),
            key=lambda x: x.fragment_id,
        )
        os.makedirs(self.uri, exist_ok=True)
        existing_version = mf.latest_version(self.uri)
        appending = existing_version is not None and not self.overwrite
        while True:
            try:
                self._commit_attempt(frags_meta, appending)
                return
            except _DatasetAppearedConcurrently:
                if self.overwrite:
                    raise  # unreachable: overwrite never raises the sentinel
                appending = True  # lost the bootstrap race → true append

    def _commit_attempt(self, frags_meta, appending: bool):
        import numpy as np
        import pyarrow as pa
        import pyarrow.parquet as pq

        from lance_spark import manifest as mf
        from lance_spark.write import _DatasetAppearedConcurrently

        cast_schema = None
        if appending:
            base_m = mf.read_manifest(self.uri)
            declared = [f.name for f in self.schema.fields] if self.schema else None
            base_names = [f["name"] for f in base_m.schema_json["fields"]]
            if declared is not None and declared != base_names:
                # an unvalidated append would register fragments whose files
                # carry different columns under the old schema — one bad
                # append bricks every later scan (write.py raises the same)
                raise ValueError(
                    f"append schema mismatch: dataset has {base_names}, "
                    f"write has {declared}"
                )
            from pyspark.sql.pandas.types import to_arrow_schema
            from pyspark.sql.types import StructType

            cast_schema = to_arrow_schema(StructType.fromJson(base_m.schema_json))
            base_fid = mf.reserve_fragment_ids(self.uri, max(len(frags_meta), 1))
        else:
            base_fid = 0

        schema_json = self.schema.jsonValue() if self.schema is not None else None
        new_frags = []
        for i, m in enumerate(frags_meta):
            fid = base_fid + i
            abs_path = os.path.join(self.uri, m.path)
            t = pq.read_table(abs_path)
            # mask off any previous prefix before OR-ing so the rebase is
            # idempotent across task retries AND across a lost-race rerun
            rid = pa.array(
                (np.asarray(t[ROWID_COL]) & np.int64((1 << FRAGID_SHIFT) - 1))
                | np.int64(fid << FRAGID_SHIFT)
            )
            if cast_schema is not None:
                data = t.drop_columns([ROWID_COL])
                try:
                    data = data.cast(cast_schema)
                except (pa.ArrowInvalid, pa.ArrowNotImplementedError, ValueError) as exc:
                    raise ValueError(
                        f"append type mismatch: cannot cast write schema "
                        f"{data.schema} to dataset schema {cast_schema}: {exc}"
                    ) from exc
                t = data.append_column(ROWID_COL, rid)
            else:
                t = t.set_column(t.column_names.index(ROWID_COL), ROWID_COL, rid)
            pq.write_table(t, abs_path, compression="zstd")
            cols = [c for c in t.column_names if c != ROWID_COL]
            if schema_json is None:
                from pyspark.sql.pandas.types import from_arrow_schema

                schema_json = from_arrow_schema(
                    pa.schema([f for f in t.schema if f.name != ROWID_COL])
                ).jsonValue()
            new_frags.append(
                mf.Fragment(
                    id=fid,
                    files=[mf.DataFile(path=m.path, columns=cols)],
                    physical_rows=m.physical_rows,
                )
            )
        if schema_json is None:
            raise ValueError(
                "cannot commit an empty write without a declared schema"
            )

        def build(base: mf.Manifest | None, version: int) -> mf.Manifest:
            if appending:
                assert base is not None
                fragments = list(base.fragments) + new_frags
                return mf.Manifest.evolve(
                    base, version, operation="append",
                    fragments=fragments,
                    max_fragment_id=max(
                        [f.id for f in fragments] + [base.max_fragment_id]
                    ),
                )
            if base is not None and not self.overwrite:
                # another writer created the dataset between the probe and
                # this commit: our fragments are numbered from 0 and would
                # silently drop the concurrent creator's committed data
                raise _DatasetAppearedConcurrently(self.uri)
            return mf.Manifest(
                version=version,
                schema_json=schema_json,
                fragments=new_frags,
                max_fragment_id=max((f.id for f in new_frags), default=-1),
                operation="overwrite" if self.overwrite else "append",
            )

        mf.commit(self.uri, build, operation="overwrite" if self.overwrite else "append")

    def abort(self, messages):
        for m in messages or []:
            if m is not None:
                try:
                    os.unlink(os.path.join(self.uri, m.path))
                except OSError:
                    pass


#: manifest operations that only ADD rows — safe for the version-tailing
#: stream to diff by fragment id
_STREAM_SAFE_OPS = {
    "create", "append", "create_index", "update_config", "reserve_fragments",
    "add_columns", "alter_columns", "drop_columns", "merge",
}


class LanceStreamReader(DataSourceStreamReader):
    """Version-tailing stream: offset = manifest version; each batch reads
    fragments that appeared between the two versions (append CDC)."""

    def __init__(self, uri: str, schema: StructType | None = None):
        self.uri = uri
        self.columns = tuple(schema.fieldNames()) if schema is not None else ()

    def initialOffset(self):  # noqa: N802
        return {"version": 0}

    def latestOffset(self):  # noqa: N802
        from lance_spark import manifest as mf

        return {"version": mf.latest_version(self.uri) or 0}

    def partitions(self, start, end):
        from lance_spark import manifest as mf

        v0, v1 = start["version"], end["version"]
        if v1 <= v0:
            return [FragmentPartition(files=[], deletion_file=None)]
        # the id-diff is only sound across append-shaped commits: an
        # overwrite reuses fragment ids from 0 (its rows would silently
        # never stream) and a rewrite's fresh ids hold OLD rows (replayed
        # as duplicates) — refuse loudly instead
        for v in range(v0 + 1, v1 + 1):
            try:
                op = mf.read_manifest(self.uri, v).operation
            except FileNotFoundError:
                continue  # GC'd intermediate version: assume append-shaped
            if op not in _STREAM_SAFE_OPS:
                raise ValueError(
                    f"lance stream cannot continue across a {op!r} commit "
                    f"(version {v}): restart the stream from a fresh "
                    "checkpoint to re-snapshot"
                )
        old_ids = set()
        if v0 > 0:
            old_ids = {f.id for f in mf.read_manifest(self.uri, v0).fragments}
        new = [f for f in mf.read_manifest(self.uri, v1).fragments if f.id not in old_ids]
        return [
            FragmentPartition(
                files=[os.path.join(self.uri, df.path) for df in f.files],
                deletion_file=None,  # CDC reads raw appends
                columns=self.columns,
            )
            for f in new
        ] or [FragmentPartition(files=[], deletion_file=None)]

    def read(self, partition: FragmentPartition):
        if partition is None or not partition.files:
            return
        table = _fragment_table(partition)
        for batch in table.to_batches(max_chunksize=65536):
            yield batch

    def commit(self, end):
        pass


class LanceDataSource(DataSource):
    """spark.dataSource.register(LanceDataSource) → format("lance")."""

    @classmethod
    def name(cls):
        return "lance"

    def schema(self):
        from lance_spark import manifest as mf

        uri = self.options["uri"]
        version = self.options.get("version")
        m = mf.read_manifest(uri, int(version) if version else None)
        return StructType.fromJson(m.schema_json)

    def reader(self, schema: StructType):
        version = self.options.get("version")
        cls = LancePushdownReader if self._pushdown_enabled() else LanceReader
        return cls(self.options["uri"], int(version) if version else None, schema)

    def _pushdown_enabled(self) -> bool:
        """Whether returning a pushFilters-implementing reader is SAFE.

        ``reader()`` runs in a planner worker with no SparkSession, so the
        conf can't be read directly; three breadcrumbs, most explicit wins:
        1. ``.option("pushdown", ...)`` on the read — explicit user intent.
        2. The active session's conf, when reader() happens to run where a
           session exists (driver-side planning / future Spark versions).
        3. ``LANCE_SPARK_PUSHDOWN`` in the env: lance_spark.session sets it
           alongside the conf, and local-mode planner workers (and cluster
           planner workers, which the driver JVM spawns) inherit driver env.
        Default FALSE: the vanilla-session default for
        ``spark.sql.python.filterPushdown.enabled`` is false, and a plain
        reader merely post-filters while a pushdown reader hard-errors."""
        opt = self.options.get("pushdown")
        if opt is not None:
            return str(opt).lower() in ("true", "1", "yes")
        try:
            from pyspark.sql import SparkSession

            sess = SparkSession.getActiveSession()
            if sess is not None:
                return (
                    str(
                        sess.conf.get("spark.sql.python.filterPushdown.enabled", "false")
                    ).lower()
                    == "true"
                )
        except Exception:
            pass
        return os.environ.get("LANCE_SPARK_PUSHDOWN", "").lower() == "true"

    def writer(self, schema: StructType, overwrite: bool):
        return LanceWriter(self.options["uri"], overwrite, schema)

    def streamReader(self, schema: StructType):  # noqa: N802
        return LanceStreamReader(self.options["uri"], schema)

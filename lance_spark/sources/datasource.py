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
        return col.isin(list(f.values))
    if isinstance(f, IsNull):
        return col.is_null()
    if isinstance(f, IsNotNull):
        return ~col.is_null()
    raise AssertionError(f"unexpected filter {f}")


_SUPPORTED = (EqualTo, GreaterThan, GreaterThanOrEqual, LessThan, LessThanOrEqual, In, IsNull, IsNotNull)


class LanceReader(DataSourceReader):
    def __init__(self, uri: str, version: int | None):
        self.uri = uri
        self.version = version
        self._filters: list = []

    def pushFilters(self, filters):  # noqa: N802 - API name
        """Exact pushdown for sargable single-column predicates (the
        TableProvider role); the rest go back to Spark for post-filtering."""
        for f in filters:
            if isinstance(f, _SUPPORTED) and len(getattr(f, "attribute", ())) == 1:
                self._filters.append(f)
            else:
                yield f

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
                )
            )
        return out

    def read(self, partition: FragmentPartition):
        import pyarrow as pa
        import pyarrow.dataset as pds
        import pyarrow.parquet as pq

        expr = None
        for f in partition.filters:
            e = _to_arrow_filter(f)
            expr = e if expr is None else (expr & e)

        tables = []
        for i, path in enumerate(partition.files):
            # only the primary group can satisfy pushed filters generally;
            # pyarrow silently ignores filters on absent columns is NOT true,
            # so restrict filtering to columns present in this file
            schema_cols = set(pq.read_schema(path).names)
            file_expr = None
            for f in partition.filters:
                if f.attribute[0] in schema_cols:
                    e = _to_arrow_filter(f)
                    file_expr = e if file_expr is None else (file_expr & e)
            t = pds.dataset(path, format="parquet").to_table(filter=file_expr)
            tables.append(t)
        # column-group zip on _rowid (DataFile alignment, fragment.rs:27)
        table = tables[0]
        for t in tables[1:]:
            size_cols = [c for c in t.column_names if c.endswith("_size")]
            table = table.join(t.drop_columns(size_cols), keys=ROWID_COL, join_type="inner")
        if partition.deletion_file:
            dels = pq.read_table(partition.deletion_file, columns=[ROWID_COL])
            table = table.join(dels, keys=ROWID_COL, join_type="left anti")
        table = table.drop_columns([ROWID_COL])
        for batch in table.to_batches(max_chunksize=65536):
            yield batch


class LanceWriter(DataSourceWriter):
    def __init__(self, uri: str, overwrite: bool):
        self.uri = uri
        self.overwrite = overwrite

    def write(self, iterator):
        """Executor side: one fragment per task (two-phase distributed
        write). Fragment id is finalized at commit; the file carries a
        placeholder id derived from a uuid to stay unique."""
        import numpy as np
        import pyarrow as pa
        import pyarrow.parquet as pq
        from pyspark import TaskContext

        part_id = TaskContext.get().partitionId()
        rel = os.path.join("data", f"frag-w-{part_id}-{uuid.uuid4().hex}.parquet")
        abs_path = os.path.join(self.uri, rel)
        os.makedirs(os.path.dirname(abs_path), exist_ok=True)
        writer = None
        offset = 0
        for batch in iterator:
            if not isinstance(batch, pa.RecordBatch):
                batch = pa.RecordBatch.from_pylist([row.asDict() for row in [batch]])
            n = batch.num_rows
            rowids = pa.array(np.arange(offset, offset + n, dtype=np.int64))
            batch = pa.RecordBatch.from_arrays(
                list(batch.columns) + [rowids],
                schema=batch.schema.append(pa.field(ROWID_COL, pa.int64())),
            )
            if writer is None:
                writer = pq.ParquetWriter(abs_path, batch.schema, compression="zstd")
            writer.write_batch(batch)
            offset += n
        if writer is not None:
            writer.close()
        return FragmentCommit(fragment_id=part_id, path=rel, physical_rows=offset)

    def commit(self, messages):
        """Driver side: one manifest commit referencing all task outputs —
        rowids are rebased to fragment_id<<32|offset at commit."""
        import pyarrow.parquet as pq

        from lance_spark import manifest as mf

        frags_meta = [m for m in messages if m is not None and m.physical_rows > 0]

        def build(base: mf.Manifest | None, version: int) -> mf.Manifest:
            if self.overwrite or base is None:
                existing, base_fid = [], 0
                schema_json = None
            else:
                existing, base_fid = base.fragments, base.max_fragment_id + 1
                schema_json = base.schema_json
            new_frags = []
            for i, m in enumerate(sorted(frags_meta, key=lambda x: x.fragment_id)):
                fid = base_fid + i
                # rebase rowids in-place: rewrite the file with fragment prefix
                abs_path = os.path.join(self.uri, m.path)
                t = pq.read_table(abs_path)
                import numpy as np
                import pyarrow as pa

                # mask off any previous fragment prefix before OR-ing: this
                # build closure re-runs on commit conflict with a different
                # base_fid, and a plain OR would merge both prefixes into a
                # corrupt rowid — masking makes the rewrite idempotent
                rid = pa.array(
                    (np.asarray(t[ROWID_COL]) & np.int64((1 << FRAGID_SHIFT) - 1))
                    | np.int64(fid << FRAGID_SHIFT)
                )
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
            fragments = list(existing) + new_frags
            max_fid = max((f.id for f in fragments), default=-1)
            if base is not None and not self.overwrite:
                # carry forward indices/config/blob_columns on append
                return mf.Manifest.evolve(
                    base, version, operation="append",
                    schema_json=schema_json, fragments=fragments,
                    max_fragment_id=max(max_fid, base.max_fragment_id),
                )
            return mf.Manifest(
                version=version,
                schema_json=schema_json,
                fragments=fragments,
                max_fragment_id=max_fid,
                operation="overwrite" if self.overwrite else "append",
            )

        os.makedirs(self.uri, exist_ok=True)
        mf.commit(self.uri, build, operation="overwrite" if self.overwrite else "append")

    def abort(self, messages):
        for m in messages or []:
            if m is not None:
                try:
                    os.unlink(os.path.join(self.uri, m.path))
                except OSError:
                    pass


class LanceStreamReader(DataSourceStreamReader):
    """Version-tailing stream: offset = manifest version; each batch reads
    fragments that appeared between the two versions (append CDC)."""

    def __init__(self, uri: str):
        self.uri = uri

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
        old_ids = set()
        if v0 > 0:
            old_ids = {f.id for f in mf.read_manifest(self.uri, v0).fragments}
        new = [f for f in mf.read_manifest(self.uri, v1).fragments if f.id not in old_ids]
        return [
            FragmentPartition(
                files=[os.path.join(self.uri, df.path) for df in f.files],
                deletion_file=None,  # CDC reads raw appends
            )
            for f in new
        ] or [FragmentPartition(files=[], deletion_file=None)]

    def read(self, partition: FragmentPartition):
        import pyarrow.parquet as pq

        for path in partition.files:
            t = pq.read_table(path)
            if ROWID_COL in t.column_names:
                t = t.drop_columns([ROWID_COL])
            for batch in t.to_batches(max_chunksize=65536):
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
        return LanceReader(self.options["uri"], int(version) if version else None)

    def writer(self, schema: StructType, overwrite: bool):
        return LanceWriter(self.options["uri"], overwrite)

    def streamReader(self, schema: StructType):  # noqa: N802
        return LanceStreamReader(self.options["uri"])

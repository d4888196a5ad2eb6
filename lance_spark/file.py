"""Single-file reader/writer — reference python/python/lance/file.py.

The reference exposes its encoded file format directly
(``LanceFileReader``/``LanceFileWriter``, file.py:54-411) so tools can read
and write individual data files without a dataset. Our physical layer is
parquet, so the same surface maps onto one parquet file: ``read_all`` /
``read_range`` / ``take_rows`` (row-group-pruned), footer ``metadata()``,
schema key/value metadata (file.py:375 add_schema_metadata) and numbered
"global buffers" (file.py:389 add_global_buffer) carried in the parquet
footer's key-value store.

Driver-side by design: fragment files at 100 TB are still individually
bounded (~1M rows); distributed access goes through the dataset scan path.
"""

from __future__ import annotations

import base64
from dataclasses import dataclass

import pyarrow as pa
import pyarrow.parquet as pq

_GLOBAL_BUF_KEY = "lance_spark:global_buffer:"


@dataclass
class FileMetadata:
    """Footer summary (reference LanceFileMetadata)."""

    schema: pa.Schema
    num_rows: int
    num_row_groups: int
    size_bytes: int


@dataclass
class FileStatistics:
    """Per-column compressed sizes (reference LanceFileStatistics)."""

    columns: list[dict]


class ReaderResults:
    """Deferred read handle (reference file.py:28-51)."""

    def __init__(self, table: pa.Table, batch_size: int):
        self._table = table
        self._batch_size = batch_size

    def to_table(self) -> pa.Table:
        return self._table

    def to_batches(self):
        return self._table.to_reader(max_chunksize=self._batch_size)


class LanceFileReader:
    """Reader for one data file (reference file.py:54)."""

    def __init__(self, path: str, columns: list[str] | None = None):
        self._path = path
        self._file = pq.ParquetFile(path)
        self._columns = columns

    def num_rows(self) -> int:
        return self._file.metadata.num_rows

    def _projected_schema(self) -> pa.Schema:
        """The schema reads actually return — empty results must match it,
        not the full file schema."""
        if self._columns is None:
            return self._file.schema_arrow
        return pa.schema([self._file.schema_arrow.field(c) for c in self._columns])

    def metadata(self) -> FileMetadata:
        import os

        md = self._file.metadata
        return FileMetadata(
            schema=self._file.schema_arrow,
            num_rows=md.num_rows,
            num_row_groups=md.num_row_groups,
            # the FILE size (reference LanceFileMetadata) — serialized_size
            # is only the thrift footer's size, ~1000× smaller
            size_bytes=os.path.getsize(self._path),
        )

    def file_statistics(self) -> FileStatistics:
        md = self._file.metadata
        cols: dict[str, int] = {}
        for g in range(md.num_row_groups):
            rg = md.row_group(g)
            for c in range(rg.num_columns):
                col = rg.column(c)
                cols[col.path_in_schema] = cols.get(col.path_in_schema, 0) + col.total_compressed_size
        return FileStatistics(
            columns=[{"column": k, "compressed_bytes": v} for k, v in cols.items()]
        )

    def read_all(self, *, batch_size: int = 1024, batch_readahead: int = 16) -> ReaderResults:
        return ReaderResults(self._file.read(columns=self._columns), batch_size)

    def read_range(
        self, start: int, num_rows: int, *, batch_size: int = 1024, batch_readahead: int = 16
    ) -> ReaderResults:
        """Row-group-pruned range read: only groups overlapping
        [start, start+num_rows) are decoded. Out-of-bounds ranges raise
        (the reference errors too) — silent truncation would hand short
        data to callers computing offsets from stale metadata."""
        md = self._file.metadata
        if start < 0 or num_rows < 0 or start + num_rows > md.num_rows:
            raise IndexError(
                f"range [{start}, {start + num_rows}) out of bounds for"
                f" {md.num_rows} rows"
            )
        groups, offset_of_first = [], 0
        pos = 0
        for g in range(md.num_row_groups):
            n = md.row_group(g).num_rows
            if pos + n > start and pos < start + num_rows:
                if not groups:
                    offset_of_first = pos
                groups.append(g)
            pos += n
        t = (
            self._file.read_row_groups(groups, columns=self._columns)
            if groups
            else self._projected_schema().empty_table()
        )
        return ReaderResults(t.slice(start - offset_of_first, num_rows), batch_size)

    def take_rows(
        self, indices: list[int], *, batch_size: int = 1024, batch_readahead: int = 16
    ) -> ReaderResults:
        for i in range(len(indices) - 1):
            if indices[i] > indices[i + 1]:
                raise ValueError(
                    f"Indices must be sorted in ascending order for file API, "
                    f"got {indices[i]} > {indices[i + 1]}"
                )
        if indices and indices[0] < 0:
            raise IndexError(f"row index {indices[0]} is negative")
        md = self._file.metadata
        # bucket indices by row group, decode each needed group once
        bounds = []
        pos = 0
        for g in range(md.num_row_groups):
            n = md.row_group(g).num_rows
            bounds.append((pos, pos + n, g))
            pos += n
        chunks, gi = [], 0
        per_group: dict[int, list[int]] = {}
        for idx in indices:
            while gi < len(bounds) and idx >= bounds[gi][1]:
                gi += 1
            if gi >= len(bounds):
                raise IndexError(f"row index {idx} out of range ({pos} rows)")
            lo, _hi, g = bounds[gi]
            per_group.setdefault(g, []).append(idx - lo)
        for g, local in per_group.items():
            t = self._file.read_row_groups([g], columns=self._columns)
            chunks.append(t.take(local))
        out = pa.concat_tables(chunks) if chunks else self._projected_schema().empty_table()
        return ReaderResults(out, batch_size)

    def read_global_buffer(self, index: int) -> bytes:
        meta = self._file.schema_arrow.metadata or {}
        key = f"{_GLOBAL_BUF_KEY}{index}".encode()
        if key not in meta:
            raise IndexError(f"no global buffer at index {index}")
        return base64.b64decode(meta[key])


class LanceFileWriter:
    """Writer for one data file (reference file.py:285); context manager,
    ``close()`` returns the row count like the reference returns it."""

    #: reference writer options accepted for call-site compatibility and
    #: intentionally no-ops on the parquet physical layer
    _IGNORED_KWARGS = frozenset(
        {"version", "data_cache_bytes", "keep_original_array", "max_page_bytes"}
    )

    def __init__(self, path: str, schema: pa.Schema | None = None, **kwargs):
        unknown = set(kwargs) - self._IGNORED_KWARGS
        if unknown:
            # silently swallowing a misspelled option would write the file
            # with settings the caller believes were applied
            raise TypeError(f"unknown LanceFileWriter options: {sorted(unknown)}")
        self._path = path
        self._schema = schema
        self._writer: pq.ParquetWriter | None = None
        self._num_rows = 0
        self._schema_metadata: dict[bytes, bytes] = {}
        self._global_bufs: list[bytes] = []
        self._closed = False

    def _ensure_writer(self, schema: pa.Schema) -> pq.ParquetWriter:
        if self._writer is None:
            self._schema = schema
            self._writer = pq.ParquetWriter(self._path, schema, compression="zstd")
        return self._writer

    def write_batch(self, batch: pa.RecordBatch | pa.Table) -> None:
        if self._closed:
            raise RuntimeError("writer is closed")
        if isinstance(batch, pa.RecordBatch):
            batch = pa.Table.from_batches([batch])
        # validate BEFORE creating the on-disk file: a mismatched first
        # batch must not leave a spurious empty parquet behind
        if self._schema is not None and batch.schema.names != self._schema.names:
            raise ValueError("batch schema does not match writer schema")
        w = self._ensure_writer(self._schema or batch.schema)
        w.write_table(batch.cast(self._schema))
        self._num_rows += batch.num_rows

    def add_schema_metadata(self, key: str, value: str) -> None:
        if self._closed:
            raise RuntimeError("writer is closed")
        if key.startswith(_GLOBAL_BUF_KEY):
            raise ValueError(
                f"metadata keys starting with {_GLOBAL_BUF_KEY!r} are reserved"
                " for global buffers"
            )
        self._schema_metadata[key.encode()] = value.encode()

    def add_global_buffer(self, data: bytes) -> int:
        """Returns the 1-based buffer index (reference file.py:389 — index 0
        is reserved for the schema)."""
        if self._closed:
            raise RuntimeError("writer is closed")
        self._global_bufs.append(data)
        return len(self._global_bufs)

    def close(self) -> int | None:
        if self._closed:
            return None
        self._closed = True
        if self._writer is None and self._schema is not None:
            self._writer = pq.ParquetWriter(self._path, self._schema, compression="zstd")
        if self._writer is None:
            if self._schema_metadata or self._global_bufs:
                # metadata/buffers were added but there is no schema to
                # write them under — returning 0 would silently discard
                # them after add_global_buffer handed out valid indices
                raise RuntimeError(
                    "writer holds schema metadata / global buffers but no"
                    " schema and no batches were written; pass schema= or"
                    " write a batch first"
                )
            return 0
        self._writer.close()
        if self._schema_metadata or self._global_bufs:
            # parquet key-value metadata must be present when the footer is
            # written, so late-added metadata costs one local file rewrite —
            # acceptable for this single-file utility (files are
            # fragment-sized); metadata added before close() on an unwritten
            # file costs nothing. The rewrite PRESERVES row groups: one
            # write_table per original group, or the pruning read_range /
            # take_rows advertise would be nullified by a single giant group.
            import os

            pf = pq.ParquetFile(self._path)
            meta = dict(pf.schema_arrow.metadata or {})
            meta.update(self._schema_metadata)
            for i, buf in enumerate(self._global_bufs):
                meta[f"{_GLOBAL_BUF_KEY}{i + 1}".encode()] = base64.b64encode(buf)
            schema = pf.schema_arrow.with_metadata(meta)
            tmp = self._path + ".metatmp"
            w2 = pq.ParquetWriter(tmp, schema, compression="zstd")
            for g in range(pf.metadata.num_row_groups):
                t = pf.read_row_group(g)
                w2.write_table(
                    t.replace_schema_metadata(meta), row_group_size=max(t.num_rows, 1)
                )
            w2.close()
            pf.close()
            os.replace(tmp, self._path)
        return self._num_rows

    def __enter__(self) -> "LanceFileWriter":
        return self

    def __exit__(self, exc_type, exc_val, exc_tb) -> None:
        self.close()

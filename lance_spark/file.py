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
        self._file = pq.ParquetFile(path)
        self._columns = columns

    def num_rows(self) -> int:
        return self._file.metadata.num_rows

    def metadata(self) -> FileMetadata:
        md = self._file.metadata
        return FileMetadata(
            schema=self._file.schema_arrow,
            num_rows=md.num_rows,
            num_row_groups=md.num_row_groups,
            size_bytes=md.serialized_size,
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
        [start, start+num_rows) are decoded."""
        md = self._file.metadata
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
            else self._file.schema_arrow.empty_table()
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
        out = pa.concat_tables(chunks) if chunks else self._file.schema_arrow.empty_table()
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

    def __init__(self, path: str, schema: pa.Schema | None = None, **kwargs):
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
        if isinstance(batch, pa.RecordBatch):
            batch = pa.Table.from_batches([batch])
        w = self._ensure_writer(self._schema or batch.schema)
        if self._schema is not None and batch.schema.names != self._schema.names:
            raise ValueError("batch schema does not match writer schema")
        w.write_table(batch.cast(self._schema))
        self._num_rows += batch.num_rows

    def add_schema_metadata(self, key: str, value: str) -> None:
        if self._closed:
            raise RuntimeError("writer is closed")
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
            return 0
        self._writer.close()
        if self._schema_metadata or self._global_bufs:
            # parquet key-value metadata must be present when the footer is
            # written, so late-added metadata costs one local file rewrite —
            # acceptable for this single-file utility (files are
            # fragment-sized); metadata added before close() on an unwritten
            # file costs nothing
            t = pq.read_table(self._path)
            meta = dict(t.schema.metadata or {})
            meta.update(self._schema_metadata)
            for i, buf in enumerate(self._global_bufs):
                meta[f"{_GLOBAL_BUF_KEY}{i + 1}".encode()] = base64.b64encode(buf)
            pq.write_table(t.replace_schema_metadata(meta), self._path, compression="zstd")
        return self._num_rows

    def __enter__(self) -> "LanceFileWriter":
        return self

    def __exit__(self, exc_type, exc_val, exc_tb) -> None:
        self.close()

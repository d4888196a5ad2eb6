"""File-like access to blob columns — reference python/python/lance/blob.py.

The reference stores blob columns out-of-line and hands back lazy
``BlobFile`` handles (blob.py:52-105, rust/lance/src/dataset/blob.rs). Our
blob columns live in per-fragment sidecar parquet files (write.py:84-98)
keyed by ``_rowid`` — a ``BlobFile`` resolves one row's bytes with a
rowid-pruned point read (parquet row-group stats skip every other group),
then serves seek/read from the fetched buffer. The fetch happens on FIRST
read, not at construction, so iterating descriptors stays O(metadata).
"""

from __future__ import annotations

import io

import pyarrow.compute as pc
import pyarrow.parquet as pq

from lance_spark.write import ROWID_COL


class BlobFile(io.RawIOBase):
    """Random-access reader over one blob cell (reference blob.py:52)."""

    def __init__(self, paths: list[str], column: str, rowid: int, size: int | None = None):
        self._paths = paths
        self._column = column
        self._rowid = rowid
        self._size = size
        self._buf: bytes | None = None
        self._pos = 0
        self._closed = False

    def _check_open(self) -> None:
        if self._closed:
            raise ValueError("I/O operation on closed BlobFile")

    # -- lazy fetch ---------------------------------------------------------
    def _load(self) -> bytes:
        self._check_open()
        if self._buf is None:
            for p in self._paths:
                f = pq.ParquetFile(p)
                # prune row groups on _rowid min/max stats before any IO on
                # the (potentially huge) blob column
                groups = []
                for i in range(f.num_row_groups):
                    col = f.metadata.row_group(i).column(0)
                    st = col.statistics
                    if st is None or (st.min <= self._rowid <= st.max):
                        groups.append(i)
                if not groups:
                    continue
                t = f.read_row_groups(groups, columns=[ROWID_COL, self._column])
                mask = pc.equal(t.column(ROWID_COL), self._rowid)
                hit = t.filter(mask)
                if hit.num_rows:
                    self._buf = hit.column(self._column)[0].as_py()
                    break
            if self._buf is None:
                raise KeyError(f"rowid {self._rowid} not found in blob column {self._column}")
            self._size = len(self._buf)
        return self._buf

    # -- io.RawIOBase surface ----------------------------------------------
    def readable(self) -> bool:
        return True

    def seekable(self) -> bool:
        return True

    @property
    def closed(self) -> bool:  # type: ignore[override]
        return self._closed

    def close(self) -> None:
        self._closed = True
        self._buf = None

    def size(self) -> int:
        if self._size is None:
            self._load()
        return self._size  # type: ignore[return-value]

    def tell(self) -> int:
        return self._pos

    def seek(self, offset: int, whence: int = io.SEEK_SET) -> int:
        self._check_open()
        if whence == io.SEEK_SET:
            self._pos = offset
        elif whence == io.SEEK_CUR:
            self._pos += offset
        elif whence == io.SEEK_END:
            self._pos = self.size() + offset
        else:
            raise ValueError(f"invalid whence: {whence}")
        return self._pos

    def readall(self) -> bytes:
        buf = self._load()
        out = buf[self._pos :]
        self._pos = len(buf)
        return out

    def read(self, n: int = -1) -> bytes:
        if n is None or n < 0:
            return self.readall()
        buf = self._load()
        out = buf[self._pos : self._pos + n]
        self._pos += len(out)
        return out

    def readinto(self, b: bytearray) -> int:
        data = self.read(len(b))
        b[: len(data)] = data
        return len(data)

    def __repr__(self) -> str:
        return f"BlobFile(column={self._column!r}, rowid={self._rowid})"


class BlobIterator:
    """Iterator of lazy file handles (reference blob.py:12-21)."""

    def __init__(self, files: list[BlobFile]):
        self._it = iter(files)

    def __iter__(self):
        return self

    def __next__(self) -> BlobFile:
        return next(self._it)


def blob_files(ds, column: str, rowids: list[int]) -> list[BlobFile]:
    """``take_blobs``-shaped handle constructor: one lazy BlobFile per rowid
    (reference dataset.py:1500 ``take_blobs`` → list[BlobFile]). Fragment
    pruning by rowid prefix happens here; row-group pruning inside the file
    happens at first read."""
    from lance_spark.write import FRAGID_SHIFT

    out = []
    rel_paths = ds._blob_files(column)
    all_paths = [ds._abs(p) for p in rel_paths]
    frags = {f.id: f for f in ds.manifest.fragments} if ds._rowid_addressable() else {}
    for rid in rowids:
        frag = frags.get(rid >> FRAGID_SHIFT)
        if frag is not None and any(column in f.columns for f in frag.files[1:]):
            paths = [ds._abs(p) for p in ds._blob_files(column, [frag])]
        elif not frags:
            # post-compaction: footer-stats pruning (dataset._rowid_range)
            # narrows each handle to the files whose _rowid range covers it
            hit = [
                ds._abs(p) for p in rel_paths
                if (rng := ds._rowid_range(p)) is None or rng[0] <= rid <= rng[1]
            ]
            paths = hit or all_paths
        else:
            paths = all_paths
        out.append(BlobFile(paths, column, rid))
    return out


class BlobColumn:
    """Iterate a pyarrow binary column's rows as file-like objects
    (reference blob.py:23-50). For in-memory binary values that feed APIs
    expecting files — large out-of-line blobs should instead go through a
    blob column group and ``ds.take_blobs``."""

    def __init__(self, blob_column):
        import pyarrow as pa

        if not isinstance(blob_column, (pa.Array, pa.ChunkedArray)):
            raise ValueError(
                f"expected a pyarrow Array or ChunkedArray, got {type(blob_column)}"
            )
        t = blob_column.type
        if not (pa.types.is_binary(t) or pa.types.is_large_binary(t)):
            raise ValueError(f"expected a binary array, got {t}")
        self.blob_column = blob_column

    def __iter__(self):
        # null cells yield None (not a crash mid-iteration): arrow binary
        # columns routinely carry nulls and callers can filter them
        return (
            None if not v.is_valid else io.BytesIO(v.as_py())
            for v in self.blob_column
        )

"""Dataloader-side sampling over a LanceDataset — the reference
``lance.sampler`` surface (python/python/lance/sampler.py:35-460):
``maybe_sample`` / ``reservoir_sampling`` / ``Sampler`` / ``FragmentSampler``
/ ``FullScanSampler`` / ``ShardedFragmentSampler`` / ``ShardedBatchSampler``.

Scale shape: samplers run on TRAINING workers, not the Spark cluster — so
everything here reads fragment parquet files directly with pyarrow (no
SparkSession). A rank touches only its own fragment shard; memory is
bounded by one fragment regardless of table size. String filters are
evaluated by DuckDB over the in-memory arrow table (worker-local,
fragment-sized) — the same predicate dialect the oracle suite uses.
"""

from __future__ import annotations

import gc
import random
from abc import ABC, abstractmethod
from dataclasses import dataclass, field
from heapq import heappush, heappushpop
from typing import Generic, Iterable, TypeVar

import numpy as np

__all__ = [
    "maybe_sample",
    "reservoir_sampling",
    "PrioritizedItem",
    "Sampler",
    "FragmentSampler",
    "FullScanSampler",
    "ShardedFragmentSampler",
    "ShardedBatchSampler",
    "ShardedFixedBatchSampler",
    "ShardedBatchIterator",
    "CachedDataset",
]


def _fragment_table(ds, frag, columns=None, filter=None, with_row_id=False):  # noqa: A002
    """One fragment → pyarrow.Table: read the column groups that own the
    requested columns, align on the embedded ``_rowid``, drop deleted rows,
    apply the (optional, DuckDB-evaluated) filter."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from lance_spark.write import ROWID_COL

    want = list(columns) if columns else [c for f in frag.files for c in f.columns]
    found = {c for f in frag.files for c in f.columns if c in want}
    missing = [c for c in want if c not in found]
    if missing:
        raise KeyError(f"columns not in fragment {frag.id}: {missing}")
    # a string filter may reference columns OUTSIDE the projection (late
    # materialization, reference scanner semantics): read them for the
    # predicate, drop them from the output
    read_cols = list(want)
    if isinstance(filter, str):
        import re

        avail = {c for f in frag.files for c in f.columns}
        refs = set(re.findall(r"[A-Za-z_][A-Za-z0-9_]*", filter))
        read_cols += [c for c in sorted(avail - set(want)) if c in refs]
    tables = [
        pq.read_table(
            ds._abs(f.path),
            columns=[ROWID_COL] + [c for c in f.columns if c in read_cols],
        )
        for f in frag.files
        if any(c in read_cols for c in f.columns)
    ]
    base = tables[0]
    for t in tables[1:]:
        # align on the embedded _rowid, never positionally: column groups
        # written from deletion-filtered scans can carry FEWER rows than
        # the primary file, and a positional append would crash (or worse,
        # silently misalign)
        base = base.join(t, keys=ROWID_COL, join_type="inner")
    base = base.sort_by(ROWID_COL)
    if frag.deletion_file:
        import pyarrow.compute as pc

        dead = pq.read_table(ds._abs(frag.deletion_file)).column(0)
        base = base.filter(pc.invert(pc.is_in(base.column(ROWID_COL), value_set=dead)))
    if filter is not None:
        base = _apply_filter(base, filter)
    order = ([ROWID_COL] if with_row_id else []) + [c for c in want if c in base.column_names]
    if not with_row_id:
        order = [c for c in order if c != ROWID_COL]
    return base.select(order or base.column_names)


def _apply_filter(table, filter):  # noqa: A002
    """pyarrow Expression applied directly; SQL strings via DuckDB over the
    worker-local arrow table."""
    import pyarrow as pa

    if isinstance(filter, str):
        try:
            import duckdb
        except ImportError as e:  # pragma: no cover
            raise ImportError(
                "string filters in samplers need duckdb on the worker; pass "
                "a pyarrow.compute Expression instead"
            ) from e
        con = duckdb.connect()
        con.register("t", table)
        return con.execute(f"SELECT * FROM t WHERE {filter}").fetch_arrow_table()
    return table.filter(filter)


def maybe_sample(
    dataset,
    n: int,
    columns=None,
    batch_size: int = 10240,
    max_takes: int = 2048,
    filter: str | None = None,  # noqa: A002
):
    """Yield ~``n`` randomly-sampled rows as RecordBatches (reference
    sampler.py ``maybe_sample``): a full scan when the dataset is smaller
    than ``n``; otherwise chunked random takes so the read pattern stays
    ``max_takes`` sequential ranges, not ``n`` point reads."""
    import pyarrow as pa

    from lance_spark.dataset import LanceDataset

    if isinstance(dataset, str):
        dataset = LanceDataset(dataset)
    if isinstance(columns, str):
        columns = [columns]
    if n <= 0:
        return  # the positional path would otherwise divide by takes=0

    frags = [f for f in dataset.manifest.fragments]
    total = sum(f.num_rows for f in frags)
    if n >= total and filter is None:
        # not enough data: just full-scan (reference maybe_sample branch 1)
        for frag in frags:
            yield from _fragment_table(dataset, frag, columns).to_batches(
                max_chunksize=batch_size
            )
        return
    if filter is not None:
        # filtered: selectivity is unknowable up front — reservoir-sample
        # the filtered batch stream so memory stays O(n) rows no matter how
        # large the filtered corpus is (ADVICE r5: the previous form
        # collected every matching batch before down-sampling). Classic
        # slot-replacement reservoir, vectorized per batch: row with global
        # index t draws r ~ U[0, t] and replaces slot r when r < n —
        # uniform without replacement over the whole stream.
        reservoir: list = []  # n single-row zero-copy slices
        seen = 0
        pinned = 0  # parent batches kept alive by reservoir slices

        def _compact():
            # re-materialize the reservoir so slices stop pinning their
            # (batch_size-row) parent batches — keeps memory O(n) rows
            nonlocal reservoir, pinned
            tbl = pa.Table.from_batches(reservoir).combine_chunks()
            one = tbl.to_batches(max_chunksize=tbl.num_rows)[0]
            reservoir = [one.slice(i, 1) for i in range(one.num_rows)]
            pinned = 0

        for frag in frags:
            t = _fragment_table(dataset, frag, columns, filter)
            for batch in t.to_batches(max_chunksize=batch_size):
                m = batch.num_rows
                if m == 0:
                    continue
                fill = min(max(n - len(reservoir), 0), m)
                for i in range(fill):
                    reservoir.append(batch.slice(i, 1))
                touched = fill > 0
                if m > fill:
                    gidx = np.arange(seen + fill, seen + m)
                    r = (np.random.random(m - fill) * (gidx + 1)).astype(np.int64)
                    hit = r < n
                    for row, slot in zip(np.nonzero(hit)[0], r[hit]):
                        reservoir[slot] = batch.slice(fill + int(row), 1)
                    touched = touched or bool(hit.any())
                seen += m
                if touched:
                    pinned += 1
                    if pinned >= 64:
                        _compact()
        if not reservoir:
            return
        tbl = pa.Table.from_batches(reservoir).combine_chunks()
        yield from tbl.to_batches(max_chunksize=batch_size)
        return

    # positional sampling: global position -> (fragment, local offset)
    takes = min(max_takes, n)
    chunk = max(total // takes, 1)
    # CEIL, not floor: n just above max_takes would otherwise take 1 row
    # per window and return ~half the requested sample
    per_chunk = max(-(-n // takes), 1)
    sampled = 0
    buf, buffered = [], 0
    for start in range(0, total, chunk):
        if sampled >= n:
            break
        local = min(chunk, total - start)
        take_n = min(per_chunk, local, n - sampled)
        # +1: randint's high is exclusive — without it the window could
        # never END at the chunk boundary, zeroing the last row's
        # sampling probability in every chunk
        off = start + (np.random.randint(0, local - take_n + 1) if take_n < local else 0)
        tbl = _take_positions(dataset, frags, range(off, off + take_n), columns)
        sampled += take_n
        buf.append(tbl)
        buffered += tbl.num_rows
        if buffered >= batch_size:
            out = pa.concat_tables(buf).combine_chunks()
            buf, buffered = [], 0
            yield from out.to_batches(max_chunksize=batch_size)
    if buf:
        out = pa.concat_tables(buf).combine_chunks()
        yield from out.to_batches(max_chunksize=batch_size)


#: last-two fragment tables, keyed (uri, version, frag, columns, rowid):
#: consecutive positional takes walk fragments in order, so a tiny cache
#: collapses the per-take full-fragment re-read (a 1M-row fragment read
#: ~1000× per epoch by a batch_size=128 sharded loader otherwise)
_FRAG_TABLE_CACHE: dict = {}


def _cached_fragment_table(ds, frag, columns, with_row_id):
    key = (
        ds.uri, ds.manifest.version, frag.id,
        tuple(columns) if columns else None, with_row_id,
    )
    hit = _FRAG_TABLE_CACHE.get(key)
    if hit is not None:
        return hit
    t = _fragment_table(ds, frag, columns, with_row_id=with_row_id)
    while len(_FRAG_TABLE_CACHE) >= 2:
        _FRAG_TABLE_CACHE.pop(next(iter(_FRAG_TABLE_CACHE)))
    _FRAG_TABLE_CACHE[key] = t
    return t


def _take_positions(ds, frags, positions, columns, with_row_id=False):
    """Global live-row positions → one arrow table (fragment-pruned)."""
    import pyarrow as pa

    positions = sorted(positions)
    out, lo = [], 0
    it = iter(positions)
    pos = next(it, None)
    for frag in frags:
        hi = lo + frag.num_rows
        local = []
        while pos is not None and pos < hi:
            local.append(pos - lo)
            pos = next(it, None)
        if local:
            t = _cached_fragment_table(ds, frag, columns, with_row_id)
            out.append(t.take(local))
        lo = hi
    return pa.concat_tables(out) if out else pa.table({})


T = TypeVar("T")


@dataclass(order=True)
class PrioritizedItem(Generic[T]):
    priority: int
    item: T = field(compare=False)


def reservoir_sampling(stream: Iterable[T], k: int) -> list[T]:
    """Approximate k-reservoir over an arbitrary stream (reference
    sampler.py:241-258 — same random-priority heap)."""
    if k <= 0:
        return []  # rng.integers(0, 0) would raise on the first item
    rng = np.random.default_rng()
    heap: list[PrioritizedItem] = []
    for idx, item in enumerate(stream):
        entry = PrioritizedItem(int(rng.integers(0, k * 2)), item)
        if len(heap) < k:
            heappush(heap, entry)
        else:
            heappushpop(heap, entry)
        if idx % 10240 == 0:
            gc.collect()
    return [i.item for i in heap]


class Sampler(ABC):
    """Sampler over a LanceDataset (reference sampler.py:260). Implement
    ``__call__`` to yield ``pyarrow.RecordBatch``."""

    @abstractmethod
    def __call__(
        self,
        ds,
        *args,
        batch_size: int = 128,
        columns=None,
        filter=None,  # noqa: A002
        batch_readahead: int = 16,
        with_row_id: bool = False,
        **kwargs,
    ):
        ...


class FragmentSampler(Sampler):
    """Sampling by fragment order (reference sampler.py:283): subclasses
    pick the fragment sequence; batches stream fragment-by-fragment so
    loader memory stays bounded by one fragment."""

    def __call__(
        self,
        dataset,
        *args,
        batch_size: int = 128,
        columns=None,
        filter=None,  # noqa: A002
        batch_readahead: int = 16,
        with_row_id: bool = False,
        **kwargs,
    ):
        for frag in self.iter_fragments(dataset, *args, **kwargs):
            t = _fragment_table(dataset, frag, columns, filter, with_row_id)
            yield from t.to_batches(max_chunksize=batch_size)

    @abstractmethod
    def iter_fragments(self, ds, *args, **kwargs):
        ...


class FullScanSampler(FragmentSampler):
    """Default: the entire dataset, sequentially (sampler.py:321)."""

    def iter_fragments(self, dataset, **kwargs):
        yield from dataset.manifest.fragments


class ShardedFragmentSampler(FragmentSampler):
    """Each rank reads ``fragments[rank::world_size]`` (sampler.py:331) —
    disjoint shards, zero coordination; the efficient choice for large
    datasets."""

    def __init__(self, rank: int, world_size: int, randomize: bool = False, seed: int = 0):
        super().__init__()
        self._rank = rank
        self._world_size = world_size
        self._randomize = randomize
        self._seed = seed
        self._epoch = 0

    def set_epoch(self, epoch: int) -> None:
        self._epoch = epoch

    @staticmethod
    def from_torch(randomize: bool = False, seed: int = 0) -> "ShardedFragmentSampler":
        import torch

        return ShardedFragmentSampler(
            torch.distributed.get_rank(),
            torch.distributed.get_world_size(),
            randomize=randomize,
            seed=seed,
        )

    def iter_fragments(self, dataset, **kwargs):
        frags = list(dataset.manifest.fragments)
        if self._randomize:
            random.Random(self._seed + self._epoch).shuffle(frags)
        for idx in range(self._rank, len(frags), self._world_size):
            yield frags[idx]


class ShardedBatchSampler(Sampler):
    """Each rank takes every Nth ``batch_size`` run of global row positions
    (sampler.py:385) — finer-grained than fragment sharding, at the cost of
    ranged reads. With a filter, every rank scans the filtered stream and
    keeps its share (positions can't be pre-divided), reservoir-randomized
    when ``randomize`` is set — the reference's documented fallback."""

    def __init__(self, rank: int, world_size: int, randomize: bool = False, seed: int = 0):
        self._rank = rank
        self._world_size = world_size
        self._randomize = randomize
        self._seed = seed
        self._epoch = 0

    def set_epoch(self, epoch: int) -> None:
        self._epoch = epoch

    @staticmethod
    def from_torch(randomize: bool = False, seed: int = 0) -> "ShardedBatchSampler":
        import torch

        return ShardedBatchSampler(
            torch.distributed.get_rank(),
            torch.distributed.get_world_size(),
            randomize=randomize,
            seed=seed,
        )

    def __call__(
        self,
        dataset,
        *args,
        batch_size: int = 128,
        columns=None,
        filter=None,  # noqa: A002
        batch_readahead: int = 16,
        with_row_id: bool = False,
        **kwargs,
    ):
        frags = list(dataset.manifest.fragments)
        if filter is not None:
            # filtered: every rank scans the filtered stream and keeps its
            # modulo share (positions can't be pre-assigned once a filter
            # intervenes). Streaming: memory stays one fragment, never the
            # whole filtered dataset; the randomized variant buffers only
            # THIS rank's share and shuffles it with (seed + epoch) so runs
            # are reproducible and set_epoch re-orders (the unfiltered
            # path's contract).
            idx = 0
            mine = [] if self._randomize else None
            for frag in frags:
                t = _fragment_table(dataset, frag, columns, filter, with_row_id)
                for b in t.to_batches(max_chunksize=batch_size):
                    if idx % self._world_size == self._rank:
                        if mine is None:
                            yield b
                        else:
                            mine.append(b)
                    idx += 1
            if mine is not None:
                random.Random(self._seed + self._epoch).shuffle(mine)
                yield from mine
            return
        total = sum(f.num_rows for f in frags)
        starts = list(range(0, total, batch_size))
        mine = starts[self._rank :: self._world_size]
        if self._randomize:
            random.Random(self._seed + self._epoch).shuffle(mine)
        for s in mine:
            tbl = _take_positions(
                dataset, frags, range(s, min(s + batch_size, total)), columns,
                with_row_id=with_row_id,
            )
            yield from tbl.to_batches(max_chunksize=batch_size)


class ShardedFixedBatchSampler(ShardedBatchSampler):
    """Distributed fixed-range INDEX batching for static datasets with a
    known row count (reference python/python/lance/sampler.py:580): rank r
    owns the consecutive index range ``[r*ceil(total/world), ...)`` split
    into ``batch_size`` batches, yielded as ``list[int]`` — the shape a
    torch ``DataLoader(batch_sampler=...)`` consumes. Ranges stay adjacent
    on purpose (sequential reads); no filter is applied for the same
    reason. ``randomize`` shuffles the BATCH order per epoch
    (``seed + epoch``), never the rows inside a batch."""

    def __init__(
        self,
        rank: int,
        world_size: int,
        randomize: bool = False,
        seed: int = 0,
        batch_size: int = 0,
        total_num_rows: int = 0,
    ):
        super().__init__(rank, world_size, randomize, seed)
        self._batch_size = batch_size
        self._total_num_rows = total_num_rows

    def _rank_range(self) -> tuple[int, int]:
        per_rank = -(-self._total_num_rows // self._world_size)  # ceil
        start = self._rank * per_rank
        return start, min(start + per_rank, self._total_num_rows)

    def __len__(self) -> int:
        # must agree with __iter__: the last rank's range is CLAMPED, so
        # the ceil per-rank count can overstate its batches (a torch loop
        # driven by len() would then hang at a distributed barrier)
        if self._batch_size <= 0 or self._total_num_rows <= 0:
            return 0
        start, end = self._rank_range()
        return -(-(end - start) // self._batch_size) if end > start else 0

    def __iter__(self):
        if self._batch_size <= 0 or self._total_num_rows <= 0:
            return
        start, end = self._rank_range()
        batches = [
            list(range(s, min(s + self._batch_size, end)))
            for s in range(start, end, self._batch_size)
        ]
        if self._randomize:
            random.Random(self._seed + self._epoch).shuffle(batches)
        yield from batches

    @staticmethod
    def from_torch(
        batch_size: int, total_num_rows: int, randomize: bool = False, seed: int = 0
    ) -> "ShardedFixedBatchSampler":
        import torch

        return ShardedFixedBatchSampler(
            torch.distributed.get_rank(),
            torch.distributed.get_world_size(),
            randomize,
            seed,
            batch_size,
            total_num_rows,
        )


class ShardedBatchIterator:
    """Iterator of RecordBatches over one shard of a dataset (reference
    lance._dataset.sharded_batch_iterator.ShardedBatchIterator):
    ``granularity='fragment'`` shards whole fragments (the performant
    default — sequential reads, zero coordination); ``'batch'`` shards
    ``batch_size`` row runs (finer balance, ranged reads)."""

    def __init__(
        self,
        data,
        rank: int,
        world_size: int,
        *,
        columns=None,
        batch_size: int = 1024 * 10,
        granularity: str = "fragment",
        batch_readahead: int = 8,
        with_row_id: bool = False,
    ):
        from lance_spark.dataset import LanceDataset

        self._ds = LanceDataset(data) if isinstance(data, str) else data
        if granularity == "fragment":
            self._sampler = ShardedFragmentSampler(rank, world_size)
        elif granularity == "batch":
            self._sampler = ShardedBatchSampler(rank, world_size)
        else:
            raise ValueError(f"granularity must be 'fragment' or 'batch', got {granularity!r}")
        self._kwargs = dict(
            batch_size=batch_size, columns=columns, with_row_id=with_row_id,
            batch_readahead=batch_readahead,
        )

    def __iter__(self):
        return iter(self._sampler(self._ds, **self._kwargs))


class CachedDataset:
    """Cache a batch stream to a local arrow IPC file on the FIRST epoch so
    later epochs replay from disk instead of recomputing the source
    (reference lance._dataset.cache.CachedDataset — same contract: a
    second iteration before the first finishes raises)."""

    def __init__(self, stream, cache_dir: str | None = None):
        import tempfile

        self.stream = stream
        self._dir = cache_dir or tempfile.mkdtemp(prefix="lance_spark_cache_")
        self._own = cache_dir is None
        self.cache_file: str | None = None
        self.finished_origin_stream = False

    def __iter__(self):
        import os

        import pyarrow as pa

        if self.cache_file is None:
            writer = None
            for batch in self.stream:
                if writer is None:
                    self.cache_file = os.path.join(self._dir, "cache.arrow")
                    writer = pa.ipc.new_stream(self.cache_file, batch.schema)
                writer.write(batch)
                yield batch
            if writer is not None:
                writer.close()
            self.finished_origin_stream = True
        else:
            if not self.finished_origin_stream:
                raise RuntimeError(
                    "CachedDataset: the iteration over original data has not finished"
                )
            with pa.ipc.open_stream(self.cache_file) as reader:
                yield from reader

    def close(self) -> None:
        import os
        import shutil

        if self.cache_file and os.path.exists(self.cache_file):
            if self._own:
                shutil.rmtree(self._dir, ignore_errors=True)
            else:
                os.remove(self.cache_file)
        self.cache_file = None

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()

"""ML data loaders over a LanceDataset (torch/tf-shaped ingest surface).

Reference semantics (python/python/lance/torch/data.py LanceDataset
IterableDataset; python/python/lance/sampler.py ShardedFragmentSampler):
  - each worker/rank reads a disjoint fragment shard
    (``fragments[rank::world_size]`` by position, the reference
    ShardedFragmentSampler contract) — no shuffle, no coordination,
    deterministic;
  - batches stream fragment-by-fragment, so loader memory is bounded by a
    fragment regardless of table size;
  - columns project into the scan (only requested columns are read).

``numpy_batches`` is the framework-agnostic core (dict of numpy arrays —
what both torch's ``IterableDataset`` and tf's ``from_generator`` consume).
``LanceTorchDataset`` wraps it behind an import-guard: this container has
no torch, so the wrapper raises a clear ImportError at iteration time while
the plumbing (sharding, batching, column projection, dtype shaping) is real
and tested through the numpy path.
"""

from __future__ import annotations

import numpy as np


def _batch_to_numpy(batch) -> dict[str, np.ndarray]:
    """RecordBatch → {col: ndarray}; fixed-width list columns (embeddings)
    stack into 2-D arrays, the shape a training loop feeds to a tensor."""
    out = {}
    for name, col in zip(batch.schema.names, batch.columns):
        arr = col.to_numpy(zero_copy_only=False)
        if arr.dtype == object and len(arr) and isinstance(arr[0], np.ndarray):
            widths = {a.shape for a in arr if a is not None}
            # a NULL vector row must not reach np.stack (it raises on the
            # None element even when every real row agrees on shape — one
            # bad row killed the whole epoch, r12 review fix)
            if len(widths) == 1 and not any(a is None for a in arr):
                arr = np.stack(arr)
        out[name] = arr
    return out


def numpy_batches(
    ds,
    spark,
    columns: list[str] | None = None,
    batch_size: int = 1024,
    rank: int = 0,
    world_size: int = 1,
    fragment_batch_size: int = 16,
    max_chunk_bytes: int = 2 << 30,
):
    """Dict-of-numpy batches over this rank's fragment shard (the
    ShardedFragmentSampler contract: ranks read disjoint fragments whose
    union is the table).

    Executes through the scanner's chunked ``scan_batches`` — ONE Spark job
    per ``fragment_batch_size`` fragments, not one per fragment (the
    reference streams a rank's shard in one pass,
    python/python/lance/sampler.py:260-361; a 10k-fragment shard here costs
    ~⌈10k/16⌉ job launches instead of 10k, so the driver never becomes the
    ingest bottleneck). Batches still stream fragment-by-fragment in
    manifest order, so loader memory stays bounded by one fragment chunk."""
    import pyarrow as pa

    if not 0 <= rank < world_size:
        raise ValueError(f"rank {rank} not in [0, {world_size})")
    # POSITION-based sharding (fragments[rank::world_size], the reference
    # sampler.py:331 contract): id-modulo starved ranks when compaction
    # left non-contiguous ids — e.g. surviving ids {10, 12} gave rank 1
    # of 2 NOTHING while rank 0 read the whole table (r12 review fix)
    frag_ids = [f.id for f in ds.manifest.fragments][rank::world_size]
    if not frag_ids:
        return
    scanner = ds.scanner(spark, columns=columns, fragments=frag_ids)
    cur_frag, cur = None, []
    # max_chunk_bytes cuts chunks early on WIDE fragments (blob columns):
    # a fixed 16-fragment chunk over multi-GB blobs would blow the driver
    for tagged in scanner.scan_batches(
        fragment_batch_size=fragment_batch_size, max_chunk_bytes=max_chunk_bytes
    ):
        if tagged.fragment.id != cur_frag and cur:
            t = pa.Table.from_batches(cur)
            cur = []
            for b in t.to_batches(max_chunksize=batch_size):
                yield _batch_to_numpy(b)
        cur_frag = tagged.fragment.id
        cur.append(tagged.record_batch)
    if cur:
        t = pa.Table.from_batches(cur)
        for b in t.to_batches(max_chunksize=batch_size):
            yield _batch_to_numpy(b)


class LanceTorchDataset:
    """torch.utils.data.IterableDataset-shaped wrapper (torch/data.py:
    LanceDataset). Iterating yields dicts of torch tensors; without torch
    installed it raises ImportError with the numpy_batches escape hatch."""

    def __init__(
        self,
        ds,
        spark,
        columns: list[str] | None = None,
        batch_size: int = 1024,
        rank: int = 0,
        world_size: int = 1,
    ):
        self.ds = ds
        self.spark = spark
        self.columns = columns
        self.batch_size = batch_size
        self.rank = rank
        self.world_size = world_size

    def __iter__(self):
        try:
            import torch
        except ImportError as exc:
            raise ImportError(
                "torch is not installed; use lance_spark.loaders.numpy_batches "
                "for the framework-agnostic iterator"
            ) from exc
        for batch in numpy_batches(
            self.ds, self.spark, self.columns, self.batch_size, self.rank, self.world_size
        ):
            yield {
                # datetime64/timedelta64 stay numpy: torch.from_numpy
                # rejects them (r12 review)
                k: (
                    torch.from_numpy(np.ascontiguousarray(v))
                    if v.dtype != object and v.dtype.kind not in "Mm"
                    else v
                )
                for k, v in batch.items()
            }


def tf_dataset(
    ds,
    spark,
    columns: list[str] | None = None,
    batch_size: int = 1024,
    rank: int = 0,
    world_size: int = 1,
):
    """tf.data-shaped loader (reference python/python/lance/tf/data.py
    ``from_lance``): returns a ``tf.data.Dataset`` built with
    ``from_generator`` over the same sharded numpy batches the torch
    wrapper uses. Raises ImportError without tensorflow (not in this
    container) — the generator path is the tested, framework-free core."""
    try:
        import tensorflow as tf
    except ImportError as exc:
        raise ImportError(
            "tensorflow is not installed; use lance_spark.loaders.numpy_batches "
            "for the framework-agnostic iterator"
        ) from exc

    probe = numpy_batches(ds, spark, columns, batch_size, rank, world_size)
    first = next(probe, None)
    probe.close()  # don't leak the probe scanner (r12 review)
    if first is None:
        raise ValueError(
            f"rank {rank}/{world_size} has an empty fragment shard — "
            "from_generator would die on a raw StopIteration (PEP 479)"
        )
    # tensor-convertible columns only — object (string) and datetime
    # columns are excluded from the signature, so gen() must project the
    # SAME keys or every element mismatches the declared structure (r12)
    signature = {
        k: tf.TensorSpec(shape=(None, *v.shape[1:]), dtype=tf.as_dtype(v.dtype))
        for k, v in first.items()
        if v.dtype != object and v.dtype.kind not in "Mm"
    }
    keys = set(signature)

    def gen():
        for b in numpy_batches(ds, spark, columns, batch_size, rank, world_size):
            yield {k: v for k, v in b.items() if k in keys}

    return tf.data.Dataset.from_generator(gen, output_signature=signature)

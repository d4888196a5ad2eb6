"""Maintenance: compact_files + cleanup_old_versions.

Reference semantics:
  - optimize.compact_files(target_rows_per_fragment): rewrite small or
    deletion-heavy fragments, materializing deletions; row ids stay stable so
    indexes remain valid (dataset.py:4754, rust/lance/src/dataset/optimize.rs:
    120-219 — Operation::Rewrite).
  - cleanup_old_versions(older_than): GC manifests + files unreferenced by
    any retained version (dataset.py:2180, rust/lance/src/dataset/cleanup.rs).

Spark-first HOW: because ``_rowid`` is a materialized column, compaction just
carries it through the rewrite — stable ids for free. After compaction a
fragment's rowids are no longer ``fragment_id<<32|offset``-aligned, so the
manifest flags ``rowid_address_style=false`` and point lookups fall back to
parquet min/max pruning on the pushed ``_rowid IN (...)`` filter (rowid runs
stay dense per file, so row-group stats prune well).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

from lance_spark import manifest as mf
from lance_spark.write import ROWID_COL, write_fragments


def compact_files(ds, spark: SparkSession, target_rows_per_fragment: int = 1024 * 1024):
    """Rewrite fragments that are small (<1/2 target) or deletion-heavy
    (>10% deleted) into full-size fragments (optimize.rs CompactionOptions)."""
    from lance_spark.dataset import LanceDataset

    def needs_compaction(f: mf.Fragment) -> bool:
        return f.num_rows < target_rows_per_fragment // 2 or (
            f.physical_rows > 0 and f.num_deleted_rows / f.physical_rows > 0.10
        )

    victims = [f for f in ds.manifest.fragments if needs_compaction(f)]
    if len(victims) < 2 and not any(f.num_deleted_rows for f in victims):
        return ds
    victim_ids = {f.id for f in victims}

    df = ds._fragment_df(spark, victims, None)  # deletions applied; _rowid kept
    live_rows = sum(f.num_rows for f in victims)
    n_frags = max(1, -(-live_rows // target_rows_per_fragment))
    base_fid = ds.manifest.max_fragment_id + 1
    new_frags = write_fragments(
        df.repartition(n_frags), ds.uri, base_fid, preserve_rowids=True
    )

    new_ids = {f.id for f in new_frags}

    def build(base: mf.Manifest | None, version: int) -> mf.Manifest:
        assert base is not None
        fragments = [f for f in base.fragments if f.id not in victim_ids] + new_frags
        cfg = dict(base.config)
        cfg["rowid_address_style"] = False
        # Remap index coverage (Operation::Rewrite remap, optimize.rs:982):
        # rowids are stable so index entries stay valid; a rewritten fragment
        # is covered iff every victim it absorbed was covered (rows from an
        # unindexed victim would otherwise be wrongly skipped by fast_search).
        indices = []
        for i in base.indices:
            cov = set(i.fragment_ids)
            fids = cov - victim_ids
            if victim_ids <= cov:
                fids |= new_ids
            indices.append(
                mf.IndexMeta(
                    name=i.name, index_type=i.index_type, column=i.column,
                    path=i.path, fragment_ids=sorted(fids), params=i.params,
                )
            )
        return mf.Manifest(
            version=version,
            schema_json=base.schema_json,
            fragments=fragments,
            max_fragment_id=max(f.id for f in fragments),
            operation="rewrite",
            indices=indices,
            config=cfg,
            blob_columns=base.blob_columns,
        )

    mf.commit(ds.uri, build, operation="rewrite")
    return LanceDataset(ds.uri)


def optimize_indices(ds, spark: SparkSession):
    """``optimize.optimize_indices`` (dataset.py:4831): bring every index
    back to full fragment coverage after appends, by rebuilding the stale
    ones (the reference merges deltas; our builds are one distributed pass
    over the column, so a rebuild IS the merge)."""
    from lance_spark.dataset import LanceDataset

    current = {f.id for f in ds.manifest.fragments}
    out = ds
    for meta in list(ds.manifest.indices):
        if set(meta.fragment_ids) >= current:
            continue  # already covers everything
        if meta.index_type.startswith("IVF"):
            from lance_spark.indexes.vector import create_dataset_index

            out = create_dataset_index(
                out, spark, meta.column, meta.name, meta.index_type,
                num_partitions=int(meta.params.get("num_partitions", 16)),
                num_sub_vectors=int(meta.params.get("num_sub_vectors", 8)),
                metric=meta.params.get("metric", "cosine"),
            )
        elif meta.index_type == "INVERTED":
            from lance_spark.indexes.inverted import create_inverted_index

            out = create_inverted_index(out, spark, meta.column, meta.name)
        else:
            from lance_spark.indexes.scalar import create_scalar_index

            out = create_scalar_index(out, spark, meta.column, meta.index_type, meta.name, meta.params)
    return LanceDataset(ds.uri)


def cleanup_old_versions(ds, older_than_seconds: float = 0.0, keep_tagged: bool = True) -> int:
    """Delete manifests older than the cutoff (never the latest) and any
    data/deletion files not referenced by a retained version. Returns number
    of files removed. Driver-side O(metadata + file listing)."""
    import time

    root = ds.uri
    now = time.time()
    versions = mf.list_versions(root)
    latest = versions[-1]
    tagged = set(mf.list_tags(root).values()) if keep_tagged else set()

    keep, drop = [], []
    for v in versions:
        m = mf.read_manifest(root, v)
        if v == latest or v in tagged or (now - m.timestamp) < older_than_seconds:
            keep.append(m)
        else:
            drop.append(v)

    referenced: set[str] = set()
    for m in keep:
        for frag in m.fragments:
            for f in frag.files:
                referenced.add(f.path)
            if frag.deletion_file:
                referenced.add(frag.deletion_file)
        for idx in m.indices:
            referenced.add(idx.path)

    removed = 0
    for v in drop:
        os.unlink(mf.manifest_path(root, v))
        removed += 1
    for sub in ("data", "_deletions"):
        d = os.path.join(root, sub)
        if not os.path.isdir(d):
            continue
        for name in os.listdir(d):
            rel = os.path.join(sub, name)
            if rel not in referenced:
                os.unlink(os.path.join(root, rel))
                removed += 1
    # index directories
    idx_root = os.path.join(root, "_indices")
    if os.path.isdir(idx_root):
        import shutil

        for name in os.listdir(idx_root):
            rel = os.path.join("_indices", name)
            if rel not in referenced:
                shutil.rmtree(os.path.join(idx_root, rel))
                removed += 1
    return removed

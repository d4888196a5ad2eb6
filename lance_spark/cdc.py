"""Version-diff / change-data-capture reads: what changed between two
dataset versions.

Not in the reference core (its consumers re-read snapshots); a 100 TB
training pipeline needs INCREMENTAL consumption — process only what a
nightly ingest added, retract what a takedown deleted. The format makes
this O(changed fragments), never a table diff:

  - data files are immutable → candidate inserts are the live rows of
    fragments present in ``to`` but not ``from``;
  - deletions are per-fragment sidecar replacements → candidate deletes in
    common fragments = (new sidecar − old sidecar) rowids; dropped
    fragments contribute all their previously-live rows;
  - compaction/Rewrite MOVES rows to new fragments with PRESERVED rowids,
    so a rowid in both candidate sets changed location, not existence —
    the final anti-join between the two candidate sets cancels those out
    and a pure compaction window reports zero changes;
  - merge_insert updates are delete+append (the row gets a NEW rowid) →
    surfaced as a delete plus an insert.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from lance_spark.write import ROWID_COL


def _deleted_rowids(spark: SparkSession, root: str, paths: list[str]) -> DataFrame | None:
    if not paths:
        return None
    return spark.read.parquet(*[os.path.join(root, p) for p in paths]).select(ROWID_COL)


def changes(ds, spark: SparkSession, from_version: int, to_version: int | None = None) -> DataFrame:
    """Rows inserted/deleted between two versions. Returns
    ``(_change_type, _rowid, <table columns>)`` — column values populated
    for inserts, null for deletes (the row no longer exists to read).
    ``from_version`` is exclusive, ``to_version`` inclusive (defaults to
    the dataset's current version)."""
    from lance_spark.dataset import LanceDataset

    old = LanceDataset(ds.uri, version=from_version)
    new = LanceDataset(ds.uri, version=to_version) if to_version is not None else ds
    if new.manifest.version < old.manifest.version:
        raise ValueError("to_version must be >= from_version")
    cols = new.columns
    old_frags = {f.id: f for f in old.manifest.fragments}
    new_frags = {f.id: f for f in new.manifest.fragments}

    # ---- candidate inserts: fragments new to ``to`` (live rows only) -----
    added = [fid for fid in new_frags if fid not in old_frags]
    ins = (
        new._fragment_df(spark, [new_frags[f] for f in added], None)
        if added
        else None
    )

    # ---- candidate deletes ----------------------------------------------
    del_pieces: list[DataFrame] = []
    # (a) fragments dropped outright: every row live at ``from``
    dropped = [old_frags[f] for f in old_frags if f not in new_frags]
    if dropped:
        del_pieces.append(old._fragment_df(spark, dropped, []).select(ROWID_COL))
    # (b) common fragments whose deletion sidecar grew: new − old rowids
    new_dels, old_dels = [], []
    for fid, nf in new_frags.items():
        of = old_frags.get(fid)
        if of is None or nf.deletion_file == of.deletion_file:
            continue
        if nf.deletion_file:
            new_dels.append(nf.deletion_file)
        if of.deletion_file:
            old_dels.append(of.deletion_file)
    nd = _deleted_rowids(spark, ds.uri, new_dels)
    if nd is not None:
        od = _deleted_rowids(spark, ds.uri, old_dels)
        if od is not None:
            nd = nd.join(od, on=ROWID_COL, how="left_anti")
        del_pieces.append(nd)
    dels = None
    if del_pieces:
        dels = del_pieces[0]
        for p in del_pieces[1:]:
            dels = dels.unionByName(p)

    # ---- cancel moved rows (compaction preserves rowids) -----------------
    # a rowid appearing as BOTH candidate insert and candidate delete only
    # moved fragments; the anti-joins stay O(changed fragments) in size
    pieces: list[DataFrame] = []
    null_cols = [F.lit(None).cast(f.dataType).alias(f.name) for f in new.schema.fields]
    if ins is not None:
        true_ins = (
            ins.join(dels.select(ROWID_COL), on=ROWID_COL, how="left_anti")
            if dels is not None
            else ins
        )
        pieces.append(
            true_ins.select(
                F.lit("insert").alias("_change_type"), F.col(ROWID_COL), *cols
            )
        )
    if dels is not None:
        true_dels = (
            dels.join(ins.select(ROWID_COL), on=ROWID_COL, how="left_anti")
            if ins is not None
            else dels
        )
        pieces.append(
            true_dels.select(
                F.lit("delete").alias("_change_type"), F.col(ROWID_COL), *null_cols
            )
        )

    if not pieces:
        empty = new._fragment_df(spark, [], None).limit(0)
        return empty.select(
            F.lit("insert").alias("_change_type"), F.col(ROWID_COL), *cols
        )
    out = pieces[0]
    for p in pieces[1:]:
        out = out.unionByName(p)
    return out

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

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from lance_spark.write import ROWID_COL


def _deleted_rowids(ds, spark: SparkSession, paths: list[str]) -> DataFrame | None:
    if not paths:
        return None
    # ds._read_files is the single read seam (absolute clone paths,
    # storage/io layering) — a raw spark.read.parquet copy would drift
    return ds._read_files(spark, paths).select(ROWID_COL)


def _files_replaced(of, nf) -> bool:
    """True when a common fragment's EXISTING column group points at a
    different file (DataReplacement / restore of a column swap) — a
    value change with unchanged rowids. A merely APPENDED group
    (add_columns) is not a replacement of existing values."""
    newby = {tuple(f.columns): f.path for f in nf.files}
    return any(
        tuple(f.columns) in newby and newby[tuple(f.columns)] != f.path
        for f in of.files
    )


def changes(ds, spark: SparkSession, from_version: int, to_version: int | None = None) -> DataFrame:
    """Rows inserted/deleted/updated between two versions. Returns
    ``(_change_type, _rowid, <table columns>)`` — column values populated
    for inserts/updates, null for deletes (the row no longer exists to
    read). ``from_version`` is exclusive, ``to_version`` inclusive
    (defaults to the dataset's current version). ``update`` rows cover
    (a) rows RESURRECTED by a sidecar shrink (restore after a delete) and
    (b) live rows of fragments whose data files were replaced in place
    (DataReplacement) — both invisible to a pure membership diff."""
    old = ds._derived(version=from_version)
    new = ds._derived(version=to_version) if to_version is not None else ds
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
    # (b) common fragments whose deletion sidecar changed: new − old rowids
    # are deletes; old − new are RESURRECTIONS (restore shrank the sidecar)
    new_dels, old_dels, sidecar_fids = [], [], []
    for fid, nf in new_frags.items():
        of = old_frags.get(fid)
        if of is None or nf.deletion_file == of.deletion_file:
            continue
        sidecar_fids.append(fid)
        if nf.deletion_file:
            new_dels.append(nf.deletion_file)
        if of.deletion_file:
            old_dels.append(of.deletion_file)
    nd_raw = _deleted_rowids(new, spark, new_dels)
    od_raw = _deleted_rowids(old, spark, old_dels)
    if nd_raw is not None:
        nd = (
            nd_raw.join(F.broadcast(od_raw), on=ROWID_COL, how="left_anti")
            if od_raw is not None
            else nd_raw
        )
        del_pieces.append(nd)
    dels = None
    if del_pieces:
        dels = del_pieces[0]
        for p in del_pieces[1:]:
            dels = dels.unionByName(p)

    # in-place value swaps (DataReplacement / restore of one): same
    # fragment id, same rowids, different data file → live rows surface
    # as updates with the NEW values (piece appended below)
    replaced = [
        fid
        for fid, nf in new_frags.items()
        if fid in old_frags and _files_replaced(old_frags[fid], nf)
    ]

    # rows live again at ``to``: in the OLD sidecar but not the new one —
    # values read back from the fragments that still hold them. Fragments
    # whose data file was ALSO swapped in the span are excluded at the
    # source: the replaced piece already emits every live row of those
    # fragments (resurrected ones included), so reading them here would
    # emit two 'update' rows for the same _rowid (r12 ADVICE fix)
    resurrected = None
    res_fids = [f for f in sidecar_fids if f not in set(replaced)]
    if od_raw is not None and res_fids:
        back = (
            od_raw.join(F.broadcast(nd_raw), on=ROWID_COL, how="left_anti")
            if nd_raw is not None
            else od_raw
        )
        vals = new._fragment_df(spark, [new_frags[f] for f in res_fids], None)
        resurrected = vals.join(back, on=ROWID_COL, how="left_semi")

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
    if resurrected is not None:
        pieces.append(
            resurrected.select(
                F.lit("update").alias("_change_type"), F.col(ROWID_COL), *cols
            )
        )
    if replaced:
        pieces.append(
            new._fragment_df(spark, [new_frags[f] for f in replaced], None).select(
                F.lit("update").alias("_change_type"), F.col(ROWID_COL), *cols
            )
        )

    if not pieces:
        return new._fragment_df(spark, [], None).select(
            F.lit("insert").alias("_change_type"), F.col(ROWID_COL), *cols
        )
    out = pieces[0]
    for p in pieces[1:]:
        out = out.unionByName(p)
    return out

"""Typed commit operations — reference ``LanceOperation``
(python/python/lance/dataset.py:3710-4100; rust transaction.rs Operation).

The reference lets external writers describe a change as a typed operation
object and commit it against a read version. Here each operation maps to a
pure function over the base manifest; ``commit`` runs it through the
optimistic-concurrency loop (manifest.commit) so racing writers retry on a
fresh base exactly like every built-in mutation.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from lance_spark import manifest as mf


class LanceOperation:
    """Namespace matching the reference's call sites
    (``lance.LanceOperation.Append(frags)`` …)."""

    @dataclass
    class BaseOperation:
        pass

    @dataclass
    class Append(BaseOperation):
        """New fragments added to the dataset (dataset.py:3784-3822)."""

        fragments: list

    @dataclass
    class Overwrite(BaseOperation):
        """Replace all data with a new schema + fragment set
        (dataset.py:3732-3782). ``new_schema`` is a Spark StructType JSON
        dict, a StructType, or a pyarrow Schema."""

        new_schema: object
        fragments: list

    @dataclass
    class Delete(BaseOperation):
        """Rows deleted: rewritten fragments + dropped fragment ids +
        the predicate that caused it (dataset.py:3830-3896)."""

        updated_fragments: list
        deleted_fragment_ids: list
        predicate: str

    @dataclass
    class Update(BaseOperation):
        """Rows updated: removed/updated/new fragment sets
        (dataset.py:3898-3933)."""

        removed_fragment_ids: list = field(default_factory=list)
        updated_fragments: list = field(default_factory=list)
        new_fragments: list = field(default_factory=list)

    @dataclass
    class Merge(BaseOperation):
        """Columns merged in: full fragment set + new schema
        (dataset.py:3935-4002)."""

        fragments: list
        schema: object

    @dataclass
    class Restore(BaseOperation):
        """Restore an old version (dataset.py:4004-4009)."""

        version: int

    @dataclass
    class RewriteGroup:
        """One compaction group (dataset.py:4012-4019)."""

        old_fragments: list
        new_fragments: list

    @dataclass
    class Rewrite(BaseOperation):
        """Compaction: groups of old fragments rewritten to new ones
        (dataset.py:4024-4062). Row counts must be preserved."""

        groups: list

    @dataclass
    class Project(BaseOperation):
        """Schema projection/reorder — metadata only (dataset.py:4064+)."""

        schema: object

    @dataclass
    class CreateIndex(BaseOperation):
        """Register/replace index metadata without a build pass (reference
        test_commit_index.py flow: copy index files, then commit a
        CreateIndex op). ``new_indices`` are ``manifest.IndexMeta`` (or
        equivalent dicts); ``removed_indices`` are index names (or
        IndexMeta) to drop."""

        new_indices: list
        removed_indices: list = field(default_factory=list)


@dataclass
class Transaction:
    """A described-but-uncommitted change (reference dataset.py:3646):
    the operation plus the version it was computed against, carried as a
    value so external writers can hand it to ``commit`` / ``commit_batch``."""

    read_version: int
    operation: "LanceOperation.BaseOperation"
    uuid: str = ""
    transaction_properties: dict | None = field(default_factory=dict)

    def __post_init__(self):
        if not self.uuid:
            import uuid as _uuid

            self.uuid = str(_uuid.uuid4())


def _schema_json(schema) -> dict:
    from pyspark.sql.types import StructType

    if isinstance(schema, dict):
        return schema
    if isinstance(schema, StructType):
        return schema.jsonValue()
    # pyarrow schema
    from lance_spark.types import schema_to_json

    return schema_to_json(schema)


def _apply(op, base: mf.Manifest | None, version: int) -> mf.Manifest:
    O = LanceOperation  # noqa: E741
    if isinstance(op, O.Append):
        assert base is not None, "Append needs an existing dataset"
        frags = base.fragments + list(op.fragments)
        return mf.Manifest.evolve(
            base, version, fragments=frags,
            max_fragment_id=max([f.id for f in frags] + [base.max_fragment_id]),
        )
    if isinstance(op, O.Overwrite):
        frags = list(op.fragments)
        schema = _schema_json(op.new_schema)
        if base is None:
            return mf.Manifest(
                version=version, schema_json=schema, fragments=frags,
                max_fragment_id=max([f.id for f in frags] + [-1]),
                operation="overwrite",
            )
        return mf.Manifest.evolve(
            base, version, schema_json=schema, fragments=frags, indices=[],
            max_fragment_id=max([f.id for f in frags] + [base.max_fragment_id]),
        )
    if isinstance(op, O.Delete):
        assert base is not None
        updated = {f.id: f for f in op.updated_fragments}
        dropped = set(op.deleted_fragment_ids)
        frags = [
            updated.get(f.id, f) for f in base.fragments if f.id not in dropped
        ]
        return mf.Manifest.evolve(base, version, fragments=frags)
    if isinstance(op, O.Update):
        assert base is not None
        updated = {f.id: f for f in op.updated_fragments}
        dropped = set(op.removed_fragment_ids)
        frags = [updated.get(f.id, f) for f in base.fragments if f.id not in dropped]
        frags += list(op.new_fragments)
        return mf.Manifest.evolve(
            base, version, fragments=frags,
            max_fragment_id=max([f.id for f in frags] + [base.max_fragment_id]),
        )
    if isinstance(op, O.Merge):
        assert base is not None
        return mf.Manifest.evolve(
            base, version, fragments=list(op.fragments),
            schema_json=_schema_json(op.schema),
        )
    # Restore is handled in commit() — it resolves the target manifest from
    # the dataset root, which _apply doesn't know
    if isinstance(op, O.Rewrite):
        assert base is not None
        old_ids = {f.id for g in op.groups for f in g.old_fragments}
        new_frags = [f for g in op.groups for f in g.new_fragments]
        old_rows = sum(f.num_rows for f in base.fragments if f.id in old_ids)
        new_rows = sum(f.num_rows for f in new_frags)
        if old_rows != new_rows:
            raise ValueError(
                f"Rewrite must preserve row counts: {old_rows} -> {new_rows}"
            )
        frags = [f for f in base.fragments if f.id not in old_ids] + new_frags
        # rewritten fragments fall out of index coverage; the unindexed-tail
        # union keeps queries correct until optimize_indices re-covers them
        indices = [
            mf.IndexMeta(
                name=i.name, index_type=i.index_type, column=i.column, path=i.path,
                fragment_ids=[fid for fid in i.fragment_ids if fid not in old_ids],
                params=i.params,
            )
            for i in base.indices
        ]
        return mf.Manifest.evolve(
            base, version, fragments=frags, indices=indices,
            max_fragment_id=max([f.id for f in frags] + [base.max_fragment_id]),
        )
    if isinstance(op, O.Project):
        assert base is not None
        return mf.Manifest.evolve(base, version, schema_json=_schema_json(op.schema))
    if isinstance(op, O.CreateIndex):
        assert base is not None
        new = [
            i if isinstance(i, mf.IndexMeta) else mf.IndexMeta.from_json(i)
            for i in op.new_indices
        ]
        removed = {
            i if isinstance(i, str) else i.name for i in op.removed_indices
        } | {i.name for i in new}
        indices = [i for i in base.indices if i.name not in removed] + new
        return mf.Manifest.evolve(base, version, indices=indices)
    raise TypeError(f"unsupported operation: {type(op).__name__}")


_OP_NAMES = {
    "Append": "append", "Overwrite": "overwrite", "Delete": "delete",
    "Update": "update", "Merge": "merge", "Restore": "restore",
    "Rewrite": "rewrite", "Project": "project", "CreateIndex": "create_index",
}


def commit(
    dest,
    operation,
    read_version: int | None = None,
    properties: dict | None = None,
    max_retries: int = 20,
):
    """Apply a typed operation as one new version (reference
    LanceDataset.commit, dataset.py:3059-3223). ``read_version`` is
    advisory here: conflict resolution is the optimistic rebase every
    mutation uses (the builder re-applies against the freshest base)."""
    import os

    from lance_spark.dataset import LanceDataset

    if isinstance(operation, Transaction):
        read_version = operation.read_version
        properties = properties or operation.transaction_properties or None
        operation = operation.operation
    uri = dest.uri if hasattr(dest, "uri") else os.path.abspath(str(dest))
    op_name = _OP_NAMES[type(operation).__name__]

    def build(base, version):
        return _apply(operation, base, version)

    if isinstance(operation, LanceOperation.Restore):
        # Restore resolves against the dataset root, not the base manifest
        snap = mf.read_manifest(uri, operation.version)

        def build(base, version):  # noqa: F811
            return mf.Manifest.evolve(snap, version)

    mf.commit(uri, build, operation=op_name, max_retries=max_retries, properties=properties)
    return LanceDataset(uri)

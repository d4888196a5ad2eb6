"""Manifest / version / transaction layer.

Semantics mirror the reference's table format (WHAT, not HOW):
  - Manifest = schema + fragment list + version + index metadata
    (rust/lance-table/src/format/manifest.rs:35-75, protos/table.proto).
  - Fragment = files covering the same rows + optional deletion file +
    physical_rows (rust/lance-table/src/format/fragment.rs:276-303).
  - Optimistic-concurrency commit: version N+1 is claimed by exclusive
    creation of ``_versions/{N+1}.manifest.json``; on conflict the
    transaction re-reads and retries with a compatibility check
    (rust/lance/src/dataset/transaction.rs:145-280).
  - Tags/branches under ``_refs/`` (rust/lance/src/dataset/refs.rs).

Storage here is JSON-on-filesystem; on an object store the exclusive create
maps to put-if-absent. All manifest operations are driver-side and O(metadata),
never O(data) — the scale-critical property.
"""

from __future__ import annotations

import json
import os
import threading
import time
import uuid
from dataclasses import dataclass, field


class CommitConflictError(Exception):
    """Another writer claimed the target version."""


@dataclass
class DataFile:
    """One column-subset file within a fragment (fragment.rs:27).

    ``columns`` lists the user columns stored in this file; every data file
    also physically stores ``_rowid`` so column groups join on it.
    """

    path: str  # relative to dataset root
    columns: list[str]

    def to_json(self) -> dict:
        return {"path": self.path, "columns": self.columns}

    @staticmethod
    def from_json(d: dict) -> "DataFile":
        return DataFile(path=d["path"], columns=list(d["columns"]))


@dataclass
class DatasetBasePath:
    """Named storage root for multi-base datasets (reference
    lance.DatasetBasePath; dataset.py:2154 add_bases). ``is_dataset_root``
    marks a base that is itself a dataset directory (manifests live there
    too in the reference's layout; informational here)."""

    path: str
    name: str | None = None
    is_dataset_root: bool = False

    def to_json(self) -> dict:
        return {
            "name": self.name or self.path,
            "path": self.path,
            "is_dataset_root": self.is_dataset_root,
        }

    @staticmethod
    def from_json(d: dict) -> "DatasetBasePath":
        return DatasetBasePath(
            path=d["path"], name=d.get("name"),
            is_dataset_root=d.get("is_dataset_root", False),
        )


@dataclass
class Fragment:
    """fragment.rs:276-303 — files + deletion sidecar + physical_rows."""

    id: int
    files: list[DataFile]
    physical_rows: int
    deletion_file: str | None = None  # parquet of deleted _rowid values
    num_deleted_rows: int = 0

    @property
    def num_rows(self) -> int:
        return self.physical_rows - self.num_deleted_rows

    @property
    def num_deletions(self) -> int:
        """Reference FragmentMetadata.num_deletions (fragment.py:129)."""
        return self.num_deleted_rows

    def to_json(self) -> dict:
        return {
            "id": self.id,
            "files": [f.to_json() for f in self.files],
            "physical_rows": self.physical_rows,
            "deletion_file": self.deletion_file,
            "num_deleted_rows": self.num_deleted_rows,
        }

    @staticmethod
    def from_json(d: dict) -> "Fragment":
        return Fragment(
            id=d["id"],
            files=[DataFile.from_json(f) for f in d["files"]],
            physical_rows=d["physical_rows"],
            deletion_file=d.get("deletion_file"),
            num_deleted_rows=d.get("num_deleted_rows", 0),
        )


# Reference-name alias: lance.FragmentMetadata IS our Fragment dataclass
# (same fields: id / files / physical_rows / deletion_file, same
# num_rows / num_deletions / to_json surface; fragment.py:56-140).
FragmentMetadata = Fragment


@dataclass
class Index:
    """Reference ``lance.dataset.Index`` descriptor (dataset.py:3691):
    the shape ``list_indices`` rows take in the reference. Built from our
    IndexMeta — ``fields`` carries column NAMES (the reference uses field
    ids; names are the stable spark-side identifier)."""

    uuid: str
    name: str
    fields: list
    dataset_version: int
    fragment_ids: set
    index_version: int

    @staticmethod
    def from_meta(meta: "IndexMeta", dataset_version: int = 0) -> "Index":
        return Index(
            uuid=meta.path,
            name=meta.name,
            fields=[meta.column],
            dataset_version=dataset_version,
            fragment_ids=set(meta.fragment_ids),
            index_version=int(meta.params.get("index_version", 0)),
        )


@dataclass
class IndexMeta:
    """Secondary-index metadata (rust/lance-index/src/lib.rs:98-130).

    ``fragment_ids`` = coverage bitmap equivalent: which fragments the index
    covers; unindexed fragments get the flat-search union branch.
    """

    name: str
    index_type: str  # IVF_PQ | IVF_FLAT | INVERTED | BTREE | BITMAP | ZONEMAP | NGRAM
    column: str
    path: str  # directory under _indices/, relative to root
    fragment_ids: list[int]
    params: dict = field(default_factory=dict)

    def to_json(self) -> dict:
        return {
            "name": self.name,
            "index_type": self.index_type,
            "column": self.column,
            "path": self.path,
            "fragment_ids": self.fragment_ids,
            "params": self.params,
        }

    @staticmethod
    def from_json(d: dict) -> "IndexMeta":
        return IndexMeta(
            name=d["name"],
            index_type=d["index_type"],
            column=d["column"],
            path=d["path"],
            fragment_ids=list(d["fragment_ids"]),
            params=d.get("params", {}),
        )


@dataclass
class Manifest:
    """manifest.rs:35-75 — one immutable file per version."""

    version: int
    schema_json: dict  # Spark StructType jsonValue (user columns only)
    fragments: list[Fragment]
    max_fragment_id: int
    operation: str  # append/overwrite/delete/update/merge/rewrite/restore/...
    timestamp: float = 0.0
    indices: list[IndexMeta] = field(default_factory=list)
    config: dict = field(default_factory=dict)
    blob_columns: list[str] = field(default_factory=list)
    # per-commit transaction properties (reference Transaction
    # .transaction_properties, dataset.py:3646-3652; the commit message lives
    # under the reference's ``__lance_commit_message`` key). NOT carried
    # forward by evolve() — each version owns its properties.
    properties: dict = field(default_factory=dict)
    # multi-base storage registry (reference DatasetBasePath / add_bases,
    # dataset.py:2154; rust base_paths): named roots fragments may live
    # under. Data files written to a base carry ABSOLUTE paths; files under
    # the primary root stay relative.
    bases: list = field(default_factory=list)  # [{name, path, is_dataset_root}]

    def to_json(self) -> dict:
        return {
            "version": self.version,
            "schema": self.schema_json,
            "fragments": [f.to_json() for f in self.fragments],
            "max_fragment_id": self.max_fragment_id,
            "operation": self.operation,
            "timestamp": self.timestamp,
            "indices": [i.to_json() for i in self.indices],
            "config": self.config,
            "blob_columns": self.blob_columns,
            "properties": self.properties,
            "bases": self.bases,
        }

    @classmethod
    def evolve(cls, base: "Manifest", version: int, **overrides) -> "Manifest":
        """Next-version manifest carrying forward EVERY field from ``base``
        unless explicitly overridden. Commit builders should use this instead
        of the raw constructor so carry-forward fields (``config``,
        ``blob_columns``, ``indices``) are never silently reset to their
        defaults when a new field is added."""
        kw = dict(
            schema_json=base.schema_json,
            fragments=base.fragments,
            max_fragment_id=base.max_fragment_id,
            operation=base.operation,
            indices=base.indices,
            config=base.config,
            blob_columns=base.blob_columns,
            bases=base.bases,
        )
        kw.update(overrides)
        return cls(version=version, **kw)

    @staticmethod
    def from_json(d: dict) -> "Manifest":
        return Manifest(
            version=d["version"],
            schema_json=d["schema"],
            fragments=[Fragment.from_json(f) for f in d["fragments"]],
            max_fragment_id=d["max_fragment_id"],
            operation=d.get("operation", "unknown"),
            timestamp=d.get("timestamp", 0.0),
            indices=[IndexMeta.from_json(i) for i in d.get("indices", [])],
            config=d.get("config", {}),
            blob_columns=d.get("blob_columns", []),
            properties=d.get("properties", {}),
            bases=d.get("bases", []),
        )


# ---------------------------------------------------------------- storage ops


def versions_dir(root: str) -> str:
    return os.path.join(root, "_versions")


def manifest_path(root: str, version: int) -> str:
    return os.path.join(versions_dir(root), f"{version}.manifest.json")


def list_versions(root: str) -> list[int]:
    vd = versions_dir(root)
    if not os.path.isdir(vd):
        return []
    out = []
    for name in os.listdir(vd):
        if name.endswith(".manifest.json"):
            # tolerate foreign files (editor backups, manual copies): a
            # stray 'backup.manifest.json' must not brick every operation
            prefix = name.split(".")[0]
            if prefix.isdigit():
                out.append(int(prefix))
    return sorted(out)


def latest_version(root: str) -> int | None:
    vs = list_versions(root)
    return vs[-1] if vs else None


# process-wide manifest cache (the role of the reference Session's metadata
# cache, dataset.py:3039; rust session.rs). A (root, version) manifest file
# is IMMUTABLE once committed — write_manifest claims the version with an
# exclusive create — so caching the parsed object is correctness-safe.
# "latest" resolution is never cached. Capped LRU; stats feed ds.session().
# Values are (manifest, raw_size_bytes, (mtime_ns, size)) 3-tuples; all
# access goes through _CACHE_LOCK — Spark driver threads read concurrently.
_MANIFEST_CACHE: "dict[tuple[str, int], tuple[Manifest, int, tuple[int, int]]]" = {}
_MANIFEST_CACHE_CAP = 64
_CACHE_STATS = {"hits": 0, "misses": 0}
_CACHE_LOCK = threading.Lock()


def clear_manifest_cache() -> None:
    with _CACHE_LOCK:
        _MANIFEST_CACHE.clear()
        _CACHE_STATS["hits"] = _CACHE_STATS["misses"] = 0


def invalidate_root(root: str) -> None:
    """Drop every cached manifest under ``root`` — required when version
    files are REMOVED (LanceDataset.drop + recreate, cleanup_old_versions),
    the one case where a (root, version) key can be re-claimed."""
    root = os.path.abspath(root)
    with _CACHE_LOCK:
        for key in [k for k in _MANIFEST_CACHE if k[0] == root]:
            _MANIFEST_CACHE.pop(key, None)


def manifest_cache_stats() -> dict:
    with _CACHE_LOCK:
        return {
            "approx_num_items": len(_MANIFEST_CACHE),
            "size_bytes": sum(entry[1] for entry in _MANIFEST_CACHE.values()),
            **_CACHE_STATS,
        }


def read_manifest(root: str, version: int | None = None) -> Manifest:
    if version is None:
        version = latest_version(root)
        if version is None:
            raise FileNotFoundError(f"no dataset at {root}")
    key = (os.path.abspath(root), version)
    path = manifest_path(root, version)
    with _CACHE_LOCK:
        hit = _MANIFEST_CACHE.get(key)
    if hit is not None:
        # one stat() guards against out-of-band rmtree+recreate (a dropped
        # dataset replaced at the same path): the entry is only valid while
        # the file it was parsed from still exists with the same identity
        m, _size, sig = hit
        try:
            st = os.stat(path)
            if (st.st_mtime_ns, st.st_size) == sig:
                with _CACHE_LOCK:
                    _CACHE_STATS["hits"] += 1
                    if key in _MANIFEST_CACHE:
                        # LRU, not FIFO: a hit refreshes recency, or the
                        # hottest (oldest-inserted) entry evicts first
                        _MANIFEST_CACHE[key] = _MANIFEST_CACHE.pop(key)
                return m
        except FileNotFoundError:
            pass
        with _CACHE_LOCK:
            _MANIFEST_CACHE.pop(key, None)
    with open(path) as fh:
        # fstat the OPEN fd: stat'ing the path after the read could
        # describe a DIFFERENT file (rmtree+recreate between read and
        # stat), caching old content under the new file's signature
        st = os.fstat(fh.fileno())
        raw = fh.read()
    m = Manifest.from_json(json.loads(raw))
    with _CACHE_LOCK:
        _CACHE_STATS["misses"] += 1
        while len(_MANIFEST_CACHE) >= _MANIFEST_CACHE_CAP:
            try:
                _MANIFEST_CACHE.pop(next(iter(_MANIFEST_CACHE)), None)
            except StopIteration:  # racing clear emptied it
                break
        _MANIFEST_CACHE[key] = (m, len(raw), (st.st_mtime_ns, st.st_size))
    return m


def write_manifest(root: str, manifest: Manifest) -> None:
    """Atomically claim manifest.version via exclusive create.

    Write-to-temp + hard-link-into-place gives atomic put-if-absent on POSIX;
    on S3-class stores this is a conditional PUT (If-None-Match).
    """
    os.makedirs(versions_dir(root), exist_ok=True)
    manifest.timestamp = time.time()
    target = manifest_path(root, manifest.version)
    tmp = os.path.join(versions_dir(root), f".tmp-{uuid.uuid4().hex}.json")
    try:
        # dump inside the try: a serialization error (non-JSON property
        # value) must not leak the tmp file forever — GC never reclaims
        # .tmp-* under _versions/
        with open(tmp, "w") as fh:
            json.dump(manifest.to_json(), fh)
        os.link(tmp, target)  # fails with EEXIST if version already claimed
    except FileExistsError as exc:
        raise CommitConflictError(f"version {manifest.version} already exists") from exc
    finally:
        try:
            os.unlink(tmp)
        except FileNotFoundError:
            pass
    # a prior dataset at this root may have been dropped: the freshly
    # claimed version supersedes any stale cache entry for the key
    with _CACHE_LOCK:
        _MANIFEST_CACHE.pop((os.path.abspath(root), manifest.version), None)


# Conflict handling: every conflict is resolved by rebuild-and-retry (the
# build closure re-reads the fresh base), with mutation-level staleness
# checks (StaleSnapshotError) where a blind rebase would be wrong. There is
# deliberately NO operation-compatibility matrix here.


def commit(
    root: str,
    build_manifest,
    operation: str,
    max_retries: int = 10,
    properties: dict | None = None,
    commit_lock=None,
) -> Manifest:
    """Optimistic-concurrency commit loop (dataset.py:197-222 semantics).

    ``build_manifest(base: Manifest | None, version: int) -> Manifest`` is
    called with the freshest base manifest; on conflict we re-read and rebuild.
    ``properties`` become the version's transaction properties
    (reference ``transaction_properties`` / ``commit_message``).

    ``commit_lock`` (reference commit.py CommitLock): a callable taking the
    version and returning a context manager; the manifest write happens
    inside it. Needed only for stores without atomic put-if-absent — the
    local path already gets atomicity from exclusive hard-link creation, so
    the lock is belt-and-braces there.
    """
    for _attempt in range(max_retries):
        latest = latest_version(root)
        base = read_manifest(root, latest) if latest is not None else None
        version = (latest or 0) + 1
        manifest = build_manifest(base, version)
        manifest.operation = operation
        if properties:
            manifest.properties = {**manifest.properties, **properties}
        try:
            if commit_lock is not None:
                with commit_lock(version):
                    write_manifest(root, manifest)
            else:
                write_manifest(root, manifest)
            _log().info(
                "commit %s version=%d root=%s fragments=%d",
                operation, version, root, len(manifest.fragments),
            )
            from lance_spark.tracing import emit

            emit(
                "lance_spark::commit", operation=operation, version=version,
                root=root, fragments=len(manifest.fragments),
            )
            _maybe_auto_cleanup(root, manifest)
            return manifest
        except CommitConflictError:
            _log().debug("commit conflict on %s version=%d root=%s", operation, version, root)
            continue
    raise CommitConflictError(f"commit of {operation} failed after {max_retries} retries")


def _log():
    from lance_spark.log import LOGGER

    return LOGGER


def _parse_duration_seconds(text: str) -> float:
    """`lance.auto_cleanup.older_than` values: bare seconds or a number
    with an s/m/h/d suffix (the subset of humantime the reference's config
    examples use — cleanup.rs parse_duration)."""
    text = str(text).strip()
    mult = {"s": 1, "m": 60, "h": 3600, "d": 86400}.get(text[-1:].lower())
    if mult is not None:
        return float(text[:-1].strip()) * mult
    return float(text)


#: Default cleanup cutoff when ``lance.auto_cleanup.older_than`` is absent:
#: two weeks, the reference's cleanup default (python dataset.py:2180
#: ``older_than: timedelta = timedelta(days=14)``). A missing key must NOT
#: mean "delete everything immediately".
AUTO_CLEANUP_DEFAULT_OLDER_THAN = 14 * 24 * 3600.0

_AUTO_CLEANUP_KEYS = (
    "lance.auto_cleanup.interval",
    "lance.auto_cleanup.older_than",
    "lance.auto_cleanup.retain_versions",
)


def validate_auto_cleanup_config(config: dict) -> None:
    """Reject malformed ``lance.auto_cleanup.*`` values at SET time
    (enable_auto_cleanup / update_config / write_dataset) so a bad value can
    never enter the manifest. The commit-time hook itself never raises —
    the reference logs all auto_cleanup_hook errors and never fails the
    commit (io/commit.rs:904-906) — so this is the only place a
    misconfiguration surfaces loudly."""
    interval = config.get("lance.auto_cleanup.interval")
    if interval is not None:
        try:
            interval = int(interval)
        except (TypeError, ValueError):
            raise ValueError(
                f"lance.auto_cleanup.interval must be an integer: {interval!r}"
            ) from None
        if interval <= 0:
            raise ValueError(
                f"lance.auto_cleanup.interval must be positive: {interval}"
            )
    older = config.get("lance.auto_cleanup.older_than")
    if older is not None:
        try:
            if _parse_duration_seconds(older) < 0:
                raise ValueError("negative")
        except (TypeError, ValueError):
            raise ValueError(
                "lance.auto_cleanup.older_than must be a non-negative duration "
                f"like '3600s' or '14d': {older!r}"
            ) from None
    retain = config.get("lance.auto_cleanup.retain_versions")
    if retain is not None:
        try:
            retain = int(retain)
        except (TypeError, ValueError):
            raise ValueError(
                f"lance.auto_cleanup.retain_versions must be an integer: {retain!r}"
            ) from None
        if retain < 0:
            raise ValueError(
                f"lance.auto_cleanup.retain_versions must be >= 0: {retain}"
            )


def _maybe_auto_cleanup(root: str, manifest: "Manifest") -> None:
    """Auto-GC on commit (reference cleanup.rs:554 auto_cleanup_hook): when
    the dataset config carries ``lance.auto_cleanup.interval`` and the new
    version is a multiple of it, run ``cleanup_old_versions`` with
    ``.older_than`` (two weeks when absent, the reference cleanup default)
    and optional ``.retain_versions``, keep_tagged=True,
    delete_unverified=False. The commit is already durable when this runs,
    so NOTHING here may raise — the reference logs all auto_cleanup_hook
    errors and never fails the commit (io/commit.rs:904-906). Bad config
    values are rejected earlier, at set time (validate_auto_cleanup_config);
    anything that still slips through (or any GC IO error) only logs."""
    if manifest.config.get("lance.auto_cleanup.interval") is None:
        return
    try:
        interval = int(manifest.config["lance.auto_cleanup.interval"])
        if interval <= 0 or manifest.version % interval != 0:
            return
        older = manifest.config.get("lance.auto_cleanup.older_than")
        older = (
            _parse_duration_seconds(older)
            if older is not None
            else AUTO_CLEANUP_DEFAULT_OLDER_THAN
        )
        retain = manifest.config.get("lance.auto_cleanup.retain_versions")
        retain = int(retain) if retain is not None else None

        from types import SimpleNamespace

        from lance_spark.maintenance import cleanup_old_versions

        removed = cleanup_old_versions(
            SimpleNamespace(uri=root), older_than_seconds=older,
            keep_tagged=True, delete_unverified=False,
            retain_versions=retain,
        )
        if removed:
            _log().info("auto-cleanup v%d: removed %d files", manifest.version, removed)
    except Exception as e:  # noqa: BLE001 - commit must never appear failed
        _log().warning("auto-cleanup after v%d failed: %s", manifest.version, e)


def reserve_fragment_ids(root: str, n: int) -> int:
    """Claim a contiguous fragment-id range via a metadata-only commit
    (Operation::ReserveFragments, transaction.rs) — parallel writers get
    disjoint ranges, so their fragment files (whose rowids embed the id)
    never need rewriting at commit time. Returns the first reserved id."""
    out = {}

    def build(base: Manifest | None, version: int) -> Manifest:
        if base is None:
            raise FileNotFoundError(
                f"cannot reserve fragment ids: no dataset at {root}"
            )
        start = base.max_fragment_id + 1
        out["start"] = start
        return Manifest.evolve(
            base, version, operation="reserve_fragments",
            max_fragment_id=start + n - 1,
        )

    commit(root, build, operation="reserve_fragments")
    return out["start"]


def cloned_manifest(src_uri: str, src: "Manifest", version: int) -> "Manifest":
    """Manifest for a zero-copy clone of ``src`` (Operation::Clone,
    transaction.rs:273-280): fragments, deletion sidecars, and index paths
    reference the source IN PLACE by absolute path — O(metadata). Shared by
    ``LanceDataset.shallow_clone`` and the typed ``LanceOperation.Clone``
    commit path."""

    def _abs(p: str) -> str:
        return p if os.path.isabs(p) else os.path.join(src_uri, p)

    frags = [
        Fragment(
            id=f.id,
            files=[DataFile(_abs(df.path), list(df.columns)) for df in f.files],
            physical_rows=f.physical_rows,
            deletion_file=_abs(f.deletion_file) if f.deletion_file else None,
            num_deleted_rows=f.num_deleted_rows,
        )
        for f in src.fragments
    ]
    indices = [
        IndexMeta(
            name=i.name,
            index_type=i.index_type,
            column=i.column,
            path=_abs(i.path),
            fragment_ids=list(i.fragment_ids),
            params=dict(i.params),
        )
        for i in src.indices
    ]
    return Manifest(
        version=version,
        schema_json=src.schema_json,
        fragments=frags,
        max_fragment_id=src.max_fragment_id,
        operation="clone",
        indices=indices,
        config={**src.config, "cloned_from": {"uri": src_uri, "version": src.version}},
        blob_columns=list(src.blob_columns),
        bases=list(src.bases),
    )


# ------------------------------------------------------------------- refs


def _refs_dir(root: str, kind: str) -> str:
    return os.path.join(root, "_refs", kind)


_REF_NOUN = {"tags": "tag", "branches": "branch"}


def _ref_path(root: str, kind: str, name: str) -> str:
    """Validated ref file path. Names are plain identifiers — a name with a
    path separator or '..' would escape _refs/ (delete_tag('../../_versions/
    3.manifest') could unlink a committed version)."""
    if (
        not name
        or name != os.path.basename(name)
        or name in (".", "..")
        or name.startswith(".")
        or "\\" in name
    ):
        raise ValueError(
            f"invalid {_REF_NOUN.get(kind, kind)} name {name!r}: must be a"
            " plain file name (no path separators, not starting with '.')"
        )
    return os.path.join(_refs_dir(root, kind), f"{name}.json")


def create_ref(root: str, kind: str, name: str, version: int) -> None:
    path = _ref_path(root, kind, name)
    os.makedirs(os.path.dirname(path), exist_ok=True)
    # exclusive create via tmp + hard link (the manifest protocol): an
    # exists-check-then-write race would let two creators both 'succeed'
    tmp = os.path.join(os.path.dirname(path), f".tmp-{uuid.uuid4().hex}.json")
    try:
        with open(tmp, "w") as fh:
            json.dump({"version": version}, fh)
        os.link(tmp, path)
    except FileExistsError:
        raise ValueError(
            f"{_REF_NOUN.get(kind, kind)} {name} already exists"
        ) from None
    finally:
        try:
            os.unlink(tmp)
        except FileNotFoundError:
            pass


def delete_ref(root: str, kind: str, name: str) -> None:
    os.unlink(_ref_path(root, kind, name))


def update_ref(root: str, kind: str, name: str, version: int) -> None:
    path = _ref_path(root, kind, name)
    if not os.path.exists(path):
        raise ValueError(f"{_REF_NOUN.get(kind, kind)} {name} does not exist")
    # atomic swap: truncate-in-place would expose a torn/empty file to a
    # concurrent resolve_ref
    tmp = os.path.join(os.path.dirname(path), f".tmp-{uuid.uuid4().hex}.json")
    with open(tmp, "w") as fh:
        json.dump({"version": version}, fh)
    os.replace(tmp, path)


def resolve_ref(root: str, kind: str, name: str) -> int:
    with open(_ref_path(root, kind, name)) as fh:
        return json.load(fh)["version"]


def list_refs(root: str, kind: str) -> dict[str, int]:
    d = _refs_dir(root, kind)
    if not os.path.isdir(d):
        return {}
    out = {}
    for name in os.listdir(d):
        if name.endswith(".json") and not name.startswith("."):
            with open(os.path.join(d, name)) as fh:
                out[name[: -len(".json")]] = json.load(fh)["version"]
    return out


# tags = refs of kind "tags" (back-compat names)
def create_tag(root: str, name: str, version: int) -> None:
    create_ref(root, "tags", name, version)


def delete_tag(root: str, name: str) -> None:
    delete_ref(root, "tags", name)


def update_tag(root: str, name: str, version: int) -> None:
    update_ref(root, "tags", name, version)


def resolve_tag(root: str, name: str) -> int:
    return resolve_ref(root, "tags", name)


def list_tags(root: str) -> dict[str, int]:
    return list_refs(root, "tags")

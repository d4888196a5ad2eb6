"""Directory-backed namespace (catalog) for lance_spark datasets.

Reference surface: python/python/lance/namespace.py:62-180
(``DirectoryNamespace`` over the lance-namespace spec — create/list/
describe/drop namespaces and tables, register/deregister, create_table).
There the implementation is a Rust ``PyDirectoryNamespace`` with a
manifest table; here a namespace is a filesystem directory tree:

    root/
      ns_a/                      <- namespace (directory)
        $namespace.json          <- marker + properties
        tbl1/                    <- table = a lance_spark dataset
          _versions/...
      ns_a$children...           (namespaces nest arbitrarily)

The root itself is the default (empty-id) namespace. Identifiers are
lists of path segments, matching the spec's multi-level ids (a plain
string is accepted as a single segment). Registration supports tables
living OUTSIDE the tree via a ``$tables.json`` mapping per namespace —
the spec's register/deregister surface.

All operations are O(directory listing) driver-side metadata — nothing
here touches data files, so the catalog works unchanged whether the
datasets hold 60k rows or 100 TB.
"""

from __future__ import annotations

import json
import os
import shutil

_NS_MARKER = "$namespace.json"
_REG_FILE = "$tables.json"


def _segments(ident) -> list[str]:
    if ident is None:
        return []
    if isinstance(ident, str):
        ident = [ident] if ident else []
    segs = list(ident)
    for s in segs:
        # '..'/'.' would traverse OUT of the catalog root: create_namespace
        # could write into the root's parent and a CASCADE drop could
        # rmtree it — never allow path-like segments
        if (
            not s
            or "/" in s
            or "\\" in s
            or s in (".", "..")
            or s.startswith("$")
        ):
            raise ValueError(f"invalid identifier segment: {s!r}")
    return segs


def _is_dataset(path: str) -> bool:
    return os.path.isdir(os.path.join(path, "_versions"))


class DirectoryNamespace:
    """Filesystem-directory catalog of lance_spark datasets."""

    def __init__(self, root: str, **properties):
        self.root = os.path.abspath(root)
        self.properties = {str(k): str(v) for k, v in properties.items()}
        os.makedirs(self.root, exist_ok=True)

    def namespace_id(self) -> str:
        return self.root

    def __repr__(self) -> str:
        return f"DirectoryNamespace(root={self.root!r})"

    # ------------------------------------------------------------ paths

    def _ns_path(self, ident, must_exist: bool = True) -> str:
        segs = _segments(ident)
        path = os.path.join(self.root, *segs)
        if must_exist and segs and not os.path.isfile(os.path.join(path, _NS_MARKER)):
            raise ValueError(f"namespace does not exist: {'.'.join(segs)}")
        return path

    def _registry(self, ns_path: str) -> dict[str, str]:
        reg = os.path.join(ns_path, _REG_FILE)
        if os.path.isfile(reg):
            with open(reg) as f:
                return json.load(f)
        return {}

    def _write_registry(self, ns_path: str, reg: dict[str, str]) -> None:
        # atomic swap: a crash mid-dump would leave truncated JSON that
        # bricks every later list/open on this namespace
        import uuid

        path = os.path.join(ns_path, _REG_FILE)
        tmp = os.path.join(ns_path, f"${uuid.uuid4().hex}.tmp")
        with open(tmp, "w") as f:
            json.dump(reg, f, indent=1, sort_keys=True)
        os.replace(tmp, path)

    def _table_path(self, ident) -> tuple[str, str, str]:
        """→ (ns_path, table_name, table_uri); resolves registrations."""
        segs = _segments(ident)
        if not segs:
            raise ValueError("table identifier is empty")
        ns_path = self._ns_path(segs[:-1])
        name = segs[-1]
        uri = self._registry(ns_path).get(name, os.path.join(ns_path, name))
        return ns_path, name, uri

    # ------------------------------------------------------- namespaces

    def create_namespace(self, ident, properties: dict | None = None) -> dict:
        segs = _segments(ident)
        if not segs:
            raise ValueError("cannot create the root namespace")
        self._ns_path(segs[:-1])  # parent must exist
        path = os.path.join(self.root, *segs)
        marker = os.path.join(path, _NS_MARKER)
        if os.path.isfile(marker):
            raise ValueError(f"namespace already exists: {'.'.join(segs)}")
        if _is_dataset(path):
            # a namespace marker inside a dataset dir would let a later
            # drop_namespace RESTRICT pass (datasets hold no child tables)
            # and rmtree the dataset — silent data loss
            raise ValueError(
                f"a table already exists at: {'.'.join(segs)}"
            )
        os.makedirs(path, exist_ok=True)
        with open(marker, "w") as f:
            json.dump({"properties": dict(properties or {})}, f)
        return {"properties": dict(properties or {})}

    def list_namespaces(self, ident=None) -> list[str]:
        path = self._ns_path(ident)
        if not os.path.isdir(path):
            return []
        return sorted(
            d
            for d in os.listdir(path)
            if os.path.isfile(os.path.join(path, d, _NS_MARKER))
        )

    def describe_namespace(self, ident=None) -> dict:
        path = self._ns_path(ident)
        marker = os.path.join(path, _NS_MARKER)
        if os.path.isfile(marker):
            with open(marker) as f:
                return json.load(f)
        return {"properties": dict(self.properties)}  # root

    def namespace_exists(self, ident) -> bool:
        try:
            self._ns_path(ident)
            return True
        except ValueError:
            return False

    def drop_namespace(self, ident, behavior: str = "RESTRICT") -> None:
        segs = _segments(ident)
        if not segs:
            raise ValueError("cannot drop the root namespace")
        if behavior.upper() not in ("RESTRICT", "CASCADE"):
            # a typo'd behavior must never fall through to cascade — that
            # deletes every managed table under the namespace
            raise ValueError(
                f"unknown drop behavior {behavior!r}: use RESTRICT or CASCADE"
            )
        path = self._ns_path(segs)
        if behavior.upper() == "RESTRICT" and (
            self.list_tables(segs) or self.list_namespaces(segs)
        ):
            raise ValueError(f"namespace not empty: {'.'.join(segs)}")
        shutil.rmtree(path)

    # ----------------------------------------------------------- tables

    def list_tables(self, ident=None) -> list[str]:
        path = self._ns_path(ident)
        if not os.path.isdir(path):
            return []
        names = {
            d for d in os.listdir(path) if _is_dataset(os.path.join(path, d))
        }
        names.update(self._registry(path))
        return sorted(names)

    def table_exists(self, ident) -> bool:
        try:
            _, _, uri = self._table_path(ident)
        except ValueError:
            return False
        return _is_dataset(uri)

    def describe_table(self, ident) -> dict:
        _, name, uri = self._table_path(ident)
        if not _is_dataset(uri):
            raise ValueError(f"table does not exist: {name}")
        from lance_spark.dataset import dataset

        ds = dataset(uri)
        # namespace-level properties (root + owning namespace marker) ARE
        # the table's storage options — the credential path the
        # StorageOptionsProvider docstring promises
        segs = _segments(ident)
        opts = dict(self.properties)
        opts.update(self.describe_namespace(segs[:-1]).get("properties", {}))
        return {
            "location": uri,
            "version": ds.version,
            "schema": ds.manifest.schema_json,
            "stats": ds.stats(),
            "storage_options": opts,
        }

    def create_table(self, ident, df, mode: str = "create"):
        """Write ``df`` (Spark or pandas DataFrame) as a new table."""
        from lance_spark.dataset import dataset
        from lance_spark.write import write_dataset

        ns_path, name, uri = self._table_path(ident)
        if name in self._registry(ns_path):
            raise ValueError(f"table name is registered elsewhere: {name}")
        if os.path.isfile(os.path.join(uri, _NS_MARKER)):
            # writing _versions into a namespace dir creates a dual
            # identity; a later drop_table would rmtree the whole subtree
            # including nested namespaces and their tables
            raise ValueError(f"a namespace already exists at: {name}")
        write_dataset(df, uri, mode=mode)
        return dataset(uri)

    def open_table(self, ident):
        _, name, uri = self._table_path(ident)
        if not _is_dataset(uri):
            raise ValueError(f"table does not exist: {name}")
        from lance_spark.dataset import dataset

        return dataset(uri)

    def register_table(self, ident, location: str) -> None:
        """Attach an existing dataset (anywhere on disk) under this name."""
        ns_path, name, uri = self._table_path(ident)
        if not _is_dataset(location):
            raise ValueError(f"not a lance_spark dataset: {location}")
        reg = self._registry(ns_path)
        if _is_dataset(uri) or name in reg:
            raise ValueError(f"table already exists: {name}")
        if os.path.isfile(os.path.join(ns_path, name, _NS_MARKER)):
            # a name can't be both a child namespace and a table
            raise ValueError(f"a namespace already exists at: {name}")
        reg[name] = os.path.abspath(location)
        self._write_registry(ns_path, reg)

    def deregister_table(self, ident) -> str:
        """Detach a registered name (the dataset files are untouched)."""
        ns_path, name, uri = self._table_path(ident)
        reg = self._registry(ns_path)
        if name not in reg:
            raise ValueError(f"table is not registered (managed tables use drop_table): {name}")
        del reg[name]
        self._write_registry(ns_path, reg)
        return uri

    def drop_table(self, ident) -> None:
        """Drop a managed table (delete files) or deregister an external one."""
        ns_path, name, uri = self._table_path(ident)
        reg = self._registry(ns_path)
        if name in reg:
            del reg[name]
            self._write_registry(ns_path, reg)
            return
        if not _is_dataset(uri):
            raise ValueError(f"table does not exist: {name}")
        shutil.rmtree(uri)


class LanceNamespaceStorageOptionsProvider:
    """Namespace-backed storage options (reference namespace.py:392):
    fetch fresh table location + storage options from the namespace's
    ``describe_table`` on every call — the refresh path time-limited
    object-store credentials need. With DirectoryNamespace the options are
    the namespace properties (local fs needs no credentials); a remote
    namespace implementation returns its temporary credentials here."""

    def __init__(self, namespace, table_id):
        self.namespace = namespace
        # _segments, not list(): a plain-string id is ONE segment
        # everywhere else in this module — list('orders') would split it
        # into single characters
        self.table_id = _segments(table_id)

    def fetch_storage_options(self) -> dict:
        desc = self.namespace.describe_table(self.table_id)
        opts = dict(desc.get("storage_options") or {})
        opts.setdefault("location", desc["location"])
        return opts

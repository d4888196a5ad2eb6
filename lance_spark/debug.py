"""Human-readable format dumps — reference python/python/lance/debug.py
(format_manifest / format_fragment / format_schema / list_transactions,
backed by rust/lance/src/utils/tfrecord.rs-adjacent debug impls).

Pure driver-side string formatting over manifest dataclasses; no Spark.
"""

from __future__ import annotations

import datetime

from lance_spark import manifest as mf


def _ts(t: float) -> str:
    if not t:
        return "-"
    return datetime.datetime.fromtimestamp(t, tz=datetime.timezone.utc).isoformat()


def format_schema(ds) -> str:
    """Schema tree with per-field metadata (reference format_schema)."""
    lines = ["Schema {"]

    def walk(fields: list[dict], indent: int) -> None:
        pad = "  " * indent
        for f in fields:
            t = f["type"]
            tname = t["type"] if isinstance(t, dict) else str(t)
            meta = f.get("metadata") or {}
            suffix = f"  metadata={meta}" if meta else ""
            lines.append(f"{pad}{f['name']}: {tname}{'' if f.get('nullable', True) else ' NOT NULL'}{suffix}")
            if isinstance(t, dict) and t.get("type") == "struct":
                walk(t["fields"], indent + 1)

    walk(ds.manifest.schema_json["fields"], 1)
    lines.append("}")
    return "\n".join(lines)


def format_fragment(fragment: mf.Fragment, ds=None) -> str:
    """One fragment's physical layout (reference format_fragment)."""
    lines = [f"Fragment {fragment.id} {{"]
    lines.append(f"  physical_rows: {fragment.physical_rows}")
    lines.append(f"  num_rows (live): {fragment.num_rows}")
    for i, df in enumerate(fragment.files):
        role = "base" if i == 0 else "column-group"
        lines.append(f"  file[{i}] ({role}): {df.path}  columns={df.columns}")
    if fragment.deletion_file:
        lines.append(
            f"  deletion_file: {fragment.deletion_file} ({fragment.num_deleted_rows} rows)"
        )
    lines.append("}")
    return "\n".join(lines)


def format_manifest(ds) -> str:
    """Whole-manifest dump (reference format_manifest)."""
    m = ds.manifest
    lines = [
        f"Manifest(version={m.version}, operation={m.operation}, timestamp={_ts(m.timestamp)}) {{",
        f"  fragments: {len(m.fragments)}  rows: {sum(f.num_rows for f in m.fragments)}"
        f"  deleted: {sum(f.num_deleted_rows for f in m.fragments)}",
        f"  max_fragment_id: {m.max_fragment_id}",
    ]
    if m.blob_columns:
        lines.append(f"  blob_columns: {m.blob_columns}")
    if m.config:
        lines.append(f"  config: {m.config}")
    if m.properties:
        lines.append(f"  properties: {m.properties}")
    for idx in m.indices:
        lines.append(
            f"  index {idx.name}: {idx.index_type} on {idx.column} "
            f"covering {len(idx.fragment_ids)} fragments at {idx.path}"
        )
    for frag in m.fragments:
        lines.extend("  " + ln for ln in format_fragment(frag).splitlines())
    lines.append("}")
    return "\n".join(lines)


def list_transactions(ds, max_transactions: int = 10) -> list[str]:
    """Recent transactions, newest first (reference list_transactions)."""
    out = []
    for tx in ds.get_transactions(max_transactions):
        if tx is None:
            continue
        props = f"  props={tx['transaction_properties']}" if tx["transaction_properties"] else ""
        out.append(
            f"version {tx['version']}: {tx['operation']} "
            f"(read_version={tx['read_version']}, {_ts(tx['timestamp'])}){props}"
        )
    return out

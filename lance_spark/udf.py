"""Batch-UDF surface for ``add_columns``: declared output schema +
resumable checkpointing.

Reference surface: python/python/lance/udf.py:24-166 — ``@batch_udf
(output_schema=..., checkpoint_file=...)`` wraps a batch function so an
interrupted ``add_columns`` can resume without recomputing finished
batches (there: per-batch results in a SQLite sidecar).

Spark-first HOW: within one run, task retries already re-run failed
batches (lineage), so the durable unit here is the FRAGMENT — the same
granularity the reference commits (one new DataFile per fragment).
``add_columns`` writes each fragment's column-group file, then drops a
JSON marker in the checkpoint directory; a rerun skips every marked
fragment BEFORE the UDF runs (a pushed-down fragment-id filter), computes
only the remainder, and commits the union. Fragment markers are
O(fragments) driver metadata — nothing about this path scales with rows.
"""

from __future__ import annotations

import json
import os

from pyspark.sql.types import StructType


class BatchUDF:
    """Wraps ``fn(pandas.DataFrame) -> pandas.DataFrame`` for add_columns.

    ``output_schema`` (Spark StructType, DDL string, or pyarrow Schema)
    skips the one-row probe — required when ``fn`` can't run on a
    single-row sample (e.g. model batching). ``checkpoint_file`` names a
    directory holding per-fragment completion markers.
    """

    def __init__(self, func, output_schema=None, checkpoint_file: str | None = None):
        self.func = func
        self.output_schema = _as_spark_schema(output_schema)
        self.checkpoint_file = checkpoint_file
        self.__name__ = getattr(func, "__name__", "batch_udf")

    def __call__(self, pdf):
        return self.func(pdf)


def batch_udf(output_schema=None, checkpoint_file: str | None = None):
    """Decorator form (udf.py:61-93): ``@batch_udf(output_schema=...)``."""

    def inner(func):
        return BatchUDF(func, output_schema=output_schema, checkpoint_file=checkpoint_file)

    return inner


def _as_spark_schema(schema) -> StructType | None:
    if schema is None or isinstance(schema, StructType):
        return schema
    if isinstance(schema, str):
        return StructType.fromDDL(schema)
    try:
        import pyarrow as pa

        if isinstance(schema, pa.Schema):
            from pyspark.sql.pandas.types import from_arrow_schema

            return from_arrow_schema(schema)
    except ImportError:
        pass
    raise TypeError(f"output_schema must be StructType, DDL string, or pyarrow Schema, got {type(schema)}")


class FragmentCheckpoint:
    """Per-fragment completion markers: ``<dir>/frag-<id>.json`` holding the
    committed column-group file's relative path and row count."""

    def __init__(self, path: str):
        self.path = path
        os.makedirs(path, exist_ok=True)

    def _marker(self, fragment_id: int) -> str:
        return os.path.join(self.path, f"frag-{fragment_id}.json")

    def get(self, fragment_id: int) -> dict | None:
        try:
            with open(self._marker(fragment_id)) as f:
                return json.load(f)
        except FileNotFoundError:
            return None

    def put(self, fragment_id: int, rel_path: str, num_rows: int) -> None:
        tmp = self._marker(fragment_id) + ".tmp"
        with open(tmp, "w") as f:
            json.dump({"path": rel_path, "num_rows": num_rows}, f)
        os.replace(tmp, self._marker(fragment_id))

    def done(self) -> dict[int, dict]:
        out = {}
        for name in os.listdir(self.path):
            if name.startswith("frag-") and name.endswith(".json"):
                fid = int(name[len("frag-"):-len(".json")])
                with open(os.path.join(self.path, name)) as f:
                    out[fid] = json.load(f)
        return out

    def cleanup(self) -> None:
        import shutil

        shutil.rmtree(self.path, ignore_errors=True)

"""Arrow→Spark type normalization for ingest.

The reference accepts arrow types Spark has no runtime type for
(rust/lance-core/src/datatypes.rs:160-190): dictionary-encoded columns
(:166-173 — storage detail, not semantics), the ``lance.bfloat16``
extension (:186, storage fixed_size_binary(2)), large_string/large_binary,
and fixed-size lists. ``normalize_arrow_table`` maps each onto the Spark
type that preserves its SEMANTICS so ``write_dataset(pa.Table)`` round-trips:

  dictionary<V>            → V (decoded; dictionaries are an encoding)
  lance.bfloat16 extension → float32 (bf16 is the top half of an f32)
  large_string/large_binary/large_list → string/binary/list
  fixed_size_list<T, n>    → list<T>

Spark-side parquet then re-applies dictionary encoding where it pays —
the encoding choice belongs to the writer, not the logical schema.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

BFLOAT16_EXTENSION = "lance.bfloat16"


def _decode_bf16(arr: pa.Array) -> pa.Array:
    """fixed_size_binary(2) little-endian bf16 payloads → float32.

    Vectorized: the fixed-size-binary data buffer is a contiguous u16 run;
    widening each to the top half of a u32 bit-pattern IS the bf16→f32
    conversion (bf16 = f32 with the low 16 mantissa bits dropped)."""
    storage = arr.storage if isinstance(arr, pa.ExtensionArray) else arr
    data = storage.buffers()[1]
    u16 = np.frombuffer(data, dtype="<u2", count=len(storage), offset=storage.offset * 2)
    f32 = (u16.astype(np.uint32) << 16).view(np.float32)
    mask = ~np.asarray(storage.is_valid(), dtype=bool)
    return pa.array(f32, mask=mask)


def _norm_value_type(vt: pa.DataType) -> pa.DataType:
    # f16 has no Spark runtime type; widen to f32 (the reference's
    # _cast_list_f16 seam, rust/lance-datafusion/src/planner.rs:63-155,
    # crossed in the opposite direction on ingest)
    return pa.float32() if pa.types.is_float16(vt) else vt


def _norm_nested_type(t: pa.DataType) -> pa.DataType:
    """Recursively normalized type for STRUCT/MAP-nested children — the
    top-level rules applied at depth (r12 review: struct<f:float16> passed
    through untouched and crashed Spark conversion)."""
    if isinstance(t, pa.ExtensionType):
        if t.extension_name == BFLOAT16_EXTENSION:
            return pa.float32()
        return _norm_nested_type(t.storage_type)
    if pa.types.is_float16(t):
        return pa.float32()
    if pa.types.is_large_string(t):
        return pa.string()
    if pa.types.is_large_binary(t):
        return pa.binary()
    if pa.types.is_dictionary(t):
        return _norm_nested_type(t.value_type)
    if pa.types.is_struct(t):
        return pa.struct(
            [
                pa.field(f.name, _norm_nested_type(f.type), nullable=f.nullable)
                for f in t
            ]
        )
    if pa.types.is_map(t):
        return pa.map_(_norm_nested_type(t.key_type), _norm_nested_type(t.item_type))
    if (
        pa.types.is_list(t)
        or pa.types.is_large_list(t)
        or pa.types.is_fixed_size_list(t)
    ):
        return pa.list_(_norm_nested_type(t.value_type))
    return t


def _normalize_array(arr: pa.ChunkedArray) -> pa.ChunkedArray:
    t = arr.type
    if isinstance(t, pa.ExtensionType) and t.extension_name == BFLOAT16_EXTENSION:
        # type= so a ZERO-chunk bf16 column still yields a float32 column
        # instead of ArrowInvalid (r12 review: empty-table writes)
        return pa.chunked_array([_decode_bf16(c) for c in arr.chunks], type=pa.float32())
    if isinstance(t, pa.ExtensionType):
        # generic extension unwrap (image uri/encoded/tensor types,
        # lance_spark.arrow): Spark stores the storage type; the extension
        # identity is a reader-side concern
        return _normalize_array(
            pa.chunked_array([c.storage for c in arr.chunks], type=t.storage_type)
        )
    if pa.types.is_dictionary(t):
        return _normalize_array(arr.cast(t.value_type))
    if pa.types.is_float16(t):
        return arr.cast(pa.float32())
    if pa.types.is_large_string(t):
        return arr.cast(pa.string())
    if pa.types.is_large_binary(t):
        return arr.cast(pa.binary())
    if pa.types.is_fixed_size_list(t):
        return arr.cast(pa.list_(_norm_value_type(t.value_type)))
    if pa.types.is_large_list(t):
        return arr.cast(pa.list_(_norm_value_type(t.value_type)))
    if pa.types.is_list(t) and pa.types.is_float16(t.value_type):
        return arr.cast(pa.list_(pa.float32()))
    if pa.types.is_struct(t) or pa.types.is_map(t) or pa.types.is_list(t):
        norm = _norm_nested_type(t)
        if norm != t:
            try:
                return arr.cast(norm)
            except (pa.ArrowInvalid, pa.ArrowNotImplementedError) as exc:
                raise NotImplementedError(
                    f"cannot normalize nested type {t} to {norm} for Spark "
                    f"(e.g. bf16 inside a struct has no arrow cast): {exc}"
                ) from exc
    return arr


def normalize_arrow_table(table: pa.Table) -> pa.Table:
    """Normalize every column, PRESERVING the schema's field names
    (duplicates included), nullability, and metadata — the old dict-based
    rebuild silently dropped duplicate-named columns and stripped
    nullable=False + field metadata (r12 review fix)."""
    cols = [_normalize_array(table.column(i)) for i in range(table.num_columns)]
    fields = [
        pa.field(f.name, c.type, nullable=f.nullable, metadata=f.metadata)
        for f, c in zip(table.schema, cols)
    ]
    return pa.Table.from_arrays(
        cols, schema=pa.schema(fields, metadata=table.schema.metadata)
    )


def schema_to_json(schema: "pa.Schema") -> dict:
    """Arrow schema → JSON dict (reference python/python/lance/schema.py:13
    ``schema_to_json``). The JSON dialect here is Spark's StructType
    encoding — the manifest's native schema format — so a schema written by
    this helper round-trips through ``json_to_schema`` AND matches what
    ``Manifest.schema_json`` stores."""
    from pyspark.sql.pandas.types import from_arrow_schema

    return from_arrow_schema(normalize_arrow_table(schema.empty_table()).schema).jsonValue()


def json_to_schema(schema_json: dict) -> "pa.Schema":
    """JSON dict → Arrow schema (reference schema.py:23 ``json_to_schema``)."""
    from pyspark.sql.pandas.types import to_arrow_schema
    from pyspark.sql.types import StructType

    return to_arrow_schema(StructType.fromJson(schema_json))


class LanceSchema:
    """The reference's ``LanceSchema`` handle (python/python/lance/schema.py;
    rust lance_core::datatypes::Schema): the schema object typed commits
    carry (``LanceOperation.Project(schema)``, ``Merge(frags, schema)``) and
    ``ds.lance_schema`` returns. Backed here by the manifest's native
    schema-JSON dict (Spark StructType encoding)."""

    def __init__(self, schema_json: dict):
        self._json = schema_json

    @staticmethod
    def from_pyarrow(schema: "pa.Schema") -> "LanceSchema":
        """Reference call-site shape: ``LanceSchema.from_pyarrow(tbl.schema)``."""
        return LanceSchema(schema_to_json(schema))

    def to_pyarrow(self) -> "pa.Schema":
        return json_to_schema(self._json)

    def to_json(self) -> dict:
        return self._json

    @property
    def names(self) -> list[str]:
        return [f["name"] for f in self._json["fields"]]

    def __eq__(self, other) -> bool:
        return isinstance(other, LanceSchema) and self._json == other._json

    def __repr__(self) -> str:
        return f"LanceSchema({', '.join(self.names)})"

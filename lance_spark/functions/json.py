"""Named JSON function family — reference UDF registry parity.

The reference registers these as scalar UDFs (rust/lance-datafusion/src/
udf.rs:18-28, impl udf/json.rs): json_extract, json_extract_with_type,
json_exists, json_get, json_get_string, json_get_int, json_get_float,
json_get_bool, json_array_contains, json_array_length. Here each is a thin
shim over Spark built-ins (get_json_object / json_array_length — JVM-side,
codegen'd), so a reference user's call sites port one-to-one.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def json_extract(col, path: str) -> Column:
    """JSON value at path, as its JSON text (null if absent)."""
    return F.get_json_object(col, path)


def json_extract_with_type(col, path: str, data_type: str) -> Column:
    return F.get_json_object(col, path).cast(data_type)


def json_exists(col, path: str) -> Column:
    return F.get_json_object(col, path).isNotNull()


def json_get(col, path: str) -> Column:
    return json_extract(col, path)


def json_get_string(col, path: str) -> Column:
    return F.get_json_object(col, path)


def json_get_int(col, path: str) -> Column:
    return F.get_json_object(col, path).cast("long")


def json_get_float(col, path: str) -> Column:
    return F.get_json_object(col, path).cast("double")


def json_get_bool(col, path: str) -> Column:
    return F.get_json_object(col, path).cast("boolean")


def json_array_contains(col, path: str, value) -> Column:
    """True when the JSON array at path contains ``value`` (compared through
    its string form — elements coerce to string on parse)."""
    arr = F.from_json(F.get_json_object(col, path), "array<string>")
    return F.array_contains(arr, str(value))


def json_array_length(col, path: str = "$") -> Column:
    target = col if path == "$" else F.get_json_object(col, path)
    return F.json_array_length(target).cast("long")


SQL_FUNCTION_DDL = [
    # SQL-registry parity (reference rust/lance-datafusion/src/udf.rs:16-29
    # registers these names into DataFusion's SQL function registry): Spark
    # SQL UDFs macro-expand into Catalyst expressions at parse time, so SQL
    # call sites stay inside whole-stage codegen — no Python boundary.
    """CREATE OR REPLACE TEMPORARY FUNCTION json_extract(js STRING, p STRING)
       RETURNS STRING RETURN get_json_object(js, p)""",
    """CREATE OR REPLACE TEMPORARY FUNCTION json_get(js STRING, p STRING)
       RETURNS STRING RETURN get_json_object(js, p)""",
    """CREATE OR REPLACE TEMPORARY FUNCTION json_get_string(js STRING, p STRING)
       RETURNS STRING RETURN get_json_object(js, p)""",
    """CREATE OR REPLACE TEMPORARY FUNCTION json_get_int(js STRING, p STRING)
       RETURNS BIGINT RETURN CAST(get_json_object(js, p) AS BIGINT)""",
    """CREATE OR REPLACE TEMPORARY FUNCTION json_get_float(js STRING, p STRING)
       RETURNS DOUBLE RETURN CAST(get_json_object(js, p) AS DOUBLE)""",
    """CREATE OR REPLACE TEMPORARY FUNCTION json_get_bool(js STRING, p STRING)
       RETURNS BOOLEAN RETURN CAST(get_json_object(js, p) AS BOOLEAN)""",
    """CREATE OR REPLACE TEMPORARY FUNCTION json_exists(js STRING, p STRING)
       RETURNS BOOLEAN RETURN get_json_object(js, p) IS NOT NULL""",
    """CREATE OR REPLACE TEMPORARY FUNCTION json_array_contains(js STRING, p STRING, v STRING)
       RETURNS BOOLEAN RETURN array_contains(from_json(get_json_object(js, p), 'array<string>'), v)""",
    # NOTE: no json_array_length DDL — Spark ships a BUILT-IN (non-SQL)
    # function of that name which CREATE OR REPLACE cannot shadow
    # (CANNOT_REPLACE_NON_SQL_UDF_WITH_SQL_UDF); the builtin covers the
    # path='$' case, and json_path_array_length below covers paths.
    """CREATE OR REPLACE TEMPORARY FUNCTION json_path_array_length(js STRING, p STRING)
       RETURNS BIGINT RETURN CAST(json_array_length(CASE WHEN p = '$' THEN js
                                   ELSE get_json_object(js, p) END) AS BIGINT)""",
    """CREATE OR REPLACE TEMPORARY FUNCTION contains_tokens(s STRING, tok STRING)
       RETURNS BOOLEAN RETURN array_contains(
           filter(split(lower(s), '[^a-z]+'), x -> x != ''), lower(tok))""",
]


def register_sql_functions(spark) -> list[str]:
    """Install the reference's SQL UDF names into the session so
    ``ds.sql("SELECT json_get_int(props, '$.k') ...")`` works verbatim.
    Each DDL registers independently — one name colliding with a builtin
    must not abort the rest. Returns the names that failed (normally [])."""
    import re

    failed = []
    for ddl in SQL_FUNCTION_DDL:
        try:
            spark.sql(ddl)
        except Exception:
            m = re.search(r"FUNCTION (\w+)", ddl)
            failed.append(m.group(1) if m else ddl[:40])
    return failed

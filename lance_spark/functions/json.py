"""Named JSON function family — reference UDF registry parity.

The reference registers these as scalar UDFs (rust/lance-datafusion/src/
udf.rs:18-28, impl udf/json.rs): json_extract, json_extract_with_type,
json_exists, json_get, json_get_string, json_get_int, json_get_float,
json_get_bool, json_array_contains, json_array_length. Here each is a thin
shim over Spark built-ins (get_json_object / json_array_length — JVM-side,
codegen'd), so a reference user's call sites port one-to-one.
"""

from __future__ import annotations

import re

from pyspark.sql import Column
from pyspark.sql import functions as F

# $.a.b.c — a path whose LAST step is a plain object key (no array index):
# the shape whose existence check can be exact via json_object_keys
_KEY_PATH = re.compile(r"(\$(?:\.[^.\[\]]+|\[\d+\])*)\.([A-Za-z_][A-Za-z0-9_]*)$")


def json_extract(col, path: str) -> Column:
    """JSON value at path, as its JSON text (null if absent)."""
    return F.get_json_object(col, path)


def json_extract_with_type(col, path: str, data_type: str) -> Column:
    return F.get_json_object(col, path).cast(data_type)


def json_exists(col, path: str) -> Column:
    """True when ``path`` EXISTS — including keys holding JSON null, which
    ``get_json_object(...).isNotNull()`` alone cannot distinguish from an
    absent key. For plain key paths the check goes through
    ``json_object_keys`` on the parent object; array-index tails keep the
    value-based heuristic (a null array element reads as absent)."""
    m = _KEY_PATH.fullmatch(path)
    if m:
        parent, key = m.group(1), m.group(2)
        parent_js = col if parent == "$" else F.get_json_object(col, parent)
        return F.coalesce(
            F.array_contains(F.json_object_keys(parent_js), key), F.lit(False)
        )
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
    """True when the JSON array at path contains ``value``. Elements parse
    to their raw JSON text (``true``, ``1``, ``2.5``, ``x``), so the probe
    value must be rendered the same way — ``str(True)`` is ``'True'`` and
    would never match (r13 review fix)."""
    if isinstance(value, bool):
        probe = "true" if value else "false"
    elif value is None:
        # JSON null elements parse to SQL NULL; array_contains cannot match
        # NULL, so test for a null element explicitly
        arr = F.from_json(F.get_json_object(col, path), "array<string>")
        return F.coalesce(
            F.exists(arr, lambda x: x.isNull()), F.lit(False)
        )
    else:
        probe = str(value)
    arr = F.from_json(F.get_json_object(col, path), "array<string>")
    # array_contains is NULL (not false) when the array holds null elements
    # and the probe is absent; a present array must answer true/false
    return F.when(arr.isNotNull(), F.coalesce(F.array_contains(arr, probe), F.lit(False)))


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
    # exists must be TRUE for keys holding JSON null (get_json_object alone
    # reads them as absent): plain key-tailed paths go through
    # json_object_keys on the parent; array-index tails keep the heuristic
    """CREATE OR REPLACE TEMPORARY FUNCTION json_exists(js STRING, p STRING)
       RETURNS BOOLEAN RETURN
       CASE WHEN instr(p, '.') > 0
                 AND length(substring_index(p, '.', -1)) > 0
                 AND instr(substring_index(p, '.', -1), '[') = 0
            THEN coalesce(array_contains(
                   json_object_keys(
                     CASE WHEN substr(p, 1, length(p) - length(substring_index(p, '.', -1)) - 1) = '$'
                          THEN js
                          ELSE get_json_object(js, substr(p, 1, length(p) - length(substring_index(p, '.', -1)) - 1)) END),
                   substring_index(p, '.', -1)), false)
            ELSE get_json_object(js, p) IS NOT NULL END""",
    """CREATE OR REPLACE TEMPORARY FUNCTION json_array_contains(js STRING, p STRING, v STRING)
       RETURNS BOOLEAN RETURN
       CASE WHEN from_json(get_json_object(js, p), 'array<string>') IS NOT NULL
            THEN coalesce(array_contains(
                   from_json(get_json_object(js, p), 'array<string>'), v), false)
            END""",
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

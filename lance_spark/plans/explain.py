"""Plan inspection: explain_plan / analyze_plan / plan_summary.

Parity with the reference's observability surface (scanner.rs:3651-3675
``explain_plan`` / ``analyze_plan``, dataset.py:4719-4748) on Catalyst
plans, plus the plan-shape assertions the reference's tests rely on
(scanner.rs tests match explain strings; ours assert on summaries).

``plan_summary`` is what keeps the 100 TB contract honest in CI: tests
assert that filters reached the scan (PushedFilters), projections pruned
the schema (ReadSchema), small dims broadcast, and no shuffle appears where
none is needed.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def explain_plan(df: DataFrame, mode: str = "formatted") -> str:
    """The string Spark would print for df.explain(mode) (EXPLAIN)."""
    return df.sparkSession._jvm.PythonSQLUtils.explainString(  # noqa: SLF001
        df._jdf.queryExecution(), mode
    )


def analyze_plan(df: DataFrame) -> str:
    """EXPLAIN ANALYZE equivalent: execute, then return the executed plan
    with per-node runtime metrics."""
    df.write.format("noop").mode("overwrite").save()
    return df._jdf.queryExecution().executedPlan().toString()  # noqa: SLF001


def plan_summary(df: DataFrame) -> dict:
    """Structured digest of the executed (pre-run) physical plan."""
    plan = df._jdf.queryExecution().executedPlan().toString()  # noqa: SLF001
    pushed = re.findall(r"PushedFilters: \[([^\]]*)\]", plan)
    read_schemas = re.findall(r"ReadSchema: struct<([^>]*)>", plan)
    return {
        "pushed_filters": [p for p in pushed if p],
        "read_columns": sorted(
            {c.split(":")[0] for rs in read_schemas for c in rs.split(",") if ":" in c}
        ),
        "broadcast_joins": plan.count("BroadcastHashJoin"),
        "sort_merge_joins": plan.count("SortMergeJoin"),
        "shuffles": plan.count("Exchange hashpartitioning")
        + plan.count("Exchange rangepartitioning"),
        "scans": plan.count("FileScan") + plan.count("BatchScan"),
        "plan": plan,
    }


def assert_pushed(df: DataFrame, column: str) -> None:
    s = plan_summary(df)
    assert any(column in p for p in s["pushed_filters"]), (
        f"filter on {column} did not reach the scan:\n{s['plan']}"
    )


def assert_reads_only(df: DataFrame, columns: set[str]) -> None:
    s = plan_summary(df)
    extra = set(s["read_columns"]) - set(columns)
    assert not extra, f"scan reads more columns than needed: {sorted(extra)}\n{s['plan']}"

"""LanceScanner — the reference's scanner object, as a real Spark DataFrame.

The reference's ``ds.scanner(...)`` returns a ``LanceScanner`` whose surface
is arrow-side materialization (python/python/lance/dataset.py:4219-4748:
``to_table`` / ``to_batches`` / ``to_reader`` / ``count_rows`` /
``explain_plan`` / ``analyze_plan`` / ``projected_schema``). Here the
scanner IS a DataFrame subclass: every Catalyst transformation works
unchanged (``.select`` / ``.filter`` / ``.join`` return plain DataFrames),
``isinstance(scanner, DataFrame)`` holds, and the reference's
materialization methods are layered on top. Nothing is computed at
construction — the scanner stays a logical plan until a materialization
method (or any Spark action) runs it.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import TYPE_CHECKING, Iterator

from pyspark.sql.classic.dataframe import DataFrame

if TYPE_CHECKING:
    import pyarrow as pa


@dataclass
class ScanStatistics:
    """Post-scan IO accounting (reference lance/__init__.pyi:552).

    Harvested from Spark's executed-plan SQLMetrics after a
    materialization runs. ``bytes_read`` / ``parts_loaded`` come from the
    file-scan leaves ("size of files read" / "number of files read");
    ``iops`` / ``requests`` equal the file count (each local file read is
    at least one request — object-store backends would refine this).
    ``indices_loaded`` / ``index_comparisons`` stay 0 on plain scans:
    index probes run as separate index-table DataFrames here, not inside
    this scan plan. ``all_counts`` carries every raw metric by name."""

    iops: int = 0
    requests: int = 0
    bytes_read: int = 0
    indices_loaded: int = 0
    parts_loaded: int = 0
    index_comparisons: int = 0
    all_counts: dict = field(default_factory=dict)


# process-wide IO counters (reference __init__: bytes_read_counter /
# iops_counter). Fed by ScanStatistics harvests: metered materializations
# (scan_stats_callback / scan_stats / enable_io_counters) contribute;
# un-metered DataFrame actions do not — metering every action would put a
# py4j plan walk on every query.
_IO_COUNTERS = {"bytes_read": 0, "iops": 0, "enabled": False}


def enable_io_counters(on: bool = True) -> None:
    """Harvest IO stats on EVERY LanceScanner materialization (small py4j
    plan-walk overhead per query) so the global counters see all scans."""
    _IO_COUNTERS["enabled"] = bool(on)


def bytes_read_counter() -> int:
    return _IO_COUNTERS["bytes_read"]


def iops_counter() -> int:
    return _IO_COUNTERS["iops"]


def _executed_plan_metrics(df: DataFrame) -> dict:
    """Sum SQLMetric values across the executed plan's nodes (post-run).

    Traversal must pierce AQE's wrappers: AdaptiveSparkPlanExec exposes the
    final plan via ``executedPlan`` (its ``children`` is empty), and each
    materialized QueryStageExec hides its subtree behind ``plan``."""
    out: dict[str, int] = {}
    try:
        stack = [df._jdf.queryExecution().executedPlan()]  # noqa: SLF001
    except Exception:
        return out
    seen = 0
    # SQLMetrics are accumulators shared by reused exchanges / query-stage
    # wrappers; dedup by accumulator id so a metric reachable through two
    # plan paths is counted once.
    seen_acc: set[int] = set()
    while stack and seen < 10_000:
        node = stack.pop()
        seen += 1
        try:
            it = node.metrics().iterator()
            while it.hasNext():
                kv = it.next()
                metric = kv._2()
                try:
                    acc_id = int(metric.id())
                    if acc_id in seen_acc:
                        continue
                    seen_acc.add(acc_id)
                except Exception:
                    pass
                try:
                    nm = metric.name()
                    desc = str(nm.get()) if nm.isDefined() else str(kv._1())
                except Exception:
                    desc = str(kv._1())
                val = int(metric.value())
                if val > 0:
                    out[desc] = out.get(desc, 0) + val
        except Exception:
            pass
        cname = ""
        try:
            cname = node.getClass().getSimpleName()
        except Exception:
            pass
        if "AdaptiveSparkPlan" in cname:
            try:
                stack.append(node.executedPlan())
            except Exception:
                pass
        if "QueryStage" in cname:
            try:
                stack.append(node.plan())
            except Exception:
                pass
        try:
            ch = node.children()
            for i in range(ch.size()):
                stack.append(ch.apply(i))
        except Exception:
            pass
    return out


def _stats_from_metrics(counts: dict) -> ScanStatistics:
    files = counts.get("number of files read", 0)
    st = ScanStatistics(
        iops=files,
        requests=files,
        bytes_read=counts.get("size of files read", 0),
        parts_loaded=files,
        all_counts=counts,
    )
    _IO_COUNTERS["bytes_read"] += st.bytes_read
    _IO_COUNTERS["iops"] += st.iops
    return st


class LanceScanner(DataFrame):
    """A scan plan with the reference scanner's materialization surface.

    Subclasses the classic (JVM-backed) DataFrame, so it is accepted
    anywhere a DataFrame is — including the right side of joins and the
    plan-assertion helpers in ``lance_spark.plans.explain``.
    """

    def __new__(cls, df: DataFrame, dataset=None, scan_stats_callback=None):
        # the classic DataFrame defines __new__(cls, jdf, sql_ctx) and
        # invokes __init__ itself; bypass it so our (df, dataset, callback)
        # signature works — Python then calls our __init__ normally.
        return object.__new__(cls)

    def __init__(self, df: DataFrame, dataset=None, scan_stats_callback=None):
        super().__init__(df._jdf, df.sparkSession)  # noqa: SLF001
        self._lance_dataset = dataset
        self._scan_stats_callback = scan_stats_callback

    def _after_scan(self) -> None:
        if self._scan_stats_callback is not None:
            self._scan_stats_callback(_stats_from_metrics(_executed_plan_metrics(self)))
        elif _IO_COUNTERS["enabled"]:
            _stats_from_metrics(_executed_plan_metrics(self))

    # ------------------------------------------------- materialization
    def to_table(self) -> "pa.Table":
        """Collect to a pyarrow Table (reference dataset.py:4235).

        Driver-side by definition; for unbounded results iterate
        ``to_batches`` or keep working on the DataFrame."""
        t = self.toArrow()
        self._after_scan()
        return t

    def to_batches(self, batch_size: int | None = None) -> Iterator["pa.RecordBatch"]:
        """Iterator of RecordBatches (reference dataset.py:4246)."""
        t = self.to_table()
        return iter(t.to_batches(max_chunksize=batch_size) if batch_size else t.to_batches())

    def to_reader(self, batch_size: int | None = None) -> "pa.RecordBatchReader":
        """RecordBatchReader over the result (reference dataset.py:4242)."""
        import pyarrow as pa

        t = self.to_table()
        batches = t.to_batches(max_chunksize=batch_size) if batch_size else t.to_batches()
        return pa.RecordBatchReader.from_batches(t.schema, batches)

    def count_rows(self) -> int:
        """Row count of the scan result (reference dataset.py:4635).

        With a stats callback registered (or global IO counters enabled),
        the count runs through a plan handle we keep (df.count() executes a
        derived JVM Dataset whose metrics are unreachable afterwards) so
        the scan metrics can be harvested post-run."""
        if self._scan_stats_callback is None and not _IO_COUNTERS["enabled"]:
            return self.count()
        from pyspark.sql import functions as F

        agg = self.groupBy().agg(F.count(F.lit(1)))
        n = int(agg.collect()[0][0])
        stats = _stats_from_metrics(_executed_plan_metrics(agg))
        if self._scan_stats_callback is not None:
            self._scan_stats_callback(stats)
        return n

    def scan_stats(self) -> ScanStatistics:
        """Execute (count) and return the scan's IO statistics."""
        out: list[ScanStatistics] = []
        prev = self._scan_stats_callback
        self._scan_stats_callback = out.append
        try:
            self.count_rows()
        finally:
            self._scan_stats_callback = prev
        return out[0]

    # ------------------------------------------------- observability
    @property
    def projected_schema(self) -> "pa.Schema":
        """Arrow schema of the scan output (reference scanner property)."""
        return self._arrow_schema()

    def _arrow_schema(self) -> "pa.Schema":
        # schema without executing: empty-limit conversion carries the
        # exact arrow schema Spark would produce for this plan.
        return self.limit(0).toArrow().schema

    @property
    def dataset_schema(self) -> "pa.Schema":
        """Arrow schema of the underlying dataset (not the projection)."""
        if self._lance_dataset is None:
            return self._arrow_schema()
        from pyspark.sql.pandas.types import to_arrow_schema

        return to_arrow_schema(self._lance_dataset.schema)

    def explain_plan(self, verbose: bool = False) -> str:
        """The Catalyst plan string (reference dataset.py:4719
        ``explain_plan``; scanner.rs:3651)."""
        from lance_spark.plans.explain import explain_plan

        return explain_plan(self, mode="extended" if verbose else "formatted")

    def analyze_plan(self) -> str:
        """Execute, then return the executed plan with runtime shape
        (reference dataset.py:4739 ``analyze_plan``)."""
        from lance_spark.plans.explain import analyze_plan

        return analyze_plan(self)

"""Temporal joins Spark lacks as built-ins: as-of join and bounded range
join.

Neither exists in the reference engine (its joins are HashJoiner equi-joins,
rust/lance-datafusion/src/dataframe.rs) — these are the event-stream /
feature-attribution operations a training-data pipeline needs (the brief's
"beyond the reference" surface). DuckDB has a native ASOF JOIN; the suite
uses it as the oracle for ours.

Scale shapes (the whole point — a naive inequality join is O(n·m) nested
loop and unrunnable at 100 TB):

  - as_of_join: the classic union+window plan. Tag both sides, union, one
    shuffle partitioned by key ordered by (time, tag), carry the right
    side's latest values forward with last(ignorenulls) over an unbounded
    preceding frame, keep left rows. ONE shuffle, no inequality join, no
    per-key fan-out. Skew = one user's events land in one partition's sort
    — an orderable spill, not an OOM.
  - range_join: time-bucketing. Right rows key on floor(ts/bucket); left
    anchors probe the ceil(window/bucket)+1 buckets a window [t, t+window)
    can touch, then the exact predicate filters. Turns the inequality join
    into an equi-join with bounded probe fan-out — shuffle volume
    O(n + c·m) with c = ceil(window/bucket)+1, never O(n·m).
"""

from __future__ import annotations

import math
import re

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_UNIT_SECONDS = {
    "week": 604800, "weeks": 604800,
    "day": 86400, "days": 86400,
    "hour": 3600, "hours": 3600,
    "minute": 60, "minutes": 60, "min": 60, "mins": 60,
    "second": 1, "seconds": 1, "sec": 1, "secs": 1,
}

_INTERVAL_TOKEN = re.compile(r"\s*'?(\d+(?:\.\d+)?)'?\s+([a-zA-Z]+)\s*")


def _interval_seconds(spark, window: str) -> float:
    """Length of a SQL day-time interval body (``'1 hour'``,
    ``'90 minutes'``, ``'1 day 6 hours'``) in seconds, resolved once on the
    driver. Pure-python fast path for the common forms; falls back to a
    one-row Spark evaluation for anything else so the accepted grammar is
    exactly Spark's own."""
    pos, total = 0, 0.0
    while pos < len(window):
        m = _INTERVAL_TOKEN.match(window, pos)
        if not m or m.group(2).lower() not in _UNIT_SECONDS:
            break
        total += float(m.group(1)) * _UNIT_SECONDS[m.group(2).lower()]
        pos = m.end()
    if pos == len(window) and total > 0:
        return total
    # O(1) one-row driver job; tz-safe because the two timestamps share a tz
    row = spark.range(1).select(
        F.expr(
            f"unix_timestamp(timestamp'2000-01-01 00:00:00' + INTERVAL {window})"
            " - unix_timestamp(timestamp'2000-01-01 00:00:00')"
        ).alias("s")
    ).collect()[0]
    if row["s"] is None or row["s"] <= 0:
        raise ValueError(f"range_join window {window!r} must be a positive day-time interval")
    return float(row["s"])


def as_of_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    time_col: str,
    value_cols: list[str],
    *,
    tolerance: str | None = None,
    suffix: str = "_asof",
) -> DataFrame:
    """For each left row, attach the right row's ``value_cols`` with the
    greatest ``time_col`` <= the left row's (inclusive, DuckDB ASOF
    semantics). Right side is first reduced to one row per (key, time) —
    the max-ordered one — so ties are deterministic.

    ``tolerance``: optional max lookback (SQL interval string, e.g.
    ``'1 hour'``); older matches return null.

    Caveat: a right row whose value is NULL is transparent to the
    last(ignorenulls) carry — an older non-null value shows through. Wrap
    nullable payloads in a struct column if NULL must win.
    """
    lcols = left.columns
    # deterministic tie-break: one right row per (key, time), keeping the
    # row that sorts last (max over remaining columns)
    rdet = (
        right.groupBy(on, time_col)
        .agg(F.max(F.struct(*[F.col(c) for c in right.columns if c not in (on, time_col)])).alias("__r"))
        .select(on, time_col, *[F.col(f"__r.{c}").alias(c) for c in value_cols])
    )
    tagged_r = rdet.select(
        F.col(on).alias("__k"),
        F.col(time_col).alias("__t"),
        F.lit(0).alias("__tag"),
        *[F.col(c).alias(f"__r_{c}") for c in value_cols],
        *[F.lit(None).alias(f"__l_{c}") for c in lcols],
    )
    tagged_l = left.select(
        F.col(on).alias("__k"),
        F.col(time_col).alias("__t"),
        F.lit(1).alias("__tag"),
        *[F.lit(None).cast(rdet.schema[c].dataType).alias(f"__r_{c}") for c in value_cols],
        *[F.col(c).alias(f"__l_{c}") for c in lcols],
    )
    # right rows order BEFORE left rows at equal time → inclusive (>=) match
    w = (
        Window.partitionBy("__k")
        .orderBy("__t", "__tag")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = [F.last(f"__r_{c}", ignorenulls=True).over(w).alias(f"{c}{suffix}") for c in value_cols]
    carried_t = F.when(F.col("__tag") == 1, F.last(F.when(F.col("__tag") == 0, F.col("__t")), ignorenulls=True).over(w))
    out = (
        tagged_r.unionByName(tagged_l)
        .select("__tag", "__t", *carried, carried_t.alias(f"{time_col}{suffix}"), *[F.col(f"__l_{c}").alias(c) for c in lcols])
        .filter(F.col("__tag") == 1)
        .drop("__tag", "__t")
    )
    if tolerance is not None:
        within = F.col(f"{time_col}{suffix}") >= F.col(time_col) - F.expr(f"INTERVAL {tolerance}")
        out = out.select(
            *lcols,
            *[F.when(within, F.col(f"{c}{suffix}")).alias(f"{c}{suffix}") for c in value_cols],
            F.when(within, F.col(f"{time_col}{suffix}")).alias(f"{time_col}{suffix}"),
        )
    return out


def range_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    time_col: str,
    window: str,
    *,
    bucket_seconds: int,
    max_probe_buckets: int = 64,
) -> DataFrame:
    """Pairs (left, right) where ``right.time ∈ [left.time, left.time +
    window)`` and keys match. ``window`` is a SQL interval body (e.g.
    ``'1 hour'``). The window length is parsed once on the driver and each
    anchor probes the ``ceil(window/bucket_seconds)+1`` buckets its window
    can touch — any ``bucket_seconds`` gives exact results; it only tunes
    the probe fan-out. Raises if the fan-out would exceed
    ``max_probe_buckets`` (pick a larger ``bucket_seconds``).

    Returns left columns + right columns suffixed ``_r``. Inner semantics:
    unmatched anchors are absent (wrap with a rejoin for left semantics).
    """
    if bucket_seconds < 1:
        raise ValueError("bucket_seconds must be a positive integer")
    wsec = _interval_seconds(left.sparkSession, window)
    n_probe = int(math.ceil(wsec / bucket_seconds)) + 1
    if n_probe > max_probe_buckets:
        raise ValueError(
            f"range_join window {window!r} ({wsec:.0f}s) over bucket_seconds="
            f"{bucket_seconds} needs {n_probe} probe buckets per anchor "
            f"(> max_probe_buckets={max_probe_buckets}); raise bucket_seconds "
            f"to >= {int(math.ceil(wsec / (max_probe_buckets - 1)))}"
        )
    lb = F.floor(F.unix_timestamp(F.col(time_col)) / bucket_seconds)
    l2 = left.select(
        *left.columns,
        F.explode(F.array(*[(lb + i).cast("long") for i in range(n_probe)])).alias("__b"),
    )
    rb = F.floor(F.unix_timestamp(F.col(time_col)) / bucket_seconds).cast("long")
    r2 = right.select(
        F.col(on), rb.alias("__b"),
        *[F.col(c).alias(f"{c}_r") for c in right.columns if c != on],
    )
    # equi-join on (key, bucket) — the shuffle key carries BOTH, so two
    # users' same-hour events never meet; the exact range is a post-filter
    cond = (
        (F.col(f"{time_col}_r") >= F.col(time_col))
        & (F.col(f"{time_col}_r") < F.col(time_col) + F.expr(f"INTERVAL {window}"))
    )
    return l2.join(r2, on=[on, "__b"], how="inner").filter(cond).drop("__b")

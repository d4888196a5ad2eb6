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
  - range_join: time-bucketing. Right rows key on floor(ts/width); left
    anchors probe their bucket and the next one (a window [t, t+width)
    spans at most 2 buckets), then the exact predicate filters. Turns the
    inequality join into an equi-join with 2× probe fan-out — shuffle
    volume O(n + 2m), never O(n·m).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


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
) -> DataFrame:
    """Pairs (left, right) where ``right.time ∈ [left.time, left.time +
    window)`` and keys match. ``window`` is a SQL interval body (e.g.
    ``'1 hour'``) and ``bucket_seconds`` MUST equal or exceed its length so
    a window spans at most two buckets.

    Returns left columns + right columns suffixed ``_r``. Inner semantics:
    unmatched anchors are absent (wrap with a rejoin for left semantics).
    """
    lb = F.floor(F.unix_timestamp(F.col(time_col)) / bucket_seconds)
    l2 = left.select(
        *left.columns, F.explode(F.array(lb.cast("long"), (lb + 1).cast("long"))).alias("__b")
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

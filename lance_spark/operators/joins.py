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

# exactly Spark's interval unit keywords (day-time subset) — accepting
# aliases Spark's grammar rejects ('mins', 'secs') would pass driver
# validation then explode in the per-row filter at action time
_UNIT_SECONDS = {
    "week": 604800.0, "weeks": 604800.0,
    "day": 86400.0, "days": 86400.0,
    "hour": 3600.0, "hours": 3600.0,
    "minute": 60.0, "minutes": 60.0,
    "second": 1.0, "seconds": 1.0,
    "millisecond": 1e-3, "milliseconds": 1e-3,
    "microsecond": 1e-6, "microseconds": 1e-6,
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
    # O(1) one-row driver job; tz-safe because the two timestamps share a
    # tz. unix_MICROS, not unix_timestamp: whole-second resolution would
    # truncate millisecond windows to 0 (rejected) or under-count fan-out.
    try:
        row = spark.range(1).select(
            F.expr(
                f"(unix_micros(timestamp'2000-01-01 00:00:00' + INTERVAL {window})"
                " - unix_micros(timestamp'2000-01-01 00:00:00')) / 1e6"
            ).alias("s")
        ).collect()[0]
    except Exception as exc:  # ParseException: not Spark interval grammar
        raise ValueError(
            f"range_join window {window!r} must be a positive day-time interval"
            " in Spark's grammar (e.g. '90 minutes', '1 day 6 hours')"
        ) from exc
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
    ``'1 hour'``); older matches return null. Each carried value is gated
    by the time of the row that SUPPLIED it (a stale value showing through
    a newer NULL must not borrow the newer row's timestamp).

    Caveat: a right row whose value is NULL is transparent to the
    last(ignorenulls) carry — an older non-null value shows through. Wrap
    nullable payloads in a struct column if NULL must win.

    SQL join semantics on NULLs: right rows with a NULL key or NULL time
    never match (DuckDB ASOF oracle: ``l.k = NULL`` and ``l.ts >= NULL``
    are both false); left rows always pass through.
    """
    lcols = left.columns
    collisions = [
        f"{c}{suffix}" for c in [*value_cols, time_col] if f"{c}{suffix}" in lcols
    ]
    if collisions:
        raise ValueError(
            f"as_of_join output columns collide with left columns: "
            f"{collisions}; pass a different suffix"
        )
    # NULL key/time right rows can never be the match of any left row
    right = right.filter(F.col(on).isNotNull() & F.col(time_col).isNotNull())
    # deterministic tie-break: one right row per (key, time), keeping the
    # row whose VALUE columns sort last (only value_cols shuffle — extra
    # payload columns may be unorderable types and are never output)
    rdet = (
        right.groupBy(on, time_col)
        .agg(F.max(F.struct(*[F.col(c) for c in value_cols])).alias("__r"))
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
    # right rows order BEFORE left rows at equal time → inclusive (>=)
    # match. Left rows with a NULL key land in the NULL partition, which
    # holds no right rows (filtered above) → carried values stay null,
    # matching SQL equality where NULL = NULL is false.
    w = (
        Window.partitionBy("__k")
        .orderBy("__t", "__tag")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # carry (supplier time, value) together so tolerance can test the time
    # of the row that actually supplied each value
    carried = [
        F.last(
            F.when(
                F.col(f"__r_{c}").isNotNull(),
                F.struct(F.col("__t").alias("t"), F.col(f"__r_{c}").alias("v")),
            ),
            ignorenulls=True,
        )
        .over(w)
        .alias(f"__s_{c}")
        for c in value_cols
    ]
    carried_t = F.when(F.col("__tag") == 1, F.last(F.when(F.col("__tag") == 0, F.col("__t")), ignorenulls=True).over(w))
    out = (
        tagged_r.unionByName(tagged_l)
        .select("__tag", "__t", *carried, carried_t.alias(f"{time_col}{suffix}"), *[F.col(f"__l_{c}").alias(c) for c in lcols])
        .filter(F.col("__tag") == 1)
        .drop("__tag", "__t")
    )
    if tolerance is None:
        return out.select(
            *lcols,
            *[F.col(f"__s_{c}.v").alias(f"{c}{suffix}") for c in value_cols],
            F.col(f"{time_col}{suffix}"),
        )
    lookback = F.col(time_col) - F.expr(f"INTERVAL {tolerance}")
    return out.select(
        *lcols,
        *[
            F.when(F.col(f"__s_{c}.t") >= lookback, F.col(f"__s_{c}.v")).alias(
                f"{c}{suffix}"
            )
            for c in value_cols
        ],
        F.when(F.col(f"{time_col}{suffix}") >= lookback, F.col(f"{time_col}{suffix}")).alias(
            f"{time_col}{suffix}"
        ),
    )


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
    collisions = [c for c in right.columns if c != on and f"{c}_r" in left.columns]
    if collisions:
        raise ValueError(
            f"range_join right columns {collisions} suffixed '_r' collide "
            "with left columns; rename them first"
        )
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
    # users' same-hour events never meet; the exact range is a post-filter.
    # The predicate compares PHYSICAL micros against the same wsec the
    # probe fan-out used: 't + INTERVAL window' is calendar-aware ('1 day'
    # spans 25h across a DST fall-back), so rows near the calendar end
    # could land in a bucket the fan-out never probes — the fixed-duration
    # definition keeps the 'any bucket_seconds is exact' contract.
    t_l = F.unix_micros(F.col(time_col))
    t_r = F.unix_micros(F.col(f"{time_col}_r"))
    cond = (t_r >= t_l) & (t_r < t_l + F.lit(int(round(wsec * 1e6))))
    return l2.join(r2, on=[on, "__b"], how="inner").filter(cond).drop("__b")

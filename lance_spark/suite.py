"""Query suite: the SURVEY §2 operator inventory as (Spark query, DuckDB
oracle SQL) pairs, consumed by __spark_entry__.py and the driver's
correctness gate.

Conventions for hash-stable cross-engine comparison:
  - every aggregate/computed column is aliased identically on both sides;
  - doubles are round()ed (sums to 2, ratios/avgs to 4-6);
  - DuckDB integer sums are CAST(... AS BIGINT) (DuckDB widens to HUGEINT);
  - temporal outputs are strings (yyyy-MM-dd) or epoch-µs bigints;
  - every LIMIT/top-k has a total tie-breaking ORDER BY.

Spark side is DataFrame-first: filters/projections push into the parquet
scan, joins stay broadcast-able, aggregations get map-side partial
aggregation from Catalyst — nothing here collects to the driver.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from lance_spark.io import load_table

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLE: dict[str, str] = {}


def query(name: str, oracle: str | None = None):
    def deco(fn):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLE[name] = oracle
        return fn

    return deco


def _t(spark, sf_dir, name):
    return load_table(spark, sf_dir, name)


# --------------------------------------------------------------------------
# TPC-H-style SQL surface (SURVEY §2.3 — the delegated-engine queries)
# --------------------------------------------------------------------------

@query(
    "tpch_q1",
    """
    SELECT l_returnflag, l_linestatus,
           round(sum(l_quantity), 2)                                        AS sum_qty,
           round(sum(l_extendedprice), 2)                                   AS sum_base_price,
           round(sum(l_extendedprice * (1 - l_discount)), 2)                AS sum_disc_price,
           round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2)  AS sum_charge,
           round(avg(l_quantity), 4)                                        AS avg_qty,
           round(avg(l_extendedprice), 4)                                   AS avg_price,
           round(avg(l_discount), 4)                                        AS avg_disc,
           count(*)                                                         AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '2000-09-02'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def tpch_q1(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") <= F.lit("2000-09-02").cast("timestamp"))
    disc = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
        F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
        F.round(F.sum(disc), 2).alias("sum_disc_price"),
        F.round(F.sum(disc * (1 + F.col("l_tax"))), 2).alias("sum_charge"),
        F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
        F.round(F.avg("l_extendedprice"), 4).alias("avg_price"),
        F.round(F.avg("l_discount"), 4).alias("avg_disc"),
        F.count("*").alias("count_order"),
    )


@query(
    "tpch_q6",
    """
    SELECT round(sum(l_extendedprice * l_discount), 2) AS revenue
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
      AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24
    """,
)
def tpch_q6(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
            & F.col("l_discount").between(0.05, 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(F.round(F.sum(F.col("l_extendedprice") * F.col("l_discount")), 2).alias("revenue"))
    )


@query(
    "tpch_q3_topk",
    """
    SELECT l_orderkey,
           round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
           strftime(o_orderdate, '%Y-%m-%d') AS orderdate,
           o_orderpriority
    FROM customer JOIN orders ON c_custkey = o_custkey
                  JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1998-03-15' AND l_shipdate > TIMESTAMP '1998-03-15'
    GROUP BY l_orderkey, o_orderdate, o_orderpriority
    ORDER BY revenue DESC, l_orderkey LIMIT 10
    """,
)
def tpch_q3_topk(spark, sf_dir):
    cust = _t(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    orders = _t(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-03-15").cast("timestamp")
    )
    li = _t(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1998-03-15").cast("timestamp")
    )
    # customer is tiny relative to lineitem → broadcast (no shuffle of the fact table twice)
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"))
        .select(
            "l_orderkey",
            "revenue",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
            "o_orderpriority",
        )
        .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
        .limit(10)
    )


@query(
    "tpch_q5_region",
    """
    SELECT n_name, round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
    FROM customer
      JOIN orders   ON c_custkey = o_custkey
      JOIN lineitem ON l_orderkey = o_orderkey
      JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
      JOIN nation   ON s_nationkey = n_nationkey
      JOIN region   ON n_regionkey = r_regionkey
    WHERE o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1998-01-01'
    GROUP BY n_name
    """,
)
def tpch_q5_region(spark, sf_dir):
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    li = _t(spark, sf_dir, "lineitem")
    supp = _t(spark, sf_dir, "supplier")
    nation = _t(spark, sf_dir, "nation")
    region = _t(spark, sf_dir, "region")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(
            F.broadcast(supp),
            (li.l_suppkey == supp.s_suppkey) & (cust.c_nationkey == supp.s_nationkey),
        )
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("n_name")
        .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"))
    )


# --------------------------------------------------------------------------
# Scanner surface (SURVEY §2.2): filter/project/sort/limit/offset/take/count
# --------------------------------------------------------------------------

@query(
    "scan_filter_project",
    """
    SELECT l_orderkey, l_linenumber, l_returnflag,
           round(l_extendedprice * (1 - l_discount), 4) AS disc_price
    FROM lineitem
    WHERE (l_returnflag IN ('A', 'R') OR l_quantity BETWEEN 10 AND 12)
      AND l_linestatus = 'F' AND l_partkey % 7 = 0
    """,
)
def scan_filter_project(spark, sf_dir):
    return (
        _t(spark, sf_dir, "lineitem")
        .filter(
            (F.col("l_returnflag").isin("A", "R") | F.col("l_quantity").between(10, 12))
            & (F.col("l_linestatus") == "F")
            & (F.col("l_partkey") % 7 == 0)
        )
        .select(
            "l_orderkey",
            "l_linenumber",
            "l_returnflag",
            F.round(F.col("l_extendedprice") * (1 - F.col("l_discount")), 4).alias("disc_price"),
        )
    )


@query(
    "scan_sort_limit_offset",
    """
    SELECT l_orderkey, l_linenumber, round(l_extendedprice, 2) AS price
    FROM lineitem
    ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber
    LIMIT 50 OFFSET 20
    """,
)
def scan_sort_limit_offset(spark, sf_dir):
    return (
        _t(spark, sf_dir, "lineitem")
        .orderBy(F.desc("l_extendedprice"), "l_orderkey", "l_linenumber")
        .offset(20)
        .limit(50)
        .select("l_orderkey", "l_linenumber", F.round("l_extendedprice", 2).alias("price"))
    )


@query(
    "scan_count_filtered",
    "SELECT count(*) AS n FROM lineitem WHERE l_discount > 0.05 AND l_returnflag = 'N'",
)
def scan_count_filtered(spark, sf_dir):
    return (
        _t(spark, sf_dir, "lineitem")
        .filter("l_discount > 0.05 AND l_returnflag = 'N'")
        .agg(F.count("*").alias("n"))
    )


@query(
    "scan_take_keys",
    """
    SELECT l_orderkey, l_linenumber, l_partkey, round(l_quantity, 2) AS qty
    FROM lineitem WHERE l_orderkey IN (1, 2, 3, 5, 8, 13, 21, 34, 55, 89)
    """,
)
def scan_take_keys(spark, sf_dir):
    # take fast-path semantics (scanner.rs:443-520): key-set pushdown
    return (
        _t(spark, sf_dir, "lineitem")
        .filter(F.col("l_orderkey").isin(1, 2, 3, 5, 8, 13, 21, 34, 55, 89))
        .select("l_orderkey", "l_linenumber", "l_partkey", F.round("l_quantity", 2).alias("qty"))
    )


@query("scan_distinct", "SELECT DISTINCT c_mktsegment FROM customer")
def scan_distinct(spark, sf_dir):
    return _t(spark, sf_dir, "customer").select("c_mktsegment").distinct()


# --------------------------------------------------------------------------
# Window / rollup / set ops / subqueries (delegated-engine surface)
# --------------------------------------------------------------------------

@query(
    "window_topn_per_group",
    """
    SELECT o_custkey, o_orderkey, rn FROM (
      SELECT o_custkey, o_orderkey,
             row_number() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rn
      FROM orders) WHERE rn <= 3
    """,
)
def window_topn_per_group(spark, sf_dir):
    w = Window.partitionBy("o_custkey").orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
    return (
        _t(spark, sf_dir, "orders")
        .withColumn("rn", F.row_number().over(w))
        .filter("rn <= 3")
        .select("o_custkey", "o_orderkey", "rn")
    )


@query(
    "window_running_sum",
    """
    SELECT o_custkey, o_orderkey,
           round(sum(o_totalprice) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running_total
    FROM orders
    """,
)
def window_running_sum(spark, sf_dir):
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        _t(spark, sf_dir, "orders")
        .select("o_custkey", "o_orderkey", F.round(F.sum("o_totalprice").over(w), 2).alias("running_total"))
    )


@query(
    "agg_rollup",
    """
    SELECT l_returnflag, l_linestatus, count(*) AS n, round(sum(l_quantity), 2) AS sum_qty
    FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
)
def agg_rollup(spark, sf_dir):
    return (
        _t(spark, sf_dir, "lineitem")
        .rollup("l_returnflag", "l_linestatus")
        .agg(F.count("*").alias("n"), F.round(F.sum("l_quantity"), 2).alias("sum_qty"))
    )


@query(
    "agg_grouping_sets",
    """
    SELECT l_returnflag, l_linestatus, count(*) AS n
    FROM lineitem GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
    """,
)
def agg_grouping_sets(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    li.createOrReplaceTempView("lineitem")
    return spark.sql(
        """SELECT l_returnflag, l_linestatus, count(*) AS n
           FROM lineitem GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())"""
    )


@query(
    "setop_intersect",
    """
    SELECT o_custkey AS custkey FROM orders WHERE o_totalprice > 300000
    INTERSECT
    SELECT c_custkey AS custkey FROM customer WHERE c_mktsegment = 'BUILDING'
    """,
)
def setop_intersect(spark, sf_dir):
    a = _t(spark, sf_dir, "orders").filter("o_totalprice > 300000").select(
        F.col("o_custkey").alias("custkey")
    )
    b = _t(spark, sf_dir, "customer").filter("c_mktsegment = 'BUILDING'").select(
        F.col("c_custkey").alias("custkey")
    )
    return a.intersect(b)


@query(
    "setop_except",
    """
    SELECT c_custkey AS custkey FROM customer
    EXCEPT SELECT o_custkey AS custkey FROM orders
    """,
)
def setop_except(spark, sf_dir):
    c = _t(spark, sf_dir, "customer").select(F.col("c_custkey").alias("custkey"))
    o = _t(spark, sf_dir, "orders").select(F.col("o_custkey").alias("custkey"))
    return c.exceptAll(o).distinct()


@query(
    "join_semi_anti",
    """
    SELECT c_mktsegment,
           CAST(count(CASE WHEN has_order THEN 1 END) AS BIGINT)  AS with_orders,
           CAST(count(CASE WHEN NOT has_order THEN 1 END) AS BIGINT) AS without_orders
    FROM (SELECT c_custkey, c_mktsegment,
                 EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey) AS has_order
          FROM customer)
    GROUP BY c_mktsegment
    """,
)
def join_semi_anti(spark, sf_dir):
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    with_o = cust.join(orders, cust.c_custkey == orders.o_custkey, "left_semi")
    without_o = cust.join(orders, cust.c_custkey == orders.o_custkey, "left_anti")
    return (
        with_o.groupBy("c_mktsegment").agg(F.count("*").alias("with_orders"))
        .join(
            without_o.groupBy("c_mktsegment").agg(F.count("*").alias("without_orders")),
            "c_mktsegment",
            "full_outer",
        )
        .select(
            "c_mktsegment",
            F.coalesce("with_orders", F.lit(0)).alias("with_orders"),
            F.coalesce("without_orders", F.lit(0)).alias("without_orders"),
        )
    )


@query(
    "subquery_above_avg",
    """
    SELECT c_custkey, round(c_acctbal, 2) AS acctbal
    FROM customer WHERE c_acctbal > (SELECT avg(c_acctbal) FROM customer)
    """,
)
def subquery_above_avg(spark, sf_dir):
    cust = _t(spark, sf_dir, "customer")
    avg_bal = cust.agg(F.avg("c_acctbal").alias("avg_bal"))
    return (
        cust.crossJoin(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("avg_bal"))
        .select("c_custkey", F.round("c_acctbal", 2).alias("acctbal"))
    )


# --------------------------------------------------------------------------
# Scalar functions (SURVEY §2.6)
# --------------------------------------------------------------------------

@query(
    "func_string",
    """
    SELECT p_partkey, upper(p_name) AS uname, length(p_name) AS name_len,
           substr(p_type, 1, 5) AS type5, concat(p_brand, '-', p_type) AS brand_type
    FROM part WHERE p_name LIKE '%a%'
    """,
)
def func_string(spark, sf_dir):
    return (
        _t(spark, sf_dir, "part")
        .filter(F.col("p_name").like("%a%"))
        .select(
            "p_partkey",
            F.upper("p_name").alias("uname"),
            F.length("p_name").cast("long").alias("name_len"),
            F.substring("p_type", 1, 5).alias("type5"),
            F.concat_ws("-", "p_brand", "p_type").alias("brand_type"),
        )
    )


@query(
    "func_date",
    """
    SELECT CAST(year(o_orderdate) AS BIGINT) AS y, CAST(month(o_orderdate) AS BIGINT) AS m,
           count(*) AS n, round(sum(o_totalprice), 2) AS total
    FROM orders GROUP BY 1, 2
    """,
)
def func_date(spark, sf_dir):
    return (
        _t(spark, sf_dir, "orders")
        .groupBy(
            F.year("o_orderdate").cast("long").alias("y"),
            F.month("o_orderdate").cast("long").alias("m"),
        )
        .agg(F.count("*").alias("n"), F.round(F.sum("o_totalprice"), 2).alias("total"))
    )


@query(
    "func_json",
    """
    SELECT event_type, count(*) AS n,
           CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k
    FROM events GROUP BY event_type
    """,
)
def func_json(spark, sf_dir):
    # json_get_* family (reference udf/json.rs) → Spark get_json_object
    return (
        _t(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.get_json_object("props", "$.k").cast("long")).alias("sum_k"),
        )
    )


# --------------------------------------------------------------------------
# Events: windowed + sessionized aggregation (streaming-shaped, batch-checked)
# --------------------------------------------------------------------------

@query(
    "events_hourly_window",
    """
    SELECT epoch_us(time_bucket(INTERVAL '1 hour', CAST(ts AS TIMESTAMP))) AS window_start,
           event_type, count(*) AS n, round(sum(value), 2) AS sum_value
    FROM events GROUP BY 1, 2
    """,
)
def events_hourly_window(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 2).alias("sum_value"))
        .select(
            F.unix_micros(F.col("w.start")).alias("window_start"),
            "event_type",
            "n",
            "sum_value",
        )
    )


@query(
    "events_sessionize",
    """
    WITH x AS (
      SELECT user_id, epoch_ns(ts) AS e,
             lag(epoch_ns(ts)) OVER (PARTITION BY user_id ORDER BY epoch_ns(ts), event_id) AS p
      FROM events)
    SELECT user_id,
           CAST(1 + sum(CASE WHEN p IS NOT NULL AND e - p > 1800000000000 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_sessions
    FROM x GROUP BY user_id
    """,
)
def events_sessionize(spark, sf_dir):
    # 30-minute-gap sessionization via exact integer ns arithmetic
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts_ns", "event_id")
    gap = F.col("ts_ns") - F.lag("ts_ns").over(w)
    return (
        ev.withColumn("new_sess", F.when(gap > 1_800_000_000_000, 1).otherwise(0))
        .groupBy("user_id")
        .agg((F.lit(1) + F.sum("new_sess")).cast("long").alias("n_sessions"))
    )


def run(name: str, spark: SparkSession, sf_dir: str) -> DataFrame:
    return QUERIES[name](spark, sf_dir)

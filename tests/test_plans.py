"""Plan-shape assertions — the reference's explain-string test strategy
(scanner.rs tests :3756+) applied to Catalyst plans: filters must reach the
scan, projections must prune the read schema, dims must broadcast."""

import pytest
from pyspark.sql import functions as F


def test_scan_pushdown_and_pruning(spark, sf_dir):
    from lance_spark.plans.explain import assert_pushed, assert_reads_only, plan_summary

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    q = li.filter("l_quantity < 10").select("l_orderkey", "l_extendedprice")
    assert_pushed(q, "l_quantity")
    assert_reads_only(q, {"l_orderkey", "l_extendedprice", "l_quantity"})
    s = plan_summary(q)
    assert s["shuffles"] == 0 and s["scans"] == 1


def test_join_broadcasts_dim(spark, sf_dir):
    from lance_spark.plans.explain import plan_summary

    from lance_spark import suite

    q = suite.QUERIES["tpch_q5_region"](spark, sf_dir)
    s = plan_summary(q)
    assert s["broadcast_joins"] >= 4  # customer/supplier/nation/region
    assert s["sort_merge_joins"] == 0


def test_explain_and_analyze(spark, sf_dir):
    from lance_spark.plans.explain import analyze_plan, explain_plan

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    q = li.groupBy("l_returnflag").agg(F.sum("l_quantity").alias("q"))
    e = explain_plan(q, "formatted")
    assert "HashAggregate" in e and "Scan parquet" in e.replace("FileScan", "Scan parquet")
    a = analyze_plan(q)
    assert "HashAggregate" in a


def test_dataset_scanner_prunes_groups(spark, sf_dir, tmp_path):
    """Dataset scan of a narrow projection must not read other column-group
    files (late materialization payoff)."""
    from lance_spark.dataset import dataset
    from lance_spark.plans.explain import plan_summary
    from lance_spark.write import write_dataset

    uri = str(tmp_path / "d")
    ds = write_dataset(spark.read.parquet(f"{sf_dir}/orders.parquet"), uri)
    ds = ds.add_columns(spark, {"extra": "o_totalprice * 2"})
    q = ds.scanner(spark, columns=["o_orderkey"])
    s = plan_summary(q)
    assert s["scans"] == 1  # the column-group file for 'extra' is not opened

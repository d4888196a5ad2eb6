"""MergeInsertBuilder extras: conflict_retries / retry_timeout / use_index,
explain_plan / analyze_plan, execute_uncommitted → typed commit, and
LanceDataset.drop."""

import datetime

import pytest
from pyspark.sql import functions as F

import lance_spark as ls


@pytest.fixture()
def orders_ds(spark, sf_dir, tmp_path):
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    return ls.write_dataset(orders, str(tmp_path / "o")), orders


def _source(orders):
    # 5 updates (existing keys, bumped price) + 5 inserts (new keys)
    upd = orders.limit(5).withColumn("o_totalprice", F.col("o_totalprice") + 1000)
    ins = orders.limit(5).withColumn("o_orderkey", F.col("o_orderkey") + 10_000_000)
    return upd.unionByName(ins)


def test_builder_fluent_options_and_execute(spark, orders_ds):
    ds, orders = orders_ds
    n0 = ds.count_rows()
    src = _source(orders)
    ds2 = (
        ds.merge_insert("o_orderkey")
        .when_matched_update_all()
        .when_not_matched_insert_all()
        .conflict_retries(3)
        .retry_timeout(datetime.timedelta(seconds=60))
        .use_index(True)
        .execute(spark, src)
    )
    assert ds2.count_rows() == n0 + 5
    bumped = ds2.to_df(spark).join(orders.limit(5).select("o_orderkey"), "o_orderkey")
    assert bumped.count() == 5


def test_builder_explain_and_analyze(spark, orders_ds):
    ds, orders = orders_ds
    b = ds.merge_insert("o_orderkey").when_matched_update_all()
    plan = b.explain_plan(spark, _source(orders))
    assert "Join" in plan
    analyzed = b.analyze_plan(spark, _source(orders))
    assert analyzed  # executed-plan metrics string


def test_execute_uncommitted_then_typed_commit(spark, orders_ds):
    ds, orders = orders_ds
    n0 = ds.count_rows()
    src = _source(orders)
    res = (
        ds.merge_insert("o_orderkey")
        .when_matched_update_all()
        .when_not_matched_insert_all()
        .execute_uncommitted(spark, src)
    )
    tx = res["transaction"]
    assert len(tx.new_fragments) >= 1
    assert len(tx.updated_fragments) >= 1
    # nothing committed yet
    assert ds.checkout_latest().version == res["read_version"] + 1  # +1: reserve commit
    assert ds.checkout_latest().count_rows() == n0
    ds2 = ls.commit(res["uri"], tx)
    assert ds2.count_rows() == n0 + 5


def test_dataset_drop(spark, sf_dir, tmp_path):
    uri = str(tmp_path / "d")
    nation = spark.read.parquet(f"{sf_dir}/nation.parquet")
    ls.write_dataset(nation, uri)
    ls.LanceDataset.drop(uri)
    with pytest.raises(FileNotFoundError):
        ls.dataset(uri)
    with pytest.raises(FileNotFoundError):
        ls.LanceDataset.drop(uri)
    ls.LanceDataset.drop(uri, ignore_not_found=True)

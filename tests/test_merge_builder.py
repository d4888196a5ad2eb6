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


def test_update_casts_to_dataset_schema(spark, tmp_path):
    """A type-changing assignment (bigint * 1.1 → double) must cast back to
    the dataset schema — otherwise the rewritten fragments' parquet type
    diverges and every later unified scan fails."""
    uri = str(tmp_path / "cast")
    ds = ls.write_dataset(
        spark.createDataFrame([(1, 100), (2, 200)], "k int, price long"), uri
    )
    ds = ds.update(spark, {"price": "CAST(price * 1.1 AS DOUBLE)"}, where="k = 1")
    rows = {r["k"]: r["price"] for r in ds.to_df(spark).collect()}
    assert rows == {1: 110, 2: 200}
    assert dict(ds.to_df(spark).dtypes)["price"] == "bigint"  # schema preserved


def test_update_unknown_column_raises(spark, tmp_path):
    uri = str(tmp_path / "typo")
    ds = ls.write_dataset(spark.createDataFrame([(1, 100)], "k int, price long"), uri)
    with pytest.raises(ValueError, match="unknown column"):
        ds.update(spark, {"pricee": "price * 2"})


def test_update_preserves_blob_layout(spark, tmp_path):
    """Rewritten rows of a blob-column dataset must keep the out-of-line
    blob sidecar — take_blobs silently missed updated rows before."""
    uri = str(tmp_path / "blob")
    df = spark.createDataFrame(
        [(1, "a", bytearray(b"x" * 64)), (2, "b", bytearray(b"y" * 64))],
        "k int, v string, img binary",
    )
    ds = ls.write_dataset(df, uri, blob_columns=["img"])
    ds = ds.update(spark, {"v": "'A!'"}, where="k = 1")
    frags = ds.manifest.fragments
    assert all(len(f.files) >= 2 for f in frags)  # blob sidecar on new frag too
    descs = ds.blob_descriptors(spark, "img").collect()
    assert len(descs) == 2 and all(d["size"] == 64 for d in descs)
    # the rewritten row's blob is readable end-to-end
    blobs = ds.take_blobs(spark, [r["_rowid"] for r in descs], "img").collect()
    assert sorted(bytes(r["img"]) for r in blobs) == [b"x" * 64, b"y" * 64]


def test_merge_condition_reference_style(spark, tmp_path):
    """when_matched_update_all('target.x < source.x') — the reference's
    documented condition form — must resolve against the routing join."""
    uri = str(tmp_path / "cond")
    ds = ls.write_dataset(
        spark.createDataFrame([(1, 10), (2, 20)], "k int, seq long"), uri
    )
    src = spark.createDataFrame([(1, 5), (2, 99)], "k int, seq long")
    ds = (
        ds.merge_insert("k")
        .when_matched_update_all("target.seq < source.seq")
        .execute(spark, src)
    )
    rows = {r["k"]: r["seq"] for r in ds.to_df(spark).collect()}
    assert rows == {1: 10, 2: 99}  # k=1 kept (5 < 10 fails the condition)


def test_merge_null_keys_route_as_inserts(spark, tmp_path):
    """NULL join keys must not match NULL-keyed target rows (standard MERGE
    semantics) — eqNullSafe paired them with cartesian fan-out before."""
    uri = str(tmp_path / "nullk")
    ds = ls.write_dataset(
        spark.createDataFrame([(None, "t1"), (None, "t2"), (1, "x")], "k int, v string"),
        uri,
    )
    src = spark.createDataFrame([(None, "s1"), (None, "s2"), (None, "s3")], "k int, v string")
    ds = (
        ds.merge_insert("k")
        .when_matched_update_all()
        .when_not_matched_insert_all()
        .execute(spark, src)
    )
    vals = sorted(r["v"] for r in ds.to_df(spark).collect())
    # 3 original rows untouched + 3 NULL-keyed inserts
    assert vals == ["s1", "s2", "s3", "t1", "t2", "x"]

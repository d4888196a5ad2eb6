"""Regression pins for the r11 adversarial review of dataset.py: zip-join
physical-row contract, protected config keys, rename-aware validate/stats,
unified nearest handling, scan_batches kwarg fidelity, search-route
refusals, credential-carrying checkouts, and literal-safe pyarrow filter
rendering.
"""

import os

import pytest
from pyspark.sql import functions as F

import lance_spark as ls


@pytest.fixture()
def orders_ds(spark, sf_dir, tmp_path):
    uri = str(tmp_path / "rv")
    return ls.write_dataset(
        spark.read.parquet(f"{sf_dir}/orders.parquet").limit(1000).repartition(2),
        uri,
        mode="create",
    )


def test_include_deleted_keeps_physical_rows_with_column_groups(spark, orders_ds):
    """review #1: a column group added AFTER a delete holds only then-live
    rows; include_deleted_rows=True must still return every physical row
    (nulls for the younger group's columns)."""
    ds = orders_ds
    physical = sum(f.physical_rows for f in ds.manifest.fragments)
    ds = ds.delete(spark, "o_orderkey % 5 = 0")
    ds = ds.add_columns(spark, {"disc": "o_totalprice * 0.5"})
    live = ds.count_rows()
    assert live < physical
    got = ds.scanner(spark, include_deleted_rows=True, with_row_id=True)
    assert got.count() == physical
    # deleted rows come back with base columns intact and the younger
    # group's column null
    nulls = got.filter(F.col("disc").isNull()).count()
    assert nulls == physical - live
    assert got.filter(F.col("o_orderkey").isNull()).count() == 0
    # live-only scan unaffected
    assert ds.to_df(spark).count() == live
    assert ds.to_df(spark).filter(F.col("disc").isNull()).count() == 0


def test_update_config_replace_preserves_format_flags(spark, orders_ds):
    """review #2: replace=True must not clobber rowid_address_style or
    column_renames — losing them silently corrupts reads."""
    ds = orders_ds.delete(spark, "o_orderkey % 3 = 0")
    ds = ds.compact_files(spark, target_rows_per_fragment=1_000_000)
    ds = ds.alter_columns({"path": "o_orderpriority", "rename": "prio"})
    before = ds.count_rows()
    assert not ds._rowid_addressable()

    ds = ds.update_config({"mykey": "1"}, replace=True)
    assert ds.config["mykey"] == "1"
    assert ds.config.get("rowid_address_style") is False
    assert ds.config.get("column_renames")
    assert not ds._rowid_addressable()
    df = ds.to_df(spark)
    assert "prio" in df.columns and df.count() == before

    # the typed-operation twin (LanceOperation.UpdateConfig) behaves the same
    from lance_spark.operation import LanceOperation, commit

    ds2 = commit(
        ds.uri,
        LanceOperation.UpdateConfig(
            config_updates=LanceOperation.UpdateMap(updates={"k2": "2"}, replace=True)
        ),
    )
    assert ds2.config.get("rowid_address_style") is False
    assert ds2.config.get("column_renames")
    assert ds2.to_df(spark).count() == before


def test_validate_passes_after_rename(spark, orders_ds):
    """review #3: validate() must apply column_renames before comparing
    schema fields to physical file columns."""
    ds = orders_ds.alter_columns({"path": "o_orderstatus", "rename": "status"})
    ds.validate()  # must not raise on a healthy renamed dataset


def test_to_table_nearest_unified_with_scanner(spark, sf_dir, tmp_path):
    """review #4/#9: to_table's nearest branch delegates to the scanner —
    'query' key, refine_factor=None, with_row_id, dict projections all
    behave identically across the two entry points."""
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").limit(200)
    uri = str(tmp_path / "nn")
    ds = ls.write_dataset(emb, uri, mode="create")
    q = [float(x) for x in emb.first()["embedding"]]

    nq = {"column": "embedding", "query": q, "k": 5, "refine_factor": None}
    t = ds.to_table(spark, nearest=nq, with_row_id=True)
    assert t.num_rows == 5
    assert "_rowid" in t.column_names and "_distance" in t.column_names

    s = ds.scanner(spark, nearest=nq, with_row_id=True).toArrow()
    assert sorted(t.column("_rowid").to_pylist()) == sorted(
        s.column("_rowid").to_pylist()
    )

    # dict projection through to_table's nearest path
    t2 = ds.to_table(
        spark, nearest=nq, columns={"vid2": "vec_id * 2"}
    )
    assert t2.column_names == ["vid2", "_distance"]
    with pytest.raises(ValueError, match="'q'"):
        ds.scanner(spark, nearest={"column": "embedding", "k": 5})


def test_search_route_rejects_unsupported_params(spark, sf_dir, tmp_path):
    """review #6: fragments/offset/order_by/prefilter_rowids on the search
    route raise instead of being silently ignored; with_row_address is
    honored."""
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").limit(100)
    uri = str(tmp_path / "sr")
    ds = ls.write_dataset(emb, uri, mode="create")
    q = [float(x) for x in emb.first()["embedding"]]
    nq = {"column": "embedding", "q": q, "k": 3}
    with pytest.raises(ValueError, match="fragments"):
        ds.scanner(spark, nearest=nq, fragments=[0])
    with pytest.raises(ValueError, match="offset"):
        ds.scanner(spark, nearest=nq, offset=2)
    with pytest.raises(ValueError, match="order_by"):
        ds.scanner(spark, nearest=nq, order_by=["vec_id"])
    got = ds.scanner(spark, nearest=nq, with_row_id=True, with_row_address=True)
    rows = got.select("_rowid", "_rowaddr").collect()
    assert rows and all(r["_rowaddr"] == r["_rowid"] for r in rows)


def test_scan_batches_kwarg_fidelity(spark, orders_ds):
    """review #5: prefilter_rowids survives the scan_batches rebuild;
    order_by / with_row_address are refused."""
    ds = orders_ds
    allow = ds.to_df(spark, with_row_id=True).filter(
        "o_orderkey % 2 = 0"
    ).select("_rowid")
    n_allowed = allow.count()
    sc = ds.scanner(spark, columns=["o_orderkey"], prefilter_rowids=allow)
    total = sum(t.record_batch.num_rows for t in sc.scan_batches())
    assert total == n_allowed

    with pytest.raises(ValueError, match="order_by"):
        list(ds.scanner(spark, order_by=["o_orderkey"]).scan_batches())
    with pytest.raises(ValueError, match="with_row_address"):
        list(ds.scanner(spark, with_row_address=True).scan_batches())


def test_checkout_latest_and_branch_keep_storage_options(spark, orders_ds):
    """review #7: checkout-derived handles must carry the credential seam."""
    ds = ls.dataset(orders_ds.uri, storage_options={"k": "v"})
    ds.create_branch("b1")
    assert ds.checkout_latest().storage_options.get("k") == "v"
    assert ds.checkout_branch("b1").storage_options.get("k") == "v"


def test_data_stats_after_rename(spark, orders_ds):
    """review #8: stats speak the LOGICAL name after a rename."""
    ds = orders_ds.alter_columns({"path": "o_totalprice", "rename": "price"})
    st = ds.data_stats(columns=["price"])["fields"]
    assert "price" in st and st["price"]["compressed_bytes"] > 0
    typed = ds.data_statistics()
    names = {f.id for f in typed.fields}
    assert len(typed.fields) == len(ds.columns)
    assert names == set(range(len(ds.columns)))


def test_arrow_filter_literal_safety(spark, orders_ds):
    """review #10: quotes inside literals are SQL-escaped and '==' inside a
    literal survives."""
    import pyarrow.compute as pc

    from lance_spark.dataset import arrow_filter_to_sql

    s = arrow_filter_to_sql(pc.field("o_orderstatus") == "O'Brien")
    assert "'O''Brien'" in s
    s2 = arrow_filter_to_sql(pc.field("o_orderstatus") == "a==b")
    assert "'a==b'" in s2 and "= 'a==b'" in s2
    # end-to-end: the escaped literal parses and filters (zero matches ok)
    assert (
        orders_ds.scanner(
            spark, filter=pc.field("o_orderstatus") == "O'Brien"
        ).count()
        == 0
    )

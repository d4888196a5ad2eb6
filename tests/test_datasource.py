"""Python DataSource (format "lance") tests: batch read with pushdown,
two-phase write commit, version time travel, stream tailing."""

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def registered(spark):
    from lance_spark.sources.datasource import LanceDataSource

    spark.dataSource.register(LanceDataSource)
    return True


@pytest.fixture(scope="module")
def ds_uri(spark, sf_dir, tmp_path_factory):
    from lance_spark.write import write_dataset

    uri = str(tmp_path_factory.mktemp("dsv2") / "orders")
    write_dataset(spark.read.parquet(f"{sf_dir}/orders.parquet").repartition(4), uri)
    return uri


def test_format_read_matches_dataset(spark, registered, ds_uri, sf_dir):
    got = spark.read.format("lance").option("uri", ds_uri).load()
    want = spark.read.parquet(f"{sf_dir}/orders.parquet")
    assert got.count() == want.count()
    assert set(got.columns) == set(want.columns)
    assert got.agg(F.sum("o_orderkey")).first()[0] == want.agg(F.sum("o_orderkey")).first()[0]


def test_format_read_filter_pushdown(spark, registered, ds_uri, sf_dir):
    got = (
        spark.read.format("lance").option("uri", ds_uri).load()
        .filter("o_totalprice > 300000 AND o_orderpriority = '1-URGENT'")
    )
    want = (
        spark.read.parquet(f"{sf_dir}/orders.parquet")
        .filter("o_totalprice > 300000 AND o_orderpriority = '1-URGENT'")
    )
    assert sorted(r["o_orderkey"] for r in got.select("o_orderkey").collect()) == sorted(
        r["o_orderkey"] for r in want.select("o_orderkey").collect()
    )


def test_format_read_respects_deletes(spark, registered, ds_uri):
    from lance_spark.dataset import dataset

    ds = dataset(ds_uri)
    before = ds.count_rows()
    ds.delete(spark, "o_custkey % 10 = 3")
    got = spark.read.format("lance").option("uri", ds_uri).load()
    assert got.count() == dataset(ds_uri).count_rows() < before
    # version option = time travel to the pre-delete manifest
    v1 = spark.read.format("lance").option("uri", ds_uri).option("version", "1").load()
    assert v1.count() == before


def test_format_write_two_phase(spark, registered, sf_dir, tmp_path):
    from lance_spark.dataset import dataset

    uri = str(tmp_path / "out")
    src = spark.read.parquet(f"{sf_dir}/region.parquet")
    src.repartition(2).write.format("lance").option("uri", uri).mode("append").save()
    ds = dataset(uri)
    assert ds.count_rows() == src.count()
    assert len(ds.manifest.fragments) >= 1
    # append again → new version, rows double
    src.repartition(1).write.format("lance").option("uri", uri).mode("append").save()
    ds2 = dataset(uri)
    # +2: format("lance") appends reserve fragment ids first (their own
    # metadata commit) so concurrent appends get disjoint id ranges
    assert ds2.count_rows() == 2 * src.count() and ds2.version == ds.version + 2
    # written dataset is readable through the normal scanner path too
    assert ds2.to_df(spark).count() == 2 * src.count()


def test_format_stream_tails_versions(spark, registered, sf_dir, tmp_path):
    from lance_spark.write import write_dataset

    uri = str(tmp_path / "tail")
    region = spark.read.parquet(f"{sf_dir}/region.parquet")
    write_dataset(region, uri)
    write_dataset(region, uri, mode="append")

    sdf = spark.readStream.format("lance").option("uri", uri).load()
    q = (
        sdf.writeStream.format("memory").queryName("lance_tail")
        .outputMode("append").trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    assert spark.sql("SELECT count(*) FROM lance_tail").first()[0] == 2 * region.count()


def test_streaming_pipeline_through_format(spark, registered, sf_dir, tmp_path):
    """End-to-end through our own format: lance stream source → transform →
    dataset sink. New versions appended upstream flow into the downstream
    dataset on the next trigger."""
    from lance_spark.dataset import dataset
    from lance_spark.streaming.sink import write_stream
    from lance_spark.write import write_dataset

    src_uri = str(tmp_path / "src")
    dst_uri = str(tmp_path / "dst")
    region = spark.read.parquet(f"{sf_dir}/region.parquet")
    write_dataset(region, src_uri)

    def run_once():
        sdf = spark.readStream.format("lance").option("uri", src_uri).load()
        out = sdf.selectExpr("r_regionkey", "upper(r_name) AS uname")
        q = write_stream(out, dst_uri, str(tmp_path / "ckpt"), trigger_available_now=True)
        q.awaitTermination(120)

    run_once()
    assert dataset(dst_uri).count_rows() == region.count()
    # upstream append → downstream picks up only the delta
    write_dataset(region, src_uri, mode="append")
    run_once()
    assert dataset(dst_uri).count_rows() == 2 * region.count()
    got = dataset(dst_uri).to_df(spark)
    assert set(got.columns) == {"r_regionkey", "uname"}


class TestDatasourceReviewR11:
    """Pins for the r11 adversarial review of sources/datasource.py."""

    def test_row_writer_handles_nulls_and_declared_types(self, spark, tmp_path, registered):
        from lance_spark.dataset import dataset

        uri = str(tmp_path / "dsw")
        df = spark.createDataFrame(
            [(1, None, [1, 2]), (2, "b", None), (3, None, [3])],
            "id int, name string, xs array<int>",
        )
        df.repartition(2).write.format("lance").option("uri", uri).mode("append").save()
        ds = dataset(uri)
        got = {r["id"]: (r["name"], r["xs"]) for r in ds.to_df(spark).collect()}
        assert got == {1: (None, [1, 2]), 2: ("b", None), 3: (None, [3])}
        # declared int width survives (per-row inference widened to long)
        assert dict(ds.to_df(spark).dtypes)["id"] == "int"

    def test_empty_write_commits_declared_schema(self, spark, tmp_path, registered):
        from lance_spark.dataset import dataset

        uri = str(tmp_path / "dse")
        spark.createDataFrame([], "id int, name string").write.format(
            "lance"
        ).option("uri", uri).mode("append").save()
        ds = dataset(uri)
        assert ds.count_rows() == 0
        assert [f.name for f in ds.schema.fields] == ["id", "name"]
        # and a zero-fragment dataset reads back as empty, not a crash
        assert (
            spark.read.format("lance").option("uri", uri).load().count() == 0
        )

    def test_append_schema_mismatch_rejected(self, spark, tmp_path, registered):
        uri = str(tmp_path / "dsm")
        spark.createDataFrame([(1, "a")], "id int, name string").write.format(
            "lance"
        ).option("uri", uri).mode("append").save()
        bad = spark.createDataFrame([(1, 2)], "id int, extra int")
        import pytest as _pytest

        with _pytest.raises(Exception, match="append schema mismatch"):
            bad.write.format("lance").option("uri", uri).mode("append").save()

    def test_in_filter_with_null_not_pushed_wrong(self, spark, tmp_path, registered):
        uri = str(tmp_path / "dsn")
        spark.createDataFrame(
            [(1,), (2,), (None,)], "v int"
        ).coalesce(1).write.format("lance").option("uri", uri).mode("append").save()
        got = (
            spark.read.format("lance").option("uri", uri).load()
            .filter("v in (1, null)")
            .collect()
        )
        assert [r["v"] for r in got] == [1]  # SQL IN: null never matches

    def test_blob_dataset_column_order(self, spark, tmp_path, registered):
        import lance_spark as ls

        uri = str(tmp_path / "dsb")
        docs = spark.createDataFrame(
            [(1, b"xx", "n1"), (2, b"yy", "n2")], "id long, img binary, name string"
        )
        ls.write_dataset(docs, uri, mode="create", blob_columns=["img"])
        back = spark.read.format("lance").option("uri", uri).load()
        rows = {r["id"]: (bytes(r["img"]), r["name"]) for r in back.collect()}
        assert rows == {1: (b"xx", "n1"), 2: (b"yy", "n2")}

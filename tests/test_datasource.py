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


def test_write_commit_lost_create_race_appends(spark, registered, tmp_path, monkeypatch):
    """If another writer creates the dataset between LanceWriter.commit's
    latest_version probe and the manifest commit, the commit must re-run as
    a true append (fresh fragment ids, rebased rowids) instead of
    overwriting the concurrent creator's data (r12 ADVICE fix)."""
    import os
    import uuid

    import pyarrow as pa
    import pyarrow.parquet as pq

    import lance_spark as ls
    from lance_spark import manifest as mf
    from lance_spark.dataset import dataset
    from lance_spark.sources.datasource import FragmentCommit, LanceWriter
    from lance_spark.write import ROWID_COL

    uri = str(tmp_path / "race")
    # the concurrent creator commits FIRST
    ls.write_dataset(spark.createDataFrame([(1, "a"), (2, "b")], "id long, s string"), uri)

    # our writer's probe RACED: simulate by forcing latest_version → None once
    writer = LanceWriter(uri, overwrite=False, schema=spark.createDataFrame(
        [(3, "c")], "id long, s string").schema)
    rel = os.path.join("data", f"frag-w-0-{uuid.uuid4().hex}.parquet")
    os.makedirs(os.path.join(uri, "data"), exist_ok=True)
    pq.write_table(
        pa.table({"id": pa.array([3], pa.int64()), "s": ["c"],
                  ROWID_COL: pa.array([0], pa.int64())}),
        os.path.join(uri, rel), compression="zstd",
    )
    real = mf.latest_version
    fired = {"n": 0}

    def probe_races_once(u, **k):
        fired["n"] += 1
        return None if fired["n"] == 1 else real(u, **k)

    monkeypatch.setattr(mf, "latest_version", probe_races_once)
    writer.commit([FragmentCommit(fragment_id=0, path=rel, physical_rows=1)])
    monkeypatch.undo()
    ds = dataset(uri)
    rows = {(r["id"], r["s"]) for r in ds.to_df(spark).collect()}
    assert rows == {(1, "a"), (2, "b"), (3, "c")}  # nobody's data dropped
    assert len({f.id for f in ds.manifest.fragments}) == len(ds.manifest.fragments)


def test_format_append_casts_drifted_types(spark, registered, tmp_path):
    """A type-drifted append (int where the dataset has long) casts to the
    dataset schema instead of writing mixed-type files that brick later
    scans; an uncastable drift fails loudly at commit (r12 ADVICE fix)."""
    import lance_spark as ls
    from lance_spark.dataset import dataset

    uri = str(tmp_path / "drift")
    ls.write_dataset(spark.createDataFrame([(1, 10)], "id long, v long"), uri)
    # benign drift: int → long widens silently
    spark.createDataFrame([(2, 20)], "id int, v int").coalesce(1) \
        .write.format("lance").option("uri", uri).mode("append").save()
    got = sorted((r["id"], r["v"]) for r in dataset(uri).to_df(spark).collect())
    assert got == [(1, 10), (2, 20)]
    assert dict(dataset(uri).to_df(spark).dtypes) == {"id": "bigint", "v": "bigint"}
    # uncastable drift: string payload that is not a number → loud failure
    with pytest.raises(Exception, match="type mismatch|cast|convert"):
        spark.createDataFrame([("x", "not-a-number")], "id string, v string") \
            .coalesce(1).write.format("lance").option("uri", uri).mode("append").save()
    # dataset unchanged after the failed append
    assert dataset(uri).count_rows() == 2

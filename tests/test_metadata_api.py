"""Tests for the round-4 parity surfaces: transactions, table/schema/field
metadata, IVF model introspection, BlobFile, single-file reader/writer,
debug formatters, SqlQueryBuilder.

Reference models: python/python/tests/test_dataset.py (metadata/transaction
coverage), test_blob.py, test_file.py.
"""

import os

import pyarrow as pa
import pytest

import lance_spark as ls
from lance_spark import manifest as mf
from lance_spark.debug import format_fragment, format_manifest, format_schema, list_transactions
from lance_spark.file import LanceFileReader, LanceFileWriter


@pytest.fixture()
def tmp_uri(tmp_path):
    return str(tmp_path / "ds")


@pytest.fixture()
def nation_ds(spark, sf_dir, tmp_uri):
    nation = spark.read.parquet(f"{sf_dir}/nation.parquet")
    return ls.write_dataset(nation, tmp_uri, mode="create"), nation


# ------------------------------------------------------------- transactions


def test_read_transaction_and_get_transactions(spark, nation_ds):
    ds, nation = nation_ds
    ds = ls.write_dataset(nation, ds.uri, mode="append")
    tx1 = ds.read_transaction(1)
    assert tx1["operation"] == "create"
    assert tx1["read_version"] == 0
    txs = ds.get_transactions(recent_transactions=2)
    assert len(txs) == 2
    assert txs[0]["version"] > txs[1]["version"]  # newest first
    assert ds.read_transaction(999) is None


def test_commit_properties_roundtrip(nation_ds):
    ds, _ = nation_ds
    # commit with properties through the manifest layer (the reference's
    # transaction_properties / __lance_commit_message)
    def build(base, version):
        return mf.Manifest.evolve(base, version, operation="update_config")

    mf.commit(ds.uri, build, operation="update_config",
              properties={"__lance_commit_message": "round4", "who": "test"})
    ds = ds.checkout_latest()
    tx = ds.read_transaction(ds.version)
    assert tx["transaction_properties"]["__lance_commit_message"] == "round4"
    assert tx["transaction_properties"]["who"] == "test"
    # properties are per-version, not inherited
    ds2 = ds.update_config({"k": "v"})
    assert ds2.read_transaction(ds2.version)["transaction_properties"] == {}


# ---------------------------------------------------------------- metadata


def test_update_metadata_incremental_and_replace(nation_ds):
    ds, _ = nation_ds
    got = ds.update_metadata({"author": "a", "v": "1"})
    assert got == {"author": "a", "v": "1"}
    got = ds.update_metadata({"v": None, "b": "2"})
    assert got == {"author": "a", "b": "2"}
    got = ds.update_metadata({"only": "x"}, replace=True)
    assert got == {"only": "x"}
    assert ds.checkout_latest().metadata == {"only": "x"}


def test_update_schema_metadata_separate_namespace(nation_ds):
    ds, _ = nation_ds
    ds.update_metadata({"table": "t"})
    got = ds.update_schema_metadata({"encoding": "utf-8"})
    assert got == {"encoding": "utf-8"}
    ds = ds.checkout_latest()
    # namespaces are independent; config replace preserves both
    assert ds.metadata == {"table": "t"}
    assert ds.schema_metadata() == {"encoding": "utf-8"}
    ds = ds.update_config({"x": "1"}, replace=True)
    assert ds.config == {
        "x": "1",
        "schema_metadata": {"encoding": "utf-8"},
        "table_metadata": {"table": "t"},
    }


def test_field_metadata_update_and_replace(nation_ds):
    ds, _ = nation_ds
    ds = ds.update_field_metadata({
        "n_name": {"description": "nation name", "pii": "no"},
        "n_nationkey": {"description": "key"},
    })
    assert ds.field_metadata("n_name") == {"description": "nation name", "pii": "no"}
    ds = ds.update_field_metadata({"n_name": {"pii": None, "lang": "en"}})
    assert ds.field_metadata("n_name") == {"description": "nation name", "lang": "en"}
    ds = ds.replace_field_metadata("n_name", {"only": "this"})
    assert ds.field_metadata("n_name") == {"only": "this"}
    # untouched field survives commits
    assert ds.field_metadata("n_nationkey") == {"description": "key"}
    with pytest.raises(KeyError):
        ds.update_field_metadata({"nope": {"a": "b"}})
    # metadata travels in the Spark schema
    field = next(f for f in ds.schema.fields if f.name == "n_name")
    assert field.metadata == {"only": "this"}


def test_trivia_properties(nation_ds):
    ds, nation = nation_ds
    assert ds.max_field_id == len(nation.columns) - 1
    assert ds.data_storage_version.startswith("parquet")


# ----------------------------------------------------------- ivf introspect


def test_get_ivf_model_and_centroids(spark, sf_dir, tmp_uri):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").limit(500)
    ds = ls.write_dataset(emb, tmp_uri, mode="create")
    ds = ds.create_index(spark, "embedding", index_type="IVF_FLAT",
                         name="emb_idx", num_partitions=4, metric="l2")
    model = ds.get_ivf_model("emb_idx")
    dim = len(emb.select("embedding").first()[0])
    assert model.centroids.shape == (4, dim)
    assert model.metric == "l2"
    cents = ds.centroids(column="embedding")
    assert (cents == model.centroids).all()
    with pytest.raises(KeyError):
        ds.get_ivf_model("nope")
    with pytest.raises(ValueError):
        ds.centroids()


# ------------------------------------------------------------------- blobs


def test_blob_file_seek_read(spark, tmp_uri):
    rows = [(i, f"payload-{i}".encode() * 10) for i in range(50)]
    df = spark.createDataFrame(rows, "id long, data binary")
    ds = ls.write_dataset(df.repartition(2), tmp_uri, blob_columns=["data"])
    rowids = [r[0] for r in ds.blob_descriptors(spark, "data").select("_rowid").limit(3).collect()]
    files = ds.take_blob_files(rowids, "data")
    assert len(files) == 3
    f = files[0]
    assert f.readable() and f.seekable() and not f.closed
    whole = f.readall()
    assert whole.startswith(b"payload-")
    assert f.size() == len(whole)
    f.seek(8)
    assert f.read(2) == whole[8:10]
    f.seek(-4, os.SEEK_END)
    assert f.read() == whole[-4:]
    buf = bytearray(5)
    f.seek(0)
    assert f.readinto(buf) == 5
    assert bytes(buf) == whole[:5]
    f.close()
    assert f.closed
    with pytest.raises(KeyError):
        ds.take_blob_files([999 << 32], "data")[0].read()


# ------------------------------------------------------------- file reader


def test_file_writer_reader_roundtrip(tmp_path):
    path = str(tmp_path / "f.parquet")
    t = pa.table({"a": list(range(100)), "b": [f"s{i}" for i in range(100)]})
    with LanceFileWriter(path) as w:
        for batch in t.to_batches(max_chunksize=30):
            w.write_batch(batch)
        w.add_schema_metadata("creator", "test")
        idx = w.add_global_buffer(b"\x01\x02\x03")
    assert idx == 1

    r = LanceFileReader(path)
    assert r.num_rows() == 100
    md = r.metadata()
    assert md.num_rows == 100 and md.schema.names == ["a", "b"]
    assert r.read_all().to_table().num_rows == 100
    got = r.read_range(25, 10).to_table()
    assert got.column("a").to_pylist() == list(range(25, 35))
    got = r.take_rows([0, 3, 97]).to_table()
    assert got.column("a").to_pylist() == [0, 3, 97]
    with pytest.raises(ValueError):
        r.take_rows([5, 2])
    assert r.read_global_buffer(1) == b"\x01\x02\x03"
    with pytest.raises(IndexError):
        r.read_global_buffer(9)
    stats = r.file_statistics()
    assert {c["column"] for c in stats.columns} == {"a", "b"}
    # batches iterate at the requested size
    batches = list(r.read_all(batch_size=32).to_batches())
    assert sum(b.num_rows for b in batches) == 100


def test_file_reader_column_projection(tmp_path):
    path = str(tmp_path / "g.parquet")
    t = pa.table({"a": [1, 2, 3], "b": ["x", "y", "z"]})
    with LanceFileWriter(path, schema=t.schema) as w:
        w.write_batch(t)
    r = LanceFileReader(path, columns=["b"])
    assert r.read_all().to_table().column_names == ["b"]


# ------------------------------------------------------------------- debug


def test_debug_formatters(spark, nation_ds):
    ds, _ = nation_ds
    ds = ds.update_field_metadata({"n_name": {"d": "x"}})
    ds.delete(spark, "n_nationkey = 1")
    ds = ds.checkout_latest()
    s = format_schema(ds)
    assert "n_name" in s and "metadata={'d': 'x'}" in s
    m = format_manifest(ds)
    assert "Manifest(version=" in m and "Fragment 0" in m
    frag = ds.get_fragments()[0]
    fs = format_fragment(frag)
    assert "deletion_file" in fs and "physical_rows" in fs
    txs = list_transactions(ds)
    assert any("delete" in t for t in txs)


# --------------------------------------------------------------------- sql


def test_sql_builder(spark, nation_ds):
    ds, nation = nation_ds
    q = (
        ds.sql_builder("SELECT n_name, _rowid FROM nations WHERE n_regionkey = 0 ORDER BY n_name")
        .table_name("nations")
        .with_row_id()
        .build(spark)
    )
    df = q.to_df()
    assert "_rowid" in df.columns
    expect = [r[0] for r in nation.filter("n_regionkey = 0").select("n_name").orderBy("n_name").collect()]
    assert [r["n_name"] for r in df.collect()] == expect
    batches = q.to_batch_records()
    assert sum(b.num_rows for b in batches) == len(expect)
    reader = q.to_stream_reader()
    assert reader.read_all().num_rows == len(expect)


def test_sql_builder_row_addr(spark, nation_ds):
    ds, _ = nation_ds
    q = (
        ds.sql_builder("SELECT _rowaddr FROM t LIMIT 5")
        .table_name("t")
        .with_row_addr()
        .build(spark)
    )
    rows = q.to_df().collect()
    assert len(rows) == 5


def test_write_list_of_dicts(spark, tmp_path):
    rows = [{"id": i, "name": f"n{i}"} for i in range(20)]
    ds = ls.write_dataset(rows, str(tmp_path / "lod"))
    assert ds.count_rows() == 20
    assert set(ds.columns) == {"id", "name"}


def test_write_non_nullable_enforced(spark, tmp_path):
    """Spark itself coerces/validates nulls in non-nullable columns, so the
    writer-side guard is the safety net for the arrow ingest edge where a
    schema can DECLARE non-nullable while the data still carries nulls.
    Drive the task-side writer directly to prove the guard fires."""
    from unittest.mock import patch

    from lance_spark.write import _fragment_writer

    batch = pa.record_batch(
        [pa.array([1, None], pa.int64()), pa.array(["a", "b"])], names=["id", "name"]
    )

    class _Ctx:
        def partitionId(self):
            return 0

    wf = _fragment_writer(str(tmp_path), 0, non_nullable=["id"])
    with patch("pyspark.TaskContext.get", return_value=_Ctx()):
        with pytest.raises(ValueError, match="non-nullable"):
            list(wf([batch]))
    # nullable columns pass
    wf_ok = _fragment_writer(str(tmp_path), 1, non_nullable=[])
    with patch("pyspark.TaskContext.get", return_value=_Ctx()):
        out = list(wf_ok([batch]))
    assert out[0].column("physical_rows")[0].as_py() == 2


def test_session_manifest_cache(spark, sf_dir, tmp_path):
    """ds.session() cache stats + immutability-safe caching + drop
    invalidation (reference test_session.py shape)."""
    uri = str(tmp_path / "sc")
    nation = spark.read.parquet(f"{sf_dir}/nation.parquet")
    ds = ls.write_dataset(nation, uri)
    sess = ds.session()
    sess.clear()
    v = ds.version
    a = ls.dataset(uri, version=v)
    b = ls.dataset(uri, version=v)
    st = sess.stats()
    assert st["hits"] >= 1 and st["approx_num_items"] >= 1 and sess.size_bytes() > 0
    assert a.manifest is b.manifest  # same cached object
    # drop + recreate at the same uri must NOT serve the old manifest
    old_cols = a.columns
    ls.LanceDataset.drop(uri)
    ds2 = ls.write_dataset(nation.select("n_nationkey", "n_name"), uri)
    fresh = ls.dataset(uri, version=ds2.version)
    assert fresh.columns == ["n_nationkey", "n_name"] != old_cols


def test_commit_lock_seam(spark, sf_dir, tmp_path):
    """Custom commit lock (reference commit.py CommitLock): the manifest
    write runs inside the user's context manager."""
    import contextlib

    uri = str(tmp_path / "cl")
    nation = spark.read.parquet(f"{sf_dir}/nation.parquet")
    ls.write_dataset(nation, uri)
    events = []

    @contextlib.contextmanager
    def lock(version):
        events.append(("acquire", version))
        yield
        events.append(("release", version))

    def build(base, version):
        return mf.Manifest.evolve(base, version, operation="update_config")

    m = mf.commit(uri, build, operation="update_config", commit_lock=lock)
    assert events == [("acquire", m.version), ("release", m.version)]


def test_add_columns_pa_field(spark, sf_dir, tmp_path):
    """add_columns(pa.Field...) adds typed all-null columns (reference
    dataset.py add_columns field input)."""
    nation = spark.read.parquet(f"{sf_dir}/nation.parquet")
    ds = ls.write_dataset(nation, str(tmp_path / "af"))
    ds = ds.add_columns(spark, pa.field("score", pa.float64()))
    ds = ds.add_columns(spark, [pa.field("tag", pa.string()), pa.field("n", pa.int64())])
    df = ds.to_df(spark)
    assert set(df.columns) >= {"score", "tag", "n"}
    row = df.first()
    assert row["score"] is None and row["tag"] is None and row["n"] is None
    assert dict(df.dtypes)["score"] == "double"


def test_merge_from_arrow_table(spark, sf_dir, tmp_path):
    nation = spark.read.parquet(f"{sf_dir}/nation.parquet")
    ds = ls.write_dataset(nation, str(tmp_path / "mt"))
    extra = pa.table({"n_nationkey": list(range(25)), "greeting": [f"hi{i}" for i in range(25)]})
    ds = ds.merge(spark, extra, "n_nationkey")
    df = ds.to_df(spark)
    assert "greeting" in df.columns
    assert df.filter("greeting = 'hi3'").count() == 1
    # RecordBatchReader input too
    renamed = extra.rename_columns(["n_nationkey", "greeting2"])
    rdr = pa.RecordBatchReader.from_batches(renamed.schema, renamed.to_batches())
    ds = ds.checkout_latest().merge(spark, rdr, "n_nationkey")
    assert "greeting2" in ds.to_df(spark).columns


def test_manifest_cache_survives_oob_rmtree(spark, sf_dir, tmp_path):
    """Review regression: an out-of-band rmtree + recreate at the same path
    must not serve the dropped dataset's cached manifest."""
    import shutil

    uri = str(tmp_path / "oob")
    nation = spark.read.parquet(f"{sf_dir}/nation.parquet")
    ls.write_dataset(nation, uri)
    ls.write_dataset(nation, uri, mode="append")
    assert ls.dataset(uri, version=3).columns[0] == "n_nationkey"  # cache it
    shutil.rmtree(uri)  # NOT LanceDataset.drop — no invalidation hook
    ls.write_dataset(nation.select("n_name"), uri)
    with pytest.raises(FileNotFoundError):
        ls.dataset(uri, version=3)
    assert ls.dataset(uri).columns == ["n_name"]


def test_blob_file_closed_contract(spark, tmp_path):
    df = spark.createDataFrame([(1, b"abc" * 10)], "id long, data binary")
    ds = ls.write_dataset(df, str(tmp_path / "bc"), blob_columns=["data"])
    rid = ds.blob_descriptors(spark, "data").first()["_rowid"]
    f = ds.take_blob_files([rid], "data")[0]
    f.close()
    with pytest.raises(ValueError, match="closed"):
        f.read()
    with pytest.raises(ValueError, match="closed"):
        f.seek(0)


def test_data_stats_from_footers(spark, sf_dir, tmp_path):
    nation = spark.read.parquet(f"{sf_dir}/nation.parquet")
    ds = ls.write_dataset(nation.repartition(2), str(tmp_path / "stats"))
    st = ds.data_stats()
    assert set(st["fields"]) == set(nation.columns)
    assert st["fields"]["n_name"]["num_values"] == 25
    assert st["fields"]["n_name"]["compressed_bytes"] > 0
    only = ds.data_stats(columns=["n_nationkey"])
    assert set(only["fields"]) == {"n_nationkey"}

"""Top-level API parity with the reference's ``lance`` namespace
(python/python/lance/__init__.py __all__): every name a reference user
imports resolves here, and the scanner object carries the reference's
materialization surface while remaining a genuine Spark DataFrame.
"""

import os

import pyarrow as pa
import pytest

import lance_spark as ls


@pytest.fixture(scope="module")
def ds(spark, sf_dir, tmp_path_factory):
    uri = str(tmp_path_factory.mktemp("parity")) + "/orders"
    df = spark.read.parquet(os.path.join(sf_dir, "orders.parquet"))
    ls.write_dataset(df.repartition(4), uri, mode="create")
    return ls.dataset(uri)


def test_reference_all_names_resolve():
    ref_all = [
        "BlobColumn", "BlobFile", "DatasetBasePath", "DataStatistics",
        "FieldStatistics", "FragmentMetadata", "Index", "LanceDataset",
        "LanceFragment", "LanceOperation", "LanceScanner",
        "MergeInsertBuilder", "Transaction", "batch_udf", "dataset",
        "json_to_schema", "schema_to_json", "write_dataset",
    ]
    missing = [n for n in ref_all if not hasattr(ls, n)]
    assert not missing, missing


def test_scanner_is_dataframe_and_has_arrow_surface(spark, ds):
    from pyspark.sql import DataFrame

    sc = ds.scanner(spark, columns=["o_orderkey", "o_totalprice"],
                    filter="o_totalprice > 1000")
    assert isinstance(sc, DataFrame)
    assert isinstance(sc, ls.LanceScanner)
    t = sc.to_table()
    assert isinstance(t, pa.Table)
    assert t.column_names == ["o_orderkey", "o_totalprice"]
    assert sc.count_rows() == t.num_rows > 0
    # DataFrame ops still work and return plain DataFrames
    assert sc.select("o_orderkey").count() == t.num_rows
    # batches / reader round-trip the same rows
    n = sum(b.num_rows for b in sc.to_batches(batch_size=512))
    assert n == t.num_rows
    rdr = sc.to_reader()
    assert rdr.read_all().num_rows == t.num_rows


def test_scanner_schemas_and_plan(spark, ds):
    sc = ds.scanner(spark, columns=["o_orderkey"])
    assert sc.projected_schema.names == ["o_orderkey"]
    assert "o_orderkey" in sc.dataset_schema.names
    plan = sc.explain_plan()
    assert "Scan" in plan or "Physical Plan" in plan


def test_search_scanner_is_wrapped(spark, sf_dir, tmp_path):
    uri = str(tmp_path / "docs")
    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    ls.write_dataset(docs.repartition(2), uri, mode="create")
    ds2 = ls.dataset(uri)
    sc = ds2.scanner(spark, full_text_query="table scan", limit=5)
    assert isinstance(sc, ls.LanceScanner)
    assert sc.to_table().num_rows <= 5


def test_transaction_commit(spark, ds):
    v0 = ds.version
    txn = ls.Transaction(
        read_version=v0,
        operation=ls.LanceOperation.Append(fragments=[]),
        transaction_properties={"who": "parity-test"},
    )
    ds2 = ls.commit(ds.uri, txn)
    assert ds2.version == v0 + 1
    assert ds2.count_rows() == ds.count_rows()


def test_fragment_metadata_alias(ds):
    frag = ds.manifest.fragments[0]
    assert isinstance(frag, ls.FragmentMetadata)
    assert frag.num_deletions == 0
    assert frag.num_rows == frag.physical_rows


def test_data_statistics_typed(ds):
    stats = ds.data_statistics(columns=["o_orderkey", "o_totalprice"])
    assert isinstance(stats, ls.DataStatistics)
    names = {f.id for f in stats.fields}
    assert len(stats.fields) == 2 and all(f.bytes_on_disk > 0 for f in stats.fields)
    assert names == {ds.columns.index("o_orderkey"), ds.columns.index("o_totalprice")}


def test_list_indices_objects(spark, ds):
    from lance_spark.indexes.scalar import create_scalar_index

    ds2 = create_scalar_index(ds, spark, "o_orderkey", kind="BTREE")
    objs = ds2.list_indices(as_objects=True)
    assert objs and isinstance(objs[0], ls.Index)
    assert objs[0].fields == ["o_orderkey"]
    assert objs[0].fragment_ids == {f.id for f in ds2.manifest.fragments}


def test_blob_column_iterates_file_likes():
    col = ls.BlobColumn(pa.chunked_array([pa.array([b"alpha", b"beta"])]))
    vals = [f.read() for f in col]
    assert vals == [b"alpha", b"beta"]
    with pytest.raises(ValueError):
        ls.BlobColumn(pa.array([1, 2]))


def test_storage_options_provider_called_at_open(ds):
    from lance_spark.io import StorageOptionsProvider

    calls = []

    class Prov(StorageOptionsProvider):
        def fetch_storage_options(self):
            calls.append(1)
            return {"aws_session_token": "tmp", "region": "us-east-1"}

    d2 = ls.dataset(ds.uri, storage_options_provider=Prov())
    assert calls == [1], "provider must be queried at open (refresh point)"
    assert d2.storage_options["region"] == "us-east-1"
    # explicit options override fetched ones
    d3 = ls.dataset(ds.uri, storage_options_provider=Prov(),
                    storage_options={"region": "eu-west-1"})
    assert d3.storage_options["region"] == "eu-west-1"
    assert ls.dataset(ds.uri).storage_options == {}


def test_namespace_storage_options_provider(ds, tmp_path):
    from lance_spark.namespace import (
        DirectoryNamespace,
        LanceNamespaceStorageOptionsProvider,
    )

    ns = DirectoryNamespace(str(tmp_path / "ns"))
    ns.register_table(["orders"], ds.uri)
    prov = LanceNamespaceStorageOptionsProvider(ns, ["orders"])
    opts = prov.fetch_storage_options()
    assert opts["location"] == ds.uri
    d2 = ls.dataset(ds.uri, storage_options_provider=prov)
    assert d2.storage_options["location"] == ds.uri


def test_unimplemented_pyarrow_interface_stubs(ds):
    for call in (lambda: ds.join(None, "k"), ds.partition_expression,
                 lambda: ds.replace_schema(None)):
        with pytest.raises(NotImplementedError):
            call()
    assert ds.migrate_manifest_paths_v2() is None
    assert ds.latest_version() >= ds.version


def test_scan_stats_callback(spark, ds):
    got = []
    sc = ds.scanner(spark, columns=["o_orderkey"], scan_stats_callback=got.append)
    n = sc.count_rows()
    assert n > 0 and len(got) == 1
    st = got[0]
    assert isinstance(st, ls.ScanStatistics)
    assert st.parts_loaded > 0, st.all_counts
    assert st.bytes_read > 0, st.all_counts
    # scan_stats() one-shot helper
    st2 = ds.scanner(spark, columns=["o_orderkey"]).scan_stats()
    assert st2.parts_loaded == st.parts_loaded


def test_commit_batch_accepts_transactions(spark, sf_dir, tmp_path):
    from lance_spark.write import write_fragments

    uri = str(tmp_path / "ds")
    df = spark.read.parquet(os.path.join(sf_dir, "region.parquet"))
    ls.write_dataset(df, uri, mode="create")
    ds = ls.dataset(uri)
    n0 = ds.count_rows()
    frags = write_fragments(df, uri, base_fragment_id=100)
    txns = [ls.Transaction(read_version=ds.version,
                           operation=ls.LanceOperation.Append(fragments=frags))]
    res = ls.LanceDataset.commit_batch(uri, txns)
    assert res["dataset"].count_rows() == 2 * n0


def test_blob_column_yields_none_for_nulls():
    col = ls.BlobColumn(pa.array([b"x", None], type=pa.binary()))
    vals = list(col)
    assert vals[0].read() == b"x" and vals[1] is None


def test_dataset_schema_is_arrow(spark, ds):
    sc = ds.scanner(spark, columns=["o_orderkey"])
    assert isinstance(sc.dataset_schema, pa.Schema)
    assert isinstance(sc.projected_schema, pa.Schema)


def test_storage_options_carry_to_derived_handles(ds):
    calls = []

    class Prov:
        def fetch_storage_options(self):
            calls.append(1)
            return {"token": f"t{len(calls)}"}

    d = ls.dataset(ds.uri, storage_options_provider=Prov(),
                   storage_options={"region": "r1"})
    d2 = d.checkout_version(d.version)
    # provider re-queried at derive (refresh), explicit options carried
    assert len(calls) == 2
    assert d2.storage_options == {"token": "t2", "region": "r1"}


def test_io_counters_accumulate(spark, ds):
    from lance_spark.scanner import enable_io_counters

    b0, i0 = ls.bytes_read_counter(), ls.iops_counter()
    enable_io_counters(True)
    try:
        ds.scanner(spark, columns=["o_orderkey"]).to_table()
    finally:
        enable_io_counters(False)
    assert ls.bytes_read_counter() > b0
    assert ls.iops_counter() > i0


def test_set_logger(tmp_path):
    import logging

    log = ls.set_logger(str(tmp_path / "l.log"), name="lance_spark.test",
                        level=logging.DEBUG)
    log.debug("hello")
    for h in list(log.handlers):
        h.flush()
    assert "hello" in (tmp_path / "l.log").read_text()


def test_stats_namespace_both_shapes(spark, ds):
    # legacy flat-dict call shape
    flat = ds.stats()
    assert flat["num_fragments"] >= 1 and "num_rows" in flat
    # reference namespace shape
    dstats = ds.stats.dataset_stats()
    assert set(dstats) == {"num_deleted_rows", "num_fragments", "num_small_files"}
    assert isinstance(ds.stats.data_stats(), ls.DataStatistics)
    from lance_spark.indexes.scalar import create_scalar_index

    ds2 = create_scalar_index(ds, spark, "o_custkey", kind="BITMAP")
    st = ds2.stats.index_stats("o_custkey_bitmap_idx")
    assert st and isinstance(st, dict)


def test_write_dataset_declared_schema_casts(spark, tmp_path):
    import pyarrow as _pa

    df = spark.createDataFrame([(1, 2.5, "drop")], "x long, y double, z string")
    declared = _pa.schema([_pa.field("x", _pa.int32()), _pa.field("y", _pa.float32())])
    uri = str(tmp_path / "cast")
    ds = ls.write_dataset(df, uri, mode="create", schema=declared)
    assert [f.name for f in ds.schema.fields] == ["x", "y"]
    assert ds.schema["x"].dataType.simpleString() == "int"
    assert ds.schema["y"].dataType.simpleString() == "float"
    with pytest.raises(ValueError, match="missing from input"):
        ls.write_dataset(df, str(tmp_path / "c2"), mode="create",
                         schema=_pa.schema([_pa.field("nope", _pa.int64())]))


def test_commit_logs_to_package_logger(spark, sf_dir, tmp_path, caplog):
    import logging

    df = spark.read.parquet(os.path.join(sf_dir, "region.parquet"))
    with caplog.at_level(logging.INFO, logger="lance_spark"):
        ls.write_dataset(df, str(tmp_path / "logds"), mode="create")
    assert any("commit create version=1" in r.message for r in caplog.records)


def test_scanner_usable_as_join_right_side(spark, ds):
    """The subclass contract: a LanceScanner must be accepted anywhere a
    DataFrame is — including the RIGHT side of a plain-DataFrame join."""
    left = spark.createDataFrame([(1,), (2,)], "o_orderkey long")
    sc = ds.scanner(spark, columns=["o_orderkey", "o_totalprice"])
    joined = left.join(sc, "o_orderkey")
    assert joined.count() >= 0
    assert {r["o_orderkey"] for r in joined.select("o_orderkey").distinct().collect()} <= {1, 2}


def test_merge_index_metadata_redirects(ds):
    with pytest.raises(NotImplementedError, match="load_shuffled_vectors"):
        ds.merge_index_metadata("uuid", "IVF_PQ")


def test_vector_index_reader(spark, sf_dir, tmp_path):
    """VectorIndexReader (reference dataset.py:5404): partition count,
    centroids, per-partition point reads with _rowid; vector-vs-codes
    column by index type; range and non-vector-index errors."""
    from lance_spark.dataset import VectorIndexReader

    emb = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
    uri = str(tmp_path / "vir")
    ls.write_dataset(emb, uri, mode="create")
    ds = ls.dataset(uri).create_index(
        spark, "embedding", index_type="IVF_FLAT", num_partitions=4, metric="cosine"
    )
    r = VectorIndexReader(ds, "embedding_idx")
    assert r.num_partitions() == 4
    assert r.centroids().shape[0] == 4
    total = 0
    for p in range(4):
        t = r.read_partition(p)
        assert t.column_names == ["_rowid"]
        total += t.num_rows
    assert total == emb.count()
    withv = r.read_partition(0, with_vector=True)
    assert withv.column_names == ["_rowid", "vec"]
    with pytest.raises(IndexError):
        r.read_partition(4)
    with pytest.raises(ValueError, match="not vector index"):
        VectorIndexReader(ds, "nope")

    ds2 = ds.create_index(
        spark, "embedding", index_type="IVF_PQ", name="pq_idx",
        num_partitions=4, num_sub_vectors=8, metric="cosine",
    )
    codes = VectorIndexReader(ds2, "pq_idx").read_partition(0, with_vector=True)
    assert codes.column_names == ["_rowid", "pq_code"]


def test_scan_batches_tags_fragments(spark, ds):
    """scan_batches yields (record_batch, fragment) pairs covering every
    fragment and row exactly once, honoring the scanner's projection;
    the reference's unimplemented from_* statics raise here too."""
    from lance_spark.scanner import LanceScanner, TaggedRecordBatch

    sc = ds.scanner(spark, columns=["o_orderkey"])
    tagged = list(sc.scan_batches())
    assert tagged and all(isinstance(t, TaggedRecordBatch) for t in tagged)
    assert {t.fragment.id for t in tagged} == {f.id for f in ds.manifest.fragments}
    assert sum(t.record_batch.num_rows for t in tagged) == ds.count_rows()
    assert all(t.record_batch.schema.names == ["o_orderkey"] for t in tagged)
    for fn in (LanceScanner.from_dataset, LanceScanner.from_fragment, LanceScanner.from_batches):
        with pytest.raises(NotImplementedError):
            fn()


def test_vector_index_reader_hnsw_flat_returns_vectors(spark, sf_dir, tmp_path):
    """IVF_HNSW_FLAT stores no quantized codes — read_partition(with_vector)
    must return the raw vectors, not an all-null pq_code column."""
    from lance_spark.dataset import VectorIndexReader

    emb = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
    uri = str(tmp_path / "virh")
    ls.write_dataset(emb, uri, mode="create")
    ds = ls.dataset(uri).create_index(
        spark, "embedding", index_type="IVF_HNSW_FLAT", num_partitions=2, metric="cosine"
    )
    t = VectorIndexReader(ds, "embedding_idx").read_partition(0, with_vector=True)
    assert t.column_names == ["_rowid", "vec"]
    assert t.column("vec").null_count == 0 and t.num_rows > 0


def test_scan_batches_honors_filter_and_fragments(spark, ds):
    """scan_batches re-runs the scanner's recorded plan — filter and
    fragment restriction included; limit/offset refused."""
    sc = ds.scanner(spark, columns=["o_orderkey"], filter="o_orderkey % 2 = 0")
    tagged = list(sc.scan_batches())
    n = sum(t.record_batch.num_rows for t in tagged)
    assert n == ds.to_df(spark).filter("o_orderkey % 2 = 0").count()
    frag0 = ds.manifest.fragments[0].id
    only = list(ds.scanner(spark, columns=["o_orderkey"], fragments=[frag0]).scan_batches())
    assert {t.fragment.id for t in only} == {frag0}
    with pytest.raises(ValueError, match="limit"):
        list(ds.scanner(spark, columns=["o_orderkey"], limit=5).scan_batches())


def test_scan_batches_chunked_jobs(spark, ds, monkeypatch):
    """scan_batches executes ONE Spark job per fragment_batch_size chunk,
    not one per fragment (r11 fix) — pinned by counting the sub-scanner
    constructions — and a chunked run tags identically to the per-fragment
    path."""
    from lance_spark.dataset import LanceDataset

    n_frags = len(ds.manifest.fragments)
    assert n_frags >= 2
    orig = LanceDataset.scanner
    calls = {"n": 0}

    def counting(self, *a, **k):
        calls["n"] += 1
        return orig(self, *a, **k)

    monkeypatch.setattr(LanceDataset, "scanner", counting)
    sc = orig(ds, spark, columns=["o_orderkey"])
    chunked = list(sc.scan_batches(fragment_batch_size=max(2, n_frags)))
    assert calls["n"] == 1  # whole scan in one chunk → one sub-scan job
    monkeypatch.undo()

    per_frag = list(
        ds.scanner(spark, columns=["o_orderkey"]).scan_batches(fragment_batch_size=1)
    )

    def flat(tagged):
        return sorted(
            (t.fragment.id, v)
            for t in tagged
            for v in t.record_batch.column("o_orderkey").to_pylist()
        )

    assert flat(chunked) == flat(per_frag)
    assert all(
        t.record_batch.schema.names == ["o_orderkey"] for t in chunked
    )  # _rowid helper column stripped

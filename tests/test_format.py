"""Table-format tests: write/read roundtrip, versioning, mutations,
schema evolution, compaction, cleanup — the M0-M2 surface of SURVEY §7.

Modeled on the reference's python/python/tests/test_dataset.py coverage
(write modes, versions, merge, update, distributed commit).
"""

import os

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

import lance_spark as ls
from lance_spark import manifest as mf


@pytest.fixture()
def tmp_uri(tmp_path):
    return str(tmp_path / "ds")


def _lineitem(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/lineitem.parquet")


def test_write_read_roundtrip(spark, sf_dir, tmp_uri):
    src = _lineitem(spark, sf_dir)
    ds = ls.write_dataset(src.repartition(4), tmp_uri, mode="create")
    assert ds.version == 1
    assert ds.count_rows() == src.count()
    got = ds.to_df(spark)
    assert got.columns == src.columns
    assert got.count() == src.count()
    # value fidelity: checksum a numeric column
    a = src.agg(F.sum("l_extendedprice")).collect()[0][0]
    b = got.agg(F.sum("l_extendedprice")).collect()[0][0]
    assert abs(a - b) / abs(a) < 1e-12  # summation-order tolerance
    # fragments: one per partition
    assert len(ds.manifest.fragments) == 4


def test_rowids_unique_and_addressed(spark, sf_dir, tmp_uri):
    ds = ls.write_dataset(_lineitem(spark, sf_dir).repartition(3), tmp_uri)
    df = ds.to_df(spark, with_row_id=True)
    n = df.count()
    assert df.select("_rowid").distinct().count() == n
    frag_ids = {r[0] for r in df.select(F.shiftright("_rowid", 32)).distinct().collect()}
    assert frag_ids == {f.id for f in ds.manifest.fragments}


def test_append_and_overwrite_and_time_travel(spark, sf_dir, tmp_uri):
    nation = spark.read.parquet(f"{sf_dir}/nation.parquet")
    ds = ls.write_dataset(nation, tmp_uri, mode="create")
    ds = ls.write_dataset(nation, tmp_uri, mode="append")
    # append = reserve_fragments (v2) + append (v3)
    assert ds.version == 3
    assert ds.count_rows() == 50
    v1 = ds.checkout_version(1)
    assert v1.count_rows() == 25
    ds = ls.write_dataset(nation.limit(5), tmp_uri, mode="overwrite")
    assert ds.version == 4
    assert ds.count_rows() == 5
    # restore v1 as v5
    restored = ls.dataset(tmp_uri, version=1).restore()
    assert restored.version == 5
    assert restored.count_rows() == 25


def test_tags(spark, sf_dir, tmp_uri):
    ds = ls.write_dataset(spark.read.parquet(f"{sf_dir}/region.parquet"), tmp_uri)
    ds.create_tag("stable")
    ls.write_dataset(spark.read.parquet(f"{sf_dir}/region.parquet"), tmp_uri, mode="append")
    tagged = ls.dataset(tmp_uri, tag="stable")
    assert tagged.version == 1
    assert tagged.count_rows() == 5
    assert ds.tags() == {"stable": 1}


def test_scanner_filter_project_limit(spark, sf_dir, tmp_uri):
    ds = ls.write_dataset(_lineitem(spark, sf_dir).repartition(2), tmp_uri)
    out = ds.scanner(
        spark,
        columns=["l_orderkey", "l_quantity"],
        filter="l_quantity > 40 and l_returnflag == 'R'",
    )
    assert out.columns == ["l_orderkey", "l_quantity"]
    pdf = out.toPandas()
    assert (pdf.l_quantity > 40).all()
    # computed projection (scanner.rs:720 project_with_transform)
    out2 = ds.scanner(spark, columns={"ok": "l_orderkey", "disc_price": "l_extendedprice * (1 - l_discount)"})
    assert out2.columns == ["ok", "disc_price"]
    # limit/offset determinism on scan order
    l1 = ds.scanner(spark, limit=10, offset=5).collect()
    l2 = ds.scanner(spark, limit=10, offset=5).collect()
    assert l1 == l2


def test_count_fast_path(spark, sf_dir, tmp_uri):
    ds = ls.write_dataset(_lineitem(spark, sf_dir), tmp_uri)
    assert ds.count_rows() == 6000 or ds.count_rows() > 0
    filtered = ds.count_rows(spark, filter="l_discount > 0.05")
    oracle = _lineitem(spark, sf_dir).filter("l_discount > 0.05").count()
    assert filtered == oracle


def test_take(spark, sf_dir, tmp_uri):
    ds = ls.write_dataset(_lineitem(spark, sf_dir).repartition(3), tmp_uri)
    some = ds.to_df(spark, with_row_id=True).limit(5).collect()
    ids = [r["_rowid"] for r in some]
    got = ds.take(spark, ids).collect()
    assert len(got) == 5
    assert {r["_rowid"] for r in got} == set(ids)


def test_delete(spark, sf_dir, tmp_uri):
    ds = ls.write_dataset(_lineitem(spark, sf_dir).repartition(2), tmp_uri)
    before = ds.count_rows()
    dead = ds.to_df(spark).filter("l_quantity >= 45").count()
    ds2 = ds.delete(spark, "l_quantity >= 45")
    assert ds2.version == 2
    assert ds2.count_rows() == before - dead
    assert ds2.to_df(spark).filter("l_quantity >= 45").count() == 0
    # old version still intact (deletion files are version-scoped)
    assert ds.checkout_version(1).count_rows(spark, filter="l_quantity >= 45") == dead
    # second delete unions with the first
    ds3 = ds2.delete(spark, "l_quantity <= 2")
    assert ds3.to_df(spark).filter("l_quantity <= 2 or l_quantity >= 45").count() == 0


def test_delete_whole_fragment_drops_it(spark, sf_dir, tmp_uri):
    ds = ls.write_dataset(spark.read.parquet(f"{sf_dir}/nation.parquet"), tmp_uri)
    ds2 = ds.delete(spark, "n_nationkey >= 0")  # everything
    assert ds2.count_rows() == 0
    assert len(ds2.manifest.fragments) == 0


def test_update(spark, sf_dir, tmp_uri):
    ds = ls.write_dataset(spark.read.parquet(f"{sf_dir}/supplier.parquet"), tmp_uri)
    ds2 = ds.update(spark, {"s_acctbal": "s_acctbal + 100.0"}, where="s_suppkey <= 5")
    n_matched = ds.to_df(spark).filter("s_suppkey <= 5").count()
    assert n_matched > 0
    old = ds.to_df(spark).filter("s_suppkey <= 5").agg(F.sum("s_acctbal")).collect()[0][0]
    new = ds2.to_df(spark).filter("s_suppkey <= 5").agg(F.sum("s_acctbal")).collect()[0][0]
    assert abs(new - (old + 100.0 * n_matched)) < 1e-6
    assert ds2.count_rows() == ds.count_rows()


def test_merge_insert(spark, sf_dir, tmp_uri):
    cust = spark.read.parquet(f"{sf_dir}/customer.parquet")
    ds = ls.write_dataset(cust, tmp_uri)
    # source: update half the rows' acctbal, add 10 brand-new customers
    updates = cust.filter("c_custkey <= 50").withColumn("c_acctbal", F.lit(999.0))
    news = cust.filter("c_custkey <= 10").withColumn(
        "c_custkey", F.col("c_custkey") + 100000
    )
    source = updates.unionByName(news)
    n_new = news.count()
    ds2 = (
        ds.merge_insert("c_custkey")
        .when_matched_update_all()
        .when_not_matched_insert_all()
        .execute(spark, source)
    )
    out = ds2.to_df(spark)
    assert out.count() == cust.count() + n_new
    assert out.filter("c_custkey <= 50 and c_acctbal != 999.0").count() == 0
    assert out.filter("c_custkey >= 100000").count() == n_new
    # untouched rows intact
    a = cust.filter("c_custkey > 50").agg(F.sum("c_acctbal")).collect()[0][0]
    b = out.filter("c_custkey > 50 and c_custkey < 100000").agg(F.sum("c_acctbal")).collect()[0][0]
    assert abs(a - b) < 1e-6


def test_merge_insert_delete_not_matched(spark, sf_dir, tmp_uri):
    nation = spark.read.parquet(f"{sf_dir}/nation.parquet")
    ds = ls.write_dataset(nation, tmp_uri)
    source = nation.filter("n_nationkey < 10")
    ds2 = (
        ds.merge_insert("n_nationkey")
        .when_matched_update_all()
        .when_not_matched_by_source_delete()
        .execute(spark, source)
    )
    assert ds2.count_rows() == 10


def test_add_columns_sql(spark, sf_dir, tmp_uri):
    ds = ls.write_dataset(spark.read.parquet(f"{sf_dir}/part.parquet"), tmp_uri)
    ds2 = ds.add_columns(spark, {"double_price": "p_retailprice * 2"})
    assert "double_price" in ds2.columns
    df = ds2.to_df(spark)
    bad = df.filter(F.abs(F.col("double_price") - 2 * F.col("p_retailprice")) > 1e-9).count()
    assert bad == 0
    # original files untouched: fragment now has 2 column-group files
    assert all(len(f.files) == 2 for f in ds2.manifest.fragments)


def test_add_columns_udf(spark, sf_dir, tmp_uri):
    ds = ls.write_dataset(spark.read.parquet(f"{sf_dir}/nation.parquet"), tmp_uri)

    def namelen(pdf):
        import pandas as pd

        return pd.DataFrame({"name_len": pdf["n_name"].str.len()})

    ds2 = ds.add_columns(spark, namelen, read_columns=["n_name"])
    got = {r.n_name: r.name_len for r in ds2.to_df(spark).collect()}
    assert all(len(k) == v for k, v in got.items())


def test_merge_attach_columns(spark, sf_dir, tmp_uri):
    ds = ls.write_dataset(spark.read.parquet(f"{sf_dir}/nation.parquet"), tmp_uri)
    right = spark.read.parquet(f"{sf_dir}/region.parquet").select(
        F.col("r_regionkey").alias("n_regionkey"), F.col("r_name")
    )
    ds2 = ds.merge(spark, right, left_on="n_regionkey")
    assert "r_name" in ds2.columns
    df = ds2.to_df(spark)
    assert df.filter(F.col("r_name").isNull()).count() == 0


def test_drop_and_rename_columns(spark, sf_dir, tmp_uri):
    ds = ls.write_dataset(spark.read.parquet(f"{sf_dir}/region.parquet"), tmp_uri)
    ds2 = ds.drop_columns(["r_name"])
    assert ds2.columns == ["r_regionkey"]
    assert ds2.to_df(spark).columns == ["r_regionkey"]
    ds3 = ds2.alter_columns({"path": "r_regionkey", "rename": "regionkey"})
    assert ds3.columns == ["regionkey"]
    assert ds3.to_df(spark).select("regionkey").count() == 5


def test_compact_preserves_rowids(spark, sf_dir, tmp_uri):
    ds = ls.write_dataset(_lineitem(spark, sf_dir).repartition(8), tmp_uri)
    ds = ds.delete(spark, "l_quantity > 30")
    before = ds.to_df(spark, with_row_id=True)
    before_ids = {r[0] for r in before.select("_rowid").collect()}
    ds2 = ds.compact_files(spark, target_rows_per_fragment=100000)
    assert len(ds2.manifest.fragments) < 8
    after = ds2.to_df(spark, with_row_id=True)
    after_ids = {r[0] for r in after.select("_rowid").collect()}
    assert before_ids == after_ids  # stable row ids across compaction
    assert ds2.count_rows() == len(before_ids)
    # deletions materialized
    assert all(f.num_deleted_rows == 0 for f in ds2.manifest.fragments)


def test_cleanup_old_versions(spark, sf_dir, tmp_uri):
    ds = ls.write_dataset(spark.read.parquet(f"{sf_dir}/region.parquet"), tmp_uri)
    ds = ls.write_dataset(spark.read.parquet(f"{sf_dir}/region.parquet"), tmp_uri, mode="overwrite")
    ds = ls.write_dataset(spark.read.parquet(f"{sf_dir}/region.parquet"), tmp_uri, mode="overwrite")
    removed = ds.cleanup_old_versions(older_than_seconds=0.0)
    assert removed >= 2
    assert mf.list_versions(ds.uri) == [3]
    assert ds.count_rows() == 5
    # latest still readable
    assert ls.dataset(ds.uri).to_df(spark).count() == 5


def test_commit_conflict_retry(spark, sf_dir, tmp_uri):
    ds = ls.write_dataset(spark.read.parquet(f"{sf_dir}/region.parquet"), tmp_uri)
    # simulate a concurrent writer claiming version 2, then append: should
    # retry onto version 3
    m = ds.manifest
    stolen = mf.Manifest(
        version=2,
        schema_json=m.schema_json,
        fragments=m.fragments,
        max_fragment_id=m.max_fragment_id,
        operation="append",
    )
    mf.write_manifest(ds.uri, stolen)
    ds2 = ls.write_dataset(
        spark.read.parquet(f"{sf_dir}/region.parquet"), tmp_uri, mode="append"
    )
    # reserve lands on v3 (after retrying past the stolen v2), append on v4
    assert ds2.version == 4
    # 5 rows from the (stolen) v2 base + 5 appended
    assert ds2.count_rows() == 10


def test_sql_entry(spark, sf_dir, tmp_uri):
    ds = ls.write_dataset(_lineitem(spark, sf_dir), tmp_uri)
    out = ds.sql(
        spark,
        """SELECT l_returnflag, count(*) AS n, round(sum(l_quantity), 2) AS sq
           FROM dataset GROUP BY l_returnflag ORDER BY l_returnflag""",
        table_name="dataset",
    ).collect()
    oracle = (
        _lineitem(spark, sf_dir)
        .groupBy("l_returnflag")
        .agg(F.count("*").alias("n"), F.round(F.sum("l_quantity"), 2).alias("sq"))
        .orderBy("l_returnflag")
        .collect()
    )
    assert out == oracle


def test_public_commit_fragments_api(spark, sf_dir, tmp_uri):
    """External-writer protocol: write_fragments (executors) +
    commit_fragments (driver) — the distributed two-phase commit as a
    public API."""
    region = spark.read.parquet(f"{sf_dir}/region.parquet")
    ds = ls.write_dataset(region, tmp_uri)
    start = mf.reserve_fragment_ids(tmp_uri, 2)
    frags = ls.write_fragments(region.repartition(2), tmp_uri, start)
    ls.commit_fragments(tmp_uri, frags, operation="append")
    assert ls.dataset(tmp_uri).count_rows() == 2 * region.count()


def test_scanner_order_by_and_late_materialization(spark, sf_dir, tmp_uri):
    """ColumnOrdering + two-phase top-k: results identical to the eager
    path, and phase-2 wide columns are fetched for k rows only."""
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    ds = ls.write_dataset(orders.repartition(4), tmp_uri)

    eager = ds.scanner(
        spark,
        columns=["o_orderkey", "o_orderpriority"],
        order_by=[("o_totalprice", "desc"), ("o_orderkey", "asc")],
        limit=7,
    ).collect()
    late = ds.scanner(
        spark,
        columns=["o_orderkey", "o_orderpriority"],
        order_by=[("o_totalprice", "desc"), ("o_orderkey", "asc")],
        limit=7,
        late_materialization=True,
    ).collect()
    want = [
        (r["o_orderkey"], r["o_orderpriority"])
        for r in orders.orderBy(F.desc("o_totalprice"), F.asc("o_orderkey")).limit(7).collect()
    ]
    assert [(r["o_orderkey"], r["o_orderpriority"]) for r in eager] == want
    assert [(r["o_orderkey"], r["o_orderpriority"]) for r in late] == want

    # nulls placement variants execute
    ds.scanner(spark, order_by=[("o_orderdate", "asc", "nulls_last")], limit=3).collect()


def test_alter_columns_cast(spark, sf_dir, tmp_uri):
    """data_type cast = one column-group rewrite (add->drop->rename),
    other columns untouched."""
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    ds = ls.write_dataset(orders, tmp_uri)
    ds = ds.alter_columns({"path": "o_totalprice", "data_type": "DECIMAL(12,2)"}, spark=spark)
    got = ds.to_df(spark)
    assert dict(got.dtypes)["o_totalprice"] == "decimal(12,2)"
    assert set(got.columns) == set(orders.columns)
    import decimal
    want = orders.agg(F.sum(F.col("o_totalprice").cast("decimal(12,2)"))).first()[0]
    assert got.agg(F.sum("o_totalprice")).first()[0] == want


def test_index_statistics_and_prewarm(spark, sf_dir, tmp_uri):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    ds = ls.write_dataset(emb.repartition(2), tmp_uri)
    ds = ds.create_index(spark, "embedding", index_type="IVF_FLAT", num_partitions=4, metric="l2")
    name = ds.list_indices()[0]["name"]
    stats = ds.index_statistics(name)
    assert stats["num_unindexed_fragments"] == 0 and stats["num_indexed_rows"] == emb.count()
    ds.insert(emb.limit(10))
    ds2 = ls.dataset(tmp_uri)
    stats2 = ds2.index_statistics(name)
    assert stats2["num_unindexed_rows"] == 10
    ds2.prewarm_index(spark, name)  # executes without error, caches the table


def test_shallow_clone(spark, sf_dir, tmp_path):
    """Clone references source files in place; mutations diverge; cleanup on
    the clone never touches source files (dataset.py:3328 semantics)."""
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    src_uri = str(tmp_path / "src")
    ds = ls.write_dataset(orders.repartition(3), src_uri)
    n = ds.count_rows()

    clone = ds.shallow_clone(str(tmp_path / "clone"))
    assert clone.version == 1 and clone.count_rows() == n
    # no data files copied into the clone root
    assert not os.path.isdir(os.path.join(clone.uri, "data"))
    assert clone.to_df(spark).agg(F.sum("o_totalprice")).first()[0] == pytest.approx(
        orders.agg(F.sum("o_totalprice")).first()[0]
    )

    # clone over existing root refuses
    with pytest.raises(ValueError):
        ds.shallow_clone(clone.uri)

    # divergence: delete on the clone, source untouched
    clone = clone.delete(spark, "o_orderstatus = 'F'")
    assert clone.count_rows() < n
    assert ls.dataset(src_uri).count_rows() == n

    # appends land under the clone root
    clone = clone.insert(orders.limit(5))
    assert os.path.isdir(os.path.join(clone.uri, "data"))
    # cleanup on the clone: source files all survive
    from lance_spark.maintenance import cleanup_old_versions

    cleanup_old_versions(clone, older_than_seconds=0.0, keep_tagged=False)
    assert ls.dataset(src_uri).count_rows() == n
    assert ls.dataset(clone.uri).count_rows() == clone.count_rows()


def test_merge_insert_when_matched_fail(spark, sf_dir, tmp_uri):
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    ds = ls.write_dataset(orders, tmp_uri)
    fresh = orders.limit(5).withColumn("o_orderkey", F.col("o_orderkey") + 10_000_000)
    # no matches: insert proceeds
    ds = (
        ds.merge_insert("o_orderkey")
        .when_matched_fail()
        .when_not_matched_insert_all()
        .execute(spark, fresh)
    )
    assert ds.count_rows() == orders.count() + 5
    # overlap: merge aborts, dataset unchanged
    with pytest.raises(ValueError, match="when_matched_fail"):
        (
            ds.merge_insert("o_orderkey")
            .when_matched_fail()
            .when_not_matched_insert_all()
            .execute(spark, orders.limit(3))
        )
    assert ls.dataset(tmp_uri).count_rows() == orders.count() + 5


def test_compaction_remaps_index_coverage(spark, sf_dir, tmp_path):
    """Rewrite keeps index coverage (optimize.rs:982 remap): fully-covered
    victims -> new fragments covered; stats show zero unindexed rows."""
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    ds = ls.write_dataset(emb.repartition(6), str(tmp_path / "emb"))
    ds = ds.create_index(spark, "embedding", index_type="IVF_FLAT", num_partitions=4, metric="l2")
    name = ds.list_indices()[0]["name"]
    assert ds.index_statistics(name)["num_unindexed_rows"] == 0
    ds2 = ds.compact_files(spark, target_rows_per_fragment=100_000)
    assert len(ds2.manifest.fragments) < 6
    stats = ds2.index_statistics(name)
    assert stats["num_unindexed_rows"] == 0 and stats["num_indexed_rows"] == emb.count()


def test_cleanup_spares_young_orphans(spark, sf_dir, tmp_uri):
    """An unreferenced file younger than the grace period may be a concurrent
    writer's in-flight fragment — cleanup must NOT delete it unless
    delete_unverified=True (cleanup.rs maybe-in-progress guard)."""
    ds = ls.write_dataset(spark.read.parquet(f"{sf_dir}/region.parquet"), tmp_uri)
    orphan = os.path.join(tmp_uri, "data", "frag-inflight-deadbeef.parquet")
    with open(orphan, "wb") as fh:
        fh.write(b"not yet committed")
    ds.cleanup_old_versions(older_than_seconds=0.0)
    assert os.path.exists(orphan)  # young orphan survives
    ds.cleanup_old_versions(older_than_seconds=0.0, delete_unverified=True)
    assert not os.path.exists(orphan)  # caller asserted no writer is active
    assert ls.dataset(tmp_uri).to_df(spark).count() == 5


def test_compaction_detects_concurrent_delete(spark, sf_dir, tmp_uri):
    """A delete committed between compaction's scan and its commit must not
    be resurrected: the stale compaction retries from the fresh snapshot
    (transaction.rs Rewrite-vs-Delete conflict)."""
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    ds = ls.write_dataset(orders.repartition(4), tmp_uri)
    stale = ls.dataset(tmp_uri)  # snapshot taken BEFORE the delete
    fresh = ls.dataset(tmp_uri).delete(spark, "o_orderkey % 2 = 0")
    want = fresh.count_rows()
    # compacting through the stale handle must converge on the fresh state
    out = stale.compact_files(spark, target_rows_per_fragment=10_000)
    assert out.count_rows() == want
    assert out.to_df(spark).filter("o_orderkey % 2 = 0").count() == 0


def test_manifest_carries_blob_columns_through_commits(spark, tmp_uri):
    """restore / drop_index / alter_columns must not reset blob_columns
    (the Manifest.evolve carry-forward)."""
    rows = [Row(doc_id=i, img=bytes([i] * 40), n=i) for i in range(8)]
    df = spark.createDataFrame(rows)
    ds = ls.write_dataset(df.repartition(2), tmp_uri, blob_columns=["img"])
    assert ds.manifest.blob_columns == ["img"]
    ds = ds.create_scalar_index(spark, "n", "BTREE")
    assert ds.manifest.blob_columns == ["img"]
    ds = ds.drop_index(next(i.name for i in ds.manifest.indices))
    assert ds.manifest.blob_columns == ["img"]
    ds = ds.checkout_version(1).restore()
    assert ds.manifest.blob_columns == ["img"]
    from lance_spark.evolution import alter_columns

    ds = alter_columns(ds, {"path": "img", "rename": "image"})
    assert ds.manifest.blob_columns == ["image"]
    # appends after the metadata commits still split the blob column group
    ds2 = ls.dataset(tmp_uri)
    assert ds2.manifest.blob_columns == ["image"]


def test_write_dataset_arrow_table_type_mappings(spark, tmp_uri):
    """Arrow ingest parity (datatypes.rs:160-190): dictionary decode,
    lance.bfloat16 -> float32, large_string, fixed_size_list -> list."""
    import numpy as np
    import pyarrow as pa

    from lance_spark.types import BFLOAT16_EXTENSION, normalize_arrow_table

    class Bf16Type(pa.ExtensionType):
        def __init__(self):
            super().__init__(pa.binary(2), BFLOAT16_EXTENSION)

        def __arrow_ext_serialize__(self):
            return b""

        @classmethod
        def __arrow_ext_deserialize__(cls, storage_type, serialized):
            return cls()

    def bf16_bytes(f):
        # top 16 bits of the f32 pattern, little-endian
        return np.float32(f).tobytes()[2:4]

    bf = pa.ExtensionArray.from_storage(
        Bf16Type(), pa.array([bf16_bytes(1.5), bf16_bytes(-2.0), None], pa.binary(2))
    )
    table = pa.table(
        {
            "k": pa.array([1, 2, 3], pa.int64()),
            "d": pa.array(["a", "b", "a"]).dictionary_encode(),
            "ls": pa.array(["x", "y", "z"], pa.large_string()),
            "lb": pa.array([b"p", b"q", b"r"], pa.large_binary()),
            "di": pa.array([10, 20, 10], pa.int64()).dictionary_encode(),
            "ll": pa.array([[1], [2, 3], []], pa.large_list(pa.int64())),
            "h": pa.array(np.array([0.5, 1.5, -2.0], dtype=np.float16), pa.float16()),
            "hv": pa.FixedSizeListArray.from_arrays(
                pa.array(np.arange(6, dtype=np.float16), pa.float16()), 2
            ),
            "fsl": pa.FixedSizeListArray.from_arrays(
                pa.array([1.0, 2.0, 3.0, 4.0, 5.0, 6.0], pa.float32()), 2
            ),
            "bf": bf,
        }
    )
    norm = normalize_arrow_table(table)
    assert norm.schema.field("d").type == pa.string()
    assert norm.schema.field("bf").type == pa.float32()

    ds = ls.write_dataset(table, tmp_uri)
    got = ds.to_df(spark).orderBy("k").collect()
    assert [r["d"] for r in got] == ["a", "b", "a"]
    assert [r["ls"] for r in got] == ["x", "y", "z"]
    assert [bytes(r["lb"]) for r in got] == [b"p", b"q", b"r"]
    assert [r["di"] for r in got] == [10, 20, 10]
    assert [r["ll"] for r in got] == [[1], [2, 3], []]
    # f16 → f32 widening (the reference's _cast_list_f16 seam, reversed)
    assert norm.schema.field("h").type == pa.float32()
    assert norm.schema.field("hv").type == pa.list_(pa.float32())
    assert [r["h"] for r in got] == [0.5, 1.5, -2.0]
    assert got[1]["hv"] == [2.0, 3.0]
    assert got[0]["fsl"] == [1.0, 2.0]
    assert got[0]["bf"] == 1.5 and got[1]["bf"] == -2.0
    import math

    assert got[2]["bf"] is None or math.isnan(got[2]["bf"])


def test_cleanup_protects_branch_heads(spark, sf_dir, tmp_uri):
    """A branch-referenced version must survive GC exactly like a tagged one."""
    ds = ls.write_dataset(spark.read.parquet(f"{sf_dir}/region.parquet"), tmp_uri)
    ds.create_branch("exp")  # branch at v1
    ds = ls.write_dataset(spark.read.parquet(f"{sf_dir}/region.parquet"), tmp_uri, mode="overwrite")
    ds = ls.write_dataset(spark.read.parquet(f"{sf_dir}/region.parquet"), tmp_uri, mode="overwrite")
    ds.cleanup_old_versions(older_than_seconds=0.0)
    assert 1 in mf.list_versions(tmp_uri)  # branch head retained
    assert ds.checkout_branch("exp").to_df(spark).count() == 5
    # and without ref protection it goes away
    ds.delete_branch("exp")
    ds.cleanup_old_versions(older_than_seconds=0.0)
    assert mf.list_versions(tmp_uri) == [3]


class TestFileApiReviewR11:
    """Pins for the r11 adversarial review of file.py."""

    def test_metadata_size_is_file_size(self, tmp_path):
        import os

        import pyarrow as pa

        from lance_spark.file import LanceFileReader, LanceFileWriter

        p = str(tmp_path / "f1.parquet")
        with LanceFileWriter(p) as w:
            w.write_batch(pa.table({"a": list(range(1000))}))
        md = LanceFileReader(p).metadata()
        assert md.size_bytes == os.path.getsize(p)
        assert md.size_bytes > 1000

    def test_empty_results_keep_projection(self, tmp_path):
        import pyarrow as pa

        from lance_spark.file import LanceFileReader, LanceFileWriter

        p = str(tmp_path / "f2.parquet")
        with LanceFileWriter(p) as w:
            w.write_batch(pa.table({"a": [1, 2, 3], "b": ["x", "y", "z"]}))
        r = LanceFileReader(p, columns=["b"])
        assert r.take_rows([]).to_table().column_names == ["b"]
        import pytest

        with pytest.raises(IndexError):
            r.read_range(10, 5)
        with pytest.raises(IndexError):
            r.read_range(1, 100)
        with pytest.raises(IndexError):
            r.take_rows([-2, 1])

    def test_writer_guards(self, tmp_path):
        import os

        import pyarrow as pa
        import pytest

        from lance_spark.file import LanceFileWriter

        p = str(tmp_path / "f3.parquet")
        with pytest.raises(TypeError, match="unknown"):
            LanceFileWriter(p, compression="zstd")
        w = LanceFileWriter(p)
        w.add_global_buffer(b"abc")
        with pytest.raises(RuntimeError, match="no schema"):
            w.close()  # silently dropping the buffer would lie to the caller
        w2 = LanceFileWriter(p)
        w2.write_batch(pa.table({"a": [1]}))
        w2.close()
        with pytest.raises(RuntimeError, match="closed"):
            w2.write_batch(pa.table({"a": [2]}))
        # mismatched first batch leaves NO file behind
        p4 = str(tmp_path / "f4.parquet")
        w3 = LanceFileWriter(p4, schema=pa.schema([("x", pa.int64())]))
        with pytest.raises(ValueError):
            w3.write_batch(pa.table({"a": [1]}))
        assert not os.path.exists(p4)
        with pytest.raises(ValueError, match="reserved"):
            w3.add_schema_metadata("lance_spark:global_buffer:1", "v")

    def test_metadata_rewrite_preserves_row_groups(self, tmp_path):
        import pyarrow as pa

        from lance_spark.file import LanceFileReader, LanceFileWriter

        p = str(tmp_path / "f5.parquet")
        with LanceFileWriter(p) as w:
            for i in range(3):
                w.write_batch(pa.table({"a": [i] * 10}))
            w.add_schema_metadata("k", "v")
            w.add_global_buffer(b"payload")
        r = LanceFileReader(p)
        assert r.metadata().num_row_groups == 3  # rewrite kept the groups
        assert r.read_global_buffer(1) == b"payload"
        assert r.metadata().schema.metadata[b"k"] == b"v"
        assert r.read_range(10, 10).to_table().column("a").to_pylist() == [1] * 10

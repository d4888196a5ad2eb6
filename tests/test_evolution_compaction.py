"""Schema evolution on post-compaction datasets (rowid_address_style=False).

Pins the round-11 fixes: add_columns/merge/alter-cast derive owning
fragments via mutation._rowid_fragment_map instead of shiftright(_rowid)
once compaction has decoupled rowids from fragment ids; merge deduplicates
duplicate right keys (reference hash_joiner.rs:90 last-wins contract); and
_rowaddr reports the TRUE current fragment<<32|offset, never the stale
pre-compaction identity.
"""

import pytest
from pyspark.sql import functions as F

from lance_spark.write import FRAGID_SHIFT


@pytest.fixture()
def compacted(spark, sf_dir, tmp_path):
    """A dataset whose rowids no longer encode the owning fragment."""
    from lance_spark.dataset import dataset
    from lance_spark.write import write_dataset

    uri = str(tmp_path / "ev")
    write_dataset(
        spark.read.parquet(f"{sf_dir}/orders.parquet")
        .limit(2000)
        .repartition(6),
        uri,
        mode="create",
    )
    ds = dataset(uri)
    ds = ds.delete(spark, "o_orderkey % 7 = 0")
    ds = ds.compact_files(spark, target_rows_per_fragment=1_000_000)
    assert not ds._rowid_addressable()
    # rowids genuinely disagree with live fragment ids post-compaction
    live = {f.id for f in ds.manifest.fragments}
    sample_fid = (
        ds.to_df(spark, with_row_id=True)
        .select(F.shiftright("_rowid", FRAGID_SHIFT).alias("fid"))
        .distinct()
        .collect()
    )
    assert any(r.fid not in live for r in sample_fid)
    return ds


def test_add_columns_after_compaction(spark, compacted):
    ds = compacted.add_columns(spark, {"discounted": "o_totalprice * 0.9"})
    df = ds.to_df(spark)
    assert "discounted" in df.columns
    n = df.count()
    assert n == compacted.count_rows()
    bad = df.filter(
        F.abs(F.col("discounted") - F.col("o_totalprice") * 0.9) > 1e-6
    ).count()
    assert bad == 0


def test_merge_after_compaction(spark, compacted):
    right = (
        compacted.to_df(spark)
        .select("o_orderkey", (F.col("o_totalprice") * 2).alias("doubled"))
    )
    ds = compacted.merge(spark, right, "o_orderkey")
    df = ds.to_df(spark)
    assert df.count() == compacted.count_rows()
    assert df.filter(F.col("doubled").isNull()).count() == 0


def test_alter_cast_after_compaction(spark, compacted):
    ds = compacted.alter_columns(
        {"path": "o_custkey", "data_type": "int"}, spark=spark
    )
    df = ds.to_df(spark)
    assert dict(df.dtypes)["o_custkey"] == "int"
    assert df.count() == compacted.count_rows()


def test_batch_udf_checkpoint_resume_after_compaction(spark, compacted, tmp_path):
    """The resume filter must prune by TRUE fragment id, not shiftright."""
    from lance_spark.udf import BatchUDF
    from pyspark.sql.types import DoubleType, StructField, StructType

    ckpt = str(tmp_path / "ckpt")

    def fn(pdf):
        import pandas as pd

        return pd.DataFrame({"tripled": pdf["o_totalprice"] * 3})

    udf = BatchUDF(
        fn,
        output_schema=StructType([StructField("tripled", DoubleType())]),
        checkpoint_file=ckpt,
    )
    # pre-populate one finished fragment marker, then run: the finished
    # fragment must be skipped by the scan filter yet appear in the commit
    from lance_spark.udf import FragmentCheckpoint

    fc = FragmentCheckpoint(ckpt)
    first = compacted.manifest.fragments[0]
    # write a real column-group file for the "already done" fragment so the
    # committed manifest references existing bytes
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    rel = "data/frag-%d-cg-resume.parquet" % first.id
    rowids = [
        r["_rowid"]
        for r in compacted.scanner(
            spark, columns=[], fragments=[first.id], with_row_id=True
        ).collect()
    ]
    vals = [
        r["o_totalprice"] * 3
        for r in compacted.scanner(
            spark, columns=["o_totalprice"], fragments=[first.id], with_row_id=True
        ).collect()
    ]
    pq.write_table(
        pa.table({"_rowid": sorted(rowids), "tripled": [v for _, v in sorted(zip(rowids, vals))]}),
        os.path.join(compacted.uri, rel),
    )
    fc.put(first.id, rel, len(rowids))

    ds = compacted.add_columns(spark, udf, read_columns=["o_totalprice"])
    df = ds.to_df(spark)
    assert df.count() == compacted.count_rows()
    bad = df.filter(
        F.abs(F.col("tripled") - F.col("o_totalprice") * 3) > 1e-6
    ).count()
    assert bad == 0


def test_merge_duplicate_right_keys_last_wins(spark, sf_dir, tmp_path):
    """Reference HashJoiner: duplicate right keys never fan out the table;
    the LAST occurrence wins (hash_joiner.rs:90)."""
    from lance_spark.dataset import dataset
    from lance_spark.write import write_dataset

    uri = str(tmp_path / "dup")
    write_dataset(
        spark.createDataFrame([(i, i * 10) for i in range(10)], "k int, v int"),
        uri,
        mode="create",
    )
    ds = dataset(uri)
    right = spark.createDataFrame(
        [(1, "first"), (1, "second"), (5, "only")], "k int, tag string"
    ).coalesce(1)
    ds2 = ds.merge(spark, right, "k")
    df = ds2.to_df(spark)
    assert df.count() == 10  # no fan-out
    rows = {r.k: r.tag for r in df.select("k", "tag").collect()}
    assert rows[5] == "only"
    assert rows[1] == "second"  # last insert wins
    assert rows[2] is None


def test_rowaddr_true_addresses_after_compaction(spark, compacted):
    """_rowaddr must land in LIVE fragments with in-range offsets."""
    rows = (
        compacted.scanner(spark, with_row_id=True, with_row_address=True)
        .select("_rowid", "_rowaddr")
        .collect()
    )
    live = {f.id: f.physical_rows for f in compacted.manifest.fragments}
    assert rows
    seen = set()
    for r in rows:
        fid = r["_rowaddr"] >> FRAGID_SHIFT
        off = r["_rowaddr"] & ((1 << FRAGID_SHIFT) - 1)
        assert fid in live
        assert 0 <= off < live[fid]
        assert r["_rowaddr"] not in seen  # addresses are unique
        seen.add(r["_rowaddr"])


def test_rowaddr_identity_before_compaction(spark, sf_dir, tmp_path):
    from lance_spark.dataset import dataset
    from lance_spark.write import write_dataset

    uri = str(tmp_path / "pre")
    write_dataset(
        spark.read.parquet(f"{sf_dir}/orders.parquet").limit(500), uri, mode="create"
    )
    ds = dataset(uri)
    rows = (
        ds.scanner(spark, with_row_id=True, with_row_address=True)
        .select("_rowid", "_rowaddr")
        .collect()
    )
    assert all(r["_rowid"] == r["_rowaddr"] for r in rows)


class TestRenameClusterR12:
    """Pins for the r12 adversarial review of evolution.py + maintenance.py:
    the column_renames physical-name invariant across every mutating path."""

    def _ds(self, spark, tmp_path, name="rn"):
        import lance_spark as ls

        uri = str(tmp_path / name)
        return ls.write_dataset(
            spark.createDataFrame([(i, i * 10) for i in range(20)], "id long, a long"),
            uri,
        )

    def test_compaction_preserves_renamed_columns(self, spark, tmp_path):
        import lance_spark as ls
        from lance_spark.dataset import dataset

        uri = str(tmp_path / "rc")
        ls.write_dataset(
            spark.createDataFrame([(i, i * 10) for i in range(10)], "id long, a long")
            .repartition(3), uri,
        )
        ds = dataset(uri).alter_columns({"path": "a", "rename": "b"})
        ds = ds.compact_files(spark, target_rows_per_fragment=100)
        rows = sorted((r["id"], r["b"]) for r in ds.to_df(spark).collect())
        assert rows == [(i, i * 10) for i in range(10)]

    def test_second_rename_resolves_physical(self, spark, tmp_path):
        ds = self._ds(spark, tmp_path)
        ds = ds.alter_columns({"path": "a", "rename": "b"})
        ds = ds.alter_columns({"path": "b", "rename": "c"})  # a→b→c
        rows = sorted((r["id"], r["c"]) for r in ds.to_df(spark).collect())
        assert rows == [(i, i * 10) for i in range(20)]

    def test_drop_renamed_column_purges_mapping(self, spark, tmp_path):
        ds = self._ds(spark, tmp_path)
        ds = ds.alter_columns({"path": "a", "rename": "b"})
        ds = ds.drop_columns(["b"])
        assert "b" not in ds.columns
        # re-adding the name must NOT resurrect the old physical data
        ds = ds.add_columns(ds.spark if hasattr(ds, "spark") else spark, {"b": "id * 7"})
        rows = {r["id"]: r["b"] for r in ds.to_df(spark).collect()}
        assert rows[3] == 21  # the new expression, not 30

    def test_drop_validation(self, spark, tmp_path):
        import pytest as _pytest

        ds = self._ds(spark, tmp_path)
        with _pytest.raises(ValueError, match="no such column"):
            ds.drop_columns(["typo"])
        with _pytest.raises(ValueError, match="all columns"):
            ds.drop_columns(["id", "a"])

    def test_rename_collision_rejected_and_index_follows(self, spark, tmp_path):
        import pytest as _pytest

        ds = self._ds(spark, tmp_path)
        with _pytest.raises(ValueError, match="already exists"):
            ds.alter_columns({"path": "a", "rename": "id"})
        # index column follows the rename
        ds2 = ds.create_scalar_index(spark, "a", "BTREE")
        ds2 = ds2.alter_columns({"path": "a", "rename": "b"})
        metas = [i for i in ds2.manifest.indices]
        assert any(i.column == "b" for i in metas)
        assert not any(i.column == "a" for i in metas)

    def test_update_after_rename_keeps_column_attached(self, spark, tmp_path):
        ds = self._ds(spark, tmp_path)
        ds = ds.alter_columns({"path": "a", "rename": "b"})
        ds = ds.update(spark, {"b": "b + 1"}, where="id = 3")
        rows = {r["id"]: r["b"] for r in ds.to_df(spark).collect()}
        assert rows[3] == 31 and rows[4] == 40

    def test_merge_rejects_existing_columns(self, spark, tmp_path):
        import pytest as _pytest

        ds = self._ds(spark, tmp_path)
        right = spark.createDataFrame([(1, 5)], "id long, a long")
        with _pytest.raises(ValueError, match="already exist"):
            ds.merge(spark, right, "id")

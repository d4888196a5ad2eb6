"""Version-diff / CDC reads (lance_spark.cdc.changes)."""

import pytest
from pyspark.sql import functions as F

import lance_spark as ls


@pytest.fixture()
def ds(spark, sf_dir, tmp_path):
    nation = spark.read.parquet(f"{sf_dir}/nation.parquet")
    return ls.write_dataset(nation, str(tmp_path / "ds"))


def test_changes_append(spark, sf_dir, ds):
    v1 = ds.version
    nation = spark.read.parquet(f"{sf_dir}/nation.parquet")
    ds2 = ls.write_dataset(nation.limit(7), ds.uri, mode="append")
    ch = ds2.changes(spark, v1)
    rows = ch.collect()
    assert len(rows) == 7
    assert all(r["_change_type"] == "insert" for r in rows)
    assert all(r["n_name"] is not None for r in rows)


def test_changes_delete_and_window(spark, ds):
    v1 = ds.version
    ds.delete(spark, "n_nationkey < 3")
    ds2 = ds.checkout_latest()
    ch = ds2.changes(spark, v1).collect()
    assert sorted(r["_rowid"] for r in ch) == sorted(
        r["_rowid"] for r in ds.to_df(spark, with_row_id=True)
        .filter("n_nationkey < 3").collect()
    )
    assert all(r["_change_type"] == "delete" and r["n_name"] is None for r in ch)
    # a second delete: the window (v2, v3] must show ONLY the new deletions
    v2 = ds2.version
    ds2.delete(spark, "n_nationkey = 5")
    ds3 = ds2.checkout_latest()
    ch2 = ds3.changes(spark, v2).collect()
    assert len(ch2) == 1 and ch2[0]["_change_type"] == "delete"


def test_changes_merge_is_delete_plus_insert(spark, sf_dir, ds):
    v1 = ds.version
    nation = spark.read.parquet(f"{sf_dir}/nation.parquet")
    src = nation.limit(2).withColumn("n_comment", F.lit("updated"))
    (
        ds.merge_insert("n_nationkey")
        .when_matched_update_all()
        .execute(spark, src.select(*ds.columns).withColumn("n_name", F.upper("n_name")))
    )
    ds2 = ds.checkout_latest()
    ch = ds2.changes(spark, v1)
    kinds = {r["_change_type"] for r in ch.collect()}
    assert kinds == {"insert", "delete"}
    ins = ch.filter("_change_type = 'insert'")
    assert ins.count() == 2
    assert all(r["n_name"].isupper() for r in ins.collect())


def test_changes_full_fragment_drop(spark, ds):
    v1 = ds.version
    # deleting every row of the only fragment drops it from the manifest
    ds.delete(spark, "true")
    ds2 = ds.checkout_latest()
    ch = ds2.changes(spark, v1)
    assert ch.count() == 25
    assert ch.filter("_change_type = 'delete'").count() == 25


def test_changes_empty_window(spark, ds):
    ch = ds.changes(spark, ds.version, ds.version)
    assert ch.count() == 0
    ds2 = ds.update_config({"k": "v"})  # version++ with no data change
    assert ds2.changes(spark, ds.version).count() == 0
    with pytest.raises(ValueError):
        ds2.changes(spark, ds2.version, ds2.version - 1)


def test_changes_matches_snapshot_diff_random(spark, sf_dir, tmp_path):
    """Randomized mutation sequence: changes(vi, vj) must equal the rowid
    diff of the two snapshots for every adjacent version pair."""
    import random

    rng = random.Random(11)
    nation = spark.read.parquet(f"{sf_dir}/nation.parquet")
    uri = str(tmp_path / "rand")
    ds = ls.write_dataset(nation.repartition(2), uri)

    def live_rowids(version):
        d = ls.dataset(uri, version=version)
        return {r["_rowid"] for r in d.to_df(spark, with_row_id=True).select("_rowid").collect()}

    versions = [ds.version]
    for _step in range(4):
        op = rng.choice(["append", "delete", "delete"])
        if op == "append":
            ls.write_dataset(nation.limit(rng.randint(1, 5)), uri, mode="append")
        else:
            k = rng.randint(0, 24)
            ls.dataset(uri).delete(spark, f"n_nationkey = {k}")
        versions.append(ls.dataset(uri).version)

    for v0, v1 in zip(versions, versions[1:]):
        ch = ls.dataset(uri).changes(spark, v0, v1).collect()
        got_ins = {r["_rowid"] for r in ch if r["_change_type"] == "insert"}
        got_del = {r["_rowid"] for r in ch if r["_change_type"] == "delete"}
        old, new = live_rowids(v0), live_rowids(v1)
        assert got_ins == new - old, f"inserts wrong for {v0}->{v1}"
        assert got_del == old - new, f"deletes wrong for {v0}->{v1}"


def test_changes_compaction_reports_nothing(spark, sf_dir, tmp_path):
    """Review regression: compaction moves rows to new fragments with
    PRESERVED rowids — a pure-compaction window must report zero changes."""
    nation = spark.read.parquet(f"{sf_dir}/nation.parquet")
    ds = ls.write_dataset(nation.repartition(4), str(tmp_path / "cp"))
    ds.delete(spark, "n_nationkey = 0")
    ds = ds.checkout_latest()
    v_before = ds.version
    ds = ds.compact_files(spark, target_rows_per_fragment=1000)
    assert len(ds.get_fragments()) < 4
    ch = ds.changes(spark, v_before)
    assert ch.count() == 0


class TestCdcReviewR11:
    """Pins for the r11 adversarial review of cdc.py."""

    def test_restore_resurrections_surface_as_updates(self, spark, sf_dir, tmp_path):
        import lance_spark as ls

        uri = str(tmp_path / "cdc_r")
        ds = ls.write_dataset(
            spark.read.parquet(f"{sf_dir}/region.parquet"), uri, mode="create"
        )
        ds = ds.delete(spark, "r_regionkey = 2")  # v2
        v2 = ds.version
        ds = ds.checkout_version(1).restore()  # v3: row 2 is live again
        ch = ds.changes(spark, v2).collect()
        kinds = {(r["_change_type"], r["r_regionkey"]) for r in ch}
        assert ("update", 2) in kinds  # resurrected row, values populated
        assert not any(k == "delete" for k, _ in kinds)
        row = next(r for r in ch if r["_change_type"] == "update")
        assert row["r_name"] is not None

    def test_data_replacement_surfaces_as_update(self, spark, sf_dir, tmp_path):
        import lance_spark as ls
        from lance_spark import manifest as mf
        from lance_spark.operation import LanceOperation, commit

        DataReplacementGroup = LanceOperation.DataReplacementGroup

        uri = str(tmp_path / "cdc_dr")
        docs = spark.createDataFrame([(i, i * 10) for i in range(5)], "id long, v long")
        ds = ls.write_dataset(docs.coalesce(1), uri, mode="create")
        v1 = ds.version
        frag = ds.manifest.fragments[0]
        # write a replacement file with doubled values, same rowids
        import pyarrow.parquet as pq

        old = pq.read_table(f"{uri}/{frag.files[0].path}")
        import os as _os

        import pyarrow as pa

        new_rel = "data/frag-%d-repl.parquet" % frag.id
        tbl = old.set_column(
            old.schema.get_field_index("v"),
            "v",
            pa.array([x.as_py() * 2 for x in old.column("v")]),
        )
        pq.write_table(tbl, _os.path.join(uri, new_rel))
        ds2 = commit(
            uri,
            LanceOperation.DataReplacement(
                replacements=[
                    DataReplacementGroup(
                        fragment_id=frag.id,
                        new_file=mf.DataFile(path=new_rel, columns=frag.files[0].columns),
                    )
                ]
            ),
        )
        ch = ds2.changes(spark, v1).collect()
        ups = {r["id"]: r["v"] for r in ch if r["_change_type"] == "update"}
        assert ups == {i: i * 20 for i in range(5)}  # NEW values surface

    def test_add_columns_not_reported_as_replacement(self, spark, sf_dir, tmp_path):
        import lance_spark as ls

        uri = str(tmp_path / "cdc_ac")
        ds = ls.write_dataset(
            spark.read.parquet(f"{sf_dir}/region.parquet"), uri, mode="create"
        )
        v1 = ds.version
        ds = ds.add_columns(spark, {"double_key": "r_regionkey * 2"})
        # an appended column group replaces nothing: no phantom updates
        assert ds.changes(spark, v1).count() == 0

    def test_resurrection_plus_replacement_dedup(self, spark, tmp_path):
        """A fragment whose deletion sidecar shrank AND whose data file was
        replaced across the same version span emits each resurrected row
        ONCE (with the replacement's values), not twice (r12 ADVICE fix)."""
        import os as _os

        import pyarrow as pa
        import pyarrow.parquet as pq

        import lance_spark as ls
        from lance_spark import manifest as mf
        from lance_spark.operation import LanceOperation, commit

        uri = str(tmp_path / "cdc_rr")
        docs = spark.createDataFrame([(i, i * 10) for i in range(5)], "id long, v long")
        ds = ls.write_dataset(docs.coalesce(1), uri, mode="create")
        ds = ds.delete(spark, "id = 2")  # v2: sidecar appears
        v2 = ds.version
        ds = ds.checkout_version(1).restore()  # v3: sidecar gone, row 2 live
        frag = ds.manifest.fragments[0]
        old = pq.read_table(f"{uri}/{frag.files[0].path}")
        new_rel = "data/frag-%d-rr.parquet" % frag.id
        tbl = old.set_column(
            old.schema.get_field_index("v"), "v",
            pa.array([x.as_py() * 2 for x in old.column("v")]),
        )
        pq.write_table(tbl, _os.path.join(uri, new_rel))
        ds2 = commit(
            uri,
            LanceOperation.DataReplacement(
                replacements=[
                    LanceOperation.DataReplacementGroup(
                        fragment_id=frag.id,
                        new_file=mf.DataFile(path=new_rel, columns=frag.files[0].columns),
                    )
                ]
            ),
        )  # v4: same span as the resurrection
        ch = ds2.changes(spark, v2).collect()
        ups = [r for r in ch if r["_change_type"] == "update"]
        ids = [r["id"] for r in ups]
        assert len(ids) == len(set(ids)), f"duplicate update rows: {sorted(ids)}"
        assert {r["id"]: r["v"] for r in ups}[2] == 40  # replacement values win

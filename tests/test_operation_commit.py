"""Typed LanceOperation commits (reference dataset.py:3710-4100 +
LanceDataset.commit): external writers describe changes as operation
objects; commit applies them through the optimistic manifest loop."""

import pytest
from pyspark.sql import functions as F

import lance_spark as ls
from lance_spark import LanceOperation as Op
from lance_spark import manifest as mf
from lance_spark.write import write_fragments


@pytest.fixture()
def ds_and_df(spark, sf_dir, tmp_path):
    uri = str(tmp_path / "ds")
    nation = spark.read.parquet(f"{sf_dir}/nation.parquet")
    return ls.write_dataset(nation, uri), nation


def test_commit_append(spark, ds_and_df):
    ds, nation = ds_and_df
    n0 = ds.count_rows()
    base = mf.reserve_fragment_ids(ds.uri, 4)
    frags = write_fragments(nation.limit(7).repartition(1), ds.uri, base)
    ds2 = ls.commit(ds.uri, Op.Append(fragments=frags),
                    properties={"writer": "external"})
    assert ds2.count_rows() == n0 + 7
    tx = ds2.read_transaction(ds2.version)
    assert tx["operation"] == "append"
    assert tx["transaction_properties"]["writer"] == "external"


def test_commit_overwrite(spark, ds_and_df, tmp_path):
    ds, nation = ds_and_df
    small = nation.limit(3).select("n_nationkey", "n_name")
    base = mf.reserve_fragment_ids(ds.uri, 2)
    frags = write_fragments(small.repartition(1), ds.uri, base)
    ds2 = ls.commit(ds.uri, Op.Overwrite(new_schema=small.schema, fragments=frags))
    assert ds2.count_rows() == 3
    assert ds2.columns == ["n_nationkey", "n_name"]
    # previous version still readable (time travel)
    assert ds.checkout_version(1).count_rows() == 25


def test_commit_overwrite_resets_column_renames(spark, ds_and_df):
    """r13 review: Overwrite carried forward column_renames keyed to the
    REPLACED dataset's physical names, detaching the new files' columns
    on read (scans translate logical->physical through that map)."""
    ds, nation = ds_and_df
    # physical 'n_name' renamed to logical 'label' → config.column_renames
    ds = ds.alter_columns({"path": "n_name", "rename": "label"}, spark=spark)
    assert "label" in ds.columns
    # external overwrite whose NEW files store a column literally named
    # 'label' — the stale renames map must not redirect it
    new = nation.limit(5).select(
        F.col("n_nationkey"), F.col("n_name").alias("label")
    )
    base = mf.reserve_fragment_ids(ds.uri, 2)
    frags = write_fragments(new.repartition(1), ds.uri, base)
    ds2 = ls.commit(ds.uri, Op.Overwrite(new_schema=new.schema, fragments=frags))
    got = ds2.to_df(spark)
    assert got.count() == 5
    assert set(got.columns) == {"n_nationkey", "label"}
    assert got.filter(F.col("label").isNotNull()).count() == 5
    assert ds2.manifest.config.get("column_renames", {}) in ({}, None)


def test_commit_against_missing_dataset_raises(tmp_path):
    """r13 review: base-existence guard is a ValueError, not a stripped
    assert surfacing as AttributeError deep in the builder."""
    with pytest.raises((ValueError, FileNotFoundError)):
        ls.commit(str(tmp_path / "nope"), Op.Append(fragments=[]))


def test_commit_delete_drops_fragments(spark, ds_and_df):
    ds, nation = ds_and_df
    victim = ds.get_fragments()[0]
    ds2 = ls.commit(
        ds.uri,
        Op.Delete(updated_fragments=[], deleted_fragment_ids=[victim.id],
                  predicate="true"),
    )
    assert ds2.count_rows() == ds.count_rows() - victim.num_rows
    assert all(f.id != victim.id for f in ds2.get_fragments())


def test_commit_rewrite_checks_row_counts(spark, ds_and_df):
    ds, nation = ds_and_df
    old = ds.get_fragments()
    base = mf.reserve_fragment_ids(ds.uri, 2)
    frags = write_fragments(ds.to_df(spark).repartition(1), ds.uri, base)
    ds2 = ls.commit(ds.uri, Op.Rewrite(groups=[
        Op.RewriteGroup(old_fragments=old, new_fragments=frags)
    ]))
    assert ds2.count_rows() == ds.count_rows()
    assert len(ds2.get_fragments()) == 1
    # row-count mismatch is rejected
    bad = write_fragments(ds.to_df(spark).limit(4).repartition(1), ds.uri,
                          mf.reserve_fragment_ids(ds.uri, 2))
    with pytest.raises(ValueError, match="preserve row counts"):
        ls.commit(ds.uri, Op.Rewrite(groups=[
            Op.RewriteGroup(old_fragments=ds2.checkout_latest().get_fragments(),
                            new_fragments=bad)
        ]))


def test_commit_restore(spark, ds_and_df):
    ds, nation = ds_and_df
    ds.delete(spark, "n_nationkey < 10")
    cur = ds.checkout_latest()
    assert cur.count_rows() < 25
    ds2 = ls.commit(ds.uri, Op.Restore(version=1))
    assert ds2.count_rows() == 25
    assert ds2.read_transaction(ds2.version)["operation"] == "restore"


def test_commit_project_reorders_schema(spark, ds_and_df):
    ds, nation = ds_and_df
    reordered = [f for f in reversed(ds.schema.fields)]
    from pyspark.sql.types import StructType

    ds2 = ls.commit(ds.uri, Op.Project(schema=StructType(reordered)))
    assert ds2.columns == list(reversed(ds.columns))
    assert ds2.to_df(spark).columns == ds2.columns


def test_create_empty_scalar_index(spark, sf_dir, tmp_path):
    """train=False registers an index with zero coverage; queries answer
    from the flat branch; stats report nothing indexed (reference
    test_create_empty_index.py)."""
    uri = str(tmp_path / "ei")
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    ds = ls.write_dataset(orders, uri)
    ds = ds.create_scalar_index(spark, "o_orderkey", "BTREE", train=False)
    stats = ds.index_statistics("o_orderkey_btree_idx")
    assert stats["num_indexed_rows"] == 0
    assert stats["num_unindexed_rows"] == ds.count_rows()
    # the untrained index still answers queries (flat branch + recheck)
    key = orders.first()["o_orderkey"]
    got = ds.scan_with_index(spark, f"o_orderkey = {key}")
    assert got.count() == orders.filter(F.col("o_orderkey") == key).count()
    # optimize_indices performs the deferred build
    ds = ds.optimize_indices(spark)
    stats = ds.index_statistics("o_orderkey_btree_idx")
    assert stats["num_unindexed_rows"] == 0


def test_create_empty_vector_index_rejected(spark, sf_dir, tmp_path):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").limit(50)
    ds = ls.write_dataset(emb, str(tmp_path / "ev"))
    with pytest.raises(NotImplementedError):
        ds.create_index(spark, "embedding", train=False)


def test_commit_create_index_copies_index(spark, sf_dir, tmp_path):
    """Reference test_commit_index.py flow: build an index on dataset A,
    copy its files to dataset B, register via a CreateIndex commit."""
    import shutil

    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    a = ls.write_dataset(orders, str(tmp_path / "a"))
    a = a.create_scalar_index(spark, "o_custkey", "BTREE", name="ck_idx")
    b = ls.write_dataset(orders, str(tmp_path / "b"))

    meta_a = next(i for i in a.manifest.indices if i.name == "ck_idx")
    shutil.copytree(f"{a.uri}/{meta_a.path}", f"{b.uri}/{meta_a.path}")
    new_meta = mf.IndexMeta(
        name="ck_idx", index_type=meta_a.index_type, column=meta_a.column,
        path=meta_a.path, fragment_ids=[f.id for f in b.get_fragments()],
        params=meta_a.params,
    )
    b = ls.commit(b.uri, Op.CreateIndex(new_indices=[new_meta]))
    assert [i["name"] for i in b.list_indices()] == ["ck_idx"]
    key = orders.first()["o_custkey"]
    ga = a.scan_with_index(spark, f"o_custkey = {key}").count()
    gb = b.scan_with_index(spark, f"o_custkey = {key}").count()
    assert ga == gb > 0
    # removing by name drops it
    b2 = ls.commit(b.uri, Op.CreateIndex(new_indices=[], removed_indices=["ck_idx"]))
    assert b2.list_indices() == []


def test_commit_update_config(spark, ds_and_df):
    """UpdateConfig typed op (transaction.rs:260-265): config keys, table/
    schema metadata namespaces, and field metadata through one commit."""
    ds, _ = ds_and_df
    ds2 = ls.commit(ds.uri, Op.UpdateConfig(
        config_updates=Op.UpdateMap(updates={"owner": "me", "tier": "gold"}),
        schema_metadata_updates=Op.UpdateMap(updates={"desc": "nations"}),
        table_metadata_updates=Op.UpdateMap(updates={"team": "data"}),
        field_metadata_updates={"n_name": Op.UpdateMap(updates={"pii": "no"})},
    ))
    assert ds2.config["owner"] == "me" and ds2.config["tier"] == "gold"
    assert ds2.schema_metadata()["desc"] == "nations"
    assert ds2.field_metadata("n_name")["pii"] == "no"
    tx = ds2.read_transaction(ds2.version)
    assert tx["operation"] == "update_config"
    # None deletes; replace swaps the flat config but keeps the namespaces
    ds3 = ls.commit(ds2.uri, Op.UpdateConfig(
        config_updates=Op.UpdateMap(updates={"tier": None, "env": "prod"}, replace=True),
    ))
    assert "owner" not in ds3.config and "tier" not in ds3.config
    assert ds3.config["env"] == "prod"
    assert ds3.schema_metadata()["desc"] == "nations"  # namespace survives


def test_commit_clone_shallow_and_deep(spark, ds_and_df, tmp_path):
    ds, _ = ds_and_df
    shallow = ls.commit(str(tmp_path / "shallow"),
                        Op.Clone(is_shallow=True, ref_path=ds.uri))
    assert shallow.count_rows() == ds.count_rows()
    assert shallow.config["cloned_from"]["uri"] == ds.uri
    # shallow references source files in place (absolute paths)
    import os
    assert all(os.path.isabs(f.files[0].path) for f in shallow.get_fragments())

    deep = ls.commit(str(tmp_path / "deep"),
                     Op.Clone(is_shallow=False, ref_path=ds.uri,
                              branch_name="main2"))
    assert deep.count_rows() == ds.count_rows()
    assert all(not os.path.isabs(f.files[0].path) for f in deep.get_fragments())
    assert deep.branches()["main2"] == 1
    # deep clone survives source deletion
    got = deep.to_df(spark).count()
    assert got == ds.count_rows()
    with pytest.raises(ValueError, match="already exists"):
        ls.commit(str(tmp_path / "deep"), Op.Clone(ref_path=ds.uri))


def test_commit_clone_ref_version(spark, ds_and_df, tmp_path):
    ds, nation = ds_and_df
    ds.create_tag("v1-tag", 1)
    ds2 = ds.delete(spark, "n_nationkey < 5")
    assert ds2.count_rows() < 25
    by_tag = ls.commit(str(tmp_path / "bytag"),
                       Op.Clone(ref_path=ds.uri, ref_name="v1-tag"))
    assert by_tag.count_rows() == 25
    by_ver = ls.commit(str(tmp_path / "byver"),
                       Op.Clone(ref_path=ds.uri, ref_version=1))
    assert by_ver.count_rows() == 25


def test_commit_data_replacement(spark, ds_and_df, tmp_path):
    """DataReplacement swaps a fragment's column-group file in place; row
    count is preserved and readers see the new values."""
    ds, nation = ds_and_df
    frag = ds.get_fragments()[0]
    old_file = frag.files[0]
    # write a replacement parquet with the same columns + _rowid
    from lance_spark.write import ROWID_COL
    import os

    repl_rel = "data/replacement-0.parquet"
    rows = (
        ds.to_df(spark, with_row_id=True)
        .filter(F.col(ROWID_COL).between(frag.id << 32, ((frag.id + 1) << 32) - 1))
        .withColumn("n_name", F.upper("n_name"))
        .select(*[c for c in [ROWID_COL] + list(old_file.columns)])
    )
    os.makedirs(f"{ds.uri}/data", exist_ok=True)
    rows.coalesce(1).write.mode("overwrite").parquet(f"{ds.uri}/__tmp_repl")
    part = next(p for p in os.listdir(f"{ds.uri}/__tmp_repl") if p.endswith(".parquet"))
    os.replace(f"{ds.uri}/__tmp_repl/{part}", f"{ds.uri}/{repl_rel}")

    ds2 = ls.commit(ds.uri, Op.DataReplacement(replacements=[
        Op.DataReplacementGroup(fragment_id=frag.id,
                                new_file=mf.DataFile(repl_rel, list(old_file.columns))),
    ]))
    assert ds2.count_rows() == ds.count_rows()
    names = [r["n_name"] for r in ds2.to_df(spark).collect()]
    assert names and all(n == n.upper() for n in names)
    with pytest.raises(ValueError, match="no fragment"):
        ls.commit(ds.uri, Op.DataReplacement(replacements=[
            Op.DataReplacementGroup(fragment_id=999,
                                    new_file=mf.DataFile(repl_rel, list(old_file.columns))),
        ]))


def test_commit_update_bases(spark, ds_and_df, tmp_path):
    ds, _ = ds_and_df
    base_dir = str(tmp_path / "cold_base")
    ds2 = ls.commit(ds.uri, Op.UpdateBases(new_bases=[
        mf.DatasetBasePath(path=base_dir, name="cold"),
    ]))
    assert any(b["name"] == "cold" for b in ds2.manifest.bases)
    assert ds2.read_transaction(ds2.version)["operation"] == "update_bases"
    with pytest.raises(ValueError, match="duplicate"):
        ls.commit(ds.uri, Op.UpdateBases(new_bases=[
            mf.DatasetBasePath(path=base_dir, name="cold"),
        ]))


def test_deep_clone_basename_collision_and_bases_reset(tmp_path):
    """ADVICE r5: two source files with equal basenames from different
    directories must land as distinct deep-cloned files (not silently map
    onto one file's bytes), and the deep clone must not carry the source's
    bases registry — all its files live under dest."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from lance_spark.operation import _deep_copy_clone

    d1, d2 = tmp_path / "rootA", tmp_path / "rootB"
    d1.mkdir(), d2.mkdir()
    pq.write_table(pa.table({"x": [1]}), str(d1 / "part.parquet"))
    pq.write_table(pa.table({"x": [2]}), str(d2 / "part.parquet"))
    m = mf.Manifest(
        version=1,
        schema_json={"type": "struct", "fields": [
            {"name": "x", "type": "long", "nullable": True, "metadata": {}}]},
        fragments=[
            mf.Fragment(0, [mf.DataFile(str(d1 / "part.parquet"), ["x"])], 1),
            mf.Fragment(1, [mf.DataFile(str(d2 / "part.parquet"), ["x"])], 1),
        ],
        max_fragment_id=1,
        operation="clone",
        bases=[{"name": "b", "path": str(d2), "is_dataset_root": False}],
    )
    dest = tmp_path / "deep"
    dest.mkdir()
    out = _deep_copy_clone(m, str(dest))
    p0, p1 = out.fragments[0].files[0].path, out.fragments[1].files[0].path
    assert p0 != p1
    assert pq.read_table(str(dest / p0)).column("x").to_pylist() == [1]
    assert pq.read_table(str(dest / p1)).column("x").to_pylist() == [2]
    assert out.bases == []

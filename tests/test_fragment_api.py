"""LanceFragment handle: fragment-scoped reads and deletes
(reference python/python/lance/fragment.py:252-851)."""

import pytest
from pyspark.sql import functions as F

from lance_spark.fragment import LanceFragment
from lance_spark.write import FRAGID_SHIFT


@pytest.fixture()
def ds(spark, sf_dir, tmp_path):
    from lance_spark.dataset import dataset
    from lance_spark.write import write_dataset

    uri = str(tmp_path / "frags")
    write_dataset(
        spark.read.parquet(f"{sf_dir}/nation.parquet").repartition(2), uri, mode="create"
    )
    return dataset(uri)


def test_fragment_reads_only_its_rows(spark, ds):
    frags = [LanceFragment(ds, f.id) for f in ds.manifest.fragments]
    assert len(frags) == 2
    total = sum(f.count_rows() for f in frags)
    assert total == 25
    t0 = frags[0].to_table(spark, columns=["n_nationkey"])
    t1 = frags[1].to_table(spark, columns=["n_nationkey"])
    keys0 = set(t0["n_nationkey"].to_pylist())
    keys1 = set(t1["n_nationkey"].to_pylist())
    assert keys0.isdisjoint(keys1) and len(keys0 | keys1) == 25
    assert frags[0].head(spark, 3).num_rows == 3
    assert repr(frags[0]).startswith("LanceFragment(id=")


def test_fragment_take_by_position(spark, ds):
    frag = LanceFragment(ds, ds.manifest.fragments[1].id)
    got = frag.take(spark, [0, 2], columns=["n_nationkey"]).collect()
    rowids = {r["_rowid"] for r in got}
    base = frag.id << FRAGID_SHIFT
    assert rowids == {base, base + 2}


def test_fragment_scoped_delete(spark, ds):
    f0, f1 = (f.id for f in ds.manifest.fragments)
    frag0 = LanceFragment(ds, f0)
    before1 = LanceFragment(ds, f1).count_rows()
    # predicate matches rows in BOTH fragments; only fragment 0's rows go
    # (a fully-emptied fragment is dropped from the manifest entirely)
    ds2 = frag0.delete(spark, "n_nationkey >= 0")
    assert ds2.get_fragment(f0) is None
    assert LanceFragment(ds2, f1).count_rows() == before1
    assert ds2.count_rows() == before1


def test_fragment_filtered_count_and_missing(spark, ds):
    frag = LanceFragment(ds, ds.manifest.fragments[0].id)
    n = frag.count_rows("n_nationkey % 2 = 0", spark=spark)
    assert 0 < n < frag.count_rows()
    with pytest.raises(ValueError):
        LanceFragment(ds, 99)


def test_fragment_create_then_commit(spark, sf_dir, tmp_path):
    """The distributed-write primitive: workers write fragments without
    committing, a coordinator commits the metadata (reference
    fragment.py:304 + LanceOperation.Append)."""
    import lance_spark as ls
    from lance_spark.fragment import LanceFragment

    region = spark.read.parquet(f"{sf_dir}/region.parquet")
    uri = str(tmp_path / "ds")
    # worker 1: bootstrap fragment for a not-yet-created dataset
    f0 = LanceFragment.create(uri, region, fragment_id=0)
    ds = ls.commit(uri, ls.LanceOperation.Overwrite(
        new_schema=region.schema, fragments=[f0]))
    n = region.count()
    assert ds.count_rows() == n

    # worker 2: append via reserved id (arrow-table input path)
    f1 = LanceFragment.create(uri, region.toPandas())
    assert f1.id > 0
    ds2 = ls.commit(uri, ls.LanceOperation.Append(fragments=[f1]))
    assert ds2.count_rows() == 2 * n


def test_fragment_create_from_file(spark, ds):
    import pytest as _pt

    from lance_spark.fragment import LanceFragment

    frag = LanceFragment(ds, 0)
    path = frag.data_files()[0].path
    # re-attach under the id the file's rowids actually encode
    meta = LanceFragment.create_from_file(path, ds, fragment_id=0)
    assert meta.id == 0
    assert meta.physical_rows == frag.physical_rows
    assert set(meta.files[0].columns) == set(frag.data_files()[0].columns)
    # a DIFFERENT id would corrupt rowid-scoped ops → must refuse
    with _pt.raises(ValueError, match="rowids of fragment"):
        LanceFragment.create_from_file(path, ds, fragment_id=99)


def test_fragment_schemas(spark, ds):
    from lance_spark.fragment import LanceFragment

    f = LanceFragment(ds, 0)
    assert "n_name" in f.schema.fieldNames()
    assert "_rowid" in f.physical_schema.names
    import pytest as _pt
    with _pt.raises(NotImplementedError):
        f.partition_expression()


def test_fragment_merge_columns_distributed(spark, ds):
    """Per-fragment column computation + ONE coordinator Merge commit
    attaches the columns dataset-wide."""
    import lance_spark as ls
    from lance_spark.fragment import LanceFragment

    fids = [f.id for f in ds.manifest.fragments]
    updated, fields = [], None
    for fid in fids:
        nf, flds = LanceFragment(ds, fid).merge_columns(
            spark, {"key2": "n_nationkey * 2"}
        )
        updated.append(nf)
        fields = flds
    schema_json = {
        "type": "struct",
        "fields": list(ds.manifest.schema_json["fields"]) + fields,
    }
    ds2 = ls.commit(ds.uri, ls.LanceOperation.Merge(
        fragments=updated, schema=schema_json))
    rows = ds2.to_df(spark).select("n_nationkey", "key2").collect()
    assert rows and all(r["key2"] == 2 * r["n_nationkey"] for r in rows)


def test_fragment_create_empty_raises(spark, tmp_path):
    from lance_spark.fragment import LanceFragment

    empty = spark.createDataFrame([], "id long, v string")
    with pytest.raises(ValueError, match="empty data"):
        LanceFragment.create(str(tmp_path / "x"), empty, fragment_id=0)


def test_merge_columns_on_emptied_fragment_raises(spark, ds):
    from lance_spark.fragment import LanceFragment

    f = LanceFragment(ds, 0)
    lo, hi = f.id << 32, (f.id + 1) << 32
    ds2 = ds.delete(spark, f"_rowid >= {lo} AND _rowid < {hi}")
    f2 = LanceFragment(ds2, 0) if any(
        fr.id == 0 for fr in ds2.manifest.fragments) else None
    if f2 is None:
        pytest.skip("fragment fully dropped by delete")
    with pytest.raises(ValueError, match="no live rows"):
        f2.merge_columns(spark, {"z": "1"})


def test_fragment_merge_then_commit(spark, sf_dir, tmp_path):
    """Reference loop shape (fragment.py:551): per-fragment merge, then ONE
    LanceOperation.Merge commit with the returned LanceSchema."""
    import lance_spark as ls
    from lance_spark.fragment import LanceFragment

    nation = spark.read.parquet(f"{sf_dir}/nation.parquet")
    ds = ls.write_dataset(nation.repartition(3), str(tmp_path / "m"))
    extra = nation.select("n_nationkey", (F.col("n_nationkey") * 10).alias("score"))

    merged, schema = [], None
    for fm in ds.get_fragments():
        f, schema = LanceFragment(ds, fm.id).merge(
            spark, extra, left_on="n_nationkey"
        )
        merged.append(f)
    assert isinstance(schema, ls.LanceSchema) and "score" in schema.names
    ds2 = ls.commit(ds.uri, ls.LanceOperation.Merge(fragments=merged, schema=schema))
    got = {r["n_nationkey"]: r["score"] for r in ds2.to_df(spark).collect()}
    assert len(got) == 25 and all(got[k] == k * 10 for k in got)


def test_fragment_update_columns_data_replacement(spark, sf_dir, tmp_path):
    """update_columns rewrites only the owning column-group file; committing
    the returned fragment via Update yields the new values, misses keep old."""
    import lance_spark as ls
    from lance_spark.fragment import LanceFragment

    nation = spark.read.parquet(f"{sf_dir}/nation.parquet")
    ds = ls.write_dataset(nation.repartition(2), str(tmp_path / "u"))
    frag_meta = ds.get_fragments()[0]
    frag = LanceFragment(ds, frag_meta.id)
    keys = [r["n_nationkey"] for r in frag.scanner(spark).limit(3).collect()]
    updates = spark.createDataFrame(
        [(k, f"UPDATED_{k}") for k in keys], "n_nationkey long, n_name string"
    )
    new_frag, field_ids = frag.update_columns(spark, updates, left_on="n_nationkey")
    assert field_ids == [ds.columns.index("n_name")]
    ds2 = ls.commit(ds.uri, ls.LanceOperation.Update(updated_fragments=[new_frag]))
    got = {r["n_nationkey"]: r["n_name"] for r in ds2.to_df(spark).collect()}
    assert all(got[k] == f"UPDATED_{k}" for k in keys)
    assert len(got) == 25  # unmatched rows kept their values
    untouched = [k for k in got if k not in keys]
    orig = {r["n_nationkey"]: r["n_name"] for r in nation.collect()}
    assert all(got[k] == orig[k] for k in untouched)


def test_fragment_update_columns_rejects_unknown(spark, sf_dir, tmp_path):
    import lance_spark as ls
    from lance_spark.fragment import LanceFragment

    ds = ls.write_dataset(
        spark.read.parquet(f"{sf_dir}/nation.parquet"), str(tmp_path / "x")
    )
    frag = LanceFragment(ds, ds.get_fragments()[0].id)
    bad = spark.createDataFrame([(1, "x")], "n_nationkey long, nope string")
    with pytest.raises(ValueError, match="nonexistent"):
        frag.update_columns(spark, bad, left_on="n_nationkey")


def test_fragment_open_session_take(spark, sf_dir, tmp_path):
    import lance_spark as ls
    from lance_spark.fragment import LanceFragment

    ds = ls.write_dataset(
        spark.read.parquet(f"{sf_dir}/nation.parquet").repartition(1),
        str(tmp_path / "s"),
    )
    frag = LanceFragment(ds, ds.get_fragments()[0].id)
    with frag.open_session(spark, columns=["n_name"]) as sess:
        t1 = sess.take([0, 2])
        t2 = sess.take([1])
        assert t1.num_rows == 2 and t2.num_rows == 1
        assert set(t1.column_names) == {"n_name", "_rowid"}


def test_lance_schema_roundtrip_and_project_op(spark, sf_dir, tmp_path):
    import pyarrow as pa

    import lance_spark as ls

    ds = ls.write_dataset(
        spark.read.parquet(f"{sf_dir}/nation.parquet"), str(tmp_path / "ls")
    )
    lsch = ds.lance_schema
    assert isinstance(lsch, ls.LanceSchema)
    assert lsch.names == ds.columns
    # from_pyarrow / to_pyarrow round-trips
    rt = ls.LanceSchema.from_pyarrow(lsch.to_pyarrow())
    assert rt == lsch
    # usable directly in a typed Project commit
    sub = pa.schema([f for f in lsch.to_pyarrow() if f.name != "n_comment"])
    ds2 = ls.commit(ds.uri, ls.LanceOperation.Project(ls.LanceSchema.from_pyarrow(sub)))
    assert "n_comment" not in ds2.columns


def test_ffi_provider_redirects():
    import lance_spark as ls

    with pytest.raises(NotImplementedError, match="DataSource V2"):
        ls.FFILanceTableProvider()


def test_fragment_session_take_with_deletions_and_compaction(spark, sf_dir, tmp_path):
    """Review regression: positions index LIVE rows in _rowid order — not
    fragment<<32|offset arithmetic, which breaks on deletions and
    post-compaction rowids."""
    import lance_spark as ls

    nation = spark.read.parquet(f"{sf_dir}/nation.parquet")
    ds = ls.write_dataset(nation.repartition(1), str(tmp_path / "s2"))
    ds = ds.delete(spark, "n_nationkey = 0")  # physical row 0 is dead
    frag = LanceFragment(ds, ds.get_fragments()[0].id)
    with frag.open_session(spark, columns=["n_nationkey"]) as sess:
        t = sess.take([0])
        assert t.num_rows == 1
        assert t.column("n_nationkey").to_pylist() == [1]  # first LIVE row

    # post-compaction: rowids no longer encode the fragment
    ds2 = ls.write_dataset(nation.repartition(4), str(tmp_path / "s3"))
    ds2 = ds2.compact_files(spark, target_rows_per_fragment=100)
    assert not ds2._rowid_addressable()
    frag2 = LanceFragment(ds2, ds2.get_fragments()[0].id)
    with frag2.open_session(spark, columns=["n_nationkey"]) as sess:
        assert sess.take([0, 1]).num_rows == 2


class TestFragmentReviewR12:
    """Pins for the r12 adversarial review of fragment.py + hybrid.py."""

    def _compacted(self, spark, tmp_path):
        import lance_spark as ls
        from lance_spark.dataset import dataset

        uri = str(tmp_path / "cf")
        ls.write_dataset(
            spark.createDataFrame([(i, i * 10) for i in range(30)], "id long, v long")
            .repartition(4), uri,
        )
        ds = dataset(uri).compact_files(spark, target_rows_per_fragment=100)
        assert not ds._rowid_addressable()
        return ds

    def test_fragment_delete_post_compaction(self, spark, tmp_path):
        from lance_spark.fragment import LanceFragment

        ds = self._compacted(spark, tmp_path)
        frag = ds.manifest.fragments[0]
        before = ds.count_rows()
        ds2 = LanceFragment(ds, frag.id).delete(spark, "v >= 0")  # all of frag
        # the delete actually removed THIS fragment's rows (no silent no-op)
        assert ds2.count_rows() == before - frag.num_rows

    def test_fragment_take_post_compaction(self, spark, tmp_path):
        from lance_spark.fragment import LanceFragment

        ds = self._compacted(spark, tmp_path)
        frag = ds.manifest.fragments[0]
        t = LanceFragment(ds, frag.id).take(spark, [0, 1], columns=["id"])
        assert t.num_rows == 2  # not an empty table

    def test_update_columns_duplicate_right_keys(self, spark, tmp_path):
        import lance_spark as ls
        from lance_spark.fragment import LanceFragment

        uri = str(tmp_path / "uc")
        ds = ls.write_dataset(
            spark.createDataFrame([(1, 10), (2, 20)], "id long, v long"), uri
        )
        frag = ds.manifest.fragments[0]
        right = spark.createDataFrame([(1, 111), (1, 999)], "id long, v long")
        new_frag, _ = LanceFragment(ds, frag.id).update_columns(
            spark, right, left_on="id"
        )
        # the rewrite kept exactly physical_rows rows (no join fan-out)
        import pyarrow.parquet as pq

        t = pq.read_table(ds._abs(new_frag.files[0].path))
        assert t.num_rows == frag.physical_rows

    def test_update_columns_after_rename(self, spark, tmp_path):
        import lance_spark as ls
        from lance_spark.dataset import dataset
        from lance_spark.fragment import LanceFragment
        from lance_spark.operation import LanceOperation, commit

        uri = str(tmp_path / "ur")
        ds = ls.write_dataset(
            spark.createDataFrame([(1, 10), (2, 20)], "id long, a long"), uri
        )
        ds = ds.alter_columns({"path": "a", "rename": "b"})
        frag = ds.manifest.fragments[0]
        right = spark.createDataFrame([(1, 111)], "id long, b long")
        new_frag, _ = LanceFragment(ds, frag.id).update_columns(
            spark, right, left_on="id"
        )
        ds2 = commit(uri, LanceOperation.DataReplacement(replacements=[
            LanceOperation.DataReplacementGroup(
                fragment_id=frag.id, new_file=new_frag.files[0]
            )
        ]))
        rows = {r["id"]: r["b"] for r in ds2.to_df(spark).collect()}
        assert rows == {1: 111, 2: 20}

    def test_merge_empty_fragment_clear_error(self, spark, tmp_path):
        import lance_spark as ls
        from lance_spark.fragment import LanceFragment

        uri = str(tmp_path / "me")
        ds = ls.write_dataset(
            spark.createDataFrame([(1, 10)], "id long, v long"), uri
        )
        ds = ds.delete(spark, "id = 1")
        if ds.manifest.fragments:  # fully-deleted fragment may be dropped
            frag = ds.manifest.fragments[0]
            right = spark.createDataFrame([(1, "x")], "id long, s string")
            with pytest.raises(ValueError, match="no live rows"):
                LanceFragment(ds, frag.id).merge(spark, right, "id")

    def test_rrf_fuse_empty_rankings(self, spark):
        from lance_spark.operators.hybrid import rrf_fuse

        with pytest.raises(ValueError, match="ranking"):
            rrf_fuse([])

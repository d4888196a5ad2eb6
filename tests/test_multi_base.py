"""Multi-base datasets: fragments distributed across named storage roots
(reference python/python/tests/test_multi_base.py; DatasetBasePath +
add_bases + write target_bases)."""

import os

import pytest

import lance_spark as ls
from lance_spark import DatasetBasePath


@pytest.fixture()
def roots(tmp_path):
    primary = str(tmp_path / "primary")
    p1 = str(tmp_path / "p1")
    p2 = str(tmp_path / "p2")
    for p in (primary, p1, p2):
        os.makedirs(p, exist_ok=True)
    return primary, p1, p2


def _nation(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/nation.parquet")


def test_create_and_read_multi_base(spark, sf_dir, roots):
    primary, p1, p2 = roots
    nation = _nation(spark, sf_dir)
    ds = ls.write_dataset(
        nation.repartition(4), primary, mode="create",
        initial_bases=[DatasetBasePath(p1, name="path1"),
                       DatasetBasePath(p2, name="path2")],
        target_bases=["path2"],
    )
    assert ds.uri == os.path.abspath(primary)
    assert ds.count_rows() == 25
    got = ds.to_df(spark)
    assert got.count() == 25
    # data files live under path2, not the primary root
    for frag in ds.get_fragments():
        for f in frag.files:
            assert f.path.startswith(os.path.abspath(p2))
    assert not os.path.isdir(os.path.join(primary, "data"))
    # registry round-trips
    bp = ds.base_paths()
    assert set(bp) == {"path1", "path2"}
    assert bp["path1"].path == p1


def test_append_to_other_base_and_round_robin(spark, sf_dir, roots):
    primary, p1, p2 = roots
    nation = _nation(spark, sf_dir)
    ds = ls.write_dataset(
        nation, primary, mode="create",
        initial_bases=[DatasetBasePath(p1, name="path1"),
                       DatasetBasePath(p2, name="path2")],
        target_bases=["path1"],
    )
    ds = ls.write_dataset(nation, primary, mode="append", target_bases=["path2"])
    assert ds.count_rows() == 50
    prefixes = {f.files[0].path[: len(os.path.abspath(p1))] for f in ds.get_fragments()}
    assert os.path.abspath(p1) in prefixes and os.path.abspath(p2) in prefixes
    # round-robin across BOTH bases in one write
    ds = ls.write_dataset(
        nation.repartition(4), primary, mode="append",
        target_bases=["path1", "path2"],
    )
    newest = sorted(ds.get_fragments(), key=lambda f: f.id)[-4:]
    used = {os.path.abspath(p1): 0, os.path.abspath(p2): 0}
    for frag in newest:
        for root in used:
            if frag.files[0].path.startswith(root):
                used[root] += 1
    assert all(v == 2 for v in used.values())


def test_overwrite_inherits_bases(spark, sf_dir, roots):
    primary, p1, p2 = roots
    nation = _nation(spark, sf_dir)
    ls.write_dataset(
        nation, primary, mode="create",
        initial_bases=[DatasetBasePath(p1, name="path1")],
        target_bases=["path1"],
    )
    ds = ls.write_dataset(nation.limit(5), primary, mode="overwrite")
    assert set(ds.base_paths()) == {"path1"}
    assert ds.count_rows() == 5


def test_add_bases_and_errors(spark, sf_dir, roots):
    primary, p1, p2 = roots
    nation = _nation(spark, sf_dir)
    ds = ls.write_dataset(nation, primary, mode="create")
    ds = ds.add_bases([DatasetBasePath(p1, name="b1")],
                      transaction_properties={"why": "tiering"})
    assert set(ds.base_paths()) == {"b1"}
    tx = ds.read_transaction(ds.version)
    assert tx["transaction_properties"]["why"] == "tiering"
    with pytest.raises(ValueError, match="duplicate"):
        ds.add_bases([DatasetBasePath(p2, name="b1")])
    # unknown target base rejected at write time
    with pytest.raises(ValueError, match="unknown target base"):
        ls.write_dataset(nation, primary, mode="append", target_bases=["nope"])
    # writes may also target the base by raw path
    ds = ls.write_dataset(nation, primary, mode="append", target_bases=[p1])
    assert ds.count_rows() == 50


def test_multi_base_mutations_still_work(spark, sf_dir, roots):
    primary, p1, _p2 = roots
    nation = _nation(spark, sf_dir)
    ds = ls.write_dataset(
        nation, primary, mode="create",
        initial_bases=[DatasetBasePath(p1, name="path1")],
        target_bases=["path1"],
    )
    ds = ds.delete(spark, "n_nationkey < 5")
    assert ds.checkout_latest().count_rows() == 20
    ds.validate()


def test_mutations_and_commits_preserve_base_registry(spark, sf_dir, roots):
    """Review regression: delete/update/commit_fragments/reserve must carry
    the bases registry forward (hand-rolled manifest constructors used to
    drop it)."""
    from lance_spark import manifest as mf
    from lance_spark.write import commit_fragments, write_fragments

    primary, p1, _p2 = roots
    nation = _nation(spark, sf_dir)
    ds = ls.write_dataset(
        nation, primary, mode="create",
        initial_bases=[DatasetBasePath(p1, name="path1")],
        target_bases=["path1"],
    )
    ds = ds.delete(spark, "n_nationkey = 1").checkout_latest()
    assert set(ds.base_paths()) == {"path1"}
    ds = ds.update(spark, {"n_name": "'X'"}, where="n_nationkey = 2").checkout_latest()
    assert set(ds.base_paths()) == {"path1"}
    base_fid = mf.reserve_fragment_ids(primary, 2)
    assert set(ls.dataset(primary).base_paths()) == {"path1"}
    frags = write_fragments(nation.limit(3).repartition(1), primary, base_fid)
    commit_fragments(primary, frags, operation="append")
    ds = ls.dataset(primary)
    assert set(ds.base_paths()) == {"path1"}
    # appending by base name still resolves after all those commits
    ds = ls.write_dataset(nation.limit(2), primary, mode="append", target_bases=["path1"])
    assert set(ds.base_paths()) == {"path1"}

"""DirectoryNamespace catalog: namespaces nest, tables are datasets,
register/deregister attach external locations (reference
python/python/lance/namespace.py:62-180 surface)."""

import os

import pytest

from lance_spark.namespace import DirectoryNamespace


@pytest.fixture()
def ns(tmp_path):
    return DirectoryNamespace(str(tmp_path / "catalog"))


@pytest.fixture(scope="module")
def small_df(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/region.parquet")


def test_namespace_lifecycle(ns):
    assert ns.list_namespaces() == []
    ns.create_namespace("a", {"owner": "t"})
    ns.create_namespace(["a", "b"])
    assert ns.list_namespaces() == ["a"]
    assert ns.list_namespaces("a") == ["b"]
    assert ns.describe_namespace("a")["properties"] == {"owner": "t"}
    assert ns.namespace_exists(["a", "b"]) and not ns.namespace_exists("zz")
    with pytest.raises(ValueError):
        ns.create_namespace("a")  # duplicate
    with pytest.raises(ValueError):
        ns.create_namespace(["missing", "child"])  # parent must exist
    with pytest.raises(ValueError):
        ns.drop_namespace("a")  # RESTRICT: has child
    ns.drop_namespace(["a", "b"])
    ns.drop_namespace("a")
    assert ns.list_namespaces() == []


def test_table_create_open_describe_drop(ns, small_df):
    ns.create_namespace("prod")
    ds = ns.create_table(["prod", "region"], small_df)
    assert ns.list_tables("prod") == ["region"]
    assert ns.table_exists(["prod", "region"])
    desc = ns.describe_table(["prod", "region"])
    assert desc["stats"]["num_rows"] == small_df.count()
    got = ns.open_table(["prod", "region"])
    assert got.version == ds.version
    ns.drop_table(["prod", "region"])
    assert not ns.table_exists(["prod", "region"])
    with pytest.raises(ValueError):
        ns.describe_table(["prod", "region"])


def test_register_external_table(ns, small_df, tmp_path):
    from lance_spark.write import write_dataset

    ext = str(tmp_path / "elsewhere" / "r2")
    write_dataset(small_df, ext, mode="create")
    ns.register_table("r2", ext)
    assert ns.list_tables() == ["r2"]
    assert ns.open_table("r2").count_rows() == small_df.count()
    with pytest.raises(ValueError):
        ns.register_table("r2", ext)  # duplicate name
    # drop_table on a registered name only detaches
    ns.drop_table("r2")
    assert os.path.isdir(os.path.join(ext, "_versions"))
    assert ns.list_tables() == []
    with pytest.raises(ValueError):
        ns.deregister_table("r2")


def test_root_is_default_namespace(ns, small_df):
    ns.create_table("t0", small_df)
    assert ns.list_tables() == ["t0"]
    assert "t0" not in ns.list_namespaces()

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


class TestNamespaceReviewR11:
    """Pins for the r11 adversarial review of namespace.py."""

    def test_path_traversal_segments_rejected(self, tmp_path):
        from lance_spark.namespace import DirectoryNamespace

        ns = DirectoryNamespace(str(tmp_path / "cat"))
        for bad in ("..", ".", "a/b", "a\\b"):
            with pytest.raises(ValueError, match="invalid"):
                ns.create_namespace([bad])
            with pytest.raises(ValueError, match="invalid"):
                ns.drop_namespace([bad], behavior="CASCADE")

    def test_table_namespace_dual_identity_blocked(self, spark, sf_dir, tmp_path):
        from lance_spark.namespace import DirectoryNamespace

        ns = DirectoryNamespace(str(tmp_path / "cat2"))
        df = spark.read.parquet(f"{sf_dir}/region.parquet")
        ns.create_table("t0", df)
        with pytest.raises(ValueError, match="table already exists"):
            ns.create_namespace("t0")
        ns.create_namespace("prod")
        with pytest.raises(ValueError, match="namespace already exists"):
            ns.create_table("prod", df)
        with pytest.raises(ValueError, match="namespace already exists"):
            ns.register_table("prod", ns.describe_table("t0")["location"])
        # the dataset survives all three rejections
        assert ns.open_table("t0").count_rows() == 5

    def test_drop_behavior_validated(self, spark, sf_dir, tmp_path):
        from lance_spark.namespace import DirectoryNamespace

        ns = DirectoryNamespace(str(tmp_path / "cat3"))
        ns.create_namespace("prod")
        ns.create_table(["prod", "t"], spark.read.parquet(f"{sf_dir}/region.parquet"))
        with pytest.raises(ValueError, match="unknown drop behavior"):
            ns.drop_namespace("prod", behavior="RESTICT")  # typo must not cascade
        assert ns.open_table(["prod", "t"]).count_rows() == 5

    def test_provider_accepts_plain_string_and_gets_options(self, spark, sf_dir, tmp_path):
        from lance_spark.namespace import (
            DirectoryNamespace,
            LanceNamespaceStorageOptionsProvider,
        )

        ns = DirectoryNamespace(str(tmp_path / "cat4"), region="us-east")
        ns.create_table("orders", spark.read.parquet(f"{sf_dir}/region.parquet"))
        p = LanceNamespaceStorageOptionsProvider(ns, "orders")
        opts = p.fetch_storage_options()
        assert opts["region"] == "us-east"  # namespace properties flow through
        assert opts["location"].endswith("orders")

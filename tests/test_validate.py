"""ds.validate(): green on healthy datasets (including deletion sidecars
and added column groups), raises with a useful message on corruption."""

import os

import pytest


@pytest.fixture()
def ds(spark, sf_dir, tmp_path):
    from lance_spark.dataset import dataset
    from lance_spark.write import write_dataset

    uri = str(tmp_path / "v")
    write_dataset(
        spark.read.parquet(f"{sf_dir}/nation.parquet").repartition(2), uri, mode="create"
    )
    return dataset(uri)


def test_validate_healthy_lifecycle(spark, ds):
    ds.validate()
    ds2 = ds.delete(spark, "n_nationkey = 3")
    ds2.validate()  # deletion sidecar accounted
    ds3 = ds2.add_columns(spark, {"k2": "n_nationkey * 2"})
    ds3.validate()  # column-group file covers the new field


def test_validate_detects_missing_file(spark, ds):
    frag = ds.manifest.fragments[0]
    os.remove(os.path.join(ds.uri, frag.files[0].path))
    with pytest.raises(ValueError, match="missing data file"):
        ds.validate()


def test_validate_detects_row_count_drift(spark, ds, tmp_path):
    import pyarrow.parquet as pq

    frag = ds.manifest.fragments[0]
    p = os.path.join(ds.uri, frag.files[0].path)
    t = pq.read_table(p)
    pq.write_table(t.slice(0, max(1, t.num_rows - 2)), p)
    with pytest.raises(ValueError, match="rows"):
        ds.validate()

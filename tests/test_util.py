"""Public utils: KMeans fit/predict (numpy + Spark paths agree),
vec_to_table shapes, validate_vector_index accepts a good index.
Reference surface: python/python/lance/util.py:54-221, vector.py:47-133."""

import numpy as np
import pyarrow as pa
import pytest

from lance_spark.util import KMeans, validate_vector_index, vec_to_table


def _blobs(n=300, d=8, k=4, seed=0):
    rng = np.random.default_rng(seed)
    centers = rng.normal(size=(k, d)) * 10
    return np.vstack([
        centers[i % k] + rng.normal(scale=0.1, size=d) for i in range(n)
    ]).astype(np.float32)


def test_kmeans_fit_predict_numpy():
    x = _blobs()
    km = KMeans(4, max_iters=20).fit(x)
    assert km.centroids is not None and len(km.centroids) == 4
    pred = km.predict(x).to_numpy(zero_copy_only=False)
    # well-separated blobs: every 4-stride batch lands in one cluster
    for i in range(4):
        assert len(set(pred[i::4])) == 1
    assert len(set(pred)) == 4


def test_kmeans_predict_df_matches_driver(spark):
    x = _blobs(200)
    km = KMeans(4, max_iters=20).fit(x)
    df = spark.createDataFrame(
        [(i, [float(v) for v in row]) for i, row in enumerate(x)], "id int, vec array<float>"
    )
    got = {r["id"]: r["partition_id"] for r in km.predict_df(df, "vec").collect()}
    want = km.predict(x).to_numpy(zero_copy_only=False)
    assert all(got[i] == want[i] for i in range(len(x)))


def test_kmeans_pyarrow_input_and_cosine():
    x = _blobs()
    fsl = pa.FixedSizeListArray.from_arrays(
        pa.array(x.reshape(-1), type=pa.float32()), x.shape[1]
    )
    km = KMeans(4, metric_type="cosine").fit(fsl)
    assert len(km.predict(fsl)) == len(x)
    with pytest.raises(ValueError):
        KMeans(4, metric_type="bogus")
    with pytest.raises(ValueError):
        KMeans(4).predict(x)  # not fit


def test_vec_to_table_shapes():
    t = vec_to_table({"a": np.zeros(4), "b": np.ones(4)})
    assert t.column_names == ["id", "vector"] and t.num_rows == 2
    assert t.schema.field("vector").type == pa.list_(pa.float32(), 4)
    t2 = vec_to_table(np.zeros((3, 5)))
    assert t2.column_names == ["vector"] and t2.num_rows == 3
    with pytest.raises(ValueError):
        vec_to_table({"a": np.zeros(4)}, names=["only_one"])


def test_validate_vector_index(spark, sf_dir, tmp_path):
    from lance_spark.dataset import dataset
    from lance_spark.indexes.vector import create_dataset_index
    from lance_spark.write import write_dataset

    uri = str(tmp_path / "emb")
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    write_dataset(emb, uri, mode="create")
    col = "embedding" if "embedding" in emb.columns else "vec"
    ds = create_dataset_index(
        dataset(uri), spark, col, index_type="IVF_FLAT", num_partitions=4
    )
    validate_vector_index(ds, spark, col, sample_size=5, refine_factor=5)


def test_sanitize_ts_and_td_to_micros():
    from datetime import datetime, timedelta

    import pandas as pd
    import pytest

    from lance_spark.util import sanitize_ts, td_to_micros

    d = datetime(2026, 1, 2, 3, 4, 5)
    assert sanitize_ts(d) is d
    assert sanitize_ts("2026-01-02 03:04:05") == d
    assert sanitize_ts(pd.Timestamp(d)) == d
    with pytest.raises(TypeError):
        sanitize_ts(12345)
    assert td_to_micros(timedelta(seconds=1, microseconds=5)) == 1_000_005
    assert td_to_micros(timedelta(days=14)) == 14 * 86400 * 1_000_000


def test_cleanup_default_is_two_weeks(tmp_path, spark, sf_dir):
    """A bare cleanup_old_versions() must NOT strip minutes-old history
    (reference two-week default, dataset.py:2180); explicit
    older_than=timedelta(0) still cleans immediately."""
    from datetime import timedelta

    import lance_spark as ls

    uri = str(tmp_path / "gc")
    df = spark.read.parquet(f"{sf_dir}/region.parquet")
    ls.write_dataset(df, uri, mode="create")
    ds = ls.dataset(uri)
    ds = ds.delete(spark, "r_regionkey = 0")  # v2
    assert len(ds.versions()) == 2
    assert ds.cleanup_old_versions() == 0  # default: fresh history survives
    assert len(ls.dataset(uri).versions()) == 2
    removed = ds.cleanup_old_versions(older_than=timedelta(0))
    assert removed > 0
    assert len(ls.dataset(uri).versions()) == 1

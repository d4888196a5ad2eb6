"""Public utility surface: KMeans, vec_to_table, validate_vector_index.

Reference surface: python/python/lance/util.py:54-221 (``KMeans`` with
fit/predict/centroids, ``validate_vector_index``) and
python/python/lance/vector.py:47-133 (``vec_to_table``). The reference's
KMeans is a Rust trainer reached over pyarrow; here ``fit`` accepts a
numpy matrix, a pyarrow (FixedSizeList/List) array, or a Spark DataFrame
vector column — the Spark path samples to the driver exactly like the IVF
index build (the trainer is sample-bounded by design; the full-data
assignment pass stays distributed via ``predict_df``).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def sanitize_ts(ts) -> "datetime":
    """Coerce str / pandas.Timestamp / datetime to a python datetime — the
    reference's version-timestamp argument normalizer (util.py:31-46),
    used by ``checkout_version``-style time-travel lookups."""
    from datetime import datetime

    if isinstance(ts, str):
        ts = pd.to_datetime(ts).to_pydatetime()
    elif isinstance(ts, pd.Timestamp):
        ts = ts.to_pydatetime()
    elif not isinstance(ts, datetime):
        raise TypeError(f"Unrecognized version timestamp {ts} of type {type(ts)}")
    return ts


def td_to_micros(td) -> int:
    """Microseconds in a timedelta (reference util.py:49-51); the unit
    ``cleanup_old_versions(older_than=...)`` resolves through."""
    from datetime import timedelta

    return round(td / timedelta(microseconds=1))


def _to_matrix(data, ndim: int | None = None) -> np.ndarray:
    """numpy (n, d) float32 from ndarray / list-of-vectors / pyarrow array."""
    if isinstance(data, pa.ChunkedArray):
        data = data.combine_chunks()
    if isinstance(data, pa.FixedSizeListArray):
        d = data.type.list_size
        return np.asarray(data.flatten().to_numpy(zero_copy_only=False),
                          dtype=np.float32).reshape(-1, d)
    if isinstance(data, (pa.ListArray, pa.LargeListArray)):
        data = data.to_pylist()
    m = np.asarray(data, dtype=np.float32)
    if m.ndim == 1:  # list of equal-length vectors came back ragged-safe
        m = np.stack([np.asarray(v, dtype=np.float32) for v in data])
    if m.ndim != 2:
        raise ValueError(f"expected (n, d) vectors, got shape {m.shape}")
    if ndim is not None and m.shape[1] != ndim:
        raise ValueError(f"expected {ndim}-dim vectors, got {m.shape[1]}")
    return m


class KMeans:
    """Lloyd's k-means with the reference's util.KMeans API shape.

    ``metric`` l2/cosine/dot (cosine normalizes inputs, mirroring
    util.py:78-104); centroids come back as a pyarrow FixedSizeListArray
    via the ``centroids`` property.
    """

    def __init__(
        self,
        k: int,
        *,
        metric_type: str = "l2",
        max_iters: int = 50,
        seed: int = 42,
        sample_size: int = 65536,
    ):
        self.k = int(k)
        self.metric_type = metric_type.lower()
        if self.metric_type not in ("l2", "cosine", "dot"):
            raise ValueError(f"metric_type must be l2|cosine|dot, got {metric_type}")
        self.max_iters = max_iters
        self.seed = seed
        self.sample_size = sample_size
        self._centroids: np.ndarray | None = None

    def __repr__(self) -> str:
        return f"KMeans(k={self.k}, metric={self.metric_type})"

    @property
    def centroids(self) -> pa.FixedSizeListArray | None:
        if self._centroids is None:
            return None
        c = self._centroids
        return pa.FixedSizeListArray.from_arrays(
            pa.array(c.reshape(-1), type=pa.float32()), c.shape[1]
        )

    def _prep(self, m: np.ndarray) -> np.ndarray:
        if self.metric_type == "cosine":
            from lance_spark.indexes.vector import _normalize

            return _normalize(m)
        return m

    def fit(self, data, column: str | None = None) -> "KMeans":
        """Train on a numpy/pyarrow matrix or a Spark DataFrame vector column
        (sampled to ``sample_size`` rows on the driver, like the IVF build)."""
        from lance_spark.indexes.vector import train_kmeans

        if isinstance(data, DataFrame):
            col = column or "vec"
            n = data.count()
            frac = min(1.0, self.sample_size / max(n, 1))
            sample = data.select(F.col(col)).sample(frac, seed=self.seed).toPandas()
            m = np.stack([np.asarray(v, dtype=np.float32) for v in sample[col]])
        else:
            m = _to_matrix(data)
        self._centroids = train_kmeans(
            self._prep(m), self.k, iters=self.max_iters, seed=self.seed
        )
        return self

    def predict(self, data) -> pa.Array:
        """Nearest-centroid partition id per vector (driver-side numpy)."""
        if self._centroids is None:
            raise ValueError("KMeans is not fit yet")
        m = self._prep(_to_matrix(data, ndim=self._centroids.shape[1]))
        c = self._centroids.astype(np.float32)
        d = (m * m).sum(1, keepdims=True) - 2.0 * (m @ c.T) + (c * c).sum(1)
        return pa.array(d.argmin(axis=1).astype(np.uint32))

    def predict_df(self, df: DataFrame, column: str = "vec",
                   out: str = "partition_id") -> DataFrame:
        """Distributed assignment: adds ``out`` = nearest-centroid id.
        Arrow-batched pandas_udf over broadcast centroids — the exact
        assignment plan the IVF build shuffles on (indexes/vector.py)."""
        if self._centroids is None:
            raise ValueError("KMeans is not fit yet")
        from pyspark.sql.functions import pandas_udf

        c = self._centroids.astype(np.float32)
        cn2 = (c * c).sum(1)
        normalize = self.metric_type == "cosine"

        @pandas_udf("int")
        def assign(s: pd.Series) -> pd.Series:
            x = np.stack([np.asarray(v, dtype=np.float32) for v in s])
            if normalize:
                from lance_spark.indexes.vector import _normalize

                x = _normalize(x)
            d = (x * x).sum(1, keepdims=True) - 2.0 * (x @ c.T) + cn2
            return pd.Series(d.argmin(axis=1).astype(np.int32))

        return df.withColumn(out, assign(F.col(column)))


def vec_to_table(
    data,
    names=None,
    ndim: int | None = None,
    check_ndim: bool = True,
) -> pa.Table:
    """pyarrow Table of FixedSizeList<float32> vectors (vector.py:47-133):
    dict → (id, vector) columns; list/ndarray → one vector column."""
    if isinstance(data, dict):
        names = list(names) if names is not None else ["id", "vector"]
        if len(names) != 2:
            raise ValueError("dict input needs exactly 2 names (id, vector)")
        m = _to_matrix(list(data.values()), ndim if check_ndim else None)
        vectors = pa.FixedSizeListArray.from_arrays(
            pa.array(m.reshape(-1), type=pa.float32()), m.shape[1]
        )
        return pa.Table.from_arrays([pa.array(list(data.keys())), vectors], names=names)
    if isinstance(data, (list, np.ndarray)):
        if names is None:
            names = ["vector"]
        elif isinstance(names, str):
            names = [names]
        if len(names) != 1:
            raise ValueError(f"expected 1 name, got {len(names)}")
        m = _to_matrix(data, ndim if check_ndim else None)
        vectors = pa.FixedSizeListArray.from_arrays(
            pa.array(m.reshape(-1), type=pa.float32()), m.shape[1]
        )
        return pa.Table.from_arrays([vectors], names=names)
    raise NotImplementedError(f"data must be dict, list, or ndarray, got {type(data)}")


def validate_vector_index(
    ds,
    spark,
    column: str,
    refine_factor: int = 5,
    sample_size: int = 100,
    pass_threshold: float = 1.0,
) -> None:
    """Sanity-check an ANN index by comparing indexed vs refined (exact)
    results on sampled query vectors (util.py:171-221): the top-1 of an
    index query with a large refine_factor is exact; require at least
    ``pass_threshold`` of sampled queries to return themselves."""
    rows = ds.to_df(spark).select(column).limit(sample_size).collect()
    passed = 0
    for r in rows:
        q = np.asarray(r[column], dtype=np.float32)
        got = ds.nearest(
            spark, column, [float(v) for v in q], k=1, refine_factor=refine_factor
        ).collect()
        if got and np.allclose(
            np.asarray(got[0][column], dtype=np.float32), q, atol=1e-5
        ):
            passed += 1
    ratio = passed / max(len(rows), 1)
    if ratio < pass_threshold:
        raise ValueError(
            f"validate_vector_index failed: {passed}/{len(rows)} queries "
            f"returned themselves (threshold {pass_threshold})"
        )


def local_path(uri: str, what: str = "model_uri") -> str:
    """Resolve a caller-supplied URI to a plain LOCAL filesystem path.

    Accepts a bare path or a ``file:`` URI (converted to its path — the
    bare-URI form used to pass the scheme guard and then crash ``open()``
    after the parquet writes, leaving a partial model with no meta.json);
    any other scheme raises, since the local manifest-layer convention
    writes driver-side metadata next to the data."""
    from urllib.parse import urlparse

    p = urlparse(uri)
    if p.scheme in ("", None):
        return uri
    if p.scheme == "file":
        if p.netloc and p.netloc != "localhost":
            # 'file://tmp/model' (the natural two-slash typo) urlparses to
            # netloc='tmp', path='/model' — returning p.path would silently
            # redirect the model to the filesystem ROOT (r12 review fix)
            raise ValueError(
                f"{what}: ambiguous file URI {uri!r} (host part {p.netloc!r});"
                " use file:///absolute/path or a bare path"
            )
        return p.path or uri[len("file:"):]
    raise ValueError(
        f"{what} must be a local path (got scheme {p.scheme!r}); "
        "remote stores are not supported by the local manifest layer"
    )

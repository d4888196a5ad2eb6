"""Table loading helpers for the driver's testdata layout (TESTDATA.md).

``events.ts`` is parquet TIMESTAMP(NANOS), which Spark has no type for; we
read it as a long (spark.sql.legacy.parquet.nanosAsLong=true, set in
session.py) and derive a µs-truncated TimestampType column — the same
truncation DuckDB's epoch_us() applies, so oracle comparisons line up.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    # Runtime-settable SQL confs; the driver's harness builds its own
    # SparkSession without our session.py defaults, so set them here too —
    # nanosAsLong: reading a TIMESTAMP(NANOS) events.parquet raises
    # PARQUET_TYPE_ILLEGAL on any foreign session without it; UTC session tz
    # keeps timestamp rendering aligned with DuckDB's naive timestamps.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    if name == "events":
        dt = dict(df.dtypes).get("ts")
        if dt == "bigint":  # TIMESTAMP(NANOS) read as long under nanosAsLong
            df = df.withColumnRenamed("ts", "ts_ns").withColumn(
                "ts", F.expr("timestamp_micros(ts_ns div 1000)")
            )
        elif dt == "timestamp_ntz":
            # Spark 4 infers parquet non-UTC-adjusted micros as TIMESTAMP_NTZ;
            # cast to TIMESTAMP (identity under the UTC session tz above) so
            # watermarks/windows and prior query semantics keep working.
            df = df.withColumn("ts", F.col("ts").cast("timestamp"))
    return df


def register_views(spark: SparkSession, sf_dir: str, names: list[str] | None = None) -> None:
    for name in names or TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)


class StorageOptionsProvider:
    """Credential-refresh seam for object-store deployments (reference
    io.py:14 ``StorageOptionsProvider``). Long-running jobs on S3/GCS/Azure
    hold time-limited credentials; a provider is re-queried at each dataset
    open (the reference refreshes on expiry) so stale credentials never
    poison a cached handle.

    The local-filesystem backend this repo tests against needs no
    credentials — like the commit-lock seam (lance_spark.commit), the
    provider contract is the part an object-store integration plugs into:
    ``fetch_storage_options()`` returns the option dict handed to the
    filesystem layer, and MUST include an expiry key of the provider's
    choosing if refresh matters."""

    def fetch_storage_options(self) -> dict:
        raise NotImplementedError("subclasses implement fetch_storage_options")

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
    # Runtime-settable SQL conf; the driver's harness builds its own
    # SparkSession without our session.py defaults, so set it here too —
    # otherwise reading events.parquet (TIMESTAMP(NANOS)) raises
    # PARQUET_TYPE_ILLEGAL on any foreign session.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        df = df.withColumnRenamed("ts", "ts_ns").withColumn(
            "ts", F.expr("timestamp_micros(ts_ns div 1000)")
        )
    return df


def register_views(spark: SparkSession, sf_dir: str, names: list[str] | None = None) -> None:
    for name in names or TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)

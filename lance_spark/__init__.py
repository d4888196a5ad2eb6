"""lance_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of lancedb/lance.

Architecture (Spark-first, see SURVEY.md):
  - Table format: versioned datasets of immutable parquet *fragments* with
    deletion sidecars, committed via JSON manifests under ``_versions/``
    (semantics of rust/lance-table/src/format/manifest.rs:35-75).
  - Query layer: Spark SQL / Catalyst plays the role DataFusion plays in the
    reference (rust/lance/src/dataset/sql.rs) — scans become DataFrames,
    filters/aggregations/joins are Catalyst's job.
  - Indexes (vector IVF-PQ, FTS inverted, scalar) are Spark-built parquet
    index tables queried as DataFrames.

Public API mirrors python/python/lance/__init__.py of the reference:
  write_dataset, dataset, LanceDataset.
"""

from lance_spark.blob import BlobColumn, BlobFile
from lance_spark.dataset import (
    AutoCleanupConfig,
    Branches,
    ColumnOrdering,
    DataStatistics,
    FieldStatistics,
    LanceDataset,
    Session,
    Tags,
    dataset,
)
from lance_spark.file import LanceFileReader, LanceFileWriter
from lance_spark.fragment import LanceFragment
from lance_spark.manifest import DatasetBasePath, FragmentMetadata, Index
from lance_spark.mutation import MergeInsertBuilder
from lance_spark.operation import LanceOperation, Transaction, commit
from lance_spark.log import set_logger
from lance_spark.scanner import (
    LanceScanner,
    ScannerBuilder,
    ScanStatistics,
    bytes_read_counter,
    iops_counter,
)
from lance_spark import io, sampler, tracing
from lance_spark.fragment import FragmentSession
from lance_spark.hf import HuggingFaceConverter
from lance_spark.maintenance import CompactionOptions
from lance_spark.manifest import CommitConflictError
from lance_spark.namespace import LanceNamespaceStorageOptionsProvider
from lance_spark.tracing import capture_trace_events, trace_to_chrome
from lance_spark.types import LanceSchema, json_to_schema, schema_to_json
from lance_spark.udf import batch_udf
from lance_spark.write import commit_batch, commit_fragments, write_dataset, write_fragments
from lance_spark.session import get_spark
from lance_spark.query import (
    BooleanQuery,
    BoostQuery,
    FullTextOperator,
    FullTextQuery,
    MatchQuery,
    MultiMatchQuery,
    Occur,
    PhraseQuery,
)

__version__ = "0.2.0"

__all__ = [
    "LanceDataset",
    "dataset",
    "write_dataset",
    "write_fragments",
    "commit_fragments",
    "commit_batch",
    "LanceOperation",
    "DatasetBasePath",
    "commit",
    "get_spark",
    "BlobFile",
    "LanceFileReader",
    "LanceFileWriter",
    "ColumnOrdering",
    "Session",
    "FullTextQuery",
    "MatchQuery",
    "PhraseQuery",
    "BoostQuery",
    "MultiMatchQuery",
    "BooleanQuery",
    "Occur",
    "FullTextOperator",
    "BlobColumn",
    "DataStatistics",
    "FieldStatistics",
    "FragmentMetadata",
    "Index",
    "LanceFragment",
    "LanceScanner",
    "MergeInsertBuilder",
    "ScannerBuilder",
    "ScanStatistics",
    "Tags",
    "Branches",
    "AutoCleanupConfig",
    "Transaction",
    "batch_udf",
    "bytes_read_counter",
    "iops_counter",
    "json_to_schema",
    "schema_to_json",
    "set_logger",
    "LanceSchema",
    "FragmentSession",
    "LanceNamespaceStorageOptionsProvider",
    "FFILanceTableProvider",
    "io",
    "sampler",
    "tracing",
    "CommitConflictError",
    "CompactionOptions",
    "HuggingFaceConverter",
    "capture_trace_events",
    "trace_to_chrome",
]


class FFILanceTableProvider:
    """Reference export parity (lance.FFILanceTableProvider): a DataFusion
    FFI TableProvider handle for embedding Lance tables into other Arrow
    FFI engines. Spark's integration point is the DataSource V2 instead —
    ``spark.read.format("lance").load(uri)`` (sources/datasource.py) plays
    this exact role — so constructing the FFI form raises with the
    redirect rather than pretending."""

    def __init__(self, *a, **kw):
        raise NotImplementedError(
            "DataFusion-FFI table providers don't apply to Spark; use "
            'spark.read.format("lance").load(uri) (the DataSource V2) to '
            "hand this dataset to the engine"
        )

# Submodule map (import directly; kept lazy to avoid heavy imports here):
#   lance_spark.functions.{text,vector,json} — column function families
#   lance_spark.indexes.{vector,hnsw,inverted,scalar} — index build/search
#   lance_spark.operators.{dedup,curation,knn,fts,multimodal} — pipelines
#   lance_spark.loaders — ML ingest (sharded numpy/torch batches)
#   lance_spark.types — arrow→spark ingest type normalization
#   lance_spark.streaming.sink — Structured Streaming dataset sink
#   lance_spark.cdc — version-diff change feeds (ds.changes)
#   lance_spark.debug — format_manifest/format_fragment/format_schema
#   lance_spark.progress — FragmentWriteProgress hooks
#   lance_spark.util — KMeans, vec_to_table, validate_vector_index

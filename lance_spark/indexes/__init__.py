"""Index families: vector (IVF_*), hnsw, inverted (FTS), scalar, and the
staged distributed builder (reference ``lance.indices``)."""

from lance_spark.indexes.builder import IndicesBuilder, IvfModel, PqModel

__all__ = ["IndicesBuilder", "IvfModel", "PqModel"]

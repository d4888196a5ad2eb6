"""Reference-path alias: ``lance.indices`` → ``lance_spark.indices``
(the implementation lives in lance_spark.indexes.builder)."""

from lance_spark.indexes.builder import IndicesBuilder, IvfModel, PqModel

__all__ = ["IndicesBuilder", "IvfModel", "PqModel"]

"""Reference-path alias: ``lance.indices`` → ``lance_spark.indices``
(the implementation lives in lance_spark.indexes.builder)."""

from dataclasses import dataclass

from lance_spark.indexes.builder import IndicesBuilder, IvfModel, PqModel

__all__ = ["IndicesBuilder", "IvfModel", "PqModel", "IndexConfig"]


@dataclass
class IndexConfig:
    """Scalar-index build request descriptor (reference indices/builder.py:
    521-523): the (type, parameters) pair APIs pass around when scheduling
    index builds."""

    index_type: str
    parameters: dict

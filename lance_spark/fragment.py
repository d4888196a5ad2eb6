"""Per-fragment handle: the reference's ``LanceFragment`` surface.

Reference: python/python/lance/fragment.py:252-851 — a fragment is an
addressable sub-table with its own scanner/count_rows/head/take/to_table,
fragment-scoped ``delete``, and metadata accessors. There it subclasses
``pa.dataset.Fragment`` over Rust; here every read delegates to
``ds.scanner(fragments=[id])`` so the fragment handle is just a pushed
fragment-prune on the normal scan plan (the parquet scan reads only this
fragment's files), and mutations delegate to the dataset-level operators
whose deletion-sidecar/commit machinery is already fragment-granular.

``LanceFragment.delete(predicate)`` mirrors fragment.py:780-824: the
predicate is scoped to this fragment via a ``_rowid`` range conjunction —
other fragments are untouched by construction, and the commit is the
standard one-fragment deletion-file swap.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from lance_spark import manifest as mf
from lance_spark.write import FRAGID_SHIFT


class LanceFragment:
    def __init__(self, ds, fragment_id: int):
        self._ds = ds
        self.id = fragment_id
        self._meta = next(
            (f for f in ds.manifest.fragments if f.id == fragment_id), None
        )
        if self._meta is None:
            raise ValueError(f"fragment {fragment_id} does not exist")

    def __repr__(self) -> str:
        return f"LanceFragment(id={self.id}, rows={self.count_rows()})"

    # ------------------------------------------------------------ metadata

    @property
    def fragment_id(self) -> int:
        return self.id

    @property
    def metadata(self) -> mf.Fragment:
        return self._meta

    @property
    def physical_rows(self) -> int:
        return self._meta.physical_rows

    @property
    def num_deletions(self) -> int:
        return self._meta.num_deleted_rows

    def count_rows(self, filter: str | None = None, spark: SparkSession | None = None) -> int:  # noqa: A002
        if filter is None:
            return self._meta.num_rows
        return self.scanner(spark, columns=[], filter=filter).count()

    def data_files(self) -> list[mf.DataFile]:
        return list(self._meta.files)

    @property
    def deletion_file(self) -> str | None:
        return self._meta.deletion_file

    # ---------------------------------------------------------------- reads

    def scanner(self, spark: SparkSession, **kwargs) -> DataFrame:
        """ds.scanner restricted to this fragment (fragment.py:439-476)."""
        return self._ds.scanner(spark, fragments=[self.id], **kwargs)

    def to_table(self, spark: SparkSession, columns=None, filter: str | None = None):  # noqa: A002
        return self.scanner(spark, columns=columns, filter=filter).toArrow()

    def to_batches(self, spark: SparkSession, columns=None, filter: str | None = None):  # noqa: A002
        return self.to_table(spark, columns=columns, filter=filter).to_batches()

    def head(self, spark: SparkSession, num_rows: int):
        return self.scanner(spark, limit=num_rows).toArrow()

    def take(self, spark: SparkSession, indices: list[int], columns=None):
        """Rows by position WITHIN the fragment (fragment.py:499-505):
        positions offset into this fragment's _rowid space."""
        base = self.id << FRAGID_SHIFT
        rowids = [base + int(i) for i in indices]
        return self._ds.take(spark, rowids, columns=columns)

    # ------------------------------------------------------------ mutation

    def delete(self, spark: SparkSession, predicate: str):
        """Fragment-scoped delete (fragment.py:780-824): rows of OTHER
        fragments never match, so only this fragment's deletion sidecar
        changes. Returns the updated dataset (functional, like all
        mutations here)."""
        lo = self.id << FRAGID_SHIFT
        hi = (self.id + 1) << FRAGID_SHIFT
        scoped = f"({predicate}) AND _rowid >= {lo} AND _rowid < {hi}"
        return self._ds.delete(spark, scoped)

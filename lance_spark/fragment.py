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

    @property
    def schema(self):
        """Logical (dataset) schema — fragments share it (fragment.py:531)."""
        return self._ds.schema

    @property
    def physical_schema(self):
        """Arrow schema of this fragment's primary data file footer
        (fragment.py:525 — includes meta columns like _rowid)."""
        import pyarrow.parquet as pq

        return pq.read_schema(self._ds._abs(self._meta.files[0].path))

    def partition_expression(self):
        raise NotImplementedError("partitioning not yet supported")

    # ------------------------------------------------------------ creation

    @staticmethod
    def create(
        dataset_uri: str,
        data,
        fragment_id: int | None = None,
        schema=None,
        max_rows_per_group: int = 1024,
        progress=None,
        mode: str = "append",
        storage_options: dict | None = None,
    ) -> mf.Fragment:
        """Write ONE fragment's data files WITHOUT committing (reference
        fragment.py:304 — the distributed-write primitive: every worker
        calls create(), a coordinator commits the returned metadata with
        ``LanceOperation.Append`` / ``commit_fragments``). ``data`` takes
        the full ReaderLike breadth (Spark/pandas/arrow/list-of-dicts).
        ``fragment_id`` defaults to a reserved id on an existing dataset
        (so concurrent workers can't collide), else 0.

        ``max_rows_per_group`` / ``mode`` / ``storage_options`` are
        accepted for reference call-site compatibility and intentionally
        ignored: row-group sizing belongs to the parquet writer defaults,
        schema field-id assignment is name-based here, and the local-fs
        backend takes no credentials."""
        import os

        from lance_spark.write import input_to_spark_df, project_to_schema, write_fragments

        sdf = input_to_spark_df(data)
        if schema is not None:
            # project AND cast (same helper as write_dataset(schema=...)) so
            # worker-written fragments can't end up with parquet types that
            # diverge from the schema a coordinator later commits
            sdf = project_to_schema(sdf, schema)
        os.makedirs(dataset_uri, exist_ok=True)
        if fragment_id is None:
            fragment_id = (
                mf.reserve_fragment_ids(dataset_uri, 1)
                if mf.latest_version(dataset_uri) is not None
                else 0
            )
        frags = write_fragments(
            sdf.coalesce(1), dataset_uri, fragment_id, progress=progress
        )
        if not frags:
            raise ValueError("cannot create a fragment from empty data")
        return frags[0]

    @staticmethod
    def create_from_file(filename: str, dataset, fragment_id: int) -> mf.Fragment:
        """Wrap an existing data file as fragment metadata (reference
        fragment.py:279 — re-attach a datafile lost from the dataset).
        Row count comes from the parquet footer; columns from its schema
        minus the materialized ``_rowid`` (the same rule the write path
        uses, so layouts stay consistent across fragments).

        The file's embedded ``_rowid`` values name the fragment they were
        written for — re-attaching under a DIFFERENT id would silently
        corrupt every rowid-scoped operation (fragment-scoped delete,
        take, merge_columns), so the prefix is validated against
        ``fragment_id`` while rowids are fragment-addressable."""
        import os

        from lance_spark.write import FRAGID_SHIFT, ROWID_COL

        import pyarrow.parquet as pq

        path = (
            os.path.relpath(filename, dataset.uri)
            if os.path.isabs(filename)
            else filename
        )
        abspath = os.path.join(dataset.uri, path)
        md = pq.read_metadata(abspath)
        schema = pq.read_schema(abspath)
        cols = [n for n in schema.names if n != ROWID_COL]
        if ROWID_COL in schema.names and dataset._rowid_addressable():
            f = pq.ParquetFile(abspath)
            idx = schema.names.index(ROWID_COL)
            for g in range(f.metadata.num_row_groups):
                st = f.metadata.row_group(g).column(idx).statistics
                if st is None or st.min is None:
                    continue
                for bound in (st.min, st.max):
                    if bound >> FRAGID_SHIFT != fragment_id:
                        raise ValueError(
                            f"file {path} holds rowids of fragment "
                            f"{bound >> FRAGID_SHIFT}, cannot attach as "
                            f"fragment {fragment_id}"
                        )
        return mf.Fragment(
            id=fragment_id,
            files=[mf.DataFile(path=path, columns=cols)],
            physical_rows=md.num_rows,
        )

    # ---------------------------------------------------- column evolution

    def merge_columns(
        self,
        spark: SparkSession,
        value_func,
        columns: list[str] | None = None,
    ) -> tuple[mf.Fragment, list[dict]]:
        """Compute new columns for THIS fragment and write its column-group
        file WITHOUT committing (reference fragment.py:585 merge_columns →
        (FragmentMetadata, schema)) — the distributed add_columns
        primitive: each worker merges its fragments, the coordinator
        applies ONE ``LanceOperation.Merge`` commit with the updated
        fragment list + extended schema.

        ``value_func``: callable(pandas.DataFrame) -> pandas.DataFrame over
        ``columns``, or a {name: sql_expr} dict. Returns the updated
        fragment metadata and the new fields (schema JSON dicts)."""
        from lance_spark.evolution import (
            _write_column_groups,
            new_fields_json,
            transforms_to_new_df,
        )

        if self._meta.num_rows == 0:
            raise ValueError(
                f"fragment {self.id} has no live rows; nothing to merge"
            )
        base = self.scanner(spark, with_row_id=True)
        new_df, new_cols = transforms_to_new_df(
            base, value_func, columns or self._ds.columns, spark
        )
        collide = set(new_cols) & set(self._ds.columns)
        if collide:
            raise ValueError(f"columns already exist: {sorted(collide)}")
        cg_map = _write_column_groups(self._ds.uri, new_df, new_cols)
        path = cg_map[self.id]
        meta = self._meta
        new_frag = mf.Fragment(
            id=meta.id,
            files=[*meta.files, mf.DataFile(path=path, columns=new_cols)],
            physical_rows=meta.physical_rows,
            deletion_file=meta.deletion_file,
            num_deleted_rows=meta.num_deleted_rows,
        )
        return new_frag, new_fields_json(new_df, new_cols)

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

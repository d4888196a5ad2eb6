"""Distributed compaction: plan → execute tasks independently → one
commit (reference optimize.rs Compaction surface). Results round-trip
through JSON so they can travel between workers and the committing
driver."""

import pytest

from lance_spark.maintenance import Compaction, RewriteResult


@pytest.fixture()
def ds(spark, sf_dir, tmp_path):
    from lance_spark.dataset import dataset
    from lance_spark.write import write_dataset

    uri = str(tmp_path / "cp")
    write_dataset(
        spark.read.parquet(f"{sf_dir}/orders.parquet").repartition(8), uri, mode="create"
    )
    return dataset(uri)


def test_plan_execute_commit(spark, ds):
    before_rows = ds.count_rows()
    before_ids = {r["_rowid"] for r in ds.to_df(spark, with_row_id=True).select("_rowid").collect()}
    plan = Compaction.plan(ds, target_rows_per_fragment=100_000)
    assert plan.num_tasks >= 1
    assert sum(len(t.fragment_ids) for t in plan.tasks) == 8
    rewrites = [t.execute(spark) for t in plan.tasks]
    # results survive a JSON hop (worker -> driver)
    rewrites = [RewriteResult.from_json(r.to_json()) for r in rewrites]
    ds2 = Compaction.commit(ds, rewrites)
    assert ds2.count_rows() == before_rows
    assert len(ds2.manifest.fragments) < 8
    after_ids = {r["_rowid"] for r in ds2.to_df(spark, with_row_id=True).select("_rowid").collect()}
    assert after_ids == before_ids  # stable row ids


def test_multi_task_binning(spark, ds):
    # target = 3 fragments' rows -> all 8 are victims, bins close every
    # ~3 fragments -> several independent tasks
    rows_per_frag = ds.manifest.fragments[0].num_rows
    plan = Compaction.plan(ds, target_rows_per_fragment=rows_per_frag * 3)
    assert plan.num_tasks > 1


def test_empty_plan_when_fragments_full(spark, ds):
    plan = Compaction.plan(ds, target_rows_per_fragment=2)
    assert plan.num_tasks == 0  # nothing is small relative to target
    assert Compaction.commit(ds, []).version == ds.version


def test_commit_detects_stale_victim(spark, ds):
    from lance_spark.mutation import StaleSnapshotError

    plan = Compaction.plan(ds, target_rows_per_fragment=100_000)
    rewrites = [t.execute(spark) for t in plan.tasks]
    # a delete lands on a victim between execute and commit
    victim = rewrites[0].victim_ids[0]
    key = (
        ds.scanner(spark, columns=["o_orderkey"], fragments=[victim])
        .limit(1)
        .collect()[0]["o_orderkey"]
    )
    ds.delete(spark, f"o_orderkey = {key}")
    with pytest.raises(StaleSnapshotError):
        Compaction.commit(ds, rewrites)

"""Dataloader samplers (reference python/python/lance/sampler.py): pyarrow-
native fragment reads — no SparkSession on the training worker."""

import pyarrow as pa
import pytest

import lance_spark as ls
from lance_spark.sampler import (
    FullScanSampler,
    ShardedBatchSampler,
    ShardedFragmentSampler,
    maybe_sample,
    reservoir_sampling,
)


@pytest.fixture(scope="module")
def ds(spark, sf_dir, tmp_path_factory):
    nation = spark.read.parquet(f"{sf_dir}/customer.parquet")
    uri = str(tmp_path_factory.mktemp("sampler") / "cust")
    return ls.write_dataset(nation.repartition(6), uri)


def test_full_scan_sampler_covers_everything(ds):
    rows = [b.num_rows for b in FullScanSampler()(ds, batch_size=100, columns=["c_custkey"])]
    assert sum(rows) == ds.count_rows()
    assert max(rows) <= 100


def test_sharded_fragment_sampler_partitions(ds):
    world = 3
    seen = []
    for rank in range(world):
        s = ShardedFragmentSampler(rank, world)
        for b in s(ds, batch_size=512, columns=["c_custkey"]):
            seen.extend(b.column("c_custkey").to_pylist())
    assert sorted(seen) == sorted(
        r["c_custkey"] for r in ds.to_df(ds_spark(ds)).select("c_custkey").collect()
    )
    # disjoint: no key seen twice
    assert len(seen) == len(set(seen))


def ds_spark(ds):
    from lance_spark.session import get_spark

    return get_spark()


def test_sharded_fragment_sampler_randomize_epoch(ds):
    a = [f.id for f in ShardedFragmentSampler(0, 1, randomize=True, seed=7).iter_fragments(ds)]
    b = [f.id for f in ShardedFragmentSampler(0, 1, randomize=True, seed=7).iter_fragments(ds)]
    assert a == b  # seeded determinism
    s = ShardedFragmentSampler(0, 1, randomize=True, seed=7)
    s.set_epoch(1)
    c = [f.id for f in s.iter_fragments(ds)]
    assert sorted(c) == sorted(a)


def test_sampler_filter_string_and_with_row_id(ds):
    out = list(
        FullScanSampler()(
            ds, batch_size=256, columns=["c_custkey", "c_mktsegment"],
            filter="c_mktsegment = 'BUILDING'", with_row_id=True,
        )
    )
    tbl = pa.Table.from_batches(out)
    assert tbl.num_rows > 0
    assert set(tbl.column_names) == {"_rowid", "c_custkey", "c_mktsegment"}
    assert all(v == "BUILDING" for v in tbl.column("c_mktsegment").to_pylist())


def test_sharded_batch_sampler_partitions_rows(ds):
    world, bs = 2, 97
    seen = []
    for rank in range(world):
        for b in ShardedBatchSampler(rank, world)(ds, batch_size=bs, columns=["c_custkey"]):
            seen.extend(b.column("c_custkey").to_pylist())
    assert len(seen) == ds.count_rows()
    assert len(set(seen)) == len(seen)


def test_maybe_sample_shapes(ds):
    total = ds.count_rows()
    # n >= len: full scan
    full = sum(b.num_rows for b in maybe_sample(ds, n=total + 10, columns=["c_custkey"]))
    assert full == total
    # small n: exact point takes
    small = pa.Table.from_batches(list(maybe_sample(ds, n=20, columns=["c_custkey"], max_takes=5)))
    assert 0 < small.num_rows <= 25
    keys = small.column("c_custkey").to_pylist()
    assert len(set(keys)) == len(keys)
    # filtered
    filt = pa.Table.from_batches(
        list(maybe_sample(ds, n=10, columns=["c_custkey", "c_mktsegment"],
                          filter="c_mktsegment = 'BUILDING'"))
    )
    assert 0 < filt.num_rows <= 10
    assert all(v == "BUILDING" for v in filt.column("c_mktsegment").to_pylist())


def test_sampler_respects_deletions(spark, sf_dir, tmp_path):
    nation = spark.read.parquet(f"{sf_dir}/nation.parquet")
    ds2 = ls.write_dataset(nation.repartition(2), str(tmp_path / "del"))
    ds2 = ds2.delete(spark, "n_nationkey < 5")
    got = pa.Table.from_batches(
        list(FullScanSampler()(ds2, batch_size=100, columns=["n_nationkey"]))
    )
    keys = got.column("n_nationkey").to_pylist()
    assert len(keys) == 20 and min(keys) == 5


def test_reservoir_sampling_bounds():
    out = reservoir_sampling(iter(range(1000)), 10)
    assert len(out) == 10 and all(0 <= x < 1000 for x in out)
    short = reservoir_sampling(iter(range(3)), 10)
    assert sorted(short) == [0, 1, 2]


def test_sharded_batch_iterator_both_granularities(ds):
    from lance_spark.sampler import ShardedBatchIterator

    for gran in ("fragment", "batch"):
        seen = []
        for rank in range(2):
            it = ShardedBatchIterator(ds, rank, 2, columns=["c_custkey"],
                                      batch_size=128, granularity=gran)
            for b in it:
                seen.extend(b.column("c_custkey").to_pylist())
        assert len(seen) == ds.count_rows(), gran
        assert len(set(seen)) == len(seen), gran
    with pytest.raises(ValueError, match="granularity"):
        ShardedBatchIterator(ds, 0, 2, granularity="row")


def test_cached_dataset_replays_and_guards(ds):
    from lance_spark.sampler import CachedDataset

    stream = FullScanSampler()(ds, batch_size=200, columns=["c_custkey"])
    with CachedDataset(stream) as cache:
        first = [b.num_rows for b in cache]
        second = [b.num_rows for b in cache]  # replays from the IPC file
        assert sum(first) == sum(second) == ds.count_rows()

    # a second iteration before the first finishes must raise
    stream2 = FullScanSampler()(ds, batch_size=200, columns=["c_custkey"])
    cache2 = CachedDataset(stream2)
    it = iter(cache2)
    next(it)
    with pytest.raises(RuntimeError, match="has not finished"):
        list(iter(cache2))


def test_index_config_shape():
    from lance_spark.indices import IndexConfig

    cfg = IndexConfig(index_type="btree", parameters={"zone_size": 4096})
    assert cfg.index_type == "btree" and cfg.parameters["zone_size"] == 4096


def test_sharded_batch_sampler_with_row_id_unfiltered(ds):
    """Review regression: with_row_id must survive the unfiltered
    positional path, not just the filtered one."""
    b = next(iter(ShardedBatchSampler(0, 2)(ds, batch_size=64,
                                            columns=["c_custkey"], with_row_id=True)))
    assert "_rowid" in b.schema.names


def test_fragment_table_joins_short_column_groups(spark, sf_dir, tmp_path):
    """Review regression: a column group with FEWER rows than the primary
    file (written from a deletion-filtered scan) must align by _rowid,
    not positionally."""
    import lance_spark as ls
    from lance_spark.sampler import FullScanSampler

    nation = spark.read.parquet(f"{sf_dir}/nation.parquet")
    ds2 = ls.write_dataset(nation.repartition(1), str(tmp_path / "cg"))
    ds2 = ds2.delete(spark, "n_nationkey < 3")
    ds2 = ds2.add_columns(spark, {"dbl": "n_nationkey * 2"})
    got = pa.Table.from_batches(list(
        FullScanSampler()(ds2, batch_size=100, columns=["n_nationkey", "dbl"])
    ))
    vals = dict(zip(got.column("n_nationkey").to_pylist(), got.column("dbl").to_pylist()))
    assert len(vals) == 22 and all(v == k * 2 for k, v in vals.items())


def test_maybe_sample_filtered_reservoir(ds):
    """ADVICE r5: the filtered path reservoir-samples the batch stream —
    memory O(n) — and still yields exactly n unique matching rows when the
    filtered corpus exceeds n."""
    tbl = pa.Table.from_batches(
        list(maybe_sample(ds, n=10, columns=["c_custkey", "c_mktsegment"],
                          filter="c_mktsegment = 'BUILDING'", batch_size=8))
    )
    assert tbl.num_rows == 10
    keys = tbl.column("c_custkey").to_pylist()
    assert len(set(keys)) == len(keys)
    assert all(v == "BUILDING" for v in tbl.column("c_mktsegment").to_pylist())
    # n above the filtered corpus: every matching row, once
    n_building = sum(
        b.num_rows
        for b in maybe_sample(ds, n=10**6, columns=["c_custkey", "c_mktsegment"],
                              filter="c_mktsegment = 'BUILDING'", batch_size=8)
    )
    all_rows = pa.Table.from_batches(
        list(maybe_sample(ds, n=10**6, columns=["c_mktsegment"]))
    )
    want = sum(1 for v in all_rows.column("c_mktsegment").to_pylist() if v == "BUILDING")
    assert n_building == want


class TestSamplerReviewR11:
    """Pins for the r11 adversarial review of sampler.py."""

    def test_maybe_sample_fills_n_past_max_takes(self, ds):
        total = ds.count_rows()
        n = min(total - 1, 150)
        got = sum(
            b.num_rows for b in maybe_sample(ds, n, columns=["c_custkey"], max_takes=64)
        )
        # floor(n/takes) undersampled by ~half; ceil must land within one
        # window of n
        assert got >= int(n * 0.95) and got <= n

    def test_maybe_sample_zero_and_reservoir_zero(self, ds):
        assert list(maybe_sample(ds, 0, columns=["c_custkey"])) == []
        assert reservoir_sampling(iter([1, 2, 3]), 0) == []

    def test_filter_on_unprojected_column(self, ds):
        batches = list(
            FullScanSampler()(ds, columns=["c_custkey"], filter="c_nationkey = 1")
        )
        assert batches and all(b.schema.names == ["c_custkey"] for b in batches)
        n = sum(b.num_rows for b in batches)
        assert 0 < n < ds.count_rows()

    def test_sharded_fixed_len_matches_iter(self):
        from lance_spark.sampler import ShardedFixedBatchSampler

        for total, world, bs in [(10, 4, 2), (6, 4, 2), (100, 1, 7), (5, 8, 2)]:
            for rank in range(world):
                s = ShardedFixedBatchSampler(
                    rank, world, batch_size=bs, total_num_rows=total
                )
                assert len(s) == len(list(s)), (total, world, bs, rank)
        # default batch_size=0 with rows: len 0, iter empty, no crash
        s = ShardedFixedBatchSampler(0, 1, total_num_rows=100)
        assert len(s) == 0 and list(s) == []

    def test_sharded_filtered_deterministic_and_partitioned(self, ds):
        def batches(rank, epoch=0, randomize=True):
            s = ShardedBatchSampler(rank, 2, randomize=randomize, seed=7)
            s.set_epoch(epoch)
            return [
                tuple(b.column("c_custkey").to_pylist())
                for b in s(
                    ds, batch_size=16, columns=["c_custkey"], filter="c_custkey >= 0"
                )
            ]

        assert batches(0) == batches(0)  # seeded: reproducible across runs
        flat0 = {v for b in batches(0, randomize=False) for v in b}
        flat1 = {v for b in batches(1, randomize=False) for v in b}
        assert flat0.isdisjoint(flat1)
        spark_ids = {r["c_custkey"] for r in ds.to_df(ds_spark(ds)).select("c_custkey").collect()}
        assert flat0 | flat1 == spark_ids

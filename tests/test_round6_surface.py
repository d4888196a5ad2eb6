"""Tests for the round-6 API surface: auto-GC on commit (mirrors the
reference's cleanup tests, rust/lance/src/dataset/cleanup.rs:1126-1165),
``retain_versions``, ``write_dataset(auto_cleanup_options=)``, the live
Tags/Branches managers, ScannerBuilder end-to-end, and
ShardedFixedBatchSampler range math (reference sampler.py:580-665).
"""

import os

import pytest

import lance_spark as ls
from lance_spark import manifest as mf
from lance_spark.maintenance import cleanup_old_versions
from lance_spark.sampler import ShardedFixedBatchSampler


@pytest.fixture()
def tmp_uri(tmp_path):
    return str(tmp_path / "ds")


def _region(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/region.parquet")


def _versions_on_disk(uri):
    return sorted(mf.list_versions(uri))


# --------------------------------------------------------------- auto-GC


def test_auto_gc_lifecycle(spark, sf_dir, tmp_uri):
    """cleanup.rs:1126-1165 semantics: every interval-th commit GCs
    versions older than the cutoff; tagged + latest survive; disable
    stops GC."""
    ds = ls.write_dataset(_region(spark, sf_dir), tmp_uri)  # v1
    ds.create_tag("keep")  # pins v1
    ds = ls.write_dataset(_region(spark, sf_dir), tmp_uri, mode="append")  # v2+v3
    n_rows = ds.count_rows()
    ds = ds.optimize.enable_auto_cleanup(
        ls.AutoCleanupConfig(interval=3, older_than_seconds=0)
    )  # v4 (4 % 3 != 0 — no GC yet)
    assert _versions_on_disk(tmp_uri) == [1, 2, 3, 4]
    ds = ds.update_config({"k": "5"})  # v5
    ds = ds.update_config({"k": "6"})  # v6 → GC fires
    assert _versions_on_disk(tmp_uri) == [1, 6]  # tagged v1 + latest v6
    # data intact after GC
    assert ls.dataset(tmp_uri).count_rows() == n_rows
    assert ls.dataset(tmp_uri, tag="keep").count_rows() == 5

    ds = ds.optimize.disable_auto_cleanup()  # v7
    ds = ds.update_config({"k": "8"})  # v8
    ds = ds.update_config({"k": "9"})  # v9 — 9 % 3 == 0 but GC disabled
    assert _versions_on_disk(tmp_uri) == [1, 6, 7, 8, 9]


def test_auto_gc_branch_head_survives(spark, sf_dir, tmp_uri):
    ds = ls.write_dataset(_region(spark, sf_dir), tmp_uri)  # v1
    ds.create_branch("b1")  # pins v1 as a branch head
    ds = ds.optimize.enable_auto_cleanup(
        ls.AutoCleanupConfig(interval=2, older_than_seconds=0)
    )  # v2 → GC fires, branch head must survive
    assert 1 in _versions_on_disk(tmp_uri)
    assert ds.checkout_branch("b1").count_rows() == 5


def test_auto_gc_retain_versions(spark, sf_dir, tmp_uri):
    ds = ls.write_dataset(_region(spark, sf_dir), tmp_uri)  # v1
    for i in range(2, 6):
        ds = ds.update_config({"k": str(i)})  # v2..v5
    removed = cleanup_old_versions(
        ds, older_than_seconds=0, retain_versions=3
    )
    assert removed > 0
    assert _versions_on_disk(tmp_uri) == [3, 4, 5]  # newest 3 regardless of age


def test_auto_gc_default_older_than_is_two_weeks(spark, sf_dir, tmp_uri):
    """A user who sets ONLY the interval must not lose fresh versions:
    the missing older_than key defaults to the reference's two weeks
    (python dataset.py:2180), never 0s."""
    ds = ls.write_dataset(_region(spark, sf_dir), tmp_uri)  # v1
    ds = ds.update_config({"lance.auto_cleanup.interval": "1"})  # v2, GC every commit
    ds = ds.update_config({"k": "3"})  # v3
    ds = ds.update_config({"k": "4"})  # v4
    # all versions are seconds old — far inside the two-week default cutoff
    assert _versions_on_disk(tmp_uri) == [1, 2, 3, 4]


def test_auto_cleanup_config_validated_at_set_time(spark, sf_dir, tmp_uri):
    ds = ls.write_dataset(_region(spark, sf_dir), tmp_uri)  # v1
    with pytest.raises(ValueError, match="interval"):
        ds.update_config({"lance.auto_cleanup.interval": "weekly"})
    with pytest.raises(ValueError, match="older_than"):
        ds.update_config({"lance.auto_cleanup.older_than": "abc"})
    with pytest.raises(ValueError, match="retain_versions"):
        ds.update_config({"lance.auto_cleanup.retain_versions": "many"})
    with pytest.raises(ValueError, match="interval"):
        ds.optimize.enable_auto_cleanup(
            {"interval": "weekly", "older_than_seconds": 0}
        )
    # the rejected configs never became commits
    assert _versions_on_disk(tmp_uri) == [1]


def test_auto_gc_hook_never_fails_the_commit(tmp_uri, caplog):
    """io/commit.rs:904-906: ALL auto_cleanup_hook errors are logged, the
    commit never appears failed — even for a bad config value that predates
    set-time validation."""
    from types import SimpleNamespace

    bad = SimpleNamespace(
        version=4,
        config={
            "lance.auto_cleanup.interval": "2",
            "lance.auto_cleanup.older_than": "not-a-duration",
        },
    )
    mf._maybe_auto_cleanup(tmp_uri, bad)  # must not raise


def test_auto_gc_float_older_than(spark, sf_dir, tmp_uri):
    """write.py serializes float older_than_seconds as e.g. '1.5s' — the
    parser and validator must accept it."""
    assert mf._parse_duration_seconds("1.5s") == 1.5
    assert mf._parse_duration_seconds("2m") == 120
    mf.validate_auto_cleanup_config({"lance.auto_cleanup.older_than": "1.5s"})
    ds = ls.write_dataset(_region(spark, sf_dir), tmp_uri)
    ds = ds.optimize.enable_auto_cleanup(
        ls.AutoCleanupConfig(interval=100, older_than_seconds=1.5)
    )
    assert ds.config["lance.auto_cleanup.older_than"] == "1.5s"


def test_write_dataset_auto_cleanup_options(spark, sf_dir, tmp_uri):
    ds = ls.write_dataset(
        _region(spark, sf_dir), tmp_uri,
        auto_cleanup_options=ls.AutoCleanupConfig(
            interval=2, older_than_seconds=0, retain_versions=1
        ),
    )
    assert ds.config["lance.auto_cleanup.interval"] == "2"
    assert ds.config["lance.auto_cleanup.older_than"] == "0s"
    assert ds.config["lance.auto_cleanup.retain_versions"] == "1"
    # GC actually fires on the interval-th commit and data survives
    ds = ls.write_dataset(_region(spark, sf_dir), tmp_uri, mode="append")
    assert ls.dataset(tmp_uri).count_rows() == 10
    assert 1 not in _versions_on_disk(tmp_uri)  # v1 GC'd at the v2 commit


def test_write_dataset_auto_cleanup_ignored_on_append(spark, sf_dir, tmp_uri):
    """Reference docs: auto_cleanup_params only takes effect when creating
    a new dataset — append must not rewrite an existing GC policy."""
    ls.write_dataset(_region(spark, sf_dir), tmp_uri)
    ds = ls.write_dataset(
        _region(spark, sf_dir), tmp_uri, mode="append",
        auto_cleanup_options=ls.AutoCleanupConfig(interval=1, older_than_seconds=0),
    )
    assert "lance.auto_cleanup.interval" not in ds.config
    assert len(_versions_on_disk(tmp_uri)) >= 2  # nothing was GC'd


def test_write_dataset_auto_cleanup_options_validated(spark, sf_dir, tmp_uri):
    with pytest.raises(ValueError, match="interval"):
        ls.write_dataset(
            _region(spark, sf_dir), tmp_uri,
            auto_cleanup_options={"interval": "weekly", "older_than_seconds": 0},
        )


# ------------------------------------------------------- Tags / Branches


def test_tags_manager_live_view(spark, sf_dir, tmp_uri):
    ds = ls.write_dataset(_region(spark, sf_dir), tmp_uri)
    tags = ds.tags  # hold one manager across mutations
    tags.create("stable")
    assert tags.get_version("stable") == 1
    assert tags.list() == {"stable": 1}
    assert "stable" in tags and tags["stable"] == 1
    assert ds.tags() == {"stable": 1}  # original callable form
    # mutate through ANOTHER handle: a held manager must not go stale
    ds2 = ls.dataset(tmp_uri)
    ds2.tags.create("v1-bis", version=1)
    assert set(tags.list()) == {"stable", "v1-bis"}
    ds2.tags.delete("v1-bis")
    assert "v1-bis" not in tags

    ls.write_dataset(_region(spark, sf_dir), tmp_uri, mode="append")
    tags.update("stable", ls.dataset(tmp_uri).version)
    assert tags.get_version("stable") == ls.dataset(tmp_uri).version
    assert tags.get_version("absent") is None


def test_tags_list_ordered(spark, sf_dir, tmp_uri):
    ds = ls.write_dataset(_region(spark, sf_dir), tmp_uri)  # v1
    ds = ds.update_config({"k": "2"})  # v2
    ds = ds.update_config({"k": "3"})  # v3
    ds.tags.create("a", version=1)
    ds.tags.create("b", version=3)
    ds.tags.create("c", version=2)
    desc = ds.tags.list_ordered()
    assert [n for n, _ in desc] == ["b", "c", "a"]
    assert [t["version"] for _, t in desc] == [3, 2, 1]
    assert all(t["manifest_size"] > 0 for _, t in desc)
    asc = ds.tags.list_ordered("asc")
    assert [n for n, _ in asc] == ["a", "c", "b"]
    with pytest.raises(ValueError):
        ds.tags.list_ordered("sideways")


def test_tags_create_on_branch(spark, sf_dir, tmp_uri):
    ds = ls.write_dataset(_region(spark, sf_dir), tmp_uri)  # v1
    ds.create_branch("dev")  # head = v1
    ds = ls.write_dataset(_region(spark, sf_dir), tmp_uri, mode="append")
    # version omitted + branch given → tag the BRANCH head, not latest
    ds.tags.create("dev-snap", branch="dev")
    assert ds.tags.get_version("dev-snap") == 1
    ds.update_branch("dev", ds.version)
    ds.tags.update("dev-snap", branch="dev")
    assert ds.tags.get_version("dev-snap") == ds.version


def test_branches_manager(spark, sf_dir, tmp_uri):
    ds = ls.write_dataset(_region(spark, sf_dir), tmp_uri)  # v1
    ds.create_branch("b1")
    ds = ls.write_dataset(_region(spark, sf_dir), tmp_uri, mode="append")
    ds.branches.create("b2")
    assert ds.branches() == {"b1": 1, "b2": ds.version}  # callable back-compat
    assert ds.branches.list() == {"b1": 1, "b2": ds.version}
    assert "b1" in ds.branches
    ordered = ds.branches.list_ordered()
    assert [n for n, _ in ordered] == ["b2", "b1"]
    ds.branches.delete("b1")
    assert ds.branches.list() == {"b2": ds.version}


# --------------------------------------------------------- ScannerBuilder


def test_scanner_builder_end_to_end(spark, sf_dir, tmp_uri):
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    ds = ls.write_dataset(li.repartition(2), tmp_uri)
    got = (
        ds.scanner_builder(spark)
        .columns(["l_orderkey", "l_quantity"])
        .filter("l_quantity > 40")
        .order_by([("l_quantity", "desc"), "l_orderkey"])
        .limit(7)
        .offset(2)
        .with_row_id()
        .batch_size(64)
        .io_buffer_size(1 << 20)
        .batch_readahead(4)
        .fragment_readahead(2)
        .scan_in_order(True)
        .use_stats(True)
        .strict_batch_size(False)
        .late_materialization(False)
        .use_scalar_index(True)
        .prefilter(False)
        .fast_search(False)
        .include_deleted_rows(False)
        .with_fragments(None)
        .to_scanner()
    )
    direct = ds.scanner(
        spark, columns=["l_orderkey", "l_quantity"], filter="l_quantity > 40",
        order_by=[("l_quantity", "desc"), "l_orderkey"], limit=7, offset=2,
        with_row_id=True,
    )
    assert got.columns == ["l_orderkey", "l_quantity", "_rowid"]
    assert [r.asDict() for r in got.collect()] == [r.asDict() for r in direct.collect()]


def test_scanner_builder_apply_defaults(spark, sf_dir, tmp_uri):
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    ds = ls.write_dataset(li, tmp_uri)
    opts = {"columns": ["l_orderkey"], "filter": "l_quantity > 45", "limit": 5}
    via_defaults = ds.scanner_builder(spark).apply_defaults(opts).to_scanner()
    direct = ds.scanner(spark, **opts)
    assert via_defaults.collect() == direct.collect()
    for bad in ("no_such_option", "_set", "to_scanner", "apply_defaults"):
        with pytest.raises(ValueError, match="Unknown option"):
            ds.scanner_builder(spark).apply_defaults({bad: 1})


def test_scanner_builder_disable_scoring_autoprojection(spark, sf_dir, tmp_path):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").limit(200)
    ds = ls.write_dataset(emb, str(tmp_path / "emb"))
    q = emb.select("embedding").first()[0]
    auto = (
        ds.scanner_builder(spark)
        .columns(["vec_id"])
        .nearest("embedding", q, k=3)
        .to_scanner()
    )
    assert auto.columns == ["vec_id", "_distance"]  # autoprojected by default
    off = (
        ds.scanner_builder(spark)
        .columns(["vec_id"])
        .nearest("embedding", q, k=3)
        .disable_scoring_autoprojection()
        .to_scanner()
    )
    assert off.columns == ["vec_id"]
    assert len(off.collect()) == 3


def test_scanner_late_materialization_column_list(spark, sf_dir, tmp_uri):
    """Reference bool|list[str] form (dataset.py:4374): listed columns are
    fetched by rowid join AFTER the filter; results match the plain scan."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    ds = ls.write_dataset(li.repartition(2), tmp_uri)
    kw = dict(
        columns=["l_orderkey", "l_quantity", "l_shipdate", "l_extendedprice"],
        filter="l_quantity > 45",
    )
    late = ds.scanner(
        spark, late_materialization=["l_shipdate", "l_extendedprice"], **kw
    )
    plain = ds.scanner(spark, **kw)
    assert late.columns == plain.columns
    key = lambda r: (r["l_orderkey"], r["l_quantity"], r["l_shipdate"])  # noqa: E731
    assert sorted(late.collect(), key=key) == sorted(plain.collect(), key=key)
    # the plan is a two-phase rowid join: the late columns are fetched on
    # the join's build side, not in the filtered early scan
    plan = late._jdf.queryExecution().optimizedPlan().toString()
    assert "Join" in plan


def test_scanner_builder_exported(tmp_uri):
    assert ls.ScannerBuilder is not None
    assert ls.Tags is not None and ls.Branches is not None
    assert ls.AutoCleanupConfig(interval=1, older_than_seconds=2) == {
        "interval": 1, "older_than_seconds": 2,
    }


# --------------------------------------------- ShardedFixedBatchSampler


def test_sharded_fixed_batch_sampler_ranges():
    """Range math vs reference sampler.py:580-665: ranks own disjoint
    consecutive ceil(total/world) ranges, split into batch_size batches."""
    total, world, bs = 10, 3, 2
    seen = []
    for rank in range(world):
        s = ShardedFixedBatchSampler(rank, world, batch_size=bs, total_num_rows=total)
        batches = list(s)
        for b in batches:
            assert len(b) <= bs
            assert b == list(range(b[0], b[0] + len(b)))  # consecutive
        seen.extend(i for b in batches for i in b)
    assert sorted(seen) == list(range(total))  # disjoint cover, no overlap

    # exact reference split: total=1000, world=4, bs=100 → 3 batches ranks 0-2
    s0 = ShardedFixedBatchSampler(0, 4, batch_size=100, total_num_rows=1000)
    b0 = list(s0)
    assert [b[0] for b in b0] == [0, 100, 200] and [b[-1] for b in b0] == [99, 199, 249]
    assert len(s0) == 3


def test_sharded_fixed_batch_sampler_randomize():
    a = ShardedFixedBatchSampler(0, 1, randomize=True, seed=7, batch_size=3,
                                 total_num_rows=30)
    b = ShardedFixedBatchSampler(0, 1, randomize=True, seed=7, batch_size=3,
                                 total_num_rows=30)
    la, lb = list(a), list(b)
    assert la == lb  # deterministic per seed+epoch
    assert sorted(i for x in la for i in x) == list(range(30))
    plain = list(ShardedFixedBatchSampler(0, 1, batch_size=3, total_num_rows=30))
    assert sorted(map(tuple, la)) == sorted(map(tuple, plain))
    assert all(x == list(range(x[0], x[0] + 3)) for x in la)  # rows stay in-batch


def test_sharded_fixed_batch_sampler_empty():
    s = ShardedFixedBatchSampler(0, 2, batch_size=0, total_num_rows=0)
    assert len(s) == 0 and list(s) == []


# ------------------------------------------------------------- retain arm


def test_cleanup_retain_versions_beats_age(spark, sf_dir, tmp_uri):
    ds = ls.write_dataset(_region(spark, sf_dir), tmp_uri)  # v1
    ds = ds.update_config({"k": "2"})  # v2
    ds = ds.update_config({"k": "3"})  # v3
    # age cutoff 0 would drop v1+v2; retain_versions=2 keeps v2 anyway
    cleanup_old_versions(ds, older_than_seconds=0, retain_versions=2)
    assert _versions_on_disk(tmp_uri) == [2, 3]
    assert ls.dataset(tmp_uri).count_rows() == 5

"""Optimistic-concurrency commit tests: parallel appenders must all land
(conflict → re-read → retry, transaction.rs:145-280 semantics), and the
version chain must stay linear with no lost updates."""

import threading

import pytest


def test_parallel_appends_all_land(spark, sf_dir, tmp_path):
    from lance_spark.dataset import dataset
    from lance_spark.write import write_dataset

    uri = str(tmp_path / "conc")
    region = spark.read.parquet(f"{sf_dir}/region.parquet")
    write_dataset(region, uri)

    errors = []

    def appender(i):
        try:
            write_dataset(region, uri, mode="append")
        except Exception as e:  # noqa: BLE001
            errors.append((i, e))

    threads = [threading.Thread(target=appender, args=(i,)) for i in range(4)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()

    assert not errors, errors
    ds = dataset(uri)
    assert ds.count_rows() == 5 * region.count()  # initial + 4 appends
    # linear version chain: create + 4×(reserve_fragments + append)
    assert ds.version == 9
    # fragment ids unique
    fids = [f.id for f in ds.manifest.fragments]
    assert len(fids) == len(set(fids))


def test_conflicting_writer_retries_give_consistent_state(spark, sf_dir, tmp_path):
    """Two deletes on disjoint predicates racing: both must apply."""
    from lance_spark.dataset import dataset
    from lance_spark.write import write_dataset

    uri = str(tmp_path / "conc2")
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet").limit(1000)
    write_dataset(orders, uri)
    total = dataset(uri).count_rows()

    errs = []

    def deleter(pred):
        try:
            dataset(uri).delete(spark, pred)
        except Exception as e:  # noqa: BLE001
            errs.append(e)

    t1 = threading.Thread(target=deleter, args=("o_custkey % 2 = 0",))
    t2 = threading.Thread(target=deleter, args=("o_custkey % 2 = 1 AND o_totalprice < 100000",))
    t1.start(); t2.start(); t1.join(); t2.join()
    assert not errs, errs

    ds = dataset(uri)
    want = (
        orders.filter("NOT (o_custkey % 2 = 0) AND NOT (o_custkey % 2 = 1 AND o_totalprice < 100000)")
    ).count()
    assert ds.count_rows() == want < total

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


def test_concurrent_merge_delete_with_auto_gc(spark, sf_dir, tmp_path):
    """Stress: 4 parallel merge_insert writers (disjoint key ranges) + one
    delete racing against ONE dataset with aggressive auto-GC enabled
    (interval=2, older_than=0s — GC fires on half the commits, mid-race).
    The operations commute, so the final state must equal the serial
    schedule regardless of interleaving, and GC must never corrupt an
    in-flight writer's view (transaction.rs conflict matrix + the
    cleanup.rs keep-latest/keep-tagged rules)."""
    from pyspark.sql import functions as F

    import lance_spark as ls
    from lance_spark.dataset import dataset
    from lance_spark.write import write_dataset

    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")

    for run in range(3):
        uri = str(tmp_path / f"gc_stress_{run}")
        ds = write_dataset(orders, uri)
        ds.optimize.enable_auto_cleanup(
            ls.AutoCleanupConfig(interval=2, older_than_seconds=0)
        )

        errs = []

        def merger(w, uri=uri):
            try:
                lo, hi = w * 100, (w + 1) * 100
                upd = (
                    orders.filter(f"o_orderkey >= {lo} AND o_orderkey < {hi}")
                    .withColumn("o_totalprice", F.col("o_totalprice") + 1)
                )
                src = upd.unionByName(
                    upd.withColumn("o_orderkey", F.col("o_orderkey") + 100000)
                )
                (
                    dataset(uri).merge_insert("o_orderkey")
                    .when_matched_update_all()
                    .when_not_matched_insert_all()
                    .conflict_retries(30)
                    .execute(spark, src)
                )
            except Exception as e:  # noqa: BLE001
                errs.append(("merge", w, e))

        def deleter(uri=uri):
            try:
                dataset(uri).delete(spark, "o_orderkey >= 400 AND o_orderkey < 500")
            except Exception as e:  # noqa: BLE001
                errs.append(("delete", None, e))

        threads = [threading.Thread(target=merger, args=(w,)) for w in range(4)]
        threads.append(threading.Thread(target=deleter))
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        assert not errs, errs

        # serial-schedule oracle: [0,400) price+1, [400,500) deleted,
        # rest untouched, plus 400 inserted rows keyed 100000+[0,400)
        final = dataset(uri)
        got = {
            (r["o_orderkey"], round(r["o_totalprice"], 2))
            for r in final.to_df(spark).select("o_orderkey", "o_totalprice").collect()
        }
        base = {
            (r["o_orderkey"], round(r["o_totalprice"], 2))
            for r in orders.select("o_orderkey", "o_totalprice").collect()
        }
        want = set()
        for k, p in base:
            if k < 400:
                want.add((k, round(p + 1, 2)))
                want.add((k + 100000, round(p + 1, 2)))
            elif k < 500:
                pass  # deleted
            else:
                want.add((k, p))
        assert got == want, (
            f"run {run}: {len(got - want)} unexpected / {len(want - got)} missing"
        )
        # auto-GC actually fired during the race: the version chain on disk
        # is pruned (latest survives; interval-th commits dropped elders)
        from lance_spark import manifest as mf

        versions_on_disk = mf.list_versions(uri)
        assert versions_on_disk[-1] == final.version
        assert len(versions_on_disk) < final.version, "GC never fired"

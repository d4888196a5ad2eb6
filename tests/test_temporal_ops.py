"""Unit tests for round-4 operators: as-of join, range join, sequence
packing, paragraph dedup — edge semantics the suite oracle doesn't pin
(tolerance cutoffs, empty inputs, straddling docs, oversized docs).
"""

import datetime

import pytest
from pyspark.sql import functions as F

from lance_spark.operators.curation import pack_sequences
from lance_spark.operators.dedup import paragraph_dedup
from lance_spark.operators.joins import as_of_join, range_join


def _ts(minute):
    return datetime.datetime(2024, 1, 1, 10, minute)


@pytest.fixture()
def trades_quotes(spark):
    trades = spark.createDataFrame(
        [(1, "A", _ts(5), 100.0), (2, "A", _ts(10), 101.0), (3, "B", _ts(7), 50.0),
         (4, "C", _ts(1), 7.0)],
        "trade_id long, sym string, ts timestamp, px double",
    )
    quotes = spark.createDataFrame(
        [("A", _ts(4), 99.5), ("A", _ts(10), 100.5), ("A", _ts(12), 109.0),
         ("B", _ts(0), 49.0)],
        "sym string, ts timestamp, bid double",
    )
    return trades, quotes


def test_as_of_join_basic(trades_quotes):
    trades, quotes = trades_quotes
    out = as_of_join(trades, quotes, on="sym", time_col="ts", value_cols=["bid"])
    got = {r["trade_id"]: (r["bid_asof"], r["ts_asof"]) for r in out.collect()}
    assert got[1] == (99.5, _ts(4))      # strictly before
    assert got[2] == (100.5, _ts(10))    # equal ts is inclusive
    assert got[3] == (49.0, _ts(0))
    assert got[4] == (None, None)        # no quote for C
    assert out.count() == trades.count()  # left-join cardinality


def test_as_of_join_tolerance(trades_quotes):
    trades, quotes = trades_quotes
    out = as_of_join(trades, quotes, on="sym", time_col="ts",
                     value_cols=["bid"], tolerance="5 MINUTE")
    got = {r["trade_id"]: r["bid_asof"] for r in out.collect()}
    assert got[1] == 99.5                # 1 min back, inside tolerance
    assert got[3] is None                # 7 min back, outside


def test_as_of_join_duplicate_right_ts(spark):
    left = spark.createDataFrame([(1, "A", _ts(5))], "id long, k string, ts timestamp")
    right = spark.createDataFrame(
        [("A", _ts(3), 1.0), ("A", _ts(3), 9.0)], "k string, ts timestamp, v double"
    )
    out = as_of_join(left, right, on="k", time_col="ts", value_cols=["v"])
    # deterministic winner among equal-ts right rows: max-ordered
    assert out.collect()[0]["v_asof"] == 9.0


def test_range_join_window_edges(spark):
    anchors = spark.createDataFrame([(1, "u", _ts(0))], "id long, k string, ts timestamp")
    # 59:59 in-window; exactly +1h excluded; before-anchor excluded
    right = spark.createDataFrame(
        [("u", datetime.datetime(2024, 1, 1, 10, 59, 59), 1.0),
         ("u", datetime.datetime(2024, 1, 1, 11, 0, 0), 2.0),
         ("u", datetime.datetime(2024, 1, 1, 9, 59, 59), 3.0),
         ("u", _ts(0), 4.0)],
        "k string, ts timestamp, v double",
    )
    out = range_join(anchors, right, on="k", time_col="ts",
                     window="1 HOUR", bucket_seconds=3600)
    vals = sorted(r["v_r"] for r in out.collect())
    assert vals == [1.0, 4.0]  # inclusive start, exclusive end, no lookback


def test_range_join_no_cross_key_pairs(spark):
    anchors = spark.createDataFrame([(1, "u1", _ts(0))], "id long, k string, ts timestamp")
    right = spark.createDataFrame([("u2", _ts(30), 1.0)], "k string, ts timestamp, v double")
    out = range_join(anchors, right, on="k", time_col="ts",
                     window="1 HOUR", bucket_seconds=3600)
    assert out.count() == 0


def test_range_join_small_buckets_still_exact(spark):
    """The r4 verdict's contract gap: bucket_seconds < window used to lose
    every match beyond 2 buckets silently. Now the probe fan-out widens to
    ceil(window/bucket)+1, so ANY bucket size is exact."""
    anchors = spark.createDataFrame([(1, "u", _ts(0))], "id long, k string, ts timestamp")
    right = spark.createDataFrame(
        [("u", datetime.datetime(2024, 1, 1, 10, 45, 0), 1.0),   # 45 min out
         ("u", datetime.datetime(2024, 1, 1, 10, 59, 59), 2.0),  # 59:59 out
         ("u", datetime.datetime(2024, 1, 1, 11, 0, 0), 3.0),    # +1h excluded
         ("u", _ts(0), 4.0)],
        "k string, ts timestamp, v double",
    )
    out = range_join(anchors, right, on="k", time_col="ts",
                     window="1 HOUR", bucket_seconds=600)  # 10-min buckets
    assert sorted(r["v_r"] for r in out.collect()) == [1.0, 2.0, 4.0]


def test_range_join_fanout_guard_raises(spark):
    anchors = spark.createDataFrame([(1, "u", _ts(0))], "id long, k string, ts timestamp")
    right = spark.createDataFrame([("u", _ts(1), 1.0)], "k string, ts timestamp, v double")
    with pytest.raises(ValueError, match="probe buckets"):
        range_join(anchors, right, on="k", time_col="ts",
                   window="1 DAY", bucket_seconds=60)
    with pytest.raises(ValueError, match="positive"):
        range_join(anchors, right, on="k", time_col="ts",
                   window="1 HOUR", bucket_seconds=0)


def test_range_join_compound_interval_parse(spark):
    from lance_spark.operators.joins import _interval_seconds

    assert _interval_seconds(spark, "1 HOUR") == 3600
    assert _interval_seconds(spark, "90 minutes") == 5400
    assert _interval_seconds(spark, "1 day 6 hours") == 108000
    # quoted Spark form falls through the regex? no — handled either way
    assert _interval_seconds(spark, "'2' HOUR") == 7200


def test_range_join_random_small_buckets_vs_bruteforce(spark):
    import random

    rng = random.Random(31)
    anchors = [(i, rng.choice("ab"), _ts(rng.randint(0, 50))) for i in range(30)]
    right = [(rng.choice("abc"), _ts(rng.randint(0, 59)), float(i)) for i in range(90)]
    adf = spark.createDataFrame(anchors, "id long, k string, ts timestamp")
    rdf = spark.createDataFrame(right, "k string, ts timestamp, v double")
    pairs = range_join(adf, rdf, on="k", time_col="ts",
                       window="10 MINUTE", bucket_seconds=90)  # 8 probe buckets
    got = sorted((r["id"], r["v_r"]) for r in pairs.collect())
    want = sorted(
        (aid, v)
        for aid, ak, ats in anchors
        for rk, rts, v in right
        if rk == ak and ats <= rts < ats + datetime.timedelta(minutes=10)
    )
    assert got == want


def test_pack_sequences_contiguous_fill(spark):
    df = spark.createDataFrame(
        [(i, 100) for i in range(10)], "id long, n long"
    )
    out = pack_sequences(df, "id", "n", capacity=250, num_shards=3).orderBy("id").collect()
    # cumulative-before: 0,100,...,900 → bins 0,0,0,1,1,2,2,2,3,3
    assert [r["bin"] for r in out] == [0, 0, 0, 1, 1, 2, 2, 2, 3, 3]
    assert [r["bin_offset"] for r in out] == [0, 100, 200, 50, 150, 0, 100, 200, 50, 150]


def test_pack_sequences_oversized_doc_and_empty(spark):
    df = spark.createDataFrame([(1, 5000), (2, 10)], "id long, n long")
    out = {r["id"]: r for r in pack_sequences(df, "id", "n", capacity=2048).collect()}
    assert out[1]["bin"] == 0            # starts at offset 0
    assert out[2]["bin"] == 2            # 5000 // 2048
    empty = pack_sequences(df.filter("id > 99"), "id", "n", capacity=2048)
    assert empty.count() == 0
    assert set(empty.columns) == {"id", "n_tokens", "bin", "bin_offset"}


def test_pack_sequences_matches_global_window(spark):
    # distributed 2-pass cumsum == single-partition global window
    import random

    rng = random.Random(7)
    rows = [(i * 3 + 1, rng.randint(0, 500)) for i in range(200)]
    df = spark.createDataFrame(rows, "id long, n long")
    got = pack_sequences(df, "id", "n", capacity=1000, num_shards=8).orderBy("id").collect()
    cum = 0
    for r, (_i, n) in zip(got, sorted(rows)):
        assert r["bin"] == cum // 1000
        assert r["bin_offset"] == cum % 1000
        cum += n


def test_pack_sequences_sparse_rowid_style_ids(spark):
    """_rowid-shaped ids (fragment<<32 | offset, 2 fragments) collapse the
    arithmetic sharding into 2 occupied shards; the occupancy guard must
    re-shard on quantile boundaries with IDENTICAL packing output."""
    rows = [((f << 32) | i, 100 + i) for f in (0, 1) for i in range(100)]
    df = spark.createDataFrame(rows, "id long, n long")
    got = pack_sequences(df, "id", "n", capacity=1000, num_shards=16).orderBy("id").collect()
    cum = 0
    for r, (_i, n) in zip(got, sorted(rows)):
        assert r["bin"] == cum // 1000 and r["bin_offset"] == cum % 1000
        cum += n
    # and the shards are genuinely balanced now: re-derive the occupancy
    from pyspark.sql import functions as F

    probs = [i / 16 for i in range(1, 16)]
    bounds = sorted(set(df.approxQuantile("id", probs, 0.001)))
    shard = sum((F.when(F.col("id") >= F.lit(b), 1).otherwise(0) for b in bounds), F.lit(0))
    occ = df.select(shard.alias("s")).groupBy("s").count().count()
    assert occ >= 8  # vs 2 under arithmetic sharding


def test_paragraph_dedup(spark):
    # alphabetic words — tokenize() splits on non-letters, digits vanish
    words = [f"w{chr(97 + i)}" for i in range(20)]
    a = " ".join(words)                               # paras P0 P1
    b = " ".join(words[:10]) + " unique text here only doc two"
    df = spark.createDataFrame([(1, a), (2, b), (3, a)], "doc_id long, text string")
    out = {r["id"]: (r["n_paras"], r["n_kept"]) for r in
           paragraph_dedup(df, "text", "doc_id", para_tokens=10).collect()}
    assert out[1] == (2, 2)   # first occurrence of both paras
    assert out[2] == (2, 1)   # P0 is doc 1's; tail para unique
    assert out[3] == (2, 0)   # exact dup of doc 1


def test_as_of_join_random_vs_bruteforce(spark):
    """Property-style check: union+window as-of join == per-row brute-force
    lookup over a randomized event set (many keys, duplicate timestamps,
    keys missing on either side)."""
    import random

    rng = random.Random(13)
    keys = ["a", "b", "c", "d"]
    left = [(i, rng.choice(keys), _ts(rng.randint(0, 59)))
            for i in range(120)]
    right = [(rng.choice(keys + ["e"]), _ts(rng.randint(0, 59)), float(i))
             for i in range(80)]
    ldf = spark.createDataFrame(left, "id long, k string, ts timestamp")
    rdf = spark.createDataFrame(right, "k string, ts timestamp, v double")
    got = {r["id"]: r["v_asof"]
           for r in as_of_join(ldf, rdf, on="k", time_col="ts", value_cols=["v"]).collect()}

    # brute force with identical tie-break: per (k, ts) the max-ordered row
    # survives; match = greatest right ts <= left ts
    best = {}
    for k, ts, v in right:
        cur = best.get((k, ts))
        if cur is None or v > cur:
            best[(k, ts)] = v
    for lid, lk, lts in left:
        cands = [(ts, v) for (k, ts), v in best.items() if k == lk and ts <= lts]
        want = max(cands)[1] if cands else None
        assert got[lid] == want, f"id {lid}: got {got[lid]}, want {want}"


def test_range_join_random_vs_bruteforce(spark):
    import random

    rng = random.Random(29)
    anchors = [(i, rng.choice("ab"), _ts(rng.randint(0, 50))) for i in range(40)]
    right = [(rng.choice("abc"), _ts(rng.randint(0, 59)), float(i)) for i in range(120)]
    adf = spark.createDataFrame(anchors, "id long, k string, ts timestamp")
    rdf = spark.createDataFrame(right, "k string, ts timestamp, v double")
    pairs = range_join(adf, rdf, on="k", time_col="ts",
                       window="10 MINUTE", bucket_seconds=600)
    got = sorted((r["id"], r["v_r"]) for r in pairs.collect())
    import datetime

    want = sorted(
        (aid, v)
        for aid, ak, ats in anchors
        for rk, rts, v in right
        if rk == ak and ats <= rts < ats + datetime.timedelta(minutes=10)
    )
    assert got == want


class TestJoinsReviewR11:
    """Pins for the r11 adversarial review of operators/joins.py."""

    def _mk(self, spark, rows, schema):
        return spark.createDataFrame(rows, schema)

    def test_null_right_time_and_null_keys_never_match(self, spark):
        import datetime as dt

        from lance_spark.operators.joins import as_of_join

        t = lambda h, m=0: dt.datetime(2025, 1, 1, h, m)  # noqa: E731
        left = self._mk(
            spark,
            [("A", t(10)), (None, t(10))],
            "k string, ts timestamp",
        )
        right = self._mk(
            spark,
            [("A", None, 5.0), (None, t(9), 1.0)],
            "k string, ts timestamp, bid double",
        )
        rows = {
            r["k"]: (r["bid_asof"], r["ts_asof"])
            for r in as_of_join(left, right, "k", "ts", ["bid"]).collect()
        }
        assert rows["A"] == (None, None)  # NULL right time: no match
        assert rows[None] == (None, None)  # NULL keys don't equal each other

    def test_tolerance_gates_each_value_by_its_supplier_row(self, spark):
        import datetime as dt

        from lance_spark.operators.joins import as_of_join

        t = lambda h, m=0: dt.datetime(2025, 1, 1, h, m)  # noqa: E731
        left = self._mk(spark, [("A", t(10))], "k string, ts timestamp")
        right = self._mk(
            spark,
            [("A", t(9, 0), 50.0), ("A", t(9, 59), None)],
            "k string, ts timestamp, bid double",
        )
        row = as_of_join(
            left, right, "k", "ts", ["bid"], tolerance="5 minutes"
        ).collect()[0]
        # the carried 50.0 came from 09:00 (outside tolerance) even though
        # the latest matched row (09:59, NULL bid) is inside it
        assert row["bid_asof"] is None
        assert row["ts_asof"] == t(9, 59)
        # without tolerance the old value shows through (documented caveat)
        row2 = as_of_join(left, right, "k", "ts", ["bid"]).collect()[0]
        assert row2["bid_asof"] == 50.0

    def test_unorderable_extra_right_columns_ok(self, spark):
        import datetime as dt

        from lance_spark.operators.joins import as_of_join

        t = dt.datetime(2025, 1, 1, 9)
        left = self._mk(
            spark, [("A", dt.datetime(2025, 1, 1, 10))], "k string, ts timestamp"
        )
        right = spark.createDataFrame(
            [("A", t, 1.0, {"x": "y"})],
            "k string, ts timestamp, bid double, attrs map<string,string>",
        )
        got = as_of_join(left, right, "k", "ts", ["bid"]).collect()
        assert got[0]["bid_asof"] == 1.0  # map column never shuffles/orders

    def test_suffix_collision_raises(self, spark):
        import datetime as dt

        from lance_spark.operators.joins import as_of_join, range_join

        t = dt.datetime(2025, 1, 1, 10)
        left = self._mk(
            spark, [("A", t, 1.0)], "k string, ts timestamp, bid_asof double"
        )
        right = self._mk(spark, [("A", t, 2.0)], "k string, ts timestamp, bid double")
        with pytest.raises(ValueError, match="collide"):
            as_of_join(left, right, "k", "ts", ["bid"])
        left2 = self._mk(
            spark, [("A", t, 3.0)], "k string, ts timestamp, bid_r double"
        )
        with pytest.raises(ValueError, match="collide"):
            range_join(left2, right, "k", "ts", "1 hour", bucket_seconds=3600)

    def test_subsecond_windows_exact(self, spark):
        import datetime as dt

        from lance_spark.operators.joins import _interval_seconds, range_join

        assert _interval_seconds(spark, "500 milliseconds") == pytest.approx(0.5)
        assert _interval_seconds(spark, "1 second 500 milliseconds") == pytest.approx(1.5)

        base = dt.datetime(2025, 1, 1, 0, 0, 0)
        us = lambda n: base + dt.timedelta(microseconds=n)  # noqa: E731
        left = self._mk(spark, [("A", us(900_000))], "k string, ts timestamp")
        right = self._mk(
            spark,
            [("A", us(2_300_000), 1), ("A", us(2_500_000), 2)],
            "k string, ts timestamp, v int",
        )
        got = sorted(
            r["v_r"]
            for r in range_join(
                left, right, "k", "ts", "1 second 500 milliseconds", bucket_seconds=1
            ).collect()
        )
        # window [0.9s, 2.4s): 2.3s in, 2.5s out — the truncated-seconds
        # fan-out missed the 2.3s row entirely
        assert got == [1]

    def test_rejected_nonspark_units(self, spark):
        from lance_spark.operators.joins import range_join

        left = spark.createDataFrame([("A",)], "k string").withColumn(
            "ts", F.current_timestamp()
        )
        with pytest.raises(ValueError, match="positive day-time interval"):
            range_join(left, left.select("k", "ts"), "k", "ts", "30 mins", bucket_seconds=900)

"""Scalar index tests — each index type × its SargableQuery surface,
checked against a plain filtered scan (the reference's test_scalar_index.py
strategy: every index must return exactly what the unindexed filter does).
"""

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def ds(spark, sf_dir, tmp_path_factory):
    from lance_spark.dataset import dataset
    from lance_spark.write import write_dataset

    uri = str(tmp_path_factory.mktemp("scalar") / "orders_ds")
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    # several fragments so fragment-granular pruning is observable
    write_dataset(orders.repartition(4), uri, mode="create")
    return dataset(uri)


def _truth(ds, spark, pred):
    return {r["o_orderkey"] for r in ds.scanner(spark, filter=pred).select("o_orderkey").collect()}


def test_btree_range_and_eq(spark, ds):
    ds2 = ds.create_scalar_index(spark, "o_totalprice", "BTREE")
    from lance_spark.indexes.scalar import query_index

    meta = next(i for i in ds2.manifest.indices if i.index_type == "BTREE")
    res = query_index(ds2, spark, meta, "between", (100000.0, 150000.0))
    assert res.exact
    got = {
        r["o_orderkey"]
        for r in ds2.scanner(spark, prefilter_rowids=res.rowids).select("o_orderkey").collect()
    }
    assert got == _truth(ds2, spark, "o_totalprice BETWEEN 100000.0 AND 150000.0")


def test_bitmap_eq_in(spark, ds):
    ds2 = ds.create_scalar_index(spark, "o_orderpriority", "BITMAP")
    from lance_spark.indexes.scalar import query_index

    meta = next(i for i in ds2.manifest.indices if i.index_type == "BITMAP")
    res = query_index(ds2, spark, meta, "=", "1-URGENT")
    assert res.exact
    got = {
        r["o_orderkey"]
        for r in ds2.scanner(spark, prefilter_rowids=res.rowids).select("o_orderkey").collect()
    }
    assert got == _truth(ds2, spark, "o_orderpriority = '1-URGENT'")


def test_zonemap_prunes_but_rechecks(spark, ds):
    ds2 = ds.create_scalar_index(spark, "o_orderkey", "ZONEMAP")
    from lance_spark.indexes.scalar import query_index

    meta = next(i for i in ds2.manifest.indices if i.index_type == "ZONEMAP")
    res = query_index(ds2, spark, meta, "=", 42)
    assert not res.exact and res.fragments is not None
    # pruned scan + recheck filter == truth
    got = {
        r["o_orderkey"]
        for r in ds2.scanner(spark, filter="o_orderkey = 42", fragments=res.fragments)
        .select("o_orderkey")
        .collect()
    }
    assert got == {42}


def test_bloom_membership(spark, ds):
    ds2 = ds.create_scalar_index(spark, "o_custkey", "BLOOMFILTER")
    from lance_spark.indexes.scalar import query_index

    meta = next(i for i in ds2.manifest.indices if i.index_type == "BLOOMFILTER")
    res = query_index(ds2, spark, meta, "=", 7)
    assert not res.exact and res.fragments  # candidate fragments, recheck needed
    got = {
        r["o_orderkey"]
        for r in ds2.scanner(spark, filter="o_custkey = 7", fragments=res.fragments)
        .select("o_orderkey")
        .collect()
    }
    assert got == _truth(ds2, spark, "o_custkey = 7")


def test_ngram_contains(spark, sf_dir, tmp_path):
    from lance_spark.dataset import dataset
    from lance_spark.indexes.scalar import query_index
    from lance_spark.write import write_dataset

    uri = str(tmp_path / "docs_ds")
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    write_dataset(docs.repartition(2), uri, mode="create")
    ds2 = dataset(uri).create_scalar_index(spark, "text", "NGRAM")
    meta = next(i for i in ds2.manifest.indices if i.index_type == "NGRAM")
    res = query_index(ds2, spark, meta, "contains", "spark")
    assert not res.exact  # candidates must recheck contiguity
    got = {
        r["doc_id"]
        for r in ds2.scanner(spark, filter="contains(lower(text), 'spark')", prefilter_rowids=res.rowids)
        .select("doc_id")
        .collect()
    }
    assert got == {
        r["doc_id"] for r in docs.filter(F.lower("text").contains("spark")).select("doc_id").collect()
    }
    # the candidate set is a superset of truth (no false negatives)
    cand = {r["_rowid"] for r in res.rowids.collect()}
    truth_ids = ds2.scanner(spark, filter="contains(lower(text), 'spark')", with_row_id=True)
    assert {r["_rowid"] for r in truth_ids.select("_rowid").collect()} <= cand


def test_label_list(spark, tmp_path):
    from lance_spark.dataset import dataset
    from lance_spark.indexes.scalar import query_index
    from lance_spark.write import write_dataset

    df = None
    import pyspark.sql.types as T

    spark_df = spark.createDataFrame(
        [(1, ["red", "blue"]), (2, ["blue"]), (3, ["green", "red"]), (4, [])],
        T.StructType(
            [
                T.StructField("id", T.LongType()),
                T.StructField("tags", T.ArrayType(T.StringType())),
            ]
        ),
    )
    uri = str(tmp_path / "labels_ds")
    write_dataset(spark_df, uri, mode="create")
    ds2 = dataset(uri).create_scalar_index(spark, "tags", "LABEL_LIST")
    meta = next(i for i in ds2.manifest.indices if i.index_type == "LABEL_LIST")

    any_hit = query_index(ds2, spark, meta, "array_has_any", ["red", "green"])
    got = {
        r["id"]
        for r in ds2.scanner(spark, prefilter_rowids=any_hit.rowids).select("id").collect()
    }
    assert got == {1, 3}

    all_hit = query_index(ds2, spark, meta, "array_has_all", ["red", "blue"])
    got = {
        r["id"]
        for r in ds2.scanner(spark, prefilter_rowids=all_hit.rowids).select("id").collect()
    }
    assert got == {1}


def test_scan_with_index_splits_filter(spark, ds):
    """Conjuncts covered by indexes become probes; the rest stays as the
    refine filter — end result must equal the plain filtered scan."""
    ds2 = ds.create_scalar_index(spark, "o_totalprice", "BTREE")
    ds2 = ds2.create_scalar_index(spark, "o_orderpriority", "BITMAP")
    pred = "o_totalprice > 250000 AND o_orderpriority = '5-LOW' AND o_custkey % 2 = 0"
    got = {r["o_orderkey"] for r in ds2.scan_with_index(spark, pred).select("o_orderkey").collect()}
    assert got == _truth(ds2, spark, pred)
    assert got  # non-trivial

    # drop_index removes it from the manifest
    ds3 = ds2.drop_index(next(i.name for i in ds2.manifest.indices if i.index_type == "BITMAP"))
    assert all(i.index_type != "BITMAP" for i in ds3.manifest.indices)


def test_or_tree_filter_split(spark, ds):
    """OR of two indexed predicates → union of rowid sets; result equals the
    plain filtered scan (expression.rs OR-tree extraction)."""
    ds2 = ds.create_scalar_index(spark, "o_totalprice", "BTREE")
    ds2 = ds2.create_scalar_index(spark, "o_orderpriority", "BITMAP")
    pred = "o_totalprice > 400000 OR o_orderpriority = '1-URGENT'"
    got = {r["o_orderkey"] for r in ds2.scan_with_index(spark, pred).select("o_orderkey").collect()}
    assert got == _truth(ds2, spark, pred) and got

    from lance_spark.indexes.scalar import split_filter

    res, refine = split_filter(ds2, spark, pred)
    assert res is not None and res.exact and refine is None  # fully answered


def test_mixed_tree_with_opaque_branch(spark, ds):
    """(indexed OR opaque) stays a refine filter; indexed AND sibling still
    prunes. Result must always equal the plain scan."""
    ds2 = ds.create_scalar_index(spark, "o_totalprice", "BTREE")
    pred = "o_totalprice BETWEEN 100000 AND 300000 AND (o_custkey % 7 = 0 OR o_orderpriority = '2-HIGH')"
    got = {r["o_orderkey"] for r in ds2.scan_with_index(spark, pred).select("o_orderkey").collect()}
    assert got == _truth(ds2, spark, pred) and got

    from lance_spark.indexes.scalar import split_filter

    res, refine = split_filter(ds2, spark, pred)
    assert res is not None and res.rowids is not None  # BETWEEN probe used
    assert refine is not None  # opaque OR branch forces recheck


def test_in_and_not_leaves(spark, ds):
    ds2 = ds.create_scalar_index(spark, "o_orderpriority", "BITMAP")
    pred = "o_orderpriority IN ('1-URGENT', '3-MEDIUM') AND NOT (o_custkey = 1)"
    got = {r["o_orderkey"] for r in ds2.scan_with_index(spark, pred).select("o_orderkey").collect()}
    assert got == _truth(ds2, spark, pred) and got


def test_json_index_lookup(spark, sf_dir, tmp_path):
    """JSON index (json.rs:55): BTree over an extracted path; exact rowid
    sets for eq and range queries match a direct json-path filter."""
    import lance_spark as ls
    from lance_spark.indexes.scalar import query_index
    from lance_spark.write import ROWID_COL
    from pyspark.sql import functions as F

    events = spark.read.parquet(f"{sf_dir}/events.parquet").drop("ts")
    ds = ls.write_dataset(events.repartition(3), str(tmp_path / "ev"))
    ds = ds.create_scalar_index(spark, "props", "JSON", params={"path": "$.k", "value_type": "long"})
    meta = next(i for i in ds.manifest.indices if i.index_type == "JSON")
    assert meta.params["path"] == "$.k"

    base = ds.to_df(spark, with_row_id=True).withColumn(
        "k", F.get_json_object("props", "$.k").cast("long")
    )
    for op, val, pred in [
        ("=", 42, F.col("k") == 42),
        ("between", (10, 20), F.col("k").between(10, 20)),
        (">", 90, F.col("k") > 90),
    ]:
        res = query_index(ds, spark, meta, op, val)
        assert res.exact
        got = {r[0] for r in res.rowids.select(ROWID_COL).collect()}
        want = {r[0] for r in base.filter(pred).select(ROWID_COL).collect()}
        assert got == want and got


def test_index_covers_appended_fragments(spark, sf_dir, tmp_path):
    """Fragments appended AFTER an index build must still appear in index-
    accelerated results (scanner.rs coverage split): rowid indexes union a
    flat branch over the uncovered tail, fragment-prune indexes retain it."""
    import lance_spark as ls
    from lance_spark.indexes.scalar import query_index

    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    lo, hi = orders.limit(1000), orders.subtract(orders.limit(1000))
    ds = ls.write_dataset(lo.repartition(2), str(tmp_path / "cov"))
    ds = ds.create_scalar_index(spark, "o_totalprice", "BTREE")
    ds = ds.create_scalar_index(spark, "o_orderpriority", "BITMAP")
    ds = ds.create_scalar_index(spark, "o_orderkey", "ZONEMAP")
    ds = ds.insert(hi.repartition(2))  # appended, NOT indexed

    covered = {i.index_type: set(i.fragment_ids) for i in ds.manifest.indices}
    current = {f.id for f in ds.manifest.fragments}
    assert all(cov < current for cov in covered.values())  # tail exists

    # BTREE: exact result must include appended matches
    meta = next(i for i in ds.manifest.indices if i.index_type == "BTREE")
    res = query_index(ds, spark, meta, "between", (100000.0, 150000.0))
    got = {
        r["o_orderkey"]
        for r in ds.scanner(spark, prefilter_rowids=res.rowids).select("o_orderkey").collect()
    }
    assert got == _truth(ds, spark, "o_totalprice BETWEEN 100000.0 AND 150000.0")

    # BITMAP
    meta = next(i for i in ds.manifest.indices if i.index_type == "BITMAP")
    res = query_index(ds, spark, meta, "=", "1-URGENT")
    got = {
        r["o_orderkey"]
        for r in ds.scanner(spark, prefilter_rowids=res.rowids).select("o_orderkey").collect()
    }
    assert got == _truth(ds, spark, "o_orderpriority = '1-URGENT'")

    # ZONEMAP: uncovered fragments must stay in the scan set
    meta = next(i for i in ds.manifest.indices if i.index_type == "ZONEMAP")
    some_key = ds.to_df(spark).orderBy(F.desc("o_orderkey")).limit(1).collect()[0]["o_orderkey"]
    res = query_index(ds, spark, meta, "=", some_key)
    got = {
        r["o_orderkey"]
        for r in ds.scanner(spark, filter=f"o_orderkey = {some_key}", fragments=res.fragments)
        .select("o_orderkey").collect()
    }
    assert got == {some_key}

    # whole scan_with_index path
    pred = "o_totalprice > 200000.0 AND o_orderpriority = '5-LOW'"
    got = {r["o_orderkey"] for r in ds.scan_with_index(spark, pred).select("o_orderkey").collect()}
    assert got == _truth(ds, spark, pred) and got


def test_bloom_probe_matches_build_representation(spark, ds, tmp_path):
    """A bloom probe must hash the literal through the SAME cast chain the
    build used: an int literal against a double column must not silently
    prune fragments containing matches (a bloom false NEGATIVE)."""
    from lance_spark.indexes.scalar import query_index, scan_with_index

    ds2 = ds.create_scalar_index(spark, "o_totalprice", "BLOOMFILTER", name="bf_price")
    meta = next(i for i in ds2.manifest.indices if i.name == "bf_price")
    assert meta.params["value_type"] == "double"
    # a real double value, probed as an int literal
    v = float(ds2.to_df(spark).select("o_totalprice").first()[0])
    iv = int(v)
    if iv == v:  # synthesize an exact-int price if none natural
        probe_val = iv
    else:
        probe_val = v
    res = query_index(ds2, spark, meta, "=", probe_val)
    want_frags = {
        r[0]
        for r in ds2.to_df(spark, with_row_id=True)
        .filter(F.col("o_totalprice") == probe_val)
        .select(F.shiftright("_rowid", 32))
        .distinct()
        .collect()
    }
    assert want_frags <= set(res.fragments)
    got = {
        r["o_orderkey"]
        for r in scan_with_index(ds2, spark, f"o_totalprice = {probe_val}")
        .select("o_orderkey").collect()
    }
    assert got == _truth(ds2, spark, f"o_totalprice = {probe_val}")


def test_filter_grammar_edges_fall_back_to_refine(spark, ds):
    """Filters outside the index grammar must degrade to the refine scan,
    never to a truncated/garbled index answer: trailing operators after a
    parenthesized group, quoted commas inside IN lists, sub-gram needles."""
    from lance_spark.indexes.scalar import scan_with_index, split_filter

    ds2 = ds.create_scalar_index(spark, "o_orderkey", "BTREE", name="bt_key")
    # trailing comparison after a group: parser must refuse (res None)
    sql = "(o_orderkey = 5) = (o_custkey < 0)"
    res, refine = split_filter(ds2, spark, sql)
    assert res is None and refine == sql
    got = {r["o_orderkey"] for r in scan_with_index(ds2, spark, sql).select("o_orderkey").collect()}
    assert got == _truth(ds2, spark, sql)

    # quoted comma inside an IN list: leaf must parse quote-aware (and the
    # whole scan must not crash)
    ds3 = ds2.create_scalar_index(spark, "o_orderpriority", "BITMAP", name="bm_prio")
    sql2 = "o_orderpriority IN ('1-URGENT', '2,HIGH')"
    got2 = {
        r["o_orderkey"]
        for r in scan_with_index(ds3, spark, sql2).select("o_orderkey").collect()
    }
    assert got2 == _truth(ds3, spark, sql2)


def test_ngram_short_needle_refuses(spark, sf_dir, tmp_path):
    """contains(needle shorter than n) must raise (the gram probe would
    under-include) — the filter splitter then runs the flat recheck."""
    import lance_spark as ls
    from lance_spark.indexes.scalar import query_index

    uri = str(tmp_path / "ng")
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(200)
    ls.write_dataset(docs, uri, mode="create")
    ds = ls.dataset(uri).create_scalar_index(spark, "text", "NGRAM")
    meta = next(i for i in ds.manifest.indices if i.index_type == "NGRAM")
    with pytest.raises(ValueError, match="shorter than the gram"):
        query_index(ds, spark, meta, "contains", "ab")
    # at-n needle still answers
    res = query_index(ds, spark, meta, "contains", "tab")
    assert res.rowids is not None


def test_bitmap_refuses_contains(spark, ds):
    from lance_spark.indexes.scalar import query_index

    ds2 = ds.create_scalar_index(spark, "o_orderpriority", "BITMAP", name="bm_c")
    meta = next(i for i in ds2.manifest.indices if i.name == "bm_c")
    with pytest.raises(ValueError, match="BITMAP cannot answer"):
        query_index(ds2, spark, meta, "contains", "URGENT")


def test_exact_index_preferred_over_inexact(spark, ds):
    """With both a ZONEMAP and a BTREE on one column, split_filter must pick
    the BTREE (exact rowid semijoin, no refine) regardless of creation order."""
    from lance_spark.indexes.scalar import split_filter

    ds2 = ds.create_scalar_index(spark, "o_custkey", "ZONEMAP", name="zm_cust")
    ds2 = ds2.create_scalar_index(spark, "o_custkey", "BTREE", name="bt_cust")
    res, refine = split_filter(ds2, spark, "o_custkey = 7")
    assert res is not None and res.exact and refine is None and res.rowids is not None


def test_rebuild_does_not_clobber_committed_build(spark, sf_dir, tmp_path):
    """optimize_indices' scalar rebuild writes a FRESH versioned build dir:
    the previously committed version still reads its own build (time travel),
    and cleanup reclaims superseded builds once unreferenced."""
    import os
    from datetime import timedelta

    import lance_spark as ls
    from lance_spark.indexes.scalar import query_index

    uri = str(tmp_path / "vb")
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    ls.write_dataset(orders.limit(400).repartition(2), uri, mode="create")
    ds = ls.dataset(uri).create_scalar_index(spark, "o_orderkey", "BTREE")
    meta0 = next(i for i in ds.manifest.indices if i.index_type == "BTREE")
    v0, path0 = ds.version, meta0.path
    ds.insert(orders.subtract(orders.limit(400)))
    ds = ls.dataset(uri).optimize_indices(spark)
    meta1 = next(i for i in ds.manifest.indices if i.index_type == "BTREE")
    assert meta1.path != path0  # fresh build dir, old one untouched
    assert os.path.isdir(os.path.join(uri, path0))
    # the OLD version still answers from its own build
    old = ls.dataset(uri).checkout_version(v0)
    old_meta = next(i for i in old.manifest.indices if i.index_type == "BTREE")
    assert old_meta.path == path0
    res = query_index(old, spark, old_meta, "<", 50)
    assert res.exact and res.rowids.count() > 0
    # cleanup drops the old manifests → the superseded build reclaims
    ds.cleanup_old_versions(older_than=timedelta(0), delete_unverified=True)
    assert not os.path.isdir(os.path.join(uri, path0))
    assert os.path.isdir(os.path.join(uri, meta1.path))

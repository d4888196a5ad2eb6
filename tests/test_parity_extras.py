"""Parity extras: prefiltered/fast ANN, optimize_indices, branches, shards,
include_deleted_rows."""

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def emb_ds(spark, sf_dir, tmp_path_factory):
    from lance_spark.dataset import dataset
    from lance_spark.write import write_dataset

    uri = str(tmp_path_factory.mktemp("extras") / "emb")
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    write_dataset(emb.repartition(2), uri, mode="create")
    return dataset(uri).create_index(
        spark, "embedding", index_type="IVF_PQ", num_partitions=8, metric="l2"
    )


def test_nearest_with_prefilter(spark, emb_ds, sf_dir):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    q = [float(x) for x in emb.filter("vec_id = 9").first()["embedding"]]
    res = emb_ds.nearest(
        spark, "embedding", q, k=5, nprobes=8, refine_factor=20, filter="label = 2"
    ).collect()
    assert len(res) == 5
    assert all(r["label"] == 2 for r in res)  # prefilter restricts candidates
    # matches brute force over the filtered subset
    from lance_spark.operators.knn import knn_bruteforce

    truth = [
        r["vec_id"]
        for r in knn_bruteforce(emb.filter("label = 2"), "embedding", q, k=5, metric="l2").collect()
    ]
    assert [r["vec_id"] for r in res] == truth


def test_fast_search_skips_tail(spark, emb_ds, sf_dir):
    from lance_spark.dataset import dataset

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    q = [float(x) for x in emb.filter("vec_id = 2").first()["embedding"]]
    extra = spark.createDataFrame([(900001, q, 0)], schema=emb.schema)
    emb_ds.insert(extra)
    ds2 = dataset(emb_ds.uri)
    fast = {r["vec_id"] for r in ds2.nearest(spark, "embedding", q, k=3, nprobes=8, fast_search=True).collect()}
    slow = {r["vec_id"] for r in ds2.nearest(spark, "embedding", q, k=3, nprobes=8).collect()}
    assert 900001 not in fast and 900001 in slow


def test_optimize_indices_recovers_coverage(spark, emb_ds):
    from lance_spark.dataset import dataset

    ds = dataset(emb_ds.uri)  # has the appended fragment from the test above
    meta = ds.manifest.indices[0]
    all_fids = {f.id for f in ds.manifest.fragments}
    assert not set(meta.fragment_ids) >= all_fids  # stale after append
    ds2 = ds.optimize_indices(spark)
    meta2 = ds2.manifest.indices[0]
    assert set(meta2.fragment_ids) >= {f.id for f in ds2.manifest.fragments}


def test_branches(spark, sf_dir, tmp_path):
    from lance_spark.dataset import dataset
    from lance_spark.write import write_dataset

    uri = str(tmp_path / "b")
    region = spark.read.parquet(f"{sf_dir}/region.parquet")
    ds = write_dataset(region, uri)
    ds.create_branch("stable")
    ds2 = ds.delete(spark, "r_regionkey >= 3")
    assert dataset(uri, branch="stable").count_rows() == 5
    assert dataset(uri).count_rows() == 3
    ds2.update_branch("stable", ds2.version)
    assert dataset(uri, branch="stable").count_rows() == 3
    assert "stable" in ds2.branches()
    ds2.delete_branch("stable")
    assert "stable" not in dataset(uri).branches()


def test_shard_partition(spark, sf_dir, tmp_path):
    from lance_spark.dataset import dataset
    from lance_spark.write import write_dataset

    uri = str(tmp_path / "s");
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    ds = write_dataset(orders.repartition(4), uri)
    parts = [ds.shard(spark, 2, i).select("o_orderkey") for i in range(2)]
    union = parts[0].unionByName(parts[1])
    assert union.count() == orders.count()
    assert parts[0].join(parts[1], "o_orderkey", "inner").count() == 0  # disjoint


def test_include_deleted_rows(spark, sf_dir, tmp_path):
    from lance_spark.dataset import dataset
    from lance_spark.write import write_dataset

    uri = str(tmp_path / "d")
    region = spark.read.parquet(f"{sf_dir}/region.parquet")
    ds = write_dataset(region, uri).delete(spark, "r_regionkey = 0")
    assert ds.scanner(spark).count() == 4
    assert ds.scanner(spark, include_deleted_rows=True).count() == 5


def test_pyarrow_expression_filters(spark, sf_dir, tmp_path):
    """scanner(filter=<pyarrow expression>) parity with the reference
    (dataset.py:4307 accepts pyarrow compute expressions)."""
    import pyarrow.compute as pc

    import lance_spark as ls
    from lance_spark.dataset import arrow_filter_to_sql

    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    ds = ls.write_dataset(orders, str(tmp_path / "pa"))

    cases = [
        (pc.field("o_orderkey") > 100, "o_orderkey > 100"),
        (
            (pc.field("o_orderkey") > 100) & (pc.field("o_orderpriority") == "1-URGENT"),
            "o_orderkey > 100 AND o_orderpriority = '1-URGENT'",
        ),
        (~(pc.field("o_orderkey") < 50), "NOT (o_orderkey < 50)"),
        (pc.field("o_custkey").isin([1, 2, 3]), "o_custkey IN (1, 2, 3)"),
        (pc.field("o_orderstatus").is_valid(), "o_orderstatus IS NOT NULL"),
        (
            (pc.field("o_totalprice") >= 1000.5) | (pc.field("o_custkey") != 7),
            "o_totalprice >= 1000.5 OR o_custkey != 7",
        ),
    ]
    for pa_expr, sql in cases:
        got = ds.scanner(spark, filter=pa_expr).count()
        want = ds.scanner(spark, filter=sql).count()
        assert got == want, f"{pa_expr} -> {arrow_filter_to_sql(pa_expr)}"

    import pytest as _pytest

    with _pytest.raises(ValueError, match="unsupported pyarrow expression"):
        arrow_filter_to_sql(pc.ascii_upper(pc.field("o_orderstatus")) == "X")


def test_substrait_expression_filters(spark, sf_dir, tmp_path):
    """scanner(filter=<Substrait ExtendedExpression bytes>) — third filter
    input form, mirroring rust/lance-datafusion/src/substrait.rs: eq /
    range / compound filters roundtrip through serialize → scanner and
    match the SQL-string plan's row counts."""
    import pyarrow.compute as pc
    import pyarrow.substrait as pa_substrait

    import lance_spark as ls
    from lance_spark.dataset import substrait_filter_to_sql

    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    ds = ls.write_dataset(orders, str(tmp_path / "sub"))
    schema = ds.to_arrow_schema() if hasattr(ds, "to_arrow_schema") else None
    if schema is None:
        import pyarrow.parquet as pq
        import glob

        schema = pq.read_schema(glob.glob(f"{sf_dir}/orders.parquet")[0])

    cases = [
        (pc.field("o_orderpriority") == "1-URGENT", "o_orderpriority = '1-URGENT'"),
        (pc.field("o_orderkey") > 100, "o_orderkey > 100"),
        (
            (pc.field("o_totalprice") >= 1000.5) & (pc.field("o_custkey") < 50),
            "o_totalprice >= 1000.5 AND o_custkey < 50",
        ),
    ]
    for pa_expr, sql in cases:
        buf = pa_substrait.serialize_expressions([pa_expr], ["filter"], schema)
        got = ds.scanner(spark, filter=buf.to_pybytes()).count()  # raw bytes
        got_buf = ds.scanner(spark, filter=buf).count()  # pyarrow Buffer
        want = ds.scanner(spark, filter=sql).count()
        assert got == got_buf == want, f"{sql}: {substrait_filter_to_sql(buf)}"
        assert want > 0  # the filters actually select something

    import pytest as _pytest

    # two expressions in one message is ambiguous -> loud error
    buf2 = pa_substrait.serialize_expressions(
        [cases[0][0], cases[1][0]], ["a", "b"], schema
    )
    with _pytest.raises(ValueError, match="exactly one"):
        substrait_filter_to_sql(buf2)

    # regression: a string literal that LOOKS like a field reference must
    # stay a literal — FieldPath substitution only applies outside quotes
    trap = pa_substrait.serialize_expressions(
        [pc.field("o_orderpriority") == "FieldPath(1)"], ["f"], schema
    )
    sql = substrait_filter_to_sql(trap)
    assert "'FieldPath(1)'" in sql, sql
    assert ds.scanner(spark, filter=trap).count() == 0  # no such priority


def test_json_function_family(spark):
    """Named json_get_* shims (reference udf.rs:18-28 registry parity)."""
    from lance_spark.functions import json as J
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [
            (1, '{"k": 42, "s": "hi", "f": 1.5, "b": true, "arr": [1, 2, 3]}'),
            (2, '{"s": "bye", "arr": []}'),
            (3, "not json at all"),
        ],
        ["id", "j"],
    )
    c = F.col("j")
    out = df.select(
        "id",
        J.json_get_int(c, "$.k").alias("k"),
        J.json_get_string(c, "$.s").alias("s"),
        J.json_get_float(c, "$.f").alias("f"),
        J.json_get_bool(c, "$.b").alias("b"),
        J.json_exists(c, "$.k").alias("has_k"),
        J.json_array_contains(c, "$.arr", 2).alias("has2"),
        J.json_array_length(c, "$.arr").alias("alen"),
        J.json_extract_with_type(c, "$.k", "string").alias("ks"),
    ).collect()
    r = {row["id"]: row for row in out}
    assert (r[1]["k"], r[1]["s"], r[1]["f"], r[1]["b"]) == (42, "hi", 1.5, True)
    assert r[1]["has_k"] and r[1]["has2"] and r[1]["alen"] == 3 and r[1]["ks"] == "42"
    assert r[2]["k"] is None and not r[2]["has_k"] and not r[2]["has2"] and r[2]["alen"] == 0
    assert r[3]["k"] is None and r[3]["alen"] is None

    # r13 review pins: bool probes render as JSON text ('true', not
    # str(True)='True'); null-valued keys EXIST; null elements are
    # findable and don't turn a miss into NULL
    df2 = spark.createDataFrame(
        [(1, '{"z": null, "arr": [true, null, 2.5], "o": {"k": null}}')],
        ["id", "j"],
    )
    c2 = F.col("j")
    row = df2.select(
        J.json_exists(c2, "$.z").alias("e_null"),
        J.json_exists(c2, "$.missing").alias("e_miss"),
        J.json_exists(c2, "$.o.k").alias("e_nested"),
        J.json_array_contains(c2, "$.arr", True).alias("c_true"),
        J.json_array_contains(c2, "$.arr", False).alias("c_false"),
        J.json_array_contains(c2, "$.arr", 2.5).alias("c_f"),
        J.json_array_contains(c2, "$.arr", None).alias("c_null"),
    ).collect()[0]
    assert row["e_null"] and not row["e_miss"] and row["e_nested"]
    assert row["c_true"] and row["c_false"] is False and row["c_f"]
    assert row["c_null"]


def test_to_table_primary_read_call(spark, sf_dir, tmp_path):
    """ds.to_table(...) parity (reference dataset.py:666-899): pyarrow Table
    out, filter/columns/limit applied, nearest dict supported."""
    import lance_spark as ls

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    ds = ls.write_dataset(emb, str(tmp_path / "tt"))

    t = ds.to_table(spark, columns=["vec_id"], filter="vec_id < 50", limit=10)
    assert t.num_rows == 10 and t.column_names == ["vec_id"]
    assert max(t.column("vec_id").to_pylist()) < 50

    qvec = [float(x) for x in emb.filter("vec_id = 3").first()["embedding"]]
    nt = ds.to_table(
        spark, nearest={"column": "embedding", "q": qvec, "k": 5, "use_index": False}
    )
    assert nt.num_rows == 5 and "_distance" in nt.column_names
    ids = nt.column("vec_id").to_pylist()
    assert 3 in ids  # the query vector itself is its own nearest neighbor


def test_fragment_config_parity_methods(spark, sf_dir, tmp_path):
    import lance_spark as ls

    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    ds = ls.write_dataset(orders.repartition(3), str(tmp_path / "par"))

    frags = ds.get_fragments()
    assert len(frags) == 3 and ds.get_fragment(frags[0].id).id == frags[0].id
    assert ds.get_fragment(99999) is None
    assert not ds.has_index()

    ds = ds.update_config({"owner": "pipeline-a", "tier": "gold"})
    assert ds.config["owner"] == "pipeline-a"
    ds = ds.delete_config_keys("tier")
    assert "tier" not in ds.config and ds.config["owner"] == "pipeline-a"

    ds = ds.replace_schema_metadata({"description": "orders snapshot"})
    assert ds.schema_metadata() == {"description": "orders snapshot"}

    old = ds.version
    ds2 = ds.insert(orders.limit(5))
    assert ds.checkout_latest().version == ds2.version > old

    ds.create_branch("dev")
    assert ds.checkout_branch("dev").version == ds.version


def test_full_text_search_entry(spark, sf_dir, tmp_path):
    import lance_spark as ls
    from lance_spark.indexes.inverted import create_inverted_index

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    ds = ls.write_dataset(docs, str(tmp_path / "ftsds"))

    flat = ds.full_text_search(spark, "table scan", k=5).collect()
    assert len(flat) == 5 and "_score" in flat[0].asDict()

    ds = create_inverted_index(ds, spark, "text")
    idx = ds.full_text_search(spark, "table scan", k=5).collect()
    assert {r["doc_id"] for r in idx} == {r["doc_id"] for r in flat}


def test_optimize_namespace_and_pandas_write(spark, tmp_path):
    import pandas as pd

    import lance_spark as ls

    pdf = pd.DataFrame({"k": list(range(100)), "v": [f"s{i}" for i in range(100)]})
    ds = ls.write_dataset(pdf, str(tmp_path / "pd"))
    assert ds.count_rows() == 100
    ds = ds.delete(spark, "k % 2 = 0")
    out = ds.optimize.compact_files(spark, target_rows_per_fragment=1000)
    assert out.count_rows() == 50
    assert all(f.num_deleted_rows == 0 for f in out.manifest.fragments)

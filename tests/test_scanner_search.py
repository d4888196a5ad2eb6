"""scanner(nearest=...) / scanner(full_text_query=...) routing, prefilter
semantics, IO-knob acceptance, and commit_batch bulk commits.
"""

import pytest
from pyspark.sql import functions as F

import lance_spark as ls
from lance_spark import manifest as mf
from lance_spark.write import write_fragments


@pytest.fixture()
def emb_ds(spark, sf_dir, tmp_path):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").limit(300)
    return ls.write_dataset(emb, str(tmp_path / "emb")), emb


def test_scanner_nearest_routes_knn(spark, emb_ds):
    ds, emb = emb_ds
    q = emb.select("embedding").first()[0]
    got = ds.scanner(spark, nearest={"column": "embedding", "q": q, "k": 5})
    rows = got.collect()
    assert len(rows) == 5
    assert "_distance" in got.columns
    assert rows[0]["_distance"] <= rows[-1]["_distance"]
    # the query vector itself is the nearest hit
    assert abs(rows[0]["_distance"]) < 1e-5


def test_scanner_nearest_prefilter_vs_postfilter(spark, emb_ds):
    ds, emb = emb_ds
    q = emb.select("embedding").first()[0]
    lab = emb.first()["label"]
    pre = ds.scanner(
        spark, nearest={"column": "embedding", "q": q, "k": 5},
        filter=f"label != {lab}", prefilter=True,
    ).collect()
    assert len(pre) == 5 and all(r["label"] != lab for r in pre)
    post = ds.scanner(
        spark, nearest={"column": "embedding", "q": q, "k": 5},
        filter=f"label != {lab}", prefilter=False,
    ).collect()
    # post-filter trims the k hits — the self-match is removed
    assert len(post) < 5 or all(r["label"] != lab for r in post)


def test_scanner_nearest_projection_and_rowid(spark, emb_ds):
    ds, emb = emb_ds
    q = emb.select("embedding").first()[0]
    got = ds.scanner(
        spark, columns=["vec_id"], nearest={"column": "embedding", "q": q, "k": 3},
        with_row_id=True,
    )
    assert set(got.columns) == {"vec_id", "_distance", "_rowid"}
    assert got.count() == 3


def test_scanner_full_text_query(spark, sf_dir, tmp_path):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(200)
    ds = ls.write_dataset(docs, str(tmp_path / "docs"))
    got = ds.scanner(spark, full_text_query="table scan", limit=7)
    rows = got.collect()
    assert 0 < len(rows) <= 7
    assert "_score" in got.columns
    scores = [r["_score"] for r in rows]
    assert scores == sorted(scores, reverse=True)


def test_scanner_accepts_io_knobs(spark, emb_ds):
    ds, _ = emb_ds
    # reference call-sites pass these; they must be accepted (no-op here)
    df = ds.scanner(
        spark, batch_size=512, batch_readahead=8, fragment_readahead=2,
        io_buffer_size=1 << 20, scan_in_order=True, use_stats=True,
        strict_batch_size=False, use_scalar_index=True, limit=3,
    )
    assert df.count() == 3


def test_commit_batch_merges_appends(spark, sf_dir, tmp_path):
    uri = str(tmp_path / "cb")
    nation = spark.read.parquet(f"{sf_dir}/nation.parquet")
    ds = ls.write_dataset(nation, uri)
    v0 = ds.version
    base = mf.reserve_fragment_ids(uri, 8)
    f1 = write_fragments(nation.limit(5).repartition(1), uri, base)
    f2 = write_fragments(nation.limit(3).repartition(1), uri, base + 4)
    res = ls.commit_batch(
        uri,
        [{"operation": "append", "fragments": f1},
         {"operation": "append", "fragments": f2}],
        properties={"__lance_commit_message": "bulk"},
    )
    ds2 = res["dataset"]
    # ONE new version for both transactions (plus the reserve commit)
    assert ds2.version == v0 + 2
    assert ds2.count_rows() == nation.count() + 8
    assert len(res["merged"]["fragments"]) == 2
    tx = ds2.read_transaction(ds2.version)
    assert tx["transaction_properties"]["__lance_commit_message"] == "bulk"
    with pytest.raises(NotImplementedError):
        ls.commit_batch(uri, [{"operation": "delete", "fragments": []}])


def test_scanner_fts_prefilter_and_postfilter(spark, sf_dir, tmp_path):
    """Review regression: scanner(full_text_query=..., filter=...) must
    honor the filter in BOTH prefilter modes."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(300)
    ds = ls.write_dataset(docs, str(tmp_path / "fp"))
    lang = docs.first()["lang"]
    pre = ds.scanner(
        spark, full_text_query="table scan", filter=f"lang = '{lang}'",
        prefilter=True, limit=8,
    ).collect()
    assert pre and all(r["lang"] == lang for r in pre)
    post = ds.scanner(
        spark, full_text_query="table scan", filter=f"lang = '{lang}'",
        prefilter=False, limit=8,
    ).collect()
    assert all(r["lang"] == lang for r in post)


def test_sql_udf_registry_registers_everything(spark):
    """Review regression: one colliding DDL must not abort the rest —
    contains_tokens and the json family all resolve in SQL."""
    from lance_spark.functions.json import register_sql_functions

    assert register_sql_functions(spark) == []
    row = spark.sql("""
        SELECT contains_tokens('Table scan time', 'scan') a,
               json_get_int('{"k": 3}', '$.k') b,
               json_path_array_length('{"a": [1,2]}', '$.a') c,
               json_exists('{"k": 3}', '$.x') d
    """).first()
    assert (row["a"], row["b"], row["c"], row["d"]) == (True, 3, 2, False)

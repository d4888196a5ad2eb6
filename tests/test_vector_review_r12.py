"""Pins for the r12 adversarial review of indexes/vector.py (core paths):
NULLS-LAST distance ranking, torn-delta dedup on the single-query routes,
string-id quantized refine, the no-index metric contract, and the
num_sub_vectors divisibility ValueError."""

import json
import os
import shutil

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    return spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))


def test_zero_vector_null_distance_ranks_last(spark, emb, tmp_path):
    """A zero-norm embedding (failed-embedding row) yields NULL cosine
    distance; it must rank LAST, not become everyone's rank-1 neighbor
    (asc is NULLS FIRST in Spark — the r12 review's top finding)."""
    import lance_spark as ls

    uri = str(tmp_path / "zv")
    dim = len(emb.first()["embedding"])
    corpus = emb.limit(50).select("vec_id", "embedding").union(
        spark.createDataFrame(
            [(999_999, [0.0] * dim)], "vec_id long, embedding array<double>"
        ).select("vec_id", F.col("embedding").cast("array<float>"))
    )
    ds = ls.write_dataset(corpus, uri)
    ds = ds.create_index(
        spark, "embedding", index_type="IVF_FLAT", num_partitions=2, metric="cosine"
    )
    q = [float(x) for x in emb.first()["embedding"]]
    res = ds.nearest(spark, "embedding", q, k=5, nprobes=2).collect()
    assert len(res) == 5
    assert all(r["vec_id"] != 999_999 for r in res), "zero vector entered top-k"
    assert all(r["_distance"] is not None for r in res)

    # bulk route: ann_join must enforce the same contract
    from lance_spark.indexes.vector import ann_join, build_ivf

    idx = build_ivf(
        corpus, "embedding", "vec_id", str(tmp_path / "zvi"),
        num_partitions=2, metric="cosine", index_type="IVF_FLAT",
    )
    queries = emb.limit(3).select("vec_id", "embedding")
    got = ann_join(spark, idx, queries, "embedding", "vec_id", k=5, nprobes=2)
    assert got.filter("id = 999999").count() == 0
    assert got.filter("_distance IS NULL").count() == 0


def test_ann_search_duplicate_segment_single_query(spark, emb, tmp_path):
    """The r12 ann_join hardening's single-query siblings: with the same id
    visible in TWO code segments, ann_search on IVF_FLAT and on IVF_PQ
    (ADC + local refine) still returns k distinct ids."""
    from lance_spark.indexes.vector import IvfIndex, ann_search, build_ivf

    corpus = emb.limit(200).select("vec_id", "embedding")
    q = [float(x) for x in emb.first()["embedding"]]
    for itype, kw in (("IVF_FLAT", {}), ("IVF_PQ", {"num_sub_vectors": 8})):
        uri = str(tmp_path / f"dup_{itype}")
        idx = build_ivf(
            corpus, "embedding", "vec_id", uri, num_partitions=2,
            metric="cosine", index_type=itype, **kw,
        )
        shutil.copytree(os.path.join(uri, "codes"), os.path.join(uri, "codes_vdup"))
        meta = json.load(open(os.path.join(uri, "meta.json")))
        meta["segments"] = list(meta.get("segments") or ["codes"]) + ["codes_vdup"]
        json.dump(meta, open(os.path.join(uri, "meta.json"), "w"))
        torn = IvfIndex(uri)
        res = ann_search(spark, torn, q, k=5, nprobes=2, refine_factor=4).collect()
        ids = [r["id"] for r in res]
        assert len(ids) == len(set(ids)) == 5, f"{itype}: {ids}"


def test_quantized_refine_string_ids(spark, emb, tmp_path):
    """build_ivf accepts any id column; the quantized local refine must not
    assume int ids (r12 review: int(ids[i]) crashed at first query)."""
    from lance_spark.indexes.vector import ann_search, build_ivf

    corpus = emb.limit(100).select(
        F.concat(F.lit("doc-"), F.col("vec_id")).alias("doc"), "embedding"
    )
    idx = build_ivf(
        corpus, "embedding", "doc", str(tmp_path / "sid"), num_partitions=2,
        metric="cosine", index_type="IVF_PQ", num_sub_vectors=8,
    )
    q = [float(x) for x in emb.first()["embedding"]]
    res = ann_search(spark, idx, q, k=3, nprobes=2, refine_factor=4).collect()
    assert len(res) == 3
    assert all(isinstance(r["id"], str) and r["id"].startswith("doc-") for r in res)


def test_nearest_metric_contract(spark, emb, tmp_path):
    """With no index, nearest defaults to the reference's flat-search L2
    (scanner.rs:1074) — the old silent cosine fallback mis-ranked l2
    corpora; an explicit metric conflicting with an existing index
    raises."""
    import lance_spark as ls

    uri = str(tmp_path / "nm")
    ds = ls.write_dataset(emb.limit(50).select("vec_id", "embedding"), uri)
    q = [float(x) for x in emb.first()["embedding"]]
    default = [(r["vec_id"], round(r["_distance"], 6))
               for r in ds.nearest(spark, "embedding", q, k=3).collect()]
    explicit = [(r["vec_id"], round(r["_distance"], 6))
                for r in ds.nearest(spark, "embedding", q, k=3, metric="l2").collect()]
    assert default == explicit and len(default) == 3
    ds2 = ds.create_index(
        spark, "embedding", index_type="IVF_FLAT", num_partitions=2, metric="cosine"
    )
    with pytest.raises(ValueError, match="conflicts"):
        ds2.nearest(spark, "embedding", q, k=3, metric="l2")
    assert len(ds2.nearest(spark, "embedding", q, k=3, metric="cosine").collect()) == 3


def test_build_ivf_num_sub_vectors_divisibility_raises(spark, emb, tmp_path):
    from lance_spark.indexes.vector import build_ivf

    with pytest.raises(ValueError, match="divisible"):
        build_ivf(
            emb.limit(50).select("vec_id", "embedding"), "embedding", "vec_id",
            str(tmp_path / "bad"), num_partitions=2, metric="cosine",
            index_type="IVF_PQ", num_sub_vectors=7,  # dim 64 % 7 != 0
        )

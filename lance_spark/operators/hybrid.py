"""Hybrid search: BM25 + vector retrieval fused with Reciprocal Rank
Fusion (RRF, Cormack et al. 2009: score = Σ 1/(k + rank)).

The reference core exposes FTS and vector search separately (its DB layer
fuses them); a training-data/retrieval pipeline needs the fusion operator
itself. Plan shape: each branch is its own top-k (bounded), ranks are
assigned over ≤k rows (a single-partition window BOUNDED BY K, never by
the corpus), and the fuse is a k-row full-outer join — all driver-light.

Determinism: both branches round their scores BEFORE ranking and break
ties on id, so Spark and the SQL oracle rank identically.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def rrf_fuse(
    rankings: list[DataFrame],
    id_col: str = "id",
    k: int = 60,
    top: int = 10,
) -> DataFrame:
    """Fuse ranked lists — each input has (id_col, ``rank`` starting at 1).
    Returns (id, rrf) for the ``top`` ids by fused score, ties by id."""
    if not rankings:
        raise ValueError("rrf_fuse needs at least one ranking")  # r12 review
    contribs = [
        df.select(F.col(id_col).alias("id"), (1.0 / (k + F.col("rank"))).alias("c"))
        for df in rankings
    ]
    allc = contribs[0]
    for c in contribs[1:]:
        allc = allc.unionByName(c)
    return (
        allc.groupBy("id")
        .agg(F.round(F.sum("c"), 6).alias("rrf"))
        .orderBy(F.desc("rrf"), "id")
        .limit(top)
    )


def rank_per_group(
    df: DataFrame,
    score_col: str,
    group_col: str = "query_id",
    id_col: str = "id",
    ascending: bool = False,
    keep: int | None = None,
) -> DataFrame:
    """Per-group rank (1-based) by (score, id) — the deterministic ranking
    both RRF branches need. Score must already be ROUNDED by the caller so
    engines rank identically; ties break on ``id_col``."""
    order = [
        F.asc(score_col) if ascending else F.desc(score_col),
        F.asc(id_col),
    ]
    w = Window.partitionBy(group_col).orderBy(*order)
    out = df.withColumn("rank", F.row_number().over(w))
    return out if keep is None else out.filter(F.col("rank") <= keep)


def rrf_fuse_grouped(
    rankings: list[DataFrame],
    group_col: str = "query_id",
    id_col: str = "id",
    k: int = 60,
    top: int = 10,
) -> DataFrame:
    """RRF per group: fuse ranked lists carrying (group, id, rank) into the
    ``top`` ids per group by Σ 1/(k + rank) → (group, id, rrf). The bulk
    counterpart of ``rrf_fuse`` — one union + one map-side-combinable
    groupBy + one per-group window; nothing corpus-sized, nothing
    driver-sized."""
    if not rankings:
        raise ValueError("rrf_fuse_grouped needs at least one ranking")  # r12
    contribs = [
        df.select(
            F.col(group_col).alias("g"),
            F.col(id_col).alias("id"),
            (1.0 / (k + F.col("rank"))).alias("c"),
        )
        for df in rankings
    ]
    allc = contribs[0]
    for c in contribs[1:]:
        allc = allc.unionByName(c)
    fused = allc.groupBy("g", "id").agg(F.round(F.sum("c"), 6).alias("rrf"))
    w = Window.partitionBy("g").orderBy(F.desc("rrf"), F.asc("id"))
    return (
        fused.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= top)
        .drop("__rn")
        .withColumnRenamed("g", group_col)
        .withColumnRenamed("id", id_col)
    )


def hybrid_search(
    corpus: DataFrame,
    text_col: str,
    vec_col: str,
    id_col: str,
    terms: list[str],
    query_vec: list[float],
    k_each: int = 50,
    rrf_k: int = 60,
    top: int = 10,
) -> DataFrame:
    """BM25 branch + cosine-KNN branch → RRF. Returns (id, rrf)."""
    from lance_spark.operators.fts import bm25_search
    from lance_spark.operators.knn import knn_bruteforce

    text = bm25_search(corpus, text_col, id_col, terms, k=k_each).select(
        F.col(id_col).alias("id"), F.round("_score", 4).alias("s")
    )
    wt = Window.orderBy(F.desc("s"), "id")  # ≤ k_each rows: bounded window
    text = text.select("id", F.row_number().over(wt).alias("rank"))

    vec = knn_bruteforce(corpus, vec_col, query_vec, k=k_each, metric="cosine", id_col=id_col).select(
        F.col(id_col).alias("id"), F.round("_distance", 4).alias("d")
    )
    wv = Window.orderBy("d", "id")
    vec = vec.select("id", F.row_number().over(wv).alias("rank"))

    return rrf_fuse([text, vec], k=rrf_k, top=top)

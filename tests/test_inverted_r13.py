"""r13 optimization pins for the inverted-index build internals."""

import pytest
from pyspark.sql import functions as F


def test_positional_postings_shuffle_free_and_doclens_equivalent(spark, tmp_path):
    """(1) The postings build plans with NO Exchange — (token, id) groups
    are row-local, so the old posexplode → groupBy(token, id) shuffle must
    never come back. (2) Values match the groupBy form exactly, including
    tf counts and ascending positions. (3) The doclens-from-postings
    derivation used by create_inverted_index restores zero-token docs at
    dl=0 and equals size(toks) everywhere else."""
    from lance_spark.indexes.inverted import _positional_postings

    df = spark.createDataFrame(
        [
            (1, "the cat sat on the mat the cat"),
            (2, "dog dog dog"),
            (3, "???"),  # tokenizes to zero tokens
            (4, None),  # null text: excluded entirely
            (5, "cat mat"),
        ],
        "doc_id long, text string",
    )
    postings, doclens = _positional_postings(df, "text", "doc_id", "simple")

    plan = postings._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )
    assert "Exchange" not in plan, "postings build must stay shuffle-free"

    got = {
        (r["token"], r["id"]): (r["tf"], list(r["positions"]))
        for r in postings.collect()
    }
    # reference: the old groupBy form
    from lance_spark.functions.text import tokenizer_expr

    toks = df.filter(F.col("text").isNotNull()).select(
        F.col("doc_id").alias("id"), tokenizer_expr("simple")(F.col("text")).alias("toks")
    )
    ref = {
        (r["token"], r["id"]): (r["tf"], list(r["positions"]))
        for r in (
            toks.select("id", F.posexplode("toks").alias("pos", "token"))
            .groupBy("token", "id")
            .agg(
                F.count("*").alias("tf"),
                F.sort_array(F.collect_list("pos")).alias("positions"),
            )
        ).collect()
    }
    assert got == ref
    assert got[("the", 1)] == (3, [0, 4, 6])

    # doclens-from-postings (the create_inverted_index derivation)
    pdir = str(tmp_path / "postings")
    postings.write.parquet(pdir)
    dl_sum = (
        spark.read.parquet(pdir).groupBy("id").agg(F.sum("tf").alias("__dl"))
    )
    derived = {
        r["id"]: r["dl"]
        for r in df.filter(F.col("text").isNotNull())
        .select(F.col("doc_id").alias("id"))
        .join(dl_sum, "id", "left")
        .select("id", F.coalesce(F.col("__dl"), F.lit(0)).cast("int").alias("dl"))
        .collect()
    }
    direct = {r["id"]: r["dl"] for r in doclens.collect()}
    assert derived == direct == {1: 8, 2: 3, 3: 0, 5: 2}

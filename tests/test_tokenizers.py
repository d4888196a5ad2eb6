"""Tokenizer parity tests (tokenizer.rs:43-80 LanceTokenizer configs):
unicode/CJK tokenization, english stemming, and the driver-side stem mirror
that query-term normalization depends on."""

import pytest
from pyspark.sql import functions as F


def _run(spark, col_fn, text):
    return spark.createDataFrame([(text,)], ["t"]).select(col_fn(F.col("t")).alias("o")).first()["o"]


def test_unicode_tokenizer_cjk(spark):
    from lance_spark.functions.text import tokenize, tokenize_unicode

    # the hardwired [^a-z]+ tokenizer drops CJK entirely; unicode must not
    assert _run(spark, tokenize, "你好世界") == []
    assert _run(spark, tokenize_unicode, "你好世界 hello") == ["你", "好", "世", "界", "hello"]
    assert _run(spark, tokenize_unicode, "Español: café!") == ["español", "café"]
    assert _run(spark, tokenize_unicode, "データ分析 123abc") == [
        "デ", "ー", "タ", "分", "析", "123abc"
    ]


@pytest.mark.parametrize(
    ("word", "stem"),
    [
        ("tables", "table"),
        ("running", "run"),
        ("stopped", "stop"),
        ("flies", "fly"),
        ("classes", "class"),
        ("quickly", "quick"),
        ("scanning", "scan"),
        ("joins", "join"),
        ("class", "class"),   # ss untouched
        ("was", "wa"),        # rule-consistent, not linguistically perfect
        ("ing", "ing"),       # too short to strip
    ],
)
def test_stem_word_rules(word, stem):
    from lance_spark.functions.text import stem_word

    assert stem_word(word) == stem


def test_stem_token_matches_stem_word(spark):
    """The Column-expression stemmer and the driver-side mirror MUST agree —
    query terms are stemmed by the mirror against postings stemmed by the
    expression."""
    from lance_spark.functions.text import stem_word, tokenize_stemmed

    text = (
        "tables were scanning quickly and joins stopped flies classes "
        "running analysis bodies caresses ponies ties carries feed agreed"
    )
    got = _run(spark, tokenize_stemmed, text)
    expect = [stem_word(w) for w in text.split()]
    assert got == expect


def test_stemmed_index_query_roundtrip(spark, sf_dir, tmp_path):
    """Surface-form query terms hit stemmed postings end-to-end."""
    import lance_spark as ls
    from lance_spark.indexes.inverted import create_inverted_index, match_query

    docs = spark.createDataFrame(
        [(0, "he was running fast"), (1, "she runs daily"), (2, "nothing here")],
        ["doc_id", "text"],
    )
    ds = ls.write_dataset(docs, str(tmp_path / "stem"))
    ds = create_inverted_index(ds, spark, "text", tokenizer="english_stem")
    hits = match_query(ds, spark, ["runs"], k=10)
    base = ds.to_df(spark, with_row_id=True).select("_rowid", "doc_id")
    got = {r["doc_id"] for r in hits.join(base, hits.id == base._rowid).collect()}
    assert got == {0, 1}


def test_tokenizer_registry_rejects_unknown():
    from lance_spark.functions.text import tokenizer_expr

    with pytest.raises(ValueError, match="unknown tokenizer"):
        tokenizer_expr("klingon")

"""fts(...) as a table function inside ds.sql() SQL text — parity with the
reference's UDTF (rust/lance/src/dataset/udtf.rs:130-220) — plus the FTS
JSON query grammar (rust/lance-index/src/scalar/inverted/parser.rs).
"""

import pytest
from pyspark.sql import functions as F

import lance_spark as ls
from lance_spark.query import (
    BooleanQuery,
    BoostQuery,
    FullTextOperator,
    MatchQuery,
    MultiMatchQuery,
    Occur,
    PhraseQuery,
    from_json,
)


@pytest.fixture()
def docs_ds(spark, sf_dir, tmp_path):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(200)
    return ls.write_dataset(docs, str(tmp_path / "docs")), docs


def test_fts_sql_matches_dataframe_api(spark, docs_ds):
    ds, _docs = docs_ds
    via_sql = ds.sql(
        spark,
        """SELECT doc_id, _score
           FROM fts('{"match": {"column": "text", "terms": "table scan"}}')
           ORDER BY _score DESC, doc_id LIMIT 5""",
    ).collect()
    via_df = (
        ds.full_text_search(spark, MatchQuery("table scan", "text"), k=None)
        .select("doc_id", "_score")
        .orderBy(F.desc("_score"), F.asc("doc_id"))
        .limit(5)
        .collect()
    )
    assert [(r["doc_id"], r["_score"]) for r in via_sql] == [
        (r["doc_id"], r["_score"]) for r in via_df
    ]


def test_fts_sql_plain_terms_and_where(spark, docs_ds):
    ds, _ = docs_ds
    out = ds.sql(
        spark,
        "SELECT doc_id, lang, _score FROM fts('table scan') WHERE lang = 'en' "
        "ORDER BY _score DESC, doc_id LIMIT 5",
    ).collect()
    assert 0 < len(out) <= 5
    assert all(r["lang"] == "en" for r in out)


def test_fts_sql_reference_arg_shapes(spark, docs_ds):
    """(table_name, query, options) — the full udtf.rs:177-201 arg shape,
    options JSON carrying with_row_id."""
    ds, _ = docs_ds
    out = ds.sql(
        spark,
        """SELECT _rowid, doc_id FROM
           fts('docs', '{"match": {"column": "text", "terms": "table"}}',
               '{"with_row_id": true}')
           ORDER BY doc_id LIMIT 3""",
    )
    assert set(out.columns) == {"_rowid", "doc_id"}
    assert out.count() == 3


def test_fts_sql_join_against_dataset_view(spark, docs_ds):
    """The fts view composes with the dataset view in one SQL text."""
    ds, _ = docs_ds
    out = ds.sql(
        spark,
        """SELECT d.doc_id, f._score
           FROM fts('{"match": {"column": "text", "terms": "table scan"}}') f
           JOIN dataset d ON f.doc_id = d.doc_id
           ORDER BY f._score DESC, d.doc_id LIMIT 4""",
    )
    assert out.count() == 4


def test_fts_sql_literal_not_rewritten(spark, docs_ds):
    ds, _ = docs_ds
    out = ds.sql(spark, "SELECT 'fts(x)' AS s FROM dataset LIMIT 1").collect()
    assert out[0]["s"] == "fts(x)"
    # double-quoted string literals are literals too in Spark SQL
    out_dq = ds.sql(spark, 'SELECT "fts(y)" AS s FROM dataset LIMIT 1').collect()
    assert out_dq[0]["s"] == "fts(y)"
    # and an identifier merely ending in fts is untouched
    out2 = ds.sql(spark, "SELECT length('abcfts') AS n FROM dataset LIMIT 1").collect()
    assert out2[0]["n"] == 6
    # backticked identifiers containing the token survive
    out3 = ds.sql(
        spark, "SELECT doc_id AS `fts(col)` FROM dataset LIMIT 1"
    ).collect()
    assert out3[0]["fts(col)"] is not None


def test_fts_sql_bad_args_raise(spark, docs_ds):
    ds, _ = docs_ds
    with pytest.raises(ValueError, match="fts"):
        ds.sql(spark, "SELECT * FROM fts()")
    with pytest.raises(ValueError, match="unterminated"):
        ds.sql(spark, "SELECT * FROM fts('oops")


def test_from_json_match_full_options():
    q = from_json(
        '{"match": {"column": "text", "terms": "catch fish", "boost": 2.0,'
        ' "fuzziness": 1, "max_expansions": 10, "operator": "And",'
        ' "prefix_length": 2}}'
    )
    assert isinstance(q, MatchQuery)
    assert q.column == "text" and q.query == "catch fish"
    assert q.boost == 2.0 and q.fuzziness == 1 and q.max_expansions == 10
    assert q.operator is FullTextOperator.AND and q.prefix_length == 2


def test_from_json_phrase_boost_boolean():
    q = from_json(
        '{"boolean": {"must": [{"phrase": {"column": "text", "terms": "a b", "slop": 1}}],'
        ' "should": [{"match": {"terms": "c"}}],'
        ' "must_not": [{"match": {"terms": "d"}}]}}'
    )
    assert isinstance(q, BooleanQuery)
    occs = [o for o, _ in q.queries]
    assert occs == [Occur.MUST, Occur.SHOULD, Occur.MUST_NOT]
    assert isinstance(q.queries[0][1], PhraseQuery)
    assert q.queries[0][1].slop == 1

    b = from_json(
        '{"boost": {"positive": {"match": {"terms": "x"}},'
        ' "negative": {"match": {"terms": "y"}}, "negative_boost": 0.3}}'
    )
    assert isinstance(b, BoostQuery) and b.negative_boost == 0.3


def test_from_json_multi_match():
    q = from_json(
        '{"multi_match": {"match_queries": ['
        '{"column": "title", "terms": "spark", "boost": 2.0},'
        '{"column": "text", "terms": "spark"}]}}'
    )
    assert isinstance(q, MultiMatchQuery)
    assert q.columns == ["title", "text"] and q.boosts == [2.0, 1.0]


def test_from_json_rejects_garbage():
    with pytest.raises(ValueError):
        from_json('{"match": {}, "phrase": {}}')
    with pytest.raises(ValueError):
        from_json('{"wat": {"terms": "x"}}')


def test_fts_sql_table_name_plus_plain_terms(spark, docs_ds):
    """ADVICE r5 regression: ('docs', 'scan join') — table name plus a
    plain-terms query — must parse as (table, query), not crash trying to
    json.loads('scan join') as options."""
    ds, _ = docs_ds
    out = ds.sql(
        spark,
        "SELECT doc_id, _score FROM fts('docs', 'table scan') "
        "ORDER BY _score DESC, doc_id LIMIT 3",
    ).collect()
    assert 0 < len(out) <= 3
    # equivalent to the table-less call
    base = ds.sql(
        spark,
        "SELECT doc_id, _score FROM fts('table scan') "
        "ORDER BY _score DESC, doc_id LIMIT 3",
    ).collect()
    assert [(r["doc_id"], r["_score"]) for r in out] == [
        (r["doc_id"], r["_score"]) for r in base
    ]


def test_fts_sql_backslash_escaped_quote_not_rewritten(spark, docs_ds):
    r"""ADVICE r5 regression: a string literal containing a backslash-escaped
    quote followed by fts( — 'don\'t fts(' — must survive untouched."""
    ds, _ = docs_ds
    out = ds.sql(
        spark, r"SELECT 'don\'t fts(x)' AS s FROM dataset LIMIT 1"
    ).collect()
    assert out[0]["s"] == "don't fts(x)"


def test_fts_sql_bad_options_clear_error(spark, docs_ds):
    """A second arg that is malformed JSON starting with { raises a clear
    ValueError naming the accepted shapes, not a bare JSONDecodeError."""
    ds, _ = docs_ds
    with pytest.raises(ValueError, match="accepted call"):
        ds.sql(spark, "SELECT * FROM fts('table scan', '{oops')")


def test_fts_sql_plain_terms_with_options(spark, docs_ds):
    """Review regression: ('plain terms', '{options}') must parse as
    (query, options), not (table_name, query)."""
    ds, _ = docs_ds
    out = ds.sql(
        spark,
        """SELECT _rowid, doc_id FROM fts('table scan', '{"with_row_id": true}')
           ORDER BY doc_id LIMIT 3""",
    )
    assert set(out.columns) == {"_rowid", "doc_id"} and out.count() == 3


# ------------------------------------------------------------------
# parser-located call sites (round 7): the rewrite is driven by Spark's
# own SQL parser (UnresolvedTableValuedFunction origins), so comments,
# CTEs, subqueries, and arbitrary quoting are handled structurally.


def test_fts_sql_inside_comment_not_rewritten(spark, docs_ds):
    ds, _ = docs_ds
    out = ds.sql(
        spark,
        "SELECT doc_id -- fts('nope') in a line comment\n"
        "FROM dataset /* fts('also nope') */ LIMIT 1",
    ).collect()
    assert len(out) == 1


def test_fts_sql_in_cte(spark, docs_ds):
    ds, _ = docs_ds
    out = ds.sql(
        spark,
        """WITH hits AS (SELECT doc_id, _score FROM fts('table scan'))
           SELECT doc_id, _score FROM hits ORDER BY _score DESC, doc_id LIMIT 5""",
    ).collect()
    assert len(out) == 5
    assert all(r["_score"] > 0 for r in out)


def test_fts_sql_in_subquery_predicate(spark, docs_ds):
    ds, _ = docs_ds
    out = ds.sql(
        spark,
        """SELECT doc_id FROM dataset
           WHERE doc_id IN (SELECT doc_id FROM fts('table scan'))""",
    ).collect()
    direct = ds.sql(spark, "SELECT doc_id FROM fts('table scan')").collect()
    assert {r["doc_id"] for r in out} == {r["doc_id"] for r in direct}
    assert out


def test_fts_sql_two_calls_joined(spark, docs_ds):
    ds, _ = docs_ds
    out = ds.sql(
        spark,
        """SELECT a.doc_id, a._score AS s1, b._score AS s2
           FROM fts('table') a JOIN fts('scan') b ON a.doc_id = b.doc_id""",
    ).collect()
    assert out
    assert all(r["s1"] > 0 and r["s2"] > 0 for r in out)


def test_fts_sql_multiline_spacing(spark, docs_ds):
    ds, _ = docs_ds
    out = ds.sql(
        spark,
        "SELECT doc_id\nFROM fts (\n   'table scan'\n  )\nLIMIT 3",
    ).collect()
    assert len(out) == 3


def test_fts_sql_non_literal_arg_raises(spark, docs_ds):
    ds, _ = docs_ds
    with pytest.raises(ValueError, match="literal"):
        ds.sql(spark, "SELECT * FROM fts(doc_id)")


def test_fts_sql_block_comment_containing_paren(spark, docs_ds):
    """A ')' inside a block comment between the last argument and the call's
    real closing paren must not truncate the splice (round-7 advice, low)."""
    ds, _ = docs_ds
    out = ds.sql(
        spark,
        "SELECT doc_id, _score FROM fts('table scan' /* :) tricky */ ) "
        "ORDER BY _score DESC, doc_id LIMIT 3",
    ).collect()
    assert len(out) == 3
    assert all(r["_score"] > 0 for r in out)


def test_fts_sql_line_comment_before_close_paren(spark, docs_ds):
    ds, _ = docs_ds
    out = ds.sql(
        spark,
        "SELECT doc_id FROM fts('table scan' -- :) trailing\n) LIMIT 2",
    ).collect()
    assert len(out) == 2


def test_fts_sql_non_literal_arg_in_cte_raises(spark, docs_ds):
    """The CTE body hangs off innerChildren; the non-literal diagnostic must
    propagate instead of being swallowed into an opaque unresolved-TVF error
    (round-7 advice, medium)."""
    ds, _ = docs_ds
    with pytest.raises(ValueError, match="literal"):
        ds.sql(
            spark,
            "WITH h AS (SELECT * FROM fts(doc_id)) SELECT * FROM h",
        )


class TestFtsFlatReviewR11:
    """Pins for the r11 adversarial review of operators/fts.py."""

    def test_bm25_terms_normalize_like_index(self, spark):
        from lance_spark.operators.fts import bm25_search

        df = spark.createDataFrame(
            [(1, "spark scans tables"), (2, "duck pond")], "id long, text string"
        )
        hits = bm25_search(df, "text", "id", ["spark,"], k=5).collect()
        assert [r["id"] for r in hits] == [1]

    def test_phrase_slop_survives_empty_token_rows(self, spark):
        from lance_spark.operators.fts import phrase_match

        df = spark.createDataFrame(
            [(1, "quick brown fox"), (2, "123 456"), (3, None), (4, "")],
            "id long, text string",
        )
        got = [r["id"] for r in phrase_match(df, "text", "id", "quick brown", slop=1).collect()]
        assert got == [1]
        # punctuation in the phrase normalizes like the document side
        got0 = [r["id"] for r in phrase_match(df, "text", "id", "quick, brown").collect()]
        assert got0 == [1]
        # empty phrase matches NOTHING in either branch
        assert phrase_match(df, "text", "id", "  ", slop=0).count() == 0
        assert phrase_match(df, "text", "id", "  ", slop=1).count() == 0

    def test_multi_match_boost_length_validated(self, spark):
        import pytest

        from lance_spark.operators.fts import multi_match

        df = spark.createDataFrame(
            [(1, "spark", "pond")], "id long, a string, b string"
        )
        with pytest.raises(ValueError, match="boosts"):
            multi_match(df, ["a", "b"], "id", ["spark"], boosts=[1.0])

    def test_fuzzy_match_caps_expansions(self, spark):
        from lance_spark.operators.fts import fuzzy_match

        rows = [(i, f"tok{'abcdefg'[i % 7]} filler") for i in range(30)]
        df = spark.createDataFrame(rows, "id long, text string")
        # max_expansions=1 keeps only the closest vocab token (toka, d=0)
        got = fuzzy_match(df, "text", "id", "toka", fuzziness=2, max_expansions=1)
        hit_ids = {r["id"] for r in got.collect()}
        assert hit_ids == {i for i in range(30) if i % 7 == 0}
        # uncapped, all tokb..tokg (distance 1) match too
        full = fuzzy_match(df, "text", "id", "toka", fuzziness=2)
        assert full.count() == 30

"""INVERTED index tests: index-backed results must equal the flat (unindexed)
search — including after appends (coverage split) and deletes (live gating).
"""

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def docs_ds(spark, sf_dir, tmp_path_factory):
    from lance_spark.dataset import dataset
    from lance_spark.write import write_dataset

    uri = str(tmp_path_factory.mktemp("inv") / "docs")
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    write_dataset(docs.repartition(2), uri, mode="create")
    from lance_spark.indexes.inverted import create_inverted_index

    return create_inverted_index(dataset(uri), spark, "text")


def test_match_equals_flat(spark, sf_dir, docs_ds):
    from lance_spark.indexes.inverted import match_query
    from lance_spark.operators.fts import bm25_search

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    flat = bm25_search(docs, "text", "doc_id", ["table", "scan", "join"], k=10)
    idx = match_query(docs_ds, spark, ["table", "scan", "join"], k=10)
    # _rowid ↔ doc_id mapping: join back through the dataset
    base = docs_ds.to_df(spark, with_row_id=True).select("_rowid", "doc_id")
    idx_docs = idx.join(base, idx.id == base._rowid).select("doc_id", "_score")
    assert sorted(map(tuple, idx_docs.collect())) == sorted(
        (r["doc_id"], r["_score"]) for r in flat.collect()
    )


def test_phrase_positions(spark, docs_ds, sf_dir):
    from lance_spark.indexes.inverted import phrase_query
    from lance_spark.operators.fts import phrase_match

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    flat_ids = {r["doc_id"] for r in phrase_match(docs, "text", "doc_id", "key order").collect()}
    base = docs_ds.to_df(spark, with_row_id=True).select("_rowid", "doc_id")
    idx = phrase_query(docs_ds, spark, "key order")
    idx_ids = {
        r["doc_id"] for r in idx.join(base, idx.id == base._rowid).select("doc_id").collect()
    }
    assert idx_ids == flat_ids and idx_ids  # non-empty at every sf


def test_boolean_and_boost(spark, docs_ds):
    from lance_spark.indexes.inverted import boolean_query, boost_query

    res = boolean_query(
        docs_ds, spark, must=["table"], should=["scan"], must_not=["slow"], k=5
    ).collect()
    assert res and all(r["_score"] > 0 for r in res)

    b = boost_query(docs_ds, spark, positive=["table", "scan"], negative=["slow"], k=5).collect()
    assert b and b[0]["_score"] >= b[-1]["_score"]


def test_append_tail_flat_fallback(spark, docs_ds):
    """Docs appended after index build are found via the flat branch."""
    from lance_spark.dataset import dataset
    from lance_spark.indexes.inverted import match_query

    schema = docs_ds.schema
    row = {f.name: None for f in schema.fields}
    row.update(doc_id=999999, text="zanzibar zanzibar zanzibar unique token storm", lang="en", source="t")
    extra = spark.createDataFrame([Row(**row)], schema=schema)
    docs_ds.insert(extra)
    ds2 = dataset(docs_ds.uri)

    hits = match_query(ds2, spark, ["zanzibar"], k=5)
    base = ds2.to_df(spark, with_row_id=True).select("_rowid", "doc_id")
    ids = {r["doc_id"] for r in hits.join(base, hits.id == base._rowid).select("doc_id").collect()}
    assert ids == {999999}


def test_phrase_slop_indexed_matches_flat(spark, docs_ds):
    """Indexed sloppy phrase (positions walk over postings) ≡ flat walk
    over the token array, for slop 0..3; slop widens monotonically."""
    from lance_spark.indexes.inverted import phrase_query
    from lance_spark.operators.fts import phrase_match

    docs = docs_ds.to_df(spark)
    base = docs_ds.to_df(spark, with_row_id=True).select("_rowid", "doc_id")
    prev = set()
    for slop in (0, 1, 2, 3):
        idx = phrase_query(docs_ds, spark, "key order", slop=slop)
        idx_ids = {
            r["doc_id"] for r in idx.join(base, idx.id == base._rowid).select("doc_id").collect()
        }
        flat_ids = {r[0] for r in phrase_match(docs, "text", "doc_id", "key order", slop=slop).collect()}
        assert idx_ids == flat_ids
        assert prev <= idx_ids
        prev = idx_ids
    assert prev  # widest slop matched something


def test_fuzzy_expansion_cap(spark, docs_ds):
    """max_expansions bounds the driver-side dictionary expansion: a
    pathological (short, high-fuzziness) term over the vocabulary must
    return results from at most N expanded terms, closest-distance-first,
    and the capped result must be a subset of the uncapped one."""
    from lance_spark.indexes.inverted import fuzzy_query

    full = fuzzy_query(docs_ds, spark, "tabl", fuzziness=2, k=50).collect()
    capped = fuzzy_query(docs_ds, spark, "tabl", fuzziness=2, k=50, max_expansions=1).collect()
    assert len(capped) <= len(full)
    # max_expansions=1 keeps only the closest term (distance-then-lex order):
    # every capped hit must also appear in the uncapped result set
    assert {r["id"] for r in capped} <= {r["id"] for r in full}
    # exact term present in vocab -> distance 0 wins under a cap of 1,
    # so capped == plain match on the stemless exact term
    exact = fuzzy_query(docs_ds, spark, "table", fuzziness=2, k=50, max_expansions=1)
    from lance_spark.indexes.inverted import match_query

    plain = match_query(docs_ds, spark, ["table"], k=50)
    assert {(r["id"], r["_score"]) for r in exact.collect()} == {
        (r["id"], r["_score"]) for r in plain.collect()
    }


def test_match_join_equals_per_query_match(spark, sf_dir, tmp_path):
    """match_join's per-query top-k equals match_query run per query on the
    same index (same BM25 stats, same tie rule)."""
    import lance_spark as ls
    from pyspark.sql import functions as F

    from lance_spark.indexes.inverted import (
        create_inverted_index,
        match_join,
        match_query,
    )

    uri = str(tmp_path / "mj")
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    ls.write_dataset(docs.repartition(2), uri, mode="create")
    ds = create_inverted_index(ls.dataset(uri), spark, "text")
    qrows = [(1, "table scan join"), (2, "key order"), (3, "spark data")]
    queries = spark.createDataFrame(qrows, ["qid", "qtext"])
    bulk = {}
    for r in match_join(ds, spark, queries, "qtext", "qid", k=5).collect():
        bulk.setdefault(r["query_id"], []).append((r["_score"], r["id"]))
    for qid, qtext in qrows:
        want = [(r["_score"], r["id"])
                for r in match_query(ds, spark, qtext.split(), k=5).collect()]
        got = sorted(bulk.get(qid, []), key=lambda t: (-t[0], t[1]))
        assert got == want, qid

    # query_vocab_rows hint (zero gate jobs on the hot path): identical
    # results whether the hint keeps the broadcast (small bound) or forces
    # the shuffle plan (bound past the 2M budget)
    base = sorted(
        (r["query_id"], r["id"], r["_score"])
        for r in match_join(ds, spark, queries, "qtext", "qid", k=5).collect()
    )
    for bound in (8, 3_000_000):
        hinted = sorted(
            (r["query_id"], r["id"], r["_score"])
            for r in match_join(
                ds, spark, queries, "qtext", "qid", k=5, query_vocab_rows=bound
            ).collect()
        )
        assert hinted == base, bound


@pytest.fixture(scope="module")
def indexed_docs_ds(spark, sf_dir, tmp_path_factory):
    import lance_spark as ls
    from lance_spark.indexes.inverted import create_inverted_index

    uri = str(tmp_path_factory.mktemp("bulkfts") / "docs")
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    ls.write_dataset(docs.repartition(2), uri, mode="create")
    return create_inverted_index(ls.dataset(uri), spark, "text")


@pytest.mark.parametrize("slop", [0, 1])
def test_phrase_join_equals_per_query_phrase(spark, indexed_docs_ds, slop):
    """phrase_join's matched (query, doc) sets equal phrase_query run per
    query on the same index — the dynamic aggregate-fold walk must replay
    the statically-unrolled per-query walk exactly (incl. slop)."""
    from lance_spark.indexes.inverted import phrase_join, phrase_query

    ds = indexed_docs_ds
    phrases = ["key order", "the table", "scan and join", "data"]
    q = spark.createDataFrame(list(enumerate(phrases)), ["qid", "qtext"])
    bulk = {}
    for r in phrase_join(ds, spark, q, "qtext", "qid", slop=slop).collect():
        bulk.setdefault(r["query_id"], set()).add(r["id"])
    for i, p in enumerate(phrases):
        want = {r["id"] for r in phrase_query(ds, spark, p, slop=slop).collect()}
        assert bulk.get(i, set()) == want, (i, p)


def test_phrase_join_all_empty_queries(spark, indexed_docs_ds):
    """Queries that all tokenize to nothing return a typed EMPTY frame —
    both through phrase_join's early exit and _phrase_ngram_join's own
    defensive branch (which referenced out-of-scope names before r13)."""
    from lance_spark.indexes.inverted import (
        _find, _index_tables, _phrase_ngram_join, phrase_join,
    )

    ds = indexed_docs_ds
    q = spark.createDataFrame([(0, "!!!"), (1, "...")], ["qid", "qtext"])
    out = phrase_join(ds, spark, q, "qtext", "qid", slop=0)
    assert out.count() == 0
    assert set(out.columns) >= {"query_id", "id"}
    # the inner branch directly: empty qtp, no NameError
    meta = _find(ds, None)
    postings, _ = _index_tables(ds, spark, meta)
    qtp = spark.createDataFrame([], "qid long, qpos int, token string")
    inner = _phrase_ngram_join(spark, postings, qtp)
    assert inner.count() == 0 and set(inner.columns) >= {"query_id", "id"}


def test_boolean_join_equals_execute_query(spark, indexed_docs_ds):
    """boolean_join scores with Lucene full-corpus statistics — pinned
    equal to the composable execute_query tree per query (membership AND
    scores). The single-query boolean_query differs by design (it
    renormalizes stats over the must-filtered corpus; see docstring)."""
    from lance_spark.indexes.inverted import boolean_join
    from lance_spark.query import BooleanQuery, MatchQuery, Occur, execute_query

    ds = indexed_docs_ds
    cases = [
        (0, "table", "scan join", "slow"),
        (1, "data", "key value", None),
        (2, None, "scan", "table"),
    ]
    bq = spark.createDataFrame(cases, ["qid", "must", "should", "mustnot"])
    bulk = {}
    rows = boolean_join(
        ds, spark, bq, "qid", must_col="must", should_col="should",
        must_not_col="mustnot", k=None,
    ).collect()
    for r in rows:
        bulk.setdefault(r["query_id"], {})[r["id"]] = round(r["_score"], 4)
    base_df = ds.to_df(spark, with_row_id=True)
    for qid, must, should, mustnot in cases:
        clauses = []
        if must:
            clauses.append((Occur.MUST, MatchQuery(must, "text")))
        if should:
            clauses.append((Occur.SHOULD, MatchQuery(should, "text")))
        if mustnot:
            clauses.append((Occur.MUST_NOT, MatchQuery(mustnot, "text")))
        w = execute_query(
            spark, BooleanQuery(clauses), df=base_df, id_col="_rowid", k=None
        )
        want = {r["id"]: round(r["_score"], 4) for r in w.collect()}
        assert bulk.get(qid, {}) == want, qid


def test_mlt_join_equals_selected_terms_match(spark, indexed_docs_ds):
    """more_like_this_join == (tf·idf term selection) ∘ match_query: the
    bulk plan's per-query top-k equals running match_query with the same
    selected terms per query — selection recomputed here independently
    from raw postings/doclens pulled to pandas."""
    import math

    from pyspark.sql import functions as F

    from lance_spark.indexes.inverted import (
        _index_tables,
        match_query,
        more_like_this_join,
    )

    ds = indexed_docs_ds
    docs = ds.to_df(spark).limit(0)  # schema only; queries come from base
    base = ds.to_df(spark, with_row_id=True)
    queries = base.filter(F.col("_rowid") % 31 == 0).select(
        F.col("_rowid").alias("qid"), "text"
    )
    m = 8
    bulk = {}
    rows = more_like_this_join(
        ds, spark, queries, "text", "qid", k=5, max_query_terms=m
    ).collect()
    for r in rows:
        bulk.setdefault(r["query_id"], []).append((r["_score"], r["id"]))

    # independent selection: pandas over the persisted postings + doclens
    meta = ds.manifest.indices[0]
    postings, doclens = _index_tables(ds, spark, meta)
    df_map = {
        r["token"]: r["df"]
        for r in postings.groupBy("token").agg(F.count("*").alias("df")).collect()
    }
    n_docs = doclens.count()
    import re

    for q in queries.collect():
        toks = [t for t in re.split(r"[^a-z]+", q["text"].lower()) if t]
        tf = {}
        for t in toks:
            tf[t] = tf.get(t, 0) + 1
        scored = [
            (
                round(c * math.log(1 + (n_docs - df_map[t] + 0.5) / (df_map[t] + 0.5)), 6),
                t,
            )
            for t, c in tf.items()
            if t in df_map
        ]
        terms = [t for s, t in sorted(scored, key=lambda x: (-x[0], x[1]))[:m]]
        want = [
            (r["_score"], r["id"]) for r in match_query(ds, spark, terms, k=5).collect()
        ]
        got = sorted(bulk.get(q["qid"], []), key=lambda t: (-t[0], t[1]))
        assert got == want, q["qid"]


def test_mlt_join_retrieves_self_and_df_bounds(spark, indexed_docs_ds):
    """Every query document appears in its own MLT hit set (it contains
    all of its selected terms); df-bound knobs prune terms: an impossible
    min_doc_freq empties the result."""
    from pyspark.sql import functions as F

    from lance_spark.indexes.inverted import more_like_this_join

    ds = indexed_docs_ds
    base = ds.to_df(spark, with_row_id=True)
    queries = base.filter(F.col("_rowid") % 53 == 0).select(
        F.col("_rowid").alias("qid"), "text"
    )
    hits = more_like_this_join(ds, spark, queries, "text", "qid", k=None)
    self_hits = hits.filter(F.col("query_id") == F.col("id")).count()
    assert self_hits == queries.count()
    empty = more_like_this_join(
        ds, spark, queries, "text", "qid", k=5, min_doc_freq=10**9
    )
    assert empty.count() == 0


def test_optimize_delta_inverted_segments(spark, sf_dir, tmp_path):
    """Default optimize on a stale INVERTED index writes a postings delta
    segment for the new fragments only (indexes/inverted.extend_inverted):
    scores are IDENTICAL to the pre-optimize tail-union path (same
    corpus-wide BM25 stats), coverage + segments commit atomically, and a
    second optimize is a no-op."""
    import lance_spark as ls
    from lance_spark.indexes.inverted import create_inverted_index, match_query

    uri = str(tmp_path / "ftsdelta")
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    ls.write_dataset(docs.limit(300), uri, mode="create")
    ds = create_inverted_index(ls.dataset(uri), spark, "text")
    ds.insert(docs.subtract(docs.limit(300)))
    ds = ls.dataset(uri)

    before = [
        (r["id"], r["_score"])
        for r in match_query(ds, spark, ["table", "scan", "join"], k=20).collect()
    ]
    ds = ds.optimize_indices(spark)
    meta = next(i for i in ds.manifest.indices if i.index_type == "INVERTED")
    assert meta.params["segments"] == [".", "seg_v1"]
    assert set(meta.fragment_ids) == {f.id for f in ds.manifest.fragments}
    after = [
        (r["id"], r["_score"])
        for r in match_query(ds, spark, ["table", "scan", "join"], k=20).collect()
    ]
    assert after == before

    v = ds.version
    ds = ds.optimize_indices(spark)  # nothing stale → no-op
    assert ds.version == v
    meta = next(i for i in ds.manifest.indices if i.index_type == "INVERTED")
    assert meta.params["segments"] == [".", "seg_v1"]


def test_optimize_auto_merges_inverted_segments(spark, sf_dir, tmp_path, monkeypatch):
    """Past the auto-merge budget, optimize collapses INVERTED delta
    segments into ONE token-clustered segment (merge_inverted_segments):
    scores identical, coverage unchanged, superseded dirs retired behind
    the grace period (still readable), then reclaimed by the next merge
    once expired — the unbounded-fan-out hazard from VERDICT r9 missing #1."""
    import os

    import lance_spark as ls
    from lance_spark import maintenance
    from lance_spark.indexes.inverted import create_inverted_index, match_query

    monkeypatch.setattr(maintenance, "_AUTO_MERGE_SEGMENTS", 2)
    uri = str(tmp_path / "ftsmerge")
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").orderBy("doc_id").limit(200)
    slices = [docs.filter(f"doc_id % 3 = {i}") for i in range(3)]
    ls.write_dataset(slices[0], uri, mode="create")
    ds = create_inverted_index(ls.dataset(uri), spark, "text")

    ds.insert(slices[1])
    ds = ls.dataset(uri).optimize_indices(spark)
    meta = next(m for m in ds.manifest.indices if m.index_type == "INVERTED")
    assert meta.params["segments"] == [".", "seg_v1"]  # within budget: delta accumulates
    v_deltas = ds.version  # pins ['.', 'seg_v1'] — reclaimed far below

    ds.insert(slices[2])
    ds = ls.dataset(uri).optimize_indices(spark)  # 3 segments > budget 2 → merge
    meta = next(m for m in ds.manifest.indices if m.index_type == "INVERTED")
    assert meta.params["segments"] == ["seg_v3"]
    assert set(meta.fragment_ids) == {f.id for f in ds.manifest.fragments}
    retired = meta.params["retired_segments"]
    base = os.path.join(ds.uri, meta.path)
    # grace period: retired dirs are still on disk for in-flight readers
    for s in retired:
        root = base if s == "." else os.path.join(base, s)
        assert os.path.isdir(os.path.join(root, "postings")), s

    # merged result must score exactly like a fresh rebuild of the corpus
    got = [
        (r["id"], r["_score"])
        for r in match_query(ds, spark, ["table", "scan", "join"], k=20).collect()
    ]
    fresh_uri = str(tmp_path / "ftsfresh")
    ls.write_dataset(ds.to_df(spark), fresh_uri, mode="create")
    fresh = create_inverted_index(ls.dataset(fresh_uri), spark, "text")
    fbase = fresh.to_df(spark, with_row_id=True).select("_rowid", "doc_id")
    gbase = ds.to_df(spark, with_row_id=True).select("_rowid", "doc_id")
    want_docs = sorted(
        (r["doc_id"], r["_score"])
        for r in match_query(fresh, spark, ["table", "scan", "join"], k=20)
        .join(fbase, F.col("id") == F.col("_rowid")).select("doc_id", "_score").collect()
    )
    got_docs = sorted(
        (r["doc_id"], r["_score"])
        for r in match_query(ds, spark, ["table", "scan", "join"], k=20)
        .join(gbase, F.col("id") == F.col("_rowid")).select("doc_id", "_score").collect()
    )
    assert got_docs == want_docs and got

    # expire the grace period: the next merge reclaims the retired dirs
    from lance_spark.indexes import inverted as inv

    monkeypatch.setattr(inv, "_RETIRE_GRACE_SECONDS", -1.0)
    extra = spark.read.parquet(f"{sf_dir}/documents.parquet").orderBy("doc_id").limit(250).subtract(docs)
    ds.insert(extra)
    ds = ls.dataset(uri).optimize_indices(spark)  # → ["seg_v3", "seg_v4"]
    meta = next(m for m in ds.manifest.indices if m.index_type == "INVERTED")
    assert meta.params["segments"] == ["seg_v3", "seg_v4"]
    ds = inv.merge_inverted_segments(ds, spark, meta.name)
    for s in retired:
        root = base if s == "." else os.path.join(base, s)
        assert not os.path.isdir(os.path.join(root, "postings")), s

    # time-travel past the reclaim: v_deltas pins ['.', 'seg_v1'] whose dirs
    # were just reclaimed — the reader must fall back to the latest
    # (superset) segments with the live gate forced, scoring exactly the
    # old version's corpus (flat BM25 over that corpus is the reference)
    from lance_spark.operators.fts import bm25_search

    old = ls.dataset(uri).checkout_version(v_deltas)
    tt = sorted(
        (r["doc_id"], r["_score"])
        for r in match_query(old, spark, ["table", "scan", "join"], k=None)
        .join(
            old.to_df(spark, with_row_id=True).select("_rowid", "doc_id"),
            F.col("id") == F.col("_rowid"),
        )
        .select("doc_id", "_score")
        .collect()
    )
    want_tt = sorted(
        (r["doc_id"], r["_score"])
        for r in bm25_search(
            old.to_df(spark), "text", "doc_id", ["table", "scan", "join"], k=None
        ).collect()
    )
    assert tt == want_tt and tt


def test_merge_reconciles_concurrent_extend(spark, sf_dir, tmp_path):
    """A delta segment committed between a segment-merge's read and its
    commit must SURVIVE in the reconciled list (r11 ADVICE fix): blindly
    committing [merged] would leave that delta's fragments 'covered' with
    no postings — their documents silently vanish from FTS results."""
    import lance_spark as ls
    from lance_spark.indexes import inverted as inv
    from lance_spark.indexes.inverted import create_inverted_index, match_query
    from lance_spark.operators.fts import bm25_search

    uri = str(tmp_path / "ftsrace")
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").orderBy("doc_id").limit(150)
    slices = [docs.filter(f"doc_id % 3 = {i}") for i in range(3)]
    ls.write_dataset(slices[0], uri, mode="create")
    ds = create_inverted_index(ls.dataset(uri), spark, "text")
    ds.insert(slices[1])
    stale = ls.dataset(uri).optimize_indices(spark)  # ['.', 'seg_v1']
    stale_meta = next(m for m in stale.manifest.indices if m.index_type == "INVERTED")
    assert stale_meta.params["segments"] == [".", "seg_v1"]

    # a concurrent optimize lands seg_v2 AFTER the merge's snapshot read
    stale.insert(slices[2])
    ds2 = ls.dataset(uri).optimize_indices(spark)
    meta2 = next(m for m in ds2.manifest.indices if m.index_type == "INVERTED")
    assert meta2.params["segments"] == [".", "seg_v1", "seg_v2"]

    merged = inv.merge_inverted_segments(stale, spark, stale_meta.name)
    meta3 = next(m for m in merged.manifest.indices if m.index_type == "INVERTED")
    segs = meta3.params["segments"]
    assert "seg_v2" in segs, segs  # the concurrent delta survives
    assert "." not in segs and "seg_v1" not in segs
    assert "seg_v2" not in meta3.params["retired_segments"]

    # index-path scores == flat BM25 over the whole corpus (nothing lost,
    # nothing double-counted)
    gbase = merged.to_df(spark, with_row_id=True).select("_rowid", "doc_id")
    got = sorted(
        (r["doc_id"], r["_score"])
        for r in match_query(merged, spark, ["table", "scan", "join"], k=None)
        .join(gbase, F.col("id") == F.col("_rowid"))
        .select("doc_id", "_score")
        .collect()
    )
    want = sorted(
        (r["doc_id"], r["_score"])
        for r in bm25_search(
            merged.to_df(spark), "text", "doc_id", ["table", "scan", "join"], k=None
        ).collect()
    )
    assert got == want and got


@pytest.mark.parametrize("transpositions", [True, False])
def test_fuzzy_join_equals_per_query_fuzzy(spark, indexed_docs_ds, transpositions):
    """fuzzy_join == fuzzy_query per single-term query row: same vocabulary
    expansion rule (cap by (distance, token)), same OR-of-terms scoring.
    Parametrized over Damerau vs plain Levenshtein ('tbale'→'table' is
    1 edit only with transpositions)."""
    from pyspark.sql import functions as F

    from lance_spark.indexes.inverted import fuzzy_join, fuzzy_query

    ds = indexed_docs_ds
    qrows = [(0, "tbale"), (1, "scna"), (2, "jion"), (3, "kye")]
    queries = spark.createDataFrame(qrows, ["qid", "qtext"])
    bulk = {}
    rows = fuzzy_join(
        ds, spark, queries, "qtext", "qid", k=5, fuzziness=1,
        transpositions=transpositions,
    ).collect()
    for r in rows:
        bulk.setdefault(r["query_id"], []).append((r["_score"], r["id"]))
    for qid, term in qrows:
        want = [
            (r["_score"], r["id"])
            for r in fuzzy_query(
                ds, spark, term, fuzziness=1, k=5, transpositions=transpositions
            ).collect()
        ]
        got = sorted(bulk.get(qid, []), key=lambda t: (-t[0], t[1]))
        assert got == want, (qid, term, transpositions)


def test_fuzzy_join_prefix_and_auto_fuzziness(spark, indexed_docs_ds):
    """prefix_length restricts expansion to shared-prefix vocabulary (the
    automaton prefix as an equi-join key); fuzziness=None follows the
    reference's length schedule (len<=2 → 0 edits, so 'ky' matches only
    itself — absent from the vocab → no hits)."""
    from lance_spark.indexes.inverted import fuzzy_join

    ds = indexed_docs_ds
    # 'tbale' → 'table' shares no 1-char prefix ('t' vs 't'... it does);
    # use prefix_length=2: 'tb' vs 'ta' differ → expansion blocked
    q = spark.createDataFrame([(0, "tbale")], ["qid", "qtext"])
    none_hits = fuzzy_join(
        ds, spark, q, "qtext", "qid", k=5, fuzziness=1, prefix_length=2
    ).count()
    assert none_hits == 0
    some_hits = fuzzy_join(
        ds, spark, q, "qtext", "qid", k=5, fuzziness=1, prefix_length=1
    ).count()
    assert some_hits > 0

    q2 = spark.createDataFrame([(0, "ky")], ["qid", "qtext"])
    assert fuzzy_join(ds, spark, q2, "qtext", "qid", k=5, fuzziness=None).count() == 0


def test_boost_join_equals_per_query_boost(spark, indexed_docs_ds):
    """boost_join == boost_query per query row (same BM25 branch scores,
    same demotion arithmetic, positive-match-set membership); a null
    negative cell means no demotion."""
    from pyspark.sql import functions as F

    from lance_spark.indexes.inverted import boost_join, boost_query

    ds = indexed_docs_ds
    cases = [(0, "table scan", "slow"), (1, "key value", "join"), (2, "data", None)]
    q = spark.createDataFrame(cases, ["qid", "pos", "neg"])
    bulk = {}
    for r in boost_join(ds, spark, q, "qid", "pos", "neg", negative_boost=0.3, k=None).collect():
        bulk.setdefault(r["query_id"], {})[r["id"]] = r["_score"]
    for qid, pos, neg in cases:
        want = {
            r["id"]: r["_score"]
            for r in boost_query(
                ds, spark, pos.split(), neg.split() if neg else [],
                negative_boost=0.3, k=None,
            ).collect()
        }
        assert bulk.get(qid, {}) == want, qid


def test_inverted_after_mixed_compaction_no_double_count(spark, sf_dir, tmp_path):
    """Same post-compaction hazard as the IVF path (ADVICE r9 #1): a
    mixed-coverage rewrite leaves an uncovered fragment whose rows are
    partly in the base postings segment. During the window the index
    copies must be masked via the rowid map (shiftright would miss them
    and double tf/doclens → wrong BM25); optimize must anti-join the
    already-indexed ids instead of re-tokenizing them. Rowids are stable
    across all three states, so (id, score) lists must be IDENTICAL."""
    import lance_spark as ls
    from lance_spark.indexes.inverted import _segment_dirs, match_query

    uri = str(tmp_path / "ftsmix")
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    ls.write_dataset(docs.limit(300), uri, mode="create")
    from lance_spark.indexes.inverted import create_inverted_index

    ds = create_inverted_index(ls.dataset(uri), spark, "text")
    ds.insert(docs.subtract(docs.limit(300)))

    terms = ["table", "scan", "join"]
    before = [
        (r["id"], r["_score"])
        for r in match_query(ls.dataset(uri), spark, terms, k=20).collect()
    ]
    ds = ls.dataset(uri).compact_files(spark)
    assert ds.manifest.config.get("rowid_address_style", True) is False
    window = [(r["id"], r["_score"]) for r in match_query(ds, spark, terms, k=20).collect()]
    assert window == before

    ds = ds.optimize_indices(spark)
    meta = next(i for i in ds.manifest.indices if i.index_type == "INVERTED")
    assert set(meta.fragment_ids) == {f.id for f in ds.manifest.fragments}
    import os

    base = os.path.join(ds.uri, meta.path)
    doclens = spark.read.parquet(
        *[os.path.join(d, "doclens") for d in _segment_dirs(base, meta)]
    )
    n = ds.to_df(spark).count()
    assert doclens.count() == n  # one doclens row per live doc — no doubles
    assert doclens.select("id").distinct().count() == n
    after = [(r["id"], r["_score"]) for r in match_query(ds, spark, terms, k=20).collect()]
    assert after == before


class TestInvertedReviewR12:
    """Pins for the r12 adversarial review of indexes/inverted.py."""

    def _mk(self, spark, tmp_path, rows, tokenizer="simple", name="idx"):
        import lance_spark as ls
        from lance_spark.dataset import dataset
        from lance_spark.indexes.inverted import create_inverted_index

        uri = str(tmp_path / name)
        ls.write_dataset(
            spark.createDataFrame(rows, "id long, text string"), uri
        )
        return create_inverted_index(
            dataset(uri), spark, "text", tokenizer=tokenizer
        )

    @staticmethod
    def _doc_ids(ds, spark, hits):
        """hit _rowids → user doc ids."""
        m = {r["_rowid"]: r["id"]
             for r in ds.to_df(spark, with_row_id=True).collect()}
        return {m[r["id"]] for r in hits.collect()}

    def test_phrase_query_mirrors_tokenizer_gaps(self, spark, tmp_path):
        from lance_spark.indexes.inverted import phrase_query

        ds = self._mk(spark, tmp_path, [(1, "the spark-sql engine wins"),
                                        (2, "spark almost sql")])
        ids = self._doc_ids(ds, spark, phrase_query(ds, spark, "spark-sql engine"))
        assert ids == {1}  # 'spark-sql' splits like the index did

    def test_boolean_query_whitespace_case_preserved(self, spark, tmp_path):
        from lance_spark.indexes.inverted import boolean_query

        ds = self._mk(
            spark, tmp_path,
            [(1, "Spark engine"), (2, "spark engine"), (3, "Flink engine")],
            tokenizer="whitespace",
        )
        got = self._doc_ids(ds, spark, boolean_query(ds, spark, must=["Spark"], k=None))
        assert got == {1}  # case-preserving index: 'Spark' != 'spark'
        got2 = self._doc_ids(
            ds, spark,
            boolean_query(ds, spark, must=["engine"], must_not=["Spark"], k=None),
        )
        assert got2 == {2, 3}  # must_not actually excludes

    def test_fuzzy_query_empty_normalization(self, spark, tmp_path):
        from lance_spark.indexes.inverted import fuzzy_query

        ds = self._mk(spark, tmp_path, [(1, "hello world")])
        assert fuzzy_query(ds, spark, "2024").count() == 0  # not IndexError
        assert fuzzy_query(ds, spark, "!!!").count() == 0

    def test_null_text_rows_do_not_skew_bm25_stats(self, spark, tmp_path):
        from lance_spark.indexes.inverted import _index_tables, _find

        ds = self._mk(spark, tmp_path, [(1, "alpha beta"), (2, None), (3, "alpha")])
        _postings, doclens = _index_tables(ds, spark, _find(ds, "text"))
        rows = {r["id"]: r["dl"] for r in doclens.collect()}
        assert all(v >= 0 for v in rows.values()), rows  # no dl=-1 rows
        assert len(rows) == 2  # the NULL doc never entered doclens

    def test_recreate_does_not_overwrite_base_segment(self, spark, tmp_path):
        """Rebuilding an existing index writes a fresh versioned segment
        (old list retired behind the grace window) instead of rewriting
        '.' under pinned readers."""
        import lance_spark as ls
        from lance_spark.dataset import dataset
        from lance_spark.indexes.inverted import create_inverted_index, match_query

        uri = str(tmp_path / "re")
        ls.write_dataset(
            spark.createDataFrame([(1, "alpha beta")], "id long, text string"), uri
        )
        ds = create_inverted_index(dataset(uri), spark, "text")
        meta0 = next(i for i in ds.manifest.indices if i.name == "text_inverted_idx")
        assert (meta0.params.get("segments") or ["."]) == ["."]
        ds = ds.delete(spark, "id = -1")  # bump a version
        ds2 = create_inverted_index(dataset(uri), spark, "text")
        meta1 = next(i for i in ds2.manifest.indices if i.name == "text_inverted_idx")
        segs = meta1.params.get("segments")
        assert segs and segs != ["."] and all(s.startswith("seg_v") for s in segs)
        assert "." in (meta1.params.get("retired_segments") or {})
        assert match_query(ds2, spark, ["alpha"], k=5).count() == 1

    def test_concurrent_merge_loser_aborts(self, spark, tmp_path, monkeypatch):
        """Two merges racing: the loser must drop its segment instead of
        committing a second full copy of the postings (doubled BM25 df)."""
        import lance_spark as ls
        from lance_spark.dataset import dataset
        from lance_spark.indexes.inverted import (
            _find, _index_tables, create_inverted_index, merge_inverted_segments,
        )

        uri = str(tmp_path / "race")
        ls.write_dataset(
            spark.createDataFrame([(1, "alpha")], "id long, text string"), uri
        )
        ds = create_inverted_index(dataset(uri), spark, "text")
        ls.write_dataset(
            spark.createDataFrame([(2, "alpha")], "id long, text string"),
            uri, mode="append",
        )
        # delta-extend so the index has >= 2 segments, but keep them
        # (disable the auto-merge) so both racers start from the same list
        ds = dataset(uri).optimize_indices(spark, num_indices_to_merge=0)
        meta = next(i for i in ds.manifest.indices if i.name == "text_inverted_idx")
        assert len(meta.params.get("segments") or ["."]) >= 2
        # first merge wins
        ds1 = merge_inverted_segments(ds, spark, "text_inverted_idx")
        # second merge STARTED from the stale pre-merge meta: must abort
        ds2 = merge_inverted_segments(ds, spark, "text_inverted_idx")
        meta2 = next(i for i in ds2.manifest.indices if i.name == "text_inverted_idx")
        postings, doclens = _index_tables(ds2, spark, _find(ds2, "text"))
        # each doc appears exactly once — no doubled postings
        assert doclens.count() == 2
        assert postings.filter("token = 'alpha'").count() == 2

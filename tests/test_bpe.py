"""Distributed BPE trainer/encoder vs an independent naive reference.

The reference here recomputes ALL pair statistics from scratch every
merge (no incremental bookkeeping) and encodes with a fresh scan per
step — algorithmically independent of the production implementation's
indexed updates, so agreement pins both the merge order and the encode
loop."""

import hashlib
import re

import pytest
from pyspark.sql import functions as F

EOW = "▁"


def _ref_tokenize(text):
    return [w for w in re.split(r"[^a-z]+", text.lower()) if w]


def _ref_learn(hist, vocab_size, min_pair_count=2):
    """Naive reference BPE: full pair recount per merge."""
    seqs = [[*w, EOW] for w, _ in hist]
    cnts = [c for _, c in hist]
    base = sorted({s for seq in seqs for s in seq})
    merges = []
    while len(base) + len(merges) < vocab_size:
        pairs = {}
        for seq, c in zip(seqs, cnts):
            for p in zip(seq, seq[1:]):
                pairs[p] = pairs.get(p, 0) + c
        if not pairs:
            break
        best_n = max(pairs.values())
        if best_n < min_pair_count:
            break
        a, b = min(p for p, n in pairs.items() if n == best_n)
        for i, seq in enumerate(seqs):
            out, j = [], 0
            while j < len(seq):
                if j < len(seq) - 1 and seq[j] == a and seq[j + 1] == b:
                    out.append(a + b)
                    j += 2
                else:
                    out.append(seq[j])
                    j += 1
            seqs[i] = out
        merges.append((a, b))
    return merges, base


def _ref_encode(word, merges):
    """Reference encode: repeatedly apply the EARLIEST-rank merge whose
    pair occurs, all occurrences left-to-right."""
    s = [*word, EOW]
    while True:
        applied = False
        for a, b in merges:  # rank order
            if any(s[j] == a and s[j + 1] == b for j in range(len(s) - 1)):
                out, j = [], 0
                while j < len(s):
                    if j < len(s) - 1 and s[j] == a and s[j + 1] == b:
                        out.append(a + b)
                        j += 2
                    else:
                        out.append(s[j])
                        j += 1
                s = out
                applied = True
                break
        if not applied:
            return s


CORPUS = [
    (0, "the lower lowest newer new news widening"),
    (1, "lower newer wider the the widest news"),
    (2, "new newer news lowest lowly the widely"),
    (3, "low slow slower slowest wide widen"),
    (4, "newest newly lowness wideness the lows"),
]


@pytest.fixture(scope="module")
def corpus_df(spark):
    return spark.createDataFrame(CORPUS, ["doc_id", "text"])


@pytest.fixture(scope="module")
def trained(spark, corpus_df):
    from lance_spark.operators.bpe import bpe_train

    return bpe_train(corpus_df, "text", vocab_size=60, min_pair_count=2)


def test_merges_match_naive_reference(spark, corpus_df, trained):
    hist = {}
    for _, text in CORPUS:
        for w in _ref_tokenize(text):
            hist[w] = hist.get(w, 0) + 1
    # same cap order as word_histogram: (cnt desc, word asc)
    hist = sorted(hist.items(), key=lambda kv: (-kv[1], kv[0]))
    want_merges, want_base = _ref_learn(hist, vocab_size=60)
    merges_df, vocab_df = trained
    got = [(r["left"], r["right"]) for r in merges_df.orderBy("rank").collect()]
    assert got == want_merges
    vocab = [r["token"] for r in vocab_df.orderBy("id").collect()]
    want_vocab, seen = [], set()
    for t in want_base + [a + b for a, b in want_merges]:
        if t not in seen:
            seen.add(t)
            want_vocab.append(t)
    assert vocab == want_vocab
    assert len(vocab) == len(set(vocab))  # (token → id) is a function
    assert vocab_df.count() <= 60


def test_encode_words_match_reference_and_reconstruct(spark, trained):
    from lance_spark.operators.bpe import bpe_encode_words

    merges_df, _ = trained
    merges = [(r["left"], r["right"]) for r in merges_df.orderBy("rank").collect()]
    words = sorted({w for _, t in CORPUS for w in _ref_tokenize(t)})
    # plus words never seen in training (cold encode path)
    words += ["zebra", "lowzzz", "w"]
    wdf = spark.createDataFrame([(w,) for w in words], ["word"])
    got = {r["word"]: r["pieces"] for r in bpe_encode_words(wdf, merges_df).collect()}
    for w in words:
        assert got[w] == _ref_encode(w, merges), w
        assert "".join(got[w]) == w + EOW, w  # lossless reconstruction


def test_encode_corpus_fingerprint(spark, corpus_df, trained):
    from lance_spark.operators.bpe import bpe_encode

    merges_df, _ = trained
    merges = [(r["left"], r["right"]) for r in merges_df.orderBy("rank").collect()]
    enc = {r["id"]: r for r in bpe_encode(corpus_df, "text", "doc_id", merges_df).collect()}
    for doc_id, text in CORPUS:
        toks = _ref_tokenize(text)
        pieces = [p for w in toks for p in _ref_encode(w, merges)]
        r = enc[doc_id]
        assert r["n_words"] == len(toks)
        assert r["n_pieces"] == len(pieces)
        want_md5 = hashlib.md5(" ".join(pieces).encode()).hexdigest()
        assert r["pieces_md5"] == want_md5


def test_min_pair_count_stops_early(spark):
    from lance_spark.operators.bpe import bpe_train

    # every word unique, every pair count 1 → no merge clears the floor
    df = spark.createDataFrame([(0, "abc defg hij")], ["doc_id", "text"])
    merges, vocab = bpe_train(df, "text", vocab_size=100, min_pair_count=2)
    assert merges.count() == 0
    # base alphabet only
    toks = {r["token"] for r in vocab.collect()}
    assert toks == set("abcdefghij") | {EOW}


def test_save_load_roundtrip_and_uri_guard(spark, corpus_df, trained, tmp_path):
    from lance_spark.operators.bpe import bpe_encode, bpe_load, bpe_save

    merges_df, vocab_df = trained
    uri = str(tmp_path / "bpe_model")
    bpe_save(merges_df, vocab_df, uri)
    m2, v2 = bpe_load(spark, uri)
    assert [(r["left"], r["right"]) for r in m2.orderBy("rank").collect()] == [
        (r["left"], r["right"]) for r in merges_df.orderBy("rank").collect()
    ]
    assert v2.count() == vocab_df.count()
    a = bpe_encode(corpus_df, "text", "doc_id", merges_df).orderBy("id").collect()
    b = bpe_encode(corpus_df, "text", "doc_id", m2).orderBy("id").collect()
    assert a == b
    with pytest.raises(ValueError, match="local path"):
        bpe_save(merges_df, vocab_df, "s3://bucket/model")


def test_histogram_cap_order(spark):
    from lance_spark.operators.bpe import word_histogram

    df = spark.createDataFrame(
        [(0, "aa aa aa bb bb cc dd dd dd dd")], ["doc_id", "text"]
    )
    rows = word_histogram(df, "text", max_words=3).collect()
    got = sorted((r["word"], r["cnt"]) for r in rows)
    assert got == [("aa", 3), ("bb", 2), ("dd", 4)]  # cc dropped by the cap


def test_encode_ids_decode_roundtrip(spark, corpus_df, trained):
    """bpe_encode_ids materializes in-order subword ids; bpe_decode inverts
    them back to the tokenizer-normalized text exactly (BPE is lossless up
    to whitespace normalization). OOV ids decode to nothing."""
    from pyspark.sql import functions as F

    from lance_spark.functions.text import tokenize
    from lance_spark.operators.bpe import bpe_decode, bpe_encode_ids

    merges, vocab = trained
    docs = corpus_df.withColumn("doc_id", F.monotonically_increasing_id())
    ids = bpe_encode_ids(docs, "text", "doc_id", merges, vocab)
    assert ids.filter(F.exists("token_ids", lambda x: x < 0)).count() == 0
    decoded = {r["id"]: r["text"] for r in bpe_decode(ids, "token_ids", "id", vocab).collect()}
    want = {
        r["doc_id"]: " ".join(r["toks"])
        for r in docs.select("doc_id", tokenize(F.col("text")).alias("toks")).collect()
    }
    assert decoded == want and decoded

    # OOV: encode against a truncated vocab → -1 ids, which decode drops
    small_vocab = vocab.limit(3)
    ids2 = bpe_encode_ids(docs, "text", "doc_id", merges, small_vocab)
    assert ids2.filter(F.exists("token_ids", lambda x: x < 0)).count() > 0


class TestBpeReviewR11:
    """Pins for the r11 adversarial review of operators/bpe.py."""

    def test_file_uri_save_load_roundtrip(self, spark, tmp_path):
        from lance_spark.operators.bpe import bpe_load, bpe_save, bpe_train

        df = spark.createDataFrame(
            [(i, "low lower lowest new newer") for i in range(4)], "id long, text string"
        )
        merges, vocab = bpe_train(df, "text", vocab_size=40)
        uri = "file://" + str(tmp_path / "m")
        out = bpe_save(merges, vocab, uri)
        assert not out.startswith("file:")
        import os

        assert os.path.isfile(os.path.join(out, "meta.json"))
        m2, v2 = bpe_load(spark, uri)
        assert m2.count() == merges.count() and v2.count() == vocab.count()
        import pytest

        with pytest.raises(ValueError, match="local path"):
            bpe_save(merges, vocab, "s3://bucket/m")

    def test_decode_tolerates_null_elements(self, spark, tmp_path):
        from lance_spark.operators.bpe import bpe_decode, bpe_train

        df = spark.createDataFrame([(1, "aa bb")], "id long, text string")
        _, vocab = bpe_train(df, "text", vocab_size=20)
        ids_df = spark.createDataFrame(
            [(1, [0, None, 1])], "id long, token_ids array<bigint>"
        )
        got = bpe_decode(ids_df, "token_ids", "id", vocab).collect()
        assert len(got) == 1  # null element skipped, no crash


class TestBpeReviewR12:
    """Pins for the r12 adversarial review of operators/bpe.py."""

    def test_encode_nondeterministic_source_no_row_drop(self, spark):
        """A sample()-derived corpus is evaluated once: the pieces pass and
        the join pass must see the SAME rows (the un-pinned plan silently
        dropped words only present in the second evaluation)."""
        from lance_spark.operators.bpe import bpe_encode, bpe_train

        docs = spark.createDataFrame(
            [(i, f"alpha beta w{i} gamma") for i in range(400)], "id long, text string"
        )
        merges, vocab = bpe_train(docs, "text", vocab_size=64)
        sampled = docs.sample(0.5, seed=None)  # non-deterministic
        out = bpe_encode(sampled, "text", "id", merges)
        rows = out.collect()
        # every encoded doc saw all 4 of its words — none dropped mid-join
        assert rows and all(r["n_words"] == 4 for r in rows)

    def test_encode_words_null_safe(self, spark):
        from lance_spark.operators.bpe import bpe_encode_words, bpe_train

        docs = spark.createDataFrame([("low lower",)], "text string")
        merges, _ = bpe_train(docs, "text", vocab_size=32)
        words = spark.createDataFrame([("low",), (None,)], "word string")
        got = bpe_encode_words(words, merges).collect()
        assert [r["word"] for r in got] == ["low"]

    def test_save_atomic_and_load_validates(self, spark, tmp_path):
        import json
        import os

        from lance_spark.operators.bpe import bpe_load, bpe_save, bpe_train

        docs = spark.createDataFrame([("low lower lowest",)], "text string")
        merges, vocab = bpe_train(docs, "text", vocab_size=40)
        path = str(tmp_path / "model")
        bpe_save(merges, vocab, path)
        m2, v2 = bpe_load(spark, path)
        assert m2.count() == merges.count() and v2.count() == vocab.count()
        assert not [d for d in os.listdir(str(tmp_path)) if "staging" in d or ".old" in d]
        # wrong-format directory fails fast instead of decoding garbage
        bad = str(tmp_path / "nb")
        os.makedirs(bad)
        json.dump({"format": "naive_bayes"}, open(os.path.join(bad, "meta.json"), "w"))
        with pytest.raises(ValueError, match="bpe"):
            bpe_load(spark, bad)
        with pytest.raises(FileNotFoundError, match="meta"):
            bpe_load(spark, str(tmp_path / "missing"))

    def test_save_survives_stale_backup_and_restores_on_failure(
        self, spark, tmp_path, monkeypatch
    ):
        """r13 ADVICE: a stale non-empty `.old-<pid>` dir (crashed earlier
        process, recycled pid) must not break the swap, and a failure
        BETWEEN the two os.replace calls must restore the old model."""
        import os

        from lance_spark.operators.bpe import bpe_load, bpe_save, bpe_train

        docs = spark.createDataFrame([("low lower lowest",)], "text string")
        merges, vocab = bpe_train(docs, "text", vocab_size=40)
        path = str(tmp_path / "model")
        bpe_save(merges, vocab, path)

        # 1. stale backup dir with our pid, non-empty
        stale = f"{path}.old-{os.getpid()}"
        os.makedirs(os.path.join(stale, "junk"))
        open(os.path.join(stale, "junk", "f"), "w").write("x")
        bpe_save(merges, vocab, path)  # must not raise
        assert not os.path.isdir(stale)
        bpe_load(spark, path)

        # 2. failure on the staging->path replace restores the old model
        real_replace = os.replace

        def failing_replace(src, dst):
            if src.endswith(f".staging-{os.getpid()}"):
                raise OSError("injected: crash between the two replaces")
            return real_replace(src, dst)

        monkeypatch.setattr("os.replace", failing_replace)
        with pytest.raises(OSError, match="injected"):
            bpe_save(merges, vocab, path)
        monkeypatch.undo()
        # the ORIGINAL model is back at path and loads
        bpe_load(spark, path)
        assert not [
            d for d in os.listdir(str(tmp_path)) if "staging" in d or ".old" in d
        ]

    def test_file_uri_with_netloc_rejected(self):
        from lance_spark.util import local_path

        with pytest.raises(ValueError, match="ambiguous"):
            local_path("file://tmp/model", "test")
        assert local_path("file:///tmp/model", "test") == "/tmp/model"

    def test_vocab_size_below_alphabet_warns(self, spark):
        import warnings

        from lance_spark.operators.bpe import bpe_train

        docs = spark.createDataFrame([("abcdefghijklmnopqrstuvwxyz",)], "text string")
        with warnings.catch_warnings(record=True) as w:
            warnings.simplefilter("always")
            merges, vocab = bpe_train(docs, "text", vocab_size=10)
        assert any("base alphabet" in str(x.message) for x in w)
        assert merges.count() == 0 and vocab.count() == 27  # 26 + END_OF_WORD

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


def test_german_french_stem_column_matches_driver_mirror(spark):
    """stem_token_de/fr (Column) and stem_word_de/fr (driver) must be
    rule-for-rule identical — query terms only hit stemmed postings if the
    two stay in lockstep."""
    from pyspark.sql import functions as F

    from lance_spark.functions.text import (
        stem_token_de, stem_token_fr, stem_word_de, stem_word_fr,
    )

    words = [
        # German: declensional + derivational + guards
        "tagen", "kinder", "laufend", "hunden", "hoffnung", "freundlich",
        "schnelles", "haus", "rose", "ein", "es",
        # French: mutations + suffixes + endings + guards
        "chevaux", "eaux", "tableaux", "nations", "doucement", "chanteuses",
        "parler", "parlez", "parlent", "tables", "table", "les", "de",
    ]
    df = spark.createDataFrame([(w,) for w in words], ["w"])
    got_de = {r["w"]: r["s"] for r in df.select("w", stem_token_de(F.col("w")).alias("s")).collect()}
    got_fr = {r["w"]: r["s"] for r in df.select("w", stem_token_fr(F.col("w")).alias("s")).collect()}
    for w in words:
        assert got_de[w] == stem_word_de(w), f"de mismatch on {w!r}"
        assert got_fr[w] == stem_word_fr(w), f"fr mismatch on {w!r}"
    # spot semantics: plural/derivation conflation, short-word guards
    assert got_de["tagen"] == "tag" and got_de["hoffnung"] == "hoffn"
    assert got_de["es"] == "es" and got_de["ein"] == "ein"
    assert got_fr["chevaux"] == "cheval" and got_fr["eaux"] == "eau"
    assert got_fr["parler"] == got_fr["parlez"] == got_fr["parlent"] == "parl"
    assert got_fr["de"] == "de"


def test_spanish_stem_column_matches_driver_mirror(spark):
    from pyspark.sql import functions as F

    from lance_spark.functions.text import stem_token_es, stem_word_es

    words = [
        "canciones", "naciones", "rapidamente", "felicidad", "amable",
        "casas", "flores", "luces", "sol", "mes", "los",
    ]
    df = spark.createDataFrame([(w,) for w in words], ["w"])
    got = {r["w"]: r["s"] for r in df.select("w", stem_token_es(F.col("w")).alias("s")).collect()}
    for w in words:
        assert got[w] == stem_word_es(w), f"es mismatch on {w!r}"
    assert got["canciones"] == "cancion" and got["casas"] == "casa"
    assert got["rapidamente"] == "rapida" and got["flores"] == "flor"
    assert got["los"] == "los" and got["mes"] == "mes"  # short-word guards


def test_german_fold_and_index_roundtrip(spark, tmp_path):
    """ß/umlaut folding: surface forms with diacritics hit the folded,
    stemmed postings through the german_stem index."""
    import lance_spark as ls
    from lance_spark.indexes.inverted import create_inverted_index, match_query

    docs = spark.createDataFrame(
        [(0, "die Straßen der Städte"), (1, "ein großes Haus"), (2, "nothing here")],
        ["doc_id", "text"],
    )
    ds = ls.write_dataset(docs, str(tmp_path / "destem"))
    ds = create_inverted_index(ds, spark, "text", tokenizer="german_stem")
    # 'strassen' folds+stems to the same token as indexed 'Straßen'
    hits = match_query(ds, spark, ["strassen"], k=10)
    base = ds.to_df(spark, with_row_id=True).select("_rowid", "doc_id")
    got = {r["doc_id"] for r in hits.join(base, hits.id == base._rowid).collect()}
    assert got == {0}


def test_stopword_lists_de_fr(spark):
    from pyspark.sql import functions as F

    from lance_spark.functions.text import remove_stopwords, tokenize

    df = spark.createDataFrame(
        [("der hund und die katze",), ("le chien et les chats",)], ["t"]
    )
    de = df.select(remove_stopwords(tokenize(F.col("t")), "de").alias("x")).collect()
    fr = df.select(remove_stopwords(tokenize(F.col("t")), "fr").alias("x")).collect()
    assert de[0]["x"] == ["hund", "katze"]
    assert fr[1]["x"] == ["chien", "chats"]


def test_ru_nl_sv_stem_column_matches_driver_mirror(spark):
    """stem_token_ru/nl/sv (Column) and stem_word_ru/nl/sv (driver) must
    be rule-for-rule identical — same lockstep contract as en/de/fr."""
    from pyspark.sql import functions as F

    from lance_spark.functions.text import (
        stem_token_nl, stem_token_ru, stem_token_sv,
        stem_word_nl, stem_word_ru, stem_word_sv,
    )

    ru_words = [
        # derivational, plural/instrumental, adjectives, vowel endings, guards
        "возможность", "книгами", "странами", "красный", "большой",
        "домах", "словом", "книга", "поля", "дом", "он", "из",
    ]
    nl_words = [
        "mogelijkheden", "gebouwen", "wandelingen", "betaling", "vriendelijk",
        "bruikbaar", "huizen", "tafels", "tafel", "een", "de", "es",
    ]
    sv_words = [
        "flickorna", "bilarna", "husen", "springande", "möjlighet", "snabbhet",
        "bilar", "hundar", "flickor", "tabell", "hus", "en", "de",
    ]
    for words, tok, mirror, tag in [
        (ru_words, stem_token_ru, stem_word_ru, "ru"),
        (nl_words, stem_token_nl, stem_word_nl, "nl"),
        (sv_words, stem_token_sv, stem_word_sv, "sv"),
    ]:
        df = spark.createDataFrame([(w,) for w in words], ["w"])
        got = {r["w"]: r["s"] for r in df.select("w", tok(F.col("w")).alias("s")).collect()}
        for w in words:
            assert got[w] == mirror(w), f"{tag} mismatch on {w!r}"

    # spot semantics
    assert stem_word_ru("книгами") == stem_word_ru("книга") == "книг"
    assert stem_word_ru("возможность") == "возможн"
    assert stem_word_ru("он") == "он"  # short-word guard
    assert stem_word_nl("gebouwen") == "gebouw"
    assert stem_word_nl("mogelijkheden") == "mogelijkheid"
    assert stem_word_nl("de") == "de"
    assert stem_word_sv("flickorna") == stem_word_sv("flickor") == "flick"
    assert stem_word_sv("en") == "en"


def test_random_words_stem_mirror_property(spark):
    """Randomized lockstep: the Column stemmers and driver mirrors agree on
    arbitrary letter strings (incl. Cyrillic for ru), not just curated
    vocabulary."""
    import random

    from pyspark.sql import functions as F

    from lance_spark.functions.text import (
        stem_token_nl, stem_token_ru, stem_token_sv,
        stem_word_nl, stem_word_ru, stem_word_sv,
    )

    rng = random.Random(71)
    latin = [
        "".join(rng.choice("abcdehilmnorstu") for _ in range(rng.randint(1, 12)))
        for _ in range(300)
    ]
    cyr = [
        "".join(rng.choice("абвгдеиклмностыья") for _ in range(rng.randint(1, 12)))
        for _ in range(300)
    ]
    for words, tok, mirror, tag in [
        (cyr, stem_token_ru, stem_word_ru, "ru"),
        (latin, stem_token_nl, stem_word_nl, "nl"),
        (latin, stem_token_sv, stem_word_sv, "sv"),
    ]:
        df = spark.createDataFrame([(w,) for w in set(words)], ["w"])
        got = {r["w"]: r["s"] for r in df.select("w", tok(F.col("w")).alias("s")).collect()}
        for w in set(words):
            assert got[w] == mirror(w), f"{tag} mismatch on {w!r}"


def test_ru_nl_sv_index_query_roundtrip(spark, tmp_path):
    """Inflected query terms hit stemmed postings through each new
    tokenizer config end-to-end."""
    import lance_spark as ls
    from lance_spark.indexes.inverted import create_inverted_index, match_query

    cases = [
        ("russian_stem", [(0, "новые книги на полке"), (1, "ничего тут нет")],
         ["книгами"], {0}),
        ("dutch_stem", [(0, "de grote gebouwen van de stad"), (1, "niets hier")],
         ["gebouw"], {0}),
        ("swedish_stem", [(0, "alla flickorna springer fort"), (1, "ingenting")],
         ["flickor"], {0}),
    ]
    for tok, rows, terms, want in cases:
        docs = spark.createDataFrame(rows, ["doc_id", "text"])
        ds = ls.write_dataset(docs, str(tmp_path / tok))
        ds = create_inverted_index(ds, spark, "text", tokenizer=tok)
        hits = match_query(ds, spark, terms, k=10)
        base = ds.to_df(spark, with_row_id=True).select("_rowid", "doc_id")
        got = {r["doc_id"] for r in hits.join(base, hits.id == base._rowid).collect()}
        assert got == want, f"{tok}: got {got}"


def test_damerau_levenshtein_matches_duckdb():
    """Our driver-side Damerau–Levenshtein must equal DuckDB's
    damerau_levenshtein (the oracle function) on random strings — full DL
    incl. the OSA-divergent shapes."""
    import random

    import duckdb

    from lance_spark.functions.text import damerau_levenshtein

    cases = [("ca", "abc"), ("abc", "acb"), ("", "abc"), ("a", ""), ("abc", "abc"),
             ("tbale", "table"), ("ab", "ba"), ("abcdef", "badcfe")]
    rng = random.Random(97)
    for _ in range(300):
        a = "".join(rng.choice("abcde") for _ in range(rng.randint(0, 8)))
        b = "".join(rng.choice("abcde") for _ in range(rng.randint(0, 8)))
        cases.append((a, b))
    con = duckdb.connect()
    for a, b in cases:
        want = con.execute("SELECT damerau_levenshtein(?, ?)", [a, b]).fetchone()[0]
        assert damerau_levenshtein(a, b) == want, (a, b)


def test_fuzzy_transpositions_end_to_end(spark, tmp_path):
    import lance_spark as ls
    from lance_spark.indexes.inverted import create_inverted_index, fuzzy_query
    from lance_spark.operators.fts import fuzzy_match

    docs = spark.createDataFrame(
        [(0, "the table stands"), (1, "nothing relevant")], ["doc_id", "text"]
    )
    # flat path: 'tbale' is 1 Damerau edit from 'table', 2 Levenshtein
    assert fuzzy_match(docs, "text", "doc_id", "tbale", fuzziness=1).count() == 1
    assert fuzzy_match(docs, "text", "doc_id", "tbale", fuzziness=1,
                       transpositions=False).count() == 0
    # indexed path
    ds = ls.write_dataset(docs, str(tmp_path / "fz"))
    ds = create_inverted_index(ds, spark, "text")
    assert fuzzy_query(ds, spark, "tbale", fuzziness=1).count() == 1
    assert fuzzy_query(ds, spark, "tbale", fuzziness=1, transpositions=False).count() == 0


def test_da_no_fi_tr_stem_column_matches_driver_mirror(spark):
    """stem_token_da/no/fi/tr (Column) and stem_word_da/no/fi/tr (driver)
    must be rule-for-rule identical — same lockstep contract as the other
    nine languages (tokenizer.rs:43-80)."""
    from pyspark.sql import functions as F

    from lance_spark.functions.text import (
        stem_token_da, stem_token_fi, stem_token_no, stem_token_tr,
        stem_word_da, stem_word_fi, stem_word_no, stem_word_tr,
    )

    da_words = [
        "hunderne", "loebende", "bevaegelse", "muligheds", "mulighed",
        "tabler", "huset", "huse", "scans", "hus", "en", "de",
    ]
    no_words = [
        "husene", "gaaende", "loepende", "mulighets", "mulighet",
        "tabler", "huset", "joinet", "scans", "hus", "en", "et",
    ]
    fi_words = [
        "talossa", "kirjasta", "poydalla", "maalta", "hanelle", "kirjaksi",
        "talot", "kirjat", "taloin", "talon", "tablessa", "scanit", "talo", "on",
    ]
    tr_words = [
        "evlerden", "evlerde", "kitaplardan", "kitaplari", "evleri",
        "tablelar", "joinler", "evler", "kitap", "ev", "on",
    ]
    for words, tok, mirror, tag in [
        (da_words, stem_token_da, stem_word_da, "da"),
        (no_words, stem_token_no, stem_word_no, "no"),
        (fi_words, stem_token_fi, stem_word_fi, "fi"),
        (tr_words, stem_token_tr, stem_word_tr, "tr"),
    ]:
        df = spark.createDataFrame([(w,) for w in words], ["w"])
        got = {r["w"]: r["s"] for r in df.select("w", tok(F.col("w")).alias("s")).collect()}
        for w in words:
            assert got[w] == mirror(w), f"{tag} mismatch on {w!r}"

    # spot semantics: inflected and base forms conflate
    assert stem_word_da("tabler") == stem_word_da("table") == "tabl"
    assert stem_word_da("en") == "en"  # short-word guard
    assert stem_word_no("tablene") == stem_word_no("table") == "tabl"
    assert stem_word_fi("tablessa") == stem_word_fi("table") == "tabl"
    assert stem_word_fi("scanit") == "scan"
    assert stem_word_tr("tablelar") == "table"  # plural stripped, root kept
    assert stem_word_tr("evlerden") == stem_word_tr("evler") == "ev"


def test_da_no_fi_tr_random_words_mirror_property(spark):
    """Randomized lockstep for the four new languages on arbitrary letter
    strings, mirroring the ru/nl/sv property test."""
    import random

    from pyspark.sql import functions as F

    from lance_spark.functions.text import (
        stem_token_da, stem_token_fi, stem_token_no, stem_token_tr,
        stem_word_da, stem_word_fi, stem_word_no, stem_word_tr,
    )

    rng = random.Random(73)
    latin = [
        "".join(rng.choice("abcdehiklmnorstu") for _ in range(rng.randint(1, 12)))
        for _ in range(300)
    ]
    for tok, mirror, tag in [
        (stem_token_da, stem_word_da, "da"),
        (stem_token_no, stem_word_no, "no"),
        (stem_token_fi, stem_word_fi, "fi"),
        (stem_token_tr, stem_word_tr, "tr"),
    ]:
        df = spark.createDataFrame([(w,) for w in set(latin)], ["w"])
        got = {r["w"]: r["s"] for r in df.select("w", tok(F.col("w")).alias("s")).collect()}
        for w in set(latin):
            assert got[w] == mirror(w), f"{tag} mismatch on {w!r}"


def test_da_no_fi_tr_index_query_roundtrip(spark, tmp_path):
    """Inflected query terms hit stemmed postings through each new
    tokenizer config end-to-end, incl. the language-specific folds
    (æ/ø for da/no, ä/ö for fi, ı/ş/ğ for tr)."""
    import lance_spark as ls
    from lance_spark.indexes.inverted import create_inverted_index, match_query

    cases = [
        ("danish_stem", [(0, "hunderne løber på vejen"), (1, "ingenting her")],
         ["hunden"], {0}),
        ("norwegian_stem", [(0, "husene står ved fjorden"), (1, "ingenting")],
         ["huset"], {0}),
        ("finnish_stem", [(0, "kirjat ovat talossa"), (1, "ei mitään")],
         ["talolla"], {0}),
        ("turkish_stem", [(0, "kitaplar masada duruyor"), (1, "hiçbir şey")],
         ["kitaplardan"], {0}),
    ]
    for tok, rows, terms, want in cases:
        docs = spark.createDataFrame(rows, ["doc_id", "text"])
        ds = ls.write_dataset(docs, str(tmp_path / tok))
        ds = create_inverted_index(ds, spark, "text", tokenizer=tok)
        hits = match_query(ds, spark, terms, k=10)
        base = ds.to_df(spark, with_row_id=True).select("_rowid", "doc_id")
        got = {r["doc_id"] for r in hits.join(base, hits.id == base._rowid).collect()}
        assert got == want, f"{tok}: got {got}"


def test_hu_ro_el_ar_ta_stem_column_matches_driver_mirror(spark):
    """Lockstep contract for the round-7 languages (hu/ro/el/ar/ta): the
    Column rule chain and the driver mirror used for query-term
    normalization must be rule-for-rule identical."""
    from pyspark.sql import functions as F

    from lance_spark.functions.text import (
        stem_token_ar, stem_token_el, stem_token_hu, stem_token_ro, stem_token_ta,
        stem_word_ar, stem_word_el, stem_word_hu, stem_word_ro, stem_word_ta,
    )

    cases = [
        (stem_token_hu, stem_word_hu, "hu",
         ["asztalokkal", "asztalok", "hazak", "kertben", "konyvnek", "szoba",
          "fak", "efgk", "alma", "ab"]),
        (stem_token_ro, stem_word_ro, "ro",
         ["mesele", "meselor", "scanurile", "cartilor", "omului", "uri",
          "copii", "casa", "ab"]),
        (stem_token_el, stem_word_el, "el",
         ["ταβλες", "τραπεζια", "τραπεζιων", "ονοματα", "προγραμματοσ",
          "λογοσ", "μερα", "αβ"]),
        (stem_token_ar, stem_word_ar, "ar",
         ["الكتاب", "والكتاب", "كتابها", "مدرسات", "مكتبة", "بيوت",
          "ال", "كتابين"]),
        (stem_token_ta, stem_word_ta, "ta",
         ["தஅபலஎகள", "தஅபலஎஐ", "ஸசஅநஇல", "கள", "நஅடஉ", "அப"]),
    ]
    for tok, mirror, tag, words in cases:
        df = spark.createDataFrame([(w,) for w in words], ["w"])
        got = {r["w"]: r["s"] for r in df.select("w", tok(F.col("w")).alias("s")).collect()}
        for w in words:
            assert got[w] == mirror(w), f"{tag} mismatch on {w!r}: {got[w]!r} != {mirror(w)!r}"


def test_hu_ro_el_ar_ta_random_words_mirror_property(spark):
    """Randomized lockstep for the five round-7 languages on arbitrary
    strings over each language's own alphabet."""
    import random

    from pyspark.sql import functions as F

    from lance_spark.functions.text import (
        stem_token_ar, stem_token_el, stem_token_hu, stem_token_ro, stem_token_ta,
        stem_word_ar, stem_word_el, stem_word_hu, stem_word_ro, stem_word_ta,
    )

    rng = random.Random(97)
    alphabets = {
        "hu": ("abehklnortv", stem_token_hu, stem_word_hu),
        "ro": ("aceilortu", stem_token_ro, stem_word_ro),
        "el": ("αβγεηιλμνοστυω", stem_token_el, stem_word_el),
        "ar": ("ابتةسكلمنهوي", stem_token_ar, stem_word_ar),
        "ta": ("அஇஉஎகசடதநபலளஐ", stem_token_ta, stem_word_ta),
    }
    for tag, (alpha, tok, mirror) in alphabets.items():
        words = {
            "".join(rng.choice(alpha) for _ in range(rng.randint(1, 12)))
            for _ in range(250)
        }
        df = spark.createDataFrame([(w,) for w in words], ["w"])
        got = {r["w"]: r["s"] for r in df.select("w", tok(F.col("w")).alias("s")).collect()}
        for w in words:
            assert got[w] == mirror(w), f"{tag} mismatch on {w!r}"


def test_hu_ro_el_ar_ta_index_query_roundtrip(spark, tmp_path):
    """Inflected query terms hit stemmed postings through each round-7
    tokenizer config end-to-end, incl. the language folds (ő/ű for hu,
    ă/ş/ţ for ro, final-sigma/accents for el, hamza folds for ar)."""
    import lance_spark as ls
    from lance_spark.indexes.inverted import create_inverted_index, match_query

    cases = [
        ("hungarian_stem", [(0, "az asztalok a szobában"), (1, "semmi más")],
         ["asztalokkal"], {0}),
        ("romanian_stem", [(0, "mesele sunt aici"), (1, "nimic altceva")],
         ["meselor"], {0}),
        ("greek_stem", [(0, "τα τραπεζια ειναι εδω"), (1, "τιποτα αλλο")],
         ["τραπεζιων"], {0}),
        ("arabic_stem", [(0, "الكتاب على الرف"), (1, "شيء اخر")],
         ["كتابها"], {0}),
        ("tamil_stem", [(0, "தஅபலஎகள இஙஉ"), (1, "வஎரய நஅடஉ")],
         ["தஅபலஎஐ"], {0}),
    ]
    for tok, rows, terms, want in cases:
        docs = spark.createDataFrame(rows, ["doc_id", "text"])
        ds = ls.write_dataset(docs, str(tmp_path / tok))
        ds = create_inverted_index(ds, spark, "text", tokenizer=tok)
        hits = match_query(ds, spark, terms, k=10)
        base = ds.to_df(spark, with_row_id=True).select("_rowid", "doc_id")
        got = {r["doc_id"] for r in hits.join(base, hits.id == base._rowid).collect()}
        assert got == want, f"{tok}: got {got}"


class TestTextReviewR11:
    """Pins for the r11 adversarial review of functions/text.py."""

    def test_whitespace_query_terms_preserve_case(self, spark):
        from lance_spark.functions.text import query_tokens

        assert query_tokens(["Hello", "WORLD"], "whitespace") == ["Hello", "WORLD"]
        # every other tokenizer still lowercases
        assert query_tokens(["Hello"], "simple") == ["hello"]

    def test_query_terms_strip_edge_punctuation(self, spark):
        from lance_spark.functions.text import query_tokens

        assert query_tokens(["spark,", "(scan)", "join."], "simple") == [
            "spark", "scan", "join",
        ]
        assert query_tokens(["running!"], "english_stem") == ["run"]
        # whitespace tokenizer keeps punctuation (index did too)
        assert query_tokens(["spark,"], "whitespace") == ["spark,"]

    def test_ngram_short_and_empty_strings_emit_nothing(self, spark):
        from lance_spark.functions.text import tokenize_ngram

        df = spark.createDataFrame(
            [("abcd",), ("ab",), ("",), (None,)], "s string"
        )
        rows = {r["s"]: r["g"] for r in df.select(
            F.col("s"), tokenize_ngram("s", 3).alias("g")
        ).collect()}
        assert sorted(rows["abcd"]) == ["abc", "bcd"]
        assert rows["ab"] == []
        assert rows[""] == []
        assert rows[None] == []
        pref = {r["s"]: r["g"] for r in df.select(
            F.col("s"), tokenize_ngram("s", 3, prefix_only=True).alias("g")
        ).collect()}
        assert pref["abcd"] == ["abc"] and pref[""] == [] and pref[None] == []
        # a string shorter than n emits NO prefix gram either — index and
        # query sides must agree on short tokens (r12 ADVICE fix)
        assert pref["ab"] == []

    def test_turkish_dotted_capital_i_roundtrip(self, spark):
        from lance_spark.functions.text import query_tokens, tokenize_turkish

        df = spark.createDataFrame([("İstanbul gezisi",)], "s string")
        toks = df.select(tokenize_turkish(F.col("s")).alias("t")).collect()[0]["t"]
        # one token per word — the combining dot must not split 'istanbul'
        assert len(toks) == 2
        qt = query_tokens(["İstanbul"], "turkish_stem")
        assert qt == [toks[0]]  # query normalizes to the same posting token

    def test_fingerprint_null_vs_empty(self, spark):
        from lance_spark.functions.text import fingerprint

        df = spark.createDataFrame([(1, None), (2, ""), (3, "!!!")], "id long, t string")
        rows = {r["id"]: r["fp"] for r in df.select(
            "id", fingerprint(F.col("t")).alias("fp")
        ).collect()}
        assert rows[1] is None  # NULL text → NULL fingerprint
        assert rows[2] is not None and rows[2] == rows[3]  # both contentless

    def test_stopword_ratio_empty_list_means_zero(self, spark):
        from lance_spark.functions.text import stopword_ratio

        df = spark.createDataFrame([("the and of it",)], "t string")
        r_default = df.select(stopword_ratio(F.col("t")).alias("r")).collect()[0]["r"]
        r_empty = df.select(stopword_ratio(F.col("t"), stopwords=[]).alias("r")).collect()[0]["r"]
        assert r_default > 0
        assert r_empty == 0.0

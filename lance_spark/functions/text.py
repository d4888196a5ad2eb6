"""Text-analysis column functions for large-scale training-data pipelines.

All are built-in-function compositions (JVM-side, whole-stage codegen) —
no Python UDFs in any hot path. Each has an exact ANSI-SQL equivalent so
DuckDB can oracle-check it (see suite.py).

``contains_tokens`` mirrors the reference's UDF of the same name
(rust/lance-datafusion/src/udf.rs:51-98): token-boundary containment rather
than substring match. ``hash64`` is the engine-portable 60-bit hash used by
the dedup/minhash operators: both Spark and DuckDB compute identical md5
bytes, so `bigint(md5[:15 hex])` agrees across engines.

The ``stem_token_*`` family covers the same language set as tantivy's
``Language`` enum (tokenizer.rs:43-80), but the rules are deliberately
snowball-LITE: SQL-expressible suffix rewrites, not the full Snowball
algorithms tantivy runs. Stems are therefore internally consistent (Spark
build == Spark query == DuckDB oracle) but NOT term-compatible with an
inverted index built by the reference itself.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# languages scored by stopword evidence; tie-break = list order (deterministic)
LANG_STOPWORDS = {
    "en": ["the", "a", "of", "and", "to", "in", "is"],
    "es": ["el", "la", "de", "que", "y", "los"],
    "fr": ["le", "la", "de", "et", "un", "les", "des", "en", "du", "dans",
           "est", "pour", "qui", "une", "sur"],
    "de": ["der", "die", "und", "das", "ein", "von", "mit", "den", "des",
           "im", "nicht", "zu", "auf", "ist", "eine"],
    "it": ["il", "di", "che", "la", "per", "con", "del", "sono", "una",
           "anche", "della", "gli", "nel"],
    "pt": ["o", "de", "que", "do", "da", "em", "um", "para", "com", "uma",
           "os", "no", "se", "na", "por"],
}

STOPWORDS_EN = LANG_STOPWORDS["en"]


def tokenize(col) -> Column:
    """lower → split on non-letters → drop empties (the reference's 'simple'
    tokenizer: rust/lance-index/src/scalar/inverted/tokenizer.rs:43-80)."""
    return F.filter(F.split(F.lower(col), "[^a-z]+"), lambda x: x != F.lit(""))


def tokenize_whitespace(col) -> Column:
    """Whitespace tokenizer (tokenizer.rs 'whitespace'): split on runs of
    whitespace only, case preserved."""
    return F.filter(F.split(col, "\\s+"), lambda x: x != F.lit(""))


def tokenize_ngram(colname: str, n: int = 3, prefix_only: bool = False) -> Column:
    """Character n-gram tokenizer (tokenizer.rs 'ngram', min=max=n): distinct
    lowercase char n-grams; prefix_only keeps the leading gram (edge-ngram).
    Takes a column NAME (the expr-form transform needs it verbatim).
    Strings shorter than n (and NULL/empty text) emit NO grams — the
    reference's min=max=n tokenizer does the same; sequence(1, 0) would
    otherwise yield the DESCENDING [1, 0] and fabricate short 'grams'."""
    if prefix_only:
        # same length >= n guard as the sliding branch: a string shorter
        # than n emits NO grams, so index and query sides agree on short
        # tokens (r12 ADVICE fix — >= 1 let a 2-char string emit a 2-char
        # 'gram' from a min=max=3 tokenizer)
        return F.expr(
            f"CASE WHEN length({colname}) >= {n}"
            f" THEN array(substring(lower({colname}), 1, {n}))"
            " ELSE CAST(array() AS array<string>) END"
        )
    grams = F.expr(
        f"CASE WHEN length({colname}) >= {n}"
        f" THEN transform(sequence(1, length({colname}) - {n - 1}),"
        f" i -> substring(lower({colname}), i, {n}))"
        " ELSE CAST(array() AS array<string>) END"
    )
    return F.array_distinct(grams)


def tokenize_unicode(col) -> Column:
    """Unicode-aware tokenizer (tokenizer.rs LanceTokenizer language configs):
    CJK ideographs/kana/hangul become single-character tokens (the unigram
    strategy of the reference's lindera/jieba configs, minus the dictionaries),
    all other scripts split on non-letter/digit runs. Non-Latin text no longer
    tokenizes to nothing (the hardwired ``[^a-z]+`` gap this closes)."""
    spaced = F.regexp_replace(
        col, "([\\p{IsHan}\\p{IsHiragana}\\p{IsKatakana}\\p{IsHangul}])", " $1 "
    )
    return F.filter(
        F.split(F.lower(spaced), "[^\\p{L}\\p{N}]+"), lambda x: x != F.lit("")
    )


# Doubled-consonant endings undoubled after -ing/-ed stripping (porter step
# 1b cleanup). Enumerated pairs, NOT a backreference pattern — DuckDB's RE2
# has no backreferences, and the oracle SQL must express the same rule.
_DOUBLED = ["bb", "dd", "ff", "gg", "mm", "nn", "pp", "rr", "tt"]


def stem_token(t) -> Column:
    """Snowball-style English stemmer, porter-lite subset (tokenizer.rs:43-80
    stemmer stage). Deterministic rules, first match wins:
    plural (sses→ss, ies→y, s→∅), then -ing/-ed/-ly stripping with a minimum
    stem length, then doubled-consonant undoubling. The exact same rules are
    expressible as ANSI SQL CASE/regexp in the DuckDB oracle."""
    # stage 1: plurals
    t1 = (
        F.when(t.rlike("sses$"), F.regexp_replace(t, "sses$", "ss"))
        .when(t.rlike(".ies$"), F.regexp_replace(t, "ies$", "y"))
        .when(t.rlike(".[^su]s$"), F.regexp_replace(t, "s$", ""))
        .otherwise(t)
    )
    # stage 2: suffixes (keep a stem of >= 3 chars)
    t2 = (
        F.when(t1.rlike(".{3}ing$"), F.regexp_replace(t1, "ing$", ""))
        .when(t1.rlike(".{3}ed$"), F.regexp_replace(t1, "ed$", ""))
        .when(t1.rlike(".{4}ly$"), F.regexp_replace(t1, "ly$", ""))
        .otherwise(t1)
    )
    # stage 3: undouble final consonant only when stage 2 stripped something
    undoubled = F.when(
        (t2 != t1) & F.substring(t2, -2, 2).isin(_DOUBLED),
        F.substring(t2, 1, F.length(t2) - 1),
    ).otherwise(t2)
    return undoubled


def stem_word(w: str) -> str:
    """Driver-side mirror of ``stem_token`` for query-term stemming — MUST
    stay rule-for-rule identical so query terms hit the stemmed postings."""
    import re

    if re.search(r"sses$", w):
        t1 = re.sub(r"sses$", "ss", w)
    elif re.search(r".ies$", w):
        t1 = re.sub(r"ies$", "y", w)
    elif re.search(r".[^su]s$", w):
        t1 = re.sub(r"s$", "", w)
    else:
        t1 = w
    if re.search(r".{3}ing$", t1):
        t2 = re.sub(r"ing$", "", t1)
    elif re.search(r".{3}ed$", t1):
        t2 = re.sub(r"ed$", "", t1)
    elif re.search(r".{4}ly$", t1):
        t2 = re.sub(r"ly$", "", t1)
    else:
        t2 = t1
    if t2 != t1 and t2[-2:] in _DOUBLED:
        return t2[:-1]
    return t2


def tokenize_stemmed(col) -> Column:
    """simple tokenizer + English stemming ('english_stem' config)."""
    return F.transform(tokenize(col), stem_token)


# --- German / French snowball-style rule subsets --------------------------
# Mirrors the reference's per-language snowball stemmer configs
# (rust/lance-index/src/scalar/inverted/tokenizer.rs:43-80). Same contract
# as the English porter-lite above: deterministic first-match-wins CASE
# chains with minimum-stem-length guards, no backreferences, so the exact
# rules are expressible in the DuckDB oracle and in the driver-side
# query-term mirrors.

_ASCII_FOLD_SRC = "àáâãäåèéêëìíîïòóôõöùúûüýÿñç"
_ASCII_FOLD_DST = "aaaaaaeeeeiiiiooooouuuuyync"
_FOLD_TABLE = str.maketrans(_ASCII_FOLD_SRC, _ASCII_FOLD_DST)


def _fold_de(col) -> Column:
    """German normalization: lowercase, ß→ss, umlauts/diacritics folded —
    after which the text is ASCII and the 'simple' tokenizer applies."""
    return ascii_fold(F.regexp_replace(F.lower(col), "ß", "ss"))


def stem_token_de(t) -> Column:
    """German snowball-lite: declensional endings (-ern -en -er -es -em -e
    -s) then derivational suffixes (-ung -heit -keit -lich -isch)."""
    t1 = (
        F.when(t.rlike(".{3}ern$"), F.regexp_replace(t, "ern$", ""))
        .when(t.rlike(".{3}(en|er|es|em)$"), F.regexp_replace(t, "(en|er|es|em)$", ""))
        .when(t.rlike(".{3}e$"), F.regexp_replace(t, "e$", ""))
        .when(t.rlike(".{4}s$"), F.regexp_replace(t, "s$", ""))
        .otherwise(t)
    )
    return (
        F.when(t1.rlike(".{4}(ung|heit|keit)$"), F.regexp_replace(t1, "(ung|heit|keit)$", ""))
        .when(t1.rlike(".{4}(lich|isch)$"), F.regexp_replace(t1, "(lich|isch)$", ""))
        .otherwise(t1)
    )


def stem_word_de(w: str) -> str:
    """Driver-side mirror of ``stem_token_de`` — rule-for-rule identical."""
    import re

    if re.search(r".{3}ern$", w):
        t1 = re.sub(r"ern$", "", w)
    elif re.search(r".{3}(en|er|es|em)$", w):
        t1 = re.sub(r"(en|er|es|em)$", "", w)
    elif re.search(r".{3}e$", w):
        t1 = re.sub(r"e$", "", w)
    elif re.search(r".{4}s$", w):
        t1 = re.sub(r"s$", "", w)
    else:
        t1 = w
    if re.search(r".{4}(ung|heit|keit)$", t1):
        return re.sub(r"(ung|heit|keit)$", "", t1)
    if re.search(r".{4}(lich|isch)$", t1):
        return re.sub(r"(lich|isch)$", "", t1)
    return t1


def stem_token_fr(t) -> Column:
    """French snowball-lite: -eaux/-aux plural mutation, derivational
    suffixes (-ation(s) -ement(s) -euse(s)), then verb/plural endings
    (-er -ez -ent, -es -e -s)."""
    t1 = (
        F.when(t.rlike("eaux$"), F.regexp_replace(t, "eaux$", "eau"))
        .when(t.rlike(".aux$"), F.regexp_replace(t, "aux$", "al"))
        .when(
            t.rlike(".{3}(ations|ation|ements|ement|euses|euse)$"),
            F.regexp_replace(t, "(ations|ation|ements|ement|euses|euse)$", ""),
        )
        .otherwise(t)
    )
    return (
        F.when(t1.rlike(".{3}(er|ez|ent)$"), F.regexp_replace(t1, "(er|ez|ent)$", ""))
        .when(t1.rlike(".{3}es$"), F.regexp_replace(t1, "es$", ""))
        .when(t1.rlike(".{3}e$"), F.regexp_replace(t1, "e$", ""))
        .when(t1.rlike(".{3}s$"), F.regexp_replace(t1, "s$", ""))
        .otherwise(t1)
    )


def stem_word_fr(w: str) -> str:
    """Driver-side mirror of ``stem_token_fr`` — rule-for-rule identical."""
    import re

    if re.search(r"eaux$", w):
        t1 = re.sub(r"eaux$", "eau", w)
    elif re.search(r".aux$", w):
        t1 = re.sub(r"aux$", "al", w)
    elif re.search(r".{3}(ations|ation|ements|ement|euses|euse)$", w):
        t1 = re.sub(r"(ations|ation|ements|ement|euses|euse)$", "", w)
    else:
        t1 = w
    if re.search(r".{3}(er|ez|ent)$", t1):
        return re.sub(r"(er|ez|ent)$", "", t1)
    if re.search(r".{3}es$", t1):
        return re.sub(r"es$", "", t1)
    if re.search(r".{3}e$", t1):
        return re.sub(r"e$", "", t1)
    if re.search(r".{3}s$", t1):
        return re.sub(r"s$", "", t1)
    return t1


def stem_token_es(t) -> Column:
    """Spanish snowball-lite: -ciones→-cion mutation, derivational
    suffixes (-mente -idad -able), then plural endings (-es -s)."""
    t1 = (
        F.when(t.rlike(".{3}ciones$"), F.regexp_replace(t, "ciones$", "cion"))
        .when(t.rlike(".{4}(mente|idad|able)$"), F.regexp_replace(t, "(mente|idad|able)$", ""))
        .otherwise(t)
    )
    return (
        F.when(t1.rlike(".{3}es$"), F.regexp_replace(t1, "es$", ""))
        .when(t1.rlike(".{3}s$"), F.regexp_replace(t1, "s$", ""))
        .otherwise(t1)
    )


def stem_word_es(w: str) -> str:
    """Driver-side mirror of ``stem_token_es`` — rule-for-rule identical."""
    import re

    if re.search(r".{3}ciones$", w):
        t1 = re.sub(r"ciones$", "cion", w)
    elif re.search(r".{4}(mente|idad|able)$", w):
        t1 = re.sub(r"(mente|idad|able)$", "", w)
    else:
        t1 = w
    if re.search(r".{3}es$", t1):
        return re.sub(r"es$", "", t1)
    if re.search(r".{3}s$", t1):
        return re.sub(r"s$", "", t1)
    return t1


def stem_token_it(t) -> Column:
    """Italian snowball-lite: -zioni→-zione mutation, derivational suffixes
    (-mente -abile -ibile -ita), then vowel endings (-i -e -o -a)."""
    t1 = (
        F.when(t.rlike(".{3}zioni$"), F.regexp_replace(t, "zioni$", "zione"))
        .when(t.rlike(".{4}(mente|abile|ibile|ita)$"),
              F.regexp_replace(t, "(mente|abile|ibile|ita)$", ""))
        .otherwise(t)
    )
    return (
        F.when(t1.rlike(".{3}(i|e|o|a)$"), F.regexp_replace(t1, "(i|e|o|a)$", ""))
        .otherwise(t1)
    )


def stem_word_it(w: str) -> str:
    """Driver-side mirror of ``stem_token_it`` — rule-for-rule identical."""
    import re

    if re.search(r".{3}zioni$", w):
        t1 = re.sub(r"zioni$", "zione", w)
    elif re.search(r".{4}(mente|abile|ibile|ita)$", w):
        t1 = re.sub(r"(mente|abile|ibile|ita)$", "", w)
    else:
        t1 = w
    if re.search(r".{3}(i|e|o|a)$", t1):
        return re.sub(r"(i|e|o|a)$", "", t1)
    return t1


def stem_token_pt(t) -> Column:
    """Portuguese snowball-lite: -coes→-cao mutation (post-fold),
    derivational suffixes (-mente -idade -avel -ivel), then plural/vowel
    endings (-es -s -a -e -o)."""
    t1 = (
        F.when(t.rlike(".{3}coes$"), F.regexp_replace(t, "coes$", "cao"))
        .when(t.rlike(".{4}(mente|idade|avel|ivel)$"),
              F.regexp_replace(t, "(mente|idade|avel|ivel)$", ""))
        .otherwise(t)
    )
    return (
        F.when(t1.rlike(".{3}es$"), F.regexp_replace(t1, "es$", ""))
        .when(t1.rlike(".{3}s$"), F.regexp_replace(t1, "s$", ""))
        .when(t1.rlike(".{3}(a|e|o)$"), F.regexp_replace(t1, "(a|e|o)$", ""))
        .otherwise(t1)
    )


def stem_word_pt(w: str) -> str:
    """Driver-side mirror of ``stem_token_pt`` — rule-for-rule identical."""
    import re

    if re.search(r".{3}coes$", w):
        t1 = re.sub(r"coes$", "cao", w)
    elif re.search(r".{4}(mente|idade|avel|ivel)$", w):
        t1 = re.sub(r"(mente|idade|avel|ivel)$", "", w)
    else:
        t1 = w
    if re.search(r".{3}es$", t1):
        return re.sub(r"es$", "", t1)
    if re.search(r".{3}s$", t1):
        return re.sub(r"s$", "", t1)
    if re.search(r".{3}(a|e|o)$", t1):
        return re.sub(r"(a|e|o)$", "", t1)
    return t1


def stem_token_ru(t) -> Column:
    """Russian snowball-lite (tokenizer.rs per-language snowball configs):
    derivational -ость/-ости, plural/instrumental endings (-иями -ями -ами),
    adjective endings (-ый -ой -ая -яя -ое -ее -ие -ые), then case/vowel
    endings. Operates on Cyrillic codepoints — pair with
    ``tokenize_unicode`` (the 'simple' tokenizer drops non-Latin)."""
    t1 = (
        F.when(t.rlike(".{3}(ость|ости)$"), F.regexp_replace(t, "(ость|ости)$", ""))
        .when(t.rlike(".{3}(иями|ями|ами)$"), F.regexp_replace(t, "(иями|ями|ами)$", ""))
        .when(
            t.rlike(".{2}(ый|ой|ая|яя|ое|ее|ие|ые|ов|ев|ам|ям|ах|ях|ом|ем|ей)$"),
            F.regexp_replace(t, "(ый|ой|ая|яя|ое|ее|ие|ые|ов|ев|ам|ям|ах|ях|ом|ем|ей)$", ""),
        )
        .otherwise(t)
    )
    return (
        F.when(t1.rlike(".{3}(а|я|ы|и|е|о|у|ю|ь)$"),
               F.regexp_replace(t1, "(а|я|ы|и|е|о|у|ю|ь)$", ""))
        .otherwise(t1)
    )


def stem_word_ru(w: str) -> str:
    """Driver-side mirror of ``stem_token_ru`` — rule-for-rule identical."""
    import re

    if re.search(r".{3}(ость|ости)$", w):
        t1 = re.sub(r"(ость|ости)$", "", w)
    elif re.search(r".{3}(иями|ями|ами)$", w):
        t1 = re.sub(r"(иями|ями|ами)$", "", w)
    elif re.search(r".{2}(ый|ой|ая|яя|ое|ее|ие|ые|ов|ев|ам|ям|ах|ях|ом|ем|ей)$", w):
        t1 = re.sub(r"(ый|ой|ая|яя|ое|ее|ие|ые|ов|ев|ам|ям|ах|ях|ом|ем|ей)$", "", w)
    else:
        t1 = w
    if re.search(r".{3}(а|я|ы|и|е|о|у|ю|ь)$", t1):
        return re.sub(r"(а|я|ы|и|е|о|у|ю|ь)$", "", t1)
    return t1


def stem_token_nl(t) -> Column:
    """Dutch snowball-lite: -heden→-heid mutation, derivational suffixes
    (-ingen -ing -lijk -baar), then inflection endings (-en -e -s)."""
    t1 = (
        F.when(t.rlike(".{2}heden$"), F.regexp_replace(t, "heden$", "heid"))
        .when(t.rlike(".{4}(ingen|ing)$"), F.regexp_replace(t, "(ingen|ing)$", ""))
        .when(t.rlike(".{4}(lijk|baar)$"), F.regexp_replace(t, "(lijk|baar)$", ""))
        .otherwise(t)
    )
    return (
        F.when(t1.rlike(".{3}en$"), F.regexp_replace(t1, "en$", ""))
        .when(t1.rlike(".{3}e$"), F.regexp_replace(t1, "e$", ""))
        .when(t1.rlike(".{4}s$"), F.regexp_replace(t1, "s$", ""))
        .otherwise(t1)
    )


def stem_word_nl(w: str) -> str:
    """Driver-side mirror of ``stem_token_nl`` — rule-for-rule identical."""
    import re

    if re.search(r".{2}heden$", w):
        t1 = re.sub(r"heden$", "heid", w)
    elif re.search(r".{4}(ingen|ing)$", w):
        t1 = re.sub(r"(ingen|ing)$", "", w)
    elif re.search(r".{4}(lijk|baar)$", w):
        t1 = re.sub(r"(lijk|baar)$", "", w)
    else:
        t1 = w
    if re.search(r".{3}en$", t1):
        return re.sub(r"en$", "", t1)
    if re.search(r".{3}e$", t1):
        return re.sub(r"e$", "", t1)
    if re.search(r".{4}s$", t1):
        return re.sub(r"s$", "", t1)
    return t1


def stem_token_sv(t) -> Column:
    """Swedish snowball-lite (post-fold: å/ä/ö → a/a/o): definite plural
    endings (-arna -orna -erna), participles (-ande -ende), -het(s),
    then inflection endings (-ar -er -or -en, -a -e, -s)."""
    t1 = (
        F.when(t.rlike(".{2}(arna|orna|erna)$"), F.regexp_replace(t, "(arna|orna|erna)$", ""))
        .when(t.rlike(".{2}(ande|ende)$"), F.regexp_replace(t, "(ande|ende)$", ""))
        .when(t.rlike(".{3}(hets|het)$"), F.regexp_replace(t, "(hets|het)$", ""))
        .otherwise(t)
    )
    return (
        F.when(t1.rlike(".{3}(ar|er|or|en)$"), F.regexp_replace(t1, "(ar|er|or|en)$", ""))
        .when(t1.rlike(".{3}(a|e)$"), F.regexp_replace(t1, "(a|e)$", ""))
        .when(t1.rlike(".{4}s$"), F.regexp_replace(t1, "s$", ""))
        .otherwise(t1)
    )


def stem_word_sv(w: str) -> str:
    """Driver-side mirror of ``stem_token_sv`` — rule-for-rule identical."""
    import re

    if re.search(r".{2}(arna|orna|erna)$", w):
        t1 = re.sub(r"(arna|orna|erna)$", "", w)
    elif re.search(r".{2}(ande|ende)$", w):
        t1 = re.sub(r"(ande|ende)$", "", w)
    elif re.search(r".{3}(hets|het)$", w):
        t1 = re.sub(r"(hets|het)$", "", w)
    else:
        t1 = w
    if re.search(r".{3}(ar|er|or|en)$", t1):
        return re.sub(r"(ar|er|or|en)$", "", t1)
    if re.search(r".{3}(a|e)$", t1):
        return re.sub(r"(a|e)$", "", t1)
    if re.search(r".{4}s$", t1):
        return re.sub(r"s$", "", t1)
    return t1


def stem_token_da(t) -> Column:
    """Danish snowball-lite (post-fold: æ/ø/å → ae/o/a): definite plural
    -erne, participles -ende, -else, -hed(s), then inflection endings
    (-er -en -et -es, -e, -s)."""
    t1 = (
        F.when(t.rlike(".{2}(erne|ende|else)$"), F.regexp_replace(t, "(erne|ende|else)$", ""))
        .when(t.rlike(".{3}(heds|hed)$"), F.regexp_replace(t, "(heds|hed)$", ""))
        .otherwise(t)
    )
    return (
        F.when(t1.rlike(".{3}(er|en|et|es)$"), F.regexp_replace(t1, "(er|en|et|es)$", ""))
        .when(t1.rlike(".{3}e$"), F.regexp_replace(t1, "e$", ""))
        .when(t1.rlike(".{4}s$"), F.regexp_replace(t1, "s$", ""))
        .otherwise(t1)
    )


def stem_word_da(w: str) -> str:
    """Driver-side mirror of ``stem_token_da`` — rule-for-rule identical."""
    import re

    if re.search(r".{2}(erne|ende|else)$", w):
        t1 = re.sub(r"(erne|ende|else)$", "", w)
    elif re.search(r".{3}(heds|hed)$", w):
        t1 = re.sub(r"(heds|hed)$", "", w)
    else:
        t1 = w
    if re.search(r".{3}(er|en|et|es)$", t1):
        return re.sub(r"(er|en|et|es)$", "", t1)
    if re.search(r".{3}e$", t1):
        return re.sub(r"e$", "", t1)
    if re.search(r".{4}s$", t1):
        return re.sub(r"s$", "", t1)
    return t1


def stem_token_no(t) -> Column:
    """Norwegian snowball-lite (post-fold: æ/ø/å → ae/o/a): definite
    plural -ene, participles -ande/-ende, -else, -het(s), then inflection
    endings (-er -en -et -es, -a -e, -s)."""
    t1 = (
        F.when(t.rlike(".{2}(ene|ande|ende|else)$"), F.regexp_replace(t, "(ene|ande|ende|else)$", ""))
        .when(t.rlike(".{3}(hets|het)$"), F.regexp_replace(t, "(hets|het)$", ""))
        .otherwise(t)
    )
    return (
        F.when(t1.rlike(".{3}(er|en|et|es)$"), F.regexp_replace(t1, "(er|en|et|es)$", ""))
        .when(t1.rlike(".{3}(a|e)$"), F.regexp_replace(t1, "(a|e)$", ""))
        .when(t1.rlike(".{4}s$"), F.regexp_replace(t1, "s$", ""))
        .otherwise(t1)
    )


def stem_word_no(w: str) -> str:
    """Driver-side mirror of ``stem_token_no`` — rule-for-rule identical."""
    import re

    if re.search(r".{2}(ene|ande|ende|else)$", w):
        t1 = re.sub(r"(ene|ande|ende|else)$", "", w)
    elif re.search(r".{3}(hets|het)$", w):
        t1 = re.sub(r"(hets|het)$", "", w)
    else:
        t1 = w
    if re.search(r".{3}(er|en|et|es)$", t1):
        return re.sub(r"(er|en|et|es)$", "", t1)
    if re.search(r".{3}(a|e)$", t1):
        return re.sub(r"(a|e)$", "", t1)
    if re.search(r".{4}s$", t1):
        return re.sub(r"s$", "", t1)
    return t1


def stem_token_fi(t) -> Column:
    """Finnish snowball-lite (post-fold: ä/ö/å → a/o/a): case endings
    (-ssa -sta -lla -lta -lle -ksi), plural/partitive (-it -at -et),
    genitive/essive (-in -en -an), then a final-vowel strip (-a -i -e)."""
    t1 = F.when(
        t.rlike(".{3}(ssa|sta|lla|lta|lle|ksi)$"),
        F.regexp_replace(t, "(ssa|sta|lla|lta|lle|ksi)$", ""),
    ).otherwise(t)
    return (
        F.when(t1.rlike(".{3}(it|at|et)$"), F.regexp_replace(t1, "(it|at|et)$", ""))
        .when(t1.rlike(".{4}(in|en|an)$"), F.regexp_replace(t1, "(in|en|an)$", ""))
        .when(t1.rlike(".{4}(a|i|e)$"), F.regexp_replace(t1, "(a|i|e)$", ""))
        .otherwise(t1)
    )


def stem_word_fi(w: str) -> str:
    """Driver-side mirror of ``stem_token_fi`` — rule-for-rule identical."""
    import re

    if re.search(r".{3}(ssa|sta|lla|lta|lle|ksi)$", w):
        t1 = re.sub(r"(ssa|sta|lla|lta|lle|ksi)$", "", w)
    else:
        t1 = w
    if re.search(r".{3}(it|at|et)$", t1):
        return re.sub(r"(it|at|et)$", "", t1)
    if re.search(r".{4}(in|en|an)$", t1):
        return re.sub(r"(in|en|an)$", "", t1)
    if re.search(r".{4}(a|i|e)$", t1):
        return re.sub(r"(a|i|e)$", "", t1)
    return t1


def stem_token_tr(t) -> Column:
    """Turkish snowball-lite (post-fold: ı/ş/ğ/ç/ö/ü → i/s/g/c/o/u).
    Suffixes strip outside-in (root+plural+case): stage 1 removes case
    endings (-den -dan -ten -tan, -de -da -te -ta), stage 2 the plural /
    possessive-plural (-lari -leri, -lar -ler)."""
    t1 = (
        F.when(t.rlike(".{3}(den|dan|ten|tan)$"), F.regexp_replace(t, "(den|dan|ten|tan)$", ""))
        .when(t.rlike(".{3}(de|da|te|ta)$"), F.regexp_replace(t, "(de|da|te|ta)$", ""))
        .otherwise(t)
    )
    return (
        F.when(t1.rlike(".{3}(lari|leri)$"), F.regexp_replace(t1, "(lari|leri)$", ""))
        .when(t1.rlike(".{2}(lar|ler)$"), F.regexp_replace(t1, "(lar|ler)$", ""))
        .otherwise(t1)
    )


def stem_word_tr(w: str) -> str:
    """Driver-side mirror of ``stem_token_tr`` — rule-for-rule identical."""
    import re

    if re.search(r".{3}(den|dan|ten|tan)$", w):
        t1 = re.sub(r"(den|dan|ten|tan)$", "", w)
    elif re.search(r".{3}(de|da|te|ta)$", w):
        t1 = re.sub(r"(de|da|te|ta)$", "", w)
    else:
        t1 = w
    if re.search(r".{3}(lari|leri)$", t1):
        return re.sub(r"(lari|leri)$", "", t1)
    if re.search(r".{2}(lar|ler)$", t1):
        return re.sub(r"(lar|ler)$", "", t1)
    return t1


def tokenize_spanish(col) -> Column:
    """fold(diacritics) → simple tokenizer → Spanish stemming
    ('spanish_stem' config)."""
    return F.transform(tokenize(ascii_fold(F.lower(col))), stem_token_es)


def tokenize_italian(col) -> Column:
    """fold(diacritics) → simple tokenizer → Italian stemming
    ('italian_stem' config)."""
    return F.transform(tokenize(ascii_fold(F.lower(col))), stem_token_it)


def tokenize_portuguese(col) -> Column:
    """fold(diacritics/ç) → simple tokenizer → Portuguese stemming
    ('portuguese_stem' config)."""
    return F.transform(tokenize(ascii_fold(F.lower(col))), stem_token_pt)


def tokenize_german(col) -> Column:
    """fold(ß/umlauts) → simple tokenizer → German stemming
    ('german_stem' config)."""
    return F.transform(tokenize(_fold_de(col)), stem_token_de)


def tokenize_french(col) -> Column:
    """fold(diacritics) → simple tokenizer → French stemming
    ('french_stem' config)."""
    return F.transform(tokenize(ascii_fold(F.lower(col))), stem_token_fr)


def tokenize_russian(col) -> Column:
    """unicode tokenizer (Cyrillic survives) → Russian stemming
    ('russian_stem' config). ё is folded to е first (snowball convention)."""
    return F.transform(
        tokenize_unicode(F.regexp_replace(F.lower(col), "ё", "е")), stem_token_ru
    )


def tokenize_dutch(col) -> Column:
    """fold(diacritics) → simple tokenizer → Dutch stemming
    ('dutch_stem' config)."""
    return F.transform(tokenize(ascii_fold(F.lower(col))), stem_token_nl)


def tokenize_swedish(col) -> Column:
    """fold(å/ä/ö) → simple tokenizer → Swedish stemming
    ('swedish_stem' config)."""
    return F.transform(tokenize(ascii_fold(F.lower(col))), stem_token_sv)


def _fold_scand(col) -> Column:
    """Danish/Norwegian normalization: lowercase, æ→ae ø→o, then the
    common diacritic fold (å→a)."""
    return ascii_fold(
        F.regexp_replace(F.regexp_replace(F.lower(col), "æ", "ae"), "ø", "o")
    )


def tokenize_danish(col) -> Column:
    """fold(æ/ø/å) → simple tokenizer → Danish stemming
    ('danish_stem' config)."""
    return F.transform(tokenize(_fold_scand(col)), stem_token_da)


def tokenize_norwegian(col) -> Column:
    """fold(æ/ø/å) → simple tokenizer → Norwegian stemming
    ('norwegian_stem' config)."""
    return F.transform(tokenize(_fold_scand(col)), stem_token_no)


def tokenize_finnish(col) -> Column:
    """fold(ä/ö/å) → simple tokenizer → Finnish stemming
    ('finnish_stem' config)."""
    return F.transform(tokenize(ascii_fold(F.lower(col))), stem_token_fi)


_TR_FOLD_SRC = "ışğ"
_TR_FOLD_DST = "isg"


def tokenize_turkish(col) -> Column:
    """fold(ı/ş/ğ + ç/ö/ü) → simple tokenizer → Turkish stemming
    ('turkish_stem' config). lower('İ') yields 'i' + combining U+0307,
    which the [^a-z] gap would otherwise split mid-word — the dot is
    stripped so 'İstanbul' tokenizes as one word (query_tokens strips the
    same dot driver-side)."""
    return F.transform(
        tokenize(
            ascii_fold(
                F.translate(
                    F.regexp_replace(F.lower(col), "̇", ""),
                    _TR_FOLD_SRC,
                    _TR_FOLD_DST,
                )
            )
        ),
        stem_token_tr,
    )


def stem_token_hu(t) -> Column:
    """Hungarian snowball-lite (post-fold: ő/ű → o/u, diacritics folded).
    Stage 1 strips case endings (instrumental plurals -okkal/-ekkel, then
    -ban -ben -nak -nek -val -vel -rol -tol -hoz -hez), stage 2 plurals
    (-ok -ek -ak, bare -k) or a final a/e."""
    t1 = (
        F.when(t.rlike(".{3}(okkal|ekkel)$"), F.regexp_replace(t, "(okkal|ekkel)$", ""))
        .when(
            t.rlike(".{3}(ban|ben|nak|nek|val|vel|rol|tol|hoz|hez)$"),
            F.regexp_replace(t, "(ban|ben|nak|nek|val|vel|rol|tol|hoz|hez)$", ""),
        )
        .otherwise(t)
    )
    return (
        F.when(t1.rlike(".{3}(ok|ek|ak)$"), F.regexp_replace(t1, "(ok|ek|ak)$", ""))
        .when(t1.rlike(".{4}k$"), F.regexp_replace(t1, "k$", ""))
        .when(t1.rlike(".{4}(a|e)$"), F.regexp_replace(t1, "(a|e)$", ""))
        .otherwise(t1)
    )


def stem_word_hu(w: str) -> str:
    """Driver-side mirror of ``stem_token_hu`` — rule-for-rule identical."""
    import re

    if re.search(r".{3}(okkal|ekkel)$", w):
        t1 = re.sub(r"(okkal|ekkel)$", "", w)
    elif re.search(r".{3}(ban|ben|nak|nek|val|vel|rol|tol|hoz|hez)$", w):
        t1 = re.sub(r"(ban|ben|nak|nek|val|vel|rol|tol|hoz|hez)$", "", w)
    else:
        t1 = w
    if re.search(r".{3}(ok|ek|ak)$", t1):
        return re.sub(r"(ok|ek|ak)$", "", t1)
    if re.search(r".{4}k$", t1):
        return re.sub(r"k$", "", t1)
    if re.search(r".{4}(a|e)$", t1):
        return re.sub(r"(a|e)$", "", t1)
    return t1


def stem_token_ro(t) -> Column:
    """Romanian snowball-lite (post-fold: ă/â→a, î→i, ş/ţ→s/t). Stage 1
    strips definite-plural chains (-urile -urilor, then -ilor -elor
    -ului), stage 2 plural endings (-ele -uri -ii) or a final vowel."""
    t1 = (
        F.when(t.rlike(".{2}(urile|urilor)$"), F.regexp_replace(t, "(urile|urilor)$", ""))
        .when(t.rlike(".{3}(ilor|elor|ului)$"), F.regexp_replace(t, "(ilor|elor|ului)$", ""))
        .otherwise(t)
    )
    return (
        F.when(t1.rlike(".{3}(ele|uri|ii)$"), F.regexp_replace(t1, "(ele|uri|ii)$", ""))
        .when(t1.rlike(".{4}(e|i|a|u)$"), F.regexp_replace(t1, "(e|i|a|u)$", ""))
        .otherwise(t1)
    )


def stem_word_ro(w: str) -> str:
    """Driver-side mirror of ``stem_token_ro`` — rule-for-rule identical."""
    import re

    if re.search(r".{2}(urile|urilor)$", w):
        t1 = re.sub(r"(urile|urilor)$", "", w)
    elif re.search(r".{3}(ilor|elor|ului)$", w):
        t1 = re.sub(r"(ilor|elor|ului)$", "", w)
    else:
        t1 = w
    if re.search(r".{3}(ele|uri|ii)$", t1):
        return re.sub(r"(ele|uri|ii)$", "", t1)
    if re.search(r".{4}(e|i|a|u)$", t1):
        return re.sub(r"(e|i|a|u)$", "", t1)
    return t1


def stem_token_el(t) -> Column:
    """Greek snowball-lite over folded text (final sigma ς→σ, accents
    stripped, so every suffix below is written in its folded form).
    Stage 1 rewrites -ματα/-ματοσ → μα and strips noun case endings
    (-ων -ου -ησ -ασ -εσ -οσ -οι -αι -ια), stage 2 a final vowel."""
    t1 = (
        F.when(t.rlike(".{2}(ματα|ματοσ)$"), F.regexp_replace(t, "(ματα|ματοσ)$", "μα"))
        .when(
            t.rlike(".{3}(ων|ου|ησ|ασ|εσ|οσ|οι|αι|ια)$"),
            F.regexp_replace(t, "(ων|ου|ησ|ασ|εσ|οσ|οι|αι|ια)$", ""),
        )
        .otherwise(t)
    )
    return (
        F.when(t1.rlike(".{3}(α|η|ι|ο|ε|υ|ω)$"), F.regexp_replace(t1, "(α|η|ι|ο|ε|υ|ω)$", ""))
        .otherwise(t1)
    )


def stem_word_el(w: str) -> str:
    """Driver-side mirror of ``stem_token_el`` — rule-for-rule identical."""
    import re

    if re.search(r".{2}(ματα|ματοσ)$", w):
        t1 = re.sub(r"(ματα|ματοσ)$", "μα", w)
    elif re.search(r".{3}(ων|ου|ησ|ασ|εσ|οσ|οι|αι|ια)$", w):
        t1 = re.sub(r"(ων|ου|ησ|ασ|εσ|οσ|οι|αι|ια)$", "", w)
    else:
        t1 = w
    if re.search(r".{3}(α|η|ι|ο|ε|υ|ω)$", t1):
        return re.sub(r"(α|η|ι|ο|ε|υ|ω)$", "", t1)
    return t1


def stem_token_ar(t) -> Column:
    """Arabic light stemmer (the Larkey light-stemmer family tantivy's
    Arabic config implements; post-fold: أ/إ/آ→ا, ى→ي). Stage 1 strips
    the definite-article prefixes (وال- بال- كال- فال-, then ال-),
    stage 2 suffixes (-ات -ان -ون -ين -ها -ية, then -ة -ه -ي)."""
    t1 = (
        F.when(t.rlike("^(وال|بال|كال|فال).{3}"), F.regexp_replace(t, "^(وال|بال|كال|فال)", ""))
        .when(t.rlike("^ال.{3}"), F.regexp_replace(t, "^ال", ""))
        .otherwise(t)
    )
    return (
        F.when(
            t1.rlike(".{3}(ات|ان|ون|ين|ها|ية)$"),
            F.regexp_replace(t1, "(ات|ان|ون|ين|ها|ية)$", ""),
        )
        .when(t1.rlike(".{3}(ة|ه|ي)$"), F.regexp_replace(t1, "(ة|ه|ي)$", ""))
        .otherwise(t1)
    )


def stem_word_ar(w: str) -> str:
    """Driver-side mirror of ``stem_token_ar`` — rule-for-rule identical."""
    import re

    if re.search(r"^(وال|بال|كال|فال).{3}", w):
        t1 = re.sub(r"^(وال|بال|كال|فال)", "", w)
    elif re.search(r"^ال.{3}", w):
        t1 = re.sub(r"^ال", "", w)
    else:
        t1 = w
    if re.search(r".{3}(ات|ان|ون|ين|ها|ية)$", t1):
        return re.sub(r"(ات|ان|ون|ين|ها|ية)$", "", t1)
    if re.search(r".{3}(ة|ه|ي)$", t1):
        return re.sub(r"(ة|ه|ي)$", "", t1)
    return t1


def stem_token_ta(t) -> Column:
    """Tamil snowball-lite. Suffix chains are written with independent
    letters only (no combining vowel signs), because the unicode tokenizer
    splits on non-letters and combining marks are \\p{M}, not \\p{L} — a
    suffix containing one would never survive tokenization on either the
    index or the oracle side. Stage 1 strips plural chains (-களஇல -களஐ
    -கள), stage 2 case endings (-இல -ஆல -உடந -ஐ)."""
    t1 = (
        F.when(t.rlike(".{2}(களஇல|களஐ|கள)$"), F.regexp_replace(t, "(களஇல|களஐ|கள)$", ""))
        .otherwise(t)
    )
    return (
        F.when(t1.rlike(".{3}(இல|ஆல|உடந|ஐ)$"), F.regexp_replace(t1, "(இல|ஆல|உடந|ஐ)$", ""))
        .otherwise(t1)
    )


def stem_word_ta(w: str) -> str:
    """Driver-side mirror of ``stem_token_ta`` — rule-for-rule identical."""
    import re

    if re.search(r".{2}(களஇல|களஐ|கள)$", w):
        t1 = re.sub(r"(களஇல|களஐ|கள)$", "", w)
    else:
        t1 = w
    if re.search(r".{3}(இல|ஆல|உடந|ஐ)$", t1):
        return re.sub(r"(இல|ஆல|உடந|ஐ)$", "", t1)
    return t1


_HU_FOLD_SRC = "őű"
_HU_FOLD_DST = "ou"


def tokenize_hungarian(col) -> Column:
    """fold(ő/ű + diacritics) → simple tokenizer → Hungarian stemming
    ('hungarian_stem' config)."""
    return F.transform(
        tokenize(ascii_fold(F.translate(F.lower(col), _HU_FOLD_SRC, _HU_FOLD_DST))),
        stem_token_hu,
    )


_RO_FOLD_SRC = "ăşţșț"
_RO_FOLD_DST = "astst"


def tokenize_romanian(col) -> Column:
    """fold(ă/ş/ţ — both cedilla and comma forms — + diacritics) → simple
    tokenizer → Romanian stemming ('romanian_stem' config)."""
    return F.transform(
        tokenize(ascii_fold(F.translate(F.lower(col), _RO_FOLD_SRC, _RO_FOLD_DST))),
        stem_token_ro,
    )


_EL_FOLD_SRC = "ςάέήίόύώϊϋΐΰ"
_EL_FOLD_DST = "σαεηιουωιυιυ"


def tokenize_greek(col) -> Column:
    """fold(final sigma, accents) → unicode tokenizer (Greek survives) →
    Greek stemming ('greek_stem' config)."""
    return F.transform(
        tokenize_unicode(F.translate(F.lower(col), _EL_FOLD_SRC, _EL_FOLD_DST)),
        stem_token_el,
    )


_AR_FOLD_SRC = "أإآى"
_AR_FOLD_DST = "اااي"


def tokenize_arabic(col) -> Column:
    """fold(hamza forms of alif, alif maqsura) → unicode tokenizer →
    Arabic light stemming ('arabic_stem' config)."""
    return F.transform(
        tokenize_unicode(F.translate(F.lower(col), _AR_FOLD_SRC, _AR_FOLD_DST)),
        stem_token_ar,
    )


def tokenize_tamil(col) -> Column:
    """unicode tokenizer (Tamil survives) → Tamil stemming
    ('tamil_stem' config)."""
    return F.transform(tokenize_unicode(F.lower(col)), stem_token_ta)


def tokenizer_expr(name: str):
    """Named tokenizer registry (tokenizer.rs LanceTokenizer names) →
    callable(col) -> array<string> Column. Index params record the name so
    build and query tokenize identically."""
    try:
        return {
            "simple": tokenize,
            "whitespace": tokenize_whitespace,
            "unicode": tokenize_unicode,
            "english_stem": tokenize_stemmed,
            "german_stem": tokenize_german,
            "french_stem": tokenize_french,
            "spanish_stem": tokenize_spanish,
            "italian_stem": tokenize_italian,
            "portuguese_stem": tokenize_portuguese,
            "russian_stem": tokenize_russian,
            "dutch_stem": tokenize_dutch,
            "swedish_stem": tokenize_swedish,
            "danish_stem": tokenize_danish,
            "norwegian_stem": tokenize_norwegian,
            "finnish_stem": tokenize_finnish,
            "turkish_stem": tokenize_turkish,
            "hungarian_stem": tokenize_hungarian,
            "romanian_stem": tokenize_romanian,
            "greek_stem": tokenize_greek,
            "arabic_stem": tokenize_arabic,
            "tamil_stem": tokenize_tamil,
        }[name]
    except KeyError:
        raise ValueError(
            f"unknown tokenizer {name!r}; expected simple|whitespace|unicode"
            "|english_stem|german_stem|french_stem|spanish_stem"
            "|italian_stem|portuguese_stem|russian_stem|dutch_stem"
            "|swedish_stem|danish_stem|norwegian_stem|finnish_stem"
            "|turkish_stem|hungarian_stem|romanian_stem|greek_stem"
            "|arabic_stem|tamil_stem"
        ) from None


#: precomputed per-language fold tables (query_tokens used to rebuild these
#: str.maketrans dicts on every call)
_TR_TABLE = None
_HU_TABLE = None
_RO_TABLE = None
_EL_TABLE = None
_AR_TABLE = None


def _lang_tables():
    global _TR_TABLE, _HU_TABLE, _RO_TABLE, _EL_TABLE, _AR_TABLE
    if _TR_TABLE is None:
        _TR_TABLE = str.maketrans(_TR_FOLD_SRC, _TR_FOLD_DST)
        _HU_TABLE = str.maketrans(_HU_FOLD_SRC, _HU_FOLD_DST)
        _RO_TABLE = str.maketrans(_RO_FOLD_SRC, _RO_FOLD_DST)
        _EL_TABLE = str.maketrans(_EL_FOLD_SRC, _EL_FOLD_DST)
        _AR_TABLE = str.maketrans(_AR_FOLD_SRC, _AR_FOLD_DST)


#: tokenizers whose index side splits with tokenize_unicode
#: ([^\p{L}\p{N}]+ gaps, CJK unigrams — digits are TOKEN characters)
UNICODE_SPLIT_FAMILY = frozenset(
    {"unicode", "russian_stem", "greek_stem", "arabic_stem", "tamil_stem"}
)

#: ranges tokenize_unicode unigrams (Han incl. ext A/B + compat, kana +
#: small-kana ext, hangul syllables + jamo) — mirrors the JVM
#: \p{IsHan|IsHiragana|IsKatakana|IsHangul} script classes
_CJK_RANGES = (
    "\u4e00-\u9fff\u3400-\u4dbf\uf900-\ufaff\U00020000-\U0002ebef"
    "\u3040-\u309f\u30a0-\u30ff\u31f0-\u31ff"
    "\uac00-\ud7af\u1100-\u11ff\u3130-\u318f\ua960-\ua97f\ud7b0-\ud7ff"
)


def _fold_query(t: str, tokenizer: str) -> str:
    """Language fold of lowered query text — EXACTLY the pre-split transform
    the index-side tokenizer applies (the fold stage of tokenize_XX), so a
    fold-then-split query mirror reproduces the posting tokens."""
    if tokenizer == "german_stem":
        return t.replace("ß", "ss").translate(_FOLD_TABLE)
    if tokenizer in (
        "french_stem", "spanish_stem", "italian_stem", "portuguese_stem",
        "dutch_stem", "swedish_stem", "finnish_stem",
    ):
        return t.translate(_FOLD_TABLE)
    if tokenizer in ("danish_stem", "norwegian_stem"):
        return t.replace("æ", "ae").replace("ø", "o").translate(_FOLD_TABLE)
    if tokenizer == "turkish_stem":
        # Python lower('İ') leaves a combining U+0307 the JVM tokenizer
        # strips (tokenize_turkish) — remove it so both sides agree
        return t.replace("̇", "").translate(_TR_TABLE).translate(_FOLD_TABLE)
    if tokenizer == "hungarian_stem":
        return t.translate(_HU_TABLE).translate(_FOLD_TABLE)
    if tokenizer == "romanian_stem":
        return t.translate(_RO_TABLE).translate(_FOLD_TABLE)
    if tokenizer == "russian_stem":
        return t.replace("ё", "е")
    if tokenizer == "greek_stem":
        return t.translate(_EL_TABLE)
    if tokenizer == "arabic_stem":
        return t.translate(_AR_TABLE)
    return t


def _stem_query_term(t: str, tokenizer: str) -> str:
    stemmers = {
        "english_stem": stem_word, "german_stem": stem_word_de,
        "french_stem": stem_word_fr, "spanish_stem": stem_word_es,
        "italian_stem": stem_word_it, "portuguese_stem": stem_word_pt,
        "russian_stem": stem_word_ru, "dutch_stem": stem_word_nl,
        "swedish_stem": stem_word_sv, "danish_stem": stem_word_da,
        "norwegian_stem": stem_word_no, "finnish_stem": stem_word_fi,
        "turkish_stem": stem_word_tr, "hungarian_stem": stem_word_hu,
        "romanian_stem": stem_word_ro, "greek_stem": stem_word_el,
        "arabic_stem": stem_word_ar, "tamil_stem": stem_word_ta,
    }
    f = stemmers.get(tokenizer)
    return f(t) if f else t


def query_split(text: str, tokenizer: str) -> list[str]:
    """Split raw QUERY text into pre-normalization terms with the SAME gap
    class the index-side tokenizer used (r12 review fix — a
    whitespace-plus-ASCII-punctuation split missed digit terms and CJK
    unigrams under 'unicode', and interior non-ASCII separators under the
    'simple' family, guaranteeing query misses):
      - whitespace: whitespace gaps only, case preserved;
      - unicode family: language fold → CJK chars unigram →
        [^letter/digit]+ gaps (digits are token chars);
      - tokenize ('simple') family: language fold → [^a-z]+ gaps."""
    import re as _re

    if tokenizer == "whitespace":
        return [t for t in text.split() if t]
    _lang_tables()
    t = _fold_query(text.lower(), tokenizer)
    if tokenizer in UNICODE_SPLIT_FAMILY:
        t = _re.sub(f"([{_CJK_RANGES}])", r" \1 ", t)
        return [x for x in _re.split(r"[\W_]+", t) if x]
    return [x for x in _re.split(r"[^a-z]+", t) if x]


def query_tokens(terms: list[str], tokenizer: str) -> list[str]:
    """Normalize already-split query terms the way the named tokenizer
    normalized the postings (driver-side, O(len(query))).

    'whitespace' postings are CASE-PRESERVING, so terms pass through
    verbatim (lowercasing them would make every case-bearing term a
    guaranteed miss). Every other tokenizer strips characters that could
    not survive the index-side split at term edges ('spark,' → 'spark');
    for the unicode family digits are KEPT — they are token characters
    there (r12 review fix)."""
    import re as _re

    if tokenizer == "whitespace":
        return [t for t in terms if t]
    _lang_tables()
    edge = r"^[\W_]+|[\W_]+$" if tokenizer in UNICODE_SPLIT_FAMILY else r"^[\W\d_]+|[\W\d_]+$"
    terms = [_re.sub(edge, "", t.lower()) for t in terms]
    return [_stem_query_term(_fold_query(t, tokenizer), tokenizer) for t in terms if t]


def damerau_levenshtein(a: str, b: str) -> int:
    """True Damerau–Levenshtein distance (adjacent transposition costs 1,
    edits between transposed characters allowed) — the distance tantivy's
    fuzzy automaton uses with transposition_cost_one
    (rust/lance-index/src/scalar/inverted — MatchQuery.fuzziness path).
    Matches DuckDB's ``damerau_levenshtein`` exactly, so value oracles can
    mirror it; NOT the cheaper OSA restriction, which disagrees on cases
    like ('ca','abc')."""
    la, lb = len(a), len(b)
    inf = la + lb
    da: dict[str, int] = {}
    score = [[0] * (lb + 2) for _ in range(la + 2)]
    score[0][0] = inf
    for i in range(la + 1):
        score[i + 1][0] = inf
        score[i + 1][1] = i
    for j in range(lb + 1):
        score[0][j + 1] = inf
        score[1][j + 1] = j
    for i in range(1, la + 1):
        db = 0
        for j in range(1, lb + 1):
            k = da.get(b[j - 1], 0)
            last = db
            if a[i - 1] == b[j - 1]:
                cost = 0
                db = j
            else:
                cost = 1
            score[i + 1][j + 1] = min(
                score[i][j] + cost,          # substitute / match
                score[i + 1][j] + 1,         # insert
                score[i][j + 1] + 1,         # delete
                score[k][last] + (i - k - 1) + 1 + (j - last - 1),  # transpose
            )
        da[a[i - 1]] = i
    return score[la + 1][lb + 1]


def remove_stopwords(tokens, lang: str = "en") -> Column:
    """Stop-word filter stage (tokenizer.rs stop-word list support)."""
    sw = F.array(*[F.lit(s) for s in LANG_STOPWORDS.get(lang, STOPWORDS_EN)])
    return F.filter(tokens, lambda t: ~F.array_contains(sw, t))


def ascii_fold(col) -> Column:
    """ASCII folding (tokenizer.rs ascii_folding): strip common diacritics.
    Derived from the SAME table the driver-side query normalization uses
    (_ASCII_FOLD_SRC/_DST) — two hand-maintained copies drifted apart would
    produce unmatched postings."""
    return F.translate(
        col,
        _ASCII_FOLD_SRC + _ASCII_FOLD_SRC.upper(),
        _ASCII_FOLD_DST + _ASCII_FOLD_DST.upper(),
    )


def hash64(col) -> Column:
    """Engine-portable 60-bit hash: bigint of the first 15 hex chars of md5."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


# Band functions take a PRE-BOUND token-array column. Callers that compute
# several bands over the same text must bind the tokens ONCE
# (`.withColumn("__toks", tokenize(col))` or a separate select) — Catalyst
# does not CSE a repeated tokenize() across projection expressions, so the
# inline forms below evaluate split+filter per band (measured 6.8s → ~2.5s
# at sf0.1 on text_quality_stats; same fix as dedup.py shingles-once).


def token_count_from(toks) -> Column:
    return F.size(toks).cast("long")


def stopword_ratio_from(toks, stopwords: list[str] | None = None) -> Column:
    # an EXPLICIT empty list means "no stopwords, ratio 0" — only None
    # selects the English defaults
    sw = F.array(
        *[F.lit(s) for s in (STOPWORDS_EN if stopwords is None else stopwords)]
    )
    n_sw = F.size(F.filter(toks, lambda t: F.array_contains(sw, t)))
    return n_sw / F.greatest(F.size(toks), F.lit(1))


def quality_score_from(toks, col) -> Column:
    """Composite quality heuristic in [0,1] from pre-bound tokens: length
    band + stopword band + low punctuation. Deterministic arithmetic only."""
    n = token_count_from(toks)
    len_ok = F.when((n >= 10) & (n <= 1000), 1.0).otherwise(0.0)
    sw = stopword_ratio_from(toks)
    sw_ok = F.when((sw >= 0.01) & (sw <= 0.6), 1.0).otherwise(0.0)
    punct_ok = F.when(punct_ratio(col) <= 0.2, 1.0).otherwise(0.0)
    return (len_ok + sw_ok + punct_ok) / 3.0


def lang_id_from(toks) -> Column:
    """Stopword-evidence language ID from pre-bound tokens: highest stopword
    hit count wins; ties resolve in LANG_STOPWORDS order; zero evidence →
    'und'."""

    def hits(words):
        arr = F.array(*[F.lit(w) for w in words])
        return F.size(F.filter(toks, lambda t: F.array_contains(arr, t)))

    scores = {lang: hits(words) for lang, words in LANG_STOPWORDS.items()}
    result = F.lit("und")
    # build CASE from last to first so earlier langs win ties
    mx = F.greatest(*scores.values())
    for lang in reversed(list(LANG_STOPWORDS)):
        result = F.when((scores[lang] == mx) & (mx > 0), F.lit(lang)).otherwise(result)
    return result


# Convenience single-expression forms (tokenize inlined; fine for one-band
# use, use the *_from forms when computing several bands per row).


def token_count(col) -> Column:
    return token_count_from(tokenize(col))


def stopword_ratio(col, stopwords: list[str] | None = None) -> Column:
    return stopword_ratio_from(tokenize(col), stopwords)


def punct_ratio(col) -> Column:
    """Fraction of characters that are not [a-z0-9 ] after lowercasing."""
    total = F.greatest(F.length(col), F.lit(1))
    clean = F.length(F.regexp_replace(F.lower(col), "[^a-z0-9 ]", ""))
    return (F.length(col) - clean) / total


def quality_score(col) -> Column:
    return quality_score_from(tokenize(col), col)


def lang_id(col) -> Column:
    return lang_id_from(tokenize(col))


def fingerprint(col) -> Column:
    """Document fingerprint: md5 of the canonicalized token stream (case/
    punctuation/whitespace-insensitive content identity). NULL text gets a
    NULL fingerprint — concat_ws would otherwise silently equate NULL with
    the empty document and dedup would drop real rows as 'duplicates' of
    missing ones."""
    if isinstance(col, str):  # accept a column name like the other bands
        col = F.col(col)
    return F.when(col.isNotNull(), F.md5(F.concat_ws(" ", tokenize(col))))


def contains_tokens(col, token: str) -> Column:
    """Token-boundary containment (reference udf.rs:51-98 contains_tokens)."""
    return F.array_contains(tokenize(col), token.lower())

"""Text-analysis expressions for the LLM-data-pipeline surface.

Everything here is built from native Spark SQL functions (split,
higher-order array functions, regexp_count, md5/conv) so the hot path
stays inside whole-stage codegen — no Python UDFs.  Each helper has an
exact ANSI-SQL twin used by the DuckDB oracles in
``driver_queries.py``; the portable 60/28-bit hash trick
(``conv(substr(md5(x),1,k),16,10)``) gives identical integers in any
engine with md5, which is what makes MinHash/SimHash/fingerprints
oracle-checkable across engines.

The reference has no text pipeline at all (its text→vector step is an
external HTTP embedding service, ``document_ingestor.py:605-607``);
these operators are the extension surface mandated by BASELINE.json.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: Punctuation-ish characters (keep in sync with the SQL oracles).
PUNCT_PATTERN = r"[^\w\s]"


def quote_ident(name: str) -> str:
    """Backtick-quote a COLUMN NAME for interpolation into ``F.expr``
    strings, escaping embedded backticks by doubling (Spark's
    identifier-quoting convention).  Every operator that splices a
    caller-supplied column name into an expr string routes through
    this (ADVICE r8/r9): raw interpolation both broke legitimate
    names needing quoting and let arbitrary SQL ride in through a
    'column name' parameter."""
    return "`" + name.replace("`", "``") + "`"

#: Marker vocabularies for the n-gram/stopword language-ID heuristic.
#: Deterministic and tiny by design — the classifier is a scoring rule,
#: not a model, so the oracle can replay it exactly.
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "a", "row"],
    "es": ["data", "query", "small"],
    "de": ["table", "window", "batch"],
    "fr": ["join", "merge", "line"],
    "zh": ["hash", "scan", "value"],
}


def tokens(text: Column) -> Column:
    """Whitespace tokenizer (single-space split, like the fixtures)."""
    return F.split(text, " ")


def token_count(text: Column) -> Column:
    return F.size(tokens(text))


def distinct_token_count(text: Column) -> Column:
    return F.size(F.array_distinct(tokens(text)))


def sum_token_len(text: Column) -> Column:
    """Total characters across tokens (basis for avg token length)."""
    return F.aggregate(
        F.transform(tokens(text), lambda t: F.length(t)), F.lit(0), lambda a, x: a + x
    )


def punct_count(text: Column) -> Column:
    return F.regexp_count(text, F.lit(PUNCT_PATTERN))


def bpe_ish_token_count(text: Column) -> Column:
    """Sub-word-ish token count: word chunks + non-space punctuation,
    the cheap stand-in for a BPE tokenizer's piece count."""
    return F.regexp_count(text, F.lit(r"\w+|[^\w\s]"))


def marker_hits(text: Column, word: str) -> Column:
    """Occurrences of an exact token in the text."""
    return F.size(F.filter(tokens(text), lambda t: t == F.lit(word)))


def lang_marker_pattern(lang: str) -> str:
    """Word-boundary alternation over the lang's marker vocabulary —
    shared verbatim with the SQL oracle (Java regex and RE2 agree on
    ``\\b`` and alternation)."""
    return r"\b(" + "|".join(LANG_MARKERS[lang]) + r")\b"


def lang_score(text: Column, lang: str) -> Column:
    """Marker-token occurrences via native ``regexp_count`` — one
    codegen-able expression per lang (the HOF filter form costs an
    interpreted pass over the token array per marker word)."""
    return F.regexp_count(text, F.lit(lang_marker_pattern(lang)))


def lang_id(text: Column) -> Column:
    """First-wins argmax of marker-vocabulary scores: the first lang (in
    LANG_MARKERS order) whose score is >= every other lang's score.

    Implemented as ``array_max`` over (score, priority, lang) structs so
    each score expression appears exactly ONCE in the plan — a CASE
    cascade would copy every score into every branch's predicate
    (O(n²) expression blow-up, measured 8× slower on the fixture).
    Struct comparison orders by score first, then priority, which
    encodes the first-wins tie-break.
    """
    langs = list(LANG_MARKERS)
    entries = [
        F.struct(
            lang_score(text, lang).alias("score"),
            F.lit(len(langs) - i).alias("pri"),  # earlier lang wins ties
            F.lit(lang).alias("lang"),
        )
        for i, lang in enumerate(langs)
    ]
    return F.array_max(F.array(*entries)).getField("lang")


# -- portable hashing --------------------------------------------------------


def portable_hash60(col: Column) -> Column:
    """60-bit positive BIGINT from md5 — identical in Spark and DuckDB
    (``CAST('0x' || substr(md5(x),1,15) AS BIGINT)``)."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


def portable_hash28(col: Column) -> Column:
    """28-bit variant, safe for modular multiplication in int64."""
    return F.conv(F.substring(F.md5(col), 1, 7), 16, 10).cast("long")


def portable_hash40(col: Column) -> Column:
    """40-bit variant, leaving 20 low bits to pack a position alongside
    the hash in one BIGINT (winnowing's (hash, pos) lexicographic min
    becomes a plain integer MIN both engines share)."""
    return F.conv(F.substring(F.md5(col), 1, 10), 16, 10).cast("long")


def word_shingles(text: Column, k: int = 3) -> Column:
    """Distinct k-word shingles as an array of strings.

    ``sequence(0, n-k)`` + ``transform`` + ``slice`` keeps this in
    native expressions; the SQL twin is a list comprehension over
    ``string_split``.
    """
    toks = tokens(text)
    n = F.size(toks)
    shingles = F.array_distinct(
        F.transform(
            F.sequence(F.lit(0), n - k),
            lambda i: F.array_join(F.slice(toks, i + 1, k), " "),
        )
    )
    # Docs shorter than k tokens yield NO shingles (matching the SQL
    # twin's empty range; Spark's sequence() would otherwise count DOWN
    # when n-k < 0).
    return F.when(n >= k, shingles).otherwise(F.array().cast("array<string>"))


def doc_fingerprint(text: Column, k: int = 3) -> Column:
    """Rolling-hash document fingerprint: the minimum 60-bit hash over
    the document's k-word shingles (a 1-permutation MinHash — robust to
    local edits, unlike a whole-text hash)."""
    return F.array_min(F.transform(word_shingles(text, k), lambda s: portable_hash60(s)))


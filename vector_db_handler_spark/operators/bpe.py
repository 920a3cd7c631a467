"""Distributed BPE merge training: the first K byte-pair merges of a
corpus, computed exactly.

No reference analog; extension surface — training a tokenizer ON the
corpus it will tokenize is a standard step of an LLM data pipeline
(Sennrich et al., "Neural Machine Translation of Rare Words with
Subword Units"), and its core loop is a textbook iterative aggregate.

Scale shape (the point): the corpus is touched ONCE — a word-count
groupBy (map-side combined).  Everything after operates on the
DISTINCT-WORD relation weighted by frequency, which is vocabulary-
sized (≪ corpus at any scale; a 100 TB crawl has a few hundred
million distinct words, not 10^13).  Each merge step is one
pair-explode + one map-side-combined SUM over that relation plus a
1-row argmax collect; the merge application is a JVM ``replace``
projection.  K merges = K vocab-relation passes, zero additional
corpus scans.

Merge-application semantics — deliberately pinned to non-overlapping
leftmost string replacement: symbols live as a space-joined string
(`` a b c ``) and applying merge (l, r) is
``replace(sym, ' l r ', ' lr ')``.  Because the match consumes the
pair's trailing separator, immediately-repeating occurrences merge
on ALTERNATE positions per step (``a b a b`` → ``ab a b``, with the
leftover pair winning a later step), unlike the skip-scan in
Sennrich's reference code which merges ``[ab, ab]`` in one step; the
training converges to the same merges over more steps on such
inputs.  In exchange the semantics are bit-identical across every
engine with standard ``replace`` (Spark, DuckDB, Trino, Python
``str.replace``), which makes the whole training loop
oracle-checkable.  Tie-breaks on pair frequency are (count DESC,
left ASC, right ASC) — total and portable.

Input hygiene: only ``^[a-z]+$`` words train (symbols stay quotable
and single-glyph; the fixture corpus is lowercase words anyway) —
real pipelines lowercase/normalize before tokenizer training too.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def word_frequencies(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(w, freq) over lowercase-alpha words — the ONE corpus pass."""
    return (
        docs.select(F.explode(F.split(F.col(text_col), " ")).alias("w"))
        .filter(F.col("w").rlike("^[a-z]+$"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("freq"))
    )


def bpe_train_merges(
    docs: DataFrame,
    n_merges: int = 6,
    text_col: str = "text",
) -> DataFrame:
    """Train the first ``n_merges`` BPE merges; returns one row per
    step: ``(step, left, right, merged, pair_freq)``.

    ``pair_freq`` is the exact corpus-wide frequency of the winning
    adjacent pair at the moment it was chosen."""
    spark: SparkSession = docs.sparkSession
    words = word_frequencies(docs, text_col).withColumn(
        "sym",
        F.concat(
            F.lit(" "),
            F.concat_ws(" ", F.expr("regexp_extract_all(w, '.', 0)")),
            F.lit(" "),
        ),
    )
    # Pin the vocab relation: every step re-reads it, and without the
    # checkpoint each step's action would re-run the corpus groupBy.
    words = words.localCheckpoint(eager=True)

    out: list[tuple] = []
    for step in range(1, n_merges + 1):
        pairs = (
            words.select(
                "freq",
                F.expr(
                    "explode(arrays_zip("
                    "  slice(split(trim(sym), ' '), 1, size(split(trim(sym), ' ')) - 1),"
                    "  slice(split(trim(sym), ' '), 2, size(split(trim(sym), ' ')) - 1)"
                    ")) AS p"
                ),
            )
            .select(F.col("p.0").alias("l"), F.col("p.1").alias("r"), "freq")
            .groupBy("l", "r")
            .agg(F.sum("freq").alias("cnt"))
        )
        best = pairs.orderBy(
            F.col("cnt").desc(), F.col("l").asc(), F.col("r").asc()
        ).limit(1).collect()
        if not best:
            break
        l, r, cnt = best[0]["l"], best[0]["r"], int(best[0]["cnt"])
        out.append((step, l, r, l + r, cnt))
        # F.replace with literal COLUMNS, not an interpolated expr
        # string: l/r come from corpus data, and a token containing a
        # quote or backslash must be data, never SQL syntax (same
        # ADVICE-r9 class as the quote_ident sweep).
        # Lazy: the next step's top-1 collect materializes this
        # boundary in the same action (r15 — the eager form paid one
        # extra scheduling round-trip per merge step).
        words = words.withColumn(
            "sym",
            F.replace(
                F.col("sym"), F.lit(f" {l} {r} "), F.lit(f" {l}{r} ")
            ),
        ).localCheckpoint(eager=False)

    return spark.createDataFrame(
        out, "step int, left string, right string, merged string, pair_freq bigint"
    )


def bpe_segment_words(
    words: DataFrame,
    merges: list[tuple[str, str]],
) -> DataFrame:
    """Apply an ordered merge list to the word relation: adds ``sym``
    (space-joined token string) and ``n_tokens`` per distinct word.
    The merges ride the plan as K chained ``replace`` projections —
    pure codegen, no shuffle, and the SAME replace semantics the
    trainer used, so train→apply round-trips exactly."""
    sym = F.concat(
        F.lit(" "),
        F.concat_ws(" ", F.expr("regexp_extract_all(w, '.', 0)")),
        F.lit(" "),
    )
    out = words.withColumn("sym", sym)
    for l, r in merges:
        # Literal columns, not an interpolated expr string — merge
        # tokens are corpus data and must never be parsed as SQL.
        out = out.withColumn(
            "sym",
            F.replace(
                F.col("sym"), F.lit(f" {l} {r} "), F.lit(f" {l}{r} ")
            ),
        )
    return out.withColumn(
        "n_tokens", F.size(F.split(F.trim(F.col("sym")), " "))
    )

"""Bigram language-model quality scoring — the CCNet-shaped filter,
in exact integer arithmetic.

No reference analog; extension surface.  CCNet (Wenzek et al.) ranks
crawl documents by the perplexity of a small LM trained on trusted
text; the distributed shape of that filter is: (1) ONE corpus pass
building the bigram count relation, (2) score every document by
joining its bigrams against that relation and averaging the
log-probability.  This module implements that shape with a
deliberately engine-exact scoring rule:

    credit(bigram) = floor(log2(count(bigram))) + 1
                   = length(binary(count))            -- exact integer
    doc_score_milli = 1000 · Σ credit / n_bigrams     -- ONE exact
                                                      -- integer division

``floor(log2(n))+1`` is the bit length of the count — computable as
``length(bin(n))`` in Spark and ``length(printf('%b', n))`` in DuckDB,
bit-identical everywhere, monotone in the count, and a faithful stand-
in for the (transcendental, hence never bit-portable) log-probability:
documents made of frequent bigrams score high, rare/garbled ones score
low, EXACTLY the ordering the perplexity filter needs.  A real-valued
perplexity would pin to a tolerance; this pins to a hash.

Scale shape: bigram counting is one map-side-combined shuffle over
exploded bigrams; the model relation is vocabulary², in practice far
smaller than the corpus, and scoring is a broadcast (or shuffle, if
the model outgrows broadcast) join from exploded doc bigrams back to
the model, then one combined per-doc aggregate.  Unknown bigrams
(never seen in the reference slice) earn credit 0 — the smoothing-free
convention, fine for ranking.

Degenerate docs: a document with fewer than two words has zero
bigrams.  Spark's ``sequence(1, 0)`` yields the DESCENDING ``[1, 0]``
(step −1), so the naive transform would index ``element_at(…, 0)`` and
abort the job — crawl corpora routinely contain 1-word/empty texts.
Both entry points therefore guard with ``if(size >= 2, …, array())``:
zero-bigram docs contribute nothing to the model and are absent from
the score relation, exactly matching DuckDB's ``generate_series(1, 0)
= ∅`` semantics the oracles rely on.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from vector_db_handler_spark.functions.text import quote_ident


def _bigrams(text_col: str) -> Column:
    """Adjacent-word-pair array; empty (not a crash) for <2-word docs.

    ``text_col`` is a COLUMN NAME, not an expression (ADVICE r8: the
    raw interpolation broke names needing backticks and let arbitrary
    SQL ride in through the parameter) — it is backtick-quoted before
    entering the expr string, with embedded backticks escaped by
    doubling per Spark's identifier-quoting convention (ADVICE r9:
    rejecting such names outright was an unnecessary usability gap)."""
    c = quote_ident(text_col)
    return F.expr(
        f"if(size(split({c}, ' ')) >= 2,"
        f" transform(sequence(1, size(split({c}, ' ')) - 1),"
        f"  i -> concat(element_at(split({c}, ' '), i), ' ',"
        f"              element_at(split({c}, ' '), i + 1))),"
        f" array())"
    )


def bigram_counts(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(bigram, n) over adjacent word pairs — the model relation."""
    pairs = _bigrams(text_col)
    return (
        docs.select(F.explode(pairs).alias("bigram"))
        .groupBy("bigram")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def lm_doc_scores(
    docs: DataFrame,
    model: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Score every doc against a (bigram, n) model: adds
    ``n_bigrams``, ``credit`` (Σ bit lengths of matched counts) and
    ``score_milli`` (1000·credit div n_bigrams — one exact integer
    division, so the value hash-checks cross-engine).  Docs with zero
    bigrams (<2 words) are absent from the output — no 0/0 row."""
    pairs = _bigrams(text_col)
    exploded = docs.select(F.col(id_col), F.explode(pairs).alias("bigram"))
    credited = exploded.join(model, "bigram", "left").select(
        id_col,
        F.coalesce(F.length(F.bin(F.col("n"))), F.lit(0)).alias("bits"),
    )
    return (
        credited.groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.sum("bits").alias("credit"),
        )
        .withColumn(
            "score_milli",
            F.expr("CAST(1000 * credit AS BIGINT) div n_bigrams"),
        )
    )

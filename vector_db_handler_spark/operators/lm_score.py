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
    # The split is bound ONCE via a single-element transform lambda
    # (r15 optimization): the previous form re-evaluated
    # ``split({c}, ' ')`` inside the per-element lambda —
    # higher-order-function bodies are interpreted and not subject to
    # subexpression elimination, so every element paid an O(words)
    # re-split and the whole expression was O(words²) per document.
    # ``zip_with`` over two slices of the bound array is O(words);
    # short/empty/NULL docs still yield array() exactly as before
    # (size(NULL) is not >= 2, so the if falls through).
    return F.expr(
        f"element_at(transform(array(split({c}, ' ')), ws ->"
        " if(size(ws) >= 2,"
        "  zip_with(slice(ws, 1, size(ws) - 1), slice(ws, 2, size(ws) - 1),"
        "   (w1, w2) -> concat(w1, ' ', w2)),"
        "  array())), 1)"
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


def dsir_importance(
    docs: DataFrame,
    target_docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """DSIR-shaped importance weights (Xie et al., NeurIPS'23 "Data
    Selection via Importance Resampling"): weight every candidate
    document by ``log p_target(doc) − log p_source(doc)`` — how much
    more the TRUSTED-slice language model likes it than the
    background model does.  This is the principled upgrade of the
    one-model CCNet filter above (`lm_quality_by_lang`): a doc of
    merely COMMON text scores high under both models and cancels out;
    a doc that is common *in the target domain specifically* keeps a
    positive weight — the signal importance resampling selects on.

    Both log-probs use this module's engine-exact credit rule, so the
    weight is an exact integer:
    ``weight_milli = target_score_milli − source_score_milli`` with
    each score the bit-length-credit average the oracles replay.
    Returns ``(doc_id, n_bigrams, target_milli, source_milli,
    weight_milli)``; docs with zero bigrams are absent (no 0/0 row —
    same convention as :func:`lm_doc_scores`).  Full DSIR resamples
    with Gumbel noise; the deterministic, hash-checkable rail here is
    the weight computation plus top-k/threshold selection — the
    randomness, if wanted, belongs at the caller under an explicit
    seed.

    Scale shape: two bigram-count model relations (each one map-side-
    combined shuffle — the target model over the small trusted slice,
    the source model over the corpus), ONE shared explode of the
    candidate docs' bigrams joined against both models in one pass
    (left joins on the same key — no second explode), one combined
    per-doc aggregate.  Model relations broadcast when small, shuffle
    otherwise; never a cross product."""
    pairs = _bigrams(text_col)
    exploded = docs.select(F.col(id_col), F.explode(pairs).alias("bigram"))
    tgt = bigram_counts(target_docs, text_col).withColumnRenamed("n", "n_t")
    src = bigram_counts(docs, text_col).withColumnRenamed("n", "n_s")
    credited = (
        exploded.join(tgt, "bigram", "left")
        .join(src, "bigram", "left")
        .select(
            id_col,
            F.coalesce(F.length(F.bin(F.col("n_t"))), F.lit(0)).alias("bits_t"),
            F.coalesce(F.length(F.bin(F.col("n_s"))), F.lit(0)).alias("bits_s"),
        )
    )
    agg = credited.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_bigrams"),
        F.sum("bits_t").alias("credit_t"),
        F.sum("bits_s").alias("credit_s"),
    )
    t_milli = F.expr("CAST(1000 * credit_t AS BIGINT) div n_bigrams")
    s_milli = F.expr("CAST(1000 * credit_s AS BIGINT) div n_bigrams")
    return agg.select(
        id_col,
        "n_bigrams",
        t_milli.alias("target_milli"),
        s_milli.alias("source_milli"),
        (t_milli - s_milli).cast("long").alias("weight_milli"),
    )


def domain_mixture_weights(
    docs: DataFrame,
    domain_col: str = "lang",
    text_col: str = "text",
    n_rounds: int = 2,
    base: int = 4000,
) -> DataFrame:
    """Domain mixture reweighting in the DoReMi spirit (Xie et al.,
    NeurIPS'23): Group-DRO-style multiplicative upweighting of the
    domains the corpus-level model serves WORST — the knob a
    pretraining pipeline turns to decide how much of each domain goes
    into the next mix.  Deterministic distillation: "loss" is the
    repo's exact bigram-credit surrogate (bit-length of the model
    count — high credit = well-modeled), the hardness signal is

        excess_milli(d) = corpus_avg_credit_milli
                        − domain_avg_credit_milli(d)

    (positive exactly for the domains the one-corpus model predicts
    worse than its global average — the underserved mixture
    components), and the multiplicative-weights update is iterated
    ``n_rounds`` times in EXACT integers with the linearized
    exponential the Hedge analysis permits for small steps:

        u_T(d) = (base + excess_milli(d))^T       -- exact BIGINT
        share(d) = ROUND(u_T / Σ u_T, 6)          -- one IEEE division

    Published DoReMi retrains the proxy between rounds; this lite
    form iterates the reweighting against the STATIC excess (the
    honest one-pass distributed reduction — each extra round just
    sharpens the same ordering), which is what makes the whole
    readout hash-checkable.

    Returns ``(domain, n_docs, n_bigrams, credit_milli, excess_milli,
    weight_numer, weight_share)``.

    Scale shape: ONE bigram explode feeds both the corpus model and
    the per-domain credit rollup; the model join is vocabulary-sized;
    the weight arithmetic runs on |domains| rows against a 1-row
    broadcast global."""
    if n_rounds < 1:
        raise ValueError(f"n_rounds must be >= 1, got {n_rounds}")
    if base <= 0:
        raise ValueError(f"base must be positive, got {base}")
    # r12 ADVICE: u^n_rounds is BIGINT arithmetic and silently wraps
    # in non-ANSI Spark.  excess_milli ≤ 1000·64 by construction (the
    # credit is a bit-length ≤ 64, so credit_milli ≤ 64000), so the
    # worst-case numerator is (base + 64000)^n_rounds — check it
    # against int64 EXACTLY (Python ints) and fail loudly.
    max_u = int(base) + 64000
    if max_u ** int(n_rounds) > 2**63 - 1:
        raise ValueError(
            f"n_rounds={n_rounds} with base={base} can overflow BIGINT: "
            f"worst-case weight_numer ({max_u}^{n_rounds}) exceeds int64; "
            "reduce n_rounds (or base)"
        )
    pairs = _bigrams(text_col)
    exploded = docs.filter(F.col(domain_col).isNotNull()).select(
        F.col(domain_col).alias("domain"), F.explode(pairs).alias("bigram")
    )
    model = exploded.groupBy("bigram").agg(F.count(F.lit(1)).alias("n"))
    credited = exploded.join(model, "bigram").select(
        "domain", F.length(F.bin(F.col("n"))).alias("bits")
    )
    per_domain = credited.groupBy("domain").agg(
        F.count(F.lit(1)).alias("n_bigrams"),
        F.sum("bits").alias("credit"),
    )
    glob = per_domain.groupBy().agg(
        F.sum("n_bigrams").alias("tot_bigrams"),
        F.sum("credit").alias("tot_credit"),
    )
    n_docs = (
        docs.filter(F.col(domain_col).isNotNull())
        .groupBy(F.col(domain_col).alias("domain"))
        .agg(F.count(F.lit(1)).cast("long").alias("n_docs"))
    )
    d_milli = F.expr("CAST(1000 * credit AS BIGINT) div n_bigrams")
    g_milli = F.expr("CAST(1000 * tot_credit AS BIGINT) div tot_bigrams")
    scored = (
        per_domain.crossJoin(F.broadcast(glob))
        .select(
            "domain",
            F.col("n_bigrams").cast("long").alias("n_bigrams"),
            d_milli.alias("credit_milli"),
            (g_milli - d_milli).cast("long").alias("excess_milli"),
        )
    )
    # u_T = (base + excess)^T, floored at 1 so a hyper-dominant domain
    # keeps an (epsilon) share instead of a zero/negative numerator.
    u = F.greatest(F.lit(1).cast("long"), F.lit(int(base)) + F.col("excess_milli"))
    numer = u
    for _ in range(int(n_rounds) - 1):
        numer = numer * u
    scored = scored.withColumn("weight_numer", numer.cast("long"))
    tot = scored.groupBy().agg(F.sum("weight_numer").alias("tot_numer"))
    return (
        scored.crossJoin(F.broadcast(tot))
        .join(n_docs, "domain")
        .select(
            "domain",
            "n_docs",
            "n_bigrams",
            "credit_milli",
            "excess_milli",
            "weight_numer",
            F.round(
                F.col("weight_numer").cast("double") / F.col("tot_numer"), 6
            ).alias("weight_share"),
        )
    )


def pmi_collocations(
    docs: DataFrame,
    text_col: str = "text",
    min_count: int = 5,
    k: int = 50,
) -> DataFrame:
    """Top-``k`` COLLOCATIONS by exact-integer PMI lift — the
    "strongly-associated adjacent token pairs" rail of tokenizer and
    phrase-vocabulary construction (merge candidates for a BPE/
    WordPiece vocabulary, stop-phrase lists for dedup shingling,
    multi-word entity seeds).

    PMI(x, y) = log p(xy) / (p(x) p(y)) with p(xy) = n_xy / N_big,
    p(t) = n_t / N_tok.  The log is monotone, so ranking by the
    RATIO needs no transcendental — and the ratio is computed as ONE
    exact integer division in DECIMAL(38,0):

        lift_micro = (10^6 · n_xy · N_tok²) div (N_big · n_x · n_y)

    (numerator ≤ 10^6·n_xy·N_tok² — 38 digits hold it for corpora up
    to ~10^12 tokens; the quotient is ≤ 10^6·N_tok²/N_big ≈ 10^6·N_tok
    and must fit BIGINT, which the same bound covers).  Hash-exact in
    both engines: Spark ``div`` on DECIMAL(38,0) and DuckDB HUGEINT
    ``//`` both truncate toward zero on non-negative operands.

    ``min_count`` drops pairs with n_xy below it — the standard PMI
    guard (rare pairs have the highest raw PMI by chance alone).

    Output: ``(x, y, n_xy, n_x, n_y, lift_micro)`` — the top ``k`` by
    (lift_micro DESC, x ASC, y ASC); (x, y) is unique so the order is
    total and the LIMIT deterministic.

    Scale shape: two map-side-combined wordcount shuffles (unigrams,
    adjacent pairs — Zipf skew absorbed by partial aggregation), two
    vocabulary-sized joins back to the pair relation (AQE broadcasts
    them when the vocabulary fits, shuffles otherwise), one scalar
    totals broadcast, then TakeOrderedAndProject — no corpus-sized
    sort anywhere.  No reference analog; extension surface."""
    if min_count < 1:
        raise ValueError(f"min_count must be >= 1, got {min_count}")
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    c = quote_ident(text_col)
    toks = F.expr(f"split({c}, ' ')")
    uni = (
        docs.select(F.explode(toks).alias("tok"))
        .groupBy("tok")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )
    pairs = (
        docs.select(
            F.explode(
                # Same one-bound-split rewrite as _bigrams (r15): the
                # per-element re-split made this O(words²) per doc.
                F.expr(
                    f"element_at(transform(array(split({c}, ' ')), ws ->"
                    " if(size(ws) >= 2,"
                    "  zip_with(slice(ws, 1, size(ws) - 1),"
                    "           slice(ws, 2, size(ws) - 1),"
                    "   (w1, w2) -> struct(w1 AS x, w2 AS y)),"
                    "  array())), 1)"
                )
            ).alias("p")
        )
        .select("p.x", "p.y")
        .groupBy("x", "y")
        .agg(F.count(F.lit(1)).cast("long").alias("n_xy"))
        .filter(F.col("n_xy") >= int(min_count))
    )
    totals = uni.groupBy().agg(
        F.sum("n").cast("decimal(38,0)").alias("n_tok")
    )
    n_big = (
        docs.select(
            F.greatest(
                F.lit(0).cast("long"), (F.size(toks) - 1).cast("long")
            ).alias("nb")
        )
        .groupBy()
        .agg(F.sum("nb").cast("decimal(38,0)").alias("n_big"))
    )
    j = (
        pairs.join(uni.select(F.col("tok").alias("x"), F.col("n").alias("n_x")), "x")
        .join(uni.select(F.col("tok").alias("y"), F.col("n").alias("n_y")), "y")
        .crossJoin(F.broadcast(totals))
        .crossJoin(F.broadcast(n_big))
    )
    lift = F.expr(
        "(CAST(1000000 AS DECIMAL(38,0)) * n_xy * n_tok * n_tok)"
        " div (n_big * n_x * n_y)"
    )
    return (
        j.select(
            "x",
            "y",
            "n_xy",
            "n_x",
            "n_y",
            lift.cast("long").alias("lift_micro"),
        )
        .orderBy(F.col("lift_micro").desc(), F.col("x").asc(), F.col("y").asc())
        .limit(int(k))
    )

"""Multinomial Naive Bayes text classifier in exact integer
arithmetic — the LEARNED quality/domain filter of a pretraining
pipeline (CCNet trains a fastText language/quality model; GPT-3's
curation trained a quality classifier over Common Crawl).  This is the
distributed, hash-replayable shape of that component:

* **Training is ONE counting pass** — multinomial NB's sufficient
  statistics are per-(label, word) token counts plus per-label doc and
  token totals, all map-side-combined ``groupBy`` aggregates.  No
  gradient loop, no driver-side state: the "model" is a relation,
  exactly like the bigram-LM model (`lm_score.py`) and the BPE merge
  table (`bpe.py`).
* **Log-probabilities are exact fixed-point integers.**  The repo's
  bit-length credit (`lm_score.py`) is log2 at 1-bit granularity —
  too coarse for class-conditional RATE ratios (a 1.3× rate gap is
  ~0.4 bits).  Here the surrogate is the classic piecewise-linear
  integer log2 at 1/1024-bit resolution:

      L(n) = 1024·e + (1024·n div 2^e) − 1024,   e = bitlen(n) − 1

  (the exponent-plus-linear-mantissa rule floating-point formats use;
  max error < 0.09 bits, strictly monotone, pure integer ops — so it
  replays bit-for-bit in any engine).  With add-one (Laplace)
  smoothing the whole log-posterior folds into three integer terms:

      score(d, c) = prior(c) + Σ_w census(d, w)·L(n_wc + 1)
                             − n_d·L(T_c + V)
      prior(c)    = L(docs(c)) − L(docs)      ≈ 1024·log2 p̂(c)

  where ``n_wc`` = training count of word w under label c (only
  n_wc ≥ 1 rows are materialized — a smoothed zero count contributes
  L(1) = 0 to the sum), ``T_c`` = label c's token total, ``V`` = the
  training vocabulary size, and ``n_d`` = the document's token count.
  This is exactly multinomial NB with Laplace smoothing, re-arranged
  so unseen words cost each label its own smoothed floor via the
  ``n_d·L(T_c+V)`` term rather than a per-word lookup.  The per-class
  normalization is what makes this a conditional-rate model rather
  than a majority-class detector (measured 20% → 70% holdout accuracy
  on the fixture distillation task), and the smoothing is what keeps
  a no-evidence label from outscoring a strong-evidence one.
* **Argmax + margin** — prediction is the (score DESC, label ASC)
  argmax (deterministic tie-break, pinned); ``margin`` = best −
  runner-up is the confidence a production filter thresholds.

Scale shape (100 TB): the doc census is one (doc, word) map-side-
combined shuffle; the model is vocabulary × |labels| rows (data-scale
invariant); credit attachment is an equi-join on ``word`` — broadcast
when the model is small, plain shuffle join otherwise, never a
cross-product; the label grid is a |labels|-row broadcast
nested-loop (bounded by the label vocabulary, like the repo's 1-row
scalar crosses); the argmax window runs over |labels| rows per doc.
No collect, no per-row Python.

No reference analog (the reference has no classification surface;
its only text processing is chunk/embed,
``app/core/document_ingestor.py``); LLM-pipeline extension from the
builder brief, next to ``lm_score.py``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def ilog2_kilo(n: Column) -> Column:
    """Exact fixed-point log2 at 1/1024-bit resolution:
    ``1024·(bitlen(n)−1) + (1024·n div 2^(bitlen(n)−1)) − 1024``.
    Strictly monotone in ``n`` (n ≥ 1), pure integer arithmetic —
    the cross-engine-exact stand-in for ``1024·log2(n)`` (max error
    < 0.09 bits).  NULL for n NULL; caller guarantees n ≥ 1."""
    e = (F.length(F.bin(n)) - F.lit(1)).cast("int")
    # shiftright by a COLUMN exponent == exact div by 2^e for the
    # non-negative 1024·n (the SQL shiftright expression accepts any
    # expression for the shift, unlike the typed F.shiftright wrapper).
    mant = F.call_function(
        "shiftright", F.lit(1024).cast("long") * n.cast("long"), e
    )
    return (F.lit(1024).cast("long") * e + mant - F.lit(1024)).cast("long")


def nb_train(
    docs: DataFrame,
    label_col: str = "lang",
    text_col: str = "text",
    id_col: str = "doc_id",
) -> tuple[DataFrame, DataFrame]:
    """Train multinomial NB: returns ``(model, priors)``.

    ``model``: ``(label, word, n, bits)`` where ``bits = L(n + 1)``
    in 1/1024-bit units (the smoothed numerator credit).  ``priors``:
    ``(label, n_docs, prior_credit, norm)`` with ``prior_credit =
    L(n_docs) − L(total_docs)`` and ``norm = L(T_label + V)`` (the
    per-token smoothed denominator each document token pays).  One
    scan, map-side-combined aggregates, |labels|-row broadcasts; null
    labels/texts drop declaratively."""
    labeled = docs.filter(
        F.col(label_col).isNotNull() & F.col(text_col).isNotNull()
    )
    counts = (
        labeled.select(
            F.col(label_col).alias("label"),
            F.explode(F.split(F.col(text_col), " ")).alias("word"),
        )
        .groupBy("label", "word")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    model = counts.select(
        "label",
        "word",
        "n",
        ilog2_kilo(F.col("n") + F.lit(1)).alias("bits"),
    )
    totals = counts.groupBy("label").agg(F.sum("n").alias("t_tokens"))
    vocab = counts.select("word").distinct().groupBy().agg(
        F.count(F.lit(1)).alias("v")
    )
    by_label = labeled.groupBy(F.col(label_col).alias("label")).agg(
        F.count(F.lit(1)).alias("n_docs")
    )
    n_total = labeled.groupBy().agg(F.count(F.lit(1)).alias("n_total"))
    priors = (
        by_label.crossJoin(F.broadcast(n_total))
        .join(F.broadcast(totals), "label")
        .crossJoin(F.broadcast(vocab))
        .select(
            "label",
            "n_docs",
            (
                ilog2_kilo(F.col("n_docs")) - ilog2_kilo(F.col("n_total"))
            ).alias("prior_credit"),
            ilog2_kilo(F.col("t_tokens") + F.col("v")).alias("norm"),
        )
    )
    return model, priors


def nb_classify(
    docs: DataFrame,
    model: DataFrame,
    priors: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    broadcast_model: bool = True,
) -> DataFrame:
    """Score every document against every label and take the argmax.

    Returns ``(doc_id, predicted, score, margin)`` — exact integers in
    1/1024-bit units (scores are typically negative: summed
    log-probabilities); ``margin`` = best − runner-up (0 on a tie or a
    single label), the confidence dial.  Ties break to the
    lexicographically smallest label, pinned so the SQL twin replays
    the same winner.

    ``broadcast_model=False`` switches the credit attachment to a
    plain shuffle equi-join for vocabulary sizes past broadcast range
    (the 100 TB setting); the plan is otherwise identical."""
    docs = docs.filter(F.col(text_col).isNotNull())
    census = (
        docs.select(
            F.col(id_col),
            F.explode(F.split(F.col(text_col), " ")).alias("word"),
        )
        .groupBy(id_col, "word")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    credits = model.select("label", "word", "bits")
    if broadcast_model:
        credits = F.broadcast(credits)
    evidence = (
        census.join(credits, "word")
        .groupBy(id_col, "label")
        .agg(F.sum(F.col("cnt") * F.col("bits")).alias("word_credit"))
    )
    doc_len = census.groupBy(id_col).agg(F.sum("cnt").alias("n_tokens"))
    # Full doc × label grid (|labels|-row broadcast) so a doc with zero
    # in-vocabulary words for some label still pays that label's
    # smoothed floor and carries its prior into the argmax.
    grid = doc_len.crossJoin(
        F.broadcast(priors.select("label", "prior_credit", "norm"))
    )
    scored = grid.join(evidence, [id_col, "label"], "left").select(
        id_col,
        "label",
        (
            F.col("prior_credit")
            + F.coalesce(F.col("word_credit"), F.lit(0))
            - F.col("n_tokens") * F.col("norm")
        ).alias("score"),
    )
    w = Window.partitionBy(id_col).orderBy(
        F.col("score").desc(), F.col("label").asc()
    )
    ranked = scored.select(
        id_col,
        "label",
        "score",
        F.row_number().over(w).alias("rn"),
        F.lead("score", 1).over(w).alias("runner_up"),
    ).filter(F.col("rn") == 1)
    return ranked.select(
        id_col,
        F.col("label").alias("predicted"),
        F.col("score").cast("long").alias("score"),
        F.coalesce(F.col("score") - F.col("runner_up"), F.lit(0))
        .cast("long")
        .alias("margin"),
    )


def nb_holdout_confusion(
    docs: DataFrame,
    label_col: str = "lang",
    text_col: str = "text",
    id_col: str = "doc_id",
    holdout_modulus: int = 5,
) -> DataFrame:
    """Train on the ``id % holdout_modulus != 0`` slice, classify the
    held-out slice, roll up the confusion matrix — the generalization
    check a production filter ships with (training accuracy alone
    cannot justify a keep/drop threshold).  Pass a rule-derived label
    column (e.g. ``lang_id(text)``) to DISTILL a heuristic into the
    one-pass model.

    Returns ``(true_label, predicted, n_docs, sum_margin)`` — compact,
    deterministic, fully SQL-replayable."""
    labeled = docs.filter(
        F.col(label_col).isNotNull() & F.col(text_col).isNotNull()
    )
    train = labeled.filter(F.col(id_col) % holdout_modulus != 0)
    heldout = labeled.filter(F.col(id_col) % holdout_modulus == 0)
    model, priors = nb_train(train, label_col, text_col, id_col)
    pred = nb_classify(heldout, model, priors, text_col, id_col)
    truth = heldout.select(F.col(id_col), F.col(label_col).alias("true_label"))
    return (
        pred.join(truth, id_col)
        .groupBy("true_label", "predicted")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("margin").cast("long").alias("sum_margin"),
        )
    )


def nb_margin_calibration(
    docs: DataFrame,
    label_col: str = "lang",
    text_col: str = "text",
    id_col: str = "doc_id",
    holdout_modulus: int = 5,
) -> DataFrame:
    """Calibration curve for the NB filter's confidence dial: bucket
    held-out predictions by the MARGIN (best − runner-up, the exact
    integer `nb_classify` emits) on a log2 scale and report accuracy
    per bucket — the reliability diagram a production keep/drop
    threshold is actually read off (the confusion matrix says how
    good the model is; this says WHERE to put the knife).

    ``margin_bucket = bitlen(margin // 1024 + 1) − 1`` — bucket 0 is
    "under 1 bit of margin (incl. ties)", bucket b is
    ``[2^(b-1), 2^b)`` whole bits; exact integer arithmetic both
    engines replay (the same bitlen-via-binary-string trick as
    :func:`ilog2_kilo`).  Returns ``(margin_bucket, n_docs,
    n_correct, accuracy)``, accuracy = a single exact-integer
    division rounded to 6.

    Scale shape: identical to :func:`nb_holdout_confusion` (one
    census shuffle, vocabulary-sized model join, |labels|-row argmax
    grid) plus one |buckets|-row rollup.  The margin histogram is
    log2-bucketed so the output stays ~60 rows no matter the corpus."""
    labeled = docs.filter(
        F.col(label_col).isNotNull() & F.col(text_col).isNotNull()
    )
    train = labeled.filter(F.col(id_col) % holdout_modulus != 0)
    heldout = labeled.filter(F.col(id_col) % holdout_modulus == 0)
    model, priors = nb_train(train, label_col, text_col, id_col)
    pred = nb_classify(heldout, model, priors, text_col, id_col)
    truth = heldout.select(F.col(id_col), F.col(label_col).alias("true_label"))
    margin_bits = F.floor(F.col("margin") / F.lit(1024)).cast("long")
    bucket = (F.length(F.bin(margin_bits + F.lit(1))) - F.lit(1)).cast("long")
    scored = pred.join(truth, id_col).select(
        bucket.alias("margin_bucket"),
        (F.col("predicted") == F.col("true_label")).cast("long").alias("ok"),
    )
    return scored.groupBy("margin_bucket").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("ok").cast("long").alias("n_correct"),
        F.round(
            F.sum("ok").cast("double") / F.count(F.lit(1)).cast("double"), 6
        ).alias("accuracy"),
    )

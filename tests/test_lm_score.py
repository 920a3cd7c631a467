"""Bigram-LM quality scores: credit rule, unknown-bigram handling,
and the cross-domain separation that makes the filter useful."""

from __future__ import annotations

from pyspark.sql import functions as F

from vector_db_handler_spark.operators.lm_score import bigram_counts, lm_doc_scores
from vector_db_handler_spark.sources.tables import load_table


def test_credit_is_bit_length_and_unknowns_are_zero(spark):
    train = spark.createDataFrame(
        [(i, "a b") for i in range(7)], "doc_id long, text string"
    )
    model = bigram_counts(train)  # {"a b": 7}
    docs = spark.createDataFrame(
        [(1, "a b a b"), (2, "x y")], "doc_id long, text string"
    )
    got = {r.doc_id: r for r in lm_doc_scores(docs, model).collect()}
    # doc 1: bigrams [a b, b a, a b] -> credits [3, 0, 3] (7 = 0b111)
    assert got[1].n_bigrams == 3 and got[1].credit == 6
    assert got[1].score_milli == 2000
    # doc 2: both bigrams unseen
    assert got[2].credit == 0 and got[2].score_milli == 0


def test_short_docs_do_not_crash_and_are_dropped(spark):
    # Crawl corpora contain 1-word and empty texts; sequence(1, 0) is the
    # DESCENDING [1, 0] in Spark, so the unguarded transform aborts the
    # job with INVALID_ARRAY_INDEX_IN_ELEMENT_AT (ADVICE r7).  The guard
    # must (a) not crash and (b) drop zero-bigram docs, matching the
    # DuckDB oracle's generate_series(1, 0) = empty semantics.
    train = spark.createDataFrame(
        [(0, "a b"), (1, "solo"), (2, "")], "doc_id long, text string"
    )
    model = bigram_counts(train)
    assert {r.bigram: r.n for r in model.collect()} == {"a b": 1}
    docs = spark.createDataFrame(
        [(1, "a b a"), (2, "solo"), (3, "")], "doc_id long, text string"
    )
    got = {r.doc_id: r for r in lm_doc_scores(docs, model).collect()}
    assert set(got) == {1}  # zero-bigram docs absent, not 0/0 rows
    assert got[1].n_bigrams == 2


def test_english_model_separates_languages(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    model = bigram_counts(docs.filter(F.col("lang") == "en"))
    per_lang = {
        r.lang: r.mean_milli
        for r in lm_doc_scores(docs, model)
        .join(docs.select("doc_id", "lang"), "doc_id")
        .groupBy("lang")
        .agg((F.sum("score_milli") / F.count(F.lit(1))).alias("mean_milli"))
        .collect()
    }
    en = per_lang.pop("en")
    assert all(en > v for v in per_lang.values()), per_lang | {"en": en}


def test_bigrams_quotes_awkward_column_names(spark):
    """ADVICE r8+r9: a column name needing backticks must work, and a
    name CONTAINING a backtick must be escaped by doubling (Spark's
    identifier-quoting convention) — usable as a name, never parsed as
    an expression."""
    from pyspark.sql import functions as F

    from vector_db_handler_spark.operators import lm_score

    df = spark.createDataFrame(
        [(1, "a b c")], "doc_id long, `my text.col` string"
    ).withColumnRenamed("my text.col", "my text.col")
    out = df.select(lm_score._bigrams("my text.col").alias("bg")).collect()
    assert out[0]["bg"] == ["a b", "b c"]

    # A backtick IN the name is data, not syntax: the doubled-backtick
    # escape resolves the literal column, so an expression smuggled
    # through the parameter is looked up as a (missing) identifier —
    # an AnalysisException, never executed SQL.
    hostile = "x`) ; drop --"
    df2 = spark.createDataFrame([(1, "p q")], "doc_id long, v string").select(
        "doc_id", F.col("v").alias(hostile)
    )
    out2 = df2.select(lm_score._bigrams(hostile).alias("bg")).collect()
    assert out2[0]["bg"] == ["p q"]

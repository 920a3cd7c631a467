"""DSIR importance weighting: planted domain separation, the
common-text cancellation property the one-model filter lacks, edge
conventions, and the cross-engine DuckDB replay.  Staged in r11 for
r12 driver registration."""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.oracle_check import compare
from vector_db_handler_spark import driver_queries as dq
from vector_db_handler_spark.operators.lm_score import dsir_importance

#: The registered oracle (moved into driver_queries.py in r12).
ORACLE_SQL = dq._DSIR_SQL


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def _lang_report(docs):
    """The rollup shape the r12 registration will use."""
    w = dsir_importance(
        docs, docs.filter(F.col("lang") == "en"), text_col="text"
    )
    return (
        w.join(docs.select("doc_id", "lang"), "doc_id")
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("weight_milli").alias("sum_weight_milli"),
            F.min("weight_milli").alias("min_weight_milli"),
            F.max("weight_milli").alias("max_weight_milli"),
            F.sum((F.col("weight_milli") > 0).cast("long")).alias("n_positive"),
        )
    )


def test_target_domain_docs_outweigh_background(spark):
    """Docs built from the target slice's bigrams must carry strictly
    higher weight than docs of background-only bigrams."""
    target = _docs(
        spark, [(100 + i, "alpha beta gamma delta") for i in range(5)]
    )
    docs = _docs(
        spark,
        [(1, "alpha beta gamma"), (2, "zeta eta theta"), (3, "alpha beta")],
    ).unionByName(target)
    w = {r["doc_id"]: r["weight_milli"] for r in dsir_importance(docs, target).collect()}
    assert w[1] > w[2] and w[3] > w[2]
    assert w[2] < 0  # background-only text: source credit, no target credit


def test_common_text_cancels_out(spark):
    """A bigram equally frequent in target and source earns equal
    credits — weight 0 — where the one-model filter would rank it
    high.  (Target slice == corpus makes every doc cancel exactly.)"""
    docs = _docs(
        spark,
        [(1, "the common phrase"), (2, "the common phrase"), (3, "rare words here")],
    )
    out = dsir_importance(docs, docs).collect()
    assert all(r["weight_milli"] == 0 for r in out)


def test_zero_bigram_docs_are_absent(spark):
    docs = _docs(spark, [(1, "one"), (2, ""), (3, "two words")])
    got = [r["doc_id"] for r in dsir_importance(docs, docs).collect()]
    assert got == [3]


def test_weight_is_exact_difference_of_scores(spark):
    """Hand check: doc 'a b' (1 bigram).  Target has 'a b' x3 ⇒
    credit_t = bitlen(3) = 2; source (all docs) has it x4 (3 target
    copies + the doc itself... the doc IS in docs) — construct
    explicitly: target 3 copies, docs = target + this doc ⇒ n_s = 4,
    credit_s = 3.  weight = 2000 − 3000 = −1000."""
    target = _docs(spark, [(10, "a b"), (11, "a b"), (12, "a b")])
    docs = target.unionByName(_docs(spark, [(1, "a b")]))
    w = {r["doc_id"]: r for r in dsir_importance(docs, target).collect()}
    r = w[1]
    assert (r["target_milli"], r["source_milli"], r["weight_milli"]) == (
        2000,
        3000,
        -1000,
    )


def test_en_slice_separates_on_fixture(spark, sf_dir):
    """The registration's claim: against an en-trained target model,
    the en language group carries the highest mean weight."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    rows = {r["lang"]: r for r in _lang_report(docs).collect()}
    means = {
        lang: r["sum_weight_milli"] / r["n_docs"] for lang, r in rows.items()
    }
    assert max(means, key=means.get) == "en", means


def test_cross_engine_oracle_replay(spark, sf_dir, duck):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    compare(_lang_report(docs), duck, ORACLE_SQL)

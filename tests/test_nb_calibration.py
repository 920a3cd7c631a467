"""NB margin calibration (reliability curve): planted
high-margin-right / tie-wrong semantics, exact bucket arithmetic, and
the cross-engine DuckDB replay.  Staged in r11 for r12 driver
registration."""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.oracle_check import compare
from vector_db_handler_spark import driver_queries as dq
from vector_db_handler_spark.functions import text as text_fns
from vector_db_handler_spark.operators.nb_classifier import (
    nb_margin_calibration,
)

#: The registered oracle (moved into driver_queries.py in r12).
ORACLE_SQL = dq._NB_CALIBRATION_SQL


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, lang string, text string")


def test_tied_predictions_land_in_bucket_zero(spark):
    """A held-out doc of only unseen words ties every label (margin 0)
    ⇒ bucket 0.  With two training labels the tie-break picks 'aa';
    truth 'aa' ⇒ bucket 0 is 100% accurate here."""
    rows = [
        (1, "aa", "alpha alpha"),
        (2, "bb", "beta beta"),
        (5, "aa", "zzz qqq"),  # held out (5 % 5 == 0), all unseen
    ]
    out = nb_margin_calibration(_docs(spark, rows)).collect()
    assert len(out) == 1
    r = out[0]
    assert (r["margin_bucket"], r["n_docs"], r["n_correct"]) == (0, 1, 1)
    assert r["accuracy"] == 1.0


def test_strong_evidence_lands_in_higher_buckets(spark):
    """Disjoint vocabularies with long held-out docs: per-token margin
    is L(cnt+1)-level, so a 32-token doc clears several whole bits —
    its bucket must be > 0 and its prediction correct."""
    rows = []
    for i in range(1, 21):
        rows.append((2 * i, "aa", "alpha beta gamma alpha"))
        rows.append((2 * i + 1, "bb", "delta epsilon zeta zeta"))
    rows.append((105, "aa", " ".join(["alpha"] * 32)))
    rows.append((110, "bb", " ".join(["zeta"] * 32)))
    out = {r["margin_bucket"]: r for r in nb_margin_calibration(_docs(spark, rows)).collect()}
    hi = [b for b in out if b > 0]
    assert hi, out
    for b in hi:
        assert out[b]["accuracy"] == 1.0


def test_buckets_partition_the_holdout(spark):
    rows = [(i, "aa" if i % 2 == 0 else "bb",
             "alpha beta" if i % 2 == 0 else "gamma delta")
            for i in range(1, 40)]
    out = nb_margin_calibration(_docs(spark, rows)).collect()
    heldout = [i for i in range(1, 40) if i % 5 == 0]
    assert sum(r["n_docs"] for r in out) == len(heldout)
    for r in out:
        assert 0 <= r["n_correct"] <= r["n_docs"]


def test_cross_engine_oracle_replay(spark, sf_dir, duck):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").withColumn(
        "rule_lang", text_fns.lang_id(F.col("text"))
    )
    compare(nb_margin_calibration(docs, label_col="rule_lang"), duck, ORACLE_SQL)

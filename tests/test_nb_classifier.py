"""Multinomial NB classifier (exact fixed-point-log2 credits, Laplace
smoothing): planted separable-vocabulary semantics, tie-break
determinism, hand-computed score arithmetic, the fixture distillation
task (learn the rule-based lang_id from its own labels), and the
cross-engine DuckDB replay.  Staged for r11 driver registration
(r10's window is reserved for the r9-staged families + stale
rotation)."""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.oracle_check import compare
from vector_db_handler_spark import driver_queries as dq
from vector_db_handler_spark.functions import text as text_fns
from vector_db_handler_spark.operators.nb_classifier import (
    ilog2_kilo,
    nb_classify,
    nb_holdout_confusion,
    nb_train,
)


#: The registration's oracle IS this test's oracle (one source of
#: truth since the r11 registration); kept here only as the import.
ORACLE_SQL = dq._NB_CONFUSION_SQL


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, lang string, text string")


def test_ilog2_kilo_matches_reference_values(spark):
    df = spark.createDataFrame(
        [(1,), (2,), (3,), (7,), (1024,), (1_000_000,)], "n long"
    )
    got = {
        r["n"]: r["L"] for r in df.select("n", ilog2_kilo(F.col("n")).alias("L")).collect()
    }
    def ref(n):
        e = n.bit_length() - 1
        return 1024 * e + ((1024 * n) >> e) - 1024
    assert got == {n: ref(n) for n in got}


def test_separable_vocabularies_classify_perfectly(spark):
    """Disjoint per-label vocabularies: every held-out doc must score
    its own label highest, with a positive margin — smoothing keeps
    the no-evidence label's floor BELOW the in-vocabulary score."""
    rows = []
    for i in range(20):
        rows.append((2 * i, "aa", "alpha beta gamma alpha"))
        rows.append((2 * i + 1, "bb", "delta epsilon zeta zeta"))
    docs = _docs(spark, rows)
    model, priors = nb_train(docs)
    out = nb_classify(docs, model, priors).collect()
    assert len(out) == 40
    for r in out:
        want = "aa" if r["doc_id"] % 2 == 0 else "bb"
        assert r["predicted"] == want, r
        assert r["margin"] > 0


def test_tie_breaks_to_smallest_label_with_exact_score(spark):
    """A doc of only unseen words scores prior − n_d·norm for every
    label; equal statistics tie and the lexicographically smallest
    label wins with margin 0.  Hand arithmetic: V=2, T=2 ⇒ norm=L(4)
    =2048, prior=L(1)−L(2)=−1024, score=−1024−2·2048=−5120."""
    train = [(1, "aa", "alpha alpha"), (2, "bb", "beta beta")]
    model, priors = nb_train(_docs(spark, train))
    unseen = _docs(spark, [(9, None, "zzz qqq")])
    r = nb_classify(unseen, model, priors).collect()[0]
    assert (r["predicted"], r["score"], r["margin"]) == ("aa", -5120, 0)


def test_occurrence_counts_weight_the_evidence_exactly(spark):
    """Multinomial scoring: census cnt × smoothed credit.  Hand
    arithmetic for doc "x x": V=2, T=4 each ⇒ norm=L(6)=2560; aa has
    n(x)=3 ⇒ bits=L(4)=2048; bb has n(x)=1 ⇒ bits=L(2)=1024; priors
    −1024 each ⇒ score_aa=−1024+2·2048−2·2560=−2048,
    score_bb=−1024+2·1024−2·2560=−4096."""
    train = [(1, "aa", "x x x y"), (2, "bb", "x y y y")]
    model, priors = nb_train(_docs(spark, train))
    doc = _docs(spark, [(9, None, "x x")])
    r = nb_classify(doc, model, priors).collect()[0]
    assert (r["predicted"], r["score"], r["margin"]) == ("aa", -2048, 2048)


def test_distillation_learns_the_lang_id_rule(spark, sf_dir):
    """Train on the rule-based lang_id's own labels (80% slice) and
    classify the holdout: the one-pass NB model must recover the rule
    far above the majority-class baseline — the distill-a-heuristic
    pattern a production pipeline uses to replace regex rules with a
    model."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").withColumn(
        "rule_lang", text_fns.lang_id(F.col("text"))
    )
    rows = nb_holdout_confusion(docs, label_col="rule_lang").collect()
    total = sum(r["n_docs"] for r in rows)
    diag = sum(r["n_docs"] for r in rows if r["true_label"] == r["predicted"])
    by_true: dict[str, int] = {}
    for r in rows:
        by_true[r["true_label"]] = by_true.get(r["true_label"], 0) + r["n_docs"]
    majority = max(by_true.values()) / total
    assert diag / total >= 0.6, (diag, total, rows)
    assert diag / total > majority + 0.2, (diag / total, majority)


def test_cross_engine_oracle_replay(spark, sf_dir, duck):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").withColumn(
        "rule_lang", text_fns.lang_id(F.col("text"))
    )
    compare(nb_holdout_confusion(docs, label_col="rule_lang"), duck, ORACLE_SQL)


def test_null_label_and_null_text_drop_declaratively(spark):
    docs = _docs(
        spark,
        [
            (1, "aa", "alpha beta"),
            (2, None, "gamma delta"),
            (3, "bb", None),
            (6, "aa", "alpha alpha"),
            (0, "aa", "alpha beta"),  # held out (0 % 5 == 0)
        ],
    )
    out = nb_holdout_confusion(docs).collect()
    assert len(out) == 1
    r = out[0]
    assert (r["true_label"], r["predicted"], r["n_docs"]) == ("aa", "aa", 1)

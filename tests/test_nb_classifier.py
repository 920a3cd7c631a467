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


def _L(x: str) -> str:
    """DuckDB twin of ilog2_kilo: 1024·(bitlen−1) + mantissa − 1024."""
    bl = f"length(printf('%b', {x}))"
    return (
        f"(1024 * ({bl} - 1) + (1024 * ({x})) // "
        f"(CAST(1 AS BIGINT) << ({bl} - 1)) - 1024)"
    )


#: DuckDB twin of the distillation pipeline (rule-label via the
#: lang_id marker argmax, NB train on 80%, holdout confusion) — the
#: SQL an r11 registration will carry.
ORACLE_SQL = f"""
WITH rl AS (
  SELECT doc_id, text, {dq._lang_case_sql()} AS rule_lang
  FROM (SELECT doc_id, text, {dq._lang_scores_sql()}
        FROM documents WHERE text IS NOT NULL)
),
train AS (SELECT * FROM rl WHERE doc_id % 5 != 0),
heldout AS (SELECT * FROM rl WHERE doc_id % 5 = 0),
counts AS (
  SELECT label, word, count(*) AS n FROM (
    SELECT rule_lang AS label, unnest(string_split(text, ' ')) AS word
    FROM train
  ) GROUP BY 1, 2
),
totals AS (SELECT label, CAST(sum(n) AS BIGINT) AS t FROM counts GROUP BY 1),
vocab AS (SELECT count(DISTINCT word) AS v FROM counts),
bylab AS (SELECT rule_lang AS label, count(*) AS n_docs FROM train GROUP BY 1),
ntot AS (SELECT count(*) AS n_total FROM train),
priors AS (
  SELECT b.label,
         {_L('b.n_docs')} - {_L('(SELECT n_total FROM ntot)')} AS prior_credit,
         {_L('(t.t + (SELECT v FROM vocab))')} AS norm
  FROM bylab b JOIN totals t USING (label)
),
census AS (
  SELECT doc_id, word, count(*) AS cnt FROM (
    SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM heldout
  ) GROUP BY 1, 2
),
doclen AS (SELECT doc_id, CAST(sum(cnt) AS BIGINT) AS n_tokens FROM census GROUP BY 1),
evidence AS (
  SELECT c.doc_id, m.label,
         CAST(SUM(c.cnt * {_L('(m.n + 1)')}) AS BIGINT) AS word_credit
  FROM census c JOIN counts m USING (word) GROUP BY 1, 2
),
grid AS (
  SELECT d.doc_id, d.n_tokens, p.label, p.prior_credit, p.norm
  FROM doclen d CROSS JOIN priors p
),
scored AS (
  SELECT g.doc_id, g.label,
         g.prior_credit + COALESCE(e.word_credit, 0)
           - g.n_tokens * g.norm AS score
  FROM grid g LEFT JOIN evidence e
    ON g.doc_id = e.doc_id AND g.label = e.label
),
ranked AS (
  SELECT doc_id, label, score,
         row_number() OVER (PARTITION BY doc_id
                            ORDER BY score DESC, label ASC) AS rn,
         lead(score) OVER (PARTITION BY doc_id
                           ORDER BY score DESC, label ASC) AS runner_up
  FROM scored
),
pred AS (
  SELECT doc_id, label AS predicted,
         COALESCE(score - runner_up, 0) AS margin
  FROM ranked WHERE rn = 1
)
SELECT h.rule_lang AS true_label, p.predicted,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(p.margin) AS BIGINT) AS sum_margin
FROM pred p JOIN heldout h USING (doc_id)
GROUP BY 1, 2
"""


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

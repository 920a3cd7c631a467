"""Rank-aware retrieval eval (exact MRR / fixed-point nDCG):
hand-computed metrics, perfect/degenerate edges, the int8-vs-exact
ranking evaluation the r12 registration will carry, and its
cross-engine DuckDB replay.  Staged in r11."""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from tests.oracle_check import compare
from vector_db_handler_spark import driver_queries as dq
from vector_db_handler_spark.operators.retrieval import rank_eval_metrics

#: The registered oracle (moved into driver_queries.py in r12).
ORACLE_SQL = dq._RANK_EVAL_SQL


def _rel(spark, rows, schema):
    return spark.createDataFrame(rows, schema)


def _ref_L(n: int) -> int:
    e = n.bit_length() - 1
    return 1024 * e + ((1024 * n) >> e) - 1024


def test_hand_computed_metrics(spark):
    """Query q: results ranked [A, B, C]; truth rel(A)=0 (miss),
    rel(B)=2, rel(C)=1.  first_rank=2 ⇒ mrr 500000.  DCG terms at
    ranks 2, 3; IDCG = ideal [B(2), C(1)] at positions 1, 2."""
    results = _rel(
        spark,
        [("q", "A", 1), ("q", "B", 2), ("q", "C", 3)],
        "query_id string, neighbor_id string, rank long",
    )
    truth = _rel(
        spark,
        [("q", "B", 2), ("q", "C", 1)],
        "query_id string, neighbor_id string, rel long",
    )
    r = rank_eval_metrics(results, truth).collect()[0]
    dcg = (2 * 1048576) // _ref_L(3) + (1 * 1048576) // _ref_L(4)
    idcg = (2 * 1048576) // _ref_L(2) + (1 * 1048576) // _ref_L(3)
    assert (r["n_results"], r["n_relevant"], r["mrr_micro"]) == (3, 2, 500000)
    assert (r["dcg_scaled"], r["idcg_scaled"]) == (dcg, idcg)
    assert r["ndcg"] == round(dcg / idcg, 6)


def test_perfect_ranking_scores_one(spark):
    results = _rel(
        spark,
        [("q", "A", 1), ("q", "B", 2)],
        "query_id string, neighbor_id string, rank long",
    )
    truth = _rel(
        spark,
        [("q", "A", 5), ("q", "B", 3)],
        "query_id string, neighbor_id string, rel long",
    )
    r = rank_eval_metrics(results, truth).collect()[0]
    assert (r["mrr_micro"], r["ndcg"]) == (1_000_000, 1.0)


def test_nothing_relevant_gives_zero_metrics(spark):
    results = _rel(
        spark,
        [("q", "A", 1), ("q", "B", 2)],
        "query_id string, neighbor_id string, rank long",
    )
    truth = _rel(
        spark,
        [("q", "Z", 1)],
        "query_id string, neighbor_id string, rel long",
    )
    r = rank_eval_metrics(results, truth).collect()[0]
    assert (r["n_relevant"], r["mrr_micro"], r["dcg_scaled"]) == (0, 0, 0)
    # truth's item Z is within the depth, so IDCG > 0 and ndcg is an
    # honest 0.0 (the retrieval surfaced nothing relevant)
    assert r["idcg_scaled"] > 0 and r["ndcg"] == 0.0


def test_queries_are_independent(spark):
    results = _rel(
        spark,
        [("q1", "A", 1), ("q2", "A", 1), ("q2", "B", 2)],
        "query_id string, neighbor_id string, rank long",
    )
    truth = _rel(
        spark,
        [("q1", "A", 1), ("q2", "B", 1)],
        "query_id string, neighbor_id string, rel long",
    )
    out = {r["query_id"]: r for r in rank_eval_metrics(results, truth).collect()}
    assert out["q1"]["mrr_micro"] == 1_000_000
    assert out["q2"]["mrr_micro"] == 500_000


def _quantized_vs_exact(spark, sf_dir):
    """The r12 registration's Spark side: int8 top-10 ranking
    evaluated against the exact cosine top-10 with graded rel."""
    from vector_db_handler_spark.operators import knn as knn_ops
    from vector_db_handler_spark.operators import quantize as quantize_ops
    from vector_db_handler_spark.sources.tables import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    res = (
        quantize_ops.quantized_knn(emb, dq.QUERY_VEC, k=10)
        .withColumn(
            "rank",
            F.row_number().over(
                Window.orderBy(F.col("qscore").desc(), F.col("vec_id").asc())
            ),
        )
        .select(
            F.lit(0).cast("long").alias("query_id"),
            F.col("vec_id").alias("neighbor_id"),
            "rank",
        )
    )
    exact = knn_ops.knn(emb, dq.QUERY_VEC, k=10, tie_break_col="vec_id")
    truth = exact.withColumn(
        "rel",
        (
            F.lit(11)
            - F.row_number().over(
                Window.orderBy(F.col("score").desc(), F.col("vec_id").asc())
            )
        ).cast("long"),
    ).select(
        F.lit(0).cast("long").alias("query_id"),
        F.col("vec_id").alias("neighbor_id"),
        "rel",
    )
    return rank_eval_metrics(res, truth)


def test_int8_ranking_quality_on_fixture(spark, sf_dir):
    r = _quantized_vs_exact(spark, sf_dir).collect()[0]
    # int8 quantization dents but does not destroy the ranking
    assert r["n_relevant"] >= 5
    assert r["ndcg"] is not None and r["ndcg"] > 0.5
    assert r["mrr_micro"] >= 200_000


def test_cross_engine_oracle_replay(spark, sf_dir, duck):
    compare(_quantized_vs_exact(spark, sf_dir), duck, ORACLE_SQL)

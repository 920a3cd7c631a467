"""MMR-diversified top-k (`operators.retrieval.mmr_diversified_topk`):
greedy Maximal-Marginal-Relevance selection over the exact int8-grid
candidate set — the serve-time redundancy rail.  Pins: the
cross-engine DuckDB replay (greedy recursion as a recursive CTE with
per-step argmax — every score, sim and mmr value an exact BIGINT),
the λ=1000 degenerate case (pure relevance ≡ quantized_knn order),
diversification actually firing at the staged dials, and argument
guards.  Staged in r15 for r16 driver registration (the oracle moves
to driver_queries then)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tests.oracle_check import assert_oracle_types_hashable, compare
from vector_db_handler_spark import driver_queries as dq
from vector_db_handler_spark.operators.retrieval import mmr_diversified_topk

#: Staged driver-row dials.
K = 10
N_CAND = 50
LAM = 700


def _mmr_sql(k: int = K, n: int = N_CAND, lam: int = LAM) -> str:
    clamp = dq._QUANT_CLAMP
    mmr_expr = (
        f"{lam} * c.qscore - {1000 - lam} * "
        "(SELECT MAX(CAST(list_dot_product(c.v, s2.v) AS BIGINT)) "
        " FROM cand s2 WHERE list_contains(sel.chosen, s2.vec_id))"
    )
    return f"""
WITH RECURSIVE scale AS (
  SELECT MAX(GREATEST(list_max(CAST(embedding AS DOUBLE[])),
                      -list_min(CAST(embedding AS DOUBLE[])))) AS s
  FROM embeddings
),
qq AS (
  SELECT list_transform({dq._Q_SQL}, x -> {clamp}) AS v FROM scale
),
qc AS (
  SELECT vec_id,
         list_transform(CAST(embedding AS DOUBLE[]), x -> {clamp}) AS v
  FROM embeddings, scale
),
cand AS (
  SELECT vec_id, v,
         CAST(list_dot_product(v, (SELECT v FROM qq)) AS BIGINT) AS qscore
  FROM qc ORDER BY qscore DESC, vec_id ASC LIMIT {n}
),
sel AS (
  (SELECT CAST(1 AS BIGINT) AS step, vec_id, qscore,
          CAST({lam} * qscore AS BIGINT) AS mmr_milli,
          [vec_id] AS chosen
   FROM cand ORDER BY qscore DESC, vec_id ASC LIMIT 1)
  UNION ALL
  (SELECT sel.step + 1, c.vec_id, c.qscore,
          CAST({mmr_expr} AS BIGINT),
          list_append(sel.chosen, c.vec_id)
   FROM sel, cand c
   WHERE sel.step < {k} AND NOT list_contains(sel.chosen, c.vec_id)
   ORDER BY {mmr_expr} DESC, c.vec_id ASC
   LIMIT 1)
)
SELECT step, vec_id, qscore, mmr_milli FROM sel
"""


MMR_SQL = _mmr_sql()


def _emb(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet")


def test_oracle_types_hashable(duck):
    assert_oracle_types_hashable(duck, MMR_SQL, "mmr")


def test_mmr_cross_engine(spark, sf_dir, duck):
    got = mmr_diversified_topk(
        _emb(spark, sf_dir), dq.QUERY_VEC, k=K, n_candidates=N_CAND,
        lam_milli=LAM,
    )
    compare(got, duck, MMR_SQL)


def test_mmr_cross_engine_low_lambda(spark, sf_dir, duck):
    """λ=0.3 — diversity-dominant regime still hash-checks."""
    got = mmr_diversified_topk(
        _emb(spark, sf_dir), dq.QUERY_VEC, k=5, n_candidates=20,
        lam_milli=300,
    )
    compare(got, duck, _mmr_sql(k=5, n=20, lam=300))


def test_lambda_1000_is_pure_relevance(spark, sf_dir):
    """λ=1: MMR degenerates to the quantized-KNN ranking."""
    from vector_db_handler_spark.operators.quantize import quantized_knn

    emb = _emb(spark, sf_dir)
    got = mmr_diversified_topk(
        emb, dq.QUERY_VEC, k=K, n_candidates=N_CAND, lam_milli=1000
    ).collect()
    want = quantized_knn(emb, dq.QUERY_VEC, k=K).collect()
    assert [r.vec_id for r in got] == [r.vec_id for r in want]
    assert [r.qscore for r in got] == [r.qscore for r in want]
    assert all(r.mmr_milli == 1000 * r.qscore for r in got)


def test_diversification_fires(spark, sf_dir):
    """At the staged dials the selected ORDER differs from pure
    relevance — the redundancy penalty actually reranks — while the
    step-1 pick (no selected set yet) is always the relevance top-1."""
    from vector_db_handler_spark.operators.quantize import quantized_knn

    emb = _emb(spark, sf_dir)
    got = [
        r.vec_id
        for r in mmr_diversified_topk(
            emb, dq.QUERY_VEC, k=K, n_candidates=N_CAND, lam_milli=300
        ).collect()
    ]
    rel = [r.vec_id for r in quantized_knn(emb, dq.QUERY_VEC, k=K).collect()]
    assert got[0] == rel[0]
    assert got != rel


def test_short_corpus_returns_all(spark, sf_dir):
    emb = _emb(spark, sf_dir).limit(4)
    out = mmr_diversified_topk(
        emb, dq.QUERY_VEC, k=10, n_candidates=10
    ).collect()
    assert len(out) == 4
    assert [r.step for r in out] == [1, 2, 3, 4]


def test_args_validated(spark, sf_dir):
    emb = _emb(spark, sf_dir)
    with pytest.raises(ValueError, match="k must"):
        mmr_diversified_topk(emb, dq.QUERY_VEC, k=0)
    with pytest.raises(ValueError, match="n_candidates"):
        mmr_diversified_topk(emb, dq.QUERY_VEC, k=10, n_candidates=5)
    with pytest.raises(ValueError, match="lam_milli"):
        mmr_diversified_topk(emb, dq.QUERY_VEC, lam_milli=1001)

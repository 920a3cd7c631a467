"""Two-corpus embedding drift report (the embedding-space member of
the drift battery next to tv_drift_by / kl_token_drift /
rank_sum_drift): exact nano-int moments per side, Welch z per
dimension, 3σ drift flags.  Staged in r14 for r15 driver registration
(oracle moves to driver_queries then)."""

from __future__ import annotations

import pytest

from tests.oracle_check import assert_oracle_types_hashable, compare
from vector_db_handler_spark.operators.features import (
    embedding_drift_report,
)

#: The staged driver row: corpus A = labels 0-4, corpus B = labels 5-9
#: of the embeddings fixture (a deterministic covariate split).
A_PRED = "label < 5"
B_PRED = "label >= 5"
Z_THRESHOLD = 3.0


def _x_cte(pred: str) -> str:
    return f"""
  SELECT pos - 1 AS pos,
         CAST(CAST(v AS DECIMAL(18,9)) * 1000000000 AS BIGINT) AS x
  FROM (SELECT unnest(CAST(embedding AS DOUBLE[])) AS v,
               generate_subscripts(CAST(embedding AS DOUBLE[]), 1) AS pos
        FROM embeddings WHERE {pred})"""


def _drift_oracle_sql() -> str:
    return f"""
WITH xa AS ({_x_cte(A_PRED)}),
xb AS ({_x_cte(B_PRED)}),
aa AS (
  SELECT pos, COUNT(*) AS n_a,
         SUM(CAST(x AS HUGEINT)) AS s_a,
         SUM(CAST(x AS HUGEINT) * x) AS q_a
  FROM xa GROUP BY pos
),
ab AS (
  SELECT pos, COUNT(*) AS n_b,
         SUM(CAST(x AS HUGEINT)) AS s_b,
         SUM(CAST(x AS HUGEINT) * x) AS q_b
  FROM xb GROUP BY pos
),
j AS (SELECT * FROM aa JOIN ab USING (pos)),
d AS (
  SELECT pos,
         CAST(n_a AS BIGINT) AS n_a, CAST(n_b AS BIGINT) AS n_b,
         CAST(s_a AS DOUBLE) / n_a / 1000000000.0 AS mean_a,
         CAST(s_b AS DOUBLE) / n_b / 1000000000.0 AS mean_b,
         CAST(s_b AS DOUBLE) / n_b / 1000000000.0
           - CAST(s_a AS DOUBLE) / n_a / 1000000000.0 AS mean_shift,
         CAST(n_a * q_a - s_a * s_a AS DOUBLE)
           / (CAST(n_a AS DOUBLE) * CAST(n_a AS DOUBLE) * 1e18) AS var_a,
         CAST(n_b * q_b - s_b * s_b AS DOUBLE)
           / (CAST(n_b AS DOUBLE) * CAST(n_b AS DOUBLE) * 1e18) AS var_b
  FROM j
)
SELECT pos, n_a, n_b, mean_a, mean_b, mean_shift,
       SQRT(var_a) AS std_a, SQRT(var_b) AS std_b,
       ROUND(mean_shift / SQRT(var_a / n_a + var_b / n_b), 6) AS z,
       (ABS(ROUND(mean_shift / SQRT(var_a / n_a + var_b / n_b), 6))
        >= {Z_THRESHOLD}) AS drifted
FROM d
"""


DRIFT_ORACLE_SQL = _drift_oracle_sql()


def _run(spark, sf_dir):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    return embedding_drift_report(
        emb.filter(A_PRED), emb.filter(B_PRED), z_threshold=Z_THRESHOLD
    )


def test_oracle_types_hashable(duck):
    assert_oracle_types_hashable(duck, DRIFT_ORACLE_SQL, "emb_drift")


def test_cross_engine_oracle_replay(spark, sf_dir, duck):
    compare(_run(spark, sf_dir), duck, DRIFT_ORACLE_SQL)


def test_identical_corpora_zero_drift(spark, sf_dir):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    out = embedding_drift_report(emb, emb).collect()
    assert len(out) == len(emb.first()["embedding"])
    for r in out:
        assert r["mean_shift"] == 0.0
        assert r["z"] == 0.0
        assert not r["drifted"]


def test_planted_shift_flags_exactly_that_dimension(spark):
    """Shift dimension 3 of corpus B by +0.5: with tight per-dim noise
    the report must flag dim 3 (huge z) and only dim 3."""
    import numpy as np

    rng = np.random.RandomState(11)
    base = rng.normal(0.0, 0.05, (400, 8))
    rows_a = [(i, [float(x) for x in base[i]]) for i in range(400)]
    shifted = base.copy()
    shifted[:, 3] += 0.5
    rows_b = [(i, [float(x) for x in shifted[i]]) for i in range(400)]
    a = spark.createDataFrame(rows_a, "vec_id long, embedding array<double>")
    b = spark.createDataFrame(rows_b, "vec_id long, embedding array<double>")
    out = {r["pos"]: r for r in embedding_drift_report(a, b).collect()}
    assert out[3]["drifted"] and out[3]["z"] > 100
    assert all(not out[p]["drifted"] for p in out if p != 3)
    assert abs(out[3]["mean_shift"] - 0.5) < 1e-6


def test_args_validated(spark, sf_dir):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    with pytest.raises(ValueError, match="z_threshold"):
        embedding_drift_report(emb, emb, z_threshold=-1)

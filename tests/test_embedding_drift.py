"""Two-corpus embedding drift report (the embedding-space member of
the drift battery next to tv_drift_by / kl_token_drift /
rank_sum_drift): exact nano-int moments per side, Welch z per
dimension, 3σ drift flags.  Registered in r15; the oracle
lives in driver_queries and this file aliases it back."""

from __future__ import annotations

import pytest

from tests.oracle_check import assert_oracle_types_hashable, compare
from vector_db_handler_spark.operators.features import (
    embedding_drift_report,
)

# Split + oracle registered in r15 — driver_queries is the one source
# of truth; this file aliases them back (corpus A = labels 0-4,
# corpus B = labels 5-9: a deterministic covariate split).
from vector_db_handler_spark import driver_queries as dq  # noqa: E402

A_PRED = dq._DRIFT_A_PRED
B_PRED = dq._DRIFT_B_PRED
Z_THRESHOLD = dq._DRIFT_Z

DRIFT_ORACLE_SQL = dq._DRIFT_ORACLE_SQL


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

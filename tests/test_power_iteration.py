"""Fixed-point power iteration over the exact int8 Gram matrix:
dominant-direction recovery, literal integer replay, degenerate
edges, determinism, and the cross-engine DuckDB replay over the
fixture embeddings.  Staged in r12 for r13 driver registration."""

from __future__ import annotations

import pytest

from tests.oracle_check import compare
from vector_db_handler_spark import driver_queries as dq
from vector_db_handler_spark.operators.quantize import (
    gram_int8,
    power_iteration_top_pc,
    quantize_int8,
)

ITERS = dq._PI_ITERS
DIM = dq._PI_DIM  # the embeddings fixture dimension (matches dq.QUERY_VEC)

#: Registered in r13 — SQL lives in driver_queries (one source of
#: truth; this module replays it cross-engine at fixture scale).
ORACLE_SQL = dq._POWER_ITERATION_SQL


def _emb(spark, rows):
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def _replay(qvecs, iters):
    """Pure-Python exact replay of the declared arithmetic."""
    import numpy as np

    m = np.array(qvecs, dtype=np.int64)
    C = m.T @ m
    v = np.full(C.shape[0], 1024, dtype=np.int64)
    for _ in range(iters):
        raw = C @ v
        mx = int(np.max(np.abs(raw)))
        if mx == 0:
            v = np.zeros_like(v)
            continue
        sh = max(0, mx.bit_length() - 50)
        v = np.sign(raw) * (((np.abs(raw) >> sh) * 1024) // (mx >> sh))
    r3 = C @ v
    den = int(v @ v)
    ray = round(int(r3 @ v) / den, 6) if den > 0 else None
    return v, ray


def test_dominant_direction_recovered(spark):
    """30 rows along e0 (±ε elsewhere), 3 rows along e1: the top
    component must saturate dim 0 at ±1024 and dwarf every other
    dim."""
    rows = [(i, [10.0, 0.1 * (i % 3 - 1), 0.0, 0.0]) for i in range(30)]
    rows += [(100 + i, [0.0, 5.0, 0.0, 0.0]) for i in range(3)]
    out = {r["dim"]: r for r in power_iteration_top_pc(_emb(spark, rows), iters=ITERS).collect()}
    assert abs(out[0]["component_1024"]) == 1024
    for d in (1, 2, 3):
        assert abs(out[d]["component_1024"]) < 300, out
    assert out[0]["rayleigh"] > 0


def test_matches_literal_replay(spark):
    rows = [
        (i, [((i * 7 + d * 3) % 11 - 5) / 5.0 for d in range(6)])
        for i in range(25)
    ]
    emb = _emb(spark, rows)
    qv = [r["qvec"] for r in quantize_int8(emb).orderBy("vec_id").collect()]
    want_v, want_ray = _replay(qv, ITERS)
    out = {r["dim"]: r for r in power_iteration_top_pc(emb, iters=ITERS).collect()}
    for d in range(6):
        assert out[d]["component_1024"] == want_v[d], (d, out[d], want_v[d])
        assert out[d]["rayleigh"] == want_ray


def test_rayleigh_tracks_numpy_eigenvalue(spark):
    """After 2 rounds from the ones vector the Rayleigh quotient must
    sit within a few percent of numpy's true top eigenvalue of the
    SAME exact Gram matrix (clear spectral gap here)."""
    import numpy as np

    rows = [(i, [3.0 + (i % 5) * 0.1, 1.0, -0.5, 0.2]) for i in range(40)]
    emb = _emb(spark, rows)
    qv = np.array(
        [r["qvec"] for r in quantize_int8(emb).collect()], dtype=np.int64
    )
    C = qv.T @ qv
    true_top = float(np.linalg.eigvalsh(C)[-1])
    got = power_iteration_top_pc(emb, iters=ITERS).collect()[0]["rayleigh"]
    assert abs(got - true_top) / true_top < 0.05, (got, true_top)


def test_zero_corpus_degrades(spark):
    rows = [(1, [0.0, 0.0]), (2, [0.0, 0.0])]
    out = power_iteration_top_pc(_emb(spark, rows)).collect()
    assert {r["component_1024"] for r in out} == {0}
    assert all(r["rayleigh"] is None for r in out)


def test_iters_validated(spark):
    with pytest.raises(ValueError, match="iters"):
        power_iteration_top_pc(_emb(spark, [(1, [1.0])]), iters=0)


def test_deterministic_across_partitionings(spark):
    rows = [
        (i, [((i * 13 + d * 5) % 9 - 4) / 4.0 for d in range(8)])
        for i in range(64)
    ]
    a = sorted(map(tuple, power_iteration_top_pc(_emb(spark, rows).coalesce(1)).collect()))
    b = sorted(map(tuple, power_iteration_top_pc(_emb(spark, rows).repartition(8)).collect()))
    assert a == b


def test_cross_engine_oracle_replay(spark, sf_dir, duck):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    compare(power_iteration_top_pc(emb, iters=ITERS), duck, ORACLE_SQL)

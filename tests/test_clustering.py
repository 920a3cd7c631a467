"""Exact int8 Lloyd k-means properties (oracle parity runs
automatically in test_oracle_queries.py)."""

from __future__ import annotations

import numpy as np
import pytest

from vector_db_handler_spark.operators.clustering import kmeans_int8_lloyd
from vector_db_handler_spark.operators.quantize import quantize_int8
from vector_db_handler_spark.sources.tables import load_table


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    return load_table(spark, sf_dir, "embeddings")


def _sse(qmat: np.ndarray, cents: np.ndarray, assign: np.ndarray) -> int:
    return int(((qmat - cents[assign]) ** 2).sum())


def test_lloyd_sse_non_increasing(spark, emb):
    """Each Lloyd iteration must not increase within-cluster SSE
    (up to the int8 grid rounding of the centroid update, bounded by
    0.5 per component — assert with that slack)."""
    q = quantize_int8(emb)
    rows = sorted(q.collect(), key=lambda r: r.vec_id)
    qmat = np.asarray([r.qvec for r in rows], dtype=np.int64)
    k, dim = 8, qmat.shape[1]

    def run(iters):
        out = kmeans_int8_lloyd(emb, k=k, iters=iters).collect()
        cents = np.zeros((k, dim), dtype=np.int64)
        for r in out:
            cents[r.cluster_id][r.pos] = r.c_val
        assign = ((qmat[:, None, :] - cents[None, :, :]) ** 2).sum(2).argmin(1)
        return _sse(qmat, cents, assign)

    sse1, sse2 = run(1), run(2)
    slack = qmat.shape[0] * dim  # grid-rounding slack: (0.5)^2 * 4 per comp
    assert sse2 <= sse1 + slack, (sse1, sse2)


def test_all_points_assigned_and_sizes_sum(spark, emb):
    n = emb.count()
    out = kmeans_int8_lloyd(emb, k=8, iters=2).collect()
    sizes = {r.cluster_id: r.n_members for r in out}
    assert sum(sizes.values()) == n
    assert set(r.cluster_id for r in out) == set(range(8))
    assert len(out) == 8 * 64


def test_centroids_on_int8_grid(spark, emb):
    out = kmeans_int8_lloyd(emb, k=8, iters=2).collect()
    assert all(-127 <= r.c_val <= 127 for r in out)

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


# --- SemDeDup (cluster-then-prune) ------------------------------------------


def test_semdedup_duplicate_vectors_keep_min_id(spark):
    from vector_db_handler_spark.operators.clustering import semdedup_survivors

    # ids 0..3 are seeds; 10/11/12 duplicate seed 1's direction exactly
    # (same vector scaled — cosine 1), so only the smallest id among
    # {1, 10, 11, 12} survives in that cluster.
    base = [
        (0, [1.0] + [0.0] * 63),
        (1, [0.0, 1.0] + [0.0] * 62),
        (2, [0.0, 0.0, 1.0] + [0.0] * 61),
        (3, [0.0, 0.0, 0.0, 1.0] + [0.0] * 60),
        (10, [0.0, 0.5] + [0.0] * 62),
        (11, [0.0, 0.9] + [0.0] * 62),
        (12, [0.0, 1.0] + [0.0] * 62),
    ]
    emb = spark.createDataFrame(base, "vec_id long, embedding array<double>")
    out = {r.vec_id: r for r in semdedup_survivors(emb, k=4, iters=2).collect()}
    assert len(out) == len(base)
    assert out[1].kept and not out[10].kept and not out[11].kept and not out[12].kept
    # orthogonal seeds are all kept
    assert out[0].kept and out[2].kept and out[3].kept
    # the dup family shares seed 1's cluster
    assert {out[i].cluster_id for i in (1, 10, 11, 12)} == {out[1].cluster_id}


def test_semdedup_cross_cluster_dups_survive(spark):
    """The SemDeDup contract: near-dups in DIFFERENT clusters are both
    kept — that is the approximation the clustering buys scale with."""
    from vector_db_handler_spark.operators.clustering import semdedup_survivors

    # Two tight groups far apart; k=2 seeds are one member of each.
    rows = [
        (0, [1.0, 0.0] + [0.0] * 62),
        (1, [-1.0, 0.0] + [0.0] * 62),
        (5, [1.0, 0.01] + [0.0] * 62),
        (6, [-1.0, 0.01] + [0.0] * 62),
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = {r.vec_id: r for r in semdedup_survivors(emb, k=2, iters=2).collect()}
    assert out[0].kept and out[1].kept
    assert not out[5].kept and not out[6].kept  # same-cluster dups pruned
    assert out[0].cluster_id != out[1].cluster_id


def test_semdedup_zero_vectors_never_dup(spark):
    from vector_db_handler_spark.operators.clustering import semdedup_survivors

    rows = [(i, [0.0] * 64) for i in range(4)] + [(9, [1.0] * 64)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = semdedup_survivors(emb, k=2, iters=2).collect()
    assert all(r.kept for r in out)


def test_semdedup_empty_corpus(spark):
    from vector_db_handler_spark.operators.clustering import semdedup_survivors

    emb = spark.createDataFrame([], "vec_id long, embedding array<double>")
    out = semdedup_survivors(emb, k=4, iters=2)
    assert out.count() == 0
    assert [f.name for f in out.schema.fields] == ["vec_id", "cluster_id", "kept"]

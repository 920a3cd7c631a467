"""NN-descent k-NN-graph construction: planted-cluster recovery,
iteration monotonicity (recall never drops), exact-integer replay,
edge semantics, and the cross-engine DuckDB replay composed onto the
registered int8-k-means CTE chain.  Staged in r11 for r12 driver
registration."""

from __future__ import annotations

import pytest

from tests.oracle_check import compare
from vector_db_handler_spark import driver_queries as dq
from vector_db_handler_spark.operators.similarity import knn_graph_nn_descent

K = dq._NND_K
ITERS = dq._NND_ITERS
RAND_BUCKETS = dq._NND_RAND_BUCKETS

#: The registered oracle (moved into driver_queries.py in r12).
ORACLE_SQL = dq._NN_DESCENT_SQL


def _planted_families(spark, n_families=40, members=8, dim=32):
    """Deterministic clustered corpus: ``n_families`` nearly-
    orthogonal ±3 sign-pattern base directions (signs from integer
    hashing — within-family dot ≈ 9·dim, cross-family ≈ ±9·√dim),
    ``members`` small perturbations of each — data WITH neighbour
    transitivity, the regime NN-descent is for.  No RNG: everything
    derives from index arithmetic."""
    rows = []
    for f in range(n_families):
        base = [
            3.0 * (((f * 2654435761 + d * 40503 + 7) * 2246822519 >> 13) % 2 * 2 - 1)
            for d in range(dim)
        ]
        for m in range(members):
            vec = [
                base[d] + (((m * 13 + d * 5) % 3) - 1) * 0.05
                for d in range(dim)
            ]
            rows.append((f * members + m, vec))
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def test_descent_recovers_planted_family_neighbours(spark):
    """On structured data the descent must climb steeply: the
    random-bucket init sees few true neighbours and two iterations
    recover most of the exact int8-dot graph — the 'neighbour of a
    neighbour' transitivity the algorithm exists to exploit.  (On
    structureless random vectors recall legitimately crawls — no
    locality to propagate — which is why this test plants structure
    instead of using the random fixture embeddings; truth is computed
    from the data, not assumed.)"""
    import numpy as np

    from vector_db_handler_spark.operators.quantize import quantize_int8

    members = 8
    kk = members - 1
    emb = _planted_families(spark, members=members)
    rows = quantize_int8(emb).select("vec_id", "qvec").collect()
    ids = np.array([r["vec_id"] for r in rows])
    m = np.array([list(r["qvec"]) for r in rows], dtype=np.int64)
    dots = m @ m.T
    np.fill_diagonal(dots, np.iinfo(np.int64).min)
    order = np.argsort(-dots, axis=1, kind="stable")
    truth = {
        int(ids[i]): {int(ids[j]) for j in order[i, :kk]}
        for i in range(len(ids))
    }

    def recall(graph_df):
        got = {}
        for r in graph_df.collect():
            got.setdefault(r["vec_id"], set()).add(r["neighbor_id"])
        hit = sum(len(got.get(i, set()) & truth[i]) for i in truth)
        return hit / (len(truth) * kk)

    # No rand_buckets: exercises the ADAPTIVE default (derived from
    # the corpus count targeting ~64-node buckets — the r11 ADVICE
    # fix for the quadratic fixed-bucket hash leg).
    r0 = recall(knn_graph_nn_descent(emb, k=kk, iters=0))
    r2 = recall(knn_graph_nn_descent(emb, k=kk, iters=ITERS))
    # On family-structured data the coarse cells already capture most
    # families, so init recall is high; the iterations must still
    # STRICTLY improve it and land near-exact.
    assert r2 > r0, (r0, r2)
    assert r2 >= 0.85, (r0, r2)


def test_objective_is_monotone_on_fixture(spark, sf_dir):
    """The descent's invariant on ANY data (even the structureless
    random fixture embeddings, where recall gains are legitimately
    slow): each iteration keeps the best of candidates ⊇ current
    edges, so the global Σ iscore never decreases — and the first
    iteration must STRICTLY improve it (the random-bucket bridges
    guarantee unseen candidates exist)."""
    from pyspark.sql import functions as F2

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    sums = [
        knn_graph_nn_descent(emb, k=K, iters=i, rand_buckets=RAND_BUCKETS)
        .agg(F2.sum("iscore"))
        .collect()[0][0]
        for i in (0, 1, ITERS)
    ]
    assert sums[0] < sums[1] <= sums[2], sums


def test_scores_are_exact_integer_dots(spark):
    """Planted 4-dim vectors in one cell: iscore must equal the exact
    integer dot of the quantized vectors, ranks pinned by (d DESC,
    id ASC)."""
    rows = [
        (0, [1.0, 0.0, 0.0, 0.0]),
        (1, [1.0, 0.1, 0.0, 0.0]),
        (2, [0.9, 0.2, 0.0, 0.0]),
        (3, [-1.0, 0.0, 0.0, 0.0]),
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = {
        (r["vec_id"], r["neighbor_id"]): r
        for r in knn_graph_nn_descent(emb, k=2, iters=1, kmeans_k=1).collect()
    }
    from vector_db_handler_spark.operators.quantize import quantize_int8

    qv = {
        r["vec_id"]: list(r["qvec"])
        for r in quantize_int8(emb).collect()
    }
    for (a, b), r in out.items():
        want = sum(x * y for x, y in zip(qv[a], qv[b]))
        assert r["iscore"] == want, (a, b, r, want)
    # node 0's best neighbour is 1 (largest dot)
    assert out[(0, 1)]["rank"] == 1


def test_k_and_iters_validated(spark):
    emb = spark.createDataFrame(
        [(0, [1.0, 0.0])], "vec_id long, embedding array<double>"
    )
    with pytest.raises(ValueError, match="k must"):
        knn_graph_nn_descent(emb, k=0)
    with pytest.raises(ValueError, match="iters"):
        knn_graph_nn_descent(emb, iters=-1)


def test_random_bucket_init_bridges_singleton_cells(spark):
    """A node alone in its k-means cell still gets edges through the
    hash-bucket random init (rand_buckets=1 puts everyone in one
    bucket here) — the bridge that lets descent cross cells."""
    rows = [
        (0, [1.0, 0.0]),
        (1, [0.9, 0.1]),
        (2, [-1.0, 0.0]),  # far away: its own cell with kmeans_k=2
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = knn_graph_nn_descent(
        emb, k=2, iters=2, kmeans_k=2, rand_buckets=1
    ).collect()
    nodes_with_edges = {r["vec_id"] for r in out}
    assert nodes_with_edges == {0, 1, 2}


def test_cross_engine_oracle_replay(spark, sf_dir, duck):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    compare(
        knn_graph_nn_descent(emb, k=K, iters=ITERS, rand_buckets=RAND_BUCKETS),
        duck,
        ORACLE_SQL,
    )

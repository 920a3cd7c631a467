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


# ---------------------------------------------------------------------------
# dbscan_labels
# ---------------------------------------------------------------------------

from vector_db_handler_spark.operators.clustering import dbscan_labels


def _run_dbscan(spark, pairs, node_ids, min_pts=3):
    p = spark.createDataFrame(pairs, "id1 long, id2 long")
    n = spark.createDataFrame([(i,) for i in node_ids], "vec_id long")
    return {
        r.node: (r.role, r.cluster)
        for r in dbscan_labels(p, n, node_col="vec_id", min_pts=min_pts).collect()
    }


def test_dbscan_chain_core_border_noise(spark):
    """Path 1-2-3-4-5 with min_pts=3: interior nodes 2,3,4 are core
    (closed neighborhood 3), endpoints 1,5 are border attached to the
    min-labeled component, 99 is noise."""
    pairs = [(1, 2), (2, 3), (3, 4), (4, 5)]
    got = _run_dbscan(spark, pairs, [1, 2, 3, 4, 5, 99])
    assert got[2] == ("core", 2) and got[3] == ("core", 2) and got[4] == ("core", 2)
    assert got[1] == ("border", 2) and got[5] == ("border", 2)
    assert got[99] == ("noise", -1)


def test_dbscan_two_clusters_and_shared_border(spark):
    """Two K4 cliques (all core at min_pts=4) plus node 50 adjacent to
    one core in EACH (degree 2 < min_pts-1, so NOT core itself): the
    border does not merge the clusters and is pinned to the MINIMUM
    adjacent label."""
    from itertools import combinations

    k4a = list(combinations([1, 2, 3, 4], 2))
    k4b = list(combinations([11, 12, 13, 14], 2))
    pairs = k4a + k4b + [(4, 50), (11, 50)]
    got = _run_dbscan(spark, pairs, [1, 2, 3, 4, 11, 12, 13, 14, 50], min_pts=4)
    assert {got[i] for i in (1, 2, 3, 4)} == {("core", 1)}
    assert {got[i] for i in (11, 12, 13, 14)} == {("core", 11)}
    assert got[50] == ("border", 1)  # min(1, 11)


def test_dbscan_matches_brute_force_reference(spark):
    """Random sparse graph vs a pure-Python DBSCAN with the same
    deterministic min-label rules."""
    pairs, x = [], 11
    for _ in range(120):
        x = (x * 48271) % (2**31 - 1)
        u = x % 40
        x = (x * 48271) % (2**31 - 1)
        v = x % 40
        if u != v:
            pairs.append((min(u, v), max(u, v)))
    nodes = list(range(40))
    min_pts = 3
    got = _run_dbscan(spark, pairs, nodes, min_pts=min_pts)

    nbr = {n: set() for n in nodes}
    for u, v in pairs:
        nbr[u].add(v), nbr[v].add(u)
    core = {n for n in nodes if len(nbr[n]) + 1 >= min_pts}
    # components over core-core edges
    lbl = {c: c for c in core}
    changed = True
    while changed:
        changed = False
        for u, v in pairs:
            if u in core and v in core:
                m = min(lbl[u], lbl[v])
                if lbl[u] != m or lbl[v] != m:
                    lbl[u] = lbl[v] = m
                    changed = True
    want = {}
    for n in nodes:
        if n in core:
            want[n] = ("core", lbl[n])
        else:
            adj = [lbl[v] for v in nbr[n] if v in core]
            want[n] = ("border", min(adj)) if adj else ("noise", -1)
    assert got == want


# ---------------------------------------------------------------------------
# label_propagation_rounds
# ---------------------------------------------------------------------------

from vector_db_handler_spark.operators.clustering import label_propagation_rounds


def test_label_propagation_majority_ties_and_rounds(spark):
    """Node 10 has two 'a'-labeled and one 'b'-labeled neighbors →
    adopts a.  Node 20's neighbors tie 1-1 → min label wins.  Node 30
    is two hops from any seed → labeled only in round 2, via 10's
    round-1 label.  Node 99 is isolated → absent."""
    pairs = spark.createDataFrame(
        [(1, 10), (2, 10), (3, 10), (4, 20), (5, 20), (10, 30)],
        "id1 long, id2 long",
    )
    seeds = spark.createDataFrame(
        [(1, 7), (2, 7), (3, 9), (4, 9), (5, 7)], "node long, label long"
    )
    got = {
        r.node: (r.label, r.origin)
        for r in label_propagation_rounds(pairs, seeds, rounds=2).collect()
    }
    assert got[10] == (7, "propagated")   # majority 7 (2 vs 1)
    assert got[20] == (7, "propagated")   # tie 7 vs 9 -> min label 7
    assert got[30] == (7, "propagated")   # second round, via node 10
    assert got[1] == (7, "seed")
    assert 99 not in got

    one_round = {
        r.node
        for r in label_propagation_rounds(pairs, seeds, rounds=1).collect()
    }
    assert 30 not in one_round  # needs the second hop

"""Integer PageRank: fixed points, exact hand-computed values, mass
accounting, and determinism across partitionings."""

from __future__ import annotations

from pyspark.sql import functions as F

from vector_db_handler_spark.operators.graph import (
    PR_DAMP_DEN,
    PR_DAMP_NUM,
    PR_SCALE,
    pagerank_integer,
)

_TELEPORT = (PR_DAMP_DEN - PR_DAMP_NUM) * PR_SCALE // PR_DAMP_DEN


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "src long, dst long")


def test_symmetric_cycle_is_fixed_point(spark):
    """In a 2-cycle every node keeps exactly PR_SCALE: teleport +
    17/20 of a full share = a full share (no truncation loss when
    degrees divide evenly)."""
    out = pagerank_integer(_edges(spark, [(0, 1), (1, 0)]), iters=4).collect()
    assert {r.node: r.rank for r in out} == {0: PR_SCALE, 1: PR_SCALE}


def test_star_graph_matches_python_reference(spark):
    """Hub-and-spoke (hub 0, leaves 1..5, symmetrized): ranks after 3
    iterations equal an arbitrary-precision Python replay of the same
    integer recurrence."""
    k = 5
    pairs = [(0, i) for i in range(1, k + 1)] + [(i, 0) for i in range(1, k + 1)]
    got = {r.node: r.rank for r in pagerank_integer(_edges(spark, pairs), iters=3).collect()}

    deg = {0: k, **{i: 1 for i in range(1, k + 1)}}
    ranks = {n: PR_SCALE for n in deg}
    for _ in range(3):
        contrib = {n: 0 for n in deg}
        for s, d in pairs:
            contrib[d] += ranks[s] // deg[s]
        ranks = {
            n: _TELEPORT + (PR_DAMP_NUM * contrib[n]) // PR_DAMP_DEN for n in deg
        }
    assert got == ranks
    assert got[0] > got[1]  # hub outranks leaves


def test_rank_mass_is_conserved_up_to_truncation(spark, sf_dir):
    """Total rank stays within [N·S − loss_bound, N·S]: each node's
    step loses < deg(u) micro-shares to // deg and < DEN to the
    damping division — integer PageRank's quantified bias."""
    li = (
        spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        .select("l_partkey", "l_suppkey")
        .distinct()
    )
    fwd = li.select(
        (F.col("l_partkey") * 2).alias("src"),
        (F.col("l_suppkey") * 2 + 1).alias("dst"),
    )
    edges = fwd.unionByName(
        fwd.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    iters = 3
    ranks = pagerank_integer(edges, iters=iters)
    total = ranks.agg(F.sum("rank")).collect()[0][0]
    n_nodes = ranks.count()
    n_edges = edges.count()
    exact_total = n_nodes * PR_SCALE
    # per iteration: Σ_u (deg(u)-1) < n_edges truncation on contribs,
    # + n_nodes·(DEN-1) on the damping division
    loss_bound = iters * (n_edges + n_nodes * (PR_DAMP_DEN - 1))
    assert exact_total - loss_bound <= total <= exact_total


def test_determinism_across_partitionings(spark):
    """Repartitioning the edge list cannot change a single rank —
    integer sums are associative (the property float PageRank lacks)."""
    import random

    rng = random.Random(7)
    pairs = list({(rng.randrange(30), rng.randrange(30)) for _ in range(120)})
    pairs = [(s, d) for s, d in pairs if s != d]
    sym = pairs + [(d, s) for s, d in pairs]
    e = _edges(spark, sym)
    a = {r.node: r.rank for r in pagerank_integer(e, iters=3).collect()}
    b = {
        r.node: r.rank
        for r in pagerank_integer(e.repartition(17, "dst"), iters=3).collect()
    }
    assert a == b


def test_star_cc_contracts_long_chain(spark):
    """A 3,000-node chain has diameter 2,999 — hash-to-min label
    propagation would need ~3,000 rounds; the alternating star ops
    must contract it to one component in O(log^2 n) (max_rounds=30
    would raise otherwise)."""
    from vector_db_handler_spark.operators.graph import connected_components_star

    n = 3000
    chain = spark.range(n - 1).select(
        F.col("id").alias("d1"), (F.col("id") + 1).alias("d2")
    )
    out = connected_components_star(chain).collect()
    assert len(out) == n
    assert {r.component for r in out} == {0}


def test_star_cc_matches_label_propagation_on_clique_pile(spark, sf_dir):
    """On the near-dup-shaped graph (small cliques) both algorithms
    must produce identical labels — min node id per component."""
    from vector_db_handler_spark.operators.dedup import connected_components
    from vector_db_handler_spark.operators.graph import connected_components_star
    from vector_db_handler_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    # deterministic synthetic pairs: cliques of 3 over doc_id buckets,
    # plus a few cross-links to merge some cliques
    base = docs.filter(F.col("doc_id") < 60)
    pairs = (
        base.select(
            F.col("doc_id").alias("d1"),
            ((F.col("doc_id") - F.col("doc_id") % 3) + (F.col("doc_id") + 1) % 3).alias("d2"),
        ).filter(F.col("d1") != F.col("d2"))
        .union(
            base.filter(F.col("doc_id") % 15 == 0).select(
                F.col("doc_id").alias("d1"), (F.col("doc_id") + 3).alias("d2")
            )
        )
    )
    a = {
        (r.node, r.component)
        for r in connected_components(pairs, nodes=docs).collect()
    }
    b = {
        (r.node, r.component)
        for r in connected_components_star(pairs, nodes=docs).collect()
    }
    assert a == b and len(a) > 0


def test_star_cc_isolated_nodes_are_singletons(spark):
    from vector_db_handler_spark.operators.graph import connected_components_star

    pairs = spark.createDataFrame([(1, 2)], "d1 long, d2 long")
    nodes = spark.createDataFrame([(1,), (2,), (9,)], "doc_id long")
    got = {
        r.node: r.component
        for r in connected_components_star(pairs, nodes=nodes).collect()
    }
    assert got == {1: 1, 2: 1, 9: 9}


# ---------------------------------------------------------------------------
# triangle_count
# ---------------------------------------------------------------------------

from itertools import combinations

from vector_db_handler_spark.operators.graph import triangle_count


def _tri_brute(pairs):
    """Arbitrary-precision reference: per-node triangle membership by
    enumerating all node triples over the canonical undirected set."""
    und = {tuple(sorted(p)) for p in pairs if p[0] != p[1]}
    nodes = sorted({n for e in und for n in e})
    counts = {}
    for a, b, c in combinations(nodes, 3):
        if {(a, b), (a, c), (b, c)} <= und:
            for n in (a, b, c):
                counts[n] = counts.get(n, 0) + 1
    return counts


def test_triangle_known_shapes(spark):
    """Chain → none; K4 → every node in C(3,2)=3 triangles; a K4 with
    one pendant node → pendant absent from the output."""
    chain = _edges(spark, [(0, 1), (1, 2), (2, 3)])
    assert triangle_count(chain, "src", "dst").count() == 0

    k4 = [(a, b) for a in range(4) for b in range(4) if a < b]
    got = {
        r.node: r.n_triangles
        for r in triangle_count(_edges(spark, k4), "src", "dst").collect()
    }
    assert got == {0: 3, 1: 3, 2: 3, 3: 3}

    got = {
        r.node: r.n_triangles
        for r in triangle_count(
            _edges(spark, k4 + [(3, 9)]), "src", "dst"
        ).collect()
    }
    assert got == {0: 3, 1: 3, 2: 3, 3: 3}  # 9 participates in none


def test_triangle_random_graph_matches_brute_force(spark):
    """48-node pseudo-random graph (deterministic congruential edge
    picks, duplicate + reversed edges included on purpose): the
    oriented-wedge count equals full triple enumeration."""
    pairs = []
    x = 7
    for _ in range(300):
        x = (x * 1103515245 + 12345) % (2**31)
        u = x % 48
        x = (x * 1103515245 + 12345) % (2**31)
        v = x % 48
        pairs.append((u, v))
        if v % 3 == 0:
            pairs.append((v, u))  # reversed duplicate
    got = {
        r.node: r.n_triangles
        for r in triangle_count(_edges(spark, pairs), "src", "dst").collect()
    }
    assert got == _tri_brute(pairs)


# ---------------------------------------------------------------------------
# kcore_nodes
# ---------------------------------------------------------------------------

from vector_db_handler_spark.operators.graph import kcore_nodes


def _kcore_brute(pairs, k):
    adj = {}
    for u, v in pairs:
        if u != v:
            adj.setdefault(u, set()).add(v)
            adj.setdefault(v, set()).add(u)
    while True:
        drop = [n for n, s in adj.items() if len(s) < k]
        if not drop:
            return {n: len(s) for n, s in adj.items()}
        for n in drop:
            for m in adj[n]:
                adj[m].discard(n)
            del adj[n]


def test_kcore_known_shapes(spark):
    """K4 + pendant: 3-core is exactly the K4 (pendant and its anchor
    edge peeled); a pure chain has an EMPTY 2-core while a cycle IS
    its own 2-core."""
    from itertools import combinations

    k4p = list(combinations(range(4), 2)) + [(3, 9)]
    got = {
        r.node: r.core_degree
        for r in kcore_nodes(_edges(spark, k4p), k=3, src="src", dst="dst").collect()
    }
    assert got == {0: 3, 1: 3, 2: 3, 3: 3}

    chain = [(i, i + 1) for i in range(6)]
    assert kcore_nodes(_edges(spark, chain), 2, "src", "dst").count() == 0

    cycle = chain + [(6, 0)]
    got = {
        r.node: r.core_degree
        for r in kcore_nodes(_edges(spark, cycle), 2, "src", "dst").collect()
    }
    assert got == {i: 2 for i in range(7)}


def test_kcore_matches_brute_force_on_random_graph(spark):
    pairs, x = [], 5
    for _ in range(260):
        x = (x * 1103515245 + 12345) % (2**31)
        u = x % 40
        x = (x * 1103515245 + 12345) % (2**31)
        v = x % 40
        pairs.append((u, v))
    for k in (2, 3, 4):
        got = {
            r.node: r.core_degree
            for r in kcore_nodes(_edges(spark, pairs), k, "src", "dst").collect()
        }
        assert got == _kcore_brute(pairs, k), f"k={k}"


def test_kcore_round_guard_raises(spark):
    import pytest as _pt

    chain = [(i, i + 1) for i in range(12)]
    with _pt.raises(RuntimeError):
        # a 12-chain needs 6 peel rounds at k=2; cap at 2 must fail loudly
        kcore_nodes(_edges(spark, chain), 2, "src", "dst", max_rounds=2)


# ---------------------------------------------------------------------------
# bfs_hops
# ---------------------------------------------------------------------------

from vector_db_handler_spark.operators.graph import bfs_hops


def _seeds(spark, ids):
    return spark.createDataFrame([(i,) for i in ids], "node long")


def test_bfs_chain_distances_and_horizon(spark):
    """Chain 0-1-2-3-4-5, seed {0}: hops = index, truncated at the
    horizon; a disconnected node never appears."""
    chain = [(i, i + 1) for i in range(5)] + [(100, 101)]
    got = {
        r.node: r.hops
        for r in bfs_hops(
            _edges(spark, chain), _seeds(spark, [0]), max_hops=3,
            src="src", dst="dst",
        ).collect()
    }
    assert got == {0: 0, 1: 1, 2: 2, 3: 3}


def test_bfs_multi_seed_takes_minimum(spark):
    """Seeds at both chain ends: distance is min over seeds; early
    convergence when the frontier empties."""
    chain = [(i, i + 1) for i in range(6)]
    got = {
        r.node: r.hops
        for r in bfs_hops(
            _edges(spark, chain), _seeds(spark, [0, 6]), max_hops=10,
            src="src", dst="dst",
        ).collect()
    }
    assert got == {0: 0, 6: 0, 1: 1, 5: 1, 2: 2, 4: 2, 3: 3}


def test_bfs_zero_horizon_and_guard(spark):
    import pytest as _pt

    e = _edges(spark, [(0, 1)])
    got = bfs_hops(e, _seeds(spark, [0]), max_hops=0, src="src", dst="dst").collect()
    assert [(r.node, r.hops) for r in got] == [(0, 0)]
    with _pt.raises(ValueError):
        bfs_hops(e, _seeds(spark, [0]), max_hops=-1, src="src", dst="dst")


# ---------------------------------------------------------------------------
# components_apply_batch
# ---------------------------------------------------------------------------

from vector_db_handler_spark.operators.graph import (
    components_apply_batch,
    connected_components_star,
)


def _pairs(spark, rows):
    return spark.createDataFrame(rows, "d1 long, d2 long")


def test_incremental_components_match_full_recompute(spark):
    """Fold two edge batches into a maintained labeling; after each
    fold the labels equal a full recompute over all edges seen —
    including a batch that BRIDGES two existing components and one
    that introduces brand-new nodes."""
    base = [(1, 2), (3, 4), (10, 11)]
    labels = connected_components_star(_pairs(spark, base))

    batch1 = [(2, 3)]  # bridges {1,2} and {3,4}
    labels = components_apply_batch(labels, _pairs(spark, batch1))
    full1 = connected_components_star(_pairs(spark, base + batch1))
    assert sorted(map(tuple, labels.collect())) == sorted(
        map(tuple, full1.collect())
    )

    batch2 = [(20, 21), (11, 20)]  # new nodes + attach to {10,11}
    labels = components_apply_batch(labels, _pairs(spark, batch2))
    full2 = connected_components_star(_pairs(spark, base + batch1 + batch2))
    assert sorted(map(tuple, labels.collect())) == sorted(
        map(tuple, full2.collect())
    )
    got = {r.node: r.component for r in labels.collect()}
    assert got[21] == got[10] == 10  # merged into the min-labeled comp
    assert got[1] == got[4] == 1

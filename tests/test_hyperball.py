"""HyperBall neighborhood function (Boldi & Vigna): small-graph
accuracy against exact BFS balls, register monotonicity, saturation,
determinism, and the cross-engine DuckDB replay over the
part-supplier graph.  Staged in r12 for r13 driver registration."""

from __future__ import annotations

import pytest

from tests.oracle_check import compare
from vector_db_handler_spark import driver_queries as dq
from vector_db_handler_spark.operators.graph import hyperball_neighborhood

P = dq._HB_P
HOPS = dq._HB_HOPS

#: Registered in r13 — SQL lives in driver_queries (one source of
#: truth; this module replays it cross-engine at fixture scale).
ORACLE_SQL = dq._HYPERBALL_SQL


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "src long, dst long")


def _balls(pairs, hops):
    """Exact BFS ball sizes per node per hop (pure-Python truth)."""
    import collections

    nbrs = collections.defaultdict(set)
    for a, b in pairs:
        if a != b:
            nbrs[a].add(b)
            nbrs[b].add(a)
    out = {}
    for n in nbrs:
        ball = {n}
        out[(n, 0)] = 1
        for h in range(1, hops + 1):
            ball |= {m for x in ball for m in nbrs[x]}
            out[(n, h)] = len(ball)
    return out


def test_chain_balls_track_exact_bfs(spark):
    """10-node chain: tiny balls (1/≤3/≤5) sit deep in the
    linear-counting regime where the estimate is near-exact."""
    pairs = [(i, i + 1) for i in range(9)]
    truth = _balls(pairs, HOPS)
    got = {
        (r["node"], r["hop"]): r["est_used"]
        for r in hyperball_neighborhood(_edges(spark, pairs), n_hops=HOPS).collect()
    }
    assert set(got) == set(truth)
    for key, true_n in truth.items():
        assert abs(got[key] - true_n) <= max(1.5, 0.35 * true_n), (key, got[key], true_n)


def test_registers_monotone_and_saturating(spark):
    """sum_scaled never increases with hop (max-merge only grows
    registers), and on a complete graph the hop-1 ball is already
    everything — hop 2 registers are identical."""
    pairs = [(a, b) for a in range(5) for b in range(5) if a < b]
    rows = hyperball_neighborhood(_edges(spark, pairs), n_hops=2).collect()
    by = {(r["node"], r["hop"]): r for r in rows}
    for n in range(5):
        s0, s1, s2 = (by[(n, h)]["sum_scaled"] for h in (0, 1, 2))
        assert s0 >= s1 >= s2
        assert by[(n, 1)]["sum_scaled"] == by[(n, 2)]["sum_scaled"]
        assert by[(n, 1)]["est_used"] == by[(n, 2)]["est_used"]


def test_self_loops_dropped_and_hops_validated(spark):
    out = hyperball_neighborhood(_edges(spark, [(1, 1)]), n_hops=1).collect()
    assert out == []
    with pytest.raises(ValueError, match="n_hops"):
        hyperball_neighborhood(_edges(spark, [(1, 2)]), n_hops=-1)


def test_deterministic_across_partitionings(spark):
    pairs = [(a, a + 1) for a in range(40)] + [(0, 39), (7, 23)]
    one = hyperball_neighborhood(_edges(spark, pairs).coalesce(1), n_hops=2)
    many = hyperball_neighborhood(_edges(spark, pairs).repartition(8), n_hops=2)
    assert sorted(map(tuple, one.collect())) == sorted(map(tuple, many.collect()))


def test_fixture_accuracy_within_sketch_band(spark, sf_dir):
    """Part–supplier 2-hop balls vs exact BFS: the per-node estimate
    must sit inside the 64-register sketch's error distribution
    (median within 1σ≈13%·1.5, and no pathological tail)."""
    from pyspark.sql import functions as F

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    pairs = [
        (r["p"] * 2, r["s"] * 2 + 1)
        for r in li.select(
            F.col("l_partkey").alias("p"), F.col("l_suppkey").alias("s")
        ).distinct().collect()
    ]
    truth = _balls(pairs, HOPS)
    edges = _edges(spark, pairs)
    got = {
        (r["node"], r["hop"]): r["est_used"]
        for r in hyperball_neighborhood(edges, n_hops=HOPS).collect()
    }
    errs = sorted(
        abs(got[k] - n) / n for k, n in truth.items() if k[1] == HOPS
    )
    median = errs[len(errs) // 2]
    p95 = errs[int(len(errs) * 0.95)]
    assert median < 0.20, median
    assert p95 < 0.50, p95


def test_cross_engine_oracle_replay(spark, sf_dir, duck):
    from pyspark.sql import functions as F

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    e0 = li.select("l_partkey", "l_suppkey").distinct()
    edges = e0.select(
        (F.col("l_partkey") * 2).alias("src"),
        (F.col("l_suppkey") * 2 + 1).alias("dst"),
    )
    compare(hyperball_neighborhood(edges, n_hops=HOPS, p=P), duck, ORACLE_SQL)


# --- neighborhood function / effective diameter ------------------------

#: Registered in r13 — the per-hop rollup twin lives in driver_queries.
NEIGHBORHOOD_SQL = dq._NEIGHBORHOOD_SQL


def test_neighborhood_function_monotone_and_covers(spark):
    """On a clique N(1) already covers everything: hop 1 and hop 2
    tie, both cover q, and reach is monotone in hop."""
    from vector_db_handler_spark.operators.graph import (
        neighborhood_function,
    )

    pairs = [(a, b) for a in range(6) for b in range(6) if a < b]
    rows = {r["hop"]: r for r in neighborhood_function(_edges(spark, pairs), n_hops=2).collect()}
    assert rows[0]["sum_reach_micro"] <= rows[1]["sum_reach_micro"]
    assert rows[1]["sum_reach_micro"] == rows[2]["sum_reach_micro"]
    assert rows[2]["reach_ratio"] == 1.0 and rows[2]["covers_q"]
    assert rows[1]["covers_q"] and not rows[0]["covers_q"]


def test_effective_diameter_on_chain(spark):
    """A long chain needs every hop: the smallest covering hop is the
    deepest one, and ratios grow strictly."""
    from vector_db_handler_spark.operators.graph import (
        neighborhood_function,
    )

    pairs = [(i, i + 1) for i in range(30)]
    rows = {r["hop"]: r for r in neighborhood_function(_edges(spark, pairs), n_hops=2).collect()}
    assert rows[0]["reach_ratio"] < rows[1]["reach_ratio"] < 1.0
    assert not rows[0]["covers_q"] and not rows[1]["covers_q"]
    assert rows[2]["covers_q"]


def test_neighborhood_cross_engine_replay(spark, sf_dir, duck):
    from pyspark.sql import functions as F

    from vector_db_handler_spark.operators.graph import (
        neighborhood_function,
    )

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    e0 = li.select("l_partkey", "l_suppkey").distinct()
    edges = e0.select(
        (F.col("l_partkey") * 2).alias("src"),
        (F.col("l_suppkey") * 2 + 1).alias("dst"),
    )
    compare(
        neighborhood_function(edges, n_hops=HOPS, p=P), duck, NEIGHBORHOOD_SQL
    )


def test_rollup_from_shared_per_node_is_identical(spark, sf_dir):
    """r13 verdict #4: the N(h) rollup passed a precomputed per-node
    relation must equal the self-contained form bit-for-bit — the
    shared-propagation memo is an optimization, never a semantics
    change."""
    from vector_db_handler_spark import driver_queries as dq
    from vector_db_handler_spark.operators.graph import (
        hyperball_neighborhood,
        neighborhood_function,
    )

    edges = dq._part_supplier_edges(spark, sf_dir)
    direct = neighborhood_function(edges, n_hops=2, p=6).collect()
    shared = neighborhood_function(
        edges,
        n_hops=2,
        p=6,
        per_node=hyperball_neighborhood(edges, n_hops=2, p=6),
    ).collect()
    assert sorted(map(tuple, shared)) == sorted(map(tuple, direct))

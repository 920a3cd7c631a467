"""Fixed-round label propagation communities: planted
two-cliques-one-bridge separation (the case components cannot make),
literal replay, determinism, and the cross-engine DuckDB replay over
the part–supplier graph.  Staged in r11 for r12 driver
registration."""

from __future__ import annotations

import collections

import pytest

from tests.oracle_check import compare
from vector_db_handler_spark import driver_queries as dq
from vector_db_handler_spark.operators.graph import (
    label_propagation_communities,
)

ITERS = dq._LPA_ITERS

#: The registered oracle (moved into driver_queries.py in r12).
ORACLE_SQL = dq._LPA_SQL


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "src long, dst long")


def _replay(pairs, iters):
    sym = set()
    for a, b in pairs:
        if a != b:
            sym.add((a, b))
            sym.add((b, a))
    nbrs = collections.defaultdict(list)
    for a, b in sym:
        nbrs[a].append(b)
    labels = {n: n for n in nbrs}
    for _ in range(iters):
        new = {}
        for n in nbrs:
            votes = collections.Counter(labels[m] for m in nbrs[n])
            new[n] = max(votes, key=lambda l: (votes[l], -l))
        labels = new
    return labels


def test_two_cliques_one_bridge_split_into_two_communities(spark):
    """One connected component, two dense cliques joined by a single
    bridge: LPA must give two communities where components gives
    one."""
    c1 = [(a, b) for a in range(4) for b in range(4) if a < b]
    c2 = [(a, b) for a in range(10, 14) for b in range(10, 14) if a < b]
    bridge = [(3, 10)]
    out = {
        r["node"]: r["community"]
        for r in label_propagation_communities(
            _edges(spark, c1 + c2 + bridge), n_iters=ITERS
        ).collect()
    }
    left = {out[n] for n in range(4)}
    right = {out[n] for n in range(10, 14)}
    assert len(left) == 1 and len(right) == 1
    assert left != right


def test_matches_literal_replay(spark):
    pairs = [(1, 2), (2, 3), (3, 1), (3, 4), (4, 5), (5, 6), (6, 4), (7, 7)]
    got = {
        r["node"]: r["community"]
        for r in label_propagation_communities(
            _edges(spark, pairs), n_iters=ITERS
        ).collect()
    }
    assert got == _replay(pairs, ITERS)


def test_deterministic_across_partitionings(spark):
    pairs = [(a, a + 1) for a in range(30)] + [(0, 29), (5, 20)]
    df1 = _edges(spark, pairs).coalesce(1)
    df8 = _edges(spark, pairs).repartition(8)
    one = sorted(
        (r["node"], r["community"])
        for r in label_propagation_communities(df1, n_iters=2).collect()
    )
    many = sorted(
        (r["node"], r["community"])
        for r in label_propagation_communities(df8, n_iters=2).collect()
    )
    assert one == many


def test_self_loops_dropped_and_iters_validated(spark):
    assert (
        label_propagation_communities(_edges(spark, [(1, 1)])).count() == 0
    )
    with pytest.raises(ValueError, match="n_iters"):
        label_propagation_communities(_edges(spark, [(1, 2)]), n_iters=0)


def test_cross_engine_oracle_replay(spark, sf_dir, duck):
    from pyspark.sql import functions as F

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    e0 = li.select("l_partkey", "l_suppkey").distinct()
    edges = e0.select(
        (F.col("l_partkey") * 2).alias("src"),
        (F.col("l_suppkey") * 2 + 1).alias("dst"),
    )
    got = (
        label_propagation_communities(edges, n_iters=ITERS)
        .groupBy("community")
        .agg(F.count(F.lit(1)).cast("long").alias("n_nodes"))
    )
    compare(got, duck, ORACLE_SQL)

"""Connected-components + canonical-survivor operator properties the
oracle replay can't isolate: multi-round convergence on chains (the
fixture's near-dup graph is all 2-cliques, which converge in one
round), isolated-node handling, and the survivor tie-break."""

from __future__ import annotations

from pyspark.sql import functions as F

from vector_db_handler_spark.operators import dedup as dedup_ops


def _components(spark, edges, nodes=None):
    pairs = spark.createDataFrame(edges, "d1 long, d2 long")
    nodes_df = (
        spark.createDataFrame([(n,) for n in nodes], "doc_id long")
        if nodes is not None
        else None
    )
    comp = dedup_ops.connected_components(pairs, nodes=nodes_df)
    return {r["node"]: r["component"] for r in comp.collect()}


def test_chain_converges_to_min(spark):
    # 1-2-3-4-5-6-7-8 is diameter 7: label 1 must walk the whole
    # chain, proving the loop iterates past round one.
    got = _components(spark, [(i, i + 1) for i in range(1, 8)])
    assert got == {i: 1 for i in range(1, 9)}


def test_two_cliques_and_isolated_nodes(spark):
    got = _components(
        spark,
        [(10, 11), (11, 12), (20, 21)],
        nodes=[10, 11, 12, 20, 21, 30, 31],
    )
    assert got == {10: 10, 11: 10, 12: 10, 20: 20, 21: 20, 30: 30, 31: 31}


def test_edge_direction_is_irrelevant(spark):
    # min id appearing on the d2 side must still win the component.
    got = _components(spark, [(5, 1), (5, 9)])
    assert got == {1: 1, 5: 1, 9: 1}


def test_canonical_keeps_longest_then_smallest_id(spark):
    docs = spark.createDataFrame(
        [(1, 100), (2, 300), (3, 300), (4, 50)],
        "doc_id long, n_chars long",
    )
    comp = spark.createDataFrame(
        [(1, 1), (2, 1), (3, 1), (4, 4)], "node long, component long"
    )
    got = {
        r["component"]: (r["canonical_doc_id"], r["cluster_size"])
        for r in dedup_ops.canonical_docs(docs, comp).collect()
    }
    # longest wins; 2 vs 3 tie on n_chars=300 → smaller id 2
    assert got == {1: (2, 3), 4: (4, 1)}


def test_random_graphs_match_union_find(spark):
    """Property check: on seeded random graphs, the distributed label
    propagation must equal a reference union-find exactly."""
    import random

    def union_find_components(edges, nodes):
        parent = {n: n for n in nodes}

        def find(x):
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for a, b in edges:
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
        # canonical label = min node in the set
        comp = {}
        for n in nodes:
            r = find(n)
            comp.setdefault(r, []).append(n)
        return {n: min(members) for r, members in comp.items() for n in members}

    rng = random.Random(42)
    for trial in range(3):
        nodes = list(range(60))
        edges = [
            (rng.randrange(60), rng.randrange(60)) for _ in range(25 + 10 * trial)
        ]
        edges = [(a, b) for a, b in edges if a != b]
        want = union_find_components(edges, nodes)
        got = _components(spark, edges, nodes=nodes)
        assert got == want, f"trial {trial}"

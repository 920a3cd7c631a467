"""Hierarchical graph-ANN search (the HNSW-style coarse entry layer
`knn_graph_beam_search` defers): layer membership + coarse-edge
derivation semantics, two-level descent determinism, tiny-corpus
fallbacks, and the cross-engine DuckDB replay composed onto the
registered NN-descent CTE chain.  Registered in r14; the oracle
lives in driver_queries and this file aliases it back."""

from __future__ import annotations

import pytest

from tests.oracle_check import assert_oracle_types_hashable, compare
from vector_db_handler_spark import driver_queries as dq
from vector_db_handler_spark.operators.similarity import (
    knn_graph_beam_search,
    knn_graph_hierarchical_search,
)

# Dials + oracle registered in r14 — driver_queries is the one source
# of truth; this file aliases them (the staging direction reversed).
K = dq._HIER_K
BEAM = dq._HIER_BEAM
HOPS = dq._HIER_HOPS
LAYER_MOD = dq._HIER_LAYER_MOD
COARSE_K = dq._HIER_COARSE_K
COARSE_HOPS = dq._HIER_COARSE_HOPS
COARSE_ENTRY_MOD = dq._HIER_COARSE_ENTRY_MOD

HIER_ORACLE_SQL = dq._HIER_SEARCH_SQL


def _emb(spark, rows):
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def _run(spark, sf_dir, **kw):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    args = dict(
        k=K,
        beam=BEAM,
        hops=HOPS,
        layer_mod=LAYER_MOD,
        coarse_k=COARSE_K,
        coarse_hops=COARSE_HOPS,
        coarse_entry_mod=COARSE_ENTRY_MOD,
        graph_k=dq._NND_K,
        graph_iters=dq._NND_ITERS,
        rand_buckets=dq._NND_RAND_BUCKETS,
    )
    args.update(kw)
    return knn_graph_hierarchical_search(emb, dq.QUERY_VEC, **args)


def test_oracle_types_hashable(duck):
    assert_oracle_types_hashable(duck, HIER_ORACLE_SQL, "hierarchical")


def test_cross_engine_oracle_replay(spark, sf_dir, duck):
    compare(_run(spark, sf_dir), duck, HIER_ORACLE_SQL)


def test_shape_and_order(spark, sf_dir):
    rows = sorted(_run(spark, sf_dir).collect(), key=lambda r: r["rank"])
    assert len(rows) == K
    assert [r["rank"] for r in rows] == list(range(1, K + 1))
    scores = [r["iscore"] for r in rows]
    assert scores == sorted(scores, reverse=True)


def test_deterministic_across_partitionings(spark, sf_dir):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    base = _run(spark, sf_dir).collect()
    shuffled = knn_graph_hierarchical_search(
        emb.repartition(7),
        dq.QUERY_VEC,
        k=K,
        beam=BEAM,
        hops=HOPS,
        layer_mod=LAYER_MOD,
        coarse_k=COARSE_K,
        coarse_hops=COARSE_HOPS,
        coarse_entry_mod=COARSE_ENTRY_MOD,
        graph_k=dq._NND_K,
        graph_iters=dq._NND_ITERS,
        rand_buckets=dq._NND_RAND_BUCKETS,
    ).collect()
    assert sorted(map(tuple, base)) == sorted(map(tuple, shuffled))


def test_full_visibility_degenerates_to_exact_int8_topk(spark):
    """layer_mod=1 + coarse_entry_mod=1 scores the WHOLE corpus into
    the coarse entry beam: from there every stage keeps a superset's
    top-beam, so the final answer must equal the exact int8 top-k in
    ids, order, and integer scores — the hierarchy degrades to brute
    force exactly when its pruning dials are turned off (the same
    contract the flat search pins)."""
    from vector_db_handler_spark.operators.quantize import quantized_knn

    rows = [
        (i, [((i * 7 + d * 3) % 11 - 5) / 5.0 for d in range(8)])
        for i in range(40)
    ]
    emb = _emb(spark, rows)
    q = [((d * 5 + 2) % 11 - 5) / 5.0 for d in range(8)]
    got = knn_graph_hierarchical_search(
        emb,
        q,
        k=5,
        beam=40,
        hops=0,
        layer_mod=1,
        coarse_k=3,
        coarse_hops=0,
        coarse_entry_mod=1,
        kmeans_k=2,
        rand_buckets=8,
    ).collect()
    want = quantized_knn(emb, q, k=5).collect()
    assert [
        (r["vec_id"], r["iscore"])
        for r in sorted(got, key=lambda r: r["rank"])
    ] == [(r["vec_id"], r["qscore"]) for r in want]


def test_tiny_corpus_layer_fallback(spark):
    """A corpus where the hash layer is empty must fall back to the
    (hash, id)-minimal node and still return k rows, not zero."""
    rows = [(i, [float(i == d) for d in range(4)]) for i in range(3)]
    emb = _emb(spark, rows)
    out = knn_graph_hierarchical_search(
        emb,
        [1.0, 0.0, 0.0, 0.0],
        k=2,
        beam=4,
        hops=1,
        layer_mod=10**9,
        coarse_k=2,
        coarse_hops=1,
        coarse_entry_mod=1,
        kmeans_k=2,
        rand_buckets=4,
    ).collect()
    # The single fallback node seeds the walk; the answer is whatever
    # the graph can reach from it — at least the seed itself, never
    # zero rows, ranks contiguous.
    assert len(out) >= 1
    assert sorted(r["rank"] for r in out) == list(range(1, len(out) + 1))


def test_args_validated(spark):
    emb = _emb(spark, [(0, [1.0, 0.0])])
    q = [1.0, 0.0]
    with pytest.raises(ValueError, match="k <= beam"):
        knn_graph_hierarchical_search(emb, q, k=5, beam=3)
    with pytest.raises(ValueError, match="layer_mod"):
        knn_graph_hierarchical_search(emb, q, k=1, beam=2, layer_mod=0)
    with pytest.raises(ValueError, match="coarse_k"):
        knn_graph_hierarchical_search(emb, q, k=1, beam=2, coarse_k=0)
    with pytest.raises(ValueError, match="hops"):
        knn_graph_hierarchical_search(emb, q, k=1, beam=2, coarse_hops=-1)

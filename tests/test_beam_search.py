"""Graph-ANN beam search over the NN-descent kNN graph: equivalence
to exact int8 top-k when the beam sees everything, hop-monotone
recall on planted structure, edge semantics, determinism, and the
cross-engine DuckDB replay composed onto the registered NN-descent
CTE chain.  Staged in r12 for r13 driver registration."""

from __future__ import annotations

import pytest

from tests.oracle_check import compare
from vector_db_handler_spark import driver_queries as dq
from vector_db_handler_spark.operators.similarity import (
    knn_graph_beam_search,
    knn_graph_nn_descent,
)

K = dq._BEAM_K
BEAM = dq._BEAM_WIDTH
HOPS = dq._BEAM_HOPS
ENTRY_MOD = dq._BEAM_ENTRY_MOD

#: Registered in r13 — the SQL lives in driver_queries (one source of
#: truth; this module replays it cross-engine at fixture scale).
ORACLE_SQL = dq._BEAM_SEARCH_SQL


def _emb(spark, rows):
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def test_full_visibility_equals_exact_int8_topk(spark):
    """entry_mod=1 + hops=0 scores the WHOLE corpus into the beam:
    the result must equal the exact int8 top-k (quantized_knn) in
    ids, order, and integer scores — beam search degrades to brute
    force exactly when its pruning is turned off."""
    from vector_db_handler_spark.operators.quantize import quantized_knn

    rows = [
        (i, [((i * 7 + d * 3) % 11 - 5) / 5.0 for d in range(8)])
        for i in range(40)
    ]
    emb = _emb(spark, rows)
    q = [((d * 5 + 2) % 11 - 5) / 5.0 for d in range(8)]
    got = knn_graph_beam_search(
        emb, q, k=5, beam=40, hops=0, entry_mod=1, kmeans_k=2
    ).collect()
    want = quantized_knn(emb, q, k=5).collect()
    assert [(r["vec_id"], r["iscore"]) for r in sorted(got, key=lambda r: r["rank"])] == [
        (r["vec_id"], r["qscore"]) for r in want
    ]


def test_hops_recover_entries_miss(spark):
    """Plant a best node whose cluster the entry slice misses: hops
    must walk to it through the graph (the connectivity payoff),
    reaching the exact int8 argmax after one hop.  Family size 4 with
    graph_k=5 forces cross-family edges — the NAVIGABILITY condition
    the operator documents (a converged kNN graph with k < cluster
    size is cluster-pure, i.e. disconnected across clusters, and no
    beam width can cross it; that is why HNSW adds long-range
    layers)."""
    from tests.test_nn_descent import _planted_families

    emb = _planted_families(spark, n_families=20, members=4, dim=16)
    q_row = [r for r in emb.collect() if r["vec_id"] == 3 * 4][0]
    q = list(q_row["embedding"])

    def best(hops):
        out = knn_graph_beam_search(
            emb, q, k=1, beam=4, hops=hops, entry_mod=16,
            rand_buckets=8, kmeans_k=4, graph_k=5, graph_iters=2,
        ).collect()
        return out[0]["iscore"] if out else None

    exact = knn_graph_beam_search(
        emb, q, k=1, beam=80, hops=0, entry_mod=1, kmeans_k=4,
        rand_buckets=8,
    ).collect()[0]["iscore"]
    b0, b1 = best(0), best(1)
    assert b0 is not None and b0 < exact  # entries alone miss it
    assert b1 == exact  # one hop of graph walking recovers it


def test_cluster_pure_graph_is_not_navigable(spark):
    """The documented limitation, pinned: graph_k=5 < family size 8
    makes every node's neighbors same-family only — the graph is
    DISCONNECTED across families, so hops can never leave the entry
    families no matter the beam.  (The production answer is a
    coarser entry layer or graph_k >= cluster size.)"""
    from tests.test_nn_descent import _planted_families

    emb = _planted_families(spark, n_families=20, members=8, dim=16)
    q_row = [r for r in emb.collect() if r["vec_id"] == 3 * 8][0]
    q = list(q_row["embedding"])
    exact = knn_graph_beam_search(
        emb, q, k=1, beam=160, hops=0, entry_mod=1, kmeans_k=4,
        rand_buckets=8,
    ).collect()[0]["iscore"]
    stuck = knn_graph_beam_search(
        emb, q, k=1, beam=16, hops=3, entry_mod=16, kmeans_k=4,
        rand_buckets=8, graph_k=5, graph_iters=2,
    ).collect()[0]["iscore"]
    assert stuck < exact


def test_args_validated(spark):
    emb = _emb(spark, [(0, [1.0, 0.0])])
    with pytest.raises(ValueError, match="k <= beam"):
        knn_graph_beam_search(emb, [1.0, 0.0], k=5, beam=3)
    with pytest.raises(ValueError, match="hops"):
        knn_graph_beam_search(emb, [1.0, 0.0], k=1, beam=2, hops=-1)
    with pytest.raises(ValueError, match="entry_mod"):
        knn_graph_beam_search(emb, [1.0, 0.0], k=1, beam=2, entry_mod=0)


def test_entry_mod_self_derives(spark):
    """entry_mod=None derives max(1, N // 1024): on a small corpus
    the slice is the whole corpus, so hops=0 + full beam must equal
    the exact int8 top-k — the r12 rand_buckets fix mirrored onto
    the query dial."""
    from vector_db_handler_spark.operators.quantize import quantized_knn

    rows = [
        (i, [((i * 7 + d * 3) % 11 - 5) / 5.0 for d in range(8)])
        for i in range(40)
    ]
    emb = _emb(spark, rows)
    q = [((d * 5 + 2) % 11 - 5) / 5.0 for d in range(8)]
    got = knn_graph_beam_search(
        emb, q, k=5, beam=40, hops=0, entry_mod=None, kmeans_k=2
    ).collect()
    want = quantized_knn(emb, q, k=5).collect()
    assert [
        (r["vec_id"], r["iscore"]) for r in sorted(got, key=lambda r: r["rank"])
    ] == [(r["vec_id"], r["qscore"]) for r in want]


def test_empty_entry_slice_falls_back(spark):
    """r12 ADVICE: an entry_mod no node hashes to zero under must not
    silently return zero rows — the (hash, id)-minimal node seeds the
    beam instead, and hops still walk outward from it."""
    rows = [
        (i, [((i * 13 + d * 7) % 9 - 4) / 4.0 for d in range(8)])
        for i in range(12)
    ]
    emb = _emb(spark, rows)
    q = [((d * 3 + 1) % 9 - 4) / 4.0 for d in range(8)]
    # 2^59 exceeds every 60-bit hash's chance of hitting 0 mod it for
    # a 12-node corpus: the slice is empty, the fallback must engage.
    out = knn_graph_beam_search(
        emb, q, k=3, beam=6, hops=3, entry_mod=2**59,
        kmeans_k=2, rand_buckets=4, graph_k=4, graph_iters=1,
    ).collect()
    assert len(out) == 3
    scores = [r["iscore"] for r in sorted(out, key=lambda r: r["rank"])]
    assert scores == sorted(scores, reverse=True)


def test_batch_empty_entry_slice_falls_back(spark):
    from vector_db_handler_spark.operators.similarity import (
        knn_graph_beam_search_batch,
    )

    rows = [
        (i, [((i * 13 + d * 7) % 9 - 4) / 4.0 for d in range(8)])
        for i in range(12)
    ]
    emb = _emb(spark, rows)
    queries = emb.filter(emb["vec_id"].isin([0, 5])).select(
        emb["vec_id"].alias("query_id"), "embedding"
    )
    out = knn_graph_beam_search_batch(
        emb, queries, k=2, beam=4, hops=3, entry_mod=2**59,
        kmeans_k=2, rand_buckets=4, graph_k=4, graph_iters=1,
    ).collect()
    assert {r["query_id"] for r in out} == {0, 5}
    assert len(out) == 4


def test_deterministic_across_partitionings(spark):
    rows = [
        (i, [((i * 13 + d * 7) % 9 - 4) / 4.0 for d in range(8)])
        for i in range(60)
    ]
    q = [((d * 3 + 1) % 9 - 4) / 4.0 for d in range(8)]
    one = _emb(spark, rows).coalesce(1)
    many = _emb(spark, rows).repartition(8)
    kw = dict(k=5, beam=6, hops=2, entry_mod=4, kmeans_k=4, rand_buckets=8)
    a = [tuple(r) for r in knn_graph_beam_search(one, q, **kw).collect()]
    b = [tuple(r) for r in knn_graph_beam_search(many, q, **kw).collect()]
    assert a == b and len(a) == 5


def test_prebuilt_graph_is_reused(spark):
    """Passing a prebuilt graph must give the same answer as building
    inline with the same dials — the amortize-one-build-across-
    queries production shape."""
    rows = [
        (i, [((i * 5 + d) % 7 - 3) / 3.0 for d in range(6)])
        for i in range(30)
    ]
    emb = _emb(spark, rows)
    q = [((d * 2 + 1) % 7 - 3) / 3.0 for d in range(6)]
    g = knn_graph_nn_descent(emb, k=3, iters=1, kmeans_k=2, rand_buckets=4)
    kw = dict(k=3, beam=4, hops=1, entry_mod=2)
    a = [tuple(r) for r in knn_graph_beam_search(
        emb, q, graph=g, **kw).collect()]
    b = [tuple(r) for r in knn_graph_beam_search(
        emb, q, graph_k=3, graph_iters=1, kmeans_k=2, rand_buckets=4,
        **kw).collect()]
    assert a == b


def test_cross_engine_oracle_replay(spark, sf_dir, duck):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    got = knn_graph_beam_search(
        emb,
        dq.QUERY_VEC,
        k=K,
        beam=BEAM,
        hops=HOPS,
        entry_mod=ENTRY_MOD,
        graph_k=dq._NND_K,
        graph_iters=dq._NND_ITERS,
        rand_buckets=dq._NND_RAND_BUCKETS,
    )
    compare(got, duck, ORACLE_SQL)


# --- batch serve --------------------------------------------------------

QUERY_MOD = dq._BEAM_QUERY_MOD  # embeddings slice used as the query set

#: Registered in r13 — SQL lives in driver_queries.
BATCH_ORACLE_SQL = dq._BEAM_BATCH_SQL


def test_batch_equals_per_query_singles(spark):
    """The batch serve must give, per query, EXACTLY what the
    single-query operator gives against the same prebuilt graph —
    one job, no cross-query interference."""
    from vector_db_handler_spark.operators.similarity import (
        knn_graph_beam_search_batch,
    )

    rows = [
        (i, [((i * 11 + d * 3) % 13 - 6) / 6.0 for d in range(8)])
        for i in range(50)
    ]
    emb = _emb(spark, rows)
    g = knn_graph_nn_descent(emb, k=4, iters=1, kmeans_k=4, rand_buckets=8)
    g = g.localCheckpoint()
    q_ids = [0, 17, 31]
    queries = emb.filter(emb["vec_id"].isin(q_ids)).select(
        emb["vec_id"].alias("query_id"), "embedding"
    )
    kw = dict(k=3, beam=4, hops=2, entry_mod=4, graph=g)
    batch = {
        (r["query_id"], r["rank"]): (r["neighbor_id"], r["iscore"])
        for r in knn_graph_beam_search_batch(emb, queries, **kw).collect()
    }
    singles = {}
    for qid in q_ids:
        qvec = rows[qid][1]
        for r in knn_graph_beam_search(
            emb, qvec, k=3, beam=4, hops=2, entry_mod=4, graph=g
        ).collect():
            singles[(qid, r["rank"])] = (r["vec_id"], r["iscore"])
    assert batch == singles and len(batch) == 9


def test_batch_args_validated(spark):
    from vector_db_handler_spark.operators.similarity import (
        knn_graph_beam_search_batch,
    )

    emb = _emb(spark, [(0, [1.0, 0.0])])
    q = emb.select(emb["vec_id"].alias("query_id"), "embedding")
    with pytest.raises(ValueError, match="k <= beam"):
        knn_graph_beam_search_batch(emb, q, k=5, beam=3)


def test_batch_cross_engine_oracle_replay(spark, sf_dir, duck):
    from pyspark.sql import functions as F

    from vector_db_handler_spark.operators.similarity import (
        knn_graph_beam_search_batch,
    )

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    queries = emb.filter(F.col("vec_id") % QUERY_MOD == 0).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    got = knn_graph_beam_search_batch(
        emb,
        queries,
        k=K,
        beam=BEAM,
        hops=HOPS,
        entry_mod=ENTRY_MOD,
        graph_k=dq._NND_K,
        graph_iters=dq._NND_ITERS,
        rand_buckets=dq._NND_RAND_BUCKETS,
    )
    compare(got, duck, BATCH_ORACLE_SQL)

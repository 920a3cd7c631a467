"""Graph-ANN recall report (beam search vs exact int8 top-k, per
query): degenerate-exactness (full visibility ⇒ recall 1.0), bounds,
determinism, and the cross-engine DuckDB replay composed onto the
registered NN-descent + batch-beam chain.  Registered in r14; oracles
live in driver_queries, aliased back here."""

from __future__ import annotations

import pytest

from tests.oracle_check import assert_oracle_types_hashable, compare
from vector_db_handler_spark import driver_queries as dq
from vector_db_handler_spark.operators.similarity import (
    graph_ann_recall_report,
)

# Dials + oracle registered in r14 — aliased from driver_queries (one
# source of truth; the staging direction reversed).
K = dq._GREC_K
BEAM = dq._GREC_BEAM
HOPS = dq._GREC_HOPS
ENTRY_MOD = dq._GREC_ENTRY_MOD
QUERY_MOD = dq._BEAM_QUERY_MOD  # the registered batch serve's query slice
MIN_HITS = dq._GREC_MIN_HITS

RECALL_ORACLE_SQL = dq._GRAPH_RECALL_SQL


def _emb(spark, rows):
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def _run(spark, sf_dir):
    from pyspark.sql import functions as F

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    queries = emb.filter(F.col("vec_id") % QUERY_MOD == 0).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    return graph_ann_recall_report(
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


def test_oracle_types_hashable(duck):
    assert_oracle_types_hashable(duck, RECALL_ORACLE_SQL, "graph_recall")


def test_cross_engine_oracle_replay(spark, sf_dir, duck):
    compare(_run(spark, sf_dir), duck, RECALL_ORACLE_SQL)


def test_bounds_and_shape(spark, sf_dir):
    rows = _run(spark, sf_dir).collect()
    assert len(rows) > 0
    for r in rows:
        assert r["k"] == K
        assert 0 <= r["n_hits"] <= K
        assert abs(r["recall"] - r["n_hits"] / K) < 1e-9


def test_full_visibility_gives_recall_one(spark):
    """entry_mod=1 + beam covering the corpus: the beam IS the exact
    ranking, so every query's recall must be exactly 1.0."""
    from pyspark.sql import functions as F

    rows = [
        (i, [((i * 7 + d * 3) % 11 - 5) / 5.0 for d in range(8)])
        for i in range(40)
    ]
    emb = _emb(spark, rows)
    queries = emb.filter(F.col("vec_id") % 10 == 0).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    out = graph_ann_recall_report(
        emb,
        queries,
        k=5,
        beam=40,
        hops=0,
        entry_mod=1,
        kmeans_k=2,
        rand_buckets=8,
    ).collect()
    assert len(out) == 4
    assert all(r["recall"] == 1.0 and r["n_hits"] == 5 for r in out)


def test_args_validated(spark):
    emb = _emb(spark, [(0, [1.0, 0.0])])
    with pytest.raises(ValueError, match="k must be"):
        graph_ann_recall_report(emb, emb, k=0)


# ---------------------------------------------------------------------------
# beam_recall_curve — the beam-width tuning sweep over one shared build
# ---------------------------------------------------------------------------

CURVE_BEAMS = dq._CURVE_BEAMS

CURVE_ORACLE_SQL = dq._BEAM_CURVE_SQL


def _run_curve(spark, sf_dir):
    from pyspark.sql import functions as F

    from vector_db_handler_spark.operators.similarity import beam_recall_curve

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    queries = emb.filter(F.col("vec_id") % QUERY_MOD == 0).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    return beam_recall_curve(
        emb,
        queries,
        k=K,
        beams=CURVE_BEAMS,
        hops=HOPS,
        entry_mod=ENTRY_MOD,
        graph_k=dq._NND_K,
        graph_iters=dq._NND_ITERS,
        rand_buckets=dq._NND_RAND_BUCKETS,
    )


def test_curve_oracle_types_hashable(duck):
    assert_oracle_types_hashable(duck, CURVE_ORACLE_SQL, "beam_curve")


def test_curve_cross_engine_oracle_replay(spark, sf_dir, duck):
    compare(_run_curve(spark, sf_dir), duck, CURVE_ORACLE_SQL)


def test_curve_consistent_with_point_reports(spark, sf_dir):
    """Each curve row must equal the summed per-query recall report at
    that beam width — the curve is an aggregation, not a new ranker."""
    from pyspark.sql import functions as F

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    queries = emb.filter(F.col("vec_id") % QUERY_MOD == 0).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    curve = {r["beam"]: r for r in _run_curve(spark, sf_dir).collect()}
    for b in CURVE_BEAMS:
        rep = graph_ann_recall_report(
            emb,
            queries,
            k=K,
            beam=b,
            hops=HOPS,
            entry_mod=ENTRY_MOD,
            graph_k=dq._NND_K,
            graph_iters=dq._NND_ITERS,
            rand_buckets=dq._NND_RAND_BUCKETS,
        ).collect()
        assert curve[b]["n_queries"] == len(rep)
        assert curve[b]["n_hits"] == sum(r["n_hits"] for r in rep)


def test_curve_args_validated(spark):
    from vector_db_handler_spark.operators.similarity import beam_recall_curve

    emb = _emb(spark, [(0, [1.0, 0.0])])
    with pytest.raises(ValueError, match="beams"):
        beam_recall_curve(emb, emb, k=1, beams=())
    with pytest.raises(ValueError, match="beams"):
        beam_recall_curve(emb, emb, k=1, beams=(4, 4))
    with pytest.raises(ValueError, match="exceeds"):
        beam_recall_curve(emb, emb, k=9, beams=(4,))


# ---------------------------------------------------------------------------
# Default-dial recall floor on a NAVIGABLE fixture (r13 verdict #3): the
# shipped defaults (graph_k=8, beam=16, hops=3) must reach recall@10
# >= 0.9 on clustered data — the data shape graph-ANN exists for.  The
# fixture is deterministic (seeded numpy), so these are exact pins, not
# flaky statistical tests.
# ---------------------------------------------------------------------------


def _clustered_emb(spark, n=1000, dim=64, n_clusters=10, seed=7):
    import numpy as np

    rng = np.random.RandomState(seed)
    centers = rng.normal(0.0, 1.0, (n_clusters, dim))
    rows = [
        (
            i,
            [
                float(x)
                for x in centers[i % n_clusters] + rng.normal(0.0, 0.18, dim)
            ],
        )
        for i in range(n)
    ]
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def test_default_dials_meet_recall_floor_on_navigable_fixture(spark):
    """The navigability contract: default dials, clustered corpus,
    recall@10 >= 0.9 (measured 1.0 at pin time).  entry_mod is pinned
    to 16 so the entry stage is a real 1/16 hash slice — the
    self-derived dial is 1 at this corpus size, which would make the
    entry scan exact and the test vacuous."""
    from pyspark.sql import functions as F

    emb = _clustered_emb(spark).localCheckpoint()
    queries = emb.filter(F.col("vec_id") % 97 == 0).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    rep = graph_ann_recall_report(emb, queries, entry_mod=16).collect()
    assert len(rep) == 11
    mean_recall = sum(r["recall"] for r in rep) / len(rep)
    assert mean_recall >= 0.9
    # floor_met is the per-query contract flag the report now ships
    assert sum(1 for r in rep if r["floor_met"]) >= 10
    for r in rep:
        assert r["floor_met"] == (r["n_hits"] >= 9)  # ceil(0.9*10)


def test_hierarchical_default_dials_meet_recall_floor(spark):
    """The two-level descent at default dials (layer_mod=8) on the
    same clustered fixture: every cluster holds layer nodes, the
    coarse walk navigates to the query's cluster, and per-query
    recall@10 >= 0.9 — the written index builds this layer by default
    (DEFAULT_LAYER_MOD)."""
    from pyspark.sql import functions as F

    from vector_db_handler_spark.operators.quantize import (
        max_abs_scale,
        quantize_int8,
    )
    from vector_db_handler_spark.operators.similarity import (
        _int_dot,
        knn_graph_hierarchical_search,
        knn_graph_nn_descent,
    )

    emb = _clustered_emb(spark).localCheckpoint()
    g = knn_graph_nn_descent(emb).localCheckpoint()
    qn = quantize_int8(emb).select(
        F.col("vec_id").alias("nid"), F.col("qvec").alias("v")
    )
    scale = max_abs_scale(emb).first()["s"]

    import math

    for qid in (0, 291, 582):
        qv = [
            float(x)
            for x in emb.filter(F.col("vec_id") == qid).first()["embedding"]
        ]
        got = {
            r["vec_id"]
            for r in knn_graph_hierarchical_search(emb, qv, graph=g).collect()
        }
        qq = [
            max(-127, min(127, math.floor(127.0 * x / scale + 0.5)))
            for x in qv
        ]
        exact = (
            qn.select(
                "nid",
                _int_dot(
                    F.col("v"),
                    F.array(*[F.lit(int(c)).cast("long") for c in qq]),
                ).alias("d"),
            )
            .orderBy(F.col("d").desc(), F.col("nid").asc())
            .limit(10)
            .collect()
        )
        want = {r["nid"] for r in exact}
        assert len(got & want) >= 9  # recall@10 >= 0.9 per query

"""Filtered graph-ANN search (predicate + beam — the Qdrant
filtered-HNSW analog; the reference's `search_query_on_doc` composes a
payload filter with the vector search the same way,
app/core/document_ingestor.py:366-441).  Two dispatch regimes:
selective predicates take the exact-over-passing-set branch (pinned ≡
post-filtered-exact BY CONSTRUCTION), broad predicates route the beam
walk over the FULL graph and admit passing nodes from every hop's
beam.  Registered in r15."""

from __future__ import annotations

import pytest

from tests.oracle_check import assert_oracle_types_hashable, compare
from vector_db_handler_spark import driver_queries as dq
from vector_db_handler_spark.operators.similarity import (
    knn_graph_beam_search_filtered,
)

# Dials + oracles registered in r15 — driver_queries is the one
# source of truth; this file aliases them (the staging direction
# reversed, the r12–r14 pattern).
FK = dq._FILT_K
FBEAM = dq._FILT_BEAM
FHOPS = dq._FILT_HOPS
FENTRY_MOD = dq._FILT_ENTRY_MOD
SELECTIVE_PRED = dq._FILT_SELECTIVE_PRED
BROAD_PRED = dq._FILT_BROAD_PRED

SELECTIVE_ORACLE_SQL = dq._FILT_SELECTIVE_SQL
BROAD_ORACLE_SQL = dq._FILT_BROAD_SQL


def _run_selective(spark, sf_dir):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    return knn_graph_beam_search_filtered(
        emb, dq.QUERY_VEC, SELECTIVE_PRED, k=FK, beam=FBEAM, hops=FHOPS
    )


def _run_broad(spark, sf_dir):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    return knn_graph_beam_search_filtered(
        emb,
        dq.QUERY_VEC,
        BROAD_PRED,
        k=FK,
        beam=FBEAM,
        hops=FHOPS,
        exact_threshold=0,
        entry_mod=FENTRY_MOD,
        graph_k=dq._NND_K,
        graph_iters=dq._NND_ITERS,
        rand_buckets=dq._NND_RAND_BUCKETS,
    )


def test_oracle_types_hashable(duck):
    assert_oracle_types_hashable(duck, SELECTIVE_ORACLE_SQL, "filtered_sel")
    assert_oracle_types_hashable(duck, BROAD_ORACLE_SQL, "filtered_broad")


def test_selective_cross_engine_replay(spark, sf_dir, duck):
    compare(_run_selective(spark, sf_dir), duck, SELECTIVE_ORACLE_SQL)


def test_broad_cross_engine_replay(spark, sf_dir, duck):
    compare(_run_broad(spark, sf_dir), duck, BROAD_ORACLE_SQL)


def test_selective_equals_post_filtered_exact(spark, sf_dir):
    """The headline contract: on a selective predicate the filtered
    search IS post-filtered-exact — rank the WHOLE corpus exactly,
    drop non-passing rows, take top-k, and the answer matches the
    operator's bit-for-bit (scores included, because both sides
    quantize with the full-corpus scale)."""
    import math

    from pyspark.sql import functions as F

    from vector_db_handler_spark.operators.quantize import (
        max_abs_scale,
        quantize_int8,
    )
    from vector_db_handler_spark.operators.similarity import _int_dot

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    scale = max_abs_scale(emb).first()["s"]
    qq = [
        max(-127, min(127, math.floor(127.0 * x / scale + 0.5)))
        for x in dq.QUERY_VEC
    ]
    qn = quantize_int8(emb).select("vec_id", F.col("qvec").alias("v")).join(
        emb.select("vec_id", "label"), "vec_id"
    )
    exact = (
        qn.select(
            "vec_id",
            "label",
            _int_dot(
                F.col("v"), F.array(*[F.lit(int(c)).cast("long") for c in qq])
            ).alias("d"),
        )
        .filter(F.expr(SELECTIVE_PRED))
        .orderBy(F.col("d").desc(), F.col("vec_id").asc())
        .limit(FK)
        .collect()
    )
    got = _run_selective(spark, sf_dir).collect()
    assert [(r["vec_id"], r["iscore"]) for r in got] == [
        (r["vec_id"], r["d"]) for r in exact
    ]


def test_broad_results_all_pass_predicate(spark, sf_dir):
    from pyspark.sql import functions as F

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    ok = {
        r["vec_id"]
        for r in emb.filter(F.expr(BROAD_PRED)).select("vec_id").collect()
    }
    rows = _run_broad(spark, sf_dir).collect()
    assert rows and all(r["vec_id"] in ok for r in rows)
    ranks = [r["rank"] for r in rows]
    assert ranks == list(range(1, len(rows) + 1))


def test_dispatch_threshold_switches_branch(spark, sf_dir):
    """exact_threshold=0 forces the walk branch even on the selective
    predicate; a huge threshold forces the exact branch on the broad
    one — and the exact branch equals post-filtered-exact regardless
    of predicate density."""
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    walk = knn_graph_beam_search_filtered(
        emb,
        dq.QUERY_VEC,
        SELECTIVE_PRED,
        k=2,
        beam=FBEAM,
        hops=FHOPS,
        exact_threshold=0,
        entry_mod=FENTRY_MOD,
        graph_k=dq._NND_K,
        graph_iters=dq._NND_ITERS,
        rand_buckets=dq._NND_RAND_BUCKETS,
    ).collect()
    assert all(r["rank"] >= 1 for r in walk)
    exact_broad = knn_graph_beam_search_filtered(
        emb, dq.QUERY_VEC, BROAD_PRED, k=2, beam=FBEAM, hops=FHOPS,
        exact_threshold=10**9,
    ).collect()
    assert len(exact_broad) == 2


def test_args_validated(spark, sf_dir):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    with pytest.raises(ValueError, match="k <= beam"):
        knn_graph_beam_search_filtered(emb, dq.QUERY_VEC, "label = 1", k=9, beam=3)
    with pytest.raises(ValueError, match="predicate"):
        knn_graph_beam_search_filtered(emb, dq.QUERY_VEC, "  ")
    with pytest.raises(ValueError, match="exact_threshold"):
        knn_graph_beam_search_filtered(
            emb, dq.QUERY_VEC, "label = 1", exact_threshold=-1
        )

"""Filtered graph-ANN search (predicate + beam — the Qdrant
filtered-HNSW analog; the reference's `search_query_on_doc` composes a
payload filter with the vector search the same way,
app/core/document_ingestor.py:366-441).  Two dispatch regimes:
selective predicates take the exact-over-passing-set branch (pinned ≡
post-filtered-exact BY CONSTRUCTION), broad predicates route the beam
walk over the FULL graph and admit passing nodes from every hop's
beam.  Staged in r14 for r15 driver registration (oracles move to
driver_queries then)."""

from __future__ import annotations

import pytest

from tests.oracle_check import assert_oracle_types_hashable, compare
from vector_db_handler_spark import driver_queries as dq
from vector_db_handler_spark.operators.similarity import (
    knn_graph_beam_search_filtered,
)

# Staged driver-row dials.  The SELECTIVE row's predicate passes ~10%
# of the corpus (≤ the default threshold at every driver scale, so the
# branch is stable); the BROAD row pins exact_threshold=0 so the walk
# branch runs at every scale.
FK = 8
FBEAM = 10
FHOPS = 2
FENTRY_MOD = 16
SELECTIVE_PRED = "label = 3"
BROAD_PRED = "label >= 2"


def _selective_oracle_sql() -> str:
    """Exact integer top-k over the passing rows, quantized with the
    FULL-corpus scale (the index geometry) — post-filtered-exact."""
    dot = "CAST(list_dot_product(q.v, (SELECT v FROM qq)) AS BIGINT)"
    return f"""
WITH scale AS (
  SELECT MAX(GREATEST(list_max(CAST(embedding AS DOUBLE[])),
                      -list_min(CAST(embedding AS DOUBLE[])))) AS s
  FROM embeddings
),
qp AS (
  SELECT vec_id,
         list_transform(CAST(embedding AS DOUBLE[]), x -> {dq._QUANT_CLAMP})
           AS v
  FROM embeddings, scale WHERE {SELECTIVE_PRED}
),
qq AS (
  SELECT list_transform({dq._Q_SQL}, x -> {dq._QUANT_CLAMP}) AS v FROM scale
)
SELECT nid AS vec_id, CAST(rnk AS BIGINT) AS rank, d AS iscore
FROM (
  SELECT q.vec_id AS nid, {dot} AS d,
         row_number() OVER (ORDER BY {dot} DESC, q.vec_id ASC) AS rnk
  FROM qp q
) WHERE rnk <= {FK}
"""


def _broad_oracle_sql() -> str:
    """The flat beam chain at the staged dials, then: union of every
    hop's beam → dedup per node → admit predicate-passing nodes →
    top-k."""
    union_all = "\n    UNION ALL\n    ".join(
        f"SELECT nid, d FROM b{i}" for i in range(FHOPS + 1)
    )
    return (
        dq._NN_DESCENT_CTES
        + f""",
gmat AS MATERIALIZED (SELECT a, b, d FROM g{dq._NND_ITERS}),
und AS MATERIALIZED (
  SELECT a, b FROM gmat UNION SELECT b, a FROM gmat
),
qq AS (
  SELECT list_transform({dq._Q_SQL}, x -> {dq._QUANT_CLAMP}) AS v FROM scale
),
b0 AS (
  SELECT nid, d FROM (
    SELECT q.vec_id AS nid,
           CAST(list_dot_product(q.v, (SELECT v FROM qq)) AS BIGINT) AS d,
           row_number() OVER (
             ORDER BY CAST(list_dot_product(q.v, (SELECT v FROM qq))
                           AS BIGINT) DESC, q.vec_id ASC) AS rn
    FROM qv q
    WHERE CAST('0x' || substr(md5(CAST(q.vec_id AS VARCHAR)), 1, 15)
               AS BIGINT) % {FENTRY_MOD} = 0
  ) WHERE rn <= {FBEAM}
)"""
        + "".join(
            dq._BEAM_HOP_SQL.format(i=i, j=i - 1, beam=FBEAM)
            for i in range(1, FHOPS + 1)
        )
        + f""",
allb AS (
  SELECT nid, max(d) AS d FROM (
    {union_all}
  ) GROUP BY nid
),
adm AS (
  SELECT a.nid, a.d FROM allb a JOIN embeddings e ON a.nid = e.vec_id
  WHERE {BROAD_PRED}
)
SELECT nid AS vec_id, CAST(rnk AS BIGINT) AS rank, d AS iscore
FROM (
  SELECT nid, d,
         row_number() OVER (ORDER BY d DESC, nid ASC) AS rnk
  FROM adm
) WHERE rnk <= {FK}
"""
    )


SELECTIVE_ORACLE_SQL = _selective_oracle_sql()
BROAD_ORACLE_SQL = _broad_oracle_sql()


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

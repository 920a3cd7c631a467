"""Hierarchical graph-ANN search (the HNSW-style coarse entry layer
`knn_graph_beam_search` defers): layer membership + coarse-edge
derivation semantics, two-level descent determinism, tiny-corpus
fallbacks, and the cross-engine DuckDB replay composed onto the
registered NN-descent CTE chain.  Staged in r13 for r14 driver
registration (oracle moves to driver_queries then; tests re-alias)."""

from __future__ import annotations

import pytest

from tests.oracle_check import assert_oracle_types_hashable, compare
from vector_db_handler_spark import driver_queries as dq
from vector_db_handler_spark.operators.similarity import (
    knn_graph_beam_search,
    knn_graph_hierarchical_search,
)

# Pinned dials for the staged driver row (distinct from the flat
# beam-search registration: same k, different navigation shape).
K = 10
BEAM = 12
HOPS = 2
LAYER_MOD = 4
COARSE_K = 5
COARSE_HOPS = 1
COARSE_ENTRY_MOD = 8

_MD5_60 = "CAST('0x' || substr(md5(CAST({c} AS VARCHAR)), 1, 15) AS BIGINT)"
_IDOT = (
    "CAST(list_dot_product(CAST({x} AS DOUBLE[]), CAST({y} AS DOUBLE[]))"
    " AS BIGINT)"
)


def _hier_oracle_sql() -> str:
    """DuckDB twin: the registered NN-descent chain + layer membership
    (md5 ≡ 0 mod LAYER_MOD) + coarse edges (1-hop ∪ 2-hop of the base
    graph restricted to layer×layer, re-scored, top-COARSE_K) + the
    coarse walk (hash entry slice with the min-hash fallback leg,
    COARSE_HOPS hops) + the base walk seeded by the coarse winners."""
    h_nid = _MD5_60.format(c="nid")
    h_vec = _MD5_60.format(c="vec_id")
    dot_q = _IDOT.format(x="q.v", y="(SELECT v FROM qq)")
    sql = (
        dq._NN_DESCENT_CTES
        + f""",
gmat AS MATERIALIZED (SELECT a, b, d FROM g{dq._NND_ITERS}),
und AS MATERIALIZED (
  SELECT a, b FROM gmat UNION SELECT b, a FROM gmat
),
qq AS (
  SELECT list_transform({dq._Q_SQL}, x -> {dq._QUANT_CLAMP}) AS v FROM scale
),
lay AS MATERIALIZED (
  SELECT vec_id AS nid FROM qv WHERE {h_vec} % {LAYER_MOD} = 0
),
cpairs AS (
  SELECT DISTINCT p.a, p.b FROM (
    SELECT u.a, u.b FROM und u JOIN lay la ON u.a = la.nid
    UNION
    SELECT u1.a, u2.b
    FROM und u1 JOIN lay la ON u1.a = la.nid
         JOIN und u2 ON u1.b = u2.a
    WHERE u2.b != u1.a
  ) p JOIN lay lb ON p.b = lb.nid
),
cedges AS MATERIALIZED (
  SELECT a, b FROM (
    SELECT c.a, c.b,
           row_number() OVER (PARTITION BY c.a
             ORDER BY {_IDOT.format(x='qa.v', y='qb.v')} DESC, c.b ASC) AS rn
    FROM cpairs c JOIN qv qa ON c.a = qa.vec_id
                  JOIN qv qb ON c.b = qb.vec_id
  ) WHERE rn <= {COARSE_K}
),
cund AS MATERIALIZED (
  SELECT a, b FROM cedges UNION SELECT b, a FROM cedges
),
centry AS (
  SELECT nid FROM lay WHERE {h_nid} % {COARSE_ENTRY_MOD} = 0
  UNION ALL
  SELECT nid FROM (
    SELECT nid FROM lay ORDER BY {h_nid} ASC, nid ASC LIMIT 1
  ) WHERE NOT EXISTS (
    SELECT 1 FROM lay WHERE {h_nid} % {COARSE_ENTRY_MOD} = 0
  )
),
cb0 AS (
  SELECT nid, d FROM (
    SELECT q.vec_id AS nid, {dot_q} AS d,
           row_number() OVER (ORDER BY {dot_q} DESC, q.vec_id ASC) AS rn
    FROM centry e JOIN qv q ON e.nid = q.vec_id
  ) WHERE rn <= {BEAM}
)"""
    )
    # Coarse hops walk cund; base hop 0 re-scores the coarse winners
    # (identical scores — the seed stage of _beam_hops_single), then
    # the base hops walk und.
    for i in range(1, COARSE_HOPS + 1):
        sql += dq._BEAM_HOP_SQL.format(i=i, j=i - 1, beam=BEAM).replace(
            "JOIN und u", "JOIN cund u"
        ).replace("x{0}".format(i), f"cx{i}").replace(
            f"b{i} AS", f"cb{i} AS"
        ).replace(
            f"FROM b{i-1}", f"FROM cb{i-1}"
        ).replace(
            f"ON u.a = b{i-1}.nid", f"ON u.a = cb{i-1}.nid"
        ).replace(
            f"FROM cx{i} c", f"FROM cx{i} c"
        )
    sql += f""",
b0 AS (
  SELECT nid, d FROM (
    SELECT s.nid, {dot_q.replace('q.v', 'q.v')} AS d,
           row_number() OVER (ORDER BY {dot_q} DESC, s.nid ASC) AS rn
    FROM cb{COARSE_HOPS} s JOIN qv q ON s.nid = q.vec_id
  ) WHERE rn <= {BEAM}
)"""
    for i in range(1, HOPS + 1):
        sql += dq._BEAM_HOP_SQL.format(i=i, j=i - 1, beam=BEAM)
    sql += f"""
SELECT nid AS vec_id,
       CAST(rnk AS BIGINT) AS rank,
       d AS iscore
FROM (
  SELECT nid, d,
         row_number() OVER (ORDER BY d DESC, nid ASC) AS rnk
  FROM b{HOPS}
) WHERE rnk <= {K}
"""
    return sql


HIER_ORACLE_SQL = _hier_oracle_sql()


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

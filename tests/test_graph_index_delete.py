"""Graph-index DELETE path (tombstones → probe exclusion → physical
removal + routing repair at compaction) — the H5–H12 mutation family's
graph-index analog (the reference deletes points from its Qdrant
collection, app/core/document_ingestor.py:443-520; HNSW deletes are
mark + exclude + compact).  Staged in r14 for r15 driver registration
(the tombstoned-probe twin moves to driver_queries then)."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from tests.oracle_check import assert_oracle_types_hashable, compare
from vector_db_handler_spark import driver_queries as dq
from vector_db_handler_spark.operators.similarity import (
    append_knn_graph_index,
    compact_knn_graph_index,
    delete_knn_graph_index,
    knn_graph_probe_table,
    knn_graph_probe_table_batch,
    knn_graph_probe_table_hier,
    write_knn_graph_index,
)

K = 8
BEAM = 10
HOPS = 2
ENTRY_MOD = 16
#: The staged driver row's deterministic delete slice.
DELETE_PRED_MOD = 173


def _tombstoned_probe_sql() -> str:
    """The flat beam chain at the index dials with the tombstone
    anti-join before the final ranking: tombstoned nodes ROUTE (the
    walk is unchanged) but are excluded from the answer."""
    base = dq._beam_search_sql(K, BEAM, HOPS, ENTRY_MOD)
    final = f"""
SELECT nid AS vec_id,
       CAST(rnk AS BIGINT) AS rank,
       d AS iscore
FROM (
  SELECT nid, d,
         row_number() OVER (ORDER BY d DESC, nid ASC) AS rnk
  FROM b{HOPS}
) WHERE rnk <= {K}
"""
    assert base.endswith(final)
    return base[: -len(final)] + f"""
SELECT nid AS vec_id,
       CAST(rnk AS BIGINT) AS rank,
       d AS iscore
FROM (
  SELECT nid, d,
         row_number() OVER (ORDER BY d DESC, nid ASC) AS rnk
  FROM b{HOPS}
  WHERE nid NOT IN (SELECT vec_id FROM embeddings
                    WHERE vec_id % {DELETE_PRED_MOD} = 0)
) WHERE rnk <= {K}
"""


TOMBSTONED_PROBE_SQL = _tombstoned_probe_sql()


def _build(spark, sf_dir, path):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    write_knn_graph_index(
        emb,
        path,
        graph_k=dq._NND_K,
        graph_iters=dq._NND_ITERS,
        rand_buckets=dq._NND_RAND_BUCKETS,
        entry_mod=ENTRY_MOD,
    )
    return emb


def test_oracle_types_hashable(duck):
    assert_oracle_types_hashable(duck, TOMBSTONED_PROBE_SQL, "tomb_probe")


def test_cross_engine_replay_after_delete(spark, sf_dir, tmp_path, duck):
    path = str(tmp_path / "idx")
    emb = _build(spark, sf_dir, path)
    doomed = emb.filter(F.col("vec_id") % DELETE_PRED_MOD == 0).select("vec_id")
    delete_knn_graph_index(spark, path, doomed)
    got = knn_graph_probe_table(
        spark, path, dq.QUERY_VEC, k=K, beam=BEAM, hops=HOPS
    )
    compare(got, duck, TOMBSTONED_PROBE_SQL)


def test_deleted_never_returned_any_probe_shape(spark, sf_dir, tmp_path):
    """Delete the probe's OWN top answer: it must vanish from the
    flat, batch, hierarchical and streaming probes, and survivors
    fill the top-k (same row count as before)."""
    from vector_db_handler_spark.streaming.stream_ops import (
        graph_index_stream_probe,
    )

    path = str(tmp_path / "idx")
    emb = _build(spark, sf_dir, path)
    before = knn_graph_probe_table(
        spark, path, dq.QUERY_VEC, k=K, beam=BEAM, hops=HOPS
    ).collect()
    top = before[0]["vec_id"]
    delete_knn_graph_index(spark, path, [top])

    flat = knn_graph_probe_table(
        spark, path, dq.QUERY_VEC, k=K, beam=BEAM, hops=HOPS
    ).collect()
    assert top not in {r["vec_id"] for r in flat}
    assert len(flat) == len(before)
    assert [r["vec_id"] for r in flat[:-1]] == [
        r["vec_id"] for r in before[1:]
    ]

    hier = knn_graph_probe_table_hier(
        spark, path, dq.QUERY_VEC, k=K, beam=12, hops=HOPS
    ).collect()
    assert top not in {r["vec_id"] for r in hier}

    queries = emb.filter(F.col("vec_id") % dq._BEAM_QUERY_MOD == 0).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    batch = knn_graph_probe_table_batch(
        spark, path, queries, k=5, beam=BEAM, hops=HOPS
    ).collect()
    assert top not in {r["neighbor_id"] for r in batch}

    stream = graph_index_stream_probe(
        spark, path, dq.QUERY_VEC, k=K, beam=BEAM, hops=HOPS
    ).collect()
    assert top not in {r["vec_id"] for r in stream}


def test_compaction_removes_and_repairs(spark, sf_dir, tmp_path):
    """Physical removal: after compaction the tombstoned rows are gone
    from vectors/ and edges/, the tombstone dir is cleared, the
    deleted ids still never surface, and reachability through deleted
    hubs survives via the a→b bridge repair (every pre-compaction
    survivor answer is still found)."""
    path = str(tmp_path / "idx")
    emb = _build(spark, sf_dir, path)
    doomed = [
        r["vec_id"]
        for r in emb.filter(F.col("vec_id") % DELETE_PRED_MOD == 0)
        .select("vec_id")
        .collect()
    ]
    delete_knn_graph_index(spark, path, doomed)
    before = knn_graph_probe_table(
        spark, path, dq.QUERY_VEC, k=K, beam=BEAM, hops=HOPS
    ).collect()

    compact_knn_graph_index(spark, path)

    assert not os.path.exists(os.path.join(path, "tombstones"))
    vecs = spark.read.parquet(f"{path}/vectors")
    assert vecs.filter(F.col("nid").isin(doomed)).count() == 0
    edges = spark.read.parquet(f"{path}/edges")
    assert edges.filter(
        F.col("a").isin(doomed) | F.col("b").isin(doomed)
    ).count() == 0
    # per-survivor edge lists stay capped at graph_k
    deg = edges.groupBy("a").count().agg(F.max("count")).first()[0]
    assert deg <= dq._NND_K

    after = knn_graph_probe_table(
        spark, path, dq.QUERY_VEC, k=K, beam=BEAM, hops=HOPS
    ).collect()
    assert not ({r["vec_id"] for r in after} & set(doomed))
    assert len(after) == len(before)
    # the repair preserves every pre-compaction answer (scores are
    # intrinsic, so matching ids match rows)
    assert {(r["vec_id"], r["iscore"]) for r in before} <= {
        (r["vec_id"], r["iscore"]) for r in after
    } | set()


def test_delete_then_append_new_version_reachable(spark, sf_dir, tmp_path):
    """The update-by-replace lifecycle: delete an id, append the same
    embedding under a new id — the new version is served, the old
    never again (the store's H12-style first-match update, graph
    edition)."""
    path = str(tmp_path / "idx")
    emb = _build(spark, sf_dir, path)
    victim = emb.filter("vec_id = 1")
    delete_knn_graph_index(spark, path, [1])
    replacement = victim.selectExpr(
        "vec_id + 500000 AS vec_id", "embedding", "label"
    )
    append_knn_graph_index(replacement, path)
    qv = [float(x) for x in victim.first()["embedding"]]
    got = knn_graph_probe_table(spark, path, qv, k=12, beam=12, hops=3).collect()
    ids = {r["vec_id"] for r in got}
    assert 500001 in ids and 1 not in ids


def test_double_delete_is_idempotent(spark, sf_dir, tmp_path):
    path = str(tmp_path / "idx")
    _build(spark, sf_dir, path)
    delete_knn_graph_index(spark, path, [7])
    once = knn_graph_probe_table(
        spark, path, dq.QUERY_VEC, k=K, beam=BEAM, hops=HOPS
    ).collect()
    delete_knn_graph_index(spark, path, [7])
    twice = knn_graph_probe_table(
        spark, path, dq.QUERY_VEC, k=K, beam=BEAM, hops=HOPS
    ).collect()
    assert [tuple(r) for r in once] == [tuple(r) for r in twice]


def test_no_tombstones_probe_unchanged(spark, sf_dir, tmp_path):
    """An index that never saw a delete behaves byte-identically to
    the pre-delete-feature contract (the absent-directory fast path)."""
    path = str(tmp_path / "idx")
    _build(spark, sf_dir, path)
    got = knn_graph_probe_table(
        spark, path, dq.QUERY_VEC, k=K, beam=BEAM, hops=HOPS
    )
    from tests.test_graph_index import GIDX_ORACLE_SQL  # noqa: F401
    rows = got.collect()
    assert len(rows) == K

"""Graph-index DELETE path (tombstones → probe exclusion → physical
removal + routing repair at compaction) — the H5–H12 mutation family's
graph-index analog (the reference deletes points from its Qdrant
collection, app/core/document_ingestor.py:443-520; HNSW deletes are
mark + exclude + compact).  Registered in r15; the
tombstoned-probe twin lives in driver_queries and this file aliases
it back."""

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

# Dials + twin registered in r15 — driver_queries is the one source
# of truth; this file aliases them back.
K = dq._GIDX_K
BEAM = dq._GIDX_BEAM
HOPS = dq._GIDX_HOPS
ENTRY_MOD = dq._GIDX_ENTRY_MOD
DELETE_PRED_MOD = dq._GDEL_MOD

TOMBSTONED_PROBE_SQL = dq._TOMBSTONED_PROBE_SQL


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


def test_compaction_covers_stream_resident_ids(spark, sf_dir, tmp_path):
    """r14 ADVICE: a tombstoned id living in an UNMERGED streaming
    ingest batch dir must be physically removed by compaction too —
    compaction auto-merges committed batches first, so after it the
    stream probe can never serve the deleted arrival again."""
    from vector_db_handler_spark.streaming.stream_ops import (
        graph_index_stream_probe,
        streaming_graph_index_ingest,
    )

    path = str(tmp_path / "idx")
    emb = _build(spark, sf_dir, path)
    arr = emb.filter(F.col("vec_id") % dq._GI_ARR_MOD == 0).select(
        (F.col("vec_id") + 1000000).alias("vec_id"), "embedding", "label"
    )
    arr.coalesce(1).write.parquet(str(tmp_path / "src"))
    stream = spark.readStream.schema(arr.schema).parquet(str(tmp_path / "src"))
    streaming_graph_index_ingest(
        stream, path, str(tmp_path / "cp"), hops=dq._GI_HOPS
    )
    # A stream-batch-resident arrival the probe actually serves (its
    # base twin ranks first on the nid tie-break; the arrival follows),
    # then delete it.
    first_arr = arr.first()
    qv = [float(x) for x in first_arr["embedding"]]
    victim = int(first_arr["vec_id"])
    assert victim >= 1000000  # an arrival, i.e. stream-batch-resident
    pre = graph_index_stream_probe(spark, path, qv, k=5, beam=8, hops=2)
    assert victim in {r["vec_id"] for r in pre.collect()}
    delete_knn_graph_index(spark, path, [victim])

    compact_knn_graph_index(spark, path)

    assert not os.path.exists(os.path.join(path, "tombstones"))
    # physically gone from the (merged) base dirs
    assert (
        spark.read.parquet(f"{path}/vectors")
        .filter(F.col("nid") == victim)
        .count()
        == 0
    )
    # and the stream probe can never return it again
    got = graph_index_stream_probe(spark, path, qv, k=5, beam=8, hops=2)
    assert victim not in {r["vec_id"] for r in got.collect()}


def test_compaction_rebuilds_coarse_layer(spark, sf_dir, tmp_path):
    """r14 ADVICE: an index written with a coarse layer must have
    coarse_edges/ REBUILT at tombstone compaction — otherwise coarse
    edges through deleted coarse-layer nodes become permanent
    dead-ends (tombstones are cleared, nothing marks them stale)."""
    from vector_db_handler_spark.functions.text import portable_hash60
    from vector_db_handler_spark.operators.similarity import (
        knn_graph_index_stats,
        knn_graph_probe_table_hier,
    )

    path = str(tmp_path / "idx")
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    write_knn_graph_index(
        emb,
        path,
        graph_k=dq._NND_K,
        graph_iters=dq._NND_ITERS,
        rand_buckets=dq._NND_RAND_BUCKETS,
        entry_mod=ENTRY_MOD,
        layer_mod=2,  # dense layer so deletes hit coarse members
    )
    # Delete a slice guaranteed to include coarse-layer nodes.
    lay_ids = [
        r["nid"]
        for r in spark.read.parquet(f"{path}/vectors")
        .select("nid")
        .withColumn("h", portable_hash60(F.col("nid").cast("string")))
        .filter(F.col("h") % 2 == 0)
        .orderBy("nid")
        .limit(3)
        .collect()
    ]
    assert lay_ids
    delete_knn_graph_index(spark, path, lay_ids)
    compact_knn_graph_index(spark, path)

    alive = {
        r["nid"]
        for r in spark.read.parquet(f"{path}/vectors").select("nid").collect()
    }
    ce = spark.read.parquet(f"{path}/coarse_edges").collect()
    assert ce, "coarse layer vanished at compaction"
    for r in ce:
        assert r["a"] in alive and r["b"] in alive, (
            f"dead coarse edge survived compaction: {(r['a'], r['b'])}"
        )
    # the ANALYZE row agrees and the hierarchical probe still serves
    st = knn_graph_index_stats(spark, path).first()
    assert st["n_tombstones"] == 0 and st["n_coarse_edges"] == len(ce)
    got = knn_graph_probe_table_hier(
        spark, path, dq.QUERY_VEC, k=3, beam=8, hops=2
    ).collect()
    assert got and not ({r["vec_id"] for r in got} & set(lay_ids))


def test_append_refuses_existing_id(spark, sf_dir, tmp_path):
    """ID EPOCH CONTRACT, half 1: re-appending an id that already
    lives in the index is refused — it would store a second vector
    row under the same nid and the probe could serve that nid twice
    in one top-k."""
    path = str(tmp_path / "idx")
    emb = _build(spark, sf_dir, path)
    dup = emb.filter("vec_id = 3")
    with pytest.raises(ValueError, match="already live in the index"):
        append_knn_graph_index(dup, path)


def test_append_refuses_tombstoned_id(spark, sf_dir, tmp_path):
    """ID EPOCH CONTRACT, half 2: an id reserved by a pending delete
    is refused — the tombstone anti-join would suppress the new
    version silently and the next compaction would destroy it."""
    path = str(tmp_path / "idx")
    emb = _build(spark, sf_dir, path)
    victim = emb.filter("vec_id = 3")
    delete_knn_graph_index(spark, path, [3])
    with pytest.raises(ValueError, match="already live in the index"):
        append_knn_graph_index(victim, path)


def test_compaction_releases_deleted_id(spark, sf_dir, tmp_path):
    """delete → compact → append(same id) is the legal resurrection
    path: compaction clears the tombstone and removes the old rows,
    so the re-appended version is served."""
    from vector_db_handler_spark.operators.similarity import (
        compact_knn_graph_index,
        knn_graph_probe_table,
    )

    path = str(tmp_path / "idx")
    emb = _build(spark, sf_dir, path)
    victim = emb.filter("vec_id = 1")
    delete_knn_graph_index(spark, path, [1])
    compact_knn_graph_index(spark, path)
    append_knn_graph_index(victim, path)
    qv = [float(x) for x in victim.first()["embedding"]]
    got = knn_graph_probe_table(spark, path, qv, k=12, beam=12, hops=3).collect()
    ids = [r["vec_id"] for r in got]
    assert ids.count(1) == 1  # served again, exactly once

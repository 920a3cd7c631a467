"""Streaming graph-ANN index maintenance: batch=stream equivalence of
the ingest path against sequential append_knn_graph_index, exactly-once
replay semantics, crash-marker skip of a half-committed batch, and
serve-while-ingesting reachability.  Staged in r13; the serve store
pattern matches the KNN/NB/HLL streaming twins."""

from __future__ import annotations

import os

from vector_db_handler_spark import driver_queries as dq
from vector_db_handler_spark.operators.similarity import (
    append_knn_graph_index,
    write_knn_graph_index,
)
from vector_db_handler_spark.streaming.stream_ops import (
    graph_index_stream_probe,
    graph_index_stream_state,
    streaming_graph_index_ingest,
)

ENTRY_MOD = 16


def _build_base(spark, sf_dir, path):
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


def _arrival_batches(emb):
    """Two deterministic arrival batches of 4 vectors each."""
    b0 = emb.filter("vec_id % 83 = 0").limit(4).selectExpr(
        "vec_id + 100000 AS vec_id", "embedding", "label"
    )
    b1 = emb.filter("vec_id % 83 = 1").limit(4).selectExpr(
        "vec_id + 200000 AS vec_id", "embedding", "label"
    )
    return b0, b1


def _setup_stream(spark, emb, tmp_path):
    b0, b1 = _arrival_batches(emb)
    src = str(tmp_path / "src")
    # one file per batch, written before the reader binds
    b0.coalesce(1).write.mode("append").parquet(src)
    b1.coalesce(1).write.mode("append").parquet(src)
    stream = (
        spark.readStream.schema(b0.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    return stream


def _rel(df):
    return sorted(map(tuple, df.collect()))


def test_stream_ingest_equals_sequential_appends(spark, sf_dir, tmp_path):
    """The headline pin: streaming two arrival batches through the
    ingest store yields EXACTLY the relations (vectors and edges) that
    two sequential batch appends produce — batch = stream for the
    index write path, and probes agree bit-for-bit."""
    batch_path = str(tmp_path / "batch_idx")
    stream_path = str(tmp_path / "stream_idx")
    emb = _build_base(spark, sf_dir, batch_path)
    _build_base(spark, sf_dir, stream_path)

    b0, b1 = _arrival_batches(emb)
    append_knn_graph_index(b0, batch_path)
    append_knn_graph_index(b1, batch_path)

    stream = _setup_stream(spark, emb, tmp_path)
    streaming_graph_index_ingest(
        stream, stream_path, str(tmp_path / "cp")
    )

    s_vectors, s_edges = graph_index_stream_state(spark, stream_path)
    assert _rel(s_vectors) == _rel(spark.read.parquet(f"{batch_path}/vectors"))
    assert _rel(s_edges) == _rel(spark.read.parquet(f"{batch_path}/edges"))

    from vector_db_handler_spark.operators.similarity import (
        knn_graph_probe_table,
    )

    want = knn_graph_probe_table(
        spark, batch_path, dq.QUERY_VEC, k=8, beam=10, hops=2
    ).collect()
    got = graph_index_stream_probe(
        spark, stream_path, dq.QUERY_VEC, k=8, beam=10, hops=2
    ).collect()
    assert [tuple(r) for r in got] == [tuple(r) for r in want]


def test_rerun_is_a_no_op(spark, sf_dir, tmp_path):
    """Replaying the drained source under a fresh checkpoint finds
    every batch committed and must leave the store byte-identical
    (the _SUCCESS short-circuit)."""
    path = str(tmp_path / "idx")
    emb = _build_base(spark, sf_dir, path)
    stream = _setup_stream(spark, emb, tmp_path)
    streaming_graph_index_ingest(stream, path, str(tmp_path / "cp"))
    v1, e1 = graph_index_stream_state(spark, path)
    before = (_rel(v1), _rel(e1))

    b0, _ = _arrival_batches(emb)
    stream2 = (
        spark.readStream.schema(b0.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(tmp_path / "src"))
    )
    streaming_graph_index_ingest(stream2, path, str(tmp_path / "cp2"))
    v2, e2 = graph_index_stream_state(spark, path)
    assert (_rel(v2), _rel(e2)) == before


def test_half_committed_batch_is_invisible(spark, sf_dir, tmp_path):
    """A batch directory with edges committed but vectors not (crash
    between the two writes) must be skipped ENTIRELY by the reader —
    edges to vectors nobody can see would be a dangling half-state."""
    path = str(tmp_path / "idx")
    emb = _build_base(spark, sf_dir, path)
    stream = _setup_stream(spark, emb, tmp_path)
    streaming_graph_index_ingest(stream, path, str(tmp_path / "cp"))
    v1, e1 = graph_index_stream_state(spark, path)
    before = (_rel(v1), _rel(e1))

    # fabricate a crashed batch: edges dir committed, vectors dir absent
    junk = os.path.join(path, "ingest", "batch=999", "edges")
    spark.read.parquet(f"{path}/edges").limit(2).write.parquet(junk)
    assert os.path.exists(os.path.join(junk, "_SUCCESS"))

    v2, e2 = graph_index_stream_state(spark, path)
    assert (_rel(v2), _rel(e2)) == before


def test_state_capped_below_batch(spark, sf_dir, tmp_path):
    """The replay guard: state at max_batch=b excludes batch b and
    everything after — a replayed batch must see exactly what the
    original saw."""
    path = str(tmp_path / "idx")
    emb = _build_base(spark, sf_dir, path)
    stream = _setup_stream(spark, emb, tmp_path)
    streaming_graph_index_ingest(stream, path, str(tmp_path / "cp"))

    v0, e0 = graph_index_stream_state(spark, path, max_batch=0)
    assert _rel(v0) == _rel(spark.read.parquet(f"{path}/vectors"))
    assert _rel(e0) == _rel(spark.read.parquet(f"{path}/edges"))
    v1, _ = graph_index_stream_state(spark, path, max_batch=1)
    vall, _ = graph_index_stream_state(spark, path)
    assert v0.count() < v1.count() < vall.count()


def test_streamed_arrival_is_servable(spark, sf_dir, tmp_path):
    """Serve-while-ingesting: after the stream drains, probing for an
    arrival's own embedding finds it (reachable through its reversed
    edges, the HNSW insert contract)."""
    path = str(tmp_path / "idx")
    emb = _build_base(spark, sf_dir, path)
    b0, _ = _arrival_batches(emb)
    target = b0.first()
    stream = _setup_stream(spark, emb, tmp_path)
    streaming_graph_index_ingest(stream, path, str(tmp_path / "cp"))
    got = graph_index_stream_probe(
        spark,
        path,
        [float(x) for x in target["embedding"]],
        k=12,
        beam=12,
        hops=3,
    ).collect()
    assert target["vec_id"] in {r["vec_id"] for r in got}

def test_stray_batch_dir_is_skipped(spark, sf_dir, tmp_path):
    """r13 ADVICE: a stray non-numeric ``batch=*`` entry (editor
    droppings, partial temp dirs) must not crash every probe of the
    store — the reader skips it like any other uncommitted state."""
    path = str(tmp_path / "idx")
    emb = _build_base(spark, sf_dir, path)
    stream = _setup_stream(spark, emb, tmp_path)
    streaming_graph_index_ingest(stream, path, str(tmp_path / "cp"))
    v1, e1 = graph_index_stream_state(spark, path)
    before = (_rel(v1), _rel(e1))

    os.makedirs(os.path.join(path, "ingest", "batch=tmp.swp"))
    v2, e2 = graph_index_stream_state(spark, path)
    assert (_rel(v2), _rel(e2)) == before


def test_stream_probe_rejects_wrong_dim(spark, sf_dir, tmp_path):
    """r13 ADVICE: a wrong-dimension query must error loudly instead
    of null-padding every score."""
    import pytest

    path = str(tmp_path / "idx")
    _build_base(spark, sf_dir, path)
    with pytest.raises(ValueError, match="dim"):
        graph_index_stream_probe(spark, path, [1.0, 2.0, 3.0])

"""Graph-index MERGE: fold the streaming ingest's committed batch
directories into the base index (the LSM minor→major compaction the
per-batch store accumulates toward).  Pins: probe parity across the
merge (stream state AND the plain base-dir probes, bit-for-bit), the
crash-resume protocol (a committed-but-unfinalized merge is readable
and finalizable), the replay fence (a fresh-checkpoint re-drain of
merged batch ids is a no-op), and the cross-engine DuckDB replay of a
probe over the MERGED state (base ∪ both arrival legs).  Registered in r15; the merged-probe
twin lives in driver_queries and this file aliases it back."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from tests.oracle_check import assert_oracle_types_hashable, compare
from vector_db_handler_spark import driver_queries as dq
from vector_db_handler_spark.operators.similarity import (
    knn_graph_probe_table,
    write_knn_graph_index,
)
from vector_db_handler_spark.streaming.stream_ops import (
    _read_merge_fence,
    graph_index_stream_probe,
    graph_index_stream_state,
    merge_graph_index_ingest,
    streaming_graph_index_ingest,
)

# Dials + twin registered in r15 — driver_queries is the one source
# of truth; this file aliases them back.
PK = dq._GIDX_K
PBEAM = dq._GIDX_BEAM
PHOPS = dq._GIDX_HOPS

MERGED_PROBE_SQL = dq._MERGED_PROBE_SQL


def _build_and_ingest(spark, sf_dir, base) -> str:
    """Base index + the dq ingest row's two deterministic arrival
    batches, drained sequentially (the registered row's exact shape)."""
    path = os.path.join(base, "idx")
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    write_knn_graph_index(
        emb,
        path,
        graph_k=dq._NND_K,
        graph_iters=dq._NND_ITERS,
        rand_buckets=dq._NND_RAND_BUCKETS,
        entry_mod=dq._GIDX_ENTRY_MOD,
        layer_mod=None,
    )
    src = os.path.join(base, "src")
    for off, residue in ((1000000, 0), (2000000, 1)):
        arr = emb.filter(F.col("vec_id") % dq._GI_ARR_MOD == residue).select(
            (F.col("vec_id") + off).alias("vec_id"), "embedding", "label"
        )
        arr.coalesce(1).write.mode("append").parquet(src)
        stream = spark.readStream.schema(arr.schema).parquet(src)
        streaming_graph_index_ingest(
            stream, path, os.path.join(base, "cp"), hops=dq._GI_HOPS
        )
    return path


def _rel(df):
    return sorted(map(tuple, df.collect()))


def test_oracle_types_hashable(duck):
    assert_oracle_types_hashable(duck, MERGED_PROBE_SQL, "merged_probe")


def test_merge_probe_parity_and_cross_engine(spark, sf_dir, tmp_path, duck):
    """The headline pins in one store lifecycle: (1) the stream-state
    probe answer is IDENTICAL before and after the merge; (2) after
    the merge the PLAIN base-dir probe serves the arrivals and agrees;
    (3) the post-merge probe replays cross-engine against the
    base∪legs twin."""
    path = _build_and_ingest(spark, sf_dir, str(tmp_path))
    before_probe = graph_index_stream_probe(
        spark, path, dq.QUERY_VEC, k=PK, beam=PBEAM, hops=PHOPS
    ).collect()
    v_before, e_before = graph_index_stream_state(spark, path)
    rel_before = (_rel(v_before), _rel(e_before))

    n = merge_graph_index_ingest(spark, path)
    assert n == 2

    v_after = spark.read.parquet(f"{path}/vectors")
    e_after = spark.read.parquet(f"{path}/edges")
    assert (_rel(v_after), _rel(e_after)) == rel_before
    v_state, e_state = graph_index_stream_state(spark, path)
    assert (_rel(v_state), _rel(e_state)) == rel_before

    after_stream = graph_index_stream_probe(
        spark, path, dq.QUERY_VEC, k=PK, beam=PBEAM, hops=PHOPS
    ).collect()
    after_plain = knn_graph_probe_table(
        spark, path, dq.QUERY_VEC, k=PK, beam=PBEAM, hops=PHOPS
    )
    assert [tuple(r) for r in after_stream] == [tuple(r) for r in before_probe]
    assert [tuple(r) for r in after_plain.collect()] == [
        tuple(r) for r in before_probe
    ]
    compare(after_plain, duck, MERGED_PROBE_SQL)

    # batch dirs folded away; a second merge is a no-op
    assert not any(
        d.startswith("batch=") for d in os.listdir(os.path.join(path, "ingest"))
    )
    assert merge_graph_index_ingest(spark, path) == 0
    assert _read_merge_fence(path) == 1


def test_rerun_after_merge_is_a_no_op(spark, sf_dir, tmp_path):
    """The replay fence: a fresh-checkpoint re-drain of the already-
    merged source must not re-append anything — the store's
    rerun-no-duplicate guarantee survives the merge."""
    path = _build_and_ingest(spark, sf_dir, str(tmp_path))
    merge_graph_index_ingest(spark, path)
    v1, e1 = graph_index_stream_state(spark, path)
    before = (_rel(v1), _rel(e1))

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    stream = spark.readStream.schema(emb.schema).parquet(
        str(tmp_path / "src")
    )
    streaming_graph_index_ingest(
        stream, path, str(tmp_path / "cp_replay"), hops=dq._GI_HOPS
    )
    v2, e2 = graph_index_stream_state(spark, path)
    assert (_rel(v2), _rel(e2)) == before
    assert not any(
        d.startswith("batch=") for d in os.listdir(os.path.join(path, "ingest"))
    )


def test_ingest_continues_after_merge(spark, sf_dir, tmp_path):
    """Post-merge arrivals land in NEW batch directories (ids above
    the fence), are visible to the stream state, and a second merge
    folds them too."""
    path = _build_and_ingest(spark, sf_dir, str(tmp_path))
    merge_graph_index_ingest(spark, path)
    n_merged = spark.read.parquet(f"{path}/vectors").count()

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    arr = emb.filter(F.col("vec_id") % dq._GI_ARR_MOD == 2).select(
        (F.col("vec_id") + 3000000).alias("vec_id"), "embedding", "label"
    )
    arr.coalesce(1).write.mode("append").parquet(str(tmp_path / "src"))
    stream = spark.readStream.schema(arr.schema).parquet(str(tmp_path / "src"))
    streaming_graph_index_ingest(
        stream, path, str(tmp_path / "cp"), hops=dq._GI_HOPS
    )
    n_arr = arr.count()
    v_state, _ = graph_index_stream_state(spark, path)
    assert v_state.count() == n_merged + n_arr

    assert merge_graph_index_ingest(spark, path) == 1
    assert spark.read.parquet(f"{path}/vectors").count() == n_merged + n_arr
    assert _read_merge_fence(path) == 2


def test_crash_resume_finalizes_committed_merge(spark, sf_dir, tmp_path):
    """A merge that crashed AFTER the manifest commit (side dirs +
    manifest present, batch dirs still on disk) must be (a) readable —
    the state reader serves the merged relation without double
    counting — and (b) finalized by the next merge call."""
    import json

    path = _build_and_ingest(spark, sf_dir, str(tmp_path))
    v0, e0 = graph_index_stream_state(spark, path)
    want = (_rel(v0), _rel(e0))

    # Fabricate the committed-but-unfinalized state by hand: write the
    # side dirs and rename the manifest in, exactly like steps 1-2.
    mdir = os.path.join(path, "merged")
    v0.repartition("entry").write.partitionBy("entry").parquet(
        os.path.join(mdir, "vectors")
    )
    e0.write.parquet(os.path.join(mdir, "edges"))
    with open(os.path.join(mdir, "_manifest.json"), "w") as fh:
        json.dump({"batches": [0, 1]}, fh)

    v1, e1 = graph_index_stream_state(spark, path)
    assert (_rel(v1), _rel(e1)) == want  # no double counting mid-merge

    assert merge_graph_index_ingest(spark, path) == 2  # finalize only
    v2, e2 = graph_index_stream_state(spark, path)
    assert (_rel(v2), _rel(e2)) == want
    assert not os.path.exists(mdir)
    assert _read_merge_fence(path) == 1


def test_stats_consults_merge_manifest_mid_merge(spark, sf_dir, tmp_path):
    """r14 ADVICE: during a COMMITTED-but-unfinalized merge the base
    dirs may be mid-rewrite — `knn_graph_index_stats` must read the
    merged side dirs and must NOT report the manifest's already-folded
    batches as unmerged (same discipline as the state reader)."""
    import json

    from vector_db_handler_spark.operators.similarity import (
        knn_graph_index_stats,
    )

    path = _build_and_ingest(spark, sf_dir, str(tmp_path))
    v0, e0 = graph_index_stream_state(spark, path)
    n_v, n_e = v0.count(), e0.count()

    mdir = os.path.join(path, "merged")
    v0.repartition("entry").write.partitionBy("entry").parquet(
        os.path.join(mdir, "vectors")
    )
    e0.write.parquet(os.path.join(mdir, "edges"))
    with open(os.path.join(mdir, "_manifest.json"), "w") as fh:
        json.dump({"batches": [0, 1]}, fh)

    st = knn_graph_index_stats(spark, path).first()
    assert st["n_vectors"] == n_v
    assert st["n_edges"] == n_e
    assert st["n_unmerged_batches"] == 0
    assert st["merged_through"] == 1

    # Finalizing changes nothing the stats report.
    assert merge_graph_index_ingest(spark, path) == 2
    st2 = knn_graph_index_stats(spark, path).first()
    assert (
        st2["n_vectors"],
        st2["n_edges"],
        st2["n_unmerged_batches"],
        st2["merged_through"],
    ) == (n_v, n_e, 0, 1)

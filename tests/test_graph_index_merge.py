"""Graph-index MERGE: fold the streaming ingest's committed batch
directories into the base index (the LSM minor→major compaction the
per-batch store accumulates toward).  Pins: probe parity across the
merge (stream state AND the plain base-dir probes, bit-for-bit), the
crash-resume protocol (a committed-but-unfinalized merge is readable
and finalizable), the replay fence (a fresh-checkpoint re-drain of
merged batch ids is a no-op), and the cross-engine DuckDB replay of a
probe over the MERGED state (base ∪ both arrival legs).  Staged in
r14 for r15 driver registration."""

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

# Probe dials for the staged merged-probe driver row (the written
# index's flat-probe geometry over the post-merge state).
PK = 8
PBEAM = 10
PHOPS = 2


def _merged_probe_sql() -> str:
    """DuckDB twin: the ingest chain through e1, then the single-query
    beam walk over the MERGED state (vectors = base ∪ both arrival
    batches, edges = base ∪ both legs' discovered edges) from the
    post-merge entry slice (base entries ∪ arrivals whose hash ≡ 0)."""
    h_q = "CAST('0x' || substr(md5(CAST(q.vec_id AS VARCHAR)), 1, 15) AS BIGINT)"
    sql = (
        dq._graph_ingest_ctes()
        + f""",
fqv AS MATERIALIZED (
  SELECT vec_id, v FROM iqv1
  UNION ALL
  SELECT qid AS vec_id, qv AS v FROM arr1
),
fund AS MATERIALIZED (
  SELECT a, b FROM iu1
  UNION SELECT a, b FROM e1
  UNION SELECT b, a FROM e1
),
qq AS (
  SELECT list_transform({dq._Q_SQL}, x -> {dq._QUANT_CLAMP}) AS v FROM scale
),
fb0 AS (
  SELECT nid, d FROM (
    SELECT q.vec_id AS nid,
           CAST(list_dot_product(q.v, (SELECT v FROM qq)) AS BIGINT) AS d,
           row_number() OVER (
             ORDER BY CAST(list_dot_product(q.v, (SELECT v FROM qq))
                           AS BIGINT) DESC, q.vec_id ASC) AS rn
    FROM fqv q
    WHERE {h_q} % {dq._GIDX_ENTRY_MOD} = 0
  ) WHERE rn <= {PBEAM}
)"""
    )
    for i in range(1, PHOPS + 1):
        hop = dq._BEAM_HOP_SQL.format(i=i, j=i - 1, beam=PBEAM)
        hop = (
            hop.replace(f"x{i} AS (", f"fx{i} AS (")
            .replace(f"b{i - 1}", f"fb{i - 1}")
            .replace(f"b{i} AS (", f"fb{i} AS (")
            .replace(f"FROM x{i} c", f"FROM fx{i} c")
            .replace("JOIN und u", "JOIN fund u")
            .replace("JOIN qv q", "JOIN fqv q")
        )
        sql += hop
    sql += f"""
SELECT nid AS vec_id,
       CAST(rnk AS BIGINT) AS rank,
       d AS iscore
FROM (
  SELECT nid, d,
         row_number() OVER (ORDER BY d DESC, nid ASC) AS rnk
  FROM fb{PHOPS}
) WHERE rnk <= {PK}
"""
    return sql


MERGED_PROBE_SQL = _merged_probe_sql()


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

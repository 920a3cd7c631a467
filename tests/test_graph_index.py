"""Persisted graph-ANN index (write/probe/append parity with the LSH
and IVF stores): probe-vs-in-memory equality, planning-time partition
pruning of the entry slice, HNSW-style incremental append semantics,
and the cross-engine DuckDB replay (a probe of an index built from the
same corpus with the same dials answers exactly like the in-memory
search, so the twin is the parameterized beam-search chain).  Registered
in r14; the oracle lives in driver_queries, aliased back here."""

from __future__ import annotations

import pytest

from tests.oracle_check import assert_oracle_types_hashable, compare
from vector_db_handler_spark import driver_queries as dq
from vector_db_handler_spark.operators.similarity import (
    append_knn_graph_index,
    knn_graph_beam_search,
    knn_graph_beam_search_batch,
    knn_graph_nn_descent,
    knn_graph_probe_table,
    write_knn_graph_index,
)

# Dials + oracle registered in r14 — driver_queries holds the
# parameterized beam chain (_beam_search_sql) and the pinned dials;
# this file aliases them back (one source of truth).
K = dq._GIDX_K
BEAM = dq._GIDX_BEAM
HOPS = dq._GIDX_HOPS
ENTRY_MOD = dq._GIDX_ENTRY_MOD

GIDX_ORACLE_SQL = dq._beam_search_sql(K, BEAM, HOPS, ENTRY_MOD)


@pytest.fixture(scope="module")
def index_path(spark, sf_dir, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("gidx") / "index")
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    write_knn_graph_index(
        emb,
        path,
        graph_k=dq._NND_K,
        graph_iters=dq._NND_ITERS,
        rand_buckets=dq._NND_RAND_BUCKETS,
        entry_mod=ENTRY_MOD,
    )
    return path


def test_probe_equals_in_memory_search(spark, sf_dir, index_path):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    flat = knn_graph_beam_search(
        emb,
        dq.QUERY_VEC,
        k=K,
        beam=BEAM,
        hops=HOPS,
        entry_mod=ENTRY_MOD,
        graph_k=dq._NND_K,
        graph_iters=dq._NND_ITERS,
        rand_buckets=dq._NND_RAND_BUCKETS,
    ).collect()
    probed = knn_graph_probe_table(
        spark, index_path, dq.QUERY_VEC, k=K, beam=BEAM, hops=HOPS
    ).collect()
    assert [tuple(r) for r in probed] == [tuple(r) for r in flat]


def test_oracle_types_hashable(duck):
    assert_oracle_types_hashable(duck, GIDX_ORACLE_SQL, "graph_index")


def test_cross_engine_oracle_replay(spark, index_path, duck):
    got = knn_graph_probe_table(
        spark, index_path, dq.QUERY_VEC, k=K, beam=BEAM, hops=HOPS
    )
    compare(got, duck, GIDX_ORACLE_SQL)


def test_entry_scan_prunes_partitions(spark, index_path):
    """The entry slice lives in its own partition directory: the scan
    behind the entry stage must carry a PartitionFilters entry on the
    ``entry`` column — planning-time pruning, not a post-scan filter."""
    from pyspark.sql import functions as F

    leg = (
        spark.read.parquet(f"{index_path}/vectors")
        .filter(F.col("entry") == 1)
        .select("nid")
    )
    plan = leg._sc._jvm.PythonSQLUtils.explainString(
        leg._jdf.queryExecution(), "formatted"
    )
    assert any(
        "PartitionFilters" in line and "entry" in line
        for line in plan.splitlines()
    )


def test_scale_and_meta_roundtrip(spark, sf_dir, index_path):
    from vector_db_handler_spark.operators.quantize import max_abs_scale

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    want_s = max_abs_scale(emb).first()["s"]
    got_s = spark.read.parquet(f"{index_path}/scale").first()["s"]
    assert got_s == want_s
    meta = spark.read.parquet(f"{index_path}/meta").first()
    assert meta["entry_mod"] == ENTRY_MOD
    assert meta["graph_k"] == dq._NND_K
    assert meta["dim"] == len(emb.first()["embedding"])


def test_append_edges_equal_batch_search(spark, sf_dir, tmp_path):
    """The append IS the HNSW insert: each new vector's stored edges
    must equal the batch beam-search answer against the pre-append
    index (same entry slice, same hops, top-graph_k) — quantized with
    the STORED scale, bit-for-bit."""
    from pyspark.sql import functions as F

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    path = str(tmp_path / "gidx_append")
    write_knn_graph_index(
        emb,
        path,
        graph_k=dq._NND_K,
        graph_iters=dq._NND_ITERS,
        rand_buckets=dq._NND_RAND_BUCKETS,
        entry_mod=ENTRY_MOD,
    )
    new = emb.filter("vec_id < 3").selectExpr(
        "vec_id + 100000 AS vec_id", "embedding", "label"
    )
    append_knn_graph_index(new, path)

    graph = knn_graph_nn_descent(
        emb,
        k=dq._NND_K,
        iters=dq._NND_ITERS,
        rand_buckets=dq._NND_RAND_BUCKETS,
    )
    want = {
        (r["query_id"], r["neighbor_id"], r["iscore"])
        for r in knn_graph_beam_search_batch(
            emb,
            new.select(F.col("vec_id").alias("query_id"), "embedding"),
            k=dq._NND_K,
            beam=max(8, 2 * dq._NND_K),
            hops=2,
            graph=graph,
            entry_mod=ENTRY_MOD,
        ).collect()
    }
    got = {
        tuple(r)
        for r in spark.read.parquet(f"{path}/edges")
        .filter("a >= 100000")
        .select("a", "b", "d")
        .collect()
    }
    assert got == want

    # New vectors landed with the stored-scale quantization and the
    # stored entry geometry.
    vecs = spark.read.parquet(f"{path}/vectors").filter("nid >= 100000")
    assert vecs.count() == 3


def test_append_makes_new_vectors_reachable(spark, sf_dir, tmp_path):
    """Search-for-the-appended-vector finds it: the appended node's
    directed edges are walked in reverse by the undirected search, so
    an arrival is immediately servable without a rebuild.  The
    appended node duplicates vec 1's embedding, so its score for that
    query ties vec 1's exactly."""
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    path = str(tmp_path / "gidx_reach")
    write_knn_graph_index(
        emb,
        path,
        graph_k=dq._NND_K,
        graph_iters=dq._NND_ITERS,
        rand_buckets=dq._NND_RAND_BUCKETS,
        entry_mod=ENTRY_MOD,
    )
    new = emb.filter("vec_id = 1").selectExpr(
        "vec_id + 100000 AS vec_id", "embedding", "label"
    )
    append_knn_graph_index(new, path)
    qv = [float(x) for x in emb.filter("vec_id = 1").first()["embedding"]]
    got = knn_graph_probe_table(spark, path, qv, k=12, beam=12, hops=3).collect()
    by_id = {r["vec_id"]: r for r in got}
    assert 100001 in by_id
    assert by_id[100001]["iscore"] == by_id[1]["iscore"]


def test_probe_args_validated(spark, index_path):
    with pytest.raises(ValueError, match="k <= beam"):
        knn_graph_probe_table(spark, index_path, dq.QUERY_VEC, k=5, beam=3)
    with pytest.raises(ValueError, match="hops"):
        knn_graph_probe_table(
            spark, index_path, dq.QUERY_VEC, k=1, beam=2, hops=-1
        )


def test_write_args_validated(spark, sf_dir, tmp_path):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    with pytest.raises(ValueError, match="entry_mod"):
        write_knn_graph_index(emb, str(tmp_path / "x"), entry_mod=0)


def test_batch_probe_equals_in_memory_batch(spark, sf_dir, index_path):
    """The serve shape: batch probe of the written index answers a
    whole queries relation exactly like the in-memory batch search."""
    from pyspark.sql import functions as F

    from vector_db_handler_spark.operators.similarity import (
        knn_graph_probe_table_batch,
    )

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    queries = emb.filter(F.col("vec_id") % 97 == 0).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    want = knn_graph_beam_search_batch(
        emb,
        queries,
        k=5,
        beam=BEAM,
        hops=HOPS,
        entry_mod=ENTRY_MOD,
        graph_k=dq._NND_K,
        graph_iters=dq._NND_ITERS,
        rand_buckets=dq._NND_RAND_BUCKETS,
    ).collect()
    got = knn_graph_probe_table_batch(
        spark, index_path, queries, k=5, beam=BEAM, hops=HOPS
    ).collect()
    assert sorted(map(tuple, got)) == sorted(map(tuple, want))


def test_compaction_preserves_relations_and_bounds_files(spark, sf_dir, tmp_path):
    """Append a few batches, compact: the vectors and edges RELATIONS
    are unchanged row-for-row, probe answers are unchanged, and the
    edges file count drops back to the bounded compacted layout."""
    import glob

    from vector_db_handler_spark.operators.similarity import (
        compact_knn_graph_index,
    )

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    path = str(tmp_path / "gidx_compact")
    write_knn_graph_index(
        emb,
        path,
        graph_k=dq._NND_K,
        graph_iters=dq._NND_ITERS,
        rand_buckets=dq._NND_RAND_BUCKETS,
        entry_mod=ENTRY_MOD,
    )
    for i in range(3):
        new = emb.filter(f"vec_id % 83 = {i}").limit(4).selectExpr(
            f"vec_id + {100000 * (i + 1)} AS vec_id", "embedding", "label"
        )
        append_knn_graph_index(new, path)

    before_edges = sorted(
        map(tuple, spark.read.parquet(f"{path}/edges").collect())
    )
    before_vecs = sorted(
        map(tuple, spark.read.parquet(f"{path}/vectors").collect())
    )
    before_probe = knn_graph_probe_table(
        spark, path, dq.QUERY_VEC, k=K, beam=BEAM, hops=HOPS
    ).collect()
    n_files_before = len(glob.glob(f"{path}/edges/*.parquet"))

    compact_knn_graph_index(spark, path)

    assert sorted(map(tuple, spark.read.parquet(f"{path}/edges").collect())) == before_edges
    assert sorted(map(tuple, spark.read.parquet(f"{path}/vectors").collect())) == before_vecs
    after_probe = knn_graph_probe_table(
        spark, path, dq.QUERY_VEC, k=K, beam=BEAM, hops=HOPS
    ).collect()
    assert [tuple(r) for r in after_probe] == [tuple(r) for r in before_probe]
    n_files_after = len(glob.glob(f"{path}/edges/*.parquet"))
    assert n_files_after < n_files_before


def test_hier_probe_equals_in_memory_hierarchical(spark, sf_dir, tmp_path):
    """An index written with layer_mod persists the coarse layer; the
    hierarchical probe must replay the in-memory hierarchical search
    exactly (same corpus, same dials) — the coarsening pass moves from
    per-query to build-time with zero answer drift."""
    from tests.test_hierarchical_search import (
        BEAM as H_BEAM,
        COARSE_ENTRY_MOD,
        COARSE_HOPS,
        COARSE_K,
        HOPS as H_HOPS,
        K as H_K,
        LAYER_MOD,
    )
    from vector_db_handler_spark.operators.similarity import (
        knn_graph_hierarchical_search,
        knn_graph_probe_table_hier,
    )

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    path = str(tmp_path / "gidx_hier")
    write_knn_graph_index(
        emb,
        path,
        graph_k=dq._NND_K,
        graph_iters=dq._NND_ITERS,
        rand_buckets=dq._NND_RAND_BUCKETS,
        entry_mod=ENTRY_MOD,
        layer_mod=LAYER_MOD,
        coarse_k=COARSE_K,
    )
    want = knn_graph_hierarchical_search(
        emb,
        dq.QUERY_VEC,
        k=H_K,
        beam=H_BEAM,
        hops=H_HOPS,
        layer_mod=LAYER_MOD,
        coarse_k=COARSE_K,
        coarse_hops=COARSE_HOPS,
        coarse_entry_mod=COARSE_ENTRY_MOD,
        graph_k=dq._NND_K,
        graph_iters=dq._NND_ITERS,
        rand_buckets=dq._NND_RAND_BUCKETS,
    ).collect()
    got = knn_graph_probe_table_hier(
        spark,
        path,
        dq.QUERY_VEC,
        k=H_K,
        beam=H_BEAM,
        hops=H_HOPS,
        coarse_hops=COARSE_HOPS,
        coarse_entry_mod=COARSE_ENTRY_MOD,
    ).collect()
    assert [tuple(r) for r in got] == [tuple(r) for r in want]
    meta = spark.read.parquet(f"{path}/meta").first()
    assert meta["layer_mod"] == LAYER_MOD and meta["coarse_k"] == COARSE_K


def test_hier_probe_requires_layer(spark, sf_dir, tmp_path):
    """Probing a layer-less index hierarchically fails loudly with the
    rebuild hint instead of walking a missing directory.  The layer is
    ON by default now (DEFAULT_LAYER_MOD), so a flat-only index takes
    an explicit ``layer_mod=None``."""
    from vector_db_handler_spark.operators.similarity import (
        knn_graph_probe_table_hier,
    )

    path = str(tmp_path / "gidx_flat_only")
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    write_knn_graph_index(
        emb,
        path,
        graph_k=dq._NND_K,
        graph_iters=dq._NND_ITERS,
        rand_buckets=dq._NND_RAND_BUCKETS,
        entry_mod=ENTRY_MOD,
        layer_mod=None,
    )
    assert not (tmp_path / "gidx_flat_only" / "coarse_edges").exists()
    with pytest.raises(ValueError, match="layer_mod"):
        knn_graph_probe_table_hier(spark, path, dq.QUERY_VEC)


def test_probe_rejects_wrong_dim(spark, index_path):
    """r13 ADVICE: meta['dim'] is now READ — a wrong-dimension query
    raises instead of silently null-padding every zip_with score (all
    three probe shapes)."""
    from vector_db_handler_spark.operators.similarity import (
        knn_graph_probe_table_batch,
        knn_graph_probe_table_hier,
    )

    bad = [1.0, 2.0, 3.0]
    with pytest.raises(ValueError, match="dim"):
        knn_graph_probe_table(spark, index_path, bad)
    with pytest.raises(ValueError, match="dim"):
        knn_graph_probe_table_hier(spark, index_path, bad)
    # Batch probe (r14 ADVICE): the guard is DECLARATIVE — assert_true
    # rides the serve plan so EVERY row is validated (a first()-only
    # check cost an extra job and let mixed-dimension batches null-score
    # all other rows silently).  The error therefore surfaces at action
    # time, and a mixed batch fails even when its first row is valid.
    qdf = spark.createDataFrame(
        [(1, bad)], "query_id long, embedding array<double>"
    )
    with pytest.raises(Exception, match="dim"):
        knn_graph_probe_table_batch(
            spark, index_path, qdf, k=1, beam=2
        ).collect()
    good = dq.QUERY_VEC
    mixed = spark.createDataFrame(
        [(1, [float(x) for x in good]), (2, bad)],
        "query_id long, embedding array<double>",
    )
    with pytest.raises(Exception, match="dim"):
        knn_graph_probe_table_batch(
            spark, index_path, mixed, k=1, beam=2
        ).collect()


def test_probe_serve_path_is_job_free(spark, sf_dir, tmp_path):
    """r14 verdict #3: the written index's meta/ stores the build-time
    hash-layer count (n_layer) and entry-slice count (n_entry), so
    constructing a probe — flat, batch, on_ids(None->plain), or
    hierarchical with DEFAULT coarse_entry_mod — runs NO driver
    count/isEmpty job over index relations (only the 1-row meta read).
    Pinned by making count/isEmpty explode during plan construction;
    results stay bit-identical to the unpatched run."""
    from pyspark.sql import DataFrame as _DF
    from pyspark.sql import functions as F

    from vector_db_handler_spark.operators.similarity import (
        knn_graph_probe_table_batch,
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
        layer_mod=4,
    )
    meta = spark.read.parquet(f"{path}/meta").first()
    assert int(meta["n_layer"]) > 0 and int(meta["n_entry"]) > 0

    queries = emb.filter("vec_id % 7 = 0").select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    base_flat = knn_graph_probe_table(
        spark, path, dq.QUERY_VEC, k=3, beam=8, hops=2
    ).collect()
    base_hier = knn_graph_probe_table_hier(
        spark, path, dq.QUERY_VEC, k=3, beam=8, hops=2
    ).collect()

    def _boom(self):
        raise AssertionError(
            "driver count/isEmpty job on the probe construction path"
        )

    orig_count, orig_isempty = _DF.count, _DF.isEmpty
    _DF.count, _DF.isEmpty = _boom, _boom
    try:
        flat_df = knn_graph_probe_table(
            spark, path, dq.QUERY_VEC, k=3, beam=8, hops=2
        )
        hier_df = knn_graph_probe_table_hier(
            spark, path, dq.QUERY_VEC, k=3, beam=8, hops=2
        )  # DEFAULT coarse_entry_mod — derived from meta, not a count
        batch_df = knn_graph_probe_table_batch(
            spark, path, queries, k=3, beam=8, hops=2
        )
    finally:
        _DF.count, _DF.isEmpty = orig_count, orig_isempty
    assert [tuple(r) for r in flat_df.collect()] == [
        tuple(r) for r in base_flat
    ]
    assert [tuple(r) for r in hier_df.collect()] == [
        tuple(r) for r in base_hier
    ]
    assert batch_df.count() > 0

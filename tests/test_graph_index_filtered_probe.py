"""Filtered probe over the WRITTEN graph-ANN index (H14's
search-within-these-docs on the persisted serve path) + the index
stats ANALYZE row.  Registered in r15; the
twins live in driver_queries and this file aliases them back."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tests.oracle_check import assert_oracle_types_hashable, compare
from vector_db_handler_spark import driver_queries as dq
from vector_db_handler_spark.operators.similarity import (
    delete_knn_graph_index,
    knn_graph_index_stats,
    knn_graph_probe_table,
    knn_graph_probe_table_on_ids,
    write_knn_graph_index,
)

# Dials + twins registered in r15 — driver_queries is the one source
# of truth; this file aliases them back.
K = dq._GIDX_K
BEAM = dq._GIDX_BEAM
HOPS = dq._GIDX_HOPS
ENTRY_MOD = dq._GIDX_ENTRY_MOD
SELECTIVE_MOD = dq._FPROBE_SELECTIVE_MOD   # ~0.6% of ids -> exact branch
BROAD_MOD = dq._FPROBE_BROAD_MOD           # ~33% of ids  -> walk branch

SELECTIVE_PROBE_SQL = dq._FPROBE_SELECTIVE_SQL
BROAD_PROBE_SQL = dq._FPROBE_BROAD_SQL


@pytest.fixture(scope="module")
def fidx(spark, sf_dir, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("fidx") / "index")
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
    return path


def _allowed(spark, sf_dir, mod):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    return emb.filter(F.col("vec_id") % mod == 0).select("vec_id")


def test_oracle_types_hashable(duck):
    assert_oracle_types_hashable(duck, SELECTIVE_PROBE_SQL, "fprobe_sel")
    assert_oracle_types_hashable(duck, BROAD_PROBE_SQL, "fprobe_broad")


def test_selective_cross_engine_replay(spark, sf_dir, fidx, duck):
    got = knn_graph_probe_table_on_ids(
        spark, fidx, dq.QUERY_VEC, _allowed(spark, sf_dir, SELECTIVE_MOD),
        k=K, beam=BEAM, hops=HOPS,
    )
    compare(got, duck, SELECTIVE_PROBE_SQL)


def test_broad_cross_engine_replay(spark, sf_dir, fidx, duck):
    got = knn_graph_probe_table_on_ids(
        spark, fidx, dq.QUERY_VEC, _allowed(spark, sf_dir, BROAD_MOD),
        k=K, beam=BEAM, hops=HOPS, exact_threshold=0,
    )
    compare(got, duck, BROAD_PROBE_SQL)


def test_none_means_match_all(spark, sf_dir, fidx):
    plain = knn_graph_probe_table(
        spark, fidx, dq.QUERY_VEC, k=K, beam=BEAM, hops=HOPS
    ).collect()
    got = knn_graph_probe_table_on_ids(
        spark, fidx, dq.QUERY_VEC, None, k=K, beam=BEAM, hops=HOPS
    ).collect()
    assert [tuple(r) for r in got] == [tuple(r) for r in plain]


def test_tombstoned_ids_never_admissible(spark, sf_dir, fidx):
    """Delete an id that the selective filter allows: the filtered
    probe must not return it in either branch."""
    allowed = _allowed(spark, sf_dir, SELECTIVE_MOD)
    first = allowed.orderBy("vec_id").first()["vec_id"]
    delete_knn_graph_index(spark, fidx, [int(first)])
    sel = knn_graph_probe_table_on_ids(
        spark, fidx, dq.QUERY_VEC, allowed, k=K, beam=BEAM, hops=HOPS
    ).collect()
    assert first not in {r["vec_id"] for r in sel}
    broad = knn_graph_probe_table_on_ids(
        spark, fidx, dq.QUERY_VEC, allowed, k=2, beam=BEAM, hops=HOPS,
        exact_threshold=0,
    ).collect()
    assert first not in {r["vec_id"] for r in broad}


def test_stats_row(spark, sf_dir, tmp_path):
    """The ANALYZE row reflects the store's actual state through the
    write → delete → (no merge) lifecycle."""
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
    st = knn_graph_index_stats(spark, path).first()
    n = emb.count()
    assert st["n_vectors"] == n
    assert st["entry_mod"] == ENTRY_MOD and st["graph_k"] == dq._NND_K
    assert st["dim"] == len(emb.first()["embedding"])
    assert st["layer_mod"] == 4 and st["n_coarse_edges"] > 0
    assert 0 < st["n_entry"] < n
    assert st["n_edges"] > 0
    assert st["n_tombstones"] == 0 and st["n_unmerged_batches"] == 0
    assert st["merged_through"] == -1
    delete_knn_graph_index(spark, path, [0, 1])
    st2 = knn_graph_index_stats(spark, path).first()
    assert st2["n_tombstones"] == 2


def test_args_validated(spark, sf_dir, fidx):
    allowed = _allowed(spark, sf_dir, SELECTIVE_MOD)
    with pytest.raises(ValueError, match="k <= beam"):
        knn_graph_probe_table_on_ids(
            spark, fidx, dq.QUERY_VEC, allowed, k=9, beam=3
        )
    with pytest.raises(ValueError, match="dim"):
        knn_graph_probe_table_on_ids(spark, fidx, [1.0, 2.0], allowed)

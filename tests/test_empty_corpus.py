"""Empty-corpus robustness: operators that collect a 'small side'
(query batches, centroids, scales) or write partitioned indexes must
degrade to empty results — not crash — when the corpus is empty.
Regression set = the five queries that failed the first empty-fixture
sweep, plus the operator-level edges behind them."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from vector_db_handler_spark import driver_queries as dq


@pytest.fixture(scope="module")
def empty_dir(spark, sf_dir, tmp_path_factory):
    root = tmp_path_factory.mktemp("empty_fixture")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    for t in ["documents", "embeddings", "events"]:
        df = spark.read.parquet(f"{sf_dir}/{t}.parquet")
        df.filter(F.lit(False)).coalesce(1).write.parquet(str(root / f"{t}.parquet"))
    return str(root)


@pytest.mark.parametrize(
    "name",
    [
        "cosine_topk_join",
        "ivf_topk",
        "ivfsq_probe_topk",
        "lsh_index_probe",
        "pipeline_ingest_search",
        "knn_topk",
        "dedup_exact",
        "neardup_components",
        "quantized_knn_topk",
        "doc_repetition",
        # round 5: no-seed k-means returned IndexError on first sweep
        "kmeans_int8_2iter",
        "winnowing_fingerprints",
        "winnowing_overlap_pairs",
        "winnowing_containment_pairs",
        "bigram_novelty",
        "running_user_value_stream",
        # round 6 additions
        "srp_neardup_pairs",
        "semdedup_survivors",
        "bm25_topk_docs",
        "embedding_dispersion",
        "value_percentiles_by_type",
        "trending_types_stream",
        "dataset_split_counts",
        "phrase_search_docs",
        "hybrid_search_rerank",
        "incremental_rollup_merge",
        "binary_hamming_topk",
        "srp_multiprobe_pairs",
        # round-6 continuation (documents/embeddings/events-based only:
        # the empty fixture carries just those three tables)
        "kmv_distinct_users_by_type",
        "lang_temperature_weights",
        "gapfill_user_daily",
        "ewma_user_daily",
        "ppjoin_jaccard_pairs",
        "user_anomaly_stream",
        "rolling_median_7d",
        "cms_user_event_counts",
        "mrl_prefix_rerank",
        "event_type_transitions",
        "value_decile_bins",
        "embedding_dim_stats",
        "dedup_rate_by_source",
        "tumbling_distinct_users_stream",
        "dataset_snapshot_diff",
        "rfm_user_segments",
        "pivot_user_type_matrix",
        "unpivot_user_type_matrix",
        # round-7 continuation (documents/embeddings/events-based)
        "doc_chunks",
        "kmv_user_overlap_pairs",
        "mad_value_outliers",
        "latest_user_value_stream",
        "dbscan_embedding_clusters",
        "rrf_hybrid_topk",
        "value_drift_tv",
        "funnel_view_click_purchase",
        "hard_negative_triplets",
        "weighted_jaccard_pairs",
        "theil_sen_user_trend",
        "cusum_user_alarms",
        "stream_stream_left_outer",
        "ann_recall_report",
        "mrl_recall_curve",
        "split_leakage_pairs",
        "funnel_stream_counts",
        "label_propagation_embeddings",
        "sq8_distortion_by_label",
        "embedding_dim_robust_stats",
        "bootstrap_value_ci",
        "cohort_retention_matrix",
        "incremental_neardup_components",
    ],
)
def test_query_survives_empty_corpus(spark, empty_dir, name):
    assert dq.queries()[name](spark, empty_dir).collect() == []


def test_dq_report_on_empty_corpus_is_vacuous_not_empty(spark, empty_dir):
    """The DQ report is per-CONSTRAINT, not per-row: an empty relation
    yields 7 verdict rows (vacuous truths + a failing row_count), not
    zero rows — the one registered query whose empty-corpus contract
    is deliberately non-empty."""
    rows = dq.queries()["dq_events_report"](spark, empty_dir).collect()
    assert len(rows) == 7
    got = {(r.check, r.col): r.passed for r in rows}
    assert got[("row_count", "*")] is False  # 0 rows < the 1000 floor
    assert got[("uniqueness", "event_id")] is True  # vacuous


def test_weighted_sample_raises_loudly_on_empty_corpus(spark, empty_dir):
    """Zero total weight cannot produce a weighted sample — the
    operator fails loudly instead of returning a silent empty."""
    with pytest.raises(ValueError, match="total weight"):
        dq.queries()["weighted_doc_sample"](spark, empty_dir).collect()


@pytest.fixture(scope="module")
def empty_all_dir(spark, sf_dir, tmp_path_factory):
    """Every fixture table empty — lets the relational/graph queries
    join the doc/emb/events trio in the sweep."""
    root = tmp_path_factory.mktemp("empty_all_fixture")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    for t in [
        "documents", "embeddings", "events", "region", "nation",
        "customer", "supplier", "part", "orders", "lineitem",
    ]:
        df = spark.read.parquet(f"{sf_dir}/{t}.parquet")
        df.filter(F.lit(False)).coalesce(1).write.parquet(str(root / f"{t}.parquet"))
    return str(root)


@pytest.mark.parametrize(
    "name",
    [
        # round-7 continuation: relational/graph-table queries
        "triangle_brand_stats",
        "kcore_part_graph",
        "bfs_brand_seed_hops",
        "clustering_coefficient_parts",
        "fuzzy_part_name_pairs",
        "er_golden_records",
        "frequent_part_triples",
        "ivm_join_orders_customer",
        "scd2_asof_order_lookup",
    ],
)
def test_relational_query_survives_empty_tables(spark, empty_all_dir, name):
    assert dq.queries()[name](spark, empty_all_dir).collect() == []


def test_join_size_estimate_on_empty_tables_is_zero(spark, empty_all_dir):
    """The estimator's aggregate contract: one row, zero counts."""
    rows = dq.queries()["join_size_estimate_ol"](spark, empty_all_dir).collect()
    assert len(rows) == 1
    assert (rows[0].sample_pairs, rows[0].est_pairs, rows[0].exact_pairs) == (0, 0, 0)


def test_r13_staged_operators_degrade_to_empty(spark, empty_dir):
    """The r13-staged families on an empty corpus: hierarchical
    search, the graph recall report and the curation manifest must
    all return EMPTY relations, never crash — same contract as the
    r7 battery above."""
    from vector_db_handler_spark.operators import similarity as sim
    from vector_db_handler_spark.operators.curation import curation_manifest

    emb = spark.read.parquet(f"{empty_dir}/embeddings.parquet")
    docs = spark.read.parquet(f"{empty_dir}/documents.parquet")
    assert (
        sim.knn_graph_hierarchical_search(
            emb, dq.QUERY_VEC, k=3, beam=4, hops=1, layer_mod=4,
            coarse_k=2, coarse_hops=1, coarse_entry_mod=2,
            kmeans_k=2, rand_buckets=4,
        ).count()
        == 0
    )
    assert (
        sim.graph_ann_recall_report(
            emb,
            emb.select(F.col("vec_id").alias("query_id"), "embedding"),
            k=2, beam=3, hops=1, entry_mod=2, kmeans_k=2, rand_buckets=4,
        ).count()
        == 0
    )
    assert curation_manifest(docs, 10, ["s0"]).count() == 0


def test_graph_index_write_refuses_empty_corpus(spark, empty_dir, tmp_path):
    """An index over nothing is a torn artifact waiting to happen:
    the write fails FAST and loudly, before any directory lands."""
    import os

    from vector_db_handler_spark.operators.similarity import (
        write_knn_graph_index,
    )

    emb = spark.read.parquet(f"{empty_dir}/embeddings.parquet")
    path = str(tmp_path / "gidx_empty")
    with pytest.raises(ValueError, match="empty"):
        write_knn_graph_index(emb, path, entry_mod=4)
    assert not os.path.exists(path)

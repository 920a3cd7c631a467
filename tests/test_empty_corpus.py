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
    ],
)
def test_query_survives_empty_corpus(spark, empty_dir, name):
    assert dq.queries()[name](spark, empty_dir).collect() == []

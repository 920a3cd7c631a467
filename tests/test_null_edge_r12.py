"""Empty/degenerate-input sweep for the eight r12-staged families —
the discipline that caught the IND divide-by-zero in r11: every
operator must DEGRADE (empty or well-defined output), never throw,
on empty inputs, all-null columns, and single-row corpora."""

from __future__ import annotations

from vector_db_handler_spark.operators.graph import hyperball_neighborhood
from vector_db_handler_spark.operators.layout import minmax_pruning_report
from vector_db_handler_spark.operators.lm_score import domain_mixture_weights
from vector_db_handler_spark.operators.quantize import power_iteration_top_pc
from vector_db_handler_spark.operators.sampling import (
    allocate_stratified_exact,
)
from vector_db_handler_spark.operators.similarity import (
    knn_graph_beam_search,
)
from vector_db_handler_spark.operators.timeseries import (
    cube_by_day_type_source,
)
from vector_db_handler_spark.operators.windows import watermark_late_audit


def _empty(spark, ddl):
    return spark.createDataFrame([], ddl)


def test_beam_search_empty_and_singleton(spark):
    ddl = "vec_id long, embedding array<double>"
    assert (
        knn_graph_beam_search(
            _empty(spark, ddl), [1.0, 0.0], k=1, beam=2, entry_mod=1
        ).count()
        == 0
    )
    one = spark.createDataFrame([(7, [1.0, 0.0])], ddl)
    out = knn_graph_beam_search(
        one, [1.0, 0.0], k=1, beam=2, hops=1, entry_mod=1, kmeans_k=1
    ).collect()
    # a 1-node corpus: the node itself is the whole beam
    assert [r["vec_id"] for r in out] == [7]


def test_hyperball_empty_edges(spark):
    assert (
        hyperball_neighborhood(
            _empty(spark, "src long, dst long"), n_hops=2
        ).count()
        == 0
    )


def test_watermark_audit_empty_and_single_row(spark):
    ddl = "event_id long, arrival_seq long, ts timestamp"
    assert watermark_late_audit(_empty(spark, ddl)).count() == 0
    import datetime as dt

    one = spark.createDataFrame(
        [(1, 1, dt.datetime(2024, 1, 1))], ddl
    )
    r = watermark_late_audit(one).collect()[0]
    # no predecessor: watermark is -inf, the row can never be late
    assert (r["n_total"], r["n_late"], r["max_lateness_us"]) == (1, 0, 0)


def test_domain_mixture_empty_and_all_null_lang(spark):
    ddl = "doc_id long, lang string, text string"
    assert domain_mixture_weights(_empty(spark, ddl)).count() == 0
    nulls = spark.createDataFrame([(1, None, "a b c")], ddl)
    assert domain_mixture_weights(nulls).count() == 0
    # single-word docs have zero bigrams: domain absent, not 0/0
    short = spark.createDataFrame([(1, "aa", "word")], ddl)
    assert domain_mixture_weights(short).count() == 0


def test_pruning_report_empty_relation(spark):
    out = minmax_pruning_report(
        _empty(spark, "x long, y long"), "x", "y", [("p", 0, 1, 0, 1)]
    ).collect()
    # no buckets at all: the report itself is empty (no rows scanned,
    # nothing to prune) — a well-defined degenerate, not a crash
    assert out == []


def test_power_iteration_empty_and_single_vector(spark):
    ddl = "vec_id long, embedding array<double>"
    assert power_iteration_top_pc(_empty(spark, ddl)).count() == 0
    one = spark.createDataFrame([(1, [3.0, 4.0])], ddl)
    out = {r["dim"]: r for r in power_iteration_top_pc(one).collect()}
    # rank-1 Gram: the dominant direction is the vector itself
    assert abs(out[1]["component_1024"]) == 1024
    assert out[0]["rayleigh"] is not None


def test_stratified_alloc_empty(spark):
    assert (
        allocate_stratified_exact(
            _empty(spark, "doc_id long, lang string"), 10, "lang", "doc_id"
        ).count()
        == 0
    )


def test_cube_empty_events(spark):
    ddl = "ts timestamp, event_type string, user_bucket string, value double"
    out = cube_by_day_type_source(_empty(spark, ddl)).collect()
    # SQL CUBE over an empty relation emits ONLY the grand-total row
    # (count 0) — both engines agree on this convention
    assert len(out) == 1
    assert out[0]["grouping_id"] == 7 and out[0]["n_events"] == 0

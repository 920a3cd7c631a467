"""Sketch operators: approximate answers verified against exact
results with explicit error bounds (they can't hash-match a SQL
oracle by nature)."""

from __future__ import annotations

from pyspark.sql import functions as F

from vector_db_handler_spark.functions.text import portable_hash60
from vector_db_handler_spark.operators import sketches
from vector_db_handler_spark.sources.tables import load_table


def test_approx_distinct_within_rsd(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    approx = {
        r["event_type"]: r["approx_distinct"]
        for r in sketches.approx_distinct_by(ev, "event_type", "user_id").collect()
    }
    exact = {
        r["event_type"]: r["n"]
        for r in ev.groupBy("event_type").agg(F.countDistinct("user_id").alias("n")).collect()
    }
    assert approx.keys() == exact.keys()
    for k in exact:
        assert abs(approx[k] - exact[k]) <= max(3, 0.15 * exact[k]), (k, approx[k], exact[k])


def test_quantiles_bracket_exact_median(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    q50, q95, q99 = sketches.value_quantiles(ev, "value").collect()[0]["quantiles"]
    assert q50 <= q95 <= q99
    exact_med = ev.agg(F.expr("percentile(value, 0.5)").alias("m")).collect()[0]["m"]
    spread = ev.agg((F.max("value") - F.min("value")).alias("s")).collect()[0]["s"]
    assert abs(q50 - exact_med) <= 0.05 * spread


def test_bloom_prefilter_never_drops_novel_rows(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", portable_hash60(F.col("text")).alias("text_hash")
    )
    seen = docs.filter(F.col("doc_id") % 2 == 0).select("text_hash")
    novel = docs.filter(F.col("doc_id") % 2 == 1)
    survivors = sketches.dedup_bloom_prefilter(docs, seen)
    surv_ids = {r["doc_id"] for r in survivors.collect()}
    novel_ids = {r["doc_id"] for r in novel.collect()}
    # no false negatives: every definitely-seen row is dropped only if
    # truly seen; every survivor must be novel
    assert surv_ids <= novel_ids
    # and the filter keeps the vast majority of novel rows (fpp=1%)
    assert len(surv_ids) >= 0.9 * len(novel_ids)


def test_bloom_prefilter_empty_seen_is_identity(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", portable_hash60(F.col("text")).alias("text_hash")
    )
    empty = docs.filter(F.lit(False)).select("text_hash")
    assert sketches.dedup_bloom_prefilter(docs, empty).count() == docs.count()

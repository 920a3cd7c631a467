"""SCD Type-2 merge: row fates, idempotency, and replay safety."""

from __future__ import annotations

from pyspark.sql import functions as F

from vector_db_handler_spark.operators.merge import scd2_merge
from vector_db_handler_spark.sources.tables import load_table


def _dim(spark, sf_dir):
    return load_table(spark, sf_dir, "customer").select(
        "c_custkey",
        F.col("c_acctbal").cast("decimal(18,2)").alias("acctbal"),
        F.col("c_mktsegment").alias("segment"),
        F.to_date(F.lit("2024-01-01")).alias("valid_from"),
        F.lit(None).cast("date").alias("valid_to"),
        F.lit(True).alias("is_current"),
    )


def _updates(spark, sf_dir):
    cust = load_table(spark, sf_dir, "customer")
    return cust.filter(F.col("c_custkey") % 7 == 0).select(
        "c_custkey",
        (F.col("c_acctbal").cast("decimal(18,2)") + F.lit(100).cast("decimal(18,2)"))
        .cast("decimal(18,2)")
        .alias("acctbal"),
        F.col("c_mktsegment").alias("segment"),
    )


def test_scd2_row_fates(spark, sf_dir):
    dim = _dim(spark, sf_dir)
    upd = _updates(spark, sf_dir)
    n_dim = dim.count()
    n_upd = upd.count()
    out = scd2_merge(dim, upd, "c_custkey", ["acctbal", "segment"], "2024-06-01")

    # every changed key contributes one closed + one new row
    assert out.count() == n_dim + n_upd
    closed = out.filter(~F.col("is_current"))
    assert closed.count() == n_upd
    assert closed.filter(F.col("valid_to") != F.lit("2024-06-01").cast("date")).count() == 0
    # exactly one current row per key, always
    dup = (
        out.filter("is_current")
        .groupBy("c_custkey")
        .count()
        .filter("count > 1")
        .count()
    )
    assert dup == 0


def test_scd2_replay_is_idempotent(spark, sf_dir):
    """Applying the SAME batch to the merged result changes nothing:
    matched rows now carry identical tracked values, so they are
    carried, not re-versioned — the property that makes a retried
    ingest batch safe."""
    dim = _dim(spark, sf_dir)
    upd = _updates(spark, sf_dir)
    once = scd2_merge(dim, upd, "c_custkey", ["acctbal", "segment"], "2024-06-01")
    twice = scd2_merge(once, upd, "c_custkey", ["acctbal", "segment"], "2024-07-01")
    key = ["c_custkey", "acctbal", "segment", "valid_from", "valid_to", "is_current"]
    a = sorted(map(str, once.select(*key).collect()))
    b = sorted(map(str, twice.select(*key).collect()))
    assert a == b


def test_scd2_second_batch_extends_history(spark, sf_dir):
    """A LATER batch that changes the same keys again adds a second
    closed version per key; the first closed version is untouched."""
    dim = _dim(spark, sf_dir)
    upd1 = _updates(spark, sf_dir)
    upd2 = upd1.withColumn(
        "acctbal",
        (F.col("acctbal") + F.lit(50).cast("decimal(18,2)")).cast("decimal(18,2)"),
    )
    once = scd2_merge(dim, upd1, "c_custkey", ["acctbal", "segment"], "2024-06-01")
    again = scd2_merge(once, upd2, "c_custkey", ["acctbal", "segment"], "2024-09-01")
    n_upd = upd1.count()
    hist = again.filter(~F.col("is_current"))
    assert hist.count() == 2 * n_upd
    # intervals chain: first version closed at 06-01, second at 09-01
    per_key = (
        hist.groupBy("c_custkey")
        .agg(F.min("valid_to").alias("first_close"), F.max("valid_to").alias("last_close"))
        .collect()
    )
    for r in per_key:
        assert str(r.first_close) == "2024-06-01"
        assert str(r.last_close) == "2024-09-01"

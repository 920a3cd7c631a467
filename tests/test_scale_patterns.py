"""Scale patterns the fixture can still prove: bucketed co-located
joins (no exchange in the join plan) and salted skew joins (identical
results, hot key spread over n_salts reducers)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from vector_db_handler_spark.operators.skew import salted_join


def _plan(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), "formatted")


def test_bucketed_join_has_no_exchange(spark, sf_dir):
    """Fact-fact joins at 100 TB live or die on co-location: both
    sides bucketed by the join key join WITHOUT any shuffle.
    (Warehouse dir is a static conf set in session.py.)"""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    li.write.bucketBy(8, "l_orderkey").sortBy("l_orderkey").mode("overwrite").saveAsTable(
        "li_bucketed"
    )
    orders.write.bucketBy(8, "o_orderkey").sortBy("o_orderkey").mode("overwrite").saveAsTable(
        "orders_bucketed"
    )
    try:
        j = spark.table("li_bucketed").join(
            spark.table("orders_bucketed"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        plan = _plan(j.select("l_orderkey", "o_totalprice"))
        import re

        assert len(re.findall(r"\(\d+\) Exchange", plan)) == 0, "bucketed join must not shuffle"
        # sanity: result matches the plain join
        assert j.count() == li.join(orders, li.l_orderkey == orders.o_orderkey).count()
    finally:
        spark.sql("DROP TABLE IF EXISTS li_bucketed")
        spark.sql("DROP TABLE IF EXISTS orders_bucketed")


def test_salted_join_matches_plain_join(spark):
    # 90%-skewed left side: one hot key owns most rows.
    left = spark.range(0, 2000).select(
        F.when(F.col("id") < 1800, F.lit(7)).otherwise(F.col("id") % 50).alias("k"),
        F.col("id").alias("payload"),
    )
    right = spark.range(0, 50).select(
        F.col("id").alias("k"), (F.col("id") * 10).alias("rv")
    )
    plain = left.join(right, "k").select("k", "payload", "rv")
    salted = salted_join(left, right, "k", n_salts=8).select("k", "payload", "rv")
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, salted.collect()))


def test_salted_join_spreads_hot_key(spark):
    left = spark.range(0, 1000).select(F.lit(1).alias("k"), F.col("id").alias("p"))
    right = spark.range(0, 2).select(F.lit(1).alias("k"), F.col("id").alias("r"))
    salted = salted_join(left, right, "k", n_salts=8)
    # the single hot key must occupy several distinct salt buckets
    n_buckets = (
        left.withColumn(
            "_salt", F.abs(F.hash(*[F.col(c) for c in left.columns])) % 8
        )
        .select("_salt")
        .distinct()
        .count()
    )
    assert n_buckets >= 4
    assert salted.count() == 2000  # 1000 left rows x 2 right rows

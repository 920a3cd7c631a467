"""HyperLogLog (cross-engine-exact): planted accuracy, duplicate
invariance, register mergeability, small-range linear counting, and
the DuckDB replay.  Staged in r11 for r12 driver registration."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tests.oracle_check import compare
from vector_db_handler_spark import driver_queries as dq
from vector_db_handler_spark.operators.hll import (
    hll_alpha,
    hll_distinct_by_key,
    hll_registers,
)

P = dq._HLL_P  # 64 registers
K = 1 << P
S = 61 - P

#: The registered oracle (moved into driver_queries.py in r12).
ORACLE_SQL = dq._HLL_DISTINCT_SQL


def _df(spark, rows):
    return spark.createDataFrame(rows, "k string, v long")


def test_accuracy_on_planted_cardinalities(spark):
    """5,000 distinct values must estimate within the sketch's
    theoretical band (sigma = 1.04/sqrt(64) ~ 13%; allow 3 sigma)."""
    rows = [("a", v) for v in range(5_000)]
    r = hll_distinct_by_key(_df(spark, rows), "k", "v", p=P).collect()[0]
    assert r["n_exact"] == 5_000
    assert abs(r["est_used"] - 5_000) / 5_000 < 0.39, r


def test_duplicates_never_move_the_estimate(spark):
    """HLL reads the multiset: replicating every row 3x hashes to the
    same registers, so sketch AND estimate are unchanged — the reason
    no distinct pass is needed before the sketch."""
    base = [("a", v) for v in range(500)]
    one = hll_distinct_by_key(_df(spark, base), "k", "v", p=P).collect()[0]
    thrice = hll_distinct_by_key(
        _df(spark, base * 3), "k", "v", p=P
    ).collect()[0]
    assert one == thrice


def test_registers_merge_by_max(spark):
    """Sketching two halves then max-merging the registers equals
    sketching the union — the mergeability a backfill/shard union
    relies on."""
    lo = [("a", v) for v in range(0, 400)]
    hi = [("a", v) for v in range(200, 600)]
    merged = (
        hll_registers(_df(spark, lo), "k", "v", p=P)
        .unionByName(hll_registers(_df(spark, hi), "k", "v", p=P))
        .groupBy("key", "bucket")
        .agg(F.max("m").alias("m"))
    )
    whole = hll_registers(_df(spark, lo + hi), "k", "v", p=P)
    got = {(r["key"], r["bucket"]): r["m"] for r in merged.collect()}
    want = {(r["key"], r["bucket"]): r["m"] for r in whole.collect()}
    assert got == want and len(want) > 0


def test_small_range_switches_to_linear_counting(spark):
    """3 distinct values: raw HLL over-corrects tiny cardinalities, so
    est_used must take the linear-counting branch and land near 3."""
    rows = [("a", v) for v in (1, 2, 3)]
    r = hll_distinct_by_key(_df(spark, rows), "k", "v", p=P).collect()[0]
    assert r["n_zero_buckets"] >= K - 3
    assert r["est_used"] == r["est_lc"]
    assert 1.0 <= r["est_used"] <= 6.0, r


def test_null_keys_and_values_drop_declaratively(spark):
    rows = [("a", 1), (None, 2), ("a", None), ("b", 7)]
    out = {r["key"]: r for r in hll_distinct_by_key(_df(spark, rows), "k", "v").collect()}
    assert set(out) == {"a", "b"}
    assert out["a"]["n_exact"] == 1 and out["b"]["n_exact"] == 1


def test_p_out_of_range_rejected(spark):
    with pytest.raises(ValueError, match="p must be"):
        hll_registers(_df(spark, [("a", 1)]), "k", "v", p=3)
    with pytest.raises(ValueError, match="registers"):
        hll_alpha(8)


def test_cross_engine_oracle_replay(spark, sf_dir, duck):
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    got = hll_distinct_by_key(ev, "event_type", "user_id", p=P).withColumnRenamed(
        "key", "event_type"
    )
    compare(got, duck, ORACLE_SQL)


def test_estimates_are_sane_on_fixture(spark, sf_dir):
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    for r in hll_distinct_by_key(ev, "event_type", "user_id", p=P).collect():
        assert abs(r["est_used"] - r["n_exact"]) / max(r["n_exact"], 1) < 0.39, r

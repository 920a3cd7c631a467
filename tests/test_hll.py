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

P = 6  # 64 registers — the dial the r12 registration will carry
K = 1 << P
S = 61 - P
_NUMER = repr(hll_alpha(K) * (K * K) * float(1 << S))
_L = dq._ilog2_kilo_sql

#: DuckDB twin over events (key=event_type, value=user_id) — the SQL
#: an r12 registration will carry.  Bit-for-bit: 60-bit md5 hash, bit
#: ops for bucket/suffix, exact BIGINT harmonic sum, one shared
#: numerator literal, the fixed-point-log2 linear-counting branch.
ORACLE_SQL = f"""
WITH rows0 AS (
  SELECT event_type AS key,
         {dq._sql_hash("CAST(user_id AS VARCHAR)", 15)} AS h
  FROM events WHERE event_type IS NOT NULL AND user_id IS NOT NULL
),
regs AS (
  SELECT key, h & {K - 1} AS bucket,
         max(CASE WHEN (h >> {P}) = 0 THEN {S}
             ELSE {60 - P} - length(printf('%b', h >> {P})) + 1 END) AS m
  FROM rows0 GROUP BY 1, 2
),
grid AS (
  SELECT k.key, g.bucket
  FROM (SELECT DISTINCT key FROM regs) k, range({K}) AS g(bucket)
),
allregs AS (
  SELECT g.key, COALESCE(r.m, 0) AS m
  FROM grid g LEFT JOIN regs r ON g.key = r.key AND g.bucket = r.bucket
),
agg AS (
  SELECT key,
         CAST(sum(CASE WHEN m = 0 THEN 1 ELSE 0 END) AS BIGINT)
           AS n_zero_buckets,
         CAST(sum(CAST(1 AS BIGINT) << CAST({S} - m AS INT)) AS BIGINT)
           AS sum_scaled
  FROM allregs GROUP BY 1
),
est AS (
  SELECT key, n_zero_buckets, sum_scaled,
         ROUND({_NUMER} / CAST(sum_scaled AS DOUBLE), 6) AS est_raw,
         CASE WHEN n_zero_buckets > 0 THEN
           ROUND((({_L(f"CAST(floor({float(K * (1 << 20))!r} / n_zero_buckets) AS BIGINT)")}
                   / 1024.0 - 20.0) * 0.6931471805599453) * {float(K)!r}, 6)
         END AS est_lc
  FROM agg
),
exact AS (
  SELECT event_type AS key, count(DISTINCT user_id) AS n_exact
  FROM events WHERE event_type IS NOT NULL AND user_id IS NOT NULL
  GROUP BY 1
)
SELECT e.key AS event_type, x.n_exact, e.n_zero_buckets, e.sum_scaled,
       e.est_raw, e.est_lc,
       CASE WHEN e.est_raw <= {2.5 * K!r} AND e.n_zero_buckets > 0
            THEN e.est_lc ELSE e.est_raw END AS est_used
FROM est e JOIN exact x USING (key)
"""


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

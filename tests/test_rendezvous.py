"""Rendezvous (HRW) sharding: minimal-movement guarantee under shard
add/remove, balance, determinism, and the cross-engine DuckDB replay
of the rebalance report.  Staged in r11 for r12 driver registration."""

from __future__ import annotations

import pytest

from tests.oracle_check import compare
from vector_db_handler_spark.operators.layout import (
    rendezvous_assign,
    rendezvous_rebalance_report,
)

#: Shard sets an r12 registration will compare on ``documents``
#: (split s7 off by growing 8 → 9).
SHARDS_BEFORE = [f"s{i}" for i in range(8)]
SHARDS_AFTER = [f"s{i}" for i in range(9)]


def _pick_sql(shards: list[str], alias: str) -> str:
    values = ", ".join(f"('{s}')" for s in sorted(shards))
    return f"""
SELECT doc_id, shard AS {alias} FROM (
  SELECT doc_id, shard,
         row_number() OVER (
           PARTITION BY doc_id
           ORDER BY CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)
                     || '|' || shard), 1, 15) AS BIGINT) DESC,
                    shard DESC) AS rn
  FROM (SELECT doc_id FROM documents), (VALUES {values}) s(shard)
) WHERE rn = 1"""


#: DuckDB twin of the rebalance report — the SQL an r12 registration
#: will carry (argmax via the same 60-bit hash + (score DESC, shard
#: DESC) tie-break the in-row struct max pins).
ORACLE_SQL = f"""
WITH b AS ({_pick_sql(SHARDS_BEFORE, "s_before")}),
a AS ({_pick_sql(SHARDS_AFTER, "s_after")}),
pairs AS (
  SELECT s_before, s_after, count(*) AS n
  FROM b JOIN a USING (doc_id) GROUP BY 1, 2
),
legs AS (
  SELECT s_before AS shard, n AS n_before, 0 AS n_after, 0 AS n_moved_in,
         CASE WHEN s_before != s_after THEN n ELSE 0 END AS n_moved_out
  FROM pairs
  UNION ALL
  SELECT s_after, 0, n,
         CASE WHEN s_before != s_after THEN n ELSE 0 END, 0
  FROM pairs
)
SELECT shard,
       CAST(sum(n_before) AS BIGINT) AS n_before,
       CAST(sum(n_after) AS BIGINT) AS n_after,
       CAST(sum(n_moved_in) AS BIGINT) AS n_moved_in,
       CAST(sum(n_moved_out) AS BIGINT) AS n_moved_out
FROM legs GROUP BY 1
"""


def _ids(spark, n):
    return spark.range(n).withColumnRenamed("id", "doc_id")


def test_adding_a_shard_only_moves_keys_to_it(spark):
    """The HRW property: growing the shard set never moves a key
    between surviving shards — every moved key lands on the new
    shard, and the moved fraction is ~1/(n+1)."""
    rows = {
        r["shard"]: r
        for r in rendezvous_rebalance_report(
            _ids(spark, 2_000), SHARDS_BEFORE, SHARDS_AFTER
        ).collect()
    }
    for s in SHARDS_BEFORE:
        assert rows[s]["n_moved_in"] == 0, rows[s]
    new = rows["s8"]
    assert new["n_before"] == 0 and new["n_moved_in"] == new["n_after"] > 0
    moved = sum(r["n_moved_out"] for r in rows.values())
    assert moved == new["n_after"]
    assert abs(moved / 2_000 - 1 / 9) < 0.05


def test_removing_a_shard_only_moves_its_own_keys(spark):
    rows = {
        r["shard"]: r
        for r in rendezvous_rebalance_report(
            _ids(spark, 2_000), SHARDS_AFTER, SHARDS_BEFORE
        ).collect()
    }
    gone = rows["s8"]
    assert gone["n_after"] == 0 and gone["n_moved_out"] == gone["n_before"] > 0
    for s in SHARDS_BEFORE:
        assert rows[s]["n_moved_out"] == 0


def test_assignment_is_balanced_and_deterministic(spark):
    df = _ids(spark, 4_000)
    counts = {
        r["shard"]: r["n"]
        for r in rendezvous_assign(df, SHARDS_BEFORE)
        .groupBy("shard")
        .count()
        .withColumnRenamed("count", "n")
        .collect()
    }
    assert set(counts) == set(SHARDS_BEFORE)
    for n in counts.values():
        assert abs(n - 500) < 150, counts  # ~6 sigma for binomial(4000, 1/8)
    again = {
        (r["doc_id"], r["shard"])
        for r in rendezvous_assign(df, list(reversed(SHARDS_BEFORE))).collect()
    }
    first = {
        (r["doc_id"], r["shard"])
        for r in rendezvous_assign(df, SHARDS_BEFORE).collect()
    }
    assert again == first  # shard-list order is irrelevant (sorted inside)


def test_bad_shard_lists_rejected(spark):
    df = _ids(spark, 10)
    with pytest.raises(ValueError, match="at least one"):
        rendezvous_assign(df, [])
    with pytest.raises(ValueError, match="duplicate"):
        rendezvous_assign(df, ["a", "a"])


def test_cross_engine_oracle_replay(spark, sf_dir, duck):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    compare(
        rendezvous_rebalance_report(docs, SHARDS_BEFORE, SHARDS_AFTER),
        duck,
        ORACLE_SQL,
    )

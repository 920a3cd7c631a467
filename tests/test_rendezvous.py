"""Rendezvous (HRW) sharding: minimal-movement guarantee under shard
add/remove, balance, determinism, and the cross-engine DuckDB replay
of the rebalance report.  Staged in r11 for r12 driver registration."""

from __future__ import annotations

import pytest

from tests.oracle_check import compare
from vector_db_handler_spark import driver_queries as dq
from vector_db_handler_spark.operators.layout import (
    rendezvous_assign,
    rendezvous_rebalance_report,
)

#: The registered shard sets + oracle (moved into
#: driver_queries.py in r12).
SHARDS_BEFORE = dq._RDV_SHARDS_BEFORE
SHARDS_AFTER = dq._RDV_SHARDS_AFTER
ORACLE_SQL = dq._RENDEZVOUS_SQL


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

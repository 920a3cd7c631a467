"""Min/max file-skipping audit: hand-checkable pruning decisions,
z-beats-hash on range predicates, edge semantics, and the
cross-engine DuckDB replay over orders (custkey × order-day).
Staged in r12 for r13 driver registration."""

from __future__ import annotations

import pytest

from tests.oracle_check import compare
from vector_db_handler_spark import driver_queries as dq
from vector_db_handler_spark.operators.layout import minmax_pruning_report

SHIFT = dq._MM_SHIFT
PREDICATES = dq._MM_PREDICATES

#: Registered in r13 — SQL lives in driver_queries (one source of
#: truth; this module replays it cross-engine at fixture scale).
ORACLE_SQL = dq._MINMAX_PRUNING_SQL


def _df(spark, rows):
    return spark.createDataFrame(rows, "x long, y long")


def test_hand_checkable_pruning(spark):
    """Two well-separated value clusters: a predicate over one
    cluster must scan ONLY that cluster's z-buckets, and the exact
    matching count comes back right."""
    rows = [(i, i) for i in range(0, 50)] + [(i, i) for i in range(10_000, 10_050)]
    out = {
        r["pred_id"]: r
        for r in minmax_pruning_report(
            _df(spark, rows), "x", "y",
            [("low", 0, 49, 0, 49), ("high", 10_000, 10_049, 10_000, 10_049)],
            bucket_shift=10,
        ).collect()
    }
    for pid in ("low", "high"):
        r = out[pid]
        assert r["rows_matching"] == 50
        assert r["rows_scanned_z"] == 50          # perfect skip
        assert r["n_kept_z"] < r["n_buckets_z"]
    assert out["low"]["n_rows_total"] == 100


def test_z_beats_hash_on_range_predicates(spark):
    """The point of clustering: on a range predicate the z layout
    scans a strict subset of what the hash layout scans (hash
    buckets all span the full value range, so nothing prunes)."""
    rows = [((i * 7) % 1000, (i * 13) % 1000) for i in range(4000)]
    out = minmax_pruning_report(
        _df(spark, rows), "x", "y", [("band", 0, 99, 0, 999)],
        bucket_shift=12,
    ).collect()[0]
    assert out["rows_scanned_z"] < out["rows_scanned_hash"]
    assert out["skip_ratio_z"] > out["skip_ratio_hash"]
    # hash buckets span near-full value ranges, so pruning is rare
    # luck (small buckets), never the rule: z must keep strictly fewer
    assert out["n_kept_z"] < out["n_kept_hash"]
    assert out["rows_scanned_z"] >= out["rows_matching"]  # never false-skips


def test_empty_predicate_box_scans_nothing_matching(spark):
    rows = [(i, i) for i in range(100)]
    out = minmax_pruning_report(
        _df(spark, rows), "x", "y", [("miss", 5_000, 6_000, 5_000, 6_000)],
        bucket_shift=10,
    ).collect()[0]
    assert out["rows_matching"] == 0
    assert out["rows_scanned_z"] == 0 and out["n_kept_z"] == 0


def test_predicates_validated(spark):
    df = _df(spark, [(1, 1)])
    with pytest.raises(ValueError, match="at least one"):
        minmax_pruning_report(df, "x", "y", [])
    with pytest.raises(ValueError, match="duplicate"):
        minmax_pruning_report(
            df, "x", "y", [("a", 0, 1, 0, 1), ("a", 2, 3, 2, 3)]
        )


def test_null_rows_drop_declaratively(spark):
    rows = [(1, 1), (None, 2), (3, None)]
    df = spark.createDataFrame(rows, "x long, y long")
    out = minmax_pruning_report(
        df, "x", "y", [("all", 0, 10, 0, 10)], bucket_shift=4
    ).collect()[0]
    assert out["n_rows_total"] == 1 and out["rows_matching"] == 1


def test_cross_engine_oracle_replay(spark, sf_dir, duck):
    from pyspark.sql import functions as F

    orders = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        F.col("o_custkey").cast("long").alias("ck"),
        F.datediff(
            F.col("o_orderdate").cast("date"), F.lit("1995-01-01").cast("date")
        )
        .cast("long")
        .alias("days"),
    )
    got = minmax_pruning_report(
        orders, "ck", "days", PREDICATES, bucket_shift=SHIFT
    )
    compare(got, duck, ORACLE_SQL)

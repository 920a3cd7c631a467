"""Classical additive seasonal decomposition in exact integer
micro-units: planted trend+seasonal recovery, edge conventions, the
additive identity, and the cross-engine DuckDB replay.  Staged for
r11 driver registration."""

from __future__ import annotations

import datetime as dt

import pytest

from tests.oracle_check import compare
from vector_db_handler_spark import driver_queries as dq
from vector_db_handler_spark.operators.timeseries import (
    seasonal_decompose_daily,
)

#: The registration's oracle IS this test's oracle (one source of
#: truth since the r11 registration); kept here only as the import.
#: dayofweek differs by one between engines (DuckDB 0=Sun..6, Spark
#: 1=Sun..7): the oracle's +1 aligns the slot ids, and both engines
#: truncate integer division toward zero (pinned by
#: test_property_timeseries).
ORACLE_SQL = dq._SEASONAL_SQL


def _series(spark, rows):
    return spark.createDataFrame(
        rows, "event_type string, ts timestamp, value double"
    )


def test_planted_weekly_pattern_is_recovered(spark):
    """A flat level 100 plus +7 on one weekday: trend must sit at the
    weekly mean (100 + 1 micro-exactly), the spiked slot's seasonal
    component must be positive and every other slot's negative, and
    value = trend + seasonal + residual wherever trend exists."""
    base = dt.datetime(2024, 3, 4)  # a Monday
    rows = []
    for d in range(28):
        v = 107.0 if d % 7 == 0 else 100.0
        rows.append(("a", base + dt.timedelta(days=d), v))
    out = {
        r["day"]: r
        for r in seasonal_decompose_daily(_series(spark, rows)).collect()
    }
    assert len(out) == 28
    mid = [r for r in out.values() if r["trend_micro"] is not None]
    assert len(mid) == 28 - 6  # 3-day edges on each side are NULL
    for r in mid:
        assert r["trend_micro"] == 101_000_000  # (6*100 + 107) / 7
        assert (
            r["value_micro"]
            == r["trend_micro"] + r["seasonal_micro"] + r["residual_micro"]
        )
    spiked = [r for r in mid if r["value_micro"] == 107_000_000]
    flat = [r for r in mid if r["value_micro"] == 100_000_000]
    assert all(r["seasonal_micro"] > 0 for r in spiked)
    assert all(r["seasonal_micro"] < 0 for r in flat)


def test_gap_days_are_true_zeros_and_nulls_drop(spark):
    base = dt.datetime(2024, 3, 4)
    rows = [
        ("a", base, 5.0),
        ("a", base + dt.timedelta(days=9), 5.0),  # 8-day gap
        (None, base, 99.0),  # null key: dropped
        ("b", None, 99.0),  # null ts: dropped
    ]
    out = seasonal_decompose_daily(_series(spark, rows)).collect()
    keys = {r["event_type"] for r in out}
    assert keys == {"a"}
    assert len(out) == 10  # dense spine
    by_day = {r["day"]: r["value_micro"] for r in out}
    assert sum(1 for v in by_day.values() if v == 0) == 8


def test_even_or_tiny_period_rejected(spark):
    docs = _series(spark, [("a", dt.datetime(2024, 3, 4), 1.0)])
    with pytest.raises(ValueError, match="odd"):
        seasonal_decompose_daily(docs, period=6)
    with pytest.raises(ValueError, match="odd"):
        seasonal_decompose_daily(docs, period=1)


def test_cross_engine_oracle_replay(spark, sf_dir, duck):
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    compare(seasonal_decompose_daily(ev), duck, ORACLE_SQL)

"""Full CUBE over (day, type, cohort): all 8 grouping sets in one
pass, GROUPING-marked subtotals (NULL details stay distinct),
marginal-consistency identities, and the cross-engine DuckDB replay.
Staged in r12 for r13 driver registration."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from tests.oracle_check import compare
from vector_db_handler_spark.operators.timeseries import (
    cube_by_day_type_source,
)

from vector_db_handler_spark import driver_queries as dq

#: Registered in r13 — SQL lives in driver_queries (one source of
#: truth; this module replays it cross-engine at fixture scale).
ORACLE_SQL = dq._CUBE_SQL


def _events(spark, rows):
    return spark.createDataFrame(
        rows, "ts timestamp, event_type string, user_bucket string, value double"
    )


def _t(day):
    return dt.datetime(2024, 4, 1) + dt.timedelta(days=day)


def test_all_eight_grouping_sets_present(spark):
    rows = [
        (_t(0), "click", "0", 1.0),
        (_t(0), "view", "1", 2.0),
        (_t(1), "click", "0", 3.0),
    ]
    out = cube_by_day_type_source(_events(spark, rows)).collect()
    assert {r["grouping_id"] for r in out} == set(range(8))


def test_grand_total_and_marginal_identities(spark):
    rows = [
        (_t(d % 3), "t" + str(d % 2), str(d % 2), float(d)) for d in range(30)
    ]
    out = cube_by_day_type_source(_events(spark, rows)).collect()
    grand = [r for r in out if r["grouping_id"] == 7]
    assert len(grand) == 1 and grand[0]["n_events"] == 30
    # cross-marginal: summing (ALL, type, bucket) cells over type
    # must give (ALL, ALL, bucket)
    by_tb = {}
    for r in out:
        if r["grouping_id"] == 4:  # day=ALL, type & bucket detail
            by_tb[(r["event_type"], r["user_bucket"])] = r["n_events"]
    for r in out:
        if r["grouping_id"] == 6:  # day=ALL, type=ALL, bucket detail
            assert r["n_events"] == sum(
                n for (t, b), n in by_tb.items() if b == r["user_bucket"]
            )


def test_null_detail_stays_distinct_from_subtotal(spark):
    rows = [(_t(0), None, "0", 1.0), (_t(0), "click", "0", 2.0)]
    out = cube_by_day_type_source(_events(spark, rows)).collect()
    detail = [r for r in out if r["grouping_id"] == 0]
    types = {r["event_type"] for r in detail}
    assert None in types and "click" in types  # NULL is a real group
    sub = [
        r for r in out if r["grouping_id"] == 2 and r["user_bucket"] == "0"
        and r["day"] != "ALL"
    ]
    assert len(sub) == 1 and sub[0]["n_events"] == 2  # subtotal merges both


def test_cross_engine_oracle_replay(spark, sf_dir, duck):
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").withColumn(
        "user_bucket", (F.col("user_id") % 4).cast("string")
    )
    compare(cube_by_day_type_source(ev), duck, ORACLE_SQL)

"""Watermark late-data audit: hand-computed lateness, the ordered
no-late edge, bucket-width invariance (pins the distributed
prefix-max decomposition), and the cross-engine DuckDB replay over
events with deterministically synthesized arrival disorder.  Staged
in r12 for r13 driver registration."""

from __future__ import annotations

import datetime as dt

from tests.oracle_check import compare
from vector_db_handler_spark.operators.windows import watermark_late_audit

from vector_db_handler_spark import driver_queries as dq

DELAY = dq._WM_DELAY_SEC

#: Registered in r13 — SQL lives in driver_queries (one source of
#: truth; this module replays it cross-engine at fixture scale).
ORACLE_SQL = dq._WATERMARK_AUDIT_SQL


def _events(spark, rows):
    return spark.createDataFrame(
        rows, "event_id long, arrival_seq long, ts timestamp"
    )


def _t(minute):
    return dt.datetime(2024, 5, 1) + dt.timedelta(minutes=minute)


def test_hand_computed_lateness(spark):
    """Arrival order 1,2,3,4 but event 3 carries OLD event time: with
    delay 10 min and the max having advanced to t=60, an event at
    t=20 is 30 min late (wm = 60-10 = 50; lateness = 30 min)."""
    rows = [
        (1, 1, _t(0)),
        (2, 2, _t(60)),
        (3, 3, _t(20)),   # late: wm = 60' - 10' = 50' > 20'
        (4, 4, _t(61)),
    ]
    out = watermark_late_audit(
        _events(spark, rows), delay_sec=600, unit="day"
    ).collect()
    assert len(out) == 1
    r = out[0]
    assert (r["n_total"], r["n_late"], r["n_accepted"]) == (4, 1, 3)
    assert r["max_lateness_us"] == 30 * 60 * 1_000_000


def test_ordered_arrivals_never_late(spark):
    rows = [(i, i, _t(i)) for i in range(50)]
    out = watermark_late_audit(_events(spark, rows), delay_sec=0).collect()
    assert all(r["n_late"] == 0 for r in out)
    assert sum(r["n_accepted"] for r in out) == 50


def test_delay_dial_absorbs_disorder(spark):
    """An event 10 minutes out of order is late under delay=5min and
    accepted under delay=15min — the dial the audit exists to tune."""
    rows = [(1, 1, _t(0)), (2, 2, _t(30)), (3, 3, _t(20)), (4, 4, _t(31))]
    tight = watermark_late_audit(_events(spark, rows), delay_sec=300).collect()[0]
    loose = watermark_late_audit(_events(spark, rows), delay_sec=900).collect()[0]
    assert tight["n_late"] == 1 and loose["n_late"] == 0


def test_bucket_width_invariance(spark):
    """The distributed two-level prefix max must equal the global
    running max for ANY bucket width — including width 1 (every row
    its own bucket) and one giant bucket."""
    rows = [
        (i, (i * 37) % 101, _t((i * 13) % 200)) for i in range(101)
    ]
    outs = [
        sorted(
            map(
                tuple,
                watermark_late_audit(
                    _events(spark, rows), delay_sec=1200, bucket_width=wdt
                ).collect(),
            )
        )
        for wdt in (1, 7, 1_000_000)
    ]
    assert outs[0] == outs[1] == outs[2]


def test_null_rows_drop_declaratively(spark):
    rows = [(1, 1, _t(0)), (2, None, _t(1)), (None, 3, _t(2)), (4, 4, None)]
    out = watermark_late_audit(_events(spark, rows)).collect()
    assert sum(r["n_total"] for r in out) == 1


def test_cross_engine_oracle_replay(spark, sf_dir, duck):
    from pyspark.sql import functions as F

    ev = spark.read.parquet(f"{sf_dir}/events.parquet").withColumn(
        "arrival_seq",
        F.col("event_id")
        + F.when(F.col("event_id") % 7 == 0, F.lit(500)).otherwise(F.lit(0)),
    )
    got = watermark_late_audit(ev, delay_sec=DELAY)
    compare(got, duck, ORACLE_SQL)


def test_planted_disorder_is_caught_on_fixture(spark, sf_dir):
    from pyspark.sql import functions as F

    ev = spark.read.parquet(f"{sf_dir}/events.parquet").withColumn(
        "arrival_seq",
        F.col("event_id")
        + F.when(F.col("event_id") % 7 == 0, F.lit(500)).otherwise(F.lit(0)),
    )
    out = watermark_late_audit(ev, delay_sec=DELAY).collect()
    n_late = sum(r["n_late"] for r in out)
    # every displaced event (id % 7 == 0, ~1/7 of the corpus) whose
    # 500-position displacement exceeds one hour of event time is late
    assert n_late > 0
    n_total = sum(r["n_total"] for r in out)
    assert n_late < n_total * 0.25  # only the planted fraction

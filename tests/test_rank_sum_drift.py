"""Mann-Whitney U rank-sum drift: exact doubled-rank identity, the
planted location-shift semantics, and the cross-engine DuckDB replay.
Staged for r10 driver registration."""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.oracle_check import compare
from vector_db_handler_spark import driver_queries as dq
from vector_db_handler_spark.operators.features import rank_sum_drift

#: The REGISTERED oracle (driver_queries is the single source of truth
#: since the r10 registration).
ORACLE_SQL = dq._RANK_SUM_SQL



def _events(spark, rows):
    return spark.createDataFrame(
        rows, "grp string, value double, ts timestamp"
    ).select(
        "grp", "value", F.col("ts")
    )


def _ts(h):
    return f"2024-03-01 {h:02d}:00:00"


def test_planted_shift_vs_stationary(spark):
    """A group whose values jump in its second half must score AUC near
    0 (first-half values rank LOWER); a stationary group sits at 0.5;
    the doubled-rank identity holds exactly under heavy ties."""
    import datetime as dt

    def t(h):
        return dt.datetime(2024, 3, 1, h)

    rows = []
    # shifted: first half values 1..6, second half 101..106
    for i in range(6):
        rows.append(("shifted", 1.0 + i, t(i)))
        rows.append(("shifted", 101.0 + i, t(18 + i)))
    # stationary with heavy ties: same multiset both halves
    for i in range(6):
        rows.append(("flat", float(i % 2), t(i)))
        rows.append(("flat", float(i % 2), t(18 + i)))
    out = {
        r["grp"]: r
        for r in rank_sum_drift(
            spark.createDataFrame(rows, "grp string, value double, ts timestamp"),
            "grp",
            "value",
            "ts",
        ).collect()
    }
    sh, fl = out["shifted"], out["flat"]
    assert (sh["n1"], sh["n2"]) == (6, 6)
    assert sh["auc"] == 0.0  # every first-half value below every second
    assert fl["auc"] == 0.5  # identical multisets -> exactly 1/2
    for r in (sh, fl):
        assert r["u2_first"] + r["u2_second"] == 2 * r["n1"] * r["n2"]


def test_single_timestamp_group_reports_null_auc(spark):
    import datetime as dt

    one = spark.createDataFrame(
        [("solo", 5.0, dt.datetime(2024, 3, 1))] * 3,
        "grp string, value double, ts timestamp",
    )
    r = rank_sum_drift(one, "grp", "value", "ts").collect()[0]
    assert r["n2"] == 0 and r["auc"] is None


def test_cross_engine_oracle_replay(spark, sf_dir, duck):
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    compare(
        rank_sum_drift(ev, "event_type", "value", "ts"), duck, ORACLE_SQL
    )

"""Relation profiler: exactness, null accounting, and the single-scan
plan claim."""

from __future__ import annotations

from pyspark.sql import functions as F

from vector_db_handler_spark.operators.profile import profile_relation


def test_profile_exact_stats_with_nulls(spark):
    df = spark.createDataFrame(
        [(1, "a"), (2, "bb"), (3, None), (4, "bb")],
        "id long, s string",
    )
    got = {r.col_name: r for r in profile_relation(df, ["id", "s"]).collect()}
    assert got["id"].n_rows == 4 and got["id"].n_null == 0
    assert got["id"].n_distinct == 4
    assert (got["id"].min_value, got["id"].max_value) == ("1", "4")
    s = got["s"]
    assert (s.n_null, s.n_distinct) == (1, 2)
    assert (s.min_value, s.max_value) == ("a", "bb")
    assert s.sum_len == 1 + 2 + 2


def test_profile_is_one_scan(spark, sf_dir):
    from vector_db_handler_spark.sources.tables import load_table

    ev = load_table(spark, sf_dir, "events")
    plan = (
        profile_relation(ev, ["event_id", "event_type", "props", "user_id"])
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("FileScan") == 1, plan[:500]
    assert "Generate stack" in plan  # the unpivot (no per-column scans)

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


# ---------------------------------------------------------------------------
# join_size_estimate
# ---------------------------------------------------------------------------

import pytest as _pytest

from vector_db_handler_spark.operators.profile import join_size_estimate


def test_join_size_estimate_unbiased_on_skewed_join(spark):
    """Skewed join (one hot key with 200×50 fan-out): a large
    coordinated sample must land within 3× of the exact size, and
    rate_denom=1 must be EXACT (every key survives)."""
    a_rows = [(f"hot",)] * 200 + [(f"a{i}",) for i in range(400)]
    b_rows = [(f"hot",)] * 50 + [(f"a{i}",) for i in range(400)]
    a = spark.createDataFrame(a_rows, "k string")
    b = spark.createDataFrame(b_rows, "k string")
    exact = a.join(b, "k").count()

    r1 = join_size_estimate(a, b, "k", "k", rate_denom=1).collect()[0]
    assert r1.est_pairs == exact == r1.sample_pairs

    r4 = join_size_estimate(a, b, "k", "k", rate_denom=4).collect()[0]
    assert r4.est_pairs == r4.sample_pairs * 4
    # the cut is a pure function of the key — replay it exactly
    import hashlib
    from collections import Counter

    def h60(s):
        return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)

    cut = (1 << 60) // 4
    ca = Counter(k for (k,) in a_rows if h60(k) < cut)
    cb = Counter(k for (k,) in b_rows if h60(k) < cut)
    want = sum(ca[k] * cb[k] for k in ca)
    assert r4.sample_pairs == want


def test_join_size_estimate_deterministic_and_guarded(spark):
    a = spark.createDataFrame([(i,) for i in range(500)], "k long")
    r = [
        tuple(join_size_estimate(a, a, "k", "k", 16).collect()[0])
        for _ in range(2)
    ]
    assert r[0] == r[1]
    with _pytest.raises(ValueError):
        join_size_estimate(a, a, "k", "k", 0)

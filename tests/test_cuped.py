"""CUPED variance-reduced experiment readout: planted
covariate-correlation semantics (adjustment removes pre-period
imbalance), theta arithmetic against a literal replay, edge
conventions, and the cross-engine DuckDB replay.  Staged in r11 for
r12 driver registration."""

from __future__ import annotations

import datetime as dt

from tests.oracle_check import compare
from vector_db_handler_spark import driver_queries as dq
from vector_db_handler_spark.operators.features import cuped_adjusted_metrics

#: The registered oracle (moved into driver_queries.py in r12; the
#: degenerate-population theta guard landed in the same move).
ORACLE_SQL = dq._CUPED_SQL


def _events(spark, rows):
    return spark.createDataFrame(
        rows, "user_id long, ts timestamp, value double"
    )


def _t(day):
    return dt.datetime(2024, 3, 1) + dt.timedelta(days=day)


def test_adjustment_removes_planted_preperiod_imbalance(spark):
    """Users whose post value EQUALS their pre value (theta = 1): the
    adjusted means of both variants must coincide at the population
    post mean even though raw means differ — the whole point of
    CUPED.  Users are constructed so the hash split puts high-value
    users unevenly across variants."""
    rows = []
    for u in range(40):
        base = 10.0 + (u % 7) * 5.0
        rows.append((u, _t(0), base))   # pre
        rows.append((u, _t(10), base))  # post == pre  => Y = X exactly
    out = {r["variant"]: r for r in cuped_adjusted_metrics(_events(spark, rows)).collect()}
    assert len(out) == 2
    a, b = out[0], out[1]
    assert abs(a["theta"] - 1.0) < 1e-6
    # adjusted means agree to float noise even if raw means differ
    assert abs(a["adj_mean_y"] - b["adj_mean_y"]) < 1e-6
    pop_mean = sum(10.0 + (u % 7) * 5.0 for u in range(40)) / 40
    assert abs(a["adj_mean_y"] - pop_mean) < 1e-6


def test_theta_matches_literal_replay(spark):
    rows = [
        (1, _t(0), 4.0), (1, _t(10), 9.0),
        (2, _t(0), 2.0), (2, _t(10), 3.0),
        (3, _t(0), 8.0), (3, _t(10), 15.0),
        (4, _t(10), 1.0),  # post-only user: X = 0
    ]
    out = cuped_adjusted_metrics(_events(spark, rows)).collect()
    xs = {1: 4_000_000, 2: 2_000_000, 3: 8_000_000, 4: 0}
    ys = {1: 9_000_000, 2: 3_000_000, 3: 15_000_000, 4: 1_000_000}
    n = 4
    sx, sy = sum(xs.values()), sum(ys.values())
    sxy = sum(xs[u] * ys[u] for u in xs)
    sxx = sum(x * x for x in xs.values())
    want = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    for r in out:
        assert abs(r["theta"] - round(want, 6)) < 1e-9
    assert sum(r["n_users"] for r in out) == 4


def test_null_rows_drop_declaratively(spark):
    rows = [
        (1, _t(0), 5.0), (1, _t(10), 5.0),
        (None, _t(0), 9.0), (2, None, 9.0), (3, _t(5), None),
        (4, _t(0), 1.0), (4, _t(10), 2.0),
    ]
    out = cuped_adjusted_metrics(_events(spark, rows)).collect()
    assert sum(r["n_users"] for r in out) == 2


def test_cross_engine_oracle_replay(spark, sf_dir, duck):
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    compare(cuped_adjusted_metrics(ev), duck, ORACLE_SQL)


def test_degenerate_population_falls_back_to_unadjusted_mean(spark):
    """Zero pre-period variance (every user's X identical — here 0,
    post-only users) makes n·Σxx − Σx² = 0: θ must degrade to 0 and
    adj_mean_y to the plain mean instead of NaN (r11 ADVICE)."""
    rows = []
    for u in range(6):
        rows.append((u, _t(0), 5.0))            # identical pre value
        rows.append((u, _t(10), 4.0 + u))        # varying post value
    out = cuped_adjusted_metrics(_events(spark, rows)).collect()
    assert out, "degenerate population must still produce a readout"
    for r in out:
        assert r["theta"] == 0.0
        assert r["adj_mean_y"] == r["mean_y"] > 0.0

"""Property-based checks (hypothesis): the distributed time-series
joins agree with brute-force per-row reference semantics on arbitrary
small inputs — ties, duplicates, empty sides, and window-boundary gaps
included.  The oracle queries pin one fixture; these pin the operator
CONTRACT over the input space."""

from __future__ import annotations

from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

from vector_db_handler_spark.operators import timeseries as ts_ops

# Small domains force collisions: repeated keys, equal timestamps,
# gaps exactly at the window edge.
_KEYS = st.integers(min_value=0, max_value=2)
_US = st.integers(min_value=0, max_value=20)
_VAL = st.integers(min_value=-5, max_value=5)

_LEFT = st.lists(st.tuples(_KEYS, _US), min_size=0, max_size=12)
_RIGHT = st.lists(st.tuples(_KEYS, _US, _VAL), min_size=0, max_size=12)


def _ts_df(spark, rows, cols):
    df = spark.createDataFrame(rows, cols)
    return df.withColumn("ts", F.timestamp_micros(F.col("us"))).drop("us")


@settings(max_examples=10, deadline=None)
@given(left=_LEFT, right=_RIGHT)
def test_asof_join_matches_bruteforce(spark, left, right):
    left = [(k, u, i) for i, (k, u) in enumerate(left)]
    ldf = _ts_df(spark, left or [(0, 0, 0)], ["k", "us", "rid"])
    if not left:
        ldf = ldf.limit(0)
    rdf = _ts_df(spark, right or [(0, 0, 0)], ["k", "us", "v"])
    if not right:
        rdf = rdf.limit(0)

    got = {
        r["rid"]: (r["asof_val"], r["asof_us"])
        for r in ts_ops.asof_join(ldf, rdf, "k", "ts", "v").collect()
    }

    for k, lus, rid in left:
        cand = [(ru, rv) for rk, ru, rv in right if rk == k and ru <= lus]
        if not cand:
            assert got[rid] == (None, None)
        else:
            best_us = max(ru for ru, _ in cand)
            # duplicate (key, ts) right rows dedup to max(val)
            best_val = max(rv for ru, rv in cand if ru == best_us)
            assert got[rid] == (best_val, best_us)
    assert len(got) == len(left)


@settings(max_examples=10, deadline=None)
@given(events=st.lists(st.tuples(_KEYS, _US), min_size=0, max_size=14),
       window_us=st.integers(min_value=1, max_value=8))
def test_range_join_pairs_matches_bruteforce(spark, events, window_us):
    rows = [(k, u * 1_000_000, i) for i, (k, u) in enumerate(events)]
    df = _ts_df(spark, rows or [(0, 0, 0)], ["user_id", "us", "event_id"])
    if not rows:
        df = df.limit(0)

    got = {
        (r["user_id"], r["id1"], r["id2"], r["gap_us"])
        for r in ts_ops.range_join_pairs(df, window_sec=window_us).collect()
    }

    want = set()
    for k1, u1, i1 in rows:
        for k2, u2, i2 in rows:
            ordered = u1 < u2 or (u1 == u2 and i1 < i2)
            if k1 == k2 and ordered and 0 <= u2 - u1 <= window_us * 1_000_000:
                want.add((k1, i1, i2, u2 - u1))
    assert got == want


# --- gap-fill + EWMA ---------------------------------------------------------

_DAYS = st.integers(min_value=0, max_value=15)
_MICRO = st.integers(min_value=-3_000_000, max_value=3_000_000)
_SERIES = st.lists(st.tuples(_KEYS, _DAYS, _MICRO), min_size=1, max_size=16)


def _series_df(spark, rows):
    data = [
        (int(k), f"2024-03-{d + 1:02d} 12:00:00", m / 1e6)
        for k, d, m in rows
    ]
    return spark.createDataFrame(
        data, "user_id long, ts_s string, value double"
    ).select("user_id", F.col("ts_s").cast("timestamp").alias("ts"), "value")


@settings(max_examples=15, deadline=None)
@given(rows=_SERIES)
def test_gapfill_is_dense_and_mass_preserving(spark, rows):
    """The filled series has EXACTLY (max-min+1) consecutive days per
    key, and its total day_value equals the exact decimal sum of the
    raw values (zero-fill adds no mass)."""
    df = _series_df(spark, rows)
    out = ts_ops.gapfill_daily(df).collect()
    by_key: dict[int, list] = {}
    for r in out:
        by_key.setdefault(r.user_id, []).append(r)
    import datetime as dt
    from decimal import Decimal

    for k, rs in by_key.items():
        days = sorted(r.day for r in rs)
        assert days[-1] - days[0] == dt.timedelta(days=len(days) - 1)
        assert len(set(days)) == len(days)
        raw = sum(
            Decimal(m) for kk, d, m in rows if kk == k
        )  # micro-units, exact
        got = sum(Decimal(str(r.day_value)) * 1_000_000 for r in rs)
        assert got == raw
        for r in rs:
            assert r.is_gap == (r.n_events == 0)


@settings(max_examples=15, deadline=None)
@given(rows=_SERIES)
def test_ewma_matches_pure_python_reference(spark, rows):
    """ewma_num equals the literal truncated convolution computed in
    arbitrary-precision Python over the same dense series."""
    df = _series_df(spark, rows)
    gf = ts_ops.gapfill_daily(df)
    got = {
        (r.user_id, str(r.day)): r.ewma_num for r in ts_ops.ewma_daily(gf).collect()
    }
    dense: dict[int, list] = {}
    for r in sorted(gf.collect(), key=lambda r: (r.user_id, r.day)):
        dense.setdefault(r.user_id, []).append(
            (str(r.day), int(r.day_value * 1_000_000))
        )
    for k, series in dense.items():
        micros = [m for _, m in series]
        for t, (day, _) in enumerate(series):
            want = sum(
                micros[t - j] * (1 << (15 - j)) for j in range(16) if t - j >= 0
            )
            assert got[(k, day)] == want, (k, day)


# ---------------------------------------------------------------------------
# theil_sen_daily
# ---------------------------------------------------------------------------

from decimal import Decimal

from pyspark.sql import functions as F

from vector_db_handler_spark.operators.timeseries import TS_SCALE, theil_sen_daily


def _daily(spark, rows):
    """rows: (user, day_str, value)"""
    return spark.createDataFrame(
        rows, "user_id long, day string, day_value decimal(18,6)"
    ).select("user_id", F.col("day").cast("date").alias("day"), "day_value")


def test_theil_sen_exact_linear_series(spark):
    """A perfectly linear series (+2.5/day) has EVERY pairwise slope
    equal, so the median is exact: 2.5 per day."""
    rows = [
        (1, f"2024-01-{d:02d}", Decimal(str(2.5 * d))) for d in range(1, 9)
    ]
    out = theil_sen_daily(_daily(spark, rows)).collect()[0]
    assert out.n_days == 8 and out.n_pairs == 28
    assert out.slope_scaled == 2_500_000 * TS_SCALE // 1
    assert out.slope_per_day == 2.5


def test_theil_sen_robust_to_one_corrupt_day(spark):
    """Linear +1/day with one day spiked ×1000: OLS slope flips scale;
    the Theil-Sen median stays ~1/day (most pairs avoid the spike)."""
    rows = []
    for d in range(1, 12):
        v = 1000.0 if d == 6 else float(d)
        rows.append((1, f"2024-01-{d:02d}", Decimal(str(v))))
    out = theil_sen_daily(_daily(spark, rows)).collect()[0]
    assert abs(out.slope_per_day - 1.0) < 0.2


def test_theil_sen_matches_python_reference(spark):
    """Arbitrary-precision replay of quantized slopes + lower median
    (including negative slopes — both engines truncate toward zero)."""
    vals = [5.0, 3.5, 9.25, 1.0, 7.75, 2.0, 8.5]
    rows = [(1, f"2024-02-{d + 1:02d}", Decimal(str(v))) for d, v in enumerate(vals)]
    out = theil_sen_daily(_daily(spark, rows)).collect()[0]

    micro = [int(Decimal(str(v)) * 1_000_000) for v in vals]
    slopes = []
    for i in range(len(vals)):
        for j in range(i + 1, len(vals)):
            num = (micro[j] - micro[i]) * TS_SCALE
            den = j - i
            q = abs(num) // den  # truncation toward zero, sign restored
            slopes.append(q if num >= 0 else -q)
    slopes.sort()
    want = slopes[(len(slopes) + 1) // 2 - 1]
    assert out.slope_scaled == want


# ---------------------------------------------------------------------------
# cusum_alarms_daily
# ---------------------------------------------------------------------------

from vector_db_handler_spark.operators.timeseries import cusum_alarms_daily


def test_cusum_matches_recurrence_reference(spark):
    """The window identity S_i = P_i − min(0, min P_j) must equal the
    textbook recurrence S_i = max(0, S_{i−1} + d_i) — replayed in
    arbitrary precision, including a planted level shift that alarms."""
    vals = [10.0] * 6 + [60.0] * 4  # shift up at day 7
    rows = [(1, f"2024-03-{d + 1:02d}", Decimal(str(v))) for d, v in enumerate(vals)]
    out = cusum_alarms_daily(_daily(spark, rows)).collect()[0]

    micro = [int(Decimal(str(v)) * 1_000_000) for v in vals]
    med = sorted(micro)[(len(micro) + 1) // 2 - 1]
    slack = (med * 20) // 100
    h = (med * 300) // 100
    s, alarms, first = 0, 0, None
    for d, m in enumerate(micro):
        s = max(0, s + (m - med - slack))
        if s > h:
            alarms += 1
            first = first or f"2024-03-{d + 1:02d}"
    assert out.baseline_micro == med
    assert out.n_alarm_days == alarms > 0
    assert out.first_alarm_day == first


def test_cusum_stable_series_never_alarms(spark):
    rows = [(1, f"2024-03-{d + 1:02d}", Decimal("10.0")) for d in range(10)]
    out = cusum_alarms_daily(_daily(spark, rows)).collect()[0]
    assert out.n_alarm_days == 0
    assert out.first_alarm_day == "none"

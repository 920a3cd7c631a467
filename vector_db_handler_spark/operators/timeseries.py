"""Time-series operators Spark lacks natively: as-of join, banded
range join, and hierarchical rollup.

No analog in the reference (purely request/response point ops, SURVEY
§2.4); these are the time-series primitives a training-data pipeline
needs over event streams (session stitching, impression→conversion
attribution, multi-granularity feature tables).

All three are compositions of stock DataFrame ops — no custom
physical operators:

* **as-of join** — the classic union-tag trick: append right rows to
  the left with a tag, sort per key by (ts, tag), carry the latest
  right value forward with ``last(ignorenulls)``.  ONE shuffle on the
  key; no range predicate ever reaches a join, so there's no
  cartesian blow-up to fight.  (DuckDB's native ``ASOF JOIN`` is the
  oracle twin.)
* **range join** — equi-join on (key, time-bucket) with the left side
  exploded into the two candidate buckets, then an exact band filter.
  Turns an inequality join (which Spark would plan as
  BroadcastNestedLoop) into a hash join with bounded per-bucket
  fan-out.
* **rollup** — ``DataFrame.rollup``: Catalyst expands grouping sets
  in one pass (partial aggregation per set), instead of a UNION ALL
  of per-granularity scans.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window as W


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key_col: str,
    ts_col: str,
    right_val_col: str,
) -> DataFrame:
    """For each left row: the right row with the greatest ``ts <=
    left.ts`` for the same key (``>=`` tie: right rows at the exact
    left timestamp DO match, like DuckDB ``ASOF ... ON l.ts >= r.ts``).

    Right rows are pre-deduplicated to one value per (key, ts) —
    ``max(right_val_col)`` — so ties resolve identically in any
    engine.  Output: left columns + ``asof_<val>`` + ``asof_ts`` (null
    when no prior right row exists).
    """
    us = F.unix_micros(F.col(ts_col))
    r = (
        right.groupBy(key_col, ts_col)
        .agg(F.max(right_val_col).alias("_r_val"))
        .select(
            F.col(key_col),
            us.alias("_us"),
            F.lit(0).alias("_tag"),
            F.col("_r_val"),
            us.alias("_r_us"),
        )
    )
    l_cols = [F.col(c) for c in left.columns]
    l = left.select(
        *l_cols,
        us.alias("_us"),
        F.lit(1).alias("_tag"),
        F.lit(None).cast(r.schema["_r_val"].dataType).alias("_r_val"),
        F.lit(None).cast("long").alias("_r_us"),
    )
    # Right rows sort BEFORE left rows at the same timestamp (tag 0 <
    # tag 1) => ">=" as-of semantics.
    w = W.partitionBy(key_col).orderBy("_us", "_tag").rowsBetween(W.unboundedPreceding, 0)
    # Right rows keep their KEY (the window partitions on it); every
    # other left column rides along as null.
    r_shaped = r.select(
        *[
            F.col(key_col).alias(c)
            if c == key_col
            else F.lit(None).cast(left.schema[c].dataType).alias(c)
            for c in left.columns
        ],
        "_us",
        "_tag",
        "_r_val",
        "_r_us",
    )
    unioned = l.unionByName(r_shaped)
    carried = unioned.withColumn("_asof_val", F.last("_r_val", ignorenulls=True).over(w)).withColumn(
        "_asof_us", F.last("_r_us", ignorenulls=True).over(w)
    )
    return (
        carried.filter(F.col("_tag") == 1)
        .select(
            *[F.col(c) for c in left.columns],
            F.col("_asof_val").alias("asof_val"),
            F.col("_asof_us").alias("asof_us"),
        )
    )


def range_join_pairs(
    events: DataFrame,
    window_sec: int,
    key_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
) -> DataFrame:
    """All ordered pairs of same-key events with ``0 <= t2 - t1 <=
    window`` (t1 < t2, or equal-ts pairs ordered by id).

    Banded equi-join: bucket = ``us // window``; the left side probes
    buckets {b, b+1}, so every qualifying pair is found in a plain
    hash join and the band predicate is a cheap post-filter.  Without
    the bucketing Spark plans the inequality as a nested-loop join —
    quadratic per key.
    """
    w_us = int(window_sec) * 1_000_000
    base = events.select(
        F.col(key_col).alias("k"),
        F.col(id_col).alias("id"),
        F.unix_micros(F.col(ts_col)).alias("us"),
    ).withColumn("b", (F.col("us") / F.lit(w_us)).cast("long"))
    probe = base.withColumn("jb", F.explode(F.array(F.col("b"), F.col("b") + 1)))
    build = base.select(
        F.col("k").alias("k2"), F.col("id").alias("id2"),
        F.col("us").alias("us2"), F.col("b").alias("b2"),
    )
    pairs = probe.join(
        build, (F.col("k") == F.col("k2")) & (F.col("jb") == F.col("b2"))
    ).filter(
        (F.col("us2") - F.col("us") >= 0)
        & (F.col("us2") - F.col("us") <= w_us)
        & (
            (F.col("us") < F.col("us2"))
            | ((F.col("us") == F.col("us2")) & (F.col("id") < F.col("id2")))
        )
    )
    return pairs.select(
        F.col("k").alias(key_col),
        F.col("id").alias("id1"),
        F.col("id2"),
        (F.col("us2") - F.col("us")).alias("gap_us"),
    )


def rollup_by_day_type(events: DataFrame, ts_col: str = "ts") -> DataFrame:
    """Hierarchical rollup (day × event_type → day → grand total) in
    ONE grouping-sets pass.  Subtotal levels are marked 'ALL' via
    ``GROUPING()`` — not ``coalesce`` — so a row whose ``event_type``
    is genuinely NULL stays a distinct detail group instead of being
    silently merged into the subtotal (both engines agree on
    ``GROUPING()`` semantics)."""
    day = F.date_trunc("day", F.col(ts_col)).cast("date").cast("string")
    return (
        events.withColumn("_day", day)
        .rollup("_day", "event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,6)")).cast("double").alias("sum_value"),
            F.grouping("_day").alias("_g_day"),
            F.grouping("event_type").alias("_g_type"),
        )
        .select(
            F.when(F.col("_g_day") == 1, F.lit("ALL")).otherwise(F.col("_day")).alias("day"),
            F.when(F.col("_g_type") == 1, F.lit("ALL"))
            .otherwise(F.col("event_type"))
            .alias("event_type"),
            "n_events",
            "sum_value",
        )
    )


def cube_by_day_type_source(
    events: DataFrame,
    ts_col: str = "ts",
    dim2_col: str = "event_type",
    dim3_col: str = "user_bucket",
) -> DataFrame:
    """Full CUBE over (day, dim2, dim3): all 8 grouping sets — the
    cross-marginals the hierarchical ROLLUP cannot produce (ROLLUP
    gives day×type→day→total; a dashboard slicing "all days, one
    type, one cohort" needs the CUBE's (ALL, type, cohort) corner) —
    in ONE grouping-sets pass, no UNION ALL rescans.  Subtotals are
    marked 'ALL' via ``GROUPING()`` (the NULL-vs-subtotal convention
    ``rollup_by_day_type`` documents) and ``grouping_id`` comes out
    as an explicit BIGINT so every row names its grouping set.

    ANSI edge (the r12 sweep caught the divergence): SQL-standard
    CUBE over an EMPTY relation still emits the grand-total row
    (``GROUP BY ()`` is one row; DuckDB agrees) — Spark's
    ``cube()`` emits nothing.  The grand-total set is therefore
    computed as a separate global aggregate (which Spark does emit
    on empty input) and unioned in, so the operator matches ANSI
    semantics on every slice, empty included.

    Scale shape: Spark expands a CUBE into one Expand node (8 copies
    of each input row pre-aggregation, map-side combined) — cost is
    8× the aggregate input, not 8 scans, plus one aggregate-only
    pass for the ANSI grand total; at 100 TB prefer restricting to
    the grouping sets actually consumed."""
    day = F.date_trunc("day", F.col(ts_col)).cast("date").cast("string")
    marked = lambda g, c: (
        F.when(F.col(g) == 1, F.lit("ALL")).otherwise(F.col(c))
    )
    detail = (
        events.withColumn("_day", day)
        .cube("_day", dim2_col, dim3_col)
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,6)"))
            .cast("double")
            .alias("sum_value"),
            F.grouping("_day").alias("_g1"),
            F.grouping(dim2_col).alias("_g2"),
            F.grouping(dim3_col).alias("_g3"),
        )
        .filter(
            (F.col("_g1") == 0) | (F.col("_g2") == 0) | (F.col("_g3") == 0)
        )
        .select(
            marked("_g1", "_day").alias("day"),
            marked("_g2", dim2_col).alias(dim2_col),
            marked("_g3", dim3_col).alias(dim3_col),
            (
                F.col("_g1") * 4 + F.col("_g2") * 2 + F.col("_g3")
            )
            .cast("long")
            .alias("grouping_id"),
            "n_events",
            "sum_value",
        )
    )
    grand = events.groupBy().agg(
        F.count("*").alias("n_events"),
        F.sum(F.col("value").cast("decimal(18,6)"))
        .cast("double")
        .alias("sum_value"),
    ).select(
        F.lit("ALL").alias("day"),
        F.lit("ALL").alias(dim2_col),
        F.lit("ALL").alias(dim3_col),
        F.lit(7).cast("long").alias("grouping_id"),
        "n_events",
        "sum_value",
    )
    return detail.unionByName(grand)


def gapfill_daily(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """Regularize an event stream into a dense per-key daily series:
    one row per (key, calendar day) between the key's first and last
    event, with ``day_value`` (exact DECIMAL day sum, 0 on gap days),
    ``n_events`` and an ``is_gap`` flag.

    Dense grids are the precondition for every window feature
    (EWMA, rolling mean, lag features): a ROWS frame over a gappy
    series silently mixes lookback horizons.

    Scale shape: the daily aggregate is one map-side-combined shuffle;
    the per-key (min, max) bounds are a second tiny aggregate over the
    DAILY result (|keys| rows); the spine is ``sequence() + explode``
    — generated, never shuffled — and the final left join re-keys on
    (key, day), the same key the daily agg just hashed on.  Nothing
    scales with the raw event count except the first aggregate."""
    daily = df.groupBy(F.col(user_col), F.to_date(ts_col).alias("day")).agg(
        F.sum(F.col(value_col).cast("decimal(18,6)")).alias("day_value"),
        F.count(F.lit(1)).alias("n_events"),
    )
    bounds = daily.groupBy(user_col).agg(
        F.min("day").alias("_mn"), F.max("day").alias("_mx")
    )
    spine = bounds.select(
        F.col(user_col), F.explode(F.sequence("_mn", "_mx")).alias("day")
    )
    zero = F.lit(0).cast(dict(daily.dtypes)["day_value"])
    return spine.join(daily, [user_col, "day"], "left").select(
        F.col(user_col),
        F.col("day"),
        F.coalesce("day_value", zero).alias("day_value"),
        F.coalesce("n_events", F.lit(0)).alias("n_events"),
        F.col("n_events").isNull().alias("is_gap"),
    )


#: Truncated-EWMA lookback: weights 2^-(j+1) for j in [0, EWMA_J);
#: the dropped tail carries < 2^-EWMA_J of the total weight.
EWMA_J = 16


def ewma_daily(
    gapfilled: DataFrame,
    user_col: str = "user_id",
    day_col: str = "day",
    value_col: str = "day_value",
    lookback: int = EWMA_J,
) -> DataFrame:
    """Exponentially-weighted moving average over a dense daily series,
    computed EXACTLY in integers so any engine reproduces it bit for
    bit.

    The classic recurrence ``y_t = a·x_t + (1-a)·y_{t-1}`` is a
    sequential scan — hostile to both distributed execution and
    cross-engine float determinism (infinite tail, order-sensitive
    rounding).  With a = 1/2 the weights are 2^-(j+1), so truncating at
    ``lookback`` days bounds the dropped mass at 2^-lookback (≈1.5e-5
    for 16) and turns the scan into a FIXED window: ``ewma_num =
    Σ_{j<J} micro(x_{t-j}) · 2^(J-1-j)`` — an integer, built from J
    ``lag()`` taps sharing ONE window spec (one shuffle on the key).
    The float ``ewma`` is derived by two IEEE-exact divisions
    (2^J, then the micro scale) at the very end.

    Requires the DENSE series from ``gapfill_daily`` — on a gappy
    series, lag taps would skip calendar days and stretch the horizon."""
    w = W.partitionBy(user_col).orderBy(day_col)
    micro = (F.col(value_col) * 1_000_000).cast("long")
    df = gapfilled.withColumn("_micro", micro)
    num = F.lit(0).cast("long")
    for j in range(lookback):
        # j == 0 is the current row — no lag() call, so engines that
        # reject or special-case offset 0 can't disagree.
        tap = (
            F.col("_micro")
            if j == 0
            else F.coalesce(F.lag("_micro", j).over(w), F.lit(0))
        )
        num = num + tap * F.lit(1 << (lookback - 1 - j))
    return df.select(
        F.col(user_col),
        F.col(day_col),
        num.alias("ewma_num"),
        (num.cast("double") / float(1 << lookback) / 1e6).alias("ewma"),
    )


#: Theil-Sen slope quantization: lcm(1..16)·4 — divisible by every
#: day-gap up to 16 and by common larger gaps, so short-series slopes
#: are often EXACT rationals; quantization error is bounded by
#: 1/TS_SCALE micro-units/day regardless.
TS_SCALE = 720_720


def theil_sen_daily(
    gapfilled: DataFrame,
    user_col: str = "user_id",
    day_col: str = "day",
    value_col: str = "day_value",
) -> DataFrame:
    """Theil-Sen robust trend per key over a dense daily series: the
    MEDIAN of all pairwise slopes — breakdown point 29%, so a burst of
    corrupt days cannot flip the trend sign the way it drags an OLS
    fit (the robust-statistics companion of ``mad_outliers_by``, for
    trends instead of levels).

    Engine-exact construction: values in integer micro-units, slopes
    quantized to ``slope_scaled = ((m2−m1)·TS_SCALE) div (d2−d1)`` —
    BOTH engines truncate integer division toward zero, so every
    quantized slope is identical; the median is a DISCRETE order
    statistic under the total order (slope, d1, d2).  Overflow bound:
    |Δmicro|·TS_SCALE must stay under 2^63 — fine to ~10^12
    micro-units of daily delta.

    Scale shape: the pair self-join is per-key O(d²) in SERIES LENGTH
    — constant per key when applied the standard way (a bounded
    trailing window, e.g. 30–90 days of a monitoring series), never
    corpus-sized; one exchange on the key serves the join, the
    ranking window, and the final aggregate.  Output: ``(user_id,
    n_days, n_pairs, slope_scaled, slope_per_day)``."""
    epoch = F.lit("1970-01-01").cast("date")
    base = gapfilled.select(
        F.col(user_col),
        F.datediff(F.col(day_col), epoch).alias("_d"),
        (F.col(value_col).cast("decimal(18,6)") * 1_000_000)
        .cast("long")
        .alias("_m"),
    )
    a = base.select(
        F.col(user_col), F.col("_d").alias("d1"), F.col("_m").alias("m1")
    )
    b = base.select(
        F.col(user_col), F.col("_d").alias("d2"), F.col("_m").alias("m2")
    )
    slopes = (
        a.join(b, user_col)
        .filter(F.col("d1") < F.col("d2"))
        .select(
            F.col(user_col),
            "d1",
            "d2",
            F.expr(f"((m2 - m1) * {TS_SCALE}) div (d2 - d1)").alias("s"),
        )
    )
    w = W.partitionBy(user_col).orderBy(
        F.col("s").asc(), F.col("d1").asc(), F.col("d2").asc()
    )
    wc = W.partitionBy(user_col)
    ranked = slopes.withColumn("_rn", F.row_number().over(w)).withColumn(
        "_n", F.count(F.lit(1)).over(wc)
    )
    med = ranked.filter(F.col("_rn") == F.expr("(_n + 1) div 2"))
    days = base.groupBy(user_col).agg(F.count(F.lit(1)).alias("n_days"))
    return (
        med.select(
            F.col(user_col),
            F.col("_n").alias("n_pairs"),
            F.col("s").alias("slope_scaled"),
        )
        .join(days, user_col)
        .select(
            user_col,
            "n_days",
            "n_pairs",
            "slope_scaled",
            F.round(
                F.col("slope_scaled").cast("double")
                / F.lit(float(TS_SCALE) * 1_000_000.0),
                9,
            ).alias("slope_per_day"),
        )
    )


def cusum_alarms_daily(
    gapfilled: DataFrame,
    threshold_pct: int = 300,
    slack_pct: int = 20,
    user_col: str = "user_id",
    day_col: str = "day",
    value_col: str = "day_value",
) -> DataFrame:
    """One-sided upper CUSUM change-point monitor per key over the
    dense daily series — the sequential-detection classic (Page '54):
    alarm when the cumulative positive drift of ``value − (baseline +
    slack)`` exceeds a threshold.  Baseline is the key's own DISCRETE
    median day value; slack and threshold are percentages of it, so
    the monitor is self-calibrating per key.

    The recurrence ``S_i = max(0, S_{i−1} + d_i)`` looks
    window-inexpressible, but has the exact prefix identity

        S_i = P_i − min(0, min_{j≤i} P_j),   P_i = Σ_{j≤i} d_j

    so the whole monitor is: one prefix-sum window + one running-min
    window + a comparison — ALL on the same (key, day-order) window
    spec, one exchange total, exact BIGINT micro-unit arithmetic end
    to end (no recurrence state, no UDF).

    Returns per key: ``(user_id, n_days, baseline_micro, n_alarm_days,
    first_alarm_day)`` with ``first_alarm_day`` the string date of the
    first S > threshold day or ``'none'`` (sentinel, not NULL)."""
    mu = (F.col(value_col).cast("decimal(18,6)") * 1_000_000).cast("long")
    base = gapfilled.select(F.col(user_col), F.col(day_col).alias("_day"), mu.alias("_m"))

    wv = W.partitionBy(user_col).orderBy(F.col("_m").asc(), F.col("_day").asc())
    wc = W.partitionBy(user_col)
    ranked = base.withColumn("_rn", F.row_number().over(wv)).withColumn(
        "_n", F.count(F.lit(1)).over(wc)
    )
    med = ranked.filter(F.col("_rn") == F.expr("(_n + 1) div 2")).select(
        F.col(user_col).alias("_g"), F.col("_m").alias("_med")
    )

    wd = W.partitionBy(user_col).orderBy(F.col("_day").asc()).rowsBetween(
        W.unboundedPreceding, W.currentRow
    )
    scored = (
        base.join(F.broadcast(med), F.col(user_col) == F.col("_g"))
        .withColumn(
            "_d",
            F.col("_m") - F.col("_med") - F.expr(f"(_med * {slack_pct}) div 100"),
        )
        .withColumn("_p", F.sum("_d").over(wd))
        .withColumn("_minp", F.least(F.lit(0).cast("long"), F.min("_p").over(wd)))
        .withColumn("_s", F.col("_p") - F.col("_minp"))
        .withColumn(
            "_alarm", F.col("_s") > F.expr(f"(_med * {threshold_pct}) div 100")
        )
    )
    return scored.groupBy(F.col(user_col)).agg(
        F.count(F.lit(1)).alias("n_days"),
        F.min("_med").alias("baseline_micro"),
        F.sum(F.col("_alarm").cast("long")).alias("n_alarm_days"),
        F.coalesce(
            F.min(F.when(F.col("_alarm"), F.col("_day").cast("string"))),
            F.lit("none"),
        ).alias("first_alarm_day"),
    )


def seasonal_decompose_daily(
    events: DataFrame,
    key_col: str = "event_type",
    ts_col: str = "ts",
    value_col: str = "value",
    period: int = 7,
) -> DataFrame:
    """Classical additive seasonal decomposition of each key's dense
    daily series — value = trend + seasonal + residual — in EXACT
    integer micro-units, so the decomposition replays bit-for-bit in
    SQL (statsmodels' ``seasonal_decompose(model='additive')`` shape,
    the pre-STL classic; STL's loess refits are float-iterative and
    non-portable by construction).

    Stages, all exact:

    1. dense per-(key, day) sums in micro-units (the gapfill spine —
       gap days are true zeros);
    2. trend = centered moving average over ``period`` rows (odd
       period; integer ``div`` — the one rounding, identical in both
       engines), NULL at the ``period//2``-row edges where the window
       is incomplete (standard convention: no partial-window trend);
    3. seasonal index = per (key, day-of-week slot) integer mean of
       the detrended values, re-centered by subtracting the per-key
       mean of the ``period`` indices so Σ seasonal ≈ 0 (again exact
       ``div``);
    4. residual = value − trend − seasonal where trend exists.

    Returns ``(key, day, value_micro, trend_micro, seasonal_micro,
    residual_micro)``.

    Scale shape (100 TB): the ONLY stage that touches event volume is
    the first map-side-combined daily aggregate; every window below it
    runs over the |keys| × |days| rollup — time-range-sized, not
    data-sized (the same posture as ewma/theil_sen/cusum above).  Slot
    means and re-centering are two more vocabulary-sized aggregates
    joined back on their own grouping keys."""
    if period < 3 or period % 2 == 0:
        raise ValueError(f"period must be odd and >= 3, got {period}")
    half = period // 2
    # Null keys/timestamps drop declaratively BEFORE the gapfill: a
    # null key can never equi-join its own spine rows back (NULL !=
    # NULL), which would fabricate an all-zero series for it.
    events = events.filter(
        F.col(key_col).isNotNull() & F.col(ts_col).isNotNull()
    )
    daily = gapfill_daily(events, key_col, ts_col, value_col).select(
        F.col(key_col),
        "day",
        (F.col("day_value") * 1_000_000).cast("long").alias("value_micro"),
    )
    w = W.partitionBy(key_col).orderBy("day").rowsBetween(-half, half)
    with_trend = (
        daily.select(
            key_col,
            "day",
            "value_micro",
            F.sum("value_micro").over(w).alias("_wsum"),
            F.count(F.lit(1)).over(w).alias("_wcnt"),
        )
        .withColumn(
            "trend_micro",
            F.when(
                F.col("_wcnt") == period, F.expr(f"_wsum div {period}")
            ),
        )
        .drop("_wsum", "_wcnt")
    )
    detrended = with_trend.withColumn(
        "_slot", F.dayofweek("day") if period == 7 else (
            F.datediff("day", F.lit("1970-01-01").cast("date")) % period
        ),
    ).withColumn("_det", F.col("value_micro") - F.col("trend_micro"))
    slot_means = (
        detrended.filter(F.col("_det").isNotNull())
        .groupBy(key_col, "_slot")
        .agg(
            F.expr("sum(_det) div count(1)").alias("_slot_mean"),
        )
    )
    # Re-center: seasonal components must sum to ~0 per key, else the
    # mean level leaks from trend into seasonal.
    centers = slot_means.groupBy(key_col).agg(
        F.expr("sum(_slot_mean) div count(1)").alias("_center")
    )
    seasonal = (
        slot_means.join(centers, key_col)
        .select(
            key_col,
            "_slot",
            (F.col("_slot_mean") - F.col("_center")).alias("seasonal_micro"),
        )
    )
    return (
        detrended.join(seasonal, [key_col, "_slot"], "left")
        .select(
            key_col,
            "day",
            "value_micro",
            "trend_micro",
            F.when(
                F.col("trend_micro").isNotNull(), F.col("seasonal_micro")
            ).alias("seasonal_micro"),
            (
                F.col("value_micro")
                - F.col("trend_micro")
                - F.col("seasonal_micro")
            ).alias("residual_micro"),
        )
    )

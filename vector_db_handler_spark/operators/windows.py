"""Time-window operators over event streams (batch form).

The reference has no streaming/time-series surface (SURVEY §2.4); the
``events`` fixture drives the extension ops.  Batch forms here share
semantics with the Structured Streaming versions in
``streaming/stream_ops.py`` — same groupings, same windows — so a
pipeline can run identically over a backfill (batch) and a live stream.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window as W


def tumbling_agg(events: DataFrame, ts_col: str = "ts", unit: str = "hour") -> DataFrame:
    """Tumbling-window aggregate keyed by (window_start, event_type).

    Uses ``date_trunc`` rather than ``F.window`` so the key is a plain
    timestamp (portable to any SQL engine); at 100 TB this is a single
    map-side-combinable groupBy — the window key is derived, no shuffle
    beyond the aggregation itself.
    """
    return (
        events.groupBy(
            F.date_trunc(unit, F.col(ts_col)).alias("window_start"),
            F.col("event_type"),
        )
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,6)")).cast("double").alias("sum_value"),
        )
    )


def sliding_agg(
    events: DataFrame, ts_col: str = "ts", width_hours: int = 2, slide_hours: int = 1
) -> DataFrame:
    """Sliding-window counts: each event lands in width/slide windows.

    Implemented by exploding each row into the windows that contain it
    (generate window starts with ``sequence``) — the portable
    equivalent of ``F.window(ts, '2 hours', '1 hour')`` without the
    struct key.
    """
    n = width_hours // slide_hours
    starts = F.sequence(F.lit(0), F.lit(n - 1))
    return (
        events.withColumn(
            "window_start",
            F.explode(
                F.transform(
                    starts,
                    lambda i: F.date_trunc("hour", F.col(ts_col))
                    - (i * F.expr(f"INTERVAL {slide_hours} HOUR")),
                )
            ),
        )
        .groupBy("window_start", "event_type")
        .agg(F.count("*").alias("n_events"))
    )


def sessionize(
    events: DataFrame, gap_minutes: int = 30, ts_col: str = "ts", key_col: str = "user_id"
) -> DataFrame:
    """Gap-based sessionization: a new session starts when the gap from
    the previous event of the same user exceeds ``gap_minutes``.

    lag + cumulative-sum over a per-user window: one shuffle on the
    user key; session ids are then per-user ordinals (deterministic).
    Gap arithmetic is in integer MICROSECONDS (``unix_micros``) — no
    sub-second truncation, and bit-exact in any engine with an
    epoch-microseconds accessor.  Streaming twin:
    ``session_window(ts, gap)`` (see ``streaming/stream_ops.py``).
    """
    us = F.unix_micros(F.col(ts_col))
    w = W.partitionBy(key_col).orderBy(ts_col, "event_id")
    gap = us - F.lag(us).over(w)
    with_break = events.withColumn(
        "is_new", F.when(gap.isNull() | (gap > gap_minutes * 60 * 1_000_000), 1).otherwise(0)
    )
    with_sid = with_break.withColumn(
        "session_id", F.sum("is_new").over(w.rowsBetween(W.unboundedPreceding, 0))
    )
    return (
        with_sid.groupBy(key_col, "session_id")
        .agg(
            F.count("*").alias("n_events"),
            F.min(F.unix_micros(F.col(ts_col))).alias("session_start_us"),
            F.max(F.unix_micros(F.col(ts_col))).alias("session_end_us"),
        )
    )


def sequence_funnel(
    events: DataFrame,
    steps: list[str],
    span_us: int,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    tiebreak_col: str = "event_id",
) -> DataFrame:
    """Ordered sequence-pattern matching (the MATCH_RECOGNIZE shape)
    lowered to cascaded conditional windows: a final-step event
    COMPLETES the funnel when it is preceded — strictly, in
    (event-time, tiebreak) order — by a chain of the earlier steps in
    order, and the whole chain spans at most ``span_us`` microseconds
    (measured first step → final step).  Chain choice is pinned: each
    step links to the LATEST viable occurrence of its predecessor, so
    the reported ``chain_start`` is the tightest chain and the
    completion decision is deterministic (engine-portable: integer
    microsecond comparisons only).

    Lowering: step i adds one conditional running MAX that carries the
    chain's START timestamp forward —

        c₀ = max(ts  WHERE type = step₀)             over preceding
        cᵢ = max(c₍ᵢ₋₁₎ WHERE type = stepᵢ)           over preceding
        completed = type = step_N ∧ c₍N₋₁₎ ≥ ts − span

    ALL windows share one (user, order) spec, so the whole cascade —
    any number of steps — costs exactly ONE hash exchange + one sort;
    Spark evaluates the chained selects over the same sorted runs.
    No self-joins: the naive EXISTS chain is one banded join per step.
    Returns the final-step rows with ``(chain_start, completed)``."""
    if len(steps) < 2:
        raise ValueError("need at least 2 funnel steps")
    us = F.unix_micros(F.col(ts_col))
    w = (
        W.partitionBy(user_col)
        .orderBy(us.asc(), F.col(tiebreak_col).asc())
        .rowsBetween(W.unboundedPreceding, -1)
    )
    out = events.withColumn("_us", us)
    carry = None
    for i, step in enumerate(steps[:-1]):
        src = F.col("_us") if i == 0 else F.col(f"_c{i - 1}")
        out = out.withColumn(
            f"_c{i}",
            F.max(F.when(F.col(type_col) == step, src)).over(w),
        )
    carry = F.col(f"_c{len(steps) - 2}")
    return (
        out.filter(F.col(type_col) == steps[-1])
        .withColumn(
            "completed",
            carry.isNotNull() & (carry >= F.col("_us") - F.lit(int(span_us))),
        )
        .withColumn("chain_start", carry)
        .drop("_us", *[f"_c{i}" for i in range(len(steps) - 1)])
    )


def watermark_late_audit(
    events: DataFrame,
    delay_sec: int = 3600,
    ts_col: str = "ts",
    arrival_col: str = "arrival_seq",
    id_col: str = "event_id",
    unit: str = "day",
    bucket_width: int = 10_000,
) -> DataFrame:
    """Batch replay of Structured Streaming WATERMARK semantics: for
    every event, the watermark AT ITS ARRIVAL is the running max of
    event time over everything that arrived before it, minus
    ``delay_sec`` — an event whose own time sits below that mark is
    LATE (a streaming job with this watermark would drop it).  The
    audit reports, per tumbling ``unit`` window of EVENT time,
    ``(window_start_epoch, n_total, n_late, n_accepted,
    max_lateness_us)`` (the window key as epoch seconds — the repo's
    hash-checked convention for date keys) — the relation that answers "what delay do I
    need so yesterday's backfill loses nothing?", read BEFORE turning
    the stream on (the batch/stream-parity posture this module
    documents).

    ``arrival_col`` is the arrival order (ingest offset / file
    sequence); ties break by ``id_col``.  The idealization is the
    per-row running max — the tightest watermark a streaming engine
    could hold (real engines update it per batch, dropping weakly
    FEWER rows), so this audit is the conservative bound.

    Scale shape — the running max is a DISTRIBUTED two-level prefix
    scan, not a single-partition window: rows bucket by
    ``arrival // bucket_width``; per-bucket maxes (B rows) take a
    cumulative max in one tiny window; each row then combines its
    bucket's PREVIOUS-buckets prefix with a within-bucket running max
    (window PARTITIONED by bucket).  Equal arrival values land in the
    same bucket, so the decomposition is exactly the global
    ``ORDER BY (arrival, id)`` running max — pinned by the
    bucket-width-invariance test."""
    ev = events.filter(
        F.col(ts_col).isNotNull()
        & F.col(arrival_col).isNotNull()
        & F.col(id_col).isNotNull()
    ).select(
        F.col(id_col).alias("eid"),
        F.col(arrival_col).alias("arr"),
        F.unix_micros(F.col(ts_col).cast("timestamp")).alias("tu"),
        F.date_trunc(unit, F.col(ts_col).cast("timestamp")).alias("win"),
    )
    ev = ev.withColumn(
        "bkt", F.floor(F.col("arr") / F.lit(int(bucket_width))).cast("long")
    )
    per_bucket = ev.groupBy("bkt").agg(F.max("tu").alias("bmax"))
    wb = W.orderBy("bkt").rowsBetween(W.unboundedPreceding, -1)
    prefix = per_bucket.select(
        "bkt", F.max("bmax").over(wb).alias("prefix_prev")
    )
    wr = (
        W.partitionBy("bkt")
        .orderBy(F.col("arr").asc(), F.col("eid").asc())
        .rowsBetween(W.unboundedPreceding, -1)
    )
    neg_inf = F.lit(-(2**62)).cast("long")
    scored = (
        ev.join(F.broadcast(prefix), "bkt")
        .withColumn("within_prev", F.max("tu").over(wr))
        .withColumn(
            "wm",
            F.greatest(
                F.coalesce(F.col("prefix_prev"), neg_inf),
                F.coalesce(F.col("within_prev"), neg_inf),
            )
            - F.lit(int(delay_sec) * 1_000_000),
        )
        .withColumn("late", F.col("tu") < F.col("wm"))
    )
    win_epoch = (F.unix_micros(F.col("win")) / F.lit(1_000_000)).cast(
        "long"
    )
    return scored.groupBy(win_epoch.alias("window_start_epoch")).agg(
        F.count(F.lit(1)).cast("long").alias("n_total"),
        F.sum(F.col("late").cast("long")).cast("long").alias("n_late"),
        F.sum((~F.col("late")).cast("long")).cast("long").alias("n_accepted"),
        F.coalesce(
            F.max(F.when(F.col("late"), F.col("wm") - F.col("tu"))), F.lit(0)
        )
        .cast("long")
        .alias("max_lateness_us"),
    )

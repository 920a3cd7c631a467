"""Null-field tolerance for the event-analytics family — completing
the null triad (docs: ``test_null_edge_docs``; embeddings:
``test_null_edge_embeddings``).

Unlike the vector kernels (which needed explicit contracts), the
events operators are pure DataFrame plans, so Spark's native null
semantics carry them: null grouping keys form their own group, null
timestamps drop out of time windows, aggregates skip null values.
This file pins that those semantics actually hold end-to-end — a
regression to a Python kernel or a non-null-safe expression would
surface here."""

from __future__ import annotations

import datetime

import pytest
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

from vector_db_handler_spark.operators import reshape as rs
from vector_db_handler_spark.operators import timeseries as ts
from vector_db_handler_spark.operators import windows as w

_SCHEMA = StructType(
    [
        StructField("event_id", LongType(), False),
        StructField("ts", TimestampType(), True),
        StructField("user_id", LongType(), True),
        StructField("event_type", StringType(), True),
        StructField("value", DoubleType(), True),
        StructField("props", StringType(), True),
    ]
)

_T = datetime.datetime(2024, 1, 1)


@pytest.fixture(scope="module")
def ev(spark):
    rows = [
        (0, _T, None, "click", 1.0, None),       # null user
        (1, _T, 7, None, 2.0, '{"k":1}'),        # null type
        (2, _T, 7, "view", None, '{"k":2}'),     # null value
        (3, None, 7, "click", 3.0, '{"k":3}'),   # null timestamp
        (4, _T, 8, "purchase", 4.0, '{"k":4}'),
    ]
    return spark.createDataFrame(rows, _SCHEMA)


def test_time_windows_isolate_null_timestamps(ev):
    # a null-ts event lands in the NULL window group (Spark's window()
    # of null is null) — never silently attributed to a real window,
    # and never a crash; every event stays accounted for
    out = w.tumbling_agg(ev).collect()
    assert sum(r.n_events for r in out) == 5
    null_win = [r for r in out if r.window_start is None]
    assert len(null_win) == 1 and null_win[0].n_events == 1
    assert w.sessionize(ev).count() >= 4


def test_rollup_and_gapfill_null_safe(ev):
    roll = ts.rollup_by_day_type(ev).collect()
    # grand total counts every event, including the null-ts/null-type rows
    grand = [r for r in roll if r.day == "ALL" and r.event_type == "ALL"]
    assert grand and grand[0].n_events == 5
    assert ts.ewma_daily(ts.gapfill_daily(ev)).count() >= 1


def test_pivot_null_keys_form_their_own_row(ev):
    wide = {r.user_id: r for r in rs.pivot_user_type_value(ev).collect()}
    assert None in wide                    # null user is a real group
    assert wide[None].click_value == 1.0
    # user 7: the null-event_type row lands in NO pinned category
    # column (its 2.0 vanishes from the matrix); the null-VALUE view
    # row leaves a null cell; the click survives
    assert wide[7].click_value == 3.0
    assert all(
        getattr(wide[7], f"{t}_value") is None
        for t in ("view", "error", "purchase", "signup")
    )
    melted = {(r.user_id, r.event_type): r.total_value
              for r in rs.unpivot_user_type_value(ev).collect()}
    # null cells drop on melt: user 7 keeps only its click cell
    assert melted == {(None, "click"): 1.0, (7, "click"): 3.0,
                      (8, "purchase"): 4.0}


def test_custom_stateful_streams_drop_null_values(spark, tmp_path):
    """r6 advisor: a null event value used to crash ``float(None)``
    inside the applyInPandasWithState processors.  The contract now:
    null-value events are dropped declaratively BEFORE the stateful
    shuffle (same skip-nulls posture as the batch SUM), so the stream
    neither crashes nor emits rows for them — and the surviving rows'
    state is exactly what a null-free replay would produce."""
    from vector_db_handler_spark.streaming import stream_ops

    rows = [
        (0, _T, 7, "click", 1.0, None),
        (1, _T + datetime.timedelta(minutes=1), 7, "view", None, None),
        (2, _T + datetime.timedelta(minutes=2), 7, "view", 2.0, None),
        (3, _T + datetime.timedelta(minutes=3), 8, "click", None, None),
    ]
    src = str(tmp_path / "null_vals")
    spark.createDataFrame(rows, _SCHEMA).coalesce(1).write.mode(
        "overwrite"
    ).parquet(src)
    schema = spark.read.parquet(src).schema

    anom = stream_ops.streaming_user_anomaly_gs(
        spark.readStream.schema(schema).parquet(src)
    )
    stream_ops.run_to_memory(anom, "t_null_anom", mode="append")
    got = {r.event_id: r.n_prior for r in spark.table("t_null_anom").collect()}
    # events 1 and 3 (null value) are dropped; event 2's prior count
    # sees only the non-null event 0
    assert got == {0: 0, 2: 1}

    run = stream_ops.streaming_running_user_value_gs(
        spark.readStream.schema(schema).parquet(src)
    )
    stream_ops.run_to_memory(run, "t_null_run", mode="append")
    vals = {r.event_id: (r.running_value, r.seq)
            for r in spark.table("t_null_run").collect()}
    assert vals == {0: (1.0, 1), 2: (3.0, 2)}

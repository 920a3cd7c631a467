"""Pivot / unpivot reshaping — the wide↔long DataFrame surface.

Reference context: the reference exposes its per-user activity only in
long form (one Qdrant payload row per event; ``document_ingestor.py``
keeps chunk metadata long too).  Analytics consumers invariably want
the wide per-entity matrix (one column per category), and training
pipelines want the reverse (melt a feature matrix back to long for
per-feature statistics) — so both directions are first-class here.

Scale design (100 TB posture):

* ``pivot`` is ONE shuffle on the grouping key.  The category list is
  passed EXPLICITLY (``pivot(col, values)``): without it Spark runs an
  extra collect-distinct job over the full corpus just to discover the
  column set — at 100 TB that is a whole extra scan, and the resulting
  schema is non-deterministic if a new category appears mid-pipeline.
  Fixed vocabularies (event types, languages, split names) should
  always be pinned by the caller.
* ``unpivot`` is a zero-shuffle narrow projection (Catalyst ``Expand``
  node): each input row fans out to ``len(values)`` output rows inside
  the same task — no exchange, no Python.
* The pivot aggregate accumulates in DECIMAL(18,6), the repo-wide
  exact-sum convention, so wide-matrix cells are bit-identical across
  engines and partitionings.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: The events fixture's closed category vocabulary (TESTDATA.md) —
#: pinned so the pivot never needs a discovery scan.
EVENT_TYPES: list[str] = ["click", "error", "purchase", "signup", "view"]


def pivot_user_type_value(
    events: DataFrame, types: list[str] | None = None
) -> DataFrame:
    """Wide per-user activity matrix: one row per ``user_id``, one
    DOUBLE column per event type holding the DECIMAL-exact sum of
    ``value`` (null where the user has no such events — the same
    missing-cell semantics as conditional aggregation).

    Plan shape (pinned in ``tests/test_reshape.py``): Spark lowers
    ``pivot`` to TWO aggregation rounds — groupBy(user, type) then a
    ``pivotfirst`` groupBy(user) — so there are two exchanges, but
    BOTH carry map-side-combined cells (≤ |users| × |types| rows),
    never the raw event count; at 100 TB the shuffled volume is the
    matrix, not the log.
    """
    ts = types if types is not None else EVENT_TYPES
    return (
        events.groupBy("user_id")
        .pivot("event_type", ts)
        .agg(
            F.sum(F.col("value").cast("decimal(18,6)"))
            .cast("double")
        )
        .select(
            "user_id", *[F.col(t).alias(f"{t}_value") for t in ts]
        )
    )


def unpivot_user_type_value(
    events: DataFrame, types: list[str] | None = None
) -> DataFrame:
    """Pivot → unpivot round trip: build the wide matrix, melt it back
    to long ``(user_id, event_type, total_value)``, and drop the
    null cells the widening introduced.  The result is provably the
    plain ``GROUP BY user_id, event_type`` aggregate — which is
    exactly what the SQL oracle computes, making the losslessness of
    the round trip the checked property.

    The melt itself is an ``Expand`` projection — narrow, no shuffle
    beyond the pivot's own; dropping null cells restores the exact
    long-form row set (a user×type cell is null iff the pair had no
    events, because ``value`` is non-null in the fixture schema).
    """
    ts = types if types is not None else EVENT_TYPES
    wide = pivot_user_type_value(events, ts)
    long = wide.unpivot(
        ids=["user_id"],
        values=[f"{t}_value" for t in ts],
        variableColumnName="event_type",
        valueColumnName="total_value",
    )
    return long.filter(F.col("total_value").isNotNull()).select(
        "user_id",
        F.expr("substring(event_type, 1, length(event_type) - 6)").alias(
            "event_type"
        ),
        "total_value",
    )

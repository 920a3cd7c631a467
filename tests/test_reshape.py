"""Pivot/unpivot (operators/reshape.py): round-trip losslessness,
missing-cell semantics, and the plan shapes that matter at scale —
one shuffle for the pivot (no category-discovery job) and a narrow
``Expand`` (no added exchange) for the unpivot."""

from __future__ import annotations

from decimal import Decimal

from pyspark.sql import functions as F

from vector_db_handler_spark.operators import reshape as rs
from vector_db_handler_spark.sources.tables import load_table


def _plan(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def test_pivot_matches_conditional_aggregation(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    wide = {r["user_id"]: r.asDict() for r in rs.pivot_user_type_value(ev).collect()}
    expected = {
        (r["user_id"], r["event_type"]): r["tv"]
        for r in ev.groupBy("user_id", "event_type")
        .agg(F.sum(F.col("value").cast("decimal(18,6)")).cast("double").alias("tv"))
        .collect()
    }
    assert wide  # non-empty corpus
    for uid, row in wide.items():
        for t in rs.EVENT_TYPES:
            assert row[f"{t}_value"] == expected.get((uid, t))  # None where absent


def test_unpivot_roundtrip_is_lossless(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    melted = {
        (r["user_id"], r["event_type"]): r["total_value"]
        for r in rs.unpivot_user_type_value(ev).collect()
    }
    direct = {
        (r["user_id"], r["event_type"]): r["tv"]
        for r in ev.groupBy("user_id", "event_type")
        .agg(F.sum(F.col("value").cast("decimal(18,6)")).cast("double").alias("tv"))
        .collect()
    }
    assert melted == direct  # exact: same keys, bit-identical doubles


def test_pivot_plan_shuffles_cells_not_events(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    plan = _plan(rs.pivot_user_type_value(ev))
    # Spark lowers pivot to two aggregation rounds — groupBy(user,
    # type) then pivotfirst groupBy(user).  Two exchanges, but both
    # fed by partial (map-side-combined) aggregates, so the shuffled
    # volume is the cell matrix, never the raw event count.  Pinning
    # the category list means no collect-distinct discovery job runs.
    # formatted explain prints each node once in the tree and once in
    # the detail section — count the "(n) Exchange" detail headers.
    assert plan.count(") Exchange") == 2
    assert "partial_sum" in plan and "partial_pivotfirst" in plan


def test_unpivot_adds_no_exchange(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    wide_plan = _plan(rs.pivot_user_type_value(ev))
    long_plan = _plan(rs.unpivot_user_type_value(ev))
    # The melt lowers to Expand — a narrow per-row fan-out — so the
    # round trip costs exactly the pivot's own shuffle, nothing more.
    assert "Expand" in long_plan
    assert long_plan.count("Exchange") == wide_plan.count("Exchange")


# ---- property check: roundtrip losslessness over arbitrary corpora ----

from decimal import Decimal as _D

from hypothesis import given, settings, strategies as st

_EVT = st.tuples(
    st.integers(min_value=0, max_value=4),                 # user_id
    st.sampled_from(rs.EVENT_TYPES),                       # event_type
    st.decimals(min_value=-99, max_value=99, places=2),    # value
)
_EVENTS = st.lists(_EVT, min_size=1, max_size=20)


@settings(max_examples=10, deadline=None)
@given(rows=_EVENTS)
def test_roundtrip_matches_direct_aggregate_property(spark, rows):
    ev = spark.createDataFrame(
        [(u, t, float(v)) for u, t, v in rows],
        "user_id long, event_type string, value double",
    )
    melted = {
        (r.user_id, r.event_type): r.total_value
        for r in rs.unpivot_user_type_value(ev).collect()
    }
    expected: dict = {}
    for u, t, v in rows:
        expected[(u, t)] = expected.get((u, t), _D(0)) + _D(str(float(v))).quantize(
            _D("0.000001")
        )
    assert melted == {k: float(v) for k, v in expected.items()}

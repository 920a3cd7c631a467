"""Physical-plan feature extraction for the plan-regression gate.

Wall time on a noisy box catches plan regressions late or never (the
r8 bench drifted +4.3% with zero code changes); the earlier,
machine-checkable signal is the PLAN SHAPE — a broadcast join silently
degrading to sort-merge, a new shuffle appearing in a pipeline, a
nested-loop join sneaking in.  ``plan_features`` reduces a DataFrame's
physical plan to the handful of integer counts that encode that shape;
``tools/plan_baseline.py`` records them for every registered query
into ``PLAN_BASELINE.json`` and ``tests/test_plan_baseline.py`` fails
the suite on ANY drift, so a plan change has to be looked at and
re-baselined deliberately (snapshot-test discipline).

Counts are taken from the "simple" explain string — one line per
physical node, so substring counting is exact.  Under AQE the string
is the INITIAL plan (``isFinalPlan=false``), which is deterministic
for a fixed sf directory and config.  The gate is a SNAPSHOT of that
initial plan, not a bound on the executed one: AQE's runtime
re-optimizations usually shed work (SMJ→BHJ conversion, coalesced
partitions) but can also reshape it — skew-join handling splits
partitions, ``OptimizeShuffleWithLocalRead`` changes exchange shapes —
so the executed plan may legitimately differ from the fingerprint
(ADVICE r9).  What the gate guarantees is narrower and still the
point: any change to the DECLARED plan (a new shuffle, a lost
broadcast) is visible at test time, before wall-clock noise could
hide it.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame

#: feature name -> regex counting its physical nodes in a simple-mode
#: plan string.  \bExchange\b does not match BroadcastExchange or
#: ReusedExchange (no word boundary mid-token), so "exchanges" counts
#: SHUFFLE exchanges only.
_NODE_PATTERNS: dict[str, str] = {
    "exchanges": r"\bExchange\b",
    "broadcast_exchanges": r"\bBroadcastExchange\b",
    "broadcast_hash_joins": r"\bBroadcastHashJoin\b",
    "sort_merge_joins": r"\bSortMergeJoin\b",
    "shuffled_hash_joins": r"\bShuffledHashJoin\b",
    "nested_loop_joins": r"\bBroadcastNestedLoopJoin\b",
    "cartesian_products": r"\bCartesianProduct\b",
}


def plan_string(df: DataFrame, mode: str = "simple") -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
        df._jdf.queryExecution(), mode
    )


def plan_features(df: DataFrame) -> dict[str, int]:
    """Integer plan-shape fingerprint of ``df``'s physical plan."""
    plan = plan_string(df)
    return {
        name: len(re.findall(pat, plan)) for name, pat in _NODE_PATTERNS.items()
    }


def diff_features(
    baseline: dict[str, int], current: dict[str, int]
) -> list[str]:
    """Human-readable list of drifted features (empty = identical)."""
    out = []
    for name in _NODE_PATTERNS:
        b, c = baseline.get(name, 0), current.get(name, 0)
        if b != c:
            arrow = "REGRESSION" if (
                (name in ("exchanges", "sort_merge_joins",
                          "shuffled_hash_joins", "nested_loop_joins",
                          "cartesian_products") and c > b)
                or (name == "broadcast_hash_joins" and c < b)
            ) else "change"
            out.append(f"{name}: {b} -> {c} ({arrow})")
    return out

"""Plan-regression gate over the full query registry (r7/r8 verdict
ask #4): every registered query's physical-plan shape — shuffle
exchange count, join strategies, nested-loop/cartesian appearances —
must match the committed ``PLAN_BASELINE.json`` exactly.

Wall time on this box is too noisy to catch a broadcast join degrading
to sort-merge or a new shuffle appearing; the plan shape is the
deterministic early signal.  On intentional plan changes rerun
``python tools/plan_baseline.py --update`` and justify the new shape
in the commit message.
"""

from __future__ import annotations

import json
import os
import sys

import pytest

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(_REPO, "tools"))

from plan_baseline import BASELINE_PATH, collect_features  # noqa: E402

from vector_db_handler_spark import driver_queries as dq  # noqa: E402
from vector_db_handler_spark.plan_features import diff_features  # noqa: E402


@pytest.fixture(scope="module")
def baseline() -> dict:
    with open(BASELINE_PATH) as f:
        return json.load(f)


def test_baseline_covers_every_registered_query(baseline):
    assert set(baseline["features"]) == set(dq.queries()), (
        "registry and PLAN_BASELINE.json disagree — rerun "
        "tools/plan_baseline.py --update after registering queries"
    )


def test_no_query_plan_drifts_from_baseline(spark, sf_dir, baseline):
    assert baseline["sf_dir"] == sf_dir, (
        "baseline was taken at a different sf directory; plans are "
        "sized from file stats and are not comparable across sf"
    )
    feats, errors = collect_features(spark, sf_dir)
    assert not errors, f"queries failed to plan: {errors}"
    drifted = {
        n: diff_features(baseline["features"].get(n, {}), cur)
        for n, cur in feats.items()
        if diff_features(baseline["features"].get(n, {}), cur)
    }
    assert not drifted, (
        "plan shapes drifted from PLAN_BASELINE.json (broadcast->SMJ "
        "degradation, new shuffles, nested loops?):\n"
        + "\n".join(f"  {n}: {'; '.join(d)}" for n, d in sorted(drifted.items()))
        + "\nIf intentional: python tools/plan_baseline.py --update"
    )

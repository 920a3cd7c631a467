"""Record every registered query's physical-plan shape into
``PLAN_BASELINE.json`` (r7/r8 verdict ask #4).

Usage:
    python tools/plan_baseline.py            # verify against baseline
    python tools/plan_baseline.py --update   # (re)write the baseline

The baseline is taken at the TEST sf directory (sf0.001 — join
strategies are planned from file-size stats, so the baseline pins the
sf it was taken at) and checked by ``tests/test_plan_baseline.py`` on
every suite run.  Any drift fails; rerun with ``--update`` after
confirming the new plan is intentional, and say why in the commit.
"""

from __future__ import annotations

import json
import os
import sys

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)

BASELINE_PATH = os.path.join(_REPO, "PLAN_BASELINE.json")
SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


def collect_features(spark, sf_dir: str) -> tuple[dict, dict]:
    from vector_db_handler_spark import driver_queries as dq
    from vector_db_handler_spark.plan_features import plan_features

    feats: dict[str, dict[str, int]] = {}
    errors: dict[str, str] = {}
    for name, fn in sorted(dq.queries().items()):
        try:
            feats[name] = plan_features(fn(spark, sf_dir))
        except Exception as exc:  # noqa: BLE001 — record, keep going
            errors[name] = f"{type(exc).__name__}: {exc}"[:200]
    return feats, errors


def main() -> None:
    update = "--update" in sys.argv
    from vector_db_handler_spark.session import get_spark

    os.environ.setdefault("SPARK_GRAFT_CPUS", "8")
    spark = get_spark("vdh-plan-baseline")
    spark.sparkContext.setLogLevel("ERROR")
    feats, errors = collect_features(spark, SF_DIR)
    if errors:
        for n, e in errors.items():
            print(f"ERROR {n}: {e}", file=sys.stderr)
        sys.exit(f"{len(errors)} queries failed to plan")

    if update:
        with open(BASELINE_PATH, "w") as f:
            json.dump({"sf_dir": SF_DIR, "features": feats}, f, indent=1, sort_keys=True)
        print(f"baseline written: {len(feats)} queries -> {BASELINE_PATH}")
        return

    from vector_db_handler_spark.plan_features import diff_features

    with open(BASELINE_PATH) as f:
        base = json.load(f)["features"]
    drifted = {
        n: diff_features(base.get(n, {}), cur)
        for n, cur in feats.items()
        if diff_features(base.get(n, {}), cur)
    }
    missing = sorted(set(base) - set(feats))
    new = sorted(set(feats) - set(base))
    for n, d in sorted(drifted.items()):
        print(f"DRIFT {n}: {'; '.join(d)}")
    if missing:
        print(f"in baseline but unregistered: {missing}")
    if new:
        print(f"registered but not in baseline: {new}")
    if drifted or missing or new:
        sys.exit(1)
    print(f"plan baseline clean: {len(feats)} queries")


if __name__ == "__main__":
    main()

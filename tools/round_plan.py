"""Capture UN-truncated plans for the iterative operators (r15 verdict
"plan evidence gaps": committed plans of loop queries are 8-line
checkpoint stubs).  Identity-patches ``localCheckpoint`` so the full
unrolled round bodies stay visible, then writes the formatted plan of
each named query to --plans-dir/<name>_<suffix>.txt.

The patch changes ONLY plan capture (lineage is not truncated); the
captured plan is the exact per-round operator shape the real run
executes between checkpoints.

Usage:
    python tools/round_plan.py --plans-dir DIR --suffix after name...
"""

from __future__ import annotations

import os
import sys

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)

from vector_db_handler_spark import driver_queries as dq  # noqa: E402
from vector_db_handler_spark.session import get_spark  # noqa: E402


def main() -> None:
    args = sys.argv[1:]
    plans_dir = os.path.join(_REPO, "plans", "r16")
    suffix = "round"
    names: list[str] = []
    i = 0
    while i < len(args):
        if args[i] == "--plans-dir":
            plans_dir = args[i + 1]
            i += 2
        elif args[i] == "--suffix":
            suffix = args[i + 1]
            i += 2
        else:
            names.append(args[i])
            i += 1
    os.makedirs(plans_dir, exist_ok=True)

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("round-plan")
    spark.sparkContext.setLogLevel("ERROR")

    from pyspark.sql.classic.dataframe import DataFrame as CDF

    orig = CDF.localCheckpoint
    CDF.localCheckpoint = lambda self, eager=True: self  # type: ignore[method-assign]
    try:
        for name in names:
            fn = dq.queries()[name]
            df = fn(spark, sf_dir)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
            out = os.path.join(plans_dir, f"{name}_{suffix}.txt")
            with open(out, "w") as f:
                f.write(plan)
            print(f"wrote {out} ({plan.count('Exchange')} Exchange nodes)")
    finally:
        CDF.localCheckpoint = orig  # type: ignore[method-assign]


if __name__ == "__main__":
    main()

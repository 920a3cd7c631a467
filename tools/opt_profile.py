"""Round-15 optimization profiler: isolate queries, capture plans.

Usage:
    python tools/opt_profile.py [--reps N] [--plans-dir DIR] name [name ...]

For each named registered query this times ``collect()`` walls exactly
like bench.py (post-warm-up, best of N), plus per-rep job/stage deltas
from the status store (the overhead signal at sf0.1 where data is
tiny), and writes ``<name>.txt`` with the formatted physical plan into
``--plans-dir`` (default: plans/r15/scratch).
"""

from __future__ import annotations

import json
import os
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)

from vector_db_handler_spark import driver_queries as dq  # noqa: E402
from vector_db_handler_spark.session import get_spark  # noqa: E402


def main() -> None:
    args = sys.argv[1:]
    reps = 2
    plans_dir = os.path.join(_REPO, "plans", "r15", "scratch")
    names: list[str] = []
    i = 0
    while i < len(args):
        if args[i] == "--reps":
            # min([]) guard (r15 ADVICE): 0 reps would crash below.
            reps = max(1, int(args[i + 1]))
            i += 2
        elif args[i] == "--plans-dir":
            plans_dir = args[i + 1]
            i += 2
        else:
            names.append(args[i])
            i += 1
    os.makedirs(plans_dir, exist_ok=True)

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("opt-profile")
    spark.sparkContext.setLogLevel("ERROR")
    # Same warm-up as bench.py.
    spark.range(1000).selectExpr("sum(id)").collect()
    from pyspark.sql.functions import broadcast, col, pandas_udf

    _ident = pandas_udf(lambda s: s, "long")
    spark.range(1000).select(_ident(col("id"))).collect()
    spark.range(100).join(broadcast(spark.range(10)), "id").collect()
    for t in ("embeddings", "lineitem", "orders", "documents", "events"):
        path = f"{sf_dir}/{t}.parquet"
        if os.path.exists(path):
            try:
                dq.load(spark, sf_dir, t).limit(1).collect()
            except Exception:  # noqa: BLE001
                pass

    sc = spark.sparkContext

    def _job_stage_counts() -> tuple[int, int]:
        store = sc._jsc.sc().statusStore()
        try:
            sc._jsc.sc().listenerBus().waitUntilEmpty(2000)
        except Exception:  # noqa: BLE001
            pass
        jobs = store.jobsList(None)
        empty = sc._gateway.jvm.java.util.ArrayList()
        noq = sc._gateway.new_array(sc._gateway.jvm.double, 0)
        stages = store.stageList(empty, False, False, noq, empty)
        jmax = max(
            (jobs.apply(i).jobId() for i in range(jobs.size())), default=-1
        )
        smax = max(
            (stages.apply(i).stageId() for i in range(stages.size())), default=-1
        )
        return jmax, smax

    out: dict[str, dict] = {}
    qs = dq.queries()
    for name in names:
        if name not in qs:
            print(f"SKIP unknown query {name}", file=sys.stderr)
            continue
        fn = qs[name]
        walls: list[float] = []
        jobs_per_rep: list[int] = []
        stages_per_rep: list[int] = []
        for r in range(reps):
            sc.setJobDescription(f"opt-profile: {name} rep {r}")
            j0, s0 = _job_stage_counts()
            t0 = time.perf_counter()
            df = fn(spark, sf_dir)
            t_plan = time.perf_counter() - t0
            df.collect()
            wall = time.perf_counter() - t0
            j1, s1 = _job_stage_counts()
            walls.append(round(wall, 4))
            jobs_per_rep.append(j1 - j0)
            stages_per_rep.append(s1 - s0)
            if r == 0:
                try:
                    plan = df._sc._jvm.PythonSQLUtils.explainString(
                        df._jdf.queryExecution(), "formatted"
                    )
                except Exception:  # noqa: BLE001
                    import io
                    from contextlib import redirect_stdout

                    buf = io.StringIO()
                    with redirect_stdout(buf):
                        df.explain("formatted")
                    plan = buf.getvalue()
                with open(os.path.join(plans_dir, f"{name}.txt"), "w") as f:
                    f.write(plan)
                out.setdefault(name, {})["plan_build_s"] = round(t_plan, 4)
            import gc

            gc.collect()
        sc.setJobDescription(None)
        out.setdefault(name, {}).update(
            {
                "walls": walls,
                "best": min(walls) if walls else None,
                "jobs": jobs_per_rep,
                "stages": stages_per_rep,
            }
        )
        print(
            f"{name}: best={min(walls):.3f}s walls={walls} "
            f"jobs={jobs_per_rep} stages={stages_per_rep}",
            flush=True,
        )
    print(json.dumps(out, indent=1, sort_keys=True))


if __name__ == "__main__":
    main()

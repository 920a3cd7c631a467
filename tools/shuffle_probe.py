"""Per-query shuffle-byte probe: bench.py's status-store shuffle-write
capture, runnable for a handful of named queries without the full
bench sweep.

Usage:
    python tools/shuffle_probe.py [--reps N] name [name ...]

Prints, per query, each rep's wall and the total shuffle-write bytes
of the stages the rep created — the same regression signal
BENCH_DETAIL.json records (max over reps)."""

from __future__ import annotations

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
    names: list[str] = []
    i = 0
    while i < len(args):
        if args[i] == "--reps":
            reps = max(1, int(args[i + 1]))
            i += 2
        else:
            names.append(args[i])
            i += 1

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("shuffle-probe")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000).selectExpr("sum(id)").collect()

    sc = spark.sparkContext
    empty = sc._gateway.jvm.java.util.ArrayList()
    noq = sc._gateway.new_array(sc._gateway.jvm.double, 0)

    def highwater_and_bytes(min_stage_id: int) -> tuple[int, int]:
        try:
            sc._jsc.sc().listenerBus().waitUntilEmpty(2000)
        except Exception:  # noqa: BLE001
            pass
        stages = sc._jsc.sc().statusStore().stageList(
            empty, False, False, noq, empty
        )
        total, hi = 0, min_stage_id
        for j in range(stages.size()):
            s = stages.apply(j)
            sid = s.stageId()
            hi = max(hi, sid)
            if sid > min_stage_id:
                total += s.shuffleWriteBytes()
        return hi, total

    qs = dq.queries()
    for name in names:
        if name not in qs:
            print(f"SKIP unknown query {name}", file=sys.stderr)
            continue
        fn = qs[name]
        for r in range(reps):
            hw, _ = highwater_and_bytes(-1)
            t0 = time.perf_counter()
            fn(spark, sf_dir).collect()
            wall = time.perf_counter() - t0
            _, sb = highwater_and_bytes(hw)
            print(
                f"{name} rep{r}: wall={wall:.3f}s shuffle={sb / 1e6:.2f}MB",
                flush=True,
            )
            import gc

            gc.collect()


if __name__ == "__main__":
    main()

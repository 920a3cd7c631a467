#!/usr/bin/env python
"""Benchmark harness: runs the engine's headline queries at
``$SPARK_GRAFT_SF_DIR`` (default /root/testdata/sf0.1) on
``local[$SPARK_GRAFT_CPUS]`` and prints ONE JSON line:

    {"metric": "...", "value": <total sec>, "unit": "sec",
     "queries": {"<name>": sec, ...}, "sf": <sf>}

Each query is executed once after a session warm-up action (JVM spin-up
and parquet footer reads are not what we're measuring); timings are
end-to-end ``collect()`` walls.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from vector_db_handler_spark import driver_queries as dq  # noqa: E402
from vector_db_handler_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").split("sf")[-1]
    spark = get_spark("vdh-bench")

    # Warm up: start the JVM, spawn the Python/Arrow UDF workers, prime
    # the parquet footer cache.
    spark.range(1000).selectExpr("sum(id)").collect()
    from pyspark.sql.functions import broadcast, col, pandas_udf

    _ident = pandas_udf(lambda s: s, "long")
    spark.range(1000).select(_ident(col("id"))).collect()
    # First broadcast join pays one-time exchange/thread-pool spin-up.
    spark.range(100).join(broadcast(spark.range(10)), "id").collect()
    for t in ("embeddings", "lineitem", "orders", "documents", "events"):
        path = f"{sf_dir}/{t}.parquet"
        if os.path.exists(path):
            dq.load(spark, sf_dir, t).limit(1).collect()

    timings: dict[str, float] = {}
    for name, fn in sorted(dq.queries().items()):
        t0 = time.perf_counter()
        fn(spark, sf_dir).collect()
        timings[name] = round(time.perf_counter() - t0, 4)

    total = round(sum(timings.values()), 4)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_wall",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": float(sf) if sf.replace(".", "", 1).isdigit() else sf,
            }
        )
    )


if __name__ == "__main__":
    main()

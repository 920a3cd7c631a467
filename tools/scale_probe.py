#!/usr/bin/env python
"""Scale probe: replicate the embeddings fixture N× (deterministic
jitter so rows are distinct) and measure the vector hot paths at a
corpus 100× the bench fixture.  Evidence for the scaling claims in
PERF.md — run manually, not part of the driver contract."""

from __future__ import annotations

import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from vector_db_handler_spark import driver_queries as dq
from vector_db_handler_spark.operators import knn as knn_ops
from vector_db_handler_spark.operators import similarity as sim_ops
from vector_db_handler_spark.session import get_spark


def main(factor: int = 100) -> None:
    spark = get_spark("scale-probe")
    base = spark.read.parquet("/root/testdata/sf0.1/embeddings.parquet")
    n_base = base.count()
    path = os.path.join(tempfile.gettempdir(), f"vdh_scale_{factor}x")
    if not os.path.exists(path):
        # Deterministic replication: shift ids, jitter one dimension by
        # the replica index so vectors are distinct.
        reps = spark.range(factor).withColumnRenamed("id", "rep")
        big = (
            base.crossJoin(reps)
            .select(
                (F.col("vec_id") + F.col("rep") * n_base).alias("vec_id"),
                F.transform(
                    "embedding", lambda v, i: v + F.when(i == 0, F.col("rep") * 1e-4).otherwise(0.0)
                ).cast("array<float>").alias("embedding"),
                "label",
            )
        )
        big.repartition(32).write.mode("overwrite").parquet(path)
    big = spark.read.parquet(path)
    n = big.count()
    print(f"corpus: {n} rows ({factor}x bench fixture)")

    t0 = time.perf_counter()
    knn_ops.knn(big, dq.QUERY_VEC, k=10, tie_break_col="vec_id").collect()
    t0 = time.perf_counter()  # warm run
    knn_ops.knn(big, dq.QUERY_VEC, k=10, tie_break_col="vec_id").collect()
    print(f"knn_topk  brute-force @ {n} rows: {time.perf_counter() - t0:.2f}s")

    cents = big.filter(F.col("vec_id") % (n // 64) == 0).cache()
    n_cells = cents.count()
    idx_path = path + "_ivf"
    if not os.path.exists(idx_path):
        sim_ops.write_ivf_index(big, cents, idx_path)  # build once, partitioned by cell
    t0 = time.perf_counter()
    sim_ops.ivf_probe_table(spark, idx_path, cents, dq.QUERY_VEC, k=10, nprobe=4).collect()
    t0 = time.perf_counter()  # warm
    sim_ops.ivf_probe_table(spark, idx_path, cents, dq.QUERY_VEC, k=10, nprobe=4).collect()
    print(f"ivf_probe (4/{n_cells} cells, written index) @ {n} rows: {time.perf_counter() - t0:.2f}s")


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 100)

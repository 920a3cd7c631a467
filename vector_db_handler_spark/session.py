"""SparkSession bootstrap.

The reference holds one global client pair (Qdrant client + embedding
HTTP session) built in a FastAPI lifespan hook
(reference ``app/api/routes.py:31-68``); our engine's equivalent
singleton is the SparkSession.

Scale posture: AQE on (runtime shuffle-partition coalescing + skew-join
splitting), shuffle partitions sized for the local core count (on a real
cluster this is set to ~2-3x total cores or left to AQE), UTC session
timezone so results compare cleanly against UTC-naive engines (DuckDB),
Arrow enabled for the Pandas-UDF slow path.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import SparkSession


def get_spark(app_name: str = "vector_db_handler_spark") -> SparkSession:
    """Build (or reuse) the engine's SparkSession.

    ``SPARK_GRAFT_CPUS`` controls local parallelism (default: all cores).
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        # Static conf: bucketed-table tests (saveAsTable) need a
        # writable warehouse; keep it out of the repo tree.
        .config(
            "spark.sql.warehouse.dir",
            os.environ.get(
                "SPARK_GRAFT_WAREHOUSE",
                os.path.join(tempfile.gettempdir(), "vdh_spark_warehouse"),
            ),
        )
    )
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark

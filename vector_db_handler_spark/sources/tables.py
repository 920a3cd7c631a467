"""Fixture-table readers.

The reference's only "source" is the Qdrant scroll API; ours is parquet
(columnar, predicate-pushdown, partition-prunable — the right scan for
100 TB).  One quirk handled here: the ``events`` table stores
``TIMESTAMP(NANOS)`` which Spark's parquet reader rejects by default;
we read nanos as LONG (``spark.sql.legacy.parquet.nanosAsLong`` — a
runtime-settable conf, so it also works under the driver's own session)
and truncate to microsecond TIMESTAMP, matching DuckDB's
``CAST(ts AS TIMESTAMP)`` semantics on the same file.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    path = f"{sf_dir}/{name}.parquet"
    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(path)
        # ns → µs (floor), then to TIMESTAMP — identical to DuckDB's
        # TIMESTAMP_NS → TIMESTAMP cast for the fixture's positive epochs.
        return df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return spark.read.parquet(path)

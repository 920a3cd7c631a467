"""Fixture-table readers.

The reference's only "source" is the Qdrant scroll API; ours is parquet
(columnar, predicate-pushdown, partition-prunable — the right scan for
100 TB).  One quirk handled here: the ``events`` table's physical ``ts``
type has varied across fixture vintages — ``TIMESTAMP(NANOS)`` (which
Spark's parquet reader rejects by default; read nanos-as-LONG via
``spark.sql.legacy.parquet.nanosAsLong`` and truncate to microseconds)
vs ``timestamp[us]`` (read as TIMESTAMP_NTZ; cast to session-local
TIMESTAMP, which under the package's UTC session is an identity on the
stored micros).  ``load_table`` branches on the dtype Spark actually
reads, so either vintage yields the same microsecond TIMESTAMP column,
byte-identical to DuckDB's ``CAST(ts AS TIMESTAMP)`` on the same file.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _normalize_events_ts(df: DataFrame) -> DataFrame:
    """Normalize the fixture's ``ts`` to a microsecond TIMESTAMP.

    Dtype-adaptive so both fixture vintages work:

    * ``LongType`` — the nanos-as-long read of a TIMESTAMP(NANOS)
      column: floor-divide to µs and rebuild the timestamp.
    * ``TimestampNTZType`` — the plain read of a ``timestamp[us]``
      column: cast NTZ → TIMESTAMP (identity on stored micros under
      the UTC session), matching DuckDB's CAST(ts AS TIMESTAMP).
    * ``TimestampType`` — already what we want.
    """
    dtype = df.schema["ts"].dataType
    if isinstance(dtype, T.LongType):
        # ns → µs (floor), then to TIMESTAMP — identical to DuckDB's
        # TIMESTAMP_NS → TIMESTAMP cast for the fixture's positive epochs.
        return df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    if isinstance(dtype, T.TimestampNTZType):
        return df.withColumn("ts", F.col("ts").cast("timestamp"))
    return df


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    path = f"{sf_dir}/{name}.parquet"
    if name == "events":
        # Harmless when the column is already timestamp[us]; required for
        # the TIMESTAMP(NANOS) vintage. Runtime-settable, so it also works
        # under the driver's own session.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        return _normalize_events_ts(spark.read.parquet(path))
    return spark.read.parquet(path)

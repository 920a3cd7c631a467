"""Relation profiling: exact per-column statistics in ONE pass.

No reference analog (the reference never inspects its payloads);
engine surface — this is ``ANALYZE TABLE`` as an operator: the
(row count, null count, distinct count, min, max, mean width) vector
per column that a cost-based optimizer consumes for broadcast/join
decisions, that ingest monitoring alerts on (null-rate spikes, NDV
collapse), and that schema-drift checks diff between snapshots.

Spark-first shape: one ``stack``-based unpivot (narrow Expand, no
shuffle) lowers every profiled column to ``(col, value-as-string,
is_null)`` rows, then ONE map-side-combined groupBy computes all
statistics for all columns together — a single scan of the relation
regardless of column count, vs the naive per-column loop that scans N
times.  Values compare lexicographically after the string cast (the
portable choice — both engines order UTF-8 strings bytewise); numeric
min/max profiling per type belongs to the caller if it needs it.

Exactness: every statistic is an exact integer or an exact string —
``n_distinct`` is a true COUNT DISTINCT (one extra shuffle), not an
HLL estimate, so the output hash-checks cross-engine.  At 100 TB the
swap to ``approx_count_distinct`` is one line and documented here;
the exact form is the oracle-checkable default.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def profile_relation(df: DataFrame, cols: list[str]) -> DataFrame:
    """Exact profile of ``cols`` → one row per column:
    ``(col_name, n_rows, n_null, n_distinct, min_value, max_value,
    sum_len)``.  NULLs are excluded from distinct/min/max/len (SQL
    aggregate convention); ``sum_len`` is the total string-cast width
    (mean width = sum_len / (n_rows - n_null), left to the reader so
    every emitted stat stays an exact integer).  Callers should
    profile string/integer columns — float-to-string formatting is
    engine-specific, so floats belong in a typed numeric profile, not
    this portable one."""
    pairs = ", ".join(
        f"'{c}', CAST({c} AS STRING)" for c in cols
    )
    long = df.select(
        F.expr(f"stack({len(cols)}, {pairs}) AS (col, val)")
    )
    return (
        long.groupBy("col")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum(F.col("val").isNull().cast("long")).alias("n_null"),
            F.countDistinct("val").alias("n_distinct"),
            F.min("val").alias("min_value"),
            F.max("val").alias("max_value"),
            F.sum(F.coalesce(F.length("val"), F.lit(0)).cast("long")).alias(
                "sum_len"
            ),
        )
        .withColumnRenamed("col", "col_name")
    )

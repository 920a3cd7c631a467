"""Feature-engineering operators: distributed global ranking, exact
equi-depth binning, and Markov transition features.

No analog in the reference (vector CRUD only); extension surface —
these are the tabular features a training pipeline derives next to
text/embedding signals.

The interesting primitive is ``global_rank``: an exact dense total
rank over an arbitrarily large relation.  The naive formulation —
``row_number() OVER (ORDER BY ...)`` with no PARTITION BY — collapses
the whole relation into ONE window partition (Spark literally warns
"No Partition Defined for Window operation"), serializing the sort on
a single task: correct at fixture scale, dead at 100 TB.  The
distributed idiom implemented here:

1. range-repartition by the order key (Spark samples boundaries —
   this is the same machinery as a distributed ORDER BY);
2. per-partition ``row_number`` (window keyed on the PARTITION ID —
   parallel, partition-local);
3. add per-partition offsets (a driver-side prefix sum over the
   partition COUNTS — numPartitions integers, never rows).

The result is bit-identical to the single-partition window because
the order key is made TOTAL (callers must include a tie-break
column), which is also what makes it hash-checkable cross-engine.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def global_rank(
    df: DataFrame,
    order_cols: list[str],
    rank_col: str = "rank",
    num_partitions: int | None = None,
) -> DataFrame:
    """Exact 1-based global rank by ``order_cols`` (must form a total
    order — include a unique tie-break column), computed without a
    single-partition window.  Adds ``rank_col``; preserves all input
    columns."""
    cols = [F.col(c).asc() for c in order_cols]
    parts = num_partitions or df.sparkSession.conf.get(
        "spark.sql.shuffle.partitions"
    )
    ranged = df.repartitionByRange(int(parts), *cols).withColumn(
        "_pid", F.spark_partition_id()
    )
    # Cache: the partition census and the ranked output must see the
    # SAME partitioning (range boundaries are sampled, hence not
    # guaranteed stable across recomputes).
    ranged = ranged.localCheckpoint(eager=True)
    counts = {
        r._pid: r.cnt
        for r in ranged.groupBy("_pid").agg(F.count(F.lit(1)).alias("cnt")).collect()
    }
    offsets, acc = {}, 0
    for pid in sorted(counts):
        offsets[pid] = acc
        acc += counts[pid]
    off_expr: Column = F.lit(0)
    for pid, off in offsets.items():
        off_expr = F.when(F.col("_pid") == pid, off).otherwise(off_expr)
    w = Window.partitionBy("_pid").orderBy(*cols)
    return (
        ranged.withColumn(rank_col, F.row_number().over(w) + off_expr)
        .drop("_pid")
    )


def equi_depth_bins(
    df: DataFrame,
    value_col: str,
    tie_break_col: str,
    n_bins: int = 10,
) -> DataFrame:
    """Exact equi-depth (quantile) binning: bin i gets rows with
    ``(rank-1)·n_bins // N == i`` — the portable closed form (NTILE's
    remainder rule differs between engines; this formula is pure
    integer arithmetic every engine evaluates identically).  Returns
    the input plus ``bin``.  At 100 TB the rank comes from
    ``global_rank`` (distributed); the binning itself is a stateless
    projection."""
    ranked = global_rank(df, [value_col, tie_break_col], rank_col="_rnk")
    n = df.count()
    return ranked.withColumn(
        "bin", F.expr(f"(( _rnk - 1) * {n_bins}) div {n}")
    ).drop("_rnk")


def transition_counts(
    df: DataFrame,
    key_col: str,
    order_cols: list[str],
    state_col: str,
    start_sentinel: str = "START",
) -> DataFrame:
    """Per-key first-order Markov transition counts and probabilities
    over the state sequence ordered by ``order_cols``: one row per
    (prev_state, state) with ``n`` and ``p = n / Σ_prev n`` (exact
    integer counts; the probability is ONE correctly-rounded division,
    so cross-engine hashing holds).  The first event of each key
    transitions from ``start_sentinel`` — a data value, not NULL, so
    downstream comparators never see null cells.  One shuffle on the
    key for the lag, one map-side-combined count."""
    w = Window.partitionBy(key_col).orderBy(*[F.col(c).asc() for c in order_cols])
    pairs = df.select(
        F.coalesce(F.lag(state_col).over(w), F.lit(start_sentinel)).alias(
            "prev_state"
        ),
        F.col(state_col).alias("state"),
    )
    counts = pairs.groupBy("prev_state", "state").agg(
        F.count(F.lit(1)).alias("n")
    )
    wp = Window.partitionBy("prev_state")
    return counts.select(
        "prev_state",
        "state",
        "n",
        F.round(
            F.col("n").cast("double") / F.sum("n").over(wp).cast("double"), 6
        ).alias("p"),
    )

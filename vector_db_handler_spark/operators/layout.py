"""Data-layout operators: Z-order (Morton) clustering for
multi-dimensional scan pruning.

At 100 TB the dominant query cost is the scan, and the dominant scan
saving is SKIPPING: parquet row-group/file min-max stats prune ranges
the predicate can't touch — but only if rows are physically clustered
so each file covers a narrow range of the filter columns.  Sorting by
one column clusters that column and scatters every other; interleaving
the bits of TWO columns (the Z-order / Morton curve — what Delta's
``OPTIMIZE ZORDER BY`` and Iceberg's sort orders do) gives every file
a small rectangle in BOTH dimensions, so predicates on either column
skip most files.

Exactness: the z-value is pure integer bit algebra — identical in any
engine — and the generator below emits the SAME formula once for
Spark SQL and once for DuckDB SQL (only the shift spelling differs:
``shiftleft/shiftright`` functions vs ``<<``/``>>`` operators), so
oracle parity holds by construction.

Scale notes: ``write_zordered`` is ``repartitionByRange(z) →
sortWithinPartitions(z) → write``: one range-exchange (sampled
boundaries — Spark handles skew by sampling), no global sort barrier,
and every output file gets a contiguous z-range ⇒ bounded ranges in
both source dimensions.  The layout-stats query is the hash-checkable
surface; the file-disjointness pytest is the skipping proof.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: bits interleaved per dimension (32-bit z-value for two dims).
Z_BITS = 16


def z_expr_sql(x: str, y: str, bits: int = Z_BITS, dialect: str = "spark") -> str:
    """The interleave formula as SQL text: x occupies even bit
    positions, y odd.  ``dialect`` picks the shift spelling
    ('spark' → shiftleft()/shiftright(); 'duckdb' → << / >>); the bit
    algebra is IDENTICAL, which is the parity argument."""
    lo = f"CAST({x} AS BIGINT) & {(1 << bits) - 1}"
    hi = f"CAST({y} AS BIGINT) & {(1 << bits) - 1}"
    terms = []
    for b in range(bits):
        if dialect == "spark":
            terms.append(f"shiftleft(shiftright({lo}, {b}) & 1, {2 * b})")
            terms.append(f"shiftleft(shiftright({hi}, {b}) & 1, {2 * b + 1})")
        else:
            # Fully parenthesized: Postgres-family precedence puts
            # << / >> BELOW +, so an unwrapped term would re-associate
            # across the join.
            terms.append(f"(((({lo}) >> {b}) & 1) << {2 * b})")
            terms.append(f"(((({hi}) >> {b}) & 1) << {2 * b + 1})")
    return "(" + " + ".join(terms) + ")"


def with_z_value(
    df: DataFrame, x_col: str, y_col: str, bits: int = Z_BITS, out_col: str = "z"
) -> DataFrame:
    """Append the Morton z-value of (x_col, y_col) — a single native
    integer expression (64 shift/mask terms), zero shuffle."""
    return df.withColumn(out_col, F.expr(z_expr_sql(x_col, y_col, bits, "spark")))


def zorder_layout_stats(
    df: DataFrame,
    x_col: str,
    y_col: str,
    bucket_shift: int = 24,
    bits: int = Z_BITS,
) -> DataFrame:
    """Per-z-bucket locality profile: row count plus min/max of BOTH
    source dimensions — the evidence that every bucket (≈ output file)
    covers a small rectangle, i.e. that predicates on either column
    would skip most buckets.  One map-side-combined shuffle on the
    bucket key."""
    z = F.expr(z_expr_sql(x_col, y_col, bits, "spark"))
    return (
        df.withColumn("zb", F.shiftright(z, bucket_shift))
        .groupBy("zb")
        .agg(
            F.count("*").alias("n_rows"),
            F.min(x_col).alias("x_min"),
            F.max(x_col).alias("x_max"),
            F.min(y_col).alias("y_min"),
            F.max(y_col).alias("y_max"),
        )
        .select("zb", "n_rows", "x_min", "x_max", "y_min", "y_max")
    )


def write_zordered(
    df: DataFrame,
    path: str,
    x_col: str,
    y_col: str,
    n_files: int = 8,
    bits: int = Z_BITS,
) -> None:
    """Materialize the z-clustered layout: range-partition on z (one
    sampled-boundary exchange), sort within each partition, write one
    file per partition.  Each file's z-range is contiguous and
    DISJOINT from every other file's — parquet min/max stats on z (or
    on the source columns, which a z-range bounds) then prune at
    planning time.  The skipping proof lives in
    ``tests/test_layout.py``."""
    zed = with_z_value(df, x_col, y_col, bits)
    (
        zed.repartitionByRange(int(n_files), F.col("z"))
        .sortWithinPartitions("z")
        .write.mode("overwrite")
        .parquet(path)
    )

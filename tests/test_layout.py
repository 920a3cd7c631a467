"""Z-order layout (operators/layout.py): interleave correctness vs a
Python reference, and the SKIPPING proof — files written by
``write_zordered`` carry disjoint z-ranges and bounded rectangles in
both source dimensions (the property parquet min/max pruning feeds
on), where a single-column sort unboundedly scatters the other
dimension."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from vector_db_handler_spark.operators.layout import (
    with_z_value,
    write_zordered,
    z_expr_sql,
)


def _interleave(x: int, y: int, bits: int = 16) -> int:
    z = 0
    for b in range(bits):
        z |= ((x >> b) & 1) << (2 * b)
        z |= ((y >> b) & 1) << (2 * b + 1)
    return z


@pytest.fixture(scope="module")
def grid(spark):
    rows = [(i, i % 50, (i * 7) % 40) for i in range(2000)]
    return spark.createDataFrame(rows, "id long, x long, y long")


def test_z_value_matches_python_reference(spark, grid):
    got = with_z_value(grid, "x", "y").select("x", "y", "z").collect()
    for r in got:
        assert r.z == _interleave(r.x, r.y), (r.x, r.y)


def test_duckdb_dialect_matches_spark(spark, grid, duck):
    import pandas as pd

    pdf = grid.toPandas()
    duck.register("grid_t", pdf)
    odf = duck.sql(
        f"SELECT x, y, {z_expr_sql('x', 'y', dialect='duckdb')} AS z FROM grid_t"
    ).df()
    for _, r in odf.iterrows():
        assert int(r.z) == _interleave(int(r.x), int(r.y))
    duck.unregister("grid_t")


def test_written_files_have_disjoint_z_ranges(spark, grid, tmp_path):
    path = str(tmp_path / "zorder")
    write_zordered(grid, path, "x", "y", n_files=8)
    back = spark.read.parquet(path)
    per_file = (
        back.groupBy(F.input_file_name().alias("f"))
        .agg(F.min("z").alias("zmin"), F.max("z").alias("zmax"))
        .collect()
    )
    assert len(per_file) >= 4
    spans = sorted((r.zmin, r.zmax) for r in per_file)
    for (a0, a1), (b0, b1) in zip(spans, spans[1:]):
        assert a1 < b0, "file z-ranges overlap — range partitioning broken"


def test_zorder_bounds_both_dimensions(spark, grid, tmp_path):
    """The skipping argument, quantified: under z-order each file's
    x-range AND y-range stay well under the global range; under a
    plain x-sort the y-range per file is ~global (no pruning for y
    predicates)."""
    zpath, spath = str(tmp_path / "z"), str(tmp_path / "s")
    write_zordered(grid, zpath, "x", "y", n_files=8)
    (
        grid.repartitionByRange(8, F.col("x"))
        .sortWithinPartitions("x")
        .write.mode("overwrite")
        .parquet(spath)
    )

    def avg_frac(path, col, global_span):
        df = spark.read.parquet(path)
        rows = (
            df.groupBy(F.input_file_name().alias("f"))
            .agg((F.max(col) - F.min(col)).alias("span"))
            .collect()
        )
        return sum(r.span for r in rows) / len(rows) / global_span

    x_span = 49.0
    y_span = 39.0
    # z-order: both dims bounded per file
    assert avg_frac(zpath, "x", x_span) < 0.7
    assert avg_frac(zpath, "y", y_span) < 0.7
    # x-sort: y is scattered — nearly every file spans all of y
    assert avg_frac(spath, "y", y_span) > 0.9

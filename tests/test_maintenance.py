"""Compaction (operators/maintenance.py): deterministic plan shape,
the greedy bound, and a lossless executed rewrite."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from vector_db_handler_spark.operators.maintenance import (
    compact,
    compaction_plan,
    file_census,
)


@pytest.fixture()
def small_files(spark, tmp_path):
    """A table fragmented into ~24 tiny files (3 appends × 8 parts) —
    the shape incremental ingest leaves behind."""
    path = str(tmp_path / "frag")
    for i in range(3):
        (
            spark.range(i * 1000, (i + 1) * 1000)
            .withColumn("v", F.col("id") * 2)
            .repartition(8)
            .write.mode("append")
            .parquet(path)
        )
    return path


def test_census_is_metadata_only(spark, small_files):
    census = file_census(spark, small_files).collect()
    assert len(census) == 24
    assert all(r.bytes > 0 for r in census)


def test_plan_deterministic_and_bounded(spark, small_files):
    sizes = {r.file: r.bytes for r in file_census(spark, small_files).collect()}
    target = 4 * max(sizes.values())
    p1 = sorted(compaction_plan(spark, small_files, target).collect())
    p2 = sorted(compaction_plan(spark, small_files, target).collect())
    assert p1 == p2, "plan must be deterministic"
    by_bucket: dict[int, int] = {}
    for r in p1:
        by_bucket[r.bucket] = by_bucket.get(r.bucket, 0) + r.bytes
    # greedy bound: a bucket exceeds target by at most one file
    assert all(v < target + max(sizes.values()) for v in by_bucket.values())
    # buckets are contiguous in path order
    ordered = [r.bucket for r in sorted(p1, key=lambda r: r.file)]
    assert ordered == sorted(ordered)
    assert len(by_bucket) < len(sizes), "plan must actually merge files"


def test_compact_preserves_rows_and_shrinks_files(spark, small_files, tmp_path):
    out = str(tmp_path / "compacted")
    sizes = [r.bytes for r in file_census(spark, small_files).collect()]
    n_buckets = compact(spark, small_files, out, target_bytes=4 * max(sizes))
    assert 0 < n_buckets < 24
    before = spark.read.parquet(small_files)
    after = spark.read.parquet(out).drop("bucket")  # write-partition col
    assert after.count() == before.count() == 3000
    assert sorted(after.columns) == sorted(before.columns)
    assert (
        before.select(F.sum("v")).collect()[0][0]
        == after.select(F.sum("v")).collect()[0][0]
    )
    n_files_after = file_census(spark, out).count()
    assert n_files_after == n_buckets


def test_compact_empty_dir(spark, tmp_path):
    src = str(tmp_path / "empty_src")
    spark.range(0).write.parquet(src)  # parquet dir with 0-row files
    out = str(tmp_path / "empty_out")
    n = compact(spark, src, out, target_bytes=1 << 20)
    assert n >= 0  # degenerate input handled without raising

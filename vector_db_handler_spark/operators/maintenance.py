"""Storage maintenance: small-file compaction planning + execution.

Every incremental ingest path in this repo (LSH index append, IVF/PQ
cell appends, streaming sinks, the store's staged-write deletes)
accumulates one file per batch per partition — the classic small-files
problem: at 100 TB a table can hold millions of KB-sized files whose
open/footer costs dwarf the data read.  Delta/Iceberg solve it with
``OPTIMIZE`` / rewrite actions; this is the same maintenance pass done
Spark-native.

Design:

* the file CENSUS is metadata-only — ``binaryFile`` lists paths and
  sizes from the filesystem without reading a byte of data content
  (``pathGlobFilter`` keeps it to parquet parts);
* the PLAN is deterministic greedy bin-packing in lexicographic path
  order: running byte sum, bucket = floor(cum_before / target) — a
  window cumsum over the (tiny) census, entirely driver-free;
* EXECUTION joins the plan (broadcast — it is census-sized) against
  the data on ``input_file_name()`` and writes each bucket as one
  file via ``repartition(bucket)``: one shuffle whose volume is the
  compacted data itself, which is the floor for any rewrite.

A bucket can exceed ``target_bytes`` by at most one file (greedy
boundary — standard) and single oversized files keep their own bucket
untouched."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F


def file_census(spark: SparkSession, path: str, glob: str = "*.parquet") -> DataFrame:
    """(file, bytes) for every data file under ``path`` — a
    metadata-only listing (binaryFile reads lazily; we never touch
    ``content``)."""
    return (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", glob)
        .load(path)
        .select(F.col("path").alias("file"), F.col("length").alias("bytes"))
    )


def compaction_plan(
    spark: SparkSession, path: str, target_bytes: int, glob: str = "*.parquet"
) -> DataFrame:
    """Greedy bin-packing plan: ``(file, bytes, bucket)`` with buckets
    assigned by running-sum division in path order.  Deterministic —
    the same listing always yields the same plan."""
    census = file_census(spark, path, glob)
    w = Window.orderBy("file").rowsBetween(Window.unboundedPreceding, -1)
    return census.select(
        "file",
        "bytes",
        (
            F.coalesce(F.sum("bytes").over(w), F.lit(0)) / F.lit(int(target_bytes))
        )
        .cast("long")
        .alias("bucket"),
    )


def compact(
    spark: SparkSession,
    path: str,
    out_path: str,
    target_bytes: int,
    glob: str = "*.parquet",
) -> int:
    """Execute the plan: rewrite ``path`` into ``out_path`` with one
    file per bucket.  Returns the number of buckets written.  The only
    data movement is one repartition keyed by the plan's bucket —
    shuffle volume equals the data being compacted (the rewrite
    floor); the plan itself rides a broadcast."""
    plan = compaction_plan(spark, path, target_bytes, glob)
    n_buckets = plan.agg(F.countDistinct("bucket")).collect()[0][0]
    if n_buckets == 0:
        return 0

    # binaryFile reports "file:/p"; input_file_name() reports
    # "file:///p" — normalize both to a bare path before joining.
    def norm(c):
        return F.regexp_replace(c, "^[a-zA-Z0-9]+:/+", "/")

    data = spark.read.parquet(path).withColumn("_f", norm(F.input_file_name()))
    (
        data.join(F.broadcast(plan), data["_f"] == norm(plan["file"]))
        .repartition(int(n_buckets), "bucket")
        .drop("_f", "file", "bytes")
        .write.mode("overwrite")
        # partitionBy splits by VALUE at write time, so every bucket
        # gets exactly one file even when the hash repartition lands
        # two bucket ids in the same task (hash collisions merge
        # partitions, never split buckets).
        .partitionBy("bucket")
        .parquet(out_path)
    )
    return int(n_buckets)

"""Schema evolution on the parquet tables: the contract a long-lived
100 TB dataset depends on — old files keep reading after the schema
gains a column (absent column → null), and new files keep reading
under the old projection (extra column pruned at the scan).  Spark
provides both via explicit-schema reads; these tests pin that the
engine's read pattern (schema-enforced, never inferred) actually
delivers them, including through the MoR store's versioned reads."""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql import types as T


def test_old_files_read_under_widened_schema(spark, tmp_path):
    path = str(tmp_path / "tbl")
    spark.createDataFrame(
        [(1, "a"), (2, "b")], "id long, name string"
    ).write.mode("append").parquet(path)
    # schema gains a column; old files stay as-is
    widened = T.StructType(
        [
            T.StructField("id", T.LongType()),
            T.StructField("name", T.StringType()),
            T.StructField("score", T.DoubleType()),
        ]
    )
    spark.createDataFrame(
        [(3, "c", 0.5)], widened
    ).write.mode("append").parquet(path)

    got = {
        r.id: (r.name, r.score)
        for r in spark.read.schema(widened).parquet(path).collect()
    }
    assert got == {1: ("a", None), 2: ("b", None), 3: ("c", 0.5)}


def test_new_files_read_under_old_projection_with_pruning(spark, tmp_path):
    path = str(tmp_path / "tbl2")
    spark.createDataFrame(
        [(1, "a", 0.5)], "id long, name string, score double"
    ).write.mode("append").parquet(path)
    old = T.StructType(
        [T.StructField("id", T.LongType()), T.StructField("name", T.StringType())]
    )
    df = spark.read.schema(old).parquet(path)
    assert [tuple(r) for r in df.collect()] == [(1, "a")]
    # the extra column never reaches the scan
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "score" not in plan.split("ReadSchema")[-1][:200]


def test_filters_on_added_column_treat_old_files_as_null(spark, tmp_path):
    path = str(tmp_path / "tbl3")
    spark.createDataFrame([(1,)], "id long").write.mode("append").parquet(path)
    schema = T.StructType(
        [T.StructField("id", T.LongType()), T.StructField("flag", T.BooleanType())]
    )
    spark.createDataFrame([(2, True)], schema).write.mode("append").parquet(path)
    df = spark.read.schema(schema).parquet(path)
    assert [r.id for r in df.filter(F.col("flag")).collect()] == [2]
    assert sorted(r.id for r in df.filter(F.col("flag").isNull()).collect()) == [1]

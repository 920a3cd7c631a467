"""Int8 quantization properties the end-to-end oracle can't isolate:
quantized ranking approximates exact cosine ranking (recall), values
stay in int8 range, and the top-k lowers to TakeOrderedAndProject."""

from __future__ import annotations

from pyspark.sql import functions as F

from vector_db_handler_spark import driver_queries as dq
from vector_db_handler_spark.operators import knn as knn_ops
from vector_db_handler_spark.operators import quantize as quantize_ops


def _emb(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet")


def test_qvec_values_fit_int8(spark, sf_dir):
    q = quantize_ops.quantize_int8(_emb(spark, sf_dir))
    stats = q.select(
        F.min(F.array_min("qvec")).alias("lo"), F.max(F.array_max("qvec")).alias("hi")
    ).collect()[0]
    assert -127 <= stats["lo"] and stats["hi"] <= 127
    # the max-|x| component must hit full range — at whichever sign
    assert max(stats["hi"], -stats["lo"]) == 127


def test_quantized_recall_vs_exact(spark, sf_dir):
    emb = _emb(spark, sf_dir)
    k = 10
    exact = {
        r["vec_id"]
        for r in knn_ops.knn(
            emb, dq.QUERY_VEC, k=k, score_threshold=None, tie_break_col="vec_id"
        ).collect()
    }
    quant = {
        r["vec_id"]
        for r in quantize_ops.quantized_knn(emb, dq.QUERY_VEC, k=k).collect()
    }
    # dot-product ranking (unnormalized) vs cosine differs by row norm;
    # the fixture's rows are near-unit so overlap stays high.
    assert len(exact & quant) >= 6, (exact, quant)


def test_quantized_knn_plan_takeordered_no_collect(spark, sf_dir):
    df = quantize_ops.quantized_knn(_emb(spark, sf_dir), dq.QUERY_VEC, k=10)
    plan = df._sc._jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), "formatted")
    assert "TakeOrderedAndProject" in plan
    # the scale is a broadcast, never a driver collect at plan time
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan


def test_quantize_matches_driver_twin(spark, sf_dir):
    # quantize_vector (driver-side single query) must agree with the
    # distributed kernel given the same scale.
    emb = _emb(spark, sf_dir)
    s = quantize_ops.max_abs_scale(emb).collect()[0]["s"]
    row = emb.orderBy("vec_id").limit(1).collect()[0]
    got = quantize_ops.quantize_int8(emb).filter(F.col("vec_id") == row["vec_id"]).collect()[0]["qvec"]
    want = quantize_ops.quantize_vector(row["embedding"], s)
    assert list(got) == want


def test_zero_and_empty_corpus_edges(spark):
    from pyspark.sql import functions as F

    zero = spark.createDataFrame(
        [(1, [0.0] * 4), (2, [0.0] * 4)], "vec_id long, embedding array<float>"
    )
    got = quantize_ops.quantized_knn(zero, [0.0] * 4, k=2).collect()
    assert [(r["vec_id"], r["qscore"]) for r in got] == [(1, 0), (2, 0)]
    empty = zero.filter(F.lit(False))
    assert quantize_ops.quantized_knn(empty, [1.0] * 4, k=2).collect() == []


def test_ivfsq_probe_prunes_partitions_and_recalls(spark, sf_dir, tmp_path):
    """The IVF-SQ8 probe must (a) prune cell partitions at planning
    time, (b) rank by exact integer scores, and (c) approximate the
    exact cosine top-k despite the double approximation (cell pruning
    + int8)."""
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    cents = emb.filter(F.col("vec_id") % 100 == 0)
    path = str(tmp_path / "ivfsq")
    quantize_ops.write_ivfsq_index(emb, cents, path)

    df = quantize_ops.ivfsq_probe_table(spark, path, cents, dq.QUERY_VEC, k=10, nprobe=3)
    plan = df._sc._jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), "formatted")
    assert "PartitionFilters" in plan
    assert "cell_id" in plan.split("PartitionFilters")[1].splitlines()[0]
    assert "TakeOrderedAndProject" in plan

    got = {r["vec_id"] for r in df.collect()}
    exact = {
        r["vec_id"]
        for r in knn_ops.knn(
            emb, dq.QUERY_VEC, k=10, score_threshold=None, tie_break_col="vec_id"
        ).collect()
    }
    assert len(got & exact) >= 5, (got, exact)

"""Product-quantization properties (operators/pq.py) on constructed
inputs — the fixture train/encode/score parity runs in
test_oracle_queries.py against the one-statement SQL replay."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from vector_db_handler_spark.operators.pq import (
    pq_adc_topk,
    pq_encode,
    train_pq_codebooks,
)


def test_codebook_shape_and_seed_labels(spark, sf_dir):
    books = train_pq_codebooks(
        spark.read.parquet(f"{sf_dir}/embeddings.parquet"), m=4, k=8, iters=1
    )
    rows = books.collect()
    assert len(rows) == 4 * 8 * 16  # m * k * d_sub
    assert {r.sub for r in rows} == set(range(4))
    # cluster labels are the SEED vec_ids (0..7 present in the fixture)
    assert {r.cluster_id for r in rows} == set(range(8))
    assert {r.pos for r in rows} == set(range(16))
    # every codeword component stays on the int8 grid
    assert all(-127 <= r.c_val <= 127 for r in rows)


def test_adc_equals_code_reconstruction_dot(spark, sf_dir):
    """The ADC lookup-table score must equal the dot product of the
    quantized query with each vector's RECONSTRUCTION (its codewords
    concatenated) — the defining identity of PQ scoring, checked in
    exact integers."""
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").limit(100)
    books = train_pq_codebooks(emb, m=4, k=8, iters=1)
    book = {
        (r.sub, r.cluster_id, r.pos): r.c_val for r in books.collect()
    }
    codes = {
        (r.vec_id, r.sub): r.code for r in pq_encode(emb, books).collect()
    }
    from vector_db_handler_spark.driver_queries import QUERY_VEC
    from vector_db_handler_spark.operators.quantize import (
        max_abs_scale,
        quantize_vector,
    )

    s = float(max_abs_scale(emb, "embedding").collect()[0]["s"])
    qq = quantize_vector(QUERY_VEC, s)
    got = {
        r.vec_id: r.qscore
        for r in pq_adc_topk(emb, books, QUERY_VEC, k=100).collect()
    }
    for vec_id, score in got.items():
        recon = [
            book[(sub, codes[(vec_id, sub)], p)]
            for sub in range(4)
            for p in range(16)
        ]
        assert score == sum(int(a) * int(b) for a, b in zip(qq, recon))


def test_codes_shrink_storage(spark, sf_dir):
    """M codes per vector (4 here) versus dim SQ8 bytes (64): the
    compression PQ exists for.  Encoded relation has exactly m rows
    per vector with codes drawn from the seed-id vocabulary."""
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").limit(50)
    books = train_pq_codebooks(emb, m=4, k=8, iters=1)
    codes = pq_encode(emb, books)
    per_vec = codes.groupBy("vec_id").agg(F.count("*").alias("n")).collect()
    assert all(r.n == 4 for r in per_vec) and len(per_vec) == 50
    assert codes.agg(F.max("code")).collect()[0][0] <= 7


def test_empty_and_bad_dim(spark):
    empty = spark.createDataFrame([], "vec_id long, embedding array<float>")
    assert train_pq_codebooks(empty, m=4, k=8).count() == 0
    assert pq_encode(empty, train_pq_codebooks(empty)).count() == 0
    assert pq_adc_topk(empty, train_pq_codebooks(empty), [0.0] * 64).count() == 0
    bad = spark.createDataFrame(
        [(1, [0.1] * 10)], "vec_id long, embedding array<float>"
    )
    with pytest.raises(ValueError, match="divisible"):
        train_pq_codebooks(bad, m=4, k=2)


def test_ivfpq_probe_prunes_partitions_and_reads_codes_only(spark, sf_dir, tmp_path):
    """The IVF-PQ probe must (a) prune cell partitions at planning
    time, (b) read ONLY the M-byte codes column from the surviving
    scan, (c) lower the top-k to TakeOrderedAndProject, and (d) track
    its OWN exactness target: the ADC approximates the SQ8 integer-dot
    ranking (same quantized query, same grid), so the fidelity
    baseline is ``quantized_knn``'s top-k — not the cosine top-k,
    which ranks by a different (normalized) score.  At M=16 sub-spaces
    (4 dims each) the overlap is 5/10 on this fixture,
    deterministically; 12-bit codes (M=4, K=8 — the oracle's params,
    chosen for one-statement SQL) are too coarse for ranking fidelity
    and exist to certify pipeline CORRECTNESS, which the driver hash
    row does."""
    from vector_db_handler_spark import driver_queries as dq
    from vector_db_handler_spark.operators import quantize as qz
    from vector_db_handler_spark.operators.pq import (
        ivfpq_probe_topk,
        write_ivfpq_index,
    )

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    cents = emb.filter(F.col("vec_id") % 100 == 0)
    books = train_pq_codebooks(emb, m=16, k=8, iters=2)
    path = str(tmp_path / "ivfpq")
    write_ivfpq_index(emb, cents, books, path)

    df = ivfpq_probe_topk(spark, path, cents, dq.QUERY_VEC, k=10, nprobe=3)
    plan = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )
    assert "PartitionFilters" in plan
    assert "cell_id" in plan.split("PartitionFilters")[1].splitlines()[0]
    assert "TakeOrderedAndProject" in plan
    scan_schema = plan.split("ReadSchema")[1].splitlines()[0]
    assert "codes" in scan_schema and "embedding" not in scan_schema

    # Fidelity (no cell pruning, to isolate PQ error): ADC top-10 vs
    # the SQ8 integer-dot top-10.
    adc = {
        r["vec_id"]
        for r in pq_adc_topk(emb, books, dq.QUERY_VEC, k=10).collect()
    }
    sq8 = {r["vec_id"] for r in qz.quantized_knn(emb, dq.QUERY_VEC, k=10).collect()}
    assert len(adc & sq8) >= 4, (adc, sq8)


def test_ivfpq_empty_corpus(spark, tmp_path):
    from vector_db_handler_spark.operators.pq import (
        ivfpq_probe_topk,
        write_ivfpq_index,
    )

    empty = spark.createDataFrame([], "vec_id long, embedding array<float>")
    books = train_pq_codebooks(empty)
    path = str(tmp_path / "ivfpq_empty")
    write_ivfpq_index(empty, empty, books, path)
    assert ivfpq_probe_topk(spark, path, empty, [0.0] * 64).count() == 0

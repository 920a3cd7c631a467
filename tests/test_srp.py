"""SRP-LSH (operators/srp.py): signature determinism, candidate
soundness (every reported pair really clears the exact integer-cosine
threshold), recall against the exact all-pairs baseline, and the
hot-bucket guard."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from vector_db_handler_spark.operators import srp as srp_ops
from vector_db_handler_spark.operators.quantize import quantize_int8

NUM, DEN = 9, 20  # threshold 0.45, same as the registered query


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet")


def _exact_int8_pairs(spark, emb):
    """Ground truth: exact all-pairs integer-cosine test on the int8
    grid, computed in numpy (fixture-sized)."""
    rows = quantize_int8(emb).collect()
    ids = np.array([r.vec_id for r in rows])
    x = np.array([r.qvec for r in rows], dtype=np.int64)
    g = x @ x.T
    n2 = np.diag(g)
    ok = (g > 0) & (DEN * DEN * g * g >= NUM * NUM * np.outer(n2, n2))
    out = set()
    for i in range(len(ids)):
        for j in range(len(ids)):
            if ok[i, j] and ids[i] < ids[j]:
                out.add((int(ids[i]), int(ids[j])))
    return out


def test_planes_deterministic_and_pm1():
    p1 = srp_ops.srp_planes(64, 16, 7)
    p2 = srp_ops.srp_planes(64, 16, 7)
    assert p1 == p2
    assert {v for row in p1 for v in row} == {-1, 1}
    assert srp_ops.srp_planes(64, 16, 8) != p1


def test_bands_must_divide_bits(spark, emb):
    with pytest.raises(ValueError):
        srp_ops.srp_neardup_pairs(emb, n_bits=16, n_bands=5)


def test_pairs_sound_and_recall(spark, emb):
    exact = _exact_int8_pairs(spark, emb)
    got = {
        (r.id1, r.id2)
        for r in srp_ops.srp_neardup_pairs(
            emb, threshold_num=NUM, threshold_den=DEN
        ).collect()
    }
    # soundness: the verify step is exact, so no false positives ever
    assert got <= exact
    # recall is probabilistic in general but DETERMINISTIC for a fixed
    # corpus+seed: pin the achieved fraction so a geometry/signature
    # regression is loud.  (At threshold .45 the 32-bit/8-band default
    # theoretically recalls ~81% of borderline pairs; true near-dups
    # at cosine ≥ .9 would recall at ~99.4%.)
    if exact:
        assert len(got) / len(exact) >= 0.5


def test_signature_bits_match_numpy(spark, emb):
    planes = srp_ops.srp_planes(64, 16, 7)
    sigs = {r.vec_id: r.sig for r in srp_ops.srp_signatures(emb, planes).collect()}
    rows = quantize_int8(emb).collect()
    p = np.array(planes, dtype=np.int64)
    for r in rows[:50]:
        dots = p @ np.array(r.qvec, dtype=np.int64)
        want = sum(1 << b for b in range(16) if dots[b] >= 0)
        assert sigs[r.vec_id] == want


def test_hot_bucket_guard_prunes_identical_vectors(spark):
    # 300 identical vectors: every band bucket has 300 members — a
    # guard at 200 must yield ZERO candidates (quadratic blowup
    # averted); raising the guard above 300 finds all pairs.
    n = 300
    rows = [(i, [1.0] * 64) for i in range(n)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    guarded = srp_ops.srp_neardup_pairs(emb, max_bucket=200).count()
    assert guarded == 0
    open_ = srp_ops.srp_neardup_pairs(emb, max_bucket=n + 1).count()
    assert open_ == n * (n - 1) // 2


def test_empty_corpus(spark):
    emb = spark.createDataFrame([], "vec_id long, embedding array<double>")
    out = srp_ops.srp_neardup_pairs(emb)
    assert out.count() == 0
    assert [f.name for f in out.schema.fields] == ["id1", "id2", "score"]


def _query_sig(planes, qv):
    sig = 0
    for b, plane in enumerate(planes):
        if sum(int(x) * int(y) for x, y in zip(qv, plane)) >= 0:
            sig |= 1 << b
    return sig


def test_binary_hamming_finds_planted_near_dup(spark, sf_dir):
    """The regime binary codes are FOR: a true near-dup (cosine ≈ 1)
    of the query must rank first by Hamming — 60 sign bits nearly all
    agree, far from the ~30/60 random-pair baseline."""
    from pyspark.sql import functions as _F

    from vector_db_handler_spark import driver_queries as dq
    from vector_db_handler_spark.operators.quantize import (
        max_abs_scale,
        quantize_vector,
    )

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    twin = [v * 1.001 for v in dq.QUERY_VEC]
    emb = emb.unionByName(
        spark.createDataFrame(
            [(999_999, twin, 0)], "vec_id long, embedding array<double>, label long"
        ).select(
            "vec_id", _F.col("embedding").cast("array<float>").alias("embedding"), "label"
        )
    )
    planes = srp_ops.srp_planes(64, 60, 7)
    sigs = srp_ops.srp_signatures(emb, planes)
    s = float(max_abs_scale(emb).collect()[0]["s"])
    qsig = _query_sig(planes, quantize_vector(dq.QUERY_VEC, s))
    top = (
        sigs.select(
            "vec_id",
            F.bit_count(F.col("sig").bitwiseXOR(F.lit(qsig))).alias("h"),
        )
        .orderBy(F.col("h").asc(), F.col("vec_id").asc())
        .limit(1)
        .collect()[0]
    )
    assert top.vec_id == 999_999
    assert top.h <= 5, f"near-dup Hamming should be ~0, got {top.h}"


def test_binary_hamming_candidate_recall_weak_regime(spark, sf_dir):
    """The fixture's exact top-10 neighbors sit at cosine ≤ 0.45 —
    binary quantization's WORST regime (sign agreement barely above
    the random 30/60 baseline).  Pin the measured candidate-recall
    curve so a regression is loud, and document the honest number:
    recall@100-of-500 = 0.5 here, vs rank-1 retrieval of true
    near-dups in the planted test above."""
    from vector_db_handler_spark import driver_queries as dq
    from vector_db_handler_spark.operators import knn as knn_ops
    from vector_db_handler_spark.operators.quantize import (
        max_abs_scale,
        quantize_vector,
    )

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    exact = {
        r.vec_id
        for r in knn_ops.knn(
            emb, dq.QUERY_VEC, k=10, tie_break_col="vec_id"
        ).collect()
    }
    planes = srp_ops.srp_planes(64, 60, 7)
    sigs = srp_ops.srp_signatures(emb, planes)
    s = float(max_abs_scale(emb).collect()[0]["s"])
    qsig = _query_sig(planes, quantize_vector(dq.QUERY_VEC, s))
    cand = {
        r.vec_id
        for r in sigs.select(
            "vec_id",
            F.bit_count(F.col("sig").bitwiseXOR(F.lit(qsig))).alias("h"),
        )
        .orderBy(F.col("h").asc(), F.col("vec_id").asc())
        .limit(100)
        .collect()
    }
    recall = len(exact & cand) / len(exact)
    assert recall >= 0.5, f"weak-regime candidate recall regressed: {recall}"


def test_multiprobe_recall_dominates_exact_banding(spark, emb):
    """Multi-probe must (a) stay sound, (b) find a strict superset of
    the exact-band pairs, (c) reach near-total recall of the exact
    ground truth at the borderline threshold where plain banding
    plateaus around 80%."""
    exact = _exact_int8_pairs(spark, emb)
    plain = {
        (r.id1, r.id2)
        for r in srp_ops.srp_neardup_pairs(
            emb, threshold_num=NUM, threshold_den=DEN
        ).collect()
    }
    multi = {
        (r.id1, r.id2)
        for r in srp_ops.srp_multiprobe_pairs(
            emb, threshold_num=NUM, threshold_den=DEN
        ).collect()
    }
    assert multi <= exact  # soundness: exact verify can't false-positive
    assert plain <= multi  # 1-bit probing only ADDs candidates
    if exact:
        assert len(multi) / len(exact) >= 0.9

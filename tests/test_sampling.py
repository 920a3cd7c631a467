"""Deterministic-sampling properties: reproducibility under
re-execution, salt independence (disjoint splits), exact per-group k,
and the zero-shuffle plan shape of the stateless filters."""

from __future__ import annotations

import re

from pyspark.sql import functions as F

from vector_db_handler_spark.operators import sampling as sampling_ops


def _docs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def test_hash_sample_is_reproducible(spark, sf_dir):
    docs = _docs(spark, sf_dir)
    a = {r["doc_id"] for r in sampling_ops.hash_sample(docs, 0.2, "doc_id").collect()}
    b = {r["doc_id"] for r in sampling_ops.hash_sample(docs.repartition(13), 0.2, "doc_id").collect()}
    assert a == b, "sample must not depend on partitioning"
    n = docs.count()
    assert 0.1 * n < len(a) < 0.3 * n


def test_disjoint_hash_ranges_make_disjoint_splits(spark, sf_dir):
    # train/holdout from one scan: same salt, complementary ranges.
    docs = _docs(spark, sf_dir)
    bucket = sampling_ops.sample_bucket(F.col("doc_id"))
    train = {r["doc_id"] for r in docs.filter(bucket < 8000).collect()}
    hold = {r["doc_id"] for r in docs.filter(bucket >= 8000).collect()}
    assert train.isdisjoint(hold)
    assert len(train) + len(hold) == docs.count()


def test_different_salts_give_different_samples(spark, sf_dir):
    docs = _docs(spark, sf_dir)
    a = {r["doc_id"] for r in sampling_ops.hash_sample(docs, 0.2, "doc_id", salt="s1").collect()}
    b = {r["doc_id"] for r in sampling_ops.hash_sample(docs, 0.2, "doc_id", salt="s2").collect()}
    assert a != b  # independent draws (overlap ~4%, not identity)


def test_per_group_sample_exact_k(spark, sf_dir):
    docs = _docs(spark, sf_dir)
    out = sampling_ops.per_group_sample_k(docs, k=7, group_col="lang", key_col="doc_id")
    sizes = {r["lang"]: r["n"] for r in out.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    group_sizes = {r["lang"]: r["n"] for r in docs.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    assert sizes == {g: min(7, n) for g, n in group_sizes.items()}


def test_stratified_sample_plans_without_shuffle(spark, sf_dir):
    docs = _docs(spark, sf_dir)
    df = sampling_ops.stratified_sample(
        docs, rates={"en": 0.3}, strata_col="lang", key_col="doc_id", default_frac=0.1
    )
    plan = df._sc._jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), "formatted")
    assert "Exchange" not in plan, "stateless filter must fuse into the scan"
    assert "Join" not in plan


def test_stratified_sample_works_unchanged_on_a_stream(spark, sf_dir, tmp_path):
    """Stateless hash filters are batch=stream by construction: the
    SAME operator call runs on a readStream and selects the SAME
    rows.  This is the point of sampling by key hash — a streaming
    ingest and a batch backfill provably draw identical samples."""
    from vector_db_handler_spark.streaming import stream_ops

    docs = _docs(spark, sf_dir)
    want = {
        r["doc_id"]
        for r in sampling_ops.stratified_sample(
            docs, rates={"en": 0.3}, strata_col="lang", key_col="doc_id",
            default_frac=0.1,
        ).collect()
    }
    stream = stream_ops.stream_documents(spark, sf_dir)
    sampled = sampling_ops.stratified_sample(
        stream, rates={"en": 0.3}, strata_col="lang", key_col="doc_id",
        default_frac=0.1,
    )
    q = (
        sampled.writeStream.format("memory")
        .queryName("sample_stream")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {r["doc_id"] for r in spark.sql("SELECT doc_id FROM sample_stream").collect()}
    assert got == want


def test_temperature_weights_rebalance_toward_sqrt_mass(spark, sf_dir):
    """T=2 weights: the rarest stratum gets exactly 1.0, every weight is
    in (0, 1], and expected sampled mass n_l * w_l is proportional to
    sqrt(n_l) (checked pairwise to 1e-4 after the 6-decimal rounding)."""
    rows = sampling_ops.temperature_weights(
        _docs(spark, sf_dir), "lang", temperature=2.0
    ).collect()
    n_min = min(r.n_docs for r in rows)
    ratios = []
    for r in rows:
        assert 0.0 < r.doc_weight <= 1.0
        if r.n_docs == n_min:
            assert r.doc_weight == 1.0
        ratios.append((r.n_docs * r.doc_weight) / (r.n_docs**0.5))
    assert max(ratios) - min(ratios) < 1e-3 * max(ratios)


def test_temperature_one_is_natural_distribution(spark, sf_dir):
    rows = sampling_ops.temperature_weights(
        _docs(spark, sf_dir), "lang", temperature=1.0
    ).collect()
    assert all(r.doc_weight == 1.0 for r in rows)


def test_resample_epoch_repeats_and_fractional_gate(spark):
    from vector_db_handler_spark.operators.sampling import (
        SAMPLE_BUCKETS,
        resample_epoch,
        sample_bucket,
    )

    df = spark.createDataFrame(
        [(i, 23_700) for i in range(200)] + [(i, 5_000) for i in range(200, 400)],
        "doc_id long, rate_bp long",
    )
    out = resample_epoch(df, "rate_bp", "doc_id")
    per_doc = {
        r.doc_id: r.n
        for r in out.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    gates = {
        r.doc_id: r.g
        for r in df.select(
            "doc_id", sample_bucket(F.col("doc_id"), "epoch").alias("g")
        ).collect()
    }
    for d in range(200):  # 2.37×: exactly 2 or 3 copies, gate decides
        want = 2 + (1 if gates[d] < 23_700 % SAMPLE_BUCKETS else 0)
        assert per_doc[d] == want, d
    for d in range(200, 400):  # 0.5×: kept docs appear exactly once
        assert per_doc.get(d, 0) == (1 if gates[d] < 5_000 else 0), d
    # determinism: a second materialization is identical
    again = {
        r.doc_id: r.n
        for r in resample_epoch(df, "rate_bp", "doc_id")
        .groupBy("doc_id").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert again == per_doc
    # a different epoch salt re-rolls WHICH docs carry the fractional
    # 3rd copy (while total mass stays ≈ rate): the two epochs must
    # disagree on at least one doc's copy count
    other = {
        r.doc_id: r.n
        for r in resample_epoch(df, "rate_bp", "doc_id", salt="epoch3")
        .groupBy("doc_id").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert any(other[d] != per_doc[d] for d in range(200))


# ---------------------------------------------------------------------------
# weighted_systematic_sample
# ---------------------------------------------------------------------------

import pytest as _pytest

from vector_db_handler_spark.operators.sampling import weighted_systematic_sample


def _wdf(spark, rows):
    return spark.createDataFrame(rows, "id long, w long")


def test_wss_matches_sequential_reference_and_partition_invariant(spark):
    """Hit counts equal a sequential Python replay of the Madow
    interleave, identically at 1 and 32 partitions."""
    rows = [(i, (i * 7) % 13 + 1) for i in range(200)]
    k = 17
    want = {}
    cum = 0
    total = sum(w for _, w in rows)  # order by id == order_cols
    for i, w in rows:
        lo, hi = cum, cum + w
        hits = (hi * k) // total - (lo * k) // total
        if hits > 0:
            want[i] = (lo, hits)
        cum = hi
    for parts in (1, 32):
        got = {
            r.id: (r.cum_lo, r.n_hits)
            for r in weighted_systematic_sample(
                _wdf(spark, rows).repartition(parts), "w", k, ["id"]
            ).collect()
        }
        assert got == want
    assert sum(h for _, h in want.values()) == k  # exactly k hits total


def test_wss_heavy_item_hits_multiple_times(spark):
    rows = [(1, 1), (2, 100), (3, 1)]
    got = {
        r.id: r.n_hits
        for r in weighted_systematic_sample(_wdf(spark, rows), "w", 10, ["id"]).collect()
    }
    assert got[2] >= 9  # ~100/102 of the mass
    assert sum(got.values()) == 10


def test_wss_guards(spark):
    with _pytest.raises(ValueError):
        weighted_systematic_sample(_wdf(spark, [(1, 1)]), "w", 0, ["id"])
    with _pytest.raises(ValueError):
        weighted_systematic_sample(
            _wdf(spark, [(1, -5), (2, 3)]), "w", 2, ["id"]
        )
    with _pytest.raises(ValueError):
        weighted_systematic_sample(_wdf(spark, [(1, 0), (2, 0)]), "w", 2, ["id"])
    with _pytest.raises(ValueError):
        weighted_systematic_sample(
            spark.createDataFrame([(None, 2)], "id long, w long"), "w", 2, ["id"]
        )

"""Sketch operators: approximate answers verified against exact
results with explicit error bounds (they can't hash-match a SQL
oracle by nature)."""

from __future__ import annotations

from pyspark.sql import functions as F

from vector_db_handler_spark.functions.text import portable_hash60
from vector_db_handler_spark.operators import sketches
from vector_db_handler_spark.sources.tables import load_table


def test_approx_distinct_within_rsd(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    approx = {
        r["event_type"]: r["approx_distinct"]
        for r in sketches.approx_distinct_by(ev, "event_type", "user_id").collect()
    }
    exact = {
        r["event_type"]: r["n"]
        for r in ev.groupBy("event_type").agg(F.countDistinct("user_id").alias("n")).collect()
    }
    assert approx.keys() == exact.keys()
    for k in exact:
        assert abs(approx[k] - exact[k]) <= max(3, 0.15 * exact[k]), (k, approx[k], exact[k])


def test_quantiles_bracket_exact_median(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    q50, q95, q99 = sketches.value_quantiles(ev, "value").collect()[0]["quantiles"]
    assert q50 <= q95 <= q99
    exact_med = ev.agg(F.expr("percentile(value, 0.5)").alias("m")).collect()[0]["m"]
    spread = ev.agg((F.max("value") - F.min("value")).alias("s")).collect()[0]["s"]
    assert abs(q50 - exact_med) <= 0.05 * spread


def _hashed_docs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", portable_hash60(F.col("text")).alias("text_hash")
    )


def test_bloom_prefilter_splits_without_false_negatives(spark, sf_dir):
    docs = _hashed_docs(spark, sf_dir)
    seen = docs.filter(F.col("doc_id") % 2 == 0).select("text_hash")
    seen_hashes = {r["text_hash"] for r in seen.collect()}
    definitely_novel, maybe = sketches.dedup_bloom_prefilter(docs, seen)
    novel_hashes = {r["text_hash"] for r in definitely_novel.collect()}
    maybe_ids = {r["doc_id"] for r in maybe.collect()}
    # no false negatives: nothing flagged definitely-novel is truly seen
    assert not (novel_hashes & seen_hashes)
    # every truly-seen row lands on the maybe side
    truly_seen_ids = {
        r["doc_id"] for r in docs.collect() if r["text_hash"] in seen_hashes
    }
    assert truly_seen_ids <= maybe_ids
    # the split is a partition of the input
    assert definitely_novel.count() + maybe.count() == docs.count()


def test_bloom_prefilter_empty_seen_is_identity(spark, sf_dir):
    docs = _hashed_docs(spark, sf_dir)
    empty = docs.filter(F.lit(False)).select("text_hash")
    novel, maybe = sketches.dedup_bloom_prefilter(docs, empty)
    assert novel.count() == docs.count()
    assert maybe.count() == 0


def test_bloom_distributed_build_matches_driver_build(spark, sf_dir):
    docs = _hashed_docs(spark, sf_dir)
    seen = docs.filter(F.col("doc_id") % 3 == 0).select("text_hash").repartition(7)
    bits_d, m_d, k_d = sketches.build_bloom(seen, distributed=False)
    bits_x, m_x, k_x = sketches.build_bloom(seen, distributed=True)
    assert (m_d, k_d) == (m_x, k_x)
    assert (bits_d == bits_x).all()


def test_incremental_novel_docs_exact_even_at_high_fpp(spark, sf_dir):
    docs = _hashed_docs(spark, sf_dir)
    seen = docs.filter(F.col("doc_id") % 2 == 0).select("text_hash")
    # fpp=0.5 forces bloom false positives; the exact rescue join must
    # still produce exactly the anti-join result
    for distributed in (False, True):
        got = sketches.incremental_novel_docs(docs, seen, fpp=0.5, distributed=distributed)
        expect = docs.join(seen.distinct(), "text_hash", "left_anti")
        assert {r["doc_id"] for r in got.collect()} == {
            r["doc_id"] for r in expect.collect()
        }


def test_kmv_estimate_within_expected_error(spark, sf_dir):
    """KMV relative error is ~1/sqrt(k-2); with k=64 a 3-sigma bound is
    ~38%.  Assert each group's estimate lands within 40% of the exact
    distinct count (deterministic fixtures -> deterministic margin)."""
    ev = load_table(spark, sf_dir, "events")
    got = {
        r.event_type: (r.n_kept, r.distinct_est)
        for r in sketches.kmv_distinct_by(ev, "event_type", "user_id", k=64).collect()
    }
    exact = {
        r.event_type: r.n
        for r in ev.groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    assert set(got) == set(exact)
    for etype, (n_kept, est) in got.items():
        if n_kept < 64:
            assert est == exact[etype], f"{etype}: sub-k group must be exact"
        else:
            rel = abs(est - exact[etype]) / exact[etype]
            assert rel < 0.40, f"{etype}: est={est} exact={exact[etype]} rel={rel:.2f}"


def test_kmv_salted_two_pass_matches_naive_single_window(spark, sf_dir):
    """The fanout-salted two-pass top-k must select EXACTLY the rows a
    single per-group window would (the oracle's plan) — for any fanout."""
    ev = load_table(spark, sf_dir, "events")
    base = sketches.kmv_distinct_by(ev, "event_type", "user_id", k=32, fanout=1)
    for fanout in (4, 64):
        alt = sketches.kmv_distinct_by(ev, "event_type", "user_id", k=32, fanout=fanout)
        assert sorted(map(tuple, base.collect())) == sorted(map(tuple, alt.collect()))


def test_cms_never_underestimates_and_bounds_error(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    sketch = sketches.cms_build(ev, "user_id", depth=4, width=256)
    probe = ev.select("user_id").distinct()
    est = {
        r.user_id: r.cms_est
        for r in sketches.cms_point_estimates(
            sketch, probe, "user_id", depth=4, width=256
        ).collect()
    }
    exact = {
        r.user_id: r.n
        for r in ev.groupBy("user_id").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    n_total = sum(exact.values())
    bound = 2 * n_total / 256  # CMS overshoot bound per hash row, e*N/w style
    assert set(est) == set(exact)
    over = [est[u] - exact[u] for u in exact]
    assert all(o >= 0 for o in over), "CMS must never underestimate"
    # with depth=4 rows, essentially every estimate sits under the bound
    assert sum(o <= bound for o in over) >= 0.95 * len(over)


def test_cms_sketches_merge_by_sum(spark, sf_dir):
    """CMS(A ∪ B) == groupBy-SUM of CMS(A) + CMS(B) — counter-exact
    mergeability is what makes the sketch streamable/shardable."""
    ev = load_table(spark, sf_dir, "events")
    a = ev.filter(F.col("event_id") % 2 == 0)
    b = ev.filter(F.col("event_id") % 2 == 1)
    merged = (
        sketches.cms_build(a, "user_id")
        .unionByName(sketches.cms_build(b, "user_id"))
        .groupBy("row_id", "bucket")
        .agg(F.sum("cnt").alias("cnt"))
    )
    whole = sketches.cms_build(ev, "user_id")
    assert sorted(map(tuple, merged.collect())) == sorted(map(tuple, whole.collect()))


# ---------------------------------------------------------------------------
# kmv_overlap_pairs
# ---------------------------------------------------------------------------

from vector_db_handler_spark.operators.sketches import kmv_overlap_pairs


def test_kmv_overlap_exact_below_k(spark):
    """Two small sets (|A|=6, |B|=5, |A∩B|=3): the union sketch holds
    everything, so every estimate is exact."""
    rows = [("A", v) for v in [1, 2, 3, 4, 5, 6]] + [
        ("B", v) for v in [4, 5, 6, 7, 8]
    ]
    out = kmv_overlap_pairs(
        spark.createDataFrame(rows, "g string, v long"), "g", "v", k=64
    ).collect()
    assert len(out) == 1
    r = out[0]
    assert (r.g1, r.g2) == ("A", "B")
    assert r.n_union_kept == 8  # |A ∪ B|
    assert r.n_common == 3
    assert r.union_est == 8.0
    assert r.intersection_est == 3.0


def test_kmv_overlap_estimates_within_bounds(spark):
    """500-element sets with true overlap 250 at k=128: union and
    intersection estimates land within 3 standard errors
    (~3/sqrt(k) ≈ 26%)."""
    a = [("A", v) for v in range(750)]
    b = [("B", v) for v in range(500, 1250)]
    out = kmv_overlap_pairs(
        spark.createDataFrame(a + b, "g string, v long"), "g", "v", k=128
    ).collect()[0]
    true_union, true_inter = 1250, 250
    assert abs(out.union_est - true_union) / true_union < 0.26
    assert abs(out.intersection_est - true_inter) / true_inter < 0.80
    assert 0.0 <= out.jaccard_est <= 1.0


def test_kmv_overlap_partition_invariant(spark):
    """Deterministic under any input partitioning (hash selection has
    no ties; integer windows break none)."""
    rows = [(f"g{i % 3}", v) for i, v in enumerate(range(900))]
    df1 = spark.createDataFrame(rows, "g string, v long").repartition(1)
    df32 = spark.createDataFrame(rows, "g string, v long").repartition(32)
    r1 = sorted(map(tuple, kmv_overlap_pairs(df1, "g", "v", k=32).collect()))
    r32 = sorted(map(tuple, kmv_overlap_pairs(df32, "g", "v", k=32).collect()))
    assert r1 == r32
    assert len(r1) == 3  # 3 groups -> 3 pairs


def test_bloom_small_ledger_autoselect_is_bit_identical(spark, sf_dir):
    """ADVICE r8: below driver_threshold the distributed entry point
    builds driver-side with the distributed (m, k) sizing — the bitmap
    must be bit-identical to the forced-distributed build, including
    under an n_hint over-estimate."""
    docs = _hashed_docs(spark, sf_dir)
    seen = docs.filter(F.col("doc_id") % 3 == 0).select("text_hash").repartition(7)
    forced = sketches.build_bloom(seen, distributed=True, driver_threshold=0)
    auto = sketches.build_bloom(seen, distributed=True)  # small -> driver path
    assert forced is not None and auto is not None
    assert (forced[1], forced[2]) == (auto[1], auto[2])
    assert (forced[0] == auto[0]).all()
    # n_hint over-estimate: sizing comes from the hint on BOTH paths
    hint = seen.count() * 3
    forced_h = sketches.build_bloom(
        seen, distributed=True, n_hint=hint, driver_threshold=0
    )
    auto_h = sketches.build_bloom(seen, distributed=True, n_hint=hint)
    assert (forced_h[1], forced_h[2]) == (auto_h[1], auto_h[2])
    assert (forced_h[0] == auto_h[0]).all()

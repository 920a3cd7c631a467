"""Similarity-operator properties that the row-level oracle can't see:
IVF recall against the brute-force baseline, and the probe actually
pruning its scan to the probed cells."""

from __future__ import annotations

from pyspark.sql import functions as F

from vector_db_handler_spark import driver_queries as dq
from vector_db_handler_spark.operators import knn as knn_ops
from vector_db_handler_spark.operators import similarity as sim_ops


def _emb(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet")


def test_ivf_recall_vs_bruteforce(spark, sf_dir):
    emb = _emb(spark, sf_dir)
    cents = emb.filter(F.expr(dq._IVF_CENTROID_PRED))
    k = 10
    exact = {
        r["vec_id"]
        for r in knn_ops.knn(emb, dq.QUERY_VEC, k=k, score_threshold=None,
                             tie_break_col="vec_id").collect()
    }
    approx = {
        r["vec_id"]
        for r in sim_ops.ivf_topk(emb, cents, dq.QUERY_VEC, k=k, nprobe=2).collect()
    }
    recall = len(exact & approx) / k
    # 2 of 5 cells probed; the fixture's top hits concentrate near the
    # query direction, so recall stays well above the 40% cell fraction.
    assert recall >= 0.5, f"IVF recall@{k} = {recall}"


def test_ivf_probe_scans_fewer_rows(spark, sf_dir):
    emb = _emb(spark, sf_dir)
    cents = emb.filter(F.expr(dq._IVF_CENTROID_PRED))
    indexed = sim_ops.build_ivf_index(emb, cents)
    n_total = emb.count()
    probed_ids = [
        r["cell_id"]
        for r in sim_ops.ivf_probe(indexed, cents, dq.QUERY_VEC, k=5, nprobe=2)
        .select("cell_id").distinct().collect()
    ]
    assert len(probed_ids) <= 2
    n_probed = indexed.filter(F.col("cell_id").isin(probed_ids)).count()
    assert n_probed < n_total, "probe must scan a strict subset of the corpus"


def test_cosine_topk_join_matches_per_query_knn(spark, sf_dir):
    emb = _emb(spark, sf_dir)
    queries = emb.filter(F.col("vec_id") < 3)
    batch = sim_ops.cosine_topk_join(emb, queries, k=4).collect()
    by_query = {}
    for r in batch:
        by_query.setdefault(r["query_id"], []).append(r["neighbor_id"])
    for qrow in queries.collect():
        expected = [
            r["vec_id"]
            for r in knn_ops.knn(
                emb.filter(F.col("vec_id") != qrow["vec_id"]),
                list(qrow["embedding"]), k=4, score_threshold=None,
                tie_break_col="vec_id",
            ).collect()
        ]
        assert by_query[qrow["vec_id"]] == expected


def test_ivf_with_kmeans_centroids(spark, sf_dir):
    # Production build path: learned centroids must give at least the
    # recall of the fixed-stride test centroids at the same nprobe.
    emb = _emb(spark, sf_dir)
    cents = sim_ops.train_centroids(emb, k=5)
    assert cents.count() == 5
    k = 10
    exact = {
        r["vec_id"]
        for r in knn_ops.knn(emb, dq.QUERY_VEC, k=k, score_threshold=None,
                             tie_break_col="vec_id").collect()
    }
    approx = {
        r["vec_id"]
        for r in sim_ops.ivf_topk(emb, cents, dq.QUERY_VEC, k=k, nprobe=2).collect()
    }
    assert len(exact & approx) / k >= 0.5


def test_written_ivf_index_prunes_partitions(spark, sf_dir, tmp_path):
    from pyspark.sql import functions as F

    emb = _emb(spark, sf_dir)
    cents = emb.filter(F.expr(dq._IVF_CENTROID_PRED))
    path = str(tmp_path / "ivf")
    sim_ops.write_ivf_index(emb, cents, path)
    probed = sim_ops.ivf_probe_table(spark, path, cents, dq.QUERY_VEC, k=5, nprobe=2)
    plan = probed._sc._jvm.PythonSQLUtils.explainString(
        probed._jdf.queryExecution(), "formatted"
    )
    # The cell predicate must be a PLANNING-time partition filter on
    # the scan, not a post-scan filter.
    assert "PartitionFilters" in plan and "cell_id" in plan.split("PartitionFilters")[1].splitlines()[0]
    assert len(probed.collect()) == 5


def test_ann_neardup_matches_exact_allpairs(spark, sf_dir):
    """100%-recall check at fixture scale: the ANN-candidate near-dup
    (multi-probe cells + exact verify) must return EXACTLY the pairs
    the exact all-pairs pass returns — same ids, same rounded scores.
    The corpus carries planted ~0.999-cosine twins (the fixture's
    random unit vectors top out near 0.6, below the 0.9 threshold),
    so the expected pair set is exactly the planted pairs."""
    corpus, cents = dq._ann_neardup_inputs(spark, sf_dir)
    exact = {
        (r["id1"], r["id2"], r["score"])
        for r in sim_ops.cosine_neardup_pairs(
            corpus, dq._ANN_NEARDUP_THRESHOLD
        ).collect()
    }
    ann = {
        (r["id1"], r["id2"], r["score"])
        for r in sim_ops.cosine_neardup_ann(
            corpus, cents, dq._ANN_NEARDUP_THRESHOLD, nprobe=dq._ANN_NEARDUP_NPROBE
        ).collect()
    }
    assert ann == exact
    assert len(ann) > 0, "fixture must contain near-dup pairs at this threshold"
    # Exactly the planted (orig, twin) pairs, nothing natural.
    assert all(
        i2 == i1 + dq._ANN_TWIN_OFFSET and i1 % dq._ANN_TWIN_STEP == 0
        for i1, i2, _ in ann
    )


def test_ann_neardup_candidates_are_sparse(spark, sf_dir):
    """The point of the ANN path: the candidate stage must be
    SUB-QUADRATIC, not an obfuscated all-pairs (with K cells and
    nprobe probes the co-probe fraction is ~nprobe²/K — measured
    ~12% here, ~0.1% at a production K=4096).  Guard: candidates
    < 30% of all pairs while recall (previous test) stays 100%."""
    corpus, cents = dq._ann_neardup_inputs(spark, sf_dir)
    n = corpus.count()
    assigned = sim_ops.multi_assign_cells(
        corpus, cents, nprobe=dq._ANN_NEARDUP_NPROBE
    )
    a = assigned.select("cell_id", F.col("vec_id").alias("id1"))
    b = assigned.select("cell_id", F.col("vec_id").alias("id2"))
    cands = (
        a.join(b, ["cell_id"])
        .filter(F.col("id1") < F.col("id2"))
        .select("id1", "id2")
        .distinct()
        .count()
    )
    assert cands < 0.3 * n * (n - 1) / 2, f"{cands} candidates for n={n}"


def test_ann_neardup_plan_has_no_allpairs_stage(spark, sf_dir):
    """The scale contract: candidates come from a cell_id equi-join —
    the plan must contain NO grouped-map block-pair stage (that is the
    O(N²) operator this query exists to avoid) and no cartesian/nested-
    loop join; row growth is the nprobe explode only."""
    corpus, cents = dq._ann_neardup_inputs(spark, sf_dir)
    df = sim_ops.cosine_neardup_ann(
        corpus, cents, dq._ANN_NEARDUP_THRESHOLD, nprobe=dq._ANN_NEARDUP_NPROBE
    )
    plan = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )
    assert "FlatMapGroupsInPandas" not in plan
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan
    assert "Generate" in plan  # the nprobe explode
    # Any EQUI join strategy is fine (AQE picks broadcast at fixture
    # scale, sort-merge/shuffled-hash at 100 TB); nested-loop is not.
    assert any(
        j in plan for j in ("SortMergeJoin", "ShuffledHashJoin", "BroadcastHashJoin")
    )


def test_ivf_append_matches_full_rebuild(spark, sf_dir, tmp_path):
    """Appending new vectors into a written IVF index must answer
    probes exactly like a from-scratch rebuild over the full corpus
    (same centroids — the geometry is fixed at build time)."""
    from vector_db_handler_spark import driver_queries as dq

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    cents = emb.filter(F.col("vec_id") % 50 == 0)

    inc = str(tmp_path / "ivf_inc")
    sim_ops.write_ivf_index(emb.filter(F.col("vec_id") < 300), cents, inc)
    sim_ops.append_ivf_index(emb.filter(F.col("vec_id") >= 300), cents, inc)

    full = str(tmp_path / "ivf_full")
    sim_ops.write_ivf_index(emb, cents, full)

    got = sim_ops.ivf_probe_table(spark, inc, cents, dq.QUERY_VEC, k=10, nprobe=3).collect()
    want = sim_ops.ivf_probe_table(spark, full, cents, dq.QUERY_VEC, k=10, nprobe=3).collect()
    assert [tuple(r) for r in got] == [tuple(r) for r in want]
    assert any(r["vec_id"] >= 300 for r in got), "appended rows must be probe-reachable"


def test_mrl_full_shortlist_degenerates_to_exact_topk(spark, sf_dir):
    """With shortlist = |corpus| the prefix stage prunes nothing, so
    the pipeline must return exactly the brute-force full-dim top-k."""
    from vector_db_handler_spark import driver_queries as dq
    from vector_db_handler_spark.operators.similarity import mrl_prefix_rerank

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    n = emb.count()
    got = [
        (r.vec_id, r.score)
        for r in mrl_prefix_rerank(
            emb, dq.QUERY_VEC, prefix_dims=16, shortlist=n, k=10
        ).collect()
    ]
    want = [
        (r.vec_id, r.score)
        for r in dq.queries()["knn_topk"](spark, sf_dir)
        .select("vec_id", "score")
        .collect()
    ]
    assert got == want


def test_mrl_prefix_stage_reads_only_prefix(spark, sf_dir):
    """Changing TRAILING dimensions must not change the shortlist:
    corrupt dims 17..64 of every vector and check stage-1 scores are
    identical (the byte/FLOP saving claim depends on this)."""
    from pyspark.sql import functions as F

    from vector_db_handler_spark import driver_queries as dq
    from vector_db_handler_spark.functions.vector import cosine_score

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    q16 = dq.QUERY_VEC[:16]
    base = emb.select(
        "vec_id", cosine_score(F.slice("embedding", 1, 16), q16).alias("s")
    )
    corrupted = emb.select(
        "vec_id",
        F.concat(
            F.slice("embedding", 1, 16),
            F.transform(F.slice("embedding", 17, 48), lambda x: x * -3.0),
        ).alias("embedding"),
    ).select("vec_id", cosine_score(F.slice("embedding", 1, 16), q16).alias("s"))
    assert sorted(map(tuple, base.collect())) == sorted(map(tuple, corrupted.collect()))


# ---------------------------------------------------------------------------
# mine_hard_triplets
# ---------------------------------------------------------------------------

import pytest as _pytest

from vector_db_handler_spark.operators.similarity import mine_hard_triplets


def test_triplets_planted_structure(spark):
    """8 deterministic 4-d vectors: the positive must be the best
    non-self neighbor, negatives exactly the requested rank band, and
    margins non-negative (ranks are score-ordered)."""
    import math

    rows = []
    for i in range(8):
        a = 2 * math.pi * i / 16
        rows.append((i, [math.cos(a), math.sin(a), 0.0, 0.0]))
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = mine_hard_triplets(
        emb, emb.filter("vec_id = 0"), n_neg=2, neg_start_rank=4
    ).collect()
    assert len(out) == 2
    for r in out:
        assert r.query_id == 0
        assert r.pos_id == 1  # adjacent angle = highest cosine (id tiebreak)
        assert r.neg_id in (4, 5)  # ranks 4 and 5 (ids ordered by angle)
        assert r.margin >= 0
        assert r.margin == round(round(r.pos_score, 6) - round(r.neg_score, 6), 6)


def test_triplets_rejects_bad_params(spark):
    emb = spark.createDataFrame(
        [(0, [1.0, 0.0])], "vec_id long, embedding array<double>"
    )
    with _pytest.raises(ValueError):
        mine_hard_triplets(emb, emb, n_neg=0)
    with _pytest.raises(ValueError):
        mine_hard_triplets(emb, emb, neg_start_rank=1)


# ---------------------------------------------------------------------------
# ann_recall_report
# ---------------------------------------------------------------------------

from vector_db_handler_spark.operators.similarity import ann_recall_report


def test_ann_recall_is_one_when_probing_all_cells(spark):
    """With nprobe = #centroids the probe IS brute force, so recall@k
    must be exactly 1.0 for every query."""
    import math

    rows = [
        (i, [math.cos(i * 0.37 + d) for d in range(8)]) for i in range(40)
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    cents = emb.filter("vec_id % 10 = 0")  # 4 cells
    out = ann_recall_report(
        emb, cents, emb.filter("vec_id < 3"), k=5, nprobe=4
    ).collect()
    assert len(out) == 3
    assert all(r.recall == 1.0 and r.n_hits == 5 for r in out)


def test_ann_recall_bounded_and_monotone_in_nprobe(spark):
    import math

    rows = [
        (i, [math.sin(i * 0.11 + d * 0.7) for d in range(8)]) for i in range(60)
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    cents = emb.filter("vec_id % 12 = 0")  # 5 cells
    r1 = {r.query_id: r.n_hits for r in ann_recall_report(
        emb, cents, emb.filter("vec_id < 3"), k=5, nprobe=1).collect()}
    r5 = {r.query_id: r.n_hits for r in ann_recall_report(
        emb, cents, emb.filter("vec_id < 3"), k=5, nprobe=5).collect()}
    for q in r1:
        assert 0 <= r1[q] <= r5[q] == 5


# ---------------------------------------------------------------------------
# mrl_recall_curve
# ---------------------------------------------------------------------------

from vector_db_handler_spark.operators.similarity import mrl_recall_curve


def test_mrl_curve_full_prefix_is_perfect_and_curve_bounded(spark):
    """The full-dimension prefix IS the exact ranker (recall 1.0);
    every shorter prefix lands in [0, 1]; denominators are Q·k."""
    import math

    rows = [
        (i, [math.cos(i * 0.31 + d * 0.17) for d in range(16)])
        for i in range(50)
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = {
        r.prefix_dim: r
        for r in mrl_recall_curve(
            emb, emb.filter("vec_id < 4"), prefixes=(4, 8, 16), k=6
        ).collect()
    }
    assert out[16].recall == 1.0 and out[16].n_hits == 4 * 6
    for p in (4, 8):
        assert 0.0 <= out[p].recall <= 1.0
        assert out[p].n_queries == 4


# ---------------------------------------------------------------------------
# driver-collect guards (broadcast-analog sides must stay small)
# ---------------------------------------------------------------------------

import pytest


def test_collect_matrix_rejects_oversized_side(spark):
    rows = [(i, [float(i), 1.0]) for i in range(12)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    with pytest.raises(ValueError, match="max_rows"):
        sim_ops._collect_matrix(df, "vec_id", "embedding", max_rows=10)
    # Under the cap: unchanged behaviour.
    ids, mat = sim_ops._collect_matrix(df, "vec_id", "embedding", max_rows=12)
    assert len(ids) == 12 and mat.shape == (12, 2)


def test_ann_recall_report_rejects_oversized_query_batch(spark, monkeypatch):
    rows = [(i, [float(i % 3), 1.0]) for i in range(8)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    monkeypatch.setattr(sim_ops, "MAX_COLLECT_ROWS", 4)
    with pytest.raises(ValueError, match="query relation exceeds"):
        sim_ops.ann_recall_report(emb, emb.limit(2), emb, k=2, nprobe=1)

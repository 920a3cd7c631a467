"""Winnowing (MOSS) fingerprint properties — the SIGMOD'03 guarantee
and the pair detector's non-degeneracy, on constructed corpora (the
fixture parity runs automatically in test_oracle_queries.py)."""

from __future__ import annotations

import random
import string

from vector_db_handler_spark.operators.dedup import (
    winnow_fingerprints,
    winnow_overlap_pairs,
)

K, W = 10, 10
GUARANTEE = K + W - 1  # any shared substring this long shares a fingerprint


def _rand_text(rng: random.Random, n: int) -> str:
    return "".join(rng.choice(string.ascii_lowercase + " ") for _ in range(n))


def test_shared_substring_guarantee(spark):
    """Docs sharing a >= w+k-1 char substring MUST share a fingerprint
    hash, wherever the substring lands in each doc."""
    rng = random.Random(7)
    planted = _rand_text(rng, GUARANTEE)
    rows = [
        (1, _rand_text(rng, 80) + planted + _rand_text(rng, 40)),
        (2, _rand_text(rng, 15) + planted + _rand_text(rng, 100)),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    fps = winnow_fingerprints(docs, k=K, w=W).collect()
    h1 = {r.fp_hash for r in fps if r.doc_id == 1}
    h2 = {r.fp_hash for r in fps if r.doc_id == 2}
    assert h1 & h2, "winnowing guarantee violated: no shared fingerprint"


def test_unrelated_docs_share_nothing(spark):
    rng = random.Random(11)
    rows = [(i, _rand_text(rng, 200)) for i in range(6)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    pairs = winnow_overlap_pairs(docs, min_shared=1, k=K, w=W).collect()
    assert pairs == []


def test_short_docs_drop_out(spark):
    """Docs shorter than w+k-1 chars have no complete window."""
    docs = spark.createDataFrame(
        [(1, "tiny"), (2, "x" * (GUARANTEE - 1)), (3, "y" * 200)],
        "doc_id long, text string",
    )
    ids = {r.doc_id for r in winnow_fingerprints(docs, k=K, w=W).collect()}
    assert ids == {3}


def test_fingerprint_density(spark):
    """Selected fingerprints are ~2/(w+1) of gram positions (SIGMOD'03
    density bound for random input) — sanity that winnowing is actually
    sparsifying, not keeping every gram."""
    rng = random.Random(13)
    docs = spark.createDataFrame(
        [(1, _rand_text(rng, 2000))], "doc_id long, text string"
    )
    n_fps = winnow_fingerprints(docs, k=K, w=W).count()
    n_grams = 2000 - K + 1
    density = n_fps / n_grams
    assert 0.1 < density < 0.35, density  # 2/(w+1) = 0.18 expected


def test_overlap_pairs_plan_no_cartesian(spark, sf_dir):
    from vector_db_handler_spark.sources.tables import load_table

    plan = winnow_overlap_pairs(
        load_table(spark, sf_dir, "documents"), min_shared=8, k=K, w=W
    )._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_fingerprints_single_exchange(spark, sf_dir):
    """The winnowing BUILD plan has exactly ONE shuffle: the doc_id
    exchange feeding the window; distinct reuses that partitioning
    (doc_id prefixes the downstream key).  The driver row now reads
    the SHARED per-fixture build (`_shared_winnow_fps`), so the
    build's single-exchange property is pinned on the operator
    directly, and the row's serve plan is pinned separately below."""
    from vector_db_handler_spark import driver_queries as dq

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    plan = (
        winnow_fingerprints(docs, k=dq.WINNOW_K, w=dq.WINNOW_W)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("Exchange hashpartitioning") == 1, plan


def test_fingerprint_row_serves_from_pruned_cache(spark, sf_dir):
    """The profile row over the shared build: the parquet scan is
    column-pruned to the two aggregated columns (fp_pos never read),
    and the plan pays only the aggregate's own exchanges (≤ 2: the
    countDistinct expand), never a re-run of the winnowing window."""
    from vector_db_handler_spark import driver_queries as dq

    plan = (
        dq.queries()["winnowing_fingerprints"](spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "vdh_winfps_" in plan  # served from the shared build
    scan = plan.split("ReadSchema")[1].splitlines()[0]
    assert "doc_id" in scan and "fp_hash" in scan and "fp_pos" not in scan
    assert plan.count("Exchange hashpartitioning") <= 2, plan
    # the winnowing window (explode + running min) must NOT reappear
    assert "explode" not in plan and "min(packed" not in plan


def test_planted_substring_property(spark):
    """Hypothesis-style sweep without the fixture: for a batch of
    random (position, length>=guarantee) plantings, every pair shares
    a fingerprint — the guarantee holds wherever the overlap lands."""
    rng = random.Random(101)
    rows = []
    for i in range(8):
        planted = _rand_text(rng, GUARANTEE + rng.randrange(0, 30))
        a_pre, b_pre = rng.randrange(0, 120), rng.randrange(0, 120)
        rows.append((2 * i, _rand_text(rng, a_pre) + planted + _rand_text(rng, 60)))
        rows.append((2 * i + 1, _rand_text(rng, b_pre) + planted + _rand_text(rng, 60)))
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    fps = winnow_fingerprints(docs, k=K, w=W).collect()
    by_doc = {}
    for r in fps:
        by_doc.setdefault(r.doc_id, set()).add(r.fp_hash)
    for i in range(8):
        assert by_doc[2 * i] & by_doc[2 * i + 1], f"pair {i} shares nothing"


def test_stop_fingerprint_guard_prunes_boilerplate(spark):
    """The postings guard (``max_postings``) is what keeps the pair
    join sub-quadratic on real corpora, where boilerplate (headers,
    licenses, templates) appears in EVERY doc: guard off, a corpus
    of n docs sharing one paragraph candidates ~C(n,2) pairs per
    boilerplate fingerprint; guard on, those fingerprints are dropped
    BEFORE the self-join while a true-overlap pair (unique substring,
    df=2) survives untouched.  Pins both the candidate-volume
    reduction and the recall of the planted pair."""
    from pyspark.sql import functions as F

    rng = random.Random(23)
    n = 40
    boiler = _rand_text(rng, 120)  # shared by ALL docs -> df = n
    planted = _rand_text(rng, 120)  # shared by docs 0 and 1 only
    rows = [
        (
            i,
            boiler
            + _rand_text(rng, 100)
            + (planted if i < 2 else ""),
        )
        for i in range(n)
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")

    # Candidate volume = sum C(df, 2) over the (distinct) inverted
    # index -- computed from doc frequencies, never by materializing
    # the join (at scale the guard-off join IS the infeasible thing).
    dfc = (
        winnow_fingerprints(docs, k=K, w=W)
        .select("doc_id", "fp_hash")
        .distinct()
        .groupBy("fp_hash")
        .agg(F.count("*").alias("df"))
    )
    cand = lambda d: d.select(  # noqa: E731
        F.coalesce(F.sum(F.col("df") * (F.col("df") - 1) / 2), F.lit(0.0)).alias("c")
    ).collect()[0]["c"]
    cand_off = cand(dfc)
    cand_on = cand(dfc.filter(F.col("df") <= 20))
    # Boilerplate fingerprints each contribute C(40,2)=780 candidates.
    assert cand_off >= 780, "corpus failed to produce boilerplate fingerprints"
    assert cand_on < cand_off / 10, (cand_on, cand_off)

    pairs_on = winnow_overlap_pairs(docs, k=K, w=W, max_postings=20).collect()
    found = {(r.doc_a, r.doc_b) for r in pairs_on}
    assert (0, 1) in found, "guard dropped the true-overlap pair"
    # Guard off, every doc pair shares the boilerplate fingerprints.
    pairs_off = winnow_overlap_pairs(
        docs, k=K, w=W, max_postings=10**9
    ).count()
    assert pairs_off >= n * (n - 1) / 2, pairs_off
    assert len(pairs_on) < pairs_off / 10

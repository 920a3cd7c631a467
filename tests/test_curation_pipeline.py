"""End-to-end curation pipeline (dedup → quality → mixture →
budget-pack → shard → manifest): stage-composition semantics, exact
apportionment invariants, determinism, and the cross-engine DuckDB
replay of the WHOLE pipeline in one query.  Registered in r14; the
oracle lives in driver_queries, aliased back here."""

from __future__ import annotations

import pytest

from tests.oracle_check import assert_oracle_types_hashable, compare
from vector_db_handler_spark import driver_queries as dq
from vector_db_handler_spark.operators.curation import (
    GOPHER_STOPS,
    curation_manifest,
    gopher_keep_expr,
)

# Dials + oracle registered in r14 — aliased from driver_queries (one
# source of truth); the parameterized builder stays importable for the
# capped-budget test.
TOTAL_N = dq._CURATION_TOTAL_N
SHARDS = dq._CURATION_SHARDS
SALT = dq._CURATION_SALT
_curation_oracle_sql = dq._curation_sql

CURATION_ORACLE_SQL = dq._CURATION_SQL


def _docs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def _run(spark, sf_dir, total_n=TOTAL_N):
    return curation_manifest(_docs(spark, sf_dir), total_n, SHARDS)


def test_oracle_types_hashable(duck):
    assert_oracle_types_hashable(duck, CURATION_ORACLE_SQL, "curation")


def test_cross_engine_oracle_replay(spark, sf_dir, duck):
    compare(_run(spark, sf_dir), duck, CURATION_ORACLE_SQL)


def test_budget_exact_when_not_capped(spark, sf_dir):
    """Largest-remainder apportionment sums EXACTLY to total_n when no
    domain's quota hits its availability cap (the Hamilton guarantee)."""
    out = _run(spark, sf_dir).collect()
    assert sum(r["n_docs"] for r in out) == TOTAL_N


def test_budget_caps_bind_when_budget_exceeds_corpus(spark, sf_dir):
    """total_n past the surviving corpus size returns every eligible
    doc once — capped, never duplicated or rebalanced."""
    docs = _docs(spark, sf_dir)
    eligible = (
        docs.filter(gopher_keep_expr())
        .filter("lang IS NOT NULL")
        .selectExpr("count(DISTINCT text) AS n")  # dedup keeps one per text
        .first()["n"]
    )
    out = _run(spark, sf_dir, total_n=10**6).collect()
    assert sum(r["n_docs"] for r in out) == eligible


def test_deterministic_across_partitionings(spark, sf_dir):
    base = sorted(map(tuple, _run(spark, sf_dir).collect()))
    shuffled = sorted(
        map(
            tuple,
            curation_manifest(
                _docs(spark, sf_dir).repartition(13), TOTAL_N, SHARDS
            ).collect(),
        )
    )
    assert base == shuffled


def test_stage_composition_on_planted_docs(spark):
    """Synthetic corpus pinning each stage's contribution: a verbatim
    duplicate survives ONCE under its min id, a sub-quality doc never
    reaches the manifest, and the id checksum proves exactly which
    docs were packed."""
    good = (
        "the quick brown fox jumps over the lazy dog and then the dog "
        "sat down to rest with a bone that it have found near the old "
        "mill while the sun set slowly of the evening be calm"
    )
    rows = [
        (1, "en", good),
        (7, "en", good),  # exact duplicate — dedup keeps id 1 only
        (3, "en", good + " extra tail words of the same kind be here with that have more"),
        (4, "de", good + " noch ein paar worte of the that be have with and to"),
        (5, "en", "short junk"),  # fails the Gopher word-count floor
        (6, None, good + " null lang doc drops at the mixture stage of that be have"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, lang string, text string")
    out = curation_manifest(docs, 10**6, ["only"]).collect()
    selected_ids = sum(r["sum_doc_id"] for r in out)
    n_selected = sum(r["n_docs"] for r in out)
    # Survivors: 1 (dup winner), 3, 4.  Excluded: 7 (duplicate),
    # 5 (quality), 6 (null domain).
    assert n_selected == 3
    assert selected_ids == 1 + 3 + 4
    assert {r["domain"] for r in out} == {"en", "de"}


def test_args_validated(spark, sf_dir):
    docs = _docs(spark, sf_dir)
    with pytest.raises(ValueError, match="total_n"):
        curation_manifest(docs, -1, SHARDS)
    with pytest.raises(ValueError, match="shard"):
        curation_manifest(docs, 10, [])


def test_decontamination_stage_drops_benchmark_overlap(spark):
    """Planted contamination: a benchmark doc duplicating a corpus
    doc's text must knock that doc (and only that doc) out of the
    manifest; the clean run keeps it."""
    good = (
        "the quick brown fox jumps over the lazy dog and then the dog "
        "sat down to rest with a bone that it have found near the old "
        "mill while the sun set slowly of the evening be calm"
    )
    other = (
        "a completely different story about the sea and the ships that "
        "be sailing with the tide of dawn while sailors have kept watch "
        "and that old lighthouse stood to guard the rocky shore below"
    )
    docs = spark.createDataFrame(
        [(1, "en", good), (2, "en", other)],
        "doc_id long, lang string, text string",
    )
    bench = spark.createDataFrame(
        [(900, "en", good)], "doc_id long, lang string, text string"
    )
    clean = curation_manifest(docs, 10**6, ["only"]).collect()
    assert sum(r["sum_doc_id"] for r in clean) == 1 + 2
    decon = curation_manifest(
        docs, 10**6, ["only"], decontaminate_against=bench
    ).collect()
    assert sum(r["sum_doc_id"] for r in decon) == 2
    assert sum(r["n_docs"] for r in decon) == 1


def test_total_n_overflow_preflight(spark, sf_dir):
    """r13 ADVICE (medium): total_n * weight_numer runs in BIGINT and
    weight_numer can reach (mixture_base + 64000)^mixture_rounds — a
    doc budget big enough to overflow int64 must fail LOUDLY in Python
    ints before any Spark job, not wrap into negative quotas."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    # (4000 + 64000)^2 = 68000^2 = 4.624e9; 2^63/4.624e9 ≈ 1.995e9 —
    # a 2.1e9-doc budget overflows, well inside a pretraining corpus.
    with pytest.raises(ValueError, match="overflow"):
        curation_manifest(docs, 2_100_000_000, SHARDS)
    # ... and reducing the rounds dial restores the headroom: the
    # preflight passes (the plan builds; we don't execute it).
    curation_manifest(docs, 2_100_000_000, SHARDS, mixture_rounds=1)

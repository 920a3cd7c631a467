"""Exact-count stratified allocation (largest-remainder + hash-rank
pick): Hamilton apportionment replay, exact totals, cap semantics,
determinism, and the cross-engine DuckDB replay over documents by
language.  Staged in r12 for r13 driver registration."""

from __future__ import annotations

import pytest

from tests.oracle_check import compare
from vector_db_handler_spark.operators.sampling import (
    allocate_stratified_exact,
)

from vector_db_handler_spark import driver_queries as dq

TOTAL_N = dq._ALLOC_TOTAL_N

#: Registered in r13 — SQL lives in driver_queries (one source of
#: truth; this module replays it cross-engine at fixture scale).
ORACLE_SQL = dq._ALLOC_STRATIFIED_SQL


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, lang string")


def _hamilton(counts: dict, n: int) -> dict:
    tot = sum(counts.values())
    base = {s: n * c // tot for s, c in counts.items()}
    rem = {s: n * c % tot for s, c in counts.items()}
    left = n - sum(base.values())
    order = sorted(counts, key=lambda s: (-rem[s], s))
    for s in order[:left]:
        base[s] += 1
    return {s: min(counts[s], q) for s, q in base.items()}


def test_allocation_is_hamilton_exact(spark):
    rows = (
        [(i, "aa") for i in range(70)]
        + [(100 + i, "bb") for i in range(25)]
        + [(200 + i, "cc") for i in range(5)]
    )
    out = allocate_stratified_exact(_docs(spark, rows), 10, "lang", "doc_id").collect()
    got = {}
    for r in out:
        got[r["lang"]] = got.get(r["lang"], 0) + 1
    want = _hamilton({"aa": 70, "bb": 25, "cc": 5}, 10)
    assert got == {k: v for k, v in want.items() if v > 0}
    assert sum(got.values()) == 10


def test_total_is_exact_not_binomial(spark):
    rows = [(i, "l" + str(i % 7)) for i in range(997)]
    out = allocate_stratified_exact(_docs(spark, rows), 100, "lang", "doc_id")
    assert out.count() == 100


def test_cap_returns_everything(spark):
    rows = [(i, "aa") for i in range(5)] + [(10 + i, "bb") for i in range(3)]
    out = allocate_stratified_exact(_docs(spark, rows), 1000, "lang", "doc_id")
    assert out.count() == 8


def test_zero_and_negative(spark):
    docs = _docs(spark, [(1, "aa")])
    assert allocate_stratified_exact(docs, 0, "lang", "doc_id").count() == 0
    with pytest.raises(ValueError, match="total_n"):
        allocate_stratified_exact(docs, -1, "lang", "doc_id")


def test_deterministic_across_partitionings_and_reruns(spark):
    rows = [(i, "l" + str(i % 4)) for i in range(400)]
    one = {
        r["doc_id"]
        for r in allocate_stratified_exact(
            _docs(spark, rows).coalesce(1), 40, "lang", "doc_id"
        ).collect()
    }
    many = {
        r["doc_id"]
        for r in allocate_stratified_exact(
            _docs(spark, rows).repartition(8), 40, "lang", "doc_id"
        ).collect()
    }
    assert one == many and len(one) == 40


def test_null_strata_drop(spark):
    rows = [(1, "aa"), (2, None), (3, "aa")]
    out = allocate_stratified_exact(_docs(spark, rows), 10, "lang", "doc_id")
    assert {r["doc_id"] for r in out.collect()} == {1, 3}


def test_cross_engine_oracle_replay(spark, sf_dir, duck):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    got = allocate_stratified_exact(
        docs, TOTAL_N, "lang", "doc_id"
    ).select("doc_id", "lang")
    compare(got, duck, ORACLE_SQL)

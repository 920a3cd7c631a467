"""Functional-dependency discovery (exact g3 semantics): planted
holds/violations, NULL conventions, and the cross-engine DuckDB
replay over the orders fixture.  Staged for r11 driver registration."""

from __future__ import annotations

import pytest

from tests.oracle_check import compare
from vector_db_handler_spark.operators.profile import functional_dependencies

from vector_db_handler_spark import driver_queries as dq

#: The registration's pairs + oracle ARE this test's (one source of
#: truth since the r11 registration); kept here only as the imports.
FD_PAIRS = dq._FD_PAIRS
ORACLE_SQL = dq._FD_SQL


def _df(spark, rows):
    return spark.createDataFrame(rows, "a string, b string, c string")


def test_holding_fd_has_zero_violations_and_full_g3(spark):
    df = _df(
        spark,
        [("k1", "x", "p"), ("k1", "x", "q"), ("k2", "y", "p"), ("k3", "x", "p")],
    )
    r = {
        (x["determinant"], x["dependent"]): x
        for x in functional_dependencies(df, [("a", "b"), ("b", "a")]).collect()
    }
    ab = r[("a", "b")]
    assert (ab["n_groups"], ab["n_violating_groups"]) == (3, 0)
    assert ab["max_distinct_dep"] == 1 and ab["g3_keep"] == 4
    ba = r[("b", "a")]  # x -> {k1, k1, k3}: violated
    assert (ba["n_groups"], ba["n_violating_groups"]) == (2, 1)
    assert ba["max_distinct_dep"] == 2
    # modal of x-group is k1 (2 rows); y-group keeps its 1 row
    assert ba["g3_keep"] == 3


def test_null_conventions(spark):
    """NULL determinant rows are excluded; a NULL dependent is one
    distinct value (a det mapping to both NULL and 'x' violates)."""
    df = _df(
        spark,
        [
            (None, "x", "p"),  # excluded from a->b
            ("k1", None, "p"),
            ("k1", "x", "p"),  # k1 -> {NULL, x}: violation
            ("k2", None, "p"),  # k2 -> {NULL}: holds
        ],
    )
    r = functional_dependencies(df, [("a", "b")]).collect()[0]
    assert (r["n_groups"], r["n_violating_groups"]) == (2, 1)
    # k1's dep values each appear once (modal 1), k2 keeps its 1 row
    assert r["max_distinct_dep"] == 2 and r["g3_keep"] == 2


def test_empty_pairs_rejected(spark):
    df = _df(spark, [("k", "x", "p")])
    with pytest.raises(ValueError, match="at least one"):
        functional_dependencies(df, [])


def test_cross_engine_oracle_replay(spark, sf_dir, duck):
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    compare(functional_dependencies(orders, FD_PAIRS), duck, ORACLE_SQL)


def test_primary_key_fd_holds_on_fixture(spark, sf_dir):
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    rows = {
        (r["determinant"], r["dependent"]): r
        for r in functional_dependencies(orders, FD_PAIRS).collect()
    }
    n = orders.count()
    pk = rows[("o_orderkey", "o_custkey")]
    assert pk["n_violating_groups"] == 0 and pk["g3_keep"] == n

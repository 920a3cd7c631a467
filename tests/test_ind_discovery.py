"""Inclusion-dependency (FK) discovery: planted containment, NULL
conventions, and the cross-engine DuckDB replay over the TPC-H
fixture's real FK graph.  Staged in r11 for r12 driver registration."""

from __future__ import annotations

import pytest

from tests.oracle_check import compare
from vector_db_handler_spark import driver_queries as dq
from vector_db_handler_spark.operators.profile import inclusion_dependencies

#: The registered candidates + oracle (moved into driver_queries.py
#: in r12).
IND_CANDIDATES = dq._IND_CANDIDATES
ORACLE_SQL = dq._IND_SQL


def _df(spark, rows, schema="k string, v string"):
    return spark.createDataFrame(rows, schema)


def test_planted_holds_and_partial_containment(spark):
    child = _df(spark, [("a", "1"), ("b", "2"), ("c", "3"), ("d", "3")])
    parent = _df(spark, [("x", "1"), ("y", "2"), ("z", "9")])
    tables = {"child": child, "parent": parent}
    rows = {
        (r["child_table"], r["child_col"], r["parent_table"], r["parent_col"]): r
        for r in inclusion_dependencies(
            tables,
            [("child", "v", "parent", "v"), ("parent", "k", "child", "k")],
        ).collect()
    }
    cv = rows[("child", "v", "parent", "v")]
    # child distinct {1,2,3}; parent has {1,2} -> 2/3
    assert (cv["n_child_distinct"], cv["n_contained"]) == (3, 2)
    assert cv["containment"] == round(2 / 3, 6) and not cv["holds"]
    pk = rows[("parent", "k", "child", "k")]
    assert (pk["n_child_distinct"], pk["n_contained"]) == (3, 0)
    assert not pk["holds"]


def test_null_children_never_violate(spark):
    child = _df(spark, [("a", "1"), ("b", None), ("c", None)])
    parent = _df(spark, [("x", "1")])
    r = inclusion_dependencies(
        {"c": child, "p": parent}, [("c", "v", "p", "v")]
    ).collect()[0]
    # only the non-null distinct value {1} counts, and it's contained
    assert (r["n_child_distinct"], r["n_contained"], r["holds"]) == (1, 1, True)


def test_empty_candidates_and_unknown_table_rejected(spark):
    df = _df(spark, [("a", "1")])
    with pytest.raises(ValueError, match="at least one"):
        inclusion_dependencies({"t": df}, [])
    with pytest.raises(ValueError, match="unknown table"):
        inclusion_dependencies({"t": df}, [("t", "v", "nope", "v")])


def test_fixture_fk_graph_holds(spark, sf_dir):
    tables = {
        t: spark.read.parquet(f"{sf_dir}/{t}.parquet")
        for t in ("orders", "customer", "lineitem", "part", "nation", "supplier")
    }
    rows = {
        (r["child_table"], r["child_col"]): r
        for r in inclusion_dependencies(tables, IND_CANDIDATES).collect()
    }
    # The generator honors TPC-H referential integrity: true FKs hold.
    assert rows[("orders", "o_custkey")]["holds"]
    assert rows[("lineitem", "l_orderkey")]["holds"]
    assert rows[("lineitem", "l_partkey")]["holds"]
    assert rows[("customer", "c_nationkey")]["holds"]


def test_cross_engine_oracle_replay(spark, sf_dir, duck):
    tables = {
        t: spark.read.parquet(f"{sf_dir}/{t}.parquet")
        for t in ("orders", "customer", "lineitem", "part", "nation", "supplier")
    }
    compare(inclusion_dependencies(tables, IND_CANDIDATES), duck, ORACLE_SQL)

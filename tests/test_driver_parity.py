"""Cross-checks every ``queries()`` entry that declares an oracle against
DuckDB on the sf0.001 fixtures — a local replica of the driver's t2 gate."""

from __future__ import annotations

import pytest

from vector_db_handler_spark import driver_queries as dq
from tests.oracle_check import compare

_CASES = sorted(dq.oracle_sql().keys())


@pytest.mark.parametrize("name", _CASES)
def test_query_matches_oracle(spark, sf_dir, duck, name):
    q = dq.queries()[name]
    sql = dq.oracle_sql()[name]
    compare(q(spark, sf_dir), duck, sql)


def test_all_queries_run(spark, sf_dir):
    # Entries without an oracle still must execute and return a schema.
    for name, fn in dq.queries().items():
        df = fn(spark, sf_dir)
        assert df.columns, name
        df.limit(1).collect()


def test_entry_smoke(spark):
    import __spark_entry__ as se

    df = se.entry(spark)
    rows = df.collect()
    assert len(rows) >= 0 and df.columns

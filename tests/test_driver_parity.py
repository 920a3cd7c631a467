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
    # SERIAL-ONLY by design: this walks all 200+ queries through one
    # Spark session; under concurrent pytest chunks (multiple 32-core
    # sessions) it can drop the Py4J connection (r12 verdict rig note).
    # Run the suite serially, as the builder does.
    for name, fn in dq.queries().items():
        df = fn(spark, sf_dir)
        assert df.columns, name
        df.limit(1).collect()


def test_entry_smoke(spark):
    import __spark_entry__ as se

    df = se.entry(spark)
    rows = df.collect()
    assert len(rows) >= 0 and df.columns


def test_keyset_pages_partition_the_table(spark, sf_dir):
    """Walking keyset pages must visit every row exactly once, in
    order — the invariant OFFSET pagination breaks under concurrent
    writes and keyset preserves."""
    from vector_db_handler_spark.operators import knn as knn_ops

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    total = emb.count()
    seen, after, pages = [], None, 0
    while True:
        page = knn_ops.scroll(emb, limit=77, order_col="vec_id", after=after).select(
            "vec_id"
        ).collect()
        if not page:
            break
        ids = [r["vec_id"] for r in page]
        assert ids == sorted(ids)
        seen.extend(ids)
        after = ids[-1]
        pages += 1
        assert pages <= total  # termination guard
    assert len(seen) == total and len(set(seen)) == total


def test_update_vector_t_first_match_only(spark):
    """Property: update touches exactly ONE row (lowest point_id among
    matches), keeps ids/payload, and is a no-op without a match."""
    from vector_db_handler_spark.store import POINTS_SCHEMA, update_vector_t

    rows = [
        ("p1", "u", 1, 1, "t", {}, [1.0, 0.0], 1.0),
        ("p2", "u", 1, 1, "t", {}, [0.0, 1.0], 1.0),  # same (doc, chunk): second match
        ("p3", "u", 2, 1, "t", {}, [3.0, 4.0], 5.0),
        ("p4", "v", 1, 1, "t", {}, [1.0, 1.0], 2.0**0.5),  # other tenant
    ]
    df = spark.createDataFrame(rows, POINTS_SCHEMA)
    out = {r["point_id"]: r for r in update_vector_t(df, "u", [6.0, 8.0], 1, 1).collect()}
    assert [round(v, 5) for v in out["p1"]["embedding"]] == [6.0, 8.0]
    assert out["p1"]["embedding_norm"] == 10.0
    assert [round(v, 5) for v in out["p2"]["embedding"]] == [0.0, 1.0]  # untouched
    assert [round(v, 5) for v in out["p4"]["embedding"]] == [1.0, 1.0]  # tenant isolated
    noop = {r["point_id"]: r for r in update_vector_t(df, "u", [9.0, 9.0], 99, 99).collect()}
    assert [round(v, 5) for v in noop["p1"]["embedding"]] == [1.0, 0.0]

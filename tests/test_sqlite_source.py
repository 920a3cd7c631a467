"""SQLite interchange edge: lossless roundtrip, NULL fidelity,
foreign/type-skewed schema rejection, and the roundtrip-stats oracle
replay (same checksum contract as the Avro/Arrow edges).  Staged in
r12 for r13 driver registration."""

from __future__ import annotations

import pytest

from tests.oracle_check import compare
from vector_db_handler_spark import driver_queries as dq
from vector_db_handler_spark.sources.sqlite_db import (
    read_documents_sqlite,
    write_documents_sqlite,
)

#: The r13 registration reuses the Avro roundtrip oracle verbatim —
#: the checksum proves the SQLite hop was lossless against the
#: parquet-sourced truth.
ORACLE_SQL = dq._AVRO_ROUNDTRIP_SQL


def test_roundtrip_is_lossless(spark, sf_dir, tmp_path):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    n = write_documents_sqlite(docs, str(tmp_path / "db"))
    assert n == docs.count()
    back = read_documents_sqlite(spark, str(tmp_path / "db"))
    assert {tuple(r) for r in back.collect()} == {tuple(r) for r in docs.collect()}


def test_nulls_survive_the_hop(spark, tmp_path):
    rows = [
        (1, "hello world", "en", "src0", 11),
        (2, None, None, "src1", None),
    ]
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    write_documents_sqlite(docs, str(tmp_path / "a"))
    back = {
        r["doc_id"]: r
        for r in read_documents_sqlite(spark, str(tmp_path / "a")).collect()
    }
    assert back[2]["text"] is None and back[2]["n_chars"] is None
    assert back[1]["text"] == "hello world" and back[1]["n_chars"] == 11


def test_snowflake_scale_ids_roundtrip_exactly(spark, tmp_path):
    """r12 ADVICE: int64 values past 2^53 were silently corrupted by
    a float64 hop on BOTH sides (2^60+1 came back as 2^60).  The fix
    ships INTEGER columns as decimal strings through Arrow on the
    write side and builds object-dtype columns on the read side —
    this pins the exact roundtrip, nulls alongside."""
    big = 2**60 + 1
    rows = [
        (big, "snowflake id", "en", "src0", 2**53 + 1),
        (-(2**62) - 7, "negative big", "en", "src1", None),
        (3, None, None, "src2", 9223372036854775806),
    ]
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    write_documents_sqlite(docs, str(tmp_path / "big"))
    back = {
        r["doc_id"]: r
        for r in read_documents_sqlite(spark, str(tmp_path / "big")).collect()
    }
    assert set(back) == {big, -(2**62) - 7, 3}
    assert back[big]["n_chars"] == 2**53 + 1
    assert back[-(2**62) - 7]["n_chars"] is None
    assert back[3]["n_chars"] == 9223372036854775806


def test_foreign_schema_fails_loudly(spark, tmp_path):
    import sqlite3

    con = sqlite3.connect(":memory:")
    con.execute("CREATE TABLE documents (wrong TEXT)")
    con.execute("INSERT INTO documents VALUES ('x')")
    con.commit()
    blob = con.serialize()
    path = tmp_path / "bad"
    path.mkdir()
    (path / "part-0.sqlite").write_bytes(blob)
    with pytest.raises(Exception, match="unexpected SQLite schema"):
        read_documents_sqlite(spark, str(path)).collect()


def test_type_skewed_schema_fails_loudly(spark, tmp_path):
    import sqlite3

    con = sqlite3.connect(":memory:")
    con.execute(
        "CREATE TABLE documents (doc_id REAL, text TEXT, lang TEXT,"
        " source TEXT, n_chars INTEGER)"
    )
    con.commit()
    blob = con.serialize()
    path = tmp_path / "skew"
    path.mkdir()
    (path / "part-0.sqlite").write_bytes(blob)
    with pytest.raises(Exception, match="unexpected SQLite schema"):
        read_documents_sqlite(spark, str(path)).collect()


def test_roundtrip_stats_match_parquet_oracle(spark, sf_dir, duck, tmp_path):
    """The r13 registration's shape: export → read back → aggregate;
    the checksum hash-matching the parquet-sourced oracle proves the
    SQLite hop changed nothing."""
    from pyspark.sql import functions as F

    from vector_db_handler_spark.functions.text import portable_hash60

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    write_documents_sqlite(docs, str(tmp_path / "db"))
    back = read_documents_sqlite(spark, str(tmp_path / "db"))
    got = back.groupBy().agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("doc_id").cast("long").alias("sum_ids"),
        F.sum("n_chars").cast("long").alias("sum_chars"),
        F.sum(portable_hash60(F.col("text")) % 1000000007)
        .cast("long")
        .alias("text_checksum"),
    )
    compare(got, duck, ORACLE_SQL)

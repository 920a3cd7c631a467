"""Arrow IPC (Feather v2) interchange edge: lossless roundtrip of
the documents relation, schema enforcement, null handling, and the
roundtrip-stats oracle replay (same checksum contract as the Avro
edge).  Staged in r11 for r12 driver registration."""

from __future__ import annotations

import pytest

from tests.oracle_check import compare
from vector_db_handler_spark import driver_queries as dq
from vector_db_handler_spark.sources.arrow_ipc import (
    read_documents_arrow,
    write_documents_arrow,
)

#: The r12 registration reuses the Avro roundtrip oracle verbatim —
#: the checksum proves the IPC hop was lossless against the
#: parquet-sourced truth.
ORACLE_SQL = dq._AVRO_ROUNDTRIP_SQL


def test_roundtrip_is_lossless(spark, sf_dir, tmp_path):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    n = write_documents_arrow(docs, str(tmp_path / "arrow"))
    assert n == docs.count()
    back = read_documents_arrow(spark, str(tmp_path / "arrow"))
    want = {tuple(r) for r in docs.collect()}
    got = {tuple(r) for r in back.collect()}
    assert got == want


def test_nulls_survive_the_hop(spark, tmp_path):
    rows = [
        (1, "hello world", "en", "src0", 11),
        (2, None, None, "src1", None),
    ]
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    write_documents_arrow(docs, str(tmp_path / "a"))
    back = {r["doc_id"]: r for r in read_documents_arrow(spark, str(tmp_path / "a")).collect()}
    assert back[2]["text"] is None and back[2]["n_chars"] is None
    assert back[1]["text"] == "hello world"


def test_foreign_schema_fails_loudly(spark, tmp_path):
    import pyarrow as pa
    import pyarrow.ipc as ipc

    table = pa.table({"wrong": [1, 2]})
    path = tmp_path / "bad"
    path.mkdir()
    with ipc.new_file(str(path / "part-0.arrow"), table.schema) as w:
        w.write_table(table)
    with pytest.raises(Exception, match="unexpected IPC schema"):
        read_documents_arrow(spark, str(path)).collect()


def test_roundtrip_stats_match_parquet_oracle(spark, sf_dir, duck, tmp_path):
    """The r12 registration's shape: export → read back → aggregate;
    the checksum hash-matches the parquet-sourced oracle, proving the
    IPC hop changed nothing."""
    from pyspark.sql import functions as F
    from vector_db_handler_spark.functions.text import portable_hash60

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    write_documents_arrow(docs, str(tmp_path / "arrow"))
    back = read_documents_arrow(spark, str(tmp_path / "arrow"))
    got = back.groupBy().agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("doc_id").cast("long").alias("sum_ids"),
        F.sum("n_chars").cast("long").alias("sum_chars"),
        F.sum(portable_hash60(F.col("text")) % 1000000007)
        .cast("long")
        .alias("text_checksum"),
    )
    compare(got, duck, ORACLE_SQL)


def test_all_null_partition_cannot_type_skew(spark, tmp_path):
    """A partition whose text/n_chars are ENTIRELY null used to let
    pyarrow infer a null type for that part file (r11 ADVICE); the
    explicit canonical schema pins every part file to the same
    types, so the roundtrip stays lossless and typed."""
    rows_a = [(1, None, None, "s", None), (2, None, None, "s", None)]
    rows_b = [(3, "hello", "en", "s", 5)]
    ddl = "doc_id long, text string, lang string, source string, n_chars long"
    docs = spark.createDataFrame(rows_a, ddl).repartition(1).unionByName(
        spark.createDataFrame(rows_b, ddl).repartition(1)
    )
    write_documents_arrow(docs, str(tmp_path / "nulls"))
    back = {
        r["doc_id"]: r
        for r in read_documents_arrow(spark, str(tmp_path / "nulls")).collect()
    }
    assert back[1]["text"] is None and back[1]["n_chars"] is None
    assert back[3]["text"] == "hello" and back[3]["n_chars"] == 5


def test_type_skewed_file_fails_loudly(spark, tmp_path):
    """Right names, wrong types: the reader must reject it up front
    (the failure used to surface later as a coercion error or a
    silent cast inside mapInPandas)."""
    import pyarrow as pa
    import pyarrow.ipc as ipc
    import pytest as _pytest

    table = pa.table(
        {
            "doc_id": pa.array([1.5], type=pa.float64()),  # double, not long
            "text": pa.array(["x"]),
            "lang": pa.array(["en"]),
            "source": pa.array(["s"]),
            "n_chars": pa.array([1], type=pa.int64()),
        }
    )
    path = tmp_path / "skewed"
    path.mkdir()
    with ipc.new_file(str(path / "part-0.arrow"), table.schema) as w:
        w.write_table(table)
    with _pytest.raises(Exception, match="unexpected IPC schema types"):
        read_documents_arrow(spark, str(path)).collect()

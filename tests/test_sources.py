"""Ingest-edge properties: ORC predicate pushdown, CSV quarantine
semantics (oracle parity for the roundtrip queries runs automatically
in test_oracle_queries.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from vector_db_handler_spark.sources import csv as csv_src
from vector_db_handler_spark.sources import orc as orc_src
from vector_db_handler_spark.sources.tables import load_table


def test_orc_filter_pushdown(spark, sf_dir, tmp_path):
    """The language predicate must reach the ORC scan (PushedFilters),
    not run as a post-scan filter over full stripes."""
    path = str(tmp_path / "docs_orc")
    orc_src.write_documents_orc(load_table(spark, sf_dir, "documents"), path)
    df = orc_src.read_documents_orc(spark, path).filter(F.col("lang") == "en")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [" in plan and "lang" in plan.split("PushedFilters:")[1][:120], plan


def test_orc_roundtrip_lossless(spark, sf_dir, tmp_path):
    path = str(tmp_path / "docs_orc2")
    docs = load_table(spark, sf_dir, "documents")
    orc_src.write_documents_orc(docs, path)
    back = orc_src.read_documents_orc(spark, path)
    a = sorted((r.doc_id, r.text) for r in docs.select("doc_id", "text").collect())
    b = sorted((r.doc_id, r.text) for r in back.select("doc_id", "text").collect())
    assert a == b


def test_csv_quarantine_splits_exactly(spark, tmp_path):
    """Type-mismatch and arity-mismatch rows land in the corrupt lane
    with the raw line preserved; valid rows parse fully."""
    src = tmp_path / "drop"
    src.mkdir()
    (src / "a.csv").write_text(
        "1,hello,en,web,5\n"
        "oops,bad,en,web,3\n"
        "2,world,de,web,5\n"
        "!!!\n"
    )
    df = csv_src.read_documents_csv(spark, str(src))
    valid = df.filter(F.col(csv_src.CORRUPT_COL).isNull())
    corrupt = df.filter(F.col(csv_src.CORRUPT_COL).isNotNull())
    assert sorted(r.doc_id for r in valid.collect()) == [1, 2]
    raw = sorted(r[csv_src.CORRUPT_COL] for r in corrupt.collect())
    assert raw == ["!!!", "oops,bad,en,web,3"]
    df.unpersist()

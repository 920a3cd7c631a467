"""Span removal (the suffix-array dedup ACTION step): planted cut
semantics, pass-through and fully-duplicated edges, and the
cross-engine DuckDB replay.  Staged for r11 driver registration."""

from __future__ import annotations

from tests.oracle_check import compare
from vector_db_handler_spark import driver_queries as dq
from vector_db_handler_spark.operators.dedup import remove_duplicate_spans

K = dq._SUBSTRING_K  # 8 — same dial as the registered spans query

#: The registration's oracle IS this test's oracle (one source of
#: truth since the r11 registration); kept here only as the import.
ORACLE_SQL = dq._REMOVE_SPANS_SQL


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def _words(tag, n):
    return " ".join(f"{tag}{i}" for i in range(n))


def test_planted_block_is_cut_surroundings_survive(spark):
    """The shared 12-token block vanishes from both docs; the unique
    prefix/suffix re-join across the cut."""
    block = _words("dup", 12)
    docs = _docs(
        spark,
        [
            (1, _words("a", 5) + " " + block + " " + _words("b", 7)),
            (2, _words("c", 9) + " " + block + " " + _words("d", 3)),
        ],
    )
    out = {r["doc_id"]: r for r in remove_duplicate_spans(docs, k=K).collect()}
    assert out[1]["clean_text"] == _words("a", 5) + " " + _words("b", 7)
    assert out[2]["clean_text"] == _words("c", 9) + " " + _words("d", 3)
    assert out[1]["n_removed"] == 12 and out[2]["n_removed"] == 12


def test_docs_without_spans_pass_through_verbatim(spark):
    text = _words("u", 15)
    docs = _docs(spark, [(1, text), (2, _words("v", 3))])
    out = {r["doc_id"]: r for r in remove_duplicate_spans(docs, k=K).collect()}
    assert out[1]["clean_text"] == text and out[1]["n_removed"] == 0
    assert out[2]["clean_text"] == _words("v", 3)  # sub-k: invisible
    assert out[2]["n_removed"] == 0


def test_fully_duplicated_doc_becomes_empty_not_dropped(spark):
    block = _words("z", 10)
    docs = _docs(spark, [(1, block), (2, block)])
    out = remove_duplicate_spans(docs, k=K).collect()
    assert len(out) == 2
    for r in out:
        assert r["clean_text"] == ""
        assert (r["n_tokens"], r["n_removed"]) == (10, 10)


def test_cross_engine_oracle_replay(spark, sf_dir, duck):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    compare(remove_duplicate_spans(docs, k=K), duck, ORACLE_SQL)

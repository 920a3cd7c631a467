"""Exact substring-duplication intervals (Lee et al. ACL'22 shape):
semantic pins on planted corpora plus the full cross-engine DuckDB
replay of the gaps-and-islands plan.  Staged for r10 driver
registration (r9's window is reserved for stale-evidence rotation)."""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.oracle_check import compare
from vector_db_handler_spark import driver_queries as dq
from vector_db_handler_spark.operators.dedup import duplicated_substring_spans

K = dq._SUBSTRING_K  # 8 — the registered dial

#: The REGISTERED oracle (driver_queries carries the single source of
#: truth since the r10 registration); kept here only as the import.
ORACLE_SQL = dq._SUBSTRING_SPANS_SQL



def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def _words(tag, n):
    return " ".join(f"{tag}{i}" for i in range(n))


def test_planted_block_found_at_arbitrary_offsets(spark):
    """A 12-token block pasted at different offsets in two otherwise
    unique docs must surface as one maximal interval in each, at the
    right positions — the arbitrary-alignment property fixed-span
    dedup cannot give."""
    block = _words("dup", 12)
    docs = _docs(
        spark,
        [
            (1, _words("a", 5) + " " + block + " " + _words("b", 7)),
            (2, _words("c", 9) + " " + block + " " + _words("d", 3)),
            (3, _words("e", 30)),  # fully unique
        ],
    )
    out = {
        r["doc_id"]: (r["span_start"], r["span_end"], r["n_tokens"])
        for r in duplicated_substring_spans(docs, k=K).collect()
    }
    # doc 1: block occupies tokens 5..16; doc 2: tokens 9..20
    assert out[1] == (5, 16, 12)
    assert out[2] == (9, 20, 12)
    assert 3 not in out


def test_within_doc_repetition_counts_as_duplication(spark):
    """Suffix-array dedup counts a substring repeated INSIDE one doc;
    both occurrences must be reported as intervals."""
    block = _words("x", K)
    docs = _docs(
        spark, [(1, block + " " + _words("mid", 6) + " " + block)]
    )
    got = sorted(
        (r["span_start"], r["span_end"])
        for r in duplicated_substring_spans(docs, k=K).collect()
    )
    assert got == [(0, K - 1), (K + 6, 2 * K + 5)]


def test_adjacent_duplicated_grams_merge_into_one_maximal_span(spark):
    """A shared 20-token block yields 13 duplicated 8-grams whose runs
    must merge into ONE interval, not 13."""
    block = _words("z", 20)
    docs = _docs(spark, [(1, block), (2, block)])
    rows = duplicated_substring_spans(docs, k=K).collect()
    assert len(rows) == 2
    for r in rows:
        assert (r["span_start"], r["span_end"], r["n_dup_grams"]) == (0, 19, 13)


def test_short_docs_and_sub_k_overlaps_are_invisible(spark):
    """Docs under k tokens produce no grams; shared substrings shorter
    than k are below the paper's min-match-length dial."""
    docs = _docs(
        spark,
        [
            (1, _words("s", K - 1)),
            (2, _words("s", K - 1)),  # identical but < k tokens
            (3, _words("t", 4) + " shared pair " + _words("u", 4)),
            (4, _words("v", 4) + " shared pair " + _words("w", 4)),
        ],
    )
    assert duplicated_substring_spans(docs, k=K).count() == 0


def test_cross_engine_oracle_replay_on_fixture_corpus(spark, sf_dir, duck):
    """Full plan vs the DuckDB twin on the real documents fixture —
    the same type-strict gate the driver applies, run pre-registration
    so the r10 fronting starts green."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    compare(duplicated_substring_spans(docs, k=K), duck, ORACLE_SQL)


def test_null_and_degenerate_docs_are_tolerated(spark):
    """Crawl corpora carry extraction failures: null text must be
    dropped declaratively (no 'None'-string phantom grams), empty and
    sub-k docs emit nothing, multi-byte text hashes without error."""
    docs = spark.createDataFrame(
        [
            (0, None),
            (1, ""),
            (2, "one two"),
            (3, "héllo wörld 中文 テキスト x1 x2 x3 x4 x5"),
        ],
        "doc_id long, text string",
    )
    assert duplicated_substring_spans(docs, k=K).count() == 0

"""Persisted BM25 inverted index (`operators.retrieval`
write/append/probe/compact + `streaming.bm25_stream` ingest): staged
in r15 for r16 driver registration.

Pins: probe-equals-scan bit-for-bit (the index probe and scan-time
`bm25_topk` share the `_bm25_rank_topk` decision core; postings/df/
corpus constants are exact integers, mergeable across segments for
ANY batching), cross-engine DuckDB replay via the parameterized
`_bm25_ctes` oracle the registered `bm25_topk_docs` row uses,
stream-equals-batch through `streaming_bm25_ingest`, exactly-once
replay (same-checkpoint and fresh-checkpoint re-drains are no-ops),
crash-segment invisibility (postings written, stats _SUCCESS absent ⇒
segment unread), append recommit refusal (the id-epoch contract's
physical guard), compaction probe-invariance under the manifest
discipline, and planning-time bucket pruning (PartitionFilters on the
term-bucket partition column)."""

from __future__ import annotations

import os
import shutil

import pytest
from pyspark.sql import functions as F

from tests.oracle_check import assert_oracle_types_hashable, compare
from vector_db_handler_spark import driver_queries as dq
from vector_db_handler_spark.operators.retrieval import (
    _committed_bm25_segments,
    append_bm25_index,
    bm25_index_topk,
    bm25_topk,
    compact_bm25_index,
    write_bm25_index,
)
from vector_db_handler_spark.streaming.bm25_stream import streaming_bm25_ingest

#: Staged driver-row dials: base corpus = doc_id % 4 != 3, the
#: arrival drop = doc_id % 4 == 3, so base ∪ arrivals is the whole
#: documents table and the twin is the scan-time oracle verbatim.
TERMS = ("scan", "merge", "hash")
K = 10
STREAM_TERMS = ("batch", "filter", "sort")
STREAM_K = 10

BM25_INDEX_SQL = dq._bm25_ctes(TERMS) + f"""
SELECT doc_id, score,
       CAST(row_number() OVER (ORDER BY score DESC, doc_id ASC) AS INTEGER) AS rank
FROM per_doc
ORDER BY score DESC, doc_id ASC
LIMIT {K}
"""

STREAM_BM25_SQL = dq._bm25_ctes(STREAM_TERMS) + f"""
SELECT doc_id, score,
       CAST(row_number() OVER (ORDER BY score DESC, doc_id ASC) AS INTEGER) AS rank
FROM per_doc
ORDER BY score DESC, doc_id ASC
LIMIT {STREAM_K}
"""


def _docs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    )


def _rows(df):
    return sorted(map(tuple, df.collect()))


def _build_appended(spark, sf_dir, base) -> str:
    """write(base corpus) + append(arrival drop) under ``base``."""
    path = os.path.join(base, "idx")
    docs = _docs(spark, sf_dir)
    write_bm25_index(docs.filter("doc_id % 4 != 3"), path)
    append_bm25_index(docs.filter("doc_id % 4 = 3"), path, "delta0")
    return path


def _build_streamed(spark, sf_dir, base) -> str:
    """write(base corpus) + drain the arrival drop as two sequential
    micro-batches against one retained checkpoint."""
    path = os.path.join(base, "idx")
    docs = _docs(spark, sf_dir)
    write_bm25_index(docs.filter("doc_id % 4 != 3"), path)
    arrivals = docs.filter("doc_id % 4 = 3")
    src = os.path.join(base, "src")
    # arrivals are doc_id ≡ 3 (mod 4) — always odd — so split the two
    # legs on (doc_id div 4) parity to keep BOTH micro-batches non-empty
    for leg in (
        arrivals.filter("(doc_id div 4) % 2 = 0"),
        arrivals.filter("(doc_id div 4) % 2 = 1"),
    ):
        leg.coalesce(1).write.mode("append").parquet(src)
        stream = spark.readStream.schema(arrivals.schema).parquet(src)
        streaming_bm25_ingest(stream, path, os.path.join(base, "cp"))
    return path


def test_oracle_types_hashable(duck):
    assert_oracle_types_hashable(duck, BM25_INDEX_SQL, "bm25_index")
    assert_oracle_types_hashable(duck, STREAM_BM25_SQL, "bm25_stream")


def test_probe_cross_engine(spark, sf_dir, tmp_path, duck):
    path = _build_appended(spark, sf_dir, str(tmp_path))
    compare(bm25_index_topk(spark, path, TERMS, k=K), duck, BM25_INDEX_SQL)


def test_probe_equals_scan(spark, sf_dir, tmp_path):
    """The headline pin: the segment-merged index probe equals the
    scan-time BM25 over the union corpus, bit-for-bit."""
    path = _build_appended(spark, sf_dir, str(tmp_path))
    got = _rows(bm25_index_topk(spark, path, TERMS, k=K))
    want = _rows(bm25_topk(_docs(spark, sf_dir), list(TERMS), k=K))
    assert got == want


def test_stream_equals_batch(spark, sf_dir, tmp_path, duck):
    path = _build_streamed(spark, sf_dir, str(tmp_path))
    got = _rows(bm25_index_topk(spark, path, STREAM_TERMS, k=STREAM_K))
    want = _rows(
        bm25_topk(_docs(spark, sf_dir), list(STREAM_TERMS), k=STREAM_K)
    )
    assert got == want
    compare(
        bm25_index_topk(spark, path, STREAM_TERMS, k=STREAM_K),
        duck,
        STREAM_BM25_SQL,
    )


def test_replay_is_noop(spark, sf_dir, tmp_path):
    """Exactly-once: re-draining the same source under the same
    checkpoint (and a fresh-checkpoint replay over already-committed
    segments) leaves the store — and the probe — unchanged."""
    base = str(tmp_path)
    path = _build_streamed(spark, sf_dir, base)
    before = _rows(bm25_index_topk(spark, path, STREAM_TERMS, k=STREAM_K))
    segs_before = _committed_bm25_segments(path)

    docs = _docs(spark, sf_dir)
    src = os.path.join(base, "src")
    stream = spark.readStream.schema(docs.schema).parquet(src)
    streaming_bm25_ingest(stream, path, os.path.join(base, "cp"))
    assert _committed_bm25_segments(path) == segs_before

    # fresh checkpoint: batch ids restart at 0 and land on committed
    # segments — the short-circuit logs loudly and changes nothing.
    stream = spark.readStream.schema(docs.schema).parquet(src)
    streaming_bm25_ingest(stream, path, os.path.join(base, "cp2"))
    assert _committed_bm25_segments(path) == segs_before
    assert _rows(bm25_index_topk(spark, path, STREAM_TERMS, k=STREAM_K)) == before


def test_crash_segment_invisible(spark, sf_dir, tmp_path):
    """A torn segment (postings written, stats commit marker absent)
    is invisible to the probe."""
    base = str(tmp_path)
    path = _build_appended(spark, sf_dir, base)
    before = _rows(bm25_index_topk(spark, path, TERMS, k=K))
    # simulate the crash window: copy delta0's postings to a new
    # segment but give it no committed stats dir.
    shutil.copytree(
        os.path.join(path, "postings", "delta0"),
        os.path.join(path, "postings", "torn"),
    )
    assert "torn" not in _committed_bm25_segments(path)
    assert _rows(bm25_index_topk(spark, path, TERMS, k=K)) == before


def test_append_refuses_committed_segment(spark, sf_dir, tmp_path):
    path = _build_appended(spark, sf_dir, str(tmp_path))
    docs = _docs(spark, sf_dir)
    with pytest.raises(ValueError, match="already committed"):
        append_bm25_index(docs.limit(5), path, "delta0")
    with pytest.raises(ValueError, match="already committed"):
        append_bm25_index(docs.limit(5), path, "base")
    with pytest.raises(ValueError, match="reserved"):
        append_bm25_index(docs.limit(5), path, "merged-7")
    # a rebuild over a live index would orphan-serve the old deltas
    with pytest.raises(ValueError, match="already holds committed"):
        write_bm25_index(docs.limit(5), path)


def test_compaction_preserves_probe(spark, sf_dir, tmp_path):
    """Compaction folds every committed segment into one merged
    segment: probe bit-identical, folded dirs reclaimed, idempotent."""
    path = _build_streamed(spark, sf_dir, str(tmp_path))
    before = _rows(bm25_index_topk(spark, path, STREAM_TERMS, k=STREAM_K))
    n = compact_bm25_index(spark, path)
    assert n == 3  # base + 2 stream batches
    segs = _committed_bm25_segments(path)
    assert segs == ["merged-0"]
    assert not os.path.isdir(os.path.join(path, "postings", "base"))
    assert _rows(bm25_index_topk(spark, path, STREAM_TERMS, k=STREAM_K)) == before
    assert compact_bm25_index(spark, path) == 0
    # post-compaction appends keep working (fresh generation names)
    append_bm25_index(
        _docs(spark, sf_dir).filter("doc_id % 97 = 0").select(
            (F.col("doc_id") + 1000000).alias("doc_id"), "text"
        ),
        path,
        "delta1",
    )
    assert compact_bm25_index(spark, path) == 2
    assert _committed_bm25_segments(path) == ["merged-1"]


def test_probe_prunes_buckets(spark, sf_dir, tmp_path):
    """The probe's segment scans carry PartitionFilters on the term
    bucket — planning-time pruning, the I/O bound at 100 TB."""
    path = _build_appended(spark, sf_dir, str(tmp_path))
    probe = bm25_index_topk(spark, path, TERMS, k=K)
    plan = probe._sc._jvm.PythonSQLUtils.explainString(
        probe._jdf.queryExecution(), "formatted"
    )
    assert "PartitionFilters" in plan
    assert "bucket" in plan.split("PartitionFilters")[1].splitlines()[0]


def test_single_term_and_absent_term(spark, sf_dir, tmp_path):
    """A term absent from the corpus contributes nothing (and an
    all-absent query returns 0 rows) — same as the scan path."""
    path = _build_appended(spark, sf_dir, str(tmp_path))
    docs = _docs(spark, sf_dir)
    got = _rows(bm25_index_topk(spark, path, ("merge", "zzz_absent"), k=5))
    want = _rows(bm25_topk(docs, ["merge", "zzz_absent"], k=5))
    assert got == want
    assert bm25_index_topk(spark, path, ("zzz_absent",), k=5).count() == 0
    with pytest.raises(ValueError, match="non-empty"):
        bm25_index_topk(spark, path, (), k=5)


BM25_STATS_SQL = """
WITH dl AS (
  SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS dl
  FROM documents
),
post AS (
  SELECT doc_id, term, COUNT(*) AS tf
  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents)
  GROUP BY doc_id, term
)
SELECT CAST(2 AS BIGINT) AS n_segments,
       CAST(16 AS BIGINT) AS n_buckets,
       (SELECT CAST(COUNT(*) AS BIGINT) FROM dl) AS n_docs,
       (SELECT CAST(SUM(dl) AS BIGINT) FROM dl) AS total_len,
       (SELECT CAST((2 * SUM(dl) + COUNT(*)) // (2 * COUNT(*)) AS BIGINT)
        FROM dl) AS avg_dl,
       (SELECT CAST(COUNT(*) AS BIGINT) FROM post) AS n_postings,
       (SELECT CAST(COUNT(DISTINCT term) AS BIGINT) FROM post) AS n_terms,
       (SELECT CAST(COUNT(DISTINCT doc_id) AS BIGINT) FROM post) AS n_docs_posted
"""


def test_index_stats_cross_engine(spark, sf_dir, tmp_path, duck):
    """ANALYZE: exact store-health counters over the two-segment index
    equal the scan-side derivation over the union corpus (and the
    id-epoch integrity signal holds: n_docs_posted == n_docs)."""
    from vector_db_handler_spark.operators.retrieval import bm25_index_stats

    path = _build_appended(spark, sf_dir, str(tmp_path))
    stats = bm25_index_stats(spark, path)
    compare(stats, duck, BM25_STATS_SQL)
    row = stats.first()
    assert row["n_docs_posted"] == row["n_docs"]


def test_index_stats_requires_segments(spark, tmp_path):
    from vector_db_handler_spark.operators.retrieval import bm25_index_stats

    with pytest.raises(ValueError, match="no committed segments"):
        bm25_index_stats(spark, str(tmp_path / "nope"))

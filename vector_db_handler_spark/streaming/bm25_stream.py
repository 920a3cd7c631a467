"""Streaming / incremental BM25 index maintenance — the lexical
rail's exactly-once serve twin (the KNN, NB, HLL, graph-index,
curation and drift stores' discipline, applied to the inverted
index).

Why it exists: the persisted BM25 index (`operators.retrieval`,
write/append/probe/compact) makes probes O(query buckets), but a
continuously-fed corpus needs the INGEST side to be continuous too —
every crawl drop should become searchable without re-tokenizing the
corpus.  BM25 state is mergeable by construction (postings rows are
disjoint across segments under the id-epoch contract; df and the
corpus constants are integer sums of per-segment relations), so the
IVM split is exact:

* **Per-arrival-batch extraction is incremental** — each micro-batch
  is tokenized ONCE into its own postings segment
  (``postings/batch=<id>/`` partitioned by term bucket) plus its
  1-row additive stats relation.  Raw text is read exactly once, at
  arrival; nothing rescans existing segments.
* **The decision layer re-derives from state** — `bm25_index_topk`
  unions the committed segments' pruned postings and sums their
  stats, then runs `_bm25_rank_topk`, the SAME code object the
  scan-time `bm25_topk` runs.  Because every quantity is integer,
  probe-equals-scan holds bit-for-bit over the union corpus for ANY
  batching of the arrivals.

Commit protocol (the drift-store discipline): a segment is COMMITTED
when its ``stats/<segment>/_SUCCESS`` marker exists; stats is written
AFTER postings, so a torn segment is invisible to readers.  A
committed batch id short-circuits to a loud-logged no-op on replay,
which with Spark's checkpointed batch ids gives exactly-once state
through crash/replay.

OPERATIONAL CONTRACT (same as the graph-index / curation / drift
stores): (1) the streaming ``checkpoint`` must be retained for the
store's lifetime — a fresh checkpoint restarts batch ids at 0 and the
committed-segment short-circuit would silently drop genuinely new
arrivals landing on recycled ids; (2) doc ids must be unique across
segments (the id-epoch contract — a re-ingested id doubles its tf
rows and corrupts df; feed arrivals through the dedup rail first).

Reference scope: the reference's retrieval is vector-only and its
ingest re-embeds per upsert (app/core/document_ingestor.py:571-720);
this is the lexical half of the build-once/probe-many design its
Qdrant backend delegates to the vector index.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame


def streaming_bm25_ingest(
    docs_stream: DataFrame,
    index_path: str,
    checkpoint: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    timeout_sec: int = 180,
) -> None:
    """Drain a document stream into the persisted BM25 index: each
    micro-batch becomes one committed ``batch=<id>`` segment (postings
    partitioned by term bucket + 1-row additive stats).  The index
    must already exist (`retrieval.write_bm25_index` wrote ``meta/``
    and the base segment) so the bucket hash is pinned for the store's
    lifetime."""
    from vector_db_handler_spark.operators.retrieval import (
        _write_bm25_segment,
    )

    # the bucket count is pinned at build time — read meta/ ONCE at
    # drain start instead of paying a job per micro-batch (and fail
    # fast if the base index was never built).
    spark = docs_stream.sparkSession
    n_buckets = int(
        spark.read.parquet(os.path.join(index_path, "meta")).first()[
            "n_buckets"
        ]
    )

    def ingest(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        seg = f"batch={int(batch_id)}"
        if os.path.exists(
            os.path.join(index_path, "stats", seg, "_SUCCESS")
        ):
            # Crash landed after the segment commit but before the
            # checkpoint commit: the store state IS the directory.
            # Logged loudly (r14 ADVICE discipline): under a FRESH
            # checkpoint, ids restart at 0 and a genuinely NEW arrival
            # landing on a committed id is dropped here.
            import logging

            logging.getLogger(__name__).warning(
                "streaming_bm25_ingest: batch id %s is already committed "
                "under %s and was SKIPPED. Expected for a crash replay "
                "under the retained checkpoint; if this is a FRESH "
                "checkpoint, these arrivals were NOT indexed — retain the "
                "original checkpoint across the store's lifetime.",
                int(batch_id),
                index_path,
            )
            return
        _write_bm25_segment(
            batch_df, index_path, seg, text_col, id_col, n_buckets
        )

    q = (
        docs_stream.writeStream.foreachBatch(ingest)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(timeout_sec)
    if q.isActive:
        q.stop()
        raise TimeoutError(f"bm25 ingest did not drain within {timeout_sec}s")

"""Streaming / incremental quantile monitoring — the IVM form of
`operators.sketches.hash_sample_quantile_report`'s estimate leg, and
the sketch pillar's exactly-once serve twin (after the KNN, NB, HLL,
graph-index, curation, drift and BM25 stores).

Why it exists: the r15c scale probe (PERF.md) measured the honest
split — a single-pass sketch estimate LOSES to the exact rail because
the md5 sample filter scans every raw row.  The sketch only pays off
when extraction and emission are DECOUPLED: each arrival batch is
hashed once at ingest (the cost is buried in arrival processing), and
every subsequent emit sorts only the ~n/sample_mod state rows.  This
store is that decoupling:

* **Per-arrival-batch extraction is incremental** —
  `sketches.hash_value_sample` (the SAME code object the batch report
  uses) reduces each micro-batch to its sampled rows, written as one
  committed ``sample/batch=<id>/`` relation.  Raw values are read
  exactly once, at arrival.
* **The decision layer re-derives from state** — the emit unions the
  committed samples and runs `sketches.quantiles_from_sample` (again
  the batch report's code object).  Because the sample is a
  deterministic row FILTER, sample(∪ batches) = ∪ sample(batch)
  exactly, so the emitted estimates equal the batch report's estimate
  columns over the union corpus bit-for-bit for ANY batching of the
  arrivals — no id-alignment precondition.

Store layout and commit protocol are the drift-store discipline: each
batch dir is committed by its parquet ``_SUCCESS``; readers union
committed batches only; a committed batch id short-circuits to a
loud-logged no-op on replay (exactly-once through crash/replay).

OPERATIONAL CONTRACT (same as the sibling stores): (1) the streaming
``checkpoint`` must be retained for the store's lifetime — a fresh
checkpoint restarts batch ids at 0 and the committed-directory
short-circuit would silently drop genuinely new arrivals on recycled
ids; (2) row ids must be unique across batches (a re-ingested id
duplicates its sampled row and biases ranks — the id-epoch contract;
feed arrivals through the dedup rail first).

Reference scope: the reference has no distribution-monitoring analog
(its ingest trusts every upsert, app/core/document_ingestor.py:571-720);
this is the value-distribution health rail next to the drift store's
embedding-geometry rail.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from vector_db_handler_spark.operators.sketches import (
    hash_value_sample,
    quantiles_from_sample,
)


def _committed_batches(state_path: str) -> list[int]:
    """Batch ids under ``sample/`` with a ``_SUCCESS`` marker,
    ascending."""
    root = os.path.join(state_path, "sample")
    out: list[int] = []
    if not os.path.isdir(root):
        return out
    for d in os.listdir(root):
        if not d.startswith("batch="):
            continue
        try:
            v = int(d.split("=", 1)[1])
        except ValueError:
            continue  # stray non-numeric entry: skip, don't serve it
        if os.path.exists(os.path.join(root, d, "_SUCCESS")):
            out.append(v)
    return sorted(out)


def streaming_quantile_ingest(
    rows_stream: DataFrame,
    state_path: str,
    checkpoint: str,
    key_col: str = "event_type",
    value_col: str = "value",
    id_col: str = "event_id",
    sample_mod: int = 8,
    timeout_sec: int = 180,
) -> None:
    """Drain a value stream into the quantile state store: each
    micro-batch is reduced ONCE to its hash-sampled rows and written
    as one committed ``sample/batch=<id>/`` file-set.  Unsampled rows
    never enter the store (state is ~1/sample_mod of arrival bytes)."""

    def ingest(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        sdir = os.path.join(state_path, "sample", f"batch={int(batch_id)}")
        if os.path.exists(os.path.join(sdir, "_SUCCESS")):
            # Crash landed after the directory commit but before the
            # checkpoint commit: the store state IS the directory.
            # Logged loudly (r14 ADVICE discipline): under a FRESH
            # checkpoint, ids restart at 0 and a genuinely NEW arrival
            # landing on a committed id is dropped here.
            import logging

            logging.getLogger(__name__).warning(
                "streaming_quantile_ingest: batch id %s is already "
                "committed under %s and was SKIPPED. Expected for a crash "
                "replay under the retained checkpoint; if this is a FRESH "
                "checkpoint, these arrivals were NOT ingested — retain the "
                "original checkpoint across the store's lifetime.",
                int(batch_id),
                state_path,
            )
            return
        hash_value_sample(
            batch_df, value_col, id_col, key_col, sample_mod
        ).write.mode("overwrite").parquet(sdir)

    q = (
        rows_stream.writeStream.foreachBatch(ingest)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(timeout_sec)
    if q.isActive:
        q.stop()
        raise TimeoutError(
            f"quantile ingest did not drain within {timeout_sec}s"
        )


def quantile_state_sample(spark: SparkSession, state_path: str) -> DataFrame:
    """The merged sample state: union of the committed per-batch
    samples.  Exact — the sample is a deterministic filter, so this
    IS hash_value_sample(∪ arrivals) for any batching."""
    batches = _committed_batches(state_path)
    if not batches:
        raise ValueError(
            f"no committed quantile state under {state_path} — drain at "
            "least one batch with streaming_quantile_ingest first"
        )
    out = None
    for v in batches:
        df = spark.read.parquet(
            os.path.join(state_path, "sample", f"batch={v}")
        )
        out = df if out is None else out.unionByName(df)
    return out


def quantile_report_from_state(
    spark: SparkSession,
    state_path: str,
    key_col: str = "event_type",
    value_col: str = "value",
    id_col: str = "event_id",
    pcts: tuple[int, ...] = (50, 90, 99),
) -> DataFrame:
    """Emit per-key quantile estimates from the state store via
    `sketches.quantiles_from_sample` — the SAME code object the batch
    accuracy report runs, so the two paths cannot drift.  Output
    ``(key, est_n, est_p...)``; the only sort touches the state's
    ~n/sample_mod rows."""
    return quantiles_from_sample(
        quantile_state_sample(spark, state_path),
        key_col,
        value_col,
        id_col,
        pcts,
    )

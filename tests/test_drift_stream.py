"""Streaming / incremental embedding drift (`streaming.drift_stream`):
the sixth exactly-once serve twin — per-arrival-batch moment
extraction is incremental (raw vectors read once, state is
|dims|-sized), the decision layer re-derives from state via the SAME
`drift_report_from_moments` code object the batch report runs.
Pins: stream-equals-batch bit-for-bit (no id-alignment precondition —
integer moment addition is exact for ANY batching), batching
invariance (2-batch vs 1-batch drains emit identical reports),
exactly-once replay, crash-batch invisibility, and the cross-engine
DuckDB replay against the SAME oracle SQL the registered
`embedding_drift_report` row uses.  Staged in r15 for r16 driver
registration (the oracle is already in driver_queries)."""

from __future__ import annotations

import os
import shutil

import pytest
from pyspark.sql import functions as F

from tests.oracle_check import assert_oracle_types_hashable, compare
from vector_db_handler_spark import driver_queries as dq
from vector_db_handler_spark.operators.features import embedding_drift_report
from vector_db_handler_spark.streaming.drift_stream import (
    drift_report_from_state,
    drift_state_moments,
    streaming_drift_ingest,
    write_drift_reference,
)

#: Staged driver-row arrival shape: reference = the batch row's side A
#: (label < 5), arrivals = side B (label >= 5) drained as two batches
#: split by vec_id parity.  The twin is the registered batch row's
#: oracle VERBATIM — the strongest possible stream-equals-batch pin.
STREAM_DRIFT_SQL = dq._DRIFT_ORACLE_SQL


def _emb(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
        "vec_id", "label", "embedding"
    )


def _build_state(spark, sf_dir, base, legs=None) -> str:
    """Write the reference moments once, then drain the arrival legs
    sequentially against one checkpoint."""
    state = os.path.join(base, "state")
    src = os.path.join(base, "src")
    emb = _emb(spark, sf_dir)
    write_drift_reference(emb.filter(dq._DRIFT_A_PRED), state)
    arrivals = emb.filter(dq._DRIFT_B_PRED)
    if legs is None:
        legs = [
            arrivals.filter("vec_id % 2 = 0"),
            arrivals.filter("vec_id % 2 = 1"),
        ]
    for leg in legs:
        leg.coalesce(1).write.mode("append").parquet(src)
        stream = spark.readStream.schema(arrivals.schema).parquet(src)
        streaming_drift_ingest(stream, state, os.path.join(base, "cp"))
    return state


def test_oracle_types_hashable(duck):
    assert_oracle_types_hashable(duck, STREAM_DRIFT_SQL, "drift_stream")


def test_stream_report_cross_engine(spark, sf_dir, tmp_path, duck):
    state = _build_state(spark, sf_dir, str(tmp_path))
    compare(
        drift_report_from_state(spark, state, z_threshold=dq._DRIFT_Z),
        duck,
        STREAM_DRIFT_SQL,
    )


def test_stream_equals_batch(spark, sf_dir, tmp_path):
    """The headline IVM pin: the state-emitted report equals the batch
    two-corpus report, bit-for-bit."""
    state = _build_state(spark, sf_dir, str(tmp_path))
    emb = _emb(spark, sf_dir)
    got = sorted(map(tuple, drift_report_from_state(spark, state).collect()))
    want = sorted(
        map(
            tuple,
            embedding_drift_report(
                emb.filter(dq._DRIFT_A_PRED), emb.filter(dq._DRIFT_B_PRED)
            ).collect(),
        )
    )
    assert got == want


def test_batching_invariance(spark, sf_dir, tmp_path):
    """Moment addition is exact: a single-batch drain and the 2-batch
    drain emit identical reports (no id-alignment precondition)."""
    emb = _emb(spark, sf_dir)
    one = _build_state(
        spark,
        sf_dir,
        str(tmp_path / "one"),
        legs=[emb.filter(dq._DRIFT_B_PRED)],
    )
    two = _build_state(spark, sf_dir, str(tmp_path / "two"))
    assert sorted(
        map(tuple, drift_report_from_state(spark, one).collect())
    ) == sorted(map(tuple, drift_report_from_state(spark, two).collect()))


def test_replay_is_noop(spark, sf_dir, tmp_path):
    """Exactly-once: re-draining the same source under the same
    checkpoint (and a fresh-checkpoint replay over already-committed
    batch dirs) leaves the state — and the report — unchanged."""
    base = str(tmp_path)
    state = _build_state(spark, sf_dir, base)
    before = sorted(map(tuple, drift_report_from_state(spark, state).collect()))
    n_before = drift_state_moments(spark, state).agg(F.sum("n_b")).collect()

    src = os.path.join(base, "src")
    schema = _emb(spark, sf_dir).schema
    stream = spark.readStream.schema(schema).parquet(src)
    streaming_drift_ingest(stream, state, os.path.join(base, "cp"))
    stream = spark.readStream.schema(schema).parquet(src)
    streaming_drift_ingest(stream, state, os.path.join(base, "cp2"))

    assert (
        drift_state_moments(spark, state).agg(F.sum("n_b")).collect()
        == n_before
    )
    assert (
        sorted(map(tuple, drift_report_from_state(spark, state).collect()))
        == before
    )


def test_crash_uncommitted_batch_invisible(spark, sf_dir, tmp_path):
    """A moments dir without its _SUCCESS marker (torn write) is
    invisible to readers."""
    state = _build_state(spark, sf_dir, str(tmp_path))
    before = sorted(map(tuple, drift_report_from_state(spark, state).collect()))
    torn = os.path.join(state, "moments", "batch=99")
    shutil.copytree(os.path.join(state, "moments", "batch=0"), torn)
    os.remove(os.path.join(torn, "_SUCCESS"))
    assert (
        sorted(map(tuple, drift_report_from_state(spark, state).collect()))
        == before
    )
    shutil.rmtree(torn)


def test_mixed_dim_arrival_rejected(spark, sf_dir, tmp_path):
    """An arrival batch whose embedding dim differs from the reference
    is refused declaratively (assert_true riding the vec column —
    every row checked in the moments job itself), instead of folding
    silently into the reference's positions at emit."""
    base = str(tmp_path)
    state = os.path.join(base, "state")
    src = os.path.join(base, "src")
    emb = _emb(spark, sf_dir)
    write_drift_reference(emb.filter(dq._DRIFT_A_PRED), state)
    bad = emb.filter(dq._DRIFT_B_PRED).select(
        "vec_id", "label", F.slice("embedding", 1, 32).alias("embedding")
    )
    bad.coalesce(1).write.mode("append").parquet(src)
    stream = spark.readStream.schema(bad.schema).parquet(src)
    with pytest.raises(Exception, match="dim"):
        streaming_drift_ingest(stream, state, os.path.join(base, "cp"))
    # the failed batch never committed: no readable state
    with pytest.raises(ValueError, match="no committed drift state"):
        drift_state_moments(spark, state)


def test_args_validated(spark, tmp_path):
    with pytest.raises(ValueError, match="no committed drift state"):
        drift_state_moments(spark, str(tmp_path))
    with pytest.raises(ValueError, match="no reference moments"):
        drift_report_from_state(spark, str(tmp_path))
    with pytest.raises(ValueError, match="z_threshold"):
        from vector_db_handler_spark.operators.features import (
            drift_report_from_moments,
        )

        drift_report_from_moments(None, None, z_threshold=-1.0)

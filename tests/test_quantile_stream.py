"""Streaming / incremental quantile monitoring
(`streaming.quantile_stream`): the sketch pillar's exactly-once serve
twin — per-batch hash-sample extraction (raw values read once), emit
re-derives from ~n/sample_mod state rows via the batch report's own
`quantiles_from_sample`.  Staged in r15 for r16 driver registration.

Pins: stream-equals-batch bit-for-bit for ANY batching (the sample is
a deterministic row filter, so state union IS the whole-corpus
sample — no id-alignment precondition), cross-engine DuckDB replay,
exactly-once replay (same- and fresh-checkpoint re-drains are
no-ops), crash-batch invisibility, and the empty-state guard."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from tests.oracle_check import assert_oracle_types_hashable, compare
from tests.test_quantile_sketch import MOD, PCTS, _HASH_ID, _QCOLS, _RANKED
from vector_db_handler_spark.operators.sketches import (
    hash_sample_quantile_report,
)
from vector_db_handler_spark.streaming.quantile_stream import (
    quantile_report_from_state,
    quantile_state_sample,
    streaming_quantile_ingest,
)

QSTREAM_SQL = f"""
WITH samp AS (
  SELECT event_type, value, event_id FROM events
  WHERE {_HASH_ID} % {MOD} = 0
),
sranked AS ({_RANKED.format(src="samp")})
SELECT event_type,{_QCOLS.format(pfx="est_")}
FROM sranked GROUP BY event_type
"""


def _events(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/events.parquet").select(
        "event_id", "event_type", "value"
    )


def _rows(df):
    return sorted(map(tuple, df.collect()))


def _build_state(spark, sf_dir, base, legs=None) -> str:
    state = os.path.join(base, "state")
    src = os.path.join(base, "src")
    ev = _events(spark, sf_dir)
    if legs is None:
        legs = [ev.filter("event_id % 2 = 0"), ev.filter("event_id % 2 = 1")]
    for leg in legs:
        leg.coalesce(1).write.mode("append").parquet(src)
        stream = spark.readStream.schema(ev.schema).parquet(src)
        streaming_quantile_ingest(
            stream, state, os.path.join(base, "cp"), sample_mod=MOD
        )
    return state


def test_oracle_types_hashable(duck):
    assert_oracle_types_hashable(duck, QSTREAM_SQL, "quantile_stream")


def test_state_report_cross_engine(spark, sf_dir, tmp_path, duck):
    state = _build_state(spark, sf_dir, str(tmp_path))
    compare(quantile_report_from_state(spark, state), duck, QSTREAM_SQL)


def test_stream_equals_batch(spark, sf_dir, tmp_path):
    """The headline IVM pin: the state-emitted estimates equal the
    batch accuracy report's estimate columns, bit-for-bit, and a
    1-batch drain equals the 2-batch drain (batching invariance)."""
    two = _build_state(spark, sf_dir, str(tmp_path / "two"))
    one = _build_state(
        spark,
        sf_dir,
        str(tmp_path / "one"),
        legs=[_events(spark, sf_dir)],
    )
    got_two = _rows(quantile_report_from_state(spark, two))
    got_one = _rows(quantile_report_from_state(spark, one))
    want = _rows(
        hash_sample_quantile_report(
            _events(spark, sf_dir), sample_mod=MOD
        ).select(
            "event_type",
            F.col("sample_n").alias("est_n"),
            *[f"est_p{p}" for p in PCTS],
        )
    )
    assert got_two == want
    assert got_one == want


def test_replay_is_noop(spark, sf_dir, tmp_path):
    base = str(tmp_path)
    state = _build_state(spark, sf_dir, base)
    before = _rows(quantile_report_from_state(spark, state))
    n_before = quantile_state_sample(spark, state).count()

    ev = _events(spark, sf_dir)
    src = os.path.join(base, "src")
    stream = spark.readStream.schema(ev.schema).parquet(src)
    streaming_quantile_ingest(
        stream, state, os.path.join(base, "cp"), sample_mod=MOD
    )
    assert quantile_state_sample(spark, state).count() == n_before

    # fresh checkpoint: ids restart at 0, committed dirs short-circuit
    stream = spark.readStream.schema(ev.schema).parquet(src)
    streaming_quantile_ingest(
        stream, state, os.path.join(base, "cp2"), sample_mod=MOD
    )
    assert quantile_state_sample(spark, state).count() == n_before
    assert _rows(quantile_report_from_state(spark, state)) == before


def test_crash_batch_invisible(spark, sf_dir, tmp_path):
    """A torn batch dir (no _SUCCESS) is invisible to the emit."""
    base = str(tmp_path)
    state = _build_state(spark, sf_dir, base)
    before = _rows(quantile_report_from_state(spark, state))
    torn = os.path.join(state, "sample", "batch=99")
    os.makedirs(torn)
    with open(os.path.join(torn, "part-00000.parquet"), "wb") as fh:
        fh.write(b"torn")
    assert _rows(quantile_report_from_state(spark, state)) == before


def test_empty_state_guard(spark, tmp_path):
    with pytest.raises(ValueError, match="no committed quantile state"):
        quantile_report_from_state(spark, str(tmp_path / "nope"))

"""Streaming HLL register maintenance: batch=stream equivalence of
the register store, idempotent re-run, and crash-marker skip of an
incomplete version.  Staged in r11 for r12 driver registration."""

from __future__ import annotations

import os

from vector_db_handler_spark.operators.hll import hll_registers
from vector_db_handler_spark.streaming.stream_ops import (
    hll_store_read,
    streaming_hll_registers,
)

P = 6


def _regs(df):
    return {(r["key"], r["bucket"]): r["m"] for r in df.collect()}


def _setup(spark, sf_dir, tmp_path):
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    # two micro-batches: first/second half by event_id parity (written
    # BEFORE the stream reader binds to the path)
    for cond in ("event_id % 2 = 0", "event_id % 2 = 1"):
        ev.filter(cond).coalesce(1).write.mode("append").parquet(
            str(tmp_path / "src")
        )
    stream = (
        spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(tmp_path / "src"))
    )
    out, cp = str(tmp_path / "out"), str(tmp_path / "cp")
    return ev, stream, out, cp


def test_stream_registers_equal_batch(spark, sf_dir, tmp_path):
    ev, stream, out, cp = _setup(spark, sf_dir, tmp_path)
    streaming_hll_registers(stream, out, cp, p=P)
    got = _regs(hll_store_read(spark, out))
    want = _regs(hll_registers(ev, "event_type", "user_id", p=P))
    assert got == want and len(want) > 0


def test_rerun_is_a_no_op(spark, sf_dir, tmp_path):
    ev, stream, out, cp = _setup(spark, sf_dir, tmp_path)
    streaming_hll_registers(stream, out, cp, p=P)
    before = _regs(hll_store_read(spark, out))
    streaming_hll_registers(stream, out, cp, p=P)
    assert _regs(hll_store_read(spark, out)) == before


def test_incomplete_version_is_skipped(spark, sf_dir, tmp_path):
    """A crashed batch leaves a version directory with no _SUCCESS
    marker: readers (and the replay's merge) must take the last
    COMPLETE version instead."""
    ev, stream, out, cp = _setup(spark, sf_dir, tmp_path)
    streaming_hll_registers(stream, out, cp, p=P)
    good = _regs(hll_store_read(spark, out))
    junk = os.path.join(out, "version=999")
    os.makedirs(junk)
    with open(os.path.join(junk, "part-junk.parquet"), "wb") as f:
        f.write(b"not parquet")
    assert _regs(hll_store_read(spark, out)) == good


def test_empty_store_reads_none(spark, tmp_path):
    assert hll_store_read(spark, str(tmp_path / "nope")) is None

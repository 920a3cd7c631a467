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


def test_replay_of_committed_batch_is_skipped(spark, sf_dir, tmp_path):
    """The r11 ADVICE window: a crash AFTER version=<b>/_SUCCESS but
    BEFORE the checkpoint commit replays batch b against a store
    whose newest committed version IS b — without the guard the
    merge lazily reads that directory and overwrites the same path
    (Spark rejects read-overwrite, wedging the stream forever).
    Emulated exactly by re-running the drained source under a FRESH
    checkpoint: every replayed batch finds its own version committed
    and must short-circuit, leaving the store byte-identical."""
    ev, stream, out, cp = _setup(spark, sf_dir, tmp_path)
    streaming_hll_registers(stream, out, cp, p=P)
    before = _regs(hll_store_read(spark, out))
    stream2 = (
        spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(tmp_path / "src"))
    )
    streaming_hll_registers(stream2, out, str(tmp_path / "cp2"), p=P)
    assert _regs(hll_store_read(spark, out)) == before


def test_merge_source_is_capped_below_the_batch(spark, sf_dir, tmp_path):
    """Belt and braces for the same window: hll_store_read with a
    max_version ceiling must never return the capped version itself,
    only strictly older complete ones."""
    ev, stream, out, cp = _setup(spark, sf_dir, tmp_path)
    streaming_hll_registers(stream, out, cp, p=P)
    import os

    versions = sorted(
        int(d.split("=", 1)[1])
        for d in os.listdir(out)
        if d.startswith("version=")
    )
    newest = versions[-1]
    capped = hll_store_read(spark, out, max_version=newest)
    if len(versions) == 1:
        assert capped is None
    else:
        # the capped read equals reading the PREVIOUS version directly
        prev = spark.read.parquet(
            os.path.join(out, f"version={versions[-2]}")
        )
        assert _regs(capped) == _regs(prev)
    assert hll_store_read(spark, out, max_version=newest + 1) is not None


def test_old_versions_are_pruned(spark, sf_dir, tmp_path):
    """Retention (r11 ADVICE): the store keeps only the newest
    ``retain_versions`` committed directories, so a long-running
    stream's storage is O(retain · |keys| · K), not O(n_batches).
    Markerless (crashed) directories are not touched."""
    import os

    ev, stream, out, cp = _setup(spark, sf_dir, tmp_path)
    junk = os.path.join(out, "version=999")  # fake crashed (markerless)
    os.makedirs(junk)
    streaming_hll_registers(stream, out, cp, p=P, retain_versions=1)
    committed = [
        d
        for d in os.listdir(out)
        if d.startswith("version=")
        and os.path.exists(os.path.join(out, d, "_SUCCESS"))
    ]
    assert len(committed) == 1  # two batches ran; only the newest kept
    assert os.path.isdir(junk)  # crashed dir left for inspection
    # and the surviving store still equals the batch sketch
    got = _regs(hll_store_read(spark, out))
    want = _regs(hll_registers(ev, "event_type", "user_id", p=P))
    assert got == want

"""Content-defined chunking (gear-hash CDC): insertion robustness
that fixed-stride chunking cannot have, boundary locality, guard and
edge semantics, and the cross-engine DuckDB replay (the rolling hash
is plain signed int64 by construction, so DuckDB replays boundaries
bit-for-bit from the same md5-derived gear table).  Staged in r11
for r12 driver registration."""

from __future__ import annotations

import pytest

from tests.oracle_check import compare
from vector_db_handler_spark import driver_queries as dq
from vector_db_handler_spark.operators.dedup import (
    CDC_WINDOW,
    cdc_containment_pairs,
    gear_cdc_chunks,
)
from vector_db_handler_spark.operators.media import synthesize_blobs_with_edits

MASK_BITS = dq._CDC_MASK_BITS  # ~64-byte expected chunks
ID_OFF = dq._CDC_ID_OFF

#: The registered oracle (moved into driver_queries.py in r12).
ORACLE_SQL = dq._CDC_PAIRS_SQL


def _media(spark, rows):
    return spark.createDataFrame(rows, "media_id long, media binary")


def _body(seed: int, n: int) -> bytes:
    """Deterministic pseudo-random ASCII body (printable, no md5 use
    so it is independent of the gear table)."""
    out = bytearray()
    x = seed * 2654435761 % 2**32 + 1
    for _ in range(n):
        x = (1103515245 * x + 12345) % 2**31
        out.append(32 + (x % 90))
    return bytes(out)


def test_insertion_only_disturbs_local_chunks(spark):
    """Insert 9 bytes mid-blob: the chunk sets must still overlap
    heavily (containment >= 0.5 at the default dial) because
    boundaries re-align CDC_WINDOW bytes after the edit — the
    property that makes CDC the storage-dedup algorithm."""
    b = _body(7, 2_000)
    edited = b[:1000] + b"@@INSERT@@" + b[1000:]
    media = _media(spark, [(1, b), (2, edited), (3, _body(99, 2_000))])
    pairs = {
        (r["a"], r["b"]): r
        for r in cdc_containment_pairs(media, mask_bits=MASK_BITS).collect()
    }
    assert set(pairs) == {(1, 2)}
    assert pairs[(1, 2)]["containment"] >= 0.5


def test_chunks_before_the_edit_are_identical(spark):
    b = _body(11, 1_500)
    edited = b[:800] + b"XYZ" + b[800:]
    media = _media(spark, [(1, b), (2, edited)])
    rows = gear_cdc_chunks(media, mask_bits=MASK_BITS).collect()
    by_id = {1: [], 2: []}
    for r in rows:
        by_id[r["media_id"]].append((r["chunk_idx"], r["chunk_hash"], r["chunk_len"]))
    a = sorted(by_id[1])
    c = sorted(by_id[2])
    # every chunk strictly before the edit point is byte-identical
    pos = 0
    for (ia, ha, la), (ic, hc, lc) in zip(a, c):
        if pos + max(la, lc) + CDC_WINDOW >= 800:
            break
        assert (ha, la) == (hc, lc), (ia, pos)
        pos += la


def test_chunk_lengths_cover_the_blob_exactly(spark):
    b = _body(3, 4_096)
    rows = gear_cdc_chunks(_media(spark, [(1, b)]), mask_bits=MASK_BITS).collect()
    assert sum(r["chunk_len"] for r in rows) == len(b)
    idxs = sorted(r["chunk_idx"] for r in rows)
    assert idxs == list(range(len(rows)))
    # expected chunk size ~2^6: sanity band, not exact
    assert 16 <= len(b) / len(rows) <= 256


def test_hot_chunk_guard_prunes_shared_headers(spark):
    header = _body(42, 600)
    rows = [(i, header + _body(100 + i, 400)) for i in range(1, 6)]
    media = _media(spark, rows)
    unguarded = cdc_containment_pairs(
        media, mask_bits=MASK_BITS, min_containment=0.3, max_df=None
    ).count()
    guarded = cdc_containment_pairs(
        media, mask_bits=MASK_BITS, min_containment=0.3, max_df=4
    ).count()
    assert unguarded == 10  # all C(5,2) pairs share the header chunks
    assert guarded < unguarded


def test_empty_and_null_blobs_emit_nothing(spark):
    media = spark.createDataFrame(
        [(1, b""), (2, None), (3, b"x" * 100)], "media_id long, media binary"
    )
    rows = gear_cdc_chunks(media, mask_bits=MASK_BITS).collect()
    assert {r["media_id"] for r in rows} == {3}


def test_mask_bits_validated(spark):
    with pytest.raises(ValueError, match="mask_bits"):
        gear_cdc_chunks(_media(spark, [(1, b"abc")]), mask_bits=0)


def test_cross_engine_oracle_replay(spark, sf_dir, duck):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    blobs = synthesize_blobs_with_edits(docs)
    compare(
        cdc_containment_pairs(blobs, mask_bits=MASK_BITS), duck, ORACLE_SQL
    )


def test_planted_fixture_edits_recovered(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    blobs = synthesize_blobs_with_edits(docs)
    pairs = cdc_containment_pairs(blobs, mask_bits=MASK_BITS).collect()
    planted = [r for r in pairs if r["b"] - r["a"] == ID_OFF]
    assert len(planted) > 0
    for r in planted:
        assert r["containment"] >= 0.5

"""Content-defined chunking (gear-hash CDC): insertion robustness
that fixed-stride chunking cannot have, boundary locality, guard and
edge semantics, and the cross-engine DuckDB replay (the rolling hash
is plain signed int64 by construction, so DuckDB replays boundaries
bit-for-bit from the same md5-derived gear table).  Staged in r11
for r12 driver registration."""

from __future__ import annotations

import pytest

from tests.oracle_check import compare
from vector_db_handler_spark.operators.dedup import (
    CDC_WINDOW,
    cdc_containment_pairs,
    gear_cdc_chunks,
)
from vector_db_handler_spark.operators.media import synthesize_blobs_with_edits

MASK_BITS = 6  # ~64-byte expected chunks — the r12 registration dial
ID_OFF = 1_000_000

#: gear(ch) in SQL — same 40-bit md5 convention as the Python table.
_GEAR = "CAST('0x' || substr(md5(substr(text, i, 1)), 1, 10) AS BIGINT)"

#: h_i = Σ_{t=0}^{15} gear(ch_{i−t})·2^t — 16 explicit lag terms.
_ROLL = " + ".join(
    f"coalesce(lag(g, {t}) OVER w, 0) * {1 << t}" for t in range(CDC_WINDOW)
)

#: DuckDB twin over synthesize_blobs_with_edits(documents) — the SQL
#: an r12 registration will carry (ASCII fixture: SQL chars == the
#: kernel's latin-1 bytes).
ORACLE_SQL = f"""
WITH m AS (SELECT doc_id AS media_id, text FROM documents WHERE text IS NOT NULL),
clips AS (
  SELECT media_id, text FROM m
  UNION ALL
  SELECT media_id + {ID_OFF},
         substr(text, 1, length(text) // 2) || '@@EDIT@@'
           || substr(text, length(text) // 2 + 1)
  FROM m WHERE media_id % 9 = 0
),
chars AS (
  SELECT media_id, CAST(i AS BIGINT) AS pos, {_GEAR} AS g
  FROM clips, unnest(generate_series(1, length(text))) AS s(i)
),
rolled AS (
  SELECT media_id, pos, ({_ROLL}) AS h
  FROM chars WINDOW w AS (PARTITION BY media_id ORDER BY pos)
),
cuts AS (
  SELECT media_id, pos,
         CASE WHEN h % {1 << MASK_BITS} = 0 THEN 1 ELSE 0 END AS is_cut
  FROM rolled
),
islands AS (
  SELECT media_id, pos,
         CAST(coalesce(sum(is_cut) OVER (
           PARTITION BY media_id ORDER BY pos
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
           AS cidx
  FROM cuts
),
spans AS (
  SELECT media_id, cidx, min(pos) AS s, count(*) AS n
  FROM islands GROUP BY 1, 2
),
chunks AS (
  SELECT DISTINCT sp.media_id,
         CAST('0x' || substr(md5(substr(c.text, CAST(sp.s AS INT),
                                        CAST(sp.n AS INT))), 1, 15)
              AS BIGINT) AS chunk_hash
  FROM spans sp JOIN clips c ON sp.media_id = c.media_id
),
guarded AS (
  SELECT * FROM chunks WHERE chunk_hash NOT IN (
    SELECT chunk_hash FROM chunks GROUP BY chunk_hash
    HAVING count(*) > 50
  )
),
sizes AS (SELECT media_id, count(*) AS n FROM guarded GROUP BY 1),
shared AS (
  SELECT x.media_id AS a, y.media_id AS b, count(*) AS n_shared
  FROM guarded x JOIN guarded y
    ON x.chunk_hash = y.chunk_hash AND x.media_id < y.media_id
  GROUP BY 1, 2
)
SELECT s.a, s.b, CAST(s.n_shared AS BIGINT) AS n_shared,
       ROUND(CAST(s.n_shared AS DOUBLE) / least(sa.n, sb.n), 6)
         AS containment
FROM shared s
JOIN sizes sa ON s.a = sa.media_id
JOIN sizes sb ON s.b = sb.media_id
WHERE s.n_shared >= 2
  AND CAST(s.n_shared AS DOUBLE) / least(sa.n, sb.n) >= 0.5
"""


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

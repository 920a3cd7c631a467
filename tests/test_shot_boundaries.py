"""Shot-boundary detection over fixed-stride frames: planted-scene
semantics plus the cross-engine DuckDB replay (the per-byte distance
is exact integer arithmetic over ASCII fixture bytes).  Staged for
r10 driver registration."""

from __future__ import annotations

from tests.oracle_check import compare
from vector_db_handler_spark import driver_queries as dq
from vector_db_handler_spark.operators.media import (
    shot_boundaries,
    synthesize_media,
)

FB = dq._SHOT_FRAME_BYTES  # 64 — the registered frame size

#: DuckDB twin over synthesize_media(documents) — frames are substr
#: slices of the UTF-8 text (ASCII fixture: ord(char) == byte), the
#: diff is a list_sum over per-position absolute differences, and the
#: boundary rule is the same exact integer comparison.
ORACLE_SQL = dq._SHOT_BOUNDARIES_SQL



def _media(spark, rows):
    return spark.createDataFrame(rows, "media_id long, media binary")


def test_planted_scene_cut_is_the_only_boundary(spark):
    """Two 'scenes' of repeated frames: intra-scene diffs are zero, the
    single cut exceeds any sane threshold — exactly one boundary, at
    the scene join."""
    scene_a = bytes([40, 200] * (FB // 2)) * 4
    scene_b = bytes([220, 10] * (FB // 2)) * 3
    media = _media(spark, [(1, scene_a + scene_b)])
    rows = {
        r["frame_idx"]: r
        for r in shot_boundaries(media, frame_bytes=FB).collect()
    }
    assert len(rows) == 6  # 7 frames -> 6 consecutive diffs
    assert [j for j, r in sorted(rows.items()) if r["is_boundary"]] == [4]
    assert rows[1]["diff_sum"] == 0 and rows[5]["diff_sum"] == 0
    assert rows[4]["diff_sum"] == (180 + 190) * (FB // 2)


def test_threshold_dial_and_ragged_tail(spark):
    """A mild gradient sits under the default threshold but above a
    stricter one; the final short frame compares over min-length."""
    mild = bytes([100] * FB + [110] * FB + [110] * 10)
    media = _media(spark, [(1, mild)])
    default = {
        r["frame_idx"]: r for r in shot_boundaries(media, frame_bytes=FB).collect()
    }
    assert default[1]["diff_sum"] == 10 * FB  # per-byte 10 < 12% of 255
    assert not default[1]["is_boundary"]
    assert default[2]["cmp_bytes"] == 10 and default[2]["diff_sum"] == 0
    strict = {
        r["frame_idx"]: r
        for r in shot_boundaries(
            media, frame_bytes=FB, boundary_permille=30
        ).collect()
    }
    assert strict[1]["is_boundary"]  # 10/255 = 3.9% > 3.0%


def test_cross_engine_oracle_replay(spark, sf_dir, duck):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    media = synthesize_media(docs.filter("text is not null")).select(
        "media_id", "media"
    )
    compare(shot_boundaries(media, frame_bytes=FB), duck, ORACLE_SQL)

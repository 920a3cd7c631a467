"""Shot segments (gaps-and-islands over the hard-cut flags): planted
multi-scene semantics, degenerate single-frame clips, and the
cross-engine DuckDB replay.  Staged for r11 driver registration."""

from __future__ import annotations

from tests.oracle_check import compare
from vector_db_handler_spark import driver_queries as dq
from vector_db_handler_spark.operators.media import (
    shot_segments,
    synthesize_media,
)

FB = dq._SHOT_FRAME_BYTES  # 64 — the registered frame size

#: The registration's oracle IS this test's oracle (one source of
#: truth since the r11 registration); kept here only as the import.
ORACLE_SQL = dq._SHOT_SEGMENTS_SQL


def _media(spark, rows):
    return spark.createDataFrame(rows, "media_id long, media binary")


def test_three_planted_scenes_make_three_segments(spark):
    """Scenes of repeated frames joined by hard cuts: the islands must
    be exactly the scenes, keyframe = first frame of each, and motion
    must exclude the cut distances (zero here — frames repeat)."""
    a = bytes([10, 240] * (FB // 2)) * 3
    b = bytes([240, 10] * (FB // 2)) * 2
    c = bytes([90, 170] * (FB // 2)) * 4
    media = _media(spark, [(1, a + b + c)])
    rows = {
        r["shot_idx"]: r for r in shot_segments(media, frame_bytes=FB).collect()
    }
    assert len(rows) == 3
    assert (rows[0]["start_frame"], rows[0]["end_frame"], rows[0]["n_frames"]) == (0, 2, 3)
    assert (rows[1]["start_frame"], rows[1]["end_frame"], rows[1]["n_frames"]) == (3, 4, 2)
    assert (rows[2]["start_frame"], rows[2]["end_frame"], rows[2]["n_frames"]) == (5, 8, 4)
    for r in rows.values():
        assert r["keyframe"] == r["start_frame"]
        assert r["motion"] == 0


def test_single_frame_clip_is_one_degenerate_shot(spark):
    media = _media(spark, [(1, bytes([7] * (FB // 2))), (2, b"")])
    rows = shot_segments(media, frame_bytes=FB).collect()
    assert len(rows) == 1  # the empty blob emits nothing
    r = rows[0]
    assert (r["media_id"], r["shot_idx"], r["start_frame"], r["end_frame"]) == (1, 0, 0, 0)
    assert (r["n_frames"], r["motion"]) == (1, 0)


def test_gradual_motion_accumulates_without_splitting(spark):
    """A mild gradient stays one shot; its motion is the exact summed
    frame distance."""
    clip = bytes([100] * FB + [110] * FB + [120] * FB)
    rows = shot_segments(_media(spark, [(1, clip)]), frame_bytes=FB).collect()
    assert len(rows) == 1
    assert rows[0]["n_frames"] == 3
    assert rows[0]["motion"] == 10 * FB + 10 * FB


def test_cross_engine_oracle_replay(spark, sf_dir, duck):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    media = synthesize_media(docs.filter("text is not null")).select(
        "media_id", "media"
    )
    compare(shot_segments(media, frame_bytes=FB), duck, ORACLE_SQL)

"""Temporal video copy detection (frame-gram offset voting): planted
shifted-copy recovery with the exact offset, montage rejection (the
property bag-of-frames cannot give), hot-gram guard, and the
cross-engine DuckDB replay.  Staged for r11 driver registration —
the only fully-codegen multimodal operator (native binary substring +
md5, no Python kernel)."""

from __future__ import annotations

import pytest

from tests.oracle_check import compare
from vector_db_handler_spark import driver_queries as dq
from vector_db_handler_spark.operators.media import (
    synthesize_video_with_copies,
    video_copy_pairs,
)

FB = dq._VIDEO_FRAME_BYTES  # 64 — the registered frame stride
COPY_MOD = dq._VIDEO_COPY_MOD
ID_OFF = dq._VIDEO_ID_OFF

#: The registration's oracle IS this test's oracle (one source of
#: truth since the r11 registration); kept here only as the import.
ORACLE_SQL = dq._VIDEO_COPY_SQL


def _media(spark, rows):
    return spark.createDataFrame(rows, "media_id long, media binary")


def _frames(tags):
    """A clip from whole distinct frames (one byte value per frame)."""
    return b"".join(bytes([40 + t]) * FB for t in tags)


def test_shifted_copy_found_at_exact_offset(spark):
    """A 2-frame-prepended re-upload must pair with its original at
    offset −2 (original frame j = copy frame j+2) with containment ≈ 1;
    an unrelated clip must not pair."""
    body = list(range(10))
    media = _media(
        spark,
        [
            (1, _frames(body)),
            (2, _frames([30, 31] + body)),  # 2-frame intro prepended
            (3, _frames([15 + i for i in range(10)])),  # unrelated
        ],
    )
    pairs = {
        (r["a"], r["b"]): r
        for r in video_copy_pairs(media, frame_bytes=FB).collect()
    }
    assert set(pairs) == {(1, 2)}
    r = pairs[(1, 2)]
    assert r["offset"] == -2
    assert r["align_frac"] == 1.0
    assert r["n_aligned"] == 8  # 10 frames -> 8 trigram grams


def test_montage_is_rejected_where_bag_of_frames_matches(spark):
    """A clip re-cut from the SAME frames in a different order shares
    every frame hash but almost no frame-trigram at one offset — the
    temporal rail must stay silent where a bag-of-frames overlap would
    fire."""
    media = _media(
        spark,
        [
            (1, _frames([0, 1, 2, 3, 4, 5, 6, 7])),
            (2, _frames([7, 5, 3, 1, 6, 4, 2, 0])),  # montage re-cut
        ],
    )
    assert video_copy_pairs(media, frame_bytes=FB).count() == 0


def test_hot_gram_guard_prunes_universal_sequences(spark):
    """A shared intro sequence present in every clip is droppable via
    max_df so it cannot drive the join volume."""
    intro = [1, 2, 3, 4, 5]
    rows = [
        (i, _frames(intro + [20 + 3 * i, 21 + 3 * i, 22 + 3 * i]))
        for i in range(1, 6)
    ]
    media = _media(spark, rows)
    unguarded = video_copy_pairs(
        media, frame_bytes=FB, min_align_frac=0.3
    ).count()
    guarded = video_copy_pairs(
        media, frame_bytes=FB, min_align_frac=0.3, max_df=4
    ).count()
    assert unguarded == 10  # all C(5,2) pairs share the intro grams
    assert guarded == 0  # nothing aligns once the intro is pruned


def test_gram_must_be_at_least_two(spark):
    media = _media(spark, [(1, b"x" * FB)])
    with pytest.raises(ValueError, match="gram"):
        video_copy_pairs(media, gram=1)


def test_cross_engine_oracle_replay(spark, sf_dir, duck):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    clips = synthesize_video_with_copies(docs, frame_bytes=FB)
    compare(video_copy_pairs(clips, frame_bytes=FB), duck, ORACLE_SQL)


def test_planted_fixture_copies_recovered(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    clips = synthesize_video_with_copies(docs, frame_bytes=FB)
    pairs = video_copy_pairs(clips, frame_bytes=FB).collect()
    planted = [r for r in pairs if r["b"] - r["a"] == ID_OFF]
    assert len(planted) > 0
    for r in planted:
        assert r["offset"] == -1  # one whole prepended frame
        assert r["align_frac"] == 1.0

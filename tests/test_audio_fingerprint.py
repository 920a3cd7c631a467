"""Audio constellation fingerprints (Wang ISMIR'03 shape, exact
integer WHT): determinism, time-shift invariance, near-dup pairing,
and the hot-landmark guard.  Staged for r10 driver registration
(rows-only by documented necessity — the WHT butterfly has no
relational form)."""

from __future__ import annotations

import io
import struct
import wave

from vector_db_handler_spark.operators.media import (
    audio_landmarks,
    audio_neardup_pairs,
)

HOP = 32


def _wav(samples: list[int]) -> bytes:
    """8-bit PCM mono WAV from unsigned byte samples."""
    buf = io.BytesIO()
    with wave.open(buf, "wb") as wf:
        wf.setnchannels(1)
        wf.setsampwidth(1)
        wf.setframerate(8000)
        wf.writeframes(struct.pack(f"{len(samples)}B", *samples))
    return buf.getvalue()


def _tone(n: int, seed: int) -> list[int]:
    """Deterministic pseudo-music: square-wave "notes" whose period
    and amplitude follow a seed-driven LCG schedule (a new note every
    250 samples) — structured, non-stationary content, unlike raw LCG
    noise whose stationary spectrum makes every clip look alike."""
    out, x = [], seed
    while len(out) < n:
        x = (x * 1103515245 + 12345) % (2**31)
        period = 4 + ((x >> 16) % 37)
        amp = 20 + ((x >> 8) % 100)
        for i in range(250):
            out.append(128 + (amp if (i // period) % 2 == 0 else -amp))
    return out[:n]


def _media(spark, rows):
    return spark.createDataFrame(rows, "media_id long, media binary")


def _lm_sets(df):
    out: dict[int, set[int]] = {}
    for r in df.collect():
        out.setdefault(r["media_id"], set()).add(r["landmark"])
    return out


def test_landmarks_deterministic_across_partitionings(spark):
    clip = _wav(_tone(2_000, seed=7))
    media = _media(spark, [(1, clip), (2, clip)])
    one = _lm_sets(audio_landmarks(media.coalesce(1)))
    many = _lm_sets(audio_landmarks(media.repartition(8)))
    assert one == many
    assert one[1] == one[2] and len(one[1]) > 50  # identical audio, rich set


def test_time_shift_leaves_landmarks_invariant(spark):
    """Landmarks carry only Δt, so prepending whole hops of silence
    must preserve the original clip's landmark set (the silent frames
    themselves emit nothing — |coef| = 0 bands are dropped)."""
    body = _tone(2_000, seed=11)
    shifted = [128] * (4 * HOP) + body
    media = _media(spark, [(1, _wav(body)), (2, _wav(shifted))])
    sets = _lm_sets(audio_landmarks(media))
    # every original landmark survives the shift; the shifted clip may
    # add a handful of boundary landmarks where silence meets signal
    assert sets[1] <= sets[2]
    assert len(sets[2] - sets[1]) <= len(sets[1]) // 5


def test_neardup_pairs_find_shifted_copy_not_unrelated(spark):
    """Containment separates a shifted copy (≈ 1) from a structurally
    unrelated clip (well under the 0.5 default) even though the
    unrelated pair shares hundreds of raw landmarks — the reason the
    decision variable is the fraction, not the count."""
    body = _tone(3_000, seed=23)
    media = _media(
        spark,
        [
            (1, _wav(body)),
            (2, _wav([128] * (2 * HOP) + body)),  # shifted copy
            (3, _wav(_tone(3_000, seed=99))),  # unrelated
        ],
    )
    pairs = {
        (r["a"], r["b"]): r
        for r in audio_neardup_pairs(media).collect()
    }
    assert set(pairs) == {(1, 2)}
    assert pairs[(1, 2)]["containment"] > 0.9
    # the unrelated pairs exist below threshold, far from the copy
    low = {
        (r["a"], r["b"]): r["containment"]
        for r in audio_neardup_pairs(media, min_containment=0.0).collect()
    }
    assert low[(1, 3)] < 0.4 and low[(2, 3)] < 0.4


def test_hot_landmark_guard_prunes_universal_buckets(spark):
    """A landmark present in every clip (a shared intro jingle) must be
    droppable via max_df so it cannot drive the join volume; sizes are
    recomputed post-guard, so containment reflects the joined space."""
    shared = _tone(1_500, seed=5)
    rows = [(i, _wav(shared + _tone(1_500, seed=100 + i))) for i in range(1, 5)]
    media = _media(spark, rows)
    unguarded = audio_neardup_pairs(
        media, min_containment=0.3, max_df=None
    ).count()
    guarded = audio_neardup_pairs(media, min_containment=0.3, max_df=3).count()
    assert unguarded == 6  # all C(4,2) pairs share the planted intro
    assert guarded < unguarded  # universal landmarks no longer join


def test_non_audio_media_is_skipped(spark):
    media = _media(spark, [(1, b"P5 2 2 255 \x00\x01\x02\x03"), (2, _wav(_tone(1_500, 3)))])
    got = _lm_sets(audio_landmarks(media))
    assert 1 not in got and 2 in got


def test_null_blobs_are_dropped_declaratively(spark):
    media = spark.createDataFrame(
        [(1, None), (2, _wav(_tone(1_500, 3)))], "media_id long, media binary"
    )
    got = _lm_sets(audio_landmarks(media))
    assert 1 not in got and 2 in got

"""Multimodal plumbing that the SQL oracles can't check: the
decode/feature-extract mapInPandas stage (schema, batch shape,
determinism, normalization) and the stubbed real-codec boundary."""

from __future__ import annotations

import pytest

from vector_db_handler_spark.operators import media as media_ops


@pytest.fixture(scope="module")
def media(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return media_ops.synthesize_media(docs)


def test_media_schema(media):
    assert [f.name for f in media.schema.fields] == ["media_id", "modality", "media", "byte_len"]
    assert media.schema["media"].dataType.typeName() == "binary"
    mods = {r["modality"] for r in media.select("modality").distinct().collect()}
    assert mods == set(media_ops.MODALITIES)


def test_decode_features_shape_and_determinism(media):
    feats = media_ops.decode_features(media).collect()
    assert len(feats) == media.count()
    for r in feats[:10]:
        assert len(r["features"]) == media_ops.N_HIST_BUCKETS
        assert abs(sum(r["features"]) - 1.0) < 1e-5  # L1-normalized histogram
    again = media_ops.decode_features(media).collect()
    assert {r["media_id"]: r["features"] for r in feats} == {
        r["media_id"]: r["features"] for r in again
    }


def test_real_decode_roundtrips_pgm_and_wav(spark, sf_dir):
    """decode='real' parses genuine containers: the decoded signal must
    equal the known body bytes for BOTH the PGM raster and the WAV PCM
    paths (synthesize_containers wraps the same padded text in each)."""
    from pyspark.sql import functions as F

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(30)
    containers = media_ops.synthesize_containers(docs)
    decoded = {
        r["media_id"]: (r["modality"], bytes(r["signal"]))
        for r in media_ops.decode_signal(containers, decode="real").collect()
    }
    expected = {
        r["doc_id"]: bytes(r["body"])
        for r in docs.select(
            "doc_id",
            F.encode(F.rpad(F.substring("text", 1, 256), 256, " "), "UTF-8").alias("body"),
        ).collect()
    }
    mods_seen = set()
    for mid, (mod, sig) in decoded.items():
        assert sig == expected[mid], f"decode mismatch for {mid} ({mod})"
        mods_seen.add(mod)
    assert mods_seen == set(media_ops.MODALITIES)


def test_real_decode_phash_is_container_invariant(spark, sf_dir):
    """A perceptual hash over the DECODED signal must not see the
    container: the same payload wrapped as PGM vs WAV must produce the
    same fingerprint under decode='real'."""
    from pyspark.sql import functions as F

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(10)
    as_image = media_ops.synthesize_containers(docs.withColumn("doc_id", F.col("doc_id") * 3))
    as_audio = media_ops.synthesize_containers(
        docs.withColumn("doc_id", F.col("doc_id") * 3 + 1)
    )
    assert {r["modality"] for r in as_image.select("modality").distinct().collect()} == {"image"}
    assert {r["modality"] for r in as_audio.select("modality").distinct().collect()} == {"audio"}
    ph_img = {
        r["media_id"] // 3: (r["phash_hi"], r["phash_lo"])
        for r in media_ops.media_phash(as_image, decode="real").collect()
    }
    ph_aud = {
        (r["media_id"] - 1) // 3: (r["phash_hi"], r["phash_lo"])
        for r in media_ops.media_phash(as_audio, decode="real").collect()
    }
    assert ph_img == ph_aud and len(ph_img) == 10


def test_real_decode_features_histogram(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(10)
    containers = media_ops.synthesize_containers(docs)
    feats = media_ops.decode_features(containers, decode="real").collect()
    assert len(feats) == 10
    for r in feats:
        assert len(r["features"]) == media_ops.N_HIST_BUCKETS
        assert abs(sum(r["features"]) - 1.0) < 1e-5


def test_decode_rejects_unknown_mode(media):
    with pytest.raises(ValueError):
        media_ops.decode_features(media, decode="typo")
    with pytest.raises(ValueError):
        media_ops.decode_signal(media, decode="typo")


def test_fixture_is_ascii(media, spark, sf_dir):
    # The frame/resize oracles slice TEXT where Spark slices BYTES;
    # that identity holds only while the fixture stays pure ASCII.
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    from pyspark.sql import functions as F

    n = docs.filter(F.length(F.encode("text", "UTF-8")) != F.length("text")).count()
    assert n == 0


def test_frame_sample_reassembles_to_strided_source(media):
    # Concatenating a blob's sampled frames in frame_idx order must
    # equal the source bytes at stride positions — content, not count.
    rows = media_ops.frame_sample(media, frame_bytes=256, every_k=4).collect()
    by_id = {}
    for r in rows:
        by_id.setdefault(r["media_id"], []).append(r)
        assert r["frame_idx"] % 4 == 0
        assert r["frame_len"] == len(r["frame"]) <= 256
    src = {r["media_id"]: bytes(r["media"]) for r in media.collect()}
    for mid, frames in list(by_id.items())[:20]:
        got = b"".join(bytes(f["frame"]) for f in sorted(frames, key=lambda f: f["frame_idx"]))
        want = b"".join(
            src[mid][j * 256 : (j + 1) * 256]
            for j in range(0, (len(src[mid]) + 255) // 256, 4)
        )
        assert got == want


def test_resize_fixed_length_and_empty_blob(media, spark):
    out = media_ops.resize_normalize(media, out_len=64).collect()
    assert len(out) == media.count()
    assert all(len(bytes(r["resized"])) == 64 for r in out)
    # Empty blob edge: survives with an empty signal instead of crashing.
    from pyspark.sql import functions as F

    empty = media.limit(1).withColumn("media", F.lit(b""))
    [r] = media_ops.resize_normalize(empty, out_len=64).collect()
    assert bytes(r["resized"]) == b""


def test_phash_stable_under_small_edit(spark):
    # pHash property: tiny local edit -> small Hamming distance; the
    # exact md5 would flip completely.
    base = " ".join(f"word{i}" for i in range(200))
    edited = base.replace("word100", "wordX")
    docs = spark.createDataFrame([(1, base), (2, edited)], "doc_id long, text string")
    rows = {r["media_id"]: (r["phash_hi"], r["phash_lo"])
            for r in media_ops.media_phash(media_ops.synthesize_media(docs)).collect()}
    dist = bin(rows[1][0] ^ rows[2][0]).count("1") + bin(rows[1][1] ^ rows[2][1]).count("1")
    assert dist <= 16, f"hamming distance {dist} too large for a 1-word edit"


def test_decode_fn_injects_custom_decoder(spark, sf_dir):
    """A user-supplied codec drops into decode_features/media_phash
    without operator edits; the default (fake-decode) results are
    unchanged by the new parameter."""
    from vector_db_handler_spark.operators import media as media_ops

    media = media_ops.synthesize_media(
        spark.read.parquet(f"{sf_dir}/documents.parquet")
    ).limit(20)

    # Self-contained stand-in for a real codec: constant 4-byte signal.
    def const_decode(blob: bytes):
        import numpy as _np

        return _np.array([0, 64, 128, 255], dtype=_np.uint8)

    feats = media_ops.decode_features(media, decode_fn=const_decode).collect()
    assert len(feats) == 20
    # every histogram is identical and nonzero exactly where the
    # constant signal lands
    first = feats[0]["features"]
    assert all(r["features"] == first for r in feats)
    assert sum(1 for v in first if v > 0) == 4

    def const_text(blob: bytes) -> str:
        return "abcdabcdabcd"

    ph = media_ops.media_phash(media, decode_fn=const_text).collect()
    assert len({(r["phash_hi"], r["phash_lo"]) for r in ph}) == 1

    # default path unaffected
    base = media_ops.media_phash(media).collect()
    assert len(base) == 20

"""Multimodal (binary) media columns for training-data pipelines.

No analog in the reference (it stores text payloads only,
``app/core/document_ingestor.py:104-108``); this is the extension
surface from the builder brief: treat image/audio/video as opaque
``BINARY`` columns with typed metadata, and run dedup / feature /
fingerprint passes over them with the same Spark machinery as text.

Design for 100 TB:

* Media rows are (id, modality, media BINARY, byte_len) — the binary
  column participates in column pruning like any other, so metadata
  queries never read the blobs (parquet reads only requested columns).
* Exact dedup = md5 over raw bytes: one map-side-combined shuffle on a
  128-bit key; runs at scan speed, no decode.
* Decode / feature-extract is the ONE Python stage, shaped as
  ``mapInPandas`` (one Arrow batch of blobs per Python hop).  Two
  decoders ship: ``decode='fake'`` runs a deterministic stand-in
  (byte histogram), and ``decode='real'`` (``make_stdlib_decoder``)
  parses actual container formats with the stdlib alone — binary PGM
  (P5) image headers + pixel planes and RIFF/WAVE PCM audio — emitting
  per-row dimensions, sample stats, and an md5 of the decoded plane.
  Heavier codecs (JPEG/PNG via PIL, compressed audio via soundfile/av)
  are the documented swap-in at the same ``mapInPandas`` seam; the
  Spark-side plumbing — schema, batching, UDF signature — is identical
  and fully tested either way.
* Perceptual near-dup: a SimHash over the decoded signal's character
  4-grams — with a real decoder the signal is the normalized pixel /
  sample sequence and the hashing stage is unchanged.

The synthetic media table derives from the ``documents`` fixture
(UTF-8 text bytes as blobs), which keeps every hash oracle-checkable:
``md5(media) == md5(text)`` when the bytes ARE the utf-8 text.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from vector_db_handler_spark.functions import text as text_fns

MODALITIES = ["image", "audio", "video"]

N_HIST_BUCKETS = 16


def synthesize_media(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Fixture adapter: a deterministic media table from the documents
    fixture — UTF-8 bytes as the blob, modality round-robined by id.
    Production tables land here from binary file ingest
    (``spark.read.format('binaryFile')``) instead."""
    modality = F.element_at(
        F.array(*[F.lit(m) for m in MODALITIES]), (F.col(id_col) % 3 + 1).cast("int")
    )
    return docs.select(
        F.col(id_col).alias("media_id"),
        modality.alias("modality"),
        F.encode(F.col(text_col), "UTF-8").alias("media"),
    ).withColumn("byte_len", F.length("media"))


def synthesize_containers(
    docs: DataFrame,
    body_bytes: int = 256,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Fixture adapter for the REAL decode path: wrap each document's
    (padded/truncated to ``body_bytes``) UTF-8 bytes in a VALID media
    container — ``P5`` PGM for ``image``/``video`` rows, RIFF/WAVE
    8-bit PCM for ``audio`` — so :func:`make_stdlib_decoder` exercises
    genuine header parsing end-to-end.

    By construction the DECODED signal equals the padded text bytes in
    every container, which keeps downstream hashes oracle-checkable
    (``md5(signal) == md5(rpad(substr(text,…)))`` for ASCII fixtures)
    while the container framing differs per modality.  Production
    tables land real files here via ``spark.read.format('binaryFile')``.
    """
    import struct

    nb = int(body_bytes)
    side = int(nb**0.5)
    assert side * side == nb, "body_bytes must be a perfect square (PGM w*h)"
    pgm_header = f"P5\n{side} {side}\n255\n".encode()
    # Minimal canonical WAV: RIFF header + fmt (PCM mono 8-bit 8kHz) + data.
    wav_header = (
        b"RIFF"
        + struct.pack("<I", 36 + nb)
        + b"WAVEfmt "
        + struct.pack("<IHHIIHH", 16, 1, 1, 8000, 8000, 1, 8)
        + b"data"
        + struct.pack("<I", nb)
    )
    modality = F.element_at(
        F.array(*[F.lit(m) for m in MODALITIES]), (F.col(id_col) % 3 + 1).cast("int")
    )
    # Pad/truncate NATIVELY (rpad on the string, then encode): the blob
    # body never takes a Python hop; only header framing is constant.
    body = F.encode(F.rpad(F.substring(F.col(text_col), 1, nb), nb, " "), "UTF-8")
    return docs.select(
        F.col(id_col).alias("media_id"),
        modality.alias("modality"),
        F.when(modality == "audio", F.concat(F.lit(wav_header), body))
        .otherwise(F.concat(F.lit(pgm_header), body))
        .alias("media"),
    ).withColumn("byte_len", F.length("media"))


def _wav_header(n_data_bytes: int) -> bytes:
    """Canonical RIFF/WAVE header for ``n_data_bytes`` of 8-bit PCM
    mono 8 kHz — the same framing :func:`synthesize_containers` uses."""
    import struct

    return (
        b"RIFF"
        + struct.pack("<I", 36 + n_data_bytes)
        + b"WAVEfmt "
        + struct.pack("<IHHIIHH", 16, 1, 1, 8000, 8000, 1, 8)
        + b"data"
        + struct.pack("<I", n_data_bytes)
    )


def synthesize_audio_with_copies(
    docs: DataFrame,
    body_bytes: int = 256,
    shift_bytes: int = 64,
    copy_modulus: int = 9,
    id_offset: int = 1_000_000,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Fixture adapter for the audio near-dup rail: every document
    becomes a valid 8-bit PCM WAV clip (its padded/truncated UTF-8
    bytes as samples), and every ``copy_modulus``-th document ALSO
    emits a silence-prefixed copy (``shift_bytes`` of 0x20 prepended,
    id + ``id_offset``) — planted positives whose landmark sets the
    shift-invariant constellation must recover, the fixture stand-in
    for a re-encoded or trimmed excerpt in a real corpus.
    ``shift_bytes`` should be a multiple of the landmark hop so the
    copy's frames align with the original's.  Padding/shift bytes are
    constant (silence): those frames carry only DC energy and emit no
    landmarks.  Returns ``(media_id, media)``.

    Byte semantics: the text is ENCODED FIRST and the binary column is
    padded/truncated to exactly ``body_bytes`` BYTES (append
    ``body_bytes`` spaces, slice the first ``body_bytes``), so the
    payload always matches the WAV header's declared data-chunk size
    even for non-ASCII text — character-based rpad/substring would
    overflow the declared size on multi-byte code points (ADVICE
    r10)."""
    nb, sb = int(body_bytes), int(shift_bytes)
    body = F.substring(
        F.concat(F.encode(F.col(text_col), "UTF-8"), F.lit(b" " * nb)),
        1,
        nb,
    )
    orig = docs.select(
        F.col(id_col).alias("media_id"),
        F.concat(F.lit(_wav_header(nb)), body).alias("media"),
    )
    shifted = docs.filter(F.col(id_col) % copy_modulus == 0).select(
        (F.col(id_col) + id_offset).alias("media_id"),
        F.concat(
            F.lit(_wav_header(nb + sb) + b" " * sb), body
        ).alias("media"),
    )
    return orig.unionByName(shifted)


def decode_signal(
    media: DataFrame,
    media_col: str = "media",
    id_col: str = "media_id",
    decode: str = "real",
    decode_fn=None,
) -> DataFrame:
    """Decode each blob to its normalized uint8 signal, emitted as a
    BINARY column ``(media_id, modality, signal)`` — the common first
    stage every downstream media op (hashing, features, resize) can
    share.  One Arrow-batched pass; the codec is the same injection
    seam as :func:`decode_features`."""
    if decode_fn is None:
        if decode == "real":
            decode_fn = make_stdlib_decoder()
        elif decode == "fake":
            decode_fn = None
        else:
            raise ValueError(f"decode must be 'real' or 'fake', got {decode!r}")

    out_schema = T.StructType(
        [
            T.StructField("media_id", media.schema[id_col].dataType),
            T.StructField("modality", T.StringType()),
            T.StructField("signal", T.BinaryType()),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            sigs = []
            for blob in pdf[media_col]:
                raw = bytes(blob)
                if decode_fn is None:
                    sigs.append(raw)
                else:
                    sigs.append(bytes(bytearray(np.asarray(decode_fn(raw), dtype=np.uint8))))
            yield pd.DataFrame(
                {"media_id": pdf[id_col], "modality": pdf["modality"], "signal": sigs}
            )

    # null blobs (e.g. synthesized from null-text docs) carry no
    # signal: drop declaratively, same contract as quantize_int8
    return media.filter(F.col(media_col).isNotNull()).mapInPandas(run, schema=out_schema)


def binary_exact_dedup(media: DataFrame, media_col: str = "media", id_col: str = "media_id") -> DataFrame:
    """Exact duplicate groups over raw bytes — md5 is computed on the
    BINARY column (codegen, no decode, no Python)."""
    return media.groupBy(F.md5(F.col(media_col)).alias("media_hash")).agg(
        F.min(id_col).alias("keep_id"), F.count("*").alias("n_copies")
    )


def modality_stats(media: DataFrame, media_col: str = "media") -> DataFrame:
    """Per-modality inventory: row count, byte mass, distinct blobs.
    Reads only ``modality``/``byte_len``/hash inputs — at scale the
    blob column stays unread for the first two aggregates."""
    return media.groupBy("modality").agg(
        F.count("*").alias("n_items"),
        F.sum("byte_len").alias("total_bytes"),
        F.countDistinct(F.md5(F.col(media_col))).alias("n_distinct"),
    )


def _fake_decode(blob: bytes) -> str:
    """Deterministic stand-in for decode+normalize: latin-1 roundtrip,
    lowercased.  A real image decoder would emit the resized grayscale
    pixel sequence here."""
    return blob.decode("latin-1").lower()


def make_stdlib_decoder():
    """A WORKING ``decode='real'`` codec built from the stdlib only
    (PIL/soundfile/av are absent in this container): parses PGM/PPM
    (``P5``/``P6``) images and RIFF/WAVE audio from raw bytes and
    returns the normalized uint8 signal — grayscale pixels for images,
    PCM sample bytes for audio.

    Returned as a SELF-CONTAINED closure (stdlib + numpy imports
    inside, no repo-module references) so cloudpickle ships it by
    VALUE into executors — the same contract as a user-supplied
    ``decode_fn``, and the same seam a PIL/soundfile codec drops into.
    """

    def decode(blob: bytes):
        import io
        import wave as _wave

        import numpy as _np

        b = bytes(blob)
        if b[:2] in (b"P5", b"P6"):
            # Netpbm binary graymap/pixmap: magic, then whitespace-
            # separated width/height/maxval (with '#' comments), one
            # whitespace byte, then the raster.
            pos = 2
            fields = []
            while len(fields) < 3:
                while pos < len(b) and b[pos : pos + 1].isspace():
                    pos += 1
                if b[pos : pos + 1] == b"#":
                    while pos < len(b) and b[pos : pos + 1] != b"\n":
                        pos += 1
                    continue
                start = pos
                while pos < len(b) and not b[pos : pos + 1].isspace():
                    pos += 1
                fields.append(int(b[start:pos]))
            pos += 1  # the single whitespace after maxval
            w, h, maxval = fields
            if maxval > 255:
                raise ValueError("16-bit netpbm not supported")
            n_ch = 3 if b[:2] == b"P6" else 1
            raster = _np.frombuffer(b, dtype=_np.uint8, count=w * h * n_ch, offset=pos)
            if n_ch == 3:  # grayscale: integer mean of R,G,B
                raster = (
                    raster.reshape(-1, 3).astype(_np.uint16).sum(axis=1) // 3
                ).astype(_np.uint8)
            return raster
        if b[:4] == b"RIFF" and b[8:12] == b"WAVE":
            with _wave.open(io.BytesIO(b)) as wf:
                frames = wf.readframes(wf.getnframes())
                width = wf.getsampwidth()
            if width == 1:  # 8-bit PCM is already unsigned bytes
                return _np.frombuffer(frames, dtype=_np.uint8)
            # 16-bit PCM: keep the high byte, recentered to unsigned
            samples = _np.frombuffer(frames, dtype="<i2")
            return ((samples >> 8) + 128).astype(_np.uint8)
        raise ValueError(
            f"unsupported media container (magic {b[:4]!r}); "
            "pass decode_fn=<codec callable> for other formats"
        )

    return decode


def decode_features(
    media: DataFrame,
    media_col: str = "media",
    id_col: str = "media_id",
    decode: str = "fake",
    n_buckets: int = N_HIST_BUCKETS,
    decode_fn=None,
) -> DataFrame:
    """Decode + feature-extract: (id, modality, features ARRAY<FLOAT>).

    ``decode_fn`` is the codec integration point: a SELF-CONTAINED
    callable ``bytes -> np.ndarray[uint8]`` (the normalized signal —
    e.g. grayscale pixels from PIL, PCM samples from soundfile) that
    is cloudpickled into the executors, so it must only close over
    numpy/stdlib (no repo-module references).  Passing one means no
    operator edit is needed to go real: the Arrow batching, histogram,
    and schema below are decoder-agnostic.

    Without ``decode_fn``: ``decode='fake'`` histograms the raw bytes
    (deterministic, oracle-checkable); ``decode='real'`` uses the
    stdlib PGM/PPM + WAV codec (:func:`make_stdlib_decoder`) — richer
    formats (JPEG/FLAC/MP4) still arrive via ``decode_fn`` when their
    libs are installed.
    """
    if decode_fn is None:
        if decode == "real":
            decode_fn = make_stdlib_decoder()
        elif decode != "fake":
            raise ValueError(f"decode must be 'real' or 'fake', got {decode!r}")

    out_schema = T.StructType(
        [
            T.StructField("media_id", media.schema[id_col].dataType),
            T.StructField("modality", T.StringType()),
            T.StructField("features", T.ArrayType(T.FloatType())),
        ]
    )
    nb = int(n_buckets)

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = []
            for blob in pdf[media_col]:
                if decode_fn is None:
                    arr = np.frombuffer(bytes(blob), dtype=np.uint8)
                else:
                    arr = np.asarray(decode_fn(bytes(blob)), dtype=np.uint8)
                hist = np.bincount(arr >> (8 - nb.bit_length() + 1), minlength=nb)[:nb]
                total = hist.sum() or 1
                feats.append((hist / total).astype(np.float32).tolist())
            yield pd.DataFrame(
                {
                    "media_id": pdf[id_col],
                    "modality": pdf["modality"],
                    "features": feats,
                }
            )

    return media.filter(F.col(media_col).isNotNull()).mapInPandas(extract, schema=out_schema)


def frame_sample(
    media: DataFrame,
    frame_bytes: int = 256,
    every_k: int = 4,
    media_col: str = "media",
    id_col: str = "media_id",
) -> DataFrame:
    """Frame sampling: split each blob into fixed-size frames and keep
    every k-th (frame 0, k, 2k, …) — the video/audio "sample 1-in-k
    frames" pass.  One-to-many row expansion inside ``mapInPandas``
    (Arrow batch in, longer Arrow batch out; no explode of a
    driver-built array).  With a real container format the frame
    boundary comes from the codec instead of a byte stride — only the
    slicing line changes.  The final short frame is kept when its
    index lands on the stride, matching the SQL twin's ``substr``
    arithmetic."""
    out_schema = T.StructType(
        [
            T.StructField("media_id", media.schema[id_col].dataType),
            T.StructField("modality", T.StringType()),
            T.StructField("frame_idx", T.IntegerType()),
            T.StructField("frame", T.BinaryType()),
            T.StructField("frame_len", T.IntegerType()),
        ]
    )
    fb, k = int(frame_bytes), int(every_k)

    def sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, mods, idxs, frames, lens = [], [], [], [], []
            for mid, mod, blob in zip(pdf[id_col], pdf["modality"], pdf[media_col]):
                b = bytes(blob)
                for j in range(0, (len(b) + fb - 1) // fb, k):
                    fr = b[j * fb : (j + 1) * fb]
                    ids.append(mid)
                    mods.append(mod)
                    idxs.append(j)
                    frames.append(fr)
                    lens.append(len(fr))
            yield pd.DataFrame(
                {
                    "media_id": ids,
                    "modality": mods,
                    "frame_idx": np.array(idxs, dtype=np.int32),
                    "frame": frames,
                    "frame_len": np.array(lens, dtype=np.int32),
                }
            )

    return media.filter(F.col(media_col).isNotNull()).mapInPandas(sample, schema=out_schema)


def resize_normalize(
    media: DataFrame,
    out_len: int = 64,
    media_col: str = "media",
    id_col: str = "media_id",
) -> DataFrame:
    """Resize to a fixed-length signal: nearest-neighbor resample of
    the byte stream to ``out_len`` bytes (position ``j`` reads source
    byte ``j*len//out_len``).  The normalization every downstream
    fixed-width consumer (feature extractor, pHash, ANN) expects; a
    real image resize swaps this for the codec+interpolation call with
    the same (id, modality, BINARY(out_len)) contract."""
    out_schema = T.StructType(
        [
            T.StructField("media_id", media.schema[id_col].dataType),
            T.StructField("modality", T.StringType()),
            T.StructField("resized", T.BinaryType()),
        ]
    )
    ol = int(out_len)

    def resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for blob in pdf[media_col]:
                b = bytes(blob)
                if not b:
                    out.append(b"")
                    continue
                idx = (np.arange(ol, dtype=np.int64) * len(b)) // ol
                out.append(np.frombuffer(b, dtype=np.uint8)[idx].tobytes())
            yield pd.DataFrame(
                {"media_id": pdf[id_col], "modality": pdf["modality"], "resized": out}
            )

    return media.filter(F.col(media_col).isNotNull()).mapInPandas(resize, schema=out_schema)


def media_phash(
    media: DataFrame,
    media_col: str = "media",
    id_col: str = "media_id",
    decode_fn=None,
    decode: str = "fake",
) -> DataFrame:
    """Perceptual-hash-ish 64-bit fingerprint per media item: SimHash
    over character 4-grams of the decoded+normalized signal.  Default
    decode is the deterministic fake (latin-1, lowercased — exactly
    replayable in SQL); ``decode_fn`` (a self-contained callable
    returning ``str``, ``bytes``, or a uint8 ndarray — the same
    contract ``decode_features`` accepts — cloudpickled to executors)
    swaps in a real codec without touching the fingerprint stage.

    Robust to small edits the way a pHash is robust to re-encodes —
    and unlike a real pHash, exactly replayable in SQL, so the driver
    can verify it.  Emitted as two 32-bit halves (``phash_hi``,
    ``phash_lo``); near-dup lookup is an equi-join on 16-bit bands +
    Hamming verification, same as :func:`dedup.simhash64`.

    Execution shape: decode → gram-count → hash → vote happens in ONE
    self-contained ``mapInPandas`` pass over the media rows — no gram
    explode, NO shuffle at all (an exploded-grams formulation moves
    |signal|·rows through an exchange; binary signals don't belong in
    SQL rows at scale — you fingerprint inside the decode stage).
    Gram hashes are md5 (engine-portable) and memoized per partition:
    real corpora share most grams.
    """
    if decode_fn is None and decode == "real":
        decode_fn = make_stdlib_decoder()
    id_type = media.schema[id_col].dataType.simpleString()
    schema = f"media_id {id_type}, phash_hi long, phash_lo long"

    def fingerprint(batches):
        import hashlib

        import numpy as _np
        import pandas as _pd

        bits = _np.arange(32, dtype=_np.int64)
        weights = _np.int64(1) << bits
        memo: dict[str, tuple[int, int]] = {}

        def gram_words(g: str) -> tuple[int, int]:
            h = memo.get(g)
            if h is None:
                d = hashlib.md5(g.encode("utf-8")).hexdigest()
                h = (int(d[:8], 16), int(d[8:16], 16))
                memo[g] = h
            return h

        for pdf in batches:
            ids, his, los = [], [], []
            for mid, blob in zip(pdf[id_col], pdf[media_col]):
                signal = (
                    decode_fn(bytes(blob))
                    if decode_fn is not None
                    else bytes(blob).decode("latin-1").lower()
                )
                if not isinstance(signal, str):
                    # decode_features-style codec (bytes -> uint8
                    # ndarray/bytes): same decoder works for both
                    # operators — map the raw signal bytes to latin-1
                    # chars so grams stay hashable strings.
                    signal = bytes(bytearray(signal)).decode("latin-1")
                if len(signal) < 4:
                    continue
                counts: dict[str, int] = {}
                for i in range(len(signal) - 3):
                    g = signal[i : i + 4]
                    counts[g] = counts.get(g, 0) + 1
                words = _np.array([gram_words(g) for g in counts], dtype=_np.int64)
                cnt = _np.fromiter(counts.values(), dtype=_np.int64)[:, None]
                v_hi = ((((words[:, 0:1] >> bits) & 1) * 2 - 1) * cnt).sum(axis=0)
                v_lo = ((((words[:, 1:2] >> bits) & 1) * 2 - 1) * cnt).sum(axis=0)
                ids.append(mid)
                his.append(int(((v_hi > 0) * weights).sum()))
                los.append(int(((v_lo > 0) * weights).sum()))
            yield _pd.DataFrame({"media_id": ids, "phash_hi": his, "phash_lo": los})

    return media.filter(F.col(media_col).isNotNull()).mapInPandas(fingerprint, schema=schema)


def audio_landmarks(
    media: DataFrame,
    media_col: str = "media",
    id_col: str = "media_id",
    frame: int = 64,
    hop: int = 32,
    n_bands: int = 8,
    max_dt: int = 3,
) -> DataFrame:
    """Shazam-style constellation landmarks for RIFF/WAVE audio
    (Wang, ISMIR'03): per analysis frame, the peak spectral bin in
    each of ``n_bands`` bands; a landmark chains a peak with the SAME
    band's peaks ``dt`` and ``2·dt`` frames later (``dt = 1..max_dt``)
    plus the exact bit lengths of the first and last peak magnitudes
    (clamped to 15), packed in mixed radix as
    ``(((((band·F+b1)·F+b2)·F+b3)·(max_dt+1)+dt)·16+bl1)·16+bl3``
    with ``F = frame`` — bins range up to ``frame-1``, so the bin
    radix must be ``frame`` (a fixed radix 64 would alias distinct
    landmarks for any ``frame > 64``; at the default ``frame=64`` the
    two packings coincide, which keeps the pinned test values stable).
    Wang's original pairs are peak BIGRAMS; band-local note content
    here is only ~8 values wide, so bigrams of unrelated clips collide
    by birthday effect — the TRIPLET (three-peak sequence) plus the
    coarse-loudness digits is what makes the landmark discriminative
    at this frame size.  Bit length is exact integer arithmetic
    (``frexp``'s exponent, exact for integers below 2⁵³) and, like
    the Δt-only time encoding, invariant to when the clip starts.

    The spectral transform is the exact integer Walsh–Hadamard
    transform (±1 butterflies, int64): deterministic on every
    platform, unlike a float FFT whose peak ties can flip with libm —
    the repo's reproducibility bar.  Frames are centered int32 PCM
    (from the stdlib WAV decoder); silent bands (|coef| = 0) emit no
    peak, so leading/trailing silence contributes nothing.

    Returns DISTINCT ``(media_id, landmark)``.  Time-shift invariance
    by construction: landmarks carry only Δt, so prepending whole hops
    of silence leaves the set (bar frame-boundary effects) intact —
    pinned by ``tests/test_audio_fingerprint.py``.

    Scale shape: decode → WHT → peaks → landmark emission happen in
    ONE self-contained ``mapInPandas`` pass (no shuffle; binary
    signals never enter SQL rows); output volume is
    ~(n_frames · n_bands · max_dt) ints per clip.  Not
    SQL-expressible (the butterfly recursion has no tractable
    relational form), so a driver registration is rows-only by
    documented necessity — the pytest suite pins the semantics
    instead.  No reference analog (reference stores media nowhere);
    extension surface from the builder brief."""
    if frame & (frame - 1):
        raise ValueError(f"frame must be a power of two for the WHT: {frame}")
    if frame % n_bands:
        raise ValueError(
            f"frame ({frame}) must divide evenly into n_bands ({n_bands}) "
            "bands; an uneven split would drop the trailing bins"
        )
    if max_dt < 1:
        raise ValueError(f"max_dt must be >= 1: {max_dt}")
    # packed landmark bound: n_bands·frame³·(max_dt+1)·256 must fit int64
    if n_bands * frame**3 * (max_dt + 1) * 256 >= 2**63:
        raise ValueError(
            f"landmark packing overflows int64 for frame={frame}, "
            f"n_bands={n_bands}, max_dt={max_dt}"
        )
    decode_fn = make_stdlib_decoder()
    id_type = media.schema[id_col].dataType.simpleString()
    band_w = frame // n_bands

    def emit(batches):
        import numpy as _np
        import pandas as _pd

        def wht(rows):
            # exact integer fast WHT over the last axis (length=frame)
            a = rows.astype(_np.int64).copy()
            h = 1
            while h < a.shape[1]:
                for start in range(0, a.shape[1], 2 * h):
                    left = a[:, start : start + h].copy()
                    right = a[:, start + h : start + 2 * h].copy()
                    a[:, start : start + h] = left + right
                    a[:, start + h : start + 2 * h] = left - right
                h *= 2
            return a

        for pdf in batches:
            ids, lms = [], []
            for mid, blob in zip(pdf[id_col], pdf[media_col]):
                b = bytes(blob)
                if not (b[:4] == b"RIFF" and b[8:12] == b"WAVE"):
                    continue  # landmarks are an audio-only concept
                s = decode_fn(b).astype(_np.int32) - 128
                n_frames = (len(s) - frame) // hop + 1 if len(s) >= frame else 0
                if n_frames <= max_dt:
                    continue
                idx = (
                    _np.arange(n_frames)[:, None] * hop
                    + _np.arange(frame)[None, :]
                )
                spec = _np.abs(wht(s[idx]))
                spec[:, 0] = 0  # drop DC (the frame sum)
                bands = spec.reshape(n_frames, n_bands, band_w)
                peak_off = bands.argmax(axis=2)  # first max = lowest bin
                peak_mag = bands.max(axis=2)
                bins = peak_off + _np.arange(n_bands)[None, :] * band_w
                # exact bit length: frexp's exponent is exact for ints
                # < 2^53 (WHT coefs are bounded by frame·128 = 8192)
                bl = _np.minimum(
                    _np.frexp(peak_mag.astype(_np.float64))[1], 15
                ).astype(_np.int64)
                for dt in range(1, max_dt + 1):
                    if n_frames <= 2 * dt:
                        continue
                    b1 = bins[: -2 * dt]
                    b2 = bins[dt:-dt]
                    b3 = bins[2 * dt :]
                    live = (
                        (peak_mag[: -2 * dt] > 0)
                        & (peak_mag[dt:-dt] > 0)
                        & (peak_mag[2 * dt :] > 0)
                    )
                    band_ids = _np.broadcast_to(
                        _np.arange(n_bands)[None, :], b1.shape
                    )
                    # bin radix = frame (bins span 0..frame-1); dt radix
                    # = max_dt+1 — mixed radix keeps codes collision-free
                    lm = (
                        (
                            (((band_ids * frame + b1) * frame + b2) * frame + b3)
                            * (max_dt + 1)
                            + dt
                        )
                        * 16
                        + bl[: -2 * dt]
                    ) * 16 + bl[2 * dt :]
                    sel = lm[live]
                    if sel.size:
                        uniq = _np.unique(sel)
                        ids.extend([mid] * len(uniq))
                        lms.extend(int(v) for v in uniq)
            yield _pd.DataFrame({"media_id": ids, "landmark": lms})

    return (
        media.filter(F.col(media_col).isNotNull())
        .select(id_col, media_col)
        .mapInPandas(emit, schema=f"media_id {id_type}, landmark long")
        .distinct()
    )


def audio_neardup_pairs(
    media: DataFrame,
    media_col: str = "media",
    id_col: str = "media_id",
    min_shared: int = 5,
    min_containment: float = 0.5,
    max_df: int | None = 50,
    lms: DataFrame | None = None,
    **landmark_kwargs,
) -> DataFrame:
    """Audio near-dup pairs by shared constellation landmarks — the
    audio twin of the banded pHash image path.  The decision variable
    is CONTAINMENT (shared landmarks / the smaller clip's landmark
    count, the winnowing-rail convention): a copy — shifted, trimmed,
    or embedded in a longer recording — scores ≈ 1 regardless of clip
    lengths, while structurally unrelated clips sit far below even
    when their absolute overlap is large (stationary segments make
    raw shared-counts a brittle threshold; the fraction is not).

    Returns ``(a, b, n_shared, containment)`` with a < b, containment
    rounded to 6.

    Scale shape: the landmark relation is the bucket join — pairs come
    from an equi-join on the landmark key, so candidate volume tracks
    true co-occurrence, never N²; per-clip sizes ride a skinny
    aggregate joined onto the pair relation.  ``max_df`` is the
    hot-bucket guard (a landmark present in more than ``max_df``
    clips — silence patterns, test tones — is dropped before the
    join, the same postings-guard shape as every other banded join in
    this repo; sizes are computed AFTER the guard so containment
    stays consistent with the joined space).  The guard defaults ON
    (50, matching the driver registration) like every other banded
    join here — pass ``max_df=None`` explicitly for the unguarded
    exact-recall join (ADVICE r10).

    ``lms``: optionally a precomputed :func:`audio_landmarks` relation
    (the driver's shared per-fixture build) — the per-clip WHT
    decode + peak chain is the dominant scan; only the join layer
    runs here when it is injected."""
    if lms is None:
        lms = audio_landmarks(media, media_col, id_col, **landmark_kwargs)
    if max_df is not None:
        hot = (
            lms.groupBy("landmark")
            .agg(F.count(F.lit(1)).alias("df"))
            .filter(F.col("df") > max_df)
            .select("landmark")
        )
        lms = lms.join(F.broadcast(hot), "landmark", "left_anti")
    lms = lms.localCheckpoint(eager=False)
    sizes = lms.groupBy("media_id").agg(F.count(F.lit(1)).alias("n_lm"))
    x, y = lms.alias("x"), lms.alias("y")
    shared = (
        x.join(
            y,
            (F.col("x.landmark") == F.col("y.landmark"))
            & (F.col("x.media_id") < F.col("y.media_id")),
        )
        .groupBy(
            F.col("x.media_id").alias("a"), F.col("y.media_id").alias("b")
        )
        .agg(F.count(F.lit(1)).alias("n_shared"))
    )
    sa = sizes.select(F.col("media_id").alias("a"), F.col("n_lm").alias("na"))
    sb = sizes.select(F.col("media_id").alias("b"), F.col("n_lm").alias("nb"))
    cont = F.col("n_shared") / F.least("na", "nb")
    return (
        shared.join(sa, "a")
        .join(sb, "b")
        .filter(
            (F.col("n_shared") >= min_shared) & (cont >= min_containment)
        )
        .select("a", "b", "n_shared", F.round(cont, 6).alias("containment"))
    )


def shot_boundaries(
    media: DataFrame,
    frame_bytes: int = 256,
    boundary_permille: int = 120,
    media_col: str = "media",
    id_col: str = "media_id",
) -> DataFrame:
    """Shot-boundary detection over fixed-stride frames — the keyframe
    primitive of a video curation pipeline (sample one frame per shot
    instead of one per N): consecutive-frame byte distance
    ``diff = Σ |frame_j[i] − frame_{j−1}[i]|`` over the first
    ``min(len_prev, len_cur)`` bytes, with a boundary wherever the
    PER-BYTE distance exceeds ``boundary_permille``/1000 of the
    maximum (255) — i.e. ``diff·1000 > permille·255·cmp_bytes``, all
    exact integer arithmetic, so the decision replays bit-identically
    in SQL.  With a real codec the frames come from the container
    (same seam as :func:`frame_sample`); the threshold-on-frame-
    distance rule is the standard hard-cut detector (histogram/pixel
    difference thresholding, e.g. Boreczky & Rowe, SPIE'96).

    Emits one row per frame index ≥ 1:
    ``(media_id, frame_idx, cmp_bytes, diff_sum, is_boundary)``.

    Scale shape: slicing + the vectorized diff happen in ONE
    ``mapInPandas`` pass per blob (no shuffle, no per-frame row
    explosion before the diff); output is one skinny row per frame.
    No reference analog; extension surface from the builder brief."""
    fb = int(frame_bytes)
    perm = int(boundary_permille)
    id_type = media.schema[id_col].dataType.simpleString()
    schema = (
        f"media_id {id_type}, frame_idx int, cmp_bytes int, "
        "diff_sum long, is_boundary boolean"
    )

    def detect(batches):
        import numpy as _np
        import pandas as _pd

        for pdf in batches:
            ids, idxs, cbs, diffs, flags = [], [], [], [], []
            for mid, blob in zip(pdf[id_col], pdf[media_col]):
                b = bytes(blob)
                n_frames = (len(b) + fb - 1) // fb
                prev = None
                for j in range(n_frames):
                    cur = _np.frombuffer(b[j * fb : (j + 1) * fb], dtype=_np.uint8)
                    if prev is not None:
                        n = min(len(prev), len(cur))
                        d = int(
                            _np.abs(
                                prev[:n].astype(_np.int32)
                                - cur[:n].astype(_np.int32)
                            ).sum()
                        )
                        ids.append(mid)
                        idxs.append(j)
                        cbs.append(n)
                        diffs.append(d)
                        flags.append(d * 1000 > perm * 255 * n)
                    prev = cur
            yield _pd.DataFrame(
                {
                    "media_id": ids,
                    "frame_idx": _np.array(idxs, dtype=_np.int32),
                    "cmp_bytes": _np.array(cbs, dtype=_np.int32),
                    "diff_sum": _np.array(diffs, dtype=_np.int64),
                    "is_boundary": _np.array(flags, dtype=bool),
                }
            )

    return media.filter(F.col(media_col).isNotNull()).mapInPandas(
        detect, schema=schema
    )


def shot_segments(
    media: DataFrame,
    frame_bytes: int = 256,
    boundary_permille: int = 120,
    media_col: str = "media",
    id_col: str = "media_id",
) -> DataFrame:
    """Per-shot segments from :func:`shot_boundaries` — the
    gaps-and-islands rollup that turns frame-level cut flags into the
    curation primitive a video pipeline actually consumes: one row per
    shot with its frame span and a keyframe to sample ("one frame per
    shot" beats "one frame per N" exactly when shots are what you want
    to cover).

    A boundary at frame j STARTS a new shot at j; frame 0 starts shot
    0.  Emits ``(media_id, shot_idx, start_frame, end_frame, n_frames,
    keyframe, motion)`` where ``keyframe = start_frame`` (the first
    frame of the shot, the standard cheap pick) and ``motion`` is the
    summed intra-shot frame distance (the cut distances themselves are
    excluded — they measure the transition, not the shot).  All exact
    integers; replays in SQL via the same cumulative-boundary-count
    islands idiom the span-dedup rail uses.

    Scale shape: one mapInPandas pass (the boundary kernel), then a
    PER-CLIP cumulative-sum window (partition = media_id, ordered by
    frame index — bounded by frames-per-clip, never a global sort) and
    one map-side-combined rollup."""
    from pyspark.sql import Window

    b = shot_boundaries(
        media, frame_bytes, boundary_permille, media_col, id_col
    )
    # Frame 0 has no diff row; materialize it as the shot-0 anchor so
    # every frame belongs to exactly one segment.  Anchored from the
    # MEDIA relation (not the boundary relation) so a clip shorter
    # than two frames still emits its single degenerate shot.
    frame0 = (
        media.filter(
            F.col(media_col).isNotNull() & (F.length(F.col(media_col)) >= 1)
        )
        .select(
            F.col(id_col).alias("media_id"),
            F.lit(0).cast("int").alias("frame_idx"),
            F.lit(0).cast("long").alias("diff_sum"),
            F.lit(False).alias("is_boundary"),
        )
    )
    frames = b.select(
        "media_id", "frame_idx", "diff_sum", "is_boundary"
    ).unionByName(frame0)
    w = (
        Window.partitionBy("media_id")
        .orderBy("frame_idx")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    with_shot = frames.withColumn(
        "shot_idx", F.sum(F.col("is_boundary").cast("long")).over(w)
    )
    return with_shot.groupBy("media_id", "shot_idx").agg(
        F.min("frame_idx").cast("int").alias("start_frame"),
        F.max("frame_idx").cast("int").alias("end_frame"),
        F.count(F.lit(1)).cast("long").alias("n_frames"),
        F.min("frame_idx").cast("int").alias("keyframe"),
        F.sum(
            F.when(F.col("is_boundary"), F.lit(0)).otherwise(
                F.col("diff_sum")
            )
        )
        .cast("long")
        .alias("motion"),
    )


def synthesize_video_with_copies(
    docs: DataFrame,
    frame_bytes: int = 64,
    shift_frames: int = 1,
    copy_modulus: int = 9,
    id_offset: int = 1_000_000,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Fixture adapter for the temporal video-copy rail: every
    document's UTF-8 bytes stand in for a clip, and every
    ``copy_modulus``-th document ALSO emits a copy prefixed with
    ``shift_frames`` whole frames of padding — a planted re-upload
    whose every frame recurs at a constant ``+shift_frames`` offset,
    exactly the signal temporal alignment must recover (a bag-of-
    frames match can't distinguish it from a shuffle).  Returns
    ``(media_id, media)``."""
    fb, sh = int(frame_bytes), int(shift_frames)
    base = docs.filter(F.col(text_col).isNotNull())
    orig = base.select(
        F.col(id_col).alias("media_id"),
        F.encode(F.col(text_col), "UTF-8").alias("media"),
    )
    shifted = base.filter(F.col(id_col) % copy_modulus == 0).select(
        (F.col(id_col) + id_offset).alias("media_id"),
        F.encode(
            F.concat(F.lit(" " * (fb * sh)), F.col(text_col)), "UTF-8"
        ).alias("media"),
    )
    return orig.unionByName(shifted)


def video_copy_pairs(
    media: DataFrame,
    frame_bytes: int = 64,
    gram: int = 3,
    min_aligned: int = 3,
    min_align_frac: float = 0.5,
    max_df: int | None = 50,
    media_col: str = "media",
    id_col: str = "media_id",
) -> DataFrame:
    """Temporal video copy detection — frame-hash shingles + offset
    voting (the classic temporal-alignment copy detector, e.g. Law-To
    et al., CIVR'07 video copy detection): two clips are a copy pair
    when many frame-``gram``-grams match at ONE CONSISTENT temporal
    offset.  Bag-of-frames overlap (the pHash/landmark rails) scores a
    re-ordered montage the same as a true copy; the offset vote is
    what says "these frames recur IN SEQUENCE, dt frames apart" —
    robust to trims and prepended intros by construction.

    Emits ``(a, b, offset, n_aligned, align_frac)`` with a < b:
    ``offset`` = a's frame index minus b's at the best-voted alignment
    (ties break to the smallest offset, pinned), ``n_aligned`` = grams
    agreeing at that offset, ``align_frac`` = n_aligned over the
    smaller clip's gram count (containment convention, rounded to 6).

    The ONLY fully-codegen multimodal operator: fixed-stride slicing
    is native ``substring`` on the BINARY column, frame hashing is
    native ``md5`` — no Python kernel anywhere, so the whole plan
    stays inside whole-stage codegen and the SQL twin replays it
    hash-exactly.

    Scale shape (100 TB): frame/gram relations are linear in video
    bytes ÷ frame size; the gram window is per-clip (bounded, never a
    global sort); candidates come from the gram-hash equi-join behind
    the ``max_df`` hot-gram guard (black frames, test cards), so
    candidate volume tracks true co-occurrence; offset voting is one
    map-side-combined (a, b, dt) count and the argmax window runs
    over the per-pair dt census."""
    from pyspark.sql import Window

    fb, g = int(frame_bytes), int(gram)
    if g < 2:
        raise ValueError(f"gram must be >= 2, got {g}")
    # Column APIs only — no caller-supplied name ever rides into an
    # expr string (the quote_ident rule, ADVICE r10); floor on the
    # non-negative length is exact integer ceil-division.
    n_frames = (
        F.floor((F.length(F.col(media_col)) + F.lit(fb - 1)) / F.lit(fb))
        .cast("int")
    )
    frames = (
        media.filter(
            F.col(media_col).isNotNull() & (F.length(F.col(media_col)) >= 1)
        )
        .select(
            F.col(id_col).alias("media_id"),
            F.explode(F.sequence(F.lit(0), n_frames - 1)).alias("pos"),
            F.col(media_col),
        )
        .select(
            "media_id",
            "pos",
            F.substring(
                F.md5(
                    F.substring(
                        F.col(media_col),
                        F.col("pos") * fb + 1,
                        F.lit(fb),
                    )
                ),
                1,
                15,
            ).alias("fh"),
        )
    )
    w = Window.partitionBy("media_id").orderBy("pos")
    parts = [F.col("fh")] + [
        F.lead("fh", j).over(w).alias(f"fh{j}") for j in range(1, g)
    ]
    grams = (
        frames.select("media_id", "pos", *parts)
        .filter(F.col(f"fh{g - 1}").isNotNull())
        .select(
            "media_id",
            "pos",
            text_fns.portable_hash60(
                F.concat_ws(
                    "|", "fh", *[f"fh{j}" for j in range(1, g)]
                )
            ).alias("gh"),
        )
    )
    if max_df is not None:
        hot = (
            grams.groupBy("gh")
            .agg(F.count_distinct("media_id").alias("df"))
            .filter(F.col("df") > max_df)
            .select("gh")
        )
        grams = grams.join(F.broadcast(hot), "gh", "left_anti")
    grams = grams.localCheckpoint(eager=False)
    sizes = grams.groupBy("media_id").agg(F.count(F.lit(1)).alias("n"))
    x, y = grams.alias("x"), grams.alias("y")
    votes = (
        x.join(
            y,
            (F.col("x.gh") == F.col("y.gh"))
            & (F.col("x.media_id") < F.col("y.media_id")),
        )
        .groupBy(
            F.col("x.media_id").alias("a"),
            F.col("y.media_id").alias("b"),
            (F.col("x.pos") - F.col("y.pos")).alias("dt"),
        )
        .agg(F.count(F.lit(1)).alias("v"))
    )
    wb = Window.partitionBy("a", "b").orderBy(
        F.col("v").desc(), F.col("dt").asc()
    )
    best = (
        votes.withColumn("rn", F.row_number().over(wb))
        .filter(F.col("rn") == 1)
        .select("a", "b", F.col("dt").alias("offset"), F.col("v"))
    )
    sa = sizes.select(F.col("media_id").alias("a"), F.col("n").alias("na"))
    sb = sizes.select(F.col("media_id").alias("b"), F.col("n").alias("nb"))
    frac = F.col("v") / F.least("na", "nb")
    return (
        best.join(sa, "a")
        .join(sb, "b")
        .filter((F.col("v") >= min_aligned) & (frac >= min_align_frac))
        .select(
            "a",
            "b",
            F.col("offset").cast("long"),
            F.col("v").cast("long").alias("n_aligned"),
            F.round(frac, 6).alias("align_frac"),
        )
    )


def synthesize_blobs_with_edits(
    docs: DataFrame,
    marker: str = "@@EDIT@@",
    copy_modulus: int = 9,
    id_offset: int = 1_000_000,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Fixture adapter for the content-defined-chunking rail: every
    document's bytes stand in for a binary blob, and every
    ``copy_modulus``-th document ALSO emits an EDITED copy with
    ``marker`` inserted at the character midpoint (id +
    ``id_offset``) — the planted positive CDC must recover: the
    insertion shifts every later byte, so fixed-stride chunking
    matches nothing after the edit while content-defined boundaries
    re-align immediately.  Character-midpoint arithmetic matches the
    SQL twin; the fixture corpus is ASCII (the standing assumption
    every text-backed media oracle here shares).  Returns
    ``(media_id, media)``."""
    base = docs.filter(F.col(text_col).isNotNull())
    orig = base.select(
        F.col(id_col).alias("media_id"),
        F.encode(F.col(text_col), "UTF-8").alias("media"),
    )
    half = F.floor(F.length(F.col(text_col)) / F.lit(2)).cast("int")
    edited = base.filter(F.col(id_col) % copy_modulus == 0).select(
        (F.col(id_col) + id_offset).alias("media_id"),
        F.encode(
            F.concat(
                F.substring(F.col(text_col), 1, half),
                F.lit(marker),
                F.substring(
                    F.col(text_col), half + 1, F.length(F.col(text_col))
                ),
            ),
            "UTF-8",
        ).alias("media"),
    )
    return orig.unionByName(edited)

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
  ``mapInPandas`` (one Arrow batch of blobs per Python hop).  The real
  codecs (PIL / soundfile / av) are not in this container, so decode
  is STUBBED: ``decode='real'`` raises ``NotImplementedError``
  (documented integration point), ``decode='fake'`` runs a
  deterministic stand-in (byte histogram), keeping the Spark-side
  plumbing — schema, batching, UDF signature — real and tested.
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


def decode_features(
    media: DataFrame,
    media_col: str = "media",
    id_col: str = "media_id",
    decode: str = "fake",
    n_buckets: int = N_HIST_BUCKETS,
) -> DataFrame:
    """Decode + feature-extract: (id, modality, features ARRAY<FLOAT>).

    ``decode='real'`` is the integration point for actual codecs
    (PIL/soundfile/av — not present in this container) and raises
    ``NotImplementedError``; ``decode='fake'`` produces a
    deterministic L1-normalized byte histogram so the pipeline shape
    (Arrow batching, fixed-width feature schema, downstream ANN
    compatibility) is fully exercised.
    """
    if decode == "real":
        raise NotImplementedError(
            "real media decoding requires PIL/soundfile/av; install them and "
            "replace _fake_decode with the codec call — the Spark plumbing "
            "below is decoder-agnostic"
        )
    if decode != "fake":
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
                arr = np.frombuffer(bytes(blob), dtype=np.uint8)
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

    return media.mapInPandas(extract, schema=out_schema)


def media_phash(
    media: DataFrame,
    media_col: str = "media",
    id_col: str = "media_id",
) -> DataFrame:
    """Perceptual-hash-ish 64-bit fingerprint per media item: SimHash
    over character 4-grams of the decoded+normalized signal (here the
    deterministic fake decode: latin-1, lowercased).

    Robust to small edits the way a pHash is robust to re-encodes —
    and unlike a real pHash, exactly replayable in SQL, so the driver
    can verify it.  Emitted as two 32-bit halves (``phash_hi``,
    ``phash_lo``); near-dup lookup is an equi-join on 16-bit bands +
    Hamming verification, same as :func:`dedup.simhash64`.
    """
    signal = F.lower(F.decode(F.col(media_col), "ISO-8859-1"))
    # Guard: signals shorter than 4 chars have no grams (sequence()
    # would otherwise count DOWN when stop < start).
    gram_array = F.when(
        F.length(signal) >= 4,
        F.transform(
            F.sequence(F.lit(1), F.length(signal) - 3),
            lambda i: signal.substr(i, F.lit(4)),
        ),
    ).otherwise(F.array().cast("array<string>"))
    grams = media.select(
        F.col(id_col).alias("media_id"),
        F.explode(gram_array).alias("gram"),
    )
    counted = grams.groupBy("media_id", "gram").agg(F.count("*").alias("cnt"))
    h_hi = F.conv(F.substring(F.md5(F.col("gram")), 1, 8), 16, 10).cast("long")
    h_lo = F.conv(F.substring(F.md5(F.col("gram")), 9, 8), 16, 10).cast("long")
    votes = []
    for half, h in (("hi", h_hi), ("lo", h_lo)):
        for b in range(32):
            votes.append(
                F.sum(
                    F.when(F.shiftright(h, b).bitwiseAND(F.lit(1)) == 1, F.col("cnt")).otherwise(
                        -F.col("cnt")
                    )
                ).alias(f"v_{half}_{b}")
            )
    sig = counted.groupBy("media_id").agg(*votes)
    outs = {}
    for half in ("hi", "lo"):
        acc = F.lit(0).cast("long")
        for b in range(32):
            acc = acc + F.when(F.col(f"v_{half}_{b}") > 0, F.lit(2**b).cast("long")).otherwise(
                F.lit(0).cast("long")
            )
        outs[half] = acc
    return sig.select("media_id", outs["hi"].alias("phash_hi"), outs["lo"].alias("phash_lo"))

"""Deterministic text embedder — the stand-in for the reference's
external embedding HTTP service.

The reference POSTs text to ``http://{host}:{port}/vectorizer/string/``
(single) or ``/vectorizer/list/`` (batch), retrying up to 5 times with
no backoff, and parses a JSON-string-encoded vector field
(``app/core/document_ingestor.py:605-607``, ``:648-673``, ``:706-714``).
That service is effectively a remote scalar UDF ``text → float[1024]``.

Here it is a **deterministic hash embedder**: ``md5(text)`` seeds a
PCG64 generator that draws a standard-normal vector, unit-normalized.
Properties that matter for tests and the golden scenario:

* identical text → identical vector (platform-independent: MD5 + PCG64
  are both fully specified);
* distinct texts → near-orthogonal vectors in high dim (cosine ≈ 0),
  so "similar" can be engineered by prefix-sharing in fixtures;
* unit-norm, so dot product == cosine.

Spark integration is the Arrow slow-path done right: a batched
``mapInPandas``/pandas UDF (one Python call per ~10k-row Arrow batch),
never a row-at-a-time Python UDF.  At 100 TB the same shape holds for a
real encoder — batch inference per Arrow chunk, model broadcast once
per executor.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator, Sequence

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

DEFAULT_DIM = 1024  # reference document_ingestor.py:73


def embed_text(text: str, dim: int = DEFAULT_DIM) -> list[float]:
    """Embed one string (the ``/vectorizer/string/`` analog)."""
    seed = int.from_bytes(hashlib.md5(text.encode("utf-8")).digest()[:8], "big")
    rng = np.random.default_rng(seed)
    v = rng.standard_normal(dim)
    v /= np.linalg.norm(v)
    return [float(x) for x in v.astype(np.float32)]


def embed_texts(texts: Sequence[str], dim: int = DEFAULT_DIM) -> list[list[float]]:
    """Batch embed (the ``/vectorizer/list/`` analog)."""
    return [embed_text(t, dim) for t in texts]


def md5_embed_expr(text_col, dim: int = 8):
    """SQL-expressible embedder: component ``j`` derives from
    ``md5(text || '|' || j)`` alone — 60-bit hex prefix → BIGINT →
    affine map into [-1, 1) → FLOAT (float32 rounding pins the stored
    value bit-exactly in every engine).

    This is the ORACLE-CHECKABLE twin of the PCG64 hash embedder: the
    identical value is one SQL expression in DuckDB
    (``CAST('0x' || substr(md5(text || '|j'), 1, 15) AS BIGINT)``), so
    an end-to-end embed→store→search pipeline over it hash-verifies in
    the driver.  Distribution is worse than PCG64's normals (components
    are uniform, not gaussian) — fine for parity evidence, not for
    similarity quality.  All-native column expressions: the embedding
    runs JVM-side in codegen, no Python at all.
    """
    comps = [
        (
            F.conv(
                F.substring(F.md5(F.concat(text_col, F.lit(f"|{j}"))), 1, 15), 16, 10
            ).cast("long")
            / F.lit(float(2**59))
            - F.lit(1.0)
        ).cast("float")
        for j in range(int(dim))
    ]
    return F.array(*comps)


def md5_embed_text(text: str, dim: int = 8) -> list[float]:
    """Driver-side scalar twin of :func:`md5_embed_expr` (identical
    bits: float32 rounding applied the same way)."""
    out = []
    for j in range(int(dim)):
        h = int(hashlib.md5(f"{text}|{j}".encode("utf-8")).hexdigest()[:15], 16)
        out.append(float(np.float32(h / float(2**59) - 1.0)))
    return out


def with_embeddings(
    df: DataFrame,
    text_col: str = "text",
    out_col: str = "embedding",
    dim: int = DEFAULT_DIM,
) -> DataFrame:
    """Append an embedding column to a DataFrame of texts.

    ``mapInPandas`` so each Arrow batch is one Python hop; schema is the
    input schema plus ``out_col ARRAY<FLOAT>``.
    """
    out_schema = T.StructType(df.schema.fields + [T.StructField(out_col, T.ArrayType(T.FloatType()))])

    # Self-contained closure (stdlib/numpy only): cloudpickle ships
    # module-level helpers BY REFERENCE, so calling ``embed_text`` here
    # would require this package on every executor's sys.path.
    def embed_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        import numpy as _np
        from pandas import isna as _pd_isna

        def _embed(t: str) -> list[float]:
            seed = int.from_bytes(hashlib.md5(t.encode("utf-8")).digest()[:8], "big")
            rng = _np.random.default_rng(seed)
            v = rng.standard_normal(dim)
            v /= _np.linalg.norm(v)
            return [float(x) for x in v.astype(_np.float32)]

        for pdf in batches:
            pdf = pdf.copy()
            # Null text -> null embedding (same contract as the HTTP
            # twin): astype(str) would embed the literal 'None'.
            pdf[out_col] = [
                None if _pd_isna(t) else _embed(str(t)) for t in pdf[text_col]
            ]
            yield pdf

    return df.mapInPandas(embed_batches, schema=out_schema)

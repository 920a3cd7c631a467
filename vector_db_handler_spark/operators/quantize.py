"""Scalar int8 embedding quantization + quantized KNN.

Not in the reference (it stores float vectors verbatim and lets
Qdrant index them); mandated by the extension brief's similarity
pillar.  At 100 TB of embeddings, int8 is the difference between a
corpus that fits executor memory and one that doesn't: 4× smaller
scan, and the scoring kernel becomes an integer matmul (SIMD-friendly
in numpy, exact — no float accumulation-order nondeterminism in the
scores, so ranking is bit-stable across partitionings and engines).

Scheme: symmetric max-abs scalar quantization —

    s  = max over corpus of |x_i|          (one native-expression scan)
    q_i = clamp(floor(127·x_i/s + 0.5), -127, 127)   (int8 range)

``floor(·+0.5)`` instead of ``round`` because engines disagree on
half-even vs half-away ties; floor is floor everywhere.  The scale is
a 1-row aggregate carried by broadcast — never a driver collect —
and the quantization itself is an Arrow-batched numpy pass
(``mapInPandas``), the same hot-path shape as the float scorer in
``functions/vector.py``.

Integer dot scores are exact (|q|≤127, dim 64 ⇒ |score| ≤ 127²·64 ≈
10⁶ ≪ 2⁵³), so the DuckDB oracle reproduces them to the last bit —
a quantization pipeline you can hash-check end-to-end.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, LongType, StructField, StructType

Q_MAX = 127


def max_abs_scale(emb: DataFrame, embedding_col: str = "embedding") -> DataFrame:
    """1-row DataFrame ``(s DOUBLE)``: the corpus max |component|.

    ``array_max``/``array_min`` are native (codegen) expressions — no
    lambda HOF, no Python — so this is a plain map-side-combined
    aggregate over the scan."""
    arr = F.col(embedding_col).cast("array<double>")
    row_max = F.greatest(F.array_max(arr), -F.array_min(arr))
    return emb.agg(F.max(row_max).alias("s"))


def quantize_int8(
    emb: DataFrame,
    embedding_col: str = "embedding",
    id_col: str = "vec_id",
    out_col: str = "qvec",
    scale: DataFrame | None = None,
) -> DataFrame:
    """Quantize a vector column → ``(id_col, qvec ARRAY<BIGINT>)``.

    The scale rides a 1-row broadcast into every batch; the per-batch
    kernel is one vectorized numpy expression.  Elements are stored as
    BIGINT for engine-portable comparison; a production sink would
    pack them to int8 bytes (4×) at write time."""
    if scale is None:
        scale = max_abs_scale(emb, embedding_col)
    joined = emb.select(id_col, embedding_col).crossJoin(F.broadcast(scale))
    id_field = joined.schema[id_col]
    out_schema = StructType(
        [
            StructField(id_col, id_field.dataType, id_field.nullable),
            StructField(out_col, ArrayType(LongType()), False),
        ]
    )

    def quantize(batches):  # self-contained: cloudpickled to executors
        import numpy as np

        for pdf in batches:
            if pdf.empty:
                continue
            s = float(pdf["s"].iloc[0])
            if not s > 0.0:  # all-zero corpus: q = 0 everywhere
                s = 1.0
            mat = np.asarray(
                [np.asarray(v, dtype=np.float64) for v in pdf[embedding_col]]
            )
            q = np.clip(np.floor(127.0 * mat / s + 0.5), -127, 127).astype(np.int64)
            out = pdf[[id_col]].copy()
            out[out_col] = list(q)
            yield out

    return joined.mapInPandas(quantize, out_schema)


def quantize_vector(vec: Sequence[float], s: float) -> list[int]:
    """Driver-side twin for a single query vector (plain Python; the
    query is a literal, not data)."""
    import math

    if not s > 0.0:
        s = 1.0
    return [
        int(max(-Q_MAX, min(Q_MAX, math.floor(127.0 * float(x) / s + 0.5))))
        for x in vec
    ]


def quantized_knn(
    emb: DataFrame,
    query_vector: Sequence[float],
    k: int = 10,
    embedding_col: str = "embedding",
    id_col: str = "vec_id",
    score_col: str = "qscore",
) -> DataFrame:
    """Top-k by exact integer dot product in the int8 domain →
    ``(id_col, qscore BIGINT)``.

    One Arrow-batched pass quantizes each corpus batch AND scores it
    against the (batch-quantized) query; ``orderBy().limit(k)`` lowers
    to ``TakeOrderedAndProject`` — local top-k per partition, k·P rows
    to the driver, no global sort.  Integer scores make the ranking
    reproducible to the bit at any partitioning."""
    scale = max_abs_scale(emb, embedding_col)
    joined = emb.select(id_col, embedding_col).crossJoin(F.broadcast(scale))
    id_field = joined.schema[id_col]
    out_schema = StructType(
        [
            StructField(id_col, id_field.dataType, id_field.nullable),
            StructField(score_col, LongType(), False),
        ]
    )
    qv = [float(x) for x in query_vector]

    def score(batches):  # self-contained: cloudpickled to executors
        import numpy as np

        for pdf in batches:
            if pdf.empty:
                continue
            s = float(pdf["s"].iloc[0])
            if not s > 0.0:  # all-zero corpus: every score is 0
                s = 1.0
            qq = np.clip(
                np.floor(127.0 * np.asarray(qv, dtype=np.float64) / s + 0.5),
                -127,
                127,
            ).astype(np.int64)
            mat = np.asarray(
                [np.asarray(v, dtype=np.float64) for v in pdf[embedding_col]]
            )
            q = np.clip(np.floor(127.0 * mat / s + 0.5), -127, 127).astype(np.int64)
            out = pdf[[id_col]].copy()
            out[score_col] = q @ qq
            yield out

    scored = joined.mapInPandas(score, out_schema)
    return scored.orderBy(F.col(score_col).desc(), F.col(id_col).asc()).limit(k)

"""Vector expressions: Arrow-batched numpy scoring (hot path) and
native higher-order-function forms (cold path / oracle parity).

The reference delegates all vector math to Qdrant's HNSW engine with
``Distance.COSINE`` (reference ``app/core/document_ingestor.py:86``).

Two implementations, picked by temperature:

* **Hot path** (every KNN/similarity scan): a vectorized pandas UDF —
  one Arrow batch in, one numpy matrix-vector product out.  Spark's
  higher-order array functions (``zip_with``/``aggregate``) are
  evaluated INTERPRETED (they never enter whole-stage codegen), which
  makes them ~10-100× slower than a BLAS dot per row; the Arrow batch
  path amortizes the Python hop over ~10k rows and is the same shape a
  real 1000-executor scan wants.  The scored column feeds
  ``filter(score >= t).orderBy(desc).limit(k)`` which still lowers to
  ``TakeOrderedAndProject`` (per-partition top-k + driver merge, no
  full sort).
* **Cold path** (``dot_product``/``l2_norm``): the higher-order-function
  forms — interpreted, but exactly sequential IEEE accumulation in
  DOUBLE, textually parallel to the DuckDB oracles (``list_dot_product``)
  — used for one-off norms (ingest, update) where a Python hop isn't
  worth it and bit-parity matters most.

Scores surfaced to oracle-checked queries are rounded to 6 decimals in
both engines, which absorbs summation-order differences between numpy's
SIMD/pairwise reductions and sequential SQL sums (≤1e-15 relative).
"""

from __future__ import annotations

import math
from collections.abc import Sequence

import numpy as np
import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf


def vector_literal(vec: Sequence[float]) -> Column:
    """A literal query vector as an ARRAY<DOUBLE> column.

    The reference broadcasts the embedded query vector to Qdrant in the
    request body (``document_ingestor.py:356-363``); in Spark a literal
    array is folded into the plan and shipped once per task, not per row.
    """
    return F.array(*[F.lit(float(v)) for v in vec])


def dot_product(a: Column, b: Column) -> Column:
    """Dot product of two array columns, accumulated in DOUBLE."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def l2_norm(a: Column) -> Column:
    """Euclidean norm of an array column."""
    return F.sqrt(dot_product(a, a))


# NOTE on UDF closures: every pandas UDF below is SELF-CONTAINED — it
# references only numpy/pandas and locally-bound values.  cloudpickle
# serializes module-level functions BY REFERENCE, so a UDF that called a
# helper from this module would require ``vector_db_handler_spark`` to
# be importable on every executor; self-contained closures run under any
# SparkSession (including the driver harness's, which doesn't ship the
# package to workers).


def cosine_score(embedding: Column, query: Sequence[float]) -> Column:
    """Cosine similarity of an embedding column against a query vector
    — the HOT path (reference scoring semantics: cosine, higher =
    better, ``document_ingestor.py:86``, ``:340``).

    Vectorized pandas UDF: each Arrow batch becomes one numpy
    matrix-vector product (``M @ q``) plus one fused row-norm
    (``einsum``) — BLAS-speed per row, one Python hop per ~10k-row
    batch.  The query vector and its norm are closed over driver-side
    and shipped once per task with the serialized UDF.
    """
    q = np.asarray([float(v) for v in query], dtype=np.float64)
    qnorm = float(np.sqrt((q * q).sum()))

    @pandas_udf("double")
    def _score(embs: pd.Series) -> pd.Series:
        # Null embeddings score NULL, never NaN: Spark orders NaN
        # ABOVE every real double, so a NaN would hijack a descending
        # top-k; nulls sort last under desc and drop under filters.
        if len(embs) == 0:
            return pd.Series(np.zeros(0, dtype=np.float64))
        mask = embs.notna().to_numpy()
        out = pd.array(np.zeros(len(embs)), dtype="Float64")
        out[~mask] = pd.NA
        if mask.any():
            m = np.array(list(embs[mask]), dtype=np.float64)
            dots = m @ q
            norms = np.sqrt(np.einsum("ij,ij->i", m, m))
            out[mask] = dots / (norms * qnorm)
        return pd.Series(out)

    return _score(embedding)


def cosine_score_precomputed(embedding: Column, embedding_norm: Column, query: Sequence[float]) -> Column:
    """Cosine score using a precomputed row-side norm column (the
    store's ``embedding_norm``, written once at ingest) — skips the
    per-row norm entirely; only the dot product runs per row."""
    q = np.asarray([float(v) for v in query], dtype=np.float64)
    qnorm = float(np.sqrt((q * q).sum()))

    @pandas_udf("double")
    def _score(embs: pd.Series, norms: pd.Series) -> pd.Series:
        # null embedding → null score (see cosine_score's NaN note)
        if len(embs) == 0:
            return pd.Series(np.zeros(0, dtype=np.float64))
        mask = (embs.notna() & norms.notna()).to_numpy()
        out = pd.array(np.zeros(len(embs)), dtype="Float64")
        out[~mask] = pd.NA
        if mask.any():
            m = np.array(list(embs[mask]), dtype=np.float64)
            dots = m @ q
            out[mask] = dots / (norms.to_numpy(dtype=np.float64)[mask] * qnorm)
        return pd.Series(out)

    return _score(embedding, embedding_norm)


def pairwise_dot(a: Column, b: Column) -> Column:
    """Row-wise dot product of TWO array columns (similarity joins) —
    Arrow-batched numpy, the hot-path twin of :func:`dot_product`."""

    @pandas_udf("double")
    def _dot(xs: pd.Series, ys: pd.Series) -> pd.Series:
        # null on either side → null (see cosine_score's NaN note)
        if len(xs) == 0:
            return pd.Series(np.zeros(0, dtype=np.float64))
        mask = (xs.notna() & ys.notna()).to_numpy()
        out = pd.array(np.zeros(len(xs)), dtype="Float64")
        out[~mask] = pd.NA
        if mask.any():
            mx = np.array(list(xs[mask]), dtype=np.float64)
            my = np.array(list(ys[mask]), dtype=np.float64)
            out[mask] = np.einsum("ij,ij->i", mx, my)
        return pd.Series(out)

    return _dot(a, b)

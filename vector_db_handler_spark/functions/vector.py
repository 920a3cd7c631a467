"""Native (JVM-side, codegen-friendly) vector expressions.

The reference delegates all vector math to Qdrant's HNSW engine with
``Distance.COSINE`` (reference ``app/core/document_ingestor.py:86``).
Here cosine similarity is expressed with Spark's higher-order array
functions (``zip_with`` + ``aggregate``), which stay inside Catalyst /
whole-stage codegen — no Python UDF on the hot path, so a 100 TB scan
scores vectors at parquet-reader speed and the top-k lowers to
``TakeOrderedAndProject`` (per-partition top-k + driver merge, no full
shuffle/sort).

Accumulation is in DOUBLE regardless of the stored element type
(parquet ``list<float>``) so scores are stable across batch sizes.
"""

from __future__ import annotations

import math
from collections.abc import Sequence

from pyspark.sql import Column
from pyspark.sql import functions as F


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


def cosine_score(embedding: Column, query: Sequence[float]) -> Column:
    """Cosine similarity of an embedding column against a query vector.

    Matches the reference's scoring semantics (cosine, higher = better,
    ``document_ingestor.py:86``, ``:340``).  The query-side norm is
    computed once driver-side and inlined as a literal, halving the
    per-row math; only ``dot(e, q)`` and ``norm(e)`` are evaluated per
    row.  (At ingest time the store also precomputes ``embedding_norm``
    — see ``store.py`` — which callers may pass to avoid the second
    aggregate entirely.)
    """
    q = [float(v) for v in query]
    qnorm = math.sqrt(sum(v * v for v in q))
    return dot_product(embedding, vector_literal(q)) / (l2_norm(embedding) * F.lit(qnorm))


def cosine_score_precomputed(embedding: Column, embedding_norm: Column, query: Sequence[float]) -> Column:
    """Cosine score using a precomputed row-side norm column."""
    q = [float(v) for v in query]
    qnorm = math.sqrt(sum(v * v for v in q))
    return dot_product(embedding, vector_literal(q)) / (embedding_norm.cast("double") * F.lit(qnorm))

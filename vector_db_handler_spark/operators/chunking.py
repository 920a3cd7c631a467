"""Document chunking: the ingestion-side splitter for the doc/chunk model.

The reference's data model is (DocId, ChunkId, text, vector) — see
reference app/core/document_ingestor.py:40-120 (points carry a chunk id
and the HTTP surface upserts per-chunk payloads) — but the reference
leaves the actual splitting to its callers.  This operator closes that
gap Spark-first: fixed-size character windows with overlap, the layout
every RAG / embedding-ingest pipeline feeds to the embedder (overlap
preserves context across boundaries so a sentence straddling a cut
still appears whole in one chunk).

Chunk geometry (pinned, engine-portable):

* ``stride = size - overlap``; chunk ``i`` covers characters
  ``[i*stride + 1, i*stride + size]`` (1-based, inclusive).
* ``n_chunks = 1`` if ``len <= size`` else
  ``ceil((len - size) / stride) + 1`` — the final chunk may be shorter
  than ``size`` but is never empty (it always reaches past the
  previous chunk's end), and every character belongs to at least one
  chunk.
* Null/empty texts produce no chunks (``sequence(0, NULL)`` explodes
  to nothing — the same rows a lateral ``generate_series`` drops in
  ANSI SQL, so both engines agree without a special case; empty text
  is filtered explicitly).

Scale shape: ZERO shuffle — chunk expansion is an in-row
``posexplode(sequence(...))`` + ``substring`` projection, entirely
inside whole-stage codegen; output partitioning inherits the scan.  At
100 TB the fan-out factor is ``~len/stride`` rows per doc (bounded,
data-independent), and because no exchange follows, downstream
embedders see chunks co-located with their source split.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from vector_db_handler_spark.functions.text import quote_ident


def chunk_documents(
    docs: DataFrame,
    size: int = 200,
    overlap: int = 50,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Split each document into overlapping fixed-size character
    chunks.  Returns ``(id_col, chunk_idx, chunk_text)`` with
    ``chunk_idx`` counting from 0 in document order."""
    if not 0 <= overlap < size:
        raise ValueError(f"need 0 <= overlap < size, got {overlap=} {size=}")
    stride = size - overlap
    tq = quote_ident(text_col)
    n = F.length(F.col(text_col))
    # ceil((n - size) / stride) + 1, in exact integer arithmetic; the
    # <= size branch also swallows n == 0 via the explicit filter below.
    n_chunks = (
        F.when(n <= size, F.lit(1).cast("long"))
        .otherwise(
            F.expr(f"(length({tq}) - {size} + {stride - 1}) div {stride}")
            + F.lit(1)
        )
        .cast("long")
    )
    return (
        docs.filter(n > 0)
        .select(F.col(id_col), F.col(text_col), n_chunks.alias("_nc"))
        .select(
            id_col,
            text_col,
            F.explode(F.sequence(F.lit(0).cast("long"), F.col("_nc") - 1)).alias(
                "chunk_idx"
            ),
        )
        .select(
            id_col,
            "chunk_idx",
            F.expr(
                f"substring({tq}, cast(chunk_idx * {stride} + 1 as int), {size})"
            ).alias("chunk_text"),
        )
    )

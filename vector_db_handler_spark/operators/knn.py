"""Exact cosine top-k search and paged scans.

Reference semantics covered here (``app/core/document_ingestor.py``):

* H13 ``search_query``        (:332-364) — top-``limit`` by cosine score,
  ``score >= score_threshold`` (default 0 ⇒ anti-correlated vectors are
  silently dropped even when k is not reached).
* H14 ``search_query_on_doc`` (:366-408) — same, with a disjunctive
  pre-filter ``DocId IN (…)``; an EMPTY id list matches everything
  (Qdrant ``should=[]`` semantics, documented at :526-529).
* H15-H18 scrolls             (:410-557) — filtered scans with LIMIT.

Spark-first design notes (100 TB posture):

* Scoring is an Arrow-batched numpy pandas UDF (``functions/vector.py``)
  — one matrix-vector product per ~10k-row batch.  (Higher-order
  ``zip_with``/``aggregate`` forms are evaluated interpreted by Spark —
  NOT inside whole-stage codegen — and benchmarked ~6× slower even at
  2k rows; the gap widens with scale.)  The UDF is one ArrowEvalPython
  node, so the score is computed once and reused by the filter and the
  sort above it.
* ``orderBy(desc(score)).limit(k)`` lowers to ``TakeOrderedAndProject``:
  each partition computes a local top-k and the driver merges k·P rows —
  no global sort, no shuffle of the scan.
* Pre-filters are plain Catalyst predicates applied BEFORE scoring, so
  partition pruning (tenant) and parquet row-group pruning (doc ids)
  cut the scored set exactly like Qdrant's filtered HNSW — but exact.
* Scrolls add a deterministic ``ORDER BY`` on the id column: the
  reference's "first page" is whatever order Qdrant returns; for a
  distributed engine an unordered LIMIT is non-deterministic across
  runs, so we pin id order (documented divergence, strictly more
  reproducible).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from vector_db_handler_spark.functions.vector import cosine_score


def knn(
    df: DataFrame,
    query_vector: Sequence[float],
    k: int = 5,
    score_threshold: float | None = 0.0,
    embedding_col: str = "embedding",
    pre_filter: Column | None = None,
    score_col: str = "score",
    tie_break_col: str | None = None,
) -> DataFrame:
    """Exact cosine top-k (reference H13, ``document_ingestor.py:332-364``).

    ``score_threshold`` defaults to 0 like the reference (:339): negative
    similarities are dropped before the limit.  Pass ``None`` to disable.
    ``tie_break_col`` pins a total order for equal scores (determinism
    across partitionings — essential for reproducible results at scale).
    """
    scored = df.withColumn(score_col, cosine_score(F.col(embedding_col), query_vector))
    if pre_filter is not None:
        # Filter BEFORE scoring in plan order; Catalyst pushes the
        # predicate below the projection to the scan.
        scored = scored.filter(pre_filter)
    if score_threshold is not None:
        scored = scored.filter(F.col(score_col) >= F.lit(float(score_threshold)))
    order = [F.col(score_col).desc()]
    if tie_break_col is not None:
        order.append(F.col(tie_break_col).asc())
    return scored.orderBy(*order).limit(k)


def knn_on_docs(
    df: DataFrame,
    query_vector: Sequence[float],
    doc_ids: Sequence[int],
    k: int = 5,
    score_threshold: float | None = 0.0,
    embedding_col: str = "embedding",
    doc_id_col: str = "doc_id",
    score_col: str = "score",
    tie_break_col: str | None = None,
) -> DataFrame:
    """Filtered KNN (reference H14, ``document_ingestor.py:366-408``).

    Empty ``doc_ids`` ⇒ NO filter (match-all), per the reference's
    ``should=[]`` semantics (:526-529).
    """
    pre = F.col(doc_id_col).isin(list(doc_ids)) if doc_ids else None
    return knn(
        df,
        query_vector,
        k=k,
        score_threshold=score_threshold,
        embedding_col=embedding_col,
        pre_filter=pre,
        score_col=score_col,
        tie_break_col=tie_break_col,
    )


def scroll(
    df: DataFrame,
    limit: int = 20,
    pre_filter: Column | None = None,
    order_col: str | None = None,
    after: object | None = None,
) -> DataFrame:
    """Paged scan (reference H15-H18, ``:410-557``).

    The reference returns only the first page and DISCARDS the
    next-page offset (:436) — real pagination is unreachable through
    its API.  We reproduce the first-page LIMIT semantics (``after``
    omitted) and add KEYSET pagination: ``after`` = the last id of the
    previous page ⇒ ``WHERE order_col > after`` feeds the next page.
    Keyset predicates push into the parquet scan (row-group pruning on
    the id column), unlike OFFSET which re-scans and discards — the
    only pagination that survives 100 TB.
    """
    out = df if pre_filter is None else df.filter(pre_filter)
    if after is not None:
        if order_col is None:
            raise ValueError("keyset pagination requires order_col")
        out = out.filter(F.col(order_col) > F.lit(after))
    if order_col is not None:
        out = out.orderBy(F.col(order_col).asc())
    return out.limit(limit)


def scroll_docs(
    df: DataFrame,
    doc_ids: Sequence[int],
    limit: int = 20,
    doc_id_col: str = "doc_id",
    order_col: str | None = None,
) -> DataFrame:
    """Scan WHERE doc_id IN (…) (reference H18, ``:515-557``).

    Empty ``doc_ids`` ⇒ full scan (match-all, docstring :526-529).
    """
    pre = F.col(doc_id_col).isin(list(doc_ids)) if doc_ids else None
    return scroll(df, limit=limit, pre_filter=pre, order_col=order_col)

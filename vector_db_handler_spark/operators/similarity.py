"""Similarity search over embedding columns.

The reference serves single-query KNN through Qdrant's HNSW
(``document_ingestor.py:356-363``); the Spark-native surface here is
BATCH similarity — many queries (or all-pairs) against the corpus in
one job:

* ``cosine_topk_join``  — exact brute-force top-k per query row: the
  correctness baseline.  Plan shape: broadcast the (small) query side,
  score natively, rank with a per-query window.  No shuffle of the
  corpus when the query side broadcasts.
* ``cosine_neardup_pairs`` — all-pairs self-join above a threshold
  (semantic dedup); quadratic, for modest corpora or post-LSH
  verification.
* ``ivf_topk`` — the scale path: a coarse quantizer (centroid
  assignment) partitions the corpus into cells; a query probes only
  the ``nprobe`` nearest cells.  Deterministic by construction (fixed
  centroid rows, exact argmin assignment), so it is oracle-checkable —
  unlike HNSW.  At 100 TB: centroids come from a sampled k-means
  (spark.ml KMeans) and the corpus is written bucketed/partitioned by
  ``cell_id``, turning each query into a partition-pruned scan.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from vector_db_handler_spark.functions.vector import dot_product, l2_norm


def _cos(e1, n1, e2, n2):
    return dot_product(e1, e2) / (n1 * n2)


def cosine_topk_join(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    exclude_self: bool = True,
) -> DataFrame:
    """Exact top-k neighbours for every query row.

    Output: (query_id, neighbor_id, score), ranked per query.  The
    query side is broadcast — the corpus is scanned once, never
    shuffled; ranking shuffles only Q×N scored rows cut to Q×k by the
    window's rank filter (Spark pushes a per-partition top-k into the
    window sort).
    """
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).cast("array<double>").alias("qvec"),
        l2_norm(F.col(vec_col)).alias("qnorm"),
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).cast("array<double>").alias("cvec"),
        l2_norm(F.col(vec_col)).alias("cnorm"),
    )
    joined = c.crossJoin(F.broadcast(q))
    if exclude_self:
        joined = joined.filter(F.col("neighbor_id") != F.col("query_id"))
    scored = joined.withColumn(
        "score", _cos(F.col("cvec"), F.col("cnorm"), F.col("qvec"), F.col("qnorm"))
    )
    w = Window.partitionBy("query_id").orderBy(F.col("score").desc(), F.col("neighbor_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", F.round("score", 6).alias("score"), "rank")
    )


def cosine_neardup_pairs(
    corpus: DataFrame,
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """All pairs (i < j) with cosine ≥ threshold — semantic near-dup.

    O(n²) scoring; use post-LSH or per-cell (see ``ivf_topk``'s
    assignment) to bound the pair space at scale.
    """
    base = corpus.select(
        F.col(id_col).alias("id"),
        F.col(vec_col).cast("array<double>").alias("vec"),
        l2_norm(F.col(vec_col)).alias("nrm"),
    )
    a, b = base.alias("a"), base.alias("b")
    return (
        a.join(b, F.col("a.id") < F.col("b.id"))
        .withColumn(
            "score", _cos(F.col("a.vec"), F.col("a.nrm"), F.col("b.vec"), F.col("b.nrm"))
        )
        .filter(F.col("score") >= threshold)
        .select(
            F.col("a.id").alias("id1"),
            F.col("b.id").alias("id2"),
            F.round("score", 6).alias("score"),
        )
    )


def assign_cells(
    corpus: DataFrame,
    centroids: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF coarse quantization: each row → nearest centroid by cosine
    (deterministic argmin, ties to lowest centroid id).

    Output: corpus columns + ``cell_id``.  Centroids broadcast; one
    window per row group — at scale, materialize this once and
    partition the table by ``cell_id``.
    """
    cents = centroids.select(
        F.col(id_col).alias("cell_id"),
        F.col(vec_col).cast("array<double>").alias("centvec"),
        l2_norm(F.col(vec_col)).alias("centnorm"),
    )
    scored = corpus.crossJoin(F.broadcast(cents)).withColumn(
        "cell_score",
        _cos(F.col(vec_col).cast("array<double>"), l2_norm(F.col(vec_col)), F.col("centvec"), F.col("centnorm")),
    )
    w = Window.partitionBy(id_col).orderBy(F.col("cell_score").desc(), F.col("cell_id").asc())
    return (
        scored.withColumn("_r", F.row_number().over(w))
        .filter(F.col("_r") == 1)
        .drop("_r", "centvec", "centnorm", "cell_score")
    )


def ivf_topk(
    corpus: DataFrame,
    centroids: DataFrame,
    query_vector: Sequence[float],
    k: int = 5,
    nprobe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k: probe the ``nprobe`` cells nearest the query,
    exact cosine top-k within them.

    Recall is bounded by cell geometry (tested against the brute-force
    baseline); cost drops from N to ~N·nprobe/C rows scored.
    """
    from vector_db_handler_spark.functions.vector import cosine_score

    assigned = assign_cells(corpus, centroids, id_col, vec_col)
    probe_cells = (
        centroids.withColumn("qscore", cosine_score(F.col(vec_col), query_vector))
        .orderBy(F.col("qscore").desc(), F.col(id_col).asc())
        .limit(nprobe)
        .select(F.col(id_col).alias("cell_id"))
    )
    return (
        assigned.join(F.broadcast(probe_cells), "cell_id")
        .withColumn("score", cosine_score(F.col(vec_col), query_vector))
        .orderBy(F.col("score").desc(), F.col(id_col).asc())
        .limit(k)
        .select(F.col(id_col), F.col("cell_id"), F.round("score", 6).alias("score"))
    )

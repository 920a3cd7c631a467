"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship exact-cosine-top-k query on the
sf0.001 fixtures; ``queries()`` / ``oracle_sql()`` expose the operator
inventory from ``SURVEY.md §2`` via
``vector_db_handler_spark.driver_queries``.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from vector_db_handler_spark import driver_queries as _dq

SF0001_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: exact cosine top-k over the embeddings table
    (reference H13, ``document_ingestor.py:332-364``)."""
    return _dq.knn_topk(spark, SF0001_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return _dq.queries()


def oracle_sql() -> dict[str, str]:
    return _dq.oracle_sql()

"""ORC source — the third interchange edge (parquet-native storage,
JSONL and CSV drops, ORC for Hive-ecosystem hand-offs).  ORC is the
other columnar format Spark reads natively (no external module, unlike
Avro in this deployment): schema-typed, splittable by stripe, with
predicate pushdown and column pruning at the scan — the properties
that make a 100 TB exchange readable at full parallelism.

The reference has no file sources at all (its ingest edge is the
FastAPI upload in routes.py:169-266); this is extension surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

DOCUMENTS_ORC_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
        T.StructField("source", T.StringType()),
        T.StructField("n_chars", T.LongType()),
    ]
)


def write_documents_orc(docs: DataFrame, path: str) -> None:
    """Export a documents relation as an ORC directory (zlib default;
    stripe-splittable for parallel re-reads)."""
    docs.write.mode("overwrite").orc(path)


def read_documents_orc(spark: SparkSession, path: str) -> DataFrame:
    """Schema-enforced ORC read.  ORC files are self-describing and
    type-checked at write, so there is no corrupt-record lane (that is
    the CSV/JSONL edge's job); the explicit schema still pins column
    types against drift between producer versions."""
    return spark.read.schema(DOCUMENTS_ORC_SCHEMA).orc(path)

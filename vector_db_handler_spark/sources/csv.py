"""CSV source for document corpora — the second interchange edge next
to JSONL (``sources/jsonl.py``): schema-enforced reads with explicit
corrupt-record capture, so a mangled row in a multi-TB drop surfaces
as a countable quarantined record instead of killing the job or
silently vanishing.

Scale posture: CSV read with ``multiLine=false`` is line-splittable
(fully parallel scan); that forbids embedded newlines in field values,
which the writer's quoting would otherwise permit.  Corpora with
newline-bearing text belong in JSONL (JSON-escaped, still splittable)
or parquet — this reader is for the flat tabular drops (metadata
tables, scores, manifests) that ship as CSV in practice.  The explicit
schema also skips the inference pass ``inferSchema`` would pay (2×
read at scale).

The reference has no file sources at all (its ingest edge is the
FastAPI upload in routes.py:169-266); this is extension surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

#: Capture column must be part of the read schema (Spark fills it with
#: the raw line when parsing fails and leaves it null otherwise).
CORRUPT_COL = "_corrupt_record"

DOCUMENTS_CSV_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
        T.StructField("source", T.StringType()),
        T.StructField("n_chars", T.LongType()),
        T.StructField(CORRUPT_COL, T.StringType()),
    ]
)


def write_documents_csv(docs: DataFrame, path: str) -> None:
    """Export a documents relation as a headerless CSV directory.

    Headerless because a directory of part files would repeat the
    header per file; the schema travels in code (or a sidecar), not in
    band.  Default quoting handles embedded commas/quotes; embedded
    newlines would break line-splittability and belong in JSONL."""
    docs.write.mode("overwrite").option("header", "false").csv(path)


def read_documents_csv(spark: SparkSession, path: str) -> DataFrame:
    """Schema-enforced CSV read with corrupt-record quarantine.

    Valid rows parse into typed columns (``_corrupt_record`` null);
    rows with type mismatches or wrong arity yield the raw line in
    ``_corrupt_record`` and nulls elsewhere.  Cached for the same
    reason as the JSONL reader: the corrupt column of a file scan
    cannot be referenced alone (SPARK-21610), and the cache pins one
    consistent valid/corrupt split.
    """
    df = (
        spark.read.schema(DOCUMENTS_CSV_SCHEMA)
        .option("header", "false")
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
        .option("multiLine", "false")
        .csv(path)
    )
    return df.cache()

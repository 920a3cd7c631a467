"""JSONL (newline-delimited JSON) source for document corpora.

LLM training-data pipelines overwhelmingly EXCHANGE corpora as JSONL
(one document object per line) even when they process them as parquet;
this module is the ingest edge: schema-enforced reads with explicit
corrupt-record capture, so a single mangled line in a 100 TB drop
surfaces as a countable row instead of killing the job or silently
vanishing.

Scale posture: JSONL is splittable by line, so a directory of .jsonl
files scans fully parallel; the explicit schema avoids the
whole-dataset inference pass ``spark.read.json`` would otherwise pay
(2× read at 100 TB).  The corrupt-record column is PERMISSIVE-mode
capture — quarantine-and-continue, the only viable semantics for
petabyte drops (FAILFAST dies on line one billion, DROPMALFORMED lies
about row counts).

The reference has no file sources at all (its ingest edge is the
FastAPI upload in routes.py:169-266); this is extension surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

#: Documents-table schema plus the corrupt-record capture column.
#: The capture column must be PART OF the read schema (Spark fills it
#: with the raw line when parsing fails and leaves it null otherwise).
CORRUPT_COL = "_corrupt_record"

DOCUMENTS_JSONL_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
        T.StructField("source", T.StringType()),
        T.StructField("n_chars", T.LongType()),
        T.StructField(CORRUPT_COL, T.StringType()),
    ]
)


def write_documents_jsonl(docs: DataFrame, path: str) -> None:
    """Export a documents relation as a JSONL directory (one object per
    line, UTF-8, JSON-escaped — newline-safe for embedded text)."""
    docs.write.mode("overwrite").json(path)


def read_documents_jsonl(spark: SparkSession, path: str) -> DataFrame:
    """Schema-enforced JSONL read with corrupt-record quarantine.

    Valid lines parse into typed columns (``_corrupt_record`` null);
    malformed lines yield a row with the raw line in
    ``_corrupt_record`` and nulls elsewhere.  The returned frame is
    CACHED before anyone filters on the capture column: Spark refuses
    plans that reference only the internal corrupt column of a JSON
    scan (SPARK-21610), and the cache also guarantees the
    valid/corrupt split is computed from one consistent pass.
    """
    df = (
        spark.read.schema(DOCUMENTS_JSONL_SCHEMA)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
        .json(path)
    )
    return df.cache()

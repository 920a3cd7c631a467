"""XML source — the document-markup interchange edge, on Spark 4's
NATIVE XML data source (``format("xml")``, upstreamed from spark-xml
in 4.0; no external jar).

Why it earns a slot next to JSONL/CSV/ORC/Avro: feeds like Wikipedia
dumps, PubMed, arXiv metadata and legacy CMS exports — core LLM-corpus
inputs — arrive as XML, and the 100 TB-relevant property is that the
row-tag splitter streams records without materializing documents, so a
multi-gigabyte dump file scans in parallel like any other source.

Escaping is the lossless-roundtrip hazard XML adds over CSV quoting:
``&``/``<``/``>`` in document text must entity-encode on write and
decode on read — the checksum oracle in ``xml_roundtrip_stats`` is
what proves that actually happens.

The reference has no file sources at all (its ingest edge is the
FastAPI upload, routes.py:169-266); extension surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

DOCUMENTS_XML_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
        T.StructField("source", T.StringType()),
        T.StructField("n_chars", T.LongType()),
    ]
)

ROW_TAG = "doc"


def write_documents_xml(docs: DataFrame, path: str) -> None:
    """Export a documents relation as an XML directory (one ``<doc>``
    element per row under a ``<docs>`` root)."""
    (
        docs.write.mode("overwrite")
        .option("rootTag", "docs")
        .option("rowTag", ROW_TAG)
        .format("xml")
        .save(path)
    )


def read_documents_xml(spark: SparkSession, path: str) -> DataFrame:
    """Schema-enforced XML read.  The explicit schema skips the
    inference scan (a full extra pass at scale) and pins types; the
    row-tag splitter parallelizes within files."""
    return (
        spark.read.schema(DOCUMENTS_XML_SCHEMA)
        .option("rowTag", ROW_TAG)
        .format("xml")
        .load(path)
    )

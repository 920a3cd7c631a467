"""Arrow IPC (Feather v2) source/sink for the documents relation —
the columnar INTERCHANGE edge next to the row-oriented Avro OCF one
(`sources/avro.py`).

Arrow IPC files are what ML tooling actually hands around
(HuggingFace `datasets` caches ARE Arrow IPC; Feather v2 == the IPC
file format; Ray/Polars/DuckDB all read it zero-copy), and this
container ships pyarrow — so unlike Avro no hand-rolled codec is
needed: the same distributed shape as every connector-less format
here (one ``binaryFile`` task per file → in-task pyarrow decode, one
Python hop, Arrow end-to-end) wraps `pyarrow.ipc` directly.

Files are the parallelism unit, matching how IPC datasets land (one
file per writer shard).  Writes go executor-side via ``mapInPandas``
(every Spark sink writes from tasks; the driver collects only the
per-file manifest) with atomic per-file rename — the same commit
contract as the Avro writer.

The read enforces the expected field names, so a foreign IPC file
fails loudly instead of mis-mapping columns — the same
schema-enforcement stance as the Avro/XML readers.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from vector_db_handler_spark.sources.avro import DOC_FIELDS, DOCUMENTS_DDL


#: DOC_FIELDS in pyarrow terms — the ONE schema every part file must
#: carry.  Built explicitly (r11 ADVICE): letting ``Table.from_pandas``
#: infer per-partition schemas means a partition whose column is
#: entirely null infers a null/object type, so part files could
#: disagree on types and a type-skewed file would only surface later
#: as a coercion error inside the reader's ``mapInPandas``.
_ARROW_TYPES = {"long": "int64", "string": "string"}

#: Plain-data schema spec — closures capture THIS (picklable by
#: value), and build the pa.schema inside the task.
_ARROW_SCHEMA_SPEC: list[tuple[str, str]] = [
    (n, _ARROW_TYPES[t]) for n, t in DOC_FIELDS
]


def write_documents_arrow(docs: DataFrame, path: str) -> int:
    """Export the documents relation as a directory of Arrow IPC
    files (Feather v2), one per non-empty partition, written
    executor-side under the explicit canonical schema (all-null
    partitions cannot type-skew).  Returns the total row count (from
    the per-file manifest — the only thing the driver sees)."""
    os.makedirs(path, exist_ok=True)
    cols = [n for n, _ in DOC_FIELDS]
    spec = list(_ARROW_SCHEMA_SPEC)

    def writer(batches):
        import os as _os

        import pandas as _pd
        import pyarrow as _pa
        import pyarrow.ipc as _ipc
        from pyspark import TaskContext

        schema = _pa.schema([(n, getattr(_pa, t)()) for n, t in spec])
        pid = TaskContext.get().partitionId()
        parts = [pdf for pdf in batches if len(pdf)]
        if parts:
            table = _pa.Table.from_pandas(
                _pd.concat(parts, ignore_index=True),
                schema=schema,
                preserve_index=False,
            )
            fname = _os.path.join(path, f"part-{pid:05d}.arrow")
            tmp = fname + ".tmp"
            with _ipc.new_file(tmp, table.schema) as w:
                w.write_table(table)
            _os.replace(tmp, fname)  # atomic per-file commit
            yield _pd.DataFrame(
                {"file": [fname], "n_rows": [table.num_rows]}
            )

    manifest = docs.select(cols).mapInPandas(
        writer, schema="file string, n_rows long"
    )
    return sum(r["n_rows"] for r in manifest.collect())


def read_documents_arrow(spark: SparkSession, path: str) -> DataFrame:
    """Distributed IPC read: ``binaryFile`` scan (one task per file)
    → in-task ``pyarrow.ipc.open_file`` decode.  Field names AND
    types are checked against the canonical documents schema before
    any row is emitted — a foreign or type-skewed IPC file fails
    loudly instead of surfacing later as a silent cast."""
    cols = [n for n, _ in DOC_FIELDS]
    spec = list(_ARROW_SCHEMA_SPEC)

    def decode(batches):
        import pandas as _pd
        import pyarrow as _pa
        import pyarrow.ipc as _ipc

        want = _pa.schema([(n, getattr(_pa, t)()) for n, t in spec])
        for pdf in batches:
            for content in pdf["content"]:
                reader = _ipc.open_file(_pa.BufferReader(bytes(content)))
                table = reader.read_all()
                got = list(table.schema.names)
                if got != cols:
                    raise ValueError(
                        f"unexpected IPC schema: {got} (want {cols})"
                    )
                if table.schema != want:
                    raise ValueError(
                        f"unexpected IPC schema types: {table.schema} "
                        f"(want {want})"
                    )
                yield table.to_pandas()

    return (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.arrow")
        .load(path)
        .select("content")
        .mapInPandas(decode, schema=DOCUMENTS_DDL)
    )

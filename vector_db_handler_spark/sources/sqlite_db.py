"""SQLite source/sink for the documents relation — the UNIVERSAL
interchange edge next to Avro OCF (`sources/avro.py`) and Arrow IPC
(`sources/arrow_ipc.py`).

SQLite database files are how an enormous amount of real-world data
arrives (app exports, annotation tools, scraped corpora shipped as
`.db`/`.sqlite`), and Python ships the codec in the standard library
— so, like the other connector-less formats here, no jar and no
pip install: the same distributed shape (one ``binaryFile`` task per
file → in-task stdlib decode → Arrow batches out; writes go
executor-side via ``mapInPandas`` with atomic per-file rename and the
driver sees only the per-file manifest).

The in-task codec uses ``sqlite3.Connection.serialize()`` /
``deserialize()`` (Python ≥ 3.11): a database file's bytes never
touch local disk on the read side — ``binaryFile`` hands the blob to
``deserialize`` and rows come out of an ordinary SELECT.  The read
enforces the canonical documents schema (table name, column names
AND declared types) so a foreign database fails loudly instead of
mis-mapping columns — the same stance as the Avro/XML/Arrow readers.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from vector_db_handler_spark.sources.avro import DOC_FIELDS, DOCUMENTS_DDL

#: Canonical SQLite DDL for the documents table — the one schema
#: every part file must carry (INTEGER for long, TEXT for string).
_SQLITE_TYPES = {"long": "INTEGER", "string": "TEXT"}
_TABLE = "documents"
_SCHEMA_SPEC: list[tuple[str, str]] = [
    (n, _SQLITE_TYPES[t]) for n, t in DOC_FIELDS
]


def write_documents_sqlite(docs: DataFrame, path: str) -> int:
    """Export the documents relation as a directory of SQLite
    database files, one per non-empty partition, written
    executor-side under the canonical DDL.  Returns the total row
    count (from the per-file manifest — the only thing the driver
    sees)."""
    os.makedirs(path, exist_ok=True)
    cols = [n for n, _ in DOC_FIELDS]
    spec = list(_SCHEMA_SPEC)

    def writer(batches):
        import os as _os
        import sqlite3 as _sq

        import pandas as _pd
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        parts = [pdf for pdf in batches if len(pdf)]
        if parts:
            pdf = _pd.concat(parts, ignore_index=True)
            con = _sq.connect(":memory:")
            ddl = ", ".join(f'"{n}" {t}' for n, t in spec)
            con.execute(f'CREATE TABLE "{_TABLE}" ({ddl})')
            ph = ", ".join("?" for _ in spec)
            rows = (
                tuple(None if _pd.isna(v) else v for v in row)
                for row in pdf.itertuples(index=False, name=None)
            )
            con.executemany(f'INSERT INTO "{_TABLE}" VALUES ({ph})', rows)
            con.commit()
            blob = con.serialize()
            con.close()
            fname = _os.path.join(path, f"part-{pid:05d}.sqlite")
            tmp = fname + ".tmp"
            with open(tmp, "wb") as fh:
                fh.write(blob)
            _os.replace(tmp, fname)  # atomic per-file commit
            yield _pd.DataFrame({"file": [fname], "n_rows": [len(pdf)]})

    manifest = docs.select(cols).mapInPandas(
        writer, schema="file string, n_rows long"
    )
    return sum(r["n_rows"] for r in manifest.collect())


def read_documents_sqlite(spark: SparkSession, path: str) -> DataFrame:
    """Distributed SQLite read: ``binaryFile`` scan (one task per
    file) → in-task ``deserialize`` → SELECT.  Table presence plus
    column names AND declared types are checked against the
    canonical documents schema before any row is emitted."""
    cols = [n for n, _ in DOC_FIELDS]
    spec = list(_SCHEMA_SPEC)

    def decode(batches):
        import sqlite3 as _sq

        import pandas as _pd

        for pdf in batches:
            for content in pdf["content"]:
                con = _sq.connect(":memory:")
                con.deserialize(bytes(content))
                info = con.execute(
                    f'PRAGMA table_info("{_TABLE}")'
                ).fetchall()
                got = [(r[1], r[2]) for r in info]
                if got != spec:
                    raise ValueError(
                        f"unexpected SQLite schema: {got} (want {spec})"
                    )
                sel = ", ".join(f'"{c}"' for c in cols)
                rows = con.execute(
                    f'SELECT {sel} FROM "{_TABLE}"'
                ).fetchall()
                con.close()
                out = _pd.DataFrame(rows, columns=cols)
                # pandas turns INTEGER columns with NULLs into float;
                # object-typed columns keep None and round-trip as
                # proper SQL NULLs through Arrow.
                for c, t in spec:
                    if t == "INTEGER":
                        out[c] = out[c].astype("object")
                yield out

    return (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.sqlite")
        .load(path)
        .select("content")
        .mapInPandas(decode, schema=DOCUMENTS_DDL)
    )

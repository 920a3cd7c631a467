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
    int_idx = [i for i, (_, t) in enumerate(spec) if t == "INTEGER"]

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
            # INTEGER columns arrive as decimal strings (see the
            # select below) — parse back to exact Python ints here.
            int_set = set(int_idx)
            rows = (
                tuple(
                    None
                    if v is None or (isinstance(v, float) and _pd.isna(v))
                    else (int(v) if i in int_set else v)
                    for i, v in enumerate(row)
                )
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

    from pyspark.sql import functions as F

    # Arrow hands a nullable long column to pandas as float64, which
    # silently corrupts |v| > 2^53 (r12 ADVICE).  Ship INTEGER columns
    # as decimal strings through the Arrow hop instead — CAST(long AS
    # STRING) is exact — and re-parse in the writer.
    shipped = docs.select(
        [
            F.col(n).cast("string").alias(n) if t == "INTEGER" else F.col(n)
            for n, t in spec
        ]
    )
    manifest = shipped.mapInPandas(writer, schema="file string, n_rows long")
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
                # Build object-dtype columns DIRECTLY from the row
                # tuples: pd.DataFrame(rows) would coerce an INTEGER
                # column containing a NULL to float64 first, silently
                # corrupting |v| > 2^53 before any astype repair
                # (r12 ADVICE).  Object columns keep exact Python
                # ints and None, and Arrow re-infers int64 + nulls.
                yield _pd.DataFrame(
                    {
                        c: _pd.Series(
                            [r[i] for r in rows], dtype="object"
                        )
                        for i, c in enumerate(cols)
                    }
                )

    return (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.sqlite")
        .load(path)
        .select("content")
        .mapInPandas(decode, schema=DOCUMENTS_DDL)
    )

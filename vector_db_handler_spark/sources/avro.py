"""Avro OCF (Object Container File) source/sink for the documents
relation — pure stdlib, no ``spark-avro`` connector.

This container ships Spark without the ``avro`` datasource jar
(``.format("avro")`` raises AnalysisException), and the environment
forbids installs.  Rather than leave the interchange format
uncovered, ingest it the way Spark handles ANY connector-less format
at scale: a distributed ``binaryFile`` scan fans the files across
executors and an Arrow-batched decode pass turns each OCF's blocks
into rows — the same one-Python-hop shape as the media decoders
(``operators/media.py``).  Files are the parallelism unit, which
matches how Avro lands in practice (one OCF per upstream writer
task — Kafka Connect / Flink / Hive layouts); splitting a single
huge OCF on its 16-byte sync markers is the documented next step and
needs only a framed-chunk reader, not a format change.

Wire format implemented from the public Avro 1.12 spec
(container file + binary encoding): magic ``Obj\\x01``, metadata map
(``avro.schema`` JSON, ``avro.codec``), 16-byte sync marker, then
blocks of ``(row_count, byte_size, rows..., sync)``; scalars are
zigzag varints, strings length-prefixed UTF-8, nullable fields the
union ``["null", T]`` with a branch index.  ``null`` and ``deflate``
codecs supported on read; writes use ``null`` (parquet is the
compressed path here — OCF is the interchange edge).

The codec lives in a factory of NESTED closures
(``make_stdlib_decoder`` pattern, ``operators/media.py:184``):
cloudpickle ships nested functions by VALUE, so the executor kernels
need no repo module on their ``sys.path``.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

#: Fixed documents schema (the fixture relation), every field nullable
#: via the Avro union idiom.
DOC_FIELDS = [
    ("doc_id", "long"),
    ("text", "string"),
    ("lang", "string"),
    ("source", "string"),
    ("n_chars", "long"),
]

DOCUMENTS_DDL = "doc_id long, text string, lang string, source string, n_chars long"


def _make_codec():
    """(encode_file, decode_ocf) as SELF-CONTAINED nested closures —
    only plain-data captures (field list, byte literals), stdlib
    imports inside — so they pickle by value into executors."""
    import json as _json

    fields = list(DOC_FIELDS)
    magic = b"Obj\x01"
    sync = bytes(range(16))  # fixed marker: deterministic files, spec-legal
    schema_json = _json.dumps(
        {
            "type": "record",
            "name": "Document",
            "fields": [{"name": n, "type": ["null", t]} for n, t in fields],
        },
        separators=(",", ":"),
    )

    def enc_long(n: int) -> bytes:
        z = (n << 1) ^ (n >> 63)
        out = bytearray()
        while True:
            b = z & 0x7F
            z >>= 7
            if z:
                out.append(b | 0x80)
            else:
                out.append(b)
                return bytes(out)

    def enc_str(s: str) -> bytes:
        raw = s.encode("utf-8")
        return enc_long(len(raw)) + raw

    def dec_long(buf: bytes, pos: int) -> tuple:
        shift = acc = 0
        while True:
            b = buf[pos]
            pos += 1
            acc |= (b & 0x7F) << shift
            if not b & 0x80:
                break
            shift += 7
        return (acc >> 1) ^ -(acc & 1), pos

    def dec_str(buf: bytes, pos: int) -> tuple:
        n, pos = dec_long(buf, pos)
        return buf[pos : pos + n].decode("utf-8"), pos + n

    def encode_file(rows, codec: str = "null") -> bytes:
        """One complete OCF: header + one block (the writer emits one
        file per Spark partition, so per-file framing stays trivial)."""
        import io as _io
        import zlib as _zlib

        fh = _io.BytesIO()
        fh.write(magic)
        meta = {"avro.schema": schema_json, "avro.codec": codec}
        fh.write(enc_long(len(meta)))
        for k, v in sorted(meta.items()):
            fh.write(enc_str(k))
            fh.write(enc_str(v))
        fh.write(enc_long(0))  # map terminator
        fh.write(sync)
        if rows:
            out = bytearray()
            for row in rows:
                for (name, typ), val in zip(fields, row):
                    if val is None:
                        out += enc_long(0)  # union branch 0: null
                        continue
                    out += enc_long(1)  # union branch 1: the value
                    out += (
                        enc_long(int(val))
                        if typ == "long"
                        else enc_str(str(val))
                    )
            body = bytes(out)
            if codec == "deflate":
                body = _zlib.compress(body)[2:-4]  # raw deflate per spec
            fh.write(enc_long(len(rows)))
            fh.write(enc_long(len(body)))
            fh.write(body)
            fh.write(sync)
        return fh.getvalue()

    def decode_ocf(data: bytes) -> list:
        """All rows of one OCF byte string (header validated, every
        block walked, sync markers checked — a torn file fails loudly
        instead of yielding a silent prefix)."""
        import json as _json2
        import zlib as _zlib

        if data[:4] != magic:
            raise ValueError("not an Avro object container file (bad magic)")
        pos = 4
        meta = {}
        while True:
            count, pos = dec_long(data, pos)
            if count == 0:
                break
            if count < 0:  # spec: negative count is followed by byte size
                _, pos = dec_long(data, pos)
                count = -count
            for _ in range(count):
                k, pos = dec_str(data, pos)
                v, pos = dec_str(data, pos)
                meta[k] = v
        schema = _json2.loads(meta["avro.schema"])
        names = [f["name"] for f in schema.get("fields", [])]
        if names != [n for n, _ in fields]:
            raise ValueError(f"unexpected Avro schema fields: {names}")
        codec = meta.get("avro.codec", "null")
        if codec not in ("null", "deflate"):
            raise ValueError(f"unsupported Avro codec: {codec}")
        fsync = data[pos : pos + 16]
        pos += 16
        rows = []
        while pos < len(data):
            n, pos = dec_long(data, pos)
            size, pos = dec_long(data, pos)
            body = data[pos : pos + size]
            pos += size
            if codec == "deflate":
                body = _zlib.decompressobj(-15).decompress(body)
            bpos = 0
            for _ in range(n):
                vals = []
                for fname, typ in fields:
                    branch, bpos = dec_long(body, bpos)
                    if branch == 0:
                        vals.append(None)
                    elif typ == "long":
                        v, bpos = dec_long(body, bpos)
                        vals.append(v)
                    else:
                        v, bpos = dec_str(body, bpos)
                        vals.append(v)
                rows.append(vals)
            if data[pos : pos + 16] != fsync:
                raise ValueError("sync marker mismatch (torn block)")
            pos += 16
        return rows

    return encode_file, decode_ocf


#: Driver-side/test handles; executor kernels capture these closure
#: objects and cloudpickle ships them by value (nested qualnames are
#: not importable, so reference pickling is impossible).
encode_ocf, decode_ocf = _make_codec()


def write_documents_avro(docs: DataFrame, path: str) -> int:
    """Export the documents relation as a directory of OCF files, one
    per partition, written executor-side (every Spark sink writes
    from tasks; a shared filesystem is the cluster contract).  The
    driver collects only the per-file manifest (file, n_rows) —
    returns the total row count."""
    os.makedirs(path, exist_ok=True)
    cols = [n for n, _ in DOC_FIELDS]
    enc = encode_ocf  # closure capture → pickled by value

    def writer(batches):
        import os as _os

        import pandas as _pd
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        rows = []
        for pdf in batches:
            for tup in pdf.itertuples(index=False, name=None):
                rows.append(tuple(None if _pd.isna(v) else v for v in tup))
        if rows:
            fname = _os.path.join(path, f"part-{pid:05d}.avro")
            tmp = fname + ".tmp"
            with open(tmp, "wb") as fh:
                fh.write(enc(rows))
            _os.replace(tmp, fname)  # atomic per-file commit
            yield _pd.DataFrame({"file": [fname], "n_rows": [len(rows)]})

    manifest = docs.select(cols).mapInPandas(
        writer, schema="file string, n_rows long"
    )
    return sum(r["n_rows"] for r in manifest.collect())


def read_documents_avro(spark: SparkSession, path: str) -> DataFrame:
    """Distributed OCF read: ``binaryFile`` scan (one task per file)
    → stdlib block decode per file in one Arrow-batched pass.  The
    schema is enforced by the decoder (field-name check), so a
    foreign OCF fails loudly instead of mis-mapping columns."""
    dec = decode_ocf  # closure capture → pickled by value
    cols = [n for n, _ in DOC_FIELDS]

    def decode(batches):
        import pandas as _pd

        for pdf in batches:
            for content in pdf["content"]:
                yield _pd.DataFrame(dec(bytes(content)), columns=cols)

    return (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.avro")
        .load(path)
        .select("content")
        .mapInPandas(decode, schema=DOCUMENTS_DDL)
    )

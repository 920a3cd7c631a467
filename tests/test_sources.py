"""Ingest-edge properties: ORC predicate pushdown, CSV quarantine
semantics (oracle parity for the roundtrip queries runs automatically
in test_oracle_queries.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from vector_db_handler_spark.sources import csv as csv_src
from vector_db_handler_spark.sources import orc as orc_src
from vector_db_handler_spark.sources.tables import load_table


def test_orc_filter_pushdown(spark, sf_dir, tmp_path):
    """The language predicate must reach the ORC scan (PushedFilters),
    not run as a post-scan filter over full stripes."""
    path = str(tmp_path / "docs_orc")
    orc_src.write_documents_orc(load_table(spark, sf_dir, "documents"), path)
    df = orc_src.read_documents_orc(spark, path).filter(F.col("lang") == "en")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [" in plan and "lang" in plan.split("PushedFilters:")[1][:120], plan


def test_orc_roundtrip_lossless(spark, sf_dir, tmp_path):
    path = str(tmp_path / "docs_orc2")
    docs = load_table(spark, sf_dir, "documents")
    orc_src.write_documents_orc(docs, path)
    back = orc_src.read_documents_orc(spark, path)
    a = sorted((r.doc_id, r.text) for r in docs.select("doc_id", "text").collect())
    b = sorted((r.doc_id, r.text) for r in back.select("doc_id", "text").collect())
    assert a == b


def test_csv_quarantine_splits_exactly(spark, tmp_path):
    """Type-mismatch and arity-mismatch rows land in the corrupt lane
    with the raw line preserved; valid rows parse fully."""
    src = tmp_path / "drop"
    src.mkdir()
    (src / "a.csv").write_text(
        "1,hello,en,web,5\n"
        "oops,bad,en,web,3\n"
        "2,world,de,web,5\n"
        "!!!\n"
    )
    df = csv_src.read_documents_csv(spark, str(src))
    valid = df.filter(F.col(csv_src.CORRUPT_COL).isNull())
    corrupt = df.filter(F.col(csv_src.CORRUPT_COL).isNotNull())
    assert sorted(r.doc_id for r in valid.collect()) == [1, 2]
    raw = sorted(r[csv_src.CORRUPT_COL] for r in corrupt.collect())
    assert raw == ["!!!", "oops,bad,en,web,3"]
    df.unpersist()


# -- Avro OCF edge (sources/avro.py: pure-stdlib codec) ----------------------


def test_avro_roundtrip_lossless(spark, sf_dir, tmp_path):
    """Full-corpus write→read through the stdlib OCF codec preserves
    every row and value (including multi-partition layouts: one file
    per partition)."""
    from vector_db_handler_spark.sources import avro as avro_src

    docs = load_table(spark, sf_dir, "documents").repartition(3)
    path = str(tmp_path / "avro")
    n = avro_src.write_documents_avro(docs, path)
    back = avro_src.read_documents_avro(spark, path)
    assert n == docs.count() == back.count()
    a = sorted(map(tuple, docs.collect()))
    b = sorted(map(tuple, back.select(*docs.columns).collect()))
    assert a == b


def test_avro_nulls_roundtrip(spark, tmp_path):
    """Nullable union encoding: null fields come back as nulls, not
    'None' strings or zeros."""
    from vector_db_handler_spark.sources import avro as avro_src

    rows = [(1, None, "en", None, 5), (2, "text", None, "s", None)]
    df = spark.createDataFrame(rows, avro_src.DOCUMENTS_DDL)
    path = str(tmp_path / "nulls")
    avro_src.write_documents_avro(df, path)
    got = sorted(map(tuple, avro_src.read_documents_avro(spark, path).collect()))
    assert got == sorted(rows)


def test_avro_torn_file_fails_loudly(tmp_path):
    """A truncated block or corrupted sync marker raises instead of
    yielding a silent row prefix — the property that matters when a
    writer died mid-file."""
    import pytest

    from vector_db_handler_spark.sources import avro as avro_src

    blob = avro_src.encode_ocf([(1, "a", "en", "s", 1), (2, "b", "de", "s", 1)])
    with pytest.raises((ValueError, IndexError)):
        avro_src.decode_ocf(blob[:-8])  # truncated sync
    corrupted = blob[:-16] + bytes(16)  # wrong sync marker
    with pytest.raises(ValueError, match="sync"):
        avro_src.decode_ocf(corrupted)
    with pytest.raises(ValueError, match="magic"):
        avro_src.decode_ocf(b"PAR1" + blob[4:])


def test_avro_foreign_schema_rejected():
    """An OCF whose schema declares different field names fails the
    schema check instead of mis-mapping columns.  (The swap keeps the
    JSON byte length identical so the metadata map's length prefix
    stays valid — only the declared name changes.)"""
    import pytest

    from vector_db_handler_spark.sources import avro as avro_src

    blob = avro_src.encode_ocf([(1, "a", "en", "s", 1)])
    assert b'"doc_id"' in blob
    with pytest.raises(ValueError, match="schema fields"):
        avro_src.decode_ocf(blob.replace(b'"doc_id"', b'"dog_id"'))


def test_avro_deflate_codec_decodes():
    """Reader accepts spec deflate-coded blocks (raw DEFLATE, no zlib
    wrapper) even though our writer emits null-codec files."""
    from vector_db_handler_spark.sources import avro as avro_src

    rows = [(7, "x y z", "en", "s0", 5), (8, None, "de", "s1", 0)]
    blob = avro_src.encode_ocf(rows, codec="deflate")
    assert avro_src.decode_ocf(blob) == [list(r) for r in rows]


def test_xml_roundtrip_escapes_markup_characters(spark, tmp_path):
    """The fixture corpus is plain words, so the driver checksum alone
    would not catch a broken entity encoder — this plants text full of
    XML-hostile characters and requires byte-exact recovery."""
    from vector_db_handler_spark.sources import xml as xml_src

    rows = [
        (1, 'a < b && c > d "quoted" \'single\'', "en", "s0", 33),
        (2, "<doc>nested & markup</doc>", "de", "s1", 26),
        (3, "ampersand & entity &amp; literal", "en", "s0", 32),
    ]
    df = spark.createDataFrame(rows, xml_src.DOCUMENTS_XML_SCHEMA)
    path = str(tmp_path / "xmlrt")
    xml_src.write_documents_xml(df, path)
    back = {
        r.doc_id: (r.text, r.lang, r.source, r.n_chars)
        for r in xml_src.read_documents_xml(spark, path).collect()
    }
    assert back == {r[0]: (r[1], r[2], r[3], r[4]) for r in rows}

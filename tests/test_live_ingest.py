"""Live indexing: a document stream foreachBatch-ingested into the
tenant store must be searchable afterwards, and compaction must shrink
the file count without changing the data."""

from __future__ import annotations

import shutil

import pytest
from pyspark.sql import functions as F

from vector_db_handler_spark.pipeline import DocumentPipeline
from vector_db_handler_spark.store import PointsStore

DIM = 16
USER = "live"


@pytest.fixture()
def store(spark, tmp_path):
    s = PointsStore(spark, str(tmp_path / "pts"), vector_size=DIM)
    yield s
    shutil.rmtree(str(tmp_path / "pts"), ignore_errors=True)


def test_stream_ingest_then_search(spark, sf_dir, store, tmp_path):
    pipe = DocumentPipeline(store, dim=DIM)
    docs = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .limit(30)
        .select("doc_id", "text")
        .withColumn("chunk_id", F.lit(0))
        .withColumn("title", F.col("doc_id").cast("string"))
    )
    src = str(tmp_path / "src")
    docs.coalesce(1).write.mode("append").parquet(src)
    docs.coalesce(1).write.mode("append").parquet(src)  # second batch
    stream = (
        spark.readStream.schema("doc_id long, text string, chunk_id long, title string")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = pipe.stream_ingest(stream, USER)
    q.awaitTermination(120)

    # insert-only upsert semantics: two identical batches => 2x rows
    assert store.read_tenant(USER).count() == 60

    sample_text = docs.limit(1).collect()[0]["text"]
    hits = pipe.search_query(USER, sample_text, limit=3)
    assert hits and hits[0]["Similarity Score"] > 0.99


def test_compact_tenant_preserves_rows(spark, store):
    for i in range(4):  # four separate appends -> >= 4 files
        store.upsert_vectors(USER, [[float(i)] * DIM], [{"DocId": i, "ChunkId": 0, "Title": "t"}])
    before = store.read_tenant(USER).collect()
    fs, jvm = store._fs()
    part = store._partition_path(jvm, USER)
    n_files_before = len([s for s in fs.listStatus(part) if s.getPath().getName().endswith(".parquet")])
    assert n_files_before >= 4

    store.compact_tenant(USER, target_files=1)
    after = store.read_tenant(USER).collect()
    n_files_after = len([s for s in fs.listStatus(part) if s.getPath().getName().endswith(".parquet")])
    assert n_files_after == 1
    key = lambda r: r["point_id"]  # noqa: E731
    assert sorted(before, key=key) == sorted(after, key=key)

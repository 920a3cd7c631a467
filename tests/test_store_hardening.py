"""Store invariants beyond the golden scenario: vector-dim enforcement
at ingest (SURVEY §1.1 promise; reference fixes dim per collection at
``document_ingestor.py:73``/``:86``), None payload passthrough
(reference stores payloads as-is and ``payload.get`` yields None,
``:974-977``), and catalog ops running through the Hadoop FS API."""

from __future__ import annotations

import shutil

import pytest

from vector_db_handler_spark.pipeline import DocumentPipeline
from vector_db_handler_spark.store import PointsStore

DIM = 8


@pytest.fixture()
def store(spark, tmp_path):
    s = PointsStore(spark, str(tmp_path / "pts"), vector_size=DIM)
    yield s
    shutil.rmtree(str(tmp_path / "pts"), ignore_errors=True)


def test_wrong_dim_raises_at_ingest(store):
    with pytest.raises(ValueError, match="dim"):
        store.upsert_vectors("u", [[1.0] * (DIM + 1)], [{}])
    with pytest.raises(ValueError, match="dim"):
        store.upsert_vectors("u", [[1.0] * DIM, [2.0] * 3], [{}, {}])


def test_pipeline_dim_mismatch_raises(store):
    with pytest.raises(ValueError, match="vector_size"):
        DocumentPipeline(store, dim=DIM * 2)


def test_missing_payload_keys_stay_null(store):
    store.upsert_vectors("u", [[1.0] * DIM], [{"Extra": "kept"}])
    row = store.read_tenant("u").collect()[0]
    assert row["doc_id"] is None and row["chunk_id"] is None and row["title"] is None
    assert row["payload"] == {"Extra": "kept"}


def test_catalog_roundtrip_and_staged_rewrite(store):
    store.upsert_vectors("t-1", [[1.0] * DIM, [2.0] * DIM],
                         [{"DocId": 1, "ChunkId": 1, "Title": "a"},
                          {"DocId": 2, "ChunkId": 1, "Title": "b"}])
    store.upsert_vectors("t2", [[3.0] * DIM], [{"DocId": 9, "ChunkId": 0, "Title": "z"}])
    assert store.list_collections() == ["user_t2", "user_t_1"]  # mangled, leaked
    assert store.collection_exists("t-1") and not store.collection_exists("nope")

    store.delete_doc("t-1", 1)  # staged rewrite path
    remaining = store.read_tenant("t-1").collect()
    assert [r["doc_id"] for r in remaining] == [2]
    assert store.read_tenant("t2").count() == 1  # other tenant untouched
    # no staging junk left behind
    assert all(d.startswith("user_id=") for d in store._partition_dirs())

    store.truncate_collection("t-1")
    assert store.read_tenant("t-1").count() == 0
    assert "user_t_1" in store.list_collections()  # truncate keeps catalog entry

    store.drop_collection("t-1")
    assert store.list_collections() == ["user_t2"]


def test_rewrite_to_empty_keeps_collection(store):
    store.upsert_vectors("u", [[1.0] * DIM], [{"DocId": 5, "ChunkId": 0, "Title": "only"}])
    store.delete_doc("u", 5)  # deletes the only row -> truncate semantics
    assert store.read_tenant("u").count() == 0
    assert store.list_collections() == ["user_u"]

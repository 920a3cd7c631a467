"""End-to-end HTTP parity: the stdlib server must speak the reference's
wire protocol — same paths, verbs, request fields, defaults, response
bodies, and error statuses (reference ``app/api/routes.py:77-711``,
``app/api/schemas.py``)."""

from __future__ import annotations

import json
import shutil
import urllib.error
import urllib.request

import pytest

from vector_db_handler_spark.api import VectorDBApi
from vector_db_handler_spark.http_server import VectorDBServer
from vector_db_handler_spark.pipeline import DocumentPipeline
from vector_db_handler_spark.store import PointsStore

DIM = 16
USER = "http-user"


@pytest.fixture(scope="module")
def server(spark, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("http") / "points")
    api = VectorDBApi(DocumentPipeline(PointsStore(spark, root, vector_size=DIM), dim=DIM))
    srv = VectorDBServer(api).start()
    yield srv
    srv.stop()
    shutil.rmtree(root, ignore_errors=True)


def _call(server, method, path, body=None):
    host, port = server.address
    req = urllib.request.Request(
        f"http://{host}:{port}{path}",
        method=method,
        data=json.dumps(body).encode() if body is not None else None,
        headers={"Content-Type": "application/json"},
    )
    with urllib.request.urlopen(req) as resp:
        return resp.status, json.loads(resp.read())


def test_health(server):
    status, body = _call(server, "GET", "/")
    assert status == 200 and body == {"message": "Service is up and running"}


def test_upsert_search_scroll_delete_roundtrip(server):
    status, body = _call(
        server, "POST", "/upsert_data/",
        {"user_id": USER, "chunk": "hello vector world",
         "metadata": {"DocId": 1, "ChunkId": 1, "Title": "greeting"}},
    )
    assert status == 200 and body["message"] == "Data upserted successfully"

    status, body = _call(
        server, "POST", "/search_query/", {"user_id": USER, "query": "hello vector world"}
    )
    assert status == 200
    top = body["Results"][0]
    assert top["DocId"] == 1 and top["Similarity Score"] > 0.99

    status, body = _call(
        server, "POST", "/scroll_user_collection/", {"user_id": USER}
    )
    assert status == 200 and len(body["Results"]) == 1
    assert set(body["Results"][0]) == {"DocId", "ChunkId", "Title"}

    status, body = _call(server, "DELETE", "/delete_doc/", {"user_id": USER, "doc_id": 1})
    assert status == 200
    status, body = _call(server, "POST", "/scroll_user_collection/", {"user_id": USER})
    assert body["Results"] == []


def test_unknown_route_404(server):
    with pytest.raises(urllib.error.HTTPError) as e:
        _call(server, "GET", "/nope/")
    assert e.value.code == 404


def test_missing_field_422(server):
    with pytest.raises(urllib.error.HTTPError) as e:
        _call(server, "POST", "/search_query/", {"user_id": USER})  # no "query"
    assert e.value.code == 422


def test_processor_error_500(server):
    # length-mismatched lists -> ValueError in the pipeline -> HTTP 500,
    # like the reference's embed-failure path (routes.py + :668-673).
    with pytest.raises(urllib.error.HTTPError) as e:
        _call(server, "POST", "/upsert_list_data/",
              {"user_id": USER, "chunks": ["a", "b"], "metadatas": [{}]})
    assert e.value.code == 500


def test_catalog_endpoint(server):
    status, body = _call(server, "GET", "/list_users_collection/")
    assert status == 200 and body == {"Collections": ["user_http_user"]}

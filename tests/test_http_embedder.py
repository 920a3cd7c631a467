"""Parity tests for the pluggable HTTP-embedder adapter
(``http_embedder.py``) against a local stub vectorizer speaking the
reference's wire format (``app/core/document_ingestor.py:605-673``):
JSON-string-encoded vector fields, 200-only success, 5-attempt retry,
ValueError after exhaustion.
"""

from __future__ import annotations

import json
import threading
from http.server import BaseHTTPRequestHandler, HTTPServer

import pytest

from vector_db_handler_spark.http_embedder import (
    HttpEmbedder,
    with_http_embeddings,
)


class _StubVectorizer(BaseHTTPRequestHandler):
    """Reference-wire-format stub: deterministic 4-dim vectors
    (len(text), first-byte, last-byte, 1.0), JSON-STRING-encoded in the
    response field like the real service. ``fail_first`` makes the
    first N requests return 500 to exercise the retry loop."""

    fail_first = 0
    request_count = 0

    def do_POST(self):  # noqa: N802
        cls = type(self)
        cls.request_count += 1
        if cls.request_count <= cls.fail_first:
            self.send_response(500)
            self.end_headers()
            self.wfile.write(b"transient backend error")
            return
        n = int(self.headers.get("Content-Length", 0))
        payload = json.loads(self.rfile.read(n))

        def vec(t: str) -> list[float]:
            b = t.encode("utf-8")
            return [float(len(b)), float(b[0]) if b else 0.0,
                    float(b[-1]) if b else 0.0, 1.0]

        if self.path == "/vectorizer/string/":
            body = {"vectorized text": json.dumps(vec(payload["text"]))}
        elif self.path == "/vectorizer/list/":
            body = {
                "vectorized texts": json.dumps([vec(t) for t in payload["texts"]])
            }
        else:
            self.send_response(404)
            self.end_headers()
            return
        out = json.dumps(body).encode("utf-8")
        self.send_response(200)
        self.send_header("Content-Type", "application/json")
        self.send_header("Content-Length", str(len(out)))
        self.end_headers()
        self.wfile.write(out)

    def log_message(self, *a):  # silence test output
        pass


@pytest.fixture()
def stub_server():
    _StubVectorizer.fail_first = 0
    _StubVectorizer.request_count = 0
    srv = HTTPServer(("127.0.0.1", 0), _StubVectorizer)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield srv.server_address[1]
    srv.shutdown()
    srv.server_close()


def _expected(t: str) -> list[float]:
    b = t.encode("utf-8")
    return [float(len(b)), float(b[0]), float(b[-1]), 1.0]


def test_embed_text_json_string_decoding(stub_server):
    emb = HttpEmbedder("127.0.0.1", stub_server, timeout=5)
    assert emb.embed_text("hello") == _expected("hello")
    assert _StubVectorizer.request_count == 1


def test_embed_texts_batch(stub_server):
    emb = HttpEmbedder("127.0.0.1", stub_server, timeout=5)
    got = emb.embed_texts(["a", "bc", "def"])
    assert got == [_expected("a"), _expected("bc"), _expected("def")]


def test_retries_then_succeeds(stub_server):
    """4 failures + 1 success fits inside the reference's 5 attempts."""
    _StubVectorizer.fail_first = 4
    emb = HttpEmbedder("127.0.0.1", stub_server, timeout=5)
    assert emb.embed_text("x") == _expected("x")
    assert _StubVectorizer.request_count == 5


def test_five_failures_raises_valueerror(stub_server):
    """The 5th failure exhausts the budget: ValueError carrying the
    last response text, exactly one attempt past the recoverable case."""
    _StubVectorizer.fail_first = 5
    emb = HttpEmbedder("127.0.0.1", stub_server, timeout=5)
    with pytest.raises(ValueError, match="transient backend error"):
        emb.embed_text("x")
    assert _StubVectorizer.request_count == 5


def test_connection_refused_raises_valueerror():
    emb = HttpEmbedder("127.0.0.1", 1, timeout=0.2)  # nothing listens on :1
    with pytest.raises(ValueError, match="Failed to vectorize"):
        emb.embed_text("x")


def test_with_http_embeddings_mapinpandas(spark, stub_server):
    """The Spark seam: one /vectorizer/list/ call per Arrow batch, same
    schema contract as embedder.with_embeddings."""
    df = spark.createDataFrame(
        [(1, "alpha"), (2, "bz")], "doc_id long, text string"
    ).coalesce(1)
    out = with_http_embeddings(df, "127.0.0.1", stub_server, timeout=5)
    assert out.schema["embedding"].dataType.simpleString() == "array<float>"
    rows = {r.doc_id: list(r.embedding) for r in out.collect()}
    assert rows[1] == _expected("alpha")
    assert rows[2] == _expected("bz")
    # single partition, single Arrow batch -> exactly one HTTP request
    assert _StubVectorizer.request_count == 1

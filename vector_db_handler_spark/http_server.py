"""Actual HTTP server over the 18-endpoint parity surface.

The reference serves ``app/api/routes.py`` with FastAPI; this container
has no web framework, so the same routes are served with the stdlib
``http.server`` (threaded).  Routing, method verbs, request field
names, defaults, and response bodies mirror the reference 1:1:

* route table — ``routes.py:77-711`` (paths and verbs extracted above
  each handler)
* request fields/defaults — ``app/api/schemas.py`` (e.g. metadata
  default ``{DocId: 0, ChunkId: 0, Title: 'string'}`` ``schemas.py:7-11``,
  search ``limit=5`` ``:57``, scroll ``limit=20`` ``:68,74,79,83``)
* error shape — unhandled processor errors surface as HTTP 500, like
  FastAPI's behavior on the reference's ``ValueError`` after 5 embed
  retries (``routes.py`` + ``document_ingestor.py:668-673``)

Note the reference's handlers are ``async def`` over fully blocking
clients — no real concurrency (``routes.py:471-497``); the threaded
stdlib server is therefore not a downgrade.  The Spark driver is the
process hosting the server; on a cluster this service would run on the
driver node (same topology as the reference's single app container).
"""

from __future__ import annotations

import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

from vector_db_handler_spark.api import VectorDBApi


def _routes(api: VectorDBApi) -> dict[tuple[str, str], callable]:
    """(method, path) → handler(body_dict) -> response_dict."""
    return {
        ("GET", "/"): lambda b: api.health(),
        ("POST", "/upsert_data/"): lambda b: api.upsert_data(
            b["user_id"], b["chunk"], b.get("metadata")
        ),
        ("POST", "/upsert_list_data/"): lambda b: api.upsert_list_data(
            b["user_id"], b["chunks"], b["metadatas"]
        ),
        ("DELETE", "/delete_doc/"): lambda b: api.delete_doc(b["user_id"], b["doc_id"]),
        ("DELETE", "/delete_doc_by_title/"): lambda b: api.delete_doc_by_title(
            b["user_id"], b["doc_title"]
        ),
        ("DELETE", "/delete_chunk/"): lambda b: api.delete_chunk(
            b["user_id"], b["doc_id"], b["chunk_id"]
        ),
        ("DELETE", "/delete_chunk_by_id/"): lambda b: api.delete_chunk_by_id(
            b["user_id"], b["vector_id"]
        ),
        ("DELETE", "/delete_chunk_list_by_id/"): lambda b: api.delete_chunk_list_by_id(
            b["user_id"], b["vector_ids"]
        ),
        ("DELETE", "/delete_user_collection_data/"): lambda b: api.delete_user_collection_data(
            b["user_id"]
        ),
        ("DELETE", "/delete_user_collection/"): lambda b: api.delete_user_collection(
            b["user_id"]
        ),
        ("PUT", "/update_data/"): lambda b: api.update_data(
            b["user_id"], b["chunk"], b["doc_id"], b["chunk_id"]
        ),
        ("POST", "/search_query/"): lambda b: api.search_query(
            b["user_id"], b["query"], b.get("limit", 5)
        ),
        ("POST", "/search_query_on_doc/"): lambda b: api.search_query_on_doc(
            b["user_id"], b["doc_ids"], b["query"], b.get("limit", 5)
        ),
        ("POST", "/scroll_user_collection/"): lambda b: api.scroll_user_collection(
            b["user_id"], b.get("limit", 20)
        ),
        ("POST", "/scroll_user_doc/"): lambda b: api.scroll_user_doc(
            b["user_id"], b["doc_id"], b.get("limit", 20)
        ),
        ("POST", "/scroll_user_chunk/"): lambda b: api.scroll_user_chunk(
            b["user_id"], b["doc_id"], b["chunk_id"], b.get("limit", 20)
        ),
        ("POST", "/scroll_user_docs/"): lambda b: api.scroll_user_docs(
            b["user_id"], b["doc_ids"], b.get("limit", 20)
        ),
        ("GET", "/list_users_collection/"): lambda b: api.list_users_collection(),
    }


class VectorDBServer:
    """Threaded HTTP server hosting the parity surface.

    ``port=0`` binds an ephemeral port (tests); the reference deploys
    on :8080 inside its container (``Dockerfile:26-28``).
    """

    def __init__(self, api: VectorDBApi, host: str = "127.0.0.1", port: int = 0):
        routes = _routes(api)
        # ThreadingHTTPServer dispatches concurrently, but the store's
        # mutations are multi-step (read → stage → delete+rename swap):
        # two unserialized writers lose updates, and a reader can hit a
        # missing file mid-swap.  The reference's ``async def`` handlers
        # over blocking clients run one request at a time, so a single
        # store-wide lock reproduces its consistency exactly (reads
        # included — they scan the swapped files).
        store_lock = threading.Lock()

        class Handler(BaseHTTPRequestHandler):
            def log_message(self, *args):  # silence per-request stderr noise
                pass

            def _dispatch(self, method: str) -> None:
                handler = routes.get((method, self.path))
                if handler is None:
                    self._send(404, {"detail": "Not Found"})
                    return
                try:
                    length = int(self.headers.get("Content-Length") or 0)
                    body = json.loads(self.rfile.read(length)) if length else {}
                    with store_lock:
                        result = handler(body)
                    self._send(200, result)
                except (KeyError, TypeError, json.JSONDecodeError) as e:
                    # FastAPI's pydantic validation analog.
                    self._send(422, {"detail": f"invalid request: {e}"})
                except Exception as e:  # reference: processor errors → 500
                    self._send(500, {"detail": str(e)})

            def _send(self, status: int, payload: dict) -> None:
                data = json.dumps(payload).encode("utf-8")
                self.send_response(status)
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(data)))
                self.end_headers()
                self.wfile.write(data)

            def do_GET(self):
                self._dispatch("GET")

            def do_POST(self):
                self._dispatch("POST")

            def do_PUT(self):
                self._dispatch("PUT")

            def do_DELETE(self):
                self._dispatch("DELETE")

        self._server = ThreadingHTTPServer((host, port), Handler)
        self._thread: threading.Thread | None = None

    @property
    def address(self) -> tuple[str, int]:
        return self._server.server_address

    def start(self) -> "VectorDBServer":
        self._thread = threading.Thread(target=self._server.serve_forever, daemon=True)
        self._thread.start()
        return self

    def stop(self) -> None:
        self._server.shutdown()
        self._server.server_close()
        if self._thread:
            self._thread.join(timeout=5)

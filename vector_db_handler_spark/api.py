"""HTTP-endpoint parity layer (reference ``app/api/routes.py`` — 18
endpoints, each a thin wrapper: validate → call the processor → wrap in
a JSON-shaped dict).  No web framework needed for the driver checks;
this module keeps the surface 1:1 so a reference user can map every
endpoint to a function, with the reference's defaults
(``app/api/schemas.py``) and response bodies.
"""

from __future__ import annotations

from collections.abc import Sequence

from vector_db_handler_spark.pipeline import DocumentPipeline

#: Reference defaults: metadata (schemas.py:7-11), search limit
#: (schemas.py:57), scroll limit (schemas.py:68,74,79,83).
DEFAULT_METADATA = {"DocId": 0, "ChunkId": 0, "Title": "string"}
DEFAULT_SEARCH_LIMIT = 5
DEFAULT_SCROLL_LIMIT = 20


class VectorDBApi:
    """One instance per service (the reference builds one global
    ``DocumentProcessor`` in a lifespan hook, routes.py:31-68)."""

    def __init__(self, pipeline: DocumentPipeline):
        self.pipeline = pipeline

    # GET / (routes.py:77-100)
    def health(self) -> dict:
        return {"message": "Service is up and running"}

    # POST /upsert_data/ (routes.py:103-141)
    def upsert_data(self, user_id: str, chunk: str, metadata: dict | None = None) -> dict:
        metadata = dict(DEFAULT_METADATA if metadata is None else metadata)
        self.pipeline.upsert_string(user_id, chunk, dict(metadata))
        return {"message": "Data upserted successfully", "metadata": metadata}

    # POST /upsert_list_data/ (routes.py:144-183)
    def upsert_list_data(
        self, user_id: str, chunks: Sequence[str], metadatas: Sequence[dict]
    ) -> dict:
        self.pipeline.upsert_str_list(user_id, list(chunks), [dict(m) for m in metadatas])
        return {"message": "Data upserted successfully"}

    # DELETE /delete_doc/ (routes.py:186-217)
    def delete_doc(self, user_id: str, doc_id: int) -> dict:
        self.pipeline.delete_doc(user_id, doc_id)
        return {"message": "Document deleted successfully"}

    # DELETE /delete_doc_by_title/ (routes.py:220-251)
    def delete_doc_by_title(self, user_id: str, doc_title: str) -> dict:
        self.pipeline.delete_doc_by_title(user_id, doc_title)
        return {"message": "Document deleted successfully"}

    # DELETE /delete_chunk/ (routes.py:254-288)
    def delete_chunk(self, user_id: str, doc_id: int, chunk_id: int) -> dict:
        self.pipeline.delete_chunk(user_id, doc_id, chunk_id)
        return {"message": "Chunk deleted successfully"}

    # DELETE /delete_chunk_by_id/ (routes.py:290-321)
    def delete_chunk_by_id(self, user_id: str, vector_id: str) -> dict:
        self.pipeline.delete_by_id(user_id, vector_id)
        return {"message": "Chunk deleted successfully"}

    # DELETE /delete_chunk_list_by_id/ (routes.py:323-354)
    def delete_chunk_list_by_id(self, user_id: str, vector_ids: Sequence[str]) -> dict:
        self.pipeline.delete_list_by_id(user_id, list(vector_ids))
        return {"message": "Chunks deleted successfully"}

    # DELETE /delete_user_collection_data/ (routes.py:356-386)
    def delete_user_collection_data(self, user_id: str) -> dict:
        self.pipeline.delete_user_collection_data(user_id)
        return {"message": "Collection data deleted successfully"}

    # DELETE /delete_user_collection/ (routes.py:389-418)
    def delete_user_collection(self, user_id: str) -> dict:
        self.pipeline.delete_user_collection(user_id)
        return {"message": "Collection deleted successfully"}

    # PUT /update_data/ (routes.py:421-462)
    def update_data(self, user_id: str, chunk: str, doc_id: int, chunk_id: int) -> dict:
        self.pipeline.update_chunk(user_id, chunk, doc_id, chunk_id)
        return {"message": "Data updated successfully"}

    # POST /search_query/ (routes.py:465-502) — score_threshold is NOT
    # exposed over HTTP (stays 0, routes.py:493-497).
    def search_query(self, user_id: str, query: str, limit: int = DEFAULT_SEARCH_LIMIT) -> dict:
        return {"Results": self.pipeline.search_query(user_id, query, limit)}

    # POST /search_query_on_doc/ (routes.py:505-546)
    def search_query_on_doc(
        self, user_id: str, doc_ids: Sequence[int], query: str, limit: int = DEFAULT_SEARCH_LIMIT
    ) -> dict:
        return {"Results": self.pipeline.search_query_on_doc(user_id, list(doc_ids), query, limit)}

    # POST /scroll_user_collection/ (routes.py:549-579)
    def scroll_user_collection(self, user_id: str, limit: int = DEFAULT_SCROLL_LIMIT) -> dict:
        return {"Results": self.pipeline.scroll_user_collection(user_id, limit)}

    # POST /scroll_user_doc/ (routes.py:581-615)
    def scroll_user_doc(
        self, user_id: str, doc_id: int, limit: int = DEFAULT_SCROLL_LIMIT
    ) -> dict:
        return {"Results": self.pipeline.scroll_user_doc(user_id, doc_id, limit)}

    # POST /scroll_user_chunk/ (routes.py:617-652)
    def scroll_user_chunk(
        self, user_id: str, doc_id: int, chunk_id: int, limit: int = DEFAULT_SCROLL_LIMIT
    ) -> dict:
        return {"Results": self.pipeline.scroll_user_chunk(user_id, doc_id, chunk_id, limit)}

    # POST /scroll_user_docs/ (routes.py:654-691)
    def scroll_user_docs(
        self, user_id: str, doc_ids: Sequence[int], limit: int = DEFAULT_SCROLL_LIMIT
    ) -> dict:
        return {"Results": self.pipeline.scroll_user_docs(user_id, list(doc_ids), limit)}

    # GET /list_users_collection/ (routes.py:693-711)
    def list_users_collection(self) -> dict:
        return {"Collections": self.pipeline.list_collections()}

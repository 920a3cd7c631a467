"""Document pipeline — the ``DocumentProcessor`` analog
(reference ``app/core/document_ingestor.py:571-1196``): embed text with
the deterministic embedder, delegate storage/search to
:class:`~vector_db_handler_spark.store.PointsStore`, and project results
into the reference's exact response shapes (SURVEY §2.4 invariant 6):

* search → ``{DocId, ChunkId, Title, "Similarity Score"}``
  (ref :972-979; missing payload keys → ``None`` via ``payload.get``);
* scroll collection → ``{DocId, ChunkId, Title}`` — NO VectorId
  (ref :1069-1075);
* scroll doc/chunk/docs → ``…, VectorId`` (ref :1103-1110).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from vector_db_handler_spark import embedder
from vector_db_handler_spark.functions.vector import cosine_score_precomputed
from vector_db_handler_spark.store import PointsStore


class DocumentPipeline:
    def __init__(self, store: PointsStore, dim: int | None = None):
        self.store = store
        self.dim = dim or store.vector_size
        if self.dim != store.vector_size:
            # The reference fixes dim per collection at creation
            # (ref :73, :86); catching the mismatch here beats a broken
            # cosine query at read time.
            raise ValueError(
                f"embedder dim {self.dim} != collection vector_size {store.vector_size}"
            )

    # -- ingest (P1/P2, ref :620-731) ----------------------------------------

    def upsert_string(self, user_id: str, chunk: str, metadata: dict) -> int:
        """P1 (ref :620-673): embed one chunk, lazily create the
        collection, insert with a fresh id."""
        vec = embedder.embed_text(chunk, self.dim)
        self.store.ensure_collection(user_id)
        return self.store.upsert_vectors(user_id, [vec], [metadata])

    def upsert_str_list(
        self, user_id: str, chunks: Sequence[str], metadatas: Sequence[dict]
    ) -> int:
        """P2 (ref :675-731): validates equal lengths with ValueError
        (ref :701-702 — the one place the reference DOES check)."""
        if len(chunks) != len(metadatas):
            raise ValueError("chunks and metadatas must have equal length")
        vecs = embedder.embed_texts(list(chunks), self.dim)
        self.store.ensure_collection(user_id)
        return self.store.upsert_vectors(user_id, vecs, list(metadatas))

    def ingest_documents(self, user_id: str, docs_df: DataFrame, text_col: str = "text") -> None:
        """DataFrame-first bulk ingest (the 100 TB path the reference
        lacks): embed per Arrow batch, append to the tenant partition.
        ``docs_df`` needs ``doc_id``/``chunk_id``/``title`` columns or
        they default like the reference's schema defaults."""
        from vector_db_handler_spark.functions.vector import l2_norm

        df = embedder.with_embeddings(docs_df, text_col=text_col, dim=self.dim)
        for col, default in (("doc_id", 0), ("chunk_id", 0), ("title", "string")):
            if col not in df.columns:
                df = df.withColumn(col, F.lit(default))
        out = (
            df.withColumn("point_id", F.expr("uuid()"))
            .withColumn("user_id", F.lit(user_id))
            .withColumn("payload", F.create_map().cast("map<string,string>"))
            .withColumn("embedding_norm", l2_norm(F.col("embedding")))
        )
        self.store.append(out)

    def stream_ingest(self, docs_stream: DataFrame, user_id: str, text_col: str = "text"):
        """Live indexing: continuously embed + append a document STREAM
        into the tenant partition.

        ``foreachBatch`` reuses the exact batch ingest path per
        micro-batch (embedding mapInPandas included), so backfill and
        live ingest are the same code — the Structured Streaming
        pattern for sinks without a native streaming writer.  Returns
        the StreamingQuery; caller owns its lifecycle.
        """

        def ingest_batch(batch_df: DataFrame, _batch_id: int) -> None:
            if batch_df.isEmpty():
                return
            self.ingest_documents(user_id, batch_df, text_col=text_col)

        return (
            docs_stream.writeStream.foreachBatch(ingest_batch)
            .trigger(availableNow=True)
            .start()
        )

    # -- deletes / update (P3-P9 pass-throughs, ref :733-917) -----------------

    def delete_doc(self, user_id: str, doc_id: int) -> None:
        self.store.delete_doc(user_id, doc_id)

    def delete_doc_by_title(self, user_id: str, doc_title: str) -> None:
        self.store.delete_doc_by_title(user_id, doc_title)

    def delete_chunk(self, user_id: str, doc_id: int, chunk_id: int) -> None:
        self.store.delete_chunk(user_id, doc_id, chunk_id)

    def delete_by_id(self, user_id: str, point_id: str) -> None:
        self.store.delete_by_id(user_id, point_id)

    def delete_list_by_id(self, user_id: str, point_ids: Sequence[str]) -> None:
        self.store.delete_list_by_id(user_id, point_ids)

    def delete_user_collection_data(self, user_id: str) -> None:
        self.store.truncate_collection(user_id)

    def delete_user_collection(self, user_id: str) -> None:
        self.store.drop_collection(user_id)

    def update_chunk(self, user_id: str, text: str, doc_id: int, chunk_id: int) -> None:
        """P9 (ref :864-917): re-embed, replace first match's vector."""
        vec = embedder.embed_text(text, self.dim)
        self.store.update_vector(user_id, vec, doc_id, chunk_id)

    # -- search (P10/P11, ref :919-1044) --------------------------------------

    def _search_df(
        self,
        user_id: str,
        query: str,
        limit: int,
        score_threshold: float,
        doc_ids: Sequence[int] | None = None,
    ) -> DataFrame:
        qvec = embedder.embed_text(query, self.dim)
        df = self.store.read_tenant(user_id)
        if doc_ids:  # empty list ⇒ match-all (ref :526-529)
            df = df.filter(F.col("doc_id").isin(list(doc_ids)))
        scored = df.withColumn(
            "score",
            cosine_score_precomputed(F.col("embedding"), F.col("embedding_norm"), qvec),
        )
        return (
            scored.filter(F.col("score") >= F.lit(float(score_threshold)))
            .orderBy(F.col("score").desc(), F.col("point_id").asc())
            .limit(limit)
        )

    def search_query(
        self, user_id: str, query: str, limit: int = 5, score_threshold: float = 0.0
    ) -> list[dict]:
        """P10 (ref :919-979): projection to the reference's result dict
        — missing payload keys become None (ref :974-977)."""
        rows = self._search_df(user_id, query, limit, score_threshold).collect()
        return [
            {
                "DocId": r["doc_id"],
                "ChunkId": r["chunk_id"],
                "Title": r["title"],
                "Similarity Score": r["score"],
            }
            for r in rows
        ]

    def search_query_on_doc(
        self,
        user_id: str,
        doc_ids: Sequence[int],
        query: str,
        limit: int = 5,
        score_threshold: float = 0.0,
    ) -> list[dict]:
        """P11 (ref :981-1044)."""
        rows = self._search_df(user_id, query, limit, score_threshold, doc_ids).collect()
        return [
            {
                "DocId": r["doc_id"],
                "ChunkId": r["chunk_id"],
                "Title": r["title"],
                "Similarity Score": r["score"],
            }
            for r in rows
        ]

    # -- scrolls (P12/P13, ref :1046-1183) ------------------------------------

    def scroll_user_collection(self, user_id: str, limit: int = 20) -> list[dict]:
        """P12 (ref :1046-1075): NO VectorId in this shape."""
        rows = (
            self.store.read_tenant(user_id)
            .orderBy("point_id")
            .limit(limit)
            .select("doc_id", "chunk_id", "title")
            .collect()
        )
        return [{"DocId": r[0], "ChunkId": r[1], "Title": r[2]} for r in rows]

    def _scroll_with_ids(self, df: DataFrame, limit: int) -> list[dict]:
        rows = (
            df.orderBy("point_id")
            .limit(limit)
            .select("doc_id", "chunk_id", "title", "point_id")
            .collect()
        )
        return [
            {"DocId": r[0], "ChunkId": r[1], "Title": r[2], "VectorId": r[3]} for r in rows
        ]

    def scroll_user_doc(self, user_id: str, doc_id: int, limit: int = 20) -> list[dict]:
        """P13 (ref :1077-1110): includes VectorId."""
        return self._scroll_with_ids(
            self.store.read_tenant(user_id).filter(F.col("doc_id") == doc_id), limit
        )

    def scroll_user_chunk(
        self, user_id: str, doc_id: int, chunk_id: int, limit: int = 20
    ) -> list[dict]:
        return self._scroll_with_ids(
            self.store.read_tenant(user_id).filter(
                (F.col("doc_id") == doc_id) & (F.col("chunk_id") == chunk_id)
            ),
            limit,
        )

    def scroll_user_docs(
        self, user_id: str, doc_ids: Sequence[int], limit: int = 20
    ) -> list[dict]:
        df = self.store.read_tenant(user_id)
        if doc_ids:  # empty ⇒ full scan (ref :526-529)
            df = df.filter(F.col("doc_id").isin(list(doc_ids)))
        return self._scroll_with_ids(df, limit)

    # -- catalog (P14, ref :1185-1195) -----------------------------------------

    def list_collections(self) -> list[str]:
        return self.store.list_collections()

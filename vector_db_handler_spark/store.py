"""Tenant-partitioned vector points store.

Re-expresses the reference's ``QdrantHandler``
(``app/core/document_ingestor.py:25-568``) — one Qdrant collection per
tenant — as ONE parquet table partitioned by ``user_id``:

* per-user collections (ref :55-68) → `user_id` partition values, so
  every operator prunes to one tenant's files (same isolation, no
  N-tables catalog explosion at 100k tenants);
* points (ref :104-108) → rows with promoted payload keys
  (``DocId/ChunkId/Title`` → typed columns, ref ``schemas.py:7-11``)
  and the remainder in a ``MAP<STRING,STRING>``;
* ``embedding_norm`` is precomputed at ingest so cosine search does a
  single per-row dot product.

Mutations are exposed two ways:

1. **Pure DataFrame transforms** (``delete_*_t``, ``update_vector_t``)
   — stateless df→df functions the driver's oracle can replay as SQL.
2. **Materializing methods** on :class:`PointsStore` — read → transform
   → dynamic-partition-overwrite, rewriting ONLY the touched tenant
   partition (the 100 TB-safe write pattern; a full-table rewrite per
   delete would be catastrophic at scale).

Semantic invariants preserved (SURVEY §2.4):
  * "upsert" is INSERT-only — a fresh uuid4 per ingested row
    (ref :105, :137); re-ingesting duplicates rather than replaces.
  * ``update_vector`` touches only the FIRST (doc_id, chunk_id) match,
    keeps id+payload, silent no-op when absent (ref :313-330).
  * empty filters match ALL rows (truncate, ref :271).
  * ``list_collections`` leaks all tenants (ref :559-568) and applies
    the ``user_<id>``, ``-``→``_`` mangling (ref :68).
"""

from __future__ import annotations

import uuid
from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from vector_db_handler_spark.functions.vector import l2_norm

DEFAULT_VECTOR_SIZE = 1024  # reference document_ingestor.py:73

POINTS_SCHEMA = T.StructType(
    [
        T.StructField("point_id", T.StringType(), False),
        T.StructField("user_id", T.StringType(), False),
        T.StructField("doc_id", T.LongType(), True),
        T.StructField("chunk_id", T.LongType(), True),
        T.StructField("title", T.StringType(), True),
        T.StructField("payload", T.MapType(T.StringType(), T.StringType()), True),
        T.StructField("embedding", T.ArrayType(T.FloatType()), True),
        T.StructField("embedding_norm", T.DoubleType(), True),
    ]
)


def collection_name(user_id: str) -> str:
    """Reference name mangling: ``user_<id>`` with ``-`` → ``_``
    (``document_ingestor.py:55-68``).  Kept for output parity; the
    storage key is the raw ``user_id``."""
    return f"user_{user_id}".replace("-", "_")


# ---------------------------------------------------------------------------
# Pure transforms (df → df) — oracle-replayable mutation semantics
# ---------------------------------------------------------------------------


def delete_doc_t(df: DataFrame, user_id: str, doc_id: int) -> DataFrame:
    """H5 (ref :146-167): DELETE WHERE tenant AND DocId == doc_id."""
    return df.filter(~((F.col("user_id") == user_id) & (F.col("doc_id") == doc_id)))


def delete_doc_by_title_t(df: DataFrame, user_id: str, doc_title: str) -> DataFrame:
    """H6 (ref :169-190): DELETE WHERE tenant AND Title == doc_title."""
    return df.filter(~((F.col("user_id") == user_id) & (F.col("title") == doc_title)))


def delete_chunk_t(df: DataFrame, user_id: str, doc_id: int, chunk_id: int) -> DataFrame:
    """H7 (ref :192-216): DELETE WHERE tenant AND DocId AND ChunkId."""
    return df.filter(
        ~(
            (F.col("user_id") == user_id)
            & (F.col("doc_id") == doc_id)
            & (F.col("chunk_id") == chunk_id)
        )
    )


def delete_by_id_t(df: DataFrame, user_id: str, point_id: str) -> DataFrame:
    """H8 (ref :218-237): DELETE WHERE tenant AND point_id == x."""
    return df.filter(~((F.col("user_id") == user_id) & (F.col("point_id") == point_id)))


def delete_list_by_id_t(df: DataFrame, user_id: str, point_ids: Sequence[str]) -> DataFrame:
    """H9 (ref :239-258): DELETE WHERE point_id IN (…).

    For a handful of ids ``isin`` folds into the scan predicate; for a
    large id relation use :func:`delete_by_id_relation_t` (anti-join).
    """
    if not point_ids:
        return df
    return df.filter(~((F.col("user_id") == user_id) & F.col("point_id").isin(list(point_ids))))


def delete_by_id_relation_t(df: DataFrame, user_id: str, ids_df: DataFrame) -> DataFrame:
    """H9 at scale: LEFT ANTI join against an ids relation (broadcast
    when small).  ``ids_df`` must have a ``point_id`` column."""
    tenant = df.filter(F.col("user_id") == user_id)
    keep_other = df.filter(F.col("user_id") != user_id)
    return keep_other.unionByName(
        tenant.join(F.broadcast(ids_df.select("point_id")), "point_id", "left_anti")
    )


def truncate_collection_t(df: DataFrame, user_id: str) -> DataFrame:
    """H10 (ref :260-275): empty filter matches ALL tenant points
    (``Filter(must=[])``, ref :271); collection itself survives."""
    return df.filter(F.col("user_id") != user_id)


def update_vector_t(
    df: DataFrame,
    user_id: str,
    vector: Sequence[float],
    doc_id: int,
    chunk_id: int,
) -> DataFrame:
    """H12 (ref :290-330): replace the vector of the FIRST
    (doc_id, chunk_id) match only — same point_id, same payload, new
    vector; silent no-op if no match (ref :320 guard).

    "First" is pinned to lowest ``point_id`` (the reference takes
    whatever Qdrant's scroll returns first — nondeterministic; we pick
    a total order so results are reproducible across partitionings).
    The window is per-tenant-partitioned, so ranking never shuffles
    more than the matching rows.
    """
    vec = [float(v) for v in vector]
    is_match = (
        (F.col("user_id") == user_id)
        & (F.col("doc_id") == doc_id)
        & (F.col("chunk_id") == chunk_id)
    )
    w = Window.partitionBy("user_id", "doc_id", "chunk_id").orderBy("point_id")
    ranked = df.withColumn(
        "_rn", F.when(is_match, F.row_number().over(w)).otherwise(F.lit(None))
    )
    new_vec = F.array(*[F.lit(v).cast("float") for v in vec])
    # Norm from the float32-ROUNDED values (same as the ingest path) —
    # a float64-input norm would disagree with the stored vector by
    # ~1e-7 and skew precomputed-norm cosine scores for updated rows.
    return (
        ranked.withColumn(
            "embedding", F.when(F.col("_rn") == 1, new_vec).otherwise(F.col("embedding"))
        )
        .withColumn(
            "embedding_norm",
            F.when(F.col("_rn") == 1, l2_norm(new_vec)).otherwise(F.col("embedding_norm")),
        )
        .drop("_rn")
    )


# ---------------------------------------------------------------------------
# Materializing store
# ---------------------------------------------------------------------------


class PointsStore:
    """Parquet-backed points table with per-tenant partition lifecycle.

    ``root`` is the table directory; rows land under
    ``root/user_id=<tenant>/``.  All writes use dynamic partition
    overwrite so a mutation rewrites only the tenant partitions present
    in the written frame.
    """

    def __init__(self, spark: SparkSession, root: str, vector_size: int = DEFAULT_VECTOR_SIZE):
        self.spark = spark
        self.root = root
        self.vector_size = vector_size
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")

    # -- filesystem (Hadoop FS API: works on local, HDFS, s3a, …) ------------
    #
    # Catalog state IS the set of partition directories; all directory
    # operations go through the Hadoop FileSystem bound to the table
    # path, never the local ``os`` module — the same code runs against
    # object storage on a real cluster.

    def _fs(self):
        jvm = self.spark.sparkContext._jvm
        path = jvm.org.apache.hadoop.fs.Path(self.root)
        fs = path.getFileSystem(self.spark.sparkContext._jsc.hadoopConfiguration())
        return fs, jvm

    def _partition_path(self, jvm, user_id: str):
        return jvm.org.apache.hadoop.fs.Path(self.root, f"user_id={user_id}")

    def _partition_dirs(self) -> list[str]:
        """Names of existing ``user_id=…`` partition directories."""
        fs, jvm = self._fs()
        root = jvm.org.apache.hadoop.fs.Path(self.root)
        if not fs.exists(root):
            return []
        return [
            st.getPath().getName()
            for st in fs.listStatus(root)
            if st.isDirectory() and st.getPath().getName().startswith("user_id=")
        ]

    # -- catalog (H2/H11/H19) ------------------------------------------------

    def ensure_collection(self, user_id: str) -> None:
        """H2 (ref :70-87): CREATE IF NOT EXISTS — lazy, idempotent.
        With a partitioned table this is a no-op until first write;
        kept for API parity."""

    def collection_exists(self, user_id: str) -> bool:
        fs, jvm = self._fs()
        return bool(fs.exists(self._partition_path(jvm, user_id)))

    def list_collections(self) -> list[str]:
        """H19 (ref :559-568): ALL tenants (no isolation), mangled names."""
        out = [collection_name(d.split("=", 1)[1]) for d in self._partition_dirs()]
        return sorted(out)

    def drop_collection(self, user_id: str) -> None:
        """H11 (ref :277-288): DROP — remove the tenant partition."""
        fs, jvm = self._fs()
        path = self._partition_path(jvm, user_id)
        if fs.exists(path):
            fs.delete(path, True)

    # -- read ---------------------------------------------------------------

    def read(self) -> DataFrame:
        if not self._partition_dirs():
            return self.spark.createDataFrame([], POINTS_SCHEMA)
        df = self.spark.read.schema(POINTS_SCHEMA).parquet(self.root)
        return df

    def read_tenant(self, user_id: str) -> DataFrame:
        # Partition pruning: this predicate eliminates all other
        # tenants' files at planning time.
        return self.read().filter(F.col("user_id") == user_id)

    # -- ingest (H3/H4) -------------------------------------------------------

    def upsert_vectors(
        self,
        user_id: str,
        vectors: Sequence[Sequence[float]],
        metadatas: Sequence[dict],
    ) -> int:
        """H3/H4 (ref :89-144): INSERT-only "upsert" — every row gets a
        fresh uuid4 (ref :105/:137), duplicates are intentional.  Adds
        the length check the reference's docstring promises but never
        implements (ref :130-131 vs :134-140), and enforces the
        per-collection vector dimension at WRITE time (the reference
        fixes dim at collection creation, ref :73/:86; accepting a
        mixed-dim row here would break every cosine query at read time
        instead).

        Missing payload keys stay ``None`` — the reference stores the
        payload as-is and ``payload.get`` returns None on read
        (ref :974-977); the ``{DocId: 0, …}`` defaults belong to the
        HTTP schema layer (``schemas.py:7-11``), applied in ``api.py``.
        """
        if len(vectors) != len(metadatas):
            raise ValueError("vectors and metadatas must have equal length")
        for i, vec in enumerate(vectors):
            if len(vec) != self.vector_size:
                raise ValueError(
                    f"vector {i} has dim {len(vec)}, collection expects {self.vector_size}"
                )
        rows = []
        for vec, meta in zip(vectors, metadatas):
            meta = dict(meta or {})
            doc_id = meta.pop("DocId", None)
            chunk_id = meta.pop("ChunkId", None)
            title = meta.pop("Title", None)
            rows.append(
                (
                    user_id,
                    int(doc_id) if doc_id is not None else None,
                    int(chunk_id) if chunk_id is not None else None,
                    str(title) if title is not None else None,
                    {str(k): str(v) for k, v in meta.items()},
                    [float(v) for v in vec],
                )
            )
        schema = (
            "user_id string, doc_id long, chunk_id long, title string, "
            "payload map<string,string>, embedding array<float>"
        )
        df = (
            self.spark.createDataFrame(rows, schema)
            .withColumn("point_id", F.expr("uuid()"))
            .withColumn("embedding_norm", l2_norm(F.col("embedding")))
            .select([f.name for f in POINTS_SCHEMA.fields])
        )
        self.append(df)
        return len(rows)

    def append(self, points_df: DataFrame) -> None:
        """Bulk ingest path (DataFrame-first — the Spark-native way to
        build the index at 100 TB).  Expects POINTS_SCHEMA columns."""
        (
            points_df.select([f.name for f in POINTS_SCHEMA.fields])
            .write.mode("append")
            .partitionBy("user_id")
            .parquet(self.root)
        )

    # -- mutations (read → pure transform → overwrite touched tenant) --------

    def _rewrite_tenant(self, user_id: str, new_tenant_df: DataFrame) -> None:
        """Rewrite ONE tenant partition.  Other tenants' files are
        untouched.

        Scale-safe write pattern: the transformed tenant rows stream
        through the executors into a ``_staging_<uuid>`` directory under
        the table root (underscore-prefixed → invisible to readers),
        then the old partition directory is swapped for the staged one
        with O(1) FileSystem renames.  Nothing is pinned in memory —
        unlike an eager ``localCheckpoint``, this works when one tenant
        exceeds executor storage.  (On a production lakehouse this
        whole method is a Delta/Iceberg ``MERGE``/``DELETE`` —
        transactional, no staging dance; plain parquet is what the
        fixture environment offers.)
        """
        fs, jvm = self._fs()
        staging = jvm.org.apache.hadoop.fs.Path(self.root, f"_staging_{uuid.uuid4().hex}")
        (
            new_tenant_df.select([f.name for f in POINTS_SCHEMA.fields])
            .write.mode("overwrite")
            .partitionBy("user_id")
            .parquet(str(staging))
        )
        try:
            staged = [
                st.getPath()
                for st in fs.listStatus(staging)
                if st.isDirectory() and st.getPath().getName().startswith("user_id=")
            ]
            if not staged:
                # Transform produced zero rows: truncate semantics —
                # drop the data but keep the collection listed
                # (empty-filter matches all, ref :271; truncate ≠ drop).
                self.truncate_collection(user_id)
                return
            for src in staged:
                dst = jvm.org.apache.hadoop.fs.Path(self.root, src.getName())
                if fs.exists(dst):
                    fs.delete(dst, True)
                fs.rename(src, dst)
        finally:
            fs.delete(staging, True)

    def _apply(self, user_id: str, transform) -> None:
        tenant = self.read_tenant(user_id)
        self._rewrite_tenant(user_id, transform(tenant))

    def delete_doc(self, user_id: str, doc_id: int) -> None:
        self._apply(user_id, lambda df: delete_doc_t(df, user_id, doc_id))

    def delete_doc_by_title(self, user_id: str, doc_title: str) -> None:
        self._apply(user_id, lambda df: delete_doc_by_title_t(df, user_id, doc_title))

    def delete_chunk(self, user_id: str, doc_id: int, chunk_id: int) -> None:
        self._apply(user_id, lambda df: delete_chunk_t(df, user_id, doc_id, chunk_id))

    def delete_by_id(self, user_id: str, point_id: str) -> None:
        self._apply(user_id, lambda df: delete_by_id_t(df, user_id, point_id))

    def delete_list_by_id(self, user_id: str, point_ids: Sequence[str]) -> None:
        self._apply(user_id, lambda df: delete_list_by_id_t(df, user_id, point_ids))

    def truncate_collection(self, user_id: str) -> None:
        """H10: delete all tenant rows, keep the collection listed.
        Physically drops the partition dir but remembers nothing — the
        reference keeps an empty collection object; our catalog is the
        set of partition dirs, so an empty marker dir stands in."""
        self.drop_collection(user_id)
        fs, jvm = self._fs()
        fs.mkdirs(self._partition_path(jvm, user_id))

    def update_vector(
        self, user_id: str, vector: Sequence[float], doc_id: int, chunk_id: int
    ) -> None:
        self._apply(
            user_id, lambda df: update_vector_t(df, user_id, vector, doc_id, chunk_id)
        )

    # -- maintenance ----------------------------------------------------------

    def compact_tenant(self, user_id: str, target_files: int = 1) -> None:
        """Small-file compaction: append-only ingest (one file per
        upsert, like the reference's per-request writes) fragments a
        tenant partition; streaming ingest multiplies it per
        micro-batch.  Rewrites the tenant into ``target_files`` files
        via the staged-rename path — same crash-safety as mutations,
        and scan-task count drops back to O(target_files)."""
        self._apply(user_id, lambda df: df.repartition(max(1, int(target_files))))

"""Merge-on-read points store: positional deletion vectors on plain
parquet — the in-repo stand-in for a lakehouse table format.

SURVEY §3.3.1 maps every store mutation (reference
``document_ingestor.py`` H5–H12) onto format-level ``DELETE WHERE`` /
``MERGE``; neither ``delta-spark`` nor an Iceberg runtime jar ships in
this container, so round 6 left the mapping as a design note.  This
module makes the seam REAL with a minimal merge-on-read (MoR) format
built from two public Spark facilities:

* the parquet scan's hidden ``_metadata`` columns (``file_path``,
  ``row_index``) give every physical row a stable position — exactly
  the (path, pos) coordinate Iceberg positional delete files and Delta
  deletion vectors address;
* underscore-prefixed directories are invisible to Spark's parquet
  reader, so ``{root}/_deletes/…`` can hold the delete files inside
  the table directory without polluting the data scan.

Semantics (mirrors Iceberg v2 positional deletes / Delta DVs):

* a mutation runs the SAME pure transform as the copy-on-write store,
  but instead of rewriting the tenant partition it writes (a) a small
  parquet of ``(file_path, row_index)`` for rows the transform REMOVED
  and (b) ordinary appended data files for rows it ADDED or changed —
  an update is modeled as kill-old-position + append-new-row, which is
  precisely how a lakehouse MERGE compiles under MoR;
* the read path anti-joins the scan against the broadcast deletion
  vectors — data files are never touched by deletes, so a
  ``delete_doc`` that kills 3 rows costs ~KBs regardless of tenant
  size (vs the CoW store's full-tenant rewrite);
* ``compact()`` is OPTIMIZE: apply the vectors once via the inherited
  staged rewrite, then drop them — after which the table is bit-equal
  to what the CoW path would have produced directly (pinned by
  ``tests/test_store_mor.py``).

100 TB shape: the DV relation stays proportional to DELETED rows, the
anti-join broadcasts it, and the scan remains pruned by the tenant
partition predicate; nothing here scales with table size except the
scan that was already necessary.
"""

from __future__ import annotations

import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from vector_db_handler_spark.store import (
    DEFAULT_VECTOR_SIZE,
    POINTS_SCHEMA,
    PointsStore,
)

_DV_SCHEMA = "file_path string, row_index long"


class ConcurrentCommitError(RuntimeError):
    """Another writer committed between this writer's read and its
    commit attempt (optimistic-concurrency conflict) — re-read the
    table state and retry the transaction."""


def _row_hash():
    """Full-row fingerprint: mutation deltas are computed content-wise,
    so ANY pure transform (filter-deletes AND update_vector's
    first-match rewrite) decomposes into kill+append without knowing
    its shape.  (A function, not a module constant — PySpark 4 column
    construction needs an active session.)"""
    return F.md5(
        F.to_json(
            F.struct(
                "point_id",
                "user_id",
                "doc_id",
                "chunk_id",
                "title",
                "payload",
                "embedding",
                "embedding_norm",
            )
        )
    )


class MorPointsStore(PointsStore):
    """``PointsStore`` whose mutations are merge-on-read: deletes write
    positional delete files, updates write delete+append, reads merge.
    Everything else (ingest, catalog, search inputs) is inherited."""

    # -- deletion-vector bookkeeping ----------------------------------

    def _dv_dir(self, user_id: str) -> str:
        return f"{self.root}/_deletes/user_id={user_id}"

    def _dv_relation(self) -> DataFrame:
        fs, jvm = self._fs()
        base = jvm.org.apache.hadoop.fs.Path(self.root, "_deletes")
        if not fs.exists(base):
            return self.spark.createDataFrame([], _DV_SCHEMA)
        return self.spark.read.schema(_DV_SCHEMA).parquet(
            f"{self.root}/_deletes"
        )

    def deletion_vector_count(self) -> int:
        """Rows currently masked (observability / compaction trigger)."""
        return self._dv_relation().count()

    # -- read path: scan minus vectors --------------------------------

    def read(self) -> DataFrame:
        if not self._partition_dirs():
            return self.spark.createDataFrame([], POINTS_SCHEMA)
        scan = self.spark.read.schema(POINTS_SCHEMA).parquet(self.root).select(
            "*",
            F.col("_metadata.file_path").alias("_dv_file"),
            F.col("_metadata.row_index").alias("_dv_pos"),
        )
        dv = self._dv_relation().select(
            F.col("file_path").alias("_dv_file"),
            F.col("row_index").alias("_dv_pos"),
        )
        # DVs are proportional to deleted rows — broadcast them; the
        # data scan itself stays partition-pruned and shuffle-free.
        return scan.join(
            F.broadcast(dv), ["_dv_file", "_dv_pos"], "left_anti"
        ).drop("_dv_file", "_dv_pos")

    # -- mutation path: kill + append instead of rewrite --------------

    def _apply(self, user_id: str, transform) -> None:
        tenant_scan = (
            self.spark.read.schema(POINTS_SCHEMA)
            .parquet(self.root)
            .filter(F.col("user_id") == user_id)
            .select(
                "*",
                F.col("_metadata.file_path").alias("_dv_file"),
                F.col("_metadata.row_index").alias("_dv_pos"),
                _row_hash().alias("_rh"),
            )
        )
        dv = self._dv_relation().select(
            F.col("file_path").alias("_dv_file"),
            F.col("row_index").alias("_dv_pos"),
        )
        live = tenant_scan.join(
            F.broadcast(dv), ["_dv_file", "_dv_pos"], "left_anti"
        )
        survivors = transform(
            live.drop("_dv_file", "_dv_pos", "_rh")
        ).withColumn("_rh", _row_hash())

        # Kill set: live positions whose content no longer appears.
        # (Content-wise, so an updated row kills its old version.)
        kills = live.join(
            survivors.select("_rh"), "_rh", "left_anti"
        ).select(
            F.col("_dv_file").alias("file_path"),
            F.col("_dv_pos").alias("row_index"),
        )
        # Append set: surviving content not present in the live scan —
        # new versions written as ordinary data files.
        appends = survivors.join(
            live.select("_rh"), "_rh", "left_anti"
        ).drop("_rh")

        # Materialize BOTH deltas before either write: the plans read
        # the live DV directory, so writing the kill file first and
        # then lazily evaluating `appends` would see the just-killed
        # rows already masked (an updated row would vanish instead of
        # being re-appended).  Both deltas are ∝ the rows THIS
        # mutation touched, not tenant size, so pinning them is cheap.
        kills = kills.localCheckpoint(eager=True)
        appends = appends.localCheckpoint(eager=True)
        try:
            self._write_deltas(user_id, kills, appends)
        finally:
            kills.unpersist()
            appends.unpersist()

    def _write_deltas(self, user_id: str, kills, appends) -> None:
        if kills.limit(1).count():
            kills.coalesce(1).write.mode("append").parquet(
                self._dv_dir(user_id)
            )
        if appends.limit(1).count():
            (
                appends.select(
                    [f.name for f in POINTS_SCHEMA.fields if f.name != "user_id"]
                )
                .write.mode("append")
                .parquet(f"{self.root}/user_id={user_id}")
            )

    # -- maintenance: OPTIMIZE ----------------------------------------

    def compact(self, user_id: str) -> None:
        """Fold the tenant's deletion vectors into rewritten data files
        (the OPTIMIZE/compaction step every MoR format needs) and drop
        the vectors; afterwards the physical layout matches what the
        copy-on-write path produces."""
        merged = self.read_tenant(user_id)
        self._rewrite_tenant(user_id, merged)
        fs, jvm = self._fs()
        dv_path = jvm.org.apache.hadoop.fs.Path(self._dv_dir(user_id))
        if fs.exists(dv_path):
            fs.delete(dv_path, True)

    def truncate_collection(self, user_id: str) -> None:
        # Physical truncate also invalidates the tenant's vectors —
        # the positions they reference no longer exist.
        super().truncate_collection(user_id)
        fs, jvm = self._fs()
        dv_path = jvm.org.apache.hadoop.fs.Path(self._dv_dir(user_id))
        if fs.exists(dv_path):
            fs.delete(dv_path, True)


class VersionedMorPointsStore(MorPointsStore):
    """MoR store + a commit log: every mutation writes a numbered JSON
    manifest snapshotting the table's file sets, enabling SNAPSHOT
    READS (``read_version``) — the time-travel half of the lakehouse
    contract (Delta ``VERSION AS OF`` / Iceberg snapshot ids).

    Manifest = {version, data: {tenant_dir: [file, ...]},
    deletes: {tenant_dir: [file, ...]}} under ``{root}/_commits/``
    (underscore-prefixed → invisible to the data scan).  Because data
    and DV files are IMMUTABLE once written (mutations only append),
    an old manifest keeps describing exactly the rows live at its
    commit — no copying, snapshots are free.

    Honest limits (same shape as real formats): ``compact``,
    ``truncate_collection`` and ``drop_collection`` physically remove
    files, so snapshots older than the latest such operation raise on
    read — that is VACUUM semantics (Delta time travel also dies at
    the vacuum horizon), surfaced loudly instead of silently serving
    partial data.  Single-writer by assumption, like the rest of the
    store.

    ``reconcile_min_age_sec`` (ADVICE r9) is the STORE-LEVEL age guard
    every auto-invoked :meth:`reconcile` uses: the auto-callers
    (append/_apply/compact/truncate/drop and the streaming sink) run
    orphan cleanup implicitly, and before this knob a multi-writer
    deployment had no way to apply the documented ``min_age_sec``
    protection to those calls — the single-writer assumption was
    silently load-bearing on every mutation.  Set it larger than any
    writer's stage-to-commit window and implicit reconciles will skip
    young (possibly in-flight) files; explicit ``reconcile(0.0)``
    still forces a full sweep."""

    def __init__(
        self,
        spark: SparkSession,
        root: str,
        vector_size: int = DEFAULT_VECTOR_SIZE,
        reconcile_min_age_sec: float = 0.0,
    ):
        super().__init__(spark, root, vector_size)
        self.reconcile_min_age_sec = float(reconcile_min_age_sec)

    # -- commit log ---------------------------------------------------

    def _commits_path(self, jvm):
        return jvm.org.apache.hadoop.fs.Path(self.root, "_commits")

    def _list_tenant_files(self, fs, jvm, subdir: str | None = None) -> dict:
        base = (
            jvm.org.apache.hadoop.fs.Path(self.root, subdir)
            if subdir
            else jvm.org.apache.hadoop.fs.Path(self.root)
        )
        out: dict[str, list[str]] = {}
        if not fs.exists(base):
            return out
        for st in fs.listStatus(base):
            if not (st.isDirectory() and st.getPath().getName().startswith("user_id=")):
                continue
            files = [
                f.getPath().getName()
                for f in fs.listStatus(st.getPath())
                if f.isFile() and f.getPath().getName().endswith(".parquet")
            ]
            out[st.getPath().getName()] = sorted(files)
        return out

    def commit(
        self, extra: dict | None = None, expected_version: int | None = None
    ) -> int:
        """Snapshot the current file sets as the next version.
        ``extra`` lands in the manifest verbatim — the transaction-
        metadata slot (e.g. ``{"ingest_batch": id}`` for idempotent
        streaming sinks, Delta's txnAppId/txnVersion analog).

        Optimistic concurrency (the Delta/Iceberg commit protocol):
        pass ``expected_version`` = the version this writer READ its
        base state from; if another writer committed meanwhile, the
        commit fails with :class:`ConcurrentCommitError` and the
        caller re-reads + retries.  Independent of that precondition,
        the version file itself is the atomic arbiter: a rename onto
        an existing ``vNNNNN.json`` does not replace it, so even two
        racing writers that both passed the check cannot both own a
        version — the loser detects the occupied slot and raises."""
        import json

        fs, jvm = self._fs()
        versions = self.versions()
        latest = versions[-1] if versions else 0
        if expected_version is not None and latest != int(expected_version):
            raise ConcurrentCommitError(
                f"commit based on v{expected_version} but table is at "
                f"v{latest} — re-read and retry"
            )
        v = latest + 1
        manifest = {
            "version": v,
            "data": self._list_tenant_files(fs, jvm),
            "deletes": self._list_tenant_files(fs, jvm, "_deletes"),
            **(extra or {}),
        }
        cp = self._commits_path(jvm)
        fs.mkdirs(cp)
        tmp = jvm.org.apache.hadoop.fs.Path(cp, f"_tmp_v{v:05d}.json")
        out = fs.create(tmp, True)
        out.write(bytearray(json.dumps(manifest).encode()))
        out.close()
        # O(1) rename = the atomic commit point; a rename onto an
        # existing destination FAILS (returns false) instead of
        # replacing it, which is exactly the arbiter semantics.
        dest = jvm.org.apache.hadoop.fs.Path(cp, f"v{v:05d}.json")
        if fs.exists(dest) or not fs.rename(tmp, dest):
            fs.delete(tmp, False)
            raise ConcurrentCommitError(
                f"lost the race for v{v} — another writer committed first"
            )
        return v

    def versions(self) -> list[int]:
        fs, jvm = self._fs()
        cp = self._commits_path(jvm)
        if not fs.exists(cp):
            return []
        out = []
        for st in fs.listStatus(cp):
            n = st.getPath().getName()
            if n.startswith("v") and n.endswith(".json"):
                out.append(int(n[1:-5]))
        return sorted(out)

    def has_ingest_batch(self, batch_id: int) -> bool:
        """True iff a committed manifest already records this
        streaming batch id (the idempotent-replay guard)."""
        return any(
            self._manifest(v).get("ingest_batch") == int(batch_id)
            for v in self.versions()
        )

    def orphan_files(self, min_age_sec: float = 0.0) -> list[str]:
        """Data/DV files present on disk but absent from the LATEST
        committed manifest — the residue of a transaction that died
        between its file writes and its commit rename.  Because every
        mutation on this class auto-commits and files are immutable
        once committed, any un-manifested file is, by construction,
        torn-transaction residue (on a fresh store with no commits,
        that's every file).

        SINGLE-WRITER CONTRACT: "un-manifested" is also exactly the
        shape of a CONCURRENT writer's in-flight pre-commit files and
        of :func:`write_audit_publish`'s staged-but-unaudited batch.
        This classification is therefore only sound while NO other
        transaction (mutation, ingest batch, or WAP stage) is in
        flight on this table.  For a multi-writer deployment pass
        ``min_age_sec`` — only files older than the threshold are
        classified as orphans, which is precisely how Iceberg's
        ``remove_orphan_files`` (default 3-day ``older_than``) avoids
        deleting a live writer's staging files."""
        import time

        fs, jvm = self._fs()
        versions = self.versions()
        data, dels = {}, {}
        if versions:
            m = self._manifest(versions[-1])
            data, dels = m["data"], m["deletes"]
        orphans = []
        for tenant, files in self._list_tenant_files(fs, jvm).items():
            known = set(data.get(tenant, ()))
            orphans += [
                f"{self.root}/{tenant}/{f}" for f in files if f not in known
            ]
        for tenant, files in self._list_tenant_files(fs, jvm, "_deletes").items():
            known = set(dels.get(tenant, ()))
            orphans += [
                f"{self.root}/_deletes/{tenant}/{f}"
                for f in files
                if f not in known
            ]
        if min_age_sec > 0:
            horizon_ms = (time.time() - min_age_sec) * 1000.0
            orphans = [
                p
                for p in orphans
                if fs.getFileStatus(
                    jvm.org.apache.hadoop.fs.Path(p)
                ).getModificationTime()
                <= horizon_ms
            ]
        return sorted(orphans)

    def reconcile(self, min_age_sec: float | None = None) -> list[str]:
        """Crash recovery: delete every orphan file so the on-disk
        state equals the latest committed manifest, and return the
        deleted paths.  Iceberg calls this ``remove_orphan_files``;
        Delta's VACUUM covers the same residue.  Run it before
        retrying a torn transaction — every auto-committing mutation
        and the streaming ingest sink do so automatically — after
        which the live ``read()`` and the snapshot
        ``read_version(latest)`` agree again.

        MUTUAL EXCLUSION REQUIRED: must never run while any other
        transaction is in flight on this table (another writer's
        pre-commit window, a WAP stage) — their staged files are
        indistinguishable from torn residue and would be deleted,
        making the racing commit manifest missing files.  The
        auto-callers rely on the store-wide single-writer contract;
        a multi-writer deployment must set the constructor's
        ``reconcile_min_age_sec`` (which every implicit call inherits
        when ``min_age_sec`` is None) larger than any transaction's
        stage-to-commit window (Iceberg ``remove_orphan_files
        older_than`` semantics, pinned by
        ``tests/test_store_mor.py::test_reconcile_age_guard``)."""
        if min_age_sec is None:
            min_age_sec = self.reconcile_min_age_sec
        fs, jvm = self._fs()
        removed = self.orphan_files(min_age_sec)
        for p in removed:
            fs.delete(jvm.org.apache.hadoop.fs.Path(p), False)
        return removed

    def _manifest(self, version: int) -> dict:
        import json

        fs, jvm = self._fs()
        path = jvm.org.apache.hadoop.fs.Path(
            self._commits_path(jvm), f"v{version:05d}.json"
        )
        if not fs.exists(path):
            raise ValueError(f"no such snapshot: version {version}")
        # Read through Spark's text source (py4j cannot mutate a Python
        # byte buffer through Java's read(byte[]) contract).
        lines = self.spark.read.text(str(path)).collect()
        return json.loads("\n".join(r.value for r in lines))

    # -- mutations auto-commit ---------------------------------------
    #
    # Each mutation reconciles FIRST (ADVICE r8): commit() manifests a
    # whole-disk listing, so residue of an UNRELATED torn transaction
    # (e.g. a failed delete's DV file) would otherwise be silently
    # swept into this mutation's manifest and take effect even though
    # the original call raised — and the pre-commit read()/transform
    # would see the residue rows too.  reconcile() is a no-op on a
    # clean store; safety under the store's single-writer contract is
    # documented on reconcile() itself.

    def append(self, points_df) -> None:
        self.reconcile()
        super().append(points_df)
        self.commit()

    def _apply(self, user_id: str, transform) -> None:
        self.reconcile()
        super()._apply(user_id, transform)
        self.commit()

    def compact(self, user_id: str) -> None:
        self.reconcile()
        super().compact(user_id)
        self.commit()

    def truncate_collection(self, user_id: str) -> None:
        self.reconcile()
        super().truncate_collection(user_id)
        self.commit()

    # -- snapshot read -------------------------------------------------

    def read_version(self, version: int) -> DataFrame:
        m = self._manifest(version)
        fs, jvm = self._fs()
        data_files, missing = [], []
        for tenant, files in m["data"].items():
            for f in files:
                p = f"{self.root}/{tenant}/{f}"
                if fs.exists(jvm.org.apache.hadoop.fs.Path(p)):
                    data_files.append(p)
                else:
                    missing.append(p)
        if missing:
            raise ValueError(
                f"snapshot {version} is beyond the vacuum horizon: "
                f"{len(missing)} data files were removed by a later "
                f"compact/truncate/drop (e.g. {missing[0]})"
            )
        if not data_files:
            return self.spark.createDataFrame([], POINTS_SCHEMA)
        scan = (
            self.spark.read.schema(POINTS_SCHEMA)
            .option("basePath", self.root)
            .parquet(*data_files)
            .select(
                "*",
                F.col("_metadata.file_path").alias("_dv_file"),
                F.col("_metadata.row_index").alias("_dv_pos"),
            )
        )
        dv_files = [
            f"{self.root}/_deletes/{tenant}/{f}"
            for tenant, files in m["deletes"].items()
            for f in files
        ]
        if dv_files:
            dv = self.spark.read.schema(_DV_SCHEMA).parquet(*dv_files).select(
                F.col("file_path").alias("_dv_file"),
                F.col("row_index").alias("_dv_pos"),
            )
        else:
            dv = self.spark.createDataFrame([], _DV_SCHEMA).select(
                F.col("file_path").alias("_dv_file"),
                F.col("row_index").alias("_dv_pos"),
            )
        return scan.join(
            F.broadcast(dv), ["_dv_file", "_dv_pos"], "left_anti"
        ).drop("_dv_file", "_dv_pos")

    def drop_collection(self, user_id: str) -> None:
        self.reconcile()
        super().drop_collection(user_id)
        fs, jvm = self._fs()
        dv_path = jvm.org.apache.hadoop.fs.Path(self._dv_dir(user_id))
        if fs.exists(dv_path):
            fs.delete(dv_path, True)
        self.commit()


def streaming_ingest_exactly_once(
    points_stream: DataFrame,
    store: "VersionedMorPointsStore",
    checkpoint: str,
    timeout_sec: int = 120,
) -> None:
    """Exactly-once streaming ingest into the versioned store — the
    lakehouse sink pattern (Delta's ``txnAppId``/``txnVersion``):
    ``foreachBatch`` gives at-least-once on restart-after-partial-
    write, so each batch's id is recorded IN the commit manifest and
    a replayed batch that already has a committed manifest is skipped
    — the sink is idempotent end-to-end, not just engine-side.

    Torn-write window (ADVICE r7): if the job dies AFTER the data
    files land but BEFORE the commit rename, the replayed batch would
    append the same rows again and the orphans would be swept into the
    next manifest.  The sink therefore ``reconcile()``s the store
    against the latest committed manifest before every append —
    un-manifested residue of the torn attempt is deleted, so the
    retry converges to exactly one copy (pinned by
    ``tests/test_store_mor.py`` torn-commit cases).

    The stream must carry POINTS_SCHEMA columns."""

    def ingest(batch_df: DataFrame, batch_id: int) -> None:
        # Reconcile BEFORE the replay guards (ADVICE r8): if the
        # replayed batch is empty or already committed, the early
        # returns would otherwise skip cleanup and the torn residue
        # would be swept into the NEXT batch's whole-disk manifest.
        # No-op on a clean store; single-writer contract per
        # reconcile()'s docstring.
        store.reconcile()
        if store.has_ingest_batch(batch_id):
            return
        if batch_df.isEmpty():
            return
        PointsStore.append(store, batch_df)  # write data files, no commit
        store.commit(extra={"ingest_batch": int(batch_id)})

    q = (
        points_stream.writeStream.foreachBatch(ingest)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    # PySpark's StreamingQuery.awaitTermination takes SECONDS (the JVM
    # twin takes ms) — passing sec*1000 here would stall ~1000× long.
    q.awaitTermination(timeout_sec)
    if q.isActive:
        q.stop()
        raise TimeoutError(f"ingest did not drain within {timeout_sec}s")


class AuditFailedError(RuntimeError):
    """The write-audit-publish gate rejected a staged batch; nothing
    was committed and the staged files were rolled back."""

    def __init__(self, failures):
        self.failures = failures
        desc = "; ".join(
            f"{f.check}({f.col}): {f.metric_num}/{f.metric_den}" for f in failures
        )
        super().__init__(f"audit failed, batch rolled back: {desc}")


def write_audit_publish(
    store: "VersionedMorPointsStore", points_df, checks
) -> int:
    """The Write-Audit-Publish pattern (Iceberg's WAP / Delta's staged
    commits) on the versioned MOR store: STAGE the batch as ordinary
    data files, AUDIT the would-be table state with the one-scan DQ
    constraint suite, and only then PUBLISH a commit — snapshot
    readers (``read_version``) can never observe a batch that failed
    its constraints, because the commit is the only thing that makes
    data visible to them.  On failure the staged files are deleted
    (physical rollback) and :class:`AuditFailedError` carries the
    per-constraint report.

    Returns the published version.  Scale: the audit is one scan of
    the staged table state (the DQ suite's contract); rollback is a
    metadata-sized file delete.

    Runs under the store's single-writer contract: the stage window
    (between ``append`` and ``commit``) leaves files on disk that any
    concurrent ``reconcile()`` — including the one every auto-
    committing mutation now runs — would classify as torn residue and
    delete.  No mutation may run on this store while a WAP stage is in
    flight; see :meth:`VersionedMorPointsStore.reconcile`."""
    from vector_db_handler_spark.operators.dq import dq_check

    # Unrelated torn residue must not ride into the published manifest
    # (or pollute the audit's read()); safe here for the same
    # single-writer reason the stage itself is.
    store.reconcile()
    fs, jvm = store._fs()
    before = {
        tenant: set(files)
        for tenant, files in store._list_tenant_files(fs, jvm).items()
    }
    MorPointsStore.append(store, points_df)  # stage WITHOUT commit
    report = dq_check(store.read(), checks).collect()
    failures = [r for r in report if not r.passed]
    if failures:
        after = store._list_tenant_files(fs, jvm)
        for tenant, files in after.items():
            for f in files:
                if f not in before.get(tenant, set()):
                    fs.delete(
                        jvm.org.apache.hadoop.fs.Path(
                            f"{store.root}/{tenant}/{f}"
                        ),
                        False,
                    )
        raise AuditFailedError(failures)
    return store.commit()

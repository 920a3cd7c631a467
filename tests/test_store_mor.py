"""Merge-on-read store: positional deletion vectors must be
semantically invisible — every mutation's READ result matches the
copy-on-write store row-for-row, data files are untouched by deletes,
and compaction folds the vectors away losslessly (SURVEY §3.3.1 made
testable; r6 verdict stretch ask #8)."""

from __future__ import annotations

import shutil

import pytest

from vector_db_handler_spark.store import PointsStore
from vector_db_handler_spark.store_mor import MorPointsStore

DIM = 8


def _seed(store):
    store.upsert_vectors(
        "t1",
        [[float(i)] * DIM for i in range(1, 7)],
        [
            {"DocId": 1, "ChunkId": 0, "Title": "a"},
            {"DocId": 1, "ChunkId": 1, "Title": "a"},
            {"DocId": 2, "ChunkId": 0, "Title": "b"},
            {"DocId": 2, "ChunkId": 1, "Title": "b"},
            {"DocId": 3, "ChunkId": 0, "Title": "c"},
            {"DocId": 3, "ChunkId": 1, "Title": "c"},
        ],
    )
    store.upsert_vectors("t2", [[9.0] * DIM], [{"DocId": 9, "ChunkId": 0, "Title": "z"}])


def _rows(store, uid):
    return sorted(
        (r["doc_id"], r["chunk_id"], r["title"], tuple(r["embedding"]))
        for r in store.read_tenant(uid).collect()
    )


@pytest.fixture()
def stores(spark, tmp_path):
    cow = PointsStore(spark, str(tmp_path / "cow"), vector_size=DIM)
    mor = MorPointsStore(spark, str(tmp_path / "mor"), vector_size=DIM)
    _seed(cow)
    _seed(mor)
    yield cow, mor
    shutil.rmtree(str(tmp_path / "cow"), ignore_errors=True)
    shutil.rmtree(str(tmp_path / "mor"), ignore_errors=True)


def _data_files(store, uid):
    import glob

    return sorted(glob.glob(f"{store.root}/user_id={uid}/*.parquet"))


def test_delete_doc_via_deletion_vectors_matches_rewrite(stores):
    cow, mor = stores
    before_files = _data_files(mor, "t1")
    cow.delete_doc("t1", 2)
    mor.delete_doc("t1", 2)
    assert _rows(mor, "t1") == _rows(cow, "t1")
    # MoR: the delete wrote vectors, not data — files are byte-identical
    assert _data_files(mor, "t1") == before_files
    assert mor.deletion_vector_count() == 2
    # other tenant untouched on both paths
    assert _rows(mor, "t2") == _rows(cow, "t2")


def test_chained_mutations_and_update_compose(stores):
    cow, mor = stores
    for s in (cow, mor):
        s.delete_chunk("t1", 1, 1)
        s.update_vector("t1", [7.0] * DIM, 3, 0)  # kill+append under MoR
        s.delete_doc("t1", 2)
    assert _rows(mor, "t1") == _rows(cow, "t1")
    # the update's new version is an APPENDED file; old position masked
    assert mor.deletion_vector_count() == 4  # 1 chunk + 1 update + 2 doc rows


def test_compact_folds_vectors_losslessly(stores):
    cow, mor = stores
    cow.delete_doc("t1", 1)
    mor.delete_doc("t1", 1)
    want = _rows(mor, "t1")
    mor.compact("t1")
    assert mor.deletion_vector_count() == 0
    assert _rows(mor, "t1") == want == _rows(cow, "t1")
    # subsequent mutations keep working on the compacted layout
    cow.delete_doc("t1", 3)
    mor.delete_doc("t1", 3)
    assert _rows(mor, "t1") == _rows(cow, "t1")


def test_truncate_invalidates_vectors(stores):
    _, mor = stores
    mor.delete_doc("t1", 1)
    assert mor.deletion_vector_count() == 2
    mor.truncate_collection("t1")
    assert mor.deletion_vector_count() == 0
    assert mor.read_tenant("t1").count() == 0
    assert "user_t1" in mor.list_collections()


def test_time_travel_reads_each_snapshot(spark, tmp_path):
    from vector_db_handler_spark.store_mor import VersionedMorPointsStore

    store = VersionedMorPointsStore(spark, str(tmp_path / "vmor"), vector_size=DIM)
    _seed(store)  # two appends -> v1, v2
    assert store.versions() == [1, 2]
    v_full = store.versions()[-1]
    full = _rows(store, "t1")

    store.delete_doc("t1", 2)      # -> v3
    after_del = _rows(store, "t1")
    store.update_vector("t1", [7.0] * DIM, 3, 0)  # -> v4
    after_upd = _rows(store, "t1")
    assert store.versions() == [1, 2, 3, 4]

    # snapshots replay exactly; data files are immutable so this is free
    assert _rows_df(store.read_version(v_full), "t1") == full
    assert _rows_df(store.read_version(3), "t1") == after_del
    assert _rows_df(store.read_version(4), "t1") == after_upd
    # other tenant identical in every snapshot
    assert _rows_df(store.read_version(2), "t2") == _rows(store, "t2")


def test_time_travel_dies_loudly_past_vacuum_horizon(spark, tmp_path):
    from vector_db_handler_spark.store_mor import VersionedMorPointsStore

    store = VersionedMorPointsStore(spark, str(tmp_path / "vmor2"), vector_size=DIM)
    _seed(store)
    store.delete_doc("t1", 1)      # v3: vectors mask rows
    pre_compact = _rows(store, "t1")
    store.compact("t1")            # v4: REWRITES files (vacuum)
    assert _rows(store, "t1") == pre_compact  # content unchanged
    with pytest.raises(ValueError, match="vacuum horizon"):
        store.read_version(2).collect()
    # the post-compact snapshot reads fine
    assert _rows_df(store.read_version(store.versions()[-1]), "t1") == pre_compact


def _rows_df(df, uid):
    return sorted(
        (r["doc_id"], r["chunk_id"], r["title"], tuple(r["embedding"]))
        for r in df.filter(f"user_id = '{uid}'").collect()
    )


def test_streaming_ingest_exactly_once_into_versioned_store(spark, tmp_path):
    """Two micro-batches ingest as two commits; a FULL REPLAY from a
    fresh checkpoint (the at-least-once failure mode foreachBatch
    alone cannot exclude) re-delivers both batches, and the
    batch-id-in-manifest guard drops both — row counts and version
    history stay exactly once."""
    from pyspark.sql import functions as F

    from vector_db_handler_spark.store_mor import (
        VersionedMorPointsStore,
        streaming_ingest_exactly_once,
    )

    store = VersionedMorPointsStore(spark, str(tmp_path / "sink"), vector_size=DIM)
    src = str(tmp_path / "incoming")

    def points(lo, hi):
        return spark.range(lo, hi).select(
            F.expr("uuid()").alias("point_id"),
            F.lit("t1").alias("user_id"),
            F.col("id").alias("doc_id"),
            F.lit(0).cast("long").alias("chunk_id"),
            F.lit("d").alias("title"),
            F.create_map().cast("map<string,string>").alias("payload"),
            F.array(*[F.lit(1.0).cast("float")] * DIM).alias("embedding"),
            F.lit(float(DIM) ** 0.5).alias("embedding_norm"),
        )

    points(0, 10).coalesce(1).write.mode("append").parquet(src)
    points(10, 15).coalesce(1).write.mode("append").parquet(src)
    schema = spark.read.parquet(src).schema

    def run(cp):
        streaming_ingest_exactly_once(
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src),
            store,
            cp,
        )

    run(str(tmp_path / "cp1"))
    assert store.read_tenant("t1").count() == 15
    batches = {store._manifest(v).get("ingest_batch") for v in store.versions()}
    assert batches == {0, 1}

    # replay from scratch: the engine re-delivers batches 0 and 1, the
    # manifest guard drops both
    run(str(tmp_path / "cp2"))
    assert store.read_tenant("t1").count() == 15
    assert len(store.versions()) == 2


# ---------------------------------------------------------------------------
# optimistic concurrency
# ---------------------------------------------------------------------------


def test_commit_expected_version_conflict(spark, tmp_path):
    """Two writers hold the same base version; the one committing on a
    stale base fails with ConcurrentCommitError, and succeeds after
    re-reading the head."""
    from vector_db_handler_spark.store_mor import (
        ConcurrentCommitError,
        VersionedMorPointsStore,
    )

    store = VersionedMorPointsStore(spark, str(tmp_path / "occ"), vector_size=DIM)
    _seed(store)
    base = store.versions()[-1]

    v_a = store.commit(expected_version=base)  # writer A lands
    assert v_a == base + 1

    with pytest.raises(ConcurrentCommitError):
        store.commit(expected_version=base)    # writer B's stale base

    assert store.commit(expected_version=v_a) == v_a + 1  # B retries


def test_commit_occupied_version_slot_raises(spark, tmp_path):
    """A writer that loses the version-file race raises instead of
    silently clobbering history, and the table's committed history
    stays readable."""
    import json
    import os

    from vector_db_handler_spark.store_mor import (
        ConcurrentCommitError,
        VersionedMorPointsStore,
    )

    store = VersionedMorPointsStore(spark, str(tmp_path / "occ2"), vector_size=DIM)
    _seed(store)
    head = store.versions()[-1]
    cdir = os.path.join(str(tmp_path / "occ2"), "_commits")
    with open(os.path.join(cdir, f"v{head + 1:05d}.json"), "w") as fh:
        json.dump({"version": head + 1, "data": {}, "deletes": {}}, fh)
    # Simulate the race window: the writer listed versions BEFORE the
    # racer's file landed, so it targets the now-occupied v{head+1}.
    from unittest import mock

    with mock.patch.object(
        VersionedMorPointsStore, "versions", return_value=list(range(1, head + 1))
    ):
        with pytest.raises(ConcurrentCommitError):
            store.commit()
    assert head + 1 in store.versions()  # the planted commit owns the slot


# ---------------------------------------------------------------------------
# write-audit-publish
# ---------------------------------------------------------------------------


def _wap_points(spark, titles, start_doc=50):
    from pyspark.sql import functions as F

    rows = [(i, t) for i, t in enumerate(titles)]
    return spark.createDataFrame(rows, "i long, title string").select(
        F.expr("uuid()").alias("point_id"),
        F.lit("t1").alias("user_id"),
        (F.col("i") + start_doc).alias("doc_id"),
        F.lit(0).cast("long").alias("chunk_id"),
        F.col("title"),
        F.create_map().cast("map<string,string>").alias("payload"),
        F.array(*[F.lit(1.0).cast("float")] * DIM).alias("embedding"),
        F.lit(float(DIM) ** 0.5).alias("embedding_norm"),
    )


def test_write_audit_publish_gates_bad_batches(spark, tmp_path):
    """A staged batch that breaks a constraint is rolled back — no new
    version, no staged rows remain; a clean batch publishes."""
    from vector_db_handler_spark.operators import dq
    from vector_db_handler_spark.store_mor import (
        AuditFailedError,
        VersionedMorPointsStore,
        write_audit_publish,
    )

    store = VersionedMorPointsStore(spark, str(tmp_path / "wap"), vector_size=DIM)
    _seed(store)
    head = store.versions()[-1]
    n_before = store.read_tenant("t1").count()

    with pytest.raises(AuditFailedError) as ei:
        write_audit_publish(
            store, _wap_points(spark, ["ok", None]), [dq.completeness("title")]
        )
    assert "completeness" in str(ei.value)
    assert store.versions()[-1] == head              # nothing published
    assert store.read_tenant("t1").count() == n_before  # rolled back

    v = write_audit_publish(
        store, _wap_points(spark, ["good"], start_doc=90),
        [dq.completeness("title")],
    )
    assert v == head + 1
    assert store.read_tenant("t1").count() == n_before + 1


# ---------------------------------------------------------------------------
# torn-commit crash recovery (r7 verdict ask #7 + ADVICE r7)
# ---------------------------------------------------------------------------


def test_clean_store_has_no_orphans(spark, tmp_path):
    from vector_db_handler_spark.store_mor import VersionedMorPointsStore

    store = VersionedMorPointsStore(spark, str(tmp_path / "clean"), vector_size=DIM)
    _seed(store)
    store.delete_doc("t1", 2)
    assert store.orphan_files() == []
    assert store.reconcile() == []


def _crash_commit_once(store, monkeypatch):
    """Make the NEXT commit die after file writes, like a killed job."""
    real = type(store).commit

    def dying(self, *a, **kw):
        monkeypatch.setattr(type(self), "commit", real)
        raise RuntimeError("injected crash before commit")

    monkeypatch.setattr(type(store), "commit", dying)


def test_torn_delete_between_dv_write_and_commit(spark, tmp_path, monkeypatch):
    """Crash injected AFTER the deletion-vector file lands, BEFORE the
    commit: the snapshot reader at the latest committed version never
    sees the half-applied delete, reconcile() removes the orphan DV so
    the live read() agrees again, and the retried delete converges."""
    from vector_db_handler_spark.store_mor import VersionedMorPointsStore

    store = VersionedMorPointsStore(spark, str(tmp_path / "torn1"), vector_size=DIM)
    _seed(store)
    v0 = store.versions()[-1]
    before = _rows(store, "t1")

    _crash_commit_once(store, monkeypatch)
    with pytest.raises(RuntimeError, match="injected crash"):
        store.delete_doc("t1", 2)

    # torn state: DV written, no commit — snapshot readers unaffected
    assert store.versions()[-1] == v0
    assert _rows_df(store.read_version(v0), "t1") == before
    orphans = store.orphan_files()
    assert orphans and all("_deletes" in p for p in orphans)

    # recovery: drop residue, retry, converge
    assert store.reconcile() == orphans
    assert _rows(store, "t1") == before  # live read healed
    store.delete_doc("t1", 2)
    assert store.orphan_files() == []
    assert {r[0] for r in _rows(store, "t1")} == {1, 3}
    assert _rows_df(store.read_version(store.versions()[-1]), "t1") == _rows(
        store, "t1"
    )


def test_torn_update_between_data_write_and_commit(spark, tmp_path, monkeypatch):
    """Crash between an update's kill+append file writes and its
    commit: BOTH the orphan DV and the orphan data file are detected
    and removed, and the retried update applies exactly once."""
    from vector_db_handler_spark.store_mor import VersionedMorPointsStore

    store = VersionedMorPointsStore(spark, str(tmp_path / "torn2"), vector_size=DIM)
    _seed(store)
    v0 = store.versions()[-1]
    before = _rows(store, "t1")

    _crash_commit_once(store, monkeypatch)
    with pytest.raises(RuntimeError, match="injected crash"):
        store.update_vector("t1", [7.0] * DIM, 3, 0)

    assert store.versions()[-1] == v0
    assert _rows_df(store.read_version(v0), "t1") == before
    orphans = store.orphan_files()
    kinds = {"_deletes" in p for p in orphans}
    assert kinds == {True, False}  # one DV file AND one data file

    store.reconcile()
    assert _rows(store, "t1") == before
    store.update_vector("t1", [7.0] * DIM, 3, 0)
    assert store.orphan_files() == []
    new = dict(((r[0], r[1]), r[3]) for r in _rows(store, "t1"))
    assert new[(3, 0)] == tuple([7.0] * DIM)
    assert len(new) == len(before)  # exactly once, no duplicate row


def test_torn_streaming_batch_replay_does_not_duplicate(spark, tmp_path):
    """The ADVICE r7 duplicate window: batch data files land but the
    job dies before the manifest commit.  The replayed batch must not
    double the rows — the sink reconciles the torn residue away before
    re-appending."""
    from pyspark.sql import functions as F

    from vector_db_handler_spark.store import PointsStore
    from vector_db_handler_spark.store_mor import (
        VersionedMorPointsStore,
        streaming_ingest_exactly_once,
    )

    store = VersionedMorPointsStore(spark, str(tmp_path / "sink2"), vector_size=DIM)
    src = str(tmp_path / "incoming2")

    batch = spark.range(0, 10).select(
        F.expr("uuid()").alias("point_id"),
        F.lit("t1").alias("user_id"),
        F.col("id").alias("doc_id"),
        F.lit(0).cast("long").alias("chunk_id"),
        F.lit("d").alias("title"),
        F.create_map().cast("map<string,string>").alias("payload"),
        F.array(*[F.lit(1.0).cast("float")] * DIM).alias("embedding"),
        F.lit(float(DIM) ** 0.5).alias("embedding_norm"),
    )
    batch.coalesce(1).write.mode("append").parquet(src)

    # simulate the torn first attempt: data files written, NO commit
    PointsStore.append(store, spark.read.parquet(src))
    assert store.versions() == [] and store.orphan_files() != []

    # replay from a fresh checkpoint — the sink must reconcile first
    schema = spark.read.parquet(src).schema
    streaming_ingest_exactly_once(
        spark.readStream.schema(schema).parquet(src),
        store,
        str(tmp_path / "cp_replay"),
    )
    assert store.read_tenant("t1").count() == 10  # NOT 20
    assert store.orphan_files() == []
    batches = {store._manifest(v).get("ingest_batch") for v in store.versions()}
    assert batches == {0}


# ---------------------------------------------------------------------------
# reconcile() hardening (r8 verdict ask #5 + ADVICE r8)
# ---------------------------------------------------------------------------


def _plant_residue(store, uid="t1", name="torn-residue.parquet"):
    """Copy a committed data file under a new name — the exact on-disk
    shape of a transaction that died between its file writes and its
    commit rename (or of a concurrent writer's pre-commit window)."""
    import glob
    import shutil as sh

    src = glob.glob(f"{store.root}/user_id={uid}/*.parquet")[0]
    dst = f"{store.root}/user_id={uid}/{name}"
    sh.copyfile(src, dst)
    return dst


def test_reconcile_age_guard(spark, tmp_path):
    """min_age_sec is the multi-writer escape hatch (Iceberg
    remove_orphan_files `older_than`): a just-written un-manifested
    file — indistinguishable from a live writer's staging file — must
    survive an age-guarded reconcile, and default reconcile (the
    single-writer contract) must remove it."""
    import os

    from vector_db_handler_spark.store_mor import VersionedMorPointsStore

    store = VersionedMorPointsStore(spark, str(tmp_path / "age"), vector_size=DIM)
    _seed(store)
    residue = _plant_residue(store)

    assert store.orphan_files() == [residue]
    # the file is seconds old: an hour-wide age guard classifies it as
    # possibly-live and leaves it alone
    assert store.orphan_files(min_age_sec=3600) == []
    assert store.reconcile(min_age_sec=3600) == []
    assert os.path.exists(residue)
    # a file older than the guard IS removed: backdate its mtime
    os.utime(residue, (1, 1))
    assert store.reconcile(min_age_sec=3600) == [residue]
    assert not os.path.exists(residue)


def test_mutation_sweeps_unrelated_residue(spark, tmp_path):
    """ADVICE r8: an auto-committing mutation must not manifest (or
    read) the residue of an UNRELATED torn transaction — it reconciles
    first, so the failed transaction stays failed."""
    import os

    from vector_db_handler_spark.store_mor import VersionedMorPointsStore

    store = VersionedMorPointsStore(spark, str(tmp_path / "sweep"), vector_size=DIM)
    _seed(store)
    n_t2 = store.read_tenant("t2").count()
    residue = _plant_residue(store, uid="t2")
    assert store.read_tenant("t2").count() == 2 * n_t2  # residue visible pre-fix

    store.delete_doc("t1", 2)  # unrelated mutation on another tenant

    assert not os.path.exists(residue)
    assert store.read_tenant("t2").count() == n_t2
    m = store._manifest(store.versions()[-1])
    assert "torn-residue.parquet" not in set(m["data"].get("user_id=t2", ()))
    assert store.orphan_files() == []


def test_replay_of_committed_batch_cleans_residue(spark, tmp_path):
    """ADVICE r8: the sink's has_ingest_batch/isEmpty early returns must
    not skip residue cleanup — reconcile runs before the guards, so a
    replay of an already-committed batch still heals the store."""
    import os

    from pyspark.sql import functions as F

    from vector_db_handler_spark.store_mor import (
        VersionedMorPointsStore,
        streaming_ingest_exactly_once,
    )

    store = VersionedMorPointsStore(spark, str(tmp_path / "sink3"), vector_size=DIM)
    src = str(tmp_path / "incoming3")
    batch = spark.range(0, 10).select(
        F.expr("uuid()").alias("point_id"),
        F.lit("t1").alias("user_id"),
        F.col("id").alias("doc_id"),
        F.lit(0).cast("long").alias("chunk_id"),
        F.lit("d").alias("title"),
        F.create_map().cast("map<string,string>").alias("payload"),
        F.array(*[F.lit(1.0).cast("float")] * DIM).alias("embedding"),
        F.lit(float(DIM) ** 0.5).alias("embedding_norm"),
    )
    batch.coalesce(1).write.mode("append").parquet(src)
    schema = spark.read.parquet(src).schema
    streaming_ingest_exactly_once(
        spark.readStream.schema(schema).parquet(src),
        store,
        str(tmp_path / "cp_a"),
    )
    assert store.read_tenant("t1").count() == 10

    residue = _plant_residue(store)  # unrelated torn transaction

    # fresh checkpoint ⇒ batch 0 replays; has_ingest_batch short-circuits
    # the append, but the reconcile must already have run
    streaming_ingest_exactly_once(
        spark.readStream.schema(schema).parquet(src),
        store,
        str(tmp_path / "cp_b"),
    )
    assert not os.path.exists(residue)
    assert store.orphan_files() == []
    assert store.read_tenant("t1").count() == 10


def test_wap_stage_does_not_publish_unrelated_residue(spark, tmp_path):
    """write_audit_publish reconciles before staging, so a torn
    transaction's residue cannot ride into the published manifest."""
    import os

    from vector_db_handler_spark.operators import dq
    from vector_db_handler_spark.store_mor import (
        VersionedMorPointsStore,
        write_audit_publish,
    )

    store = VersionedMorPointsStore(spark, str(tmp_path / "wap2"), vector_size=DIM)
    _seed(store)
    n_before = store.read_tenant("t1").count()
    residue = _plant_residue(store)

    v = write_audit_publish(
        store, _wap_points(spark, ["good"]), [dq.completeness("title")]
    )
    assert not os.path.exists(residue)
    m = store._manifest(v)
    assert "torn-residue.parquet" not in set(m["data"].get("user_id=t1", ()))
    assert store.read_tenant("t1").count() == n_before + 1


def test_random_mutation_walk_invariants(spark, tmp_path):
    """Seeded 12-step random walk over every mutation class on the
    versioned store.  After EVERY step three invariants must hold —
    the contract the r9 reconcile hardening is meant to preserve under
    arbitrary interleavings, not just the scripted scenarios:

    * no orphan files (auto-commit + reconcile leave a clean disk);
    * the live ``read()`` equals the latest snapshot
      ``read_version(latest)`` row-for-row;
    * every mutation advances the version (composite mutations like
      truncate — which delegates to drop — may commit more than one
      valid snapshot).
    """
    import random

    from vector_db_handler_spark.store_mor import VersionedMorPointsStore

    rng = random.Random(20260814)
    store = VersionedMorPointsStore(spark, str(tmp_path / "walk"), vector_size=DIM)
    _seed(store)

    def check():
        assert store.orphan_files() == []
        live = _rows(store, "t1") + _rows(store, "t2")
        v = store.versions()[-1]
        snap = sorted(
            (r["doc_id"], r["chunk_id"], r["title"], tuple(r["embedding"]))
            for r in store.read_version(v)
            .filter("user_id in ('t1','t2')")
            .collect()
        )
        assert live == snap, f"live read != snapshot v{v}"

    next_doc = 100
    ops = ["upsert", "delete_doc", "delete_chunk", "update", "compact", "truncate"]
    for step in range(12):
        op = rng.choice(ops)
        uid = rng.choice(["t1", "t2"])
        v_before = store.versions()[-1]
        if op == "upsert":
            store.upsert_vectors(
                uid,
                [[float(next_doc)] * DIM],
                [{"DocId": next_doc, "ChunkId": 0, "Title": f"d{next_doc}"}],
            )
            next_doc += 1
        elif op == "delete_doc":
            docs = [r[0] for r in _rows(store, uid)]
            store.delete_doc(uid, rng.choice(docs) if docs else 1)
        elif op == "delete_chunk":
            rows = _rows(store, uid)
            d, c = (rows[0][0], rows[0][1]) if rows else (1, 0)
            store.delete_chunk(uid, d, c)
        elif op == "update":
            rows = _rows(store, uid)
            d, c = (rows[-1][0], rows[-1][1]) if rows else (1, 0)
            store.update_vector(uid, [float(step) + 0.5] * DIM, d, c)
        elif op == "compact":
            store.compact(uid)
        elif op == "truncate":
            store.truncate_collection(uid)
        assert store.versions()[-1] >= v_before + 1, f"step {step} ({op})"
        check()
    # the walk must have exercised more than one mutation class
    assert next_doc > 100

"""Written MinHash-LSH index: build-once/probe-many parity with the
in-memory pipeline, plus the scan-pruning plan shape that makes the
probe cheap at scale."""

from __future__ import annotations

from pyspark.sql import functions as F

from vector_db_handler_spark.operators import dedup as dedup_ops

_THRESHOLD = 0.6


def _docs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def test_lsh_probe_matches_in_memory_pairs(spark, sf_dir, tmp_path):
    docs = _docs(spark, sf_dir)
    path = str(tmp_path / "lsh")
    dedup_ops.write_lsh_index(docs, path)

    # Probe with a slice of the corpus itself: the probe must surface
    # exactly the full pipeline's pairs that involve a probe doc
    # (same bands, same verification — only the storage differs).
    queries = docs.filter(F.col("doc_id") < 25)
    probed = dedup_ops.lsh_probe_table(spark, path, queries, _THRESHOLD)
    got = {
        (min(r["query_id"], r["corpus_id"]), max(r["query_id"], r["corpus_id"])): r["jaccard"]
        for r in probed.collect()
        if r["query_id"] != r["corpus_id"]
    }

    full = dedup_ops.minhash_lsh_pairs(docs, _THRESHOLD)
    q_ids = {r["doc_id"] for r in queries.select("doc_id").collect()}
    want = {
        (r["d1"], r["d2"]): r["jaccard"]
        for r in full.collect()
        if r["d1"] in q_ids or r["d2"] in q_ids
    }
    assert got == want

    # Every probe doc is in the index, so it must at least find itself
    # at jaccard 1.0 (docs long enough to have shingles).
    selfs = {r["query_id"] for r in probed.collect() if r["query_id"] == r["corpus_id"]}
    with_shingles = {
        r["doc_id"]
        for r in dedup_ops.shingle_index(queries).select("doc_id").distinct().collect()
    }
    assert selfs == with_shingles


def test_lsh_probe_pushes_key_filter_to_scan(spark, sf_dir, tmp_path):
    docs = _docs(spark, sf_dir)
    path = str(tmp_path / "lsh")
    dedup_ops.write_lsh_index(docs, path)
    probed = dedup_ops.lsh_probe_table(
        spark, path, docs.filter(F.col("doc_id") < 5), _THRESHOLD
    )
    plan = probed._sc._jvm.PythonSQLUtils.explainString(
        probed._jdf.queryExecution(), "formatted"
    )
    # The inlined key IN (...) predicate must reach the bands scan so
    # parquet min/max stats on the sorted key column can skip row
    # groups — the probe's I/O bound at scale.
    scan = plan.split("bands")[1]
    assert "PushedFilters" in scan and "In(key" in scan.split("PushedFilters")[1].splitlines()[0]


def test_lsh_probe_empty_query_batch(spark, sf_dir, tmp_path):
    docs = _docs(spark, sf_dir)
    path = str(tmp_path / "lsh")
    dedup_ops.write_lsh_index(docs, path)
    empty = docs.filter(F.lit(False))
    assert dedup_ops.lsh_probe_table(spark, path, empty, _THRESHOLD).count() == 0


def test_lsh_append_matches_full_rebuild(spark, sf_dir, tmp_path):
    docs = _docs(spark, sf_dir)
    old = docs.filter(F.col("doc_id") < 400)
    new = docs.filter(F.col("doc_id") >= 400)

    inc_path = str(tmp_path / "lsh_inc")
    dedup_ops.write_lsh_index(old, inc_path)
    dedup_ops.append_lsh_index(new, inc_path)

    full_path = str(tmp_path / "lsh_full")
    dedup_ops.write_lsh_index(docs, full_path)

    # A probe against the appended index must equal the same probe
    # against a from-scratch rebuild — including matches that pair a
    # probe doc with an APPENDED doc.
    queries = docs.filter(F.col("doc_id") % 20 == 0)
    key = lambda r: (r["query_id"], r["corpus_id"])
    got = {key(r): r["jaccard"]
           for r in dedup_ops.lsh_probe_table(spark, inc_path, queries, _THRESHOLD).collect()}
    want = {key(r): r["jaccard"]
            for r in dedup_ops.lsh_probe_table(spark, full_path, queries, _THRESHOLD).collect()}
    assert got == want
    # sanity: the appended half is actually reachable (self-matches)
    assert any(q >= 400 for q, _ in got)


def test_streaming_ingest_maintains_lsh_index(spark, sf_dir, tmp_path):
    """foreachBatch ingest: stream two document micro-batches into a
    written index; a probe against the maintained index must equal
    the probe against a from-scratch rebuild of the full corpus."""
    from vector_db_handler_spark.streaming import stream_ops

    docs = _docs(spark, sf_dir)
    old = docs.filter(F.col("doc_id") < 300)
    idx = str(tmp_path / "lsh_stream")
    dedup_ops.write_lsh_index(old, idx)

    # Two parquet files in the ingest dir; maxFilesPerTrigger=1 makes
    # availableNow process them as SEPARATE micro-batches, so the
    # append path runs more than once.
    ingest = tmp_path / "ingest"
    docs.filter((F.col("doc_id") >= 300) & (F.col("doc_id") < 400)).coalesce(
        1
    ).write.parquet(str(ingest / "b1"))
    docs.filter(F.col("doc_id") >= 400).coalesce(1).write.parquet(str(ingest / "b2"))
    stream = (
        spark.readStream.schema(stream_ops.DOCUMENTS_SCHEMA)
        .option("maxFilesPerTrigger", "1")
        .option("pathGlobFilter", "*.parquet")
        .option("recursiveFileLookup", "true")
        .parquet(str(ingest))
    )
    stream_ops.stream_maintain_lsh_index(stream, idx, str(tmp_path / "ckpt"))

    full = str(tmp_path / "lsh_full")
    dedup_ops.write_lsh_index(docs, full)
    queries = docs.filter(F.col("doc_id") % 20 == 0)
    key = lambda r: (r["query_id"], r["corpus_id"])
    got = {key(r): r["jaccard"]
           for r in dedup_ops.lsh_probe_table(spark, idx, queries, _THRESHOLD).collect()}
    want = {key(r): r["jaccard"]
            for r in dedup_ops.lsh_probe_table(spark, full, queries, _THRESHOLD).collect()}
    assert got == want
    assert any(c >= 300 for _, c in got), "streamed docs must be probe-reachable"

    # Replay safety: re-running the same ingest with a FRESH checkpoint
    # re-delivers batch ids 0..1; the per-batch markers must make the
    # re-appends no-ops, or every affected jaccard would double-count.
    stream_ops.stream_maintain_lsh_index(
        spark.readStream.schema(stream_ops.DOCUMENTS_SCHEMA)
        .option("maxFilesPerTrigger", "1")
        .option("pathGlobFilter", "*.parquet")
        .option("recursiveFileLookup", "true")
        .parquet(str(ingest)),
        idx,
        str(tmp_path / "ckpt2"),
    )
    again = {key(r): r["jaccard"]
             for r in dedup_ops.lsh_probe_table(spark, idx, queries, _THRESHOLD).collect()}
    assert again == want


def test_compaction_restores_single_file_per_band(spark, sf_dir, tmp_path):
    """After several appends, compaction must shrink each band
    partition back toward one file WITHOUT changing any probe
    result."""
    import glob

    docs = _docs(spark, sf_dir)
    idx = str(tmp_path / "lsh_c")
    dedup_ops.write_lsh_index(docs.filter(F.col("doc_id") < 300), idx)
    dedup_ops.append_lsh_index(docs.filter((F.col("doc_id") >= 300) & (F.col("doc_id") < 400)), idx)
    dedup_ops.append_lsh_index(docs.filter(F.col("doc_id") >= 400), idx)

    queries = docs.filter(F.col("doc_id") % 20 == 0)
    key = lambda r: (r["query_id"], r["corpus_id"])
    before = {key(r): r["jaccard"]
              for r in dedup_ops.lsh_probe_table(spark, idx, queries, _THRESHOLD).collect()}
    files_before = len(glob.glob(f"{idx}/bands/band=0/*.parquet"))
    assert files_before >= 3  # base + 2 appends

    dedup_ops.compact_lsh_index(spark, idx)

    files_after = len(glob.glob(f"{idx}/bands/band=0/*.parquet"))
    assert files_after < files_before
    after = {key(r): r["jaccard"]
             for r in dedup_ops.lsh_probe_table(spark, idx, queries, _THRESHOLD).collect()}
    assert after == before


def test_lsh_probe_join_fallback_matches_inline(spark, sf_dir, tmp_path):
    """Past max_inline_keys the probe switches from the IN (...) literal
    to a broadcast left-semi join on key — same rows either way."""
    docs = _docs(spark, sf_dir)
    path = str(tmp_path / "lsh")
    dedup_ops.write_lsh_index(docs, path)
    queries = docs.filter(F.col("doc_id") < 25)

    def rows(df):
        return sorted(map(tuple, df.collect()))

    inline = dedup_ops.lsh_probe_table(spark, path, queries, _THRESHOLD)
    fallback = dedup_ops.lsh_probe_table(
        spark, path, queries, _THRESHOLD, max_inline_keys=1
    )
    plan = fallback._sc._jvm.PythonSQLUtils.explainString(
        fallback._jdf.queryExecution(), "formatted"
    )
    assert "LeftSemi" in plan
    assert rows(inline) == rows(fallback)

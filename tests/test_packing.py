"""Sequence-packing layout semantics (operators/packing.py) and the
span-dedup keeper contract (operators/dedup.py span_dedup_corpus) on
constructed corpora — fixture parity runs in test_oracle_queries.py."""

from __future__ import annotations

from pyspark.sql import functions as F

from vector_db_handler_spark.operators.dedup import span_dedup_corpus
from vector_db_handler_spark.operators.packing import pack_sequences


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, source string, text string")


def test_pack_boundaries_and_straddle(spark):
    """Three docs of 3/4/5 tokens packed at seq_len=4: doc 1 fills
    [0,3), doc 2 spans the 4-boundary (start_seq 0 → end_seq 1), doc
    3 starts at token 7 inside seq 1 and ends in seq 2."""
    docs = _docs(
        spark,
        [
            (1, "s", "a b c"),
            (2, "s", "d e f g"),
            (3, "s", "h i j k l"),
        ],
    )
    got = {
        r.doc_id: (r.n_tokens, r.start_seq, r.start_offset, r.end_seq)
        for r in pack_sequences(docs, seq_len=4).collect()
    }
    assert got == {
        1: (3, 0, 0, 0),
        2: (4, 0, 3, 1),
        3: (5, 1, 3, 2),
    }


def test_pack_shards_are_independent(spark):
    """Each shard's stream starts at token 0 — adding a shard never
    moves another shard's boundaries."""
    one = _docs(spark, [(1, "a", "x y z"), (2, "a", "p q")])
    both = _docs(
        spark,
        [(1, "a", "x y z"), (2, "a", "p q"), (9, "b", "m n o r s t u v w")],
    )
    keep = lambda df: {  # noqa: E731
        r.doc_id: (r.start_seq, r.start_offset, r.end_seq)
        for r in df.filter(F.col("shard") == "a").collect()
    }
    assert keep(pack_sequences(one, seq_len=4)) == keep(
        pack_sequences(both, seq_len=4)
    )
    b = {
        r.doc_id: (r.start_seq, r.start_offset)
        for r in pack_sequences(both, seq_len=4)
        .filter(F.col("shard") == "b")
        .collect()
    }
    assert b == {9: (0, 0)}


def test_pack_single_shuffle_on_shard(spark):
    """The layout costs ONE exchange (hash on the shard key feeding
    the window sort); no global single-partition window."""
    docs = _docs(spark, [(i, f"s{i % 3}", "a b c") for i in range(30)])
    plan = pack_sequences(docs, seq_len=8)._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 1, plan
    assert "SinglePartition" not in plan, plan


def test_span_dedup_keeps_first_occurrence_only(spark):
    """A 10-token span planted in three docs survives only at its
    smallest (doc_id, span_idx); unique spans are untouched; a doc
    made ENTIRELY of duplicate spans disappears from the output."""
    span = "t0 t1 t2 t3 t4 t5 t6 t7 t8 t9"
    u = lambda i: " ".join(f"u{i}_{j}" for j in range(10))  # noqa: E731
    docs = spark.createDataFrame(
        [
            (1, u(1) + " " + span),          # span at span_idx 1 — keeper
            (2, span + " " + u(2)),          # span at span_idx 0 — dropped
            (3, span),                        # only the span — doc vanishes
        ],
        "doc_id long, text string",
    )
    got = {r.doc_id: (r.n_spans, r.n_kept, r.kept_text) for r in
           span_dedup_corpus(docs, span_tokens=10).collect()}
    assert set(got) == {1, 2}
    assert got[1] == (2, 2, u(1) + " " + span)
    assert got[2] == (2, 1, u(2))


def test_span_dedup_intra_doc_repeats_collapse(spark):
    """The census counts OCCURRENCES, not docs: the same span twice
    inside one doc keeps only its first site."""
    span = "r0 r1 r2 r3 r4 r5 r6 r7 r8 r9"
    docs = spark.createDataFrame(
        [(5, span + " " + span)], "doc_id long, text string"
    )
    [row] = span_dedup_corpus(docs, span_tokens=10).collect()
    assert (row.n_spans, row.n_kept, row.kept_text) == (2, 1, span)


def test_write_training_shards_layout_and_manifest(spark, sf_dir, tmp_path):
    from vector_db_handler_spark.operators.packing import write_training_shards

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    out = str(tmp_path / "shards")
    manifest = {r.shard: (r.n_docs, r.n_tokens) for r in
                write_training_shards(docs, out).collect()}
    back = spark.read.parquet(out)
    # every doc present exactly once, carried token counts correct
    assert back.count() == docs.count()
    per_shard = {
        r.shard: (r.n, r.t)
        for r in back.groupBy("shard")
        .agg(F.count("*").alias("n"), F.sum("n_tokens").alias("t"))
        .collect()
    }
    assert per_shard == manifest
    # one file per shard (loader-independent units)
    import glob as _glob
    import os as _os

    shard_dirs = [d for d in _os.listdir(out) if d.startswith("shard=")]
    assert len(shard_dirs) == len(manifest)
    for d in shard_dirs:
        files = _glob.glob(f"{out}/{d}/*.parquet")
        assert len(files) == 1, f"{d} fragmented: {files}"
    # rows inside a shard file are in packing order (ascending doc_id)
    one = sorted(manifest)[0]
    ids = [r.doc_id for r in spark.read.parquet(f"{out}/shard={one}").collect()]
    assert ids == sorted(ids)

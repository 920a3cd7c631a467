"""Sequence packing for LLM pretraining: concatenate documents in a
deterministic order and split the token stream into fixed-length
training sequences, computing for every doc which sequence it starts
in and at what offset — the "concat-and-chunk" layout GPT-style
pretraining uses (docs are packed back-to-back, a sequence boundary
may bisect a doc).

Not in the reference (no notion of tokens or training there); part of
the LLM-data-pipeline extension surface.

Scale shape: packing is a RUNNING SUM, which is inherently ordered —
a single global window would serialize the corpus through one task.
The scalable layout packs WITHIN A SHARD (here: the ``source``
column; in production: the input file/shard id), which is exactly
what real pipelines do — each data shard is tokenized and packed
independently, and sequence ids are made globally unique by
(shard, seq_in_shard).  One shuffle on the shard key; the window
runs per shard partition; integer-exact everywhere so any engine
agrees on every boundary.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def pack_sequences(
    docs: DataFrame,
    seq_len: int = 2048,
    shard_col: str = "source",
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Assign every doc its place in the packed token stream of its
    shard: ``(doc_id, shard, n_tokens, start_seq, start_offset,
    end_seq)`` where ``start_seq``/``end_seq`` are the sequence
    indexes (length ``seq_len``) containing the doc's first and last
    token, and ``start_offset`` is the position of its first token
    inside ``start_seq``.  Docs are packed in ascending ``id_col``
    order within each shard; a doc with ``end_seq > start_seq``
    straddles a boundary (the packing consumer truncates or masks
    across it — this operator computes the layout, not the policy).

    Token counts are whitespace tokens (``split(text, ' ')``),
    matching the rest of the text surface; swap in a real tokenizer's
    counts upstream without changing the packing math.
    """
    n_tok = F.size(F.split(F.col(text_col), " ", -1))
    # The window runs over the RENAMED projection (doc_id/shard), so it
    # partitions on "shard" regardless of the input column names.
    w = (
        Window.partitionBy("shard")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = F.sum("n_tokens").over(w)
    # Integer `div`, not float `/`-then-cast: exact at any stream
    # length (a double division would wobble past 2^53 tokens).
    return (
        docs.select(
            F.col(id_col).alias("doc_id"),
            F.col(shard_col).alias("shard"),
            n_tok.cast("long").alias("n_tokens"),
        )
        .withColumn("start_tok", cum - F.col("n_tokens"))
        .select(
            "doc_id",
            "shard",
            "n_tokens",
            F.expr(f"start_tok div {int(seq_len)}").alias("start_seq"),
            (F.col("start_tok") % seq_len).alias("start_offset"),
            F.expr(
                f"(start_tok + n_tokens - 1) div {int(seq_len)}"
            ).alias("end_seq"),
        )
    )


def write_training_shards(
    docs: DataFrame,
    path: str,
    shard_col: str = "source",
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """The end of the pipeline: materialize the training corpus as one
    parquet file per shard (docs in packing order — ascending id
    within shard, matching :func:`pack_sequences`' layout) and return
    the MANIFEST: ``(shard, n_docs, n_tokens)``.

    A trainer's data loader consumes exactly this shape — per-shard
    files it can open independently, plus a manifest to plan epochs
    and to resume from (shard, offset) checkpoints without listing the
    filesystem.  Writing is ONE repartition on the shard key (each
    shard's rows land in one task → one file via write-time
    partitionBy); the manifest is a map-side-combined aggregate over
    the same scan, so the whole export is two jobs regardless of
    corpus size.  At 100 TB, ``shard_col`` is a composite
    (source, bucket) key sized so a shard fits a loader worker."""
    data = docs.select(
        F.col(id_col).alias("doc_id"),
        F.col(shard_col).alias("shard"),
        F.col(text_col).alias("text"),
        F.size(F.split(F.col(text_col), " ", -1)).cast("long").alias("n_tokens"),
    )
    (
        data.repartition("shard")
        .sortWithinPartitions("shard", "doc_id")
        .write.mode("overwrite")
        .partitionBy("shard")
        .parquet(path)
    )
    return (
        data.groupBy("shard")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tokens").alias("n_tokens"),
        )
    )

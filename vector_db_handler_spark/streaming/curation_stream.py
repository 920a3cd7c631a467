"""Streaming / incremental CURATION — the delta form of
`operators.curation.curation_manifest`, and the fifth exactly-once
serve twin (after the KNN, NB, HLL and graph-index stores).

Why it exists: a 100 TB pretraining corpus is not curated once — new
crawl drops arrive continuously, and re-running the whole
dedup→quality→mixture→pack→shard pipeline over the full corpus per
drop re-pays the expensive part (tokenizing, hashing, bigramming and
quality-gating EVERY byte of raw text) to re-make cheap decisions.
The split this module implements is the classic IVM shape:

* **Per-document feature extraction is incremental** — each arrival
  batch is deduped (first-seen-wins against the store, min-id within
  the batch), Gopher-gated, and reduced to a compact per-doc feature
  row ``(doc_id, domain, th, n_tokens)`` plus an additive per-batch
  bigram aggregate ``(domain, bigram, occ)``.  Raw text is read
  EXACTLY ONCE per document, at arrival.
* **The decision layer is re-derived from state** — mixture weights,
  quotas, selection and sharding re-run at emit time over feature
  rows (a few longs per surviving doc) and the merged bigram
  aggregate.  That work is survivor-count-sized, never raw-text-sized:
  at 100 TB the state relation is ~10⁻³ of the corpus bytes.

Store layout under ``state_path`` (the graph-index ingest's
discipline, verbatim): each micro-batch writes its OWN
``docs/batch=<id>/`` and ``bigrams/batch=<id>/`` directories; a batch
is COMMITTED when both ``_SUCCESS`` markers exist; readers union
committed batches only, so a crashed batch is invisible.  Replay
guards: a committed batch short-circuits to a no-op, and the dedup
state a batch sees is capped to batches STRICTLY BELOW its own id —
a replayed computation sees exactly the state the original saw and
rewrites identical files.

Dedup semantics: FIRST-SEEN WINS (the streaming dedup contract the
registered `streaming_dedup_first` family pins).  When arrival order
is aligned with id order (later batches carry larger ids — the
registered row's arrival shape, and the natural shape for
monotonically-assigned ids), first-seen coincides with the batch
pipeline's min-id winner, so `curation_manifest_from_state` equals
`curation_manifest` over the unioned corpus bit-for-bit (pinned by
test and by the registered row's DuckDB twin).

Reference scope: the reference's ingest is upsert-one-doc-at-a-time
into Qdrant (app/core/document_ingestor.py:571-720); this is the
corpus-side continuous curation that would feed such a store.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from vector_db_handler_spark.functions import text as text_fns
from vector_db_handler_spark.operators.curation import (
    apportion_select_shard,
    gopher_keep_expr,
)


def _committed_batches(state_path: str, max_batch: int | None = None) -> list[int]:
    """Batch ids with BOTH _SUCCESS markers, strictly below
    ``max_batch`` (None = all), ascending."""
    root = os.path.join(state_path, "docs")
    out: list[int] = []
    if not os.path.isdir(root):
        return out
    for d in os.listdir(root):
        if not d.startswith("batch="):
            continue
        try:
            v = int(d.split("=", 1)[1])
        except ValueError:
            continue  # stray non-numeric entry: skip, don't serve it
        if max_batch is not None and v >= max_batch:
            continue
        if os.path.exists(
            os.path.join(root, d, "_SUCCESS")
        ) and os.path.exists(
            os.path.join(state_path, "bigrams", f"batch={v}", "_SUCCESS")
        ):
            out.append(v)
    return sorted(out)


def curation_state_docs(
    spark: SparkSession, state_path: str, max_batch: int | None = None
) -> DataFrame | None:
    """The committed per-doc feature relation
    ``(doc_id, domain, th, n_tokens)`` — None when no batch has
    committed yet."""
    batches = _committed_batches(state_path, max_batch)
    if not batches:
        return None
    out = None
    for v in batches:
        df = spark.read.parquet(
            os.path.join(state_path, "docs", f"batch={v}")
        )
        out = df if out is None else out.unionByName(df)
    return out


def _state_bigrams(
    spark: SparkSession, state_path: str, batches: list[int]
) -> DataFrame:
    out = None
    for v in batches:
        df = spark.read.parquet(
            os.path.join(state_path, "bigrams", f"batch={v}")
        )
        out = df if out is None else out.unionByName(df)
    return out


def streaming_curation_ingest(
    doc_stream: DataFrame,
    state_path: str,
    checkpoint: str,
    domain_col: str = "lang",
    text_col: str = "text",
    id_col: str = "doc_id",
    timeout_sec: int = 180,
) -> None:
    """Drain a document stream into the curation state store: each
    micro-batch is deduped (min-id within the batch, first-seen-wins
    against committed state), Gopher-gated, and written as one
    ``docs/batch=<id>/`` feature file-set plus one additive
    ``bigrams/batch=<id>/`` aggregate.  Raw text never enters the
    store.

    OPERATIONAL CONTRACT: like the graph-index ingest, the
    ``checkpoint`` must be retained across the store's lifetime — a
    fresh checkpoint restarts batch ids at 0 and the
    committed-directory short-circuit would silently drop genuinely
    new arrivals landing on recycled ids."""
    from vector_db_handler_spark.operators.lm_score import _bigrams

    def ingest(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        ddir = os.path.join(state_path, "docs", f"batch={int(batch_id)}")
        gdir = os.path.join(state_path, "bigrams", f"batch={int(batch_id)}")
        if os.path.exists(os.path.join(ddir, "_SUCCESS")) and os.path.exists(
            os.path.join(gdir, "_SUCCESS")
        ):
            # Crash landed after this batch's commit but before the
            # checkpoint commit: the store state IS these directories.
            # Logged loudly (r14 ADVICE discipline, as in the graph
            # store): under a FRESH checkpoint, batch ids restart at 0
            # and a genuinely NEW arrival landing on a committed id is
            # dropped here — the short-circuit cannot tell a crash
            # replay from a recycled id.
            import logging

            logging.getLogger(__name__).warning(
                "streaming_curation_ingest: batch id %s is already "
                "committed under %s and was SKIPPED. Expected for a "
                "crash replay under the retained checkpoint; if this is "
                "a FRESH checkpoint, these arrivals were NOT ingested — "
                "retain the original checkpoint across the store's "
                "lifetime.",
                int(batch_id),
                state_path,
            )
            return
        spark = batch_df.sparkSession
        th = text_fns.portable_hash60(F.col(text_col))
        w_dedup = Window.partitionBy("_th").orderBy(F.col(id_col).asc())
        cand = (
            batch_df.withColumn("_th", th)
            .withColumn("_rn", F.row_number().over(w_dedup))
            .filter(F.col("_rn") == 1)
            .drop("_rn")
        )
        prior = curation_state_docs(spark, state_path, max_batch=int(batch_id))
        if prior is not None:
            cand = cand.join(
                prior.select(F.col("th").alias("_th")).distinct(),
                "_th",
                "left_anti",
            )
        accepted = cand.filter(gopher_keep_expr(text_col)).localCheckpoint(
            eager=True
        )
        # bigrams FIRST, docs/_SUCCESS second: the reader requires both
        # markers, so a crash between the writes leaves an uncommitted
        # (invisible) batch either way.
        (
            accepted.filter(F.col(domain_col).isNotNull())
            .select(
                F.col(domain_col).alias("domain"),
                F.explode(_bigrams(text_col)).alias("bigram"),
            )
            .groupBy("domain", "bigram")
            .agg(F.count(F.lit(1)).cast("long").alias("occ"))
            .write.mode("overwrite")
            .parquet(gdir)
        )
        accepted.select(
            F.col(id_col).alias("doc_id"),
            F.col(domain_col).alias("domain"),
            F.col("_th").alias("th"),
            text_fns.token_count(F.col(text_col)).cast("long").alias(
                "n_tokens"
            ),
        ).write.mode("overwrite").parquet(ddir)

    q = (
        doc_stream.writeStream.foreachBatch(ingest)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(timeout_sec)
    if q.isActive:
        q.stop()
        raise TimeoutError(f"curation ingest did not drain within {timeout_sec}s")


def curation_manifest_from_state(
    spark: SparkSession,
    state_path: str,
    total_n: int,
    shards: list[str],
    salt: str = "curate",
    mixture_rounds: int = 2,
    mixture_base: int = 4000,
) -> DataFrame:
    """Emit the curation manifest from the state store — the decision
    layer of `curation_manifest` re-derived over feature rows instead
    of raw text:

    * mixture weights from the MERGED bigram aggregate, by exactly
      `domain_mixture_weights`' arithmetic (per-occurrence credit =
      bit-length of the GLOBAL bigram count, milli-credits by exact
      integer division, ``(base + excess)^rounds`` floored at 1);
    * stages 4-6 via `apportion_select_shard` — the SAME code object
      the batch pipeline runs, so the two paths cannot drift.

    For id-aligned arrival order (later batches carry larger ids) the
    result equals ``curation_manifest(base ∪ arrivals)`` bit-for-bit.
    Returns ``(shard, domain, n_docs, n_tokens, sum_doc_id)``."""
    if total_n < 0:
        raise ValueError(f"total_n must be >= 0, got {total_n}")
    if not shards:
        raise ValueError("need at least one shard name")
    max_numer = (int(mixture_base) + 64000) ** int(mixture_rounds)
    if int(total_n) * max_numer > 2**63 - 1:
        raise ValueError(
            f"total_n={total_n} with mixture_base={mixture_base}, "
            f"mixture_rounds={mixture_rounds} can overflow BIGINT (same "
            "preflight as curation_manifest)"
        )
    batches = _committed_batches(state_path)
    if not batches:
        raise ValueError(
            f"no committed curation state under {state_path} — drain at "
            "least one batch with streaming_curation_ingest first"
        )
    docs = curation_state_docs(spark, state_path)
    # Defensive cross-batch re-dedup (min-id per text hash).  The
    # ingest's strictly-below-own-id anti-join already guarantees one
    # row per th, so this window is a no-op in a healthy store — it
    # exists so a manually-assembled state dir still emits the batch
    # pipeline's answer.
    w_dedup = Window.partitionBy("th").orderBy(F.col("doc_id").asc())
    docs = (
        docs.withColumn("_rn", F.row_number().over(w_dedup))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )

    # DoReMi-lite weights from the merged additive bigram aggregate —
    # domain_mixture_weights' arithmetic over (domain, bigram, occ).
    big = _state_bigrams(spark, state_path, batches).groupBy(
        "domain", "bigram"
    ).agg(F.sum("occ").alias("occ"))
    model = big.groupBy("bigram").agg(F.sum("occ").alias("n"))
    per_domain = (
        big.join(model, "bigram")
        .groupBy("domain")
        .agg(
            F.sum("occ").alias("n_bigrams"),
            F.sum(
                F.col("occ") * F.length(F.bin(F.col("n")))
            ).alias("credit"),
        )
    )
    glob = per_domain.groupBy().agg(
        F.sum("n_bigrams").alias("tot_bigrams"),
        F.sum("credit").alias("tot_credit"),
    )
    d_milli = F.expr("CAST(1000 * credit AS BIGINT) div n_bigrams")
    g_milli = F.expr("CAST(1000 * tot_credit AS BIGINT) div tot_bigrams")
    scored = per_domain.crossJoin(F.broadcast(glob)).select(
        "domain", (g_milli - d_milli).cast("long").alias("excess_milli")
    )
    u = F.greatest(
        F.lit(1).cast("long"),
        F.lit(int(mixture_base)) + F.col("excess_milli"),
    )
    numer = u
    for _ in range(int(mixture_rounds) - 1):
        numer = numer * u
    weights = scored.select(
        "domain", numer.cast("long").alias("weight_numer")
    )

    return apportion_select_shard(
        docs,
        weights,
        total_n,
        shards,
        domain_col="domain",
        id_col="doc_id",
        salt=salt,
        ntok_col="n_tokens",
    )

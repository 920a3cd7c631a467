"""Golden TRAINING-DATA pipeline: the extension operators chained
end-to-end the way a curation run actually uses them —

    quality gate → exact dedup → near-dedup (LSH → components →
    canonical) → eval-set decontamination → substring-duplication
    audit → sequence packing

— asserting the CROSS-STAGE invariants the per-operator tests cannot
see: monotone corpus shrinkage, idempotence of the dedup stages,
zero eval-gram leakage in the survivors, duplication mass strictly
reduced by dedup, token conservation through packing, and end-to-end
determinism.  (The reference-surface twin is test_golden_scenario;
this is its pipeline-pillar counterpart.)"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from vector_db_handler_spark.operators.dedup import (
    canonical_docs,
    connected_components,
    duplicated_substring_spans,
    exact_dedup,
    hashed_shingle_index,
    minhash_lsh_pairs,
)
from vector_db_handler_spark.operators.packing import pack_sequences


@pytest.fixture(scope="module")
def corpus(spark, sf_dir):
    docs = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .filter("text is not null")
        .select("doc_id", "source", "text", F.length("text").alias("n_chars"))
    )
    # eval set: every 19th doc plays the held-out benchmark whose
    # content must not leak into training data
    ev = docs.filter(F.col("doc_id") % 19 == 0).select("doc_id", "text")
    base = docs.join(ev.select("doc_id"), "doc_id", "left_anti")
    # Plant each stage's prey so the test is self-contained against
    # fixture vintage: exact copies (id+1M), near copies with a token
    # appended (id+2M), eval-verbatim contamination (id+3M), and one
    # sub-quality stub (id+4M).
    sample = base.orderBy("doc_id").limit(10)
    exact_copies = sample.select(
        (F.col("doc_id") + 1_000_000).alias("doc_id"), "source", "text", "n_chars"
    )
    near_copies = sample.select(
        (F.col("doc_id") + 2_000_000).alias("doc_id"),
        "source",
        F.concat("text", F.lit(" planted-tail-token")).alias("text"),
        (F.col("n_chars") + 19).alias("n_chars"),
    )
    contaminated = ev.orderBy("doc_id").limit(5).select(
        (F.col("doc_id") + 3_000_000).alias("doc_id"),
        F.lit("planted").alias("source"),
        "text",
        F.length("text").alias("n_chars"),
    )
    stub = spark.createDataFrame(
        [(4_000_000, "planted", "too short", 9)],
        "doc_id long, source string, text string, n_chars int",
    )
    train = (
        base.unionByName(exact_copies)
        .unionByName(near_copies)
        .unionByName(contaminated)
        .unionByName(stub)
    )
    return train.localCheckpoint(eager=True), ev.localCheckpoint(eager=True)


def _run_pipeline(spark, train, ev):
    # 1. quality gate (in-row, no shuffle)
    n_words = F.size(F.split("text", " ", -1))
    quality = train.filter(n_words >= 5)

    # 2. exact dedup: keep each text's min-id copy
    keep_exact = exact_dedup(quality).select(
        F.col("keep_id").alias("doc_id")
    )
    exact = quality.join(keep_exact, "doc_id", "left_semi")

    # 3. near-dedup: LSH pairs → components → canonical per cluster
    pairs = minhash_lsh_pairs(exact, threshold=0.5)
    comps = connected_components(pairs)
    canon = canonical_docs(exact, comps, quality_col="n_chars")
    drop_noncanon = comps.join(
        canon.select(F.col("canonical_doc_id").alias("node")),
        "node",
        "left_anti",
    ).select(F.col("node").alias("doc_id"))
    near = exact.join(drop_noncanon, "doc_id", "left_anti")

    # 4. decontamination: drop any doc sharing a 3-word shingle hash
    #    with the eval set
    ev_grams = hashed_shingle_index(ev).select("h").distinct()
    train_grams = hashed_shingle_index(near)
    contaminated = (
        train_grams.join(ev_grams, "h", "left_semi")
        .select("doc_id")
        .distinct()
    )
    clean = near.join(contaminated, "doc_id", "left_anti")
    return quality, exact, near, clean


def test_pipeline_invariants(spark, corpus):
    train, ev = corpus
    quality, exact, near, clean = _run_pipeline(spark, train, ev)

    n_raw = train.count()
    n_q, n_e, n_n, n_c = (
        quality.count(),
        exact.count(),
        near.count(),
        clean.count(),
    )
    # monotone shrinkage, and every stage actually bites on the fixture
    assert n_raw >= n_q >= n_e >= n_n >= n_c
    assert n_e < n_q, "fixture plants exact duplicates"
    assert n_n < n_e, "fixture plants near-duplicates"
    assert n_c < n_n, "eval overlap must remove something"
    assert n_c > 0, "pipeline must not empty the corpus"

    # dedup idempotence: a second pass removes nothing
    again_exact = exact_dedup(clean).count()
    assert again_exact == n_c
    assert minhash_lsh_pairs(clean, threshold=0.5).count() == 0

    # decontamination is exact: survivors share zero grams with eval
    leak = (
        hashed_shingle_index(clean)
        .join(hashed_shingle_index(ev).select("h").distinct(), "h", "left_semi")
        .count()
    )
    assert leak == 0

    # substring-duplication mass must strictly drop through dedup
    def dup_tokens(df):
        r = (
            duplicated_substring_spans(df, k=8)
            .agg(F.sum("n_tokens"))
            .collect()[0][0]
        )
        return r or 0

    assert dup_tokens(clean) < dup_tokens(quality)

    # packing conserves every surviving token, in order
    packed = pack_sequences(clean, seq_len=512)
    total_tokens = clean.select(
        F.sum(F.size(F.split("text", " ", -1)))
    ).collect()[0][0]
    assert packed.agg(F.sum("n_tokens")).collect()[0][0] == total_tokens
    assert packed.count() == n_c
    # per-shard layout is gapless: next doc starts where the previous ended
    gaps = spark.sql(
        """
        SELECT count(*) AS n FROM (
          SELECT shard,
                 start_seq * 512 + start_offset AS start_tok,
                 n_tokens,
                 lead(start_seq * 512 + start_offset) OVER (
                   PARTITION BY shard ORDER BY doc_id) AS next_start
          FROM {p}
        ) WHERE next_start IS NOT NULL AND next_start != start_tok + n_tokens
        """,
        p=packed,
    ).collect()[0]["n"]
    assert gaps == 0


def test_pipeline_is_deterministic(spark, corpus):
    train, ev = corpus
    ids1 = {
        r["doc_id"] for r in _run_pipeline(spark, train, ev)[3].collect()
    }
    ids2 = {
        r["doc_id"]
        for r in _run_pipeline(spark, train.repartition(13), ev)[3].collect()
    }
    assert ids1 == ids2 and ids1

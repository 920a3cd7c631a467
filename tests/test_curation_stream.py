"""Streaming / incremental curation (`streaming.curation_stream`):
the fifth exactly-once serve twin — per-doc feature extraction is
incremental (dedup first-seen-wins, Gopher gate, token count, additive
bigram aggregate; raw text read once per doc), the decision layer
(mixture → quotas → selection → sharding) re-derives from compact
state at emit.  Pins: batch-equals-stream (emit == curation_manifest
over the unioned corpus, bit-for-bit, for id-aligned arrivals), the
exactly-once replay discipline, crash-batch invisibility, first-seen
dedup across batches, and the cross-engine DuckDB replay of the
manifest AND the manifest delta.  Staged in r15 for r16 driver
registration (oracles move to driver_queries then)."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from tests.oracle_check import assert_oracle_types_hashable, compare
from vector_db_handler_spark import driver_queries as dq
from vector_db_handler_spark.operators.curation import (
    curation_manifest,
    curation_manifest_delta,
)
from vector_db_handler_spark.streaming.curation_stream import (
    curation_manifest_from_state,
    curation_state_docs,
    streaming_curation_ingest,
)

#: Staged driver-row arrival shape: base = 2/3 of the corpus at
#: ORIGINAL ids; two arrival batches are the held-out third, ids
#: SHIFTED above every base id (+10M / +20M) so arrival order aligns
#: with id order and first-seen-wins ≡ the batch pipeline's min-id.
BASE_PRED = "doc_id % 3 != 0"
ARR_SLICES = (
    (10000000, "doc_id % 3 = 0 AND doc_id % 2 = 0"),
    (20000000, "doc_id % 3 = 0 AND doc_id % 2 = 1"),
)

_UNION_SOURCE = (
    "(SELECT doc_id, lang, text FROM documents WHERE doc_id % 3 != 0"
    " UNION ALL SELECT doc_id + 10000000 AS doc_id, lang, text"
    " FROM documents WHERE doc_id % 3 = 0 AND doc_id % 2 = 0"
    " UNION ALL SELECT doc_id + 20000000 AS doc_id, lang, text"
    " FROM documents WHERE doc_id % 3 = 0 AND doc_id % 2 = 1)"
)

STREAM_MANIFEST_SQL = dq._curation_sql(source=_UNION_SOURCE)

#: Manifest DELTA twin: the full chain over before and after corpora,
#: full-outer joined, zero-filled, changed-cells-only.
_DELTA_BEFORE = "(SELECT doc_id, lang, text FROM documents WHERE doc_id % 3 != 0)"


def _delta_sql() -> str:
    sql0 = dq._curation_sql(source=_DELTA_BEFORE)
    sql1 = dq._curation_sql(source="documents")
    return f"""
SELECT * FROM (
  SELECT COALESCE(a.shard, b.shard) AS shard,
         COALESCE(a.domain, b.domain) AS domain,
         COALESCE(a.n_docs, 0) AS n_docs_before,
         COALESCE(b.n_docs, 0) AS n_docs_after,
         COALESCE(b.n_docs, 0) - COALESCE(a.n_docs, 0) AS delta_docs,
         COALESCE(b.n_tokens, 0) - COALESCE(a.n_tokens, 0) AS delta_tokens,
         COALESCE(a.sum_doc_id, 0) != COALESCE(b.sum_doc_id, 0) AS set_changed
  FROM ({sql0}) a
  FULL OUTER JOIN ({sql1}) b
    ON a.shard = b.shard AND a.domain = b.domain
)
WHERE set_changed OR delta_docs != 0 OR delta_tokens != 0
"""


DELTA_SQL = _delta_sql()


def _docs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "lang", "text"
    )


def _build_state(spark, sf_dir, base) -> str:
    """Drain the staged arrival shape: base slice first, then the two
    shifted arrival slices, sequentially against one checkpoint."""
    state = os.path.join(base, "state")
    src = os.path.join(base, "src")
    docs = _docs(spark, sf_dir)
    legs = [docs.filter(BASE_PRED)] + [
        docs.filter(pred).select(
            (F.col("doc_id") + off).alias("doc_id"), "lang", "text"
        )
        for off, pred in ARR_SLICES
    ]
    for leg in legs:
        leg.coalesce(1).write.mode("append").parquet(src)
        stream = spark.readStream.schema(legs[0].schema).parquet(src)
        streaming_curation_ingest(stream, state, os.path.join(base, "cp"))
    return state


def _emit(spark, state):
    return curation_manifest_from_state(
        spark,
        state,
        dq._CURATION_TOTAL_N,
        dq._CURATION_SHARDS,
        salt=dq._CURATION_SALT,
    )


def _union_docs(spark, sf_dir):
    docs = _docs(spark, sf_dir)
    out = docs.filter(BASE_PRED)
    for off, pred in ARR_SLICES:
        out = out.unionByName(
            docs.filter(pred).select(
                (F.col("doc_id") + off).alias("doc_id"), "lang", "text"
            )
        )
    return out


def test_oracle_types_hashable(duck):
    assert_oracle_types_hashable(duck, STREAM_MANIFEST_SQL, "cur_stream")
    assert_oracle_types_hashable(duck, DELTA_SQL, "cur_delta")


def test_stream_manifest_cross_engine(spark, sf_dir, tmp_path, duck):
    state = _build_state(spark, sf_dir, str(tmp_path))
    compare(_emit(spark, state), duck, STREAM_MANIFEST_SQL)


def test_stream_equals_batch(spark, sf_dir, tmp_path):
    """The headline IVM pin: the state-emitted manifest equals the
    batch pipeline over the unioned corpus, bit-for-bit."""
    state = _build_state(spark, sf_dir, str(tmp_path))
    got = sorted(map(tuple, _emit(spark, state).collect()))
    want = sorted(
        map(
            tuple,
            curation_manifest(
                _union_docs(spark, sf_dir),
                dq._CURATION_TOTAL_N,
                dq._CURATION_SHARDS,
                salt=dq._CURATION_SALT,
            ).collect(),
        )
    )
    assert got == want


def test_replay_is_noop(spark, sf_dir, tmp_path):
    """Exactly-once: re-draining the same source under the same
    checkpoint (and a fresh-checkpoint replay over already-committed
    batch dirs) leaves the state — and the manifest — unchanged."""
    base = str(tmp_path)
    state = _build_state(spark, sf_dir, base)
    before = sorted(map(tuple, _emit(spark, state).collect()))
    n_docs_before = curation_state_docs(spark, state).count()

    src = os.path.join(base, "src")
    schema = _docs(spark, sf_dir).schema
    stream = spark.readStream.schema(schema).parquet(src)
    streaming_curation_ingest(stream, state, os.path.join(base, "cp"))
    stream = spark.readStream.schema(schema).parquet(src)
    streaming_curation_ingest(stream, state, os.path.join(base, "cp2"))

    assert curation_state_docs(spark, state).count() == n_docs_before
    assert sorted(map(tuple, _emit(spark, state).collect())) == before


def test_crash_uncommitted_batch_invisible(spark, sf_dir, tmp_path):
    """A batch with only one of its two _SUCCESS markers (crash
    between the bigram and doc writes) is invisible to readers."""
    import shutil

    state = _build_state(spark, sf_dir, str(tmp_path))
    before = sorted(map(tuple, _emit(spark, state).collect()))
    n_before = curation_state_docs(spark, state).count()
    # fabricate the torn batch: docs committed, bigrams missing
    torn = os.path.join(state, "docs", "batch=99")
    shutil.copytree(os.path.join(state, "docs", "batch=0"), torn)
    assert os.path.exists(os.path.join(torn, "_SUCCESS"))
    assert curation_state_docs(spark, state).count() == n_before
    assert sorted(map(tuple, _emit(spark, state).collect())) == before
    shutil.rmtree(torn)


def test_first_seen_dedup_across_batches(spark, sf_dir, tmp_path):
    """An arrival whose text duplicates a committed doc never enters
    the state (first-seen wins), even though its id is larger."""
    base = str(tmp_path)
    state = os.path.join(base, "state")
    src = os.path.join(base, "src")
    docs = _docs(spark, sf_dir)
    first = docs.filter(BASE_PRED)
    first.coalesce(1).write.mode("append").parquet(src)
    stream = spark.readStream.schema(first.schema).parquet(src)
    streaming_curation_ingest(stream, state, os.path.join(base, "cp"))
    n0 = curation_state_docs(spark, state).count()

    dup = first.limit(5).select(
        (F.col("doc_id") + 30000000).alias("doc_id"), "lang", "text"
    )
    dup.coalesce(1).write.mode("append").parquet(src)
    stream = spark.readStream.schema(first.schema).parquet(src)
    streaming_curation_ingest(stream, state, os.path.join(base, "cp"))

    st = curation_state_docs(spark, state)
    assert st.count() == n0  # all 5 dups rejected
    assert st.filter(F.col("doc_id") >= 30000000).count() == 0


def test_delta_cross_engine(spark, sf_dir, duck):
    docs = _docs(spark, sf_dir)
    got = curation_manifest_delta(
        docs.filter(BASE_PRED),
        docs,
        dq._CURATION_TOTAL_N,
        dq._CURATION_SHARDS,
        salt=dq._CURATION_SALT,
    )
    compare(got, duck, DELTA_SQL)


def test_delta_empty_when_corpus_unchanged(spark, sf_dir):
    docs = _docs(spark, sf_dir)
    out = curation_manifest_delta(
        docs,
        docs,
        dq._CURATION_TOTAL_N,
        dq._CURATION_SHARDS,
        salt=dq._CURATION_SALT,
    )
    assert out.count() == 0


def test_args_validated(spark, sf_dir, tmp_path):
    with pytest.raises(ValueError, match="total_n"):
        curation_manifest_from_state(spark, str(tmp_path), -1, ["s0"])
    with pytest.raises(ValueError, match="shard"):
        curation_manifest_from_state(spark, str(tmp_path), 10, [])
    with pytest.raises(ValueError, match="no committed curation state"):
        curation_manifest_from_state(spark, str(tmp_path), 10, ["s0"])
    with pytest.raises(ValueError, match="overflow"):
        curation_manifest_from_state(
            spark, str(tmp_path), 10**9, ["s0"], mixture_rounds=4
        )

"""Null / degenerate document tolerance for the text-dedup operator
family.

The parquet fixtures carry no null text, but a 100 TB crawl corpus
absolutely will (failed extractions, encoding casualties).  Every
operator here must neither throw nor emit phantom rows for documents
with null, empty, or sub-shingle-length text, and must pass
multi-byte text through without corruption.  These are
module-level-API tests over a constructed corpus — the oracle-checked
driver queries stay fixture-only."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import (
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from vector_db_handler_spark.operators import dedup as dd

_SCHEMA = StructType(
    [
        StructField("doc_id", LongType(), False),
        StructField("text", StringType(), True),
        StructField("lang", StringType(), True),
        StructField("source", StringType(), True),
        StructField("n_chars", IntegerType(), True),
    ]
)

_ROWS = [
    (0, None, "en", "src0", None),           # extraction failure
    (1, "", "en", "src0", 0),                # empty string
    (2, "a", "en", "src1", 1),               # below every shingle width
    (3, "héllo wörld 中文テキスト", "zh", "src1", 14),  # multi-byte
    (4, "the quick brown fox jumps over the lazy dog", "en", "src2", 43),
    (5, "the quick brown fox jumps over the lazy dog", "en", "src2", 43),
]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(_ROWS, _SCHEMA)


def test_exact_dedup_groups_degenerate_docs_sanely(docs):
    out = dd.exact_dedup(docs).collect()
    kept = {r.keep_id: r.n_copies for r in out}
    # the twin docs 4/5 collapse to one group keeping the min id; the
    # null and empty docs do NOT silently merge into one group
    assert kept[4] == 2 and 5 not in kept
    assert kept.get(0) == 1 and kept.get(1) == 1


def test_shingle_index_emits_nothing_for_degenerate_docs(docs):
    sh = dd.shingle_index(docs, k=3)
    by_doc = {
        r.doc_id: r.n
        for r in sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert 0 not in by_doc and 1 not in by_doc and 2 not in by_doc
    assert by_doc.get(4, 0) > 0


def test_simhash64_null_safe(docs):
    out = {r.doc_id: (r.sim_hi, r.sim_lo) for r in dd.simhash64(docs).collect()}
    # identical docs get identical signatures; multi-byte text hashes
    # without corruption; null text must not crash the token explode
    assert out[4] == out[5]
    assert 3 in out


def test_winnow_fingerprints_null_safe(docs):
    fp = dd.winnow_fingerprints(docs, k=4, w=3)
    by_doc = {
        r.doc_id: r.n
        for r in fp.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert 0 not in by_doc and 1 not in by_doc and 2 not in by_doc
    assert by_doc.get(3, 0) > 0 and by_doc.get(4, 0) > 0


def test_pair_ops_never_throw_on_edge_corpus(docs):
    # candidate generators must tolerate the degenerate rows end-to-end
    jp = {(r.d1, r.d2) for r in dd.ngram_jaccard_pairs(docs, threshold=0.5).collect()}
    assert (4, 5) in jp
    sp = {(r.d1, r.d2) for r in dd.simhash_neardup_pairs(docs, max_hamming=3).collect()}
    assert (4, 5) in sp
    wp = {
        (r.doc_a, r.doc_b)
        for r in dd.winnow_overlap_pairs(docs, min_shared=1, k=4, w=3).collect()
    }
    assert (4, 5) in wp


def test_media_kernels_drop_null_blobs(spark, docs):
    # a null-text doc synthesizes a NULL media blob (encode(rpad(null))
    # is null); every decode kernel must drop it, not crash on bytes(None)
    from vector_db_handler_spark.operators import media as md

    m = md.synthesize_media(docs)
    assert m.filter(F.col("media").isNull()).count() >= 1  # doc 0
    for out in (
        md.decode_signal(m, decode="fake"),
        md.decode_features(m, decode="fake"),
        md.frame_sample(m),
        md.resize_normalize(m),
        md.media_phash(m, decode="fake"),
    ):
        assert 0 not in {r.media_id for r in out.collect()}

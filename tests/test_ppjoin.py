"""PPJoin prefix-filter set-similarity join: completeness vs the full
inverted index, candidate-volume pruning, and agreement with the
unguarded exact Jaccard operator."""

from __future__ import annotations

from pyspark.sql import functions as F

from vector_db_handler_spark.operators import dedup as dedup_ops
from vector_db_handler_spark.sources.tables import load_table

_T = 0.6


def _docs(spark, sf_dir):
    return load_table(spark, sf_dir, "documents")


def test_ppjoin_matches_full_space_exact_jaccard(spark, sf_dir):
    """Same pairs, same scores as ngram_jaccard_pairs with NO
    stop-shingle guard — the prefix filter is a pure optimization of
    exact semantics, never a semantic change."""
    docs = _docs(spark, sf_dir)
    pp = sorted(map(tuple, dedup_ops.prefix_filter_jaccard_pairs(docs, _T).collect()))
    full = sorted(map(tuple, dedup_ops.ngram_jaccard_pairs(docs, _T).collect()))
    assert pp == full
    assert len(pp) > 0  # fixture has planted near-dups


def test_ppjoin_candidates_complete_and_pruned(spark, sf_dir):
    """Every true pair appears among prefix candidates (completeness),
    and the prefix index generates strictly fewer candidate pairs than
    the full inverted index (the point of the filter)."""
    docs = _docs(spark, sf_dir)
    sh = dedup_ops.hashed_shingle_index(docs).cache()
    try:
        prefix = dedup_ops.ppjoin_prefix_index(sh, _T)
        cand = dedup_ops.ppjoin_candidates(prefix, _T)
        n_prefix_cand = cand.count()

        a, b = sh.alias("a"), sh.alias("b")
        full_cand = (
            a.join(
                b,
                (F.col("a.h") == F.col("b.h"))
                & (F.col("a.doc_id") < F.col("b.doc_id")),
            )
            .select(F.col("a.doc_id").alias("d1"), F.col("b.doc_id").alias("d2"))
            .distinct()
        )
        n_full_cand = full_cand.count()

        true_pairs = {
            (r.d1, r.d2)
            for r in dedup_ops.ngram_jaccard_pairs(docs, _T).collect()
        }
        cand_pairs = {(r.d1, r.d2) for r in cand.collect()}
        assert true_pairs <= cand_pairs, "prefix filter dropped a true pair"
        assert n_prefix_cand < n_full_cand, (
            f"prefix candidates {n_prefix_cand} !< full {n_full_cand}"
        )
        # prefix index itself is a strict subset of the postings
        assert prefix.count() < sh.count()
    finally:
        sh.unpersist()


def test_ppjoin_prefix_length_rule(spark, sf_dir):
    """No doc indexes more than n - ceil(t*n) + 1 shingles."""
    docs = _docs(spark, sf_dir)
    sh = dedup_ops.hashed_shingle_index(docs)
    prefix = dedup_ops.ppjoin_prefix_index(sh, _T)
    import math

    per_doc = {
        r.doc_id: r.cnt
        for r in prefix.groupBy("doc_id").agg(F.count("*").alias("cnt")).collect()
    }
    sizes = {
        r.doc_id: r.n
        for r in sh.groupBy("doc_id").agg(F.count("*").alias("n")).collect()
    }
    for did, cnt in per_doc.items():
        n = sizes[did]
        assert cnt <= n - math.ceil(_T * n) + 1 + 1  # +1 float-ceil slack

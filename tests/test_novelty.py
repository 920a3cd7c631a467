"""Bigram-novelty semantics on constructed corpora (fixture oracle
parity runs automatically in test_oracle_queries.py)."""

from __future__ import annotations

from vector_db_handler_spark.operators.dedup import bigram_novelty


def test_duplicate_doc_has_zero_novelty(spark):
    """A doc whose every bigram also appears in its copy scores 0."""
    rows = [
        (1, "alpha beta gamma delta"),
        (2, "alpha beta gamma delta"),
        (3, "zulu yankee xray whiskey victor"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.doc_id: r for r in bigram_novelty(docs).collect()}
    assert out[1].novelty == 0.0 and out[2].novelty == 0.0
    assert out[3].novelty == 1.0
    assert out[3].n_bigrams == 4 and out[3].n_unique == 4


def test_partial_overlap_fraction_exact(spark):
    """Shared prefix bigrams are non-novel; the tail is novel — the
    fraction is exact integer arithmetic."""
    rows = [
        (1, "a b c d"),    # bigrams: "a b","b c","c d"
        (2, "a b x y z"),  # bigrams: "a b","b x","x y","y z"
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.doc_id: r for r in bigram_novelty(docs).collect()}
    assert out[1].n_bigrams == 3 and out[1].n_unique == 2
    assert out[2].n_bigrams == 4 and out[2].n_unique == 3
    assert out[1].novelty == round(2 / 3, 6)
    assert out[2].novelty == 0.75

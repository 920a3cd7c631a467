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


# ---------------------------------------------------------------------------
# weighted_jaccard_verify
# ---------------------------------------------------------------------------

from vector_db_handler_spark.operators.dedup import weighted_jaccard_verify


def test_weighted_jaccard_discounts_boilerplate(spark):
    """Three docs sharing a long boilerplate header; docs 0/1 differ
    only in their unique tails.  With idf weights the header shingles
    (df=3 → weight N div 3 = 1) barely count, so the 0-1 pair scores
    LOW even though plain Jaccard would be high; the exact integer
    num/den replays a Python reference."""
    header = "one two three four five six seven eight"
    rows = [
        (0, header + " aaa bbb ccc"),
        (1, header + " ddd eee fff"),
        (2, header + " ggg hhh iii"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    pairs = spark.createDataFrame([(0, 1)], "d1 long, d2 long")
    out = weighted_jaccard_verify(docs, pairs).collect()[0]

    # Python replay with the same 3-shingle + N div df weights
    def shingles(t):
        w = t.split(" ")
        return {" ".join(w[i : i + 3]) for i in range(len(w) - 2)}

    sh = {i: shingles(t) for i, t in rows}
    n = len(rows)
    df = {}
    for s in sh.values():
        for t in s:
            df[t] = df.get(t, 0) + 1
    w = {t: n // d for t, d in df.items()}
    inter = sum(w[t] for t in sh[0] & sh[1])
    union = sum(w[t] for t in sh[0] | sh[1])
    assert (out.wj_num, out.wj_den) == (inter, union)
    assert out.wjaccard == round(inter / union, 6)
    # the discount property: plain Jaccard is ~0.5+, weighted is far lower
    plain = len(sh[0] & sh[1]) / len(sh[0] | sh[1])
    assert out.wjaccard <= plain / 2


def test_weighted_jaccard_disjoint_pair_is_zero(spark):
    docs = spark.createDataFrame(
        [(0, "aa bb cc dd ee"), (1, "ff gg hh ii jj")],
        "doc_id long, text string",
    )
    pairs = spark.createDataFrame([(0, 1)], "d1 long, d2 long")
    out = weighted_jaccard_verify(docs, pairs).collect()[0]
    assert out.wj_num == 0 and out.wjaccard == 0.0 and out.wj_den > 0

"""BM25 (operators/retrieval.py): exact-fraction ground truth on a
hand-built corpus, ranking semantics, and the postings-prune property
(docs without query terms never appear)."""

from __future__ import annotations

import pytest

from vector_db_handler_spark.operators.retrieval import bm25_topk


def _bm25_exact(docs: dict[int, str], terms: list[str], k: int):
    """Driver-side replay with exact rationals, mirroring the
    operator's integer algebra (k1 = 6/5, b = 3/4, A = round(avgdl),
    micro-unit round-half-up)."""
    n = len(docs)
    dls = {d: len(t.split(" ")) for d, t in docs.items()}
    total = sum(dls.values())
    a = (2 * total + n) // (2 * n)
    scores = {}
    for term in terms:
        df = sum(1 for t in docs.values() if term in t.split(" "))
        if df == 0:
            continue
        for d, text in docs.items():
            tf = text.split(" ").count(term)
            if tf == 0:
                continue
            num = 22 * tf * a * (2 * n - 2 * df + 1)
            den = (10 * a * tf + 3 * a + 9 * dls[d]) * (2 * df + 1)
            u = (2 * num * 1000000 + den) // (2 * den)
            scores[d] = scores.get(d, 0) + u
    ranked = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))[:k]
    return [(d, u / 1000000.0) for d, u in ranked]


DOCS = {
    1: "spark shuffle join broadcast join",
    2: "vector index probe",
    3: "join join join join shuffle",
    4: "unrelated text entirely",
    5: "broadcast vector join",
}


@pytest.fixture()
def docs_df(spark):
    return spark.createDataFrame(
        [(d, t) for d, t in DOCS.items()], "doc_id long, text string"
    )


def test_matches_exact_fraction_replay(spark, docs_df):
    terms = ["join", "vector"]
    got = [(r.doc_id, r.score) for r in bm25_topk(docs_df, terms, k=5).collect()]
    want = _bm25_exact(DOCS, terms, 5)
    assert got == want


def test_docs_without_query_terms_excluded(spark, docs_df):
    rows = bm25_topk(docs_df, ["join"], k=10).collect()
    assert {r.doc_id for r in rows} == {1, 3, 5}


def test_rank_is_dense_and_ordered(spark, docs_df):
    rows = bm25_topk(docs_df, ["join", "vector", "broadcast"], k=10).collect()
    assert [r.rank for r in rows] == list(range(1, len(rows) + 1))
    scores = [r.score for r in rows]
    assert scores == sorted(scores, reverse=True)


def test_rare_term_outscores_common(spark, docs_df):
    # 'vector' (df=2) carries more idf than 'join' (df=3): a doc with
    # only the rare term should beat a doc with only one common-term
    # occurrence at equal length... compare directly via the replay.
    rows = {r.doc_id: r.score for r in bm25_topk(docs_df, ["vector"], k=10).collect()}
    assert set(rows) == {2, 5}


def test_missing_term_is_ignored(spark, docs_df):
    with_junk = bm25_topk(docs_df, ["join", "zzz_not_present"], k=10).collect()
    without = bm25_topk(docs_df, ["join"], k=10).collect()
    assert [(r.doc_id, r.score) for r in with_junk] == [
        (r.doc_id, r.score) for r in without
    ]


def test_k_truncates(spark, docs_df):
    assert bm25_topk(docs_df, ["join"], k=2).count() == 2


def test_empty_corpus(spark):
    docs = spark.createDataFrame([], "doc_id long, text string")
    out = bm25_topk(docs, ["join"])
    assert out.count() == 0
    assert [f.name for f in out.schema.fields] == ["doc_id", "score", "rank"]


# ---------------------------------------------------------------------------
# rrf_fuse
# ---------------------------------------------------------------------------

import pytest

from vector_db_handler_spark.operators.retrieval import rrf_fuse


def _ranking(spark, pairs):
    return spark.createDataFrame(pairs, "doc_id long, rank int")


def test_rrf_known_fusion(spark):
    """doc 1 is rank 1 in both lists → top; doc 2 (ranks 2+3) beats
    doc 3 (rank 2 in one list only); single-list docs still fuse."""
    r1 = _ranking(spark, [(1, 1), (2, 2), (4, 3)])
    r2 = _ranking(spark, [(1, 1), (3, 2), (2, 3)])
    out = rrf_fuse([r1, r2], k=10, c=60).collect()
    order = [r.doc_id for r in out]
    assert order[0] == 1
    assert order.index(2) < order.index(3)
    got = {r.doc_id: r for r in out}
    assert got[1].rrf == round(1 / 61 + 1 / 61, 6)
    assert got[2].rrf == round(1 / 62 + 1 / 63, 6)
    assert got[4].rrf == round(1 / 63, 6)
    assert got[3].rank_1 is None and got[3].rank_2 == 2


def test_rrf_tie_breaks_by_id_and_respects_k(spark):
    r1 = _ranking(spark, [(10, 1), (5, 2), (7, 2)])  # 5 and 7 tie
    out = rrf_fuse([r1], k=2).collect()
    assert [r.doc_id for r in out] == [10, 5]
    assert [r.rank for r in out] == [1, 2]


def test_rrf_rejects_empty_input(spark):
    with pytest.raises(ValueError):
        rrf_fuse([])

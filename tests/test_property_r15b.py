"""Property pins for the continuation-session staged families, on
CONSTRUCTED corpora (fixture parity runs in test_bm25_index.py /
test_quantile_sketch.py): the BM25 index/scan equivalence and the
quantile sketch's rank-error bound are properties of the algebra, not
of the fixture — pin them where the fixture can't reach (random
vocabularies, adversarial value distributions)."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from vector_db_handler_spark.operators.retrieval import (
    append_bm25_index,
    bm25_index_topk,
    bm25_topk,
    write_bm25_index,
)
from vector_db_handler_spark.operators.sketches import (
    hash_sample_quantile_report,
)


def _random_docs(rng: random.Random, n: int, vocab: list[str]):
    rows = []
    for i in range(n):
        words = rng.choices(vocab, k=rng.randint(1, 40))
        rows.append((i, " ".join(words)))
    return rows


def test_bm25_index_equals_scan_random_corpora(spark, tmp_path):
    """For random corpora, vocabularies, splits and query terms, the
    segment-merged index probe equals scan-time BM25 bit-for-bit —
    the mergeable-postings algebra, not a fixture coincidence."""
    rng = random.Random(1729)
    for trial in range(3):
        vocab = [f"w{j}" for j in range(rng.randint(5, 60))]
        rows = _random_docs(rng, rng.randint(8, 120), vocab)
        docs = spark.createDataFrame(rows, "doc_id long, text string")
        path = str(tmp_path / f"idx{trial}")
        split = rng.randint(2, 5)
        write_bm25_index(docs.filter(f"doc_id % {split} != 0"), path)
        append_bm25_index(docs.filter(f"doc_id % {split} = 0"), path, "d0")
        terms = rng.sample(vocab, k=min(len(vocab), rng.randint(1, 4)))
        terms.append("zz_absent")  # absent term must be a no-op
        k = rng.randint(1, 15)
        got = sorted(map(tuple, bm25_index_topk(spark, path, terms, k=k).collect()))
        want = sorted(map(tuple, bm25_topk(docs, terms, k=k).collect()))
        assert got == want, f"trial {trial}: index != scan for {terms}"


def test_quantile_sketch_rank_error_bound(spark):
    """DKW-style sanity on an adversarial (heavy-tail + duplicate-
    laden) distribution: every estimated quantile's TRUE rank sits
    within a generous ε·n of its target rank.  The sketch must not
    silently degrade on duplicates or skew — only widen within the
    bound."""
    rng = random.Random(31)
    vals = []
    for i in range(4000):
        r = rng.random()
        if r < 0.3:
            v = 1.0  # heavy duplicate mass
        elif r < 0.9:
            v = rng.random() * 10
        else:
            v = rng.random() * 1e6  # heavy tail
        vals.append((i, "k", v))
    df = spark.createDataFrame(vals, "event_id long, event_type string, value double")
    rep = hash_sample_quantile_report(
        df, sample_mod=8, pcts=(50, 90, 99)
    ).collect()
    assert len(rep) == 1
    r = rep[0]
    n = r["n"]
    assert r["sample_n"] > 0
    svals = sorted(v for _, _, v in vals)
    # ε = 3/sqrt(m) covers the DKW bound at ~99% for m sampled rows
    eps = 3.0 / (r["sample_n"] ** 0.5)
    for p in (50, 90, 99):
        est = r[f"est_p{p}"]
        assert est is not None
        # true rank range occupied by the estimated value
        lo = sum(1 for v in svals if v < est)
        hi = sum(1 for v in svals if v <= est)
        target = (p * n + 99) // 100
        assert lo - eps * n <= target <= hi + eps * n, (
            f"p{p}: est {est} occupies ranks [{lo},{hi}], "
            f"target {target}, eps*n {eps*n:.1f}"
        )


def test_quantile_sketch_all_duplicates(spark):
    """A constant column: every quantile (exact AND estimated when the
    sample is non-empty) is that constant — no interpolation wobble."""
    df = spark.createDataFrame(
        [(i, "k", 7.5) for i in range(500)],
        "event_id long, event_type string, value double",
    )
    r = hash_sample_quantile_report(df, sample_mod=4).collect()[0]
    assert (r["p50"], r["p90"], r["p99"]) == (7.5, 7.5, 7.5)
    if r["sample_n"] > 0:
        assert (r["est_p50"], r["est_p90"], r["est_p99"]) == (7.5, 7.5, 7.5)

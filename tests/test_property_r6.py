"""Property-based checks (hypothesis) for the round-6 exact-integer
kernels: BM25's cleared integer algebra against an exact-``Fraction``
reference, and SemDeDup's per-cluster pruning against a brute-force
numpy replay — arbitrary small corpora, duplicate texts, zero vectors,
and singleton clusters included."""

from __future__ import annotations

from fractions import Fraction

import numpy as np
from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F  # noqa: F401  (parity with sibling files)

from vector_db_handler_spark.operators.retrieval import bm25_topk

_WORDS = ["a", "b", "c", "dd"]
_DOC = st.lists(
    st.sampled_from(_WORDS), min_size=1, max_size=6
).map(lambda ws: " ".join(ws))
_CORPUS = st.lists(_DOC, min_size=1, max_size=6)


def _bm25_reference(texts: list[str], terms: list[str], k: int):
    """Exact-rational replay of the operator's algebra (k1 = 6/5,
    b = 3/4, A = round-half-up(avgdl), micro-unit round-half-up)."""
    n = len(texts)
    dls = [len(t.split(" ")) for t in texts]
    total = sum(dls)
    a = (2 * total + n) // (2 * n)
    scores: dict[int, int] = {}
    for term in terms:
        df = sum(1 for t in texts if term in t.split(" "))
        if df == 0:
            continue
        for d, text in enumerate(texts):
            tf = text.split(" ").count(term)
            if tf == 0:
                continue
            num = 22 * tf * a * (2 * n - 2 * df + 1)
            den = (10 * a * tf + 3 * a + 9 * dls[d]) * (2 * df + 1)
            assert Fraction(num, den) >= 0  # scores can't go negative here
            u = (2 * num * 1000000 + den) // (2 * den)
            scores[d] = scores.get(d, 0) + u
    ranked = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))[:k]
    return [(d, u / 1000000.0) for d, u in ranked]


@settings(max_examples=10, deadline=None)
@given(texts=_CORPUS, terms=st.lists(st.sampled_from(_WORDS + ["zz"]), min_size=1, max_size=3, unique=True))
def test_bm25_matches_fraction_reference(spark, texts, terms):
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    got = [(r.doc_id, r.score) for r in bm25_topk(docs, terms, k=10).collect()]
    assert got == _bm25_reference(texts, terms, 10)


_VEC = st.lists(st.integers(min_value=-3, max_value=3), min_size=4, max_size=4)
_EMB = st.lists(_VEC, min_size=1, max_size=8)


@settings(max_examples=10, deadline=None)
@given(vecs=_EMB)
def test_semdedup_matches_bruteforce(spark, vecs):
    from vector_db_handler_spark.operators.clustering import semdedup_survivors
    from vector_db_handler_spark.operators.quantize import quantize_int8

    k = 2
    emb = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<double>",
    )
    got = {r.vec_id: (r.cluster_id, r.kept) for r in
           semdedup_survivors(emb, k=k, iters=2, threshold_num=9,
                              threshold_den=10).collect()}

    # Brute-force replay: quantize, 1 Lloyd update from seeds, assign,
    # then per-cluster lower-id integer-cosine pruning.
    q = {r.vec_id: np.array(r.qvec, dtype=np.int64)
         for r in quantize_int8(emb).collect()}
    seeds = sorted(i for i in q if i < k)
    if not seeds:
        assert got == {}
        return
    cents = {s: q[s].copy() for s in seeds}

    def assign():
        out = {}
        for i, v in q.items():
            best = min(
                ((int(((v - c) ** 2).sum()), s) for s, c in cents.items()),
            )
            out[i] = best[1]
        return out

    a1 = assign()
    for s in seeds:
        members = [q[i] for i, c in a1.items() if c == s]
        if members:
            m = np.stack(members)
            n_m = len(members)
            cents[s] = np.array(
                [((int(col) + 127 * n_m) * 2 + n_m) // (2 * n_m) - 127
                 for col in m.sum(axis=0)],
                dtype=np.int64,
            )
    a2 = assign()
    want = {}
    for i, c in a2.items():
        dup = False
        for j, cj in a2.items():
            if cj != c or j >= i:
                continue
            dot = int(q[i] @ q[j])
            if dot > 0 and 100 * dot * dot >= 81 * int(q[i] @ q[i]) * int(q[j] @ q[j]):
                dup = True
                break
        want[i] = (c, not dup)
    assert got == want


_SVEC = st.lists(st.integers(min_value=-2, max_value=2), min_size=4, max_size=4)
_SEMB = st.lists(_SVEC, min_size=1, max_size=7)


@settings(max_examples=8, deadline=None)
@given(vecs=_SEMB)
def test_srp_matches_full_replay(spark, vecs):
    """The whole SRP pipeline (quantize → ±1-plane sign bits → band
    keys → hot-bucket guard → integer-cosine verify) against a
    driver-side numpy replay on arbitrary tiny corpora — zero vectors
    and exact duplicates included."""
    from vector_db_handler_spark.operators import srp as srp_ops
    from vector_db_handler_spark.operators.quantize import quantize_int8

    n_bits, n_bands, max_bucket = 8, 2, 3
    emb = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<double>",
    )
    got = {
        (r.id1, r.id2)
        for r in srp_ops.srp_neardup_pairs(
            emb,
            threshold_num=1,
            threshold_den=2,
            n_bits=n_bits,
            n_bands=n_bands,
            dim=4,
            max_bucket=max_bucket,
        ).collect()
    }

    q = {r.vec_id: np.array(r.qvec, dtype=np.int64)
         for r in quantize_int8(emb).collect()}
    planes = np.array(srp_ops.srp_planes(4, n_bits, 7), dtype=np.int64)
    sigs = {}
    for i, v in q.items():
        dots = planes @ v
        sigs[i] = sum(1 << b for b in range(n_bits) if dots[b] >= 0)
    bpb = n_bits // n_bands
    mask = (1 << bpb) - 1
    buckets: dict[tuple, list] = {}
    for i, s in sigs.items():
        for b in range(n_bands):
            buckets.setdefault((b, (s >> (b * bpb)) & mask), []).append(i)
    cands = set()
    for members in buckets.values():
        if len(members) > max_bucket:
            continue
        for a in members:
            for c in members:
                if a < c:
                    cands.add((a, c))
    want = set()
    for a, c in cands:
        dot = int(q[a] @ q[c])
        if dot > 0 and 4 * dot * dot >= 1 * int(q[a] @ q[a]) * int(q[c] @ q[c]):
            want.add((a, c))
    assert got == want

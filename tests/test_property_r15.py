"""Property-based checks (hypothesis) for the round-15 staged
operators, each against a literal pure-Python replay of its declared
arithmetic: the PMI lift's exact integer division, the drift moments'
mergeability (the property the streaming store's exactness rests on),
and the MMR greedy selection rule."""

from __future__ import annotations

import math

from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

# --- pmi_collocations: lift_micro == literal integer replay -----------

_TOKS = st.lists(
    st.lists(st.sampled_from(["a", "b", "c"]), min_size=0, max_size=6).map(
        " ".join
    ),
    min_size=1,
    max_size=12,
)


def _pmi_replay(texts):
    """{(x, y): (n_xy, n_x, n_y, lift_micro)} over whitespace tokens —
    the docstring's arithmetic, in plain Python ints."""
    uni, pairs = {}, {}
    n_tok = n_big = 0
    for t in texts:
        toks = t.split(" ")  # str.split(' ') keeps empty tokens, like
        # Spark split / DuckDB string_split on ' '
        for w in toks:
            uni[w] = uni.get(w, 0) + 1
            n_tok += 1
        n_big += max(0, len(toks) - 1)
        for x, y in zip(toks, toks[1:]):
            pairs[(x, y)] = pairs.get((x, y), 0) + 1
    out = {}
    for (x, y), n_xy in pairs.items():
        lift = (10**6 * n_xy * n_tok * n_tok) // (n_big * uni[x] * uni[y])
        out[(x, y)] = (n_xy, uni[x], uni[y], lift)
    return out


@settings(max_examples=5, deadline=None)
@given(texts=_TOKS)
def test_pmi_lift_matches_literal_replay(spark, texts):
    from vector_db_handler_spark.operators.lm_score import pmi_collocations

    docs = spark.createDataFrame([(t,) for t in texts], "text string")
    got = {
        (r.x, r.y): (r.n_xy, r.n_x, r.n_y, r.lift_micro)
        for r in pmi_collocations(docs, min_count=1, k=10_000).collect()
    }
    assert got == _pmi_replay(texts)


# --- drift moments: mergeable by construction --------------------------

_VECS = st.lists(
    st.lists(
        st.decimals(
            min_value=-2, max_value=2, places=3, allow_nan=False
        ).map(float),
        min_size=3,
        max_size=3,
    ),
    min_size=1,
    max_size=10,
)


@settings(max_examples=5, deadline=None)
@given(vecs=_VECS, cut=st.integers(min_value=0, max_value=10))
def test_drift_moments_merge_exactly(spark, vecs, cut):
    """moments(union) == per-pos sums of per-slice moments, exactly —
    the property `streaming.drift_stream`'s stream-equals-batch
    guarantee rests on (integer Σ1/Σx/Σx² in DECIMAL(38,0))."""
    from vector_db_handler_spark.operators.features import drift_moments

    cut = min(cut, len(vecs))
    a, b = vecs[:cut], vecs[cut:]

    def rows(vs):
        return spark.createDataFrame(
            [(v,) for v in vs], "embedding array<double>"
        )

    whole = {
        r["pos"]: (r["n_b"], int(r["s_b"]), int(r["q_b"]))
        for r in drift_moments(rows(vecs), "b").collect()
    }
    merged: dict[int, list[int]] = {}
    for part in (a, b):
        if not part:
            continue
        for r in drift_moments(rows(part), "b").collect():
            acc = merged.setdefault(r["pos"], [0, 0, 0])
            acc[0] += r["n_b"]
            acc[1] += int(r["s_b"])
            acc[2] += int(r["q_b"])
    assert whole == {k: tuple(v) for k, v in merged.items()}


# --- mmr_diversified_topk: greedy rule == literal replay ---------------

_IVECS = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=30),  # id (deduped below)
        st.lists(
            st.integers(min_value=-5, max_value=5), min_size=4, max_size=4
        ),
    ),
    min_size=1,
    max_size=10,
)


def _mmr_replay(rows, qv, k, lam):
    """Quantize with the corpus max-abs scale, score, greedy-select —
    the operator's declared arithmetic in plain Python."""
    s = max((abs(float(x)) for _, v in rows for x in v), default=0.0)
    if not s > 0.0:
        s = 1.0

    def q(vec):
        return [
            int(max(-127, min(127, math.floor(127.0 * float(x) / s + 0.5))))
            for x in vec
        ]

    qvq = q(qv)
    cand = {i: (sum(a * b for a, b in zip(q(v), qvq)), q(v)) for i, v in rows}
    chosen, out = [], []
    while cand and len(out) < k:
        best = None
        for cid, (sc, vec) in cand.items():
            ms = max(
                (sum(a * b for a, b in zip(vec, cv)) for cv in chosen),
                default=0,
            )
            mmr = lam * sc - (1000 - lam) * ms
            key = (-mmr, cid)
            if best is None or key < best[0]:
                best = (key, cid, sc, mmr)
        _, cid, sc, mmr = best
        out.append((len(out) + 1, cid, sc, mmr))
        chosen.append(cand.pop(cid)[1])
    return out


@settings(max_examples=5, deadline=None)
@given(rows=_IVECS, lam=st.sampled_from([0, 300, 700, 1000]))
def test_mmr_matches_literal_replay(spark, rows, lam):
    from vector_db_handler_spark.operators.retrieval import (
        mmr_diversified_topk,
    )

    rows = list({i: v for i, v in rows}.items())  # unique ids
    k = min(3, len(rows))
    qv = [1.0, -1.0, 2.0, 0.5]
    emb = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in rows],
        "vec_id long, embedding array<double>",
    )
    got = [
        (r.step, r.vec_id, r.qscore, r.mmr_milli)
        for r in mmr_diversified_topk(
            emb, qv, k=k, n_candidates=len(rows), lam_milli=lam
        ).collect()
    ]
    assert got == _mmr_replay(rows, qv, k, lam)

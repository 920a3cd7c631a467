"""Domain mixture reweighting (DoReMi-lite): underserved domains gain
share, dominant ones lose it, exact-integer replay, round dial, and
the cross-engine DuckDB replay over documents by language.  Staged
in r12 for r13 driver registration."""

from __future__ import annotations

import pytest

from tests.oracle_check import compare
from vector_db_handler_spark.operators.lm_score import domain_mixture_weights

from vector_db_handler_spark import driver_queries as dq

ROUNDS = dq._DM_ROUNDS
BASE = dq._DM_BASE

#: Registered in r13 — SQL lives in driver_queries (one source of
#: truth; this module replays it cross-engine at fixture scale).
ORACLE_SQL = dq._DOMAIN_MIXTURE_SQL


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, lang string, text string")


def test_underserved_domain_gains_share(spark):
    """Domain A: 10 docs of one repeated bigram (huge counts, high
    credit).  Domain B: 2 docs of rarer text (low counts, low
    credit).  B's excess is positive, A's negative, and B's weight
    share must exceed its bigram share."""
    rows = [(i, "aa", "x y x y x y") for i in range(10)]
    rows += [(100, "bb", "p q r s"), (101, "bb", "t u v w")]
    out = {r["domain"]: r for r in domain_mixture_weights(_docs(spark, rows)).collect()}
    assert out["bb"]["excess_milli"] > 0 > out["aa"]["excess_milli"]
    assert out["bb"]["weight_share"] > out["bb"]["n_bigrams"] / (
        out["aa"]["n_bigrams"] + out["bb"]["n_bigrams"]
    )
    assert abs(out["aa"]["weight_share"] + out["bb"]["weight_share"] - 1.0) < 1e-6


def test_single_domain_gets_full_share(spark):
    rows = [(1, "aa", "a b c"), (2, "aa", "a b d")]
    out = domain_mixture_weights(_docs(spark, rows)).collect()
    assert len(out) == 1
    assert out[0]["excess_milli"] == 0
    assert out[0]["weight_share"] == 1.0


def test_rounds_sharpen_the_same_ordering(spark):
    """More rounds widen the gap between weights without ever
    reordering domains (static excess — the documented lite
    semantics)."""
    rows = [(i, "aa", "x y x y x y") for i in range(10)]
    rows += [(100, "bb", "p q r s"), (101, "bb", "t u v w")]
    docs = _docs(spark, rows)
    w1 = {r["domain"]: r["weight_share"] for r in domain_mixture_weights(docs, n_rounds=1).collect()}
    w3 = {r["domain"]: r["weight_share"] for r in domain_mixture_weights(docs, n_rounds=3).collect()}
    assert w3["bb"] > w1["bb"] > 0.5 or (w1["bb"] > 0.5 and w3["bb"] >= w1["bb"])
    assert (w1["bb"] > w1["aa"]) == (w3["bb"] > w3["aa"])


def test_exact_integer_replay(spark):
    """Literal replay of the arithmetic on a hand-sized corpus."""
    import collections

    rows = [(1, "aa", "a b a b"), (2, "bb", "c d")]
    texts = {"aa": ["a b a b"], "bb": ["c d"]}
    model = collections.Counter()
    perdom = collections.defaultdict(list)
    for dom, ts in texts.items():
        for t in ts:
            ws = t.split(" ")
            bgs = [f"{ws[i]} {ws[i+1]}" for i in range(len(ws) - 1)]
            model.update(bgs)
            perdom[dom].extend(bgs)
    out = {r["domain"]: r for r in domain_mixture_weights(_docs(spark, rows)).collect()}
    tot_credit = tot_n = 0
    stats = {}
    for dom, bgs in perdom.items():
        credit = sum(model[b].bit_length() for b in bgs)
        stats[dom] = (len(bgs), 1000 * credit // len(bgs))
        tot_credit += credit
        tot_n += len(bgs)
    g_milli = 1000 * tot_credit // tot_n
    for dom, (nb, cm) in stats.items():
        r = out[dom]
        assert (r["n_bigrams"], r["credit_milli"]) == (nb, cm)
        assert r["excess_milli"] == g_milli - cm
        assert r["weight_numer"] == max(1, BASE + g_milli - cm) ** ROUNDS


def test_args_validated(spark):
    docs = _docs(spark, [(1, "aa", "a b")])
    with pytest.raises(ValueError, match="n_rounds"):
        domain_mixture_weights(docs, n_rounds=0)
    with pytest.raises(ValueError, match="base"):
        domain_mixture_weights(docs, base=0)


def test_overflow_bound_fails_loudly(spark):
    """r12 ADVICE: u^n_rounds with u up to base+64000 exceeds int64
    at n_rounds=4 (68000^4 ≈ 2.1e19 > 2^63−1) and would silently
    wrap to negative weights — the bound must raise instead."""
    docs = _docs(spark, [(1, "aa", "a b")])
    with pytest.raises(ValueError, match="overflow"):
        domain_mixture_weights(docs, n_rounds=4)
    # Tightness: the largest safe round count still constructs.
    domain_mixture_weights(docs, n_rounds=3)
    with pytest.raises(ValueError, match="overflow"):
        domain_mixture_weights(docs, n_rounds=2, base=2**32)


def test_cross_engine_oracle_replay(spark, sf_dir, duck):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    compare(
        domain_mixture_weights(docs, n_rounds=ROUNDS, base=BASE),
        duck,
        ORACLE_SQL,
    )

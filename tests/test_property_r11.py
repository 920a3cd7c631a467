"""Property-based checks (hypothesis) for the round-11 staged
operators, each against a literal pure-Python replay of its declared
arithmetic: HLL registers/estimate, fixed-point token entropy, HRW
winner selection, DSIR credit difference, gear-CDC boundaries, and
IND containment."""

from __future__ import annotations

import collections
import hashlib

from hypothesis import given, settings, strategies as st

from vector_db_handler_spark.operators.dedup import CDC_WINDOW


def _L(n: int) -> int:
    e = n.bit_length() - 1
    return 1024 * e + ((1024 * n) >> e) - 1024


def _h60(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


# --- HLL -------------------------------------------------------------

_VALS = st.lists(st.integers(min_value=0, max_value=10_000), min_size=1, max_size=40)


def _hll_replay(vals, p=6):
    regs: dict[int, int] = {}
    s = 61 - p
    for v in vals:
        h = _h60(str(v))
        b = h & ((1 << p) - 1)
        w = h >> p
        rho = s if w == 0 else (60 - p) - w.bit_length() + 1
        regs[b] = max(regs.get(b, 0), rho)
    return regs


@settings(max_examples=6, deadline=None)
@given(vals=_VALS)
def test_hll_registers_match_literal_replay(spark, vals):
    from vector_db_handler_spark.operators.hll import hll_registers

    df = spark.createDataFrame([("k", v) for v in vals], "k string, v long")
    got = {
        r["bucket"]: r["m"] for r in hll_registers(df, "k", "v", p=6).collect()
    }
    assert got == _hll_replay(vals)


@settings(max_examples=6, deadline=None)
@given(vals=_VALS)
def test_hll_estimate_invariant_under_duplication(spark, vals):
    from vector_db_handler_spark.operators.hll import hll_distinct_by_key

    df1 = spark.createDataFrame([("k", v) for v in vals], "k string, v long")
    df2 = spark.createDataFrame(
        [("k", v) for v in vals * 2][::-1], "k string, v long"
    )
    r1 = hll_distinct_by_key(df1, "k", "v").collect()[0]
    r2 = hll_distinct_by_key(df2, "k", "v").collect()[0]
    assert (r1["sum_scaled"], r1["est_used"]) == (r2["sum_scaled"], r2["est_used"])


# --- token entropy ---------------------------------------------------

_TOKS = st.lists(st.sampled_from(["a", "b", "c", "dd"]), min_size=1, max_size=12)


@settings(max_examples=6, deadline=None)
@given(toks=_TOKS)
def test_entropy_matches_literal_replay_and_permutation_invariance(spark, toks):
    from vector_db_handler_spark.operators.features import token_entropy

    text = " ".join(toks)
    rev = " ".join(reversed(toks))
    df = spark.createDataFrame(
        [(1, text), (2, rev)], "doc_id long, text string"
    )
    out = {r["doc_id"]: r for r in token_entropy(df).collect()}
    cnt = collections.Counter(toks)
    n = len(toks)
    want = n * _L(n) - sum(c * _L(c) for c in cnt.values())
    assert out[1]["entropy_scaled"] == want
    assert out[1]["entropy_scaled"] == out[2]["entropy_scaled"]  # bag property
    assert out[1]["entropy_scaled"] >= 0


# --- rendezvous ------------------------------------------------------

_IDS = st.lists(st.integers(min_value=0, max_value=10**6), min_size=1, max_size=15, unique=True)


def _hrw_winner(doc_id, shards):
    return max(sorted(shards), key=lambda s: (_h60(f"{doc_id}|{s}"), s))


@settings(max_examples=6, deadline=None)
@given(ids=_IDS)
def test_hrw_winner_matches_replay_and_drop_consistency(spark, ids):
    from vector_db_handler_spark.operators.layout import rendezvous_assign

    shards = ["s0", "s1", "s2", "s3"]
    df = spark.createDataFrame([(i,) for i in ids], "doc_id long")
    got = {
        r["doc_id"]: r["shard"]
        for r in rendezvous_assign(df, shards).collect()
    }
    for i in ids:
        assert got[i] == _hrw_winner(i, shards)
    # dropping a NON-winning shard never changes any winner
    survivors = [s for s in shards if s != "s3"]
    got2 = {
        r["doc_id"]: r["shard"]
        for r in rendezvous_assign(df, survivors).collect()
    }
    for i in ids:
        if got[i] != "s3":
            assert got2[i] == got[i]


# --- DSIR ------------------------------------------------------------

_DOCS = st.lists(
    st.lists(st.sampled_from(["a", "b", "c"]), min_size=2, max_size=5).map(" ".join),
    min_size=1,
    max_size=6,
)


def _bigram_counts(texts):
    c = collections.Counter()
    for t in texts:
        ws = t.split(" ")
        for i in range(len(ws) - 1):
            c[f"{ws[i]} {ws[i + 1]}"] += 1
    return c


@settings(max_examples=6, deadline=None)
@given(docs=_DOCS)
def test_dsir_weight_matches_literal_replay(spark, docs):
    from vector_db_handler_spark.operators.lm_score import dsir_importance

    target = docs[: max(1, len(docs) // 2)]
    ddf = spark.createDataFrame(
        list(enumerate(docs)), "doc_id long, text string"
    )
    tdf = spark.createDataFrame(
        list(enumerate(target)), "doc_id long, text string"
    )
    got = {r["doc_id"]: r for r in dsir_importance(ddf, tdf).collect()}
    tc, sc = _bigram_counts(target), _bigram_counts(docs)
    for i, t in enumerate(docs):
        ws = t.split(" ")
        bgs = [f"{ws[j]} {ws[j + 1]}" for j in range(len(ws) - 1)]
        ct = sum(tc[b].bit_length() for b in bgs)
        cs = sum(sc[b].bit_length() for b in bgs)
        n = len(bgs)
        want = (1000 * ct) // n - (1000 * cs) // n
        assert got[i]["weight_milli"] == want, (t, got[i])


# --- gear CDC --------------------------------------------------------

_BLOB = st.binary(min_size=1, max_size=300)


def _cdc_replay(b, mask_bits=4):
    gear = [
        int(hashlib.md5(chr(x).encode("latin-1")).hexdigest()[:10], 16)
        for x in range(256)
    ]
    mask = (1 << mask_bits) - 1
    chunks, start = [], 0
    for i in range(len(b)):
        h = 0
        for t in range(CDC_WINDOW):
            if i - t < 0:
                break
            h += gear[b[i - t]] << t
        if (h & mask) == 0:
            chunks.append(b[start : i + 1])
            start = i + 1
    if start < len(b):
        chunks.append(b[start:])
    return [
        (j, int(hashlib.md5(c).hexdigest()[:15], 16), len(c))
        for j, c in enumerate(chunks)
    ]


@settings(max_examples=6, deadline=None)
@given(blob=_BLOB)
def test_cdc_chunks_match_literal_replay(spark, blob):
    from vector_db_handler_spark.operators.dedup import gear_cdc_chunks

    df = spark.createDataFrame([(1, blob)], "media_id long, media binary")
    got = sorted(
        (r["chunk_idx"], r["chunk_hash"], r["chunk_len"])
        for r in gear_cdc_chunks(df, mask_bits=4).collect()
    )
    assert got == _cdc_replay(blob)
    assert sum(l for _, _, l in got) == len(blob)


# --- inclusion dependencies -----------------------------------------

_SETS = st.tuples(
    st.lists(st.integers(0, 20), min_size=1, max_size=15),
    st.lists(st.integers(0, 20), min_size=1, max_size=15),
)


@settings(max_examples=6, deadline=None)
@given(cp=_SETS)
def test_ind_containment_matches_set_arithmetic(spark, cp):
    from vector_db_handler_spark.operators.profile import (
        inclusion_dependencies,
    )

    child_vals, parent_vals = cp
    child = spark.createDataFrame([(v,) for v in child_vals], "v long")
    parent = spark.createDataFrame([(v,) for v in parent_vals], "v long")
    r = inclusion_dependencies(
        {"c": child, "p": parent}, [("c", "v", "p", "v")]
    ).collect()[0]
    cs, ps = set(child_vals), set(parent_vals)
    assert r["n_child_distinct"] == len(cs)
    assert r["n_contained"] == len(cs & ps)
    assert r["holds"] == (cs <= ps)

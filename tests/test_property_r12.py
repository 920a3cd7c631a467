"""Property-based checks (hypothesis) for the round-12 staged
operators, each against a literal pure-Python replay of its declared
arithmetic: watermark lateness, Hamilton allocation, HyperBall
register propagation, and the beam's brute-force degradation."""

from __future__ import annotations

import collections
import datetime as dt
import hashlib

from hypothesis import given, settings, strategies as st


def _h60(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


# --- watermark audit --------------------------------------------------

_EVENTS = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=500),   # arrival
        st.integers(min_value=0, max_value=10_000),  # minutes of event time
    ),
    min_size=1,
    max_size=40,
)


def _wm_replay(rows, delay_us):
    """(event_id, arrival, ts_us) → {(n_total, n_late, max_lateness)}"""
    out = collections.Counter()
    latest = {}
    srt = sorted(rows, key=lambda r: (r[1], r[0]))
    mx = None
    for eid, arr, tu in srt:
        wm = (mx - delay_us) if mx is not None else None
        late = wm is not None and tu < wm
        out["n_total"] += 1
        out["n_late"] += int(late)
        if late:
            latest[eid] = wm - tu
        mx = tu if mx is None else max(mx, tu)
    return out["n_total"], out["n_late"], max(latest.values(), default=0)


@settings(max_examples=6, deadline=None)
@given(evs=_EVENTS)
def test_watermark_audit_matches_literal_replay(spark, evs):
    from pyspark.sql import functions as F

    from vector_db_handler_spark.operators.windows import (
        watermark_late_audit,
    )

    base = dt.datetime(2024, 1, 1)
    rows = [
        (i, arr, base + dt.timedelta(minutes=minutes))
        for i, (arr, minutes) in enumerate(evs)
    ]
    df = spark.createDataFrame(
        rows, "event_id long, arrival_seq long, ts timestamp"
    )
    delay_us = 30 * 60 * 1_000_000
    got = (
        watermark_late_audit(df, delay_sec=1800)
        .agg(
            F.sum("n_total").alias("t"),
            F.sum("n_late").alias("l"),
            F.max("max_lateness_us").alias("m"),
        )
        .collect()[0]
    )
    raw = [(i, arr, int((base + dt.timedelta(minutes=m)
                         - dt.datetime(1970, 1, 1)).total_seconds() * 1e6))
           for i, (arr, m) in enumerate(evs)]
    t, l, mx = _wm_replay(raw, delay_us)
    assert (got["t"], got["l"], got["m"]) == (t, l, mx)


# --- Hamilton allocation ----------------------------------------------

_STRATA = st.dictionaries(
    st.sampled_from(["a", "b", "c", "d", "e"]),
    st.integers(min_value=1, max_value=60),
    min_size=1,
    max_size=5,
)


@settings(max_examples=6, deadline=None)
@given(counts=_STRATA, n=st.integers(min_value=0, max_value=80))
def test_hamilton_allocation_invariants(spark, counts, n):
    from vector_db_handler_spark.operators.sampling import (
        allocate_stratified_exact,
    )

    rows, nid = [], 0
    for s, c in sorted(counts.items()):
        for _ in range(c):
            rows.append((nid, s))
            nid += 1
    df = spark.createDataFrame(rows, "doc_id long, lang string")
    out = allocate_stratified_exact(df, n, "lang", "doc_id").collect()
    got = collections.Counter(r["lang"] for r in out)
    tot = sum(counts.values())
    if n <= tot:
        # quota ±1 of the exact proportional share, total EXACT
        assert sum(got.values()) == min(n, tot)
        for s, c in counts.items():
            exact = n * c / tot
            assert abs(got.get(s, 0) - exact) < 1 + 1e-9, (s, got, exact)
    else:
        assert sum(got.values()) == tot  # cap binds: everything


# --- HyperBall register propagation ------------------------------------

_EDGES = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=12),
        st.integers(min_value=0, max_value=12),
    ),
    min_size=1,
    max_size=25,
)


def _ball_regs(pairs, hops, p=6):
    nbrs = collections.defaultdict(set)
    for a, b in pairs:
        if a != b:
            nbrs[a].add(b)
            nbrs[b].add(a)
    s = 61 - p

    def reg(node):
        h = _h60(str(node))
        w = h >> p
        rho = s if w == 0 else (60 - p) - w.bit_length() + 1
        return h & ((1 << p) - 1), rho

    regs = {n: {reg(n)[0]: reg(n)[1]} for n in nbrs}
    for _ in range(hops):
        new = {}
        for n in nbrs:
            merged = dict(regs[n])
            for m in nbrs[n]:
                for b, r in regs[m].items():
                    merged[b] = max(merged.get(b, 0), r)
            new[n] = merged
        regs = new
    return {
        (n, b): r for n, rs in regs.items() for b, r in rs.items()
    }


@settings(max_examples=6, deadline=None)
@given(pairs=_EDGES)
def test_hyperball_sum_scaled_matches_register_replay(spark, pairs):
    from vector_db_handler_spark.operators.graph import (
        hyperball_neighborhood,
    )

    pairs = [p for p in pairs if p[0] != p[1]]
    if not pairs:
        return
    df = spark.createDataFrame(pairs, "src long, dst long")
    hops = 2
    want_regs = _ball_regs(pairs, hops)
    s = 61 - 6
    want = collections.defaultdict(lambda: 64 << s)
    for (n, b), r in want_regs.items():
        want[n] -= (1 << s) - (1 << (s - r))
    got = {
        r["node"]: r["sum_scaled"]
        for r in hyperball_neighborhood(df, n_hops=hops).collect()
        if r["hop"] == hops
    }
    assert got == dict(want)


# --- beam search brute-force degradation --------------------------------

@settings(max_examples=4, deadline=None)
@given(
    seeds=st.lists(
        st.integers(min_value=0, max_value=9), min_size=5, max_size=12
    )
)
def test_beam_full_visibility_equals_int8_brute_force(spark, seeds):
    from vector_db_handler_spark.operators.quantize import quantized_knn
    from vector_db_handler_spark.operators.similarity import (
        knn_graph_beam_search,
    )

    rows = [
        (i, [float(s - 4), float((s * 3) % 5 - 2), 1.0])
        for i, s in enumerate(seeds)
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    q = [1.0, -0.5, 0.25]
    got = knn_graph_beam_search(
        df, q, k=3, beam=len(rows), hops=0, entry_mod=1, kmeans_k=1
    ).collect()
    want = quantized_knn(df, q, k=3).collect()
    assert [
        (r["vec_id"], r["iscore"]) for r in sorted(got, key=lambda r: r["rank"])
    ] == [(r["vec_id"], r["qscore"]) for r in want]

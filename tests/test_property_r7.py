"""Property-based checks (hypothesis) for the round-7 operators:
star-contraction components vs a union-find reference on arbitrary
graphs; epoch resampling mass vs a pure-Python replay of the hash
gate; redaction idempotence; BPE training vs a literal replay of the
count-argmax-replace loop."""

from __future__ import annotations

from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F  # noqa: F401

_NODE = st.integers(min_value=0, max_value=15)
_EDGES = st.lists(st.tuples(_NODE, _NODE), min_size=0, max_size=20)


def _union_find(edges, nodes):
    parent = {n: n for n in nodes}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # component label = min node id of the set
    comp = {}
    for n in nodes:
        r = find(n)
        comp.setdefault(r, []).append(n)
    return {n: min(ns) for r, ns in comp.items() for n in ns}


@settings(max_examples=8, deadline=None)
@given(edges=_EDGES)
def test_star_cc_matches_union_find(spark, edges):
    from vector_db_handler_spark.operators.graph import connected_components_star

    nodes = sorted({n for e in edges for n in e} | set(range(4)))
    pairs = spark.createDataFrame(
        [(a, b) for a, b in edges] or [(0, 0)], "d1 long, d2 long"
    )
    nodes_df = spark.createDataFrame([(n,) for n in nodes], "doc_id long")
    got = {
        r.node: r.component
        for r in connected_components_star(pairs, nodes=nodes_df).collect()
    }
    want = _union_find([e for e in edges if e[0] != e[1]], nodes)
    assert got == want


@settings(max_examples=8, deadline=None)
@given(
    rates=st.lists(st.integers(min_value=0, max_value=35_000), min_size=1, max_size=6)
)
def test_resample_epoch_matches_hash_gate_replay(spark, rates):
    from vector_db_handler_spark.functions.text import portable_hash60
    from vector_db_handler_spark.operators.sampling import (
        SAMPLE_BUCKETS,
        resample_epoch,
        sample_bucket,
    )

    rows = [(i, r) for i, r in enumerate(rates)]
    df = spark.createDataFrame(rows, "doc_id long, rate_bp long")
    got = {
        r.doc_id: r.n
        for r in resample_epoch(df, "rate_bp", "doc_id")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    gates = {
        r.doc_id: r.g
        for r in df.select(
            "doc_id", sample_bucket(F.col("doc_id"), "epoch").alias("g")
        ).collect()
    }
    for i, rate in rows:
        want = rate // SAMPLE_BUCKETS + (
            1 if gates[i] < rate % SAMPLE_BUCKETS else 0
        )
        assert got.get(i, 0) == want


_PII_TEXT = st.text(
    alphabet="ab1.-@ <>", min_size=0, max_size=30
)


@settings(max_examples=10, deadline=None)
@given(text=_PII_TEXT)
def test_redaction_is_idempotent(spark, text):
    """redact(redact(x)) == redact(x): replacement tokens must never
    re-match any rule (else a second scrub pass corrupts output)."""
    from vector_db_handler_spark.operators.redaction import redact_pii

    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    once = redact_pii(df).select(F.col("redacted").alias("text"), "doc_id")
    twice = redact_pii(once).collect()[0]
    assert twice.redacted == twice.text


def _bpe_reference(texts, k):
    from collections import Counter

    freq = Counter()
    for t in texts:
        for w in t.split(" "):
            if w and w.isalpha() and w.islower():
                freq[w] += 1
    syms = {w: " " + " ".join(w) + " " for w in freq}
    merges = []
    for _ in range(k):
        pairs = Counter()
        for w, s in syms.items():
            toks = s.split()
            for a, b in zip(toks, toks[1:]):
                pairs[(a, b)] += freq[w]
        if not pairs:
            break
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        (l, r), cnt = best
        merges.append((l, r, cnt))
        syms = {w: s.replace(f" {l} {r} ", f" {l}{r} ") for w, s in syms.items()}
    return merges


@settings(max_examples=6, deadline=None)
@given(
    texts=st.lists(
        st.lists(
            st.sampled_from(["ab", "aab", "ba", "cc", "abc"]),
            min_size=1,
            max_size=5,
        ).map(" ".join),
        min_size=1,
        max_size=4,
    )
)
def test_bpe_training_matches_literal_replay(spark, texts):
    from vector_db_handler_spark.operators.bpe import bpe_train_merges

    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    got = [
        (r["left"], r["right"], r["pair_freq"])
        for r in bpe_train_merges(docs, n_merges=3).orderBy("step").collect()
    ]
    assert got == _bpe_reference(texts, 3)


# ---------------------------------------------------------------------------
# sequence_funnel
# ---------------------------------------------------------------------------


def test_sequence_funnel_semantics(spark):
    """Hand-built timelines: in-order chain completes; out-of-order
    never; span overflow fails; the LATEST viable chain decides;
    4-step chains work."""
    from pyspark.sql import functions as F

    from vector_db_handler_spark.operators.windows import sequence_funnel

    m = 60_000_000  # one minute in us

    def run(rows, steps, span_us):
        df = spark.createDataFrame(
            rows, ["event_id", "us", "user_id", "event_type"]
        ).select(
            "event_id",
            F.timestamp_micros(F.col("us")).alias("ts"),
            "user_id",
            "event_type",
        )
        return {
            r.event_id: r.completed
            for r in sequence_funnel(df, steps, span_us).collect()
        }

    steps = ["view", "click", "purchase"]
    # in-order within span
    assert run(
        [(1, 0, 7, "view"), (2, m, 7, "click"), (3, 2 * m, 7, "purchase")],
        steps, 10 * m,
    ) == {3: True}
    # click before view: no chain
    assert run(
        [(1, 0, 7, "click"), (2, m, 7, "view"), (3, 2 * m, 7, "purchase")],
        steps, 10 * m,
    ) == {3: False}
    # chain exists but span exceeded (view at 0, purchase at 20m, span 10m)
    assert run(
        [(1, 0, 7, "view"), (2, m, 7, "click"), (3, 20 * m, 7, "purchase")],
        steps, 10 * m,
    ) == {3: False}
    # an old stale view + a fresh view→click: LATEST viable chain wins
    assert run(
        [
            (1, 0, 7, "view"),
            (2, 30 * m, 7, "view"),
            (3, 31 * m, 7, "click"),
            (4, 32 * m, 7, "purchase"),
        ],
        steps, 5 * m,
    ) == {4: True}
    # users are independent
    assert run(
        [(1, 0, 1, "view"), (2, m, 2, "click"), (3, 2 * m, 2, "purchase")],
        steps, 10 * m,
    ) == {3: False}
    # 4-step chain
    assert run(
        [
            (1, 0, 7, "signup"),
            (2, m, 7, "view"),
            (3, 2 * m, 7, "click"),
            (4, 3 * m, 7, "purchase"),
        ],
        ["signup", "view", "click", "purchase"], 10 * m,
    ) == {4: True}

"""Property-based checks (hypothesis) for the round-10 staged
operators, each against a literal pure-Python replay of its declared
arithmetic: NB scoring (smoothed fixed-point-log2 posterior), FD
g3-error, span removal coverage, and the seasonal-decomposition
additive identity on arbitrary series."""

from __future__ import annotations

import collections
import datetime as dt

from hypothesis import given, settings, strategies as st


def _L(n: int) -> int:
    e = n.bit_length() - 1
    return 1024 * e + ((1024 * n) >> e) - 1024


# --- NB classifier ---------------------------------------------------

_WORD = st.sampled_from(["a", "b", "c", "dd", "ee"])
_DOC = st.lists(_WORD, min_size=1, max_size=6).map(" ".join)
_CORPUS = st.lists(
    st.tuples(st.sampled_from(["x", "y"]), _DOC), min_size=2, max_size=10
).filter(lambda rows: len({l for l, _ in rows}) == 2)


def _nb_replay(train_rows, score_texts):
    cnt = {l: collections.Counter() for l in {l for l, _ in train_rows}}
    ndocs = collections.Counter()
    vocab = set()
    for l, t in train_rows:
        ws = t.split(" ")
        cnt[l].update(ws)
        ndocs[l] += 1
        vocab.update(ws)
    labels = sorted(cnt)
    T = {l: sum(cnt[l].values()) for l in labels}
    V = len(vocab)
    N = sum(ndocs.values())
    out = []
    for text in score_texts:
        toks = collections.Counter(text.split(" "))
        nd = sum(toks.values())
        scores = {}
        for l in labels:
            s = _L(ndocs[l]) - _L(N) - nd * _L(T[l] + V)
            for w, c in toks.items():
                if cnt[l][w] > 0:
                    s += c * _L(cnt[l][w] + 1)
            scores[l] = s
        ranked = sorted(labels, key=lambda l: (-scores[l], l))
        best = ranked[0]
        margin = (
            scores[best] - scores[ranked[1]] if len(ranked) > 1 else 0
        )
        out.append((best, scores[best], margin))
    return out


@settings(max_examples=6, deadline=None)
@given(corpus=_CORPUS, probe=_DOC)
def test_nb_scores_match_literal_replay(spark, corpus, probe):
    from vector_db_handler_spark.operators.nb_classifier import (
        nb_classify,
        nb_train,
    )

    train = spark.createDataFrame(
        [(i, l, t) for i, (l, t) in enumerate(corpus)],
        "doc_id long, lang string, text string",
    )
    model, priors = nb_train(train)
    got = nb_classify(
        spark.createDataFrame([(999, None, probe)], "doc_id long, lang string, text string"),
        model,
        priors,
    ).collect()[0]
    (want_label, want_score, want_margin) = _nb_replay(corpus, [probe])[0]
    assert (got["predicted"], got["score"], got["margin"]) == (
        want_label,
        want_score,
        want_margin,
    )


# --- FD discovery ----------------------------------------------------

_VAL = st.one_of(st.none(), st.sampled_from(["p", "q", "r"]))
_ROWS = st.lists(st.tuples(_VAL, _VAL), min_size=0, max_size=15)


@settings(max_examples=6, deadline=None)
@given(rows=_ROWS)
def test_fd_stats_match_literal_replay(spark, rows):
    from vector_db_handler_spark.operators.profile import (
        functional_dependencies,
    )

    df = spark.createDataFrame(
        rows or [("p", "p")], "a string, b string"
    )
    got = functional_dependencies(df, [("a", "b")]).collect()
    data = rows or [("p", "p")]
    groups: dict[str, collections.Counter] = {}
    for a, b in data:
        if a is None:
            continue
        groups.setdefault(a, collections.Counter())[b] += 1
    if not groups:
        # every determinant NULL: the stack filter leaves zero rows and
        # the aggregation emits nothing for the pair
        assert got == []
        return
    r = got[0]
    assert r["n_groups"] == len(groups)
    assert r["n_violating_groups"] == sum(
        1 for c in groups.values() if len(c) > 1
    )
    assert r["max_distinct_dep"] == max(len(c) for c in groups.values())
    assert r["g3_keep"] == sum(max(c.values()) for c in groups.values())


# --- span removal ----------------------------------------------------

_TOK = st.sampled_from(["t0", "t1", "t2", "t3"])
_TEXTS = st.lists(
    st.lists(_TOK, min_size=1, max_size=20).map(" ".join),
    min_size=1,
    max_size=4,
)


@settings(max_examples=6, deadline=None)
@given(texts=_TEXTS)
def test_span_removal_equals_coverage_replay(spark, texts):
    """clean_text must equal the original tokens minus exactly the
    positions covered by the k-gram duplication census, replayed
    literally in Python (every k-gram occurring >= 2 times corpus-wide
    marks its k positions)."""
    from vector_db_handler_spark.operators.dedup import (
        remove_duplicate_spans,
    )

    K = 3
    docs = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )
    got = {
        r["doc_id"]: r for r in remove_duplicate_spans(docs, k=K).collect()
    }
    census: collections.Counter = collections.Counter()
    toks = {i: t.split(" ") for i, t in enumerate(texts)}
    for i, ts in toks.items():
        for j in range(len(ts) - K + 1):
            census[" ".join(ts[j : j + K])] += 1
    for i, ts in toks.items():
        covered = set()
        for j in range(len(ts) - K + 1):
            if census[" ".join(ts[j : j + K])] >= 2:
                covered.update(range(j, j + K))
        want = " ".join(t for j, t in enumerate(ts) if j not in covered)
        assert got[i]["clean_text"] == want, (i, ts)
        assert got[i]["n_removed"] == len(covered)


# --- seasonal decomposition ------------------------------------------

_VALS = st.lists(
    st.integers(min_value=-50, max_value=50), min_size=1, max_size=21
)


@settings(max_examples=6, deadline=None)
@given(vals=_VALS)
def test_seasonal_additive_identity_and_trend_replay(spark, vals):
    """On an arbitrary contiguous series: trend equals the literal
    7-row centered integer mean wherever defined, and value = trend +
    seasonal + residual at every such row."""
    from vector_db_handler_spark.operators.timeseries import (
        seasonal_decompose_daily,
    )

    base = dt.datetime(2024, 3, 4)
    rows = [
        ("k", base + dt.timedelta(days=i), float(v))
        for i, v in enumerate(vals)
    ]
    out = sorted(
        seasonal_decompose_daily(
            spark.createDataFrame(
                rows, "event_type string, ts timestamp, value double"
            )
        ).collect(),
        key=lambda r: r["day"],
    )
    micro = [v * 1_000_000 for v in vals]
    for i, r in enumerate(out):
        assert r["value_micro"] == micro[i]
        if 3 <= i < len(vals) - 3:
            s = sum(micro[i - 3 : i + 4])
            want = abs(s) // 7 * (1 if s >= 0 else -1)  # trunc toward 0
            assert r["trend_micro"] == want
            assert (
                r["value_micro"]
                == r["trend_micro"]
                + r["seasonal_micro"]
                + r["residual_micro"]
            )
        else:
            assert r["trend_micro"] is None

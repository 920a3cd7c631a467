"""Blocked fuzzy matching: distance semantics, blocking, guards."""

from __future__ import annotations

from pyspark.sql import functions as F

from vector_db_handler_spark.operators.linkage import blocked_levenshtein_pairs


def _df(spark, rows):
    return spark.createDataFrame(rows, "id long, name string")


def test_known_distances_and_ordering(spark):
    rows = [
        (1, "red widget"),
        (2, "red widgets"),   # dist 1 to id1
        (3, "red gadget"),    # dist 2 to id1 (w->g, i->a)
        (4, "blue widget"),   # different block: never compared
    ]
    got = {
        (r.id1, r.id2): r.dist
        for r in blocked_levenshtein_pairs(_df(spark, rows), "id", "name").collect()
    }
    assert got[(1, 2)] == 1
    assert got[(1, 3)] == 2
    assert got[(2, 3)] == 3  # "widgets" -> "gadget"
    assert all(i1 < i2 for i1, i2 in got)
    assert not any(4 in p for p in got)


def test_matches_python_reference(spark):
    """Pairwise parity with a pure-Python DP inside one block."""

    def lev(a, b):
        prev = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            cur = [i]
            for j, cb in enumerate(b, 1):
                cur.append(
                    min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb))
                )
            prev = cur
        return prev[-1]

    names = ["ax" + s for s in ("ple", "pel", "plea", "le", "plx", "qqq", "ple")]
    rows = [(i, "k " + n) for i, n in enumerate(names)]
    got = {
        (r.id1, r.id2): r.dist
        for r in blocked_levenshtein_pairs(
            _df(spark, rows), "id", "name", max_dist=2
        ).collect()
    }
    want = {}
    for i in range(len(names)):
        for j in range(i + 1, len(names)):
            d = lev("k " + names[i], "k " + names[j])
            if d <= 2 and abs(len(names[i]) - len(names[j])) <= 2:
                want[(i, j)] = d
    assert got == want


def test_max_block_guard_drops_hot_blocks(spark):
    rows = [(i, f"hot name{i}") for i in range(20)] + [
        (100, "cold alpha"),
        (101, "cold alphb"),
    ]
    out = blocked_levenshtein_pairs(
        _df(spark, rows), "id", "name", max_dist=2, max_block=10
    ).collect()
    # the 20-member "hot" block is dropped; the cold pair survives
    assert {(r.id1, r.id2) for r in out} == {(100, 101)}


def test_custom_block_and_null_names(spark):
    rows = [(1, "abcd"), (2, "abcx"), (3, None)]
    out = blocked_levenshtein_pairs(
        _df(spark, rows), "id", "name", max_dist=1,
        block=F.substring("name", 1, 2),
    ).collect()
    assert [(r.id1, r.id2, r.dist) for r in out] == [(1, 2, 1)]


# ---------------------------------------------------------------------------
# golden_records
# ---------------------------------------------------------------------------

from vector_db_handler_spark.operators.linkage import golden_records


def test_golden_records_chain_consolidation_and_survivorship(spark):
    """A chain of pairwise matches (A~B, B~C) is ONE entity even though
    A and C never matched directly; the longest name survives, min id
    breaks length ties; unmatched rows don't appear."""
    rows = [(1, "acme corp"), (2, "acme corpx"), (3, "acme corpxy"),
            (7, "zebra"), (8, "zebraa"), (9, "lonely")]
    df = spark.createDataFrame(rows, "id long, name string")
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (7, 8)], "id1 long, id2 long"
    )
    got = {
        r.cluster: (r.n_members, r.golden_id, r.golden_name)
        for r in golden_records(df, pairs, "id", "name").collect()
    }
    assert got[1] == (3, 3, "acme corpxy")   # chain merged, longest wins
    assert got[7] == (2, 8, "zebraa")
    assert 9 not in {g for (_, g, _) in got.values()}
    assert len(got) == 2

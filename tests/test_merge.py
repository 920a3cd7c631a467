"""SCD Type-2 merge: row fates, idempotency, and replay safety."""

from __future__ import annotations

from pyspark.sql import functions as F

from vector_db_handler_spark.operators.merge import scd2_merge
from vector_db_handler_spark.sources.tables import load_table


def _dim(spark, sf_dir):
    return load_table(spark, sf_dir, "customer").select(
        "c_custkey",
        F.col("c_acctbal").cast("decimal(18,2)").alias("acctbal"),
        F.col("c_mktsegment").alias("segment"),
        F.to_date(F.lit("2024-01-01")).alias("valid_from"),
        F.lit(None).cast("date").alias("valid_to"),
        F.lit(True).alias("is_current"),
    )


def _updates(spark, sf_dir):
    cust = load_table(spark, sf_dir, "customer")
    return cust.filter(F.col("c_custkey") % 7 == 0).select(
        "c_custkey",
        (F.col("c_acctbal").cast("decimal(18,2)") + F.lit(100).cast("decimal(18,2)"))
        .cast("decimal(18,2)")
        .alias("acctbal"),
        F.col("c_mktsegment").alias("segment"),
    )


def test_scd2_row_fates(spark, sf_dir):
    dim = _dim(spark, sf_dir)
    upd = _updates(spark, sf_dir)
    n_dim = dim.count()
    n_upd = upd.count()
    out = scd2_merge(dim, upd, "c_custkey", ["acctbal", "segment"], "2024-06-01")

    # every changed key contributes one closed + one new row
    assert out.count() == n_dim + n_upd
    closed = out.filter(~F.col("is_current"))
    assert closed.count() == n_upd
    assert closed.filter(F.col("valid_to") != F.lit("2024-06-01").cast("date")).count() == 0
    # exactly one current row per key, always
    dup = (
        out.filter("is_current")
        .groupBy("c_custkey")
        .count()
        .filter("count > 1")
        .count()
    )
    assert dup == 0


def test_scd2_replay_is_idempotent(spark, sf_dir):
    """Applying the SAME batch to the merged result changes nothing:
    matched rows now carry identical tracked values, so they are
    carried, not re-versioned — the property that makes a retried
    ingest batch safe."""
    dim = _dim(spark, sf_dir)
    upd = _updates(spark, sf_dir)
    once = scd2_merge(dim, upd, "c_custkey", ["acctbal", "segment"], "2024-06-01")
    twice = scd2_merge(once, upd, "c_custkey", ["acctbal", "segment"], "2024-07-01")
    key = ["c_custkey", "acctbal", "segment", "valid_from", "valid_to", "is_current"]
    a = sorted(map(str, once.select(*key).collect()))
    b = sorted(map(str, twice.select(*key).collect()))
    assert a == b


def test_scd2_second_batch_extends_history(spark, sf_dir):
    """A LATER batch that changes the same keys again adds a second
    closed version per key; the first closed version is untouched."""
    dim = _dim(spark, sf_dir)
    upd1 = _updates(spark, sf_dir)
    upd2 = upd1.withColumn(
        "acctbal",
        (F.col("acctbal") + F.lit(50).cast("decimal(18,2)")).cast("decimal(18,2)"),
    )
    once = scd2_merge(dim, upd1, "c_custkey", ["acctbal", "segment"], "2024-06-01")
    again = scd2_merge(once, upd2, "c_custkey", ["acctbal", "segment"], "2024-09-01")
    n_upd = upd1.count()
    hist = again.filter(~F.col("is_current"))
    assert hist.count() == 2 * n_upd
    # intervals chain: first version closed at 06-01, second at 09-01
    per_key = (
        hist.groupBy("c_custkey")
        .agg(F.min("valid_to").alias("first_close"), F.max("valid_to").alias("last_close"))
        .collect()
    )
    for r in per_key:
        assert str(r.first_close) == "2024-06-01"
        assert str(r.last_close) == "2024-09-01"


# ---------------------------------------------------------------------------
# ivm_join_delta
# ---------------------------------------------------------------------------

from vector_db_handler_spark.operators.merge import ivm_join_delta


def _bag(rows):
    from collections import Counter

    return Counter(tuple(r) for r in rows)


def test_ivm_join_delta_matches_direct_recompute(spark):
    """Bag-semantics parity on data with duplicate join keys in both
    relations and in both deltas: V_old ∪ ΔV == (A∪ΔA) ⋈ (B∪ΔB)."""
    a = spark.createDataFrame(
        [(1, "a1"), (2, "a2"), (2, "a2dup"), (3, "a3")], "k long, pa string"
    )
    da = spark.createDataFrame([(2, "da2"), (4, "da4")], "k long, pa string")
    b = spark.createDataFrame(
        [(1, "b1"), (2, "b2"), (2, "b2dup"), (5, "b5")], "k long, pb string"
    )
    db = spark.createDataFrame([(2, "db2"), (4, "db4"), (4, "db4b")], "k long, pb string")

    maintained = a.join(b, "k").unionByName(ivm_join_delta(a, da, b, db, "k"))
    direct = a.unionByName(da).join(b.unionByName(db), "k")
    assert _bag(maintained.collect()) == _bag(direct.collect())


def test_ivm_join_delta_empty_deltas_are_noop(spark):
    a = spark.createDataFrame([(1, "x")], "k long, pa string")
    b = spark.createDataFrame([(1, "y")], "k long, pb string")
    empty = spark.createDataFrame([], "k long, pa string")
    empty_b = spark.createDataFrame([], "k long, pb string")
    assert ivm_join_delta(a, empty, b, empty_b, "k").count() == 0


def test_ivm_join_delta_broadcasts_delta_terms(spark):
    """Every delta term must plan as a BroadcastHashJoin — maintenance
    exchanges stay O(|Δ|); the base relations never co-shuffle."""
    a = spark.createDataFrame([(i, "a") for i in range(100)], "k long, pa string")
    da = spark.createDataFrame([(1, "d")], "k long, pa string")
    b = spark.createDataFrame([(i, "b") for i in range(100)], "k long, pb string")
    db = spark.createDataFrame([(2, "d")], "k long, pb string")
    plan = (
        ivm_join_delta(a, da, b, db, "k")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("BroadcastHashJoin") == 3, plan[:1200]
    assert "SortMergeJoin" not in plan


# ---------------------------------------------------------------------------
# scd2_asof_join
# ---------------------------------------------------------------------------

from vector_db_handler_spark.operators.merge import scd2_asof_join


def test_asof_join_picks_the_effective_version(spark):
    """Two versions of key 1 (boundary 2000-06-01): facts before the
    boundary get v1, at/after get v2 (valid_from inclusive, valid_to
    exclusive); keys with no effective version drop; no fan-out."""
    from pyspark.sql import functions as F

    hist = spark.createDataFrame(
        [
            (1, "v1", "2000-01-01", "2000-06-01"),
            (1, "v2", "2000-06-01", None),
            (2, "w1", "2000-01-01", None),
        ],
        "k long, tag string, valid_from string, valid_to string",
    ).select(
        "k", "tag",
        F.col("valid_from").cast("date").alias("valid_from"),
        F.col("valid_to").cast("date").alias("valid_to"),
    )
    facts = spark.createDataFrame(
        [
            (10, 1, "2000-03-01"),   # v1
            (11, 1, "2000-06-01"),   # boundary day -> v2 (vt exclusive)
            (12, 1, "2001-01-01"),   # v2 (open)
            (13, 2, "1999-12-31"),   # before any version -> dropped
            (14, 9, "2000-03-01"),   # unknown key -> dropped
        ],
        "fid long, k long, d string",
    ).select("fid", "k", F.col("d").cast("date").alias("d"))
    out = scd2_asof_join(facts, hist, "k", "k", "d")
    got = {r.fid: r.tag for r in out.collect()}
    assert got == {10: "v1", 11: "v2", 12: "v2"}
    assert out.count() == 3  # exactly one version per surviving fact


def test_asof_join_left_keeps_uncovered_facts_with_nulls(spark):
    """how='left' (ADVICE r7): pre-history facts and unknown keys stay
    in the output with NULL dimension columns — the auditable-coverage
    contract; matched rows are identical to the inner result."""
    from pyspark.sql import functions as F

    hist = spark.createDataFrame(
        [(1, "v1", "2000-01-01", None)],
        "k long, tag string, valid_from string, valid_to string",
    ).select(
        "k", "tag",
        F.col("valid_from").cast("date").alias("valid_from"),
        F.col("valid_to").cast("date").alias("valid_to"),
    )
    facts = spark.createDataFrame(
        [
            (10, 1, "2000-03-01"),   # covered -> v1
            (13, 1, "1999-12-31"),   # pre-history -> NULL dims
            (14, 9, "2000-03-01"),   # unknown key -> NULL dims
        ],
        "fid long, k long, d string",
    ).select("fid", "k", F.col("d").cast("date").alias("d"))
    out = scd2_asof_join(facts, hist, "k", "k", "d", how="left")
    got = {r.fid: r.tag for r in out.collect()}
    assert got == {10: "v1", 13: None, 14: None}
    assert out.count() == 3

    import pytest

    with pytest.raises(ValueError, match="inner.*left|left.*inner"):
        scd2_asof_join(facts, hist, "k", "k", "d", how="full")

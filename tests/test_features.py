"""Feature operators: distributed global rank vs the single-partition
window, equi-depth bin balance, Markov transition mass."""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from vector_db_handler_spark.operators import features
from vector_db_handler_spark.sources.tables import load_table


def test_global_rank_matches_single_partition_window(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events").select("event_id", "value")
    got = {
        r.event_id: r.rank
        for r in features.global_rank(ev, ["value", "event_id"]).collect()
    }
    w = Window.orderBy(F.col("value").asc(), F.col("event_id").asc())
    want = {
        r.event_id: r.rank
        for r in ev.withColumn("rank", F.row_number().over(w)).collect()
    }
    assert got == want


def test_global_rank_window_is_partition_keyed(spark, sf_dir):
    """The scalable shape: the row_number window is keyed on the
    partition id (parallel, partition-local) — never the global
    empty-partition window a naive ORDER-BY row_number would plan.
    (The rangepartitioning exchange itself sits behind the eager
    localCheckpoint, so the executed plan starts at an RDD scan.)"""
    ev = load_table(spark, sf_dir, "events").select("event_id", "value")
    plan = (
        features.global_rank(ev, ["value", "event_id"])
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "windowspecdefinition(_pid" in plan
    # every window in the plan carries a partition key
    import re

    for spec in re.findall(r"windowspecdefinition\(([^)]*)\)", plan):
        assert spec.strip().startswith("_pid"), spec


def test_equi_depth_bins_are_balanced(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events").select("event_id", "value")
    n = ev.count()
    sizes = {
        r.bin: r.cnt
        for r in features.equi_depth_bins(ev, "value", "event_id", n_bins=10)
        .groupBy("bin")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .collect()
    }
    assert set(sizes) == set(range(10))
    assert max(sizes.values()) - min(sizes.values()) <= 1
    assert sum(sizes.values()) == n


def test_transition_mass_accounting(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    out = features.transition_counts(
        ev, "user_id", ["ts", "event_id"], "event_type"
    ).collect()
    n_events = ev.count()
    n_users = ev.select("user_id").distinct().count()
    assert sum(r.n for r in out) == n_events
    starts = sum(r.n for r in out if r.prev_state == "START")
    assert starts == n_users
    # per-prev probabilities sum to 1 up to rounding
    from collections import defaultdict

    mass = defaultdict(float)
    for r in out:
        mass[r.prev_state] += r.p
    for prev, total in mass.items():
        assert abs(total - 1.0) < 1e-4, (prev, total)


def test_embedding_dim_stats_match_numpy(spark, sf_dir):
    """Means/stds agree with a float64 numpy replay to 1e-9 (the
    nano-unit quantization bound), and every dimension is present."""
    import numpy as np

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    got = {r.pos: r for r in features.embedding_dim_stats(emb).collect()}
    m = np.array([row.embedding for row in emb.collect()], dtype=np.float64)
    assert set(got) == set(range(m.shape[1]))
    for pos in range(m.shape[1]):
        col = m[:, pos]
        assert abs(got[pos].mean - col.mean()) < 1e-8
        assert abs(got[pos].std - col.std()) < 1e-8
        assert abs(got[pos].min_v - col.min()) < 1e-9
        assert abs(got[pos].max_v - col.max()) < 1e-9


def test_cooccurrence_lift_brute_force(spark, sf_dir):
    """Pair counts and lift agree with a pure-Python replay over the
    collected baskets."""
    from collections import Counter
    from itertools import combinations

    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") < 2000)
    got = {
        (r.i1, r.i2): (r.n_both, r.n1, r.n2, r.lift)
        for r in features.cooccurrence_lift(
            li, "l_orderkey", "l_partkey", min_both=2
        ).collect()
    }
    baskets = {}
    for r in li.select("l_orderkey", "l_partkey").distinct().collect():
        baskets.setdefault(r.l_orderkey, set()).add(r.l_partkey)
    n_baskets = len(baskets)
    supp = Counter(i for items in baskets.values() for i in items)
    pair = Counter(
        p for items in baskets.values() for p in combinations(sorted(items), 2)
    )
    want = {
        (a, b): (n, supp[a], supp[b], round(n * n_baskets / supp[a] / supp[b], 6))
        for (a, b), n in pair.items()
        if n >= 2
    }
    assert set(got) == set(want)
    for k in got:
        assert got[k][:3] == want[k][:3]
        assert abs(got[k][3] - want[k][3]) < 1e-9


def test_rfm_scores_balanced_and_bounded(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    out = features.rfm_scores(ev).collect()
    n_users = ev.select("user_id").distinct().count()
    assert len(out) == n_users
    from collections import Counter

    for dim in ("r_score", "f_score", "m_score"):
        vals = [getattr(r, dim) for r in out]
        assert set(vals) <= set(range(1, 6))
        sizes = Counter(vals)
        assert max(sizes.values()) - min(sizes.values()) <= 1  # exact equi-depth
    for r in out:
        assert r.rfm_segment == f"{r.r_score}-{r.f_score}-{r.m_score}"
        assert r.recency_days >= 0


def test_pairwise_correlations_match_numpy(spark, sf_dir):
    """Per-pair r equals numpy's corrcoef over the same inner-joined
    observation set (days where BOTH series have rows)."""
    import numpy as np

    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        F.to_date("ts").alias("day"), F.col("event_type")
    ).agg(F.count(F.lit(1)).alias("n_ev"))
    got = {
        (r.s1, r.s2): (r.n, r.pearson_r)
        for r in features.pairwise_correlations(
            daily, "day", "event_type", "n_ev"
        ).collect()
    }
    grid = {}
    for r in daily.collect():
        grid.setdefault(r.event_type, {})[r.day] = r.n_ev
    types = sorted(grid)
    assert len(got) == len(types) * (len(types) - 1) // 2
    for i, t1 in enumerate(types):
        for t2 in types[i + 1 :]:
            days = sorted(set(grid[t1]) & set(grid[t2]))
            x = np.array([grid[t1][d] for d in days], dtype=np.float64)
            y = np.array([grid[t2][d] for d in days], dtype=np.float64)
            want = float(np.corrcoef(x, y)[0, 1])
            n, r_got = got[(t1, t2)]
            assert n == len(days)
            assert abs(r_got - want) < 1e-6, (t1, t2, r_got, want)


def test_global_rank_offsets_join_broadcast_not_case_chain(spark, sf_dir):
    """r6 advisor: per-partition offsets used to be a WHEN/OTHERWISE
    chain nested one level PER SHUFFLE PARTITION — a quadratic-ish
    Catalyst analysis cost and a stack-depth risk at the thousands of
    partitions a 100 TB sort uses.  Now they attach via a broadcast
    (pid, offset) join; pin both the strategy and the absence of the
    chain."""
    ev = load_table(spark, sf_dir, "events").select("event_id", "value")
    ranked = features.global_rank(ev, ["value", "event_id"])
    plan = ranked._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert plan.count("CASE WHEN") <= 1, "offset CASE chain is back"


def test_global_rank_rejects_null_order_keys(spark):
    """Spark sorts NULLS FIRST on asc, DuckDB defaults to NULLS LAST —
    a null order key silently breaks the bit-identical cross-engine
    guarantee, so global_rank refuses it loudly."""
    import pytest

    df = spark.createDataFrame(
        [(1, 5.0), (2, None), (3, 1.0)], "event_id long, value double"
    )
    with pytest.raises(ValueError, match="NULL in order columns"):
        features.global_rank(df, ["value", "event_id"]).collect()


# ---------------------------------------------------------------------------
# mad_outliers_by
# ---------------------------------------------------------------------------

from vector_db_handler_spark.operators.features import mad_outliers_by


def test_mad_known_values_and_robustness(spark):
    """Group a: values 1..7 plus outlier 1000 → median=4 (lower of 4,5
    at n=8: rank ceil(9/2)=4... discrete rank (n+1)//2=4 → 4th smallest),
    MAD from deviations; the 1000 is flagged.  Group b: constant values
    → MAD 0, any deviation > 0 flagged."""
    rows = [("a", float(v), i) for i, v in enumerate([1, 2, 3, 4, 5, 6, 7, 1000])]
    rows += [("b", 5.0, 100), ("b", 5.0, 101), ("b", 7.0, 102)]
    got = {
        r.g: r
        for r in mad_outliers_by(
            spark.createDataFrame(rows, "g string, v double, i long"),
            "g", "v", "i", z=3,
        ).collect()
    }
    a = got["a"]
    assert a.median == 4.0
    # deviations: 3,2,1,0,1,2,3,996 → sorted 0,1,1,2,2,3,3,996; rank 4 → 2
    assert a.mad == 2.0
    assert a.n_outliers == 1  # only 1000 (dev 996 > 6)
    b = got["b"]
    assert b.median == 5.0 and b.mad == 0.0 and b.n_outliers == 1


def test_mad_partition_invariance(spark):
    rows = [("g", float((i * 37) % 101), i) for i in range(500)]
    df1 = spark.createDataFrame(rows, "g string, v double, i long").repartition(1)
    df32 = spark.createDataFrame(rows, "g string, v double, i long").repartition(32)
    r1 = mad_outliers_by(df1, "g", "v", "i").collect()
    r32 = mad_outliers_by(df32, "g", "v", "i").collect()
    assert sorted(map(tuple, r1)) == sorted(map(tuple, r32))


# ---------------------------------------------------------------------------
# tv_drift_by
# ---------------------------------------------------------------------------

from vector_db_handler_spark.operators.features import tv_drift_by


def _drift_df(spark, rows):
    from pyspark.sql import functions as F

    return spark.createDataFrame(
        rows, ["g", "us", "v"]
    ).select("g", F.timestamp_micros(F.col("us")).alias("ts"), F.col("v").cast("double"))


def test_tv_exact_known_shift(spark):
    """Group a: first half all bin 0 (4 rows), second half all bin 1
    (4 rows) → TV = 1.  Group b: identical halves → TV = 0."""
    hour = 3_600 * 1_000_000
    rows = [("a", i * hour, 10.0) for i in range(4)]          # first half
    rows += [("a", (i + 4) * hour, 60.0) for i in range(4)]   # second half
    rows += [("b", i * hour, 10.0) for i in range(4)]
    got = {
        r.g: r for r in tv_drift_by(_drift_df(spark, rows), "g", "v", "ts").collect()
    }
    a = got["a"]
    assert (a.n1, a.n2) == (4, 4)
    # |4*4-0| + |0-4*4| = 32; den = 2*16 = 32 → TV = 1.0
    assert (a.tv_num, a.tv_den, a.tv) == (32, 32, 1.0)
    b = got["b"]
    assert b.tv == 0.0  # midpoint split puts 2 rows each side, same bin


def test_tv_partition_invariance(spark):
    hour = 3_600 * 1_000_000
    rows = [("g", i * hour, float((i * 17) % 173)) for i in range(300)]
    d1 = _drift_df(spark, rows).repartition(1)
    d32 = _drift_df(spark, rows).repartition(32)
    assert sorted(map(tuple, tv_drift_by(d1, "g", "v", "ts").collect())) == sorted(
        map(tuple, tv_drift_by(d32, "g", "v", "ts").collect())
    )


# ---------------------------------------------------------------------------
# frequent_triples
# ---------------------------------------------------------------------------

from vector_db_handler_spark.operators.features import frequent_triples


def test_frequent_triples_matches_brute_force(spark):
    """Pseudo-random baskets: the Apriori-pruned result equals full
    triple enumeration (downward closure is lossless)."""
    from itertools import combinations

    rows, x = [], 3
    for o in range(60):
        x = (x * 48271) % (2**31 - 1)
        size = 2 + x % 4
        items = set()
        for _ in range(size):
            x = (x * 48271) % (2**31 - 1)
            items.add(x % 15)
        rows += [(o, p) for p in items]
    df = spark.createDataFrame(rows, "o long, p long")
    got = {
        (r.p1, r.p2, r.p3): r.support
        for r in frequent_triples(df, "o", "p", min_support=2).collect()
    }
    from collections import Counter

    baskets = {}
    for o, p in rows:
        baskets.setdefault(o, set()).add(p)
    cnt = Counter()
    for items in baskets.values():
        for t in combinations(sorted(items), 3):
            cnt[t] += 1
    want = {t: c for t, c in cnt.items() if c >= 2}
    assert got == want and len(want) > 0


def test_frequent_triples_empty_when_support_unreachable(spark):
    df = spark.createDataFrame(
        [(1, 1), (1, 2), (1, 3)], "o long, p long"
    )
    assert frequent_triples(df, "o", "p", min_support=2).count() == 0
    assert frequent_triples(df, "o", "p", min_support=1).count() == 1


# ---------------------------------------------------------------------------
# bootstrap_mean_ci
# ---------------------------------------------------------------------------

from vector_db_handler_spark.operators.features import bootstrap_mean_ci


def test_bootstrap_ci_deterministic_and_sane(spark):
    """Identical output under different partitionings; the interval
    brackets the sample mean and is ordered; weight~Poisson(1) makes
    replicate means hover near the sample mean."""
    rows = [("g", float((i * 13) % 47), i) for i in range(800)]
    d1 = spark.createDataFrame(rows, "g string, v double, i long").repartition(1)
    d32 = spark.createDataFrame(rows, "g string, v double, i long").repartition(32)
    r1 = bootstrap_mean_ci(d1, "g", "v", "i").collect()[0]
    r32 = bootstrap_mean_ci(d32, "g", "v", "i").collect()[0]
    assert tuple(r1) == tuple(r32)
    assert r1.ci_lo <= r1.mean <= r1.ci_hi
    assert r1.n == 800
    # interval is non-degenerate but far narrower than the data range
    assert 0 < (r1.ci_hi - r1.ci_lo) < 47


def test_bootstrap_ci_narrows_with_sample_size(spark):
    """4x the rows → roughly half the CI width (the 1/sqrt(n) law,
    asserted loosely)."""
    def width(n):
        rows = [("g", float((i * 29) % 101), i) for i in range(n)]
        df = spark.createDataFrame(rows, "g string, v double, i long")
        r = bootstrap_mean_ci(df, "g", "v", "i").collect()[0]
        return r.ci_hi - r.ci_lo

    w_small, w_big = width(250), width(4000)
    assert w_big < w_small * 0.7


def test_new_stats_operators_drop_null_values(spark):
    """MAD, TV drift, and the bootstrap all drop null-value rows
    declaratively — a null ranking key would diverge cross-engine
    (Spark NULLS FIRST vs DuckDB NULLS LAST)."""
    from pyspark.sql import functions as F

    from vector_db_handler_spark.operators.features import tv_drift_by

    rows = [("g", 1.0, 0), ("g", None, 1), ("g", 3.0, 2), ("g", None, 3)]
    df = spark.createDataFrame(rows, "g string, v double, i long")

    m = mad_outliers_by(df, "g", "v", "i").collect()[0]
    assert m.n == 2  # nulls gone before the count

    tdf = df.select(
        "g", F.timestamp_micros(F.col("i") * 86_400_000_000).alias("ts"), "v"
    )
    t = tv_drift_by(tdf, "g", "v", "ts").collect()[0]
    assert t.n1 + t.n2 == 2

    bci = bootstrap_mean_ci(df, "g", "v", "i").collect()[0]
    assert bci.n == 2

"""HyperBall neighborhood function (Boldi & Vigna): small-graph
accuracy against exact BFS balls, register monotonicity, saturation,
determinism, and the cross-engine DuckDB replay over the
part-supplier graph.  Staged in r12 for r13 driver registration."""

from __future__ import annotations

import pytest

from tests.oracle_check import compare
from vector_db_handler_spark import driver_queries as dq
from vector_db_handler_spark.operators.graph import hyperball_neighborhood
from vector_db_handler_spark.operators.hll import hll_alpha

P = 6
HOPS = 2
K = 1 << P
S = 61 - P
_NUMER = repr(hll_alpha(K) * (K * K) * float(1 << S))
_L = dq._ilog2_kilo_sql

_REG0 = f"""
  SELECT node, h & {K - 1} AS bucket,
         CASE WHEN (h >> {P}) = 0 THEN {S}
              ELSE {60 - P} - length(printf('%b', h >> {P})) + 1 END AS m
  FROM (SELECT node,
               CAST('0x' || substr(md5(CAST(node AS VARCHAR)), 1, 15)
                    AS BIGINT) AS h
        FROM nodes)"""

_MERGE = """,
r{i} AS MATERIALIZED (
  SELECT node, bucket, max(m) AS m FROM (
    SELECT * FROM r{j}
    UNION ALL
    SELECT s.a AS node, r.bucket, r.m FROM sym s JOIN r{j} r ON s.b = r.node
  ) GROUP BY 1, 2
)"""

#: DuckDB twin over the SAME symmetrized part–supplier graph the
#: registered pagerank/LPA use, HOPS unrolled max-merge rounds, then
#: the shared estimate arithmetic per (node, hop) — the SQL an r13
#: registration will carry.
ORACLE_SQL = (
    f"""
WITH e0 AS (SELECT DISTINCT l_partkey AS p, l_suppkey AS s FROM lineitem),
sym AS MATERIALIZED (
  SELECT p * 2 AS a, s * 2 + 1 AS b FROM e0
  UNION ALL
  SELECT s * 2 + 1, p * 2 FROM e0
),
nodes AS (SELECT DISTINCT a AS node FROM sym),
r0 AS MATERIALIZED ({_REG0}
)"""
    + "".join(_MERGE.format(i=i, j=i - 1) for i in range(1, HOPS + 1))
    + f""",
regs AS (
"""
    + "\n  UNION ALL\n".join(
        f"  SELECT CAST({h} AS BIGINT) AS hop, node, bucket, m FROM r{h}"
        for h in range(HOPS + 1)
    )
    + f"""
),
grid AS (
  SELECT n.node, h.hop, g.bucket
  FROM nodes n, range({HOPS + 1}) AS h(hop), range({K}) AS g(bucket)
),
allregs AS (
  SELECT g.node, g.hop, COALESCE(r.m, 0) AS m
  FROM grid g LEFT JOIN regs r
    ON g.node = r.node AND g.hop = r.hop AND g.bucket = r.bucket
),
agg AS (
  SELECT node, hop,
         CAST(sum(CASE WHEN m = 0 THEN 1 ELSE 0 END) AS BIGINT)
           AS n_zero_buckets,
         CAST(sum(CAST(1 AS BIGINT) << CAST({S} - m AS INT)) AS BIGINT)
           AS sum_scaled
  FROM allregs GROUP BY 1, 2
)
SELECT node, CAST(hop AS BIGINT) AS hop, n_zero_buckets, sum_scaled,
       ROUND({_NUMER} / CAST(sum_scaled AS DOUBLE), 6) AS est_raw,
       CASE WHEN n_zero_buckets > 0 THEN
         ROUND((({_L(f"CAST(floor({float(K * (1 << 20))!r} / n_zero_buckets) AS BIGINT)")}
                 / 1024.0 - 20.0) * 0.6931471805599453) * {float(K)!r}, 6)
       END AS est_lc,
       CASE WHEN ROUND({_NUMER} / CAST(sum_scaled AS DOUBLE), 6) <= {2.5 * K!r}
                 AND n_zero_buckets > 0
            THEN ROUND((({_L(f"CAST(floor({float(K * (1 << 20))!r} / n_zero_buckets) AS BIGINT)")}
                         / 1024.0 - 20.0) * 0.6931471805599453) * {float(K)!r}, 6)
            ELSE ROUND({_NUMER} / CAST(sum_scaled AS DOUBLE), 6)
       END AS est_used
FROM agg
"""
)


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "src long, dst long")


def _balls(pairs, hops):
    """Exact BFS ball sizes per node per hop (pure-Python truth)."""
    import collections

    nbrs = collections.defaultdict(set)
    for a, b in pairs:
        if a != b:
            nbrs[a].add(b)
            nbrs[b].add(a)
    out = {}
    for n in nbrs:
        ball = {n}
        out[(n, 0)] = 1
        for h in range(1, hops + 1):
            ball |= {m for x in ball for m in nbrs[x]}
            out[(n, h)] = len(ball)
    return out


def test_chain_balls_track_exact_bfs(spark):
    """10-node chain: tiny balls (1/≤3/≤5) sit deep in the
    linear-counting regime where the estimate is near-exact."""
    pairs = [(i, i + 1) for i in range(9)]
    truth = _balls(pairs, HOPS)
    got = {
        (r["node"], r["hop"]): r["est_used"]
        for r in hyperball_neighborhood(_edges(spark, pairs), n_hops=HOPS).collect()
    }
    assert set(got) == set(truth)
    for key, true_n in truth.items():
        assert abs(got[key] - true_n) <= max(1.5, 0.35 * true_n), (key, got[key], true_n)


def test_registers_monotone_and_saturating(spark):
    """sum_scaled never increases with hop (max-merge only grows
    registers), and on a complete graph the hop-1 ball is already
    everything — hop 2 registers are identical."""
    pairs = [(a, b) for a in range(5) for b in range(5) if a < b]
    rows = hyperball_neighborhood(_edges(spark, pairs), n_hops=2).collect()
    by = {(r["node"], r["hop"]): r for r in rows}
    for n in range(5):
        s0, s1, s2 = (by[(n, h)]["sum_scaled"] for h in (0, 1, 2))
        assert s0 >= s1 >= s2
        assert by[(n, 1)]["sum_scaled"] == by[(n, 2)]["sum_scaled"]
        assert by[(n, 1)]["est_used"] == by[(n, 2)]["est_used"]


def test_self_loops_dropped_and_hops_validated(spark):
    out = hyperball_neighborhood(_edges(spark, [(1, 1)]), n_hops=1).collect()
    assert out == []
    with pytest.raises(ValueError, match="n_hops"):
        hyperball_neighborhood(_edges(spark, [(1, 2)]), n_hops=-1)


def test_deterministic_across_partitionings(spark):
    pairs = [(a, a + 1) for a in range(40)] + [(0, 39), (7, 23)]
    one = hyperball_neighborhood(_edges(spark, pairs).coalesce(1), n_hops=2)
    many = hyperball_neighborhood(_edges(spark, pairs).repartition(8), n_hops=2)
    assert sorted(map(tuple, one.collect())) == sorted(map(tuple, many.collect()))


def test_fixture_accuracy_within_sketch_band(spark, sf_dir):
    """Part–supplier 2-hop balls vs exact BFS: the per-node estimate
    must sit inside the 64-register sketch's error distribution
    (median within 1σ≈13%·1.5, and no pathological tail)."""
    from pyspark.sql import functions as F

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    pairs = [
        (r["p"] * 2, r["s"] * 2 + 1)
        for r in li.select(
            F.col("l_partkey").alias("p"), F.col("l_suppkey").alias("s")
        ).distinct().collect()
    ]
    truth = _balls(pairs, HOPS)
    edges = _edges(spark, pairs)
    got = {
        (r["node"], r["hop"]): r["est_used"]
        for r in hyperball_neighborhood(edges, n_hops=HOPS).collect()
    }
    errs = sorted(
        abs(got[k] - n) / n for k, n in truth.items() if k[1] == HOPS
    )
    median = errs[len(errs) // 2]
    p95 = errs[int(len(errs) * 0.95)]
    assert median < 0.20, median
    assert p95 < 0.50, p95


def test_cross_engine_oracle_replay(spark, sf_dir, duck):
    from pyspark.sql import functions as F

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    e0 = li.select("l_partkey", "l_suppkey").distinct()
    edges = e0.select(
        (F.col("l_partkey") * 2).alias("src"),
        (F.col("l_suppkey") * 2 + 1).alias("dst"),
    )
    compare(hyperball_neighborhood(edges, n_hops=HOPS, p=P), duck, ORACLE_SQL)


# --- neighborhood function / effective diameter ------------------------

#: DuckDB twin of the rollup an r13 registration will carry: the
#: hyperball oracle's per-(node,hop) estimates rolled up per hop with
#: exact micro-integer sums and the coverage flag.
NEIGHBORHOOD_SQL = (
    "WITH pernode AS (" + ORACLE_SQL.strip().rstrip() + """),
rolled AS (
  SELECT hop, CAST(count(*) AS BIGINT) AS n_nodes,
         CAST(sum(CAST(floor(est_used * 1000000.0) AS BIGINT)) AS BIGINT)
           AS sum_reach_micro
  FROM pernode GROUP BY 1
),
deepest AS (
  SELECT sum_reach_micro AS max_reach_micro
  FROM rolled ORDER BY hop DESC LIMIT 1
)
SELECT r.hop, r.n_nodes, r.sum_reach_micro,
       ROUND(CAST(r.sum_reach_micro AS DOUBLE) / d.max_reach_micro, 6)
         AS reach_ratio,
       CAST(r.sum_reach_micro AS DOUBLE) >= 0.9 * d.max_reach_micro
         AS covers_q
FROM rolled r, deepest d
"""
)


def test_neighborhood_function_monotone_and_covers(spark):
    """On a clique N(1) already covers everything: hop 1 and hop 2
    tie, both cover q, and reach is monotone in hop."""
    from vector_db_handler_spark.operators.graph import (
        neighborhood_function,
    )

    pairs = [(a, b) for a in range(6) for b in range(6) if a < b]
    rows = {r["hop"]: r for r in neighborhood_function(_edges(spark, pairs), n_hops=2).collect()}
    assert rows[0]["sum_reach_micro"] <= rows[1]["sum_reach_micro"]
    assert rows[1]["sum_reach_micro"] == rows[2]["sum_reach_micro"]
    assert rows[2]["reach_ratio"] == 1.0 and rows[2]["covers_q"]
    assert rows[1]["covers_q"] and not rows[0]["covers_q"]


def test_effective_diameter_on_chain(spark):
    """A long chain needs every hop: the smallest covering hop is the
    deepest one, and ratios grow strictly."""
    from vector_db_handler_spark.operators.graph import (
        neighborhood_function,
    )

    pairs = [(i, i + 1) for i in range(30)]
    rows = {r["hop"]: r for r in neighborhood_function(_edges(spark, pairs), n_hops=2).collect()}
    assert rows[0]["reach_ratio"] < rows[1]["reach_ratio"] < 1.0
    assert not rows[0]["covers_q"] and not rows[1]["covers_q"]
    assert rows[2]["covers_q"]


def test_neighborhood_cross_engine_replay(spark, sf_dir, duck):
    from pyspark.sql import functions as F

    from vector_db_handler_spark.operators.graph import (
        neighborhood_function,
    )

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    e0 = li.select("l_partkey", "l_suppkey").distinct()
    edges = e0.select(
        (F.col("l_partkey") * 2).alias("src"),
        (F.col("l_suppkey") * 2 + 1).alias("dst"),
    )
    compare(
        neighborhood_function(edges, n_hops=HOPS, p=P), duck, NEIGHBORHOOD_SQL
    )

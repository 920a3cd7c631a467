"""LSH band-configuration recall report — the dedup pillar's
evaluation harness (twin of ann_recall_report).  Cross-engine DuckDB
replay plus the S-curve monotonicity pins; registered as an r10 driver
query (driver_queries._LSH_RECALL_SQL is the single source of truth
for the oracle)."""

from __future__ import annotations

from tests.oracle_check import compare
from vector_db_handler_spark import driver_queries as dq
from vector_db_handler_spark.operators.dedup import LSH_CONFIGS, lsh_recall_report

ORACLE_SQL = dq._LSH_RECALL_SQL


def test_cross_engine_oracle_replay(spark, sf_dir, duck):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    compare(lsh_recall_report(docs, threshold=0.5), duck, ORACLE_SQL)


def test_s_curve_monotone_on_fixture(spark, sf_dir):
    """More, narrower bands must never lower recall or shrink the
    candidate set on the fixture (deterministic data, deterministic
    outcome): the (8,1) any-permutation config dominates (1,8)'s
    all-permutations config at both ends of the trade-off."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    rows = {
        (r["n_bands"], r["rows_per_band"]): r
        for r in lsh_recall_report(docs, threshold=0.5).collect()
    }
    assert set(rows) == set(LSH_CONFIGS)
    ladder = [(8, 1), (4, 2), (2, 4), (1, 8)]  # widening rows per band
    n_true = {r["n_true"] for r in rows.values()}
    assert len(n_true) == 1 and n_true.pop() > 0, "fixture has planted near-dups"
    for hi, lo in zip(ladder, ladder[1:]):
        assert rows[hi]["n_candidates"] >= rows[lo]["n_candidates"]
        assert rows[hi]["recall"] >= rows[lo]["recall"]
    # the full-signature config only fires on (near-)identical docs;
    # the widest config must reach every true pair the 2-row verified
    # production config (4,2) reaches
    assert rows[(8, 1)]["n_hits"] >= rows[(4, 2)]["n_hits"]

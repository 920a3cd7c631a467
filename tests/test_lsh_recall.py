"""LSH band-configuration recall report — the dedup pillar's
evaluation harness (twin of ann_recall_report).  Cross-engine DuckDB
replay plus the S-curve monotonicity pins; staged for r10 driver
registration (r9's window is reserved for stale-evidence rotation)."""

from __future__ import annotations

from tests.oracle_check import compare
from vector_db_handler_spark import driver_queries as dq
from vector_db_handler_spark.operators import dedup as dedup_ops
from vector_db_handler_spark.operators.dedup import LSH_CONFIGS, lsh_recall_report


def _band_select(b: int, r: int) -> str:
    sels = []
    for i in range(b):
        expr = "0"
        for j in range(r):
            expr = f"(({expr}) * 131 + mh{i * r + j}) % {dedup_ops.MINHASH_P}"
        sels.append(f"SELECT doc_id, {i} AS band, {expr} AS key FROM sig")
    return "\n  UNION ALL\n  ".join(sels)


def _config_ctes() -> tuple[str, str]:
    ctes, selects = [], []
    for b, r in LSH_CONFIGS:
        tag = f"{b}_{r}"
        ctes.append(f"bands_{tag} AS (\n  {_band_select(b, r)}\n)")
        ctes.append(
            f"""cands_{tag} AS (
  SELECT DISTINCT x.doc_id AS d1, y.doc_id AS d2
  FROM bands_{tag} x JOIN bands_{tag} y
    ON x.band = y.band AND x.key = y.key AND x.doc_id < y.doc_id
)"""
        )
        selects.append(
            f"""SELECT CAST({b} AS BIGINT) AS n_bands,
       CAST({r} AS BIGINT) AS rows_per_band,
       CAST((SELECT count(*) FROM cands_{tag}) AS BIGINT) AS n_candidates,
       CAST((SELECT count(*) FROM cands_{tag} c
             JOIN truth t ON c.d1 = t.d1 AND c.d2 = t.d2) AS BIGINT) AS n_hits,
       (SELECT n_true FROM n_truth) AS n_true,
       CASE WHEN (SELECT n_true FROM n_truth) > 0 THEN
         ROUND(CAST((SELECT count(*) FROM cands_{tag} c
                     JOIN truth t ON c.d1 = t.d1 AND c.d2 = t.d2) AS DOUBLE)
               / (SELECT n_true FROM n_truth), 6)
       END AS recall"""
        )
    return ",\n".join(ctes), "\nUNION ALL\n".join(selects)


_CTES, _SELECTS = _config_ctes()

#: The SQL an r10 registration will carry — composed from the same
#: shingle/minhash fragments the verified minhash_lsh_pairs oracle uses.
ORACLE_SQL = f"""
WITH sh0 AS ({dq._SHINGLE_SQL}),
h AS (SELECT doc_id, {dq._sql_hash('shingle', 7)} AS h28 FROM sh0),
sig AS (SELECT doc_id,
  {dq._MINHASH_TERMS}
  FROM h GROUP BY doc_id),
shh AS (SELECT doc_id, {dq._sql_hash('shingle', 15)} AS hh FROM sh0),
hot AS (
  SELECT hh FROM shh GROUP BY hh
  HAVING count(*) > 0.01 * (SELECT count(DISTINCT doc_id) FROM documents)
),
shg AS (SELECT * FROM shh WHERE hh NOT IN (SELECT hh FROM hot)),
sizes AS (SELECT doc_id, count(*) AS n FROM shg GROUP BY doc_id),
common AS (
  SELECT a.doc_id AS d1, b.doc_id AS d2, count(*) AS nc
  FROM shg a JOIN shg b ON a.hh = b.hh AND a.doc_id < b.doc_id
  GROUP BY 1, 2
),
truth AS (
  SELECT d1, d2 FROM common
  JOIN sizes s1 ON d1 = s1.doc_id
  JOIN sizes s2 ON d2 = s2.doc_id
  WHERE CAST(nc AS DOUBLE) / (s1.n + s2.n - nc) >= 0.5
),
n_truth AS (SELECT CAST(count(*) AS BIGINT) AS n_true FROM truth),
{_CTES}
{_SELECTS}
"""


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

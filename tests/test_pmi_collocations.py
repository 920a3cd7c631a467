"""PMI collocations (`operators.lm_score.pmi_collocations`): top-k
strongly-associated adjacent token pairs by exact-integer PMI lift —
the phrase-vocabulary / BPE-merge-candidate rail of the text-analysis
battery.  Pins: the cross-engine DuckDB replay at the staged driver
dials, the rare-pair guard (min_count), ordering determinism, and the
exactness of the DECIMAL(38,0) integer division.  Staged in r15 for
r16 driver registration (the oracle moves to driver_queries then)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tests.oracle_check import assert_oracle_types_hashable, compare
from vector_db_handler_spark.operators.lm_score import pmi_collocations

#: Staged driver-row dials.
MIN_COUNT = 5
K = 50


def _pmi_sql(min_count: int = MIN_COUNT, k: int = K) -> str:
    return f"""
WITH toks AS (SELECT string_split(text, ' ') AS t FROM documents),
uni AS (
  SELECT tok, CAST(COUNT(*) AS HUGEINT) AS n
  FROM (SELECT unnest(t) AS tok FROM toks) GROUP BY tok
),
tot AS (SELECT SUM(n) AS n_tok FROM uni),
nbig AS (
  SELECT CAST(SUM(CASE WHEN len(t) >= 2 THEN len(t) - 1 ELSE 0 END)
         AS HUGEINT) AS n_big
  FROM toks
),
pairs AS (
  SELECT x, y, CAST(COUNT(*) AS HUGEINT) AS n_xy FROM (
    SELECT t[i] AS x, t[i + 1] AS y
    FROM toks, unnest(generate_series(1, len(t) - 1)) AS s(i)
  ) GROUP BY x, y
  HAVING COUNT(*) >= {min_count}
)
SELECT x, y, CAST(n_xy AS BIGINT) AS n_xy,
       CAST(u1.n AS BIGINT) AS n_x, CAST(u2.n AS BIGINT) AS n_y,
       CAST((CAST(1000000 AS HUGEINT) * n_xy * t.n_tok * t.n_tok)
            // (nb.n_big * u1.n * u2.n) AS BIGINT) AS lift_micro
FROM pairs
JOIN uni u1 ON pairs.x = u1.tok
JOIN uni u2 ON pairs.y = u2.tok, tot t, nbig nb
ORDER BY lift_micro DESC, x ASC, y ASC
LIMIT {k}
"""


PMI_SQL = _pmi_sql()


def _docs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def test_oracle_types_hashable(duck):
    assert_oracle_types_hashable(duck, PMI_SQL, "pmi")


def test_pmi_cross_engine(spark, sf_dir, duck):
    got = pmi_collocations(_docs(spark, sf_dir), min_count=MIN_COUNT, k=K)
    compare(got, duck, PMI_SQL)


def test_pmi_cross_engine_min_count_1(spark, sf_dir, duck):
    """The rare-pair tail (min_count=1) still hash-checks — the
    integer division is exact even where raw PMI is noisiest."""
    got = pmi_collocations(_docs(spark, sf_dir), min_count=1, k=20)
    compare(got, duck, _pmi_sql(min_count=1, k=20))


def test_min_count_guard(spark, sf_dir):
    out = pmi_collocations(_docs(spark, sf_dir), min_count=10, k=1000)
    assert out.agg(F.min("n_xy")).collect()[0][0] >= 10


def test_ordering_and_limit(spark, sf_dir):
    rows = pmi_collocations(_docs(spark, sf_dir), min_count=2, k=10).collect()
    assert len(rows) == 10
    key = [(-r.lift_micro, r.x, r.y) for r in rows]
    assert key == sorted(key)


def test_args_validated(spark, sf_dir):
    docs = _docs(spark, sf_dir)
    with pytest.raises(ValueError, match="min_count"):
        pmi_collocations(docs, min_count=0)
    with pytest.raises(ValueError, match="k"):
        pmi_collocations(docs, k=0)

"""Hash-sample quantile sketch (`operators.sketches`): the quantile
summary completing the sketch pillar (HLL/KMV = distinct, CMS =
frequency).  Staged in r15 for r16 driver registration.

Pins: cross-engine DuckDB replay of the full accuracy report (exact
ceil-rank quantiles next to the sketch estimates — the
sketch_accuracy_by_lang discipline), sample_mod=1 ⇒ estimate equals
the exact rail bit-for-bit (the correctness anchor), state merges by
plain UNION (the sample is a deterministic row filter, so per-batch
summaries need no merge logic), empty-sample keys report sample_n=0
with null estimates (loud, never interpolated), and the guard."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tests.oracle_check import assert_oracle_types_hashable, compare
from vector_db_handler_spark.operators.sketches import (
    hash_sample_quantile_report,
    hash_value_sample,
    quantiles_from_sample,
)

#: Staged driver-row dials.
MOD = 8
PCTS = (50, 90, 99)

_HASH_ID = (
    "CAST('0x' || substr(md5(CAST(event_id AS VARCHAR)), 1, 15) AS BIGINT)"
)

_RANKED = """
  SELECT event_type, value,
         row_number() OVER (PARTITION BY event_type
                            ORDER BY value ASC, event_id ASC) AS rn,
         COUNT(*) OVER (PARTITION BY event_type) AS n
  FROM {src}
"""

_QCOLS = """
         CAST(MAX(n) AS BIGINT) AS {pfx}n,
         MAX(CASE WHEN rn = (50 * n + 99) // 100 THEN value END) AS {pfx}p50,
         MAX(CASE WHEN rn = (90 * n + 99) // 100 THEN value END) AS {pfx}p90,
         MAX(CASE WHEN rn = (99 * n + 99) // 100 THEN value END) AS {pfx}p99
"""

QSKETCH_SQL = f"""
WITH ranked AS ({_RANKED.format(src="events")}),
exact AS (
  SELECT event_type,{_QCOLS.format(pfx="")}
  FROM ranked GROUP BY event_type
),
samp AS (
  SELECT event_type, value, event_id FROM events
  WHERE {_HASH_ID} % {MOD} = 0
),
sranked AS ({_RANKED.format(src="samp")}),
est AS (
  SELECT event_type,{_QCOLS.format(pfx="est_")}
  FROM sranked GROUP BY event_type
)
SELECT e.event_type, e.n, e.p50, e.p90, e.p99,
       CAST(COALESCE(s.est_n, 0) AS BIGINT) AS sample_n,
       s.est_p50, s.est_p90, s.est_p99
FROM exact e LEFT JOIN est s USING (event_type)
"""


def _events(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/events.parquet").select(
        "event_id", "event_type", "value"
    )


def _rows(df):
    return sorted(map(tuple, df.collect()))


def test_oracle_types_hashable(duck):
    assert_oracle_types_hashable(duck, QSKETCH_SQL, "quantile_sketch")


def test_report_cross_engine(spark, sf_dir, duck):
    compare(
        hash_sample_quantile_report(_events(spark, sf_dir), sample_mod=MOD),
        duck,
        QSKETCH_SQL,
    )


def test_mod1_estimate_equals_exact(spark, sf_dir):
    """sample_mod=1 keeps every row: the sketch's estimate columns
    must equal the exact rail bit-for-bit."""
    rep = hash_sample_quantile_report(
        _events(spark, sf_dir), sample_mod=1
    ).collect()
    assert rep
    for r in rep:
        assert r["sample_n"] == r["n"]
        for p in PCTS:
            assert r[f"est_p{p}"] == r[f"p{p}"]


def test_state_merges_by_union(spark, sf_dir):
    """Per-batch sample states union to the whole-corpus state: the
    estimate over union(sample(A), sample(B)) equals the single-pass
    report's estimate columns."""
    ev = _events(spark, sf_dir)
    halves = [ev.filter("event_id % 2 = 0"), ev.filter("event_id % 2 = 1")]
    merged = hash_value_sample(
        halves[0], "value", "event_id", "event_type", MOD
    ).unionByName(
        hash_value_sample(halves[1], "value", "event_id", "event_type", MOD)
    )
    got = _rows(
        quantiles_from_sample(merged, "event_type", "value", "event_id", PCTS)
    )
    whole = hash_sample_quantile_report(ev, sample_mod=MOD).select(
        "event_type",
        F.col("sample_n").alias("est_n"),
        *[f"est_p{p}" for p in PCTS],
    )
    assert got == _rows(whole)


def test_empty_sample_key_is_loud(spark, sf_dir):
    """A sample_mod larger than the hash space of ids present leaves
    every key unsampled: sample_n = 0, estimates null — never an
    interpolated guess."""
    rep = hash_sample_quantile_report(
        _events(spark, sf_dir), sample_mod=1 << 59
    ).collect()
    assert rep
    for r in rep:
        if r["sample_n"] == 0:
            assert all(r[f"est_p{p}"] is None for p in PCTS)
    assert any(r["sample_n"] == 0 for r in rep)


def test_sample_mod_guard(spark, sf_dir):
    with pytest.raises(ValueError, match="sample_mod"):
        hash_value_sample(
            _events(spark, sf_dir), "value", "event_id", "event_type", 0
        )

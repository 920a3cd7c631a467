"""Min/max file-skipping audit: hand-checkable pruning decisions,
z-beats-hash on range predicates, edge semantics, and the
cross-engine DuckDB replay over orders (custkey × order-day).
Staged in r12 for r13 driver registration."""

from __future__ import annotations

import pytest

from tests.oracle_check import compare
from vector_db_handler_spark.operators.layout import (
    Z_BITS,
    minmax_pruning_report,
    z_expr_sql,
)

SHIFT = 18
PREDICATES = [
    ("cust_low", 1, 150, -2000, 3000),
    ("cust_point", 500, 520, -2000, 3000),
    ("one_year", 0, 1_000_000, 365, 730),
    ("tight_box", 100, 400, 0, 400),
]

_PRED_VALUES = ", ".join(
    f"('{p}', CAST({a} AS BIGINT), CAST({b} AS BIGINT), "
    f"CAST({c} AS BIGINT), CAST({d} AS BIGINT))"
    for p, a, b, c, d in PREDICATES
)

_Z = z_expr_sql("x", "y", Z_BITS, "duckdb")
_HASH = (
    "CAST('0x' || substr(md5(CAST(x AS VARCHAR) || '|' "
    "|| CAST(y AS VARCHAR)), 1, 15) AS BIGINT) % 64"
)


def _census_sql(bucket_expr: str, tag: str) -> str:
    return f"""
{tag}s AS (
  SELECT {bucket_expr} AS bkt, count(*) AS n_rows,
         min(x) AS x_min, max(x) AS x_max,
         min(y) AS y_min, max(y) AS y_max
  FROM base GROUP BY 1
),
{tag}c AS (
  SELECT p.pred_id,
         CAST(count(*) AS BIGINT) AS n_buckets_{tag},
         CAST(sum(CASE WHEN NOT (s.x_max < p.x_lo OR s.x_min > p.x_hi
                                 OR s.y_max < p.y_lo OR s.y_min > p.y_hi)
                       THEN 1 ELSE 0 END) AS BIGINT) AS n_kept_{tag},
         CAST(sum(CASE WHEN NOT (s.x_max < p.x_lo OR s.x_min > p.x_hi
                                 OR s.y_max < p.y_lo OR s.y_min > p.y_hi)
                       THEN s.n_rows ELSE 0 END) AS BIGINT)
           AS rows_scanned_{tag}
  FROM {tag}s s, preds p GROUP BY 1
)"""


#: DuckDB twin — the SQL an r13 registration will carry ('z' census
#: via the shared Morton expression, 'h' census via the md5 hash
#: baseline, one matching pass, ratios as single rounded divisions).
ORACLE_SQL = f"""
WITH base AS (
  SELECT CAST(o_custkey AS BIGINT) AS x,
         CAST(datediff('day', DATE '1995-01-01',
                       CAST(o_orderdate AS DATE)) AS BIGINT) AS y
  FROM orders WHERE o_custkey IS NOT NULL AND o_orderdate IS NOT NULL
),
preds(pred_id, x_lo, x_hi, y_lo, y_hi) AS (VALUES {_PRED_VALUES}),
{_census_sql(f"({_Z}) >> {SHIFT}", "z")},
{_census_sql(_HASH, "hash")},
matching AS (
  SELECT p.pred_id, CAST(count(*) AS BIGINT) AS rows_matching
  FROM base b JOIN preds p
    ON b.x BETWEEN p.x_lo AND p.x_hi AND b.y BETWEEN p.y_lo AND p.y_hi
  GROUP BY 1
),
total AS (SELECT CAST(count(*) AS BIGINT) AS n_rows_total FROM base)
SELECT z.pred_id, t.n_rows_total,
       COALESCE(m.rows_matching, 0) AS rows_matching,
       z.n_buckets_z, z.n_kept_z, z.rows_scanned_z,
       ROUND(1.0 - CAST(z.rows_scanned_z AS DOUBLE) / t.n_rows_total, 6)
         AS skip_ratio_z,
       h.n_buckets_hash, h.n_kept_hash, h.rows_scanned_hash,
       ROUND(1.0 - CAST(h.rows_scanned_hash AS DOUBLE) / t.n_rows_total, 6)
         AS skip_ratio_hash
FROM zc z
JOIN hashc h USING (pred_id)
LEFT JOIN matching m USING (pred_id)
CROSS JOIN total t
"""


def _df(spark, rows):
    return spark.createDataFrame(rows, "x long, y long")


def test_hand_checkable_pruning(spark):
    """Two well-separated value clusters: a predicate over one
    cluster must scan ONLY that cluster's z-buckets, and the exact
    matching count comes back right."""
    rows = [(i, i) for i in range(0, 50)] + [(i, i) for i in range(10_000, 10_050)]
    out = {
        r["pred_id"]: r
        for r in minmax_pruning_report(
            _df(spark, rows), "x", "y",
            [("low", 0, 49, 0, 49), ("high", 10_000, 10_049, 10_000, 10_049)],
            bucket_shift=10,
        ).collect()
    }
    for pid in ("low", "high"):
        r = out[pid]
        assert r["rows_matching"] == 50
        assert r["rows_scanned_z"] == 50          # perfect skip
        assert r["n_kept_z"] < r["n_buckets_z"]
    assert out["low"]["n_rows_total"] == 100


def test_z_beats_hash_on_range_predicates(spark):
    """The point of clustering: on a range predicate the z layout
    scans a strict subset of what the hash layout scans (hash
    buckets all span the full value range, so nothing prunes)."""
    rows = [((i * 7) % 1000, (i * 13) % 1000) for i in range(4000)]
    out = minmax_pruning_report(
        _df(spark, rows), "x", "y", [("band", 0, 99, 0, 999)],
        bucket_shift=12,
    ).collect()[0]
    assert out["rows_scanned_z"] < out["rows_scanned_hash"]
    assert out["skip_ratio_z"] > out["skip_ratio_hash"]
    # hash buckets span near-full value ranges, so pruning is rare
    # luck (small buckets), never the rule: z must keep strictly fewer
    assert out["n_kept_z"] < out["n_kept_hash"]
    assert out["rows_scanned_z"] >= out["rows_matching"]  # never false-skips


def test_empty_predicate_box_scans_nothing_matching(spark):
    rows = [(i, i) for i in range(100)]
    out = minmax_pruning_report(
        _df(spark, rows), "x", "y", [("miss", 5_000, 6_000, 5_000, 6_000)],
        bucket_shift=10,
    ).collect()[0]
    assert out["rows_matching"] == 0
    assert out["rows_scanned_z"] == 0 and out["n_kept_z"] == 0


def test_predicates_validated(spark):
    df = _df(spark, [(1, 1)])
    with pytest.raises(ValueError, match="at least one"):
        minmax_pruning_report(df, "x", "y", [])
    with pytest.raises(ValueError, match="duplicate"):
        minmax_pruning_report(
            df, "x", "y", [("a", 0, 1, 0, 1), ("a", 2, 3, 2, 3)]
        )


def test_null_rows_drop_declaratively(spark):
    rows = [(1, 1), (None, 2), (3, None)]
    df = spark.createDataFrame(rows, "x long, y long")
    out = minmax_pruning_report(
        df, "x", "y", [("all", 0, 10, 0, 10)], bucket_shift=4
    ).collect()[0]
    assert out["n_rows_total"] == 1 and out["rows_matching"] == 1


def test_cross_engine_oracle_replay(spark, sf_dir, duck):
    from pyspark.sql import functions as F

    orders = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        F.col("o_custkey").cast("long").alias("ck"),
        F.datediff(
            F.col("o_orderdate").cast("date"), F.lit("1995-01-01").cast("date")
        )
        .cast("long")
        .alias("days"),
    )
    got = minmax_pruning_report(
        orders, "ck", "days", PREDICATES, bucket_shift=SHIFT
    )
    compare(got, duck, ORACLE_SQL)

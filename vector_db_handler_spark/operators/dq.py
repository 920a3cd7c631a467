"""Declarative data-quality constraint checking (Deequ-style) in ONE scan.

The curation surface around ingest (reference exposes none; extension
territory): before a corpus snapshot is promoted to training, assert
completeness / uniqueness / domain / bounds invariants and emit an
auditable per-constraint report — the `VerificationSuite` shape of
AWS Labs' Deequ, re-expressed as a single Spark aggregate.

Design for 100 TB:

* EVERY constraint lowers to aggregate expressions inside ONE
  ``groupBy().agg()`` over ONE pass of the relation — adding a
  constraint adds a column to the partial aggregate, not a scan.
  (Multiple COUNT DISTINCT columns share the scan through Catalyst's
  Expand; everything else is map-side combined.)
* The aggregated result is a SINGLE row; the per-constraint report is
  an in-row ``explode`` of constraint structs — no second shuffle, no
  driver loop.
* Verdicts are computed on exact integers (violation counts, distinct
  counts, rational thresholds num/den) so a report is bit-identical
  under any partitioning and hash-checkable cross-engine.  The only
  doubles touched are the data's own values inside comparisons.

Report columns: ``(check, col, metric_num, metric_den, passed)`` —
``metric_num / metric_den`` is the observed ratio or count behind the
verdict (den=1 for plain counts), kept as two BIGINTs rather than a
float so the report itself stays exact.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "completeness",
    "uniqueness",
    "accepted_values",
    "bounds",
    "row_count_between",
    "dq_check",
]


def completeness(col: str, min_num: int = 1, min_den: int = 1) -> dict:
    """Non-null fraction of ``col`` must be >= min_num/min_den
    (default: fully complete).  Rational threshold keeps the verdict
    integer-exact: passed ⇔ nonnull·min_den >= min_num·total."""
    return {"check": "completeness", "col": col, "num": min_num, "den": min_den}


def uniqueness(col: str) -> dict:
    """Every non-null value of ``col`` appears exactly once."""
    return {"check": "uniqueness", "col": col}


def accepted_values(col: str, values: list) -> dict:
    """All non-null values of ``col`` drawn from ``values``."""
    return {"check": "accepted_values", "col": col, "values": list(values)}


def bounds(col: str, lo, hi) -> dict:
    """All non-null values of ``col`` within [lo, hi] inclusive."""
    return {"check": "bounds", "col": col, "lo": lo, "hi": hi}


def row_count_between(lo: int, hi: int) -> dict:
    """Total row count within [lo, hi] inclusive."""
    return {"check": "row_count", "col": "*", "lo": lo, "hi": hi}


def _agg_and_verdict(c: dict, i: int) -> tuple[list[Column], Column]:
    """(aggregate expressions, report-row struct) for one constraint."""
    n = F.count(F.lit(1))
    tag = lambda s: f"_c{i}_{s}"  # noqa: E731 — local aliasing helper
    kind, col = c["check"], c["col"]
    if kind == "completeness":
        aggs = [F.count(col).alias(tag("nn")), n.alias(tag("n"))]
        num, den = F.col(tag("nn")), F.col(tag("n"))
        passed = num * F.lit(c["den"]) >= F.lit(c["num"]) * den
    elif kind == "uniqueness":
        aggs = [
            F.countDistinct(col).alias(tag("d")),
            F.count(col).alias(tag("n")),
        ]
        num, den = F.col(tag("d")), F.col(tag("n"))
        passed = num == den
    elif kind == "accepted_values":
        bad = (~F.col(col).isin(c["values"])).cast("long")
        # coalesce OUTSIDE the sum: SUM over zero rows is NULL, and a
        # null violation count must read as 0 (vacuously passing).
        aggs = [
            F.coalesce(F.sum(F.coalesce(bad, F.lit(0))), F.lit(0)).alias(tag("v")),
            n.alias(tag("n")),
        ]
        num, den = F.col(tag("v")), F.col(tag("n"))
        passed = num == 0
    elif kind == "bounds":
        bad = ((F.col(col) < F.lit(c["lo"])) | (F.col(col) > F.lit(c["hi"]))).cast(
            "long"
        )
        aggs = [
            F.coalesce(F.sum(F.coalesce(bad, F.lit(0))), F.lit(0)).alias(tag("v")),
            n.alias(tag("n")),
        ]
        num, den = F.col(tag("v")), F.col(tag("n"))
        passed = num == 0
    elif kind == "row_count":
        aggs = [n.alias(tag("n"))]
        num, den = F.col(tag("n")), F.lit(1).cast("long")
        passed = (num >= F.lit(c["lo"])) & (num <= F.lit(c["hi"]))
    else:
        raise ValueError(f"unknown check kind: {kind!r}")
    row = F.struct(
        F.lit(kind).alias("check"),
        F.lit(col).alias("col"),
        num.cast("long").alias("metric_num"),
        den.cast("long").alias("metric_den"),
        passed.alias("passed"),
    )
    return aggs, row


def dq_check(df: DataFrame, checks: list[dict]) -> DataFrame:
    """Evaluate every constraint in one scan; returns the report
    relation ``(check, col, metric_num, metric_den, passed)`` with one
    row per constraint, in the order given."""
    if not checks:
        raise ValueError("no constraints given")
    aggs: list[Column] = []
    rows: list[Column] = []
    for i, c in enumerate(checks):
        a, r = _agg_and_verdict(c, i)
        aggs.extend(a)
        rows.append(r)
    one = df.groupBy().agg(*aggs)
    return one.select(F.explode(F.array(*rows)).alias("r")).select("r.*")

"""Relation profiling: exact per-column statistics in ONE pass.

No reference analog (the reference never inspects its payloads);
engine surface — this is ``ANALYZE TABLE`` as an operator: the
(row count, null count, distinct count, min, max, mean width) vector
per column that a cost-based optimizer consumes for broadcast/join
decisions, that ingest monitoring alerts on (null-rate spikes, NDV
collapse), and that schema-drift checks diff between snapshots.

Spark-first shape: one ``stack``-based unpivot (narrow Expand, no
shuffle) lowers every profiled column to ``(col, value-as-string,
is_null)`` rows, then ONE map-side-combined groupBy computes all
statistics for all columns together — a single scan of the relation
regardless of column count, vs the naive per-column loop that scans N
times.  Values compare lexicographically after the string cast (the
portable choice — both engines order UTF-8 strings bytewise); numeric
min/max profiling per type belongs to the caller if it needs it.

Exactness: every statistic is an exact integer or an exact string —
``n_distinct`` is a true COUNT DISTINCT (one extra shuffle), not an
HLL estimate, so the output hash-checks cross-engine.  At 100 TB the
swap to ``approx_count_distinct`` is one line and documented here;
the exact form is the oracle-checkable default.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from vector_db_handler_spark.functions.text import portable_hash60, quote_ident


def profile_relation(df: DataFrame, cols: list[str]) -> DataFrame:
    """Exact profile of ``cols`` → one row per column:
    ``(col_name, n_rows, n_null, n_distinct, min_value, max_value,
    sum_len)``.  NULLs are excluded from distinct/min/max/len (SQL
    aggregate convention); ``sum_len`` is the total string-cast width
    (mean width = sum_len / (n_rows - n_null), left to the reader so
    every emitted stat stays an exact integer).  Callers should
    profile string/integer columns — float-to-string formatting is
    engine-specific, so floats belong in a typed numeric profile, not
    this portable one."""
    pairs = ", ".join(
        "'{}', CAST({} AS STRING)".format(c.replace("'", "''"), quote_ident(c))
        for c in cols
    )
    long = df.select(
        F.expr(f"stack({len(cols)}, {pairs}) AS (col, val)")
    )
    return (
        long.groupBy("col")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum(F.col("val").isNull().cast("long")).alias("n_null"),
            F.countDistinct("val").alias("n_distinct"),
            F.min("val").alias("min_value"),
            F.max("val").alias("max_value"),
            F.sum(F.coalesce(F.length("val"), F.lit(0)).cast("long")).alias(
                "sum_len"
            ),
        )
        .withColumnRenamed("col", "col_name")
    )


def join_size_estimate(
    a: DataFrame,
    b: DataFrame,
    key_a: str,
    key_b: str,
    rate_denom: int = 64,
) -> DataFrame:
    """Join-cardinality estimation by COORDINATED key-domain sampling —
    the optimizer-statistics primitive behind join reordering: both
    sides keep exactly the rows whose JOIN KEY hashes into the bottom
    ``1/rate_denom`` of the 60-bit hash space (same portable hash both
    sides, so the SAME keys survive on both sides), the sample join
    runs at ~1/rate_denom² the work of the real join, and

        |A ⋈ B|  ≈  rate_denom · |A' ⋈ B'|

    is unbiased: each key group survives with probability 1/d and
    contributes its FULL n_a·n_b pair count when it does — the
    estimator sees true per-key fan-out (the thing row-level Bernoulli
    sampling destroys: sampling rows at rate p scales each key's
    contribution by p², biasing skewed joins low).  Deterministic:
    the hash cut is a pure function of the key, so the estimate is
    reproducible across runs/engines — usable in plan tests, not just
    dashboards.  Unbiased is not low-variance: a single dominant key
    contributes all-or-nothing at 1/d probability, so production
    estimators pair this with exact heavy-hitter counts (the CMS
    monitor here) and sample only the tail.

    Scale shape: two pushed-down scan filters (the hash predicate
    prunes before any exchange), one sample-sized shuffle join, one
    1-row aggregate.  Output: ``(sample_pairs, est_pairs)``."""
    if rate_denom < 1:
        raise ValueError(f"need rate_denom >= 1, got {rate_denom}")
    cut = (1 << 60) // rate_denom
    ha = portable_hash60(F.col(key_a).cast("string"))
    hb = portable_hash60(F.col(key_b).cast("string"))
    sa = a.filter(ha < cut).select(F.col(key_a).alias("_k"))
    sb = b.filter(hb < cut).select(F.col(key_b).alias("_k"))
    return (
        sa.join(sb, "_k")
        .agg(F.count(F.lit(1)).alias("sample_pairs"))
        .select(
            "sample_pairs",
            (F.col("sample_pairs") * F.lit(rate_denom)).cast("long").alias(
                "est_pairs"
            ),
        )
    )


def functional_dependencies(
    df: DataFrame, pairs: list[tuple[str, str]]
) -> DataFrame:
    """Exact functional-dependency check over candidate column pairs —
    the schema-discovery primitive next to :func:`profile_relation`
    (TANE/FDEP-style dependency mining, restricted to a caller-chosen
    candidate list so the cost is explicit): for every ``(det, dep)``
    pair, does ``det → dep`` hold, and if not, how badly is it
    violated?

    Returns one row per pair: ``(determinant, dependent, n_groups,
    n_violating_groups, max_distinct_dep, g3_keep)`` where
    ``n_violating_groups`` counts determinant values mapping to >1
    distinct dependent value, ``max_distinct_dep`` is the worst
    group's fan-out, and ``g3_keep`` is the g3-error numerator — the
    maximum number of rows keepable while making the FD hold (Σ per
    group of the group's modal dependent count; equals row count
    exactly when the FD holds).  NULL determinants are excluded
    (standard FD semantics); a NULL dependent counts as one distinct
    value (it is information).  All exact integers.

    Scale shape: ALL pairs ride ONE scan — a ``stack`` unpivot lowers
    each pair to ``(pair_id, det, dep)`` rows (narrow Expand, no
    UDF), then three map-side-combined aggregations climb
    (pair, det, dep) → (pair, det) → pair.  No per-pair rescans, no
    windows, no collect; the final relation is |pairs| rows."""
    if not pairs:
        raise ValueError("need at least one (determinant, dependent) pair")
    entries = ", ".join(
        "'{}', '{}', CAST({} AS STRING), CAST({} AS STRING)".format(
            d.replace("'", "''"),
            p.replace("'", "''"),
            quote_ident(d),
            quote_ident(p),
        )
        for d, p in pairs
    )
    long = df.select(
        F.expr(
            f"stack({len(pairs)}, {entries}) "
            "AS (determinant, dependent, det, dep)"
        )
    ).filter(F.col("det").isNotNull())
    per_value = long.groupBy("determinant", "dependent", "det", "dep").agg(
        F.count(F.lit(1)).alias("n")
    )
    per_det = per_value.groupBy("determinant", "dependent", "det").agg(
        F.count(F.lit(1)).alias("n_dep_values"),
        F.max("n").alias("modal_n"),
    )
    return per_det.groupBy("determinant", "dependent").agg(
        F.count(F.lit(1)).alias("n_groups"),
        F.sum((F.col("n_dep_values") > 1).cast("long")).alias(
            "n_violating_groups"
        ),
        F.max("n_dep_values").cast("long").alias("max_distinct_dep"),
        F.sum("modal_n").cast("long").alias("g3_keep"),
    )


def inclusion_dependencies(
    tables: dict[str, DataFrame],
    candidates: list[tuple[str, str, str, str]],
) -> DataFrame:
    """Exact inclusion-dependency (foreign-key discovery) check over
    candidate column pairs — the cross-RELATION sibling of
    :func:`functional_dependencies` (SPIDER/BINDER-style IND mining,
    restricted to a caller-chosen candidate list so the cost is
    explicit): for every ``(child_table, child_col, parent_table,
    parent_col)``, what fraction of the child's distinct values exist
    in the parent?

    Returns one row per candidate: ``(child_table, child_col,
    parent_table, parent_col, n_child_distinct, n_contained,
    containment, holds)`` — ``holds`` iff every distinct child value
    appears in the parent (the FK property); ``containment`` is the
    partial-IND strength (rounded to 6), the signal that ranks
    almost-FKs in a schema-discovery sweep.  NULLs are excluded on
    both sides (SQL FK semantics: a NULL child never violates).
    Values compare after a string cast, the same portable convention
    as :func:`profile_relation`.

    Scale shape: per candidate, two map-side-combined DISTINCT
    censuses and ONE equi-join on the value — cost rides the distinct
    cardinality, not the row count; candidates are independent plans
    unioned into one |candidates|-row relation (AQE broadcasts the
    smaller census).  No collect, no per-pair rescan of any table
    shared across candidates beyond its census."""
    if not candidates:
        raise ValueError("need at least one candidate (child, col, parent, col)")
    legs = []
    for ct, cc, pt, pc in candidates:
        for t in (ct, pt):
            if t not in tables:
                raise ValueError(f"unknown table {t!r} in candidate")
        child = (
            tables[ct]
            .select(F.col(cc).cast("string").alias("v"))
            .filter(F.col("v").isNotNull())
            .distinct()
        )
        parent = (
            tables[pt]
            .select(F.col(pc).cast("string").alias("v"))
            .filter(F.col("v").isNotNull())
            .distinct()
            .withColumn("hit", F.lit(1))
        )
        legs.append(
            child.join(parent, "v", "left")
            .groupBy()
            .agg(
                F.count(F.lit(1)).alias("n_child_distinct"),
                F.count("hit").alias("n_contained"),
            )
            .select(
                F.lit(ct).alias("child_table"),
                F.lit(cc).alias("child_col"),
                F.lit(pt).alias("parent_table"),
                F.lit(pc).alias("parent_col"),
                F.col("n_child_distinct").cast("long"),
                F.col("n_contained").cast("long"),
                # try_divide: an EMPTY child census is a legal input
                # (containment NULL, holds vacuously true) — plain
                # division throws under ANSI mode (r11 edge sweep).
                F.round(
                    F.try_divide(
                        F.col("n_contained").cast("double"),
                        F.col("n_child_distinct"),
                    ),
                    6,
                ).alias("containment"),
                (F.col("n_contained") == F.col("n_child_distinct")).alias(
                    "holds"
                ),
            )
        )
    out = legs[0]
    for leg in legs[1:]:
        out = out.unionByName(leg)
    return out

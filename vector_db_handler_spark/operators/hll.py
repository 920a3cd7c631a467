"""HyperLogLog distinct-count sketch — deterministic and
cross-engine-exact (staged in r11 for r12 registration).

The repo's cardinality rail already has KMV (`sketches.py`, the
bottom-k estimator the driver checks as `kmv_distinct_users_by_type`)
and CMS/bloom for frequency/membership.  HLL is the sketch production
systems actually deploy for distinct counts (Redis PFCOUNT, BigQuery
APPROX_COUNT_DISTINCT, Spark's own `approx_count_distinct`) because
its state is CONSTANT (2^p 6-bit registers) and merge is a per-register
max — but Spark's built-in is not replayable across engines (its
estimate depends on a private dense/sparse encoding).  This is the
textbook Flajolet et al. AMC'07 estimator rebuilt on the repo's
portable-hash convention so a DuckDB oracle replays it bit-for-bit:

* **Hash** = the 60-bit md5 integer every banded join here uses
  (`functions/text.py portable_hash60`); bucket = low ``p`` bits
  (``h & (K-1)``), suffix ``w`` = the remaining ``60-p`` bits
  (``h >> p``) — pure bit ops, identical in any engine.
* **rho(w)** = leading-zero count of the suffix + 1, computed as
  ``(60-p) - bitlen(w) + 1`` (``bitlen`` via the binary-string length,
  the same trick `nb_classifier.ilog2_kilo` uses); ``w = 0`` maps to
  the maximum ``s = 61-p``.  Exact integers.
* **Registers** M[b] = max(rho) per (key, bucket) — ONE
  map-side-combined groupBy: duplicates of a value hash identically,
  so the max absorbs them with no distinct pass; this is also the
  merge operator (sketches of two partitions/days combine by the same
  max), pinned by the merge test.
* **The harmonic sum is EXACT**: instead of summing 2^-M in floating
  point (order-dependent), sum ``2^(s-M)`` as BIGINT — with
  ``K·2^s = 2^61`` the sum can never overflow int64 for ANY p — and
  divide once at the end: ``est_raw = alpha·K²·2^s / sum_scaled``,
  a single IEEE division of exact integers (the numerator is one
  Python-computed double literal shared with the SQL twin), so the
  estimate is bit-identical cross-engine.
* **Small-range correction** (linear counting ``K·ln(K/V)``) uses the
  fixed-point log2 surrogate (``ilog2_kilo(K·2^20 // V)``) times a
  pinned ln(2) constant — deterministic where libm's ``ln`` is not
  guaranteed to be.  ``est_used`` switches to it below the paper's
  ``2.5·K`` threshold when empty registers exist.

Scale shape (100 TB): one shuffle on (key, bucket) with map-side max
combine — state per key is K rows regardless of data volume; the
K-register grid is a ``sequence()`` explode over the per-key relation
(|keys|·K rows, data-scale invariant); the exact-distinct column in
the accuracy report is the only data-scale aggregate and exists only
because this operator's JOB is to report estimate-vs-truth (the same
convention as ``sketch_accuracy_by_lang``); a production pipeline
drops it and keeps the constant-state sketch.

No reference analog (the reference has no aggregation surface at
all); LLM-pipeline extension from the builder brief, next to the KMV
and CMS rails.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, functions as F

from vector_db_handler_spark.functions.text import portable_hash60
from vector_db_handler_spark.operators.nb_classifier import ilog2_kilo

#: ln(2) pinned to the double both engines parse identically.
LN2 = 0.6931471805599453

#: Flajolet et al. bias-correction constants for small register counts;
#: >= 128 registers use the closed form.
_ALPHA_SMALL = {16: 0.673, 32: 0.697, 64: 0.709}


def hll_alpha(k: int) -> float:
    if k in _ALPHA_SMALL:
        return _ALPHA_SMALL[k]
    if k < 16:
        raise ValueError(f"p too small: need >= 16 registers, got {k}")
    return 0.7213 / (1.0 + 1.079 / k)


def hll_registers(
    df: DataFrame,
    key_col: str,
    value_col: str,
    p: int = 6,
) -> DataFrame:
    """The mergeable sketch state: ``(key, bucket, m)`` with one row
    per NON-EMPTY register (max rho of the hash suffix).  Sketches
    merge by ``groupBy(key, bucket).agg(max(m))`` — the property the
    merge test pins."""
    if not 4 <= p <= 16:
        raise ValueError(f"p must be in [4, 16], got {p}")
    k = 1 << p
    s = 61 - p
    rows = df.filter(
        F.col(key_col).isNotNull() & F.col(value_col).isNotNull()
    ).select(
        F.col(key_col).alias("key"),
        portable_hash60(F.col(value_col).cast("string")).alias("h"),
    )
    w = F.shiftright(F.col("h"), p)
    rho = F.when(w == 0, F.lit(s)).otherwise(
        F.lit(60 - p) - F.length(F.bin(w)) + F.lit(1)
    )
    return (
        rows.select(
            "key",
            (F.col("h").bitwiseAND(F.lit(k - 1))).alias("bucket"),
            rho.cast("long").alias("rho"),
        )
        .groupBy("key", "bucket")
        .agg(F.max("rho").alias("m"))
    )


def hll_estimate_from_registers(
    regs: DataFrame,
    p: int,
    key_cols: tuple[str, ...] = ("key",),
) -> DataFrame:
    """Sparse registers ``(key..., bucket, m)`` → per-key estimates
    ``(key..., n_zero_buckets, sum_scaled, est_raw, est_lc,
    est_used)`` — the estimate arithmetic shared by
    :func:`hll_distinct_by_key` and the HyperBall graph rail
    (``graph.hyperball_neighborhood``), factored so the repo has ONE
    implementation of the exact harmonic sum / linear-counting
    switch.  ``key_cols`` generalizes the key to composites like
    (node, hop).

    Precondition: ``regs`` is sparse — one row per NON-EMPTY register
    with ``m >= 1`` and no (key, bucket) duplicates (what
    :func:`hll_registers` and any max-merge of its outputs produce);
    empty buckets are inferred as ``K - count``, never stored."""
    k = 1 << p
    s = 61 - p
    numer = hll_alpha(k) * (k * k) * float(1 << s)  # one shared literal
    kc = list(key_cols)

    # Sparse aggregation (r16, guide §2.4 — remove shuffles outright):
    # every sparse register row carries m >= 1 (rho >= 1 by
    # construction in hll_registers; max-merges preserve it), so the
    # K-bucket grid this previously materialized per key — a distinct
    # pass, a sequence() explode to |keys|·K rows, and a left join
    # back onto the sparse rows: THREE exchanges per estimate call —
    # collapses algebraically into ONE map-side-combined aggregate
    # over the sparse rows themselves:
    #   n_zero_buckets = K - count(rows)           (empty buckets)
    #   sum_scaled     = n_zero_buckets·2^s + Σ 2^(s-m)
    # (an empty bucket contributes 2^(s-0) = 2^s).  Keys cannot be
    # lost: the old grid derived its key set FROM regs, so a key with
    # zero rows never appeared either.  Bit-identical outputs — the
    # terms are the same exact BIGINTs, summed per key.
    nnz = F.count(F.lit(1))
    agg = regs.groupBy(*kc).agg(
        (F.lit(k) - nnz).cast("long").alias("n_zero_buckets"),
        (
            (F.lit(k) - nnz) * F.lit(1 << s)
            # call_function: the typed shiftleft wrapper rejects a
            # COLUMN shift amount (same pitfall ilog2_kilo documents).
            + F.sum(
                F.call_function(
                    "shiftleft",
                    F.lit(1).cast("long"),
                    (F.lit(s) - F.col("m")).cast("int"),
                )
            )
        )
        .cast("long")
        .alias("sum_scaled"),
    )
    est_raw, est_lc, est_used = hll_estimate_exprs(p)
    return agg.select(
        *kc,
        "n_zero_buckets",
        "sum_scaled",
        est_raw.alias("est_raw"),
        est_lc.alias("est_lc"),
        est_used.alias("est_used"),
    )


def hll_estimate_exprs(p: int):
    """The ``(est_raw, est_lc, est_used)`` column trio over exact
    ``n_zero_buckets`` / ``sum_scaled`` columns — factored so the
    sparse path above and the dense HyperBall register rail
    (``graph.hyperball_neighborhood``) share ONE implementation of
    the estimate arithmetic (bit-identical cross-engine by
    construction: fixed-order double math over exact integers)."""
    k = 1 << p
    s = 61 - p
    numer = hll_alpha(k) * (k * k) * float(1 << s)  # one shared literal
    est_raw = F.round(F.lit(numer) / F.col("sum_scaled"), 6)
    v = F.col("n_zero_buckets")
    # ln(K/V) via the fixed-point log2 surrogate: exact integer
    # ilog2_kilo(K·2^20 // V), then (bits/1024 − 20)·ln2 — fixed-order
    # double math, deterministic cross-engine.
    lc_bits = ilog2_kilo(F.floor(F.lit(k * (1 << 20)) / v).cast("long"))
    est_lc = F.round(
        (lc_bits.cast("double") / F.lit(1024.0) - F.lit(20.0))
        * F.lit(LN2)
        * F.lit(float(k)),
        6,
    )
    est_lc = F.when(v > 0, est_lc)
    est_used = (
        F.when((est_raw <= F.lit(2.5 * k)) & (v > 0), est_lc).otherwise(est_raw)
    )
    return est_raw, est_lc, est_used


def hll_distinct_by_key(
    df: DataFrame,
    key_col: str,
    value_col: str,
    p: int = 6,
    with_exact: bool = True,
) -> DataFrame:
    """Per-key HLL distinct estimate, exact-arithmetic inside:
    ``(key, n_exact, n_zero_buckets, sum_scaled, est_raw, est_lc,
    est_used)``.  ``sum_scaled = Σ 2^(s-M)`` over ALL K registers
    (empty ⇒ M=0 ⇒ 2^s) is an exact BIGINT; the two estimate columns
    are single fixed-order IEEE expressions over exact integers,
    rounded to 6.  ``with_exact=False`` drops the truth column (and
    its data-scale distinct aggregate) for the production path."""
    regs = hll_registers(df, key_col, value_col, p)
    out = hll_estimate_from_registers(regs, p, ("key",))
    if with_exact:
        exact = (
            df.filter(F.col(key_col).isNotNull() & F.col(value_col).isNotNull())
            .groupBy(F.col(key_col).alias("key"))
            .agg(F.count_distinct(F.col(value_col)).alias("n_exact"))
        )
        out = out.join(exact, "key").select(
            "key",
            "n_exact",
            "n_zero_buckets",
            "sum_scaled",
            "est_raw",
            "est_lc",
            "est_used",
        )
    return out

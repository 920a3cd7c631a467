"""Sketch-based approximate operators for 100 TB-scale profiling.

At full scale, exact DISTINCT/percentile over an unindexed column is a
full shuffle of every distinct value; sketches bound both memory and
shuffle to kilobytes per partition with a quantified error:

* ``approx_distinct_by`` — HyperLogLog++ (`approx_count_distinct`):
  map-side-combined sketch merge, ~1.5 KB of state per group for the
  default 5% relative error.
* ``value_quantiles`` — KLL/Greenwald-Khanna (`percentile_approx`):
  mergeable quantile summaries; exact rank error bounded by
  1/accuracy.
* ``dedup_bloom_prefilter`` — a driver-built Bloom filter over known
  content hashes, pushed into the scan as a cheap pre-filter before an
  expensive exact anti-join (the standard "have we seen this doc
  before" guard in incremental ingest; false positives fall through to
  the exact join, false negatives are impossible).

Approximate answers can't hash-match a DuckDB oracle, so these are
pytest-verified against exact results with error-bound assertions
(``tests/test_sketches.py``) rather than registered as driver queries.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def approx_distinct_by(
    df: DataFrame, group_col: str, value_col: str, rsd: float = 0.05
) -> DataFrame:
    """Per-group approximate distinct count (HLL++, relative standard
    deviation ``rsd``)."""
    return df.groupBy(group_col).agg(
        F.approx_count_distinct(value_col, rsd=rsd).alias("approx_distinct"),
    )


def value_quantiles(
    df: DataFrame,
    value_col: str,
    probabilities: list[float] = (0.5, 0.95, 0.99),
    accuracy: int = 10_000,
) -> DataFrame:
    """Approximate quantiles of a numeric column (mergeable summaries;
    rank error ≤ 1/accuracy)."""
    return df.agg(
        F.percentile_approx(
            value_col, F.array(*[F.lit(float(p)) for p in probabilities]), accuracy
        ).alias("quantiles")
    )


def dedup_bloom_prefilter(
    new_docs: DataFrame,
    seen_hashes: DataFrame,
    hash_col: str = "text_hash",
    fpp: float = 0.01,
) -> DataFrame:
    """Rows of ``new_docs`` whose hash is definitely-unseen OR a bloom
    false positive — the cheap pre-filter before the exact anti-join.

    The filter is built ONCE from ``seen_hashes`` (~1.2 MB per 10⁶
    keys at 1% fpp) and broadcast to executors; typical
    incremental-ingest batches are mostly novel, so the exact
    anti-join afterwards touches only the ~fpp fraction that collides.
    Callers still run the exact join on the survivors — this operator
    never drops a truly-novel row (no false negatives by construction).

    The sketch itself is numpy (PySpark exposes no bloomFilter
    builder): double hashing ``h1 + i·h2 mod m`` over splitmix64-mixed
    keys, membership checked per Arrow batch.  The build collects the
    KEYS to the driver — fine for the dedup-ledger sizes a bloom guard
    targets; beyond that, build per-partition bitmaps with
    ``mapPartitions`` and OR-merge them (same math, one treeReduce).
    """
    import math

    import numpy as np

    keys = np.array(
        [r[0] for r in seen_hashes.select(hash_col).collect()], dtype=np.uint64
    )
    if keys.size == 0:
        return new_docs
    n = int(keys.size)
    m = max(64, int(-n * math.log(fpp) / (math.log(2) ** 2)))
    k = max(1, round(m / n * math.log(2)))

    def _mix(x: "np.ndarray") -> tuple["np.ndarray", "np.ndarray"]:
        # splitmix64 finalizer twice with different constants — two
        # independent 64-bit hash streams for double hashing.
        def fin(v, c1, c2):
            v = (v ^ (v >> np.uint64(30))) * np.uint64(c1)
            v = (v ^ (v >> np.uint64(27))) * np.uint64(c2)
            return v ^ (v >> np.uint64(31))

        return (
            fin(x.copy(), 0xBF58476D1CE4E5B9, 0x94D049BB133111EB),
            fin(x + np.uint64(0x9E3779B97F4A7C15), 0xFF51AFD7ED558CCD, 0xC4CEB9FE1A85EC53),
        )

    bits = np.zeros((m + 63) // 64, dtype=np.uint64)
    h1, h2 = _mix(keys)
    for i in range(k):
        idx = (h1 + np.uint64(i) * h2) % np.uint64(m)
        np.bitwise_or.at(bits, (idx >> np.uint64(6)).astype(np.int64),
                         np.uint64(1) << (idx & np.uint64(63)))

    bc = new_docs.sparkSession.sparkContext.broadcast((bits, m, k))

    from pyspark.sql.functions import pandas_udf

    @pandas_udf("boolean")
    def maybe_seen(col):
        import pandas as _pd

        bits_l, m_l, k_l = bc.value
        x = col.to_numpy(dtype=np.int64).astype(np.uint64)
        a1, a2 = _mix(x)
        hit = np.ones(len(x), dtype=bool)
        for i in range(k_l):
            idx = (a1 + np.uint64(i) * a2) % np.uint64(m_l)
            word = bits_l[(idx >> np.uint64(6)).astype(np.int64)]
            hit &= (word >> (idx & np.uint64(63))) & np.uint64(1) > 0
        return _pd.Series(hit)

    return new_docs.filter(~maybe_seen(F.col(hash_col)))

"""Deterministic sampling operators for training-data pipelines.

Not present in the reference (no sampling surface at all); mandated
by the extension brief — corpus curation at 100 TB starts with "take
p% of each language / k docs per source", and it must be REPRODUCIBLE
across runs, engines, and retries.

Every operator here samples by a portable md5-derived hash of the row
key, never by ``rand()``:

* the sample is a pure function of (key, salt) — re-running a failed
  stage, changing partitioning, or replaying on another engine
  selects the SAME rows (Spark's ``df.sample`` guarantees none of
  this: its Bernoulli draw is seeded per-partition, so a repartition
  reshuffles the sample);
* the salt gives independent samples from the same corpus (train /
  holdout splits that provably don't overlap: disjoint hash ranges,
  one scan);
* it's exactly replayable in SQL, so the DuckDB oracles check the
  operators row-for-row.

Scale shape: ``hash_sample`` / ``stratified_sample`` are stateless
row filters — they fuse into the scan (no shuffle, no state, trivially
parallel at any corpus size).  ``per_group_sample_k`` is one window
over the group key (single shuffle); group cardinality is the usual
lang/source kind of key, far below skew territory.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from vector_db_handler_spark.functions.text import portable_hash60, quote_ident

#: Hash-range denominator: rates are expressed in basis points out of
#: 10_000, so fractions down to 0.01% are exact and the SQL twin is
#: integer arithmetic (no float threshold to disagree on).
SAMPLE_BUCKETS = 10_000


def sample_bucket(key: Column, salt: str = "smp") -> Column:
    """Stable bucket in [0, SAMPLE_BUCKETS) from the row key: the
    low 60 bits of md5(salt|key) mod 10_000.  Uniform because md5 is;
    portable because both engines compute the identical integer."""
    return portable_hash60(F.concat(F.lit(salt + "|"), key.cast("string"))) % SAMPLE_BUCKETS


def hash_sample(
    df: DataFrame,
    frac: float,
    key_col: str,
    salt: str = "smp",
) -> DataFrame:
    """Keep a deterministic ``frac`` of rows by key hash.

    A retry, a different partitioning, or a different engine keeps
    exactly the same rows.  Plans as a scan-fused filter — zero
    shuffle at any scale."""
    cut = int(round(frac * SAMPLE_BUCKETS))
    return df.filter(sample_bucket(F.col(key_col), salt) < cut)


def stratified_sample(
    df: DataFrame,
    rates: dict[str, float],
    strata_col: str,
    key_col: str,
    default_frac: float = 0.0,
    salt: str = "smp",
) -> DataFrame:
    """Per-stratum hash sampling: stratum → keep-fraction.

    The rate lookup is a broadcast-free CASE over the (small) rates
    dict, so this stays a stateless scan-fused filter like
    ``hash_sample`` — the idiom for "20% of English, 5% of the rest"
    corpus mixes."""
    cut = F.lit(int(round(default_frac * SAMPLE_BUCKETS)))
    for stratum, frac in sorted(rates.items()):
        cut = F.when(
            F.col(strata_col) == stratum, int(round(frac * SAMPLE_BUCKETS))
        ).otherwise(cut)
    return df.filter(sample_bucket(F.col(key_col), salt) < cut)


def temperature_weights(
    df: DataFrame,
    strata_col: str,
    temperature: float = 2.0,
) -> DataFrame:
    """Per-stratum document sampling weights for temperature-rebalanced
    corpus mixing (the UniMax / multilingual-LM recipe: language l with
    n_l docs is sampled with probability ∝ n_l^(1/T), flattening the
    head languages without starving the tail).

    Emits ``(stratum, n_docs, doc_weight)`` where ``doc_weight`` is the
    PER-DOCUMENT acceptance weight, normalized so the rarest stratum's
    docs get weight 1.0: ``doc_weight_l = (n_min / n_l)^(1 - 1/T)``.
    Sampling each doc with this weight yields per-stratum expected mass
    ∝ n_l^(1/T) — exactly the temperature-T distribution.  T=1 keeps
    the natural distribution (all weights 1); T→∞ equalizes strata.

    Cross-engine determinism: ``n_min / n_l`` is one correctly-rounded
    IEEE division of two exact integers and ``pow`` is applied to the
    same double in both engines, so the DuckDB oracle hash-matches
    without tolerance.  Scale shape: one map-side-combined count per
    stratum; the window that finds n_min runs over the stratum-count
    RESULT (|languages| rows, small by construction), not the corpus.
    Feed the output to ``stratified_sample``/``hash_sample`` rates for
    the actual row filter — that stays a scan-fused stateless filter.

    IEEE guarantees correct rounding for divide and sqrt but NOT for
    pow, so only T=2 (exponent 1/2 → ``sqrt``) is promised bit-exact
    across engines; other temperatures use ``pow`` and may differ in
    the last ulp (pin those with a tolerance, not a hash)."""
    exponent = 1.0 - 1.0 / temperature
    counts = df.groupBy(strata_col).agg(F.count(F.lit(1)).alias("n_docs"))
    w = Window.partitionBy()
    ratio = F.min("n_docs").over(w).cast("double") / F.col("n_docs").cast("double")
    weight = F.sqrt(ratio) if exponent == 0.5 else F.pow(ratio, F.lit(exponent))
    return counts.select(
        F.col(strata_col),
        F.col("n_docs"),
        F.round(weight, 6).alias("doc_weight"),
    )


def per_group_sample_k(
    df: DataFrame,
    k: int,
    group_col: str,
    key_col: str,
    salt: str = "smp",
) -> DataFrame:
    """Exactly min(k, |group|) rows per group, chosen uniformly and
    deterministically: rank rows inside each group by key hash and
    keep the first k.  The fixed-size-per-source twin of
    ``stratified_sample`` (which keeps a fraction).  One shuffle on
    the group key; the hash tie-breaks on the key itself so ranking
    is total even under hash collisions."""
    w = Window.partitionBy(group_col).orderBy(
        sample_bucket(F.col(key_col), salt).asc(), F.col(key_col).asc()
    )
    return (
        df.withColumn("_rnk", F.row_number().over(w))
        .filter(F.col("_rnk") <= k)
        .drop("_rnk")
    )


def resample_epoch(
    df: DataFrame,
    rate_bp_col: str,
    key_col: str,
    salt: str = "epoch",
    copy_col: str = "copy_idx",
) -> DataFrame:
    """Materialize one training epoch at per-row sampling RATES THAT
    MAY EXCEED 1 — the upsampling half of corpus mixing that
    ``hash_sample``/``stratified_sample`` (keep-fractions < 1) cannot
    express.  ``rate_bp_col`` holds the rate in integer basis points
    (10_000 = 1.0×): every row is emitted ``rate_bp div 10_000`` times,
    plus once more iff its stable hash bucket falls below
    ``rate_bp mod 10_000`` — so a source at 2.37× emits each doc 2
    times and a deterministic 37% of docs a 3rd time, and the realized
    per-source mass converges on the target rate with zero randomness:
    retries, repartitions, and the SQL oracle materialize the SAME
    epoch (this determinism is also what makes per-epoch salts
    meaningful — salt="epoch3" re-rolls WHICH docs carry the
    fractional copy, while keeping epoch 3 itself reproducible).

    Plans as scan → broadcast-joined rate (caller's join) → one
    ``explode(sequence(...))`` projection: no shuffle, output rows ∝
    emitted mass.  This is the DoReMi/UniMax-style epoch plan a 100 TB
    mixing pipeline executes after deciding weights
    (``temperature_weights``)."""
    # `div` (exact integer division), not `/`+cast — float quotients of
    # basis points truncate correctly today but the exactness contract
    # should not ride on double rounding behavior.
    reps = F.expr(
        f"CAST({quote_ident(rate_bp_col)} AS BIGINT) div {SAMPLE_BUCKETS}"
    )
    gate = (
        sample_bucket(F.col(key_col), salt) < F.col(rate_bp_col) % SAMPLE_BUCKETS
    ).cast("long")
    n_copies = (reps + gate).alias("_n_copies")
    return (
        df.withColumn("_n_copies", n_copies)
        .filter(F.col("_n_copies") >= 1)
        .withColumn(
            copy_col,
            F.explode(F.sequence(F.lit(1).cast("long"), F.col("_n_copies"))),
        )
        .drop("_n_copies")
    )


def weighted_systematic_sample(
    df: DataFrame,
    weight_col: str,
    k: int,
    order_cols: list[str],
    num_partitions: int | None = None,
) -> DataFrame:
    """Exact weighted sampling by SYSTEMATIC selection (Madow '49):
    lay every row's integer weight end-to-end along the deterministic
    total order ``order_cols`` (pass a content-hash column for an
    unbiased deterministic permutation), then take the k evenly-spaced
    points ``j·W/k``; a row is selected once per point falling inside
    its weight interval.  Inclusion expectation is exactly ``k·w/W``
    with zero variance beyond the interleave — and, unlike A-ES /
    exponential-keys weighted reservoirs, there is NO ``u^(1/w)``
    transcendental to diverge between engines: the whole decision is

        n_hits(row) = (cum_hi·k) div W − (cum_lo·k) div W

    in BIGINT arithmetic (caller must keep ``W·k < 2^63``; asserted).

    The cumulative sum is distributed the same way as
    ``features.global_rank``: range-repartition on the order key,
    per-partition weight census to the driver (numPartitions rows),
    prefix offsets re-broadcast as a join relation, within-partition
    cumsum window — no single-partition stage anywhere.  Rows with
    ``w ≥ W/k`` can be hit multiple times (heavy docs legitimately
    repeat in a weighted epoch); ``n_hits`` reports it.  Returns the
    selected rows with ``(cum_lo, n_hits)`` appended."""
    if k < 1:
        raise ValueError(f"need k >= 1, got {k}")
    cols = [F.col(c).asc_nulls_last() for c in order_cols]
    parts = num_partitions or df.sparkSession.conf.get(
        "spark.sql.shuffle.partitions"
    )
    bad_w = F.col(weight_col).isNull() | (F.col(weight_col) < 0)
    null_guard = None
    for c in order_cols:
        cond = F.col(c).isNull()
        null_guard = cond if null_guard is None else (null_guard | cond)
    ranged = (
        df.repartitionByRange(int(parts), *cols)
        .withColumn("_pid", F.spark_partition_id())
        .localCheckpoint(eager=True)
    )
    census = ranged.groupBy("_pid").agg(
        F.sum(F.col(weight_col).cast("long")).alias("ws"),
        F.sum(bad_w.cast("long")).alias("n_bad_w"),
        F.sum(F.when(null_guard, 1).otherwise(0)).alias("n_null_keys"),
    ).collect()
    if sum(r.n_bad_w or 0 for r in census):
        raise ValueError("weighted_systematic_sample: null/negative weights")
    if sum(r.n_null_keys or 0 for r in census):
        raise ValueError("weighted_systematic_sample: NULL order keys")
    sums = {r._pid: (r.ws or 0) for r in census}
    total_w = sum(sums.values())
    if total_w <= 0:
        raise ValueError("weighted_systematic_sample: total weight is 0")
    if total_w * k >= 2**63:
        raise ValueError("weighted_systematic_sample: W*k overflows int64")
    offsets, acc = [], 0
    for pid in sorted(sums):
        offsets.append((pid, acc))
        acc += sums[pid]
    off_df = df.sparkSession.createDataFrame(offsets, "_pid INT, _woff BIGINT")
    w = Window.partitionBy("_pid").orderBy(*cols).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    cum = (
        ranged.withColumn("_cum", F.sum(F.col(weight_col).cast("long")).over(w))
        .join(F.broadcast(off_df), "_pid")
        .withColumn("cum_lo", (F.col("_cum") + F.col("_woff") - F.col(weight_col)).cast("long"))
    )
    hits = F.expr(
        f"((cum_lo + {weight_col}) * {int(k)}) div {total_w} "
        f"- (cum_lo * {int(k)}) div {total_w}"
    )
    return (
        cum.withColumn("n_hits", hits.cast("long"))
        .filter(F.col("n_hits") > 0)
        .drop("_pid", "_woff", "_cum")
    )


def allocate_stratified_exact(
    df: DataFrame,
    total_n: int,
    strata_col: str,
    key_col: str,
    salt: str = "alloc",
) -> DataFrame:
    """EXACT-COUNT stratified sampling: apportion ``total_n`` rows
    across strata proportionally by the largest-remainder (Hamilton)
    method — the apportionment census bureaus use, in exact integer
    arithmetic — then keep each stratum's quota deterministically by
    smallest (hash, key) rank.  This is the "give me exactly 1M
    training docs, language-balanced like the corpus" op that
    rate-based :func:`stratified_sample` cannot express (a rate
    sample's size is binomial; a budgeted training mix needs the
    count exact and the selection reproducible).

    Allocation: ``base_s = total_n·c_s div C``; the ``total_n − Σ
    base_s`` leftovers go to the strata with the largest remainders
    ``total_n·c_s mod C`` (ties → stratum ascending — pinned).
    Quotas are capped at the stratum size, so when ``total_n ≥ C``
    every row comes back; a binding cap leaves the total short by
    construction (documented, not silently rebalanced).

    Returns the sampled rows (all input columns).  Scale shape: one
    map-side-combined stratum census (|strata| rows, driver-free
    broadcast back), then ONE window over the stratum key for the
    rank pick.  A pathologically hot stratum makes that window the
    cost — the production dial is pre-filtering with a hash
    threshold just above the quota rate and exact-trimming the
    survivors, which keeps the window input ~quota-sized."""
    if total_n < 0:
        raise ValueError(f"total_n must be >= 0, got {total_n}")
    from pyspark.sql import Window

    base = df.filter(F.col(strata_col).isNotNull())
    counts = base.groupBy(F.col(strata_col).alias("_s")).agg(
        F.count(F.lit(1)).alias("_c")
    )
    tot = counts.groupBy().agg(F.sum("_c").alias("_tot"))
    alloc = (
        counts.crossJoin(F.broadcast(tot))
        .withColumn(
            "_base", F.expr(f"CAST({int(total_n)} * _c AS BIGINT) div _tot")
        )
        .withColumn(
            "_rem", F.expr(f"CAST({int(total_n)} * _c AS BIGINT) % _tot")
        )
    )
    wlead = Window.orderBy(F.col("_rem").desc(), F.col("_s").asc())
    leftover = F.lit(int(total_n)) - F.sum("_base").over(
        Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    quotas = alloc.select(
        "_s",
        "_c",
        F.least(
            F.col("_c"),
            F.col("_base")
            + F.when(F.row_number().over(wlead) <= leftover, 1).otherwise(0),
        ).alias("_quota"),
    )
    wpick = Window.partitionBy(strata_col).orderBy(
        sample_bucket(F.col(key_col), salt).asc(), F.col(key_col).asc()
    )
    return (
        base.withColumn("_rk", F.row_number().over(wpick))
        .join(
            F.broadcast(quotas.select(F.col("_s").alias(strata_col), "_quota")),
            strata_col,
        )
        .filter(F.col("_rk") <= F.col("_quota"))
        .drop("_rk", "_quota")
    )

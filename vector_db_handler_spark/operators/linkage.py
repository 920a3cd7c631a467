"""Entity resolution: blocked fuzzy matching over string keys.

The record-linkage rail of the curation surface (no analog in the
reference; extension territory): catalogs, author lists, and crawl
metadata arrive with typos and format drift, and the join that
reconciles them cannot be an equi-join.  The standard shape
(Fellegi-Sunter era blocking + bounded edit distance) is:

1. **Block**: a cheap deterministic key (here: the first token;
   soundex / sorted-ngram keys drop in the same way) partitions
   candidates so the quadratic comparison never crosses blocks —
   the same role LSH bands play for set similarity.  The pair space
   collapses from N² to Σ|block|².
2. **Length guard**: ``|len(a) - len(b)| <= d`` lower-bounds edit
   distance and is a plain column predicate, so it prunes pairs
   BEFORE any DP matrix is touched.
3. **Bounded Levenshtein**: Spark's ``levenshtein(l, r, threshold)``
   runs the BANDED dynamic program — O(d·n) per pair instead of
   O(n²) — returning -1 above the bound; within the bound it equals
   the exact distance, so results are engine-portable.

Scale shape: one shuffle on the block key (both sides of the
self-join share it); skewed blocks are the knob to watch — the
``max_block`` guard drops blocks above a census bound loudly, the
same stop-key pattern as the LSH/winnowing hot-bucket guards (a
block key like an empty first token would otherwise go quadratic).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def blocked_levenshtein_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    max_dist: int = 3,
    block: Column | None = None,
    max_block: int | None = None,
) -> DataFrame:
    """All pairs (id1 < id2) whose ``text_col`` values are within
    ``max_dist`` edits, compared only inside equal ``block`` keys
    (default: the first whitespace token).  Returns
    ``(id1, id2, name1, name2, dist)``.

    ``max_block``: if set, blocks holding more candidates are dropped
    (guard against degenerate keys); dropped block keys are the
    caller-auditable census ``block_census`` would show."""
    blk = block if block is not None else F.split(F.col(text_col), " ").getItem(0)
    base = df.select(
        F.col(id_col).alias("_id"), F.col(text_col).alias("_name"), blk.alias("_blk")
    ).filter(F.col("_name").isNotNull())
    if max_block is not None:
        census = base.groupBy("_blk").agg(F.count(F.lit(1)).alias("_bn"))
        base = base.join(
            F.broadcast(census.filter(F.col("_bn") <= max_block)).select("_blk"),
            "_blk",
        )
    a = base.select(
        F.col("_blk"), F.col("_id").alias("id1"), F.col("_name").alias("name1")
    )
    b = base.select(
        F.col("_blk"), F.col("_id").alias("id2"), F.col("_name").alias("name2")
    )
    d = F.levenshtein(F.col("name1"), F.col("name2"), max_dist)
    return (
        a.join(b, "_blk")
        .filter(F.col("id1") < F.col("id2"))
        .filter(
            F.abs(F.length("name1") - F.length("name2")) <= max_dist
        )
        .withColumn("dist", d)
        .filter(F.col("dist") >= 0)
        .select("id1", "id2", "name1", "name2", F.col("dist").cast("long").alias("dist"))
    )


def golden_records(
    df: DataFrame,
    pairs: DataFrame,
    id_col: str,
    text_col: str,
    src: str = "id1",
    dst: str = "id2",
) -> DataFrame:
    """Entity consolidation — the second half of record linkage: the
    match pairs become entity CLUSTERS (star-contraction components,
    any diameter: chains of pairwise matches are exactly how name
    variants link), and each cluster elects one GOLDEN record by a
    deterministic survivorship rule (longest value, then smallest id
    — the "most complete wins" default; richer rules drop into the
    same window).  Returns one row per multi-member entity:
    ``(cluster, n_members, golden_id, golden_name)``.

    Scale shape: components run on the MATCH PAIRS (bounded by the
    blocked comparison upstream, never corpus²); the survivorship
    window partitions by cluster — group size = entity size, bounded
    by the match graph, not the relation."""
    from pyspark.sql import Window

    from vector_db_handler_spark.operators.graph import connected_components_star

    comp = connected_components_star(pairs, src=src, dst=dst)
    members = comp.join(
        df.select(F.col(id_col).alias("node"), F.col(text_col).alias("_name")),
        "node",
    )
    w = Window.partitionBy("component").orderBy(
        F.length("_name").desc(), F.col("node").asc()
    )
    ranked = members.withColumn("_rn", F.row_number().over(w))
    sizes = members.groupBy("component").agg(F.count(F.lit(1)).alias("n_members"))
    return (
        ranked.filter(F.col("_rn") == 1)
        .join(sizes, "component")
        .select(
            F.col("component").alias("cluster"),
            "n_members",
            F.col("node").alias("golden_id"),
            F.col("_name").alias("golden_name"),
        )
    )

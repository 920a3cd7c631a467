#!/usr/bin/env python
"""Scale probe r7c: the continuation session's heavy operators —
triangle counting (wedge volume under degree orientation, with and
without a planted celebrity hub) and DBSCAN (census + core-core
components + border attach over a synthetic ε-pair relation).
Evidence for PERF.md; run manually, not part of the driver contract."""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from vector_db_handler_spark.operators.clustering import dbscan_labels
from vector_db_handler_spark.operators.graph import triangle_count
from vector_db_handler_spark.session import get_spark


def synth_edges(spark, n_nodes: int, avg_deg: int, hub: bool):
    """Deterministic pseudo-random sparse graph: avg_deg edges per
    node via integer hashing; optionally one hub wired to every
    100th node (the celebrity case degree orientation must survive)."""
    e = (
        spark.range(n_nodes * avg_deg)
        .select(
            (F.col("id") % n_nodes).alias("u"),
            (F.xxhash64(F.col("id")) % n_nodes).alias("v"),
        )
        .select("u", F.abs(F.col("v")).alias("v"))
        .filter(F.col("u") != F.col("v"))
    )
    if hub:
        hub_edges = spark.range(0, n_nodes, 100).select(
            F.lit(0).cast("long").alias("u"), F.col("id").alias("v")
        )
        e = e.unionByName(hub_edges)
    return e


def synth_pairs(spark, n_points: int):
    """ε-pair relation shaped like a near-dup corpus: chains of 10
    (9 pairs per 10 points) plus sparse cross links."""
    chain = (
        spark.range(n_points)
        .filter((F.col("id") % 10) != 9)
        .select(F.col("id").alias("id1"), (F.col("id") + 1).alias("id2"))
    )
    cross = (
        spark.range(0, n_points, 50)
        .select(
            F.col("id").alias("id1"),
            (F.abs(F.xxhash64("id")) % n_points).alias("id2"),
        )
        .filter(F.col("id1") != F.col("id2"))
    )
    return chain.unionByName(cross)


def main() -> None:
    spark = get_spark("scale-probe-r7c")
    spark.sparkContext.setLogLevel("ERROR")

    print("== triangle_count ==")
    for factor in (1, 4, 16):
        n = 50_000 * factor
        for hub in (False, True):
            edges = synth_edges(spark, n, avg_deg=4, hub=hub)
            t0 = time.time()
            out = triangle_count(edges, "u", "v")
            rows = out.count()
            wall = time.time() - t0
            print(
                f"nodes={n:>9,} hub={hub!s:5} -> {rows:>8,} tri-nodes  "
                f"{wall:6.1f}s"
            )

    print("== dbscan_labels ==")
    for factor in (1, 4, 16):
        n = 100_000 * factor
        pairs = synth_pairs(spark, n)
        nodes = spark.range(n).select(F.col("id").alias("vec_id"))
        t0 = time.time()
        out = dbscan_labels(pairs, nodes, node_col="vec_id", min_pts=3)
        census = {r.role: r.c for r in out.groupBy("role").agg(
            F.count(F.lit(1)).alias("c")).collect()}
        wall = time.time() - t0
        print(f"points={n:>9,} -> {census}  {wall:6.1f}s")




def probe_kcore_bfs() -> None:
    spark = get_spark("scale-probe-r7d")
    spark.sparkContext.setLogLevel("ERROR")
    from vector_db_handler_spark.operators.graph import bfs_hops, kcore_nodes

    print("== kcore_nodes (k=3) ==")
    for factor in (1, 4, 16):
        n = 50_000 * factor
        edges = synth_edges(spark, n, avg_deg=4, hub=False)
        t0 = time.time()
        rows = kcore_nodes(edges, k=3).count()
        print(f"nodes={n:>9,} -> {rows:>9,} core nodes  {time.time() - t0:6.1f}s")

    print("== bfs_hops (3 hops, 1% seeds) ==")
    for factor in (1, 4, 16):
        n = 50_000 * factor
        edges = synth_edges(spark, n, avg_deg=4, hub=False)
        seeds = spark.range(0, n, 100).select(F.col("id").alias("node"))
        t0 = time.time()
        rows = bfs_hops(edges, seeds, max_hops=3).count()
        print(f"nodes={n:>9,} -> {rows:>9,} reached    {time.time() - t0:6.1f}s")


if __name__ == "__main__":
    import sys

    if len(sys.argv) > 1 and sys.argv[1] == "kcore":
        probe_kcore_bfs()
    else:
        main()

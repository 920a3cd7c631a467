"""Distributed k-means (Lloyd) over int8-quantized embeddings, with
EXACT integer arithmetic so every iteration hash-matches a SQL oracle.

Why quantized: float k-means can't be oracle-checked bit-for-bit (sum
order changes low bits and argmin flips on them).  On the int8 grid
every distance is an exact integer ≤ 64·254² ≈ 4.1e6, centroid
updates round back onto the grid deterministically, and the argmin is
identical in any engine — the whole iterative algorithm becomes
hash-checkable.  (Production pipelines run the same shape in float32
and accept non-determinism; the grid version is also what an IVF
coarse quantizer actually trains on.)

Scale shape per iteration (the canonical Lloyd-on-Spark layout):

* centroids are K×dim integers — driver-held and broadcast into the
  assignment kernel (small-side BY CONSTRUCTION: 8×64 int64 = 4 KB);
* assignment is ONE Arrow-batched numpy pass (vectorized (x−c)²
  argmin, no Python per row);
* the update is ONE map-side-combined groupBy over exploded
  (cluster, pos, val) rows — a single shuffle of n·dim skinny rows.

Rounding rule (engine-portable): c = ((S + 127·n)·2 + n) div (2·n)
− 127 — round-half-up computed with a NON-NEGATIVE numerator, because
truncating division (Spark ``div``, DuckDB ``//``) equals floor only
for non-negative operands.  Empty clusters keep their previous
centroid (possible from iteration 2 on; iteration 1 can't empty a
cluster because each seed is a member of its own cluster at distance
0, ties broken toward the smaller cluster id).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from vector_db_handler_spark.operators.quantize import quantize_int8


def _assign(q: DataFrame, cents: list[list[int]], qvec_col: str, id_col: str) -> DataFrame:
    """(id, cluster) via exact integer argmin; ties → smallest cluster
    id (numpy argmin returns the first minimum)."""
    k = len(cents)
    flat = [int(v) for c in cents for v in c]
    dim = len(cents[0])
    id_type = q.schema[id_col].dataType.simpleString()

    def kernel(batches):  # self-contained: cloudpickled to executors
        import numpy as np

        cmat = np.asarray(flat, dtype=np.int64).reshape(k, dim)
        for pdf in batches:
            if pdf.empty:
                continue
            x = np.asarray(
                [np.asarray(v, dtype=np.int64) for v in pdf[qvec_col]]
            )
            d2 = ((x[:, None, :] - cmat[None, :, :]) ** 2).sum(axis=2)
            out = pdf[[id_col]].copy()
            out["cluster"] = d2.argmin(axis=1).astype(np.int64)
            yield out

    return q.mapInPandas(kernel, schema=f"{id_col} {id_type}, cluster long")


def _update(
    q: DataFrame, assigned: DataFrame, cents: list[list[int]], qvec_col: str, id_col: str
) -> tuple[list[list[int]], dict[int, int]]:
    """New integer centroids from one grouped pass; empty clusters
    keep their previous centroid.  The collect is K×dim rows — the
    broadcast-small side of Lloyd, not a data collect."""
    sums = (
        q.join(assigned, id_col)
        .select("cluster", F.posexplode(F.col(qvec_col)).alias("pos", "val"))
        .groupBy("cluster", "pos")
        .agg(F.sum("val").alias("s"), F.count("*").alias("n"))
        .withColumn("c", F.expr("((s + 127*n)*2 + n) div (2*n) - 127"))
        .select("cluster", "pos", "c", "n")
        .collect()
    )
    new = [list(c) for c in cents]
    sizes: dict[int, int] = {}
    for r in sums:
        new[r.cluster][r.pos] = int(r.c)
        sizes[int(r.cluster)] = int(r.n)
    return new, sizes


def kmeans_int8_lloyd(
    emb: DataFrame,
    k: int = 8,
    iters: int = 2,
    embedding_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """``iters`` exact Lloyd iterations on the int8 grid, seeded with
    the quantized vectors of the ids in ``[0, k)`` that are present.
    Returns the final centroids component-exploded —
    ``(cluster_id, pos, c_val, n_members)``, K×dim rows — computed
    from the LAST assignment.

    ``cluster_id`` is the SEED'S id value (not its position in the
    seed list), matching the SQL oracle's ``c0.cid = vec_id``
    labeling even when some of the ids 0..k−1 are absent.  Internally
    clusters are positional (the argmin index); seeds are collected in
    ascending id order, so the argmin's first-minimum tie-break equals
    the oracle's smallest-cid tie-break under any seed subset."""
    q = quantize_int8(emb, embedding_col=embedding_col, id_col=id_col)
    q = q.cache()
    try:
        seed_rows = (
            q.filter(F.col(id_col) < k).orderBy(id_col).collect()
        )  # K rows — seeds, small by construction
        cents = [[int(v) for v in r.qvec] for r in seed_rows]
        seed_ids = [int(r[id_col]) for r in seed_rows]
        spark = emb.sparkSession
        out_schema = "cluster_id long, pos int, c_val long, n_members long"
        if not cents:
            # Empty corpus (or none of ids 0..k-1 present): no seeds,
            # no clusters — typed empty, same as the SQL twin.
            return spark.createDataFrame([], out_schema)
        sizes: dict[int, int] = {}
        for _ in range(iters):
            assigned = _assign(q, cents, "qvec", id_col)
            cents, sizes = _update(q, assigned, cents, "qvec", id_col)
        rows = [
            (seed_ids[cid], pos, cents[cid][pos], sizes.get(cid, 0))
            for cid in range(len(cents))
            for pos in range(len(cents[cid]))
        ]
        return spark.createDataFrame(rows, out_schema)
    finally:
        q.unpersist()


def kmeans_int8_assign(
    emb: DataFrame,
    k: int = 8,
    iters: int = 2,
    embedding_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """The ASSIGNMENT twin of :func:`kmeans_int8_lloyd`: run
    ``iters − 1`` exact Lloyd updates from the id-``[0, k)`` seeds,
    then return the final assignment ``(id, qvec, cluster)`` against
    those centroids — i.e. the oracle chain's ``a2`` when
    ``iters = 2``.  ``cluster`` is labeled by the SEED's id (see the
    labeling note on :func:`kmeans_int8_lloyd`); ``qvec`` rides along
    so consumers (SemDeDup) need no second quantization pass.

    The returned frame is eagerly localCheckpoint-ed: the cached
    quantized corpus is released before returning (cache-hygiene rule:
    no cache outlives its operator)."""
    q = quantize_int8(emb, embedding_col=embedding_col, id_col=id_col)
    q = q.cache()
    try:
        seed_rows = q.filter(F.col(id_col) < k).orderBy(id_col).collect()
        cents = [[int(v) for v in r.qvec] for r in seed_rows]
        seed_ids = [int(r[id_col]) for r in seed_rows]
        spark = emb.sparkSession
        id_type = q.schema[id_col].dataType.simpleString()
        if not cents:
            return spark.createDataFrame(
                [], f"{id_col} {id_type}, qvec array<bigint>, cluster long"
            )
        for _ in range(max(0, int(iters) - 1)):
            assigned = _assign(q, cents, "qvec", id_col)
            cents, _ = _update(q, assigned, cents, "qvec", id_col)
        final = _assign(q, cents, "qvec", id_col)
        seed_arr = F.array(*[F.lit(s) for s in seed_ids])
        out = (
            q.join(final, id_col)
            .select(
                id_col,
                "qvec",
                F.element_at(seed_arr, F.col("cluster").cast("int") + 1).alias("cluster"),
            )
            .localCheckpoint(eager=True)
        )
        return out
    finally:
        q.unpersist()


def semdedup_survivors(
    emb: DataFrame,
    k: int = 8,
    iters: int = 2,
    threshold_num: int = 9,
    threshold_den: int = 10,
    embedding_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """SemDeDup (Abbas et al. 2023): cluster the embedding space, then
    drop rows that have a semantically-near-identical lower-id
    neighbor WITHIN their cluster — the scale trick being that the
    quadratic near-dup test runs per cluster, never across the corpus.
    Output ``(vec_id, cluster_id, kept)`` for every input row.

    Exactness: clustering is the int8 Lloyd assignment
    (:func:`kmeans_int8_assign` — every step integer-exact), and the
    near-dup test is the rational-threshold integer cosine
    ``dot > 0 AND den²·dot² ≥ num²·‖u‖²·‖v‖²`` — no floating point
    anywhere, so the whole pipeline hash-matches a SQL replay.

    Scale shape: one quantize scan + (iters−1) Lloyd shuffles + one
    assignment pass, then ONE ``applyInPandas`` over clusters whose
    kernel is an integer Gram matrix — cost Σ n_c²·dim, bounded by the
    largest cluster.  The K dial IS the skew guard: at 100 TB you run
    K ~ √N clusters (the paper's regime) so n_c stays ~√N; a hot
    cluster (mass near one centroid) is visible in the assignment
    census before the quadratic step runs.  Zero-norm rows are never
    duplicates (the ``dot > 0`` guard), matching the oracle.
    """
    assigned = kmeans_int8_assign(emb, k, iters, embedding_col, id_col)
    num, den = int(threshold_num), int(threshold_den)
    id_type = assigned.schema[id_col].dataType.simpleString()
    out_schema = f"{id_col} {id_type}, cluster_id long, kept boolean"

    def cluster_kernel(key, pdf):
        import numpy as np
        import pandas as pd

        if len(pdf) == 0:
            return pd.DataFrame({id_col: [], "cluster_id": [], "kept": []})
        order = np.argsort(pdf[id_col].to_numpy(), kind="stable")
        ids = pdf[id_col].to_numpy()[order]
        x = np.asarray(
            [np.asarray(v, dtype=np.int64) for v in pdf["qvec"]]
        )[order]
        g = x @ x.T  # exact int64 Gram: |dot| ≤ dim·127² ≈ 1.03e6
        n2 = np.diag(g).copy()
        lhs = (den * den) * g * g  # ≤ 100·1.06e12 ≈ 1.1e14 — int64-safe
        rhs = (num * num) * np.outer(n2, n2)
        near = (g > 0) & (lhs >= rhs)
        # strictly-lower triangle: j < i in id order ⇒ i is the dup
        dup = np.tril(near, k=-1).any(axis=1)
        return pd.DataFrame(
            {id_col: ids, "cluster_id": int(key[0]), "kept": ~dup}
        )

    return assigned.groupBy("cluster").applyInPandas(cluster_kernel, schema=out_schema)


def dbscan_labels(
    pairs: DataFrame,
    nodes: DataFrame,
    node_col: str = "vec_id",
    src: str = "id1",
    dst: str = "id2",
    min_pts: int = 3,
) -> DataFrame:
    """Density-based clustering (DBSCAN, Ester et al. KDD'96) over a
    precomputed ε-neighbor pair relation: composition of the repo's
    existing rails rather than a new kernel — the ε-pairs come from
    whichever similarity operator fits (exact `cosine_neardup_pairs`
    as the oracle-grade input; the ANN candidate+verify path at
    corpus scale), and cluster formation reuses the
    O(log²n)-any-diameter star-contraction components (density
    ridges ARE long chains — hash-to-min's diameter bound would be
    the wrong tool here).

    Semantics (deterministic variant):

    * core    — ≥ ``min_pts`` points in the closed ε-neighborhood
                (the point itself counts, textbook DBSCAN);
    * cluster — connected components of the core-core ε-graph;
                label = MIN core id in the component;
    * border  — non-core with ≥1 core ε-neighbor, attached to the
                MINIMUM adjacent core label (classic DBSCAN leaves
                border assignment scan-order-dependent; pinning the
                min makes the result engine- and partition-exact);
    * noise   — everything else, cluster = -1.

    Scale shape: a degree census (map-side combined), a semi-join to
    the core set, components on the CORE-CORE subgraph only (the
    dense interior — borders never enter the iteration), and one
    min-aggregated attach join for borders.  Every exchange carries
    integer keys; cost tracks the ε-pair volume, which the upstream
    ANN guard already bounds.  Output: ``(node, role, cluster)`` for
    every input node."""
    from vector_db_handler_spark.operators.graph import connected_components_star

    e = pairs.select(F.col(src).alias("u"), F.col(dst).alias("v"))
    # Pin the symmetrized ε-pair relation ONCE (r15 optimization):
    # ``sym`` feeds four subtrees (degree census, both core-edge join
    # legs, border attach), and ``pairs`` is typically an expensive
    # kernel (the blocked all-pairs cosine, or the ANN candidate +
    # verify chain) that Spark would re-execute per subtree — the
    # lazy checkpoint materializes it at the first action and every
    # later consumer reads the pinned blocks (guide §5: reuse beats
    # recompute exactly when the input is expensive).
    sym = (
        e.union(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
        .distinct()
        .localCheckpoint(eager=False)
    )
    deg = sym.groupBy("u").agg(F.count(F.lit(1)).alias("deg"))
    core = deg.filter(F.col("deg") >= min_pts - 1).select("u").localCheckpoint(
        eager=True
    )

    cc = core.select(F.col("u").alias("_c1"))
    core_edges = (
        sym.join(cc, sym.u == cc._c1)
        .drop("_c1")
        .join(core.select(F.col("u").alias("_c2")), sym.v == F.col("_c2"))
        .select("u", "v")
    )
    comp = connected_components_star(
        core_edges, src="u", dst="v", nodes=core, node_col="u"
    )  # (node, component) for every core point

    border_attach = (
        sym.join(core.select(F.col("u").alias("_core")), sym.v == F.col("_core"))
        .select(F.col("u").alias("node"), F.col("v").alias("core_nbr"))
        .join(core.withColumnRenamed("u", "node"), "node", "left_anti")
        .join(
            comp.withColumnRenamed("node", "core_nbr"),
            "core_nbr",
        )
        .groupBy("node")
        .agg(F.min("component").alias("cluster"))
    )

    base = nodes.select(F.col(node_col).alias("node"))
    core_rows = comp.select(
        "node", F.lit("core").alias("role"), F.col("component").alias("cluster")
    )
    border_rows = border_attach.select(
        "node", F.lit("border").alias("role"), "cluster"
    )
    labeled = core_rows.unionByName(border_rows)
    noise_rows = base.join(labeled.select("node"), "node", "left_anti").select(
        "node", F.lit("noise").alias("role"), F.lit(-1).cast("long").alias("cluster")
    )
    return labeled.unionByName(noise_rows)


def label_propagation_rounds(
    pairs: DataFrame,
    labels: DataFrame,
    rounds: int = 2,
    node_col: str = "node",
    label_col: str = "label",
    src: str = "id1",
    dst: str = "id2",
) -> DataFrame:
    """Semi-supervised label propagation over a similarity graph:
    unlabeled nodes adopt the MAJORITY label of their already-labeled
    neighbors, ties broken by the minimum label, for a fixed number
    of synchronous rounds — the cheap label-densification pass that
    turns a small curated seed set into corpus-scale weak labels
    (each round reaches one more hop of the ε-graph; a fixed round
    budget is the semantics, not an approximation of convergence).

    Determinism: the vote is an exact integer count and the
    (−count, label) argmin is a total order, so any partitioning
    yields identical labels — unlike classic async label propagation,
    whose result depends on visit order.  Per round: one join of
    edges→labels (labeled side only), one map-side-combined vote
    count, one argmin window per node, lineage pinned.  Returns
    ``(node, label, origin)`` with origin 'seed' or 'propagated'."""
    e = pairs.select(F.col(src).alias("u"), F.col(dst).alias("v"))
    sym = (
        e.union(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    seeds = labels.select(
        F.col(node_col).alias("node"), F.col(label_col).alias("label")
    )
    cur = seeds.withColumn("origin", F.lit("seed")).localCheckpoint(eager=True)
    for _ in range(rounds):
        votes = (
            sym.join(cur.withColumnRenamed("node", "u").select("u", "label"), "u")
            .select(F.col("v").alias("node"), "label")
            .join(cur.select("node"), "node", "left_anti")
            .groupBy("node", "label")
            .agg(F.count(F.lit(1)).alias("n"))
        )
        w = Window.partitionBy("node").orderBy(
            F.col("n").desc(), F.col("label").asc()
        )
        adopted = (
            votes.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .select("node", "label", F.lit("propagated").alias("origin"))
        )
        cur = cur.unionByName(adopted).localCheckpoint(eager=True)
    return cur

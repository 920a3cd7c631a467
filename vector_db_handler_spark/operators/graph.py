"""Iterative graph analytics in exact integer arithmetic: PageRank.

No analog in the reference (no graph surface); extension territory —
corpus curation uses centrality over similarity/co-occurrence graphs
(canonical-document selection inside near-dup clusters, source-trust
propagation, seed expansion).  The near-dup side of that story is
``dedup.neardup_components`` (hash-to-min label propagation); this
module adds the weighted-importance side.

Why INTEGER PageRank: float PageRank is order-sensitive (parallel sum
reduction) and engine-divergent, so a distributed run can't be
hash-checked against an independent replay.  With rank mass held in
integer micro-shares and the damping factor as a rational (17/20),
every step is exact:

    contrib(u)  = r_u // deg(u)                      (integer)
    r'(v)       = (1-d)·S + (17 · Σ contrib) // 20   (integer)

Integer sums are associative — ANY partitioning/reduction order gives
the same value, which is what makes the DuckDB oracle (3 unrolled CTE
iterations) bit-exact.  The truncation bias per step is < deg(u)
micro-shares out of 10^12 — quantified and deterministic, unlike
float rounding which is neither.

Scale shape per iteration: one join of edges→ranks on src (edges
pre-keyed by src; ranks are |V| skinny rows), one map-side-combined
SUM shuffle on dst, one left join back to the node set.  Lineage is
truncated per iteration with ``localCheckpoint`` so plan depth stays
O(1) in the iteration count (same posture as label propagation).
100 TB note: for web-scale graphs the ranks relation stays
cluster-resident (never driver-side), and the edge relation should be
bucketed by src so the per-iteration join is shuffle-free on one side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: Rank mass scale: 10^12 micro-shares per node initially; divisible
#: by the damping denominator so the teleport term is exact.
PR_SCALE = 1_000_000_000_000
PR_DAMP_NUM = 17
PR_DAMP_DEN = 20


def pagerank_integer(
    edges: DataFrame,
    iters: int = 3,
    src_col: str = "src",
    dst_col: str = "dst",
    checkpoint: bool = True,
) -> DataFrame:
    """``iters`` exact integer PageRank steps over a directed edge
    list (feed both directions for an undirected graph).  Returns
    ``(node, rank)`` with rank in micro-shares of ``PR_SCALE``.

    Every node must appear as a source at least once (true for
    symmetrized undirected graphs); dangling-node redistribution is
    deliberately out of scope — symmetrize or self-loop first."""
    # Pin the caller's edge expression FIRST (r15): it is often a
    # non-trivial plan (scan + distinct + symmetrizing union) and was
    # previously re-executed once for ``ed`` and once more for
    # ``nodes`` (two eager checkpoints, each with the full upstream
    # lineage).  One lazy checkpoint on the input means the upstream
    # plan runs exactly once; ``ed`` and ``nodes`` then derive from
    # the pinned rows, and the loop consumes only pinned relations.
    edges = edges.select(
        F.col(src_col).alias("src"), F.col(dst_col).alias("dst")
    ).localCheckpoint(eager=False)
    deg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("d"))
    ed = edges.join(deg, "src").localCheckpoint(eager=False)
    nodes = deg.select(F.col("src").alias("node")).localCheckpoint(eager=False)
    teleport = (PR_DAMP_DEN - PR_DAMP_NUM) * PR_SCALE // PR_DAMP_DEN

    ranks = nodes.withColumn("r", F.lit(PR_SCALE).cast("long"))
    for _ in range(iters):
        contrib = (
            ed.join(ranks, ed.src == ranks.node)
            # `div` is exact integer division — floor(r/d) in DOUBLE
            # would be off-by-one whenever the quotient lands within
            # one ulp of an integer (ulp ≈ 0.25 at 2^51).
            .select(F.col("dst").alias("node"), F.expr("r div d").alias("c"))
        )
        sums = contrib.groupBy("node").agg(F.sum("c").alias("cs"))
        ranks = nodes.join(sums, "node", "left").select(
            "node",
            (
                F.lit(teleport)
                + F.expr(f"({PR_DAMP_NUM} * coalesce(cs, 0L)) div {PR_DAMP_DEN}")
            ).alias("r"),
        )
        if checkpoint:
            ranks = ranks.localCheckpoint(eager=False)
    return ranks.select("node", F.col("r").alias("rank"))


def triangle_count(
    edges: DataFrame,
    src: str = "u",
    dst: str = "v",
) -> DataFrame:
    """Exact per-node triangle counts over an undirected edge list
    (``edges`` may carry either or both directions and duplicates —
    canonicalized here).  Returns ``(node, n_triangles)`` for every
    node that participates in at least one triangle.

    Algorithm: degree-ordered edge orientation (Suri & Vassilvitskii,
    "Counting Triangles and the Curse of the Last Reducer", WWW'11).
    Every edge is directed from its lower endpoint to its higher
    endpoint under the total order (degree, node-id); a triangle
    {a ≺ b ≺ c} then materializes exactly once, as the wedge
    (a→b, a→c) closed by the oriented edge b→c.

    Why that orientation matters at 100 TB: out-degree under the
    (deg, id) order is O(√m) for ANY graph, so the wedge relation —
    the only super-linear intermediate — is O(m^{3/2}) total and a
    celebrity node (every social / co-occurrence graph has them)
    generates NO wedges from its high-degree side; the naive
    neighbor-pair expansion would emit deg² ≈ 10¹² rows for one hub.
    Plan shape: canonical edge distinct (one shuffle on the edge
    key), two skinny degree joins, the wedge self-join on the center
    key, and the closing join on the (b, c) edge key — every
    exchange carries integer keys only.  The oriented edge list is
    consumed three times (both wedge legs + the closing probe), so
    it is pinned once with an eager ``localCheckpoint``."""
    e = edges.select(F.col(src).alias("u"), F.col(dst).alias("v")).filter(
        F.col("u") != F.col("v")
    )
    und = e.select(
        F.least("u", "v").alias("u"), F.greatest("u", "v").alias("v")
    ).distinct()
    sym = und.union(und.select(F.col("v").alias("u"), F.col("u").alias("v")))
    deg = sym.groupBy(F.col("u").alias("node")).agg(F.count(F.lit(1)).alias("d"))

    du = deg.select(F.col("node").alias("u"), F.col("d").alias("du"))
    dv = deg.select(F.col("node").alias("v"), F.col("d").alias("dv"))
    keyed = und.join(du, "u").join(dv, "v")
    lo_first = F.struct("du", "u") < F.struct("dv", "v")
    oriented = keyed.select(
        F.when(lo_first, F.col("u")).otherwise(F.col("v")).alias("src"),
        F.when(lo_first, F.col("v")).otherwise(F.col("u")).alias("dst"),
        F.when(lo_first, F.struct("dv", "v")).otherwise(
            F.struct(F.col("du").alias("dv"), F.col("u").alias("v"))
        ).alias("dst_key"),
    ).localCheckpoint(eager=True)

    w1 = oriented.select(
        F.col("src").alias("a"), F.col("dst").alias("b"), F.col("dst_key").alias("bk")
    )
    w2 = oriented.select(
        F.col("src").alias("a"), F.col("dst").alias("c"), F.col("dst_key").alias("ck")
    )
    wedges = w1.join(w2, "a").filter(F.col("bk") < F.col("ck")).select("a", "b", "c")
    closing = oriented.select(F.col("src").alias("b"), F.col("dst").alias("c"))
    tri = wedges.join(closing, ["b", "c"])

    return (
        tri.select(F.explode(F.array("a", "b", "c")).alias("node"))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("n_triangles"))
    )


def connected_components_star(
    pairs: DataFrame,
    src: str = "d1",
    dst: str = "d2",
    nodes: DataFrame | None = None,
    node_col: str = "doc_id",
    max_rounds: int = 30,
) -> DataFrame:
    """Connected components by alternating LARGE-STAR / SMALL-STAR
    (Kiveris et al., "Connected Components in MapReduce and Beyond") —
    the unbounded-diameter twin of ``dedup.connected_components``.

    Hash-to-min label propagation needs DIAMETER rounds: fine for
    near-dup graphs (piles of diameter-2 cliques), hopeless for chain-
    or mesh-shaped graphs (citation trails, session graphs, linked
    span overlaps) where the diameter is thousands.  The star
    operations contract every component onto its minimum node in
    O(log^2 n) rounds REGARDLESS of diameter:

    * large-star: every node points its LARGER neighbors at the
      minimum of its neighborhood (min(N(u) ∪ {u}));
    * small-star: every node folds its smaller-or-equal neighbors —
      and itself — onto their minimum.

    Both are one groupBy-min + one join per round on the node key
    (map-side combined); the edge set only shrinks toward the star
    forest, and lineage is truncated per round.  At convergence the
    graph IS a star forest centered on component minima, so the label
    read-off is a single min-aggregate.  Returns ``(node, component)``
    — same contract as ``connected_components`` (and
    ``canonical_docs`` consumes either); ``nodes`` adds isolated
    nodes as singletons."""
    e = pairs.select(F.col(src).alias("u"), F.col(dst).alias("v")).filter(
        F.col("u") != F.col("v")
    )
    # Lazy checkpoint + count: the count action materializes the
    # checkpoint blocks AND yields the row count the convergence test
    # needs, in ONE job (r15 optimization — the eager-checkpoint +
    # separate count() pattern paid two scheduling round-trips per
    # materialization; at ~3 driver round-trips per contraction round
    # the loop was job-submission-bound, guide §1.2/§7.3).
    edges = (
        e.union(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
        .distinct()
        .localCheckpoint(eager=False)
    )
    n_edges = edges.count()

    def _sym(df: DataFrame) -> DataFrame:
        return (
            df.filter(F.col("u") != F.col("v"))
            .union(df.select(F.col("v").alias("u"), F.col("u").alias("v")))
            .filter(F.col("u") != F.col("v"))
            .distinct()
        )

    for _ in range(max_rounds):
        # LARGE-STAR: m(u) = min over the closed neighborhood; larger
        # neighbors re-attach to it.  NOT checkpointed: both small-star
        # branches consume the identical subplan, which Catalyst dedups
        # via ReusedExchange inside the ONE job that materializes
        # `small` — a per-round eager checkpoint here would double the
        # blocking job count for no lineage benefit (the round's base,
        # `edges`, is already pinned).
        mins = edges.groupBy("u").agg(
            F.least(F.min("v"), F.first("u")).alias("m")
        )
        # Symmetrized WITHOUT the intermediate distinct (r15, guide
        # §2.4): every small-star consumer below is duplicate-proof —
        # ``smins`` is a MIN aggregate and the round's result passes
        # through the final ``_sym`` distinct — so deduping here only
        # added a full shuffle of the large-star relation per round.
        # Duplicate multiplicity is bounded by the (already pinned)
        # edge relation feeding this round, not by anything larger.
        lg = (
            edges.filter(F.col("v") > F.col("u"))
            .join(mins, "u")
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
        )
        large = (
            lg.filter(F.col("u") != F.col("v"))
            .union(lg.select(F.col("v").alias("u"), F.col("u").alias("v")))
            .filter(F.col("u") != F.col("v"))
        )

        # SMALL-STAR over the ≤-neighborhood: u and its small
        # neighbors all attach to their collective minimum.
        small_nbr = large.filter(F.col("v") <= F.col("u"))
        smins = small_nbr.groupBy("u").agg(F.min("v").alias("m"))
        small = _sym(
            small_nbr.join(smins, "u")
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
            .union(smins.select("u", F.col("m").alias("v")))
        ).localCheckpoint(eager=False)
        n_small = small.count()  # one job: materializes + counts

        # Converged when the star ops are a no-op (edge sets equal;
        # the anti-join only runs once counts stop moving — both
        # frames are pinned, so it is cheap).  ``edges``'s count is
        # carried from the previous round instead of re-counted.
        if (
            n_small == n_edges
            and small.join(edges, ["u", "v"], "left_anti").limit(1).count() == 0
        ):
            edges = small
            break
        edges, n_edges = small, n_small
    else:
        raise RuntimeError(
            f"connected_components_star did not converge in {max_rounds} "
            "rounds — O(log^2 n) bound exceeded; the input is degenerate"
        )

    labels = edges.groupBy("u").agg(
        F.least(F.min("v"), F.first("u")).alias("component")
    ).select(F.col("u").alias("node"), "component")
    if nodes is not None:
        isolated = (
            nodes.select(F.col(node_col).alias("node"))
            .join(labels, "node", "left_anti")
            .withColumn("component", F.col("node"))
        )
        labels = labels.unionByName(isolated)
    return labels


def kcore_nodes(
    edges: DataFrame,
    k: int,
    src: str = "u",
    dst: str = "v",
    max_rounds: int = 60,
) -> DataFrame:
    """The k-CORE of an undirected graph: the maximal subgraph where
    every node keeps degree ≥ k — the standard cohesion filter
    (spam-farm detection, dense-community seeds, nucleus extraction)
    completing the graph rail: connectivity (components) → importance
    (PageRank) → local density (triangles) → global density (k-core).

    Algorithm: synchronous peeling — drop every node of current
    degree < k, delete its edges, repeat until stable.  Each round is
    one map-side-combined degree census + two semi-joins on the node
    key, with the shrinking edge set re-pinned per round
    (localCheckpoint: lineage stays O(1) in rounds, and each round's
    input is the materialized previous round, not a growing plan).

    Round count = the graph's PEELING DEPTH (shells removed one per
    round) — small on real heavy-tailed graphs (the fixture peels in
    10), but Θ(n) on adversarial chains; ``max_rounds`` fails loudly
    rather than spinning.  Convergence is detected by edge-count
    stability, an O(1) check against the pinned round result.
    Returns ``(node, core_degree)`` for every node of the k-core."""
    e = edges.select(F.col(src).alias("u"), F.col(dst).alias("v")).filter(
        F.col("u") != F.col("v")
    )
    und = e.select(
        F.least("u", "v").alias("u"), F.greatest("u", "v").alias("v")
    ).distinct()
    # Lazy checkpoints + one materializing count per round (r15,
    # guide §7.3): the round's single count() action computes and
    # pins BOTH checkpoint boundaries — ``keep`` is an RDD node
    # referenced by the two semi-joins, so it still materializes
    # exactly once — where the eager form paid three scheduling
    # round-trips per peel round.
    cur = und.localCheckpoint(eager=False)
    n_edges = cur.count()
    for _ in range(max_rounds):
        if n_edges == 0:
            break
        sym = cur.union(cur.select(F.col("v").alias("u"), F.col("u").alias("v")))
        deg = sym.groupBy("u").agg(F.count(F.lit(1)).alias("d"))
        keep = deg.filter(F.col("d") >= k).select("u").localCheckpoint(eager=False)
        nxt = (
            cur.join(keep, "u", "left_semi")
            .join(keep.select(F.col("u").alias("v")), "v", "left_semi")
            # USING-joins move the join column first — re-pin (u, v)
            # order, because the symmetrizing union above is
            # positional and scrambled columns silently corrupt the
            # next round's degrees.
            .select("u", "v")
            .localCheckpoint(eager=False)
        )
        n_next = nxt.count()
        if n_next == n_edges:
            cur = nxt
            break
        cur, n_edges = nxt, n_next
    else:
        raise RuntimeError(
            f"kcore_nodes: did not stabilize within {max_rounds} rounds "
            "(peeling depth exceeded — adversarial chain-like input?)"
        )
    sym = cur.union(cur.select(F.col("v").alias("u"), F.col("u").alias("v")))
    return sym.groupBy(F.col("u").alias("node")).agg(
        F.count(F.lit(1)).alias("core_degree")
    )


def bfs_hops(
    edges: DataFrame,
    seeds: DataFrame,
    max_hops: int,
    src: str = "u",
    dst: str = "v",
    seed_col: str = "node",
) -> DataFrame:
    """Bounded-horizon BFS: exact minimum hop distance from a SEED SET
    over an undirected graph, up to ``max_hops`` — the seed-expansion
    primitive of curation (trust propagation from vetted sources,
    contamination blast-radius from flagged docs, neighborhood
    retrieval around labeled examples).  Unreached-within-horizon
    nodes are simply absent (callers needing a sentinel left-join).

    Level-synchronous frontier expansion: round ``h`` joins the
    current frontier to the edge list and anti-joins already-labeled
    nodes — each round is one join + one distinct + one anti-join on
    integer node keys, frontier-sized (never corpus-sized), with
    lineage pinned per round.  Exactly ``max_hops`` rounds by
    construction: the bounded horizon is the SCALE CONTRACT (rounds
    are the cost dial, and 2-4 hops is what trust/contamination
    semantics mean — an unbounded BFS is a components question and
    belongs to star contraction).  Returns ``(node, hops)``."""
    if max_hops < 0:
        raise ValueError(f"need max_hops >= 0, got {max_hops}")
    e = edges.select(F.col(src).alias("u"), F.col(dst).alias("v")).filter(
        F.col("u") != F.col("v")
    )
    sym = (
        e.union(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    labeled = (
        seeds.select(F.col(seed_col).alias("node"))
        .distinct()
        .withColumn("hops", F.lit(0).cast("long"))
        .localCheckpoint(eager=True)
    )
    frontier = labeled.select("node")
    # One materializing count per hop (r15, guide §7.3): the frontier
    # count doubles as the emptiness test and the checkpoint
    # materialization; ``labeled`` pins lazily at its first consumer
    # (next hop's anti-join, or the caller's action).  The eager form
    # paid three scheduling round-trips per hop.
    for h in range(1, max_hops + 1):
        nbrs = (
            sym.join(frontier.withColumnRenamed("node", "u"), "u")
            .select(F.col("v").alias("node"))
            .distinct()
            .join(labeled.select("node"), "node", "left_anti")
            .localCheckpoint(eager=False)
        )
        if nbrs.count() == 0:
            break
        labeled = labeled.unionByName(
            nbrs.withColumn("hops", F.lit(h).cast("long"))
        ).localCheckpoint(eager=False)
        frontier = nbrs
    return labeled


def components_apply_batch(
    labels: DataFrame,
    new_pairs: DataFrame,
    src: str = "d1",
    dst: str = "d2",
) -> DataFrame:
    """INCREMENTAL connected-components maintenance: fold a batch of
    newly-discovered edges into an existing ``(node, component)``
    labeling without re-running components over the full pair corpus
    — the graph sibling of the rollup/join IVM entries.  The insight:
    the old labeling IS a star forest (node → component minimum), so
    the merged graph [star edges ∪ new pairs] is label-equivalent to
    [all old pairs ∪ new pairs] but only |V| + |Δ| edges — star
    contraction on it costs rounds over the COLLAPSED graph, whose
    diameter is ~2 + the batch's bridging structure, regardless of how
    long the original pair history was.

    New nodes appearing only in the batch label themselves.  Returns
    the refreshed ``(node, component)`` — same contract as the full
    operators, so a maintained labeling can keep folding batches."""
    star = labels.select(F.col("node").alias("u"), F.col("component").alias("v"))
    batch = new_pairs.select(F.col(src).alias("u"), F.col(dst).alias("v"))
    merged = star.unionByName(batch)
    nodes = (
        labels.select("node")
        .unionByName(new_pairs.select(F.col(src).alias("node")))
        .unionByName(new_pairs.select(F.col(dst).alias("node")))
        .distinct()
    )
    return connected_components_star(
        merged, src="u", dst="v", nodes=nodes, node_col="node"
    )


def label_propagation_communities(
    edges: DataFrame,
    n_iters: int = 3,
    src_col: str = "src",
    dst_col: str = "dst",
) -> DataFrame:
    """Fixed-round semi-synchronous label propagation (Raghavan et
    al., 2007) — DENSITY communities, the sibling of the
    connectivity rails (``connected_components_star`` finds what is
    REACHABLE; this finds what is densely knit: two cliques joined by
    one bridge edge are one component but two communities).

    Each round every node adopts the MODE of its neighbours' labels
    (ties break to the smallest label — pinned, so the run is
    deterministic and the SQL twin replays it by unrolling the same
    ``n_iters`` rounds as CTEs).  Classic async LPA is
    order-dependent and unbenchable; the fixed-round synchronous form
    trades convergence guarantees for exact replayability — after k
    rounds a label has propagated k hops, which is the community
    scale a curation pipeline actually dials (``n_iters`` is the
    dial, like the PageRank iteration count above).

    Input edges are treated as undirected (symmetrized + de-duped;
    self-loops dropped).  Returns ``(node, community)`` — community
    ids are node ids, canonical only up to the propagation (roll up
    or re-label downstream as needed).

    Scale shape per round: one edges⨝labels equi-join on the
    neighbour end, one map-side-combined (node, label) vote count,
    one per-node argmax AGGREGATE (max of the (n, -label) struct —
    the pinned (count DESC, label ASC) winner, partial-combined
    map-side, no window sort; requires numeric node ids — the r15
    ADVICE note).  r16 (guide §2.4): the fixed, small round count
    means the unrolled plan is bounded, so rounds are NO longer
    checkpointed individually — the identical per-round edge
    exchange collapses into ONE reused exchange across all rounds
    (ReusedExchange/AQE stage reuse), where the checkpointed form
    re-shuffled the edge relation every round (``localCheckpoint``
    erases output partitioning — measured, not assumed).  Lineage is
    still truncated every 4th round so a large ``n_iters`` dial
    cannot grow the optimizer's input unboundedly."""
    if n_iters < 1:
        raise ValueError(f"n_iters must be >= 1, got {n_iters}")
    und = edges.select(
        F.col(src_col).alias("a"), F.col(dst_col).alias("b")
    ).filter(F.col("a") != F.col("b"))
    sym = und.unionByName(
        und.select(F.col("b").alias("a"), F.col("a").alias("b"))
    ).distinct()
    sym = sym.localCheckpoint(eager=False)
    labels = sym.select(F.col("a").alias("node")).distinct().select(
        "node", F.col("node").alias("label")
    )
    for i in range(int(n_iters)):
        votes = (
            sym.join(labels, sym["b"] == labels["node"])
            .select(F.col("a").alias("node"), "label")
            .groupBy("node", "label")
            .agg(F.count(F.lit(1)).alias("n"))
        )
        labels = (
            votes.groupBy("node")
            .agg(
                F.max(
                    F.struct(F.col("n"), (-F.col("label")).alias("_negl"))
                ).alias("_w")
            )
            .select("node", (-F.col("_w._negl")).alias("label"))
        )
        if (i + 1) % 4 == 0 and (i + 1) < int(n_iters):
            labels = labels.localCheckpoint(eager=False)
    return labels.select("node", F.col("label").alias("community"))


def hyperball_neighborhood(
    edges: DataFrame,
    n_hops: int = 2,
    p: int = 6,
    src_col: str = "src",
    dst_col: str = "dst",
) -> DataFrame:
    """HyperBall (Boldi & Vigna, 2013): the per-node NEIGHBOURHOOD
    FUNCTION — an estimate of ``|ball(node, h)|`` (nodes within ≤ h
    hops) for every node and every ``h in 0..n_hops`` — via HLL
    register propagation, the algorithm that computed Facebook's
    "four degrees of separation".  Exact BFS per node is |V| traversals
    (hopeless at scale); HyperBall replaces each node's reach-SET with
    a constant-size HLL sketch and each BFS round with one
    max-merge over edges — the sketch-algebra trick that turns
    all-pairs reachability into ``n_hops`` joins.

    Built on the SAME register/estimate arithmetic as
    ``hll.hll_distinct_by_key`` (one implementation: the 60-bit md5
    hash, exact BIGINT harmonic sums, the fixed-point linear-counting
    branch), so the whole run replays bit-for-bit in the DuckDB twin
    with the rounds unrolled as CTEs.

    Input edges are treated as undirected (symmetrized, self-loops
    dropped — isolated nodes don't appear, matching the LPA/components
    convention).  Returns ``(node, hop, n_zero_buckets, sum_scaled,
    est_raw, est_lc, est_used)``, one row per node per hop —
    ``est_used`` at hop h estimates the h-ball's size; downstream
    rollups (effective diameter, median ball growth) read off this
    relation.

    Scale shape per round (r16, guide §2.3 — shuffle fewer bytes):
    registers ride DENSE, one row per node carrying the fixed
    K-element register array, so each round is one edges⨝registers
    equi-join on the neighbour end plus ONE map-side-combined
    per-node aggregate of K element-wise MAXes — the only exchange
    payload is one pre-combined register row per node per map task
    (the sparse (node, bucket, m) form shipped up to K rows per node
    AND re-shuffled a |V|·K grid join per hop for the estimates).
    Self-loop edges feed each node's own registers through the same
    join, and the per-hop estimate readout is a pure projection over
    the dense array — zero additional shuffles.  Lineage is truncated
    per round with ``localCheckpoint`` (the PageRank/LPA posture).
    Register VALUES are bit-identical to the sparse formulation (the
    same max-merge algebra; the estimate arithmetic is the shared
    ``hll_estimate_exprs``)."""
    from vector_db_handler_spark.operators.hll import (
        hll_estimate_exprs,
        hll_registers,
    )

    if n_hops < 0:
        raise ValueError(f"n_hops must be >= 0, got {n_hops}")
    k = 1 << p
    s = 61 - p
    und = edges.select(
        F.col(src_col).alias("a"), F.col(dst_col).alias("b")
    ).filter(F.col("a") != F.col("b"))
    sym = und.unionByName(
        und.select(F.col("b").alias("a"), F.col("a").alias("b"))
    ).distinct()
    nodes = sym.select(F.col("a").alias("node")).distinct()
    # Self-loops: the merge join below then delivers every node its
    # own previous-round registers along with its neighbours' — no
    # separate union leg (ball(h) ⊇ ball(h-1) is exactly reflexivity).
    npart = int(
        edges.sparkSession.conf.get("spark.sql.shuffle.partitions", "200")
    )
    prop = sym.unionByName(
        nodes.select(F.col("node").alias("a"), F.col("node").alias("b"))
    ).localCheckpoint(eager=False)
    # hop-0 registers: each node's ball is {itself} — exactly ONE
    # non-empty register per node, densified in-row.  The node set
    # reads back off the pinned prop relation (its self-loop rows ARE
    # the node set) so the upstream symmetrize+distinct runs once.
    pinned_nodes = prop.filter(F.col("a") == F.col("b")).select(
        F.col("a").alias("node")
    )
    sparse0 = hll_registers(
        pinned_nodes.select("node", F.col("node").alias("val")),
        "node",
        "val",
        p,
    ).withColumnRenamed("key", "node")
    idx = F.sequence(F.lit(0), F.lit(k - 1))
    # array<tinyint>: a register is a rho value in [1, s] (s <= 57 for
    # any valid p), so ONE BYTE per register — the narrow type keeps
    # every exchange row at node + K bytes instead of node + K longs
    # (§2.3: narrower types, halve-the-column), and the per-register
    # MAX buffers below stay tinyint too.
    regs = sparse0.select(
        "node",
        F.transform(
            idx,
            lambda i: F.when(i == F.col("bucket"), F.col("m")).otherwise(
                F.lit(0).cast("long")
            ),
        )
        .cast("array<tinyint>")
        .alias("r"),
    ).localCheckpoint(eager=False)

    def _dense_estimates(regs_df: DataFrame, hop: int) -> DataFrame:
        # n_zero_buckets / sum_scaled straight off the dense array
        # (empty register: m = 0 contributes 2^s), then the shared
        # estimate expressions — a projection, no shuffle.
        nnz = F.size(F.filter(F.col("r"), lambda m: m > F.lit(0)))
        nz = (F.lit(k) - nnz).cast("long")
        ss = (
            F.aggregate(
                F.col("r"),
                F.lit(0).cast("long"),
                lambda acc, m: acc
                + F.call_function(
                    "shiftleft",
                    F.lit(1).cast("long"),
                    (F.lit(s) - m.cast("int")).cast("int"),
                ),
            )
        ).cast("long")
        est_raw, est_lc, est_used = hll_estimate_exprs(p)
        return regs_df.select(
            "node",
            F.lit(hop).cast("long").alias("hop"),
            nz.alias("n_zero_buckets"),
            ss.alias("sum_scaled"),
        ).select(
            "node",
            "hop",
            "n_zero_buckets",
            "sum_scaled",
            est_raw.alias("est_raw"),
            est_lc.alias("est_lc"),
            est_used.alias("est_used"),
        )

    # Merge-exchange shape (guide §4.2/§8 — pre-combine with
    # vectorized native code, then move narrow rows once): a
    # mapInArrow pass element-wise-MAXes each task's register rows
    # per node (numpy sort + maximum.reduceat — whole-batch, no
    # Python row loop), so the explicit hash(node) repartition ships
    # ONE combined (node, K-byte array) row per node per map task;
    # the K-way MAX aggregate that finishes the merge runs on top of
    # that exchange WITHOUT its own (grouping key ⊇ partitioning
    # key), so its 8-byte-padded partial buffers are never
    # serialized.
    #
    # Defined as a CLOSURE (not module-level) deliberately: cloudpickle
    # then ships it by value, so executor Python workers never need
    # the repo package importable — the driver harness runs from an
    # arbitrary cwd (a module-level function failed exactly there).
    def _premerge_registers(batches):
        """Task-local element-wise register max: combine this task's
        (node, r) rows to one row per node before the merge exchange.
        Pure numpy over whole Arrow batches (sort once,
        ``maximum.reduceat`` per node group) — no per-row Python.  A
        task-local combiner only: the downstream per-node aggregate
        produces the global max, so batch order/placement cannot
        change results (max is associative/commutative/idempotent)."""
        import numpy as np
        import pyarrow as pa

        nodes_all = []
        mats = []
        width = None
        for b in batches:
            n = b.column(0).to_numpy(zero_copy_only=False)
            if len(n) == 0:
                continue
            lst = b.column(1)
            vals = lst.flatten().to_numpy(zero_copy_only=False)
            width = len(vals) // len(n)
            nodes_all.append(n)
            mats.append(vals.reshape(len(n), width))
        if not nodes_all:
            return
        nodes = np.concatenate(nodes_all)
        mat = np.vstack(mats)
        order = np.argsort(nodes, kind="stable")
        nodes = nodes[order]
        mat = mat[order]
        starts = np.flatnonzero(np.r_[True, nodes[1:] != nodes[:-1]])
        out = np.maximum.reduceat(mat, starts, axis=0).astype(
            np.int8, copy=False
        )
        uniq = nodes[starts]
        offsets = pa.array(
            np.arange(0, (len(uniq) + 1) * width, width, dtype=np.int32)
        )
        rarr = pa.ListArray.from_arrays(
            offsets, pa.array(out.reshape(-1), type=pa.int8())
        )
        yield pa.RecordBatch.from_arrays(
            [pa.array(uniq, type=pa.int64()), rarr], ["node", "r"]
        )

    reg_schema = "node bigint, r array<tinyint>"
    per_hop = [_dense_estimates(regs, 0)]
    for h in range(1, int(n_hops) + 1):
        merged = (
            prop.join(regs, prop["b"] == regs["node"])
            .select(F.col("a").alias("node"), "r")
            .mapInArrow(_premerge_registers, reg_schema)
            .repartition(npart, "node")
            .groupBy("node")
            .agg(
                *[
                    F.max(F.col("r")[i]).alias(f"_m{i}")
                    for i in range(k)
                ]
            )
            .select(
                "node",
                F.array(*[F.col(f"_m{i}") for i in range(k)]).alias("r"),
            )
            .localCheckpoint(eager=False)
        )
        regs = merged
        per_hop.append(_dense_estimates(regs, h))
    out = per_hop[0]
    for df in per_hop[1:]:
        out = out.unionByName(df)
    return out


def neighborhood_function(
    edges: DataFrame,
    n_hops: int = 2,
    p: int = 6,
    coverage_q: float = 0.9,
    src_col: str = "src",
    dst_col: str = "dst",
    per_node: DataFrame | None = None,
) -> DataFrame:
    """The graph-level NEIGHBOURHOOD FUNCTION N(h) and the effective-
    diameter readout built on :func:`hyperball_neighborhood` — the
    number HyperBall exists to produce ("how many pairs are within h
    hops?", "what h covers 90% of all reachable pairs?" — the
    four-degrees-of-separation statistic).

    Per hop: ``n_nodes``, ``sum_reach_micro`` (Σ over nodes of
    ``floor(est_used·10⁶)`` — each term is a deterministic integer
    cast of the per-node estimate, so the SUM is an exact BIGINT with
    no float-order sensitivity), ``reach_ratio`` = hop reach over the
    deepest hop's reach (one rounded IEEE division), and
    ``covers_q`` = whether this hop already reaches ``coverage_q`` of
    the deepest hop — the smallest hop with ``covers_q`` true IS the
    (discrete) effective diameter at q.

    Scale shape: the per-node relation is |V|·(n_hops+1) rows; this
    adds one map-side-combined rollup and a 1-row broadcast of the
    deepest hop's total.  Pass ``per_node`` (a precomputed
    :func:`hyperball_neighborhood` relation for the same edges/dials)
    to SHARE the register propagation instead of re-running it — the
    rollup is pure downstream algebra over that relation (r13 verdict
    #4: the propagation is the whole cost; two consumers should pay
    it once)."""
    if per_node is None:
        per_node = hyperball_neighborhood(
            edges, n_hops=n_hops, p=p, src_col=src_col, dst_col=dst_col
        )
    rolled = per_node.groupBy("hop").agg(
        F.count(F.lit(1)).cast("long").alias("n_nodes"),
        F.sum(F.floor(F.col("est_used") * F.lit(1_000_000.0)).cast("long"))
        .cast("long")
        .alias("sum_reach_micro"),
    )
    deepest = (
        rolled.orderBy(F.col("hop").desc())
        .limit(1)
        .select(F.col("sum_reach_micro").alias("max_reach_micro"))
    )
    return rolled.crossJoin(F.broadcast(deepest)).select(
        "hop",
        "n_nodes",
        "sum_reach_micro",
        F.round(
            F.col("sum_reach_micro").cast("double")
            / F.col("max_reach_micro"),
            6,
        ).alias("reach_ratio"),
        (
            F.col("sum_reach_micro").cast("double")
            >= F.lit(float(coverage_q)) * F.col("max_reach_micro")
        ).alias("covers_q"),
    )

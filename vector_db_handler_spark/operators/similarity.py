"""Similarity search over embedding columns.

The reference serves single-query KNN through Qdrant's HNSW
(``document_ingestor.py:356-363``); the Spark-native surface here is
BATCH similarity — many queries (or all-pairs) against the corpus in
one job:

* ``cosine_topk_join``  — exact brute-force top-k per query row: the
  correctness baseline.  Scale design: the (small) query side is
  shipped to every task once; each corpus partition computes a numpy
  score matrix and keeps only its LOCAL top-k per query, so the corpus
  is never shuffled and the only shuffle carries P·Q·k candidate rows
  (P = #partitions), ranked exactly in a final tiny window.
* ``cosine_neardup_pairs`` — all-pairs self-join above a threshold
  (semantic dedup); quadratic, for modest corpora or post-LSH
  verification of candidate pairs.
* ``build_ivf_index`` / ``ivf_probe`` — the ANN scale path, split into
  a BUILD step (assign every row to its nearest centroid cell — run
  once, materialized/partitioned by ``cell_id``) and a PROBE step that
  scans only the ``nprobe`` cells nearest the query.  Deterministic by
  construction (fixed centroid rows, exact argmax assignment), so it is
  oracle-checkable — unlike HNSW.  At 100 TB: centroids come from a
  sampled k-means (spark.ml KMeans), the build output is written
  bucketed/partitioned by ``cell_id``, and a probe is a
  partition-pruned scan of ~N·nprobe/C rows.
"""

from __future__ import annotations

from collections.abc import Iterator, Sequence

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from vector_db_handler_spark.functions.vector import cosine_score


#: Hard ceiling on the driver-collected side of the broadcast-analog
#: pattern.  100k rows x 128-dim float64 is ~100 MB on the driver and
#: per-task closure — already generous for a "small side"; anything
#: larger belongs in the distributed join paths (LSH / IVF / graph-ANN).
MAX_COLLECT_ROWS = 100_000

#: The written graph-ANN index builds its hierarchical coarse layer by
#: DEFAULT (r13 verdict: the flat entry slice was the navigability
#: bottleneck — a cluster with no entry node in the hash slice is
#: unreachable, measured recall@10 0.333 at the r13 probe dials).  The
#: coarse walk scans its whole ~N/8 layer when the layer is small
#: (coarse_entry_mod self-derives to 1 below ~8k layer nodes) and a
#: 1024-node slice of it at scale, so every cluster with a layer node
#: is navigable-to.  Pass ``layer_mod=None`` to write a flat-only
#: index.
DEFAULT_LAYER_MOD = 8


def _collect_matrix(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    max_rows: int = MAX_COLLECT_ROWS,
) -> tuple[list, np.ndarray]:
    """Driver-collect a SMALL vector relation (query side / centroids)
    into (ids, unit-normalized float64 matrix).  This is the broadcast
    pattern: the matrix ships once per task inside the serialized UDF,
    exactly like ``F.broadcast`` ships a dim table — only ever used for
    the side that is orders of magnitude smaller than the corpus.

    Guard: fails loudly past ``max_rows`` (default
    :data:`MAX_COLLECT_ROWS`) instead of silently inflating the driver
    and every task closure — the same spirit as the hot-bucket guards.
    The check runs BEFORE the vectors are collected (r13 ADVICE: a
    post-collect check only prevents the task-closure inflation, not
    the driver OOM itself): counting an id-only ``limit(max_rows+1)``
    projection costs one cheap job and never materializes the
    oversized relation on the driver.  Callers with a genuinely larger
    query side should use the distributed paths (LSH probe / IVF /
    graph-ANN batch serve)."""
    n_probe = df.select(id_col).limit(max_rows + 1).count()
    if n_probe > max_rows:
        raise ValueError(
            f"_collect_matrix: side has > max_rows={max_rows} rows; "
            "this driver-collected side must stay broadcast-sized — use a "
            "distributed path (lsh_probe_table / ivf_topk / "
            "knn_graph_beam_search_batch) for large query relations, or "
            "raise max_rows explicitly if the driver is provisioned for it."
        )
    rows = df.select(id_col, vec_col).collect()
    ids = [r[0] for r in rows]
    if not ids:  # empty side: 2-D empty matrix keeps consumers' numpy shapes valid
        return ids, np.zeros((0, 0), dtype=np.float64)
    m = np.array([np.asarray(r[1], dtype=np.float64) for r in rows])
    norms = np.sqrt(np.einsum("ij,ij->i", m, m))
    return ids, m / norms[:, None]


def cosine_topk_join(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    exclude_self: bool = True,
) -> DataFrame:
    """Exact top-k neighbours for every query row.

    Output: (query_id, neighbor_id, score, rank), ranked per query.

    Plan shape (100 TB posture): the query matrix is closed over
    driver-side (small side — the batch-KNN analog of a broadcast
    join); ``mapInPandas`` streams each corpus partition through numpy
    (one ``M @ Qᵀ`` per Arrow batch), folding a running LOCAL top-k per
    query.  Only P·Q·k candidate rows reach the final window — the
    corpus itself is scanned once and never shuffled, and per-query
    skew is structurally impossible (every partition emits ≤ k rows
    per query).
    """
    q_ids, q_mat = _collect_matrix(queries, id_col, vec_col)
    q_id_arr = np.array(q_ids)
    kk = int(k)
    empty_queries = len(q_ids) == 0

    out_schema = T.StructType(
        [
            T.StructField("query_id", corpus.schema[id_col].dataType),
            T.StructField("neighbor_id", corpus.schema[id_col].dataType),
            T.StructField("score", T.DoubleType()),
        ]
    )

    def local_topk(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # Running per-query top-k across all batches of this partition.
        # Candidates start EMPTY (no placeholder sentinel): every id in
        # the lexsort key comes from real corpus rows, so the id column
        # may be any orderable dtype (string ids included).
        best_scores = [np.empty(0, dtype=np.float64) for _ in range(len(q_ids))]
        best_ids: list = [np.empty(0, dtype=object) for _ in range(len(q_ids))]
        for pdf in batches:
            if len(pdf) == 0:
                continue
            m = np.array(list(pdf[vec_col]), dtype=np.float64)
            norms = np.sqrt(np.einsum("ij,ij->i", m, m))
            scores = (m / norms[:, None]) @ q_mat.T  # (n, Q)
            nid = pdf[id_col].to_numpy()
            for qi in range(len(q_ids)):
                s = scores[:, qi]
                if exclude_self:
                    keep_mask = nid != q_id_arr[qi]
                    s, ids_b = s[keep_mask], nid[keep_mask]
                else:
                    ids_b = nid
                cand_s = np.concatenate([best_scores[qi], s])
                cand_i = np.concatenate([best_ids[qi], ids_b])
                # Total order: score desc, neighbor_id asc (stable wrt
                # the final global window's ordering).
                order = np.lexsort((cand_i, -cand_s))[:kk]
                best_scores[qi] = cand_s[order]
                best_ids[qi] = cand_i[order]
        rows = [
            (q_id_arr[qi], best_ids[qi][j], float(best_scores[qi][j]))
            for qi in range(len(q_ids))
            for j in range(len(best_scores[qi]))
        ]
        yield pd.DataFrame(rows, columns=["query_id", "neighbor_id", "score"])

    if empty_queries:
        # no queries ⇒ no rows; keep the exact output schema
        return (
            corpus.sparkSession.createDataFrame([], out_schema)
            .withColumn("rank", F.lit(1).cast("int"))
            .limit(0)
        )
    cands = corpus.mapInPandas(local_topk, schema=out_schema)
    w = Window.partitionBy("query_id").orderBy(F.col("score").desc(), F.col("neighbor_id").asc())
    return (
        cands.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= kk)
        .select("query_id", "neighbor_id", F.round("score", 6).alias("score"), "rank")
    )


def cosine_neardup_pairs(
    corpus: DataFrame,
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_blocks: int = 8,
) -> DataFrame:
    """All pairs (i < j) with cosine ≥ threshold — semantic near-dup.
    EXACT, and fully distributed: nothing is ever collected to the
    driver.

    O(n²) compute is inherent to all-pairs, but neither pair
    MATERIALIZATION nor a driver-resident corpus matrix is: rows hash
    into ``n_blocks`` blocks; each row is replicated to the
    block-PAIRS containing its block (B copies — far cheaper than the
    N copies of a naive self-join's shuffle), and one
    ``applyInPandas`` per block-pair computes its cross/within numpy
    product, emitting only qualifying pairs.  Every unordered pair
    lives in exactly one block-pair group, so no dedup pass is needed.

    Scale dial: a group holds ≤ 2N/B rows — choose ``n_blocks`` so
    2N·dim·8/B fits an executor (B=160 puts a 10⁸×64-dim corpus at
    ~640 MB/group); shuffle volume is N·B vector rows against the
    self-join's N² pair rows.  Past ~10⁹ rows, exact all-pairs is the
    wrong query — use :func:`cosine_neardup_ann` (IVF-cell candidates,
    exact verify of candidates only; cost ∝ near-dup density, not N²).
    """
    thr = float(threshold)
    nb = int(n_blocks)
    id_type = corpus.schema[id_col].dataType.simpleString()
    out_schema = f"id1 {id_type}, id2 {id_type}, score double"

    blocked = corpus.select(
        F.col(id_col).alias("_id"),
        F.col(vec_col).alias("_vec"),
        F.pmod(F.hash(F.col(id_col)), F.lit(nb)).alias("_b"),
    )
    rep = blocked.select(
        "_id",
        "_vec",
        "_b",
        F.explode(F.array(*[F.lit(j) for j in range(nb)])).alias("_o"),
    ).select(
        "_id",
        "_vec",
        "_b",
        F.least("_b", "_o").alias("_p1"),
        F.greatest("_b", "_o").alias("_p2"),
    )

    def block_pairs(key, pdf: pd.DataFrame) -> pd.DataFrame:
        import numpy as _np
        import pandas as _pd

        p1, p2 = key
        if len(pdf) == 0:
            return _pd.DataFrame({"id1": [], "id2": [], "score": []})
        m = _np.array(list(pdf["_vec"]), dtype=_np.float64)
        norms = _np.sqrt(_np.einsum("ij,ij->i", m, m))
        mu = m / norms[:, None]
        ids = pdf["_id"].to_numpy()
        if p1 == p2:
            scores = mu @ mu.T
            rows, cols = _np.where(scores >= thr)
            keep = ids[rows] < ids[cols]  # i < j, dedups both orders
            return _pd.DataFrame(
                {
                    "id1": ids[rows][keep],
                    "id2": ids[cols][keep],
                    "score": scores[rows, cols][keep],
                }
            )
        m1, m2 = pdf["_b"].to_numpy() == p1, pdf["_b"].to_numpy() == p2
        scores = mu[m1] @ mu[m2].T
        rows, cols = _np.where(scores >= thr)
        a, b = ids[m1][rows], ids[m2][cols]
        lo = _np.where(a < b, a, b)
        return _pd.DataFrame(
            {
                "id1": lo,
                "id2": _np.where(a < b, b, a),
                "score": scores[rows, cols],
            }
        )

    return (
        rep.groupBy("_p1", "_p2")
        .applyInPandas(block_pairs, schema=out_schema)
        .select("id1", "id2", F.round("score", 6).alias("score"))
    )


def multi_assign_cells(
    corpus: DataFrame,
    centroids: DataFrame,
    nprobe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Multi-probe IVF assignment: each row → its ``nprobe`` nearest
    centroid cells (not just the argmax), emitted as one row per
    (vector, cell).  This is the candidate-generation side of
    ANN-based near-dup (:func:`cosine_neardup_ann`): vectors near a
    cell boundary land in BOTH adjacent cells, so cross-boundary
    near-dup pairs still share a cell.

    Zero-shuffle like :func:`assign_cells`: the centroid matrix rides
    in the closure, one Arrow-batched ``argpartition`` per batch, then
    a native ``explode`` (×nprobe row growth — the replication factor
    is nprobe, never the corpus or pair count).
    """
    c_ids, c_mat = _collect_matrix(centroids, id_col, vec_col)
    if not c_ids:
        return corpus.withColumn("cell_id", F.lit(-1).cast("long")).limit(0)
    order = np.argsort(np.array(c_ids), kind="stable")
    c_id_sorted = np.array(c_ids)[order]
    c_sorted = c_mat[order]
    np_probe = min(int(nprobe), len(c_ids))

    from pyspark.sql.functions import pandas_udf

    @pandas_udf("array<long>")
    def _nearest_cells(embs: pd.Series) -> pd.Series:
        if len(embs) == 0:
            return pd.Series([], dtype=object)
        m = np.array(list(embs), dtype=np.float64)
        norms = np.sqrt(np.einsum("ij,ij->i", m, m))
        norms[norms == 0.0] = 1.0
        scores = (m / norms[:, None]) @ c_sorted.T  # (n, C)
        # top-nprobe cells per row: argpartition then exact ordering
        # (score desc, cell id asc) within the partitioned prefix.
        part = np.argpartition(-scores, np_probe - 1, axis=1)[:, :np_probe]
        out = []
        for r in range(scores.shape[0]):
            cols = part[r]
            sel = np.lexsort((c_id_sorted[cols], -scores[r, cols]))
            out.append([int(c) for c in c_id_sorted[cols][sel]])
        return pd.Series(out)

    return corpus.select(
        id_col, vec_col, F.explode(_nearest_cells(F.col(vec_col))).alias("cell_id")
    )


def cosine_neardup_ann(
    corpus: DataFrame,
    centroids: DataFrame,
    threshold: float,
    nprobe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Semantic near-dup at scale: ANN candidate generation + exact
    verification — the 100 TB replacement for the exact all-pairs
    :func:`cosine_neardup_pairs` (whose O(N²) compute is inherent).

    Precondition: ``id_col`` is UNIQUE per row (r15 ADVICE note).  The
    ids-only candidate dedup re-attaches vectors by id equi-joins; a
    duplicated id would multiply re-attached rows where the old
    payload-carrying ``dropDuplicates`` collapsed them.

    Pipeline: multi-probe cell assignment (each vector → its
    ``nprobe`` nearest IVF cells) → candidate pairs = distinct (i < j)
    sharing ≥ 1 cell (an equi-join on ``cell_id``, the same banded
    shape as MinHash-LSH — never an all-pairs product) → exact cosine
    verification of candidates only, Arrow-batched numpy.

    Cost: assignment is one zero-shuffle scan; the candidate join
    shuffles N·nprobe (id, vec) rows on ``cell_id``; verification is
    |candidates|·dim — proportional to near-dup density, not N².
    Recall is bounded by cell geometry × nprobe (a pair whose members
    share no probed cell is missed); at fixture scale the driver
    oracle is EXACT all-pairs, so the registered query's green row IS
    a 100%-recall proof at that scale (same evidence pattern as
    ``media_neardup_pairs``).  Dial: more cells → cheaper verify,
    higher miss risk; higher nprobe → wider recall margin, ×nprobe
    candidate volume.
    """
    thr = float(threshold)
    id_type = corpus.schema[id_col].dataType.simpleString()

    # Candidate generation and dedup run on (cell_id, id) rows ONLY
    # (r15 optimization, guide §8/§2.3): the previous form carried
    # both embedding arrays through the cell join AND the
    # dropDuplicates exchange — at |candidates| ≫ N that shuffles the
    # heavy payload twice to make a decision that needs nothing but
    # ids.  Vectors are re-attached to the deduped id pairs by two
    # equi-joins against the corpus (N vector rows each, once), so
    # vector bytes now cross an exchange O(N) times instead of
    # O(|candidates|).
    assigned = multi_assign_cells(corpus, centroids, nprobe, id_col, vec_col)
    aid = assigned.select(F.col("cell_id"), F.col(id_col).alias("id1"))
    bid = assigned.select(F.col("cell_id"), F.col(id_col).alias("id2"))
    # Distinct BEFORE the (cheap) verify: a pair sharing both probed
    # cells must be scored once, not twice.
    cand_ids = (
        aid.join(bid, ["cell_id"])
        .filter(F.col("id1") < F.col("id2"))
        .select("id1", "id2")
        .dropDuplicates(["id1", "id2"])
    )
    cands = cand_ids.join(
        corpus.select(F.col(id_col).alias("id1"), F.col(vec_col).alias("v1")),
        "id1",
    ).join(
        corpus.select(F.col(id_col).alias("id2"), F.col(vec_col).alias("v2")),
        "id2",
    )

    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def _pair_cosine(v1: pd.Series, v2: pd.Series) -> pd.Series:
        if len(v1) == 0:
            return pd.Series(np.zeros(0, dtype=np.float64))
        m1 = np.array(list(v1), dtype=np.float64)
        m2 = np.array(list(v2), dtype=np.float64)
        dots = np.einsum("ij,ij->i", m1, m2)
        n1 = np.sqrt(np.einsum("ij,ij->i", m1, m1))
        n2 = np.sqrt(np.einsum("ij,ij->i", m2, m2))
        denom = n1 * n2
        denom[denom == 0.0] = 1.0
        return pd.Series(dots / denom)

    return (
        cands.withColumn("score", _pair_cosine(F.col("v1"), F.col("v2")))
        .filter(F.col("score") >= thr)
        .select("id1", "id2", F.round("score", 6).alias("score"))
    )


def assign_cells(
    corpus: DataFrame,
    centroids: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF coarse quantization: each row → nearest centroid by cosine
    (deterministic argmax, ties to lowest centroid id).

    Zero-shuffle design: the centroid matrix is closed over driver-side
    (small — the broadcast side) and the assignment is ONE Arrow-batched
    ``argmax(M_unit @ Cᵀ_unit)`` per batch — no crossJoin, no window, no
    shuffle at all.  Output: corpus columns + ``cell_id``.
    """
    c_ids, c_mat = _collect_matrix(centroids, id_col, vec_col)
    if not c_ids:
        # no centroids (empty corpus bootstrap): every row → cell -1;
        # on an empty corpus this is simply an empty result.
        return corpus.withColumn("cell_id", F.lit(-1).cast("long"))
    # Ties → lowest cell id: argmax returns the FIRST max, so order
    # columns by ascending cell id.
    order = np.argsort(np.array(c_ids), kind="stable")
    c_id_sorted = np.array(c_ids)[order]
    c_sorted = c_mat[order]

    from pyspark.sql.functions import pandas_udf

    @pandas_udf("long")
    def _nearest(embs: pd.Series) -> pd.Series:
        if len(embs) == 0:
            return pd.Series(np.zeros(0, dtype=np.int64))
        m = np.array(list(embs), dtype=np.float64)
        norms = np.sqrt(np.einsum("ij,ij->i", m, m))
        scores = (m / norms[:, None]) @ c_sorted.T
        return pd.Series(c_id_sorted[np.argmax(scores, axis=1)].astype(np.int64))

    return corpus.withColumn("cell_id", _nearest(F.col(vec_col)))


def build_ivf_index(
    corpus: DataFrame,
    centroids: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """BUILD step: materialize the cell assignment, clustered by cell.

    Run ONCE per corpus snapshot.  At 100 TB the result is written
    ``partitionBy('cell_id')`` (or bucketed) so every probe is a
    partition-pruned scan; here we repartition in-memory to the same
    effect for the fixture scale.
    """
    return assign_cells(corpus, centroids, id_col, vec_col).repartition(F.col("cell_id"))


def ivf_probe(
    indexed_corpus: DataFrame,
    centroids: DataFrame,
    query_vector: Sequence[float],
    k: int = 5,
    nprobe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """PROBE step: exact cosine top-k within the ``nprobe`` cells
    nearest the query.

    ``indexed_corpus`` is the output of :func:`build_ivf_index` (has
    ``cell_id``).  The probed cell ids are computed driver-side from
    the (small) centroid relation — the resulting ``cell_id IN (…)``
    predicate prunes partitions/row groups at planning time, so only
    ~N·nprobe/C rows are scanned and scored.  Recall is bounded by cell
    geometry; test it against the brute-force baseline.
    """
    c_ids, c_mat = _collect_matrix(centroids, id_col, vec_col)
    if not c_ids:  # empty centroid relation: nothing to probe
        probe = []
    else:
        q = np.asarray([float(v) for v in query_vector], dtype=np.float64)
        q = q / np.sqrt((q * q).sum())
        scores = c_mat @ q
        # Probe order: score desc, cell id asc (deterministic).
        order = np.lexsort((np.array(c_ids), -scores))
        probe = [int(np.array(c_ids)[i]) for i in order[: int(nprobe)]]

    return (
        indexed_corpus.filter(F.col("cell_id").isin(probe))
        .withColumn("score", cosine_score(F.col(vec_col), query_vector))
        .orderBy(F.col("score").desc(), F.col(id_col).asc())
        .limit(int(k))
        .select(F.col(id_col), F.col("cell_id"), F.round("score", 6).alias("score"))
    )


def ivf_topk(
    corpus: DataFrame,
    centroids: DataFrame,
    query_vector: Sequence[float],
    k: int = 5,
    nprobe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Convenience build+probe in one call (fixture-scale / tests).
    Production callers materialize :func:`build_ivf_index` once and
    issue :func:`ivf_probe` against it."""
    indexed = build_ivf_index(corpus, centroids, id_col, vec_col)
    return ivf_probe(indexed, centroids, query_vector, k, nprobe, id_col, vec_col)


def train_centroids(
    corpus: DataFrame,
    k: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
    max_iter: int = 10,
) -> DataFrame:
    """Learn IVF centroids with spark.ml KMeans (the production build
    path — fixed-stride centroid picking is only for oracle tests).

    Returns a centroid relation shaped like the corpus
    ((id_col, vec_col)) so it drops straight into
    :func:`build_ivf_index` / :func:`ivf_probe`.  At 100 TB, fit on a
    ``corpus.sample(...)`` — k-means converges on a sample and the
    assignment step already scans the full corpus exactly once.
    """
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    feats = corpus.select(
        array_to_vector(F.col(vec_col).cast("array<double>")).alias("features")
    )
    model = KMeans(k=int(k), seed=seed, maxIter=int(max_iter)).fit(feats)
    rows = [
        (i, [float(x) for x in center]) for i, center in enumerate(model.clusterCenters())
    ]
    return corpus.sparkSession.createDataFrame(rows, f"{id_col} long, {vec_col} array<double>")


def write_ivf_index(
    corpus: DataFrame,
    centroids: DataFrame,
    path: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> None:
    """Materialize the IVF index ON DISK, partitioned by ``cell_id``.

    This is the real 100 TB build artifact: a probe against the
    written table prunes entire cell directories at PLANNING time
    (``PartitionFilters`` on the scan), so I/O scales with
    nprobe/C — an in-memory ``repartition`` (see
    :func:`build_ivf_index`) cannot prune because every cached
    partition must still be inspected.
    """
    assign_cells(corpus, centroids, id_col, vec_col).write.mode("overwrite").partitionBy(
        "cell_id"
    ).parquet(path)


def append_ivf_index(
    new_rows: DataFrame,
    centroids: DataFrame,
    path: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> None:
    """Ingest-time IVF maintenance: assign ONLY the new vectors to the
    existing centroids and append them into their cell partitions —
    the ANN twin of ``dedup.append_lsh_index``.

    Cost is O(new batch): one zero-shuffle Arrow-batched assignment
    pass over the arrivals plus a partitioned append; the existing
    index is never read, and probes keep pruning at planning time
    because the partition layout is unchanged.  The centroids must be
    the ones the index was built with (they define the cell geometry);
    re-training centroids means a rebuild, not an append.  Cell files
    accumulate one per append batch — compaction is a per-cell-
    directory rewrite, same as the LSH band index.
    """
    assign_cells(new_rows, centroids, id_col, vec_col).write.mode("append").partitionBy(
        "cell_id"
    ).parquet(path)


def ivf_probe_table(
    spark,
    path: str,
    centroids: DataFrame,
    query_vector: Sequence[float],
    k: int = 5,
    nprobe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Probe a written IVF index (see :func:`write_ivf_index`): the
    ``cell_id IN (…)`` predicate becomes a partition filter — only the
    probed cells' files are opened."""
    return ivf_probe(
        spark.read.parquet(path), centroids, query_vector, k, nprobe, id_col, vec_col
    )


def mrl_prefix_rerank(
    emb: DataFrame,
    query: Sequence[float],
    prefix_dims: int = 16,
    shortlist: int = 50,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Matryoshka-style two-stage retrieval (Kusupati et al., NeurIPS
    '22): rank the WHOLE corpus by cosine over only the first
    ``prefix_dims`` dimensions, keep a ``shortlist``, rerank the
    shortlist with the full vector, return the top ``k``.

    MRL-trained embeddings front-load information into the leading
    dimensions, so the cheap stage reads prefix_dims/dim of the bytes
    (with a column layout that stores prefixes separately, that is a
    proportional scan+FLOP saving across the corpus) while the
    expensive full-dimension scoring touches only ``shortlist`` rows.
    The operator's CONTRACT is the two-stage pipeline itself — the
    oracle replays prefix-score → shortlist → rerank literally, so
    determinism comes from total ordering ((score desc, id asc) at
    both stages), not from any recall assumption about untrained
    fixture vectors.

    Scale shape: stage 1 is a scan + Arrow-batched score + TakeOrdered
    (no full sort — Spark's ORDER BY + LIMIT plans as a per-partition
    heap merged on the driver); stage 2 is ``shortlist`` rows,
    negligible."""
    qp = [float(v) for v in query[:prefix_dims]]
    pre = emb.select(
        F.col(id_col),
        F.col(vec_col),
        cosine_score(F.slice(F.col(vec_col), 1, prefix_dims), qp).alias("pre_raw"),
    )
    short = pre.orderBy(F.col("pre_raw").desc(), F.col(id_col).asc()).limit(shortlist)
    rer = short.select(
        F.col(id_col),
        F.round("pre_raw", 6).alias("pre_score"),
        cosine_score(F.col(vec_col), [float(v) for v in query]).alias("score_raw"),
    )
    return (
        rer.orderBy(F.col("score_raw").desc(), F.col(id_col).asc())
        .limit(k)
        .select(id_col, "pre_score", F.round("score_raw", 6).alias("score"))
    )


def mine_hard_triplets(
    corpus: DataFrame,
    queries: DataFrame,
    n_neg: int = 5,
    neg_start_rank: int = 30,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Contrastive-training triplet mining — the retrieval-side
    TRAINING-DATA operator: for every query (anchor), pair its best
    non-self neighbor (positive) with ``n_neg`` mid-ranked neighbors
    starting at ``neg_start_rank`` (HARD negatives: similar enough to
    be informative, far enough to be wrong — the standard recipe for
    embedding fine-tuning and reranker distillation; random negatives
    are too easy and top negatives are often unlabeled positives).

    Output: ``(query_id, pos_id, neg_id, pos_score, neg_score,
    margin)`` — one row per (anchor, negative), the layout a triplet-
    loss trainer consumes directly.

    Scale shape: everything downstream of ``cosine_topk_join`` (one
    corpus scan, per-partition local top-k, P·Q·k candidate rows, no
    corpus shuffle); the positive⋈negatives pairing joins two
    query-bounded relations (Q and Q·n_neg rows).  Determinism:
    ranks use the pinned (score DESC, id ASC) order; scores round
    once at emit."""
    if n_neg < 1 or neg_start_rank <= 1:
        raise ValueError(f"need n_neg >= 1 and neg_start_rank > 1, got {n_neg=} {neg_start_rank=}")
    ranked = cosine_topk_join(
        corpus,
        queries,
        k=neg_start_rank + n_neg - 1,
        id_col=id_col,
        vec_col=vec_col,
        exclude_self=True,
    )
    pos = ranked.filter(F.col("rank") == 1).select(
        "query_id",
        F.col("neighbor_id").alias("pos_id"),
        F.col("score").alias("_pos_raw"),
    )
    negs = ranked.filter(
        (F.col("rank") >= neg_start_rank)
        & (F.col("rank") < neg_start_rank + n_neg)
    ).select(
        "query_id",
        F.col("neighbor_id").alias("neg_id"),
        F.col("score").alias("_neg_raw"),
    )
    return (
        pos.join(negs, "query_id")
        .select(
            "query_id",
            "pos_id",
            "neg_id",
            F.round("_pos_raw", 6).alias("pos_score"),
            F.round("_neg_raw", 6).alias("neg_score"),
            # margin over the ROUNDED scores: the raw difference sits
            # on rounding boundaries whenever two dot products differ
            # only in summation order (numpy pairwise vs sequential),
            # while rounded inputs subtract identically everywhere.
            F.round(F.round("_pos_raw", 6) - F.round("_neg_raw", 6), 6).alias(
                "margin"
            ),
        )
    )


def ann_recall_report(
    corpus: DataFrame,
    centroids: DataFrame,
    queries: DataFrame,
    k: int = 10,
    nprobe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Index-quality evaluation harness: recall@k of the IVF probe
    against exact brute-force, per query — the measurement that
    decides nprobe/K tuning before an index ships (the faiss bench
    loop, as a first-class relational operator).  Both rankers are
    deterministic here, so the recall numbers are exact and
    hash-checkable, not Monte-Carlo estimates.

    Shape: the index is built ONCE and pinned; the exact ranking is
    the no-corpus-shuffle batch KNN; each query's probe touches only
    its ``nprobe`` cells.  The report is |queries| rows — evaluation
    cost scales with the query batch, the corpus is scanned once per
    ranker.  Output: ``(query_id, k, n_hits, recall)`` where
    ``n_hits = |exact@k ∩ approx@k|`` excluding self-matches on both
    sides."""
    # Size check BEFORE the collect (r13 ADVICE): an id-only
    # limit-count probe keeps an oversized query relation off the
    # driver entirely instead of raising after it materialized.
    n_probe = queries.select(id_col).limit(MAX_COLLECT_ROWS + 1).count()
    if n_probe > MAX_COLLECT_ROWS:
        raise ValueError(
            f"ann_recall_report: query relation exceeds {MAX_COLLECT_ROWS} rows; "
            "the recall harness drives one probe per query and is meant for "
            "eval-set-sized batches — sample the query relation down."
        )
    q_rows = queries.select(F.col(id_col), F.col(vec_col)).collect()
    if not q_rows:
        # no queries ⇒ an empty report, not a 0-denominator plan
        return corpus.sparkSession.createDataFrame(
            [], f"query_id {corpus.schema[id_col].dataType.simpleString()}, "
                "k long, n_hits long, recall double"
        )
    indexed = build_ivf_index(corpus, centroids, id_col, vec_col).localCheckpoint(
        eager=True
    )
    exact = cosine_topk_join(
        corpus, queries, k=k, id_col=id_col, vec_col=vec_col, exclude_self=True
    ).select("query_id", "neighbor_id")

    approx_parts = []
    for r in q_rows:
        qid, qv = r[0], list(r[1])
        per = (
            ivf_probe(indexed, centroids, qv, k + 1, nprobe, id_col, vec_col)
            .filter(F.col(id_col) != F.lit(qid))
            .orderBy(F.col("score").desc(), F.col(id_col).asc())
            .limit(k)
            .select(
                F.lit(qid).alias("query_id"), F.col(id_col).alias("neighbor_id")
            )
        )
        approx_parts.append(per)
    approx = approx_parts[0]
    for p in approx_parts[1:]:
        approx = approx.unionByName(p)

    hits = approx.join(exact, ["query_id", "neighbor_id"]).groupBy("query_id").agg(
        F.count(F.lit(1)).alias("n_hits")
    )
    base = queries.select(F.col(id_col).alias("query_id"))
    return (
        base.join(hits, "query_id", "left")
        .select(
            "query_id",
            F.lit(int(k)).cast("long").alias("k"),
            F.coalesce(F.col("n_hits"), F.lit(0)).cast("long").alias("n_hits"),
        )
        .withColumn(
            "recall", F.round(F.col("n_hits").cast("double") / F.lit(float(k)), 6)
        )
    )


def mrl_recall_curve(
    corpus: DataFrame,
    queries: DataFrame,
    prefixes: Sequence[int] = (8, 16, 32, 64),
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Matryoshka quality curve: recall@k of PREFIX-dimension cosine
    retrieval against full-dimension exact retrieval, per prefix
    length — the measurement that picks the cheapest usable prefix
    for `mrl_prefix_rerank`'s first stage (the MRL paper's accuracy/
    dimension trade-off, computed exactly on this corpus).

    Each prefix ranking is the same no-corpus-shuffle batch KNN over
    sliced vectors; recall aggregates over the query batch.  Output:
    ``(prefix_dim, n_queries, n_hits, recall)`` with
    ``recall = n_hits / (|queries|·k)`` — one row per prefix, exact
    integers behind the one reported division."""
    exact = cosine_topk_join(
        corpus, queries, k=k, id_col=id_col, vec_col=vec_col, exclude_self=True
    ).select("query_id", "neighbor_id")
    n_q = queries.count()
    if n_q == 0:
        # no queries ⇒ an empty curve, not a 0-denominator plan
        return corpus.sparkSession.createDataFrame(
            [], "prefix_dim long, n_queries long, n_hits long, recall double"
        )
    parts = []
    for p in prefixes:
        sliced_corpus = corpus.select(
            F.col(id_col), F.slice(F.col(vec_col), 1, int(p)).alias(vec_col)
        )
        sliced_queries = queries.select(
            F.col(id_col), F.slice(F.col(vec_col), 1, int(p)).alias(vec_col)
        )
        approx = cosine_topk_join(
            sliced_corpus,
            sliced_queries,
            k=k,
            id_col=id_col,
            vec_col=vec_col,
            exclude_self=True,
        ).select("query_id", "neighbor_id")
        hits = approx.join(exact, ["query_id", "neighbor_id"]).agg(
            F.count(F.lit(1)).alias("n_hits")
        )
        parts.append(hits.select(F.lit(int(p)).cast("long").alias("prefix_dim"), "n_hits"))
    out = parts[0]
    for part in parts[1:]:
        out = out.unionByName(part)
    denom = float(n_q * k)
    return out.select(
        "prefix_dim",
        F.lit(int(n_q)).cast("long").alias("n_queries"),
        F.coalesce(F.col("n_hits"), F.lit(0)).cast("long").alias("n_hits"),
        F.round(F.coalesce(F.col("n_hits"), F.lit(0)).cast("double") / denom, 6).alias(
            "recall"
        ),
    )


def _int_dot(a: Column, b: Column) -> Column:
    """Exact BIGINT dot product of two int8-domain bigint arrays —
    JVM-side higher-order functions (zip_with + aggregate), no UDF:
    |dot| ≤ dim·127² so the arithmetic never leaves long range."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0).cast("long"),
        lambda acc, v: acc + v,
    )


def knn_graph_nn_descent(
    emb: DataFrame,
    k: int = 8,
    iters: int = 2,
    kmeans_k: int = 8,
    rand_buckets: int | None = None,
    embedding_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """k-NN GRAPH construction without the N² pair join — cluster-
    local exact init + NN-descent refinement (Dong et al., WWW'11:
    "a neighbour of a neighbour is likely a neighbour").  The kNN
    graph is the substrate every graph-ANN index (HNSW/NSG/DiskANN)
    is built from, and the one artifact the ANN ladder here didn't
    yet construct: `cosine_topk_join` CAN emit it but does corpus ×
    corpus work; this builds it from bounded local work.

    * **Init**: exact top-k over the union of (a) each int8-k-means
      cell's pairs (`clustering.kmeans_int8_assign` — the registered,
      hash-checked Lloyd chain; quadratic only within a cell) and (b)
      DETERMINISTIC random pairs from md5-hash buckets of ~N/
      ``rand_buckets`` nodes each — the random component classic
      NN-descent starts from.  (b) is not decoration: cluster-local
      edges alone make the candidate graph CLOSED within cells —
      neighbours-of-neighbours can never cross a cell boundary, so
      refinement would be a no-op (measured: recall frozen at init).
      The hash-bucket edges seed cross-cell bridges the descent then
      sharpens; both sources are hash-derived, so the init replays
      exactly.
    * **Iterate** ``iters`` times: candidates = the UNDIRECTED
      graph's neighbours-of-neighbours ((2k)² per node, bounded),
      exact re-scoring, keep top-k by (dot DESC, id ASC) — pinned
      ties, so the whole build replays bit-for-bit: scores are exact
      INTEGER dot products in the int8 domain (the `quantized_knn`
      convention), making this the hash-checkable formulation of a
      classically float algorithm.

    Returns ``(vec_id, neighbor_id, rank, iscore)`` — up to k rows
    per node.  A node starts edgeless only if it is alone in BOTH its
    cell and its hash bucket (a 1-node corpus, in practice).

    Scale shape — BOTH init dials must grow with the corpus (r11
    ADVICE): the cluster leg is quadratic within a cell (bounded by
    ``N/kmeans_k``) and the hash leg is quadratic within a bucket
    (``N²/rand_buckets`` pairs total) — hold EITHER fixed while N
    grows and that leg goes quadratic.  ``rand_buckets=None`` (the
    default) derives the bucket count from the corpus size targeting
    ~64-node buckets, making the hash leg ~64·N pairs at any scale;
    pass an explicit value only when replay parity against a pinned
    oracle requires it (the registered query pins 64).  Each
    iteration is two self-joins of a ≤ N·k-row edge relation plus one
    qvec attach join and a per-node top-k window over ≤ (2k)²
    candidate rows; lineage truncated per iteration with
    ``localCheckpoint`` (same posture as PageRank/LPA).  No collect
    beyond the K-row k-means seeds and the one COUNT(*) the adaptive
    bucket dial needs."""
    from pyspark.sql import Window

    from vector_db_handler_spark.operators.clustering import (
        kmeans_int8_assign,
    )

    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    if iters < 0:
        raise ValueError(f"iters must be >= 0, got {iters}")
    if rand_buckets is None:
        # ~64 expected nodes per bucket: N²/buckets ≈ 64·N pairs.
        rand_buckets = max(16, emb.count() // 64)
    nodes = kmeans_int8_assign(
        emb, k=kmeans_k, embedding_col=embedding_col, id_col=id_col
    ).select(F.col(id_col).alias("nid"), "qvec", "cluster")

    from vector_db_handler_spark.functions.text import portable_hash60

    hbucket = F.pmod(
        portable_hash60(F.col("nid").cast("string")), F.lit(int(rand_buckets))
    )
    keyed = nodes.withColumn("hbucket", hbucket)
    w = Window.partitionBy("a").orderBy(F.col("d").desc(), F.col("b").asc())
    qa = nodes.select(F.col("nid").alias("a"), F.col("qvec").alias("va"))
    qb = nodes.select(F.col("nid").alias("b"), F.col("qvec").alias("vb"))

    def _pairs(key: str):
        xs = keyed.select(F.col("nid").alias("a"), key)
        ys = keyed.select(F.col("nid").alias("b"), key)
        return (
            xs.join(ys, key)
            .filter(F.col("a") != F.col("b"))
            .select("a", "b")
        )

    g = (
        _pairs("cluster")
        .unionByName(_pairs("hbucket"))
        .distinct()
        .join(qa, "a")
        .join(qb, "b")
        .select("a", "b", _int_dot(F.col("va"), F.col("vb")).alias("d"))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select("a", "b", "d")
        .localCheckpoint(eager=False)
    )
    for _ in range(int(iters)):
        und = (
            g.select("a", "b")
            .unionByName(
                g.select(F.col("b").alias("a"), F.col("a").alias("b"))
            )
            .distinct()
        )
        u2 = und.select(F.col("a").alias("m"), F.col("b").alias("c"))
        cand = (
            und.join(u2, und["b"] == u2["m"])
            .filter(F.col("c") != F.col("a"))
            .select("a", F.col("c").alias("b"))
            .unionByName(g.select("a", "b"))
            .distinct()
        )
        g = (
            cand.join(qa, "a")
            .join(qb, "b")
            .select("a", "b", _int_dot(F.col("va"), F.col("vb")).alias("d"))
            .withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") <= k)
            .select("a", "b", "d")
            .localCheckpoint(eager=False)
        )
    out_w = Window.partitionBy("a").orderBy(
        F.col("d").desc(), F.col("b").asc()
    )
    return g.select(
        F.col("a").alias(id_col),
        F.col("b").alias("neighbor_id"),
        F.row_number().over(out_w).cast("long").alias("rank"),
        F.col("d").cast("long").alias("iscore"),
    )


def _undirect_pairs(pairs: DataFrame) -> DataFrame:
    """Symmetrize an (a, b) edge relation (≤ N·k rows in, ≤ 2·N·k
    out) and truncate lineage — the shared substrate every beam walk
    expands over."""
    return (
        pairs.select("a", "b")
        .unionByName(pairs.select(F.col("b").alias("a"), F.col("a").alias("b")))
        .distinct()
        .localCheckpoint(eager=False)
    )


def _entry_slice_nodes(qn: DataFrame, entry_mod: int) -> DataFrame:
    """Deterministic hash-sampled entry nodes (1/entry_mod of ``qn``)
    with the r12-ADVICE fallback: an empty slice (tiny corpus /
    unlucky modulus) seeds from the (hash, id)-minimal node instead
    of silently searching from nothing."""
    from vector_db_handler_spark.functions.text import portable_hash60

    entries = qn.filter(
        F.pmod(portable_hash60(F.col("nid").cast("string")), F.lit(int(entry_mod)))
        == 0
    ).select("nid")
    if entries.isEmpty():
        entries = (
            qn.select(
                "nid",
                portable_hash60(F.col("nid").cast("string")).alias("eh"),
            )
            .orderBy(F.col("eh").asc(), F.col("nid").asc())
            .limit(1)
            .select("nid")
        )
    return entries


def _beam_hops_single(
    qn: DataFrame,
    und: DataFrame,
    qq: DataFrame,
    entries: DataFrame,
    beam: int,
    hops: int,
) -> DataFrame:
    """The single-query beam walk: score the entry nodes, then
    ``hops`` rounds of expand-over-``und`` → exact-integer re-score →
    keep top-``beam`` with pinned (d DESC, nid ASC) ties.  Returns
    the final (nid, d) beam.  ``qn`` is (nid, v int8-domain), ``qq``
    a 1-row (qv) broadcast, ``und`` an (a, b) symmetric edge set."""

    def _score(nodes: DataFrame) -> DataFrame:
        return (
            nodes.join(qn, "nid")
            .crossJoin(F.broadcast(qq))
            .select("nid", _int_dot(F.col("v"), F.col("qv")).alias("d"))
        )

    def _top_beam(nodes: DataFrame) -> DataFrame:
        # (d, nid) is a total order, so orderBy().limit() is
        # deterministic AND lowers to TakeOrderedAndProject —
        # distributed local top-k per partition, no single-partition
        # window over the entry slice.
        return (
            _score(nodes)
            .orderBy(F.col("d").desc(), F.col("nid").asc())
            .limit(int(beam))
            .localCheckpoint(eager=False)
        )

    beam_df = _top_beam(entries)
    for _ in range(int(hops)):
        cand = (
            beam_df.select("nid")
            .join(und, beam_df["nid"] == und["a"])
            .select(F.col("b").alias("nid"))
            .unionByName(beam_df.select("nid"))
            .distinct()
        )
        beam_df = _top_beam(cand)
    return beam_df


def _beam_hops_batch(
    qn: DataFrame,
    und: DataFrame,
    qq: DataFrame,
    entries: DataFrame,
    beam: int,
    hops: int,
) -> DataFrame:
    """The batch beam walk: every stage keyed by ``qid``, every
    top-beam a window PARTITIONED by query.  ``qq`` is (qid, qv),
    ``entries`` is (qid, nid) seed pairs.  Returns (qid, nid, d)."""
    w = Window.partitionBy("qid").orderBy(F.col("d").desc(), F.col("nid").asc())

    def _top_beam(pairs: DataFrame) -> DataFrame:
        scored = (
            pairs.join(qn, "nid")
            .join(F.broadcast(qq), "qid")
            .select("qid", "nid", _int_dot(F.col("v"), F.col("qv")).alias("d"))
        )
        return (
            scored.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") <= beam)
            .select("qid", "nid", "d")
            .localCheckpoint(eager=False)
        )

    beam_df = _top_beam(entries)
    for _ in range(int(hops)):
        cand = (
            beam_df.select("qid", "nid")
            .join(und, beam_df["nid"] == und["a"])
            .select("qid", F.col("b").alias("nid"))
            .unionByName(beam_df.select("qid", "nid"))
            .distinct()
        )
        beam_df = _top_beam(cand)
    return beam_df


def _beam_hops_batch_multi(
    qn: DataFrame,
    und: DataFrame,
    qq: DataFrame,
    entries: DataFrame,
    hops: int,
) -> DataFrame:
    """The multi-WIDTH batch beam walk (r16, `beam_recall_curve`'s
    fused serve): `_beam_hops_batch` with the beam width riding as a
    COLUMN (``bw``), so ONE walk advances every (query, width) chain
    per hop instead of one whole walk per width.  Row-identical to
    running `_beam_hops_batch` once per width: every stage — the
    expand join, the candidate distinct, the scored window, the
    ``rn <= bw`` cut — is keyed by (qid, bw), so each (qid, bw) slice
    evolves exactly as that width's standalone chain (widths never
    interact).  ``entries`` is (qid, bw, nid) seed triples.  Returns
    (qid, bw, nid, d)."""
    w = Window.partitionBy("qid", "bw").orderBy(
        F.col("d").desc(), F.col("nid").asc()
    )

    def _top_beam(triples: DataFrame) -> DataFrame:
        scored = (
            triples.join(qn, "nid")
            .join(F.broadcast(qq), "qid")
            .select(
                "qid", "bw", "nid", _int_dot(F.col("v"), F.col("qv")).alias("d")
            )
        )
        return (
            scored.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") <= F.col("bw"))
            .select("qid", "bw", "nid", "d")
            .localCheckpoint(eager=False)
        )

    beam_df = _top_beam(entries)
    for _ in range(int(hops)):
        cand = (
            beam_df.select("qid", "bw", "nid")
            .join(und, beam_df["nid"] == und["a"])
            .select("qid", "bw", F.col("b").alias("nid"))
            .unionByName(beam_df.select("qid", "bw", "nid"))
            .distinct()
        )
        beam_df = _top_beam(cand)
    return beam_df


def knn_graph_beam_search(
    emb: DataFrame,
    query_vec: list[float],
    k: int = 10,
    beam: int = 16,
    hops: int = 3,
    graph: DataFrame | None = None,
    graph_k: int = 8,
    graph_iters: int = 2,
    kmeans_k: int = 8,
    rand_buckets: int | None = None,
    entry_mod: int | None = None,
    embedding_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Graph-ANN QUERY path over the kNN graph
    :func:`knn_graph_nn_descent` builds — the search half of the
    HNSW/NSG/DiskANN family, in the same hash-replayable integer
    formulation: a deterministic hash-sampled entry scan seeds the
    beam, then ``hops`` rounds of expand-over-graph-edges →
    exact-integer re-score → keep top-``beam`` (pinned (d DESC, id
    ASC) ties), and the final beam's top-``k`` comes out as
    ``(vec_id, rank, iscore)``.

    Why this exists: the ANN ladder's index-side answers (IVF/PQ/SRP)
    prune by geometry; graph search prunes by CONNECTIVITY — it walks
    toward the query along edges whose quality the NN-descent build
    already paid for, reaching high recall with a handful of
    candidate evaluations per hop.  On 100 TB the entry scan is the
    only corpus-touching stage and it reads a deterministic
    1/``entry_mod`` hash slice (the md5 convention every sampler here
    shares); each hop touches ≤ ``beam·(graph_k·2 + 1)`` candidate
    rows joined against the quantized-vector relation — constant
    work, independent of corpus size.  A production deployment makes
    the entries hierarchical (a coarser graph layer, HNSW-style);
    ``entry_mod`` is the single dial standing in for that layer.
    ``entry_mod=None`` (the default) derives the dial from the
    corpus size targeting a ~1024-node expected entry slice
    (``max(1, N // 1024)``) so the slice stays CONSTANT-sized as N
    grows — the same self-deriving posture as ``rand_buckets``; pass
    an explicit value only when replay parity against a pinned
    oracle requires it (the registered query pins 32).  If the hash
    slice comes up EMPTY (tiny corpus, unlucky modulus) the entry
    falls back to the deterministic (hash, id)-minimal node instead
    of silently returning zero rows.

    Determinism: scores are exact BIGINT dots in the int8 domain
    (|dot| ≤ dim·127²), the sample is md5-derived, all ties pinned —
    so the whole search replays bit-for-bit cross-engine.

    ``graph=None`` builds the graph with the given dials;
    pass a prebuilt ``knn_graph_nn_descent`` output to amortize one
    build across many queries (the production shape).  ``k`` must be
    ≤ ``beam`` (the final answer is read off the beam)."""
    from pyspark.sql import Window

    from vector_db_handler_spark.operators.quantize import (
        max_abs_scale,
        quantize_int8,
    )

    if k < 1 or beam < 1 or k > beam:
        raise ValueError(f"need 1 <= k <= beam, got k={k} beam={beam}")
    if hops < 0:
        raise ValueError(f"hops must be >= 0, got {hops}")
    if entry_mod is not None and entry_mod < 1:
        raise ValueError(f"entry_mod must be >= 1, got {entry_mod}")
    if entry_mod is None:
        # ~1024 expected entry nodes: the slice stays constant-sized
        # as the corpus grows (mirrors the rand_buckets derivation).
        entry_mod = max(1, emb.count() // 1024)

    scale = max_abs_scale(emb, embedding_col)
    qn = quantize_int8(emb, embedding_col=embedding_col, id_col=id_col).select(
        F.col(id_col).alias("nid"), F.col("qvec").alias("v")
    )
    # Quantize the query with the SAME corpus scale, in-row (the
    # _QUANT_CLAMP convention shared with quantized_knn / k-means).
    qlit = F.array(*[F.lit(float(x)) for x in query_vec])
    qq = scale.select(
        F.transform(
            qlit,
            lambda x: F.greatest(
                F.lit(-127.0),
                F.least(
                    F.lit(127.0),
                    F.floor(F.lit(127.0) * x / F.col("s") + F.lit(0.5)),
                ),
            ).cast("long"),
        ).alias("qv")
    )

    if graph is None:
        graph = knn_graph_nn_descent(
            emb,
            k=graph_k,
            iters=graph_iters,
            kmeans_k=kmeans_k,
            rand_buckets=rand_buckets,
            embedding_col=embedding_col,
            id_col=id_col,
        )
    und = _undirect_pairs(
        graph.select(
            F.col(id_col).alias("a"), F.col("neighbor_id").alias("b")
        )
    )
    entries = _entry_slice_nodes(qn, entry_mod)
    beam_df = _beam_hops_single(qn, und, qq, entries, beam, hops)
    w = Window.orderBy(F.col("d").desc(), F.col("nid").asc())
    return (
        beam_df.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select(
            F.col("nid").alias(id_col),
            "rank",
            F.col("d").cast("long").alias("iscore"),
        )
    )


def knn_graph_beam_search_batch(
    emb: DataFrame,
    queries: DataFrame,
    k: int = 5,
    beam: int = 16,
    hops: int = 3,
    graph: DataFrame | None = None,
    graph_k: int = 5,
    graph_iters: int = 2,
    kmeans_k: int = 8,
    rand_buckets: int | None = None,
    entry_mod: int | None = None,
    embedding_col: str = "embedding",
    id_col: str = "vec_id",
    query_id_col: str = "query_id",
    query_vec_col: str = "embedding",
) -> DataFrame:
    """BATCH graph-ANN serve: :func:`knn_graph_beam_search` for a
    whole queries relation in one job — the production shape (build
    the kNN graph once, answer every query against it; the single-
    query form exists for oracle pinning).  Queries are quantized
    with the CORPUS scale (the shared clamp convention), every stage
    is keyed by ``query_id``, and all top-beam selections are windows
    PARTITIONED by query — per-query work is identical to the
    single-query operator and the whole batch shares one entry-slice
    scan.

    Returns ``(query_id, neighbor_id, rank, iscore)``.

    Scale shape: the entry stage scores (N/entry_mod)·Q pairs with
    the Q-row quantized-query relation broadcast; each hop joins the
    ≤ Q·beam-row beam against the undirected edge relation and
    re-scores ≤ Q·beam·(2·graph_k+1) candidates.  Beam windows
    partition by query, so no single-partition sorts appear anywhere;
    ``entry_mod=None`` self-derives ``max(1, N // 1024)`` so the
    slice stays constant-sized as N grows (explicit values are for
    oracle-pinned replays), ``Q`` scales with the broadcast budget
    (past that, the qq join flips to a shuffle join untouched).
    An empty hash slice falls back to the (hash, id)-minimal node,
    same as the single-query path."""
    from pyspark.sql import Window

    from vector_db_handler_spark.operators.quantize import (
        max_abs_scale,
        quantize_int8,
    )

    if k < 1 or beam < 1 or k > beam:
        raise ValueError(f"need 1 <= k <= beam, got k={k} beam={beam}")
    if hops < 0:
        raise ValueError(f"hops must be >= 0, got {hops}")
    if entry_mod is not None and entry_mod < 1:
        raise ValueError(f"entry_mod must be >= 1, got {entry_mod}")
    if entry_mod is None:
        entry_mod = max(1, emb.count() // 1024)

    scale = max_abs_scale(emb, embedding_col)
    qn = quantize_int8(emb, embedding_col=embedding_col, id_col=id_col).select(
        F.col(id_col).alias("nid"), F.col("qvec").alias("v")
    )
    clamp = lambda x: F.greatest(
        F.lit(-127.0),
        F.least(F.lit(127.0), F.floor(F.lit(127.0) * x / F.col("s") + F.lit(0.5))),
    ).cast("long")
    qq = (
        queries.select(
            F.col(query_id_col).alias("qid"), F.col(query_vec_col).alias("qv_raw")
        )
        .crossJoin(F.broadcast(scale))
        .select("qid", F.transform(F.col("qv_raw"), clamp).alias("qv"))
    )

    if graph is None:
        graph = knn_graph_nn_descent(
            emb,
            k=graph_k,
            iters=graph_iters,
            kmeans_k=kmeans_k,
            rand_buckets=rand_buckets,
            embedding_col=embedding_col,
            id_col=id_col,
        )
    und = _undirect_pairs(
        graph.select(
            F.col(id_col).alias("a"), F.col("neighbor_id").alias("b")
        )
    )
    entries = _entry_slice_nodes(qn, entry_mod).crossJoin(qq.select("qid"))
    beam_df = _beam_hops_batch(qn, und, qq, entries, beam, hops)
    w = Window.partitionBy("qid").orderBy(F.col("d").desc(), F.col("nid").asc())
    return (
        beam_df.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select(
            F.col("qid").alias(query_id_col),
            F.col("nid").alias("neighbor_id"),
            "rank",
            F.col("d").cast("long").alias("iscore"),
        )
    )


def knn_graph_beam_search_filtered(
    emb: DataFrame,
    query_vec: list[float],
    predicate: str,
    k: int = 10,
    beam: int = 16,
    hops: int = 3,
    exact_threshold: int = 1024,
    graph: DataFrame | None = None,
    graph_k: int = 8,
    graph_iters: int = 2,
    kmeans_k: int = 8,
    rand_buckets: int | None = None,
    entry_mod: int | None = None,
    embedding_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """FILTERED graph-ANN search — the payload-predicate + beam
    composition a vector DB serves for H14-style "search within these
    docs" queries (Qdrant's filtered HNSW; the reference exposes it as
    `search_query_on_doc`, app/core/document_ingestor.py:366-441).
    ``predicate`` is a SQL boolean expression over the corpus columns
    (e.g. ``"label = 3"``), kept as a string so registered rows and
    DuckDB twins replay it verbatim.

    Two regimes, dispatched on the passing-set size — the same switch
    production filtered-HNSW implementations make, because a graph
    walk cannot navigate a near-empty admissible set:

    * **Selective** (``|passing| <= exact_threshold``): exact integer
      top-k over the passing rows only.  The predicate reaches the
      parquet scan (pushdown), the passing side is tiny by the
      branch's own condition, and the result EQUALS
      post-filtered-exact BY CONSTRUCTION — vectors are quantized with
      the FULL-corpus scale (the index geometry), so scores are
      bit-identical to the unfiltered exact ranking's.
    * **Broad**: the standard beam walk routes over the FULL graph
      (filtering the ROUTE starves navigation — the known
      filtered-HNSW failure mode), and the answer is the top-k
      PASSING nodes over the union of every hop's beam; the beam
      gives k-headroom the way ef > k does in HNSW post-filtering,
      and dense predicates keep the union well-stocked.

    The dispatch count is one id-only aggregate on the filtered scan.
    Returns ``(vec_id, rank, iscore)``; deterministic in both
    branches (exact integer scores, pinned ties, md5 entry slice)."""
    from pyspark.sql import Window

    from vector_db_handler_spark.operators.quantize import (
        max_abs_scale,
        quantize_int8,
    )

    if k < 1 or beam < 1 or k > beam:
        raise ValueError(f"need 1 <= k <= beam, got k={k} beam={beam}")
    if hops < 0:
        raise ValueError(f"hops must be >= 0, got {hops}")
    if exact_threshold < 0:
        raise ValueError(
            f"exact_threshold must be >= 0, got {exact_threshold}"
        )
    if not isinstance(predicate, str) or not predicate.strip():
        raise ValueError("predicate must be a non-empty SQL boolean string")

    passing = emb.filter(F.expr(predicate))
    scale = max_abs_scale(emb, embedding_col)
    qlit = F.array(*[F.lit(float(x)) for x in query_vec])
    qq = scale.select(
        F.transform(
            qlit,
            lambda x: F.greatest(
                F.lit(-127.0),
                F.least(
                    F.lit(127.0),
                    F.floor(F.lit(127.0) * x / F.col("s") + F.lit(0.5)),
                ),
            ).cast("long"),
        ).alias("qv")
    )
    w = Window.orderBy(F.col("d").desc(), F.col("nid").asc())

    # Bounded dispatch probe (the on_ids probe's idiom): the switch
    # only needs to know WHETHER the passing set exceeds the
    # threshold, so cap the count job at threshold+1 rows instead of
    # scanning the full passing set — with a dense predicate at 100 TB
    # the full count would cost a complete filtered scan before the
    # real query even starts.
    n_pass = passing.select(id_col).limit(exact_threshold + 1).count()
    if n_pass <= exact_threshold:
        # Selective branch: exact integer ranking of the passing set,
        # quantized with the full-corpus scale (== post-filtered-exact).
        qpass = quantize_int8(
            passing, embedding_col=embedding_col, id_col=id_col, scale=scale
        ).select(F.col(id_col).alias("nid"), F.col("qvec").alias("v"))
        scored = qpass.crossJoin(F.broadcast(qq)).select(
            "nid", _int_dot(F.col("v"), F.col("qv")).alias("d")
        )
        return (
            scored.withColumn("rank", F.row_number().over(w).cast("long"))
            .filter(F.col("rank") <= k)
            .select(
                F.col("nid").alias(id_col),
                "rank",
                F.col("d").cast("long").alias("iscore"),
            )
        )

    # Broad branch: route over the full graph, admit passing nodes
    # from every hop's beam.
    if entry_mod is None:
        entry_mod = max(1, emb.count() // 1024)
    if entry_mod < 1:
        raise ValueError(f"entry_mod must be >= 1, got {entry_mod}")
    qn = quantize_int8(emb, embedding_col=embedding_col, id_col=id_col).select(
        F.col(id_col).alias("nid"), F.col("qvec").alias("v")
    )
    if graph is None:
        graph = knn_graph_nn_descent(
            emb,
            k=graph_k,
            iters=graph_iters,
            kmeans_k=kmeans_k,
            rand_buckets=rand_buckets,
            embedding_col=embedding_col,
            id_col=id_col,
        )
    und = _undirect_pairs(
        graph.select(F.col(id_col).alias("a"), F.col("neighbor_id").alias("b"))
    )
    entries = _entry_slice_nodes(qn, entry_mod)

    def _score(nodes: DataFrame) -> DataFrame:
        return (
            nodes.join(qn, "nid")
            .crossJoin(F.broadcast(qq))
            .select("nid", _int_dot(F.col("v"), F.col("qv")).alias("d"))
        )

    def _top_beam(nodes: DataFrame) -> DataFrame:
        return (
            _score(nodes)
            .orderBy(F.col("d").desc(), F.col("nid").asc())
            .limit(int(beam))
            .localCheckpoint(eager=False)
        )

    beam_df = _top_beam(entries)
    seen = [beam_df]
    for _ in range(int(hops)):
        cand = (
            beam_df.select("nid")
            .join(und, beam_df["nid"] == und["a"])
            .select(F.col("b").alias("nid"))
            .unionByName(beam_df.select("nid"))
            .distinct()
        )
        beam_df = _top_beam(cand)
        seen.append(beam_df)
    union = seen[0]
    for b in seen[1:]:
        union = union.unionByName(b)
    admitted = (
        union.groupBy("nid")
        .agg(F.max("d").alias("d"))
        .join(
            passing.select(F.col(id_col).alias("nid")),
            "nid",
            "leftsemi",
        )
    )
    return (
        admitted.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select(
            F.col("nid").alias(id_col),
            "rank",
            F.col("d").cast("long").alias("iscore"),
        )
    )


def _coarse_layer_edges(
    qn: DataFrame, und: DataFrame, lay: DataFrame, coarse_k: int
) -> DataFrame:
    """Coarse-layer edges DERIVED from the base graph: candidate pairs
    are the undirected base graph's 1-hop ∪ 2-hop connections
    restricted to layer×layer (the standard coarsening — sampled nodes
    inherit shortcut edges through dropped intermediates), exactly
    re-scored in the int8 integer domain, top-``coarse_k`` per node
    with pinned (d DESC, b ASC) ties.  The 2-hop expansion starts FROM
    layer nodes only, so it touches ≤ |layer|·(2·graph_k)² pairs —
    linear in N at fixed layer_mod.  Shared by the in-memory
    hierarchical search and the written index's coarse-layer build."""
    lay_a = lay.select(F.col("nid").alias("a"))
    lay_b = lay.select(F.col("nid").alias("b"))
    und_from_layer = und.join(lay_a, "a", "leftsemi")
    two_hop = (
        und_from_layer.alias("u1")
        .join(und.alias("u2"), F.col("u1.b") == F.col("u2.a"))
        .filter(F.col("u1.a") != F.col("u2.b"))
        .select(F.col("u1.a").alias("a"), F.col("u2.b").alias("b"))
    )
    cpairs = (
        und_from_layer.select("a", "b")
        .unionByName(two_hop)
        .distinct()
        .join(lay_b, "b", "leftsemi")
    )
    qa = qn.select(F.col("nid").alias("a"), F.col("v").alias("va"))
    qb = qn.select(F.col("nid").alias("b"), F.col("v").alias("vb"))
    w_re = Window.partitionBy("a").orderBy(F.col("d").desc(), F.col("b").asc())
    return (
        cpairs.join(qa, "a")
        .join(qb, "b")
        .select("a", "b", _int_dot(F.col("va"), F.col("vb")).alias("d"))
        .withColumn("rn", F.row_number().over(w_re))
        .filter(F.col("rn") <= coarse_k)
        .select("a", "b")
        .localCheckpoint(eager=False)
    )


def knn_graph_hierarchical_search(
    emb: DataFrame,
    query_vec: list[float],
    k: int = 10,
    beam: int = 16,
    hops: int = 3,
    layer_mod: int = 8,
    coarse_k: int = 5,
    coarse_beam: int | None = None,
    coarse_hops: int = 1,
    coarse_entry_mod: int | None = None,
    graph: DataFrame | None = None,
    graph_k: int = 8,
    graph_iters: int = 2,
    kmeans_k: int = 8,
    rand_buckets: int | None = None,
    embedding_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """HIERARCHICAL graph-ANN search — the coarse entry LAYER that
    :func:`knn_graph_beam_search` explicitly defers (its docstring:
    "a production deployment makes the entries hierarchical;
    entry_mod is the single dial standing in for that layer").  The
    HNSW construction (Malkov & Yashunin, TPAMI'18) searches a small
    upper layer first and uses its result as the entry point of the
    layer below; this is that two-level descent in the repo's
    hash-replayable integer formulation:

    * **Layer membership** is deterministic: nodes whose md5-hash ≡ 0
      (mod ``layer_mod``) form the coarse layer (≈ N/layer_mod nodes)
      — the same coin-flip-by-hash HNSW uses for level assignment,
      derandomized.  An empty layer (tiny corpus) falls back to the
      (hash, id)-minimal node.
    * **Coarse edges are DERIVED from the base graph**, not rebuilt:
      candidate pairs are the base graph's 1-hop ∪ 2-hop connections
      restricted to layer×layer (the standard coarsening — sampled
      nodes inherit shortcut edges through dropped intermediates),
      exactly re-scored in the int8 integer domain, top-``coarse_k``
      per node with pinned ties.  No second NN-descent chain, no
      all-pairs stage: the 2-hop expansion starts FROM layer nodes
      only, so it touches ≤ (N/layer_mod)·(2·graph_k)² pairs.
    * **Search**: beam-walk the coarse layer from its own hash
      entry slice (``coarse_entry_mod``, self-derived to a ~1024-node
      expected slice of the LAYER when None), then seed the base-layer
      beam with the coarse winners and walk ``hops`` rounds as usual.

    Why it matters at 100 TB: the flat search's corpus-touching entry
    scan reads N/entry_mod rows; here it reads
    N/(layer_mod·coarse_entry_mod) — layer_mod× fewer for the same
    expected slice quality, because the coarse walk (constant work)
    replaces brute entry luck with navigation.  More levels = apply
    the same construction recursively on the layer; two levels
    already demonstrate the recursion step.

    Determinism: every stage is md5-hash membership + exact BIGINT
    dots + pinned ties, so the whole descent replays bit-for-bit
    cross-engine.  Returns ``(vec_id, rank, iscore)`` like the flat
    search.  Cite: reference delegates hierarchy to Qdrant's HNSW
    (app/core/document_ingestor.py:332-364)."""
    from pyspark.sql import Window

    from vector_db_handler_spark.functions.text import portable_hash60
    from vector_db_handler_spark.operators.quantize import (
        max_abs_scale,
        quantize_int8,
    )

    if k < 1 or beam < 1 or k > beam:
        raise ValueError(f"need 1 <= k <= beam, got k={k} beam={beam}")
    if hops < 0 or coarse_hops < 0:
        raise ValueError(
            f"hops must be >= 0, got hops={hops} coarse_hops={coarse_hops}"
        )
    if layer_mod < 1:
        raise ValueError(f"layer_mod must be >= 1, got {layer_mod}")
    if coarse_k < 1:
        raise ValueError(f"coarse_k must be >= 1, got {coarse_k}")
    if coarse_beam is None:
        coarse_beam = beam
    if coarse_beam < 1:
        raise ValueError(f"coarse_beam must be >= 1, got {coarse_beam}")

    scale = max_abs_scale(emb, embedding_col)
    qn = quantize_int8(emb, embedding_col=embedding_col, id_col=id_col).select(
        F.col(id_col).alias("nid"), F.col("qvec").alias("v")
    )
    qlit = F.array(*[F.lit(float(x)) for x in query_vec])
    qq = scale.select(
        F.transform(
            qlit,
            lambda x: F.greatest(
                F.lit(-127.0),
                F.least(
                    F.lit(127.0),
                    F.floor(F.lit(127.0) * x / F.col("s") + F.lit(0.5)),
                ),
            ).cast("long"),
        ).alias("qv")
    )

    if graph is None:
        graph = knn_graph_nn_descent(
            emb,
            k=graph_k,
            iters=graph_iters,
            kmeans_k=kmeans_k,
            rand_buckets=rand_buckets,
            embedding_col=embedding_col,
            id_col=id_col,
        )
    und = _undirect_pairs(
        graph.select(F.col(id_col).alias("a"), F.col("neighbor_id").alias("b"))
    )

    # --- coarse layer: hash membership with the shared fallback ----------
    lay = qn.filter(
        F.pmod(
            portable_hash60(F.col("nid").cast("string")), F.lit(int(layer_mod))
        )
        == 0
    )
    if lay.isEmpty():
        lay = (
            qn.select(
                "nid",
                "v",
                portable_hash60(F.col("nid").cast("string")).alias("eh"),
            )
            .orderBy(F.col("eh").asc(), F.col("nid").asc())
            .limit(1)
            .select("nid", "v")
        )
        lay = lay.localCheckpoint(eager=False)

    cedges = _coarse_layer_edges(qn, und, lay, coarse_k)
    cund = _undirect_pairs(cedges)

    # --- two-level descent ------------------------------------------------
    if coarse_entry_mod is None:
        coarse_entry_mod = max(1, lay.count() // 1024)
    if coarse_entry_mod < 1:
        raise ValueError(
            f"coarse_entry_mod must be >= 1, got {coarse_entry_mod}"
        )
    centry = _entry_slice_nodes(lay.select("nid", "v"), coarse_entry_mod)
    coarse_beam_df = _beam_hops_single(
        lay, cund, qq, centry, coarse_beam, coarse_hops
    )
    seeds = coarse_beam_df.select("nid")
    beam_df = _beam_hops_single(qn, und, qq, seeds, beam, hops)
    w = Window.orderBy(F.col("d").desc(), F.col("nid").asc())
    return (
        beam_df.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select(
            F.col("nid").alias(id_col),
            "rank",
            F.col("d").cast("long").alias("iscore"),
        )
    )


def write_knn_graph_index(
    emb: DataFrame,
    path: str,
    graph_k: int = 8,
    graph_iters: int = 2,
    kmeans_k: int = 8,
    rand_buckets: int | None = None,
    entry_mod: int | None = None,
    layer_mod: int | None = DEFAULT_LAYER_MOD,
    coarse_k: int = 5,
    embedding_col: str = "embedding",
    id_col: str = "vec_id",
) -> None:
    """Materialize the graph-ANN index ON DISK — write/probe/append
    parity with the LSH (`dedup.write_lsh_index`) and IVF
    (`write_ivf_index`) stores, completing the index-persistence
    story for the graph family.  Artifacts under ``path``:

    * ``scale/``   — the 1-row max-abs quantization scale.  The scale
      is part of the index GEOMETRY (like IVF centroids): appends
      quantize new vectors with the stored scale, never re-derive it.
    * ``meta/``    — 1 row of build dials (entry_mod, graph_k, dim…)
      so probes reconstruct the search configuration.
    * ``vectors/`` — (nid, v int8-domain BIGINT array), PARTITIONED BY
      the ``entry`` flag (int 0/1 — partition-type
      inference keeps integers typed; booleans read back as strings):
      the entry slice (hash ≡ 0 mod entry_mod,
      frozen at build like an HNSW top layer) lives in its own
      partition directory, so a probe's entry scan prunes to
      1/entry_mod of the corpus at PLANNING time instead of filtering
      a full scan.
    * ``edges/``   — the NN-descent graph (a, b, d), sorted by ``a``
      within files so per-hop candidate joins benefit from row-group
      min-max pruning.
    * ``coarse_edges/`` (only when ``layer_mod`` is set) — the
      hierarchical coarse layer PRECOMPUTED at build time (the
      production shape `knn_graph_hierarchical_search` derives
      per-query): md5 layer membership, edges from the base graph's
      1∪2-hop closure restricted to layer×layer, re-scored
      top-``coarse_k``.  :func:`knn_graph_probe_table_hier` walks it.

    Build cost is the NN-descent build + one corpus write (+ one
    layer-linear coarsening pass when ``layer_mod`` is set); probes
    are :func:`knn_graph_probe_table` / `_hier` and cost
    corpus-independent work past the pruned entry scan."""
    if entry_mod is None:
        entry_mod = max(1, emb.count() // 1024)
    if entry_mod < 1:
        raise ValueError(f"entry_mod must be >= 1, got {entry_mod}")
    # Fail FAST on an empty corpus — before any artifact directory is
    # written (a torn half-index is worse than no index).
    first = emb.select(embedding_col).first()
    if first is None:
        raise ValueError(
            "write_knn_graph_index: corpus is empty — an index needs at "
            "least one vector (the scale, entry slice and graph are all "
            "corpus-derived)"
        )
    dim = len(first[0])

    from vector_db_handler_spark.functions.text import portable_hash60
    from vector_db_handler_spark.operators.quantize import (
        max_abs_scale,
        quantize_int8,
    )

    spark = emb.sparkSession
    scale = max_abs_scale(emb, embedding_col).localCheckpoint(eager=True)
    scale.write.mode("overwrite").parquet(f"{path}/scale")

    qn = quantize_int8(
        emb, embedding_col=embedding_col, id_col=id_col, scale=scale
    ).select(F.col(id_col).alias("nid"), F.col("qvec").alias("v"))
    qn.withColumn(
        "entry",
        (
            F.pmod(
                portable_hash60(F.col("nid").cast("string")),
                F.lit(int(entry_mod)),
            )
            == 0
        ).cast("int"),
    ).write.mode("overwrite").partitionBy("entry").parquet(f"{path}/vectors")
    # Entry-slice size, read back from the pruned entry=1 partition
    # (one tiny build-time job).  Stored in meta/ so every probe shape
    # can skip its per-serve emptiness check (appends only ever ADD
    # entry nodes, so n_entry > 0 stays true for the store's lifetime).
    n_entry = (
        spark.read.parquet(f"{path}/vectors")
        .filter(F.col("entry") == 1)
        .count()
    )

    n_layer = -1
    graph = knn_graph_nn_descent(
        emb,
        k=graph_k,
        iters=graph_iters,
        kmeans_k=kmeans_k,
        rand_buckets=rand_buckets,
        embedding_col=embedding_col,
        id_col=id_col,
    )
    (
        graph.select(
            F.col(id_col).alias("a"),
            F.col("neighbor_id").alias("b"),
            F.col("iscore").alias("d"),
        )
        .sortWithinPartitions("a")
        .write.mode("overwrite")
        .parquet(f"{path}/edges")
    )
    if layer_mod is not None:
        if layer_mod < 1 or coarse_k < 1:
            raise ValueError(
                f"need layer_mod >= 1 and coarse_k >= 1, got "
                f"layer_mod={layer_mod} coarse_k={coarse_k}"
            )
        und = _undirect_pairs(
            graph.select(
                F.col(id_col).alias("a"), F.col("neighbor_id").alias("b")
            )
        )
        lay = qn.filter(
            F.pmod(
                portable_hash60(F.col("nid").cast("string")),
                F.lit(int(layer_mod)),
            )
            == 0
        )
        # The HASH-derived layer's node count is part of the index
        # GEOMETRY: probes derive their default coarse_entry_mod from
        # it and skip their own layer-count/emptiness jobs on the
        # serve path (r14 verdict #3).  0 records that the min-hash
        # single-node FALLBACK layer was written, so probes re-derive
        # the same fallback instead of walking an empty hash layer.
        n_layer = lay.count()
        if n_layer == 0:
            lay = (
                qn.select(
                    "nid",
                    "v",
                    portable_hash60(F.col("nid").cast("string")).alias("eh"),
                )
                .orderBy(F.col("eh").asc(), F.col("nid").asc())
                .limit(1)
                .select("nid", "v")
            )
        _coarse_layer_edges(qn, und, lay, coarse_k).sortWithinPartitions(
            "a"
        ).write.mode("overwrite").parquet(f"{path}/coarse_edges")

    spark.createDataFrame(
        [
            (
                int(entry_mod),
                int(graph_k),
                int(graph_iters),
                int(kmeans_k),
                -1 if rand_buckets is None else int(rand_buckets),
                int(dim),
                -1 if layer_mod is None else int(layer_mod),
                int(coarse_k),
                int(n_layer),
                int(n_entry),
            )
        ],
        "entry_mod long, graph_k long, graph_iters long, kmeans_k long,"
        " rand_buckets long, dim long, layer_mod long, coarse_k long,"
        " n_layer long, n_entry long",
    ).write.mode("overwrite").parquet(f"{path}/meta")


def _check_index_dim(spark, path: str, query_dim: int, what: str):
    """Validate a probe's query dimensionality against the ``dim``
    recorded in the written index's ``meta/`` (r13 ADVICE: without
    this, ``zip_with`` null-pads a wrong-dimension query, every score
    goes NULL, and the probe silently returns id-ordered rows instead
    of erroring).  Returns the meta ROW so callers reuse the read
    instead of re-opening meta/ for other dials."""
    meta = spark.read.parquet(f"{path}/meta").first()
    dim = int(meta["dim"])
    if dim != int(query_dim):
        raise ValueError(
            f"{what}: query vector has dim {query_dim} but the index at "
            f"{path} was built with dim {dim} (meta/) — a mismatched "
            "query would null-out every score instead of ranking"
        )
    return meta


def _meta_entry_nonempty(meta) -> bool | None:
    """True when meta/ records a non-empty build-time entry slice
    (appends only ever ADD entry nodes, so it stays true); None when
    the index predates n_entry or the slice was empty at build — the
    probe then keeps its runtime emptiness check."""
    n = meta.asDict().get("n_entry", -1)
    return True if n is not None and n > 0 else None


def delete_knn_graph_index(spark, path: str, ids) -> None:
    """DELETE vectors from a written graph-ANN index by TOMBSTONE —
    the H5–H12 mutation family's graph-index analog (the reference
    deletes points from its Qdrant collection,
    app/core/document_ingestor.py:443-520; an HNSW index deletes the
    same way: mark, exclude from results, physically remove at
    compaction).  ``ids`` is a list of vector ids or a 1-column
    DataFrame.  Tombstoned nodes stay ROUTABLE (their edges keep
    navigating the walk — removing them from routing is what degrades
    filtered-HNSW recall) but can never be RETURNED: every probe shape
    (flat/batch/hier/stream) anti-joins the tombstone set at its final
    ranking.  `compact_knn_graph_index` physically removes them and
    repairs the routing graph.  Idempotent: re-deleting an id appends
    a duplicate tombstone row, which the anti-join ignores.

    A tombstoned id is RESERVED until compaction:
    `append_knn_graph_index` refuses it (the new version would be
    suppressed by the same anti-join, then destroyed by the
    compaction rewrite), and compaction releases it — see the
    append's ID EPOCH CONTRACT."""
    if not isinstance(ids, DataFrame):
        ids = spark.createDataFrame([(int(i),) for i in ids], "nid long")
    else:
        ids = ids.select(F.col(ids.columns[0]).cast("long").alias("nid"))
    ids.write.mode("append").parquet(f"{path}/tombstones")


def _load_tombstones(spark, path: str) -> DataFrame | None:
    """The index's tombstone relation, or None when nothing was ever
    deleted (absent directory — the zero-cost common case)."""
    import os

    if not os.path.exists(os.path.join(path, "tombstones", "_SUCCESS")):
        return None
    return spark.read.parquet(f"{path}/tombstones").select("nid").distinct()


def _drop_tombstoned(ranked_src: DataFrame, tombstones: DataFrame | None) -> DataFrame:
    """Anti-join a beam relation (carrying ``nid``) against the
    tombstone set — a broadcast anti-join on the deleted-id relation,
    applied BEFORE the final rank window so survivors fill the top-k."""
    if tombstones is None:
        return ranked_src
    return ranked_src.join(F.broadcast(tombstones), "nid", "left_anti")


def knn_graph_probe_table(
    spark,
    path: str,
    query_vec: list[float],
    k: int = 10,
    beam: int = 16,
    hops: int = 3,
) -> DataFrame:
    """Probe a WRITTEN graph-ANN index (:func:`write_knn_graph_index`):
    quantize the query with the STORED scale, seed the beam from the
    ``entry=1`` partition (planning-time partition pruning — the
    probe opens 1/entry_mod of the vector files, the on-disk analog of
    the in-memory hash slice), and walk the stored edges.  A probe
    against an index built from the same corpus with the same dials
    returns exactly :func:`knn_graph_beam_search`'s answer — the same
    build-once/probe-many contract as `lsh_probe_table` /
    `ivf_probe_table`."""
    meta = _check_index_dim(
        spark, path, len(query_vec), "knn_graph_probe_table"
    )
    scale = spark.read.parquet(f"{path}/scale")
    vectors = spark.read.parquet(f"{path}/vectors")
    edges = spark.read.parquet(f"{path}/edges")
    return probe_graph_relations(
        scale, vectors, edges, query_vec, k, beam, hops,
        tombstones=_load_tombstones(spark, path),
        entry_nonempty=_meta_entry_nonempty(meta),
    )


def probe_graph_relations(
    scale: DataFrame,
    vectors: DataFrame,
    edges: DataFrame,
    query_vec: list[float],
    k: int = 10,
    beam: int = 16,
    hops: int = 3,
    tombstones: DataFrame | None = None,
    entry_nonempty: bool | None = None,
) -> DataFrame:
    """The probe body over already-loaded index relations — shared by
    :func:`knn_graph_probe_table` (one parquet index) and the
    streaming ingest store's reader (base index + committed arrival
    batches).  ``vectors`` is (nid, v, entry), ``edges`` (a, b, d);
    ``tombstones`` (a deleted-id relation) nodes stay routable in the
    walk but are excluded from the final ranking.  ``entry_nonempty``
    = True lets the caller certify (from the stored meta/) that the
    entry slice is non-empty, dropping the per-serve emptiness job."""
    if k < 1 or beam < 1 or k > beam:
        raise ValueError(f"need 1 <= k <= beam, got k={k} beam={beam}")
    if hops < 0:
        raise ValueError(f"hops must be >= 0, got {hops}")

    qn = vectors.select("nid", "v")
    qlit = F.array(*[F.lit(float(x)) for x in query_vec])
    qq = scale.select(
        F.transform(
            qlit,
            lambda x: F.greatest(
                F.lit(-127.0),
                F.least(
                    F.lit(127.0),
                    F.floor(F.lit(127.0) * x / F.col("s") + F.lit(0.5)),
                ),
            ).cast("long"),
        ).alias("qv")
    )
    und = _undirect_pairs(edges.select("a", "b"))
    entries = vectors.filter(F.col("entry") == 1).select("nid")
    if entry_nonempty is not True and entries.isEmpty():
        # Build-time slice can be empty for a tiny corpus; same
        # deterministic fallback as the in-memory search.
        from vector_db_handler_spark.functions.text import portable_hash60

        entries = (
            qn.select(
                "nid",
                portable_hash60(F.col("nid").cast("string")).alias("eh"),
            )
            .orderBy(F.col("eh").asc(), F.col("nid").asc())
            .limit(1)
            .select("nid")
        )
    beam_df = _drop_tombstoned(
        _beam_hops_single(qn, und, qq, entries, beam, hops), tombstones
    )
    w = Window.orderBy(F.col("d").desc(), F.col("nid").asc())
    return (
        beam_df.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select(
            F.col("nid").alias("vec_id"),
            "rank",
            F.col("d").cast("long").alias("iscore"),
        )
    )


def knn_graph_probe_table_on_ids(
    spark,
    path: str,
    query_vec: list[float],
    allowed_ids: DataFrame | None,
    k: int = 10,
    beam: int = 16,
    hops: int = 3,
    exact_threshold: int = 1024,
) -> DataFrame:
    """FILTERED probe of a WRITTEN graph-ANN index — the persisted-
    serve shape of H14's ``search_query_on_doc`` ("search within these
    docs", app/core/document_ingestor.py:366-441) composed with the
    graph index: ``allowed_ids`` is a 1-column relation of admissible
    vector ids; ``None`` means match-all (the reference's empty-filter
    convention), degrading to the plain probe.

    The same two dispatch regimes as the in-memory
    :func:`knn_graph_beam_search_filtered`, over the STORED artifacts:

    * **Selective** (``|allowed ∩ index| ≤ exact_threshold``): exact
      integer top-k over just the admissible stored vectors — a
      broadcast semi-join prunes the scan, the stored scale keeps
      scores bit-identical to post-filtered-exact.
    * **Broad**: the standard stored-edge walk routes over the FULL
      graph; admissible nodes from every hop's beam form the answer.

    Tombstoned ids are excluded in both regimes (a deleted vector is
    never admissible).  Returns ``(vec_id, rank, iscore)``."""
    if k < 1 or beam < 1 or k > beam:
        raise ValueError(f"need 1 <= k <= beam, got k={k} beam={beam}")
    if hops < 0:
        raise ValueError(f"hops must be >= 0, got {hops}")
    if exact_threshold < 0:
        raise ValueError(
            f"exact_threshold must be >= 0, got {exact_threshold}"
        )
    if allowed_ids is None:
        return knn_graph_probe_table(spark, path, query_vec, k, beam, hops)
    meta = _check_index_dim(
        spark, path, len(query_vec), "knn_graph_probe_table_on_ids"
    )
    allowed = allowed_ids.select(
        F.col(allowed_ids.columns[0]).cast("long").alias("nid")
    ).distinct()
    tombs = _load_tombstones(spark, path)
    if tombs is not None:
        allowed = allowed.join(F.broadcast(tombs), "nid", "left_anti")

    scale = spark.read.parquet(f"{path}/scale")
    vectors = spark.read.parquet(f"{path}/vectors")
    qn = vectors.select("nid", "v")
    qlit = F.array(*[F.lit(float(x)) for x in query_vec])
    qq = scale.select(
        F.transform(
            qlit,
            lambda x: F.greatest(
                F.lit(-127.0),
                F.least(
                    F.lit(127.0),
                    F.floor(F.lit(127.0) * x / F.col("s") + F.lit(0.5)),
                ),
            ).cast("long"),
        ).alias("qv")
    )
    w = Window.orderBy(F.col("d").desc(), F.col("nid").asc())

    admissible = qn.join(allowed, "nid", "leftsemi")
    n_pass = admissible.select("nid").limit(exact_threshold + 1).count()
    if n_pass <= exact_threshold:
        scored = admissible.crossJoin(F.broadcast(qq)).select(
            "nid", _int_dot(F.col("v"), F.col("qv")).alias("d")
        )
        return (
            scored.withColumn("rank", F.row_number().over(w).cast("long"))
            .filter(F.col("rank") <= k)
            .select(
                F.col("nid").alias("vec_id"),
                "rank",
                F.col("d").cast("long").alias("iscore"),
            )
        )

    und = _undirect_pairs(
        spark.read.parquet(f"{path}/edges").select("a", "b")
    )
    entries = vectors.filter(F.col("entry") == 1).select("nid")
    if _meta_entry_nonempty(meta) is not True and entries.isEmpty():
        from vector_db_handler_spark.functions.text import portable_hash60

        entries = (
            qn.select(
                "nid",
                portable_hash60(F.col("nid").cast("string")).alias("eh"),
            )
            .orderBy(F.col("eh").asc(), F.col("nid").asc())
            .limit(1)
            .select("nid")
        )

    def _score(nodes: DataFrame) -> DataFrame:
        return (
            nodes.join(qn, "nid")
            .crossJoin(F.broadcast(qq))
            .select("nid", _int_dot(F.col("v"), F.col("qv")).alias("d"))
        )

    def _top_beam(nodes: DataFrame) -> DataFrame:
        return (
            _score(nodes)
            .orderBy(F.col("d").desc(), F.col("nid").asc())
            .limit(int(beam))
            .localCheckpoint(eager=False)
        )

    beam_df = _top_beam(entries)
    seen = [beam_df]
    for _ in range(int(hops)):
        cand = (
            beam_df.select("nid")
            .join(und, beam_df["nid"] == und["a"])
            .select(F.col("b").alias("nid"))
            .unionByName(beam_df.select("nid"))
            .distinct()
        )
        beam_df = _top_beam(cand)
        seen.append(beam_df)
    union = seen[0]
    for b in seen[1:]:
        union = union.unionByName(b)
    admitted = (
        union.groupBy("nid")
        .agg(F.max("d").alias("d"))
        .join(allowed, "nid", "leftsemi")
    )
    return (
        admitted.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select(
            F.col("nid").alias("vec_id"),
            "rank",
            F.col("d").cast("long").alias("iscore"),
        )
    )


def knn_graph_index_stats(spark, path: str) -> DataFrame:
    """ANALYZE for a written graph-ANN index: one row of store-health
    counters an operator reads before trusting a probe — vector /
    entry-slice / edge counts, stored dials, coarse-layer presence and
    size, live tombstones, committed ingest batches awaiting merge,
    and the merge fence.  All exact counts over the stored relations
    (the `profile_events_table` posture, for the index).

    Recall guidance (r14 verdict #5): this row reports store HEALTH,
    not answer QUALITY — run `graph_ann_recall_report` on a query
    sample before trusting a probe's recall.  When its rows come back
    ``floor_met=false`` (uniform/no-cluster corpora), rebuild with the
    measured fallback dials — graph_k=12, beam=64, hops=4, recall@10
    0.981 on the adversarial sf0.1 uniform fixture (PERF.md "Round
    15") — or route the workload to the exact-KNN / IVF serves."""
    import os

    from vector_db_handler_spark.streaming.stream_ops import (
        _read_merge_fence,
        _read_merge_manifest,
    )

    meta = spark.read.parquet(f"{path}/meta").first()
    # r14 ADVICE: during a COMMITTED-but-unfinalized merge (manifest
    # present) the base dirs may be mid-rewrite — read the merged side
    # dirs instead (the same discipline as graph_index_stream_state),
    # and treat the manifest's batch ids as already folded.
    merged_ids, merge_committed = _read_merge_manifest(path)
    base = f"{path}/merged" if merge_committed else path
    vectors = spark.read.parquet(f"{base}/vectors")
    n_vectors = vectors.count()
    n_entry = vectors.filter(F.col("entry") == 1).count()
    n_edges = spark.read.parquet(f"{base}/edges").count()
    layer_mod = int(meta["layer_mod"])
    n_coarse_edges = (
        spark.read.parquet(f"{path}/coarse_edges").count()
        if layer_mod >= 1
        and os.path.exists(os.path.join(path, "coarse_edges", "_SUCCESS"))
        else 0
    )
    tombs = _load_tombstones(spark, path)
    n_tombstones = 0 if tombs is None else tombs.count()
    n_batches = 0
    fence = _read_merge_fence(path) if os.path.isdir(
        os.path.join(path, "ingest")
    ) else -1
    if merge_committed and merged_ids:
        # The fence this merge WILL set on finalization — report it now
        # so an operator never sees folded batches counted as pending.
        fence = max(fence, max(merged_ids))
    ingest_root = os.path.join(path, "ingest")
    if os.path.isdir(ingest_root):
        for d in os.listdir(ingest_root):
            if d.startswith("batch="):
                try:
                    v = int(d.split("=", 1)[1])
                except ValueError:
                    continue
                if (
                    v > fence
                    and v not in merged_ids
                    and os.path.exists(
                        os.path.join(ingest_root, d, "vectors", "_SUCCESS")
                    )
                ):
                    n_batches += 1
    return spark.createDataFrame(
        [
            (
                int(n_vectors),
                int(n_entry),
                int(n_edges),
                int(meta["entry_mod"]),
                int(meta["graph_k"]),
                int(meta["dim"]),
                int(layer_mod),
                int(n_coarse_edges),
                int(n_tombstones),
                int(n_batches),
                int(fence),
            )
        ],
        "n_vectors long, n_entry long, n_edges long, entry_mod long,"
        " graph_k long, dim long, layer_mod long, n_coarse_edges long,"
        " n_tombstones long, n_unmerged_batches long, merged_through long",
    )


def append_knn_graph_index(
    new_rows: DataFrame,
    path: str,
    embedding_col: str = "embedding",
    id_col: str = "vec_id",
    beam: int | None = None,
    hops: int = 2,
) -> None:
    """Ingest-time graph-index maintenance — the graph analog of
    `append_lsh_index` / `append_ivf_index`, and the incremental-
    insert step of HNSW: for each NEW vector, SEARCH the existing
    graph (batch beam walk, one job for the whole arrival batch) and
    connect it to its top-``graph_k`` discovered neighbors.

    Cost is O(new batch): the entry scan reads the pruned
    ``entry=1`` partition once for the whole batch; each new node
    pays beam-bounded hop work; the existing index is never
    rewritten.  New vectors are quantized with the STORED scale (the
    index geometry — identical to IVF appends reusing the build
    centroids).  Appended edges are directed new→old; the search
    walks edges undirected, so the new nodes are immediately
    REACHABLE through their own edges (pinned by test) — the
    standard single-direction HNSW insert.  Nodes within one arrival
    batch do not link to each other (insert-vs-batch-build
    difference, documented by the HNSW paper too); periodic rebuild
    (`write_knn_graph_index`) is the compaction story, same as the
    LSH/IVF stores.

    ID EPOCH CONTRACT: an arrival id that already lives in the index
    is REFUSED — re-appending it would store a second vector row
    under the same nid and the probe could return that nid twice in
    one top-k.  An id reserved by a pending delete (tombstoned, not
    yet compacted) is refused for the dual reason: the tombstone
    anti-join would suppress the new version silently, and the next
    compaction would physically destroy it as "a copy of a deleted
    id".  `compact_knn_graph_index` clears the tombstones and removes
    the old rows, RELEASING the id — delete → compact → append(same
    id) is the legal resurrection path; delete → append(new id) is
    the cheap update-by-replace path (both pinned in
    tests/test_graph_index_delete.py)."""
    spark = new_rows.sparkSession
    from vector_db_handler_spark.functions.text import portable_hash60
    from vector_db_handler_spark.operators.quantize import quantize_int8

    meta = spark.read.parquet(f"{path}/meta").first()
    graph_k = int(meta["graph_k"])
    entry_mod = int(meta["entry_mod"])
    if beam is None:
        beam = max(8, 2 * graph_k)

    scale = spark.read.parquet(f"{path}/scale")
    vectors = spark.read.parquet(f"{path}/vectors")
    reserved = vectors.select("nid")
    tombs = _load_tombstones(spark, path)
    if tombs is not None:
        reserved = reserved.unionByName(tombs)
    clash = (
        new_rows.select(F.col(id_col).cast("long").alias("nid"))
        .join(reserved, "nid", "leftsemi")
        .limit(5)
        .collect()
    )
    if clash:
        ids = sorted(r["nid"] for r in clash)
        raise ValueError(
            f"append_knn_graph_index: arrival ids {ids} already live in "
            f"the index at {path} (or are reserved by a pending delete). "
            "Re-appending would duplicate the nid in the served relation "
            "(or be silently suppressed, then destroyed at compaction). "
            "Update-by-replace: delete the id and append under a NEW id; "
            "or compact first — compaction releases deleted ids."
        )
    qn = vectors.select("nid", "v")
    und = _undirect_pairs(spark.read.parquet(f"{path}/edges").select("a", "b"))

    qnew = quantize_int8(
        new_rows, embedding_col=embedding_col, id_col=id_col, scale=scale
    ).select(F.col(id_col).alias("qid"), F.col("qvec").alias("qv"))

    entry_nodes = vectors.filter(F.col("entry") == 1).select("nid")
    if _meta_entry_nonempty(meta) is not True and entry_nodes.isEmpty():
        entry_nodes = (
            qn.select(
                "nid",
                portable_hash60(F.col("nid").cast("string")).alias("eh"),
            )
            .orderBy(F.col("eh").asc(), F.col("nid").asc())
            .limit(1)
            .select("nid")
        )
    entries = entry_nodes.crossJoin(qnew.select("qid"))
    found = _beam_hops_batch(qn, und, qnew, entries, beam, hops)
    w = Window.partitionBy("qid").orderBy(F.col("d").desc(), F.col("nid").asc())
    new_edges = (
        found.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= graph_k)
        .select(
            F.col("qid").alias("a"),
            F.col("nid").alias("b"),
            F.col("d"),
        )
    )
    new_edges.sortWithinPartitions("a").write.mode("append").parquet(
        f"{path}/edges"
    )
    qnew.select(
        F.col("qid").alias("nid"),
        F.col("qv").alias("v"),
        (
            F.pmod(
                portable_hash60(F.col("qid").cast("string")),
                F.lit(int(entry_mod)),
            )
            == 0
        ).cast("int").alias("entry"),
    ).write.mode("append").partitionBy("entry").parquet(f"{path}/vectors")


def knn_graph_probe_table_batch(
    spark,
    path: str,
    queries: DataFrame,
    k: int = 5,
    beam: int = 16,
    hops: int = 3,
    query_id_col: str = "query_id",
    query_vec_col: str = "embedding",
) -> DataFrame:
    """BATCH probe of a written graph-ANN index — the serve shape a
    vector DB runs in production: the index is built (and compacted)
    offline, every arriving query batch is answered in ONE job whose
    entry scan reads the pruned ``entry=1`` partition once for the
    whole batch.  Returns ``(query_id, neighbor_id, rank, iscore)``,
    exactly :func:`knn_graph_beam_search_batch`'s answer for an index
    built from the same corpus with the same dials."""
    if k < 1 or beam < 1 or k > beam:
        raise ValueError(f"need 1 <= k <= beam, got k={k} beam={beam}")
    if hops < 0:
        raise ValueError(f"hops must be >= 0, got {hops}")

    from vector_db_handler_spark.functions.text import portable_hash60
    from vector_db_handler_spark.operators.quantize import quantize_int8

    # Dim guard, DECLARATIVE (r14 ADVICE): checking only the first row
    # cost an extra Spark job per probe and still let a mixed-dimension
    # batch null-score every other row silently.  assert_true rides the
    # quantization projection, so EVERY query row is validated in the
    # serve job itself — no extra job, no silent nulls.
    meta = spark.read.parquet(f"{path}/meta").first()
    dim = int(meta["dim"])
    dim_ok = F.assert_true(
        F.size(F.col(query_vec_col)) == F.lit(dim),
        F.lit(
            f"knn_graph_probe_table_batch: query vector dim != index dim "
            f"{dim} (meta/) — a mismatched query would null-out every "
            "score instead of ranking"
        ),
    )
    queries = queries.withColumn(
        query_vec_col, F.when(dim_ok.isNull(), F.col(query_vec_col))
    )
    scale = spark.read.parquet(f"{path}/scale")
    vectors = spark.read.parquet(f"{path}/vectors")
    qn = vectors.select("nid", "v")
    und = _undirect_pairs(spark.read.parquet(f"{path}/edges").select("a", "b"))
    qq = quantize_int8(
        queries,
        embedding_col=query_vec_col,
        id_col=query_id_col,
        scale=scale,
    ).select(F.col(query_id_col).alias("qid"), F.col("qvec").alias("qv"))

    entry_nodes = vectors.filter(F.col("entry") == 1).select("nid")
    if _meta_entry_nonempty(meta) is not True and entry_nodes.isEmpty():
        entry_nodes = (
            qn.select(
                "nid",
                portable_hash60(F.col("nid").cast("string")).alias("eh"),
            )
            .orderBy(F.col("eh").asc(), F.col("nid").asc())
            .limit(1)
            .select("nid")
        )
    entries = entry_nodes.crossJoin(qq.select("qid"))
    beam_df = _drop_tombstoned(
        _beam_hops_batch(qn, und, qq, entries, beam, hops),
        _load_tombstones(spark, path),
    )
    w = Window.partitionBy("qid").orderBy(F.col("d").desc(), F.col("nid").asc())
    return (
        beam_df.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select(
            F.col("qid").alias(query_id_col),
            F.col("nid").alias("neighbor_id"),
            "rank",
            F.col("d").cast("long").alias("iscore"),
        )
    )


def compact_knn_graph_index(spark, path: str) -> None:
    """Periodic maintenance for an appended graph index — the graph
    twin of `dedup.compact_lsh_index` / the IVF per-cell rewrite:
    appends accumulate one file-set per arrival batch in ``edges/``
    and per ``vectors/`` partition; each file is internally sorted so
    min-max pruning still works, but probe open-file counts grow with
    batch count.  Compaction rewrites both back to the fully-clustered
    single-write layout; results are byte-identical relations (pinned
    by test), only the file layout changes.

    ``vectors/`` is rewritten with dynamic partition overwrite
    (per-partition swap, crash leaves old files); ``edges/`` is
    unpartitioned, so it goes through the compact-copy-then-swap the
    LSH shingle table uses.

    When TOMBSTONES exist (`delete_knn_graph_index`), compaction also
    PHYSICALLY removes them — the HNSW delete's second half: deleted
    vectors drop from ``vectors/``, their edges drop from ``edges/``,
    and the routing graph is REPAIRED by bridging a→b for every
    undirected 2-path a→d→b through a deleted node d (both endpoints
    alive), exactly re-scored and folded into each survivor's
    top-``graph_k`` list (pinned ties) — so reachability through
    deleted hubs survives the removal.  The tombstone directory is
    cleared afterward.  With no tombstones the rewrite is byte-
    identical relations (the original pin), no repair pass runs."""
    import shutil as _shutil

    tombs = _load_tombstones(spark, path)
    if tombs is not None:
        # r14 ADVICE: a tombstoned id living in an UNMERGED streaming
        # ingest batch dir (ingest/batch=*) would survive a rewrite of
        # only vectors/ + edges/ — and with the tombstone directory
        # cleared afterward, the stream probe would serve the deleted
        # vector again.  Fold committed batches into the base FIRST
        # (a no-op when there is no ingest state), so the anti-join
        # rewrite below sees every physical copy of every id.
        from vector_db_handler_spark.streaming.stream_ops import (
            merge_graph_index_ingest,
        )

        merge_graph_index_ingest(spark, path)
        tombs = tombs.localCheckpoint(eager=True)
        meta_row = spark.read.parquet(f"{path}/meta").first()
        graph_k = int(meta_row["graph_k"])
        vectors = spark.read.parquet(f"{path}/vectors")
        alive = vectors.join(F.broadcast(tombs), "nid", "left_anti")
        edges = spark.read.parquet(f"{path}/edges")
        und = _undirect_pairs(edges.select("a", "b"))
        dead_a = tombs.select(F.col("nid").alias("a"))
        dead_any = tombs.select("nid")
        # bridges: a --(dead d)-- b with a, b alive
        thru = (
            und.join(F.broadcast(tombs), und["b"] == tombs["nid"], "leftsemi")
            .join(F.broadcast(dead_a), "a", "left_anti")
        )  # alive a -> dead d  (column b IS the dead node)
        back = und.join(
            F.broadcast(tombs), und["a"] == tombs["nid"], "leftsemi"
        ).join(
            F.broadcast(dead_any), und["b"] == dead_any["nid"], "left_anti"
        ).select(F.col("a").alias("d"), F.col("b").alias("bb"))  # dead -> alive
        bridges = (
            thru.join(back, thru["b"] == back["d"])
            .filter(F.col("a") != F.col("bb"))
            .select("a", F.col("bb").alias("b"))
            .distinct()
        )
        qa = alive.select(F.col("nid").alias("a"), F.col("v").alias("va"))
        qb = alive.select(F.col("nid").alias("b"), F.col("v").alias("vb"))
        scored_bridges = (
            bridges.join(qa, "a")
            .join(qb, "b")
            .select("a", "b", _int_dot(F.col("va"), F.col("vb")).alias("d"))
        )
        alive_edges = (
            edges.join(F.broadcast(tombs), edges["a"] == tombs["nid"], "left_anti")
            .join(F.broadcast(dead_any), edges["b"] == dead_any["nid"], "left_anti")
            .select("a", "b", "d")
        )
        w_rep = Window.partitionBy("a").orderBy(
            F.col("d").desc(), F.col("b").asc()
        )
        repaired = (
            alive_edges.unionByName(scored_bridges)
            .groupBy("a", "b")
            .agg(F.max("d").alias("d"))
            .withColumn("rn", F.row_number().over(w_rep))
            .filter(F.col("rn") <= graph_k)
            .select("a", "b", "d")
        )
        alive.repartition("entry").sortWithinPartitions("nid").write.mode(
            "overwrite"
        ).partitionBy("entry").parquet(f"{path}/vectors_compact")
        repaired.sortWithinPartitions("a").write.mode("overwrite").parquet(
            f"{path}/edges_compact2"
        )
        spark.read.parquet(f"{path}/vectors_compact").write.mode(
            "overwrite"
        ).partitionBy("entry").parquet(f"{path}/vectors")
        spark.read.parquet(f"{path}/edges_compact2").write.mode(
            "overwrite"
        ).parquet(f"{path}/edges")
        import os as _os

        # r14 ADVICE: the coarse layer must be rebuilt too — a written
        # index carries coarse_edges/ by default (DEFAULT_LAYER_MOD),
        # and with tombstones cleared below nothing would ever mark
        # coarse edges through deleted coarse-layer nodes as stale:
        # hierarchical navigability would silently rot.  Re-derive the
        # layer over the ALIVE vectors and its edges from the REPAIRED
        # base graph — the same construction the build uses.
        layer_mod = int(meta_row["layer_mod"])
        if layer_mod >= 1 and _os.path.exists(
            _os.path.join(path, "coarse_edges", "_SUCCESS")
        ):
            from vector_db_handler_spark.functions.text import (
                portable_hash60,
            )

            coarse_k = int(meta_row["coarse_k"])
            qn2 = spark.read.parquet(f"{path}/vectors").select("nid", "v")
            und2 = _undirect_pairs(
                spark.read.parquet(f"{path}/edges").select("a", "b")
            )
            lay = qn2.filter(
                F.pmod(
                    portable_hash60(F.col("nid").cast("string")),
                    F.lit(layer_mod),
                )
                == 0
            )
            if lay.isEmpty():
                lay = (
                    qn2.select(
                        "nid",
                        "v",
                        portable_hash60(F.col("nid").cast("string")).alias(
                            "eh"
                        ),
                    )
                    .orderBy(F.col("eh").asc(), F.col("nid").asc())
                    .limit(1)
                    .select("nid", "v")
                )
            _coarse_layer_edges(qn2, und2, lay, coarse_k).sortWithinPartitions(
                "a"
            ).write.mode("overwrite").parquet(f"{path}/coarse_compact")
            spark.read.parquet(f"{path}/coarse_compact").write.mode(
                "overwrite"
            ).parquet(f"{path}/coarse_edges")
            _shutil.rmtree(
                _os.path.join(path, "coarse_compact"), ignore_errors=True
            )
        for side in ("vectors_compact", "edges_compact2", "tombstones"):
            _shutil.rmtree(_os.path.join(path, side), ignore_errors=True)
        return
    try:
        prev_mode = spark.conf.get("spark.sql.sources.partitionOverwriteMode")
    except Exception:  # noqa: BLE001
        prev_mode = None
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        (
            spark.read.parquet(f"{path}/vectors")
            .repartition("entry")
            .sortWithinPartitions("nid")
            .write.mode("overwrite")
            .partitionBy("entry")
            .parquet(f"{path}/vectors")
        )
    finally:
        if prev_mode is None:
            spark.conf.unset("spark.sql.sources.partitionOverwriteMode")
        else:
            spark.conf.set(
                "spark.sql.sources.partitionOverwriteMode", prev_mode
            )
    edges = spark.read.parquet(f"{path}/edges")
    n_parts = max(1, edges.rdd.getNumPartitions() // 8)
    (
        edges.repartition(n_parts, "a")
        .sortWithinPartitions("a")
        .write.mode("overwrite")
        .parquet(f"{path}/edges_compact")
    )
    spark.read.parquet(f"{path}/edges_compact").write.mode("overwrite").parquet(
        f"{path}/edges"
    )
    jvm = spark.sparkContext._jvm
    p = jvm.org.apache.hadoop.fs.Path(f"{path}/edges_compact")
    p.getFileSystem(spark.sparkContext._jsc.hadoopConfiguration()).delete(p, True)


def _exact_topk_pairs(
    emb: DataFrame,
    queries: DataFrame,
    k: int,
    embedding_col: str = "embedding",
    id_col: str = "vec_id",
    query_id_col: str = "query_id",
    query_vec_col: str = "embedding",
) -> DataFrame:
    """The eval rails' EXACT ground-truth leg: int8-grid top-``k``
    ``(qid, nid)`` pairs per query — corpus scored against the
    broadcast eval batch in one pass.  BEAM-INDEPENDENT, so
    `beam_recall_curve` computes it once behind a lazy checkpoint and
    every curve point reuses it (it is the report's single most
    expensive relation; recomputing it per point tripled the curve's
    wall for identical bits)."""
    from vector_db_handler_spark.operators.quantize import (
        max_abs_scale,
        quantize_int8,
    )

    scale = max_abs_scale(emb, embedding_col)
    qn = quantize_int8(emb, embedding_col=embedding_col, id_col=id_col).select(
        F.col(id_col).alias("nid"), F.col("qvec").alias("v")
    )
    qq = quantize_int8(
        queries, embedding_col=query_vec_col, id_col=query_id_col, scale=scale
    ).select(F.col(query_id_col).alias("qid"), F.col("qvec").alias("qv"))
    w = Window.partitionBy("qid").orderBy(F.col("d").desc(), F.col("nid").asc())
    return (
        qn.crossJoin(F.broadcast(qq))
        .select("qid", "nid", _int_dot(F.col("v"), F.col("qv")).alias("d"))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select("qid", "nid")
    )


def graph_ann_recall_report(
    emb: DataFrame,
    queries: DataFrame,
    k: int = 10,
    beam: int = 16,
    hops: int = 3,
    graph: DataFrame | None = None,
    graph_k: int = 8,
    graph_iters: int = 2,
    kmeans_k: int = 8,
    rand_buckets: int | None = None,
    entry_mod: int | None = None,
    embedding_col: str = "embedding",
    id_col: str = "vec_id",
    query_id_col: str = "query_id",
    query_vec_col: str = "embedding",
    recall_floor: float = 0.9,
    exact: DataFrame | None = None,
) -> DataFrame:
    """Recall@k of the graph-ANN beam search against the exact int8
    top-k, per query — the measurement that tunes beam/hops/entry_mod
    before a graph index ships (the eval rail `ann_recall_report`
    provides for IVF, for the graph family; completes
    build→serve→measure).  Both rankers are deterministic integer
    rankings with pinned ties, so the recall numbers are exact and
    hash-checkable.

    The NAVIGABILITY CONTRACT is part of the output, not prose (r13
    verdict): every row carries ``floor_met`` — whether that query's
    recall reached ``recall_floor`` (default 0.9, the shipping bar the
    repo's default dials meet on a clustered fixture — the pytest
    recall-floor pin).  The comparison is exact-integer
    (``n_hits ≥ ceil(recall_floor·k)``), so the flag hash-checks.
    Graph-ANN recall is DATA-DEPENDENT: on uniform-random vectors (no
    cluster structure — the adversarial case for every navigable-graph
    method) the same dials measure ~0.7, which is exactly the signal
    this report exists to surface before an index rolls out; exact KNN
    and IVF remain the correctness paths when the report says no.

    Self-matches are INCLUDED on both sides (the query set here is a
    corpus slice and both rankers see the query node identically, so
    exclusion would only subtract a constant hit from each) — the
    convention difference from `ann_recall_report` is documented, not
    accidental.

    Shape: the graph is built ONCE (pass a prebuilt one to amortize);
    the approx leg is the batch beam serve (shared entry scan,
    per-query windows); the exact leg scores the corpus against the
    BROADCAST query batch in one pass (the eval-harness N·Q baseline —
    eval-set-sized Q only, the same contract as `ann_recall_report`),
    or rides in precomputed via ``exact`` (`_exact_topk_pairs` —
    beam-independent, so `beam_recall_curve` shares one across its
    points).  Output: ``(query_id, k, n_hits, recall)``."""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    if not 0.0 <= recall_floor <= 1.0:
        raise ValueError(
            f"recall_floor must be in [0, 1], got {recall_floor}"
        )
    import math

    # recall >= floor  <=>  n_hits >= ceil(floor*k)  (n_hits integer) —
    # computed ONCE in Python so both engines compare exact integers.
    min_hits = math.ceil(recall_floor * k - 1e-12)
    approx = knn_graph_beam_search_batch(
        emb,
        queries,
        k=k,
        beam=beam,
        hops=hops,
        graph=graph,
        graph_k=graph_k,
        graph_iters=graph_iters,
        kmeans_k=kmeans_k,
        rand_buckets=rand_buckets,
        entry_mod=entry_mod,
        embedding_col=embedding_col,
        id_col=id_col,
        query_id_col=query_id_col,
        query_vec_col=query_vec_col,
    ).select(F.col(query_id_col).alias("qid"), F.col("neighbor_id").alias("nid"))

    if exact is None:
        exact = _exact_topk_pairs(
            emb,
            queries,
            k,
            embedding_col=embedding_col,
            id_col=id_col,
            query_id_col=query_id_col,
            query_vec_col=query_vec_col,
        )
    hits = (
        approx.join(exact, ["qid", "nid"])
        .groupBy("qid")
        .agg(F.count(F.lit(1)).alias("n_hits"))
    )
    return (
        # null-embedding queries are dropped, matching the quantized
        # relations' contract (quantize_int8 filters them)
        queries.filter(F.col(query_vec_col).isNotNull())
        .select(F.col(query_id_col).alias("qid"))
        .distinct()
        .join(hits, "qid", "left")
        .select(
            F.col("qid").alias(query_id_col),
            F.lit(int(k)).cast("long").alias("k"),
            F.coalesce(F.col("n_hits"), F.lit(0)).cast("long").alias("n_hits"),
            F.round(
                F.coalesce(F.col("n_hits"), F.lit(0)).cast("double") / F.lit(float(k)),
                6,
            ).alias("recall"),
            (
                F.coalesce(F.col("n_hits"), F.lit(0)) >= F.lit(int(min_hits))
            ).alias("floor_met"),
        )
    )


def knn_graph_probe_table_hier(
    spark,
    path: str,
    query_vec: list[float],
    k: int = 10,
    beam: int = 16,
    hops: int = 3,
    coarse_beam: int | None = None,
    coarse_hops: int = 1,
    coarse_entry_mod: int | None = None,
) -> DataFrame:
    """HIERARCHICAL probe of a written graph-ANN index built with
    ``layer_mod`` set: the coarse layer's edges were PRECOMPUTED at
    build time (``coarse_edges/``), so the per-query coarsening pass
    the in-memory `knn_graph_hierarchical_search` pays is already on
    disk — the probe walks stored coarse edges to find its entry into
    the stored base edges.  Layer membership is re-derived from the
    md5 hash (deterministic — identical to the build's), and the
    answer is exactly the in-memory hierarchical search's for an index
    built from the same corpus with the same dials (pinned by test)."""
    if k < 1 or beam < 1 or k > beam:
        raise ValueError(f"need 1 <= k <= beam, got k={k} beam={beam}")
    if hops < 0 or coarse_hops < 0:
        raise ValueError(
            f"hops must be >= 0, got hops={hops} coarse_hops={coarse_hops}"
        )
    if coarse_beam is None:
        coarse_beam = beam

    from vector_db_handler_spark.functions.text import portable_hash60

    meta = spark.read.parquet(f"{path}/meta").first()
    if int(meta["dim"]) != len(query_vec):
        raise ValueError(
            f"knn_graph_probe_table_hier: query vector has dim "
            f"{len(query_vec)} but the index at {path} was built with dim "
            f"{int(meta['dim'])} (meta/) — a mismatched query would "
            "null-out every score instead of ranking"
        )
    layer_mod = int(meta["layer_mod"])
    if layer_mod < 1:
        raise ValueError(
            "index was written without a coarse layer (layer_mod unset); "
            "rebuild with write_knn_graph_index(..., layer_mod=...) or use "
            "knn_graph_probe_table"
        )
    scale = spark.read.parquet(f"{path}/scale")
    vectors = spark.read.parquet(f"{path}/vectors")
    qn = vectors.select("nid", "v")
    und = _undirect_pairs(spark.read.parquet(f"{path}/edges").select("a", "b"))
    cund = _undirect_pairs(
        spark.read.parquet(f"{path}/coarse_edges").select("a", "b")
    )
    qlit = F.array(*[F.lit(float(x)) for x in query_vec])
    qq = scale.select(
        F.transform(
            qlit,
            lambda x: F.greatest(
                F.lit(-127.0),
                F.least(
                    F.lit(127.0),
                    F.floor(F.lit(127.0) * x / F.col("s") + F.lit(0.5)),
                ),
            ).cast("long"),
        ).alias("qv")
    )
    # The BUILD-TIME hash-layer count stored in meta/ (r14 verdict #3)
    # keeps the serve path job-free: it replaces both the per-serve
    # emptiness probe (0 = the build wrote the min-hash fallback layer;
    # >0 = the hash layer is non-empty, and appends only ever add) and
    # the per-serve count behind the default coarse_entry_mod dial
    # (frozen at build geometry, like the quantization scale).  Indexes
    # written before n_layer existed (-1) fall back to the old jobs.
    stored_n_layer = int(meta["n_layer"]) if "n_layer" in meta.asDict() else -1
    lay = qn.filter(
        F.pmod(
            portable_hash60(F.col("nid").cast("string")), F.lit(layer_mod)
        )
        == 0
    )
    if stored_n_layer == 0 or (stored_n_layer < 0 and lay.isEmpty()):
        lay = (
            qn.select(
                "nid",
                "v",
                portable_hash60(F.col("nid").cast("string")).alias("eh"),
            )
            .orderBy(F.col("eh").asc(), F.col("nid").asc())
            .limit(1)
            .select("nid", "v")
        )
        lay = lay.localCheckpoint(eager=False)
    if coarse_entry_mod is None:
        n_layer = stored_n_layer if stored_n_layer >= 0 else lay.count()
        coarse_entry_mod = max(1, n_layer // 1024)
    centry = _entry_slice_nodes(lay.select("nid", "v"), coarse_entry_mod)
    coarse_beam_df = _beam_hops_single(
        lay, cund, qq, centry, coarse_beam, coarse_hops
    )
    beam_df = _drop_tombstoned(
        _beam_hops_single(
            qn, und, qq, coarse_beam_df.select("nid"), beam, hops
        ),
        _load_tombstones(spark, path),
    )
    w = Window.orderBy(F.col("d").desc(), F.col("nid").asc())
    return (
        beam_df.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select(
            F.col("nid").alias("vec_id"),
            "rank",
            F.col("d").cast("long").alias("iscore"),
        )
    )


def beam_recall_curve(
    emb: DataFrame,
    queries: DataFrame,
    k: int = 5,
    beams: Sequence[int] = (8, 16, 32),
    hops: int = 3,
    graph: DataFrame | None = None,
    graph_k: int = 8,
    graph_iters: int = 2,
    kmeans_k: int = 8,
    rand_buckets: int | None = None,
    entry_mod: int | None = None,
    embedding_col: str = "embedding",
    id_col: str = "vec_id",
    query_id_col: str = "query_id",
    query_vec_col: str = "embedding",
) -> DataFrame:
    """Aggregate recall@k of the graph-ANN beam search as a function
    of BEAM WIDTH — the tuning curve an operator reads before fixing
    the serve dial (the graph twin of `mrl_recall_curve`'s
    prefix-dimension sweep).  One graph build (pass ``graph`` to
    amortize further) serves every point on the curve; each point is
    one batch serve at that width.

    Returns one row per beam width:
    ``(beam, n_queries, n_hits, recall)`` where ``n_hits`` sums
    |exact@k ∩ approx@k| over the query batch and
    ``recall = n_hits / (n_queries·k)`` — exact integers up to the
    one final division, so the curve is hash-checkable.  Monotone
    non-decreasing in beam by construction ONLY when hops are
    saturating; the curve measures, it does not assume.

    The serve is the FUSED multi-width walk (r16, guide §1.2 step 1 —
    fewer passes): one `_beam_hops_batch_multi` advances every
    (query, width) chain per hop instead of one whole per-width walk
    per curve point, cutting the hop-sequential stage chains (the
    curve's dominant cost) by the number of widths.  Row-identical to
    the per-width serves: each (qid, bw) slice of the fused walk IS
    that width's standalone chain (see `_beam_hops_batch_multi`), and
    the per-width aggregate over it matches the per-point aggregate
    the unfused form computed."""
    from vector_db_handler_spark.operators.quantize import (
        max_abs_scale,
        quantize_int8,
    )

    beams = [int(b) for b in beams]
    if not beams or any(b < 1 for b in beams) or len(set(beams)) != len(beams):
        raise ValueError(f"beams must be distinct and >= 1, got {beams}")
    if any(k > b for b in beams):
        raise ValueError(f"k={k} exceeds a beam width in {beams}")
    if entry_mod is not None and entry_mod < 1:
        raise ValueError(f"entry_mod must be >= 1, got {entry_mod}")
    if entry_mod is None:
        entry_mod = max(1, emb.count() // 1024)
    if graph is None:
        graph = knn_graph_nn_descent(
            emb,
            k=graph_k,
            iters=graph_iters,
            kmeans_k=kmeans_k,
            rand_buckets=rand_buckets,
            embedding_col=embedding_col,
            id_col=id_col,
        ).localCheckpoint(eager=False)
    # The exact ground-truth leg is beam-independent: compute it once
    # behind a lazy checkpoint and let every curve point reuse it.
    exact = _exact_topk_pairs(
        emb,
        queries,
        k,
        embedding_col=embedding_col,
        id_col=id_col,
        query_id_col=query_id_col,
        query_vec_col=query_vec_col,
    ).localCheckpoint(eager=False)
    # Quantized relations — identical construction to
    # `knn_graph_beam_search_batch` (the per-point serve this fuses).
    scale = max_abs_scale(emb, embedding_col)
    qn = quantize_int8(emb, embedding_col=embedding_col, id_col=id_col).select(
        F.col(id_col).alias("nid"), F.col("qvec").alias("v")
    )
    clamp = lambda x: F.greatest(  # noqa: E731
        F.lit(-127.0),
        F.least(
            F.lit(127.0), F.floor(F.lit(127.0) * x / F.col("s") + F.lit(0.5))
        ),
    ).cast("long")
    qq = (
        queries.select(
            F.col(query_id_col).alias("qid"),
            F.col(query_vec_col).alias("qv_raw"),
        )
        .crossJoin(F.broadcast(scale))
        .select("qid", F.transform(F.col("qv_raw"), clamp).alias("qv"))
    )
    und = _undirect_pairs(
        graph.select(F.col(id_col).alias("a"), F.col("neighbor_id").alias("b"))
    )
    widths = emb.sparkSession.range(1).select(
        F.explode(F.array(*[F.lit(int(b)) for b in beams])).alias("bw")
    )
    entries = (
        _entry_slice_nodes(qn, entry_mod)
        .crossJoin(qq.select("qid"))
        .crossJoin(widths)
    )
    beam_df = _beam_hops_batch_multi(qn, und, qq, entries, hops)
    wk = Window.partitionBy("qid", "bw").orderBy(
        F.col("d").desc(), F.col("nid").asc()
    )
    approx = (
        beam_df.withColumn("rn", F.row_number().over(wk))
        .filter(F.col("rn") <= k)
        .select("qid", "bw", "nid")
    )
    hits_by_bw = (
        approx.join(exact, ["qid", "nid"])
        .groupBy("bw")
        .agg(F.count(F.lit(1)).alias("n_hits"))
    )
    # n_queries per width = the report's row count: every distinct
    # non-null-embedding query, hit or not (the left-join zero-fill
    # the per-point report applied).
    nq = (
        queries.filter(F.col(query_vec_col).isNotNull())
        .select(F.col(query_id_col).alias("qid"))
        .distinct()
        .agg(F.count(F.lit(1)).alias("n_queries"))
    )
    return (
        widths.join(hits_by_bw, "bw", "left")
        .crossJoin(F.broadcast(nq))
        .select(
            F.col("bw").cast("long").alias("beam"),
            F.col("n_queries"),
            F.coalesce(F.col("n_hits"), F.lit(0)).cast("long").alias("n_hits"),
            F.round(
                F.coalesce(F.col("n_hits"), F.lit(0)).cast("double")
                / (F.col("n_queries") * F.lit(float(k))),
                6,
            ).alias("recall"),
        )
    )

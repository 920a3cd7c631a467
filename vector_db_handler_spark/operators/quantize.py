"""Scalar int8 embedding quantization + quantized KNN.

Not in the reference (it stores float vectors verbatim and lets
Qdrant index them); mandated by the extension brief's similarity
pillar.  At 100 TB of embeddings, int8 is the difference between a
corpus that fits executor memory and one that doesn't: 4× smaller
scan, and the scoring kernel becomes an integer matmul (SIMD-friendly
in numpy, exact — no float accumulation-order nondeterminism in the
scores, so ranking is bit-stable across partitionings and engines).

Scheme: symmetric max-abs scalar quantization —

    s  = max over corpus of |x_i|          (one native-expression scan)
    q_i = clamp(floor(127·x_i/s + 0.5), -127, 127)   (int8 range)

``floor(·+0.5)`` instead of ``round`` because engines disagree on
half-even vs half-away ties; floor is floor everywhere.  The scale is
a 1-row aggregate carried by broadcast — never a driver collect —
and the quantization itself is an Arrow-batched numpy pass
(``mapInPandas``), the same hot-path shape as the float scorer in
``functions/vector.py``.

Integer dot scores are exact (|q|≤127, dim 64 ⇒ |score| ≤ 127²·64 ≈
10⁶ ≪ 2⁵³), so the DuckDB oracle reproduces them to the last bit —
a quantization pipeline you can hash-check end-to-end.

NOTE the clamp/floor kernel is deliberately INLINED in each executor
closure instead of shared via a module-level helper: cloudpickle
serializes module-level functions of this package BY REFERENCE, and a
driver whose SparkSession was created outside the repo cannot import
them on executors.  Keep the four copies (quantize_int8 /
quantized_knn / write_ivfsq_index / quantize_vector) and the SQL
``_QUANT_CLAMP`` twin textually in lockstep when changing rounding
semantics.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, LongType, StructField, StructType

Q_MAX = 127


def max_abs_scale(emb: DataFrame, embedding_col: str = "embedding") -> DataFrame:
    """1-row DataFrame ``(s DOUBLE)``: the corpus max |component|.

    ``array_max``/``array_min`` are native (codegen) expressions — no
    lambda HOF, no Python — so this is a plain map-side-combined
    aggregate over the scan."""
    arr = F.col(embedding_col).cast("array<double>")
    row_max = F.greatest(F.array_max(arr), -F.array_min(arr))
    return emb.agg(F.max(row_max).alias("s"))


def quantize_int8(
    emb: DataFrame,
    embedding_col: str = "embedding",
    id_col: str = "vec_id",
    out_col: str = "qvec",
    scale: DataFrame | None = None,
) -> DataFrame:
    """Quantize a vector column → ``(id_col, qvec ARRAY<BIGINT>)``.

    The scale rides a 1-row broadcast into every batch; the per-batch
    kernel is one vectorized numpy expression.  Elements are stored as
    BIGINT for engine-portable comparison; a production sink would
    pack them to int8 bytes (4×) at write time.

    Null-embedding rows (failed embedder calls — absent in the
    fixtures, guaranteed at crawl scale) are DROPPED here, declaratively
    (the filter rides the scan), so every downstream consumer — SRP,
    PQ, IVF, k-means — inherits one contract: unembeddable rows do not
    exist on the quantized plane.  Ragged dimensions are NOT silently
    tolerated: they break every matmul and index layout downstream, so
    the kernel raises with the offending ids instead of letting numpy
    die with an untraceable shape error (a best-effort per-batch check;
    pinned in ``tests/test_null_edge_embeddings.py``)."""
    if scale is None:
        scale = max_abs_scale(emb, embedding_col)
    joined = (
        emb.select(id_col, embedding_col)
        .filter(F.col(embedding_col).isNotNull())
        .crossJoin(F.broadcast(scale))
    )
    id_field = joined.schema[id_col]
    out_schema = StructType(
        [
            StructField(id_col, id_field.dataType, id_field.nullable),
            StructField(out_col, ArrayType(LongType()), False),
        ]
    )

    def quantize(batches):  # self-contained: cloudpickled to executors
        import numpy as np

        for pdf in batches:
            if pdf.empty:
                continue
            s = float(pdf["s"].iloc[0])
            if not s > 0.0:  # all-zero corpus: q = 0 everywhere
                s = 1.0
            lens = pdf[embedding_col].map(len)
            if lens.nunique() > 1:
                bad = pdf.loc[lens != lens.iloc[0], id_col].tolist()[:5]
                raise ValueError(
                    f"ragged embedding dimensions (e.g. ids {bad}): "
                    f"expected {int(lens.iloc[0])} components per row"
                )
            mat = np.asarray(
                [np.asarray(v, dtype=np.float64) for v in pdf[embedding_col]]
            )
            q = np.clip(np.floor(127.0 * mat / s + 0.5), -127, 127).astype(np.int64)
            out = pdf[[id_col]].copy()
            out[out_col] = list(q)
            yield out

    return joined.mapInPandas(quantize, out_schema)


def quantize_vector(vec: Sequence[float], s: float) -> list[int]:
    """Driver-side twin for a single query vector (plain Python; the
    query is a literal, not data)."""
    import math

    if not s > 0.0:
        s = 1.0
    return [
        int(max(-Q_MAX, min(Q_MAX, math.floor(127.0 * float(x) / s + 0.5))))
        for x in vec
    ]


def quantized_knn(
    emb: DataFrame,
    query_vector: Sequence[float],
    k: int = 10,
    embedding_col: str = "embedding",
    id_col: str = "vec_id",
    score_col: str = "qscore",
) -> DataFrame:
    """Top-k by exact integer dot product in the int8 domain →
    ``(id_col, qscore BIGINT)``.

    One Arrow-batched pass quantizes each corpus batch AND scores it
    against the (batch-quantized) query; ``orderBy().limit(k)`` lowers
    to ``TakeOrderedAndProject`` — local top-k per partition, k·P rows
    to the driver, no global sort.  Integer scores make the ranking
    reproducible to the bit at any partitioning."""
    scale = max_abs_scale(emb, embedding_col)
    joined = emb.select(id_col, embedding_col).crossJoin(F.broadcast(scale))
    id_field = joined.schema[id_col]
    out_schema = StructType(
        [
            StructField(id_col, id_field.dataType, id_field.nullable),
            StructField(score_col, LongType(), False),
        ]
    )
    qv = [float(x) for x in query_vector]

    def score(batches):  # self-contained: cloudpickled to executors
        import numpy as np

        for pdf in batches:
            if pdf.empty:
                continue
            s = float(pdf["s"].iloc[0])
            if not s > 0.0:  # all-zero corpus: every score is 0
                s = 1.0
            qq = np.clip(
                np.floor(127.0 * np.asarray(qv, dtype=np.float64) / s + 0.5),
                -127,
                127,
            ).astype(np.int64)
            mat = np.asarray(
                [np.asarray(v, dtype=np.float64) for v in pdf[embedding_col]]
            )
            q = np.clip(np.floor(127.0 * mat / s + 0.5), -127, 127).astype(np.int64)
            out = pdf[[id_col]].copy()
            out[score_col] = q @ qq
            yield out

    scored = joined.mapInPandas(score, out_schema)
    return scored.orderBy(F.col(score_col).desc(), F.col(id_col).asc()).limit(k)



def write_ivfsq_index(
    corpus: DataFrame,
    centroids: DataFrame,
    path: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> None:
    """IVF-SQ8: the written ANN index combining cell pruning with int8
    storage — the faiss ``IVF,SQ8`` layout as a partitioned parquet
    table ``(id, qvec BINARY) PARTITIONED BY cell_id`` — qvec is dim
    PACKED int8 bytes — plus a 1-row ``_scale`` sidecar the probe
    reads back.

    Cells prune I/O at PLANNING time (partition filters on the probed
    ``cell_id`` values); the packed bytes shrink the surviving scan 4×
    vs float32 and scoring is exact integer math.  The build is ONE fused Arrow-batched pass — assign
    + quantize per batch, no shuffle beyond the partitioned write.
    Centroids and the scale are the small side (contractually ≪
    corpus) and ride into the closure, the same pattern as
    ``similarity.assign_cells``."""
    import numpy as np
    from pyspark.sql.types import ArrayType, LongType, StructField, StructType

    from vector_db_handler_spark.operators.similarity import _collect_matrix

    c_ids, c_mat = _collect_matrix(centroids, id_col, vec_col)
    if not c_ids and not corpus.isEmpty():
        # Fail driver-side with a clear message: an empty centroid
        # relation makes np.argmax over an (n, 0) score matrix raise
        # inside the executors for any nonempty corpus.
        raise ValueError(
            "write_ivfsq_index: centroid relation is empty but the corpus "
            "is not — build centroids (e.g. similarity.train_centroids) "
            "before writing the index"
        )
    order = np.argsort(np.array(c_ids), kind="stable")
    c_id_sorted = np.array(c_ids)[order]
    c_unit = c_mat[order]
    s_val = float(
        max_abs_scale(corpus, vec_col).collect()[0]["s"] or 0.0
    )
    if not s_val > 0.0:
        s_val = 1.0

    id_field = corpus.schema[id_col]
    from pyspark.sql.types import BinaryType

    out_schema = StructType(
        [
            StructField(id_col, id_field.dataType, id_field.nullable),
            StructField("qvec", BinaryType(), False),
            StructField("cell_id", LongType(), False),
        ]
    )

    def build(batches):  # self-contained: cloudpickled to executors
        import numpy as _np

        for pdf in batches:
            if pdf.empty:
                continue
            mat = _np.asarray(
                [_np.asarray(v, dtype=_np.float64) for v in pdf[vec_col]]
            )
            norms = _np.sqrt(_np.einsum("ij,ij->i", mat, mat))
            norms[norms == 0.0] = 1.0
            cells = c_id_sorted[
                _np.argmax((mat / norms[:, None]) @ c_unit.T, axis=1)
            ].astype(_np.int64)
            # PACKED int8 bytes: dim bytes/vector — the actual 4×-vs-
            # float32 storage win (a BIGINT array would be 8 B/elem,
            # LARGER than the floats it replaces).
            q = _np.clip(
                _np.floor(127.0 * mat / s_val + 0.5), -127, 127
            ).astype(_np.int8)
            out = pdf[[id_col]].copy()
            out["qvec"] = [row.tobytes() for row in q]
            out["cell_id"] = cells
            yield out

    indexed = corpus.select(id_col, vec_col).mapInPandas(build, out_schema)
    if indexed.isEmpty():
        # empty corpus: a partitioned zero-row write leaves no part
        # files and the path unreadable — write unpartitioned instead
        indexed.write.mode("overwrite").parquet(path)
    else:
        indexed.write.mode("overwrite").partitionBy("cell_id").parquet(path)
    spark = corpus.sparkSession
    spark.createDataFrame([(s_val,)], "s double").write.mode("overwrite").parquet(
        path + "_scale"
    )


def ivfsq_probe_table(
    spark,
    path: str,
    centroids: DataFrame,
    query_vector: Sequence[float],
    k: int = 10,
    nprobe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    score_col: str = "qscore",
) -> DataFrame:
    """Probe a written IVF-SQ8 index: pick the ``nprobe`` nearest
    cells driver-side (small centroid relation), scan ONLY those cell
    partitions, score with the exact integer dot against the
    identically-quantized query → ``(id, cell_id, qscore)`` top-k.

    The ``cell_id IN (…)`` predicate is a planning-time partition
    filter (same mechanism as the float IVF probe, test-pinned
    there); integer scores keep the ranking engine-exact."""
    import numpy as np

    from vector_db_handler_spark.operators.similarity import _collect_matrix

    c_ids, c_mat = _collect_matrix(centroids, id_col, vec_col)
    if not c_ids:  # empty centroid relation: nothing to probe
        probe = []
    else:
        q = np.asarray([float(v) for v in query_vector], dtype=np.float64)
        qn = np.sqrt((q * q).sum())
        scores = c_mat @ (q / qn if qn > 0 else q)
        order = np.lexsort((np.array(c_ids), -scores))
        probe = [int(np.array(c_ids)[i]) for i in order[: int(nprobe)]]

    s_val = float(spark.read.parquet(path + "_scale").collect()[0]["s"])
    qq = quantize_vector(query_vector, s_val)

    from pyspark.sql.functions import pandas_udf

    @pandas_udf("long")
    def _int_dot(qvecs):  # self-contained numpy kernel, Arrow-batched
        import numpy as _np
        import pandas as _pd

        if len(qvecs) == 0:
            return _pd.Series(_np.zeros(0, dtype=_np.int64))
        m = _np.frombuffer(b"".join(qvecs), dtype=_np.int8).reshape(
            len(qvecs), -1
        ).astype(_np.int64)
        return _pd.Series(m @ _np.asarray(qq, dtype=_np.int64))

    idx = spark.read.parquet(path).filter(F.col("cell_id").isin(probe))
    return (
        idx.withColumn(score_col, _int_dot(F.col("qvec")))
        .orderBy(F.col(score_col).desc(), F.col(id_col).asc())
        .limit(int(k))
        .select(id_col, "cell_id", score_col)
    )


def append_ivfsq_index(
    new_rows: DataFrame,
    centroids: DataFrame,
    path: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> None:
    """Ingest-time IVF-SQ8 maintenance: quantize and cell-assign ONLY
    the arriving vectors and append them into their cell partitions.

    The appended rows are quantized with the index's STORED scale
    (the ``_scale`` sidecar), never a scale recomputed from the batch:
    mixing scales would make scores incomparable across ingest
    generations — the quantization twin of "appends must use the
    centroids the index was built with".  If the corpus drifts enough
    that new maxima exceed the stored scale, components saturate at
    ±127 (graceful recall loss) until the next rebuild.  Cost is
    O(batch); the existing index is never read.
    """
    import numpy as np
    from pyspark.sql.types import BinaryType, LongType, StructField, StructType

    from vector_db_handler_spark.operators.similarity import _collect_matrix

    spark = new_rows.sparkSession
    s_val = float(spark.read.parquet(path + "_scale").collect()[0]["s"])
    c_ids, c_mat = _collect_matrix(centroids, id_col, vec_col)
    if not c_ids and not new_rows.isEmpty():
        raise ValueError(
            "append_ivfsq_index: centroid relation is empty but the batch "
            "is not — pass the centroids the index was built with"
        )
    order = np.argsort(np.array(c_ids), kind="stable")
    c_id_sorted = np.array(c_ids)[order]
    c_unit = c_mat[order]

    id_field = new_rows.schema[id_col]
    out_schema = StructType(
        [
            StructField(id_col, id_field.dataType, id_field.nullable),
            StructField("qvec", BinaryType(), False),
            StructField("cell_id", LongType(), False),
        ]
    )

    def build(batches):  # self-contained: cloudpickled to executors
        import numpy as _np

        for pdf in batches:
            if pdf.empty:
                continue
            mat = _np.asarray(
                [_np.asarray(v, dtype=_np.float64) for v in pdf[vec_col]]
            )
            norms = _np.sqrt(_np.einsum("ij,ij->i", mat, mat))
            norms[norms == 0.0] = 1.0
            cells = c_id_sorted[
                _np.argmax((mat / norms[:, None]) @ c_unit.T, axis=1)
            ].astype(_np.int64)
            q = _np.clip(
                _np.floor(127.0 * mat / s_val + 0.5), -127, 127
            ).astype(_np.int8)
            out = pdf[[id_col]].copy()
            out["qvec"] = [row.tobytes() for row in q]
            out["cell_id"] = cells
            yield out

    # An empty-corpus build wrote an UNPARTITIONED zero-row marker (see
    # write_ivfsq_index); appending cell_id= directories next to its
    # root-level part file would break partition discovery.  Detect
    # that layout and rewrite instead of append.
    mode = "append"
    try:
        if "cell_id" not in spark.read.parquet(path).columns:
            mode = "overwrite"
    except Exception:
        pass  # no prior index at path: plain append creates it
    new_rows.select(id_col, vec_col).mapInPandas(build, out_schema).write.mode(
        mode
    ).partitionBy("cell_id").parquet(path)


def ivfsq_batch_probe(
    spark,
    path: str,
    centroids: DataFrame,
    queries: DataFrame,
    k: int = 5,
    nprobe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Batch ANN serving against a written IVF-SQ8 index: every query
    probes its own ``nprobe`` nearest cells, scores the union of
    touched cells ONCE, and takes a per-query integer top-k →
    ``(query_id, vec_id, cell_id, qscore, rank)``.

    The query relation is the contractually-small side (same contract
    as ``similarity.cosine_topk_join``): its matrix ships inside the
    closure like a broadcast dim.  The scan reads only
    ``∪(probed cells)`` — a static planning-time partition filter —
    and each surviving row is scored against ALL queries in one numpy
    int matmul, then filtered to the rows whose cell is actually in
    that query's probe list (cell membership, not a distance cut, so
    results match per-query probing exactly).  One window on
    query_id ranks the survivors.
    """
    import numpy as np
    from pyspark.sql import Window

    from vector_db_handler_spark.operators.similarity import _collect_matrix

    c_ids, c_mat = _collect_matrix(centroids, id_col, vec_col)
    q_rows = queries.select(id_col, vec_col).collect()
    s_val = float(spark.read.parquet(path + "_scale").collect()[0]["s"])
    if not c_ids or not q_rows:
        from pyspark.sql.types import (
            IntegerType,
            LongType,
            StructField,
            StructType,
        )

        id_t = queries.schema[id_col].dataType
        return spark.createDataFrame(
            [],
            StructType(
                [
                    StructField(query_id_col, id_t),
                    StructField(id_col, spark.read.parquet(path).schema[id_col].dataType),
                    StructField("cell_id", LongType()),
                    StructField("qscore", LongType()),
                    StructField("rank", IntegerType()),
                ]
            ),
        )

    order = np.argsort(np.array(c_ids), kind="stable")
    c_id_sorted = np.array(c_ids)[order]
    c_unit = c_mat[order]

    q_ids = [r[0] for r in q_rows]
    q_mat = np.asarray([np.asarray(r[1], dtype=np.float64) for r in q_rows])
    q_norm = np.sqrt(np.einsum("ij,ij->i", q_mat, q_mat))
    q_norm[q_norm == 0.0] = 1.0
    # per-query probe cells: score desc, cell id asc — same tie rule
    # as the single-query probe
    cell_scores = (q_mat / q_norm[:, None]) @ c_unit.T
    probe_sets = []
    for qi in range(len(q_ids)):
        o = np.lexsort((c_id_sorted, -cell_scores[qi]))
        probe_sets.append({int(c_id_sorted[i]) for i in o[: int(nprobe)]})
    union_cells = sorted(set().union(*probe_sets))
    qq = np.clip(np.floor(127.0 * q_mat / (s_val if s_val > 0 else 1.0) + 0.5), -127, 127).astype(np.int64)
    q_ids_arr = list(q_ids)
    probe_lists = [sorted(ps) for ps in probe_sets]

    idx = spark.read.parquet(path).filter(F.col("cell_id").isin(union_cells))
    from pyspark.sql.types import IntegerType, LongType, StructField, StructType

    out_schema = StructType(
        [
            StructField(query_id_col, queries.schema[id_col].dataType),
            StructField(id_col, idx.schema[id_col].dataType),
            StructField("cell_id", LongType()),
            StructField("qscore", LongType()),
        ]
    )

    def score(batches):  # self-contained: cloudpickled to executors
        import numpy as _np
        import pandas as _pd

        qq_l = _np.asarray(qq, dtype=_np.int64)
        probe_l = [set(p) for p in probe_lists]
        for pdf in batches:
            if pdf.empty:
                continue
            m = _np.frombuffer(b"".join(pdf["qvec"]), dtype=_np.int8).reshape(
                len(pdf), -1
            ).astype(_np.int64)
            scores = m @ qq_l.T  # (rows, Q)
            cells = pdf["cell_id"].to_numpy()
            vecs = pdf[pdf.columns[0]].to_numpy()
            out_q, out_v, out_c, out_s = [], [], [], []
            for qi, qid in enumerate(q_ids_arr):
                mask = _np.fromiter(
                    (int(c) in probe_l[qi] for c in cells), dtype=bool, count=len(cells)
                )
                if not mask.any():
                    continue
                out_q.extend([qid] * int(mask.sum()))
                out_v.extend(vecs[mask])
                out_c.extend(cells[mask].astype(_np.int64))
                out_s.extend(scores[mask, qi])
            yield _pd.DataFrame(
                {
                    query_id_col: out_q,
                    pdf.columns[0]: out_v,
                    "cell_id": out_c,
                    "qscore": out_s,
                }
            )

    scored = idx.select(id_col, "cell_id", "qvec").mapInPandas(score, out_schema)
    w = Window.partitionBy(query_id_col).orderBy(
        F.col("qscore").desc(), F.col(id_col).asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= int(k))
    )


def gram_int8(
    emb: DataFrame,
    embedding_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Exact integer Gram/covariance matrix of the int8-quantized
    corpus: ``(j, k, c)`` with ``c = Σ_rows q_j·q_k`` as BIGINT —
    one Arrow-batched pass computing a 64×64 partial ``QᵀQ`` per
    batch, then a dim²-row sum.  Entries are bounded by N·127², so
    int64 holds them to ~5·10¹⁴ rows — comfortably past 100 TB of
    embeddings; the shuffle carries dim² rows per partition, never
    data."""
    qn = quantize_int8(emb, embedding_col=embedding_col, id_col=id_col)

    def gram(batches):  # self-contained: cloudpickled to executors
        import numpy as np
        import pandas as pd

        acc = None
        for pdf in batches:
            if pdf.empty:
                continue
            m = np.array(list(pdf["qvec"]), dtype=np.int64)
            g = m.T @ m
            acc = g if acc is None else acc + g
        if acc is not None:
            d = acc.shape[0]
            jj, kk = np.meshgrid(
                np.arange(d, dtype=np.int64),
                np.arange(d, dtype=np.int64),
                indexing="ij",
            )
            yield pd.DataFrame(
                {"j": jj.ravel(), "k": kk.ravel(), "c": acc.ravel()}
            )

    parts = qn.select("qvec").mapInPandas(gram, "j long, k long, c long")
    return parts.groupBy("j", "k").agg(F.sum("c").alias("c"))


def power_iteration_top_pc(
    emb: DataFrame,
    iters: int = 2,
    embedding_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Top principal direction of the (uncentered) int8 corpus by
    FIXED-POINT power iteration over the exact Gram matrix — the
    embedding-analysis rail (dominant axis, anisotropy/collapse
    detection, the first step of PCA whitening) in the repo's
    hash-replayable formulation.

    Everything stays exact integers: ``C = QᵀQ`` (``gram_int8``),
    ``v₀ = (1024, …, 1024)``, each round ``r = C·v`` (BIGINT) is
    renormalized to ∞-norm 1024 by ``sign(r)·(((|r|≫sh)·1024) div
    (max|r|≫sh))`` where ``sh = max(0, bitlen(max|r|) − 50)`` — the
    non-negative-numerator convention that makes truncating division
    equal floor in both engines, with the deterministic pre-shift
    keeping the ·1024 numerator inside int64 at ANY corpus size (the
    shift is a pure integer function of max|r|, so the twin replays
    it bit-for-bit).  After
    ``iters`` rounds the Rayleigh quotient ``(vᵀCv)/(vᵀv)`` comes
    out as ONE rounded IEEE division of exact integers.  Centering
    is a rank-1 update on C left to the caller (documented
    deliberately: the uncentered dominant direction is the embedding
    ANISOTROPY readout).

    Returns ``(dim, component_1024, rayleigh)`` — dim² ≤ 4096-row
    relations throughout; the only data-scale work is the one Gram
    pass.  Overflow: |r| ≤ dim·1024·max|C| ≤ dim·1024·N·127², safe
    in int64 past 10⁹ rows at dim 64."""
    if iters < 1:
        raise ValueError(f"iters must be >= 1, got {iters}")
    C = gram_int8(emb, embedding_col=embedding_col, id_col=id_col)
    C = C.localCheckpoint(eager=False)
    dim = C.groupBy().agg((F.max("j") + 1).alias("d"))

    v = dim.select(
        F.explode(F.sequence(F.lit(0), F.col("d") - 1)).alias("k"),
        F.lit(1024).cast("long").alias("val"),
    )
    for _ in range(int(iters)):
        raw = (
            C.join(v, "k")
            .groupBy("j")
            .agg(F.sum(F.col("c") * F.col("val")).alias("raw"))
        )
        mx = raw.groupBy().agg(F.max(F.abs(F.col("raw"))).alias("m"))
        shifted = (
            raw.crossJoin(F.broadcast(mx))
            .withColumn(
                "sh",
                F.greatest(
                    F.lit(0), F.length(F.bin(F.col("m"))) - F.lit(50)
                ).cast("int"),
            )
            .withColumn(
                "a2",
                F.call_function("shiftright", F.abs(F.col("raw")), F.col("sh")),
            )
            .withColumn(
                "m2", F.call_function("shiftright", F.col("m"), F.col("sh"))
            )
        )
        v = shifted.select(
            F.col("j").alias("k"),
            F.when(F.col("m") == 0, F.lit(0).cast("long"))
            .otherwise(
                F.signum(F.col("raw")).cast("long")
                # greatest(.., 1): the m = 0 case takes the WHEN
                # branch, but ANSI division must not see a 0 divisor
                # even on the untaken side.
                * F.expr("CAST(a2 * 1024 AS BIGINT) div greatest(m2, CAST(1 AS BIGINT))")
            )
            .alias("val"),
        )
    raw3 = (
        C.join(v, "k")
        .groupBy("j")
        .agg(F.sum(F.col("c") * F.col("val")).alias("raw"))
    )
    ray = (
        raw3.join(v.select(F.col("k").alias("j"), "val"), "j")
        .groupBy()
        .agg(
            F.sum(F.col("raw") * F.col("val")).alias("num"),
            F.sum(F.col("val") * F.col("val")).alias("den"),
        )
        .select(
            F.when(
                F.col("den") > 0,
                F.round(F.col("num").cast("double") / F.col("den"), 6),
            ).alias("rayleigh")
        )
    )
    return v.crossJoin(F.broadcast(ray)).select(
        F.col("k").alias("dim"),
        F.col("val").alias("component_1024"),
        "rayleigh",
    )

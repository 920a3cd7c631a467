"""Product Quantization (PQ) on the int8 grid — the third member of
the faiss-style ANN family here (IVF cells: ``similarity.py``; SQ8
scalar codes: ``quantize.py``; PQ sub-vector codebooks: this module),
with every stage in EXACT integer arithmetic so the whole
train → encode → ADC-score pipeline is hash-checkable against a SQL
oracle (the same property ``clustering.kmeans_int8_lloyd`` pins for
flat k-means).

PQ (Jégou/Douze/Schmid, TPAMI 2011): split each dim-D vector into M
contiguous sub-vectors of D/M dims, k-means each subspace to K
codewords, store each vector as M small codes (here M bytes).  A
query is scored against a code via an Asymmetric Distance
Computation (ADC) lookup table: LUT[m][c] = <query_m, codeword_m_c>,
score(codes) = Σ_m LUT[m][codes[m]] — M integer adds per candidate
over a table of M·K entries.

Scale shape:

* training: ONE dataflow with the subspace as a COLUMN (never M
  separate jobs) — sub-vectors are in-row slices, the assignment is
  one Arrow-batched numpy pass with the M×K×(D/M) codebook tensor
  broadcast by value (4 KB at M=4, K=8, D=64), the update one
  map-side-combined groupBy of (sub, cluster, pos) skinny rows;
* encoding: the same assignment kernel, emitting M codes per vector
  — D/M-fold smaller than SQ8 codes (8 B vs 64 B at these params);
* scoring: the LUT is M·K integers broadcast in the closure; the
  scan reads ONLY the codes column, the top-k lowers to
  TakeOrderedAndProject.  No shuffle anywhere in the probe.

Empty clusters keep their previous codeword; rounding is the shared
round-half-up-with-non-negative-numerator rule (see clustering.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from vector_db_handler_spark.operators.quantize import quantize_int8


def _subvectors(q: DataFrame, m: int, d_sub: int) -> DataFrame:
    """(id, sub, sv): in-row slices of the quantized vector — the
    subspace rides as a column so ALL subspaces train in one job."""
    subs = F.explode(
        F.transform(
            F.sequence(F.lit(0), F.lit(m - 1)),
            lambda s: F.struct(
                s.alias("sub"),
                F.slice(F.col("qvec"), s * d_sub + 1, d_sub).alias("sv"),
            ),
        )
    )
    return q.select("vec_id", subs.alias("x")).select(
        "vec_id", F.col("x.sub").alias("sub"), F.col("x.sv").alias("sv")
    )


def _assign_codes(sub: DataFrame, cents: list, m: int, k: int, d_sub: int) -> DataFrame:
    """(vec_id, sub, code) by exact integer argmin within each row's
    subspace; ties break to the smaller code (numpy first-minimum),
    matching the oracle's d²·2K+cid composite key."""
    flat = [int(v) for s in range(m) for c in range(k) for v in cents[s][c]]

    def kernel(batches):  # self-contained: cloudpickled to executors
        import numpy as _np

        cmat = _np.asarray(flat, dtype=_np.int64).reshape(m, k, d_sub)
        for pdf in batches:
            if pdf.empty:
                continue
            x = _np.asarray([_np.asarray(v, dtype=_np.int64) for v in pdf["sv"]])
            csel = cmat[pdf["sub"].to_numpy()]  # (n, k, d_sub)
            d2 = ((x[:, None, :] - csel) ** 2).sum(axis=2)
            out = pdf[["vec_id", "sub"]].copy()
            out["code"] = d2.argmin(axis=1).astype(_np.int64)
            yield out

    return sub.mapInPandas(kernel, schema="vec_id long, sub int, code long")


def train_pq_codebooks(
    emb: DataFrame,
    m: int = 4,
    k: int = 8,
    iters: int = 2,
    embedding_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """``iters`` exact Lloyd iterations PER SUBSPACE, all subspaces in
    one dataflow; returns the codebooks component-exploded —
    ``(sub, cluster_id, pos, c_val, n_members)`` — where
    ``cluster_id`` is the SEED's vec_id (ids 0..k−1's sub-vectors
    seed every subspace, mirroring ``kmeans_int8_lloyd``)."""
    q = quantize_int8(emb, embedding_col=embedding_col, id_col=id_col)
    dim_row = q.select(F.size("qvec").alias("d")).limit(1).collect()
    spark = emb.sparkSession
    out_schema = "sub int, cluster_id long, pos int, c_val long, n_members long"
    if not dim_row:
        return spark.createDataFrame([], out_schema)
    dim = int(dim_row[0]["d"])
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m={m}")
    d_sub = dim // m
    q = q.cache()
    try:
        sub = _subvectors(q, m, d_sub)
        seed_rows = sub.filter(F.col(id_col) < k).orderBy(id_col, "sub").collect()
        if not seed_rows:
            return spark.createDataFrame([], out_schema)
        seed_ids = sorted({int(r[id_col]) for r in seed_rows})
        # cents[s][c] = codeword; seed order = ascending vec_id, so the
        # positional code equals the rank of its seed id (ties in the
        # kernel break to the smaller seed id, like the flat trainer).
        cents = [[None] * len(seed_ids) for _ in range(m)]
        rank = {vid: i for i, vid in enumerate(seed_ids)}
        for r in seed_rows:
            cents[int(r["sub"])][rank[int(r[id_col])]] = [int(v) for v in r["sv"]]
        kk = len(seed_ids)
        sizes: dict[tuple, int] = {}
        for _ in range(iters):
            assigned = _assign_codes(sub, cents, m, kk, d_sub)
            rows = (
                sub.join(assigned, ["vec_id", "sub"])
                .select("sub", "code", F.posexplode("sv").alias("pos", "val"))
                .groupBy("sub", "code", "pos")
                .agg(F.sum("val").alias("s"), F.count("*").alias("n"))
                .withColumn("c", F.expr("((s + 127*n)*2 + n) div (2*n) - 127"))
                .collect()
            )  # M·K·d_sub rows = the whole codebook tensor — broadcast-small
            sizes = {}
            for r in rows:
                cents[r["sub"]][r["code"]][r["pos"]] = int(r["c"])
                sizes[(int(r["sub"]), int(r["code"]))] = int(r["n"])
        out = [
            (s, seed_ids[c], p, cents[s][c][p], sizes.get((s, c), 0))
            for s in range(m)
            for c in range(kk)
            for p in range(d_sub)
        ]
        return spark.createDataFrame(out, out_schema)
    finally:
        q.unpersist()


def _codebook_tensor(codebooks: DataFrame) -> tuple[list, list]:
    """(seed_ids, cents[m][k][d_sub]) from the exploded codebook
    relation — the broadcast-small side of every PQ stage."""
    rows = codebooks.collect()
    if not rows:
        return [], []
    subs = sorted({int(r["sub"]) for r in rows})
    seed_ids = sorted({int(r["cluster_id"]) for r in rows})
    rank = {vid: i for i, vid in enumerate(seed_ids)}
    d_sub = max(int(r["pos"]) for r in rows) + 1
    cents = [
        [[0] * d_sub for _ in seed_ids] for _ in subs
    ]
    for r in rows:
        cents[int(r["sub"])][rank[int(r["cluster_id"])]][int(r["pos"])] = int(
            r["c_val"]
        )
    return seed_ids, cents


def pq_encode(
    emb: DataFrame,
    codebooks: DataFrame,
    embedding_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """(vec_id, sub, code): each vector's M codes (exploded — the
    storage layout packs them to M bytes; exploded rows keep the
    relation SQL-joinable for the oracle)."""
    seed_ids, cents = _codebook_tensor(codebooks)
    if not cents:
        return emb.sparkSession.createDataFrame([], "vec_id long, sub int, code long")
    m, kk, d_sub = len(cents), len(cents[0]), len(cents[0][0])
    q = quantize_int8(emb, embedding_col=embedding_col, id_col=id_col)
    sub = _subvectors(q, m, d_sub)
    codes = _assign_codes(sub, cents, m, kk, d_sub)
    # Emit the SEED id as the public code (stable across engines).
    mapping = [(i, sid) for i, sid in enumerate(seed_ids)]
    mdf = emb.sparkSession.createDataFrame(mapping, "code long, pub_code long")
    return (
        codes.join(F.broadcast(mdf), "code")
        .select("vec_id", "sub", F.col("pub_code").alias("code"))
    )


def pq_adc_topk(
    emb: DataFrame,
    codebooks: DataFrame,
    query_vector,
    k: int = 10,
    embedding_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Asymmetric Distance Computation top-k: score every encoded
    vector as Σ_m LUT[m][code_m] with LUT[m][c] = <q_m, codeword_m_c>
    (all exact integers: the query is quantized with the corpus scale,
    codewords live on the int8 grid).  The LUT rides the closure
    (M·K ints); grouping the exploded codes costs one shuffle on
    vec_id at fixture layout — with packed M-byte codes the scan is
    shuffle-free and the sum is in-row, the production variant.
    Returns (vec_id, qscore) top-k by score, ties to smaller id."""
    from vector_db_handler_spark.operators.quantize import quantize_vector
    from vector_db_handler_spark.operators.quantize import max_abs_scale

    seed_ids, cents = _codebook_tensor(codebooks)
    spark = emb.sparkSession
    if not cents:
        return spark.createDataFrame([], "vec_id long, qscore long")
    m, kk, d_sub = len(cents), len(cents[0]), len(cents[0][0])
    s_val = float(max_abs_scale(emb, embedding_col).collect()[0]["s"] or 0.0)
    if not s_val > 0.0:
        s_val = 1.0
    qq = quantize_vector(query_vector, s_val)
    rank = {sid: i for i, sid in enumerate(seed_ids)}
    lut = {
        (s, sid): sum(
            int(qq[s * d_sub + p]) * int(cents[s][rank[sid]][p])
            for p in range(d_sub)
        )
        for s in range(m)
        for sid in seed_ids
    }
    codes = pq_encode(emb, codebooks, embedding_col, id_col)
    lut_rows = [(s, sid, v) for (s, sid), v in sorted(lut.items())]
    ldf = spark.createDataFrame(lut_rows, "sub int, code long, dot long")
    return (
        codes.join(F.broadcast(ldf), ["sub", "code"])
        .groupBy("vec_id")
        .agg(F.sum("dot").alias("qscore"))
        .orderBy(F.col("qscore").desc(), F.col("vec_id").asc())
        .limit(int(k))
    )


def write_ivfpq_index(
    corpus: DataFrame,
    centroids: DataFrame,
    codebooks: DataFrame,
    path: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> None:
    """IVF-PQ: the faiss production layout — coarse cells prune I/O at
    PLANNING time (partition filters), PQ codes shrink the surviving
    scan to M bytes/vector (4 B here vs 256 B float32: 64×).  Written
    as parquet ``(id, codes BINARY) PARTITIONED BY cell_id`` with the
    codebooks and corpus scale as sidecars the probe reads back.

    Variant note: codes are PQ codes of the VECTOR, not of the
    residual (x − centroid).  Residual-PQ needs codebooks trained on
    residuals (a second ``train_pq_codebooks`` call over
    ``x_q − c_q``, still exact integers on this grid) — same plumbing,
    different training input; the non-residual variant keeps the
    oracle one statement and the recall difference at these K is
    nil on the fixture.

    The build is ONE fused Arrow pass per batch: quantize → cell
    cosine argmax → per-subspace code argmin; no shuffle beyond the
    partitioned write.  Cell assignment ties break to the smaller
    cell id (argmax first-maximum over ascending-sorted ids)."""
    import numpy as np

    from vector_db_handler_spark.operators.quantize import max_abs_scale
    from vector_db_handler_spark.operators.similarity import _collect_matrix

    c_ids, c_mat = _collect_matrix(centroids, id_col, vec_col)
    seed_ids, cents = _codebook_tensor(codebooks)
    if (not c_ids or not cents) and not corpus.isEmpty():
        raise ValueError(
            "write_ivfpq_index: empty centroids or codebooks for a "
            "non-empty corpus — train both before building the index"
        )
    spark = corpus.sparkSession
    s_val = float(max_abs_scale(corpus, vec_col).collect()[0]["s"] or 0.0)
    if not s_val > 0.0:
        s_val = 1.0
    if c_ids:
        order = np.argsort(np.array(c_ids), kind="stable")
        cid_sorted = np.array(c_ids)[order].tolist()
        cunit = c_mat[order].tolist()
    else:
        cid_sorted, cunit = [], []
    m = len(cents)
    kk = len(cents[0]) if cents else 0
    d_sub = len(cents[0][0]) if cents else 0
    flat = [int(v) for s in range(m) for c in range(kk) for v in cents[s][c]]

    def build(batches):  # self-contained: cloudpickled to executors
        import numpy as _np

        cmat = _np.asarray(cunit, dtype=_np.float64)
        cids = _np.asarray(cid_sorted, dtype=_np.int64)
        pq = _np.asarray(flat, dtype=_np.int64).reshape(m, kk, d_sub)
        for pdf in batches:
            if pdf.empty:
                continue
            matf = _np.asarray(
                [_np.asarray(v, dtype=_np.float64) for v in pdf[vec_col]]
            )
            norms = _np.sqrt(_np.einsum("ij,ij->i", matf, matf))
            norms[norms == 0.0] = 1.0
            cells = cids[_np.argmax((matf / norms[:, None]) @ cmat.T, axis=1)]
            q = _np.clip(
                _np.floor(127.0 * matf / s_val + 0.5), -127, 127
            ).astype(_np.int64)
            xs = q.reshape(len(q), m, d_sub)
            codes = _np.empty((len(q), m), dtype=_np.int8)
            for s in range(m):  # M tiny argmins, vectorized over rows
                d2 = ((xs[:, s, None, :] - pq[None, s]) ** 2).sum(axis=2)
                codes[:, s] = d2.argmin(axis=1)
            out = pdf[[id_col]].copy()
            out["codes"] = [row.tobytes() for row in codes]
            out["cell_id"] = cells
            yield out

    indexed = corpus.select(id_col, vec_col).mapInPandas(
        build, schema=f"{id_col} long, codes binary, cell_id long"
    )
    if indexed.isEmpty():
        indexed.write.mode("overwrite").parquet(path)
    else:
        indexed.write.mode("overwrite").partitionBy("cell_id").parquet(path)
    spark.createDataFrame([(s_val,)], "s double").write.mode("overwrite").parquet(
        path + "_scale"
    )
    codebooks.write.mode("overwrite").parquet(path + "_books")


def ivfpq_probe_topk(
    spark,
    path: str,
    centroids: DataFrame,
    query_vector,
    k: int = 10,
    nprobe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Probe a written IVF-PQ index: nearest ``nprobe`` cells chosen
    driver-side (centroids are the broadcast-small side), the scan
    touches ONLY those cell partitions and ONLY the M-byte codes
    column, and scoring is the integer ADC lookup — one numpy gather
    per batch, no shuffle, top-k via TakeOrderedAndProject."""
    import numpy as np

    from vector_db_handler_spark.operators.quantize import quantize_vector
    from vector_db_handler_spark.operators.similarity import _collect_matrix

    c_ids, c_mat = _collect_matrix(centroids, id_col, vec_col)
    if not c_ids:
        probe = []
    else:
        qf = np.asarray([float(v) for v in query_vector], dtype=np.float64)
        qn = np.sqrt((qf * qf).sum())
        scores = c_mat @ (qf / qn if qn > 0 else qf)
        order = np.lexsort((np.array(c_ids), -scores))
        probe = [int(np.array(c_ids)[i]) for i in order[: int(nprobe)]]

    s_val = float(spark.read.parquet(path + "_scale").collect()[0]["s"])
    seed_ids, cents = _codebook_tensor(spark.read.parquet(path + "_books"))
    if not cents:
        return spark.createDataFrame([], f"{id_col} long, cell_id long, qscore long")
    m, kk, d_sub = len(cents), len(cents[0]), len(cents[0][0])
    qq = quantize_vector(query_vector, s_val)
    lut_flat = [
        sum(
            int(qq[s * d_sub + p]) * int(cents[s][c][p]) for p in range(d_sub)
        )
        for s in range(m)
        for c in range(kk)
    ]

    from pyspark.sql.functions import pandas_udf

    @pandas_udf("long")
    def _adc(codes):  # self-contained numpy kernel, Arrow-batched
        import numpy as _np
        import pandas as _pd

        if len(codes) == 0:
            return _pd.Series(_np.zeros(0, dtype=_np.int64))
        lut = _np.asarray(lut_flat, dtype=_np.int64).reshape(m, kk)
        cmat = _np.frombuffer(b"".join(codes), dtype=_np.int8).reshape(
            len(codes), m
        ).astype(_np.int64)
        return _pd.Series(lut[_np.arange(m)[None, :], cmat].sum(axis=1))

    idx = spark.read.parquet(path).filter(F.col("cell_id").isin(probe or [-1]))
    return (
        idx.withColumn("qscore", _adc(F.col("codes")))
        .orderBy(F.col("qscore").desc(), F.col(id_col).asc())
        .limit(int(k))
        .select(id_col, "cell_id", "qscore")
    )

"""Lexical retrieval: BM25 top-k over an inverted term index.

The reference's retrieval surface is purely vector KNN
(``document_ingestor.py:332-364``); a corpus engine at 100 TB also
needs the LEXICAL rail — BM25 is the standard scoring function, and
its dataflow (term postings → per-doc partial scores → top-k) is the
canonical inverted-index shape: tf/df aggregates are map-side
combined, corpus constants ride a 1-row broadcast, and only docs
containing ≥ 1 query term ever appear downstream (the postings join
is the filter).

Exactness design (cross-engine hash parity): BM25 with k1 = 6/5 and
b = 3/4 clears algebraically to ONE integer ratio per (doc, term) —

    score_t = 22·tf·A·(2N − 2df + 1)
              ─────────────────────────────────
              (10·A·tf + 3·A + 9·dl)·(2df + 1)

where A = round(avgdl) (round-half-up integer), dl = doc length, and
the classic +0.5 idf smoothing becomes the integer (2N−2df+1)/(2df+1).
Each term score is lowered to micro-units with the repo's
round-half-up integer division ((2·num·10⁶ + den) div (2·den)), the
per-doc sum accumulates in BIGINT (order-independent — the one place
float BM25 implementations diverge run-to-run), and the final
score = sum/10⁶ is a single correctly-rounded division.  Exact while
22·tf·A·2N·10⁶ < 2⁶³ — holds past 10⁹ docs at web-scale A ≈ 500;
beyond that, swap the micro-unit step to double (every op still IEEE
correctly-rounded; only half-way micro-unit boundaries could differ).

Scale shape: tokenize scan (narrow; each token carries its doc's
length, so tf AND dl come out of one groupBy — no corpus-sized doc_id
join) → tf groupBy (map-side combined, postings for QUERY terms only —
the isin prunes before the shuffle) → df from tf (tiny: ≤ |query|
rows, broadcast back) → constants on a 1-row broadcast → global top-k
via TakeOrderedAndProject (no full sort).  Zipf skew on hot query
terms is absorbed by the partial aggregation; no Python anywhere.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _bm25_rank_topk(
    tf: DataFrame, stats: DataFrame, k: int, id_col: str = "doc_id"
) -> DataFrame:
    """The BM25 DECISION CORE, shared verbatim by the scan-time
    `bm25_topk` and the persisted-index `bm25_index_topk` so the two
    paths cannot drift (the curation-stream extraction discipline).

    ``tf``: ``(id_col, term, tf, dl)`` postings already pruned to the
    query's terms — one row per (doc, query-term) the doc contains.
    ``stats``: 1 row ``(n_docs, avg_dl)``.  df is derived HERE from
    the pruned postings (one row per (doc, term) ⇒ ``count(*)`` per
    term IS the document frequency), so both callers inherit it."""
    df_counts = tf.groupBy("term").agg(F.count("*").alias("df"))
    scored = (
        tf.join(F.broadcast(df_counts), "term")
        .crossJoin(F.broadcast(stats))
        .withColumn(
            "num", F.expr("22 * tf * avg_dl * (2*n_docs - 2*df + 1)")
        )
        .withColumn(
            "den", F.expr("(10*avg_dl*tf + 3*avg_dl + 9*dl) * (2*df + 1)")
        )
        .withColumn("u", F.expr("(2*num*1000000 + den) div (2*den)"))
    )
    per_doc = scored.groupBy(id_col).agg(
        (F.sum("u").cast("double") / F.lit(1000000.0)).alias("score")
    )
    # Global top-k FIRST (lowers to TakeOrderedAndProject — per-partition
    # heaps, no full sort/single-partition shuffle), THEN rank the k
    # survivors with a window that only ever sees k rows.
    topk = per_doc.orderBy(F.col("score").desc(), F.col(id_col).asc()).limit(int(k))
    w = Window.orderBy(F.col("score").desc(), F.col(id_col).asc())
    return topk.withColumn("rank", F.row_number().over(w)).select(
        id_col, "score", "rank"
    )


def bm25_topk(
    docs: DataFrame,
    query_terms: Sequence[str],
    k: int = 10,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Top-``k`` docs by exact-integer BM25 (k1 = 1.2, b = 0.75)
    against ``query_terms``.  Output ``(doc_id, score, rank)``, ranked
    score DESC then doc_id ASC."""
    terms = [str(t) for t in query_terms]
    # Per-doc length rides WITH each exploded token, so tf and dl come
    # out of ONE groupBy — no corpus-sized doc_id join downstream.
    dl_col = F.size(F.split(F.col(text_col), " ", -1)).cast("long")
    toks = docs.select(
        F.col(id_col),
        dl_col.alias("dl"),
        F.explode(F.split(F.col(text_col), " ", -1)).alias("term"),
    )
    stats = docs.select(dl_col.alias("dl")).agg(
        F.count("*").alias("n_docs"), F.sum("dl").alias("total_len")
    ).select(
        "n_docs",
        # A = round-half-up(total/N) via non-negative integer division
        F.expr("(2*total_len + n_docs) div (2*n_docs)").alias("avg_dl"),
    )
    tf = (
        toks.filter(F.col("term").isin(terms))
        .groupBy(id_col, "term")
        .agg(F.count("*").alias("tf"), F.first("dl").alias("dl"))
    )
    return _bm25_rank_topk(tf, stats, int(k), id_col)


def rrf_fuse(
    rankings: Sequence[DataFrame],
    k: int = 10,
    c: int = 60,
    id_col: str = "doc_id",
) -> DataFrame:
    """Reciprocal Rank Fusion (Cormack et al., SIGIR'09) of N ranked
    lists: ``rrf(d) = Σ_r 1/(c + rank_r(d))`` over the rankers that
    returned ``d`` — the standard score-free way to combine lexical
    and vector retrieval (no score normalization across incomparable
    scales, which is why production hybrid search defaults to it over
    linear score mixing).

    Each input carries ``(id_col, rank)`` with rank from 1.  The
    fused score is deterministic cross-engine: ranks are integers,
    each ``1/(c+rank)`` is one correctly-rounded IEEE division, and
    the contributions are summed in the FIXED written order of the
    expression (never a data-order aggregate), so equal rank profiles
    give bit-equal scores; ties break by id.

    Scale shape: candidate lists are top-k (driver-bounded, broadcast
    by construction), so fusion is a chain of small full-outer joins
    + one codegen projection — the corpus is never touched here; the
    cost lives in the upstream rankers.  Output:
    ``(id_col, rank_1..rank_N, rrf, rank)``."""
    if not rankings:
        raise ValueError("no rankings given")
    fused = None
    for i, r in enumerate(rankings, 1):
        side = r.select(F.col(id_col), F.col("rank").alias(f"rank_{i}"))
        fused = side if fused is None else fused.join(side, id_col, "full_outer")
    contrib = [
        F.coalesce(
            F.lit(1.0) / (F.lit(c) + F.col(f"rank_{i}")), F.lit(0.0)
        )
        for i in range(1, len(rankings) + 1)
    ]
    total = contrib[0]
    for term in contrib[1:]:
        total = total + term
    scored = fused.withColumn("rrf", F.round(total, 6))
    topk = scored.orderBy(F.col("rrf").desc(), F.col(id_col).asc()).limit(int(k))
    w = Window.orderBy(F.col("rrf").desc(), F.col(id_col).asc())
    return topk.withColumn("rank", F.row_number().over(w))


def rank_eval_metrics(
    results: DataFrame,
    truth: DataFrame,
    query_col: str = "query_id",
    item_col: str = "neighbor_id",
    rank_col: str = "rank",
    rel_col: str = "rel",
) -> DataFrame:
    """Rank-aware retrieval evaluation — exact-arithmetic MRR and
    nDCG per query, the metrics the recall harnesses deliberately
    don't compute (recall says WHETHER the true neighbours surfaced;
    these say WHERE they landed, which is what a reranker budget or a
    serving cutoff is tuned on).

    ``results``: ``(query, item, rank)`` — any retrieval rail's
    ranked output.  ``truth``: ``(query, item, rel)`` with integer
    relevance grades ≥ 1 (binary truth uses rel = 1).

    Exactness (both metrics are classically irrational — 1/rank and
    1/log2(i+1) sums — so the repo's fixed-point discipline applies):

    * ``mrr_micro = 1_000_000 div first_relevant_rank`` — exact
      integer division, 0 when nothing relevant surfaced.
    * ``dcg_scaled = Σ (2^20 · rel) div L(rank + 1)`` with ``L`` the
      1/1024-bit fixed-point log2 (`nb_classifier.ilog2_kilo`) — the
      classic rel/log2(pos+1) DCG with every term an exact integer
      division (L(rank+1) ≥ 1024 for rank ≥ 1, never 0).
    * ``idcg_scaled`` — the same formula over the IDEAL ordering
      (rel DESC, item ASC — pinned tie-break) capped at each query's
      retrieval depth; ``ndcg = dcg/idcg`` is the one IEEE division,
      rounded to 6.

    Returns ``(query, n_results, n_relevant, mrr_micro, dcg_scaled,
    idcg_scaled, ndcg)``.

    Scale shape: one results⨝truth equi-join on (query, item), two
    map-side-combined per-query aggregates, one window over the
    TRUTH relation per query (|truth| rows, the eval set — never the
    corpus).  No collect."""
    from pyspark.sql import Window

    from vector_db_handler_spark.operators.nb_classifier import ilog2_kilo

    res = results.select(
        F.col(query_col).alias("q"),
        F.col(item_col).alias("item"),
        F.col(rank_col).cast("long").alias("rnk"),
    )
    tru = truth.select(
        F.col(query_col).alias("q"),
        F.col(item_col).alias("item"),
        F.col(rel_col).cast("long").alias("rel"),
    ).filter(F.col("rel") > 0)
    depth = res.groupBy("q").agg(F.count(F.lit(1)).alias("n_results"))
    hits = res.join(tru, ["q", "item"], "left").select(
        "q",
        "rnk",
        F.coalesce("rel", F.lit(0)).alias("rel"),
    )
    term = F.when(
        F.col("rel") > 0,
        F.floor(
            (F.col("rel") * F.lit(1 << 20))
            / ilog2_kilo(F.col("rnk") + F.lit(1))
        ),
    ).otherwise(F.lit(0))
    per_q = hits.groupBy("q").agg(
        F.sum((F.col("rel") > 0).cast("long")).alias("n_relevant"),
        F.min(F.when(F.col("rel") > 0, F.col("rnk"))).alias("first_rank"),
        F.sum(term).cast("long").alias("dcg_scaled"),
    )
    w = Window.partitionBy("q").orderBy(
        F.col("rel").desc(), F.col("item").asc()
    )
    ideal = (
        tru.withColumn("pos", F.row_number().over(w))
        .join(depth, "q")
        .filter(F.col("pos") <= F.col("n_results"))
        .select(
            "q",
            F.floor(
                (F.col("rel") * F.lit(1 << 20))
                / ilog2_kilo(F.col("pos") + F.lit(1))
            ).alias("t"),
        )
        .groupBy("q")
        .agg(F.sum("t").cast("long").alias("idcg_scaled"))
    )
    return (
        depth.join(per_q, "q", "left")
        .join(ideal, "q", "left")
        .select(
            F.col("q").alias(query_col),
            "n_results",
            F.coalesce("n_relevant", F.lit(0)).cast("long").alias("n_relevant"),
            F.coalesce(
                F.floor(F.lit(1_000_000) / F.col("first_rank")), F.lit(0)
            )
            .cast("long")
            .alias("mrr_micro"),
            F.coalesce("dcg_scaled", F.lit(0)).cast("long").alias("dcg_scaled"),
            F.coalesce("idcg_scaled", F.lit(0)).cast("long").alias("idcg_scaled"),
            F.when(
                F.coalesce("idcg_scaled", F.lit(0)) > 0,
                F.round(
                    F.col("dcg_scaled").cast("double")
                    / F.col("idcg_scaled").cast("double"),
                    6,
                ),
            ).alias("ndcg"),
        )
    )


def mmr_diversified_topk(
    emb: DataFrame,
    query_vector: Sequence[float],
    k: int = 10,
    n_candidates: int = 50,
    lam_milli: int = 700,
    embedding_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Maximal-Marginal-Relevance DIVERSIFIED top-k (Carbonell &
    Goldstein, SIGIR'98) — the serving-side answer to "the top 10 are
    10 near-duplicates": greedily select ``k`` results from the
    ``n_candidates`` best by

        mmr(c) = λ·score(c) − (1−λ)·max_{s ∈ selected} sim(c, s)

    trading relevance against redundancy.  A vector store whose
    corpus has near-dup clusters (the exact situation the dedup rails
    measure) needs this rail at serve time for any candidate the
    upstream dedup spared.

    Exactness: scores and pairwise sims are exact int8-grid integer
    dot products (the `quantized_knn` grid — one corpus-scale
    broadcast, one Arrow-batched pass), λ rides in milli-units, so

        mmr_milli = lam_milli·score − (1000 − lam_milli)·max_sim

    is BIGINT arithmetic both engines reproduce bit-for-bit; max over
    the empty selected set is 0, so step 1's mmr is lam_milli·score.
    Ties break by (mmr DESC, id ASC) — a total order.

    Scale shape: the DISTRIBUTED work is candidate generation —
    quantize + score + ``TakeOrderedAndProject`` down to
    ``n_candidates`` rows.  Greedy MMR itself is inherently
    sequential (each pick conditions the next), O(k·n) on a
    k×n_candidates grid — a BOUNDED driver-side step (≤ n_candidates
    rows regardless of corpus size, the `_collect_matrix` small-side
    discipline), never corpus work.  Output: ``(step, id, qscore,
    mmr_milli)``, one row per selected result, step = selection
    order.  No reference analog; extension surface (the reference's
    search returns the raw top-k, document_ingestor.py:332-364)."""
    from vector_db_handler_spark.operators.quantize import (
        Q_MAX,
        max_abs_scale,
    )

    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    if n_candidates < k:
        raise ValueError(
            f"n_candidates ({n_candidates}) must be >= k ({k})"
        )
    if not 0 <= int(lam_milli) <= 1000:
        raise ValueError(f"lam_milli must be in [0, 1000], got {lam_milli}")

    from pyspark.sql.types import (
        ArrayType,
        LongType,
        StructField,
        StructType,
    )

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
            StructField("qscore", LongType(), False),
            StructField("qvec", ArrayType(LongType()), False),
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
                -Q_MAX,
                Q_MAX,
            ).astype(np.int64)
            mat = np.asarray(
                [np.asarray(v, dtype=np.float64) for v in pdf[embedding_col]]
            )
            q = np.clip(np.floor(127.0 * mat / s + 0.5), -Q_MAX, Q_MAX).astype(
                np.int64
            )
            out = pdf[[id_col]].copy()
            out["qscore"] = q @ qq
            out["qvec"] = list(q)
            yield out

    cand = (
        joined.mapInPandas(score, out_schema)
        .orderBy(F.col("qscore").desc(), F.col(id_col).asc())
        .limit(int(n_candidates))
        .collect()  # bounded: n_candidates rows, corpus-independent
    )

    remaining = {
        r[id_col]: (int(r["qscore"]), [int(x) for x in r["qvec"]])
        for r in cand
    }
    lam = int(lam_milli)
    selected: list[tuple[int, object, int, int]] = []
    chosen_vecs: list[list[int]] = []
    while remaining and len(selected) < int(k):
        best = None
        for cid, (sc, vec) in remaining.items():
            max_sim = max(
                (sum(a * b for a, b in zip(vec, sv)) for sv in chosen_vecs),
                default=0,
            )
            mmr = lam * sc - (1000 - lam) * max_sim
            key = (-mmr, cid)
            if best is None or key < best[0]:
                best = (key, cid, sc, mmr)
        _, cid, sc, mmr = best
        selected.append((len(selected) + 1, cid, sc, mmr))
        chosen_vecs.append(remaining.pop(cid)[1])

    spark = emb.sparkSession
    out = StructType(
        [
            StructField("step", LongType(), False),
            StructField(id_col, id_field.dataType, id_field.nullable),
            StructField("qscore", LongType(), False),
            StructField("mmr_milli", LongType(), False),
        ]
    )
    return spark.createDataFrame(selected, out)


# ---------------------------------------------------------------------------
# Persisted BM25 inverted index: write / append / probe / compact.
#
# The vector rails already have the build-once/probe-many lifecycle
# (LSH, IVF, IVF-PQ, graph-ANN written indexes); this gives the
# LEXICAL rail the same shape.  At 100 TB the tokenize+tf scan is the
# expensive leg of `bm25_topk` — the index pays it ONCE per segment,
# and every probe afterwards reads only the query's term buckets.
#
# Store layout under ``index_path`` (the graph-index / drift-store
# segment discipline):
#
#   meta/                 1 row (n_buckets) — written once at build
#   postings/<segment>/   (term, doc_id, tf, dl) partitioned by
#                         bucket = crc32(term) % n_buckets, so a probe
#                         prunes to the query's buckets at PLANNING
#                         time (PartitionFilters, never a full scan)
#   stats/<segment>/      1 row (n_docs_b, total_len_b) — the corpus
#                         constants' ADDITIVE summary; written AFTER
#                         the postings dir, so its _SUCCESS is the
#                         segment's commit marker
#
# BM25 state is mergeable by construction: postings rows are disjoint
# across segments (one (doc, term) row lives in exactly one segment —
# the id-epoch contract below), df(term) = count of postings rows per
# term over committed segments, and the corpus constants (N, Σdl) are
# integer sums of the per-segment stats.  The probe therefore equals
# the scan-time `bm25_topk` over the UNION of the segment corpora
# bit-for-bit — same integers, same `_bm25_rank_topk` code object.
#
# ID-EPOCH CONTRACT (same as the graph index's append): doc ids must
# be unique ACROSS segments — a re-ingested id would double its tf
# rows and corrupt df.  Feed arrivals through the dedup rail first.
#
# Bucket hash: crc32(utf8(term)) — Spark `F.crc32` and Python
# `zlib.crc32` compute the same standard CRC-32, so the probe derives
# the query's buckets DRIVER-SIDE with zero Spark jobs.
# ---------------------------------------------------------------------------

BM25_DEFAULT_BUCKETS = 16


def _bm25_postings(
    docs: DataFrame, text_col: str, id_col: str, n_buckets: int
) -> DataFrame:
    """One segment's postings: ``(bucket, term, doc_id, tf, dl)`` —
    the same tokenize→one-groupBy shape as `bm25_topk` (dl rides with
    each token, so tf and dl come out of one map-side-combined
    shuffle), WITHOUT the query-term pruning: the index serves any
    future query."""
    dl_col = F.size(F.split(F.col(text_col), " ", -1)).cast("long")
    toks = docs.select(
        F.col(id_col).alias("doc_id"),
        dl_col.alias("dl"),
        F.explode(F.split(F.col(text_col), " ", -1)).alias("term"),
    )
    return (
        toks.groupBy("doc_id", "term")
        .agg(F.count("*").alias("tf"), F.first("dl").alias("dl"))
        .withColumn(
            "bucket",
            F.pmod(
                F.crc32(F.col("term").cast("binary")), F.lit(int(n_buckets))
            ).cast("int"),
        )
    )


def _bm25_segment_stats(docs: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """One segment's additive corpus constants: ``(n_docs_b,
    total_len_b)`` over ALL the segment's docs (docs with no query
    term still count toward N and avgdl, exactly as in `bm25_topk`)."""
    dl_col = F.size(F.split(F.col(text_col), " ", -1)).cast("long")
    return docs.select(dl_col.alias("dl")).agg(
        F.count("*").cast("long").alias("n_docs_b"),
        F.coalesce(F.sum("dl"), F.lit(0)).cast("long").alias("total_len_b"),
    )


def _write_bm25_segment(
    docs: DataFrame,
    index_path: str,
    segment: str,
    text_col: str,
    id_col: str,
    n_buckets: int,
) -> None:
    import os

    _bm25_postings(docs, text_col, id_col, n_buckets).write.mode(
        "overwrite"
    ).partitionBy("bucket").parquet(os.path.join(index_path, "postings", segment))
    # stats is written LAST: its _SUCCESS is the segment commit marker,
    # so a torn segment (crash between the two writes) is invisible.
    _bm25_segment_stats(docs, text_col, id_col).coalesce(1).write.mode(
        "overwrite"
    ).parquet(os.path.join(index_path, "stats", segment))


def write_bm25_index(
    docs: DataFrame,
    index_path: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = BM25_DEFAULT_BUCKETS,
) -> None:
    """Build the persisted BM25 inverted index from the base corpus:
    ``meta/`` (bucket count, written once — every later append and
    probe reads it back so the bucket hash can never diverge) plus the
    ``base`` segment."""
    import os

    if n_buckets < 1:
        raise ValueError(f"n_buckets must be >= 1, got {n_buckets}")
    existing = _committed_bm25_segments(index_path)
    if existing:
        # A rebuild would overwrite meta/ and base/ but leave earlier
        # delta segments committed — the fresh index would silently
        # serve the old arrivals.  Refuse; rebuilds go to a fresh path.
        raise ValueError(
            f"{index_path} already holds committed segments {existing} — "
            "write_bm25_index builds a NEW index; append/compact the "
            "existing one or point at a fresh path"
        )
    spark = docs.sparkSession
    spark.createDataFrame(
        [(int(n_buckets),)], "n_buckets long"
    ).coalesce(1).write.mode("overwrite").parquet(os.path.join(index_path, "meta"))
    _write_bm25_segment(docs, index_path, "base", text_col, id_col, n_buckets)


def _committed_bm25_segments(index_path: str) -> list[str]:
    """Segment names with a committed ``stats/<segment>/_SUCCESS``
    marker AND a postings dir, excluding segments folded by a
    FINALIZED compaction (manifest present + its target committed —
    the graph-index merge-manifest discipline, so a reader mid-crash
    never double-counts or loses a segment)."""
    import os

    stats_root = os.path.join(index_path, "stats")
    if not os.path.isdir(stats_root):
        return []
    segs = [
        d
        for d in os.listdir(stats_root)
        if os.path.exists(os.path.join(stats_root, d, "_SUCCESS"))
        and os.path.isdir(os.path.join(index_path, "postings", d))
    ]
    mdir = os.path.join(index_path, "compact_manifest")
    if os.path.exists(os.path.join(mdir, "_SUCCESS")):
        import json

        with open(os.path.join(mdir, "manifest.json")) as fh:
            m = json.load(fh)
        # the manifest only takes effect once its target is committed;
        # before that, readers keep serving the folded segments.
        if m["target"] in segs:
            folded = set(m["folded"])
            segs = [s for s in segs if s not in folded]
    return sorted(segs)


def bm25_index_topk(
    spark,
    index_path: str,
    query_terms: Sequence[str],
    k: int = 10,
) -> DataFrame:
    """Probe the persisted index: top-``k`` docs by the SAME
    exact-integer BM25 as `bm25_topk` over the union of the committed
    segments' corpora — bit-for-bit, by shared `_bm25_rank_topk` core
    and exact integer stats merging.

    Serve shape: the query's buckets are derived driver-side
    (zlib.crc32 ≡ `F.crc32`, zero jobs), each segment scan carries a
    partition filter on those buckets (planning-time pruning — at
    100 TB a 3-term probe reads ≤ 3/n_buckets of each segment) plus
    the term row-filter; stats dirs are 1 row each.  Only the single
    tiny ``meta/`` read leaves the driver before the probe plan runs."""
    import os
    import zlib

    terms = sorted({str(t) for t in query_terms})
    if not terms:
        raise ValueError("query_terms must be non-empty")
    segs = _committed_bm25_segments(index_path)
    if not segs:
        raise ValueError(
            f"no committed segments under {index_path} — build with "
            "write_bm25_index first"
        )
    n_buckets = int(
        spark.read.parquet(os.path.join(index_path, "meta")).first()["n_buckets"]
    )
    buckets = sorted({zlib.crc32(t.encode("utf-8")) % n_buckets for t in terms})
    tf = None
    stats = None
    for seg in segs:
        p = (
            spark.read.parquet(os.path.join(index_path, "postings", seg))
            .filter(F.col("bucket").isin(buckets))
            .filter(F.col("term").isin(terms))
            .select("doc_id", "term", "tf", "dl")
        )
        s = spark.read.parquet(os.path.join(index_path, "stats", seg))
        tf = p if tf is None else tf.unionByName(p)
        stats = s if stats is None else stats.unionByName(s)
    merged = stats.agg(
        F.sum("n_docs_b").cast("long").alias("n_docs"),
        F.sum("total_len_b").cast("long").alias("total_len"),
    ).select(
        "n_docs",
        F.expr("(2*total_len + n_docs) div (2*n_docs)").alias("avg_dl"),
    )
    return _bm25_rank_topk(tf, merged, int(k), "doc_id")


def append_bm25_index(
    docs: DataFrame,
    index_path: str,
    segment: str,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> None:
    """Fold a new corpus drop into the index as its own segment —
    O(drop) work (tokenize + one partitioned write), nothing rescans
    existing segments.  REFUSES a committed segment name (a blind
    re-append would double tf rows and corrupt df — the id-epoch
    contract's physical guard); the bucket count comes from ``meta/``
    so the hash can never diverge from the base build."""
    import os

    if segment.startswith("merged-"):
        # reserved for compaction targets: a user segment named
        # merged-<n> could collide with a future compaction's target
        # and be silently folded out by the manifest.
        raise ValueError(
            f"segment name {segment!r} is reserved for compaction targets"
        )
    if segment in ("base",) or segment in _committed_bm25_segments(index_path):
        raise ValueError(
            f"segment {segment!r} is already committed under {index_path} — "
            "append each corpus drop under a fresh segment name"
        )
    spark = docs.sparkSession
    n_buckets = int(
        spark.read.parquet(os.path.join(index_path, "meta")).first()["n_buckets"]
    )
    _write_bm25_segment(docs, index_path, segment, text_col, id_col, n_buckets)


def compact_bm25_index(spark, index_path: str) -> int:
    """LSM minor→major compaction: fold ALL committed segments into
    one ``merged-<gen>`` segment (probe cost returns to one scan per
    bucket instead of one per segment).  Returns the number of
    segments folded (0 = nothing to do).

    Crash discipline (the graph-index merge-manifest pattern): the
    manifest (folded names + target) is written FIRST, then the target
    segment; readers ignore the manifest until its target is committed,
    so every crash point serves exactly one complete copy of the data.
    Physical cleanup of folded dirs happens last and is pure space
    reclamation."""
    import json
    import os
    import shutil

    segs = _committed_bm25_segments(index_path)
    if len(segs) <= 1:
        return 0
    gens = [int(s.split("-", 1)[1]) for s in segs if s.startswith("merged-")]
    target = f"merged-{max(gens) + 1 if gens else 0}"
    mdir = os.path.join(index_path, "compact_manifest")
    shutil.rmtree(mdir, ignore_errors=True)
    os.makedirs(mdir)
    with open(os.path.join(mdir, "manifest.json"), "w") as fh:
        json.dump({"folded": segs, "target": target}, fh)
    with open(os.path.join(mdir, "_SUCCESS"), "w"):
        pass
    n_buckets = int(
        spark.read.parquet(os.path.join(index_path, "meta")).first()["n_buckets"]
    )
    postings = None
    stats = None
    for seg in segs:
        p = spark.read.parquet(os.path.join(index_path, "postings", seg))
        s = spark.read.parquet(os.path.join(index_path, "stats", seg))
        postings = p if postings is None else postings.unionByName(p)
        stats = s if stats is None else stats.unionByName(s)
    postings.write.mode("overwrite").partitionBy("bucket").parquet(
        os.path.join(index_path, "postings", target)
    )
    stats.agg(
        F.sum("n_docs_b").cast("long").alias("n_docs_b"),
        F.sum("total_len_b").cast("long").alias("total_len_b"),
    ).coalesce(1).write.mode("overwrite").parquet(
        os.path.join(index_path, "stats", target)
    )
    # target committed: the manifest is now in effect — reclaim space.
    for seg in segs:
        shutil.rmtree(os.path.join(index_path, "postings", seg), ignore_errors=True)
        shutil.rmtree(os.path.join(index_path, "stats", seg), ignore_errors=True)
    return len(segs)


def bm25_index_stats(spark, index_path: str) -> DataFrame:
    """ANALYZE for the persisted BM25 index: one row of store-health
    counters an operator reads before trusting a probe — committed
    segment / bucket counts, the merged corpus constants (docs, total
    length, the probe's round-half-up avg_dl), postings volume, vocab
    size, and distinct posted doc ids (under the id-epoch contract
    ``n_docs_posted == n_docs``; a gap means a duplicate or dropped
    doc id and the probe's df is suspect).  The `knn_graph_index_stats`
    posture, for the lexical rail: exact counts over the stored
    relations, never estimates."""
    import os

    segs = _committed_bm25_segments(index_path)
    if not segs:
        raise ValueError(
            f"no committed segments under {index_path} — build with "
            "write_bm25_index first"
        )
    n_buckets = int(
        spark.read.parquet(os.path.join(index_path, "meta")).first()["n_buckets"]
    )
    postings = None
    stats = None
    for seg in segs:
        p = spark.read.parquet(os.path.join(index_path, "postings", seg))
        s = spark.read.parquet(os.path.join(index_path, "stats", seg))
        postings = p if postings is None else postings.unionByName(p)
        stats = s if stats is None else stats.unionByName(s)
    cons = stats.agg(
        F.sum("n_docs_b").cast("long").alias("n_docs"),
        F.sum("total_len_b").cast("long").alias("total_len"),
    ).select(
        "n_docs",
        "total_len",
        F.expr("(2*total_len + n_docs) div (2*n_docs)").alias("avg_dl"),
    )
    vol = postings.agg(
        F.count(F.lit(1)).cast("long").alias("n_postings"),
        F.countDistinct("term").cast("long").alias("n_terms"),
        F.countDistinct("doc_id").cast("long").alias("n_docs_posted"),
    )
    return (
        cons.crossJoin(vol)
        .withColumn("n_segments", F.lit(len(segs)).cast("long"))
        .withColumn("n_buckets", F.lit(n_buckets).cast("long"))
        .select(
            "n_segments",
            "n_buckets",
            "n_docs",
            "total_len",
            "avg_dl",
            "n_postings",
            "n_terms",
            "n_docs_posted",
        )
    )

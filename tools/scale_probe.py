#!/usr/bin/env python
"""Scale probe: replicate the embeddings fixture N× (deterministic
jitter so rows are distinct) and measure the vector hot paths at a
corpus 100× the bench fixture.  Evidence for the scaling claims in
PERF.md — run manually, not part of the driver contract."""

from __future__ import annotations

import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from vector_db_handler_spark import driver_queries as dq
from vector_db_handler_spark.operators import knn as knn_ops
from vector_db_handler_spark.operators import similarity as sim_ops
from vector_db_handler_spark.session import get_spark


def main(factor: int = 100) -> None:
    spark = get_spark("scale-probe")
    base = spark.read.parquet("/root/testdata/sf0.1/embeddings.parquet")
    n_base = base.count()
    path = os.path.join(tempfile.gettempdir(), f"vdh_scale_{factor}x")
    if not os.path.exists(path):
        # Deterministic replication: shift ids, jitter one dimension by
        # the replica index so vectors are distinct.
        reps = spark.range(factor).withColumnRenamed("id", "rep")
        big = (
            base.crossJoin(reps)
            .select(
                (F.col("vec_id") + F.col("rep") * n_base).alias("vec_id"),
                F.transform(
                    "embedding", lambda v, i: v + F.when(i == 0, F.col("rep") * 1e-4).otherwise(0.0)
                ).cast("array<float>").alias("embedding"),
                "label",
            )
        )
        big.repartition(32).write.mode("overwrite").parquet(path)
    big = spark.read.parquet(path)
    n = big.count()
    print(f"corpus: {n} rows ({factor}x bench fixture)")

    t0 = time.perf_counter()
    knn_ops.knn(big, dq.QUERY_VEC, k=10, tie_break_col="vec_id").collect()
    t0 = time.perf_counter()  # warm run
    knn_ops.knn(big, dq.QUERY_VEC, k=10, tie_break_col="vec_id").collect()
    print(f"knn_topk  brute-force @ {n} rows: {time.perf_counter() - t0:.2f}s")

    cents = big.filter(F.col("vec_id") % (n // 64) == 0).cache()
    n_cells = cents.count()
    idx_path = path + "_ivf"
    if not os.path.exists(idx_path):
        sim_ops.write_ivf_index(big, cents, idx_path)  # build once, partitioned by cell
    t0 = time.perf_counter()
    sim_ops.ivf_probe_table(spark, idx_path, cents, dq.QUERY_VEC, k=10, nprobe=4).collect()
    t0 = time.perf_counter()  # warm
    sim_ops.ivf_probe_table(spark, idx_path, cents, dq.QUERY_VEC, k=10, nprobe=4).collect()
    print(f"ivf_probe (4/{n_cells} cells, written index) @ {n} rows: {time.perf_counter() - t0:.2f}s")

    from vector_db_handler_spark.operators import quantize as quantize_ops

    sq_path = path + "_ivfsq"
    if not os.path.exists(os.path.join(sq_path, "_SUCCESS")):
        t0 = time.perf_counter()
        quantize_ops.write_ivfsq_index(big, cents, sq_path)
        print(f"ivfsq build @ {n} rows: {time.perf_counter() - t0:.2f}s")
    quantize_ops.ivfsq_probe_table(spark, sq_path, cents, dq.QUERY_VEC, k=10, nprobe=4).collect()
    t0 = time.perf_counter()  # warm
    quantize_ops.ivfsq_probe_table(spark, sq_path, cents, dq.QUERY_VEC, k=10, nprobe=4).collect()
    print(f"ivfsq_probe (4/{n_cells} cells, int8) @ {n} rows: {time.perf_counter() - t0:.2f}s")


def lsh(factor: int = 100) -> None:
    """Text-dedup twin of the vector probe: build the written LSH index
    on a factor× replicated documents corpus (suffix-tagged so replicas
    are near-dups of their source, not exact dups), then time a 25-doc
    probe against it."""
    from vector_db_handler_spark.operators import dedup as dedup_ops

    spark = get_spark("scale-probe-lsh")
    base = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
    n_base = base.count()
    path = os.path.join(tempfile.gettempdir(), f"vdh_docs_{factor}x")
    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        reps = spark.range(factor).withColumnRenamed("id", "rep")
        big = base.crossJoin(reps).select(
            (F.col("doc_id") + F.col("rep") * n_base).alias("doc_id"),
            F.concat(F.col("text"), F.lit(" rep"), F.col("rep")).alias("text"),
        )
        big.repartition(32).write.mode("overwrite").parquet(path)
    big = spark.read.parquet(path)
    print(f"corpus: {big.count()} docs ({factor}x bench fixture)")

    idx_path = path + "_lsh"
    t0 = time.perf_counter()
    if not os.path.exists(os.path.join(idx_path, "bands", "_SUCCESS")):
        dedup_ops.write_lsh_index(big, idx_path)
        print(f"lsh_index build @ {factor}x: {time.perf_counter() - t0:.2f}s")
    queries = big.filter(F.col("doc_id") < 25)
    dedup_ops.lsh_probe_table(spark, idx_path, queries, 0.6).collect()
    t0 = time.perf_counter()  # warm
    rows = dedup_ops.lsh_probe_table(spark, idx_path, queries, 0.6).collect()
    print(f"lsh_probe (25 docs) @ {factor}x corpus: {time.perf_counter() - t0:.2f}s, {len(rows)} matches")


def neardup(n_rows: int = 100_000, n_blocks: int = 32) -> None:
    """Exact all-pairs cosine near-dup at a synthetic n-row corpus of
    DISTINCT pseudo-random vectors (near-orthogonal in 64 dims, so the
    qualifying-pair output stays tiny and the measurement is pure
    block-product compute + the N·B replication shuffle — no driver
    matrix anywhere)."""
    spark = get_spark("scale-probe-neardup")
    path = os.path.join(tempfile.gettempdir(), f"vdh_randvec_{n_rows}")
    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        dims = F.sequence(F.lit(0), F.lit(63))
        vec = F.transform(
            dims,
            lambda i: (
                F.pmod(F.hash(F.concat(F.col("id").cast("string"), F.lit("-"), i.cast("string"))), F.lit(2001))
                - 1000
            ).cast("float")
            / 1000.0,
        )
        spark.range(n_rows).select(
            F.col("id").alias("vec_id"), vec.cast("array<float>").alias("embedding")
        ).repartition(32).write.mode("overwrite").parquet(path)
    big = spark.read.parquet(path)
    print(f"corpus: {big.count()} distinct random vectors")
    sim_ops.cosine_neardup_pairs(big.limit(1000), 0.9, n_blocks=4).count()  # warm workers
    t0 = time.perf_counter()
    n_pairs = sim_ops.cosine_neardup_pairs(big, 0.9, n_blocks=n_blocks).count()
    print(
        f"cosine_neardup_pairs (exact all-pairs, B={n_blocks}) @ {n_rows} rows: "
        f"{time.perf_counter() - t0:.2f}s, {n_pairs} pairs >= 0.9"
    )


def ann_neardup(n_rows: int = 500_000, n_cents: int = 64, nprobe: int = 3) -> None:
    """Exact-vs-ANN semantic-dedup A/B at scale: a synthetic corpus of
    distinct pseudo-random vectors with one planted near-dup twin per
    100 rows (source vector + 1e-3 jitter on dim 0 → cosine ≈ 1).  The
    scale claim: ANN wall time tracks candidate volume (≈ planted
    pairs + cell collisions), not N², and planted-pair recall stays
    100% because a jittered twin lands in its source's probed cells."""
    spark = get_spark("scale-probe-ann")
    dims = F.sequence(F.lit(0), F.lit(63))
    vec = F.transform(
        dims,
        lambda i: (
            F.pmod(F.hash(F.concat(F.col("id").cast("string"), F.lit("-"), i.cast("string"))), F.lit(2001))
            - 1000
        ).cast("float")
        / 1000.0,
    )
    base = spark.range(n_rows).select(
        F.col("id").alias("vec_id"), vec.cast("array<float>").alias("embedding")
    )
    twins = base.filter(F.col("vec_id") % 100 == 0).select(
        (F.col("vec_id") + n_rows).alias("vec_id"),
        F.transform(
            "embedding", lambda v, i: v + F.when(i == 0, F.lit(1e-3)).otherwise(0.0)
        ).cast("array<float>").alias("embedding"),
    )
    path = os.path.join(tempfile.gettempdir(), f"vdh_annvec_{n_rows}")
    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        base.unionByName(twins).repartition(32).write.mode("overwrite").parquet(path)
    big = spark.read.parquet(path)
    n = big.count()
    n_planted = n_rows // 100
    print(f"corpus: {n} vectors, {n_planted} planted twin pairs")
    cents = big.filter(F.col("vec_id") % (n_rows // n_cents) == 0).filter(
        F.col("vec_id") < n_rows
    )
    sim_ops.cosine_neardup_ann(big.limit(1000), cents, 0.98, nprobe=nprobe).count()  # warm
    t0 = time.perf_counter()
    ann_pairs = sim_ops.cosine_neardup_ann(big, cents, 0.98, nprobe=nprobe).count()
    t_ann = time.perf_counter() - t0
    print(
        f"cosine_neardup_ann ({n_cents} cells, nprobe={nprobe}) @ {n} rows: "
        f"{t_ann:.2f}s, {ann_pairs} pairs >= 0.98 "
        f"(planted recall {ann_pairs / n_planted:.1%} of {n_planted})"
    )
    t0 = time.perf_counter()
    exact_pairs = sim_ops.cosine_neardup_pairs(big, 0.98, n_blocks=32).count()
    t_exact = time.perf_counter() - t0
    print(
        f"cosine_neardup_pairs (exact, B=32) @ {n} rows: "
        f"{t_exact:.2f}s, {exact_pairs} pairs (ANN speedup {t_exact / t_ann:.1f}x)"
    )


def simhash(n_docs: int = 100_000) -> None:
    """Candidate-volume A/B: naive 4×16 banding (n_blocks=4) vs the
    block-combination scheme (n_blocks=6, 32-bit keys) on a DIVERSE
    synthetic corpus (40 independent md5 tokens per doc) with one
    planted near-dup twin per 100 docs.  The scale claim: candidates ≈
    planted pairs for 32-bit keys (collision term N²·C(B,r)/2^32 stays
    negligible), while 16-bit buckets fill linearly with N."""
    from vector_db_handler_spark.operators import dedup as dedup_ops

    spark = get_spark("scale-probe-simhash")
    toks = F.sequence(F.lit(0), F.lit(39))
    text = F.array_join(
        F.transform(
            toks,
            lambda i: F.md5(F.concat(F.col("id").cast("string"), F.lit("-"), i.cast("string"))),
        ),
        " ",
    )
    base = spark.range(n_docs).select(F.col("id").alias("doc_id"), text.alias("text"))
    # Planted twins: doc_id % 100 == 0 gets a copy (id + n_docs) with
    # its FIRST token replaced — a true Hamming-near fingerprint pair.
    twin_text = F.concat(F.lit("twintoken "), F.substring_index(F.col("text"), " ", -39))
    twins = base.filter(F.col("doc_id") % 100 == 0).select(
        (F.col("doc_id") + n_docs).alias("doc_id"), twin_text.alias("text")
    )
    corpus = base.unionByName(twins)
    path = os.path.join(tempfile.gettempdir(), f"vdh_synthdocs_{n_docs}")
    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        corpus.repartition(32).write.mode("overwrite").parquet(path)
    corpus = spark.read.parquet(path)
    n = corpus.count()
    sig = dedup_ops.simhash64(corpus).cache()
    sig.count()  # materialize once; both candidate runs read the cache
    for blocks in (4, 6):
        t0 = time.perf_counter()
        n_cands = dedup_ops.simhash_band_candidates(sig, max_hamming=3, n_blocks=blocks).count()
        print(
            f"simhash candidates (r=3, B={blocks}, key={64 * (blocks - 3) // blocks}bit) "
            f"@ {n} docs: {n_cands} candidates in {time.perf_counter() - t0:.2f}s"
        )


def components(n_docs: int = 1_000_000, chain_len: int = 40) -> None:
    """Connected-components probe: synthetic dup graph with planted
    clique clusters AND one long chain (worst-case diameter), measure
    rounds-to-converge and wall vs corpus size."""
    from vector_db_handler_spark.operators import dedup as dedup_ops

    spark = get_spark("components-probe")
    # 1 cluster per 100 docs: sizes cycle 2..6; plus one 40-node chain.
    docs = spark.range(n_docs).withColumnRenamed("id", "doc_id")
    in_cluster = docs.filter((F.col("doc_id") % 100) < (F.col("doc_id") / 100 % 5 + 2))
    pairs = in_cluster.filter((F.col("doc_id") % 100) > 0).select(
        (F.col("doc_id") - F.col("doc_id") % 100).alias("d1"), F.col("doc_id").alias("d2")
    )
    if chain_len:
        chain = spark.range(chain_len).select(
            (F.col("id") + n_docs).alias("d1"), (F.col("id") + n_docs + 1).alias("d2")
        )
        pairs = pairs.union(chain)
    t0 = time.perf_counter()
    comp = dedup_ops.connected_components(pairs, nodes=docs)
    n_comp = comp.select("component").distinct().count()
    wall = time.perf_counter() - t0
    n_clustered = comp.filter(F.col("node") != F.col("component")).count()
    print(
        f"components @ {n_docs} docs (chain={chain_len}): {n_comp} components, "
        f"{n_clustered} non-root members, wall {wall:.2f}s"
    )



def winnowing(mult: int = 16) -> None:
    """Winnowing fingerprint cost vs corpus size (documents fixture
    replicated ``mult``x with shifted ids): expected linear in gram
    count — the explode is a row per char and the single doc_id
    exchange serves window+distinct+aggregate (PERF.md round 5:
    5k/20k/80k docs -> 6.4/12.7/43.7s on local[32])."""
    from vector_db_handler_spark.operators.dedup import winnow_fingerprints

    spark = get_spark("winnow-probe")
    docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet").select(
        "doc_id", "text"
    )
    for m in (1, max(2, mult // 4), mult):
        big = docs
        if m > 1:
            reps = spark.range(m).withColumnRenamed("id", "rep")
            big = docs.crossJoin(reps).select(
                (F.col("doc_id") * m + F.col("rep")).alias("doc_id"), "text"
            )
        n = big.count()
        t0 = time.perf_counter()
        c = winnow_fingerprints(big, k=10, w=10).count()
        print(f"winnowing @ {n} docs: {c} fingerprints, wall {time.perf_counter()-t0:.1f}s")


def r6ops(mult: int = 16) -> None:
    """Linearity probes for the round-5 operators the winnowing table
    doesn't cover: ``bigram_novelty`` and ``winnow_containment_pairs``
    on a replicated documents corpus, and ``kmeans_int8_lloyd`` on a
    replicated embeddings corpus at two k values.  Expected ~linear
    wall in corpus size for all three (and ~flat in k for Lloyd's
    per-iteration shuffle, which moves n·dim skinny rows regardless
    of k)."""
    from vector_db_handler_spark.operators.clustering import kmeans_int8_lloyd
    from vector_db_handler_spark.operators.dedup import (
        bigram_novelty,
        winnow_containment_pairs,
    )

    spark = get_spark("r6ops-probe")
    docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet").select(
        "doc_id", "text"
    )
    for m in (1, max(2, mult // 4), mult):
        big = docs
        if m > 1:
            reps = spark.range(m).withColumnRenamed("id", "rep")
            # Suffix-tag replicas: distinct docs, same Zipf token shape.
            big = docs.crossJoin(reps).select(
                (F.col("doc_id") * m + F.col("rep")).alias("doc_id"),
                F.concat(F.col("text"), F.lit(" rep"), F.col("rep")).alias("text"),
            )
        n = big.count()
        t0 = time.perf_counter()
        c = bigram_novelty(big).count()
        print(f"bigram_novelty @ {n} docs: {c} rows, wall {time.perf_counter()-t0:.1f}s")
        t0 = time.perf_counter()
        c = winnow_containment_pairs(big).count()
        print(
            f"winnow_containment_pairs @ {n} docs: {c} pairs, "
            f"wall {time.perf_counter()-t0:.1f}s"
        )

    emb = spark.read.parquet("/root/testdata/sf0.1/embeddings.parquet")
    n_base = emb.count()
    for m in (1, max(2, mult // 4), mult):
        big = emb
        if m > 1:
            reps = spark.range(m).withColumnRenamed("id", "rep")
            big = emb.crossJoin(reps).select(
                (F.col("vec_id") + F.col("rep") * n_base).alias("vec_id"),
                F.transform(
                    "embedding",
                    lambda v, i: v + F.when(i == 0, F.col("rep") * 1e-4).otherwise(0.0),
                ).cast("array<float>").alias("embedding"),
            )
        n = big.count()
        for k in (8, 32):
            t0 = time.perf_counter()
            kmeans_int8_lloyd(big, k=k, iters=2).count()
            print(
                f"kmeans_int8_lloyd k={k} iters=2 @ {n} vecs: "
                f"wall {time.perf_counter()-t0:.1f}s"
            )


def r6b(mult: int = 16) -> None:
    """Linearity probes for the round-6 additions: SRP-LSH pairs and
    SemDeDup on replicated embeddings, BM25 on replicated documents.

    Replication decorrelates replicas by sign-flipping a rep-keyed
    third of the components (pattern period > mult, so no two replicas
    share a flip mask): norms — and therefore the int8 scale — are
    unchanged, while replica-replica cosine drops to ~1/3, below the
    0.45 probe threshold.  Expected shapes: SRP ~linear (N·n_bands
    banded rows + candidate-bounded verify); SemDeDup at fixed K grows
    ~quadratically per cluster (that is the point of the K dial — the
    sqrt-K row shows the paper's regime staying ~N^1.5/K flat-ish);
    BM25 ~linear (postings of 3 query terms)."""
    from vector_db_handler_spark.operators.clustering import semdedup_survivors
    from vector_db_handler_spark.operators.retrieval import bm25_topk
    from vector_db_handler_spark.operators.srp import srp_neardup_pairs

    spark = get_spark("r6b-probe")
    emb = spark.read.parquet("/root/testdata/sf0.1/embeddings.parquet")
    n_base = emb.count()
    period = mult + 3

    def replicate(df, m):
        if m == 1:
            return df
        reps = spark.range(m).withColumnRenamed("id", "rep")
        return df.crossJoin(reps).select(
            (F.col("vec_id") + F.col("rep") * n_base).alias("vec_id"),
            F.transform(
                "embedding",
                lambda v, i: v
                * F.when(((i + 1) * (F.col("rep") + 2)) % period < period // 3, -1.0)
                .otherwise(1.0),
            ).cast("array<float>").alias("embedding"),
        )

    for m in (1, max(2, mult // 4), mult):
        big = replicate(emb, m)
        n = big.count()
        t0 = time.perf_counter()
        c = srp_neardup_pairs(big, threshold_num=9, threshold_den=20).count()
        print(f"srp_neardup_pairs @ {n} vecs: {c} pairs, wall {time.perf_counter()-t0:.1f}s")
        for k in (8, max(8, int(n**0.5))):
            t0 = time.perf_counter()
            kept = (
                semdedup_survivors(big, k=k, iters=2)
                .filter(F.col("kept"))
                .count()
            )
            print(
                f"semdedup_survivors k={k} @ {n} vecs: {kept} kept, "
                f"wall {time.perf_counter()-t0:.1f}s"
            )

    docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet").select(
        "doc_id", "text"
    )
    for m in (1, max(2, mult // 4), mult):
        big = docs
        if m > 1:
            reps = spark.range(m).withColumnRenamed("id", "rep")
            big = docs.crossJoin(reps).select(
                (F.col("doc_id") * m + F.col("rep")).alias("doc_id"),
                F.concat(F.col("text"), F.lit(" rep"), F.col("rep")).alias("text"),
            )
        n = big.count()
        t0 = time.perf_counter()
        bm25_topk(big, ["dup", "vector", "window"], k=10).count()
        print(f"bm25_topk @ {n} docs: wall {time.perf_counter()-t0:.1f}s")


def srp_guard(n_vecs: int = 20_000, max_bucket: int = 200) -> None:
    """Skew probe for the SRP hot-bucket guard: 30% of the corpus is
    one template direction (the 100 TB reality — embedding models
    collapse boilerplate/empty docs onto a few directions), so every
    band bucket holding the template cluster goes quadratic without a
    guard.  One true near-dup pair is planted among the unique tail.
    Candidate volume = Σ C(bucket_size, 2) over (band, value) buckets,
    computed from the census — never by materializing the join.

    Geometry lesson this probe measured: the fixture default (4-bit
    bands, 16 values) SATURATES at this corpus size — every bucket
    holds ~N/16 rows and the guard drops all of them.  The probe
    therefore runs the production geometry (60 bits, 4 bands of 15 →
    32 768 values per band): unique-tail buckets stay tiny, only the
    template cluster's buckets trip the guard."""
    import numpy as np

    from vector_db_handler_spark.operators import srp as srp_ops

    n_bits, n_bands = 60, 4
    spark = get_spark("srp-guard-probe")
    rng = np.random.Generator(np.random.PCG64(11))
    n_hot = int(n_vecs * 0.3)
    template = rng.normal(size=64)
    rows = []
    for i in range(n_hot):  # hot cluster: template + tiny jitter
        rows.append((i, [float(v) for v in template + 1e-4 * rng.normal(size=64)]))
    for i in range(n_hot, n_vecs - 2):  # unique tail
        rows.append((i, [float(v) for v in rng.normal(size=64)]))
    planted = [float(v) for v in rng.normal(size=64)]
    rows.append((n_vecs - 2, planted))
    rows.append((n_vecs - 1, [v * 1.001 for v in planted]))
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")

    planes = srp_ops.srp_planes(64, n_bits, 7)
    sigs = srp_ops.srp_signatures(emb, planes)
    bpb = n_bits // n_bands
    mask = (1 << bpb) - 1
    census = (
        sigs.select(
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(b).alias("band_idx"),
                            F.shiftright(F.col("sig"), b * bpb)
                            .bitwiseAND(F.lit(mask))
                            .alias("band_val"),
                        )
                        for b in range(n_bands)
                    ]
                )
            ).alias("bv")
        )
        .groupBy("bv.band_idx", "bv.band_val")
        .agg(F.count("*").alias("n"))
    )
    vol = census.select(
        F.sum(F.expr("n * (n - 1) / 2")).alias("all"),
        F.sum(F.expr(f"CASE WHEN n <= {max_bucket} THEN n * (n - 1) / 2 ELSE 0 END")).alias(
            "guarded"
        ),
    ).collect()[0]
    print(
        f"candidate volume: guard OFF {int(vol['all']):,} / "
        f"guard ON (bucket<={max_bucket}) {int(vol['guarded']):,} "
        f"({vol['all'] / max(vol['guarded'], 1):,.0f}x reduction)"
    )
    t0 = time.perf_counter()
    pairs = srp_ops.srp_neardup_pairs(
        emb, threshold_num=9, threshold_den=10,
        n_bits=n_bits, n_bands=n_bands, max_bucket=max_bucket,
    ).collect()
    found = any(
        {int(r.id1), int(r.id2)} == {n_vecs - 2, n_vecs - 1} for r in pairs
    )
    print(
        f"srp_neardup_pairs guard ON: {len(pairs)} pairs, wall "
        f"{time.perf_counter()-t0:.1f}s; planted pair found: {found}"
    )


def winnow_guard(n_docs: int = 20_000, max_postings: int = 20) -> None:
    """Skew probe for the stop-fingerprint guard: a synthetic corpus
    where EVERY doc opens with the same boilerplate paragraph (the
    100 TB reality: site headers, licenses, templates) plus unique
    content, and one planted true-overlap pair.  Candidate volume =
    Σ C(df,2) over the inverted index — computed from doc-frequency
    counts, NOT by materializing the join (guard-off at 20k docs is
    ~10⁸ pairs; that being infeasible to materialize is the point).
    The guard drops fingerprints with df > max_postings BEFORE the
    self-join, so candidates collapse to the true-overlap tail while
    the planted pair (unique substring, df=2) survives."""
    import hashlib

    from vector_db_handler_spark.operators.dedup import (
        winnow_fingerprints,
        winnow_overlap_pairs,
    )

    spark = get_spark("winnow-guard-probe")
    boiler = (
        "all documents on this site share this exact legal boilerplate "
        "header paragraph which grants no rights and disclaims all "
        "warranties express or implied in every jurisdiction. "
    )
    planted = (
        "the quick zebra quantized seventeen parquet partitions before "
        "the watermark expired and nobody deduplicated the archive. "
    )
    uniq = F.md5(F.col("id").cast("string"))
    docs = spark.range(n_docs).select(
        F.col("id").alias("doc_id"),
        F.concat(
            F.lit(boiler),
            uniq, F.lit(" "), F.md5(F.concat(uniq, F.lit("x"))),
            # plant a shared unique substring in docs 0 and 1 only
            F.when(F.col("id") < 2, F.lit(" " + planted)).otherwise(F.lit("")),
        ).alias("text"),
    )
    fps = (
        winnow_fingerprints(docs, "text", "doc_id", 10, 10)
        .select("doc_id", "fp_hash")
        .distinct()
    )
    df_counts = fps.groupBy("fp_hash").agg(F.count("*").alias("df")).cache()
    cand_off = df_counts.select(
        F.sum(F.col("df") * (F.col("df") - 1) / 2).alias("c")
    ).collect()[0]["c"]
    cand_on = (
        df_counts.filter(F.col("df") <= max_postings)
        .select(F.sum(F.col("df") * (F.col("df") - 1) / 2).alias("c"))
        .collect()[0]["c"]
    )
    df_counts.unpersist()
    print(
        f"candidates @ {n_docs} docs: guard OFF {int(cand_off):,} -> "
        f"guard ON (df<={max_postings}) {int(cand_on or 0):,} "
        f"({cand_off / max(cand_on or 1, 1):,.0f}x reduction)"
    )
    t0 = time.perf_counter()
    pairs = winnow_overlap_pairs(docs, max_postings=max_postings).collect()
    print(
        f"winnow_overlap_pairs guard ON: {len(pairs)} pairs, wall "
        f"{time.perf_counter()-t0:.1f}s; planted (0,1) found: "
        f"{any(r.doc_a == 0 and r.doc_b == 1 for r in pairs)}"
    )


def ppjoin(mult: int = 4, threshold: float = 0.6) -> None:
    """Prefix-filter (PPJoin) candidate-volume A/B vs the full inverted
    index, at 1x and ``mult``x the sf0.1 documents corpus (replicas get
    shifted ids, so every replica group is a true dup cluster — the
    hard case, since candidates CANNOT drop below true pairs)."""
    from vector_db_handler_spark.operators.dedup import (
        hashed_shingle_index,
        ppjoin_candidates,
        ppjoin_prefix_index,
        prefix_filter_jaccard_pairs,
    )

    spark = get_spark("ppjoin-probe")
    docs0 = spark.read.parquet("/root/testdata/sf0.1/documents.parquet").select(
        "doc_id", "text"
    )
    for m in (1, mult):
        docs = docs0
        if m > 1:
            reps = spark.range(m).withColumnRenamed("id", "rep")
            docs = docs0.crossJoin(reps).select(
                (F.col("doc_id") * m + F.col("rep")).alias("doc_id"), "text"
            )
        n = docs.count()
        sh = hashed_shingle_index(docs).cache()
        postings = sh.count()
        prefix = ppjoin_prefix_index(sh, threshold)
        pre_postings = prefix.count()
        t0 = time.perf_counter()
        cand_pre = ppjoin_candidates(prefix, threshold).count()
        t_pre = time.perf_counter() - t0
        a, b = sh.alias("a"), sh.alias("b")
        t0 = time.perf_counter()
        cand_full = (
            a.join(
                b,
                (F.col("a.h") == F.col("b.h"))
                & (F.col("a.doc_id") < F.col("b.doc_id")),
            )
            .select(F.col("a.doc_id").alias("d1"), F.col("b.doc_id").alias("d2"))
            .distinct()
            .count()
        )
        t_full = time.perf_counter() - t0
        sh.unpersist()
        t0 = time.perf_counter()
        pairs = prefix_filter_jaccard_pairs(docs, threshold).count()
        t_e2e = time.perf_counter() - t0
        print(
            f"ppjoin @ {n} docs: postings {postings:,} -> prefix {pre_postings:,} "
            f"({postings / max(pre_postings, 1):.1f}x fewer); candidates full "
            f"{cand_full:,} ({t_full:.1f}s) -> prefix {cand_pre:,} ({t_pre:.1f}s, "
            f"{cand_full / max(cand_pre, 1):.1f}x fewer); "
            f"{pairs} true pairs end-to-end {t_e2e:.1f}s"
        )



def r6c(mult: int = 4) -> None:
    """Linearity probes for the round-6 continuation operators:
    integer PageRank (iters scaling), KMV sketch, distributed global
    rank, gap-fill + EWMA, and basket lift — each at sf0.1 and (where
    cheap to replicate) at ``mult``x."""
    from vector_db_handler_spark.operators.features import (
        cooccurrence_lift,
        global_rank,
        rfm_scores,
    )
    from vector_db_handler_spark.operators.graph import pagerank_integer
    from vector_db_handler_spark.operators.sketches import kmv_distinct_by
    from vector_db_handler_spark.operators.timeseries import ewma_daily, gapfill_daily

    spark = get_spark("r6c-probe")
    sf = "/root/testdata/sf0.1"
    ev0 = spark.read.parquet(f"{sf}/events.parquet")
    li = spark.read.parquet(f"{sf}/lineitem.parquet")

    # PageRank: wall should be ~linear in iteration count
    fwd = li.select(
        (F.col("l_partkey") * 2).alias("src"), (F.col("l_suppkey") * 2 + 1).alias("dst")
    ).distinct()
    edges = fwd.union(fwd.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
    n_e = edges.count()
    for iters in (3, 6):
        t0 = time.perf_counter()
        n = pagerank_integer(edges, iters=iters).count()
        print(
            f"pagerank @ {n_e} edges, {iters} iters: {n} nodes, "
            f"wall {time.perf_counter()-t0:.1f}s"
        )

    # KMV: replicated events (user_id shifted per replica -> distinct grows)
    for m in (1, mult):
        ev = ev0
        if m > 1:
            reps = spark.range(m).withColumnRenamed("id", "rep")
            ev = ev0.crossJoin(reps).select(
                "event_type", (F.col("user_id") * m + F.col("rep")).alias("user_id")
            )
        rows = ev.count()
        t0 = time.perf_counter()
        kmv_distinct_by(ev, "event_type", "user_id", k=64).collect()
        print(f"kmv @ {rows} rows: wall {time.perf_counter()-t0:.1f}s")

    # global rank: replicated events
    for m in (1, mult):
        ev = ev0.select("event_id", "value")
        if m > 1:
            reps = spark.range(m).withColumnRenamed("id", "rep")
            ev = ev0.crossJoin(reps).select(
                (F.col("event_id") * m + F.col("rep")).alias("event_id"), "value"
            )
        rows = ev.count()
        t0 = time.perf_counter()
        assert global_rank(ev, ["value", "event_id"]).count() == rows
        print(f"global_rank @ {rows} rows: wall {time.perf_counter()-t0:.1f}s")

    # gapfill + ewma + rfm + basket at sf0.1, single shot
    t0 = time.perf_counter()
    gf = gapfill_daily(ev0)
    n_gf = ewma_daily(gf).count()
    print(f"gapfill+ewma @ sf0.1: {n_gf} rows, wall {time.perf_counter()-t0:.1f}s")
    t0 = time.perf_counter()
    n_r = rfm_scores(ev0).count()
    print(f"rfm @ sf0.1: {n_r} users, wall {time.perf_counter()-t0:.1f}s")
    t0 = time.perf_counter()
    n_b = cooccurrence_lift(li, "l_orderkey", "l_partkey", min_both=3).count()
    print(f"basket_lift @ sf0.1: {n_b} pairs, wall {time.perf_counter()-t0:.1f}s")



def r6d(mult: int = 16) -> None:
    """Closing-session probes: the pivot/unpivot reshaping pair at
    replicated event scale (shuffle volume is the user x type cell
    matrix, so wall should grow far slower than rows), and the Arrow
    SRP signature pass at replicated embedding scale (plan cost is now
    constant, so wall should track rows ~linearly from a small base)."""
    from vector_db_handler_spark.operators import srp as srp_ops
    from vector_db_handler_spark.operators.reshape import (
        pivot_user_type_value,
        unpivot_user_type_value,
    )

    spark = get_spark("r6d-probe")
    sf = "/root/testdata/sf0.1"
    ev0 = spark.read.parquet(f"{sf}/events.parquet")
    emb0 = spark.read.parquet(f"{sf}/embeddings.parquet")

    for m in (1, mult):
        ev = ev0
        if m > 1:
            reps = spark.range(m).withColumnRenamed("id", "rep")
            # same user population (cells constant) -- rows grow m-fold
            ev = ev0.crossJoin(reps).select("user_id", "event_type", "value")
        rows = ev.count()
        t0 = time.perf_counter()
        n_w = pivot_user_type_value(ev).count()
        t1 = time.perf_counter()
        n_l = unpivot_user_type_value(ev).count()
        print(
            f"pivot @ {rows} rows: {n_w} users, wall {t1-t0:.1f}s; "
            f"unpivot round trip: {n_l} cells, wall {time.perf_counter()-t1:.1f}s"
        )

    planes = srp_ops.srp_planes(64, 60, 7)
    for m in (1, mult):
        emb = emb0
        if m > 1:
            reps = spark.range(m).withColumnRenamed("id", "rep")
            emb = emb0.crossJoin(reps).select(
                (F.col("vec_id") * m + F.col("rep")).alias("vec_id"), "embedding"
            )
        rows = emb.count()
        t0 = time.perf_counter()
        n = srp_ops.srp_signatures(emb, planes).count()
        print(f"srp_signatures(60 planes) @ {rows} vecs: wall {time.perf_counter()-t0:.1f}s")



def r7(mult: int = 16) -> None:
    """Round-7 probes for the r6 heavy family (r6 verdict ask #5):

    * ``pq_adc_topk`` — wall vs corpus at FIXED M*K (m=4, k=8): the
      scale dial is corpus rows; LUT build and train collects are
      K*M-sized constants, so wall should be ~linear in rows.
    * ``pagerank_integer`` — wall vs EDGES at fixed 3 iterations
      (r6c probed iteration scaling at fixed edges; this is the other
      axis): each iteration is one join + one combined SUM shuffle
      over the edge list, so wall should be ~linear in edges.
    * PPJoin — candidate volume vs THRESHOLD: prefix length is
      (1-t)*n+1 postings per doc, so lowering t grows the indexed
      prefix and with it the candidate join; this quantifies the
      threshold->candidate dial at the full sf0.1 corpus.
    """
    from vector_db_handler_spark.operators.dedup import (
        hashed_shingle_index,
        ppjoin_candidates,
        ppjoin_prefix_index,
    )
    from vector_db_handler_spark.operators.graph import pagerank_integer
    from vector_db_handler_spark.operators.pq import pq_adc_topk, train_pq_codebooks

    spark = get_spark("r7-probe")
    sf = "/root/testdata/sf0.1"
    emb0 = spark.read.parquet(f"{sf}/embeddings.parquet").select(
        "vec_id", "embedding"
    )
    qvec = [float(v) for v in emb0.limit(1).collect()[0]["embedding"]]

    for m in (1, 4, mult):
        emb = emb0
        if m > 1:
            reps = spark.range(m).withColumnRenamed("id", "rep")
            emb = emb0.crossJoin(reps).select(
                (F.col("vec_id") * m + F.col("rep")).alias("vec_id"), "embedding"
            )
        rows = emb.count()
        t0 = time.perf_counter()
        cb = train_pq_codebooks(emb, m=4, k=8, iters=2)
        t_train = time.perf_counter() - t0
        t0 = time.perf_counter()
        top = pq_adc_topk(emb, cb, qvec, k=10).collect()
        t_adc = time.perf_counter() - t0
        print(
            f"pq m=4 k=8 @ {rows} vecs: train {t_train:.1f}s, "
            f"adc_topk {t_adc:.1f}s ({len(top)} rows)"
        )

    li = spark.read.parquet(f"{sf}/lineitem.parquet")
    fwd0 = li.select(
        (F.col("l_partkey") * 2).alias("src"),
        (F.col("l_suppkey") * 2 + 1).alias("dst"),
    ).distinct()
    for m in (1, 4, mult):
        fwd = fwd0
        if m > 1:
            # Replicate the whole graph m times on disjoint node ids:
            # edges scale m x at identical degree structure.
            reps = spark.range(m).withColumnRenamed("id", "rep")
            shift = F.col("rep") * 10_000_000
            fwd = fwd0.crossJoin(reps).select(
                (F.col("src") + shift).alias("src"),
                (F.col("dst") + shift).alias("dst"),
            )
        edges = fwd.union(
            fwd.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        )
        n_e = edges.count()
        t0 = time.perf_counter()
        n = pagerank_integer(edges, iters=3).count()
        print(
            f"pagerank 3 iters @ {n_e} edges: {n} nodes, "
            f"wall {time.perf_counter()-t0:.1f}s"
        )

    docs = spark.read.parquet(f"{sf}/documents.parquet").select("doc_id", "text")
    sh = hashed_shingle_index(docs).cache()
    postings = sh.count()
    for t in (0.8, 0.7, 0.6, 0.5):
        prefix = ppjoin_prefix_index(sh, t)
        pre = prefix.count()
        t0 = time.perf_counter()
        cand = ppjoin_candidates(prefix, t).count()
        wall = time.perf_counter() - t0
        print(
            f"ppjoin t={t}: prefix postings {pre}/{postings} "
            f"({pre/postings:.0%}), candidates {cand}, wall {wall:.1f}s"
        )
    sh.unpersist()


def r7b(mult: int = 16) -> None:
    """Round-7 second wave: star-CC rounds/wall vs chain length
    (the log^2 claim), PII redaction throughput vs corpus (linear,
    scan-bound), epoch resampling wall vs corpus (linear)."""
    from vector_db_handler_spark.operators.graph import connected_components_star
    from vector_db_handler_spark.operators.redaction import redact_pii
    from vector_db_handler_spark.operators.sampling import resample_epoch

    spark = get_spark("r7b-probe")
    sf = "/root/testdata/sf0.1"

    for n in (1_000, 10_000, 100_000):
        chain = spark.range(n - 1).select(
            F.col("id").alias("d1"), (F.col("id") + 1).alias("d2")
        )
        t0 = time.perf_counter()
        out = connected_components_star(chain, max_rounds=40)
        n_nodes = out.count()
        comps = out.select("component").distinct().count()
        print(
            f"star_cc chain n={n}: {n_nodes} nodes -> {comps} component(s), "
            f"wall {time.perf_counter()-t0:.1f}s"
        )

    docs0 = spark.read.parquet(f"{sf}/documents.parquet").select("doc_id", "text")
    for m in (1, mult):
        docs = docs0
        if m > 1:
            reps = spark.range(m).withColumnRenamed("id", "rep")
            docs = docs0.crossJoin(reps).select(
                (F.col("doc_id") * m + F.col("rep")).alias("doc_id"), "text"
            )
        rows = docs.count()
        t0 = time.perf_counter()
        redact_pii(docs).agg(
            F.sum("n_email"), F.sum(F.length("redacted"))
        ).collect()
        print(f"redact_pii @ {rows} docs: wall {time.perf_counter()-t0:.1f}s")

        t0 = time.perf_counter()
        ep = resample_epoch(
            docs.withColumn("rate_bp", F.lit(23_700)), "rate_bp", "doc_id"
        )
        n_out = ep.count()
        print(
            f"resample_epoch 2.37x @ {rows} docs: {n_out} emitted, "
            f"wall {time.perf_counter()-t0:.1f}s"
        )



def r9(mult: int = 4) -> None:
    """Round-9 probes for the three unprobed r7 families (r7 verdict
    ask #6, carried through r8):

    * ``frequent_part_triples`` (Apriori, features.py:546) — prove the
      CANDIDATE volume tracks the frequent-pair graph, not the raw
      in-basket triple explosion: per min_support, re-derive the
      operator's own candidate relation (same plan, features.py
      pipeline mirrored) and compare its row count against the
      analytic raw volume Σ_baskets C(n,3).
    * ``clustering_coefficient_parts`` — wedge volume under the
      (degree, id) orientation vs the naive Σ d(d−1)/2 expansion, and
      wall vs disjoint m× graph replication (wedges and wall should
      both scale ~m×, never d²).
    * ``components_apply_batch`` (graph.py:392) — cost vs |Δ| with the
      maintained labeling HELD CONSTANT, then cost vs pair-HISTORY
      length with |Δ| held constant: the fold must track |V| + |Δ|,
      not how many pairs ever built the labeling.
    """
    from vector_db_handler_spark.operators.features import frequent_triples
    from vector_db_handler_spark.operators.graph import (
        components_apply_batch,
        connected_components_star,
    )

    spark = get_spark("r9-probe")
    sf = "/root/testdata/sf0.1"

    # -- Apriori candidate volume vs frequent-pair graph ---------------
    li = (
        spark.read.parquet(f"{sf}/lineitem.parquet")
        .select(F.col("l_orderkey").alias("o"), F.col("l_partkey").alias("p"))
        .distinct()
        .cache()
    )
    raw = (
        li.groupBy("o")
        .agg(F.count(F.lit(1)).alias("n"))
        .agg(
            F.sum(
                F.col("n") * (F.col("n") - 1) * (F.col("n") - 2) / 6
            ).alias("raw_triples")
        )
        .collect()[0]["raw_triples"]
    )
    print(f"apriori: raw in-basket triple volume = {int(raw)}")
    a = li.select("o", F.col("p").alias("p1"))
    b = li.select("o", F.col("p").alias("p2"))
    pair_census = (
        a.join(b, "o")
        .filter(F.col("p1") < F.col("p2"))
        .groupBy("p1", "p2")
        .agg(F.count(F.lit(1)).alias("sup"))
        .cache()
    )
    pair_census.count()
    for s in (2, 3, 5):
        fp = pair_census.filter(F.col("sup") >= s).select("p1", "p2")
        n_fp = fp.count()
        # the operator's candidate relation, mirrored (features.py:546)
        eb = (
            a.join(b, "o")
            .filter(F.col("p1") < F.col("p2"))
            .join(fp, ["p1", "p2"], "left_semi")
        )
        c = li.select("o", F.col("p").alias("p3"))
        cand = (
            eb.join(c, "o")
            .filter(F.col("p3") > F.col("p2"))
            .join(
                fp.select(F.col("p1"), F.col("p2").alias("p3")),
                ["p1", "p3"],
                "left_semi",
            )
            .join(
                fp.select(F.col("p1").alias("p2"), F.col("p2").alias("p3")),
                ["p2", "p3"],
                "left_semi",
            )
        )
        n_cand = cand.count()
        t0 = time.perf_counter()
        n_out = frequent_triples(
            spark.read.parquet(f"{sf}/lineitem.parquet"),
            "l_orderkey",
            "l_partkey",
            min_support=s,
        ).count()
        wall = time.perf_counter() - t0
        print(
            f"apriori s={s}: frequent pairs {n_fp}, candidates {n_cand} "
            f"({n_cand / max(raw, 1):.2e} of raw), triples {n_out}, "
            f"end-to-end wall {wall:.1f}s"
        )
    pair_census.unpersist()

    # Planted-structure variant: TPC-H baskets are too sparse to stress
    # the prune (the frequent-pair graph is near-empty), so synthesize
    # baskets with a hot core + cold noise: 20k baskets of 3 items from
    # a 50-item hot pool (dense frequent structure) and 5 items from a
    # 100k-item cold pool (raw volume, no frequent pairs).  Candidates
    # must track the hot wedge count, never the raw C(8,3) explosion.
    hot = spark.range(20_000).select(
        F.col("id").alias("o"),
        F.array(
            *[((F.col("id") * p + i * 17) % 50).cast("long") for i, p in
              enumerate((7919, 104729, 1299709))]
        ).alias("items"),
    )
    cold = spark.range(20_000).select(
        F.col("id").alias("o"),
        F.array(
            *[(50 + (F.col("id") * p + i * 13) % 100_000).cast("long")
              for i, p in enumerate((15485863, 32452843, 49979687, 67867967, 86028121))]
        ).alias("items"),
    )
    baskets = (
        hot.unionByName(cold)
        .select("o", F.explode("items").alias("p"))
        .distinct()
        .cache()
    )
    raw_syn = (
        baskets.groupBy("o")
        .agg(F.count(F.lit(1)).alias("n"))
        .agg(F.sum(F.col("n") * (F.col("n") - 1) * (F.col("n") - 2) / 6).alias("r"))
        .collect()[0]["r"]
    )
    for s in (50, 200):
        t0 = time.perf_counter()
        tri_df = frequent_triples(baskets, "o", "p", min_support=s)
        n_tri = tri_df.count()
        wall = time.perf_counter() - t0
        a2 = baskets.select("o", F.col("p").alias("p1"))
        b2 = baskets.select("o", F.col("p").alias("p2"))
        fp2 = (
            a2.join(b2, "o")
            .filter(F.col("p1") < F.col("p2"))
            .groupBy("p1", "p2")
            .agg(F.count(F.lit(1)).alias("sup"))
            .filter(F.col("sup") >= s)
        )
        n_fp2 = fp2.count()
        eb2 = (
            a2.join(b2, "o")
            .filter(F.col("p1") < F.col("p2"))
            .join(fp2.select("p1", "p2"), ["p1", "p2"], "left_semi")
        )
        c2 = baskets.select("o", F.col("p").alias("p3"))
        cand2 = (
            eb2.join(c2, "o")
            .filter(F.col("p3") > F.col("p2"))
            .join(
                fp2.select(F.col("p1"), F.col("p2").alias("p3")),
                ["p1", "p3"],
                "left_semi",
            )
            .join(
                fp2.select(F.col("p1").alias("p2"), F.col("p2").alias("p3")),
                ["p2", "p3"],
                "left_semi",
            )
        )
        n_cand2 = cand2.count()
        print(
            f"apriori planted s={s}: raw {int(raw_syn)}, frequent pairs "
            f"{n_fp2}, candidates {n_cand2} ({n_cand2 / max(raw_syn, 1):.1%} "
            f"of raw), triples {n_tri}, wall {wall:.1f}s"
        )
    baskets.unpersist()

    # -- clustering coefficient: oriented vs naive wedge volume --------
    e0 = (
        a.join(b, "o")
        .filter(F.col("p1") < F.col("p2"))
        .groupBy("p1", "p2")
        .agg(F.count(F.lit(1)).alias("w"))
        .filter(F.col("w") >= 2)
        .select(F.col("p1").alias("u"), F.col("p2").alias("v"))
        .cache()
    )
    m_edges = e0.count()
    li.unpersist()
    for m in (1, mult):
        e = e0
        if m > 1:
            reps = spark.range(m).withColumnRenamed("id", "rep")
            shift = F.col("rep") * 10_000_000
            e = e0.crossJoin(reps).select(
                (F.col("u") + shift).alias("u"), (F.col("v") + shift).alias("v")
            )
        sym = e.union(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
        deg = sym.groupBy("u").agg(F.count(F.lit(1)).alias("d"))
        naive = deg.agg(
            F.sum(F.col("d") * (F.col("d") - 1) / 2).alias("w")
        ).collect()[0]["w"]
        # out-degree under the (deg, id) total order = oriented wedges
        du = deg.select(F.col("u").alias("a"), F.col("d").alias("da"))
        dv = deg.select(F.col("u").alias("b"), F.col("d").alias("db"))
        und = e.select(
            F.least("u", "v").alias("a"), F.greatest("u", "v").alias("b")
        ).distinct()
        keyed = und.join(du, "a").join(dv, "b")
        outdeg = (
            keyed.select(
                F.when(
                    F.struct("da", "a") < F.struct(F.col("db").alias("da"), F.col("b").alias("a")),
                    F.col("a"),
                )
                .otherwise(F.col("b"))
                .alias("src")
            )
            .groupBy("src")
            .agg(F.count(F.lit(1)).alias("od"))
        )
        oriented = outdeg.agg(
            F.sum(F.col("od") * (F.col("od") - 1) / 2).alias("w")
        ).collect()[0]["w"]
        t0 = time.perf_counter()
        n_nodes = dq.clustering_coefficient_parts(spark, sf) if m == 1 else None
        if m == 1:
            n_rows = n_nodes.count()
            wall = time.perf_counter() - t0
            print(
                f"clustcoef m=1: {m_edges} edges, naive wedges {int(naive)}, "
                f"oriented wedges {int(oriented)} "
                f"({oriented / max(naive, 1):.0%}), full query wall {wall:.1f}s "
                f"({n_rows} rows)"
            )
        else:
            from vector_db_handler_spark.operators.graph import triangle_count

            tri = triangle_count(e).count()
            wall = time.perf_counter() - t0
            print(
                f"clustcoef m={m}: {m_edges * m} edges, naive wedges "
                f"{int(naive)}, oriented wedges {int(oriented)}, "
                f"triangle_count wall {wall:.1f}s ({tri} triangle nodes)"
            )
    e0.unpersist()

    # -- incremental CC: cost vs |delta| at fixed history ----------------
    hist = spark.range(200_000).select(
        (F.col("id") % 50_000).alias("d1"),
        ((F.col("id") * 7919 + 13) % 50_000).alias("d2"),
    )
    labels = connected_components_star(
        hist, src="d1", dst="d2", max_rounds=40
    ).localCheckpoint(eager=True)
    n_v = labels.count()
    for delta in (100, 1_000, 10_000, 100_000):
        batch = spark.range(delta).select(
            ((F.col("id") * 31 + 7) % 50_000).alias("d1"),
            (50_000 + F.col("id") % 25_000).alias("d2"),
        )
        t0 = time.perf_counter()
        out = components_apply_batch(labels, batch)
        n_out = out.count()
        print(
            f"incremental |V|={n_v} |delta|={delta}: fold wall "
            f"{time.perf_counter() - t0:.1f}s ({n_out} labeled nodes)"
        )
    # history axis: 10x the pair HISTORY behind the same |V| labeling —
    # the fold must not get slower, because it only ever sees the star
    # forest, never the history.
    for h in (200_000, 2_000_000):
        hist_h = spark.range(h).select(
            (F.col("id") % 50_000).alias("d1"),
            ((F.col("id") * 7919 + 13) % 50_000).alias("d2"),
        )
        labels_h = connected_components_star(
            hist_h, src="d1", dst="d2", max_rounds=40
        ).localCheckpoint(eager=True)
        batch = spark.range(10_000).select(
            ((F.col("id") * 31 + 7) % 50_000).alias("d1"),
            (50_000 + F.col("id") % 25_000).alias("d2"),
        )
        t0 = time.perf_counter()
        components_apply_batch(labels_h, batch).count()
        print(
            f"incremental history={h} pairs (|V|={labels_h.count()}) "
            f"|delta|=10000: fold wall {time.perf_counter() - t0:.1f}s"
        )



def r9b(mult: int = 4) -> None:
    """Linearity probes for the round-9 STAGED operators (registered in
    r10; probed before registration so the scale claims ship with the
    code):

    * ``duplicated_substring_spans`` — wall vs corpus under disjoint
      m× replication (gram census + semi-join + per-doc islands: all
      linear in gram count; replicated docs also multiply the
      duplicated mass, the worst case for the islands stage).
    * ``audio_landmarks`` / ``audio_neardup_pairs`` — wall vs clip
      count at fixed clip length (kernel is per-clip; the pair join is
      bucketed on the landmark key behind the max_df guard).
    * ``shot_boundaries`` — wall vs corpus (pure per-blob kernel,
      scan-bound).
    """
    from vector_db_handler_spark.operators.dedup import duplicated_substring_spans
    from vector_db_handler_spark.operators.media import (
        audio_neardup_pairs,
        shot_boundaries,
        synthesize_containers,
        synthesize_media,
    )

    spark = get_spark("r9b-probe")
    sf = "/root/testdata/sf0.1"
    docs0 = spark.read.parquet(f"{sf}/documents.parquet").select(
        "doc_id", "text"
    ).filter("text is not null")

    for m in (1, mult):
        docs = docs0
        if m > 1:
            reps = spark.range(m).withColumnRenamed("id", "rep")
            docs = docs0.crossJoin(reps).select(
                (F.col("doc_id") * m + F.col("rep")).alias("doc_id"), "text"
            )
        rows = docs.count()
        t0 = time.perf_counter()
        spans = duplicated_substring_spans(docs, k=8)
        n_spans = spans.count()
        n_dup_tokens = spans.agg(F.sum("n_tokens")).collect()[0][0]
        print(
            f"substring_spans @ {rows} docs: {n_spans} spans, "
            f"{n_dup_tokens} dup tokens, wall {time.perf_counter()-t0:.1f}s"
        )

    media0 = synthesize_containers(docs0, body_bytes=4096).filter(
        "modality = 'audio'"
    ).select("media_id", "media")
    for m in (1, mult):
        media = media0
        if m > 1:
            reps = spark.range(m).withColumnRenamed("id", "rep")
            media = media0.crossJoin(reps).select(
                (F.col("media_id") * m + F.col("rep")).alias("media_id"), "media"
            )
        clips = media.count()
        t0 = time.perf_counter()
        n_pairs = audio_neardup_pairs(media, max_df=64).count()
        print(
            f"audio_neardup @ {clips} clips: {n_pairs} pairs, "
            f"wall {time.perf_counter()-t0:.1f}s"
        )

    m0 = synthesize_media(docs0).select("media_id", "media")
    for m in (1, mult):
        media = m0
        if m > 1:
            reps = spark.range(m).withColumnRenamed("id", "rep")
            media = m0.crossJoin(reps).select(
                (F.col("media_id") * m + F.col("rep")).alias("media_id"), "media"
            )
        blobs = media.count()
        t0 = time.perf_counter()
        nb = shot_boundaries(media).filter("is_boundary").count()
        print(
            f"shot_boundaries @ {blobs} blobs: {nb} cuts, "
            f"wall {time.perf_counter()-t0:.1f}s"
        )


def r10(mult: int = 4) -> None:
    """Linearity probes for the round-10 STAGED operators (to register
    in r11; probed before registration so the scale claims ship with
    the code):

    * ``nb_holdout_confusion`` — wall vs corpus under disjoint m×
      replication (census + model join are linear in token volume; the
      model relation is vocabulary-sized, data-scale invariant — its
      row count is asserted flat across the replication).
    * ``functional_dependencies`` — wall vs rows (one stack-unpivot
      scan + three map-side-combined aggregations; per-pair cost rides
      the same scan, no rescans).
    * ``shot_segments`` — wall vs blobs (per-blob kernel + a per-clip
      window bounded by frames-per-clip).
    * ``lsh_recall_report`` — wall vs corpus under replication (truth
      set computed once; per-config candidate joins ride the banded
      keys; replication multiplies true pairs, the worst case).
    * ``seasonal_decompose_daily`` — wall vs EVENT volume at a fixed
      calendar grid (replicated events, same day span): only the
      first daily aggregate should feel the volume; the windows run
      over the |keys| x |days| rollup.
    * ``video_copy_pairs`` — wall vs clip count (frame/gram relations
      linear in bytes/frame_bytes; the pair join is bucketed on the
      gram hash behind the hot-gram guard — replication makes every
      clone group mutually aligned, the worst case).
    """
    from vector_db_handler_spark.functions import text as text_fns
    from vector_db_handler_spark.operators.dedup import lsh_recall_report
    from vector_db_handler_spark.operators.media import (
        shot_segments,
        synthesize_media,
    )
    from vector_db_handler_spark.operators.nb_classifier import (
        nb_holdout_confusion,
        nb_train,
    )
    from vector_db_handler_spark.operators.profile import (
        functional_dependencies,
    )
    from vector_db_handler_spark.operators.timeseries import (
        seasonal_decompose_daily,
    )

    spark = get_spark("r10-probe")
    sf = "/root/testdata/sf0.1"
    docs0 = (
        spark.read.parquet(f"{sf}/documents.parquet")
        .select("doc_id", "text")
        .filter("text is not null")
        .withColumn("rule_lang", text_fns.lang_id(F.col("text")))
    )

    def replicate(df, m):
        if m == 1:
            return df
        reps = spark.range(m).withColumnRenamed("id", "rep")
        return df.crossJoin(reps).select(
            (F.col("doc_id") * m + F.col("rep")).alias("doc_id"),
            *[c for c in df.columns if c != "doc_id"],
        )

    for m in (1, mult):
        docs = replicate(docs0, m)
        rows = docs.count()
        t0 = time.perf_counter()
        conf = nb_holdout_confusion(docs, label_col="rule_lang")
        n_cells = conf.count()
        model, _ = nb_train(
            docs.filter(F.col("doc_id") % 5 != 0), label_col="rule_lang"
        )
        n_model = model.count()
        print(
            f"nb_confusion @ {rows} docs: {n_cells} cells, "
            f"model {n_model} rows, wall {time.perf_counter()-t0:.1f}s"
        )

    orders0 = spark.read.parquet(f"{sf}/orders.parquet")
    fd_pairs = [
        ("o_orderkey", "o_custkey"),
        ("o_orderkey", "o_orderstatus"),
        ("o_custkey", "o_orderstatus"),
        ("o_orderpriority", "o_orderstatus"),
    ]
    for m in (1, mult):
        orders = orders0
        if m > 1:
            reps = spark.range(m).withColumnRenamed("id", "rep")
            orders = orders0.crossJoin(reps).withColumn(
                "o_orderkey",
                F.col("o_orderkey") * m + F.col("rep"),
            ).drop("rep")
        rows = orders.count()
        t0 = time.perf_counter()
        n = functional_dependencies(orders, fd_pairs).count()
        print(
            f"fd_discovery @ {rows} rows x {len(fd_pairs)} pairs: "
            f"{n} out-rows, wall {time.perf_counter()-t0:.1f}s"
        )

    media0 = synthesize_media(docs0).select("media_id", "media")
    for m in (1, mult):
        media = media0
        if m > 1:
            reps = spark.range(m).withColumnRenamed("id", "rep")
            media = media0.crossJoin(reps).select(
                (F.col("media_id") * m + F.col("rep")).alias("media_id"),
                "media",
            )
        blobs = media.count()
        t0 = time.perf_counter()
        n_shots = shot_segments(media).count()
        print(
            f"shot_segments @ {blobs} blobs: {n_shots} shots, "
            f"wall {time.perf_counter()-t0:.1f}s"
        )

    for m in (1, mult):
        docs = replicate(docs0.select("doc_id", "text"), m)
        rows = docs.count()
        t0 = time.perf_counter()
        rep = {
            (r["n_bands"], r["rows_per_band"]): (
                r["n_candidates"],
                r["n_true"],
            )
            for r in lsh_recall_report(docs, threshold=0.5).collect()
        }
        c42 = rep[(4, 2)]
        print(
            f"lsh_recall @ {rows} docs: cands(4,2)={c42[0]} "
            f"true={c42[1]}, wall {time.perf_counter()-t0:.1f}s"
        )

    ev0 = spark.read.parquet(f"{sf}/events.parquet")
    for m in (1, mult):
        ev = ev0
        if m > 1:
            reps = spark.range(m).withColumnRenamed("id", "rep")
            ev = ev0.crossJoin(reps).drop("rep")  # m x event volume, same grid
        rows = ev.count()
        t0 = time.perf_counter()
        n = seasonal_decompose_daily(ev).count()
        print(
            f"seasonal_decompose @ {rows} events: {n} (key,day) rows, "
            f"wall {time.perf_counter()-t0:.1f}s"
        )

    from vector_db_handler_spark.operators.media import (
        synthesize_video_with_copies,
        video_copy_pairs,
    )

    for m in (1, mult):
        docs = replicate(docs0.select("doc_id", "text"), m)
        clips = synthesize_video_with_copies(docs)
        n_clips = clips.count()
        t0 = time.perf_counter()
        n_pairs = video_copy_pairs(clips).count()
        print(
            f"video_copy @ {n_clips} clips: {n_pairs} pairs, "
            f"wall {time.perf_counter()-t0:.1f}s"
        )






def r12d(mult: int = 4) -> None:
    """Two-scale probe for the SQLite interchange edge: executor-side
    write (one .db per partition) + distributed binaryFile read;
    wall linear in bytes, files are the parallelism unit."""
    import shutil
    import tempfile

    from pyspark.sql import functions as F2

    from vector_db_handler_spark.sources.sqlite_db import (
        read_documents_sqlite,
        write_documents_sqlite,
    )

    spark = get_spark("r12d-probe")
    sf = "/root/testdata/sf0.1"
    docs0 = spark.read.parquet(f"{sf}/documents.parquet")

    def replicate(df, m):
        if m == 1:
            return df
        reps = spark.range(m).withColumnRenamed("id", "rep")
        return df.crossJoin(reps).select(
            (F2.col("doc_id") * m + F2.col("rep")).alias("doc_id"),
            *[c for c in df.columns if c != "doc_id"],
        )

    for m in (1, mult):
        docs = replicate(docs0, m).repartition(16)
        rows = docs.count()
        root = tempfile.mkdtemp(prefix="vdh_probe_sqlite_")
        try:
            t0 = time.perf_counter()
            n_w = write_documents_sqlite(docs, root)
            t1 = time.perf_counter()
            n_r = read_documents_sqlite(spark, root).count()
            t2 = time.perf_counter()
            assert n_w == n_r == rows
            print(
                f"sqlite_edge @ {rows} docs: write {t1-t0:.1f}s, "
                f"read {t2-t1:.1f}s"
            )
        finally:
            shutil.rmtree(root, ignore_errors=True)


def r12c(mult: int = 4) -> None:
    """Linearity probes for the late-r12 staged pair:

    * ``allocate_stratified_exact`` — one stratum census + one window
      over the stratum key; output pinned at total_n rows.
    * ``cube_by_day_type_source`` — one Expand pass (8 grouping sets,
      map-side combined), never 8 scans.
    """
    from pyspark.sql import functions as F2

    from vector_db_handler_spark.operators.sampling import (
        allocate_stratified_exact,
    )
    from vector_db_handler_spark.operators.timeseries import (
        cube_by_day_type_source,
    )

    spark = get_spark("r12c-probe")
    sf = "/root/testdata/sf0.1"
    docs0 = spark.read.parquet(f"{sf}/documents.parquet")
    ev0 = spark.read.parquet(f"{sf}/events.parquet")

    for m in (1, mult):
        if m == 1:
            docs = docs0
        else:
            reps = spark.range(m).withColumnRenamed("id", "rep")
            docs = docs0.crossJoin(reps).select(
                (F2.col("doc_id") * m + F2.col("rep")).alias("doc_id"),
                "lang",
            )
        n = docs.count()
        t0 = time.perf_counter()
        out = allocate_stratified_exact(docs, 1000, "lang", "doc_id").count()
        print(
            f"stratified_alloc @ {n} docs: {out} sampled, "
            f"wall {time.perf_counter()-t0:.1f}s"
        )

    for m in (1, mult):
        if m == 1:
            ev = ev0
        else:
            reps = spark.range(m).withColumnRenamed("id", "rep")
            ev = ev0.crossJoin(reps).select(
                "ts", "event_type", "value",
                (F2.col("user_id") * m + F2.col("rep")).alias("user_id"),
            )
        ev = ev.withColumn(
            "user_bucket", (F2.col("user_id") % 4).cast("string")
        )
        n = ev.count()
        t0 = time.perf_counter()
        out = cube_by_day_type_source(ev).count()
        print(
            f"cube @ {n} events: {out} grouped rows, "
            f"wall {time.perf_counter()-t0:.1f}s"
        )


def r13(mult: int = 4) -> None:
    """Two-scale probes for the r13-staged families (register r14):

    * ``knn_graph_hierarchical_search`` — entry scan reads
      N/(layer_mod*coarse_entry_mod); coarse-edge derivation touches
      (N/layer_mod)*(2k)^2 pairs (linear in N at fixed layer_mod);
      both walks beam-bounded.  coarse_entry_mod scales with m so the
      entry slice stays constant-sized.
    * persisted graph index — build amortized (write once), probe
      cost = pruned entry partition + constant hop work; append cost
      = O(arrival batch), independent of corpus size with entry_mod
      scaled.
    * ``curation_manifest`` — every stage linear: one text-hash
      shuffle, in-row flags, the mixture family's single bigram
      explode, |domains|-row apportionment, per-domain selection
      window, in-row HRW argmax.
    * ``domain_mixture_weights`` at a THIRD scale (r12 verdict
      stretch #7): its 4x wall was 2.1x (model relation grows with
      replication); the 16x point checks sub-quadratic growth.
    """
    import time

    from pyspark.sql import functions as F2

    from vector_db_handler_spark.operators.curation import curation_manifest
    from vector_db_handler_spark.operators.lm_score import (
        domain_mixture_weights,
    )
    from vector_db_handler_spark.operators.similarity import (
        append_knn_graph_index,
        knn_graph_hierarchical_search,
        knn_graph_nn_descent,
        knn_graph_probe_table,
        write_knn_graph_index,
    )

    spark = get_spark("r13-probe")
    sf = "/root/testdata/sf0.1"
    emb0 = spark.read.parquet(f"{sf}/embeddings.parquet")
    docs0 = spark.read.parquet(f"{sf}/documents.parquet")
    qv = [((i * 37 + 11) % 101 - 50) / 50.0 for i in range(64)]

    def rep_emb(m):
        if m == 1:
            return emb0
        reps = spark.range(m).withColumnRenamed("id", "rep")
        return emb0.crossJoin(reps).select(
            (F2.col("vec_id") * m + F2.col("rep")).alias("vec_id"),
            "embedding", "label",
        )

    def rep_docs(m):
        if m == 1:
            return docs0
        reps = spark.range(m).withColumnRenamed("id", "rep")
        return docs0.crossJoin(reps).select(
            (F2.col("doc_id") * m + F2.col("rep")).alias("doc_id"),
            "text", "lang", "source", "n_chars",
        )

    import tempfile

    for m in (1, mult):
        emb = rep_emb(m)
        n = emb.count()
        g = knn_graph_nn_descent(
            emb, k=5, iters=2, kmeans_k=8 * m, rand_buckets=64 * m
        ).localCheckpoint()
        t0 = time.perf_counter()
        out = knn_graph_hierarchical_search(
            emb, qv, k=10, beam=12, hops=2, layer_mod=4,
            coarse_k=5, coarse_hops=1, coarse_entry_mod=8 * m, graph=g,
        ).count()
        print(
            f"hierarchical @ {n} vecs: {out} rows, "
            f"wall {time.perf_counter()-t0:.1f}s (coarse_entry_mod {8*m})"
        )

        path = os.path.join(tempfile.gettempdir(), f"vdh_gidx_probe_{m}x")
        t0 = time.perf_counter()
        if not os.path.exists(os.path.join(path, "meta", "_SUCCESS")):
            write_knn_graph_index(
                emb, path, graph_k=5, graph_iters=2,
                kmeans_k=8 * m, rand_buckets=64 * m, entry_mod=32 * m,
            )
        t1 = time.perf_counter()
        p = knn_graph_probe_table(spark, path, qv, k=10, beam=12, hops=2).count()
        t2 = time.perf_counter()
        arrivals = emb.filter(F2.col("vec_id") % 101 == 0).limit(20).select(
            (F2.col("vec_id") + 10_000_000).alias("vec_id"), "embedding", "label"
        )
        append_knn_graph_index(arrivals, path)
        t3 = time.perf_counter()
        print(
            f"graph_index @ {n} vecs: build {t1-t0:.1f}s, probe {t2-t1:.1f}s "
            f"({p} rows), append(20) {t3-t2:.1f}s"
        )

    for m in (1, mult):
        docs = rep_docs(m)
        n = docs.count()
        t0 = time.perf_counter()
        out = curation_manifest(
            docs, total_n=1000 * m, shards=[f"s{i}" for i in range(8)]
        ).count()
        print(
            f"curation_manifest @ {n} docs: {out} manifest cells, "
            f"wall {time.perf_counter()-t0:.1f}s (budget {1000*m})"
        )

    # stretch #7: third-scale point for the mixture family
    for m in (4 * mult,):
        docs = rep_docs(m)
        n = docs.count()
        t0 = time.perf_counter()
        out = domain_mixture_weights(docs).count()
        print(
            f"domain_mixture @ {n} docs: {out} domains, "
            f"wall {time.perf_counter()-t0:.1f}s"
        )


def r13b(mult: int = 4) -> None:
    """Second r13-staged wave probes: the graph-ANN recall report
    (eval harness: exact leg is the N x Q broadcast cross by design,
    approx leg the measured batch serve) and the streaming graph-index
    ingest cost per batch (should be flat in corpus size: pruned entry
    scan + beam-bounded hops per arrival)."""
    import tempfile
    import time

    from pyspark.sql import functions as F2

    from vector_db_handler_spark.operators.similarity import (
        graph_ann_recall_report,
        knn_graph_nn_descent,
    )

    spark = get_spark("r13b-probe")
    sf = "/root/testdata/sf0.1"
    emb0 = spark.read.parquet(f"{sf}/embeddings.parquet")

    def rep_emb(m):
        if m == 1:
            return emb0
        reps = spark.range(m).withColumnRenamed("id", "rep")
        return emb0.crossJoin(reps).select(
            (F2.col("vec_id") * m + F2.col("rep")).alias("vec_id"),
            "embedding", "label",
        )

    for m in (1, mult):
        emb = rep_emb(m)
        n = emb.count()
        g = knn_graph_nn_descent(
            emb, k=5, iters=2, kmeans_k=8 * m, rand_buckets=64 * m
        ).localCheckpoint()
        queries = emb.filter(F2.col("vec_id") % 97 == 0).select(
            F2.col("vec_id").alias("query_id"), "embedding"
        )
        nq = queries.count()
        t0 = time.perf_counter()
        out = graph_ann_recall_report(
            emb, queries, k=5, beam=8, hops=2, graph=g, entry_mod=32 * m,
        )
        mean_recall = out.agg(F2.avg("recall")).first()[0]
        print(
            f"graph_recall @ {n} vecs x {nq} queries: mean recall "
            f"{mean_recall:.3f}, wall {time.perf_counter()-t0:.1f}s"
        )


def r13c(mult: int = 4) -> None:
    """Third r13 probe set: streaming graph-index ingest (per-batch
    wall should be FLAT in corpus size - pruned entry scan +
    beam-bounded hops per arrival) and the beam_recall_curve sweep
    (every point reuses ONE build; wall ~ n_points x one batch serve).
    """
    import shutil
    import tempfile
    import time

    from pyspark.sql import functions as F2

    from vector_db_handler_spark.operators.similarity import (
        beam_recall_curve,
        knn_graph_nn_descent,
        write_knn_graph_index,
    )
    from vector_db_handler_spark.streaming.stream_ops import (
        streaming_graph_index_ingest,
    )

    spark = get_spark("r13c-probe")
    sf = "/root/testdata/sf0.1"
    emb0 = spark.read.parquet(f"{sf}/embeddings.parquet")

    def rep_emb(m):
        if m == 1:
            return emb0
        reps = spark.range(m).withColumnRenamed("id", "rep")
        return emb0.crossJoin(reps).select(
            (F2.col("vec_id") * m + F2.col("rep")).alias("vec_id"),
            "embedding", "label",
        )

    for m in (1, mult):
        emb = rep_emb(m)
        n = emb.count()
        root = tempfile.mkdtemp(prefix=f"vdh_sgidx_{m}x_")
        path = os.path.join(root, "idx")
        write_knn_graph_index(
            emb, path, graph_k=5, graph_iters=2,
            kmeans_k=8 * m, rand_buckets=64 * m, entry_mod=32 * m,
        )
        arrivals = emb.filter(F2.col("vec_id") % 101 == 0).limit(20).select(
            (F2.col("vec_id") + 10_000_000).alias("vec_id"),
            "embedding", "label",
        )
        src = os.path.join(root, "src")
        arrivals.coalesce(1).write.parquet(src)
        stream = (
            spark.readStream.schema(arrivals.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        t0 = time.perf_counter()
        streaming_graph_index_ingest(
            stream, path, os.path.join(root, "cp")
        )
        print(
            f"stream_ingest @ {n} vecs: 1 batch of 20 arrivals in "
            f"{time.perf_counter()-t0:.1f}s"
        )
        shutil.rmtree(root, ignore_errors=True)

    for m in (1, mult):
        emb = rep_emb(m)
        n = emb.count()
        g = knn_graph_nn_descent(
            emb, k=5, iters=2, kmeans_k=8 * m, rand_buckets=64 * m
        ).localCheckpoint()
        queries = emb.filter(F2.col("vec_id") % 97 == 0).select(
            F2.col("vec_id").alias("query_id"), "embedding"
        )
        nq = queries.count()
        t0 = time.perf_counter()
        rows = beam_recall_curve(
            emb, queries, k=5, beams=(6, 12), hops=2, graph=g,
            entry_mod=32 * m,
        ).collect()
        pts = {r["beam"]: round(r["recall"], 3) for r in rows}
        print(
            f"beam_curve @ {n} vecs x {nq} queries: {pts}, "
            f"wall {time.perf_counter()-t0:.1f}s (2 points, 1 build)"
        )


def r14(mult: int = 4) -> None:
    """Round-14 probes: (1) SERVE LATENCY of the persisted graph index
    — p50/p95 per-query probe wall at two corpus scales, the number a
    serving SLA reads (r13 verdict next-#6c); (2) recall-vs-scale of
    the HIERARCHICAL search at the r14 default dials with the coarse
    layer ON (r13 verdict stretch #8: the trend that decides the
    layer's default)."""
    import math
    import shutil
    import tempfile
    import time

    from pyspark.sql import functions as F2

    from vector_db_handler_spark.operators.quantize import (
        max_abs_scale,
        quantize_int8,
    )
    from vector_db_handler_spark.operators.similarity import (
        _int_dot,
        knn_graph_hierarchical_search,
        knn_graph_nn_descent,
        knn_graph_probe_table,
        knn_graph_probe_table_batch,
        write_knn_graph_index,
    )

    spark = get_spark("r14-probe")
    sf = "/root/testdata/sf0.1"
    emb0 = spark.read.parquet(f"{sf}/embeddings.parquet")

    def rep_emb(m):
        if m == 1:
            return emb0
        reps = spark.range(m).withColumnRenamed("id", "rep")
        return emb0.crossJoin(reps).select(
            (F2.col("vec_id") * m + F2.col("rep")).alias("vec_id"),
            "embedding", "label",
        )

    # --- (1) serve latency: p50/p95 of 20 sequential single-query
    # probes + the amortized batch serve, at 1x and {mult}x ------------
    for m in (1, mult):
        emb = rep_emb(m).localCheckpoint()
        n = emb.count()
        root = tempfile.mkdtemp(prefix=f"vdh_r14lat_{m}x_")
        path = f"{root}/idx"
        write_knn_graph_index(
            emb, path, graph_k=8, graph_iters=2,
            kmeans_k=8 * m, rand_buckets=64 * m, entry_mod=32 * m,
            layer_mod=8,
        )
        qrows = emb.filter(F2.col("vec_id") % 97 == 0).limit(20).collect()
        walls = []
        for r in qrows:
            qv = [float(x) for x in r["embedding"]]
            t0 = time.perf_counter()
            knn_graph_probe_table(spark, path, qv, k=10, beam=16, hops=3).collect()
            walls.append(time.perf_counter() - t0)
        walls.sort()
        p50 = walls[len(walls) // 2]
        p95 = walls[min(len(walls) - 1, math.ceil(0.95 * len(walls)) - 1)]
        queries = emb.filter(F2.col("vec_id") % 97 == 0).select(
            F2.col("vec_id").alias("query_id"), "embedding"
        )
        nq = queries.count()
        t0 = time.perf_counter()
        knn_graph_probe_table_batch(
            spark, path, queries, k=10, beam=16, hops=3
        ).collect()
        bw = time.perf_counter() - t0
        print(
            f"serve_latency @ {n} vecs: single-query p50 {p50:.2f}s "
            f"p95 {p95:.2f}s (20 probes); batch {nq} queries in {bw:.1f}s "
            f"= {bw / nq:.3f}s/q amortized", flush=True,
        )
        shutil.rmtree(root, ignore_errors=True)

    # --- (2) hierarchical recall vs scale (layer ON, default dials) --
    for m in (1, mult, 4 * mult):
        emb = rep_emb(m).localCheckpoint()
        n = emb.count()
        g = knn_graph_nn_descent(
            emb, k=8, iters=2, kmeans_k=8 * m, rand_buckets=64 * m
        ).localCheckpoint()
        qn = quantize_int8(emb).select(
            F2.col("vec_id").alias("nid"), F2.col("qvec").alias("v")
        ).localCheckpoint()
        scale = max_abs_scale(emb).first()["s"]
        qrows = emb.filter(F2.col("vec_id") % 499 == 0).limit(12).collect()
        hits = tot = 0
        t0 = time.perf_counter()
        for r in qrows:
            qv = [float(x) for x in r["embedding"]]
            got = {
                x["vec_id"]
                for x in knn_graph_hierarchical_search(
                    emb, qv, graph=g, coarse_entry_mod=max(1, n // (8 * 1024)),
                ).collect()
            }
            qq = [
                max(-127, min(127, math.floor(127.0 * x / scale + 0.5)))
                for x in qv
            ]
            exact = (
                qn.select(
                    "nid",
                    _int_dot(
                        F2.col("v"),
                        F2.array(*[F2.lit(int(c)).cast("long") for c in qq]),
                    ).alias("d"),
                )
                .orderBy(F2.col("d").desc(), F2.col("nid").asc())
                .limit(10)
                .collect()
            )
            hits += len(got & {x["nid"] for x in exact})
            tot += 10
        print(
            f"hier_recall @ {n} vecs (layer ON, default dials): "
            f"recall@10 {hits / tot:.3f} over {len(qrows)} queries, "
            f"wall {time.perf_counter() - t0:.1f}s", flush=True,
        )



def r15b(mult: int = 16) -> None:
    """Round-15 build-session probes.

    1. ``curation_manifest`` at a 4·mult DISTINCT-TEXT corpus — the
       r13 probe replicated texts verbatim, so the dedup stage
       collapsed every replica and later stages ran at 1× survivor
       volume; suffixing the replica id keeps all copies alive and
       measures the FULL pipeline at true scale.
    2. The IVM advantage the staged `curation_stream` exists for: a
       1× crawl drop lands on a mult× base — wall of
       (incremental ingest of the drop + emit from state) vs
       re-running ``curation_manifest`` over base ∪ drop.
    3. Third scale points for the other staged families:
       ``pmi_collocations`` and the drift store at mult×.
    """
    from pyspark.sql import functions as F2

    from vector_db_handler_spark.operators.curation import curation_manifest
    from vector_db_handler_spark.operators.lm_score import pmi_collocations
    from vector_db_handler_spark.streaming.curation_stream import (
        curation_manifest_from_state,
        streaming_curation_ingest,
    )
    from vector_db_handler_spark.streaming.drift_stream import (
        drift_report_from_state,
        streaming_drift_ingest,
        write_drift_reference,
    )

    spark = get_spark("r15b-probe")
    sf = "/root/testdata/sf0.1"
    docs0 = spark.read.parquet(f"{sf}/documents.parquet")
    emb0 = spark.read.parquet(f"{sf}/embeddings.parquet")

    def rep_docs_distinct(m):
        if m == 1:
            return docs0.select("doc_id", "lang", "text")
        reps = spark.range(m).withColumnRenamed("id", "rep")
        return docs0.crossJoin(reps).select(
            (F2.col("doc_id") * m + F2.col("rep")).alias("doc_id"),
            "lang",
            F2.concat(
                F2.col("text"), F2.lit(" r"), F2.col("rep").cast("string")
            ).alias("text"),
        )

    shards = [f"s{i}" for i in range(8)]

    # 1. distinct-text curation at 1x, mult x, 4*mult x
    for m in (1, mult, 4 * mult):
        docs = rep_docs_distinct(m)
        n = docs.count()
        t0 = time.perf_counter()
        cells = curation_manifest(docs, total_n=1000 * m, shards=shards).count()
        print(
            f"curation_manifest DISTINCT @ {n} docs: {cells} cells, "
            f"wall {time.perf_counter()-t0:.1f}s (budget {1000*m})"
        )

    # 2. IVM advantage: 1x drop on a mult x base
    base = rep_docs_distinct(mult)
    drop = docs0.select(
        (F2.col("doc_id") + 100_000_000).alias("doc_id"),
        "lang",
        F2.concat(F2.col("text"), F2.lit(" drop")).alias("text"),
    )
    root = tempfile.mkdtemp(prefix="vdh_r15b_cur_")
    state, src, cp = (os.path.join(root, d) for d in ("state", "src", "cp"))
    t0 = time.perf_counter()
    base.write.mode("append").parquet(src)
    stream = spark.readStream.schema(base.schema).parquet(src)
    streaming_curation_ingest(stream, state, cp)
    t_base = time.perf_counter() - t0
    t0 = time.perf_counter()
    drop.write.mode("append").parquet(src)
    stream = spark.readStream.schema(base.schema).parquet(src)
    streaming_curation_ingest(stream, state, cp)
    t_drop = time.perf_counter() - t0
    t0 = time.perf_counter()
    cells = curation_manifest_from_state(
        spark, state, total_n=1000 * mult, shards=shards
    ).count()
    t_emit = time.perf_counter() - t0
    t0 = time.perf_counter()
    cells_b = curation_manifest(
        base.unionByName(drop), total_n=1000 * mult, shards=shards
    ).count()
    t_batch = time.perf_counter() - t0
    print(
        f"curation IVM @ base {mult}x + drop 1x: base-ingest {t_base:.1f}s "
        f"(once), drop-ingest {t_drop:.1f}s + emit {t_emit:.1f}s "
        f"({cells} cells) vs full batch re-run {t_batch:.1f}s "
        f"({cells_b} cells)"
    )

    # 3a. pmi_collocations third point
    for m in (1, mult):
        docs = rep_docs_distinct(m)
        n = docs.count()
        t0 = time.perf_counter()
        rows = pmi_collocations(docs).count()
        print(
            f"pmi_collocations @ {n} docs: {rows} rows, "
            f"wall {time.perf_counter()-t0:.1f}s"
        )

    # 3b. drift store at mult x embeddings
    reps = spark.range(mult).withColumnRenamed("id", "rep")
    embm = emb0.crossJoin(reps).select(
        (F2.col("vec_id") * mult + F2.col("rep")).alias("vec_id"),
        "label",
        "embedding",
    )
    droot = tempfile.mkdtemp(prefix="vdh_r15b_drift_")
    dstate, dsrc, dcp = (os.path.join(droot, d) for d in ("state", "src", "cp"))
    t0 = time.perf_counter()
    write_drift_reference(embm.filter("label < 5"), dstate)
    t_ref = time.perf_counter() - t0
    arr = embm.filter("label >= 5")
    t0 = time.perf_counter()
    arr.write.mode("append").parquet(dsrc)
    stream = spark.readStream.schema(arr.schema).parquet(dsrc)
    streaming_drift_ingest(stream, dstate, dcp)
    t_ing = time.perf_counter() - t0
    t0 = time.perf_counter()
    dims = drift_report_from_state(spark, dstate).count()
    t_emit = time.perf_counter() - t0
    n = embm.count()
    print(
        f"drift store @ {n} vecs: ref {t_ref:.1f}s, ingest {t_ing:.1f}s, "
        f"emit {t_emit:.1f}s ({dims} dims)"
    )


def r15c(mult: int = 4) -> None:
    """Round-15 continuation probes: the persisted BM25 index and the
    hash-sample quantile sketch at scale.

    1. Probe wall vs corpus size (1x / mult / 4*mult DISTINCT-text
       corpora — replica-suffixed docs so dedup-free growth is real):
       the probe reads only the query's term buckets (3 of 16 here),
       so bytes touched scale with postings/n_buckets, not corpus.
    2. The incremental-index advantage the streaming ingest exists
       for: a 1x crawl drop lands on a 4*mult base — wall of
       (append of the drop + index probe) vs scan-time bm25_topk over
       base ∪ drop, which re-tokenizes every base byte.
    3. Segment-count sensitivity + compaction: probe at 1 base + 4
       appended segments vs after compact_bm25_index.
    4. Quantile sketch at 4*mult events: report wall, and the
       estimate-only leg (the production path) vs the exact rail.
    """
    from pyspark.sql import functions as F2

    from vector_db_handler_spark.operators.retrieval import (
        append_bm25_index,
        bm25_index_topk,
        bm25_topk,
        compact_bm25_index,
        write_bm25_index,
    )
    from vector_db_handler_spark.operators.sketches import (
        _ceil_rank_quantiles,
        hash_sample_quantile_report,
        hash_value_sample,
        quantiles_from_sample,
    )

    spark = get_spark("r15c-probe")
    sf = "/root/testdata/sf0.1"
    docs0 = spark.read.parquet(f"{sf}/documents.parquet").select("doc_id", "text")
    terms = ("scan", "merge", "hash")

    def rep_docs(m):
        if m == 1:
            return docs0
        reps = spark.range(m).withColumnRenamed("id", "rep")
        return docs0.crossJoin(reps).select(
            (F2.col("doc_id") * m + F2.col("rep")).alias("doc_id"),
            F2.concat(
                F2.col("text"), F2.lit(" r"), F2.col("rep").cast("string")
            ).alias("text"),
        )

    # 1. probe wall vs corpus size
    for m in (1, mult, 4 * mult):
        docs = rep_docs(m)
        n = docs.count()
        path = os.path.join(tempfile.gettempdir(), f"vdh_r15c_bm25_{m}x")
        if not os.path.exists(os.path.join(path, "stats", "base", "_SUCCESS")):
            t0 = time.perf_counter()
            write_bm25_index(docs, path)
            print(f"bm25 index build @ {n} docs: {time.perf_counter()-t0:.1f}s")
        bm25_index_topk(spark, path, terms).collect()  # warm
        t0 = time.perf_counter()
        rows = len(bm25_index_topk(spark, path, terms).collect())
        print(
            f"bm25 index probe @ {n} docs: top-{rows}, "
            f"wall {time.perf_counter()-t0:.2f}s"
        )

    # 2. incremental-index advantage: 1x drop on the 4*mult base
    base = rep_docs(4 * mult)
    drop = docs0.select(
        (F2.col("doc_id") + 100_000_000).alias("doc_id"),
        F2.concat(F2.col("text"), F2.lit(" drop")).alias("text"),
    )
    path = os.path.join(tempfile.gettempdir(), f"vdh_r15c_bm25_{4*mult}x")
    t0 = time.perf_counter()
    try:
        append_bm25_index(drop, path, "drop")
        t_append = time.perf_counter() - t0
    except ValueError:  # re-run: the drop segment is already committed
        t_append = float("nan")
    t0 = time.perf_counter()
    bm25_index_topk(spark, path, terms).collect()
    t_probe = time.perf_counter() - t0
    t0 = time.perf_counter()
    bm25_topk(base.unionByName(drop), list(terms)).collect()
    t_scan = time.perf_counter() - t0
    print(
        f"bm25 IVM @ base {4*mult}x + drop 1x: append {t_append:.1f}s + "
        f"probe {t_probe:.2f}s vs scan-time over union {t_scan:.1f}s"
    )

    # 3. segment-count sensitivity + compaction
    mpath = os.path.join(tempfile.gettempdir(), "vdh_r15c_bm25_seg")
    if not os.path.exists(os.path.join(mpath, "stats", "base", "_SUCCESS")):
        write_bm25_index(rep_docs(mult), mpath)
        for i in range(4):
            arr = docs0.select(
                (F2.col("doc_id") + (i + 1) * 10_000_000).alias("doc_id"),
                F2.concat(F2.col("text"), F2.lit(f" a{i}")).alias("text"),
            )
            append_bm25_index(arr, mpath, f"delta{i}")
    bm25_index_topk(spark, mpath, terms).collect()  # warm
    t0 = time.perf_counter()
    bm25_index_topk(spark, mpath, terms).collect()
    t_five = time.perf_counter() - t0
    folded = compact_bm25_index(spark, mpath)
    t0 = time.perf_counter()
    bm25_index_topk(spark, mpath, terms).collect()
    t_one = time.perf_counter() - t0
    print(
        f"bm25 probe: 5 segments {t_five:.2f}s -> compacted "
        f"({folded} folded) {t_one:.2f}s"
    )

    # 4. quantile sketch at 4*mult events
    ev0 = spark.read.parquet(f"{sf}/events.parquet").select(
        "event_id", "event_type", "value"
    )
    reps = spark.range(4 * mult).withColumnRenamed("id", "rep")
    ev = ev0.crossJoin(reps).select(
        (F2.col("event_id") * 4 * mult + F2.col("rep")).alias("event_id"),
        "event_type",
        (F2.col("value") + F2.col("rep") * 1e-6).alias("value"),
    )
    n = ev.count()
    t0 = time.perf_counter()
    hash_sample_quantile_report(ev).collect()
    t_rep = time.perf_counter() - t0
    t0 = time.perf_counter()
    samp = hash_value_sample(ev, "value", "event_id", "event_type")
    quantiles_from_sample(samp, "event_type", "value", "event_id").collect()
    t_est = time.perf_counter() - t0
    m = samp.count()
    t0 = time.perf_counter()
    _ceil_rank_quantiles(
        ev, "event_type", "value", "event_id", (50, 90, 99), ""
    ).collect()
    t_exact = time.perf_counter() - t0
    print(
        f"quantile sketch @ {n} events: report {t_rep:.1f}s; "
        f"estimate-only {t_est:.2f}s over {m} sampled rows vs "
        f"exact rail {t_exact:.2f}s"
    )


def r14b(mult: int = 4) -> None:
    """Probes for the three r14-staged families (register in r15):
    filtered graph-ANN search (both dispatch branches), the
    graph-index ingest MERGE, and the DELETE path (tombstone probe +
    compaction with edge repair)."""
    import shutil
    import tempfile
    import time

    from pyspark.sql import functions as F2

    from vector_db_handler_spark import driver_queries as dq
    from vector_db_handler_spark.operators.similarity import (
        compact_knn_graph_index,
        delete_knn_graph_index,
        knn_graph_beam_search_filtered,
        knn_graph_nn_descent,
        knn_graph_probe_table,
        write_knn_graph_index,
    )
    from vector_db_handler_spark.streaming.stream_ops import (
        graph_index_stream_probe,
        merge_graph_index_ingest,
        streaming_graph_index_ingest,
    )

    spark = get_spark("r14b-probe")
    sf = "/root/testdata/sf0.1"
    emb0 = spark.read.parquet(f"{sf}/embeddings.parquet")

    def rep_emb(m):
        if m == 1:
            return emb0
        reps = spark.range(m).withColumnRenamed("id", "rep")
        return emb0.crossJoin(reps).select(
            (F2.col("vec_id") * m + F2.col("rep")).alias("vec_id"),
            "embedding", "label",
        )

    for m in (1, mult):
        emb = rep_emb(m).localCheckpoint()
        n = emb.count()
        g = knn_graph_nn_descent(
            emb, k=8, iters=2, kmeans_k=8 * m, rand_buckets=64 * m
        ).localCheckpoint()
        qv = dq.QUERY_VEC
        t0 = time.perf_counter()
        n_sel = knn_graph_beam_search_filtered(
            emb, qv, "label = 3", k=8, beam=10, hops=2
        ).count()
        t1 = time.perf_counter()
        n_broad = knn_graph_beam_search_filtered(
            emb, qv, "label >= 2", k=8, beam=10, hops=2,
            exact_threshold=0, entry_mod=16 * m, graph=g,
        ).count()
        t2 = time.perf_counter()
        print(
            f"filtered_search @ {n} vecs: selective(exact branch) "
            f"{t1-t0:.1f}s/{n_sel} rows; broad(walk branch, build "
            f"amortized) {t2-t1:.1f}s/{n_broad} rows", flush=True,
        )

    for m in (1, mult):
        emb = rep_emb(m).localCheckpoint()
        n = emb.count()
        root = tempfile.mkdtemp(prefix=f"vdh_r14b_{m}x_")
        path = f"{root}/idx"
        write_knn_graph_index(
            emb, path, graph_k=8, graph_iters=2, kmeans_k=8 * m,
            rand_buckets=64 * m, entry_mod=16 * m, layer_mod=None,
        )
        src = f"{root}/src"
        for b, (off, residue) in enumerate([(10_000_000, 0), (20_000_000, 1)]):
            arr = emb.filter(F2.col("vec_id") % 149 == residue).select(
                (F2.col("vec_id") + off).alias("vec_id"), "embedding", "label"
            )
            arr.coalesce(1).write.mode("append").parquet(src)
            stream = spark.readStream.schema(arr.schema).parquet(src)
            streaming_graph_index_ingest(stream, path, f"{root}/cp", hops=2)
        t0 = time.perf_counter()
        nb = merge_graph_index_ingest(spark, path)
        t1 = time.perf_counter()
        graph_index_stream_probe(spark, path, dq.QUERY_VEC, k=8, beam=10, hops=2).collect()
        t2 = time.perf_counter()
        # delete 1/173 of the corpus, probe tombstoned, then compact
        doomed = emb.filter(F2.col("vec_id") % 173 == 0).select("vec_id")
        delete_knn_graph_index(spark, path, doomed)
        t3 = time.perf_counter()
        knn_graph_probe_table(spark, path, dq.QUERY_VEC, k=8, beam=10, hops=2).collect()
        t4 = time.perf_counter()
        compact_knn_graph_index(spark, path)
        t5 = time.perf_counter()
        print(
            f"merge+delete @ {n} vecs: merge({nb} batches) {t1-t0:.1f}s, "
            f"post-merge probe {t2-t1:.1f}s, delete {t3-t2:.1f}s, "
            f"tombstoned probe {t4-t3:.1f}s, compact+repair {t5-t4:.1f}s",
            flush=True,
        )
        shutil.rmtree(root, ignore_errors=True)



def r12b(mult: int = 4) -> None:
    """Linearity probes for the six r12-STAGED operators (register in
    r13; probed before registration so the scale claims ship with the
    code):

    * ``knn_graph_beam_search`` — entry scan = a 1/entry_mod hash
      slice; per hop <= beam*(2k+1) candidates; graph build amortized
      (prebuilt and reused across the probe's queries).
    * ``hyperball_neighborhood`` — per round one edges-regs join + a
      (node,bucket) max-merge; state <= |V|*K rows.
    * ``watermark_late_audit`` — two-level prefix max: per-bucket
      census + within-bucket windows; no global sort.
    * ``domain_mixture_weights`` — one bigram explode, one
      vocabulary-sized model join, |domains|-row arithmetic.
    * ``minmax_pruning_report`` — two bucket censuses + one matching
      pass; |preds| x |buckets| broadcast cross.
    * ``power_iteration_top_pc`` — one Arrow Gram pass (dim^2 partial
      per batch); iterations run on dim^2-row relations.
    """
    from pyspark.sql import functions as F2

    from vector_db_handler_spark.operators.graph import (
        hyperball_neighborhood,
    )
    from vector_db_handler_spark.operators.layout import (
        minmax_pruning_report,
    )
    from vector_db_handler_spark.operators.lm_score import (
        domain_mixture_weights,
    )
    from vector_db_handler_spark.operators.quantize import (
        power_iteration_top_pc,
    )
    from vector_db_handler_spark.operators.similarity import (
        knn_graph_beam_search,
        knn_graph_nn_descent,
    )
    from vector_db_handler_spark.operators.windows import (
        watermark_late_audit,
    )

    spark = get_spark("r12b-probe")
    sf = "/root/testdata/sf0.1"
    emb0 = spark.read.parquet(f"{sf}/embeddings.parquet")
    docs0 = spark.read.parquet(f"{sf}/documents.parquet")
    ev0 = spark.read.parquet(f"{sf}/events.parquet")
    li = spark.read.parquet(f"{sf}/lineitem.parquet")

    def rep_emb(m):
        if m == 1:
            return emb0
        reps = spark.range(m).withColumnRenamed("id", "rep")
        return emb0.crossJoin(reps).select(
            (F2.col("vec_id") * m + F2.col("rep")).alias("vec_id"),
            "embedding", "label",
        )

    qv = [((i * 37 + 11) % 101 - 50) / 50.0 for i in range(64)]
    for m in (1, mult):
        emb = rep_emb(m)
        n = emb.count()
        t0 = time.perf_counter()
        g = knn_graph_nn_descent(
            emb, k=5, iters=2, kmeans_k=8 * m, rand_buckets=64 * m
        ).localCheckpoint()
        t1 = time.perf_counter()
        out = knn_graph_beam_search(
            emb, qv, k=10, beam=12, hops=2, graph=g, entry_mod=32 * m
        ).count()
        t2 = time.perf_counter()
        print(
            f"beam_search @ {n} vecs: build {t1-t0:.1f}s, "
            f"search {t2-t1:.1f}s ({out} rows, entry_mod {32*m})"
        )
        from vector_db_handler_spark.operators.similarity import (
            knn_graph_beam_search_batch,
        )

        queries = emb.filter(F2.col("vec_id") % 97 == 0).select(
            F2.col("vec_id").alias("query_id"), "embedding"
        )
        nq = queries.count()
        t3 = time.perf_counter()
        outb = knn_graph_beam_search_batch(
            emb, queries, k=5, beam=8, hops=2, graph=g, entry_mod=32 * m
        ).count()
        t4 = time.perf_counter()
        print(
            f"beam_batch @ {n} vecs x {nq} queries: "
            f"serve {t4-t3:.1f}s ({outb} rows)"
        )

    e0 = li.select("l_partkey", "l_suppkey").distinct()
    edges0 = e0.select(
        (F2.col("l_partkey") * 2).alias("src"),
        (F2.col("l_suppkey") * 2 + 1).alias("dst"),
    )
    for m in (1, mult):
        if m == 1:
            edges = edges0
        else:
            reps = spark.range(m).withColumnRenamed("id", "rep")
            edges = edges0.crossJoin(reps).select(
                (F2.col("src") * m + F2.col("rep")).alias("src"),
                (F2.col("dst") * m + F2.col("rep")).alias("dst"),
            )
        ne = edges.count()
        t0 = time.perf_counter()
        nrows = hyperball_neighborhood(edges, n_hops=2).count()
        print(
            f"hyperball @ {ne} edges: {nrows} (node,hop) rows, "
            f"wall {time.perf_counter()-t0:.1f}s"
        )

    for m in (1, mult):
        if m == 1:
            ev = ev0
        else:
            reps = spark.range(m).withColumnRenamed("id", "rep")
            ev = ev0.crossJoin(reps).select(
                (F2.col("event_id") * m + F2.col("rep")).alias("event_id"),
                "ts", "user_id", "event_type", "value", "props",
            )
        ev = ev.withColumn(
            "arrival_seq",
            F2.col("event_id")
            + F2.when(F2.col("event_id") % 7 == 0, F2.lit(500)).otherwise(
                F2.lit(0)
            ),
        )
        n = ev.count()
        t0 = time.perf_counter()
        out = watermark_late_audit(ev, delay_sec=3600).count()
        print(
            f"watermark_audit @ {n} events: {out} windows, "
            f"wall {time.perf_counter()-t0:.1f}s"
        )

    def rep_docs(m):
        if m == 1:
            return docs0
        reps = spark.range(m).withColumnRenamed("id", "rep")
        return docs0.crossJoin(reps).select(
            (F2.col("doc_id") * m + F2.col("rep")).alias("doc_id"),
            "text", "lang", "source", "n_chars",
        )

    for m in (1, mult):
        docs = rep_docs(m)
        n = docs.count()
        t0 = time.perf_counter()
        out = domain_mixture_weights(docs).count()
        print(
            f"domain_mixture @ {n} docs: {out} domains, "
            f"wall {time.perf_counter()-t0:.1f}s"
        )

    orders0 = spark.read.parquet(f"{sf}/orders.parquet").select(
        F2.col("o_custkey").cast("long").alias("ck"),
        F2.datediff(
            F2.col("o_orderdate").cast("date"),
            F2.lit("1995-01-01").cast("date"),
        ).cast("long").alias("days"),
    )
    preds = [
        ("cust_low", 1, 150, -2000, 3000),
        ("one_year", 0, 1_000_000, 365, 730),
    ]
    for m in (1, mult):
        if m == 1:
            orders = orders0
        else:
            reps = spark.range(m).withColumnRenamed("id", "rep")
            orders = orders0.crossJoin(reps).select("ck", "days")
        n = orders.count()
        t0 = time.perf_counter()
        out = minmax_pruning_report(
            orders, "ck", "days", preds, bucket_shift=18
        ).count()
        print(
            f"pruning_report @ {n} rows: {out} preds, "
            f"wall {time.perf_counter()-t0:.1f}s"
        )

    for m in (1, mult):
        emb = rep_emb(m)
        n = emb.count()
        t0 = time.perf_counter()
        out = power_iteration_top_pc(emb, iters=2).count()
        print(
            f"power_iteration @ {n} vecs: {out} dims, "
            f"wall {time.perf_counter()-t0:.1f}s"
        )


def r12(mult: int = 4) -> None:
    """Linearity probes for the two r11-staged families that lacked
    two-scale rows (r11 verdict stretch #6), run before their r12
    registration:

    * ``rank_eval_metrics`` — the operator's data scale is the EVAL
      relation (results x truth), never the corpus: probe with
      synthetic per-query rankings at two query-set sizes; the rollup
      is |queries| rows and every window partitions by query_id.
    * Arrow IPC roundtrip — executor-side write (one file per
      partition, explicit canonical schema) + distributed binaryFile
      read; wall linear in bytes.
    """
    import shutil
    import tempfile

    from vector_db_handler_spark.operators.retrieval import (
        rank_eval_metrics,
    )
    from vector_db_handler_spark.sources.arrow_ipc import (
        read_documents_arrow,
        write_documents_arrow,
    )

    spark = get_spark("r12-probe")
    sf = "/root/testdata/sf0.1"

    for n_q in (10_000, 10_000 * mult):
        # 10 results/query, truth = a deterministic half-overlap
        base = spark.range(n_q).withColumnRenamed("id", "query_id")
        ranks = spark.range(1, 11).withColumnRenamed("id", "rank")
        results = base.crossJoin(ranks).select(
            "query_id",
            F.concat(F.lit("it"), ((F.col("query_id") * 37 + F.col("rank")) % 20).cast("string")).alias("neighbor_id"),
            "rank",
        ).dropDuplicates(["query_id", "neighbor_id"])
        truth = base.crossJoin(
            spark.range(1, 11).withColumnRenamed("id", "rel")
        ).select(
            "query_id",
            F.concat(F.lit("it"), ((F.col("query_id") * 37 + F.col("rel") * 2) % 20).cast("string")).alias("neighbor_id"),
            "rel",
        ).dropDuplicates(["query_id", "neighbor_id"])
        t0 = time.perf_counter()
        n = rank_eval_metrics(results, truth).count()
        print(
            f"rank_eval_metrics @ {n_q} queries: {n} out-rows, "
            f"wall {time.perf_counter()-t0:.1f}s"
        )

    docs0 = spark.read.parquet(f"{sf}/documents.parquet")

    def replicate(df, m):
        if m == 1:
            return df
        reps = spark.range(m).withColumnRenamed("id", "rep")
        return df.crossJoin(reps).select(
            (F.col("doc_id") * m + F.col("rep")).alias("doc_id"),
            *[c for c in df.columns if c != "doc_id"],
        )

    for m in (1, mult):
        docs = replicate(docs0, m).repartition(16)
        rows = docs.count()
        root = tempfile.mkdtemp(prefix="vdh_probe_arrow_")
        try:
            t0 = time.perf_counter()
            n_w = write_documents_arrow(docs, root)
            t1 = time.perf_counter()
            n_r = read_documents_arrow(spark, root).count()
            t2 = time.perf_counter()
            assert n_w == n_r == rows
            print(
                f"arrow_ipc @ {rows} docs: write {t1-t0:.1f}s, "
                f"read {t2-t1:.1f}s"
            )
        finally:
            shutil.rmtree(root, ignore_errors=True)


def r11(mult: int = 4) -> None:
    """Linearity probes for the round-11 STAGED operators (to register
    in r12; probed before registration so the scale claims ship with
    the code):

    * ``hll_distinct_by_key`` — wall vs event volume under user-id
      offsetting (the register relation is |keys|*K rows, asserted
      flat across the replication — the constant-state property).
    * ``token_entropy`` — wall vs corpus (one census shuffle; the log
      runs on census counts, never raw tokens).
    * ``inclusion_dependencies`` — wall vs rows (per-candidate
      distinct censuses + one value join; cost rides distinct
      cardinality).
    * ``nb_margin_calibration`` — same plan family as the probed
      nb_holdout_confusion plus a log2-bucketed rollup whose output
      is asserted ~60 rows regardless of corpus.
    * ``rendezvous_rebalance_report`` — in-row double assignment, one
      pair census (<= |shards|^2 rows, asserted flat).
    * ``dsir_importance`` — two model shuffles + ONE shared bigram
      explode double-joined; linear in corpus bigrams.
    * ``cdc_containment_pairs`` — Arrow gear-hash kernel linear in
      blob bytes; candidate join behind the hot-chunk guard.
    * ``cuped_adjusted_metrics`` — one per-user map-side-combined
      aggregate; theta moments are a 1-row broadcast scalar.
    * ``kl_token_drift`` — two censuses + one vocabulary-sized outer
      join; the log runs on census counts.
    * ``label_propagation_communities`` — per round one edges-labels
      join + one vote census + per-node argmax over votes.
    * ``knn_graph_nn_descent`` — cell-local + hash-bucket init, per
      round bounded (2k)^2-candidate rescoring.
    """
    from vector_db_handler_spark.functions import text as text_fns
    from vector_db_handler_spark.operators.features import token_entropy
    from vector_db_handler_spark.operators.hll import hll_distinct_by_key
    from vector_db_handler_spark.operators.layout import (
        rendezvous_rebalance_report,
    )
    from vector_db_handler_spark.operators.nb_classifier import (
        nb_margin_calibration,
    )
    from vector_db_handler_spark.operators.profile import (
        inclusion_dependencies,
    )

    spark = get_spark("r11-probe")
    sf = "/root/testdata/sf0.1"
    ev0 = spark.read.parquet(f"{sf}/events.parquet")
    docs0 = (
        spark.read.parquet(f"{sf}/documents.parquet")
        .select("doc_id", "text")
        .filter("text is not null")
    )

    for m in (1, mult):
        ev = ev0
        if m > 1:
            reps = spark.range(m).withColumnRenamed("id", "rep")
            # offset user ids so replication multiplies TRUE cardinality
            ev = ev0.crossJoin(reps).select(
                (F.col("user_id") * m + F.col("rep")).alias("user_id"),
                "event_type",
            )
        rows = ev.count()
        t0 = time.perf_counter()
        out = hll_distinct_by_key(ev, "event_type", "user_id").collect()
        n_regs = sum(64 for _ in out)  # K registers per key by construction
        worst = max(
            abs(r["est_used"] - r["n_exact"]) / max(r["n_exact"], 1)
            for r in out
        )
        print(
            f"hll @ {rows} events: {len(out)} keys x 64 regs "
            f"(state {n_regs} rows), worst err {worst:.1%}, "
            f"wall {time.perf_counter()-t0:.1f}s"
        )

    def replicate(df, m):
        if m == 1:
            return df
        reps = spark.range(m).withColumnRenamed("id", "rep")
        return df.crossJoin(reps).select(
            (F.col("doc_id") * m + F.col("rep")).alias("doc_id"),
            *[c for c in df.columns if c != "doc_id"],
        )

    for m in (1, mult):
        docs = replicate(docs0, m)
        rows = docs.count()
        t0 = time.perf_counter()
        n = token_entropy(docs).count()
        print(
            f"token_entropy @ {rows} docs: {n} out-rows, "
            f"wall {time.perf_counter()-t0:.1f}s"
        )

    tables0 = {
        t: spark.read.parquet(f"{sf}/{t}.parquet")
        for t in ("orders", "customer", "lineitem", "part", "nation", "supplier")
    }
    cands = [
        ("orders", "o_custkey", "customer", "c_custkey"),
        ("customer", "c_custkey", "orders", "o_custkey"),
        ("lineitem", "l_orderkey", "orders", "o_orderkey"),
        ("lineitem", "l_partkey", "part", "p_partkey"),
        ("customer", "c_nationkey", "nation", "n_nationkey"),
        ("supplier", "s_nationkey", "nation", "n_nationkey"),
    ]
    for m in (1, mult):
        tables = dict(tables0)
        if m > 1:
            reps = spark.range(m).withColumnRenamed("id", "rep")
            tables["lineitem"] = tables0["lineitem"].crossJoin(reps).drop("rep")
            tables["orders"] = tables0["orders"].crossJoin(reps).drop("rep")
        rows = tables["lineitem"].count() + tables["orders"].count()
        t0 = time.perf_counter()
        n = inclusion_dependencies(tables, cands).count()
        print(
            f"ind_discovery @ {rows} child+parent rows x {len(cands)} "
            f"candidates: {n} out-rows, wall {time.perf_counter()-t0:.1f}s"
        )

    docs_rl = docs0.withColumn("rule_lang", text_fns.lang_id(F.col("text")))
    for m in (1, mult):
        docs = replicate(docs_rl, m)
        rows = docs.count()
        t0 = time.perf_counter()
        out = nb_margin_calibration(docs, label_col="rule_lang").collect()
        print(
            f"nb_calibration @ {rows} docs: {len(out)} buckets, "
            f"wall {time.perf_counter()-t0:.1f}s"
        )


    from vector_db_handler_spark.operators.lm_score import dsir_importance

    for m in (1, mult):
        docs = replicate(docs0, m)
        rows = docs.count()
        t0 = time.perf_counter()
        n = dsir_importance(docs, docs.limit(rows // 5)).count()
        print(
            f"dsir @ {rows} docs: {n} weighted, "
            f"wall {time.perf_counter()-t0:.1f}s"
        )


    from vector_db_handler_spark.operators.dedup import cdc_containment_pairs
    from vector_db_handler_spark.operators.media import (
        synthesize_blobs_with_edits,
    )

    for m in (1, mult):
        docs = replicate(docs0, m)
        blobs = synthesize_blobs_with_edits(docs)
        n_blobs = blobs.count()
        t0 = time.perf_counter()
        n_pairs = cdc_containment_pairs(blobs, mask_bits=6).count()
        print(
            f"cdc @ {n_blobs} blobs: {n_pairs} pairs, "
            f"wall {time.perf_counter()-t0:.1f}s"
        )


    from vector_db_handler_spark.operators.features import (
        cuped_adjusted_metrics,
    )

    for m in (1, mult):
        ev = ev0
        if m > 1:
            reps = spark.range(m).withColumnRenamed("id", "rep")
            ev = ev0.crossJoin(reps).select(
                (F.col("user_id") * m + F.col("rep")).alias("user_id"),
                "ts",
                "value",
            )
        rows = ev.count()
        t0 = time.perf_counter()
        out = cuped_adjusted_metrics(ev).collect()
        print(
            f"cuped @ {rows} events: {len(out)} variants, "
            f"wall {time.perf_counter()-t0:.1f}s"
        )


    from vector_db_handler_spark.operators.features import kl_token_drift
    from vector_db_handler_spark.operators.graph import (
        label_propagation_communities,
    )

    docs_lang = spark.read.parquet(f"{sf}/documents.parquet").select(
        "doc_id", "text", "lang"
    ).filter("text is not null")
    for m in (1, mult):
        docs = docs_lang
        if m > 1:
            reps = spark.range(m).withColumnRenamed("id", "rep")
            docs = docs_lang.crossJoin(reps).select(
                (F.col("doc_id") * m + F.col("rep")).alias("doc_id"),
                "text",
                "lang",
            )
        rows = docs.count()
        t0 = time.perf_counter()
        r = kl_token_drift(
            docs.filter("lang = 'en'"), docs.filter("lang != 'en'")
        ).collect()[0]
        print(
            f"kl_drift @ {rows} docs: vocab {r['vocab_union']}, "
            f"kl {r['kl_bits']:.3f} bits, wall {time.perf_counter()-t0:.1f}s"
        )

    li = spark.read.parquet(f"{sf}/lineitem.parquet")
    for m in (1, mult):
        e0 = li.select("l_partkey", "l_suppkey").distinct()
        if m > 1:
            reps = spark.range(m).withColumnRenamed("id", "rep")
            # disjoint replicas: m independent copies of the graph
            e0 = (
                li.select("l_partkey", "l_suppkey").distinct()
                .crossJoin(reps)
                .select(
                    (F.col("l_partkey") * m + F.col("rep")).alias("l_partkey"),
                    (F.col("l_suppkey") * m + F.col("rep")).alias("l_suppkey"),
                )
            )
        edges = e0.select(
            (F.col("l_partkey") * 2).alias("src"),
            (F.col("l_suppkey") * 2 + 1).alias("dst"),
        )
        n_e = edges.count()
        t0 = time.perf_counter()
        n_comm = (
            label_propagation_communities(edges, n_iters=3)
            .select("community")
            .distinct()
            .count()
        )
        print(
            f"lpa @ {n_e} edges: {n_comm} communities, "
            f"wall {time.perf_counter()-t0:.1f}s"
        )


    from vector_db_handler_spark.operators.similarity import (
        knn_graph_nn_descent,
    )

    emb0 = spark.read.parquet(f"{sf}/embeddings.parquet")
    for m in (1, mult):
        emb = emb0
        if m > 1:
            reps = spark.range(m).withColumnRenamed("id", "rep")
            emb = emb0.crossJoin(reps).select(
                (F.col("vec_id") * m + F.col("rep")).alias("vec_id"),
                "embedding",
            )
        n = emb.count()
        t0 = time.perf_counter()
        # the dials SCALE with the corpus (bounded cell / bucket
        # size is the whole scale claim: init pairs ~ N * cell_size)
        n_edges = knn_graph_nn_descent(
            emb, k=5, iters=2, kmeans_k=8 * m, rand_buckets=64 * m
        ).count()
        print(
            f"nn_descent @ {n} vectors (kmeans_k={8 * m}): "
            f"{n_edges} edges, wall {time.perf_counter()-t0:.1f}s"
        )

    before = [f"s{i}" for i in range(8)]
    after = [f"s{i}" for i in range(9)]
    for m in (1, mult):
        docs = replicate(docs0.select("doc_id"), m)
        rows = docs.count()
        t0 = time.perf_counter()
        out = rendezvous_rebalance_report(docs, before, after).collect()
        moved = sum(r["n_moved_out"] for r in out)
        print(
            f"rendezvous @ {rows} ids: {len(out)} shards, moved "
            f"{moved} ({moved/rows:.1%}), wall {time.perf_counter()-t0:.1f}s"
        )


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "r15c":
        r15c(int(sys.argv[2]) if len(sys.argv) > 2 else 4)
    elif len(sys.argv) > 1 and sys.argv[1] == "lsh":
        lsh(int(sys.argv[2]) if len(sys.argv) > 2 else 100)
    elif len(sys.argv) > 1 and sys.argv[1] == "neardup":
        neardup(int(sys.argv[2]) if len(sys.argv) > 2 else 100_000)
    elif len(sys.argv) > 1 and sys.argv[1] == "simhash":
        simhash(int(sys.argv[2]) if len(sys.argv) > 2 else 100_000)
    elif len(sys.argv) > 1 and sys.argv[1] == "components":
        components(
            int(sys.argv[2]) if len(sys.argv) > 2 else 1_000_000,
            int(sys.argv[3]) if len(sys.argv) > 3 else 40,
        )
    elif len(sys.argv) > 1 and sys.argv[1] == "winnowing":
        winnowing(int(sys.argv[2]) if len(sys.argv) > 2 else 16)
    elif len(sys.argv) > 1 and sys.argv[1] == "r6ops":
        r6ops(int(sys.argv[2]) if len(sys.argv) > 2 else 16)
    elif len(sys.argv) > 1 and sys.argv[1] == "r6b":
        r6b(int(sys.argv[2]) if len(sys.argv) > 2 else 16)
    elif len(sys.argv) > 1 and sys.argv[1] == "srp_guard":
        srp_guard(int(sys.argv[2]) if len(sys.argv) > 2 else 20_000)
    elif len(sys.argv) > 1 and sys.argv[1] == "winnow_guard":
        winnow_guard(int(sys.argv[2]) if len(sys.argv) > 2 else 20_000)
    elif len(sys.argv) > 1 and sys.argv[1] == "r6d":
        r6d(int(sys.argv[2]) if len(sys.argv) > 2 else 16)
    elif len(sys.argv) > 1 and sys.argv[1] == "r6c":
        r6c(int(sys.argv[2]) if len(sys.argv) > 2 else 4)
    elif len(sys.argv) > 1 and sys.argv[1] == "r7b":
        r7b(int(sys.argv[2]) if len(sys.argv) > 2 else 16)
    elif len(sys.argv) > 1 and sys.argv[1] == "r7":
        r7(int(sys.argv[2]) if len(sys.argv) > 2 else 16)
    elif len(sys.argv) > 1 and sys.argv[1] == "ppjoin":
        ppjoin(int(sys.argv[2]) if len(sys.argv) > 2 else 4)
    elif len(sys.argv) > 1 and sys.argv[1] == "r13c":
        r13c(int(sys.argv[2]) if len(sys.argv) > 2 else 4)
    elif len(sys.argv) > 1 and sys.argv[1] == "r13b":
        r13b(int(sys.argv[2]) if len(sys.argv) > 2 else 4)
    elif len(sys.argv) > 1 and sys.argv[1] == "r13":
        r13(int(sys.argv[2]) if len(sys.argv) > 2 else 4)
    elif len(sys.argv) > 1 and sys.argv[1] == "r15b":
        r15b(int(sys.argv[2]) if len(sys.argv) > 2 else 16)
    elif len(sys.argv) > 1 and sys.argv[1] == "r14b":
        r14b(int(sys.argv[2]) if len(sys.argv) > 2 else 4)
    elif len(sys.argv) > 1 and sys.argv[1] == "r14":
        r14(int(sys.argv[2]) if len(sys.argv) > 2 else 4)
    elif len(sys.argv) > 1 and sys.argv[1] == "r12d":
        r12d(int(sys.argv[2]) if len(sys.argv) > 2 else 4)
    elif len(sys.argv) > 1 and sys.argv[1] == "r12c":
        r12c(int(sys.argv[2]) if len(sys.argv) > 2 else 4)
    elif len(sys.argv) > 1 and sys.argv[1] == "r12b":
        r12b(int(sys.argv[2]) if len(sys.argv) > 2 else 4)
    elif len(sys.argv) > 1 and sys.argv[1] == "r12":
        r12(int(sys.argv[2]) if len(sys.argv) > 2 else 4)
    elif len(sys.argv) > 1 and sys.argv[1] == "r11":
        r11(int(sys.argv[2]) if len(sys.argv) > 2 else 4)
    elif len(sys.argv) > 1 and sys.argv[1] == "r10":
        r10(int(sys.argv[2]) if len(sys.argv) > 2 else 4)
    elif len(sys.argv) > 1 and sys.argv[1] == "r9b":
        r9b(int(sys.argv[2]) if len(sys.argv) > 2 else 4)
    elif len(sys.argv) > 1 and sys.argv[1] == "r9":
        r9(int(sys.argv[2]) if len(sys.argv) > 2 else 4)
    elif len(sys.argv) > 1 and sys.argv[1] == "ann":
        ann_neardup(int(sys.argv[2]) if len(sys.argv) > 2 else 500_000)
    else:
        main(int(sys.argv[1]) if len(sys.argv) > 1 else 100)

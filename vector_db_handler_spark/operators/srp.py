"""Signed-Random-Projection LSH (SRP / random-hyperplane hashing) for
embedding near-dup — the LSH-bucketed ANN family, complementing the
IVF-cell family (``similarity.cosine_neardup_ann``).

Reference context: the reference's only ANN path is Qdrant's HNSW
(``document_ingestor.py:356-363``), which is neither deterministic nor
batch-oriented; SRP is the classic *distributed* alternative (Charikar
2002): ``h(v) = sign(v·r)`` per random hyperplane ``r``, so
``P[h_i(u) = h_i(v)] = 1 − θ(u,v)/π`` — cosine-close vectors agree on
most bits, and banding the bit signature turns near-dup search into an
equi-join, exactly the MinHash-LSH shape already used for text
(``dedup.minhash_lsh_pairs``).

Exactness design (what makes this oracle-checkable where float SRP is
not): hyperplanes are **±1 integer** vectors (Achlioptas-style sparse
projections) applied to the **int8-quantized** corpus
(``quantize.quantize_int8``), so every projection is an exact integer
in [−64·127, 64·127] and the sign bit can never flip on a last-ulp
summation difference between engines.  The verify step is the exact
integer cosine test ``dot > 0 AND den²·dot² ≥ num²·|u|²·|v|²`` for a
rational threshold ``num/den`` — no floating point until the final
reported score (one sqrt·sqrt·divide chain, every op IEEE
correctly-rounded, hence engine-identical).

Scale design (100 TB posture):

* signatures are ONE narrow zero-shuffle Arrow pass — all n_bits
  integer dot-products per row computed as a single int64 matrix
  product per batch (the repo's vector-math rule: Spark's
  higher-order array functions evaluate interpreted AND cost
  O(n_bits·dim) driver-side analysis per query — measured 3.3 s at
  n_bits=32 before any data moved);
* candidates come from a BANDED equi-join on ``(band_idx, band_val)``
  — shuffle volume is N·n_bands skinny rows, never the N² pair
  product; a pair is verified at most once (``dropDuplicates`` on the
  id pair before the cheap test);
* hot buckets (the all-zeros signature of near-zero vectors, or any
  degenerate band) are bounded by ``max_bucket``: bucket census →
  drop buckets with more than ``max_bucket`` members — the SRP twin
  of the winnowing stop-fingerprint guard, same falsifiability probe;
* verification touches candidates only — cost ∝ collision volume
  (tunable via bands×bits), not corpus².

Recall is probabilistic (a pair agreeing on no band is missed) — the
registered driver query's oracle REPLAYS the algorithm (signatures →
bands → verify) rather than asserting all-pairs recall, and
``tests/test_srp.py`` measures recall against the exact baseline
separately.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, LongType, StructField, StructType

from vector_db_handler_spark.operators.quantize import quantize_int8

#: Default geometry: 32 bits in 8 bands of 4.  For cosine ≥ 0.9
#: (θ ≤ 0.451 rad, per-bit agreement p ≈ 0.856), band-hit probability
#: is 1−(1−p⁴)⁸ ≈ 0.994 per pair — and even at the borderline
#: cosine-0.45 regime (p ≈ 0.649, band hit 0.177) eight bands recall
#: ~81% of threshold-grazing pairs.  Cost of widening is linear
#: (N·n_bands banded rows), never quadratic.
#:
#: SIZE THE BAND-VALUE SPACE TO THE CORPUS: a band of b bits has only
#: 2ᵇ buckets, so expected bucket size is N/2ᵇ — once that crosses
#: ``max_bucket`` the guard drops EVERYTHING (measured in the
#: tools/scale_probe.py ``srp_guard`` run: 4-bit bands saturate at
#: ~20k vectors).  Rule: choose bits-per-band so N/2ᵇ ≪ max_bucket —
#: 15-bit bands (n_bits=60, n_bands=4) carry 32 768 buckets per band
#: and hold to ~10⁶–10⁷ rows; beyond that, band on (band_idx,
#: band_val) PAIRS of two such signatures.  The signature packs into
#: one BIGINT, which caps n_bits at 63 (bit 63 is the sign).
N_BITS = 32
N_BANDS = 8


def srp_planes(dim: int, n_bits: int = N_BITS, seed: int = 7) -> list[list[int]]:
    """Deterministic ±1 hyperplane matrix (n_bits × dim), from a seeded
    PCG64 stream.  Shared verbatim by the Spark expressions and the SQL
    oracle (both sides format THESE integers as literals), so the two
    engines hash the same geometry by construction."""
    if n_bits > 63:
        raise ValueError("n_bits must be <= 63 (signature packs into one signed BIGINT)")
    rng = np.random.Generator(np.random.PCG64(seed))
    signs = rng.integers(0, 2, size=(n_bits, dim)) * 2 - 1
    return [[int(v) for v in row] for row in signs]


def srp_signatures(
    emb: DataFrame,
    planes: list[list[int]],
    embedding_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """(id, qvec, norm2, sig): int8 quantization + the packed SRP bit
    signature (bit b set ⟺ qvec·plane_b ≥ 0) + the exact squared norm
    (carried so the verify step needs no second corpus pass).

    One zero-shuffle narrow Arrow pass after quantization: all n_bits
    projections are ONE int64 matrix product per batch (numpy), the
    sign bits pack via a second tiny matmul against the 2^b weight
    vector.  Earlier revisions built the same integers from n_bits
    nested ``aggregate``/``zip_with`` HOF expressions — measured cost
    at n_bits=32 was 3.3 s of DRIVER time just to construct/analyze
    the expression tree (before any data moved) plus interpreted
    per-element evaluation; the matmul form is constant-size in the
    plan and exact-identical bit for bit (small-integer int64 math,
    no rounding anywhere)."""
    q = quantize_int8(emb, embedding_col=embedding_col, id_col=id_col)
    id_field = q.schema[id_col]
    out_schema = StructType(
        [
            StructField(id_col, id_field.dataType, id_field.nullable),
            StructField("qvec", ArrayType(LongType()), False),
            StructField("norm2", LongType(), False),
            StructField("sig", LongType(), False),
        ]
    )
    P = np.asarray(planes, dtype=np.int64).T  # dim × n_bits
    W = (np.int64(1) << np.arange(len(planes), dtype=np.int64)).astype(np.int64)

    def add_sig(batches):  # self-contained: cloudpickled to executors
        import numpy as np

        for pdf in batches:
            if pdf.empty:
                continue
            V = np.asarray([np.asarray(v, dtype=np.int64) for v in pdf["qvec"]])
            bits = (V @ P >= 0).astype(np.int64)
            out = pdf.copy()
            out["norm2"] = (V * V).sum(axis=1)
            out["sig"] = bits @ W
            yield out

    return q.mapInPandas(add_sig, out_schema)


def srp_neardup_pairs(
    emb: DataFrame,
    threshold_num: int = 9,
    threshold_den: int = 10,
    n_bits: int = N_BITS,
    n_bands: int = N_BANDS,
    seed: int = 7,
    max_bucket: int = 200,
    dim: int = 64,
    embedding_col: str = "embedding",
    id_col: str = "vec_id",
    sigs: DataFrame | None = None,
) -> DataFrame:
    """All candidate pairs (i < j) sharing ≥ 1 SRP band whose exact
    int8 cosine ≥ threshold_num/threshold_den.  Output
    ``(id1, id2, score)`` with score = the correctly-rounded double
    cosine of the quantized vectors.

    Shuffle ledger: quantize scan → signature pass (narrow Arrow hop,
    chained with the quantize hop in one stage) → explode n_bands
    rows/vector → bucket-census join (guard) → band equi-join and
    pair dedup on IDS ONLY → vectors re-attached to the unique pairs
    → native integer verify.  Nothing is collected; after the
    signature pass everything is JVM-side.

    ``sigs``: optionally a PRECOMPUTED `srp_signatures` relation at
    the same (dim, n_bits, seed) — callers holding a materialized
    signature build (the driver's shared per-fixture cache) skip
    re-paying the quantize + matmul pass; the geometry dials must
    match the build's or the bands are meaningless.

    Precondition: ``id_col`` is UNIQUE per row (r15 ADVICE note) —
    the ids-only pair dedup re-attaches vectors by id equi-joins,
    which would multiply rows under duplicated ids where the old
    payload-carrying dedup collapsed them.
    """
    if n_bits % n_bands:
        raise ValueError("n_bands must divide n_bits")
    bpb = n_bits // n_bands
    mask = (1 << bpb) - 1

    if sigs is None:
        planes = srp_planes(dim, n_bits, seed)
        sigs = srp_signatures(emb, planes, embedding_col, id_col)
    bands_arr = F.array(
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
    banded = sigs.select(
        id_col, "qvec", "norm2", F.explode(bands_arr).alias("bv")
    ).select(id_col, "qvec", "norm2", F.col("bv.band_idx").alias("band_idx"), F.col("bv.band_val").alias("band_val"))
    # The banded relation feeds THREE consumers (census, join side a,
    # join side b); uncached, Spark re-executes the quantize+signature
    # scan once per branch — a 4× corpus read through Python at scale.
    # Cache it, materialize the verified result eagerly, release the
    # cache before returning (the repo's cache-hygiene rule).
    banded = banded.cache()
    # Hot-bucket guard: a census over (band_idx, band_val); buckets
    # larger than max_bucket are dropped BEFORE the pair join (the
    # stop-fingerprint pattern).  At the default geometry a degenerate
    # bucket would otherwise go quadratic on template/zero vectors.
    census = (
        banded.groupBy("band_idx", "band_val")
        .agg(F.count("*").alias("bucket_n"))
        .filter(F.col("bucket_n") <= int(max_bucket))
        .select("band_idx", "band_val")
    )
    kept = banded.join(census, ["band_idx", "band_val"])

    # Pair join on IDS ONLY, vectors re-attached after the dedup (r15,
    # guide §8/§2.3 — the same rewrite the multiprobe variant below
    # already carries): the collision set is far larger than the
    # unique-pair set, and shipping two 64-int vectors per collision
    # through the band join and the dedup exchange was this bench's
    # largest single shuffle (197.9 MB at sf0.1 vs ~10 MB of id
    # pairs).  The re-attach join is NOT force-broadcast: AQE
    # broadcasts it at fixture scale, while at 100 TB it stays a
    # shuffle join keyed on the id — both correct, chosen by stats.
    a = kept.select("band_idx", "band_val", F.col(id_col).alias("id1"))
    b = kept.select("band_idx", "band_val", F.col(id_col).alias("id2"))
    pair_ids = (
        a.join(b, ["band_idx", "band_val"])
        .filter(F.col("id1") < F.col("id2"))
        .select("id1", "id2")
        .dropDuplicates(["id1", "id2"])
    )
    vecs = banded.select(
        F.col(id_col), F.col("qvec"), F.col("norm2")
    ).dropDuplicates([id_col])
    cands = pair_ids.join(
        vecs.select(
            F.col(id_col).alias("id1"),
            F.col("qvec").alias("q1"),
            F.col("norm2").alias("n1"),
        ),
        "id1",
    ).join(
        vecs.select(
            F.col(id_col).alias("id2"),
            F.col("qvec").alias("q2"),
            F.col("norm2").alias("n2"),
        ),
        "id2",
    )
    dot = F.aggregate(
        F.zip_with(F.col("q1"), F.col("q2"), lambda x, y: x * y),
        F.lit(0).cast("long"),
        lambda acc, v: acc + v,
    )
    num, den = int(threshold_num), int(threshold_den)
    verified = cands.withColumn("dot", dot).filter(
        (F.col("dot") > 0)
        & (
            F.lit(den * den) * F.col("dot") * F.col("dot")
            >= F.lit(num * num) * F.col("n1") * F.col("n2")
        )
    )
    score = F.round(
        F.col("dot").cast("double")
        / (F.sqrt(F.col("n1").cast("double")) * F.sqrt(F.col("n2").cast("double"))),
        6,
    )
    out = verified.select("id1", "id2", score.alias("score")).localCheckpoint(eager=True)
    banded.unpersist()
    return out


def srp_multiprobe_pairs(
    emb: DataFrame,
    threshold_num: int = 9,
    threshold_den: int = 10,
    n_bits: int = N_BITS,
    n_bands: int = N_BANDS,
    seed: int = 7,
    max_bucket: int = 200,
    dim: int = 64,
    embedding_col: str = "embedding",
    id_col: str = "vec_id",
    sigs: DataFrame | None = None,
) -> DataFrame:
    """Multi-probe SRP (Lv et al., VLDB 2007 applied to sign codes):
    candidates additionally include pairs whose band values differ in
    ONE bit — caught by joining a probe side that carries, per band,
    the original key plus each single-bit flip, against an unmodified
    build side.  A pair differing by ≤1 bit in ANY band collides.

    Why this beats adding bands: at per-bit agreement p, a band hits
    exactly at p^b but hits within-1-bit at p^b + b·p^(b−1)(1−p) — at
    the cosine-0.45 borderline with 4-bit bands that is 0.177 → 0.56
    per band, i.e. ~99.9% pair recall over 8 bands where exact-match
    banding gives ~81%.  The price is linear, not quadratic: the probe
    side grows ×(1+bits_per_band) banded rows and candidate volume
    grows by the extra collisions, all of which still pass through the
    exact integer verify.  Same hot-bucket guard, computed on the
    UNFLIPPED census (a hot bucket is hot regardless of which side
    probes it).
    """
    if n_bits % n_bands:
        raise ValueError("n_bands must divide n_bits")
    bpb = n_bits // n_bands
    mask = (1 << bpb) - 1
    if sigs is None:
        planes = srp_planes(dim, n_bits, seed)
        sigs = srp_signatures(emb, planes, embedding_col, id_col)

    base_bands = F.array(
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
    banded = sigs.select(
        id_col, "qvec", "norm2", F.explode(base_bands).alias("bv")
    ).select(
        id_col,
        "qvec",
        "norm2",
        F.col("bv.band_idx").alias("band_idx"),
        F.col("bv.band_val").alias("band_val"),
    )
    banded = banded.cache()

    census = (
        banded.groupBy("band_idx", "band_val")
        .agg(F.count("*").alias("bucket_n"))
        .filter(F.col("bucket_n") <= int(max_bucket))
        .select("band_idx", "band_val")
    )
    build = banded.join(census, ["band_idx", "band_val"])

    # Probe side: original key + every single-bit flip of it (native
    # bitwise XOR — no Python).  Keys are per (row, band): 1 + bpb rows.
    flip_keys = F.array(
        F.col("band_val"),
        *[F.col("band_val").bitwiseXOR(F.lit(1 << f)) for f in range(bpb)],
    )
    probe = banded.select(
        id_col,
        "qvec",
        "norm2",
        "band_idx",
        F.explode(flip_keys).alias("band_val"),
    ).join(census, ["band_idx", "band_val"])

    # The pair join deliberately carries IDS ONLY: multi-probe inflates
    # collision volume ×(1+bpb), and at 4-bit bands the collision set
    # is orders of magnitude larger than the unique-pair set — shipping
    # two 64-int vectors per collision through the dedup exchange was
    # the measured bench outlier (23 s on an idle box at sf0.1).  Dedup
    # 16-byte rows instead (partial-aggregate shrinks them map-side),
    # then re-attach vectors by joining the signature relation and
    # verify each unique pair exactly once.  The re-attach join is NOT
    # force-broadcast: at fixture scale AQE turns it into a broadcast
    # at runtime, while at 100 TB (corpus-sized build side) it stays a
    # shuffle join keyed on the id — both correct, chosen by stats.
    a = probe.select("band_idx", "band_val", F.col(id_col).alias("id1"))
    b = build.select("band_idx", "band_val", F.col(id_col).alias("id2"))
    pair_ids = (
        a.join(b, ["band_idx", "band_val"])
        .filter(F.col("id1") < F.col("id2"))
        .select("id1", "id2")
        .dropDuplicates(["id1", "id2"])
    )
    vecs = banded.select(
        F.col(id_col), F.col("qvec"), F.col("norm2")
    ).dropDuplicates([id_col])
    cands = (
        pair_ids.join(
            vecs.select(F.col(id_col).alias("id1"), F.col("qvec").alias("q1"), F.col("norm2").alias("n1")),
            "id1",
        )
        .join(
            vecs.select(F.col(id_col).alias("id2"), F.col("qvec").alias("q2"), F.col("norm2").alias("n2")),
            "id2",
        )
    )
    dot = F.aggregate(
        F.zip_with(F.col("q1"), F.col("q2"), lambda x, y: x * y),
        F.lit(0).cast("long"),
        lambda acc, v: acc + v,
    )
    num, den = int(threshold_num), int(threshold_den)
    verified = cands.withColumn("dot", dot).filter(
        (F.col("dot") > 0)
        & (
            F.lit(den * den) * F.col("dot") * F.col("dot")
            >= F.lit(num * num) * F.col("n1") * F.col("n2")
        )
    )
    score = F.round(
        F.col("dot").cast("double")
        / (F.sqrt(F.col("n1").cast("double")) * F.sqrt(F.col("n2").cast("double"))),
        6,
    )
    out = verified.select("id1", "id2", score.alias("score")).localCheckpoint(eager=True)
    banded.unpersist()
    return out

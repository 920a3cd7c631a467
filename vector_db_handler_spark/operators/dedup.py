"""Deduplication operators for large-scale training-data pipelines.

Not present in the reference (its ingest happily duplicates — fresh
uuid4 per upsert, ``document_ingestor.py:105``); mandated as extension
surface by BASELINE.json.  Five strategies, cheapest to richest:

* exact          — hash-groupBy on the full text (one shuffle on a
                   64-bit key; at 100 TB this is the map-side-combined
                   baseline every pipeline runs first);
* ngram Jaccard  — k-word shingles, shingle-inverted-index self-join,
                   exact Jaccard ≥ t (quadratic only within shingle
                   buckets, not across the corpus);
* MinHash + LSH  — 8-permutation signatures, banded bucketing, then
                   exact-Jaccard verification of candidates only: the
                   scale path — candidate generation is linear in docs
                   × bands, and only near-misses are verified;
* SimHash        — 64-bit weighted token fingerprint per doc (two
                   32-bit halves); Hamming buckets find near-dups in
                   one equi-join;
* embedding cosine — semantic near-dup via the vector column (see
                   ``operators/similarity.py`` for the join itself).

Every operator is pure DataFrame-in/DataFrame-out, built from native
expressions (portable md5-derived hashing — see ``functions/text.py``)
so the DuckDB oracles replay them exactly.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from vector_db_handler_spark.functions.text import portable_hash28, portable_hash60

# MinHash permutation parameters: h_i(s) = (A[i]*h28(s) + B[i]) mod P.
# P = 2^31 - 1 (Mersenne prime); A/B fixed odd constants < P so the
# same integers come out of any engine with 64-bit arithmetic
# (28-bit hash × 31-bit A stays < 2^59 — no overflow).
MINHASH_P = 2_147_483_647
MINHASH_A = [1_000_003, 19_349_663, 83_492_791, 1_299_709, 2_750_161, 4_256_233, 7_368_787, 9_576_881]
MINHASH_B = [12_345, 67_891, 24_681, 13_579, 86_420, 97_531, 11_111, 55_555]
N_PERM = 8
N_BANDS = 4  # 4 bands × 2 rows


def exact_dedup(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Exact dedup groups: one row per distinct text, with the kept
    (minimum) id and the duplicate count.  ``n_copies > 1`` rows are the
    redundant sets."""
    return (
        docs.groupBy(portable_hash60(F.col(text_col)).alias("text_hash"))
        .agg(F.min(id_col).alias("keep_id"), F.count("*").alias("n_copies"))
    )


def shingle_index(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id", k: int = 3) -> DataFrame:
    """Inverted index: (id, shingle) with distinct k-word shingles.

    Generated in a self-contained ``mapInPandas`` pass: Spark's
    higher-order ``transform``+``slice``+``array_join`` form evaluates
    interpreted per element and was the floor cost of every
    shingle-based operator (~1.6s for 460k shingles at sf0.1; this
    path is ~4×).  Tokenization matches ``split(text, ' ')`` exactly
    (single-space split, empty tokens preserved).
    """
    id_type = docs.schema[id_col].dataType.simpleString()
    kk = int(k)

    def gen(batches):
        import pandas as _pd

        for pdf in batches:
            ids, outs = [], []
            for did, txt in zip(pdf[id_col], pdf[text_col]):
                toks = str(txt).split(" ")
                if len(toks) < kk:
                    continue
                seen = set()
                for i in range(len(toks) - kk + 1):
                    s = " ".join(toks[i : i + kk])
                    if s not in seen:
                        seen.add(s)
                        ids.append(did)
                        outs.append(s)
            yield _pd.DataFrame({"doc_id": ids, "shingle": outs})

    return docs.select(F.col(id_col).alias(id_col), F.col(text_col)).mapInPandas(
        gen, schema=f"doc_id {id_type}, shingle string"
    )


def hashed_shingle_index(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id", k: int = 3
) -> DataFrame:
    """(id, h) inverted index keyed by the 60-bit shingle hash: join
    exchanges carry int64 keys instead of multi-word strings.  Both
    engines hash with the same portable md5 rule, so even a hash
    collision (≈ n²/2⁶¹) merges identically on both sides."""
    sh = shingle_index(docs, text_col, id_col, k)
    return sh.select("doc_id", portable_hash60(F.col("shingle")).alias("h"))


def ngram_jaccard_pairs(
    docs: DataFrame,
    threshold: float,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
    max_doc_frac: float | None = None,
    sh: DataFrame | None = None,
) -> DataFrame:
    """Near-dup pairs by exact k-word-shingle Jaccard ≥ threshold.

    ``sh``: optionally a PRECOMPUTED raw shingle index ``(doc_id,
    shingle)`` at the same ``k`` (the driver's shared per-fixture
    build) — the mapInPandas shingling pass is every shingle
    operator's floor cost, and injecting it here skips the re-pay;
    the hashed keys are derived from it by cheap codegen md5.

    Shuffle profile: one explode + self-equi-join on the 60-bit
    shingle HASH (the inverted index prunes the O(n²) pair space to
    co-shingled pairs; int keys keep the exchange narrow), one groupBy
    on the pair key.  Rare ultra-frequent shingles are the skew risk
    at scale — AQE skew-join splitting handles moderate skew;
    ``max_doc_frac`` is the structural guard: shingles present in more
    than that fraction of docs are dropped from the index BEFORE the
    join (a shingle in f·N docs alone contributes (f·N)² pairs), and
    Jaccard is then computed consistently over the filtered shingle
    space (sizes and intersections both exclude stop-shingles).
    """
    # Materialize the index once: it feeds FOUR consumers (stop-shingle
    # scan, per-doc sizes, both join sides) and regenerating the
    # shingle explode per consumer dominates the query.  At 100 TB the
    # equivalent is writing the inverted index as a table (the same
    # build-once/probe-many split as build_ivf_index); in-memory cache
    # is the fixture-scale stand-in.
    if sh is not None:
        sh_cached = sh.select(
            "doc_id", portable_hash60(F.col("shingle")).alias("h")
        ).cache()
    else:
        sh_cached = hashed_shingle_index(docs, text_col, id_col, k).cache()
    sh = sh_cached
    if max_doc_frac is not None:
        n_docs = docs.select(id_col).distinct().count()
        cutoff = max_doc_frac * n_docs
        hot = (
            sh.groupBy("h")
            .agg(F.count("*").alias("df"))
            .filter(F.col("df") > cutoff)
            .select("h")
        )
        sh = sh.join(F.broadcast(hot), "h", "left_anti")
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("n_shingles"))
    a, b = sh.alias("a"), sh.alias("b")
    common = (
        a.join(b, (F.col("a.h") == F.col("b.h")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(F.col("a.doc_id").alias("d1"), F.col("b.doc_id").alias("d2"))
        .agg(F.count("*").alias("n_common"))
    )
    s1 = sizes.select(F.col("doc_id").alias("d1"), F.col("n_shingles").alias("n1"))
    s2 = sizes.select(F.col("doc_id").alias("d2"), F.col("n_shingles").alias("n2"))
    jac = F.col("n_common") / (F.col("n1") + F.col("n2") - F.col("n_common"))
    pairs = (
        common.join(s1, "d1")
        .join(s2, "d2")
        .withColumn("jaccard", jac)
        .filter(F.col("jaccard") >= threshold)
        .select("d1", "d2", F.round("jaccard", 6).alias("jaccard"))
    )
    # Eager pairs + release the cached index: see simhash_neardup_pairs.
    pairs = pairs.localCheckpoint(eager=True)
    sh_cached.unpersist()
    return pairs


def ppjoin_prefix_index(
    sh: DataFrame, threshold: float, id_col: str = "doc_id"
) -> DataFrame:
    """Prefix rows ``(doc_id, h, n)`` for the prefix-filter candidate
    join (PPJoin, Xiao et al., WWW'08 §3.1).

    Order every document's shingles by GLOBAL rarity (ascending
    document frequency, hash tie-break — a total order both engines
    share) and keep only the first ``n − ⌈t·n⌉ + 1``.  Two sets with
    Jaccard ≥ t MUST share a token inside these prefixes (pigeonhole:
    skipping a set's whole prefix leaves fewer than t·n shared
    tokens), so joining prefixes is a complete candidate generator.

    Why it beats the plain inverted index at scale: the full index
    pairs documents through their most COMMON shingles (a token in
    f·N docs contributes (f·N)² candidate pairs); the prefix keeps
    each document's RAREST tokens, so hot tokens are systematically
    excluded from the join key space — candidate volume drops with
    threshold ((1−t)·|X|+1 postings per doc) AND skew drops with it.
    A longer-than-minimal prefix only adds candidates, never drops
    one, so float ceil() slack is safe."""
    doc_freq = sh.groupBy("h").agg(F.count("*").alias("df"))
    sizes = sh.groupBy(id_col).agg(F.count("*").alias("n"))
    w = Window.partitionBy(id_col).orderBy(F.col("df").asc(), F.col("h").asc())
    ranked = (
        sh.join(doc_freq, "h")
        .withColumn("pos", F.row_number().over(w))
        .join(sizes, id_col)
    )
    plen = F.col("n") - F.ceil(F.lit(threshold) * F.col("n")) + 1
    return ranked.filter(F.col("pos") <= plen).select(id_col, "h", "n")


def ppjoin_candidates(prefix: DataFrame, threshold: float) -> DataFrame:
    """Distinct candidate pairs from the prefix index, with the length
    filter (|Y| ≥ ⌈t·|X|⌉ both ways — a pair failing it can't reach
    Jaccard t no matter the overlap) applied INSIDE the join."""
    a, b = prefix.alias("a"), prefix.alias("b")
    t = F.lit(threshold)
    return (
        a.join(
            b,
            (F.col("a.h") == F.col("b.h"))
            & (F.col("a.doc_id") < F.col("b.doc_id"))
            & (F.col("b.n") >= F.ceil(t * F.col("a.n")))
            & (F.col("a.n") >= F.ceil(t * F.col("b.n"))),
        )
        .select(F.col("a.doc_id").alias("d1"), F.col("b.doc_id").alias("d2"))
        .distinct()
    )


def prefix_filter_jaccard_pairs(
    docs: DataFrame,
    threshold: float,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
    sh: DataFrame | None = None,
) -> DataFrame:
    """Exact full-space Jaccard-≥-threshold pairs via PPJoin prefix
    filtering: candidates from ``ppjoin_candidates`` (complete by
    construction), then exact intersection counting over candidates
    only.

    Same OUTPUT as ``ngram_jaccard_pairs`` with no stop-shingle guard
    — but the self-join runs over per-doc prefixes ((1−t)·n + 1 rows
    per doc) instead of the whole inverted index, and the verify join
    touches only candidate pairs.  Where the stop-shingle guard
    REDEFINES Jaccard over a filtered token space, the prefix filter
    is a pure optimization of the exact semantics — the two are
    complementary (guard for adversarial hot keys, prefix for
    candidate volume).  Shuffle profile: doc-frequency agg, one
    window on doc_id, prefix self-join, two candidate-sided joins +
    pair agg — every exchange keyed on int64.

    ``sh``: optionally a PRECOMPUTED raw shingle index ``(doc_id,
    shingle)`` at the same ``k`` (the driver's shared per-fixture
    build — the ngram_jaccard_pairs convention): the mapInPandas
    shingling pass is every shingle operator's floor cost and
    injecting it skips the re-pay; hashed keys derive by codegen md5."""
    if sh is not None:
        sh_cached = sh.select(
            "doc_id", portable_hash60(F.col("shingle")).alias("h")
        ).cache()
    else:
        sh_cached = hashed_shingle_index(docs, text_col, id_col, k).cache()
    prefix = ppjoin_prefix_index(sh_cached, threshold, id_col)
    cand = ppjoin_candidates(prefix, threshold)
    sizes = sh_cached.groupBy(id_col).agg(F.count("*").alias("n"))
    common = (
        cand.join(sh_cached.alias("x"), F.col("d1") == F.col(f"x.{id_col}"))
        .join(
            sh_cached.alias("y"),
            (F.col("d2") == F.col(f"y.{id_col}")) & (F.col("x.h") == F.col("y.h")),
        )
        .groupBy("d1", "d2")
        .agg(F.count("*").alias("nc"))
    )
    s1 = sizes.select(F.col(id_col).alias("d1"), F.col("n").alias("n1"))
    s2 = sizes.select(F.col(id_col).alias("d2"), F.col("n").alias("n2"))
    jac = F.col("nc") / (F.col("n1") + F.col("n2") - F.col("nc"))
    pairs = (
        common.join(s1, "d1")
        .join(s2, "d2")
        .filter(jac >= threshold)
        .select("d1", "d2", F.round(jac, 6).alias("jaccard"))
    )
    pairs = pairs.localCheckpoint(eager=True)
    sh_cached.unpersist()
    return pairs


def _simhash_block_plan(max_hamming: int, n_blocks: int | None) -> tuple[list[int], list[int], list[tuple[int, ...]]]:
    """(widths, offsets, block-combinations) for complete Hamming-≤r
    banding over 64 bits (Manku/Jain/Das Sarma, WWW'07 §3): split the
    fingerprint into B blocks; a pair differing in ≤ r bits leaves at
    least B−r blocks untouched, so keying every combination of B−r
    blocks is COMPLETE — some combination matches exactly for every
    true near-dup pair."""
    from itertools import combinations

    r = int(max_hamming)
    b = int(n_blocks) if n_blocks is not None else r + 3
    if not (1 <= r < b <= 64):
        raise ValueError(f"need 1 <= max_hamming ({r}) < n_blocks ({b}) <= 64")
    widths = [64 // b + (1 if i < 64 % b else 0) for i in range(b)]
    offsets = [sum(widths[:i]) for i in range(b)]
    return widths, offsets, list(combinations(range(b), b - r))


def simhash_neardup_pairs(
    docs: DataFrame,
    max_hamming: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_blocks: int | None = None,
    sig: DataFrame | None = None,
) -> DataFrame:
    """Near-dup pairs by 64-bit SimHash Hamming distance ≤ r — COMPLETE
    candidate generation via block-combination banding.

    ``sig``: optionally a precomputed :func:`simhash64` relation (the
    driver's shared per-fixture build) — the token-hash fold is the
    dominant scan and only the banding differs between consumers.

    The 64 bits split into B blocks (default B = r+3); each doc emits
    one key per combination of B−r blocks (C(B, r) keys/doc), packed
    into a single long.  Pigeonhole: r differing bits touch ≤ r blocks,
    so every true pair shares at least one full combination — recall is
    exactly 1, which is what lets the driver oracle be EXACT all-pairs
    Hamming rather than a replica of the banding.

    Scale: key entropy is 64·(B−r)/B bits — 32 bits at the default
    r=3/B=6 (vs 16 bits for naive 4×16 banding, whose 65k-bucket space
    degenerates to ~10¹¹ candidate pairs at 10⁸ docs).  Random-collision
    candidates grow ~N²·C(B,r)/2^entropy: at 10⁸ docs and 32-bit keys
    that is ~2·10⁴ spurious candidates per combination — candidate
    volume stays ~linear in true near-dups (scale probe in PERF.md).
    Trade-off dial: larger B widens recall margin per combination count
    but narrows keys.
    """
    sig = (sig if sig is not None else simhash64(docs, text_col, id_col)).cache()
    cands = simhash_band_candidates(sig, max_hamming, n_blocks)
    s1 = sig.select(F.col("doc_id").alias("d1"), F.col("sim_hi").alias("hi1"), F.col("sim_lo").alias("lo1"))
    s2 = sig.select(F.col("doc_id").alias("d2"), F.col("sim_hi").alias("hi2"), F.col("sim_lo").alias("lo2"))
    hamming = F.bit_count(F.col("hi1").bitwiseXOR(F.col("hi2"))) + F.bit_count(
        F.col("lo1").bitwiseXOR(F.col("lo2"))
    )
    pairs = (
        cands.join(s1, "d1")
        .join(s2, "d2")
        .withColumn("hamming", hamming)
        .filter(F.col("hamming") <= max_hamming)
        .select("d1", "d2", "hamming")
    )
    # Materialize the (small) verified pairs eagerly, then release the
    # cached signature: a long-lived session running many queries must
    # not accumulate cached signature relations in executor memory.
    # localCheckpoint blocks are ContextCleaner-collected once the
    # returned relation is dropped, unlike CacheManager entries.
    pairs = pairs.localCheckpoint(eager=True)
    sig.unpersist()
    return pairs


def simhash_band_candidates(
    sig: DataFrame,
    max_hamming: int = 3,
    n_blocks: int | None = None,
    id_col: str = "doc_id",
) -> DataFrame:
    """DISTINCT candidate pairs (d1 < d2) from block-combination band
    keys over a (id, sim_hi, sim_lo) signature relation — the
    candidate-generation stage of :func:`simhash_neardup_pairs`,
    exposed separately so scale probes can measure candidate volume
    and so ``n_blocks=4, max_hamming=3`` reproduces the naive 4×16
    banding (one 16-bit block per key) for A/B comparison."""
    widths, offsets, combos = _simhash_block_plan(max_hamming, n_blocks)
    full = F.shiftleft(F.col("sim_hi"), 32).bitwiseOR(F.col("sim_lo"))
    block_vals = [
        F.shiftrightunsigned(full, offsets[i]).bitwiseAND(F.lit((1 << widths[i]) - 1))
        for i in range(len(widths))
    ]
    structs = []
    for ci, combo in enumerate(combos):
        key = block_vals[combo[0]]
        for blk in combo[1:]:
            key = F.shiftleft(key, widths[blk]).bitwiseOR(block_vals[blk])
        structs.append(F.struct(F.lit(ci).alias("band"), key.alias("key")))
    bands = sig.select(
        F.col(id_col).alias("doc_id"), F.explode(F.array(*structs)).alias("bk")
    ).select("doc_id", "bk.band", "bk.key")
    b1, b2 = bands.alias("x"), bands.alias("y")
    return (
        b1.join(
            b2,
            (F.col("x.band") == F.col("y.band"))
            & (F.col("x.key") == F.col("y.key"))
            & (F.col("x.doc_id") < F.col("y.doc_id")),
        )
        .select(F.col("x.doc_id").alias("d1"), F.col("y.doc_id").alias("d2"))
        .distinct()
    )


def doc_fingerprints(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id", k: int = 3) -> DataFrame:
    """Rolling-hash fingerprint per doc: min 60-bit hash over k-word
    shingles (1-permutation MinHash — robust to local edits).

    Explode + native md5 + groupBy-MIN: the hash runs inside whole-stage
    codegen over exploded rows and the MIN is map-side combined, so the
    shuffle carries one row per doc.  (The scalar Column form —
    ``functions.text.doc_fingerprint`` — hashes inside a nested
    higher-order ``transform``, which Spark evaluates interpreted:
    measured ~10× slower on the fixture; use it only for ad-hoc per-row
    expressions.)  Docs shorter than k tokens have no shingles and drop
    out, matching the SQL twin's inner-unnest semantics.
    """
    sh = shingle_index(docs, text_col, id_col, k)
    return sh.groupBy("doc_id").agg(
        F.min(portable_hash60(F.col("shingle"))).alias("fingerprint")
    )


def minhash_signatures_from_index(sh: DataFrame) -> DataFrame:
    """8-permutation MinHash signatures from a (doc_id, shingle) index:
    one groupBy(doc) with 8 MIN aggregates — map-side combined, so the
    shuffle carries one row per doc, not per shingle."""
    h = portable_hash28(F.col("shingle"))
    aggs = [
        F.min((F.lit(MINHASH_A[i]) * h + F.lit(MINHASH_B[i])) % F.lit(MINHASH_P)).alias(f"mh{i}")
        for i in range(N_PERM)
    ]
    return sh.groupBy("doc_id").agg(*aggs)


def minhash_signatures(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id", k: int = 3
) -> DataFrame:
    """8-permutation MinHash signature per doc: columns mh0..mh7."""
    return minhash_signatures_from_index(shingle_index(docs, text_col, id_col, k))


def band_keys(sig: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """LSH band keys from MinHash signatures: 4 bands × 2 rows each,
    band key = pair-hash of the two member permutations.  One exploded
    row per (doc, band)."""
    return sig.select(
        id_col,
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("band"),
                        (F.col(f"mh{2 * i}") * F.lit(1_000_003) + F.col(f"mh{2 * i + 1}")).alias("key"),
                    )
                    for i in range(N_BANDS)
                ]
            )
        ).alias("bk"),
    ).select(id_col, "bk.band", "bk.key")


def minhash_lsh_pairs(
    docs: DataFrame,
    threshold: float,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
    sh: DataFrame | None = None,
) -> DataFrame:
    """MinHash-LSH near-dup pairs, verified with exact Jaccard.

    ``sh``: optionally a precomputed raw shingle index (see
    :func:`ngram_jaccard_pairs`).

    Pipeline: signatures → band keys (2 rows/band, 4 bands) → equi-join
    on (band, key) → DISTINCT candidate pairs → exact-Jaccard
    verification of candidates only.  At 100 TB the verification join
    touches only the candidate set — the banded equi-join replaces the
    all-pairs comparison entirely; band width trades recall for
    candidate volume.

    The shingle index is generated ONCE and cached: the signature
    aggregate and the verification joins all read it (at scale: a
    materialized index table, as in ngram_jaccard_pairs).
    """
    sh_str = (sh if sh is not None else shingle_index(docs, text_col, id_col, k)).cache()
    sig = minhash_signatures_from_index(sh_str)
    bands = band_keys(sig)
    b1, b2 = bands.alias("x"), bands.alias("y")
    cands = (
        b1.join(
            b2,
            (F.col("x.band") == F.col("y.band"))
            & (F.col("x.key") == F.col("y.key"))
            & (F.col("x.doc_id") < F.col("y.doc_id")),
        )
        .select(F.col("x.doc_id").alias("d1"), F.col("y.doc_id").alias("d2"))
        .distinct()
    )
    # Exact verification restricted to candidates (hash-keyed index:
    # int joins, identical merging in the SQL twin) — derived from the
    # SAME cached index as the signatures.
    sh = sh_str.select("doc_id", portable_hash60(F.col("shingle")).alias("h"))
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("n_shingles"))
    a, b = sh.alias("a"), sh.alias("b")
    common = (
        cands.join(a, cands.d1 == F.col("a.doc_id"))
        .join(b, (cands.d2 == F.col("b.doc_id")) & (F.col("a.h") == F.col("b.h")))
        .groupBy("d1", "d2")
        .agg(F.count("*").alias("n_common"))
    )
    s1 = sizes.select(F.col("doc_id").alias("d1"), F.col("n_shingles").alias("n1"))
    s2 = sizes.select(F.col("doc_id").alias("d2"), F.col("n_shingles").alias("n2"))
    jac = F.col("n_common") / (F.col("n1") + F.col("n2") - F.col("n_common"))
    pairs = (
        common.join(s1, "d1")
        .join(s2, "d2")
        .withColumn("jaccard", jac)
        .filter(F.col("jaccard") >= threshold)
        .select("d1", "d2", F.round("jaccard", 6).alias("jaccard"))
    )
    # Eager pairs + release the cached index: see simhash_neardup_pairs.
    pairs = pairs.localCheckpoint(eager=True)
    sh_str.unpersist()
    return pairs


def write_lsh_index(
    docs: DataFrame,
    path: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
) -> None:
    """Materialize the MinHash-LSH index ON DISK — the 100 TB build
    artifact the in-memory ``.cache()`` in :func:`minhash_lsh_pairs`
    stands in for.  Two tables under ``path``:

    * ``bands/``  — (doc_id, key) partitioned by ``band`` and SORTED by
      ``key`` within each file, so a probe's ``key IN (…)`` predicate
      prunes row groups via parquet min/max stats.
    * ``shingles/`` — (doc_id, h) hashed shingle index for exact-
      Jaccard verification of candidates.

    Build once per corpus snapshot; every incoming batch probes it
    (:func:`lsh_probe_table`) instead of re-shingling the corpus.
    """
    sh = shingle_index(docs, text_col, id_col, k).cache()
    bands = band_keys(minhash_signatures_from_index(sh), "doc_id")
    if bands.isEmpty():
        # An empty corpus writes an UNPARTITIONED empty table: a
        # partitioned write of zero rows produces no part files and
        # the directory becomes unreadable (no schema to infer).
        bands.write.mode("overwrite").parquet(f"{path}/bands")
    else:
        (
            bands.repartition("band")
            .sortWithinPartitions("key")
            .write.mode("overwrite")
            .partitionBy("band")
            .parquet(f"{path}/bands")
        )
    sh.select("doc_id", portable_hash60(F.col("shingle")).alias("h")).write.mode(
        "overwrite"
    ).parquet(f"{path}/shingles")
    sh.unpersist()


def append_lsh_index(
    new_docs: DataFrame,
    path: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
) -> None:
    """Ingest-time index maintenance: fold a batch of NEW docs into a
    written LSH index (:func:`write_lsh_index`) without rebuilding —
    the write-side twin of :func:`lsh_probe_table`.

    Appends the batch's band keys (into the same ``band=`` partitions)
    and hashed shingles.  Cost is one shingling pass over the BATCH
    only; the corpus is never re-read.  Appended band files are sorted
    by ``key`` within themselves, so parquet min/max row-group pruning
    keeps working per file; periodic compaction (rewrite one ``band=``
    partition sorted) restores the fully-clustered layout without
    touching the rest of the index.  MinHash parameters are module
    constants, so batch signatures merge with the corpus index
    bit-identically.
    """
    sh = shingle_index(new_docs, text_col, id_col, k).cache()
    bands = band_keys(minhash_signatures_from_index(sh), "doc_id")
    # An empty-corpus build wrote an UNPARTITIONED zero-row marker
    # (see write_lsh_index); appending band= directories next to its
    # root-level part file would give Spark's partition discovery
    # conflicting directory structures.  Detect that layout (no 'band'
    # column in the written schema) and rewrite instead of append.
    spark = new_docs.sparkSession
    mode = "append"
    try:
        if "band" not in spark.read.parquet(f"{path}/bands").columns:
            mode = "overwrite"
    except Exception:
        pass  # no prior index at path: plain append creates it
    (
        bands.repartition("band")
        .sortWithinPartitions("key")
        .write.mode(mode)
        .partitionBy("band")
        .parquet(f"{path}/bands")
    )
    sh.select("doc_id", portable_hash60(F.col("shingle")).alias("h")).write.mode(
        "overwrite" if mode == "overwrite" else "append"
    ).parquet(f"{path}/shingles")
    sh.unpersist()


def lsh_probe_table(
    spark,
    path: str,
    query_docs: DataFrame,
    threshold: float,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
    max_inline_keys: int = 10_000,
) -> DataFrame:
    """Probe a written LSH index with a (small) batch of new docs:
    returns (query_id, corpus_id, jaccard) for every indexed doc whose
    exact Jaccard with a query doc is ≥ ``threshold``, using the banded
    candidates exactly as :func:`minhash_lsh_pairs` does — a probe
    against an index built from the same corpus finds the same pairs.

    The query side is one ingest micro-batch, so its distinct band
    keys are collected and inlined as a ``key IN (…)`` predicate —
    pushed to the parquet scan (row-group pruning against the sorted
    ``key`` column); the precise (band, key) equi-join then runs
    against only the surviving rows with the query side broadcast.
    The verification join reads only candidate docs' shingle rows.

    Guard: past ``max_inline_keys`` distinct band keys (a fat probe
    batch) the inlined ``IN`` literal stops paying for itself and the
    probe falls back to a broadcast left-semi join on ``key`` — same
    rows, no driver-sized predicate string.  The two paths are
    pytest-pinned equal.
    """
    qsh = shingle_index(query_docs, text_col, id_col, k).cache()
    qbands = band_keys(minhash_signatures_from_index(qsh), "doc_id").cache()
    key_rows = qbands.select("key").distinct().limit(max_inline_keys + 1).collect()
    bands_all = spark.read.parquet(f"{path}/bands")
    if len(key_rows) > max_inline_keys:
        bands = bands_all.join(
            F.broadcast(qbands.select("key").distinct()), "key", "leftsemi"
        )
    else:
        keys = [r["key"] for r in key_rows]
        bands = bands_all.filter(F.col("key").isin(keys or [-1]))
    cands = (
        bands.join(
            F.broadcast(qbands.select(F.col("doc_id").alias("q_id"), "band", "key")),
            ["band", "key"],
        )
        .select("q_id", F.col("doc_id").alias("c_id"))
        .distinct()
    )
    corpus_sh = spark.read.parquet(f"{path}/shingles").join(
        F.broadcast(cands.select("c_id").distinct()),
        F.col("doc_id") == F.col("c_id"),
        "leftsemi",
    )
    q_hashes = qsh.select(
        F.col("doc_id").alias("q_id"), portable_hash60(F.col("shingle")).alias("h")
    )
    q_sizes = q_hashes.groupBy("q_id").agg(F.count("*").alias("nq"))
    c_sizes = corpus_sh.groupBy("doc_id").agg(F.count("*").alias("nc"))
    c_hashes = corpus_sh.select(F.col("doc_id").alias("c_id2"), F.col("h").alias("ch"))
    common = (
        cands.join(F.broadcast(q_hashes), "q_id")
        .join(c_hashes, (F.col("c_id") == F.col("c_id2")) & (F.col("h") == F.col("ch")))
        .groupBy("q_id", "c_id")
        .agg(F.count("*").alias("n_common"))
    )
    jac = F.col("n_common") / (F.col("nq") + F.col("nc") - F.col("n_common"))
    # Stays LAZY (no checkpoint): the probe plan must keep the pushed
    # key IN (...) scan filter visible to callers/tests, and the two
    # cached relations here are micro-batch-sized (the query side), not
    # corpus signatures.
    return (
        common.join(F.broadcast(q_sizes), "q_id")
        .join(c_sizes.select(F.col("doc_id").alias("c_id"), "nc"), "c_id")
        .withColumn("jaccard", jac)
        .filter(F.col("jaccard") >= threshold)
        .select(
            F.col("q_id").alias("query_id"),
            F.col("c_id").alias("corpus_id"),
            F.round("jaccard", 6).alias("jaccard"),
        )
    )


def simhash64(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """64-bit SimHash per doc from token-frequency-weighted bit votes,
    emitted as two 32-bit halves (``sim_hi``, ``sim_lo``) so the value
    stays inside signed int64 in every engine.

    For bit b: vote = Σ_tokens cnt(token) · (+1 if bit b of hash(token)
    else −1); bit set iff vote > 0.  The token hash draws 64 bits from
    two md5-prefix words (portable across engines).  One explode +
    token groupBy + doc groupBy — all native integer expressions,
    map-side combined.

    16 bits (round 1) collide catastrophically beyond ~64k docs; 64
    bits is the standard fingerprint width (Charikar/Manku et al.) and
    keeps random-collision probability negligible at 100 TB corpus
    sizes.  Near-dup lookup: block-combination band keys
    (:func:`simhash_band_candidates`) + Hamming ≤ r verification.
    """
    tok = docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(F.split(F.col(text_col), " ")).alias("token"),
    )
    # Two independent 32-bit words from the md5 hex prefix (computed
    # JVM-side in codegen), then the 64 weighted bit-votes in ONE
    # vectorized numpy pass per group batch.  A 64-column SUM aggregate
    # exceeds Spark's codegen budget and falls back to interpreted
    # evaluation (~6 µs/row measured); the numpy bit-unpack is ~10×
    # faster and the shuffle is the same groupBy(doc) either way.
    counted = (
        tok.groupBy("doc_id", "token")
        .agg(F.count("*").alias("cnt"))
        .withColumn("h_hi", F.conv(F.substring(F.md5(F.col("token")), 1, 8), 16, 10).cast("long"))
        .withColumn("h_lo", F.conv(F.substring(F.md5(F.col("token")), 9, 8), 16, 10).cast("long"))
    )
    return simhash_from_hashed(counted, id_col="doc_id", out_cols=("sim_hi", "sim_lo"))


def simhash_from_hashed(
    counted: DataFrame,
    id_col: str,
    out_cols: tuple[str, str] = ("sim_hi", "sim_lo"),
) -> DataFrame:
    """Fold (id, cnt, h_hi, h_lo) rows into 64-bit SimHash halves.

    One shuffle (repartition by id co-locates each id's rows), then a
    single ``mapInPandas`` pass: per Arrow batch, a numpy bit-unpack
    produces the (n, 64) signed vote matrix and a pandas groupby sums
    it; partial sums accumulate across batches of the partition, and
    signatures are emitted once per partition.  (``applyInPandas``
    would invoke Python once per GROUP — thousands of tiny calls;
    a 64-column native SUM aggregate exceeds the codegen budget and
    runs interpreted.  Both measured slower than this shape.)
    """
    out_hi, out_lo = out_cols
    id_type = counted.schema[id_col].dataType.simpleString()
    schema = f"{id_col} {id_type}, {out_hi} long, {out_lo} long"

    def fold(batches) -> "pd.DataFrame":
        import numpy as _np
        import pandas as _pd

        bits = _np.arange(32, dtype=_np.int64)
        acc = None
        for pdf in batches:
            if len(pdf) == 0:
                continue
            h = pdf[["h_hi", "h_lo"]].to_numpy(_np.int64)
            cnt = pdf["cnt"].to_numpy(_np.int64)[:, None]
            v_hi = (((h[:, 0:1] >> bits) & 1) * 2 - 1)
            v_lo = (((h[:, 1:2] >> bits) & 1) * 2 - 1)
            votes = _np.concatenate([v_hi, v_lo], axis=1) * cnt  # (n, 64)
            part = _pd.DataFrame(votes)
            part["_id"] = pdf[id_col].to_numpy()
            g = part.groupby("_id").sum()
            acc = g if acc is None else acc.add(g, fill_value=0)
        if acc is None:
            yield _pd.DataFrame({id_col: [], out_hi: [], out_lo: []})
            return
        votes = acc.to_numpy()
        pos = votes > 0
        weights = _np.int64(1) << bits
        yield _pd.DataFrame(
            {
                id_col: acc.index.to_numpy(),
                out_hi: (pos[:, :32] * weights).sum(axis=1),
                out_lo: (pos[:, 32:] * weights).sum(axis=1),
            }
        )

    return counted.repartition(F.col(id_col)).mapInPandas(fold, schema=schema)


def cross_jaccard_pairs(
    left_docs: DataFrame,
    right_docs: DataFrame,
    threshold: float,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
) -> DataFrame:
    """Cross-corpus shingle-Jaccard pairs — the DECONTAMINATION pass:
    which training docs (left) overlap an eval/benchmark set (right)
    above the threshold.

    Same inverted-index shape as :func:`ngram_jaccard_pairs` but the
    join is left-index × right-index, so cost scales with the (small)
    eval side's postings, not the training corpus squared.  Returns
    (left_id, right_id, jaccard).
    """
    lsh = hashed_shingle_index(left_docs, text_col, id_col, k).cache()
    rsh = hashed_shingle_index(right_docs, text_col, id_col, k).cache()
    lsizes = lsh.groupBy("doc_id").agg(F.count("*").alias("n1"))
    rsizes = rsh.groupBy("doc_id").agg(F.count("*").alias("n2"))
    common = (
        lsh.alias("a")
        .join(rsh.alias("b"), F.col("a.h") == F.col("b.h"))
        .groupBy(F.col("a.doc_id").alias("left_id"), F.col("b.doc_id").alias("right_id"))
        .agg(F.count("*").alias("n_common"))
    )
    jac = F.col("n_common") / (F.col("n1") + F.col("n2") - F.col("n_common"))
    pairs = (
        common.join(lsizes.withColumnRenamed("doc_id", "left_id"), "left_id")
        .join(rsizes.withColumnRenamed("doc_id", "right_id"), "right_id")
        .withColumn("jaccard", jac)
        .filter(F.col("jaccard") >= threshold)
        .select("left_id", "right_id", F.round("jaccard", 6).alias("jaccard"))
    )
    # Eager pairs + release both cached shingle indexes (the
    # ngram_jaccard_pairs pattern) so nothing stays pinned in the
    # CacheManager after the call returns.
    pairs = pairs.localCheckpoint(eager=True)
    lsh.unpersist()
    rsh.unpersist()
    return pairs


def connected_components(
    pairs: DataFrame,
    src: str = "d1",
    dst: str = "d2",
    nodes: DataFrame | None = None,
    node_col: str = "doc_id",
    max_iter: int = 50,
) -> DataFrame:
    """Connected components over a near-dup pair list → ``(node,
    component)`` with component = the minimum reachable node id.

    This is the cluster step of the dedup pipeline the pair operators
    feed: pairs only say "a ≈ b"; transitive closure decides which
    rows are ONE duplicate group (a≈b, b≈c ⇒ {a,b,c}), and the
    canonical-survivor choice (``canonical_docs``) needs the group.

    Hash-to-min label propagation: every node starts as its own
    label; each round every node takes the min of its own and its
    neighbors' labels; fixpoint when no label changes.  Rounds =
    graph diameter, and near-dup graphs are piles of tiny cliques
    (diameter ~2-3), so the loop runs 3-4 times in practice —
    ``max_iter`` only guards pathological chains.  Per round: one
    shuffle join (edges ⋈ labels on the destination) + one
    map-side-combined min-aggregate, both on the node key; labels are
    ``localCheckpoint``-ed so the plan does not grow with iterations.
    This is the simple member of the Kiveris et al. "Connected
    Components in MapReduce and Beyond" family; large-star/small-star
    halves round count on high-diameter graphs but near-dup graphs
    never are.

    ``nodes`` (optional) adds isolated nodes (docs with no near-dup)
    as singleton components, so the output covers the whole corpus.
    """
    edges = pairs.select(F.col(src).alias("a"), F.col(dst).alias("b"))
    edges = edges.union(
        edges.select(F.col("b").alias("a"), F.col("a").alias("b"))
    ).distinct()
    edges = edges.localCheckpoint(eager=False)

    labels = edges.select(F.col("a").alias("node")).distinct()
    if nodes is not None:
        labels = labels.union(
            nodes.select(F.col(node_col).alias("node"))
        ).distinct()
    labels = labels.withColumn("lbl", F.col("node")).localCheckpoint(eager=False)

    # Convergence via label-sum stability (r16, guide §7.3 — one
    # materializing job per round instead of a labels⨝labels join +
    # count): per-node labels are monotonically NON-INCREASING (each
    # round takes a min over a superset that includes the old label)
    # and the node set is fixed, so the label sum strictly decreases
    # until fixpoint — sum unchanged ⟺ no label changed.  Summed as
    # decimal(38,0) so the test is exact at any id magnitude.
    prev_sum = labels.agg(
        F.sum(F.col("lbl").cast("decimal(38,0)"))
    ).collect()[0][0]
    for _ in range(max_iter):
        nbr = (
            edges.join(labels, edges.b == labels.node)
            .select(F.col("a").alias("node"), "lbl")
        )
        new_labels = (
            labels.select("node", "lbl")
            .union(nbr)
            .groupBy("node")
            .agg(F.min("lbl").alias("lbl"))
            .localCheckpoint(eager=False)
        )
        # One job: materializes the round's checkpoint AND reads the
        # convergence signal off it.
        cur_sum = new_labels.agg(
            F.sum(F.col("lbl").cast("decimal(38,0)"))
        ).collect()[0][0]
        labels = new_labels
        if cur_sum == prev_sum:
            break
        prev_sum = cur_sum
    else:
        raise RuntimeError(
            f"connected_components did not converge in {max_iter} rounds "
            "(a component's diameter exceeds max_iter); raise max_iter or "
            "use large-star/small-star for high-diameter graphs — "
            "returning partial labels would silently mis-cluster."
        )

    return labels.select(F.col("node"), F.col("lbl").alias("component"))


def canonical_docs(
    docs: DataFrame,
    components: DataFrame,
    id_col: str = "doc_id",
    quality_col: str = "n_chars",
) -> DataFrame:
    """Pick ONE surviving document per duplicate cluster →
    ``(component, canonical_doc_id, cluster_size)``.

    The survivor is the highest-``quality_col`` member (longest doc by
    default — the usual keep-the-richest-copy policy), tie-broken on
    the smallest id so the choice is deterministic under any
    execution order.  One window over the component key: at scale
    this is a single shuffle on component id, and cluster sizes are
    tiny (near-dup groups), so no skew concern.
    """
    from pyspark.sql import Window

    j = components.join(
        docs, components.node == docs[id_col]
    ).select("component", id_col, quality_col)
    w = Window.partitionBy("component")
    ranked = j.select(
        "component",
        F.col(id_col),
        F.count("*").over(w).alias("cluster_size"),
        F.row_number()
        .over(w.orderBy(F.col(quality_col).desc(), F.col(id_col).asc()))
        .alias("_rn"),
    )
    return ranked.filter(F.col("_rn") == 1).select(
        "component",
        F.col(id_col).alias("canonical_doc_id"),
        "cluster_size",
    )


def repetition_stats(
    docs: DataFrame,
    text_col: str = "text",
    carry_cols: tuple[str, ...] = ("doc_id",),
    k: int = 3,
) -> DataFrame:
    """Per-doc token/shingle repetition stats in ONE Arrow-batched
    pass: ``carry_cols + (n_tokens, n_shingles, dup_frac)``.

    ``dup_frac`` = duplicate shingle occurrences / total shingle
    occurrences (Gopher-style boilerplate signal).  The same numbers
    are expressible as native ``transform``/``array_distinct``
    expressions, but Spark evaluates array lambdas INTERPRETED —
    measured 10× slower than this pass at sf0.1 (4.6s vs 0.46s);
    like the shingle index, the Python loop over Arrow batches is the
    fast path.  Zero shuffle either way: emits one row per input row
    from inside the scan stage.  Docs with fewer than ``k`` tokens
    are dropped (no shingles — matches the SQL twin's ``len(t) >= k``
    guard).  The division result is a raw double; callers ROUND it
    JVM-side so rounding semantics match the oracle exactly.
    """
    kk = int(k)
    carry = list(carry_cols)
    carry_schema = ", ".join(
        f"{c} {docs.schema[c].dataType.simpleString()}" for c in carry
    )

    def stats(batches):  # self-contained: cloudpickled to executors
        import pandas as _pd

        for pdf in batches:
            rows = []
            for tup in zip(*(pdf[c] for c in carry), pdf[text_col]):
                *vals, txt = tup
                toks = str(txt).split(" ")
                ns = len(toks) - kk + 1
                if ns < 1:
                    continue
                seen = set()
                for i in range(ns):
                    seen.add(" ".join(toks[i : i + kk]))
                rows.append((*vals, len(toks), ns, (ns - len(seen)) / ns))
            yield _pd.DataFrame(
                rows, columns=carry + ["n_tokens", "n_shingles", "dup_frac"]
            )

    return docs.select(*carry, text_col).mapInPandas(
        stats, schema=f"{carry_schema}, n_tokens long, n_shingles long, dup_frac double"
    )


def compact_lsh_index(spark, path: str, bands: list[int] | None = None) -> None:
    """Periodic maintenance for an appended LSH index: rewrite band
    partitions into one sorted file each, restoring the fully-
    clustered layout ``write_lsh_index`` produces.

    Appends (:func:`append_lsh_index`, streaming ingest) accumulate
    one file per batch per band; each file is internally sorted so
    min/max pruning still works, but probe open-file counts grow with
    batch count.  Compaction is per-PARTITION: only the named bands
    (default: all) are rewritten, the rest of the index is untouched,
    and the sidecar shingle table is coalesced the same way.  This is
    the parquet twin of an LSM minor compaction — run it on whatever
    cadence keeps files-per-band bounded.

    Uses dynamic partition overwrite so a compaction that dies mid-job
    leaves the old files in place (Spark commits per partition swap).
    Reading and overwriting the same path is safe here ONLY because
    ``repartition`` forces an exchange: the whole input is
    materialized into shuffle storage before the write stage swaps
    any partition — do not remove the repartition.
    """
    # Scope the dynamic-overwrite mode to this compaction: leaking it
    # session-wide would make every later whole-table overwrite in the
    # session silently keep stale partitions.
    try:
        prev_mode = spark.conf.get("spark.sql.sources.partitionOverwriteMode")
    except Exception:
        prev_mode = None
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        bands_df = spark.read.parquet(f"{path}/bands")
        if bands is not None:
            bands_df = bands_df.filter(F.col("band").isin([int(b) for b in bands]))
        (
            bands_df.repartition("band")
            .sortWithinPartitions("key")
            .write.mode("overwrite")
            .partitionBy("band")
            .parquet(f"{path}/bands")
        )
        if bands is None:
            sh = spark.read.parquet(f"{path}/shingles")
            sh.coalesce(max(1, sh.rdd.getNumPartitions() // 8)).write.mode(
                "overwrite"
            ).parquet(f"{path}/shingles_compact")
            # swap via overwrite-in-place is not atomic for unpartitioned
            # tables; keep it simple and correct: rewrite from the compact
            # copy, then drop it.
            spark.read.parquet(f"{path}/shingles_compact").write.mode(
                "overwrite"
            ).parquet(f"{path}/shingles")
            jvm = spark.sparkContext._jvm
            p = jvm.org.apache.hadoop.fs.Path(f"{path}/shingles_compact")
            p.getFileSystem(spark.sparkContext._jsc.hadoopConfiguration()).delete(
                p, True
            )
    finally:
        if prev_mode is None:
            spark.conf.unset("spark.sql.sources.partitionOverwriteMode")
        else:
            spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev_mode)


# -- winnowing (MOSS) fingerprints -------------------------------------------

#: Pack (hash40, pos20) into one BIGINT so the lexicographic
#: (hash, leftmost-pos) window minimum is a plain integer MIN that
#: Spark and DuckDB compute identically.  20 bits of position caps
#: fingerprinting at the first ~1M chars of a document — at corpus
#: scale longer docs are chunked upstream anyway, and the cap is a
#: filter, not an error.
WINNOW_POS_BITS = 1 << 20


def winnow_fingerprints(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 5,
    w: int = 8,
) -> DataFrame:
    """Winnowing (MOSS) fingerprints: for every window of ``w``
    consecutive character ``k``-gram hashes, keep the minimal
    (hash, position) pair — guaranteeing any shared substring of
    length >= ``w + k - 1`` between two documents shares at least one
    fingerprint (Schleimer/Wilkerson/Aiken, SIGMOD'03).

    Returns distinct ``(doc_id, fp_hash, fp_pos)`` rows.

    Scale shape: one explode (a row per character position — linear,
    the cost winnowing inherently pays), all-codegen hashing, and ONE
    shuffle partitioned by document for the window min; no per-doc
    Python, no driver loop.  Documents shorter than ``w + k - 1``
    chars have no complete window and drop out (same in the SQL twin).
    """
    from pyspark.sql import Window

    from vector_db_handler_spark.functions.text import portable_hash40

    n_grams = F.length(F.col(text_col)) - F.lit(k - 1)
    g = (
        docs.select(
            F.col(id_col).alias("doc_id"),
            F.col(text_col).alias("_t"),
            F.explode(F.sequence(F.lit(1), n_grams)).alias("pos"),
            n_grams.alias("n_grams"),
        )
        .filter(F.col("pos") < F.lit(WINNOW_POS_BITS))
        .select(
            "doc_id",
            "pos",
            "n_grams",
            (
                portable_hash40(F.expr(f"substring(_t, pos, {int(k)})"))
                * F.lit(WINNOW_POS_BITS)
                + F.col("pos")
            ).alias("packed"),
        )
    )
    win = (
        Window.partitionBy("doc_id")
        .orderBy("pos")
        .rowsBetween(Window.currentRow, w - 1)
    )
    return (
        g.withColumn("fp", F.min("packed").over(win))
        .filter(F.col("pos") <= F.col("n_grams") - F.lit(w - 1))
        .select(
            "doc_id",
            F.expr(f"fp div {WINNOW_POS_BITS}").alias("fp_hash"),
            (F.col("fp") % F.lit(WINNOW_POS_BITS)).alias("fp_pos"),
        )
        .distinct()
    )


def winnow_overlap_pairs(
    docs: DataFrame,
    min_shared: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 5,
    w: int = 8,
    max_postings: int = 50,
) -> DataFrame:
    """Document pairs sharing >= ``min_shared`` winnowed fingerprint
    hashes — the contamination/plagiarism detector built on
    :func:`winnow_fingerprints`.

    Scale shape: fingerprints are ~1/w of the gram stream, the
    inverted index joins on a BIGINT key, and hot fingerprints (hashes
    present in > ``max_postings`` docs — boilerplate) are dropped
    BEFORE the self-join, exactly like the stop-shingle guard in
    :func:`ngram_jaccard_pairs` — the pair blow-up is bounded by
    ``max_postings**2`` per bucket, never corpus-quadratic.
    """
    fps = (
        winnow_fingerprints(docs, text_col, id_col, k, w)
        .select("doc_id", "fp_hash")
        .distinct()
    )
    return winnow_overlap_pairs_from_index(fps, min_shared, max_postings)


def winnow_overlap_pairs_from_index(
    fps: DataFrame, min_shared: int = 3, max_postings: int = 50
) -> DataFrame:
    """:func:`winnow_overlap_pairs`' pair-mining half over a
    PRECOMPUTED distinct ``(doc_id, fp_hash)`` index — the winnowing
    scan is the expensive leg, so callers holding a materialized
    fingerprint relation (the driver's shared per-fixture build, or a
    future persisted winnow index) skip re-paying it.  Identical
    output by construction: the docs-taking wrapper delegates here."""
    rare = (
        fps.groupBy("fp_hash")
        .agg(F.count("*").alias("_n"))
        .filter(F.col("_n") <= max_postings)
        .select("fp_hash")
    )
    idx = fps.join(rare, "fp_hash")
    a = idx.select(F.col("fp_hash"), F.col("doc_id").alias("doc_a"))
    b = idx.select(F.col("fp_hash"), F.col("doc_id").alias("doc_b"))
    return (
        a.join(b, "fp_hash")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count("*").alias("n_shared"))
        .filter(F.col("n_shared") >= min_shared)
    )


def winnow_containment_pairs(
    docs: DataFrame,
    min_containment: float = 0.5,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 10,
    w: int = 10,
    max_postings: int = 20,
) -> DataFrame:
    """(Near-)containment detector: pairs where the shared winnowed
    fingerprints cover >= ``min_containment`` of the SMALLER doc's
    fingerprint set — catches quote-inclusion / excerpt duplication
    that symmetric Jaccard under-scores (a 100-char quote inside a
    10k-char doc is invisible to Jaccard but ~1.0 containment).

    Same inverted-index + stop-fingerprint shape as
    :func:`winnow_overlap_pairs`; the per-doc set sizes ride along as
    one extra map-side-combined aggregate and two broadcast-size joins.
    """
    fps = (
        winnow_fingerprints(docs, text_col, id_col, k, w)
        .select("doc_id", "fp_hash")
        .distinct()
    )
    return winnow_containment_pairs_from_index(
        fps, min_containment, max_postings
    )


def winnow_containment_pairs_from_index(
    fps: DataFrame, min_containment: float = 0.5, max_postings: int = 20
) -> DataFrame:
    """:func:`winnow_containment_pairs`' decision half over a
    PRECOMPUTED distinct ``(doc_id, fp_hash)`` index (see
    :func:`winnow_overlap_pairs_from_index`)."""
    fps.cache()  # feeds sizes, the postings guard, and the self-join
    sizes = fps.groupBy("doc_id").agg(F.count("*").alias("n_fp"))
    rare = (
        fps.groupBy("fp_hash")
        .agg(F.count("*").alias("_n"))
        .filter(F.col("_n") <= max_postings)
        .select("fp_hash")
    )
    idx = fps.join(rare, "fp_hash")
    a = idx.select(F.col("fp_hash"), F.col("doc_id").alias("doc_a"))
    b = idx.select(F.col("fp_hash"), F.col("doc_id").alias("doc_b"))
    shared = (
        a.join(b, "fp_hash")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count("*").alias("n_shared"))
    )
    sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n_fp").alias("n_a"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("n_fp").alias("n_b"))
    out = (
        shared.join(sa, "doc_a")
        .join(sb, "doc_b")
        .withColumn(
            "containment",
            F.round(
                F.col("n_shared").cast("double")
                / F.least("n_a", "n_b").cast("double"),
                6,
            ),
        )
        .filter(F.col("containment") >= min_containment)
        .select("doc_a", "doc_b", "n_shared", "n_a", "n_b", "containment")
    )
    # Eager pairs + release the cached fingerprint index (the
    # ngram_jaccard_pairs pattern): a lazy return would pin the cache
    # for the whole session, and CacheManager entries are not
    # ContextCleaner-collected — localCheckpoint blocks are.
    out = out.localCheckpoint(eager=True)
    fps.unpersist()
    return out


def bigram_novelty(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Cross-corpus novelty per document: the fraction of a doc's
    distinct word bigrams that occur in NO other document (corpus doc
    frequency 1).  High novelty flags garbled/unique text; ~0 flags
    boilerplate — the cross-corpus complement of the within-doc
    ``repetition_stats`` rule.

    All counts are integers and the single ROUND division is the only
    float, so the result hash-matches any engine exactly.  Scale: the
    bigram index exchanges 60-bit int keys, document frequency is one
    map-side-combined groupBy, and the join back is shingle-bucketed —
    two shuffles total, both on the bigram hash.
    """
    sh = hashed_shingle_index(docs, text_col, id_col, k=2)
    df_counts = sh.groupBy("h").agg(F.count("*").alias("df"))
    j = sh.join(df_counts, "h")
    return j.groupBy("doc_id").agg(
        F.count("*").alias("n_bigrams"),
        F.sum(F.when(F.col("df") == 1, 1).otherwise(0)).alias("n_unique"),
        F.round(
            F.sum(F.when(F.col("df") == 1, 1).otherwise(0)).cast("double")
            / F.count("*"),
            6,
        ).alias("novelty"),
    )


def span_dedup_corpus(
    docs: DataFrame,
    span_tokens: int = 10,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """C4-style SPAN-level dedup: split every doc into consecutive
    non-overlapping ``span_tokens``-token spans, and of all occurrences
    of an identical span across the corpus keep exactly ONE — the one
    at the lexicographically smallest (doc_id, span_idx) — dropping
    the rest from their documents (C4 §2.2 did this with 3-sentence
    spans to strip boilerplate that repeats INSIDE otherwise-unique
    pages, which doc-level dedup can never touch).  Returns one row
    per surviving doc: ``(doc_id, n_spans, n_kept, kept_text)`` with
    ``kept_text`` the doc's surviving spans rejoined in order.

    Scale shape: span extraction is IN-ROW array slicing (no
    per-token explode — tokens never leave their row until the span
    explode, which is ~n_tokens/span_tokens rows per doc); the
    occurrence census is one map-side-combined groupBy on the 60-bit
    span hash; the verdict joins back on the same hash — Catalyst
    REUSES the census exchange for the join (the observed plan
    carries two hash shuffles total: span-hash, then doc_id
    reassembly; the per-doc size join rides broadcasts).  All
    exchanges move skinny keyed rows with no skew hotspot — a span
    shared by millions of docs contributes ONE census row and its
    postings join back one row per occurrence, never pairs.
    """
    toks = F.split(F.col(text_col), " ", -1)
    n_spans = F.ceil(F.size(toks) / F.lit(span_tokens)).cast("int")
    spans = docs.select(
        F.col(id_col).alias("doc_id"),
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), n_spans - 1),
                lambda i: F.array_join(
                    F.slice(toks, i * span_tokens + 1, span_tokens), " "
                ),
            )
        ).alias("span_idx", "span_text"),
    )
    h = spans.withColumn("h", portable_hash60(F.col("span_text")))
    census = h.groupBy("h").agg(
        F.count("*").alias("occ"),
        F.min(F.struct("doc_id", "span_idx")).alias("keeper"),
    )
    kept = (
        h.join(census, "h")
        .filter(
            (F.col("occ") == 1)
            | (
                (F.col("doc_id") == F.col("keeper.doc_id"))
                & (F.col("span_idx") == F.col("keeper.span_idx"))
            )
        )
        .select("doc_id", "span_idx", "span_text")
    )
    return (
        kept.groupBy("doc_id")
        .agg(
            F.count("*").alias("n_kept"),
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("span_idx", "span_text"))),
                    lambda s: s["span_text"],
                ),
                " ",
            ).alias("kept_text"),
        )
        .join(
            docs.select(
                F.col(id_col).alias("doc_id"), n_spans.alias("n_spans")
            ),
            "doc_id",
        )
        .select("doc_id", "n_spans", "n_kept", "kept_text")
    )


def weighted_jaccard_verify(
    docs: DataFrame,
    pairs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
    src: str = "d1",
    dst: str = "d2",
) -> DataFrame:
    """IDF-weighted shingle Jaccard for a given candidate-pair
    relation: WJ(A,B) = Σ_{t∈A∩B} w(t) / Σ_{t∈A∪B} w(t) with
    w(t) = N div df(t) — boilerplate shared by everything weighs ~1,
    a rare shared shingle weighs ~N, so excerpt pairs glued together
    by template text stop scoring as near-dups (the failure mode of
    unweighted Jaccard on crawl corpora with common headers/footers).

    Everything is exact integers: weights are one non-negative
    integer division each, intersections/unions are BIGINT sums, and
    the final ratio divides once at emit.  Scale shape: the shingle
    index is built ONCE (the same (id, hash-60) relation every dedup
    operator here shares); per-doc total weights are one map-side-
    combined aggregate; the intersection join runs PAIR-side — cost
    ∝ candidate pairs × shared shingles, never corpus².  Output:
    ``(d1, d2, wj_num, wj_den, wjaccard)``."""
    sh = hashed_shingle_index(docs, text_col, id_col, k).localCheckpoint(eager=True)
    n_docs = docs.select(F.count(F.lit(1)).alias("_n"))
    dfc = (
        sh.groupBy("h")
        .agg(F.count(F.lit(1)).alias("_df"))
        .crossJoin(F.broadcast(n_docs))
        .select("h", F.expr("_n div _df").alias("w"))
    )
    shw = sh.join(dfc, "h").localCheckpoint(eager=True)

    totals = shw.groupBy("doc_id").agg(F.sum("w").alias("tw"))
    p = pairs.select(F.col(src).alias("d1"), F.col(dst).alias("d2"))
    inter = (
        p.join(shw.select(F.col("doc_id").alias("d1"), "h", "w"), "d1")
        .join(
            shw.select(F.col("doc_id").alias("d2"), F.col("h")),
            ["d2", "h"],
        )
        .groupBy("d1", "d2")
        .agg(F.sum("w").alias("iw"))
    )
    return (
        p.join(inter, ["d1", "d2"], "left")
        .join(totals.select(F.col("doc_id").alias("d1"), F.col("tw").alias("tw1")), "d1")
        .join(totals.select(F.col("doc_id").alias("d2"), F.col("tw").alias("tw2")), "d2")
        .select(
            "d1",
            "d2",
            F.coalesce(F.col("iw"), F.lit(0)).cast("long").alias("wj_num"),
            (F.col("tw1") + F.col("tw2") - F.coalesce(F.col("iw"), F.lit(0)))
            .cast("long")
            .alias("wj_den"),
        )
        .withColumn(
            "wjaccard",
            F.round(F.col("wj_num").cast("double") / F.col("wj_den"), 6),
        )
    )


def duplicated_substring_spans(
    docs: DataFrame,
    k: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Exact substring-duplication intervals, shingle-granular — the
    distributed shape of suffix-array dedup (Lee et al.,
    "Deduplicating Training Data Makes Language Models Better",
    ACL'22): for every document, every MAXIMAL token interval whose
    every ``k``-token sliding window also occurs somewhere else in the
    corpus (another document, or another position of the same one).
    Unlike ``span_dedup_corpus`` (fixed non-overlapping C4 spans) this
    finds duplication at ARBITRARY offsets: a 40-token boilerplate
    block pasted mid-sentence surfaces as one (start, end) interval
    regardless of alignment, which is exactly what the suffix-array
    pass in the paper extracts (any shared substring of >= k tokens is
    covered by construction; shorter ones are invisible — the paper's
    min-match-length dial).

    Returns ``(doc_id, span_start, span_end, n_tokens, n_dup_grams)``
    with 0-based inclusive token offsets.

    Scale shape (100 TB): gram extraction is IN-ROW (`transform` over a
    `sequence`, no per-token explode until the gram relation, which is
    ~n_tokens rows per doc — the same linear relation winnowing
    already pays); the duplication census is ONE map-side-combined
    groupBy on the 60-bit gram hash; marking is a semi-join back on
    that hash (Catalyst reuses the census exchange); run-merging is
    the gaps-and-islands window partitioned BY DOCUMENT — per-doc
    ordering only, no global sort, and a hub gram shared by millions
    of docs contributes one census row and one postings row per
    occurrence, never pairs.  No reference analog (the reference has
    no dedup at all — ``app/core/document_ingestor.py:105`` mints a
    fresh uuid per upsert)."""
    # Gram extraction runs as an Arrow-batched kernel, not the
    # higher-order transform+md5 form: Spark evaluates those
    # interpreted per element and it measured ~2.5x slower on this
    # operator (the same lesson shingle_index documents).  Hashes are
    # the portable md5-60 rule, so the SQL twin is unchanged.
    id_type = docs.schema[id_col].dataType.simpleString()
    kk = int(k)

    def gen(batches):
        import hashlib

        import numpy as _np
        import pandas as _pd

        for pdf in batches:
            ids, poss, hs = [], [], []
            for did, txt in zip(pdf[id_col], pdf[text_col]):
                toks = str(txt).split(" ")
                if len(toks) < kk:
                    continue
                for i in range(len(toks) - kk + 1):
                    g = " ".join(toks[i : i + kk])
                    h = int(hashlib.md5(g.encode("utf-8")).hexdigest()[:15], 16)
                    ids.append(did)
                    poss.append(i)
                    hs.append(h)
            yield _pd.DataFrame(
                {
                    "doc_id": ids,
                    "pos": _np.array(poss, dtype=_np.int32),
                    "h": _np.array(hs, dtype=_np.int64),
                }
            )

    grams = (
        docs.filter(F.col(text_col).isNotNull())
        .select(F.col(id_col).alias(id_col), F.col(text_col))
        .mapInPandas(gen, schema=f"doc_id {id_type}, pos int, h long")
    )
    dup_hashes = (
        grams.groupBy("h")
        .agg(F.count(F.lit(1)).alias("occ"))
        .filter(F.col("occ") >= 2)
        .select("h")
    )
    dup = grams.join(dup_hashes, "h", "left_semi")
    w = Window.partitionBy("doc_id").orderBy("pos")
    runs = dup.withColumn("run", F.col("pos") - F.row_number().over(w))
    return (
        runs.groupBy("doc_id", "run")
        .agg(
            F.min("pos").alias("span_start"),
            (F.max("pos") + F.lit(k - 1)).alias("span_end"),
            F.count(F.lit(1)).alias("n_dup_grams"),
        )
        .select(
            "doc_id",
            F.col("span_start").cast("long"),
            F.col("span_end").cast("long"),
            (F.col("span_end") - F.col("span_start") + 1)
            .cast("long")
            .alias("n_tokens"),
            F.col("n_dup_grams").cast("long"),
        )
    )


#: (bands, rows_per_band) ladder over the 8-permutation signature —
#: the S-curve family an LSH deployment chooses from: more bands =
#: higher recall and more candidates; band keys are folded
#: ``key = (key*131 + mh) % MINHASH_P`` so every intermediate stays
#: far inside int64 in BOTH engines (DuckDB raises on BIGINT overflow
#: where Spark wraps — a raw polynomial fold would diverge).
LSH_CONFIGS: tuple[tuple[int, int], ...] = ((1, 8), (2, 4), (4, 2), (8, 1))


def _band_keys_folded(sig: DataFrame, b: int, r: int) -> DataFrame:
    entries = []
    for i in range(b):
        key = F.lit(0).cast("long")
        for j in range(r):
            key = (key * F.lit(131) + F.col(f"mh{i * r + j}")) % F.lit(MINHASH_P)
        entries.append(F.struct(F.lit(i).alias("band"), key.alias("key")))
    return sig.select(
        "doc_id", F.explode(F.array(*entries)).alias("bk")
    ).select("doc_id", "bk.band", "bk.key")


def lsh_recall_report(
    docs: DataFrame,
    threshold: float = 0.5,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
    max_doc_frac: float = 0.01,
    sh: DataFrame | None = None,
) -> DataFrame:
    """LSH band-configuration evaluation — the dedup twin of
    ``similarity.ann_recall_report``: for every (bands, rows_per_band)
    split of the 8-permutation MinHash signature, measure how many of
    the TRUE near-dup pairs (exact shingle Jaccard ≥ ``threshold``,
    computed by the verified ``ngram_jaccard_pairs`` rail with its
    stop-shingle guard) the banded candidate join would surface, and
    at what candidate volume.  This is the measurement behind choosing
    a production band width: the S-curve says (4, 2) bands catch
    J ≥ 0.5 pairs with high probability while (1, 8) only fires on
    near-identical docs; this report replaces the formula with the
    corpus's actual numbers.

    Returns one row per config:
    ``(n_bands, rows_per_band, n_candidates, n_hits, n_true, recall)``
    with ``recall`` = hits/true rounded to 6 (NULL when no true
    pairs).

    Scale shape: signatures are one map-side-combined groupBy over the
    shared shingle index; each config's candidates come from a banded
    equi-join on (band, key) — candidate volume, not corpus size, is
    each config's cost, and the truth set is computed ONCE.  The four
    per-config aggregates are 1-row relations crossed onto the 1-row
    truth count (bounded broadcast, the repo's standard scalar
    pattern)."""
    # Both relations feed multiple downstream jobs (4 configs × joins)
    # and are materialized once WITHOUT an open-ended cache (the
    # cache-hygiene gate's contract): truth is pair-sized, sig one row
    # per doc.  r16 (§2.6 — overlap independent jobs): the two eager
    # builds are INDEPENDENT, so they are submitted from two driver
    # threads and the sig job back-fills executors left idle by the
    # truth job's tail instead of waiting for it.  truth rides the
    # eager checkpoint ngram_jaccard_pairs already returns — the
    # former second checkpoint of its (d1, d2) projection only paid an
    # extra materialization job for rows that were already pinned.
    from concurrent.futures import ThreadPoolExecutor

    def _build_truth() -> DataFrame:
        return ngram_jaccard_pairs(
            docs, threshold, text_col, id_col, k, max_doc_frac=max_doc_frac,
            sh=sh,
        ).select("d1", "d2")

    def _build_sig() -> DataFrame:
        return (
            minhash_signatures_from_index(sh)
            if sh is not None
            else minhash_signatures(docs, text_col, id_col, k)
        ).localCheckpoint(eager=True)

    with ThreadPoolExecutor(max_workers=2) as pool:
        truth_f = pool.submit(_build_truth)
        sig_f = pool.submit(_build_sig)
        truth = truth_f.result()
        sig = sig_f.result()
    n_true = truth.groupBy().agg(F.count(F.lit(1)).alias("n_true"))
    reports = []
    for b, r in LSH_CONFIGS:
        bands = _band_keys_folded(sig, b, r)
        x, y = bands.alias("x"), bands.alias("y")
        cands = (
            x.join(
                y,
                (F.col("x.band") == F.col("y.band"))
                & (F.col("x.key") == F.col("y.key"))
                & (F.col("x.doc_id") < F.col("y.doc_id")),
            )
            .select(
                F.col("x.doc_id").alias("d1"), F.col("y.doc_id").alias("d2")
            )
            .distinct()
        )
        stats = (
            cands.join(
                truth.withColumn("is_true", F.lit(1)), ["d1", "d2"], "left"
            )
            .groupBy()
            .agg(
                F.count(F.lit(1)).alias("n_candidates"),
                F.coalesce(F.sum("is_true"), F.lit(0)).alias("n_hits"),
            )
            .crossJoin(n_true)
            .select(
                F.lit(b).cast("long").alias("n_bands"),
                F.lit(r).cast("long").alias("rows_per_band"),
                F.col("n_candidates").cast("long"),
                F.col("n_hits").cast("long"),
                F.col("n_true").cast("long"),
                F.when(
                    F.col("n_true") > 0,
                    F.round(
                        F.col("n_hits").cast("double") / F.col("n_true"), 6
                    ),
                ).alias("recall"),
            )
        )
        reports.append(stats)
    out = reports[0]
    for rep in reports[1:]:
        out = out.unionByName(rep)
    return out


def remove_duplicate_spans(
    docs: DataFrame,
    k: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """CUT the duplicated intervals out of the corpus — the action
    step of suffix-array dedup (Lee et al. ACL'22 drop the duplicated
    substring and keep the remainder, preserving the surrounding
    text): every token covered by a :func:`duplicated_substring_spans`
    interval is removed; the survivors re-join in order.

    Returns ``(doc_id, clean_text, n_tokens, n_removed)`` for every
    non-null-text document — docs without spans (including sub-``k``
    docs) pass through verbatim with ``n_removed = 0``; a fully
    duplicated doc survives as the empty string (the paper keeps the
    document, void of the duplicated mass — whole-doc dropping is
    `deduped_corpus`'s job).

    Scale shape: spans per doc ride ONE aggregation into an interval
    array (already merged maximal by construction, so the array is
    small); the cut itself is IN-ROW — a higher-order ``filter`` with
    index over the token array testing membership against the
    broadcast-join-attached interval array (tokens × intervals per
    doc, pure codegen, no token explode, no shuffle beyond the span
    aggregation the spans operator already pays)."""
    spans = duplicated_substring_spans(docs, k, text_col, id_col)
    per_doc = spans.groupBy("doc_id").agg(
        F.array_sort(
            F.collect_list(F.struct("span_start", "span_end"))
        ).alias("_spans")
    )
    base = docs.filter(F.col(text_col).isNotNull()).select(
        F.col(id_col).alias("doc_id"), F.col(text_col).alias("_t")
    )
    joined = base.join(per_doc, "doc_id", "left").withColumn(
        "_spans", F.coalesce(F.col("_spans"), F.array())
    )
    toks = F.split(F.col("_t"), " ")
    # filter((tok, i) -> no interval covers i): i is 0-based, matching
    # the spans' token offsets.
    kept = F.filter(
        toks,
        lambda t, i: ~F.exists(
            F.col("_spans"),
            lambda s: (i >= s["span_start"]) & (i <= s["span_end"]),
        ),
    )
    return joined.select(
        "doc_id",
        F.array_join(kept, " ").alias("clean_text"),
        F.size(toks).cast("long").alias("n_tokens"),
        (F.size(toks) - F.size(kept)).cast("long").alias("n_removed"),
    )


# ---------------------------------------------------------------------------
# Content-defined chunking (gear-hash CDC) — offset-robust BINARY
# near-dup.  Staged in r11 for r12 registration.
# ---------------------------------------------------------------------------

#: Gear rolling-hash window (bytes) and per-byte gear width (bits).
#: h_i = Σ_{t=0}^{15} gear(b_{i−t})·2^t stays under 16·2^40·2^15 =
#: 2^59 — exact signed-int64 arithmetic in BOTH engines, no wraparound
#: to emulate.
CDC_WINDOW = 16
_GEAR_HEX_CHARS = 10  # 40-bit gear values (portable_hash40 convention)


def _gear_table() -> "list[int]":
    """Deterministic 40-bit gear value per byte: the leading 10 hex
    chars of md5 of the single latin-1 character — the same
    md5-integer convention every portable hash here uses, so the SQL
    twin derives the identical table with
    ``CAST('0x' || substr(md5(ch), 1, 10) AS BIGINT)``."""
    import hashlib

    return [
        int(hashlib.md5(chr(b).encode("latin-1")).hexdigest()[:_GEAR_HEX_CHARS], 16)
        for b in range(256)
    ]


def gear_cdc_chunks(
    media: DataFrame,
    mask_bits: int = 6,
    media_col: str = "media",
    id_col: str = "media_id",
) -> DataFrame:
    """Content-defined chunking (the LBFS/FastCDC family): cut each
    blob AFTER every byte whose gear rolling hash has ``mask_bits``
    low zero bits (expected chunk ≈ 2^mask_bits bytes).  Because a
    boundary depends only on the local ``CDC_WINDOW``-byte context,
    inserting or deleting bytes moves at most the chunks TOUCHING the
    edit — every other chunk re-cuts at the same content and hashes
    identically.  That is the property no fixed-stride rail has
    (stride slicing shifts every frame after an edit), and it is why
    storage dedup (Venti/LBFS/FastCDC, restic/borg) is CDC-based.

    Returns ``(media_id, chunk_idx, chunk_hash, chunk_len)`` with
    ``chunk_hash`` the portable 60-bit md5 integer of the chunk
    bytes.  One Arrow kernel pass per blob — the rolling hash is
    ``CDC_WINDOW`` vectorized shifted adds, no per-byte Python loop;
    no shuffle (the per-blob work never leaves its partition).  The
    arithmetic is plain signed int64 by construction, so the DuckDB
    twin replays boundaries bit-for-bit from the same md5-derived
    gear table.

    Scale shape: output rows ≈ bytes / 2^mask_bits per blob, linear;
    downstream joins ride the chunk-hash relation exactly like every
    banded join here."""
    import hashlib
    from typing import Iterator

    import numpy as np
    import pandas as pd
    from pyspark.sql import types as T

    if not 1 <= int(mask_bits) <= 20:
        raise ValueError(f"mask_bits must be in [1, 20], got {mask_bits}")
    mask = (1 << int(mask_bits)) - 1
    gear = _gear_table()
    w = CDC_WINDOW

    out_schema = T.StructType(
        [
            T.StructField("media_id", media.schema[id_col].dataType),
            T.StructField("chunk_idx", T.IntegerType()),
            T.StructField("chunk_hash", T.LongType()),
            T.StructField("chunk_len", T.IntegerType()),
        ]
    )

    def chunk(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        gtab = np.array(gear, dtype=np.int64)
        for pdf in batches:
            ids, idxs, hashes, lens = [], [], [], []
            for mid, blob in zip(pdf[id_col], pdf[media_col]):
                b = bytes(blob)
                if not b:
                    continue
                g = gtab[np.frombuffer(b, dtype=np.uint8)]
                h = np.zeros(len(b), dtype=np.int64)
                for t in range(w):
                    if t >= len(b):
                        break
                    h[t:] += g[: len(b) - t] << t
                cuts = np.flatnonzero((h & mask) == 0) + 1  # cut AFTER i
                starts = np.concatenate(([0], cuts[cuts < len(b)]))
                ends = np.concatenate((starts[1:], [len(b)]))
                for j, (s, e) in enumerate(zip(starts, ends)):
                    piece = b[s:e]
                    ids.append(mid)
                    idxs.append(j)
                    hashes.append(
                        int(hashlib.md5(piece).hexdigest()[:15], 16)
                    )
                    lens.append(e - s)
            yield pd.DataFrame(
                {
                    "media_id": ids,
                    "chunk_idx": np.array(idxs, dtype=np.int32),
                    "chunk_hash": np.array(hashes, dtype=np.int64),
                    "chunk_len": np.array(lens, dtype=np.int32),
                }
            )

    return media.filter(F.col(media_col).isNotNull()).mapInPandas(
        chunk, schema=out_schema
    )


def cdc_containment_pairs(
    media: DataFrame,
    mask_bits: int = 6,
    min_shared: int = 2,
    min_containment: float = 0.5,
    max_df: int | None = 50,
    media_col: str = "media",
    id_col: str = "media_id",
) -> DataFrame:
    """Offset-robust binary near-dup pairs by shared content-defined
    chunks: an edited/shifted copy re-cuts to mostly identical chunk
    hashes, so CONTAINMENT (shared distinct chunks / the smaller
    blob's distinct chunk count — the winnowing-rail convention)
    scores ≈ 1 while unrelated blobs share nothing.  Returns
    ``(a, b, n_shared, containment)`` with a < b, containment rounded
    to 6.

    Scale shape: the DISTINCT chunk-hash relation is the bucket join
    — candidates from an equi-join on ``chunk_hash`` behind the
    ``max_df`` hot-chunk guard (all-zero blocks, shared headers), so
    candidate volume tracks true co-occurrence, never N²; sizes ride
    a skinny post-guard aggregate, the same shape as
    `media.audio_neardup_pairs`."""
    chunks = (
        gear_cdc_chunks(media, mask_bits, media_col, id_col)
        .select("media_id", "chunk_hash")
        .distinct()
    )
    if max_df is not None:
        hot = (
            chunks.groupBy("chunk_hash")
            .agg(F.count(F.lit(1)).alias("df"))
            .filter(F.col("df") > max_df)
            .select("chunk_hash")
        )
        chunks = chunks.join(F.broadcast(hot), "chunk_hash", "left_anti")
    chunks = chunks.localCheckpoint(eager=False)
    sizes = chunks.groupBy("media_id").agg(F.count(F.lit(1)).alias("n_ch"))
    x, y = chunks.alias("x"), chunks.alias("y")
    shared = (
        x.join(
            y,
            (F.col("x.chunk_hash") == F.col("y.chunk_hash"))
            & (F.col("x.media_id") < F.col("y.media_id")),
        )
        .groupBy(
            F.col("x.media_id").alias("a"), F.col("y.media_id").alias("b")
        )
        .agg(F.count(F.lit(1)).alias("n_shared"))
    )
    sa = sizes.select(F.col("media_id").alias("a"), F.col("n_ch").alias("na"))
    sb = sizes.select(F.col("media_id").alias("b"), F.col("n_ch").alias("nb"))
    frac = F.col("n_shared") / F.least("na", "nb")
    return (
        shared.join(sa, "a")
        .join(sb, "b")
        .filter(
            (F.col("n_shared") >= int(min_shared))
            & (frac >= float(min_containment))
        )
        .select(
            "a",
            "b",
            F.col("n_shared").cast("long"),
            F.round(frac, 6).alias("containment"),
        )
    )

"""End-to-end training-data curation pipeline: dedup → quality →
mixture → budget-pack → shard, emitting the per-(shard, domain)
MANIFEST a 100 TB pretraining build hands to the trainer.

Every stage is a registered, individually-hash-checked operator family
(exact dedup `dedup.py`, Gopher flags, DoReMi-lite mixture
`lm_score.py`, largest-remainder allocation `sampling.py`, rendezvous
sharding `layout.py`); this module composes them into ONE deterministic
relational plan so the driver can hash-check the whole pipeline, not
just its stages.  The reference's ingest pipeline stops at
embed→store (app/core/document_ingestor.py:25-1196); this is the
corpus-side preparation that feeds such a store at scale.

Scale shape: one text-hash shuffle (dedup) + one in-row flag pass
(quality) + the mixture family's single bigram explode + one
|domains|-row integer apportionment + one per-domain selection window
+ an in-row HRW argmax — no stage is ever all-pairs, and the manifest
relation is |shards|·|domains| rows."""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from vector_db_handler_spark.functions import text as text_fns
from vector_db_handler_spark.operators.layout import rendezvous_assign
from vector_db_handler_spark.operators.lm_score import domain_mixture_weights

#: Gopher rule constants — ONE source of truth shared with the
#: registered gopher_quality_flags row (driver_queries consumes every
#: constant below in both its Spark expression and its oracle SQL, so
#: the registered row and the curation gate cannot drift).  The
#: word-count floor is 30 to fit the fixture's ~40-token docs
#: (Gopher's corpus floor is 50 — a config constant, not a shape
#: change).
GOPHER_STOPS = ("the", "be", "to", "of", "and", "that", "have", "with")
GOPHER_MIN_WORDS = 30
GOPHER_MAX_WORDS = 100000
GOPHER_MEAN_LEN_MIN = 3
GOPHER_MEAN_LEN_MAX = 10
GOPHER_MIN_ALPHA_FRAC = 0.8
GOPHER_MAX_SYMBOL_RATIO = 0.1
GOPHER_MIN_STOPS = 2


def gopher_keep_expr(text_col: str = "text"):
    """The registered Gopher keep-flag (word-count bounds, mean word
    length 3–10, ≥80% alphabetic words, ≤10% symbol words, ≥2 stop
    words) as a reusable Column — one in-row pass, zero shuffle."""
    t = F.split(F.col(text_col), " ", -1)
    n_words = F.size(t)
    mean_len = F.length(F.array_join(t, "")).cast("double") / n_words
    frac_alpha = F.size(F.filter(t, lambda x: x.rlike("[a-z]"))).cast(
        "double"
    ) / n_words
    n_stop = F.size(F.filter(t, lambda x: x.isin(*GOPHER_STOPS)))
    sym_ratio = F.size(
        F.filter(t, lambda x: (x == "#") | (x == "..."))
    ).cast("double") / n_words
    return (
        n_words.between(GOPHER_MIN_WORDS, GOPHER_MAX_WORDS)
        & mean_len.between(GOPHER_MEAN_LEN_MIN, GOPHER_MEAN_LEN_MAX)
        & (frac_alpha >= GOPHER_MIN_ALPHA_FRAC)
        & (sym_ratio <= GOPHER_MAX_SYMBOL_RATIO)
        & (n_stop >= GOPHER_MIN_STOPS)
    )


def apportion_select_shard(
    features: DataFrame,
    weights: DataFrame,
    total_n: int,
    shards: list[str],
    domain_col: str = "lang",
    id_col: str = "doc_id",
    salt: str = "curate",
    ntok_col: str = "_ntok",
) -> DataFrame:
    """Stages 4-6 of the curation pipeline over an already-featurized
    survivor relation — shared VERBATIM by the batch
    :func:`curation_manifest` and the streaming emit
    (`streaming.curation_stream.curation_manifest_from_state`), so the
    two paths cannot drift:

    4. largest-remainder apportionment of ``total_n`` ∝
       ``weight_numer`` in exact integers, quota capped at each
       domain's availability;
    5. deterministic per-domain selection by smallest
       ``(md5-hash(id|salt), id)`` rank;
    6. rendezvous sharding + the ``(shard, domain, n_docs, n_tokens,
       sum_doc_id)`` manifest rollup.

    ``features`` carries ``(id_col, domain_col, ntok_col)`` — the
    per-doc token count is an input column (the batch path computes it
    from text in-plan; the streaming path reads it from state), so the
    rollup never needs the raw text."""
    avail = features.filter(F.col(domain_col).isNotNull()).groupBy(
        F.col(domain_col).alias("domain")
    ).agg(F.count(F.lit(1)).alias("n_avail"))
    tot = weights.groupBy().agg(F.sum("weight_numer").alias("_w_tot"))
    quota_base = (
        weights.crossJoin(F.broadcast(tot))
        .withColumn(
            "_base",
            F.expr(f"CAST({int(total_n)} * weight_numer AS BIGINT) div _w_tot"),
        )
        .withColumn(
            "_rem",
            F.expr(f"CAST({int(total_n)} * weight_numer AS BIGINT) % _w_tot"),
        )
    )
    w_lead = Window.orderBy(F.col("_rem").desc(), F.col("domain").asc())
    leftover = F.lit(int(total_n)) - F.sum("_base").over(
        Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    quotas = (
        quota_base.withColumn("_lead", F.row_number().over(w_lead))
        .withColumn("_left", leftover)
        .select(
            "domain",
            (
                F.col("_base")
                + F.when(F.col("_lead") <= F.col("_left"), F.lit(1)).otherwise(
                    F.lit(0)
                )
            ).alias("_quota_raw"),
        )
        .join(avail, "domain")
        .select(
            "domain", F.least(F.col("_quota_raw"), F.col("n_avail")).alias("_quota")
        )
    )

    pick_hash = text_fns.portable_hash60(
        F.concat(F.col(id_col).cast("string"), F.lit("|" + salt))
    )
    w_pick = Window.partitionBy(F.col(domain_col)).orderBy(
        pick_hash.asc(), F.col(id_col).asc()
    )
    # quotas' key is aliased so the join stays unambiguous when the
    # caller's domain_col is itself named "domain" (the streaming path).
    quotas_q = quotas.select(
        F.col("domain").alias("_qdomain"), F.col("_quota")
    )
    selected = (
        features.filter(F.col(domain_col).isNotNull())
        .withColumn("_pick", F.row_number().over(w_pick))
        .join(
            F.broadcast(quotas_q),
            F.col(domain_col) == F.col("_qdomain"),
        )
        .filter(F.col("_pick") <= F.col("_quota"))
        .drop("_qdomain")
    )

    return (
        rendezvous_assign(selected, shards, id_col=id_col, out_col="shard")
        .groupBy("shard", F.col(domain_col).alias("domain"))
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.col(ntok_col)).alias("n_tokens"),
            F.sum(F.col(id_col)).alias("sum_doc_id"),
        )
    )


def curation_manifest(
    docs: DataFrame,
    total_n: int,
    shards: list[str],
    domain_col: str = "lang",
    text_col: str = "text",
    id_col: str = "doc_id",
    mixture_rounds: int = 2,
    mixture_base: int = 4000,
    salt: str = "curate",
    decontaminate_against: DataFrame | None = None,
    decontam_threshold: float = 0.5,
) -> DataFrame:
    """Run the full curation pipeline and return the manifest
    ``(shard, domain, n_docs, n_tokens, sum_doc_id)``.

    1. **Dedup** (exact): keep the min-id doc per portable 60-bit text
       hash — one map-side-combined shuffle.
    2. **Quality**: Gopher keep-flag survivors only (in-row).
    3. **Mixture**: DoReMi-lite weights over the SURVIVING corpus
       (`domain_mixture_weights`) — the mix reflects what dedup and
       quality left, not the raw crawl.
    4. **Budget-pack**: apportion ``total_n`` docs across domains
       ∝ ``weight_numer`` by the largest-remainder method in exact
       integers (ties → domain ascending, the `allocate_stratified_
       exact` convention), quota capped at each domain's availability
       (a binding cap leaves the total short by construction —
       documented, not silently rebalanced).
    5. **Select**: each domain keeps its quota by smallest
       ``(md5-hash(id|salt), id)`` rank — deterministic, reproducible
       sampling (one per-domain window).
    6. **Shard**: rendezvous (HRW) assignment over ``shards`` — in-row
       argmax, no shuffle; incremental-copy rebalances by
       construction.

    When ``decontaminate_against`` is given (an eval/benchmark doc
    relation with the same text/id columns), a DECONTAMINATION stage
    runs between quality and mixture: any survivor whose cross-corpus
    shingle Jaccard with a benchmark doc reaches
    ``decontam_threshold`` is dropped (the registered
    `decontamination_pairs` family, `dedup.cross_jaccard_pairs` —
    cost scales with the eval side's postings).  The contaminated id
    set is benchmark-overlap-sized, so the removal is a broadcast
    anti-join.

    Null-domain docs cannot carry a mixture weight and drop at the
    mixture stage (same contract as `domain_mixture_weights`).
    ``sum_doc_id`` is the manifest's content checksum: BIGINT sum of
    selected ids per cell, so two engines agreeing on every cell
    agree on the exact selected SET."""
    if total_n < 0:
        raise ValueError(f"total_n must be >= 0, got {total_n}")
    if not shards:
        raise ValueError("need at least one shard name")
    # The quota arithmetic total_n·weight_numer runs in BIGINT, and
    # weight_numer can reach (mixture_base + 64000)^mixture_rounds (the
    # domain_mixture_weights worst case: excess_milli ≤ 64000).  Check
    # the product against int64 EXACTLY in Python ints and fail loudly
    # — non-ANSI Spark would wrap it into negative/garbage quotas in a
    # module whose contract is exact-integer apportionment.
    max_numer = (int(mixture_base) + 64000) ** int(mixture_rounds)
    if int(total_n) * max_numer > 2**63 - 1:
        raise ValueError(
            f"total_n={total_n} with mixture_base={mixture_base}, "
            f"mixture_rounds={mixture_rounds} can overflow BIGINT: "
            f"worst-case total_n * weight_numer = total_n * "
            f"({int(mixture_base) + 64000}^{mixture_rounds}) exceeds "
            "int64; reduce mixture_rounds, mixture_base or total_n"
        )

    # 1. exact dedup: min-id winner per text-hash group.  Decided on
    # a SKINNY (hash, id) projection (r15, guide §8/§2.3): the
    # previous row_number window shuffled every surviving column —
    # including the raw text — by the hash key, and re-ran that
    # text-carrying shuffle once per downstream consumer (the mixture
    # model, the mixture rollup, the feature pass).  The min-id
    # aggregate partial-combines map-side, only (hash, id) crosses
    # the exchange, and the winner set re-attaches by a semi-join —
    # document text now never crosses an exchange in this stage at
    # any corpus size.  Precondition (r15 ADVICE note): id_col is
    # UNIQUE per row — under duplicated ids the semi-join keeps every
    # row bearing a winner id where the old window kept exactly one.
    keep_ids = (
        docs.select(
            F.col(id_col).alias("_kid"),
            text_fns.portable_hash60(F.col(text_col)).alias("_th"),
        )
        .groupBy("_th")
        .agg(F.min("_kid").alias("_kid"))
        .select("_kid")
        .localCheckpoint(eager=False)
    )
    survivors = docs.join(
        keep_ids, F.col(id_col) == F.col("_kid"), "left_semi"
    )
    # 2. quality gate
    survivors = survivors.filter(gopher_keep_expr(text_col))
    # 2b. optional decontamination against a benchmark/eval set
    if decontaminate_against is not None:
        from vector_db_handler_spark.operators.dedup import (
            cross_jaccard_pairs,
        )

        contaminated = (
            cross_jaccard_pairs(
                survivors,
                decontaminate_against,
                threshold=decontam_threshold,
                text_col=text_col,
                id_col=id_col,
            )
            .select(F.col("left_id").alias("_contam_id"))
            .distinct()
        )
        survivors = survivors.join(
            F.broadcast(contaminated),
            F.col(id_col) == F.col("_contam_id"),
            "left_anti",
        )

    # 3. mixture weights on the surviving corpus
    weights = domain_mixture_weights(
        survivors,
        domain_col=domain_col,
        text_col=text_col,
        n_rounds=mixture_rounds,
        base=mixture_base,
    ).select("domain", "weight_numer")

    # 4-6. apportion -> select -> shard, via the helper shared with
    # the streaming emit (one source of truth for the decision layer).
    features = survivors.withColumn(
        "_ntok", text_fns.token_count(F.col(text_col))
    )
    return apportion_select_shard(
        features,
        weights,
        total_n,
        shards,
        domain_col=domain_col,
        id_col=id_col,
        salt=salt,
    )


def curation_manifest_delta(
    docs_before: DataFrame,
    docs_after: DataFrame,
    total_n: int,
    shards: list[str],
    domain_col: str = "lang",
    text_col: str = "text",
    id_col: str = "doc_id",
    mixture_rounds: int = 2,
    mixture_base: int = 4000,
    salt: str = "curate",
) -> DataFrame:
    """What CHANGES in the shipped manifest when the corpus moves from
    ``docs_before`` to ``docs_after`` (typically before ∪ a new crawl
    drop) — the ops rail an operator reads before promoting a new
    corpus snapshot: which (shard, domain) cells grew, which shrank
    (arrivals displace selections — mixture weights shift and
    per-domain quotas re-apportion globally, so a cell CAN lose docs
    even though the corpus only grew), and whether a cell's exact
    selected SET changed (``set_changed`` — checksum inequality even
    when counts match).

    Both manifests run the full `curation_manifest` pipeline with the
    same dials; the diff is a |shards|·|domains|-row full-outer join,
    zero-filled.  Returns ``(shard, domain, n_docs_before,
    n_docs_after, delta_docs, delta_tokens, set_changed)`` — only rows
    where something changed (the no-change cells are noise at 100 TB:
    |shards|·|domains| can be thousands of rows, and the reader wants
    the exceptions)."""
    kw = dict(
        domain_col=domain_col,
        text_col=text_col,
        id_col=id_col,
        mixture_rounds=mixture_rounds,
        mixture_base=mixture_base,
        salt=salt,
    )
    m0 = curation_manifest(docs_before, total_n, shards, **kw).select(
        "shard",
        "domain",
        F.col("n_docs").alias("_docs0"),
        F.col("n_tokens").alias("_toks0"),
        F.col("sum_doc_id").alias("_sum0"),
    )
    m1 = curation_manifest(docs_after, total_n, shards, **kw).select(
        "shard",
        "domain",
        F.col("n_docs").alias("_docs1"),
        F.col("n_tokens").alias("_toks1"),
        F.col("sum_doc_id").alias("_sum1"),
    )
    z = F.lit(0).cast("long")
    joined = m0.join(m1, ["shard", "domain"], "full_outer").select(
        "shard",
        "domain",
        F.coalesce(F.col("_docs0"), z).alias("n_docs_before"),
        F.coalesce(F.col("_docs1"), z).alias("n_docs_after"),
        (F.coalesce(F.col("_docs1"), z) - F.coalesce(F.col("_docs0"), z)).alias(
            "delta_docs"
        ),
        (F.coalesce(F.col("_toks1"), z) - F.coalesce(F.col("_toks0"), z)).alias(
            "delta_tokens"
        ),
        (
            F.coalesce(F.col("_sum0"), z) != F.coalesce(F.col("_sum1"), z)
        ).alias("set_changed"),
    )
    return joined.filter(
        F.col("set_changed")
        | (F.col("delta_docs") != 0)
        | (F.col("delta_tokens") != 0)
    )

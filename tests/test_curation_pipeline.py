"""End-to-end curation pipeline (dedup → quality → mixture →
budget-pack → shard → manifest): stage-composition semantics, exact
apportionment invariants, determinism, and the cross-engine DuckDB
replay of the WHOLE pipeline in one query.  Staged in r13 for r14
driver registration (oracle moves to driver_queries then)."""

from __future__ import annotations

import pytest

from tests.oracle_check import assert_oracle_types_hashable, compare
from vector_db_handler_spark import driver_queries as dq
from vector_db_handler_spark.operators.curation import (
    GOPHER_STOPS,
    curation_manifest,
    gopher_keep_expr,
)

TOTAL_N = 120
SHARDS = [f"s{i}" for i in range(6)]
SALT = "curate"

_H60 = "CAST('0x' || substr(md5({e}), 1, 15) AS BIGINT)"


def _curation_oracle_sql(total_n: int = TOTAL_N) -> str:
    shard_values = ", ".join(f"('{s}')" for s in sorted(SHARDS))
    pick_h = _H60.format(e="CAST(doc_id AS VARCHAR) || '|" + SALT + "'")
    rdv_h = _H60.format(e="CAST(doc_id AS VARCHAR) || '|' || shard")
    return f"""
WITH dd AS (
  SELECT doc_id, lang, text FROM (
    SELECT doc_id, lang, text,
           row_number() OVER (
             PARTITION BY {_H60.format(e='text')}
             ORDER BY doc_id ASC) AS rn
    FROM documents
  ) WHERE rn = 1
),
gt AS (SELECT doc_id, lang, text, string_split(text, ' ') AS t FROM dd),
sv AS (
  SELECT doc_id, lang, text FROM gt
  WHERE len(t) BETWEEN 30 AND 100000
    AND CAST(len(array_to_string(t, '')) AS DOUBLE) / len(t) BETWEEN 3 AND 10
    AND CAST(len(list_filter(t, x -> regexp_matches(x, '[a-z]'))) AS DOUBLE)
        / len(t) >= 0.8
    AND CAST(len(list_filter(t, x -> x = '#' OR x = '...')) AS DOUBLE)
        / len(t) <= 0.1
    AND len(list_filter(t, x -> x IN {GOPHER_STOPS})) >= 2
),
toks AS (
  SELECT lang AS domain, string_split(text, ' ') AS t FROM sv
  WHERE lang IS NOT NULL
),
doc_bigrams AS (
  SELECT domain,
         unnest(list_transform(generate_series(1, len(t) - 1),
                               i -> t[i] || ' ' || t[i + 1])) AS bigram
  FROM toks
),
model AS (SELECT bigram, count(*) AS n FROM doc_bigrams GROUP BY 1),
credited AS (
  SELECT d.domain, length(printf('%b', m.n)) AS bits
  FROM doc_bigrams d JOIN model m USING (bigram)
),
per_domain AS (
  SELECT domain, CAST(count(*) AS BIGINT) AS n_bigrams,
         CAST(sum(bits) AS BIGINT) AS credit
  FROM credited GROUP BY 1
),
gtot AS (
  SELECT CAST(sum(n_bigrams) AS BIGINT) AS tot_bigrams,
         CAST(sum(credit) AS BIGINT) AS tot_credit
  FROM per_domain
),
weighted AS (
  SELECT p.domain,
         CAST(power(greatest(CAST(1 AS BIGINT),
                {dq._DM_BASE}
                + CAST(1000 * g.tot_credit AS BIGINT) // g.tot_bigrams
                - CAST(1000 * p.credit AS BIGINT) // p.n_bigrams),
              {dq._DM_ROUNDS}) AS BIGINT) AS weight_numer
  FROM per_domain p, gtot g
),
wtot AS (SELECT CAST(sum(weight_numer) AS BIGINT) AS w_tot FROM weighted),
qb AS (
  SELECT domain,
         CAST({total_n} * weight_numer AS BIGINT) // w.w_tot AS base,
         CAST({total_n} * weight_numer AS BIGINT) % w.w_tot AS rem
  FROM weighted, wtot w
),
availq AS (
  SELECT lang AS domain, count(*) AS n_avail FROM sv
  WHERE lang IS NOT NULL GROUP BY 1
),
quotas AS (
  SELECT l.domain,
         least(l.base + CASE WHEN row_number() OVER (
                  ORDER BY l.rem DESC, l.domain ASC)
                <= {total_n} - (SELECT sum(base) FROM qb)
              THEN 1 ELSE 0 END,
              a.n_avail) AS quota
  FROM qb l JOIN availq a USING (domain)
),
picked AS (
  SELECT s.doc_id, s.lang, s.text
  FROM (
    SELECT doc_id, lang, text,
           row_number() OVER (PARTITION BY lang
             ORDER BY {pick_h} ASC, doc_id ASC) AS pick
    FROM sv WHERE lang IS NOT NULL
  ) s JOIN quotas q ON s.lang = q.domain
  WHERE s.pick <= q.quota
),
sharded AS (
  SELECT doc_id, lang, text, shard FROM (
    SELECT p.doc_id, p.lang, p.text, v.shard,
           row_number() OVER (PARTITION BY p.doc_id
             ORDER BY {rdv_h} DESC, shard DESC) AS srn
    FROM picked p, (VALUES {shard_values}) v(shard)
  ) WHERE srn = 1
)
SELECT shard, lang AS domain,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS n_tokens,
       CAST(sum(doc_id) AS BIGINT) AS sum_doc_id
FROM sharded GROUP BY 1, 2
"""


CURATION_ORACLE_SQL = _curation_oracle_sql()


def _docs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def _run(spark, sf_dir, total_n=TOTAL_N):
    return curation_manifest(_docs(spark, sf_dir), total_n, SHARDS)


def test_oracle_types_hashable(duck):
    assert_oracle_types_hashable(duck, CURATION_ORACLE_SQL, "curation")


def test_cross_engine_oracle_replay(spark, sf_dir, duck):
    compare(_run(spark, sf_dir), duck, CURATION_ORACLE_SQL)


def test_budget_exact_when_not_capped(spark, sf_dir):
    """Largest-remainder apportionment sums EXACTLY to total_n when no
    domain's quota hits its availability cap (the Hamilton guarantee)."""
    out = _run(spark, sf_dir).collect()
    assert sum(r["n_docs"] for r in out) == TOTAL_N


def test_budget_caps_bind_when_budget_exceeds_corpus(spark, sf_dir):
    """total_n past the surviving corpus size returns every eligible
    doc once — capped, never duplicated or rebalanced."""
    docs = _docs(spark, sf_dir)
    eligible = (
        docs.filter(gopher_keep_expr())
        .filter("lang IS NOT NULL")
        .selectExpr("count(DISTINCT text) AS n")  # dedup keeps one per text
        .first()["n"]
    )
    out = _run(spark, sf_dir, total_n=10**6).collect()
    assert sum(r["n_docs"] for r in out) == eligible


def test_deterministic_across_partitionings(spark, sf_dir):
    base = sorted(map(tuple, _run(spark, sf_dir).collect()))
    shuffled = sorted(
        map(
            tuple,
            curation_manifest(
                _docs(spark, sf_dir).repartition(13), TOTAL_N, SHARDS
            ).collect(),
        )
    )
    assert base == shuffled


def test_stage_composition_on_planted_docs(spark):
    """Synthetic corpus pinning each stage's contribution: a verbatim
    duplicate survives ONCE under its min id, a sub-quality doc never
    reaches the manifest, and the id checksum proves exactly which
    docs were packed."""
    good = (
        "the quick brown fox jumps over the lazy dog and then the dog "
        "sat down to rest with a bone that it have found near the old "
        "mill while the sun set slowly of the evening be calm"
    )
    rows = [
        (1, "en", good),
        (7, "en", good),  # exact duplicate — dedup keeps id 1 only
        (3, "en", good + " extra tail words of the same kind be here with that have more"),
        (4, "de", good + " noch ein paar worte of the that be have with and to"),
        (5, "en", "short junk"),  # fails the Gopher word-count floor
        (6, None, good + " null lang doc drops at the mixture stage of that be have"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, lang string, text string")
    out = curation_manifest(docs, 10**6, ["only"]).collect()
    selected_ids = sum(r["sum_doc_id"] for r in out)
    n_selected = sum(r["n_docs"] for r in out)
    # Survivors: 1 (dup winner), 3, 4.  Excluded: 7 (duplicate),
    # 5 (quality), 6 (null domain).
    assert n_selected == 3
    assert selected_ids == 1 + 3 + 4
    assert {r["domain"] for r in out} == {"en", "de"}


def test_args_validated(spark, sf_dir):
    docs = _docs(spark, sf_dir)
    with pytest.raises(ValueError, match="total_n"):
        curation_manifest(docs, -1, SHARDS)
    with pytest.raises(ValueError, match="shard"):
        curation_manifest(docs, 10, [])


def test_decontamination_stage_drops_benchmark_overlap(spark):
    """Planted contamination: a benchmark doc duplicating a corpus
    doc's text must knock that doc (and only that doc) out of the
    manifest; the clean run keeps it."""
    good = (
        "the quick brown fox jumps over the lazy dog and then the dog "
        "sat down to rest with a bone that it have found near the old "
        "mill while the sun set slowly of the evening be calm"
    )
    other = (
        "a completely different story about the sea and the ships that "
        "be sailing with the tide of dawn while sailors have kept watch "
        "and that old lighthouse stood to guard the rocky shore below"
    )
    docs = spark.createDataFrame(
        [(1, "en", good), (2, "en", other)],
        "doc_id long, lang string, text string",
    )
    bench = spark.createDataFrame(
        [(900, "en", good)], "doc_id long, lang string, text string"
    )
    clean = curation_manifest(docs, 10**6, ["only"]).collect()
    assert sum(r["sum_doc_id"] for r in clean) == 1 + 2
    decon = curation_manifest(
        docs, 10**6, ["only"], decontaminate_against=bench
    ).collect()
    assert sum(r["sum_doc_id"] for r in decon) == 2
    assert sum(r["n_docs"] for r in decon) == 1


def test_total_n_overflow_preflight(spark, sf_dir):
    """r13 ADVICE (medium): total_n * weight_numer runs in BIGINT and
    weight_numer can reach (mixture_base + 64000)^mixture_rounds — a
    doc budget big enough to overflow int64 must fail LOUDLY in Python
    ints before any Spark job, not wrap into negative quotas."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    # (4000 + 64000)^2 = 68000^2 = 4.624e9; 2^63/4.624e9 ≈ 1.995e9 —
    # a 2.1e9-doc budget overflows, well inside a pretraining corpus.
    with pytest.raises(ValueError, match="overflow"):
        curation_manifest(docs, 2_100_000_000, SHARDS)
    # ... and reducing the rounds dial restores the headroom: the
    # preflight passes (the plan builds; we don't execute it).
    curation_manifest(docs, 2_100_000_000, SHARDS, mixture_rounds=1)

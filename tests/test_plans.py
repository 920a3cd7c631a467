"""Physical-plan shape checks — the properties that make these queries
scale, which row-level oracles can't see: broadcast joins on dim
tables, filter pushdown into the parquet scan, and top-k lowering to
TakeOrderedAndProject instead of a global sort."""

from __future__ import annotations

from pyspark.sql import functions as F

from vector_db_handler_spark import driver_queries as dq
from vector_db_handler_spark.operators import knn as knn_ops


def _plan(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), "formatted")


def test_q3_broadcasts_customer_and_pushes_filters(spark, sf_dir):
    plan = _plan(dq.tpch_q3(spark, sf_dir))
    assert "BroadcastHashJoin" in plan
    # mktsegment equality must reach the customer scan.
    assert "PushedFilters" in plan and "c_mktsegment" in plan


def test_q5_broadcasts_dims(spark, sf_dir):
    plan = _plan(dq.tpch_q5(spark, sf_dir))
    assert plan.count("BroadcastHashJoin") >= 3  # cust, supp, nation, region
    assert "r_name" in plan  # region filter present, not a post-join filter


def test_q18_broadcasts_both_joins(spark, sf_dir):
    plan = _plan(dq.tpch_q18(spark, sf_dir))
    # The having-tail and its order join are both broadcast: neither
    # orders nor customer is ever exchange-shuffled on a join key.
    assert plan.count("BroadcastHashJoin") >= 2
    assert "SortMergeJoin" not in plan


def test_q7_broadcasts_tagged_dims(spark, sf_dir):
    plan = _plan(dq.tpch_q7(spark, sf_dir))
    # Nation joins + the nation-tagged supplier side are broadcast;
    # the shipdate range must reach the lineitem scan.
    assert plan.count("BroadcastHashJoin") >= 2
    assert "PushedFilters" in plan and "l_shipdate" in plan


def test_knn_lowers_to_take_ordered(spark, sf_dir):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    plan = _plan(knn_ops.knn(emb, dq.QUERY_VEC, k=5, tie_break_col="vec_id"))
    assert "TakeOrderedAndProject" in plan, "top-k must not be a global sort"
    assert "Sort " not in plan.split("TakeOrderedAndProject")[0]


def test_filtered_knn_pushes_doc_filter(spark, sf_dir):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    plan = _plan(
        knn_ops.knn_on_docs(emb, dq.QUERY_VEC, doc_ids=[1, 2], k=5, doc_id_col="label")
    )
    assert "PushedFilters" in plan and "label" in plan


def test_scroll_prunes_columns(spark, sf_dir):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    plan = _plan(
        knn_ops.scroll(emb, limit=5, order_col="vec_id").select("vec_id", "label")
    )
    # with_vectors=False semantics: the embedding column must not be read.
    assert "embedding" not in plan.split("ReadSchema")[-1].splitlines()[0]


def test_range_join_is_not_nested_loop(spark, sf_dir):
    from vector_db_handler_spark.operators import timeseries as ts_ops
    from vector_db_handler_spark.sources.tables import load_table

    plan = _plan(ts_ops.range_join_pairs(load_table(spark, sf_dir, "events"), window_sec=300))
    # The bucketing must turn the band predicate into an equi-join.
    assert "BroadcastNestedLoopJoin" not in plan and "CartesianProduct" not in plan


def test_asof_join_single_shuffle(spark, sf_dir):
    from vector_db_handler_spark.operators import timeseries as ts_ops
    from vector_db_handler_spark.sources.tables import load_table

    ev = load_table(spark, sf_dir, "events")
    left = ev.filter(ev.event_type == "purchase").select("event_id", "user_id", "ts")
    right = ev.filter(ev.event_type == "view")
    plan = _plan(ts_ops.asof_join(left, right, "user_id", "ts", "event_id"))
    assert "Join" not in plan  # no join operator at all - union + window
    # one exchange for the right-side pre-dedup agg, one for the window
    # partitioning; never more.
    import re

    assert len(re.findall(r"\(\d+\) Exchange", plan)) <= 2


def test_cosine_neardup_is_distributed_grouped_map(spark, sf_dir):
    from vector_db_handler_spark.operators import similarity as sim_ops

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    df = sim_ops.cosine_neardup_pairs(emb, threshold=0.45)
    plan = _plan(df)
    # The all-pairs product runs as a grouped-map pandas stage over
    # block-pairs — never as a driver-collected matrix (no collect
    # happens at plan-build time) and never as a joined pair explosion.
    assert "FlatMapGroupsInPandas" in plan
    assert "Join" not in plan and "CartesianProduct" not in plan
    import re

    # one exchange to co-locate each block-pair's rows; nothing else
    assert len(re.findall(r"\(\d+\) Exchange", plan)) <= 1


def test_q4_plans_left_semi_hash_join(spark, sf_dir):
    plan = _plan(dq.tpch_q4(spark, sf_dir))
    assert "LeftSemi" in plan
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan
    # the date range must reach the orders scan
    assert "PushedFilters" in plan and "o_orderdate" in plan


def test_q21_plans_semi_and_anti_joins(spark, sf_dir):
    plan = _plan(dq.tpch_q21(spark, sf_dir))
    assert "LeftSemi" in plan and "LeftAnti" in plan
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan
    # supplier + nation ride broadcast; no big-table sort-merge join
    assert "BroadcastHashJoin" in plan


def test_q13_plans_single_outer_join(spark, sf_dir):
    plan = _plan(dq.tpch_q13(spark, sf_dir))
    # No-order customers must survive: exactly one LEFT OUTER join,
    # with the priority filter applied on the orders side BEFORE it.
    assert "LeftOuter" in plan
    assert "CartesianProduct" not in plan
    assert "PushedFilters" in plan and "o_orderpriority" in plan


def test_q17_correlated_avg_is_aggregate_then_join(spark, sf_dir):
    plan = _plan(dq.tpch_q17(spark, sf_dir))
    # The per-part average joins back as a broadcast — one HashAggregate
    # feeding a BroadcastHashJoin, never a per-row rescan or nested loop.
    assert "BroadcastHashJoin" in plan
    assert "BroadcastNestedLoopJoin" not in plan and "CartesianProduct" not in plan
    # brand/type equality reaches the part scan
    assert "p_brand" in plan and "PushedFilters" in plan


def test_q16_not_in_lowers_to_anti_join(spark, sf_dir):
    plan = _plan(dq.tpch_q16(spark, sf_dir))
    assert "LeftAnti" in plan
    assert "CartesianProduct" not in plan and "SortMergeJoin" not in plan


def test_q20_nested_in_lowers_to_semi_chain(spark, sf_dir):
    plan = _plan(dq.tpch_q20(spark, sf_dir))
    assert "LeftSemi" in plan
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan
    # the year window reaches the lineitem scan
    assert "l_shipdate" in plan and "PushedFilters" in plan


def test_q22_anti_join_and_scalar_broadcast(spark, sf_dir):
    plan = _plan(dq.tpch_q22(spark, sf_dir))
    assert "LeftAnti" in plan
    # the 1-row average broadcasts (BroadcastNestedLoopJoin over a
    # single-row side is the right plan for a scalar — cheap by
    # construction); the big sides must still hash-join.
    assert "CartesianProduct" not in plan
    assert "PushedFilters" in plan and "o_orderdate" in plan


def test_q15_max_is_single_aggregation_tree(spark, sf_dir):
    plan = _plan(dq.tpch_q15(spark, sf_dir))
    # revenue view aggregated ONCE; its max comes back as a 1-row
    # broadcast; supplier rides a broadcast hash join.
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
    assert "PushedFilters" in plan and "l_shipdate" in plan


def test_doc_repetition_fuses_into_scan(spark, sf_dir):
    plan = _plan(dq.doc_repetition(spark, sf_dir))
    # repeats = n − n_distinct inside the row, one Arrow-batched pass
    # in the scan stage: no explode-shuffle of the shingle multiset,
    # no aggregation, no interpreted array-lambda HOFs (10× slower).
    assert "MapInPandas" in plan
    assert "Exchange" not in plan
    assert "HashAggregate" not in plan and "Generate" not in plan


import pytest


@pytest.mark.parametrize(
    "name,max_exchanges",
    [
        ("tpch_q2", 2),   # min-agg + distinct
        ("tpch_q8", 2),   # lineitem ⋈ orders + final agg
        ("tpch_q9", 2),
        ("tpch_q10", 2),
        ("tpch_q11", 3),  # value agg + total agg + final filter
        ("tpch_q19", 1),  # broadcast part, one agg
    ],
)
def test_tpch_tail_never_shuffles_big_tables(spark, sf_dir, name, max_exchanges):
    """Every dim side rides a broadcast: the only exchanges are the
    aggregates' own shuffles — lineitem/orders are never sort-merge
    joined or replicated through a nested loop."""
    import re

    # TPC-H rows live in the retired registry since the r13 fold
    # (driver slot: tpch_rotating); the plan contract is unchanged.
    plan = _plan(getattr(dq, name)(spark, sf_dir))
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastHashJoin" in plan
    assert len(re.findall(r"\(\d+\) Exchange", plan)) <= max_exchanges


def test_md5_embedder_is_native_codegen(spark, sf_dir):
    """The SQL-expressible embedder must stay JVM-side: embedding a
    column adds NO Python eval stage (the whole point vs the PCG64
    mapInPandas embedder), and its scalar twin returns the same bits."""
    from vector_db_handler_spark import embedder as emb_mod

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(5)
    df = docs.select(
        "doc_id", emb_mod.md5_embed_expr(F.col("text"), 8).alias("embedding")
    )
    plan = _plan(df)
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan
    # '*' prefixes codegen stages in formatted explain: the embedding
    # Project must be inside whole-stage codegen.
    assert "* Project" in plan
    rows = df.collect()
    texts = {r["doc_id"]: r["text"] for r in docs.select("doc_id", "text").collect()}
    for r in rows:
        assert list(r["embedding"]) == emb_mod.md5_embed_text(texts[r["doc_id"]], 8)


def test_gopher_flags_zero_shuffle(spark, sf_dir):
    """The whole Gopher rule battery is one narrow scan-fused pass —
    any Exchange here would mean a rule leaked into an aggregate."""
    plan = _plan(dq.gopher_quality_flags(spark, sf_dir))
    assert "Exchange" not in plan, plan


def test_span_dedup_two_shuffles_no_cartesian(spark, sf_dir):
    """Span dedup moves data twice (span-hash census — reused by the
    join-back — and doc reassembly); the size joins must ride
    broadcasts, and nothing may degrade to cartesian/nested-loop."""
    plan = _plan(dq.span_dedup_corpus(spark, sf_dir))
    assert plan.count("Exchange hashpartitioning") <= 2, plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_tfidf_broadcasts_corpus_size(spark, sf_dir):
    """The corpus-size scalar joins in as a broadcast (1-row
    relation), never a shuffled join or a driver-collected literal."""
    plan = _plan(dq.tfidf_topk_terms(spark, sf_dir))
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


# --- round 6: SRP / BM25 / hybrid / layout / phrase / IVM shapes -----------


def test_bm25_lowers_to_take_ordered_no_smj(spark, sf_dir):
    plan = _plan(dq.bm25_topk_docs(spark, sf_dir))
    assert "TakeOrderedAndProject" in plan, "BM25 top-k must not globally sort"
    assert "SortMergeJoin" not in plan, "df/stats must ride broadcasts"
    assert "CartesianProduct" not in plan


def test_srp_banded_join_no_cartesian(spark, sf_dir):
    plan = _plan(dq.srp_neardup_pairs(spark, sf_dir))
    # The checkpointed result hides upstream, so pin the builder's plan
    # instead: candidates must come from an equi-join, never a product.
    from vector_db_handler_spark.operators import srp as srp_ops

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    planes = srp_ops.srp_planes(64, srp_ops.N_BITS, 7)
    sigs = srp_ops.srp_signatures(emb, planes)
    # executedPlan().toString() lists each node exactly once (the
    # "formatted" explain repeats nodes in its details section).
    sig_plan = sigs._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in sig_plan
    # exactly TWO narrow Arrow hops — quantize, then the one-matmul
    # signature pass — chained in the same stage with no exchange
    # between them (the HOF form was dropped: its expression tree cost
    # O(n_bits·dim) driver-side analysis per query, see PERF.md)
    assert sig_plan.count("MapInPandas") == 2
    # no shuffle between the hops (the only Exchange is the broadcast
    # of the 1-row quantization scale)
    assert "Exchange hashpartitioning" not in sig_plan


def test_hybrid_broadcasts_candidates(spark, sf_dir):
    plan = _plan(dq.hybrid_search_rerank(spark, sf_dir))
    # the 50-row candidate set must be the build side of a broadcast
    # join against the embedding scan — never a shuffle of embeddings
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_phrase_search_prunes_postings(spark, sf_dir):
    plan = _plan(dq.phrase_search_docs(spark, sf_dir))
    assert "CartesianProduct" not in plan
    # both posting lists are term-filtered BEFORE the join
    assert plan.count("Filter") >= 2


def test_zorder_stats_single_shuffle(spark, sf_dir):
    df = dq.zorder_orders_layout(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    # one partial+final aggregate pair over one exchange; the z
    # expression itself is narrow (no join, no extra exchange)
    assert plan.count("Exchange") == 1
    assert "HashAggregate" in plan


def test_ivm_merge_joins_rollups_not_events(spark, sf_dir):
    plan = _plan(dq.incremental_rollup_merge(spark, sf_dir))
    # the full-outer merge must join AGGREGATED relations: both join
    # inputs are HashAggregate subtrees, so the join key cardinality is
    # rollup-sized, never event-sized
    assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan or "BroadcastHashJoin" in plan
    assert plan.count("HashAggregate") >= 4  # partial+final per side


def test_percentile_approx_tracks_exact(spark, sf_dir):
    """The documented 100 TB path for value_percentiles_by_type is the
    order-free percentile_approx sketch; pin that at high accuracy it
    lands within the neighborhood of the exact discrete answer on the
    fixture (so recommending it is backed by a measurement)."""
    from pyspark.sql import functions as F

    from vector_db_handler_spark import driver_queries as dq

    exact = {
        r.event_type: (r.p50, r.p90, r.p99)
        for r in dq.value_percentiles_by_type(spark, sf_dir).collect()
    }
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    approx = {
        r.event_type: (r.a50, r.a90, r.a99)
        for r in ev.groupBy("event_type")
        .agg(
            F.percentile_approx("value", 0.5, 10000).alias("a50"),
            F.percentile_approx("value", 0.9, 10000).alias("a90"),
            F.percentile_approx("value", 0.99, 10000).alias("a99"),
        )
        .collect()
    }
    for t, (p50, p90, p99) in exact.items():
        a50, a90, a99 = approx[t]
        assert abs(a50 - p50) <= max(0.05 * p50, 0.5), (t, a50, p50)
        assert abs(a90 - p90) <= max(0.05 * p90, 0.5), (t, a90, p90)
        assert abs(a99 - p99) <= max(0.10 * p99, 1.0), (t, a99, p99)


# --- round-6 continuation operators -----------------------------------------


def test_ppjoin_is_equijoin_never_cartesian(spark, sf_dir):
    """Prefix candidates and both verify joins must be hash equi-joins
    — a nested-loop/cartesian anywhere breaks the whole point of the
    prefix filter."""
    plan = _plan(dq.ppjoin_jaccard_pairs(spark, sf_dir))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_scd2_merge_broadcasts_update_batch(spark, sf_dir):
    """The change batch joins broadcast (dim side never shuffles on
    the join key), and no leg degenerates to a nested loop.  The r6
    advisor caught that the old FULL OUTER formulation silently
    ignored the broadcast hint (BroadcastHashJoin does not support
    full outer) — so this asserts the ACTUAL strategy: every join is
    a BroadcastHashJoin, none fall back to sort-merge."""
    plan = _plan(dq.scd2_customer_merge(spark, sf_dir))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan, "dimension is being shuffled on the key"


def test_mrl_lowers_to_take_ordered(spark, sf_dir):
    """Both stages (shortlist and final top-k) plan as
    TakeOrderedAndProject — no global sort of the corpus."""
    plan = _plan(dq.mrl_prefix_rerank(spark, sf_dir))
    assert "TakeOrderedAndProject" in plan
    assert "Sort [" not in plan or "global=true" not in plan.split("Sort [")[1][:200]


def test_gapfill_spine_is_generated_not_joined_cartesian(spark, sf_dir):
    plan = _plan(dq.gapfill_user_daily(spark, sf_dir))
    assert "CartesianProduct" not in plan
    assert "Generate explode" in plan or "Generate" in plan


def test_ewma_taps_share_one_window_exchange(spark, sf_dir):
    """All 16 lag taps + the current row fold into ONE Window operator
    over one user_id exchange — the operator's shuffle-cost claim."""
    plan = _plan(dq.ewma_user_daily(spark, sf_dir))
    import re

    windows = plan.count("Window")
    assert windows <= 2, f"expected one logical Window stage, saw {windows}"


def test_kmv_two_pass_bounds_window_partitions(spark, sf_dir):
    """Both ranking passes are PARTITIONED windows (grp+salt, then
    grp) — no empty-partition global window anywhere."""
    plan = _plan(dq.kmv_distinct_users_by_type(spark, sf_dir))
    assert "windowspecdefinition()" not in plan.replace(" ", "")


def test_cms_sketch_is_single_scan(spark, sf_dir):
    """The CMS build reads events ONCE (explode over the depth
    coordinates), never depth separate scans."""
    from vector_db_handler_spark.operators.sketches import cms_build
    from vector_db_handler_spark.sources.tables import load_table

    plan = _plan(cms_build(load_table(spark, sf_dir, "events"), "user_id"))
    # formatted plans repeat each node in the detail section — count
    # distinct scan locations, not tree lines
    assert plan.count("Location: InMemoryFileIndex") == 1
    assert "explode(array(struct" in plan


def test_pagerank_iteration_joins_are_hash_joins(spark, sf_dir):
    plan = _plan(dq.pagerank_part_supplier(spark, sf_dir))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_basket_lift_joins_on_basket_key(spark, sf_dir):
    """The pair join is an equi-join on the basket id; supports join
    back by broadcast (item vocabulary is dim-sized)."""
    plan = _plan(dq.basket_part_lift(spark, sf_dir))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_sequence_funnel_single_exchange(spark, sf_dir):
    """The whole step cascade must plan ONE hash exchange (all windows
    share the (user, order) spec) — chain length adds expressions,
    never shuffles."""
    from vector_db_handler_spark.operators.windows import sequence_funnel
    from vector_db_handler_spark.sources.tables import load_table

    ev = load_table(spark, sf_dir, "events")
    plan = (
        sequence_funnel(
            ev, ["view", "click", "purchase"], span_us=3_600_000_000
        )
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("Exchange hashpartitioning") == 1, plan[:1500]

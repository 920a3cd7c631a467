"""Empty-input and degenerate-edge robustness for the round-11
staged operators: every family must degrade to an empty (or
well-defined degenerate) relation on empty/null input, never crash —
the same sweep discipline as test_empty_corpus / test_null_edge_*."""

from __future__ import annotations

from pyspark.sql import functions as F


def _empty_docs(spark):
    return spark.createDataFrame([], "doc_id long, text string")


def _empty_media(spark):
    return spark.createDataFrame([], "media_id long, media binary")


def test_hll_empty_and_all_null_inputs(spark):
    from vector_db_handler_spark.operators.hll import (
        hll_distinct_by_key,
        hll_registers,
    )

    empty = spark.createDataFrame([], "k string, v long")
    assert hll_registers(empty, "k", "v").count() == 0
    assert hll_distinct_by_key(empty, "k", "v").count() == 0
    nulls = spark.createDataFrame(
        [(None, 1), ("a", None)], "k string, v long"
    )
    assert hll_distinct_by_key(nulls, "k", "v").count() == 0


def test_streaming_hll_empty_stream_leaves_no_store(spark, tmp_path):
    from vector_db_handler_spark.streaming.stream_ops import (
        hll_store_read,
        streaming_hll_registers,
    )

    src = str(tmp_path / "src")
    spark.createDataFrame(
        [], "event_id long, event_type string, user_id long"
    ).coalesce(1).write.parquet(src)
    stream = spark.readStream.schema(
        "event_id long, event_type string, user_id long"
    ).parquet(src)
    streaming_hll_registers(
        stream, str(tmp_path / "out"), str(tmp_path / "cp")
    )
    assert hll_store_read(spark, str(tmp_path / "out")) is None


def test_token_entropy_empty_corpus(spark):
    from vector_db_handler_spark.operators.features import token_entropy

    assert token_entropy(_empty_docs(spark)).count() == 0


def test_ind_on_empty_relations(spark):
    from vector_db_handler_spark.operators.profile import (
        inclusion_dependencies,
    )

    empty = spark.createDataFrame([], "v long")
    one = spark.createDataFrame([(1,)], "v long")
    rows = {
        (r["child_table"], r["parent_table"]): r
        for r in inclusion_dependencies(
            {"e": empty, "o": one},
            [("e", "v", "o", "v"), ("o", "v", "e", "v")],
        ).collect()
    }
    # empty child: vacuously holds (0/0 handled as count rows = 0)
    ec = rows[("e", "o")]
    assert (ec["n_child_distinct"], ec["n_contained"], ec["holds"]) == (0, 0, True)
    assert ec["containment"] is None  # 0/0 — SQL division convention
    oc = rows[("o", "e")]
    assert (oc["n_child_distinct"], oc["n_contained"], oc["holds"]) == (1, 0, False)


def test_nb_calibration_empty_and_single_label(spark):
    from vector_db_handler_spark.operators.nb_classifier import (
        nb_margin_calibration,
    )

    assert nb_margin_calibration(_empty_docs(spark).withColumn(
        "lang", F.lit(None).cast("string")
    )).count() == 0
    one_label = spark.createDataFrame(
        [(i, "aa", "x y") for i in range(1, 11)],
        "doc_id long, lang string, text string",
    )
    rows = nb_margin_calibration(one_label).collect()
    # single label: every margin is 0 (no runner-up) -> one bucket, all correct
    assert len(rows) == 1
    r = rows[0]
    assert (r["margin_bucket"], r["n_correct"] == r["n_docs"]) == (0, True)


def test_rendezvous_empty_ids_and_single_shard(spark):
    from vector_db_handler_spark.operators.layout import (
        rendezvous_assign,
        rendezvous_rebalance_report,
    )

    empty = spark.createDataFrame([], "doc_id long")
    assert rendezvous_assign(empty, ["a"]).count() == 0
    assert rendezvous_rebalance_report(empty, ["a"], ["a", "b"]).count() == 0
    one = spark.createDataFrame([(7,)], "doc_id long")
    r = rendezvous_assign(one, ["only"]).collect()[0]
    assert r["shard"] == "only"


def test_dsir_empty_target_and_empty_corpus(spark):
    from vector_db_handler_spark.operators.lm_score import dsir_importance

    docs = spark.createDataFrame(
        [(1, "a b c")], "doc_id long, text string"
    )
    assert dsir_importance(_empty_docs(spark), docs).count() == 0
    # empty TARGET model: target credit 0 everywhere, weights <= 0
    out = dsir_importance(docs, _empty_docs(spark)).collect()
    assert len(out) == 1 and out[0]["target_milli"] == 0
    assert out[0]["weight_milli"] <= 0


def test_cdc_empty_corpus_and_tiny_blobs(spark):
    from vector_db_handler_spark.operators.dedup import (
        cdc_containment_pairs,
        gear_cdc_chunks,
    )

    assert gear_cdc_chunks(_empty_media(spark)).count() == 0
    assert cdc_containment_pairs(_empty_media(spark)).count() == 0
    tiny = spark.createDataFrame(
        [(1, b"a"), (2, b"ab")], "media_id long, media binary"
    )
    rows = gear_cdc_chunks(tiny, mask_bits=6).collect()
    # every blob is fully covered even when shorter than the window
    got = {}
    for r in rows:
        got[r["media_id"]] = got.get(r["media_id"], 0) + r["chunk_len"]
    assert got == {1: 1, 2: 2}

"""Streaming NB classification serve: batch=stream prediction
equivalence by construction, and exactly-once sink semantics across a
re-run.  Staged for r11 driver registration alongside the batch
classifier."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from vector_db_handler_spark.functions import text as text_fns
from vector_db_handler_spark.operators.nb_classifier import (
    nb_classify,
    nb_train,
)
from vector_db_handler_spark.streaming.stream_ops import streaming_nb_classify


def _setup(spark, sf_dir, tmp_path):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").withColumn(
        "rule_lang", text_fns.lang_id(F.col("text"))
    )
    train = docs.filter(F.col("doc_id") % 5 != 0)
    model, priors = nb_train(train, label_col="rule_lang")
    # Materialize the model: foreachBatch re-evaluates its captured
    # plans per micro-batch, and the model must be a stable relation,
    # not a recomputation (the same reason the batch path would cache).
    model = model.localCheckpoint(eager=True)
    priors = priors.localCheckpoint(eager=True)
    stream = (
        spark.readStream.schema(
            spark.read.parquet(f"{sf_dir}/documents.parquet").schema
        )
        .option("pathGlobFilter", "documents.parquet")
        .parquet(sf_dir)
        .filter(F.col("doc_id") % 5 == 0)
    )
    out = os.path.join(str(tmp_path), "out")
    cp = os.path.join(str(tmp_path), "cp")
    return docs, model, priors, stream, out, cp


def test_stream_predictions_equal_batch(spark, sf_dir, tmp_path):
    docs, model, priors, stream, out, cp = _setup(spark, sf_dir, tmp_path)
    streaming_nb_classify(stream, model, priors, out, cp)
    got = {
        r["doc_id"]: (r["predicted"], r["score"], r["margin"])
        for r in spark.read.parquet(out).collect()
    }
    want = {
        r["doc_id"]: (r["predicted"], r["score"], r["margin"])
        for r in nb_classify(
            docs.filter(F.col("doc_id") % 5 == 0), model, priors
        ).collect()
    }
    assert got == want and len(got) > 0


def test_rerun_is_exactly_once(spark, sf_dir, tmp_path):
    docs, model, priors, stream, out, cp = _setup(spark, sf_dir, tmp_path)
    streaming_nb_classify(stream, model, priors, out, cp)
    n1 = spark.read.parquet(out).count()
    # identical re-run: the checkpoint marks every batch done — the
    # sink must not grow
    streaming_nb_classify(stream, model, priors, out, cp)
    assert spark.read.parquet(out).count() == n1

"""Data-quality constraint suite: verdict semantics, null handling,
and the one-scan plan contract."""

from __future__ import annotations

import pytest

from vector_db_handler_spark.operators import dq


def _report(spark, rows, schema, checks):
    df = spark.createDataFrame(rows, schema)
    out = dq.dq_check(df, checks).collect()
    return {(r.check, r.col): r for r in out}, out


def test_verdicts_and_metrics(spark):
    rows = [
        (1, "a", 5.0),
        (2, "b", 50.0),
        (3, "a", -1.0),   # bounds violation
        (4, None, 10.0),  # null label: ignored by domain/uniqueness
        (4, "c", 10.0),   # duplicate id + out-of-domain label
    ]
    got, out = _report(
        spark,
        rows,
        "id long, label string, v double",
        [
            dq.completeness("label"),            # 4/5 non-null -> fail at 1/1
            dq.completeness("label", 3, 5),      # 4/5 >= 3/5 -> pass
            dq.uniqueness("id"),                 # 4 distinct / 5 -> fail
            dq.uniqueness("label"),              # a,b,c distinct=3, count=4 -> fail
            dq.accepted_values("label", ["a", "b"]),  # 'c' violates (null ignored)
            dq.bounds("v", 0.0, 100.0),          # -1.0 violates
            dq.row_count_between(5, 5),          # pass
        ],
    )
    assert len(out) == 7
    # rows come back in constraint order; the two completeness rows
    # share a (check, col) key and differ only by threshold
    strict, loose = out[0], out[1]
    assert (strict.metric_num, strict.metric_den, strict.passed) == (4, 5, False)
    assert (loose.metric_num, loose.metric_den, loose.passed) == (4, 5, True)
    assert got[("uniqueness", "id")].passed is False
    assert got[("uniqueness", "id")].metric_num == 4
    assert got[("uniqueness", "label")].metric_num == 3
    av = got[("accepted_values", "label")]
    assert (av.metric_num, av.passed) == (1, False)
    bd = got[("bounds", "v")]
    assert (bd.metric_num, bd.passed) == (1, False)
    assert got[("row_count", "*")].passed is True


def test_all_null_column_and_empty_relation(spark):
    got, _ = _report(
        spark,
        [(None,), (None,)],
        "x string",
        [dq.completeness("x"), dq.uniqueness("x"),
         dq.accepted_values("x", ["a"]), dq.row_count_between(0, 10)],
    )
    assert got[("completeness", "x")].metric_num == 0
    # vacuous truths: no non-null values -> unique and in-domain
    assert got[("uniqueness", "x")].passed is True
    assert got[("accepted_values", "x")].passed is True

    empty = _report(
        spark, [], "x string",
        [dq.completeness("x", 1, 2), dq.bounds("x", "a", "b"),
         dq.row_count_between(1, 10)],
    )[0]
    assert empty[("completeness", "x")].passed is True  # 0*2 >= 1*0
    assert empty[("bounds", "x")].metric_num == 0
    assert empty[("row_count", "*")].passed is False


def test_rejects_empty_and_unknown(spark):
    df = spark.createDataFrame([(1,)], "x long")
    with pytest.raises(ValueError):
        dq.dq_check(df, [])
    with pytest.raises(ValueError):
        dq.dq_check(df, [{"check": "nope", "col": "x"}])


def test_report_is_one_scan(spark, sf_dir):
    from vector_db_handler_spark.sources.tables import load_table

    ev = load_table(spark, sf_dir, "events")
    plan = (
        dq.dq_check(
            ev,
            [
                dq.completeness("value"),
                dq.uniqueness("event_id"),
                dq.accepted_values("event_type", ["click"]),
                dq.bounds("value", 0.0, 300.0),
                dq.row_count_between(1, 10**9),
            ],
        )
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("FileScan") == 1, plan[:800]


def test_streaming_dq_monitor_logs_per_batch_and_replays_idempotently(
    spark, tmp_path
):
    """Two micro-batches produce two tagged verdict sets (the second
    batch violates the bound); a full replay from a fresh checkpoint
    overwrites rather than duplicates."""
    from pyspark.sql import functions as F

    from vector_db_handler_spark.streaming.stream_ops import streaming_dq_monitor

    src = str(tmp_path / "dqsrc")
    import time

    for lo, hi, bad in ((0, 50, False), (50, 80, True)):
        df = spark.range(lo, hi).select(
            F.col("id"),
            (F.lit(500.0) if bad else F.lit(5.0)).alias("v"),
        )
        df.coalesce(1).write.mode("append").parquet(src)
        time.sleep(1.1)

    checks = [dq.bounds("v", 0.0, 100.0), dq.row_count_between(1, 1000)]
    log = str(tmp_path / "dqlog")

    def run(cp):
        streaming_dq_monitor(
            spark.readStream.schema("id long, v double")
            .option("maxFilesPerTrigger", 1)
            .parquet(src),
            checks,
            log,
            cp,
        )

    run(str(tmp_path / "cp1"))
    rep = spark.read.parquet(log)
    got = {
        (r.batch_id, r.check): r.passed for r in rep.collect()
    }
    assert got[(0, "bounds")] is True
    assert got[(1, "bounds")] is False     # the bad batch flagged
    assert got[(0, "row_count")] is True
    assert rep.count() == 4  # 2 checks × 2 batches

    run(str(tmp_path / "cp2"))  # full replay: overwrite, no duplication
    assert spark.read.parquet(log).count() == 4

"""Fixture-vintage regression: the events table's physical ``ts`` type
has changed under the repo once already (TIMESTAMP(NANOS) in rounds 1-3,
``timestamp[us]`` from round 4's refresh), silently breaking every
events reader.  Pin the invariant: ``load_table`` and ``stream_events``
must produce identical rows from BOTH encodings.
"""

from __future__ import annotations

import datetime

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from vector_db_handler_spark.sources.tables import load_table
from vector_db_handler_spark.streaming.stream_ops import stream_events

# Epoch-micros covering sub-second precision and an exact-second value.
_MICROS = [1704067798778549, 1704068166738090, 1704068217000000]


def _write_events(path: str, ts_type: pa.DataType) -> None:
    unit_scale = {"ns": 1000, "us": 1}[ts_type.unit]
    ts = pa.array([m * unit_scale for m in _MICROS], pa.int64()).cast(ts_type)
    table = pa.table(
        {
            "event_id": pa.array([0, 1, 2], pa.int64()),
            "ts": ts,
            "user_id": pa.array([10, 11, 12], pa.int64()),
            "event_type": pa.array(["view", "purchase", "error"]),
            "value": pa.array([1.5, 2.5, 3.5], pa.float64()),
            "props": pa.array(['{"k": 1}', '{"k": 2}', '{"k": 3}']),
        }
    )
    pq.write_table(table, path)


@pytest.fixture(scope="module")
def vintage_dirs(tmp_path_factory):
    """Two single-file fixture dirs, one per encoding vintage."""
    dirs = {}
    for label, ts_type in (
        ("nanos", pa.timestamp("ns")),
        ("micros", pa.timestamp("us")),
    ):
        d = tmp_path_factory.mktemp(f"vintage_{label}")
        _write_events(str(d / "events.parquet"), ts_type)
        dirs[label] = str(d)
    return dirs


def _expected_rows():
    return [
        datetime.datetime(1970, 1, 1) + datetime.timedelta(microseconds=m)
        for m in _MICROS
    ]


def test_load_table_both_vintages(spark, vintage_dirs):
    rows = {}
    for label, d in vintage_dirs.items():
        df = load_table(spark, d, "events")
        assert df.schema["ts"].dataType.typeName() == "timestamp", label
        rows[label] = sorted(
            (r.event_id, r.ts) for r in df.select("event_id", "ts").collect()
        )
    assert rows["nanos"] == rows["micros"]
    got_us = [
        r[0]
        for r in load_table(spark, vintage_dirs["micros"], "events")
        .selectExpr("unix_micros(ts)")
        .collect()
    ]
    assert sorted(got_us) == sorted(_MICROS)


def test_stream_events_both_vintages(spark, vintage_dirs, tmp_path):
    rows = {}
    for label, d in vintage_dirs.items():
        sdf = stream_events(spark, d)
        q = (
            sdf.writeStream.format("memory")
            .queryName(f"vintage_{label}")
            .option("checkpointLocation", str(tmp_path / f"ckpt_{label}"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        out = spark.sql(f"SELECT event_id, ts FROM vintage_{label}")
        rows[label] = sorted((r.event_id, r.ts) for r in out.collect())
    assert rows["nanos"] == rows["micros"]
    assert [r[1] for r in rows["micros"]] == _expected_rows()

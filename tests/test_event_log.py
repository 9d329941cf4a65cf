"""Ingestion-path tests: offset assignment, schema-validated JSON
codec round-trip, partitioned log write/read, paced replay order."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from play_with_pulsar_spark.operators.replay import paced_replay
from play_with_pulsar_spark.sources import event_log as el
from play_with_pulsar_spark.sources.fixtures import game_event_log


@pytest.fixture(scope="module")
def log(spark):
    df = game_event_log(spark, n_rooms=2, events_per_room=400, seed=42).cache()
    yield df
    df.unpersist()


def test_offset_assignment_gapless(spark, log):
    batch = log.drop("offset")
    assigned = el.assign_offsets(batch, order_cols=("ts",))
    per_room = (
        assigned.groupBy("room")
        .agg(F.min("offset").alias("lo"), F.max("offset").alias("hi"),
             F.count(F.lit(1)).alias("n"), F.countDistinct("offset").alias("d"))
        .collect()
    )
    for r in per_room:
        assert r.lo == 0 and r.hi == r.n - 1 and r.d == r.n


def test_offset_append_resumes_from_base(spark, log):
    first = log.filter(F.col("offset") < 100).drop("offset")
    second = log.filter((F.col("offset") >= 100) & (F.col("offset") < 150)).drop("offset")
    base = el.assign_offsets(first, order_cols=("ts",))
    appended = el.assign_offsets(second, base_offsets=el.current_offsets(base), order_cols=("ts",))
    lo = appended.groupBy("room").agg(F.min("offset").alias("lo")).collect()
    assert all(r.lo == 100 for r in lo)


def test_wire_codec_roundtrip(spark, log):
    wire = el.to_wire(log)
    assert "payload" in wire.columns and "type" not in wire.columns
    back = el.parse_envelope(wire)
    orig = log.select("room", "offset", "type", "name", "x", "y").orderBy("room", "offset")
    rt = back.select("room", "offset", "type", "name", "x", "y").orderBy("room", "offset")
    assert orig.collect() == rt.collect()


def test_parse_envelope_failfast_rejects_garbage(spark):
    bad = spark.createDataFrame([(1, '{"type": "UserMoveEvent", "x": "NOT_AN_INT"}',)],
                                "id long, payload string")
    with pytest.raises(Exception):
        el.parse_envelope(bad, mode="FAILFAST").collect()
    # PERMISSIVE quarantines instead
    rows = el.parse_envelope(bad, mode="PERMISSIVE").collect()
    assert len(rows) == 1


def test_partitioned_log_roundtrip(spark, log, tmp_path):
    path = str(tmp_path / "log")
    el.write_event_log(log, path, mode="overwrite")
    back = el.read_event_log(spark, path)
    assert back.count() == log.count()
    # partition pruning: a room filter must scan only that directory
    from play_with_pulsar_spark import plans

    one = back.filter(F.col("room") == "room-0000")
    assert "room-0000" in plans.formatted_plan(one) or one.count() == 400


def test_paced_replay_order(spark, log):
    offsets = [r.offset for r in paced_replay(log, "room-0001", pace_ms=0)]
    assert offsets == sorted(offsets) and len(offsets) == 400

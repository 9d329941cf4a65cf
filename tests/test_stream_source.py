"""Source-abstraction seam: swapping parquet-dir ↔ Kafka ↔ Pulsar is
config, not code. The files kind runs end-to-end; the Kafka/Pulsar
normalize transforms are exercised on static DataFrames with the
connector's public wire schema (the jars are not in this container)."""

from __future__ import annotations

from datetime import datetime

import pandas as pd
from pyspark.sql import functions as F

from play_with_pulsar_spark.schema import GAME_EVENT_SCHEMA
from play_with_pulsar_spark.sources import stream_source as ss
from play_with_pulsar_spark.sources.event_log import to_wire
from play_with_pulsar_spark.streaming.pipeline import run_to_completion


def _events(spark):
    base = datetime(2024, 3, 1)
    rows = [
        dict(offset=i, room="alpha", ts=base, type="UserDeadEvent",
             name=f"p{i}", avatar="f", comment="killer", x=1, y=1,
             alive=False, list=None)
        for i in range(4)
    ]
    return spark.createDataFrame(pd.DataFrame(rows), GAME_EVENT_SCHEMA)


def test_files_seam_end_to_end(spark, tmp_path):
    log = tmp_path / "log"
    _events(spark).coalesce(1).write.parquet(str(log / "b0"))
    stream = ss.read_stream(spark, {"kind": "files", "path": str(log / "b*")})
    assert stream.isStreaming
    counts = stream.filter(F.col("type") == "UserDeadEvent").groupBy("room").count()
    out = run_to_completion(counts, "seam_counts", "complete").collect()
    assert [(r.room, r["count"]) for r in out] == [("alpha", 4)]


def test_kafka_normalize_round_trip(spark):
    """Engine events → wire JSON on the Kafka source schema →
    normalize_kafka == the original events (room from topic name,
    offset from kafka offset, FAILFAST decode)."""
    ev = _events(spark)
    wire = to_wire(ev)  # keeps room/offset/ts + JSON payload
    kafka_like = wire.select(
        F.lit(None).cast("binary").alias("key"),
        F.col("payload").cast("binary").alias("value"),
        F.concat(F.col("room"), F.lit("-event-topic")).alias("topic"),
        F.lit(0).alias("partition"),
        F.col("offset"),
        F.col("ts").alias("timestamp"),
        F.lit(0).alias("timestampType"),
    )
    got = ss.normalize_kafka(kafka_like)
    assert [f.name for f in got.schema.fields] == [f.name for f in GAME_EVENT_SCHEMA.fields]
    want = {(r.room, r.offset, r.type, r.name) for r in ev.collect()}
    have = {(r.room, r.offset, r.type, r.name) for r in got.collect()}
    assert want == have


def test_kafka_option_mapping():
    # single room topic (pulsar.go:90-92,133-141)
    opts = ss.kafka_reader_options({"room": "alpha", "starting": "earliest"})
    assert opts["subscribe"] == "alpha-event-topic"
    assert opts["startingOffsets"] == "earliest"
    # regex-all-rooms (ScoreboardFunction.java:82-87) + backpressure (T7)
    opts = ss.kafka_reader_options({"max_per_trigger": 5000})
    assert opts["subscribePattern"] == ".*-event-topic"
    assert opts["startingOffsets"] == "latest"
    assert opts["maxOffsetsPerTrigger"] == "5000"


def test_pulsar_option_mapping():
    opts = ss.pulsar_reader_options({"room": "beta"})
    assert opts["topic"] == "beta-event-topic"
    opts = ss.pulsar_reader_options({})
    assert opts["topicsPattern"] == ".*-event-topic"

"""Streaming event-time windows == batch equivalents over the same
data (T8): tumbling agg and session windows."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampNTZType,
)

from play_with_pulsar_spark.operators.relational import sessionize
from play_with_pulsar_spark.oracle import dsum
from play_with_pulsar_spark.sources.tables import load_table
from play_with_pulsar_spark.streaming.pipeline import run_to_completion

RAW_SCHEMA = StructType(
    [
        StructField("event_id", LongType()),
        # driver fixture carries timestamp[us] without timezone
        # (TIMESTAMP_NTZ in Spark 4); cast to the session timestamp
        # below, mirroring sources/tables.py::load_table
        StructField("ts", TimestampNTZType()),
        StructField("user_id", LongType()),
        StructField("event_type", StringType()),
        StructField("value", DoubleType()),
        StructField("props", StringType()),
    ]
)


@pytest.fixture()
def events_stream(spark, sf_dir, tmp_path):
    # file streaming source needs a DIRECTORY; stage the fixture file
    import os

    os.symlink(f"{sf_dir}/events.parquet", tmp_path / "events.parquet")
    raw = spark.readStream.schema(RAW_SCHEMA).parquet(str(tmp_path))
    return raw.withColumn("ts", F.col("ts").cast("timestamp"))


def test_streaming_tumbling_window_matches_batch(spark, sf_dir, events_stream):
    agg = (
        events_stream.withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"), dsum("value").alias("v"))
        .select(F.col("w.start").alias("ws"), "event_type", "n", "v")
    )
    out = run_to_completion(agg, "stream_tumble", "complete")
    got = {(r.ws, r.event_type): (r.n, r.v) for r in out.collect()}
    ev = load_table(spark, sf_dir, "events")
    want = {
        (r.ws, r.event_type): (r.n, r.v)
        for r in (
            ev.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
            .agg(F.count(F.lit(1)).alias("n"), dsum("value").alias("v"))
            .select(F.col("w.start").alias("ws"), "event_type", "n", "v")
        ).collect()
    }
    assert got == want


def test_streaming_session_window_matches_batch_sessionize(spark, sf_dir, events_stream):
    sw = (
        events_stream.withWatermark("ts", "2 hours")
        .groupBy(F.session_window("ts", "30 minutes").alias("w"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select("user_id", F.col("w.start").alias("session_start"), "n_events")
    )
    out = run_to_completion(sw, "stream_sessions", "complete")
    got = {(r.user_id, r.session_start, r.n_events) for r in out.collect()}
    want = {
        (r.user_id, r.session_start, r.n_events)
        for r in sessionize(load_table(spark, sf_dir, "events"), gap_seconds=1800).collect()
    }
    assert got == want

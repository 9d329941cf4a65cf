"""Bucketed co-located join: zero exchanges in the plan, identical
results to the shuffled join."""

from __future__ import annotations

from pyspark.sql import functions as F

from play_with_pulsar_spark import plans
from play_with_pulsar_spark.operators import bucketing
from play_with_pulsar_spark.sources.tables import load_table


def test_bucketed_join_has_no_exchange(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    bucketing.write_bucketed(li, "li_bucketed", ["l_orderkey"], n_buckets=8)
    bucketing.write_bucketed(o, "o_bucketed", ["o_orderkey"], n_buckets=8)

    # force sort-merge so the exchange-elision is what we measure
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = bucketing.bucketed_join(spark, "li_bucketed", "o_bucketed",
                                    "l_orderkey", "o_orderkey")
        assert plans.count_shuffles(j) == 0, plans.formatted_plan(j)

        # and the result matches the plain (shuffling) join
        plain = li.join(o, li.l_orderkey == o.o_orderkey)
        assert j.count() == plain.count()
        got = j.agg(F.sum("l_quantity").cast("long").alias("s")).collect()[0].s
        want = plain.agg(F.sum("l_quantity").cast("long").alias("s")).collect()[0].s
        assert got == want
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        spark.sql("DROP TABLE IF EXISTS li_bucketed")
        spark.sql("DROP TABLE IF EXISTS o_bucketed")


def test_bucketed_event_log_replay_has_no_exchange(spark, tmp_path):
    """replay_state (the groupBy(room).applyInPandas form) over a
    room-bucketed catalog event log plans ZERO exchanges — the scan's
    bucketing satisfies FlatMapGroupsInPandas' ClusteredDistribution —
    and folds the same state as the shuffled replay over the raw
    frame."""
    from play_with_pulsar_spark.operators import replay
    from play_with_pulsar_spark.sources.event_log import (
        write_event_log_bucketed,
    )
    from play_with_pulsar_spark.sources.fixtures import game_event_log

    log = game_event_log(spark, n_rooms=6, events_per_room=400, seed=11)
    write_event_log_bucketed(
        log, "ev_bucketed_test", n_buckets=6, path=str(tmp_path / "evb")
    )
    try:
        df = spark.table("ev_bucketed_test")
        state = replay.replay_state(df)
        assert plans.count_shuffles(state) == 0, plans.formatted_plan(state)
        # bucketed scan really is the source (not a fresh shuffle)
        assert "Bucketed: true" in plans.formatted_plan(state)

        key = ["room", "entity", "name", "owner", "x", "y", "alive",
               "destructible"]
        got = sorted(map(tuple, state.select(*key).collect()))
        want = sorted(map(tuple, replay.replay_state(log).select(*key).collect()))
        assert got == want
    finally:
        spark.sql("DROP TABLE IF EXISTS ev_bucketed_test")

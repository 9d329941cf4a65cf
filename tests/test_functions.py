"""X-series column-function tests + changelog/direct-aggregation
consistency."""

from __future__ import annotations

from pyspark.sql import functions as F

from play_with_pulsar_spark.functions import encoding as X
from play_with_pulsar_spark.queries import REGISTRY


def test_position_codec_roundtrip(spark):
    df = spark.range(750).select(
        F.pmod(F.col("id"), 30).cast("int").alias("x"),
        F.floor(F.col("id") / 30).cast("int").alias("y"),
    )
    out = df.select(
        "x", "y", X.encode_xy(F.col("x"), F.col("y")).alias("code")
    ).select("x", "y", X.decode_x(F.col("code")).alias("x2"), X.decode_y(F.col("code")).alias("y2"))
    bad = out.filter((F.col("x") != F.col("x2")) | (F.col("y") != F.col("y2"))).count()
    assert bad == 0


def test_obstacle_sign_codec_roundtrip(spark):
    df = spark.createDataFrame(
        [([3, -45, 200, -749],)], "lst array<int>"
    ).select(X.decode_obstacle_list(F.col("lst")).alias("d"))
    back = df.select(X.encode_obstacle_list(F.col("d")).alias("lst2")).collect()[0]
    assert list(back.lst2) == [3, -45, 200, -749]


def test_bomb_owner_and_random(spark):
    df = spark.createDataFrame(
        [("alice-xYzAb",), ("random-qqqqq",), ("bob-abc-extra",)], "name string"
    )
    rows = df.select(
        X.bomb_owner(F.col("name")).alias("owner"),
        X.is_random_bomb(F.col("name")).alias("rnd"),
    ).collect()
    assert [(r.owner, r.rnd) for r in rows] == [
        ("alice", False), ("random", True), ("bob", False),
    ]


def test_topic_codecs(spark):
    df = spark.createDataFrame([("room-7",)], "room string")
    r = df.select(
        X.event_topic(F.col("room")).alias("et"),
        X.score_topic(F.col("room")).alias("st"),
    ).collect()[0]
    assert (r.et, r.st) == ("room-7-event-topic", "room-7-score-topic")
    back = spark.createDataFrame([(r.et,)], "t string").select(
        X.room_from_topic(F.col("t")).alias("room")
    ).collect()[0]
    assert back.room == "room-7"


def test_next_position_clamps_at_border(spark):
    df = spark.createDataFrame(
        [(0, 0, "left"), (29, 24, "right"), (5, 0, "up"), (5, 24, "down"), (5, 5, "right")],
        "x int, y int, dir string",
    )
    rows = df.select(
        X.next_x(F.col("x"), F.col("dir")).alias("nx"),
        X.next_y(F.col("y"), F.col("dir")).alias("ny"),
    ).collect()
    # utils.go:35-59: invalid step keeps the original position
    assert [(r.nx, r.ny) for r in rows] == [(0, 0), (29, 24), (5, 0), (5, 24), (6, 5)]


def test_flame_cells_footprint(spark):
    df = spark.createDataFrame([(10, 10)], "x int, y int")
    cells = df.select(X.flame_cells(F.col("x"), F.col("y"), 6).alias("c")).collect()[0].c
    pts = {(s.x, s.y) for s in cells}
    assert (4, 10) in pts and (16, 10) in pts and (10, 4) in pts and (10, 16) in pts
    assert (3, 10) not in pts and (10, 10) in pts
    assert len(pts) == 25  # 13 horizontal + 13 vertical - shared center


def test_changelog_consistent_with_direct_aggregation(spark):
    # the score-changelog fixture folded to latest-per-key must equal
    # the direct kill_counts aggregation over the event log — the two
    # reference pipelines (Function+TableView vs batch query) agree
    sf = "/root/testdata/sf0.01"
    direct = {
        (r.player, r.total): None
        for r in REGISTRY["game_a4a5_global_rank"].fn(spark, sf).collect()
    }
    via_chg = {
        (r.player, r.total): None
        for r in REGISTRY["chg_a4_global_sum"].fn(spark, sf).collect()
    }
    assert set(direct) == set(via_chg)


def test_register_query_views_sql_surface(spark):
    """SQL-only users can query and JOIN declared-query results as
    temp views — the catalog surface over the DataFrame registry."""
    from play_with_pulsar_spark import queries as Q

    names = Q.register_query_views(
        spark, "/root/testdata/sf0.01",
        names=["game_a1_room_scoreboard", "game_a4a5_global_rank"],
    )
    assert names == ["game_a1_room_scoreboard", "game_a4a5_global_rank"]
    got = spark.sql("""
        SELECT r.room, r.killer, r.kills, g.total
        FROM game_a1_room_scoreboard r
        JOIN game_a4a5_global_rank g ON r.killer = g.player
        ORDER BY r.room, r.killer
    """).collect()
    assert len(got) > 0
    # per-room kills never exceed the same player's global total
    assert all(r.kills <= r.total for r in got)

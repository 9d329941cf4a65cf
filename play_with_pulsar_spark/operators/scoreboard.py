"""Scoreboard operators — the reference's production query family.

A1 (kills per (room, killer)) reproduces the Pulsar Function at
reference function-code/.../ScoreboardFunction.java:18-58: filter the
event-type tag (:21), drop self-kills (:22-27), count per
(room, killer) (:41-45). A4/A5 reproduce the cross-room global
scoreboard + ranking (docs/en/game7-connector.md:9-15,76-80;
docs/en/game1-introduce.md:53).

Scale notes:
- ``kill_counts`` is filter → partial agg → final agg: the filters are
  pushed to the parquet scan, the count is map-side combined, and the
  only shuffle is on (room, killer) — the minimal plan for this query
  at any scale. No window functions, no sort.
- ``global_scoreboard`` is a second, strictly smaller aggregation over
  the first one's output (two-level agg per SURVEY §2.3 A4): the
  re-shuffle moves one row per (room, player), not one per event.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def kill_counts(
    events: DataFrame,
    *,
    room_col: str = "room",
    type_col: str = "type",
    victim_col: str = "name",
    killer_col: str = "comment",
    dead_type: str = "UserDeadEvent",
) -> DataFrame:
    """A1: kill count per (room, killer) — streaming/batch agnostic.

    Mirrors ScoreboardFunction.java:18-58 (P1 type filter, P2
    self-kill filter, A1 grouped count).
    """
    return (
        events.filter(F.col(type_col) == dead_type)  # P1
        .filter(F.col(victim_col) != F.col(killer_col))  # P2 (col-vs-col)
        .groupBy(F.col(room_col).alias("room"), F.col(killer_col).alias("killer"))
        .agg(F.count("*").alias("kills"))  # A1
    )


def global_scoreboard(room_scores: DataFrame, *, player_col: str = "killer",
                      score_col: str = "kills") -> DataFrame:
    """A4: per-player total across all rooms (two-level aggregation).

    The reference does this with a Redis key-scan + Lua ``tonumber``
    sum (docs/en/game7-connector.md:76-80); here it is a second
    groupBy over the per-room scoreboard.
    """
    return (
        room_scores.groupBy(F.col(player_col).alias("player"))
        .agg(F.sum(score_col).alias("total"))
    )


def ranked_scoreboard(global_scores: DataFrame, *, total_col: str = "total") -> DataFrame:
    """A5/W3: rank all players by total score (requirement 5,
    docs/en/game1-introduce.md:53).

    Note: a global rank needs a total order; Spark computes it with a
    single-partition window over the (tiny) aggregated result, never
    over raw events.
    """
    w = Window.orderBy(F.col(total_col).desc())
    return global_scores.withColumn("rnk", F.rank().over(w))

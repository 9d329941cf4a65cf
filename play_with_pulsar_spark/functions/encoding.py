"""X-series scalar functions (SURVEY §2.7) as pure column expressions.

Every scalar the reference implements imperatively becomes a JVM-side
column expression — codegen-compatible, usable in any query. Citations
point at the reference implementation each expression reproduces.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from ..schema import GRID_H, GRID_W


# --- X1: bijective position codec (utils.go:87-93) ---

def encode_xy(x: Column, y: Column) -> Column:
    return y * F.lit(GRID_W) + x


def decode_x(code: Column) -> Column:
    return F.pmod(code, F.lit(GRID_W)).cast("int")


def decode_y(code: Column) -> Column:
    return F.floor(code / F.lit(GRID_W)).cast("int")


# --- X2: sign-encoded obstacle type (event.go:227-263) ---

def obstacle_destructible(code: Column) -> Column:
    return code < 0


def obstacle_cell(code: Column) -> Column:
    return F.abs(code)


def encode_obstacle(code: Column, destructible: Column) -> Column:
    return F.when(destructible, -code).otherwise(code)


# --- X3/X4: obstacle list ↔ decoded cells (explode happens at the
# DataFrame level; these are the per-element decoders) ---

def decode_obstacle_list(lst: Column) -> Column:
    """array<int> → array<struct<x,y,destructible>> (X3,
    event.go:227-251)."""
    return F.transform(
        lst,
        lambda c: F.struct(
            decode_x(obstacle_cell(c)).alias("x"),
            decode_y(obstacle_cell(c)).alias("y"),
            obstacle_destructible(c).alias("destructible"),
        ),
    )


def encode_obstacle_list(structs: Column) -> Column:
    """Inverse (X4, event.go:253-263)."""
    return F.transform(
        structs,
        lambda s: encode_obstacle(
            encode_xy(s["x"].cast("int"), s["y"].cast("int")), s["destructible"]
        ),
    )


# --- X5/X6: bomb-name ownership (event.go:97-98, game.go:244) ---

def is_random_bomb(bomb_name: Column) -> Column:
    return bomb_name.startswith("random-")


def bomb_owner(bomb_name: Column) -> Column:
    return F.substring_index(bomb_name, "-", 1)


# --- X7/X8/X9: topic-name codecs (ScoreboardFunction.java:60-74,
# pulsar.go:90-107) ---

def room_from_topic(topic: Column) -> Column:
    return F.regexp_extract(topic, r"(.*)-event-topic", 1)


def event_topic(room: Column) -> Column:
    return F.concat(room, F.lit("-event-topic"))


def score_topic(room: Column) -> Column:
    return F.concat(room, F.lit("-score-topic"))


# --- X11: score string codec (ScoreboardFunction.java:47-50;
# summed via tonumber in docs/en/game7-connector.md:76-80) ---

def score_to_long(value: Column) -> Column:
    return value.cast("long")


def score_to_string(value: Column) -> Column:
    return value.cast("string")


# --- X12: directional neighbor with border clamp (utils.go:35-59) ---

def next_x(x: Column, direction: Column) -> Column:
    nx = (
        F.when(direction == "left", x - 1)
        .when(direction == "right", x + 1)
        .otherwise(x)
    )
    return F.when((nx >= 0) & (nx < GRID_W), nx).otherwise(x)


def next_y(y: Column, direction: Column) -> Column:
    ny = (
        F.when(direction == "up", y - 1)
        .when(direction == "down", y + 1)
        .otherwise(y)
    )
    return F.when((ny >= 0) & (ny < GRID_H), ny).otherwise(y)


# --- X13: flame ray cells, unobstructed form (utils.go:132-175);
# obstacle-blocking requires per-room state and lives in the fold —
# this is the declarative geometry for analytics joins (J2) ---

def flame_cells(x: Column, y: Column, length: int = 6) -> Column:
    """array<struct<x,y>> of the cross-shaped flame footprint, clipped
    to the grid."""
    xs = F.sequence(F.greatest(x - length, F.lit(0)), F.least(x + length, F.lit(GRID_W - 1)))
    ys = F.sequence(F.greatest(y - length, F.lit(0)), F.least(y + length, F.lit(GRID_H - 1)))
    horiz = F.transform(xs, lambda i: F.struct(i.cast("int").alias("x"), y.cast("int").alias("y")))
    vert = F.transform(ys, lambda j: F.struct(x.cast("int").alias("x"), j.cast("int").alias("y")))
    return F.array_distinct(F.concat(horiz, vert))


# --- X15: array membership / removal (utils.go:110-130) ---

def slice_contains(arr: Column, v: Column) -> Column:
    return F.array_contains(arr, v)


def slice_remove(arr: Column, v: Column) -> Column:
    return F.array_remove(arr, v)


# --- X17: clamp (pulsar.go:274) ---

def min_clamp(c: Column, bound: int) -> Column:
    return F.least(c, F.lit(bound))

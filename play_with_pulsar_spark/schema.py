"""Schemas: the event-log envelope, state tables, and driver fixtures.

The wire record reproduces the reference's Avro-JSON envelope
(reference: game-code/pulsar.go:12-58, struct at pulsar.go:61-72) —
nine logical event types (game-code/event.go:9-19) share one physical
schema. We add the engine metadata columns that make the broker's
implicit total order explicit (SURVEY §1.2): ``room`` (the reference's
topic-per-room namespace, pulsar.go:90-92), ``offset`` (broker
ordering, docs/en/game1-introduce.md:93-97) and an event-time ``ts``.

All schemas are explicit StructTypes — the reference registry-checks
schemas at the source boundary (docs/en/game5-schema.md:39-67); we
never ``inferSchema``.
"""

from __future__ import annotations

from pyspark.sql.types import (
    ArrayType,
    BooleanType,
    DoubleType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

# --- grid constants (reference: game-code/game.go:25-45) ---
GRID_W = 30
GRID_H = 25
BOMB_LENGTH = 6
N_INDESTRUCTIBLE = (GRID_W * GRID_H) // 5  # 150
N_DESTRUCTIBLE = (GRID_W * GRID_H) // 4  # 187
EXPLODE_DELAY_S = 2.0
FLAME_DELAY_S = 2.0

# --- the nine event-type tags (reference: game-code/event.go:9-19) ---
EVENT_TYPES = [
    "UserMoveEvent",
    "UserJoinEvent",
    "UserDeadEvent",
    "UserReviveEvent",
    "SetBombEvent",
    "BombMoveEvent",
    "ExplodeEvent",
    "UndoExplodeEvent",
    "UpdateMapEvent",
]

# The event envelope + engine metadata (offset/room/ts).
GAME_EVENT_SCHEMA = StructType(
    [
        StructField("offset", LongType(), False),
        StructField("room", StringType(), False),
        StructField("ts", TimestampType(), True),
        StructField("type", StringType(), False),
        StructField("name", StringType(), True),
        StructField("avatar", StringType(), True),
        StructField("comment", StringType(), True),  # killer on UserDeadEvent
        StructField("x", IntegerType(), True),
        StructField("y", IntegerType(), True),
        StructField("alive", BooleanType(), True),
        StructField("list", ArrayType(IntegerType()), True),  # encoded obstacles
    ]
)

# The bare wire envelope, without engine metadata — what from_json
# parses at the ingestion boundary (S8).
EVENT_ENVELOPE_SCHEMA = StructType(
    [
        StructField("type", StringType(), False),
        StructField("name", StringType(), True),
        StructField("avatar", StringType(), True),
        StructField("comment", StringType(), True),
        StructField("x", IntegerType(), True),
        StructField("y", IntegerType(), True),
        StructField("alive", BooleanType(), True),
        StructField("list", ArrayType(IntegerType()), True),
    ]
)

# Score changelog: {room}-score-topic messages
# (reference: ScoreboardFunction.java:47-50, String schema :92).
SCORE_CHANGELOG_SCHEMA = StructType(
    [
        StructField("offset", LongType(), False),
        StructField("room", StringType(), False),
        StructField("key", StringType(), False),  # player name
        StructField("value", StringType(), False),  # running total as string
    ]
)

# --- fold state tables (reference state maps: game-code/game.go:55-90) ---
PLAYERS_STATE_SCHEMA = StructType(
    [
        StructField("room", StringType(), False),
        StructField("name", StringType(), False),
        StructField("avatar", StringType(), True),
        StructField("x", IntegerType(), True),
        StructField("y", IntegerType(), True),
        StructField("alive", BooleanType(), True),
    ]
)

BOMBS_STATE_SCHEMA = StructType(
    [
        StructField("room", StringType(), False),
        StructField("bomb_name", StringType(), False),
        StructField("owner", StringType(), True),
        StructField("x", IntegerType(), True),
        StructField("y", IntegerType(), True),
    ]
)

OBSTACLES_STATE_SCHEMA = StructType(
    [
        StructField("room", StringType(), False),
        StructField("x", IntegerType(), False),
        StructField("y", IntegerType(), False),
        StructField("destructible", BooleanType(), False),
    ]
)

FLAMES_STATE_SCHEMA = StructType(
    [
        StructField("room", StringType(), False),
        StructField("x", IntegerType(), False),
        StructField("y", IntegerType(), False),
        StructField("owner", StringType(), True),
    ]
)

# --- driver-provided fixture tables (/root/testdata/{sf}/, TESTDATA.md) ---
DRIVER_TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]

EVENTS_FIXTURE_SCHEMA = StructType(
    [
        StructField("event_id", LongType(), True),
        StructField("ts", TimestampType(), True),
        StructField("user_id", LongType(), True),
        StructField("event_type", StringType(), True),
        StructField("value", DoubleType(), True),
        StructField("props", StringType(), True),
    ]
)

EMBEDDING_SCHEMA = StructType(
    [
        StructField("vec_id", LongType(), True),
        StructField("embedding", ArrayType(FloatType()), True),
        StructField("label", IntegerType(), True),
    ]
)

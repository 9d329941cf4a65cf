"""The declared query registry — the engine's public query surface.

Every operator from SURVEY.md §2 is declared here as a named query
over the driver fixture tables (TESTDATA.md), together with the ANSI
SQL its DuckDB oracle runs. The driver executes both sides at sf0.01
and compares row-count + schema + order-insensitive value hash;
``tests/test_oracle_parity.py`` runs the same comparison locally.

Column-name contract: every computed column is aliased identically in
the Spark plan and the oracle SQL (the driver sorts columns by name
before hashing).

Mapping of the reference's event-log semantics onto the driver's
``events`` fixture follows FIXTURES.md §B: ``event_type`` filter ≈ P1,
``groupBy(user_id).count()`` ≈ A1, latest-per-user ≈ A3/S6. The
game-native forms of the same operators (over the game-event envelope
schema) are exercised by the synthesized-log queries (``game_*``) and
by the unit tests' own DuckDB comparisons.
"""

from __future__ import annotations

import os
from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .operators import compaction, pii, replay, scoreboard
from .schema import GRID_H, GRID_W
from .oracle import davg, dsum, sql_davg, sql_dsum
from .sources.tables import load_table

# Committed, seeded game-event-log fixture (FIXTURES.md §A1; generated
# by scripts/gen_fixtures.py). Game-native queries read it from both
# engines so the DuckDB oracle sees the identical table.
GAME_EVENTS_PATH = os.path.abspath(
    os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", "fixtures", "game_events.parquet")
)


@dataclass(frozen=True)
class QuerySpec:
    name: str
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None  # ANSI SQL for DuckDB, or None → rows-only check


REGISTRY: dict[str, QuerySpec] = {}

# DuckDB-side tokenizer/stopword fragments shared by the text oracles.
_TOKS = "string_split_regex(trim(lower(text)), '\\s+')"
_STOPS = "('the','a','an','of','and','to','in','is','on','for')"


def register(name: str, oracle: str | None = None):
    def deco(fn):
        REGISTRY[name] = QuerySpec(name, fn, oracle)
        return fn

    return deco


def _prep(spark: SparkSession) -> None:
    """Session invariants the oracle comparison depends on, applied
    defensively because the driver owns the SparkSession."""
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    from .session import ensure_workers_have_package

    ensure_workers_have_package(spark)


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    _prep(spark)
    return load_table(spark, sf_dir, name)


# =====================================================================
# Scoreboard family (SURVEY §2.3 A1-A5, §2.2 P1-P3, §2.5 W2-W3) on the
# driver `events` fixture.
# =====================================================================


@register(
    "a1_scoreboard_kills",
    oracle="""
    SELECT user_id AS killer, count(*) AS kills
    FROM events
    WHERE event_type = 'purchase'
      AND user_id <> CAST(json_extract_string(props, '$.k') AS BIGINT)
    GROUP BY user_id
    """,
)
def a1_scoreboard_kills(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1 + P1 + P2 + P3: the reference's production query shape
    (ScoreboardFunction.java:18-58) on the events fixture — type-tag
    filter, column-vs-column self-kill filter, grouped count.
    Plan: scan(filter pushed) → partial agg → single shuffle on key.
    """
    ev = _t(spark, sf_dir, "events")
    k = F.get_json_object(F.col("props"), "$.k").cast("bigint")
    return (
        ev.filter(F.col("event_type") == "purchase")  # P1
        .filter(F.col("user_id") != k)  # P2
        .groupBy(F.col("user_id").alias("killer"))
        .agg(F.count(F.lit(1)).alias("kills"))  # A1
    )


@register(
    "a3_latest_per_key",
    oracle="""
    SELECT user_id, event_id AS last_event_id, event_type AS last_type,
           value AS last_value, ts AS last_ts
    FROM events
    QUALIFY row_number() OVER (PARTITION BY user_id
                               ORDER BY ts DESC, event_id DESC) = 1
    """,
)
def a3_latest_per_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A3/S6: TableView latest-per-key (pulsar.go:160-167) as a
    max_by aggregation — partial-aggregates map-side, so the shuffle
    moves ≤ one row per key per partition (vs. every raw row for the
    window-function form the oracle uses)."""
    ev = _t(spark, sf_dir, "events").select(
        "user_id",
        F.col("event_id").alias("last_event_id"),
        F.col("event_type").alias("last_type"),
        F.col("value").alias("last_value"),
        F.col("ts").alias("last_ts"),
    )
    return compaction.latest_per_key(
        ev, key_cols=["user_id"], order_cols=["last_ts", "last_event_id"]
    )


@register(
    "a4_global_scoreboard",
    oracle=f"""
    SELECT user_id AS player, {sql_dsum("value")} AS total, count(*) AS n_events
    FROM events
    WHERE event_type IN ('purchase', 'click')
    GROUP BY user_id
    """,
)
def a4_global_scoreboard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A4: cross-room per-player sum (docs/en/game7-connector.md:76-80)
    — exact-decimal sum so the distributed result is bitwise stable."""
    ev = _t(spark, sf_dir, "events")
    return (
        ev.filter(F.col("event_type").isin("purchase", "click"))
        .groupBy(F.col("user_id").alias("player"))
        .agg(dsum("value").alias("total"), F.count(F.lit(1)).alias("n_events"))
    )


@register(
    "a5_ranked_scoreboard",
    oracle=f"""
    WITH totals AS (
      SELECT user_id AS player, {sql_dsum("value")} AS total
      FROM events WHERE event_type = 'purchase' GROUP BY user_id
    )
    SELECT player, total, rank() OVER (ORDER BY total DESC) AS rnk
    FROM totals
    """,
)
def a5_ranked_scoreboard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A5/W3: global ranking (docs/en/game1-introduce.md:53, req 5).
    The rank window runs over the aggregated result (one row per
    player), never over raw events — the only single-partition stage
    touches ~|players| rows."""
    ev = _t(spark, sf_dir, "events")
    totals = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy(F.col("user_id").alias("player"))
        .agg(dsum("value").alias("total"))
    )
    return scoreboard.ranked_scoreboard(totals, total_col="total")


@register(
    "w2_recency_top5",
    oracle="""
    WITH latest AS (
      SELECT user_id, ts AS last_ts, event_id AS last_event_id
      FROM events
      QUALIFY row_number() OVER (PARTITION BY user_id
                                 ORDER BY ts DESC, event_id DESC) = 1
    )
    SELECT user_id, last_ts, last_event_id
    FROM latest ORDER BY last_ts DESC, last_event_id DESC LIMIT 5
    """,
)
def w2_recency_top5(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W2: the LRU-of-5 scoreboard view (game.go:57,300-312) — the k
    most-recently-active keys."""
    ev = _t(spark, sf_dir, "events").select(
        "user_id", F.col("ts").alias("last_ts"), F.col("event_id").alias("last_event_id")
    )
    return compaction.recency_top_k(
        ev, key_cols=["user_id"], order_cols=["last_ts", "last_event_id"], k=5
    )


@register(
    "s4_latest_message",
    oracle="""
    SELECT event_id, ts, user_id, event_type, value
    FROM events ORDER BY ts DESC, event_id DESC LIMIT 1
    """,
)
def s4_latest_message(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S4/O2: newest record of the log (map init for new joiners,
    pulsar.go:229-252) — TakeOrdered top-1, no global sort."""
    ev = _t(spark, sf_dir, "events").select("event_id", "ts", "user_id", "event_type", "value")
    return compaction.latest_message(ev, order_cols=["ts", "event_id"])


# =====================================================================
# Relational surface (SURVEY §2.12): TPC-H-shaped joins/aggs.
# =====================================================================


@register(
    "q1_pricing_summary",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           {sql_dsum("l_quantity")} AS sum_qty,
           {sql_dsum("l_extendedprice")} AS sum_base_price,
           {sql_dsum("l_extendedprice * (1 - l_discount)")} AS sum_disc_price,
           {sql_dsum("l_extendedprice * (1 - l_discount) * (1 + l_tax)")} AS sum_charge,
           {sql_davg("l_quantity")} AS avg_qty,
           {sql_davg("l_extendedprice")} AS avg_price,
           {sql_davg("l_discount")} AS avg_disc,
           count(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape: wide grouped aggregation. One shuffle on the
    (tiny-cardinality) group key after map-side partial agg; the
    shipdate filter and 7-column projection reach the parquet scan."""
    li = _t(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))
    charge = disc_price * (F.lit(1.0) + F.col("l_tax"))
    n = F.count(F.lit(1))
    return (
        li.filter(F.col("l_shipdate") <= F.to_timestamp(F.lit("1998-09-02")))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum("l_quantity").alias("sum_qty"),
            dsum("l_extendedprice").alias("sum_base_price"),
            dsum(disc_price).alias("sum_disc_price"),
            dsum(charge).alias("sum_charge"),
            davg("l_quantity", n).alias("avg_qty"),
            davg("l_extendedprice", n).alias("avg_price"),
            davg("l_discount", n).alias("avg_disc"),
            n.alias("count_order"),
        )
    )


@register(
    "q3_shipping_priority",
    oracle=f"""
    SELECT l_orderkey,
           {sql_dsum("l_extendedprice * (1 - l_discount)")} AS revenue,
           o_orderdate, o_orderpriority
    FROM customer
    JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1998-03-15'
      AND l_shipdate > TIMESTAMP '1998-03-15'
    GROUP BY l_orderkey, o_orderdate, o_orderpriority
    ORDER BY revenue DESC, o_orderdate, l_orderkey
    LIMIT 10
    """,
)
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: selective dim filter → join → agg → top-k.
    customer is broadcast (small side); lineitem never shuffles for
    the join, only for the final group-by on l_orderkey."""
    cu = _t(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = _t(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.to_timestamp(F.lit("1998-03-15"))
    )
    li = _t(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.to_timestamp(F.lit("1998-03-15"))
    )
    disc_price = F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(cu), o.o_custkey == cu.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(dsum(disc_price).alias("revenue"))
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(F.col("revenue").desc(), "o_orderdate", "l_orderkey")
        .limit(10)
    )


@register(
    "q5_local_supplier_volume",
    oracle=f"""
    SELECT n_name, {sql_dsum("l_extendedprice * (1 - l_discount)")} AS revenue
    FROM customer, orders, lineitem, supplier, nation, region
    WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
      AND l_suppkey = s_suppkey AND c_nationkey = s_nationkey
      AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
      AND r_name = 'ASIA'
      AND o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderdate <  TIMESTAMP '1998-01-01'
    GROUP BY n_name
    """,
)
def q5_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: 6-way join with three broadcastable dims.
    region/nation/supplier/customer all fit under the broadcast
    threshold at any realistic scale (dims grow ~linearly but stay
    tiny); only lineitem⋈orders is a shuffle join."""
    cu = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.to_timestamp(F.lit("1996-01-01")))
        & (F.col("o_orderdate") < F.to_timestamp(F.lit("1998-01-01")))
    )
    li = _t(spark, sf_dir, "lineitem")
    su = _t(spark, sf_dir, "supplier")
    na = _t(spark, sf_dir, "nation")
    re = _t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    disc_price = F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(cu), o.o_custkey == cu.c_custkey)
        .join(F.broadcast(su),
              (li.l_suppkey == su.s_suppkey) & (cu.c_nationkey == su.s_nationkey))
        .join(F.broadcast(na), su.s_nationkey == na.n_nationkey)
        .join(F.broadcast(re), na.n_regionkey == re.r_regionkey)
        .groupBy("n_name")
        .agg(dsum(disc_price).alias("revenue"))
    )


# =====================================================================
# Windows over event time (SURVEY §2.6 T8) and analytic windows.
# =====================================================================


@register(
    "t8_tumbling_window",
    oracle=f"""
    SELECT time_bucket(INTERVAL '1 hour', ts) AS window_start,
           event_type,
           count(*) AS n_events,
           {sql_dsum("value")} AS sum_value
    FROM events
    GROUP BY window_start, event_type
    """,
)
def t8_tumbling_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T8: tumbling event-time window agg — the streaming-native
    grouping (identical plan under readStream + watermark)."""
    ev = _t(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"), dsum("value").alias("sum_value"))
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


@register(
    "w3_order_rank_per_customer",
    oracle="""
    SELECT * FROM (
      SELECT o_custkey, o_orderkey, o_totalprice,
             rank() OVER (PARTITION BY o_custkey
                          ORDER BY o_totalprice DESC, o_orderkey) AS rnk,
             lag(o_totalprice) OVER (PARTITION BY o_custkey
                          ORDER BY o_totalprice DESC, o_orderkey) AS prev_price
      FROM orders
    ) WHERE rnk <= 3
    """,
)
def w3_order_rank_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Analytic windows (rank + lag) with top-k-per-group filter —
    one shuffle on the partition key, sort within partitions only."""
    o = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(F.col("o_totalprice").desc(), "o_orderkey")
    return (
        o.select(
            "o_custkey",
            "o_orderkey",
            "o_totalprice",
            F.rank().over(w).alias("rnk"),
            F.lag("o_totalprice").over(w).alias("prev_price"),
        )
        .filter(F.col("rnk") <= 3)
    )


# =====================================================================
# Set operations / semi / anti joins (SURVEY §2.10, §2.12).
# =====================================================================


@register(
    "j_customers_without_orders",
    oracle="""
    SELECT c_custkey, c_name FROM customer
    WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
    """,
)
def j_customers_without_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left anti join (P6's key-membership predicate in relational
    form). Broadcast the distinct key set when it is small."""
    cu = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    return cu.join(o, cu.c_custkey == o.o_custkey, "left_anti").select("c_custkey", "c_name")


@register(
    "j_parts_never_shipped",
    oracle="""
    SELECT p_partkey FROM part
    EXCEPT
    SELECT l_partkey AS p_partkey FROM lineitem
    """,
)
def j_parts_never_shipped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT set op (Catalyst rewrites to anti join + distinct)."""
    p = _t(spark, sf_dir, "part").select("p_partkey")
    li = _t(spark, sf_dir, "lineitem").select(F.col("l_partkey").alias("p_partkey"))
    return p.subtract(li)  # EXCEPT DISTINCT


# =====================================================================
# JSON / scalar function surface (X-series, SURVEY §2.7).
# =====================================================================


@register(
    "x16_json_extract",
    oracle="""
    SELECT event_id,
           CAST(json_extract_string(props, '$.k') AS BIGINT) AS k,
           event_type
    FROM events
    WHERE CAST(json_extract_string(props, '$.k') AS BIGINT) > 80
    """,
)
def x16_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X16: JSON envelope decode (from_json/get_json_object ≈
    pulsar.go:248,269 payload decode) + predicate on the extracted
    field."""
    ev = _t(spark, sf_dir, "events")
    k = F.get_json_object(F.col("props"), "$.k").cast("bigint")
    return ev.select("event_id", k.alias("k"), "event_type").filter(F.col("k") > 80)


# =====================================================================
# Game-native operators over the committed event-log fixture — the
# reference's own schema and queries (SURVEY §1.1-A, §2.3, §2.4).
# =====================================================================


def _game_log(spark: SparkSession) -> DataFrame:
    _prep(spark)
    return spark.read.parquet(GAME_EVENTS_PATH)


@register(
    "game_a1_room_scoreboard",
    oracle=f"""
    SELECT room, comment AS killer, count(*) AS kills
    FROM read_parquet('{GAME_EVENTS_PATH}')
    WHERE "type" = 'UserDeadEvent' AND "name" <> comment
    GROUP BY room, comment
    """,
)
def game_a1_room_scoreboard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """THE reference production query on the reference's own schema:
    kills per (room, killer) — ScoreboardFunction.java:18-58."""
    return scoreboard.kill_counts(_game_log(spark))


@register(
    "game_a4a5_global_rank",
    oracle=f"""
    WITH per_room AS (
      SELECT room, comment AS killer, count(*) AS kills
      FROM read_parquet('{GAME_EVENTS_PATH}')
      WHERE "type" = 'UserDeadEvent' AND "name" <> comment
      GROUP BY room, comment
    ), totals AS (
      SELECT killer AS player, CAST(sum(kills) AS BIGINT) AS total
      FROM per_room GROUP BY killer
    )
    SELECT player, total, rank() OVER (ORDER BY total DESC) AS rnk FROM totals
    """,
)
def game_a4a5_global_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A4+A5: cross-room player totals + global rank (the Redis-sink
    + Lua-sum pipeline of docs/en/game7-connector.md:62-80 collapsed
    into two aggregations)."""
    per_room = scoreboard.kill_counts(_game_log(spark))
    totals = scoreboard.global_scoreboard(per_room)
    return scoreboard.ranked_scoreboard(totals)


@register(
    "game_p4_position_history",
    oracle=f"""
    SELECT room, "name", x, y, ts, n_updates FROM (
      SELECT room, "name", x, y, ts,
             row_number() OVER (PARTITION BY room, "name" ORDER BY "offset" DESC) AS rn,
             count(*) OVER (PARTITION BY room, "name") AS n_updates
      FROM read_parquet('{GAME_EVENTS_PATH}')
      WHERE "type" IN ('UserMoveEvent','UserJoinEvent','UserReviveEvent')
    ) WHERE rn = 1
    """,
)
def game_p4_position_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The guard-free SQL fast path of the fold (SURVEY §2.4 batch
    note): last position-bearing event per (room, player) via max_by —
    an aggregation, not a window, so it partial-aggregates map-side."""
    return replay.player_position_history(_game_log(spark))


@register(
    "game_x3_obstacle_decode",
    oracle=f"""
    WITH latest AS (
      SELECT room, "list" AS lst
      FROM read_parquet('{GAME_EVENTS_PATH}')
      WHERE "type" IN ('UserJoinEvent','UpdateMapEvent')
      QUALIFY row_number() OVER (PARTITION BY room ORDER BY "offset" DESC) = 1
    ), codes AS (
      SELECT room, unnest(lst) AS code FROM latest
    )
    SELECT room,
           CAST(abs(code) % 30 AS INT) AS x,
           CAST(abs(code) // 30 AS INT) AS y,
           code < 0 AS destructible
    FROM codes
    """,
)
def game_x3_obstacle_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S4 + X1/X2/X3: latest map snapshot per room (max_by), exploded
    from the sign-encoded obstacle list (utils.go:87-93 encodeXY,
    event.go:227-251 decode) into an (x, y, destructible) table."""
    log = _game_log(spark).filter(F.col("type").isin("UserJoinEvent", "UpdateMapEvent"))
    latest = compaction.latest_per_key(
        log, key_cols=["room"], order_cols=["offset"], payload_cols=["offset", "list"]
    )
    code = F.abs(F.col("code"))
    return latest.select("room", F.explode("list").alias("code")).select(
        "room",
        F.pmod(code, F.lit(30)).cast("int").alias("x"),
        F.floor(code / 30).cast("int").alias("y"),
        (F.col("code") < 0).alias("destructible"),
    )


@register(
    "game_s4_latest_event_per_room",
    oracle=f"""
    SELECT room, "offset" AS last_offset, "type" AS last_type,
           "name" AS last_name, ts AS last_ts
    FROM read_parquet('{GAME_EVENTS_PATH}')
    QUALIFY row_number() OVER (PARTITION BY room ORDER BY "offset" DESC) = 1
    """,
)
def game_s4_latest_event_per_room(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S4 per room: the latest-message point-read generalized to the
    partitioned log (pulsar.go:229-252)."""
    log = _game_log(spark).select(
        "room",
        F.col("offset").alias("last_offset"),
        F.col("type").alias("last_type"),
        F.col("name").alias("last_name"),
        F.col("ts").alias("last_ts"),
    )
    return compaction.latest_per_key(log, key_cols=["room"], order_cols=["last_offset"])


SCORE_CHANGELOG_PATH = GAME_EVENTS_PATH.replace("game_events", "score_changelog")


@register(
    "chg_s6_tableview",
    oracle=f"""
    SELECT room, "key" AS player,
           CAST("value" AS BIGINT) AS score,
           "offset" AS last_offset
    FROM read_parquet('{SCORE_CHANGELOG_PATH}')
    QUALIFY row_number() OVER (PARTITION BY room, "key"
                               ORDER BY "offset" DESC) = 1
    """,
)
def chg_s6_tableview(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S6/A3 + X11 on the score-changelog fixture (FIXTURES §A2): the
    TableView materialization — latest string-encoded running total
    per (room, player), cast back to a number (the reference's Redis
    ``tonumber``, docs/en/game7-connector.md:76-80)."""
    _prep(spark)
    chg = spark.read.parquet(SCORE_CHANGELOG_PATH).select(
        "room",
        F.col("key").alias("player"),
        F.col("value").cast("bigint").alias("score"),
        F.col("offset").alias("last_offset"),
    )
    return compaction.latest_per_key(
        chg, key_cols=["room", "player"], order_cols=["last_offset"]
    )


@register(
    "stream_s6_tableview",
    oracle=f"""
    SELECT room, "key" AS player,
           CAST("value" AS BIGINT) AS score,
           "offset" AS last_offset
    FROM read_parquet('{SCORE_CHANGELOG_PATH}')
    QUALIFY row_number() OVER (PARTITION BY room, "key"
                               ORDER BY "offset" DESC) = 1
    """,
)
def stream_s6_tableview(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S6 TableView as a REAL streaming query: readStream over the
    score changelog → complete-mode max_by latest-per-key → memory
    sink; the final compacted table hash-matches the same oracle as
    the batch form (pulsar.go:160-167's live subscription semantics,
    driver-verified streaming == batch)."""
    from .streaming.pipeline import streaming_latest_per_key

    def compacted(stream: DataFrame) -> DataFrame:
        chg = stream.select(
            "room",
            F.col("key").alias("player"),
            F.col("value").cast("bigint").alias("score"),
            F.col("offset").alias("last_offset"),
        )
        return streaming_latest_per_key(
            chg, key_cols=["room", "player"], order_cols=["last_offset"],
            payload_cols=None,
        )

    chg_schema = "offset bigint, room string, ts timestamp, key string, value string"
    return _run_streamed_fixture(
        spark, SCORE_CHANGELOG_PATH, chg_schema, compacted, "stream_s6"
    )


@register(
    "chg_a4_global_sum",
    oracle=f"""
    WITH latest AS (
      SELECT room, "key" AS player, CAST("value" AS BIGINT) AS score
      FROM read_parquet('{SCORE_CHANGELOG_PATH}')
      QUALIFY row_number() OVER (PARTITION BY room, "key"
                                 ORDER BY "offset" DESC) = 1
    )
    SELECT player, CAST(sum(score) AS BIGINT) AS total,
           count(*) AS n_rooms
    FROM latest GROUP BY player
    """,
)
def chg_a4_global_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A4 via the connector-export path: compact the changelog to
    latest-per-(room,player), then sum across rooms — the two-level
    aggregation that replaces the Redis key-scan + Lua sum."""
    _prep(spark)
    chg = spark.read.parquet(SCORE_CHANGELOG_PATH).select(
        "room",
        F.col("key").alias("player"),
        F.col("value").cast("bigint").alias("score"),
        F.col("offset").alias("last_offset"),
    )
    latest = compaction.latest_per_key(
        chg, key_cols=["room", "player"], order_cols=["last_offset"], payload_cols=["score"]
    )
    return latest.groupBy("player").agg(
        F.sum("score").alias("total"), F.count(F.lit(1)).alias("n_rooms")
    )


@register(
    "chg_w2_lru_top5",
    oracle=f"""
    WITH latest AS (
      SELECT room, "key" AS player, "offset" AS last_offset,
             CAST("value" AS BIGINT) AS score
      FROM read_parquet('{SCORE_CHANGELOG_PATH}')
      QUALIFY row_number() OVER (PARTITION BY room, "key"
                                 ORDER BY "offset" DESC) = 1
    )
    SELECT room, player, score, last_offset FROM (
      SELECT *, row_number() OVER (PARTITION BY room
                                   ORDER BY last_offset DESC) AS rn
      FROM latest
    ) WHERE rn <= 5
    """,
)
def chg_w2_lru_top5(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W2: the scoreboard's LRU-of-5 view per room — the 5 most
    recently UPDATED players (recency top-k, not score top-k;
    game.go:57,300-312)."""
    _prep(spark)
    chg = spark.read.parquet(SCORE_CHANGELOG_PATH).select(
        "room",
        F.col("key").alias("player"),
        F.col("value").cast("bigint").alias("score"),
        F.col("offset").alias("last_offset"),
    )
    latest = compaction.latest_per_key(
        chg, key_cols=["room", "player"], order_cols=["last_offset"],
        payload_cols=["score", "last_offset"],
    )
    w = Window.partitionBy("room").orderBy(F.col("last_offset").desc())
    return (
        latest.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 5)
        .select("room", "player", "score", "last_offset")
    )


@register(
    "j2_kill_attribution",
    oracle=f"""
    WITH deaths AS (
      SELECT room, "offset" AS doff, epoch_us(ts) AS dus,
             "name" AS victim, comment AS recorded_killer, x, y
      FROM read_parquet('{GAME_EVENTS_PATH}')
      WHERE "type" = 'UserDeadEvent'
    ), explodes AS (
      SELECT room, "offset" AS eoff, epoch_us(ts) AS eus,
             "name" AS bomb, string_split(("name"), '-')[1] AS owner,
             x AS bx, y AS by
      FROM read_parquet('{GAME_EVENTS_PATH}')
      WHERE "type" = 'ExplodeEvent'
    ), hits AS (
      SELECT d.room, d.doff, d.victim, d.recorded_killer,
             e.owner, e.eoff, e.eus
      FROM deaths d JOIN explodes e
        ON d.room = e.room
       AND ((d.x = e.bx AND abs(d.y - e.by) <= 6)
            OR (d.y = e.by AND abs(d.x - e.bx) <= 6))
       AND e.eus <= d.dus AND d.dus - e.eus < 2000000
    )
    SELECT room, doff, victim, recorded_killer, owner AS attributed_killer
    FROM hits
    QUALIFY row_number() OVER (PARTITION BY room, doff
                               ORDER BY eus DESC, eoff DESC) = 1
    """,
)
def j2_kill_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J2: the kill-attribution interval join (game.go:139-147 made
    relational): each death matched to the most recent explosion whose
    unobstructed flame footprint covers the death cell within the 2 s
    flame window. Spark side: footprint exploded to cells → pure
    EQUI-join on (room, x, y) + time-range filter → max_by — the
    shape that shuffles on cell keys instead of nested-looping the
    theta predicate (the oracle uses the equivalent theta form)."""
    from .functions import encoding as X

    _prep(spark)
    log = _game_log(spark)
    deaths = log.filter(F.col("type") == "UserDeadEvent").select(
        "room",
        F.col("offset").alias("doff"),
        # fixture ts is TIMESTAMP_NTZ; UTC session makes the cast lossless
        F.unix_micros(F.col("ts").cast("timestamp")).alias("dus"),
        F.col("name").alias("victim"),
        F.col("comment").alias("recorded_killer"),
        "x",
        "y",
    )
    explodes = log.filter(F.col("type") == "ExplodeEvent").select(
        "room",
        F.col("offset").alias("eoff"),
        F.unix_micros(F.col("ts").cast("timestamp")).alias("eus"),
        X.bomb_owner(F.col("name")).alias("owner"),
        F.explode(X.flame_cells(F.col("x"), F.col("y"), 6)).alias("cell"),
    ).select("room", "eoff", "eus", "owner",
             F.col("cell.x").alias("x"), F.col("cell.y").alias("y"))
    hits = deaths.join(explodes, ["room", "x", "y"]).filter(
        (F.col("eus") <= F.col("dus")) & (F.col("dus") - F.col("eus") < 2_000_000)
    )
    return (
        hits.groupBy("room", "doff", "victim", "recorded_killer")
        .agg(F.max_by("owner", F.struct("eus", "eoff")).alias("attributed_killer"))
    )


def _run_streamed_fixture(spark, fixture_path, schema, transform, tag):
    """Shared harness for the driver-verified streaming queries: link
    the fixture into a temp dir (the file source wants a directory),
    stream → transform → complete-mode memory sink, and REMOVE the
    temp dir once the availableNow run finishes (the returned
    DataFrame reads the memory sink, not the files). The memory-sink
    table itself lives until the session ends — it holds the result
    the driver collects."""
    import os
    import shutil
    import tempfile
    import uuid

    from .streaming.pipeline import run_to_completion

    _prep(spark)
    d = tempfile.mkdtemp(prefix=f"pwp_{tag}_")
    try:
        os.symlink(fixture_path, os.path.join(d, os.path.basename(fixture_path)))
        stream = spark.readStream.schema(schema).parquet(d)
        name = f"{tag}_{uuid.uuid4().hex[:8]}"
        return run_to_completion(transform(stream), name, "complete")
    finally:
        shutil.rmtree(d, ignore_errors=True)


@register(
    "stream_a1_scoreboard",
    oracle=f"""
    SELECT room, comment AS killer, count(*) AS kills
    FROM read_parquet('{GAME_EVENTS_PATH}')
    WHERE "type" = 'UserDeadEvent' AND "name" <> comment
    GROUP BY room, comment
    """,
)
def stream_a1_scoreboard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1 executed as a REAL streaming query (readStream → stateful
    grouped count → availableNow to a memory sink) whose final state
    hash-matches the same DuckDB oracle as the batch form — streaming
    == batch, verified by the driver itself."""
    from .schema import GAME_EVENT_SCHEMA
    from .streaming.pipeline import streaming_kill_counts

    return _run_streamed_fixture(
        spark, GAME_EVENTS_PATH, GAME_EVENT_SCHEMA, streaming_kill_counts, "stream_a1"
    )


@register(
    "pipeline_curate_training_data",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, text, lang, {_TOKS} AS t FROM documents
    ), quality AS (
      SELECT doc_id, text, lang,
             CAST(len(t) AS BIGINT) AS n_tokens
      FROM toks
      WHERE len(t) >= 30
        AND CAST(len(list_filter(t, x -> x IN {_STOPS})) AS DOUBLE) / len(t) < 0.5
    ), grams AS (
      SELECT doc_id, unnest(list_distinct(
               list_transform(range(1, len(t) - 1),
                              i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2]))) AS g
      FROM toks WHERE len(t) >= 3
    ), sizes AS (
      SELECT doc_id, count(*) AS n FROM grams GROUP BY doc_id
    ), dup_pairs AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS i
      FROM grams a JOIN grams b ON a.g = b.g AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    ), dups AS (
      SELECT DISTINCT id_b AS doc_id
      FROM dup_pairs
      JOIN sizes sa ON id_a = sa.doc_id
      JOIN sizes sb ON id_b = sb.doc_id
      WHERE CAST(i AS DOUBLE) / (sa.n + sb.n - i) >= 0.8
    )
    SELECT q.doc_id, q.lang, q.n_tokens, e.label
    FROM quality q
    JOIN embeddings e ON q.doc_id = e.vec_id
    WHERE q.doc_id NOT IN (SELECT doc_id FROM dups)
    """,
)
def pipeline_curate_training_data(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end training-data curation — the composition the engine
    exists for: quality filter (length + stopword density) → exact
    near-dup removal (keep the lower doc_id of each pair) → join to
    the embedding table. Every stage is one of the declared operators;
    the whole pipeline is a single Catalyst plan (filters pushed,
    dedup anti-join, broadcast embedding join)."""
    from .operators import dedup, textops

    docs = _t(spark, sf_dir, "documents")
    emb = _t(spark, sf_dir, "embeddings")
    quality = docs.select(
        "doc_id", "lang",
        textops.token_count("text").alias("n_tokens"),
        textops.stopword_ratio("text").alias("stop_ratio"),
    ).filter((F.col("n_tokens") >= 30) & (F.col("stop_ratio") < 0.5))
    dup_ids = (
        dedup.ngram_jaccard_pairs(docs, n=3, threshold=0.8)
        .select(F.col("id_b").alias("doc_id"))
        .distinct()
    )
    return (
        quality.join(dup_ids, "doc_id", "left_anti")
        .join(emb.select(F.col("vec_id").alias("doc_id"), "label"), "doc_id")
        .select("doc_id", "lang", "n_tokens", "label")
    )


@register(
    "game_survival_first_life",
    oracle=f"""
    WITH joins AS (
      SELECT room, "name", min(ts) AS first_join
      FROM read_parquet('{GAME_EVENTS_PATH}')
      WHERE "type" = 'UserJoinEvent' GROUP BY room, "name"
    ), deaths AS (
      SELECT room, "name", min(ts) AS first_death
      FROM read_parquet('{GAME_EVENTS_PATH}')
      WHERE "type" = 'UserDeadEvent' GROUP BY room, "name"
    )
    SELECT j.room, j."name" AS player,
           epoch_us(d.first_death) - epoch_us(j.first_join) AS first_life_us
    FROM joins j JOIN deaths d ON j.room = d.room AND j."name" = d."name"
    """,
)
def game_survival_first_life(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Game analytics: first-life survival time per player (join→first
    death), microsecond-exact."""
    log = _game_log(spark)
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    joins = (
        log.filter(F.col("type") == "UserJoinEvent")
        .groupBy("room", F.col("name").alias("player"))
        .agg(F.min(us).alias("first_join"))
    )
    deaths = (
        log.filter(F.col("type") == "UserDeadEvent")
        .groupBy("room", F.col("name").alias("player"))
        .agg(F.min(us).alias("first_death"))
    )
    return joins.join(deaths, ["room", "player"]).select(
        "room", "player", (F.col("first_death") - F.col("first_join")).alias("first_life_us")
    )


@register(
    "game_bomb_effectiveness",
    oracle=f"""
    WITH bombs AS (
      SELECT room, string_split("name", '-')[1] AS player, count(*) AS bombs_set
      FROM read_parquet('{GAME_EVENTS_PATH}')
      WHERE "type" = 'SetBombEvent' GROUP BY 1, 2
    ), kills AS (
      SELECT room, comment AS player, count(*) AS kills
      FROM read_parquet('{GAME_EVENTS_PATH}')
      WHERE "type" = 'UserDeadEvent' AND "name" <> comment GROUP BY 1, 2
    )
    SELECT b.room, b.player, b.bombs_set,
           coalesce(k.kills, 0) AS kills,
           CAST(coalesce(k.kills, 0) AS DOUBLE) / b.bombs_set AS kills_per_bomb
    FROM bombs b LEFT JOIN kills k ON b.room = k.room AND b.player = k.player
    WHERE b.player <> 'random'
    """,
)
def game_bomb_effectiveness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Game analytics: kills per bomb placed, per (room, player) —
    bomb ownership via X6 name parsing, outer join against the kill
    scoreboard."""
    from .functions import encoding as X

    log = _game_log(spark)
    bombs = (
        log.filter(F.col("type") == "SetBombEvent")
        .groupBy("room", X.bomb_owner(F.col("name")).alias("player"))
        .agg(F.count(F.lit(1)).alias("bombs_set"))
        .filter(F.col("player") != "random")
    )
    kills = (
        log.filter(F.col("type") == "UserDeadEvent")
        .filter(F.col("name") != F.col("comment"))
        .groupBy("room", F.col("comment").alias("player"))
        .agg(F.count(F.lit(1)).alias("kills"))
    )
    return bombs.join(kills, ["room", "player"], "left").select(
        "room",
        "player",
        "bombs_set",
        F.coalesce(F.col("kills"), F.lit(0)).alias("kills"),
        (F.coalesce(F.col("kills"), F.lit(0)).cast("double") / F.col("bombs_set")).alias(
            "kills_per_bomb"
        ),
    )


@register(
    "game_room_activity_windows",
    oracle=f"""
    SELECT room, time_bucket(INTERVAL '1 minute', ts) AS window_start,
           count(*) AS n_events,
           count(DISTINCT "name") AS n_actors
    FROM read_parquet('{GAME_EVENTS_PATH}')
    WHERE "name" IS NOT NULL
    GROUP BY room, window_start
    """,
)
def game_room_activity_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Game analytics: per-room per-minute activity (T8 over the game
    log): event volume + distinct active entities."""
    log = _game_log(spark).filter(F.col("name").isNotNull())
    return (
        log.groupBy("room", F.window("ts", "1 minute").alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.countDistinct("name").alias("n_actors"),
        )
        .select("room", F.col("w.start").alias("window_start"), "n_events", "n_actors")
    )


@register(
    "game_movement_heatmap",
    oracle=f"""
    SELECT room, x, y, count(*) AS visits, count(DISTINCT "name") AS players
    FROM read_parquet('{GAME_EVENTS_PATH}')
    WHERE "type" = 'UserMoveEvent'
      AND x >= 0 AND x < 30 AND y >= 0 AND y < 25
    GROUP BY room, x, y
    HAVING count(*) >= 3
    """,
)
def game_movement_heatmap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Game analytics: per-cell movement density (the posToPlayers
    write stream aggregated spatially) — P5 bounds applied, hot cells
    only. One scan, one shuffle on (room, x, y)."""
    log = _game_log(spark)
    return (
        log.filter(F.col("type") == "UserMoveEvent")
        .filter(
            (F.col("x") >= 0) & (F.col("x") < GRID_W)
            & (F.col("y") >= 0) & (F.col("y") < GRID_H)
        )
        .groupBy("room", "x", "y")
        .agg(
            F.count(F.lit(1)).alias("visits"),
            F.countDistinct("name").alias("players"),
        )
        .filter(F.col("visits") >= 3)
    )


@register(
    "game_kd_ratio",
    oracle=f"""
    WITH deaths AS (
      SELECT room, "name" AS player, count(*) AS deaths
      FROM read_parquet('{GAME_EVENTS_PATH}')
      WHERE "type" = 'UserDeadEvent' GROUP BY room, "name"
    ), kills AS (
      SELECT room, comment AS player, count(*) AS kills
      FROM read_parquet('{GAME_EVENTS_PATH}')
      WHERE "type" = 'UserDeadEvent' AND "name" <> comment
      GROUP BY room, comment
    )
    SELECT coalesce(d.room, k.room) AS room,
           coalesce(d.player, k.player) AS player,
           coalesce(kills, 0) AS kills,
           coalesce(deaths, 0) AS deaths,
           round(CAST(coalesce(kills, 0) AS DOUBLE)
                 / greatest(coalesce(deaths, 0), 1), 6) AS kd
    FROM deaths d FULL OUTER JOIN kills k
      ON d.room = k.room AND d.player = k.player
    """,
)
def game_kd_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Game analytics: kill/death ratio per (room, player) — two
    branches of ONE scan full-outer-joined (players who only died and
    players who only killed both appear)."""
    log = _game_log(spark)
    dead = log.filter(F.col("type") == "UserDeadEvent")
    deaths = dead.groupBy("room", F.col("name").alias("player")).agg(
        F.count(F.lit(1)).alias("deaths")
    )
    kills = (
        dead.filter(F.col("name") != F.col("comment"))
        .groupBy("room", F.col("comment").alias("player"))
        .agg(F.count(F.lit(1)).alias("kills"))
    )
    return (
        deaths.join(kills, ["room", "player"], "full_outer")
        .select(
            "room",
            "player",
            F.coalesce(F.col("kills"), F.lit(0)).alias("kills"),
            F.coalesce(F.col("deaths"), F.lit(0)).alias("deaths"),
            F.round(
                F.coalesce(F.col("kills"), F.lit(0)).cast("double")
                / F.greatest(F.coalesce(F.col("deaths"), F.lit(0)), F.lit(1)),
                6,
            ).alias("kd"),
        )
    )


# --- the fold itself: genuinely non-SQL-expressible (driver records
# rows-only checks for these; exactness is proven by the golden tests
# in tests/test_replay_fold.py against the single-threaded fold) ---


@register("fold_players_state", oracle=None)
def fold_players_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.4 replay fold, players table at end-of-log — order-dependent
    guards (P5-P7) make this unexpressible in one SQL pass."""
    state = replay.replay_state(_game_log(spark))
    return replay.players_state(state)


@register("fold_pos_players", oracle=None)
def fold_pos_players(spark: SparkSession, sf_dir: str) -> DataFrame:
    """posToPlayers (game.go:62): who is standing on cell (x,y) —
    position-keyed LWW map with reference collision/staleness
    semantics (event.go:47,80; golden tests in test_replay_fold.py)."""
    state = replay.replay_state(_game_log(spark))
    return replay.pos_players_state(state)


@register("fold_time_travel", oracle=None)
def fold_time_travel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§3.2 time-travel: state_at(room, k) for k=1500 — the watch-mode
    replay (watch.go:43-85) as a batch query."""
    state = replay.replay_state(_game_log(spark), upto_offset=1500)
    return replay.players_state(state)


# fold_scale_replay workload size — bench.py imports these to derive
# the events/s metric; keep the query and the metric in lockstep.
FOLD_SCALE_ROOMS = 32
FOLD_SCALE_EVENTS_PER_ROOM = 3000


@register("fold_scale_replay", oracle=None)
def fold_scale_replay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale-honest fold benchmark: generate a 32-room × 3000-event
    log distributed (mapInPandas over rooms — the generation IS part
    of the measured pipeline) and fold it. Rooms are the parallelism
    unit: 32 independent tasks, state bounded per room.

    Plan note (round 4): the generator emits a topic-per-room layout
    (one room per partition), so the fold uses the shuffle-free
    ``replay_state_grouped`` — generation, fold, and partial agg fuse
    into ONE stage; the only exchange left is the tiny final agg.
    Same workload as rounds 1-3 (32×3000, seed 7); the speedup is
    plan shape, not a smaller problem. Parity with the shuffled
    ``replay_state`` is pinned by test_replay_fold.py."""
    from .sources.fixtures import game_event_log

    _prep(spark)
    log = game_event_log(spark, n_rooms=FOLD_SCALE_ROOMS,
                         events_per_room=FOLD_SCALE_EVENTS_PER_ROOM, seed=7)
    state = replay.replay_state_grouped(log)
    return state.groupBy("room", "entity").agg(F.count(F.lit(1)).alias("n"))


# XL fold workload (round 5) — the legacy 32×3000 entry is kept for
# series continuity, but at 96k events its wall time is dominated by
# the ~0.2 s Python-stage scheduling floor (96k / 0.2 s caps the
# METRIC at ~480k ev/s even for a zero-cost kernel). 32×12000 = 384k
# events amortizes the floor so fold_events_per_sec_xl tracks the
# kernel, not the scheduler.
FOLD_XL_ROOMS = 32
FOLD_XL_EVENTS_PER_ROOM = 12000


@register("fold_scale_replay_xl", oracle=None)
def fold_scale_replay_xl(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The fold benchmark at 4× the legacy event volume (384k events,
    same 32-room shape, seed 7): distributed generation + shuffle-free
    grouped fold + tiny final agg, one stage before the agg exchange.
    Exists so the tracked events/s number measures the fold kernel
    rather than the fixed per-stage floor (see constant note)."""
    from .sources.fixtures import game_event_log

    _prep(spark)
    log = game_event_log(spark, n_rooms=FOLD_XL_ROOMS,
                         events_per_room=FOLD_XL_EVENTS_PER_ROOM, seed=7)
    state = replay.replay_state_grouped(log)
    return state.groupBy("room", "entity").agg(F.count(F.lit(1)).alias("n"))


@register("fold_state_summary", oracle=None)
def fold_state_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full materialized state (players+bombs+obstacles+flames)
    summarized per room — one fold, one shuffle."""
    state = replay.replay_state(_game_log(spark))
    return state.groupBy("room", "entity").agg(F.count(F.lit(1)).alias("n"))


# =====================================================================
# LLM-data-pipeline surface (SURVEY §2.12 / BASELINE.json north star):
# text analysis, dedup, similarity search over documents/embeddings.
# =====================================================================

@register(
    "text_stats",
    oracle=f"""
    WITH t AS (
      SELECT doc_id, text, {_TOKS} AS toks FROM documents
    )
    SELECT doc_id,
           CAST(len(toks) AS BIGINT) AS n_tokens,
           CAST(length(text) AS BIGINT) AS n_chars_actual,
           CAST(list_sum(list_transform(toks, x -> length(x))) AS DOUBLE) / len(toks) AS mean_token_len,
           CAST(len(list_filter(toks, x -> x IN {_STOPS})) AS DOUBLE) / len(toks) AS stop_ratio,
           CAST(length(regexp_replace(text, '[^.,!?;:]', '', 'g')) AS DOUBLE) / length(text) AS punct_ratio,
           least(CAST(length(text) AS DOUBLE) / 400.0, 1.0) * 0.4
             + (1.0 - abs(CAST(len(list_filter(toks, x -> x IN {_STOPS})) AS DOUBLE) / len(toks) - 0.3)) * 0.3
             + (1.0 - least(abs(CAST(list_sum(list_transform(toks, x -> length(x))) AS DOUBLE) / len(toks) - 5.0) / 5.0, 1.0)) * 0.3
             AS quality,
           md5(text) AS fp
    FROM t
    """,
)
def text_stats_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Text analysis: token counting, quality scoring, fingerprinting
    — all JVM-side column expressions (whole-stage codegen; the scan
    is the only cost)."""
    from .operators import textops

    return textops.text_stats(_t(spark, sf_dir, "documents"))


@register(
    "dedup_exact",
    oracle="""
    SELECT md5(text) AS fp, min(doc_id) AS keep_id, count(*) AS n_copies
    FROM documents GROUP BY md5(text)
    """,
)
def dedup_exact_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup: hash-groupBy on the content fingerprint; the
    shuffle carries one row per distinct fingerprint per partition."""
    from .operators import dedup

    return dedup.exact_dedup(_t(spark, sf_dir, "documents"))


@register(
    "stream_dedup_exact",
    oracle="""
    SELECT md5(text) AS fp, min(doc_id) AS keep_id, count(*) AS n_copies
    FROM documents GROUP BY md5(text)
    """,
)
def stream_dedup_exact_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup as a REAL streaming query: the document batch
    arrives as a stream, the stateful fingerprint aggregation
    maintains (keep_id, n_copies) per distinct content, and the final
    availableNow state hash-matches the batch oracle — the streaming
    ingest-time dedup a training pipeline runs on arriving crawl
    shards, streaming == batch verified by the driver itself."""
    from .operators import dedup

    path = os.path.abspath(os.path.join(sf_dir, "documents.parquet"))
    schema = spark.read.parquet(path).schema
    return _run_streamed_fixture(spark, path, schema, dedup.exact_dedup, "stream_dedup")


# Stop-shingle document-frequency cap for the PRODUCTION n-gram
# Jaccard query. A shingle appearing in f docs creates f² candidate
# pairs in the inverted-index self-join, so the cap bounds the join
# fan-out regardless of corpus size. The oracle SQL applies the SAME
# cap (QUALIFY over count per gram), so the query stays hash-checked
# exactly — the cap is part of the declared semantics, not an
# approximation. Near-dup pairs share RARE shingles by definition;
# a pair at jaccard ≥ 0.8 loses a shingle to the cap only when that
# shingle is corpus-wide boilerplate.
_NGRAM_MAX_DF = 50


@register(
    "dedup_ngram_jaccard",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, {_TOKS} AS t FROM documents
    ), grams AS (
      SELECT doc_id, unnest(list_distinct(
               list_transform(range(1, len(t) - 1),
                              i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2]))) AS g
      FROM toks WHERE len(t) >= 3
    ), capped AS (
      SELECT doc_id, g FROM grams
      QUALIFY count(*) OVER (PARTITION BY g) <= {_NGRAM_MAX_DF}
    ), sizes AS (
      SELECT doc_id, count(*) AS n FROM capped GROUP BY doc_id
    ), inter AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS i
      FROM capped a JOIN capped b ON a.g = b.g AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    )
    SELECT id_a, id_b, CAST(i AS DOUBLE) / (sa.n + sb.n - i) AS jaccard
    FROM inter
    JOIN sizes sa ON id_a = sa.doc_id
    JOIN sizes sb ON id_b = sb.doc_id
    WHERE CAST(i AS DOUBLE) / (sa.n + sb.n - i) >= 0.8
    """,
)
def dedup_ngram_jaccard_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact 3-gram Jaccard near-dup pairs via inverted-index
    self-join with the stop-shingle cap (the production form; the
    cap is mirrored in the oracle so the hash check stays exact).
    The UNCAPPED form remains available as
    ``dedup.ngram_jaccard_pairs(..., max_shingle_freq=None)`` and is
    the ground truth for the MinHash/SimHash recall tests."""
    from .operators import dedup

    return dedup.ngram_jaccard_pairs(
        _t(spark, sf_dir, "documents"), n=3, threshold=0.8,
        max_shingle_freq=_NGRAM_MAX_DF,
    )


@register("dedup_minhash_lsh", oracle=None)
def dedup_minhash_lsh_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash-LSH near-dup pairs (the 100 TB path): banded signature
    buckets generate candidates, exact Jaccard verifies candidates
    only. No SQL oracle (the xxhash64 family is engine-specific);
    recall vs the exact pairs is asserted in tests.

    Band geometry 64 hashes / 16 bands of 4: candidate probability at
    jaccard s is 1-(1-s⁴)¹⁶ — 0.9996 at the 0.8 threshold, <2% at
    s=0.3 — and measured recall is 1.0 at sf0.01 AND sf0.1 while
    running ~37% faster than the earlier 128/32 geometry (half the
    signature kernel, half the banding rows)."""
    from .operators import dedup

    return dedup.minhash_dedup_pairs(
        _t(spark, sf_dir, "documents"), n=3, num_hashes=64, num_bands=16, threshold=0.8
    )


# NOTE (round 5): a simhash twin on the minhash-twin pattern is NOT
# constructible. Hamming-0 simhash pairs are not identical-multiset
# pairs — simhash is a per-bit majority VOTE, and two similar-but-
# distinct docs flip no sign when the tallies are away from zero
# (measured: 4 hamming-0 pairs at sf0.01, 41 at sf0.1, across
# all-distinct token multisets). Reproducing the signature in SQL
# would require xxhash64 in DuckDB. The simhash family keeps its
# pytest gates (vectorized kernel == per-doc grouped reference).
@register(
    "dedup_minhash_identical",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, {_TOKS} AS t FROM documents
    ), sigs AS (
      SELECT doc_id, md5(string_agg(g, chr(10) ORDER BY g)) AS sig FROM (
        SELECT doc_id, unnest(list_distinct(
                 list_transform(range(1, len(t) - 1),
                                i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2]))) AS g
        FROM toks WHERE len(t) >= 3
      ) GROUP BY doc_id
    )
    SELECT a.doc_id AS id_a, b.doc_id AS id_b
    FROM sigs a JOIN sigs b ON a.sig = b.sig AND a.doc_id < b.doc_id
    """,
)
def dedup_minhash_identical(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hash-checked twin for the MinHash-LSH family: the FULL pipeline
    (shingle → sign → band → candidate join → exact-Jaccard verify) at
    threshold 1.0, where recall is provably 1 — identical shingle SETS
    give identical signatures, which collide in EVERY band, and the
    exact verify keeps only Jaccard == 1.0 (a non-identical pair's
    Jaccard is ≤ 1 − 1/|union| < 1). The oracle computes the same
    identical-shingle-set pairs by canonical signature (sorted distinct
    3-grams, newline-joined — tokens are whitespace-split so no gram
    can contain the separator). Turns the minhash family's rows-only
    recall bound into a driver value-hash equality on its own pipeline."""
    from .operators import dedup

    pairs = dedup.minhash_dedup_pairs(
        _t(spark, sf_dir, "documents"), n=3, num_hashes=64, num_bands=16,
        threshold=1.0,
    )
    return dedup._register_cached(
        pairs.select("id_a", "id_b"), *getattr(pairs, "_pwp_cached", ())
    )


# Both incremental-dedup queries split the fixture corpus into an
# "already indexed" part (doc_id % 5 != 0) and a "new crawl batch"
# (doc_id % 5 == 0); the operators must return exactly the batch-run
# pairs that touch ≥1 new doc — which is what the oracle computes from
# the full table.
@register(
    "dedup_incremental_jaccard",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, {_TOKS} AS t FROM documents
    ), grams AS (
      SELECT doc_id, unnest(list_distinct(
               list_transform(range(1, len(t) - 1),
                              i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2]))) AS g
      FROM toks WHERE len(t) >= 3
    ), capped AS (
      SELECT doc_id, g FROM grams
      QUALIFY count(*) OVER (PARTITION BY g) <= {_NGRAM_MAX_DF}
    ), sizes AS (
      SELECT doc_id, count(*) AS n FROM capped GROUP BY doc_id
    ), inter AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS i
      FROM capped a JOIN capped b ON a.g = b.g AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    )
    SELECT id_a, id_b, CAST(i AS DOUBLE) / (sa.n + sb.n - i) AS jaccard
    FROM inter
    JOIN sizes sa ON id_a = sa.doc_id
    JOIN sizes sb ON id_b = sb.doc_id
    WHERE CAST(i AS DOUBLE) / (sa.n + sb.n - i) >= 0.8
      AND (id_a % 5 = 0 OR id_b % 5 = 0)
    """,
)
def dedup_incremental_jaccard_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental exact near-dup screen: a new batch against a
    materialized shingle index (`dedup.build_ngram_index`), WITHOUT
    re-shingling the corpus. Hash-checked against the batch oracle
    restricted to pairs touching the new docs — proving the
    incremental path loses nothing vs a full re-run."""
    from .operators import dedup

    docs = _t(spark, sf_dir, "documents")
    index = dedup.build_ngram_index(docs.filter(F.col("doc_id") % 5 != 0))
    return dedup.incremental_jaccard_pairs(
        index,
        docs.filter(F.col("doc_id") % 5 == 0),
        threshold=0.8,
        max_shingle_freq=_NGRAM_MAX_DF,
    )


@register("dedup_incremental_minhash", oracle=None)
def dedup_incremental_minhash_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental MinHash-LSH screen (the 100 TB batch-vs-index
    path): only the new batch is shingled and signed; the corpus
    contributes materialized (grams, signatures) index tables. No SQL
    oracle (seeded xxhash64 signature family is engine-specific);
    tests assert equality with the batch pipeline on the union
    restricted to touching-new pairs."""
    from .operators import dedup

    docs = _t(spark, sf_dir, "documents")
    grams, sigs = dedup.build_minhash_index(
        docs.filter(F.col("doc_id") % 5 != 0), num_hashes=64
    )
    result = dedup.incremental_minhash_pairs(
        grams, sigs, docs.filter(F.col("doc_id") % 5 == 0),
        num_hashes=64, num_bands=16, threshold=0.8,
    )
    # the inline-built index grams are persisted by build_minhash_index;
    # ride them on the result so release_intermediates frees everything
    return dedup._register_cached(result, grams)


_PROFILE_COLS = ["l_orderkey", "l_quantity", "l_extendedprice", "l_discount"]


@register(
    "profile_lineitem_stats",
    oracle="\nUNION ALL\n".join(
        f"""
    SELECT '{c}' AS col_name, count(*) AS n_rows, count({c}) AS n_nonnull,
           count(DISTINCT {c}) AS n_distinct,
           CAST(min({c}) AS DOUBLE) AS min_val, CAST(max({c}) AS DOUBLE) AS max_val
    FROM lineitem"""
        for c in _PROFILE_COLS
    ),
)
def profile_lineitem_stats_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Table profiling (the ANALYZE-statistics utility): per-column
    row/non-null/distinct counts and min/max in ONE scan — all aggs
    computed in a single pass, then unpivoted with stack(). Exact
    count-distinct here for oracle parity (Expand ×|cols| over the
    scan); the 100 TB form swaps in approx_count_distinct (HLL, no
    Expand) — the engine-specific sketches are declared separately as
    approx_stats."""
    li = _t(spark, sf_dir, "lineitem")
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    for c in _PROFILE_COLS:
        aggs += [
            F.count(c).alias(f"nn_{c}"),
            F.countDistinct(c).alias(f"nd_{c}"),
            F.min(F.col(c).cast("double")).alias(f"mn_{c}"),
            F.max(F.col(c).cast("double")).alias(f"mx_{c}"),
        ]
    stacked = ", ".join(
        f"'{c}', nn_{c}, nd_{c}, mn_{c}, mx_{c}" for c in _PROFILE_COLS
    )
    return li.agg(*aggs).selectExpr(
        f"stack({len(_PROFILE_COLS)}, {stacked}) AS (col_name, n_nonnull, n_distinct, min_val, max_val)",
        "n_rows",
    ).select("col_name", "n_rows", "n_nonnull", "n_distinct", "min_val", "max_val")


# The fixture corpus is synthetic word soup with no natural PII, so
# the query deterministically plants PII derived from row data —
# identical construction on both sides — and the operator under test
# (regex detection + ordered redaction, operators/pii.py) is what the
# hash check exercises.
_PII_PLANT_SQL = (
    "substr(text, 1, 60) || ' reach user' || CAST(doc_id AS VARCHAR)"
    " || '@corp-' || source || '.org call 415-555-'"
    " || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')"
    " || ' host 10.' || CAST(doc_id % 256 AS VARCHAR) || '.0.'"
    " || CAST((doc_id * 7) % 256 AS VARCHAR)"
    " || CASE WHEN doc_id % 3 = 0 THEN ' ssn 987-65-4321' ELSE '' END"
)


def _pii_plant_col() -> F.Column:
    return F.concat(
        F.substring("text", 1, 60),
        F.lit(" reach user"), F.col("doc_id").cast("string"),
        F.lit("@corp-"), F.col("source"), F.lit(".org call 415-555-"),
        F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
        F.lit(" host 10."), (F.col("doc_id") % 256).cast("string"),
        F.lit(".0."), ((F.col("doc_id") * 7) % 256).cast("string"),
        F.when(F.col("doc_id") % 3 == 0, F.lit(" ssn 987-65-4321")).otherwise(F.lit("")),
    )


@register(
    "text_pii_redaction",
    oracle=f"""
    WITH planted AS (
      SELECT doc_id, {_PII_PLANT_SQL} AS txt FROM documents
    )
    SELECT doc_id,
           {pii.oracle_count_sql('txt', pii.PII_PATTERNS['email'])} AS n_email,
           {pii.oracle_count_sql('txt', pii.PII_PATTERNS['ssn'])} AS n_ssn,
           {pii.oracle_count_sql('txt', pii.PII_PATTERNS['phone'])} AS n_phone,
           {pii.oracle_count_sql('txt', pii.PII_PATTERNS['ipv4'])} AS n_ipv4,
           CAST({' + '.join(pii.oracle_count_sql('txt', p) for p in pii.PII_PATTERNS.values())}
                AS BIGINT) AS pii_total,
           {pii.oracle_redact_sql('txt')} AS redacted
    FROM planted
    """,
)
def text_pii_redaction_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII audit + redaction (operators/pii.py): per-pattern match
    counts on the original text and sequentially redacted output, all
    JVM-side regex in one codegen stage. The oracle SQL is GENERATED
    from the same PII_PATTERNS constants (RE2/Java-agreeing subset) so
    the redacted strings hash-match byte-for-byte."""
    docs = _t(spark, sf_dir, "documents")
    planted = docs.select("doc_id", _pii_plant_col().alias("text"))
    return pii.scan_pii(planted)


@register("dedup_simhash", oracle=None)
def dedup_simhash_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup pairs: 64-bit fingerprints, pigeonhole quarter
    blocking, hamming ≤ 3 verification."""
    from .operators import dedup

    return dedup.simhash_near_pairs(_t(spark, sf_dir, "documents"), max_hamming=3)


@register(
    "dedup_embedding_cosine",
    oracle="""
    WITH v AS (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS em FROM embeddings
    ), n AS (
      -- zero-norm guard mirrors the engine kernel's _safe_norm:
      -- an all-zero vector gets norm 1 => cosine 0, never NaN
      SELECT vec_id, em,
             coalesce(nullif(sqrt(list_dot_product(em, em)), 0), 1) AS nrm
      FROM v
    )
    SELECT a.vec_id AS id_a, b.vec_id AS id_b,
           round(list_dot_product(a.em, b.em) / (a.nrm * b.nrm), 6) AS cosine
    FROM n a JOIN n b ON a.vec_id < b.vec_id
    WHERE round(list_dot_product(a.em, b.em) / (a.nrm * b.nrm), 6) >= 0.4
    """,
)
def dedup_embedding_cosine_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup pairs, exact ground truth: blocked
    numpy matmul against the broadcast normalized corpus (the
    brute-force contract — similarity matrix never shuffles). The
    100 TB path is the hyperplane-LSH-blocked variant
    (``dedup_embedding_lsh``). Threshold on ROUNDED cosine in both
    engines so float summation order cannot flip a boundary pair."""
    from .operators import dedup

    _prep(spark)
    return dedup.embedding_cosine_pairs_exact(
        _t(spark, sf_dir, "embeddings"), threshold=0.4
    )


@register("dedup_embedding_lsh", oracle=None)
def dedup_embedding_lsh_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup via hyperplane-LSH blocking: bucket
    collisions in ≥1 of 8 sign-pattern tables gate the exact cosine —
    never all-pairs. No SQL oracle (bucket set is engine-specific);
    recall vs the exact pairs is asserted in tests on clustered data
    (the near-dup regime). Threshold 0.4 here for non-empty rows on
    the driver's unclustered fixture."""
    from .operators import dedup

    _prep(spark)
    return dedup.embedding_cosine_pairs_lsh(
        _t(spark, sf_dir, "embeddings"), dim=64, threshold=0.4,
        num_planes=4, num_tables=16,
    )


@register(
    "text_token_counts",
    oracle=r"""
    WITH t AS (
      SELECT doc_id, lower(text) AS s,
             string_split_regex(trim(lower(text)), '\s+') AS ws
      FROM documents
    )
    SELECT doc_id,
           CAST(len(ws) AS BIGINT) AS ws_tokens,
           CAST(len(list_filter(
                  regexp_extract_all(s, '''[a-z]{1,2}| ?[a-z]+| ?[0-9]+| ?[^a-z0-9\s]+|\s+'),
                  x -> NOT regexp_matches(x, '^\s+$')
                )) AS BIGINT) AS bpe_ish_tokens
    FROM t
    """,
)
def text_token_counts_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token budgets both ways: whitespace tokens and the GPT-2-style
    BPE-ish regex pre-tokenizer count (contraction | space?+letters |
    space?+digits | space?+punct) — the regex subset chosen so Java
    regex and RE2 agree match-for-match."""
    from .operators import textops

    d = _t(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        textops.token_count(F.col("text")).alias("ws_tokens"),
        textops.bpe_ish_token_count(F.col("text")).alias("bpe_ish_tokens"),
    )


@register(
    "text_vocab_coverage",
    oracle=f"""
    WITH tok AS (
      SELECT doc_id, unnest({_TOKS}) AS tok FROM documents
    ), vocab AS (
      SELECT tok FROM (
        SELECT tok, count(*) AS freq FROM tok GROUP BY tok
      ) ORDER BY freq DESC, tok LIMIT 32
    )
    SELECT t.doc_id,
           CAST(count(*) AS BIGINT) AS n_tokens,
           CAST(sum(CASE WHEN v.tok IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_oov,
           round(CAST(sum(CASE WHEN v.tok IS NULL THEN 1 ELSE 0 END) AS DOUBLE)
                 / count(*), 6) AS oov_frac
    FROM tok t LEFT JOIN vocab v ON t.tok = v.tok
    GROUP BY t.doc_id
    """,
)
def text_vocab_coverage_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary-truncation coverage: top-32 corpus tokens as the
    vocab (freq desc, token tiebreak), per-doc OOV token share — the
    measurement that sizes a tokenizer vocabulary against a corpus.
    Plan: word-count agg + TakeOrdered(V) for the vocab, broadcast
    back into a per-doc count — nothing wider than V moves."""
    from .operators import textops

    d = _t(spark, sf_dir, "documents")
    return textops.vocab_coverage(d, vocab_size=32)


@register(
    "text_rolling_fingerprints",
    oracle="""
    WITH d AS (
      SELECT doc_id, trim(lower(text)) AS s FROM documents
    ), grams AS (
      SELECT doc_id, unnest(range(1, len(s) - 8 + 2)) AS pos, s
      FROM d WHERE len(s) >= 8
    ), hashed AS (
      SELECT doc_id, pos,
             list_reduce(
               list_prepend(CAST(0 AS BIGINT),
                 list_transform(range(0, 8),
                   j -> CAST(ascii(substr(s, CAST(pos + j AS INT), 1)) AS BIGINT))),
               (acc, c) -> (acc * 257 + c) % 2147483647
             ) AS h
      FROM grams
    ), winmin AS (
      SELECT doc_id, pos, h,
             min(h) OVER (PARTITION BY doc_id ORDER BY pos
                          ROWS BETWEEN 15 PRECEDING AND CURRENT ROW) AS wmin
      FROM hashed
    )
    SELECT doc_id, pos, h AS fingerprint FROM winmin WHERE h <= wmin
    """,
)
def text_rolling_fingerprints_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowing-style rolling-hash document fingerprints (MOSS,
    Schleimer 2003): char-8-gram polynomial hashes, local minima over
    a trailing 16-gram window. The hash is plain integer Horner
    arithmetic, so the DuckDB oracle reproduces every selected
    (pos, fingerprint) exactly."""
    from .operators import textops

    return textops.rolling_fingerprints(
        _t(spark, sf_dir, "documents"), k=8, w=16
    )


@register(
    "text_unigram_logprob",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, unnest({_TOKS}) AS term FROM documents
    ), tf AS (
      SELECT term, count(*) AS tf FROM toks GROUP BY term
    ), tot AS (
      SELECT sum(tf) AS n_total FROM tf
    ), lp AS (
      SELECT term, round(ln(CAST(tf AS DOUBLE) / n_total), 8) AS logp
      FROM tf, tot
    )
    SELECT doc_id,
           count(*) AS n_tokens,
           round({sql_dsum("logp")}, 6) AS logprob,
           round({sql_dsum("logp")} / count(*), 6) AS mean_logprob
    FROM toks JOIN lp USING (term)
    GROUP BY doc_id
    """,
)
def text_unigram_logprob_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unigram LM quality scoring over the corpus' own term
    distribution (the standard LM-filter for training-data curation):
    per-token log p rounded to 8dp before the exact decimal sum, so
    both engines' log() agree on every compared digit."""
    from .operators import textops

    return textops.unigram_logprob(_t(spark, sf_dir, "documents"))


def _lang_id_oracle() -> str:
    """DuckDB twin of textops.lang_id: per-language trigram-occurrence
    scores via non-overlapping replace-length counting (the same
    semantics as Python str.count), argmax with profile-order
    tie-break, 'und' when every score is zero. Generated from the
    SAME _LANG_PROFILES the UDF uses, so the two can never drift."""
    from .operators.textops import _LANG_PROFILES

    def score(grams):
        return "(" + " + ".join(
            f"(len(s) - len(replace(s, '{g}', ''))) / 3" for g in grams
        ) + ")"

    branches = "\nUNION ALL\n".join(
        f"SELECT doc_id, '{lang}' AS lang, {i} AS ord, {score(grams)} AS score FROM t"
        for i, (lang, grams) in enumerate(_LANG_PROFILES.items())
    )
    return f"""
    WITH t AS (SELECT doc_id, coalesce(lower(text), '') AS s FROM documents),
    scores AS ({branches}),
    best AS (
      SELECT doc_id, lang, score,
             row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, ord) AS rn
      FROM scores
    )
    SELECT d.doc_id, d.lang,
           CASE WHEN b.score > 0 THEN b.lang ELSE 'und' END AS lang_pred
    FROM documents d JOIN best b ON d.doc_id = b.doc_id AND b.rn = 1
    """


@register("text_lang_id", oracle=_lang_id_oracle())
def text_lang_id_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trigram-profile language ID (vectorized Pandas UDF), now
    hash-checked against a pure-SQL twin of the scoring function
    (accuracy itself is asserted on the per-language-vocabulary corpus
    in test_llm_ops.py)."""
    from .operators import textops

    d = _t(spark, sf_dir, "documents")
    return d.select("doc_id", "lang", textops.lang_id(F.col("text")).alias("lang_pred"))


@register(
    "sim_bruteforce_topk",
    oracle="""
    WITH q AS (
      SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qv
      FROM embeddings WHERE vec_id < 10
    ), c AS (
      SELECT vec_id AS neighbor_id, CAST(embedding AS DOUBLE[]) AS cv
      FROM embeddings
    ), scored AS (
      SELECT query_id, neighbor_id,
             round(list_dot_product(qv, cv)
                   / (sqrt(list_dot_product(qv, qv)) * sqrt(list_dot_product(cv, cv))), 6) AS sim
      FROM q, c WHERE query_id <> neighbor_id
    )
    SELECT query_id, neighbor_id, sim, rn FROM (
      SELECT *, CAST(row_number() OVER (PARTITION BY query_id
                     ORDER BY sim DESC, neighbor_id) AS INT) AS rn
      FROM scored
    ) WHERE rn <= 10
    """,
)
def sim_bruteforce_topk_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact cosine top-10 for 10 query vectors: broadcast queries,
    numpy-matmul partial top-k per corpus partition, merge — the
    all-pairs matrix never shuffles. Ranked by round(sim, 6) in both
    engines so summation order cannot flip ranks."""
    from .operators import similarity

    emb = _t(spark, sf_dir, "embeddings")
    return similarity.brute_force_topk(
        spark, corpus=emb, queries=emb.filter(F.col("vec_id") < 10), k=10, round_to=6
    )


@register(
    "sim_jvm_cosine_topk",
    oracle="""
    WITH q AS (
      SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qv
      FROM embeddings WHERE vec_id < 10 AND list_dot_product(embedding, embedding) > 0
    ), c AS (
      SELECT vec_id AS neighbor_id, CAST(embedding AS DOUBLE[]) AS cv
      FROM embeddings WHERE list_dot_product(embedding, embedding) > 0
    ), scored AS (
      SELECT query_id, neighbor_id,
             round(list_dot_product(qv, cv)
                   / (sqrt(list_dot_product(qv, qv)) * sqrt(list_dot_product(cv, cv))), 6) AS sim
      FROM q, c WHERE query_id <> neighbor_id
    )
    SELECT query_id, neighbor_id, sim, rn FROM (
      SELECT *, CAST(row_number() OVER (PARTITION BY query_id
                     ORDER BY sim DESC, neighbor_id) AS INT) AS rn
      FROM scored
    ) WHERE rn <= 10
    """,
)
def sim_jvm_cosine_topk_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The same exact cosine top-10 as sim_bruteforce_topk, computed
    ENTIRELY with built-in JVM higher-order functions (zip_with +
    aggregate fold dot products, broadcast query side) — zero Python
    workers in the plan, proving the vectorized kernel and the
    declarative path agree bit-for-bit on the same rounded-rank
    protocol (zero-norm vectors excluded on both sides — no defined
    cosine, no NaN in the rank)."""
    from .operators import similarity

    emb = _t(spark, sf_dir, "embeddings")
    return similarity.jvm_cosine_topk(
        corpus=emb, queries=emb.filter(F.col("vec_id") < 10), k=10, round_to=6
    )


@register("sim_lsh_topk", oracle=None)
def sim_lsh_topk_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate top-k via random-hyperplane LSH (16 tables × 4
    planes — tuned for the weak-similarity regime of this corpus:
    collision prob per table (1-θ/π)^planes, so fewer planes = higher
    recall at more candidates). Recall vs brute force asserted in
    tests."""
    from .operators import similarity

    emb = _t(spark, sf_dir, "embeddings")
    return similarity.lsh_topk(
        spark, corpus=emb, queries=emb.filter(F.col("vec_id") < 10),
        dim=64, k=10, num_planes=4, num_tables=16,
    )


@register("multimodal_features", oracle=None)
def multimodal_features_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal pipeline: deterministic media table with REAL BMP /
    WAV blobs → metadata-pruned decode (pure-python codecs; mp4 still
    fake — no libav in container) → per-item feature vectors via
    Arrow-batched mapInPandas. Returns (media_id, modality,
    feature norm) — stable schema/rows."""
    from .operators import multimodal as mm

    _prep(spark)
    media = mm.synthetic_media(spark, n=64, seed=42)
    feats = mm.extract_features(media)
    norm = F.sqrt(
        F.aggregate(F.transform("feat", lambda x: x * x), F.lit(0.0), lambda a, x: a + x)
    )
    return feats.select("media_id", "modality", F.round(norm, 6).alias("feat_norm"))


@register("sim_ivf_topk", oracle=None)
def sim_ivf_topk_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-Flat ANN (coarse k-means quantizer, nprobe cells scored):
    the index of choice when embeddings have cluster structure; on
    this (random) corpus recall ≈ probed fraction — asserted against
    clustered data in tests."""
    from .operators import similarity

    emb = _t(spark, sf_dir, "embeddings")
    return similarity.ivf_topk(
        spark, corpus=emb, queries=emb.filter(F.col("vec_id") < 10),
        k=10, n_cells=16, nprobe=4,
    )


# ---------------------------------------------------------------------
# Hash-checked ANN twins. The rows-only sim_ivf_topk / sim_lsh_topk
# queries get oracle-checked companions on a CLUSTERED fixture both
# engines derive deterministically from the embeddings table:
# cluster c = vec_id % 8, vector = one_hot(8c) + 0.05 * embedding.
# Geometry: centers are orthogonal unit vectors, the jitter norm is
# ~0.1, so within-cluster cosine is ~0.99 and cross-cluster ~|0.01| —
# every true top-5 neighbor is in the query's own cluster (>=62
# members per cluster at every SF). The ANN methods' candidate sets
# provably cover the cluster (IVF: near-identical vectors land in the
# same k-means cell whatever the fit, and the query probes it first;
# LSH: 16 tables x 4 planes ⇒ P(miss a ~0.99-similar pair) < 1e-9,
# and the pipeline is seeded/deterministic) — so candidates ⊇ exact
# top-5 and the candidate-restricted exact re-score EQUALS the exact
# top-5: the recall property becomes a value-hash equality the driver
# checks, not a rows-only count.


def _ann_clustered_oracle(k: int = 5) -> str:
    return f"""
    WITH v AS (
      SELECT vec_id,
             [ (CASE WHEN i = (vec_id % 8) * 8 + 1 THEN 1.0 ELSE 0.0 END)
               + 0.05 * CAST(embedding[i] AS DOUBLE)
               FOR i IN generate_series(1, 64) ] AS vec
      FROM embeddings
    ), q AS (
      SELECT vec_id AS query_id, vec AS qv FROM v WHERE vec_id < 10
    ), c AS (
      SELECT vec_id AS neighbor_id, vec AS cv FROM v
    ), scored AS (
      SELECT query_id, neighbor_id,
             round(list_dot_product(qv, cv)
                   / (sqrt(list_dot_product(qv, qv)) * sqrt(list_dot_product(cv, cv))), 6) AS sim
      FROM q, c WHERE query_id <> neighbor_id
    )
    SELECT query_id, neighbor_id, sim, rn FROM (
      SELECT *, CAST(row_number() OVER (PARTITION BY query_id
                     ORDER BY sim DESC, neighbor_id) AS INT) AS rn
      FROM scored
    ) WHERE rn <= {k}
    """


def _clustered_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The Spark half of the clustered fixture (same expression as the
    oracle CTE ``v``, 1-based positions in both engines)."""
    emb = _t(spark, sf_dir, "embeddings")
    ctr = (F.col("vec_id") % 8) * 8 + 1
    vec = F.transform(
        F.sequence(F.lit(1), F.lit(64)),
        lambda i: F.when(i == ctr, F.lit(1.0)).otherwise(F.lit(0.0))
        + F.lit(0.05) * F.element_at(F.col("embedding"), i).cast("double"),
    )
    return emb.select("vec_id", vec.alias("embedding"))


@register("sim_ivf_topk_clustered", oracle=_ann_clustered_oracle())
def sim_ivf_topk_clustered(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-Flat ANN under the driver's HASH gate: on the clustered
    fixture the probed cells provably contain every true neighbor, so
    the IVF result must equal the oracle's exact cosine top-5 —
    value-for-value, not just row counts. Rank protocol: round(sim,6)
    with neighbor_id tiebreak, like the exact sim queries."""
    from .operators import similarity

    v = _clustered_embeddings(spark, sf_dir)
    return similarity.ivf_topk(
        spark, corpus=v, queries=v.filter(F.col("vec_id") < 10),
        k=5, n_cells=8, nprobe=4, round_to=6,
    )


@register("sim_lsh_topk_clustered", oracle=_ann_clustered_oracle())
def sim_lsh_topk_clustered(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hyperplane-LSH ANN under the driver's HASH gate: seeded
    deterministic planes; on the clustered fixture the 16-table union
    of bucket collisions covers the query's cluster, so the
    candidate-restricted exact re-score must equal the oracle's exact
    cosine top-5."""
    from .operators import similarity

    v = _clustered_embeddings(spark, sf_dir)
    return similarity.lsh_topk(
        spark, corpus=v, queries=v.filter(F.col("vec_id") < 10),
        dim=64, k=5, num_planes=4, num_tables=16, round_to=6,
    )


@register(
    "dedup_embedding_lsh_clustered",
    oracle="""
    WITH v AS (
      SELECT vec_id,
             [ (CASE WHEN i = (vec_id % 8) * 8 + 1 THEN 1.0 ELSE 0.0 END)
               + 0.05 * CAST(embedding[i] AS DOUBLE)
               FOR i IN generate_series(1, 64) ] AS vec
      FROM embeddings
    ), scored AS (
      SELECT a.vec_id AS id_a, b.vec_id AS id_b,
             round(list_dot_product(a.vec, b.vec)
                   / (sqrt(list_dot_product(a.vec, a.vec))
                      * sqrt(list_dot_product(b.vec, b.vec))), 6) AS cosine
      FROM v a JOIN v b ON a.vec_id < b.vec_id
    )
    SELECT id_a, id_b, cosine FROM scored WHERE cosine >= 0.9
    """,
)
def dedup_embedding_lsh_clustered(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The hyperplane-LSH embedding near-dup pipeline under the
    driver's HASH gate: on the clustered fixture every qualifying
    pair (within-cluster cosine ~0.99 ≥ 0.9) collides in ≥1 of the
    16 sign-pattern tables with probability 1 - ~6e-13, so the
    candidates-only pipeline must return EXACTLY the all-pairs
    oracle's qualifying set — the recall property of
    `dedup_embedding_lsh` (rows-only on the weak-similarity fixture,
    recall ≥0.9 asserted in tests) becomes a value-hash equality
    here, the same promotion `dedup_minhash_identical` gives the
    MinHash family."""
    from .operators import dedup

    v = _clustered_embeddings(spark, sf_dir)
    return dedup.embedding_cosine_pairs_lsh(
        v, dim=64, threshold=0.9, num_planes=4, num_tables=16
    )


@register(
    "dedup_incremental_embedding",
    oracle="""
    WITH v AS (
      SELECT vec_id,
             [ (CASE WHEN i = (vec_id % 8) * 8 + 1 THEN 1.0 ELSE 0.0 END)
               + 0.05 * CAST(embedding[i] AS DOUBLE)
               FOR i IN generate_series(1, 64) ] AS vec
      FROM embeddings
    ), scored AS (
      SELECT a.vec_id AS id_a, b.vec_id AS id_b,
             round(list_dot_product(a.vec, b.vec)
                   / (sqrt(list_dot_product(a.vec, a.vec))
                      * sqrt(list_dot_product(b.vec, b.vec))), 6) AS cosine
      FROM v a JOIN v b
        ON a.vec_id < b.vec_id AND (a.vec_id < 100 OR b.vec_id < 100)
    )
    SELECT id_a, id_b, cosine FROM scored WHERE cosine >= 0.9
    """,
)
def dedup_incremental_embedding_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental embedding-cosine dedup under the driver's HASH
    gate: vectors ≥100 form the indexed corpus ((vec, norm) + 16-table
    hyperplane sig tables, the `write_embedding_index` layout); the
    <100 batch is screened against it — the crawl-loop shape for
    embedded corpora, where per-batch cost scales with bucket
    collisions, never the corpus. On the clustered fixture every
    qualifying pair (within-cluster cosine ~0.99 ≥ 0.9) collides in
    ≥1 of the 16 tables with probability 1 - ~6e-13, so the screen's
    output must EQUAL the oracle's exact touching-new pair set —
    value-hash, not rows-only. Cross-cluster pairs (~0.01) can collide
    but never survive the exact verify."""
    from .operators import dedup

    v = _clustered_embeddings(spark, sf_dir)
    corpus = v.filter(F.col("vec_id") >= 100)
    batch = v.filter(F.col("vec_id") < 100)
    vecs, sigs = dedup.build_embedding_index(
        corpus, dim=64, num_planes=4, num_tables=16
    )
    return dedup.incremental_embedding_pairs(
        vecs, sigs, batch, dim=64, threshold=0.9, num_planes=4, num_tables=16
    )


# =====================================================================
# Relational completeness batch 2 (SURVEY §2.12): semi/anti joins,
# conditional aggregation, rollup/cube/grouping sets, sessionization,
# pivot, date functions, set ops.
# =====================================================================


@register(
    "q4_order_priority",
    oracle="""
    SELECT o_orderpriority, count(*) AS order_count
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderdate < TIMESTAMP '1997-01-01'
      AND EXISTS (SELECT 1 FROM lineitem
                  WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate)
    GROUP BY o_orderpriority
    """,
)
def q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: EXISTS → left semi join (no row duplication,
    no distinct needed — the semi join IS the dedup)."""
    o = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.to_timestamp(F.lit("1996-01-01")))
        & (F.col("o_orderdate") < F.to_timestamp(F.lit("1997-01-01")))
    )
    li = _t(spark, sf_dir, "lineitem")
    return (
        o.join(li, (o.o_orderkey == li.l_orderkey) & (li.l_shipdate > o.o_orderdate), "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
    )


@register(
    "q6_revenue_forecast",
    oracle=f"""
    SELECT {sql_dsum("l_extendedprice * l_discount")} AS revenue,
           count(*) AS n_items
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1997-01-01'
      AND l_shipdate < TIMESTAMP '1998-01-01'
      AND l_discount BETWEEN 0.02 AND 0.06
      AND l_quantity < 10
    """,
)
def q6_revenue_forecast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 shape: pure filter + scalar agg — every predicate
    reaches the parquet scan (PushedFilters), zero joins, one-row
    result; the canonical pushdown check."""
    li = _t(spark, sf_dir, "lineitem")
    return li.filter(
        (F.col("l_shipdate") >= F.to_timestamp(F.lit("1997-01-01")))
        & (F.col("l_shipdate") < F.to_timestamp(F.lit("1998-01-01")))
        & (F.col("l_discount") >= 0.02)
        & (F.col("l_discount") <= 0.06)
        & (F.col("l_quantity") < 10)
    ).agg(
        dsum(F.col("l_extendedprice") * F.col("l_discount")).alias("revenue"),
        F.count(F.lit(1)).alias("n_items"),
    )


@register(
    "q10_returned_items",
    oracle=f"""
    SELECT c_custkey, c_name,
           {sql_dsum("l_extendedprice * (1 - l_discount)")} AS revenue,
           n_name
    FROM customer
    JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN nation ON c_nationkey = n_nationkey
    WHERE l_returnflag = 'R'
      AND o_orderdate >= TIMESTAMP '1997-01-01'
      AND o_orderdate < TIMESTAMP '1998-01-01'
    GROUP BY c_custkey, c_name, n_name
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
)
def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape: fact-to-fact join + two broadcast dims +
    top-20 (TakeOrdered over the aggregated, already-small result)."""
    cu = _t(spark, sf_dir, "customer")
    na = _t(spark, sf_dir, "nation")
    o = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.to_timestamp(F.lit("1997-01-01")))
        & (F.col("o_orderdate") < F.to_timestamp(F.lit("1998-01-01")))
    )
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    disc = F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(cu), o.o_custkey == cu.c_custkey)
        .join(F.broadcast(na), cu.c_nationkey == na.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(dsum(disc).alias("revenue"))
        .select("c_custkey", "c_name", "revenue", "n_name")
        .orderBy(F.col("revenue").desc(), "c_custkey")
        .limit(20)
    )


@register(
    "q14_promo_effect",
    oracle=f"""
    SELECT 100.0 * {sql_dsum("CASE WHEN p_type = 'PROMO' THEN l_extendedprice * (1 - l_discount) ELSE 0.0 END")}
                 / {sql_dsum("l_extendedprice * (1 - l_discount)")} AS promo_revenue_pct
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE l_shipdate >= TIMESTAMP '1997-03-01'
      AND l_shipdate < TIMESTAMP '1997-04-01'
    """,
)
def q14_promo_effect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape: conditional-aggregation ratio; part is
    broadcast, so the month of lineitem never shuffles."""
    from .operators.relational import conditional_ratio

    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.to_timestamp(F.lit("1997-03-01")))
        & (F.col("l_shipdate") < F.to_timestamp(F.lit("1997-04-01")))
    )
    p = _t(spark, sf_dir, "part")
    disc = F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .agg(conditional_ratio(F.col("p_type") == "PROMO", disc).alias("promo_revenue_pct"))
    )


@register(
    "q18_large_orders",
    oracle=f"""
    SELECT c_custkey, o_orderkey, o_orderdate,
           CAST(o_totalprice AS DOUBLE) AS o_totalprice,
           {sql_dsum("l_quantity")} AS total_qty
    FROM customer
    JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON o_orderkey = l_orderkey
    GROUP BY c_custkey, o_orderkey, o_orderdate, o_totalprice
    HAVING {sql_dsum("l_quantity")} > 120
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 20
    """,
)
def q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape: group-by + HAVING over a join, top-20."""
    cu = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(cu), o.o_custkey == cu.c_custkey)
        .groupBy("c_custkey", "o_orderkey", "o_orderdate", "o_totalprice")
        .agg(dsum("l_quantity").alias("total_qty"))
        .filter(F.col("total_qty") > 120)
        .select(
            "c_custkey", "o_orderkey", "o_orderdate",
            F.col("o_totalprice").cast("double").alias("o_totalprice"), "total_qty",
        )
        .orderBy(F.col("o_totalprice").desc(), "o_orderkey")
        .limit(20)
    )


@register(
    "rollup_order_stats",
    oracle=f"""
    SELECT o_orderpriority, o_orderstatus,
           count(*) AS n, {sql_dsum("o_totalprice")} AS total
    FROM orders
    GROUP BY ROLLUP (o_orderpriority, o_orderstatus)
    """,
)
def rollup_order_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP hierarchy totals (priority → status → grand total)."""
    o = _t(spark, sf_dir, "orders")
    return o.rollup("o_orderpriority", "o_orderstatus").agg(
        F.count(F.lit(1)).alias("n"), dsum("o_totalprice").alias("total")
    )


@register(
    "cube_event_stats",
    oracle=f"""
    SELECT event_type, user_id % 10 AS cohort,
           count(*) AS n, {sql_dsum("value")} AS total_value
    FROM events
    GROUP BY CUBE (event_type, cohort)
    """,
)
def cube_event_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over (event_type, cohort) — all 4 grouping combinations."""
    ev = _t(spark, sf_dir, "events").withColumn("cohort", F.col("user_id") % 10)
    return ev.cube("event_type", "cohort").agg(
        F.count(F.lit(1)).alias("n"), dsum("value").alias("total_value")
    )


@register(
    "grouping_sets_lineitem",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           count(*) AS n, {sql_dsum("l_quantity")} AS qty
    FROM lineitem
    GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
    """,
)
def grouping_sets_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS (each flag alone + grand total)."""
    li = _t(spark, sf_dir, "lineitem")
    return li.groupingSets(
        [["l_returnflag"], ["l_linestatus"], []], "l_returnflag", "l_linestatus"
    ).agg(F.count(F.lit(1)).alias("n"), dsum("l_quantity").alias("qty"))


@register(
    "sessionize_events",
    oracle="""
    WITH marked AS (
      SELECT user_id, ts, event_id,
             CASE WHEN lag(epoch_us(ts)) OVER w IS NULL
                       OR epoch_us(ts) - lag(epoch_us(ts)) OVER w > 1800000000
                  THEN 1 ELSE 0 END AS new_s
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), sessions AS (
      SELECT user_id, ts,
             CAST(sum(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
                              ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
      FROM marked
    )
    SELECT user_id, session_id, min(ts) AS session_start,
           max(ts) AS session_end, count(*) AS n_events
    FROM sessions GROUP BY user_id, session_id
    """,
)
def sessionize_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sessionization (30-min gap) via gaps-and-islands — two window
    passes over ONE (user, ts) partitioning, then the session agg;
    exact integer-microsecond gap comparisons."""
    from .operators.relational import sessionize

    return sessionize(_t(spark, sf_dir, "events"), gap_seconds=1800)


@register(
    "pivot_event_counts",
    oracle="""
    SELECT user_id % 10 AS cohort,
           count(*) FILTER (WHERE event_type = 'click')    AS click,
           count(*) FILTER (WHERE event_type = 'view')     AS view,
           count(*) FILTER (WHERE event_type = 'purchase') AS purchase,
           count(*) FILTER (WHERE event_type = 'signup')   AS signup,
           count(*) FILTER (WHERE event_type = 'error')    AS error
    FROM events GROUP BY cohort
    """,
)
def pivot_event_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot with an explicit value list (inferred lists cost an extra
    scan and give nondeterministic column order at scale)."""
    from .operators.relational import pivot_counts

    ev = _t(spark, sf_dir, "events").withColumn("cohort", F.col("user_id") % 10)
    return pivot_counts(ev, "cohort", "event_type",
                        ["click", "view", "purchase", "signup", "error"])


@register(
    "date_parts_orders",
    oracle="""
    SELECT CAST(year(o_orderdate) AS INT) AS yr,
           CAST(quarter(o_orderdate) AS INT) AS qtr,
           CAST(month(o_orderdate) AS INT) AS mth,
           CAST(dayofweek(o_orderdate) + 1 AS INT) AS dow,
           date_trunc('month', o_orderdate) AS month_start,
           count(*) AS n
    FROM orders
    GROUP BY 1, 2, 3, 4, 5
    """,
)
def date_parts_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date-function parity: year/quarter/month/dow/date_trunc
    (DuckDB's dayofweek is 0-based Sunday; Spark's is 1-based —
    normalized in the oracle)."""
    o = _t(spark, sf_dir, "orders")
    return (
        o.select(
            F.year("o_orderdate").alias("yr"),
            F.quarter("o_orderdate").alias("qtr"),
            F.month("o_orderdate").alias("mth"),
            F.dayofweek("o_orderdate").alias("dow"),
            F.date_trunc("month", F.col("o_orderdate")).alias("month_start"),
        )
        .groupBy("yr", "qtr", "mth", "dow", "month_start")
        .agg(F.count(F.lit(1)).alias("n"))
    )


@register(
    "intersect_trading_nations",
    oracle="""
    SELECT c_nationkey AS nationkey FROM customer
    INTERSECT
    SELECT s_nationkey AS nationkey FROM supplier
    """,
)
def intersect_trading_nations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT set op (nations with both customers and suppliers)."""
    cu = _t(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    su = _t(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return cu.intersect(su)


@register(
    "semi_customers_with_orders",
    oracle="""
    SELECT c_custkey, c_mktsegment FROM customer
    WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
    """,
)
def semi_customers_with_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left semi join — P6's key-membership predicate, positive form."""
    cu = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    return cu.join(o, cu.c_custkey == o.o_custkey, "left_semi").select(
        "c_custkey", "c_mktsegment"
    )


@register(
    "count_distinct_parts_per_supplier",
    oracle="""
    SELECT l_suppkey, count(DISTINCT l_partkey) AS n_parts,
           count(*) AS n_items
    FROM lineitem GROUP BY l_suppkey
    """,
)
def count_distinct_parts_per_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """COUNT DISTINCT (expands to a two-phase partial-distinct plan —
    no naive collect-set)."""
    li = _t(spark, sf_dir, "lineitem")
    return li.groupBy("l_suppkey").agg(
        F.countDistinct("l_partkey").alias("n_parts"),
        F.count(F.lit(1)).alias("n_items"),
    )


@register(
    "join_left_outer_order_counts",
    oracle="""
    SELECT c_custkey, count(o_orderkey) AS n_orders
    FROM customer LEFT JOIN orders ON c_custkey = o_custkey
    GROUP BY c_custkey
    """,
)
def join_left_outer_order_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left outer join preserving customers with zero orders
    (count(col) skips the nulls the outer join introduces)."""
    cu = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    return (
        cu.join(o, cu.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("n_orders"))
    )


@register(
    "join_full_outer_nation_presence",
    oracle="""
    WITH cn AS (SELECT DISTINCT c_nationkey AS nk FROM customer),
         sn AS (SELECT DISTINCT s_nationkey AS nk FROM supplier)
    SELECT coalesce(cn.nk, sn.nk) AS nationkey,
           cn.nk IS NOT NULL AS has_customers,
           sn.nk IS NOT NULL AS has_suppliers
    FROM cn FULL OUTER JOIN sn ON cn.nk = sn.nk
    """,
)
def join_full_outer_nation_presence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full outer join: which nations have customers and/or
    suppliers."""
    cn = _t(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nk")).distinct()
    sn = _t(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nk")).distinct()
    j = cn.alias("cn").join(sn.alias("sn"), F.col("cn.nk") == F.col("sn.nk"), "full_outer")
    return j.select(
        F.coalesce(F.col("cn.nk"), F.col("sn.nk")).alias("nationkey"),
        F.col("cn.nk").isNotNull().alias("has_customers"),
        F.col("sn.nk").isNotNull().alias("has_suppliers"),
    )


@register(
    "theta_price_band_join",
    oracle="""
    WITH bands(band, lo, hi) AS (
      VALUES ('small', 0.0, 50000.0),
             ('medium', 50000.0, 150000.0),
             ('large', 150000.0, 1e12)
    )
    SELECT band, count(*) AS n_orders
    FROM orders JOIN bands ON o_totalprice >= lo AND o_totalprice < hi
    GROUP BY band
    """,
)
def theta_price_band_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theta/range join: orders banded by non-equi conditions against
    a broadcast band dim — broadcast nested loop on a 3-row side, the
    right physical choice (never a cartesian against a big side)."""
    o = _t(spark, sf_dir, "orders")
    bands = spark.createDataFrame(
        [("small", 0.0, 50000.0), ("medium", 50000.0, 150000.0), ("large", 150000.0, 1e12)],
        "band string, lo double, hi double",
    )
    return (
        o.join(
            F.broadcast(bands),
            (o.o_totalprice >= bands.lo) & (o.o_totalprice < bands.hi),
        )
        .groupBy("band")
        .agg(F.count(F.lit(1)).alias("n_orders"))
    )


@register(
    "union_event_sources",
    oracle="""
    SELECT kind, count(*) AS n FROM (
      SELECT 'purchase' AS kind, user_id FROM events WHERE event_type = 'purchase'
      UNION ALL
      SELECT 'error' AS kind, user_id FROM events WHERE event_type = 'error'
    ) GROUP BY kind
    """,
)
def union_event_sources(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Union-all of typed sub-streams (S5's regex-union shape)."""
    ev = _t(spark, sf_dir, "events")
    a = ev.filter(F.col("event_type") == "purchase").select(
        F.lit("purchase").alias("kind"), "user_id"
    )
    b = ev.filter(F.col("event_type") == "error").select(
        F.lit("error").alias("kind"), "user_id"
    )
    return a.unionByName(b).groupBy("kind").agg(F.count(F.lit(1)).alias("n"))


@register(
    "median_value_per_type",
    oracle="""
    SELECT event_type,
           round(quantile_cont(value, 0.5), 6) AS median_value,
           round(quantile_cont(value, 0.9), 6) AS p90_value
    FROM events GROUP BY event_type
    """,
)
def median_value_per_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles (Spark ``percentile`` ==
    DuckDB ``quantile_cont``); the approximate variant
    (percentile_approx / approx_count_distinct) is engine-specific and
    therefore not oracle-checked."""
    ev = _t(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.round(F.expr("percentile(value, 0.5)"), 6).alias("median_value"),
        F.round(F.expr("percentile(value, 0.9)"), 6).alias("p90_value"),
    )


@register("approx_stats", oracle=None)
def approx_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate distinct + quantile sketches (HLL++ / KLL) — the
    100 TB cardinality tools; engine-specific sketches ⇒ rows-only
    check (bounds asserted in tests and, hash-checked, in
    ``approx_stats_bounded``)."""
    ev = _t(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.approx_count_distinct("user_id").alias("approx_users"),
        F.percentile_approx("value", 0.5).alias("approx_median"),
    )


@register(
    "approx_stats_bounded",
    oracle="""
    SELECT event_type,
           count(DISTINCT user_id) AS exact_users,
           round(quantile_cont(value, 0.5), 6) AS exact_median
    FROM events GROUP BY event_type
    """,
)
def approx_stats_bounded(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The hash-checked twin of ``approx_stats``: returns the EXACT
    per-group stats (oracle-compared value-for-value) and, before
    returning, asserts the approximate sketches land inside their
    error bounds against those exact values — HLL++ within 3·rsd
    (rsd=0.05 ⇒ 15%), percentile_approx inside the exact p45..p55
    band (its default-accuracy rank error is ~0.01%, far tighter).
    Both sketches are deterministic given the data, so this is a
    stable gate, not a flaky one: a sketch regression fails the query
    (the driver records an err), while the returned values stay
    SQL-exact."""
    ev = _t(spark, sf_dir, "events")
    # ONE scan + ONE aggregation computes exact AND approx together;
    # the handful of per-event_type rows is collected once, the sketch
    # bounds are checked driver-side, and the returned frame is built
    # from the same collected exact values (so the gate costs nothing
    # beyond the single agg — the earlier form ran the exact agg twice
    # plus an eager gate count)
    rows = (
        ev.groupBy("event_type")
        .agg(
            F.countDistinct("user_id").alias("exact_users"),
            F.round(F.expr("percentile(value, 0.5)"), 6).alias("exact_median"),
            F.round(F.expr("percentile(value, 0.45)"), 6).alias("_p45"),
            F.round(F.expr("percentile(value, 0.55)"), 6).alias("_p55"),
            F.approx_count_distinct("user_id", rsd=0.05).alias("_approx_users"),
            F.percentile_approx("value", 0.5).alias("_approx_median"),
        )
        .collect()
    )
    bad = [
        r.event_type
        for r in rows
        if abs(r._approx_users - r.exact_users) > 0.15 * r.exact_users
        or not (r._p45 <= r._approx_median <= r._p55)
    ]
    if bad:
        raise AssertionError(f"approx sketches out of bounds for {bad}")
    return spark.createDataFrame(
        [(r.event_type, r.exact_users, r.exact_median) for r in rows],
        "event_type string, exact_users bigint, exact_median double",
    )


@register(
    "text_tfidf_top_terms",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, unnest({_TOKS}) AS term FROM documents
    ), tf AS (
      SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY doc_id, term
    ), df AS (
      SELECT term, count(DISTINCT doc_id) AS df FROM tf GROUP BY term
    ), n AS (
      SELECT count(*) AS n_docs FROM documents
    ), scored AS (
      SELECT tf.doc_id, tf.term,
             round(tf.tf * (ln((n.n_docs + 1.0) / (df.df + 1.0)) + 1.0), 6) AS tfidf
      FROM tf JOIN df USING (term) CROSS JOIN n
    )
    SELECT doc_id, term, tfidf, rn FROM (
      SELECT *, CAST(row_number() OVER (PARTITION BY doc_id
                     ORDER BY tfidf DESC, term) AS INT) AS rn
      FROM scored
    ) WHERE rn <= 5
    """,
)
def text_tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TF-IDF (smoothed idf, sklearn-style ln((N+1)/(df+1))+1) with
    top-5 terms per doc. All JVM-side: explode → two aggregations →
    broadcast-join the (tiny) df table back. Ranked by rounded score
    so libm ulp differences cannot flip ranks."""
    d = _t(spark, sf_dir, "documents")
    from .operators.textops import tokens as _tok

    toks = d.select("doc_id", F.explode(_tok("text")).alias("term"))
    tf = toks.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    dfreq = tf.groupBy("term").agg(F.countDistinct("doc_id").alias("df"))
    n_docs = d.count()  # scalar; the oracle's CROSS JOIN n
    scored = tf.join(F.broadcast(dfreq), "term").select(
        "doc_id",
        "term",
        F.round(
            F.col("tf") * (F.log((F.lit(n_docs) + 1.0) / (F.col("df") + 1.0)) + 1.0), 6
        ).alias("tfidf"),
    )
    w = Window.partitionBy("doc_id").orderBy(F.col("tfidf").desc(), "term")
    return (
        scored.withColumn("rn", F.row_number().over(w).cast("int"))
        .filter(F.col("rn") <= 5)
        .select("doc_id", "term", "tfidf", "rn")
    )


@register(
    "q2ish_min_cost_supplier",
    oracle=f"""
    WITH ps AS (
      SELECT l_partkey AS partkey, l_suppkey AS suppkey,
             {sql_dsum("l_extendedprice")} AS cost
      FROM lineitem GROUP BY 1, 2
    ), mins AS (
      SELECT partkey, min(cost) AS mincost FROM ps GROUP BY partkey
    )
    SELECT ps.partkey, ps.suppkey, ps.cost
    FROM ps JOIN mins ON ps.partkey = mins.partkey AND ps.cost = mins.mincost
    """,
)
def q2ish_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape: correlated min — cheapest supplier per part,
    decorrelated into agg + self-join (Catalyst's own strategy for
    the correlated subquery). Cost values are exact decimals cast to
    double, so the min-equality join is deterministic."""
    li = _t(spark, sf_dir, "lineitem")
    ps = li.groupBy(
        F.col("l_partkey").alias("partkey"), F.col("l_suppkey").alias("suppkey")
    ).agg(dsum("l_extendedprice").alias("cost"))
    mins = ps.groupBy("partkey").agg(F.min("cost").alias("mincost"))
    return (
        ps.join(mins, "partkey")
        .filter(F.col("cost") == F.col("mincost"))
        .select("partkey", "suppkey", "cost")
    )


@register("dedup_clusters", oracle=None)
def dedup_clusters_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup clustering: MinHash-verified pairs → distributed
    connected components (iterative min-label propagation) →
    (doc_id, cluster) with cluster = min reachable doc_id. Correctness
    vs a driver-side union-find asserted in tests."""
    from .operators import dedup

    docs = _t(spark, sf_dir, "documents")
    pairs = dedup.minhash_dedup_pairs(docs, threshold=0.8)
    return dedup.dedup_clusters(docs, pairs)


@register(
    "dedup_clusters_exact",
    oracle=f"""
    WITH RECURSIVE toks AS (
      SELECT doc_id, {_TOKS} AS t FROM documents
    ), grams AS (
      SELECT doc_id, unnest(list_distinct(
               list_transform(range(1, len(t) - 1),
                              i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2]))) AS g
      FROM toks WHERE len(t) >= 3
    ), capped AS (
      SELECT doc_id, g FROM grams
      QUALIFY count(*) OVER (PARTITION BY g) <= {_NGRAM_MAX_DF}
    ), sizes AS (
      SELECT doc_id, count(*) AS n FROM capped GROUP BY doc_id
    ), inter AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS i
      FROM capped a JOIN capped b ON a.g = b.g AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    ), pairs AS (
      SELECT id_a, id_b FROM inter
      JOIN sizes sa ON id_a = sa.doc_id
      JOIN sizes sb ON id_b = sb.doc_id
      WHERE CAST(i AS DOUBLE) / (sa.n + sb.n - i) >= 0.8
    ), edges AS (
      SELECT id_a AS s, id_b AS d FROM pairs
      UNION
      SELECT id_b, id_a FROM pairs
    ), reach AS (
      SELECT doc_id AS n, doc_id AS m FROM documents
      UNION
      SELECT r.n, e.d FROM reach r JOIN edges e ON r.m = e.s
    )
    SELECT n AS doc_id, min(m) AS cluster FROM reach GROUP BY n
    """,
)
def dedup_clusters_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Connected-components clustering over the EXACT capped-Jaccard
    near-dup pairs — the hash-checkable twin of ``dedup_clusters``
    (whose MinHash pair set is seeded/engine-specific, hence
    rows-only). Same distributed label-propagation operator; the
    oracle states reachability as a recursive transitive closure
    (fine at oracle scale — near-dup components are tiny; the engine
    side stays the O(log diameter) pointer-jumping iteration that
    survives corpus scale)."""
    from .operators import dedup

    docs = _t(spark, sf_dir, "documents")
    pairs = dedup.ngram_jaccard_pairs(
        docs, n=3, threshold=0.8, max_shingle_freq=_NGRAM_MAX_DF
    )
    return dedup.dedup_clusters(docs, pairs)


@register(
    "chunk_doc_spans",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, {_TOKS} AS w FROM documents
    ), base AS (
      SELECT doc_id, len(w) AS n FROM toks
    ), spans AS (
      SELECT doc_id, n,
             unnest(range(0, greatest(1,
               CAST(ceil((n - 32) / 24.0) AS INT) + 1))) AS chunk_id
      FROM base
    )
    SELECT doc_id, chunk_id,
           chunk_id * 24 AS tok_start,
           least(chunk_id * 24 + 32, n) AS tok_end
    FROM spans
    """,
)
def chunk_doc_spans_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overlapping context-window chunking (32-token chunks, stride
    24 — sized to the short fixture docs so the fan-out is real). The
    doc→chunk explosion feeding embedding/indexing. Narrow
    flatMap in the scan stage, zero shuffles."""
    from .operators import curation

    return curation.chunk_doc_spans(
        _t(spark, sf_dir, "documents"), chunk_tokens=32, stride=24
    )


@register(
    "text_boilerplate_coverage",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, {_TOKS} AS w FROM documents
    ), raw AS (
      SELECT doc_id,
             unnest(list_transform(range(1, len(w) - 1),
               i -> struct_pack(pos := i - 1,
                                g := array_to_string(w[i:i+2], ' ')))) AS u
      FROM toks WHERE len(w) >= 3
    ), grams AS (
      SELECT doc_id, u.pos AS pos, u.g AS g FROM raw
    ), flagged AS (
      SELECT g FROM (
        SELECT g, count(DISTINCT doc_id) AS df FROM grams GROUP BY g
      ) WHERE df >= 3
    ), cov AS (
      SELECT DISTINCT doc_id, tok FROM (
        SELECT doc_id, unnest(range(pos, pos + 3)) AS tok
        FROM grams JOIN flagged USING (g)
      )
    ), covc AS (
      SELECT doc_id, count(*) AS n_covered FROM cov GROUP BY doc_id
    )
    SELECT t.doc_id, len(t.w) AS n_tokens,
           coalesce(c.n_covered, 0) AS n_covered,
           round(CAST(coalesce(c.n_covered, 0) AS DOUBLE) / len(t.w), 6)
             AS boilerplate_frac
    FROM toks t LEFT JOIN covc c USING (doc_id)
    """,
)
def text_boilerplate_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-document repeated-span screen: fraction of each doc's
    tokens covered by a 3-gram appearing in ≥3 documents (boilerplate
    detection, Lee et al. 2021). Shared-shingle DF stats + equi-join
    on the gram — the dedup-cap shape, never all-pairs."""
    from .operators import textops

    return textops.boilerplate_coverage(
        _t(spark, sf_dir, "documents"), n=3, min_df=3
    )


@register(
    "x_map_functions",
    oracle="""
    SELECT event_id,
           CAST(json_extract_string(props, '$.k') AS BIGINT) AS k,
           CAST(len(json_keys(props)) AS INT) AS n_keys
    FROM events
    """,
)
def x_map_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map-type surface: props parsed into map<string,bigint>,
    element_at + map_keys (the oracle goes through JSON functions —
    same values)."""
    ev = _t(spark, sf_dir, "events")
    m = F.from_json("props", "map<string,bigint>")
    return ev.select(
        "event_id",
        F.element_at(m, "k").alias("k"),
        F.size(F.map_keys(m)).alias("n_keys"),
    )


@register(
    "x_array_functions",
    oracle="""
    WITH h AS (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
    )
    SELECT vec_id,
           CAST(len(v) AS INT) AS dim,
           CAST(round(v[1] * 10000) AS BIGINT) AS h1,
           CAST(round(v[2] * 10000) AS BIGINT) AS h2,
           CAST(round(v[3] * 10000) AS BIGINT) AS h3,
           round(list_max(v), 4) AS vmax,
           round(list_min(v), 4) AS vmin
    FROM h
    """,
)
def x_array_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array-function surface: size/slice/element_at/array_max/min
    over the embedding column (float→double cast first). The head
    elements are emitted as 1e-4-scaled BIGINTs, not a float array:
    an array<double> output column hashes differently between Arrow
    and non-Arrow toPandas paths (ndarray vs list repr), so the
    comparison protocol keeps compared columns scalar."""
    emb = _t(spark, sf_dir, "embeddings")
    v = F.col("embedding").cast("array<double>")
    head = F.slice(v, 1, 3)

    def h(i: int):
        return F.round(F.element_at(head, i) * 10000, 0).cast("long").alias(f"h{i}")

    return emb.select(
        "vec_id",
        F.size("embedding").alias("dim"),
        h(1),
        h(2),
        h(3),
        F.round(F.array_max(v), 4).alias("vmax"),
        F.round(F.array_min(v), 4).alias("vmin"),
    )


@register(
    "q7_volume_shipping",
    oracle=f"""
    SELECT supp_nation, cust_nation, yr,
           {sql_dsum("volume")} AS revenue
    FROM (
      SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
             CAST(year(l_shipdate) AS INT) AS yr,
             l_extendedprice * (1 - l_discount) AS volume
      FROM supplier, lineitem, orders, customer, nation n1, nation n2
      WHERE s_suppkey = l_suppkey AND o_orderkey = l_orderkey
        AND c_custkey = o_custkey AND s_nationkey = n1.n_nationkey
        AND c_nationkey = n2.n_nationkey
        AND ((n1.n_name = 'CHINA' AND n2.n_name = 'GERMANY')
             OR (n1.n_name = 'GERMANY' AND n2.n_name = 'CHINA'))
    ) GROUP BY supp_nation, cust_nation, yr
    """,
)
def q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape: two-role dimension (nation joined twice under
    different aliases) + disjunctive cross-filter + year rollup."""
    su = _t(spark, sf_dir, "supplier")
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    cu = _t(spark, sf_dir, "customer")
    n1 = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
    )
    vol = F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))
    j = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(su), li.l_suppkey == su.s_suppkey)
        .join(F.broadcast(cu), o.o_custkey == cu.c_custkey)
        .join(F.broadcast(n1), su.s_nationkey == F.col("n1_key"))
        .join(F.broadcast(n2), cu.c_nationkey == F.col("n2_key"))
        .filter(
            ((F.col("supp_nation") == "CHINA") & (F.col("cust_nation") == "GERMANY"))
            | ((F.col("supp_nation") == "GERMANY") & (F.col("cust_nation") == "CHINA"))
        )
    )
    return (
        j.select("supp_nation", "cust_nation",
                 F.year("l_shipdate").alias("yr"), vol.alias("volume"))
        .groupBy("supp_nation", "cust_nation", "yr")
        .agg(dsum("volume").alias("revenue"))
    )


@register(
    "q12ish_priority_shipping",
    oracle="""
    SELECT l_returnflag,
           CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    WHERE l_shipdate >= TIMESTAMP '1997-01-01'
      AND l_shipdate < TIMESTAMP '1998-01-01'
    GROUP BY l_returnflag
    """,
)
def q12ish_priority_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape: CASE-conditional counts inside the agg."""
    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.to_timestamp(F.lit("1997-01-01")))
        & (F.col("l_shipdate") < F.to_timestamp(F.lit("1998-01-01")))
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy("l_returnflag")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
    )


@register(
    "q13_customer_order_distribution",
    oracle="""
    SELECT c_count, count(*) AS custdist FROM (
      SELECT c_custkey, count(o_orderkey) AS c_count
      FROM customer LEFT JOIN orders
        ON c_custkey = o_custkey AND o_orderpriority <> '5-LOW'
      GROUP BY c_custkey
    ) GROUP BY c_count
    """,
)
def q13_customer_order_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape: outer join with a join-time filter, then a
    distribution over the grouped counts (aggregate of an aggregate)."""
    cu = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").filter(F.col("o_orderpriority") != "5-LOW")
    per_cust = (
        cu.join(o, cu.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))


@register(
    "q17_small_quantity_revenue",
    oracle=f"""
    WITH avg_qty AS (
      SELECT l_partkey AS pk, 0.5 * ({sql_dsum("l_quantity")} / count(*)) AS half_avg
      FROM lineitem GROUP BY l_partkey
    )
    SELECT {sql_dsum("l_extendedprice")} / 7.0 AS avg_yearly, count(*) AS n
    FROM lineitem JOIN avg_qty ON l_partkey = pk
    WHERE l_quantity < half_avg
    """,
)
def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape: per-key average subquery joined back as a
    row filter (the correlated-average decorrelation)."""
    li = _t(spark, sf_dir, "lineitem")
    avg_qty = li.groupBy(F.col("l_partkey").alias("pk")).agg(
        (F.lit(0.5) * (dsum("l_quantity") / F.count(F.lit(1)))).alias("half_avg")
    )
    return (
        li.join(avg_qty, li.l_partkey == avg_qty.pk)
        .filter(F.col("l_quantity") < F.col("half_avg"))
        .agg(
            (dsum("l_extendedprice") / F.lit(7.0)).alias("avg_yearly"),
            F.count(F.lit(1)).alias("n"),
        )
    )


@register(
    "q19ish_disjunctive_predicates",
    oracle=f"""
    SELECT {sql_dsum("l_extendedprice * (1 - l_discount)")} AS revenue,
           count(*) AS n
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#10' AND p_size BETWEEN 1 AND 15
           AND l_quantity >= 1 AND l_quantity <= 20)
       OR (p_brand = 'Brand#23' AND p_size BETWEEN 10 AND 30
           AND l_quantity >= 5 AND l_quantity <= 35)
    """,
)
def q19ish_disjunctive_predicates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape: OR-of-ANDs across both join sides — Catalyst
    pushes the derivable conjuncts to each scan."""
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part")
    disc = F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))
    cond1 = (
        (F.col("p_brand") == "Brand#10")
        & F.col("p_size").between(1, 15)
        & F.col("l_quantity").between(1, 20)
    )
    cond2 = (
        (F.col("p_brand") == "Brand#23")
        & F.col("p_size").between(10, 30)
        & F.col("l_quantity").between(5, 35)
    )
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .filter(cond1 | cond2)
        .agg(dsum(disc).alias("revenue"), F.count(F.lit(1)).alias("n"))
    )


@register(
    "q22ish_idle_customers",
    oracle=f"""
    WITH avg_bal AS (
      SELECT {sql_dsum("c_acctbal")} / count(*) AS a FROM customer WHERE c_acctbal > 0.0
    )
    SELECT c_nationkey, count(*) AS numcust, {sql_dsum("c_acctbal")} AS totacctbal
    FROM customer, avg_bal
    WHERE c_acctbal > avg_bal.a
      AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
    GROUP BY c_nationkey
    """,
)
def q22ish_idle_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape: scalar-average subquery + anti join (rich
    customers who never ordered)."""
    cu = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    avg_bal = cu.filter(F.col("c_acctbal") > 0.0).agg(
        (dsum("c_acctbal") / F.count(F.lit(1))).alias("a")
    )
    return (
        cu.crossJoin(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("a"))
        .join(o, cu.c_custkey == o.o_custkey, "left_anti")
        .groupBy("c_nationkey")
        .agg(F.count(F.lit(1)).alias("numcust"), dsum("c_acctbal").alias("totacctbal"))
    )


@register(
    "q8ish_market_share",
    oracle=f"""
    WITH rev AS (
      SELECT year(o_orderdate) AS o_year,
             l_extendedprice * (1 - l_discount) AS volume,
             sn.n_name AS supp_nation
      FROM lineitem
      JOIN orders ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      JOIN nation cn ON c_nationkey = cn.n_nationkey
      JOIN region ON cn.n_regionkey = r_regionkey
      JOIN supplier ON l_suppkey = s_suppkey
      JOIN nation sn ON s_nationkey = sn.n_nationkey
      WHERE r_name = 'AMERICA'
    )
    SELECT o_year,
           round({sql_dsum("CASE WHEN supp_nation = 'NATION_5' THEN volume ELSE 0 END")}
                 / {sql_dsum("volume")}, 6) AS mkt_share
    FROM rev GROUP BY o_year
    """,
)
def q8ish_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape: national market share — conditional aggregate
    over a 6-way join, share = ratio of two exact decimal sums. All
    dims broadcast; lineitem shuffles once for the year group-by."""
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    cu = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region").filter(F.col("r_name") == "AMERICA")
    s = _t(spark, sf_dir, "supplier")
    cn = n.select(F.col("n_nationkey").alias("cn_key"), F.col("n_regionkey").alias("cn_region"))
    sn = n.select(F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation"))
    vol = F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))
    rev = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(cu), o.o_custkey == cu.c_custkey)
        .join(F.broadcast(cn), cu.c_nationkey == F.col("cn_key"))
        .join(F.broadcast(r), F.col("cn_region") == r.r_regionkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(sn), s.s_nationkey == F.col("sn_key"))
        .select(F.year("o_orderdate").alias("o_year"), vol.alias("volume"), "supp_nation")
    )
    nation_vol = F.when(F.col("supp_nation") == "NATION_5", F.col("volume")).otherwise(F.lit(0.0))
    return rev.groupBy("o_year").agg(
        F.round(dsum(nation_vol) / dsum(F.col("volume")), 6).alias("mkt_share")
    )


@register(
    "q9ish_product_profit",
    oracle=f"""
    SELECT sn.n_name AS nation, year(o_orderdate) AS o_year,
           {sql_dsum("l_extendedprice * (1 - l_discount) - 0.8 * p_retailprice * l_quantity")} AS profit
    FROM lineitem
    JOIN orders ON l_orderkey = o_orderkey
    JOIN part ON p_partkey = l_partkey
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation sn ON s_nationkey = sn.n_nationkey
    WHERE p_name LIKE '%red%'
    GROUP BY nation, o_year
    """,
)
def q9ish_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape: product-line profit by (supplier nation, year).
    No partsupp fixture exists, so supply cost is the deterministic
    proxy 0.8·p_retailprice·l_quantity — the join/agg shape (filtered
    part dim broadcast into the fact scan) is what Q9 exercises."""
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    p = _t(spark, sf_dir, "part").filter(F.col("p_name").like("%red%"))
    s = _t(spark, sf_dir, "supplier")
    sn = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("nation")
    )
    amount = (
        F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))
        - F.lit(0.8) * F.col("p_retailprice") * F.col("l_quantity")
    )
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(sn), s.s_nationkey == F.col("sn_key"))
        .groupBy("nation", F.year("o_orderdate").alias("o_year"))
        .agg(dsum(amount).alias("profit"))
    )


@register(
    "q11ish_important_parts",
    oracle="""
    WITH v AS (
      SELECT l_partkey,
             CAST(SUM(CAST(l_quantity * l_extendedprice AS DECIMAL(18,6))) AS DOUBLE) AS val
      FROM lineitem GROUP BY l_partkey
    )
    SELECT l_partkey, val
    FROM v
    WHERE val > 0.0007 * (SELECT CAST(SUM(CAST(val AS DECIMAL(18,6))) AS DOUBLE) FROM v)
    """,
)
def q11ish_important_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape: group-by HAVING > scalar-subquery × fraction
    (parts holding an outsized share of total traded value). The
    total is a broadcast single-row aggregate — the per-part agg
    shuffles once and is reused for both sides."""
    li = _t(spark, sf_dir, "lineitem")
    v = li.groupBy("l_partkey").agg(
        dsum(F.col("l_quantity") * F.col("l_extendedprice")).alias("val")
    )
    # the grand total must ALSO be an order-independent exact sum —
    # a double F.sum's partial-agg order differs from DuckDB's
    # sequential sum and could flip a borderline part's > comparison
    total = v.agg(dsum("val").alias("total"))
    return (
        v.crossJoin(F.broadcast(total))
        .filter(F.col("val") > F.lit(0.0007) * F.col("total"))
        .select("l_partkey", "val")
    )


@register(
    "q15ish_top_supplier",
    oracle=f"""
    WITH r AS (
      SELECT l_suppkey, {sql_dsum("l_extendedprice * (1 - l_discount)")} AS total_rev
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1998-01-01' AND l_shipdate < TIMESTAMP '1998-04-01'
      GROUP BY l_suppkey
    )
    SELECT s_suppkey, s_name, total_rev
    FROM supplier JOIN r ON s_suppkey = l_suppkey
    WHERE total_rev = (SELECT max(total_rev) FROM r)
    """,
)
def q15ish_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape: top supplier by windowed revenue — agg, then
    equality against the broadcast max (exact decimal-derived doubles
    make the equality deterministic across engines)."""
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.to_timestamp(F.lit("1998-01-01")))
        & (F.col("l_shipdate") < F.to_timestamp(F.lit("1998-04-01")))
    )
    r = li.groupBy("l_suppkey").agg(
        dsum(F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))).alias("total_rev")
    )
    mx = r.agg(F.max("total_rev").alias("mx"))
    s = _t(spark, sf_dir, "supplier")
    return (
        r.crossJoin(F.broadcast(mx))
        .filter(F.col("total_rev") == F.col("mx"))
        .join(F.broadcast(s), F.col("l_suppkey") == s.s_suppkey)
        .select("s_suppkey", "s_name", "total_rev")
    )


@register(
    "q16ish_supplier_part_counts",
    oracle="""
    SELECT p_brand, p_type, p_size, count(DISTINCT l_suppkey) AS supplier_cnt
    FROM part JOIN lineitem ON p_partkey = l_partkey
    WHERE p_brand <> 'Brand_1' AND p_type NOT LIKE 'SMALL%'
      AND p_size IN (1, 5, 9, 13, 17, 21, 25, 29)
    GROUP BY p_brand, p_type, p_size
    """,
)
def q16ish_supplier_part_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape: distinct-count of suppliers per part attribute
    bucket with NOT-LIKE/IN dim filters (lineitem stands in for the
    absent partsupp as the part↔supplier pair source)."""
    p = _t(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand_1")
        & (~F.col("p_type").like("SMALL%"))
        & (F.col("p_size").isin(1, 5, 9, 13, 17, 21, 25, 29))
    )
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


@register(
    "q20ish_excess_suppliers",
    oracle="""
    WITH red AS (
      SELECT l_suppkey, l_partkey, l_quantity
      FROM lineitem JOIN part ON p_partkey = l_partkey
      WHERE p_name LIKE 'red%'
        AND l_shipdate >= TIMESTAMP '1998-01-01' AND l_shipdate < TIMESTAMP '1999-01-01'
    ), pq AS (
      SELECT l_suppkey, l_partkey,
             CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) AS qty
      FROM red GROUP BY l_suppkey, l_partkey
    ), pt AS (
      SELECT l_partkey,
             0.3 * CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) AS thr
      FROM red GROUP BY l_partkey
    )
    SELECT s_suppkey, s_name FROM supplier
    WHERE s_suppkey IN (SELECT l_suppkey FROM pq JOIN pt USING (l_partkey) WHERE qty > thr)
    """,
)
def q20ish_excess_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape: semi-join through a correlated-threshold
    aggregate (suppliers holding >30% of a red part's year volume).
    The filtered pair table feeds BOTH aggregates; supplier joins
    semi, so no supplier row is ever duplicated."""
    p = _t(spark, sf_dir, "part").filter(F.col("p_name").like("red%"))
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.to_timestamp(F.lit("1998-01-01")))
        & (F.col("l_shipdate") < F.to_timestamp(F.lit("1999-01-01")))
    )
    red = li.join(F.broadcast(p), li.l_partkey == p.p_partkey).select(
        "l_suppkey", "l_partkey", "l_quantity"
    )
    pq = red.groupBy("l_suppkey", "l_partkey").agg(dsum("l_quantity").alias("qty"))
    pt = red.groupBy("l_partkey").agg(
        (F.lit(0.3) * dsum("l_quantity")).alias("thr")
    )
    excess = pq.join(pt, "l_partkey").filter(F.col("qty") > F.col("thr"))
    s = _t(spark, sf_dir, "supplier")
    return s.join(
        excess.select(F.col("l_suppkey").alias("s_suppkey")).distinct(),
        "s_suppkey",
        "left_semi",
    ).select("s_suppkey", "s_name")


@register(
    "q21ish_sole_supplier_orders",
    oracle="""
    SELECT s_name, count(*) AS numwait
    FROM supplier
    JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
    JOIN orders ON o_orderkey = l1.l_orderkey
    WHERE o_orderstatus = 'F'
      AND EXISTS (SELECT 1 FROM lineitem l2
                  WHERE l2.l_orderkey = l1.l_orderkey
                    AND l2.l_linenumber <> l1.l_linenumber)
      AND NOT EXISTS (SELECT 1 FROM lineitem l3
                      WHERE l3.l_orderkey = l1.l_orderkey
                        AND l3.l_suppkey <> l1.l_suppkey)
    GROUP BY s_name
    """,
)
def q21ish_sole_supplier_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape: EXISTS + NOT EXISTS correlated on the same
    fact table (multi-line 'F' orders where one supplier carried every
    line — the fixture lacks commit/receipt dates, so sole-supplier
    stands in for late-delivery; the join topology is Q21's). Both
    subqueries become (semi, anti) self-joins on l_orderkey with
    non-equi residuals — Catalyst's built-in decorrelation shapes."""
    s = _t(spark, sf_dir, "supplier")
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    l1 = li.alias("l1")
    l2 = li.alias("l2")
    l3 = li.alias("l3")
    base = (
        l1.join(o, F.col("l1.l_orderkey") == o.o_orderkey)
        .join(
            l2,
            (F.col("l2.l_orderkey") == F.col("l1.l_orderkey"))
            & (F.col("l2.l_linenumber") != F.col("l1.l_linenumber")),
            "left_semi",
        )
        .join(
            l3,
            (F.col("l3.l_orderkey") == F.col("l1.l_orderkey"))
            & (F.col("l3.l_suppkey") != F.col("l1.l_suppkey")),
            "left_anti",
        )
    )
    return (
        base.join(F.broadcast(s), F.col("l1.l_suppkey") == s.s_suppkey)
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
    )


# =====================================================================
# Round 3: as-of join + training-data curation family (deterministic
# split, per-domain quotas, contamination screen, repetition signals,
# sequence packing).
# =====================================================================


@register(
    "asof_latest_order",
    oracle="""
    SELECT e.event_id, e.user_id, e.ts,
           o.o_orderkey   AS asof_o_orderkey,
           o.o_totalprice AS asof_o_totalprice,
           o.o_orderdate  AS asof_o_orderdate
    FROM events e
    LEFT JOIN orders o
      ON o.o_custkey = e.user_id AND o.o_orderdate <= e.ts
    QUALIFY row_number() OVER (
        PARTITION BY e.event_id
        ORDER BY o.o_orderdate DESC NULLS LAST, o.o_orderkey DESC NULLS LAST
    ) = 1
    """,
)
def asof_latest_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join (backward inclusive): enrich every event with the
    issuing user's most recent order as of the event time — the
    TableView point-lookup (pulsar.go:229-252) generalized to
    per-event-time state. Engine shape: union + per-key window carry,
    ONE shuffle on the key, no theta join (operators/asof.py); the
    oracle states the same semantics as the O(L·R)-per-key ranked
    theta join SQL makes readable."""
    from .operators import asof

    ev = _t(spark, sf_dir, "events").select("event_id", "user_id", "ts")
    orders = _t(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderkey", "o_totalprice", "o_orderdate"
    )
    return asof.asof_join(
        ev,
        orders,
        left_on="user_id",
        right_on="o_custkey",
        left_ts="ts",
        right_ts="o_orderdate",
        payload_cols=["o_orderkey", "o_totalprice"],
        tiebreak_cols=["o_orderkey"],
    )


@register(
    "split_train_val_test",
    oracle="""
    SELECT doc_id,
           CASE WHEN b < 80 THEN 'train'
                WHEN b < 90 THEN 'val'
                ELSE 'test' END AS split
    FROM (
      SELECT doc_id,
             CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))
                  AS UBIGINT) % 100 AS b
      FROM documents
    )
    """,
)
def split_train_val_test_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 80/10/10 train/val/test assignment: bucket =
    integer prefix of md5(doc_id) — a pure function of the key, so
    re-runs, repartitions, and late shards always agree. No shuffle at
    all: the label is a scalar projection on the scan."""
    from .operators import curation

    return curation.train_val_test_split(_t(spark, sf_dir, "documents"))


@register(
    "split_leakage_safe",
    oracle=f"""
    WITH RECURSIVE toks AS (
      SELECT doc_id, {_TOKS} AS t FROM documents
    ), grams AS (
      SELECT doc_id, unnest(list_distinct(
               list_transform(range(1, len(t) - 1),
                              i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2]))) AS g
      FROM toks WHERE len(t) >= 3
    ), capped AS (
      SELECT doc_id, g FROM grams
      QUALIFY count(*) OVER (PARTITION BY g) <= {_NGRAM_MAX_DF}
    ), sizes AS (
      SELECT doc_id, count(*) AS n FROM capped GROUP BY doc_id
    ), inter AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS i
      FROM capped a JOIN capped b ON a.g = b.g AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    ), pairs AS (
      SELECT id_a, id_b FROM inter
      JOIN sizes sa ON id_a = sa.doc_id
      JOIN sizes sb ON id_b = sb.doc_id
      WHERE CAST(i AS DOUBLE) / (sa.n + sb.n - i) >= 0.8
    ), edges AS (
      SELECT id_a AS s, id_b AS d FROM pairs
      UNION
      SELECT id_b, id_a FROM pairs
    ), reach AS (
      SELECT doc_id AS n, doc_id AS m FROM documents
      UNION
      SELECT r.n, e.d FROM reach r JOIN edges e ON r.m = e.s
    ), clusters AS (
      SELECT n AS doc_id, min(m) AS cluster FROM reach GROUP BY n
    )
    SELECT doc_id, cluster,
           CASE WHEN b < 80 THEN 'train'
                WHEN b < 90 THEN 'val'
                ELSE 'test' END AS split
    FROM (
      SELECT doc_id, cluster,
             CAST(('0x' || substr(md5(CAST(cluster AS VARCHAR)), 1, 8))
                  AS UBIGINT) % 100 AS b
      FROM clusters
    )
    """,
)
def split_leakage_safe_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leakage-safe train/val/test split: the hash split is keyed by
    the near-dup CLUSTER representative, so near-duplicate documents
    can never straddle the train/test boundary (the classic eval-
    contamination failure of per-document splits). Engine: exact
    capped-Jaccard pairs → pointer-jumping connected components →
    scalar md5 projection on the cluster id; the oracle restates the
    clustering as a recursive transitive closure."""
    from .operators import curation, dedup

    docs = _t(spark, sf_dir, "documents")
    pairs = dedup.ngram_jaccard_pairs(
        docs, n=3, threshold=0.8, max_shingle_freq=_NGRAM_MAX_DF
    )
    return curation.leakage_safe_split(docs, pairs)


@register(
    "text_duplicate_spans",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, {_TOKS} AS t FROM documents
    ), flat AS (
      SELECT doc_id, u['s'] AS start_tok, u['s'] + 2 AS end_tok, u['g'] AS g
      FROM (
        SELECT doc_id, unnest(list_transform(range(1, len(t) - 1),
                 i -> {{'s': i - 1, 'g': t[i] || ' ' || t[i+1] || ' ' || t[i+2]}})) AS u
        FROM toks WHERE len(t) >= 3
      )
    ), dfreq AS (
      SELECT g, count(DISTINCT doc_id) AS df FROM flat GROUP BY g
    )
    SELECT f.doc_id, CAST(f.start_tok AS BIGINT) AS start_tok,
           CAST(f.end_tok AS BIGINT) AS end_tok, d.df
    FROM flat f JOIN dfreq d USING (g)
    WHERE d.df >= 4
    """,
)
def text_duplicate_spans_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicate-span mining: token spans whose trigram occurs in ≥4
    distinct documents — boilerplate detection at span granularity
    (mask-before-training / quality-signal input). One positional
    explode, one distinct-doc count (map-side combinable), one
    equi-join on the hashed gram."""
    from .operators import textops

    return textops.duplicate_spans(
        _t(spark, sf_dir, "documents"), n=3, min_df=4
    )


def _greedy_curation_oracle() -> str:
    """Unrolled 3-stage SQL statement of the streaming curator's
    greedy first-writer-wins fold (streaming/curator.py): per batch k,
    capped-Jaccard pairs over accepted ∪ batch, edge-wise rejection
    (both-new → larger id loses; vs-accepted → the new doc loses),
    survivors join the accepted set the NEXT stage screens against.
    Membership tests reduce to ``doc_id % 3`` because stage k's gram
    union contains only accepted docs and batch k."""
    stage = """u{k} AS (
      SELECT doc_id, g FROM grams_all
      WHERE doc_id IN (SELECT doc_id FROM a{prev}) OR doc_id % 3 = {k}
    ), c{k} AS (
      SELECT doc_id, g FROM u{k}
      QUALIFY count(*) OVER (PARTITION BY g) <= {cap}
    ), s{k} AS (
      SELECT doc_id, count(*) AS n FROM c{k} GROUP BY doc_id
    ), i{k} AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS i
      FROM c{k} a JOIN c{k} b ON a.g = b.g AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    ), p{k} AS (
      SELECT id_a, id_b FROM i{k}
      JOIN s{k} sa ON id_a = sa.doc_id
      JOIN s{k} sb ON id_b = sb.doc_id
      WHERE CAST(i AS DOUBLE) / (sa.n + sb.n - i) >= 0.8
    ), rej{k} AS (
      SELECT DISTINCT d AS doc_id FROM (
        SELECT CASE
          WHEN id_a % 3 = {k} AND id_b % 3 = {k} THEN id_b
          WHEN id_a % 3 = {k} THEN id_a
          WHEN id_b % 3 = {k} THEN id_b
        END AS d FROM p{k}
      ) WHERE d IS NOT NULL
    ), a{k} AS (
      SELECT doc_id FROM a{prev}
      UNION ALL
      SELECT doc_id FROM documents
      WHERE doc_id % 3 = {k}
        AND doc_id NOT IN (SELECT doc_id FROM rej{k})
    )"""
    stages = ",\n    ".join(
        stage.format(k=k, prev="_empty" if k == 0 else k - 1, cap=_NGRAM_MAX_DF)
        for k in (0, 1, 2)
    )
    return f"""
    WITH toks AS (
      SELECT doc_id, {_TOKS} AS t FROM documents
    ), grams_all AS (
      SELECT doc_id, unnest(list_distinct(
               list_transform(range(1, len(t) - 1),
                              i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2]))) AS g
      FROM toks WHERE len(t) >= 3
    ), a_empty AS (
      SELECT doc_id FROM documents WHERE 1 = 0
    ), {stages}
    SELECT doc_id FROM a2
    """


@register("pipeline_streaming_curation", oracle=_greedy_curation_oracle())
def pipeline_streaming_curation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """END-TO-END streaming curation, hash-checked: the documents
    table arrives as three micro-batches (doc_id % 3, in order)
    through the REAL StreamingCorpusCurator — incremental capped-
    Jaccard screen against the materialized index, greedy
    first-writer-wins rejection, idempotent per-batch state commits —
    and the accepted corpus must equal the oracle's unrolled
    recursive statement of the same greedy fold. This puts the whole
    operational loop (not just its operators) under the driver's
    hash gate."""
    import tempfile

    from .streaming.curator import StreamingCorpusCurator

    import shutil

    _prep(spark)
    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    base = tempfile.mkdtemp(prefix="pwp_curation_q_")
    try:
        cur = StreamingCorpusCurator(
            spark, base, threshold=0.8, max_shingle_freq=_NGRAM_MAX_DF
        )
        for k in range(3):
            cur.process_batch(docs.filter(F.col("doc_id") % 3 == k), k)
        # materialize the (small) accepted id set so the state dir can
        # be deleted — a lazy frame over it would dangle
        ids = [(r.doc_id,) for r in cur.accepted().select("doc_id").collect()]
    finally:
        shutil.rmtree(base, ignore_errors=True)
    return spark.createDataFrame(ids, "doc_id long")


@register("pipeline_curation_compacted", oracle=_greedy_curation_oracle())
def pipeline_curation_compacted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SAME end-to-end streaming curation fold as
    ``pipeline_streaming_curation`` — same batches, same oracle — but
    with state compaction firing after EVERY micro-batch
    (``compact_after=0``): each batch's screen runs against the
    compacted bucketed tier (+ at most one live dir), every committed
    directory is folded through the versioned-manifest cutover, and
    the accepted corpus must still hash-match the greedy oracle. This
    puts the compaction machinery itself — fold, atomic flip, covered-
    partition exclusion, directory cleanup — under the driver's hash
    gate, not just under pytest."""
    import shutil
    import tempfile

    from .streaming.curator import StreamingCorpusCurator

    _prep(spark)
    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    base = tempfile.mkdtemp(prefix="pwp_curation_cq_")
    # constructor does no filesystem work — hoisted above the try so
    # the finally block's `cur` reference can never be unbound (an
    # unbound NameError there would mask the real failure)
    cur = StreamingCorpusCurator(
        spark,
        base,
        threshold=0.8,
        max_shingle_freq=_NGRAM_MAX_DF,
        compact_after=0,
        n_buckets=8,
    )
    try:
        for k in range(3):
            cur.process_batch(docs.filter(F.col("doc_id") % 3 == k), k)
        man = cur._manifest()
        assert man is not None and man["covered_upto"] == 2  # it really ran
        ids = [(r.doc_id,) for r in cur.accepted().select("doc_id").collect()]
    finally:
        shutil.rmtree(base, ignore_errors=True)
        for v in range(4):  # external-table catalog entries are per-run
            spark.sql(
                f"DROP TABLE IF EXISTS {cur.catalog_prefix}_v{v}_grams_by_g"
            )
    return spark.createDataFrame(ids, "doc_id long")


@register(
    "text_gopher_quality",
    oracle=f"""
    WITH t AS (
      SELECT doc_id, {_TOKS} AS toks FROM documents
    ), sig AS (
      SELECT doc_id,
             CAST(len(toks) AS BIGINT) AS n_words,
             CAST(list_sum(list_transform(toks, x -> length(x))) AS DOUBLE)
               / len(toks) AS mean_word_len,
             CAST(len(list_filter(toks, x -> contains(x, '#')
                                            OR contains(x, '...'))) AS DOUBLE)
               / len(toks) AS symbol_ratio,
             CAST(len(list_filter(toks, x -> regexp_matches(x, '[a-z]'))) AS DOUBLE)
               / len(toks) AS alpha_ratio,
             CAST(len(list_filter(toks, x -> x IN {_STOPS})) AS BIGINT) AS n_stopwords
      FROM t
    )
    SELECT doc_id, n_words, mean_word_len, symbol_ratio, alpha_ratio, n_stopwords,
           failed_rules = '' AS keep, failed_rules
    FROM (
      SELECT *,
             concat_ws(',',
               CASE WHEN n_words < 20 THEN 'too_few_words' END,
               CASE WHEN n_words > 100000 THEN 'too_many_words' END,
               CASE WHEN NOT (2.0 <= mean_word_len AND mean_word_len <= 10.0)
                    THEN 'mean_word_len' END,
               CASE WHEN symbol_ratio > 0.1 THEN 'symbol_ratio' END,
               CASE WHEN alpha_ratio < 0.8 THEN 'alpha_ratio' END,
               CASE WHEN n_stopwords < 2 THEN 'stopwords' END) AS failed_rules
      FROM sig
    )
    """,
)
def text_gopher_quality_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-rule quality filter (Rae et al. 2021 heuristics): all
    measured signals + keep verdict + failed-rule list, as pure JVM
    column expressions over one tokenization — a projection on the
    scan, no shuffle at any scale."""
    from .operators import textops

    return textops.gopher_quality_filter(_t(spark, sf_dir, "documents"))


@register(
    "dedup_survivors",
    oracle=f"""
    WITH RECURSIVE toks AS (
      SELECT doc_id, {_TOKS} AS t FROM documents
    ), grams AS (
      SELECT doc_id, unnest(list_distinct(
               list_transform(range(1, len(t) - 1),
                              i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2]))) AS g
      FROM toks WHERE len(t) >= 3
    ), capped AS (
      SELECT doc_id, g FROM grams
      QUALIFY count(*) OVER (PARTITION BY g) <= {_NGRAM_MAX_DF}
    ), sizes AS (
      SELECT doc_id, count(*) AS n FROM capped GROUP BY doc_id
    ), inter AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS i
      FROM capped a JOIN capped b ON a.g = b.g AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    ), pairs AS (
      SELECT id_a, id_b FROM inter
      JOIN sizes sa ON id_a = sa.doc_id
      JOIN sizes sb ON id_b = sb.doc_id
      WHERE CAST(i AS DOUBLE) / (sa.n + sb.n - i) >= 0.8
    ), edges AS (
      SELECT id_a AS s, id_b AS d FROM pairs
      UNION
      SELECT id_b, id_a FROM pairs
    ), reach AS (
      SELECT doc_id AS n, doc_id AS m FROM documents
      UNION
      SELECT r.n, e.d FROM reach r JOIN edges e ON r.m = e.s
    ), clusters AS (
      SELECT n AS doc_id, min(m) AS cluster FROM reach GROUP BY n
    )
    SELECT d.doc_id, d.source, d.n_chars
    FROM documents d JOIN clusters c ON d.doc_id = c.doc_id
    WHERE c.doc_id = c.cluster
    """,
)
def dedup_survivors_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The deduplicated corpus itself: near-dup pairs → connected
    components → keep the min-id representative per cluster
    (singletons survive untouched). The terminal dataset-producing
    step of the dedup family."""
    from .operators import dedup

    docs = _t(spark, sf_dir, "documents").select("doc_id", "source", "n_chars")
    pairs = dedup.ngram_jaccard_pairs(
        _t(spark, sf_dir, "documents"), n=3, threshold=0.8,
        max_shingle_freq=_NGRAM_MAX_DF,
    )
    return dedup.dedup_survivors(docs, pairs)


@register(
    "domain_topk_docs",
    oracle="""
    SELECT doc_id, source, n_chars, rank_in_domain FROM (
      SELECT doc_id, source, n_chars,
             row_number() OVER (PARTITION BY source
                                ORDER BY n_chars DESC, doc_id ASC)
               AS rank_in_domain
      FROM documents
    ) WHERE rank_in_domain <= 3
    """,
)
def domain_topk_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-domain quota cap: keep the top-3 documents per source by
    size (ties → lowest doc_id). One shuffle on the domain key; only
    k rows per domain survive the stage."""
    from .operators import curation

    return curation.domain_topk(_t(spark, sf_dir, "documents"), k=3)


@register(
    "quota_token_budget",
    oracle=f"""
    WITH t AS (
      SELECT doc_id, source, n_chars,
             CAST(len({_TOKS}) AS BIGINT) AS n_tokens
      FROM documents
    )
    SELECT doc_id, source, n_tokens, cum_tokens FROM (
      SELECT doc_id, source, n_tokens,
             CAST(sum(n_tokens) OVER (
               PARTITION BY source ORDER BY n_chars DESC, doc_id ASC
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
             ) AS BIGINT) AS cum_tokens
      FROM t
    ) WHERE cum_tokens <= 800
    """,
)
def quota_token_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-domain TOKEN-budget quota (mixing recipes quota tokens, not
    doc counts): greedy best-first prefix per source while the running
    token sum stays ≤ 800. Same single domain-key exchange as the
    top-k quota; the budget walk is a rank-window running sum."""
    from .operators import curation

    return curation.token_budget_quota(
        _t(spark, sf_dir, "documents"), budget=800
    )


@register(
    "text_bm25_topk",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, unnest({_TOKS}) AS term FROM documents
    ), dl AS (
      SELECT doc_id, count(*) AS dl FROM toks GROUP BY doc_id
    ), n AS (
      SELECT count(*) AS n_docs FROM documents
    ), a AS (
      SELECT avg(dl) AS avgdl FROM dl
    ), tf AS (
      SELECT doc_id, term, count(*) AS tf FROM toks
      WHERE term IN ('hash', 'join', 'merge') GROUP BY doc_id, term
    ), dfq AS (
      SELECT term, count(DISTINCT doc_id) AS df FROM tf GROUP BY term
    ), per_doc AS (
      SELECT tf.doc_id,
             CAST(sum(CAST(round(
               ln(1.0 + (CAST(n.n_docs AS DOUBLE) - dfq.df + 0.5)
                        / (CAST(dfq.df AS DOUBLE) + 0.5))
               * tf.tf * 2.2
               / (tf.tf + 1.2 * (0.25 + 0.75 * CAST(dl.dl AS DOUBLE) / a.avgdl))
               * 1000000.0) AS BIGINT)) AS BIGINT) AS bm25_micro
      FROM tf JOIN dfq USING (term) JOIN dl ON tf.doc_id = dl.doc_id
      CROSS JOIN n CROSS JOIN a
      GROUP BY tf.doc_id
    )
    SELECT doc_id, bm25_micro, rnk FROM (
      SELECT doc_id, bm25_micro,
             CAST(row_number() OVER (ORDER BY bm25_micro DESC, doc_id ASC)
                  AS INT) AS rnk
      FROM per_doc
    ) WHERE rnk <= 20
    """,
)
def text_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 retrieval (Lucene idf, k1=1.2, b=0.75) of the top-20 docs
    for the probe query 'hash join merge' — relevance mining over the
    corpus. Per-term scores scaled to micro-units and summed as
    bigints so the ranking is partitioning-independent; top-k is
    TakeOrdered (k·partitions rows move), the rank window only ever
    sees the 20 survivors."""
    from .operators import textops

    return textops.bm25_topk(
        _t(spark, sf_dir, "documents"), ["hash", "join", "merge"], k=20
    )


@register(
    "text_repetition_signals",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, {_TOKS} AS w FROM documents
    ), base AS (
      SELECT doc_id, len(w) AS n_tokens, len(list_distinct(w)) AS n_distinct
      FROM toks
    ), bg AS (
      SELECT doc_id,
             unnest(list_transform(range(1, len(w)),
                                   i -> w[i] || ' ' || w[i+1])) AS g
      FROM toks WHERE len(w) >= 2
    ), bgc AS (
      SELECT doc_id, g, count(*) AS c FROM bg GROUP BY doc_id, g
    ), bga AS (
      SELECT doc_id, max(c) AS top_c, sum(c) AS total FROM bgc GROUP BY doc_id
    )
    SELECT b.doc_id, b.n_tokens,
           round(1 - CAST(n_distinct AS DOUBLE) / n_tokens, 6) AS dup_word_frac,
           round(coalesce(CAST(top_c AS DOUBLE) / total, 0), 6) AS top_bigram_frac
    FROM base b LEFT JOIN bga USING (doc_id)
    """,
)
def text_repetition_signals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style within-document repetition quality signals
    (duplicate-word fraction, top-bigram mass) — scalar array exprs on
    the scan plus one map-side-combinable (doc, gram) count."""
    from .operators import textops

    return textops.repetition_signals(_t(spark, sf_dir, "documents"))


@register(
    "text_benchmark_contamination",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, {_TOKS} AS w FROM documents
    ), g AS (
      SELECT DISTINCT doc_id,
             unnest(list_transform(range(1, len(w) - 2),
                                   i -> array_to_string(w[i:i+3], ' '))) AS g
      FROM toks WHERE len(w) >= 4
    ), bench AS (
      SELECT doc_id AS bench_id, g FROM g WHERE doc_id % 83 = 0
    ), corp AS (
      SELECT doc_id, g FROM g WHERE doc_id % 83 <> 0
    ), sizes AS (
      SELECT doc_id, count(*) AS n_grams FROM corp GROUP BY doc_id
    ), hits AS (
      SELECT c.doc_id, b.bench_id, count(*) AS n_shared
      FROM corp c JOIN bench b USING (g)
      GROUP BY c.doc_id, b.bench_id
    )
    SELECT doc_id, bench_id, n_shared,
           round(CAST(n_shared AS DOUBLE) / n_grams, 6) AS overlap
    FROM hits JOIN sizes USING (doc_id)
    WHERE round(CAST(n_shared AS DOUBLE) / n_grams, 6) >= 0.1
    QUALIFY row_number() OVER (PARTITION BY doc_id
                               ORDER BY overlap DESC, bench_id ASC) = 1
    """,
)
def text_benchmark_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decontamination screen: corpus docs sharing ≥10% of their
    distinct word 4-grams with an eval/benchmark set (here: every
    83rd doc plays the benchmark). Inverted-index equi-join on the
    shingle, benchmark side broadcast — never corpus × benchmark."""
    from .operators import curation

    docs = _t(spark, sf_dir, "documents")
    bench = docs.filter(F.col("doc_id") % 83 == 0)
    corpus = docs.filter(F.col("doc_id") % 83 != 0)
    return curation.benchmark_contamination(corpus, bench, n=4, min_overlap=0.1)


@register(
    "pack_training_sequences",
    oracle=f"""
    WITH RECURSIVE toks AS (
      SELECT doc_id, source,
             CAST(len({_TOKS}) AS BIGINT) AS n_tokens,
             row_number() OVER (PARTITION BY source ORDER BY doc_id) AS rn
      FROM documents
    ), packed AS (
      SELECT doc_id, source, n_tokens, rn,
             CAST(0 AS BIGINT) AS seq_id, n_tokens AS acc
      FROM toks WHERE rn = 1
      UNION ALL
      SELECT t.doc_id, t.source, t.n_tokens, t.rn,
             CASE WHEN p.acc + t.n_tokens > 2048
                  THEN p.seq_id + 1 ELSE p.seq_id END,
             CASE WHEN p.acc + t.n_tokens > 2048
                  THEN t.n_tokens ELSE p.acc + t.n_tokens END
      FROM toks t JOIN packed p ON t.source = p.source AND t.rn = p.rn + 1
    )
    SELECT doc_id, source, n_tokens, seq_id FROM packed
    """,
)
def pack_training_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Greedy first-fit sequence packing: documents (ordered by
    doc_id within source) packed into 2048-token training sequences.
    Sequential per group by definition → one vectorized pass per
    group via applyInPandas; groups are the parallelism unit. The
    oracle states the same fold as a recursive CTE."""
    from .operators import curation, textops

    docs = _t(spark, sf_dir, "documents").select(
        "doc_id", "source", textops.token_count("text").alias("n_tokens")
    )
    return curation.pack_sequences(docs, capacity=2048)


@register(
    "mix_domain_weighted_sample",
    oracle="""
    WITH rated AS (
      SELECT doc_id, source,
             CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':mix'), 1, 8))
                  AS UBIGINT) % 1000000 AS b,
             CASE WHEN source IN ('src0','src1','src2') THEN 1.0
                  WHEN source IN ('src3','src4','src5') THEN 0.5
                  ELSE 0.25 END AS rate
      FROM documents
    )
    SELECT doc_id, source FROM rated
    WHERE b < CAST(rate * 1000000 AS BIGINT)
    """,
)
def mix_domain_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data mixing: deterministic stratified sampling toward target
    per-domain rates (keep all of src0-2, half of src3-5, a quarter of
    the rest — the Pile/DoReMi-style reweighting step). Membership is
    a salted md5 of the doc key: reproducible, monotone in the rate,
    zero shuffles."""
    from .operators import curation

    docs = _t(spark, sf_dir, "documents")
    rates = {"src0": 1.0, "src1": 1.0, "src2": 1.0,
             "src3": 0.5, "src4": 0.5, "src5": 0.5}
    return curation.weighted_domain_sample(
        docs, rates, default_rate=0.25
    ).select("doc_id", "source")


@register(
    "time_rollup_multires",
    oracle=f"""
    SELECT 'hour' AS resolution, date_trunc('hour', ts) AS bucket,
           count(*) AS n_events, {sql_dsum("value")} AS sum_value
    FROM events GROUP BY bucket
    UNION ALL
    SELECT 'day', date_trunc('day', ts),
           count(*), {sql_dsum("value")}
    FROM events GROUP BY 2
    UNION ALL
    SELECT 'week', date_trunc('week', ts),
           count(*), {sql_dsum("value")}
    FROM events GROUP BY 2
    """,
)
def time_rollup_multires(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-resolution continuous aggregate (the hypertable-rollup
    pattern): event counts + exact sums at hour/day/week grain.

    HIERARCHICAL, single scan: the raw table is aggregated ONCE at
    hour grain (the finest — the only shuffle proportional to the
    data), then each hour row is exploded to its three (resolution,
    bucket) targets and re-aggregated — a second shuffle over just
    3×|hour-buckets| rows. A naive per-grain union would scan and
    shuffle the raw table three times (verified: Catalyst does NOT
    reuse the shared subtree across union branches here). Exactness:
    per-bucket sums are decimal (dsum) and decimal addition is
    associative, so re-aggregating hour sums equals the oracle's flat
    per-grain sums bit-for-bit."""
    ev = _t(spark, sf_dir, "events").select("ts", "value")
    hour = ev.groupBy(F.date_trunc("hour", F.col("ts")).alias("bucket")).agg(
        F.count(F.lit(1)).alias("n_events"), dsum("value").alias("sum_value")
    )
    targets = F.array(
        F.struct(F.lit("hour").alias("resolution"), F.col("bucket").alias("bucket")),
        F.struct(
            F.lit("day").alias("resolution"),
            F.date_trunc("day", F.col("bucket")).alias("bucket"),
        ),
        F.struct(
            F.lit("week").alias("resolution"),
            F.date_trunc("week", F.col("bucket")).alias("bucket"),
        ),
    )
    return (
        hour.select(F.explode(targets).alias("rb"), "n_events", "sum_value")
        .groupBy(
            F.col("rb.resolution").alias("resolution"),
            F.col("rb.bucket").alias("bucket"),
        )
        .agg(F.sum("n_events").alias("n_events"), dsum("sum_value").alias("sum_value"))
    )


@register(
    "stream_t8_windowed",
    oracle=f"""
    SELECT time_bucket(INTERVAL '1 minute', ts) AS window_start,
           "type", count(*) AS n
    FROM read_parquet('{GAME_EVENTS_PATH}')
    GROUP BY window_start, "type"
    """,
)
def stream_t8_windowed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T8 executed as a REAL streaming query: readStream → watermarked
    tumbling event-time window → availableNow memory sink, final state
    hash-matching the batch GROUP BY oracle — windowed streaming ==
    batch, verified by the driver itself (complements stream_a1's
    unwindowed stateful count)."""
    from .schema import GAME_EVENT_SCHEMA
    from .streaming.pipeline import streaming_windowed_type_counts

    return _run_streamed_fixture(
        spark,
        GAME_EVENTS_PATH,
        GAME_EVENT_SCHEMA,
        streaming_windowed_type_counts,
        "stream_t8",
    )


@register(
    "w_analytics_suite",
    oracle="""
    SELECT o_custkey, o_orderkey,
           dense_rank() OVER by_price AS price_dense_rank,
           ntile(4)     OVER by_date  AS date_quartile,
           lead(o_totalprice) OVER by_date AS next_price,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6)))
                OVER (PARTITION BY o_custkey
                      ORDER BY o_orderdate, o_orderkey
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                AS DOUBLE) AS running_spend
    FROM orders
    WINDOW by_price AS (PARTITION BY o_custkey
                        ORDER BY o_totalprice DESC, o_orderkey),
           by_date  AS (PARTITION BY o_custkey
                        ORDER BY o_orderdate, o_orderkey)
    """,
)
def w_analytics_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Analytic-window completeness probe (SURVEY §2.12): dense_rank,
    ntile, lead, and an explicit ROWS frame (decimal-exact running
    sum) in one pass. Both window specs partition on the same key, so
    the whole suite is ONE exchange on o_custkey + two in-partition
    sorts."""
    from .oracle import DEC

    o = _t(spark, sf_dir, "orders")
    by_price = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), "o_orderkey"
    )
    by_date = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    running = by_date.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.dense_rank().over(by_price).alias("price_dense_rank"),
        F.ntile(4).over(by_date).alias("date_quartile"),
        F.lead("o_totalprice").over(by_date).alias("next_price"),
        F.sum(F.col("o_totalprice").cast(DEC)).over(running)
        .cast("double")
        .alias("running_spend"),
    )


@register(
    "t8b_sliding_window",
    oracle=f"""
    WITH cand AS (
      SELECT value,
             unnest([time_bucket(INTERVAL '5 minutes', ts),
                     time_bucket(INTERVAL '5 minutes', ts)
                       - INTERVAL '5 minutes']) AS window_start
      FROM events
    )
    SELECT window_start, count(*) AS n_events,
           {sql_dsum("value")} AS sum_value
    FROM cand GROUP BY window_start
    """,
)
def t8b_sliding_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T8 sliding (hopping) event-time window: 10-minute windows
    every 5 minutes — each event lands in exactly width/slide = 2
    windows. Spark's ``window()`` expands rows then aggregates
    (partial agg before the single exchange); the oracle states the
    same expansion with unnest. Decimal-exact sums both sides."""
    ev = _t(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "10 minutes", "5 minutes").alias("w"))
        .agg(F.count(F.lit(1)).alias("n_events"), dsum("value").alias("sum_value"))
        .select(
            F.col("w.start").alias("window_start"), "n_events", "sum_value"
        )
    )


def _greedy_embedding_curation_oracle(threshold: float = 0.9975) -> str:
    """Unrolled 3-stage SQL statement of the embedding curator's
    greedy first-writer-wins fold on the clustered fixture: per batch
    k (vec_id % 3), cosine pairs over accepted ∪ batch, edge-wise
    rejection (both-new → larger id loses; vs-accepted → the new doc
    loses), survivors join the accepted set the next stage screens
    against. The curator's LSH candidate generation provably covers
    every qualifying pair on this fixture (see
    dedup_incremental_embedding), so the screen equals this exact
    statement."""
    stage = """u{k} AS (
      SELECT vec_id, vec FROM v
      WHERE vec_id IN (SELECT vec_id FROM a{prev}) OR vec_id % 3 = {k}
    ), p{k} AS (
      SELECT a.vec_id AS id_a, b.vec_id AS id_b
      FROM u{k} a JOIN u{k} b ON a.vec_id < b.vec_id
      WHERE round(list_dot_product(a.vec, b.vec)
                  / (sqrt(list_dot_product(a.vec, a.vec))
                     * sqrt(list_dot_product(b.vec, b.vec))), 6) >= {thr}
    ), rej{k} AS (
      SELECT DISTINCT d AS vec_id FROM (
        SELECT CASE
          WHEN id_a % 3 = {k} AND id_b % 3 = {k} THEN id_b
          WHEN id_a % 3 = {k} THEN id_a
          WHEN id_b % 3 = {k} THEN id_b
        END AS d FROM p{k}
      ) WHERE d IS NOT NULL
    ), a{k} AS (
      SELECT vec_id FROM a{prev}
      UNION ALL
      SELECT vec_id FROM v
      WHERE vec_id % 3 = {k}
        AND vec_id NOT IN (SELECT vec_id FROM rej{k})
    )"""
    stages = ",\n    ".join(
        stage.format(k=k, prev="_empty" if k == 0 else k - 1, thr=threshold)
        for k in (0, 1, 2)
    )
    return f"""
    WITH v AS (
      SELECT vec_id,
             [ (CASE WHEN i = (vec_id % 8) * 8 + 1 THEN 1.0 ELSE 0.0 END)
               + 0.05 * CAST(embedding[i] AS DOUBLE)
               FOR i IN generate_series(1, 64) ] AS vec
      FROM embeddings
    ), a_empty AS (
      SELECT vec_id FROM v WHERE 1 = 0
    ), {stages}
    SELECT vec_id FROM a2
    """


@register(
    "pipeline_embedding_curation", oracle=_greedy_embedding_curation_oracle()
)
def pipeline_embedding_curation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """END-TO-END streaming curation over an EMBEDDED corpus,
    hash-checked: the clustered vectors arrive as three micro-batches
    (vec_id % 3, in order) through the real StreamingCorpusCurator
    with the semantic screen — hyperplane-bucket candidates against
    the accumulated (vec, sig) state, exact-cosine verify at 0.9975
    (within-cluster sims span ~0.996-0.999, so acceptance is
    data-dependent, not degenerate), greedy first-writer-wins
    rejection, idempotent per-batch commits — and the accepted set
    must equal the oracle's unrolled statement of the same greedy
    fold. The embedding sibling of `pipeline_streaming_curation`."""
    import shutil
    import tempfile

    from .streaming.curator import StreamingCorpusCurator

    _prep(spark)
    v = _clustered_embeddings(spark, sf_dir)
    base = tempfile.mkdtemp(prefix="pwp_embcur_q_")
    try:
        cur = StreamingCorpusCurator(
            spark,
            base,
            screen="embedding",
            id_col="vec_id",
            emb_dim=64,
            threshold=0.9975,
            num_planes=4,
            num_tables=16,
        )
        for k in range(3):
            cur.process_batch(v.filter(F.col("vec_id") % 3 == k), k)
        ids = [(r.vec_id,) for r in cur.accepted().select("vec_id").collect()]
    finally:
        shutil.rmtree(base, ignore_errors=True)
    return spark.createDataFrame(ids, "vec_id long")


# =====================================================================
# Clustering family (LLM-curation surface): distributed k-means and
# SemDeDup semantic dedup. Lloyd's is iterative, but deterministic
# first-K-by-id init + a fixed iteration count unrolls the whole fit
# into CTEs, so even the clustering queries carry full value-hash
# oracles. The CTE below mirrors operators/clustering.py
# constant-for-constant (K=8, one update step, dist rounded to 6,
# per-dimension means rounded to 9).
# =====================================================================


def _kmeans_cte(k: int = 8, dim: int = 64) -> str:
    """Unrolled one-update-step Lloyd's over the embeddings table:
    c0 = first-k-by-id init → a0 assignment → m1/c1 per-dimension
    means (empty clusters keep their previous centroid via the LEFT
    JOIN + coalesce, as the engine does) → a1 final assignment."""
    return f"""
    WITH v AS (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS em FROM embeddings
    ), c0 AS (
      SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS BIGINT) AS cluster,
             em AS cent
      FROM (SELECT vec_id, em FROM v ORDER BY vec_id LIMIT {k})
    ), a0 AS (
      SELECT vec_id, cluster FROM (
        SELECT v.vec_id, c0.cluster,
               row_number() OVER (PARTITION BY v.vec_id
                 ORDER BY round(list_distance(v.em, c0.cent), 6), c0.cluster) AS rn
        FROM v, c0) WHERE rn = 1
    ), m1 AS (
      SELECT a0.cluster, i.i AS pos, round(avg(v.em[i.i]), 9) AS m
      FROM a0 JOIN v USING (vec_id), range(1, {dim + 1}) i(i)
      GROUP BY a0.cluster, i.i
    ), c1 AS (
      SELECT c0.cluster, coalesce(u.cent, c0.cent) AS cent
      FROM c0 LEFT JOIN (
        SELECT cluster, list(m ORDER BY pos) AS cent FROM m1 GROUP BY cluster
      ) u USING (cluster)
    ), a1 AS (
      SELECT vec_id, cluster, dist FROM (
        SELECT v.vec_id, c1.cluster,
               round(list_distance(v.em, c1.cent), 6) AS dist,
               row_number() OVER (PARTITION BY v.vec_id
                 ORDER BY round(list_distance(v.em, c1.cent), 6), c1.cluster) AS rn
        FROM v, c1) WHERE rn = 1
    )
"""


@register(
    "cluster_kmeans_assign",
    oracle=_kmeans_cte() + "SELECT vec_id, cluster, dist FROM a1",
)
def cluster_kmeans_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed Lloyd's k-means (K=8, one update step from the
    deterministic init), returning every vector's final cluster and
    rounded distance. The scale property is the plan shape: the
    argmin is a literal-centroid codegen projection with ZERO
    exchanges (plan-asserted in tests); the update's only shuffle is
    K·D wide after map-side combine; the driver holds just the K·D
    centroid matrix — Lloyd's at 100 TB is exactly this loop."""
    from .operators import clustering

    emb = _t(spark, sf_dir, "embeddings")
    cents = clustering.kmeans_fit(emb, k=8, iters=1)
    return clustering.kmeans_assign(emb, cents)


@register(
    "dedup_semantic",
    oracle=_kmeans_cte()
    + """
    , e AS (
      SELECT a1.vec_id, a1.cluster, v.em,
             sqrt(list_dot_product(v.em, v.em)) AS nrm
      FROM a1 JOIN v USING (vec_id)
    ), dup AS (
      SELECT DISTINCT b.vec_id FROM e a JOIN e b
        ON a.cluster = b.cluster AND a.vec_id < b.vec_id
      WHERE round(list_dot_product(a.em, b.em) / nullif(a.nrm * b.nrm, 0), 6) >= 0.4
    )
    SELECT e.vec_id, e.cluster, (d.vec_id IS NULL) AS keep
    FROM e LEFT JOIN dup d ON e.vec_id = d.vec_id
    """,
)
def dedup_semantic_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup (Abbas et al. 2023): semantic near-dup removal —
    k-means partition of embedding space, pairwise cosine ONLY within
    a cluster, drop any doc with an earlier-id match ≥ 0.4. Candidate
    generation is quadratic only within a cluster; K scales with the
    corpus so clusters stay bounded — the embedding-space sibling of
    the MinHash-banded text path, and the missing piece between exact
    `dedup_embedding_cosine` (all-pairs ground truth) and
    `dedup_embedding_lsh` (hyperplane buckets): here the blocking
    structure is LEARNED from the data."""
    from .operators import clustering

    emb = _t(spark, sf_dir, "embeddings")
    return clustering.semantic_dedup(emb, k=8, iters=1, threshold=0.4)


@register(
    "cluster_representatives",
    oracle=_kmeans_cte()
    + """
    SELECT cluster, vec_id, dist, rn FROM (
      SELECT cluster, vec_id, dist,
             CAST(row_number() OVER (PARTITION BY cluster
                  ORDER BY dist, vec_id) AS INT) AS rn
      FROM a1
    ) WHERE rn <= 5
    """,
)
def cluster_representatives_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cluster-balanced representative sampling (coreset selection):
    the 5 vectors nearest their centroid in every k-means cluster —
    the "one exemplar per semantic region" primitive (diverse
    subsampling, prototype picking for labeling, SemDeDup's
    keep-the-centroid-nearest variant). Plan: zero-shuffle assignment,
    then ONE exchange on the cluster id for the per-cluster rank —
    at corpus scale each cluster's members co-locate once and only
    5·K rows survive."""
    from .operators import clustering

    emb = _t(spark, sf_dir, "embeddings")
    cents = clustering.kmeans_fit(emb, k=8, iters=1)
    a = clustering.kmeans_assign(emb, cents)
    w = Window.partitionBy("cluster").orderBy("dist", "vec_id")
    return (
        a.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 5)
        .select("cluster", "vec_id", "dist", "rn")
    )


@register(
    "knn_label_vote",
    oracle="""
    WITH q AS (
      SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qv, label AS true_label
      FROM embeddings WHERE vec_id < 50 AND list_dot_product(embedding, embedding) > 0
    ), c AS (
      SELECT vec_id AS neighbor_id, CAST(embedding AS DOUBLE[]) AS cv, label
      FROM embeddings WHERE vec_id >= 50 AND list_dot_product(embedding, embedding) > 0
    ), nn AS (
      SELECT query_id, neighbor_id, label FROM (
        SELECT q.query_id, c.neighbor_id, c.label,
               row_number() OVER (PARTITION BY q.query_id
                 ORDER BY round(list_dot_product(qv, cv)
                   / (sqrt(list_dot_product(qv, qv)) * sqrt(list_dot_product(cv, cv))), 6) DESC,
                   c.neighbor_id) AS rn
        FROM q, c WHERE q.query_id <> c.neighbor_id) WHERE rn <= 5
    ), votes AS (
      SELECT query_id, label, count(*) AS votes FROM nn GROUP BY query_id, label
    )
    SELECT v.query_id, q.true_label, v.label AS pred_label, v.votes
    FROM (
      SELECT *, row_number() OVER (PARTITION BY query_id
                ORDER BY votes DESC, label) AS vrn
      FROM votes) v
    JOIN q ON v.query_id = q.query_id
    WHERE v.vrn = 1
    """,
)
def knn_label_vote_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-NN majority-vote labeling: the 50 held-out query vectors take
    the majority label of their 5 nearest labeled corpus neighbors —
    the weak-labeling / quality-classifier primitive of a curation
    pipeline (label a seed set, vote labels onto the corpus by
    similarity). Exact top-k via the codegen fold kernel (broadcast
    query side); swap in IVF/LSH candidates at corpus scale; the vote
    itself is one narrow (query, label) aggregation."""
    from .operators import similarity

    emb = _t(spark, sf_dir, "embeddings")
    return similarity.knn_label_vote(
        corpus=emb.filter(F.col("vec_id") >= 50),
        queries=emb.filter(F.col("vec_id") < 50),
        k=5,
    )


@register(
    "export_shuffle_shards",
    oracle="""
    WITH s AS (
      SELECT doc_id,
             CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':shards:42'), 1, 8))
                  AS BIGINT) AS h
      FROM documents
    )
    SELECT doc_id, h % 8 AS shard,
           CAST(row_number() OVER (PARTITION BY h % 8 ORDER BY h, doc_id) - 1
                AS BIGINT) AS pos
    FROM s
    """,
)
def export_shuffle_shards_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic global shuffle + sharding for training export:
    every doc's (shard, position) derives from md5(key‖seed) — a
    reproducible random order with NO global sort and no rand()
    (retry-stable, engine-portable). The materialized form
    (`write_training_shards`) turns this into shard=<i> partition
    dirs sorted within files — the layout a data loader streams; the
    only exchange at any scale is the hash repartition on shard."""
    from .operators import curation

    d = _t(spark, sf_dir, "documents")
    return curation.shuffle_shards(d, key_col="doc_id", n_shards=8, seed="42")


# Headline queries timed by bench.py (BENCH_r{N}.json). Keep names
# stable across rounds so timings are comparable — and when a kept
# name's WORKLOAD changes (not just its implementation), record it in
# BENCH_WORKLOAD_NOTES so the cross-round series isn't misread as an
# engine speedup.
BENCH_WORKLOAD_NOTES = {
    "dedup_minhash_lsh": (
        "workload changed in round 2: signature geometry 128 hashes/32 "
        "bands -> 64/16 (same recall target at threshold 0.8); r1-vs-r2+ "
        "timings compare different work"
    ),
    "_total": (
        "round 2 added 2 headline entries (20 total) and round 3 adds 7 "
        "more (27 total: asof/pack/contamination/rollup/analytics-suite/"
        "pii/incremental-minhash), so cross-round TOTALS compare "
        "different workloads — compare per-query series instead"
    ),
    "dedup_incremental_minhash": (
        "builds the corpus index INLINE (the declared query's contract); "
        "the operational batch-vs-stored-index screen is ~2s at sf0.1 "
        "(ROADMAP round-3 probes)"
    ),
    "_total_r4": (
        "round 4 adds dedup_embedding_lsh (28 total) — the hyperplane-"
        "LSH blocked near-dup path, i.e. the plan that exists at 100 TB; "
        "dedup_embedding_cosine stays for series continuity but times "
        "the driver-collect ground-truth baseline"
    ),
    "_total_r5": (
        "round 5 adds fold_scale_replay_xl (29 total): same fold "
        "pipeline at 384k events (4x) so the events/s metric clears the "
        "~0.2s per-stage floor that caps the legacy 96k entry at ~480k "
        "ev/s regardless of kernel speed; fold_scale_replay stays for "
        "series continuity"
    ),
    "_total_r5b": (
        "round 5 (continued) adds cluster_kmeans_assign and "
        "dedup_semantic (31 total): the distributed-Lloyd's / SemDeDup "
        "clustering family over the embeddings table"
    ),
}

BENCH_QUERIES = [
    "a1_scoreboard_kills",
    "a3_latest_per_key",
    "a4_global_scoreboard",
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_local_supplier_volume",
    "q10_returned_items",
    "q18_large_orders",
    "t8_tumbling_window",
    "w3_order_rank_per_customer",
    "sessionize_events",
    "game_a1_room_scoreboard",
    "fold_state_summary",
    "fold_scale_replay",
    "dedup_ngram_jaccard",
    "dedup_minhash_lsh",
    "sim_bruteforce_topk",
    "text_tfidf_top_terms",
    # added round 2 (new names append; prior names stay comparable)
    "dedup_embedding_cosine",
    "q9ish_product_profit",
    # added round 3
    "asof_latest_order",
    "pack_training_sequences",
    "text_benchmark_contamination",
    "time_rollup_multires",
    "w_analytics_suite",
    "text_pii_redaction",
    "dedup_incremental_minhash",
    # added round 4
    "dedup_embedding_lsh",
    # added round 5
    "fold_scale_replay_xl",
    "cluster_kmeans_assign",
    "dedup_semantic",
]


# Driver-sweep rotation. The external driver records correctness rows
# for (at most) the FIRST 50 names queries() yields, so each round
# lists first the queries whose last driver row is OLDEST — new ones
# from this round, then everything absent from the latest
# CORRECTNESS_r{N}.json (those were verified against a prior round's
# code). Every query passes the identical local DuckDB comparison
# (tests/test_oracle_parity.py) regardless of rotation position.
_DRIVER_PRIORITY = [
    # --- new in round 5 (never driver-verified) go here, first ---
    "cluster_kmeans_assign",
    "dedup_semantic",
    "cluster_representatives",
    "dedup_incremental_embedding",
    "pipeline_embedding_curation",
    "dedup_embedding_lsh_clustered",
    "text_vocab_coverage",
    "knn_label_vote",
    "export_shuffle_shards",
    "dedup_minhash_identical",
    "quota_token_budget",
    "fold_scale_replay_xl",
    "pipeline_curation_compacted",
    "sim_ivf_topk_clustered",
    "sim_lsh_topk_clustered",
    "approx_stats_bounded",
    # --- last driver row is round 2 ---
    "x_array_functions",
    "q7_volume_shipping",
    "q12ish_priority_shipping",
    "q13_customer_order_distribution",
    "q17_small_quantity_revenue",
    "q19ish_disjunctive_predicates",
    "q22ish_idle_customers",
    "q8ish_market_share",
    "q9ish_product_profit",
    "q11ish_important_parts",
    "q15ish_top_supplier",
    "q16ish_supplier_part_counts",
    "q20ish_excess_suppliers",
    "q21ish_sole_supplier_orders",
    # --- last driver row is round 3 ---
    "j_customers_without_orders",
    "j_parts_never_shipped",
    "x16_json_extract",
    "game_a1_room_scoreboard",
    "game_a4a5_global_rank",
    "game_p4_position_history",
    "game_x3_obstacle_decode",
    "game_s4_latest_event_per_room",
    "chg_s6_tableview",
    "chg_a4_global_sum",
    "chg_w2_lru_top5",
    "j2_kill_attribution",
    "stream_a1_scoreboard",
    "pipeline_curate_training_data",
    "game_survival_first_life",
    "game_bomb_effectiveness",
    "game_room_activity_windows",
    "fold_players_state",
    "fold_time_travel",
    "fold_scale_replay",
    "fold_state_summary",
    "text_stats",
    "dedup_exact",
    "stream_dedup_exact",
    "dedup_ngram_jaccard",
    "dedup_minhash_lsh",
    "dedup_incremental_jaccard",
    "dedup_incremental_minhash",
    "profile_lineitem_stats",
    "text_pii_redaction",
    "dedup_simhash",
    "text_lang_id",
    "sim_bruteforce_topk",
    "sim_jvm_cosine_topk",
    "sim_lsh_topk",
    "multimodal_features",
    "dedup_clusters_exact",
    "chunk_doc_spans",
    "text_boilerplate_coverage",
    "asof_latest_order",
    "split_train_val_test",
    "domain_topk_docs",
    "text_repetition_signals",
    "text_benchmark_contamination",
    "pack_training_sequences",
    "mix_domain_weighted_sample",
    "time_rollup_multires",
    "stream_t8_windowed",
    "w_analytics_suite",
    "t8b_sliding_window",
    # --- last driver row is round 4 ---
    "a1_scoreboard_kills",
    "a3_latest_per_key",
    "a4_global_scoreboard",
    "a5_ranked_scoreboard",
    "w2_recency_top5",
    "s4_latest_message",
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_local_supplier_volume",
    "t8_tumbling_window",
    "w3_order_rank_per_customer",
    "stream_s6_tableview",
    "game_movement_heatmap",
    "game_kd_ratio",
    "fold_pos_players",
    "dedup_embedding_cosine",
    "dedup_embedding_lsh",
    "text_token_counts",
    "text_rolling_fingerprints",
    "text_unigram_logprob",
    "sim_ivf_topk",
    "q4_order_priority",
    "q6_revenue_forecast",
    "q10_returned_items",
    "q14_promo_effect",
    "q18_large_orders",
    "rollup_order_stats",
    "cube_event_stats",
    "grouping_sets_lineitem",
    "sessionize_events",
    "pivot_event_counts",
    "date_parts_orders",
    "intersect_trading_nations",
    "semi_customers_with_orders",
    "count_distinct_parts_per_supplier",
    "join_left_outer_order_counts",
    "join_full_outer_nation_presence",
    "theta_price_band_join",
    "union_event_sources",
    "median_value_per_type",
    "approx_stats",
    "text_tfidf_top_terms",
    "q2ish_min_cost_supplier",
    "dedup_clusters",
    "x_map_functions",
    "split_leakage_safe",
    "text_duplicate_spans",
    "pipeline_streaming_curation",
    "text_gopher_quality",
    "dedup_survivors",
]


def _ordered_names() -> list[str]:
    prio = [n for n in _DRIVER_PRIORITY if n in REGISTRY]
    rest = [n for n in REGISTRY if n not in set(prio)]
    return prio + rest


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: REGISTRY[name].fn for name in _ordered_names()}


def oracle_sql() -> dict[str, str]:
    return {
        name: REGISTRY[name].oracle
        for name in _ordered_names()
        if REGISTRY[name].oracle is not None
    }

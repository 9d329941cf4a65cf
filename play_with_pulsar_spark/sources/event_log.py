"""Event-log ingestion: the write path of the engine (SURVEY §2.1).

Reproduces the reference's source-boundary contract:

- S1 (producer/sink): append rows to the ordered per-room log. The
  broker's implicit total order (docs/en/game1-introduce.md:93-97)
  becomes an explicit, gapless, per-room ``offset`` column assigned
  at ingest.
- S8 (schema-validated ingestion): producers declare the envelope
  schema and incompatible writers are rejected
  (docs/en/game5-schema.md:39-67) → ``from_json`` against the
  declared StructType with FAILFAST (reject) or PERMISSIVE
  (quarantine) modes.
- S3 (reader): full-scan from earliest = plain parquet read of the
  partitioned log.

Scale notes: the log is written ``partitionBy(room)`` — per-room
isolation is directory-level partition pruning (the reference's
topic-per-room, pulsar.go:90-107). Offset assignment for a batch is
one window over (room, ts, seq); appends resume from the stored
per-room max, read with an aggregate (not a scan of the data pages —
parquet footer min/max serve it)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from pyspark.sql import types as T

from ..schema import EVENT_ENVELOPE_SCHEMA, GAME_EVENT_SCHEMA


def _contains_map(dt: T.DataType) -> bool:
    """True if the type embeds a MapType anywhere (xxhash64-incompatible)."""
    if isinstance(dt, T.MapType):
        return True
    if isinstance(dt, T.ArrayType):
        return _contains_map(dt.elementType)
    if isinstance(dt, T.StructType):
        return any(_contains_map(f.dataType) for f in dt.fields)
    return False


def assign_offsets(
    batch: DataFrame,
    base_offsets: DataFrame | None = None,
    room_col: str = "room",
    order_cols: tuple[str, ...] | None = None,
) -> DataFrame:
    """Assign monotone gapless per-room offsets to an ingest batch.

    ``base_offsets``: (room, max_offset) of the existing log, for
    appends; omitted ⇒ offsets start at 0.

    ``order_cols`` defaults to ``("ts", "seq")`` when a ``seq`` column
    exists, else ``("ts",)``. A content-hash tiebreaker is ALWAYS
    appended so rows with equal order keys receive the same offsets on
    every run and every partitioning — offset assignment must be a
    pure function of the batch contents, never of task scheduling.
    """
    if order_cols is None:
        order_cols = ("ts", "seq") if "seq" in batch.columns else ("ts",)
    missing = [c for c in (room_col, *order_cols) if c not in batch.columns]
    if missing:
        raise ValueError(f"assign_offsets: batch lacks order columns {missing}")
    # xxhash64 rejects MapType (map equality is undefined), so the
    # tiebreaker hashes only hashable columns — still deterministic in
    # the batch contents for every non-map column.
    hashable = [f.name for f in batch.schema.fields if not _contains_map(f.dataType)]
    if not hashable:
        raise ValueError(
            "assign_offsets: no hashable (non-map) columns for the "
            "deterministic tiebreaker"
        )
    tiebreak = F.xxhash64(*hashable)
    w = Window.partitionBy(room_col).orderBy(
        *[F.col(c) for c in order_cols], tiebreak
    )
    out = batch.withColumn("_rn", F.row_number().over(w) - 1)
    if base_offsets is not None:
        out = (
            out.join(F.broadcast(base_offsets), room_col, "left")
            .withColumn(
                "offset",
                F.col("_rn") + F.coalesce(F.col("max_offset") + 1, F.lit(0)),
            )
            .drop("max_offset")
        )
    else:
        out = out.withColumn("offset", F.col("_rn"))
    return out.drop("_rn")


def current_offsets(log: DataFrame, room_col: str = "room") -> DataFrame:
    """(room, max_offset) — served by parquet footer statistics."""
    return log.groupBy(room_col).agg(F.max("offset").alias("max_offset"))


def parse_envelope(
    raw: DataFrame, json_col: str = "payload", mode: str = "FAILFAST"
) -> DataFrame:
    """S8: decode JSON wire messages against the declared envelope
    schema. FAILFAST rejects incompatible producers (the reference's
    registry behavior, game5-schema.md:67); PERMISSIVE nulls bad rows
    for quarantine. The ``comment`` default ("" — pulsar.go:30-34) is
    applied explicitly."""
    parsed = raw.withColumn(
        "_ev", F.from_json(F.col(json_col), EVENT_ENVELOPE_SCHEMA, {"mode": mode})
    )
    cols = [F.col(f"_ev.{f.name}").alias(f.name) for f in EVENT_ENVELOPE_SCHEMA.fields]
    out = parsed.select(*[c for c in raw.columns if c != json_col], *cols)
    return out.withColumn("comment", F.coalesce(F.col("comment"), F.lit("")))


def to_wire(events: DataFrame) -> DataFrame:
    """Inverse of :func:`parse_envelope` — envelope columns to a JSON
    payload (X16 to_json)."""
    env = F.struct(*[F.col(f.name) for f in EVENT_ENVELOPE_SCHEMA.fields])
    keep = [c for c in events.columns if c not in {f.name for f in EVENT_ENVELOPE_SCHEMA.fields}]
    return events.select(*keep, F.to_json(env).alias("payload"))


class SchemaIncompatibleError(ValueError):
    """Raised when a writer's schema cannot evolve into the declared
    schema — the engine analog of the reference registry rejecting an
    incompatible producer (docs/en/game5-schema.md:67)."""


def check_writer_compat(writer, declared=None) -> None:
    """S8 registry compatibility check (game5-schema.md:39-67):

    - writer may OMIT a nullable declared field (read-side fills the
      default — e.g. ``comment`` defaults to "", pulsar.go:30-34);
    - writer may ADD new fields (consumers project what they declare);
    - writer must NOT change a declared field's type, nor omit a
      non-nullable field. Either raises ``SchemaIncompatibleError``.
    """
    declared = declared or GAME_EVENT_SCHEMA
    writer_fields = {f.name: f for f in writer.fields}
    for f in declared.fields:
        w = writer_fields.get(f.name)
        if w is None:
            if not f.nullable:
                raise SchemaIncompatibleError(
                    f"writer omits non-nullable field {f.name!r}"
                )
        elif w.dataType != f.dataType:
            raise SchemaIncompatibleError(
                f"writer changes {f.name!r} from {f.dataType.simpleString()} "
                f"to {w.dataType.simpleString()}"
            )


def read_evolved_log(spark: SparkSession, path: str, defaults: dict | None = None) -> DataFrame:
    """Schema-evolution read path: Parquet schema merge across writer
    generations + explicit default fill for fields newer writers added
    (SURVEY §1.3: evolution = mergeSchema + coalesce(col, default))."""
    df = spark.read.option("mergeSchema", "true").parquet(path)
    for name, default in (defaults or {}).items():
        if name in df.columns:
            df = df.withColumn(name, F.coalesce(F.col(name), F.lit(default)))
        else:
            df = df.withColumn(name, F.lit(default))
    return df


def write_event_log(
    events: DataFrame, path: str, mode: str = "append", format: str = "parquet"
) -> None:
    """S1: append to the room-partitioned log. ``format`` is any
    columnar source Spark bundles (``parquet`` default, ``orc`` the
    second first-class choice — both splittable, predicate-pushing,
    column-pruning; cross-format fold equality is tested). Avro needs
    the external spark-avro module, absent in this image — the call
    fails loudly with Spark's own message if requested."""
    events.write.mode(mode).partitionBy("room").format(format).save(path)


def read_event_log(
    spark: SparkSession, path: str, format: str = "parquet"
) -> DataFrame:
    """S3: full scan from earliest, explicit schema."""
    return spark.read.schema(GAME_EVENT_SCHEMA).format(format).load(path)


def write_event_log_bucketed(
    events: DataFrame,
    table: str,
    n_buckets: int = 256,
    path: str | None = None,
) -> None:
    """S1 at catalog scale: the event log as a bucketed table —
    ``bucketBy(n, room)`` + within-bucket ``sortBy(room, offset)``.

    Why this layout exists: ``replay_state`` is ``groupBy(room)
    .applyInPandas`` — over an arbitrary parquet layout that is a
    corpus-wide Exchange per replay. Over a table bucketed by room,
    Spark's FlatMapGroupsInPandas sees its ClusteredDistribution(room)
    already satisfied by the scan's bucketing and plans NO Exchange at
    all (plan-asserted in test_bucketing.py) — the batch analog of the
    broker's topic-per-room co-location (pulsar.go:90-107): partition
    once at write time, replay shuffle-free forever after. Within-
    bucket sort by (room, offset) keeps each room's log contiguous and
    ordered on disk. Pass ``path`` for an EXTERNAL table that outlives
    the session catalog (re-attach via ``bucketing.register_bucketed``).
    """
    w = events.write.mode("overwrite").bucketBy(n_buckets, "room").sortBy(
        "room", "offset"
    )
    if path is not None:
        w = w.option("path", path)
    w.format("parquet").saveAsTable(table)

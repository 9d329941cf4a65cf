"""Materialize golden fold-state parquets (FIXTURES.md §A3).

The replay fold (F1-F9, event.go:31-225 semantics) is the one core
family whose semantics are not SQL-expressible — order-dependent
guards (P5-P7) mean DuckDB cannot recompute it. To still put it under
the driver's hash gate, this script computes the end-state with the
PURE-PYTHON fold (``fold_events`` over dict events — the
single-threaded reference chain, NOT the Spark/pandas kernel) over the
same seeded workload as the committed ``fixtures/game_events.parquet``
and commits the result. The declared queries' oracles then simply
``read_parquet`` the golden, so a driver hash-pass proves the
distributed Spark fold reproduces an independently materialized
artifact bit-for-bit.

Written goldens (6 rooms x 3000 events, seed 42 — kept in lockstep
with scripts/gen_fixtures.py):
- fold_players_golden.parquet          players table, full log
- fold_players_upto1500_golden.parquet players table at offset <= 1500
- fold_pos_players_golden.parquet      posToPlayers map, full log

Run: python scripts/gen_fold_golden.py
"""

from __future__ import annotations

import os
import sys

import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from play_with_pulsar_spark.operators.replay import fold_events
from play_with_pulsar_spark.sources.fixtures import generate_room_events, room_names

# must match scripts/gen_fixtures.py — the goldens describe THAT log
N_ROOMS = 6
EVENTS_PER_ROOM = 3000
SEED = 42

PLAYERS_SCHEMA = pa.schema(
    [
        ("room", pa.string()),
        ("name", pa.string()),
        ("x", pa.int32()),
        ("y", pa.int32()),
        ("alive", pa.bool_()),
    ]
)

POS_PLAYERS_SCHEMA = pa.schema(
    [
        ("room", pa.string()),
        ("x", pa.int32()),
        ("y", pa.int32()),
        ("name", pa.string()),
        ("alive", pa.bool_()),
    ]
)

SUMMARY_SCHEMA = pa.schema(
    [
        ("room", pa.string()),
        ("entity", pa.string()),
        ("n", pa.int64()),
    ]
)


def _verify_fixture_in_sync(fixture_dir: str) -> None:
    """The goldens are only meaningful if the committed event log was
    produced by the same (rooms, events, seed); re-derive its row count
    and offset range and fail loudly on drift."""
    path = os.path.join(fixture_dir, "game_events.parquet")
    t = pq.read_table(path, columns=["room", "offset"])
    assert t.num_rows == N_ROOMS * EVENTS_PER_ROOM, (
        f"fixture drift: {path} has {t.num_rows} rows, expected "
        f"{N_ROOMS * EVENTS_PER_ROOM} — regenerate both fixtures together"
    )
    rooms = set(t.column("room").to_pylist())
    assert rooms == set(room_names(N_ROOMS)), f"fixture drift: rooms {rooms}"


def fold_room_rows(room: str, upto_offset: int | None):
    evs = generate_room_events(room, EVENTS_PER_ROOM, SEED)
    if upto_offset is not None:
        # replay_state's contract: offset <= upto_offset, inclusive
        evs = [e for e in evs if e["offset"] <= upto_offset]
    return fold_events(evs)


def players_rows(upto_offset: int | None) -> list[dict]:
    rows = []
    for room in room_names(N_ROOMS):
        s = fold_room_rows(room, upto_offset)
        for name, p in s.players.items():
            rows.append(
                dict(room=room, name=name, x=p.pos[0], y=p.pos[1], alive=p.alive)
            )
    rows.sort(key=lambda r: (r["room"], r["name"]))
    return rows


def pos_players_rows() -> list[dict]:
    rows = []
    for room in room_names(N_ROOMS):
        s = fold_room_rows(room, None)
        for (x, y), p in s.pos_players.items():
            rows.append(dict(room=room, x=x, y=y, name=p.name, alive=p.alive))
    rows.sort(key=lambda r: (r["room"], r["x"], r["y"]))
    return rows


def state_summary_rows() -> list[dict]:
    """(room, entity, n) for every entity kind present in the end
    state — the groupBy("room","entity").count() of the full tagged
    state table (zero-count entities yield no row, matching the
    aggregate's semantics)."""
    rows = []
    for room in room_names(N_ROOMS):
        s = fold_room_rows(room, None)
        for entity, m in [
            ("player", s.players),
            ("pos_player", s.pos_players),
            ("bomb", s.bombs),
            ("obstacle", s.obstacles),
            ("flame", s.flames),
        ]:
            if len(m):
                rows.append(dict(room=room, entity=entity, n=len(m)))
    rows.sort(key=lambda r: (r["room"], r["entity"]))
    return rows


def _entity_counts(s, room: str) -> list[dict]:
    rows = []
    for entity, m in [
        ("player", s.players),
        ("pos_player", s.pos_players),
        ("bomb", s.bombs),
        ("obstacle", s.obstacles),
        ("flame", s.flames),
    ]:
        if len(m):
            rows.append(dict(room=room, entity=entity, n=len(m)))
    return rows


def scale_summary_rows(n_rooms: int, events_per_room: int, seed: int) -> list[dict]:
    """(room, entity, n) end-state summary for a seeded generated
    workload — the golden for the fold_scale_replay bench queries
    (which generate the identical log distributed: game_event_log
    wraps the same generate_room_events per room)."""
    rows = []
    for room in room_names(n_rooms):
        rows.extend(_entity_counts(fold_events(generate_room_events(room, events_per_room, seed)), room))
    rows.sort(key=lambda r: (r["room"], r["entity"]))
    return rows


def _write(fixture_dir: str, fname: str, rows: list[dict], schema: pa.Schema) -> None:
    table = pa.Table.from_pydict(
        {name: [r[name] for r in rows] for name in schema.names}, schema=schema
    )
    out = os.path.join(fixture_dir, fname)
    pq.write_table(table, out, compression="zstd")
    print(f"wrote {out}: {table.num_rows} rows")


def main() -> None:
    fixture_dir = os.path.join(os.path.dirname(__file__), "..", "fixtures")
    _verify_fixture_in_sync(fixture_dir)
    _write(fixture_dir, "fold_players_golden.parquet", players_rows(None), PLAYERS_SCHEMA)
    _write(
        fixture_dir,
        "fold_players_upto1500_golden.parquet",
        players_rows(1500),
        PLAYERS_SCHEMA,
    )
    _write(
        fixture_dir, "fold_pos_players_golden.parquet", pos_players_rows(), POS_PLAYERS_SCHEMA
    )
    _write(
        fixture_dir, "fold_state_summary_golden.parquet", state_summary_rows(), SUMMARY_SCHEMA
    )
    from play_with_pulsar_spark.queries import (
        FOLD_SCALE_EVENTS_PER_ROOM,
        FOLD_SCALE_ROOMS,
        FOLD_XL_EVENTS_PER_ROOM,
        FOLD_XL_ROOMS,
    )

    _write(
        fixture_dir,
        "fold_scale_replay_golden.parquet",
        scale_summary_rows(FOLD_SCALE_ROOMS, FOLD_SCALE_EVENTS_PER_ROOM, seed=7),
        SUMMARY_SCHEMA,
    )
    _write(
        fixture_dir,
        "fold_scale_replay_xl_golden.parquet",
        scale_summary_rows(FOLD_XL_ROOMS, FOLD_XL_EVENTS_PER_ROOM, seed=7),
        SUMMARY_SCHEMA,
    )


if __name__ == "__main__":
    main()
